"""IVF ANN recall, oracle-verified (LLM-pipeline extension).

The production IVF path (n03c) rides Spark ML's seeded KMeans, whose
cluster geometry is JVM-internal — the driver can only rows-check it, and
its quality claim lived in a pytest recall fence alone.  ``n37_ivf_recall``
closes that gap the way n36 did for MinHash (VERDICT r5 #3): an
ENGINE-NEUTRAL inverted-file index — coarse cells from a deterministic
quantizer both engines can compute bit-identically — probed exactly like
n03c, with **recall@k against the brute-force exact top-k computed inside
the query**.  The driver hash-checks the ANN quality number itself, not
just that some rows came back.

Engine-neutral quantizer (every step exact in BIGINT, so cell assignment
can never flip on a cross-engine ulp):

* components quantized ``round(x * 1000) -> BIGINT`` (positive and
  negative operands round identically: Spark HALF_UP and DuckDB
  half-away-from-zero agree on the same double input, and both engines
  compute the same double product first — the n28 discipline);
* the first ``CELLS`` vectors (vec_id < 16) serve as coarse centroids —
  k-means-init-without-iterations, deterministic by construction;
* assignment = argmax integer dot product (maximum-inner-product
  quantizer), ties to the lowest cell id;
* the query (vec_id 0) probes its ``NPROBE`` best cells by the same
  integer metric — no collect(): the probe set is a 4-row broadcast join.

Only the final ranking uses floating cosine, identically on both engines
(the n03 expression, rounded to 6 dp with vec_id tiebreak).  Recall@k =
|IVF top-k ∩ exact top-k| / k, plus the candidate/corpus counts that show
what fraction of the corpus the probe actually scanned — the quantity that
makes IVF the 100-TB path (scan |corpus| * nprobe/cells, here 4/16).

Scale shape: the cell-assignment fan-out is |corpus| x CELLS rows against
a 16-row broadcast (no shuffle on the corpus side beyond the argmax
window's vec_id partition); candidate selection is a broadcast semi-join;
every aggregate is a 1-row broadcast combined by cross join (the accepted
tiny-scalar-frame pattern).

Registered after ``minhash_eval`` in ``queries.__init__._MODULES`` — new
entries must not queue-jump the stalest-evidence queries at the registry
front (VERDICT r3 #1).

Reference parity: no reference analog; extends SURVEY §2.H alongside
n03/n03b/n03c.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load_tables, register
from .llm_queries import _cosine

#: number of coarse cells (centroids = embeddings of vec_id < CELLS)
CELLS = 16
#: cells probed per query (scan fraction = NPROBE/CELLS of a balanced index)
NPROBE = 4
#: result depth for recall@k
K = 10
#: component quantization scale (round(x*1000) -> BIGINT)
SCALE = 1000

#: DuckDB BIGINT dot product of two quantized lists (1-based indexing);
#: list_sum over an explicit element-product list keeps it integer-exact
_DUCK_IDOT = (
    "list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]))"
)


# -- reusable quantizer stages (shared with scale.write_ivf_index /
# scale.ivf_probe_topk, which persist the same assignment as a
# hive-partitioned layout for dynamic-partition-pruned probes) --------------


def base_vectors(e: DataFrame) -> DataFrame:
    """(vec_id, v: array<double>) with NULL/empty embeddings dropped —
    and vectors carrying any non-finite component: NaN/Infinity cannot
    quantize to BIGINT (the round(x*SCALE) cast would ANSI-abort with
    CAST_OVERFLOW, specials-corpus net r13) and has no meaningful cell
    anyway. No-op on the driver fixtures (all-finite there)."""
    from .llm_queries import _finite_embedding

    return e.filter(
        F.col("embedding").isNotNull()
        & (F.size("embedding") > 0)
        & _finite_embedding()
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def quantize(base: DataFrame) -> DataFrame:
    """Integer-quantized copy: (vec_id, qv: array<bigint>), round(x*SCALE)."""
    return base.select(
        "vec_id",
        F.transform("v", lambda x: F.round(x * SCALE).cast("long")).alias("qv"),
    )


def centroid_frame(quant: DataFrame) -> DataFrame:
    """First-CELLS vectors as the coarse centroids: (cell, cv)."""
    return quant.filter(F.col("vec_id") < CELLS).select(
        F.col("vec_id").alias("cell"), F.col("qv").alias("cv")
    )


def cell_scores(quant: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cell, dp): exact BIGINT inner product of every vector
    against every centroid (the |rows| x CELLS fan-out vs a broadcast)."""
    idot = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return quant.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cell", idot.alias("dp")
    )


def assign_cells(scored: DataFrame) -> DataFrame:
    """(vec_id, cell): argmax-dp assignment, ties to the lowest cell id."""
    w = Window.partitionBy("vec_id").orderBy(F.col("dp").desc(), F.col("cell").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell")
    )


@register(
    "n37_ivf_recall",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
        WHERE embedding IS NOT NULL AND len(embedding) > 0
    ), q AS (
        SELECT vec_id, v,
               list_transform(v, x -> CAST(round(x * {SCALE}) AS BIGINT)) AS qv
        FROM e
    ), cent AS (
        SELECT vec_id AS cell, qv AS cv FROM q WHERE vec_id < {CELLS}
    ), scored AS (
        SELECT q.vec_id, c.cell,
               {_DUCK_IDOT.format(a="q.qv", b="c.cv")} AS dp
        FROM q CROSS JOIN cent c
    ), assign AS (
        SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dp DESC, cell ASC) AS rn
            FROM scored) WHERE rn = 1
    ), probe AS (
        SELECT cell FROM scored WHERE vec_id = 0
        ORDER BY dp DESC, cell ASC LIMIT {NPROBE}
    ), q0 AS (
        SELECT v AS qv0 FROM e WHERE vec_id = 0
    ), ranked AS (
        SELECT e.vec_id,
               ROUND(list_cosine_similarity(e.v, q0.qv0), 6) AS sim
        FROM e, q0
    ), exact_k AS (
        SELECT vec_id FROM ranked ORDER BY sim DESC, vec_id ASC LIMIT {K}
    ), cand AS (
        SELECT a.vec_id FROM assign a JOIN probe p ON a.cell = p.cell
    ), ivf_k AS (
        SELECT r.vec_id FROM ranked r JOIN cand c ON c.vec_id = r.vec_id
        ORDER BY r.sim DESC, r.vec_id ASC LIMIT {K}
    )
    SELECT CAST({K} AS INT) AS k,
           CAST((SELECT count(*) FROM exact_k x JOIN ivf_k i
                 ON i.vec_id = x.vec_id) AS BIGINT) AS hits,
           ROUND(CAST((SELECT count(*) FROM exact_k x JOIN ivf_k i
                       ON i.vec_id = x.vec_id) AS DOUBLE) / {K}, 6)
               AS recall_at_k,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS candidates,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS corpus,
           ROUND(CAST((SELECT count(*) FROM cand) AS DOUBLE)
                 / (SELECT count(*) FROM e), 6) AS scan_frac
    """,
)
def n37_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N37 (extension): engine-neutral IVF (integer-quantized MIP coarse
    cells, first-16-vector centroids, nprobe=4) with in-query recall@10
    against the exact scan — the ANN quality claim under the driver's
    exact hash gate, plus the scanned-candidate fraction that is IVF's
    whole point at scale."""
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    # materialize-before-reuse (OPTIMIZATION r16, guide §1.2 step 1 /
    # §3 plan-size note): base feeds quant/q0/ranked/corpus, scored feeds
    # assign+probe, ranked feeds both top-k branches, cand feeds the
    # restricted rank and the candidate count — WITHOUT the pins Catalyst
    # duplicates each shared subtree per consumer (the before-plan shows
    # 13 parquet scans of embeddings for this one query; after: 1 scan +
    # four lazily-materialized batch-sized frames).  Results identical:
    # the pins only stop recomputation.
    base = base_vectors(e).localCheckpoint(eager=False)
    quant = quantize(base)
    cent = centroid_frame(quant)
    scored = cell_scores(quant, cent).localCheckpoint(eager=False)
    assign = assign_cells(scored)
    # the probe set stays a DataFrame (4-row broadcast) — no collect()
    probe = (
        scored.filter(F.col("vec_id") == 0)
        .orderBy(F.col("dp").desc(), F.col("cell").asc())
        .limit(NPROBE)
        .select("cell")
    )
    q0 = base.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv0"))
    ranked = base.crossJoin(F.broadcast(q0)).select(
        "vec_id", F.round(_cosine(F.col("v"), F.col("qv0")), 6).alias("sim")
    ).localCheckpoint(eager=False)
    exact_k = (
        ranked.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(K)
        .select("vec_id")
    )
    cand = (
        assign.join(F.broadcast(probe), "cell")
        .select("vec_id")
        .localCheckpoint(eager=False)
    )
    ivf_k = (
        ranked.join(cand, "vec_id")
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(K)
        .select("vec_id")
    )
    hits = exact_k.join(ivf_k, "vec_id").agg(
        F.count(F.lit(1)).alias("hits")
    )
    n_cand = cand.agg(F.count(F.lit(1)).alias("candidates"))
    corpus = base.agg(F.count(F.lit(1)).alias("corpus"))
    return (
        hits.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(corpus))
        .select(
            F.lit(K).cast("int").alias("k"),
            F.col("hits"),
            F.round(F.col("hits").cast("double") / K, 6).alias("recall_at_k"),
            F.col("candidates"),
            F.col("corpus"),
            F.round(
                # try_divide: an empty corpus yields NULL scan_frac instead
                # of an ANSI DIVIDE_BY_ZERO abort (degenerate-data contract;
                # DuckDB's x/0 is NULL, so the oracle agrees)
                F.try_divide(F.col("candidates").cast("double"), F.col("corpus")),
                6,
            ).alias("scan_frac"),
        )
    )
