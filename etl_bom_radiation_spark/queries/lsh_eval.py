"""LSH ANN recall, oracle-verified (LLM-pipeline extension).

Companion to :mod:`ivf_eval` (n37), closing the SAME verification gap for
the hyperplane-LSH family: the production paths (n03b
BucketedRandomProjectionLSH, n04b similarity self-join) hash with Spark
ML's JVM-internal projections, so the driver can only rows-check them and
their quality claims lived in pytest recall fences alone.
``n38_lsh_recall`` puts a signed-hyperplane LSH — bucketing both engines
compute bit-identically — under the driver's exact hash gate, with
**recall@k against the brute-force exact top-k computed inside the
query**.

Engine-neutral construction (every bucketing step exact in BIGINT, so a
cross-engine ulp can never flip a bucket):

* components quantized ``round(x * 1000) -> BIGINT`` (the n28/n37
  discipline: both engines compute the same double first, and Spark
  HALF_UP == DuckDB half-away-from-zero on identical input);
* ``BITS`` hyperplanes = pairwise DIFFERENCES of the first ``2*BITS``
  quantized vectors (perpendicular-bisector planes) — DATA-ADAPTIVE, like
  n37's first-vector centroids, and derived in-query by both engines from
  the same rows.  The adaptivity matters: on this clustered corpus,
  md5-seeded data-OBLIVIOUS ±1 planes measured recall 0.3 at the same
  scan fraction during design (r6), the textbook failure of unlearned
  random projections against clustered data;
* bucket code = Σ_j [dot(qv, plane_j) > 0] << j  (integer dot, integer
  threshold — exact);
* multi-probe: the query's own bucket plus every bucket at Hamming
  distance 1 (XOR with a broadcast 1+BITS-row flip table — no collect),
  the standard trick that buys recall without touching more than
  (1+BITS)/2^BITS of a balanced index.

Only the final ranking uses floating cosine, identically on both engines
(the n03 expression, 6 dp + vec_id tiebreak).  Output: recall@10, the
candidate count and the scanned fraction — the numbers a 100-TB corpus
cares about, now hash-verified instead of trusted.

Scale shape: the plane set is a ``BITS``-row broadcast; code assignment
is a broadcast cross-join fan-out (x BITS) folded back by a vec_id
aggregation (map-side combine keeps the shuffle at |corpus| x BITS tiny
rows); the probe set is a tiny broadcast, candidate selection a broadcast
semi-join, and every aggregate a 1-row broadcast combined by cross join
(the accepted tiny-scalar-frame pattern).

Registered after ``ivf_eval`` in ``queries.__init__._MODULES`` — new
entries must not queue-jump the stalest-evidence queries at the registry
front (VERDICT r3 #1).

Reference parity: no reference analog; extends SURVEY §2.H alongside
n03b/n04b.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables, register
from .llm_queries import _cosine

#: hyperplane count -> 2^BITS buckets; planes from vectors 1..2*BITS
BITS = 4
#: result depth for recall@k
K = 10
#: component quantization scale (round(x*1000) -> BIGINT)
SCALE = 1000

#: (bit, vec_a, vec_b): plane_bit = quantized(vec_a) - quantized(vec_b)
_PLANE_PAIRS = [(j, 2 * j + 1, 2 * j + 2) for j in range(BITS)]

#: probe-code XOR masks: own bucket + flip each of the BITS bits once
FLIPS = [0] + [1 << j for j in range(BITS)]

#: DuckDB BIGINT dot product of two BIGINT lists (1-based indexing)
_DUCK_IDOT = (
    "list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]))"
)


@register(
    "n38_lsh_recall",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
        WHERE embedding IS NOT NULL AND len(embedding) > 0
    ), q AS (
        SELECT vec_id, v,
               list_transform(v, x -> CAST(round(x * {SCALE}) AS BIGINT)) AS qv
        FROM e
    ), pl AS (
        SELECT j.bit,
               list_transform(range(1, len(qa.qv) + 1),
                              i -> qa.qv[i] - qb.qv[i]) AS pv
        FROM (VALUES {", ".join(f"({j}, {a}, {b})" for j, a, b in _PLANE_PAIRS)})
             j(bit, ia, ib)
        JOIN q qa ON qa.vec_id = j.ia
        JOIN q qb ON qb.vec_id = j.ib
    ), coded AS (
        SELECT q.vec_id,
               SUM(CASE WHEN {_DUCK_IDOT.format(a="q.qv", b="pl.pv")} > 0
                        THEN (1::BIGINT << pl.bit) ELSE 0 END) AS code
        FROM q CROSS JOIN pl
        GROUP BY q.vec_id
    ), probe AS (
        SELECT DISTINCT xor(c.code, f.flip) AS code
        FROM (SELECT code FROM coded WHERE vec_id = 0) c,
             (SELECT unnest({FLIPS}) AS flip) f
    ), q0 AS (
        SELECT v AS qv0 FROM e WHERE vec_id = 0
    ), ranked AS (
        SELECT e.vec_id,
               ROUND(list_cosine_similarity(e.v, q0.qv0), 6) AS sim
        FROM e, q0
    ), exact_k AS (
        SELECT vec_id FROM ranked ORDER BY sim DESC, vec_id ASC LIMIT {K}
    ), cand AS (
        SELECT c.vec_id FROM coded c JOIN probe p ON c.code = p.code
    ), lsh_k AS (
        SELECT r.vec_id FROM ranked r JOIN cand c ON c.vec_id = r.vec_id
        ORDER BY r.sim DESC, r.vec_id ASC LIMIT {K}
    )
    SELECT CAST({K} AS INT) AS k,
           CAST((SELECT count(*) FROM exact_k x JOIN lsh_k l
                 ON l.vec_id = x.vec_id) AS BIGINT) AS hits,
           ROUND(CAST((SELECT count(*) FROM exact_k x JOIN lsh_k l
                       ON l.vec_id = x.vec_id) AS DOUBLE) / {K}, 6)
               AS recall_at_k,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS candidates,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS corpus,
           ROUND(CAST((SELECT count(*) FROM cand) AS DOUBLE)
                 / (SELECT count(*) FROM e), 6) AS scan_frac
    """,
)
def n38_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N38 (extension): engine-neutral signed-hyperplane LSH (4 data-
    adaptive perpendicular-bisector planes from the first 8 vectors,
    integer dot/threshold bucketing, multi-probe at Hamming <= 1) with
    in-query recall@10 against the exact scan — the hyperplane-LSH
    quality claim under the driver's exact hash gate, plus the
    scanned-candidate fraction."""
    from .ivf_eval import base_vectors

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    # base_vectors also drops vectors with non-finite components — the
    # round(x*SCALE) BIGINT quantization below shares ivf_eval's
    # CAST_OVERFLOW hazard (specials-corpus net r13).
    # materialize-before-reuse (OPTIMIZATION r16, see n37): base, quant,
    # coded, ranked and cand each feed 2+ consumers — unpinned, Catalyst
    # duplicated the subtrees (the before-plan scanned embeddings 17
    # times); the lazy pins cut it to one scan plus batch-sized frames.
    base = base_vectors(e).localCheckpoint(eager=False)
    quant = base.select(
        "vec_id",
        F.transform("v", lambda x: F.round(x * SCALE).cast("long")).alias("qv"),
    ).localCheckpoint(eager=False)
    pairs = spark.createDataFrame(_PLANE_PAIRS, "bit int, ia long, ib long")
    planes = (
        pairs.join(
            quant.select(F.col("vec_id").alias("ia"), F.col("qv").alias("qa")),
            "ia",
        )
        .join(
            quant.select(F.col("vec_id").alias("ib"), F.col("qv").alias("qb")),
            "ib",
        )
        .select("bit", F.zip_with("qa", "qb", lambda a, b: a - b).alias("pv"))
    )
    idot = F.aggregate(
        F.zip_with("qv", "pv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    coded = (
        quant.crossJoin(F.broadcast(planes))
        .select(
            "vec_id",
            F.when(idot > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
            .otherwise(F.lit(0).cast("long"))
            .alias("bitval"),
        )
        .groupBy("vec_id")
        .agg(F.sum("bitval").alias("code"))
        .localCheckpoint(eager=False)
    )
    flips = F.array(*[F.lit(f).cast("long") for f in FLIPS])
    probe = (
        coded.filter(F.col("vec_id") == 0)
        .select(F.explode(flips).alias("flip"), "code")
        .select(F.col("code").bitwiseXOR(F.col("flip")).alias("code"))
        .distinct()
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
        coded.join(F.broadcast(probe), "code")
        .select("vec_id")
        .localCheckpoint(eager=False)
    )
    lsh_k = (
        ranked.join(cand, "vec_id")
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(K)
        .select("vec_id")
    )
    hits = exact_k.join(lsh_k, "vec_id").agg(F.count(F.lit(1)).alias("hits"))
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
            # try_divide: an empty corpus yields NULL scan_frac instead of
            # an ANSI DIVIDE_BY_ZERO abort (the n37 degenerate-data
            # contract; DuckDB's x/0 is NULL, so the oracle agrees)
            F.round(
                F.try_divide(F.col("candidates").cast("double"), F.col("corpus")),
                6,
            ).alias("scan_frac"),
        )
    )
