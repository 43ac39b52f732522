"""Source-authority PageRank over the content-overlap graph
(LLM-pipeline extension).

``n47_source_pagerank`` turns n35's provenance matrix into a per-source
authority score: sources that share content fingerprints with many other
well-connected sources rank high (mirror hubs, syndication upstreams),
sources with no cross-source overlap sit at the teleport floor.  This is
the domain/source-graph weighting step of web-corpus pipelines (link- or
overlap-graph authority as a quality prior for mixture design — the same
role domain PageRank plays in CommonCrawl-derived corpora), expressed as
an ITERATIVE operator family entry: n20/n43 put iterative connected
components under the exact hash gate; this adds the weighted
fixed-iteration linear-algebra class.

Exactness across engines (what makes an iterative float algorithm
hash-checkable): ranks live in integer MICRO-UNITS (start 1_000_000 per
node) and every update is integer arithmetic only —

    contrib(u->v) = (r_u * w_uv) div W_u           (floor division)
    r'_v          = 150_000 + (85 * sum contrib) div 100

i.e. damping 0.85 and teleport 0.15 as exact integer scalings.  Floor
division and integer sums are order-independent, so ANY join order /
partitioning / accumulation order gives bit-identical BIGINTs on both
engines; ITERS is a fixed constant, not a convergence test (a float
epsilon would diverge between engines).  The few parts-per-thousand of
rank mass the flooring leaks is the price of determinism and is
identical on both sides.

Scale shape (the part that must survive 100 TB):

* The corpus is touched ONCE: distinct (prefix-K fingerprint, source) —
  n35's collapse, uniform 16-byte keys, map-side combine.  Everything
  after operates on the aggregated graph: |V| = |sources| (thousands to
  ~1e5 at web scale), |E| bounded by the fingerprint co-occurrence
  structure with per-key fan-out bounded by |sources| after the
  collapse.
* The edge frame (with per-source out-weight joined on) is pinned with
  ``localCheckpoint`` so the corpus-scale extraction computes once, not
  once per iteration.
* Each of the ITERS iterations is two metadata-sized shuffles (a join
  of the tiny rank frame against the edge frame — rank broadcasts — and
  a groupBy on the destination source); nothing in the loop rescans or
  reshuffles the corpus.

Registered after ``scale_lifecycle`` in ``queries.__init__._MODULES`` —
new entries must not queue-jump the stalest-evidence queries at the
registry front (VERDICT r3 #1).

Reference parity: no reference analog (the reference has no LLM
surface); extends SURVEY §2.H's provenance family (n27/n35/n46) with
the authority-weighting step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables, register
from .provenance import SRC_FP_CTES, source_fingerprints

#: fixed PageRank iterations — a constant, not a convergence test (see
#: module docstring); 8 is past practical convergence for graphs whose
#: diameter is small (overlap graphs are near-cliques per mirror group)
ITERS = 8

_ORACLE_BASE = f"""
    {SRC_FP_CTES},
    e AS (SELECT a.source AS src, b.source AS dst,
                 CAST(count(*) AS BIGINT) AS w
          FROM ds a JOIN ds b ON a.h = b.h AND a.source <> b.source
          GROUP BY 1, 2),
    nodes AS (SELECT DISTINCT source FROM documents WHERE source IS NOT NULL),
    wu AS (SELECT src, SUM(w) AS wsum FROM e GROUP BY 1),
    wu2 AS (SELECT n.source AS src, COALESCE(wu.wsum, 1) AS wsum
            FROM nodes n LEFT JOIN wu ON wu.src = n.source),
    pr0 AS (SELECT source, CAST(1000000 AS BIGINT) AS r FROM nodes)"""

#: one unrolled iteration (the oracle avoids WITH RECURSIVE: aggregation
#: inside a recursive term is restricted, and unrolled CTEs make the
#: fixed-ITERS semantics literal)
_ORACLE_STEP = """
    pr{i} AS (
      SELECT n.source,
             CAST(150000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS v, SUM((p.r * e.w) // w2.wsum) AS s
        FROM pr{j} p
        JOIN e ON e.src = p.source
        JOIN wu2 w2 ON w2.src = p.source
        GROUP BY e.dst) c ON c.v = n.source)"""

_ORACLE = (
    "WITH "
    + _ORACLE_BASE
    + ","
    + ",".join(_ORACLE_STEP.format(i=i, j=i - 1) for i in range(1, ITERS + 1))
    + f"""
    SELECT p.source,
           CAST(COALESCE(wu.wsum, 0) AS BIGINT) AS wsum,
           p.r AS rank_micro
    FROM pr{ITERS} p LEFT JOIN wu ON wu.src = p.source
    """
)


def pagerank_step(nodes: DataFrame, ew: DataFrame, ranks: DataFrame) -> DataFrame:
    """One exact-integer PageRank update: contributions off the pinned
    edge frame, damped + teleport fold onto the full node set.  Exposed
    as a function so the plan test can assert the LOOP BODY itself never
    touches a FileScan (the per-iteration checkpoints make the final
    plan structurally blind to what the loop re-reads — a first version
    re-scanned the corpus for ``nodes`` every iteration and the
    final-plan assert could not see it; code-review r7)."""
    contrib = (
        ranks.join(ew, F.col("source") == F.col("src"))
        .select(
            F.col("dst").alias("source"),
            F.expr("(r * w) div wsum").alias("c"),
        )
        .groupBy("source")
        .agg(F.sum("c").alias("s"))
    )
    return nodes.join(contrib, "source", "left_outer").select(
        "source",
        (F.lit(150000) + F.expr("(85 * coalesce(s, 0L)) div 100"))
        .cast("long")
        .alias("r"),
    )


@register("n47_source_pagerank", oracle=_ORACLE)
def n47_source_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N47 (extension): per-source PageRank over the symmetric
    shared-fingerprint graph (n35's matrix as weighted edges), ITERS
    fixed iterations in exact BIGINT micro-unit arithmetic — the
    authority prior for source weighting. One corpus pass builds the
    graph (checkpoint-pinned); the loop shuffles only metadata-sized
    frames."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    # BOTH corpus-derived frames are pinned before the loop: the edge
    # frame AND the node list — an un-pinned nodes re-scans documents +
    # re-runs its distinct in every iteration (code-review r7)
    nodes = (
        d.filter(F.col("source").isNotNull())
        .select("source")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # shared provenance-family collapse, pinned so the self-join's two
    # sides (and nothing else) read it
    ds = source_fingerprints(d).localCheckpoint(eager=False)
    a = ds.select("h", F.col("source").alias("src"))
    b = ds.select("h", F.col("source").alias("dst"))
    e = (
        a.join(b, "h")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    wu = e.groupBy("src").agg(F.sum("w").alias("wsum"))
    ew = e.join(wu, "src").localCheckpoint(eager=False)
    ranks = nodes.select("source", F.lit(1000000).cast("long").alias("r"))
    for _ in range(ITERS):
        # lineage truncation per iteration (the GraphX/ALS pattern)
        # keeps Catalyst analysis linear in ITERS instead of nesting
        # every prior iteration's plan.  Warm runtime (~2.5 s at any
        # small sf) is per-iteration JOB latency — the documented cost
        # of driver-coordinated iteration, same class as q51's
        # per-level jobs — not corpus work; the corpus passes happen
        # once, above.
        ranks = pagerank_step(nodes, ew, ranks).localCheckpoint(eager=False)
    # the reported out-weight comes from the CHECKPOINTED edge frame (each
    # edge row carries wsum), never from wu's un-pinned lineage — the plan
    # audit caught the original wu join re-running the corpus collapse for
    # this final projection
    wu_final = ew.select(F.col("src").alias("source"), "wsum").distinct()
    return (
        ranks.join(wu_final, "source", "left_outer")
        .select(
            "source",
            F.coalesce(F.col("wsum"), F.lit(0)).cast("long").alias("wsum"),
            F.col("r").alias("rank_micro"),
        )
    )
