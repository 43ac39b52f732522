"""Bloom-filter admission prefilter for incremental corpus merge (n45).

The 100-TB problem: admitting a new crawl batch into an existing corpus
(n31_incremental_merge) anti-joins incoming digests against the full
corpus digest set — a shuffle whose build side is the ENTIRE corpus.  The
standard production lever is a Bloom filter: an m-bit set summary of the
corpus digests, small enough to broadcast, that filters the incoming scan
down to bloom-positive candidates BEFORE the exact anti-join.  Bloom
membership has no false negatives, so the prefilter is sound (a doc the
bloom rejects is definitely new → admit without joining); only the
bloom-positive sliver (true dups + false positives) pays the shuffle.

``n45_bloom_prefilter`` makes that lever itself a *measured, declared
query*: it builds a k=3 / m=1024 Bloom set over the corpus half of
``documents`` (sources src0..src9), probes the incoming half
(src10..src19), and reports per-source totals, bloom-flagged candidates,
exact-verified true dups, and the false-positive count — i.e. the
operator verifies its own FP-rate claim under the exact DuckDB oracle,
the same pattern as n36 (MinHash estimator) / n37 (IVF recall).

The admission key is the 16-char prefix digest ``md5(substr(text,1,16))``
— the n32 truncation-dedup key, so "already in the corpus" means the same
thing at admission time as in the batch dedup pass (and the fixture
corpus contains real cross-half truncation dups, so the true-dup path is
exercised, not vacuously zero).

Engine-neutral construction (no JVM bloom internals leak into results):
bit positions are ``conv(substr(digest, 1+8i, 8), 16, 10) % 1024``
for i=0,1,2 — md5 hex and hex→int agree bit-for-bit across Spark and
DuckDB (same parity trick as n10/n15/q42).  The "bitset" is the DISTINCT
position relation (≤1024 rows), broadcast to three hash joins — at any
corpus size the build side of the probe stays ≤ m rows, which is the
whole point.  In production the same positions pack into BIGINT words
with ``bit_or`` for an O(m/64)-row broadcast, or Spark's native
``DataFrameStatFunctions.bloomFilter`` / runtime bloom-filter join does
it below the API (``tests/test_approx_ops.py`` fences the native path's
no-false-negative contract against this query's exact counts).

m=1024 is deliberately small for the fixtures so collisions are
*observable* (a measurable n_false_pos > 0 at sf0.01); production sizes
m per the standard (-n ln p / ln^2 2) formula.

Reference parity: the reference admits every incoming file
unconditionally (reference bom.py:49-66 processes whatever lands in
input/); dedup-on-admission is part of the NS extension surface
(BASELINE.json) this engine owns natively.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables, register

M_BITS = 1024
K_HASHES = 3


def _duck_pos(i: int) -> str:
    return f"(('0x' || substr(digest, {1 + 8 * i}, 8))::BIGINT) % {M_BITS}"


_ORACLE = f"""
WITH corpus AS (
  SELECT md5(substr(text, 1, 16)) AS digest
  FROM documents WHERE length(source) = 4
), inc AS (
  SELECT doc_id, source, md5(substr(text, 1, 16)) AS digest
  FROM documents WHERE length(source) = 5
), build AS (
  SELECT DISTINCT pos FROM (
    SELECT {_duck_pos(0)} AS pos FROM corpus
    UNION ALL SELECT {_duck_pos(1)} FROM corpus
    UNION ALL SELECT {_duck_pos(2)} FROM corpus
  )
), flags AS (
  SELECT source,
         CASE WHEN {_duck_pos(0)} IN (SELECT pos FROM build)
               AND {_duck_pos(1)} IN (SELECT pos FROM build)
               AND {_duck_pos(2)} IN (SELECT pos FROM build)
              THEN 1 ELSE 0 END AS bloom_hit,
         CASE WHEN digest IN (SELECT digest FROM corpus)
              THEN 1 ELSE 0 END AS true_dup
  FROM inc
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(bloom_hit) AS BIGINT) AS n_flagged,
       CAST(SUM(true_dup) AS BIGINT) AS n_true_dup,
       CAST(SUM(CASE WHEN bloom_hit = 1 AND true_dup = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos
FROM flags
GROUP BY source
"""


def _spark_pos(i: int):
    """Bit position i of the current row's ``digest`` column (BIGINT)."""
    return (
        F.conv(F.substring("digest", 1 + 8 * i, 8), 16, 10).cast("bigint")
        % F.lit(M_BITS)
    )


def bloom_flagged(corpus: DataFrame, incoming: DataFrame) -> DataFrame:
    """Annotate ``incoming`` (needs a ``digest`` column) with
    ``bloom_hit`` ∈ {0,1} from a k=3/m=1024 Bloom set built over
    ``corpus.digest``.  Build side is ≤ M_BITS rows → always broadcast;
    probe side stays narrow (three broadcast hash joins, no shuffle)."""
    # lazy localCheckpoint (the boilerplate.py / scale.py lever): the build
    # set feeds K_HASHES broadcast joins, and without a materialization
    # barrier Catalyst re-executes the corpus scan + explode + distinct
    # subtree once per join — K extra corpus reads at 100 TB. One
    # checkpoint = one corpus scan; all three broadcasts read the <= m-row
    # position frame.
    build = (
        corpus.select(
            F.explode(F.array(*[_spark_pos(i) for i in range(K_HASHES)])).alias("bpos")
        )
        .distinct()
        .withColumn("bone", F.lit(1))
        .localCheckpoint(eager=False)
    )
    probed = incoming
    for i in range(K_HASHES):
        b = F.broadcast(
            build.select(F.col("bpos").alias(f"bpos{i}"), F.col("bone").alias(f"hit{i}"))
        )
        probed = probed.join(b, _spark_pos(i) == F.col(f"bpos{i}"), "left")
    all_hit = reduce(
        lambda a, b: a & b,
        [F.col(f"hit{i}").isNotNull() for i in range(K_HASHES)],
    )
    return probed.withColumn("bloom_hit", all_hit.cast("int")).drop(
        *[c for i in range(K_HASHES) for c in (f"bpos{i}", f"hit{i}")]
    )


@register("n45_bloom_prefilter", oracle=_ORACLE)
def n45_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N45: Bloom-filter admission prefilter, self-measuring — per
    incoming source: docs, bloom-flagged candidates, exact true dups, and
    false positives (k=3, m=1024 over md5 bit positions; build side ≤ m
    rows, broadcast; no false negatives by construction)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    digest = F.md5(F.substring("text", 1, 16))
    # one corpus scan total: the digest frame feeds both the bloom build
    # and the exact truth join (lazy checkpoint = materialization barrier)
    corpus = (
        docs.filter(F.length("source") == 4)
        .select(digest.alias("digest"))
        .localCheckpoint(eager=False)
    )
    incoming = docs.filter(F.length("source") == 5).select(
        "doc_id", "source", digest.alias("digest")
    )
    flagged = bloom_flagged(corpus, incoming)
    # NOT broadcast-hinted: at corpus scale this truth join IS the n31
    # anti-join the bloom exists to prefilter — the measurement query
    # keeps it a plain equi-join (at fixture size Catalyst already
    # broadcasts the checkpointed digest frame at static planning, which
    # is what the >=4-BroadcastHashJoin plan assert observes).
    truth = corpus.select("digest").distinct().withColumn("tone", F.lit(1))
    verified = flagged.join(truth, "digest", "left").withColumn(
        "true_dup", F.col("tone").isNotNull().cast("int")
    )
    return verified.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("bloom_hit").cast("bigint").alias("n_flagged"),
        F.sum("true_dup").cast("bigint").alias("n_true_dup"),
        F.sum(
            ((F.col("bloom_hit") == 1) & (F.col("true_dup") == 0)).cast("int")
        )
        .cast("bigint")
        .alias("n_false_pos"),
    )
