"""MinHash estimator accuracy, oracle-verified (LLM-pipeline extension).

The production near-dup path (n02) rides Spark ML's MinHashLSH, whose
hash family is JVM-internal — the driver can only rows-check it.
``n36_minhash_estimate`` closes that verification gap: an ENGINE-NEUTRAL
MinHash (the repo's 31-base polynomial hash over seeded shingle strings,
the same primitive n10/n11 already verify against DuckDB) computed
side-by-side with the exact Jaccard on consecutive doc pairs, plus the
estimation error.  The math the LSH path relies on —
``P(min_a = min_b) = J(A,B)`` per permutation — is thereby exercised
under the driver's exact hash gate, not just a recall pytest.

Scale shape (the part that must survive 100 TB):

* The signature build is shingle-explode x SEEDS (a constant 16x fan-out
  of the compact distinct-shingle frame) -> min-aggregate per (doc,
  seed): map-side combine collapses each partition to |docs| x SEEDS
  rows before the shuffle, and the signature table is 16 BIGINTs per doc
  — the usual MinHash sketch compression.
* The pair comparison joins SIGNATURES (16 rows per doc), never shingle
  sets; the exact-Jaccard column here is the sf-scale ground truth and
  pairs are linear (consecutive ids, n12's convention) — the all-pairs
  regime is exactly what the estimator exists to avoid.
* Integer hash mins and match counts; the two ratios are single IEEE
  divisions rounded on both engines.

Registered after ``provenance`` in ``queries.__init__._MODULES`` — new
round-4 entries must not queue-jump the never-driver-verified queries at
the registry front (VERDICT r3 #1).

Reference parity: no reference analog; extends SURVEY §2.H alongside
n02 (MinHash LSH) and n12 (exact n-gram Jaccard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables, register
from .llm_queries import (
    _DUCK_TOKENS,
    _duck_polyhash,
    _polyhash,
    _shingles,
    _tokens,
)

#: number of hash permutations in the sketch (16 BIGINTs per doc)
SEEDS = 16

#: DuckDB 2-gram shingles with _shingles' degenerate-doc clamp
_DUCK_SH2 = (
    "list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1) + 1), "
    "i -> concat_ws(' ', toks[i], toks[i+1])))"
)


@register(
    "n36_minhash_estimate",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents
    ), shs AS (
        SELECT doc_id, {_DUCK_SH2} AS s FROM t
    ), sh AS (
        SELECT doc_id, unnest(s) AS sh FROM shs
    ), seeded AS (
        SELECT doc_id, seed,
               {_duck_polyhash("concat('mh', seed, '-', sh)")} AS h
        FROM sh, unnest(range(0, {SEEDS})) AS sd(seed)
    ), sig AS (
        SELECT doc_id, seed, min(h) AS mn FROM seeded GROUP BY doc_id, seed
    ), est AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(sum(CASE WHEN a.mn = b.mn THEN 1 ELSE 0 END) AS BIGINT)
                   AS matching_mins
        FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 1 AND b.seed = a.seed
        GROUP BY a.doc_id, b.doc_id
    ), exact AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                     len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard_exact
        FROM shs a JOIN shs b ON b.doc_id = a.doc_id + 1
    )
    SELECT e.doc_a, e.doc_b, x.jaccard_exact, e.matching_mins,
           ROUND(CAST(e.matching_mins AS DOUBLE) / {SEEDS}, 6) AS minhash_est,
           ROUND(abs(x.jaccard_exact
                     - CAST(e.matching_mins AS DOUBLE) / {SEEDS}), 6) AS abs_err
    FROM est e JOIN exact x ON x.doc_a = e.doc_a AND x.doc_b = e.doc_b
    """,
)
def n36_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N36 (extension): engine-neutral MinHash sketch (16 seeded polyhash
    permutations over distinct 2-gram shingles) vs exact Jaccard on
    consecutive doc pairs, with the estimation error — the LSH path's
    core identity P(min_a = min_b) = J, verified under the exact hash
    gate instead of only a recall test."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    # tokenize-once discipline: materialize the token array before shingling
    toks = d.select("doc_id", _tokens(F.col("text")).alias("ws"))
    shs = toks.select("doc_id", F.array_distinct(_shingles("ws", 2)).alias("s"))
    sh = shs.select("doc_id", F.explode("s").alias("sh"))
    seeded = sh.crossJoin(
        F.broadcast(spark.range(SEEDS).select(F.col("id").cast("int").alias("seed")))
    ).select(
        "doc_id",
        "seed",
        _polyhash(
            F.concat(F.lit("mh"), F.col("seed").cast("string"), F.lit("-"), F.col("sh"))
        ).alias("h"),
    )
    # lazy localCheckpoint (the n29/n30 lever): the signature frame feeds
    # BOTH pair branches — without the barrier the whole shingle-explode x
    # seed fan-out x min-agg subtree (and its corpus scan) runs twice
    sig = (
        seeded.groupBy("doc_id", "seed")
        .agg(F.min("h").alias("mn"))
        .localCheckpoint(eager=False)
    )

    a = sig.select(
        F.col("doc_id").alias("doc_a"), F.col("seed").alias("sa"), F.col("mn").alias("ma")
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"), F.col("seed").alias("sb"), F.col("mn").alias("mb")
    )
    est = (
        a.join(b, (F.col("doc_b") == F.col("doc_a") + 1) & (F.col("sb") == F.col("sa")))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.when(F.col("ma") == F.col("mb"), 1).otherwise(0))
            .cast("long")
            .alias("matching_mins")
        )
    )
    xa = shs.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    xb = shs.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    exact = xa.join(xb, F.col("doc_b") == F.col("doc_a") + 1).select(
        "doc_a",
        "doc_b",
        F.round(
            F.size(F.array_intersect("sa", "sb")).cast("double")
            / F.size(F.array_union("sa", "sb")),
            6,
        ).alias("jaccard_exact"),
    )
    mh_est = F.col("matching_mins").cast("double") / SEEDS
    return est.join(exact, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        "jaccard_exact",
        "matching_mins",
        F.round(mh_est, 6).alias("minhash_est"),
        F.round(F.abs(F.col("jaccard_exact") - mh_est), 6).alias("abs_err"),
    )
