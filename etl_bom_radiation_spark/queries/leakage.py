"""Train/test split leakage audit (LLM-pipeline extension).

A deterministic split (n16) guarantees *membership* hygiene — no doc in
both halves — but says nothing about *content* hygiene: near-identical
docs landing on opposite sides of the split leak evaluation signal into
training.  ``n33_split_leakage`` measures that directly: for every test
document, the fraction of its distinct word-3-gram shingles that also
occur anywhere in the train half.  High-leak test docs are the ones a
benchmark-decontamination pass (n14) would flag if the test half were
the benchmark — this is the same audit turned inward on the engine's
own split.

Scale shape (the part that must survive 100 TB):

* Membership is n16's pure hash predicate — narrow, no split table to
  join.
* Both shingle sides are corpus-scale, so the overlap join is a shuffle
  equi-join on the shingle — uniform text keys at 3-gram granularity
  (no single shingle dominates a corpus the way a hot user id can; the
  residual skew lever is AQE skew-join, on in the session conf).
* The train side is deduplicated to DISTINCT shingles before the join
  (map-side combine, then it is the smaller, compressed side) and
  carries a constant marker column, never text payload.
* One aggregation produces both the totals and the leaked counts
  (LEFT JOIN + conditional sum — the n29 single-pass discipline), so
  the test side is scanned once, not once per metric.

Determinism: counts are BIGINT; ``leak_frac`` is one IEEE division of
two exact integers, rounded to 6 dp on both engines.

Registered after ``scd`` in ``queries.__init__._MODULES`` — new round-4
entries must not queue-jump the never-driver-verified queries at the
registry front (VERDICT r3 #1).

Reference parity: no reference analog; extends SURVEY §2.H alongside
n14 (decontamination) and n16 (split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables, register
from .llm_queries import _DUCK_TOKENS, _shingles, _tokens

#: shingle width for the leakage audit (3-grams: the n14 decontamination
#: convention)
N_GRAM = 3

#: DuckDB n-gram shingles with _shingles' degenerate-doc clamp (a doc with
#: fewer than N_GRAM tokens yields one degenerate shingle, exactly like the
#: Spark side) — parameterized by N_GRAM so the two engines cannot drift
#: (code-review r4)
_DUCK_SH = (
    f"list_distinct(list_transform("
    f"range(1, greatest(len(toks) - {N_GRAM - 1}, 1) + 1), "
    "i -> concat_ws(' ', "
    + ", ".join(f"toks[i+{k}]" if k else "toks[i]" for k in range(N_GRAM))
    + ")))"
)


@register(
    "n33_split_leakage",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_DUCK_TOKENS} AS toks,
               CASE WHEN SUBSTR(md5('split42-' || CAST(doc_id AS VARCHAR)), 1, 1)
                         IN ('0', '1') THEN 'test' ELSE 'train' END AS split
        FROM documents
    ), sh AS (
        SELECT doc_id, split, unnest({_DUCK_SH}) AS s
        FROM t
    ), train_sh AS (
        SELECT DISTINCT s FROM sh WHERE split = 'train'
    )
    SELECT k.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN tr.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_leaked,
           ROUND(CAST(sum(CASE WHEN tr.s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS leak_frac
    FROM (SELECT * FROM sh WHERE split = 'test') k
    LEFT JOIN train_sh tr ON k.s = tr.s
    GROUP BY k.doc_id
    """,
)
def n33_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N33 (extension): per-test-doc fraction of distinct 3-gram shingles
    that also occur in the train half of n16's deterministic split — the
    decontamination audit (n14) turned inward on the engine's own split.
    Single pass: LEFT JOIN against the deduped train shingle set plus one
    conditional sum yields totals and leaked counts together."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    nib = F.substring(
        F.md5(F.concat(F.lit("split42-"), F.col("doc_id").cast("string"))), 1, 1
    )
    base = d.select(
        "doc_id",
        F.when(nib.isin("0", "1"), "test").otherwise("train").alias("split"),
        _tokens(F.col("text")).alias("ws"),
    )
    # materialize-before-explode (round 6, the n36 lesson): checkpoint the
    # computed shingle array so the Generate iterates a bound column — and
    # the barrier also pins the frame for the train/test branches below
    sharr = base.select(
        "doc_id", "split", F.array_distinct(_shingles("ws", N_GRAM)).alias("sa")
    ).localCheckpoint(eager=False)
    sh = sharr.select("doc_id", "split", F.explode("sa").alias("s"))
    train_sh = (
        sh.filter(F.col("split") == "train")
        .select("s")
        .distinct()
        .withColumn("in_train", F.lit(1))
    )
    test_sh = sh.filter(F.col("split") == "test").select("doc_id", "s")
    return (
        test_sh.join(train_sh, "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("in_train").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_leaked"),
            F.round(
                F.sum(F.when(F.col("in_train").isNotNull(), 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("leak_frac"),
        )
    )
