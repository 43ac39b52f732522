"""Training-sequence packing manifest (LLM-pipeline extension).

Pretraining doesn't feed documents to the model — it feeds fixed-length
sequences built by concatenating shuffled documents and chunking the
stream at the context budget (the GPT-style concat-then-chunk pack).
``n34_sequence_packing`` produces the packing manifest: which pack each
document starts in, and per-pack document/token totals plus the fill
fraction.

Scale shape (the part that must survive 100 TB):

* The concatenation ORDER is n15's deterministic shuffle (md5 epoch key),
  and packing runs **per shard** (8 here, thousands in production):
  the running token offset is a window partitioned by ``shard_id`` — the
  way distributed packing actually works, and the reason this query never
  needs a global (single-task) running sum.  A global concat order would
  serialize the corpus through one task; per-shard order is exactly as
  statistically shuffled and embarrassingly parallel.
* Everything is integers (token counts, offsets, pack ids); the only
  float is the final fill-fraction division, one IEEE op rounded on both
  engines.
* Documents longer than the budget are their own (overflowing) packs —
  the manifest records them honestly via ``fill_frac > 1`` rather than
  silently truncating; a real tokenizer stage would split them upstream.

Registered after ``leakage`` in ``queries.__init__._MODULES`` — new
round-4 entries must not queue-jump the never-driver-verified queries at
the registry front (VERDICT r3 #1).

Reference parity: no reference analog; extends SURVEY §2.H alongside
n15 (deterministic shuffle) and n25 (context chunking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import load_tables, register
from .llm_queries import _DUCK_TOKENS, _tokens

#: context budget (tokens per training sequence)
BUDGET = 512
#: shard count for per-shard packing (thousands in production)
SHARDS = 8


@register(
    "n34_sequence_packing",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               md5('epoch7-' || CAST(doc_id AS VARCHAR)) AS k,
               len({_DUCK_TOKENS}) AS n_tokens
        FROM documents
    ), sharded AS (
        SELECT doc_id, k, n_tokens,
               (ascii(substr(k, 1, 1)) * 256 + ascii(substr(k, 2, 1)))
                   % {SHARDS} AS shard_id
        FROM t
    ), offs AS (
        SELECT shard_id, doc_id, n_tokens,
               coalesce(sum(n_tokens) OVER (PARTITION BY shard_id
                                            ORDER BY k, doc_id
                                            ROWS BETWEEN UNBOUNDED PRECEDING
                                                     AND 1 PRECEDING), 0)
                   AS start_off
        FROM sharded
    )
    SELECT CAST(shard_id AS BIGINT) AS shard_id,
           CAST(start_off // {BUDGET} AS BIGINT) AS pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           ROUND(CAST(sum(n_tokens) AS DOUBLE) / {BUDGET}, 6) AS fill_frac
    FROM offs
    GROUP BY shard_id, start_off // {BUDGET}
    """,
)
def n34_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N34 (extension): concat-then-chunk packing manifest — docs ordered
    by n15's deterministic epoch key, token offsets accumulated per shard
    (window partitioned on shard_id — never a global running sum), each
    doc assigned to the pack its start offset lands in; per-pack doc and
    token totals plus fill fraction."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    k = F.md5(F.concat(F.lit("epoch7-"), F.col("doc_id").cast("string")))
    t = d.select(
        "doc_id",
        k.alias("k"),
        F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    # shard from the first two hex chars of the epoch key — engine-neutral
    # byte arithmetic (ascii on both sides), uniform across shards
    shard = (
        F.ascii(F.substring("k", 1, 1)) * 256 + F.ascii(F.substring("k", 2, 1))
    ) % SHARDS
    w = (
        Window.partitionBy("shard_id")
        .orderBy("k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = t.withColumn("shard_id", shard.cast("long")).withColumn(
        "start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        offs.groupBy(
            "shard_id",
            F.floor(F.col("start_off") / BUDGET).alias("pack_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.round(F.sum("n_tokens").cast("double") / BUDGET, 6).alias("fill_frac"),
        )
    )
