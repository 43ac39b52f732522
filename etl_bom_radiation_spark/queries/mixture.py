"""Corpus mixture profiling (LLM-pipeline extension).

Training-data pipelines decide per-source mixture weights (how much of
each crawl/dump/source goes into a run) from source-level profiles:
volume, duplication, token budget, language spread. ``n27_source_mixture``
computes that profile in one pass over ``documents`` — the aggregation
that feeds the sampling weights consumed by n17 (stratified sample) and
n15 (deterministic shuffle-shard).

Registered after ``stream_joins`` in ``queries.__init__._MODULES`` — new
round-4 entries must not queue-jump the never-driver-verified queries at
the registry front (VERDICT r3 #1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables, register
from .llm_queries import _DUCK_TOKENS, _tokens


@register(
    "n27_source_mixture",
    oracle=f"""
    WITH d AS (
        SELECT source, lang, n_chars,
               md5(coalesce(text, '')) AS h,
               len({_DUCK_TOKENS}) AS ntok
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT h) AS BIGINT) AS n_unique_docs,
           CAST(sum(ntok) AS BIGINT) AS n_tokens,
           round(avg(n_chars), 6) AS avg_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM d GROUP BY source
    """,
)
def n27_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N27 (extension): per-source corpus profile — doc volume, exact-dup
    volume (md5 distinct), token budget, length and language spread. One
    scan, one groupBy on ``source`` with map-side partial aggregation;
    count(DISTINCT ...) expands via Spark's standard two-phase distinct
    aggregate. At 100 TB the cardinality is |sources| (tiny); the only
    shuffle key is ``source``, and a pathologically hot source is still
    bounded by the partial aggregation upstream."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    base = d.select(
        "source",
        "lang",
        "n_chars",
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("h"),
        F.size(_tokens(F.col("text"))).alias("ntok"),
    )
    return base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("h").alias("n_unique_docs"),
        F.sum("ntok").cast("bigint").alias("n_tokens"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
