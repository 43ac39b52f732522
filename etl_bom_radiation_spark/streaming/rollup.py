"""Incrementally-maintained hourly rollup (the 'hypertable rollup' pattern).

The analyst query the reference's layout exists for — hourly aggregates of
radiation by type — recomputed from raw points is a full scan per refresh.
At 100 TB the right structure is an incrementally-maintained rollup:

* each ingest micro-batch appends PARTIAL aggregates (count/sum/min/max per
  (RadiationType, year, month, day, hour)) — tiny rows, one per touched
  hour per batch;
* readers merge partials with a second aggregation (counts and sums add,
  mins/maxes fold, avg = merged sum / merged count) — algebraic aggregates
  compose, so the merged result is EXACTLY the full recompute;
* a periodic :func:`compact_rollup` folds accumulated partials into one row
  per group so reader cost stays O(groups), not O(batches x groups).

This is the same partial/final split Spark's own HashAggregate does inside
one query, lifted across micro-batches. Used by tests/test_rollup.py and
wireable into ingest via ``foreachBatch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KEYS = ["RadiationType", "year", "month", "day", "hour"]

def _partial_aggs():
    # built lazily: Column construction needs an active SparkContext
    return [
        F.count(F.lit(1)).alias("cnt"),
        F.sum("Radiation").alias("sum_rad"),
        F.min("Radiation").alias("min_rad"),
        F.max("Radiation").alias("max_rad"),
    ]


def append_hourly_partials(points: DataFrame, rollup_dir: str) -> None:
    """Reduce one batch of decoded points to per-hour partial aggregates and
    append them (a batch touches few hours -> few rows; the append is cheap
    and conflict-free)."""
    (
        points.groupBy(*KEYS)
        .agg(*_partial_aggs())
        .coalesce(1)
        .write.mode("append")
        .parquet(rollup_dir)
    )


def read_hourly_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """Merge partials into final per-hour aggregates. Algebraic merge:
    exact regardless of how many batches contributed to an hour."""
    p = spark.read.parquet(rollup_dir)
    return p.groupBy(*KEYS).agg(
        F.sum("cnt").alias("points"),
        (F.sum("sum_rad") / F.sum("cnt")).alias("avg_radiation"),
        F.min("min_rad").alias("min_radiation"),
        F.max("max_rad").alias("max_radiation"),
    )


def compact_rollup(spark: SparkSession, rollup_dir: str) -> None:
    """Fold all partials down to one row per group (reader cost back to
    O(groups)). Write-then-swap via an overwrite of the same directory is
    safe here because partials are re-derivable from the fact table."""
    p = spark.read.parquet(rollup_dir)
    folded = p.groupBy(*KEYS).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_rad").alias("sum_rad"),
        F.min("min_rad").alias("min_rad"),
        F.max("max_rad").alias("max_rad"),
    )
    # materialize before overwriting the source dir
    folded.cache()
    folded.count()
    folded.coalesce(1).write.mode("overwrite").parquet(rollup_dir)
    folded.unpersist()
