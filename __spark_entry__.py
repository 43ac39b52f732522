"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Everything here delegates to the package registry
(`etl_bom_radiation_spark.queries`): each operator module registers its
(spark fn, DuckDB oracle) pairs at import time.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: ESRI-grid decode (SURVEY §2.C, G1-G6) over the golden
    fixtures, rolled up to the Sydney-local hour partitions the reference's
    layout exists for (bom.py:28-32), joined with an sf0.001 lineitem
    aggregate so the smoke exercises scan→explode→filter→project→agg→join
    end-to-end. Driver checks rows > 0 and a stable schema."""
    from etl_bom_radiation_spark.grid.decode import decode_grid_directory

    # driver-owned session: pin the TZ the partition columns assume
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    points = decode_grid_directory(spark, os.path.join(_REPO, "fixtures", "grids"))
    hourly = points.groupBy("RadiationType", "year", "month", "day", "hour").agg(
        F.count(F.lit(1)).alias("points"),
        F.round(F.avg("Radiation"), 4).alias("avg_radiation"),
        F.round(F.min("Longitude"), 6).alias("west"),
        F.round(F.max("Longitude"), 6).alias("east"),
    )
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li_stats = li.agg(
        F.count(F.lit(1)).alias("lineitem_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("lineitem_revenue"),
    )
    return hourly.crossJoin(F.broadcast(li_stats))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed/aggregate column is aliased to match ``oracle_sql``.
    """
    from etl_bom_radiation_spark.queries import load_all

    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """For each key in ``queries()``, equivalent ANSI SQL runnable by
    DuckDB on the same parquet tables (pre-registered views: region
    nation customer supplier part orders lineitem events documents
    embeddings). Genuinely non-SQL-expressible ops (streaming state,
    approximate sketches, LSH) register oracle=None and are omitted here →
    the driver records a weaker rows-only check.
    """
    from etl_bom_radiation_spark.queries import load_all

    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
