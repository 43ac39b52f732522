"""Streaming operators in their batch-expressible form — T2/T3/T4/T6
(SURVEY §2.F) over the ``events`` table, each with a DuckDB oracle.

The same window/session/dedup expressions run unchanged under
``readStream`` (tests/test_streaming.py drives them through file sources
with watermarks, checkpoints and AvailableNow); the driver-checked batch
forms pin the SEMANTICS: window alignment, session merging, dedup keys.

Alignment note: Spark ``window()`` buckets align to the unix epoch; DuckDB
``time_bucket`` aligns to 2000-01-03 for day-multiples but to the epoch for
sub-day intervals that divide a day evenly — 1 hour and 15 minutes both
qualify, so the two agree here.

Scale notes: tumbling/sliding aggregation shuffles once on (key, window);
in streaming the state store holds one row per open window — watermarks
(T5) bound that state. Session windows merge in the state store per key;
the batch equivalent is the classic gaps-and-islands (lag + cumsum), ONE
shuffle on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import load_events, register


@register(
    "t02_tumbling_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M') AS win_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events GROUP BY 1, 2
    """,
)
def t02_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: tumbling 1-hour window aggregation per event type — the hourly
    partition bucketing of the reference's layout (bom.py:31) as a windowed
    group-by."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


@register(
    "t03_sliding_window",
    oracle="""
    WITH slid AS (
        SELECT e.*, time_bucket(INTERVAL '15 minutes', e.ts)
                     - to_minutes(15 * k.k) AS win_start
        FROM events e, unnest(range(0, 4)) AS k(k)
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M') AS win_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM slid
    WHERE ts >= win_start AND ts < win_start + INTERVAL '1 hour'
    GROUP BY 1
    """,
)
def t03_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: sliding window (1 hour, 15-minute slide) — each event lands in 4
    windows. The oracle derives the same windows via bucket-minus-k-slides."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        # sum+count, not avg: a rounded AVG of 2dp values lands on exact .5
        # ties where Spark (BigDecimal expansion) and DuckDB (scaled double)
        # round differently — SURVEY §7 risk 3
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("win_start"),
            "n",
            "total",
        )
    )


@register(
    "t04_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL '30 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total
    FROM numbered GROUP BY user_id, session_id
    """,
)
def t04_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: session window (30-minute gap) per user. Spark's native
    ``session_window`` merges adjacent events into dynamic sessions; the
    oracle reproduces it with gaps-and-islands. Session identity is
    (user_id, session_start), deterministic."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "total",
        )
    )


@register(
    "t06_dedup",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT DISTINCT event_id, event_type, user_id, ts, value FROM (
            SELECT event_id, event_type, user_id, ts, value FROM events
            UNION ALL
            SELECT event_id, event_type, user_id, ts, value FROM events))
    GROUP BY event_type
    """,
)
def t06_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: dedup on event identity — duplicated input (self-union, the
    batch stand-in for at-least-once delivery) collapses back to one row
    per event_id. In streaming the same ``dropDuplicates`` runs against the
    state store with a watermark bounding retained keys
    (tests/test_streaming.py::test_streaming_dedup)."""
    ev = load_events(spark, sf_dir).select("event_id", "event_type", "user_id", "ts", "value")
    doubled = ev.unionAll(ev)
    return (
        doubled.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "t07_stateful_running",
    oracle="""
    SELECT user_id, event_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT) AS seen_so_far,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2) AS value_so_far
    FROM events
    """,
)
def t07_stateful_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 batch form: per-key running state (event count + value sum) — what
    the stateful processor accumulates incrementally in streaming
    (tests/test_streaming.py::test_stateful_per_key drives the
    transformWithStateInPandas/applyInPandasWithState version; this batch
    window form pins the state-transition semantics and is exactly
    SQL-expressible)."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.row_number().over(w).cast("bigint").alias("seen_so_far"),
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias(
            "value_so_far"
        ),
    )
