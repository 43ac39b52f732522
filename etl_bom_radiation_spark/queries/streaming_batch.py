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
    -- ts IS NOT NULL: Spark's window() emits no bucket for a NULL event
    -- time (streaming would drop it at the watermark anyway); DuckDB's
    -- time_bucket(NULL) would keep a NULL-bucket group
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
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
        -- ts IS NOT NULL: session_window, like window(), drops NULL event
        -- times on the Spark side (see t02)
        FROM events WHERE ts IS NOT NULL
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
    per event_id. The streaming form is ``dropDuplicatesWithinWatermark``
    (plain stateful ``dropDuplicates`` never evicts a non-event-time key —
    the scaling probe measured exactly-linear state growth), so its dedup
    guarantee is horizon-scoped while this batch form is global
    (tests/test_streaming.py::test_streaming_dedup + _state_eviction)."""
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
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts NULLS FIRST, event_id)
                AS BIGINT) AS seen_so_far,
           ROUND(SUM(value) OVER (PARTITION BY user_id
                                  ORDER BY ts NULLS FIRST, event_id
                                  ROWS UNBOUNDED PRECEDING), 2) AS value_so_far
    FROM events
    -- NULLS FIRST: Spark ascending sorts NULL ts first, DuckDB's default
    -- is nulls_last — pinned so the running prefix agrees on NULL keys
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


# ---------------------------------------------------------------- true
# streaming declared surface (rows-only: streaming state is not
# SQL-expressible, so these run REAL Structured Streaming queries and
# return their deterministic results; the driver records a rows-only
# check and pytest covers the semantics in tests/test_streaming.py).

def _fixture_grid_dir() -> str:
    from .grid_queries import GRID_DIR

    return GRID_DIR


def _localized(df: DataFrame) -> DataFrame:
    """Collect a (small) streaming result into a local-relation DataFrame so
    the caller can drop every temp dir/checkpoint immediately: the returned
    frame must stay collectable after cleanup, and plan consumers (the
    registry-wide window lint, gen_plans) should not re-trigger I/O."""
    return df.sparkSession.createDataFrame(df.collect(), df.schema)


@register("t01_stream_ingest", streaming=True)
def t01_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/S6/S8: REAL exactly-once streaming file ingest — drains the golden
    fixture grids through ingest_stream (file source + checkpoint +
    Trigger.AvailableNow), then runs a SECOND drain against the same
    checkpoint (no new files) and returns per-partition point counts: the
    counts prove the replay added nothing. The result is collected into a
    local relation so the temp workspace is deleted before returning."""
    import glob
    import os
    import shutil
    import tempfile

    from ..ingest import ingest_stream
    from ..workspace import init_workspace

    base = tempfile.mkdtemp(prefix="t01_ws_")
    ws = init_workspace(spark, base)
    for f in sorted(glob.glob(os.path.join(_fixture_grid_dir(), "*.txt"))):
        shutil.copy(f, os.path.join(base, "in"))
    ckpt = os.path.join(base, "ckpt")
    try:
        for _ in range(2):  # second run = restart/replay; must be a no-op
            q = ingest_stream(spark, ws, ckpt)
            q.awaitTermination()
        return _localized(
            spark.read.parquet(ws.data_dir)
            .groupBy("RadiationType", "year", "month", "day", "hour")
            .agg(F.count(F.lit(1)).alias("points"))
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register("t05_watermark_late_drop", streaming=True)
def t05_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: REAL watermark semantics — three sequential micro-batches through
    a continuous windowed-count query (append mode): batch 1 fills the
    10:00 window, batch 2 advances the watermark past it (the window
    finalizes and emits), batch 3 delivers a LATE event for the finalized
    window, which must be dropped. The returned single row (win 10:00,
    n=2 not 3) is the proof."""
    import json
    import os
    import shutil
    import tempfile
    import uuid

    from .. import streaming as S

    src = tempfile.mkdtemp(prefix="t05_src_")
    ckpt = tempfile.mkdtemp(prefix="t05_ckpt_")
    name = f"t05_sink_{uuid.uuid4().hex[:8]}"

    def _drop(fname: str, events: list[dict]) -> None:
        tmp = os.path.join(src, f".{fname}.tmp")
        with open(tmp, "w") as fh:
            for e in events:
                fh.write(json.dumps(e) + "\n")
        os.rename(tmp, os.path.join(src, fname))

    def _ev(eid: int, ts: str) -> dict:
        return {"event_id": eid, "ts": ts, "user_id": 1, "event_type": "click", "value": 1.0}

    stream = S.windowed_counts(S.read_event_stream(spark, src), "15 minutes", "30 minutes")
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        _drop("b1.json", [_ev(1, "2024-01-01 10:01:00"), _ev(2, "2024-01-01 10:07:00")])
        q.processAllAvailable()
        _drop("b2.json", [_ev(3, "2024-01-01 12:00:00")])  # watermark -> 11:30
        q.processAllAvailable()
        _drop("b3.json", [_ev(4, "2024-01-01 10:09:00")])  # LATE: behind watermark
        q.processAllAvailable()
    finally:
        q.stop()
    try:
        return _localized(spark.table(name).orderBy("win_start"))
    finally:
        spark.catalog.dropTempView(name)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


@register("t08_partition_hook", streaming=True)
def t08_partition_hook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8/D2-D4: the post-commit metadata hook end-to-end — streaming ingest
    with fq_table wired runs MSCK-once / ADD PARTITION synchronously inside
    foreachBatch (the reference fired Athena DDL asynchronously and accepted
    a visibility race, bom_partition.py:80,129). Returns SHOW PARTITIONS of
    the freshly registered table: one row per Sydney-local hour partition of
    the fixture grids."""
    import glob
    import os
    import shutil
    import tempfile
    import uuid

    from ..ingest import ingest_stream
    from ..workspace import create_database, init_workspace, register_table

    base = tempfile.mkdtemp(prefix="t08_ws_")
    ws = init_workspace(spark, base)
    for f in sorted(glob.glob(os.path.join(_fixture_grid_dir(), "*.txt"))):
        shutil.copy(f, os.path.join(base, "in"))
    # unique DB per run, dropped on the way out (ADVICE r3: the fixed
    # 't08_hook' DB accreted in the session catalog and was never cleaned)
    db = create_database(spark, f"t08-hook-{uuid.uuid4().hex[:8]}")
    fq = register_table(spark, db, "radiation", ws)
    try:
        q = ingest_stream(spark, ws, os.path.join(base, "ckpt"), fq_table=fq)
        q.awaitTermination()
        return _localized(spark.sql(f"SHOW PARTITIONS {fq}").orderBy("partition"))
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        shutil.rmtree(base, ignore_errors=True)
