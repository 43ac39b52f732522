"""Structured Streaming surface (SURVEY §2.F T1-T8).

The reference is event-driven (S3 ObjectCreated -> Lambda per file,
reference bom-create-bucket/bom_create_bucket.py:80-118); this module is
the genuine streaming counterpart: file sources + checkpoints for
exactly-once (T1 lives in :mod:`..ingest`), watermarked windows (T2/T3/T5),
streaming dedup (T6), and custom per-key state (T7).

Every transformation here is also valid on a batch DataFrame — the
driver-checked batch forms live in :mod:`..queries.streaming_batch`; this
module adds the streaming-only pieces (watermarks, state, sinks) that SQL
cannot express, which the test suite drives end-to-end
(tests/test_streaming.py).

Scale notes: watermarks bound the state store (without one, windowed state
grows forever); ``maxFilesPerTrigger`` caps per-batch work for backpressure
on 100 TB backfills; state rows are per (key, window) — keep keys
high-cardinality-safe (user_id, event_id) and gaps bounded.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """JSON-lines event file source (the stand-in for a queue/bus source;
    swap format for kafka on a real deployment — same downstream plan)."""
    reader = spark.readStream.format("json").schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def windowed_counts(
    events: DataFrame, window: str = "15 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """T2+T5: tumbling-window counts with a watermark. In append mode a
    window is emitted once, when the watermark passes its end; events older
    than the watermark are dropped (late-data policy) — the ad-hoc
    old-file arrivals of the reference (README.md:6) made explicit."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("win_start"),
            "n",
            "total",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T6: streaming dedup on event identity. The watermark bounds the
    key-retention state: an event_id older than the watermark can no longer
    collide, so its state row is dropped.

    ``dropDuplicatesWithinWatermark`` — NOT plain ``dropDuplicates`` — is
    what delivers that bound: with the event-time column absent from the
    dedup key, plain ``dropDuplicates`` retains every key forever (the
    scaling probe measured exactly-linear state growth, ratio 10.0 at 10x
    input, before this fix; ``tools/scaling_probe.py --streaming``).  The
    contract is correspondingly horizon-scoped: a duplicate is suppressed
    iff it arrives within the watermark delay of the first sighting — the
    right trade for at-least-once redelivery, which re-sends promptly, and
    the only state bound that survives an unbounded stream."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def running_totals_stateful(events: DataFrame) -> DataFrame:
    """T7: custom per-key state via applyInPandasWithState — a running
    (count, sum) per user maintained across micro-batches; each batch emits
    the updated totals for the users it touched. This is the semantics of
    the reference's per-file state transitions (bom.py:46-54) generalized
    to per-key accumulators."""

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id LONG, n_events LONG, total_value DOUBLE",
        stateStructType="n LONG, total DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_completion(df: DataFrame, checkpoint: str, query_name: str, timeout_s: int = 120):
    """Drain all available input into a memory sink (AvailableNow), blocking
    until done — the test-suite driver for streaming queries."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q


def transform_with_state_available() -> bool:
    """Spark 4's transformWithStateInPandas needs the protobuf package for
    its state-server protocol; this container lacks it (and installs are
    out), so the operator below is gated rather than assumed."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def sessionize_stateful(events: DataFrame, gap_s: float = 1800.0) -> DataFrame:
    """T7b: per-user sessionization on the Spark 4 ``transformWithState``
    API — the successor to applyInPandasWithState (T7) with named state
    variables, timers, and schema evolution. Maintains (last_ts, sessions,
    events) per user in a ValueState; a new session starts when the gap
    since the previous event exceeds ``gap_s``.

    Requires the RocksDB state store provider (set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...state.RocksDBStateStoreProvider``) and the protobuf package —
    check :func:`transform_with_state_available` first. At scale RocksDB
    keeps per-key state off-heap with incremental checkpointing, which is
    exactly what an unbounded user population needs."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    class _SessionCounter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = StructType(
                [
                    StructField("last_ts", DoubleType()),
                    StructField("sessions", LongType()),
                    StructField("events", LongType()),
                ]
            )
            self._state = handle.getValueState("sess", schema)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            if self._state.exists():
                last_ts, sessions, n = self._state.get()
            else:
                last_ts, sessions, n = None, 0, 0
            for pdf in rows:
                for ts in sorted(float(x) for x in pdf["ts_sec"]):
                    if last_ts is None or ts - last_ts > gap_s:
                        sessions += 1
                    last_ts = ts
                    n += 1
            self._state.update((last_ts, sessions, n))
            yield pd.DataFrame(
                {"user_id": [key[0]], "sessions": [sessions], "events": [n]}
            )

        def close(self) -> None:
            pass

    keyed = events.withColumn(
        "ts_sec", F.unix_timestamp("ts").cast("double")
    )
    return keyed.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_SessionCounter(),
        outputStructType="user_id LONG, sessions LONG, events LONG",
        outputMode="Update",
        timeMode="None",
    )
