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
    collide, so its state row is dropped."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


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
