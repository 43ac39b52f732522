"""Batch sessionization over the event stream (x04).

The classic clickstream/telemetry operator: split each user's event
timeline into sessions wherever the gap from the previous event exceeds
30 minutes, then aggregate per session.  This is the batch analog of the
streaming ``t04_session_window`` (F.session_window) — the same semantics
expressed over the at-rest table, so backfills and the live stream agree.

Spark-first plan shape (the part that matters at 100 TB): ONE shuffle.
Both window passes (lag to flag boundaries, running sum to number
sessions) share the same (user_id)(ts, event_id) partitioning+ordering, so
Catalyst plans a single Exchange + single Sort and evaluates both Window
operators over it; the final groupBy(user_id, session_seq) is satisfied by
the existing hash partitioning on user_id (HashPartitioning on a SUBSET of
the grouping keys satisfies ClusteredDistribution), so no second shuffle.
``tests/test_plans.py`` pins Exchange==1.  Per-user state is one
partition's worth — no global sort, no driver loop; skewed power-users
are bounded by AQE skew handling on the one shuffle.

Determinism: events are ordered by (ts, event_id) within a user — the
event_id tiebreak makes simultaneous events stable on both engines.
NULL timestamps are filtered on BOTH sides before the windows (the x08
convention): an un-timestamped event can't belong to any session, the
gap predicate ``unix_micros(NULL)`` would be NULL anyway, and — the real
hazard — the two engines default window NULL ordering differently
(Spark NULLS FIRST ascending, DuckDB NULLS LAST), so leaving NULLs in
would silently shift session numbering between engines (ADVICE r6).
Session bounds are epoch-microsecond BIGINTs (engine-neutral; exact),
sums rounded to 4dp per the oracle-equivalence discipline.

Reference parity: the reference has no event-log analytics of its own —
its query surface is delegated to Athena SQL over the accumulated table
(reference README.md:4, bom_partition.py:77).  Sessionization is the
canonical such delegated query, here owned natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load_events, register

#: 30-minute inactivity gap, in microseconds (both engines compare
#: epoch-microsecond BIGINTs — never interval arithmetic, which the two
#: engines format/round differently).
GAP_US = 30 * 60 * 1_000_000

_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, ts, event_id, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
  WHERE ts IS NOT NULL
), flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN prev_ts IS NULL
                OR epoch_us(ts) - epoch_us(prev_ts) > {GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM ordered
), sess AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id,
       CAST(session_seq AS BIGINT) AS session_seq,
       CAST(MIN(epoch_us(ts)) AS BIGINT) AS start_us,
       CAST(MAX(epoch_us(ts)) AS BIGINT) AS end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM sess
GROUP BY user_id, session_seq
"""


@register("x04_sessionization", oracle=_ORACLE)
def x04_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 (extension): gap-based sessionization — 30-min inactivity split
    per user, one shuffle total (lag + running-sum windows share one
    Exchange/Sort; the session aggregate reuses the user_id partitioning)."""
    e = load_events(spark, sf_dir).filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "is_new",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_micros("ts") - F.unix_micros("prev_ts") > F.lit(GAP_US)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.min(F.unix_micros("ts")).alias("start_us"),
        F.max(F.unix_micros("ts")).alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
