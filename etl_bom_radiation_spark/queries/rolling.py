"""Rolling-window distinct users (x08) — sliding COUNT DISTINCT at scale.

"7-day active users per day" is the canonical product-analytics query
and the canonical COUNT-DISTINCT-over-sliding-window trap: window
functions cannot express DISTINCT aggregation over a frame, and the
naive day x window self-join re-scans each day's users once per window
it overlaps (7x the fact at a week, |window|x in general — and a
distinct inside a 7-way join fan-out shuffles duplicated users).

The Spark-first shape is contribute-then-dedup, linear in the fact:

1. collapse events to DISTINCT (user, day) — one digest-uniform shuffle
   over pairs that are already tiny projections of the fact;
2. each (user, day) pair CONTRIBUTES to the 7 window-days it can be
   seen from: a narrow ``explode(sequence(day, day+6))`` — no join;
3. DISTINCT (user, window_day) — the second uniform shuffle; a user
   active on 3 days inside one window still counts once;
4. count per window_day (map-side partial combine collapses each task
   to |days| rows before the final tiny shuffle), LEFT-joined onto the
   dense x02-style day spine so quiet days report 0.

Both shuffles key on (user, day) style pairs — uniform by construction,
no skew lever needed.  At 100 TB the working set after step 1 is
|users| x |active days| pairs, independent of event volume; the 7x
inflation of step 2 applies to that collapsed set, not the fact.  For
wider windows (90-day MAU) where 90x inflation bites, the production
alternative is per-day HLL sketches merged across the window — the
approximate contract q17 already covers; this operator is the exact
form.

Determinism: days are UTC dates of the (session-TZ-pinned) event
timestamps; NULL timestamps are excluded on both engines; day labels
are ISO strings (the x02 convention).

Reference parity: the reference delegates analytics to Athena SQL over
its partitioned table (reference README.md:4, bom_partition.py:77);
rolling actives is the standard such dashboard query, owned natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_events, register

#: trailing window length in days (day d counts users active in [d-6, d])
WINDOW_DAYS = 7

_ORACLE = f"""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), bounds AS (
  SELECT MIN(day) AS lo, MAX(day) AS hi FROM days
), spine AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS wday
  FROM bounds
), contrib AS (
  SELECT DISTINCT user_id, day + CAST(i AS INTEGER) AS wday
  FROM days CROSS JOIN (SELECT UNNEST(range(0, {WINDOW_DAYS})) AS i)
), counts AS (
  SELECT wday, COUNT(*) AS n FROM contrib GROUP BY wday
)
SELECT STRFTIME(s.wday, '%Y-%m-%d') AS day,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS active_users_7d
FROM spine s LEFT JOIN counts c ON c.wday = s.wday
"""


@register("x08_rolling_dau", oracle=_ORACLE)
def x08_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 (extension): per-day trailing 7-day distinct active users —
    contribute-then-dedup (two uniform digest shuffles, |window|x
    inflation only of the collapsed (user, day) set, never a day x
    window self-join of the fact)."""
    ev = load_events(spark, sf_dir)
    # lazy localCheckpoint (the boilerplate.py lever): `days` feeds both
    # the contribute-explode branch and the bounds aggregate — without a
    # materialization barrier Catalyst re-executes the fact scan +
    # distinct once per branch (a double corpus read at 100 TB)
    days = (
        ev.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    contrib = days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), WINDOW_DAYS - 1))
        ).alias("wday"),
    ).distinct()
    counts = contrib.groupBy("wday").agg(F.count(F.lit(1)).alias("n"))
    bounds = days.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("wday")
    )
    return (
        spine.join(counts, "wday", "left")
        .select(
            F.date_format("wday", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("active_users_7d"),
        )
    )


@register("x09_rolling_dau_hll", oracle=None)
def x09_rolling_dau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 (extension): the PRODUCTION form of x08 for wide windows —
    per-day HLL sketches (``hll_sketch_agg``) unioned across each 7-day
    window (``hll_union_agg`` → ``hll_sketch_estimate``).

    Why this exists next to the exact x08: x08's |window|x inflation is
    of (user, day) PAIRS — fine at 7 days, punitive at 90-day MAU over
    billions of users.  Sketches change the unit: the fact collapses to
    ONE ~KB sketch per day in a single pass, and each window unions
    |window| sketches — the rolled-up state is |days| x KB regardless of
    user cardinality, and sketches are mergeable across any regrouping
    (the q17 approximate contract, upgraded from a scalar estimate to a
    mergeable aggregate).  Same contribute-explode shape as x08, applied
    to day-sketches instead of pairs.

    Rows-only by contract: the sketch binary and its estimate are
    JVM-internal (DataSketches HLL), so no DuckDB oracle —
    ``tests/test_approx_ops.py`` fences the estimate against x08's exact
    counts per window-day instead.
    """
    ev = load_events(spark, sf_dir)
    daily = (
        ev.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
        .localCheckpoint(eager=False)  # feeds contrib AND the bounds agg
    )
    contrib = daily.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), WINDOW_DAYS - 1))
        ).alias("wday"),
        "sk",
    )
    counts = contrib.groupBy("wday").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))")
        .cast("bigint")
        .alias("n")
    )
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("wday")
    )
    return spine.join(counts, "wday", "left").select(
        F.date_format("wday", "yyyy-MM-dd").alias("day"),
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("approx_users_7d"),
    )
