"""Recursive CTE (q51) — the WITH RECURSIVE surface.

Spark 4 added recursive common table expressions (executed as an
iterative UnionLoop: the anchor seeds a working frame, each level runs
the recursive member against the previous level's rows, and the loop
stops when a level produces no rows or the level limit trips).  q51
covers that surface with the canonical production recursion — a date
spine — seeded as an integer ladder and joined back to the orders feed
for a dense monthly revenue series (empty months present with zeros).

Engine-neutral construction: the recursion is over a plain INTEGER level
(n -> n+1, bounded), converted to a month with ``make_date`` — integer
arithmetic and make_date agree bit-for-bit across Spark and DuckDB,
whereas date+INTERVAL recursion would ride each engine's interval
coercion rules.  The month label is formatted to 'yyyy-MM' text on both
sides (the x02 convention).  Spark's recursive UNION member supports
UNION ALL only (UNION-distinct raises UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE),
so the ladder generates each level exactly once by construction —
cyclic-closure recursions (n20's oracle shape) stay on the iterative
``graph.connected_components`` path on the Spark side.

100-TB posture: recursion in Spark is DRIVER-COORDINATED per level — one
job per recursion step — so the recursive frame must stay tiny and the
depth bounded (one year level x 1 row here, bounds derived from the data,
expanded to months non-recursively; the big orders table is touched ONCE,
outside the loop, by the post-spine aggregation join).  A
recursion whose working set scales with the fact table would serialize
the cluster behind the driver loop; that shape belongs in the iterative
operators (graph.py) that checkpoint between rounds instead.

Reference parity: the reference's query half is Athena/Presto
(reference README.md:4); Presto exposes WITH RECURSIVE, so a reference
user's recursive queries carry over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import register, register_views

# The year ladder's bounds are DERIVED FROM THE DATA (min/max
# year(o_orderdate) in the anchor), not hardcoded: the fixtures span
# whatever dates the driver generated (currently 1995-01..2001-08), and a
# hardcoded span would silently drop orders outside it while the shared
# Spark/DuckDB constants kept the oracle green (ADVICE r6, high).  The max
# bound is CARRIED IN THE RECURSIVE FRAME (yi.y1) so the recursive member
# references only yi — putting the bounds CTE inside the loop would
# re-evaluate the orders min/max scan once per level (measured 6.4 s vs
# 0.95 s for the bound-carried shape).  Each recursion level is one
# driver-coordinated job, so the recursion runs at YEAR granularity and
# the 12 months per year expand non-recursively — same dense month spine
# as a month-level ladder at ~1/12th the loop latency (an 84-level month
# variant measured 6.3 s).

_BODY = """
WITH RECURSIVE yi(y, y1){rec_limit} AS (
  SELECT year(min(o_orderdate)), year(max(o_orderdate)) FROM orders
  UNION ALL
  SELECT y + 1, y1 FROM yi WHERE y < y1
),
months AS (
  SELECT make_date(y, mth, 1) AS ms
  FROM yi CROSS JOIN ({month_gen})
),
om AS (
  SELECT make_date(year(o_orderdate), month(o_orderdate), 1) AS ms,
         o_totalprice
  FROM orders
)
SELECT {month_fmt} AS month,
       CAST(COUNT(om.ms) AS BIGINT) AS n_orders,
       ROUND(COALESCE(SUM(om.o_totalprice), 0.0), 2) AS revenue
FROM months LEFT JOIN om ON om.ms = months.ms
GROUP BY months.ms
"""


@register(
    "q51_recursive_cte",
    oracle=_BODY.format(
        rec_limit="",
        month_gen="SELECT UNNEST(range(1, 13)) AS mth",
        month_fmt="STRFTIME(months.ms, '%Y-%m')",
    ),
)
def q51_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q51: WITH RECURSIVE — integer year ladder bounded by the DATA's
    min/max order year (anchor aggregates orders once; the max bound rides
    the recursive frame), expanded to a dense month spine and LEFT-joined
    to orders for a monthly revenue series with empty months present; the
    full-width orders scan happens once outside the recursion, the
    recursive frame is one row per level."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        _BODY.format(
            # Spark's default recursion ceiling is 100 levels — a
            # century-spanning orders feed (timestamp-edge net r13:
            # 1900..2262 = 363 levels) aborts under it. A millennium
            # bound keeps the driver-coordinated loop finite while
            # covering any plausible date spine; DuckDB needs (and
            # parses) no limit clause, so the oracle leaves it empty.
            rec_limit=" MAX RECURSION LEVEL 1000",
            month_gen="SELECT explode(sequence(1, 12)) AS mth",
            month_fmt="date_format(months.ms, 'yyyy-MM')",
        )
    )
