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
depth bounded (7 year levels x 1 row here, expanded to 84 months
non-recursively; the big orders table is touched ONCE, outside the loop,
by the post-spine aggregation join).  A
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

#: maximum year-level INDEX: y runs 0..6 inclusive -> 7 recursion levels,
#: 1992..1998 (the TPC-H order-date span).  Each recursion level is one
#: driver-coordinated job, so the recursion runs at YEAR granularity and
#: the 12 months per year expand non-recursively — same 84-row spine as
#: an 84-level month ladder at ~1/8th the loop latency (measured 6.3 s
#: -> sub-second per run).
_MAX_LEVEL = 6

_BODY = f"""
WITH RECURSIVE yi(y) AS (
  SELECT 0
  UNION ALL
  SELECT y + 1 FROM yi WHERE y < {_MAX_LEVEL}
),
months AS (
  SELECT make_date(1992 + y, mth, 1) AS ms
  FROM yi CROSS JOIN ({{month_gen}})
),
om AS (
  SELECT make_date(year(o_orderdate), month(o_orderdate), 1) AS ms,
         o_totalprice
  FROM orders
)
SELECT {{month_fmt}} AS month,
       CAST(COUNT(om.ms) AS BIGINT) AS n_orders,
       ROUND(COALESCE(SUM(om.o_totalprice), 0.0), 2) AS revenue
FROM months LEFT JOIN om ON om.ms = months.ms
GROUP BY months.ms
"""


@register(
    "q51_recursive_cte",
    oracle=_BODY.format(
        month_gen="SELECT UNNEST(range(1, 13)) AS mth",
        month_fmt="STRFTIME(months.ms, '%Y-%m')",
    ),
)
def q51_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q51: WITH RECURSIVE — integer year ladder (7 levels) expanded to a
    dense month spine, LEFT-joined to orders for a monthly revenue series
    with empty months present; the orders table is scanned once outside
    the recursion, the recursive frame is one row per level."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        _BODY.format(
            month_gen="SELECT explode(sequence(1, 12)) AS mth",
            month_fmt="date_format(months.ms, 'yyyy-MM')",
        )
    )
