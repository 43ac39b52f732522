"""Correlated LATERAL join (q50) — top-k-per-row as a join operator.

``q50_lateral_topk`` returns, for every nation, its two highest-balance
customers via ``JOIN LATERAL (... ORDER BY ... LIMIT 2)``.  This is the
relational-surface completion of the subquery family: q34 (scalar
subquery), q34b (correlated SELECT-list subquery), q35 (EXISTS) — LATERAL
is the general form, a correlated *table* subquery that may return
multiple rows/columns per outer row.

Spark-first: Catalyst's DecorrelateInnerQuery rewrites the correlated
LIMIT into a rank-over-partition on the inner side — i.e. the planner
itself turns the per-row loop a naive engine would run (|outer| separate
top-k scans; |outer| scans of a 100 TB inner at scale) into the same
shuffled window + join we would write by hand (q29 top-k per group).
Declaring the LATERAL and letting the optimizer decorrelate keeps the
query at ONE scan of each side regardless of |outer|.

Determinism: ties broken by c_custkey ascending after the c_acctbal DESC
ordering, on both engines.

Reference parity: the reference's query half is Athena/Presto SQL
(reference README.md:4, bom_partition.py:77); Presto and DuckDB both
expose LATERAL, so a reference user's correlated queries carry over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import register, register_views

_SQL = """
SELECT n.n_name, c.c_custkey, c.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) c
"""


@register("q50_lateral_topk", oracle=_SQL)
def q50_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q50: correlated LATERAL table subquery with ORDER BY + LIMIT —
    top-2 customers by balance per nation; Catalyst decorrelates the
    per-row LIMIT into one windowed rank + join (no |outer|x inner scans)."""
    register_views(spark, sf_dir, "nation", "customer")
    return spark.sql(_SQL)
