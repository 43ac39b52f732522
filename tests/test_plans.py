"""Physical-plan regression tests: the plan properties that make the
declared surface scale are asserted, not assumed (brief: '.explain() the
plan and iterate until it's the plan you'd want').

A regression that silently turns a broadcast join into a shuffle join, or
adds an Exchange to the narrow decode, fails here long before it shows up
as a bench regression at 100x the data.
"""

from __future__ import annotations

from etl_bom_radiation_spark.grid.decode import decode_grid_directory
from etl_bom_radiation_spark.queries import load_all

QS = load_all()


def _plan(spark, sf_dir, name: str) -> str:
    return QS[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_filters_push_to_parquet_scan(spark, oracle_sf_dir):
    p = _plan(spark, oracle_sf_dir, "q02_filter")
    assert "PushedFilters: [" in p
    assert "GreaterThanOrEqual(l_quantity,10" in p.replace(" ", "") or "l_quantity" in p.split("PushedFilters")[1][:400]


def test_projection_prunes_columns(spark, oracle_sf_dir):
    p = _plan(spark, oracle_sf_dir, "q01_projection")
    read = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read and "l_shipdate" not in read  # pruned


def test_dim_joins_broadcast(spark, oracle_sf_dir):
    p = _plan(spark, oracle_sf_dir, "q06_broadcast_join")
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p


def test_multiway_join_no_cartesian(spark, oracle_sf_dir):
    p = _plan(spark, oracle_sf_dir, "q13_multiway_join")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_topk_uses_heaps_not_full_sort(spark, oracle_sf_dir):
    assert "TakeOrderedAndProject" in _plan(spark, oracle_sf_dir, "q28_topk")


def test_topk_per_group_uses_window_group_limit(spark, oracle_sf_dir):
    assert "WindowGroupLimit" in _plan(spark, oracle_sf_dir, "q29_topk_per_group")


def test_grid_decode_is_narrow_only(spark):
    p = (
        decode_grid_directory(spark, "fixtures/grids")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in p  # zero shuffle: scan->project->generate->filter


def test_semi_anti_joins_do_not_materialize_right(spark, oracle_sf_dir):
    for name in ("q08_semi_join", "q09_anti_join"):
        p = _plan(spark, oracle_sf_dir, name)
        assert "LeftSemi" in p or "LeftAnti" in p


def test_range_join_broadcasts_tiny_side(spark, oracle_sf_dir):
    p = _plan(spark, oracle_sf_dir, "q10_range_join")
    assert "BroadcastNestedLoopJoin" in p  # 4-row bands side broadcast


def test_exact_dedup_shuffles_once_on_digest(spark, oracle_sf_dir):
    p = _plan(spark, oracle_sf_dir, "n01_exact_dedup")
    assert p.count("Exchange hashpartitioning") == 1
    assert "HashAggregate" in p  # partial+final combine around the shuffle
