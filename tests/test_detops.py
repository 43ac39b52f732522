"""Invariant tests for the deterministic training-data operators
(n15-n18) and the gap-fill resample (x02) — properties the DuckDB value
hash alone doesn't spell out: partition-totality, quota bounds, and
run-to-run determinism (the whole point of hash-keyed ops over rand())."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_bom_radiation_spark.queries import load_all

QS = load_all()


def _run(spark, sf_dir, name):
    return QS[name].fn(spark, sf_dir)


def test_det_shuffle_covers_every_doc_once(spark, oracle_sf_dir):
    out = _run(spark, oracle_sf_dir, "n15_det_shuffle")
    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    lo, hi = out.agg(F.min("shard_id"), F.max("shard_id")).first()
    assert 0 <= lo and hi < 64


def test_det_shuffle_is_deterministic_across_runs(spark, oracle_sf_dir):
    a = _run(spark, oracle_sf_dir, "n15_det_shuffle").orderBy("doc_id").collect()
    b = _run(spark, oracle_sf_dir, "n15_det_shuffle").orderBy("doc_id").collect()
    assert a == b


def test_train_test_split_partitions_corpus(spark, oracle_sf_dir):
    out = {r["split"]: r for r in _run(spark, oracle_sf_dir, "n16_train_test_split").collect()}
    total = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet").count()
    assert set(out) <= {"train", "test"}
    assert sum(r["docs"] for r in out.values()) == total  # no doc lost or doubled
    # ~12.5% expected; allow wide tolerance at small sf
    if total >= 200:
        frac = out["test"]["docs"] / total
        assert 0.05 < frac < 0.25


def test_stratified_sample_respects_quota(spark, oracle_sf_dir):
    out = _run(spark, oracle_sf_dir, "n17_stratified_sample")
    per = out.groupBy("lang").count().collect()
    assert all(r["count"] <= 25 for r in per)
    # strata with >= 25 docs must hit the quota exactly
    avail = (
        spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
        .groupBy("lang")
        .count()
        .collect()
    )
    avail = {r["lang"]: r["count"] for r in avail}
    for r in per:
        assert r["count"] == min(25, avail[r["lang"]])


def test_redaction_masks_digit_runs(spark, oracle_sf_dir):
    out = _run(spark, oracle_sf_dir, "n18_pii_redaction")
    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    assert out.count() == docs.count()
    # any doc containing a 3+ digit run must report numbers > 0
    flagged = (
        docs.filter(F.col("text").rlike("[0-9][0-9][0-9]"))
        .join(out, "doc_id")
        .filter(F.col("numbers") == 0)
        .count()
    )
    assert flagged == 0


def test_gapfill_calendar_is_dense_and_count_preserving(spark, oracle_sf_dir):
    out = _run(spark, oracle_sf_dir, "x02_gapfill")
    orders = spark.read.parquet(f"{oracle_sf_dir}/orders.parquet")
    prios = orders.select("o_orderpriority").distinct().count()
    lo, hi = orders.agg(
        F.min(F.to_date("o_orderdate")), F.max(F.to_date("o_orderdate"))
    ).first()
    days = (hi - lo).days + 1
    assert out.count() == days * prios  # every (day, prio) cell exists
    assert (
        out.agg(F.sum("orders_n")).first()[0] == orders.count()
    )  # zero-fill adds cells, never counts
