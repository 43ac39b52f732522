"""Parity tests: the Python DataSource mount (esri_grid) must produce
exactly the Catalyst decode's rows (same semantics, different engine path).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from etl_bom_radiation_spark.grid.datasource import EsriGridDataSource
from etl_bom_radiation_spark.grid.decode import decode_grid_directory

FIXTURES = str(Path(__file__).resolve().parent.parent / "fixtures" / "grids")


def _norm(df):
    return {
        (
            r["date_str"],
            r["RadiationType"],
            round(r["Longitude"], 6),
            round(r["Latitude"], 6),
            r["Radiation"],
            r["year"],
            r["month"],
            r["day"],
            r["hour"],
        )
        for r in df.withColumn(
            "date_str", F.date_format("Date", "yyyy-MM-dd HH:mm")
        ).collect()
    }


def test_datasource_matches_catalyst_decode(spark):
    spark.dataSource.register(EsriGridDataSource)
    via_source = spark.read.format("esri_grid").load(FIXTURES)
    via_catalyst = decode_grid_directory(spark, FIXTURES)
    assert via_source.count() == 18
    assert _norm(via_source) == _norm(via_catalyst)


def test_datasource_parallelism_is_per_file(spark):
    spark.dataSource.register(EsriGridDataSource)
    df = spark.read.format("esri_grid").load(FIXTURES)
    assert df.rdd.getNumPartitions() == 2  # one partition per fixture file


def test_datasource_malformed_degrades(spark, tmp_path):
    bad = tmp_path / "x_GLOBAL_20200101_0000.txt"
    bad.write_text("ncols nope\nbroken\n")
    ok = tmp_path / "y_GLOBAL_20200101_0100.txt"
    ok.write_text(
        "ncols 2\nnrows 1\nxllcorner 0.0\nyllcorner 0.0\ncellsize 1.0\n"
        "NODATA_value -1\n4 -1\n"
    )
    spark.dataSource.register(EsriGridDataSource)
    rows = spark.read.format("esri_grid").load(str(tmp_path)).collect()
    assert [(r["Radiation"], r["Longitude"]) for r in rows] == [(4, 0.0)]
