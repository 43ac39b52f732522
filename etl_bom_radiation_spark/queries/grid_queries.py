"""The flagship grid decode (SURVEY §2.C, G1-G6) declared as driver-verified
queries with DuckDB oracles over the golden fixture files.

The Spark side is the production decode pipeline
(:mod:`etl_bom_radiation_spark.grid.decode` — pure Catalyst, narrow-only,
no shuffle). The oracle re-derives the same semantics independently in
DuckDB SQL (read_text + list ops + unnest(range)), per the intended
semantics of the reference's ``extract_data`` (reference bom/bom.py:110-157,
bugs #1/#2 excluded) — including the two traps:

* nodata cells still advance the longitude (bom.py:146-149) — both sides
  index cells positionally, never with a post-filter counter;
* latitude counts down from the TOP edge ``yll + nrows*cellsize``
  (bom.py:138,142);
* the fixture dates straddle the 2018-04-01 AEDT→AEST transition, so the
  Sydney conversion (bom.py:101-104) is DST-verified on both sides.

Coordinates are rounded to 6 dp on both sides (SURVEY §7 risk 3);
timestamps leave as formatted strings.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grid.decode import decode_grid_directory, read_grid_files, with_filename_metadata
from . import register

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
GRID_DIR = os.path.join(_REPO, "fixtures", "grids")
#: mixed-resolution fixture corpus (0.5 AND 0.25 cellsize grids) — the
#: regrid/gradient family decodes this dir so per-file lattice-step
#: handling is exercised, not just asserted (VERDICT r5 #2)
MULTIRES_DIR = os.path.join(_REPO, "fixtures", "grids_multires")


def oracle_base(grid_dir: str) -> str:
    """Shared oracle scaffold over *grid_dir*: parse every fixture grid into
    (file metadata, header scalars, Sydney timestamp) exactly once."""
    return f"""
WITH f AS (
  SELECT regexp_extract(filename, '[^/]+$') AS fname,
         string_split(regexp_replace(content, chr(13), ''), chr(10)) AS lines
  FROM read_text('{grid_dir}/*.txt')
), hdr AS (
  SELECT fname, lines,
         CAST(string_split_regex(trim(lines[1]), '\\s+')[2] AS INT) AS ncols,
         CAST(string_split_regex(trim(lines[2]), '\\s+')[2] AS INT) AS nrows,
         CAST(string_split_regex(trim(lines[3]), '\\s+')[2] AS DOUBLE) AS xll,
         CAST(string_split_regex(trim(lines[4]), '\\s+')[2] AS DOUBLE) AS yll,
         CAST(string_split_regex(trim(lines[5]), '\\s+')[2] AS DOUBLE) AS cs,
         CAST(string_split_regex(trim(lines[6]), '\\s+')[2] AS INT) AS nodata,
         string_split(regexp_replace(fname, '\\.[^.]*$', ''), '_') AS p
  FROM f
), meta AS (
  SELECT *,
    (strptime(p[3] || ' ' || substring(p[4], 1, 2), '%Y%m%d %H') AT TIME ZONE 'UTC')
       AT TIME ZONE 'Australia/Sydney' AS syd
  FROM hdr
)
"""


#: scaffold over the golden (uniform 0.5-cellsize) fixture dir — the base
#: for every G-query oracle in this module
_ORACLE_BASE = oracle_base(GRID_DIR)


@register(
    "g_flagship_decode",
    oracle=_ORACLE_BASE
    + """
    , rws AS (SELECT *, unnest(range(1, nrows+1)) AS i FROM meta)
    , cls AS (SELECT *, unnest(range(1, ncols+1)) AS j FROM rws)
    SELECT strftime(syd, '%Y-%m-%d %H:%M') AS date_str,
           p[2] AS RadiationType,
           ROUND(xll + (j-1)*cs, 6) AS Longitude,
           ROUND(yll + nrows*cs - i*cs, 6) AS Latitude,
           CAST(string_split(rtrim(lines[6+i]), ' ')[j] AS INT) AS Radiation,
           CAST(year(syd) AS INT) AS year, CAST(month(syd) AS INT) AS month,
           CAST(day(syd) AS INT) AS day, CAST(hour(syd) AS INT) AS hour
    FROM cls
    WHERE TRY_CAST(string_split(rtrim(lines[6+i]), ' ')[j] AS INT) IS NOT NULL
      AND CAST(string_split(rtrim(lines[6+i]), ' ')[j] AS INT) != nodata
    """,
)
def g_flagship_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1-G6 composed: the full grid decode over the golden fixtures — every
    decoded point with Sydney-local timestamp and partition columns."""
    pts = decode_grid_directory(spark, GRID_DIR)
    return pts.select(
        F.date_format("Date", "yyyy-MM-dd HH:mm").alias("date_str"),
        "RadiationType",
        F.round("Longitude", 6).alias("Longitude"),
        F.round("Latitude", 6).alias("Latitude"),
        "Radiation",
        "year",
        "month",
        "day",
        "hour",
    )


@register(
    "g_header_extract",
    oracle=_ORACLE_BASE
    + """
    SELECT fname, ncols, nrows,
           ROUND(xll, 6) AS xll, ROUND(yll, 6) AS yll, ROUND(cs, 6) AS cs,
           nodata
    FROM meta
    """,
)
def g_header_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 isolated: the six header scalars per grid file (bom.py:125-139)."""
    from ..grid.decode import _header_field

    files = read_grid_files(spark, GRID_DIR)
    lines = F.split(F.col("_content"), r"\r?\n")
    return files.select(
        F.element_at(F.split("_path", "/"), -1).alias("fname"),
        _header_field(lines, 1).try_cast("int").alias("ncols"),
        _header_field(lines, 2).try_cast("int").alias("nrows"),
        F.round(_header_field(lines, 3).try_cast("double"), 6).alias("xll"),
        F.round(_header_field(lines, 4).try_cast("double"), 6).alias("yll"),
        F.round(_header_field(lines, 5).try_cast("double"), 6).alias("cs"),
        _header_field(lines, 6).try_cast("int").alias("nodata"),
    )


@register(
    "g_hourly_rollup",
    oracle=_ORACLE_BASE
    + """
    , rws AS (SELECT *, unnest(range(1, nrows+1)) AS i FROM meta)
    , cls AS (SELECT *, unnest(range(1, ncols+1)) AS j FROM rws)
    , pts AS (
        SELECT p[2] AS RadiationType,
               CAST(year(syd) AS INT) AS year, CAST(month(syd) AS INT) AS month,
               CAST(day(syd) AS INT) AS day, CAST(hour(syd) AS INT) AS hour,
               CAST(string_split(rtrim(lines[6+i]), ' ')[j] AS INT) AS Radiation
        FROM cls
        WHERE TRY_CAST(string_split(rtrim(lines[6+i]), ' ')[j] AS INT) IS NOT NULL
          AND CAST(string_split(rtrim(lines[6+i]), ' ')[j] AS INT) != nodata
    )
    SELECT RadiationType, year, month, day, hour,
           CAST(COUNT(*) AS BIGINT) AS points,
           ROUND(AVG(Radiation), 4) AS avg_radiation,
           CAST(MAX(Radiation) AS INT) AS max_radiation
    FROM pts GROUP BY ALL
    """,
)
def g_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analyst query the reference's partition layout exists for
    (bom.py:28-32): hourly aggregate of decoded radiation by type — decode +
    group on the partition keys."""
    pts = decode_grid_directory(spark, GRID_DIR)
    return pts.groupBy("RadiationType", "year", "month", "day", "hour").agg(
        F.count(F.lit(1)).alias("points"),
        F.round(F.avg("Radiation"), 4).alias("avg_radiation"),
        F.max("Radiation").cast("int").alias("max_radiation"),
    )


@register(
    "g_bbox_filter",
    oracle=_ORACLE_BASE
    + """
    , rws AS (SELECT *, unnest(range(1, nrows+1)) AS i FROM meta)
    , cls AS (SELECT *, unnest(range(1, ncols+1)) AS j FROM rws)
    , pts AS (
        SELECT ROUND(xll + (j-1)*cs, 6) AS Longitude,
               ROUND(yll + nrows*cs - i*cs, 6) AS Latitude,
               CAST(string_split(rtrim(lines[6+i]), ' ')[j] AS INT) AS Radiation
        FROM cls
        WHERE TRY_CAST(string_split(rtrim(lines[6+i]), ' ')[j] AS INT) IS NOT NULL
          AND CAST(string_split(rtrim(lines[6+i]), ' ')[j] AS INT) != nodata
    )
    SELECT Longitude, Latitude,
           CAST(SUM(Radiation) AS BIGINT) AS total_radiation,
           CAST(COUNT(*) AS BIGINT) AS obs
    FROM pts
    WHERE Longitude BETWEEN 112.25 AND 113.25 AND Latitude BETWEEN -43.75 AND -43.25
    GROUP BY Longitude, Latitude
    """,
)
def g_bbox_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial slice of the decoded point table — the bounding-box +
    aggregate shape analysts run on the radiation table. With the sink
    sorted within partitions on (Latitude, Longitude) this filter also
    prunes parquet row groups via min/max stats at scale."""
    pts = decode_grid_directory(spark, GRID_DIR)
    return (
        pts.select(
            F.round("Longitude", 6).alias("Longitude"),
            F.round("Latitude", 6).alias("Latitude"),
            "Radiation",
        )
        .filter(
            F.col("Longitude").between(112.25, 113.25)
            & F.col("Latitude").between(-43.75, -43.25)
        )
        .groupBy("Longitude", "Latitude")
        .agg(
            F.sum("Radiation").cast("bigint").alias("total_radiation"),
            F.count(F.lit(1)).alias("obs"),
        )
    )


@register(
    "g_filename_metadata",
    oracle=f"""
    WITH f AS (
      SELECT regexp_extract(filename, '[^/]+$') AS fname
      FROM read_text('{GRID_DIR}/*.txt')
    ), parts AS (
      SELECT fname,
             regexp_replace(fname, '\\.[^.]*$', '') AS stem,
             string_split(regexp_replace(fname, '\\.[^.]*$', ''), '_') AS p
      FROM f
    )
    SELECT fname, stem, p[2] AS RadiationType,
           strftime(strptime(p[3] || ' ' || substring(p[4], 1, 2), '%Y%m%d %H'),
                    '%Y-%m-%d %H:%M') AS utc_str
    FROM parts
    """,
)
def g_filename_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 isolated: filename-grammar metadata extraction (bom.py:89-107) —
    full stem (os.path.splitext parity), radiation type, hour-precision UTC
    timestamp."""
    files = with_filename_metadata(read_grid_files(spark, GRID_DIR))
    return files.select(
        F.col("_filename").alias("fname"),
        F.col("_base").alias("stem"),
        "RadiationType",
        F.date_format("_utc_ts", "yyyy-MM-dd HH:mm").alias("utc_str"),
    )


@register(
    "g_coarsen",
    oracle=_ORACLE_BASE
    + """
    , rws AS (SELECT *, unnest(range(1, nrows+1)) AS i FROM meta)
    , cls AS (SELECT *, unnest(range(1, ncols+1)) AS j FROM rws)
    , pts AS (
        SELECT p[2] AS RadiationType,
               xll + (j-1)*cs AS lon, yll + nrows*cs - i*cs AS lat,
               CAST(string_split(rtrim(lines[6+i]), ' ')[j] AS INT) AS rad
        FROM cls
        WHERE TRY_CAST(string_split(rtrim(lines[6+i]), ' ')[j] AS INT) IS NOT NULL
          AND CAST(string_split(rtrim(lines[6+i]), ' ')[j] AS INT) != nodata
    )
    SELECT RadiationType,
           CAST(FLOOR(lon) AS BIGINT) AS lon_cell,
           CAST(FLOOR(lat) AS BIGINT) AS lat_cell,
           CAST(COUNT(*) AS BIGINT) AS points,
           CAST(SUM(rad) AS BIGINT) AS total_radiation,
           ROUND(CAST(SUM(rad) AS DOUBLE) / COUNT(*), 6) AS avg_radiation
    FROM pts GROUP BY 1, 2, 3
    """,
)
def g_coarsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-extension: raster coarsening — downsample the decoded point cloud
    into 1-degree cells (spatial rollup: count / total / mean radiation per
    cell). The raster analog of the hourly rollup: partial+final aggregation
    over the narrow decode, one shuffle on (type, cell). The mean is
    computed as SUM/COUNT (integer sum is exact) so the oracle hash is
    float-tie-free."""
    pts = decode_grid_directory(spark, GRID_DIR)
    return (
        pts.groupBy(
            "RadiationType",
            F.floor("Longitude").cast("long").alias("lon_cell"),
            F.floor("Latitude").cast("long").alias("lat_cell"),
        )
        .agg(
            F.count(F.lit(1)).alias("points"),
            F.sum("Radiation").alias("total_radiation"),
            F.round(
                F.sum("Radiation").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_radiation"),
        )
    )


@register(
    "g_datasource_decode",
    oracle=_ORACLE_BASE
    + """
    , rws AS (SELECT *, unnest(range(1, nrows+1)) AS i FROM meta)
    , cls AS (SELECT *, unnest(range(1, ncols+1)) AS j FROM rws)
    SELECT strftime(syd, '%Y-%m-%d %H:%M') AS date_str,
           p[2] AS RadiationType,
           ROUND(xll + (j-1)*cs, 6) AS Longitude,
           ROUND(yll + nrows*cs - i*cs, 6) AS Latitude,
           CAST(string_split(rtrim(lines[6+i]), ' ')[j] AS INT) AS Radiation,
           CAST(year(syd) AS INT) AS year, CAST(month(syd) AS INT) AS month,
           CAST(day(syd) AS INT) AS day, CAST(hour(syd) AS INT) AS hour
    FROM cls
    WHERE TRY_CAST(string_split(rtrim(lines[6+i]), ' ')[j] AS INT) IS NOT NULL
      AND CAST(string_split(rtrim(lines[6+i]), ' ')[j] AS INT) != nodata
    """,
)
def g_datasource_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-analog of the flagship decode: the same grid semantics through the
    Spark 4 Python DataSource mount (spark.read.format('esri_grid') —
    grid/datasource.py, one InputPartition per file) instead of the
    Catalyst expression pipeline. Same oracle as g_flagship_decode: the
    driver verifies the two decode paths are row-identical. The Catalyst
    path remains primary (JVM, no Python in the loop); this one exists for
    spark.read composability and as the escape-hatch pattern for formats
    DataFrame ops cannot express."""
    from ..grid.datasource import EsriGridDataSource

    spark.dataSource.register(EsriGridDataSource)
    pts = spark.read.format("esri_grid").load(GRID_DIR)
    return pts.select(
        F.date_format("Date", "yyyy-MM-dd HH:mm").alias("date_str"),
        "RadiationType",
        F.round("Longitude", 6).alias("Longitude"),
        F.round("Latitude", 6).alias("Latitude"),
        "Radiation",
        "year",
        "month",
        "day",
        "hour",
    )


@register(
    "g_cell_anomaly",
    oracle=_ORACLE_BASE
    + """
    , rws AS (SELECT *, unnest(range(1, nrows+1)) AS i FROM meta)
    , cls AS (SELECT *, unnest(range(1, ncols+1)) AS j FROM rws)
    , pts AS (
        SELECT strftime(syd, '%Y-%m-%d %H:%M') AS date_str,
               p[2] AS RadiationType,
               ROUND(xll + (j-1)*cs, 6) AS Longitude,
               ROUND(yll + nrows*cs - i*cs, 6) AS Latitude,
               CAST(string_split(rtrim(lines[6+i]), ' ')[j] AS INT) AS Radiation
        FROM cls
        WHERE TRY_CAST(string_split(rtrim(lines[6+i]), ' ')[j] AS INT) IS NOT NULL
          AND CAST(string_split(rtrim(lines[6+i]), ' ')[j] AS INT) != nodata
    )
    SELECT date_str, RadiationType, Longitude, Latitude, Radiation,
           ROUND(Radiation - AVG(Radiation) OVER (
                     PARTITION BY RadiationType, Longitude, Latitude), 4)
               AS anomaly
    FROM pts
    """,
)
def g_cell_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster analytics over the decoded point table: each observation's
    anomaly vs its grid cell's all-time mean (the day-over-day 'is this
    reading unusual' query the partitioned layout exists to serve). The
    window partitions on the rounded cell coordinates — high-cardinality
    keys, one shuffle; at 100 TB the cell-mean side would be maintained
    incrementally like streaming/rollup.py and broadcast-joined instead."""
    pts = decode_grid_directory(spark, GRID_DIR)
    from pyspark.sql.window import Window

    sel = pts.select(
        F.date_format("Date", "yyyy-MM-dd HH:mm").alias("date_str"),
        "RadiationType",
        F.round("Longitude", 6).alias("Longitude"),
        F.round("Latitude", 6).alias("Latitude"),
        "Radiation",
    )
    w = Window.partitionBy("RadiationType", "Longitude", "Latitude")
    return sel.withColumn(
        "anomaly", F.round(F.col("Radiation") - F.avg("Radiation").over(w), 4)
    )
