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

from ..grid.decode import (
    DOUBLE_GRAMMAR,
    _header_double,
    _header_field,
    decode_grid_directory,
    decoded_filename,
    read_grid_files,
    with_filename_metadata,
)
from . import register

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
GRID_DIR = os.path.join(_REPO, "fixtures", "grids")
#: mixed-resolution fixture corpus (0.5 AND 0.25 cellsize grids) — the
#: regrid/gradient family decodes this dir so per-file lattice-step
#: handling is exercised, not just asserted (VERDICT r5 #2)
MULTIRES_DIR = os.path.join(_REPO, "fixtures", "grids_multires")


def _sql_norm(e: str) -> str:
    """SQL: *e* with Spark's trimAll char class (every char <= 0x20 PLUS
    \\x7f/DEL) stripped from both ends — the exact whitespace handling of
    Spark's int cast (UTF8String.trimAll; measured r13/r14:
    try_cast('\\t7')=7, ('\\x017')=7; r15 byte-fuzzer seed 41:
    try_cast('\\x7f3' AS INT)=3, ends-only, nothing else in 0x00-0xFF or
    the Unicode space set strips)."""
    return (
        "regexp_replace(" + e + ", '^[\\x00-\\x20\\x7f]+|[\\x00-\\x20\\x7f]+$', '', 'g')"
    )


def _sql_try_int(e: str) -> str:
    """SQL mirror of Spark ``try_cast(e AS INT)`` for string *e*: trimAll,
    then admit strict ``[+-]?digits`` ONLY. DuckDB's bare TRY_CAST is laxer
    ('4.5' -> 5, '1e3' -> 1000 — measured r14), which would silently keep
    cells/headers Spark drops on a weird-format grid."""
    n = _sql_norm(e)
    return (
        "TRY_CAST(CASE WHEN regexp_full_match(" + n + ", '[+-]?[0-9]+') THEN "
        + n + " END AS INT)"
    )


def _sql_try_double(e: str) -> str:
    """SQL rendering of the PINNED header-double grammar
    (decode.DOUBLE_TOKEN_RE): anchored ASCII decimal/scientific/inf/nan
    over the RAW token. Not a bare-TRY_CAST mirror of either engine —
    Spark's cast also takes Java literal forms ('0.5d', '0x1p3') and
    DuckDB's takes '1_0' underscores (both measured r14); the engine
    defines the grammar once (decode.DOUBLE_GRAMMAR — the shared core
    alternation) and all three implementations enforce it."""
    return (
        "TRY_CAST(CASE WHEN regexp_full_match(" + e
        + ", '(?i)(" + DOUBLE_GRAMMAR + ")') THEN " + e + " END AS DOUBLE)"
    )


def oracle_base(grid_dir: str) -> str:
    """Shared oracle scaffold over *grid_dir*: parse every fixture grid into
    (file metadata, header scalars, Sydney timestamp) exactly once.

    Hardened r14 to mirror the Spark side's ANSI-safe degrade-to-NULL
    reading on weird-format grids (the grid axis of the adversarial-corpus
    net), no-op on the golden fixtures:

    * lines split on ``\\r?\\n`` exactly like ``decode.py`` (the old
      remove-all-CR reading would MERGE lone-CR-separated text the Spark
      side keeps as one line);
    * integer header fields through the strict-int mirror (DuckDB's bare
      CAST rounds '4.5' and parses '1e3'; Spark try_cast yields NULL and
      the file decodes to zero rows);
    * double header fields through trimAll + underscore guard;
    * ``try_strptime`` so a filename-grammar near-miss yields a NULL
      timestamp instead of raising (Spark: try_to_timestamp -> NULL)."""
    # explicit ASCII-whitespace class, NOT '\\s+': RE2's \\s is
    # [\\t\\n\\f\\r ] and EXCLUDES \\x0b where Java's \\s (the Spark
    # split) and the DataSource's class include it (ADVICE r14) — a
    # vertical-tab-separated header must tokenize identically everywhere
    tok = [
        f"string_split_regex(trim(lines[{i}]), '[ \\t\\n\\x0b\\f\\r]+')[2]"
        for i in range(7)
    ]
    return f"""
WITH f AS (
  SELECT regexp_extract(filename, '[^/]+$') AS fname,
         string_split_regex(content, '\\r?\\n') AS lines
  FROM read_text('{grid_dir}/*.txt')
), hdr AS (
  SELECT fname, lines,
         {_sql_try_int(tok[1])} AS ncols,
         {_sql_try_int(tok[2])} AS nrows,
         {_sql_try_double(tok[3])} AS xll,
         {_sql_try_double(tok[4])} AS yll,
         {_sql_try_double(tok[5])} AS cs,
         {_sql_try_int(tok[6])} AS nodata,
         string_split(regexp_replace(fname, '\\.[^.]*$', ''), '_') AS p
  FROM f
), meta AS (
  -- pinned filename-date grammar (decode.with_filename_metadata): 8
  -- ASCII digits (years 0000 AND 9999 excluded — 9999 rolls to year
  -- 10000 in Sydney, ADVICE r14) + 2-digit hour. DuckDB's try_strptime
  -- is width-LAX ('2018041 01' parses — measured r14) where Spark's
  -- try_to_timestamp is strict; NOT LIKE instead of a lookahead because
  -- RE2 has none.
  SELECT *,
    (CASE WHEN regexp_full_match(p[3], '[0-9]{{8}}') AND p[3] NOT LIKE '0000%'
               AND p[3] NOT LIKE '9999%'
               AND regexp_full_match(substring(p[4], 1, 2), '[0-9]{{2}}')
          THEN (try_strptime(p[3] || ' ' || substring(p[4], 1, 2),
                             '%Y%m%d %H') AT TIME ZONE 'UTC')
               AT TIME ZONE 'Australia/Sydney' END) AS syd
  FROM hdr
)
"""


def oracle_points(grid_dir: str) -> str:
    """Scaffold + the shared decoded-point CTE ``pts0`` every decode-based
    oracle selects from: one row per KEPT cell (strict-int parse succeeded,
    value != nodata — a NULL nodata header keeps nothing, like Spark's
    ``radiation != _nodata`` NULL predicate), with raw (unrounded) ``lon``/
    ``lat``, the per-file ``cs``, filename pieces ``p`` and Sydney ``syd``.

    Cell extraction mirrors decode.py G3/G4 exactly: body line ``6+i``
    (NULL past a short body -> no row), rtrim then split on SINGLE spaces
    (empty tokens from runs of spaces parse to NULL but still advance the
    cell index), truncated to ``ncols`` by the ``j`` range."""
    return oracle_base(grid_dir) + f"""
, rws AS (SELECT *, unnest(range(1, nrows+1)) AS i FROM meta)
, cls AS (SELECT *, unnest(range(1, ncols+1)) AS j FROM rws)
, cell AS (
  SELECT *, {_sql_try_int("string_split(rtrim(lines[6+i]), ' ')[j]")} AS rad
  FROM cls
)
, pts0 AS (
  SELECT fname, p, syd, cs, nodata, i, j, rad,
         xll + (j-1)*cs AS lon,
         yll + nrows*cs - i*cs AS lat
  FROM cell
  WHERE rad IS NOT NULL AND rad != nodata
)
"""


#: scaffold over the golden (uniform 0.5-cellsize) fixture dir — the base
#: for every G-query oracle in this module
_ORACLE_BASE = oracle_base(GRID_DIR)
#: scaffold + shared kept-points CTE for the decode-based oracles
_ORACLE_PTS = oracle_points(GRID_DIR)
#: guarded 6-dp rounds of the pts0 coordinates (defined below with
#: round6/sql_round6; assigned after those helpers)


#: long-quantizer-safe coordinate magnitude bound (ADVICE r14): a
#: huge-but-FINITE lattice (header xll=1e300) floors to a value DuckDB's
#: CAST(... AS BIGINT) raises on while Spark's floor(double)->long
#: silently saturates to Long.MAX_VALUE — so the shared admission
#: predicate bounds magnitude too, identically on both sides. 1e15 is
#: binary-exact, far above any physical coordinate, and far below 2^63.
COORD_BOUND = 1e15
#: the oracle rendering of :func:`finite_coords` — interpolated from the
#: SAME constant so neither the two oracles nor the Spark predicate can
#: drift from each other (review follow-up r15)
SQL_FINITE_COORDS = (
    f"isfinite(lon) AND isfinite(lat) "
    f"AND abs(lon) < {COORD_BOUND!r} AND abs(lat) < {COORD_BOUND!r}"
)


#: magnitude guard for 6-dp coordinate rounding: below this, DuckDB's
#: double ROUND is exact (x * 1e6 stays under 2^53); above it, ROUND is
#: lossy at magnitude-dependent points (ROUND(1e188, 6) = 9.99…e187,
#: measured — grid fuzzer seed 88) while Spark's BigDecimal round is
#: always exact. 1e9 is binary-exact and far above any physical
#: coordinate; huge grammar-valid headers pass through unrounded (their
#: arithmetic is IEEE-identical on both engines anyway).
ROUND_GUARD = 1e9


def round6(c) -> "F.Column":
    """Spark side of the guarded 6-dp round — MUST stay in lockstep with
    :func:`sql_round6` (one pair, many call sites). NULL and NaN fall to
    the otherwise branch unchanged on both engines."""
    return F.when(F.abs(c) < ROUND_GUARD, F.round(c, 6)).otherwise(c)


def sql_round6(e: str) -> str:
    """DuckDB rendering of :func:`round6`."""
    return f"CASE WHEN abs({e}) < {ROUND_GUARD!r} THEN ROUND({e}, 6) ELSE {e} END"


def finite_coords() -> "F.Column":
    """Shared coordinate admission for consumers whose arithmetic aborts
    or degenerates on a NaN/Infinity lattice (g_coarsen's FLOOR->long,
    g_zorder_cluster's quantizer round->long — the ANSI abort class;
    weird-grid net r14), now also bounded to quantizer-safe magnitude
    (< ``COORD_BOUND``; ADVICE r14 — huge-but-finite coords overflow the
    oracle's BIGINT cast where Spark's floor saturates). NULL coords drop
    through the same predicate (NULL comparisons are NULL -> filtered),
    matching the oracles' ``SQL_FINITE_COORDS``. One definition so the
    copies can't drift (the _finite_embedding precedent)."""
    return (
        ~(F.isnan("Longitude") | F.isnan("Latitude"))
        & (F.abs("Longitude") < COORD_BOUND)
        & (F.abs("Latitude") < COORD_BOUND)
    )


@register(
    "g_flagship_decode",
    oracle=_ORACLE_PTS
    + f"""
    SELECT strftime(syd, '%Y-%m-%d %H:%M') AS date_str,
           p[2] AS RadiationType,
           {sql_round6('lon')} AS Longitude,
           {sql_round6('lat')} AS Latitude,
           rad AS Radiation,
           CAST(year(syd) AS INT) AS year, CAST(month(syd) AS INT) AS month,
           CAST(day(syd) AS INT) AS day, CAST(hour(syd) AS INT) AS hour
    FROM pts0
    """,
)
def g_flagship_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1-G6 composed: the full grid decode over the golden fixtures — every
    decoded point with Sydney-local timestamp and partition columns."""
    pts = decode_grid_directory(spark, GRID_DIR)
    return pts.select(
        F.date_format("Date", "yyyy-MM-dd HH:mm").alias("date_str"),
        "RadiationType",
        round6(F.col("Longitude")).alias("Longitude"),
        round6(F.col("Latitude")).alias("Latitude"),
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
           xll, yll, cs,
           nodata
    FROM meta
    """,
)
def g_header_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 isolated: the six header scalars per grid file (bom.py:125-139).
    Doubles through the pinned header-double grammar (_header_double);
    fname through decoded_filename (input_file_name URI-encodes), same
    as the decode path."""
    files = read_grid_files(spark, GRID_DIR)
    lines = F.split(F.col("_content"), r"\r?\n")
    return files.select(
        decoded_filename().alias("fname"),
        _header_field(lines, 1).try_cast("int").alias("ncols"),
        _header_field(lines, 2).try_cast("int").alias("nrows"),
        # UNROUNDED (grid fuzzer seed 88, r15): parsed header doubles are
        # selections under the pinned grammar — bit-identical across
        # engines with no rounding — and DuckDB's double ROUND is lossy
        # at magnitude-dependent points (ROUND(1e188, 6) = 9.99...e187
        # where Spark's BigDecimal round is exact; the x07 class).
        _header_double(lines, 3).alias("xll"),
        _header_double(lines, 4).alias("yll"),
        _header_double(lines, 5).alias("cs"),
        _header_field(lines, 6).try_cast("int").alias("nodata"),
    )


@register(
    "g_hourly_rollup",
    oracle=_ORACLE_PTS
    + """
    SELECT p[2] AS RadiationType,
           CAST(year(syd) AS INT) AS year, CAST(month(syd) AS INT) AS month,
           CAST(day(syd) AS INT) AS day, CAST(hour(syd) AS INT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS points,
           ROUND(AVG(rad), 4) AS avg_radiation,
           CAST(MAX(rad) AS INT) AS max_radiation
    FROM pts0 GROUP BY ALL
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
    oracle=_ORACLE_PTS
    + f"""
    SELECT {sql_round6('lon')} AS Longitude, {sql_round6('lat')} AS Latitude,
           CAST(SUM(rad) AS BIGINT) AS total_radiation,
           CAST(COUNT(*) AS BIGINT) AS obs
    FROM pts0
    WHERE {sql_round6('lon')} BETWEEN 112.25 AND 113.25
      AND {sql_round6('lat')} BETWEEN -43.75 AND -43.25
    GROUP BY 1, 2
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
            round6(F.col("Longitude")).alias("Longitude"),
            round6(F.col("Latitude")).alias("Latitude"),
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
    -- try_strptime + the pinned 8-digit/2-digit/no-year-0000/9999
    -- grammar: a near-miss filename yields NULL metadata (Spark: the
    -- guarded try_to_timestamp), never a raise or a lax parse
    -- (weird-grid net r14; 9999 top-end ADVICE r14)
    SELECT fname, stem, p[2] AS RadiationType,
           CASE WHEN regexp_full_match(p[3], '[0-9]{{8}}')
                     AND p[3] NOT LIKE '0000%'
                     AND p[3] NOT LIKE '9999%'
                     AND regexp_full_match(substring(p[4], 1, 2), '[0-9]{{2}}')
                THEN strftime(try_strptime(p[3] || ' ' || substring(p[4], 1, 2),
                                           '%Y%m%d %H'),
                              '%Y-%m-%d %H:%M') END AS utc_str
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
    oracle=_ORACLE_PTS
    + f"""
    SELECT p[2] AS RadiationType,
           CAST(FLOOR(lon) AS BIGINT) AS lon_cell,
           CAST(FLOOR(lat) AS BIGINT) AS lat_cell,
           CAST(COUNT(*) AS BIGINT) AS points,
           CAST(SUM(rad) AS BIGINT) AS total_radiation,
           ROUND(CAST(SUM(rad) AS DOUBLE) / COUNT(*), 6) AS avg_radiation
    FROM pts0
    WHERE {SQL_FINITE_COORDS}
    GROUP BY 1, 2, 3
    """,
)
def g_coarsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-extension: raster coarsening — downsample the decoded point cloud
    into 1-degree cells (spatial rollup: count / total / mean radiation per
    cell). The raster analog of the hourly rollup: partial+final aggregation
    over the narrow decode, one shuffle on (type, cell). The mean is
    computed as SUM/COUNT (integer sum is exact) so the oracle hash is
    float-tie-free.

    Non-finite or quantizer-unsafe coordinates (a grid whose header
    declares cellsize NaN/Infinity — weird-grid net r14 — or a
    huge-but-finite corner like xll=1e300, ADVICE r14) cannot be binned:
    FLOOR(NaN) feeds a long cast that aborts under ANSI (the q37/n28
    class) and FLOOR(1e300) overflows the oracle's BIGINT, so both sides
    filter them before flooring (shared :func:`finite_coords` /
    ``SQL_FINITE_COORDS``). No-op on the fixtures."""
    pts = decode_grid_directory(spark, GRID_DIR)
    return (
        pts.filter(finite_coords())
        .groupBy(
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
    oracle=_ORACLE_PTS
    + f"""
    SELECT strftime(syd, '%Y-%m-%d %H:%M') AS date_str,
           p[2] AS RadiationType,
           {sql_round6('lon')} AS Longitude,
           {sql_round6('lat')} AS Latitude,
           rad AS Radiation,
           CAST(year(syd) AS INT) AS year, CAST(month(syd) AS INT) AS month,
           CAST(day(syd) AS INT) AS day, CAST(hour(syd) AS INT) AS hour
    FROM pts0
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
        round6(F.col("Longitude")).alias("Longitude"),
        round6(F.col("Latitude")).alias("Latitude"),
        "Radiation",
        "year",
        "month",
        "day",
        "hour",
    )


@register(
    "g_cell_anomaly",
    oracle=_ORACLE_PTS
    + f"""
    , pts AS (
        SELECT strftime(syd, '%Y-%m-%d %H:%M') AS date_str,
               p[2] AS RadiationType,
               {sql_round6('lon')} AS Longitude,
               {sql_round6('lat')} AS Latitude,
               rad AS Radiation
        FROM pts0
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
        round6(F.col("Longitude")).alias("Longitude"),
        round6(F.col("Latitude")).alias("Latitude"),
        "Radiation",
    )
    w = Window.partitionBy("RadiationType", "Longitude", "Latitude")
    return sel.withColumn(
        "anomaly", F.round(F.col("Radiation") - F.avg("Radiation").over(w), 4)
    )
