"""Z-order (Morton) spatial clustering key (grid-family extension).

``g_zorder_cluster`` attaches the engine's Z-order key
(:func:`etl_bom_radiation_spark.scale.zorder_key`) to every decoded
point of the mixed-resolution corpus.  The key itself is the operator
under test: it is what a clustered writer sorts by
(``repartitionByRange(zkey).sortWithinPartitions(zkey)``) so that 2-D
box predicates — the dominant access pattern on a decoded-point archive
(bbox x time) — can prune parquet row groups on BOTH coordinates'
min/max statistics instead of one.  ``bench.py``'s
``cluster_scan_linear`` / ``cluster_scan_zorder`` pair measures the
payoff on a 4M-point corpus, and
``tests/test_scale.py`` proves the row-group envelope property directly
from parquet footer statistics (no timing flakiness).

The key is pure integer bit-interleaving after one binary-exact
quantization (quantum 0.125 covers both fixture cellsizes 0.5 and
0.25), built from the SAME expression on both engines
(:func:`~etl_bom_radiation_spark.scale.zorder_key_sql` renders the
DuckDB twin) — so the driver hash-checks every point's Morton code, not
just row counts.  No UDF anywhere; the whole key stays inside
whole-stage codegen, and computing it adds zero Exchanges to the narrow
decode (asserted in ``tests/test_plans.py``).

Registered after ``tempering`` in ``queries.__init__._MODULES`` — new
round-6 entries must not queue-jump the stalest-evidence queries at the
registry front (VERDICT r3 #1).

Reference parity: intended decode semantics from bom/bom.py:110-157
feeding the archive layout a spatial consumer needs; extends SURVEY
§2.C alongside g_coarsen / g_regrid_bilinear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from ..grid.decode import decode_grid_directory
from ..scale import zorder_key, zorder_key_sql
from .grid_queries import (
    MULTIRES_DIR,
    SQL_FINITE_COORDS,
    oracle_points,
    round6,
    sql_round6,
)

_MULTIRES_PTS = oracle_points(MULTIRES_DIR)

#: quantization origin / step: binary-exact, covers the fixture bbox and
#: both fixture cellsizes (0.5, 0.25 are multiples of 0.125)
X0, Y0, QUANTUM = 110.0, -47.0, 0.125


@register(
    "g_zorder_cluster",
    oracle=_MULTIRES_PTS
    + f"""
    , pts AS (
        SELECT p[2] AS RadiationType, lon, lat, rad
        FROM pts0
        -- finite, quantizer-safe coords only: a NaN/Infinity lattice
        -- (weird-grid net r14) has no meaningful curve position, Spark's
        -- quantizing round().cast(long) aborts under ANSI, and a
        -- huge-but-finite corner (xll=1e300, ADVICE r14) overflows the
        -- BIGINT cast below; NULL coords drop too (grid_queries
        -- SQL_FINITE_COORDS — the finite_coords mirror)
        WHERE {SQL_FINITE_COORDS}
    )
    SELECT RadiationType,
           {sql_round6('lon')} AS lon, {sql_round6('lat')} AS lat,
           CAST(rad AS INT) AS radiation,
           CAST({zorder_key_sql("lon", "lat", X0, Y0, QUANTUM)} AS BIGINT) AS zkey
    FROM pts
    """,
)
def g_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-extension: per-point Z-order (Morton) clustering key over the
    mixed-resolution decoded corpus — the sort key a clustered writer uses
    so 2-D box predicates prune row groups on both coordinates' min/max
    stats. Bit-interleave of the 0.125-deg-quantized (lon, lat); narrow
    (zero added Exchanges), codegen-only, engine-exact.

    Finite coordinates only (weird-grid net r14): a NaN/Infinity lattice
    has no curve position and the quantizer's round().cast(long) aborts
    under ANSI; NULL coords drop through the same predicate (shared
    ``grid_queries.finite_coords``). No-op on the fixtures."""
    from .grid_queries import finite_coords

    pts = decode_grid_directory(spark, MULTIRES_DIR).filter(finite_coords())
    return pts.select(
        "RadiationType",
        round6(F.col("Longitude")).alias("lon"),
        round6(F.col("Latitude")).alias("lat"),
        F.col("Radiation").alias("radiation"),
        zorder_key(F.col("Longitude"), F.col("Latitude"), X0, Y0, QUANTUM).alias(
            "zkey"
        ),
    )
