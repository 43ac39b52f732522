"""Single-pass table profiling (data-quality extension).

``x07_table_profile`` computes the per-column health profile every ETL
deployment runs before trusting a feed — row count, NULL count/fraction,
exact distinct cardinality, numeric min/max — for ALL columns of the
events table in ONE scan.  The naive loop-over-columns profiler scans
the table once per column (6x the IO here, |columns|x at 100 TB); the
Spark-first shape is a single wide aggregation whose multi-distinct is
planned through Catalyst's Expand (each input row fans to one replica
per distinct-aggregate BEFORE the shuffle, with partial combines on each
replica stream).  That expand multiplies shuffle rows by |columns| — the
standard, explicit trade against re-scanning the table |columns| times;
at 100 TB the scan is the dominant cost, so one-scan-with-expand wins
whenever the table is wider than it is hot.  (For approximate profiles
at much lower shuffle cost, swap count_distinct for
approx_count_distinct — the q17 contract.)

Engine parity: min/max are reported as DOUBLE for numeric columns and
epoch-micros for the timestamp (exact in a double up to 2^53, i.e. year
~2255) — never engine-formatted strings, which would hash-differ.
NULL-excluding distinct semantics match (COUNT(DISTINCT c) skips NULLs
on both engines), and null_frac is one small-integer division rounded
to 6 dp.

Registered after ``matryoshka`` in ``queries.__init__._MODULES`` — new
round-6 entries must not queue-jump the stalest-evidence queries at the
registry front (VERDICT r3 #1).

Reference parity: the operational analog of the reference's implicit
trust in its feed (bom.py has no data-quality gate at all — SURVEY §5.1
notes ingestion failures surface only as Lambda retries/DLQ,
cloudformation/lambda.cfn.yaml:37-45); this makes the check a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_events, register

#: (column, kind) — kind drives BOTH engines' min/max expression:
#: "num" -> plain double cast, "epoch" -> epoch-microseconds (exact in a
#: double until ~year 2255), None -> no numeric min/max. An explicit
#: marker instead of engine SQL text, so the Spark builder can never
#: silently drift from the oracle over a string comparison
#: (code-review r6).
_COLS = [
    ("event_id", "num"),
    ("ts", "epoch"),
    ("user_id", "num"),
    ("event_type", None),
    ("value", "num"),
    ("props", None),
]


def _duck_one(col: str, kind: str | None) -> str:
    if kind == "epoch":
        num = f"CAST(epoch_us({col}) AS DOUBLE)"
    elif kind == "num":
        num = f"CAST({col} AS DOUBLE)"
    else:
        num = None
    # NO rounding of min/max on either side: they are SELECTIONS of
    # stored values (not accumulations), so both engines return the
    # identical bit pattern — rounding adds nothing and DuckDB's double
    # ROUND is LOSSY above ~2^53/10^6 (ROUND(1704495840000000.0, 6)
    # returns ...0.2, measured; the r15 relational fuzzer, seed 1517,
    # plus review follow-up: the same trap applies to any large num
    # column, not just epoch-micros).
    if num:
        num_min, num_max = f"MIN({num})", f"MAX({num})"
    else:
        num_min = num_max = "CAST(NULL AS DOUBLE)"
    return f"""
    SELECT '{col}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_null,
           ROUND(CAST(COUNT(*) - COUNT({col}) AS DOUBLE) / COUNT(*), 6)
               AS null_frac,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
           {num_min} AS min_num,
           {num_max} AS max_num
    FROM events
    """


@register(
    "x07_table_profile",
    oracle=" UNION ALL ".join(_duck_one(c, n) for c, n in _COLS),
)
def x07_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 (extension): per-column data-quality profile of the events feed
    (rows, NULLs, exact distincts, numeric/epoch min-max) in ONE table
    scan — the wide multi-distinct aggregation (Catalyst Expand: |columns|x
    shuffle rows vs |columns|x table scans; the scan wins at scale)."""
    e = load_events(spark, sf_dir)
    aggs = []
    for col, kind in _COLS:
        c = F.col(col)
        aggs.append(F.count(F.lit(1)).alias(f"{col}__rows"))
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"{col}__null"))
        aggs.append(F.count_distinct(c).alias(f"{col}__dist"))
        # min/max unrounded, mirroring _duck_one: selections of stored
        # values are bit-identical across engines, and DuckDB's double
        # ROUND is lossy at large magnitude (r15 fuzzer seed 1517)
        if kind == "epoch":
            nexpr = F.unix_micros(c).cast("double")
        elif kind == "num":
            nexpr = c.cast("double")
        else:
            nexpr = F.lit(None).cast("double")
        aggs.append(F.min(nexpr).alias(f"{col}__min"))
        aggs.append(F.max(nexpr).alias(f"{col}__max"))
    wide = e.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(col).alias("col_name"),
            F.col(f"{col}__rows").alias("n_rows"),
            F.col(f"{col}__null").alias("n_null"),
            # try_divide: an empty feed yields NULL null_frac instead of an
            # ANSI abort (degenerate-data contract; non-empty tables divide
            # by a positive count, so the oracle is unaffected)
            F.round(
                F.try_divide(
                    F.col(f"{col}__null").cast("double"), F.col(f"{col}__rows")
                ),
                6,
            ).alias("null_frac"),
            F.col(f"{col}__dist").alias("n_distinct"),
            F.col(f"{col}__min").alias("min_num"),
            F.col(f"{col}__max").alias("max_num"),
        )
        for col, _ in _COLS
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")
