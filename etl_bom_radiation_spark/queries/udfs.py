"""UDF / UDAF / UDTF surface U1-U4 (SURVEY §2.G).

The reference's "UDF story" is that ALL its logic is arbitrary Python in a
Lambda (reference bom/bom.py:94-157); our engine keeps the hot paths in
built-ins (§2.D shows every reference scalar has one) and provides the
escape hatches properly:

* U1 scalar Python UDF — row-at-a-time, the SLOW path. Declared so the
  surface exists and is verified; the docstring and bench both say: use a
  built-in or a pandas_udf instead in anything hot.
* U2 vectorized pandas UDF — Arrow-batched, the right escape hatch.
* U3 Python UDTF (one row → many rows), Spark 4 ``@udtf`` — registered and
  driven through spark.sql LATERAL.
* U4 grouped UDAF via applyInPandas.

All four compute deterministic arithmetic so each carries an exact DuckDB
oracle — the point is verifying the dispatch machinery, not the math.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from . import load_tables, register


@register(
    "u01_scalar_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 6) AS disc_price
    FROM lineitem WHERE l_quantity >= 45
    """,
)
def u01_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: row-at-a-time Python UDF (pickled per row — the slow path; kept
    off the fact-table hot paths everywhere else in this repo). The filter
    stays a built-in so it still pushes down below the UDF projection."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]

    @F.udf(returnType=DoubleType())
    def disc_price(price: float, discount: float) -> float:
        # Python round() is half-even, SQL ROUND is half-up — round JVM-side.
        # NULL inputs arrive as None (r15 relational fuzzer, seed 1516):
        # a row UDF must implement SQL's NULL propagation itself or the
        # TypeError aborts the whole task — the exact footgun that makes
        # row UDFs the slow AND sharp path.
        if price is None or discount is None:
            return None
        return price * (1 - discount)

    return li.filter(F.col("l_quantity") >= 45).select(
        "l_orderkey",
        "l_linenumber",
        F.round(disc_price("l_extendedprice", "l_discount"), 6).alias("disc_price"),
    )


@register(
    "u02_pandas_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged
    FROM lineitem WHERE l_quantity >= 45
    """,
)
def u02_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: vectorized pandas UDF — Arrow batches, ~10-100x the row UDF.
    The escape hatch to use when a built-in genuinely can't express it."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]

    @F.pandas_udf(DoubleType())
    def charged(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
        # no pandas-side rounding: Series.round is half-even, SQL ROUND is
        # half-up — final rounding happens JVM-side so both engines agree
        return price * (1 - discount) * (1 + tax)

    return li.filter(F.col("l_quantity") >= 45).select(
        "l_orderkey",
        "l_linenumber",
        F.round(charged("l_extendedprice", "l_discount", "l_tax"), 6).alias("charged"),
    )


@register(
    "u03_udtf",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           tk -> length(tk) > 0) AS toks
        FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(i AS INT) AS pos,
           toks[i] AS token
    FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
    """,
)
def u03_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: Python UDTF — one row in, many rows out (the shape of the
    reference's extract_data, bom.py:110-157: 1 grid → N points). Tokenizes
    a document into (pos, token) rows via spark.sql LATERAL. The flagship
    grid decode itself deliberately does NOT use this (pure-Catalyst G1-G6
    is faster); this verifies the UDTF dispatch machinery."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):  # noqa: D401
            if text is None:
                return
            for i, tok in enumerate(text.lower().strip().split()):
                if tok:
                    yield i + 1, tok

    spark.udtf.register("tokenize_udtf", Tokenize)
    d = load_tables(spark, sf_dir, "documents")["documents"]
    d.filter(F.col("doc_id") < 50).createOrReplaceTempView("docs_head")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token FROM docs_head d, LATERAL tokenize_udtf(d.text) t"
    )


@register(
    "u04_grouped_udaf",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_quantity * l_extendedprice) / SUM(l_quantity), 6)
               AS weighted_avg_price,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def u04_grouped_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: custom grouped aggregation via applyInPandas — quantity-weighted
    mean and exact median per group. Shuffles once on the group key; each
    group is materialized as one pandas frame (fine for bounded groups —
    for unbounded groups prefer built-in aggregates or pandas_udf
    GROUPED_AGG)."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        w = pdf["l_quantity"]
        p = pdf["l_extendedprice"]
        # no pandas-side rounding (r15 fuzzer seed 1516): Python round()
        # is half-EVEN, SQL ROUND half-away — a dyadic median like
        # 539.15625 rounds to .1562 vs .1563. Same JVM-side-rounding
        # convention as u01/u02.
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                # min_count=1: SQL SUM over zero non-NULL values is NULL,
                # pandas' default sum is 0.0 — an all-NULL-price group
                # must yield NULL, not 0/29
                "weighted_avg_price": [(w * p).sum(min_count=1) / w.sum(min_count=1)],
                "median_price": [p.median()],
            }
        )

    return (
        li.groupBy("l_returnflag")
        .applyInPandas(
            agg, "l_returnflag string, weighted_avg_price double, median_price double"
        )
        .select(
            "l_returnflag",
            F.round("weighted_avg_price", 6).alias("weighted_avg_price"),
            F.round("median_price", 4).alias("median_price"),
        )
    )
