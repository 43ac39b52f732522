"""Relational query surface Q1-Q22 (SURVEY §2.E): projection/filter, joins,
aggregations.

The reference delegates this entire surface to Athena/Presto over the table
its pipeline produces (reference README.md:4; partition registration
bom-partition/bom_partition.py:77,126) — here it is native Spark SQL /
DataFrame over the driver testdata star schema.

Oracle discipline (SURVEY §7 M2):
* every computed column is aliased identically on both sides;
* float aggregates are rounded on both sides (doubles summed in different
  orders agree to ~1e-9 relative; rounding at 2-4 decimals absorbs it);
* DuckDB ``SUM(<integer>)`` returns HUGEINT — always ``CAST(... AS BIGINT)``
  in the oracle to match Spark's bigint;
* timestamps are emitted as formatted strings, never raw, so value hashing
  is engine-agnostic;
* no NULLs in output columns unless the NULL itself is the semantics
  (outer joins), in which case both sides produce them identically.

Scale notes (100 TB): dimension joins broadcast (region 5 rows, nation 25,
supplier 100 — far under any broadcast threshold); fact-fact joins shuffle
on the join key and rely on AQE for skew; aggregations are partial+final
(map-side combine) automatically via HashAggregateExec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import load_events, load_tables, register, register_views

# ---------------------------------------------------------------- projection


@register(
    "q01_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 6) AS disc_price,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged,
           UPPER(l_returnflag) AS flag
    FROM lineitem
    """,
)
def q01_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: projection + aliasing + arithmetic expressions (pure narrow plan —
    no shuffle; at 100 TB this is a single scan+project stage)."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round at 6, not 2: source values are 2dp-clean so the product is
        # exact at 4-6dp — rounding there never lands on a .5 tie, where
        # Spark (HALF_UP on decimal expansion) and DuckDB (scaled nearbyint)
        # disagree.
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("disc_price"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6
        ).alias("charged"),
        F.upper("l_returnflag").alias("flag"),
    )


@register(
    "q02_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_linestatus LIKE 'F%'
      AND l_discount IS NOT NULL
    """,
)
def q02_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: comparison, BETWEEN, IN, LIKE, IS [NOT] NULL, boolean combos.
    All predicates push down to the parquet scan (PushedFilters)."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_linestatus").like("F%")
        & F.col("l_discount").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@register(
    "q03_partition_prune",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_extendedprice), 2) AS revenue
    FROM lineitem
    WHERE EXTRACT(year FROM l_shipdate) = 1997
      AND EXTRACT(month FROM l_shipdate) = 3
    """,
)
def q03_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: the year/month filter pattern the reference's Hive layout exists
    for (bom.py:28-32). Against our own partitioned sink (see ingest.py) this
    prunes directories; here it exercises the same predicate shape. The
    partition-prune assertion on a real partitioned write lives in
    tests/test_ingest.py and bench.py."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.filter(
        (F.year("l_shipdate") == 1997) & (F.month("l_shipdate") == 3)
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


@register(
    "q04_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS bucket,
           COALESCE(NULLIF(o_orderpriority, '3-MEDIUM'), 'default') AS prio
    FROM orders
    """,
)
def q04_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: CASE/WHEN, coalesce, nullif."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
        .alias("bucket"),
        F.coalesce(F.nullif("o_orderpriority", F.lit("3-MEDIUM")), F.lit("default")).alias(
            "prio"
        ),
    )


# -------------------------------------------------------------------- joins


@register(
    "q05_inner_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus,
           ROUND(l.l_extendedprice, 2) AS price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def q05_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: fact-fact inner equi-join — shuffles both sides on l_orderkey
    (SortMergeJoin/ShuffledHashJoin; AQE picks). At 100 TB both sides
    co-partition on the key; no broadcast (orders is a fact)."""
    t = load_tables(spark, sf_dir, "lineitem", "orders")
    return (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "l_orderkey",
            "l_linenumber",
            "o_orderstatus",
            F.round("l_extendedprice", 2).alias("price"),
        )
    )


@register(
    "q06_broadcast_join",
    oracle="""
    SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q06_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: explicit broadcast of the small dims (region=5, nation=25 rows) —
    BroadcastHashJoinExec, zero shuffle of the big side. The pattern every
    dim join at 100 TB should use."""
    t = load_tables(spark, sf_dir, "customer", "nation", "region")
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("customers"))
    )


@register(
    "q07_left_outer_join",
    oracle="""
    SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS order_cnt
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def q07_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7a: left outer join — customers keep a row even with zero orders
    (COUNT of the null-extended column is 0)."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@register(
    "q07b_full_outer_join",
    oracle="""
    WITH l AS (SELECT DISTINCT l_suppkey AS k FROM lineitem),
         s AS (SELECT s_suppkey AS k, s_name FROM supplier)
    SELECT COALESCE(l.k, s.k) AS suppkey,
           CASE WHEN l.k IS NULL THEN 'supplier_only'
                WHEN s.k IS NULL THEN 'lineitem_only'
                ELSE 'both' END AS presence
    FROM l FULL OUTER JOIN s ON l.k = s.k
    """,
)
def q07b_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7b: full outer join with null-side classification."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    li = t["lineitem"].select(F.col("l_suppkey").alias("lk")).distinct()
    s = t["supplier"].select(F.col("s_suppkey").alias("sk"), "s_name")
    return (
        li.join(s, li.lk == s.sk, "full")
        .select(
            F.coalesce("lk", "sk").alias("suppkey"),
            F.when(F.col("lk").isNull(), "supplier_only")
            .when(F.col("sk").isNull(), "lineitem_only")
            .otherwise("both")
            .alias("presence"),
        )
    )


@register(
    "q08_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def q08_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: left semi join (EXISTS) — no row duplication from the right side."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    big = t["orders"].filter(F.col("o_totalprice") > 300000)
    return t["customer"].join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q09_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def q09_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9: left anti join (NOT EXISTS) — customers with no URGENT orders.
    (Filtered right side so the result is non-empty at every SF — an
    unfiltered variant matches vacuously with 0 rows.)"""
    t = load_tables(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return t["customer"].join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q10_range_join",
    oracle="""
    WITH bands(band, lo, hi) AS (VALUES
        ('p0_50k',    0.0,    50000.0),
        ('p50_150k',  50000.0, 150000.0),
        ('p150_300k', 150000.0, 300000.0),
        ('p300k_inf', 300000.0, 1000000000.0))
    SELECT b.band, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o.o_totalprice), 2) AS total
    FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def q10_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: theta/non-equi join against a tiny bands table —
    BroadcastNestedLoopJoin (the only sane physical plan: broadcast the
    4-row side, never shuffle the fact)."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    bands = o.sparkSession.createDataFrame(
        [
            ("p0_50k", 0.0, 50000.0),
            ("p50_150k", 50000.0, 150000.0),
            ("p150_300k", 150000.0, 300000.0),
            ("p300k_inf", 300000.0, 1e9),
        ],
        ["band", "lo", "hi"],
    )
    return (
        o.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "q10b_range_join_bucketed",
    oracle="""
    WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events)
    SELECT a.event_id, CAST(COUNT(b.event_id) AS BIGINT) AS n_within_5min
    FROM e a JOIN e b
      ON b.event_id <> a.event_id AND abs(b.us - a.us) <= 300000000
    GROUP BY a.event_id
    """,
)
def q10b_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10b: fact-fact RANGE join at scale — count, per event, the other
    events within ±5 minutes. q10's BroadcastNestedLoopJoin is only sane
    when one side is tiny; when BOTH sides are facts the scale pattern is
    range bucketing: quantize time into 5-minute buckets, explode the left
    side to its bucket ±1 (bounded 3x inflation), equi-join on the bucket
    (one shuffle, never a nested loop), then apply the exact range
    predicate as a post-filter. DuckDB's IEJoin computes the same result
    from the raw inequality."""
    ev = load_events(spark, sf_dir).select("event_id", F.unix_micros("ts").alias("us"))
    span = 300_000_000  # 5 minutes in microseconds
    # integer `div`, NOT float `/` + floor: the codebase convention for
    # epoch arithmetic (see load_events) — float division of large epoch
    # integers silently loses low bits past 2^53
    b = F.expr(f"us div {span}")
    left = ev.select(
        F.col("event_id").alias("a_id"),
        F.col("us").alias("a_us"),
        F.explode(F.array(b - 1, b, b + 1)).alias("bucket"),
    )
    right = ev.select(
        F.col("event_id").alias("b_id"), F.col("us").alias("b_us"), b.alias("bucket")
    )
    return (
        left.join(right, "bucket")
        .filter(
            (F.col("a_id") != F.col("b_id"))
            & (F.abs(F.col("a_us") - F.col("b_us")) <= span)
        )
        .groupBy(F.col("a_id").alias("event_id"))
        .agg(F.count(F.lit(1)).alias("n_within_5min"))
    )


@register(
    "q11_cross_join",
    oracle="""
    SELECT r.r_name, p.o_orderpriority
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
    """,
)
def q11_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11: cross join of two tiny inputs (5 x |priorities|)."""
    t = load_tables(spark, sf_dir, "region", "orders")
    prios = t["orders"].select("o_orderpriority").distinct()
    return t["region"].select("r_name").crossJoin(prios)


@register(
    "q12_asof_join",
    oracle="""
    SELECT p.event_id,
           COALESCE(CAST(epoch_us(c.ts) AS BIGINT), -1) AS last_click_us
    FROM (SELECT * FROM events
          WHERE event_type = 'purchase' AND ts IS NOT NULL) p
    ASOF LEFT JOIN (SELECT * FROM events
                    WHERE event_type = 'click' AND ts IS NOT NULL) c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    -- NULL-ts rows are handled OUTSIDE the ASOF join: SQL comparison
    -- semantics say a NULL-ts purchase matches nothing (the Spark side's
    -- last() window gives it -1), but DuckDB's sort-based ASOF implements
    -- NULL probes as greatest-key matches; a NULL-ts click can likewise
    -- never be "last at or before". Union the no-match rows explicitly.
    UNION ALL
    SELECT event_id, -1 AS last_click_us
    FROM events WHERE event_type = 'purchase' AND ts IS NULL
    """,
)
def q12_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12: as-of join — for each purchase, the latest click by the same user
    at or before it.

    Implemented the scalable way: union both sides tagged, one window sort
    per user carrying the last click timestamp forward
    (``last(click_ts, ignorenulls=True)``), then keep purchases. ONE shuffle
    on user_id, no range self-join blowup — this is the plan that survives
    100 TB (a join with ``c.ts <= p.ts`` would be quadratic per user).
    DuckDB has native ASOF JOIN for the oracle.
    """
    from . import load_events

    ev = load_events(spark, sf_dir)
    tagged = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        # user_id.isNotNull(): Window.partitionBy treats NULL keys as ONE
        # real partition, so without the guard a NULL-user click would be
        # carried to a NULL-user purchase — but join semantics (and the
        # DuckDB ASOF oracle's equality condition) say an unattributable
        # click matches NOTHING (code-review r13; no-op on driver data,
        # user_id is never NULL there)
        F.when(
            (F.col("event_type") == "click") & F.col("user_id").isNotNull(),
            F.col("ts"),
        ).alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_type").asc())  # click before purchase on ts ties
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_click", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.coalesce(F.unix_micros("last_click"), F.lit(-1)).alias("last_click_us"),
        )
    )


@register(
    "q13_multiway_join",
    oracle="""
    SELECT r.r_name, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q13_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: 5-way star join (TPC-H Q5 shape). The two facts shuffle-join on
    orderkey; the three dims broadcast. Catalyst/AQE reorders; at 100 TB the
    l⋈o join dominates and must stay shuffle-based, the rest stay broadcast."""
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer", "nation", "region")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("items"),
        )
    )


@register(
    "q13b_profit_star",
    oracle="""
    SELECT n.n_name, p.p_brand,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.6 * p.p_retailprice * l.l_quantity), 2) AS profit,
           CAST(COUNT(*) AS BIGINT) AS items
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type = 'ECONOMY'
    GROUP BY n.n_name, p.p_brand
    """,
)
def q13b_profit_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13b (TPC-H Q9 shape): profit by supplier nation and brand through
    the part/supplier dimensions. The p_type filter prunes part BEFORE the
    join (pushed to its scan); part and supplier broadcast (both far under
    threshold at any realistic dimension size); only lineitem shuffles —
    for the final aggregation, not the joins."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    econ = t["part"].filter(F.col("p_type") == "ECONOMY")
    return (
        t["lineitem"]
        .join(F.broadcast(econ), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "p_brand")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
                ),
                2,
            ).alias("profit"),
            F.count(F.lit(1)).alias("items"),
        )
    )


# ------------------------------------------------------------- aggregations


@register(
    "q14_groupby_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q14_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: hash aggregate (TPC-H Q1 shape) — partial+final automatically
    (map-side combine), so the shuffle carries |groups| rows per task, not
    the fact table."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q15_global_agg",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS total_qty,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price
    FROM lineitem
    """,
)
def q15_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: global (no-group) aggregates — single final reduce after
    map-side partials."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "q16_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supps,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q16_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16: multiple COUNT(DISTINCT) — Catalyst expands to a two-phase
    aggregate; distinct keys shuffle once per distinct column."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("supps"),
        F.countDistinct("l_partkey").alias("parts"),
    )


@register("q17_approx_count_distinct", oracle=None)
def q17_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: approx_count_distinct (HLL++) — approximate, so rows-only for the
    driver; our pytest asserts bounded error vs exact. At 100 TB this is the
    only affordable distinct-count: fixed-size sketch, no distinct shuffle."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts")
    )


@register(
    "q18_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q18_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: exact percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``, both linear-interpolating). The approximate variant
    (percentile_approx) is benched but not oracled — see q18b."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.5), 4).alias("p50"),
        F.round(F.percentile("l_quantity", 0.9), 4).alias("p90"),
    )


@register("q18b_percentile_approx", oracle=None)
def q18b_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18b: percentile_approx (GK sketch) — the 100 TB path: mergeable
    fixed-size sketch instead of a full sort per group. Rows-only."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median_price")
    )


@register(
    "q19_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS flag,
           COALESCE(l_linestatus, '<all>') AS status,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    -- HAVING pins the engines' empty-input divergence: Spark emits ZERO
    -- rows for a grouping-sets aggregate over an empty relation while
    -- DuckDB emits the () grand-total row (SQL-standard). Every grouping
    -- set row over a NON-empty input has COUNT(*) >= 1, so this is a
    -- no-op except on empty input (empty-corpus net r13)
    HAVING COUNT(*) > 0
    """,
)
def q19_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: ROLLUP (subtotals + grand total). Grouping-set nulls are
    coalesced to a sentinel so the hash compare is null-free (the data's own
    flags are never null)."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("status"),
            "n",
            "qty",
        )
    )


@register(
    "q19b_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS prio,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    HAVING COUNT(*) > 0 -- empty-input pin, see q19
    """,
)
def q19b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19b: CUBE — all grouping-set combinations."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("prio"),
            "n",
        )
    )


@register(
    "q20_having",
    oracle="""
    SELECT l_suppkey, ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem GROUP BY l_suppkey
    HAVING SUM(l_quantity) > 15000
    """,
)
def q20_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20: HAVING = post-aggregation filter."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 15000)
    )


@register(
    "q21_collect_list",
    # COALESCE(.., '') on both aggs (r15 relational fuzzer, seed 1516):
    # Spark's collect_set/collect_list SKIP NULLs, so an all-NULL-name
    # group yields an EMPTY array whose array_join is '' — DuckDB's
    # list() aggregate yields NULL for that group and array_to_string
    # propagates it. The engine pins Spark's reading: empty string.
    oracle="""
    SELECT r.r_name,
           COALESCE(array_to_string(list_sort(list(DISTINCT n.n_name)), ','), '')
               AS nations,
           COALESCE(array_to_string(list_sort(list(n.n_name)), ','), '')
               AS nations_all,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q21_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21: array aggs — collect_set (distinct bag) and collect_list (full
    bag), both sorted then joined to strings so the value hash is order- and
    type-stable (collect order is nondeterministic by contract)."""
    t = load_tables(spark, sf_dir, "nation", "region")
    return (
        t["nation"]
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations_all"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q22_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qp
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q22_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22: statistical aggregates (sample stddev/variance, correlation)."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
    )


@register(
    "q19c_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS flag,
           COALESCE(l_linestatus, '<all>') AS status,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_extendedprice), 2) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    HAVING COUNT(*) > 0 -- empty-input pin, see q19
    """,
)
def q19c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19c: explicit GROUPING SETS with GROUPING() markers — the general
    form of rollup/cube (q19/q19b). One Expand + one HashAggregate: each
    input row is replicated once per grouping set map-side, then partially
    aggregated before the single shuffle (same plan shape at 100 TB)."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, '<all>') AS flag,
               COALESCE(l_linestatus, '<all>') AS status,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
               COUNT(*) AS n,
               ROUND(SUM(l_extendedprice), 2) AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "q43_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 2)
               AS qty_f,
           ROUND(COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 2)
               AS qty_o,
           CAST(COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
           CAST(COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS n_o
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q43_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q43 (extension): PIVOT — long-to-wide reshape. Pivot values are given
    explicitly so no extra distinct-collect job runs (at 100 TB an implicit
    pivot does a full pass just to enumerate values); compiles to conditional
    aggregation = one HashAggregate, same cost as q14."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return wide.select(
        "l_returnflag",
        F.coalesce(F.col("F_qty"), F.lit(0.0)).alias("qty_f"),
        F.coalesce(F.col("O_qty"), F.lit(0.0)).alias("qty_o"),
        F.coalesce(F.col("F_n"), F.lit(0).cast("long")).alias("n_f"),
        F.coalesce(F.col("O_n"), F.lit(0).cast("long")).alias("n_o"),
    )
