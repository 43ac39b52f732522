"""Window functions, sorts/top-k, set operations, subqueries — Q23-Q35
(SURVEY §2.E).

Part of the Athena/Presto query surface the reference's pipeline exists to
serve (reference README.md:4), provided natively via Spark SQL / DataFrame.

Oracle discipline: every window ORDER BY carries a unique tiebreaker
(event_id / orderkey) so ranking functions are deterministic on both
engines; range frames are peer-inclusive and therefore tie-safe by
construction; timestamps are emitted as epoch micros or formatted strings.

Scale notes (100 TB): window functions shuffle once on partitionBy keys —
fine when key cardinality is high (user_id, orderkey). There is NO
unpartitioned window in this module: global sort position (q27) goes
through scale.global_sort_index (checkpointed range partition +
in-partition mono-id sequence + broadcast offsets), and top-k (q28) is
TakeOrderedAndProject — per-partition heaps, only k rows to the driver.
LOW-cardinality partition keys are the remaining window ceiling (q23
ranks within 5 priority classes = 5 sort tasks whatever the cluster
size); q23b is the same rank through scale.grouped_rank_index — a range
exchange over (class, key) + broadcast offsets, no WindowExec — for when
that ceiling binds (measured M=10 ratio 1.26 vs q23's 1.84), and q23c
completes the family: exact NTILE(k) derived from the grouped rank +
class total (total_name), same no-Window plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import load_events, load_tables, register, register_views

# ------------------------------------------------------------------ windows


@register(
    "q23_ranking",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROW_NUMBER()  OVER w AS rn,
           RANK()        OVER w AS rk,
           DENSE_RANK()  OVER w AS drk,
           NTILE(4)      OVER w AS quart
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def q23_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q23: row_number / rank / dense_rank / ntile per priority class.
    Unique (o_totalprice, o_orderkey) order makes every rank deterministic."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rk"),
        F.dense_rank().over(w).cast("bigint").alias("drk"),
        F.ntile(4).over(w).cast("bigint").alias("quart"),
    )


@register(
    "q23b_ranking_at_scale",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
    FROM orders
    """,
)
def q23b_ranking_at_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q23's per-class rank in the scale-safe shape (VERDICT r11 #3):
    q23's ``Window.partitionBy(o_orderpriority)`` caps parallelism at
    the 5 priority classes — semantically forced for a total per-class
    rank THROUGH A WINDOW, but not for the rank itself.
    ``scale.grouped_rank_index`` computes the identical ROW_NUMBER (and,
    under the unique tiebreaker, RANK/DENSE_RANK) from one range
    exchange over (class, key) plus a broadcast offsets frame — no task
    ever sorts a whole class, so the plan has NO Window node at all
    (asserted in tests/test_plans.py) and survives a 100x scale-up at
    constant per-task work.  Hash-matched against q23's own ROW_NUMBER
    oracle."""
    from ..scale import grouped_rank_index

    o = load_tables(spark, sf_dir, "orders")["orders"]
    ranked = grouped_rank_index(
        o.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
    )
    return ranked.select("o_orderkey", "o_orderpriority", "rn")


@register(
    "q23c_ntile_at_scale",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROW_NUMBER() OVER w AS rn,
           NTILE(4)     OVER w AS quart
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def q23c_ntile_at_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q23's NTILE(4) in the scale-safe shape (VERDICT r12 #4) — the last
    member of the per-class window family without a per-class sort task.

    NTILE is a pure function of (per-class rank, per-class total):
    with ``q = total div k`` and ``r = total % k``, the SQL-standard
    larger-first split gives the first ``r`` tiles ``q+1`` rows and the
    rest ``q`` — so ``tile = (rn-1) div (q+1) + 1`` inside the first
    ``r*(q+1)`` ranks and ``r + (rn - r*(q+1) - 1) div q + 1`` after
    (validated exhaustively against the windowed NTILE for all N<=200,
    k in {1,2,3,4,5,7,16}).  ``grouped_rank_index(total_name=...)``
    supplies both inputs from one range exchange + one broadcast offsets
    join — NO Window node (plan-asserted), constant per-task work at any
    class skew.  Hash-matched against q23's own NTILE oracle.

    The ``greatest(_q, 1)`` denominator is unreachable armor: the
    second branch requires ``rn > r*(q+1)``, and when q=0 that bound is
    r = total >= rn — but ANSI mode must never see a 0 divisor even on
    an unevaluated branch's domain checks."""
    from ..scale import grouped_rank_index

    o = load_tables(spark, sf_dir, "orders")["orders"]
    ranked = grouped_rank_index(
        o.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        total_name="_total",
    )
    return (
        ranked.withColumn("_q", F.expr("_total div 4"))
        .withColumn("_r", F.col("_total") % 4)
        .withColumn(
            "quart",
            F.when(
                F.col("rn") <= F.col("_r") * (F.col("_q") + 1),
                F.expr("(rn - 1) div (_q + 1) + 1"),
            )
            .otherwise(
                F.expr("_r + (rn - _r * (_q + 1) - 1) div greatest(_q, 1) + 1")
            )
            .cast("bigint"),
        )
        .select("o_orderkey", "o_orderpriority", "rn", "quart")
    )


@register(
    "q24_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           COALESCE(CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS BIGINT), -1)
               AS us_since_prev,
           COALESCE(LEAD(event_type) OVER w, 'none') AS next_type,
           FIRST_VALUE(event_type) OVER w AS first_type
    FROM events
    -- NULLS FIRST pins the engines together on NULL order keys: Spark's
    -- ascending default is NULLS FIRST, DuckDB's default_null_order is
    -- nulls_last (NULL-parity net r13; driver fixtures are NULL-free)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS FIRST, event_id ASC)
    """,
)
def q24_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q24: lag / lead / first per user session stream."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        F.coalesce(
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)), F.lit(-1)
        ).alias("us_since_prev"),
        F.coalesce(F.lead("event_type").over(w), F.lit("none")).alias("next_type"),
        F.first("event_type").over(w).alias("first_type"),
    )


@register(
    "q25_frames",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id
                                  ORDER BY ts ASC NULLS FIRST, event_id ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_sum,
           ROUND(AVG(value) OVER (PARTITION BY user_id
                                  ORDER BY ts ASC NULLS FIRST, event_id ASC
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)
               AS moving_avg4
    FROM events
    -- NULLS FIRST: see q24 — pins DuckDB to Spark's ascending NULL order
    """,
)
def q25_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q25: explicit row frames — running sum and 4-row moving average."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias(
            "running_sum"
        ),
        F.round(F.avg("value").over(w.rowsBetween(-3, 0)), 4).alias("moving_avg4"),
    )


@register(
    "q26_range_frame",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2)
               AS trailing_1h
    FROM events
    """,
)
def q26_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q26: time-based range frame — trailing 1-hour sum per user, ordered by
    epoch seconds. Range frames include all peers, so ties need no breaker."""
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts") / 1_000_000)
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("trailing_1h"),
    )


# ------------------------------------------------------------ sorts / top-k


@register(
    "q27_global_sort",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS price,
           ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS pos
    FROM orders
    """,
)
def q27_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q27: global multi-key sort. The value hash is order-insensitive, so the
    sort position is materialized as a column. An unpartitioned
    ``Window.orderBy`` would move the whole table to a single task
    (VERDICT r2's one scale-killer); instead ``global_sort_index`` range
    partitions on the sort key and offsets per-partition row numbers by the
    earlier partitions' counts — fully parallel at any scale."""
    from ..scale import global_sort_index

    o = load_tables(spark, sf_dir, "orders")["orders"]
    indexed = global_sort_index(
        o.select("o_orderkey", "o_totalprice"),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
        index_name="pos",
    )
    return indexed.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        "pos",
    )


@register(
    "q28_topk",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q28_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q28: ORDER BY + LIMIT → TakeOrderedAndProjectExec (per-partition heaps,
    k rows to driver — never a full sort). Ties broken by orderkey."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


@register(
    "q29_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 2) AS price,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders) t
    WHERE rn <= 3
    """,
)
def q29_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q29: top-3 per group via ranked window + filter. Spark pushes the
    rn<=3 filter into the window sort (WindowGroupLimit) — per-group heaps,
    not a full per-group sort."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "x01_funnel_conversion",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS users,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                         THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                          AND t_buy > t_click THEN 1 ELSE 0 END) AS BIGINT)
               AS purchased_after_click
    FROM firsts
    """,
)
def x01_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: ordered funnel (view -> click -> purchase) conversion
    counts — the classic event-analytics query. One shuffle (groupBy
    user_id) computing first-touch timestamps via conditional MIN, then a
    global reduce; no self-joins (the naive 3-way event self-join is the
    anti-pattern at scale)."""
    ev = load_events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("viewed"),
        F.sum(
            F.when(F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")), 1).otherwise(0)
        ).alias("clicked_after_view"),
        F.sum(
            F.when(
                F.col("t_view").isNotNull()
                & (F.col("t_click") > F.col("t_view"))
                & (F.col("t_buy") > F.col("t_click")),
                1,
            ).otherwise(0)
        ).alias("purchased_after_click"),
    )


# -------------------------------------------------------------------- set ops


@register(
    "q30_union",
    oracle="""
    SELECT k, src FROM (
        SELECT c_nationkey AS k, 'c' AS src FROM customer
        UNION ALL
        SELECT s_nationkey AS k, 's' AS src FROM supplier)
    UNION
    SELECT n_nationkey AS k, 'n' AS src FROM nation
    """,
)
def q30_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q30: UNION ALL (bag) then UNION (distinct) — Spark union() is bag
    semantics, distinct() applies the set semantics explicitly."""
    t = load_tables(spark, sf_dir, "customer", "supplier", "nation")
    c = t["customer"].select(F.col("c_nationkey").alias("k"), F.lit("c").alias("src"))
    s = t["supplier"].select(F.col("s_nationkey").alias("k"), F.lit("s").alias("src"))
    n = t["nation"].select(F.col("n_nationkey").alias("k"), F.lit("n").alias("src"))
    return c.union(s).union(n).distinct()


@register(
    "q31_intersect",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q31_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q31: INTERSECT (distinct) — nations having both customers and
    suppliers."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    return t["customer"].select(F.col("c_nationkey").alias("k")).intersect(
        t["supplier"].select(F.col("s_nationkey").alias("k"))
    )


@register(
    "q31b_intersect_all",
    oracle="""
    SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def q31b_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q31b: INTERSECT ALL (bag intersection, multiplicity = min of sides)."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_suppkey").alias("k"))
    r = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("k"))
    return a.intersectAll(r)


@register(
    "q32_except",
    oracle="""
    SELECT o_orderkey AS k FROM orders
    EXCEPT
    SELECT l_orderkey FROM lineitem
    """,
)
def q32_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q32: EXCEPT (distinct) — orders with no lineitems (non-empty at every
    SF in this testdata)."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    return (
        t["orders"]
        .select(F.col("o_orderkey").alias("k"))
        .exceptAll(t["lineitem"].select(F.col("l_orderkey").alias("k")).distinct())
        .distinct()
    )


@register(
    "q32b_except_all",
    oracle="""
    SELECT l_suppkey AS k FROM lineitem WHERE l_linestatus = 'O'
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F'
    """,
)
def q32b_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q32b: EXCEPT ALL (bag difference, multiplicity-aware)."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    o = li.filter(F.col("l_linestatus") == "O").select(F.col("l_suppkey").alias("k"))
    f = li.filter(F.col("l_linestatus") == "F").select(F.col("l_suppkey").alias("k"))
    return o.exceptAll(f)


@register(
    "q33_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def q33_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q33: DISTINCT on a column subset. (dropDuplicates(subset) keeps an
    arbitrary survivor row — SURVEY §7 risk 4 — so the declared, hashable
    form projects the key columns only; the arbitrary-survivor variant is
    exercised in pytest.)"""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.select("l_returnflag", "l_linestatus").distinct()


# ------------------------------------------------------------------ subqueries


@register(
    "q34_scalar_subquery",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def q34_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q34: scalar subquery — orders above 1.5x the global average price.
    Catalyst plans the subquery as a broadcast scalar (one extra stage, then
    a pushed-down filter); no per-row re-evaluation."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
        """
    )


@register(
    "q35_exists_subquery",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier s
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
    """,
)
def q35_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q35: IN + correlated EXISTS subqueries — Catalyst decorrelates both
    into semi-joins (the IN side broadcasts: nation is 25 rows)."""
    register_views(spark, sf_dir, "supplier", "nation", "lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier s
        WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
        """
    )


@register(
    "x02_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
               MAX(CAST(o_orderdate AS DATE)) AS hi
        FROM orders
    ),
    cal AS (
        SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
        FROM bounds
    ),
    prios AS (SELECT DISTINCT o_orderpriority AS prio FROM orders),
    daily AS (
        SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS d,
               COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders GROUP BY 1, 2
    )
    SELECT p.prio, STRFTIME(c.d, '%Y-%m-%d') AS day,
           CAST(COALESCE(dl.n, 0) AS BIGINT) AS orders_n,
           ROUND(LAST_VALUE(dl.sum_price IGNORE NULLS) OVER (
                     PARTITION BY p.prio ORDER BY c.d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / LAST_VALUE(dl.n IGNORE NULLS) OVER (
                     PARTITION BY p.prio ORDER BY c.d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
               AS filled_avg
    FROM cal c
    CROSS JOIN prios p
    LEFT JOIN daily dl ON dl.prio = p.prio AND dl.d = c.d
    """,
)
def x02_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x02 (extension): time-series resample + gap fill — the hypertable
    pattern: bucket a fact table to a fixed grain, materialize missing
    buckets from a generated calendar, zero-fill counts and forward-fill
    (LOCF) sparse measures via last(ignorenulls) over an ordered window.

    Scale shape: the only heavy stage is the daily pre-aggregation of the
    fact table (one shuffle, partial+final). The calendar×key grid is
    days × distinct keys — tiny relative to the fact table at any scale —
    so the left join broadcasts the grid side is wrong-way-round; instead
    the *aggregated* daily frame joins the grid, both already small. The
    LOCF window shuffles by key only over the grid, never the fact table."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    prios = o.select(F.col("o_orderpriority").alias("prio")).distinct()
    daily = (
        o.groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.to_date("o_orderdate").alias("d"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            # LOCF carries (rounded sum, count) and divides afterwards:
            # ROUND(AVG,2) is unstable across engines (accumulation order
            # perturbs the double just enough to flip a .005 boundary),
            # while a cent-clean rounded SUM is bit-identical on both sides
            # and so is the IEEE quotient.
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )
    grid = cal.crossJoin(prios)
    w = (
        Window.partitionBy("prio")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["prio", "d"], "left")
        .select(
            "prio",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("orders_n"),
            F.round(
                F.last("sum_price", ignorenulls=True).over(w)
                / F.last("n", ignorenulls=True).over(w),
                6,
            ).alias("filled_avg"),
        )
    )


@register(
    "x03_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS wk FROM events
    )
    SELECT STRFTIME(f.cohort, '%Y-%m-%d') AS cohort_week,
           CAST(DATE_DIFF('day', f.cohort, a.wk) / 7 AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active_users
    FROM firsts f JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
)
def x03_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x03 (extension): cohort retention — users cohorted by the week of
    their first event; active_users counts how many of each cohort are
    still active k weeks later. Two shuffles on user_id (first-event agg,
    weekly-activity distinct) then one small agg on (cohort, offset); the
    user_id shuffles co-partition, so AQE reuses the exchange. Both sides
    week-truncate to Monday and difference in whole days/7, so the offset
    is calendar-convention-free."""
    ev = load_events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cohort") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@register(
    "x05_price_histogram",
    oracle="""
    WITH s AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders)
    SELECT CAST(CASE WHEN hi = lo THEN 0
                ELSE LEAST(FLOOR((o_totalprice - lo) / ((hi - lo) / 20)), 19) END
                AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo_price,
           ROUND(MAX(o_totalprice), 2) AS hi_price
    FROM orders, s GROUP BY 1
    """,
)
def x05_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x05 (extension): 20-bucket equi-width histogram of order prices —
    one tiny min/max aggregate broadcast back over the fact (two narrow
    passes, one shuffle of 20 partial rows). The classic distribution-
    profile query; both engines compute the identical IEEE bucket
    expression, so the histogram is exactly oracle-checkable."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    s = o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    w = (F.col("hi") - F.col("lo")) / 20
    return (
        o.crossJoin(F.broadcast(s))
        .withColumn(
            "bucket",
            # hi == lo (all prices equal) -> one bucket, not a zero-width
            # division aborting under ANSI mode
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.floor((F.col("o_totalprice") - F.col("lo")) / w), F.lit(19)
                )
            )
            .cast("bigint"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo_price"),
            F.round(F.max("o_totalprice"), 2).alias("hi_price"),
        )
    )


@register(
    "q34b_correlated_select_subquery",
    oracle="""
    SELECT o_orderkey,
           COALESCE((SELECT ROUND(MAX(l.l_extendedprice), 2)
                     FROM lineitem l WHERE l.l_orderkey = o.o_orderkey), -1)
               AS max_item
    FROM orders o
    """,
)
def q34b_correlated_select_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q34b: correlated scalar subquery in the SELECT list (q34 covers the
    WHERE position) — Catalyst decorrelates it into ONE aggregate of
    lineitem plus a left outer join on orderkey, not a per-row probe; at
    100 TB that is the only viable shape and the optimizer gets there
    from the declarative form."""
    register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderkey,
               COALESCE((SELECT ROUND(MAX(l.l_extendedprice), 2)
                         FROM lineitem l WHERE l.l_orderkey = o.o_orderkey), -1)
                   AS max_item
        FROM orders o
        """
    )
