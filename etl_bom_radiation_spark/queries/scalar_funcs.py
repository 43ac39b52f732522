"""Scalar function families Q36-Q42 and the reference's own scalar surface
F1-F13 as declared, oracle-backed queries (SURVEY §2.D, §2.E).

The F-family composites re-run the reference's two filename grammars
(reference bom/bom.py:94-107 and bom-partition/bom_partition.py:14-26) over
deterministic filenames synthesized from testdata rows, so split /
substring / regexp_extract / to_timestamp / tz-convert / date_format /
make_timestamp+interval are all driver-verified — not just used in passing
inside the grid decode.

Oracle notes:
* DuckDB ``dayofweek`` is 0-based (Sun=0); Spark is 1-based (Sun=1) → +1.
* Sydney conversion in DuckDB via the session-TZ-independent chain
  ``(ts AT TIME ZONE 'UTC') AT TIME ZONE 'Australia/Sydney'``.
* All timestamps leave as formatted strings; floats rounded on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_events, load_tables, register

# ------------------------------------------------------------ Q36-Q42 families


@register(
    "q36_string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS up, LOWER(c_name) AS lo,
           TRIM(c_name) AS tr,
           LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           CAST(LENGTH(c_name) AS INT) AS len,
           SUBSTRING(c_name, 1, 8) AS pre,
           CONCAT_WS('|', c_name, c_mktsegment) AS joined,
           CAST(INSTR(c_name, '0') AS INT) AS pos0,
           CASE WHEN c_name LIKE '%er#00%' THEN 1 ELSE 0 END AS has_pat,
           REGEXP_REPLACE(c_name, '[0-9]+', '#') AS depunct
    FROM customer
    """,
)
def q36_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q36: string family — upper/lower/trim/lpad/length/substr/concat_ws/
    instr/like/regexp_replace."""
    c = load_tables(spark, sf_dir, "customer")["customer"]
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_name").alias("lo"),
        F.trim("c_name").alias("tr"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.length("c_name").cast("int").alias("len"),
        F.substring("c_name", 1, 8).alias("pre"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.instr("c_name", "0").cast("int").alias("pos0"),
        F.when(F.col("c_name").like("%er#00%"), 1).otherwise(0).alias("has_pat"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("depunct"),
    )


@register(
    "q37_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS r1,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS fl,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS ce,
           ROUND(ABS(l_extendedprice - 30000), 2) AS ab,
           ROUND(POW(l_quantity, 2), 2) AS sq,
           ROUND(SQRT(l_extendedprice), 6) AS rt,
           ROUND(LN(l_extendedprice), 6) AS lg,
           ROUND(LOG10(l_extendedprice), 6) AS l10,
           CAST(SIGN(l_extendedprice - 30000) AS INT) AS sg,
           -- TRUNC first (r16 fuzzer): Spark's double->integral cast
           -- TRUNCATES toward zero while DuckDB's CAST rounds to nearest
           -- (-48.75 -> Spark -48, DuckDB -49) — invisible until the r16
           -- corpus made l_quantity fractional
           CAST(MOD(CAST(TRUNC(l_quantity) AS BIGINT), 7) AS BIGINT) AS md
    FROM lineitem
    """,
)
def q37_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q37: math family — round/floor/ceil/abs/pow/sqrt/ln/log10/sign/mod."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        # try_cast on every double->integral narrowing: a NaN/Infinity
        # price (sensor-garbage class) must degrade to NULL, not abort
        # with ANSI CAST_OVERFLOW (specials-corpus net r13); identical to
        # cast for every finite value
        F.floor("l_extendedprice").try_cast("bigint").alias("fl"),
        F.ceil("l_extendedprice").try_cast("bigint").alias("ce"),
        F.round(F.abs(F.col("l_extendedprice") - 30000), 2).alias("ab"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("rt"),
        F.round(F.log("l_extendedprice"), 6).alias("lg"),
        F.round(F.log10("l_extendedprice"), 6).alias("l10"),
        F.signum(F.col("l_extendedprice") - 30000).try_cast("int").alias("sg"),
        (F.col("l_quantity").try_cast("bigint") % 7).alias("md"),
    )


@register(
    "q38_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT)
               AS days_to_end,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           CAST(weekofyear(o_orderdate) AS INT) AS woy,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def q38_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q38: date/time family — date_trunc/date_add/datediff/last_day/
    dayofweek/weekofyear/unix_timestamp. DuckDB dow is 0-based → oracle +1."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "plus30"
        ),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("int")
        .alias("days_to_end"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("eom"),
        F.dayofweek("o_orderdate").cast("int").alias("dow"),
        F.weekofyear("o_orderdate").cast("int").alias("woy"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@register(
    "q39_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(list_sum(CAST(embedding AS DOUBLE[])), 4) AS vec_sum,
           ROUND(list_max(CAST(embedding AS DOUBLE[])), 6) AS vec_max,
           ROUND(list_sum(CAST(list_slice(embedding, 1, 8) AS DOUBLE[])), 4)
               AS head_sum,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS INT)
               AS n_pos,
           ROUND(SQRT(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                              x -> x * x))), 6) AS l2,
           CASE WHEN list_contains(list_transform(CAST(embedding AS DOUBLE[]),
                                                  x -> x > 1.0), true)
                THEN 1 ELSE 0 END AS any_gt1,
           ROUND(list_sum(CAST(flatten([list_slice(embedding, 1, 4),
                                        list_slice(embedding, 5, 8)])
                               AS DOUBLE[])), 4) AS flat_head_sum
    FROM embeddings
    """,
)
def q39_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q39: array family incl. higher-order functions — size/slice/filter/
    transform/aggregate over the embedding vectors. All JVM-side (no UDF):
    at 100 TB these run inside whole-stage codegen per row."""
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    vec = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x), 4).alias("vec_sum"),
        F.round(F.array_max(vec), 6).alias("vec_max"),
        F.round(
            F.aggregate(F.slice(vec, 1, 8), F.lit(0.0), lambda a, x: a + x), 4
        ).alias("head_sum"),
        F.size(F.filter(vec, lambda x: x > 0)).cast("int").alias("n_pos"),
        F.round(
            F.sqrt(F.aggregate(F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)),
            6,
        ).alias("l2"),
        F.when(F.array_contains(F.transform(vec, lambda x: x > 1.0), F.lit(True)), 1)
        .otherwise(0)
        .alias("any_gt1"),
        F.round(
            F.aggregate(
                F.flatten(F.array(F.slice(vec, 1, 4), F.slice(vec, 5, 4))),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            4,
        ).alias("flat_head_sum"),
    )


@register(
    "q40_map_funcs",
    oracle="""
    SELECT event_id,
           'type,user' AS keys,
           event_type AS type_val,
           CAST(user_id AS VARCHAR) AS user_val
    FROM events
    """,
)
def q40_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q40: map family — construct a map from columns, then map_keys /
    element_at round-trip. The oracle is the direct column expression (DuckDB
    map support is limited; the point is Spark's map ops, whose outputs are
    fully determined by the inputs)."""
    ev = load_events(spark, sf_dir)
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("user"), F.col("user_id").cast("string")
    )
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("keys"),
        F.element_at(m, "type").alias("type_val"),
        F.element_at(m, "user").alias("user_val"),
    )


@register(
    "q41_json_funcs",
    oracle="""
    -- dirty-JSON pins (net r13): DuckDB's json functions RAISE on
    -- malformed JSON where Spark's return NULL — TRY_CAST(props AS JSON)
    -- NULLs the bad documents first. The two columns pin the two Spark
    -- access paths' DIFFERENT coercion rules (code-review r13):
    -- * k_path (get_json_object + try_cast): the raw extract parses as a
    --   strict integer STRING — so a JSON-integer k AND a string k like
    --   "7" / " +7 " both extract, while '2.9', '"x"', objects and
    --   booleans are NULL (DuckDB's bare VARCHAR->INT cast would round
    --   '2.9' to 3, hence the regexp admission). Spark's try_cast trims
    --   EVERY char <= 0x20 PLUS \\x7f/DEL (tab, newline, even \\x01 —
    --   UTF8String trimAll; the \\x7f member found by the r15 byte
    --   fuzzer, ADVICE r15 closed this third mirror), so the oracle
    --   strips that same class via regexp before matching/casting
    --   (ADVICE r13; measured: Spark try_cast('\\x017')=7 and
    --   try_cast('\\x7f7')=7 while DuckDB TRY_CAST NULLs both);
    -- * k_struct (from_json "k INT"): JSON-TYPE-strict — integers only
    --   (BIGINT/UBIGINT by sign in DuckDB's json_type), string "7" is
    --   NULL.
    SELECT event_id,
           TRY_CAST(CASE WHEN json_type(TRY_CAST(props AS JSON), '$.k')
                              IN ('INTEGER', 'BIGINT', 'UBIGINT')
                         THEN json_extract_string(TRY_CAST(props AS JSON), '$.k')
                         WHEN json_type(TRY_CAST(props AS JSON), '$.k') = 'VARCHAR'
                              AND regexp_full_match(
                                    regexp_replace(
                                      json_extract_string(
                                        TRY_CAST(props AS JSON), '$.k'),
                                      '^[\\x00-\\x20\\x7f]+|[\\x00-\\x20\\x7f]+$', '', 'g'),
                                    '[+-]?[0-9]+')
                         THEN regexp_replace(
                                json_extract_string(TRY_CAST(props AS JSON), '$.k'),
                                '^[\\x00-\\x20\\x7f]+|[\\x00-\\x20\\x7f]+$', '', 'g')
                    END AS INT) AS k_path,
           TRY_CAST(CASE WHEN json_type(TRY_CAST(props AS JSON), '$.k')
                              IN ('INTEGER', 'BIGINT', 'UBIGINT')
                         THEN json_extract_string(TRY_CAST(props AS JSON), '$.k')
                    END AS INT) AS k_struct,
           CASE WHEN json_extract_string(TRY_CAST(props AS JSON), '$.missing') IS NULL
                THEN 'absent' ELSE 'present' END AS missing_key
    FROM events
    """,
)
def q41_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q41: JSON family on events.props — get_json_object path extraction and
    typed from_json struct access."""
    ev = load_events(spark, sf_dir)
    parsed = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        # try_cast: get_json_object returns the raw STRING ('x', '2.9'),
        # which ANSI cast ABORTS on for non-integer values — try_cast
        # yields NULL, exactly from_json's strict-int behavior (measured
        # over 10 dirty variants, net r13)
        F.get_json_object("props", "$.k").try_cast("int").alias("k_path"),
        parsed.getField("k").alias("k_struct"),
        F.when(F.get_json_object("props", "$.missing").isNull(), "absent")
        .otherwise("present")
        .alias("missing_key"),
    )


@register(
    "q42_hash_funcs",
    oracle="""
    SELECT c_custkey, md5(c_name) AS h_md5, sha256(c_name) AS h_sha
    FROM customer
    """,
)
def q42_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q42: deterministic hash family — md5 / sha2-256 (the oracle-able
    subset; xxhash64 is Spark-specific and monotonically_increasing_id /
    uuid are nondeterministic by design, exercised in pytest only)."""
    c = load_tables(spark, sf_dir, "customer")["customer"]
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("h_md5"),
        F.sha2("c_name", 256).alias("h_sha"),
    )


# --------------------------------------------- reference scalar surface F1-F13


@register(
    "f_grammar_bom",
    oracle="""
    WITH fn AS (
        SELECT o_orderkey,
               'IDCJ0000_GLOBAL_' || strftime(o_orderdate, '%Y%m%d') || '_'
                   || strftime(o_orderdate, '%H%M') || '.txt' AS filename
        FROM orders
    ), parts AS (
        SELECT o_orderkey, filename,
               string_split(regexp_replace(filename, '\\.[^.]*$', ''), '_') AS p
        FROM fn
    )
    SELECT o_orderkey,
           p[2] AS radiation_type,
           strftime(
             (strptime(p[3] || ' ' || substring(p[4], 1, 2), '%Y%m%d %H')
               AT TIME ZONE 'UTC') AT TIME ZONE 'Australia/Sydney',
             '%Y-%m-%d %H:%M') AS sydney_local
    FROM parts
    """,
)
def f_grammar_bom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F3/F5/F6/F7/F8/F13 composite: the reference's primary filename
    grammar ``<base>_<type>_<YYYYMMDD>_<HHMM>.<ext>`` (bom.py:94-107) —
    synthesize a filename per order row, then parse it back: strip extension
    (F13), split on '_' (F1), substring the hour (F3), parse 'yyyyMMdd H'
    (F6), convert UTC→Sydney (F7, DST-correct), format (F8)."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    fn = F.concat(
        F.lit("IDCJ0000_GLOBAL_"),
        F.date_format("o_orderdate", "yyyyMMdd"),
        F.lit("_"),
        F.date_format("o_orderdate", "HHmm"),
        F.lit(".txt"),
    )
    stem = F.regexp_replace(fn, r"\.[^.]*$", "")
    p = F.split(stem, "_")
    # try_to_timestamp, not to_timestamp: a NULL o_orderdate makes the
    # synthesized filename NULL, and concat_ws SKIPS nulls — the parse
    # input degrades to '' which ANSI to_timestamp ABORTS on; try_ yields
    # NULL, matching the oracle's strptime(NULL) (NULL-parity net r13)
    ts = F.try_to_timestamp(
        F.concat_ws(" ", F.element_at(p, 3), F.substring(F.element_at(p, 4), 1, 2)),
        F.lit("yyyyMMdd H"),
    )
    return o.select(
        "o_orderkey",
        F.element_at(p, 2).alias("radiation_type"),
        F.date_format(
            F.from_utc_timestamp(ts, "Australia/Sydney"), "yyyy-MM-dd HH:mm"
        ).alias("sydney_local"),
    )


@register(
    "f_grammar_run",
    oracle="""
    WITH fn AS (
        SELECT event_id,
               'NEMPriceSetter_' || strftime(ts, '%Y%m%d')
                   || lpad(CAST(event_id % 288 AS VARCHAR), 3, '0') || '.csv' AS filename
        FROM events
    ), run AS (
        SELECT event_id, regexp_extract(filename, '[0-9]{11}') AS r FROM fn
    )
    SELECT event_id,
           strftime(
             make_timestamp(CAST(substring(r, 1, 4) AS INT),
                            CAST(substring(r, 5, 2) AS INT),
                            CAST(substring(r, 7, 2) AS INT), 4, 0, 0.0)
               + to_minutes(CAST(substring(r, 9, 3) AS BIGINT) * 5),
             '%Y-%m-%d %H:%M') AS run_ts
    FROM run
    """,
)
def f_grammar_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F9/F10 composite: the reference's second filename grammar — an
    11-digit ``YYYYMMDDNNN`` run where NNN is a 5-minute slot added to an
    04:00 base (bom_partition.py:14-26): regexp_extract (F2), substring
    fields, make_timestamp + interval arithmetic (F9)."""
    ev = load_events(spark, sf_dir)
    fn = F.concat(
        F.lit("NEMPriceSetter_"),
        F.date_format("ts", "yyyyMMdd"),
        F.lpad((F.col("event_id") % 288).cast("string"), 3, "0"),
        F.lit(".csv"),
    )
    r = F.regexp_extract(fn, r"[0-9]{11}", 0)
    base = F.make_timestamp(
        F.substring(r, 1, 4).cast("int"),
        F.substring(r, 5, 2).cast("int"),
        F.substring(r, 7, 2).cast("int"),
        F.lit(4),
        F.lit(0),
        F.lit(0),
    )
    run_ts = base + F.make_interval(mins=F.substring(r, 9, 3).cast("int") * 5)
    return ev.select(
        "event_id",
        F.date_format(run_ts, "yyyy-MM-dd HH:mm").alias("run_ts"),
    )


@register(
    "q36b_fuzzy_string",
    # levenshtein drift (r15 relational fuzzer, seed 1515): Spark counts
    # CODEPOINTS, DuckDB counts BYTES — identical on ASCII, off-by-N on
    # multi-byte text (lev('CANADA', 'CÔTE D''IVOIRE') = 11 vs 12,
    # measured). The oracle transcodes the corpus' non-ASCII alphabet to
    # single-byte control chars first (DuckDB TRANSLATE is
    # codepoint-aware), restoring codepoint semantics. The alphabet
    # covers every non-ASCII atom the corpus generators emit; extend it
    # alongside the pools.
    oracle="""
    WITH cp AS (
      SELECT n_nationkey,
             translate(n_name, 'ÔÅéïÀÜ',
                       chr(1)||chr(2)||chr(3)||chr(4)||chr(5)||chr(6)) AS t,
             n_name
      FROM nation
    )
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist,
           REVERSE(a.n_name) AS rev,
           TRANSLATE(a.n_name, 'AEIOU', 'aeiou') AS tr,
           REPEAT(SUBSTR(a.n_name, 1, 2), 2) AS rep
    FROM cp a JOIN cp b ON b.n_nationkey = a.n_nationkey + 1
    """,
)
def q36b_fuzzy_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q36b (extension): fuzzy/string-shape functions — levenshtein edit
    distance (the building block of typo-tolerant entity resolution),
    reverse, translate, repeat. At scale a levenshtein theta-join is
    quadratic — here it keys on a linear pair chain; real near-match
    joins go through the LSH operators (n02/n04b) to get candidate pairs
    first, then levenshtein only on candidates."""
    n = load_tables(spark, sf_dir, "nation")["nation"]
    a = n.select(F.col("n_name").alias("name_a"), F.col("n_nationkey").alias("ka"))
    b = n.select(F.col("n_name").alias("name_b"), F.col("n_nationkey").alias("kb"))
    return (
        a.join(b, F.col("kb") == F.col("ka") + 1)
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
            F.reverse("name_a").alias("rev"),
            F.translate("name_a", "AEIOU", "aeiou").alias("tr"),
            F.repeat(F.substring("name_a", 1, 2), 2).alias("rep"),
        )
    )


@register(
    "q44_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
    FROM lineitem WHERE l_orderkey % 100 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_orderkey % 100 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
    FROM lineitem WHERE l_orderkey % 100 = 0
    """,
)
def q44_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q44 (extension): UNPIVOT/melt — wide-to-long reshape, the inverse of
    q43. Catalyst plans it as Expand (each input row replicated once per
    measure map-side): narrow, no shuffle, no join — the UNION-ALL oracle
    shape without the three scans."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.filter(F.col("l_orderkey") % 100 == 0).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure",
        "val",
    )


@register(
    "q45_extended_aggs",
    oracle="""
    SELECT l_returnflag,
           ROUND(MEDIAN(l_quantity), 4) AS med_qty,
           COALESCE(BOOL_AND(l_quantity > 0), FALSE) AS all_pos,
           COALESCE(BOOL_OR(l_discount > 0.09), FALSE) AS any_big_disc,
           CAST(BIT_AND(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS band,
           CAST(BIT_OR(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS bor,
           CAST(BIT_XOR(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS bxor,
           CAST(COUNT_IF(l_tax > 0.04) AS BIGINT) AS n_taxed
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q45_extended_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q45 (extension): the long tail of aggregate functions — exact median
    (interpolating percentile), bool_and/bool_or predicates, bitwise
    and/or/xor reductions, count_if. All partial+final mergeable except
    median, which needs the full group (the scalable alternative is
    percentile_approx, q18b)."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
        # coalesce to FALSE: bool_and/bool_or over an all-NULL group is
        # SQL-NULL on both engines, but a NULL boolean round-trips as
        # None (Spark) vs NaN (DuckDB) through pandas and the driver's
        # value compare treats those as different — pin "unknown = false"
        F.coalesce(F.bool_and(F.col("l_quantity") > 0), F.lit(False)).alias("all_pos"),
        F.coalesce(F.bool_or(F.col("l_discount") > 0.09), F.lit(False)).alias(
            "any_big_disc"
        ),
        F.bit_and(F.col("l_linenumber").cast("long")).alias("band"),
        F.bit_or(F.col("l_linenumber").cast("long")).alias("bor"),
        F.bit_xor(F.col("l_linenumber").cast("long")).alias("bxor"),
        F.count_if(F.col("l_tax") > 0.04).alias("n_taxed"),
    )


@register(
    "q38b_datetime_more",
    oracle="""
    SELECT o_orderkey,
           STRFTIME(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
           CAST(QUARTER(o_orderdate) AS BIGINT) AS qtr,
           CAST(DAYOFYEAR(o_orderdate) AS BIGINT) AS doy,
           STRFTIME(DATE_TRUNC('quarter', o_orderdate), '%Y-%m-%d') AS qstart,
           STRFTIME(CAST(o_orderdate AS DATE) - 90, '%Y-%m-%d') AS minus90d
    FROM orders WHERE o_orderkey % 50 = 0
    """,
)
def q38b_datetime_more(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q38b (extension): calendar arithmetic beyond q38 — add_months (both
    engines clamp month-end identically), quarter, day-of-year,
    quarter-truncation, day subtraction. All emitted as formatted strings so
    the value hash is engine- and timezone-neutral."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return o.filter(F.col("o_orderkey") % 50 == 0).select(
        "o_orderkey",
        F.date_format(F.add_months(F.to_date("o_orderdate"), 3), "yyyy-MM-dd").alias("plus3m"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.date_format(F.date_trunc("quarter", "o_orderdate"), "yyyy-MM-dd").alias("qstart"),
        F.date_format(F.date_sub(F.to_date("o_orderdate"), 90), "yyyy-MM-dd").alias("minus90d"),
    )


@register(
    "q46_regexp_extract_all",
    # the COALESCE('') covers DuckDB's ARRAY_TO_STRING(empty list) ->
    # NULL (Spark's array_join(empty) is '') but must NOT fire for NULL
    # text, where Spark yields NULL too — r15 relational fuzzer, seed
    # 1521 (the hand corpus' NULL text sits at a doc_id the % 5 filter
    # drops, so four corpora never exercised it).
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
           CASE WHEN text IS NOT NULL THEN
                COALESCE(ARRAY_TO_STRING(list_sort(regexp_extract_all(text, '[0-9]+')), ','), '')
           END AS numbers_sorted,
           CAST(len(regexp_extract_all(text, '[a-z]{8,}')) AS BIGINT) AS n_longwords
    FROM documents WHERE doc_id % 5 = 0
    """,
)
def q46_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q46 (extension): regexp_extract_all — pull every match, not just the
    first (q36/F2 cover single-match extraction). Emitted as a sorted joined
    string so the hash is order- and type-stable. Narrow map-side scan."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    nums = F.regexp_extract_all("text", F.lit("[0-9]+"), 0)
    words = F.regexp_extract_all("text", F.lit("[a-z]{8,}"), 0)
    return d.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id",
        F.size(nums).cast("long").alias("n_numbers"),
        F.array_join(F.array_sort(nums), ",").alias("numbers_sorted"),
        F.size(words).cast("long").alias("n_longwords"),
    )


@register(
    "q47_try_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / NULLIF(l_quantity - l_quantity, 0) AS div_by_zero,
           TRY_CAST(l_returnflag AS INTEGER) AS bad_cast,
           COALESCE(TRY_CAST(l_linestatus AS DOUBLE), -1.0) AS bad_double
    FROM lineitem
    """,
)
def q47_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q47: the ANSI-error-safe scalar family — try_divide / try_cast yield
    NULL instead of raising under ANSI mode (the same contract the grid
    decode relies on for malformed cells). DuckDB equivalents: NULLIF'd
    division and TRY_CAST."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - F.col("l_quantity")
        ).alias("div_by_zero"),
        F.col("l_returnflag").try_cast("int").alias("bad_cast"),
        F.coalesce(F.col("l_linestatus").try_cast("double"), F.lit(-1.0)).alias(
            "bad_double"
        ),
    )


@register(
    "q48_struct_funcs",
    oracle="""
    SELECT o_orderkey,
           struct_pack(key := o_orderkey, prio := o_orderpriority).key AS k,
           struct_pack(key := o_orderkey, prio := o_orderpriority).prio AS p,
           to_json(struct_pack(key := o_orderkey, prio := o_orderpriority)) AS js
    FROM orders
    """,
)
def q48_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q48: STRUCT construction, field navigation, and JSON rendering —
    the nested-record surface (named_struct / dot access / to_json).
    Integer+string fields only: both engines render those identically in
    compact JSON, while doubles would diverge (1.0 vs 1)."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    s = F.struct(
        F.col("o_orderkey").alias("key"), F.col("o_orderpriority").alias("prio")
    )
    return o.select(
        "o_orderkey",
        s.getField("key").alias("k"),
        s.getField("prio").alias("p"),
        # ignoreNullFields=false: Spark's default DROPS null struct fields
        # from the JSON while DuckDB's to_json keeps them as "prio":null —
        # emitting nulls matches DuckDB exactly (NULL-parity net r13)
        F.to_json(s, {"ignoreNullFields": "false"}).alias("js"),
    )


@register(
    "q49_binary_funcs",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           to_base64(encode(substring(text, 1, 24))) AS b64_prefix,
           md5(text) AS digest
    FROM documents
    """,
)
def q49_binary_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q49: BINARY type surface — utf-8 encode, byte length, base64, and
    digest over bytes. Base64 is computed over a short prefix: both
    engines emit unwrapped RFC 4648 for short inputs (Spark's JVM codec
    line-wraps at 76 chars on long ones)."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return d.select(
        "doc_id",
        F.octet_length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
        F.base64(F.encode(F.substring("text", 1, 24), "UTF-8")).alias("b64_prefix"),
        F.md5(F.encode("text", "UTF-8")).alias("digest"),
    )
