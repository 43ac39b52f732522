"""NULL-parity net: Spark == DuckDB on a NULL-riddled corpus, for EVERY
oracle-bearing registry entry.

The driver fixtures contain ZERO NULLs in any column of any table
(verified r13 across sf0.001/0.01/0.1), so the exact-hash gate has never
exercised NULL semantics — exactly where the two engines silently
diverge. The r13 sweep of the full registry over
``tools/gen_weird_corpus.py`` found 20 real divergences/aborts, in four
classes, all fixed and pinned here:

* NULL ordering: Spark's ascending sort/window order is NULLS FIRST,
  DuckDB's ``default_null_order`` is nulls_last (q24, q25, t07, n24 —
  oracles now pin NULLS FIRST);
* NULL event time: Spark's ``window()``/``session_window`` emit no
  bucket for a NULL timestamp, DuckDB's ``time_bucket(NULL)`` groups it
  (t02, t04 — oracles filter), and DuckDB's sort-based ASOF JOIN matches
  a NULL probe against the greatest key instead of nothing (q12);
* representation: Spark ``to_json`` drops null struct fields (q48),
  NULL booleans round-trip as None-vs-NaN through pandas (q45),
  DuckDB's ``array_to_string([])``/``list_cosine_similarity`` NULL
  quirks (n03, n10, mm03, mm04);
* ANSI aborts on degenerate inputs the degenerate-corpus net's fixtures
  missed — empty-string docs and NULL embeddings: plain ``/`` where the
  divisor can be an empty token count (n08, n09), ``to_timestamp('')``
  via NULL-skipping concat_ws (f_grammar_bom), ``len(None)`` in mm
  kernels (mm01, mm02), VectorUDT fit/transform on NULL vectors
  (n03b, n03c), and the CombineFilters evaluation-order ANSI abort
  (n04b — see its localCheckpoint comment).

The second axis is TIES (``write_tie_corpus``): every order/measure
column drawn from a tiny value set, duplicate texts and vectors, no
NULLs — any ORDER BY ... LIMIT / row_number / lag whose ordering is not
total on BOTH sides picks engine-arbitrary rows. The r13 sweep found
ZERO tie divergences (the SURVEY §7 M2 "break ties deterministically"
discipline held); this net keeps future entries honest.

The fourth axis is DIRTY STRINGS (``write_dirty_corpus``): malformed /
non-object / wrongly-typed JSON in props, regex metacharacters, quotes,
backslashes and newlines in free text. Measured r13: Spark's
get_json_object returns NULL on malformed JSON and its raw-string
extract + ANSI cast aborts on non-integer k, while DuckDB's json
functions RAISE on malformed input and its VARCHAR->INT cast rounds
'2.9' — q41/n07 now pin both engines to from_json's strict-int reading
(TRY_CAST(props AS JSON) + json_type guard; Spark side try_cast). The
regexp/tokenizer/hash families passed unchanged.

The third axis is EMPTY (``write_empty_corpus``): zero rows, real
schemas. Measured r13 findings: Spark emits no () grand-total row for a
grouping-sets aggregate over an empty relation while DuckDB emits one
(q19/q19b/q19c oracles pin Spark's reading via HAVING COUNT(*) > 0),
Spark ML fit() aborts on a rowless dataset (n03b/n03c/n04b now guard),
a partitioned sink written from empty input has no data files so
schema inference aborts on read-back (q03b reads with an explicit
schema), and n50/d04's max(doc_id) batch split hit NULL (coalesced to
0; build/probe/fold all degrade on zero-row inputs). The d02/d03
provisioning demos instead RAISE a clear precondition error on an
empty corpus — an empty workspace-provisioning input is a
configuration error, unlike an empty incremental batch.

Entries with ``streaming=True`` (real side-effecting pipelines) are
exercised by the manual sweep (``SPARK_GRAFT_CHECK_SF=<dir>
python tools/check_queries.py``) but skipped here for CI time.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_bom_radiation_spark.queries import TABLES, load_all
from tools.check_queries import compare, duck_connection
from tools.gen_weird_corpus import (
    write_corpus,
    write_dirty_corpus,
    write_empty_corpus,
    write_fuzz_corpus,
    write_specials_corpus,
    write_tie_corpus,
)

#: the committed r16 relational fuzz seed (VERDICT r15 #5). The r16
#: generator widened the value classes the map/struct/JSON/calendar/
#: extended-agg oracles consume (fuzzed props JSON, weird-atom enums,
#: 1700-2260 calendar dates, negative/fractional quantities, extreme
#: line numbers); the first widened sweep caught a REAL mirror drift
#: invisible on all prior corpora: Spark's double->integral cast
#: TRUNCATES toward zero, DuckDB's CAST rounds to nearest (q37 oracle
#: now TRUNCs first). Deterministic: bump per round, recording in DRIFT.
#: (r15: 1515 — levenshtein codepoint-vs-byte + 5 more; r14 sweep notes
#: in DRIFT_r15.)
FUZZ_SEED = 1601

QS = load_all()

PARITY_NAMES = sorted(
    n for n, q in QS.items() if q.oracle is not None and not q.streaming
)


@pytest.fixture(scope="module")
def weird_dir(tmp_path_factory) -> str:
    return write_corpus(str(tmp_path_factory.mktemp("null_parity")))


@pytest.fixture(scope="module", params=["nulls", "ties", "empty", "dirty", "fuzz"])
def parity_dir(request, tmp_path_factory, weird_dir) -> str:
    if request.param == "nulls":
        return weird_dir
    if request.param == "fuzz":
        return write_fuzz_corpus(
            str(tmp_path_factory.mktemp("fuzz_parity")), seed=FUZZ_SEED
        )
    gen = {
        "ties": write_tie_corpus,
        "empty": write_empty_corpus,
        "dirty": write_dirty_corpus,
    }[request.param]
    return gen(str(tmp_path_factory.mktemp(f"{request.param}_parity")))


@pytest.fixture(scope="module")
def duck(parity_dir) -> duckdb.DuckDBPyConnection:
    return duck_connection(parity_dir)


def test_weird_corpus_schema_matches_testdata(weird_dir, sf_dir):
    """The net is only as good as its fixture: every weird-corpus table
    must carry the driver testdata's exact physical schema, so a future
    testdata regeneration that changes types flags here."""
    import os

    if not os.path.isdir(sf_dir):
        pytest.skip(f"driver testdata absent: {sf_dir}")
    con = duckdb.connect()
    for t in TABLES:
        want = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        ).fetchall()
        got = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{weird_dir}/{t}.parquet')"
        ).fetchall()
        assert [(r[0], r[1]) for r in got] == [(r[0], r[1]) for r in want], t


def test_every_table_carries_nulls(weird_dir):
    """Fixture liveness: the corpus must actually exercise NULLs in every
    table (all non-key columns carry at least one), or the net degrades
    to a second copy of the ordinary oracle check without noticing."""
    con = duckdb.connect()
    out = weird_dir
    keys = {
        "r_regionkey", "n_nationkey", "c_custkey", "s_suppkey", "p_partkey",
        "o_orderkey", "l_linenumber", "event_id", "doc_id", "vec_id",
        "l_orderkey",  # nullable by design but key-ish; not required
    }
    for t in TABLES:
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{out}/{t}.parquet')"
            ).fetchall()
        ]
        missing = [
            c
            for c in cols
            if c not in keys
            and con.execute(
                f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet') "
                f"WHERE {c} IS NULL"
            ).fetchone()[0]
            == 0
        ]
        assert missing == [], f"{t}: columns with no NULL row: {missing}"


def test_tie_corpus_actually_ties(tmp_path_factory):
    """Tie-net liveness: the order/measure columns must carry heavy
    duplication or the ties axis silently degrades to a plain re-check."""
    out = write_tie_corpus(str(tmp_path_factory.mktemp("tie_liveness")))
    con = duckdb.connect()
    for table, col, max_distinct in [
        ("orders", "o_totalprice", 2),
        ("orders", "o_orderdate", 3),
        ("lineitem", "l_extendedprice", 2),
        ("events", "ts", 4),
        ("events", "value", 2),
        ("documents", "n_chars", 4),
        ("embeddings", "embedding", 5),
    ]:
        n, d = con.execute(
            f"SELECT count(*), count(DISTINCT {col}) "
            f"FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()
        assert d <= max_distinct < n, (table, col, n, d)


@pytest.mark.parity
@pytest.mark.parametrize("name", PARITY_NAMES)
def test_oracle_parity_on_adversarial_corpus(spark, parity_dir, duck, name):
    q = QS[name]
    got = q.fn(spark, parity_dir).toPandas()
    want = duck.execute(q.oracle).df()
    problems = compare(name, got, want)
    assert problems == [], problems


@pytest.mark.parity
def test_engine_never_aborts_on_nan_inf(spark, tmp_path_factory):
    """Specials axis: NaN/±Infinity in every double column. Exact oracle
    parity is OUT of contract here (DuckDB itself cannot CAST non-finite
    doubles to integers, and its STDDEV raises on Infinity) — the
    engine-side contract is NO ABORT: ANSI CAST_OVERFLOW on
    double->integral narrowings (q37, n28, the ivf/lsh BIGINT quantizers)
    and Spark ML's NaN-vector rejection (n03c) were the measured r13
    hazards, each now degrading (NULL codes / filtered unsearchable
    vectors) instead of killing the query."""
    d = write_specials_corpus(str(tmp_path_factory.mktemp("specials")))
    failures = []
    for name, q in QS.items():
        if q.streaming:
            continue
        try:
            q.fn(spark, d).collect()
        except Exception as ex:  # noqa: BLE001 - report them all
            failures.append(f"{name}: {type(ex).__name__}")
    assert failures == [], failures


def test_n03_degenerate_query_vector_empties_both_engines(spark, tmp_path):
    """code-review r13: the fixtures' vec_id 0 is always healthy, so the
    parity net never exercised a NULL or zero-norm QUERY vector — where
    Spark's sim-NULL filter empties the result but DuckDB (without the
    oracle's scalar guards) would keep NULL / -1.0 sims."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    q = QS["n03_topk_cosine"]
    for case, vec0 in (("null", None), ("zero", [0.0, 0.0, 0.0])):
        d = str(tmp_path / case)
        import os

        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([0, 1, 2], pa.int64()),
                    "embedding": pa.array(
                        [vec0, [1.0, 0.0, 0.0], [0.5, 0.5, 0.0]],
                        pa.list_(pa.float32()),
                    ),
                    "label": pa.array([0, 1, 0], pa.int32()),
                }
            ),
            f"{d}/embeddings.parquet",
        )
        got = q.fn(spark, d).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet')"
        )
        want = con.execute(q.oracle).df()
        assert len(got) == 0 and len(want) == 0, (case, len(got), len(want))


def test_q51_spine_survives_century_span(spark, tmp_path):
    """Timestamp-edge finding (r13): a 1900..2262 orders span is 363
    recursion levels, over Spark's default 100-level ceiling — q51 now
    declares MAX RECURSION LEVEL 1000 (Spark side only; DuckDB needs no
    clause). Beyond the no-abort bar, the dense spine and the oracle
    must still agree on the wide span."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_custkey": pa.array([1, 1], pa.int64()),
                "o_orderstatus": pa.array(["O", "F"], pa.string()),
                "o_totalprice": pa.array([100.25, 200.5], pa.float64()),
                "o_orderdate": pa.array(
                    [datetime.datetime(1900, 6, 15), datetime.datetime(2262, 1, 2)],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(["1-URGENT", "5-LOW"], pa.string()),
            }
        ),
        f"{d}/orders.parquet",
    )
    q = QS["q51_recursive_cte"]
    got = q.fn(spark, d).toPandas()
    assert len(got) == (2262 - 1900 + 1) * 12
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')"
    )
    want = con.execute(q.oracle).df()
    assert compare("q51", got, want) == []


def test_crash_only_entries_tolerate_nulls(spark, weird_dir):
    """The oracle-less (rows-only) batch entries must at least run on the
    NULL-riddled corpus — the r13 sweep caught n03b/n03c/n04b aborting on
    NULL embeddings here."""
    failures = []
    for name, q in QS.items():
        if q.oracle is not None or q.streaming:
            continue
        try:
            q.fn(spark, weird_dir).collect()
        except Exception as ex:  # noqa: BLE001 - report them all
            failures.append(f"{name}: {type(ex).__name__}")
    assert failures == [], failures
