"""Degenerate-corpus regression net (code-review r3c method): every probed
family must tolerate empty tables, NULL key columns, and boundary rows
without raising — Spark 4's ANSI mode turns silent arithmetic/indexing
edge cases into aborts (element_at, /0), so "no crash on weird data" is an
explicit contract here, locked by tests.

The specific bugs this method caught (single-token shingle abort,
zero-norm cosine abort, nanos-only load_events) each have their own
targeted regression tests; this suite keeps the broad net in place.
"""

from __future__ import annotations

import datetime

import pytest

from etl_bom_radiation_spark.queries import load_all

QS = load_all()

DOC_QUERIES = [
    "n01_exact_dedup",
    "n05_text_stats",
    "n06_normalization",
    "n08_quality_filter",
    "n09_lang_id",
    "n10_fingerprint",
    "n12_ngram_jaccard",
    "n13_token_count",
    "n14_decontamination",
    "n19_repetition_stats",
    "n21_vocab_topk",
    "n22_tfidf_topterms",
    "n24_length_percentile",
    "n25_context_chunking",
    "n26_chunk_dedup",
    "n27_source_mixture",
    "mm03_thumbnail",
    "mm04_audio_frames",
    "n29_boilerplate_share",
    "n30_unigram_lm_score",
    "n31_incremental_merge",
    "n32_truncation_dedup",
    "n33_split_leakage",
    "n34_sequence_packing",
    "n35_source_dup_matrix",
    # round-13 (NULL-parity net): the mm kernels' None->empty-payload guard
    "mm01_multimodal_features",
    "mm02_frame_sample",
    # round-6 doc operators
    "n36_minhash_estimate",
    "n39_substring_dup_spans",
    "n40_mixture_temperature",
    "n42_minhash_banded_lsh",
    "n44_corpus_keep_list",
    "n45_bloom_prefilter",
    "n46_source_overlap_theta",
    # round-7 doc operators
    "n47_source_pagerank",
    "n48_authority_weighted_sampling",
    # round-8 doc operators
    "n49_incremental_lsh_dedup",
]

EVENT_ORDER_QUERIES = [
    "q23_ranking",
    "q24_lag_lead",
    "q25_frames",
    "q26_range_frame",
    "x01_funnel_conversion",
    "x02_gapfill",
    "x03_cohort_retention",
    "x07_table_profile",
    "t02_tumbling_window",
    "t04_session_window",
    "t06_dedup",
    "t07_stateful_running",
    "q10b_range_join_bucketed",
    "q27_global_sort",
    "q28_topk",
    "x05_price_histogram",
    "q48_struct_funcs",
    "t09_stream_stream_join",
    "x06_scd2_intervals",
    "x04_sessionization",
    # NULL o_orderdate (weird) and a zero-row fact under UnionLoop (empty)
    "q51_recursive_cte",
    "x08_rolling_dau",
    "x09_rolling_dau_hll",
    # round-7: heavy hitters (exact + sharded Misra-Gries)
    "x10_heavy_hitters",
    "x10b_heavy_hitters_mg",
]

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EV_SCHEMA = (
    "event_id long, user_id long, event_type string, ts timestamp, "
    "value double, props string"
)
ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
    "o_orderdate timestamp, o_orderpriority string"
)


@pytest.fixture(scope="module")
def weird_dir(spark, tmp_path_factory):
    """One corpus: NULL-riddled + boundary rows for every table."""
    d = str(tmp_path_factory.mktemp("weird"))
    ts = datetime.datetime(2024, 1, 1, 10, 0)
    spark.createDataFrame(
        [
            (1, None, "en", "web", None),  # NULL text
            (2, "single", None, "web", 6),  # one token, NULL lang
            (3, "more words in this one", "en", None, 22),
        ],
        DOC_SCHEMA,
    ).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        [
            (1, 7, "view", ts, 1.0, "{}"),
            (2, None, "click", None, None, None),  # NULL user/ts/value/props
            (3, 7, None, ts + datetime.timedelta(minutes=3), 2.0, '{"k":1}'),
        ],
        EV_SCHEMA,
    ).write.parquet(f"{d}/events.parquet")
    spark.createDataFrame(
        [(1, 1, "F", None, ts, "1-URGENT"), (2, 1, "O", 100.0, None, None)],
        ORD_SCHEMA,
    ).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(0, [1.0, 2.0], "a"), (1, [0.0, 0.0], "a")],
        "vec_id long, embedding array<double>, label string",
    ).write.parquet(f"{d}/embeddings.parquet")
    return d


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty"))
    spark.createDataFrame([], DOC_SCHEMA).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame([], EV_SCHEMA).write.parquet(f"{d}/events.parquet")
    spark.createDataFrame([], ORD_SCHEMA).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label string"
    ).write.parquet(f"{d}/embeddings.parquet")
    spark.createDataFrame(
        [],
        "l_orderkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp, "
        "l_partkey long, l_suppkey long",
    ).write.parquet(f"{d}/lineitem.parquet")
    return d


def _run_all(spark, sf_dir, names):
    failures = []
    for name in names:
        try:
            QS[name].fn(spark, sf_dir).collect()
        except Exception as ex:  # noqa: BLE001 - the assertion reports them all
            failures.append(f"{name}: {type(ex).__name__}")
    assert failures == [], failures


def test_doc_queries_tolerate_weird_corpus(spark, weird_dir):
    _run_all(spark, weird_dir, DOC_QUERIES)


def test_event_order_queries_tolerate_weird_corpus(spark, weird_dir):
    _run_all(spark, weird_dir, EVENT_ORDER_QUERIES)


def test_embedding_queries_tolerate_zero_vectors(spark, weird_dir):
    _run_all(
        spark,
        weird_dir,
        [
            "n03_topk_cosine", "n04_similarity_selfjoin",
            "n23_label_centroids", "n28_embedding_quantize",
            # round-6: recall gates + semantic clustering must also degrade
            # (2-dim / zero vectors, truncation dim > vector length)
            "n37_ivf_recall", "n38_lsh_recall", "n41_matryoshka_recall",
            "n43_embedding_dedup_clusters",
            # round-13 (NULL-parity net): zero-norm/NULL-vector guards
            "n03b_topk_cosine_lsh", "n03c_topk_cosine_ivf",
            "n04b_similarity_selfjoin_lsh",
        ],
    )


def test_n28_constant_vector_all_zero_codes(spark, weird_dir):
    """The SQ8 guard: a constant vector (vmax == vmin) quantizes to all-zero
    codes with zero reconstruction error instead of dividing by zero."""
    rows = {r["vec_id"]: r for r in QS["n28_embedding_quantize"].fn(spark, weird_dir).collect()}
    const = rows[1]  # the [0.0, 0.0] vector in the weird fixture
    assert const["q8"] == "0,0" and const["mean_abs_err"] == 0.0
    assert rows[0]["q8"] == "0,255"  # [1.0, 2.0]: min->0, max->255


def test_n12_oracle_agrees_on_degenerate_docs(spark, weird_dir):
    """ADVICE r3: the n12 DuckDB oracle must mirror _shingles' degenerate-doc
    clamp — a 0/1-token (or NULL-text) doc yields ONE degenerate shingle on
    BOTH engines, so the driver hash check cannot diverge on a corpus that
    contains such docs (sf fixtures never do; this corpus does)."""
    import math

    import duckdb

    q = QS["n12_ngram_jaccard"]
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"] for r in q.fn(spark, weird_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{weird_dir}/documents.parquet/*.parquet')"
    )
    want = {(a, b): j for a, b, j in con.execute(q.oracle).fetchall()}
    assert set(got) == set(want)
    for k in want:
        if want[k] is None or (isinstance(want[k], float) and math.isnan(want[k])):
            assert got[k] is None or math.isnan(got[k]), (k, got[k], want[k])
        else:
            assert got[k] == pytest.approx(want[k]), (k, got[k], want[k])


def test_everything_tolerates_empty_tables(spark, empty_dir):
    _run_all(
        spark,
        empty_dir,
        DOC_QUERIES
        + EVENT_ORDER_QUERIES
        + [
            "n03_topk_cosine", "n23_label_centroids", "u02_pandas_udf",
            "u04_grouped_udaf", "n37_ivf_recall", "n38_lsh_recall",
            "n41_matryoshka_recall", "n43_embedding_dedup_clusters",
            # round-13: ML fit() aborts on a rowless dataset — guarded
            "n03b_topk_cosine_lsh", "n03c_topk_cosine_ivf",
            "n04b_similarity_selfjoin_lsh",
        ],
    )


def test_text_oracles_agree_on_unicode_corpus(spark, tmp_path_factory):
    """Unicode parity net: the sf fixtures are ASCII, so the driver's
    hash gate has never exercised multibyte text — but a future testdata
    regeneration could. Pin Spark==DuckDB on accents, CJK, emoji and ß
    for the text family (char-length semantics, lower(), regexp token
    splits, md5-of-UTF8 — each a place the two engines could plausibly
    diverge)."""
    import math

    import duckdb

    d = str(tmp_path_factory.mktemp("unicode"))
    rows = [
        (1, "héllo wörld héllo wörld naïve café", "fr", "src1", 34),
        (2, "日本語 テキスト 処理 日本語 テキスト", "ja", "src2", 18),
        (3, "emoji 🙂 test 🙂🙂 done", "en", "src1", 20),
        (4, "mixed ASCII and 中文 words 中文 again", "zh", "src2", 33),
        (5, "ümlaut Über straße ß test", "de", "src1", 25),
        # exact duplicate of doc 1 so the dedup paths have real work
        (6, "héllo wörld héllo wörld naïve café", "fr", "src2", 34),
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).write.parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )

    def _norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        if len(df):
            df = df.sort_values(
                by=list(df.columns), kind="mergesort", na_position="last"
            )
        return df.reset_index(drop=True)

    names = [
        "n05_text_stats", "n06_normalization", "n13_token_count",
        "n10_fingerprint", "n09_lang_id", "n21_vocab_topk",
        "n01_exact_dedup", "n45_bloom_prefilter",
        # the shingle/hash family: _tokens/_shingles/polyhash over
        # multibyte text, verified to the same bit on both engines
        "n12_ngram_jaccard", "n22_tfidf_topterms", "n29_boilerplate_share",
        "n39_substring_dup_spans", "n44_corpus_keep_list",
        "n36_minhash_estimate", "n42_minhash_banded_lsh", "n11_simhash",
        "n19_repetition_stats", "n26_chunk_dedup",
    ]
    for name in names:
        got = _norm(QS[name].fn(spark, d).toPandas())
        want = _norm(con.execute(QS[name].oracle).df())
        assert list(got.columns) == list(want.columns), name
        assert len(got) == len(want), (name, len(got), len(want))
        for c in got.columns:
            for a, b in zip(got[c].tolist(), want[c].tolist()):
                if a is None and b is None:
                    continue
                if (
                    isinstance(a, float)
                    and isinstance(b, float)
                    and math.isnan(a)
                    and math.isnan(b)
                ):
                    continue
                assert a == b, (name, c, a, b)
