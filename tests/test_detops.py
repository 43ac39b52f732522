"""Invariant tests for the deterministic training-data operators
(n15-n18) and the gap-fill resample (x02) — properties the DuckDB value
hash alone doesn't spell out: partition-totality, quota bounds, and
run-to-run determinism (the whole point of hash-keyed ops over rand())."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_bom_radiation_spark.queries import load_all

QS = load_all()


def _run(spark, sf_dir, name):
    return QS[name].fn(spark, sf_dir)


def test_det_shuffle_covers_every_doc_once(spark, oracle_sf_dir):
    out = _run(spark, oracle_sf_dir, "n15_det_shuffle")
    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    lo, hi = out.agg(F.min("shard_id"), F.max("shard_id")).first()
    assert 0 <= lo and hi < 64


def test_det_shuffle_is_deterministic_across_runs(spark, oracle_sf_dir):
    a = _run(spark, oracle_sf_dir, "n15_det_shuffle").orderBy("doc_id").collect()
    b = _run(spark, oracle_sf_dir, "n15_det_shuffle").orderBy("doc_id").collect()
    assert a == b


def test_train_test_split_partitions_corpus(spark, oracle_sf_dir):
    out = {r["split"]: r for r in _run(spark, oracle_sf_dir, "n16_train_test_split").collect()}
    total = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet").count()
    assert set(out) <= {"train", "test"}
    assert sum(r["docs"] for r in out.values()) == total  # no doc lost or doubled
    # ~12.5% expected; allow wide tolerance at small sf
    if total >= 200:
        frac = out["test"]["docs"] / total
        assert 0.05 < frac < 0.25


def test_stratified_sample_respects_quota(spark, oracle_sf_dir):
    out = _run(spark, oracle_sf_dir, "n17_stratified_sample")
    per = out.groupBy("lang").count().collect()
    assert all(r["count"] <= 25 for r in per)
    # strata with >= 25 docs must hit the quota exactly
    avail = (
        spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
        .groupBy("lang")
        .count()
        .collect()
    )
    avail = {r["lang"]: r["count"] for r in avail}
    for r in per:
        assert r["count"] == min(25, avail[r["lang"]])


def test_redaction_masks_digit_runs(spark, oracle_sf_dir):
    out = _run(spark, oracle_sf_dir, "n18_pii_redaction")
    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    assert out.count() == docs.count()
    # any doc containing a 3+ digit run must report numbers > 0
    flagged = (
        docs.filter(F.col("text").rlike("[0-9][0-9][0-9]"))
        .join(out, "doc_id")
        .filter(F.col("numbers") == 0)
        .count()
    )
    assert flagged == 0


def test_gapfill_calendar_is_dense_and_count_preserving(spark, oracle_sf_dir):
    out = _run(spark, oracle_sf_dir, "x02_gapfill")
    orders = spark.read.parquet(f"{oracle_sf_dir}/orders.parquet")
    prios = orders.select("o_orderpriority").distinct().count()
    lo, hi = orders.agg(
        F.min(F.to_date("o_orderdate")), F.max(F.to_date("o_orderdate"))
    ).first()
    days = (hi - lo).days + 1
    assert out.count() == days * prios  # every (day, prio) cell exists
    assert (
        out.agg(F.sum("orders_n")).first()[0] == orders.count()
    )  # zero-fill adds cells, never counts


def test_recursive_spine_conserves_revenue(spark, oracle_sf_dir):
    """q51's data-derived year ladder must cover EVERY order: the series'
    SUM(revenue) equals SUM(o_totalprice) and SUM(n_orders) equals the
    table row count, whatever date span the driver generated (ADVICE r6:
    the old hardcoded 1992-1998 ladder silently dropped ~40% of revenue
    while the shared-constant oracle stayed green).  Also pins density:
    the spine has no month gaps between its min and max."""
    rows = _run(spark, oracle_sf_dir, "q51_recursive_cte").collect()
    orders = spark.read.parquet(f"{oracle_sf_dir}/orders.parquet")
    want_rev, want_n = orders.agg(
        F.round(F.sum("o_totalprice"), 2), F.count("*")
    ).first()
    assert abs(sum(r["revenue"] for r in rows) - want_rev) < 0.05
    assert sum(r["n_orders"] for r in rows) == want_n
    months = sorted(r["month"] for r in rows)
    y0, m0 = map(int, months[0].split("-"))
    y1, m1 = map(int, months[-1].split("-"))
    assert len(rows) == (y1 - y0) * 12 + (m1 - m0) + 1 == len(set(months))


def test_truncation_dedup_known_corpus(spark, tmp_path):
    """n32 semantics on a constructed corpus: exact prefix → contained;
    same-length tie → larger doc_id contained by min; shared first-8 but
    diverging later → NOT contained; under-8-token docs out of contract."""
    base = "w0 w1 w2 w3 w4 w5 w6 w7"  # exactly 8 tokens
    rows = [
        (1, base + " w8 w9", "en", "a", 0),        # container (10 tokens)
        (2, base, "en", "a", 0),                   # prefix of 1 -> contained
        (3, base + " w8 w9", "en", "a", 0),        # identical to 1 -> tie, contained by 1
        (4, base + " zz w9", "en", "a", 0),        # shares first 8, diverges at 9
        (5, "w0 w1 w2", "en", "a", 0),             # < 8 tokens: out of contract
    ]
    d = str(tmp_path / "fix")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    from etl_bom_radiation_spark.queries import load_all

    got = {
        r.doc_id: (r.n_containers, r.min_container)
        for r in load_all()["n32_truncation_dedup"].fn(spark, d).collect()
    }
    # doc 2 is a prefix of docs 1, 3 and 4 (all share its full 8-token span)
    assert got[2] == (3, 1)
    # doc 3 ties with doc 1 -> contained by the min doc_id only
    assert got[3] == (1, 1)
    # docs 1, 4, 5 are not contained by anything
    assert set(got) == {2, 3}


def test_sequence_packing_invariants_per_shard(spark, sf_dir):
    """n34 manifest invariants against an independent Python fold: per
    shard, pack ids are exactly the offsets' floor-div classes, token
    totals are conserved, and every pack's doc count is positive."""
    import hashlib

    from etl_bom_radiation_spark.queries import load_all
    from etl_bom_radiation_spark.queries.packing import BUDGET, SHARDS

    rows = load_all()["n34_sequence_packing"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()

    # independent model: same key, same shard arithmetic, same fold
    per_shard = {}
    for r in docs:
        k = hashlib.md5(f"epoch7-{r.doc_id}".encode()).hexdigest()
        shard = (ord(k[0]) * 256 + ord(k[1])) % SHARDS
        n = len([t for t in (r.text or "").strip().lower().split() if t])
        per_shard.setdefault(shard, []).append((k, r.doc_id, n))
    want = {}
    for shard, items in per_shard.items():
        off = 0
        for k, doc_id, n in sorted(items):
            pack = off // BUDGET
            w = want.setdefault((shard, pack), [0, 0])
            w[0] += 1
            w[1] += n
            off += n
    got = {(r.shard_id, r.pack_id): [r.n_docs, r.n_tokens] for r in rows}
    assert got == want
    assert all(nd > 0 for nd, _ in got.values())


def test_incremental_merge_known_corpus(spark, tmp_path):
    """n31 semantics on a constructed corpus: even ids = existing corpus,
    odd ids = incoming; planted in-batch dup and already-in-corpus dup
    must both be rejected, novel content admitted with min-id survivor."""
    rows = [
        (2, "alpha", "en", "a", 0),   # existing
        (4, "beta", "en", "a", 0),    # existing
        (1, "alpha", "en", "a", 0),   # incoming, already in corpus -> rejected
        (3, "gamma", "en", "a", 0),   # incoming, novel -> admitted
        (5, "gamma", "en", "a", 0),   # incoming, in-batch dup of 3 -> rejected
        (7, "delta", "en", "a", 0),   # incoming, novel -> admitted
    ]
    d = str(tmp_path / "fix")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    from etl_bom_radiation_spark.queries import load_all

    got = sorted(
        r.doc_id for r in load_all()["n31_incremental_merge"].fn(spark, d).collect()
    )
    assert got == [3, 7]


def test_split_leakage_known_corpus(spark, tmp_path):
    """n33 semantics on a constructed corpus: a test doc sharing half its
    trigrams with a train doc scores leak_frac 0.5; a fully-novel test doc
    scores 0. Split membership is derived with the same hash rule the
    query uses, so the fixture plants docs on known sides."""
    import hashlib

    def split_of(i):
        return "test" if hashlib.md5(f"split42-{i}".encode()).hexdigest()[0] in "01" else "train"

    test_ids = [i for i in range(1, 200) if split_of(i) == "test"]
    train_ids = [i for i in range(1, 200) if split_of(i) == "train"]
    # leaky test doc: trigrams {a b c, b c d} — "a b c" also in a train doc
    # novel test doc: trigrams {p q r, q r s}
    rows = [
        (test_ids[0], "a b c d", "en", "a", 0),
        (test_ids[1], "p q r s", "en", "a", 0),
        (train_ids[0], "a b c", "en", "a", 0),
        (train_ids[1], "x y z", "en", "a", 0),
    ]
    d = str(tmp_path / "fix")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    from etl_bom_radiation_spark.queries import load_all

    got = {
        r.doc_id: (r.n_shingles, r.n_leaked, r.leak_frac)
        for r in load_all()["n33_split_leakage"].fn(spark, d).collect()
    }
    assert got[test_ids[0]] == (2, 1, 0.5)
    assert got[test_ids[1]] == (2, 0, 0.0)


def test_unigram_lm_score_hand_computed(spark, tmp_path):
    """n30 numerics on a corpus small enough to fold by hand: vocabulary
    counts, integer micro-bit quantization, OOV floor and the final
    micro-bits-per-token rounding all verified against an independent
    Python computation."""
    import math

    rows = [
        (1, "a a b", "en", "x", 0),
        (2, "a c", "en", "x", 0),
    ]
    d = str(tmp_path / "fix")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    from etl_bom_radiation_spark.queries import load_all

    got = {
        r.doc_id: (r.n_tokens, r.oov_tokens, r.micro_bits_per_token)
        for r in load_all()["n30_unigram_lm_score"].fn(spark, d).collect()
    }
    # corpus: a=3, b=1, c=1, total=5; V=1024 so nothing is OOV
    ib = {t: round(math.log2(5 / c) * 10000) for t, c in {"a": 3, "b": 1, "c": 1}.items()}
    want = {}
    for doc_id, toks in ((1, ["a", "a", "b"]), (2, ["a", "c"])):
        s = sum(ib[t] for t in toks)
        want[doc_id] = (len(toks), 0, round(s * 100.0 / len(toks)))
    assert got == want


def test_tokenizer_tri_engine_parity(spark):
    """The mm kernels' Python tokenizer must match the engine's Spark-side
    ``_tokens`` EXACTLY — that is the product parity contract (ADVICE r4
    found a str.strip() Unicode gap here). Asserted over an adversarial
    corpus: ASCII edges, NBSP/em-space (edge and interior), the
    C0 separators \\x1c-\\x1f that Python's str.strip eats, vertical tab,
    CRLF, case folding, dotted capital I, final sigma.

    The DuckDB oracle tokenizer agrees on everything ASCII (asserted) but
    is KNOWN to diverge off-ASCII — its trim strips Unicode-space edges,
    RE2's \\s excludes \\x0b, and lower('İ') differs — which is an oracle
    harness limitation, not an engine bug: the parity gate runs on the
    ASCII documents fixture, where all three engines agree."""
    import duckdb
    import pandas as pd

    from etl_bom_radiation_spark.queries.llm_queries import _tokens
    from etl_bom_radiation_spark.queries.mm_ext import _py_tokens

    ascii_cases = [
        "", "   ", "hello world", "  hello  world  ", "MIXED Case TeXT",
        "tab\tsep", "nl\nsep", "cr\rsep", "crlf\r\nsep",
        "\ta\r\nb\x0c c", "one", " x ", "a  b   c",
    ]
    unicode_cases = [
        " hello world ", "a b",
        " em space ", "\x1c\x1dx\x1e\x1f",
        "vt\x0btail", "café RÉSUMÉ Größe",
        "ẞharp ß", "İstanbul I ı",
        "ΣΙΓΜΑ σς",
        "zero\u200bwidth", "ideo\u3000space",
    ]
    cases = ascii_cases + unicode_cases
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "i int, text string"
    )
    spark_toks = {
        r["i"]: r["t"]
        for r in df.select("i", _tokens(F.col("text")).alias("t")).collect()
    }
    # engine-internal parity: Python kernel == Spark, on EVERY case
    for i, s in enumerate(cases):
        assert _py_tokens(s) == spark_toks[i], (i, s)
    # oracle parity holds on the ASCII range the fixtures live in
    con = duckdb.connect()
    con.register(
        "tdf",
        pd.DataFrame(
            {"i": range(len(ascii_cases)), "text": ascii_cases}
        ),
    )
    duck = {
        r[0]: list(r[1])
        for r in con.execute(
            "SELECT i, list_filter(string_split_regex(lower(trim(text)),"
            " '\\s+'), t -> length(t) > 0) FROM tdf"
        ).fetchall()
    }
    for i, s in enumerate(ascii_cases):
        assert duck[i] == _py_tokens(s), (i, s)


def test_substring_dup_spans_known_corpus(spark, tmp_path):
    """n39 semantics on a constructed corpus: a shared 8-token span is one
    duplicated window per doc embedding it; an exact-8-token doc equal to
    the span is 100% duplicated; a doc repeating its OWN phrase twice has
    zero duplicated windows (cross-doc gate); short docs out of contract."""
    span = " ".join(f"s{i}" for i in range(8))
    selfrep = " ".join(f"c{i}" for i in range(8))
    rows = [
        (1, "a1 a2 a3 a4 " + span + " a5 a6", "en", "a", 0),   # 14 tok, 7 win
        (2, "b1 b2 " + span + " b3 b4 b5 b6", "en", "a", 0),   # 14 tok, 7 win
        (3, " ".join(f"z{i}" for i in range(12)), "en", "a", 0),  # unique
        (4, span, "en", "a", 0),                                # == span
        (5, selfrep + " " + selfrep, "en", "a", 0),             # self-repeat
        (6, "t0 t1 t2", "en", "a", 0),                          # < 8 tokens
    ]
    d = str(tmp_path / "fix39")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    from etl_bom_radiation_spark.queries import load_all

    got = {
        r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_fraction)
        for r in load_all()["n39_substring_dup_spans"].fn(spark, d).collect()
    }
    assert got[1] == (7, 1, round(1 / 7, 6))
    assert got[2] == (7, 1, round(1 / 7, 6))
    assert got[3] == (5, 0, 0.0)
    assert got[4] == (1, 1, 1.0)
    # 16 tokens -> 9 windows; positions 1 and 9 repeat the phrase but only
    # within doc 5 itself -> NOT duplicated
    assert got[5] == (9, 0, 0.0)
    assert 6 not in got  # under L tokens: out of contract


def test_mixture_temperature_matches_python_fold(spark, tmp_path):
    """n40 semantics vs an independent Python model: the exact integer
    keep-inequality reproduces per-source kept counts, and a rare source
    whose tempered rate exceeds 1 keeps everything (the cap)."""
    import hashlib
    import math

    rows = [(i, f"doc {i}", "en", "big", 0) for i in range(400)]
    rows.append((400, "doc 400", "en", "rare", 0))
    d = str(tmp_path / "fix40")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    from etl_bom_radiation_spark.queries import load_all

    got = {
        r.source: (r.n_docs, r.s_mass, r.n_kept)
        for r in load_all()["n40_mixture_temperature"].fn(spark, d).collect()
    }
    # independent model
    counts = {"big": 400, "rare": 1}
    s = {k: round(math.sqrt(v)) for k, v in counts.items()}   # 20, 1
    S, T = sum(s.values()), sum(counts.values())              # 21, 401
    kept = {k: 0 for k in counts}
    src_of = lambda i: "big" if i < 400 else "rare"
    for i in range(401):
        u24 = int(hashlib.md5(f"temper7-{i}".encode()).hexdigest()[:6], 16)
        k = src_of(i)
        if 2 * u24 * S * counts[k] < (1 << 24) * T * s[k]:
            kept[k] += 1
    assert got["big"] == (400, 20, kept["big"])
    # rare source: rate = 401*1/(2*21*1) > 1 -> unconditional keep
    assert kept["rare"] == 1
    assert got["rare"] == (1, 1, 1)
    # the draw is a pure function of doc_id: a second run is identical
    again = {
        r.source: r.n_kept
        for r in load_all()["n40_mixture_temperature"].fn(spark, d).collect()
    }
    assert again == {k: v[2] for k, v in got.items()}


def test_banded_lsh_known_corpus(spark, tmp_path):
    """n42 semantics on a constructed corpus: identical docs collide in all
    8 bands and verify at J=1; an unrelated doc pairs with nothing; every
    candidate pair is ordered and its flag matches its verified Jaccard."""
    text_a = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, text_a, "en", "a", 0),
        (2, text_a, "en", "a", 0),                    # exact dup of 1
        (3, "completely different words here nothing shared with others at all", "en", "a", 0),
    ]
    d = str(tmp_path / "fix42")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    from etl_bom_radiation_spark.queries import load_all

    out = load_all()["n42_minhash_banded_lsh"].fn(spark, d).collect()
    got = {(r.doc_a, r.doc_b): r for r in out}
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r.n_bands_hit == 8 and r.jaccard == 1.0 and r.is_near_dup == 1
    for (da, db), row in got.items():
        assert da < db
        assert 1 <= row.n_bands_hit <= 8
        assert row.is_near_dup == (1 if row.jaccard >= 0.35 else 0)
        assert 3 not in (da, db)  # nothing shared -> no bucket collision


def test_embedding_dedup_clusters_transitive_bridge(spark, tmp_path):
    """n43 semantics on constructed vectors: a bridge vector merges two
    pairs into one transitive cluster even though the endpoints are below
    the threshold themselves; an opposite-direction vector stays a
    canonical singleton."""
    import math

    def vec(deg):
        r = math.radians(deg)
        return [float(math.cos(r)), float(math.sin(r))] + [0.0] * 6

    rows = [
        (1, vec(0), 0),     # -- edge to 2 (cos 35deg = .819)
        (2, vec(35), 0),    # bridge: edges to 1 and 4
        (3, vec(160), 0),   # cos negative vs all -> singleton
        (4, vec(70), 0),    # cos(0,70)=.342 < .35: NO direct edge to 1
    ]
    d = str(tmp_path / "fix43")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")
    from etl_bom_radiation_spark.queries import load_all

    got = {
        r.vec_id: (r.cluster, r.is_canonical)
        for r in load_all()["n43_embedding_dedup_clusters"].fn(spark, d).collect()
    }
    assert got == {
        1: (1, True),
        2: (1, False),
        4: (1, False),  # transitively clustered through the bridge
        3: (3, True),
    }


def test_corpus_keep_list_reasons_and_precedence(spark, tmp_path):
    """n44 semantics on a constructed corpus: each drop reason fires on its
    own case, an identical copy reports exact_dup (precedence over the
    same-length truncation tie), and short/unique docs keep."""
    base = " ".join(f"a{i}" for i in range(12))           # doc 1: keeper
    span = " ".join(f"x{i}" for i in range(8))            # shared 8-token span
    rows = [
        (1, base, "en", "s", 0),
        (2, base, "en", "s", 0),                          # identical -> exact_dup
        (3, " ".join(base.split()[:10]), "en", "s", 0),   # prefix -> truncation
        (4, span + " t4", "en", "s", 0),                  # 2 windows, 1 dup -> substring_dup
        (5, "z1 z2 " + span, "en", "s", 0),               # 3 windows, 1 dup -> keep
        (6, " ".join(f"u{i}" for i in range(9)), "en", "s", 0),  # unique -> keep
        (7, "w0 w1 w2", "en", "s", 0),                    # short: out of contract -> keep
    ]
    d = str(tmp_path / "fix44")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    from etl_bom_radiation_spark.queries import load_all

    got = {
        r.doc_id: (r.keep, r.reason)
        for r in load_all()["n44_corpus_keep_list"].fn(spark, d).collect()
    }
    assert got == {
        1: (1, None),
        2: (0, "exact_dup"),
        3: (0, "truncation"),
        4: (0, "substring_dup"),
        5: (1, None),
        6: (1, None),
        7: (1, None),
    }


def test_sessionization_gap_semantics(spark, tmp_path):
    """x04 on a constructed timeline: a >30-min gap opens a new session,
    an exactly-30-min gap does NOT (strict inequality), users are
    independent."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(mins):
        return t0 + datetime.timedelta(minutes=mins)

    rows = [
        (1, ts(0), 7, "a", 1.0, "{}"),
        (2, ts(10), 7, "a", 2.0, "{}"),
        (3, ts(41), 7, "a", 4.0, "{}"),  # 31 min after #2 -> new session
        (4, ts(71), 7, "a", 8.0, "{}"),  # exactly 30 min after #3 -> same
        (5, ts(0), 8, "b", 1.0, "{}"),
    ]
    d = str(tmp_path / "fix")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.sum_value, r.end_us - r.start_us)
        for r in load_all()["x04_sessionization"].fn(spark, d).collect()
    }
    assert got == {
        (7, 1): (2, 3.0, 10 * 60 * 1_000_000),
        (7, 2): (2, 12.0, 30 * 60 * 1_000_000),
        (8, 1): (1, 1.0, 0),
    }


def test_sessionization_batch_matches_native_session_window(spark, sf_dir):
    """x04 (lag + running-sum windows) and t04 (native F.session_window)
    define the SAME sessions — including the exactly-30-min gap, which
    both keep in-session (native probed directly: two events 30 min
    apart -> one session window). Per-user (session count, event-count
    multiset) must agree on the real events fixture."""
    from collections import Counter

    x = load_all()["x04_sessionization"].fn(spark, sf_dir).collect()
    t = load_all()["t04_session_window"].fn(spark, sf_dir).collect()
    assert Counter((r.user_id, r.n_events) for r in x) == Counter(
        (r.user_id, r.n_events) for r in t
    )


def test_source_pagerank_matches_python_fold(spark, tmp_path):
    """n47 semantics vs an independent Python model of the integer
    iteration on a hand-built graph: A-B share two prefix fingerprints,
    B-C share one, D is isolated. Floor-division micro-unit arithmetic
    must reproduce the model's BIGINTs exactly; the isolated source sits
    at the teleport floor (150000) at every iteration."""
    fp = lambda k: " ".join(f"{k}t{i}" for i in range(8))
    rows = [
        (0, fp("x") + " tailA0", "en", "srcA", 0),
        (1, fp("y") + " tailA1", "en", "srcA", 0),
        (2, fp("x") + " tailB0", "en", "srcB", 0),
        (3, fp("y") + " tailB1", "en", "srcB", 0),
        (4, fp("z") + " tailB2", "en", "srcB", 0),
        (5, fp("z") + " tailC0", "en", "srcC", 0),
        (6, fp("w") + " tailD0", "en", "srcD", 0),
    ]
    d = str(tmp_path / "fix47")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")

    got = {
        r.source: (r.wsum, r.rank_micro)
        for r in load_all()["n47_source_pagerank"].fn(spark, d).collect()
    }

    # independent model: symmetric weighted edges + the exact formula
    edges = [("srcA", "srcB", 2), ("srcB", "srcA", 2),
             ("srcB", "srcC", 1), ("srcC", "srcB", 1)]
    wsum = {"srcA": 2, "srcB": 3, "srcC": 1, "srcD": 0}
    r = {s: 1_000_000 for s in wsum}
    for _ in range(8):
        contrib = {s: 0 for s in wsum}
        for u, v, w in edges:
            contrib[v] += (r[u] * w) // max(wsum[u], 1)
        r = {s: 150_000 + (85 * contrib[s]) // 100 for s in wsum}
        assert r["srcD"] == 150_000  # isolated: teleport floor, every step
    assert got == {s: (wsum[s], r[s]) for s in wsum}


def test_authority_sampling_matches_python_fold(spark, tmp_path):
    """n48 semantics vs an independent Python model on the same
    hand-built graph as the n47 parity test: rank-proportional integer
    budgets and the exact u24 draw must reproduce per-source kept
    counts; the whole chain (8 PageRank iterations -> allocation ->
    draw) is pure BIGINT arithmetic."""
    import hashlib

    fp = lambda k: " ".join(f"{k}t{i}" for i in range(8))
    rows = [
        (0, fp("x") + " tailA0", "en", "srcA", 0),
        (1, fp("y") + " tailA1", "en", "srcA", 0),
        (2, fp("x") + " tailB0", "en", "srcB", 0),
        (3, fp("y") + " tailB1", "en", "srcB", 0),
        (4, fp("z") + " tailB2", "en", "srcB", 0),
        (5, fp("z") + " tailC0", "en", "srcC", 0),
        (6, fp("w") + " tailD0", "en", "srcD", 0),
    ]
    d = str(tmp_path / "fix48")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")

    got = {
        r.source: (r.n_docs, r.rank_micro, r.alloc_docs, r.n_kept)
        for r in load_all()["n48_authority_weighted_sampling"].fn(spark, d).collect()
    }

    # rank model (same as the n47 test)
    edges = [("srcA", "srcB", 2), ("srcB", "srcA", 2),
             ("srcB", "srcC", 1), ("srcC", "srcB", 1)]
    wsum = {"srcA": 2, "srcB": 3, "srcC": 1, "srcD": 0}
    r = {s: 1_000_000 for s in wsum}
    for _ in range(8):
        contrib = {s: 0 for s in wsum}
        for u, v, w in edges:
            contrib[v] += (r[u] * w) // max(wsum[u], 1)
        r = {s: 150_000 + (85 * contrib[s]) // 100 for s in wsum}
    # sampling model
    n_docs = {"srcA": 2, "srcB": 3, "srcC": 1, "srcD": 1}
    src_of = dict(enumerate(["srcA", "srcA", "srcB", "srcB", "srcB", "srcC", "srcD"]))
    r_total, budget = sum(r.values()), sum(n_docs.values()) // 2
    alloc = {s: (budget * r[s]) // r_total for s in r}
    kept = {s: 0 for s in r}
    for i in range(7):
        u24 = int(hashlib.md5(f"auth8-{i}".encode()).hexdigest()[:6], 16)
        s = src_of[i]
        if u24 * n_docs[s] < (1 << 24) * alloc[s]:
            kept[s] += 1
    assert got == {s: (n_docs[s], r[s], alloc[s], kept[s]) for s in r}


def test_null_doc_id_draws_count_as_zero(spark, tmp_path):
    """n40/n48 NULL-doc_id parity (code-review r7 + ADVICE r7): a NULL
    doc_id hashes to u24=NULL, and a source whose EVERY doc_id is NULL
    must report n_kept = 0 (the CASE...ELSE 0), not NULL — on BOTH
    engines.  The oracle side is the load-bearing half: DuckDB's
    ``concat()`` SKIPS NULL arguments, so the original
    ``concat('0x', substr(md5(NULL...)))`` evaluated to the literal
    '0x' and CRASHED the cast ("Could not convert string 0x to
    INT64") instead of propagating NULL; the oracles now use the
    NULL-propagating ``||`` operator, and this test runs them in DuckDB
    over the NULL fixture to prove u24=NULL -> kept=0 really holds
    engine-side, not just in Spark."""
    rows = [(None, "all null ids here", "en", "ghost", 0),
            (None, "another null id", "en", "ghost", 0)] + [
        (i, f"doc number {i} with text", "en", "web", 0) for i in range(10)
    ]
    d = str(tmp_path / "fixnull")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")

    reg = load_all()
    n40 = {r.source: r.n_kept
           for r in reg["n40_mixture_temperature"].fn(spark, d).collect()}
    assert n40["ghost"] == 0 and n40["ghost"] is not None
    n48 = {r.source: r.n_kept
           for r in reg["n48_authority_weighted_sampling"].fn(spark, d).collect()}
    assert n48["ghost"] == 0 and n48["ghost"] is not None

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    for name, spark_kept in (("n40_mixture_temperature", n40),
                             ("n48_authority_weighted_sampling", n48)):
        odf = con.execute(reg[name].oracle).fetch_df()
        o_kept = dict(zip(odf["source"], odf["n_kept"]))
        assert int(o_kept["ghost"]) == 0
        assert {k: int(v) for k, v in o_kept.items()} == spark_kept


def test_incremental_lsh_known_corpus(spark, tmp_path):
    """n49 semantics on a constructed corpus (incoming shard = doc_id %
    10 == 7): an incoming exact dup of an INDEXED doc is drop_index_dup;
    when a doc is both an index dup and a shard dup, index wins; a pair
    of incoming-only dups keeps the EARLIER id and drops the later one
    (min-id survivor); a unique incoming doc keeps with no best_jaccard."""
    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "entirely separate sentence about rivers mountains and quiet valleys tonight"
    rows = [
        (1, text_a, "en", "a", 0),   # INDEXED original of text_a
        (7, text_a, "en", "a", 0),   # incoming: dup of indexed 1
        (17, text_a, "en", "a", 0),  # incoming: dup of 1 AND of 7
        (27, text_b, "en", "a", 0),  # incoming: earlier of the shard-only pair
        (37, text_b, "en", "a", 0),  # incoming: later -> shard dup of 27
        (47, "unique closing words nobody else uses anywhere in this tiny corpus", "en", "a", 0),
    ]
    d = str(tmp_path / "fix49")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    from etl_bom_radiation_spark.queries import load_all

    out = {r.doc_id: r for r in load_all()["n49_incremental_lsh_dedup"].fn(spark, d).collect()}
    assert set(out) == {7, 17, 27, 37, 47}  # exactly the incoming shard
    assert out[7].decision == "drop_index_dup"
    assert out[7].n_index_cand >= 1 and out[7].best_jaccard == 1.0
    # 17 collides with indexed 1 AND with shard-mate 7: index wins
    assert out[17].decision == "drop_index_dup"
    assert out[17].n_shard_cand >= 1
    # shard-only pair: min-id survivor
    assert out[27].decision == "keep"
    assert out[37].decision == "drop_shard_dup" and out[37].best_jaccard == 1.0
    assert out[47].decision == "keep"
    assert out[47].n_index_cand == 0 and out[47].n_shard_cand == 0
    assert out[47].best_jaccard is None


def test_incremental_lsh_negative_doc_id_parity(spark, tmp_path):
    """n49 shard-split parity on NEGATIVE doc_ids (code-review r8): the
    Spark side must use `%` (sign-of-dividend, DuckDB's semantics), not
    pmod — pmod(-3, 10) == 7 would route negative ids into the shard on
    Spark while the oracle keeps them on the index side, a row-set
    divergence under the driver's hash gate. Full Spark-vs-DuckDB
    comparison on a corpus where the two moduli disagree."""
    import duckdb

    text_a = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (-3, text_a, "en", "a", 0),   # pmod(-3,10)=7 but -3%10=-3: INDEX side
        (-13, text_a, "en", "a", 0),  # same trap
        (7, text_a, "en", "a", 0),    # genuinely incoming: dup of the -3/-13
        (17, "nothing in common with that other sentence here", "en", "a", 0),
    ]
    d = str(tmp_path / "fixneg")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    from etl_bom_radiation_spark.queries import load_all

    q = load_all()["n49_incremental_lsh_dedup"]
    got = {r.doc_id: r for r in q.fn(spark, d).collect()}
    # negative ids are index-side on BOTH engines: absent from the result
    assert set(got) == {7, 17}
    assert got[7].decision == "drop_index_dup" and got[7].n_index_cand == 2
    assert got[17].decision == "keep"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = {r[0]: r for r in con.execute(q.oracle).fetchall()}
    assert set(want) == set(got)
    for k in got:
        g = got[k]
        assert (g.n_index_cand, g.n_shard_cand, g.best_jaccard, g.decision) == (
            want[k][1], want[k][2], want[k][3], want[k][4]
        ), k
