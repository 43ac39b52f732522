"""Bounded-error / nondeterminism tests for the ops that cannot carry exact
DuckDB oracles (SURVEY §7 risk 5): HLL distinct counts, approximate
percentiles, LSH recall, and the deliberately-nondeterministic functions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_bom_radiation_spark.queries import load_all

QS = load_all()


def test_approx_count_distinct_bounded_error(spark, oracle_sf_dir):
    """Q17: HLL++ estimate within 3x the configured rsd of the exact count."""
    li = spark.read.parquet(f"{oracle_sf_dir}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in QS["q17_approx_count_distinct"].fn(spark, oracle_sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3 * 0.02 * n, 5), (k, approx[k], n)


def test_percentile_approx_bounded_error(spark, oracle_sf_dir):
    """Q18b: GK-sketch median lands inside the exact p40-p60 band."""
    li = spark.read.parquet(f"{oracle_sf_dir}/lineitem.parquet")
    bands = {
        r["l_returnflag"]: (r["lo"], r["hi"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", 0.4).alias("lo"),
            F.percentile("l_extendedprice", 0.6).alias("hi"),
        )
        .collect()
    }
    for r in QS["q18b_percentile_approx"].fn(spark, oracle_sf_dir).collect():
        lo, hi = bands[r["l_returnflag"]]
        assert lo <= r["approx_median_price"] <= hi


def test_minhash_lsh_recall(spark, oracle_sf_dir):
    """N2: every pair MinHashLSH reports must truly be similar-ish, and the
    reported Jaccard estimate must correlate with the true shingle Jaccard
    (spot-check on the reported pairs; 5 hash tables -> recall is
    probabilistic, precision of the estimate is what we bound)."""
    pairs = QS["n02_minhash_lsh"].fn(spark, oracle_sf_dir).collect()
    assert len(pairs) > 0  # the corpus does contain near-dup shingle sets
    docs = {
        r["doc_id"]: set(
            " ".join(p)
            for p in zip(
                r["toks"], r["toks"][1:]
            )
        )
        for r in spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.filter(
                F.split(F.lower(F.trim("text")), r"\s+"), lambda t: F.length(t) > 0
            ).alias("toks"),
        )
        .collect()
    }
    for p in pairs[:50]:
        a, b = docs[p["doc_a"]], docs[p["doc_b"]]
        true_j = len(a & b) / len(a | b)
        # MinHash estimate from 5 tables is coarse; bound the gap loosely
        assert abs(true_j - p["jaccard_sim"]) <= 0.5
        assert true_j >= 0.02  # reported pairs share at least some shingles


def test_lsh_topk_overlap_with_exact(spark, oracle_sf_dir):
    """N3b: approximate top-10 overlaps the exact top-10 by >= 5 of 10."""
    exact = {r["vec_id"] for r in QS["n03_topk_cosine"].fn(spark, oracle_sf_dir).collect()}
    approx = {r["vec_id"] for r in QS["n03b_topk_cosine_lsh"].fn(spark, oracle_sf_dir).collect()}
    assert len(exact & approx) >= 5


def test_ivf_topk_overlap_with_exact(spark, oracle_sf_dir):
    """N3c: IVF (probe 4/16 cells) top-10 overlaps the exact top-10 by >= 5
    — near neighbours concentrate in the query's nearest cells."""
    exact = {r["vec_id"] for r in QS["n03_topk_cosine"].fn(spark, oracle_sf_dir).collect()}
    ivf = {r["vec_id"] for r in QS["n03c_topk_cosine_ivf"].fn(spark, oracle_sf_dir).collect()}
    assert len(exact & ivf) >= 5


def test_lsh_selfjoin_recall_vs_brute(spark, oracle_sf_dir):
    """N4b vs N4: the LSH self-join recovers >= 80% of the true pairs and
    reports no pair below ~the threshold (small float slack)."""
    true_pairs = {
        (r["id_a"], r["id_b"])
        for r in QS["n04_similarity_selfjoin"].fn(spark, oracle_sf_dir).collect()
    }
    lsh_pairs = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in QS["n04b_similarity_selfjoin_lsh"].fn(spark, oracle_sf_dir).collect()
    }
    assert len(true_pairs) > 0
    recall = len(true_pairs & set(lsh_pairs)) / len(true_pairs)
    assert recall >= 0.8, recall
    assert all(sim >= 0.35 - 1e-6 for sim in lsh_pairs.values())


def test_dropduplicates_subset_arbitrary_survivor(spark, oracle_sf_dir):
    """Q33 variant: dropDuplicates(subset) keeps exactly one arbitrary row
    per key — key set identical to DISTINCT on the subset."""
    li = spark.read.parquet(f"{oracle_sf_dir}/lineitem.parquet")
    deduped = li.dropDuplicates(["l_returnflag", "l_linestatus"])
    assert deduped.count() == li.select("l_returnflag", "l_linestatus").distinct().count()
    # survivors are genuine source rows
    assert deduped.join(
        li, on=list(li.columns), how="left_anti"
    ).isEmpty()


def test_nondeterministic_ids(spark, oracle_sf_dir):
    """Q42 tail: monotonically_increasing_id is unique + increasing per
    partition; uuid is unique; xxhash64 is deterministic within a session."""
    c = spark.read.parquet(f"{oracle_sf_dir}/customer.parquet").limit(1000)
    ids = c.select(F.monotonically_increasing_id().alias("i"), F.expr("uuid()").alias("u"))
    n = ids.count()
    assert ids.select("i").distinct().count() == n
    assert ids.select("u").distinct().count() == n
    h1 = c.select(F.xxhash64("c_name").alias("h")).collect()
    h2 = c.select(F.xxhash64("c_name").alias("h")).collect()
    assert [r["h"] for r in h1] == [r["h"] for r in h2]


def test_shingle_queries_survive_single_token_docs(spark, tmp_path):
    """code-review r3c: element_at RAISES on out-of-bounds under ANSI mode,
    so a single-token document used to abort every 2-gram query. The
    shared _shingles helper now uses try_element_at — degenerate docs
    yield a degenerate shingle, never a crash."""
    import etl_bom_radiation_spark.queries.llm_queries as L

    d = str(tmp_path)
    spark.createDataFrame(
        [(1, "single", "en", "web", 6), (2, "two words", "en", "web", 9),
         (3, "", "en", "web", 0)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.parquet(f"{d}/documents.parquet")
    assert len(L.n12_ngram_jaccard(spark, d).collect()) == 2
    assert len(L.n10_fingerprint(spark, d).collect()) == 3
    assert L.n19_repetition_stats(spark, d).count() == 0  # all docs < 3 grams
    assert L.n02_minhash_lsh(spark, d).count() == 0  # no near-dups, no crash


def test_cosine_queries_survive_zero_norm_vectors(spark, tmp_path):
    """code-review r3c probe: a zero-norm embedding made cosine similarity
    divide by zero (ANSI abort). try_divide yields NULL similarity — the
    vector drops out of thresholds and sorts last in top-k."""
    import etl_bom_radiation_spark.queries.llm_queries as L

    d = str(tmp_path)
    rows = [(0, [1.0, 2.0, 3.0], "a"), (1, [0.0, 0.0, 0.0], "a"), (2, [3.0, 2.0, 1.0], "b")]
    spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).write.parquet(
        f"{d}/embeddings.parquet"
    )
    top = L.n03_topk_cosine(spark, d).collect()
    assert [r["vec_id"] for r in top][:2] == [0, 2]  # zero vector sorts last
    pairs = L.n04_similarity_selfjoin(spark, d).collect()
    assert all(1 not in (r["id_a"], r["id_b"]) for r in pairs)


def test_minhash_estimator_statistics(spark, sf_dir):
    """n36 semantics beyond oracle parity: an identical-shingle-set pair
    must estimate exactly 1.0, and the 16-permutation sketch should track
    exact Jaccard within a loose statistical bound on average."""
    from etl_bom_radiation_spark.queries import load_all

    rows = load_all()["n36_minhash_estimate"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.jaccard_exact == 1.0:
            assert r.minhash_est == 1.0
        assert 0.0 <= r.minhash_est <= 1.0
    mean_err = sum(r.abs_err for r in rows) / len(rows)
    assert mean_err < 0.2, mean_err


def test_n37_ivf_recall_fence(spark, oracle_sf_dir):
    """n37's engine-neutral IVF must actually be a useful index: high
    recall@10 while scanning a bounded fraction of the corpus (nprobe/cells
    = 4/16 of a balanced index; allow imbalance headroom). The VALUE is
    hash-verified by the driver; this fence pins the quality floor so a
    future quantizer change can't silently degrade it."""
    row = QS["n37_ivf_recall"].fn(spark, oracle_sf_dir).head()
    assert row["k"] == 10 and row["corpus"] > 0
    assert row["recall_at_k"] >= 0.8, row
    assert row["scan_frac"] <= 0.45, row


def test_n38_lsh_recall_fence(spark, oracle_sf_dir):
    """n38's engine-neutral hyperplane LSH: pin the quality floor (the
    VALUE is hash-verified; this keeps a plane/probe change from silently
    degrading it). Single-family hyperplane LSH on a clustered corpus is
    honestly mid-recall at this scan fraction — that finding (vs IVF's
    1.0 at the same scan, n37) is part of what the pair documents."""
    row = QS["n38_lsh_recall"].fn(spark, oracle_sf_dir).head()
    assert row["k"] == 10 and row["corpus"] > 0
    assert row["recall_at_k"] >= 0.6, row
    assert row["scan_frac"] <= 0.45, row


def test_bloom_prefilter_no_false_negatives(spark, oracle_sf_dir):
    """n45 soundness: bloom membership has no false negatives, so every
    exact true dup must be flagged — and the three reported counts must
    be consistent (flagged = true dups + false positives) per source."""
    rows = QS["n45_bloom_prefilter"].fn(spark, oracle_sf_dir).collect()
    assert rows
    assert any(r.n_true_dup > 0 for r in rows)  # the truth path is exercised
    assert any(r.n_false_pos > 0 for r in rows)  # m=1024 makes FPs observable
    for r in rows:
        assert r.n_flagged == r.n_true_dup + r.n_false_pos, r


def test_bloom_helper_and_native_bloom_agree_on_soundness(spark):
    """The engine-neutral k/m bloom (bloom_flagged) and Spark's native
    DataFrameStatFunctions.bloomFilter both honour the no-false-negative
    contract over the same membership set: a digest that IS in the corpus
    can never be rejected by either filter."""
    from etl_bom_radiation_spark.queries.bloom import bloom_flagged

    corpus = spark.range(200).selectExpr("md5(cast(id AS string)) AS digest")
    members = spark.range(50).selectExpr(
        "id AS doc_id", "md5(cast(id AS string)) AS digest"
    )
    assert bloom_flagged(corpus, members).filter("bloom_hit = 0").count() == 0
    # this PySpark build doesn't expose DataFrameStatFunctions.bloomFilter
    # in Python; the JVM implementation is still there — call it directly
    bf = corpus._jdf.stat().bloomFilter("digest", 200, 0.03)
    assert all(bf.mightContain(r.digest) for r in members.collect())


def test_rolling_dau_hll_tracks_exact(spark, oracle_sf_dir):
    """x09's HLL rolling actives must track x08's exact counts within
    HLL's standard-error envelope (lgK=12 default ≈ 1.6% σ; gate at 5%)
    on every window-day."""
    exact = {
        r.day: r.active_users_7d
        for r in QS["x08_rolling_dau"].fn(spark, oracle_sf_dir).collect()
    }
    approx = {
        r.day: r.approx_users_7d
        for r in QS["x09_rolling_dau_hll"].fn(spark, oracle_sf_dir).collect()
    }
    assert set(exact) == set(approx) and exact
    for day, n in exact.items():
        if n == 0:
            assert approx[day] == 0, day
        else:
            assert abs(approx[day] - n) / n <= 0.05, (day, approx[day], n)


def test_theta_source_overlap_matches_exact_matrix(spark, oracle_sf_dir):
    """n46's theta-sketch overlap estimates vs n35's exact shared counts:
    below the sketch's nominal entries theta is exact, so every pair
    present in n35 must match exactly and every absent pair must
    estimate 0."""
    exact = {
        (r.source_a, r.source_b): r.shared_prefixes
        for r in QS["n35_source_dup_matrix"].fn(spark, oracle_sf_dir).collect()
    }
    approx = {
        (r.source_a, r.source_b): r.approx_shared
        for r in QS["n46_source_overlap_theta"].fn(spark, oracle_sf_dir).collect()
    }
    assert exact and len(approx) > len(exact)  # n46 reports all pairs
    for pair, n in approx.items():
        assert n == exact.get(pair, 0), (pair, n, exact.get(pair, 0))


def test_hll_sketches_merge_losslessly_across_partitions(spark, oracle_sf_dir):
    """The property a 100-TB shuffle relies on (VERDICT r6 task #5): HLL
    register-union is associative and lossless, so sketching k arbitrary
    partitions of the fact and unioning MUST estimate exactly what one
    single-pass sketch estimates — map-side partials, repartitions, and
    x09's per-day-then-window regrouping all ride this.  Checked for two
    different splits (by user, by row) so the merge can't pass by luck of
    one partitioning."""
    from etl_bom_radiation_spark.queries import load_events

    ev = load_events(spark, oracle_sf_dir).filter(
        F.col("user_id").isNotNull()
    )
    single = ev.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))")
    ).first()[0]
    for split in (F.col("user_id") % 5, F.col("event_id") % 7):
        merged = (
            ev.groupBy(split.alias("p"))
            .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
            .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))"))
            .first()[0]
        )
        assert merged == single


def test_theta_sketches_merge_losslessly_across_partitions(spark, oracle_sf_dir):
    """Theta's k-minimum-value union is exact below the sketch's nominal
    entries, so per-partition sketch -> theta_union_agg must equal both
    the single-pass sketch estimate AND the true distinct count at
    fixture scale — and the merged sketch must stay algebra-compatible
    (intersecting it with a single-pass sketch of a SUBSET returns the
    subset's cardinality, the n46 pairwise-overlap contract)."""
    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    h = docs.select(
        F.md5("text").alias("h"), (F.col("doc_id") % 4).alias("p"), "lang"
    )
    truth = h.select("h").distinct().count()
    single = h.agg(F.expr("theta_sketch_estimate(theta_sketch_agg(h))")).first()[0]
    merged_df = h.groupBy("p").agg(F.expr("theta_sketch_agg(h)").alias("sk"))
    merged = merged_df.agg(
        F.expr("theta_sketch_estimate(theta_union_agg(sk))")
    ).first()[0]
    assert round(single) == round(merged) == truth
    # set algebra across differently-built sketches: merged-all ∩ single(en)
    en = h.filter(F.col("lang") == "en")
    en_truth = en.select("h").distinct().count()
    inter = (
        merged_df.agg(F.expr("theta_union_agg(sk)").alias("all_sk"))
        .crossJoin(en.agg(F.expr("theta_sketch_agg(h)").alias("en_sk")))
        .selectExpr(
            "CAST(round(theta_sketch_estimate("
            "theta_intersection(all_sk, en_sk))) AS BIGINT) AS n"
        )
        .first()["n"]
    )
    assert inter == en_truth


def test_misra_gries_survival_and_error_bounds(spark, oracle_sf_dir):
    """x10b: the Misra-Gries guarantees, fenced exactly against true
    counts per shard — est <= true <= est + n_shard/(K+1), and every
    user whose true count exceeds its shard's bound SURVIVES in the
    candidate frame (so the top of x10 cannot be silently lost)."""
    from etl_bom_radiation_spark.queries.heavy_hitters import (
        K_COUNTERS,
        N_BUCKETS,
        mg_candidates,
    )
    from etl_bom_radiation_spark.queries import load_events

    e = load_events(spark, oracle_sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    truth = {
        r["user_id"]: r["n"]
        for r in e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    shard_n: dict = {}
    for u, n in truth.items():
        shard_n[u % N_BUCKETS] = shard_n.get(u % N_BUCKETS, 0) + n
    cand = {
        r["user_id"]: r["est"]
        for r in mg_candidates(e).collect()
    }
    for u, est in cand.items():
        bound = shard_n[u % N_BUCKETS] // (K_COUNTERS + 1)
        assert est <= truth[u] <= est + bound, (u, est, truth[u], bound)
    for u, n in truth.items():
        if n > shard_n[u % N_BUCKETS] // (K_COUNTERS + 1):
            assert u in cand, (u, n)


def test_misra_gries_matches_python_fold(spark, oracle_sf_dir):
    """x10b determinism: the Spark kernel's per-shard counters equal a
    pure-Python Misra-Gries fold over the same (ts, event_id)-ordered
    per-shard stream — the pinned arrival order is what makes the
    sketch reproducible and this comparison exact."""
    from etl_bom_radiation_spark.queries.heavy_hitters import (
        K_COUNTERS,
        N_BUCKETS,
        mg_candidates,
        misra_gries_fold,
    )
    from etl_bom_radiation_spark.queries import load_events

    e = load_events(spark, oracle_sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    rows = (
        e.select("user_id", "ts", "event_id")
        .orderBy("ts", "event_id")
        .collect()
    )
    streams: dict = {}
    for r in rows:
        streams.setdefault(r["user_id"] % N_BUCKETS, []).append(r["user_id"])
    expected: dict = {}
    for stream in streams.values():
        expected.update(misra_gries_fold(stream, K_COUNTERS))
    got = {r["user_id"]: r["est"] for r in mg_candidates(e).collect()}
    assert got == expected

    # forced 2-partition layout (VERDICT r7 #7): repartition(n, bucket)
    # hash-places buckets, so co-located buckets are the NORMAL case —
    # the summary must be a function of the shard, not the partition.
    # With 2 partitions every partition carries ~16 buckets and the
    # per-shard folds must still match the same python model exactly.
    got2 = {
        r["user_id"]: r["est"]
        for r in mg_candidates(e, n_partitions=2).collect()
    }
    assert got2 == expected
