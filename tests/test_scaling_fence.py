"""Scaling-curve regression fence (VERDICT r7 #3).

The M=10 ratios the scaling probe records in the DRIFT tables (n32 1.56,
n39 2.13, n44 1.82, ...) lived only in round artifacts — a re-introduced
quadratic (an uncapped bucket join, a lost pre-aggregation) would sail
through CI and only show at 100 TB.  This module runs the SAME probe
machinery (``tools/scaling_probe.gen_corpus`` / ``time_op``) at M=10
inside pytest, with two fence forms matched to how each regression class
actually manifests:

* **Time fence** (n32/n39/n44, realistic regime): a lost pre-aggregation
  or digest collapse shows as superlinear *runtime*.  Asserts
  t(10x)/t(1x) under ~2x the healthy recorded ratio (min 4.0 for noise
  headroom — ratios are runtime quotients on the same box in the same
  session, far more stable than absolute times; a quadratic lands near
  M*M/healthy >> these).

* **Pair-count fence** (n42/n11b, saturated-hot regime): the round-6
  bucket-join quadratic manifests as *candidate-pair volume*, and the
  pipelines' output rows ARE the candidate pairs — a deterministic,
  zero-noise signal.  The corpus uses ``gen_corpus(classes=101)``: the
  hot token hash's modulus is the near-dup class count, so 1x has ~50
  docs/class (caps inactive) and 10x ~500/class (caps binding).  Capped
  row growth measured 22.9x (n42; the cap-activation transition, bounded
  thereafter by buckets x C(64,2) ~ linear) and 2.8x (n11b); uncapped
  both measure ~100x (the quadratic: class size grows with the corpus).
  At the probe's default 5003 classes the M=10 quadratic hides under
  fixed costs entirely (uncapped n42 TIME ratio 1.66 vs capped 1.40 —
  indistinguishable), which is why the fence regime is explicitly
  saturated.

**Liveness** (the fence demonstrably catches the quadratic, in CI):
``test_fence_is_live_uncapped`` monkeypatches ``banded_lsh.BUCKET_CAP``
/ ``llm_queries.SIMHASH_BUCKET_CAP`` to 10**9 and asserts the measured
pair-count ratio lands ABOVE the fence threshold (measured ~100 vs
thresholds 45/8) — the exact round-6 regression re-introduced on
purpose, failing the fence's own predicate.  Counting the uncapped 10x
pairs costs ~15 s; a time-ratio liveness proof was not affordable (at
classes=31 a single uncapped 1x run is already 11.5M pairs / 40 s).

Numbers recorded in tools/DRIFT_r08.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_probe import gen_corpus, time_op  # noqa: E402

M = 10

#: op -> max allowed t(10x)/t(1x), realistic regime.  Thresholds ratcheted
#: r9 (VERDICT r8 #6: a fence >3x above its recorded ratio would let a
#: large regression pass silently): ops whose recorded ratio is stable
#: ~1.1 across two independent probe rounds (r7 + r9) fence at 2.5 —
#: >2x their measured band's top, still ~4x under where a quadratic
#: lands (M*M/healthy ~ 10+); ops with genuinely superlinear-ish healthy
#: ratios (shuffle growth, candidate verify) keep the wider 4.0/5.0
#: noise floor.  Recorded values: DRIFT_r07 / DRIFT_r09 tables.
TIME_FENCES = {
    "n32_truncation_dedup": 4.0,     # recorded 1.56 (r7) / 1.53 (r9)
    "n39_substring_dup_spans": 5.0,  # recorded 2.13 (r7) / 2.14 (r9)
    "n44_corpus_keep_list": 4.0,     # recorded 1.82 (r7) / 1.62 (r9) —
                                     # tightened 4.5 -> 4.0 (2.2x headroom)
    "n35_source_dup_matrix": 2.5,    # recorded 1.13 (r7) / 1.11 (r9) —
                                     # tightened 4.0 -> 2.5 (stable band)
    "n47_source_pagerank": 2.5,      # recorded 1.00 (r7) / 1.07 (r9) —
                                     # tightened 4.0 -> 2.5 (loop is
                                     # corpus-independent by design)
    "x04_sessionization": 2.5,       # recorded 0.92 (r7) / 1.11 (r9) —
                                     # tightened 4.0 -> 2.5 (events family)
    "x10b_heavy_hitters_mg": 2.5,    # recorded 1.24 (r7) / 1.18 (r9) —
                                     # tightened 4.0 -> 2.5 (bounded-memory
                                     # sketch: growth should be sublinear)
    "n49_incremental_lsh_dedup": 4.0,  # recorded 1.29 (r8) / 1.81 (r9) —
                                       # widest observed band; 4.0 stays
}

#: op -> max allowed rows(10x)/rows(1x), hot classes=101 regime;
#: ~2x the capped measurement, >=2x under the uncapped one (~100)
PAIR_FENCES = {
    "n42_minhash_banded_lsh": 45.0,  # capped 22.9, uncapped 102.4
    "n11b_simhash_neardup": 8.0,     # capped 2.8, uncapped 99.7
}

#: the hot fence regime: token-hash modulus = near-dup class count (see
#: gen_corpus docstring)
HOT_CLASSES = 101


@pytest.fixture(scope="module")
def corpora(spark):
    """regime ("real" | "hot") -> (dir_1x, dir_Mx), generated once."""
    roots = {}
    base = tempfile.mkdtemp(prefix="scalefence_")
    try:
        for regime, kw in (
            ("real", {}),
            ("hot", {"hot": True, "classes": HOT_CLASSES}),
        ):
            d1 = os.path.join(base, f"{regime}_1x")
            dm = os.path.join(base, f"{regime}_{M}x")
            gen_corpus(spark, d1, 1, **kw)
            gen_corpus(spark, dm, M, **kw)
            roots[regime] = (d1, dm)
        yield roots
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _pair_ratio(spark, corpora, name):
    from etl_bom_radiation_spark.queries import load_all

    d1, dm = corpora["hot"]
    fn = load_all()[name].fn
    r1 = fn(spark, d1).count()
    rm = fn(spark, dm).count()
    return (rm / r1 if r1 > 0 else float("inf")), r1, rm


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(TIME_FENCES))
def test_time_ratio_bounded(spark, corpora, name):
    from etl_bom_radiation_spark.queries import load_all

    limit = TIME_FENCES[name]
    d1, dm = corpora["real"]
    fn = load_all()[name].fn
    t1 = time_op(spark, fn, d1)
    tm = time_op(spark, fn, dm)
    ratio = tm / t1 if t1 > 0 else float("inf")
    assert ratio < limit, (
        f"{name}: t(1x)={t1}s t({M}x)={tm}s ratio={ratio:.2f} >= {limit} — "
        "superlinear runtime regression (realistic regime); see "
        "tools/scaling_probe.py"
    )


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(PAIR_FENCES))
def test_candidate_pair_growth_bounded(spark, corpora, name):
    limit = PAIR_FENCES[name]
    ratio, r1, rm = _pair_ratio(spark, corpora, name)
    assert ratio < limit, (
        f"{name}: rows(1x)={r1} rows({M}x)={rm} ratio={ratio:.1f} >= "
        f"{limit} — candidate-pair volume growing superlinearly (bucket "
        "cap lost?); see BUCKET_CAP in banded_lsh.py"
    )


@pytest.mark.slow
def test_fold_cost_is_batch_bounded(spark, corpora):
    """Index-maintenance fence: folding the SAME fixed batch into a 10x
    index must cost ~the same as into a 1x one (``update_lsh_index``'s
    only index-proportional term is the map-side occupancy scan of the
    small bands table — no shuffle of the index, no hset read).  The
    probe's ``--fold`` mode measured 0.92 at M=10 (r9); fence at 2.5,
    the stable-band convention — a fold that re-processed the index
    (the rebuild the API avoids) would land near M."""
    from pyspark.sql import functions as F

    from etl_bom_radiation_spark.lsh_index import build_lsh_index, update_lsh_index

    d1, dm = corpora["real"]
    base = tempfile.mkdtemp(prefix="foldfence_")
    try:
        batch = (
            spark.read.parquet(f"{d1}/documents.parquet")
            .select("doc_id", "text")
            .filter(F.col("doc_id") % 10 == 3)
            .limit(500)
            .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
            .localCheckpoint()
        )
        batch.count()  # materialize outside the timers

        def timed_fold(corpus_dir: str, tag: str) -> float:
            import time

            idx = os.path.join(base, f"idx_{tag}")
            docs = spark.read.parquet(f"{corpus_dir}/documents.parquet").select(
                "doc_id", "text"
            )
            build_lsh_index(spark, docs, idx)
            best = float("inf")
            for i in range(3):  # first run is the warmup
                scratch = os.path.join(base, f"scratch_{tag}_{i}")
                shutil.copytree(idx, scratch)
                t0 = time.time()
                update_lsh_index(spark, scratch, batch)
                dt = time.time() - t0
                shutil.rmtree(scratch, ignore_errors=True)
                if i > 0:
                    best = min(best, dt)
            return best

        t1 = timed_fold(d1, "1x")
        tm = timed_fold(dm, f"{M}x")
        ratio = tm / t1 if t1 > 0 else float("inf")
        assert ratio < 2.5, (
            f"update_lsh_index: fold into 1x index={t1:.3f}s, into {M}x "
            f"index={tm:.3f}s, ratio={ratio:.2f} >= 2.5 — the fold is no "
            "longer batch-bounded (index being re-processed?); see "
            "tools/scaling_probe.py --fold"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@pytest.mark.slow
def test_fence_is_live_uncapped(spark, corpora, monkeypatch):
    """Re-introduce the round-6 quadratic on purpose (caps -> 10**9) and
    assert BOTH pair fences' predicates now fail — the fence demonstrably
    catches the regression class it exists for (VERDICT r7 #3)."""
    from etl_bom_radiation_spark.queries import banded_lsh, llm_queries

    monkeypatch.setattr(banded_lsh, "BUCKET_CAP", 10**9)
    monkeypatch.setattr(llm_queries, "SIMHASH_BUCKET_CAP", 10**9)
    for name, limit in PAIR_FENCES.items():
        ratio, r1, rm = _pair_ratio(spark, corpora, name)
        assert ratio >= limit, (
            f"{name}: uncapped ratio {ratio:.1f} < {limit} — the fence "
            "would NOT catch an uncapped bucket join; its threshold or "
            "regime needs re-derivation"
        )


@pytest.mark.slow
def test_probe_cost_index_scan_bounded(spark, corpora):
    """Arrival-probe fence (VERDICT r9 #4): probing the SAME fixed batch
    against a 10x index must stay within the stable band of the 1x probe
    at this corpus scale — the probe's index-proportional term is a
    map-side scan of the two index tables (sub-MB here, invisible under
    the fixed sketch/join costs; ``--probe`` measured 1.01 at M=10,
    r10), so a ratio approaching M means the probe started shuffling or
    re-sketching the INDEX — the regression class the broadcast-probe
    plan shape exists to prevent.  (At real scale the hset scan does
    grow with index bytes; that term is priced by the probe_cold/warm
    bench pair, and the measured flatness here is why the candidate-id
    pushdown lever stays unimplemented — see lsh_index.py.)"""
    import time

    from pyspark.sql import functions as F

    from etl_bom_radiation_spark.lsh_index import build_lsh_index, probe_lsh_index

    d1, dm = corpora["real"]
    base = tempfile.mkdtemp(prefix="probefence_")
    try:
        batch = (
            spark.read.parquet(f"{d1}/documents.parquet")
            .select("doc_id", "text")
            .filter(F.col("doc_id") % 10 == 3)
            .limit(500)
            .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
            .localCheckpoint()
        )
        batch.count()  # materialize outside the timers

        def timed_probe(corpus_dir: str, tag: str) -> float:
            idx = os.path.join(base, f"idx_{tag}")
            docs = spark.read.parquet(f"{corpus_dir}/documents.parquet").select(
                "doc_id", "text"
            )
            build_lsh_index(spark, docs, idx)
            best = float("inf")
            for i in range(3):  # first run is the warmup
                t0 = time.time()
                probe_lsh_index(spark, idx, batch).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                if i > 0:
                    best = min(best, dt)
            return best

        t1 = timed_probe(d1, "1x")
        tm = timed_probe(dm, f"{M}x")
        ratio = tm / t1 if t1 > 0 else float("inf")
        assert ratio < 2.5, (
            f"probe_lsh_index: probe against 1x index={t1:.3f}s, against "
            f"{M}x index={tm:.3f}s, ratio={ratio:.2f} >= 2.5 — the probe is "
            "no longer index-scan bounded (index being shuffled or "
            "re-sketched?); see tools/scaling_probe.py --probe"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_canary_pair_set_for_programmatic_mains(monkeypatch):
    """ADVICE r10: ``_CANARY_AT_START`` was only set in ``main()``, so
    ``stream_main``/``fold_main``/``probe_main`` invoked programmatically
    printed ``"spin": [null, a]`` — losing the before/after agreement
    check the canary pair exists for.  ``_canary_start`` now lazily
    initializes it (once per process) and every ``*_main`` calls it
    before building its Spark session."""
    import ast
    import inspect

    import tools.scaling_probe as SP

    calls = iter([0.5, 99.0])
    monkeypatch.setattr(SP, "_spin_canary", lambda: next(calls))
    monkeypatch.setattr(SP, "_io_canary", lambda: 0.25)
    monkeypatch.setattr(SP, "_CANARY_AT_START", None)
    monkeypatch.setattr(SP, "_IO_CANARY_AT_START", None)
    assert SP._canary_start() == 0.5
    assert SP._canary_start() == 0.5  # set at most once per process
    assert SP._CANARY_AT_START == 0.5
    assert SP._IO_CANARY_AT_START == 0.25  # the disk half primes with it

    # every entry point primes the canary as its FIRST statement
    for fn in (SP.stream_main, SP.fold_main, SP.probe_main, SP.main):
        body = ast.parse(inspect.getsource(fn)).body[0].body
        stmts = [s for s in body if not (
            isinstance(s, ast.Expr) and isinstance(s.value, ast.Constant))]
        first = stmts[0]
        assert (
            isinstance(first, ast.Expr)
            and isinstance(first.value, ast.Call)
            and getattr(first.value.func, "id", None) == "_canary_start"
        ), f"{fn.__name__} must call _canary_start() first"


@pytest.mark.slow
def test_t09_stream_join_state_plateaus(spark, tmp_path):
    """Stream-stream join bounded-state fence (VERDICT r11 #4): t09's
    state holds BOTH sides within watermark (5 min) + the 10-minute
    attribution range — ~16 micro-batches of fill at the probe's 60 s
    event-time step — so the old 8-batch/80-batch probe pair compared a
    still-filling store against the plateau (ratio 1.54 read as growth).
    The ``--plateau`` ladder measured the actual curve: 1301 rows at 8
    batches, 2001 at 16, 2001 at 32 — exactly flat across a doubling
    (DRIFT_r12).  This fence drains 16 and 32 batches and pins both the
    flatness (a join whose range predicate stopped bounding state — the
    unbounded-state regression class — doubles here) and the absolute
    horizon bound."""
    from tools.scaling_probe import (
        BATCH_ROWS,
        _stream_pipelines,
        drain_stream,
    )

    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "200")
    finals = {}
    for nb in (16, 32):
        src = str(tmp_path / f"src_{nb}")
        ckpt = str(tmp_path / f"ckpt_{nb}")
        df_fn, mode = _stream_pipelines(spark, src)["t09_stream_stream_join"]
        finals[nb] = drain_stream(spark, df_fn, src, nb, ckpt, mode)[
            "state_final"
        ]
    assert finals[16] > 0
    ratio = finals[32] / finals[16]
    assert ratio < 1.10, (
        f"t09 state_final grew {finals[16]} -> {finals[32]} "
        f"(ratio {ratio:.2f}) across a doubling past the fill horizon — "
        "stream-stream join state is no longer event-time bounded; see "
        "tools/scaling_probe.py --plateau"
    )
    # absolute horizon bound: ~16 batches of two-sided rows plus slack
    # (measured plateau 2001 = ~10 batches of retained rows/side + 1)
    assert finals[32] <= 25 * BATCH_ROWS, finals


@pytest.mark.slow
def test_grouped_rank_single_class_stays_flat(spark):
    """q23b's scale property, fenced at its worst case (DRIFT_r12): with
    ONE class, a window rank collapses to a single sort task (measured
    4.55x at 4x data — superlinear, 25 s at 8M rows) while
    grouped_rank_index's range exchange stays flat (measured 1.16x,
    2.9 s).  A regression that reintroduces a per-class sort task (a
    window sneaking back in, the checkpoint fork collapsing to one
    partition) lands near the data ratio; fence at 2.5 — the
    stable-band convention, ~2x the measured top.

    Canary-gated (ADVICE r12): this is a wall-clock ratio on the box
    whose documented heavy-tailed host contention is the reason bench
    moved to median-of-3 — a contended CI run could flake the fence
    despite the ~2x headroom.  The timed section is bracketed by the
    spin canary; a FAILING ratio under a disagreeing canary pair (>10%)
    is remeasured once, and if the pair still disagrees the run is
    SKIPPED as unattributable (contention, not code).  A failing ratio
    under agreeing canaries fails for real — the gate never excuses a
    quiet-box regression."""
    import time

    from pyspark.sql import functions as F

    from etl_bom_radiation_spark.scale import grouped_rank_index
    from tools.scaling_probe import _spin_canary

    def frame(n):
        return (
            spark.range(n)
            .select(
                F.col("id").alias("k"),
                F.lit("URGENT").alias("cls"),
                (F.pmod(F.col("id") * 7919, F.lit(100000)) * 1.0).alias("v"),
            )
            .localCheckpoint()
        )

    def timed(df):
        def build():
            return grouped_rank_index(
                df, ["cls"], [F.col("v").desc(), F.col("k").asc()]
            ).select("k", "cls", "rn")

        build().write.format("noop").mode("overwrite").save()  # warmup
        samples = []
        for _ in range(3):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        return sorted(samples)[1]  # median, the v3 convention

    d1 = frame(1_000_000)
    d4 = frame(4_000_000)
    d1.count(), d4.count()  # materialize outside the timers

    def measure():
        c0 = _spin_canary()
        t1, t4 = timed(d1), timed(d4)
        c1 = _spin_canary()
        r = t4 / t1 if t1 > 0 else float("inf")
        quiet = abs(c1 - c0) / max(c0, c1) <= 0.10
        return r, quiet, (t1, t4, c0, c1)

    ratio, quiet, (t1, t4, c0, c1) = measure()
    if ratio >= 2.5 and not quiet:
        ratio, quiet, (t1, t4, c0, c1) = measure()  # one contended retry
    if ratio >= 2.5 and not quiet:
        pytest.skip(
            f"spin canaries disagree ({c0:.3f} vs {c1:.3f}) around a "
            f"failing ratio {ratio:.2f} — host contention, unattributable"
        )
    assert ratio < 2.5, (
        f"grouped_rank_index single-class: t(1M)={t1:.3f}s t(4M)={t4:.3f}s "
        f"ratio={ratio:.2f} >= 2.5 under agreeing canaries "
        f"({c0:.3f}/{c1:.3f}) — the per-class rank is no longer "
        "task-parallel under a dominant class (window/per-class sort "
        "regression?); see DRIFT_r12 and scale.grouped_rank_index"
    )


def test_plateau_flatness_helpers():
    """Pure-logic fences for the --plateau probe's flatness predicates
    (ADVICE r12: an all-zero state curve must read as FLAT — the old
    prev > 0 guard ran the full ladder and reported plateau=false on
    the flattest possible pipeline)."""
    from tools.scaling_probe import flat_step, tail_ratio

    assert flat_step(None, 5) is False  # first rung: nothing to compare
    assert flat_step(0, 0) is True  # flat at zero IS flat
    assert flat_step(0, 3) is False  # growth from zero is not
    assert flat_step(2000, 2001) is True  # within 10%
    assert flat_step(1000, 1500) is False
    assert tail_ratio({8: 1301}) is None  # single rung
    assert tail_ratio({8: 1301, 16: 2001, 32: 2001}) == 1.0  # t09's curve
    assert tail_ratio({8: 0, 16: 0}) == 1.0  # flat at zero -> plateau true
    assert tail_ratio({8: 0, 16: 7}) is None  # 0 -> nonzero: no ratio
    assert tail_ratio({8: 1000, 16: 1540}) == 1.54
