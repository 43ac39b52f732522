#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries from the declared surface at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full execution, no
result materialization on the driver — the same way a cluster job would
be bounded by the write, not a collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per family — scan/project, fact-fact join, star join,
# agg, window, set-op, text, embedding. Kept small enough to run per-round
# but covering every physical-plan shape the engine produces.
HEADLINE = [
    "q01_projection",
    "q05_inner_join",
    "q06_broadcast_join",
    "q13_multiway_join",
    "q14_groupby_agg",
    "q16_count_distinct",
    "q23_ranking",
    "q27_global_sort",
    "q30_union",
    "n01_exact_dedup",
    "n03_topk_cosine",
    "n05_text_stats",
    "n14_decontamination",
    "n22_tfidf_topterms",
    "n30_unigram_lm_score",
    "x02_gapfill",
    # round-4 surface (VERDICT r4 #2): a plan regression in the new dedup /
    # provenance / raster family must show up as wall-time here, not only
    # as a plan-lint failure
    "n31_incremental_merge",
    "n32_truncation_dedup",
    "n33_split_leakage",
    "n35_source_dup_matrix",
    "n36_minhash_estimate",
    "g_zonal_stats",
    "g_gradient",
    "g_regrid_bilinear",
    "x06_scd2_intervals",
    "mm03_thumbnail",
    "mm04_audio_frames",
    # round-6 surface: the oracle-verified ANN recall gates (the quality
    # claims must carry a wall-time too, or a quantizer/plane regression
    # could hide behind a still-green recall number)
    "n37_ivf_recall",
    "n38_lsh_recall",
    # round-6 operators: substring-level dedup (the most expensive text op —
    # ~L rows per token), integer-exact mixture tempering, Morton key
    "n39_substring_dup_spans",
    "n40_mixture_temperature",
    "g_zorder_cluster",
    "n41_matryoshka_recall",
    # full banded-LSH pipeline + the Expand-based one-scan profiler: both
    # new physical-plan shapes (bucket self-join; wide multi-distinct)
    "n42_minhash_banded_lsh",
    "x07_table_profile",
    # the composed keep-list: three dedup modalities staged into one
    # decision — the correctness-gated sibling of pipeline_corpus_prep
    "n44_corpus_keep_list",
    # round-6 continuation: one-shuffle sessionization, decorrelated
    # LATERAL top-k, and the bloom admission prefilter (broadcast
    # position probes + exact FP accounting)
    "x04_sessionization",
    "q50_lateral_topk",
    "n45_bloom_prefilter",
    # recursive CTE: a regression that drags the fact scan inside the
    # driver-coordinated loop must show as wall time (7 levels, sub-second)
    "q51_recursive_cte",
    # rolling distinct actives: the contribute-then-dedup shape (a
    # regression to a day x window self-join would multiply wall time)
    "x08_rolling_dau",
    # the sketch family additions: day-HLL window unions and per-source
    # theta merges (both collapse the fact in one pass; wall time guards
    # the sketch-agg + merge shapes)
    "x09_rolling_dau_hll",
    "n46_source_overlap_theta",
    # the iterative family: wall time guards the pinned-graph +
    # metadata-sized-iteration shape (a regression that drags the corpus
    # into the loop multiplies these ~ITERS-fold)
    "n47_source_pagerank",
    "n48_authority_weighted_sampling",
    # frequency sketch: one-pass sharded Misra-Gries (wall time guards
    # the single-Exchange + Arrow-kernel shape)
    "x10b_heavy_hitters_mg",
    # incremental near-dup: probe-the-index posture (wall time guards the
    # broadcast-probe shape — a regression that re-shuffles the index for
    # an arriving shard shows up ~corpus/shard-fold here)
    "n49_incremental_lsh_dedup",
    # round-12: the scale-safe per-class rank (range exchange + broadcast
    # offsets, no WindowExec) — wall time guards the checkpointed
    # two-branch shape against a regression back to a per-class sort
    "q23b_ranking_at_scale",
    # round-13: grouped NTILE — q23b's shape plus the class-total column
    # (one more metadata-sized agg riding the same broadcast join)
    "q23c_ntile_at_scale",
]

# Fixed cross-round comparison set (VERDICT r5 #6): the full total grows
# whenever entries are added, so round-over-round deltas need a frozen
# basket. These 15 have been benched unchanged since round 3 — NEVER add,
# remove, or rename an entry here; new work belongs in HEADLINE only.
COMMON_SET = [
    "q01_projection",
    "q05_inner_join",
    "q06_broadcast_join",
    "q13_multiway_join",
    "q14_groupby_agg",
    "q16_count_distinct",
    "q23_ranking",
    "q27_global_sort",
    "q30_union",
    "n01_exact_dedup",
    "n03_topk_cosine",
    "n05_text_stats",
    "n14_decontamination",
    "n22_tfidf_topterms",
    "x02_gapfill",
]

#: side artifact for the FULL per-query timing + stage-IO detail.  The
#: driver captures only ~2000 chars of bench stdout: round 6's line (64
#: timings + nested io_mb dicts) grew past that and the driver recorded
#: ``parsed: null`` — no driver-side perf evidence for the round (VERDICT
#: r6 task #1).  The final printed line therefore stays SMALL (frozen
#: basket + flagship only, guarded by tests/test_bench_output.py); the
#: full detail goes here, committed to the repo for the judge.
IO_ARTIFACT = "BENCH_IO.json"

#: timings echoed on the printed line: the frozen cross-round basket plus
#: the flagship decode number the baseline ratio quotes.
PRINTED_SET = COMMON_SET + ["grid_decode_1000_files"]

#: timing methodology tag, bumped whenever the measurement window changes
#: (v2 = round 6's build+execute window: DataFrame construction included,
#: because AQE executes checkpointed upstreams during build; v3 = round
#: 12's noise-robust statistic: the per-entry MEDIAN of the three timed
#: runs instead of the MIN).  Printed on the line so cross-round
#: comparisons are self-describing — v1 numbers (write-only window,
#: rounds 1-5) undercount checkpointed plans ~10x.  Why median (VERDICT
#: r11 #1): driver baskets on identical code spanned 8.03-9.69 s with
#: agreeing CPU and disk canaries — the min of three is itself a noisy
#: order statistic under the box's heavy-tailed contention, while the
#: median discards exactly one outlier per side.  The v2-style min rode
#: alongside for ONE transition round (r12, BENCH_r12 carries both);
#: retired r13 per VERDICT r12 #1 — cross-round comparison is now
#: v3-median to v3-median (r12 anchor: common_set_total 8.105 s).
METHODOLOGY = "build+execute v3, median-of-3"


def summarize_runs(samples: list[float]) -> float:
    """Median of the timed run samples — the v3 statistic.  Median of an
    even count is the mean of the middle pair (only the 3-run case is
    exercised; the general form keeps the helper honestly testable)."""
    s = sorted(samples)
    n = len(s)
    med = s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2
    return round(med, 3)


def _spin_canary() -> float:
    """Single-core CPU canary: seconds for a fixed pure-Python loop — no
    IO, no JVM, no Spark.  This box is a guest whose host contention is
    invisible (steal reads 0, no cpufreq interface), and identical code
    measured frozen-basket totals from 8.5 to 12.9 s within one morning
    while this loop tracked the drift (DRIFT_r10).  A canary pair
    (before the Spark session / after the last timed query) rides the
    printed line so every capture is self-describing: compare baskets
    across rounds only when the canaries agree within ~10%.
    perf_counter, not time.time: an NTP step during the ~1 s spin (a
    real hazard on exactly the guest this canary exists for) would
    corrupt a wall-clock reading and mis-validate the capture."""
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i
    assert x  # keep the loop un-eliminable
    return round(time.perf_counter() - t0, 3)


def _io_canary() -> float:
    """Disk canary: best-of-2 seconds for a 64 MiB write+fsync+read in
    the process temp dir — the device Spark's default ``local.dir``
    (shuffle spill) shares; on this box it is also the repo/corpora
    device.  Caveat (code-review r11): if TMPDIR is tmpfs the canary
    measures memory, which is then also what Spark spill pays there —
    still the relevant number, but NOT evidence about the corpora disk;
    the buffer is urandom so a compressing filesystem cannot fake the
    write.  Added r11: the spin canary alone does not normalize the
    basket — identical code measured 8.42 and 9.76 s under the SAME
    spin reading (DRIFT_r11), so a second, CPU-invisible noise source
    exists, and host DISK contention is the prime suspect (a probe on
    this box read 4.4 s vs 0.35 s for the same fsync'd write minutes
    apart).  Best-of-2 because the first fsync on a fresh file can pay
    journal / allocation costs that are not contention; if even the
    best pass is slow, the disk is genuinely contended and the
    capture's IO-heavy timings (shuffle spill, parquet writes) are
    suspect."""
    import tempfile

    buf = os.urandom(64 << 20)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fd, p = tempfile.mkstemp(prefix="bench_io_canary_", dir=None)
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(buf)
                f.flush()
                os.fsync(f.fileno())
            with open(p, "rb") as f:
                f.read()
        finally:
            os.unlink(p)
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def format_output(
    timings: dict[str, float],
    io: dict[str, dict[str, float]],
    sf: float | None,
    canary: list[float] | None = None,
    io_canary: list[float] | None = None,
) -> tuple[str, dict]:
    """Build (printed-JSON-line, full-artifact-dict).

    The printed line must round-trip json.loads AND stay well under the
    driver's ~2000-char stdout capture whatever the registry grows to —
    so ``queries`` carries only PRINTED_SET and the io detail lives in
    the IO_ARTIFACT file (path referenced on the line).

    v3-only (VERDICT r12 #1): the r12 transition round's dual v2 record
    (``timings_v2`` param, ``common_set_total_v2``/``methodology_v2``/
    ``queries_v2`` fields) is retired — BENCH_r12 carries both statistics
    for the crossover, every later round compares v3 median to v3 median.
    """
    total = round(sum(timings.values()), 3)
    # frozen 15-entry basket: the one number comparable across rounds
    common_total = round(sum(timings[n] for n in COMMON_SET if n in timings), 3)
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "methodology": METHODOLOGY,
        "common_set_total": common_total,
        "common_set_n": len(COMMON_SET),
        "queries": timings,
        "io_mb": io,
        "sf": sf,
    }
    small = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "methodology": METHODOLOGY,
        "common_set_total": common_total,
        "common_set_n": len(COMMON_SET),
        "queries": {n: timings[n] for n in PRINTED_SET if n in timings},
        "queries_n": len(timings),
        "detail": IO_ARTIFACT,
        "sf": sf,
    }
    if canary is not None:
        full["spin"] = small["spin"] = canary
    if io_canary is not None:
        full["io_spin"] = small["io_spin"] = io_canary
    return json.dumps(small, separators=(",", ":")), full


def bucketed_q05_shape(spark, left_table: str, right_table: str):
    """q05's join/filter/project over two pre-bucketed tables — shared by
    the bench timing and tests/test_scale.py's zero-Exchange plan assert
    so the timed and the asserted shapes cannot diverge."""
    from pyspark.sql import functions as F

    return (
        spark.table(left_table)
        .join(spark.table(right_table), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "l_orderkey",
            "l_linenumber",
            "o_orderstatus",
            F.round("l_extendedprice", 2).alias("price"),
        )
    )


def _gen_grids(
    n_files: int = 1000, ncols: int = 50, nrows: int = 40, spread_time: bool = True
) -> str:
    """Deterministic synthetic grid corpus for the flagship-decode bench
    (~n_files * ncols * nrows cells; value = positional hash, ~10% nodata).
    ``spread_time=False`` stamps every file with one timestamp so the whole
    corpus lands in a single hive partition (maintenance-op benches)."""
    import tempfile

    d = tempfile.mkdtemp(prefix="bench_grids_")
    for f in range(n_files):
        if spread_time:
            hh, mm = f % 24, (f * 7) % 60
            day = 1 + (f % 28)
        else:
            hh, mm, day = 4, 0, 15
        lines = [
            f"ncols {ncols}",
            f"nrows {nrows}",
            "xllcorner 112.0",
            "yllcorner -44.0",
            "cellsize 0.05",
            "NODATA_value -999",
        ]
        for r in range(nrows):
            row = [
                str(-999 if (f + r + c) % 10 == 0 else (f * 31 + r * 7 + c) % 1400)
                for c in range(ncols)
            ]
            lines.append(" ".join(row))
        month = (f % 12) + 1 if spread_time else 3
        name = f"B{f:04d}_GLOBAL_2018{month:02d}{day:02d}_{hh:02d}{mm:02d}.txt"
        with open(os.path.join(d, name), "w") as fh:
            fh.write("\n".join(lines) + "\n")
    return d


def _stage_totals(sc) -> dict[str, int] | None:
    """Cumulative completed-stage IO/shuffle counters from the UI REST API —
    the 'measure, don't guess' companion to the wall times: per-query deltas
    of these are what actually predict 100-TB behavior (a query whose time
    is fine at sf0.1 but whose shuffle_write is corpus-sized is a scale bug
    the clock can't see). Returns None when the UI is unavailable."""
    import json as _json
    import urllib.request

    if not sc.uiWebUrl:
        return None
    try:
        url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=10) as r:
            data = _json.load(r)
        return {
            "shuffle_write_mb": sum(s.get("shuffleWriteBytes", 0) for s in data) / 1e6,
            "shuffle_read_mb": sum(s.get("shuffleReadBytes", 0) for s in data) / 1e6,
            # NOT inputBytes: the local file: scheme under-reports bytesRead
            # (vectorized reader), while record counts are exact — and
            # records-read is the row-group-pruning evidence anyway
            "input_records": sum(s.get("inputRecords", 0) for s in data),
        }
    except Exception:
        return None


def main() -> int:
    import __spark_entry__ as entrymod
    from etl_bom_radiation_spark.session import get_spark

    canary_before = _spin_canary()  # before the JVM exists
    io_canary_before = _io_canary()
    spark = get_spark(
        app_name="bench",
        # the UI is off in the engine session (session.py); bench enables it
        # for the REST stage-metrics poll. retainedStages must exceed the
        # whole run's stage count or the cumulative counters would go
        # BACKWARD on eviction and corrupt the per-query deltas.
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
            "spark.ui.retainedJobs": "20000",
        },
    )
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]

    # warmup: JVM JIT + parquet footer cache + whole-stage codegen. A
    # limit(1000) scan leaves the vectorized-reader and project codegen
    # paths cold (first full-scan query then pays ~1.5 s of one-time JIT);
    # a full-table noop write warms exactly what the timed queries use.
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    # one warmup iteration per query (JMH-style), then 3 timed runs whose
    # MEDIAN is the recorded v3 number:
    # the first execution of a plan also pays whole-stage-codegen
    # compilation (Janino), ~1s of one-time JIT that a long-running cluster
    # job pays once per plan, not per batch — and single timed runs on a
    # shared box carry ±50% scheduler noise (observed run-to-run on
    # identical plans), so the minimum of three is the steady-state number.
    # The timed window INCLUDES DataFrame construction, not just the write:
    # with AQE on, building a plan that contains a localCheckpoint executes
    # every upstream query stage eagerly at toRdd-creation time — for the
    # checkpointed queries (n29/n30/n36/n42, q27's sort index) most of the
    # real work happens during "build", and timing only the write
    # undercounted them by an order of magnitude (discovered round 6: n36
    # measured 0.8 s write-only vs ~2 s honest after its hash-family fix,
    # ~20 s before it).
    timings: dict[str, float] = {}
    io: dict[str, dict[str, float]] = {}
    for name in names:
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        samples: list[float] = []
        for i in range(3):
            before = _stage_totals(spark.sparkContext) if i == 2 else None
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            if before is not None:
                after = _stage_totals(spark.sparkContext)
                if after is not None:
                    io[name] = {
                        k: round(after[k] - before[k], 3) for k in after
                    }
        timings[name] = summarize_runs(samples)

    # flagship at scale: decode 1000 grids (~2M points) end-to-end.
    # Generation is outside the timed section; decode+noop is the metric.
    import shutil

    from etl_bom_radiation_spark.grid.decode import decode_grid_directory

    grids = _gen_grids()
    try:
        decode_grid_directory(spark, grids).write.format("noop").mode(
            "overwrite"
        ).save()  # warmup: compile the decode codegen once
        samples = []
        for _ in range(3):
            decoded = decode_grid_directory(spark, grids)
            t0 = time.time()
            decoded.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        timings["grid_decode_1000_files"] = summarize_runs(samples)
    finally:
        shutil.rmtree(grids, ignore_errors=True)

    # maintenance ops (VERDICT r2 #8): partitioned write, small-file
    # compaction, partition reprocess — timed over a 1000-file / ~1.8M-point
    # corpus stamped into ONE hive partition (per-partition compaction is
    # then one real job; the spread-time corpus above benches the decode).
    import tempfile

    from etl_bom_radiation_spark.ingest import (
        compact_partitions,
        reprocess_partition,
        write_points,
    )
    from etl_bom_radiation_spark.workspace import init_workspace

    one_part = _gen_grids(spread_time=False)
    ws_base = tempfile.mkdtemp(prefix="bench_ws_")
    try:
        ws = init_workspace(spark, ws_base)
        for f in os.listdir(one_part):  # archived originals, reprocess source
            os.rename(os.path.join(one_part, f), os.path.join(ws.done_dir, f))
        pts = decode_grid_directory(spark, ws.done_dir)
        t0 = time.time()
        write_points(pts, ws.data_dir)
        timings["maint_partitioned_write"] = round(time.time() - t0, 3)
        # hot-partition fan-out lever: the same corpus lands in ONE hive
        # partition, so the default one-task-per-partition write is a
        # single-writer straggler; files_per_partition=8 salts it across
        # 8 writer tasks (8 files, folded back by compaction later)
        fan_dir = os.path.join(ws_base, "athena_fanout")
        t0 = time.time()
        write_points(pts, fan_dir, files_per_partition=8)
        timings["maint_partitioned_write_fanout"] = round(time.time() - t0, 3)
        write_points(pts, ws.data_dir)  # second batch -> 2 files in the partition
        t0 = time.time()
        n_comp = compact_partitions(spark, ws.data_dir)
        timings["maint_compact_partition"] = round(time.time() - t0, 3)
        assert n_comp == 1, f"expected 1 compacted partition, got {n_comp}"
        part = (
            spark.read.parquet(ws.data_dir)
            .select("year", "month", "day", "hour")
            .first()
        )
        # warm + median-of-3 (r15): reprocess is idempotent (rebuild the
        # same partition), and its single-shot timing conflated the
        # per-plan fixed cost with draw noise — the r14/r15 bench diffs
        # flagged it as a recurring false regression; the v3 statistic
        # the registry entries already use makes it comparable.
        reprocess_partition(spark, ws, part["year"], part["month"], part["day"], part["hour"])
        samples = []
        for _ in range(3):
            t0 = time.time()
            reprocess_partition(spark, ws, part["year"], part["month"], part["day"], part["hour"])
            samples.append(time.time() - t0)
        timings["maint_reprocess_partition"] = summarize_runs(samples)
    finally:
        shutil.rmtree(ws_base, ignore_errors=True)
        shutil.rmtree(one_part, ignore_errors=True)

    # pruning payoff (VERDICT r3 #2): the same reprocess against a MANY-hour
    # archive — rebuild one hour out of ~670 hive partitions. The
    # listing-level glob opens only that hour's ~6 archived files, so this
    # should run ~100x under maint_reprocess_partition above, whose
    # single-partition archive is the worst case (every archived file IS the
    # target hour and must be read regardless).
    spread_src = _gen_grids()
    ws2_base = tempfile.mkdtemp(prefix="bench_ws_spread_")
    probe_dir = tempfile.mkdtemp(prefix="bench_probe_")
    try:
        ws2 = init_workspace(spark, ws2_base)
        for f in os.listdir(spread_src):
            os.rename(os.path.join(spread_src, f), os.path.join(ws2.done_dir, f))
        # untimed setup: decode ONE archived file to learn which hive
        # partition its (timezone-converted) timestamp lands in
        import shutil as _sh

        _sh.copy(
            os.path.join(ws2.done_dir, sorted(os.listdir(ws2.done_dir))[0]),
            probe_dir,
        )
        tgt = (
            decode_grid_directory(spark, probe_dir)
            .select("year", "month", "day", "hour")
            .first()
        )
        # warm + median-of-3 (r15): same statistic as the partition
        # sibling above — the pruned variant's sub-second time is fixed-
        # cost-dominated (6 files decode), exactly where single-shot
        # draws flagged false regressions two rounds running.
        n_rows = reprocess_partition(
            spark, ws2, tgt["year"], tgt["month"], tgt["day"], tgt["hour"]
        )
        samples = []
        for _ in range(3):
            t0 = time.time()
            n_rows = reprocess_partition(
                spark, ws2, tgt["year"], tgt["month"], tgt["day"], tgt["hour"]
            )
            samples.append(time.time() - t0)
        timings["maint_reprocess_pruned"] = summarize_runs(samples)
        assert n_rows > 0, "spread-archive reprocess rebuilt zero rows"
    finally:
        shutil.rmtree(ws2_base, ignore_errors=True)
        shutil.rmtree(spread_src, ignore_errors=True)
        shutil.rmtree(probe_dir, ignore_errors=True)

    # bucketed fact-fact join: the scale lever for recurring joins
    # (scale.write_bucketed / bucketed_join). Setup (bucketed table write)
    # is untimed — it is paid once per table lifetime, not per query; the
    # timed part is q05's join shape reading co-located buckets with ZERO
    # Exchange (plan asserted in tests/test_scale.py::
    # test_bucketed_q05_shape_no_exchange). Compare with q05_inner_join
    # above to see what the shuffle costs.
    from pyspark.sql import functions as F

    from etl_bom_radiation_spark.scale import write_bucketed

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # fact-fact regime: at bench SF the planner would broadcast orders
        # (skipping the bucketed scans); at 100 TB neither fact broadcasts
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(li, "bench_lineitem_b", "l_orderkey", num_buckets=32)
        write_bucketed(o, "bench_orders_b", "o_orderkey", num_buckets=32)

        def _bucketed_q05():
            return bucketed_q05_shape(spark, "bench_lineitem_b", "bench_orders_b")

        _bucketed_q05().write.format("noop").mode("overwrite").save()  # warmup
        samples = []
        for _ in range(3):
            t0 = time.time()
            _bucketed_q05().write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        timings["q05_bucketed_join"] = summarize_runs(samples)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS bench_lineitem_b")
        spark.sql("DROP TABLE IF EXISTS bench_orders_b")

    # skew lever (VERDICT r3 #5): a celebrity key holding ~8M of ~8.2M fact
    # rows vs a 2.5k-row dim, in the SHUFFLE regime (broadcast disabled: at
    # 100 TB a "small" side can exceed the broadcast threshold; when it
    # fits, broadcast remains the first choice and skew is moot). The
    # skewed fact is persisted to scratch parquet as 64 files and read with
    # a small maxPartitionBytes so the join shuffle has ~64 MAP tasks —
    # the many-mapper shape a real cluster has, and a hard requirement for
    # AQE's skew split, which divides a skewed reduce partition by map-
    # output ranges: with one mapper (sf0.1's single parquet file) the hot
    # partition is one indivisible range and AQE silently does nothing.
    # Three plans over identical inputs: plain sort-merge (one straggler
    # reducer owns the hot key), explicit salting (scale.salted_join,
    # salt=16), and AQE skew-split (thresholds scaled so the sf0.1 hot
    # partition trips them, mirroring the ratios a 100 TB hot key hits
    # with defaults).
    from etl_bom_radiation_spark.scale import salted_join

    skew_dir = tempfile.mkdtemp(prefix="bench_skew_")
    (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(
            F.when(F.col("l_orderkey") % 3 != 0, F.lit(1))
            .otherwise(F.col("l_orderkey"))
            .cast("long")
            .alias("k"),
            "l_quantity",
        )
        .withColumn(
            "_rep",
            F.explode(
                F.sequence(F.lit(1), F.when(F.col("k") == 1, 20).otherwise(1))
            ),
        )
        .drop("_rep")
        .repartition(64)
        .write.parquet(f"{skew_dir}/fact")
    )
    dim = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        (F.col("o_orderkey") % 60 == 0) | (F.col("o_orderkey") == 1)
    ).select(F.col("o_orderkey").alias("dk"), "o_orderpriority")

    def _timed_noop(name: str, build, io_name: str | None = None) -> None:
        """Warmup + 3 timed noop-sink runs of ``build()``; records the v3
        median into ``timings[name]`` (plus optional stage-IO deltas)."""
        build().write.format("noop").mode("overwrite").save()  # warmup/codegen
        samples: list[float] = []
        for i in range(3):
            before = (
                _stage_totals(spark.sparkContext)
                if io_name is not None and i == 2
                else None
            )
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            if before is not None:
                after = _stage_totals(spark.sparkContext)
                if after is not None:
                    io[io_name] = {
                        k: round(after[k] - before[k], 3) for k in after
                    }
        timings[name] = summarize_runs(samples)

    _SKEW_KEYS = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.files.maxPartitionBytes",
        "spark.sql.files.openCostInBytes",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    )
    prev_conf = {k: spark.conf.get(k) for k in _SKEW_KEYS}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        li_skew = spark.read.parquet(f"{skew_dir}/fact")

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        _timed_noop("skew_plain_join", lambda: li_skew.join(dim, F.col("k") == F.col("dk"))
        )
        _timed_noop("skew_salted_join", lambda: salted_join(li_skew, dim, "k", "dk", salt=16)
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        _timed_noop("skew_aqe_join", lambda: li_skew.join(dim, F.col("k") == F.col("dk"))
        )
    finally:
        for k, v in prev_conf.items():
            spark.conf.set(k, v)
        shutil.rmtree(skew_dir, ignore_errors=True)

    # hot-bucket dedup skew lever (VERDICT r4 #3): n32's prefix-digest
    # self-join against a corpus where 2500 docs share one boilerplate
    # opening — one bucket holding 2500² verify pairs on a single reducer
    # unless AQE splits it. Same query fn as the declared n32 entry; only
    # the skewJoin toggle differs between the two timings. The pytest twin
    # (tests/test_scale.py::test_truncation_dedup_hot_bucket_aqe_skew_split)
    # asserts the split actually fires AND the result stays exact.
    from etl_bom_radiation_spark.scale import SKEW_SPLIT_CONF, gen_skewed_documents

    skdoc_dir = tempfile.mkdtemp(prefix="bench_skewdoc_")
    prev_conf = {k: spark.conf.get(k) for k in SKEW_SPLIT_CONF}
    try:
        gen_skewed_documents(spark, skdoc_dir, n_hot=2500, n_cold=20000, n_trunc=200)
        for k, v in SKEW_SPLIT_CONF.items():
            spark.conf.set(k, v)
        # r6: the declared query now RE-ASSERTS skewJoin.enabled itself (the
        # production posture), so measuring the unprotected baseline needs a
        # bench-only counter-override AFTER plan build — AQE reads the conf
        # at execution, not at plan build
        def _plain():
            df = qs["n32_truncation_dedup"](spark, skdoc_dir)
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            return df

        _timed_noop("dedup_hot_bucket_plain", _plain)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        _timed_noop("dedup_hot_bucket_skewsplit", lambda: qs["n32_truncation_dedup"](spark, skdoc_dir)
        )
    finally:
        for k, v in prev_conf.items():
            spark.conf.set(k, v)
        shutil.rmtree(skdoc_dir, ignore_errors=True)

    # n31's zero-shuffle lever (documented r4, exercised r5): corpus digest
    # snapshot and incoming batch both bucketed on the digest -> the
    # admission LEFT ANTI reads co-located buckets with no Exchange
    # (plan asserted in tests/test_scale.py::
    # test_bucketed_digest_anti_join_no_exchange). Setup untimed (the
    # snapshot is bucketed once per merge cycle, not per query); broadcast
    # disabled for the fact-fact regime where the lever matters.
    from etl_bom_radiation_spark.scale import write_bucketed

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(
            docs.filter(F.col("doc_id") % 2 == 0)
            .select(F.md5("text").alias("h"))
            .distinct(),
            "bench_corpus_digest_b",
            "h",
            num_buckets=8,
        )
        write_bucketed(
            docs.filter(F.col("doc_id") % 2 == 1).select(
                "doc_id", F.md5("text").alias("h")
            ),
            "bench_batch_digest_b",
            "h",
            num_buckets=8,
        )
        _timed_noop("n31_bucketed_anti_join", lambda: spark.table("bench_batch_digest_b").join(
                spark.table("bench_corpus_digest_b"), "h", "left_anti"
            ),
            io_name="n31_bucketed_anti_join",  # expect shuffle_write ~0
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS bench_corpus_digest_b")
        spark.sql("DROP TABLE IF EXISTS bench_batch_digest_b")

    # persisted-LSH-index arrival cost (VERDICT r8 #3): n49 prices index
    # build + probe as ONE entry; the production claim is that the PROBE is
    # the cheap per-arrival step because the index is pre-built. Price the
    # claim directly: cold = build the index AND probe the arriving decile
    # inside the timer (the n49 shape); warm = the index is built ONCE to
    # scratch outside the timer, each timed run only sketches the batch and
    # probes the persisted parquet (the steady-state arrival path). The gap
    # is the per-arrival saving the update_lsh_index fold preserves by
    # never rebuilding. io: warm shuffle_write stays batch-sized (the index
    # streams map-side through broadcast joins — the plan-asserted
    # contract).
    from etl_bom_radiation_spark.lsh_index import build_lsh_index, probe_lsh_index

    lsh_dir = tempfile.mkdtemp(prefix="bench_lshidx_")
    try:
        docs_lsh = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        lsh_idx_docs = docs_lsh.filter((F.col("doc_id") % 10) != 7)
        lsh_batch = docs_lsh.filter((F.col("doc_id") % 10) == 7)

        def _cold():
            build_lsh_index(spark, lsh_idx_docs, f"{lsh_dir}/cold")
            return probe_lsh_index(spark, f"{lsh_dir}/cold", lsh_batch)

        _timed_noop("lsh_probe_cold", _cold, io_name="lsh_probe_cold")
        build_lsh_index(spark, lsh_idx_docs, f"{lsh_dir}/warm")  # once, untimed
        _timed_noop("lsh_probe_warm", lambda: probe_lsh_index(spark, f"{lsh_dir}/warm", lsh_batch),
            io_name="lsh_probe_warm",
        )

        # sub-batched admission overhead (the broadcast-envelope lever):
        # admit the same arriving decile one-shot vs split into 4
        # id-ordered sub-batches (admit_batch max_docs). Each run folds
        # into a FRESH copy of the warm index (copytree inside the timer,
        # identical in both variants, ~MB here) — the DELTA prices the
        # splitter itself: 3 extra probe/fold rounds of batch-sized work,
        # what an oversized arrival pays to stay inside the broadcast
        # limit.
        from etl_bom_radiation_spark.lsh_index import admit_batch

        # the fold's append-only guard (correctly) refuses the n49 shard's
        # interleaved ids — shift the arriving batch above the index
        admit_src = lsh_batch.withColumn(
            "doc_id", F.col("doc_id") + F.lit(10_000_000)
        )
        n_lsh_batch = admit_src.count()

        def _admit(tag, max_docs):
            def run():
                tgt = f"{lsh_dir}/admit_{tag}_{time.time_ns()}"
                shutil.copytree(f"{lsh_dir}/warm", tgt)
                return admit_batch(spark, tgt, admit_src, max_docs=max_docs)

            return run

        _timed_noop("lsh_admit_oneshot", _admit("one", None), io_name="lsh_admit_oneshot"
        )
        _timed_noop("lsh_admit_split4", _admit("four", max(1, -(-n_lsh_batch // 4))),
            io_name="lsh_admit_split4",
        )
    finally:
        shutil.rmtree(lsh_dir, ignore_errors=True)

    # Z-order clustered-write lever (round 6): two layouts of the same 4.2M
    # synthetic points — range-sorted on lon alone vs Morton-key sorted —
    # then the UNPRIVILEGED-dimension strip predicate (lat-only) that a
    # single-dimension sort cannot prune: every row group's lat envelope is
    # full-range, so the linear layout reads the whole table while the
    # Z-order layout's row groups bound BOTH coordinates and most are
    # skipped on footer stats (the envelope property is proved from parquet
    # footers in tests/test_scale.py; this pair prices it). Writes untimed:
    # clustering is paid once at write, the payoff recurs per query.
    from etl_bom_radiation_spark.scale import zorder_key

    Q9 = 0.001953125  # 2^-9 deg: binary-exact quantum, 2048 cells over 4 deg
    clus_dir = tempfile.mkdtemp(prefix="bench_cluster_")
    try:
        n_side = 2048
        pts4m = spark.range(n_side * n_side).select(
            (110.0 + (F.col("id") % n_side) * Q9).alias("lon"),
            (-46.0 + (F.col("id") / n_side).cast("long") * Q9).alias("lat"),
            (F.col("id") % 997).alias("val"),
        )
        pts4m.repartitionByRange(64, "lon").sortWithinPartitions(
            "lon"
        ).write.parquet(f"{clus_dir}/linear")
        zk = zorder_key(F.col("lon"), F.col("lat"), 110.0, -47.0, Q9)
        pts4m.withColumn("zk", zk).repartitionByRange(64, "zk").sortWithinPartitions(
            "zk"
        ).drop("zk").write.parquet(f"{clus_dir}/zorder")
        lat_strip = (F.col("lat") >= -44.02) & (F.col("lat") < -43.98)

        def _strip_scan(d):
            return lambda: (
                spark.read.parquet(f"{clus_dir}/{d}")
                .filter(lat_strip)
                .agg(F.count(F.lit(1)), F.sum("val"))
            )

        # io_name: records-read is the pruning evidence — the linear layout
        # must scan every row group for the lat-only strip while the
        # Z-order layout skips most on footer stats (wall time at 4M local
        # rows is mostly task overhead; input_records is the 100-TB signal)
        _timed_noop("cluster_scan_linear", _strip_scan("linear"), io_name="cluster_scan_linear"
        )
        _timed_noop("cluster_scan_zorder", _strip_scan("zorder"), io_name="cluster_scan_zorder"
        )

        # file-skipping manifest on the same Z-ordered table (manifest.py).
        # Honest metric: on a clustered layout, ROW-GROUP stats already
        # bound records-read for the bbox (measured: full and pruned both
        # read ~125k of 4.19M records) — the manifest's payoff is the file
        # dimension: the full scan must list and open every file's footer
        # (64 here; millions at 100 TB, where that pass IS the bottleneck)
        # while the manifest-pruned scan starts from only the overlapping
        # files. So alongside wall time, record files_opened per variant.
        from etl_bom_radiation_spark.manifest import build_manifest, pruned_read

        build_manifest(spark, f"{clus_dir}/zorder", ["lon", "lat"])
        bbox = (
            (F.col("lon") >= 112.0)
            & (F.col("lon") < 112.5)
            & (F.col("lat") >= -44.5)
            & (F.col("lat") < -44.0)
        )

        def _full_bbox():
            return (
                spark.read.parquet(f"{clus_dir}/zorder")
                .filter(bbox)
                .agg(F.count(F.lit(1)), F.sum("val"))
            )

        def _pruned_bbox():
            return (
                pruned_read(
                    spark,
                    f"{clus_dir}/zorder",
                    {"lon": (112.0, 112.5), "lat": (-44.5, -44.0)},
                )
                .filter(bbox)
                .agg(F.count(F.lit(1)), F.sum("val"))
            )

        _timed_noop("manifest_bbox_full", _full_bbox, io_name="manifest_bbox_full"
        )
        _timed_noop("manifest_bbox_pruned", _pruned_bbox, io_name="manifest_bbox_pruned"
        )
        io.setdefault("manifest_bbox_full", {})["files_opened"] = len(
            spark.read.parquet(f"{clus_dir}/zorder").inputFiles()
        )
        io.setdefault("manifest_bbox_pruned", {})["files_opened"] = len(
            pruned_read(
                spark,
                f"{clus_dir}/zorder",
                {"lon": (112.0, 112.5), "lat": (-44.5, -44.0)},
            ).inputFiles()
        )
    finally:
        shutil.rmtree(clus_dir, ignore_errors=True)

    # IVF-partitioned ANN storage lever (round 6): the embeddings table
    # persisted as hive partitions cell=N/ keyed by the n37 engine-neutral
    # coarse quantizer, then the same exact-cosine top-k asked two ways —
    # a full scan of the layout vs a probe whose nprobe-cell restriction
    # is applied by Catalyst DYNAMIC PARTITION PRUNING (the probe-cell
    # frame is never collected; the index listing is pruned at runtime).
    # records-read is the 100-TB signal: the probe touches ~nprobe/cells
    # of the corpus at the file-listing level, before any row group IO.
    from etl_bom_radiation_spark.scale import ivf_probe_topk, write_ivf_index

    ivf_dir = tempfile.mkdtemp(prefix="bench_ivf_")
    try:
        write_ivf_index(spark, SF_DIR, f"{ivf_dir}/idx")

        # nprobe=None ranks the FULL layout through the same function, so
        # both entries share one ranking expression by construction
        def _ann_full():
            return ivf_probe_topk(spark, f"{ivf_dir}/idx", SF_DIR, nprobe=None)

        def _ann_dpp():
            return ivf_probe_topk(spark, f"{ivf_dir}/idx", SF_DIR)

        _timed_noop("ann_scan_full", _ann_full, io_name="ann_scan_full")
        _timed_noop("ann_scan_ivf_dpp", _ann_dpp, io_name="ann_scan_ivf_dpp"
        )
        # the stage-delta input_records above are contaminated by AQE
        # stage/broadcast reuse across the best-of-3 runs; record the
        # deterministic pruning evidence instead — rows inside the probed
        # partitions vs the whole layout (the nprobe/cells IO bound that
        # is the lever's 100-TB payoff)
        from etl_bom_radiation_spark.scale import ivf_probe_candidates

        idx_df = spark.read.parquet(f"{ivf_dir}/idx")
        cand_df, _ = ivf_probe_candidates(spark, f"{ivf_dir}/idx", SF_DIR)
        io.setdefault("ann_scan_full", {})["rows_scanned"] = idx_df.count()
        io.setdefault("ann_scan_ivf_dpp", {})["rows_scanned"] = cand_df.count()
    finally:
        shutil.rmtree(ivf_dir, ignore_errors=True)

    # composed corpus-prep pipeline: the operators a training-data pipeline
    # chains (exact dedup -> token-count quality gate -> sequence packing)
    # expressed as ONE plan over ONE scan of the documents table — no
    # re-read between stages, two partitioned-window shuffles total
    # (digest survivor pick, per-source running sum). The per-operator
    # entries above time the stages in isolation; this times the
    # composition Catalyst actually runs in production.
    from pyspark.sql.window import Window

    from etl_bom_radiation_spark.queries.llm_queries import _tokens

    def _corpus_prep():
        docs2 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        w_digest = Window.partitionBy("h").orderBy("doc_id")
        w_pack = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return (
            docs2.withColumn("h", F.md5("text"))
            .withColumn("rn", F.row_number().over(w_digest))
            .filter(F.col("rn") == 1)
            .withColumn("n_tokens", F.size(_tokens(F.col("text"))))
            .filter(F.col("n_tokens") >= 10)
            .withColumn("cum", F.sum("n_tokens").over(w_pack))
            .withColumn("shard", F.expr("cum div 2048"))
            .groupBy("source", "shard")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("shard_tokens"),
            )
        )

    _timed_noop("pipeline_corpus_prep", _corpus_prep, io_name="pipeline_corpus_prep"
    )

    # composed events pipeline: sessionization -> per-day session metrics
    # as ONE plan (the x04 session aggregate rides its single user_id
    # shuffle; the day rollup reshuffles only the collapsed session set,
    # never the event fact) — the events-side sibling of
    # pipeline_corpus_prep.
    def _session_metrics():
        s = qs["x04_sessionization"](spark, SF_DIR)
        return (
            s.withColumn(
                "day", F.to_date(F.timestamp_micros(F.col("start_us")))
            )
            .groupBy("day")
            .agg(
                F.count(F.lit(1)).alias("n_sessions"),
                F.round(F.avg("n_events"), 4).alias("avg_events"),
                F.round(
                    F.avg((F.col("end_us") - F.col("start_us")) / 1e6), 4
                ).alias("avg_duration_s"),
            )
        )

    _timed_noop("pipeline_session_metrics", _session_metrics, io_name="pipeline_session_metrics"
    )

    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    line, full = format_output(
        timings,
        io,
        sf,
        canary=[canary_before, _spin_canary()],
        io_canary=[io_canary_before, _io_canary()],
    )
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), IO_ARTIFACT), "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
