"""Incremental hourly rollup: merged partials must equal the full
recompute, across multiple batches and after compaction."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from etl_bom_radiation_spark.grid.decode import decode_grid_directory
from etl_bom_radiation_spark.streaming import rollup as R

FIXTURES = Path(__file__).resolve().parent.parent / "fixtures" / "grids"


def _full_recompute(points):
    return points.groupBy(*R.KEYS).agg(
        F.count(F.lit(1)).alias("points"),
        F.avg("Radiation").alias("avg_radiation"),
        F.min("Radiation").alias("min_radiation"),
        F.max("Radiation").alias("max_radiation"),
    )


def _as_dict(df):
    return {
        tuple(r[k] for k in R.KEYS): (
            r["points"],
            round(r["avg_radiation"], 9),
            r["min_radiation"],
            r["max_radiation"],
        )
        for r in df.collect()
    }


def test_rollup_matches_full_recompute(spark, tmp_path):
    rdir = str(tmp_path / "rollup")
    files = sorted(FIXTURES.glob("*.txt"))

    # batch 1: first file; batch 2: second file; batch 3: first file AGAIN
    # (same hour touched twice -> partials for that hour must merge)
    batches = [files[0], files[1], files[0]]
    all_points = []
    for f in batches:
        pts = decode_grid_directory(spark, str(f))
        R.append_hourly_partials(pts, rdir)
        all_points.append(pts)

    union = all_points[0].unionAll(all_points[1]).unionAll(all_points[2])
    assert _as_dict(R.read_hourly_rollup(spark, rdir)) == _as_dict(_full_recompute(union))

    # compaction folds partial rows but must not change the merged result
    before = _as_dict(R.read_hourly_rollup(spark, rdir))
    n_partials_before = spark.read.parquet(rdir).count()
    R.compact_rollup(spark, rdir)
    assert spark.read.parquet(rdir).count() < n_partials_before
    assert _as_dict(R.read_hourly_rollup(spark, rdir)) == before


def test_rollup_batch_generation_overwrite_idempotent(spark, tmp_path):
    """A re-delivered streaming batch rewrites its own gen=batch<id>
    generation instead of double-appending its partials (the ingest_stream
    crash window between rollup append and commit marker); a genuinely new
    batch id still adds."""
    rdir = str(tmp_path / "rollup")
    pts = decode_grid_directory(spark, str(sorted(FIXTURES.glob("*.txt"))[0]))
    R.append_hourly_partials(pts, rdir, batch_id=0)
    before = _as_dict(R.read_hourly_rollup(spark, rdir))
    R.append_hourly_partials(pts, rdir, batch_id=0)  # replay: overwrite
    assert _as_dict(R.read_hourly_rollup(spark, rdir)) == before
    R.append_hourly_partials(pts, rdir, batch_id=1)  # new batch: adds
    after = _as_dict(R.read_hourly_rollup(spark, rdir))
    for k in before:
        assert after[k][0] == 2 * before[k][0]


def test_rollup_crash_window_recovery(spark, tmp_path):
    """code-review r3: a crash between compact_rollup's two renames leaves
    rollup_dir absent and the previous generation staged aside; every
    entry point must restore it instead of silently recreating an empty
    dir."""
    import os
    import shutil

    rdir = str(tmp_path / "rollup")
    pts = decode_grid_directory(spark, str(sorted(FIXTURES.glob("*.txt"))[0]))
    R.append_hourly_partials(pts, rdir)
    before = _as_dict(R.read_hourly_rollup(spark, rdir))

    # simulate the crash window: rollup_dir renamed aside, swap-in never ran
    staged = str(tmp_path / ".rollup.compact_old")
    os.rename(rdir, staged)
    assert not os.path.exists(rdir)

    # a new batch append must first heal, then append — not recreate empty
    R.append_hourly_partials(pts, rdir)
    merged = _as_dict(R.read_hourly_rollup(spark, rdir))
    assert set(merged) == set(before)
    # the healed dir holds BOTH generations of partials (counts doubled)
    for k in before:
        assert merged[k][0] == 2 * before[k][0]

    # and a reader alone heals too
    shutil.rmtree(str(tmp_path / "rollup"))
    R.append_hourly_partials(pts, rdir)
    os.rename(rdir, staged)
    assert _as_dict(R.read_hourly_rollup(spark, rdir)) == before


def test_rollup_live_swap_not_mistaken_for_crash(spark, tmp_path):
    """ADVICE r3: while the in-progress marker is FRESH, a concurrent entry
    point must wait the swap out — not rename the staged-aside generation
    back mid-swap. Simulated: marker + staged state exist; a 'compactor'
    thread completes the swap shortly after; the reader arrives mid-window
    and must see the post-swap generation with no spurious recovery."""
    import os
    import threading
    import time

    rdir = str(tmp_path / "rollup")
    pts = decode_grid_directory(spark, str(sorted(FIXTURES.glob("*.txt"))[0]))
    R.append_hourly_partials(pts, rdir)
    before = _as_dict(R.read_hourly_rollup(spark, rdir))

    staged = str(tmp_path / ".rollup.compact_old")
    marker = str(tmp_path / ".rollup.compact_inprogress")
    os.rename(rdir, staged)  # mid-swap: root absent, old present
    with open(marker, "w"):
        pass  # fresh marker: swap is live

    def finish_swap():
        time.sleep(0.5)
        os.rename(staged, rdir)  # compactor completes the swap-in
        os.remove(marker)

    t = threading.Thread(target=finish_swap)
    t.start()
    try:
        t0 = time.time()
        after = _as_dict(R.read_hourly_rollup(spark, rdir))
        waited = time.time() - t0
    finally:
        t.join()
    assert after == before
    assert waited >= 0.4  # it actually waited for the live swap
    assert not os.path.exists(staged) and not os.path.exists(marker)


def test_rollup_stale_marker_healed(spark, tmp_path):
    """A marker older than the lease is a crashed compactor's leftover:
    recovery removes it and heals the staged-aside generation."""
    import os
    import time

    rdir = str(tmp_path / "rollup")
    pts = decode_grid_directory(spark, str(sorted(FIXTURES.glob("*.txt"))[0]))
    R.append_hourly_partials(pts, rdir)
    before = _as_dict(R.read_hourly_rollup(spark, rdir))

    staged = str(tmp_path / ".rollup.compact_old")
    marker = str(tmp_path / ".rollup.compact_inprogress")
    os.rename(rdir, staged)
    with open(marker, "w"):
        pass
    old_t = time.time() - 2 * (R._SWAP_LEASE_MS / 1000)
    os.utime(marker, (old_t, old_t))  # age the marker past the lease

    assert _as_dict(R.read_hourly_rollup(spark, rdir)) == before
    assert not os.path.exists(marker)


def _one_point(spark, rad: int):
    return spark.createDataFrame(
        [("GLOBAL", 2018, 4, 1, 11, rad)],
        "RadiationType string, year int, month int, day int, hour int, Radiation int",
    )


def test_append_backs_off_while_compaction_fence_up(spark, tmp_path):
    """The appender side of the r5 fence: with the compactor's in-progress
    marker up, a partial append must NOT start its write (its generation
    could ride the staged-aside dir into fs.delete(old)) — it backs off
    until the marker clears, then lands normally."""
    import os
    import threading
    import time

    rdir = str(tmp_path / "rollup")
    R.append_hourly_partials(_one_point(spark, 5), rdir)
    marker = str(tmp_path / ".rollup.compact_inprogress")
    with open(marker, "w"):
        pass

    done = threading.Event()

    def blocked_append():
        R.append_hourly_partials(_one_point(spark, 7), rdir)
        done.set()

    t = threading.Thread(target=blocked_append)
    t.start()
    try:
        assert not done.wait(1.5), "append proceeded under a fresh fence"
        os.remove(marker)
        assert done.wait(30), "append never completed after fence cleared"
    finally:
        t.join()
    got = _as_dict(R.read_hourly_rollup(spark, rdir))
    assert got[("GLOBAL", 2018, 4, 1, 11)] == (2, round(6.0, 9), 5, 7)


def test_compaction_concurrent_with_live_appender(spark, tmp_path):
    """VERDICT r4 #8, end-to-end: compact_rollup racing a LIVE appender
    under real interleaving. The fence (marker up before the fold's
    listing + drain of per-append leases) means no appended generation can
    be destroyed by the directory swap and no append can double-land —
    after the dust settles the rollup totals are exactly the sum of every
    append that returned."""
    import threading

    rdir = str(tmp_path / "rollup")
    n_appends = 12
    R.append_hourly_partials(_one_point(spark, 100), rdir)  # dir exists

    errors: list[Exception] = []

    def appender():
        try:
            for i in range(1, n_appends + 1):
                R.append_hourly_partials(_one_point(spark, i), rdir)
        except Exception as exc:  # pragma: no cover - failure surface
            errors.append(exc)

    t = threading.Thread(target=appender)
    t.start()
    n_compactions = 0
    try:
        while t.is_alive():
            R.compact_rollup(spark, rdir)
            n_compactions += 1
    finally:
        t.join()
    assert not errors, errors
    assert n_compactions >= 2, "appender finished before any real interleaving"
    R.compact_rollup(spark, rdir)  # final fold over whatever remained
    got = _as_dict(R.read_hourly_rollup(spark, rdir))
    n = n_appends + 1
    total = 100 + sum(range(1, n_appends + 1))
    assert got[("GLOBAL", 2018, 4, 1, 11)] == (
        n,
        round(total / n, 9),
        1,
        100,
    )


def test_slow_heartbeated_lease_survives_drain_dead_lease_reaped(
    spark, tmp_path, monkeypatch
):
    """code-review r5: an appender slower than the lease period must not be
    mistaken for a crashed one — its heartbeat keeps the lease fresh, and
    the compactor's drain waits instead of deleting it mid-write. A lease
    with no heartbeat past the period IS a crashed appender's and is
    reaped promptly."""
    import os
    import threading
    import time

    monkeypatch.setattr(R, "_SWAP_LEASE_MS", 1000)
    rdir = str(tmp_path / "rollup")
    R.append_hourly_partials(_one_point(spark, 1), rdir)
    fs, root, *_ = R._swap_paths(spark, rdir)
    jvm = spark._jvm
    live = jvm.org.apache.hadoop.fs.Path(str(tmp_path / ".rollup.append_live"))
    fs.create(live, True).close()

    done = threading.Event()

    def drain():
        R._drain_append_leases(spark, rdir)
        done.set()

    t = threading.Thread(target=drain)
    with R._heartbeat(fs, live):
        t.start()
        # well past the 1 s lease: drain must still be waiting on the
        # heartbeated (fresh) lease, not have deleted it
        assert not done.wait(2.5), "drain reaped a live, heartbeated lease"
        assert os.path.exists(str(tmp_path / ".rollup.append_live"))
    fs.delete(live, False)  # appender finishes (heartbeat already stopped)
    assert done.wait(30), "drain never finished after the lease was released"
    t.join()

    # dead lease: no heartbeat, aged past the period -> reaped, drain returns
    dead = str(tmp_path / ".rollup.append_dead")
    with open(dead, "w"):
        pass
    old_t = time.time() - 5
    os.utime(dead, (old_t, old_t))
    t0 = time.time()
    R._drain_append_leases(spark, rdir)
    assert time.time() - t0 < 5
    assert not os.path.exists(dead)


def test_recover_never_heals_under_a_fresh_marker(spark, tmp_path, monkeypatch):
    """ADVICE r5: when the bounded wait expires while the compaction marker
    is STILL fresh (a legitimately heartbeated fold longer than the wait),
    _recover_rollup must return WITHOUT running the old->root heal — healing
    at that instant could land inside the compactor's swap window and rename
    the staged-aside generation back mid-swap."""
    import os
    import threading
    import time

    monkeypatch.setattr(R, "_SWAP_LEASE_MS", 1000)
    rdir = str(tmp_path / "rollup")
    R.append_hourly_partials(_one_point(spark, 1), rdir)

    staged = str(tmp_path / ".rollup.compact_old")
    marker = str(tmp_path / ".rollup.compact_inprogress")
    os.rename(rdir, staged)  # mid-swap: root absent, old present
    with open(marker, "w"):
        pass  # fence up BEFORE recovery starts (no thread-start race)
    stop = threading.Event()

    def keep_fresh():  # the live compactor's heartbeat
        while not stop.wait(0.1):
            with open(marker, "w"):
                pass

    t = threading.Thread(target=keep_fresh, daemon=True)
    t.start()
    try:
        t0 = time.time()
        R._recover_rollup(spark, rdir)
        waited = time.time() - t0
    finally:
        stop.set()
        t.join()
    # waited out the 2x-lease bound, then declined to heal
    assert waited >= 1.8
    assert not os.path.exists(rdir), "healed old->root under a fresh marker"
    assert os.path.exists(staged)
    os.rename(staged, rdir)  # restore for cleanliness
    os.remove(marker)


def test_second_compactor_fails_instead_of_coopting_live_fence(
    spark, tmp_path, monkeypatch
):
    """ADVICE r5: compact_rollup takes its fence with an atomic
    create-if-absent — a second compactor arriving while a live (fresh,
    heartbeated) fence is up must raise, not overwrite the marker and race
    the first compactor's swap."""
    import threading
    import time

    import pytest

    monkeypatch.setattr(R, "_SWAP_LEASE_MS", 1000)
    rdir = str(tmp_path / "rollup")
    R.append_hourly_partials(_one_point(spark, 1), rdir)

    marker = str(tmp_path / ".rollup.compact_inprogress")
    with open(marker, "w"):
        pass  # fence up BEFORE the second compactor starts
    stop = threading.Event()

    def keep_fresh():  # first compactor holds + heartbeats the fence
        while not stop.wait(0.1):
            with open(marker, "w"):
                pass

    t = threading.Thread(target=keep_fresh, daemon=True)
    t.start()
    try:
        with pytest.raises(OSError, match="already in progress"):
            R.compact_rollup(spark, rdir)
    finally:
        stop.set()
        t.join()
    import os

    os.remove(marker)
    # with the fence gone the same call succeeds
    R.compact_rollup(spark, rdir)
    before = _as_dict(R.read_hourly_rollup(spark, rdir))
    assert before


def test_recover_heal_rename_failure_raises_keeps_generations(
    spark, tmp_path, monkeypatch
):
    """ADVICE r10 discipline on the heal path: _recover_rollup's
    old->root restore used to ignore fs.rename's boolean — a rename
    failing WITHOUT throwing would leave root missing while the heal
    proceeded to delete the folded tmp and return as if done (readers
    then fail on the missing dir with no signal why).  It must raise,
    leaving the staged-aside generation AND the folded tmp intact so
    the next entry point retries the restore."""
    import os

    import pytest

    from tests.conftest import LyingFS

    rdir = str(tmp_path / "rollup")
    pts = decode_grid_directory(spark, str(sorted(FIXTURES.glob("*.txt"))[0]))
    R.append_hourly_partials(pts, rdir)
    before = _as_dict(R.read_hourly_rollup(spark, rdir))

    # crash window: root staged aside, a (stale) folded tmp present
    staged = str(tmp_path / ".rollup.compact_old")
    folded_tmp = str(tmp_path / ".rollup.compact_tmp")
    os.rename(rdir, staged)
    os.makedirs(folded_tmp)

    real_swap_paths = R._swap_paths

    def lying(s, d):
        fs, root, tmp, old, marker = real_swap_paths(s, d)
        return LyingFS(fs, fail_renames=1), root, tmp, old, marker

    monkeypatch.setattr(R, "_swap_paths", lying)
    with pytest.raises(OSError, match="could not restore"):
        R._recover_rollup(spark, rdir)
    # nothing destroyed: both the staged generation and the tmp survive
    assert os.path.exists(staged) and os.path.exists(folded_tmp)
    assert not os.path.exists(rdir)

    # an honest retry heals: partials restored, stale tmp discarded
    monkeypatch.setattr(R, "_swap_paths", real_swap_paths)
    assert _as_dict(R.read_hourly_rollup(spark, rdir)) == before
    assert os.path.exists(rdir)
    assert not os.path.exists(staged) and not os.path.exists(folded_tmp)
