"""Guards on bench.py's printed JSON line (VERDICT r6 task #1).

The driver captures only ~2000 chars of bench stdout and json.loads the
final line; round 6's line (64 timings + nested io_mb dicts) overflowed
that and the round lost its driver-recorded perf evidence entirely
(``BENCH_r06.json parsed: null``).  These tests pin the contract: the
line round-trips, carries the cross-round fields, and stays under budget
even if the registry triples — growth lands in the BENCH_IO.json side
artifact, never on the line."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench

#: hard stdout-capture budget with headroom (driver truncates ~2000)
LINE_BUDGET = 1500


def _fake_run(n_queries: int) -> tuple[str, dict]:
    """Simulate a bench run with n_queries worst-case-width entries."""
    timings = {f"q{i:02d}_some_longish_query_name_{i}": 123.456 for i in range(n_queries)}
    for name in bench.PRINTED_SET:
        timings[name] = 99.999
    io = {n: {"shuffle_read_mb": 1234.567, "shuffle_write_mb": 1234.567,
              "input_mb": 99999.999, "output_mb": 99999.999} for n in timings}
    return bench.format_output(
        timings,
        io,
        sf=0.1,
        canary=[99.999, 99.999],
        io_canary=[88.888, 88.888],
    )


def test_line_roundtrips_and_stays_small():
    line, full = _fake_run(200)  # ~3x the current registry
    assert len(line) < LINE_BUDGET, f"{len(line)} chars — driver capture would truncate"
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["unit"] == "sec"
    assert parsed["methodology"] == bench.METHODOLOGY
    assert parsed["common_set_n"] == len(bench.COMMON_SET)
    assert parsed["queries_n"] == 200 + len(bench.PRINTED_SET)
    assert parsed["detail"] == bench.IO_ARTIFACT
    # the CPU canary pair rides the line (box-noise self-description,
    # DRIFT_r10) and the full artifact carries it too
    assert parsed["spin"] == [99.999, 99.999] == full["spin"]
    # ...as does the disk canary pair (DRIFT_r11: the spin canary alone
    # does not normalize the basket — identical code read 8.42 vs 9.76 s
    # under the same spin value, so disk contention rides the line too)
    assert parsed["io_spin"] == [88.888, 88.888] == full["io_spin"]
    # io detail never rides the line
    assert "io_mb" not in parsed and "io_mb" in full
    # v3-only (VERDICT r12 #1): the r12 transition round's dual v2 record
    # is retired — no stale v2 field may reappear on the line or in the
    # artifact
    assert parsed["methodology"] == "build+execute v3, median-of-3"
    for k in ("common_set_total_v2", "methodology_v2", "queries_v2"):
        assert k not in parsed and k not in full


def test_line_carries_frozen_basket_and_flagship():
    line, full = _fake_run(50)
    q = json.loads(line)["queries"]
    assert set(q) == set(bench.PRINTED_SET)
    assert "grid_decode_1000_files" in q
    # common_set_total sums exactly the frozen basket from the full dict
    want = round(sum(full["queries"][n] for n in bench.COMMON_SET), 3)
    assert json.loads(line)["common_set_total"] == want


def test_full_artifact_is_a_superset_of_the_line():
    line, full = _fake_run(50)
    parsed = json.loads(line)
    assert set(full["queries"]) >= set(parsed["queries"])
    for n, v in parsed["queries"].items():
        assert full["queries"][n] == v
    assert full["value"] == parsed["value"]
    assert full["methodology"] == parsed["methodology"]


def test_summarize_runs_median():
    """Locks the v3 statistic (VERDICT r11 #1): the recorded number is
    the MEDIAN of the timed runs — one outlier per side discarded."""
    assert bench.summarize_runs([3.0, 1.0, 2.0]) == 2.0
    # a single contended outlier no longer drags the recorded number
    assert bench.summarize_runs([9.9, 1.1, 1.2]) == 1.2
    # nor does a single lucky fast run define it
    assert bench.summarize_runs([0.2, 1.1, 1.2]) == 1.1
    assert bench.summarize_runs([5.0]) == 5.0  # single-run entries
    assert bench.summarize_runs([4.0, 1.0]) == 2.5
    # rounding matches the artifact convention (3 dp)
    assert bench.summarize_runs([1.23456, 1.23467, 9.0]) == 1.235


def test_format_output_never_carries_v2_fields():
    """The v2 dual record is retired (VERDICT r12 #1) — format_output no
    longer even accepts a timings_v2 argument, and its output carries no
    v2 field anywhere."""
    import inspect

    assert "timings_v2" not in inspect.signature(bench.format_output).parameters
    timings = {n: 1.0 for n in bench.PRINTED_SET}
    line, full = bench.format_output(timings, {}, sf=0.1)
    parsed = json.loads(line)
    for k in ("common_set_total_v2", "methodology_v2", "queries_v2"):
        assert k not in parsed and k not in full


# --------------------------------------------------------- bench_diff tool

from tools import bench_diff  # noqa: E402


def test_bench_diff_uniform_shift_is_not_a_regression():
    """The box signature (DRIFT/VERDICT r12): every entry moves together.
    A 20% across-the-board slowdown classifies uniform, flags nothing."""
    old = {f"q{i}": 1.0 for i in range(10)}
    new = {f"q{i}": 1.2 for i in range(10)}
    r = bench_diff.classify(old, new)
    assert r["verdict"] == "uniform"
    assert r["median_ratio"] == 1.2
    assert r["out_of_band"] == [] and r["regressions"] == []


def test_bench_diff_targeted_drift_is_flagged():
    """One entry 2x slower while the basket holds: targeted, regression."""
    old = {f"q{i}": 1.0 for i in range(10)}
    new = {f"q{i}": 1.0 for i in range(10)}
    new["q3"] = 2.0
    r = bench_diff.classify(old, new)
    assert r["verdict"] == "targeted"
    assert r["out_of_band"] == ["q3"] and r["regressions"] == ["q3"]


def test_bench_diff_targeted_improvement_is_not_a_regression():
    """An entry much FASTER than the basket is out-of-band (worth a look)
    but never a regression — only the slow side can fail the run.
    VERDICT r13: faster-side-ONLY out-of-band gets its own verdict so a
    skimmed one-word reading can't mistake improvement spread for drift
    (the r12->r13 driver pair said "targeted" with regressions=[])."""
    old = {f"q{i}": 1.0 for i in range(10)}
    new = {f"q{i}": 1.0 for i in range(10)}
    new["q3"] = 0.4
    r = bench_diff.classify(old, new)
    assert r["out_of_band"] == ["q3"] and r["regressions"] == []
    assert r["verdict"] == "uniform+improvements"


def test_bench_diff_three_way_verdict_classification():
    """uniform (no outliers) / uniform+improvements (fast-side only) /
    targeted (ANY slow-side outlier, even alongside fast ones)."""
    old = {f"q{i}": 1.0 for i in range(10)}
    assert bench_diff.classify(old, dict(old))["verdict"] == "uniform"

    fast = dict(old)
    fast["q2"], fast["q5"] = 0.5, 0.7
    r = bench_diff.classify(old, fast)
    assert r["verdict"] == "uniform+improvements"
    assert r["regressions"] == [] and set(r["out_of_band"]) == {"q2", "q5"}

    mixed = dict(fast)
    mixed["q8"] = 2.0
    r = bench_diff.classify(old, mixed)
    assert r["verdict"] == "targeted" and r["regressions"] == ["q8"]

    # slow-side out-of-band but under --targeted: still "targeted"
    # (someone should look), just not a failing regression
    slowish = dict(old)
    slowish["q4"] = 1.2
    r = bench_diff.classify(old, slowish, band=0.15, targeted=0.25)
    assert r["verdict"] == "targeted" and r["regressions"] == []


def test_bench_diff_mixed_shift_plus_regression():
    """A uniform box slowdown must not mask a genuinely targeted one:
    basket 1.3x, one entry 2.6x — the median absorbs the former, the
    deviation convicts the latter."""
    old = {f"q{i}": 1.0 for i in range(10)}
    new = {f"q{i}": 1.3 for i in range(10)}
    new["q7"] = 2.6
    r = bench_diff.classify(old, new)
    assert r["regressions"] == ["q7"]
    assert abs(r["median_ratio"] - 1.3) < 1e-9


def test_bench_diff_registry_churn_reported_not_classified():
    old = {"a": 1.0, "gone": 1.0}
    new = {"a": 1.0, "fresh": 1.0}
    r = bench_diff.classify(old, new)
    assert r["added"] == ["fresh"] and r["removed"] == ["gone"]
    assert [e["name"] for e in r["entries"]] == ["a"]


def test_bench_diff_canary_gate():
    assert abs(bench_diff.pair_disagreement([1.0, 1.05]) - 0.05 / 1.05) < 1e-12
    assert bench_diff.pair_disagreement(None) is None
    assert bench_diff.pair_disagreement([0.0, 1.0]) is None
    quiet = bench_diff.canary_report({"spin": [1.0, 1.01], "io_spin": [0.2, 0.21]})
    assert quiet["quiet"] is True
    loud = bench_diff.canary_report({"spin": [1.0, 1.5], "io_spin": [0.2, 0.21]})
    assert loud["quiet"] is False
    # canary-less artifacts (pre-r10) are not disqualified
    assert bench_diff.canary_report({})["quiet"] is True


def test_bench_diff_main_fails_only_when_quiet(tmp_path):
    """End-to-end exit-code contract: targeted drift >25% fails ONLY when
    both captures' canary pairs are quiet."""
    import json as _json

    def art(path, queries, spin):
        p = tmp_path / path
        p.write_text(_json.dumps({
            "queries": queries, "spin": spin, "io_spin": [0.2, 0.2],
            "methodology": "build+execute v3, median-of-3",
        }))
        return str(p)

    old_q = {f"q{i}": 1.0 for i in range(10)}
    bad_q = dict(old_q, q3=2.0)
    o = art("old.json", old_q, [1.0, 1.0])
    n_quiet = art("new_quiet.json", bad_q, [1.0, 1.0])
    n_loud = art("new_loud.json", bad_q, [1.0, 1.5])
    assert bench_diff.main([o, n_quiet]) == 1
    assert bench_diff.main([o, n_loud]) == 0  # contended: cannot convict
    ok = art("new_ok.json", old_q, [1.0, 1.0])
    assert bench_diff.main([o, ok]) == 0


def test_bench_diff_reads_driver_wrapper(tmp_path):
    """The driver's BENCH_r{N}.json wraps the line under 'parsed'."""
    import json as _json

    p = tmp_path / "wrapped.json"
    p.write_text(_json.dumps({"n": 12, "parsed": {"queries": {"a": 1.0}}}))
    assert bench_diff.load_artifact(str(p))["queries"] == {"a": 1.0}


def test_bench_diff_zero_baseline_reported_not_silently_dropped():
    """A 0.0 baseline (sub-0.5ms at 3dp rounding) has no ratio — the
    entry must surface in 'unratioable', never vanish (code-review r13:
    a regression on such an entry was invisible and exited 0)."""
    old = {f"q{i}": 1.0 for i in range(5)}
    old["tiny"] = 0.0
    new = dict(old, tiny=5.0)
    r = bench_diff.classify(old, new)
    assert r["unratioable"] == ["tiny"]
    assert all(e["name"] != "tiny" for e in r["entries"])


def test_bench_diff_zero_median_does_not_crash():
    """All-zero new-side timings: median ratio 0 — zero-ratio entries
    moved with the basket, a nonzero one is flagged, and there is no
    ZeroDivisionError (code-review r13)."""
    old = {f"q{i}": 1.0 for i in range(4)}
    new = {f"q{i}": 0.0 for i in range(4)}
    r = bench_diff.classify(old, new)
    assert r["verdict"] == "uniform" and r["median_ratio"] == 0.0
    new["q2"] = 3.0
    r2 = bench_diff.classify(old, new)
    assert "q2" in r2["regressions"]


def test_bench_diff_markdown_goes_to_stdout(tmp_path, capsys):
    """--markdown exists to capture the table into DRIFT_r*.md — it must
    land on stdout, not stderr (code-review r13)."""
    import json as _json

    q = {"a": 1.0}
    for nm in ("o.json", "n.json"):
        (tmp_path / nm).write_text(_json.dumps({"queries": q}))
    bench_diff.main([str(tmp_path / "o.json"), str(tmp_path / "n.json"), "--markdown"])
    cap = capsys.readouterr()
    assert "| entry |" in cap.out and "| entry |" not in cap.err


def test_bench_diff_second_pass_edges():
    """Second-review fixes (r13): a null canary element (the pre-r10
    [null, a] artifact shape) is absent-equivalent for pair_disagreement
    but a PRESENT degenerate pair is never quiet; a regression is
    out-of-band by definition even with --targeted below --band; and
    verdict/exit can no longer contradict each other."""
    assert bench_diff.pair_disagreement([None, 1.2]) is None  # no crash
    assert bench_diff.pair_disagreement([1.2]) is None
    # present-but-degenerate pair: carries no evidence of quiet
    assert bench_diff.canary_report({"spin": [None, 1.2]})["quiet"] is False
    assert bench_diff.canary_report({"spin": [0.0, 0.9]})["quiet"] is False
    # absent pair: still not disqualifying
    assert bench_diff.canary_report({})["quiet"] is True
    # targeted < band: the +30% entry is both regression AND out-of-band
    old = {f"q{i}": 1.0 for i in range(9)}
    new = dict(old, q3=1.3)
    r = bench_diff.classify(old, new, band=0.5, targeted=0.2)
    assert r["regressions"] == ["q3"]
    assert "q3" in r["out_of_band"] and r["verdict"] == "targeted"
