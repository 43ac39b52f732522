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
