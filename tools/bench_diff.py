#!/usr/bin/env python
"""Mechanical cross-round bench comparison (VERDICT r12 #2).

The v3 per-entry medians make round-over-round regression detection
meaningful, but the judgment call — "uniform shift = box noise, targeted
drift = code" — was prose in every round's VERDICT/DRIFT.  This tool
makes it mechanical:

    python tools/bench_diff.py BENCH_r12.json BENCH_r13.json
    python tools/bench_diff.py BENCH_r12.json my_run.json --markdown

* loads two bench artifacts (either the driver's ``BENCH_r{N}.json``
  wrapper — the line lives under ``parsed`` — or a raw printed line / a
  full BENCH_IO-style dict),
* checks BOTH captures' canary pairs (CPU spin + disk io_spin; a >10%
  within-run disagreement means that capture itself saw contention —
  DRIFT_r11's convention),
* prints the per-entry delta table over the shared query set,
* classifies: **uniform** (every entry's ratio sits within a band around
  the median ratio — the whole basket moved together, which is what host
  contention does to identical code: r12 measured every entry −4%..−28%
  on an untouched basket) vs **targeted** (specific entries out of band —
  what a plan regression does),
* exits nonzero ONLY on targeted drift beyond ``--targeted`` (default
  25% slower than the basket's common shift) when both captures' canary
  pairs are quiet — a noisy capture cannot convict code, and a uniform
  shift never does.

The classification core is pure (``pair_disagreement`` / ``classify``)
and unit-tested in tests/test_bench_output.py.
"""

from __future__ import annotations

import argparse
import json
import sys

#: within-run canary-pair disagreement above which a capture is flagged
#: as contended (the DRIFT_r11 "compare only when canaries agree" rule)
CANARY_BAND = 0.10

#: an entry is out-of-band when its ratio deviates from the basket's
#: median ratio by more than this (relative); only slower-than-basket
#: outliers beyond --targeted can fail the run
DEFAULT_BAND = 0.15
DEFAULT_TARGETED = 0.25


def load_artifact(path: str) -> dict:
    """A bench record from any of its on-disk shapes: the driver wrapper
    (``{"n": .., "parsed": {line}}``), the raw printed line, or the full
    BENCH_IO artifact — all expose ``queries``/``spin``/``io_spin``."""
    with open(path) as fh:
        data = json.load(fh)
    rec = data.get("parsed") if isinstance(data.get("parsed"), dict) else data
    if not isinstance(rec.get("queries"), dict):
        raise SystemExit(f"{path}: no 'queries' dict — not a bench artifact")
    return rec


def pair_disagreement(pair) -> float | None:
    """Relative disagreement of a before/after canary pair — None when
    the pair is absent or degenerate (wrong length, null element — the
    pre-ADVICE-r10 programmatic-mains shape printed [null, a] —, or
    zero/negative readings)."""
    if not pair or len(pair) != 2:
        return None
    a, b = pair
    if not all(isinstance(x, (int, float)) and x > 0 for x in (a, b)):
        return None
    return abs(a - b) / max(a, b)


def canary_report(rec: dict) -> dict:
    """{spin: x, io_spin: y, quiet: bool} for one capture.  An ABSENT
    pair does not disqualify (old artifacts predate the canaries), but a
    present pair must be valid AND agreeing: a disagreeing pair marks
    the capture contended, and a present-but-degenerate one (null/zero
    element, wrong length) carries no evidence of quiet — it must not
    let a capture convict code (code-review r13)."""
    out = {}
    quiet = True
    for key, field in (("spin", "spin_disagreement"), ("io_spin", "io_disagreement")):
        pair = rec.get(key)
        d = pair_disagreement(pair)
        out[field] = d
        if pair is None:
            continue  # absent: pre-canary artifact, not disqualifying
        if d is None or d > CANARY_BAND:
            quiet = False  # degenerate or disagreeing
    out["quiet"] = quiet
    return out


def classify(
    old_q: dict[str, float],
    new_q: dict[str, float],
    band: float = DEFAULT_BAND,
    targeted: float = DEFAULT_TARGETED,
) -> dict:
    """The mechanical uniform-vs-targeted verdict over the shared keys.

    Per entry: ratio = new/old.  The basket's common shift is the MEDIAN
    ratio (robust — up to half the basket can drift without moving it).
    An entry is out-of-band when its ratio deviates from that median by
    more than ``band`` relative; it is a *regression suspect* when it is
    out-of-band on the SLOW side by more than ``targeted``.  Entries
    present on only one side are reported, never classified (a renamed
    or new bench entry is registry churn, not drift)."""
    shared = sorted(set(old_q) & set(new_q))
    usable = [k for k in shared if old_q[k] > 0]
    # a 0.0 baseline (sub-0.5ms at the 3dp artifact rounding) makes the
    # ratio undefined — report the names instead of silently excluding
    # them (the repo's no-silent-caps discipline; code-review r13)
    unratioable = [k for k in shared if old_q[k] <= 0]
    entries = []
    ratios = []
    for k in usable:
        r = new_q[k] / old_q[k]
        ratios.append(r)
        entries.append({"name": k, "old": old_q[k], "new": new_q[k], "ratio": round(r, 4)})
    if not ratios:
        return {
            "entries": [], "median_ratio": None, "out_of_band": [],
            "regressions": [], "verdict": "no-overlap",
            "unratioable": unratioable,
            "added": sorted(set(new_q) - set(old_q)),
            "removed": sorted(set(old_q) - set(new_q)),
        }
    s = sorted(ratios)
    n = len(s)
    med = s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2
    out, regressions = [], []
    for e in entries:
        # med == 0 (most of the basket's NEW timings round to 0.0): a
        # zero-ratio entry moved with the basket; a nonzero one is
        # infinitely slower than it — classify, never divide by zero
        if med > 0:
            dev = e["ratio"] / med - 1
        else:
            dev = 0.0 if e["ratio"] == 0 else float("inf")
        e["vs_basket"] = round(dev, 4) if dev != float("inf") else dev
        is_regression = dev > targeted
        if is_regression:
            regressions.append(e["name"])
        # regressions are out-of-band BY DEFINITION even when --targeted
        # is set below --band: verdict and exit code must never
        # contradict each other (code-review r13)
        if abs(dev) > band or is_regression:
            out.append(e["name"])
    # three-way verdict (VERDICT r13): faster-side-only out-of-band is
    # improvement spread, not drift — a skimmed "targeted" must never
    # read as a regression signal when regressions is empty and every
    # outlier beat the basket. Fail semantics unchanged (regressions
    # only ever come from the slow side).
    if not out:
        verdict = "uniform"
    elif all(e["vs_basket"] < 0 for e in entries if e["name"] in out):
        verdict = "uniform+improvements"
    else:
        verdict = "targeted"
    return {
        "entries": entries,
        "median_ratio": round(med, 4),
        "out_of_band": out,
        "regressions": regressions,
        "verdict": verdict,
        "unratioable": unratioable,
        "added": sorted(set(new_q) - set(old_q)),
        "removed": sorted(set(old_q) - set(new_q)),
    }


def render_table(result: dict, markdown: bool = False) -> str:
    """The per-entry delta table (plain or markdown for DRIFT_r*.md)."""
    rows = [("entry", "old s", "new s", "ratio", "vs basket", "flag")]
    for e in result["entries"]:
        flag = ""
        if e["name"] in result["regressions"]:
            flag = "REGRESSION?"
        elif e["name"] in result["out_of_band"]:
            flag = "out-of-band"
        rows.append((
            e["name"], f"{e['old']:.3f}", f"{e['new']:.3f}",
            f"{e['ratio']:.3f}", f"{e['vs_basket']:+.1%}", flag,
        ))
    if markdown:
        lines = ["| " + " | ".join(rows[0]) + " |",
                 "|" + "|".join("---" for _ in rows[0]) + "|"]
        lines += ["| " + " | ".join(r) + " |" for r in rows[1:]]
        return "\n".join(lines)
    widths = [max(len(r[i]) for r in rows) for i in range(len(rows[0]))]
    return "\n".join(
        "  ".join(c.ljust(w) for c, w in zip(r, widths)).rstrip() for r in rows
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old", help="baseline artifact (e.g. BENCH_r12.json)")
    ap.add_argument("new", help="candidate artifact")
    ap.add_argument("--band", type=float, default=DEFAULT_BAND,
                    help="out-of-band threshold vs the median ratio")
    ap.add_argument("--targeted", type=float, default=DEFAULT_TARGETED,
                    help="slow-side deviation that counts as a regression")
    ap.add_argument("--markdown", action="store_true",
                    help="emit the delta table as markdown (for DRIFT_r*.md)")
    args = ap.parse_args(argv)

    old, new = load_artifact(args.old), load_artifact(args.new)
    c_old, c_new = canary_report(old), canary_report(new)
    result = classify(old["queries"], new["queries"], args.band, args.targeted)

    meth_old, meth_new = old.get("methodology"), new.get("methodology")
    warnings = []
    if meth_old != meth_new:
        warnings.append(
            f"methodology mismatch: {meth_old!r} vs {meth_new!r} — deltas are "
            "cross-statistic, treat as indicative only"
        )
    for tag, rep in (("old", c_old), ("new", c_new)):
        for kind in ("spin", "io"):
            d = rep[f"{kind}_disagreement"]
            if d is not None and d > CANARY_BAND:
                warnings.append(
                    f"{tag} capture's {kind} canary pair disagrees {d:.0%} — "
                    "that capture saw contention"
                )

    quiet = c_old["quiet"] and c_new["quiet"]
    # fail loudly ONLY on targeted drift under quiet canaries: a contended
    # capture cannot convict code, and a uniform shift is the box
    fail = bool(result["regressions"]) and quiet

    # --markdown is FOR capturing (DRIFT_r*.md) — the table goes to
    # stdout so `> section.md` works; the human-oriented plain table
    # stays on stderr, keeping stdout's last line the JSON summary
    print(
        render_table(result, markdown=args.markdown),
        file=sys.stdout if args.markdown else sys.stderr,
    )
    if result["unratioable"]:
        warnings.append(
            f"entries with a 0.0 baseline timing excluded from ratios: "
            f"{result['unratioable']}"
        )
    for w in warnings:
        print(f"WARNING: {w}", file=sys.stderr)
    summary = {
        "mode": "bench_diff",
        "old": args.old,
        "new": args.new,
        "median_ratio": result["median_ratio"],
        "verdict": result["verdict"],
        "out_of_band": result["out_of_band"],
        "regressions": result["regressions"],
        "unratioable": result["unratioable"],
        "added": result["added"],
        "removed": result["removed"],
        "canaries_quiet": quiet,
        "common_set_total": [old.get("common_set_total"), new.get("common_set_total")],
        "fail": fail,
    }
    print(json.dumps(summary, separators=(",", ":")))
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
