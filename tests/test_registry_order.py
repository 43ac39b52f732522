"""The registry's driver-window ordering (VERDICT r8 #1).

The driver re-checks a finite (~50-entry) prefix of the registry per round,
so ``load_all``'s ordering IS the freshness guarantee.  Invariants:

* never-driver-verified entries lead;
* an entry whose module was committed AFTER its evidence artifact but
  BEFORE the latest artifact ("urgent": its evidence describes code that no
  longer exists) is clamped to the three-round staleness boundary, so it
  re-enters the window within one round of the modification;
* commits after the latest artifact (this round's in-flight work) do NOT
  promote — next round's window catches them.
"""

from __future__ import annotations

import etl_bom_radiation_spark.queries as Q
from etl_bom_radiation_spark.queries import Query, _urgency, load_all


def _fake_query(module: str) -> Query:
    return Query(name="x", fn=lambda s, d: None, oracle=None, doc="", module=module)


def _with_epochs(monkeypatch, epochs):
    monkeypatch.setattr(Q, "_GIT_EPOCHS", epochs)


ART6 = 600.0
ART8 = 800.0
EPOCHS = {
    "CORRECTNESS_r06.json": [ART6],
    "CORRECTNESS_r08.json": [ART8],
    "etl_bom_radiation_spark/queries/in_between.py": [500.0, 700.0],
    "etl_bom_radiation_spark/queries/only_after.py": [500.0, 900.0],
    "etl_bom_radiation_spark/queries/only_before.py": [400.0, 550.0],
}


def test_urgency_module_committed_between_artifacts(monkeypatch):
    _with_epochs(monkeypatch, EPOCHS)
    q = _fake_query("etl_bom_radiation_spark.queries.in_between")
    assert _urgency(q, evid_round=6, latest_round=8) == 700.0


def test_urgency_ignores_commits_after_latest_artifact(monkeypatch):
    """In-round edits must not churn the ordering mid-round: the entry is
    caught by NEXT round's window (still within the one-round rule)."""
    _with_epochs(monkeypatch, EPOCHS)
    q = _fake_query("etl_bom_radiation_spark.queries.only_after")
    assert _urgency(q, evid_round=6, latest_round=8) is None


def test_urgency_none_when_module_predates_evidence(monkeypatch):
    _with_epochs(monkeypatch, EPOCHS)
    q = _fake_query("etl_bom_radiation_spark.queries.only_before")
    assert _urgency(q, evid_round=6, latest_round=8) is None


def test_urgency_none_for_fresh_or_unverified(monkeypatch):
    _with_epochs(monkeypatch, EPOCHS)
    q = _fake_query("etl_bom_radiation_spark.queries.in_between")
    assert _urgency(q, evid_round=8, latest_round=8) is None  # evidence current
    assert _urgency(q, evid_round=0, latest_round=8) is None  # never verified


def test_live_ordering_invariants():
    """Against the real repo + git history: every urgent entry must sit in
    the window ahead of any entry whose evidence is current (those need no
    refresh), and never-verified entries must lead everything."""
    reg = load_all()
    last = Q._last_verified_round()
    latest = max(last.values(), default=0)
    names = list(reg)

    pos = {n: i for i, n in enumerate(names)}
    unverified = [n for n in names if last.get(n, 0) == 0]
    fresh = [n for n in names if last.get(n, 0) == latest]
    urgent = [
        n
        for n in names
        if last.get(n, 0) > 0
        and _urgency(reg[n], last.get(n, 0), latest) is not None
    ]

    if unverified:
        assert max(pos[n] for n in unverified) < min(
            pos[n] for n in names if last.get(n, 0) > 0
        )
    if urgent and fresh:
        assert max(pos[n] for n in urgent) < min(pos[n] for n in fresh)
    # the stalest evidence class opens the verified block
    verified = [n for n in names if last.get(n, 0) > 0]
    if verified:
        stalest = min(last[n] for n in verified)
        first_verified = verified[0]
        assert last[first_verified] <= stalest + 0  # block starts at min round


def test_urgency_promotes_on_helper_only_commit(monkeypatch):
    """VERDICT r9 #2 / ADVICE r9: d04/t11/n50 are thin wrappers over
    ``lsh_index``; a commit touching ONLY the helper module (in the
    interval) must promote the dependent entry even though its
    registration module never changed."""
    epochs = dict(EPOCHS)
    epochs["etl_bom_radiation_spark/helper.py"] = [650.0]
    _with_epochs(monkeypatch, epochs)
    monkeypatch.setattr(
        Q,
        "_DEP_CACHE",
        {
            "etl_bom_radiation_spark.queries.only_before": (
                "etl_bom_radiation_spark/queries/only_before.py",
                "etl_bom_radiation_spark/helper.py",
            )
        },
    )
    q = _fake_query("etl_bom_radiation_spark.queries.only_before")
    assert _urgency(q, evid_round=6, latest_round=8) == 650.0
    # and the tiebreak takes the NEWEST in-interval commit across the set
    epochs["etl_bom_radiation_spark/queries/only_before.py"] = [400.0, 700.0]
    _with_epochs(monkeypatch, epochs)
    assert _urgency(q, evid_round=6, latest_round=8) == 700.0


def test_dep_scan_sees_function_level_helper_imports(monkeypatch):
    """The static dep scan must catch the repo's real wrapper pattern:
    lsh_lifecycle imports ``..lsh_index`` INSIDE the query bodies, and
    lsh_index in turn imports the banded_lsh helpers (transitive) —
    while the registry's own __init__ (imported by every module as
    ``from . import register``) stays excluded, or any registry-infra
    commit would mark the whole surface urgent."""
    monkeypatch.setattr(Q, "_DEP_CACHE", {})
    paths = Q._module_dep_paths("etl_bom_radiation_spark.queries.lsh_lifecycle")
    assert "etl_bom_radiation_spark/queries/lsh_lifecycle.py" in paths
    assert "etl_bom_radiation_spark/lsh_index.py" in paths          # direct
    assert "etl_bom_radiation_spark/queries/banded_lsh.py" in paths  # transitive
    assert not any(p.endswith("__init__.py") for p in paths)

    # n49's module depends on the shared banding helpers
    monkeypatch.setattr(Q, "_DEP_CACHE", {})
    paths = Q._module_dep_paths("etl_bom_radiation_spark.queries.incremental_lsh")
    assert "etl_bom_radiation_spark/queries/banded_lsh.py" in paths

    # a module that no longer exists on disk is still watched by its own
    # git path (the pre-closure behavior) — it just contributes no closure
    monkeypatch.setattr(Q, "_DEP_CACHE", {})
    assert Q._module_dep_paths("etl_bom_radiation_spark.queries.in_between") == (
        "etl_bom_radiation_spark/queries/in_between.py",
    )


def test_dep_scan_resolves_bare_relative_module_imports(monkeypatch):
    """ADVICE r10: ``from .. import lsh_index`` / ``from . import mod``
    import MODULES as attributes of a package — the scan used to skip
    the bare form silently, so a refactor from ``from ..lsh_index import
    x`` to it would drop the helper from the urgency closure and regress
    the VERDICT r9 #2 promotion with no test failing.  Each imported
    name is now probed as a module file under the target package
    (attribute names miss ``to_path`` and stay excluded, as does the
    package ``__init__`` itself)."""
    import os

    import etl_bom_radiation_spark.queries as pkg

    probe = os.path.join(os.path.dirname(pkg.__file__), "_bare_import_probe.py")
    with open(probe, "w") as f:
        f.write(
            "from .. import lsh_index\n"          # bare, parent package
            "from . import banded_lsh\n"          # bare, own package
            "from . import register\n"            # attribute: must miss
            "from etl_bom_radiation_spark import manifest\n"  # bare, absolute
        )
    try:
        monkeypatch.setattr(Q, "_DEP_CACHE", {})
        paths = Q._module_dep_paths(
            "etl_bom_radiation_spark.queries._bare_import_probe"
        )
    finally:
        os.remove(probe)
        Q._DEP_CACHE.clear()
    assert "etl_bom_radiation_spark/lsh_index.py" in paths
    assert "etl_bom_radiation_spark/queries/banded_lsh.py" in paths
    assert "etl_bom_radiation_spark/manifest.py" in paths
    # the registry __init__ stays excluded even though ``register`` was probed
    assert not any(p.endswith("__init__.py") for p in paths)


def test_stalest_evidence_block_fits_driver_window():
    """The rotation's actual deliverable (VERDICT r11 #2): every entry
    carrying the registry's STALEST evidence round must sit inside the
    driver's 50-entry correctness window, whatever the urgency clamp
    does around it.  Caught live in r12: the r9-r11 helper commits made
    ~50 entries urgent, the clamp put them all in one staleness class,
    and the old most-recently-modified-first tiebreak let r10-evidence
    entries queue-jump the r8 block — pushing n32-n36 to positions
    65-70, past the window.  The key now orders the clamped class by
    true evidence round first."""
    reg = load_all()
    last = Q._last_verified_round()
    verified = [n for n in reg if last.get(n, 0) > 0]
    if not verified:
        return
    stalest = min(last[n] for n in verified)
    latest = max(last[n] for n in verified)
    if stalest > max(latest - 3, 1):
        # The packing invariant below only holds while the stalest
        # evidence is at/behind the urgency-clamp boundary (latest-3):
        # past it, CLAMPED urgent entries legitimately sort ahead of the
        # stalest unmodified block (invalid evidence re-enters first, by
        # design) — and a block fresher than the 3-round budget needs no
        # window fence at all (review pass 2, r12).
        return
    block = [n for n in verified if last[n] == stalest]
    pos = {n: i for i, n in enumerate(reg)}
    n_unverified = sum(1 for n in reg if last.get(n, 0) == 0)
    # the STRICT deliverable: nothing with newer evidence may sit between
    # the (by-design leading) never-verified entries and the stalest
    # block — the block occupies the earliest slots it possibly can.
    # This is stronger than a bare <50 check and, unlike a relaxed
    # max(50, ...) window, cannot silently pass while part of the block
    # is outside the driver's real 50-entry budget (code-review r12):
    # when unverified+block exceed 50 the first assert still pins the
    # packing and the second makes the budget overflow loud.
    assert max(pos[n] for n in block) < n_unverified + len(block), sorted(
        (pos[n], n) for n in block
    )[-5:]
    assert n_unverified + len(block) <= 50, (
        f"{n_unverified} never-verified + {len(block)} stalest entries "
        "exceed the driver's 50-entry window — the block cannot clear in "
        "one round; split the intake"
    )
