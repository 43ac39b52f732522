"""AST lint: the Hadoop FS boolean-return discipline, ratcheted (VERDICT
r11 #5).

Hadoop's ``FileSystem.rename``/``delete`` report failure by RETURNING
FALSE — no exception — so an unchecked call site is a silent-loss bug
class this repo has now fixed seven times by audit (ADVICE r10 ×4 + the
r11 module-wide sweep + manifest._swap_in).  Nothing stopped an eighth
from being written; this lint does.

Rule: every statement-level ``fs.rename(...)`` / ``fs.delete(...)`` in
the package (result discarded — an ``ast.Expr`` whose value is the
call) must carry the literal marker ``best-effort`` in a comment within
the statement's own lines, documenting WHY a silent false is benign
there.  The allowlisted classes, each marked in place at its site:

* final temp/staging deletes after the content has already moved out
  (scratch reclamation — a survivor is garbage, never data);
* checkpoint GC (graph.py's per-round checkpoint directories);
* lease/fence markers whose staleness is aged out by the next entry
  point (rollup's append leases and swap fence);
* deletes whose failure is surfaced by the VERY NEXT checked call
  (a pre-rename delete: a false delete makes the checked rename fail).

Any call whose boolean feeds an expression (``if not fs.rename(...)``,
an assignment, an assert) is checked by construction and needs no
marker.  ``test_lint_is_live`` proves the lint fails on the regression
it exists for, the fence-liveness convention.
"""

from __future__ import annotations

import ast
import os

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "etl_bom_radiation_spark",
)

MARKER = "best-effort"


def unchecked_fs_calls(source: str, filename: str = "<mem>") -> list[str]:
    """``(file:line)`` of every statement-level (result-discarded)
    ``fs.rename``/``fs.delete`` call whose statement lines lack the
    ``best-effort`` marker — in the statement's own lines, or in a pure
    COMMENT line directly above it (a trailing marker on a preceding
    STATEMENT must not leak down and suppress the lint for a new
    unchecked call written below it; code-review r12).  Receiver
    matching is the repo convention: the Hadoop FileSystem handle is
    always bound to a local name ``fs``."""
    tree = ast.parse(source)
    lines = source.splitlines()
    out = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Expr):
            continue
        call = node.value
        if not (
            isinstance(call, ast.Call)
            and isinstance(call.func, ast.Attribute)
            and call.func.attr in ("rename", "delete")
            and isinstance(call.func.value, ast.Name)
            and call.func.value.id == "fs"
        ):
            continue
        seg = "\n".join(lines[node.lineno - 1 : node.end_lineno])
        above = lines[node.lineno - 2] if node.lineno >= 2 else ""
        above_ok = above.lstrip().startswith("#") and MARKER in above
        if MARKER not in seg and not above_ok:
            out.append(f"{filename}:{node.lineno}")
    return out


def test_package_fs_calls_checked_or_marked():
    offenders: list[str] = []
    for root, _dirs, files in os.walk(PKG):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            p = os.path.join(root, f)
            with open(p) as fh:
                offenders += unchecked_fs_calls(
                    fh.read(), os.path.relpath(p, os.path.dirname(PKG))
                )
    assert not offenders, (
        "unchecked Hadoop fs.rename/fs.delete call sites (silent-false "
        "hazard — check the boolean and raise, or mark the line with a "
        f"'{MARKER}: <why a silent false is benign>' comment): "
        + ", ".join(offenders)
    )


def test_lint_is_live():
    """The lint demonstrably catches the regression class: an unchecked,
    unmarked call is flagged; checked or marked forms are not."""
    flagged = unchecked_fs_calls(
        "def f(fs, a, b):\n"
        "    fs.rename(a, b)\n"
        "    fs.delete(a, True)\n"
    )
    assert flagged == ["<mem>:2", "<mem>:3"]

    clean = unchecked_fs_calls(
        "def f(fs, a, b, jvm):\n"
        "    if not fs.rename(a, b):\n"
        "        raise OSError('rename failed')\n"
        "    ok = fs.delete(a, True)\n"
        "    assert fs.delete(b, False)\n"
        "    fs.delete(a, True)  # best-effort: scratch only\n"
        "    fs.delete(  # best-effort: scratch only\n"
        "        jvm, True,\n"
        "    )\n"
        "    other.delete(a)\n"  # not the Hadoop handle convention
        "    fs.open(a)\n"  # not rename/delete
    )
    assert clean == []

    # a marker TRAILING a preceding statement must not leak down to a
    # new unchecked call written below it (code-review r12) — only a
    # pure comment line directly above counts
    leak = unchecked_fs_calls(
        "def f(fs, a, b, c):\n"
        "    fs.delete(a, True)  # best-effort: scratch only\n"
        "    fs.rename(b, c)\n"
        "    # best-effort: lease age-out\n"
        "    fs.delete(c, False)\n"
    )
    assert leak == ["<mem>:3"]
