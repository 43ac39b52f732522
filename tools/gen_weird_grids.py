#!/usr/bin/env python
"""Generate an adversarial ESRI-ASCII grid corpus (the grid axis of the
adversarial-corpus net, VERDICT r13 #2).

The golden fixtures (`fixtures/grids`, `fixtures/grids_multires`) are
well-formed: every header parses, every body row has exactly ``ncols``
cells, separators are single spaces, filenames match the grammar. The
flagship decode's malformed-input coverage was therefore hand-picked unit
cases — the same fixture-blindness the r13 relational corpora closed for
§2.E/§2.H. This tool writes grid files that are weird along every axis of
the FILE FORMAT itself:

* ragged body rows (shorter AND longer than the declared ``ncols``);
* body shorter/longer than the declared ``nrows``;
* nodata-everywhere; nodata sentinel colliding with real values;
* separator chaos: runs of spaces, leading/trailing spaces, tabs, CRLF
  and mixed line endings, stray mid-line CR;
* scientific-notation / negative / non-integer / garbage header values;
* 1x1 grids; truncated headers; declared-vs-actual dimension mismatches;
* non-integer cells (floats, overflow, '+'/leading-zero forms);
* filename-grammar near-misses (missing pieces, bad dates, hour 99);
* (engine-only set) non-UTF-8 bytes, empty files, extension-less names.

Two corpora because DuckDB's ``read_text`` RAISES on invalid UTF-8
(measured r14) while Spark's text reader substitutes U+FFFD:

* :func:`write_weird_grids` — valid-UTF-8 ``*.txt`` files, safe for the
  exact Spark-vs-DuckDB oracle sweep (``tests/test_grid_parity.py``);
* :func:`write_binary_grids` — byte-level pathologies, swept engine-side
  only for the no-abort / quarantine contract.

Values are small integers and headers binary fractions (multiples of
1/64), so coordinate arithmetic is exact in IEEE double on both engines
and the driver-style bitwise float compare stays meaningful (same
discipline as tools/gen_weird_corpus.py).
"""

from __future__ import annotations

import os


def _w(out_dir: str, name: str, text: str, newline: str = "\n") -> None:
    data = text.replace("\n", newline) if newline != "\n" else text
    with open(os.path.join(out_dir, name), "w", encoding="utf-8", newline="") as f:
        f.write(data)


_HDR = """ncols {ncols}
nrows {nrows}
xllcorner {xll}
yllcorner {yll}
cellsize {cs}
NODATA_value {nodata}
"""


def _grid(ncols="4", nrows="3", xll="112.0", yll="-44.0", cs="0.5",
          nodata="-999", body="") -> str:
    return _HDR.format(ncols=ncols, nrows=nrows, xll=xll, yll=yll,
                       cs=cs, nodata=nodata) + body


def write_weird_grids(out_dir: str) -> str:
    """The oracle-safe weird corpus: every file is valid UTF-8 ``*.txt``."""
    os.makedirs(out_dir, exist_ok=True)

    # clean control — the sweep must keep decoding SOMETHING
    _w(out_dir, "WG01_GLOBAL_20180401_0100.txt", _grid(
        body="10 -999 12 13\n20 21 -999 23\n30 31 32 -999\n"))

    # ragged body rows: 2-cell line (east cells missing -> fewer points),
    # 6-cell line (extras truncated at ncols)
    _w(out_dir, "WG02_GLOBAL_20180401_0200.txt", _grid(
        body="10 11\n20 21 22 23 24 25\n30 31 32 33\n"))

    # body shorter than declared nrows (2 lines vs 4)
    _w(out_dir, "WG03_GLOBAL_20180401_0300.txt", _grid(
        nrows="4", body="10 11 12 13\n20 21 22 23\n"))

    # body longer than declared nrows (extra lines ignored)
    _w(out_dir, "WG04_GLOBAL_20180401_0400.txt", _grid(
        nrows="2", body="10 11 12 13\n20 21 22 23\n77 77 77 77\n88 88\n99\n"))

    # nodata everywhere -> zero points
    _w(out_dir, "WG05_GLOBAL_20180401_0500.txt", _grid(
        body="-999 -999 -999 -999\n-999 -999 -999 -999\n-999 -999 -999 -999\n"))

    # separator chaos: runs of spaces (empty tokens advance the cell
    # index), leading space (shifts the whole row east), trailing spaces
    _w(out_dir, "WG06_GLOBAL_20180401_0600.txt", _grid(
        body="10  12 13\n 21 22 23\n30 31 32 33   \n"))

    # CRLF line endings throughout
    _w(out_dir, "WG07_GLOBAL_20180401_0700.txt", _grid(
        body="10 11 12 13\n20 21 22 23\n30 31 32 33\n"), newline="\r\n")

    # scientific-notation and negative header doubles
    _w(out_dir, "WG08_GLOBAL_20180401_0800.txt", _grid(
        xll="1.12e2", yll="-4.4e1", cs="5e-1",
        body="10 11 12 13\n20 21 22 23\n30 31 32 33\n"))

    # 1x1 grid
    _w(out_dir, "WG09_GLOBAL_20180401_0900.txt", _grid(
        ncols="1", nrows="1", body="42\n"))

    # nodata sentinel colliding with real data (7 is both)
    _w(out_dir, "WG10_GLOBAL_20180401_1000.txt", _grid(
        nodata="7", body="7 8 9 7\n7 7 7 7\n1 2 3 7\n"))

    # non-integer nodata header: Spark try_cast -> NULL -> the
    # `radiation != nodata` predicate drops every cell
    _w(out_dir, "WG11_GLOBAL_20180401_1100.txt", _grid(
        nodata="-999.5", body="10 11 12 13\n20 21 22 23\n30 31 32 33\n"))

    # garbage ncols -> zero cells
    _w(out_dir, "WG12_GLOBAL_20180401_1200.txt", _grid(
        ncols="four", body="10 11 12 13\n"))

    # negative declared nrows / ncols -> clamp to zero, never abort
    _w(out_dir, "WG13_GLOBAL_20180401_1300.txt", _grid(
        nrows="-2", body="10 11 12 13\n"))
    _w(out_dir, "WG14_GLOBAL_20180401_1400.txt", _grid(
        ncols="-1", body="10 11 12 13\n"))

    # truncated: three header lines, no body
    _w(out_dir, "WG15_GLOBAL_20180401_1500.txt", "ncols 4\nnrows 3\nxllcorner 112.0\n")

    # non-integer / exotic cells: floats and 1e2 drop (strict int),
    # +8 and 007 parse, 3000000000 overflows int32 -> drops
    _w(out_dir, "WG16_GLOBAL_20180401_1600.txt", _grid(
        body="7.5 +8 007 1e2\n3000000000 -0 0 x\nNaN inf 1_0 9\n"))

    # blank middle body line (row advances latitude, emits nothing)
    _w(out_dir, "WG17_GLOBAL_20180401_1700.txt", _grid(
        body="10 11 12 13\n\n30 31 32 33\n"))

    # mixed \n and \r\n endings plus a stray mid-line CR
    _w(out_dir, "WG18_GLOBAL_20180401_1800.txt", _grid(
        body="10 11 12 13\r\n20 2\r1 22 23\n30 31 32 33\n"))

    # integer header fields written as floats -> strict-int NULL -> 0 rows
    _w(out_dir, "WG19_GLOBAL_20180401_1900.txt", _grid(
        ncols="4.0", nrows="3.0",
        body="10 11 12 13\n20 21 22 23\n30 31 32 33\n"))

    # declared ncols smaller than actual line width (truncate east edge)
    _w(out_dir, "WG20_GLOBAL_20180401_2000.txt", _grid(
        ncols="2", body="10 11 12 13\n20 21 22 23\n30 31 32 33\n"))

    # declared ncols larger than actual line width (missing cells drop)
    _w(out_dir, "WG21_GLOBAL_20180401_2100.txt", _grid(
        ncols="6", body="10 11 12\n20 21 22\n30 31 32\n"))

    # tabs: not separators (split is single-space) — '2\t3' fails the
    # strict int, '5\t' casts (trimAll) — and a tab-padded header value
    _w(out_dir, "WG22_GLOBAL_20180401_2200.txt", _grid(
        nodata="\t-999", body="1 2\t3 4\n5\t 6 7 8\n9 10 11 12\n"))

    # filename-grammar near-misses over clean bodies
    near = _grid(body="10 11 12 13\n20 21 22 23\n30 31 32 33\n")
    _w(out_dir, "WG23GLOBALnounder.txt", near)            # no underscores
    _w(out_dir, "WG24_GLOBAL_2018AB01_0100.txt", near)    # bad date chars
    _w(out_dir, "WG25_GLOBAL_20181332_0100.txt", near)    # day 32
    _w(out_dir, "WG26_GLOBAL_20180401_9900.txt", near)    # hour 99
    _w(out_dir, "WG27_GLOBAL_20180401.txt", near)         # missing time piece
    _w(out_dir, "WG28_GLOBAL_20180401_0100_EXTRA_BITS.txt", near)  # extras ok
    _w(out_dir, "WG29__20180401_0100.txt", near)          # empty type piece

    # minutes beyond hour precision are dropped (time_str[:2], bom.py:102)
    _w(out_dir, "WG31_GLOBAL_20180401_2347.txt", near)

    # garbage xll/yll: points still decode, with NULL coordinates
    _w(out_dir, "WG33_GLOBAL_20180401_0101.txt", _grid(
        xll="abc", yll="oops", body="10 11 12 13\n20 21 22 23\n30 31 32 33\n"))

    # cellsize 0: degenerate lattice, every point at (xll, yll-ish)
    _w(out_dir, "WG34_GLOBAL_20180401_0102.txt", _grid(
        cs="0.0", body="10 11 12 13\n20 21 22 23\n30 31 32 33\n"))

    # negative cells are legal data
    _w(out_dir, "WG36_GLOBAL_20180401_0104.txt", _grid(
        body="-10 -11 -12 -13\n-20 21 22 23\n30 31 32 -33\n"))

    # non-finite cellsize: NaN coordinates (the coarsen/zorder guard axis)
    _w(out_dir, "WG37_GLOBAL_20180401_0105.txt", _grid(
        cs="NaN", body="10 11 12 13\n"))
    _w(out_dir, "WG38_GLOBAL_20180401_0106.txt", _grid(
        xll="Infinity", body="10 11 12 13\n"))

    # timestamp edges through the Sydney conversion (probed r14: Spark
    # java.time and DuckDB ICU agree on all four — pinned here):
    # pre-1900 UTC crossing the year boundary, the parquet timestamp
    # far edge (2262), the 32-bit epoch rollover (2038)
    _w(out_dir, "WG40_GLOBAL_18991231_2300.txt", near)
    _w(out_dir, "WG41_GLOBAL_22620401_0100.txt", near)
    _w(out_dir, "WG42_GLOBAL_20380119_0400.txt", near)

    # code-review r14 pins — each caught a live mirror divergence:
    # ONLY xll garbled: per-axis coordinate NULLing (real latitudes,
    # NULL longitudes — not both NULL)
    _w(out_dir, "WG43_GLOBAL_20180401_0107.txt", _grid(
        xll="abc", body="10 11 12 13\n20 21 22 23\n30 31 32 33\n"))
    # 7-digit date piece: Python strptime and DuckDB try_strptime both
    # parse '2018041' width-lax; the pinned grammar NULLs it everywhere
    _w(out_dir, "WG44_GLOBAL_2018041_0100.txt", near)
    # 1-digit hour piece: same width-lax class
    _w(out_dir, "WG45_GLOBAL_20180401_1.txt", near)
    # year 0000: parses in raw Spark to a year-0 timestamp that CRASHES
    # PySpark's driver-side datetime conversion — the pinned grammar
    # excludes it
    _w(out_dir, "WG46_GLOBAL_00000101_0000.txt", near)
    # Java double-literal suffix / hex-float headers: raw Spark try_cast
    # accepts '0.5d' and '0x1p3'; the pinned header-double grammar NULLs
    # both (NULL cs -> points with NULL coords)
    _w(out_dir, "WG47_GLOBAL_20180401_0108.txt", _grid(
        cs="0.5d", body="10 11 12 13\n"))
    _w(out_dir, "WG48_GLOBAL_20180401_0109.txt", _grid(
        xll="0x1p3", body="10 11 12 13\n"))

    # CSV-hostile radiation type: comma AND double-quote in the filename
    # piece (legal on any POSIX FS) — exercises the S3 sink's quoting
    _w(out_dir, 'WG49_GLO,B"AL_20180401_0110.txt', _grid(
        body="10 11 12 13\n"))

    # literal '%' and space in the filename: input_file_name() encodes
    # them (%25, %20) and the decoded_filename round-trip must restore
    # them EXACTLY — '%x' must never be re-interpreted as an escape
    _w(out_dir, "WG50 %x_GLOBAL_20180401_0111.txt", _grid(
        body="10 11 12 13\n"))

    # mixed resolution WITH weirdness: a 0.25-cellsize grid with ragged
    # rows, so the per-file-lattice consumers (regrid/gradient/zonal)
    # see a second resolution inside the adversarial sweep too
    _w(out_dir, "WG51_GLOBAL_20180402_0100.txt", _grid(
        cs="0.25", body="1 2 3\n4 5 6 7 8\n9 10 11 12\n"))

    # the Sydney DST FOLD (2018-04-01 03:00 AEDT -> 02:00 AEST): two
    # DISTINCT UTC instants whose wall clocks coincide at 02:00 — both
    # engines agree (probed r14), and the pair lands in ONE hour
    # partition, which is the reference's wall-clock convention
    _w(out_dir, "WG52_GLOBAL_20180331_1500.txt", near)
    _w(out_dir, "WG53_GLOBAL_20180331_1600.txt", near)

    # year 9999 (ADVICE r14): grammar-valid date whose +11h Sydney
    # conversion rolls to year 10000 — past Python's datetime.max
    # (DataSource OverflowError) and pandas' collect conversion. The
    # pinned grammar excludes it in all mirrors -> NULL timestamp.
    _w(out_dir, "WG54_GLOBAL_99991231_2300.txt", near)

    # \x0b (vertical tab) as header separator (ADVICE r14): Java's \s
    # includes it, RE2's \s does NOT — the oracle must spell the class
    # out. In a body cell it's not a separator (single-space split) and
    # '1\x0b2' fails the strict int on every path.
    _w(out_dir, "WG55_GLOBAL_20180401_0112.txt",
       "ncols\x0b4\nnrows\x0b3\nxllcorner 112.0\nyllcorner -44.0\n"
       "cellsize 0.5\nNODATA_value -999\n"
       "10 1\x0b1 12 13\n20 21 22 23\n30 31 32 33\n")

    # overflow-exponent header (ADVICE r14): '1e999' is grammar-valid;
    # IEEE strtod overflow -> Infinity on Spark try_cast, Python float()
    # AND this container's DuckDB TRY_CAST (measured r15 — the advisory's
    # NULL-on-overflow did not reproduce). Pinned here so a DuckDB change
    # would surface as a parity failure.
    _w(out_dir, "WG56_GLOBAL_20180401_0113.txt", _grid(
        cs="1e999", body="10 11 12 13\n"))
    # overflow via a 330-digit mantissa (no exponent)
    _w(out_dir, "WG57_GLOBAL_20180401_0114.txt", _grid(
        xll="9" * 330, body="10 11 12 13\n"))
    # underflow exponent: '1e-400' -> 0.0 on all three engines
    _w(out_dir, "WG58_GLOBAL_20180401_0115.txt", _grid(
        cs="1e-400", body="10 11 12 13\n"))

    # \x7f (DEL) — found by the r15 byte-fuzzer (seed 41): Spark's INT
    # cast trims \x7f from token ENDS (UTF8String.trimAll) where the
    # naive <=0x20 mirrors NULL the cell — '\x7f3' and '22\x7f' parse,
    # '1\x7f2' (mid-token) drops, and the \x7f-padded nodata header
    # parses. Valid UTF-8, so the exact oracle sweep covers it.
    _w(out_dir, "WG60_GLOBAL_20180401_0117.txt", _grid(
        nodata="\x7f-999\x7f",
        body="10 \x7f3 22\x7f 13\n1\x7f2 21 22 23\n30 31 32 33\n"))

    # lossy-ROUND band (grid fuzzer seed 88, r15): 188 nines = 1e188 is
    # finite and grammar-valid, and DuckDB's ROUND(x, 6) corrupts it
    # (9.99...e187) where Spark's BigDecimal round is exact — the
    # guarded round6/sql_round6 pair passes it through unrounded on both
    # sides. Both corners so lon AND lat take the huge branch.
    _w(out_dir, "WG61_GLOBAL_20180401_0118.txt", _grid(
        xll="9" * 188, yll="9" * 188, body="10 11 12 13\n"))

    # degenerate lattice (r16 grid fuzzer, seed 93): cellsize 0 makes the
    # gradient's central-difference divisor zero — Spark ANSI-aborts,
    # DuckDB NULLs; the gradient now excludes rounded-step-0 grids on
    # both sides. A tiny-but-nonzero step (1e-9) collapses to 0 under the
    # guarded 6-dp round and must take the same exclusion.
    _w(out_dir, "WG62_GLOBAL_20180401_0119.txt", _grid(
        cs="0", body="10 11 12 13\n20 21 22 23\n"))
    _w(out_dir, "WG63_GLOBAL_20180401_0120.txt", _grid(
        cs="1e-9", body="10 11 12 13\n20 21 22 23\n"))

    # huge-but-FINITE corner (ADVICE r14): xll=1e300 decodes fine
    # (lon = 1e300 exactly — the +0.5 lattice step is absorbed), but
    # FLOOR(lon) overflows BIGINT in DuckDB where Spark's floor->long
    # saturates — the quantizer consumers (g_coarsen, g_zorder_cluster)
    # filter it through the shared long-safe bound instead.
    _w(out_dir, "WG59_GLOBAL_20180401_0116.txt", _grid(
        xll="1e300", body="10 11 12 13\n"))

    return out_dir


def write_binary_grids(out_dir: str) -> str:
    """Byte-level pathologies DuckDB ``read_text`` cannot read (invalid
    UTF-8 raises — measured r14): swept ENGINE-SIDE ONLY for the no-abort
    contract. Includes the reference's `errors='ignore'` exposure
    (bom.py:57-59): our reading substitutes U+FFFD (so a corrupt byte can
    only DROP a cell, never splice two digit runs into a plausible value —
    documented divergence, quarantine posture)."""
    os.makedirs(out_dir, exist_ok=True)

    def wb(name: str, data: bytes) -> None:
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(data)

    clean = _grid(body="10 11 12 13\n20 21 22 23\n30 31 32 33\n").encode()

    # invalid UTF-8 inside a body cell: '1<ff>2' must drop that cell only
    wb("WB01_GLOBAL_20180401_0100.txt", _grid(
        body="10 11 12 13\n20 XX 22 23\n30 31 32 33\n").encode().replace(
        b"XX", b"1\xff2"))
    # invalid UTF-8 inside a header value: that field NULLs -> zero rows
    wb("WB02_GLOBAL_20180401_0200.txt", _grid(
        ncols="4\xc3").encode("latin-1", errors="ignore") + b"10 11 12 13\n")
    # empty file
    wb("WB03_GLOBAL_20180401_0300.txt", b"")
    # a single NUL byte
    wb("WB04_GLOBAL_20180401_0400.txt", b"\x00")
    # extension-less file (Spark's directory listing reads it; the oracle
    # glob would not — engine-only by construction)
    wb("WB05_GLOBAL_20180401_0500", clean)
    # UTF-8 BOM prefix: first header line becomes '<BOM>ncols 4'
    wb("WB06_GLOBAL_20180401_0600.txt", b"\xef\xbb\xbf" + clean)
    # truncated mid-cell (no trailing newline, last cell half-written)
    wb("WB07_GLOBAL_20180401_0700.txt", clean[:-8])

    return out_dir


# --------------------------------------------------------------------------
# seeded randomized fuzzer (VERDICT r14 #4)
#
# The hand-designed corpora above are bounded by what a builder thinks to
# write down (the r14 URI-encoding bug was found only because one hand-added
# case happened to trip it). The fuzzer composes the same adversarial ATOMS
# randomly — headers, bodies, separators, line endings, filename pieces —
# under a committed seed, so each round sweeps grid shapes nobody designed.
# Deterministic by construction: a passing seed is pinned and stays green.
#
# Atom pools follow the corpus disciplines:
#   * valid header doubles are binary fractions (exact IEEE on both
#     engines — the bitwise float compare stays meaningful);
#   * cell values are small ints (exact BIGINT sums);
#   * filenames avoid glob metacharacters (the oracle's read_text glob
#     must list exactly the files Spark's directory listing sees) and
#     always end .txt for the same reason.

#: header-double atoms: exact binary fractions + every grammar edge the
#: hand corpus pins (NULL-ing garbage, inf/nan spellings, Java literal
#: forms, overflow/underflow exponents, huge-but-finite corners)
_DOUBLE_ATOMS = [
    "112.0", "-44.0", "0.5", "0.25", "0.125", "1.5", "-0.5", "113.75",
    "5e-1", "1.12e2", "-4.4e1", "0", "-0", ".5", "5.", "+0.5",
    "NaN", "nan", "inf", "Infinity", "-Infinity", "+inf",
    "1e999", "-1e999", "1e-400", "1e300", "-1e300", "9" * 330,
    "0.5d", "0x1p3", "1_0", "four", "", "4.5.6", "--1", "1e", "e5",
    "\t0.5", "0.5 ", " ",
]
#: header-int atoms (ncols/nrows/nodata)
_INT_ATOMS = [
    "4", "3", "2", "1", "0", "-1", "-2", "6", "8", "-999", "7",
    "+5", "007", "4.0", "4.5", "1e2", "3000000000", "-3000000000",
    "1_0", "four", "", "NaN", " 4", "4 ", "\t4",
]
#: body-cell atoms: mostly clean small ints, some droppers
_CELL_ATOMS = [
    "10", "11", "12", "13", "20", "21", "-999", "0", "-5", "7", "40",
    "+8", "007", "-0", "7.5", "1e2", "3000000000", "x", "NaN", "1_0", "",
]
#: filename date/hour piece atoms: valid dates (incl. DST fold/skip days
#: and far edges) + every near-miss class the hand corpus pins
_DATE_ATOMS = [
    "20180401", "20180330", "20180331", "20181007", "18991231",
    "22620401", "20380119", "20180229", "20181332", "2018AB01",
    "2018041", "201804011", "00000101", "99991231", "", "April01",
]
_HOUR_ATOMS = ["0100", "2300", "1500", "1600", "0000", "9900", "1",
               "23", "005", "ab00", "", "2347"]
_TYPE_ATOMS = ["GLOBAL", "UV", "DIRECT", "", "GLO-BAL", "G L", "a,b",
               "TYPE.X", "ÜV"]
#: header/body separator runs (header split is ASCII-whitespace class;
#: body split is SINGLE space — tabs/\x0b inside a body cell are data)
_HDR_SEPS = [" ", "  ", "\t", " \t ", "\x0b", "   "]
_EOLS = ["\n", "\r\n"]


def write_fuzz_grids(out_dir: str, seed: int, n: int = 60) -> str:
    """Write *n* seeded-random oracle-safe grids (valid UTF-8, ``.txt``).

    Every structural axis is drawn independently: header separator runs,
    per-file line endings, header-value atoms, declared-vs-actual
    dimension mismatches, ragged rows, blank lines, trailing garbage,
    filename grammar pieces. Swept Spark-vs-DuckDB through every
    grid-family oracle (tests/test_grid_parity.py) exactly like the
    hand corpus — same dirs-substituted harness."""
    import random

    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    for k in range(n):
        eol = rng.choice(_EOLS)
        hsep = rng.choice(_HDR_SEPS)
        # 70% structurally-plausible headers so the sweep keeps decoding
        # real points; 30% full chaos
        chaotic = rng.random() < 0.3
        ncols = rng.choice(_INT_ATOMS) if chaotic else str(rng.randint(1, 6))
        nrows = rng.choice(_INT_ATOMS) if chaotic else str(rng.randint(1, 5))
        xll = rng.choice(_DOUBLE_ATOMS)
        yll = rng.choice(_DOUBLE_ATOMS)
        cs = rng.choice(_DOUBLE_ATOMS)
        nodata = rng.choice(_INT_ATOMS) if chaotic else "-999"
        hdr_names = ["ncols", "nrows", "xllcorner", "yllcorner",
                     "cellsize", "NODATA_value"]
        vals = [ncols, nrows, xll, yll, cs, nodata]
        lines = []
        for hn, hv in zip(hdr_names, vals):
            # occasional leading space / missing value token
            lead = " " if rng.random() < 0.1 else ""
            if rng.random() < 0.05:
                lines.append(f"{lead}{hn}")
            else:
                lines.append(f"{lead}{hn}{hsep}{hv}")
        # body: actual row/col counts near (but not always equal to) the
        # declared ones; occasional blank or garbage lines
        try:
            want_rows = max(0, min(8, int(nrows)))
        except ValueError:
            want_rows = 3
        actual_rows = max(0, want_rows + rng.choice([-1, 0, 0, 0, 1, 2]))
        for _ in range(actual_rows):
            if rng.random() < 0.08:
                lines.append("")
                continue
            try:
                want_cols = max(0, min(8, int(ncols)))
            except ValueError:
                want_cols = 4
            w = max(1, want_cols + rng.choice([-2, -1, 0, 0, 0, 1, 3]))
            cells = [rng.choice(_CELL_ATOMS) if rng.random() < 0.25
                     else str(rng.randint(-20, 40)) for _ in range(w)]
            pad = "  " if rng.random() < 0.1 else " "
            trail = " " if rng.random() < 0.15 else ""
            lines.append(pad.join(cells) + trail)
        if rng.random() < 0.1:
            lines.append("trailing garbage beyond declared nrows")
        text = eol.join(lines) + (eol if rng.random() < 0.8 else "")
        # stray lone CR inside one line (the universal-newline trap)
        if rng.random() < 0.1 and len(text) > 20:
            pos = rng.randint(10, len(text) - 5)
            text = text[:pos] + "\r" + text[pos:]
        # filename: FZ<k>_<type>_<date>_<hour>.txt, sometimes missing
        # pieces — distinct by the FZ<k> prefix, glob-safe by the pools
        pieces = [f"FZ{seed}x{k:03d}"]
        if rng.random() < 0.9:
            pieces.append(rng.choice(_TYPE_ATOMS))
        if rng.random() < 0.9:
            pieces.append(rng.choice(_DATE_ATOMS))
        if rng.random() < 0.85:
            pieces.append(rng.choice(_HOUR_ATOMS))
        _w(out_dir, "_".join(pieces) + ".txt", text, newline="\n")
    return out_dir


def write_fuzz_binary(out_dir: str, seed: int, n: int = 25) -> str:
    """Seeded byte-level fuzz (engine-only — DuckDB read_text raises on
    invalid UTF-8): random byte flips / truncations / injections over a
    clean grid, swept for the no-abort contract and Catalyst-vs-DataSource
    row identity."""
    import random

    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    clean = _grid(body="10 11 12 13\n20 21 22 23\n30 31 32 33\n").encode()
    for k in range(n):
        data = bytearray(clean)
        for _ in range(rng.randint(1, 6)):
            op = rng.choice(["flip", "insert", "delete", "truncate"])
            if not data:
                break
            pos = rng.randrange(len(data))
            if op == "flip":
                data[pos] = rng.randrange(256)
            elif op == "insert":
                data[pos:pos] = bytes([rng.randrange(256)])
            elif op == "delete":
                del data[pos]
            else:
                data = data[:pos]
        with open(os.path.join(out_dir, f"FB{seed}x{k:03d}_GLOBAL_20180401_{k:02d}00.txt"), "wb") as f:
            f.write(bytes(data))
    return out_dir


if __name__ == "__main__":
    import sys

    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/weird_grids"
    print(write_weird_grids(os.path.join(base, "text")))
    print(write_binary_grids(os.path.join(base, "binary")))
    print(write_fuzz_grids(os.path.join(base, "fuzz"), seed=1504))
    print(write_fuzz_binary(os.path.join(base, "fuzz_binary"), seed=1504))
