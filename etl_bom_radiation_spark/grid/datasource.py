"""Spark 4 Python DataSource wrapper: ``spark.read.format("esri_grid")``.

An alternative mount point for the flagship decode (SURVEY §4 custom-code
item 1): one InputPartition per grid file (the file is the natural unit of
parallelism — grids are position-dependent and not splittable,
reference bom/bom.py:138-142), decoded in Python per partition.

The PRIMARY decode path remains :mod:`.decode` (pure Catalyst — faster, no
Python in the loop); this source exists for ergonomics (``spark.read``
composability, schema discovery) and as the pattern to follow when a format
genuinely cannot be expressed with DataFrame ops. Semantics are identical
to bom.py:94-157's intended behavior and are parity-tested against the
Catalyst path (tests/test_datasource.py).
"""

from __future__ import annotations

import glob
import os
import re
from datetime import datetime, timezone
from zoneinfo import ZoneInfo

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .decode import DATE_GRAMMAR, DOUBLE_GRAMMAR, HOUR_GRAMMAR

SYDNEY = ZoneInfo("Australia/Sydney")

#: Spark's UTF8String.trimAll class: every char <= 0x20 PLUS \x7f (DEL)
#: — what try_cast(.. AS INT) strips from string ends before parsing.
#: The \x7f member was found by the r15 seeded byte-fuzzer (seed 41):
#: Spark parses '\x7f3' as 3 where a bare <=0x20 mirror NULLs it. Probed
#: exhaustively over 0x00-0xFF + Unicode spaces: nothing else strips.
#: (try_cast AS DOUBLE does NOT strip \x7f — irrelevant here because the
#: pinned DOUBLE_GRAMMAR anchors reject control chars on every path.)
_TRIMALL = "".join(chr(c) for c in range(0x21)) + "\x7f"
_INT_RE = re.compile(r"[+-]?[0-9]+\Z")
# the PINNED header-double grammar: anchored on the RAW token, no
# trimAll — Spark's bare try_cast would additionally accept Java literal
# forms ('0.5d', '0x1p3'), which the engine defines as malformed;
# Python's float() alone is laxer still (underscores, unicode digits).
# The core alternation is SHARED with decode.DOUBLE_TOKEN_RE and the
# oracle's _sql_try_double, so the three mirrors cannot drift.
_DOUBLE_RE = re.compile(f"(?:{DOUBLE_GRAMMAR})\\Z", re.IGNORECASE)
# the PINNED filename-date grammar — compiled from the SHARED core
# (decode.DATE_GRAMMAR/HOUR_GRAMMAR, one definition across all mirrors).
# Python's strptime is width-LAX ('2018041' parses as 2018-04-01) where
# Spark's try_to_timestamp is strict — the guard keeps the mirrors
# identical; years 0000/9999 are excluded by the shared core.
_DATE_RE = re.compile(DATE_GRAMMAR + r"\Z")
_HOUR_RE = re.compile(HOUR_GRAMMAR + r"\Z")


def _try_int(s: str):
    """Python mirror of Spark ``try_cast(s AS INT)`` — the Catalyst decode
    path is the semantic source of truth, and bare ``int()`` is laxer
    (accepts '1_0' underscores and non-ASCII unicode digits)."""
    s = s.strip(_TRIMALL)
    if not _INT_RE.match(s):
        return None
    v = int(s)
    return v if -2147483648 <= v <= 2147483647 else None


def _try_double(s: str):
    """The pinned header-double grammar over the raw token."""
    if not _DOUBLE_RE.match(s):
        return None
    return float(s)

SCHEMA = (
    "Date timestamp, RadiationType string, Longitude double, Latitude double, "
    "Radiation int, year int, month int, day int, hour int"
)


def _parse_filename(path: str):
    """Grammar 1 (bom.py:94-107): <base>_<TYPE>_<YYYYMMDD>_<HHMM...>.<ext> —
    returns (radiation_type, sydney_wall_clock), each independently None.

    Field independence mirrors the Catalyst path (weird-grid net r14): a
    parseable type piece with a malformed date piece keeps the type and
    NULLs only the timestamp — with_filename_metadata extracts each field
    with its own try_element_at/try_to_timestamp."""
    stem = os.path.splitext(os.path.basename(path))[0]
    pieces = stem.split("_")
    rad_type = pieces[1] if len(pieces) > 1 else None
    if len(pieces) < 4:
        return rad_type, None
    if not _DATE_RE.match(pieces[2]) or not _HOUR_RE.match(pieces[3][:2]):
        return rad_type, None
    try:
        utc = datetime.strptime(f"{pieces[2]} {pieces[3][:2]}", "%Y%m%d %H").replace(
            tzinfo=timezone.utc
        )
        # astimezone INSIDE the try (ADVICE r14): the pinned grammar now
        # excludes year 9999, but a read task must never abort on a
        # timezone-conversion overflow — belt (grammar) and braces
        # (OverflowError -> NULL timestamp, the quarantine contract).
        syd = utc.astimezone(SYDNEY).replace(tzinfo=None)  # wall clock, naive
    except (ValueError, OverflowError):
        return rad_type, None
    return rad_type, syd


def _decode_file(path: str):
    """Grid text -> point tuples; malformed input degrades to zero rows
    (the quarantine contract, bom.py:82-84 upgraded).

    Every parse step mirrors the Catalyst path (decode.py) exactly — the
    weird-grid parity net (r14) pins row-identical output on ragged /
    malformed / mixed-separator corpora:

    * ``errors='replace'`` (U+FFFD like Spark's text reader), not the
      reference's ``errors='ignore'`` (bom.py:57-59) whose byte-dropping
      could SPLICE digits across a corrupt gap into a plausible value;
    * lines split on ``\\r?\\n`` only (``str.splitlines`` also splits on
      \\x0b/\\x0c/\\x85/U+2028 and lone \\r, which Catalyst keeps in-line);
    * header ints/doubles and body cells through the try_cast mirrors
      (strict per-field — the old ``int(float(...))`` read 'ncols 4.5'
      as 4 where the Catalyst path yields NULL and decodes zero rows);
    * negative declared nrows/ncols clamp to zero rows/cells."""
    rad_type, syd = _parse_filename(path)
    # newline='': Python's universal-newline mode would silently translate
    # a LONE \r into \n, splitting lines the Catalyst \r?\n split keeps
    with open(path, encoding="utf-8", errors="replace", newline="") as fh:
        lines = re.split(r"\r?\n", fh.read())

    def header_field(line_no: int):
        """decode.py _header_field: token 2 of the whitespace-split line.
        strip(' ') not strip(): Spark's F.trim removes SPACES only, so a
        tab-led header line keeps its empty first token on both paths.
        ASCII whitespace class, not Python's Unicode-aware \\s: Java's \\s
        matches exactly [ \\t\\n\\x0b\\f\\r], so an ideographic-space-
        separated header must stay ONE token (-> NULL field) on every
        path. NOTE RE2's \\s is [\\t\\n\\f\\r ] — it EXCLUDES \\x0b — so
        the DuckDB oracle spells this class out too (ADVICE r14; a
        '\\x0b'-separated header would otherwise parse on both engine
        paths but NULL in the oracle)."""
        if line_no >= len(lines):
            return None
        toks = re.split(r"[ \t\n\x0b\f\r]+", lines[line_no].strip(" "))
        return toks[1] if len(toks) > 1 else None

    hdr = [header_field(i) for i in range(6)]
    ncols = _try_int(hdr[0]) if hdr[0] is not None else None
    nrows = _try_int(hdr[1]) if hdr[1] is not None else None
    xll = _try_double(hdr[2]) if hdr[2] is not None else None
    yll = _try_double(hdr[3]) if hdr[3] is not None else None
    cs = _try_double(hdr[4]) if hdr[4] is not None else None
    nodata = _try_int(hdr[5]) if hdr[5] is not None else None
    # Catalyst parity: NULL ncols/nrows -> zero cells/rows, NULL nodata ->
    # the `radiation != nodata` predicate drops everything; but NULL
    # xll/yll/cs still EMITS points, with the coordinates NULLed PER AXIS
    # (Longitude needs xll+cs, Latitude needs yll+cs — a garbled xll
    # alone keeps real latitudes, code-review r14)
    if ncols is None or nrows is None or nodata is None:
        return
    lat_ok = yll is not None and cs is not None
    lon_ok = xll is not None and cs is not None
    y0 = yll + nrows * cs if lat_ok else None
    for r in range(min(nrows, max(len(lines) - 6, 0))):
        cells = lines[6 + r].rstrip(" ").split(" ")
        lat = y0 - (r + 1) * cs if lat_ok else None
        for c, cell in enumerate(cells[: max(ncols, 0)]):
            v = _try_int(cell)
            if v is None:
                continue  # malformed cell: skipped, but position consumed
            if v == nodata:
                continue  # nodata advances longitude (bom.py:146-149)
            lon = xll + c * cs if lon_ok else None
            if syd is None:
                yield (None, rad_type, lon, lat, v, None, None, None, None)
            else:
                yield (
                    syd,
                    rad_type,
                    lon,
                    lat,
                    v,
                    syd.year,
                    syd.month,
                    syd.day,
                    syd.hour,
                )


class _GridFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class EsriGridReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("esri_grid: 'path' option (or load(path)) is required")

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(glob.glob(os.path.join(self.path, "*")))
        else:
            files = sorted(glob.glob(self.path)) or [self.path]
        # one partition per file: the file is the unit of parallelism
        return [_GridFilePartition(f) for f in files if os.path.isfile(f)]

    def read(self, partition: _GridFilePartition):
        yield from _decode_file(partition.path)


class EsriGridDataSource(DataSource):
    """``spark.dataSource.register(EsriGridDataSource)`` then
    ``spark.read.format("esri_grid").load(dir)``."""

    @classmethod
    def name(cls) -> str:
        return "esri_grid"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> EsriGridReader:
        return EsriGridReader(self.options)
