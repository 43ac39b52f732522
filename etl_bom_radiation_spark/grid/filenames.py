"""Filename grammars (SURVEY §2.D F2/F3/F6-F9).

Grammar 1 (``<base>_<TYPE>_<YYYYMMDD>_<HHMM...>.<ext>``, reference
bom/bom.py:94-107) is implemented as Column expressions in
``grid.decode.with_filename_metadata``; this module adds its *driver-side*
counterpart (:func:`sydney_partition_for_filename`) for pruning FS listings
without opening files.

Grammar 2 (:func:`parse_run_timestamp`) mirrors ``parse_filename`` in the
reference partition lambda (reference bom-partition/bom_partition.py:14-26):
any filename containing an 11-digit run ``YYYYMMDDNNN`` encodes
``YYYY MM DD NNN`` where ``NNN`` is a 5-minute slot index added to a 04:00
base time. Worked example (bom_partition.py:16-17):
``NEMPriceSetter_20171031123.csv`` -> 2017-10-31 04:00 + 123*5 min.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone
from zoneinfo import ZoneInfo

from pyspark.sql import Column
from pyspark.sql import functions as F

from .decode import DATE_GRAMMAR, HOUR_GRAMMAR

_SYDNEY = ZoneInfo("Australia/Sydney")


def sydney_partition_for_filename(filename: str) -> tuple[int, int, int, int] | None:
    """Grammar 1, driver-side: filename -> Sydney-local ``(year, month, day,
    hour)`` partition tuple, or None when the grammar misses.

    Must stay in lockstep with ``with_filename_metadata`` + the S4 partition
    keys (bom.py:94-107, bom.py:28-32): stem off the extension, split on
    ``_``, take ``pieces[2]`` as YYYYMMDD and ``pieces[3][:2]`` as the hour,
    parse as UTC, convert to Australia/Sydney (DST-aware). Because a grid
    file's timestamp is constant per file, this tuple IS the file's output
    partition — which makes listing-level pruning exact, not approximate.
    """
    stem = re.sub(r"\.[^.]*$", "", filename)
    pieces = stem.split("_")
    if len(pieces) < 4:
        return None
    # the PINNED date grammar — the SHARED core (decode.DATE_GRAMMAR /
    # HOUR_GRAMMAR; one definition across all mirrors): strptime alone is
    # width-lax ('2018041' parses) and 9999 overflows datetime.max in the
    # Sydney conversion (ADVICE r14). Pruning must agree with the
    # Catalyst parse exactly, or a listing-level prune would route a file
    # the decode NULL-dates into a real hour partition.
    if not re.match(DATE_GRAMMAR + r"\Z", pieces[2]) or not re.match(
        HOUR_GRAMMAR + r"\Z", pieces[3][:2]
    ):
        return None
    try:
        utc = datetime.strptime(f"{pieces[2]} {pieces[3][:2]}", "%Y%m%d %H")
        local = utc.replace(tzinfo=timezone.utc).astimezone(_SYDNEY)
    except (ValueError, OverflowError):
        return None
    return (local.year, local.month, local.day, local.hour)


def utc_hours_for_sydney_partition(
    year: int, month: int, day: int, hour: int
) -> list[datetime]:
    """Grammar 1 inverted: the UTC wall-clock hours whose Sydney-local
    conversion lands in the target ``(year, month, day, hour)`` partition.

    Filenames carry UTC stamps (bom.py:101-104 converts UTC -> Sydney), so
    selecting an hour partition's source files means inverting that
    conversion. Sydney is UTC+10 (AEST) or UTC+11 (AEDT); probing both
    offsets and round-tripping yields the 1 candidate for normal hours, 2
    for the repeated hour at the AEDT->AEST fall-back, 0 for the skipped
    hour at spring-forward — exactly the files that could exist."""
    out = []
    for off in (10, 11):
        try:
            utc = datetime(year, month, day, hour) - timedelta(hours=off)
        except ValueError:
            continue
        local = utc.replace(tzinfo=timezone.utc).astimezone(_SYDNEY)
        if (local.year, local.month, local.day, local.hour) == (year, month, day, hour):
            out.append(utc)
    return out


def parse_run_timestamp(filename: Column | str) -> Column:
    """Column expression: filename -> event timestamp (grammar 2).

    Pure built-ins (regexp_extract + substring + try_make_timestamp +
    interval arithmetic) so it stays JVM-side; NULL when no 11-digit run
    is present OR when the run encodes an invalid calendar date (month 13,
    Feb 29 off-leap — try_make_timestamp instead of make_timestamp, which
    would abort under ANSI; the reference would have crashed on such a
    filename, here it is the same graceful no-op as a missing run, and the
    driver-side twin returns None identically — code-review r6).
    """
    col = F.col(filename) if isinstance(filename, str) else filename
    run = F.regexp_extract(col, r"(\d{11})", 1)  # bom_partition.py:19
    run = F.when(run == "", None).otherwise(run)
    base = F.try_make_timestamp(
        F.substring(run, 1, 4).cast("int"),   # bom_partition.py:20
        F.substring(run, 5, 2).cast("int"),   # :21
        F.substring(run, 7, 2).cast("int"),   # :22
        F.lit(4),                              # 04:00 base, :25
        F.lit(0),
        F.lit(0),
    )
    minutes = F.substring(run, 9, 3).cast("int") * 5  # :23, :25
    return base + F.make_interval(mins=minutes)


def parse_run_timestamp_py(filename: str) -> datetime | None:
    """Driver-side twin of :func:`parse_run_timestamp` (grammar 2): the
    same 11-digit run -> 04:00-base + 5-minute-step arithmetic in plain
    Python, for per-file flows (partition registration) where launching a
    Spark job to parse one filename would be job-scheduling-bound
    (code-review r6). Parity with the Column expression is pinned in
    tests/test_ingest.py. Returns None when no 11-digit run is present or
    the run encodes an invalid calendar date (the Column twin's
    try_make_timestamp NULL)."""
    m = re.search(r"(\d{11})", filename)
    if not m:
        return None
    run = m.group(1)
    try:
        base = datetime(int(run[0:4]), int(run[4:6]), int(run[6:8]), 4, 0, 0)
    except ValueError:
        return None
    return base + timedelta(minutes=int(run[8:11]) * 5)
