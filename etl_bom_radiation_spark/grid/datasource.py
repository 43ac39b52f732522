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
from datetime import datetime, timezone
from zoneinfo import ZoneInfo

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SYDNEY = ZoneInfo("Australia/Sydney")

SCHEMA = (
    "Date timestamp, RadiationType string, Longitude double, Latitude double, "
    "Radiation int, year int, month int, day int, hour int"
)


def _parse_filename(path: str):
    """Grammar 1 (bom.py:94-107): <base>_<TYPE>_<YYYYMMDD>_<HHMM...>.<ext> —
    returns (radiation_type, sydney_wall_clock) or (None, None)."""
    stem = os.path.splitext(os.path.basename(path))[0]
    pieces = stem.split("_")
    if len(pieces) < 4:
        return None, None
    try:
        utc = datetime.strptime(f"{pieces[2]} {pieces[3][:2]}", "%Y%m%d %H").replace(
            tzinfo=timezone.utc
        )
    except ValueError:
        return None, None
    syd = utc.astimezone(SYDNEY).replace(tzinfo=None)  # wall clock, naive
    return pieces[1], syd


def _decode_file(path: str):
    """Grid text -> point tuples; malformed input degrades to zero rows
    (the quarantine contract, bom.py:82-84 upgraded)."""
    rad_type, syd = _parse_filename(path)
    try:
        with open(path, encoding="utf-8", errors="ignore") as fh:
            lines = fh.read().splitlines()
        header = {}
        for idx, name in enumerate(
            ("ncols", "nrows", "xllcorner", "yllcorner", "cellsize", "nodata")
        ):
            header[name] = float(lines[idx].split()[1])
        ncols, nrows = int(header["ncols"]), int(header["nrows"])
        xll, yll, cs = header["xllcorner"], header["yllcorner"], header["cellsize"]
        nodata = int(header["nodata"])
    except (IndexError, ValueError):
        return
    y0 = yll + nrows * cs
    for r in range(min(nrows, max(len(lines) - 6, 0))):
        cells = lines[6 + r].rstrip().split(" ")
        lat = y0 - (r + 1) * cs
        for c, cell in enumerate(cells[:ncols]):
            try:
                v = int(cell)
            except ValueError:
                continue  # malformed cell: skipped, but position consumed
            if v == nodata:
                continue  # nodata advances longitude (bom.py:146-149)
            lon = xll + c * cs
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
