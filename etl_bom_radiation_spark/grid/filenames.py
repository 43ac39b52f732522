"""Filename grammar 2: 11-digit run ``YYYYMMDDNNN`` (SURVEY §2.D F2/F3/F9).

Mirrors ``parse_filename`` in the reference partition lambda
(reference bom-partition/bom_partition.py:14-26): any filename containing an
11-digit run encodes ``YYYY MM DD NNN`` where ``NNN`` is a 5-minute slot
index added to a 04:00 base time. Worked example (bom_partition.py:16-17):
``NEMPriceSetter_20171031123.csv`` -> 2017-10-31 04:00 + 123*5 min.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_run_timestamp(filename: Column | str) -> Column:
    """Column expression: filename -> event timestamp (grammar 2).

    Pure built-ins (regexp_extract + substring + make_timestamp + interval
    arithmetic) so it stays JVM-side; NULL when no 11-digit run is present.
    """
    col = F.col(filename) if isinstance(filename, str) else filename
    run = F.regexp_extract(col, r"(\d{11})", 1)  # bom_partition.py:19
    run = F.when(run == "", None).otherwise(run)
    base = F.make_timestamp(
        F.substring(run, 1, 4).cast("int"),   # bom_partition.py:20
        F.substring(run, 5, 2).cast("int"),   # :21
        F.substring(run, 7, 2).cast("int"),   # :22
        F.lit(4),                              # 04:00 base, :25
        F.lit(0),
        F.lit(0),
    )
    minutes = F.substring(run, 9, 3).cast("int") * 5  # :23, :25
    return base + F.make_interval(mins=minutes)
