"""Golden + property tests for the flagship grid decode (SURVEY §5.2.2-3)."""

from __future__ import annotations

import random
from pathlib import Path

from etl_bom_radiation_spark.grid.decode import decode_grid_directory
from etl_bom_radiation_spark.grid.filenames import parse_run_timestamp

FIXTURES = Path(__file__).resolve().parent.parent / "fixtures" / "grids"

GOLDEN = {
    # (Longitude, Latitude) -> Radiation ; FIXTURES.md §A.2
    (112.0, -43.0): 10,
    (113.0, -43.0): 12,
    (113.5, -43.0): 13,
    (112.0, -43.5): 20,
    (112.5, -43.5): 21,
    (113.5, -43.5): 23,
    (112.0, -44.0): 30,
    (112.5, -44.0): 31,
    (113.0, -44.0): 32,
}


def _with_date_str(df):
    """Assert on JVM-side formatting: collect() renders TimestampType via the
    driver OS timezone, so strftime on collected datetimes is only correct on
    a UTC machine (ADVICE r1)."""
    from pyspark.sql import functions as F

    return df.withColumn("date_str", F.date_format("Date", "yyyy-MM-dd HH:mm"))


def test_golden_grid_aest(spark):
    """UTC 2018-04-01 01:00 -> Sydney AEST (UTC+10) 2018-04-01 11:00."""
    df = _with_date_str(
        decode_grid_directory(spark, str(FIXTURES / "IDCJ0000_GLOBAL_20180401_0100.txt"))
    )
    rows = df.collect()
    assert len(rows) == 9
    got = {(r.Longitude, r.Latitude): r.Radiation for r in rows}
    assert got == GOLDEN
    r0 = rows[0]
    assert r0.RadiationType == "GLOBAL"
    assert r0.date_str == "2018-04-01 11:00"
    assert (r0.year, r0.month, r0.day, r0.hour) == (2018, 4, 1, 11)


def test_golden_grid_aedt(spark):
    """UTC 2018-03-30 01:00 -> Sydney AEDT (UTC+11) 2018-03-30 12:00."""
    df = _with_date_str(
        decode_grid_directory(spark, str(FIXTURES / "IDCJ0000_GLOBAL_20180330_0100.txt"))
    )
    r0 = df.collect()[0]
    assert r0.date_str == "2018-03-30 12:00"
    assert r0.hour == 12


def _write_random_grid(path: Path, rng: random.Random) -> tuple[int, int, float, float, float, int, list[list[int]]]:
    ncols, nrows = rng.randint(1, 12), rng.randint(1, 9)
    xll = round(rng.uniform(-180, 170), 2)
    yll = round(rng.uniform(-80, 70), 2)
    cs = rng.choice([0.25, 0.5, 1.0])
    nodata = -999
    body = [
        [nodata if rng.random() < 0.3 else rng.randint(0, 40) for _ in range(ncols)]
        for _ in range(nrows)
    ]
    lines = [
        f"ncols {ncols}",
        f"nrows {nrows}",
        f"xllcorner {xll}",
        f"yllcorner {yll}",
        f"cellsize {cs}",
        f"NODATA_value {nodata}",
        *(" ".join(str(v) for v in row) for row in body),
    ]
    path.write_text("\n".join(lines) + "\n")
    return ncols, nrows, xll, yll, cs, nodata, body


def test_random_grid_invariants(spark, tmp_path):
    """SURVEY §5.2.3 property invariants on randomized grids."""
    rng = random.Random(7)
    for i in range(5):
        p = tmp_path / f"rand{i}_GLOBAL_20200115_{i:02d}00.txt"
        ncols, nrows, xll, yll, cs, nodata, body = _write_random_grid(p, rng)
        df = decode_grid_directory(spark, str(p))
        rows = df.collect()
        n_nodata = sum(v == nodata for r in body for v in r)
        assert len(rows) == ncols * nrows - n_nodata
        if rows:
            lons = [r.Longitude for r in rows]
            lats = [r.Latitude for r in rows]
            assert min(lons) >= xll - 1e-9
            assert max(lons) <= xll + (ncols - 1) * cs + 1e-9
            assert max(lats) <= yll + (nrows - 1) * cs + 1e-9
            assert min(lats) >= yll - 1e-9
        # roundtrip: every surviving cell matches its source value
        for r in rows:
            col = round((r.Longitude - xll) / cs)
            row_i = round((yll + nrows * cs - r.Latitude) / cs) - 1
            assert body[row_i][col] == r.Radiation


def test_nodata_advances_longitude(spark, tmp_path):
    """The trap in bom.py:146-149: x advances across skipped nodata cells."""
    p = tmp_path / "t_GLOBAL_20200101_0000.txt"
    p.write_text(
        "ncols 3\nnrows 1\nxllcorner 0.0\nyllcorner 0.0\ncellsize 1.0\n"
        "NODATA_value -1\n-1 5 -1\n"
    )
    rows = decode_grid_directory(spark, str(p)).collect()
    assert len(rows) == 1
    assert rows[0].Longitude == 1.0  # NOT 0.0 — the nodata cell consumed x=0


def test_malformed_inputs_degrade_to_null_not_crash(spark, tmp_path):
    """ANSI-mode safety (ADVICE r1): malformed cells/headers/filenames must
    yield NULL-degraded (dropped) rows, never abort the batch — mirroring the
    reference's per-file try/except quarantine (bom.py:82-84)."""
    # malformed cell value in an otherwise good grid
    good = tmp_path / "a_GLOBAL_20200101_0000.txt"
    good.write_text(
        "ncols 3\nnrows 1\nxllcorner 0.0\nyllcorner 0.0\ncellsize 1.0\n"
        "NODATA_value -1\n7 oops 9\n"
    )
    # truncated file: header only, fewer than 6 lines
    trunc = tmp_path / "b_GLOBAL_20200101_0100.txt"
    trunc.write_text("ncols 3\nnrows 1\n")
    # filename that doesn't match grammar 1 at all
    badname = tmp_path / "nounderscores.txt"
    badname.write_text(
        "ncols 1\nnrows 1\nxllcorner 0.0\nyllcorner 0.0\ncellsize 1.0\n"
        "NODATA_value -1\n3\n"
    )
    rows = decode_grid_directory(spark, str(tmp_path)).collect()
    # good file contributes its 2 parseable cells; trunc contributes 0;
    # badname decodes its grid but with NULL Date/RadiationType.
    vals = sorted(r.Radiation for r in rows)
    assert vals == [3, 7, 9]
    by_rad = {r.Radiation: r for r in rows}
    assert by_rad[3].Date is None and by_rad[3].RadiationType is None
    assert by_rad[7].Date is not None


def test_filename_grammar2(spark):
    """bom_partition.py:14-26 — NEMPriceSetter_20171031123.csv -> 04:00 + 615m."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("NEMPriceSetter_20171031123.csv",), ("no_digits_here.csv",)], ["fn"]
    ).select(
        # JVM-side formatting: collected datetimes render in the driver OS
        # timezone (ADVICE r1)
        F.date_format(parse_run_timestamp("fn"), "yyyy-MM-dd HH:mm").alias("ts_str")
    )
    got = [r.ts_str for r in df.collect()]
    assert got[0] == "2017-10-31 14:15"
    assert got[1] is None


def test_filename_grammar2_dst_straddle(spark):
    """VERDICT r3 #7: grammar 2's 04:00-base + 5-min-slot arithmetic is
    NAIVE calendar math (bom_partition.py:25 uses plain datetime+timedelta,
    no pytz) — unlike grammar 1, no Sydney conversion may sneak in. Pinned
    on both AEDT transitions: slot 264 from Oct 6 lands on 02:00 of the
    spring-forward night (a Sydney wall clock that does NOT exist on
    2018-10-07 — naive math must still produce it), and slot 276 from
    Mar 31 lands on the fall-back night's repeated 03:00 unambiguously."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            # 2018-10-06 04:00 + 264*5min = +22h -> 2018-10-07 02:00
            ("NEMPriceSetter_20181006264.csv",),
            # 2018-03-31 04:00 + 276*5min = +23h -> 2018-04-01 03:00
            ("NEMPriceSetter_20180331276.csv",),
        ],
        ["fn"],
    ).select(F.date_format(parse_run_timestamp("fn"), "yyyy-MM-dd HH:mm").alias("t"))
    got = [r.t for r in df.collect()]
    assert got == ["2018-10-07 02:00", "2018-04-01 03:00"]

def test_overlong_body_line_truncates_to_ncols(spark, tmp_path):
    """ADVICE r2: a body line with MORE cells than ncols must not emit
    points past the grid's east edge — the Catalyst path truncates to
    ncols exactly like the Python DataSource (cells[:ncols]) and the
    DuckDB oracle (j <= ncols)."""
    p = tmp_path / "t_GLOBAL_20200101_0000.txt"
    p.write_text(
        "ncols 2\nnrows 1\nxllcorner 0.0\nyllcorner 0.0\ncellsize 1.0\n"
        "NODATA_value -1\n4 5 6 7\n"  # 4 cells, ncols=2
    )
    rows = decode_grid_directory(spark, str(p)).collect()
    assert sorted(r.Radiation for r in rows) == [4, 5]
    assert max(r.Longitude for r in rows) == 1.0  # east edge respected

def test_negative_header_values_degrade_not_crash(spark, tmp_path):
    """code-review r3: a header declaring negative ncols/nrows must clamp
    that file to zero rows (F.slice throws on negative lengths) — the good
    file in the same batch still decodes."""
    good = tmp_path / "a_GLOBAL_20200101_0000.txt"
    good.write_text(
        "ncols 2\nnrows 1\nxllcorner 0.0\nyllcorner 0.0\ncellsize 1.0\n"
        "NODATA_value -1\n7 9\n"
    )
    neg_rows = tmp_path / "b_GLOBAL_20200101_0100.txt"
    neg_rows.write_text(
        "ncols 2\nnrows -2\nxllcorner 0.0\nyllcorner 0.0\ncellsize 1.0\n"
        "NODATA_value -1\n1 2\n"
    )
    neg_cols = tmp_path / "c_GLOBAL_20200101_0200.txt"
    neg_cols.write_text(
        "ncols -3\nnrows 1\nxllcorner 0.0\nyllcorner 0.0\ncellsize 1.0\n"
        "NODATA_value -1\n1 2 3\n"
    )
    rows = decode_grid_directory(spark, str(tmp_path)).collect()
    assert sorted(r.Radiation for r in rows) == [7, 9]

def test_crlf_and_trailing_whitespace(spark, tmp_path):
    """Windows-origin grid files: CRLF line endings and trailing spaces on
    body lines must decode identically to the Unix form (the reference's
    splitlines() handled both; our split is \\r?\\n + rtrim)."""
    unix = tmp_path / "a_GLOBAL_20200101_0000.txt"
    unix.write_text(
        "ncols 2\nnrows 2\nxllcorner 10.0\nyllcorner 20.0\ncellsize 1.0\n"
        "NODATA_value -1\n1 2\n3 -1\n"
    )
    crlf = tmp_path / "b_GLOBAL_20200101_0000.txt"
    crlf.write_bytes(
        b"ncols 2\r\nnrows 2\r\nxllcorner 10.0\r\nyllcorner 20.0\r\ncellsize 1.0\r\n"
        b"NODATA_value -1\r\n1 2 \r\n3 -1\r\n"
    )
    rows = decode_grid_directory(spark, str(tmp_path)).collect()
    # both files decode to the same 3 surviving points
    # (y0 = 20 + 2*1 = 22: row 0 -> lat 21, row 1 -> lat 20)
    assert len(rows) == 6
    pts = sorted({(r.Longitude, r.Latitude, r.Radiation) for r in rows})
    assert pts == [(10.0, 20.0, 3), (10.0, 21.0, 1), (11.0, 21.0, 2)]

def test_gzipped_grid_decodes_transparently(spark, tmp_path):
    """Compressed archives are the norm for bulk raster feeds: the
    wholetext reader decompresses .gz via the Hadoop codec chain, so a
    gzipped grid decodes identically to its plain-text twin with no code
    path change (files stay per-file tasks — gzip is unsplittable, which
    matches the grid format's own unsplittability)."""
    import gzip

    plain = tmp_path / "a_GLOBAL_20200101_0000.txt"
    body = (
        "ncols 2\nnrows 1\nxllcorner 0.0\nyllcorner 0.0\ncellsize 1.0\n"
        "NODATA_value -1\n7 9\n"
    )
    plain.write_text(body)
    with gzip.open(tmp_path / "b_GLOBAL_20200101_0100.txt.gz", "wt") as fh:
        fh.write(body)
    rows = decode_grid_directory(spark, str(tmp_path)).collect()
    assert sorted(r.Radiation for r in rows) == [7, 7, 9, 9]
    hours = {r.Date.hour for r in rows}
    assert len(hours) == 2  # both files parsed their own filename metadata


def test_regrid_and_gradient_match_independent_python_model(spark):
    """Third-implementation cross-check for the raster extensions: parse
    the golden fixtures in pure Python (no Spark, no DuckDB) and fold the
    same midpoint-mean / central-difference definitions; the declared
    queries must reproduce them exactly."""
    import glob
    import math

    from etl_bom_radiation_spark.queries import load_all

    qs = load_all()

    def parse(path):
        with open(path) as fh:
            lines = [ln.rstrip("\n") for ln in fh]
        hdr = {ln.split()[0].lower(): float(ln.split()[1]) for ln in lines[:6]}
        ncols, nrows = int(hdr["ncols"]), int(hdr["nrows"])
        xll, yll, cs, nod = hdr["xllcorner"], hdr["yllcorner"], hdr["cellsize"], int(hdr["nodata_value"])
        pts = {}
        for i, ln in enumerate(lines[6 : 6 + nrows], start=1):
            for j, tok in enumerate(ln.split(" "), start=1):
                v = int(tok)
                if v != nod:
                    pts[(xll + (j - 1) * cs, yll + nrows * cs - i * cs)] = v
        return cs, pts

    # mixed-resolution corpus (VERDICT r5 #2): model every file with ITS
    # OWN header cellsize and key expectations by (cellsize, target) — the
    # engine output carries cellsize in its grouping key, so same-lattice
    # files (the two GLOBAL fixtures share one matrix) merge to identical
    # values and different lattices never mix
    want_regrid: dict = {}
    want_grad: dict = {}
    for path in sorted(glob.glob("fixtures/grids_multires/*.txt")):
        cs, pts = parse(path)

        regrid = {}
        for (x, y), v in pts.items():
            for dx in (0, 1):
                for dy in (0, 1):
                    t = (round(x + cs / 2 - dx * cs, 6), round(y + cs / 2 - dy * cs, 6))
                    regrid.setdefault(t, []).append(v)
        for t, vs in regrid.items():
            if len(vs) == 4:
                want_regrid[(cs, t)] = round(sum(vs) / 4.0, 6)

        # central differences at every lattice position with all 4 neighbors
        coords = set(pts)
        for (x, y) in {(round(x, 6), round(y, 6)) for (x, y) in coords} | {
            (round(x + sx * cs, 6), round(y + sy * cs, 6))
            for (x, y) in coords
            for sx, sy in ((1, 0), (-1, 0), (0, 1), (0, -1))
        }:
            def get(a, b):
                return pts.get((a, b))
            l, r = get(round(x - cs, 6), y), get(round(x + cs, 6), y)
            d, u = get(x, round(y - cs, 6)), get(x, round(y + cs, 6))
            if None in (l, r, d, u):
                continue
            gx, gy = (r - l) / (2 * cs), (u - d) / (2 * cs)
            want_grad[(cs, (x, y))] = (
                round(gx, 6), round(gy, 6), round(math.sqrt(gx * gx + gy * gy), 6)
            )

    got_regrid = {
        (r.cellsize, (r.tlon, r.tlat)): r.value
        for r in qs["g_regrid_bilinear"].fn(spark, "").collect()
    }
    got_grad = {
        (r.cellsize, (r.lon, r.lat)): (r.grad_x, r.grad_y, r.magnitude)
        for r in qs["g_gradient"].fn(spark, "").collect()
    }
    # every model target must appear with the model value
    for t, v in want_regrid.items():
        assert got_regrid.get(t) == v, (t, v, got_regrid.get(t))
    for t, g in want_grad.items():
        assert got_grad.get(t) == g, (t, g, got_grad.get(t))
    # and nothing beyond the model's gated targets
    assert set(got_regrid) == set(want_regrid)
    assert set(got_grad) == set(want_grad)


def test_with_filename_metadata_rejects_colliding_input(spark):
    """ADVICE r15: the helper is public API and now projects via
    select("*", ...), which would emit ambiguous duplicate columns if the
    input already carries an output name — it must refuse loudly instead."""
    import pytest

    from etl_bom_radiation_spark.grid.decode import with_filename_metadata

    fresh = spark.createDataFrame(
        [("a/IDCJ0000_GLOBAL_20180401_0100.txt", "x")], ["_path", "_content"]
    )
    out = with_filename_metadata(fresh)
    assert len(out.columns) == len(set(out.columns))  # no duplicates
    with pytest.raises(ValueError, match="already carries"):
        with_filename_metadata(out)  # carries all five output columns
    from pyspark.sql import functions as F

    stale = fresh.withColumn("Date", F.lit("already-there"))
    with pytest.raises(ValueError, match="Date"):
        with_filename_metadata(stale)
