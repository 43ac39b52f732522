"""Hypothesis property tests (SURVEY §5.2 item 3).

Two engine-invariants that hand-picked examples can't pin down:

* grid decode roundtrip — for ANY well-formed grid, decode then re-pivot
  reproduces the input matrix exactly, and the row count equals
  ncols*nrows - #nodata;
* the engine-neutral polynomial hash used by the LLM fingerprint/simhash
  operators matches an independent Python fold for ANY ASCII token (this is
  the property that makes their DuckDB oracles exact).

Grids are generated data-first and written to files; Spark sessions are
expensive so examples are kept small and deadline disabled.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from etl_bom_radiation_spark.grid.decode import decode_grid_directory

NODATA = -999

grid_strategy = st.tuples(
    st.integers(min_value=1, max_value=6),  # ncols
    st.integers(min_value=1, max_value=5),  # nrows
    st.sampled_from([0.25, 0.5, 1.0]),  # cellsize
    st.integers(min_value=-170, max_value=160),  # xll (int: exact fp)
    st.integers(min_value=-80, max_value=70),  # yll
    st.data(),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.data_too_large],
)
@given(params=grid_strategy)
def test_decode_roundtrip(spark, tmp_path_factory, params):
    ncols, nrows, cs, xll, yll, data = params
    body = [
        [
            data.draw(st.one_of(st.just(NODATA), st.integers(min_value=0, max_value=99)))
            for _ in range(ncols)
        ]
        for _ in range(nrows)
    ]
    d = tmp_path_factory.mktemp("grids")
    p = d / "H_GLOBAL_20210601_0300.txt"
    p.write_text(
        f"ncols {ncols}\nnrows {nrows}\nxllcorner {xll}\nyllcorner {yll}\n"
        f"cellsize {cs}\nNODATA_value {NODATA}\n"
        + "\n".join(" ".join(str(v) for v in row) for row in body)
        + "\n"
    )
    rows = decode_grid_directory(spark, str(p)).collect()

    n_nodata = sum(v == NODATA for r in body for v in r)
    assert len(rows) == ncols * nrows - n_nodata

    # re-pivot: every decoded point back to its matrix cell, exactly
    rebuilt = [[NODATA] * ncols for _ in range(nrows)]
    for r in rows:
        c = round((r.Longitude - xll) / cs)
        i = round((yll + nrows * cs - r.Latitude) / cs) - 1
        assert 0 <= c < ncols and 0 <= i < nrows
        assert rebuilt[i][c] == NODATA  # no cell decoded twice
        rebuilt[i][c] = r.Radiation
    assert rebuilt == body


def _py_polyhash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % 2147483647
    return h


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    tokens=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=12
        ),
        min_size=1,
        max_size=8,
    )
)
def test_polyhash_matches_python_fold(spark, tokens):
    from etl_bom_radiation_spark.queries.llm_queries import _polyhash

    df = spark.createDataFrame([(t,) for t in tokens], ["tok"]).select(
        "tok", _polyhash(F.col("tok")).alias("h")
    )
    got = {r["tok"]: r["h"] for r in df.collect()}
    assert got == {t: _py_polyhash(t) for t in tokens}
