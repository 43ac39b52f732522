from __future__ import annotations

import os

import pytest

from etl_bom_radiation_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="etl_bom_radiation_spark-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_sf_dir() -> str:
    return ORACLE_SF_DIR


class LyingFS:
    """Delegates to a real Hadoop FileSystem but makes chosen operations
    fail BY RETURNING FALSE — the Hadoop boolean contract (no exception),
    i.e. the silent failure mode the ADVICE r10 boolean-return discipline
    exists to surface.  ``fail_renames`` / ``fail_deletes`` are counts of
    matching operations to lie about (the real operation is NOT
    performed); ``path_match`` optionally scopes the lie to paths whose
    string contains the substring."""

    def __init__(self, fs, fail_renames=0, fail_deletes=0, path_match=""):
        self._fs = fs
        self._fail_renames = fail_renames
        self._fail_deletes = fail_deletes
        self._path_match = path_match

    def __getattr__(self, name):
        return getattr(self._fs, name)

    def rename(self, src, dst):
        if self._fail_renames > 0 and self._path_match in src.toString():
            self._fail_renames -= 1
            return False
        return self._fs.rename(src, dst)

    def delete(self, path, recursive):
        if self._fail_deletes > 0 and self._path_match in path.toString():
            self._fail_deletes -= 1
            return False
        return self._fs.delete(path, recursive)
