#!/usr/bin/env python
"""Dump .explain('formatted') for the round-17 optimization targets.

Usage: python tools/dump_plans_r17.py <suffix> [name ...]
Writes plans/r17/<name>_<suffix>.txt for each requested registry entry
(default: the full r17 touch list).  Run BEFORE and AFTER each change so
the judge can check plan claims against committed artifacts.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "n42_minhash_banded_lsh",
    "n49_incremental_lsh_dedup",
    "n48_authority_weighted_sampling",
    "n47_source_pagerank",
    "n36_minhash_estimate",
]


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    from etl_bom_radiation_spark.queries import load_all
    from etl_bom_radiation_spark.session import get_spark

    spark = get_spark(app_name="plandump_r17")
    qs = load_all()
    sf = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", "r17")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name].fn(spark, sf)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(p)
        n_scans = p.count("Scan parquet")
        n_rdd = p.count("Scan ExistingRDD")
        n_bc = p.count("BroadcastExchange (")
        n_ex = p.count("Exchange (")
        print(f"{name}: parquet={n_scans} rdd={n_rdd} bcast={n_bc} exch={n_ex} -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
