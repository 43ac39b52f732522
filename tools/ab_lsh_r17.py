#!/usr/bin/env python
"""One side of the r17 interleaved A/B over the LSH/pagerank touch list.

Times the round's changed registry entries (noop sink, warm + median-of-3
— bench.py's v3 statistic) plus the four lsh_index levers, with two
untouched controls (q13_multiway_join, n14_decontamination) and a spin
canary pair so cross-invocation drift is visible.  Run alternately on the
before/after trees (git stash) — cold JVM per invocation, same box, same
ordering — and compare medians per entry.

Usage: python tools/ab_lsh_r17.py <tag>     # prints one JSON line
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ENTRIES = [
    "n42_minhash_banded_lsh",
    "n49_incremental_lsh_dedup",
    "n36_minhash_estimate",
    "n48_authority_weighted_sampling",
    "q13_multiway_join",      # untouched control
    "n14_decontamination",    # untouched control
]


def _spin() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return round(time.perf_counter() - t0, 3)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(fn, reps: int = 3) -> float:
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return round(ts[len(ts) // 2], 3)


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "ab"
    spin0 = _spin()
    from pyspark.sql import functions as F

    from etl_bom_radiation_spark.lsh_index import (
        admit_batch,
        build_lsh_index,
        probe_lsh_index,
    )
    from etl_bom_radiation_spark.queries import load_all
    from etl_bom_radiation_spark.session import get_spark

    spark = get_spark(app_name=f"ab_lsh_r17_{tag}")
    qs = load_all()
    out: dict[str, float] = {}
    for name in ENTRIES:
        spark.sparkContext.setJobDescription(f"ab:{name}")
        out[name] = _timed(lambda n=name: _noop(qs[n].fn(spark, SF_DIR)))
    lsh_dir = tempfile.mkdtemp(prefix="ab_lshidx_")
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        idx_docs = docs.filter((F.col("doc_id") % 10) != 7)
        batch = docs.filter((F.col("doc_id") % 10) == 7)

        def _cold():
            build_lsh_index(spark, idx_docs, f"{lsh_dir}/cold")
            _noop(probe_lsh_index(spark, f"{lsh_dir}/cold", batch))

        spark.sparkContext.setJobDescription("ab:lsh_probe_cold")
        out["lsh_probe_cold"] = _timed(_cold)
        build_lsh_index(spark, idx_docs, f"{lsh_dir}/warm")
        spark.sparkContext.setJobDescription("ab:lsh_probe_warm")
        out["lsh_probe_warm"] = _timed(
            lambda: _noop(probe_lsh_index(spark, f"{lsh_dir}/warm", batch))
        )
        admit_src = batch.withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
        n_batch = admit_src.count()

        def _admit(max_docs):
            def run():
                tgt = f"{lsh_dir}/admit_{time.time_ns()}"
                shutil.copytree(f"{lsh_dir}/warm", tgt)
                _noop(admit_batch(spark, tgt, admit_src, max_docs=max_docs))

            return run

        spark.sparkContext.setJobDescription("ab:lsh_admit_oneshot")
        out["lsh_admit_oneshot"] = _timed(_admit(None))
        spark.sparkContext.setJobDescription("ab:lsh_admit_split4")
        out["lsh_admit_split4"] = _timed(_admit(max(1, -(-n_batch // 4))))
    finally:
        shutil.rmtree(lsh_dir, ignore_errors=True)
    spin1 = _spin()
    print(json.dumps({"tag": tag, "spin": [spin0, spin1], "timings": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
