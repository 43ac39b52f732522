#!/usr/bin/env python
"""Task-count vs split-size experiment for the whole-file grid decode
(VERDICT r16 #6: grid_decode's 8-core run beat its 32-core run, ratio
0.70 — scheduler-bound on 1000 tiny files, guide §2.6/§6).

Times decode_grid_directory + noop over the bench's own 1000-file corpus
under a matrix of (spark.sql.files.maxPartitionBytes,
spark.sql.files.openCostInBytes, spark.sql.files.minPartitionNum)
settings, one fresh JVM per cell (file-split planning caches per
session), and reports the scan task count per cell.

Usage: python tools/probe_grid_sched_r17.py <maxPartitionBytes> <openCost> [minPartitionNum]
       (run one cell per invocation; '-' keeps the default)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    mpb, oc = sys.argv[1], sys.argv[2]
    mpn = sys.argv[3] if len(sys.argv) > 3 else "-"
    conf = {}
    if mpb != "-":
        conf["spark.sql.files.maxPartitionBytes"] = mpb
    if oc != "-":
        conf["spark.sql.files.openCostInBytes"] = oc
    if mpn != "-":
        conf["spark.sql.files.minPartitionNum"] = mpn
    from etl_bom_radiation_spark.grid.decode import decode_grid_directory
    from etl_bom_radiation_spark.session import get_spark

    # the bench's corpus generator, untimed (repo root already on path;
    # bench.py is import-safe — main() is __main__-guarded)
    import bench  # noqa: E402

    grids = bench._gen_grids()
    spark = get_spark(app_name="probe_grid_sched", extra_conf=conf)
    sc = spark.sparkContext
    try:
        decode_grid_directory(spark, grids).write.format("noop").mode(
            "overwrite"
        ).save()  # warm
        # scan task count: one job's first stage
        tracker = sc.statusTracker()
        before_stages = set(tracker.getActiveStageIds())
        ts = []
        for _ in range(3):
            d = decode_grid_directory(spark, grids)
            t0 = time.perf_counter()
            d.write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        ts.sort()
        n_parts = decode_grid_directory(spark, grids).rdd.getNumPartitions()
        print(
            json.dumps(
                {
                    "maxPartitionBytes": mpb,
                    "openCost": oc,
                    "minPartitionNum": mpn,
                    "scan_partitions": n_parts,
                    "reps": ts,
                    "median": ts[1],
                }
            )
        )
    finally:
        import shutil

        shutil.rmtree(grids, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
