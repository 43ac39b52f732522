#!/usr/bin/env python
"""Count driver jobs + stage IO for admit_batch oneshot/split4 — the
measure-first companion of the r16/r17 admit optimizations (guide §7.3:
driver fixed cost is jobs x ~80ms here).  Replicates bench.py's lever
setup exactly; prints one JSON line per lever with the job count and
wall time so before/after diffs are deterministic.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _jobs(sc) -> int:
    url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/jobs"
    with urllib.request.urlopen(url, timeout=10) as r:
        return len(json.load(r))


def main() -> int:
    from pyspark.sql import functions as F

    from etl_bom_radiation_spark.lsh_index import admit_batch, build_lsh_index, probe_lsh_index
    from etl_bom_radiation_spark.session import get_spark

    spark = get_spark(
        app_name="probe_admit_jobs",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedJobs": "20000",
            "spark.ui.retainedStages": "20000",
        },
    )
    sc = spark.sparkContext
    lsh_dir = tempfile.mkdtemp(prefix="probe_lshidx_")
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
        idx_docs = docs.filter((F.col("doc_id") % 10) != 7)
        batch = docs.filter((F.col("doc_id") % 10) == 7)
        build_lsh_index(spark, idx_docs, f"{lsh_dir}/warm")
        admit_src = batch.withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
        n = admit_src.count()

        # warm probe (no fold): job count of the pure probe path
        j0, t0 = _jobs(sc), time.time()
        probe_lsh_index(spark, f"{lsh_dir}/warm", batch).write.format("noop").mode(
            "overwrite"
        ).save()
        print(json.dumps({"lever": "probe_warm", "jobs": _jobs(sc) - j0,
                          "sec": round(time.time() - t0, 3)}))

        for tag, max_docs in (("oneshot", None), ("split4", max(1, -(-n // 4)))):
            tgt = f"{lsh_dir}/admit_{tag}"
            shutil.copytree(f"{lsh_dir}/warm", tgt)
            j0, t0 = _jobs(sc), time.time()
            admit_batch(spark, tgt, admit_src, max_docs=max_docs).write.format(
                "noop"
            ).mode("overwrite").save()
            print(json.dumps({"lever": f"admit_{tag}", "jobs": _jobs(sc) - j0,
                              "sec": round(time.time() - t0, 3)}))
    finally:
        shutil.rmtree(lsh_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
