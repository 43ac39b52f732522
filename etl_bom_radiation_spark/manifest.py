"""File-level statistics manifest: data skipping beyond partition keys.

Hive partitioning prunes on the partition columns only; parquet row-group
stats prune WITHIN a file but every file must still be listed and its
footer opened.  At 100 TB / millions of files, the listing+footer pass is
itself the bottleneck — which is why modern table formats (Iceberg
manifests, Delta file-skipping stats) keep per-FILE min/max statistics in
a small side table consulted before any data file is touched.  This
module is that lever for the engine's parquet sinks:

* :func:`build_manifest` computes one row per data file — row count plus
  min/max for the requested columns — with a single distributed pass
  (``groupBy(input_file_name())``; no driver-side footer reading, so
  building scales with executors, not driver cores).
* :func:`pruned_read` consults the manifest with interval predicates and
  returns a DataFrame over ONLY the overlapping files.  Combined with a
  clustered layout (``ingest.write_points(cluster_spatial=True)`` /
  ``scale.zorder_key``) the per-file envelopes are tight in both spatial
  dimensions, so a bbox predicate typically touches a handful of files.

The manifest itself is tiny (one row per file) and is stored as parquet
next to the data (``_manifest`` prefix — underscore-prefixed paths are
invisible to Spark's partition discovery, so the manifest can live inside
the table directory without polluting reads).  Only the matching FILE
PATHS are collected to the driver — bounded by the file count after
pruning, the same quantity ``spark.read`` must hold anyway.

Staleness contract: the manifest describes the files that existed when it
was built. ``pruned_read`` fails loudly (raises) if a manifest file has
disappeared, and a rebuild after append/compact is the caller's job — the
same regeneration discipline as MSCK after a partition add
(reference bom-partition/bom_partition.py:77's registration step, applied
to file stats instead of partitions).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: manifest location inside a table dir (underscore = ignored by readers)
MANIFEST_DIR = "_manifest"


def build_manifest(
    spark: SparkSession, data_dir: str, cols: list[str]
) -> DataFrame:
    """One distributed pass over *data_dir*: per data file, row count and
    min/max of each of *cols*. Writes the manifest under
    ``{data_dir}/_manifest`` (overwrite — a manifest is a snapshot, not a
    log) and returns it."""
    df = spark.read.parquet(data_dir)
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    manifest = (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
    )
    out = os.path.join(data_dir, MANIFEST_DIR)
    # one file: the manifest is rows-per-file small by construction
    manifest.coalesce(1).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def refresh_manifest(
    spark: SparkSession, data_dir: str, cols: list[str]
) -> DataFrame:
    """Incremental manifest maintenance: recompute stats ONLY for data
    files not yet in the manifest (new appends), drop rows for files that
    no longer exist (compaction/retirement), keep everything else as-is.

    At 100 TB a full :func:`build_manifest` re-reads the whole table per
    batch; a refresh reads just the appended files — the same
    incremental-commit discipline as Iceberg's per-snapshot manifests,
    with the append set discovered by diffing the table listing against
    the manifest (no transaction log needed for an append-only sink like
    ``ingest.write_points``). Falls back to a full build when no manifest
    exists yet."""
    out = os.path.join(data_dir, MANIFEST_DIR)
    current = set(spark.read.parquet(data_dir).inputFiles())
    try:
        old = spark.read.parquet(out)
    except Exception:
        return build_manifest(spark, data_dir, cols)
    old_keep = old.filter(F.col("file").isin(list(current)))
    known = {r.file for r in old.select("file").collect()}
    new_files = sorted(current - known)
    if new_files:
        df = spark.read.option("basePath", data_dir).parquet(*new_files)
        aggs = [F.count(F.lit(1)).alias("row_count")]
        for c in cols:
            aggs.append(F.min(c).alias(f"min_{c}"))
            aggs.append(F.max(c).alias(f"max_{c}"))
        adds = df.groupBy(F.input_file_name().alias("file")).agg(*aggs)
        merged = old_keep.unionByName(adds.select(*old.columns))
    else:
        merged = old_keep
    # write via a temp prefix then swap: the manifest itself must never be
    # half-written under a concurrent pruned_read
    tmp = os.path.join(data_dir, "_manifest_tmp")
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.coalesce(1).write.mode("overwrite").parquet(out)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(out)


def pruned_read(
    spark: SparkSession,
    data_dir: str,
    ranges: dict[str, tuple],
) -> DataFrame:
    """Read only the files whose manifest envelope overlaps every
    ``col: (lo, hi)`` interval in *ranges* (inclusive bounds; a file with
    NULL stats for a column is conservatively kept).

    The returned DataFrame still carries NO implicit filter — callers
    apply their own predicate as usual; this only shrinks the file set the
    scan starts from, exactly like a format-native file-skipping index.
    Raises ``FileNotFoundError`` if a manifest-listed file is gone (stale
    manifest — rebuild after append/compact)."""
    man = spark.read.parquet(os.path.join(data_dir, MANIFEST_DIR))
    cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        overlap = (F.col(f"min_{c}") <= F.lit(hi)) & (
            F.col(f"max_{c}") >= F.lit(lo)
        )
        cond = cond & (
            overlap | F.col(f"min_{c}").isNull() | F.col(f"max_{c}").isNull()
        )
    files = [r.file for r in man.filter(cond).select("file").collect()]
    for f in files:
        local = f.removeprefix("file:")
        if f.startswith("file:") and not os.path.exists(local):
            raise FileNotFoundError(
                f"manifest lists missing file {f}; rebuild the manifest"
            )
    if not files:
        # empty selection: preserve the schema without touching data files
        return spark.read.parquet(data_dir).limit(0)
    # basePath keeps hive partition columns when the table is partitioned
    return spark.read.option("basePath", data_dir).parquet(*files)
