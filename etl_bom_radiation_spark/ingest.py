"""Ingest pipeline: file state machine + partitioned sink (SURVEY §2.A
S3/S4/S6-S8, §2.F T1/T8).

Batch mode (:func:`ingest_batch`) and streaming mode (:func:`ingest_stream`,
``Trigger.AvailableNow`` by default) of the reference's event-driven flow
(reference bom-create-bucket/bom_create_bucket.py:80-118 wiring;
bom/bom.py:35-84 per-file processing):

    in/  --decode-->  athena/year=/month=/day=/hour=/   (good points)
     \\--move-->  done/         (processed files,   bom.py:79-80 intended)
     \\--move-->  quarantine/   (malformed files — upgrades bom.py:82-84's
                                 swallow-and-log TODO to a real parking lot)

Scale design:

* the decode plan is narrow-only (no shuffle) — file-level parallelism,
  linear to 1000 executors;
* the partitioned write repartitions on the partition columns first so each
  (year,month,day,hour) directory is written by one task instead of every
  task appending a small file to every partition — at 100 TB this is the
  difference between |partitions| output files and |tasks|x|partitions|
  small files;
* quarantine detection is header/metadata-based (NULL ncols/Date after
  ANSI-safe try_cast) — no second decode pass;
* file moves are Hadoop FS renames (server-side copy+delete in the
  reference, bom.py:16-25); the list of files per batch is small (one
  driver-side loop over file names, never over rows).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .grid.decode import decode_grids, read_grid_files, with_filename_metadata
from .workspace import Workspace, register_batch_partitions

PARTITION_COLS = ["year", "month", "day", "hour"]


@dataclass
class IngestResult:
    files_ok: list[str] = field(default_factory=list)
    files_quarantined: list[str] = field(default_factory=list)
    rows_written: int = 0
    partitions: list[dict] = field(default_factory=list)


def _classify_files(meta: DataFrame) -> DataFrame:
    """Mark each file good/bad from header + filename metadata only (G1/S2
    columns; no full decode): bad = unparseable header or filename grammar."""
    from .grid.decode import _header_field

    lines = F.split(F.col("_content"), r"\r?\n")
    return meta.select(
        "_path",
        (
            _header_field(lines, 1).try_cast("int").isNotNull()
            & _header_field(lines, 2).try_cast("int").isNotNull()
            & _header_field(lines, 3).try_cast("double").isNotNull()
            & _header_field(lines, 4).try_cast("double").isNotNull()
            & _header_field(lines, 5).try_cast("double").isNotNull()
            & _header_field(lines, 6).try_cast("int").isNotNull()
            & F.col("Date").isNotNull()
            & F.col("RadiationType").isNotNull()
        ).alias("_ok"),
    )


def _move(spark: SparkSession, src_uri: str, dst_dir: str) -> None:
    """S8: file state transition via FS rename (reference copy+delete,
    bom.py:16-25)."""
    jvm = spark._jvm
    src = jvm.org.apache.hadoop.fs.Path(src_uri)
    fs = src.getFileSystem(spark._jsc.hadoopConfiguration())
    dst = jvm.org.apache.hadoop.fs.Path(f"{dst_dir}/{src.getName()}")
    fs.rename(src, dst)


def write_points(df: DataFrame, data_dir: str, mode: str = "append") -> None:
    """S4: Hive-layout partitioned parquet sink (bom.py:28-32 layout,
    parquet instead of headed CSV — SURVEY §1.6). Repartition on the
    partition keys first: one writer task per output partition."""
    (
        df.repartition(*PARTITION_COLS)
        .write.mode(mode)
        .partitionBy(*PARTITION_COLS)
        .parquet(data_dir)
    )


def write_points_csv(df: DataFrame, out_dir: str, mode: str = "overwrite") -> None:
    """S3: the reference's own sink shape — headed CSV (bom.py:111,153-156),
    kept for export parity; parquet (write_points) is the primary format."""
    (
        df.repartition(*PARTITION_COLS)
        .write.mode(mode)
        .option("header", True)
        .partitionBy(*PARTITION_COLS)
        .csv(out_dir)
    )


def ingest_batch(
    spark: SparkSession,
    ws: Workspace,
    fq_table: str | None = None,
    move_files: bool = True,
) -> IngestResult:
    """One batch drain of ``in/``: decode, write good points partitioned,
    move good files to ``done/`` and bad files to ``quarantine/``, register
    partitions (T8). Mirrors process_file (bom.py:35-84) at batch scale."""
    res = IngestResult()
    meta = with_filename_metadata(read_grid_files(spark, ws.in_dir))
    flags = _classify_files(meta).collect()  # one row per FILE (small)
    ok_files = {r["_path"] for r in flags if r["_ok"]}
    bad_files = {r["_path"] for r in flags if not r["_ok"]}
    res.files_ok = sorted(ok_files)
    res.files_quarantined = sorted(bad_files)

    if ok_files:
        from pyspark.sql import Observation

        good = meta.filter(F.col("_path").isin(*ok_files))
        points = decode_grids(good)
        # Observation: row count + distinct partition tuples (bounded by
        # |files| — one hour partition per file) collected DURING the write
        # pass, so the batch is decoded exactly once
        obs = Observation("ingest_batch")
        points = points.observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.collect_set(F.struct(*PARTITION_COLS)).alias("parts"),
        )
        write_points(points, ws.data_dir)
        metrics = obs.get
        res.rows_written = metrics["rows"]
        res.partitions = sorted(
            (p.asDict() for p in metrics["parts"]),
            key=lambda d: tuple(d[c] for c in PARTITION_COLS),
        )
        if fq_table is not None:
            register_batch_partitions(spark, fq_table, ws, res.partitions)

    if move_files:
        for f in ok_files:
            _move(spark, f, ws.done_dir)
        for f in bad_files:
            _move(spark, f, ws.quarantine_dir)
    return res


def ingest_stream(
    spark: SparkSession,
    ws: Workspace,
    checkpoint: str,
    fq_table: str | None = None,
    available_now: bool = True,
):
    """T1/S6: incremental exactly-once file ingest — Structured Streaming
    file source + checkpoint (the reference's S3 ObjectCreated trigger +
    SQS retry, bom_create_bucket.py:80-97, lambda.cfn.yaml:37-45).

    ``foreachBatch``: partitioned write + T8 partition registration after
    each commit — synchronous, removing the reference's fire-and-forget
    partition-visibility race (bom_partition.py:80,129). With
    ``available_now`` the query drains pending files and stops (batch-drain
    semantics); otherwise it keeps watching ``in/``.
    """
    files = (
        spark.readStream.format("text")
        .option("wholetext", True)
        .load(ws.in_dir)
        .select(F.input_file_name().alias("_path"), F.col("value").alias("_content"))
    )
    points = decode_grids(with_filename_metadata(files))

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_points(batch_df, ws.data_dir)
        if fq_table is not None:
            parts = [
                r.asDict()
                for r in batch_df.select(*PARTITION_COLS).distinct().collect()
            ]
            register_batch_partitions(spark, fq_table, ws, parts)

    writer = (
        points.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
