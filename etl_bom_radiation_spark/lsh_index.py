"""Persisted banded-LSH near-dup index: build once, probe per arrival.

``queries.incremental_lsh`` (n49) demonstrates the incremental near-dup
SEMANTICS as a one-shot oracle-verified query; this module is the
production form of the same workflow — the index artifacts n49 builds
in-query are here written as parquet tables, and each arriving batch is
probed against them without touching (or re-sketching) the indexed
corpus:

* ``build_lsh_index(spark, docs, index_dir)``: tokenize -> 2-gram
  shingles -> 16-min engine-neutral sketch -> 8x2 band keys ->
  BUCKET_CAP-gated bucket membership (capped at build time — the cap
  cannot depend on future arrivals), persisted as ``bands.parquet``
  (8 rows/doc) alongside ``hsets.parquet`` (hashed BIGINT shingle set,
  1 array/doc: the verify-stage material).  At 100 TB these are the
  only tables an arrival ever reads — the corpus text is never
  reopened.
* ``probe_lsh_index(spark, index_dir, batch)``: sketch ONLY the batch,
  then run the shared probe/verify/verdict assembly
  (``incremental_lsh.shard_verdicts`` — one implementation, so the
  persisted path cannot drift from the hash-verified query): the
  batch's band frame broadcasts onto the index buckets, the enriched
  candidate frame broadcasts onto the index hset table, and the
  verdicts come back per batch doc (keep / drop_index_dup /
  drop_shard_dup + candidate counts + best verified Jaccard).  No
  SortMergeJoin anywhere; the index parquet is scanned, never
  shuffled.

Parity with the one-shot query is pytest-locked: building the index
from the n49 index side and probing the n49 shard must reproduce the
query's rows exactly (tests/test_scale.py).

Reference parity: no reference analog (the reference's pipeline has no
dedup at all); this is the LLM-training-corpus maintenance workflow
SURVEY §2.H's near-dup family exists to serve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries.banded_lsh import band_frame, gate_buckets, hashed_sets
from .queries.incremental_lsh import shard_verdicts
from .queries.llm_queries import _shingles, _tokens
from .queries.minhash_eval import sketch_signatures


def _sketch_frames(spark: SparkSession, docs: DataFrame):
    """(gated band frame, hashed-set frame) for a (doc_id, text) frame —
    the exact n42/n49 stages (shared helpers), one text pass."""
    toks = docs.select("doc_id", _tokens(F.col("text")).alias("ws"))
    shs = toks.select(
        "doc_id", F.array_distinct(_shingles("ws", 2)).alias("s")
    ).localCheckpoint(eager=False)
    sh = shs.select("doc_id", F.explode("s").alias("sh"))
    bands = gate_buckets(band_frame(sketch_signatures(spark, sh)))
    return bands, hashed_sets(shs)


def build_lsh_index(spark: SparkSession, docs: DataFrame, index_dir: str) -> None:
    """Sketch ``docs`` (doc_id, text, ...) and persist the two index
    tables an arrival probe reads: ``bands.parquet`` (capped bucket
    membership) and ``hsets.parquet`` (hashed shingle sets)."""
    bands, hsets = _sketch_frames(spark, docs)
    bands.write.mode("overwrite").parquet(f"{index_dir}/bands.parquet")
    hsets.write.mode("overwrite").parquet(f"{index_dir}/hsets.parquet")


def probe_lsh_index(
    spark: SparkSession, index_dir: str, batch: DataFrame
) -> DataFrame:
    """Per-doc near-dup verdicts for an arriving ``batch`` (doc_id,
    text, ...) against a :func:`build_lsh_index` layout — the batch is
    sketched fresh and broadcast; the index tables stream map-side
    (no shuffle of the index, no SortMergeJoin)."""
    idx_bands = spark.read.parquet(f"{index_dir}/bands.parquet")
    idx_hsets = spark.read.parquet(f"{index_dir}/hsets.parquet")
    inc_bands, inc_hsets = _sketch_frames(spark, batch)
    return shard_verdicts(
        idx_bands,
        inc_bands,
        idx_hsets.unionByName(inc_hsets),
        inc_hsets,
        batch.select("doc_id"),
    )
