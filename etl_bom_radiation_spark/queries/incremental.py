"""Incremental corpus update — cross-snapshot dedup (LLM-pipeline extension).

Training corpora are not built in one shot: each crawl/snapshot must be
merged into the existing corpus, admitting only documents whose content
was never seen before.  ``n31_incremental_merge`` is that step: the
incoming batch is deduplicated *within itself* (deterministic min-doc_id
survivor per digest, same discipline as n01), then anti-joined against
the existing corpus's content-digest index.

Scale shape (the part that must survive 100 TB):

* The corpus side is a **digest-only projection** — 16-byte md5 keys, no
  text — so the "index" of a 100 TB corpus is a few TB of digests, and
  column pruning keeps the text out of the join entirely (the scan reads
  only ``text`` to hash it and ``doc_id``; the anti-join carries just the
  digest).
* Both the in-batch window and the anti-join partition on the digest —
  a uniform hash key, skew-free by construction.  In production the
  digest index would be bucketed by ``h`` so every nightly merge
  co-locates with zero shuffle on the corpus side (``scale.write_bucketed``
  is the lever; same pattern as the bucketed q05).
* Admission is LEFT ANTI — no row multiplication, output ≤ batch size.

Fixture split: even doc_ids play the existing corpus, odd doc_ids the
incoming batch (deterministic, and both sides are non-trivial at every
SF).  The documents fixture contains real duplicate texts across the
parity split, so both rejection paths (in-batch dup, already-in-corpus)
are exercised.

Registered after ``lm_score`` in ``queries.__init__._MODULES`` — new
round-4 entries must not queue-jump the never-driver-verified queries at
the registry front (VERDICT r3 #1).

Reference parity: the reference's run-once idempotence marker
(`bom-create-database/bom_create_database.py:26-51` analog: "skip work
already done") applied to content rather than partitions; extends SURVEY
§2.H alongside n01 exact dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import load_tables, register


@register(
    "n31_incremental_merge",
    oracle="""
    WITH existing AS (
        SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 2 = 0
    ), incoming AS (
        SELECT doc_id, source, md5(text) AS h
        FROM documents WHERE doc_id % 2 = 1
    ), batch_first AS (
        SELECT doc_id, source, h,
               row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        FROM incoming
    )
    SELECT b.doc_id, b.source, b.h
    FROM batch_first b
    WHERE b.rn = 1
      AND NOT EXISTS (SELECT 1 FROM existing e WHERE e.h = b.h)
    """,
)
def n31_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N31 (extension): admit into the corpus only incoming docs whose
    content digest is new — deduped within the batch (min doc_id per
    digest) and against the existing corpus (left anti on digest)."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    existing = (
        d.filter(F.col("doc_id") % 2 == 0).select(F.md5("text").alias("h")).distinct()
    )
    incoming = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "source", F.md5("text").alias("h")
    )
    batch_first = (
        incoming.withColumn(
            "rn", F.row_number().over(Window.partitionBy("h").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return batch_first.join(existing, "h", "left_anti").select("doc_id", "source", "h")
