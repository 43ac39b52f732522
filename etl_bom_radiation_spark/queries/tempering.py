"""Temperature-scaled mixture sampling (LLM-pipeline extension).

``n40_mixture_temperature`` computes the standard temperature-reweighted
domain mixture used when composing multilingual / multi-source training
corpora (alpha-sampling, as in mC4/XLM-R: sample source s with
probability proportional to ``count_s ** alpha``, alpha = 0.5), and then
DETERMINISTICALLY draws the per-document keep/drop decisions that
realize it — no ``rand()``, so the sampled corpus is reproducible across
runs, machines, and data arrival order (the n15/n16/n17 discipline).

Exactness discipline (what makes this oracle-hashable): temperature
weights involve ``sqrt`` and a cross-source normalization sum, and a
float sum's value depends on accumulation order — poison for an
engine-parity check and a real nondeterminism hazard on a cluster.  So
every decision here is INTEGER arithmetic:

* per-source tempered mass ``s_s = round(sqrt(count_s))`` — sqrt of an
  integer-valued double is correctly rounded on both engines and can
  never tie at .5 (that would need sqrt(c) = k + 1/2, impossible for
  integer c), so ``s_s`` is exact;
* normalizer ``S = sum(s_s)`` — an INTEGER sum, order-independent;
* a document survives iff
  ``2 * u24 * S * count_s  <  2**24 * total * s_s``
  where ``u24`` is the first 6 hex digits of ``md5(seed || doc_id)`` —
  pure BIGINT inequality, the exact integer form of
  ``uniform(0,1) < rate_s`` with
  ``rate_s = (total/2) * (s_s/S) / count_s`` (budget = half the corpus,
  re-split across sources by tempered weight; rare sources get
  rate >= 1 and keep everything — the standard cap).  Magnitudes:
  u24 < 2**24, so the products stay < 2**63 up to billions of
  documents per source.

Scale shape: one narrow projection computes (source, u24) per doc; the
per-source counts are ONE partial-combined aggregation over a
low-cardinality key; the tiny source->rate table broadcasts back for
the keep decision (never a shuffle of the corpus); the final per-source
report is a second small aggregation.  Skew-free: the only shuffled key
is ``source`` with |sources| groups of pre-combined partials.

Registered after ``substring_dedup`` in ``queries.__init__._MODULES`` —
new round-6 entries must not queue-jump the stalest-evidence queries at
the registry front (VERDICT r3 #1).

Reference parity: no reference analog (the reference has no LLM
surface); extends SURVEY §2.H's corpus-shaping family (n15/n16/n17/n27).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables, register

#: hash granularity: first 6 hex digits of md5 -> u24 in [0, 2^24)
_U24 = 1 << 24

#: seed prefix for the per-document draw (stable contract, like n16/n17)
_SEED = "temper7-"


@register(
    "n40_mixture_temperature",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source,
               CAST('0x' || substr(md5('{_SEED}' || CAST(doc_id AS VARCHAR)), 1, 6)
                    AS BIGINT) AS u24
        FROM documents
    ), per_src AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(ROUND(SQRT(count(*))) AS BIGINT) AS s_mass
        FROM d GROUP BY source
    ), norm AS (
        SELECT CAST(SUM(s_mass) AS BIGINT) AS s_total,
               CAST(SUM(n_docs) AS BIGINT) AS total
        FROM per_src
    ), kept AS (
        SELECT d.source,
               CASE WHEN 2 * d.u24 * n.s_total * p.n_docs
                         < {_U24} * n.total * p.s_mass
                    THEN 1 ELSE 0 END AS keep
        FROM d
        JOIN per_src p ON d.source = p.source
        CROSS JOIN norm n
    )
    SELECT p.source, p.n_docs, p.s_mass,
           CAST(SUM(k.keep) AS BIGINT) AS n_kept
    FROM kept k JOIN per_src p ON k.source = p.source
    GROUP BY p.source, p.n_docs, p.s_mass
    """,
)
def n40_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N40 (extension): alpha=0.5 temperature-scaled source mixture with a
    half-corpus budget, realized by a deterministic integer-arithmetic
    per-document draw (u24 hash vs an exact rational rate) — reproducible
    and engine-exact where float rates would be accumulation-order
    nondeterministic. Corpus never shuffles: counts aggregate on the tiny
    source key, rates broadcast back."""
    d = (
        load_tables(spark, sf_dir, "documents")["documents"]
        .select(
            "doc_id",
            "source",
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(_SEED), F.col("doc_id").cast("string"))),
                    1,
                    6,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("u24"),
        )
    )
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sqrt(F.count(F.lit(1)))).cast("long").alias("s_mass"),
    )
    norm = per_src.agg(
        F.sum("s_mass").alias("s_total"), F.sum("n_docs").alias("total")
    )
    # tiny dims broadcast back onto the corpus — the doc rows never shuffle
    rated = d.join(F.broadcast(per_src), "source").join(F.broadcast(norm))
    # when/otherwise mirrors the oracle's CASE: a NULL doc_id hashes to
    # u24=NULL and must count as kept=0 on BOTH engines — a bare boolean
    # cast leaves NULL, and a source whose every doc_id is NULL would
    # then sum to NULL on Spark vs 0 on DuckDB (code-review r7 class)
    kept = rated.select(
        "source",
        F.when(
            2 * F.col("u24") * F.col("s_total") * F.col("n_docs")
            < F.lit(_U24) * F.col("total") * F.col("s_mass"),
            1,
        )
        .otherwise(0)
        .alias("keep"),
    )
    return (
        kept.join(F.broadcast(per_src), "source")
        .groupBy("source", "n_docs", "s_mass")
        .agg(F.sum("keep").alias("n_kept"))
    )
