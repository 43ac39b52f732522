"""Exact substring-duplication spans (LLM-pipeline extension).

``n39_substring_dup_spans`` measures, per document, the fraction of its
token windows that also occur verbatim in at least one OTHER document —
the corpus-level "exact substring duplication" signal behind
suffix-array dedup of LLM training data (Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022).  n01 catches
whole-document copies and n32 catches prefixes; this catches the common
middle case: boilerplate paragraphs, quoted passages, and templated
spans duplicated INSIDE otherwise-distinct documents.

Spark-first shape instead of a suffix array (the part that must survive
100 TB): a suffix array is a global sorted structure no executor can
hold; the distributed equivalent is window FINGERPRINTS:

* every length-L token window (stride 1) is hashed — a narrow
  explode, linear in corpus token count, no join, and the ONLY pass
  over the text: everything after the fingerprint projection moves
  (doc_id, digest) rows, never text.  The digest shuffles as
  ``unhex(md5)``'s 16 raw bytes, not the 32-char hex string — it never
  reaches the output, so the oracle is unaffected and the dominant
  shuffle is far narrower (measured via bench's ``io_mb``:
  18.3 -> 11.8 MB shuffled at sf0.1);
* first aggregation on (digest, doc_id) collapses within-document
  repeats (partial map-side combine; uniform skew-free keys);
* a window partitioned by digest counts the DISTINCT documents per
  hash over that already-collapsed set — the cross-document gate
  (>= 2) — so there is NO join back against the corpus and NO second
  parquet scan: the naive shape (dup-hash set joined back to the
  window rows) scans the text twice, which at 100 TB doubles the
  dominant cost;
* one final per-document aggregation folds window counts into the
  duplicated fraction.

Stride-1 windows multiply rows by ~L; production pipelines that cannot
afford it drop to stride L/2 at a recall cost — the trade is a constant
in this module (``STRIDE``) so the choice is explicit, and the contract
(cross-doc only: a phrase repeated within one document does not count)
is enforced identically on both engines by the distinct-docs >= 2 gate
(exercised in ``tests/test_detops.py``: a doc that repeats its own
phrase has zero duplicated windows).

Output is (doc_id, integer counts, one 6-dp-rounded ratio of two small
integers) — hashes identically on any engine/plan.

Registered after ``lsh_eval`` in ``queries.__init__._MODULES`` — new
round-6 entries must not queue-jump the stalest-evidence queries at the
registry front (VERDICT r3 #1).

Reference parity: no reference analog (the reference has no LLM
surface); extends SURVEY §2.H's dedup family
(n01/n02/n11b/n12/n20/n26/n31/n32).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables, register
from .llm_queries import _DUCK_TOKENS, _tokens

#: window length in tokens — spans shorter than this are not "duplicated
#: substrings", they are common phrases (Lee et al. use 50 BPE tokens at
#: web scale; 8 whitespace tokens matches this corpus's document length)
L = 8

#: window stride — 1 = every position (exact); raising it trades recall
#: for an ~STRIDE-fold row reduction (see module docstring)
STRIDE = 1


def window_dup_counts(m: DataFrame) -> DataFrame:
    """The n39 core as a reusable stage: given ``(doc_id, ws, n)``, return
    per-doc ``(doc_id, n_windows, n_dup_windows)`` — window fingerprints
    (materialize-before-explode barrier), (digest, doc) collapse,
    digest-partitioned distinct-doc gate, per-doc fold. Shared by the
    standalone n39 query and the composed keep-list (n44), so the window
    arithmetic, the barrier, and the cross-doc gate can never drift
    between them (code-review r6)."""
    from pyspark.sql.window import Window

    warr = (
        m.filter(F.col("n") >= L)
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(1), F.col("n") - L + 1, F.lit(STRIDE)),
                lambda i: F.unhex(F.md5(F.concat_ws(" ", F.slice("ws", i, L)))),
            ).alias("wa"),
        )
        .localCheckpoint(eager=False)
    )
    wins = warr.select("doc_id", F.explode("wa").alias("wh"))
    per_pair = wins.groupBy("wh", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    nd = F.count(F.lit(1)).over(Window.partitionBy("wh"))
    return (
        per_pair.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_windows"),
            F.sum(F.when(F.col("nd") >= 2, F.col("c")).otherwise(0)).alias(
                "n_dup_windows"
            ),
        )
    )


@register(
    "n39_substring_dup_spans",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_DUCK_TOKENS} AS ws FROM documents
    ), m AS (
        SELECT doc_id, ws, len(ws) AS n FROM t WHERE len(ws) >= {L}
    ), pos AS (
        SELECT doc_id, ws, unnest(range(1, n - {L} + 2, {STRIDE})) AS i FROM m
    ), wins AS (
        SELECT doc_id,
               md5(array_to_string(list_slice(ws, i, i + {L} - 1), ' ')) AS wh
        FROM pos
    ), dup AS (
        SELECT wh FROM (SELECT DISTINCT wh, doc_id FROM wins)
        GROUP BY wh HAVING count(*) >= 2
    )
    SELECT w.doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(count(d.wh) AS BIGINT) AS n_dup_windows,
           ROUND(CAST(count(d.wh) AS DOUBLE) / count(*), 6) AS dup_fraction
    FROM wins w LEFT JOIN dup d ON w.wh = d.wh
    GROUP BY w.doc_id
    """,
)
def n39_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N39 (extension): per-document fraction of length-L token windows
    duplicated verbatim in at least one OTHER document — the distributed
    stand-in for suffix-array substring dedup. Single-scan shape: window
    fingerprints (narrow explode) -> (digest, doc) collapse -> per-digest
    distinct-doc count via a digest-partitioned window -> per-doc fold.
    The text is read once and never shuffles; only digests do."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    m = d.select("doc_id", _tokens(F.col("text")).alias("ws")).withColumn(
        "n", F.size("ws")
    )
    return window_dup_counts(m).select(
        "doc_id",
        "n_windows",
        "n_dup_windows",
        F.round(
            F.col("n_dup_windows").cast("double") / F.col("n_windows"), 6
        ).alias("dup_fraction"),
    )
