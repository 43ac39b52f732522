"""Composed dedup keep-list (LLM-pipeline extension).

``n44_corpus_keep_list`` is the decision a production pipeline actually
ships: every document gets ONE keep/drop verdict with a reason, folding
three dedup modalities in precedence order —

1. ``exact_dup`` — not the min-doc_id survivor of its content digest
   (n01's discipline);
2. ``truncation`` — an exact token-prefix of a longer document (n32's
   prefix-8 bucket + slice verify, same survivor tie-break);
3. ``substring_dup`` — more than half of its 8-token windows duplicated
   verbatim in other documents (n39's fingerprint pipeline at a 0.5
   fraction threshold — the Lee-et-al-style "mostly boilerplate" drop).

The per-modality operators stay individually declared and oracle-checked
(n01/n32/n39); this entry puts their COMPOSITION under the exact hash
gate, because the composed decision is where subtle bugs live.  The
stages are SEQUENTIAL — each modality judges only the previous stage's
keep-set: the truncation bucket join runs among exact survivors, and the
window-fingerprint corpus contains only docs that survived both prior
stages.  Skipping that staging is a real bug this module's first draft
had: the survivor of an exact-dup group shares every window with its own
dropped copies, so a flat composition flags the KEEPER as
substring-duplicated and the whole group vanishes.  (Within the
substring stage all surviving docs are judged simultaneously against
each other — the standard single-pass form, not an iterative removal.)

Scale shape: one tokenization pass, checkpoint-pinned (the
materialize-before-explode/shared-frame discipline), feeding the three
flag branches: digest ranking is one uniform-key window; truncation is
the n32 bucket join; substring is the n39 digest pipeline. The three
flag frames are doc-id keyed (uniform joins back onto the corpus ids).
Verdicts are strings from a fixed 3-value set + one flag int, so the
result hashes identically on any engine/plan.

Registered after ``embed_clusters`` in ``queries.__init__._MODULES`` —
new round-6 entries must not queue-jump the stalest-evidence queries at
the registry front (VERDICT r3 #1).

Reference parity: no reference analog; composes SURVEY §2.H's dedup
family into the pipeline-level decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load_tables, register
from .llm_queries import _DUCK_TOKENS, _tokens
from .substring_dedup import L, STRIDE  # noqa: F401 (oracle f-string uses them)
from .truncation import K  # noqa: F401 (oracle f-string)

#: substring-duplication drop threshold (fraction of duplicated windows)
DUP_FRAC = 0.5


@register(
    "n44_corpus_keep_list",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, md5(text) AS h, {_DUCK_TOKENS} AS ws FROM documents
    ), m AS (
        SELECT doc_id, h, ws, len(ws) AS n FROM t
    ), exact_dup AS (
        SELECT doc_id FROM (
            SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
            FROM m) WHERE rn > 1
    ), surv1 AS (
        SELECT m.* FROM m LEFT JOIN exact_dup e ON e.doc_id = m.doc_id
        WHERE e.doc_id IS NULL
    ), pm AS (
        SELECT doc_id, ws, n,
               md5(array_to_string(list_slice(ws, 1, {K}), ' ')) AS pk
        FROM surv1 WHERE n >= {K}
    ), contained AS (
        SELECT DISTINCT a.doc_id
        FROM pm a JOIN pm b USING (pk)
        WHERE (a.n < b.n OR (a.n = b.n AND a.doc_id > b.doc_id))
          AND list_slice(b.ws, 1, a.n) = a.ws
    ), surv2 AS (
        SELECT s.* FROM surv1 s LEFT JOIN contained c ON c.doc_id = s.doc_id
        WHERE c.doc_id IS NULL
    ), pos AS (
        SELECT doc_id, ws, unnest(range(1, n - {L} + 2, {STRIDE})) AS i
        FROM surv2 WHERE n >= {L}
    ), wins AS (
        SELECT doc_id,
               md5(array_to_string(list_slice(ws, i, i + {L} - 1), ' ')) AS wh
        FROM pos
    ), dup AS (
        SELECT wh FROM (SELECT DISTINCT wh, doc_id FROM wins)
        GROUP BY wh HAVING count(*) >= 2
    ), frac AS (
        SELECT w.doc_id,
               CAST(count(d.wh) AS DOUBLE) / count(*) AS f
        FROM wins w LEFT JOIN dup d ON w.wh = d.wh
        GROUP BY w.doc_id
    ), sub_dup AS (
        SELECT doc_id FROM frac WHERE f >= {DUP_FRAC}
    )
    SELECT m.doc_id,
           CAST(CASE WHEN e.doc_id IS NULL AND c.doc_id IS NULL
                      AND s.doc_id IS NULL THEN 1 ELSE 0 END AS INT) AS keep,
           CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN c.doc_id IS NOT NULL THEN 'truncation'
                WHEN s.doc_id IS NOT NULL THEN 'substring_dup'
           END AS reason
    FROM m
    LEFT JOIN exact_dup e ON e.doc_id = m.doc_id
    LEFT JOIN contained c ON c.doc_id = m.doc_id
    LEFT JOIN sub_dup s ON s.doc_id = m.doc_id
    """,
)
def n44_corpus_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N44 (extension): the composed per-document keep/drop verdict —
    exact-dup survivor pick, prefix-truncation containment, and
    substring-duplication fraction folded in fixed precedence
    (exact_dup > truncation > substring_dup) into one hash-checked
    decision table. One tokenization pass, checkpoint-pinned, feeds all
    three flag branches."""
    from .substring_dedup import window_dup_counts
    from .truncation import containment_pairs

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")  # n32 posture
    d = load_tables(spark, sf_dir, "documents")["documents"]
    m = d.select(
        "doc_id", F.md5("text").alias("h"), _tokens(F.col("text")).alias("ws")
    ).withColumn("n", F.size("ws")).localCheckpoint(eager=False)

    # each flag frame is checkpoint-pinned: the verdict assembly joins
    # them back onto the corpus ids, and without the barrier Spark would
    # re-run the window/bucket-join/fingerprint subtrees once per consumer
    # (code-review r6 — the frames are doc-id-keyed and tiny)
    exact_dup = (
        m.withColumn(
            "rn", F.row_number().over(Window.partitionBy("h").orderBy("doc_id"))
        )
        .filter(F.col("rn") > 1)
        .select("doc_id")
        .withColumn("f_exact", F.lit(1))
        .localCheckpoint(eager=False)
    )

    # stage 2 among exact survivors: the SHARED n32 core (containment_pairs)
    surv1 = m.join(exact_dup.select("doc_id"), "doc_id", "left_anti")
    contained = (
        containment_pairs(surv1)
        .select(F.col("contained").alias("doc_id"))
        .distinct()
        .withColumn("f_trunc", F.lit(1))
        .localCheckpoint(eager=False)
    )

    # stage 3 among docs surviving both: the SHARED n39 core
    surv2 = surv1.join(contained.select("doc_id"), "doc_id", "left_anti")
    sub_dup = (
        window_dup_counts(surv2)
        .filter(
            F.col("n_dup_windows").cast("double") / F.col("n_windows")
            >= DUP_FRAC
        )
        .select("doc_id")
        .withColumn("f_sub", F.lit(1))
        .localCheckpoint(eager=False)
    )

    out = (
        m.select("doc_id")
        .join(exact_dup, "doc_id", "left")
        .join(contained, "doc_id", "left")
        .join(sub_dup, "doc_id", "left")
    )
    reason = (
        F.when(F.col("f_exact").isNotNull(), "exact_dup")
        .when(F.col("f_trunc").isNotNull(), "truncation")
        .when(F.col("f_sub").isNotNull(), "substring_dup")
    )
    return out.select(
        "doc_id",
        F.when(reason.isNull(), 1).otherwise(0).cast("int").alias("keep"),
        reason.alias("reason"),
    )
