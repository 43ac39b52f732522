"""Embedding quantization (LLM-pipeline extension).

Scalar (SQ8) quantization — each vector rescaled per-vector to 8-bit codes
— is the standard memory-reduction step before building a large ANN index
(4x smaller than float32, recall loss usually <1%): the preprocessing stage
for the n03b/n03c approximate search paths.

The whole computation is per-row higher-order functions over the embedding
array (transform/array_min/array_max/aggregate) — JVM-side, zero shuffle,
linear at any corpus size. Elements are cast to double on BOTH engines
before arithmetic so Spark and the DuckDB oracle evaluate the identical
per-element formula bit-for-bit (float-typed intermediates would round
differently).

Registered after ``mixture`` in ``queries.__init__._MODULES`` — new
round-4 entries must not queue-jump the never-driver-verified queries at
the registry front (VERDICT r3 #1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables, register

#: number of quantization levels - 1 (8-bit codes: 0..255)
LEVELS = 255


@register(
    "n28_embedding_quantize",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        FROM embeddings
        WHERE embedding IS NOT NULL AND len(embedding) > 0
    ), mm AS (
        SELECT vec_id, label, emb,
               list_aggregate(emb, 'min') AS vmin,
               list_aggregate(emb, 'max') AS vmax
        FROM e
    )
    SELECT vec_id, label,
           round(vmin, 6) AS v_min,
           round(vmax, 6) AS v_max,
           array_to_string(
               CASE WHEN vmax = vmin
                    THEN list_transform(emb, x -> CAST(0 AS INT))
                    ELSE list_transform(emb, x ->
                         CAST(round((x - vmin) * {LEVELS}.0 / (vmax - vmin)) AS INT))
               END, ',') AS q8,
           round(CASE WHEN vmax = vmin THEN 0.0
                 ELSE list_aggregate(list_transform(emb, x ->
                        abs(x - (vmin + round((x - vmin) * {LEVELS}.0 / (vmax - vmin))
                                 * (vmax - vmin) / {LEVELS}.0))), 'sum') / len(emb)
                 END, 6) AS mean_abs_err
    FROM mm
    """,
)
def n28_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N28 (extension): per-vector SQ8 quantization of the embedding column
    + mean absolute reconstruction error. q8[i] = round((x[i] - min) *
    255 / (max - min)); a constant vector (max == min) degrades to
    all-zero codes instead of dividing by zero. Positive operands make
    Spark's HALF_UP and DuckDB's half-away-from-zero rounding identical."""
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    base = (
        e.filter(F.col("embedding").isNotNull() & (F.size("embedding") > 0))
        .select(
            "vec_id",
            "label",
            F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
        )
        .withColumn("vmin", F.array_min("emb"))
        .withColumn("vmax", F.array_max("emb"))
    )
    vmin, vmax = F.col("vmin"), F.col("vmax")
    span = vmax - vmin

    def _code(x):
        return F.round((x - vmin) * LEVELS / span)

    # try_cast: a NaN/Infinity component makes the code non-finite, which
    # must degrade to a NULL code, not an ANSI CAST_OVERFLOW abort
    # (specials-corpus net r13); identical to cast for finite components
    q8 = F.when(
        vmax == vmin, F.transform("emb", lambda x: F.lit(0).cast("int"))
    ).otherwise(F.transform("emb", lambda x: _code(x).try_cast("int")))
    abs_err = F.transform(
        "emb", lambda x: F.abs(x - (vmin + _code(x) * span / LEVELS))
    )
    mean_err = F.when(vmax == vmin, F.lit(0.0)).otherwise(
        F.aggregate(abs_err, F.lit(0.0), lambda acc, x: acc + x) / F.size("emb")
    )
    return base.select(
        "vec_id",
        "label",
        F.round(vmin, 6).alias("v_min"),
        F.round(vmax, 6).alias("v_max"),
        # joined to a string: the codes stay exact (integers) and the
        # value-hash comparator handles flat columns only, no raw arrays
        F.array_join(F.transform(q8, lambda c: c.cast("string")), ",").alias("q8"),
        F.round(mean_err, 6).alias("mean_abs_err"),
    )
