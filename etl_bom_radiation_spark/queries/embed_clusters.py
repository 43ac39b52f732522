"""Embedding-cosine near-duplicate clustering (LLM-pipeline extension).

``n43_embedding_dedup_clusters`` completes the dedup family's third
modality: n01 catches byte-identical documents, n02/n11b/n42 catch
lexical near-dups (shared shingles), and this catches SEMANTIC
near-dups — items whose embeddings are cosine-close even when their
surface text differs (paraphrases, translations, templated rewrites) —
the "embedding-cosine near-dup" leg of the dedup suite.

Shape (mirrors n20, the SimHash clustering):

* edges = the n04 threshold self-join (cosine >= 0.35).  n04 is the
  declared BRUTE-FORCE oracle surface — at 100 TB edges come from the
  LSH-bucketed n04b instead, and everything downstream is unchanged
  (the clustering is agnostic to how candidate pairs were found);
* clusters via :func:`~etl_bom_radiation_spark.graph.connected_components`
  — iterative min-label propagation over EDGE-TOUCHED vertices only
  (near-dup graphs are overwhelmingly singletons; propagating the full
  corpus each round would shuffle it per round for nothing), singletons
  rejoining as their own canonical cluster through one anti-join;
* each vector gets (cluster = min vec_id in its component,
  is_canonical) — keep canonical rows for a semantically deduped set.

The DuckDB oracle computes the same closure with a recursive CTE, so an
ITERATIVE distributed algorithm still sits under the driver's exact
hash gate (the n20 discipline).  Edge membership is decided on the raw
double cosine with the same >= comparison on both engines — the n04
gate already proves that decision is engine-stable.

Registered after ``banded_lsh`` in ``queries.__init__._MODULES`` — new
round-6 entries must not queue-jump the stalest-evidence queries at the
registry front (VERDICT r3 #1).

Reference parity: no reference analog; completes SURVEY §2.H's dedup
modalities (exact / lexical / semantic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables, register
from .llm_queries import n04_similarity_selfjoin

#: cosine threshold shared with n04 (its declared near-dup bar)
THRESHOLD = 0.35


@register(
    "n43_embedding_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE
    edges AS (
        SELECT a.vec_id AS s, b.vec_id AS d
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
              >= {THRESHOLD}
    ),
    reach(id, comp) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT e.d, r.comp FROM reach r JOIN edges e ON e.s = r.id
    )
    SELECT id AS vec_id,
           CAST(MIN(comp) AS BIGINT) AS cluster,
           (id = MIN(comp)) AS is_canonical
    FROM reach GROUP BY id
    """,
)
def n43_embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N43 (extension): semantic near-dup clustering — cosine-threshold
    pairs (n04's exact surface; n04b LSH at scale) grouped into clusters
    via distributed connected components over edge-touched vertices;
    cluster id = min vec_id, canonical flag for the deduped keep-set.
    Recursive-CTE oracle keeps the iterative algorithm exactly checkable."""
    from ..graph import connected_components

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    pairs = n04_similarity_selfjoin(spark, sf_dir)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    touched = (
        edges.select(F.col("src").alias("vec_id"))
        .union(edges.select(F.col("dst").alias("vec_id")))
        .distinct()
    )
    comp = connected_components(touched, edges, id_col="vec_id").select(
        F.col("id").alias("vec_id"), F.col("component").alias("cluster")
    )
    singles = e.select("vec_id").join(comp, "vec_id", "left_anti").select(
        "vec_id", F.col("vec_id").alias("cluster")
    )
    return comp.unionByName(singles).select(
        "vec_id",
        F.col("cluster").cast("bigint").alias("cluster"),
        (F.col("vec_id") == F.col("cluster")).alias("is_canonical"),
    )
