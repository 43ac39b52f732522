"""LLM-data-pipeline operators (SURVEY §2.H, N1-N8 + extensions): dedup,
similarity search, text analysis, multimodal plumbing over the driver's
``documents`` and ``embeddings`` tables.

Design rules at 100 TB:

* everything except the explicitly-marked brute-force oracles is linear:
  hashing, per-doc token work, LSH bucketing. The brute-force cosine
  self-join (n04) exists as the ORACLE for the LSH variants and for small
  candidate sets — never run it on the full corpus;
* exact dedup is a hash groupBy (shuffle on the 128-bit digest — uniform,
  skew-free by construction);
* token/char work uses Spark higher-order functions (JVM, codegen), not
  Python UDFs. The only Python here is the Arrow-batched multimodal stub
  (mm01), whose decode step is a documented deterministic fake — the
  image/audio libs are not in this container; the Spark-side plumbing
  (binary payloads, schema, mapInPandas batching) is real;
* the char-level rolling hash (_polyhash) is a 31-base polynomial mod
  2^31-1, implemented identically in Spark and DuckDB so fingerprints and
  simhashes are exactly oracle-checkable (no dependence on engine-private
  hash functions).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import load_events, load_tables, register

# ------------------------------------------------------------ shared helpers

_POLY_MOD = 2147483647  # 2^31 - 1


def _tokens(col) -> Column:
    """Lowercased whitespace tokens, empties dropped (identical on both
    engines: split on \\s+, filter length > 0)."""
    return F.filter(
        F.split(F.lower(F.trim(col)), r"\s+"), lambda t: F.length(t) > 0
    )


_DUCK_TOKENS = (
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> length(t) > 0)"
)


def _shingles(ws, n: int):
    """Word n-gram shingles over a MATERIALIZED token-array column name/Column
    (always project the token array first — see n02's tokenize-once note).
    Sequence is clamped so arrays shorter than n yield a single degenerate
    shingle of the remaining tokens instead of an invalid range;
    try_element_at (NOT element_at, which RAISES on out-of-bounds under
    ANSI mode) + NULL-skipping concat_ws make that degenerate shingle the
    available tokens instead of a crash (code-review r3c: a single-token
    document aborted the whole 2-gram query)."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(ws) - (n - 1), F.lit(1)))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(ws, i + k) for k in range(n)]
        ),
    )


def _polyhash(col) -> Column:
    """Deterministic 31-base polynomial rolling hash of a string, mod 2^31-1.
    Engine-neutral (defined over code points) so oracles can recompute it.

    OPTIMIZATION r16 (guide §4.1 — prefer fewer higher-order passes): the
    per-codepoint ``ascii`` cast is folded INTO the aggregate lambda
    instead of a separate ``transform`` pass, which drops one interpreted
    HOF traversal and one per-string intermediate array.  Arithmetic is
    unchanged — ``(a*31 + cast(ascii(c) as long)) % p`` per element in
    the same order — so values are bit-identical (pinned by
    tests/test_properties.py::test_polyhash_matches_python_fold and the
    oracle hash gates of every consumer; re-measured mismatches=0 over
    the full sf0.1 shingle set).  Measured on the exploded sf0.1 shingle
    frame (256k rows): 0.95 s -> 0.72 s for the hash projection."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda a, c: (a * 31 + F.ascii(c).cast("long")) % _POLY_MOD,
    )


def _duck_polyhash(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(a, b) -> (a * 31 + b) % {_POLY_MOD})"
    )


def _finite_embedding(col: str = "embedding") -> Column:
    """True iff the embedding array has NO NaN/Infinity component — the
    shared admission predicate for every vector path that quantizes to
    BIGINT (ANSI CAST_OVERFLOW) or feeds Spark ML (which rejects
    non-finite vector values). One definition so the exclusions cannot
    drift apart (code-review r13)."""
    return ~F.exists(
        col,
        lambda x: F.isnan(x.cast("double"))
        | (F.abs(x.cast("double")) == F.lit(float("inf"))),
    )


def _cosine(a, b) -> Column:
    """Cosine similarity of two double arrays via zip_with + aggregate —
    pure JVM, codegen'd; no UDF. try_divide: a zero-norm vector yields
    NULL similarity (dropping out of top-k/thresholds) instead of an ANSI
    DIVIDE_BY_ZERO abort (code-review r3c probe)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return F.try_divide(dot, na * nb)


# ------------------------------------------------------------------- dedup


@register(
    "n01_exact_dedup",
    oracle="""
    SELECT md5(text) AS h,
           CAST(MIN(doc_id) AS BIGINT) AS keeper,
           CAST(COUNT(*) AS BIGINT) AS copies
    FROM documents GROUP BY md5(text)
    """,
)
def n01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1: exact dedup by content hash. Deterministic survivor (min doc_id)
    instead of dropDuplicates' arbitrary row (SURVEY §7 risk 4). The groupBy
    shuffles on the digest — uniform keys, no skew, linear at any scale."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return (
        d.withColumn("h", F.md5("text"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("copies"))
    )


@register("n02_minhash_lsh", oracle=None)
def n02_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2: near-dup detection — word-2-gram shingles → HashingTF →
    MinHashLSH.approxSimilarityJoin (banded/bucketed: candidates only from
    matching hash buckets, never all-pairs). Approximate → rows-only for the
    driver; pytest cross-checks recall against the brute-force Jaccard on a
    small slice. Seeded for determinism.

    Saturation caveat (tools/scaling_probe.py finding, round 6): on
    low-entropy corpora LSH buckets saturate and the JVM-internal bucket
    join inherits the same quadratic the probe measured on n42/n11b —
    Spark ML exposes no bucket cap, so at scale prefer the engine-owned
    n42 path, whose BUCKET_CAP gate bounds the saturated-bucket term."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = load_tables(spark, sf_dir, "documents")["documents"]
    # materialize the token array once: referencing _tokens(text) three
    # times inside the lambda re-runs the regex tokenization per reference
    # (higher-order funcs sit outside whole-stage-codegen subexpression
    # elimination)
    toks = d.select("doc_id", _tokens(F.col("text")).alias("ws"))
    shingled = toks.select(
        "doc_id",
        F.array_distinct(_shingles("ws", 2)).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True)
    feat = tf.transform(shingled)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=5, seed=42)
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, 0.9, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1 - F.col("jaccard_dist"), 4).alias("jaccard_sim"),
        )
    )


# -------------------------------------------------------- similarity search


@register(
    "n03_topk_cosine",
    oracle="""
    SELECT vec_id,
           ROUND(list_cosine_similarity(
               (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                WHERE vec_id = 0),
               CAST(embedding AS DOUBLE[])), 6) AS sim
    -- searchable side excludes NULL and zero-norm vectors: DuckDB's
    -- list_cosine_similarity RAISES on a NULL list from a scan and
    -- returns -1.0 for a zero vector, while the Spark side's try_divide
    -- yields NULL — neither is a meaningful similarity, so both engines
    -- skip them. The query vector is a scalar subquery, not a joined
    -- derived table: DuckDB's cross-join plan evaluates the similarity
    -- before the derived-table filter and raises on the NULL row
    -- (NULL-parity net r13)
    FROM embeddings
    WHERE embedding IS NOT NULL
      AND list_dot_product(CAST(embedding AS DOUBLE[]),
                           CAST(embedding AS DOUBLE[])) > 0
      -- the QUERY vector must be searchable too: a NULL or zero-norm
      -- vec_id-0 makes every Spark sim NULL (filtered to 0 rows), while
      -- DuckDB would keep rows with NULL / -1.0 sims — these scalar
      -- guards empty the result identically (code-review r13)
      AND (SELECT embedding FROM embeddings WHERE vec_id = 0) IS NOT NULL
      AND (SELECT list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))
           FROM embeddings WHERE vec_id = 0) > 0
    ORDER BY sim DESC, vec_id ASC
    LIMIT 10
    """,
)
def n03_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3: brute-force top-k cosine search for one query vector — the exact
    baseline (and the oracle for the LSH variant n03b). Broadcast the 1-row
    query side; the scan side computes sim in one narrow pass, then
    TakeOrderedAndProject keeps k. Linear in corpus size; at 100 TB this is
    the right plan for a single query (it reads every vector exactly once)."""
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    vec = F.transform("embedding", lambda x: x.cast("double"))
    base = e.select("vec_id", vec.alias("v"))
    q = base.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    return (
        base.crossJoin(F.broadcast(q))
        .select("vec_id", F.round(_cosine(F.col("v"), F.col("qv")), 6).alias("sim"))
        # NULL sim = NULL or zero-norm vector (try_divide in _cosine):
        # unsearchable, skipped — mirrors the oracle's WHERE (no-op on the
        # driver fixtures, which have no NULL/zero vectors)
        .filter(F.col("sim").isNotNull())
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@register("n03b_topk_cosine_lsh", oracle=None)
def n03b_topk_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3b: the scale path — BucketedRandomProjectionLSH approximate nearest
    neighbours. Bucketed candidates only (not a corpus scan per query when
    the model/buckets are reused across queries). Approximate → rows-only;
    pytest checks overlap with n03's exact top-k."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    # NULL embeddings are unsearchable and crash VectorUDT fit/transform;
    # non-finite ones pass LSH.fit's (absent) validation and silently enter
    # the index — same admission predicate as n03c/n04b (ADVICE r13: all ML
    # vector paths share _finite_embedding). No-op on the driver fixtures.
    feat = e.filter(F.col("embedding").isNotNull() & _finite_embedding()).select(
        "vec_id", array_to_vector("embedding").alias("features")
    )
    # query row BEFORE fit: an empty corpus (or missing query vector)
    # degrades to an empty result — LSH fit itself aborts on a dataset
    # with no rows (empty-corpus net r13)
    key = feat.filter(F.col("vec_id") == 0).head()
    if key is None:
        return feat.select("vec_id", F.lit(0.0).alias("dist")).limit(0)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=42
    )
    model = lsh.fit(feat)
    nn = model.approxNearestNeighbors(feat, key.features, 10, distCol="dist")
    return nn.select("vec_id", F.round("dist", 6).alias("dist"))


@register("n03c_topk_cosine_ivf", oracle=None)
def n03c_topk_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3c: IVF (inverted-file) approximate nearest neighbours — the other
    scale path beside LSH: k-means coarse quantizer assigns every vector to
    a cell; a query probes only the `nprobe` nearest cells, scanning
    |corpus| * nprobe/k vectors instead of all. Here k=16, nprobe=4 (25% of
    the corpus scanned). Seeded k-means -> deterministic given the data;
    approximate -> rows-only; overlap vs exact top-k asserted in
    tests/test_approx_ops.py."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    # NULL embeddings crash KMeans.fit, and Spark ML rejects NaN/Infinity
    # vector components outright ("Vector values MUST NOT be NaN or
    # Infinity"): skip both — unsearchable either way (no-op on driver
    # data; NULL/specials-corpus nets r13)
    feat = e.filter(F.col("embedding").isNotNull() & _finite_embedding()).select(
        "vec_id", "embedding", array_to_vector("embedding").alias("features")
    )
    # empty/missing-query guard BEFORE fit: KMeans aborts on a dataset
    # with no rows (empty-corpus net r13)
    if feat.filter(F.col("vec_id") == 0).head() is None:
        return feat.select("vec_id", F.lit(0.0).alias("sim")).limit(0)
    km = KMeans(k=16, seed=42, featuresCol="features", predictionCol="cell")
    model = km.fit(feat)
    assigned = model.transform(feat)

    q_row = assigned.filter(F.col("vec_id") == 0).head()
    if q_row is None:
        return assigned.select("vec_id", F.lit(0.0).alias("sim")).limit(0)
    centers = model.clusterCenters()
    qv = q_row["embedding"]
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    # probe the 4 cells whose centroids are most query-similar (driver-side
    # over k=16 centroids — O(k), never corpus-sized)
    probe = sorted(range(len(centers)), key=lambda i: -cos(qv, centers[i]))[:4]
    qdf = assigned.filter(F.col("vec_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("qv")
    )
    cand = assigned.filter(F.col("cell").isin(*[int(c) for c in probe]))
    vec = F.transform("embedding", lambda x: x.cast("double"))
    return (
        cand.crossJoin(F.broadcast(qdf))
        .select("vec_id", F.round(_cosine(vec, F.col("qv")), 6).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@register(
    "n04_similarity_selfjoin",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.35
    """,
)
def n04_similarity_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: all pairs with cosine >= 0.35 — BRUTE FORCE, declared as the exact
    oracle surface at sf0.01 only. This is O(n^2): at 100 TB use n04b (LSH
    bucketed join) and keep this as its correctness reference on samples.
    Norms are precomputed per side before the join (halves the inner-loop
    work); the join itself broadcasts the smaller projection."""
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    vec = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(F.transform(vec, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    )
    side = e.select("vec_id", vec.alias("v"), norm.alias("n"))
    a = side.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    b = side.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.try_divide(dot, F.col("na") * F.col("nb")))
        .filter(F.col("sim") >= 0.35)
        .select("id_a", "id_b", F.round("sim", 6).alias("sim"))
    )


@register("n04b_similarity_selfjoin_lsh", oracle=None)
def n04b_similarity_selfjoin_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4b: the scale path for the similarity self-join — LSH-bucketed
    candidate generation (approxSimilarityJoin on Euclidean distance;
    for unit-normalized vectors cos >= t  <=>  ||a-b|| <= sqrt(2-2t)).
    Normalizes, buckets, joins only within buckets. Rows-only."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    vec = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(F.transform(vec, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    )
    # NULL embeddings crash the vector conversion and a zero-norm vector
    # has no unit form (the x / norm below would ANSI-abort): both are
    # un-normalizable, skip them (no-op on driver data — none exist there).
    # localCheckpoint cuts the optimizer lineage: without it Catalyst's
    # CombineFilters merges this guard with the LSH transform's internal
    # UDF filter into ONE conjunction whose evaluation order is NOT
    # short-circuited — the x / norm transform evaluated on the very
    # zero-norm rows the guard excludes (measured: ANSI DIVIDE_BY_ZERO
    # from inside a GeneratedClass$SpecificPredicate, NULL-parity net r13)
    # _finite_embedding too, not just norm > 0: Spark evaluates NaN > 0
    # as TRUE, so a NaN-component vector passes the norm guard and rides
    # NaN features into the index — no abort today (LSH.fit skips the
    # KMeans-style non-finite validation), but wasted hashing and a
    # contract violation waiting on an upstream change (code-review r13)
    unit = (
        e.filter(F.col("embedding").isNotNull() & _finite_embedding())
        .filter(norm > 0)
        .select(
            "vec_id",
            array_to_vector(F.transform(vec, lambda x: x / norm)).alias("features"),
        )
        .localCheckpoint(eager=False)
    )
    # empty guard: LSH fit aborts on a rowless dataset (empty-corpus net)
    if unit.head() is None:
        return unit.select(
            F.col("vec_id").alias("id_a"),
            F.col("vec_id").alias("id_b"),
            F.lit(0.0).alias("cos_sim"),
        ).limit(0)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=1.0, numHashTables=6, seed=7
    )
    model = lsh.fit(unit)
    thresh = float((2 - 2 * 0.35) ** 0.5)  # cos 0.35 -> euclidean on unit sphere
    pairs = model.approxSimilarityJoin(unit, unit, thresh, distCol="dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("id_a"),
            F.col("datasetB.vec_id").alias("id_b"),
            F.round(1 - F.col("dist") * F.col("dist") / 2, 6).alias("cos_sim"),
        )
    )


# ------------------------------------------------------------- text analysis


@register(
    "n05_text_stats",
    oracle=f"""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           ROUND(AVG(len({_DUCK_TOKENS})), 4) AS avg_tokens,
           CAST(MAX(length(text)) AS BIGINT) AS max_len
    FROM documents GROUP BY lang, source
    """,
)
def n05_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: text statistics per (lang, source) — doc counts, char/token
    averages. Token counting is a JVM higher-order expression (no UDF)."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(F.size(_tokens(F.col("text")))), 4).alias("avg_tokens"),
        F.max(F.length("text")).cast("bigint").alias("max_len"),
    )


@register(
    "n06_normalization",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                   ' +', ' ', 'g'))) AS norm_hash,
           CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                           ' +', ' ', 'g'))) AS INT) AS norm_len
    FROM documents
    """,
)
def n06_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N6: text normalization — lowercase, strip non-alphanumerics, collapse
    whitespace, trim. Emitted as md5 + length so the compare is compact.
    (DuckDB regexp_replace needs the 'g' flag; Spark is global by default.)"""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.length(norm).cast("int").alias("norm_len"),
    )


@register(
    "n07_nested_enrich",
    oracle="""
    SELECT e.event_id,
           -- TRY_CAST(props AS JSON) + json_type guard: DuckDB raises on
           -- malformed JSON and rounds '2.9' in VARCHAR->INT casts where
           -- Spark's from_json "k INT" is NULL for both (see q41)
           TRY_CAST(CASE WHEN json_type(TRY_CAST(e.props AS JSON), '$.k')
                              IN ('INTEGER', 'BIGINT', 'UBIGINT')
                         THEN json_extract_string(TRY_CAST(e.props AS JSON), '$.k')
                    END AS INT) AS k,
           CAST(len(m.embedding) AS INT) AS dim,
           ROUND(list_sum(CAST(m.embedding AS DOUBLE[])), 4) AS vec_sum
    FROM events e JOIN embeddings m ON e.event_id % 500 = m.vec_id
    WHERE e.event_type = 'purchase'
    """,
)
def n07_nested_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N7: nested/multimodal columns through a join — JSON props parsed to a
    struct, array embeddings carried through and reduced JVM-side."""
    ev = load_events(spark, sf_dir)
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    vec = F.transform("embedding", lambda x: x.cast("double"))
    em = e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x), 4).alias("vec_sum"),
    )
    return (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("k", F.from_json("props", "k INT").getField("k"))
        .join(em, ev.event_id % 500 == em.vec_id)
        .select("event_id", "k", "dim", "vec_sum")
    )


@register(
    "n08_quality_filter",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, n_chars,
               len({_DUCK_TOKENS}) AS n_tokens,
               len(list_filter({_DUCK_TOKENS},
                   t -> t IN ('the', 'a', 'of', 'and', 'to', 'is', 'in'))) AS stop_hits
        FROM documents
    )
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(n_tokens AS INT) AS n_tokens,
           ROUND(CAST(stop_hits AS DOUBLE) / n_tokens, 6) AS stop_ratio
    FROM scored
    WHERE n_chars BETWEEN 100 AND 450
      AND lang IN ('en', 'es', 'de')
      AND n_tokens >= 15
      AND CAST(stop_hits AS DOUBLE) / n_tokens <= 0.6
    """,
)
def n08_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N8: quality filtering — length band, language whitelist, minimum token
    count, stopword-ratio cap. A predicate stack over derived features; all
    pushable, all narrow."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    stop = F.array(*[F.lit(s) for s in ("the", "a", "of", "and", "to", "is", "in")])
    # tokenize once (a repeated _tokens reference re-runs the regex per use)
    base = d.select("doc_id", "lang", "n_chars", _tokens(F.col("text")).alias("ws"))
    scored = base.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.size("ws").cast("int").alias("n_tokens"),
        F.size(F.filter("ws", lambda t: F.array_contains(stop, t))).alias("stop_hits"),
    )
    # try_divide: the n_tokens >= 15 conjunct does NOT guarantee the ratio
    # is only evaluated on nonzero divisors (vectorized predicates don't
    # short-circuit row-wise), so a zero-token doc would ANSI-abort with a
    # plain '/'. DuckDB's double division already yields NULL on /0, and
    # NULL <= 0.6 is false on both engines — semantics unchanged.
    ratio = F.try_divide(F.col("stop_hits").cast("double"), F.col("n_tokens"))
    return (
        scored.filter(
            F.col("n_chars").between(100, 450)
            & F.col("lang").isin("en", "es", "de")
            & (F.col("n_tokens") >= 15)
            & (ratio <= 0.6)
        )
        .select(
            "doc_id",
            "lang",
            "n_chars",
            "n_tokens",
            F.round(ratio, 6).alias("stop_ratio"),
        )
    )


@register(
    "n09_lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               len(list_filter({_DUCK_TOKENS},
                   t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS en_hits,
               len({_DUCK_TOKENS}) AS n_tokens
    FROM documents
    )
    SELECT doc_id, lang AS labeled_lang,
           CAST(en_hits AS INT) AS en_hits,
           CASE WHEN CAST(en_hits AS DOUBLE) / n_tokens >= 0.05 THEN 'en'
                ELSE 'unk' END AS guessed_lang
    FROM scored
    """,
)
def n09_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N9 (extension): heuristic language ID — stopword-hit-rate n-gram
    heuristic. (The synthetic corpus is English-vocab regardless of its lang
    label, so the interesting output is the hit-rate machinery, verified
    exactly; a real model would swap in per-language stopword tables.)"""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    stop = F.array(*[F.lit(s) for s in ("the", "a", "of", "and", "to")])
    base = d.select("doc_id", "lang", _tokens(F.col("text")).alias("ws"))
    hits = F.size(F.filter("ws", lambda t: F.array_contains(stop, t)))
    return base.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        hits.cast("int").alias("en_hits"),
        # try_divide: an empty doc has 0 tokens and plain '/' ANSI-aborts;
        # NULL ratio falls to 'unk', exactly like the oracle (DuckDB's
        # double /0 is NULL and CASE NULL >= 0.05 takes the ELSE branch)
        F.when(F.try_divide(hits.cast("double"), F.size("ws")) >= 0.05, "en")
        .otherwise("unk")
        .alias("guessed_lang"),
    )


@register(
    "n10_fingerprint",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents
    ), sh AS (
        SELECT doc_id, toks,
               CASE WHEN len(toks) >= 3 THEN
                   list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
               ELSE [array_to_string(toks, ' ')] END AS shingles
        FROM t
    )
    SELECT doc_id,
           -- NULL text -> NULL fingerprint: the Spark side's array_join
           -- propagates the NULL token array, while DuckDB's
           -- array_to_string(NULL) would otherwise degrade to the hash of
           -- '' (NULL-parity net r13)
           CASE WHEN toks IS NULL THEN NULL ELSE
               CAST(list_min(list_transform(shingles,
                    s -> {_duck_polyhash('s')})) AS BIGINT) END AS fingerprint
    FROM sh
    """,
)
def n10_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N10 (extension): document fingerprint — min rolling-hash over word
    3-gram shingles (a 1-permutation MinHash). Engine-neutral polynomial
    hash, so the oracle recomputes it exactly."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    base = d.select("doc_id", _tokens(F.col("text")).alias("ws"))
    shingles = F.when(F.size("ws") >= 3, _shingles("ws", 3)).otherwise(
        F.array(F.array_join("ws", " "))
    )
    return base.select(
        "doc_id",
        F.array_min(F.transform(shingles, _polyhash)).cast("bigint").alias("fingerprint"),
    )


@register(
    "n11_simhash",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               list_transform({_DUCK_TOKENS}, tk -> {_duck_polyhash('tk')}) AS hs
        FROM documents
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 16),
               b -> CASE WHEN list_sum(list_transform(hs,
                        h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                    THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))
             AS BIGINT) AS simhash16
    FROM t
    """,
)
def n11_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N11 (extension): 16-bit SimHash over token rolling-hashes — per bit,
    tokens vote +1/-1 by their hash bit; the majority sign sets the output
    bit. Near-dup docs differ in few bits (Hamming). All JVM higher-order
    expressions; one pass per bit over the token-hash array."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    hashes = F.transform(_tokens(F.col("text")), _polyhash)
    out = d.select("doc_id", hashes.alias("hs"))

    def _vote(bit: int):
        # closure factory: Spark inspects lambda arity, so the bit index must
        # be captured outside the 2-arg merge lambda
        def merge(a, h):
            return a + F.when(
                F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return F.aggregate("hs", F.lit(0), merge)

    sim = F.lit(0).cast("long")
    for b in range(16):
        sim = sim + F.when(_vote(b) > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out.select("doc_id", sim.alias("simhash16"))


_DUCK_SIMHASH = f"""
        SELECT doc_id,
               CAST(list_sum(list_transform(range(0, 16),
                   b -> CASE WHEN list_sum(list_transform(
                            list_transform({_DUCK_TOKENS}, tk -> {_duck_polyhash('tk')}),
                            h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                        THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))
                 AS BIGINT) AS simhash16
        FROM documents
"""


#: signature-bucket saturation guard (same class as banded_lsh.BUCKET_CAP,
#: same probe finding): 16-bit signatures over low-entropy text saturate,
#: so uncapped bucket sizes grow linearly with corpus size and the
#: collision self-join quadratically (measured 0.87 -> 9.22 pairs/doc from
#: sf0.01 to sf0.1). Pairs are generated only among the cap's lowest
#: doc_ids per signature; the saturated remainder is exact-dup/boilerplate
#: mass (n01/n29's job — n44 stages exact dedup first). Fixture max bucket
#: at sf0.01 is 11, so the sf0.01 result is cap-invariant.
SIMHASH_BUCKET_CAP = 64

_DUCK_SIM_GATED = f"""
        SELECT doc_id, simhash16 FROM (
            SELECT doc_id, simhash16,
                   ROW_NUMBER() OVER (PARTITION BY simhash16
                                      ORDER BY doc_id) AS rn
            FROM sim)
        WHERE rn <= {SIMHASH_BUCKET_CAP}
"""


def _simhash_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash16) capped to SIMHASH_BUCKET_CAP rows per
    signature — the rank window rides the same partitioning the
    collision self-join shuffles on."""
    sim = n11_simhash(spark, sf_dir)
    w = Window.partitionBy("simhash16").orderBy("doc_id")
    return (
        sim.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SIMHASH_BUCKET_CAP)
        .drop("rn")
    )


@register(
    "n11b_simhash_neardup",
    oracle=f"""
    WITH sim AS ({_DUCK_SIMHASH}), gated AS ({_DUCK_SIM_GATED})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash16
    FROM gated a JOIN gated b
      ON a.simhash16 = b.simhash16 AND a.doc_id < b.doc_id
    """,
)
def n11b_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N11b: SimHash-bucketed near-dup candidate pairs — docs sharing the
    same 16-bit signature join within buckets (an equi-join on the hash:
    one shuffle, never all-pairs), gated by SIMHASH_BUCKET_CAP so a
    saturated signature contributes C(cap,2) pairs, not C(bucket,2). The
    standard scale-out: with 64-bit simhash and Hamming radius r, join on
    each of C(bands) rotated key segments; here the 16-bit
    exact-collision form is the declared, exactly-oracled core."""
    gated = _simhash_gated(spark, sf_dir)
    a = gated.select(F.col("doc_id").alias("doc_a"), "simhash16")
    b = gated.select(F.col("doc_id").alias("doc_b"), F.col("simhash16").alias("sh_b"))
    return (
        a.join(b, (F.col("simhash16") == F.col("sh_b")) & (F.col("doc_a") < F.col("doc_b")))
        .select("doc_a", "doc_b", "simhash16")
    )


@register(
    "n12_ngram_jaccard",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents
    ), sh AS (
        -- range end mirrors _shingles' clamp (ADVICE r3): a 0/1-token doc
        -- yields ONE degenerate shingle (remaining tokens, or ''), exactly
        -- like the Spark side — concat_ws skips out-of-bounds NULLs on
        -- both engines
        SELECT doc_id,
               list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                   i -> concat_ws(' ', toks[i], toks[i+1]))) AS s
        FROM t
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                 len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
    FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
    """,
)
def n12_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N12 (extension): word-2-gram Jaccard similarity between consecutive
    doc pairs (linear pair generation — the full-pair version at scale goes
    through LSH bucketing, n02). set ops via array_intersect/array_union."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    base = d.select("doc_id", _tokens(F.col("text")).alias("ws"))
    sh = base.select(
        "doc_id",
        F.array_distinct(_shingles("ws", 2)).alias("s"),
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    return (
        a.join(b, F.col("doc_b") == F.col("doc_a") + 1)
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sa", "sb")).cast("double")
                / F.size(F.array_union("sa", "sb")),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "n13_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_DUCK_TOKENS}) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]'))
                AS INT) AS bpe_ish_tokens,
           CAST(length(text) AS INT) AS chars
    FROM documents
    """,
)
def n13_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N13 (extension): token counting two ways — whitespace tokens and a
    BPE-ish pre-tokenizer regex (word runs + individual non-word symbols,
    the GPT-2-style pre-split shape). Pure JVM regexp_extract_all; the
    chars/tokens ratio is the usual budget estimator for LLM corpora."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return d.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).cast("int").alias("ws_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"), 0)
        ).cast("int").alias("bpe_ish_tokens"),
        F.length("text").cast("int").alias("chars"),
    )


# ------------------------------------------------------------- multimodal


@register(
    "mm01_multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(coalesce(text, ''))) AS INT) AS n_bytes,
           CAST(octet_length(encode(coalesce(text, ''))) // 256 AS INT) AS n_frames,
           'application/octet-stream' AS mime
    FROM documents
    -- coalesce: a NULL payload decodes as an EMPTY payload on the Spark
    -- side (the kernels' None guard — a real decoder sees b''), pinned
    -- identically here (NULL-parity net r13)
    """,
)
def mm01_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM1 (extension): multimodal-column plumbing — an opaque ``binary``
    payload column plus typed metadata, feature-extracted with an
    Arrow-batched mapInPandas. The decode step is a DETERMINISTIC FAKE
    (byte length + frame count at 256 B/frame): real image/audio codecs are
    not in this container. The Spark-side contract — binary column, output
    schema, Arrow batch iteration, per-partition parallelism — is the real
    thing; swap `_extract` for an actual decoder on a real cluster."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    payload = d.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def _extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            # None -> b'': a NULL payload is an empty payload (len() on
            # None raised before the NULL-parity net; the oracle coalesces
            # identically)
            raw = pdf["payload"].map(lambda b: b if b is not None else b"")
            n_bytes = raw.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int32"),
                    "n_frames": (n_bytes // 256).astype("int32"),
                    "mime": "application/octet-stream",
                }
            )

    return payload.mapInPandas(
        _extract, "doc_id long, n_bytes int, n_frames int, mime string"
    )


@register(
    "mm02_frame_sample",
    oracle="""
    WITH meta AS (
        -- coalesce: NULL payload = empty payload, as in mm01
        SELECT doc_id, octet_length(encode(coalesce(text, ''))) AS n_bytes
        FROM documents
    )
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           CAST(i * 256 AS INT) AS byte_offset
    FROM meta, unnest(range(0, (n_bytes // 256) + 1, 4)) AS u(i)
    """,
)
def mm02_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM2 (extension): frame sampling over an opaque binary "video" —
    every 4th 256-byte frame becomes an output row (one row in → many out,
    through Arrow batches). Decode is the same documented deterministic
    stub as mm01; the contract being exercised is the exploding mapInPandas
    shape a real frame sampler has (batch in, variable rows out)."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    payload = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def _sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out_doc, out_idx, out_off = [], [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(raw or b"") // 256 + 1
                for i in range(0, n_frames, 4):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_off.append(i * 256)
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "byte_offset": out_off}
            )

    return payload.mapInPandas(_sample, "doc_id long, frame_idx int, byte_offset int")


_DUCK_NORM_TOKS = (
    "list_filter(string_split(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), "
    "' '), x -> x <> '')"
)


@register(
    "n14_decontamination",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_DUCK_NORM_TOKS} AS ws FROM documents
    ),
    sh AS (
        SELECT doc_id, ARRAY_TO_STRING(ws[i:i+3], ' ') AS shingle
        FROM toks, UNNEST(RANGE(1, GREATEST(LEN(ws) - 2, 1))) AS t(i)
    )
    SELECT c.doc_id, CAST(COUNT(DISTINCT b.shingle) AS BIGINT) AS hits
    FROM sh c
    JOIN (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20) b USING (shingle)
    WHERE c.doc_id >= 20
    GROUP BY c.doc_id
    """,
)
def n14_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N14 (extension): benchmark decontamination — flag training documents
    sharing any normalized word-4-gram with a benchmark set (here: doc_id <
    20 stands in for the eval suite). The real-world shape for 100 TB: the
    benchmark shingle set is tiny (a few eval suites), so it broadcasts and
    the corpus side streams through a BroadcastHashJoin — no shuffle of the
    corpus, and the per-doc COUNT(DISTINCT) groups only the (rare) hits."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    ws = F.filter(
        F.split(
            F.lower(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9 ]", " ")), " "
        ),
        lambda t: F.length(t) > 0,
    )
    # materialize-before-explode (round 6, the n36 lesson) — and the
    # checkpoint pins the frame for BOTH the benchmark and corpus branches
    sharr = (
        d.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 4)
        .select("doc_id", _shingles("ws", 4).alias("sa"))
        .localCheckpoint(eager=False)
    )
    sh = sharr.select("doc_id", F.explode("sa").alias("shingle"))
    bench = sh.filter(F.col("doc_id") < 20).select("shingle").distinct()
    corpus = sh.filter(F.col("doc_id") >= 20)
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("hits"))
    )


@register(
    "n15_det_shuffle",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, md5('epoch7-' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        FROM documents
    )
    SELECT doc_id, shuffle_key,
           CAST({_duck_polyhash("shuffle_key")} % 64 AS BIGINT) AS shard_id
    FROM keyed
    """,
)
def n15_det_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N15 (extension): deterministic training-data shuffle — every doc gets
    a reproducible pseudo-random key md5(seed || id) and a shard assignment;
    readers stream shards in key order for an epoch-stable global shuffle.
    The 100 TB pattern: repartition by shard_id + sortWithinPartitions on
    shuffle_key gives a fully distributed shuffle with no global sort and no
    single-partition window; re-seeding ('epoch8-…') re-shuffles without
    touching the source data."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    key = F.md5(F.concat(F.lit("epoch7-"), F.col("doc_id").cast("string")))
    keyed = d.select("doc_id", key.alias("shuffle_key"))
    return keyed.select(
        "doc_id",
        "shuffle_key",
        (_polyhash(F.col("shuffle_key")) % 64).alias("shard_id"),
    )


@register(
    "n16_train_test_split",
    oracle="""
    WITH assigned AS (
        SELECT doc_id, lang,
               CASE WHEN SUBSTR(md5('split42-' || CAST(doc_id AS VARCHAR)), 1, 1)
                         IN ('0', '1') THEN 'test' ELSE 'train' END AS split
        FROM documents
    )
    SELECT split, CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS langs,
           CAST(MIN(doc_id) AS BIGINT) AS min_id, CAST(MAX(doc_id) AS BIGINT) AS max_id
    FROM assigned GROUP BY split
    """,
)
def n16_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N16 (extension): deterministic hash-based train/test split — membership
    is a pure function of the id (first hex nibble of md5(seed || id) < 2 →
    ~12.5% test), so the split is stable across runs, machines, and data
    arrival order — no rand(), no sampling state to persist. Narrow map-side
    predicate at any scale."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    nib = F.substring(F.md5(F.concat(F.lit("split42-"), F.col("doc_id").cast("string"))), 1, 1)
    assigned = d.select(
        "doc_id",
        "lang",
        F.when(nib.isin("0", "1"), "test").otherwise("train").alias("split"),
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("docs"),
        F.count_distinct("lang").alias("langs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register(
    "n17_stratified_sample",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5('sample1-' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT doc_id, lang, n_chars FROM ranked WHERE rn <= 25
    """,
)
def n17_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N17 (extension): deterministic stratified sampling — a fixed quota per
    stratum (25 docs per language), chosen by ranking on a reproducible hash
    key instead of rand(), so the sample is exact-size, seed-stable, and
    oracle-verifiable (unlike sampleBy's Bernoulli draw). One shuffle by
    stratum; per-group top-k never materializes the full sort at scale
    (WindowGroupLimit pushes rn<=k into the sort)."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    key = F.md5(F.concat(F.lit("sample1-"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(key, "doc_id")
    return (
        d.select("doc_id", "lang", "n_chars", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 25)
        .drop("rn")
    )


@register(
    "n18_pii_redaction",
    oracle="""
    WITH red AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(text, '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
                   '[0-9][0-9][0-9]+', '<NUM>', 'g') AS redacted
        FROM documents
    )
    SELECT r.doc_id,
           CAST(LENGTH(d.text) - LENGTH(r.redacted) AS BIGINT) AS chars_removed,
           CAST(LENGTH(r.redacted) - LENGTH(REPLACE(r.redacted, '<EMAIL>', SUBSTR('<EMAIL>', 2))) AS BIGINT)
               AS emails,
           CAST(LENGTH(r.redacted) - LENGTH(REPLACE(r.redacted, '<NUM>', SUBSTR('<NUM>', 2))) AS BIGINT)
               AS numbers
    FROM red r JOIN documents d USING (doc_id)
    """,
)
def n18_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N18 (extension): PII-style redaction pass — mask email-like tokens and
    long digit runs, report per-doc redaction counts. Pure regexp_replace
    (JVM-side, codegen'd); patterns kept to character classes that mean the
    same thing in Java regex and RE2 so the oracle is exact. Narrow plan."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    red = d.select(
        "doc_id",
        F.col("text"),
        F.regexp_replace(
            F.regexp_replace(F.col("text"), "[A-Za-z0-9._]+@[A-Za-z0-9.]+", "<EMAIL>"),
            "[0-9][0-9][0-9]+",
            "<NUM>",
        ).alias("redacted"),
    )
    count_of = lambda col, token: (  # noqa: E731 — occurrences via length delta
        F.length(col) - F.length(F.replace(col, F.lit(token), F.lit(token[1:])))
    ).cast("long")
    return red.select(
        "doc_id",
        (F.length("text") - F.length("redacted")).cast("long").alias("chars_removed"),
        count_of(F.col("redacted"), "<EMAIL>").alias("emails"),
        count_of(F.col("redacted"), "<NUM>").alias("numbers"),
    )


@register(
    "n19_repetition_stats",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_DUCK_TOKENS} AS ws FROM documents
    ), g AS (
        SELECT doc_id, len(ws) AS n_toks,
               list_transform(range(1, greatest(len(ws) - 1, 1)),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS grams
        FROM toks
    )
    SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
           ROUND(1 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
               AS rep_ratio
    FROM g WHERE len(grams) > 0
    """,
)
def n19_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N19 (extension): within-document repetition scoring (Gopher-style
    quality filter) — the fraction of duplicated word-3-grams inside each
    doc; high ratios flag boilerplate/spam for removal before training.
    Entirely per-row array ops (narrow, no shuffle, no UDF): the 100 TB
    cost is one scan."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    base = d.select("doc_id", _tokens(F.col("text")).alias("ws"))
    g = base.select(
        "doc_id",
        F.size("ws").alias("n_toks"),
        F.when(F.size("ws") >= 3, _shingles("ws", 3)).alias("grams"),
    ).filter(F.col("grams").isNotNull() & (F.size("grams") > 0))
    return g.select(
        "doc_id",
        F.col("n_toks").cast("long").alias("n_toks"),
        F.size("grams").cast("long").alias("n_grams"),
        F.size(F.array_distinct("grams")).cast("long").alias("n_distinct"),
        F.round(
            1 - F.size(F.array_distinct("grams")).cast("double") / F.size("grams"), 6
        ).alias("rep_ratio"),
    )


@register(
    "n20_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE
    sim AS ({_DUCK_SIMHASH}),
    gated AS ({_DUCK_SIM_GATED}),
    edges AS (
        SELECT a.doc_id AS s, b.doc_id AS d
        FROM gated a JOIN gated b ON a.simhash16 = b.simhash16
                                 AND a.doc_id <> b.doc_id
    ),
    reach(id, comp) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.d, r.comp FROM reach r JOIN edges e ON e.s = r.id
    )
    SELECT id AS doc_id,
           CAST(MIN(comp) AS BIGINT) AS cluster,
           (id = MIN(comp)) AS is_canonical
    FROM reach GROUP BY id
    """,
)
def n20_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N20 (extension): duplicate clustering — SimHash collision pairs
    (n11b) grouped into clusters via distributed connected components
    (graph.connected_components: iterative min-label propagation, two
    uniform-key shuffles per round, rounds = cluster diameter which stays
    tiny for near-dup graphs). Each doc gets its cluster id (min doc_id in
    the component) and a canonical flag.

    Contract caveat (ADVICE r6): the edge set inherits n11b's
    SIMHASH_BUCKET_CAP — on a signature saturated past the cap (e.g.
    hundreds of byte-identical docs) only the cap's lowest doc_ids form
    edges, so the overflow comes back as singleton "canonicals".  The
    canonical set is therefore NEAR-dup-grade on its own and dedup-grade
    only downstream of an n01-style exact dedup, exactly as staged in
    n44's keep-list precedence (exact → truncation → near-dup); mass
    byte-identical duplication is n01's job, not the LSH graph's.  The
    DuckDB oracle computes the same closure over the same gated edges
    with a recursive CTE, so the result is exactly checkable despite the
    iterative implementation."""
    from ..graph import connected_components

    d = load_tables(spark, sf_dir, "documents")["documents"]
    pairs = n11b_simhash_neardup(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    # Propagate labels only over edge-touched vertices: near-dup graphs are
    # overwhelmingly singletons, and iterating the FULL corpus each round
    # would shuffle ~100 TB of self-labeled rows per round for nothing.
    # Singletons rejoin afterwards as their own (canonical) cluster via one
    # anti-join.
    touched = (
        edges.select(F.col("src").alias("doc_id"))
        .union(edges.select(F.col("dst").alias("doc_id")))
        .distinct()
    )
    comp = connected_components(touched, edges, id_col="doc_id").select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster")
    )
    singles = d.select("doc_id").join(comp, "doc_id", "left_anti").select(
        "doc_id", F.col("doc_id").alias("cluster")
    )
    return comp.unionByName(singles).select(
        "doc_id",
        F.col("cluster").cast("bigint").alias("cluster"),
        (F.col("doc_id") == F.col("cluster")).alias("is_canonical"),
    )


@register(
    "n21_vocab_topk",
    oracle=f"""
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest({_DUCK_TOKENS}) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok ASC
    LIMIT 100
    """,
)
def n21_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N21 (extension): corpus vocabulary — top-100 tokens by frequency
    (the vocabulary-building pass of a tokenizer pipeline). One explode +
    one two-phase count (map-side combine collapses the token stream to
    |vocab| partials per task) + TakeOrderedAndProject heaps — the corpus
    itself never sorts. Ties broken by token for determinism."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    base = d.select(_tokens(F.col("text")).alias("ws"))
    return (
        base.select(F.explode("ws").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(100)
    )


@register(
    "n22_tfidf_topterms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_DUCK_TOKENS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
           ROUND(tf * (CAST(n_docs AS DOUBLE) / df), 6) AS score,
           CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT doc_id, term, tf,
               n_docs, df,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY tf * (CAST(n_docs AS DOUBLE) / df) DESC,
                                           term ASC) AS rn
        FROM tf CROSS JOIN n JOIN dfreq USING (term)
    )
    WHERE rn <= 3
    """,
)
def n22_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N22 (extension): per-document top-3 terms by tf-idf with a rational
    idf (tf * N/df — integer-valued doubles, so both engines compute
    bit-identical scores; ln-based idf would risk last-ulp divergence).
    Shape: explode → (doc,term) count → term doc-frequency (both two-phase
    with map-side combine) → broadcast of the scalar N → WindowGroupLimit
    keeps only 3 rows per doc inside the window sort."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    base = d.select("doc_id", _tokens(F.col("text")).alias("ws"))
    pairs = base.select("doc_id", F.explode("ws").alias("term"))
    # materialize-before-reuse (OPTIMIZATION r16): tf feeds BOTH the join
    # left side and the document-frequency aggregation — unpinned,
    # Catalyst duplicated the whole scan → tokenize → explode → count
    # subtree per consumer (the before-plan scanned documents twice and
    # ran the Generate twice); the lazy pin cuts it to one scan, same
    # values (the pin only stops recomputation)
    tf = (
        pairs.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * (F.col("n_docs").cast("double") / F.col("df")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.round("score", 6).alias("score"),
            "rn",
        )
    )


@register(
    "n23_label_centroids",
    oracle="""
    WITH pos AS (
        SELECT label, embedding, unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings
    ),
    c AS (
        SELECT label, i, AVG(CAST(embedding[i] AS DOUBLE)) AS m
        FROM pos GROUP BY label, i
    ),
    sizes AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors FROM embeddings GROUP BY label)
    SELECT c.label, s.n_vectors,
           string_agg(printf('%.6f', m), ',' ORDER BY i) AS centroid
    FROM c JOIN sizes s ON s.label = c.label
    GROUP BY c.label, s.n_vectors
    """,
)
def n23_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N23 (extension): per-label embedding centroids — the building block
    of IVF training (n03c computes the same thing driver-side over a
    sample; this is the fully distributed form) and of class-prototype
    dedup/outlier scoring. posexplode → avg per (label, dim) — one shuffle
    on small keys — then the centroid array reassembles via
    sort-by-dimension collect_list, emitted as a fixed-format string
    (printf '%.6f' on both engines: double-to-string rendering is
    otherwise engine-specific). Dim count is bounded (embedding width),
    so collect_list stays tiny per group."""
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    ex = e.select("label", F.posexplode("embedding").alias("i", "val"))
    c = ex.groupBy("label", "i").agg(F.avg(F.col("val").cast("double")).alias("m"))
    sizes = e.groupBy("label").agg(F.count(F.lit(1)).alias("n_vectors"))
    cent = c.groupBy("label").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "m"))),
                lambda s: F.format_string("%.6f", s["m"]),
            ),
            ",",
        ).alias("centroid")
    )
    return cent.join(F.broadcast(sizes), "label").select(
        "label", "n_vectors", "centroid"
    )


@register(
    "n24_length_percentile",
    oracle="""
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           ROUND(PERCENT_RANK() OVER (ORDER BY n_chars ASC NULLS FIRST,
                                      doc_id ASC), 6) AS pct
    FROM documents
    -- PERCENT_RANK of a single row is 0.0; the Spark side guards its
    -- (pos-1)/(N-1) with try_divide to match. NULLS FIRST pins DuckDB to
    -- Spark's ascending NULL order (global_sort_index sorts NULL n_chars
    -- first; DuckDB's default is nulls_last)
    """,
)
def n24_length_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N24 (extension): exact percentile rank of every document by length —
    the quality-filter calibration query ('what cutoff drops the bottom
    5%?'). PERCENT_RANK over a global order is an unpartitioned window
    (single-task at scale, forbidden by the registry lint); instead the
    rank comes from scale.global_sort_index (range partition + broadcast
    offsets) and pct = (pos-1)/(N-1) with N broadcast — fully parallel,
    bit-identical to the window form because the order is total."""
    from ..scale import global_sort_index

    d = load_tables(spark, sf_dir, "documents")["documents"]
    idx = global_sort_index(
        d.select("doc_id", "n_chars"),
        F.col("n_chars").asc(),
        F.col("doc_id").asc(),
        index_name="pos",
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        idx.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            # try_divide + coalesce: one single document -> 0/0 must yield
            # PERCENT_RANK's 0.0, not an ANSI DIVIDE_BY_ZERO abort
            F.round(
                F.coalesce(
                    F.try_divide(F.col("pos") - 1, F.col("n_docs") - 1), F.lit(0.0)
                ),
                6,
            ).alias("pct"),
        )
    )
