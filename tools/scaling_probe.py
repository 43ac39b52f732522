#!/usr/bin/env python
"""Empirical scaling-curve probe: do the heavy declared operators scale
near-linearly with corpus size, as their plan-shape arguments claim?

Plans argue "no all-pairs, bounded fan-out, uniform shuffle keys"; this
probe MEASURES it.  It synthesizes documents/events corpora at 1x and Mx
the sf0.1 shape (word salad with realistic token diversity, duplicated
texts and small shared-opening groups so the dedup operators have real
work; Zipf-ish user activity for events), times a
fixed list of the most expensive operators at both sizes (warmup + best
of 2, noop sink), and reports t(Mx)/t(1x) per operator.

Reading the ratios: an operator whose plan is linear should land near M
(shuffle volume dominates; task-count overhead pulls it below M at local
scale); a superlinear ratio (>> M) is a quadratic term a plan argument
missed — exactly the regression class that only shows at 100 TB.

Usage:  python tools/scaling_probe.py [M]        (default M=10)
Prints one JSON line: {"m": M, "ops": {name: {"t1": s, "tm": s,
"ratio": r}}}.  Corpora go under /tmp and are removed on exit.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: operators probed — the shuffle-heaviest of the text/dedup/events
#: families (grid ops scale with file count, probed by bench's
#: 1000-file decode instead)
OPS = [
    "n01_exact_dedup",
    "n32_truncation_dedup",
    "n39_substring_dup_spans",
    "n42_minhash_banded_lsh",
    "n44_corpus_keep_list",
    "n22_tfidf_topterms",
    "x04_sessionization",
    "x08_rolling_dau",
    # signature-bucket family (the second quadratic the probe caught:
    # uncapped simhash collision joins; SIMHASH_BUCKET_CAP fix)
    "n11b_simhash_neardup",
    "n20_dedup_clusters",
]

#: relational-core ops probed in ``--relational`` mode over a key-shifted
#: Mx replication of the sf0.1 TPC-H facts (dims stay 1x — they broadcast)
REL_OPS = [
    "q05_inner_join",
    "q14_groupby_agg",
    "q16_count_distinct",
    "q23_ranking",
    "q27_global_sort",
    "q13b_profit_star",
    "x02_gapfill",
]

BASE_DOCS = 5_000
BASE_EVENTS = 100_000

SF01 = "/root/testdata/sf0.1"


def gen_relational(spark, out_dir: str, mult: int) -> None:
    """The sf0.1 TPC-H tables with the two FACTS (lineitem, orders)
    replicated ``mult`` times under shifted order keys (so the fact-fact
    join fans out realistically instead of multiplying matches per key);
    dimensions copied 1x — at scale they broadcast, so growing them would
    only distort the ratio."""
    from pyspark.sql import functions as F

    for t in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{SF01}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    od = spark.read.parquet(f"{SF01}/orders.parquet")
    step = od.agg(F.max("o_orderkey")).collect()[0][0] + 1
    li_m = li
    od_m = od
    for i in range(1, mult):
        li_m = li_m.unionByName(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * step))
        )
        od_m = od_m.unionByName(
            od.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * step))
        )
    li_m.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    od_m.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")


def gen_corpus(spark, out_dir: str, mult: int) -> None:
    """documents + events at ``mult`` x the sf0.1 row counts, same shape:
    ~20 sources, 8-90 token docs over a ~5000-word synthetic vocabulary,
    ~10% exact-duplicate texts and ~10% shared openings in ~5-doc groups
    (so every dedup stage has work); events over mult*1500 users across
    30 days."""
    from pyspark.sql import functions as F

    n_docs = BASE_DOCS * mult
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        # ~10% duplicate pairs: doc 10k..11k copies doc 0..1k's seed
        F.when(F.col("id") % 10 == 7, F.col("id") - 7)
        .otherwise(F.col("id"))
        .alias("seed"),
    )
    # tokens are 'w<h>' over a ~5000-word synthetic vocabulary. The hash
    # MIXES seed and position non-linearly (seed*i term): a pure
    # linear-congruential pmod(seed*a + i*b, m) makes the whole opening a
    # function of seed mod m — the first generator did exactly that and
    # collapsed 150k docs into 24 giant truncation buckets, turning every
    # prefix-bucket op pathological (a corpus shape the real fixtures do
    # NOT have: their openings are diverse token sequences).
    tok_hash = lambda key, i: F.pmod(key * 131 + key * i * 31 + i * 71 + 17, F.lit(5003))
    toklist = F.transform(
        F.sequence(
            F.lit(0),
            # length 8..88 tokens, deterministic per seed
            (F.pmod(F.col("seed") * 31 + 11, F.lit(81)) + 8).cast("int"),
        ),
        # ~10% shared openings, in SMALL groups: seeds ending in 3 share
        # their first 8 tokens with the other such seeds of their 50-seed
        # block (~5 docs per opening — realistic syndication, many small
        # buckets; the corpus-wide hot bucket lives, deliberately, in
        # scale.gen_skewed_documents).
        lambda i: F.concat(
            F.lit("w"),
            F.when(
                (F.col("seed") % 10 == 3) & (i < 8),
                tok_hash((F.col("seed") / 50).cast("long"), i),
            )
            .otherwise(tok_hash(F.col("seed"), i))
            .cast("string"),
        ),
    )
    docs = base.select(
        "doc_id",
        F.concat_ws(" ", toklist).alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("fr"), F.lit("de")),
            (F.pmod(F.col("seed"), F.lit(3)) + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("src"), F.pmod(F.col("seed"), F.lit(20)).cast("string")).alias(
            "source"
        ),
    ).withColumn("n_chars", F.length("text"))
    docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    n_events = BASE_EVENTS * mult
    ev = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1704067200_000_000)  # 2024-01-01
            + F.pmod(F.col("id") * 7919, F.lit(30 * 86400)) * 1_000_000
        ).alias("ts"),
        # Zipf-ish: square a uniform to concentrate activity
        F.pmod(
            (F.pmod(F.col("id") * 104729, F.lit(1500 * 1500))
             / F.lit(1500)).cast("long"),
            F.lit(1500 * mult),
        ).alias("user_id"),
        F.lit("e").alias("event_type"),
        (F.pmod(F.col("id"), F.lit(100)) / 10.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    ev.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def time_op(spark, fn, sf_dir: str) -> float:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mult = int(args[0]) if args else 10
    relational = "--relational" in sys.argv
    from etl_bom_radiation_spark.queries import load_all
    from etl_bom_radiation_spark.session import get_spark

    spark = get_spark(app_name="scaling_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = load_all()
    out = {}
    d1 = tempfile.mkdtemp(prefix="probe_1x_")
    dm = tempfile.mkdtemp(prefix=f"probe_{mult}x_")
    gen = gen_relational if relational else gen_corpus
    ops = REL_OPS if relational else OPS
    try:
        gen(spark, d1, 1)
        gen(spark, dm, mult)
        for name in ops:
            t1 = time_op(spark, qs[name].fn, d1)
            tm = time_op(spark, qs[name].fn, dm)
            out[name] = {
                "t1": t1,
                "tm": tm,
                "ratio": round(tm / t1, 2) if t1 > 0 else None,
            }
            print(f"{name}: 1x={t1}s {mult}x={tm}s ratio={out[name]['ratio']}",
                  file=sys.stderr)
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(dm, ignore_errors=True)
    print(json.dumps({"m": mult, "ops": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
