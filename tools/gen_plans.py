#!/usr/bin/env python
"""Regenerate PLANS.md: the physical-plan audit of the headline queries.

Usage: python tools/gen_plans.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOTES = {
    "q01_projection": "narrow scan+project; ReadSchema pruned to the 5 referenced columns",
    "q02_filter": "all five predicates in PushedFilters at the parquet scan",
    "q06_broadcast_join": "two BroadcastHashJoins; the only Exchange is the final groupBy",
    "q13_multiway_join": "star join: dims broadcast, facts joined, single agg shuffle; no nested-loop anywhere",
    "q14_groupby_agg": "partial HashAggregate below the Exchange (map-side combine), final above",
    "q23_ranking": "one Exchange on the window partition key, one sort per partition",
    "q27_global_sort": "global sort position with NO single-partition window: the range partition + local sort live in a checkpointed lineage (Scan ExistingRDD — one materialization pins the partitioning for both the rows and the counts branches), in-partition sequence from monotonically_increasing_id, offsets broadcast back",
    "q28_topk": "TakeOrderedAndProject: per-partition heaps, k rows to the driver, no global sort",
    "q29_topk_per_group": "WindowGroupLimit pushes rn<=3 into the window sort",
    "n01_exact_dedup": "single shuffle on the md5 digest; uniform keys so no skew possible",
    "n03_topk_cosine": "1-row query side broadcast; corpus scanned once; TakeOrderedAndProject for k",
    "n14_decontamination": "benchmark shingle set broadcast; corpus never shuffles for the join",
    "n17_stratified_sample": "WindowGroupLimit: per-stratum quota applied inside the sort, full strata never materialized",
    "x02_gapfill": "fact table aggregated before any join; calendar grid joins post-agg rows only; LOCF window shuffles the grid, not the facts",
    "q03b_partition_prune_own_sink": "partition predicate on the engine-written sink reaches the scan as PartitionFilters; only 3 of ~84 hive partitions are listed/read",
    "n25_context_chunking": "narrow-only: scan -> project -> generate (posexplode of the window starts) -> project; zero Exchange, linear in corpus size",
    "n26_chunk_dedup": "chunks explode narrowly, then ONE shuffle on the (uniform) chunk digest for the group-by; min-doc survivor keeps the result deterministic",
    "n29_boilerplate_share": "one corpus scan: the (doc, shingle, cnt) frame is checkpoint-pinned (Scan ExistingRDD) and feeds both the frequent-set branch and the final join; frequent set broadcast",
    "n30_unigram_lm_score": "model building is one pass (checkpointed (token, cnt) frame read by total / top-V / OOV floor); top-V cut via TakeOrderedAndProject; model broadcast to the exploded token stream so the corpus never shuffles for the scoring join; BIGINT micro-bit sums are order-independent",
    "n31_incremental_merge": "LEFT ANTI on the content digest — no row multiplication; the corpus side is a digest-only projection (text pruned from the join); uniform keys, bucketing-ready",
    "n32_truncation_dedup": (
        "prefix-8 digest bucket self-join (equi-join on pk, never all-pairs/"
        "nested-loop); in-bucket verify is one array-slice comparison; "
        "hot-bucket levers: longer K, AQE skew-join. The skew lever is "
        "EXERCISED (r5): against 2500 docs sharing one opening, "
        "scale.SKEW_SPLIT_CONF makes OptimizeSkewedJoin split the hot "
        "bucket — final plan shows SortMergeJoin(skew=true) over "
        "'AQEShuffleRead coalesced and skewed' (tests/test_scale.py::"
        "test_truncation_dedup_hot_bucket_aqe_skew_split, exact results) "
        "and bench shows ~5x (dedup_hot_bucket_plain 4.1 s vs _skewsplit "
        "0.8 s), conf-only with defaults already fitting 100 TB. n35 needs "
        "no lever: its distinct-collapse bounds every digest bucket to "
        "|sources| rows before the pair join"
    ),
    "n33_split_leakage": "LEFT JOIN against the deduped train shingle set (unique right key — no row multiplication); totals + leaked counts from ONE aggregation (conditional sum); r6: both split sides read the ONE checkpointed shingle frame (materialize-before-explode barrier) so the parquet is scanned once at materialization, not once per side",
    "n34_sequence_packing": "running token offsets via a window PARTITIONED on shard_id (distributed packing — no global running sum / SinglePartition anywhere); one shuffle to shards, one agg to packs",
    "g_regrid_bilinear": "MIXED-RESOLUTION corpus (0.5 + 0.25 deg): the per-file lattice step is the decoded header cellsize carried IN-ROW through the narrow decode — no join back to a header extract, so generalizing over resolution added ZERO Exchanges: still one narrow 4x contribution explode + ONE aggregation shuffle on (grid-hour, lattice, target-cell); all-corners gate drops edge/nodata targets",
    "g_gradient": "same contribution-explode shape as the regrid on the mixed-resolution corpus: per-file cellsize is in-row (no header join, no extra shuffle), one narrow generate with signed per-axis contributions, one shuffle, 4-contribution gate; integer sums keep both engines exact",
    "x06_scd2_intervals": "change-detect (lag) -> running version -> close (lead): every window partitioned on user_id, ts ties broken by event_id; shuffle-once-then-narrow",
    "n35_source_dup_matrix": "distinct (fingerprint, source) collapse BELOW the self-join bounds per-key fan-out by |sources|; equi-join on the digest, output bounded by |sources|^2",
    "n36_minhash_estimate": "r8 sketch: ONE polyhash per distinct shingle, then ALL 16 affine-permutation minima in a single aggregation pass (no seed fan-out, no nested loop — shuffle rows per doc: 1, was SEEDS); shingle frame checkpointed BEFORE the explode (computed-HOF-array-under-Generate re-evaluates per output row — measured 90x) and pinned for sketch + both exact-Jaccard branches; pair compares are equi-joins",
    "n42_minhash_banded_lsh": "full banded-LSH pipeline: shared affine sketch (checkpointed band frame — built once, not once per join side), bucket candidate stage is an equi self-join on (band, key) — O(colliding pairs), never all-pairs — guarded by the BUCKET_CAP saturation gate (rank-within-bucket window on the join's own partitioning; found by tools/scaling_probe.py, which measured the uncapped join quadratic on low-entropy corpora: stuck at 10x, ratio 1.24 with the cap); verify compares HASHED shingle sets (BIGINT array ops) over only the candidates",
    "g_zonal_stats": "zone catalog broadcast for the range join (q10 tiny-side pattern) — the point cloud never shuffles for the join; single aggregation Exchange",
    "n39_substring_dup_spans": "SINGLE corpus scan (the naive dup-set join-back scans the text twice): one narrow window-fingerprint explode, then digest-only shuffles over progressively collapsed sets — (digest, doc) partial+final HashAggregate, digest-partitioned window for the distinct-doc gate, per-doc fold; digests shuffle as unhex(md5)'s 16 raw bytes (measured 18.3 -> 11.8 MB at sf0.1), never text, no Join anywhere",
    "n40_mixture_temperature": "corpus never shuffles for the rates: per-source counts aggregate on the |sources|-ary key (partial combine), then the tiny rate table and 1-row normalizer BROADCAST back onto the doc rows for the pure-BIGINT keep predicate; no SortMergeJoin/ShuffledHashJoin in the plan",
    "g_zorder_cluster": "ZERO Exchange: the Morton key is 32 bit-interleave terms of codegen integer arithmetic appended to the narrow decode projection — no join, no UDF, no shuffle; the key exists to be a clustered-write sort key, so anything heavier here would be paid again by the writer's repartitionByRange",
    "n41_matryoshka_recall": "one corpus pass computes truncated and full cosine against a 1-row broadcast query vector; shortlist and rerank are TakeOrderedAndProject per-partition heaps (never a global sort/rangepartitioning of the corpus); final scalars are 1-row broadcast cross joins",
    "n44_corpus_keep_list": "the composed keep-list: ONE checkpoint-pinned tokenization frame feeds all three staged dedup branches (digest-window survivor pick, prefix-bucket truncation join among exact survivors, window-fingerprint fraction among docs surviving both); verdict assembly is three doc-id-keyed left joins back onto the corpus ids — uniform keys, no text in any shuffle after the fingerprint projections",
    "x04_sessionization": "ONE shuffle for the whole operator: the lag and running-sum windows share one Exchange+Sort on (user_id)(ts, event_id), and the session aggregate's grouping keys are a superset of the hash partitioning, so HashAggregate runs on the window output with no second Exchange",
    "q50_lateral_topk": "the correlated LATERAL LIMIT is DECORRELATED by Catalyst into a windowed rank — with WindowGroupLimit partial+final so each partition keeps only k rows through the sort — then a broadcast equi-join to the outer; never |outer| inner scans, no nested loop",
    "n45_bloom_prefilter": "probe stays narrow through THREE broadcast position joins (build side <= m=1024 rows by construction, so it broadcasts at ANY corpus size); corpus parquet scanned once — the digest frame is checkpoint-pinned and shared by the bloom build and the exact truth join; one final aggregation Exchange on source",
    "q51_recursive_cte": "Spark 4 UnionLoop: the recursion's working frame is ONE row per level (7 year levels), months expand non-recursively, and the orders fact is scanned ONCE outside the loop and joined broadcast — a recursion whose working set scaled with the fact would serialize the cluster behind the per-level driver loop",
    "x08_rolling_dau": "sliding COUNT DISTINCT as contribute-then-dedup: the fact collapses to the checkpoint-pinned DISTINCT (user, day) frame (read once — it feeds both the window explode and the bounds aggregate), the |window|x inflation applies to that collapsed set, both big shuffles key on uniform pairs, and the day rollup + spine join touch only |days|-sized frames",
    "x09_rolling_dau_hll": "the wide-window production form: ONE fact pass builds per-day HLL sketches (map-side partial sketch merge), the window union merges |days| x window KB-sized sketches — state independent of user cardinality; rows-only by contract, error-fenced against x08",
    "n46_source_overlap_theta": "per-source theta sketches built in one fact pass (map-side partials), then the pair matrix is a broadcast cross of |sources| sketch rows with theta_intersection per pair — no corpus-scale join anywhere; exact-fenced against n35 below nominal entries",
    "n47_source_pagerank": "iterative operator: the corpus is touched ONCE (n35's distinct fingerprint collapse) into a checkpoint-pinned edge frame; each of the 8 fixed iterations joins the |sources|-row rank frame (broadcast) against it and re-aggregates — per-iteration lineage truncation keeps analysis linear, so the final plan shows only the last iteration over Scan ExistingRDD (the checkpoints); nothing in the loop rescans or reshuffles the corpus",
    "n48_authority_weighted_sampling": "composed sampler: n47's rank chain plus ONE pinned (doc_id, source, u24) projection shared by the per-source counts and the keep decision; the |sources|-row alloc table broadcasts back onto the pinned projection, so the corpus never shuffles for the draw — the only corpus-scale exchanges are the rank chain's fingerprint collapse and the final |sources|-key aggregation of keep flags",
    "n49_incremental_lsh_dedup": "arrival-posture near-dedup: the INDEX side (banded membership + hashed shingle sets — at production scale a persisted parquet index, see lsh_index.py) is only ever scanned; the arriving shard's band frame, hset slice, candidate frame and verdict aggregate all BROADCAST onto it, so every join is BroadcastHashJoin and the plan contains zero SortMergeJoin — the index never shuffles for an increment (asserted in tests/test_plans.py); both bucket memberships are BUCKET_CAP-gated so the candidate join is O(colliding pairs) with per-bucket fan-out bounded (CI pair-volume fence)",
    "x10_heavy_hitters": "exact heavy hitters: partial map-side count below the single key Exchange, TakeOrderedAndProject heaps above it (k rows to the driver, never a global sort) — but note the Exchange carries one row per DISTINCT key, which is why x10b exists",
    "x10b_heavy_hitters_mg": "bounded-memory form: ONE hash-shard Exchange + in-partition sort pins a deterministic arrival order, then an Arrow-batched mapInPandas folds Misra-Gries counters (<= N_BUCKETS*K_COUNTERS state total, independent of key cardinality); the candidate frame is metadata-sized and the final top-k is a per-partition heap",
}


def main() -> int:
    from etl_bom_radiation_spark.grid.decode import decode_grid_directory
    from etl_bom_radiation_spark.queries import load_all
    from etl_bom_radiation_spark.session import get_spark

    spark = get_spark(app_name="plandoc")
    qs = load_all()
    sf = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")

    out = [
        "# PLANS — physical-plan audit of the headline queries",
        "",
        "Regenerated from the live registry (`python tools/gen_plans.py`); the",
        "properties below are also asserted in `tests/test_plans.py`, so a plan",
        "regression fails CI before it becomes a 100x-scale bench regression.",
        "",
    ]
    for name, note in NOTES.items():
        p = qs[name].fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        out += [f"## {name}", "", f"**Why this plan:** {note}", "", "```", p.strip()[:2500], "```", ""]

    p = (
        decode_grid_directory(spark, "fixtures/grids")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    out += [
        "## grid decode (flagship)",
        "",
        "**Why this plan:** zero Exchange — scan -> project -> generate -> generate -> filter -> project;",
        "parallelism is per file, the natural unit for a non-splittable format. Scales linearly with file count.",
        "",
        "```",
        p.strip()[:2500],
        "```",
        "",
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print("PLANS.md regenerated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
