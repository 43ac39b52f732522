"""Distributed graph primitives needed by the dedup pipeline.

The one operator large-scale dedup actually needs from graph land is
connected components: near-duplicate *pairs* (from MinHash/SimHash/embedding
candidates) must be grouped into duplicate *clusters* so exactly one
canonical document per cluster survives. The reference has no analog — its
dedup story is per-file idempotence (bom_partition.py:29-49); this is part
of the north-star LLM-pipeline surface (SURVEY §2.H).

Algorithm: iterative min-label propagation ("hash-to-min" family,
Rastogi et al., ICDE 2013). Every vertex starts labeled with its own id;
each round every vertex takes the min label over itself and its neighbors;
fixpoint = every vertex labeled with the smallest id reachable from it,
i.e. its component. Each round is two shuffles (edges ⋈ labels, then a
groupBy-min), both on uniformly-distributed id keys; rounds needed = graph
diameter (+1 confirmation round to detect the fixpoint). Near-dup graphs
are unions of small dense clusters, so the diameter — and the round count —
stays small even at 100 TB corpus scale.
``localCheckpoint`` truncates lineage each round so the plan doesn't grow
with the iteration count; pass ``checkpoint_dir`` for reliable
``checkpoint`` at cluster scale (survives executor loss; intermediate
rounds' checkpoint files are cleaned as soon as the next round
materializes). Convergence is detected with a 1-row aggregate
(sum of labels — strictly decreasing until fixpoint), never a collect.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: serializes the reliable-checkpoint path: setCheckpointDir is global
#: SparkContext state, and even per-call namespaces cannot stop call A's
#: round from being misrouted into call B's namespace (where B's round
#: cleanup would delete it) if their setCheckpointDir/checkpoint windows
#: interleave — so concurrent driver-thread calls simply take turns
#: (code-review r6; the localCheckpoint path has no global state and
#: does not lock)
_RELIABLE_CKPT_LOCK = threading.Lock()


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Label every vertex with the minimum vertex id in its component.

    ``vertices`` needs column *id_col*; ``edges`` needs *src_col*/*dst_col*
    (treated as undirected — each edge is symmetrized internally, so pairs
    may be given once in either orientation). Returns ``(id, component)``.

    Deterministic: the label is a pure function of the graph (min reachable
    id), independent of partitioning or iteration order.

    *id_col* (and the edge endpoints) must be an INTEGRAL type: the label
    min/fixpoint arithmetic is defined over integer ids, and the
    convergence check sums labels (as DECIMAL(38,0), so any long magnitude
    is overflow-safe). A non-integral id column raises ``TypeError`` up
    front — with strings the sum would abort under ANSI (or silently
    null-converge with ANSI off), both worse than a loud contract
    (code-review r6). Hash ids fit: map them to BIGINT (e.g. xxhash64)
    first. Every edge endpoint must also appear in ``vertices`` — an
    endpoint missing from the vertex set is silently dropped by the
    propagation join and can SPLIT a component (the in-repo callers build
    vertices from the edge list, which satisfies this by construction).

    ``checkpoint_dir`` switches the per-round lineage truncation from
    ``localCheckpoint`` (executor-local blocks — fast, but an executor
    loss mid-iteration aborts the job) to RELIABLE ``checkpoint`` into
    per-round subdirectories of that directory (HDFS/S3 on a cluster):
    each round's labels survive executor loss, the right trade for a
    long-running 100 TB dedup job (VERDICT r4 #5). Round ``k``'s files are
    deleted as soon as round ``k+1`` materializes (reliable checkpoints
    are never auto-cleaned, so without this the directory would grow
    O(iterations x |vertices|) — code-review r5); the FINAL round's files
    and the edge checkpoint back the returned DataFrame and stay until the
    caller discards the directory. Note ``setCheckpointDir`` is global
    SparkContext state (ADVICE r5): rounds are namespaced under a per-call
    ``cc_<uuid>`` subdirectory so two concurrent calls on one context never
    checkpoint into (or delete) each other's round dirs, and on exit the
    global dir is restored to its previous value — or, when none was set,
    reset to the ``checkpoint_dir`` ROOT, so a later unrelated
    ``.checkpoint()`` on the same context writes into the caller-owned root
    rather than a round directory this function may delete. Single-machine
    runs keep the local default.

    Concurrency: reliable-checkpoint calls on one SparkContext are
    serialized by a module lock (`setCheckpointDir` is global context
    state; interleaved calls could misroute a live round into a namespace
    another call deletes). localCheckpoint calls run unlocked.

    ``max_iterations`` bounds the LABEL-CHANGING rounds (= graph diameter);
    the fixpoint confirmation round is extra and not counted, so
    ``max_iterations=d`` suffices for a diameter-``d`` graph. Raises
    ``RuntimeError`` if labels are still changing after the bound —
    returning silently would hand unconverged, WRONG component labels to
    the dedup survivor choice downstream.
    """
    from uuid import uuid4

    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    _integral = (ByteType, ShortType, IntegerType, LongType)
    for df, col in ((vertices, id_col), (edges, src_col), (edges, dst_col)):
        t = df.schema[col].dataType
        if not isinstance(t, _integral):
            raise TypeError(
                f"connected_components requires integral id columns, but "
                f"{col!r} is {t.simpleString()}; map hash/string ids to "
                "BIGINT (e.g. xxhash64) first"
            )

    spark = vertices.sparkSession
    sc = spark.sparkContext
    prev_ckpt_dir = None
    fs = None
    call_ns = None
    if checkpoint_dir is not None:
        # acquire BEFORE snapshotting the global dir (code-review r6 #2):
        # snapshotting outside the lock can capture another call's live
        # round namespace and later "restore" the context to a directory
        # that call has already deleted. All further setup happens inside
        # the try so any failure still releases the lock and restores the
        # dir via the finally.
        _RELIABLE_CKPT_LOCK.acquire()

    def _pin(df: DataFrame, tag: str) -> DataFrame:
        if checkpoint_dir is None:
            return df.localCheckpoint()
        # per-round subdirectory: lets round k-1 be deleted wholesale once
        # round k has materialized (eager=True returns only after the files
        # are written, so the delete below never races the write)
        sc.setCheckpointDir(f"{call_ns}/{tag}")
        return df.checkpoint(eager=True)

    def _drop_round(tag: str) -> None:
        if fs is not None:
            fs.delete(  # best-effort: checkpoint GC — a kept round only leaks scratch
                spark._jvm.org.apache.hadoop.fs.Path(f"{call_ns}/{tag}"),
                True,
            )

    try:
        if checkpoint_dir is not None:
            opt = sc._jsc.sc().getCheckpointDir()
            prev_ckpt_dir = opt.get() if opt.isDefined() else None
            from .workspace import _fs as _ws_fs

            fs, _, jvm = _ws_fs(spark, checkpoint_dir)
            # per-call namespace (ADVICE r5): each call round-checkpoints
            # under its own uuid dir; with the lock serializing the whole
            # reliable path, no other call can interleave a
            # setCheckpointDir between this call's rounds
            call_ns = f"{checkpoint_dir}/cc_{uuid4().hex}"
        # Checkpoint the symmetrized edge set once: it is re-joined every
        # round, and recomputing its lineage (often an expensive
        # candidate-pair generation, e.g. a SimHash self-join) per round
        # would multiply that cost by the iteration count.
        sym = _pin(
            edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
            .union(edges.select(F.col(dst_col).alias("_s"), F.col(src_col).alias("_d"))),
            "edges",
        )

        comp = _pin(
            vertices.select(F.col(id_col).alias("id"), F.col(id_col).alias("component")),
            "round0",
        )
        _label_sum = F.sum(F.col("component").cast("decimal(38,0)"))
        prev_sum = comp.agg(_label_sum).first()[0]

        # max_iterations label-changing rounds + 1 fixpoint-confirmation
        # round (the round whose sum matches the previous one): a
        # diameter-d graph converges with max_iterations=d (code-review r5
        # fixed the off-by-one that raised on exactly-diameter bounds)
        for i in range(1, max_iterations + 2):
            # min label among each vertex's neighbors this round
            nbr = (
                sym.join(comp, sym["_s"] == comp["id"])
                .groupBy(F.col("_d").alias("id"))
                .agg(F.min("component").alias("_nbr"))
            )
            comp = _pin(
                comp.join(nbr, "id", "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"), F.coalesce("_nbr", "component")
                    ).alias("component"),
                ),
                f"round{i}",
            )
            _drop_round(f"round{i - 1}")
            # labels only ever decrease, so an unchanged sum is a fixpoint
            cur_sum = comp.agg(_label_sum).first()[0]
            if cur_sum == prev_sum:
                return comp
            prev_sum = cur_sum
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "label-changing rounds — the graph's diameter exceeds the bound; "
            "raise max_iterations (dedup candidate graphs are unions of "
            "small dense clusters, so hitting this usually means the edge "
            "set is wrong)"
        )
    finally:
        if checkpoint_dir is not None:
            # Always reset the global dir (ADVICE r5): leaving it pointed at
            # a round subdir would route later unrelated .checkpoint() calls
            # into a directory this function deletes. With no previous value
            # to restore there is no unset API, so the caller-owned root is
            # the least-surprising destination.
            sc.setCheckpointDir(
                prev_ckpt_dir if prev_ckpt_dir is not None else checkpoint_dir
            )
            _RELIABLE_CKPT_LOCK.release()
