"""Iterative graph analytics on DataFrames: weighted PageRank.

`operators/dedup.py:connected_components` established the repo's
iterative-dataflow pattern (join + aggregate per step, checkpoint to
truncate lineage); PageRank is the other canonical fixed-iteration
graph workload a warehouse runs — ranking event-type transition
graphs, citation/link graphs, or provider cross-reference graphs
without leaving the engine.

Scale design (100 TB of edges):

- The edge frame is normalized ONCE (out-weight join), hash-partitioned
  by ``src``, and persisted — every iteration's rank join reuses that
  partitioning, so the per-iteration cost is shuffling the RANK frame
  (O(|nodes|), small side) to the edge partitioning plus one
  aggregate; the edge corpus itself never re-shuffles.
- Each iteration checkpoints the rank frame (`localCheckpoint` by
  default, reliable `checkpoint()` on clusters — same trade as
  connected_components), keeping the plan O(1)-deep instead of
  O(iterations)-deep, which is what keeps Catalyst analysis time flat.
- Dangling-node mass (rank parked on nodes with no out-edges) is
  folded back uniformly each iteration via a 1-row broadcast
  aggregate — the textbook correction, without which rank mass leaks
  and the result is not a probability distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.operators.dedup import (
    _CheckpointHandle,
    _with_cached_deps,
)


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    iterations: int = 8,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Weighted PageRank over a directed edge list, fixed iteration
    count (the deterministic formulation — fixed ``iterations`` rather
    than an epsilon stop, so two engines produce bit-comparable ranks).

    Returns (node, rank) over every node appearing as a source or
    destination, ranks summing to ~1.0 (full double precision — the
    caller rounds on emit). Parallel edges are legal (their weights
    add); ``weight_col=None`` means unit weights.

    Per iteration: rank ⋈ pre-partitioned edges on src → groupBy dst
    (two exchanges of the small rank frame, zero re-shuffles of the
    edge frame) + a 1-row dangling-mass broadcast. The iteration count
    is a parameter, not data-dependent — PageRank's standard use is a
    fixed-k power iteration.
    """

    def _ckpt(df: DataFrame, eager: bool = True) -> DataFrame:
        # intermediate rank frames checkpoint LAZILY: the final action
        # materializes the whole iteration chain as one cascaded job
        # sequence instead of 2·k driver-blocking jobs, while each
        # checkpoint still truncates lineage the moment it computes
        return (
            df.checkpoint(eager=eager)
            if reliable_checkpoint
            else df.localCheckpoint(eager=eager)
        )

    w = F.col(weight_col) if weight_col else F.lit(1.0)
    raw = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        w.cast("double").alias("w"),
    )
    out_w = raw.groupBy("src").agg(F.sum("w").alias("__wout"))
    norm = (
        raw.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("__wout")).alias("wn"))
        .repartition("src")
        .persist()
    )
    nodes = (
        norm.select(F.col("src").alias("node"))
        .union(norm.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        # loud contract error, not a ZeroDivisionError two jobs later
        norm.unpersist()
        nodes.unpersist()
        raise ValueError("pagerank: empty edge list (no nodes to rank)")
    src_nodes = norm.select("src").distinct().persist()
    dangling_nodes = nodes.join(
        src_nodes, nodes["node"] == src_nodes["src"], "left_anti"
    ).persist()
    # graphs where every node has out-edges (the common case for
    # transition graphs) conserve rank mass with no correction —
    # detecting that ONCE removes a per-iteration aggregate+broadcast
    # job, and `x + 0.0 == x` keeps the result bit-identical to the
    # corrected formula the oracle unrolls
    has_dangling = not dangling_nodes.isEmpty()

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    intermediates: list[DataFrame] = []
    for i in range(iterations):
        contrib = (
            ranks.join(norm, ranks["node"] == norm["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("wn")).alias("__contrib"))
        )
        new_ranks = nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
        if has_dangling:
            dangling = (
                ranks.join(
                    dangling_nodes.select(F.col("node").alias("__dn")),
                    ranks["node"] == F.col("__dn"),
                    "left_semi",
                )
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangling"))
            )
            new_ranks = new_ranks.crossJoin(F.broadcast(dangling))
            dangling_term = F.col("__dangling") / F.lit(float(n_nodes))
        else:
            dangling_term = F.lit(0.0)
        ranks = _ckpt(
            new_ranks.select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (F.coalesce(F.col("__contrib"), F.lit(0.0)) + dangling_term)
                ).alias("rank"),
            ),
            # no-dangling graphs reference `ranks` once per iteration,
            # so the un-materialized plan stays linear and every
            # checkpoint can be lazy (one cascaded job at the action);
            # with dangling nodes `ranks` fans out twice per iteration
            # (contrib + mass) and lazy plans would grow 2^k — keep
            # those eager
            eager=(has_dangling or i == iterations - 1),
        )
        if i < iterations - 1:
            intermediates.append(ranks)
    norm.unpersist()
    nodes.unpersist()
    src_nodes.unpersist()
    dangling_nodes.unpersist()
    # the final checkpoint is materialized (eager), so every earlier
    # iteration's checkpoint has served its purpose — release their
    # block-manager storage NOW instead of leaking k-1 RDDs per call
    for df in intermediates:
        _CheckpointHandle(df).unpersist()
    # the returned frame IS a checkpoint (materialized blocks); ride a
    # real release handle along as its cached dep so the callers'
    # unpersist_deps discipline frees the storage after the action
    return _with_cached_deps(ranks, [_CheckpointHandle(ranks)])


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 4,
) -> DataFrame:
    """Synchronous label-propagation community detection (LPA) over an
    undirected edge list, fixed iteration count — the deterministic
    formulation (each node adopts its neighbors' MODE label, frequency
    ties broken by MIN label; labels init to the node id). Connected
    components answers "which nodes touch at all"; LPA splits a
    component into densely-linked communities.

    Per iteration: one join of the label frame onto the pre-
    partitioned symmetric edge frame + one (node, label) count
    aggregate + one per-node top-1 window — the label frame is the
    only thing that moves, the edge frame shuffles ONCE up front.
    Intermediate label frames localCheckpoint lazily (the pagerank
    pattern: lineage truncation without 2·k driver-blocking jobs).
    All-integer arithmetic — bit-exact across engines by construction.

    Returns (node, community) for every node with at least one edge.
    """
    from pyspark.sql.window import Window

    both = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .unionAll(
            edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d"))
        )
        .where(F.col("s").isNotNull() & F.col("d").isNotNull())
        .where(F.col("s") != F.col("d"))
        .distinct()
        .repartition("s")
        .persist()
    )
    labels = both.select(F.col("s").alias("node")).distinct().select(
        "node", F.col("node").alias("community")
    )
    handles: list = [both]
    for _ in range(int(iterations)):
        nbr = both.join(
            labels, both["s"] == labels["node"]
        ).select(F.col("d").alias("node"), "community")
        counts = nbr.groupBy("node", "community").agg(
            F.count("*").alias("__c")
        )
        w = Window.partitionBy("node").orderBy(
            F.col("__c").desc(), F.col("community").asc()
        )
        labels = (
            counts.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("node", "community")
        ).localCheckpoint(eager=False)
        handles.append(_CheckpointHandle(labels))
    return _with_cached_deps(labels, handles)
