"""Strongly connected components via parallel Forward-Backward (FW-BW)
decomposition (Fleischer/Hendrickson/Pinar 2000; the standard distributed
SCC algorithm — Tarjan's stack DFS does not parallelize).

Each round picks the min-id pivot of every active partition, BFS-reaches
forward and backward from all pivots simultaneously (one frontier frame
covers every partition), takes SCC = fwd ∩ bwd, and splits each
partition's remainder into fwd-only / bwd-only / neither — three
subproblems that can never share an SCC. Expected O(log n) rounds; every
step is a keyed equi-join on (partition, node), so the whole thing is
shuffle-on-key at any scale. Deterministic: pivots are min ids, so the
output is a pure function of the edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realestatedeals_spark.util import checkpoint_owned, free_local_checkpoint


def _reach(
    state: DataFrame, edges: DataFrame, pivots: DataFrame, src: str, dst: str
) -> DataFrame:
    """(pid, node) reachable from each partition's pivot, pivot included,
    travelling src->dst over edges restricted to the partition's nodes."""
    # edges usable inside a partition: both endpoints still active in it
    e = (
        edges.join(
            state.select(F.col("node").alias(src), F.col("pid").alias("pid_src")), src
        )
        .join(
            state.select(F.col("node").alias(dst), F.col("pid").alias("pid_dst")), dst
        )
        .filter(F.col("pid_src") == F.col("pid_dst"))
        .select(
            F.col("pid_src").alias("pid"),
            F.col(src).alias("from_n"),
            F.col(dst).alias("to_n"),
        )
        .localCheckpoint(eager=True)
    )
    reach = pivots.select("pid", F.col("pivot").alias("node"))
    frontier = reach
    # Per-round storage release (round 11, the pagerank/pagerank_micros
    # discipline): each BFS round checkpoints a step and a widened reach;
    # once the new reach has materialized, the previous reach checkpoint is
    # unreachable, and once the NEXT step has materialized, the previous
    # step (this round's frontier) is too. Without the frees a deep reach
    # holds every round's frontier + prefix-union in executor storage for
    # the session's lifetime. The initial lazy ``reach`` is never a
    # checkpoint; free_local_checkpoint no-ops on non-checkpoints.
    reach_ckpt = prev_step = None
    while True:
        step = (
            frontier.select("pid", F.col("node").alias("from_n"))
            .join(e, ["pid", "from_n"])
            .select("pid", F.col("to_n").alias("node"))
            .distinct()
            .join(reach, ["pid", "node"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if prev_step is not None:
            free_local_checkpoint(prev_step)
        if step.isEmpty():
            # the returned reach is its own checkpoint (or the lazy pivot
            # frame) — the edge frame and the empty step are dead
            free_local_checkpoint(step)
            free_local_checkpoint(e)
            return reach
        new_reach = reach.unionByName(step).localCheckpoint(eager=True)
        if reach_ckpt is not None:
            free_local_checkpoint(reach_ckpt)
        reach = reach_ckpt = new_reach
        frontier = prev_step = step


def scc_fwbw(edges: DataFrame, max_rounds: int = 64) -> DataFrame:
    """SCC ids (min member id) for every node of a directed edge frame
    (columns u, v). Isolated-from-edges nodes don't exist here by
    construction; callers union singletons if their node set is wider."""
    nodes = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .distinct()
    )
    state = nodes.withColumn("pid", F.lit("r")).localCheckpoint(eager=True)
    # checkpoint_owned: if the CALLER handed us an already-checkpointed
    # frame, this re-checkpoint reuses its RDD — freeing it on exit would
    # destroy the caller's blocks, so the exit frees below are gated on
    # actually owning the materialization (ADVICE r11).
    edges, own_edges = checkpoint_owned(edges)
    # An EMPTY edge frame has an empty node set: the loop would break on
    # round 1 with nothing accumulated. Legitimate input (e.g. a threshold
    # filter that excluded every edge on a uniform corpus) — return the
    # typed empty result, not an AssertionError.
    out: DataFrame | None = None
    if state.isEmpty():
        return state.select("node", F.col("node").alias("scc_id")).limit(0)
    founds: list[DataFrame] = []
    for _ in range(max_rounds):
        if state.isEmpty():
            break
        pivots = state.groupBy("pid").agg(F.min("node").alias("pivot"))
        fwd = _reach(state, edges, pivots, "u", "v")
        bwd = _reach(state, edges, pivots, "v", "u")
        scc = fwd.join(bwd, ["pid", "node"])  # mutual reach incl. the pivot
        found = (
            scc.join(pivots, "pid")
            .select("node", F.col("pivot").alias("scc_id"))
            .localCheckpoint(eager=True)
        )
        founds.append(found)
        out = found if out is None else out.unionByName(found)
        remaining = state.join(scc, ["pid", "node"], "left_anti")
        remaining = (
            remaining.join(fwd.withColumn("inf", F.lit(1)), ["pid", "node"], "left")
            .join(bwd.withColumn("inb", F.lit(1)), ["pid", "node"], "left")
            .select(
                "node",
                F.concat(
                    "pid",
                    F.when(F.col("inf").isNotNull(), F.lit("f"))
                    .when(F.col("inb").isNotNull(), F.lit("b"))
                    .otherwise(F.lit("n")),
                ).alias("pid"),
            )
            .localCheckpoint(eager=True)
        )
        # found + remaining have materialized: this round's reach frames
        # and the previous state are dead — release them so live storage
        # stays ~(state + founds) instead of growing with rounds
        free_local_checkpoint(fwd)
        free_local_checkpoint(bwd)
        free_local_checkpoint(state)
        state = remaining
    else:
        # free the tracked frames before raising — a non-convergence error
        # must not leak a round's worth of checkpoints for the session
        for f in founds:
            free_local_checkpoint(f)
        free_local_checkpoint(state)
        if own_edges:
            free_local_checkpoint(edges)
        raise RuntimeError(f"scc_fwbw did not converge in {max_rounds} rounds")
    assert out is not None
    # one closing checkpoint so the per-round found frames and the final
    # (empty) state can be released too — the caller reads this checkpoint
    out = out.localCheckpoint(eager=True)
    for f in founds:
        free_local_checkpoint(f)
    free_local_checkpoint(state)
    if own_edges:
        free_local_checkpoint(edges)
    return out
