"""Distributed PageRank — iterative joins done with Spark's cost model in
mind.

Extends the reference's graph surface (it only WRITES a property graph to
Neo4j, graph.py:1-52 via io/sinks.py here) with actual graph analytics over
the same node/edge frames.

Scale shape per iteration: ONE join of ranks against the edge list on src +
ONE groupBy dst — both hash-shuffles on node keys. The edge list is
repartitioned on src once and persisted, so every iteration's join reuses
that layout and only the (node-proportional, narrow) rank frame moves.
Dangling-node mass is folded in via a 1-row aggregate frame broadcast-crossed
onto the ranks (bounded side, whitelisted BNLJ pattern used engine-wide).
Rank lineage is cut every few iterations: without it, iteration N's plan
replays 0..N-1.

Convergence is the caller's concern (fixed ``iters`` here); the pure-numpy
power-iteration reference in tests/test_pagerank.py pins values to ~1e-9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realestatedeals_spark.util import free_local_checkpoint


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Ranks for every node in ``edges`` (directed, deduped by caller).

    Returns (node, rank). Dangling nodes (no out-edges) redistribute their
    mass uniformly, so total rank stays 1 every iteration.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # one shuffle to lay edges+degree out by src; every iteration reuses it
    e_deg = e.join(out_deg, "src").repartition("src").persist()
    e_deg.count()

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    prev_ckpt = None
    pending_contribs: list[DataFrame] = []
    for it in range(iters):
        contribs = (
            e_deg.join(ranks, e_deg.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
            .persist()
        )
        # Total rank is exactly 1 every iteration (the update below makes it
        # so by construction), and each non-dangling node's whole rank flows
        # out — so dangling mass = 1 − Σ inflow. One aggregate over the
        # (already needed) contribs frame replaces a separate ranks ⋈
        # out-degree anti-pass per iteration.
        dangling = contribs.agg(
            (F.lit(1.0) - F.coalesce(F.sum("inflow"), F.lit(0.0))).alias(
                "dangling_mass"
            )
        )
        base = F.lit((1.0 - damping) / n_nodes)
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    base
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dangling_mass") / n_nodes
                    )
                ).alias("rank"),
            )
        )
        pending_contribs.append(contribs)
        if (it + 1) % 4 == 0 and it + 1 < iters:
            # eager + free-previous (see pagerank_micros): live checkpoint
            # storage stays ~1 rank frame; the per-iteration contribs
            # persists behind the new checkpoint are also released here
            # (cache-manager entries — plain unpersist works for those).
            ranks = ranks.localCheckpoint(eager=True)
            if prev_ckpt is not None:
                free_local_checkpoint(prev_ckpt)
            prev_ckpt = ranks
            for c in pending_contribs:
                c.unpersist()
            pending_contribs = []
    # Final eager checkpoint so EVERYTHING behind it can be released now:
    # without it the tail iterations' contribs persists (all of them when
    # iters ≤ 4 — the cadence condition never fires) plus the nodes/e_deg
    # caches would stay in executor storage for the session's lifetime.
    # The caller materializes the result anyway; only this checkpoint
    # remains live, and it IS the returned data.
    ranks = ranks.localCheckpoint(eager=True)
    if prev_ckpt is not None:
        free_local_checkpoint(prev_ckpt)
    for c in pending_contribs:
        c.unpersist()
    nodes.unpersist()
    e_deg.unpersist()
    return ranks


def pagerank_micros(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 1_000_000_000_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic INTEGER PageRank — the oracle-able companion of
    ``pagerank`` (the x3_pca_gram / x3_kmeans pattern: surface the
    distributed machinery in exact integer arithmetic so DuckDB can
    recompute it hash-exactly, leaving only float accumulation to the
    numpy parity test).

    Ranks live in int64 at ``scale`` total mass; every step is integer:
    per-edge contribution = r_src div out_deg (floor), inflow = exact
    int64 sum (order-independent), dangling share = dangling_total div n,
    r' = (15*scale) div (100*n) + (85 * (inflow + share)) div 100 — the
    damping-0.85 update with floors. Identical formulas in the SQL oracle
    (plans/graph.py:_G3B_ORACLE), so Spark and DuckDB are bit-equal.
    Scale shape per iteration is exactly ``pagerank``'s: one join on src
    + one groupBy dst + a 1-row dangling aggregate broadcast-crossed on."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    e_deg = e.join(out_deg, "src").repartition("src").persist()
    e_deg.count()

    base = (15 * scale) // (100 * n)  # exact python int, same formula as SQL
    ranks = nodes.select("node", F.lit(scale // n).cast("long").alias("r"))
    prev_ckpt = None
    for it in range(iters):
        contribs = (
            e_deg.join(ranks, e_deg.src == ranks.node)
            .select(F.col("dst").alias("node"), F.expr("r div out_deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("inflow"))
        )
        dangling = (
            ranks.join(out_deg, ranks.node == out_deg.src, "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"(85 * (coalesce(inflow, 0) + dang div {n})) div 100"
                    )
                ).cast("long").alias("r"),
            )
        )
        # Truncate the rank lineage EVERY iteration. Without this the
        # unrolled 3-iteration plan re-derived every iteration from the
        # base scans — 153 shuffles / 146 scans printed vs ~per-iteration
        # counts now; integer arithmetic is unaffected, so the SQL fixpoint
        # oracle stays hash-exact. EAGER + free-previous (round 11, ADVICE):
        # once iteration k's checkpoint has materialized, iteration k−1's
        # storage is unreachable by anything downstream — freeing it bounds
        # live checkpoint storage at ~2 rank frames instead of growing
        # linearly with iters for the session's lifetime. (The final
        # checkpoint stays persisted: the returned lazy frame reads it.)
        if it + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
            if prev_ckpt is not None:
                free_local_checkpoint(prev_ckpt)
            prev_ckpt = ranks
    # Same closing release as ``pagerank``: checkpoint the final ranks so
    # the last interior checkpoint and the nodes/e_deg caches — all dead
    # once this materializes — can be freed instead of living out the
    # session. Integer values are unaffected; the g3b oracle stays
    # hash-exact.
    ranks = ranks.localCheckpoint(eager=True)
    if prev_ckpt is not None:
        free_local_checkpoint(prev_ckpt)
    nodes.unpersist()
    e_deg.unpersist()
    return ranks
