"""k-core decomposition by distributed peeling (graph engine addition).

The k-core of a graph is the maximal subgraph where every node has degree
≥ k — the standard density filter before community detection and a robust
spam/boilerplate signal on co-occurrence graphs. Computed by iterated
peeling: drop nodes with degree < k, recompute degrees, repeat to fixpoint.

Scale shape: each round is one degree aggregation (groupBy on node) plus a
semi-join filter of the edge list — both shuffle on the node key, and the
edge set only ever shrinks. Convergence is data-dependent but each round
removes at least one node or stops; on power-law graphs peeling at fixed k
converges in a few rounds because low-degree mass goes first. Lineage is
truncated per round with ``localCheckpoint`` so the plan doesn't grow with
iteration count (same discipline as ``operators/pagerank.py``).

``core_numbers`` (full coreness) runs the fixed-k peel for k = 1, 2, … until
the graph empties — degeneracy+1 phases; at 100 TB cap phases via ``max_k``
(everything surviving the cap reports coreness ≥ max_k), which is how
production systems bound the tail (the k you act on is small).

Edges are undirected, given as canonical ``a < b`` pairs, deduplicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realestatedeals_spark.util import free_local_checkpoint


def _degrees(edges: DataFrame) -> DataFrame:
    both = edges.select(F.col("a").alias("node")).unionAll(
        edges.select(F.col("b").alias("node"))
    )
    return both.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))


def k_core(edges: DataFrame, k: int, max_rounds: int | None = None) -> DataFrame:
    """Edges of the k-core subgraph. Peels until no node has degree < k.

    Runs to fixpoint by default: every round removes at least one node (the
    current weak frontier is non-empty or we return), so the edge set strictly
    shrinks and termination is guaranteed in ≤ |V| rounds. Chain/path-shaped
    graphs genuinely need O(|V|) rounds (a 2n-node path at k=2 peels from both
    ends, n rounds), so a silent round cap would return a subgraph that still
    contains degree<k nodes — wrong coreness downstream with no error. If a
    caller sets ``max_rounds`` as a safety rail, exhausting it raises instead
    of returning the unconverged edge set.
    """
    cur = edges.select("a", "b").distinct().localCheckpoint(eager=True)
    rounds = 0
    while True:
        deg = _degrees(cur)
        weak = deg.filter(F.col("degree") < k).select("node")
        n_weak = weak.count()
        if n_weak == 0:
            return cur
        if max_rounds is not None and rounds >= max_rounds:
            free_local_checkpoint(cur)  # don't leak the edge frame on raise
            raise RuntimeError(
                f"k_core(k={k}) not converged after {max_rounds} rounds "
                f"({n_weak} weak nodes remain); rerun with max_rounds=None"
            )
        new_cur = (
            cur.join(weak.withColumnRenamed("node", "a"), "a", "left_anti")
            .join(weak.withColumnRenamed("node", "b"), "b", "left_anti")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        # the peeled frame has materialized; the previous round's checkpoint
        # is dead — release it so live storage stays ~1 edge frame instead
        # of one per round (pagerank discipline)
        free_local_checkpoint(cur)
        cur = new_cur
        rounds += 1


def k_core_nodes(edges: DataFrame, k: int) -> DataFrame:
    """(node, core_degree) for nodes in the k-core; core_degree is the degree
    within the surviving subgraph (≥ k by construction)."""
    return _degrees(k_core(edges, k))


def core_numbers(edges: DataFrame, max_k: int | None = None) -> DataFrame:
    """(node, coreness) for every node; coreness capped at ``max_k`` if set
    (survivors of the capped peel report coreness = max_k)."""
    spark = edges.sparkSession
    cur = edges.select("a", "b").distinct().localCheckpoint(eager=True)
    out: list[DataFrame] = []
    k = 1
    while True:
        before = _degrees(cur).select("node")
        new_cur = k_core(cur, k)
        after = _degrees(new_cur).select("node")
        peeled = before.join(after, "node", "left_anti").withColumn(
            "coreness", F.lit(k - 1).cast("int")
        )
        out.append(peeled.localCheckpoint(eager=True))
        # ``before`` (the only reader of the pre-peel frame) materialized
        # into the peeled checkpoint — release the previous phase's edges
        free_local_checkpoint(cur)
        cur = new_cur
        if cur.isEmpty():
            break
        if max_k is not None and k >= max_k:
            out.append(after.withColumn("coreness", F.lit(k).cast("int")))
            break
        k += 1
    if not out:
        return spark.createDataFrame([], "node bigint, coreness int")
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    # closing checkpoint so every per-phase checkpoint can be released now
    # (the capped-peel tail, if any, reads ``cur`` — freed after this too)
    res = res.localCheckpoint(eager=True)
    for df in out:
        free_local_checkpoint(df)
    free_local_checkpoint(cur)
    return res
