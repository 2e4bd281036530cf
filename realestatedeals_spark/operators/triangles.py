"""Distributed triangle counting with degree-ordered edge orientation.

The standard scalable formulation (Suri & Vassilvitskii, "Counting Triangles
and the Curse of the Last Reducer", WWW 2011): orient every undirected edge
from its lower-(degree, id) endpoint to its higher one, enumerate wedges at
each edge source, and close them against the oriented edge set. Each
triangle {x, y, z} (rank x < y < z) is produced exactly once — as the wedge
(x→y, x→z) closed by (y→z) — and the wedge count is Σ C(outdeg(v), 2)
where orientation bounds outdeg by O(√m) on ANY graph, which is what tames
the high-degree "last reducer" that a naive id-ordered wedge join hits on
skewed degree distributions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_edges(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Canonical distinct undirected edge set (u < v) from a pair stream."""
    u = F.least(F.col(a), F.col(b)).alias("u")
    v = F.greatest(F.col(a), F.col(b)).alias("v")
    return pairs.filter(F.col(a) != F.col(b)).select(u, v).distinct()


def node_triangles(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts + degree + local clustering coefficient.

    Input: distinct undirected edges (u, v) with u < v. Output one row per
    node with ≥1 edge: (node, degree, triangles, clustering_coeff).

    Plan: degree groupBy → two broadcast-or-shuffle joins to attach endpoint
    degrees → re-orient by (degree, id) → wedge self-join on the oriented
    source (the one quadratic-in-outdeg step, bounded O(√m) per node by the
    orientation) → closing equi-join on (y, z) → per-node count union. All
    shuffles carry (long, long) ids; nothing is ever collected.
    """
    # deg is reused 3× (both endpoint-degree joins + the final output join)
    # and eo 3× (both wedge sides + the closing join): materialize each once
    # with localCheckpoint so the physical plan reads the computed frame
    # instead of re-expanding the whole upstream subtree per use (unpersisted
    # this plan materializes ~97 exchanges; checkpointed it's ~a dozen). At
    # cluster scale this is persist(MEMORY_AND_DISK) / a checkpoint to
    # durable storage — same discipline as operators/pagerank.py.
    #
    # edges itself is read by BOTH deg and eo, and the caller's edge build
    # (g4: a basket-quadratic self-join + distinct) is the most expensive
    # upstream step — uncheckpointed it executed twice (round 12, guide
    # §2.4: recompute across actions is a removable pass). The pin is
    # internal: it is freed as soon as its last reader (eo) materializes,
    # so the caller's frame is never truncated (the scc_fwbw ownership
    # lesson, ADVICE r11).
    from realestatedeals_spark.util import free_local_checkpoint

    edges = edges.localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=True)
    )
    ed = edges.join(
        deg.select(F.col("node").alias("u"), F.col("degree").alias("du")), "u"
    ).join(deg.select(F.col("node").alias("v"), F.col("degree").alias("dv")), "v")
    lower = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    eo = ed.select(
        F.when(lower, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lower, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    ).localCheckpoint(eager=True)
    # eo was edges' last reader; release the internal pin now that both
    # derived frames are materialized
    free_local_checkpoint(edges)
    w1, w2 = eo.alias("w1"), eo.alias("w2")
    rank_lt = (F.col("w1.ddst") < F.col("w2.ddst")) | (
        (F.col("w1.ddst") == F.col("w2.ddst")) & (F.col("w1.dst") < F.col("w2.dst"))
    )
    wedges = w1.join(w2, (F.col("w1.src") == F.col("w2.src")) & rank_lt).select(
        F.col("w1.src").alias("x"), F.col("w1.dst").alias("y"), F.col("w2.dst").alias("z")
    )
    tri = wedges.join(
        eo.select(F.col("src").alias("y"), F.col("dst").alias("z")), ["y", "z"]
    )
    per_node = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    t = F.coalesce(F.col("triangles"), F.lit(0))
    return deg.join(per_node, "node", "left").select(
        "node",
        F.col("degree").cast("long").alias("degree"),
        t.cast("long").alias("triangles"),
        F.when(
            F.col("degree") >= 2,
            (2 * t).cast("double") / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering_coeff"),
    )
