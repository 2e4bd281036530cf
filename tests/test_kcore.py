"""k-core peeling vs a pure-Python reference decomposition."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from realestatedeals_spark.operators.kcore import core_numbers, k_core_nodes


def _py_core_numbers(edges: set[tuple[int, int]]) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core = {}
    k = 1
    while adj:
        changed = True
        while changed:
            weak = [n for n, nb in adj.items() if len(nb) < k]
            changed = bool(weak)
            for n in weak:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                core[n] = k - 1
        adj = {n: nb for n, nb in adj.items() if nb}
        k += 1
    return core


def _edge_df(spark, edges):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "a bigint, b bigint"
    )


def test_core_numbers_match_reference(spark):
    random.seed(13)
    edges = set()
    for _ in range(200):  # sparse noise
        a, b = random.randrange(60), random.randrange(60)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    clique = list(range(100, 108))  # planted 8-clique → coreness 7
    for i in clique:
        for j in clique:
            if i < j:
                edges.add((i, j))
    got = {r["node"]: r["coreness"] for r in core_numbers(_edge_df(spark, edges)).collect()}
    want = _py_core_numbers(edges)
    assert got == want
    assert all(got[i] == 7 for i in clique)


def test_k_core_nodes_planted_clique(spark):
    random.seed(4)
    edges = set()
    for _ in range(150):
        a, b = random.randrange(50), random.randrange(50)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    clique = list(range(200, 212))  # 12-clique survives 11-core
    for i in clique:
        for j in clique:
            if i < j:
                edges.add((i, j))
    nodes = {r["node"]: r["degree"] for r in k_core_nodes(_edge_df(spark, edges), 11).collect()}
    assert set(nodes) == set(clique)
    assert all(d == 11 for d in nodes.values())


def test_max_k_cap_reports_floor(spark):
    clique = [(i, j) for i in range(10) for j in range(10) if i < j]  # coreness 9
    got = {
        r["node"]: r["coreness"]
        for r in core_numbers(_edge_df(spark, clique), max_k=3).collect()
    }
    assert all(c == 3 for c in got.values())


def test_path_graph_peels_to_fixpoint(spark):
    # A path needs O(n) peel rounds at k=2 (one node falls off each end per
    # round); the old max_rounds=100 default silently returned an unconverged
    # subgraph for long paths. The 2-core of any path is empty.
    from realestatedeals_spark.operators.kcore import k_core

    path = [(i, i + 1) for i in range(40)]
    assert k_core(_edge_df(spark, path), 2).count() == 0


def test_max_rounds_exhaustion_raises(spark):
    import pytest

    from realestatedeals_spark.operators.kcore import k_core

    path = [(i, i + 1) for i in range(40)]
    with pytest.raises(RuntimeError, match="not converged"):
        k_core(_edge_df(spark, path), 2, max_rounds=3)


def test_fixture_graph_matches_reference(spark, sf_dir):
    # the registered g5 graph at sf0.001: operator vs pure-Python peel on
    # the identical edge set — the no-oracle query's correctness anchor.
    from realestatedeals_spark.io.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b"))
    )
    support = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("a", "b")
    )
    edges = {(r["a"], r["b"]) for r in support.collect()}
    want_core = _py_core_numbers(edges)
    for k in (2, 3):
        got = {r["node"] for r in k_core_nodes(support, k).collect()}
        want = {n for n, c in want_core.items() if c >= k}
        assert got == want, f"k={k}: {len(got)} vs {len(want)}"


def test_registered_histogram_matches_reference(spark, sf_dir):
    # the registered g5 output (capped coreness histogram) vs the Python
    # peel on the same edges, with the cap applied to the reference.
    from realestatedeals_spark.plans.graph import g5_kcore_parts

    li = load_table_edges(spark, sf_dir)
    want_core = _py_core_numbers(li)
    capped = {n: min(c, 4) for n, c in want_core.items()}
    want_hist = {}
    for c in capped.values():
        want_hist[c] = want_hist.get(c, 0) + 1
    got = {r["coreness"]: r["n_parts"] for r in g5_kcore_parts(spark, sf_dir).collect()}
    assert got == want_hist


def load_table_edges(spark, sf_dir):
    from realestatedeals_spark.io.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b"))
    )
    support = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("a", "b")
    )
    return {(r["a"], r["b"]) for r in support.collect()}
