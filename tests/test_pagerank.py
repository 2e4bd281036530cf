"""PageRank vs a numpy power-iteration reference."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from realestatedeals_spark.operators.pagerank import pagerank


def _reference(edge_list, iters=10, d=0.85):
    nodes = sorted({a for a, _ in edge_list} | {b for _, b in edge_list})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for a, _ in edge_list:
        out_deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = np.zeros(n)
        for a, b in edge_list:
            inflow[idx[b]] += r[idx[a]] / out_deg[idx[a]]
        dangling = r[out_deg == 0].sum()
        r = (1 - d) / n + d * (inflow + dangling / n)
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_matches_numpy(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
        ("e", "f"),  # f dangling
    ]
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(edf, iters=12).collect()}
    expect = _reference(edges, iters=12)
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-9, k
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_on_fixture_graph(spark, sf_dir):
    from realestatedeals_spark.io.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    edge_list = [(r.src, r.dst) for r in edges.collect()]
    got = {r.node: r.rank for r in pagerank(edges, iters=6).collect()}
    expect = _reference(edge_list, iters=6)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    worst = max(abs(got[k] - expect[k]) for k in expect)
    assert worst < 1e-9, worst
    # suppliers soak up rank from customers (all customer mass flows to them)
    top = max(got, key=got.get)
    assert top.startswith("s:")
