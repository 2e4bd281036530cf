"""Triangle counting: hand-computed small graphs + degree-oriented result
must equal a brute-force all-triples reference on a random graph."""

from __future__ import annotations

import itertools
import random

from realestatedeals_spark.operators.triangles import node_triangles, undirected_edges


def _run(spark, edges):
    df = spark.createDataFrame(edges, ["a", "b"])
    out = node_triangles(undirected_edges(df, "a", "b"))
    return {r["node"]: (r["degree"], r["triangles"], r["clustering_coeff"]) for r in out.collect()}


def test_triangles_hand_graph(spark):
    # K4 on {1,2,3,4} plus a pendant 5-1: every K4 node is in C(3,2)=3
    # triangles; the pendant is in none.
    k4 = list(itertools.combinations([1, 2, 3, 4], 2))
    got = _run(spark, k4 + [(5, 1)])
    for n in (2, 3, 4):
        assert got[n] == (3, 3, 1.0)
    deg, tri, cc = got[1]
    assert (deg, tri) == (4, 3) and abs(cc - 0.5) < 1e-12  # 2*3/(4*3)
    assert got[5] == (1, 0, 0.0)


def test_triangles_direction_and_duplicates_ignored(spark):
    # duplicate pairs, reversed pairs and self-loops must not change counts
    noisy = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (1, 2)]
    got = _run(spark, noisy)
    assert got == {1: (2, 1, 1.0), 2: (2, 1, 1.0), 3: (2, 1, 1.0)}


def test_triangles_random_graph_vs_bruteforce(spark):
    rng = random.Random(11)
    edges = {tuple(sorted((rng.randrange(30), rng.randrange(30)))) for _ in range(120)}
    edges = [(a, b) for a, b in edges if a != b]
    adj = {n: set() for e in edges for n in e}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want_tri = {n: 0 for n in adj}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                want_tri[n] += 1
    got = _run(spark, edges)
    assert set(got) == set(adj)
    for n in adj:
        deg, tri, cc = got[n]
        assert deg == len(adj[n])
        assert tri == want_tri[n], (n, tri, want_tri[n])
        want_cc = 2 * want_tri[n] / (deg * (deg - 1)) if deg >= 2 else 0.0
        assert abs(cc - want_cc) < 1e-12
