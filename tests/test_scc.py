"""FW-BW SCC operator vs a pure-Python Kosaraju reference on random
digraphs, planted cycles, and degenerate shapes."""

from __future__ import annotations

import random

import pytest


def _kosaraju(edges: list[tuple[int, int]]) -> dict[int, int]:
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    fwd: dict[int, list[int]] = {n: [] for n in nodes}
    bwd: dict[int, list[int]] = {n: [] for n in nodes}
    for u, v in edges:
        fwd[u].append(v)
        bwd[v].append(u)
    seen, order = set(), []
    for s in nodes:
        if s in seen:
            continue
        stack = [(s, iter(fwd[s]))]
        seen.add(s)
        while stack:
            n, it = stack[-1]
            for m in it:
                if m not in seen:
                    seen.add(m)
                    stack.append((m, iter(fwd[m])))
                    break
            else:
                order.append(n)
                stack.pop()
    comp: dict[int, int] = {}
    for s in reversed(order):
        if s in comp:
            continue
        members = []
        stack = [s]
        while stack:
            n = stack.pop()
            if n in comp:
                continue
            comp[n] = -1
            members.append(n)
            stack.extend(m for m in bwd[n] if m not in comp)
        cid = min(members)
        for m in members:
            comp[m] = cid
    return comp


def _run(spark, edges):
    from realestatedeals_spark.operators.scc import scc_fwbw

    df = spark.createDataFrame(edges, "u long, v long")
    return {r["node"]: r["scc_id"] for r in scc_fwbw(df).collect()}


def test_planted_cycles_and_dag(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (5, 6)]
    got = _run(spark, edges)
    assert got == _kosaraju(edges)
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == got[5] == 4
    assert got[6] == 6


def test_random_digraphs_match_kosaraju(spark):
    rng = random.Random(17)
    for trial in range(3):
        n = 14 + trial * 4
        edges = sorted(
            {
                (rng.randrange(n), rng.randrange(n))
                for _ in range(int(n * 1.6))
            }
        )
        edges = [(u, v) for u, v in edges if u != v]
        if not edges:
            continue
        assert _run(spark, edges) == _kosaraju(edges), f"trial {trial}"


def test_single_cycle_and_two_node_swap(spark):
    ring = [(i, (i + 1) % 6) for i in range(6)]
    got = _run(spark, ring)
    assert set(got.values()) == {0} and len(got) == 6
    got2 = _run(spark, [(7, 9), (9, 7)])
    assert got2 == {7: 7, 9: 7}
