"""Deterministic k-means tests: empty-cluster handling, tie-breaking,
partition invariance, and exact Python (arbitrary-precision) parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from realestatedeals_spark.plans.llm_vectors import (
    _KM_DIM,
    _KM_ITERS,
    _KM_K,
    x3_kmeans_assign,
)


def _python_reference(pdf: pd.DataFrame) -> dict[int, tuple[int, int]]:
    """Pure-Python Lloyd replay with exact ints (mirrors the SQL oracle)."""
    vecs = {
        int(r.vec_id): [int(np.floor(float(x) * 1e6)) for x in r.embedding]
        for r in pdf.itertuples()
    }
    cents = [list(vecs[i]) for i in range(_KM_K)]
    out: dict[int, tuple[int, int]] = {}
    for t in range(_KM_ITERS):
        out = {}
        for vid, v in vecs.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(v, c)), cid)
                for cid, c in enumerate(cents)
            )
            out[vid] = (best[1], best[0])
        if t < _KM_ITERS - 1:
            sums = {cid: [0] * _KM_DIM for cid in range(_KM_K)}
            counts = {cid: 0 for cid in range(_KM_K)}
            for vid, (cid, _) in out.items():
                counts[cid] += 1
                for i, x in enumerate(vecs[vid]):
                    sums[cid][i] += x
            cents = [
                [s // counts[cid] for s in sums[cid]] if counts[cid] else list(cents[cid])
                for cid, _ in enumerate(cents)
            ]
    return out


def _write_embeddings(tmp_path, rows):
    pdf = pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [np.array(r[1], dtype=np.float32) for r in rows],
            "label": [0] * len(rows),
        }
    )
    pdf.to_parquet(tmp_path / "embeddings.parquet", index=False)
    return str(tmp_path)


def test_kmeans_matches_exact_python_reference(spark, sf_dir):
    got = {
        int(r["vec_id"]): (int(r["cluster"]), int(r["dist_sq"]))
        for r in x3_kmeans_assign(spark, sf_dir).collect()
    }
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    want = _python_reference(pdf)
    assert got == want


def test_kmeans_empty_cluster_keeps_previous_centroid(spark, tmp_path):
    # vec 0 and vec 1 are identical -> both assign to cluster 0 on the
    # first pass (lower-id tie-break), so cluster 1 is empty at the first
    # update and must keep its init centroid; the far-away block stays on
    # cluster 7's side of the space.
    rng = np.random.RandomState(7)
    rows = []
    base = rng.uniform(-1, 1, _KM_DIM)
    rows.append((0, base))
    rows.append((1, base.copy()))  # exact duplicate of vec 0
    for vid in range(2, _KM_K):
        rows.append((vid, rng.uniform(-1, 1, _KM_DIM)))
    for vid in range(_KM_K, 40):
        rows.append((vid, rng.uniform(-1, 1, _KM_DIM) + 10.0))
    sf = _write_embeddings(tmp_path, rows)

    got = {
        int(r["vec_id"]): (int(r["cluster"]), int(r["dist_sq"]))
        for r in x3_kmeans_assign(spark, sf).collect()
    }
    pdf = pd.read_parquet(f"{sf}/embeddings.parquet")
    want = _python_reference(pdf)
    assert got == want
    # the duplicate pair stays together at distance 0 in every pass; after
    # the first update, empty cluster 1 keeps its init centroid (== the
    # duplicate vector exactly) while cluster 0's mean drifts, so the pair
    # re-assigns to the kept centroid — proving the empty-cluster branch.
    assert got[0] == got[1] and got[0][1] == 0
    assert got[0][0] == 1


def test_kmeans_partition_invariant(spark, sf_dir):
    from realestatedeals_spark.io.sources import load_table

    base = {
        (int(r["vec_id"]), int(r["cluster"]), int(r["dist_sq"]))
        for r in x3_kmeans_assign(spark, sf_dir).collect()
    }
    # same query, different parallelism of the source scan
    n = load_table(spark, sf_dir, "embeddings").rdd.getNumPartitions()
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    try:
        other = {
            (int(r["vec_id"]), int(r["cluster"]), int(r["dist_sq"]))
            for r in x3_kmeans_assign(spark, sf_dir).collect()
        }
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
    assert base == other
    assert n >= 1
