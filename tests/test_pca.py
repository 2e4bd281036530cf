"""Deterministic-PCA tests: exact pandas parity, partition invariance,
and variance ordering on planted anisotropic data."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from realestatedeals_spark.operators.pca import (
    exact_gram,
    power_components,
    project,
)

SF_DIR = "/root/testdata/sf0.001"


def _pandas_reference(path: str, k: int = 4, iters: int = 60):
    pdf = pd.read_parquet(f"{path}/embeddings.parquet")
    E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    dim = E.shape[1]
    G = np.floor(E[:, :, None] * E[:, None, :] * 1e6).astype(np.int64).sum(axis=0)
    n = len(E)
    Gf = G.astype(np.float64) / 1e6 / n
    comps, eigvals = [], []
    for _ in range(k):
        v = np.full(dim, 1.0 / np.sqrt(dim))
        for _ in range(iters):
            v = (Gf * v).sum(axis=1)
            for prev in comps:
                v = v - (v * prev).sum() * prev
            v = v / np.sqrt((v * v).sum())
        eigvals.append(float((v * (Gf * v).sum(axis=1)).sum()))
        comps.append(v)
    # projections: identical left fold per row
    projs = {}
    for vid, e in zip(pdf["vec_id"], E):
        row = []
        for v in comps:
            acc = 0.0
            for d in range(dim):
                acc = acc + float(e[d]) * v[d]
            row.append(int(np.floor(acc * 1e6)))
        projs[int(vid)] = tuple(row)
    return np.stack(comps), eigvals, G, n, projs


@pytest.fixture(scope="module")
def trained(spark):
    from realestatedeals_spark.io.sources import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    G, n = exact_gram(emb, dim=64)
    comps, eigvals = power_components(G, n, k=4, iters=60)
    return emb, G, n, comps, eigvals


def test_gram_and_components_match_pandas_exactly(trained):
    _, G, n, comps, eigvals = trained
    comps_ref, eig_ref, G_ref, n_ref, _ = _pandas_reference(SF_DIR)
    assert n == n_ref
    assert np.array_equal(G, G_ref)  # integer Gram: exact
    assert comps.tolist() == comps_ref.tolist()  # doubles: bit-exact
    assert eigvals == eig_ref


def test_projections_match_pandas_exactly(trained):
    emb, _, _, comps, _ = trained
    got = {
        r["vec_id"]: (r["p1"], r["p2"], r["p3"], r["p4"])
        for r in project(emb, comps).collect()
    }
    _, _, _, _, projs = _pandas_reference(SF_DIR)
    assert got == projs


def test_gram_is_partition_invariant(trained):
    emb, G, n, _, _ = trained
    G17, n17 = exact_gram(emb.repartition(17), dim=64)
    G1, n1 = exact_gram(emb.coalesce(1), dim=64)
    assert np.array_equal(G, G17) and np.array_equal(G, G1)
    assert n == n17 == n1


def test_components_capture_planted_anisotropy(spark):
    """On data stretched 10x along a planted direction, the first
    component must align with it (|cos| > 0.95) and the eigenvalue
    spectrum must be decreasing."""
    rng = np.random.RandomState(5)
    d = 64
    axis = rng.randn(d)
    axis /= np.linalg.norm(axis)
    E = rng.randn(3000, d) * 0.3 + np.outer(rng.randn(3000) * 3.0, axis)
    pdf = pd.DataFrame(
        {"vec_id": range(3000), "embedding": [r.astype(np.float32) for r in E],
         "label": [0] * 3000}
    )
    emb = spark.createDataFrame(pdf)
    G, n = exact_gram(emb, dim=d)
    comps, eigvals = power_components(G, n, k=3, iters=60)
    assert abs(float(np.dot(comps[0], axis))) > 0.95
    assert eigvals[0] > eigvals[1] > eigvals[2] > 0
