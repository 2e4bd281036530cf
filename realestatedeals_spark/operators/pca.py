"""Deterministic PCA for embedding columns — the whitening/dimension-
reduction step an ANN index pipeline runs before quantization (PQ/IVF
train better on decorrelated axes), trained IN-ENGINE with the same
bit-determinism contract as operators/classifier.py:

- The Gram matrix accumulates per-row integer contributions
  floor(e_i·e_j·1e6) (one Arrow pass, one int64[d·d] partial per batch;
  integer addition is order-independent, so the Gram is EXACTLY the same
  under any partitioning — no float matmul partials whose merge order
  would drift).
- Power iteration with Gram-Schmidt deflation runs on the driver over the
  tiny d×d matrix with a fixed element order: the matvec is
  ``(G * v).sum(axis=1)`` (numpy pairwise summation over a fixed shape —
  deterministic, and deliberately NOT BLAS, whose threaded dot products
  reorder sums), fixed init 1/√d, fixed iteration count.
- Projections fold left over the component vector per row, micros-floored.

At 100 TB: one scan produces ⌈batches⌉ Gram partials of d² longs each
(d=64 → 32 KiB); everything after is O(d²) driver work. Scoring is a
per-row expression. tests/test_pca.py pins exact == parity against an
independent pandas implementation, partition invariance, and the
variance-ordering property on planted anisotropic data.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_gram(emb: DataFrame, col: str = "embedding", dim: int = 64) -> tuple[np.ndarray, int]:
    """(int64 d×d Gram of floor(e_i·e_j·1e6) row contributions, n_rows)."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            acc = np.zeros((dim, dim), dtype=np.int64)
            rows = pdf[col].to_numpy()
            for lo in range(0, len(rows), 1024):
                E = np.stack(rows[lo : lo + 1024]).astype(np.float64)
                acc += np.floor(E[:, :, None] * E[:, None, :] * 1e6).astype(np.int64).sum(axis=0)
            yield pd.DataFrame({"g": [acc.reshape(-1)], "n": [len(pdf)]})

    out = emb.select(col).mapInPandas(
        partials, schema=f"g array<long>, n long"
    ).collect()
    G = np.zeros(dim * dim, dtype=np.int64)
    n = 0
    for r in out:
        G += np.array(r["g"], dtype=np.int64)
        n += r["n"]
    return G.reshape(dim, dim), n


def _matvec(G: np.ndarray, v: np.ndarray) -> np.ndarray:
    # fixed-shape pairwise summation; NOT BLAS (threaded dot reorders sums)
    return (G * v).sum(axis=1)


def power_components(
    G_int: np.ndarray, n: int, k: int = 4, iters: int = 60
) -> tuple[np.ndarray, list[float]]:
    """Top-k eigenvectors of the covariance-like matrix G/1e6/n by power
    iteration + Gram-Schmidt deflation; fixed init, fixed iteration count,
    fixed op order — bit-deterministic. Returns (k×d components, eigvals)."""
    dim = G_int.shape[0]
    G = G_int.astype(np.float64) / 1e6 / n
    comps: list[np.ndarray] = []
    eigvals: list[float] = []
    for _ in range(k):
        v = np.full(dim, 1.0 / np.sqrt(dim))
        for _ in range(iters):
            v = _matvec(G, v)
            for prev in comps:
                v = v - (v * prev).sum() * prev
            v = v / np.sqrt((v * v).sum())
        eigvals.append(float((v * _matvec(G, v)).sum()))
        comps.append(v)
    return np.stack(comps), eigvals


def project(emb: DataFrame, comps: np.ndarray, col: str = "embedding") -> DataFrame:
    """Per-row projections onto the components, micros-floored: proj_k =
    floor(1e6 · Σ_d v_kd·e_d) with a LEFT fold (the fold order is part of
    the contract, as everywhere in this repo)."""
    cols: list[Column] = [F.col("vec_id")]
    for kidx in range(comps.shape[0]):
        vk = F.array(*[F.lit(float(x)) for x in comps[kidx]])
        dot = F.aggregate(
            F.zip_with(F.col(col), vk, lambda e, w: e.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(F.floor(dot * F.lit(1e6)).cast("long").alias(f"p{kidx + 1}"))
    return emb.select(*cols)
