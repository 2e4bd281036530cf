"""Vector similarity search (SURVEY.md §2b X3).

Brute-force cosine top-k is the exactness baseline (plans/llm_vectors.py);
this module adds the scale paths:

- ``cosine_pairs``      — all-pairs above a threshold (embedding near-dup)
- ``rp_lsh_topk``       — random-hyperplane LSH bucketing + exact re-rank:
                          the candidate set shrinks from N to the probed
                          buckets; recall is tunable via n_planes/n_probe.

Hyperplanes are generated from a fixed seed on the driver and broadcast as
literals, so results are deterministic across runs and partitionings.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def cosine_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup dedup).

    Brute force O(N²) — correct baseline for oracle checks; at scale use
    ``rp_lsh_topk``-style bucketing first.
    """
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def rp_bucket(vec: F.Column, planes: list[list[float]]) -> F.Column:
    """Sign pattern of the vector against each hyperplane → one long key."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(w) for w in plane]),
                    lambda x, wcol: x.cast("double") * wcol,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def rp_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    probe_bits: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing the query's RP bucket
    OR any bucket within ``probe_bits`` bit flips (multi-probe LSH), then
    exact cosine re-rank within candidates.

    Recall/candidate tradeoff: for a neighbor at angle θ the per-plane
    agreement is p = 1 − θ/π; recall ≈ P(Binom(n_planes, 1−p) ≤ probe_bits).
    High-similarity neighbors (cos ≥ 0.9) are found w.p. ≳0.95 at the
    defaults; at scale, raise n_planes so buckets stay small and add probes
    to buy recall back.

    Output: query_id, neighbor_id, rk, cosine — same shape as the
    brute-force baseline so recall can be measured against it.
    """
    from itertools import combinations

    planes = _hyperplanes(dim, n_planes, seed)
    base = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vn"),
        rp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("vq"),
        rp_bucket(F.col(vec_col), planes).alias("qbucket"),
    )
    # multi-probe: query bucket + all buckets within probe_bits flips
    masks = [0]
    for nbits in range(1, probe_bits + 1):
        for idxs in combinations(range(n_planes), nbits):
            masks.append(sum(1 << i for i in idxs))
    probes = qb.select(
        "query_id",
        "vq",
        F.explode(
            F.array(*[F.col("qbucket").bitwiseXOR(F.lit(m).cast("long")) for m in masks])
        ).alias("bucket"),
    )
    cand = probes.join(base, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id", "neighbor_id", cosine(F.col("vq"), F.col("vn")).alias("cosine")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk", F.round("cosine", 6).alias("cosine"))
    )
