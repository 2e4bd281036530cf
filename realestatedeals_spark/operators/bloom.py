"""Broadcast Bloom-filter membership pruning.

The 100 TB decontamination problem: the corpus side of the eval-overlap join
is corpus-proportional (every shingle of every document), so the equi-join
against the eval shingle set shuffles the full corpus shingle stream even
though only a tiny fraction matches. A Bloom filter of the eval set,
broadcast to every executor, prunes non-matching shingles BEFORE the
shuffle: at fpp=1% the join input drops to (true matches + 1% of the rest),
i.e. ~99% less shuffle I/O, while a downstream exact join keeps the final
semantics exact (false positives are re-checked, false negatives don't
exist).

Spark's built-in runtime row-group bloom pushdown
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) covers the same idea for
scan-side joins; this operator makes the technique available to arbitrary
plan points (here: between shingle explosion and the shuffle join) where the
optimizer's injection rule does not reach.

Everything is vectorized numpy over Arrow batches — the filter build
collects only DISTINCT BIT POSITIONS (bounded by ``n_bits``, independent of
corpus size) and the broadcast payload is ``n_bits/8`` bytes.

No counterpart in the reference (single-node, no shuffles to prune); the
operator exists for the engine's own X8 pipeline (SURVEY.md §2b).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SALT = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized on uint64 arrays (wrapping mults)."""
    z = x.astype(np.uint64, copy=True)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def _positions(values: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(n, k) bloom bit positions via double hashing h1 + i*h2 (Kirsch-
    Mitzenmacher: k independent-enough probes from two mixes)."""
    v = values.astype(np.uint64)
    h1 = _mix64(v)
    h2 = _mix64(v ^ _SALT) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(n_bits)).astype(np.int64)


def sizing(expected_items: int, fpp: float) -> tuple[int, int]:
    """Standard bloom sizing: bits m = -n ln p / (ln 2)^2, probes
    k = (m/n) ln 2. Returns (n_bits rounded up to a byte, k >= 1)."""
    n = max(expected_items, 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 7) & ~7
    k = max(1, round(m / n * math.log(2)))
    return m, k


def build_bloom(
    df: DataFrame, col: str, n_bits: int, k: int
) -> bytes:
    """Build the packed bitmap for a long-valued column, distributed.

    Executors emit bit positions; the driver collects only the DISTINCT
    positions (<= n_bits of them — bounded by filter geometry, NOT by
    ``df``'s row count) and packs them. The heavy dedup of positions happens
    in the cluster's shuffle, not on the driver.
    """

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def pos_udf(vals: pd.Series) -> pd.Series:
        p = _positions(vals.to_numpy(dtype=np.int64), n_bits, k)
        return pd.Series(list(p))

    rows = (
        df.select(F.explode(pos_udf(F.col(col).cast("long"))).alias("pos"))
        .distinct()
        .collect()
    )
    bits = np.zeros(n_bits, dtype=bool)
    bits[np.fromiter((r.pos for r in rows), dtype=np.int64, count=len(rows))] = True
    return np.packbits(bits, bitorder="little").tobytes()


def might_contain(
    spark: SparkSession, packed: bytes, n_bits: int, k: int, col: Column
) -> Column:
    """Boolean column: bloom membership test for a long column against a
    broadcast bitmap. One numpy gather per Arrow batch, no Python loops."""
    bc = spark.sparkContext.broadcast(packed)

    @F.pandas_udf(T.BooleanType())
    def test_udf(vals: pd.Series) -> pd.Series:
        bitmap = np.frombuffer(bc.value, dtype=np.uint8)
        p = _positions(vals.to_numpy(dtype=np.int64), n_bits, k)
        hit = (bitmap[p >> 3] >> (p & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1).astype(bool))

    return test_udf(col.cast("long"))
