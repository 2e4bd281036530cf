"""Bucketed table diff / reconciliation (engine addition).

The anti-entropy primitive behind replicated-table reconciliation and
snapshot drift audits: find the keys whose rows differ between two
snapshots WITHOUT shuffling full rows of either table. Two-phase,
Merkle-tree-in-SQL:

1. **Bucket digest pass** — each side aggregates per bucket
   (``pmod(xxhash64(key), n_buckets)``) a commutative digest of its row
   hashes (sum AND xor of per-row 64-bit hashes — two independent
   accumulators make an accidental collision of BOTH astronomically
   unlikely). The shuffle carries n_buckets rows per side, not the table.
2. **Drill-down pass** — only buckets whose digests disagree re-scan: the
   per-row hashes of JUST those buckets full-outer join on key to emit
   (key, status ∈ added/removed/changed).

At 100 TB the digest pass is a near-free map-side aggregate over each scan
and the drill-down is proportional to the DIFF, not the data — the whole
point. With partition-level min/max stats (Delta/Iceberg manifests) phase 1
can skip unchanged files entirely; the DataFrame form here is the
storage-agnostic core. Row hashes use a canonical string encoding of the
compared columns so the same rows hash identically on both sides (and in
the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_encode(cols: list[str]) -> F.Column:
    # injective canonical encoding: null → "n"; value → "v<len>:<str>".
    # Length prefixes make field boundaries unambiguous — no delimiter a
    # value pair could straddle (('a\\x1fb','c') vs ('a','b\\x1fc') encode
    # differently here), unlike a plain separator join.
    parts = []
    for c in cols:
        s = F.col(c).cast("string")
        parts.append(
            F.when(s.isNull(), F.lit("n")).otherwise(
                F.concat(F.lit("v"), F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    return F.concat(*parts)


def _row_hash(cols: list[str]) -> F.Column:
    return F.xxhash64(_row_encode(cols))


def _row_hash2(cols: list[str]) -> F.Column:
    # independent second 64-bit hash (domain-separated input) — the
    # drill-down compares BOTH, mirroring the bucket pass's sum+xor double
    # accumulator, so a single 64-bit collision can't hide a changed row
    return F.xxhash64(F.concat(F.lit("\x02"), _row_encode(cols)))


def bucket_digests(df: DataFrame, key: str, cols: list[str], n_buckets: int = 1024) -> DataFrame:
    h = _row_hash([key, *cols])
    return (
        df.select(F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(n_buckets)).alias("bucket"), h.alias("h"))
        .groupBy("bucket")
        .agg(
            # decimal(38) accumulator: int64 row-hash sums overflow under
            # ANSI mode; decimal sums are exact and order-independent
            F.sum(F.col("h").cast("decimal(38,0)")).alias("hsum"),
            F.expr("bit_xor(h)").alias("hxor"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key: str,
    cols: list[str],
    n_buckets: int = 1024,
) -> DataFrame:
    """(key, status) for every key whose row differs: ``added`` (right
    only), ``removed`` (left only), ``changed`` (both, different cols)."""
    dl = bucket_digests(left, key, cols, n_buckets).select(
        "bucket", F.col("hsum").alias("lsum"), F.col("hxor").alias("lxor"), F.col("n").alias("ln")
    )
    dr = bucket_digests(right, key, cols, n_buckets).select(
        "bucket", F.col("hsum").alias("rsum"), F.col("hxor").alias("rxor"), F.col("n").alias("rn")
    )
    dirty = (
        dl.join(dr, "bucket", "full_outer")
        .filter(
            ~(
                F.col("lsum").eqNullSafe(F.col("rsum"))
                & F.col("lxor").eqNullSafe(F.col("rxor"))
                & F.col("ln").eqNullSafe(F.col("rn"))
            )
        )
        .select("bucket")
    )

    def keyed(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(key),
            F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(n_buckets)).alias("bucket"),
            _row_hash([key, *cols]).alias(f"{side}_h"),
            _row_hash2([key, *cols]).alias(f"{side}_h2"),
        ).join(dirty, "bucket", "left_semi")

    lk = keyed(left, "l")
    rk = keyed(right, "r")
    j = lk.drop("bucket").join(rk.drop("bucket"), key, "full_outer")
    return j.select(
        key,
        F.when(F.col("l_h").isNull(), F.lit("added"))
        .when(F.col("r_h").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    ).filter(
        ~(
            F.col("l_h").eqNullSafe(F.col("r_h"))
            & F.col("l_h2").eqNullSafe(F.col("r_h2"))
        )
    )
