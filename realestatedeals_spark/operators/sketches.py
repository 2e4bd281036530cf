"""Frequency-sketch operators: exact heavy hitters via candidate pruning.

The 100 TB design point: a naive ``groupBy(term).count()`` shuffles every
token (at 100 TB of text that is the whole corpus through the exchange).
Heavy hitters only need the terms whose global share exceeds ``1/k``, so we
run the classic two-pass scheme:

1. **Candidate pass** — an Arrow-batched Misra-Gries-style summary per batch
   (`mapInPandas`): within each batch the exact ``value_counts`` is available
   in memory, and any term whose *global* frequency exceeds ``n/(capacity+1)``
   must exceed ``n_b/(capacity+1)`` in at least one batch (otherwise summing
   the per-batch bounds gives ``freq ≤ Σ n_b/(capacity+1) = n/(capacity+1)``,
   a contradiction). Emitting the per-batch over-threshold terms therefore
   yields a **superset** of every global heavy hitter, with fewer than
   ``capacity+1`` survivors per batch — a tiny, bounded candidate set.
2. **Verify pass** — exact recount of candidates only: a broadcast semi-join
   keeps the shuffle proportional to candidate occurrences, never the corpus.

With ``capacity ≥ k`` the candidate superset is guaranteed, so the output is
*exact* (hash-matches the brute-force SQL oracle) while the full-token
shuffle of the naive plan is gone.

Reference parity: the reference has no sketches (its "profiling" is print
statements, e.g. /root/reference/main.py:30,52); this is a §2b X6 extension.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitter_candidates(tokens: DataFrame, col: str, capacity: int) -> DataFrame:
    """Trimmed Misra-Gries summary per Arrow batch, ONE scan of ``tokens``:
    the batch's top-``capacity`` terms weighted ``count − d`` where ``d`` is
    the (capacity+1)-th largest in-batch count (the MG decrement — the top
    capacity+1 counts each ≥ d sum to ≤ n_b, so d ≤ n_b/(capacity+1) and the
    per-batch undercount of ANY term is ≤ n_b/(capacity+1)), plus one
    null-term sentinel row carrying the batch's token count so the global
    total rides along instead of costing a second scan.

    MG summaries are MERGEABLE (Agarwal et al., Mergeable Summaries, PODS'12):
    pointwise-adding the weights keeps the total undercount ≤ Σ n_b/(cap+1)
    = n/(capacity+1) — which is what lets the second level bound the global
    candidate set (see ``heavy_hitter_candidate_set``)."""

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vc = pdf[col].value_counts()  # descending
            d = int(vc.iloc[capacity]) if len(vc) > capacity else 0
            trimmed = vc.iloc[:capacity] - d
            trimmed = trimmed[trimmed > 0]
            yield pd.DataFrame(
                {
                    col: list(trimmed.index.astype(str)) + [None],
                    "w": list(trimmed.astype("int64")) + [len(pdf)],
                }
            )

    return tokens.mapInPandas(mg, schema=f"{col} string, w long")


def heavy_hitter_candidate_set(summary: DataFrame, col: str, capacity: int) -> DataFrame:
    """Second-level Misra-Gries merge: sum the per-batch weights (map-side
    partial agg — the shuffle carries ≤ capacity+1 rows per batch, never
    tokens) and keep terms whose merged weight exceeds n/(capacity+1).

    GLOBALLY BOUNDED: merged weights sum to ≤ n, so fewer than capacity+1
    terms can pass the filter — the candidate broadcast is ≤ ~capacity rows
    REGARDLESS of batch count (an adversarially bursty distribution used to
    grow it linearly with batches). SUPERSET-SAFE: a term with global
    frequency f > n/k (capacity = 2k) has merged weight ≥ f − n/(cap+1)
    > n/k − n/(2k+1) = n(k+1)/(k(2k+1)) > n/(2k+1), so it always passes."""
    total = summary.filter(F.col(col).isNull()).agg(F.sum("w").alias("n"))
    merged = summary.filter(F.col(col).isNotNull()).groupBy(col).agg(F.sum("w").alias("mw"))
    return (
        merged.crossJoin(F.broadcast(total))
        .filter(F.col("mw") * (capacity + 1) > F.col("n"))
        .select(col)
    )


def heavy_hitters(tokens: DataFrame, col: str = "term", k: int = 100) -> DataFrame:
    """Exact terms with global frequency > n/k, without a full-token shuffle.

    Exactly TWO scans of ``tokens``, both with bounded shuffles: the summary
    pass emits ≤ capacity+1 rows per batch (trimmed MG summary + the
    batch-count sentinel, materialized once — consumed by the candidate set
    AND the global total), the second-level MG merge bounds the candidate
    broadcast at ~capacity terms regardless of batch count, and the verify
    pass shuffles only candidate occurrences. ``capacity = 2k`` keeps the
    superset guarantee with slack. Output: (col, cnt) exact —
    oracle-comparable.
    """
    capacity = 2 * k
    # eager=False: the checkpoint materializes inside the first consuming job
    # instead of an upfront serial job (measured ~8% faster at sf0.1; the
    # round-3 "3.3x regression" did not reproduce — best-of-3 at sf0.1 is
    # 0.66s current vs 0.76s round 2).
    summary = heavy_hitter_candidates(tokens, col, capacity).localCheckpoint(eager=False)
    candidates = heavy_hitter_candidate_set(summary, col, capacity)
    total = summary.filter(F.col(col).isNull()).agg(F.sum("w").alias("n"))
    counts = (
        tokens.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("n"))
        .select(col, "cnt")
    )


def cms_table(tokens: DataFrame, col: str, depth: int = 4, width: int = 2048) -> DataFrame:
    """Count-Min sketch as a (row, bucket, cnt) DataFrame — depth×width
    counters, built in ONE scan with a bounded shuffle (≤ depth·width rows
    survive the map-side partial agg per task, regardless of corpus size).

    The groupBy IS the sketch merge: per-partition partial counts are CMS
    cells, and summing cells is exactly how CMS composes (Cormode &
    Muthukrishnan '05) — so per-day/per-shard sketches union by plain
    groupBy-sum, same as the HLL/MG members of the X6 family. Bucket hashes
    are xxhash64(term, seed=row), the same JVM-side hash family used
    engine-wide."""
    rows = F.sequence(F.lit(0), F.lit(depth - 1))
    return (
        tokens.select(F.col(col).alias("t"), F.explode(rows).alias("row"))
        .select("row", F.pmod(F.xxhash64("t", "row"), F.lit(width)).alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, terms: DataFrame, col: str, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Point-query the sketch for each term: min over the depth rows.
    ``terms`` is expected bounded (e.g. MG candidates) and is exploded to
    its depth·|terms| probe cells, equi-joined against the sketch (the
    sketch side is depth·width rows — broadcastable at any corpus size)."""
    rows = F.sequence(F.lit(0), F.lit(depth - 1))
    probes = terms.select(
        F.col(col), F.explode(rows).alias("row")
    ).withColumn("bucket", F.pmod(F.xxhash64(F.col(col), "row"), F.lit(width)))
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"])
        .groupBy(col)
        .agg(F.min("cnt").alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# KMV / theta sketch: distinct-count SET OPERATIONS (union, intersection,
# difference) — what HLL cannot do without lossy inclusion-exclusion at
# merge depth. The k-minimum-values construction (Bar-Yossef et al.; the
# Apache DataSketches theta family) keeps the k smallest uniform hashes of
# each set; set algebra happens on the sketches. Everything below is
# DETERMINISTIC given the hash function (md5 prefix), so unlike a seeded
# random sketch the whole estimator carries an exact SQL oracle: DuckDB
# replays the identical hashes, k-selection, and estimate arithmetic.
#
# 100 TB shape: per set, ONE shuffle (rank within tag, keep rn <= k) — the
# retained state per set is k doubles; merges are array ops on k-length
# arrays, so a 10,000-partition corpus reduces to per-tag rows of 64
# doubles regardless of corpus size.
# ---------------------------------------------------------------------------

KMV_K = 64
_KMV_SCALE = 281474976710656.0  # 2^48 — 12 hex chars, exact in a double


def kmv_hash(col) -> F.Column:
    """Uniform hash in (0, 1]: 48-bit md5 prefix, bit-identical in Spark
    (conv) and DuckDB ('0x'||…::BIGINT) and exact as a double."""
    return (
        F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long").cast("double")
        + F.lit(1.0)
    ) / F.lit(_KMV_SCALE)


def kmv_sketch(df: DataFrame, tag_col, value_col: str, k: int = KMV_K) -> DataFrame:
    """Per-tag KMV sketch: sorted array of the k smallest DISTINCT value
    hashes plus the retained count. ``tag_col`` may be any Column
    expression.

    Scale shape: a plain ``row_number over (partition by tag)`` would
    funnel each tag's ENTIRE hash set through one task — the classic
    single-reducer sort bottleneck at 100 TB. Instead the k smallest
    reduce in two bounded stages: partition-local top-k per (tag,
    partition) via the rank window (each group holds one partition's
    share), then a final per-tag merge over the ≤ partitions·k
    survivors. The k smallest of the union ARE the k smallest of the
    per-partition k-smallest sets, so the result is identical — only the
    shuffle shape changes (no task ever sees more than its own slice +
    survivors)."""
    from pyspark.sql import Window as W

    h = (
        df.select(tag_col.alias("tag") if not isinstance(tag_col, str) else F.col(tag_col).alias("tag"),
                  kmv_hash(F.col(value_col)).alias("u"))
        .distinct()
    )
    local = h.withColumn("part", F.spark_partition_id())
    rn_local = F.row_number().over(W.partitionBy("tag", "part").orderBy("u"))
    survivors = local.withColumn("rn", rn_local).filter(F.col("rn") <= k).drop("rn", "part")
    rn = F.row_number().over(W.partitionBy("tag").orderBy("u"))
    return (
        survivors.withColumn("rn", rn)
        .filter(F.col("rn") <= k)
        .groupBy("tag")
        .agg(F.array_sort(F.collect_list("u")).alias("mins"),
             F.count(F.lit(1)).alias("cnt"))
    )


def kmv_estimate(mins, cnt, k: int = KMV_K) -> F.Column:
    """(k-1)/u_k when the sketch is full, exact count otherwise."""
    return F.when(cnt < k, cnt.cast("double")).otherwise(
        F.lit(float(k - 1)) / F.element_at(mins, k)
    )


def kmv_theta(mins, cnt, k: int = KMV_K) -> F.Column:
    """Sampling threshold θ: the k-th smallest hash, or 1 when not full."""
    return F.when(cnt < k, F.lit(1.0)).otherwise(F.element_at(mins, k))


def kmv_merge(mins_a, mins_b, k: int = KMV_K) -> F.Column:
    """Union sketch: k smallest of the deduplicated hash union. Exactly
    equals the sketch built directly from A ∪ B (same hash set), which
    tests/test_sketches.py pins — lossless mergeability."""
    return F.slice(F.array_sort(F.array_union(mins_a, mins_b)), 1, k)


def kmv_intersect_estimate(mins_a, cnt_a, mins_b, cnt_b, k: int = KMV_K) -> F.Column:
    """Theta intersection: |common hashes below θ_min| / θ_min."""
    theta = F.least(kmv_theta(mins_a, cnt_a, k), kmv_theta(mins_b, cnt_b, k))
    common = F.size(F.filter(F.array_intersect(mins_a, mins_b), lambda x: x < theta))
    return common.cast("double") / theta


# ---------------------------------------------------------------------------
# Engine-portable sketch companions (round 9). HLL registers and CMS cells
# are DETERMINISTIC given the hash function — only the hash primitive makes
# them un-oracle-able (Spark's HLL++ binary / xxhash64 have no DuckDB
# equivalent). These variants swap in arithmetic hashes both engines compute
# bit-for-bit (the KMV md5-prefix trick above, and an affine family over the
# polynomial fingerprint), so the *distributed sketch machinery* — register
# max-merge, cell count-merge, min-over-rows point queries — carries an
# exact value-hash oracle. The production xxhash/HLL++ variants stay the
# primary paths (better mixing, native speed); tests pin those within error
# bounds, the oracle pins these exactly.
# ---------------------------------------------------------------------------

HLL_ARITH_BUCKETS = 256  # b=8 bucket bits out of the 48-bit md5 prefix
_HLL_ARITH_VALUE_BITS = 40  # 48 - 8; rho ∈ [1, 41]


def hll_arith_registers(df: DataFrame, tag_col: str, value_col: str) -> DataFrame:
    """Per-tag HLL register state (tag, bucket, register) over DISTINCT
    hashed values: bucket = low 8 bits of the 48-bit md5-prefix hash,
    register = max over values of (leading-zeros-of-remaining-40-bits + 1).
    bit-length comes from length(bin(r)) — exact integer in both engines.
    Empty buckets are implicit (register 0). The state is the mergeable
    sketch: union of tags = elementwise max of registers (plain groupBy),
    which is how a 100 TB corpus rolls partition sketches into any rollup
    without re-scanning."""
    h = F.conv(F.substring(F.md5(F.col(value_col)), 1, 12), 16, 10).cast("long")
    r = F.shiftright(h, 8)
    rho = F.when(r == 0, F.lit(_HLL_ARITH_VALUE_BITS + 1)).otherwise(
        F.lit(_HLL_ARITH_VALUE_BITS + 1) - F.length(F.bin(r))
    )
    return (
        df.select(
            F.col(tag_col).alias("tag"),
            F.pmod(h, F.lit(HLL_ARITH_BUCKETS)).cast("int").alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("tag", "bucket")
        .agg(F.max("rho").alias("register"))
    )


# Affine CMS hash family over the polynomial fingerprint: bucket_row =
# ((A_row·fp + B_row) mod 1e9+7) mod width. fp < 1e9+7 and A ≤ 65537 keep
# every intermediate < 2^47 — exact int64 in both engines.
CMS_ARITH_A = (31, 131, 257, 65537)
CMS_ARITH_B = (7, 11, 13, 17)
CMS_ARITH_MOD = 1_000_000_007


def _poly_fingerprint(col: F.Column) -> F.Column:
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % CMS_ARITH_MOD,
    )


def _cms_arith_buckets(fp: F.Column, width: int) -> F.Column:
    return F.array(
        *[
            ((F.lit(a).cast("long") * fp + F.lit(b)) % CMS_ARITH_MOD % width).cast("int")
            for a, b in zip(CMS_ARITH_A, CMS_ARITH_B)
        ]
    )


def cms_arith_table(tokens: DataFrame, col: str, width: int = 2048) -> DataFrame:
    """Count-Min sketch (row, bucket, cnt) with the arithmetic hash family —
    same one-scan bounded-shuffle build shape as cms_table (map-side partial
    agg caps surviving rows at depth·width per task)."""
    fp = _poly_fingerprint(F.col(col))
    return (
        tokens.select(F.posexplode(_cms_arith_buckets(fp, width)).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_arith_estimate(
    cms: DataFrame, terms: DataFrame, col: str, width: int = 2048
) -> DataFrame:
    """min-over-rows point query, broadcast sketch side — as cms_estimate."""
    fp = _poly_fingerprint(F.col(col))
    probes = terms.select(
        F.col(col), F.posexplode(_cms_arith_buckets(fp, width)).alias("row", "bucket")
    )
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"])
        .groupBy(col)
        .agg(F.min("cnt").alias("cms_est"))
    )
