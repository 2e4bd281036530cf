"""Range (interval) join — value-in-band matching without a nested loop.

Spark lowers a plain ``v >= lo AND v < hi`` join to BroadcastNestedLoopJoin
(fine when the band table is tiny, quadratic when it is not). The scale path
here is bucketing: pick a bucket width, explode each band into the buckets it
overlaps, tag each fact row with its single bucket, and equi-join on the
bucket with the band predicate as a residual filter. The shuffle is then an
ordinary hash join keyed on the bucket — linear in facts + exploded bands,
and AQE can still broadcast the exploded band side when it stays small.

Duplicate-safety: a fact value lands in exactly one bucket and each band
lists every bucket it overlaps exactly once, so a (fact, band) match is
produced at most once — no post-join dedup needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _bucket_seq(df: DataFrame, lo_col: str, hi_col: str, w: float) -> Column:
    """Buckets overlapped by the half-open interval [lo, hi):
    ``floor(lo/w) .. last`` where ``last`` excludes a hi sitting exactly on a
    bucket boundary.

    For integral domains the largest contained value is ``hi - 1`` exactly —
    an absolute float epsilon (hi - 1e-9) is a double no-op at epoch-micro
    magnitudes (~1e15), which would leak boundary-aligned intervals into one
    extra bucket (correctness survives the residual filter, but the shuffle
    grows). Float domains get an epsilon scaled to the bucket width instead
    of an absolute one.
    """
    hi_adj = (
        F.col(hi_col) - F.lit(1)
        if isinstance(df.schema[hi_col].dataType, _INTEGRAL)
        else F.col(hi_col) - F.lit(1e-9 * w)
    )
    return F.sequence(
        F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
        F.floor(hi_adj / F.lit(w)).cast("long"),
    )


def bucketed_range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 10.0,
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to band rows where ``lo <= value < hi``.

    ``bucket_width`` trades band-side explosion (wide bands / narrow buckets
    → more exploded rows) against residual-filter selectivity; set it near
    the median band width so most bands explode into O(1) buckets.
    """
    w = float(bucket_width)
    # hi is exclusive: a band ending exactly on a bucket boundary does not
    # overlap the next bucket (see _bucket_seq)
    b = bands.withColumn("_bucket", F.explode(_bucket_seq(bands, lo_col, hi_col, w)))
    f = fact.withColumn("_bucket", F.floor(F.col(value_col) / w).cast("long"))
    residual = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    # bands are the small side by assumption; hint it explicitly because a
    # driver-built band frame has no stats and Catalyst would otherwise pick
    # the (known-size) fact scan as the broadcast side
    return f.join(F.broadcast(b), on=["_bucket"], how=how).filter(residual).drop("_bucket")


def interval_overlap_count(
    intervals: DataFrame,
    keys: list[str],
    lo_col: str = "lo",
    hi_col: str = "hi",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """COUNT of overlapping interval pairs per key group (half-open
    [lo, hi), strict overlap ``a.lo < b.hi AND b.lo < a.hi``) WITHOUT ever
    materializing a pair row — the sweep-line plan for count-only outputs.

    Sweep: flatten each interval into a +1 event at ``lo`` and a -1 event
    at ``hi``; order events by (t, kind) with ends (kind=0) BEFORE starts
    (kind=1) at the same instant, so a pair touching only at a boundary
    (``a.hi == b.lo``) is correctly NOT counted under the strict predicate.
    Each start event contributes (number of currently-open intervals) pairs
    — the running sum of deltas over strictly-preceding events. Summing
    those contributions per key group counts every unordered overlapping
    pair exactly once.

    Tie invariance: k starts tied at the same instant over a base open
    count c contribute c + (c+1) + … + (c+k-1) in ANY processing order, so
    the per-group SUM is deterministic even where the sort order among
    ties is not; ``tiebreak_cols`` (default: all non-key/lo/hi columns)
    still pins a total order so per-row plans are stable under AQE.

    Scale: one shuffle on ``keys``, one O(n log n) in-partition sort of 2n
    endpoints, zero pair rows — vs the O(n²)-pairs bucketed join when
    intervals within a group mostly all overlap. Use
    ``interval_overlap_join`` when the pairs themselves are the output.

    Returns one row per key group that has ≥1 overlapping pair:
    ``keys + [n_overlapping_pairs: long]`` (groups with 0 pairs are
    omitted, matching the semantics of COUNT(*) over an inner pair join).

    Degenerate intervals (``lo >= hi`` — EMPTY under half-open semantics)
    are filtered at entry and contribute no pairs: the sweep's end-before-
    start tie rule would otherwise drop a point interval's own +1 from the
    open count seen by later starts at the same instant and undercount
    pairs the raw ``a.lo < b.hi AND b.lo < a.hi`` predicate includes
    (ADVICE r11). An empty interval overlapping nothing IS the half-open
    reading; callers wanting the raw-predicate count of degenerate rows
    must widen them first.
    """
    intervals = intervals.filter(F.col(lo_col) < F.col(hi_col))
    if tiebreak_cols is None:
        tiebreak_cols = [c for c in intervals.columns if c not in (*keys, lo_col, hi_col)]
    starts = intervals.select(
        *keys, *tiebreak_cols,
        F.col(lo_col).alias("_t"), F.lit(1).alias("_kind"), F.lit(1).alias("_delta"),
    )
    ends = intervals.select(
        *keys, *tiebreak_cols,
        F.col(hi_col).alias("_t"), F.lit(0).alias("_kind"), F.lit(-1).alias("_delta"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_kind", *tiebreak_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    open_before = F.coalesce(F.sum("_delta").over(w), F.lit(0))
    return (
        starts.unionByName(ends)
        .withColumn("_open_before", open_before)
        .filter(F.col("_kind") == 1)
        .groupBy(*keys)
        .agg(F.sum("_open_before").alias("n_overlapping_pairs"))
        .filter(F.col("n_overlapping_pairs") > 0)
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 10.0,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """Interval × interval overlap join (half-open [lo, hi)), equi-keyed on
    ``keys``: pairs where ``a.lo < b.hi AND b.lo < a.hi``.

    Scale path: both sides explode into the buckets they overlap and
    equi-join on (keys, bucket); the overlap predicate is a residual filter.
    DEDUP-FREE by construction: an overlapping pair shares every bucket in
    the overlap region, so the join also requires
    ``bucket == greatest(floor(a.lo/w), floor(b.lo/w))`` — the canonical
    first shared bucket — and each pair is emitted exactly once, no
    ``distinct`` over the pair stream. Shuffle is linear in exploded
    intervals; width should sit near the median interval length.
    """
    w = float(bucket_width)

    def exploded(df: DataFrame, suffix: str) -> DataFrame:
        cols = [F.col(c).alias(f"{c}{suffix}") for c in df.columns if c not in keys]
        return df.select(
            *keys,
            *cols,
            F.explode(_bucket_seq(df, lo_col, hi_col, w)).alias("_bucket"),
        )

    sa, sb = suffixes
    a = exploded(left, sa)
    b = exploded(right, sb)
    lo_a, hi_a, lo_b, hi_b = (F.col(f"{c}{s}") for c, s in
                              ((lo_col, sa), (hi_col, sa), (lo_col, sb), (hi_col, sb)))
    overlap = (lo_a < hi_b) & (lo_b < hi_a)
    canonical = F.col("_bucket") == F.greatest(
        F.floor(lo_a / w).cast("long"), F.floor(lo_b / w).cast("long")
    )
    return a.join(b, on=keys + ["_bucket"]).filter(overlap & canonical).drop("_bucket")
