"""Distributed exact ranking — global rank / ntile without an unpartitioned
window.

``F.ntile(4).over(Window.orderBy(...))`` is correct but its physical plan is
a single-partition WindowExec ("moving all data to a single partition") — a
straight scale-killer on frames that grow with the data (e31's per-user RFM
frame at 10⁹ users). A global SORT in Spark is fine (RangePartitioner +
per-partition sort, fully parallel); it is specifically the unpartitioned
WINDOW that serializes. These operators keep the exact total-order semantics
(including ntile's uneven-bucket split arithmetic) on the parallel plan:

1. ``repartitionByRange`` on the order expressions (one range shuffle),
2. ``sortWithinPartitions`` (parallel in-partition sort),
3. a running row counter per partition accumulated across Arrow batches
   (mapInPandas — order-preserving within a partition),
4. per-partition row counts (P rows of METADATA, not data) collected,
   prefix-summed on the driver, and broadcast-joined back as offsets.

The order expressions MUST form a total order (include a unique tiebreak
column, e.g. user_id) — both for deterministic output and because range
partitioning may split equal keys across partition boundaries.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def adaptive_rank_partitions(n_rows: int, spark) -> int:
    """Partition count for a rank/ntile pass over ``n_rows`` rows: ~64k rows
    per partition (the rank stage is an Arrow round-trip per task, so
    near-empty tasks are pure choreography), capped at the session's shuffle
    width, floor 1. The ONE home for this sizing — callers that pre-count
    their frame (e31's checkpointed RFM frame) pass the count here instead
    of restating the constants."""
    return max(1, min(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
        n_rows // 65536 + 1,
    ))


def global_rank(
    df: DataFrame,
    order_exprs: list[Column],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact 1-based global rank of each row under ``order_exprs`` (a total
    order). Returns ``(ranked_df, total_rows)``.

    Cost: one range exchange + parallel sorts + one metadata-sized counts
    job (the counts job re-evaluates ``df``'s lineage — pre-checkpoint the
    parent if it is expensive). No unpartitioned window anywhere; the
    offsets frame is P rows and broadcast.
    """
    import pandas as pd

    spark = df.sparkSession
    n_hint: int | None = None
    if num_partitions is None:
        # Size partitions to the data (~64k rows each, >=1): the rank stage
        # is an Arrow round-trip per task, so 32 near-empty tasks cost ~1s
        # of pure Python-worker choreography on a 10k-row fixture frame
        # (measured), while huge frames still fan out to the session's
        # shuffle width. One extra metadata-cheap count of the parent.
        n_hint = df.count()
        num_partitions = adaptive_rank_partitions(n_hint, spark)
    from pyspark.sql import types as T

    def add_local_rank(batches):
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_local"] = np.arange(seen + 1, seen + 1 + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield pdf

    if num_partitions == 1:
        # Single-partition fast path (tiny/fixture frames — the adaptive
        # sizing above lands here under ~64k rows): with one partition the
        # local rank IS the global rank, so the checkpoint pin, the counts
        # job, and the offsets join all vanish — two fewer Spark jobs per
        # call, which is the dominant cost at fixture scale. Still adaptive:
        # the same call grows its partition count with the data.
        d1 = df.repartitionByRange(1, *order_exprs).sortWithinPartitions(*order_exprs)
        out_schema = T.StructType(
            list(d1.schema.fields) + [T.StructField("_local", T.LongType())]
        )
        ranked = d1.mapInPandas(add_local_rank, schema=out_schema)
        total = n_hint if n_hint is not None else df.count()
        return (
            ranked.withColumn(out_col, F.col("_local").cast("long")).drop("_local"),
            total,
        )

    # localCheckpoint FREEZES the range partitioning: RangePartitioner
    # samples its boundaries per-execution (seeded off the physical RDD id),
    # so the counts job and the rank job below would otherwise each draw
    # their OWN boundaries — with heavy ties the same row can land in
    # different partitions across the two jobs and the offsets are wrong
    # (caught at gen sf1.0: f_quartile off by one bucket on tied
    # frequencies). Materializing once pins one partitioning for both.
    d2 = (
        df.repartitionByRange(num_partitions, *order_exprs)
        .sortWithinPartitions(*order_exprs)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    counts = sorted(
        (r["_pid"], r["n"])
        for r in d2.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    total = sum(n for _, n in counts)
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _offset long")

    out_schema = T.StructType(
        list(d2.schema.fields) + [T.StructField("_local", T.LongType())]
    )

    ranked = d2.mapInPandas(add_local_rank, schema=out_schema)
    out = (
        ranked.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, (F.col("_local") + F.col("_offset")).cast("long"))
        .drop("_pid", "_local", "_offset")
    )
    # Expose the pinned checkpoint so callers that fully consume the ranked
    # frame (e.g. time_tiles' boundary collect) can release its executor
    # storage via free_rank_pin — DataFrame.unpersist is a no-op for local
    # checkpoints, so without this the pin lives for the session.
    out._rank_pin = d2  # type: ignore[attr-defined]
    return out, total


def free_rank_pin(ranked: DataFrame) -> None:
    """Release the localCheckpoint ``global_rank`` pinned under ``ranked``
    (no-op for the single-partition fast path, which pins nothing). Call
    ONLY when the ranked frame will never be re-evaluated — the checkpoint's
    lineage is truncated, so a later action on ``ranked`` would fail rather
    than recompute."""
    from realestatedeals_spark.util import free_local_checkpoint

    pin = getattr(ranked, "_rank_pin", None)
    if pin is not None:
        free_local_checkpoint(pin)


def _keyed(df: DataFrame, col: str) -> Column:
    """Order key for boundary comparison: timestamps go through
    ``unix_micros`` (order-isomorphic) so a collected boundary literal can
    never flake through a DST fold under a hostile session timezone."""
    from pyspark.sql import types as T

    if isinstance(df.schema[col].dataType, T.TimestampType):
        return F.unix_micros(F.col(col))
    return F.col(col)


def rank_boundary_keys(
    df: DataFrame,
    order_specs: list[tuple[str, str]],
    cuts_of_n,
    num_partitions: int | None = None,
) -> tuple[int, dict[int, tuple]]:
    """Total row count plus the composite order-key tuple at each 1-based
    rank produced by ``cuts_of_n(n)`` under the directed total order
    ``order_specs`` ([(column, "asc"|"desc"), ...] — unique tiebreak column
    last, null-free keys).

    Ranks ONLY the narrow projection of the order columns, collects
    len(cuts) ROWS of boundary keys, and releases the rank checkpoint
    BEFORE returning (time_tiles' discipline) — the caller receives
    driver-side literals and nothing stays pinned in executor storage.
    This is the primitive under ``ntile_exact`` and rank-threshold splits:
    downstream bucket membership becomes a plain lexicographic comparison
    on the ORIGINAL frame, so the full-width side never ranks, joins, or
    windows at all. Ranks ≤ 0 or past n come back absent from the dict.
    """
    kcols = [f"_k{i}" for i in range(len(order_specs))]
    narrow = df.select(
        *[_keyed(df, c).alias(k) for (c, _), k in zip(order_specs, kcols)]
    )
    order_exprs = [
        F.asc(k) if d == "asc" else F.desc(k)
        for (_, d), k in zip(order_specs, kcols)
    ]
    ranked, n = global_rank(
        narrow, order_exprs, out_col="_rk", num_partitions=num_partitions
    )
    cuts = [c for c in cuts_of_n(n) if 0 < c <= n]
    bounds = {
        r["_rk"]: tuple(r[k] for k in kcols)
        for r in ranked.filter(F.col("_rk").isin(cuts)).collect()
    } if cuts else {}
    free_rank_pin(ranked)
    return n, bounds


def after_boundary(
    df: DataFrame, order_specs: list[tuple[str, str]], bound: tuple
) -> Column:
    """Predicate: the row sits strictly AFTER ``bound`` in the directed
    lexicographic order (asc → greater, desc → smaller, tiebreak last).
    Boundary values are driver literals from ``rank_boundary_keys``;
    timestamp columns compare through the same ``unix_micros`` keying."""

    def gt(spec: tuple[str, str], b) -> Column:
        c, d = spec
        return (_keyed(df, c) > F.lit(b)) if d == "asc" else (_keyed(df, c) < F.lit(b))

    expr = gt(order_specs[-1], bound[-1])
    for spec, b in zip(reversed(order_specs[:-1]), reversed(bound[:-1])):
        expr = gt(spec, b) | ((_keyed(df, spec[0]) == F.lit(b)) & expr)
    return expr


def ntile_exact(
    df: DataFrame,
    order_specs: list[tuple[str, str]],
    n_buckets: int,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """SQL ``NTILE(n) OVER (ORDER BY ...)`` semantics — including the uneven
    split (first ``n_rows % n`` buckets get one extra row) — as a boundary
    split instead of a single-partition WindowExec.

    ``order_specs`` is [(column, "asc"|"desc"), ...] and MUST form a total
    order (unique tiebreak last). Only the narrow key projection is ever
    ranked (``rank_boundary_keys``); the full-width frame gets its bucket
    as 1 + (number of the n−1 collected bucket-boundary keys strictly
    before the row) — a chain of comparisons, no join, no Arrow pass, and
    no retained checkpoint (the round-11 form pinned an input-sized
    localCheckpoint under a private attribute that any transformation
    dropped, leaking it for the session — ADVICE r11). Bucket membership
    is bit-identical to the window form: the boundary key at ntile cut k
    is exactly the last row of bucket k under the same total order.
    """
    def cuts_of_n(n: int) -> list[int]:
        base, rem = divmod(n, n_buckets)
        cuts, acc = [], 0
        for k in range(n_buckets - 1):
            acc += base + (1 if k < rem else 0)
            cuts.append(acc)
        return cuts

    n, bounds = rank_boundary_keys(df, order_specs, cuts_of_n, num_partitions)
    bucket: Column = F.lit(1)
    # iterate the cut LIST (duplicates count once per occurrence: with
    # n < n_buckets the same boundary row closes several empty buckets)
    for cut in cuts_of_n(n):
        b = bounds.get(cut)
        if b is None:
            continue
        bucket = bucket + F.when(after_boundary(df, order_specs, b), 1).otherwise(0)
    return df.withColumn(out_col, bucket.cast("long"))
