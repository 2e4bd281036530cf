"""As-of (time-travel) join — an operator Spark's DataFrame API lacks.

Semantics: for every left row, attach the columns of the single right row with
the greatest ``right_ts <= left_ts`` within the same key group (backward
as-of, inclusive); left rows with no earlier right row keep NULLs. This is
DuckDB's ``ASOF LEFT JOIN`` / pandas ``merge_asof`` semantics.

Implementation is the canonical distributed form: union the tagged sides and
carry the right columns forward with ``last(..., ignorenulls=True)`` over a
per-key window ordered by (ts, side) — right rows sort before left rows at
equal timestamps, which makes the match inclusive. Cost is ONE shuffle of
left+right on the key columns plus a per-partition sort: no range join, no
broadcast nested loop, no per-row probe. At 100 TB the shuffle is the same
one a plain equi-join on the key would pay; hot keys can additionally be
time-bucketed (salt on floor(ts/bucket) with boundary replication) — at that
point each bucket still computes locally because only the last right row of
the previous bucket must be replicated forward. ``asof_join_salted``
implements exactly that (equivalence-pinned against ``asof_join`` on a
90%-hot-key fixture in tests/test_asof.py).

Caveat: a right column whose value is legitimately NULL is skipped by the
ignorenulls carry-forward (an older non-null wins). Matching the row, not the
value, would carry a struct of all right columns instead — ``asof_join``
does exactly that, so NULL right values survive.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """As-of join of ``left`` to ``right`` on key ``on``.

    ``direction="backward"`` (default): latest right row with
    ``right_ts <= left_ts``. ``direction="forward"``: earliest right row
    with ``right_ts >= left_ts`` — the same ONE-shuffle union +
    carry window, scanned in mirror order.

    ``right_cols`` (default: every non-key, non-ts right column) are attached
    to each left row from the matched right row;
    the matched right timestamp is attached as ``{right_ts}{suffix}``. NULL
    values inside a matched right row are preserved (the whole row is carried
    as one struct, so ignorenulls only skips *absent* matches, never null
    fields of a present match).
    """
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    right_cols = list(right_cols)

    payload = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c).alias(c) for c in right_cols]
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_r"),
        *[F.lit(None).cast(t.dataType).alias(f"_l_{c}")
          for c, t in zip(left.columns, left.schema.fields)],
    )
    l_ = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    order = [F.col("_t").asc(), F.col("_side").asc()] if direction == "backward" else [
        F.col("_t").desc(), F.col("_side").asc()
    ]
    w = (
        W.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l_.unionByName(r).withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out_cols = [F.col(f"_l_{c}").alias(c) for c in left.columns if c not in on]
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *on,
            *out_cols,
            F.col("_m._ts").alias(f"{right_ts}{suffix}"),
            *[F.col(f"_m.{c}").alias(c if c not in left.columns else f"{c}{suffix}")
              for c in right_cols],
        )
    )


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    bucket_width: float = 3600.0,
) -> DataFrame:
    """Backward as-of join salted on ``floor(ts / bucket_width)`` time buckets.

    Identical output to ``asof_join(..., direction="backward")``; use it when
    one key dominates the input (one device emitting most readings): the plain
    operator's per-key window serializes that key into a single task, while
    here the wide shuffle keys on ``(key…, bucket)`` so a hot key spreads over
    as many tasks as it spans buckets. Correctness across bucket boundaries is
    restored by a narrow side-channel that is one row per distinct
    (key, bucket): the last right row of every right bucket is aggregated
    map-side (``max_by``), a per-key running carry over bucket numbers picks
    the latest such row STRICTLY BEFORE each left bucket, and that carry-in is
    injected as a synthetic right row which sorts first inside its bucket
    (its timestamp is from an earlier bucket). Only the tiny summary frame —
    not the data — pays the key-only shuffle the hot key would have hogged.

    Forward direction would mirror (first right row per bucket, carry
    backward); only backward is needed by the registered queries.
    """
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    right_cols = list(right_cols)
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")

    def _bkt(col: str):
        return F.floor(F.col(col).cast("double") / F.lit(float(bucket_width))).cast("long")

    payload = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c).alias(c) for c in right_cols]
    )
    null_left = [
        F.lit(None).cast(t.dataType).alias(f"_l_{c}")
        for c, t in zip(left.columns, left.schema.fields)
    ]
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_r"),
        *null_left,
    ).withColumn("_bkt", _bkt("_t"))
    r_type = r.schema["_r"].dataType
    l_ = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_type).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    ).withColumn("_bkt", _bkt("_t"))

    # Narrow side-channel: one row per (key, bucket). Right buckets carry
    # their last payload; left buckets register a need. Ordering (_bkt asc,
    # _need asc) puts the need row BEFORE the same bucket's right summary, so
    # the running carry at a need row sees only summaries of earlier buckets.
    last_per_bucket = r.groupBy(*on, "_bkt").agg(
        F.max_by(F.col("_r"), F.col("_r._ts")).alias("_carry"),
        F.lit(1).alias("_need"),
    )
    needs = (
        l_.select(*on, "_bkt").distinct()
        .withColumn("_carry", F.lit(None).cast(r_type))
        .withColumn("_need", F.lit(0))
    )
    wc = (
        W.partitionBy(*on)
        .orderBy(F.col("_bkt").asc(), F.col("_need").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    seeds = (
        last_per_bucket.unionByName(needs)
        .withColumn("_in", F.last("_carry", ignorenulls=True).over(wc))
        .filter((F.col("_need") == 0) & F.col("_in").isNotNull())
        .select(
            *[F.col(c) for c in on],
            F.col("_in._ts").alias("_t"),
            F.lit(0).alias("_side"),
            F.col("_in").alias("_r"),
            *null_left,
            F.col("_bkt"),
        )
    )

    # Seed timestamps come from strictly earlier buckets, so they sort first
    # inside their bucket under the same (ts, side) order the plain join uses.
    w = (
        W.partitionBy(*on, "_bkt")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = (
        l_.unionByName(r).unionByName(seeds)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    )
    out_cols = [F.col(f"_l_{c}").alias(c) for c in left.columns if c not in on]
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *on,
            *out_cols,
            F.col("_m._ts").alias(f"{right_ts}{suffix}"),
            *[F.col(f"_m.{c}").alias(c if c not in left.columns else f"{c}{suffix}")
              for c in right_cols],
        )
    )
