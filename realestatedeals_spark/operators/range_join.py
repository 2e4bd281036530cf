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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    b = bands.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                # hi is exclusive: a band ending exactly on a bucket boundary
                # does not overlap the next bucket
                F.floor(
                    (F.col(hi_col) - F.lit(1e-9)) / w
                ).cast("long"),
            )
        ),
    )
    f = fact.withColumn("_bucket", F.floor(F.col(value_col) / w).cast("long"))
    residual = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    # bands are the small side by assumption; hint it explicitly because a
    # driver-built band frame has no stats and Catalyst would otherwise pick
    # the (known-size) fact scan as the broadcast side
    return f.join(F.broadcast(b), on=["_bucket"], how=how).filter(residual).drop("_bucket")
