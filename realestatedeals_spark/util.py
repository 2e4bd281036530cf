"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def inline_frame(spark: SparkSession, names: list[str], rows: list[tuple]) -> DataFrame:
    """A small literal dimension table built as Catalyst expressions.

    ``spark.createDataFrame`` parallelizes through a Python RDD, which costs
    a full job-setup round trip (~1 s on a cold session) — absurd for a
    3-row band table or a 16-row centroid frame, and it arrives with unknown
    stats so Catalyst may mis-pick the broadcast side. Building the rows as
    an exploded array of struct literals keeps everything in the SQL layer:
    no RDD, no serialization job, constant-folded at plan time.

    Values may be scalars or lists (lists become array columns).
    """

    def lit_any(v):
        if isinstance(v, (list, tuple)):
            return F.array(*[F.lit(x) for x in v])
        return F.lit(v)

    structs = [
        F.struct(*[lit_any(v).alias(n) for n, v in zip(names, row)]) for row in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("_r"))
        .select("_r.*")
    )
