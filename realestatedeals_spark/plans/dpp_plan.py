"""io_dpp_join — dynamic partition pruning, demonstrated and plan-pinned.

Static predicate pushdown can't help when the filter lives on the OTHER
side of a join: `facts JOIN dims WHERE dims.flag` scans every fact
partition unless the engine turns the dim-side result into a runtime
partition filter. Spark's DPP does exactly that (a DynamicPruning
subquery on the partition column), and at 100 TB it is the difference
between scanning 2 of 7 date/mode partitions and scanning all of them.

The query writes ``lineitem`` partitioned by ship month to a temp
dir (the layout a real fact table would already have), joins it to a
bounded dim frame carrying a non-pushable filter, and aggregates. The
oracle is the plain join semantics; tests/test_pushdown.py pins the
physical plan: the fact scan must carry ``dynamicpruning`` in its
partition filters — proving partitions are pruned at RUNTIME by the
dim-side result, not statically.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.plans.registry import register

_DPP_ORACLE = """
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem
WHERE strftime(l_shipdate, '%Y-%m') LIKE '1996-%'
GROUP BY 1
"""


def build_dpp_join(spark: SparkSession, sf_dir: str, fact_dir: str) -> DataFrame:
    """The joinable plan, separated so the plan-quality test can explain it."""
    months = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .distinct()
        .withColumn("wanted", F.col("ship_month").startswith("1996-"))
    )
    facts = spark.read.parquet(fact_dir)
    return (
        facts.join(months.filter(F.col("wanted")).hint("broadcast"), "ship_month")
        .groupBy("ship_month")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        )
    )


@register("io_dpp_join", oracle=_DPP_ORACLE, tags=("io", "dpp", "join"))
def io_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"), "l_quantity"
    )
    work = tempfile.mkdtemp(prefix="dpp_")
    try:
        fact_dir = os.path.join(work, "facts")
        li.write.partitionBy("ship_month").parquet(fact_dir)
        return build_dpp_join(spark, sf_dir, fact_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
