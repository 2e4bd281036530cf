"""IO — bucketed co-located join, registered + oracle-checked.

The zero-exchange join path (previously pytest-only) as a graded query:
``orders`` and ``lineitem`` are written as managed tables bucketed by the
join key into the same bucket count, then joined and aggregated. The join
reads co-located buckets — NO Exchange on either side of the SortMergeJoin
(asserted inline: this query RAISES if an Exchange appears between the
scans and the join, so the driver's pass certifies the physical plan, not
just the values). At 100 TB this is the amortization lever: one write-side
shuffle buys every subsequent join on that key.

The oracle is the plain SQL join/aggregate over the raw parquet — values
must be identical whichever physical join strategy runs.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestatedeals_spark.io.sinks import write_bucketed_table
from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.plans.registry import register
from realestatedeals_spark.session import apply_session_conf

_BUCKETED_ORACLE = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS total_qty
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""


@register("io_bucketed_join", oracle=_BUCKETED_ORACLE, tags=("io", "bucketing", "join"))
def io_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    # a previous session's crash can leave the warehouse directory behind
    # without catalog metadata — DROP alone won't clear it, so remove both
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").replace("file:", "")
    for t in ("bj_orders", "bj_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = os.path.join(warehouse, t)
        if os.path.exists(loc):
            shutil.rmtree(loc, ignore_errors=True)
    write_bucketed_table(orders, "bj_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed_table(li, "bj_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    bo = spark.table("bj_orders")
    bl = spark.table("bj_lineitem")
    joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # The co-location claim is NO SHUFFLE: at tiny SF Catalyst may still
    # prefer a BroadcastExchange of the small side (correct — cheaper than
    # reading both bucketed layouts), but a shuffle Exchange would mean the
    # bucketing bought nothing. tests/test_bucketing.py additionally pins
    # the zero-Exchange SortMergeJoin with broadcast disabled.
    if "Exchange hashpartitioning" in plan:
        raise AssertionError(
            "bucketed join plan contains a shuffle Exchange — co-location broke:\n"
            + plan[:2000]
        )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(25,4)")).cast("double").alias("total_qty"),
    )
