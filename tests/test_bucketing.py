"""Bucketed tables: the 100 TB co-located-join story, asserted on the plan.

Writing both join sides bucketed by the join key (same bucket count) lets
Spark's sort-merge join read matching buckets directly — zero shuffle
exchanges in the executed plan. At cluster scale this is the difference
between re-shuffling 100 TB per join and none.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force SMJ so the assertion is about bucketing, not broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        (
            orders.write.bucketBy(4, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", str(tmp_path / "orders_b"))
            .saveAsTable("orders_bucketed")
        )
        (
            li.write.bucketBy(4, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", str(tmp_path / "lineitem_b"))
            .saveAsTable("lineitem_bucketed")
        )
        ob = spark.table("orders_bucketed")
        lb = spark.table("lineitem_bucketed")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )
        n = joined.count()
        assert n > 0
        plan = _executed_plan(ob.join(lb, ob.o_orderkey == lb.l_orderkey))
        assert "SortMergeJoin" in plan
        # co-located buckets: the join itself needs no shuffle exchange
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, plan

        # same join on the un-bucketed parquet MUST shuffle — the assertion
        # above is meaningful only if this control shows the exchanges
        control = _executed_plan(orders.join(li, orders.o_orderkey == li.l_orderkey))
        assert "Exchange hashpartitioning" in control
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
