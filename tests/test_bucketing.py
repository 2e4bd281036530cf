"""Bucketed-table co-location and partition pruning (io/sinks.py).

The 100 TB claims these pin down:
- two tables bucketed by the join key into the same bucket count join with
  ZERO exchanges (the write-side shuffle is amortized over every join);
- a filter on a hive-partition column reaches the scan as PartitionFilters
  (directory pruning at planning time, not a data filter).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from realestatedeals_spark.io.sinks import write_bucketed_table, write_partitioned
from realestatedeals_spark.io.sources import load_table


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.fixture()
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed_table(orders, "bkt_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed_table(lineitem, "bkt_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    yield "bkt_orders", "bkt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    # Force the sort-merge path (broadcast would hide the co-location proof).
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t_lineitem).join(
            spark.table(t_orders), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount" in plan, plan

        # Same join from the raw (unbucketed) parquet must shuffle both sides
        # — proves the absence above comes from bucketing, not plan luck.
        raw = load_table(spark, sf_dir, "lineitem").join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert "Exchange" in _plan(raw)

        # And the answers agree.
        assert joined.count() == raw.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_reuses_layout(spark, bucketed_tables):
    _, t_lineitem = bucketed_tables
    agg = spark.table(t_lineitem).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    assert "Exchange" not in _plan(agg)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, ["lang"])
    one = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = _plan(one)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "lang" in m.group(1), plan
    # the lang predicate is partition-pruned, so no data-filter on lang remains
    assert one.count() == docs.filter(F.col("lang") == "en").count()
