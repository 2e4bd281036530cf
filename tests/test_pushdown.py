"""Scan-level pushdown / pruning assertions (SCALE.md "Push down and prune").

These pin the two properties every 100 TB scan must have — predicate
pushdown reaching the parquet reader (``PushedFilters`` non-empty) and
column pruning (``ReadSchema`` strictly narrower than the table) — on
representative registered queries, so a refactor that silently breaks
either (e.g. a UDF wrapping the filter column, a ``select('*')`` upstream)
fails a targeted test instead of a cluster bill.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from realestatedeals_spark.plans import QUERIES

FULL_WIDTHS = {"lineitem": 11, "orders": 6, "documents": 5, "events": 6}

# query -> (table substring in scan path, expects pushed filters)
CASES = {
    "tpch_q6_forecast_revenue": ("lineitem", True),
    "f1_filter_envelope": ("lineitem", True),
    "tpch_q1_pricing_summary": ("lineitem", True),
    "tpch_q3_shipping_priority": ("orders", True),
    "x1_exact_dedup": ("documents", False),
    "e1_tumbling_window": ("events", False),
}


def _scans(plan: str, table: str) -> list[str]:
    return [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and f"{table}.parquet" in ln
    ]


@pytest.mark.parametrize("name", sorted(CASES))
def test_scan_pushdown_and_pruning(spark, sf_dir, name):
    table, expect_filters = CASES[name]
    df = QUERIES[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = _scans(plan, table)
    assert scans, f"{name}: no parquet scan of {table} found in plan"
    for ln in scans:
        m = re.search(r"ReadSchema: struct<([^>]*)", ln)
        assert m, f"{name}: scan line without ReadSchema: {ln[:200]}"
        ncols = len([c for c in m.group(1).split(",") if ":" in c])
        assert 0 < ncols < FULL_WIDTHS[table], (
            f"{name}: scan of {table} reads {ncols} columns "
            f"(full width {FULL_WIDTHS[table]}) — column pruning lost: {ln[:300]}"
        )
        if expect_filters:
            assert re.search(r"PushedFilters: \[(?!\])", ln), (
                f"{name}: expected non-empty PushedFilters on {table}: {ln[:300]}"
            )


def test_dynamic_partition_pruning_reaches_fact_scan(spark, tmp_path):
    """io_dpp_join's fact scan must carry a DynamicPruning expression in
    its PartitionFilters — the dim-side result prunes fact partitions at
    RUNTIME, which no static pushdown can do (the filter lives on the
    other side of the join). Also checks the pruned result matches the
    direct filter."""
    import os

    from pyspark.sql import functions as F

    from realestatedeals_spark.io.sources import load_table
    from realestatedeals_spark.plans.dpp_plan import build_dpp_join

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"), "l_quantity"
    )
    fact = os.path.join(str(tmp_path), "facts")
    li.write.partitionBy("ship_month").parquet(fact)
    q = build_dpp_join(spark, "/root/testdata/sf0.001", fact)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    want = {
        (r["ship_month"], r["n_items"])
        for r in li.filter(F.col("ship_month").startswith("1996-"))
        .groupBy("ship_month")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .collect()
    }
    got = {(r["ship_month"], r["n_items"]) for r in q.collect()}
    assert got == want and want


def test_runtime_bloom_filter_injects_and_preserves_results(spark, sf_dir):
    """Spark's runtime bloom-filter join (InjectRuntimeFilter) is the
    shuffle-join analogue of DPP: the selective dimension side builds a
    bloom filter that pre-prunes the fact scan before the shuffle. At
    production scale it fires on its size thresholds; here we lower the
    application-side threshold to prove (a) the rewrite injects into this
    engine's join shape and (b) it is semantics-preserving (identical
    aggregate with the rewrite on and off)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter("o_orderpriority = '1-URGENT' AND o_totalprice > 100000")
    )

    def run():
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        agg = j.groupBy().agg(
            # decimal accumulate → exact, order-independent comparison
            F.sum(F.col("l_extendedprice").cast("decimal(30,2)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        return agg

    conf = spark.conf
    old = {
        k: conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # shuffle join
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        with_filter = run()
        plan = with_filter._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, "runtime bloom filter did not inject"
        rows_on = with_filter.collect()

        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        without = run()
        plan_off = without._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" not in plan_off
        rows_off = without.collect()
    finally:
        for k, v in old.items():
            conf.set(k, v)
    assert rows_on == rows_off and rows_on[0]["n"] > 0


def test_parquet_aggregate_pushdown_answers_from_footers(spark, sf_dir):
    """Spark's DSv2 parquet scan can answer MIN/MAX/COUNT from file footer
    statistics without reading data pages (spark.sql.parquet.
    aggregatePushDown) — at 100 TB that turns a table-wide count into a
    metadata read. Pin that the rewrite injects on this engine's plans and
    is semantics-preserving against the ordinary v1 aggregate."""
    keys = ("spark.sql.sources.useV1SourceList", "spark.sql.parquet.aggregatePushDown")
    old = {k: spark.conf.get(k, None) for k in keys}

    def agg():
        df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_orderkey").alias("mn"),
            F.max("l_orderkey").alias("mx"),
        )

    try:
        baseline = agg().collect()
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        spark.conf.set("spark.sql.parquet.aggregatePushDown", "true")
        pushed = agg()
        plan = pushed._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation" in plan and "BatchScan" in plan
        assert pushed.collect() == baseline
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
