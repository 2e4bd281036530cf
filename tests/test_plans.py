"""Plan-shape regression tests: the physical plans the 100 TB story depends
on must not silently regress — filter pushdown reaching the parquet scan,
column pruning, broadcast joins on dim sides, no cartesian products, and
window top-k lowering to TakeOrderedAndProject where promised.

These assert on `.explain("formatted")` output, which is stable across the
Spark 4.x line for the features checked.
"""

from __future__ import annotations

import re

from realestatedeals_spark.plans.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def plan_of(name: str, spark) -> str:
    df = QUERIES[name].fn(spark, SF_DIR)
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_f1_pushes_range_predicates_into_scan(spark):
    plan = plan_of("f1_filter_envelope", spark)
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed, plan
    assert "LessThanOrEqual(l_extendedprice" in pushed.group(1)
    assert "GreaterThanOrEqual(l_quantity" in pushed.group(1)


def test_f1_prunes_columns_at_scan(spark):
    plan = plan_of("f1_filter_envelope", spark)
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert schema, plan
    cols = {c.split(":")[0] for c in schema.group(1).split(",")}
    # 16-column table → only the 5 referenced columns reach the scan
    assert cols == {"l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_discount"}


def test_flagship_broadcasts_and_never_cartesian(spark):
    plan = plan_of("flagship_agent_dedup", spark)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q3_no_cartesian_and_topk_lowered(spark):
    plan = plan_of("tpch_q3_shipping_priority", spark)
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # orderBy().limit(k), no global sort


def test_minhash_plan_shuffles_no_text(spark):
    """No shuffle in the near-dup pipeline may carry the document text: text
    appears only below the first exchange (scan side)."""
    plan = plan_of("x2_minhash_near_dup", spark)
    first_exchange = plan.find("Exchange")
    assert first_exchange != -1
    # 'text' as a column reference must not appear in any exchange's output
    for m in re.finditer(r"Exchange [^\n]*\n(?:[^\n]*\n){0,3}", plan):
        assert "text#" not in m.group(0), m.group(0)


def test_q1_aggregates_partially_before_shuffle(spark):
    """The map-side combine claim: partial aggregation must sit below the
    exchange so only (group, accumulator) rows shuffle."""
    plan = plan_of("tpch_q1_pricing_summary", spark)
    # operator ids increase bottom-up: the partial HashAggregate's id must be
    # below the Exchange's id
    partial = re.search(r"\((\d+)\) HashAggregate\n(?:.*\n)*?.*partial_sum", plan)
    exchange = re.search(r"\((\d+)\) Exchange", plan)
    assert partial and exchange, plan
    assert int(partial.group(1)) < int(exchange.group(1))
    # sums accumulate in decimal for partitioning-independent results
    assert re.search(r"partial_sum\(cast\(l_quantity#\d+ as decimal", plan)


def test_funnel_single_user_exchange(spark):
    """SCALE.md claim: funnel stepping = stacked conditional-min windows over
    ONE user-keyed exchange (no per-stage self-joins); the only other
    exchange is the single-row global summary."""
    plan = plan_of("e6_funnel", spark)
    assert len(re.findall(r"Arguments: hashpartitioning\(user_id", plan)) == 1
    assert plan.count("Join") == 0
    assert len(re.findall(r"\(\d+\) Window", plan)) == 3


def test_heavy_hitters_semi_joins_candidates_before_counting(spark):
    """SCALE.md claim: the exact recount happens AFTER a broadcast LeftSemi
    against the candidate set — never a full groupBy of raw terms feeding
    the final filter. The only nested-loop is the 1-row total broadcast."""
    plan = plan_of("x6_heavy_hitters", spark)
    assert "BroadcastHashJoin LeftSemi" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the threshold join builds on a SinglePartition (1-row) broadcast
    assert re.search(r"BroadcastNestedLoopJoin Cross", plan)


def test_retention_no_cartesian_and_user_copartitioned(spark):
    plan = plan_of("e7_retention_cohorts", spark)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # (user, day) dedup and first-seen agg both key their exchanges on user_id
    assert len(re.findall(r"Arguments: hashpartitioning\(user_id", plan)) == 2


def test_forward_asof_single_keyed_shuffle(spark):
    """Forward as-of must keep the one-shuffle union+carry shape (the
    direction flag only mirrors the scan order)."""
    plan = plan_of("e8_asof_next_error", spark)
    assert len(re.findall(r"Arguments: hashpartitioning\(user_id", plan)) == 1
    assert plan.count("Join") == 0  # union + window, never a join


def test_interval_overlap_is_equi_join_not_nested_loop(spark):
    plan = plan_of("range_join_daily_overlap", spark)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_scd2_single_exchange_single_sort(spark):
    """SCD2 claim (plans/events.py): the change-row filter preserves hash
    partitioning AND sort order, so the version/lead window reuses the
    first window's exchange and sort — one Exchange, one Sort, total."""
    plan = plan_of("e10_scd2_intervals", spark)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Sort\b", plan)) == 1, plan
    assert "Join" not in plan


def test_chunking_is_shuffle_free(spark):
    """Context-window chunking is a per-row fan-out: no Exchange at all."""
    plan = plan_of("x4_chunk_documents", spark)
    assert "Exchange" not in plan
    assert "Generate" in plan  # posexplode lowered to Generate


def test_exact_k_sample_lowered_to_takeordered(spark):
    """Exact-k hash sampling must be per-partition heaps + k-row driver
    merge (TakeOrderedAndProject), never a global sort."""
    plan = plan_of("x7_uniform_sample_exact_k", spark)
    assert "TakeOrderedAndProject" in plan, plan
    assert len(re.findall(r"\(\d+\) Sort\b", plan)) == 0, plan
