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
