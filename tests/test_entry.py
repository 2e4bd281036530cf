"""Smoke tests for the driver contract."""

from __future__ import annotations

import __spark_entry__ as E


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"first_name", "last_name", "phone", "tags"}


def test_registry_consistency():
    qs, oracles = E.queries(), E.oracle_sql()
    assert qs, "registry must not be empty"
    assert set(oracles) <= set(qs)


def test_all_queries_run_sf0001(spark, sf_dir):
    for name, fn in E.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
