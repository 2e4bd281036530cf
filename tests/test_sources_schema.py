"""Fixture schema probes (VERDICT r3 item 6).

The driver regenerates fixtures between rounds — round 3's events
regeneration (TIMESTAMP(NANOS) -> timestamp[us]) silently broke 9 queries,
9 tests, and the bench because nothing asserted the encoding the plans
assume. These probes pin, per fixture table, the physical parquet dtype and
the logical schema the engine's readers produce, so a regeneration fails ONE
small targeted test with a pointer instead of a blast radius.

Probes read parquet footers via pyarrow (no Spark job) except the
load_events probe, which exercises the actual dispatch.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# Physical arrow types the plans assume, per table. A mismatch here means the
# driver regenerated a fixture: check the reader in io/sources.py (load_events
# dispatches on dtype; everything else reads parquet natively) and the
# query plans that consume the changed column.
EXPECTED = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": ("timestamp[us]", "timestamp[ns]"),
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": ("timestamp[us]", "timestamp[ns]"),
    },
    "events": {
        "event_id": "int64",
        # load_events dispatches on this dtype — any encoding here is fine as
        # long as it is one the dispatch handles (io/sources.py:load_events)
        "ts": ("timestamp[us]", "timestamp[ns]", "int64"),
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": ("list<item: float>", "list<element: float>"),
        "label": "int32",
    },
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_schema_pinned(sf_dir, table):
    schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
    expected = EXPECTED[table]
    actual = {f.name: str(f.type) for f in schema}
    assert set(actual) == set(expected), (
        f"{sf_dir}/{table}.parquet columns drifted: {sorted(actual)} vs "
        f"expected {sorted(expected)} — the driver regenerated this fixture; "
        f"update the readers/plans that consume it, then this probe"
    )
    for name, want in expected.items():
        allowed = want if isinstance(want, tuple) else (want,)
        assert actual[name] in allowed, (
            f"{sf_dir}/{table}.parquet column {name} is {actual[name]}, "
            f"expected one of {allowed} — fixture regenerated with a new "
            f"encoding; check io/sources.py readers and consuming plans"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_load_events_dispatch_handles_current_fixture(spark, sf_dir):
    """The actual reader must produce TimestampType ts whatever the fixture's
    current encoding is — this is the probe that would have caught round 3's
    regeneration before the driver did."""
    from pyspark.sql import types as T

    from realestatedeals_spark.io.sources import load_events

    df = load_events(spark, sf_dir)
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
        f"load_events produced {df.schema['ts'].dataType} for {sf_dir}; "
        "extend the dtype dispatch in io/sources.py"
    )
    assert df.limit(1).count() == 1
