"""Sink contract tests: CSV export header golden (FIXTURES.md B5), JSON
snapshot roundtrip, graph node/edge construction."""

from __future__ import annotations

import glob

from realestatedeals_spark.io.sinks import (
    LISTINGS_EXPORT_COLUMNS,
    graph_edges,
    graph_nodes_agents,
    graph_nodes_brokers,
    listings_export_frame,
    write_csv,
    write_json,
)


def listings_df(spark):
    rows = [
        ("m1", 100, "1 A St", "Provo", "UT", "84601", "Ann Smith", "801", "Big Realty", "802"),
        ("m2", 200, "2 B St", "Orem", "UT", "84057", "Bob Jones", "803", "Big Realty", "802"),
        ("m3", 300, "3 C St", "Lehi", "UT", "84043", "", "", "", ""),
    ]
    return spark.createDataFrame(
        rows,
        [
            "mls", "price", "address", "city", "state", "zip",
            "agent_name", "agent_phone", "broker_name", "broker_phone",
        ],
    ).selectExpr(
        "*",
        "get(split(agent_name, ' '), 0) as agent_first_name",
        "coalesce(get(split(agent_name, ' '), 1), '') as agent_last_name",
        "map('k', 'v') as property_details",
    )


def test_csv_export_golden_header(spark, tmp_path):
    df = listings_export_frame(listings_df(spark))
    assert df.columns == LISTINGS_EXPORT_COLUMNS  # hunter.py:321-324
    out = str(tmp_path / "export")
    write_csv(df, out, single_file=True)
    files = glob.glob(f"{out}/*.csv")
    assert len(files) == 1
    header = open(files[0]).readline().strip()
    assert header == ",".join(LISTINGS_EXPORT_COLUMNS).replace("Property Address", "Property Address")


def test_json_snapshot_roundtrip(spark, tmp_path):
    df = listings_df(spark).select("mls", "price", "city")
    out = str(tmp_path / "snap")
    write_json(df, out)
    back = spark.read.json(out)
    assert back.count() == 3
    assert {r["mls"] for r in back.collect()} == {"m1", "m2", "m3"}


def test_graph_construction(spark):
    li = listings_df(spark)
    agents = graph_nodes_agents(li)
    brokers = graph_nodes_brokers(li)
    edges = graph_edges(li)
    assert agents.count() == 2  # empty-name m3 excluded
    assert brokers.count() == 1  # Big Realty deduped (MERGE semantics)
    by_type = {r["edge_type"]: r["cnt"] for r in
               edges.groupBy("edge_type").count().withColumnRenamed("count", "cnt").collect()}
    assert by_type == {"AGENT_OF": 2, "BROKERED_BY": 2, "WORKS_FOR": 2}


def test_graph_connector_plan_covers_all_six_elements(spark):
    """S11 — the connector write plan must carry every graph element type the
    reference upserts (database_ops.py:11-92): 3 node + 3 edge types."""
    from realestatedeals_spark.io.sinks import connector_save_plans

    plans = connector_save_plans(listings_df(spark), source_label="URE")
    names = [name for name, _, _ in plans]
    assert names == [
        "listing_nodes",
        "agent_nodes",
        "broker_nodes",
        "agent_of_edges",
        "brokered_by_edges",
        "works_for_edges",
    ]
    by_name = {name: (frame, opts) for name, frame, opts in plans}
    assert by_name["listing_nodes"][1]["node.keys"] == "key"
    assert by_name["agent_nodes"][1] == {"labels": ":Agent", "node.keys": "name"}
    rel = by_name["agent_of_edges"][1]
    assert rel["relationship"] == "AGENT_OF"
    assert rel["relationship.source.labels"] == ":Agent"
    assert rel["relationship.target.labels"] == ":URE"
    # every plan frame is materializable and non-degenerate
    assert by_name["agent_of_edges"][0].count() == 2
    assert by_name["works_for_edges"][0].columns == ["src_key", "dst_key"]


def test_graph_bolt_statements_match_plan_names(spark):
    from realestatedeals_spark.io.sinks import _bolt_upsert_statements, connector_save_plans

    plans = connector_save_plans(listings_df(spark))
    stmts = _bolt_upsert_statements("URE")
    assert {name for name, _, _ in plans} == set(stmts)
    for cypher in stmts.values():
        assert cypher.startswith("UNWIND $rows AS r")  # batched, not per-row


def test_write_graph_raises_without_connector_or_driver(spark):
    """The connector jar is absent here and the neo4j driver is not
    installed, so write_graph must raise the instructive RuntimeError —
    never return after silently writing a partial graph."""
    import pytest

    from realestatedeals_spark.io.sinks import write_graph

    with pytest.raises(RuntimeError, match="graph sink needs"):
        write_graph(listings_df(spark))


def test_connector_missing_classifier():
    from realestatedeals_spark.io.sinks import _connector_missing

    assert _connector_missing(Exception("Failed to find data source: org.neo4j.spark.DataSource"))
    assert _connector_missing(
        Exception("[DATA_SOURCE_NOT_FOUND] Failed to find the data source: org.neo4j.spark")
    )
    assert not _connector_missing(Exception("ServiceUnavailable: connection refused"))
    assert not _connector_missing(Exception("Neo.ClientError.Security.Unauthorized"))
    # Py4J-shaped genuine failures embed the full JVM stack trace — frames
    # from org.neo4j.spark.* and nested ClassNotFoundExceptions must NOT be
    # classified as connector-absent (they would silently divert real write
    # errors into the bolt fallback).
    assert not _connector_missing(
        Exception(
            "py4j.protocol.Py4JJavaError: An error occurred while calling o93.save.\n"
            ": org.neo4j.driver.exceptions.AuthenticationException: unauthorized\n"
            "\tat org.neo4j.spark.writer.Neo4jDataWriter.commit(Neo4jDataWriter.scala:52)\n"
            "\tat org.apache.spark.sql.execution.datasources.v2.WriteToDataSourceV2Exec\n"
        )
    )
    assert not _connector_missing(
        Exception(
            "py4j.protocol.Py4JJavaError\n"
            ": java.lang.NoClassDefFoundError: could not initialize\n"
            "Caused by: java.lang.ClassNotFoundException: some.other.Dependency\n"
            "\tat org.neo4j.spark.util.Validations.validate(Validations.scala:10)\n"
        )
    )


def test_sink_counters_observe(spark, tmp_path):
    from realestatedeals_spark.io.sinks import with_sink_counters, write_csv

    df = spark.createDataFrame(
        [("m1", 1), ("m2", 2), ("m2", 3)], ["mls", "v"]
    )
    observed, obs = with_sink_counters(df, "listings_sent")
    write_csv(observed, str(tmp_path / "out"))
    assert obs.get["rows_sent"] == 3
    assert obs.get["distinct_keys"] == 2


def test_flatten_zip_config(spark):
    from realestatedeals_spark.io.sources import flatten_zip_config

    nested = spark.createDataFrame(
        [
            ("Salt Lake", {"SLC": ["84101", "84102", "bad1"], "Sandy": ["84070"]}),
            ("Utah", {"Provo": ["84601"]}),
        ],
        "county string, cities map<string, array<string>>",
    )
    allrows = {(r["county"], r["city"], r["zip"]) for r in flatten_zip_config(nested).collect()}
    assert ("Salt Lake", "SLC", "84101") in allrows
    assert ("Utah", "Provo", "84601") in allrows
    assert not any(z == "bad1" for _, _, z in allrows)  # F6 valid-zip guard
    only = flatten_zip_config(nested, counties=["Utah"]).collect()
    assert {r["county"] for r in only} == {"Utah"}  # F4 county filter


def test_snapshot_read_tolerates_schema_drift(spark, tmp_path):
    """S6 drift semantics (listing.py:48-52 — from_dict accepts any shape;
    trulia sets undeclared beds/baths): the schema-enforced read maps
    missing fields to null and silently drops unknown fields, instead of
    failing or letting the schema drift row-by-row."""
    import json

    from realestatedeals_spark.io.sources import read_listing_snapshot

    old_style = {"mls": "111", "price": 100}  # old snapshot: most fields absent
    drifted = {"mls": "222", "price": 200, "beds": 3, "not_a_field": "x"}  # unknown extra
    path = tmp_path / "snap.json"
    path.write_text(json.dumps([old_style, drifted], indent=4))
    rows = {r["mls"]: r for r in read_listing_snapshot(spark, str(path)).collect()}
    assert rows["111"]["price"] == 100 and rows["111"]["beds"] is None
    assert rows["222"]["beds"] == 3
    assert "not_a_field" not in rows["222"].asDict()
