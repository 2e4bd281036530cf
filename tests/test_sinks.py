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
