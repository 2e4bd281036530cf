"""Sinks (SURVEY.md §2a.1 S7/S10/S11).

File sinks are thin ``DataFrameWriter`` wrappers that pin the reference's
output contracts (column sets/headers). The graph sink builds the property
graph the reference upserts into Neo4j (database_ops.py:11-92) as
nodes/edges DataFrames — testable without a database — and ships them
through the Neo4j Spark Connector when its jar is on the classpath, else a
``foreachPartition`` bolt upsert when the ``neo4j`` driver is importable,
else raises with instructions. The graph-construction logic (the part with
query semantics) is pure DataFrame ops either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# S10 — the 8-column listings export header (hunter.py:321-324; artifact
# listings.csv:1). Email is always empty in the reference (hunter.py:329).
LISTINGS_EXPORT_COLUMNS = [
    "Property Address",
    "Property City",
    "Property State",
    "Property Zipcode",
    "First Name",
    "Last Name",
    "Email",
    "Phone",
]


def listings_export_frame(listings: DataFrame) -> DataFrame:
    """Shape a listings DataFrame into the reference's CSV export contract."""
    return listings.select(
        F.col("address").alias("Property Address"),
        F.col("city").alias("Property City"),
        F.col("state").alias("Property State"),
        F.col("zip").alias("Property Zipcode"),
        F.col("agent_first_name").alias("First Name"),
        F.col("agent_last_name").alias("Last Name"),
        F.lit("").alias("Email"),
        F.col("agent_phone").alias("Phone"),
    )


def with_sink_counters(df: DataFrame, name: str = "sink"):
    """A3 — running counters (listings-sent per cycle, ure_scraping.py:21,43-44,
    main.py:100,136) as ``observe`` metrics: collected as a side effect of
    whatever action materializes the frame, no second pass over the data.

    Returns ``(df, observation)``; read ``observation.get`` after an action.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    # observe() only admits deterministic non-distinct aggregates, so the key
    # cardinality is approximate (exact distinct would need a shuffle anyway)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_sent"),
        F.approx_count_distinct(F.col(df.columns[0])).alias("distinct_keys"),
    )
    return observed, obs


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S10 — header CSV sink. ``single_file`` mirrors the reference's one-file
    outputs (agent_manager.py:34); at scale leave it False (one file per
    partition)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)


def write_json(df: DataFrame, path: str) -> None:
    """S7 — JSON snapshot sink (main.py:144-171). Line-delimited JSON (the
    scalable form of the reference's single pretty-printed file)."""
    df.write.mode("overwrite").json(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-partitioned parquet sink — the layout lever for 100 TB scans:
    a filter on a partition column prunes directories at planning time
    (PartitionFilters in the scan), so a one-partition query reads one
    partition's files, not the corpus. Partition columns should be
    low-cardinality (date / region / lang), never a key."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink — the co-location lever for 100 TB joins:
    two tables bucketed by the same key into the same bucket count join
    WITHOUT a shuffle (no Exchange in the plan; asserted in
    tests/test_bucketing.py). ``sort_cols`` additionally pre-sorts each
    bucket file so sort-merge joins skip their sorts. Use for the fact
    tables a pipeline joins repeatedly (lineitem⋈orders, tokens⋈doc_meta):
    one write-side shuffle is amortized over every subsequent join."""
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


# ---------------------------------------------------------------------------
# S11 — property-graph sink.
# Nodes: Listing (label = source site, database_ops.py:15), Agent
# (database_ops.py:61-64), Broker (database_ops.py:66-70).
# Edges: AGENT_OF (73-77), BROKERED_BY (79-83), WORKS_FOR (85-90).
# ---------------------------------------------------------------------------


def graph_nodes_listings(listings: DataFrame, source_label: str = "URE") -> DataFrame:
    return listings.select(
        F.lit(source_label).alias("label"),
        F.col("mls").alias("key"),
        "price",
        "address",
        "city",
        "state",
        "zip",
        F.to_json("property_details").alias("property_details"),  # database_ops.py:56
    )


def graph_nodes_agents(listings: DataFrame) -> DataFrame:
    """Agent nodes keyed by (name, phone) — MERGE semantics = distinct."""
    return (
        listings.select(
            F.lit("Agent").alias("label"),
            F.col("agent_name").alias("name"),
            F.col("agent_phone").alias("phone"),
        )
        .filter(F.col("name").isNotNull() & (F.trim("name") != ""))
        .distinct()
    )


def graph_nodes_brokers(listings: DataFrame) -> DataFrame:
    return (
        listings.select(
            F.lit("Broker").alias("label"),
            F.col("broker_name").alias("name"),
            F.col("broker_phone").alias("phone"),
        )
        .filter(F.col("name").isNotNull() & (F.trim("name") != ""))
        .distinct()
    )


def graph_edges(listings: DataFrame) -> DataFrame:
    """All three edge types as one (src_key, edge_type, dst_key) frame.

    AGENT_OF: agent → listing; BROKERED_BY: listing → broker; WORKS_FOR:
    agent → broker (database_ops.py:73-90). MERGE semantics = distinct.
    """
    agent_of = listings.filter(F.trim(F.coalesce("agent_name", F.lit(""))) != "").select(
        F.col("agent_name").alias("src_key"),
        F.lit("AGENT_OF").alias("edge_type"),
        F.col("mls").alias("dst_key"),
    )
    brokered_by = listings.filter(F.trim(F.coalesce("broker_name", F.lit(""))) != "").select(
        F.col("mls").alias("src_key"),
        F.lit("BROKERED_BY").alias("edge_type"),
        F.col("broker_name").alias("dst_key"),
    )
    works_for = (
        listings.filter(
            (F.trim(F.coalesce("agent_name", F.lit(""))) != "")
            & (F.trim(F.coalesce("broker_name", F.lit(""))) != "")
        )
        .select(
            F.col("agent_name").alias("src_key"),
            F.lit("WORKS_FOR").alias("edge_type"),
            F.col("broker_name").alias("dst_key"),
        )
    )
    return agent_of.unionByName(brokered_by).unionByName(works_for).distinct()


def connector_save_plans(
    listings: DataFrame, source_label: str = "URE"
) -> list[tuple[str, DataFrame, dict[str, str]]]:
    """The full Neo4j-Spark-Connector write plan for the property graph:
    (element_name, frame, connector options) for all 3 node types and all 3
    edge types (database_ops.py:11-92). Node/relationship match keys mirror
    the reference's MERGE keys (mls for listings, name for agents/brokers —
    the same keys the J4 edge MATCHes use).

    Pure metadata + lazy frames — testable without a connector jar.
    """
    nodes = graph_nodes_listings(listings, source_label)
    agents = graph_nodes_agents(listings)
    brokers = graph_nodes_brokers(listings)
    edges = graph_edges(listings)
    lbl = f":{source_label}"
    plans: list[tuple[str, DataFrame, dict[str, str]]] = [
        ("listing_nodes", nodes, {"labels": lbl, "node.keys": "key"}),
        ("agent_nodes", agents, {"labels": ":Agent", "node.keys": "name"}),
        ("broker_nodes", brokers, {"labels": ":Broker", "node.keys": "name"}),
    ]
    rel_specs = {
        # edge_type -> (source labels, source key col:prop, target labels, target key col:prop)
        "AGENT_OF": (":Agent", "src_key:name", lbl, "dst_key:key"),
        "BROKERED_BY": (lbl, "src_key:key", ":Broker", "dst_key:name"),
        "WORKS_FOR": (":Agent", "src_key:name", ":Broker", "dst_key:name"),
    }
    for edge_type, (slbl, skey, tlbl, tkey) in rel_specs.items():
        plans.append(
            (
                f"{edge_type.lower()}_edges",
                edges.filter(F.col("edge_type") == edge_type).select("src_key", "dst_key"),
                {
                    "relationship": edge_type,
                    "relationship.save.strategy": "keys",
                    "relationship.source.save.mode": "Match",
                    "relationship.source.labels": slbl,
                    "relationship.source.node.keys": skey,
                    "relationship.target.save.mode": "Match",
                    "relationship.target.labels": tlbl,
                    "relationship.target.node.keys": tkey,
                },
            )
        )
    return plans


def _bolt_upsert_statements(source_label: str) -> dict[str, str]:
    """Per-element batched (UNWIND) Cypher for the bolt fallback — one
    round-trip per partition per element type, never the reference's five
    statements per row (database_ops.py:47-90)."""
    return {
        "listing_nodes": (
            f"UNWIND $rows AS r MERGE (n:{source_label} {{key: r.key}}) SET n += r"
        ),
        "agent_nodes": (
            "UNWIND $rows AS r MERGE (n:Agent {name: r.name}) SET n.phone = r.phone"
        ),
        "broker_nodes": (
            "UNWIND $rows AS r MERGE (n:Broker {name: r.name}) SET n.phone = r.phone"
        ),
        "agent_of_edges": (
            "UNWIND $rows AS r MATCH (a:Agent {name: r.src_key}), "
            f"(l:{source_label} {{key: r.dst_key}}) MERGE (a)-[:AGENT_OF]->(l)"
        ),
        "brokered_by_edges": (
            f"UNWIND $rows AS r MATCH (l:{source_label} {{key: r.src_key}}), "
            "(b:Broker {name: r.dst_key}) MERGE (l)-[:BROKERED_BY]->(b)"
        ),
        "works_for_edges": (
            "UNWIND $rows AS r MATCH (a:Agent {name: r.src_key}), "
            "(b:Broker {name: r.dst_key}) MERGE (a)-[:WORKS_FOR]->(b)"
        ),
    }


def _connector_missing(exc: Exception) -> bool:
    """True only for 'the connector jar is not on the classpath' failures —
    genuine write errors from a present connector must propagate, not be
    swallowed into a silent fallback.

    Matches only the planner's missing-data-source message ("Failed to find
    [the] data source", Spark raises it as DATA_SOURCE_NOT_FOUND before any
    write is attempted). Package names or bare ClassNotFoundException are
    NOT matched: Py4JJavaError messages embed the full JVM stack trace, so a
    genuine connector failure (auth, connection refused, constraint error)
    raised from org.neo4j.spark.* frames would contain those substrings and
    be silently diverted to the fallback.
    """
    msg = str(exc)
    return (
        "Failed to find data source" in msg
        or "Failed to find the data source" in msg
        or "DATA_SOURCE_NOT_FOUND" in msg
    )


def write_graph(
    listings: DataFrame,
    url: str = "bolt://localhost:7687",
    auth: tuple[str, str] | None = None,
    source_label: str = "URE",
) -> None:
    """Upsert the property graph — 3 node types + 3 edge types
    (database_ops.py:11-92) — into Neo4j.

    Prefers the Neo4j Spark Connector (batched, transactional); falls back
    to a per-partition bolt writer (one UNWIND round-trip per partition per
    element — never the reference's 5 round-trips per row) only when the
    connector jar is absent; raises if neither is available, and re-raises
    genuine write failures instead of silently dropping graph elements.

    Node writes run before edge writes on both paths so relationship MATCHes
    find their endpoints.
    """
    plans = connector_save_plans(listings, source_label)

    try:  # connector path — all six element types
        for _name, frame, opts in plans:
            writer = (
                frame.write.format("org.neo4j.spark.DataSource")
                .mode("Overwrite")
                .option("url", url)
            )
            for key, val in opts.items():
                writer = writer.option(key, val)
            writer.save()
        return
    except Exception as e:
        if not _connector_missing(e):
            raise

    try:
        import neo4j  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "graph sink needs the Neo4j Spark Connector jar or the neo4j "
            "python driver; neither is available in this environment — use "
            "graph_nodes_*/graph_edges to materialize the graph as tables"
        ) from e

    statements = _bolt_upsert_statements(source_label)
    for name, frame, _opts in plans:  # bolt fallback — same six elements
        cypher = statements[name]

        def upsert(rows, _cypher=cypher) -> None:
            import neo4j as _neo4j

            batch = [row.asDict() for row in rows]
            if not batch:
                return
            driver = _neo4j.GraphDatabase.driver(url, auth=auth)
            try:
                with driver.session() as s:
                    s.run(_cypher, rows=batch)
            finally:
                driver.close()

        frame.foreachPartition(upsert)


# ---------------------------------------------------------------------------
# Z-order layout — multi-column data skipping (the Delta/Iceberg OPTIMIZE
# ZORDER technique, public knowledge). Interleaving the bits of several
# normalized sort keys clusters rows so that EVERY interleaved column gets
# tight per-row-group min/max ranges in the parquet footer; a point or
# range predicate on ANY of them then prunes most row groups, where a
# lexicographic sort only serves its leading column. Pure column
# expressions (shiftright/shiftleft/bit_and) — codegen-able, no UDF.
# ---------------------------------------------------------------------------


def zorder_key(df, cols: list[str], bits: int = 16):
    """Morton (Z-order) key column over ``cols``.

    Each column is min/max-normalized to ``bits`` bits (two tiny aggregates
    collected driver-side — O(len(cols)) scalars, computed in one pass),
    then bit-interleaved. Returns (df_with_ranges, key_column); callers sort
    by the key and write.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_max_{c}") for c in cols],
    ).first()
    scaled = []
    for c in cols:
        lo, hi = stats[f"_min_{c}"], stats[f"_max_{c}"]
        span = (hi - lo) or 1.0
        scaled.append(
            F.least(
                F.lit((1 << bits) - 1),
                ((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * ((1 << bits) - 1))
                .cast("bigint"),
            )
        )
    key = F.lit(0).cast("bigint")
    for b in range(bits):
        for j, s in enumerate(scaled):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(s, b).bitwiseAND(F.lit(1)), b * len(cols) + j)
            )
    return df, key.alias("_zorder")


def write_zordered(
    df, path: str, cols: list[str], n_files: int = 8, bits: int = 16
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    range-partition on the Morton key (so files tile the curve) and sort
    within partitions (so row groups tile it too). Point/range predicates
    on any of ``cols`` then skip most row groups via footer min/max —
    measured in tests/test_zorder.py against the same data written
    unsorted."""
    from pyspark.sql import functions as F

    base, key = zorder_key(df, cols, bits)
    (
        base.withColumn("_zorder", key)
        .repartitionByRange(n_files, F.col("_zorder"))
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .parquet(path)
    )
