"""Reference full-cycle composite: one lazy plan for the whole poll loop.

The reference's ``main()`` runs scrape → CDC classify → Neo4j upsert →
agent dedup as four eager, serialized stages with materialization barriers
between them (main.py:107-142, agent_manager.py:34's CSV round-trip). Here
the ENTIRE cycle's outputs reduce to one summary DataFrame built from one
lazy plan — every stage stays declarative, Catalyst sees the whole graph,
and nothing materializes until the single action. Output: one row per
(stage, key) count covering the CDC status mix, the property-graph node and
edge populations, and the deduped-agent yield — the numbers the reference
prints per cycle (main.py:111,136), computed engine-side.

Composes the ALREADY-ORACLED stage builders (reference_core._cdc_frames,
graph._listings_analog, reference_core._agent_frames + the J2/A1 pipeline)
— this query certifies their composition, the per-stage queries certify the
details.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestatedeals_spark.operators.agents import agent_dedup_pipeline
from realestatedeals_spark.plans.registry import register
from realestatedeals_spark.session import apply_session_conf

_FULL_CYCLE_ORACLE = """
WITH scraped AS (
  SELECT o_orderkey AS mls, o_totalprice AS new_price
  FROM orders WHERE o_orderkey % 11 <> 0
),
snapshot AS (
  SELECT o_orderkey AS mls,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000.0 ELSE o_totalprice END AS old_price
  FROM orders WHERE o_orderkey % 5 <> 0
),
cdc AS (
  SELECT CASE WHEN old_price IS NULL THEN 'new_listing'
              WHEN new_price IS NULL THEN 'off_market'
              WHEN new_price <> old_price THEN 'price_change'
              ELSE 'unchanged' END AS status
  FROM scraped s FULL OUTER JOIN snapshot p ON s.mls = p.mls
),
listings AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS mls,
         'Agent ' || CAST(o_custkey % 37 AS VARCHAR) AS agent_name,
         CASE WHEN o_custkey % 13 = 0 THEN ''
              ELSE 'Broker ' || CAST(o_custkey % 11 AS VARCHAR) END AS broker_name
  FROM orders
),
agents_src AS (
  SELECT 'AGENT' || CAST(c_custkey % 37 AS VARCHAR) AS first_name,
         n_name AS last_name,
         CASE WHEN c_custkey % 13 = 0 THEN ''
              ELSE '(801) 555-' || lpad(CAST((c_custkey % 37) * 271 % 10000 AS VARCHAR), 4, '0')
         END AS phone
  FROM customer JOIN nation ON c_nationkey = n_nationkey
),
contacts AS (
  SELECT DISTINCT 'AGENT' || CAST(s_suppkey % 37 AS VARCHAR) AS first_name,
         n_name AS last_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
),
unique_agents AS (
  SELECT DISTINCT a.first_name, a.last_name, a.phone
  FROM agents_src a
  WHERE trim(a.phone) <> ''
    AND NOT EXISTS (SELECT 1 FROM contacts c
                    WHERE c.first_name = a.first_name AND c.last_name = a.last_name)
)
SELECT 'cdc' AS stage, status AS key, CAST(count(*) AS BIGINT) AS n
FROM cdc GROUP BY status
UNION ALL
SELECT 'graph_nodes', 'Agent', CAST(count(DISTINCT agent_name) AS BIGINT)
FROM listings WHERE trim(agent_name) <> ''
UNION ALL
SELECT 'graph_nodes', 'Broker', CAST(count(DISTINCT broker_name) AS BIGINT)
FROM listings WHERE trim(broker_name) <> ''
UNION ALL
SELECT 'graph_edges', 'AGENT_OF', CAST(count(*) AS BIGINT)
FROM listings WHERE trim(agent_name) <> ''
UNION ALL
SELECT 'graph_edges', 'BROKERED_BY', CAST(count(*) AS BIGINT)
FROM listings WHERE trim(broker_name) <> ''
UNION ALL
SELECT 'graph_edges', 'WORKS_FOR',
       CAST(count(DISTINCT agent_name || '|' || broker_name) AS BIGINT)
FROM listings WHERE trim(agent_name) <> '' AND trim(broker_name) <> ''
UNION ALL
SELECT 'agents', 'unique_agents', CAST(count(*) AS BIGINT) FROM unique_agents
"""


def _stage(stage: str, key_col: F.Column, n_col: F.Column) -> list[F.Column]:
    return [F.lit(stage).alias("stage"), key_col.alias("key"), n_col.alias("n")]


@register("flagship_full_cycle", oracle=_FULL_CYCLE_ORACLE, tags=("composite", "reference"))
def flagship_full_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realestatedeals_spark.operators.cdc import classify_cdc
    from realestatedeals_spark.plans.graph import _listings_analog
    from realestatedeals_spark.plans.reference_core import _agent_frames, _cdc_frames

    apply_session_conf(spark)

    scraped, snapshot = _cdc_frames(spark, sf_dir)
    cdc = classify_cdc(scraped, snapshot, keep_unchanged=True)
    cdc_counts = cdc.groupBy("status").agg(F.count(F.lit(1)).alias("n")).select(
        *_stage("cdc", F.col("status"), F.col("n"))
    )

    li = _listings_analog(spark, sf_dir)
    has_agent = F.trim("agent_name") != ""
    has_broker = F.trim("broker_name") != ""
    nodes = li.agg(
        F.count_distinct(F.when(has_agent, F.col("agent_name"))).alias("agents"),
        F.count_distinct(F.when(has_broker, F.col("broker_name"))).alias("brokers"),
        F.sum(has_agent.cast("long")).alias("agent_of"),
        F.sum(has_broker.cast("long")).alias("brokered_by"),
        F.count_distinct(
            F.when(has_agent & has_broker, F.concat("agent_name", F.lit("|"), "broker_name"))
        ).alias("works_for"),
    )
    graph_counts = nodes.select(
        F.explode(
            F.array(
                F.struct(F.lit("graph_nodes").alias("stage"), F.lit("Agent").alias("key"), F.col("agents").alias("n")),
                F.struct(F.lit("graph_nodes").alias("stage"), F.lit("Broker").alias("key"), F.col("brokers").alias("n")),
                F.struct(F.lit("graph_edges").alias("stage"), F.lit("AGENT_OF").alias("key"), F.col("agent_of").alias("n")),
                F.struct(F.lit("graph_edges").alias("stage"), F.lit("BROKERED_BY").alias("key"), F.col("brokered_by").alias("n")),
                F.struct(F.lit("graph_edges").alias("stage"), F.lit("WORKS_FOR").alias("key"), F.col("works_for").alias("n")),
            )
        ).alias("s")
    ).select("s.stage", "s.key", "s.n")

    listings, contacts = _agent_frames(spark, sf_dir)
    agents = agent_dedup_pipeline(listings, contacts)
    agent_counts = agents.agg(F.count(F.lit(1)).alias("n")).select(
        *_stage("agents", F.lit("unique_agents"), F.col("n"))
    )

    return cdc_counts.unionByName(graph_counts).unionByName(agent_counts)
