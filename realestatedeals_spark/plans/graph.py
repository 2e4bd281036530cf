"""Property-graph construction queries (SURVEY.md §2a.1 S11, §2a.4 J4).

The reference upserts Listing/Agent/Broker nodes and AGENT_OF/BROKERED_BY/
WORKS_FOR edges row-by-row (database_ops.py:11-92). Here graph construction
is set-oriented: nodes/edges are DataFrames (MERGE = distinct), verified via
oracle; the effect-sink itself (io.sinks.write_graph) stays out of the
correctness path exactly as SURVEY.md §7 step 4 prescribes.

Listings-analog mapping: orders plays listings (mls = o_orderkey), agents
and brokers derive deterministically from the customer key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.plans.registry import register
from realestatedeals_spark.util import free_local_checkpoint

_LISTINGS_ANALOG = """
  SELECT CAST(o_orderkey AS VARCHAR) AS mls,
         o_totalprice AS price,
         'Agent ' || CAST(o_custkey % 37 AS VARCHAR) AS agent_name,
         CASE WHEN o_custkey % 13 = 0 THEN ''
              ELSE 'Broker ' || CAST(o_custkey % 11 AS VARCHAR) END AS broker_name
  FROM orders
"""


def _listings_analog(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").cast("string").alias("mls"),
        F.col("o_totalprice").alias("price"),
        F.concat(F.lit("Agent "), (F.col("o_custkey") % 37).cast("string")).alias("agent_name"),
        F.when(F.col("o_custkey") % 13 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("Broker "), (F.col("o_custkey") % 11).cast("string")))
        .alias("broker_name"),
    )


_G_NODES_ORACLE = f"""
WITH listings AS ({_LISTINGS_ANALOG})
SELECT 'Agent' AS label, agent_name AS name, CAST(count(*) AS BIGINT) AS n_listings
FROM listings WHERE trim(agent_name) <> ''
GROUP BY agent_name
UNION ALL
SELECT 'Broker' AS label, broker_name AS name, CAST(count(*) AS BIGINT) AS n_listings
FROM listings WHERE trim(broker_name) <> ''
GROUP BY broker_name
"""


@register("g1_graph_nodes", oracle=_G_NODES_ORACLE, tags=("S11", "graph"))
def g1_graph_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _listings_analog(spark, sf_dir)
    agents = (
        li.filter(F.trim("agent_name") != "")
        .groupBy(F.col("agent_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("n_listings"))
        .select(F.lit("Agent").alias("label"), "name", "n_listings")
    )
    brokers = (
        li.filter(F.trim("broker_name") != "")
        .groupBy(F.col("broker_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("n_listings"))
        .select(F.lit("Broker").alias("label"), "name", "n_listings")
    )
    return agents.unionByName(brokers)


_G_EDGES_ORACLE = f"""
WITH listings AS ({_LISTINGS_ANALOG}),
edges AS (
  SELECT agent_name AS src_key, 'AGENT_OF' AS edge_type, mls AS dst_key
  FROM listings WHERE trim(agent_name) <> ''
  UNION ALL
  SELECT mls, 'BROKERED_BY', broker_name FROM listings WHERE trim(broker_name) <> ''
  UNION ALL
  SELECT DISTINCT agent_name, 'WORKS_FOR', broker_name
  FROM listings WHERE trim(agent_name) <> '' AND trim(broker_name) <> ''
)
SELECT edge_type, CAST(count(*) AS BIGINT) AS n_edges,
       CAST(count(DISTINCT src_key) AS BIGINT) AS n_src,
       CAST(count(DISTINCT dst_key) AS BIGINT) AS n_dst
FROM edges GROUP BY edge_type
"""


@register("g2_graph_edges", oracle=_G_EDGES_ORACLE, tags=("S11", "graph", "J4"))
def g2_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _listings_analog(spark, sf_dir)
    agent_of = li.filter(F.trim("agent_name") != "").select(
        F.col("agent_name").alias("src_key"),
        F.lit("AGENT_OF").alias("edge_type"),
        F.col("mls").alias("dst_key"),
    )
    brokered = li.filter(F.trim("broker_name") != "").select(
        F.col("mls").alias("src_key"),
        F.lit("BROKERED_BY").alias("edge_type"),
        F.col("broker_name").alias("dst_key"),
    )
    works_for = (
        li.filter((F.trim("agent_name") != "") & (F.trim("broker_name") != ""))
        .select(
            F.col("agent_name").alias("src_key"),
            F.lit("WORKS_FOR").alias("edge_type"),
            F.col("broker_name").alias("dst_key"),
        )
        .distinct()
    )
    return (
        agent_of.unionByName(brokered)
        .unionByName(works_for)
        .groupBy("edge_type")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.count_distinct("src_key").alias("n_src"),
            F.count_distinct("dst_key").alias("n_dst"),
        )
    )


# ---------------------------------------------------------------------------
# g3 — PageRank over the customer→supplier order graph (who funds whom):
# edges = distinct (custkey, suppkey) pairs with at least one lineitem.
# Suppliers have no out-edges, so the dangling-mass redistribution path is
# genuinely exercised. Rows-only: fixed-point float iteration is not
# SQL-expressible; tests/test_pagerank.py pins every rank against a numpy
# power-iteration reference at ~1e-9 and total mass at 1.
# ---------------------------------------------------------------------------


@register("g3_pagerank", tags=("graph", "iterative"))
def g3_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 PageRank nodes of the customer→supplier purchase graph."""
    from realestatedeals_spark.operators.pagerank import pagerank

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(edges, iters=10)
    return ranks.orderBy(F.desc("rank"), F.asc("node")).limit(100)


# ---------------------------------------------------------------------------
# g3b — deterministic INTEGER PageRank companion (round 9): the same
# customer→supplier graph and the same join/agg machinery as g3, but every
# step in exact int64 arithmetic (contribution = r div out_deg, damping
# update with floors) so DuckDB recomputes the 3-iteration fixpoint
# hash-exactly — PageRank's distributed half is now oracled; only g3's
# float accumulation stays rows-only (numpy parity in tests/test_pagerank).
# Node ids: custkey as-is, suppkey offset by 10^6 (disjoint integer spaces).
# ---------------------------------------------------------------------------

_G3B_SCALE = 1_000_000_000_000


def _g3b_iter_sql(i: int) -> str:
    prev = f"r{i - 1}"
    return f"""
c{i} AS MATERIALIZED (
  SELECT e.dst AS node, CAST(sum({prev}.r // od.d) AS BIGINT) AS inflow
  FROM e JOIN od USING (src) JOIN {prev} ON {prev}.node = e.src
  GROUP BY e.dst),
dg{i} AS (
  SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dang
  FROM {prev} WHERE node NOT IN (SELECT src FROM od)),
r{i} AS MATERIALIZED (
  SELECT nodes.node,
         CAST((15 * {_G3B_SCALE} // (100 * n))
              + (85 * (coalesce(c{i}.inflow, 0) + dang // n)) // 100
              AS BIGINT) AS r
  FROM nodes CROSS JOIN nn CROSS JOIN dg{i}
  LEFT JOIN c{i} ON c{i}.node = nodes.node)"""


_G3B_ORACLE = (
    f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS src, 1000000 + l.l_suppkey AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT count(*) AS n FROM nodes),
od AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src),
r0 AS MATERIALIZED (
  SELECT node, CAST({_G3B_SCALE} // n AS BIGINT) AS r FROM nodes CROSS JOIN nn),"""
    + ",".join(_g3b_iter_sql(i) for i in (1, 2, 3))
    + """
SELECT CAST(node AS BIGINT) AS node, r AS rank_micros
FROM r3 ORDER BY r DESC, node LIMIT 100
"""
)


@register(
    "g3b_pagerank_micros",
    oracle=_G3B_ORACLE,
    tags=("graph", "iterative", "oracle-companion"),
)
def g3b_pagerank_micros(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 nodes of the 3-iteration integer-micros PageRank over the
    customer→supplier purchase graph — hash-exact against the unrolled
    SQL fixpoint (operators/pagerank.pagerank_micros)."""
    from realestatedeals_spark.operators.pagerank import pagerank_micros

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.lit(1_000_000) + F.col("l_suppkey")).cast("long").alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank_micros(edges, iters=3, scale=_G3B_SCALE)
    return (
        ranks.orderBy(F.desc("r"), F.asc("node"))
        .select("node", F.col("r").alias("rank_micros"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# g4 — triangle counting / clustering coefficient (engine addition) over the
# part co-purchase graph: parts are adjacent iff some order contains both.
# The oracle enumerates triangles with the simple id-orientation (a < b);
# the Spark operator uses degree-ordered orientation (Suri & Vassilvitskii,
# WWW 2011) — both enumerate each triangle exactly once, so the per-node
# counts agree while the Spark plan's wedge work stays O(√m) per node.
# ---------------------------------------------------------------------------

_G4_TRIANGLES_ORACLE = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
pern AS (
  SELECT node, count(*) AS triangles FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri)
  GROUP BY node),
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY node)
SELECT d.node AS partkey,
       CAST(d.degree AS BIGINT) AS degree,
       CAST(coalesce(p.triangles, 0) AS BIGINT) AS triangles,
       CASE WHEN d.degree >= 2
            THEN CAST(2 * coalesce(p.triangles, 0) AS DOUBLE)
                 / (d.degree * (d.degree - 1))
            ELSE 0.0 END AS clustering_coeff
FROM deg d LEFT JOIN pern p ON d.node = p.node
"""


@register("g4_triangle_count", oracle=_G4_TRIANGLES_ORACLE, tags=("graph", "triangles"), bench=True)
def g4_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle count + local clustering coefficient on the
    co-purchase graph (edges = part pairs sharing an order). The edge build
    is an order-keyed self-join (shuffle bounded by Σ items-per-order²,
    i.e. basket-size-quadratic, not catalog-quadratic); the count itself is
    the degree-oriented wedge join — see operators/triangles.py for the
    O(√m) outdeg bound that survives skewed catalogs."""
    from realestatedeals_spark.operators.triangles import node_triangles, undirected_edges

    # spread (round 12): the basket-quadratic pair expansion is CPU-bound
    # and the planner broadcast-joins at this size, so the whole
    # enumerate+filter+partial-distinct stage otherwise runs on the
    # fixture scan's ONE split (measured 2.13 → 1.13 s for the edge
    # build). The exchange carries only (orderkey, partkey); at broadcast-
    # breaking scale it IS the orderkey exchange an SMJ needs — and both
    # self-join aliases read the same repartitioned frame, so it is built
    # once (ReusedExchange), not per side.
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .repartition(spark.sparkContext.defaultParallelism, "l_orderkey")
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
    )
    edges = undirected_edges(pairs, "pa", "pb")
    return node_triangles(edges).withColumnRenamed("node", "partkey")


# DuckDB CAN oracle iterated deletion (round 9): its recursive CTEs allow
# multiple references to the working table plus aggregation in the recursive
# term, so one peel round is "keep edges whose both endpoints have degree>=k
# in the previous iteration's edge set", guarded by EXISTS(weak node) for
# termination. The recursion stops in exactly two states: (a) fixpoint (no
# weak node → recursive term emits nothing) or (b) the kept set went empty.
# In BOTH cases one extra keep-filter applied to the max(it) snapshot yields
# the true k-core — if fixpoint, keep(S)=S; if empty-stop, keep(S)=∅ — so
# core{k} below is exact without knowing which way the recursion ended.
# Chaining the k=2,3,4 peels needs MATERIALIZED on the intermediate cores:
# un-materialized, each of the five working-table references in peel{k+1}
# re-expands the entire peel{k} recursion per iteration (measured hang).
# Validated against the pure-Python reference decomposition on 25 random
# graphs + chain/clique/star adversarial shapes before registration.

_G5_PEEL_CTE = """
peel{k}(a, b, it) AS (
    SELECT a, b, 0 FROM {src}
  UNION ALL
    SELECT p.a, p.b, p.it + 1
    FROM peel{k} p
    JOIN (SELECT node FROM (SELECT a AS node FROM peel{k} UNION ALL SELECT b FROM peel{k})
          GROUP BY node HAVING count(*) >= {k}) ka ON p.a = ka.node
    JOIN (SELECT node FROM (SELECT a AS node FROM peel{k} UNION ALL SELECT b FROM peel{k})
          GROUP BY node HAVING count(*) >= {k}) kb ON p.b = kb.node
    WHERE EXISTS (SELECT 1 FROM (SELECT a AS node FROM peel{k} UNION ALL SELECT b FROM peel{k})
                  GROUP BY node HAVING count(*) < {k})
),
last{k} AS MATERIALIZED (SELECT a, b FROM peel{k} WHERE it = (SELECT max(it) FROM peel{k})),
core{k} AS MATERIALIZED (
    SELECT l.a, l.b FROM last{k} l
    JOIN (SELECT node FROM (SELECT a AS node FROM last{k} UNION ALL SELECT b FROM last{k})
          GROUP BY node HAVING count(*) >= {k}) ka ON l.a = ka.node
    JOIN (SELECT node FROM (SELECT a AS node FROM last{k} UNION ALL SELECT b FROM last{k})
          GROUP BY node HAVING count(*) >= {k}) kb ON l.b = kb.node
)"""

_G5_KCORE_ORACLE = (
    """
WITH RECURSIVE e0 AS MATERIALIZED (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= 2),"""
    + ",".join(
        _G5_PEEL_CTE.format(k=k, src=src)
        for k, src in ((2, "e0"), (3, "core2"), (4, "core3"))
    )
    + """,
n0 AS (SELECT DISTINCT node FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)),
n2 AS (SELECT DISTINCT node FROM (SELECT a AS node FROM core2 UNION ALL SELECT b FROM core2)),
n3 AS (SELECT DISTINCT node FROM (SELECT a AS node FROM core3 UNION ALL SELECT b FROM core3)),
n4 AS (SELECT DISTINCT node FROM (SELECT a AS node FROM core4 UNION ALL SELECT b FROM core4)),
coreness AS (
  SELECT node, 1 AS coreness FROM n0 WHERE node NOT IN (SELECT node FROM n2)
  UNION ALL SELECT node, 2 FROM n2 WHERE node NOT IN (SELECT node FROM n3)
  UNION ALL SELECT node, 3 FROM n3 WHERE node NOT IN (SELECT node FROM n4)
  UNION ALL SELECT node, 4 FROM n4
)
SELECT CAST(coreness AS INT) AS coreness, count(*) AS n_parts
FROM coreness GROUP BY coreness
"""
)


@register("g5_kcore_parts", oracle=_G5_KCORE_ORACLE, tags=("graph", "kcore"))
def g5_kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coreness histogram of the support-thresholded part co-purchase graph
    (edges = part pairs co-purchased in >= 2 orders), peeling capped at
    max_k=4: how much of the catalog sits in each density shell. The
    histogram form is density-robust — fixed-k membership collapses to
    empty near the critical k (measured: the 3-core holds 1055/2000 parts
    at sf0.01 but vanishes at sf0.1 where support-2 edges thin out), while
    shell counts stay informative at every SF. Iterated peeling — degree
    aggregate + anti-join per round, lineage truncated per round, phase
    count bounded by max_k (operators/kcore.py). Oracled hash-exact since
    round 9: the peel-to-fixpoint replays as a DuckDB recursive CTE per k
    (see _G5_PEEL_CTE — multi-reference recursive terms make iterated
    deletion expressible after all); tests/test_kcore.py additionally pins
    the operator against a pure-Python reference decomposition on random
    graphs, planted cliques, AND this exact fixture graph."""
    from realestatedeals_spark.operators.kcore import core_numbers

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b"))
    )
    support = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("a", "b")
    )
    return (
        core_numbers(support, max_k=4)
        .groupBy("coreness")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# g6 — multi-source BFS hop distance (round 7): "distance to the nearest
# seed" over the undirected customer↔supplier purchase graph — the
# propagation primitive behind contamination tracing and influence radius.
# Spark side: frontier-expansion loop (join frontier→edges, anti-join the
# settled set, one localCheckpoint per hop to cut lineage) — each hop is
# one join whose input is the FRONTIER, never the full graph. The oracle
# replays it as a recursive CTE with UNION dedup + final min(d): first
# BFS layer to reach a node IS its min distance, so both sides agree
# hash-exactly. Hop cap keeps both sides bounded (diameter of this
# bipartite graph is tiny; unreached nodes are simply absent).
# ---------------------------------------------------------------------------

_G6_BFS_ORACLE = """
WITH RECURSIVE base AS (
  SELECT DISTINCT 'c:' || CAST(o.o_custkey AS VARCHAR) AS cu,
         's:' || CAST(l.l_suppkey AS VARCHAR) AS su
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
e AS (SELECT cu AS src, su AS dst FROM base
      UNION ALL SELECT su, cu FROM base),
seeds AS (SELECT DISTINCT 'c:' || CAST(c_custkey AS VARCHAR) AS node
          FROM customer WHERE c_custkey % 100 = 1),
bfs(node, d) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, b.d + 1 FROM bfs b JOIN e ON e.src = b.node WHERE b.d < 6)
SELECT node, CAST(min(d) AS BIGINT) AS dist FROM bfs GROUP BY node
"""


@register("g6_bfs_hops", oracle=_G6_BFS_ORACLE, tags=("graph", "iterative", "bfs"))
def g6_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    base = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("cu"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("su"),
        )
        .distinct()
    )
    # materialize once: every hop joins against edges, and recomputing the
    # orders⋈lineitem derivation per hop would re-scan the fact tables
    # max_hops times at 100 TB
    edges = (
        base.select(F.col("cu").alias("src"), F.col("su").alias("dst"))
        .unionByName(base.select(F.col("su").alias("src"), F.col("cu").alias("dst")))
        .localCheckpoint(eager=True)
    )
    dist = (
        cust.filter(F.col("c_custkey") % 100 == 1)
        .select(F.concat(F.lit("c:"), F.col("c_custkey")).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = dist.select("node")
    # per-hop storage release (pagerank discipline): once the widened dist
    # checkpoint materializes the previous one is dead, and once the NEXT
    # hop's frontier join materializes the previous nxt is too
    prev_nxt = None
    for k in range(1, 7):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "anti")
            .withColumn("dist", F.lit(k).cast("long"))
            .localCheckpoint(eager=True)
        )
        if prev_nxt is not None:
            free_local_checkpoint(prev_nxt)
        if nxt.isEmpty():
            free_local_checkpoint(nxt)
            break
        new_dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        free_local_checkpoint(dist)
        dist = new_dist
        frontier = nxt.select("node")
        prev_nxt = nxt
    if prev_nxt is not None:
        free_local_checkpoint(prev_nxt)  # folded into dist; re-free is a no-op
    free_local_checkpoint(edges)  # dist is self-contained (checkpointed)
    return dist


# ---------------------------------------------------------------------------
# g7 — weighted shortest paths (round 7): hop-capped Bellman-Ford over
# the customer↔supplier graph with integer edge weights, the weighted
# generalization of g6's BFS. Weights are coarse (min lineitem quantity
# mod 3, +1 ∈ {1,2,3}) which is what keeps the ORACLE bounded: the
# recursive CTE enumerates (node, cost) states and coarse weights make
# path costs collide heavily, so the state space stays O(nodes × max_d)
# instead of exploding with distinct sums. Semantically both sides
# compute min path cost over all paths of ≤3 edges — a genuinely
# weighted relaxation (a 2-edge path can beat a 1-edge path of weight
# 3). Spark side is round-synchronous Bellman-Ford: each round joins the
# CURRENT dist table to the edge list and folds with a groupBy-min —
# three shuffle rounds total, lineage cut per round; at 100 TB this is
# the standard Pregel-on-DataFrames formulation (state co-partitioned
# with edges on the join key).
# ---------------------------------------------------------------------------

_G7_WEIGHTED_ORACLE = """
WITH RECURSIVE base AS (
  SELECT 'c:' || CAST(o.o_custkey AS VARCHAR) AS cu,
         's:' || CAST(l.l_suppkey AS VARCHAR) AS su,
         CAST(min(l.l_quantity) % 3 + 1 AS BIGINT) AS w
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2),
e AS (SELECT cu AS src, su AS dst, w FROM base
      UNION ALL SELECT su, cu, w FROM base),
seeds AS (SELECT DISTINCT 'c:' || CAST(c_custkey AS VARCHAR) AS node
          FROM customer WHERE c_custkey % 100 = 1),
walk(node, d, hops) AS (
  SELECT node, CAST(0 AS BIGINT), 0 FROM seeds
  UNION
  SELECT e.dst, p.d + e.w, p.hops + 1
  FROM walk p JOIN e ON e.src = p.node WHERE p.hops < 3)
SELECT node, CAST(min(d) AS BIGINT) AS dist FROM walk GROUP BY node
"""


@register("g7_weighted_paths", oracle=_G7_WEIGHTED_ORACLE, tags=("graph", "iterative", "weighted"))
def g7_weighted_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    base = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("cu"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("su"),
        )
        .agg((F.min("l_quantity").cast("long") % 3 + 1).alias("w"))
    )
    edges = (
        base.select(F.col("cu").alias("src"), F.col("su").alias("dst"), "w")
        .unionByName(base.select(F.col("su").alias("src"), F.col("cu").alias("dst"), "w"))
        .localCheckpoint(eager=True)
    )
    dist = (
        cust.filter(F.col("c_custkey") % 100 == 1)
        .select(F.concat(F.lit("c:"), F.col("c_custkey")).alias("node"))
        .distinct()
        .withColumn("d", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    for _ in range(3):  # ≤3-edge relaxation, matching the oracle's hop cap
        cand = (
            dist.join(edges, dist.node == edges.src)
            .select(F.col("dst").alias("node"), (F.col("d") + F.col("w")).alias("d"))
        )
        new_dist = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=True)
        )
        free_local_checkpoint(dist)  # relaxed frame materialized; prev dead
        dist = new_dist
    free_local_checkpoint(edges)  # dist is self-contained (checkpointed)
    return dist.select("node", F.col("d").alias("dist"))


# ---------------------------------------------------------------------------
# g8 — strongly connected components of the nation-level trade digraph
# (edge u -> v when customers of nation u bought from suppliers of nation
# v at least total/400 times — a data-relative threshold, so the graph
# keeps its shape as the corpus scales). Engine: parallel FW-BW
# decomposition (operators/scc.py) — min-id pivots, simultaneous
# forward/backward BFS per partition, three-way split, O(log n) expected
# rounds of keyed equi-joins. Oracle: recursive-CTE transitive closure +
# mutual-reach min (fine at oracle scale, O(V·E) at any scale — which is
# exactly why the engine runs FW-BW instead).
# ---------------------------------------------------------------------------

_G8_ORACLE = """
WITH RECURSIVE
-- MATERIALIZED pins the join order: on stats-less parquet views DuckDB's
-- reorderer can pull the c_nationkey <> s_nationkey inequality forward
-- into an early customer x supplier quasi-cross-join (1.4B rows at gen
-- sf1.0, unbounded spill). Reducing each side to its nation key via the
-- equi-joins FIRST keeps every intermediate linear in lineitem.
onat AS MATERIALIZED (
  SELECT o.o_orderkey, c.c_nationkey AS u
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
lnat AS MATERIALIZED (
  SELECT l.l_orderkey, s.s_nationkey AS v
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey),
pair AS MATERIALIZED (
  SELECT u, v, count(*) AS n
  FROM onat JOIN lnat ON lnat.l_orderkey = onat.o_orderkey
  WHERE u <> v
  GROUP BY 1, 2),
tot AS (SELECT sum(n) AS total FROM pair),
edges AS (SELECT u, v FROM pair, tot WHERE n >= total // 400),
fwd(a, b) AS (
  SELECT u, v FROM edges
  UNION
  SELECT f.a, e.v FROM fwd f JOIN edges e ON f.b = e.u),
mutual AS (SELECT f.a, f.b FROM fwd f JOIN fwd g ON g.a = f.b AND g.b = f.a),
nodes AS (SELECT DISTINCT u AS node FROM edges UNION SELECT DISTINCT v FROM edges),
scc AS (
  SELECT n.node,
         least(n.node, coalesce(min(m.b), n.node)) AS scc_id
  FROM nodes n LEFT JOIN mutual m ON m.a = n.node
  GROUP BY n.node)
SELECT CAST(node AS BIGINT) AS node,
       CAST(scc_id AS BIGINT) AS scc_id,
       CAST(count(*) OVER (PARTITION BY scc_id) AS BIGINT) AS scc_size
FROM scc
"""


@register("g8_scc_trade", oracle=_G8_ORACLE, tags=("graph", "scc"))
def g8_scc_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realestatedeals_spark.operators.scc import scc_fwbw

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    pair = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").cast("long").alias("u"),
            F.col("s_nationkey").cast("long").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window as W

    pair = pair.withColumn("total", F.sum("n").over(W.partitionBy()))
    edges = pair.filter(F.col("n") >= F.expr("total div 400")).select("u", "v")
    scc = scc_fwbw(edges)
    return scc.withColumn(
        "scc_size", F.count(F.lit(1)).over(W.partitionBy("scc_id")).cast("long")
    )


# ---------------------------------------------------------------------------
# G9 — native recursive CTE (round 7): Spark 4 ships WITH RECURSIVE
# (SPARK-24497), so hierarchy walks that every prior query expressed as
# driver-coordinated iteration (g6 BFS, g7 Bellman-Ford) can now run as ONE
# declarative statement the engine iterates internally. This query
# demonstrates that path on a bill-of-materials-style forest synthesized
# from the part table: part k is a component of assembly floor(k/10), so
# parts 1-9 are root assemblies and the tree is ~log10(max key) deep —
# bounded recursion at any corpus scale (7 levels at 100 TB key ranges,
# far under spark.sql.cteRecursionLevelLimit's default 100). Each
# recursion step is a keyed shuffle join of the (pruned) part scan against
# the frontier — the same per-level cost shape as the hand-rolled BFS, but
# planned and re-optimized by Catalyst.
#
# The oracle is the IDENTICAL statement run by DuckDB: the SQL stays inside
# the ANSI subset both engines parse, so the check is engine-vs-engine on
# the same declarative spec — hash-exact.
# ---------------------------------------------------------------------------

_G9_RECURSIVE_SQL = """
WITH RECURSIVE bom AS (
  SELECT p_partkey AS part_key, p_partkey AS root_key, 0 AS depth,
         p_retailprice AS price
  FROM part WHERE p_partkey < 10
  UNION ALL
  SELECT c.p_partkey, bom.root_key, bom.depth + 1, c.p_retailprice
  FROM part c JOIN bom ON CAST(FLOOR(c.p_partkey / 10) AS BIGINT) = bom.part_key
  WHERE c.p_partkey >= 10
)
SELECT root_key, depth,
       COUNT(*) AS n_parts,
       CAST(SUM(CAST(price * 100 AS BIGINT)) AS BIGINT) AS subtree_cents
FROM bom
GROUP BY root_key, depth
"""


@register("g9_bom_recursive", oracle=_G9_RECURSIVE_SQL, tags=("graph", "recursive", "sql"))
def g9_bom_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials rollup via a NATIVE recursive CTE — per root
    assembly and depth, the component count and integer-cents price sum
    (exact under distributed aggregation). Same SQL text as the oracle."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_G9_RECURSIVE_SQL)
