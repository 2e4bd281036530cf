"""OLAP aggregation/join queries (TPC-H-shaped) on the driver star schema.

The reference has no numeric aggregation beyond counters (SURVEY.md §2a.5);
these queries are the engine's analytic surface and the bench headline set.

Float discipline: double sums are order-dependent across engines, so every
SUM routes through an exact decimal accumulator and casts back to double —
bit-identical regardless of partitioning, and cheap (decimal add is JVM-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.plans.registry import register
from realestatedeals_spark.session import apply_session_conf


def _dsum(col: F.Column, scale: int = 4) -> F.Column:
    """Order-independent double sum: accumulate as decimal, emit double."""
    return F.sum(col.cast(f"decimal(25,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# Q1 — pricing summary: scan-heavy groupBy with 8 aggregates.
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_disc_price,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def _micros6(col: F.Column) -> F.Column:
    """round-to-nearest(x·1e6) as BIGINT — engine-portable exact accumulation
    unit for 6-decimal money products (see sum_charge comment in tpch_q1).

    Spelled ``floor(x·1e6 + 0.5)`` on BOTH engines: floor and + are
    IEEE-exact, so the op sequence is bit-identical, and half-up nearest is
    unbiased where plain floor carried a systematic downward drift whenever
    the double product landed 1 ulp below its true integer micros (ADVICE
    round 5). Per-row micros stay far below 2^52, so the +0.5 is never
    absorbed."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)).cast("long")


@register("tpch_q1_pricing_summary", oracle=_Q1_ORACLE, tags=("agg", "bench"), bench=True)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            # the two product sums accumulate as INTEGER micros, not
            # DECIMAL(25,6): at sf1.0 the total × 1e6 exceeds 2^53 and
            # DuckDB's decimal→double cast rounds twice (int128→double,
            # then /10^scale) where Spark's rounds once — a 1-ulp split the
            # gen-sf1.0 sweep caught. floor-micros → BIGINT sum → double →
            # /1e6 is the identical op sequence on both engines at any SF.
            (
                F.sum(_micros6(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                .cast("double") / F.lit(1000000.0)
            ).alias("sum_disc_price"),
            (
                F.sum(_micros6(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                )).cast("double") / F.lit(1000000.0)
            ).alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / cnt).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / cnt).alias("avg_price"),
            (_dsum(F.col("l_discount"), 6) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q3-shaped — shipping priority: 3-way join + filter + grouped revenue + top-k.
# customer ⋈ orders ⋈ lineitem; SF-scaling sides carry no broadcast hint —
# Catalyst stats broadcast them at small SF, AQE decides at cluster scale.
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
  AND CAST(l_shipdate AS DATE) > DATE '1996-03-15'
GROUP BY l_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("tpch_q3_shipping_priority", oracle=_Q3_ORACLE, tags=("join", "agg", "topk"), bench=True)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit("1998-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit("1996-03-15").cast("date")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)")
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q5-shaped — local supplier volume: 5-way join with two broadcast dims and a
# region filter, grouped by nation.
# ---------------------------------------------------------------------------

_Q5_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
GROUP BY n_name
"""


@register("tpch_q5_local_supplier_volume", oracle=_Q5_ORACLE, tags=("join", "agg"), bench=True)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey))
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q4-shaped — EXISTS / left-semi join: orders that have at least one heavy
# lineitem, counted by priority.
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)
GROUP BY o_orderpriority
"""


@register("tpch_q4_exists_semi_join", oracle=_Q4_ORACLE, tags=("join", "semi"))
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    heavy = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45.0)
    return (
        orders.join(heavy, orders.o_orderkey == heavy.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q6-shaped — single-pass filtered aggregate (revenue forecast).
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0
"""


@register("tpch_q6_forecast_revenue", oracle=_Q6_ORACLE, tags=("agg",))
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_discount").between(0.05, 0.07) & (F.col("l_quantity") < 24.0))
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q10-shaped — returned-item losses per customer, top 20 by revenue.
# ---------------------------------------------------------------------------

_Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("tpch_q10_returned_items", oracle=_Q10_ORACLE, tags=("join", "agg", "topk"), bench=True)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)"))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12-shaped — CASE-conditional aggregation over a join.
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey AND l_quantity >= 30.0
GROUP BY l_linestatus
"""


@register("tpch_q12_priority_shipping", oracle=_Q12_ORACLE, tags=("agg", "case"))
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 30.0)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q14-shaped — promo revenue share: conditional sum ratio over a part join.
# ---------------------------------------------------------------------------

_Q14_ORACLE = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))
                        ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem, part
WHERE l_partkey = p_partkey
"""


@register("tpch_q14_promo_share", oracle=_Q14_ORACLE, tags=("agg", "case"))
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)")
    zero = F.lit(0).cast("decimal(25,6)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q16-shaped — distinct-count with an anti-join exclusion list.
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p_brand, p_type, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND p_size IN (5, 10, 15, 20)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500.0)
GROUP BY p_brand, p_type
"""


@register("tpch_q16_supplier_cnt", oracle=_Q16_ORACLE, tags=("agg", "distinct", "anti"))
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size").isin(5, 10, 15, 20))
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 500.0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad, on="l_suppkey", how="left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q18-shaped — HAVING via post-aggregation filter + semi join back.
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(25,4))) > 150.0
)
SELECT c_name, o_orderkey, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, o_orderkey, o_totalprice
"""


@register("tpch_q18_large_orders", oracle=_Q18_ORACLE, tags=("agg", "having", "semi"))
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,4)")).alias("q"))
        .filter(F.col("q") > 150.0)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "o_orderkey"),
                li.l_orderkey == F.col("o_orderkey"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
    )


# ---------------------------------------------------------------------------
# Q19-shaped — disjunctive multi-clause join predicate (OR of ANDs).
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND ((p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 5 AND 20)
    OR (p_brand = 'Brand#19' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 15 AND 35)
    OR (p_type = 'PROMO' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 25 AND 50))
"""


@register("tpch_q19_disjunctive_join", oracle=_Q19_ORACLE, tags=("join", "predicate"))
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 10) & q.between(5, 20))
        | ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(5, 20) & q.between(15, 35))
        | ((F.col("p_type") == "PROMO") & F.col("p_size").between(10, 30) & q.between(25, 50))
    )
    return joined.filter(cond).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# ROLLUP with grouping() — subtotal/grand-total rows.
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,4))) AS DOUBLE) AS total_price,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register("olap_rollup_orders", oracle=_ROLLUP_ORACLE, tags=("rollup", "agg"))
def olap_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            _dsum(F.col("o_totalprice")).alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("o_orderpriority"),
            "total_price",
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# CUBE — all grouping-set combinations.
# ---------------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("olap_cube_lineitem", oracle=_CUBE_ORACLE, tags=("cube", "agg"))
def olap_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(_dsum(F.col("l_quantity")).alias("sum_qty"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("l_returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("l_linestatus"),
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# PIVOT — order counts by status per priority (Spark .pivot vs conditional
# aggregation in the oracle; same plan shape after Catalyst lowering).
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
FROM orders
GROUP BY o_orderpriority
"""


@register("olap_pivot_status", oracle=_PIVOT_ORACLE, tags=("pivot",))
def olap_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("F", "O", "P")],
    )


# ---------------------------------------------------------------------------
# Window ranking — top-3 orders per customer with rank + lag delta.
# ---------------------------------------------------------------------------

_WINDOW_ORACLE = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         rank() OVER w AS rk,
         row_number() OVER w AS rn,
         o_totalprice - lag(o_totalprice) OVER w AS delta_from_prev
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
)
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk,
       CAST(rn AS INTEGER) AS rn, delta_from_prev
FROM ranked WHERE rn <= 3
"""


@register("olap_window_topk_per_group", oracle=_WINDOW_ORACLE, tags=("window", "topk"))
def olap_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).alias("rk"),
            F.row_number().over(w).alias("rn"),
            (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("delta_from_prev"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# Set operations — union of heterogeneous frames (the reference's URE+Trulia
# merge, SURVEY.md §2a.5 note) plus intersect/except on keys.
# ---------------------------------------------------------------------------

_UNION_ORACLE = """
SELECT c_name AS name, c_acctbal AS acctbal, c_mktsegment AS segment, 'customer' AS side
FROM customer
UNION ALL
SELECT s_name AS name, s_acctbal AS acctbal, CAST(NULL AS VARCHAR) AS segment, 'supplier' AS side
FROM supplier
"""


@register("setop_union_heterogeneous", oracle=_UNION_ORACLE, tags=("union",))
def setop_union_heterogeneous(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("customer").alias("side"),
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("side"),
    )
    return cust.unionByName(sup, allowMissingColumns=True)


_INTERSECT_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


@register("setop_intersect_keys", oracle=_INTERSECT_ORACLE, tags=("intersect",))
def setop_intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o)


_INTERSECT_ALL_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


@register("setop_intersect_all_keys", oracle=_INTERSECT_ALL_ORACLE, tags=("intersect", "bag-semantics"))
def setop_intersect_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — min multiplicity per key survives),
    completing the set-op surface alongside EXCEPT ALL."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersectAll(o)


_SKYLINE_ORACLE = """
SELECT p1.p_partkey, p1.p_retailprice, p1.p_size
FROM part p1
WHERE NOT EXISTS (
  SELECT 1 FROM part p2
  WHERE p2.p_retailprice <= p1.p_retailprice
    AND p2.p_size >= p1.p_size
    AND (p2.p_retailprice < p1.p_retailprice OR p2.p_size > p1.p_size)
)
"""


@register("olap_skyline_2d", oracle=_SKYLINE_ORACLE, tags=("skyline", "pareto"))
def olap_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not dominated on
    (minimize p_retailprice, maximize p_size).

    The oracle is the textbook O(N^2) NOT EXISTS; the engine computes the
    same set in O(N log N): collapse to one row per distinct price
    (group-by max size), take the running max of size over strictly
    smaller prices (a window over the tiny distinct-price frame), then
    join back and keep rows beaten by neither a cheaper-or-equal larger
    part nor an equal-price strictly-larger one. Ties on both axes are
    mutually non-dominating, so exact duplicates all survive — matching
    the NOT EXISTS semantics bit-for-bit. Scale shape: one groupBy
    shuffle on price plus a broadcast join of the distinct-price frame;
    no cross product at any size.
    """
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    grp = part.groupBy("p_retailprice").agg(F.max("p_size").alias("gmax"))
    w = W.orderBy("p_retailprice").rowsBetween(W.unboundedPreceding, -1)
    grp = grp.withColumn("prevmax", F.max("gmax").over(w))
    out = part.join(F.broadcast(grp), "p_retailprice")
    dominated = (F.col("prevmax").isNotNull() & (F.col("prevmax") >= F.col("p_size"))) | (
        F.col("gmax") > F.col("p_size")
    )
    return out.filter(~dominated).select("p_partkey", "p_retailprice", "p_size")


# ---------------------------------------------------------------------------
# TPC-H refresh functions (RF1 insert / RF2 delete, TPC-H spec §2.27-2.28)
# against the lakehouse layer: the benchmark's maintenance half that pure
# query suites skip. Lineitem is committed to a VersionedTable, RF2
# deletes one order-key slice, RF1 inserts a re-keyed slice (orderkey +
# 10M — guaranteed-new keys, same measures), and Q1's pricing summary
# runs over the refreshed snapshot. The oracle states the refreshed
# multiset directly, so a hash match proves the DML path feeds the query
# path with zero drift — inserts through the insert store, deletes
# through deletion vectors, no base-file rewrite.
# ---------------------------------------------------------------------------

_RF_ORACLE = """
WITH refreshed AS (
  SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem
  WHERE l_orderkey % 10 <> 3
  UNION ALL
  SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem
  WHERE l_orderkey % 10 = 7
)
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(count(*) AS BIGINT) AS count_order
FROM refreshed
GROUP BY l_returnflag, l_linestatus
"""


@register("tpch_rf_refresh", oracle=_RF_ORACLE, tags=("tpch", "dml", "lakehouse"))
def tpch_rf_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from realestatedeals_spark.io.maintenance import VersionedTable

    apply_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity"
    )
    work = tempfile.mkdtemp(prefix="tpch_rf_")
    try:
        t = VersionedTable(spark, os.path.join(work, "lineitem"))
        t.commit(li)
        t.delete_where(F.col("l_orderkey") % 10 == 3)  # RF2
        rf1 = li.filter(F.col("l_orderkey") % 10 == 7).withColumn(
            "l_orderkey", F.col("l_orderkey") + 10_000_000
        )
        t.commit(t.read().unionByName(rf1), expected_latest=t.latest_version())
        out = (
            t.read()
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
                F.count(F.lit(1)).alias("count_order"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
