"""Reference-derived queries (SURVEY.md §2a) posed on the driver star schema.

Mapping (FIXTURES.md §A): ``orders`` plays the listings CDC state
(o_orderkey = mls, o_totalprice = price); ``customer``/``supplier`` derive the
agent/contact frames; ``part``/``customer`` strings exercise the scalar
transforms; ``lineitem`` carries the pushdown envelope.

Each query registers a DuckDB oracle; column aliases match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from realestatedeals_spark.functions.scalars import (
    normalize_phone,
    numeric_tail,
    parse_price,
    ppsqft,
    split_name_first,
    split_name_last,
    strip_label,
)
from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.operators.agents import agent_dedup_pipeline
from realestatedeals_spark.operators.cdc import classify_cdc
from realestatedeals_spark.plans.registry import register
from realestatedeals_spark.session import apply_session_conf

# ---------------------------------------------------------------------------
# Flagship: §3.3 agent-dedup pipeline transposed onto customer/supplier/nation.
# Exercises scan → filter (F3) → broadcast anti-join (J2) → groupBy+collect_set
# (A1) → initcap/tag projections (T6-T9) — the whole relational core in one
# lazy plan (SURVEY.md §7 step 1).
# ---------------------------------------------------------------------------

_FLAGSHIP_ORACLE = """
WITH listings AS (
  SELECT 'AGENT' || CAST(c_custkey % 37 AS VARCHAR) AS agent_first_name,
         n_name AS agent_last_name,
         CASE WHEN c_custkey % 13 = 0 THEN ''
              ELSE '(801) 555-' || lpad(CAST((c_custkey % 37) * 271 % 10000 AS VARCHAR), 4, '0')
         END AS agent_phone,
         c_mktsegment AS city
  FROM customer JOIN nation ON c_nationkey = n_nationkey
),
filtered AS (
  SELECT agent_first_name AS first_name, agent_last_name AS last_name,
         CASE WHEN length(regexp_replace(coalesce(agent_phone, ''), '[^0-9]', '', 'g')) = 10
              THEN '+1' || regexp_replace(coalesce(agent_phone, ''), '[^0-9]', '', 'g')
              WHEN length(regexp_replace(coalesce(agent_phone, ''), '[^0-9]', '', 'g')) = 11
                   AND regexp_replace(coalesce(agent_phone, ''), '[^0-9]', '', 'g') LIKE '1%'
              THEN '+' || regexp_replace(coalesce(agent_phone, ''), '[^0-9]', '', 'g')
              ELSE coalesce(agent_phone, '')
         END AS phone,
         city
  FROM listings
  WHERE agent_phone IS NOT NULL AND trim(agent_phone) <> ''
),
contacts AS (
  SELECT DISTINCT 'AGENT' || CAST(s_suppkey % 37 AS VARCHAR) AS first_name,
         n_name AS last_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
),
newagents AS (
  SELECT f.* FROM filtered f
  WHERE NOT EXISTS (
    SELECT 1 FROM contacts c
    WHERE c.first_name = f.first_name AND c.last_name = f.last_name)
),
grouped AS (
  SELECT first_name, last_name, phone,
         array_to_string(list_sort(list_distinct(list(city))), ', ') AS city
  FROM newagents GROUP BY first_name, last_name, phone
)
SELECT upper(substr(first_name, 1, 1)) || lower(substr(first_name, 2)) AS first_name,
       upper(substr(last_name, 1, 1)) || lower(substr(last_name, 2)) AS last_name,
       phone,
       array_to_string(
         list_transform(string_split(city, ','), x -> trim(x) || ' Utah Market'),
         ', ') || ', realtor' AS tags
FROM grouped
"""


def _agent_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    sup = load_table(spark, sf_dir, "supplier")

    listings = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey).select(
        F.concat(F.lit("AGENT"), (F.col("c_custkey") % 37).cast("string")).alias(
            "agent_first_name"
        ),
        F.col("n_name").alias("agent_last_name"),
        F.when(F.col("c_custkey") % 13 == 0, F.lit(""))
        .otherwise(
            F.concat(
                F.lit("(801) 555-"),
                F.lpad(((F.col("c_custkey") % 37) * 271 % 10000).cast("string"), 4, "0"),
            )
        )
        .alias("agent_phone"),
        F.col("c_mktsegment").alias("city"),
    )
    contacts = sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey).select(
        F.concat(F.lit("AGENT"), (F.col("s_suppkey") % 37).cast("string")).alias("first_name"),
        F.col("n_name").alias("last_name"),
    )
    return listings, contacts


@register("flagship_agent_dedup", oracle=_FLAGSHIP_ORACLE, tags=("J2", "A1", "T6-T9", "F3"), bench=True)
def flagship_agent_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    listings, contacts = _agent_frames(spark, sf_dir)
    return agent_dedup_pipeline(listings, contacts)


# ---------------------------------------------------------------------------
# F1 — the reference's source-pushed predicate envelope (price/sqft/acres →
# URL params, hunter.py:20). Here the same conjunctive range predicate is
# pushed into the parquet scan by Catalyst (check .explain: PushedFilters).
# ---------------------------------------------------------------------------

_F1_ORACLE = """
SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity,
       CASE WHEN l_quantity > 0 THEN l_extendedprice / l_quantity ELSE 0.0 END AS price_per_qty
FROM lineitem
WHERE l_extendedprice <= 15000.0 AND l_quantity >= 7.0 AND l_discount >= 0.01
"""


@register("f1_filter_envelope", oracle=_F1_ORACLE, tags=("F1", "T1"))
def f1_filter_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_extendedprice") <= 15000.0)
        & (F.col("l_quantity") >= 7.0)
        & (F.col("l_discount") >= 0.01)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_quantity",
        ppsqft(F.col("l_extendedprice"), F.col("l_quantity")).alias("price_per_qty"),
    )


# ---------------------------------------------------------------------------
# T2/T3/T12 — scalar parse transforms on part strings.
# ---------------------------------------------------------------------------

_SCALAR_ORACLE = """
SELECT p_partkey,
       CAST(coalesce(TRY_CAST(regexp_replace('$' || CAST(p_partkey AS VARCHAR) || ',500', '[$,]', '', 'g') AS BIGINT), 0) AS BIGINT) AS parsed_price,
       CAST(0 AS BIGINT) AS unparsed_price,
       string_split(trim(p_name), ' ')[1] AS first_name,
       array_to_string(string_split(trim(p_name), ' ')[2:], ' ') AS last_name,
       trim(regexp_replace(p_brand, 'Brand#', '', 'g')) AS brand_num,
       TRY_CAST(string_split(trim('on market ' || CAST(p_size AS VARCHAR)), ' ')[-1] AS INTEGER) AS days_tail
FROM part
"""


@register("t_scalar_parsing", oracle=_SCALAR_ORACLE, tags=("T2", "T3", "T12", "T14"))
def t_scalar_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    price_str = F.concat(F.lit("$"), F.col("p_partkey").cast("string"), F.lit(",500"))
    bad_price_str = F.concat(F.lit("$"), F.col("p_retailprice").cast("string"))  # '$900.2' → 0
    return part.select(
        "p_partkey",
        parse_price(price_str).alias("parsed_price"),
        parse_price(bad_price_str).alias("unparsed_price"),
        split_name_first(F.col("p_name")).alias("first_name"),
        split_name_last(F.col("p_name")).alias("last_name"),
        strip_label(F.col("p_brand"), "Brand#").alias("brand_num"),
        numeric_tail(F.concat(F.lit("on market "), F.col("p_size").cast("string"))).alias(
            "days_tail"
        ),
    )


# ---------------------------------------------------------------------------
# T6 — phone normalization over all four reference branches
# (data_loader.py:16-24): 10-digit, 1-prefixed 11-digit, formatted, garbage,
# empty.
# ---------------------------------------------------------------------------

_PHONE_ORACLE = """
WITH raw AS (
  SELECT c_custkey,
         CASE c_custkey % 5
           WHEN 0 THEN '80155512' || lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0')
           WHEN 1 THEN '180155534' || lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0')
           WHEN 2 THEN '(801) 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
           WHEN 3 THEN 'call me maybe'
           ELSE ''
         END AS phone
  FROM customer
)
SELECT c_custkey, phone,
       CASE WHEN length(regexp_replace(coalesce(phone, ''), '[^0-9]', '', 'g')) = 10
            THEN '+1' || regexp_replace(coalesce(phone, ''), '[^0-9]', '', 'g')
            WHEN length(regexp_replace(coalesce(phone, ''), '[^0-9]', '', 'g')) = 11
                 AND regexp_replace(coalesce(phone, ''), '[^0-9]', '', 'g') LIKE '1%'
            THEN '+' || regexp_replace(coalesce(phone, ''), '[^0-9]', '', 'g')
            ELSE coalesce(phone, '')
       END AS phone_norm
FROM raw
"""


@register("t6_phone_normalize", oracle=_PHONE_ORACLE, tags=("T6",))
def t6_phone_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    mod = F.col("c_custkey") % 5
    phone = (
        F.when(mod == 0, F.concat(F.lit("80155512"), F.lpad((F.col("c_custkey") % 100).cast("string"), 2, "0")))
        .when(mod == 1, F.concat(F.lit("180155534"), F.lpad((F.col("c_custkey") % 100).cast("string"), 2, "0")))
        .when(mod == 2, F.concat(F.lit("(801) 555-"), F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0")))
        .when(mod == 3, F.lit("call me maybe"))
        .otherwise(F.lit(""))
    )
    return cust.select(
        "c_custkey",
        phone.alias("phone"),
        normalize_phone(phone).alias("phone_norm"),
    )


# ---------------------------------------------------------------------------
# J1/J3/C1/C5 — the CDC full-outer join. "Scrape" = orders minus every 11th
# key; "snapshot" = orders minus every 5th key, price bumped on every 7th.
# Yields all three status branches deterministically.
# ---------------------------------------------------------------------------

_CDC_ORACLE = """
WITH scraped AS (
  SELECT o_orderkey AS mls, o_totalprice AS new_price
  FROM orders WHERE o_orderkey % 11 <> 0
),
snapshot AS (
  SELECT o_orderkey AS mls,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000.0 ELSE o_totalprice END AS old_price
  FROM orders WHERE o_orderkey % 5 <> 0
),
joined AS (
  SELECT coalesce(s.mls, p.mls) AS mls, p.old_price, s.new_price
  FROM scraped s FULL OUTER JOIN snapshot p ON s.mls = p.mls
)
SELECT mls,
       CASE WHEN old_price IS NULL THEN 'new_listing'
            WHEN new_price IS NULL THEN 'off_market'
            WHEN new_price <> old_price THEN 'price_change'
            ELSE 'unchanged' END AS status,
       old_price, new_price,
       CASE WHEN old_price IS NOT NULL AND new_price IS NOT NULL AND new_price <> old_price
                 AND old_price <> 0
            THEN (new_price - old_price) / old_price * 100.0 END AS price_change_percentage
FROM joined
WHERE NOT (old_price IS NOT NULL AND new_price IS NOT NULL AND new_price = old_price)
"""


def _cdc_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = load_table(spark, sf_dir, "orders")
    scraped = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        F.col("o_orderkey").alias("mls"), F.col("o_totalprice").alias("price")
    )
    snapshot = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("mls"),
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1000.0)
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
    )
    return scraped, snapshot


@register("j1_cdc_classify", oracle=_CDC_ORACLE, tags=("J1", "J3", "C1", "C5"), bench=True)
def j1_cdc_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    scraped, snapshot = _cdc_frames(spark, sf_dir)
    return classify_cdc(scraped, snapshot, key="mls", price="price")


# J3 standalone — the off-market anti-join exactly as hunter.py:336-354 states
# it (saved keys not in this cycle's scrape).
_OFFMARKET_ORACLE = """
SELECT p.o_orderkey AS mls,
       p.o_totalprice AS price
FROM orders p
WHERE p.o_orderkey % 5 <> 0
  AND NOT EXISTS (
    SELECT 1 FROM orders s WHERE s.o_orderkey % 11 <> 0 AND s.o_orderkey = p.o_orderkey)
"""


@register("j3_off_market_anti", oracle=_OFFMARKET_ORACLE, tags=("J3", "F5"))
def j3_off_market_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    snapshot = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("mls"), F.col("o_totalprice").alias("price")
    )
    scraped_keys = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        F.col("o_orderkey").alias("mls")
    )
    return snapshot.join(scraped_keys, on="mls", how="left_anti")


# ---------------------------------------------------------------------------
# A2 — keyed last-write-wins dedup, deterministic via row_number (the
# reference's dict[mls] keying, main.py:29,34). Latest order per customer.
# ---------------------------------------------------------------------------

_DEDUP_ORACLE = """
SELECT o_custkey, o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
"""


@register("a2_dedup_last_write_wins", oracle=_DEDUP_ORACLE, tags=("A2",))
def a2_dedup_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
        )
    )


# ---------------------------------------------------------------------------
# A4 — grouped collection (county→zips analog): nations per region, sorted for
# determinism (utahZip.py:24-44).
# ---------------------------------------------------------------------------

_REGION_ORACLE = """
SELECT r_name AS region,
       array_to_string(list_sort(list(n_name)), ', ') AS nations,
       CAST(count(*) AS BIGINT) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


@register("a4_region_nation_rollup", oracle=_REGION_ORACLE, tags=("A4",))
def a4_region_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    return (
        nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ", ").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


# ---------------------------------------------------------------------------
# C2 — time-on-market: whole days between the listing date and a fixed as-of
# date (hunter.py:343 uses now(); fixed here for reproducibility).
# ---------------------------------------------------------------------------

_AGE_ORACLE = """
SELECT o_orderkey,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01') AS INTEGER) AS days_on_market
FROM orders
WHERE o_orderkey % 5 <> 0 AND o_orderkey % 11 = 0
"""


@register("c2_time_on_market", oracle=_AGE_ORACLE, tags=("C2",))
def c2_time_on_market(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter((F.col("o_orderkey") % 5 != 0) & (F.col("o_orderkey") % 11 == 0))
        .select(
            "o_orderkey",
            F.datediff(F.lit("2026-01-01").cast("date"), F.to_date("o_orderdate")).alias(
                "days_on_market"
            ),
        )
    )


# ---------------------------------------------------------------------------
# T4/T5/T13 — address parsing (ure_scraping.py:171-189 incl. the double-space
# cleanup), sqft extraction (ure_scraping.py:192, robust-regex form), and
# Trulia feature-string dispatch (trulia_scraper.py:102-111: route '•'-joined
# segments to typed bed/bath/sqft columns). Inputs synthesized
# deterministically from customer keys so the oracle can mirror them.
# ---------------------------------------------------------------------------

_ADDRESS_ORACLE = """
WITH raw AS (
  SELECT c_custkey,
         CAST(100 + c_custkey % 900 AS VARCHAR) || ' Main  St, Salt Lake City, UT '
           || CAST(84000 + c_custkey % 1000 AS VARCHAR) AS full_address,
         CAST(1 + c_custkey % 5 AS VARCHAR) || ' bed • '
           || CAST(1 + c_custkey % 3 AS VARCHAR) || ' bath • 1,'
           || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || ' sqft' AS features
  FROM customer
),
cleaned AS (SELECT c_custkey, regexp_replace(full_address, '\\s{2,}', ' ', 'g') AS ca,
                   features FROM raw)
SELECT c_custkey,
       string_split(ca, ', ')[1] AS address,
       string_split(ca, ', ')[2] AS city,
       trim(substr(string_split(ca, ', ')[-1], 1, 2)) AS state,
       right(string_split(ca, ', ')[-1], 5) AS zip,
       CAST(regexp_extract(features, '([0-9]+) bed', 1) AS INTEGER) AS beds,
       CAST(regexp_extract(features, '([0-9]+) bath', 1) AS INTEGER) AS baths,
       CAST(replace(regexp_extract(features, '([0-9,]+)\\s*sqft', 1), ',', '') AS INTEGER)
         AS sqft
FROM cleaned
"""


@register("t_address_feature_parse", oracle=_ADDRESS_ORACLE, tags=("T4", "T5", "T13"))
def t_address_feature_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realestatedeals_spark.functions.scalars import parse_address, parse_sqft

    cust = load_table(spark, sf_dir, "customer")
    full = F.concat(
        (100 + F.col("c_custkey") % 900).cast("string"),
        F.lit(" Main  St, Salt Lake City, UT "),
        (84000 + F.col("c_custkey") % 1000).cast("string"),
    )
    features = F.concat(
        (1 + F.col("c_custkey") % 5).cast("string"),
        F.lit(" bed • "),
        (1 + F.col("c_custkey") % 3).cast("string"),
        F.lit(" bath • 1,"),
        F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
        F.lit(" sqft"),
    )
    addr = parse_address(full)
    return cust.select(
        "c_custkey",
        addr["address"].alias("address"),
        addr["city"].alias("city"),
        addr["state"].alias("state"),
        addr["zip"].alias("zip"),
        F.regexp_extract(features, r"(\d+) bed", 1).cast("int").alias("beds"),
        F.regexp_extract(features, r"(\d+) bath", 1).cast("int").alias("baths"),
        parse_sqft(features).alias("sqft"),
    )


# ---------------------------------------------------------------------------
# Data-quality audit: referential integrity across every FK edge of the star
# schema in ONE pass of summary counts — the pre-flight check a pipeline
# runs before trusting joins (an orphan fact row silently vanishes from
# inner joins; this query makes that loss visible and countable). Each edge
# is a distinct-key anti-join: shuffles carry distinct keys, not rows.
# ---------------------------------------------------------------------------

_RI_AUDIT_ORACLE = """
SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
       CAST((SELECT count(DISTINCT l_orderkey) FROM lineitem) AS BIGINT) AS n_keys,
       CAST((SELECT count(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL) l
             WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
            AS BIGINT) AS n_orphans
UNION ALL
SELECT 'orders.o_custkey->customer',
       CAST((SELECT count(DISTINCT o_custkey) FROM orders) AS BIGINT),
       CAST((SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey IS NOT NULL) o
             WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
            AS BIGINT)
UNION ALL
SELECT 'customer.c_nationkey->nation',
       CAST((SELECT count(DISTINCT c_nationkey) FROM customer) AS BIGINT),
       CAST((SELECT count(*) FROM (SELECT DISTINCT c_nationkey FROM customer WHERE c_nationkey IS NOT NULL) c
             WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
            AS BIGINT)
UNION ALL
SELECT 'supplier.s_nationkey->nation',
       CAST((SELECT count(DISTINCT s_nationkey) FROM supplier) AS BIGINT),
       CAST((SELECT count(*) FROM (SELECT DISTINCT s_nationkey FROM supplier WHERE s_nationkey IS NOT NULL) s
             WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
            AS BIGINT)
UNION ALL
SELECT 'nation.n_regionkey->region',
       CAST((SELECT count(DISTINCT n_regionkey) FROM nation) AS BIGINT),
       CAST((SELECT count(*) FROM (SELECT DISTINCT n_regionkey FROM nation WHERE n_regionkey IS NOT NULL) n
             WHERE NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
            AS BIGINT)
"""


@register("audit_referential_integrity", oracle=_RI_AUDIT_ORACLE, tags=("audit", "quality"))
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    def edge(name: str, child: DataFrame, ckey: str, parent: DataFrame, pkey: str) -> DataFrame:
        # NULL child keys are excluded explicitly: SQL count(DISTINCT x)
        # skips NULLs while DataFrame distinct().count() keeps one NULL row,
        # so without this filter the two engines would disagree the first
        # time a fixture carries a NULL FK. A NULL FK is "absent", not an
        # orphan; audit it with a dedicated null-rate check, not this edge.
        keys = child.select(F.col(ckey).alias("k")).filter(F.col("k").isNotNull()).distinct()
        orphans = keys.join(parent.select(F.col(pkey).alias("k")), "k", "left_anti")
        return keys.agg(F.count(F.lit(1)).alias("n_keys")).crossJoin(
            orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
        ).select(F.lit(name).alias("fk_edge"), "n_keys", "n_orphans")

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    out = edge("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey")
    for args in (
        ("orders.o_custkey->customer", orders, "o_custkey", cust, "c_custkey"),
        ("customer.c_nationkey->nation", cust, "c_nationkey", nat, "n_nationkey"),
        ("supplier.s_nationkey->nation", sup, "s_nationkey", nat, "n_nationkey"),
        ("nation.n_regionkey->region", nat, "n_regionkey", reg, "r_regionkey"),
    ):
        out = out.unionByName(edge(*args))
    return out


# ---------------------------------------------------------------------------
# audit_expectations — a declarative data-quality expectation suite
# (Great-Expectations style) evaluated in ONE aggregation pass per table:
# every check folds into the same partial-aggregate scan, so an 8-check
# suite over a 100 TB table costs exactly one read, not eight. The suite
# deliberately includes a failing expectation (o_totalprice_le_100k) so
# the report proves violation detection, not just green rows. Reference
# parity: the reference validates records ad hoc while scraping (price
# parse fallback listing.py:30-38, zip sanity hunter.py:63); this is
# that validation as a first-class, single-scan audit report.
# ---------------------------------------------------------------------------

_EXPECT_ORACLE = """
SELECT 'orders' AS tbl, 'o_orderkey_unique' AS expectation,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations,
       CASE WHEN count(*) = count(DISTINCT o_orderkey) THEN 'pass' ELSE 'fail' END AS status
FROM orders
UNION ALL
SELECT 'orders', 'o_totalprice_positive', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
       CASE WHEN sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 ELSE 0 END) = 0 THEN 'pass' ELSE 'fail' END
FROM orders
UNION ALL
SELECT 'orders', 'o_orderstatus_in_set', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS BIGINT),
       CASE WHEN sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) = 0 THEN 'pass' ELSE 'fail' END
FROM orders
UNION ALL
SELECT 'orders', 'o_totalprice_le_100k', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT),
       CASE WHEN sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) = 0 THEN 'pass' ELSE 'fail' END
FROM orders
UNION ALL
SELECT 'lineitem', 'l_quantity_in_1_50', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT),
       CASE WHEN sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) = 0 THEN 'pass' ELSE 'fail' END
FROM lineitem
UNION ALL
SELECT 'lineitem', 'l_discount_in_0_01', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN l_discount IS NULL OR l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT),
       CASE WHEN sum(CASE WHEN l_discount IS NULL OR l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) = 0 THEN 'pass' ELSE 'fail' END
FROM lineitem
UNION ALL
SELECT 'lineitem', 'l_linestatus_in_set', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN l_linestatus IN ('O','F') THEN 0 ELSE 1 END) AS BIGINT),
       CASE WHEN sum(CASE WHEN l_linestatus IN ('O','F') THEN 0 ELSE 1 END) = 0 THEN 'pass' ELSE 'fail' END
FROM lineitem
"""


@register("audit_expectations", oracle=_EXPECT_ORACLE, tags=("audit", "quality"))
def audit_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def viol(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    o_ag = orders.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("v_uniq"),
        viol(F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)).alias("v_pos"),
        viol(~F.col("o_orderstatus").isin("O", "F", "P")).alias("v_set"),
        viol(F.col("o_totalprice") > 100000).alias("v_cap"),
    )
    l_ag = li.agg(
        F.count(F.lit(1)).alias("n"),
        viol(
            F.col("l_quantity").isNull()
            | (F.col("l_quantity") < 1)
            | (F.col("l_quantity") > 50)
        ).alias("v_qty"),
        viol(
            F.col("l_discount").isNull()
            | (F.col("l_discount") < 0)
            | (F.col("l_discount") > 0.1)
        ).alias("v_disc"),
        viol(~F.col("l_linestatus").isin("O", "F")).alias("v_stat"),
    )

    def unpack(ag: DataFrame, tbl: str, checks: list[tuple[str, str]]) -> DataFrame:
        rows = F.array(
            *[
                F.struct(
                    F.lit(name).alias("expectation"),
                    F.col(col).cast("long").alias("n_violations"),
                )
                for name, col in checks
            ]
        )
        return ag.select(
            F.lit(tbl).alias("tbl"), F.col("n").cast("long").alias("n_rows"),
            F.explode(rows).alias("c"),
        ).select(
            "tbl",
            F.col("c.expectation").alias("expectation"),
            "n_rows",
            F.col("c.n_violations").alias("n_violations"),
            F.when(F.col("c.n_violations") == 0, "pass").otherwise("fail").alias("status"),
        )

    out = unpack(
        o_ag,
        "orders",
        [
            ("o_orderkey_unique", "v_uniq"),
            ("o_totalprice_positive", "v_pos"),
            ("o_orderstatus_in_set", "v_set"),
            ("o_totalprice_le_100k", "v_cap"),
        ],
    ).unionByName(
        unpack(
            l_ag,
            "lineitem",
            [
                ("l_quantity_in_1_50", "v_qty"),
                ("l_discount_in_0_01", "v_disc"),
                ("l_linestatus_in_set", "v_stat"),
            ],
        )
    )
    return out


# ---------------------------------------------------------------------------
# audit_benford — first-digit (Benford) screening of the money column, the
# classic anomaly/fabrication tripwire on financial facts. Expected shares
# are module-level integer-micros literals (log10 evaluated ONCE in Python
# — neither engine computes a log at query time), observed shares are
# integer rationals, so the whole audit is hash-exact.
# ---------------------------------------------------------------------------

_BENFORD_MICROS = [301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757]
_BENFORD_SQL_CASE = "CASE d " + " ".join(
    f"WHEN {i + 1} THEN {m}" for i, m in enumerate(_BENFORD_MICROS)
) + " END"

_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM orders WHERE o_totalprice >= 1),
counted AS (
  SELECT d, count(*) AS n, sum(count(*)) OVER () AS total
  FROM digits GROUP BY d)
SELECT CAST(d AS INTEGER) AS first_digit,
       CAST(n AS BIGINT) AS n_orders,
       CAST((n * 1000000) // total AS BIGINT) AS observed_micros,
       CAST({_BENFORD_SQL_CASE} AS BIGINT) AS benford_micros,
       CAST((n * 1000000) // total - {_BENFORD_SQL_CASE} AS BIGINT) AS deviation_micros
FROM counted
"""


@register("audit_benford", oracle=_BENFORD_ORACLE, tags=("audit", "quality"))
def audit_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit distribution of o_totalprice vs Benford's law.

    Scale shape: one 9-group aggregate with map-side combine; the window
    total runs over 9 rows."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = orders.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        ).cast("long").alias("d")
    )
    counted = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    counted = counted.withColumn("total", F.sum("n").over(W.partitionBy()))
    benford = F.element_at(
        F.array(*[F.lit(m).cast("long") for m in _BENFORD_MICROS]), F.col("d").cast("int")
    )
    obs = F.expr("(n * 1000000) div total")
    return counted.select(
        F.col("d").cast("int").alias("first_digit"),
        F.col("n").alias("n_orders"),
        obs.cast("long").alias("observed_micros"),
        benford.alias("benford_micros"),
        (obs - benford).cast("long").alias("deviation_micros"),
    )
