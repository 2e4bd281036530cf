"""Record linkage: blocked fuzzy matching (entity-resolution family).

The classic two-phase shape — cheap blocking keys generate candidates, an
edit-distance verify confirms them — applied to the parts catalog as a
product-name near-duplicate match. This is the entity-level counterpart of
the X2 document dedup family: same candidates→verify architecture, but the
verifier is Levenshtein on short strings instead of Jaccard on shingle sets.

Cross-engine note: Spark's ``levenshtein`` (commons-text) and DuckDB's
``levenshtein`` compute the same standard unit-cost edit distance, so the
verify is oracle-exact (pinned in tests/test_linkage.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.plans.registry import register

_J5_FUZZY_ORACLE = """
WITH g AS (
  SELECT string_split(p_name, ' ')[-1] AS noun, p_size, p_name AS nm,
         count(*) AS c
  FROM part GROUP BY 1, 2, 3)
SELECT p_size, nm AS name_a, nm AS name_b, CAST(0 AS BIGINT) AS dist,
       CAST(c * (c - 1) / 2 AS BIGINT) AS n_pairs
FROM g WHERE c >= 2
UNION ALL
SELECT a.p_size, a.nm AS name_a, b.nm AS name_b,
       CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist,
       CAST(a.c * b.c AS BIGINT) AS n_pairs
FROM g a JOIN g b
  ON a.noun = b.noun AND a.p_size = b.p_size AND a.nm < b.nm
WHERE levenshtein(a.nm, b.nm) <= 3
"""


def fuzzy_blocked_join(
    left: DataFrame,
    key: str,
    name: str,
    block_cols: list[F.Column] | None = None,
    max_dist: int = 3,
) -> DataFrame:
    """Blocked fuzzy self-join: candidates via equi-join on blocking keys,
    verified with Levenshtein ≤ ``max_dist``.

    Scale: the join is a plain shuffle equi-join on the blocking key — cost
    is Σ block_size², never n², so blocking-key design (not the verifier) is
    the knob that controls work; AQE's skew split handles a hot block. The
    edit-distance verify runs JVM-side inside codegen (no Python).
    """
    blocks = block_cols if block_cols is not None else [F.col(name)]
    p = left.select(
        F.col(key).alias("k"),
        F.col(name).alias("nm"),
        *[b.alias(f"blk{i}") for i, b in enumerate(blocks)],
    )
    a, b = p.alias("a"), p.alias("b")
    cond = F.col("a.k") < F.col("b.k")
    for i in range(len(blocks)):
        cond = cond & (F.col(f"a.blk{i}") == F.col(f"b.blk{i}"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.k").alias("key_a"),
            F.col("b.k").alias("key_b"),
            F.col("a.nm").alias("name_a"),
            F.col("b.nm").alias("name_b"),
            F.levenshtein("a.nm", "b.nm").cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


def fuzzy_group_linkage(
    left: DataFrame,
    name: str,
    block_cols: list[F.Column],
    max_dist: int = 3,
) -> DataFrame:
    """Group-collapsed fuzzy linkage: collapse exact (name, block) groups
    first, fuzzy-join the DISTINCT entities, report induced pair counts.

    This is the formulation that scales: id-level pair enumeration is
    inherently quadratic whenever duplicate groups are large (measured 78×
    on the sf0.1→sf1.0 gen fixture for the naive pair form — the output
    itself was quadratic), while the group form's join runs on distinct
    entities per block and its output is bounded by distinct-entity pairs.
    ``n_pairs`` carries the id-level cardinality (c_a·c_b, or C(c,2) within
    a group) without materializing it.
    """
    g = (
        left.select(
            F.col(name).alias("nm"),
            *[b.alias(f"blk{i}") for i, b in enumerate(block_cols)],
        )
        .groupBy("nm", *[f"blk{i}" for i in range(len(block_cols))])
        .agg(F.count(F.lit(1)).alias("c"))
    )
    within = g.filter(F.col("c") >= 2).select(
        *[f"blk{i}" for i in range(len(block_cols))],
        F.col("nm").alias("name_a"),
        F.col("nm").alias("name_b"),
        F.lit(0).cast("long").alias("dist"),
        (F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("n_pairs"),
    )
    a, b = g.alias("a"), g.alias("b")
    cond = F.col("a.nm") < F.col("b.nm")
    for i in range(len(block_cols)):
        cond = cond & (F.col(f"a.blk{i}") == F.col(f"b.blk{i}"))
    cross = (
        a.join(b, cond)
        .select(
            *[F.col(f"a.blk{i}").alias(f"blk{i}") for i in range(len(block_cols))],
            F.col("a.nm").alias("name_a"),
            F.col("b.nm").alias("name_b"),
            F.levenshtein("a.nm", "b.nm").cast("long").alias("dist"),
            (F.col("a.c") * F.col("b.c")).cast("long").alias("n_pairs"),
        )
        .filter(F.col("dist") <= max_dist)
    )
    return within.unionAll(cross)


@register("j5_fuzzy_blocked_join", oracle=_J5_FUZZY_ORACLE, tags=("J5", "linkage", "dedup"))
def j5_fuzzy_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate product names: block on (head noun, size), collapse
    exact groups, verify Levenshtein ≤ 3 between distinct entities
    (the catalog-dedup / customer-record-linkage pattern); at 100 TB the
    blocking key would add a phonetic or q-gram component, but the plan —
    groupBy collapse, equi-join candidates, codegen verify — is unchanged.
    Output: one row per matched entity pair with the induced id-pair count."""
    part = load_table(spark, sf_dir, "part")
    out = fuzzy_group_linkage(
        part,
        name="p_name",
        block_cols=[F.element_at(F.split("p_name", " "), -1), F.col("p_size")],
        max_dist=3,
    )
    # blk0 (the noun) is derivable from the names; report the size column
    return out.select(
        F.col("blk1").alias("p_size"), "name_a", "name_b", "dist", "n_pairs"
    )


# ---------------------------------------------------------------------------
# ER — entity-resolution capstone (round 7): dirty-record synthesis →
# blocking → match rules → TRANSITIVE clustering → survivorship golden
# records. j5 stops at matched pairs; real master-data pipelines must close
# the pairs transitively (A↔B on phone+name-typo, A↔C on exact name, so
# B↔C only via the cluster) and then pick one surviving record per entity.
#
# The customer fixture has no duplicates, so the query synthesizes them
# deterministically on BOTH sides (the PII-injection pattern): every
# customer yields an original record; every 3rd also a name-typo variant
# (same phone, last char dropped); every 6th also a phone-typo variant
# (same name, perturbed prefix). Match rules require phone-digit equality
# with name edit-distance ≤ 2, OR exact name equality — both engines run
# the IDENTICAL synthesis + match SQL text, so what's checked end-to-end
# is blocking recall, the transitive closure, and survivorship.
#
# Scale: candidates come from an equi-join on (nation, last-4 phone
# digits) — Σ block² work, never n²; clustering is the O(log n) large/
# small-star operator; survivorship is one keyed aggregate. Blocking is
# deliberately imperfect (records whose phone digits are shorter than 4
# can miss their phone-typo twin — recall < 1, like every real blocking
# scheme); the oracle mirrors the same misses, so the check stays exact.
# At 100 TB the blocking key would add a q-gram pass; the plan shape holds.
# ---------------------------------------------------------------------------

_ER_NAME_EXPR = """
CASE c_custkey % 8 WHEN 0 THEN 'large' WHEN 1 THEN 'hot' WHEN 2 THEN 'small'
  WHEN 3 THEN 'cold' WHEN 4 THEN 'dim' WHEN 5 THEN 'bright' WHEN 6 THEN 'new'
  ELSE 'old' END || ' ' ||
CASE CAST(FLOOR(c_custkey / 8) AS BIGINT) % 8 WHEN 0 THEN 'ring'
  WHEN 1 THEN 'bolt' WHEN 2 THEN 'nut' WHEN 3 THEN 'gear' WHEN 4 THEN 'plate'
  WHEN 5 THEN 'rod' WHEN 6 THEN 'cap' ELSE 'pin' END || ' ' || c_custkey
"""

_ER_NAMED_CTE = f"""
  SELECT c_custkey, c_nationkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents,
         {_ER_NAME_EXPR} AS base
  FROM customer
"""

_ER_RECS_BODY = """
SELECT c_custkey * 3 AS rec_id, c_nationkey AS nation, base AS name,
       '555-' || c_custkey AS phone, cents
FROM named
UNION ALL
SELECT c_custkey * 3 + 1, c_nationkey, SUBSTR(base, 1, LENGTH(base) - 1),
       '555-' || c_custkey, cents - 100
FROM named WHERE c_custkey % 3 = 0
UNION ALL
SELECT c_custkey * 3 + 2, c_nationkey, base,
       '556-' || c_custkey, cents + 250
FROM named WHERE c_custkey % 6 = 0
"""

# same fragments on both engines; DuckDB's recursive-CTE parser rejects a
# nested WITH inside a CTE body, so the oracle hoists `named` to the top
_ER_RECORDS_SQL = f"WITH named AS ({_ER_NAMED_CTE}) {_ER_RECS_BODY}"

_ER_MATCH_SQL = """
(a.digits = b.digits AND LEVENSHTEIN(a.name, b.name) <= 2)
OR (a.name = b.name AND LEVENSHTEIN(a.digits, b.digits) <= 3)
"""

_ER_ORACLE = f"""
WITH RECURSIVE named AS ({_ER_NAMED_CTE}),
recs AS ({_ER_RECS_BODY}),
d AS (
  SELECT rec_id, nation, name, phone, cents,
         REGEXP_REPLACE(phone, '[^0-9]', '') AS digits
  FROM recs
),
e0 AS (
  SELECT a.rec_id AS ra, b.rec_id AS rb
  FROM d a JOIN d b
    ON a.nation = b.nation AND RIGHT(a.digits, 4) = RIGHT(b.digits, 4)
   AND a.rec_id < b.rec_id AND ({_ER_MATCH_SQL})
),
edges AS (SELECT ra AS a, rb AS b FROM e0 UNION SELECT rb, ra FROM e0),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
clus AS (
  SELECT d.rec_id,
         LEAST(d.rec_id, COALESCE(MIN(reach.b), d.rec_id)) AS cluster_id
  FROM d LEFT JOIN reach ON reach.a = d.rec_id
  GROUP BY d.rec_id
)
SELECT clus.cluster_id,
       COUNT(*) AS n_records,
       MAX(d.name) AS name,
       MAX(d.cents) AS max_cents,
       COUNT(DISTINCT d.phone) AS n_phones
FROM clus JOIN d ON d.rec_id = clus.rec_id
GROUP BY clus.cluster_id
"""


@register("er_golden_records", oracle=_ER_ORACLE, tags=("J5", "linkage", "dedup", "graph"), bench=True)
def er_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden customer records: one survivor per transitively-closed match
    cluster, with member count, canonical (longest — a truncation always
    sorts before its original, so MAX is the untyped name) name, best
    balance, and distinct-phone count. Engine side: shared-synthesis SQL →
    DataFrame blocking join with codegen Levenshtein verify → large/small-
    star connected components → one keyed aggregate."""
    from realestatedeals_spark.operators.dedup import duplicate_clusters_star

    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    recs = spark.sql(_ER_RECORDS_SQL)
    d = recs.withColumn(
        "digits", F.regexp_replace("phone", "[^0-9]", "")
    ).withColumn("blk", F.expr("right(digits, 4)"))
    a, b = d.alias("a"), d.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.nation") == F.col("b.nation"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.rec_id") < F.col("b.rec_id"))
            & F.expr(_ER_MATCH_SQL),
        )
        .select(F.col("a.rec_id").alias("doc_a"), F.col("b.rec_id").alias("doc_b"))
    )
    clusters = duplicate_clusters_star(pairs)
    labeled = d.join(
        clusters, d.rec_id == clusters.doc_id, "left"
    ).withColumn("cid", F.coalesce(F.col("cluster_id"), F.col("rec_id")))
    return labeled.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_records"),
        F.max("name").alias("name"),
        F.max("cents").alias("max_cents"),
        F.count_distinct("phone").alias("n_phones"),
    )
