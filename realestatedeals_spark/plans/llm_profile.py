"""Profiling / sketch queries (SURVEY.md §2b X6).

Exact distinct counts and interpolated percentiles are oracle-checked;
the sketch variants (HLL approx-distinct, t-digest-style approx
percentile) are rows-only with tolerance assertions in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.plans.registry import register

_X6_EXACT_ORACLE = """
SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS distinct_suppliers,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS distinct_orders,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
"""


@register("x6_profile_exact_distinct", oracle=_X6_EXACT_ORACLE, tags=("X6", "profile"))
def x6_profile_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count_distinct("l_partkey").alias("distinct_parts"),
        F.count_distinct("l_suppkey").alias("distinct_suppliers"),
        F.count_distinct("l_orderkey").alias("distinct_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_X6_HIST_ORACLE = """
SELECT CAST(floor(l_extendedprice / 5000.0) AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       min(l_extendedprice) AS lo,
       max(l_extendedprice) AS hi
FROM lineitem
GROUP BY bucket
"""


@register("x6_profile_histogram", oracle=_X6_HIST_ORACLE, tags=("X6", "profile"))
def x6_profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width (5000-wide) histogram of l_extendedprice — exact, one
    partial-agg shuffle of ≤ n_buckets rows per partition regardless of data
    scale (the column-profiling primitive a 100 TB validation pass runs per
    numeric column). Fixed bucket width keeps it single-pass; a data-driven
    range would add one min/max pre-pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.floor(F.col("l_extendedprice") / 5000.0).cast("int").alias("bucket"),
            "l_extendedprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
    )


_X6_HH_ORACLE = """
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
     clean AS (SELECT term FROM toks WHERE term <> ''),
     tot AS (SELECT count(*) AS n FROM clean)
SELECT term, CAST(count(*) AS BIGINT) AS cnt
FROM clean, tot
GROUP BY term, n
HAVING count(*) * 100 > n
"""


@register(
    "x6_heavy_hitters", oracle=_X6_HH_ORACLE, tags=("X6", "profile", "sketch"), bench=True
)
def x6_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (global term share > 1/100) via Misra-Gries-style
    candidate pruning + exact recount — no full-token shuffle (see
    operators/sketches.py for the superset-guarantee argument). Hash-matches
    the brute-force GROUP BY oracle because the verify pass is exact."""
    from realestatedeals_spark.operators.sketches import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    return heavy_hitters(tokens, col="term", k=100)


@register("x6_profile_sketches", tags=("X6", "profile", "approx"))
def x6_profile_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct + approximate percentiles. Rows-only check (sketches
    are approximate by design; tolerance asserted in tests/test_profile.py
    against the exact query above).

    Quantiles are emitted as four scalar double columns — array columns
    don't canonicalize in the harness's rows-only hash.
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75, 0.99], 10000)
    return li.agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", 0.01).alias("approx_suppliers"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        q.getItem(0).alias("price_q25"),
        q.getItem(1).alias("price_q50"),
        q.getItem(2).alias("price_q75"),
        q.getItem(3).alias("price_q99"),
    )


# ---------------------------------------------------------------------------
# X6 — whole-table column profile: nulls / distinct / min / max per column
# in ONE pass (Spark expands the multi-distinct agg; still a single scan) —
# the per-column validation sweep a 100 TB ingest runs before accepting a
# drop. Long format (one row per column) so adding columns never changes
# the schema. Numeric columns only: min/max emit as exact doubles (string
# formatting of doubles differs between engines).
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax")

_X6_COLPROF_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS DOUBLE) AS min_v,
       CAST(max({c}) AS DOUBLE) AS max_v
FROM lineitem"""
    for c in _PROFILE_COLS
)


@register("x6_profile_columns", oracle=_X6_COLPROF_ORACLE, tags=("X6", "profile"))
def x6_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.count_distinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_v"),
                F.col(f"{c}__max").alias("max_v"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return wide.select(F.inline(rows))


@register("x6_hll_mergeable", tags=("X6", "profile", "approx", "sketch"))
def x6_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (DataSketches HLL, Spark 4
    built-ins): one sketch per source over content hashes, then a global
    estimate by MERGING the sketches — never re-scanning the corpus. This is
    the 100 TB profiling primitive: sketch each partition/day once, answer
    any rollup (per source, per day, global) by union of sketches. No SQL
    oracle for THIS variant (the HLL++ sketch binary is engine-specific);
    tests pin the estimates against exact distincts within HLL error bounds
    and pin merge-vs-rescan equivalence. The register/merge machinery itself
    is hash-exact oracled by x6_hll_arith_state below, which differs only in
    the hash primitive."""
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select("source", F.xxhash64("text").alias("h"))
    per_source = hashed.groupBy("source").agg(
        F.hll_sketch_agg("h", F.lit(12)).alias("sk"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    global_est = per_source.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(True))).alias("est"),
        F.sum("n_docs").alias("n"),
    ).select(F.lit("__global__").alias("source"), F.col("est").cast("bigint").alias("est_distinct"), "n")
    per = per_source.select(
        "source",
        F.hll_sketch_estimate("sk").cast("bigint").alias("est_distinct"),
        F.col("n_docs").alias("n"),
    )
    return per.unionByName(global_est).orderBy("source")


# ---------------------------------------------------------------------------
# X6 — approximate quantiles via percentile_approx (Greenwald-Khanna): the
# mergeable rank-sketch counterpart to olap_percentiles_exact. Rank error is
# bounded by n/accuracy and the partial aggregates merge map-side, so at
# 100 TB each scan task summarizes its split once and the driver never sees
# raw values — unlike the exact variant, whose global sort-based percentile
# is the thing you cannot afford there. No SQL oracle (GK's picked elements
# are engine-specific); tests pin every estimate's TRUE rank against the
# n/accuracy bound, which is the sketch's actual contract.
# ---------------------------------------------------------------------------

_QUANT_ACCURACY = 10_000


@register("x6_approx_quantiles", tags=("X6", "profile", "approx", "sketch"))
def x6_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of document length per source + '__global__', one pass."""
    docs = load_table(spark, sf_dir, "documents")
    qs = F.percentile_approx(
        "n_chars", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), _QUANT_ACCURACY
    )
    per = docs.groupBy("source").agg(qs.alias("q"), F.count(F.lit(1)).alias("n"))
    glob = docs.groupBy(F.lit("__global__").alias("source")).agg(
        qs.alias("q"), F.count(F.lit(1)).alias("n")
    )
    return (
        per.unionByName(glob)
        .select(
            "source",
            F.col("q")[0].cast("bigint").alias("p50"),
            F.col("q")[1].cast("bigint").alias("p90"),
            F.col("q")[2].cast("bigint").alias("p99"),
            "n",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X6 — Count-Min sketch point estimates for the heavy-hitter candidates:
# the fourth mergeable sketch in the family (HLL distincts, MG candidates,
# GK quantiles, CMS counts). One corpus scan builds the depth×width counter
# table (bounded shuffle — map-side partial agg caps surviving rows at
# depth·width per task); point queries probe min-over-rows. CMS never
# undercounts; overshoot is ≤ 2n/width with prob ≥ 1−2^-depth per query.
# Rows-only: the sketch's collisions are hash-family-specific; tests pin
# the one-sided error and the ε-bound against exact counts. The
# build/merge/probe machinery is hash-exact oracled by
# x6_cms_arith_heavy_hitters below (arithmetic hash family).
# ---------------------------------------------------------------------------


@register("x6_cms_heavy_hitters", tags=("X6", "profile", "approx", "sketch"))
def x6_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (freq > n/50) annotated with their CMS estimate
    and the sketch's overshoot — exact vs sketch, side by side."""
    from realestatedeals_spark.operators.sketches import (
        cms_estimate,
        cms_table,
        heavy_hitters,
    )

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("term")
    )
    hh = heavy_hitters(tokens, "term", k=50)
    cms = cms_table(tokens, "term")
    est = cms_estimate(cms, hh.select("term"), "term")
    return (
        hh.join(est, "term")
        .select("term", "cnt", "cms_est", (F.col("cms_est") - F.col("cnt")).alias("overshoot"))
        .orderBy(F.desc("cnt"), F.asc("term"))
    )


# ---------------------------------------------------------------------------
# X6 — KMV/theta sketch SET OPERATIONS (round 7): approximate distinct
# union / intersection / difference between overlapping corpus slices —
# the sketch algebra HLL cannot do (its merge is union-only). Because the
# k-minimum-values construction is deterministic given the hash function,
# the ENTIRE estimator carries an exact value-hash oracle: DuckDB replays
# the same 48-bit md5 hashes, the same k-smallest selection, and the same
# estimate arithmetic, bit for bit — an *oracled approximate sketch*.
# Slices: A = texts of even doc_ids, B = texts of doc_ids % 3 == 0
# (membership computed per DISTINCT text so duplicate texts are handled
# set-correctly, not per-document).
# ---------------------------------------------------------------------------

_X6_KMV_ORACLE = """
WITH t AS (
  SELECT text,
         max(doc_id % 2 = 0) AS in_a,
         max(doc_id % 3 = 0) AS in_b
  FROM documents GROUP BY text),
h AS (
  SELECT (('0x' || substr(md5(text), 1, 12))::BIGINT + 1) / 281474976710656.0 AS u,
         in_a, in_b
  FROM t),
tags AS (
  SELECT 'a' AS tag, u FROM h WHERE in_a
  UNION ALL SELECT 'b', u FROM h WHERE in_b
  UNION ALL SELECT 'i', u FROM h WHERE in_a AND in_b
  UNION ALL SELECT 'o', u FROM h WHERE in_a OR in_b),
rk AS (SELECT tag, u, row_number() OVER (PARTITION BY tag ORDER BY u) AS rn FROM tags),
sk AS (SELECT tag,
              list_sort(list(u) FILTER (WHERE rn <= 64)) AS mins,
              CAST(sum(CASE WHEN rn <= 64 THEN 1 ELSE 0 END) AS BIGINT) AS cnt,
              CAST(count(*) AS BIGINT) AS n_exact
       FROM rk GROUP BY tag),
piv AS (SELECT
  (SELECT mins FROM sk WHERE tag = 'a') AS ma,
  (SELECT cnt  FROM sk WHERE tag = 'a') AS ca,
  (SELECT n_exact FROM sk WHERE tag = 'a') AS na,
  (SELECT mins FROM sk WHERE tag = 'b') AS mb,
  (SELECT cnt  FROM sk WHERE tag = 'b') AS cb,
  (SELECT n_exact FROM sk WHERE tag = 'b') AS nb,
  (SELECT n_exact FROM sk WHERE tag = 'i') AS ni,
  (SELECT n_exact FROM sk WHERE tag = 'o') AS no_),
est AS (SELECT *,
  CASE WHEN ca < 64 THEN 1.0 ELSE ma[64] END AS th_a,
  CASE WHEN cb < 64 THEN 1.0 ELSE mb[64] END AS th_b,
  list_sort(list_distinct(list_concat(ma, mb)))[1:64] AS mu
  FROM piv),
est2 AS (SELECT *,
  CASE WHEN ca < 64 THEN CAST(ca AS DOUBLE) ELSE 63.0 / ma[64] END AS est_a,
  CASE WHEN cb < 64 THEN CAST(cb AS DOUBLE) ELSE 63.0 / mb[64] END AS est_b,
  CASE WHEN len(mu) < 64 THEN CAST(len(mu) AS DOUBLE) ELSE 63.0 / mu[64] END AS est_union,
  CAST(len(list_filter(list_intersect(ma, mb), x -> x < least(th_a, th_b))) AS DOUBLE)
    / least(th_a, th_b) AS est_inter
  FROM est)
SELECT est_a, est_b, est_union, est_inter,
       est_a - est_inter AS est_diff_a,
       na AS exact_a, nb AS exact_b, ni AS exact_inter, no_ AS exact_union
FROM est2
"""


@register("x6_kmv_set_ops", oracle=_X6_KMV_ORACLE, tags=("X6", "profile", "sketch"))
def x6_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta sketch set algebra over two overlapping corpus slices
    (operators/sketches.py): one rank shuffle builds all four per-tag
    sketches; union is a k-array merge, intersection the theta estimator.
    Exact counts ride along in the same aggregation for comparison. The
    oracle replays every hash and estimate — approximate but bit-exact."""
    from realestatedeals_spark.operators.sketches import (
        KMV_K,
        kmv_estimate,
        kmv_hash,
        kmv_intersect_estimate,
        kmv_merge,
        kmv_theta,
    )
    from pyspark.sql import Window as W

    k = KMV_K
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = docs.groupBy("text").agg(
        F.max(F.col("doc_id") % 2 == 0).alias("in_a"),
        F.max(F.col("doc_id") % 3 == 0).alias("in_b"),
    )
    base = t.select(kmv_hash(F.col("text")).alias("u"), "in_a", "in_b")
    tag_arr = F.array(
        F.when(F.col("in_a"), F.lit("a")),
        F.when(F.col("in_b"), F.lit("b")),
        F.when(F.col("in_a") & F.col("in_b"), F.lit("i")),
        F.when(F.col("in_a") | F.col("in_b"), F.lit("o")),
    )
    tagged = base.select(
        F.explode(F.filter(tag_arr, lambda x: x.isNotNull())).alias("tag"), "u"
    )
    # two-stage k-smallest (see operators/sketches.kmv_sketch): partition-
    # local top-k first so no task ever sorts a whole tag's hash set
    local_rn = F.row_number().over(W.partitionBy("tag", "part").orderBy("u"))
    survivors = (
        tagged.withColumn("part", F.spark_partition_id())
        .withColumn("lrn", local_rn)
        .filter(F.col("lrn") <= k)
        .drop("lrn", "part")
    )
    rn = F.row_number().over(W.partitionBy("tag").orderBy("u"))
    sketches = (
        survivors.withColumn("rn", rn)
        .groupBy("tag")
        .agg(
            F.array_sort(F.collect_list(F.when(F.col("rn") <= k, F.col("u")))).alias("mins"),
            F.sum(F.when(F.col("rn") <= k, 1).otherwise(0)).alias("cnt"),
        )
    )
    # exact per-tag distinct counts come from the FULL tagged frame (a
    # plain partial-aggregated count, no sort), joined to the 4 sketch rows
    exacts = tagged.groupBy("tag").agg(F.count(F.lit(1)).alias("n_exact"))
    sk = sketches.join(exacts, "tag")

    def pick(col, tag):
        return F.max(F.when(F.col("tag") == tag, F.col(col)))

    piv = sk.groupBy().agg(
        pick("mins", "a").alias("ma"), pick("cnt", "a").alias("ca"),
        pick("n_exact", "a").alias("na"),
        pick("mins", "b").alias("mb"), pick("cnt", "b").alias("cb"),
        pick("n_exact", "b").alias("nb"),
        pick("n_exact", "i").alias("ni"), pick("n_exact", "o").alias("no_"),
    )
    mu = kmv_merge(F.col("ma"), F.col("mb"), k)
    est_a = kmv_estimate(F.col("ma"), F.col("ca"), k)
    est_b = kmv_estimate(F.col("mb"), F.col("cb"), k)
    est_union = kmv_estimate(mu, F.size(mu), k)
    est_inter = kmv_intersect_estimate(F.col("ma"), F.col("ca"), F.col("mb"), F.col("cb"), k)
    return piv.select(
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        est_union.alias("est_union"),
        est_inter.alias("est_inter"),
        (est_a - est_inter).alias("est_diff_a"),
        F.col("na").alias("exact_a"),
        F.col("nb").alias("exact_b"),
        F.col("ni").alias("exact_inter"),
        F.col("no_").alias("exact_union"),
    )


# ---------------------------------------------------------------------------
# X6 — engine-portable sketch companions (round 9): the HLL register state
# and the CMS counter table are deterministic given the hash primitive, so
# swapping Spark-internal hashes (HLL++ binary, xxhash64) for arithmetic
# ones (48-bit md5 prefix; affine family over the polynomial fingerprint)
# makes the ENTIRE distributed sketch machinery hash-exact oracle-checkable:
# register max-merge, cell count-merge, min-over-rows point queries. The
# production variants above stay primary (better mixing, native speed) with
# their error-bound pytests; these pin the mechanism bit-for-bit.
# ---------------------------------------------------------------------------

_X6_HLL_ARITH_ORACLE = """
WITH h AS (
  SELECT source, ('0x' || substr(md5(text), 1, 12))::BIGINT AS h48
  FROM documents),
rho AS (
  SELECT source, CAST(h48 % 256 AS INT) AS bucket,
         CAST(CASE WHEN h48 // 256 = 0 THEN 41
                   ELSE 41 - length(bin(h48 // 256)) END AS INT) AS rho
  FROM h),
state AS (
  SELECT source, bucket, max(rho) AS register FROM rho GROUP BY source, bucket)
SELECT source, bucket, CAST(register AS INT) AS register FROM state
UNION ALL
SELECT '__global__' AS source, bucket, CAST(max(register) AS INT) AS register
FROM state GROUP BY bucket
"""


@register(
    "x6_hll_arith_state", oracle=_X6_HLL_ARITH_ORACLE, tags=("X6", "profile", "sketch")
)
def x6_hll_arith_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL register state per source + '__global__' over content
    hashes. The global sketch is computed by MERGING the per-source states
    (elementwise register max — one groupBy over ≤ sources·256 rows), never
    by re-scanning the corpus: exactly the 100 TB rollup shape, and the merge
    itself is what the oracle hash-checks. operators/sketches.py:
    hll_arith_registers."""
    from realestatedeals_spark.operators.sketches import hll_arith_registers

    docs = load_table(spark, sf_dir, "documents")
    state = hll_arith_registers(docs, "source", "text")
    merged = (
        state.groupBy("bucket")
        .agg(F.max("register").alias("register"))
        .select(F.lit("__global__").alias("tag"), "bucket", "register")
    )
    return state.unionByName(merged).withColumnRenamed("tag", "source")


_X6_CMS_ARITH_ORACLE = """
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
clean AS (SELECT term FROM toks WHERE term <> ''),
tot AS (SELECT count(*) AS n FROM clean),
fp AS (
  SELECT term,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(string_split(term, ''), ch -> CAST(ascii(ch) AS BIGINT))),
                     (acc, c) -> (acc * 31 + c) % 1000000007) AS fp
  FROM (SELECT DISTINCT term FROM clean)),
ab AS (SELECT * FROM (VALUES (0, 31, 7), (1, 131, 11), (2, 257, 13), (3, 65537, 17)) t(row, a, b)),
cells AS (
  SELECT ab.row, CAST((ab.a * f.fp + ab.b) % 1000000007 % 2048 AS INT) AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM clean c JOIN fp f USING (term) CROSS JOIN ab
  GROUP BY ab.row, bucket),
hh AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cnt
  FROM clean, tot GROUP BY term, n HAVING count(*) * 100 > n),
probe AS (
  SELECT h.term, h.cnt, min(cl.cnt) AS cms_est
  FROM hh h JOIN fp f USING (term) CROSS JOIN ab
  JOIN cells cl ON cl.row = ab.row
              AND cl.bucket = CAST((ab.a * f.fp + ab.b) % 1000000007 % 2048 AS INT)
  GROUP BY h.term, h.cnt)
SELECT term, cnt, cms_est, cms_est - cnt AS overshoot FROM probe
"""


@register(
    "x6_cms_arith_heavy_hitters",
    oracle=_X6_CMS_ARITH_ORACLE,
    tags=("X6", "profile", "sketch"),
)
def x6_cms_arith_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (share > 1/100) annotated with their Count-Min
    estimate from the arithmetic-hash sketch — build, merge, and point-query
    all hash-exact against the oracle. Same candidate-prune + exact-recount
    heavy-hitter pass as x6_heavy_hitters; same one-scan CMS build shape as
    x6_cms_heavy_hitters."""
    from realestatedeals_spark.operators.sketches import (
        cms_arith_estimate,
        cms_arith_table,
        heavy_hitters,
    )

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    hh = heavy_hitters(tokens, col="term", k=100)
    cms = cms_arith_table(tokens, "term")
    est = cms_arith_estimate(cms, hh.select("term"), "term")
    return hh.join(est, "term").select(
        "term", "cnt", "cms_est", (F.col("cms_est") - F.col("cnt")).alias("overshoot")
    )


# ---------------------------------------------------------------------------
# X6 — mergeable binned-quantile sketch: fixed-width histogram over a shared
# global [min, max] grid, quantile = lower bound of the first bin whose
# cumulative count reaches ceil(p·n). Unlike GK/t-digest the state is
# deterministic (bin counts), merges by plain summation, and every step is
# integer arithmetic — the oracle-able member of the quantile family beside
# the rows-only percentile_approx variant. Estimate error is bounded by one
# bin width = (max-min+1)/1024.
# ---------------------------------------------------------------------------

_X6_BINQ_ORACLE = """
WITH bounds AS (
  SELECT min(n_chars) AS lo,
         (max(n_chars) - min(n_chars) + 1 + 1023) // 1024 AS w
  FROM documents),
bins AS (
  SELECT d.source, (d.n_chars - b.lo) // b.w AS bin, count(*) AS cnt
  FROM documents d, bounds b GROUP BY d.source, bin),
tagged AS (
  SELECT source, bin, cnt FROM bins
  UNION ALL
  SELECT '__global__', bin, sum(cnt) FROM bins GROUP BY bin),
cum AS (
  SELECT source, bin, cnt,
         sum(cnt) OVER (PARTITION BY source ORDER BY bin) AS c,
         sum(cnt) OVER (PARTITION BY source) AS n
  FROM tagged)
SELECT source, CAST(max(n) AS BIGINT) AS n,
       CAST(b.lo + min(CASE WHEN c >= (n + 1) // 2 THEN bin END) * b.w AS BIGINT) AS p50_est,
       CAST(b.lo + min(CASE WHEN c >= (9 * n + 9) // 10 THEN bin END) * b.w AS BIGINT) AS p90_est,
       CAST(b.lo + min(CASE WHEN c >= (99 * n + 99) // 100 THEN bin END) * b.w AS BIGINT) AS p99_est
FROM cum, bounds b
GROUP BY source, b.lo, b.w
"""


@register(
    "x6_binned_quantiles",
    oracle=_X6_BINQ_ORACLE,
    tags=("X6", "profile", "sketch"),
    bench=True,
)
def x6_binned_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of document length per source + '__global__' from the
    binned sketch. The global row is the MERGE of the per-source bin counts
    (plain sum over ≤ 1024-row states); quantile selection is a window
    cumsum over bins, never a sort of raw values. Integer ranks
    ceil(p·n) = (p_num·n + p_den - 1) // p_den keep both engines exact."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.min("n_chars").alias("lo"),
        ((F.max("n_chars") - F.min("n_chars") + 1 + 1023) / 1024)
        .cast("long")
        .alias("w"),
    )
    bins = (
        docs.crossJoin(F.broadcast(bounds))
        .select(
            "source",
            ((F.col("n_chars") - F.col("lo")) / F.col("w")).cast("long").alias("bin"),
        )
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tagged = bins.unionByName(
        bins.groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
        .select(F.lit("__global__").alias("source"), "bin", "cnt")
    )
    cum = tagged.select(
        "source",
        "bin",
        F.sum("cnt").over(W.partitionBy("source").orderBy("bin")).alias("c"),
        F.sum("cnt").over(W.partitionBy("source")).alias("n"),
    )
    # ranks are INTEGER floor-divisions — (num·n + den - 1) // den — so the
    # double `/` must be floored before comparing, or n=4 gives 2.5 vs the
    # oracle's 2 and the picked bin drifts by one
    pick = lambda rank: F.min(F.when(F.col("c") >= rank, F.col("bin")))  # noqa: E731
    n = F.col("n")
    out = cum.groupBy("source").agg(
        F.max("n").alias("n"),
        pick(F.floor((n + 1) / 2)).alias("b50"),
        pick(F.floor((9 * n + 9) / 10)).alias("b90"),
        pick(F.floor((99 * n + 99) / 100)).alias("b99"),
    )
    return out.crossJoin(F.broadcast(bounds)).select(
        "source",
        "n",
        (F.col("lo") + F.col("b50") * F.col("w")).cast("long").alias("p50_est"),
        (F.col("lo") + F.col("b90") * F.col("w")).cast("long").alias("p90_est"),
        (F.col("lo") + F.col("b99") * F.col("w")).cast("long").alias("p99_est"),
    )
