"""X4 — distributed Stupid-Backoff n-gram LM (Brants et al. 2007, "Large
Language Models in Machine Translation"): train trigram/bigram/unigram
count tables on one half of the corpus, score the held-out half, and
filter low-quality documents CCNet-style (Wenzek et al. 2019 score the
crawl with an LM trained on a clean corpus and keep the best buckets).

Stupid Backoff was designed FOR this execution model: the paper's point
is that at MapReduce scale you skip Kneser-Ney normalization entirely and
use raw relative frequencies with a fixed backoff multiplier,

    S(w | u,v) = c(uvw)/c(uv)        if c(uvw) > 0
               = 0.4 * c(vw)/c(v)    else if c(vw) > 0
               = 0.4^2 * c(w)/N      else if c(w) > 0
               = 0                   else (OOV)

so training is nothing but count group-bys and scoring is nothing but
count-table joins — no per-token Python, no driver state, every stage a
plain shuffle that survives a 1000-executor 100 TB corpus (the model
tables shuffle-join against the scored positions exactly like the paper's
"batched lookup"; a small model would broadcast, but nothing here assumes
it fits).

Exactness discipline: scores use ONLY +,*,/ on doubles derived from exact
BIGINT counts — no log/exp — so Spark (JVM) and DuckDB (libm) produce
bit-identical doubles, and per-position scores round to int64 micros via
the engine-portable floor(x*1e6 + 0.5) before any SUM (the tpch_q1
pattern, plans/tpch.py:_micros6). Every aggregate is therefore
associative-exact and the oracles hash-exactly.

Train/score split: the model trains on even doc_ids and scores odd
doc_ids, so the backoff branches are genuinely load-bearing (scoring the
training corpus would always hit the trigram table). No counterpart in
the reference repo (no text pipeline); built for the engine's X4 layer
(SURVEY.md §2b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.plans.registry import register
from realestatedeals_spark.plans.tpch import _micros6
from realestatedeals_spark.session import apply_session_conf

# 0.4 and 0.16 are exactly the doubles both engines parse from these
# literals; products/divisions on them are IEEE-deterministic.
_ALPHA = 0.4
_ALPHA2 = 0.16


def _words(df: DataFrame) -> DataFrame:
    """doc_id + the non-empty whitespace token array (fixture docs are
    space-joined words, the same tokenization every X4 query uses)."""
    return df.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != F.lit("")).alias("ws"),
    )


def _ngrams(df: DataFrame, n: int) -> DataFrame:
    """Explode order-n grams per document — pure per-row array transforms
    (posexplode over a transform(sequence(...)) lattice), zero shuffles.
    Docs shorter than n contribute nothing (pre-filtered, which is what
    exploding an empty array would do anyway — but Spark's sequence(0, k)
    DESCENDS for k < 0, so the filter is load-bearing)."""
    fields = ", ".join(f"ws[i+{j}] AS g{j}" for j in range(n))
    return (
        df.filter(F.size("ws") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(f"transform(sequence(0, size(ws)-{n}), i -> struct({fields}))")
            ).alias("g"),
        )
        .select("doc_id", "g.*")
    )


def _agg_counts(docs: DataFrame) -> DataFrame:
    """ALL THREE n-gram count tables of one (doc_id, text) frame in one
    pass (round 12, guide §1.2/§2.4): one per-position explode carries
    (token, next, next²) — ``get`` returns NULL past the array end — and
    GROUPING SETS ((g0,g1,g2), (g0,g1), (g0)) counts every order through a
    single scan, Expand, and exchange instead of three tokenize+explode+
    shuffle pipelines over the same frame. Rows: (g0, g1, g2, c, gid) with
    gid 0=trigram set, 1=bigram set, 3=unigram set; a slice's own key
    columns can still be NULL from DATA (positions near the document end)
    — the per-table filters in ``_model_from_agg`` drop exactly those,
    reproducing the length-(n-1) cutoffs of the old per-order explodes
    bit-for-bit (verified rowset-identical at sf0.01). Counts are additive
    per (gid, g0, g1, g2) cell, so frames of this shape FOLD by group-sum
    — the streaming delta commits (c15b) rely on exactly that."""
    ex = _words(docs).select(
        F.expr(
            "explode(transform(ws, (x, i) -> "
            "struct(x AS g0, get(ws, i+1) AS g1, get(ws, i+2) AS g2)))"
        ).alias("g")
    ).select("g.g0", "g.g1", "g.g2")
    return ex.groupingSets(
        [["g0", "g1", "g2"], ["g0", "g1"], ["g0"]], "g0", "g1", "g2"
    ).agg(F.count(F.lit(1)).alias("c"), F.grouping_id().alias("gid"))


def _model_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The combined count frame of the training half (even doc_ids)."""
    return _agg_counts(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    )


def _model_from_agg(agg: DataFrame):
    """(tri, big, uni, total) sliced from the combined count frame —
    schemas and row contents identical to the old per-order aggregates."""
    tri = agg.filter((F.col("gid") == 0) & F.col("g2").isNotNull()).select(
        F.col("g0").alias("u"),
        F.col("g1").alias("v"),
        F.col("g2").alias("w"),
        F.col("c").alias("c_uvw"),
    )
    big = agg.filter((F.col("gid") == 1) & F.col("g1").isNotNull()).select(
        F.col("g0").alias("u"), F.col("g1").alias("v"), F.col("c").alias("c_uv")
    )
    uni = agg.filter(F.col("gid") == 3).select(
        F.col("g0").alias("w"), F.col("c").alias("c_w")
    )
    total = uni.agg(F.sum("c_w").alias("n_total"))
    return tri, big, uni, total


def _model(spark: SparkSession, sf_dir: str):
    """Count tables of the stupid-backoff model, trained on even doc_ids.

    Per-order explode+aggregate pipelines, NOT the combined GROUPING SETS
    frame: in a single uncached batch plan every use of a count table would
    drag its own copy of the 3-way Expand along (12 Expand nodes in the r12
    after-plan — each expands every exploded position 3× only for the
    pushed gid filter to discard 2/3), which the driver measured at
    0.49–0.79× (r12 PERF). The combined ``_agg_counts`` form is the right
    shape ONLY where the frame is materialized once and sliced — c16 caches
    it, c15b's deltas fold it — and those paths build it directly via
    ``_model_agg``/``_model_from_agg``. Row contents of the two forms are
    identical (verified rowset-identical at sf0.01 in r12)."""
    train = _words(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    )
    tri = (
        _ngrams(train, 3)
        .groupBy(F.col("g0").alias("u"), F.col("g1").alias("v"), F.col("g2").alias("w"))
        .agg(F.count(F.lit(1)).alias("c_uvw"))
    )
    big = (
        _ngrams(train, 2)
        .groupBy(F.col("g0").alias("u"), F.col("g1").alias("v"))
        .agg(F.count(F.lit(1)).alias("c_uv"))
    )
    uni = (
        _ngrams(train, 1)
        .groupBy(F.col("g0").alias("w"))
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    total = uni.agg(F.sum("c_w").alias("n_total"))
    return tri, big, uni, total


_LM_TRAIN_ORACLE = """
WITH tw AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents WHERE doc_id % 2 = 0
),
tri AS (
  SELECT g.u AS u, g.v AS v, g.w AS w FROM (
    SELECT unnest(list_transform(range(0, len(ws) - 2),
                  i -> {'u': ws[i+1], 'v': ws[i+2], 'w': ws[i+3]})) AS g
    FROM tw)
),
tric AS (SELECT u, v, w, CAST(count(*) AS BIGINT) AS c_uvw FROM tri GROUP BY u, v, w),
big AS (
  SELECT g.u AS u, g.v AS v FROM (
    SELECT unnest(list_transform(range(0, len(ws) - 1),
                  i -> {'u': ws[i+1], 'v': ws[i+2]})) AS g
    FROM tw)
),
bigc AS (SELECT u, v, CAST(count(*) AS BIGINT) AS c_uv FROM big GROUP BY u, v)
SELECT tric.u AS u, tric.v AS v, tric.w AS w, tric.c_uvw AS c_uvw,
       bigc.c_uv AS c_uv,
       CAST(floor(CAST(tric.c_uvw AS DOUBLE) / CAST(bigc.c_uv AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS p_micros
FROM tric JOIN bigc ON tric.u = bigc.u AND tric.v = bigc.v
ORDER BY c_uvw DESC, u, v, w
LIMIT 100
"""


@register("x4_lm_backoff_train", oracle=_LM_TRAIN_ORACLE, tags=("X4", "text", "lm"), bench=True)
def x4_lm_backoff_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained model's head: top-100 trigrams by count with their
    relative-frequency score in micros. Counting is one explode + one
    group-by per order; the top-k is a TakeOrdered (no global sort)."""
    apply_session_conf(spark)
    tri, big, _, _ = _model(spark, sf_dir)
    p = F.col("c_uvw").cast("double") / F.col("c_uv").cast("double")
    return (
        tri.join(big, ["u", "v"])
        .select("u", "v", "w", "c_uvw", "c_uv", _micros6(p).alias("p_micros"))
        .orderBy(F.col("c_uvw").desc(), "u", "v", "w")
        .limit(100)
    )


# Scoring CTEs shared by the score and filter oracles: held-out (odd
# doc_id) trigram positions left-joined against every backoff level's
# count table, scored with the pure-arithmetic cascade above.
_LM_SCORE_CTES = """
WITH tw AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents WHERE doc_id % 2 = 0
),
tric AS (
  SELECT g.u AS u, g.v AS v, g.w AS w, CAST(count(*) AS BIGINT) AS c_uvw FROM (
    SELECT unnest(list_transform(range(0, len(ws) - 2),
                  i -> {'u': ws[i+1], 'v': ws[i+2], 'w': ws[i+3]})) AS g
    FROM tw) GROUP BY u, v, w
),
bigc AS (
  SELECT g.u AS u, g.v AS v, CAST(count(*) AS BIGINT) AS c_uv FROM (
    SELECT unnest(list_transform(range(0, len(ws) - 1),
                  i -> {'u': ws[i+1], 'v': ws[i+2]})) AS g
    FROM tw) GROUP BY u, v
),
unic AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c_w FROM (
    SELECT unnest(ws) AS w FROM tw) GROUP BY w
),
tot AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_total FROM unic),
held AS (
  SELECT doc_id, g.u AS u, g.v AS v, g.w AS w FROM (
    SELECT doc_id,
           unnest(list_transform(range(0, len(ws) - 2),
                  i -> {'u': ws[i+1], 'v': ws[i+2], 'w': ws[i+3]})) AS g
    FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
          FROM documents WHERE doc_id % 2 = 1))
),
pos AS (
  SELECT h.doc_id,
         CASE WHEN t.c_uvw IS NOT NULL THEN 3
              WHEN bvw.c_uv IS NOT NULL THEN 2
              WHEN uw.c_w IS NOT NULL THEN 1
              ELSE 0 END AS lvl,
         CASE WHEN t.c_uvw IS NOT NULL
                THEN CAST(t.c_uvw AS DOUBLE) / CAST(buv.c_uv AS DOUBLE)
              WHEN bvw.c_uv IS NOT NULL
                THEN 0.4 * (CAST(bvw.c_uv AS DOUBLE) / CAST(uv2.c_w AS DOUBLE))
              WHEN uw.c_w IS NOT NULL
                THEN 0.16 * (CAST(uw.c_w AS DOUBLE) / CAST(tot.n_total AS DOUBLE))
              ELSE 0.0 END AS s
  FROM held h
  LEFT JOIN tric t ON h.u = t.u AND h.v = t.v AND h.w = t.w
  LEFT JOIN bigc buv ON h.u = buv.u AND h.v = buv.v
  LEFT JOIN bigc bvw ON h.v = bvw.u AND h.w = bvw.v
  LEFT JOIN unic uv2 ON h.v = uv2.w
  LEFT JOIN unic uw ON h.w = uw.w
  CROSS JOIN tot
),
scored AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_pos,
         CAST(sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT) AS tri_hits,
         CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS bigram_backoffs,
         CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS unigram_backoffs,
         CAST(sum(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS oov,
         CAST(sum(CAST(floor(s * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS score_sum_micros,
         CAST(floor(CAST(sum(CAST(floor(s * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS avg_score_micros
  FROM pos GROUP BY doc_id
)
"""

_LM_SCORE_ORACLE = _LM_SCORE_CTES + """
SELECT * FROM scored
"""

_LM_FILTER_ORACLE = _LM_SCORE_CTES + """
SELECT d.doc_id AS doc_id, d.lang AS lang, d.source AS source,
       s.avg_score_micros AS avg_score_micros, s.tri_hits AS tri_hits,
       s.n_pos AS n_pos
FROM scored s JOIN documents d USING (doc_id)
WHERE s.oov = 0
  AND 10 * s.tri_hits >= 5 * s.n_pos
  AND s.avg_score_micros >= 25000
"""


def _score_held_out(spark: SparkSession, sf_dir: str) -> DataFrame:
    tri, big, uni, total = _model(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 1)
    return score_documents(docs, (tri, big, uni, total))


def ngram_count_lookup(model) -> DataFrame:
    """The model's three count tables as ONE (g, c) lookup keyed by the
    n-gram STRING: tokens come from split(text, ' ') and can never contain
    a space, so "u v w" / "u v" / "w" are collision-free across orders by
    construction (the space count encodes the order). A caller that scores
    MANY batches against the same static model (c16's foreachBatch loop)
    materializes this once and passes it to ``score_documents`` — all five
    count probes then share a single canonically-identical broadcast build
    per scoring job instead of five (and the three slice scans run once at
    materialization instead of five times per epoch)."""
    tri, big, uni, _ = model
    return (
        tri.select(F.concat_ws(" ", "u", "v", "w").alias("g"), F.col("c_uvw").alias("c"))
        .unionByName(
            big.select(F.concat_ws(" ", "u", "v").alias("g"), F.col("c_uv").alias("c"))
        )
        .unionByName(uni.select(F.col("w").alias("g"), F.col("c_w").alias("c")))
    )


def score_documents(
    docs: DataFrame,
    model,
    salt_unigrams: int | None = None,
    lookup: DataFrame | None = None,
) -> DataFrame:
    """Stupid-backoff scoring of ``docs`` (doc_id, text) against a trained
    model — ONE definition shared by the batch query and the streaming
    scorer (c16), so their oracle equivalence is by construction.

    ``salt_unigrams``: the five count-table joins key on raw token
    n-grams; natural language is Zipf-distributed, so the SINGLE-token
    (unigram) joins have the hottest keys — at real corpus scale the head
    token holds ~5-25% of all positions, and when the unigram table
    outgrows the broadcast threshold the resulting sort-merge join puts
    that whole key in one partition. Passing a salt count routes the two
    unigram joins through ``operators/skew.salted_join`` (deterministic
    hash salt, result row-identical — pinned exactly-equal by
    tests/test_lm_skew.py on a Zipf corpus, and measured in SCALE.md
    "Zipf skew"). Default None keeps the plain joins: at fixture scale
    Catalyst broadcasts the count tables and no shuffle skew exists.
    Higher-order n-gram keys flatten fast (the hot (the,the) bigram is
    p²), so salting beyond the unigram joins buys little.

    ``lookup``: a MATERIALIZED ``ngram_count_lookup(model)`` frame (round
    13, guide §2.4). When given, the five per-table probes become five
    left joins against this one frame — canonically identical build sides,
    so one broadcast build per scoring job — which is the repeated-scoring
    shape (c16: per-epoch execute 0.56 → 0.27 s, rowset-identical by the
    space-count key argument above and pinned by the oracle and
    tests/test_streaming_lm.py). Single-shot batch queries keep the plain
    per-table joins: there the lookup union must be recomputed inside the
    query and measured SLOWER (0.93 → 1.41 s, see OPTIMIZATION_r13.md
    rejected experiments). Mutually exclusive with ``salt_unigrams``."""
    tri, big, uni, total = model
    held = _ngrams(_words(docs), 3).select(
        "doc_id", F.col("g0").alias("u"), F.col("g1").alias("v"), F.col("g2").alias("w")
    )

    if lookup is not None:
        assert not salt_unigrams, "lookup and salt_unigrams are mutually exclusive"
        pos = held
        for i, (out, probe) in enumerate(
            (
                ("c_uvw", F.concat_ws(" ", "u", "v", "w")),
                ("c_buv", F.concat_ws(" ", "u", "v")),
                ("c_bvw", F.concat_ws(" ", "v", "w")),
                ("c_v", F.col("v")),
                ("c_w", F.col("w")),
            )
        ):
            lx = lookup.alias(f"_lm_l{i}")
            pos = (
                pos.join(lx, probe == F.col(f"_lm_l{i}.g"), "left")
                .withColumn(out, F.col(f"_lm_l{i}.c"))
                .drop(F.col(f"_lm_l{i}.g"))
                .drop(F.col(f"_lm_l{i}.c"))
            )
    else:
        pos = (
            held.join(tri, ["u", "v", "w"], "left")
            .join(big.withColumnRenamed("c_uv", "c_buv"), ["u", "v"], "left")
            .join(
                big.select(
                    F.col("u").alias("v"), F.col("v").alias("w"), F.col("c_uv").alias("c_bvw")
                ),
                ["v", "w"],
                "left",
            )
        )
        uni_v = uni.select(F.col("w").alias("v"), F.col("c_w").alias("c_v"))
        if salt_unigrams:
            from realestatedeals_spark.operators.skew import salted_join

            pos = salted_join(pos, uni_v, ["v"], "left", salt=salt_unigrams)
            pos = salted_join(pos, uni, ["w"], "left", salt=salt_unigrams)
        else:
            pos = pos.join(uni_v, ["v"], "left").join(uni, ["w"], "left")
    # the model total is ONE row — broadcast cross is bounded by
    # construction (whitelisted in tests/test_plan_quality.py)
    pos = pos.crossJoin(F.broadcast(total))
    lvl = (
        F.when(F.col("c_uvw").isNotNull(), F.lit(3))
        .when(F.col("c_bvw").isNotNull(), F.lit(2))
        .when(F.col("c_w").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
    )
    s = (
        F.when(
            F.col("c_uvw").isNotNull(),
            F.col("c_uvw").cast("double") / F.col("c_buv").cast("double"),
        )
        .when(
            F.col("c_bvw").isNotNull(),
            F.lit(_ALPHA) * (F.col("c_bvw").cast("double") / F.col("c_v").cast("double")),
        )
        .when(
            F.col("c_w").isNotNull(),
            F.lit(_ALPHA2)
            * (F.col("c_w").cast("double") / F.col("n_total").cast("double")),
        )
        .otherwise(F.lit(0.0))
    )
    sum_micros = F.sum("s_micros").cast("long")
    return (
        pos.select("doc_id", lvl.alias("lvl"), _micros6(s).alias("s_micros"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            F.sum(F.when(F.col("lvl") == 3, 1).otherwise(0)).cast("long").alias("tri_hits"),
            F.sum(F.when(F.col("lvl") == 2, 1).otherwise(0))
            .cast("long")
            .alias("bigram_backoffs"),
            F.sum(F.when(F.col("lvl") == 1, 1).otherwise(0))
            .cast("long")
            .alias("unigram_backoffs"),
            F.sum(F.when(F.col("lvl") == 0, 1).otherwise(0)).cast("long").alias("oov"),
            sum_micros.alias("score_sum_micros"),
            F.floor(
                sum_micros.cast("double") / F.count(F.lit(1)).cast("double") + F.lit(0.5)
            )
            .cast("long")
            .alias("avg_score_micros"),
        )
    )


@register("x4_lm_backoff_score", oracle=_LM_SCORE_ORACLE, tags=("X4", "text", "lm"), bench=True)
def x4_lm_backoff_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every held-out document against the trained model: per-doc
    position count, hits per backoff level, and the micros-exact summed /
    averaged stupid-backoff score. Five left joins against count tables —
    the paper's batched distributed lookup, one shuffle each."""
    apply_session_conf(spark)
    return _score_held_out(spark, sf_dir)


@register("x4_lm_perplexity_filter", oracle=_LM_FILTER_ORACLE, tags=("X4", "text", "lm"), bench=True)
def x4_lm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus filter on the LM score: keep held-out docs with
    no OOV positions, a ≥50% trigram hit rate, and an average position
    score ≥ 0.025 (25000 micros) — thresholds load-bearing on BOTH the
    driver fixture (trigram hit rate binds: 29/250 survive) and the
    generated scale corpora (average score binds: ~75% survive at
    gen-sf0.1, where the old 50000-micros cut kept zero rows, a fixture
    blind spot the slope sweep caught). Integer-exact predicates over the scored
    table joined back to the corpus — the filter composes into any
    downstream pipeline as one more pushed-down predicate."""
    apply_session_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    scored = _score_held_out(spark, sf_dir)
    return (
        scored.filter(
            (F.col("oov") == 0)
            & (F.lit(10) * F.col("tri_hits") >= F.lit(5) * F.col("n_pos"))
            & (F.col("avg_score_micros") >= 25000)
        )
        .join(docs, "doc_id")
        .select("doc_id", "lang", "source", "avg_score_micros", "tri_hits", "n_pos")
    )


# ---------------------------------------------------------------------------
# X4/X7 — CCNet's last two steps over the LM scores: quality BUCKETS and
# bucket-dependent deterministic SAMPLING (Wenzek et al. 2019 keep the
# head/middle perplexity buckets of the crawl at higher rates than the
# tail). Bands are fixed integer cuts of avg_score_micros (scale-free, no
# global sort/percentile — a band is a pure function of the doc's own
# score); sampling is the engine's md5-prefix-threshold draw (membership
# is a pure function of doc_id — retry/partitioning independent), at a
# per-band rate: head 90%, middle 50%, tail 10%.
# ---------------------------------------------------------------------------

# least(avg_score_micros // 10000, 9): 10 bands of 0.01 average score each
_BAND = "least(CAST(floor(avg_score_micros / 10000) AS BIGINT), 9)"
# md5-prefix keep thresholds per band tier (60-bit hex, engine-portable)
_T_HEAD, _T_MID, _T_TAIL = "e66666666666680", "800000000000000", "1999999999999a0"

_LM_BUCKETS_ORACLE = _LM_SCORE_CTES + f"""
SELECT {_BAND} AS band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_pos) AS BIGINT) AS total_positions,
       CAST(min(avg_score_micros) AS BIGINT) AS min_avg,
       CAST(max(avg_score_micros) AS BIGINT) AS max_avg
FROM scored GROUP BY {_BAND}
"""

_LM_BUCKET_SAMPLE_ORACLE = _LM_SCORE_CTES + f"""
SELECT doc_id, {_BAND} AS band, avg_score_micros
FROM scored
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) <
      CASE WHEN {_BAND} >= 5 THEN '{_T_HEAD}'
           WHEN {_BAND} >= 3 THEN '{_T_MID}'
           ELSE '{_T_TAIL}' END
"""


def _band_col() -> F.Column:
    return F.least(
        F.floor(F.col("avg_score_micros") / 10000).cast("long"), F.lit(9)
    ).alias("band")


@register("x4_lm_quality_buckets", oracle=_LM_BUCKETS_ORACLE, tags=("X4", "text", "lm"))
def x4_lm_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band corpus statistics over the LM scores — CCNet's bucket
    histogram. One extra group-by over the scored table; bands are fixed
    integer cuts, so no global sort or percentile enters the plan."""
    apply_session_conf(spark)
    return (
        _score_held_out(spark, sf_dir)
        .select(_band_col(), "n_pos", "avg_score_micros")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_pos").cast("long").alias("total_positions"),
            F.min("avg_score_micros").alias("min_avg"),
            F.max("avg_score_micros").alias("max_avg"),
        )
    )


@register(
    "x7_lm_bucket_sample", oracle=_LM_BUCKET_SAMPLE_ORACLE, tags=("X7", "sampling", "lm")
)
def x7_lm_bucket_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-dependent deterministic sampling: keep head bands (>=5) at
    90%, middle (3-4) at 50%, tail at 10%, by the md5-prefix-threshold
    draw — membership is a pure function of doc_id, so the kept set is
    identical under retries and any partitioning, and the oracle checks
    the REAL kept rows."""
    apply_session_conf(spark)
    scored = _score_held_out(spark, sf_dir).select(
        "doc_id", _band_col(), "avg_score_micros"
    )
    thr = (
        F.when(F.col("band") >= 5, F.lit(_T_HEAD))
        .when(F.col("band") >= 3, F.lit(_T_MID))
        .otherwise(F.lit(_T_TAIL))
    )
    return scored.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15) < thr
    ).select("doc_id", "band", "avg_score_micros")
