"""X7/X8 — deterministic sampling, dataset splitting, and corpus-pipeline
composites for training pipelines.

A 100 TB corpus is never trained on wholesale: it is split (train/valid/
test), stratified (per-language quotas), and subsampled — and every one of
those operations must be DETERMINISTIC so that reruns, backfills, and
incremental appends land each document in the same split. ``rand()`` fails
that bar (retry/partitioning dependent); content-hash assignment does not.

The reference has no sampling at all (its corpus is 6k rows,
/root/reference/listings.csv); these are engine additions mandated by the
north star alongside X1-X6.

Portability note: the split hash is the first hex character of
``md5(cast(key as string))`` — md5 is bit-identical across Spark, DuckDB,
and every other engine, so the oracle checks the REAL assignment, not a
lookalike. 16 hex buckets give 12/2/2 = 75%/12.5%/12.5% splits.

Scale notes (100 TB discipline):
- ``x7_hash_split`` is a narrow map + one partial-agg shuffle of ≤3 rows —
  no data movement beyond the final 3-row reduce.
- ``x7_stratified_sample`` shuffles once on ``lang`` for the per-group
  window. Quota-per-group top-N keeps only N rows per partition after the
  rank filter. With few giant strata the window sort dominates; the hash
  rank is uniform, so at scale you pre-filter with an approximate per-lang
  hash threshold (keep ~2N by hash range, exact-rank the survivors) — at
  fixture scale the direct window is the honest plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.plans.registry import register

_SPLIT_SQL_CASE = """
CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'valid'
     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e', 'f') THEN 'test'
     ELSE 'train' END
"""

_X7_SPLIT_ORACLE = f"""
SELECT {_SPLIT_SQL_CASE} AS split,
       COUNT(*) AS n_docs,
       SUM(CAST(n_chars AS BIGINT)) AS total_chars
FROM documents
GROUP BY split
"""


def _split_col() -> F.Column:
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return (
        F.when(h.isin("c", "d"), F.lit("valid"))
        .when(h.isin("e", "f"), F.lit("test"))
        .otherwise(F.lit("train"))
    )


@register("x7_hash_split", oracle=_X7_SPLIT_ORACLE, tags=("X7", "sampling"))
def x7_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 75/12.5/12.5 train/valid/test split by content-hash."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(_split_col().alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
        )
    )


_X7_STRAT_ORACLE = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents)
WHERE rn <= 40
"""


def stratified_sample(
    docs: DataFrame, quota: int = 40, prefilter: bool = True, safety: float = 3.0
) -> DataFrame:
    """Per-group quota sample: ``quota`` docs per lang, ranked by content
    hash (a uniform, reproducible draw — no seed state to ship around).

    Scale path (``prefilter=True``): with giant strata, the naive plan
    full-sorts every stratum inside the window. Instead, keep only rows
    whose 60-bit md5 prefix falls below a per-lang threshold sized to pass
    ~``safety × quota`` rows (md5 hex sorts lexicographically = numerically,
    so the numeric prefix cut keeps a strict prefix of the hash order), then
    exact-rank the survivors. The window then sorts O(safety × quota) rows
    per lang, not the stratum. EXACTNESS GUARD: per-lang survivor counts are
    checked against min(quota, stratum size); any shortfall (probability
    ~e^{-quota·safety·(1−1/safety)²/2} per lang — negligible, but not zero)
    falls back to the full window, so the output is always identical to the
    unfiltered plan. Cost: one tiny per-lang count agg (n_langs rows to the
    driver) before the scan.
    """
    base = docs.select(
        "doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    w = Window.partitionBy("lang").orderBy(F.col("h"), F.col("doc_id"))
    ranked = lambda df: (  # noqa: E731
        df.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= quota)
        .select("doc_id", "lang")
    )
    if not prefilter:
        return ranked(base)

    counts = {r["lang"]: r["c"] for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
    space = float(16**15)  # 60-bit prefix of the md5 hex
    cut_entries = []
    for lang, c in counts.items():
        if lang is None:
            continue  # null-lang rows are kept unconditionally below; a
            # None map key would fail at execution ("Cannot use null as
            # map key") and null never equals a lookup key anyway.
        frac = min(1.0, safety * quota / max(c, 1))
        cut_entries += [F.lit(lang), F.lit(int(frac * space))]
    if not cut_entries:
        return ranked(base)  # every row null-lang — nothing to prefilter
    cut = F.create_map(*cut_entries)[F.col("lang")]
    pref = F.conv(F.substring("h", 1, 15), 16, 10).cast("long")
    kept = base.filter((pref < cut) | F.col("lang").isNull())
    survivors = {r["lang"]: r["c"] for r in
                 kept.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
    for lang, c in counts.items():
        if survivors.get(lang, 0) < min(quota, c):
            return ranked(base)  # exactness guard — never emit a short stratum
    return ranked(kept)


@register(
    "x7_stratified_sample", oracle=_X7_STRAT_ORACLE, tags=("X7", "sampling", "window"), bench=True
)
def x7_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sample (40/lang) with the hash-threshold
    pre-filter on — exact output, window sort bounded per stratum."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, quota=40, prefilter=True)


# ---------------------------------------------------------------------------
# X7 — deterministic weighted mixture sampling: every training run mixes
# sources at target rates (e.g. 90% of English, 25% of zh). rand() sampling
# is retry/partitioning-dependent; instead each (lang → rate) becomes a
# 60-bit md5-prefix threshold, so membership is a pure function of doc_id.
# The filter is narrow (no shuffle); only the per-lang accounting reduces.
# md5 hex is lowercase and fixed-width on every engine, so the string
# comparison is portable and the oracle checks the REAL kept set.
# ---------------------------------------------------------------------------

MIXTURE_WEIGHTS = {"en": 0.9, "fr": 0.75, "de": 0.5, "es": 0.5, "zh": 0.25}


def _hex_threshold(frac: float) -> str:
    return format(int(frac * 16**15), "015x")


_X7_MIX_ORACLE = (
    "WITH kept AS (SELECT lang, text FROM documents WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) < CASE lang "
    + " ".join(
        f"WHEN '{lang}' THEN '{_hex_threshold(w)}'" for lang, w in MIXTURE_WEIGHTS.items()
    )
    + " ELSE '000000000000000' END) "
    + """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT)
         AS total_tokens
FROM kept GROUP BY lang
"""
)


@register("x7_mixture_sample", oracle=_X7_MIX_ORACLE, tags=("X7", "sampling", "mixture"))
def x7_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted mixture: keep each doc iff its 60-bit md5
    prefix falls under its language's rate threshold; report per-lang doc
    and token counts of the kept mix. Same narrow-filter shape at any
    scale — membership never needs a shuffle, a seed, or driver state."""
    docs = load_table(spark, sf_dir, "documents")
    thresholds = F.create_map(
        *[x for lang, w in MIXTURE_WEIGHTS.items() for x in (F.lit(lang), F.lit(_hex_threshold(w)))]
    )
    cut = F.coalesce(thresholds[F.col("lang")], F.lit("000000000000000"))
    kept = docs.filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15) < cut)
    n_tokens = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens.cast("bigint")).alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# X8 — end-to-end corpus cleaning: quality gate → exact near-identical dedup
# → per-language accounting. The composite every training-data run starts
# with, expressed as ONE lazy plan (filter is narrow; dedup is one shuffle on
# the content hash; accounting partial-aggregates). At 100 TB the content
# hash shuffles 16 bytes + key columns per doc, never the text.
# ---------------------------------------------------------------------------

_X8_CLEAN_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang, text, n_chars,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens
  FROM documents),
qual AS (
  SELECT * FROM toks
  WHERE n_tokens >= 10 AND CAST(n_chars AS DOUBLE) / n_tokens BETWEEN 3 AND 12),
dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM qual)
  WHERE rn = 1)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens
FROM dedup GROUP BY lang
"""


@register("x8_corpus_clean", oracle=_X8_CLEAN_ORACLE, tags=("X8", "pipeline", "dedup"))
def x8_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter, content-hash dedup (first doc_id wins), per-lang totals."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    toks = docs.select("doc_id", "lang", "text", "n_chars", n_tokens.alias("n_tokens"))
    qual = toks.filter(
        (F.col("n_tokens") >= 10)
        & (F.col("n_chars").cast("double") / F.col("n_tokens")).between(3, 12)
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dedup = qual.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return dedup.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_tokens").cast("bigint")).alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# X8 — benchmark decontamination: flag corpus docs sharing any 4-gram with
# the eval/benchmark set (here: every 50th doc stands in for the eval set).
# Scale shape: eval sets are tiny relative to the corpus, so their distinct
# shingle set broadcasts and the probe is a narrow broadcast-hash join over
# the corpus shingles — no shuffle of corpus text or IDs until the tiny
# per-hit aggregation. Shingles are 64-bit hashes (operators/dedup.py), so
# the broadcast carries longs; the oracle uses string shingles — identical
# up to 2^-64 hash collisions.
# ---------------------------------------------------------------------------

_X8_DECON_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(t) - 3, 0) + 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])))
         AS shingle
  FROM toks),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM sh s JOIN ev USING (shingle)
WHERE s.doc_id % 50 <> 0
GROUP BY s.doc_id
"""


@register("x8_decontaminate", oracle=_X8_DECON_ORACLE, tags=("X8", "pipeline", "dedup"))
def x8_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: corpus docs sharing ≥1 distinct 4-gram with
    the eval set, with the shared-shingle count per flagged doc. k=4 at
    fixture vocabulary; production decontamination uses k≈13."""
    from realestatedeals_spark.operators.dedup import shingle_table

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_table(docs, k=4)
    ev = sh.filter(F.col("_id") % 50 == 0).select("shingle").distinct()
    # No broadcast hint: the fixture's "eval set" is defined as 2% of the
    # corpus, so its shingle table scales with data. Real eval sets are
    # bounded (AQE will broadcast them at runtime); hinting here would bake
    # a corpus-proportional broadcast into the plan.
    return (
        sh.filter(F.col("_id") % 50 != 0)
        .join(ev, "shingle")
        .groupBy(F.col("_id").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


# ---------------------------------------------------------------------------
# X8 — token-budget shard assignment: writing a corpus as ~budget-token
# output shards, per language, order-preserving. The running-total window is
# one shuffle on lang; at scale the same plan runs per (lang, date-bucket) so
# no single partition holds a whole language.
# ---------------------------------------------------------------------------

_X8_SHARDS_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, lang, n_tokens,
         SUM(CAST(n_tokens AS BIGINT)) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS before_toks
  FROM toks)
SELECT lang, CAST(FLOOR(COALESCE(before_toks, 0) / 2000) AS BIGINT) AS shard,
       COUNT(*) AS n_docs, CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS shard_tokens
FROM c GROUP BY lang, shard
"""


@register("x8_token_shards", oracle=_X8_SHARDS_ORACLE, tags=("X8", "pipeline", "window"))
def x8_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign docs to ~2000-token output shards per language (sequential
    packing: a doc straddling a boundary stays in the earlier shard)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    toks = docs.select("doc_id", "lang", n_tokens.cast("bigint").alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = toks.withColumn("before_toks", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return c.groupBy(
        "lang", F.floor(F.col("before_toks") / 2000).alias("shard")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
    )


# ---------------------------------------------------------------------------
# X8 — sequence packing: the GPT-pretraining data-loader primitive. Docs are
# concatenated per language in deterministic (doc_id) order and cut into
# fixed-length training sequences (SEQ_LEN tokens); a doc straddling a cut
# contributes one SEGMENT to each sequence it spans, with exact token
# offsets. Everything is column arithmetic over ONE lang-keyed window
# cumsum + a sequence() explode — no UDFs, no driver state, and the explode
# fan-out per doc is ceil(n_tokens/SEQ_LEN)+1, so shuffle volume is
# O(total_tokens/SEQ_LEN + n_docs) segments regardless of document size.
# ---------------------------------------------------------------------------

_SEQ_LEN = 512

_X8_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, lang, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_toks
  FROM toks),
seg AS (
  SELECT doc_id, lang, n_tokens, before_toks,
         unnest(range(CAST(before_toks // {_SEQ_LEN} AS BIGINT), CAST((before_toks + n_tokens - 1) // {_SEQ_LEN} + 1 AS BIGINT))) AS seq_id
  FROM c WHERE n_tokens > 0)
SELECT lang, CAST(seq_id AS BIGINT) AS seq_id, doc_id,
       CAST(greatest(seq_id * {_SEQ_LEN} - before_toks, 0) AS BIGINT) AS doc_tok_start,
       CAST(least((seq_id + 1) * {_SEQ_LEN} - before_toks, n_tokens) AS BIGINT) AS doc_tok_end,
       CAST(greatest(before_toks - seq_id * {_SEQ_LEN}, 0) AS BIGINT) AS seq_offset
FROM seg
"""


@register("x8_sequence_pack", oracle=_X8_PACK_ORACLE, tags=("X8", "pipeline", "packing"))
def x8_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed-{_SEQ_LEN}-token training sequences per
    language, splitting docs across sequence boundaries with exact offsets
    (seq_offset = where the segment starts inside the sequence;
    doc_tok_start/end = which slice of the doc it carries). Deterministic by
    (lang, doc_id) order so reruns and backfills produce identical packing —
    the property that makes sharded pretraining resumable. One window cumsum
    shuffle on lang + a sequence() explode; all JVM column arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    toks = docs.select("doc_id", "lang", n_tokens.cast("bigint").alias("n_tokens"))
    return pack_sequences(toks, _SEQ_LEN)


def pack_sequences(toks: DataFrame, seq_len_v: int) -> DataFrame:
    """Reusable packer over (doc_id, lang, n_tokens) rows — the plan
    x8_sequence_pack registers; property-tested in tests/test_properties.py
    against a sequential Python reference and for partitioning invariance."""
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = toks.withColumn("before_toks", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    seq_len = F.lit(seq_len_v)
    seg = c.filter(F.col("n_tokens") > 0).select(
        "lang",
        "doc_id",
        "n_tokens",
        "before_toks",
        F.explode(
            F.sequence(
                (F.col("before_toks") / seq_len).cast("bigint"),
                ((F.col("before_toks") + F.col("n_tokens") - 1) / seq_len).cast("bigint"),
            )
        ).alias("seq_id"),
    )
    return seg.select(
        "lang",
        "seq_id",
        "doc_id",
        F.greatest(F.col("seq_id") * seq_len - F.col("before_toks"), F.lit(0))
        .cast("bigint")
        .alias("doc_tok_start"),
        F.least(
            (F.col("seq_id") + 1) * seq_len - F.col("before_toks"), F.col("n_tokens")
        )
        .cast("bigint")
        .alias("doc_tok_end"),
        F.greatest(F.col("before_toks") - F.col("seq_id") * seq_len, F.lit(0))
        .cast("bigint")
        .alias("seq_offset"),
    )


# ---------------------------------------------------------------------------
# X8 — the full training-corpus pipeline as ONE lazy plan: quality gate →
# content-hash dedup → eval-set decontamination → deterministic train/valid/
# test split → per-(split, lang) accounting. Every stage is the registered
# standalone query's exact logic, composed; Catalyst pipelines the narrow
# stages and the whole thing is 3 shuffles (content-hash window, shingle
# probe, final grid agg) + the anti-join — no intermediate materialization,
# no driver state, rerun-stable end to end.
# ---------------------------------------------------------------------------

_X8_MIX_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, text, n_chars,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens
  FROM documents),
qual AS (
  SELECT * FROM toks
  WHERE n_tokens >= 10 AND CAST(n_chars AS DOUBLE) / n_tokens BETWEEN 3 AND 12),
dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM qual)
  WHERE rn = 1),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(t) - 3, 0) + 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])))
         AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
contaminated AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (shingle) WHERE s.doc_id % 50 <> 0),
clean AS (
  SELECT * FROM dedup
  WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM contaminated))
SELECT {_SPLIT_SQL_CASE} AS split, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens
FROM clean
GROUP BY split, lang
"""


@register("x8_training_mix", oracle=_X8_MIX_ORACLE, tags=("X8", "pipeline", "composite"))
def x8_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality → dedup → decontaminate → split → account, composed lazily
    from the standalone stages' exact logic (x8_corpus_clean,
    x8_decontaminate, x7_hash_split)."""
    from realestatedeals_spark.operators.dedup import shingle_table

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    toks = docs.select("doc_id", "lang", "text", "n_chars", n_tokens.alias("n_tokens"))
    qual = toks.filter(
        (F.col("n_tokens") >= 10)
        & (F.col("n_chars").cast("double") / F.col("n_tokens")).between(3, 12)
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dedup = qual.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    sh = shingle_table(docs, k=4)
    ev = sh.filter(F.col("_id") % 50 == 0).select("shingle").distinct()
    contaminated = (
        sh.filter(F.col("_id") % 50 != 0)
        .join(ev, "shingle")
        .select(F.col("_id").alias("doc_id"))
        .distinct()
    )
    clean = dedup.filter(F.col("doc_id") % 50 != 0).join(contaminated, "doc_id", "left_anti")
    return clean.groupBy(_split_col().alias("split"), "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_tokens").cast("bigint")).alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# X8 — training mix WITH near-duplicate cluster removal (r2 VERDICT item 4):
# a real training-mix run drops near-dup clusters, not just byte-identical
# copies. Between exact dedup and decontamination, MinHash near-dup pairs
# (the oracle-green x2 config) cluster via star/union-find and every
# NON-CANONICAL member (doc_id != min-id cluster_id) is dropped.
# ---------------------------------------------------------------------------

_X8_MIX_ND_ORACLE = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, lang, text, n_chars,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens
  FROM documents),
qual AS (
  SELECT * FROM toks
  WHERE n_tokens >= 10 AND CAST(n_chars AS DOUBLE) / n_tokens BETWEEN 3 AND 12),
dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM qual)
  WHERE rn = 1),
ndt AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
ndsh AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(t) - 2, 0) + 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
  FROM ndt),
ndcnt AS (SELECT doc_id, count(*) AS n FROM ndsh GROUP BY doc_id),
ndinter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM ndsh a JOIN ndsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
ndjac AS (
  SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (ca.n + cb.n - i) AS jaccard
  FROM ndinter JOIN ndcnt ca ON doc_a = ca.doc_id JOIN ndcnt cb ON doc_b = cb.doc_id),
-- MATERIALIZED is load-bearing on ndp/ndsh/ndedges: the recursive
-- ndreach term re-evaluates its inputs EVERY iteration, and un-pinned
-- they inline all the way down to the quadratic shingle self-join -- at
-- gen sf1.0 that re-ran a ~95 s / tens-of-GB-spill subplan per closure
-- round and blew the oracle's 60 GB spill cap (measured; same class as
-- the g8 and k-core oracle fixes).
ndp AS MATERIALIZED (SELECT doc_a, doc_b FROM ndjac WHERE jaccard >= 0.9),
ndedges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM ndp UNION SELECT doc_b, doc_a FROM ndp),
ndreach(a, b) AS (
  SELECT a, b FROM ndedges
  UNION
  SELECT r.a, e.b FROM ndreach r JOIN ndedges e ON r.b = e.a),
ndnodes AS (SELECT DISTINCT a FROM ndedges),
nddrop AS (
  SELECT ndnodes.a AS doc_id
  FROM ndnodes LEFT JOIN ndreach ON ndreach.a = ndnodes.a
  GROUP BY ndnodes.a
  HAVING ndnodes.a <> least(ndnodes.a, coalesce(min(ndreach.b), ndnodes.a))),
dedup2 AS (SELECT * FROM dedup WHERE doc_id NOT IN (SELECT doc_id FROM nddrop)),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(t) - 3, 0) + 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])))
         AS shingle
  FROM ndt),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
contaminated AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (shingle) WHERE s.doc_id % 50 <> 0),
clean AS (
  SELECT * FROM dedup2
  WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM contaminated))
SELECT {_SPLIT_SQL_CASE} AS split, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens
FROM clean
GROUP BY split, lang
"""


@register(
    "x8_training_mix_neardup",
    oracle=_X8_MIX_ND_ORACLE,
    tags=("X8", "pipeline", "composite", "dedup"),
)
def x8_training_mix_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality → exact dedup → NEAR-DUP cluster drop → decontaminate → split
    → account. The near-dup stage composes the oracle-green
    ``minhash_near_duplicates`` (J ≥ 0.9, the x2 config — LSH candidates,
    exact-Jaccard verify) with ``duplicate_clusters_star`` and anti-joins
    every non-canonical cluster member (doc_id ≠ min-id cluster_id) out of
    the corpus. Still one lazy plan end to end — the cluster frame is just
    another join input, no driver state."""
    from realestatedeals_spark.operators.dedup import (
        duplicate_clusters_star,
        minhash_near_duplicates,
        shingle_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    toks = docs.select("doc_id", "lang", "text", "n_chars", n_tokens.alias("n_tokens"))
    qual = toks.filter(
        (F.col("n_tokens") >= 10)
        & (F.col("n_chars").cast("double") / F.col("n_tokens")).between(3, 12)
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dedup = qual.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)

    pairs = minhash_near_duplicates(docs, k=3, num_hashes=64, bands=16, threshold=0.9)
    nd_drop = (
        duplicate_clusters_star(pairs.select("doc_a", "doc_b"))
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    dedup2 = dedup.join(nd_drop, "doc_id", "left_anti")

    sh = shingle_table(docs, k=4)
    ev = sh.filter(F.col("_id") % 50 == 0).select("shingle").distinct()
    contaminated = (
        sh.filter(F.col("_id") % 50 != 0)
        .join(ev, "shingle")
        .select(F.col("_id").alias("doc_id"))
        .distinct()
    )
    clean = dedup2.filter(F.col("doc_id") % 50 != 0).join(contaminated, "doc_id", "left_anti")
    return clean.groupBy(_split_col().alias("split"), "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_tokens").cast("bigint")).alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# X8 — the capstone composite: training mix THROUGH sequence packing. The
# cleaned train split (quality → exact dedup → decontaminate → hash split)
# flows straight into pack_sequences, still ONE lazy plan — corpus in,
# training sequences out, with per-sequence accounting the oracle recomputes
# end to end. This is the shape of an actual pretraining data job.
# ---------------------------------------------------------------------------

_X8_PACKED_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, text, n_chars,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens
  FROM documents),
qual AS (
  SELECT * FROM toks
  WHERE n_tokens >= 10 AND CAST(n_chars AS DOUBLE) / n_tokens BETWEEN 3 AND 12),
dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM qual)
  WHERE rn = 1),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(t) - 3, 0) + 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])))
         AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
contaminated AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (shingle) WHERE s.doc_id % 50 <> 0),
clean AS (
  SELECT * FROM dedup
  WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
train AS (
  SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
  FROM clean WHERE ({_SPLIT_SQL_CASE}) = 'train'),
c AS (
  SELECT doc_id, lang, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_toks
  FROM train),
seg AS (
  SELECT doc_id, lang, n_tokens, before_toks,
         unnest(range(CAST(before_toks // {_SEQ_LEN} AS BIGINT),
                      CAST((before_toks + n_tokens - 1) // {_SEQ_LEN} + 1 AS BIGINT))) AS seq_id
  FROM c WHERE n_tokens > 0)
SELECT lang, CAST(seq_id AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(SUM(least((seq_id + 1) * {_SEQ_LEN}, before_toks + n_tokens)
                - greatest(seq_id * {_SEQ_LEN}, before_toks)) AS BIGINT) AS seq_tokens
FROM seg
GROUP BY lang, seq_id
"""


@register(
    "x8_training_mix_packed",
    oracle=_X8_PACKED_ORACLE,
    tags=("X8", "pipeline", "composite", "packing"),
    bench=True,
)
def x8_training_mix_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus → cleaned train split → packed training sequences, one lazy
    plan: the x8_training_mix stages (quality gate, exact dedup, eval-set
    decontamination, deterministic hash split) feed pack_sequences directly;
    output is per-(lang, seq_id) segment count and filled-token count. Every
    interior sequence must carry exactly {_SEQ_LEN} tokens — the oracle
    recomputes the whole pipeline including the packing arithmetic."""
    from realestatedeals_spark.operators.dedup import shingle_table

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    toks = docs.select("doc_id", "lang", "text", "n_chars", n_tokens.alias("n_tokens"))
    qual = toks.filter(
        (F.col("n_tokens") >= 10)
        & (F.col("n_chars").cast("double") / F.col("n_tokens")).between(3, 12)
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dedup = qual.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    sh = shingle_table(docs, k=4)
    ev = sh.filter(F.col("_id") % 50 == 0).select("shingle").distinct()
    contaminated = (
        sh.filter(F.col("_id") % 50 != 0)
        .join(ev, "shingle")
        .select(F.col("_id").alias("doc_id"))
        .distinct()
    )
    clean = dedup.filter(F.col("doc_id") % 50 != 0).join(
        contaminated, "doc_id", "left_anti"
    )
    train = clean.filter(_split_col() == "train").select(
        "doc_id", "lang", F.col("n_tokens").cast("bigint").alias("n_tokens")
    )
    packed = pack_sequences(train, _SEQ_LEN)
    return packed.groupBy("lang", "seq_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.col("doc_tok_end") - F.col("doc_tok_start")).alias("seq_tokens"),
    )


# ---------------------------------------------------------------------------
# X7 — exact-k deterministic uniform sample: order by a keyed md5 and take
# the first k. The hash ordering is a reproducible random permutation
# (md5 is uniform, the seed prefix makes it a keyed family), so the prefix
# is a uniform k-sample that is stable across reruns, partitionings, and
# engines — unlike rand()-based sampling, and unlike sample() it is EXACTLY
# k rows. Physical plan is TakeOrderedAndProject: per-partition k-heaps +
# a k-row driver merge, no global sort (pinned in tests/test_plans.py).
# md5 is bit-identical in DuckDB, so the oracle checks the real sample.
# ---------------------------------------------------------------------------

_SAMPLE_K, _SAMPLE_SEED = 100, "s42:"

_HASH_TOPK_ORACLE = f"""
SELECT doc_id, lang, source, n_chars,
       md5('{_SAMPLE_SEED}' || CAST(doc_id AS VARCHAR)) AS sample_key
FROM documents
ORDER BY sample_key
LIMIT {_SAMPLE_K}
"""


@register("x7_uniform_sample_exact_k", oracle=_HASH_TOPK_ORACLE, tags=("X7", "sample"))
def x7_uniform_sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform sample of exactly k docs via keyed-hash order."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit(_SAMPLE_SEED), F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", "lang", "source", "n_chars", key.alias("sample_key"))
        .orderBy("sample_key")
        .limit(_SAMPLE_K)
    )


# ---------------------------------------------------------------------------
# X7 — temperature-flattened mixture (alpha = 0.5): sampling rates DERIVED
# FROM the observed per-language counts inside the plan — p_l ∝ √n_l / n_l
# scaled to a 40% token budget — rather than the fixed-weight table of
# x7_mixture_sample. The alpha=0.5 choice is deliberate: √ is IEEE
# correctly-rounded (pow is not), and the 5-term rate normalizer folds over
# the lang-sorted count array, so both engines execute the identical
# float-op sequence and the oracle comparison stays hash-exact with zero
# tolerance. Membership is the same stateless md5-threshold keep as every
# X7 sampler — no shuffle, no seed, no driver state.
# ---------------------------------------------------------------------------

_X7_TEMP_ORACLE = """
WITH cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
tot AS (
  SELECT list_reduce(
           list_transform(list_sort(list({'lang': lang, 'n': n})),
                          r -> sqrt(CAST(r.n AS DOUBLE))),
           (a, x) -> a + x) AS t,
         CAST(sum(n) AS BIGINT) AS nd
  FROM cnt),
rates AS (
  SELECT c.lang, c.n,
         least(1.0, (sqrt(CAST(c.n AS DOUBLE)) / tot.t)
                    * floor(0.4 * tot.nd) / CAST(c.n AS DOUBLE)) AS p
  FROM cnt c, tot),
thr AS (
  SELECT lang, CAST(floor(p * 1152921504606846976.0) AS BIGINT) AS cut FROM rates),
kept AS (
  SELECT d.lang, d.text
  FROM documents d JOIN thr ON d.lang = thr.lang
  WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT < thr.cut)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)) AS BIGINT)
         AS total_tokens
FROM kept GROUP BY lang
"""


@register("x7_temperature_mix", oracle=_X7_TEMP_ORACLE, tags=("X7", "sampling", "mixture"))
def x7_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("lang", "n"))),
                lambda r: F.sqrt(r["n"].cast("double")),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("t"),
        F.sum("n").alias("nd"),
    )
    rates = cnt.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.least(
            F.lit(1.0),
            (F.sqrt(F.col("n").cast("double")) / F.col("t"))
            * F.floor(0.4 * F.col("nd"))
            / F.col("n").cast("double"),
        ).alias("p"),
    )
    thr = rates.select(
        "lang",
        F.floor(F.col("p") * F.lit(1152921504606846976.0)).cast("long").alias("cut"),
    )
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    kept = docs.join(F.broadcast(thr), "lang").filter(h < F.col("cut"))
    n_tokens = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens.cast("bigint")).alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# X8 — dataset card: the one-pass corpus summary a dataset release ships —
# size, language mix, duplication rate, PII exposure, chunk yield — as ONE
# lazy plan emitting (section, metric, n) rows. Each number is integer-exact
# and individually certified by its dedicated query (x4_lang_stats,
# x1_exact_dedup, x4_pii_scrub, x4_chunk_documents); this composite
# certifies their one-plan composition, the per-metric queries the details.
# ---------------------------------------------------------------------------

_X8_CARD_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang, text,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_toks
  FROM documents),
pii AS (
  SELECT
    sum(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))) AS emails,
    sum(len(regexp_extract_all(text, '\\(\\d{3}\\) \\d{3}-\\d{4}|\\d{3}-\\d{3}-\\d{4}'))) AS phones
  FROM documents),
dups AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT sha256(text)) AS BIGINT) AS n_distinct
  FROM documents),
chunks AS (
  SELECT CAST(sum(CAST(ceil(greatest(n_toks, 1) / 48.0) AS BIGINT)) AS BIGINT) AS n_chunks
  FROM toks WHERE n_toks > 0)
SELECT 'corpus' AS section, 'n_docs' AS metric, n_docs AS n FROM dups
UNION ALL
SELECT 'corpus', 'n_distinct_texts', n_distinct FROM dups
UNION ALL
SELECT 'corpus', 'n_duplicate_docs', n_docs - n_distinct FROM dups
UNION ALL
SELECT 'corpus', 'total_tokens', CAST(sum(n_toks) AS BIGINT) FROM toks
UNION ALL
SELECT 'lang:' || lang, 'n_docs', CAST(count(*) AS BIGINT) FROM toks GROUP BY lang
UNION ALL
SELECT 'lang:' || lang, 'total_tokens', CAST(sum(n_toks) AS BIGINT) FROM toks GROUP BY lang
UNION ALL
SELECT 'pii', 'n_emails', CAST(emails AS BIGINT) FROM pii
UNION ALL
SELECT 'pii', 'n_phones', CAST(phones AS BIGINT) FROM pii
UNION ALL
SELECT 'chunks', 'n_64tok_windows', n_chunks FROM chunks
"""


@register("x8_dataset_card", oracle=_X8_CARD_ORACLE, tags=("X8", "composite", "card"), bench=True)
def x8_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realestatedeals_spark.plans.llm_clean import _EMAIL, _PHONE

    docs = load_table(spark, sf_dir, "documents")
    n_toks = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    base = docs.select("doc_id", "lang", "text", n_toks.alias("n_toks"))

    dups = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.sha2("text", 256)).alias("n_distinct"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        F.sum(F.regexp_count("text", F.lit(_EMAIL))).cast("long").alias("emails"),
        F.sum(F.regexp_count("text", F.lit(_PHONE))).cast("long").alias("phones"),
        F.sum(
            F.when(
                F.col("n_toks") > 0,
                F.ceil(F.greatest(F.col("n_toks"), F.lit(1)) / 48.0),
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_chunks"),
    )
    corpus = dups.select(
        F.explode(
            F.array(
                F.struct(F.lit("corpus").alias("section"), F.lit("n_docs").alias("metric"), F.col("n_docs").alias("n")),
                F.struct(F.lit("corpus").alias("section"), F.lit("n_distinct_texts").alias("metric"), F.col("n_distinct").alias("n")),
                F.struct(F.lit("corpus").alias("section"), F.lit("n_duplicate_docs").alias("metric"), (F.col("n_docs") - F.col("n_distinct")).alias("n")),
                F.struct(F.lit("corpus").alias("section"), F.lit("total_tokens").alias("metric"), F.col("total_tokens").alias("n")),
                F.struct(F.lit("pii").alias("section"), F.lit("n_emails").alias("metric"), F.col("emails").alias("n")),
                F.struct(F.lit("pii").alias("section"), F.lit("n_phones").alias("metric"), F.col("phones").alias("n")),
                F.struct(F.lit("chunks").alias("section"), F.lit("n_64tok_windows").alias("metric"), F.col("n_chunks").alias("n")),
            )
        ).alias("s")
    ).select("s.section", "s.metric", "s.n")
    per_lang = base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("nd"), F.sum("n_toks").cast("long").alias("nt")
    )
    lang_rows = per_lang.select(
        F.concat(F.lit("lang:"), F.col("lang")).alias("section"),
        F.lit("n_docs").alias("metric"),
        F.col("nd").alias("n"),
    ).unionByName(
        per_lang.select(
            F.concat(F.lit("lang:"), F.col("lang")).alias("section"),
            F.lit("total_tokens").alias("metric"),
            F.col("nt").alias("n"),
        )
    )
    return corpus.unionByName(lang_rows)


# ---------------------------------------------------------------------------
# X7 — k-fold cross-validation assignment: fold = md5(doc_id) mod 5,
# deterministic and shuffle-free like every X7 sampler. The summary proves
# the three properties an eval harness needs: folds partition the corpus
# (counts sum to n_docs — enforced by construction, visible in the output),
# sizes are near-uniform, and assignment is content-independent (pure key
# hash, so re-running on a re-sharded corpus yields identical folds).
# ---------------------------------------------------------------------------

_X7_KFOLD_ORACLE = """
WITH f AS (
  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 5 AS fold,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_toks
  FROM documents)
SELECT CAST(fold AS INTEGER) AS fold,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS total_tokens
FROM f GROUP BY fold
"""


@register("x7_kfold_assign", oracle=_X7_KFOLD_ORACLE, tags=("X7", "sampling", "kfold"))
def x7_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 5
    )
    n_toks = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    return (
        docs.select(fold.cast("int").alias("fold"), n_toks.alias("n_toks"))
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# X7 — weighted Bernoulli sampling (round 7): include each document with
# probability proportional to its weight (here: capped length — the
# token-budget-proportional sampling a training-mix builder runs). The
# inclusion test is PURE INTEGER — keep iff h48 * 10000 < w * 3 * 2^48,
# i.e. P(keep) = 3w/10000 with w = min(n_chars, 1000) — so the sample is
# deterministic, engine-exact, and reproducible at any partitioning (the
# same property as the repo's hash-split family, extended to non-uniform
# inclusion). Both factors stay far inside int64.
# ---------------------------------------------------------------------------

_X7_WEIGHTED_ORACLE = """
WITH h AS (
  SELECT doc_id, lang, CAST(least(n_chars, 1000) AS BIGINT) AS w,
         ('0x' || substr(md5('wbs:' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS h48
  FROM documents)
SELECT doc_id, lang, w
FROM h
WHERE h48 * 10000 < w * 3 * 281474976710656
"""


@register("x7_weighted_sample", oracle=_X7_WEIGHTED_ORACLE, tags=("X7", "sampling"))
def x7_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = F.least(F.col("n_chars"), F.lit(1000)).cast("long")
    h48 = F.conv(
        F.substring(F.md5(F.concat(F.lit("wbs:"), F.col("doc_id").cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")
    return docs.select("doc_id", "lang", w.alias("w"), h48.alias("h48")).filter(
        F.col("h48") * 10000 < F.col("w") * 3 * F.lit(281474976710656)
    ).drop("h48")


# ---------------------------------------------------------------------------
# x7_temporal_split — leakage-safe walk-forward split for time-ordered
# training data: first 70% of events (by event time, event_id tie-break)
# train, next 5% EMBARGO (discarded so no label/feature window straddles
# the boundary — the purged split of financial-ML practice), remainder
# test. Cutoffs are integer ranks (n*70//100, n*75//100) so both engines
# place every row identically with zero float thresholds. Scale shape
# (round 12): the rank runs through operators/ranking.rank_boundary_keys —
# only the NARROW (ts, event_id) key frame is ranked; the two cutoff
# boundary keys come back as driver literals, the rank checkpoint is
# released inside the call, and every event is labeled by a plain
# lexicographic comparison (no window, no full-width rank, no retained
# storage — the r11 global_rank form leaked its events-sized checkpoint
# for the session, ADVICE r11). The oracle still proves boundary placement
# row-exactly, and the output reports per-split boundary timestamps, which
# IS the artifact a production pipeline persists (then splits by plain ts
# comparison).
# ---------------------------------------------------------------------------

_X7_TEMPORAL_ORACLE = """
WITH ranked AS (
  SELECT event_type, ts, user_id,
         row_number() OVER (ORDER BY ts, event_id) AS rk,
         count(*) OVER () AS n
  FROM events
),
labeled AS (
  SELECT CASE WHEN rk <= n * 70 // 100 THEN 'train'
              WHEN rk <= n * 75 // 100 THEN 'embargo'
              ELSE 'test' END AS split,
         event_type, ts, user_id
  FROM ranked
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts
FROM labeled
GROUP BY split
"""


@register("x7_temporal_split", oracle=_X7_TEMPORAL_ORACLE, tags=("X7", "sampling", "split"))
def x7_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realestatedeals_spark.io.sources import load_events
    from realestatedeals_spark.session import apply_session_conf

    from realestatedeals_spark.operators.ranking import (
        after_boundary,
        rank_boundary_keys,
    )

    apply_session_conf(spark)
    ev = load_events(spark, sf_dir).select("event_id", "ts", "user_id")
    specs = [("ts", "asc"), ("event_id", "asc")]
    n, bounds = rank_boundary_keys(
        ev, specs, lambda n: [n * 70 // 100, n * 75 // 100]
    )
    b_train, b_emb = bounds.get(n * 70 // 100), bounds.get(n * 75 // 100)
    in_train = (
        ~after_boundary(ev, specs, b_train) if b_train is not None else F.lit(False)
    )
    in_emb = (
        ~after_boundary(ev, specs, b_emb) if b_emb is not None else F.lit(False)
    )
    labeled = ev.select(
        F.when(in_train, "train").when(in_emb, "embargo").otherwise("test")
        .alias("split"),
        "ts",
        "user_id",
    )
    return labeled.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("first_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
    )


_X7_CLUSTER_BAL_FINAL = """ranked AS (
  SELECT vec_id, cluster,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
  FROM a3)
SELECT vec_id, CAST(cluster AS INTEGER) AS cluster, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= 16
"""


def _x7_cluster_bal_oracle() -> str:
    from realestatedeals_spark.plans.llm_vectors import _km_oracle

    sql = _km_oracle(final="SELECT 1")  # reuse the k-means CTE chain
    return sql[: sql.rfind("SELECT 1")].rstrip().rstrip(",") + ",\n" + _X7_CLUSTER_BAL_FINAL


@register(
    "x7_cluster_balanced_sample",
    oracle=_x7_cluster_bal_oracle(),
    tags=("X7", "sampling", "clustering"),
)
def x7_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced corpus sampling: up to 16 vectors per k-means
    cluster, picked in deterministic md5(vec_id) order — the curation move
    that keeps rare modes of the corpus represented instead of letting a
    uniform sample mirror the majority clusters.

    Scale shape: per-cluster top-m with k=8 clusters would put the whole
    corpus into 8 window partitions, so the engine runs the standard
    two-phase top-k — a partition-local rank (no shuffle, prunes each
    executor partition to <= m rows per cluster, a superset of the global
    winners) and a global rank over only the pruned candidates. The
    shuffled survivor set is <= m * num_partitions regardless of corpus
    size.
    """
    from realestatedeals_spark.plans.llm_vectors import x3_kmeans_assign

    assigned = x3_kmeans_assign(spark, sf_dir).withColumn(
        "h", F.md5(F.col("vec_id").cast("string"))
    )
    local = Window.partitionBy("cluster", F.spark_partition_id()).orderBy("h", "vec_id")
    pruned = (
        assigned.withColumn("lrk", F.row_number().over(local))
        .filter(F.col("lrk") <= 16)
        .drop("lrk")
    )
    final = Window.partitionBy("cluster").orderBy("h", "vec_id")
    return (
        pruned.withColumn("rk", F.row_number().over(final).cast("int"))
        .filter(F.col("rk") <= 16)
        .select("vec_id", "cluster", "rk")
    )


# ---------------------------------------------------------------------------
# X7 — dedup-aware split (round 7): id-keyed splits leak — two copies of
# the same text under different doc_ids can land in train AND eval, the
# contamination dedup pipelines exist to prevent. Keying the split on the
# CONTENT hash puts every exact duplicate on one side by construction.
# The query measures both modes side by side: distinct texts present in
# BOTH splits (leaked) must be zero for the content-keyed mode and is
# nonzero for the id-keyed mode on this fixture (it has exact dups), so
# the guarantee is load-bearing, not vacuous. One aggregate per mode over
# the same scan; the md5-prefix split rule is the cross-engine-stable
# 75/25 assignment x7_hash_split already uses.
# ---------------------------------------------------------------------------

_X7_DEDUP_SPLIT_ORACLE = """
WITH contaminated AS (
  -- the fixture has almost no exact dups, so every 7th doc becomes one of
  -- five shared boilerplate texts (same injection on BOTH engines): the
  -- id-keyed split MUST leak on these, the content-keyed split cannot
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN 'boilerplate template number ' || CAST(doc_id % 5 AS STRING)
              ELSE text END AS text
  FROM documents
),
modes AS (
  SELECT doc_id, text,
         CASE WHEN substr(md5(CAST(doc_id AS STRING)), 1, 1) <= 'b'
              THEN 'train' ELSE 'eval' END AS by_id,
         CASE WHEN substr(md5(text), 1, 1) <= 'b'
              THEN 'train' ELSE 'eval' END AS by_content
  FROM contaminated
),
leak AS (
  SELECT 'by_id' AS split_mode,
         CAST(count(*) FILTER (by_id = 'train') AS BIGINT) AS n_train,
         CAST(count(*) FILTER (by_id = 'eval') AS BIGINT) AS n_eval,
         CAST((SELECT count(*) FROM (
            SELECT text FROM modes GROUP BY text
            HAVING count(DISTINCT by_id) > 1)) AS BIGINT) AS leaked_dup_texts
  FROM modes
  UNION ALL
  SELECT 'by_content',
         CAST(count(*) FILTER (by_content = 'train') AS BIGINT),
         CAST(count(*) FILTER (by_content = 'eval') AS BIGINT),
         CAST((SELECT count(*) FROM (
            SELECT text FROM modes GROUP BY text
            HAVING count(DISTINCT by_content) > 1)) AS BIGINT)
  FROM modes
)
SELECT * FROM leak
"""


@register("x7_dedup_aware_split", oracle=_X7_DEDUP_SPLIT_ORACLE, tags=("X7", "sampling", "dedup"))
def x7_dedup_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval split keyed by content hash vs by doc id, with the
    cross-split duplicate-text leak count for each — zero for the
    content-keyed mode by construction."""
    docs = load_table(spark, sf_dir, "documents")
    contaminated = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit("boilerplate template number "),
                (F.col("doc_id") % 5).cast("string"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    modes = contaminated.select(
        "text",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) <= "b",
            F.lit("train"),
        ).otherwise(F.lit("eval")).alias("by_id"),
        F.when(F.substring(F.md5("text"), 1, 1) <= "b", F.lit("train"))
        .otherwise(F.lit("eval"))
        .alias("by_content"),
    )
    rows = []
    for mode in ("by_id", "by_content"):
        counts = modes.groupBy(F.col(mode).alias("split")).agg(
            F.count(F.lit(1)).alias("n")
        )
        leaked = (
            modes.groupBy("text")
            .agg(F.count_distinct(F.col(mode)).alias("sides"))
            .filter(F.col("sides") > 1)
            .agg(F.count(F.lit(1)).alias("leaked"))
        )
        row = (
            counts.groupBy()
            .pivot("split", ["train", "eval"])
            .sum("n")
            .crossJoin(F.broadcast(leaked))
            .select(
                F.lit(mode).alias("split_mode"),
                F.coalesce(F.col("train"), F.lit(0)).alias("n_train"),
                F.coalesce(F.col("eval"), F.lit(0)).alias("n_eval"),
                F.col("leaked").alias("leaked_dup_texts"),
            )
        )
        rows.append(row)
    return rows[0].unionByName(rows[1])
