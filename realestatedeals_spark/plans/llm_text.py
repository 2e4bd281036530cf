"""Text-pipeline queries on ``documents`` (SURVEY.md §2b X1/X4).

Exact dedup, text statistics, term frequencies, quality scoring — the
SQL-expressible slice of the LLM-data operators. Near-dup (MinHash/SimHash)
lives in ``operators.dedup`` with rows-only checks (see llm_dedup plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.plans.registry import register


# ---------------------------------------------------------------------------
# X1 — exact dedup via content hash: canonical doc per distinct text + copy
# count. sha256 hex matches between Spark (sha2, 256) and DuckDB (sha256).
# ---------------------------------------------------------------------------

_X1_ORACLE = """
SELECT sha256(text) AS text_hash,
       CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY sha256(text)
"""


@register("x1_exact_dedup", oracle=_X1_ORACLE, tags=("X1", "dedup"), bench=True)
def x1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.sha2("text", 256).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# X4 — per-language corpus statistics: doc counts, token counts, char stats.
# Token = whitespace split (the documents fixture is space-joined words).
# ---------------------------------------------------------------------------

_X4_STATS_ORACLE = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY lang
"""


@register("x4_lang_stats", oracle=_X4_STATS_ORACLE, tags=("X4", "text"))
def x4_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# X4 — top-25 terms by document frequency: explode → distinct per doc →
# count → deterministic top-k (count desc, term asc).
# ---------------------------------------------------------------------------

_X4_TERMS_ORACLE = """
WITH tokens AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
)
SELECT term, CAST(count(*) AS BIGINT) AS doc_freq
FROM tokens
WHERE term <> ''
GROUP BY term
ORDER BY doc_freq DESC, term
LIMIT 25
"""


@register("x4_top_terms", oracle=_X4_TERMS_ORACLE, tags=("X4", "text"))
def x4_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("term"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# X4 — quality scoring: token count, mean token length, stopword ratio,
# all as built-in expressions (language-ID heuristics build on these).
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def _sw_sql_list() -> str:
    return "(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"


_X4_QUALITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, n_chars, string_split(text, ' ') AS tokens
  FROM documents
)
SELECT doc_id, lang,
       CAST(len(tokens) AS BIGINT) AS n_tokens,
       CAST(n_chars AS DOUBLE) / len(tokens) AS chars_per_token,
       CAST(len(list_filter(tokens, x -> x IN {_sw_sql_list()})) AS DOUBLE) / len(tokens)
         AS stopword_ratio
FROM toks
WHERE len(tokens) > 0
"""


@register("x4_quality_score", oracle=_X4_QUALITY_ORACLE, tags=("X4", "text"))
def x4_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    n_tokens = F.size(tokens)
    sw = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.filter(tokens, lambda x: F.array_contains(sw, x)))
    return (
        docs.select(
            "doc_id",
            "lang",
            n_tokens.cast("long").alias("n_tokens"),
            (F.col("n_chars").cast("double") / n_tokens).alias("chars_per_token"),
            (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        )
        .filter(F.col("n_tokens") > 0)
    )


# ---------------------------------------------------------------------------
# X4 — document fingerprints: rolling polynomial hash, engine-exact.
# ---------------------------------------------------------------------------

_FP_ORACLE = """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(text, ''), ch -> CAST(ascii(ch) AS BIGINT))),
         (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER)
         AS bpe_tokens,
       CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS INTEGER)
         AS ws_tokens
FROM documents
"""


@register("x4_fingerprint_tokens", oracle=_FP_ORACLE, tags=("X4", "text"))
def x4_fingerprint_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realestatedeals_spark.functions.text import (
        bpe_token_count,
        fingerprint,
        whitespace_token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fingerprint"),
        bpe_token_count(F.col("text")).alias("bpe_tokens"),
        whitespace_token_count(F.col("text")).alias("ws_tokens"),
    )


# ---------------------------------------------------------------------------
# X4 — heuristic language ID: marker-vocabulary scoring + argmax, posed as a
# per-(true lang, predicted lang) contingency table.
# ---------------------------------------------------------------------------


def _markers_sql() -> str:
    from realestatedeals_spark.functions.text import LANG_MARKERS

    cases = []
    for lang, markers in LANG_MARKERS.items():
        in_list = ", ".join(f"'{m}'" for m in markers)
        cases.append(
            f"struct_pack(neg := -CAST(len(list_filter(toks, t -> t IN ({in_list}))) AS BIGINT),"
            f" lang := '{lang}')"
        )
    return "[" + ", ".join(cases) + "]"


_LID_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         list_sort({_markers_sql()})[1].lang AS predicted
  FROM (SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
        FROM documents)
)
SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n_docs
FROM scored GROUP BY lang, predicted
"""


@register("x4_language_id", oracle=_LID_ORACLE, tags=("X4", "text", "langid"))
def x4_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realestatedeals_spark.functions.text import predict_lang

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "lang", predict_lang(F.col("text")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# X4 — TF-IDF: term frequency × inverse document frequency, top-3 terms per
# doc. idf computed once per term (a broadcast-able dim), not per posting.
# ---------------------------------------------------------------------------

# Determinism: ln() differs by 1 ulp between the JVM and libm, so the rank
# runs on integer keys only (tf desc, df asc, term) and the reported tfidf is
# rounded to 4 decimals — identical on both engines.
_TFIDF_ORACLE = """
WITH tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
  GROUP BY doc_id, term
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         round(tf.tf * ln(n.n_docs / df.df), 4) AS tfidf
  FROM tf, df, n WHERE tf.term = df.term
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, df, term) AS rk
  FROM scored
)
SELECT doc_id, term, tf, tfidf, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= 3
"""


@register("x4_tfidf_top_terms", oracle=_TFIDF_ORACLE, tags=("X4", "text", "tfidf"))
def x4_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tf").desc(), F.col("df"), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "tfidf", "rk")
    )


# ---------------------------------------------------------------------------
# X4 — token counting, whitespace vs BPE-ish: a GPT-2-style pretokenizer
# regex (contraction suffixes, letter runs, 1-3 digit groups, punctuation
# runs, whitespace runs). The pattern is restricted to constructs that the
# JVM (Spark) and RE2 (DuckDB) regex engines evaluate identically —
# leftmost-first alternation, greedy bounded repeats, ASCII classes — probed
# on both engines. Fertility (bpe/ws ratio) is the usual tokenizer-cost
# metric a corpus-budget pass needs per document.
# ---------------------------------------------------------------------------

_BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9\s]+|\s+"

_X4_BPE_ORACLE = """
SELECT doc_id, lang,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text,
            '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9\\s]+|\\s+'
            )) AS BIGINT) AS n_bpe_tokens,
       CAST(len(regexp_extract_all(text,
            '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9\\s]+|\\s+'
            )) AS DOUBLE)
         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS fertility
FROM documents
"""


@register("x4_bpe_token_count", oracle=_X4_BPE_ORACLE, tags=("X4", "text", "tokens"))
def x4_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish token counts per document, entirely JVM-side
    (``regexp_extract_all`` — no Python in the loop). Fertility is a
    per-row double of two exact ints, so it hash-matches bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split("text", " ")).cast("long")
    bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), F.lit(0))).cast("long")
    return docs.select(
        "doc_id",
        "lang",
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        (bpe.cast("double") / ws.cast("double")).alias("fertility"),
    )


# ---------------------------------------------------------------------------
# X4 — winnowing fingerprints (Schleimer, Wilkerson, Aiken: "Winnowing:
# Local Algorithms for Document Fingerprinting", SIGMOD 2003): hash every
# k-gram (k=3), slide a w=4 window over the hash sequence, keep each
# window's minimum. Guarantee: any match of w+k-1 = 6 consecutive tokens
# between two documents shares at least one fingerprint. Fingerprints are
# md5 hex prefixes — identical bytes on both engines, and hex order =
# numeric order so window MIN agrees. We keep the distinct (doc, hash)
# set (the standard position-free simplification), which also makes the
# output tie-break-free.
# ---------------------------------------------------------------------------

_WINNOW_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
kh AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                        i -> substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 8)) AS hs
  FROM toks),
wm AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(hs) + 1),
                              i -> list_min(hs[greatest(i - 3, 1):i])))) AS fp
  FROM kh)
SELECT doc_id, fp FROM wm
"""


def _winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) distinct winnowing fingerprints — shared by the
    fingerprint query and the overlap join below."""
    from pyspark.sql import Window as W

    tok = docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
    wl = W.partitionBy("doc_id").orderBy("pos")
    l1, l2 = F.lead("tok", 1).over(wl), F.lead("tok", 2).over(wl)
    kh = (
        tok.select("doc_id", "pos", F.col("tok").alias("t0"), l1.alias("t1"), l2.alias("t2"))
        .filter(F.col("t2").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.substring(F.md5(F.concat_ws(" ", "t0", "t1", "t2")), 1, 8).alias("h"),
        )
    )
    ww = W.partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 0)
    return kh.select("doc_id", F.min("h").over(ww).alias("fp")).distinct()


@register("x4_winnow_fingerprints", oracle=_WINNOW_ORACLE, tags=("X4", "text", "fingerprint"))
def x4_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing over (doc, position): ONE doc-keyed exchange feeds both the
    k-gram lead()s and the trailing-window min; the distinct dedups per
    (doc, hash). Shuffles carry 8-char hashes, never text. At 100 TB the
    fingerprint table is the corpus-representation for plagiarism-style
    overlap joins (fingerprint equi-join ≈ the MinHash candidate pattern)."""
    return _winnow_fingerprints(load_table(spark, sf_dir, "documents"))


_WINNOW_OVERLAP_ORACLE = (
    _WINNOW_ORACLE.replace("SELECT doc_id, fp FROM wm", "")
    + """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
FROM wm a JOIN wm b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 5
"""
)


@register(
    "x2_winnow_overlap", oracle=_WINNOW_OVERLAP_ORACLE, tags=("X2", "dedup", "fingerprint"),
    bench=True,
)
def x2_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document overlap via the winnowing fingerprint inverted index:
    a fp-keyed self-join (equi-join — shuffle bounded by posting-list
    sizes, the n-gram-Jaccard pattern) counts shared fingerprints per doc
    pair. With the winnowing guarantee, any pair sharing ≥ 5 fingerprints
    shares substantial verbatim runs — the plagiarism/contamination
    detection primitive at corpus scale."""
    from realestatedeals_spark.util import spread_by_id

    # spread (round 12): winnowing's per-doc k-gram hash + sliding-MIN
    # selection otherwise runs on the fixture scan's one split (measured
    # 1.09 → 0.59 s best at sf0.1, rowsets identical)
    fp = _winnow_fingerprints(
        spread_by_id(load_table(spark, sf_dir, "documents"), "doc_id")
    )
    # Posting-list honesty (same note as x2_ngram_jaccard): winnowing's MIN
    # selection concentrates globally-small hashes, so a corpus-ubiquitous
    # run can produce a hot fingerprint. The standard mitigation is
    # stop-fingerprint capping (drop fps with document frequency above a
    # threshold before the self-join); at fixture scale no cap is needed,
    # so none is applied — documented, not silently capped.
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 5)
    )


_WINNOW_OVERLAP_CAPPED_ORACLE = (
    _WINNOW_ORACLE.replace("SELECT doc_id, fp FROM wm", "")
    + """
, nd AS (SELECT count(*) AS n FROM documents),
rare AS (
  SELECT fp FROM wm GROUP BY fp
  HAVING count(*) * 50 <= (SELECT n FROM nd)
),
wr AS (SELECT wm.doc_id, wm.fp FROM wm JOIN rare USING (fp))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
FROM wr a JOIN wr b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 5
"""
)


@register(
    "x2_winnow_overlap_capped",
    oracle=_WINNOW_OVERLAP_CAPPED_ORACLE,
    tags=("X2", "dedup", "fingerprint"),
)
def x2_winnow_overlap_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stop-fingerprint-capped overlap join — the mitigation for corpora
    with boilerplate: fingerprints held by more than 2% of documents are
    ubiquity, not copying (the MOSS rule), and their posting lists are what
    makes the self-join quadratic. The cap is RELATIVE (df * 50 <= n_docs,
    integer arithmetic both engines) so semantics are scale-covariant, and
    it is applied before the self-join so hot posting lists never reach the
    shuffle. Measured honestly (SCALE.md): on THIS fixture no fingerprint
    crosses the 2% cap (synthetic docs have no boilerplate runs), so the
    query returns identical rows to the uncapped form and the df pre-pass
    is pure cost — which is why the UNCAPPED form carries the bench flag;
    the uncapped slope at 10x docs is ~0.5x/doc (sub-linear wall-clock,
    tools/gen_scale.py), fine as-is. This variant exists, oracle-checked,
    for the corpora where the cap is load-bearing."""
    docs = load_table(spark, sf_dir, "documents")
    fp = _winnow_fingerprints(docs)
    n_docs = docs.select(F.count(F.lit(1)).alias("n"))
    rare = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") * 50 <= F.col("n"))
        .select("fp")
    )
    fpr = fp.join(rare, "fp")
    a, b = fpr.alias("a"), fpr.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 5)
    )


# ---------------------------------------------------------------------------
# X4 — repetition quality signals (the Gopher/MassiveText repetition rules):
# duplicate-unigram fraction, duplicate-bigram fraction, and top-token
# share. Real pretraining filters drop docs above thresholds on exactly
# these. All ratios are integer/integer in double — engine-exact. The
# top-token count is computed via explode → per-(doc, token) count → max,
# ONE doc-keyed shuffle (the scalable form; an array-expression mode() would
# be O(distinct × n) per row).
# ---------------------------------------------------------------------------

_X4_REP_ORACLE = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
base AS (
  SELECT doc_id, toks, len(toks) AS n,
         list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                        i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
  FROM t WHERE len(toks) >= 2),
topcnt AS (
  SELECT doc_id, max(c) AS top_cnt FROM (
    SELECT doc_id, count(*) AS c
    FROM (SELECT doc_id, unnest(toks) AS tok FROM base)
    GROUP BY doc_id, tok)
  GROUP BY doc_id)
SELECT base.doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / n AS dup_unigram_frac,
       1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams) AS dup_bigram_frac,
       CAST(top_cnt AS DOUBLE) / n AS top_token_frac
FROM base JOIN topcnt ON base.doc_id = topcnt.doc_id
"""


@register("x4_repetition_score", oracle=_X4_REP_ORACLE, tags=("X4", "text", "quality"))
def x4_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics per document: duplicate unigram/
    bigram fractions (array expressions, zero shuffle) and top-token share
    (explode → count → max, one doc-keyed shuffle). The thresholds a corpus
    clean would apply (e.g. drop if dup_bigram_frac > 0.2) are policy; the
    signals here are the oracle-checked primitive."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    base = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    n = F.size("toks")
    bigrams = F.zip_with(
        F.slice("toks", 1, F.size("toks") - 1),
        F.slice("toks", 2, F.size("toks") - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    feats = base.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        (F.lit(1.0) - F.size(F.array_distinct("toks")).cast("double") / n).alias(
            "dup_unigram_frac"
        ),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(bigrams)).cast("double") / F.size(bigrams)
        ).alias("dup_bigram_frac"),
    )
    top = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_cnt"))
    )
    return feats.join(top, "doc_id").select(
        "doc_id",
        "n_tokens",
        "dup_unigram_frac",
        "dup_bigram_frac",
        (F.col("top_cnt").cast("double") / F.col("n_tokens")).alias("top_token_frac"),
    )


# ---------------------------------------------------------------------------
# X4 — trigram novelty vs the whole corpus: for each doc, the fraction of its
# distinct 3-grams that occur in NO other document. High novelty separates
# genuinely new text from boilerplate/template recombination — the
# counterpart signal to X2's duplicate detection, and the exact-count core
# of contamination / memorization audits.
# ---------------------------------------------------------------------------

_X4_NOVELTY_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
), tris AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tri
  FROM toks
  WHERE len(t) >= 3
), df AS (
  SELECT tri, count(*) AS doc_freq FROM tris GROUP BY tri
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_trigrams,
       CAST(sum(CASE WHEN d.doc_freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(sum(CASE WHEN d.doc_freq = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS novelty
FROM tris t JOIN df d USING (tri)
GROUP BY t.doc_id
"""


@register("x4_trigram_novelty", oracle=_X4_NOVELTY_ORACLE, tags=("X4", "text"), bench=True)
def x4_trigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc distinct trigrams → corpus doc-frequency → novel = df==1.

    Plan shape: trigrams build as array expressions inside the scan (three
    shifted slices zipped — no shuffle), then ONE shuffle on the trigram for
    the doc-frequency count and ONE doc-keyed aggregate back. At 100 TB the
    trigram shuffle carries (doc_id, trigram) pairs — to shrink it, swap the
    string for ``xxhash64(tri)`` (collision-safe at 64 bits for dedup-style
    counting); kept as the string here so the DuckDB oracle is definitionally
    identical. ``novelty`` is one division of two exact longs — bit-identical
    across engines (no double accumulation anywhere).
    """
    from realestatedeals_spark.util import spread_by_id

    # spread (round 12): the trigram slice-zip expressions otherwise build
    # on the fixture scan's one split (measured 0.96 → 0.68 s best at
    # sf0.1, rowsets identical)
    docs = spread_by_id(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    base = docs.select("doc_id", toks.alias("t")).filter(F.size("t") >= 3)
    m = F.size("t") - 2  # number of trigrams
    tris = F.zip_with(
        F.slice("t", 1, m),
        F.zip_with(F.slice("t", 2, m), F.slice("t", 3, m), lambda b, c: F.concat_ws(" ", b, c)),
        lambda a, bc: F.concat_ws(" ", a, bc),
    )
    doc_tris = (
        base.select("doc_id", F.explode(tris).alias("tri")).distinct()
    )
    df = doc_tris.groupBy("tri").agg(F.count(F.lit(1)).alias("doc_freq"))
    novel = F.sum(F.when(F.col("doc_freq") == 1, 1).otherwise(0)).cast("long")
    return (
        doc_tris.join(df, "tri")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            novel.alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_trigrams",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_trigrams").cast("double")).alias(
                "novelty"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X4 — corpus drift detection: chi-square-style per-term divergence between
# two source cohorts (src0-9 vs src10-19) — the monitoring primitive that
# catches a scraper change / domain shift between corpus versions before it
# trains into a model. Frequencies are exact longs; the score is a FIXED
# sequence of double ops on those longs (products first — int64 would
# overflow at ~1e11² — then one division), identical in both engines.
# ---------------------------------------------------------------------------

_X4_DRIFT_ORACLE = """
WITH toks AS (
  SELECT CASE WHEN CAST(substr(source, 4) AS INT) < 10 THEN 0 ELSE 1 END AS grp,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents),
tf AS (
  SELECT term,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fa,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fb
  FROM toks GROUP BY term),
tot AS (SELECT CAST(sum(fa) AS BIGINT) AS ta, CAST(sum(fb) AS BIGINT) AS tb FROM tf),
scored AS (
  SELECT term, fa, fb,
         (CAST(fa AS DOUBLE) * tb - CAST(fb AS DOUBLE) * ta)
           * (CAST(fa AS DOUBLE) * tb - CAST(fb AS DOUBLE) * ta)
           / (CAST(ta AS DOUBLE) * tb * (fa + fb)) AS drift
  FROM tf, tot)
SELECT term, fa, fb, round(drift, 6) AS drift
FROM scored ORDER BY drift DESC, term LIMIT 20
"""


@register("x4_term_drift", oracle=_X4_DRIFT_ORACLE, tags=("X4", "text", "drift"))
def x4_term_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    grp = F.when(F.substring("source", 4, 10).cast("int") < 10, 0).otherwise(1)
    toks = (
        docs.select(grp.alias("grp"), F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy("term").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("fa"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("fb"),
    )
    tot = tf.agg(F.sum("fa").alias("ta"), F.sum("fb").alias("tb"))
    diff = F.col("fa").cast("double") * F.col("tb") - F.col("fb").cast("double") * F.col("ta")
    drift = (diff * diff) / (
        F.col("ta").cast("double") * F.col("tb") * (F.col("fa") + F.col("fb"))
    )
    return (
        tf.crossJoin(F.broadcast(tot))
        .select("term", "fa", "fb", F.round(drift, 6).alias("drift"))
        .orderBy(F.col("drift").desc(), "term")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# X4 — readability scoring: per-doc Flesch-style score from vowel-group
# syllable estimates. Everything is per-row array arithmetic inside the
# scan — zero shuffle — and the score is a fixed sequence of double ops on
# exact integers, so the oracle is hash-exact. The fixture corpus has no
# sentence punctuation, so the sentence count is 1 by construction (named
# in the output column); on punctuated text, add a sentence-split term.
# ---------------------------------------------------------------------------

_X4_READABILITY_ORACLE = """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
  FROM documents),
syl AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_words,
         CAST(list_reduce(list_transform(words,
                w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1)),
              (a, x) -> a + x) AS BIGINT) AS n_syllables
  FROM w WHERE len(words) > 0)
SELECT doc_id, n_words, n_syllables,
       206.835 - 1.015 * (CAST(n_words AS DOUBLE))
               - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
         AS flesch_single_sentence
FROM syl
"""


@register("x4_readability", oracle=_X4_READABILITY_ORACLE, tags=("X4", "text", "quality"))
def x4_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: x != "")
    syllables = F.aggregate(
        F.transform(
            "words",
            lambda w: F.greatest(
                F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0)), F.lit(1)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    base = (
        docs.select("doc_id", words.alias("words"))
        .filter(F.size("words") > 0)
        .select(
            "doc_id",
            F.size("words").cast("long").alias("n_words"),
            syllables.alias("n_syllables"),
        )
    )
    nw = F.col("n_words").cast("double")
    ns = F.col("n_syllables").cast("double")
    return base.select(
        "doc_id",
        "n_words",
        "n_syllables",
        (F.lit(206.835) - F.lit(1.015) * nw - F.lit(84.6) * (ns / nw)).alias(
            "flesch_single_sentence"
        ),
    )


# ---------------------------------------------------------------------------
# X1 — canonicalized dedup: exact dedup AFTER text normalization (casefold +
# whitespace collapse + trim) — catches the re-encoded/re-wrapped copies
# byte-exact dedup misses, the standard first rung of the dedup ladder
# below MinHash. Reports what normalization bought: groups that exist only
# because of it.
# ---------------------------------------------------------------------------

_X1_CANON_ORACLE = """
WITH canon AS (
  SELECT doc_id,
         sha256(text) AS raw_hash,
         sha256(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS canon_hash
  FROM documents)
SELECT canon_hash,
       CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(count(DISTINCT raw_hash) AS BIGINT) AS n_raw_variants
FROM canon
GROUP BY canon_hash
"""


@register("x1_canonical_dedup", oracle=_X1_CANON_ORACLE, tags=("X1", "dedup", "canon"))
def x1_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    canon = F.trim(F.regexp_replace(F.lower("text"), " +", " "))
    return (
        docs.select(
            "doc_id",
            F.sha2("text", 256).alias("raw_hash"),
            F.sha2(canon, 256).alias("canon_hash"),
        )
        .groupBy("canon_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.count_distinct("raw_hash").alias("n_raw_variants"),
        )
    )


# ---------------------------------------------------------------------------
# X4 — keyword extraction: top-3 terms per document ranked by
# (tf desc, document-frequency asc, term asc) — term-frequency weighted
# toward corpus-rare terms, the integer-exact core of tf-idf tagging
# (the idf LOG is deliberately absent: ln() is not correctly-rounded-
# guaranteed across engines, and the log is monotone in df so the RANKING
# it induces per tf tier is exactly the df ascending order used here).
# ---------------------------------------------------------------------------

_X4_KEYWORDS_ORACLE = """
WITH tf AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents),
tfc AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tf GROUP BY 1, 2),
df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS doc_freq FROM tfc GROUP BY term),
ranked AS (
  SELECT t.doc_id, t.term, t.tf, d.doc_freq,
         row_number() OVER (PARTITION BY t.doc_id
                            ORDER BY t.tf DESC, d.doc_freq ASC, t.term) AS rk
  FROM tfc t JOIN df d USING (term))
SELECT doc_id, term, tf, doc_freq, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= 3
"""


@register("x4_keywords", oracle=_X4_KEYWORDS_ORACLE, tags=("X4", "text", "keywords"))
def x4_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    w = W.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("doc_freq").asc(), F.col("term")
    )
    return (
        tf.join(df, "term")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "doc_freq", F.col("rk").cast("int").alias("rk"))
    )


# ---------------------------------------------------------------------------
# X4 — model-based quality filtering TRAINED IN-ENGINE (round 7): full-batch
# gradient descent where each iteration is one map-side-combinable
# aggregation of integer-micros gradient contributions — bit-deterministic
# under any partitioning (operators/classifier.py).
#
# Oracled hash-exact since round 9: the training loop was DESIGNED
# bit-deterministic (integer-micros gradient sums, exp-free rational
# sigmoid, fixed driver-side float op sequence), which means the entire
# 12-iteration GD unrolls into SQL — one MATERIALIZED gradient-aggregate
# CTE plus one 1-row weight-update CTE per iteration, every float
# expression tree mirrored exactly (left-nested linear fold, the same
# (g/1e6)/n + l2·w update shape, power(var, 0.5) rather than sqrt so the
# std-dev takes the same libm path as Python's var**0.5). The oracle
# trains the model from scratch in DuckDB and reproduces every score to
# the bit — a full distributed ML training loop under a value-hash oracle.
# tests/test_classifier.py additionally pins weights and scores against an
# independent pandas implementation.
# ---------------------------------------------------------------------------

_CLF_LR, _CLF_L2, _CLF_ITERS = 6.0, 1e-4, 12


def _classifier_train_oracle() -> str:
    from realestatedeals_spark.operators.classifier import FEATURES

    sw = _sw_sql_list()
    raw = {
        "f_stop": (
            f"CAST(len(list_filter(string_split(text, ' '), x -> x IN {sw})) AS DOUBLE)"
            " / CAST(len(string_split(text, ' ')) AS DOUBLE)"
        ),
        "f_cpt": (
            "least(CAST(n_chars AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE),"
            " 12.0) / 12.0"
        ),
        "f_len": "least(CAST(n_chars AS DOUBLE), 1000.0) / 1000.0",
        "f_digit": (
            "CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)"
            " / CAST(n_chars AS DOUBLE)"
        ),
        "f_space": (
            "CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)"
            " / CAST(n_chars AS DOUBLE)"
        ),
    }
    # weak label: (8·f_stop − 1.5·f_len) + 0.2·(u − 0.5) > 0.02, u from the
    # first 8 md5 hex chars of the doc_id string — same tree as
    # operators/classifier.weak_quality_label
    u = (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
        " / 4294967296.0"
    )
    y = (
        f"CAST(((8.0 * ({raw['f_stop']}) - 1.5 * ({raw['f_len']}))"
        f" + 0.2 * (({u}) - 0.5)) > 0.02 AS DOUBLE)"
    )
    feats = ",\n         ".join(f"({e}) AS {n}" for n, e in raw.items())
    # standardization: micros-floored BIGINT sums, driver float finish
    sums = ",\n         ".join(
        f"CAST(sum(CAST(floor({n} * 1000000.0) AS BIGINT)) AS BIGINT) AS s_{n},\n"
        f"         CAST(sum(CAST(floor(({n} * {n}) * 1000000.0) AS BIGINT)) AS BIGINT)"
        f" AS q_{n}"
        for n in FEATURES
    )
    consts = ",\n         ".join(
        f"(CAST(s_{n} AS DOUBLE) / 1000000.0) / n AS mu_{n},\n"
        f"         CASE WHEN (CAST(q_{n} AS DOUBLE) / 1000000.0) / n"
        f" - ((CAST(s_{n} AS DOUBLE) / 1000000.0) / n)"
        f" * ((CAST(s_{n} AS DOUBLE) / 1000000.0) / n) > 1e-12"
        f" THEN power((CAST(q_{n} AS DOUBLE) / 1000000.0) / n"
        f" - ((CAST(s_{n} AS DOUBLE) / 1000000.0) / n)"
        f" * ((CAST(s_{n} AS DOUBLE) / 1000000.0) / n), 0.5)"
        f" ELSE 1.0 END AS sd_{n}"
        for n in FEATURES
    )
    std = ",\n         ".join(f"(f.{n} - c.mu_{n}) / c.sd_{n} AS {n}" for n in FEATURES)

    def linear(wp: str) -> str:
        z = f"{wp}.w0"
        for j, n in enumerate(FEATURES):
            z = f"({z}) + {wp}.w{j + 1} * s.{n}"
        return z

    its = []
    for k in range(1, _CLF_ITERS + 1):
        z = linear(f"w{k - 1}")
        p = f"(1.0 + ({z}) / (1.0 + abs({z}))) / 2.0"
        r = f"(({p}) - s.y)"
        gs = [f"CAST(sum(CAST(floor({r} * 1000000.0) AS BIGINT)) AS BIGINT) AS g0"]
        gs += [
            f"CAST(sum(CAST(floor(({r} * s.{n}) * 1000000.0) AS BIGINT)) AS BIGINT)"
            f" AS g{j + 1}"
            for j, n in enumerate(FEATURES)
        ]
        upd = ",\n         ".join(
            f"w{k - 1}.w{j} - {_CLF_LR!r} * ((CAST(g.g{j} AS DOUBLE) / 1000000.0)"
            f" / a.n + {_CLF_L2!r} * w{k - 1}.w{j}) AS w{j}"
            for j in range(len(FEATURES) + 1)
        )
        its.append(
            f"g{k} AS MATERIALIZED (\n  SELECT {', '.join(gs)}"
            f" FROM sfeats s CROSS JOIN w{k - 1}),\n"
            f"w{k} AS MATERIALIZED (\n  SELECT {upd}\n"
            f"  FROM w{k - 1} CROSS JOIN g{k} g CROSS JOIN agg a)"
        )
    zf = linear(f"w{_CLF_ITERS}")
    pf = f"(1.0 + ({zf}) / (1.0 + abs({zf}))) / 2.0"
    w0_init = ", ".join(f"0.0 AS w{j}" for j in range(len(FEATURES) + 1))
    return f"""
WITH feats AS MATERIALIZED (
  SELECT doc_id,
         {feats},
         {y} AS y
  FROM documents
  WHERE len(string_split(text, ' ')) > 0),
agg AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS n,
         {sums}
  FROM feats),
consts AS MATERIALIZED (
  SELECT {consts}
  FROM agg),
sfeats AS MATERIALIZED (
  SELECT f.doc_id,
         {std},
         f.y
  FROM feats f CROSS JOIN consts c),
w0 AS (SELECT {w0_init}),
{','.join(its)}
SELECT s.doc_id,
       CAST(floor(({pf}) * 1000000.0) AS BIGINT) AS score_micros,
       ({pf}) >= 0.5 AS keep,
       CAST(s.y AS BIGINT) AS label
FROM sfeats s CROSS JOIN w{_CLF_ITERS}
"""


@register(
    "x4_quality_classifier",
    oracle=_classifier_train_oracle(),
    tags=("X4", "text", "quality", "ml"),
)
def x4_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distill a noisy weak-supervision labeling rule into a linear scorer
    (exp-free logistic link, one-aggregation standardization, 12 GD
    iterations of one aggregation each) over the documents table, then
    score and filter the same corpus — the model-based quality-filter
    stage of an LLM data pipeline, with training itself distributed and
    bit-exactly reproducible under any partitioning."""
    from realestatedeals_spark.operators.classifier import (
        quality_features,
        score_quality,
        standardize,
        train_logreg_gd,
    )

    docs = load_table(spark, sf_dir, "documents")
    std, _mu, _sd, _n = standardize(quality_features(docs))
    w = train_logreg_gd(std, iters=12, lr=6.0, l2=1e-4)
    return score_quality(std, w)


# ---------------------------------------------------------------------------
# X4 — FROZEN-model quality scoring (round 7): the deploy path of the
# trained filter. Training (x4_quality_classifier) is iterative and
# rows-only; scoring with frozen weights is pure arithmetic — and because
# the link is the exp-free fast sigmoid and standardization constants are
# literals, the ENTIRE model evaluation replays exactly in SQL. This is
# the train-once / score-100TB split a production pipeline uses.
# ---------------------------------------------------------------------------


def _frozen_oracle() -> str:
    from realestatedeals_spark.operators.classifier import (
        FROZEN_MUS,
        FROZEN_SDS,
        FROZEN_W,
    )

    sw = _sw_sql_list()
    feats = [
        f"CAST(len(list_filter(string_split(text, ' '), x -> x IN {sw})) AS DOUBLE)"
        " / CAST(len(string_split(text, ' ')) AS DOUBLE)",
        "least(CAST(n_chars AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE),"
        " 12.0) / 12.0",
        "least(CAST(n_chars AS DOUBLE), 1000.0) / 1000.0",
        "CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)"
        " / CAST(n_chars AS DOUBLE)",
        "CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)"
        " / CAST(n_chars AS DOUBLE)",
    ]
    z = repr(FROZEN_W[0])
    for j, f in enumerate(feats):
        g = f"(({f}) - {FROZEN_MUS[j]!r}) / {FROZEN_SDS[j]!r}"
        z = f"({z}) + {FROZEN_W[j + 1]!r} * ({g})"
    p = f"(1.0 + ({z}) / (1.0 + abs({z}))) / 2.0"
    return f"""
SELECT doc_id,
       CAST(floor(({p}) * 1000000.0) AS BIGINT) AS score_micros,
       ({p}) >= 0.5 AS keep
FROM documents
WHERE len(string_split(text, ' ')) > 0
"""


@register("x4_quality_score_model", oracle=_frozen_oracle(), tags=("X4", "text", "quality", "ml"))
def x4_quality_score_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score the corpus with the frozen trained filter — pure column
    expressions, hash-exact against the SQL replay of the model."""
    from realestatedeals_spark.operators.classifier import score_frozen

    docs = load_table(spark, sf_dir, "documents")
    return score_frozen(docs)


# ---------------------------------------------------------------------------
# x4_bigram_surprisal — in-engine trained bigram language model scoring
# every document (the LM-based quality filter of CCNet/RedPajama-style
# pipelines, kept hash-exact). The model IS the corpus: bigram counts
# c(w1,w2) and continuation totals c(w1,·) aggregate in one pass, and each
# document's score is the mean inverse conditional probability
# avg[ c(w1,·)/c(w1,w2) ] — low for template/repetitive text (every bigram
# near-deterministic), high for incoherent token soup. Exactness recipe:
# the per-bigram ratio is computed as integer micros with BIGINT division
# (identical `div`/`//` semantics on both engines — no log/exp), and the
# final mean is ONE double division of two exact integers. Third example
# of the trained-operator pattern after x4_quality_classifier and
# x3_pca_project. Scale shape: two hash aggregations on bigram/unigram
# keys + two shuffle joins back to the (doc, bigram) stream; stop-bigram
# skew is the canonical AQE skew-join case.
# ---------------------------------------------------------------------------

_X4_BIGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
big AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
),
cnt AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM big GROUP BY 1, 2),
st AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM big GROUP BY 1),
scored AS (
  SELECT b.doc_id, (s.c1 * 1000000) // c.c2 AS micros
  FROM big b
  JOIN cnt c ON b.w1 = c.w1 AND b.w2 = c.w2
  JOIN st s ON b.w1 = s.w1
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(micros) AS BIGINT) AS inv_prob_micros_sum,
       CAST(sum(micros) AS DOUBLE) / CAST(count(*) * 1000000 AS DOUBLE) AS avg_inv_prob
FROM scored
GROUP BY doc_id
"""


@register("x4_bigram_surprisal", oracle=_X4_BIGRAM_ORACLE, tags=("X4", "text", "lm"))
def x4_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 2
    )
    big = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(t, 1, size(t) - 1),"
                " (w, i) -> struct(w AS w1, t[i + 1] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    cnt = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    st = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        big.join(cnt, ["w1", "w2"])
        .join(st, ["w1"])
        .select("doc_id", F.expr("c1 * 1000000 div c2").alias("micros"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("micros").alias("inv_prob_micros_sum"),
        (
            F.sum("micros").cast("double")
            / (F.count(F.lit(1)) * 1000000).cast("double")
        ).alias("avg_inv_prob"),
    )


# ---------------------------------------------------------------------------
# X4 — co-occurrence lift (association mining without logs): for frequent
# term pairs, lift = N * P(x,y) / (P(x) P(y)) kept as the exact integer
# rational floor(N * c_xy * 1e6 / (c_x * c_y)) — PMI's monotone argument
# without the ln() that would break hash-exactness.
# ---------------------------------------------------------------------------

_X4_LIFT_ORACLE = """
WITH tk AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents),
tk2 AS (SELECT * FROM tk WHERE term <> ''),
freq AS (
  SELECT term, count(*) AS cx FROM tk2 GROUP BY term HAVING count(*) >= 20),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*) AS pair_docs
  FROM tk2 a
  JOIN tk2 b ON a.doc_id = b.doc_id AND a.term < b.term
  JOIN freq fa ON fa.term = a.term
  JOIN freq fb ON fb.term = b.term
  GROUP BY 1, 2 HAVING count(*) >= 10),
n AS (SELECT count(*) AS nd FROM documents)
SELECT term_a, term_b,
       CAST(pair_docs AS BIGINT) AS pair_docs,
       CAST((nd * pair_docs * 1000000) // (fa.cx * fb.cx) AS BIGINT) AS lift_micros
FROM pairs
JOIN freq fa ON fa.term = pairs.term_a
JOIN freq fb ON fb.term = pairs.term_b, n
"""


@register("x4_token_lift", oracle=_X4_LIFT_ORACLE, tags=("X4", "text", "association"))
def x4_token_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-pair co-occurrence lift over the corpus (min doc-freq 20,
    min pair support 10).

    Scale shape: the a-priori prune happens BEFORE the pair join — the
    frequent-term dimension (bounded by the support threshold, tiny
    relative to the corpus) broadcasts onto the token table, so the
    self-join on doc_id only ever sees per-doc frequent tokens; pair
    counts then aggregate with map-side combine. Lift stays an exact
    integer rational (floor micros), so the oracle is hash-exact — the
    PMI ranking this feeds is monotone in it.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    tokens = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    freq = (
        tokens.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cx"))
        .filter(F.col("cx") >= 20)
    )
    tok_f = tokens.join(F.broadcast(freq), "term").select("doc_id", "term", "cx")
    a = tok_f.select(
        "doc_id", F.col("term").alias("term_a"), F.col("cx").alias("cx_a")
    )
    b = tok_f.select(
        "doc_id", F.col("term").alias("term_b"), F.col("cx").alias("cx_b")
    )
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b", "cx_a", "cx_b")
        .agg(F.count(F.lit(1)).alias("pair_docs"))
        .filter(F.col("pair_docs") >= 10)
    )
    return pairs.select(
        "term_a",
        "term_b",
        "pair_docs",
        F.expr(
            f"CAST(({n_docs}L * pair_docs * 1000000L) div (cx_a * cx_b) AS BIGINT)"
        ).alias("lift_micros"),
    )
