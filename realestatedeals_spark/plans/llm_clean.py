"""Corpus-cleaning queries: PII scrubbing, context-window chunking, and
bloom-pruned decontamination (SURVEY.md §2b X4/X8).

These extend the reference's text-normalization habit (cleaner.py's
regex-driven field scrubbing, cleaner.py:24-78) to the operations a
training-data pipeline runs over raw text at corpus scale. Everything stays
in JVM column expressions except the bloom membership probe, which is one
vectorized numpy gather per Arrow batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.plans.registry import register

# ---------------------------------------------------------------------------
# X4 — PII scrub: count + redact emails / US phone numbers / IPv4 addresses.
#
# The documents fixture is synthetic word soup with no PII, so the query
# first stamps each row with deterministic doc_id-derived PII (email, phone,
# IP) and then scrubs it — the injection is part of the query on BOTH the
# Spark and oracle sides, so the redaction logic is what gets checked. The
# patterns stay inside the Java-regex ∩ RE2 common subset (no backrefs, no
# lookarounds) so the oracle is bit-identical.
#
# Scale: pure regexp column expressions — whole-stage codegen, no UDF, no
# shuffle; the output hash keeps the comparison content-exact without ever
# materializing scrubbed text in the result.
# ---------------------------------------------------------------------------

_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_PII_ORACLE = f"""
WITH p AS (
  SELECT doc_id,
    text || ' contact doc' || doc_id || '@ex-mail.org or 415-555-' ||
    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
    ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 100) AS t
  FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '{_EMAIL}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(t, '{_PHONE}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(
    regexp_replace(regexp_replace(t, '{_PHONE}', '<PHONE>', 'g'),
                   '{_EMAIL}', '<EMAIL>', 'g'),
    '{_IPV4}')) AS BIGINT) AS n_ips,
  sha256(regexp_replace(regexp_replace(regexp_replace(t,
    '{_EMAIL}', '<EMAIL>', 'g'), '{_PHONE}', '<PHONE>', 'g'),
    '{_IPV4}', '<IP>', 'g')) AS scrubbed_hash
FROM p
"""


def _with_pii() -> F.Column:
    return F.concat(
        F.col("text"),
        F.lit(" contact doc"),
        F.col("doc_id"),
        F.lit("@ex-mail.org or 415-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("doc_id") % 256),
        F.lit(".0."),
        (F.col("doc_id") % 100),
    )


@register("x4_pii_scrub", oracle=_PII_ORACLE, tags=("X4", "text", "clean"))
def x4_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc PII hit counts + sha256 of the fully scrubbed text.

    Redaction order (email → phone → IP) is fixed and mirrored in the
    oracle: the IP pattern would otherwise eat dotted fragments of already-
    redacted tokens. ``n_ips`` is counted after phone/email removal for the
    same reason.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = _with_pii()
    no_phone = F.regexp_replace(t, _PHONE, "<PHONE>")
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(t, _EMAIL, "<EMAIL>"), _PHONE, "<PHONE>"),
        _IPV4,
        "<IP>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(_PHONE)).cast("long").alias("n_phones"),
        F.regexp_count(F.regexp_replace(no_phone, _EMAIL, "<EMAIL>"), F.lit(_IPV4))
        .cast("long")
        .alias("n_ips"),
        F.sha2(scrubbed, 256).alias("scrubbed_hash"),
    )


# ---------------------------------------------------------------------------
# X4 — context-window chunking: overlapping fixed-size token windows
# (size 64, stride 48 → 16-token overlap), the shape LLM pretraining and
# RAG indexing both consume. Distinct from x8_sequence_pack (which packs
# WHOLE docs into budgeted shards): chunking SPLITS single docs.
#
# Scale: sequence+posexplode fan-out is per-row and shuffle-free; output
# rows ≈ n_tokens/stride. The chunk hash stands in for chunk text so the
# result stays narrow.
# ---------------------------------------------------------------------------

_CHUNK, _STRIDE = 64, 48

_CHUNK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
s AS (
  SELECT doc_id, t, unnest(generate_series(0, len(t) - 1, {_STRIDE})) AS start
  FROM toks WHERE len(t) > 0)
SELECT doc_id, CAST(start / {_STRIDE} AS INT) AS chunk_id,
       CAST(len(list_slice(t, start + 1, least(start + {_CHUNK}, len(t)))) AS BIGINT)
         AS n_chunk_tokens,
       sha256(array_to_string(
         list_slice(t, start + 1, least(start + {_CHUNK}, len(t))), ' '))
         AS chunk_hash
FROM s
"""


@register("x4_chunk_documents", oracle=_CHUNK_ORACLE, tags=("X4", "text", "clean"))
def x4_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunks per document with content hashes.

    Every token position is covered by construction (stride < chunk size);
    the final window may be short — kept, since truncating it would drop
    tail tokens. Empty docs chunk to nothing (filter, not a zero-row
    sequence, so Spark and the oracle agree on the n=0 edge).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    chunk = F.slice("t", F.col("start") + 1, _CHUNK)
    return (
        docs.select("doc_id", toks.alias("t"))
        .filter(F.size("t") > 0)
        .select(
            "doc_id",
            F.posexplode(F.sequence(F.lit(0), F.size("t") - 1, F.lit(_STRIDE))).alias(
                "chunk_id", "start"
            ),
            "t",
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.sha2(F.array_join(chunk, " "), 256).alias("chunk_hash"),
        )
    )


# ---------------------------------------------------------------------------
# X8 — bloom-pruned decontamination: byte-identical semantics to
# x8_decontaminate (same oracle), but corpus shingles pass a broadcast
# Bloom filter of the eval set BEFORE the shuffle join — at 100 TB the
# equi-join's shuffle input drops ~99% while the downstream exact join
# re-checks every bloom positive, so false positives cost only wasted probe
# work and false negatives cannot exist. See operators/bloom.py for the
# filter build (driver memory bounded by filter geometry, not corpus size).
# ---------------------------------------------------------------------------

_BLOOM_DECON_ORACLE = """
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


@register(
    "x8_bloom_decontaminate",
    oracle=_BLOOM_DECON_ORACLE,
    tags=("X8", "pipeline", "dedup"),
)
def x8_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x8_decontaminate with a broadcast-bloom shuffle pruner.

    Two bounded driver actions build the filter (eval shingle count → bloom
    sizing → distinct-bit-position collect); the query itself then runs as
    one lazy plan. The eval shingle set is persisted across its three uses
    (count, bloom build, verify join) — it is eval-set-sized, not
    corpus-sized.
    """
    from realestatedeals_spark.operators.bloom import (
        build_bloom,
        might_contain,
        sizing,
    )
    from realestatedeals_spark.operators.dedup import shingle_table

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_table(docs, k=4)
    ev = sh.filter(F.col("_id") % 50 == 0).select("shingle").distinct().persist()
    n_bits, k = sizing(ev.count(), fpp=0.01)
    packed = build_bloom(ev, "shingle", n_bits, k)
    corpus = sh.filter(F.col("_id") % 50 != 0)
    candidates = corpus.filter(might_contain(spark, packed, n_bits, k, F.col("shingle")))
    return (
        candidates.join(ev, "shingle")
        .groupBy(F.col("_id").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


# ---------------------------------------------------------------------------
# X4 — distributed BPE merge-table training (see operators/bpe.py for the
# corpus-once / vocab-bounded-iterations scale shape). No SQL oracle:
# iterative argmax-and-rewrite is not SQL-expressible; the check is exact
# merge-table equality against a pure-Python reference BPE in
# tests/test_bpe.py, plus determinism of the tie-break.
# ---------------------------------------------------------------------------

_BPE_MERGES = 24


@register("x4_bpe_train_merges", tags=("X4", "text", "iterative"))
def x4_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 24 learned BPE merges over the documents corpus."""
    from realestatedeals_spark.operators.bpe import train_bpe

    docs = load_table(spark, sf_dir, "documents")
    rows = train_bpe(docs, _BPE_MERGES)
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, pair_weight bigint"
    )


@register("x4_bpe_encode", tags=("X4", "text", "iterative"))
def x4_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 12 BPE merges on the corpus, then tokenize every document with
    them (train → encode in one lazy-where-possible flow). Rows-only like
    the trainer; tests pin token-stream equality vs the reference encoder."""
    from realestatedeals_spark.operators.bpe import encode_with_merges, train_bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, 12)
    return encode_with_merges(docs, merges)


# ---------------------------------------------------------------------------
# X4 — URL canonicalization (round 7): the normalization pass crawl dedup
# needs before any exact/near dedup. Like x4_pii_scrub, the fixture has no
# URLs, so the query deterministically synthesizes MESSY ones per doc_id
# (case noise, default ports, trailing slashes, shuffled query params,
# utm_* junk, fragments) on BOTH sides, then checks the generic
# canonicalizer (functions/web.py) collapses them: same canonical URL ⇒
# same variant group, counted via one window.
# ---------------------------------------------------------------------------

_URL_RAW_SQL = """
  CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END || '://' ||
  CASE WHEN doc_id % 3 = 0 THEN 'WWW.SITE' ELSE 'www.site' END ||
  CAST(doc_id % 25 AS VARCHAR) || '.example' ||
  CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END ||
  '/docs/' || CAST(doc_id % 50 AS VARCHAR) ||
  CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END ||
  CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1' ELSE '?a=1&b=2' END ||
  CASE WHEN doc_id % 3 = 0 THEN '&utm_source=feed' ELSE '' END ||
  CASE WHEN doc_id % 2 = 1 THEN '#sec' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END
"""

_X4_URL_ORACLE = f"""
WITH raw AS (SELECT doc_id, {_URL_RAW_SQL} AS url FROM documents),
parts AS (
  SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS base FROM raw),
p2 AS (
  SELECT doc_id, url,
         lower(regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         lower(regexp_extract(base, '^[^:]+://([^/?]+)', 1)) AS hostport,
         regexp_extract(base, '^[^:]+://[^/?]+([^?]*)', 1) AS raw_path,
         regexp_extract(base, '\\?(.*)$', 1) AS qraw
  FROM parts),
p3 AS (
  SELECT doc_id, url, scheme,
         CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
              WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
              ELSE hostport END AS host,
         CASE WHEN raw_path IN ('', '/') THEN '/'
              ELSE regexp_replace(raw_path, '/$', '') END AS path,
         list_sort(list_filter(string_split(qraw, '&'),
                               p -> p <> '' AND NOT starts_with(p, 'utm_'))) AS params
  FROM p2),
canon AS (
  SELECT doc_id, url,
         scheme || '://' || host || path ||
         CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&')
              ELSE '' END AS url_canon
  FROM p3)
SELECT doc_id, url AS url_raw, url_canon,
       CAST(count(*) OVER (PARTITION BY url_canon) AS BIGINT) AS n_variants
FROM canon
"""


@register("x4_url_canonicalize", oracle=_X4_URL_ORACLE, tags=("X4", "clean", "web"))
def x4_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Messy-URL synthesis + generic canonicalizer + variant-group counts;
    hash-exact against the oracle replaying the same normalization."""
    from pyspark.sql import Window as W

    from realestatedeals_spark.functions.web import canonicalize_url

    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("HTTP")).otherwise(F.lit("http")),
        F.lit("://"),
        F.when(d % 3 == 0, F.lit("WWW.SITE")).otherwise(F.lit("www.site")),
        (d % 25).cast("string"),
        F.lit(".example"),
        F.when(d % 4 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/docs/"),
        (d % 50).cast("string"),
        F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 2 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("?a=1&b=2")),
        F.when(d % 3 == 0, F.lit("&utm_source=feed")).otherwise(F.lit("")),
        F.when(d % 2 == 1, F.concat(F.lit("#sec"), (d % 7).cast("string"))).otherwise(
            F.lit("")
        ),
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", url.alias("url_raw"))
    canon = docs.select(
        "doc_id", "url_raw", canonicalize_url(F.col("url_raw")).alias("url_canon")
    )
    return canon.withColumn(
        "n_variants", F.count(F.lit(1)).over(W.partitionBy("url_canon")).cast("long")
    )


# ---------------------------------------------------------------------------
# X4 — HTML boilerplate removal (round 7): the main-content extraction a
# web-crawl pipeline runs before any text analysis. The fixture is plain
# text, so both sides wrap each document in a deterministic page skeleton
# (title/style/script head, nav, ad div, <main> with the real text split
# across two <p>s and an entity, footer) and the GENERIC extractor
# (functions/web.py:extract_main_text) must recover exactly the original
# text plus the planted second paragraph — checked by string equality in
# the output, hash-exact in the oracle.
# ---------------------------------------------------------------------------

_HTML_WRAP_SQL = """
  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
  '</title><style>.ad{display:block}</style>' ||
  '<script>var trk="' || CAST(doc_id % 97 AS VARCHAR) || '";</script></head>' ||
  '<body><nav><ul><li>Home</li><li>Listings</li></ul></nav>' ||
  '<div class="ad">BUY NOW ' || CAST(doc_id % 13 AS VARCHAR) || '</div>' ||
  '<main><p>' || text || '</p> <p>tail &amp; id ' || CAST(doc_id % 7 AS VARCHAR) ||
  '</p></main><footer>© example ' || CAST(2000 + doc_id % 25 AS VARCHAR) ||
  '</footer></body></html>'
"""

_X4_HTML_ORACLE = f"""
WITH pages AS (SELECT doc_id, text, {_HTML_WRAP_SQL} AS html FROM documents),
x1 AS (SELECT doc_id, text, regexp_replace(html, '<script[^>]*>.*?</script>', '', 'g') AS h FROM pages),
x2 AS (SELECT doc_id, text, regexp_replace(h, '<style[^>]*>.*?</style>', '', 'g') AS h FROM x1),
x3 AS (SELECT doc_id, text, regexp_extract(h, '<main[^>]*>(.*?)</main>', 1) AS h FROM x2),
x4 AS (SELECT doc_id, text, regexp_replace(h, '</p>\\s*<p[^>]*>', E'\\n', 'g') AS h FROM x3),
x5 AS (SELECT doc_id, text, regexp_replace(h, '<[^>]+>', '', 'g') AS h FROM x4),
x6 AS (SELECT doc_id, text,
              replace(replace(replace(replace(replace(h,
                '&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', '''') AS h
       FROM x5),
x7 AS (SELECT doc_id, text, trim(regexp_replace(h, '  +', ' ', 'g')) AS extracted FROM x6)
SELECT doc_id, extracted,
       extracted = text || E'\\ntail & id ' || CAST(doc_id % 7 AS VARCHAR) AS exact_recovery
FROM x7
"""


def wrap_html(d: F.Column) -> F.Column:
    """The deterministic page skeleton shared by the HTML-extraction query
    and the crawl-pipeline capstone (same construction as _HTML_WRAP_SQL)."""
    return F.concat(
        F.lit("<html><head><title>Doc "), d.cast("string"),
        F.lit("</title><style>.ad{display:block}</style>"),
        F.lit('<script>var trk="'), (d % 97).cast("string"), F.lit('";</script></head>'),
        F.lit("<body><nav><ul><li>Home</li><li>Listings</li></ul></nav>"),
        F.lit('<div class="ad">BUY NOW '), (d % 13).cast("string"), F.lit("</div>"),
        F.lit("<main><p>"), F.col("text"),
        F.lit("</p> <p>tail &amp; id "), (d % 7).cast("string"),
        F.lit("</p></main><footer>© example "), (2000 + d % 25).cast("string"),
        F.lit("</footer></body></html>"),
    )


@register("x4_html_extract", oracle=_X4_HTML_ORACLE, tags=("X4", "clean", "web"))
def x4_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap each document in a deterministic page skeleton, run the generic
    boilerplate stripper, and assert exact recovery of the main content."""
    from realestatedeals_spark.functions.web import extract_main_text

    d = F.col("doc_id")
    html = wrap_html(d)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", html.alias("html"))
    out = docs.select(
        "doc_id", "text", extract_main_text(F.col("html")).alias("extracted")
    )
    expect = F.concat(F.col("text"), F.lit("\ntail & id "), (d % 7).cast("string"))
    return out.select(
        "doc_id", "extracted", (F.col("extracted") == expect).alias("exact_recovery")
    )


# ---------------------------------------------------------------------------
# X4 — deterministic pseudonymization (round 7): x4_pii_scrub REDACTS;
# this TOKENIZES — each PII value maps to a stable keyed token
# (md5(key || value) prefix), so the same email always becomes the same
# token and joins/group-bys on the pseudonymized column still work — the
# privacy transform a training pipeline applies when it must keep linkage
# without keeping identities. Same synthesis-on-both-sides pattern as the
# scrub query; token derivation is md5, exactly replayable in SQL.
# ---------------------------------------------------------------------------

_PSEUDO_KEY = "corpus-epoch-7"

_X4_PSEUDO_ORACLE = f"""
WITH seeded AS (
  SELECT doc_id,
         'user' || CAST(doc_id % 41 AS VARCHAR) || '@mail' ||
           CAST(doc_id % 7 AS VARCHAR) || '.example' AS email
  FROM documents),
tok AS (
  SELECT doc_id, email,
         'pii_' || substr(md5('{_PSEUDO_KEY}:' || email), 1, 16) AS token
  FROM seeded)
SELECT doc_id, token,
       CAST(count(*) OVER (PARTITION BY token) AS BIGINT) AS n_same_person
FROM tok
"""


@register("x4_pseudonymize", oracle=_X4_PSEUDO_ORACLE, tags=("X4", "clean", "privacy"))
def x4_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable keyed tokens for synthesized emails; the window count proves
    linkage survives (every doc sharing an email shares a token)."""
    from pyspark.sql import Window as W

    d = F.col("doc_id")
    email = F.concat(
        F.lit("user"), (d % 41).cast("string"), F.lit("@mail"),
        (d % 7).cast("string"), F.lit(".example"),
    )
    token = F.concat(
        F.lit("pii_"),
        F.substring(F.md5(F.concat(F.lit(_PSEUDO_KEY + ":"), email)), 1, 16),
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", token.alias("token"))
    return docs.withColumn(
        "n_same_person", F.count(F.lit(1)).over(W.partitionBy("token")).cast("long")
    )


# ---------------------------------------------------------------------------
# X4 — Unicode NFC normalization (the canonicalization step that runs
# before any exact/near dedup: visually-identical strings must hash
# identically). Each doc gets a deterministic suffix — decomposed
# e+U+0301 A+U+030A for doc_id % 3 != 0, precomposed e-acute/A-ring
# otherwise — and the engine normalizes with Python's unicodedata inside
# an Arrow-batched mapInPandas stage. The oracle normalizes with DuckDB's
# independent nfc_normalize implementation: a hash match means two
# unrelated NFC implementations agree byte-for-byte on every document.
# ---------------------------------------------------------------------------

_X4_NFC_ORACLE = """
WITH s AS (
  SELECT doc_id,
         substr(text, 1, 40)
         || CASE WHEN doc_id % 3 = 0 THEN chr(233) || chr(197)
                 ELSE chr(101) || chr(769) || chr(65) || chr(778) END AS raw
  FROM documents)
SELECT doc_id,
       md5(nfc_normalize(raw)) AS norm_md5,
       nfc_normalize(raw) <> raw AS changed,
       CAST(length(raw) AS BIGINT) AS cp_before,
       CAST(length(nfc_normalize(raw)) AS BIGINT) AS cp_after
FROM s
"""


@register("x4_nfc_normalize", oracle=_X4_NFC_ORACLE, tags=("X4", "text", "unicode"))
def x4_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC-normalize every document and report md5/length before-after.

    Scale shape: one Arrow-batched mapInPandas pass, no shuffle; the
    normalized hash feeds straight into the exact-dedup group-by."""
    import unicodedata

    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 40),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("\u00e9\u00c5")  # precomposed
            ).otherwise(
                F.lit("e\u0301A\u030a")  # decomposed NFD sequences
            ),
        ).alias("raw"),
    )

    def normalize(batches):
        for pdf in batches:
            norm = pdf["raw"].map(lambda s: unicodedata.normalize("NFC", s))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "norm_md5": norm.map(
                        lambda s: __import__("hashlib").md5(s.encode()).hexdigest()
                    ),
                    "changed": norm.ne(pdf["raw"]),
                    "cp_before": pdf["raw"].str.len().astype("int64"),
                    "cp_after": norm.str.len().astype("int64"),
                }
            )

    return docs.mapInPandas(
        normalize,
        schema="doc_id long, norm_md5 string, changed boolean, cp_before long, cp_after long",
    )


# ---------------------------------------------------------------------------
# X4 — Unicode script-mix profiling: per-document counts of Latin /
# Cyrillic / Han / digit characters plus the dominant script — the signal
# a multilingual pipeline routes on (and the mixed-script heuristic that
# flags spam/mojibake). Counts via the length-difference trick on script
# property classes, which the Java regex engine (\\p{IsCyrillic}) and RE2
# (\\p{Cyrillic}) both implement from the same Unicode tables — verified
# equal, so the oracle is hash-exact. Docs get deterministic Cyrillic/Han
# suffixes since the fixture corpus is ASCII.
# ---------------------------------------------------------------------------

_CYR = "привет"  # privet
_HAN = "漢字"  # han zi
_CYR_SQL = "chr(1087)||chr(1088)||chr(1080)||chr(1074)||chr(1077)||chr(1090)"
_HAN_SQL = "chr(28450)||chr(23383)"

_X4_SCRIPT_ORACLE = f"""
WITH s AS (
  SELECT doc_id,
         substr(text, 1, 30)
         || repeat({_CYR_SQL}, CAST(doc_id % 3 AS INTEGER))
         || repeat({_HAN_SQL}, CAST(doc_id % 2 AS INTEGER)) AS t
  FROM documents),
counted AS (
  SELECT doc_id,
         CAST(length(t) - length(regexp_replace(t, '\\p{{Latin}}', '', 'g')) AS BIGINT) AS n_latin,
         CAST(length(t) - length(regexp_replace(t, '\\p{{Cyrillic}}', '', 'g')) AS BIGINT) AS n_cyrillic,
         CAST(length(t) - length(regexp_replace(t, '\\p{{Han}}', '', 'g')) AS BIGINT) AS n_han,
         CAST(length(t) - length(regexp_replace(t, '[0-9]', '', 'g')) AS BIGINT) AS n_digit
  FROM s)
SELECT doc_id, n_latin, n_cyrillic, n_han, n_digit,
       list_sort([
         struct_pack(neg := -n_latin, name := 'latin'),
         struct_pack(neg := -n_cyrillic, name := 'cyrillic'),
         struct_pack(neg := -n_han, name := 'han')
       ])[1].name AS dominant
FROM counted
"""


@register("x4_script_mix", oracle=_X4_SCRIPT_ORACLE, tags=("X4", "text", "unicode"))
def x4_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc script histogram + dominant script (count desc, name asc).

    Scale shape: pure column expressions in the scan — zero shuffle."""
    d = F.col("doc_id")
    t = F.concat(
        F.substring("text", 1, 30),
        F.repeat(F.lit(_CYR), (d % 3).cast("int")),
        F.repeat(F.lit(_HAN), (d % 2).cast("int")),
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", t.alias("t"))

    def cnt(cls: str) -> F.Column:
        return (
            F.length("t") - F.length(F.regexp_replace("t", cls, ""))
        ).cast("long")

    counted = docs.select(
        "doc_id",
        cnt(r"\p{IsLatin}").alias("n_latin"),
        cnt(r"\p{IsCyrillic}").alias("n_cyrillic"),
        cnt(r"\p{IsHan}").alias("n_han"),
        cnt(r"[0-9]").alias("n_digit"),
    )
    dom = F.array_min(
        F.array(
            F.struct((-F.col("n_latin")).alias("neg"), F.lit("latin").alias("name")),
            F.struct(
                (-F.col("n_cyrillic")).alias("neg"), F.lit("cyrillic").alias("name")
            ),
            F.struct((-F.col("n_han")).alias("neg"), F.lit("han").alias("name")),
        )
    )["name"]
    return counted.withColumn("dominant", dom)


# ---------------------------------------------------------------------------
# X4 — unigram-LM tokenizer (Kudo 2018; the SentencePiece unigram
# algorithm), round 7: the second standard subword tokenizer, alongside
# BPE. Same scale contract (corpus read once; EM iterations run on the
# vocab-bounded word table; expected counts aggregate as exact int64
# micros so training is bit-deterministic under any partitioning). The
# log-space EM + pruning loop itself is not SQL-expressible (libm
# exp/log), so train/encode stay rows-only — but the DISTRIBUTED half is
# oracled hash-exact by x4_unigram_lattice_counts below (integer
# path-count E-step); tests/test_unigram.py pins the trained vocab
# against an enumeration-based pure-Python reference (forward-backward vs
# explicit segmentation enumeration) and brute-force verifies Viterbi
# encode optimality.
# ---------------------------------------------------------------------------


# Hash-exact companion of the unigram E-step (round 10): with every piece
# probability ≡ 1 the forward-backward lattice pass degenerates to INTEGER
# segmentation-path counting — alpha[i] = number of ways to segment
# word[:i] over the seed vocab, beta mirrored — and each piece's aggregate
# (Σ over occurrences of alpha[j]·beta[i]·word_weight) is exact int64.
# The oracle replays the DP with two sliding-window recursive CTEs (fwd on
# the word, bwd on the reversed word over reversed pieces; the window
# carries alpha[i-5..i] as six columns, exactly max_piece_len wide), so
# the whole distributed E-step machinery — corpus word-frequency shuffle,
# per-word lattice DP, piece-keyed sum — is oracled; only the log-space
# M-step (libm) stays rows-only in x4_unigram_train.
def _x4_lattice_joins(src: str) -> str:
    """Six LEFT JOINs probing the (reversed for bwd) vocab for the piece
    ending at position i+1 with length k+1, k = 0..5."""
    voc = "rvocab" if src == "bwd" else "vocab"
    return "\n".join(
        f"  LEFT JOIN {voc} v{k} ON f.i >= {k} AND"
        f" v{k}.piece = substr(f.{'rword' if src == 'bwd' else 'word'},"
        f" f.i - {k} + 1, {k + 1})"
        for k in range(6)
    )


def _x4_lattice_step() -> str:
    return " + ".join(
        f"(CASE WHEN v{k}.piece IS NOT NULL THEN f.c{k} ELSE CAST(0 AS BIGINT) END)"
        for k in range(6)
    )


_X4_UNIGRAM_LATTICE_ORACLE = f"""
WITH RECURSIVE
wf AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS weight, length(word) AS n
  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
               AS word
        FROM documents)
  WHERE length(word) <= 32
  GROUP BY word),
subs AS MATERIALIZED (
  SELECT piece, CAST(sum(weight) AS BIGINT) AS w FROM (
    SELECT w.weight,
           unnest(flatten(list_transform(range(0, w.n),
             j -> list_transform(range(1, least(6, w.n - j) + 1),
               l -> substr(w.word, CAST(j AS INT) + 1, CAST(l AS INT))))))
             AS piece
    FROM wf w)
  GROUP BY piece),
vocab AS MATERIALIZED (
  SELECT piece FROM subs WHERE length(piece) = 1
  UNION ALL
  SELECT piece FROM (SELECT piece FROM subs WHERE length(piece) > 1
                     ORDER BY w DESC, piece LIMIT 192)),
rvocab AS MATERIALIZED (SELECT reverse(piece) AS piece FROM vocab),
fwd AS (
  SELECT word, n, 0 AS i, CAST(1 AS BIGINT) AS c0, CAST(0 AS BIGINT) AS c1,
         CAST(0 AS BIGINT) AS c2, CAST(0 AS BIGINT) AS c3,
         CAST(0 AS BIGINT) AS c4, CAST(0 AS BIGINT) AS c5
  FROM wf
  UNION ALL
  SELECT f.word, f.n, f.i + 1,
         {_x4_lattice_step()},
         f.c0, f.c1, f.c2, f.c3, f.c4
  FROM fwd f
{_x4_lattice_joins("fwd")}
  WHERE f.i < f.n),
bwd AS (
  SELECT word, reverse(word) AS rword, n, 0 AS i,
         CAST(1 AS BIGINT) AS c0, CAST(0 AS BIGINT) AS c1,
         CAST(0 AS BIGINT) AS c2, CAST(0 AS BIGINT) AS c3,
         CAST(0 AS BIGINT) AS c4, CAST(0 AS BIGINT) AS c5
  FROM wf
  UNION ALL
  SELECT f.word, f.rword, f.n, f.i + 1,
         {_x4_lattice_step()},
         f.c0, f.c1, f.c2, f.c3, f.c4
  FROM bwd f
{_x4_lattice_joins("bwd")}
  WHERE f.i < f.n),
fa AS MATERIALIZED (SELECT word, i, c0 AS a FROM fwd WHERE c0 > 0),
fb AS MATERIALIZED (SELECT word, n - i AS j, c0 AS b FROM bwd WHERE c0 > 0),
occ AS (
  SELECT w.word, w.weight, CAST(t.j AS INT) AS j, CAST(t2.l AS INT) AS l,
         substr(w.word, CAST(t.j AS INT) + 1, CAST(t2.l AS INT)) AS piece
  FROM wf w, range(0, 32) t(j), range(1, 7) t2(l)
  WHERE t.j < w.n AND t.j + t2.l <= w.n)
SELECT o.piece AS piece, CAST(sum(fa.a * fb.b * o.weight) AS BIGINT) AS paths
FROM occ o
JOIN vocab v ON v.piece = o.piece
JOIN fa ON fa.word = o.word AND fa.i = o.j
JOIN fb ON fb.word = o.word AND fb.j = o.j + o.l
GROUP BY o.piece
"""


@register(
    "x4_unigram_lattice_counts",
    oracle=_X4_UNIGRAM_LATTICE_ORACLE,
    tags=("X4", "text", "oracle-companion"),
)
def x4_unigram_lattice_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer lattice-path-count E-step over the documents corpus — the
    unigram trainer's distributed half (word-freq shuffle → per-word
    forward-backward in mapInPandas → piece-keyed sum), hash-exact
    (operators/unigram.py:lattice_count_table)."""
    from realestatedeals_spark.operators.unigram import lattice_count_table

    docs = load_table(spark, sf_dir, "documents")
    return lattice_count_table(docs, max_seed=192)


@register("x4_unigram_train", tags=("X4", "text", "iterative"))
def x4_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM vocabulary (chars + top 32 multi-char pieces) trained by
    EM + pruning over the documents corpus; logprob rounded for display."""
    from realestatedeals_spark.operators.unigram import train_unigram

    docs = load_table(spark, sf_dir, "documents")
    vocab = train_unigram(
        docs, vocab_multi=32, max_seed=192, em_rounds=1, shrink=0.5
    )
    return spark.createDataFrame(
        [(p, round(lp, 9)) for p, lp in vocab], "piece string, logprob double"
    )


@register("x4_unigram_encode", tags=("X4", "text", "iterative"))
def x4_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a small unigram vocab, then Viterbi-tokenize every document
    with it (train → encode, the BPE-encode contract: id, token count,
    token-stream hash). Rows-only; tests pin Viterbi optimality and exact
    agreement with the reference segmenter."""
    from realestatedeals_spark.operators.unigram import (
        encode_unigram,
        train_unigram,
    )

    docs = load_table(spark, sf_dir, "documents")
    vocab = train_unigram(
        docs, vocab_multi=24, max_seed=128, em_rounds=1, shrink=0.5
    )
    return encode_unigram(docs, vocab)
