"""X9 — retrieval pipeline capstone: chunk → embed → top-k (one lazy plan).

The RAG-indexing shape end-to-end: documents split into overlapping
64/48-token context windows (same contract as ``x4_chunk_documents``), each
chunk embedded, and a bounded query set retrieves its top-5 most similar
corpus chunks by cosine. All three stages compose as ONE lazy DataFrame
plan — no materialization barriers between chunking, embedding, and
scoring.

The embedder here is a deterministic hash projection (dim 16: component i =
scaled 32-bit md5 prefix of ``chunk_text + ':' + i``) — a stand-in with the
exact data flow of a model encoder but expressible in ANSI SQL, so the
WHOLE pipeline is DuckDB-oracle-checked, not just its relational skeleton.
Swapping in a real encoder = replacing one column expression with a
vectorized pandas UDF (the ``x3_cosine_topk_gemm`` Arrow path); nothing
else in the plan changes.

Scale shape: chunking is shuffle-free Generate fan-out inside the scan;
embeddings are per-row expressions (no shuffle); the query side is bounded
(chunks of 5 query docs) and broadcast, so scoring is a linear scan of
corpus chunks — the brute-force baseline. At 100 TB swap the scan for the
PQ/IVF/LSH candidate paths (operators/similarity.py) — same output
contract, pruned candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.plans.registry import register

_CHUNK, _STRIDE = 64, 48
_DIM = 16
_N_QUERY_DOCS = 5
_TOPK = 5

_X9_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
s AS (
  SELECT doc_id, t, unnest(generate_series(0, len(t) - 1, {_STRIDE})) AS start
  FROM toks WHERE len(t) > 0),
chunks AS (
  SELECT doc_id, CAST(start / {_STRIDE} AS INT) AS chunk_id,
         array_to_string(list_slice(t, start + 1, least(start + {_CHUNK}, len(t))), ' ')
           AS chunk_text
  FROM s),
emb AS (
  SELECT doc_id, chunk_id,
         list_transform(range(0, {_DIM}),
           i -> ('0x' || substr(md5(chunk_text || ':' || i), 1, 8))::BIGINT
                / 4294967296.0 - 0.5) AS v
  FROM chunks),
q AS (SELECT doc_id AS q_doc, chunk_id AS q_chunk, v AS qv
      FROM emb WHERE doc_id < {_N_QUERY_DOCS}),
c AS (SELECT doc_id AS n_doc, chunk_id AS n_chunk, v
      FROM emb WHERE doc_id >= {_N_QUERY_DOCS}),
pairs AS (
  SELECT q.q_doc, q.q_chunk, c.n_doc, c.n_chunk,
         list_reduce(list_transform(range(1, {_DIM + 1}),
                     i -> qv[i] * v[i]), (acc, x) -> acc + x)
         / (sqrt(list_reduce(list_transform(range(1, {_DIM + 1}),
                       i -> qv[i] * qv[i]), (acc, x) -> acc + x))
            * sqrt(list_reduce(list_transform(range(1, {_DIM + 1}),
                       i -> v[i] * v[i]), (acc, x) -> acc + x))) AS cosine
  FROM q, c),
ranked AS (
  SELECT q_doc, q_chunk, n_doc, n_chunk, cosine,
         row_number() OVER (PARTITION BY q_doc, q_chunk
                            ORDER BY cosine DESC, n_doc, n_chunk) AS rk
  FROM pairs)
SELECT q_doc, q_chunk, n_doc, n_chunk,
       CAST(rk AS INTEGER) AS rk, round(cosine, 6) AS cosine
FROM ranked WHERE rk <= {_TOPK}
"""


def _hash_embed(text_col: F.Column) -> F.Column:
    """Deterministic dim-16 hash projection, bit-identical to the oracle's:
    component i = md5-32-bit-prefix of ``text + ':' + i`` scaled to
    [-0.5, 0.5)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(_DIM - 1)),
        lambda i: F.conv(
            F.substring(F.md5(F.concat(text_col, F.lit(":"), i.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
        - 0.5,
    )


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


@register("x9_rag_retrieval", oracle=_X9_ORACLE, tags=("X9", "retrieval", "pipeline"), bench=True)
def x9_rag_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    chunk_text = F.array_join(F.slice("t", F.col("start") + 1, _CHUNK), " ")
    chunks = (
        docs.select("doc_id", toks.alias("t"))
        .filter(F.size("t") > 0)
        .select(
            "doc_id",
            F.posexplode(F.sequence(F.lit(0), F.size("t") - 1, F.lit(_STRIDE))).alias(
                "chunk_id", "start"
            ),
            "t",
        )
        .select("doc_id", "chunk_id", _hash_embed(chunk_text).alias("v"))
    )
    q = chunks.filter(F.col("doc_id") < _N_QUERY_DOCS).select(
        F.col("doc_id").alias("q_doc"), F.col("chunk_id").alias("q_chunk"),
        F.col("v").alias("qv"),
    )
    c = chunks.filter(F.col("doc_id") >= _N_QUERY_DOCS).select(
        F.col("doc_id").alias("n_doc"), F.col("chunk_id").alias("n_chunk"), "v"
    )
    norm = lambda col: F.sqrt(_dot(col, col))  # noqa: E731
    pairs = c.crossJoin(F.broadcast(q)).select(
        "q_doc",
        "q_chunk",
        "n_doc",
        "n_chunk",
        (_dot(F.col("qv"), F.col("v")) / (norm(F.col("qv")) * norm(F.col("v")))).alias(
            "cosine"
        ),
    )
    w = W.partitionBy("q_doc", "q_chunk").orderBy(
        F.col("cosine").desc(), "n_doc", "n_chunk"
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOPK)
        .select(
            "q_doc", "q_chunk", "n_doc", "n_chunk", "rk",
            F.round("cosine", 6).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# X9 — HYBRID retrieval with reciprocal-rank fusion (round 7): the modern
# search stack's default — a lexical retriever and a vector retriever,
# fused by RRF(d) = Σ_r 1/(k0 + rank_r(d)). Both component scores are
# chosen to be cross-engine exact: the lexical score is an INTEGER
# distinct-term overlap (BM25's ln() has no cross-engine rounding
# guarantee; rank fusion only consumes ranks, so the integer overlap
# retriever keeps the whole pipeline oracle-exact) and the vector score is
# the same md5-hash cosine as x9_rag_retrieval. RRF then needs just two
# divisions and one add per doc in a fixed order — bit-identical in Spark
# and DuckDB. At 100 TB each retriever swaps to its pruned form (inverted
# candidates / IVF buckets); the fusion contract is unchanged.
# ---------------------------------------------------------------------------

_RRF_K = 60
_HYB_TOPK = 10

_X9_HYBRID_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, text,
         list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS terms,
         list_transform(range(0, {_DIM}),
           i -> ('0x' || substr(md5(text || ':' || i), 1, 8))::BIGINT
                / 4294967296.0 - 0.5) AS v
  FROM documents),
q AS (SELECT doc_id AS q_doc, terms AS q_terms, v AS qv FROM toks WHERE doc_id < {_N_QUERY_DOCS}),
c AS (SELECT doc_id AS n_doc, terms, v FROM toks WHERE doc_id >= {_N_QUERY_DOCS}),
pairs AS (
  SELECT q_doc, n_doc,
         CAST(len(list_intersect(q_terms, terms)) AS BIGINT) AS overlap,
         list_reduce(list_transform(range(1, {_DIM + 1}), i -> qv[i] * v[i]),
                     (acc, x) -> acc + x)
         / (sqrt(list_reduce(list_transform(range(1, {_DIM + 1}), i -> qv[i] * qv[i]),
                             (acc, x) -> acc + x))
            * sqrt(list_reduce(list_transform(range(1, {_DIM + 1}), i -> v[i] * v[i]),
                               (acc, x) -> acc + x))) AS cosine
  FROM q, c),
ranked AS (
  SELECT q_doc, n_doc, overlap, cosine,
         row_number() OVER (PARTITION BY q_doc ORDER BY overlap DESC, n_doc) AS r_lex,
         row_number() OVER (PARTITION BY q_doc ORDER BY cosine DESC, n_doc) AS r_vec
  FROM pairs),
fused AS (
  SELECT q_doc, n_doc, r_lex, r_vec,
         (1.0 / ({_RRF_K} + r_lex)) + (1.0 / ({_RRF_K} + r_vec)) AS rrf
  FROM ranked)
SELECT q_doc, n_doc,
       CAST(r_lex AS BIGINT) AS rank_lex, CAST(r_vec AS BIGINT) AS rank_vec,
       rrf,
       CAST(row_number() OVER (PARTITION BY q_doc ORDER BY rrf DESC, n_doc)
            AS BIGINT) AS rank_fused
FROM fused
QUALIFY rank_fused <= {_HYB_TOPK}
"""


@register("x9_hybrid_retrieval", oracle=_X9_HYBRID_ORACLE, tags=("X9", "retrieval", "hybrid"))
def x9_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical ∪ vector retrieval fused with RRF; integer overlap + hash
    cosine keep every rank — and therefore the fused ordering — hash-exact
    against the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.array_distinct(F.filter(F.split("text", " "), lambda t: t != "")).alias("terms"),
        _hash_embed(F.col("text")).alias("v"),
    )
    q = base.filter(F.col("doc_id") < _N_QUERY_DOCS).select(
        F.col("doc_id").alias("q_doc"), F.col("terms").alias("q_terms"),
        F.col("v").alias("qv"),
    )
    c = base.filter(F.col("doc_id") >= _N_QUERY_DOCS).select(
        F.col("doc_id").alias("n_doc"), "terms", "v"
    )
    norm = lambda col: F.sqrt(_dot(col, col))  # noqa: E731
    pairs = c.crossJoin(F.broadcast(q)).select(
        "q_doc",
        "n_doc",
        F.size(F.array_intersect(F.col("q_terms"), F.col("terms"))).cast("long").alias("overlap"),
        (_dot(F.col("qv"), F.col("v")) / (norm(F.col("qv")) * norm(F.col("v")))).alias("cosine"),
    )
    w_lex = W.partitionBy("q_doc").orderBy(F.col("overlap").desc(), "n_doc")
    w_vec = W.partitionBy("q_doc").orderBy(F.col("cosine").desc(), "n_doc")
    ranked = pairs.select(
        "q_doc", "n_doc",
        F.row_number().over(w_lex).alias("r_lex"),
        F.row_number().over(w_vec).alias("r_vec"),
    )
    rrf = (F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("r_lex"))) + (
        F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("r_vec"))
    )
    fused = ranked.select(
        "q_doc", "n_doc",
        F.col("r_lex").cast("long").alias("rank_lex"),
        F.col("r_vec").cast("long").alias("rank_vec"),
        rrf.alias("rrf"),
    )
    w_f = W.partitionBy("q_doc").orderBy(F.col("rrf").desc(), "n_doc")
    return (
        fused.withColumn("rank_fused", F.row_number().over(w_f).cast("long"))
        .filter(F.col("rank_fused") <= _HYB_TOPK)
    )
