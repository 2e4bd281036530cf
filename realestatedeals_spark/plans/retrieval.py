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
    from realestatedeals_spark.util import spread_by_id

    # spread (round 12): chunking + the 16-md5 hash embedding per chunk +
    # the broadcast-join cosines are all narrow, so they otherwise run on
    # the fixture scan's ONE split (measured 2.05 → 1.37 s best, rowsets
    # identical; the top-k window shuffles by (q_doc, q_chunk) regardless).
    docs = spread_by_id(load_table(spark, sf_dir, "documents"), "doc_id")
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
    from realestatedeals_spark.util import spread_by_id

    # spread (round 12): same single-split rationale as x9_rag_retrieval —
    # the hash embedding and broadcast-join scoring are narrow.
    docs = spread_by_id(load_table(spark, sf_dir, "documents"), "doc_id")
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


# ---------------------------------------------------------------------------
# x9_rerank_mmr — Maximal Marginal Relevance re-ranking, hash-exact. The
# last stage of the retrieval stack after x9_rag/x9_hybrid: from each
# query's top-8 cosine candidates, greedily pick 3 results balancing
# relevance against redundancy, score = 7·rel − 3·max_sim_to_selected
# (λ=0.7 kept as integers by scaling by 10 and flooring every cosine to
# micros first, so the greedy argmax — including tie-breaks — is pure
# BIGINT arithmetic on both engines). The greedy loop has a FIXED depth
# (3 picks), so the oracle states it as three chained argmax CTEs rather
# than recursion, and the Spark side builds the same three steps into one
# lazy plan.
#
# Candidate generation IS the ANN path (round 11 — was an N×Q brute
# broadcast join, 66 engine-seconds at gen sf1.0): per-query candidates
# come from Rademacher sign-LSH buckets (operators/similarity.py
# rp_lsh_query_candidates, 8 planes × 16 tables — ~10% of the corpus per
# query at 0.75 mean top-8 recall on the generated corpus), and the top-8
# is taken WITHIN the candidates. The oracle restates the identical
# banding in SQL (`sgn`/`bits`/`buck` CTEs share the integer-mixer
# constants with rademacher_planes), so the query stays hash-exact with
# recall playing no role in correctness. The rerank itself touches 8 rows
# + a ≤8×8 similarity matrix per query — embarrassingly parallel over
# queries, no shuffle growth with corpus size.
# ---------------------------------------------------------------------------

_COS = """list_reduce(list_transform(range(1, 65),
             i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)),
             (acc, x) -> acc + x)
        / (sqrt(list_reduce(list_transform(range(1, 65),
                  i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)),
                  (acc, x) -> acc + x))
         * sqrt(list_reduce(list_transform(range(1, 65),
                  i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)),
                  (acc, x) -> acc + x)))"""

_X9_MMR_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv
  FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 10000
),
sgn AS (
  -- Rademacher plane tp (1..128 = 16 tables x 8 planes) as a 64-long sign
  -- vector; MUST match operators/similarity.py rademacher_planes (_RMX_*).
  SELECT tp,
    list_transform(
      list_transform(
        list_transform(
          list_transform(range(1, 65), i -> i * 2654435761 + tp * 2246822519 + 3266489917),
          x0 -> xor(x0 % 2147483648, x0 // 2147483648) * 2654435761),
        x2 -> xor(x2 % 2147483648, x2 // 2147483648)),
      x3 -> CAST(1 - 2 * ((x3 // 65536) % 2) AS DOUBLE)) AS sv
  FROM (SELECT unnest(range(1, 129)) AS tp) tt
),
buck AS (
  SELECT vec_id, CAST((s.tp - 1) // 8 AS INTEGER) AS tbl,
         SUM(CASE WHEN list_sum(list_transform(range(1, 65),
                    i -> CAST(e.embedding[i] AS DOUBLE) * s.sv[i])) > 0
                  THEN CAST(1 AS BIGINT) << CAST((s.tp - 1) % 8 AS INTEGER)
                  ELSE 0 END) AS bucket
  FROM embeddings e, sgn s
  GROUP BY 1, 2
),
candidate AS (
  SELECT DISTINCT qb.vec_id AS qid, b.vec_id AS did
  FROM buck b JOIN buck qb ON b.tbl = qb.tbl AND b.bucket = qb.bucket
  JOIN q ON qb.vec_id = q.qid
  WHERE b.vec_id <> qb.vec_id
),
scored AS (
  SELECT c.qid, c.did, e.embedding AS ev,
         CAST(floor(1000000 * ({_COS.format(a="qv", b="e.embedding")})) AS BIGINT) AS rel
  FROM candidate c
  JOIN embeddings e ON e.vec_id = c.did
  JOIN q ON q.qid = c.qid
),
cand AS (
  SELECT qid, did, ev, rel FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, did) AS rk
    FROM scored) WHERE rk <= 8
),
sim AS (
  SELECT a.qid, a.did AS a_id, b.did AS b_id,
         CAST(floor(1000000 * ({_COS.format(a="a.ev", b="b.ev")})) AS BIGINT) AS s
  FROM cand a JOIN cand b ON a.qid = b.qid AND a.did <> b.did
),
p1 AS (
  SELECT qid, did, 7 * rel AS score FROM (
    SELECT qid, did, rel, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, did) AS rk
    FROM cand) WHERE rk = 1
),
c2 AS (
  SELECT c.qid, c.did, 7 * c.rel - 3 * s.s AS score
  FROM cand c
  JOIN p1 ON c.qid = p1.qid AND c.did <> p1.did
  JOIN sim s ON s.qid = c.qid AND s.a_id = c.did AND s.b_id = p1.did
),
p2 AS (
  SELECT qid, did, score FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, did) AS rk
    FROM c2) WHERE rk = 1
),
c3 AS (
  SELECT c.qid, c.did, 7 * any_value(c.rel) - 3 * max(s.s) AS score
  FROM cand c
  JOIN p1 ON c.qid = p1.qid
  JOIN p2 ON c.qid = p2.qid
  JOIN sim s ON s.qid = c.qid AND s.a_id = c.did
            AND (s.b_id = p1.did OR s.b_id = p2.did)
  WHERE c.did <> p1.did AND c.did <> p2.did
  GROUP BY c.qid, c.did
),
p3 AS (
  SELECT qid, did, score FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, did) AS rk
    FROM c3) WHERE rk = 1
)
SELECT qid AS query_id, CAST(1 AS INTEGER) AS pick, did AS doc_id, CAST(score AS BIGINT) AS score FROM p1
UNION ALL
SELECT qid, CAST(2 AS INTEGER), did, CAST(score AS BIGINT) FROM p2
UNION ALL
SELECT qid, CAST(3 AS INTEGER), did, CAST(score AS BIGINT) FROM p3
"""


@register(
    "x9_rerank_mmr",
    oracle=_X9_MMR_ORACLE,
    tags=("X9", "retrieval", "rerank"),
    bench=True,  # round 11: driver-visible so the ANN candidate fix can't silently regress
)
def x9_rerank_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realestatedeals_spark.plans.llm_vectors import dot, l2norm

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 10000)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    from realestatedeals_spark.operators.similarity import rp_lsh_query_candidates

    cands = rp_lsh_query_candidates(
        emb, q.select(F.col("qid").alias("vec_id"), F.col("qv").alias("embedding")),
        n_planes=8, n_tables=16,
    )
    # Vectorized rel scoring (round 11): the interpreted higher-order
    # aggregates (zip_with + aggregate × 3 per row) were the residual cost
    # once candidates were LSH-bounded. One fused numpy sweep per Arrow
    # batch, dimension-by-dimension accumulation — the same left-to-right
    # double-add order as F.aggregate / DuckDB list_reduce, so the floored
    # micros stay bit-identical to the oracle (the gemm_cosine_pairs
    # precedent, pinned bit-identical in tests/test_similarity.py).
    def score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            a = np.stack(pdf["qv"].to_numpy()).astype(np.float64)
            b = np.stack(pdf["ev"].to_numpy()).astype(np.float64)
            acc = np.zeros(len(a))
            na = np.zeros(len(a))
            nb = np.zeros(len(a))
            for d in range(a.shape[1]):
                acc += a[:, d] * b[:, d]
                na += a[:, d] * a[:, d]
                nb += b[:, d] * b[:, d]
            rel = np.floor(1e6 * (acc / (np.sqrt(na) * np.sqrt(nb)))).astype(np.int64)
            yield pd.DataFrame(
                {"qid": pdf["qid"], "did": pdf["did"], "ev": pdf["ev"], "rel": rel}
            )

    scored = (
        cands.join(
            emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"), "neighbor_id"
        )
        .join(F.broadcast(q), F.col("query_id") == F.col("qid"))
        .select(
            "qid", F.col("neighbor_id").alias("did"),
            F.col("embedding").alias("ev"), "qv",
        )
        .mapInPandas(score, schema="qid long, did long, ev array<float>, rel long")
    )
    wq = W.partitionBy("qid").orderBy(F.col("rel").desc(), F.col("did"))
    cand = (
        scored.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= 8)
        .drop("rk")
        .localCheckpoint(eager=True)  # candidates feed three downstream steps
    )
    a = cand.select("qid", F.col("did").alias("a_id"), F.col("ev").alias("av"))
    b = cand.select(F.col("qid").alias("qid_b"), F.col("did").alias("b_id"), F.col("ev").alias("bv"))
    sim = (
        a.join(b, (F.col("qid") == F.col("qid_b")) & (F.col("a_id") != F.col("b_id")))
        .select(
            "qid", "a_id", "b_id",
            F.floor(1000000 * (dot(F.col("av"), F.col("bv")) / (l2norm(F.col("av")) * l2norm(F.col("bv"))))).cast("long").alias("s"),
        )
    )
    sim = sim.select(
        F.col("qid").alias("s_qid"), "a_id", "b_id", "s"
    ).localCheckpoint(eager=True)  # similarity matrix feeds steps 2 and 3
    ws = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("did"))
    p1 = (
        cand.select("qid", "did", (7 * F.col("rel")).alias("score"))
        .withColumn("rk", F.row_number().over(ws))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    c2 = (
        cand.join(
            p1.select(F.col("qid").alias("p_qid"), F.col("did").alias("p1_did")),
            F.col("qid") == F.col("p_qid"),
        )
        .filter(F.col("did") != F.col("p1_did"))
        .join(
            sim,
            (F.col("s_qid") == F.col("qid"))
            & (F.col("a_id") == F.col("did"))
            & (F.col("b_id") == F.col("p1_did")),
        )
        .select("qid", "did", (7 * F.col("rel") - 3 * F.col("s")).alias("score"))
    )
    p2 = c2.withColumn("rk", F.row_number().over(ws)).filter(F.col("rk") == 1).drop("rk")
    picks = p1.select("qid", "did").unionByName(p2.select("qid", "did"))
    sel = picks.groupBy(F.col("qid").alias("g_qid")).agg(
        F.collect_set("did").alias("sel")
    )
    c3 = (
        cand.join(sel, F.col("qid") == F.col("g_qid"))
        .filter(~F.array_contains(F.col("sel"), F.col("did")))
        .join(sim, (F.col("s_qid") == F.col("qid")) & (F.col("a_id") == F.col("did")))
        .filter(F.array_contains(F.col("sel"), F.col("b_id")))
        .groupBy("qid", "did")
        .agg((7 * F.first("rel") - 3 * F.max("s")).alias("score"))
    )
    p3 = c3.withColumn("rk", F.row_number().over(ws)).filter(F.col("rk") == 1).drop("rk")
    out = (
        p1.select("qid", F.lit(1).alias("pick"), "did", "score")
        .unionByName(p2.select("qid", F.lit(2).alias("pick"), "did", "score"))
        .unionByName(p3.select("qid", F.lit(3).alias("pick"), "did", "score"))
    )
    return out.select(
        F.col("qid").alias("query_id"),
        F.col("pick").cast("int").alias("pick"),
        F.col("did").alias("doc_id"),
        F.col("score").cast("long").alias("score"),
    )


# ---------------------------------------------------------------------------
# X9 — inverted text index as a STORED, partition-pruned artifact (round
# 7): every retrieval query above scans the corpus linearly; this one
# builds the posting table (term → doc_id, tf), persists it PARTITIONED BY
# TERM, and answers a conjunctive query by reading only the query terms'
# partitions — the text analogue of the bloom point-lookup: index-sized
# I/O instead of corpus-sized. At 100 TB the partition key becomes a term
# hash-bucket (bounded partition count); the plan — pruned posting read,
# one doc-keyed aggregate with a distinct-term guard — is unchanged. The
# oracle recomputes the same conjunctive match by direct tokenization.
# ---------------------------------------------------------------------------

_X9_INVERTED_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE term <> '' GROUP BY doc_id, term
),
m AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_terms_hit,
         CAST(sum(tf) AS BIGINT) AS tf_sum
  FROM tf WHERE term IN ('spark', 'join', 'scan')
  GROUP BY doc_id
)
SELECT doc_id, tf_sum FROM m WHERE n_terms_hit = 3
"""


@register(
    "x9_inverted_index_search",
    oracle=_X9_INVERTED_ORACLE,
    tags=("X9", "retrieval", "index", "io"),
)
def x9_inverted_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive term search ('spark' AND 'join' AND 'scan') answered
    from a term-partitioned posting store: the scan lists only the three
    query-term partitions (partition pruning on the index layout), then one
    doc-keyed aggregate enforces the conjunction and sums term frequencies."""
    import os
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    postings = (
        docs.select(
            "doc_id",
            F.explode(F.split("text", " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    work = tempfile.mkdtemp(prefix="inverted_idx_")
    try:
        idx_path = os.path.join(work, "postings")
        postings.write.partitionBy("term").parquet(idx_path)
        terms = ["spark", "join", "scan"]
        hits = (
            spark.read.parquet(idx_path)
            .filter(F.col("term").isin(terms))  # prunes to 3 partitions
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_terms_hit"),
                F.sum("tf").alias("tf_sum"),
            )
            .filter(F.col("n_terms_hit") == len(terms))
            .select("doc_id", "tf_sum")
        )
        return hits.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
