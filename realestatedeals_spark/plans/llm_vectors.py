"""Vector similarity queries on ``embeddings`` (SURVEY.md §2b X3).

Brute-force cosine top-k is the exactness baseline (oracle-checked); the
LSH-bucketed approximate variant lives in ``operators.similarity`` with a
rows-only check against this baseline.

Numeric discipline: the dot product is evaluated in index order on both
sides (F.aggregate over zip_with vs DuckDB list_reduce over element products)
so the float arithmetic is identical; scores are additionally rounded to 6
decimals before output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.plans.registry import register


def dot(a: F.Column, b: F.Column) -> F.Column:
    """Index-ordered dot product of two array<float> columns, in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


# Anchor subsample (round 12, verdict task #6): the candidate corpus is the
# deterministic mix31-threshold subset above 2000 vectors (identity at
# driver SFs — fixtures and hashes untouched); the QUERY set stays the full
# every-100th rule, so per-query work is ~sf0.1-sized at any SF while the
# anchor stays hash-exact over the stated subsample.
_X3_BRUTE_CAP = 2000


def _x3_brute_oracle(sub: str = "embeddings") -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM embeddings WHERE vec_id % 100 = 0
),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_reduce(list_transform(range(1, 65),
                     i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                     (acc, x) -> acc + x)
         / (sqrt(list_reduce(list_transform(range(1, 65),
                       i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)),
                       (acc, x) -> acc + x))
            * sqrt(list_reduce(list_transform(range(1, 65),
                       i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                       (acc, x) -> acc + x))) AS cosine
  FROM q, {sub} e
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM pairs
)
SELECT query_id, neighbor_id, CAST(rk AS INTEGER) AS rk, round(cosine, 6) AS cosine
FROM ranked WHERE rk <= 5
"""


# full-corpus form: the oracle of the PRODUCTION exact path (the chunked
# GEMM top-k), which is not an anchor and takes no subsample
_X3_ORACLE = _x3_brute_oracle()


def _x3_brute_sub_oracle() -> str:
    from realestatedeals_spark.operators.subsample import anchor_subsample_sql

    return _x3_brute_oracle(
        anchor_subsample_sql("embeddings", "vec_id", _X3_BRUTE_CAP)
    )


@register(
    "x3_cosine_topk_bruteforce",
    oracle=_x3_brute_sub_oracle(),
    tags=("X3", "vectors"),
    bench=True,
)
def x3_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 (over the anchor-subsampled candidate corpus —
    identity at driver SFs) for every 100th vector.

    Scale shape: queries are broadcast (tiny side), candidates stream —
    a map-side cross product with per-partition top-k via the window; at
    100 TB the LSH variant prunes candidates instead (operators.similarity).
    """
    from realestatedeals_spark.operators.subsample import anchor_subsample
    from realestatedeals_spark.util import spread_by_id

    # spread (round 12): the broadcast-join cosine scan otherwise runs on
    # the fixture scan's one split (measured 0.98 → 0.73 s best at sf0.1)
    emb = spread_by_id(load_table(spark, sf_dir, "embeddings"), "vec_id")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cand = anchor_subsample(emb, "vec_id", _X3_BRUTE_CAP)
    pairs = (
        cand.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                dot(F.col("qv"), F.col("embedding"))
                / (l2norm(F.col("qv")) * l2norm(F.col("embedding")))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "rk", F.round("cosine", 6).alias("cosine"))
    )


def gemm_cosine_topk(
    emb: DataFrame,
    query_pred: F.Column,
    k: int = 5,
    query_batch_rows: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k via the vectorized Pandas-UDF (blocked-GEMM) path.

    Driver memory is O(``query_batch_rows``), never O(corpus): queries are
    hash-split into ⌈|Q| / batch⌉ chunks, each chunk is collected + broadcast
    as a numpy matrix, every corpus partition computes that chunk's scores
    with one fused multiply-add sweep and emits its partial top-k, and the
    partial (partitions × |chunk| × k rows — tiny) is eagerly materialized so
    the chunk broadcast can be destroyed before the next chunk is collected.
    A final window merges partials. Shuffle volume is partials only, never
    the corpus. With multiple chunks the corpus is rescanned per chunk —
    cache/persist ``emb`` upstream when |Q| exceeds one batch.

    Bit-exactness with the SQL oracle: products accumulate dimension-by-
    dimension (vectorized over the pair axis, sequential over dims), the
    same left-to-right double addition as F.aggregate / DuckDB list_reduce.
    """
    import math

    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    q_df = emb.filter(query_pred).select(id_col, vec_col)
    n_q = q_df.count()
    if n_q == 0:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, rk int, cosine double"
        )
    n_chunks = math.ceil(n_q / query_batch_rows)

    partials = []
    for chunk in range(n_chunks):
        chunk_df = q_df if n_chunks == 1 else q_df.filter(
            # pmod, not abs(...)%n: abs(Long.MIN_VALUE) stays negative and
            # would silently drop that query row (cf. operators/skew.py).
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_chunks)) == chunk
        )
        q_rows = chunk_df.collect()
        if not q_rows:
            continue
        qids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
        qm = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
        qn = np.zeros(len(qids))
        for d in range(qm.shape[1]):
            qn += qm[:, d] * qm[:, d]
        qn = np.sqrt(qn)
        bq = spark.sparkContext.broadcast((qids, qm, qn))

        def part(batches, _bq=bq):
            qids, qm, qn = _bq.value
            for pdf in batches:
                if pdf.empty:
                    continue
                nid = pdf[id_col].to_numpy(dtype=np.int64)
                e = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                acc = np.zeros((len(nid), len(qids)))
                en = np.zeros(len(nid))
                for d in range(e.shape[1]):
                    ed = e[:, d]
                    acc += np.outer(ed, qm[:, d])
                    en += ed * ed
                cos = acc / (np.sqrt(en)[:, None] * qn[None, :])
                out_q, out_n, out_c = [], [], []
                for j in range(len(qids)):
                    keep = nid != qids[j]
                    cj, nj = cos[keep, j], nid[keep]
                    top = np.lexsort((nj, -cj))[:k]
                    out_q.extend([qids[j]] * len(top))
                    out_n.extend(nj[top])
                    out_c.extend(cj[top])
                yield pd.DataFrame(
                    {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
                )

        partial = emb.select(id_col, vec_col).mapInPandas(
            part, schema="query_id long, neighbor_id long, cosine double"
        )
        if n_chunks > 1:
            # materialize this chunk's (tiny) partial so the broadcast can be
            # released before the next chunk lands on the driver
            partial = partial.localCheckpoint(eager=True)
            bq.destroy()
        partials.append(partial)

    merged = partials[0]
    for p in partials[1:]:
        merged = merged.unionByName(p)
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        merged.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk", F.round("cosine", 6).alias("cosine"))
    )


@register("x3_cosine_topk_gemm", oracle=_X3_ORACLE, tags=("X3", "vectors", "pandas-udf"), bench=True)
def x3_cosine_topk_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact top-5 as x3_cosine_topk_bruteforce via ``gemm_cosine_topk``
    (blocked queries — driver memory stays O(query_batch_rows) however large
    the corpus-proportional query set grows)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return gemm_cosine_topk(emb, F.col("vec_id") % 100 == 0, k=5)


# ---------------------------------------------------------------------------
# X3 — int8 scalar quantization: the storage form of a 100 TB vector corpus
# (4x smaller than float32, SIMD-friendly dot products downstream). Symmetric
# per-vector scheme: scale = max|x|/127, q_i = round(x_i/scale) ∈ [-127,127].
# Entirely JVM column expressions (transform/aggregate) — no UDF; the oracle
# recomputes the identical double arithmetic in DuckDB, so the hash match
# proves the quantized representation, not a lookalike. round() is
# HALF_UP in Spark SQL and half-away-from-zero in DuckDB — identical on
# the strictly-positive/negative quotients here.
# ---------------------------------------------------------------------------

_X3_QUANT_ORACLE = """
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM base),
q AS (
  SELECT vec_id, scale,
         list_transform(v, x -> CAST(round(x / scale, 0) AS BIGINT)) AS qv
  FROM s)
SELECT vec_id, round(scale, 9) AS scale,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS q_l2sq,
       CAST(list_max(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_max
FROM q
"""


@register("x3_int8_quantize", oracle=_X3_QUANT_ORACLE, tags=("X3", "vectors", "quantize"))
def x3_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantize every embedding to symmetric per-vector int8 and emit the
    summary the oracle can recompute (component sum, squared L2, max |q| —
    which must be exactly 127 for every non-zero vector). The quantized
    array itself is what a production table stores (array<tinyint> + one
    float scale per vector = 68 bytes/vec at dim 64 vs 256); the cosine
    error this buys is pinned by tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("v"))
    s = base.withColumn(
        "scale",
        F.array_max(F.transform("v", lambda x: F.abs(x))) / F.lit(127.0),
    )
    q = s.withColumn(
        "qv",
        F.transform("v", lambda x: F.round(x / F.col("scale"), 0).cast("bigint")),
    )
    zero = F.lit(0).cast("bigint")
    return q.select(
        "vec_id",
        F.round("scale", 9).alias("scale"),
        F.aggregate("qv", zero, lambda acc, x: acc + x).alias("q_sum"),
        F.aggregate("qv", zero, lambda acc, x: acc + x * x).alias("q_l2sq"),
        F.array_max(F.transform("qv", lambda x: F.abs(x))).alias("q_max"),
    )


def quantize_embeddings(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Reusable quantizer: adds ``scale`` (double) and ``qv``
    (array<int> in [-127,127]) columns; downstream dot products run on
    integers and rescale by scale_a*scale_b."""
    v = F.transform(vec_col, lambda x: x.cast("double"))
    out = emb.withColumn(
        "scale", F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    )
    return out.withColumn(
        "qv",
        F.transform(v, lambda x: F.round(x / F.col("scale"), 0).cast("int")),
    )


# ---------------------------------------------------------------------------
# X3 — filtered vector search: top-k cosine restricted by a metadata
# predicate (label parity here; in production, tenant/language/date). In a
# DataFrame engine the filter composes INTO the scoring plan — Catalyst
# pushes it to the scan, so the linear pass only reads qualifying vectors.
# Specialized vector DBs treat this as a hard feature ("filtered ANN");
# here it is one .filter() — the compositionality IS the point. Same
# deterministic fold arithmetic as the unfiltered brute-force baseline.
# ---------------------------------------------------------------------------

_X3_FILTERED_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 10000
),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
         list_reduce(list_transform(range(1, 65),
                     i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                     (acc, x) -> acc + x)
         / (sqrt(list_reduce(list_transform(range(1, 65),
                       i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)),
                       (acc, x) -> acc + x))
            * sqrt(list_reduce(list_transform(range(1, 65),
                       i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                       (acc, x) -> acc + x))) AS cosine
  FROM q, embeddings e
  WHERE e.vec_id <> q.query_id AND e.label % 2 = 0
),
ranked AS (
  SELECT query_id, neighbor_id, label, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM pairs
)
SELECT query_id, neighbor_id, CAST(label AS INTEGER) AS label,
       CAST(rk AS INTEGER) AS rk, round(cosine, 6) AS cosine
FROM ranked WHERE rk <= 5
"""


@register("x3_filtered_topk", oracle=_X3_FILTERED_ORACLE, tags=("X3", "vectors", "filtered"))
def x3_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # bounded query set (<=100 at any SF): without the cap the fixture's
    # query count grows with the corpus and the scan cost conflates corpus
    # scaling with query load (measured 44x at 10x data; ~4x after the cap)
    q = emb.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 10000)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cand = emb.filter(F.col("label") % 2 == 0)  # the metadata predicate
    scored = cand.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").cast("int").alias("label"),
        (
            dot(F.col("qv"), F.col("embedding"))
            / (l2norm(F.col("qv")) * l2norm(F.col("embedding")))
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "label", "rk", F.round("cosine", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# X3 — maximum inner product search (MIPS): top-k by RAW dot product, no
# normalization — the recommendation-scoring objective (user·item where
# item magnitude IS signal), distinct from cosine's direction-only match.
# Same deterministic fold arithmetic and bounded broadcast query side as
# the cosine baseline; the ANN scale paths apply after the standard
# MIPS→cosine reduction (append an augmentation dimension), noted here
# rather than duplicated.
# ---------------------------------------------------------------------------

_X3_MIPS_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 10000
),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_reduce(list_transform(range(1, 65),
                     i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                     (acc, x) -> acc + x) AS dot
  FROM q, embeddings e
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, dot,
         row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rk
  FROM pairs
)
SELECT query_id, neighbor_id, CAST(rk AS INTEGER) AS rk, round(dot, 6) AS dot
FROM ranked WHERE rk <= 5
"""


@register("x3_mips_topk", oracle=_X3_MIPS_ORACLE, tags=("X3", "vectors", "mips"))
def x3_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 10000)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        dot(F.col("qv"), F.col("embedding")).alias("dot"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "rk", F.round("dot", 6).alias("dot"))
    )


# ---------------------------------------------------------------------------
# X3 — deterministic PCA projection (round 7): dimensionality reduction /
# whitening trained in-engine (operators/pca.py) — integer-micros Gram in
# one Arrow pass, driver-side power iteration with a BLAS-free fixed-order
# matvec, per-row projection folds. Iterative eigen-solving has no SQL
# form, so rows-only; tests/test_pca.py pins exact == parity against an
# independent pandas implementation plus partition invariance.
# ---------------------------------------------------------------------------


# The Gram accumulation — the ONLY distributed stage of PCA training — is
# exact integer micros (floor(e_i*e_j*1e6) summed as int64, order-
# independent), so it IS SQL-expressible even though the eigen-solve isn't:
# this companion query pins the whole data-touching half of x3_pca_project
# hash-exact against DuckDB, leaving only the O(d^2) driver-side power
# iteration to the parity pytest (tests/test_pca.py).
_X3_PCA_GRAM_ORACLE = """
SELECT i, j,
       CAST(SUM(CAST(floor(CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE)
                         * CAST(embedding[CAST(j + 1 AS INT)] AS DOUBLE)
                         * 1000000) AS BIGINT)) AS BIGINT) AS g
FROM embeddings, range(0, 64) t(i), range(0, 64) u(j)
GROUP BY i, j
"""


@register(
    "x3_pca_gram",
    oracle=_X3_PCA_GRAM_ORACLE,
    tags=("X3", "vectors", "ml"),
    bench=True,
)
def x3_pca_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact integer-micros Gram matrix PCA trains on (one Arrow pass,
    int64 d*d partials per batch, order-independent addition) surfaced as
    (i, j, g) rows — the hash-exact oracle anchor for x3_pca_project's
    distributed stage."""
    from realestatedeals_spark.operators.pca import exact_gram

    emb = load_table(spark, sf_dir, "embeddings")
    G, _n = exact_gram(emb, dim=64)
    rows = [(i, j, int(G[i, j])) for i in range(64) for j in range(64)]
    return spark.createDataFrame(rows, "i long, j long, g long")


@register("x3_pca_project", tags=("X3", "vectors", "ml", "iterative"))
def x3_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-4 principal directions of the embedding corpus + micros-floored
    per-vector projections — the decorrelation step before PQ/IVF."""
    from realestatedeals_spark.operators.pca import (
        exact_gram,
        power_components,
        project,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    G, n = exact_gram(emb, dim=64)
    comps, _eig = power_components(G, n, k=4, iters=60)
    return project(emb, comps)


# ---------------------------------------------------------------------------
# X3 — deterministic in-engine k-means (third trained-op example after the
# LR classifier and PCA). All arithmetic is integer: vectors are floored to
# micros, distances are exact BIGINT sums of squares, and the centroid
# update is floor-division — so Lloyd's algorithm itself becomes
# hash-exactly oracle-able as a chain of plain SQL CTEs (assign -> update
# -> assign ...), no tolerance anywhere. Ties break toward the lower
# cluster id on both engines; an empty cluster keeps its previous centroid.
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_ITERS = 3  # total assignment passes; _KM_ITERS - 1 centroid updates
_KM_DIM = 64


def _km_dist(v: str, c: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, {_KM_DIM + 1}), i -> "
        f"({v}[i] - {c}[i]) * ({v}[i] - {c}[i])), (a, x) -> a + x)"
    )


def _km_oracle(
    final: str | None = None,
    extra: list[str] | None = None,
    train_where: str | None = None,
) -> str:
    """The shared integer-k-means CTE chain. ``train_where`` restricts the
    TRAINING corpus (init seeds + the centroid-update assignment passes) to
    a subset of ``v`` while the FINAL assignment still covers all of ``v``
    — the frozen-centroid semantics of incremental index maintenance
    (x3_ivf_incremental): vectors arriving after the build are assigned to
    the cells the BASE corpus trained."""
    src = "vb" if train_where else "v"
    parts = [
        f"""v AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM embeddings)"""
    ]
    if train_where:
        parts.append(f"vb AS (SELECT * FROM v WHERE {train_where})")
    parts.append(
        f"c0 AS (SELECT vec_id AS cid, v AS cv FROM {src} WHERE vec_id < {_KM_K})"
    )
    for t in range(1, _KM_ITERS + 1):
        a_src = src if t < _KM_ITERS else "v"
        parts.append(
            f"""a{t} AS (
  SELECT vec_id, v, cluster, dist_sq FROM (
    SELECT vec_id, v, cluster, dist_sq,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist_sq, cluster) AS rk
    FROM (SELECT x.vec_id, x.v, c.cid AS cluster,
                 {_km_dist('x.v', 'c.cv')} AS dist_sq
          FROM {a_src} x, c{t - 1} c))
  WHERE rk = 1)"""
        )
        if t < _KM_ITERS:
            parts.append(
                f"""s{t} AS (
  SELECT cluster AS cid, i, sum(v[i]) AS s, count(*) AS n
  FROM a{t}, range(1, {_KM_DIM + 1}) t(i)
  GROUP BY cluster, i),
c{t} AS (
  SELECT p.cid, COALESCE(u.cv, p.cv) AS cv
  FROM c{t - 1} p LEFT JOIN (
    SELECT cid,
           list(CAST((s - ((s % n + n) % n)) // n AS BIGINT) ORDER BY i) AS cv
    FROM s{t} GROUP BY cid) u ON p.cid = u.cid)"""
            )
    if extra:
        parts.extend(extra)
    if final is None:
        final = (
            f"SELECT vec_id, CAST(cluster AS INTEGER) AS cluster, dist_sq"
            f" FROM a{_KM_ITERS}"
        )
    return "WITH " + ",\n".join(parts) + "\n" + final


_KM_ORACLE = _km_oracle()


def _micros_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v: array<long>) — embeddings floored to integer micros, the
    exact representation every deterministic-trainer query shares."""
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * F.lit(1000000.0)).cast("long")
        ).alias("v"),
    )


def _int_dist_sq_sql(vexpr: str, cv: list[int]) -> str:
    """SQL fragment: exact BIGINT squared distance of int64 vector
    expression ``vexpr`` to a literal centroid. Generated as ONE string
    (round 12): the Column-builder form issued a py4j round-trip per
    literal — k·dim ≈ 500+ driver RPCs ≈ 1.5 s of pure plan CONSTRUCTION
    per assignment frame (guide §7.3's "driver is doing something
    single-threaded", before any job ran). The parsed expression tree is
    identical, so plans and results are unchanged."""
    lits = ", ".join(f"{int(c)}L" for c in cv)
    return (
        f"aggregate(zip_with({vexpr}, array({lits}), (x, y) -> (x - y) * (x - y)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def _int_dist_sq(vexpr: str, cv: list[int]) -> F.Column:
    """Exact BIGINT squared distance of an int64 vector SQL expression to a
    literal centroid (k·dim literals ride in the plan — broadcast-sized)."""
    return F.expr(_int_dist_sq_sql(vexpr, cv))


def _argmin_cell_sql(vexpr: str, cents: list[list[int]]) -> str:
    """SQL fragment: struct(d, c) of the nearest literal centroid under
    exact BIGINT distance with (d, c) ties — the shared assignment shape of
    the coarse quantizer, the PQ trainer, and the PQ encoder."""
    structs = ", ".join(
        f"struct({_int_dist_sq_sql(vexpr, cv)} AS d, CAST({cid} AS INT) AS c)"
        for cid, cv in enumerate(cents)
    )
    return f"array_min(array({structs}))"


def _km_assign(df: DataFrame, cents: list[list[int]]) -> DataFrame:
    return (
        df.withColumn("best", F.expr(_argmin_cell_sql("v", cents)))
        .withColumn("dist_sq", F.col("best.d"))
        .withColumn("cluster", F.col("best.c"))
        .drop("best")
    )


# Deterministic-trainer memo: three registry queries (x3_kmeans_assign,
# x3_ivf_stored_topk, x3_ivfpq_stored_topk) train the SAME integer k-means
# over the same corpus — the collects are the dominant fixed cost of each.
# Training is a pure function of the input frame, so cache the resulting
# centroids/codebooks (plain Python ints, session-scoped). Keying —
# session id + analyzed-plan semantic hash + input-file stat fingerprint
# (guards same-path data regeneration) — is shared with the float
# trainers via util.trainer_cache_key. A cache hit replays the final
# literal-centroid assign pass, which is bit-equal to retraining.
from realestatedeals_spark.util import TRAINER_CACHE as _TRAIN_CACHE
from realestatedeals_spark.util import trainer_cache_key as _cache_key


def _seed_vectors(emb: DataFrame) -> list[list[int]]:
    """The first ``max(_KM_K, _PQ_KS)`` full vectors by vec_id — the ONE
    seed collect both deterministic trainers draw their init from (round
    12): the coarse k-means seeds with the first _KM_K vectors, PQ seeds
    each subspace with slices of the first _PQ_KS — the same rows, so one
    job replaces the 1 + _PQ_M per-trainer seed collects. Memoized like
    the trainers themselves (the bench clears the cache between timed
    runs, so each run still pays exactly one seed job)."""
    key = ("seeds", _cache_key(emb))
    hit = _TRAIN_CACHE.get(key)
    if hit is None:
        hit = [
            list(r["v"])
            for r in emb.filter(F.col("vec_id") < max(_KM_K, _PQ_KS))
            .orderBy("vec_id")
            .collect()
        ]
        _TRAIN_CACHE[key] = hit
    return [list(v) for v in hit]


def _kmeans_micros(emb: DataFrame) -> tuple[DataFrame, list[list[int]]]:
    """Deterministic integer Lloyd's (k=_KM_K, _KM_ITERS assignment passes)
    over a (vec_id, v) micros frame. Returns (final assignment frame with
    cluster/dist_sq, final centroids) — shared by x3_kmeans_assign and the
    stored-IVF index build so both stay bit-equal to the SQL replay."""
    hit = _TRAIN_CACHE.get(("km", _cache_key(emb)))
    if hit is not None:
        # deterministic trainer: the final assignment IS one literal-centroid
        # assign pass against the cached centroids — bit-equal to retraining
        # (checked BEFORE the seed collect, which a hit makes redundant)
        cents = [list(c) for c in hit]
        return _km_assign(emb, cents), cents
    cents = [v for v in _seed_vectors(emb)[:_KM_K]]
    assigned = _km_assign(emb, cents)
    for _ in range(_KM_ITERS - 1):
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("i", "val"))
            .groupBy("cluster", "i")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        acc = {(r["cluster"], r["i"]): (r["s"], r["n"]) for r in sums}
        cents = [
            [acc[(cid, i)][0] // acc[(cid, i)][1] for i in range(_KM_DIM)]
            if (cid, 0) in acc
            else list(cents[cid])
            for cid in range(_KM_K)
        ]
        assigned = _km_assign(emb, cents)
    _TRAIN_CACHE[("km", _cache_key(emb))] = [list(c) for c in cents]
    return assigned, cents


@register("x3_kmeans_assign", oracle=_KM_ORACLE, tags=("X3", "vectors", "ml", "clustering"))
def x3_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd's k-means (k=8, 3 assignment passes) over the
    embedding corpus, hash-exact against a pure-SQL replay of the same
    iterations.

    Integer discipline makes an iterative ML trainer exactly oracle-able:
    micros-floored vectors, BIGINT squared distances, floor-div centroid
    means (pmod formula in SQL == Python ``//``), lower-cluster-id ties.
    Init = the first k vectors by vec_id.

    Scale shape: each assignment is a narrow map over the corpus — the
    k*dim centroid table rides along as plan literals (broadcast-sized by
    construction), so there is NO join and NO shuffle in the assign step;
    the update is one groupBy((cluster, dim)) with map-side partial
    aggregation producing exactly k*dim rows to the driver (bounded state,
    like the PCA power iteration). Iterations are fixed, so the whole
    query is a constant number of passes over the data at any corpus size;
    for large k the literal centroids would become a broadcast-joined
    frame at the same seam.
    """
    emb = _micros_vectors(spark, sf_dir)
    assigned, _cents = _kmeans_micros(emb)
    return assigned.select("vec_id", "cluster", "dist_sq")


# ---------------------------------------------------------------------------
# X3 — STORED IVF index with partition-pruned probes (round 11): the vector
# analogue of the stored inverted text index (x9_inverted_index_search) and
# the bloom point-lookup. Every other ANN query recomputes its structure
# in-flight; a production corpus builds the index ONCE and answers queries
# with index-sized I/O. Here: the deterministic integer k-means above
# (k=8, 3 passes — bit-equal on both engines) assigns every vector to a
# cell, the corpus is PERSISTED partitioned by cell id, and each query
# reads only its nprobe=2 nearest cells — the parquet scan shows
# PartitionFilters on `cluster` (pinned in tests/test_plan_quality-style
# assertion inside tests/test_similarity.py), so probe I/O is
# cells-touched-sized, not corpus-sized. Ranking inside the probed cells
# is the exact BIGINT squared distance with (dist, id) ties — the whole
# pipeline (train → store → probe → rank) is restated in SQL, so the
# query is HASH-EXACT even though it is "approximate" retrieval: the
# probe-set semantics are part of the statement on both engines.
# At 100 TB: nlist grows ∝ √N (adaptive_ivf_params), the partition key
# becomes a bounded cell-bucket, and the same pruned-read plan holds.
# ---------------------------------------------------------------------------

_IVF_NPROBE = 2
_IVF_TOPK = 5

_IVF_STORED_ORACLE = _km_oracle(
    extra=[
        f"""qs AS (
  SELECT vec_id AS qid, v AS qv FROM v
  WHERE vec_id % 100 = 0 AND vec_id < 10000)""",
        f"""crk AS (
  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY d, cid) AS rk
  FROM (SELECT q.qid, c.cid, {_km_dist('q.qv', 'c.cv')} AS d
        FROM qs q, c{_KM_ITERS - 1} c))""",
        f"""probe AS (SELECT qid, cid FROM crk WHERE rk <= {_IVF_NPROBE})""",
        f"""cand AS (
  SELECT p.qid, a.vec_id AS neighbor_id, a.v
  FROM probe p JOIN a{_KM_ITERS} a ON a.cluster = p.cid
  WHERE a.vec_id <> p.qid)""",
        f"""scored AS (
  SELECT c.qid, c.neighbor_id, {_km_dist('q.qv', 'c.v')} AS dist_sq
  FROM cand c JOIN qs q ON q.qid = c.qid)""",
    ],
    final=f"""SELECT qid AS query_id, neighbor_id, CAST(rk AS INTEGER) AS rk, dist_sq
FROM (SELECT qid, neighbor_id, dist_sq,
             row_number() OVER (PARTITION BY qid ORDER BY dist_sq, neighbor_id) AS rk
      FROM scored)
WHERE rk <= {_IVF_TOPK}""",
)


def _ivf_queries(emb: DataFrame) -> DataFrame:
    """The bounded benchmark query set (≤100 at any SF), as (qid, qv)."""
    return emb.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 10000)
    ).select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))


def _ivf_probe_pairs(
    queries: DataFrame, cents: list[list[int]]
) -> tuple[DataFrame, list[int]]:
    """Per-query nprobe nearest cells under the frozen centroids: k×dim
    centroid literals ranked by exact integer distance with (d, cid) ties
    — probe PAIRS are metadata (≤ Q·nprobe rows), collected like the
    centroids themselves. Returns (literal probe-pair frame, sorted probed
    cell ids); the cell-id list is the literal IN-filter that becomes
    PartitionFilters on the cell-partitioned index scan."""
    from realestatedeals_spark.util import inline_frame

    spark = queries.sparkSession
    structs = ", ".join(
        f"struct({_int_dist_sq_sql('qv', cv)} AS d, CAST({cid} AS INT) AS c)"
        for cid, cv in enumerate(cents)
    )
    dists = queries.select(
        "qid", F.expr(f"array({structs})").alias("ds")
    ).select("qid", F.slice(F.array_sort("ds"), 1, _IVF_NPROBE).alias("near"))
    probe_rows = dists.select(
        "qid", F.transform("near", lambda s: s["c"]).alias("cids")
    ).collect()
    probed_cells = sorted({int(c) for r in probe_rows for c in r["cids"]})
    # inline_frame constant-folds the pair table in the SQL layer — no
    # Python-RDD job like createDataFrame
    probe_pairs = inline_frame(
        spark,
        ["qid", "cluster"],
        [(r["qid"], int(c)) for r in probe_rows for c in r["cids"]],
    ).select(F.col("qid").cast("long"), F.col("cluster").cast("int"))
    return probe_pairs, probed_cells


def _int_pair_dist() -> F.Column:
    """Exact BIGINT squared distance of the (qv, v) column pair."""
    return F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _ivf_rank_topk(cand: DataFrame, extra_cols: list[str] | None = None) -> DataFrame:
    """Exact BIGINT distance + (dist, id)-tie top-k over a probed candidate
    frame carrying (qid, vec_id, v, qv); ``extra_cols`` ride through."""
    scored = cand.select(
        "qid",
        F.col("vec_id").alias("neighbor_id"),
        *(extra_cols or []),
        _int_pair_dist().alias("dist_sq"),
    )
    w = W.partitionBy("qid").orderBy("dist_sq", "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _IVF_TOPK)
        .select(
            F.col("qid").alias("query_id"),
            "neighbor_id",
            *(extra_cols or []),
            F.col("rk").cast("int").alias("rk"),
            "dist_sq",
        )
    )


@register(
    "x3_ivf_stored_topk",
    oracle=_IVF_STORED_ORACLE,
    tags=("X3", "vectors", "ann", "index", "storage"),
)
def x3_ivf_stored_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 neighbors per query answered from a STORED, cell-partitioned
    IVF index with nprobe=2 partition-pruned reads. See the block comment
    above; hash-exact — the probe semantics are stated in the oracle."""
    import os
    import shutil
    import tempfile

    emb = _micros_vectors(spark, sf_dir)
    assigned, cents = _kmeans_micros(emb)

    work = tempfile.mkdtemp(prefix="ivf_idx_")
    try:
        idx_path = os.path.join(work, "cells")
        assigned.select("vec_id", "v", "cluster").write.partitionBy("cluster").parquet(
            idx_path
        )

        queries = _ivf_queries(emb)
        probe_pairs, probed_cells = _ivf_probe_pairs(queries, cents)

        # the literal IN-filter is what turns into PartitionFilters on the
        # cell-partitioned scan: only probed cell directories are listed/read
        idx = spark.read.parquet(idx_path).filter(F.col("cluster").isin(probed_cells))
        cand = (
            idx.join(F.broadcast(probe_pairs), "cluster")
            .filter(F.col("vec_id") != F.col("qid"))
            .join(F.broadcast(queries), "qid")
        )
        return _ivf_rank_topk(cand).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# X3 — FILTERED ANN on the stored-index path (round 12, verdict task #5):
# the production "filtered vector search" feature — a metadata predicate
# composed with the ANN probe so the filter applies DURING the index scan,
# not as a post-rank re-query. The index rows carry the filter column
# (label), so the probed-cell scan gets BOTH PartitionFilters (cluster ∈
# probed cells — directory pruning) and PushedFilters (label ∈ evens —
# row-group pruning inside the probed cells) on ONE scan; candidates are
# filter-qualified before any distance is computed. Both engines state the
# same literal IN-predicate, so the query stays hash-exact.
# At 100 TB the composition is what matters: predicate selectivity
# multiplies with nprobe/nlist, so a 10%-selective filter over a 2/8-cell
# probe touches ~2.5% of index bytes — neither a full-corpus metadata scan
# nor a rank-then-filter pass that starves top-k below k.
# ---------------------------------------------------------------------------

_IVF_EVEN_LABELS = (0, 2, 4, 6, 8)  # labels are 0..9: IN-evens == label % 2 = 0,
#                                     stated as IN on both engines (pushable)

_IVF_FILTERED_STORED_ORACLE = _km_oracle(
    extra=[
        """qs AS (
  SELECT vec_id AS qid, v AS qv FROM v
  WHERE vec_id % 100 = 0 AND vec_id < 10000)""",
        f"""crk AS (
  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY d, cid) AS rk
  FROM (SELECT q.qid, c.cid, {_km_dist('q.qv', 'c.cv')} AS d
        FROM qs q, c{_KM_ITERS - 1} c))""",
        f"""probe AS (SELECT qid, cid FROM crk WHERE rk <= {_IVF_NPROBE})""",
        f"""cand AS (
  SELECT p.qid, a.vec_id AS neighbor_id, a.v, l.label
  FROM probe p
  JOIN a{_KM_ITERS} a ON a.cluster = p.cid
  JOIN embeddings l ON l.vec_id = a.vec_id
  WHERE a.vec_id <> p.qid AND l.label IN {_IVF_EVEN_LABELS})""",
        f"""scored AS (
  SELECT c.qid, c.neighbor_id, c.label, {_km_dist('q.qv', 'c.v')} AS dist_sq
  FROM cand c JOIN qs q ON q.qid = c.qid)""",
    ],
    final=f"""SELECT qid AS query_id, neighbor_id, CAST(label AS INTEGER) AS label,
       CAST(rk AS INTEGER) AS rk, dist_sq
FROM (SELECT qid, neighbor_id, label, dist_sq,
             row_number() OVER (PARTITION BY qid ORDER BY dist_sq, neighbor_id) AS rk
      FROM scored)
WHERE rk <= {_IVF_TOPK}""",
)


@register(
    "x3_ivf_filtered_topk",
    oracle=_IVF_FILTERED_STORED_ORACLE,
    tags=("X3", "vectors", "ann", "index", "storage", "filtered"),
)
def x3_ivf_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-qualified top-5 per query from the stored IVF index: the
    label predicate rides the SAME probed-cell scan as the partition
    pruning (PartitionFilters + PushedFilters together — pinned in
    tests/test_similarity.py). See the block comment above; hash-exact."""
    import os
    import shutil
    import tempfile

    emb = _micros_vectors(spark, sf_dir)
    assigned, cents = _kmeans_micros(emb)
    labels = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")

    work = tempfile.mkdtemp(prefix="ivf_fidx_")
    try:
        idx_path = os.path.join(work, "cells")
        # index rows carry the filterable metadata column
        assigned.select("vec_id", "v", "cluster").join(labels, "vec_id").write.partitionBy(
            "cluster"
        ).parquet(idx_path)

        queries = _ivf_queries(emb)
        probe_pairs, probed_cells = _ivf_probe_pairs(queries, cents)

        # ONE scan, two prunings: cluster IN probed → PartitionFilters
        # (directory listing), label IN evens → PushedFilters (row groups)
        idx = (
            spark.read.parquet(idx_path)
            .filter(F.col("cluster").isin(probed_cells))
            .filter(F.col("label").isin(list(_IVF_EVEN_LABELS)))
        )
        cand = (
            idx.join(F.broadcast(probe_pairs), "cluster")
            .filter(F.col("vec_id") != F.col("qid"))
            .join(F.broadcast(queries), "qid")
            .withColumn("label", F.col("label").cast("int"))
        )
        return _ivf_rank_topk(cand, extra_cols=["label"]).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# X3 — INCREMENTAL maintenance of the stored IVF index (round 12, verdict
# task #3): a 100 TB corpus cannot retrain + rewrite its index per ingest
# batch. The x2_minhash_incremental pattern applied to ANN: the index is
# built ONCE from the base corpus (centroids trained on base, cells
# partition-stored); a later ingest batch is assigned under the FROZEN
# centroids and appended to its cell directories — no retraining, no
# rewrite of existing files (append-only, pinned by an mtime/file-set
# assertion in tests/test_similarity.py); deletes become a DELETION-VECTOR
# sidecar (id list) that probes anti-join, the same merge-on-read shape as
# io/maintenance.delete_where's DV path. Frozen cells ⇒ the final state is
# a pure function of (base, batch, deletes), so the whole lifecycle —
# base-only training, frozen-centroid assignment of late arrivals, DV
# masking, pruned probes, exact rerank — is restated in SQL and the query
# is HASH-EXACT. A production deployment wraps the append + DV writes in
# the catalog's conflict-checked multi-table commit (io/catalog.py, the
# c14 transaction) and re-trains on drift as a background OPTIMIZE;
# centroid staleness is a recall knob, never a correctness one here
# because probe semantics are part of the statement.
# ---------------------------------------------------------------------------

_IVF_INCR_BASE = "vec_id % 10 <> 9"      # 90% of the corpus builds the index
_IVF_INCR_DELETE_MOD = 25                # vec_id % 25 == 9 → deleted (hits both
#                                          base and appended rows: 9→batch, 34→base)

_IVF_INCR_ORACLE = _km_oracle(
    train_where=_IVF_INCR_BASE,
    extra=[
        f"""live AS (
  SELECT vec_id, v, cluster FROM a{_KM_ITERS}
  WHERE vec_id % {_IVF_INCR_DELETE_MOD} <> 9)""",
        """qs AS (
  SELECT vec_id AS qid, v AS qv FROM v
  WHERE vec_id % 100 = 0 AND vec_id < 10000)""",
        f"""crk AS (
  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY d, cid) AS rk
  FROM (SELECT q.qid, c.cid, {_km_dist('q.qv', 'c.cv')} AS d
        FROM qs q, c{_KM_ITERS - 1} c))""",
        f"""probe AS (SELECT qid, cid FROM crk WHERE rk <= {_IVF_NPROBE})""",
        """cand AS (
  SELECT p.qid, a.vec_id AS neighbor_id, a.v
  FROM probe p JOIN live a ON a.cluster = p.cid
  WHERE a.vec_id <> p.qid)""",
        f"""scored AS (
  SELECT c.qid, c.neighbor_id, {_km_dist('q.qv', 'c.v')} AS dist_sq
  FROM cand c JOIN qs q ON q.qid = c.qid)""",
    ],
    final=f"""SELECT qid AS query_id, neighbor_id, CAST(rk AS INTEGER) AS rk, dist_sq
FROM (SELECT qid, neighbor_id, dist_sq,
             row_number() OVER (PARTITION BY qid ORDER BY dist_sq, neighbor_id) AS rk
      FROM scored)
WHERE rk <= {_IVF_TOPK}""",
)


def _ivf_incremental_index(
    spark: SparkSession, sf_dir: str, work: str, on_base_built=None
) -> tuple[str, str, DataFrame, list[list[int]]]:
    """Build the base index, append the late batch under frozen centroids,
    and write the deletion-vector sidecar. Returns (index path, DV path,
    micros corpus, centroids) — shared by the registry query and the
    append-only pytest, which snapshots the base files via
    ``on_base_built(idx_path)`` and asserts the append touched none of
    them."""
    import os

    emb = _micros_vectors(spark, sf_dir)
    base = emb.filter(F.col("vec_id") % 10 != 9)
    late = emb.filter(F.col("vec_id") % 10 == 9)
    assigned_base, cents = _kmeans_micros(base)  # trained on the BASE corpus

    idx_path = os.path.join(work, "cells")
    assigned_base.select("vec_id", "v", "cluster").write.partitionBy(
        "cluster"
    ).parquet(idx_path)
    if on_base_built is not None:
        on_base_built(idx_path)

    # ingest batch: frozen-centroid assignment, append-only into cell dirs
    _km_assign(late, cents).select("vec_id", "v", "cluster").write.mode(
        "append"
    ).partitionBy("cluster").parquet(idx_path)

    # deletes: a deletion-vector sidecar, never a rewrite of index files
    dv_path = os.path.join(work, "dv")
    emb.filter(F.col("vec_id") % _IVF_INCR_DELETE_MOD == 9).select(
        "vec_id"
    ).write.parquet(dv_path)
    return idx_path, dv_path, emb, cents


@register(
    "x3_ivf_incremental",
    oracle=_IVF_INCR_ORACLE,
    tags=("X3", "vectors", "ann", "index", "storage", "incremental"),
)
def x3_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 per query from an INCREMENTALLY-maintained stored IVF index:
    base build → frozen-centroid append of a late ingest batch → DV-masked
    pruned probes. See the block comment above; hash-exact — the batch-
    built frozen-cell index is the oracle (same cells ⇒ same answer)."""
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="ivf_incr_")
    try:
        idx_path, dv_path, emb, cents = _ivf_incremental_index(spark, sf_dir, work)
        queries = _ivf_queries(emb)
        probe_pairs, probed_cells = _ivf_probe_pairs(queries, cents)

        dv = spark.read.parquet(dv_path)
        idx = (
            spark.read.parquet(idx_path)
            .filter(F.col("cluster").isin(probed_cells))
            .join(F.broadcast(dv), "vec_id", "left_anti")  # DV mask on the probe
        )
        cand = (
            idx.join(F.broadcast(probe_pairs), "cluster")
            .filter(F.col("vec_id") != F.col("qid"))
            .join(F.broadcast(queries), "qid")
        )
        return _ivf_rank_topk(cand).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# X3 — STORED IVF-PQ index (round 11): the composed production ANN shape
# (FAISS IVFPQ). The stored-IVF query above prunes WHICH cells are read but
# still stores raw vectors; real 100 TB corpora also compress WHAT is
# stored — product-quantization codes (here M=4 subspaces × 16 dims,
# ksub=8 ⇒ 4 small ints per vector instead of 64 longs, a 128× row-payload
# reduction) scored by asymmetric distance computation: per query a LUT of
# M·ksub exact subspace distances, approx distance = Σ of M lookups over
# the code column only. Everything stays in the integer-micros discipline —
# per-subspace Lloyd's with floor-div means, BIGINT subspace distances,
# (dist, id) ties — so training, encoding, cell probing, and ADC ranking
# are ALL restated in the SQL oracle and the query is HASH-EXACT: the
# approximation is part of the statement, not a tolerance.
# At 100 TB: the probe scan reads nprobe cell partitions of code rows
# (PartitionFilters pinned in tests/test_similarity.py), the LUT frame is
# O(Q·M·ksub) and broadcast, and no raw vector is ever shuffled — the
# rerank seam (fetch raw vectors for the top candidates only, as pq_topk
# does) composes on top unchanged.
# ---------------------------------------------------------------------------

_PQ_M = 4          # subspaces
_PQ_SUBDIM = _KM_DIM // _PQ_M
_PQ_KS = 8         # codebook entries per subspace
_PQ_ITERS = 2      # assignment passes; _PQ_ITERS - 1 centroid updates


def _pq_sql_dist(u: str, c: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, {_PQ_SUBDIM + 1}), i -> "
        f"({u}[i] - {c}[i]) * ({u}[i] - {c}[i])), (a, x) -> a + x)"
    )


def _ivfpq_extra() -> list[str]:
    """PQ training + ADC parts appended to the coarse k-means replay."""
    parts = [
        f"""sv AS (
  SELECT vec_id, sub,
         list_transform(range(1, {_PQ_SUBDIM + 1}), i -> v[sub * {_PQ_SUBDIM} + i]) AS u
  FROM v, range(0, {_PQ_M}) t(sub))""",
        f"""pq0 AS (SELECT sub, vec_id AS cell, u AS cv FROM sv WHERE vec_id < {_PQ_KS})""",
    ]
    for t in range(1, _PQ_ITERS + 1):
        parts.append(
            f"""pqa{t} AS (
  SELECT vec_id, sub, u, cell FROM (
    SELECT vec_id, sub, u, cell,
           row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cell) AS rk
    FROM (SELECT x.vec_id, x.sub, x.u, p.cell,
                 {_pq_sql_dist('x.u', 'p.cv')} AS d
          FROM sv x JOIN pq{t - 1} p ON p.sub = x.sub))
  WHERE rk = 1)"""
        )
        if t < _PQ_ITERS:
            parts.append(
                f"""pqs{t} AS (
  SELECT sub, cell, i, sum(u[i]) AS su, count(*) AS cnt
  FROM pqa{t}, range(1, {_PQ_SUBDIM + 1}) t(i)
  GROUP BY sub, cell, i),
pq{t} AS (
  SELECT p.sub, p.cell, COALESCE(w.cv, p.cv) AS cv
  FROM pq{t - 1} p LEFT JOIN (
    SELECT sub, cell,
           list(CAST((su - ((su % cnt + cnt) % cnt)) // cnt AS BIGINT) ORDER BY i) AS cv
    FROM pqs{t} GROUP BY sub, cell) w ON w.sub = p.sub AND w.cell = p.cell)"""
            )
    parts += [
        f"""qs AS (
  SELECT vec_id AS qid, v AS qv FROM v
  WHERE vec_id % 100 = 0 AND vec_id < 10000)""",
        f"""qsub AS (
  SELECT qid, sub,
         list_transform(range(1, {_PQ_SUBDIM + 1}), i -> qv[sub * {_PQ_SUBDIM} + i]) AS qu
  FROM qs, range(0, {_PQ_M}) t(sub))""",
        f"""crk AS (
  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY d, cid) AS rk
  FROM (SELECT q.qid, c.cid, {_km_dist('q.qv', 'c.cv')} AS d
        FROM qs q, c{_KM_ITERS - 1} c))""",
        f"""probe AS (SELECT qid, cid FROM crk WHERE rk <= {_IVF_NPROBE})""",
        f"""cand AS (
  SELECT p.qid, a.vec_id AS nid
  FROM probe p JOIN a{_KM_ITERS} a ON a.cluster = p.cid
  WHERE a.vec_id <> p.qid)""",
        f"""subd AS (
  SELECT c.qid, c.nid, {_pq_sql_dist('q.qu', 'cb.cv')} AS d
  FROM cand c
  JOIN pqa{_PQ_ITERS} pa ON pa.vec_id = c.nid
  JOIN pq{_PQ_ITERS - 1} cb ON cb.sub = pa.sub AND cb.cell = pa.cell
  JOIN qsub q ON q.qid = c.qid AND q.sub = pa.sub)""",
        """scored AS (SELECT qid, nid, sum(d) AS adc_dist FROM subd GROUP BY qid, nid)""",
    ]
    return parts


_IVFPQ_STORED_ORACLE = _km_oracle(
    extra=_ivfpq_extra(),
    final=f"""SELECT qid AS query_id, nid AS neighbor_id,
       CAST(rk AS INTEGER) AS rk, adc_dist
FROM (SELECT qid, nid, adc_dist,
             row_number() OVER (PARTITION BY qid ORDER BY adc_dist, nid) AS rk
      FROM scored)
WHERE rk <= {_IVF_TOPK}""",
)


def _pq_train_micros(emb: DataFrame) -> list[list[list[int]]]:
    """Deterministic integer PQ codebooks: per subspace, Lloyd's with
    ``_PQ_ITERS`` assignment passes over the 16-dim subvectors. Init =
    subvectors of the first ``_PQ_KS`` vectors by vec_id; floor-div means;
    (dist, cell) ties — bit-equal to the ``pq0``/``pqa``/``pq1`` SQL replay.
    Returns books[sub][cell] -> subdim ints."""
    hit = _TRAIN_CACHE.get(("pq", _cache_key(emb)))
    if hit is not None:
        return [[list(c) for c in b] for b in hit]
    # Fused training (round 12, guide §1.2 "the distributed algorithm"):
    # the old loop ran 1 seed collect + (_PQ_ITERS-1) update collects PER
    # SUBSPACE — 4·_PQ_ITERS sequential Spark jobs over the same tiny
    # frame, each paying full job fixed cost. The subspaces are
    # independent, so one pass trains all of them: seeds come from the
    # shared _seed_vectors collect, and each update explodes (sub, cell,
    # subvector) for every subspace in a single select and aggregates
    # per (sub, cell, dim) in ONE job. The per-subspace assignment
    # expressions, the per-(cell, dim) integer sums, and the floor-div
    # means are unchanged, so the books are bit-identical to the
    # per-subspace loop (and to the pq0/pqa/pq1 SQL replay).
    seeds = _seed_vectors(emb)
    books = [
        [v[s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM] for v in seeds[:_PQ_KS]]
        for s in range(_PQ_M)
    ]
    for _ in range(_PQ_ITERS - 1):
        per_sub = []
        for s in range(_PQ_M):
            usql = f"slice(v, {s * _PQ_SUBDIM + 1}, {_PQ_SUBDIM})"
            per_sub.append(
                F.expr(
                    f"struct({s} AS sub, "
                    f"{_argmin_cell_sql(usql, books[s])}.c AS cell, "
                    f"{usql} AS u)"
                )
            )
        sums = (
            emb.select(F.explode(F.array(*per_sub)).alias("r"))
            .select("r.sub", "r.cell", F.posexplode("r.u").alias("i", "val"))
            .groupBy("sub", "cell", "i")
            .agg(F.sum("val").alias("su"), F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        acc = {(r["sub"], r["cell"], r["i"]): (r["su"], r["cnt"]) for r in sums}
        books = [
            [
                [acc[(s, c, i)][0] // acc[(s, c, i)][1] for i in range(_PQ_SUBDIM)]
                if (s, c, 0) in acc
                else list(books[s][c])
                for c in range(_PQ_KS)
            ]
            for s in range(_PQ_M)
        ]
    _TRAIN_CACHE[("pq", _cache_key(emb))] = [[list(c) for c in b] for b in books]
    return books


def _ivfpq_adc_scores(spark: SparkSession, sf_dir: str, work: str) -> DataFrame:
    """Build the stored IVF-PQ index under ``work`` and return the full ADC
    candidate score frame (qid, neighbor_id, adc_dist) for the benchmark
    query set — shared by the ADC-ranked query and the exact-rerank query
    so both read the identical index and probe plan."""
    import os

    emb = _micros_vectors(spark, sf_dir)
    # The coarse k-means and the PQ codebooks train on the SAME frame but
    # share no state beyond the seed collect — warm the seed memo once,
    # then overlap the two trainers' sequential per-iteration collect jobs
    # from a small thread pool (guide §2.6: independent jobs back-fill each
    # other's stragglers). Results are the memoized deterministic trainers'
    # — bit-identical to the sequential order.
    from concurrent.futures import ThreadPoolExecutor

    _seed_vectors(emb)
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_km = pool.submit(_kmeans_micros, emb)
        f_pq = pool.submit(_pq_train_micros, emb)
        (_assigned, cents), books = f_km.result(), f_pq.result()

    # encode: one pass over the corpus, M argmins over literal codebooks
    def code_col(s: int) -> F.Column:
        usql = f"slice(v, {s * _PQ_SUBDIM + 1}, {_PQ_SUBDIM})"
        return F.expr(f"{_argmin_cell_sql(usql, books[s])}.c")

    idx_path = os.path.join(work, "cells")
    # stored row = (vec_id, 4 small ints, cell) — no raw vector. The cell
    # assignment and the PQ codes are BOTH per-row expressions over literal
    # centroids/codebooks, so one select computes them in the same corpus
    # pass (round 12 — the old form joined two derivations of the same
    # frame back together on vec_id: an extra exchange for nothing).
    _km_assign(emb, cents).select(
        "vec_id",
        F.array(*[code_col(s) for s in range(_PQ_M)]).alias("code"),
        "cluster",
    ).write.partitionBy("cluster").parquet(idx_path)

    q_rows = (
        emb.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 10000))
        .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
        .collect()
    )

    # probe cells: exact integer distance to the k coarse centroids,
    # computed driver-side from the collected query set (Q ≤ 100 rows)
    def idist(qv: list, cv: list) -> int:
        return sum((int(a) - int(b)) * (int(a) - int(b)) for a, b in zip(qv, cv))

    probe_pairs_py, lut_rows = [], []
    for r in q_rows:
        qv = list(r["qv"])
        ranked = sorted(
            (idist(qv, cv), cid) for cid, cv in enumerate(cents)
        )[:_IVF_NPROBE]
        probe_pairs_py += [(r["qid"], cid) for _, cid in ranked]
        # flat LUT: lut[sub*ksub + cell] = subspace distance (exact int)
        flat = [
            idist(
                qv[s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM], books[s][cell]
            )
            for s in range(_PQ_M)
            for cell in range(_PQ_KS)
        ]
        lut_rows.append((r["qid"], flat))
    probed_cells = sorted({c for _, c in probe_pairs_py})
    from realestatedeals_spark.util import inline_frame

    probe_pairs = inline_frame(spark, ["qid", "cluster"], probe_pairs_py).select(
        F.col("qid").cast("long"), F.col("cluster").cast("int")
    )
    lut_df = inline_frame(spark, ["qid", "flat_lut"], lut_rows)

    # literal IN-filter → PartitionFilters: only probed cell dirs read
    idx = spark.read.parquet(idx_path).filter(F.col("cluster").isin(probed_cells))
    cand = (
        idx.join(F.broadcast(probe_pairs), "cluster")
        .filter(F.col("vec_id") != F.col("qid"))
        .join(F.broadcast(lut_df), "qid")
    )
    adc = None
    for s in range(_PQ_M):
        term = F.element_at(
            "flat_lut",
            (F.lit(s * _PQ_KS + 1) + F.element_at("code", s + 1)).cast("int"),
        )
        adc = term if adc is None else adc + term
    return cand.select(
        "qid", F.col("vec_id").alias("neighbor_id"), adc.cast("long").alias("adc_dist")
    )


@register(
    "x3_ivfpq_stored_topk",
    bench=True,  # round 11: driver-visible so the vectorized/stored-index paths cannot silently regress
    oracle=_IVFPQ_STORED_ORACLE,
    tags=("X3", "vectors", "ann", "index", "storage", "quantization"),
)
def x3_ivfpq_stored_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 neighbors per query from a STORED IVF-PQ index: coarse-cell
    partition-pruned probes over PQ CODE rows only, ranked by integer ADC.
    See the block comment above; hash-exact — training, encoding, probing,
    and the ADC approximation are all stated in the oracle."""
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="ivfpq_idx_")
    try:
        scored = _ivfpq_adc_scores(spark, sf_dir, work)
        w = W.partitionBy("qid").orderBy("adc_dist", "neighbor_id")
        out = (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _IVF_TOPK)
            .select(
                F.col("qid").alias("query_id"),
                "neighbor_id",
                F.col("rk").cast("int").alias("rk"),
                "adc_dist",
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# X3 — IVF-PQ with EXACT RERANK (round 12, verdict task #2): what a
# production FAISS-IVFPQ deployment actually serves. ADC distances are a
# lossy ranking — fine for shortlisting, not for the final order — so the
# standard shape is: ADC-rank the probed code rows, keep the top R per
# query, fetch the RAW vectors for just those R candidates from the
# corpus (NOT from the index, which stores codes only — the index stays
# 128× smaller), and re-rank them by exact distance. Cost per query:
# nprobe code-partition reads + R raw-vector fetches — never a raw-vector
# scan of the corpus per query. R=128 for k=5 here: the PQ is deliberately
# coarse (M=4, ksub=8 -> 4096 distinct codes), so ADC ranks are noisy and
# the measured max ADC rank of a true top-5 neighbor is 104 on the sf0.001
# fixture (96 at sf0.01); the coverage pytest pins that the window covers
# the exact top-k over the full probed set on the fixture (an ADC
# shortlist that drops a true neighbor past R is a recall knob turned too
# low, and would surface there). The raw-vector fetch is a broadcast
# semi-join of the ≤ Q·R shortlist against the corpus scan; a 100 TB
# deployment points the same join at a vec_id-bucketed store for
# point-lookup I/O. Every stage — ADC shortlist, fetch, exact rerank — is
# restated in the SQL oracle: hash-exact.
# ---------------------------------------------------------------------------

_IVFPQ_RERANK_R = 128

_IVFPQ_RERANK_ORACLE = _km_oracle(
    extra=_ivfpq_extra()
    + [
        f"""short AS (
  SELECT qid, nid FROM (
    SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY adc_dist, nid) AS ark
    FROM scored)
  WHERE ark <= {_IVFPQ_RERANK_R})""",
        f"""rer AS (
  SELECT s.qid, s.nid, {_km_dist('q.qv', 'e.v')} AS dist_sq
  FROM short s JOIN v e ON e.vec_id = s.nid JOIN qs q ON q.qid = s.qid)""",
    ],
    final=f"""SELECT qid AS query_id, nid AS neighbor_id,
       CAST(rk AS INTEGER) AS rk, dist_sq
FROM (SELECT qid, nid, dist_sq,
             row_number() OVER (PARTITION BY qid ORDER BY dist_sq, nid) AS rk
      FROM rer)
WHERE rk <= {_IVF_TOPK}""",
)


@register(
    "x3_ivfpq_rerank_topk",
    oracle=_IVFPQ_RERANK_ORACLE,
    tags=("X3", "vectors", "ann", "index", "storage", "quantization", "rerank"),
)
def x3_ivfpq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 per query over the ADC top-R shortlist from the stored
    IVF-PQ index (shortlist from codes, rerank from raw corpus vectors).
    See the block comment above; hash-exact."""
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="ivfpq_rr_")
    try:
        scored = _ivfpq_adc_scores(spark, sf_dir, work)
        aw = W.partitionBy("qid").orderBy("adc_dist", "neighbor_id")
        short = (
            scored.withColumn("ark", F.row_number().over(aw))
            .filter(F.col("ark") <= _IVFPQ_RERANK_R)
            .select("qid", "neighbor_id")
        )
        # raw-vector fetch for the shortlist only: broadcast the ≤ Q·R id
        # pairs against ONE corpus scan (the index holds codes, not vectors)
        emb = _micros_vectors(spark, sf_dir)
        raw = emb.select(F.col("vec_id").alias("neighbor_id"), "v")
        queries = _ivf_queries(emb)
        cand = (
            raw.join(F.broadcast(short), "neighbor_id")
            .join(F.broadcast(queries), "qid")
            .select("qid", F.col("neighbor_id").alias("vec_id"), "v", "qv")
        )
        return _ivf_rank_topk(cand).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# X9 — quantization-impact evaluation: how much retrieval quality does
# int8 storage cost? For every benchmark query, rank neighbors by exact
# float cosine AND by int8-quantized cosine (scales cancel:
# qdot / (sqrt(ql2_a) * sqrt(ql2_b)) — integer dot products + one sqrt,
# engine-identical), then report recall@5 and the reciprocal rank of the
# true top-1 inside the quantized ranking. The evaluation harness itself
# is a query — integer counts and micro-rationals, hash-exact.
# ---------------------------------------------------------------------------

_X9_QIMPACT_ORACLE = """
WITH q8 AS (
  SELECT vec_id,
         list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
           x -> CAST(round(x / (list_max(list_transform(embedding,
                  y -> abs(CAST(y AS DOUBLE)))) / 127.0), 0) AS BIGINT)) AS qv
  FROM embeddings),
qn AS (SELECT vec_id, qv, list_sum(list_transform(qv, x -> x * x)) AS ql2 FROM q8),
pairs AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_reduce(list_transform(range(1, 65),
             i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
             (a, x) -> a + x)
         / (sqrt(list_reduce(list_transform(range(1, 65),
               i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)),
               (a, x) -> a + x))
            * sqrt(list_reduce(list_transform(range(1, 65),
               i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
               (a, x) -> a + x))) AS fcos,
         CAST(list_reduce(list_transform(range(1, 65),
             i -> qq.qv[i] * qe.qv[i]), (a, x) -> a + x) AS DOUBLE)
         / (sqrt(CAST(qq.ql2 AS DOUBLE)) * sqrt(CAST(qe.ql2 AS DOUBLE))) AS qcos
  FROM embeddings q
  JOIN embeddings e ON e.vec_id <> q.vec_id
  JOIN qn qq ON qq.vec_id = q.vec_id
  JOIN qn qe ON qe.vec_id = e.vec_id
  WHERE q.vec_id % 100 = 0),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY fcos DESC, neighbor_id) AS frk,
         row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id) AS qrk
  FROM pairs),
recall AS (
  SELECT query_id,
         CAST(count(*) FILTER (frk <= 5 AND qrk <= 5) AS BIGINT) AS recall_at5
  FROM ranked GROUP BY query_id),
rr AS (
  SELECT query_id,
         CAST(CASE WHEN min(CASE WHEN frk = 1 THEN qrk END) <= 20
              THEN 1000000 // min(CASE WHEN frk = 1 THEN qrk END) ELSE 0 END AS BIGINT) AS rr_micros
  FROM ranked GROUP BY query_id)
SELECT recall.query_id, recall_at5, rr_micros
FROM recall JOIN rr ON recall.query_id = rr.query_id
"""


@register(
    "x9_quantization_impact",
    bench=True,  # round 11: driver-visible so the vectorized/stored-index paths cannot silently regress
    oracle=_X9_QIMPACT_ORACLE,
    tags=("X9", "vectors", "quantize", "evaluation"),
)
def x9_quantization_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 + reciprocal-rank (micros) of int8 retrieval vs exact.

    Scale shape: same broadcast-queries linear scan as the brute-force
    anchor, evaluated once per ranking; the quantized side's dot product
    is pure integer arithmetic (the production fast path this query is
    costing out). Both rankings share one pair frame, so the audit adds
    one window, not a second scan.
    """
    from realestatedeals_spark.plans.llm_vectors import quantize_embeddings
    from realestatedeals_spark.util import spread_by_id

    # spread (round 12): the quantize + dual-ranking pair scan otherwise
    # runs on the fixture scan's one split (measured 1.19 → 0.85 s best)
    emb = spread_by_id(load_table(spark, sf_dir, "embeddings"), "vec_id")
    qn = quantize_embeddings(emb).select(
        "vec_id",
        F.transform("qv", lambda x: x.cast("long")).alias("qv"),
    )
    qn = qn.withColumn(
        "ql2",
        F.aggregate(
            "qv", F.lit(0).cast("long"), lambda acc, x: acc + x * x
        ),
    )
    base = emb.join(qn, "vec_id").select("vec_id", "embedding", "qv", "ql2")
    queries = base.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("qv").alias("q_qv"),
        F.col("ql2").alias("q_ql2"),
    )
    # Vectorized pair scoring (round 11): the broadcast-BNLJ form paid four
    # interpreted higher-order aggregates per pair (~138 engine-s at gen
    # sf1.0 for 4M pairs). Same fused-sweep pattern as the LSH verify /
    # MMR rel stages: queries are bounded (N/100) and ride a broadcast;
    # each Arrow batch accumulates DIM-BY-DIM (vectorized over pairs,
    # sequential over dims) so the float adds replay F.aggregate / DuckDB
    # list_reduce left-to-right exactly; IEEE multiply is commutative so
    # the norm product matches; the integer dot is exact int64. Query
    # chunks bound the accumulator memory at any Q.
    import numpy as np
    import pandas as pd

    q_rows = queries.collect()
    _qids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    _qemb = np.array([list(r["q_emb"]) for r in q_rows], dtype=np.float64)
    _qqv = np.array([list(r["q_qv"]) for r in q_rows], dtype=np.int64)
    _qql2 = np.array([r["q_ql2"] for r in q_rows], dtype=np.int64)
    bq = spark.sparkContext.broadcast((_qids, _qemb, _qqv, _qql2))

    def score(batches):
        qids, qemb, qqv, qql2 = bq.value
        dim = qemb.shape[1]
        nq = np.zeros(len(qids))
        for d in range(dim):
            nq += qemb[:, d] * qemb[:, d]
        qn_sqrt = np.sqrt(nq)
        qql2_sqrt = np.sqrt(qql2.astype(np.float64))
        for pdf in batches:
            if pdf.empty:
                continue
            nid = pdf["vec_id"].to_numpy(dtype=np.int64)
            e = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            v = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
            l2 = pdf["ql2"].to_numpy(dtype=np.int64)
            en = np.zeros(len(nid))
            for d in range(dim):
                en += e[:, d] * e[:, d]
            en_sqrt = np.sqrt(en)
            l2_sqrt = np.sqrt(l2.astype(np.float64))
            for c0 in range(0, len(qids), 256):
                qi = slice(c0, c0 + 256)
                facc = np.zeros((len(nid), len(qids[qi])))
                iacc = np.zeros((len(nid), len(qids[qi])), dtype=np.int64)
                for d in range(dim):
                    facc += np.outer(e[:, d], qemb[qi, d])
                    iacc += np.outer(v[:, d], qqv[qi, d])
                # Zero denominators are unreachable: a zero-norm embedding
                # already fails LOUDLY upstream (quantize_embeddings' ANSI
                # divide-by-zero — the query's documented contract), and any
                # nonzero vector quantizes to a nonzero code (max |x| maps
                # to ±127), so both norm products are strictly positive
                # here. Asserted so a contract change surfaces as an error,
                # never as numpy NaN/Inf silently outranking real rows.
                fden = qn_sqrt[qi][None, :] * en_sqrt[:, None]
                qden = qql2_sqrt[qi][None, :] * l2_sqrt[:, None]
                assert (fden > 0).all() and (qden > 0).all(), (
                    "zero-norm vector reached the x9 scorer"
                )
                fcos = facc / fden
                qcos = iacc.astype(np.float64) / qden
                keep = nid[:, None] != qids[qi][None, :]
                bi, ci = np.nonzero(keep)
                yield pd.DataFrame(
                    {
                        "query_id": qids[qi][ci],
                        "neighbor_id": nid[bi],
                        "fcos": fcos[bi, ci],
                        "qcos": qcos[bi, ci],
                    }
                )

    pairs = base.mapInPandas(
        score, schema="query_id long, neighbor_id long, fcos double, qcos double"
    )
    wf = W.partitionBy("query_id").orderBy(F.col("fcos").desc(), "neighbor_id")
    wq = W.partitionBy("query_id").orderBy(F.col("qcos").desc(), "neighbor_id")
    ranked = pairs.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(wf).alias("frk"),
        F.row_number().over(wq).alias("qrk"),
    )
    recall = ranked.groupBy("query_id").agg(
        F.count(F.when((F.col("frk") <= 5) & (F.col("qrk") <= 5), 1)).alias(
            "recall_at5"
        )
    )
    top1_qrk = F.min(F.when(F.col("frk") == 1, F.col("qrk")))
    rr = ranked.groupBy("query_id").agg(
        F.when(top1_qrk <= 20, (F.lit(1000000) / top1_qrk).cast("long"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rr_micros")
    )
    return recall.join(rr, "query_id")
