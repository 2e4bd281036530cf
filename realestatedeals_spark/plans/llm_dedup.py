"""Near-duplicate detection queries (SURVEY.md §2b X2 + embedding near-dup).

The MinHash query is oracle-checked against the brute-force exact-Jaccard
answer: LSH only *prunes* candidates and every candidate is exact-verified,
so at J≥0.9 with 16×4 banding the miss probability is < 4e-8 and the outputs
coincide. The SimHash and clustering variants register oracles where DuckDB
can express them (recursive CTE for connected components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.operators.dedup import (
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from realestatedeals_spark.operators.similarity import cosine_pairs
from realestatedeals_spark.plans.registry import register

def _brute_jaccard_ctes(src: str = "documents") -> str:
    """The exact-Jaccard CTE chain over ``src`` (no leading WITH)."""
    return f"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM {src}),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(t) - 2, 0) + 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
  FROM toks),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
jac AS (
  SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (ca.n + cb.n - i) AS jaccard
  FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id)
"""


_BRUTE_JACCARD = "\nWITH " + _brute_jaccard_ctes()

_X2_MINHASH_ORACLE = _BRUTE_JACCARD + """
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.9
"""


@register("x2_minhash_near_dup", oracle=_X2_MINHASH_ORACLE, tags=("X2", "dedup"), bench=True)
def x2_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_near_duplicates(docs, k=3, num_hashes=64, bands=16, threshold=0.9)


_X2_INCR_ORACLE = _BRUTE_JACCARD + """
SELECT doc_a, doc_b, jaccard FROM jac
WHERE jaccard >= 0.9 AND (doc_a % 7 = 0 OR doc_b % 7 = 0)
"""


@register(
    "x2_minhash_incremental",
    oracle=_X2_INCR_ORACLE,
    tags=("X2", "dedup", "incremental"),
    bench=True,
)
def x2_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus ingestion (round-5 engine addition): dedup a new
    document batch (doc_id ≡ 0 mod 7) against the rest of the corpus using
    a PERSISTED MinHash signature index — history is never re-shingled; the
    new batch is signed, band-joined against the stored index, and only
    candidate docs get their shingles recomputed from corpus storage
    (semi-join prune). The index lives in a ``VersionedTable`` and the
    batch ends with a conflict-checked commit of the updated index — the
    ingest loop a 100 TB corpus actually runs, exercised end-to-end.

    Oracle: brute-force exact Jaccard restricted to pairs touching the new
    batch. Hash-exact for the same structural reason as
    ``x2_minhash_near_dup``: every candidate is exact-verified (precision
    1) and at J≥0.9 the 16×4 banding misses with p < 4e-8.
    """
    import os
    import shutil
    import tempfile

    from realestatedeals_spark.io.maintenance import VersionedTable
    from realestatedeals_spark.operators.dedup import (
        incremental_minhash_near_duplicates,
        minhash_signatures,
        shingle_sets,
    )

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 7 == 0)
    work = tempfile.mkdtemp(prefix="mh_index_")
    try:
        from concurrent.futures import ThreadPoolExecutor

        from realestatedeals_spark.util import free_local_checkpoint, spread_by_id

        idx = VersionedTable(spark, os.path.join(work, "sig_index"))
        # Historical ingest and the new batch's shingle materialization are
        # independent jobs — overlap them (guide §2.6). Spread both scans
        # first (round 12): the single-split fixture scan otherwise signs
        # 6/7 of the corpus (and shingles the batch) on one core.
        with ThreadPoolExecutor(max_workers=2) as pool:
            ingest = pool.submit(
                idx.commit,
                minhash_signatures(shingle_sets(spread_by_id(old, "doc_id"))),
            )
            sets_new = shingle_sets(
                spread_by_id(new, "doc_id")
            ).localCheckpoint(eager=True)
            ingest.result()
        index_sig = idx.read()  # signatures come from storage, not lineage
        pairs, sig_new = incremental_minhash_near_duplicates(
            index_sig, new, docs, sets_new=sets_new
        )
        # batch epilogue: MERGE the new signatures into the persisted index.
        # (Round 12 measured an insert-only MoR append here — O(batch)
        # written bytes instead of O(index) — but the append's extra
        # commit machinery cost +0.6 s in an interleaved A/B at sf0.1, so
        # the full-rewrite commit stays; see OPTIMIZATION_r12.md.)
        # The merge commit and the pair materialization depend on the same
        # inputs but NOT on each other — overlap them too (§2.6).
        with ThreadPoolExecutor(max_workers=2) as pool:
            merge = pool.submit(
                idx.commit,
                index_sig.unionByName(sig_new),
                expected_latest=idx.latest_version(),
            )
            out = pairs.localCheckpoint(eager=True)
            merge.result()
        # the batch's shingle checkpoint fed its last reader above
        free_local_checkpoint(sets_new)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


_X2_CLUSTERS_ORACLE = (
    "WITH RECURSIVE "
    + _BRUTE_JACCARD.replace("WITH toks", "toks", 1).lstrip()
    + """,
-- MATERIALIZED: the recursive reach term re-evaluates edges every round;
pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.9),
edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
nodes AS (SELECT DISTINCT a FROM edges)
SELECT nodes.a AS doc_id,
       CAST(least(nodes.a, coalesce(min(reach.b), nodes.a)) AS BIGINT) AS cluster_id
FROM nodes LEFT JOIN reach ON reach.a = nodes.a
GROUP BY nodes.a
"""
)


@register(
    "x2_duplicate_clusters", oracle=_X2_CLUSTERS_ORACLE, tags=("X2", "dedup", "graph"), bench=True
)
def x2_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clusters via alternating large-star/small-star (O(log n) rounds —
    the 100 TB path; ``duplicate_clusters`` is the O(diameter) label-
    propagation alternative, equivalence-tested in tests/test_dedup.py)."""
    from realestatedeals_spark.operators.dedup import duplicate_clusters_star

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(docs, k=3, num_hashes=64, bands=16, threshold=0.9)
    return duplicate_clusters_star(pairs)


# Anchor subsample (round 12, verdict task #6): this exact all-pairs form is
# an EXACTNESS ANCHOR beside the production paths (MinHash banding,
# winnowing) — at gen sf1.0 it alone cost 304 engine-seconds proving nothing
# the fixture-scale run didn't. Both engines state the same deterministic
# mix31-threshold subsample: identity at ≤ 5000 docs (every driver fixture
# unchanged, bit-for-bit), ~5000 docs above it, so the all-pairs volume
# stays ~sf0.1-sized at any SF and the anchor keeps its hash-exact role.
_X2_NGRAM_CAP = 5000


def _ngram_oracle() -> str:
    from realestatedeals_spark.operators.subsample import anchor_subsample_sql

    return (
        "WITH sub AS (SELECT * FROM "
        + anchor_subsample_sql("documents", "doc_id", _X2_NGRAM_CAP)
        + " s),\n"
        + _brute_jaccard_ctes("sub")
        + """
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.8
"""
    )


@register("x2_ngram_jaccard", oracle=_ngram_oracle(), tags=("X2", "dedup"))
def x2_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup via an inverted-index self-join, over
    the deterministic anchor subsample (identity at driver SFs).

    No LSH: the (doc, shingle) table joins itself on shingle so only pairs
    sharing at least one 3-gram are scored — the standard exact scale path
    (shuffle is bounded by the posting-list sizes, never |docs|^2). Pair
    intersection counts partial-aggregate map-side before the join-back
    against per-doc shingle counts.

    Scale caveat: the candidate-pair OUTPUT itself is quadratic on
    boilerplate-heavy corpora — near-identical template docs all share
    shingles, so at this 0.8 threshold SCALE.md measured 187k → 18.7M pairs
    across one 10× data step. For such corpora use the capped variant
    ``x2_winnow_overlap_capped`` (per-fingerprint posting-list cap bounds
    the pair blowup) or the banded ``x2_minhash_near_dup``; this exact form
    is the right tool when near-dup density is low or the threshold high —
    and as an ANCHOR it now runs on the mix31 subsample above ~5000 docs so
    the sweep corpora stop paying quadratic cost for fixture-scale evidence.
    """
    from realestatedeals_spark.operators.dedup import shingle_table
    from realestatedeals_spark.operators.subsample import anchor_subsample

    from realestatedeals_spark.util import spread_by_id

    # spread (round 12): the shingle explode + posting self-join map side
    # otherwise runs on the fixture scan's one split (measured 2.11 →
    # 0.62 s best at sf0.1, rowsets identical)
    docs = spread_by_id(
        anchor_subsample(
            load_table(spark, sf_dir, "documents"), "doc_id", _X2_NGRAM_CAP
        ),
        "doc_id",
    )
    sh = shingle_table(docs, k=3)
    cnt = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    # NO broadcast hint on the per-doc count tables: they are
    # corpus-proportional (one row per document), so a forced broadcast is
    # exactly the kind of scale bug AQE exists to avoid — locally it
    # broadcasts anyway (tiny), at 100 TB it picks a shuffled join.
    ca = cnt.select(F.col("_id").alias("doc_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.8)
    )


@register("x2_simhash_near_dup", tags=("X2", "dedup"), bench=True)  # round 11: wide-agg rewrite stays driver-visible
def x2_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-≤3 pairs. No SQL oracle for THIS variant (Spark's
    xxhash64 bit pattern is not reproducible in DuckDB); brute-force-checked
    in tests/test_dedup.py. The distributed mechanism itself — sign
    aggregation, 4×16 banding, Hamming verify — is hash-exact oracled by
    x2_simhash_arith_near_dup below, which differs only in the token-hash
    primitive."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_duplicates(docs, max_hamming=3)


# Mirrors operators/dedup.py:simhash_arith_near_duplicates step for step:
# per-(doc, token) counts → double polynomial hash over codepoints (computed
# once per DISTINCT token — hash depends only on the token string) → 64
# parity bits → count-weighted sign sums → uint32 hi/lo signature halves →
# 4×16-bit band equi-join → Hamming ≤ 3. All int64 arithmetic; parities of
# (h1 + (i+1)·h2 + i²·12345) mod 1e9+7 are identical in both engines.
_X2_SIMHASH_ARITH_ORACLE = """
WITH tok AS (
  SELECT doc_id, t AS tok FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> ''
),
cnt AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY doc_id, tok),
vocab AS (
  SELECT tok,
    list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(tok, ''), ch -> CAST(ascii(ch) AS BIGINT))),
                (acc, c) -> (acc * 31 + c) % 1000000007) AS h1,
    list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(tok, ''), ch -> CAST(ascii(ch) AS BIGINT))),
                (acc, c) -> (acc * 131 + c) % 998244353) AS h2
  FROM (SELECT DISTINCT tok FROM cnt)
),
per_bit AS (
  SELECT c.doc_id, r.range AS bit,
         sum(CASE WHEN ((v.h1 + (r.range + 1) * v.h2 + r.range * r.range * 12345)
                        % 1000000007) % 2 = 1
                  THEN c.cnt ELSE -c.cnt END) AS s
  FROM cnt c JOIN vocab v USING (tok) CROSS JOIN range(0, 64) r
  GROUP BY c.doc_id, r.range
),
sig AS (
  SELECT doc_id,
    CAST(coalesce(sum(CASE WHEN s > 0 AND bit < 32
                           THEN CAST(1 AS BIGINT) << CAST(bit AS INT) END), 0) AS BIGINT) AS lo,
    CAST(coalesce(sum(CASE WHEN s > 0 AND bit >= 32
                           THEN CAST(1 AS BIGINT) << CAST(bit - 32 AS INT) END), 0) AS BIGINT) AS hi
  FROM per_bit GROUP BY doc_id
),
bands AS (
  SELECT doc_id, lo, hi, b.band,
         CASE b.band WHEN 0 THEN lo % 65536
                     WHEN 1 THEN lo // 65536
                     WHEN 2 THEN hi % 65536
                     ELSE hi // 65536 END AS key
  FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) b(band)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INT) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
"""


@register(
    "x2_simhash_arith_near_dup",
    oracle=_X2_SIMHASH_ARITH_ORACLE,
    tags=("X2", "dedup"),
    bench=True,
)
def x2_simhash_arith_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with an engine-portable arithmetic token hash —
    the hash-exact companion that oracles the full distributed SimHash
    mechanism (sign aggregation, hi/lo signature halves, 4×16 banding,
    Hamming-≤3 verify); see operators/dedup.py:simhash_arith_near_duplicates."""
    from realestatedeals_spark.operators.dedup import simhash_arith_near_duplicates

    docs = load_table(spark, sf_dir, "documents")
    return simhash_arith_near_duplicates(docs, max_hamming=3)


# array_cosine_similarity over DOUBLE[64] is bit-identical to the explicit
# sequential list_reduce fold (verified: 0 differing values over all sf0.01
# pairs) and runs native/vectorized — the lambda form took hours on the
# 200M-pair sf1.0 sweep, this takes seconds.
_X5_EMB_PAIRS_CTE = """
v AS (SELECT vec_id, embedding::DOUBLE[]::DOUBLE[64] AS a FROM embeddings),
pairs AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         array_cosine_similarity(x.a, y.a) AS cosine
  FROM v x JOIN v y ON x.vec_id < y.vec_id)
"""

# Anchor subsample (round 12, verdict task #6; same statement-level rule as
# x2_ngram_jaccard): identity at ≤ 2000 vectors — the driver fixtures and
# their hashes are untouched — and a deterministic ~2000-row subset above,
# so the O(N²) pair volume stays ~sf0.1-sized at any SF.
_X5_EMB_CAP = 2000


def _x5_emb_oracle() -> str:
    from realestatedeals_spark.operators.subsample import anchor_subsample_sql

    cte = _X5_EMB_PAIRS_CTE.replace(
        "FROM embeddings",
        "FROM " + anchor_subsample_sql("embeddings", "vec_id", _X5_EMB_CAP) + " e2",
    )
    return (
        "WITH " + cte + """
SELECT id_a, id_b, round(cosine, 6) AS cosine
FROM pairs WHERE cosine >= 0.45
"""
    )


@register("x5_embedding_near_dup", oracle=_x5_emb_oracle(), tags=("X3", "dedup", "vectors"))
def x5_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs — the O(N²) exactness BASELINE for the bucketed
    ``x5_embedding_near_dup_lsh`` below (same role the brute-force cosine
    top-k plays for the ANN variants); never the plan to reach for at
    scale, and (round 12) an ANCHOR that runs on the deterministic mix31
    subsample above ~2000 vectors so sweep corpora stop paying O(N²) for
    fixture-scale evidence. Round 5: runs through ``gemm_cosine_pairs``
    (blocked-GEMM physical strategy, bit-identical to the zip_with join
    form but with numpy's constant — the sf1.0 sweep needed 200M pairs
    verified, which the per-pair expression form spent hours on and this
    does in ~a minute); ``cosine_pairs`` remains the one-line reference
    form, equivalence-pinned in tests/test_similarity.py."""
    from realestatedeals_spark.operators.similarity import gemm_cosine_pairs
    from realestatedeals_spark.operators.subsample import anchor_subsample

    emb = anchor_subsample(
        load_table(spark, sf_dir, "embeddings"), "vec_id", _X5_EMB_CAP
    )
    return gemm_cosine_pairs(emb, threshold=0.45).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )


@register(
    "x5_embedding_near_dup_lsh",
    tags=("X3", "dedup", "vectors", "lsh"),
)
def x5_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: multi-table RP-LSH bucketed candidates + exact cosine
    verify (mirrors minhash_near_duplicates' candidates-then-verify design).

    Registered rows-only BY NATURE (round 5): precision is exact — every
    emitted pair is cosine-verified ≥ threshold, so lsh ⊆ brute-force
    always (pinned in tests/test_similarity.py) — but recall at a weak 0.45
    threshold is structural, 1−(1−p⁴)¹⁶ with p the per-plane agreement
    probability, which is ≈ 95-98%, not 1.0, once the corpus carries many
    pairs NEAR the threshold. The driver fixture's qualifying pairs all sit
    at 0.45-0.52 where this config recalls 100% (it hash-matched the exact
    oracle for three rounds), but the generated-sf0.1 sweep — denser, 147k
    borderline pairs — measured 97.6% recall (143,077 / 146,667), exposing
    that match as a fixture accident rather than a guarantee. The exact
    twin ``x5_embedding_near_dup`` remains the oracled anchor, and the
    production-threshold ``x5_embedding_near_dup_lsh_hi`` stays oracled
    because ITS recall is structural (planted twins at cosine ≥ 0.999 are
    missed w.p. ≈ 3e-8)."""
    from realestatedeals_spark.operators.similarity import rp_lsh_near_duplicates

    emb = load_table(spark, sf_dir, "embeddings")
    # cap-with-accounting (round 11: cap moved AHEAD of the verify join):
    # the 0.45 demo threshold is CANDIDATE-quadratic on concentrated
    # corpora (13.8M candidate pairs at gen sf1.0 vs 4,279 output from the
    # production threshold). max_pairs becomes a candidate BUDGET realized
    # as a per-(table, bucket) membership cap — each bucket keeps its K
    # lowest-id vectors (deterministic, similarity-blind) and the dropped
    # memberships are logged. Fixture buckets sit far under K — the cap
    # never bites there, so oracle sweeps are unchanged.
    return rp_lsh_near_duplicates(emb, threshold=0.45, max_pairs=2_000_000).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )


_X5_HI_PAIRS_CTE = """
base AS (
  SELECT vec_id, list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE)) AS v
  FROM embeddings),
pert AS (
  SELECT base.vec_id + 1000000 AS pid,
         list_transform(range(1, 65),
                        i -> v[i] + (CASE WHEN i - 1 = base.vec_id % 64 THEN 0.1 ELSE 0.0 END)) AS v
  FROM base WHERE base.vec_id % 5 = 0),
allv AS (SELECT vec_id, v::DOUBLE[64] AS a FROM base
         UNION ALL SELECT pid AS vec_id, v::DOUBLE[64] AS a FROM pert),
pairs AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         array_cosine_similarity(x.a, y.a) AS cosine
  FROM allv x JOIN allv y ON x.vec_id < y.vec_id)
"""

_X5_HI_ORACLE = (
    "WITH " + _X5_HI_PAIRS_CTE + """
SELECT id_a, id_b, round(cosine, 6) AS cosine
FROM pairs WHERE cosine >= 0.9
"""
)


def _hi_sim_embeddings(emb: DataFrame) -> DataFrame:
    """Deterministic high-similarity fixture derived from the embeddings
    table on BOTH engines: every 5th vector gets a twin (id + 1,000,000)
    with +0.1 added to dimension ``vec_id % 64`` — cosine ≈ 0.999 to its
    source, while all natural fixture pairs top out near 0.52. Arithmetic is
    cast-to-double-then-add in both engines so values are bit-identical."""
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    pert = base.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "v",
            lambda x, i: x
            + F.when(i == F.col("vec_id") % 64, F.lit(0.1)).otherwise(F.lit(0.0)),
        ).alias("v"),
    )
    return base.unionByName(pert)


# The HI variant carries the bench flag, not the 0.45 demo: measured slope at
# 10x embeddings (tools/gen_scale.py, SCALE.md) is ~97x for the 0.45
# threshold — weak-threshold LSH keeps ~2/3 of all pairs as candidates, so
# verify volume is ~quadratic and the plan is a correctness demo, not the
# scale path. The production threshold prunes to ~0.2% of pairs.
@register(
    "x5_embedding_near_dup_lsh_hi",
    oracle=_X5_HI_ORACLE,
    tags=("X3", "dedup", "vectors", "lsh"),
    bench=True,
)
def x5_embedding_near_dup_lsh_hi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION-threshold RP-LSH near-dup (cosine ≥ 0.9) — demonstrates the
    aggressive pruning the 0.45-threshold demo can't: at 12 planes × 8
    tables a random pair survives w.p. ≈ 8 · 2⁻¹² ≈ 0.2%, while the planted
    twins (cosine ≥ 0.999, per-plane agreement p ≥ 0.99) are recalled w.p.
    ≥ 1 − (1 − 0.99¹²)⁸ ≈ 1 − 3e-8 — recall is structural here, not a
    fixture accident (the ADVICE-flagged fragility of the 0.45 variant).
    Candidate-vs-N² pruning ratio is asserted in tests/test_similarity.py.

    Round 7: parameters scale with corpus size (``adaptive_rp_lsh_params``,
    = (12, 8) at driver SFs) so candidate volume stays linear at 10×/100×
    data — see ``x5_embedding_dedup_clusters`` for the sizing math.
    """
    from realestatedeals_spark.operators.similarity import (
        adaptive_rp_lsh_params,
        rp_lsh_near_duplicates,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    hi = _hi_sim_embeddings(emb)
    n_planes, n_tables = adaptive_rp_lsh_params(emb.count() * 6 // 5)
    return rp_lsh_near_duplicates(
        hi, threshold=0.9, vec_col="v", n_planes=n_planes, n_tables=n_tables
    ).select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


@register("x3_ivf_topk", tags=("X3", "vectors", "approx"))
def x3_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: k-means coarse cells + nprobe probing + exact rerank. No SQL
    oracle (approximate by construction); recall vs brute force is asserted
    in tests/test_similarity.py.

    Round 7: nlist scales ∝ √N (``adaptive_ivf_params``; = 16 at driver
    SFs) so per-query probe cost is O(√N), not O(N) — with queries ∝ N the
    fixed-nlist form was quadratic in total, the same latent hazard the
    verdict's top task flagged on the LSH pair queries."""
    from realestatedeals_spark.operators.similarity import (
        adaptive_ivf_params,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    nlist, nprobe = adaptive_ivf_params(emb.count())
    return ivf_topk(emb, queries, k=5, nlist=nlist, nprobe=nprobe, max_iter=3)


@register("x3_rp_lsh_topk", tags=("X3", "vectors", "approx"))
def x3_rp_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN via random-hyperplane LSH + exact re-rank. No SQL
    oracle (approximate by construction); recall vs the brute-force baseline
    is asserted in tests/test_similarity.py."""
    from realestatedeals_spark.operators.similarity import rp_lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return rp_lsh_topk(emb, queries, k=5)


_X5_EMB_CLUSTERS_ORACLE = (
    "WITH RECURSIVE " + _X5_HI_PAIRS_CTE.lstrip() + """,
p AS (SELECT id_a, id_b FROM pairs WHERE cosine >= 0.9),
edges AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
nodes AS (SELECT DISTINCT a FROM edges)
SELECT nodes.a AS vec_id,
       CAST(least(nodes.a, coalesce(min(reach.b), nodes.a)) AS BIGINT) AS cluster_id
FROM nodes LEFT JOIN reach ON reach.a = nodes.a
GROUP BY nodes.a
"""
)


@register(
    "x5_embedding_dedup_clusters",
    oracle=_X5_EMB_CLUSTERS_ORACLE,
    tags=("X3", "dedup", "vectors", "graph"),
)
def x5_embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup → connected components → canonical (min-id)
    cluster per vector: the pick-one-representative step of embedding
    dedup, composed from the bucketed RP-LSH pair generator and the
    star/union-find clusterer (both individually oracle-checked). At scale
    this is the plan that turns 'pairs' into 'rows to drop'.

    Round 5: runs at the PRODUCTION near-dup threshold (cosine ≥ 0.9) over
    the hi-sim frame, like the `_hi` pair query — the 0.45-threshold form
    it replaced held its exact oracle only because missed LSH edges
    happened never to disconnect a component (the same fixture accident
    that retired `x5_embedding_near_dup_lsh`'s oracle), and its
    transitive-closure oracle is infeasible on the ~14M qualifying pairs a
    realistic corpus has at 0.45. At 0.9 recall is structural and the edge
    set is the actual near-dup set.

    Round 7 (the round-5/6 verdicts' top ask): LSH parameters now SCALE
    WITH THE CORPUS via ``adaptive_rp_lsh_params`` — n_planes ∝ log₂ N so
    random-pair candidate volume stays linear (fixed 12×8 measured 23.4x
    at a 10x data step; Indyk–Motwani b ∝ log N is the textbook cure), and
    n_tables grows just enough that the expected missed-twin count over
    the WHOLE corpus stays ≤ 1e-3, keeping the exact transitive-closure
    oracle structurally safe at every SF. At driver SFs (N ≤ 2500) the
    parameters resolve to exactly the round-5 (12, 8), so small-SF plans
    and hashes are unchanged. The sizing input is the parquet metadata
    row count — O(#files), not a data scan.
    """
    from realestatedeals_spark.operators.dedup import duplicate_clusters_star
    from realestatedeals_spark.operators.similarity import (
        adaptive_rp_lsh_params,
        rp_lsh_near_duplicates,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    hi = _hi_sim_embeddings(emb)
    n_hi = emb.count() * 6 // 5  # base + every-5th twin; metadata-only count
    n_planes, n_tables = adaptive_rp_lsh_params(n_hi)
    pairs = rp_lsh_near_duplicates(
        hi, threshold=0.9, vec_col="v", n_planes=n_planes, n_tables=n_tables
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    return duplicate_clusters_star(pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


# ---------------------------------------------------------------------------
# X2 — exact duplicated-substring spans (the ExactSubstr pass of Lee et al.,
# "Deduplicating Training Data Makes Language Models Better", ACL 2022).
# The paper builds a corpus suffix array; the distributed re-expression is a
# rolling k-gram hash: hash every k=8-token window, a window is duplicated
# iff its hash occurs more than once in the corpus, and per document the
# duplicated windows merge (gaps-and-islands) into maximal verbatim spans.
# Output is the per-document span inventory — the rows a pipeline would use
# to strip repeated boilerplate rather than drop whole documents.
# ---------------------------------------------------------------------------

_X2_SUBSTR_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
kh AS (
  SELECT doc_id, len(t) AS n_tokens,
         unnest(list_transform(range(1, greatest(len(t) - 7, 0) + 1),
                i -> {'p': i, 'h': substr(md5(array_to_string(t[i:i+7], ' ')), 1, 16)})) AS s
  FROM toks),
k2 AS (SELECT doc_id, n_tokens, s.p AS p, s.h AS h FROM kh),
dup AS (SELECT h FROM k2 GROUP BY h HAVING count(*) > 1),
dp AS (SELECT doc_id, n_tokens, p FROM k2 JOIN dup USING (h)),
isl AS (
  SELECT doc_id, n_tokens, p,
         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 8
              THEN 0 ELSE 1 END AS brk
  FROM dp),
g AS (SELECT doc_id, n_tokens, p,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS gid FROM isl),
sp AS (SELECT doc_id, n_tokens, gid, min(p) AS p0, max(p) AS p1
       FROM g GROUP BY 1, 2, 3)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_dup_spans,
       CAST(sum(p1 - p0 + 8) AS BIGINT) AS dup_tokens,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(sum(p1 - p0 + 8) AS DOUBLE) / n_tokens AS dup_frac
FROM sp GROUP BY doc_id, n_tokens
"""


@register("x2_dup_substring_spans", oracle=_X2_SUBSTR_ORACLE, tags=("X2", "dedup", "substring"))
def x2_dup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring spans via rolling 8-gram hashes.

    Plan shape (one doc-keyed exchange feeds everything positional): tokenize
    → 8-gram hash per position (lead() over the doc window — the same
    single-sort trick as winnowing) → global hash-frequency groupBy (map-side
    partial agg; shuffle carries 16-hex-char hashes, never text) → equi-join
    positions back to the >1 hashes → per-doc gaps-and-islands merge
    (lag + running sum over the already-doc-keyed window) → span aggregate.

    100 TB: the hash-frequency table is the only corpus-proportional shuffle
    and it is the theoretical minimum for exact substring dedup (every window
    must be witnessed somewhere); the paper's suffix array has the same
    footprint with worse partitioning. The dup-hash join prunes to duplicated
    positions only — for a typical corpus (<5% dup) the islands stage is tiny.
    """
    from realestatedeals_spark.operators.dedup import dup_substring_spans

    return dup_substring_spans(load_table(spark, sf_dir, "documents"), k=8)


@register("x3_pq_topk", tags=("X3", "vectors", "approx"))
def x3_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: m=8 subspace codebooks (ks=16) trained with
    distributed Lloyd passes, base set encoded to 8 one-byte codes, ADC
    lookup-table scoring, exact rerank of the top 4k candidates. No SQL
    oracle (approximate by construction); planted-twin recall and the
    full-rerank==bruteforce degenerate case are asserted in
    tests/test_similarity.py."""
    from realestatedeals_spark.operators.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    # bounded query set (≤100 at any SF): the LUT frame is O(n_queries·m·ks)
    # and production retrieval has bounded concurrent queries — without the
    # cap the fixture's query count grows with the corpus and the measured
    # slope conflates corpus scaling with query-load scaling.
    queries = emb.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 10000))
    return pq_topk(emb, queries, k=5, m=8, ks=16, max_iter=3, rerank=4)


@register("x2_semdedup", tags=("X2", "dedup", "vectors"))
def x2_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means cluster embeddings, exact cosine only within
    clusters, connected components over the surviving pairs, keep min-id.
    Uses the _hi_sim_embeddings planted-twin corpus (cosine >= 0.999 twins
    against a ~0.52 natural ceiling) so the semantic-duplicate population
    is structural. No SQL oracle (k-means is iterative); planted-twin
    recall and the brute-force subset relation are pinned in
    tests/test_similarity.py."""
    from realestatedeals_spark.operators.dedup import duplicate_clusters_star
    from realestatedeals_spark.operators.similarity import semdedup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    hi = _hi_sim_embeddings(emb)
    # nlist scales with the corpus so cluster size (and with it the
    # within-cluster pair count) stays bounded ~500: fixed nlist measured
    # 12x at 10x data (pairs grow quadratically in cluster size), the
    # classic SemDeDup scaling knob. One count() action sizes the model —
    # the same cost class as the k-means training passes themselves.
    nlist = max(8, hi.count() // 500)
    pairs = semdedup_pairs(hi, threshold=0.9, nlist=nlist, max_iter=2, vec_col="v").select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    return duplicate_clusters_star(pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


# ---------------------------------------------------------------------------
# X2 — content-defined chunking (CDC). Fixed-size chunking breaks dedup
# the moment one word is inserted (every later chunk shifts); CDC draws
# boundaries from the CONTENT — here, after token i when
# md5(tok[i-1] || '|' || tok[i]) starts below '10' (P = 1/16, expected
# ~16-token chunks) — so an edit only redraws boundaries in its
# neighbourhood and every untouched chunk keeps its hash, which is what
# makes chunk-level dedup/delta-storage work on mutating corpora.
# md5-derived boundaries make the whole operator exactly replayable in
# SQL (the KMV trick); insertion-locality is pinned in
# tests/test_cdc_chunks.py.
# ---------------------------------------------------------------------------

_X2_CDC_ORACLE = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
toks AS (
  SELECT doc_id, u.i AS i, u.tok AS tok, u.boundary AS boundary
  FROM d, unnest(list_transform(range(1, len(ts) + 1), i -> struct_pack(
         i := i,
         tok := ts[i],
         boundary := CASE WHEN i > 1
                          AND substr(md5(ts[i-1] || '|' || ts[i]), 1, 2) < '10'
                          THEN 1 ELSE 0 END))) AS t(u)),
marked AS (
  SELECT doc_id, i, tok,
         sum(boundary) OVER (PARTITION BY doc_id ORDER BY i) AS chunk_idx
  FROM toks)
SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
       CAST(count(*) AS BIGINT) AS n_tokens,
       md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_md5
FROM marked GROUP BY doc_id, chunk_idx
"""


@register("x2_cdc_chunks", oracle=_X2_CDC_ORACLE, tags=("X2", "dedup", "chunking"))
def x2_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunks per document: boundary positions, sizes, and
    chunk hashes.

    Scale shape: one doc-keyed exchange feeds everything positional (the
    winnowing trick) — lag, running boundary sum, and the chunk group-by
    all share the (doc_id, i) sort; the shuffle carries tokens once. The
    expected chunk size is set by the boundary probability alone, so the
    operator has no corpus-size-dependent parameter to retune at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i0", "tok")
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "tok")
    w = W.partitionBy("doc_id").orderBy("i")
    marked = toks.withColumn("prev", F.lag("tok").over(w)).withColumn(
        "boundary",
        F.when(
            F.col("prev").isNotNull()
            & (F.substring(F.md5(F.concat_ws("|", "prev", "tok")), 1, 2) < "10"),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    chunked = marked.withColumn("chunk_idx", F.sum("boundary").over(w))
    return (
        chunked.groupBy("doc_id", F.col("chunk_idx").cast("int").alias("chunk_idx"))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("i"), F.col("tok")))
                        ),
                        lambda s: s["tok"],
                    ),
                    " ",
                )
            ).alias("chunk_md5"),
        )
    )
