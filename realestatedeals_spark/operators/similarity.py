"""Vector similarity search (SURVEY.md §2b X3).

Brute-force cosine top-k is the exactness baseline (plans/llm_vectors.py);
this module adds the scale paths:

- ``cosine_pairs``      — all-pairs above a threshold (embedding near-dup)
- ``rp_lsh_topk``       — random-hyperplane LSH bucketing + exact re-rank:
                          the candidate set shrinks from N to the probed
                          buckets; recall is tunable via n_planes/n_probe.

Hyperplanes are generated from a fixed seed on the driver and broadcast as
literals, so results are deterministic across runs and partitionings.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from realestatedeals_spark.util import TRAINER_CACHE as _TRAINER_CACHE
from realestatedeals_spark.util import free_local_checkpoint
from realestatedeals_spark.util import trainer_cache_key as _trainer_key


def dot(a: F.Column, b: F.Column) -> F.Column:
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


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def cosine_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup dedup).

    Brute force O(N²) — correct baseline for oracle checks; at scale use
    ``rp_lsh_topk``-style bucketing first.
    """
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def gemm_cosine_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    chunk_rows: int = 4096,
) -> DataFrame:
    """All pairs with cosine ≥ threshold — the SAME exact result as
    ``cosine_pairs`` via the blocked-GEMM physical strategy (the all-pairs
    sibling of ``plans.llm_vectors.gemm_cosine_topk``).

    The corpus is hash-split into ⌈N/chunk_rows⌉ chunks; each chunk is
    collected + broadcast as a numpy matrix and every corpus partition
    scores itself against it with one vectorized multiply-add sweep per
    dimension. A pair (x, y) is emitted exactly once — by the iteration
    whose broadcast chunk contains min(x, y) — so no distinct/dedup pass is
    needed. Driver memory is O(chunk_rows·dim); the corpus is rescanned
    once per chunk (persist upstream when N ≫ chunk_rows).

    Bit-exactness with the SQL oracle: products accumulate
    dimension-by-dimension (vectorized over the pair axis, sequential over
    dims) — the same left-to-right double addition as F.aggregate / DuckDB,
    and cos = dot / (√‖a‖² · √‖b‖²) in the same operation order. Still
    O(N²) work by definition (it is the exactness anchor, not the scale
    path — that's RP-LSH / SemDeDup), but the constant is numpy's, not a
    per-row expression interpreter's: ~50× over the zip_with join form.
    """
    import math

    import pandas as pd

    spark = emb.sparkSession
    base = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    n = base.count()
    if n == 0:
        return spark.createDataFrame([], "id_a long, id_b long, cosine double")
    n_chunks = math.ceil(n / chunk_rows)

    partials = []
    for chunk in range(n_chunks):
        chunk_df = base if n_chunks == 1 else base.filter(
            F.pmod(F.xxhash64(F.col("_id")), F.lit(n_chunks)) == chunk
        )
        rows = chunk_df.collect()
        if not rows:
            continue
        cids = np.array([r["_id"] for r in rows], dtype=np.int64)
        cm = np.array([r["_v"] for r in rows], dtype=np.float64)
        cn = np.zeros(len(cids))
        for d in range(cm.shape[1]):
            cn += cm[:, d] * cm[:, d]
        cn = np.sqrt(cn)
        bq = spark.sparkContext.broadcast((cids, cm, cn))

        def part(batches, _bq=bq):
            cids, cm, cn = _bq.value
            for pdf in batches:
                if pdf.empty:
                    continue
                nid = pdf["_id"].to_numpy(dtype=np.int64)
                e = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                acc = np.zeros((len(nid), len(cids)))
                en = np.zeros(len(nid))
                for d in range(e.shape[1]):
                    ed = e[:, d]
                    acc += np.outer(ed, cm[:, d])
                    en += ed * ed
                cos = acc / (np.sqrt(en)[:, None] * cn[None, :])
                # emit once per unordered pair: broadcast id strictly lower
                lo = cids[None, :] < nid[:, None]
                keep = lo & (cos >= threshold)
                bi, ci = np.nonzero(keep)
                yield pd.DataFrame(
                    {
                        "id_a": cids[ci],
                        "id_b": nid[bi],
                        "cosine": cos[bi, ci],
                    }
                )

        partial = base.mapInPandas(part, schema="id_a long, id_b long, cosine double")
        if n_chunks > 1:
            partial = partial.localCheckpoint(eager=True)
            bq.destroy()
        partials.append(partial)

    merged = partials[0]
    for p in partials[1:]:
        merged = merged.unionByName(p)
    return merged


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def adaptive_rp_lsh_params(
    n: int,
    ref_n: int = 2500,
    base_planes: int = 12,
    base_tables: int = 8,
    p_twin: float = 0.985,
    corpus_miss: float = 1e-3,
) -> tuple[int, int]:
    """Corpus-size-aware (n_planes, n_tables) for high-threshold RP-LSH.

    Fixed LSH parameters are asymptotically quadratic: with b planes a
    random pair survives one table w.p. p_r^b (p_r = per-plane agreement),
    so candidate volume is Θ(N² · L · p_r^b) — at fixed b it grows 100× per
    10× data (the 23.4x slope the round-6 verdict flagged on
    ``x5_embedding_dedup_clusters``). The standard cure (Indyk–Motwani:
    choose b ∝ log N) keeps per-bucket occupancy constant:

    - ``n_planes = base_planes + ceil(2.5 · log2(N / ref_n))`` — 2.5 bits
      per doubling drives random-pair survival down by ≥ p_r^2.5 per 2×
      data for any p_r ≤ 0.76, i.e. candidates grow sub-linearly even for
      adversarially correlated corpora (typical text embeddings have
      p_r ≈ 0.5–0.7 for non-duplicate pairs).
    - ``n_tables`` grows just enough to keep near-duplicate recall
      *structural*: a twin with per-plane agreement ≥ ``p_twin`` (cosine
      ≥ 0.999 ⇒ θ ≤ 0.045 ⇒ p ≥ 1 − θ/π ≈ 0.9858) misses one table w.p.
      m = 1 − p_twin^b; tables are set so the EXPECTED number of missed
      twins in the whole corpus stays ≤ ``corpus_miss`` (per-twin miss
      ≤ corpus_miss / (N/6), with N/6 ≈ the planted-twin count of the
      _hi_sim fixture — an overestimate of real twin density, hence
      conservative).

    Cost is Θ(N · n_tables) bucket rows + Θ(N) candidates — linear with a
    log factor, the 100 TB formulation. At n ≤ ref_n this returns exactly
    (base_planes, base_tables), so small-SF oracle runs are byte-identical
    to the fixed-parameter plan.
    """
    import math

    growth = max(1.0, n / float(ref_n))
    b = base_planes + max(0, math.ceil(2.5 * math.log2(growth)))
    b = min(b, 62)  # bucket key is packed into one signed long
    miss1 = 1.0 - p_twin**b
    n_twins = max(1.0, n / 6.0)
    per_twin = corpus_miss / n_twins
    tables = math.ceil(math.log(per_twin) / math.log(miss1)) if miss1 > 0 else 1
    return b, max(base_tables, tables)


def rp_lsh_candidate_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 16,
    seed: int = 42,
    bucket_cap: int | None = None,
) -> DataFrame:
    """RP-LSH candidate pairs (id_a < id_b, distinct): a pair is a candidate
    iff it shares the sign-bucket of ANY of the ``n_tables`` independent
    hyperplane sets (OR-amplification). Exposed separately so pruning can be
    measured directly — candidate count vs N(N−1)/2 is THE scale number for
    this operator (asserted in tests/test_similarity.py).

    ``bucket_cap=K`` bounds each (table, bucket)'s membership to its K
    lowest-id vectors BEFORE the pair join explodes, making total candidate
    volume ≤ n_tables · 2^n_planes · K²/2 — CONSTANT in corpus size. This
    is the cap-with-accounting seam for weak-threshold demos whose buckets
    are quadratically occupied by construction (see
    rp_lsh_near_duplicates' max_pairs path); the members dropped are
    counted and logged, never silently discarded. The cap trades recall
    deterministically (keeps lowest ids); production configurations size
    n_planes so buckets stay small instead (adaptive_rp_lsh_params)."""
    import pandas as pd

    # All n_tables × n_planes sign bits in one vectorized sweep per Arrow
    # batch (one (batch × dim) @ (dim × T·P) matmul). The column-expression
    # form (rp_bucket per table) builds T·P aggregate expressions over
    # dim-literal arrays — the planner, not the executors, becomes the
    # bottleneck (same lesson as _best_cells).
    flat_planes = np.stack(
        [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    ).reshape(n_tables * n_planes, dim)

    def bucketize(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["_id"].to_numpy()
            e = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            bits = (e @ flat_planes.T > 0).reshape(len(ids), n_tables, n_planes)
            keys = (bits.astype(np.int64) << np.arange(n_planes)).sum(axis=2)
            yield pd.DataFrame(
                {
                    "_id": np.repeat(ids, n_tables),
                    "tbl": np.tile(np.arange(n_tables, dtype=np.int32), len(ids)),
                    "bucket": keys.reshape(-1),
                }
            )

    # materialized once — it feeds BOTH sides of the candidate self-join
    keyed = (
        emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("v"))
        .mapInPandas(bucketize, schema="_id long, tbl int, bucket long")
        .localCheckpoint(eager=True)
    )
    if bucket_cap is not None:
        wb = W.partitionBy("tbl", "bucket").orderBy("_id")
        capped = (
            keyed.withColumn("_rk", F.row_number().over(wb))
            .filter(F.col("_rk") <= bucket_cap)
            .drop("_rk")
            .localCheckpoint(eager=True)
        )
        # Both frames are eager checkpoints, so the drop accounting is two
        # metadata-cheap counts — not a second run of the window job.
        dropped = keyed.count() - capped.count()
        if dropped:
            import logging

            logging.getLogger(__name__).warning(
                "rp_lsh_candidate_pairs: bucket_cap=%d dropped %d "
                "(table, bucket) memberships before pair generation — "
                "candidate volume is bounded at %d pairs; recall loss is "
                "deterministic (lowest ids kept)",
                bucket_cap, dropped,
                n_tables * (2 ** n_planes) * bucket_cap * (bucket_cap - 1) // 2,
            )
        free_local_checkpoint(keyed)  # capped is self-contained now
        keyed = capped
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def rp_lsh_near_duplicates(
    emb: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 16,
    seed: int = 42,
    max_pairs: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs via multi-table RP-LSH candidates + exact
    cosine verify — the bucketed mirror of ``minhash_near_duplicates``.

    Candidate generation: see ``rp_lsh_candidate_pairs``. Every candidate is
    exact-verified, so false positives are impossible; recall is
    1 − (1 − p^b)^L with p = 1 − θ/π. The shuffle carries only
    (id, table, bucket) longs plus the candidate pairs — never a cross
    product — and bucket skew is bounded by 2^n_planes fan-out per table.

    Parameter honesty: near the default threshold 0.45 (θ ≈ 63°, p ≈ 0.65)
    the LSH gap is weak — recall-safe settings (4 planes × 16 tables) keep
    roughly 2/3 of all pairs as candidates, so pruning is modest. At real
    production near-dup thresholds (cosine ≥ 0.9, p ≈ 0.9) the same
    construction prunes aggressively — 12 planes × 8 tables keeps ~0.2% of
    random pairs (measured: x5_embedding_near_dup_lsh_hi) — raise
    ``n_planes`` (and trim ``n_tables``) as the threshold rises.

    Output: id_a, id_b, cosine (rounded to 6), matching ``cosine_pairs``.
    """
    import pandas as pd

    # Cap-with-accounting AHEAD of the verify join (round 11 — the round-10
    # cap bounded the OUTPUT but still cosine-verified every candidate:
    # 130M exact cosines at gen sf1.0 for a 2M-pair demo). A weak threshold
    # needs few planes, so buckets are quadratically occupied by
    # construction; ``max_pairs`` becomes a CANDIDATE budget, realized as a
    # per-(table, bucket) membership cap K with
    # n_tables · 2^n_planes · K²/2 ≤ max_pairs — candidate volume, verify
    # volume, and output are all bounded by max_pairs CONSTANT in corpus
    # size, and the dropped memberships are logged inside
    # rp_lsh_candidate_pairs. Precision stays exact (every emitted pair is
    # cosine-verified); the cap trades recall, deterministically and
    # audibly. Fixture buckets sit far under K, so oracle sweeps are
    # unchanged — see SCALE.md "Banded-LSH threshold guidance" for why the
    # production answer is a higher threshold, not a bigger budget.
    bucket_cap = None
    if max_pairs is not None:
        bucket_cap = max(
            2, int((2 * max_pairs / (n_tables * 2 ** n_planes)) ** 0.5)
        )
        # With the un-floored cap K ≥ 2, candidates ≤ T·2^p·K(K−1)/2 ≤
        # max_pairs, so the output bound holds for free. When the budget is
        # so small the floor of 2 engaged (max_pairs < 2·T·2^p), candidate
        # volume is still bounded at T·2^p pairs but may exceed max_pairs —
        # that tiny residue is re-capped after verify below, keeping
        # max_pairs a HARD output contract for every budget.
        cand_bound = n_tables * (2 ** n_planes) * bucket_cap * (bucket_cap - 1) // 2
    cand = rp_lsh_candidate_pairs(
        emb, id_col=id_col, vec_col=vec_col, dim=dim,
        n_planes=n_planes, n_tables=n_tables, seed=seed, bucket_cap=bucket_cap,
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    joined = cand.join(va, "id_a").join(vb, "id_b")

    # Vectorized exact verify: one fused sweep per Arrow batch instead of
    # three interpreted higher-order aggregates per pair. Dimension-by-
    # dimension accumulation (vectorized over pairs, sequential over dims)
    # keeps the double adds in the same left-to-right order as F.aggregate /
    # DuckDB list_reduce, so results stay bit-identical to cosine_pairs.
    def verify(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            va_ = np.stack(pdf["va"].to_numpy()).astype(np.float64)
            vb_ = np.stack(pdf["vb"].to_numpy()).astype(np.float64)
            acc = np.zeros(len(va_))
            na = np.zeros(len(va_))
            nb = np.zeros(len(va_))
            for d in range(va_.shape[1]):
                acc += va_[:, d] * vb_[:, d]
                na += va_[:, d] * va_[:, d]
                nb += vb_[:, d] * vb_[:, d]
            out = pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy(),
                    "id_b": pdf["id_b"].to_numpy(),
                    "cosine": acc / (np.sqrt(na) * np.sqrt(nb)),
                }
            )
            yield out[out["cosine"] >= threshold]

    pairs = joined.mapInPandas(verify, schema="id_a long, id_b long, cosine double")
    if max_pairs is not None and cand_bound > max_pairs:
        # Floored-cap budgets only (max_pairs < 2·n_tables·2^n_planes): the
        # verified set is ≤ n_tables·2^n_planes rows here, so the eager
        # checkpoint + count + TakeOrdered are all trivially cheap.
        pairs = pairs.localCheckpoint(eager=True)
        total = pairs.count()
        if total > max_pairs:
            import logging

            logging.getLogger(__name__).warning(
                "rp_lsh_near_duplicates: output capped at %d of %d verified "
                "pairs (%d dropped) — budget below the bucket-cap floor "
                "(max_pairs < 2·n_tables·2^n_planes)",
                max_pairs, total, total - max_pairs,
            )
            capped_out = (
                pairs.orderBy(F.desc("cosine"), "id_a", "id_b")
                .limit(max_pairs)
                .localCheckpoint(eager=True)
            )
            free_local_checkpoint(pairs)
            return capped_out
    return pairs


# ---------------------------------------------------------------------------
# Oracle-restatable sign-LSH: Rademacher (±1) hyperplanes from integer
# arithmetic, so the SAME banding can be written in ANSI SQL.
# ---------------------------------------------------------------------------

# Two-round integer mixer, BIGINT-safe (every intermediate < 2^63, all values
# non-negative, so // and % behave identically in numpy int64 and SQL BIGINT).
# Keep these four constants in sync with the `sgn` CTE of any oracle that
# mirrors the banding (plans/retrieval.py x9_rerank_mmr).
_RMX_MULT = 2654435761          # Knuth multiplicative-hash constant
_RMX_TP = 2246822519            # xxhash prime #2
_RMX_ADD = 3266489917           # xxhash prime #3
_RMX_FOLD = 2147483648          # 2^31: high/low fold boundary


def rademacher_planes(dim: int, n_total: int) -> np.ndarray:
    """``n_total`` ±1 LSH hyperplanes from a deterministic integer mixer —
    Charikar sign-LSH with Rademacher entries instead of gaussians.

    Why not ``np.random.randn`` like ``_hyperplanes``: these planes are
    restatable in portable SQL integer arithmetic (two mod-2^31 multiply +
    high/low XOR-fold rounds, bit 16 → sign), so a DuckDB oracle can mirror
    the banding EXACTLY and an ANN-candidate plan stays hash-checkable
    end-to-end instead of rows-only. Rademacher directions obey the same
    sign-collision law P[agree] = 1 − θ/π in expectation over planes (they
    are not rotation-invariant, but balance/independence are empirically
    equivalent at dim ≥ 64: mean |Σ signs| ≈ 7.4 of 64, max inter-plane
    |corr| 0.5 — same as gaussian draws; see tests/test_similarity.py).

    Indices are 1-based on both axes so the SQL twin can use
    ``range(1, dim+1)`` / ``range(1, n_total+1)`` directly.
    """
    tp = np.arange(1, n_total + 1, dtype=np.int64)[:, None]
    i = np.arange(1, dim + 1, dtype=np.int64)[None, :]
    x0 = i * _RMX_MULT + tp * _RMX_TP + _RMX_ADD
    x1 = (x0 % _RMX_FOLD) ^ (x0 // _RMX_FOLD)
    x2 = x1 * _RMX_MULT
    x3 = (x2 % _RMX_FOLD) ^ (x2 // _RMX_FOLD)
    return (1 - 2 * ((x3 // 65536) % 2)).astype(np.float64)


def rademacher_bucketize(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int,
    n_tables: int,
    id_out: str = "_id",
) -> DataFrame:
    """(id, tbl, bucket) rows — one row per input vector per LSH table, with
    ``bucket`` the ``n_planes``-bit sign pattern against the Rademacher
    planes (plane index tp = tbl·n_planes + p + 1, bit p → 1 << p).

    Sign-exactness contract (ADVICE r11): the oracle's SQL twin sums the
    per-dim products LEFT-TO-RIGHT in float64, and a BLAS matmul's pairwise
    summation could disagree with that order on a dot within rounding noise
    of zero. Only the SIGN of each dot is consumed, so the r12 dim-by-dim
    loop (which de-vectorized the hot Arrow stage to dim numpy calls per
    batch — driver-measured 0.55×/0.79× on x9_rerank_mmr /
    x5_embedding_near_dup_lsh_hi) is overkill for every dot that is not
    razor-close to zero. Instead: ONE float64 matmul, then re-run the exact
    sequential accumulation ONLY for rows whose |dot| falls within the
    worst-case summation-error bound of zero. Any float64 summation tree of
    n terms t_k satisfies |ŝ − Σt_k| ≤ (n−1)·u·Σ|t_k| (u = 2⁻⁵³), the
    products e_d·(±1) are exact, so matmul and sequential results differ by
    at most 2(n−1)·u·Σ|e_d|; outside the (4×-padded) bound the matmul sign
    IS the sequential sign, inside it the sequential value is used
    verbatim. Output bit-identical to the sequential loop by construction;
    the fallback fires only on adversarially-near-zero dots (never on the
    fixtures — pinned by tests/test_similarity.py)."""
    import pandas as pd

    planes = rademacher_planes(dim, n_tables * n_planes)

    def bucketize(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["_id"].to_numpy()
            e = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            acc = e @ planes.T
            err_bound = (4.0 * e.shape[1] * np.finfo(np.float64).eps) * np.abs(
                e
            ).sum(axis=1, keepdims=True)
            unsafe_rows = np.nonzero((np.abs(acc) <= err_bound).any(axis=1))[0]
            if unsafe_rows.size:
                esub = e[unsafe_rows]
                sub = np.zeros((unsafe_rows.size, planes.shape[0]))
                for d in range(esub.shape[1]):
                    sub += esub[:, d : d + 1] * planes[:, d]
                acc[unsafe_rows] = sub
            bits = (acc > 0).reshape(len(ids), n_tables, n_planes)
            keys = (bits.astype(np.int64) << np.arange(n_planes)).sum(axis=2)
            yield pd.DataFrame(
                {
                    id_out: np.repeat(ids, n_tables),
                    "tbl": np.tile(np.arange(n_tables, dtype=np.int32), len(ids)),
                    "bucket": keys.reshape(-1),
                }
            )

    return df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("v")
    ).mapInPandas(bucketize, schema=f"{id_out} long, tbl int, bucket long")


def rp_lsh_query_candidates(
    base: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 16,
) -> DataFrame:
    """Query→corpus ANN candidates: (query_id, neighbor_id) pairs sharing at
    least one table bucket under the Rademacher sign-LSH, self-pairs
    excluded. The candidate stage for rerank pipelines (x9_rerank_mmr):
    corpus and query sides are bucketized once (N·T + Q·T long rows), the
    query side is broadcast, and only bucket-mates are ever scored — never
    an N×Q cross product.

    Regime honesty (mirrors rp_lsh_near_duplicates' note): rerank
    candidates live at MODERATE similarity (fixture top-8 neighbors sit at
    cosine 0.56–0.66, per-plane agreement ≈ 0.73), where the LSH gap is
    inherently weaker than near-dup thresholds. The defaults (8 planes × 16
    tables) measure ~10% of the corpus as candidates at 0.75 mean top-8
    recall on the generated corpus — a 10× verify cut; raise n_planes and
    n_tables together to trade bucket volume for recall at higher N."""
    bk = rademacher_bucketize(
        base, id_col, vec_col, dim, n_planes, n_tables, id_out="neighbor_id"
    )
    qk = rademacher_bucketize(
        queries, id_col, vec_col, dim, n_planes, n_tables, id_out="query_id"
    )
    return (
        bk.join(F.broadcast(qk), on=["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )


def rp_bucket(vec: F.Column, planes: list[list[float]]) -> F.Column:
    """Sign pattern of the vector against each hyperplane → one long key."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(w) for w in plane]),
                    lambda x, wcol: x.cast("double") * wcol,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def rp_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    probe_bits: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing the query's RP bucket
    OR any bucket within ``probe_bits`` bit flips (multi-probe LSH), then
    exact cosine re-rank within candidates.

    Recall/candidate tradeoff: for a neighbor at angle θ the per-plane
    agreement is p = 1 − θ/π; recall ≈ P(Binom(n_planes, 1−p) ≤ probe_bits).
    High-similarity neighbors (cos ≥ 0.9) are found w.p. ≳0.95 at the
    defaults; at scale, raise n_planes so buckets stay small and add probes
    to buy recall back.

    Output: query_id, neighbor_id, rk, cosine — same shape as the
    brute-force baseline so recall can be measured against it.
    """
    from itertools import combinations

    planes = _hyperplanes(dim, n_planes, seed)
    base = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vn"),
        rp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("vq"),
        rp_bucket(F.col(vec_col), planes).alias("qbucket"),
    )
    # multi-probe: query bucket + all buckets within probe_bits flips
    masks = [0]
    for nbits in range(1, probe_bits + 1):
        for idxs in combinations(range(n_planes), nbits):
            masks.append(sum(1 << i for i in idxs))
    probes = qb.select(
        "query_id",
        "vq",
        F.explode(
            F.array(*[F.col("qbucket").bitwiseXOR(F.lit(m).cast("long")) for m in masks])
        ).alias("bucket"),
    )
    cand = probes.join(base, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id", "neighbor_id", cosine(F.col("vq"), F.col("vn")).alias("cosine")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk", F.round("cosine", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse k-means quantizer + nprobe list search.
# ---------------------------------------------------------------------------


def _centroid_frame(spark, cents: list[list[float]]):
    from realestatedeals_spark.util import inline_frame

    return inline_frame(
        spark,
        ["cell", "centroid"],
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
    )


def _dot_cols(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _best_cells(vecs: DataFrame, cent_df: DataFrame, n: int, id_out: str) -> DataFrame:
    """Top-n centroid cells per vector (score = dot, ties by lower cell id).

    Vectorized fused sweep (round 11): the centroid frame is k rows, so it
    rides a plain broadcast and each Arrow batch scores all k cells with a
    DIM-BY-DIM accumulation — float adds replay the old higher-order
    aggregate's left-to-right order bit-exactly, so assignments (and every
    rows-only trainer downstream) are unchanged while the per-(vector,
    cell) interpreted-aggregate cost disappears (x3_ivf_topk /
    x2_semdedup / x3_pq_topk were the last >60 engine-s training-at-build
    entries at gen sf1.0). Input columns pass through; ``cell`` appended;
    n > 1 emits one row per kept cell in rank order."""
    from pyspark.sql import types as T

    spark = vecs.sparkSession
    rows = cent_df.collect()
    order = sorted(range(len(rows)), key=lambda i: rows[i]["cell"])
    cells = np.array([rows[i]["cell"] for i in order], dtype=np.int64)
    cm = np.array([list(rows[i]["centroid"]) for i in order], dtype=np.float64)
    bc = spark.sparkContext.broadcast((cells, cm))
    kk = min(n, len(cells))
    out_schema = T.StructType(
        list(vecs.schema.fields) + [T.StructField("cell", T.IntegerType())]
    )

    def pick(batches):
        cells_, cm_ = bc.value
        dim = cm_.shape[1]
        for pdf in batches:
            if pdf.empty:
                continue
            v = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            s = np.zeros((len(v), len(cells_)))
            for d in range(dim):
                s += np.outer(v[:, d], cm_[:, d])
            # (s desc, cell asc): cells_ sorted ascending + stable argsort
            idx = np.argsort(-s, axis=1, kind="stable")[:, :kk]
            out = pdf.loc[pdf.index.repeat(kk)].reset_index(drop=True)
            out["cell"] = cells_[idx].reshape(-1).astype(np.int32)
            yield out

    return vecs.mapInPandas(pick, schema=out_schema)


# Deterministic-trainer memo: kmeans_lite / pq_train are pure functions of
# (input frame, params) — seed-free init, fixed iterations — so repeated
# runs in one session (bench best-of-3, multiple queries sharing a
# quantizer) retrain for nothing. Keying (incl. the input-file stat
# fingerprint that guards against same-path data regeneration) lives in
# util.trainer_cache_key; values are deep-copied on the way out so a
# caller mutating its result cannot poison the cache.
def kmeans_lite(
    emb: DataFrame,
    k: int = 16,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd k-means on unit-normalized vectors.

    Init is the k lowest-id vectors (seed-free, rerun-stable). Each iteration
    is one distributed pass: every vector scores the broadcast centroid frame
    (k rows), keeps its argmax cell, and new centroids come back as the
    (k × dim)-row posexplode mean — tiny at any data scale. Centroids
    (k × dim floats) are model state and live on the driver; the data never
    leaves executors. At 100 TB, train on a sampled fraction
    (``emb.sample(...)``) — the quantizer only needs the density shape.
    """
    key = ("kmeans_lite", _trainer_key(emb, k, max_iter, id_col, vec_col))
    hit = _TRAINER_CACHE.get(key)
    if hit is not None:
        return [list(c) for c in hit]
    spark = emb.sparkSession
    norm = emb.select(
        F.col(id_col).alias("_id"),
        F.transform(vec_col, lambda x: x.cast("double") / l2norm(F.col(vec_col))).alias("v"),
    ).cache()
    cents = [r["v"] for r in norm.orderBy("_id").limit(k).collect()]
    for _ in range(max_iter):
        assigned = _best_cells(norm, _centroid_frame(spark, cents), 1, "_id").select(
            F.col("cell").alias("cluster"), "v"
        )
        means = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = {c: dict() for c in {r["cluster"] for r in means}}
        for r in means:
            new[r["cluster"]][r["pos"]] = r["m"]
        for i in range(len(cents)):
            if i in new:
                vec = [new[i][p] for p in sorted(new[i])]
                n = sum(x * x for x in vec) ** 0.5 or 1.0
                cents[i] = [x / n for x in vec]
    norm.unpersist()
    _TRAINER_CACHE[key] = [list(c) for c in cents]
    return cents


def adaptive_ivf_params(
    n: int, ref_n: int = 2500, base_nlist: int = 16, base_nprobe: int = 4
) -> tuple[int, int]:
    """Corpus-size-aware (nlist, nprobe) for IVF: nlist ∝ √N — the
    textbook IVF operating point balancing the assignment cost (N·nlist)
    against the probe cost (nprobe·N/nlist per query) so per-query work is
    O(√N) instead of O(N); with queries ∝ N this turns the total from
    quadratic to N^1.5 (the same class of fix as ``adaptive_rp_lsh_params``
    for the banded-LSH pair queries, round-7 verdict task #1). nprobe
    holds at its base: twins/near-dups land in the same cell regardless of
    cell count, so planted-neighbor recall is cell-count-invariant, and
    the recall-at-scale pytest pins exactly that. Identity at N ≤ ref_n so
    driver-SF behavior is unchanged."""
    import math

    growth = max(1.0, n / float(ref_n))
    return max(base_nlist, round(base_nlist * math.sqrt(growth))), base_nprobe


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k cosine: assign base vectors to nlist k-means
    cells, probe the nprobe best cells per query, exact-rerank inside them.

    Scale path: the cell assignment is an equi-join key, so the candidate
    join shuffles only (queries × nprobe) probe rows against cell-partitioned
    inverted lists — candidate count ≈ N × nprobe / nlist per query instead
    of N. recall@k rises with nprobe/nlist; nprobe = nlist degenerates to
    exact brute force.

    Output: query_id, neighbor_id, rk, cosine — comparable to rp_lsh_topk
    and the brute-force baseline.
    """
    spark = emb.sparkSession
    cents = kmeans_lite(emb, k=nlist, max_iter=max_iter, id_col=id_col, vec_col=vec_col)
    cent_df = _centroid_frame(spark, cents)

    def normed(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(f"raw_{out_id}"),
            F.transform(vec_col, lambda x: x.cast("double") / l2norm(F.col(vec_col))).alias("v"),
        )

    base = _best_cells(normed(emb, "neighbor_id"), cent_df, 1, "neighbor_id").select(
        "neighbor_id", F.col("raw_neighbor_id").alias("vn"), "cell"
    )
    probes = _best_cells(normed(queries, "query_id"), cent_df, nprobe, "query_id").select(
        "query_id", F.col("raw_query_id").alias("vq"), "cell"
    )
    cand = probes.join(base, "cell").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id", "neighbor_id", cosine(F.col("vq"), F.col("vn")).alias("cosine")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk", F.round("cosine", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN — subspace k-means codebooks + ADC scan.
# ---------------------------------------------------------------------------


def _subvector_frame(vecs: DataFrame, m: int, subdim: int, id_out: str) -> DataFrame:
    """(id, sub, subv) — each unit-normalized vector split into m contiguous
    subvectors, one row per subspace. Built as array expressions inside the
    scan; the explode multiplies rows by m, not data volume (subvectors
    partition the original floats)."""
    subs = F.array(
        *[F.slice("v", s * subdim + 1, subdim) for s in range(m)]
    )
    return vecs.select(F.col("_id").alias(id_out), F.posexplode(subs).alias("sub", "subv"))


def _pq_codebooks_frame(spark, books: list[list[list[float]]]):
    from realestatedeals_spark.util import inline_frame

    rows = [
        (s, c, [float(x) for x in cent])
        for s, book in enumerate(books)
        for c, cent in enumerate(book)
    ]
    return inline_frame(spark, ["sub", "cell", "centroid"], rows)


def _pq_assign(subv_df: DataFrame, book_df: DataFrame, id_col: str) -> DataFrame:
    """Nearest centroid per (vector, subspace) under L2: argmin ||x-c||² =
    argmin (||c||² − 2·x·c), ties to the lower cell id.

    Vectorized like ``_best_cells`` (round 11): the m·ks-row codebook rides
    a broadcast; each Arrow batch computes x·c dim-by-dim against its own
    subspace's codebook slice (float order identical to the old
    higher-order aggregates, so assignments are bit-unchanged) — no join
    fan-out, no min_by shuffle over ks rows per (vector, subspace)."""
    import pandas as pd
    from pyspark.sql import types as T

    spark = subv_df.sparkSession
    rows = book_df.collect()
    by_sub: dict[int, list] = {}
    for r in rows:
        by_sub.setdefault(int(r["sub"]), []).append(r)
    books_c, books_m, books_cd = {}, {}, {}
    for s, rs in by_sub.items():
        rs = sorted(rs, key=lambda r: r["cell"])
        books_c[s] = np.array([r["cell"] for r in rs], dtype=np.int64)
        cm = np.array([list(r["centroid"]) for r in rs], dtype=np.float64)
        books_m[s] = cm
        # ||c||² with the aggregate's left-to-right accumulation
        cd = np.zeros(len(rs))
        for d in range(cm.shape[1]):
            cd += cm[:, d] * cm[:, d]
        books_cd[s] = cd
    bb = spark.sparkContext.broadcast((books_c, books_m, books_cd))
    id_field = subv_df.schema[id_col]
    out_schema = T.StructType(
        [id_field, T.StructField("sub", T.IntegerType()), T.StructField("cell", T.IntegerType())]
    )

    def assign(batches):
        books_c_, books_m_, books_cd_ = bb.value
        for pdf in batches:
            if pdf.empty:
                continue
            for s, grp in pdf.groupby("sub", sort=False):
                cells_ = books_c_[int(s)]
                cm = books_m_[int(s)]
                cd = books_cd_[int(s)]
                x = np.stack(grp["subv"].to_numpy()).astype(np.float64)
                xc = np.zeros((len(x), len(cells_)))
                for d in range(cm.shape[1]):
                    xc += np.outer(x[:, d], cm[:, d])
                d2 = cd[None, :] - 2.0 * xc
                # (d2 asc, cell asc): cells ascending + stable argsort
                best = np.argsort(d2, axis=1, kind="stable")[:, 0]
                yield pd.DataFrame(
                    {
                        id_col: grp[id_col].to_numpy(),
                        "sub": np.full(len(x), int(s), dtype=np.int32),
                        "cell": cells_[best].astype(np.int32),
                    }
                )

    return subv_df.mapInPandas(assign, schema=out_schema)


def pq_train(
    emb: DataFrame,
    m: int = 8,
    ks: int = 16,
    max_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train m per-subspace codebooks of ks centroids each (Jégou et al.,
    TPAMI'11) with deterministic Lloyd iterations.

    Model state on the driver is m·ks·(dim/m) = ks·dim floats — constant in
    corpus size; every iteration is ONE distributed pass over the exploded
    subvector frame (assign via broadcast codebook join, update via
    posexplode mean). Init = subvectors of the ks lowest-id vectors
    (seed-free, rerun-stable). At 100 TB, train on ``emb.sample(...)`` —
    the codebooks only need the marginal subspace densities.
    """
    key = ("pq_train", _trainer_key(emb, m, ks, max_iter, id_col, vec_col))
    hit = _TRAINER_CACHE.get(key)
    if hit is not None:
        return [[list(c) for c in b] for b in hit]
    spark = emb.sparkSession
    dim_row = emb.select(F.size(vec_col).alias("d")).first()
    subdim = dim_row["d"] // m
    norm = emb.select(
        F.col(id_col).alias("_id"),
        F.transform(vec_col, lambda x: x.cast("double") / l2norm(F.col(vec_col))).alias("v"),
    )
    subv = _subvector_frame(norm, m, subdim, "_id").cache()
    try:
        seed_rows = (
            _subvector_frame(norm.orderBy("_id").limit(ks), m, subdim, "_id")
            .orderBy("_id", "sub")
            .collect()
        )
        books: list[list[list[float]]] = [[] for _ in range(m)]
        for r in seed_rows:
            books[r["sub"]].append([float(x) for x in r["subv"]])
        for _ in range(max_iter):
            assigned = _pq_assign(subv, _pq_codebooks_frame(spark, books), "_id")
            means = (
                subv.join(assigned, ["_id", "sub"])
                .select("sub", "cell", F.posexplode("subv").alias("pos", "x"))
                .groupBy("sub", "cell", "pos")
                .agg(F.avg("x").alias("mu"))
                .collect()
            )
            upd: dict[tuple[int, int], dict[int, float]] = {}
            for r in means:
                upd.setdefault((r["sub"], r["cell"]), {})[r["pos"]] = r["mu"]
            for (s, c), poss in upd.items():
                books[s][c] = [poss[p] for p in sorted(poss)]
        _TRAINER_CACHE[key] = [[list(c) for c in b] for b in books]
        return books
    finally:
        subv.unpersist()


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ks: int = 16,
    max_iter: int = 3,
    rerank: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ approximate top-k cosine: encode the base set as m uint8 codes
    (4–8 bits/subspace ⇒ ~8 bytes/vector instead of 256 for d=64 floats),
    score with asymmetric distance computation (ADC) — per query a LUT of
    m·ks exact subspace dots, approx cosine = sum of m table lookups — then
    exact-rerank the top rerank·k ADC candidates.

    Scale path: the ADC scan touches only the code column (32× smaller than
    raw vectors — the I/O win IS the point of PQ), the LUT frame is
    O(n_queries·m·ks) and broadcast, and the rerank join fetches raw vectors
    for rerank·k rows per query only. Complements IVF (fewer candidates) and
    RP-LSH (bucketing): real systems compose IVF+PQ; here each stays
    separately testable. Output schema matches the other x3 variants.
    """
    spark = emb.sparkSession
    dim_row = emb.select(F.size(vec_col).alias("d")).first()
    subdim = dim_row["d"] // m
    books = pq_train(emb, m=m, ks=ks, max_iter=max_iter, id_col=id_col, vec_col=vec_col)

    norm = emb.select(
        F.col(id_col).alias("_id"),
        F.transform(vec_col, lambda x: x.cast("double") / l2norm(F.col(vec_col))).alias("v"),
    )
    codes = (
        _pq_assign(
            _subvector_frame(norm, m, subdim, "neighbor_id"),
            _pq_codebooks_frame(spark, books),
            "neighbor_id",
        )
        .groupBy("neighbor_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "cell"))), lambda x: x["cell"]
            ).alias("code")
        )
    )

    # Per-query LUTs computed on the driver from the bounded query set
    # (same O(batch) contract as the GEMM path): lut[sub][cell] = q_sub · c.
    q_rows = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(vec_col, lambda x: x.cast("double") / l2norm(F.col(vec_col))).alias("qv"),
    ).collect()
    lut_rows = []
    for r in q_rows:
        qv = r["qv"]
        lut = [
            [
                sum(qv[s * subdim + i] * cent[i] for i in range(subdim))
                for cent in books[s]
            ]
            for s in range(m)
        ]
        lut_rows.append((r["query_id"], [float(x) for x in qv], lut))
    from realestatedeals_spark.util import inline_frame

    lut_df = inline_frame(spark, ["query_id", "qv", "lut"], lut_rows)

    adc = (
        codes.crossJoin(F.broadcast(lut_df))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "qv",
            F.aggregate(
                F.zip_with("code", "lut", lambda c, row: F.element_at(row, c + 1)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("adc_score"),
        )
    )
    wq = W.partitionBy("query_id").orderBy(F.col("adc_score").desc(), F.col("neighbor_id"))
    cand = adc.withColumn("_rk", F.row_number().over(wq)).filter(
        F.col("_rk") <= rerank * k
    )
    base = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vn"))
    scored = cand.join(base, "neighbor_id").select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("vn")).alias("cosine")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk", F.round("cosine", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup via cluster-then-prune (Abbas et al., 2023).
# ---------------------------------------------------------------------------


def semdedup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    nlist: int = 16,
    max_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic near-dup pairs: k-means cluster the embeddings, then compute
    exact pairwise cosine ONLY within each cluster (a cluster-keyed
    self-join). Candidate volume drops from N² to Σ|cluster|² — on balanced
    clusters a 1/nlist fraction — which is the whole SemDeDup bet: semantic
    duplicates land in the same cluster, so cross-cluster pairs (missed by
    design) are overwhelmingly below threshold. Recall on planted twins and
    the subset relation vs brute force are pinned in tests/test_similarity.py.

    At 100 TB: train the quantizer on a sample, choose nlist so the largest
    cluster's pair count fits an executor's shuffle budget (skewed clusters
    are the known failure mode — raise nlist or recursively re-cluster hot
    cells), and feed the surviving pairs to duplicate_clusters_star for the
    keep-one-representative step.
    """
    spark = emb.sparkSession
    cents = kmeans_lite(emb, k=nlist, max_iter=max_iter, id_col=id_col, vec_col=vec_col)
    cent_df = _centroid_frame(spark, cents)
    normed = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("raw"),
        F.transform(vec_col, lambda x: x.cast("double") / l2norm(F.col(vec_col))).alias("v"),
    )
    assigned = _best_cells(normed, cent_df, 1, "_id").select("_id", "raw", "cell")

    # Within-cluster pairs as ONE vectorized pass per cell (round 11): the
    # cluster-keyed self-join + interpreted per-pair cosine was the whole
    # cost of the operator (Σ|cluster|² higher-order aggregates — 66
    # engine-s at gen sf1.0). applyInPandas groups each cell's vectors into
    # one Arrow batch and scores the triangle with the same dim-by-dim
    # left-to-right accumulation as ``cosine`` (dot / (l2(a)·l2(b))), so
    # emitted pairs are bit-identical to the join form. Cell skew remains
    # the documented failure mode: a hot cell's members must fit one task
    # (raise nlist / re-cluster hot cells, as below).
    import pandas as pd

    def cell_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
            {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
        )
        if len(pdf) < 2:
            return empty
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        v = np.stack(pdf["raw"].to_numpy())[order].astype(np.float64)
        nvec, dim = v.shape
        acc = np.zeros((nvec, nvec))
        nn = np.zeros(nvec)
        for d in range(dim):
            acc += np.outer(v[:, d], v[:, d])
            nn += v[:, d] * v[:, d]
        rt = np.sqrt(nn)
        cos = acc / (rt[:, None] * rt[None, :])
        ia, ib = np.triu_indices(nvec, 1)  # ids sorted → id_a < id_b
        keep = cos[ia, ib] >= threshold
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "cosine": cos[ia, ib][keep]}
        )

    return assigned.groupBy("cell").applyInPandas(
        cell_pairs, schema="id_a long, id_b long, cosine double"
    )
