"""Deduplication operators (SURVEY.md §2b X1/X2 + A2).

All DataFrame-native — no MLlib pipeline objects, no Python UDFs. Shingles
are 64-bit hashes built from per-token hashes (``hashed_shingles``); MinHash
components are deterministic long re-hashes ``xxhash64(shingle_hash, i)``
(stable across runs/partitionings); banded LSH generates candidates; and
candidates are verified with EXACT Jaccard over the hashed-shingle sets —
so the end result equals the brute-force answer whenever band parameters
give ~1.0 recall at the chosen threshold (16 bands × 4 rows ⇒ miss
probability < 4e-8 at J≥0.9).

Scale shape (100 TB): shingle strings never exist — tokens hash once, k-word
shingle hashes fold via ``zip_with`` (narrow). The signature groupBy
partial-aggregates map-side, so only (doc, 64 longs) per partition reach its
shuffle. Banding is a narrow explode (×bands); the candidate join shuffles
~66 longs per doc on (band, signature) where buckets are tiny by
construction; verification joins only the candidate pairs against per-doc
hashed-shingle arrays. Nothing quadratic in corpus size, and no shuffle ever
carries document text or shingle strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realestatedeals_spark.util import free_local_checkpoint, spread_by_id


def tokenize(text: F.Column) -> F.Column:
    return F.split(text, " ")


def shingle_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """(id, shingle-hash) pairs, distinct per doc. Hashed form on purpose:
    downstream self-joins shuffle 8-byte longs instead of shingle strings."""
    return docs.select(
        F.col(id_col).alias("_id"),
        F.explode(hashed_shingles(F.col(text_col), k)).alias("shingle"),
    )


def hashed_shingles(text: F.Column, k: int = 3) -> F.Column:
    """Distinct k-word shingles as 64-bit hashes (array<long>), no shingle
    strings ever materialized: tokens are hashed once, then k-1 ``zip_with``
    passes fold the k token hashes at each position into one shingle hash.
    Jaccard over hash sets equals Jaccard over shingle sets up to 2^-64
    collisions (negligible at any corpus size), and longs are ~10× cheaper
    than shingle strings to build, compare, and (in the inverted-index
    variant) shuffle."""
    th = F.transform(tokenize(text), lambda t: F.xxhash64(t))
    n = F.size(th)
    m = F.greatest(n - (k - 1), F.lit(0))
    acc = F.slice(th, 1, m)
    for off in range(1, k):
        nxt = F.slice(th, 1 + off, m)
        acc = F.zip_with(acc, nxt, lambda a, b: F.xxhash64(a, b))
    return F.array_distinct(acc)


def shingle_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(_id, sset) — per-doc distinct hashed-shingle array. Narrow (no
    shuffle).

    Docs with fewer than k tokens have no shingles and are dropped, matching
    the exploded-form semantics (they can never be near-duplicates)."""
    return docs.select(
        F.col(id_col).alias("_id"), hashed_shingles(F.col(text_col), k).alias("sset")
    ).filter(F.size("sset") > 0)


def minhash_signatures(sets_: DataFrame, num_hashes: int = 64) -> DataFrame:
    """One row per doc: _id, h0..h{n-1} MinHash components.

    The n components are cheap long re-hashes ``xxhash64(shingle_hash, i)``
    inside the min aggregates — per shingle that is n long mixes, no string
    work. The explode→groupBy stays whole-stage-codegen with map-side
    partial aggregation: only (doc, 64 longs) per partition reach the
    shuffle. (The tempting all-narrow ``array_min(transform(...))`` form is
    slower: 64 higher-order-function columns evaluate interpreted, and
    projection collapse inlines the shingling expression into every one of
    them.)"""
    hv = sets_.select("_id", F.explode("sset").alias("hv"))
    # Each aggregate is ONE parsed SQL string (round 12): the Column-builder
    # form cost ~6 py4j driver round-trips per component — ~1 s of pure plan
    # construction per call at 64 components (guide §7.3's single-threaded
    # driver work, paid before any job ran). The parsed trees are identical.
    aggs = [
        F.expr(f"min(xxhash64(hv, {i})) AS h{i}") for i in range(num_hashes)
    ]
    return hv.groupBy("_id").agg(*aggs)


def banded_signatures(
    sig: DataFrame, num_hashes: int = 64, bands: int = 16
) -> DataFrame:
    """(_id, band, sig) — one row per doc per band, the LSH bucket key."""
    rows = num_hashes // bands
    # One parsed string per band struct (round 12, same py4j-round-trip
    # rationale as minhash_signatures): identical expression trees.
    band_structs = [
        F.expr(
            f"struct({b} AS band, "
            f"xxhash64({', '.join(f'h{b * rows + r}' for r in range(rows))}) AS sig)"
        )
        for b in range(bands)
    ]
    return sig.select("_id", F.explode(F.array(*band_structs)).alias("bs")).select(
        "_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def lsh_candidate_pairs(
    sig: DataFrame, num_hashes: int = 64, bands: int = 16
) -> DataFrame:
    """Banded LSH: docs sharing any band signature become a candidate pair.

    Output: (id_a, id_b) with id_a < id_b, distinct.
    """
    banded = banded_signatures(sig, num_hashes, bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def exact_jaccard(pairs: DataFrame, sets_: DataFrame) -> DataFrame:
    """Join candidate pairs against per-doc shingle arrays and compute exact
    Jaccard. Output: id_a, id_b, jaccard."""
    sets_ = sets_.select("_id", "sset")
    return (
        pairs.join(sets_.withColumnRenamed("_id", "id_a").withColumnRenamed("sset", "set_a"), "id_a")
        .join(sets_.withColumnRenamed("_id", "id_b").withColumnRenamed("sset", "set_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("set_a", "set_b")).cast("double")
                / F.size(F.array_union("set_a", "set_b"))
            ).alias("jaccard"),
        )
    )


def minhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.9,
) -> DataFrame:
    """X2 — MinHash-LSH near-duplicate pairs, exact-verified at ``threshold``.

    Because every candidate is verified with exact Jaccard, false positives
    are impossible and recall at J≥0.9 is 1 − (1 − 0.9^4)^16 ≈ 1 − 4e-8 —
    the output matches brute force in practice (the DuckDB oracle computes
    the brute-force answer).
    """
    # Materialize the shingle table once: it feeds the signature aggregation
    # AND both sides of the exact-verify join, and re-tokenizing the corpus
    # three times dominates the pipeline otherwise. At cluster scale this is
    # the step to persist to storage (or DISK_ONLY) instead.
    # spread first (round 12): the single-split fixture scan otherwise runs
    # the whole shingle+64-hash stage on one core; the id-keyed exchange
    # replaces the signature groupBy's own shuffle (measured 1.30 → 0.75 s
    # for the signature pass at sf0.1, rowsets identical).
    sets_ = shingle_sets(
        spread_by_id(docs, id_col), id_col, text_col, k
    ).localCheckpoint(eager=True)
    sig = minhash_signatures(sets_, num_hashes)
    cand = lsh_candidate_pairs(sig, num_hashes, bands)
    return (
        exact_jaccard(cand, sets_)
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard")
    )


def incremental_minhash_near_duplicates(
    index_sig: DataFrame,
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.9,
    sets_new: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW document batch against an already-indexed corpus without
    touching the historical documents' text — the shape incremental corpus
    ingestion takes at 100 TB, where re-signing a petabyte of history per
    batch is the thing you must never do.

    - ``index_sig``: the PERSISTED MinHash signature index of previously
      ingested docs (``_id, h0..h{n-1}`` — 64 longs/doc, ~0.05% of corpus
      bytes; in production a table maintained with
      ``io.maintenance.VersionedTable``). It is read, never recomputed.
    - ``new_docs``: the incoming batch (id + text). Only these are
      shingled and signed.
    - ``corpus_docs``: an id→text resolver (the corpus storage table) used
      to re-shingle ONLY the docs that appear in candidate pairs at verify
      time — a semi-join prune, so verify cost is O(candidates), not
      O(corpus).

    Candidates are (new × indexed ∪ new × new) band collisions — old×old
    pairs were already reported when those docs arrived, so the join keeps
    one side pinned to the new batch and never rescans history against
    itself. Every candidate is exact-Jaccard verified, so precision is
    exact; recall is the banded-MinHash guarantee (1 − (1 − J^r)^b, ≈1−4e-8
    at J≥0.9 with 16×4).

    Returns ``(pairs, sig_new)``: the verified near-dup pairs touching the
    new batch, and the new docs' signatures for the caller to MERGE into
    the persisted index (one VersionedTable commit per batch).

    ``sets_new``: optionally the PRECOMPUTED (materialized) hashed-shingle
    frame of ``new_docs`` (``_id, sset``, the ``shingle_sets`` shape) — a
    caller that can compute it while the historical index is still being
    written (guide §2.6 job overlap; see x2_minhash_incremental) passes it
    here and retains ownership of its checkpoint. Default None computes
    and checkpoints it internally, exactly as before.
    """
    if sets_new is None:
        # new-batch shingles are computed once and reused for signing AND
        # verification (checkpointed: they feed two jobs); spread first so
        # the single-split batch scan doesn't pin the shingle stage to one
        # core
        sets_new = shingle_sets(
            spread_by_id(new_docs, id_col), id_col, text_col, k
        ).localCheckpoint(eager=True)
    sig_new = minhash_signatures(sets_new, num_hashes)
    sig_all = index_sig.unionByName(sig_new)
    bn = banded_signatures(sig_new, num_hashes, bands).alias("a")
    ba = banded_signatures(sig_all, num_hashes, bands).alias("b")
    cand = (
        bn.join(
            ba,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a._id") != F.col("b._id")),
        )
        .select(
            F.least(F.col("a._id"), F.col("b._id")).alias("id_a"),
            F.greatest(F.col("a._id"), F.col("b._id")).alias("id_b"),
        )
        .distinct()
    )
    cand_ids = (
        cand.select(F.col("id_a").alias("cid"))
        .unionAll(cand.select(F.col("id_b").alias("cid")))
        .distinct()
    )
    # only HISTORICAL candidates are resolved from corpus storage; the new
    # batch's shingles are already in hand (so new docs need not have been
    # written to the corpus table yet when the batch is deduped)
    touched_old = corpus_docs.join(
        cand_ids.withColumnRenamed("cid", id_col), id_col, "left_semi"
    ).join(
        sets_new.select(F.col("_id").alias(id_col)), id_col, "left_anti"
    )
    sets_cand = sets_new.unionByName(shingle_sets(touched_old, id_col, text_col, k))
    pairs = (
        exact_jaccard(cand, sets_cand)
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard")
    )
    return pairs, sig_new


def duplicate_clusters(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over the dup-pair graph → (doc_id, cluster_id)
    with cluster_id = min doc id in the component (label propagation; the
    dup graph is tiny relative to the corpus, and components are shallow,
    so a handful of join iterations converges).
    """
    # Materialize the edge list once: each propagation round below would
    # otherwise re-execute the entire upstream pair pipeline (shingle →
    # MinHash → LSH join → exact verify) per iteration.
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("node"), F.col("src").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        # checkpoint BEFORE the convergence probe so the probe and the next
        # iteration both reuse the materialized result instead of recomputing
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        # the convergence probe was the last reader of the previous labels
        # checkpoint — release it (pagerank discipline: live storage stays
        # ~2 label frames instead of one per round)
        free_local_checkpoint(labels)
        labels = new_labels
        if not changed:
            break
    free_local_checkpoint(edges)  # labels is self-contained (checkpointed)
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def _finish_components_local(edges: DataFrame) -> DataFrame:
    """Union-find over a small edge list inside ONE executor task (not a
    driver collect): ``coalesce(1)`` + ``mapInPandas`` accumulating batches.
    Only ever called on an edge set already known to be under the hybrid
    threshold — the star rounds have contracted the graph to it. Returns
    (node, label) with label = component-min node id."""
    import pandas as pd

    def components(batches):
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        rows_u, rows_v = [], []
        for pdf in batches:
            rows_u.append(pdf["u"])
            rows_v.append(pdf["v"])
        if not rows_u:
            return
        us = pd.concat(rows_u, ignore_index=True)
        vs = pd.concat(rows_v, ignore_index=True)
        for a, b in zip(us, vs):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)  # union by min → root IS the min
        nodes = list(parent)
        yield pd.DataFrame({"node": nodes, "label": [find(n) for n in nodes]})

    return edges.coalesce(1).mapInPandas(components, schema="node long, label long")


def duplicate_clusters_star(
    pairs: DataFrame, max_iter: int = 16, local_threshold: int = 1_000_000
) -> DataFrame:
    """Connected components via alternating large-star/small-star — the
    O(log n)-round scale path (vs label propagation's O(diameter) rounds in
    ``duplicate_clusters``; a 100-node chain needs ~7 rounds here, ~100
    there).

    Each round is two edge rewrites (Kiveris et al., "Connected Components
    in MapReduce and Beyond"):
      large-star: every node u links its strictly-greater neighbors to
        m = min(Γ(u) ∪ {u});
      small-star: every node u links its ≤ neighbors (and itself) to the
        min of that set.
    The edge set monotonically contracts toward per-component stars rooted
    at the component minimum. Per round: two groupBy shuffles on node id +
    two joins; edge count never grows, so the shuffles shrink as components
    collapse. Once the edge set is under ``local_threshold`` (checked before
    the loop and after each round), a single-task union-find finishes the
    remaining contraction in one job — the iterative rounds are pure
    scheduling latency at that size.

    Output matches ``duplicate_clusters``: (doc_id, cluster_id) for every
    node appearing in ``pairs``, cluster_id = component-min doc id.
    """
    # ONE materialization of the upstream pair pipeline (shingle → MinHash →
    # LSH → verify); nodes/edges derive lazily from it — a second eager
    # checkpoint would re-execute the whole pipeline for a trivial reshaping.
    pairs_m = pairs.select("doc_a", "doc_b").localCheckpoint(eager=True)
    nodes = (
        pairs_m.select(F.col("doc_a").alias("node"))
        .union(pairs_m.select(F.col("doc_b")))
        .distinct()
    )
    edges = pairs_m.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).distinct()
    # The dup graph is usually orders of magnitude smaller than the corpus;
    # right-size the iterative shuffles to it (1 partition per ~50k edges, up
    # to the session's shuffle parallelism) so a small graph doesn't schedule
    # 32 near-empty tasks per round — the rounds are latency-bound.
    n_edges = edges.count()
    default_p = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    p = max(1, min(default_p, n_edges // 50_000 + 1))

    def undirected(e: DataFrame) -> DataFrame:
        return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    def finish(e: DataFrame) -> DataFrame:
        labels = nodes.join(
            _finish_components_local(e).withColumnRenamed("label", "root"), "node", "left"
        ).select("node", F.coalesce(F.col("root"), F.col("node")).alias("label"))
        return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))

    # Hybrid: star rounds contract the graph distributedly; once the edge set
    # (monotonically shrinking) fits the local threshold, one union-find task
    # replaces the remaining O(log n) rounds of multi-job scheduling. At
    # 100 TB the rounds do the heavy lifting; locally the graph is usually
    # already under the threshold and clustering is a single job.
    if n_edges <= local_threshold:
        return finish(edges)

    for _ in range(max_iter):
        # large-star: (v, m) for v ∈ Γ(u), v > u, m = min(Γ(u) ∪ {u})
        nbrs = undirected(edges).repartition(p, "u")
        mins = nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            nbrs.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over the large-star output: (v, m) for v ∈ Γ≤(u) ∪ {u}
        le = undirected(large).filter(F.col("v") <= F.col("u")).repartition(p, "u")
        smins = le.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        small = (
            le.join(smins, "u")
            .select(F.col("v").alias("n"), F.col("m"))
            .union(smins.select(F.col("u").alias("n"), F.col("m")))
            .filter(F.col("n") != F.col("m"))
            .select(F.col("n").alias("u"), F.col("m").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # edge count is monotone under the star contractions, so count
        # equality is a cheap first gate; only then pay the set-equality probe
        new_count = small.count()
        converged = (
            new_count == n_edges and small.exceptAll(edges).limit(1).count() == 0
        )
        edges, n_edges = small, new_count
        if converged or n_edges <= local_threshold:
            break

    # finish locally (star contraction preserves components and their mins,
    # so union-find over the contracted edges yields the original labels)
    return finish(edges)


# ---------------------------------------------------------------------------
# SimHash — 64-bit signature; near-dups = small Hamming distance. Candidates
# via 4×16-bit band blocking (any doc pair within Hamming ≤ 3 shares at least
# one exact 16-bit band by pigeonhole).
# ---------------------------------------------------------------------------


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) — sign-aggregated token hashes, all built-in exprs.

    One wide aggregation (round 11, the same lesson the arithmetic variant
    learned in round 9): token instances collapse to per-(doc, token)
    counts first, the 64-bit pattern is xxhash64 evaluated ONCE per
    distinct doc-token row, and the 64 bit sums are 64 aggregate
    expressions in one groupBy — the shuffle carries one wide row per
    document instead of 64× the token instances (the bit posexplode was
    the whole cost of the xxhash flavor: 64 engine-s at gen sf1.0).
    Integer arithmetic is identical (±cnt per distinct token ≡ ±1 per
    instance), so signatures — and the rows-only pair output — are
    bit-unchanged."""
    tok = docs.select(
        F.col(id_col).alias("_id"), F.explode(tokenize(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    cnt = tok.groupBy("_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    hashed = cnt.select("_id", "cnt", F.xxhash64("tok").alias("h"))

    # Both the 64 bit-sum aggregates and the 64-term signature fold are
    # parsed SQL strings (round 12): the Column-builder loops cost ~8 py4j
    # driver round-trips per bit — ~1.5 s of pure plan construction per
    # call, dominating this query's bench time. Parsed trees are identical
    # (left-associative + matches Python sum(); shiftleft/CASE unchanged).
    sums = hashed.groupBy("_id").agg(
        *[
            F.expr(
                f"sum(CASE WHEN (shiftright(h, {i}) & 1) = 1 "
                f"THEN cnt ELSE -cnt END) AS s{i}"
            )
            for i in range(64)
        ]
    )
    sig_sql = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN shiftleft(CAST(1 AS BIGINT), {i}) "
        "ELSE CAST(0 AS BIGINT) END)"
        for i in range(64)
    )
    return sums.select("_id", F.expr(sig_sql).alias("simhash"))


def hamming64(a: F.Column, b: F.Column) -> F.Column:
    return F.bit_count(a.bitwiseXOR(b))


def banded_hamming_pairs(
    sig: DataFrame,
    sig_cols: list[str],
    band_keys: list[F.Column],
    hamming,
    max_hamming: int,
) -> DataFrame:
    """Shared banded-candidate tail for every SimHash flavor: explode the
    signature into (band, key) rows, equi-join on them (never a cross
    product), score Hamming, dedup pairs that share several bands, filter.

    ``sig`` carries ``_id`` plus ``sig_cols`` (the signature columns the
    Hamming needs); ``band_keys`` are the per-band key expressions over
    those columns; ``hamming(a_prefix, b_prefix)`` builds the distance
    column from the two join sides. One copy of the banding semantics
    (pair orientation ``_id < _id``, distinct-before-filter) so the
    xxhash and arithmetic variants cannot drift apart."""
    bands = sig.select(
        "_id",
        *sig_cols,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), k.alias("key"))
                    for i, k in enumerate(band_keys)
                ]
            )
        ).alias("bk"),
    ).select("_id", *sig_cols, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("doc_a"),
            F.col("b._id").alias("doc_b"),
            hamming("a", "b").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """X2 (SimHash flavor) — pairs with Hamming distance ≤ max_hamming.

    Blocking: split the 64-bit signature into 4 16-bit bands; any pair at
    distance ≤ 3 matches exactly on ≥ 1 band, so the candidate join is an
    equi-join, never a cross product.
    """
    # spread (round 12): the 64 bit-sum aggregates otherwise evaluate on the
    # scan's one split; the id-keyed exchange is absorbed by the (id, token)
    # and id groupBys (clustered-by-subset), so exchange count is unchanged
    # (measured 0.80 → 0.41 s for the signature pass at sf0.1).
    sig = simhash64(spread_by_id(docs, id_col), id_col, text_col)
    keys = [
        F.shiftright(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF)) for b in range(4)
    ]
    return banded_hamming_pairs(
        sig,
        ["simhash"],
        keys,
        lambda a, b: hamming64(F.col(f"{a}.simhash"), F.col(f"{b}.simhash")),
        max_hamming,
    )


def simhash_arith_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Engine-portable SimHash companion: same sign-aggregation + 4×16-band
    blocking + Hamming-≤3 verify as ``simhash_near_duplicates``, but the
    per-token 64-bit pattern comes from double polynomial hashing over
    codepoints (h1 mod 1e9+7, h2 mod 998244353; bit i = parity of
    (h1 + (i+1)·h2 + i²·12345) mod 1e9+7) instead of xxhash64 — pure int64
    arithmetic a SQL oracle recomputes bit-for-bit, so the whole distributed
    mechanism is hash-exact checkable. The xxhash64 variant stays the
    production path (better bit mixing); this one oracles the machinery.

    Scale shape: token counts are aggregated per (doc, token) BEFORE the
    64-bit expansion, so the wide shuffle carries distinct doc-token pairs
    (vocabulary-bounded per doc), not raw token instances. The signature is
    carried as two uint32 halves in BIGINTs (hi/lo) — band keys and Hamming
    split cleanly across halves and no sign bit is ever touched.
    """
    # Repartition re-measured in round 12: the round-9 "no repartition"
    # A/B (3.3 → 4.0 s) predates the one-groupBy signature rewrite — in the
    # current shape the id-keyed exchange is absorbed by BOTH the
    # (id, token) count groupBy and the 64-aggregate signature groupBy
    # (clustered-by-subset), so it replaces a downstream exchange instead
    # of adding one, and the explode+count stage stops running on the
    # fixture scan's single split (2.29 → 2.02 s best at sf0.1).
    tok = spread_by_id(docs, id_col).select(
        F.col(id_col).alias("_id"), F.explode(tokenize(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    # Materialize the (doc, token) counts once (lazy checkpoint): both the
    # vocab branch and the join below read it, and without this the
    # tokenize+explode+groupBy would run twice.
    cnt = tok.groupBy("_id", "tok").agg(F.count(F.lit(1)).alias("cnt")).localCheckpoint(
        eager=False
    )
    h1 = F.aggregate(
        F.split(F.col("tok"), ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % 1000000007,
    )
    h2 = F.aggregate(
        F.split(F.col("tok"), ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 131 + F.ascii(ch)) % 998244353,
    )
    # The per-character polynomial fold runs once per DISTINCT token (the
    # vocab frame), not once per (doc, token) pair — mirroring the oracle's
    # vocab CTE. At corpus scale the character fold dominates per-row cost
    # and distinct-tokens ≪ doc-token pairs; AQE broadcasts the vocab side
    # of the join-back when it is small.
    vocab = cnt.select("tok").distinct().select("tok", h1.alias("h1"), h2.alias("h2"))
    hashed = cnt.join(vocab, "tok").select("_id", "cnt", "h1", "h2")
    # 64 aggregate expressions in ONE groupBy instead of a posexplode to
    # (doc, bit) rows: the shuffle then carries one row per document (wide)
    # rather than 64× the distinct doc-token pairs — measured 4.5 s → ~2 s
    # at sf0.1, and at corpus scale it removes the dominant exchange
    # entirely. Same arithmetic: s_i = Σ_tok ±cnt with the parity of
    # (h1 + (i+1)·h2 + i²·12345) mod 1e9+7 deciding the sign.
    # Parsed SQL strings instead of Column-builder loops (round 12): the 64
    # bit-sum aggregates plus the two 32-term half folds cost ~1000 py4j
    # driver round-trips — ~2.3 s of pure plan construction per call, the
    # bulk of this query's bench time. Arithmetic is unchanged term for
    # term; + chains parse left-associative exactly like Python sum().
    sums = hashed.groupBy("_id").agg(
        *[
            F.expr(
                f"sum(CASE WHEN ((h1 + {i + 1} * h2 + {i * i * 12345}) "
                f"% 1000000007) % 2 = 1 THEN cnt ELSE -cnt END) AS s{i}"
            )
            for i in range(64)
        ]
    )

    def half_sql(lo_bit: int) -> str:
        return " + ".join(
            f"(CASE WHEN s{i} > 0 THEN CAST({1 << (i - lo_bit)} AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END)"
            for i in range(lo_bit, lo_bit + 32)
        )

    sig = sums.select(
        "_id", F.expr(half_sql(0)).alias("lo"), F.expr(half_sql(32)).alias("hi")
    )
    mask = F.lit(0xFFFF).cast("long")
    keys = [
        F.col("lo").bitwiseAND(mask),
        F.shiftright(F.col("lo"), 16).bitwiseAND(mask),
        F.col("hi").bitwiseAND(mask),
        F.shiftright(F.col("hi"), 16).bitwiseAND(mask),
    ]

    def ham(a: str, b: str) -> F.Column:
        return (
            F.bit_count(F.col(f"{a}.lo").bitwiseXOR(F.col(f"{b}.lo")))
            + F.bit_count(F.col(f"{a}.hi").bitwiseXOR(F.col(f"{b}.hi")))
        ).cast("int")

    return banded_hamming_pairs(sig, ["lo", "hi"], keys, ham, max_hamming)


def dup_substring_spans(docs: DataFrame, k: int = 8) -> DataFrame:
    """Exact duplicated-substring spans via rolling k-gram hashes (the
    distributed re-expression of the ExactSubstr pass in Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", ACL 2022 —
    the paper's suffix array becomes a k-gram hash-frequency table).

    A k-token window is duplicated iff its hash occurs >1 time in the whole
    corpus; per document, duplicated windows merge (gaps-and-islands) into
    maximal verbatim spans. Returns one row per document that has at least
    one span: (doc_id, n_dup_spans, dup_tokens, n_tokens, dup_frac).

    Plan shape: ONE doc-keyed sort feeds both the k-gram lead()s and the
    island lag/running-sum; the only corpus-proportional shuffle is the
    hash-frequency groupBy (map-side combined, carries 16-hex-char hashes,
    never text) — the theoretical minimum for exact substring dedup.
    """
    from pyspark.sql import Window as W

    tok = docs.select("doc_id", F.split("text", " ").alias("t")).select(
        "doc_id", F.size("t").alias("n_tokens"), F.posexplode("t").alias("p", "tok")
    )
    wl = W.partitionBy("doc_id").orderBy("p")
    grams = [F.col("tok")] + [F.lead("tok", i).over(wl) for i in range(1, k)]
    kh = (
        tok.select(
            "doc_id", "n_tokens", "p", *[g.alias(f"t{i}") for i, g in enumerate(grams)]
        )
        .filter(F.col(f"t{k - 1}").isNotNull())
        .select(
            "doc_id",
            "n_tokens",
            "p",
            F.substring(
                F.md5(F.concat_ws(" ", *[f"t{i}" for i in range(k)])), 1, 16
            ).alias("h"),
        )
    )
    dup = kh.groupBy("h").agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") > 1).select("h")
    dp = kh.join(dup, "h").select("doc_id", "n_tokens", "p")
    # windows at p and p' overlap-or-touch iff |p - p'| <= k → one span
    brk = F.when(F.col("p") - F.lag("p").over(wl) <= k, F.lit(0)).otherwise(F.lit(1))
    run = W.partitionBy("doc_id").orderBy("p").rowsBetween(W.unboundedPreceding, 0)
    spans = (
        dp.withColumn("brk", brk)
        .withColumn("gid", F.sum("brk").over(run))
        .groupBy("doc_id", "n_tokens", "gid")
        .agg(F.min("p").alias("p0"), F.max("p").alias("p1"))
    )
    return (
        spans.groupBy("doc_id", "n_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_dup_spans"),
            F.sum(F.col("p1") - F.col("p0") + k).alias("dup_tokens"),
        )
        .select(
            "doc_id",
            "n_dup_spans",
            "dup_tokens",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("dup_tokens").cast("double") / F.col("n_tokens")).alias("dup_frac"),
        )
    )
