"""Near-dup operator tests: planted duplicates must be found; unrelated docs
must not pair; clusters must be transitive-closed."""

from __future__ import annotations

from pyspark.sql import functions as F

from realestatedeals_spark.operators.dedup import (
    duplicate_clusters,
    minhash_near_duplicates,
    simhash_near_duplicates,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches the "
    "birds fly south for winter and the river runs cold past the old mill"
)
NEAR = BASE.replace("cold", "warm")  # one-word edit → very high jaccard
FAR = (
    "completely different content about spark query engines and distributed "
    "shuffle partitioning strategies for large scale analytics workloads here"
)


def docs_df(spark):
    rows = [(1, BASE), (2, NEAR), (3, FAR), (4, BASE)]  # 4 = exact copy of 1
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_finds_planted_pairs(spark):
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_near_duplicates(docs_df(spark), threshold=0.5).collect()
    }
    assert (1, 4) in out and out[(1, 4)] == 1.0  # exact copy
    assert (1, 2) in out and out[(1, 2)] > 0.7  # near copy
    assert (2, 4) in out  # transitively similar
    assert not any(3 in p for p in out)  # unrelated doc never pairs


def test_clusters_transitive(spark):
    pairs = minhash_near_duplicates(docs_df(spark), threshold=0.5)
    clusters = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert clusters[1] == clusters[2] == clusters[4] == 1
    assert 3 not in clusters  # singleton docs carry no cluster row


def test_simhash_exact_copy_zero_distance(spark):
    out = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
           simhash_near_duplicates(docs_df(spark), max_hamming=10).collect()}
    assert out[(1, 4)] == 0
    assert (1, 2) in out  # near copy within hamming 10
    assert not any(3 in p for p in out)


def test_minhash_chain_cluster(spark):
    # A~B and B~C but A!~C: cluster must still merge all three (transitivity)
    a = "w" + " w".join(str(i) for i in range(40))
    rows = [(10, a)]
    toks = a.split()
    b = " ".join(toks[:30] + ["x%d" % i for i in range(10)])
    c = " ".join(toks[:20] + ["x%d" % i for i in range(10)] + ["y%d" % i for i in range(10)])
    rows += [(20, b), (30, c)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_near_duplicates(df, threshold=0.3)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    if {(10, 20), (20, 30)} <= got and (10, 30) not in got:
        clusters = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
        assert clusters[10] == clusters[20] == clusters[30] == 10


def test_star_clusters_match_label_propagation(spark):
    from realestatedeals_spark.operators.dedup import duplicate_clusters_star

    pairs = minhash_near_duplicates(docs_df(spark), threshold=0.5)
    lp = {(r["doc_id"], r["cluster_id"]) for r in duplicate_clusters(pairs).collect()}
    # local_threshold=0 forces the pure distributed star rounds; the default
    # takes the single-task union-find finish — both must agree with LP
    star = {
        (r["doc_id"], r["cluster_id"])
        for r in duplicate_clusters_star(pairs, local_threshold=0).collect()
    }
    hybrid = {(r["doc_id"], r["cluster_id"]) for r in duplicate_clusters_star(pairs).collect()}
    assert star == lp == hybrid


def test_star_clusters_long_chain_converges_logarithmically(spark):
    """A 100-node path graph: label propagation needs ~100 rounds, the
    alternating star algorithm must collapse it within 10 (O(log n))."""
    from realestatedeals_spark.operators.dedup import duplicate_clusters_star

    chain = [(i, i + 1, 1.0) for i in range(100)]  # nodes 0..100 in one path
    extra = [(200, 201, 1.0), (203, 201, 1.0)]  # second component, min=200
    pairs = spark.createDataFrame(chain + extra, ["doc_a", "doc_b", "jaccard"])
    out = {r["doc_id"]: r["cluster_id"] for r in
           duplicate_clusters_star(pairs, max_iter=10, local_threshold=0).collect()}
    assert all(out[i] == 0 for i in range(101))
    assert out[200] == out[201] == out[203] == 200
    assert len(out) == 104


def test_star_clusters_hybrid_cutover_mid_contraction(spark):
    """local_threshold between 0 and the edge count: at least one star round
    runs, then the union-find finish takes over — output must be identical
    to the pure star path."""
    from realestatedeals_spark.operators.dedup import duplicate_clusters_star

    chain = [(i, i + 1, 1.0) for i in range(60)]
    pairs = spark.createDataFrame(chain, ["doc_a", "doc_b", "jaccard"])
    pure = {(r["doc_id"], r["cluster_id"])
            for r in duplicate_clusters_star(pairs, local_threshold=0).collect()}
    mid = {(r["doc_id"], r["cluster_id"])
           for r in duplicate_clusters_star(pairs, local_threshold=30).collect()}
    assert pure == mid
    assert all(c == 0 for _, c in pure)


def test_star_clusters_exact_threshold_boundary(spark):
    """Pin the ``n_edges <= local_threshold`` boundary (dedup.py:317,350):
    with exactly `threshold` distinct edges the graph goes straight to the
    single-task union-find finish; at `threshold - 1` the star rounds run
    first. Both sides must produce identical labels (and match label
    propagation), so the coalesce(1) finish is only ever fed a bounded edge
    set and the cutover point itself cannot change results."""
    from realestatedeals_spark.operators.dedup import duplicate_clusters_star

    edges = [(i, i + 1, 1.0) for i in range(8)]  # exactly 8 distinct edges
    # duplicate pair rows must not push the DISTINCT edge count over the gate
    pairs = spark.createDataFrame(edges + edges[:3], ["doc_a", "doc_b", "jaccard"])
    lp = {(r["doc_id"], r["cluster_id"]) for r in duplicate_clusters(pairs).collect()}
    at = {(r["doc_id"], r["cluster_id"])
          for r in duplicate_clusters_star(pairs, local_threshold=8).collect()}
    below = {(r["doc_id"], r["cluster_id"])
             for r in duplicate_clusters_star(pairs, local_threshold=7).collect()}
    assert at == below == lp
    assert all(c == 0 for _, c in at) and len(at) == 9


def test_star_clusters_random_graph_matches_label_propagation(spark):
    import random

    from realestatedeals_spark.operators.dedup import duplicate_clusters_star

    rng = random.Random(7)
    edges = {(rng.randrange(60), rng.randrange(60)) for _ in range(50)}
    pairs = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges if a != b], ["doc_a", "doc_b", "jaccard"]
    )
    lp = {(r["doc_id"], r["cluster_id"]) for r in duplicate_clusters(pairs, max_iter=60).collect()}
    star = {
        (r["doc_id"], r["cluster_id"])
        for r in duplicate_clusters_star(pairs, local_threshold=0).collect()
    }
    assert star == lp


def test_dup_substring_spans(spark):
    """A planted 10-token verbatim run produces exactly one merged span."""
    from realestatedeals_spark.operators.dedup import dup_substring_spans

    run = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    d1 = "one two three " + run + " four five six seven eight nine ten"  # 20 tokens
    d2 = "red green blue " + run + " purple orange yellow pink black white"  # 19 tokens
    d3 = "totally unrelated words that never repeat anywhere in this corpus at all"
    docs = spark.createDataFrame([(1, d1), (2, d2), (3, d3)], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dup_substring_spans(docs, k=8).collect()}

    # only the two docs sharing the run appear; the unrelated doc is span-free
    assert set(out) == {1, 2}
    for doc_id, n_tok in ((1, 20), (2, 19)):
        r = out[doc_id]
        # the 10-token run yields 3 duplicated 8-gram windows (positions
        # p, p+1, p+2) that must merge into ONE maximal span of 10 tokens
        assert r["n_dup_spans"] == 1
        assert r["dup_tokens"] == 10
        assert r["n_tokens"] == n_tok
        assert abs(r["dup_frac"] - 10 / n_tok) < 1e-12


def test_dup_substring_spans_merges_adjacent(spark):
    from realestatedeals_spark.operators.dedup import dup_substring_spans

    # two disjoint shared runs separated by a large unique gap → two spans
    r1 = "a b c d e f g h"          # exactly one 8-gram
    r2 = "q r s t u v w x"
    gap1 = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"
    gap2 = "v1 v2 v3 v4 v5 v6 v7 v8 v9 v10"
    d1 = f"{r1} {gap1} {r2}"
    d2 = f"{r2} {gap2} {r1}"
    docs = spark.createDataFrame([(1, d1), (2, d2)], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dup_substring_spans(docs, k=8).collect()}
    assert out[1]["n_dup_spans"] == 2 and out[1]["dup_tokens"] == 16
    assert out[2]["n_dup_spans"] == 2 and out[2]["dup_tokens"] == 16


def test_incremental_minhash_matches_full_batch(spark, sf_dir):
    """The incremental path (persisted index + new-batch-only signing +
    candidate-only verify) must find exactly the pairs the full-corpus run
    finds among pairs touching the new batch — nothing lost by keeping
    history un-reshingled, nothing invented by the least/greatest pair
    normalization."""
    from realestatedeals_spark.operators.dedup import (
        incremental_minhash_near_duplicates,
        minhash_near_duplicates,
        minhash_signatures,
        shingle_sets,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 7 == 0)
    index_sig = minhash_signatures(shingle_sets(old)).localCheckpoint(eager=True)
    pairs, sig_new = incremental_minhash_near_duplicates(index_sig, new, docs)
    got = {(r.doc_a, r.doc_b, round(r.jaccard, 9)) for r in pairs.collect()}
    full = minhash_near_duplicates(docs, threshold=0.9)
    want = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in full.collect()
        if r.doc_a % 7 == 0 or r.doc_b % 7 == 0
    }
    assert got == want
    # the returned new-batch signatures merge cleanly into the index schema
    assert sig_new.columns == index_sig.columns


def test_incremental_minhash_never_signs_history(spark):
    """The historical index is consumed as-is: feed an index whose
    signatures deliberately DISAGREE with the old docs' current text — if
    the operator re-signed history, the planted collision would vanish."""
    from realestatedeals_spark.operators.dedup import (
        incremental_minhash_near_duplicates,
        minhash_signatures,
        shingle_sets,
    )

    t = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [(1, t), (2, "totally different words here none shared at all")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame([(10, t)], ["doc_id", "text"])
    # index signs doc 1 with the TEXT OF t (matching corpus), doc 2 with t
    # as well — a stale/fake signature that collides with the new doc
    fake_old = spark.createDataFrame([(1, t), (2, t)], ["doc_id", "text"])
    index_sig = minhash_signatures(shingle_sets(fake_old))
    pairs, _ = incremental_minhash_near_duplicates(index_sig, new, corpus)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    # doc 2 becomes a CANDIDATE via its (stale) signature, but exact verify
    # against corpus text rejects it; doc 1 verifies. History text was only
    # consulted for the two candidate ids.
    assert got == {(1, 10)}


def test_winnow_cap_load_bearing_on_boilerplate_corpus(spark, tmp_path):
    """Round-7 verdict task #8: on a template-contaminated corpus
    (tools/gen_scale.py --boilerplate: ~30% of docs share one of three
    28-token header+footer templates) the 2% stop-fingerprint cap of
    x2_winnow_overlap_capped must actually engage — hot template
    fingerprints crossed the cap nowhere on the clean fixtures, so the
    capped form was pure cost until now. Pins: (a) fingerprints cross the
    cap, (b) uncapped output drowns in boilerplate-only pairs while capped
    output keeps only true-copy pairs, (c) capped pairs are a subset of
    uncapped (the cap only removes, never invents)."""
    from pyspark.sql import functions as F

    from realestatedeals_spark.plans.llm_text import (
        _winnow_fingerprints,
        x2_winnow_overlap,
        x2_winnow_overlap_capped,
    )
    from tools.gen_scale import generate

    d = str(tmp_path / "boiler")
    generate(0.02, d, boilerplate=True)  # 1000 docs, ~300 templated

    docs = spark.read.parquet(d + "/documents.parquet")
    n = docs.count()
    fp = _winnow_fingerprints(docs)
    hot = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") * 50 > n)
    n_hot = hot.count()
    assert n_hot > 0, "boilerplate corpus produced no over-cap fingerprints"

    capped = {(r["doc_a"], r["doc_b"]) for r in x2_winnow_overlap_capped(spark, d).collect()}
    uncapped = {(r["doc_a"], r["doc_b"]) for r in x2_winnow_overlap(spark, d).collect()}
    assert capped <= uncapped
    assert len(uncapped) > 10 * max(len(capped), 1), (
        f"cap not load-bearing: {len(capped)} capped vs {len(uncapped)} uncapped"
    )


def test_spread_preserves_results_and_exchange_count(spark):
    """Round-12 spread_by_id: the id-keyed repartition in front of the
    compute-bound shingle/sign stages must (a) change no results and (b)
    be absorbed by the downstream id-clustered aggregations — the
    signature pipeline keeps exactly ONE exchange, the repartition having
    REPLACED the groupBy's shuffle rather than added to it."""
    from realestatedeals_spark.operators.dedup import (
        minhash_signatures,
        shingle_sets,
        simhash_arith_near_duplicates,
    )
    from realestatedeals_spark.util import spread_by_id

    docs = docs_df(spark)

    # (a) rowset equality through the public operators, spread inputs or not
    for fn in (minhash_near_duplicates, simhash_near_duplicates,
               simhash_arith_near_duplicates):
        plain = fn(docs.coalesce(1))
        wide = fn(docs.repartition(8, "doc_id"))
        assert plain.exceptAll(wide).count() == 0
        assert wide.exceptAll(plain).count() == 0

    # (b) exchange-replacement: spread + signature groupBy plans ONE exchange
    sig = minhash_signatures(shingle_sets(spread_by_id(docs, "doc_id")))
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_incremental_precomputed_sets_new_identical(spark):
    """Round-12 §2.6 overlap: passing a precomputed/materialized
    ``sets_new`` into incremental_minhash_near_duplicates must be
    indistinguishable from the internal computation — same pairs, same
    signatures to merge."""
    from realestatedeals_spark.operators.dedup import (
        incremental_minhash_near_duplicates,
        minhash_signatures,
        shingle_sets,
    )

    docs = docs_df(spark)
    old = docs.filter(F.col("doc_id") != 2)
    new = docs.filter(F.col("doc_id") == 2)
    index_sig = minhash_signatures(shingle_sets(old))

    p0, s0 = incremental_minhash_near_duplicates(index_sig, new, docs, threshold=0.5)
    pre = shingle_sets(new).localCheckpoint(eager=True)
    p1, s1 = incremental_minhash_near_duplicates(
        index_sig, new, docs, threshold=0.5, sets_new=pre
    )
    assert p0.exceptAll(p1).count() == 0 and p1.exceptAll(p0).count() == 0
    assert s0.exceptAll(s1).count() == 0 and s1.exceptAll(s0).count() == 0
