"""Semantic tests for the round-9 engine-portable companions (arithmetic
SimHash, HLL register state, CMS arith family, binned quantiles) — beyond
the hash-exact oracles, these pin the *sketch contracts*: merge-vs-rescan
equivalence, one-sided CMS error, quantile error ≤ one bin width, and
planted near-dup recall for the arithmetic SimHash."""

from __future__ import annotations

from pyspark.sql import functions as F

from realestatedeals_spark.operators.dedup import simhash_arith_near_duplicates
from realestatedeals_spark.operators.sketches import (
    cms_arith_estimate,
    cms_arith_table,
    hll_arith_registers,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen green "
    "turtles carry bright lanterns across the quiet river delta tonight"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# arithmetic SimHash
# ---------------------------------------------------------------------------


def test_simhash_arith_identical_docs_pair_at_hamming_zero(spark):
    docs = _docs(spark, [(1, BASE), (2, BASE), (3, "completely different words entirely")])
    got = {(r.doc_a, r.doc_b): r.hamming for r in simhash_arith_near_duplicates(docs).collect()}
    assert got.get((1, 2)) == 0


def test_simhash_arith_one_token_edit_stays_near(spark):
    # 20 copies of the sentence with ONE occurrence of 'lanterns' swapped to
    # 'torches': the count-weighted sign sums land this pair at Hamming
    # exactly 3 (deterministic arithmetic — verified against a pure-Python
    # replica), with flips in 3 of the 4 bands, so the pigeonhole guarantee
    # (≤3 flips leave ≥1 intact 16-bit band) recalls it structurally
    long_base = " ".join([BASE] * 20)
    edited = long_base.replace("lanterns", "torches", 1)
    docs = _docs(spark, [(1, long_base), (2, edited)])
    got = {(r.doc_a, r.doc_b): r.hamming for r in simhash_arith_near_duplicates(docs).collect()}
    assert got.get((1, 2)) == 3


def test_simhash_arith_hamming4_pigeonhole_edge(spark):
    # the same edit with 'candles' flips 4 bits, ONE PER BAND — the exact
    # pigeonhole boundary: no band survives intact, so the pair must not
    # even surface as a candidate at max_hamming=3 (verified against the
    # pure-Python replica: flips in bits {1, 23, 46, 62})
    long_base = " ".join([BASE] * 20)
    edited = long_base.replace("lanterns", "candles", 1)
    docs = _docs(spark, [(1, long_base), (2, edited)])
    assert simhash_arith_near_duplicates(docs, max_hamming=3).count() == 0


def test_simhash_arith_disjoint_vocab_not_paired(spark):
    # deterministic arithmetic (no seeds): this specific disjoint-vocabulary
    # pair sits far beyond Hamming 3 and must stay out
    other = (
        "zinc quartz violet morning embers drift beneath eleven copper "
        "windmills humming ancient ballads toward frozen northern harbors"
    )
    docs = _docs(spark, [(1, BASE), (2, other)])
    assert simhash_arith_near_duplicates(docs).count() == 0


def test_simhash_arith_max_hamming_is_monotone(spark):
    edited = BASE.replace("lanterns", "candles").replace("quick", "swift")
    docs = _docs(spark, [(1, BASE), (2, edited), (3, BASE)])
    n1 = simhash_arith_near_duplicates(docs, max_hamming=1).count()
    n3 = simhash_arith_near_duplicates(docs, max_hamming=3).count()
    assert n1 <= n3


# ---------------------------------------------------------------------------
# HLL arithmetic register state
# ---------------------------------------------------------------------------


def _vals(spark, tag_rows):
    return spark.createDataFrame(tag_rows, "tag string, v string")


def test_hll_arith_merge_equals_rescan(spark):
    a = [("a", f"doc-{i}") for i in range(300)]
    b = [("b", f"doc-{i}") for i in range(150, 450)]
    per = hll_arith_registers(_vals(spark, a + b), "tag", "v")
    merged = {
        r.bucket: r.register
        for r in per.groupBy("bucket").agg(F.max("register").alias("register")).collect()
    }
    rescan = {
        r.bucket: r.register
        for r in hll_arith_registers(
            _vals(spark, [("u", v) for _, v in a + b]), "tag", "v"
        ).collect()
    }
    assert merged == rescan


def test_hll_arith_register_ranges(spark):
    regs = hll_arith_registers(_vals(spark, [("t", f"x{i}") for i in range(500)]), "tag", "v")
    rows = regs.collect()
    assert all(0 <= r.bucket < 256 for r in rows)
    assert all(1 <= r.register <= 41 for r in rows)


def test_hll_arith_estimate_tracks_exact(spark):
    # raw HLL estimate from the registers (alpha_256 = 0.7213/(1+1.079/256))
    # should land within ~3 standard errors (1.04/sqrt(256) ≈ 6.5%) of the
    # true distinct count for a plain cardinality (no low-range correction
    # needed at n >> m)
    n = 20_000
    regs = {
        r.bucket: r.register
        for r in hll_arith_registers(
            _vals(spark, [("t", f"item-{i}") for i in range(n)]), "tag", "v"
        ).collect()
    }
    m = 256
    z = sum(2.0 ** -regs.get(b, 0) for b in range(m))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / z
    assert abs(est - n) / n < 0.20


# ---------------------------------------------------------------------------
# CMS arithmetic family
# ---------------------------------------------------------------------------


def test_cms_arith_never_undercounts(spark):
    counts = {"hot": 400, "warm": 90, **{f"r{i}": 3 for i in range(60)}}
    rows = [(t,) for t, c in counts.items() for _ in range(c)]
    toks = spark.createDataFrame(rows, "term string").repartition(4)
    cms = cms_arith_table(toks, "term")
    terms = spark.createDataFrame([(t,) for t in counts], "term string")
    est = {r.term: r.cms_est for r in cms_arith_estimate(cms, terms, "term").collect()}
    for t, c in counts.items():
        assert est[t] >= c, f"{t}: CMS undercounted {est[t]} < {c}"


def test_cms_arith_mergeable_by_groupby_sum(spark):
    rows = [(f"t{i % 37}",) for i in range(2000)]
    half_a = spark.createDataFrame(rows[:1000], "term string")
    half_b = spark.createDataFrame(rows[1000:], "term string")
    whole = spark.createDataFrame(rows, "term string")
    merged = (
        cms_arith_table(half_a, "term")
        .unionByName(cms_arith_table(half_b, "term"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    want = {(r.row, r.bucket): r.cnt for r in cms_arith_table(whole, "term").collect()}
    got = {(r.row, r.bucket): r.cnt for r in merged.collect()}
    assert got == want


# ---------------------------------------------------------------------------
# binned quantiles
# ---------------------------------------------------------------------------


def test_binned_quantiles_error_bounded_by_bin_width(spark, sf_dir):
    from realestatedeals_spark.plans.registry import QUERIES

    from realestatedeals_spark.io.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    vals = {}
    for r in docs.collect():
        vals.setdefault(r.source, []).append(r.n_chars)
    vals["__global__"] = [v for vs in vals.values() for v in vs]
    lo = min(vals["__global__"])
    hi = max(vals["__global__"])
    w = (hi - lo + 1 + 1023) // 1024

    got = {r.source: r for r in QUERIES["x6_binned_quantiles"].fn(spark, sf_dir).collect()}
    assert set(got) == set(vals)
    for src, xs in vals.items():
        xs = sorted(xs)
        n = len(xs)
        for p_num, p_den, col in ((1, 2, "p50_est"), (9, 10, "p90_est"), (99, 100, "p99_est")):
            rank = (p_num * n + p_den - 1) // p_den  # ceil(p·n), 1-indexed
            exact = xs[rank - 1]
            est = getattr(got[src], col)
            # est is the LOWER BOUND of the bin holding the rank-th value
            assert est <= exact < est + w, (src, col, est, exact, w)
            assert got[src].n == n


# ---------------------------------------------------------------------------
# banding completeness: operator output == pure-Python brute force
# ---------------------------------------------------------------------------


def _py_simhash_bits(counts):
    """Pure-Python replica of the arithmetic SimHash signature (same
    constants as operators/dedup.simhash_arith_near_duplicates)."""

    def h(tok, base, mod):
        a = 0
        for ch in tok:
            a = (a * base + ord(ch)) % mod
        return a

    s = [0] * 64
    for tok, c in counts.items():
        a, b = h(tok, 31, 1000000007), h(tok, 131, 998244353)
        for i in range(64):
            bit = ((a + (i + 1) * b + i * i * 12345) % 1000000007) % 2
            s[i] += c if bit == 1 else -c
    return [1 if x > 0 else 0 for x in s]


def test_simhash_arith_equals_bruteforce_on_random_corpora(spark):
    """For random small corpora the operator's pair set must EQUAL the
    brute-force all-pairs Hamming-≤3 filter over the replica signatures:
    ⊇ is the 4×16-band pigeonhole guarantee, ⊆ is the exact verify. Checked
    with per-pair hamming values, across several seeded corpora."""
    import collections
    import random

    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa", "zeta"]
    for seed in (3, 11, 42):
        rng = random.Random(seed)
        docs = []
        for did in range(8):
            n = rng.randint(5, 30)
            docs.append((did, " ".join(rng.choice(words) for _ in range(n))))
        bits = {
            did: _py_simhash_bits(collections.Counter(t for t in text.split(" ") if t))
            for did, text in docs
        }
        want = {}
        for a in range(8):
            for b in range(a + 1, 8):
                ham = sum(x != y for x, y in zip(bits[a], bits[b]))
                if ham <= 3:
                    want[(a, b)] = ham
        got = {
            (r.doc_a, r.doc_b): r.hamming
            for r in simhash_arith_near_duplicates(
                spark.createDataFrame(docs, "doc_id long, text string")
            ).collect()
        }
        assert got == want, f"seed {seed}: {got} != {want}"
