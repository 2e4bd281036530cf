"""Planted-print tests for the Hamming-tolerant banded media matchers.

The three registered queries (x5_{audio,image,video}_near_dup_banded) share
one core, plans/multimodal.banded_print_pairs; these tests drive that core
with PLANTED prints at exactly-known Hamming distances, where the fixture
queries only exercise whatever distances the synthetic corpus happens to
produce (video: a single pair at sf0.01). For every layout here the number
of bands exceeds max_hamming, so <= max_hamming flips leave at least one
band untouched — banded output must EQUAL brute-force Hamming<=2 over the
print space (superset of any exact-group pairing, subset of brute force,
both directions pinned by set equality)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from realestatedeals_spark.plans.multimodal import (
    _AUDIO_BANDS_SQL,
    _IMAGE_BANDS_SQL,
    _VIDEO_BANDS_SQL,
    banded_print_pairs,
)


def _flip(s: str, *pos: int) -> str:
    out = list(s)
    for p in pos:
        out[p] = "1" if out[p] == "0" else "0"
    return "".join(out)


def _brute_pairs(prints: dict[str, int], max_h: int = 2) -> set:
    """All-pairs Hamming<=max_h ground truth over same-length prints."""
    out = set()
    for a, b in itertools.combinations(sorted(prints), 2):
        if len(a) != len(b):
            continue
        h = sum(x != y for x, y in zip(a, b))
        if h <= max_h:
            out.add((a, b, h, prints[a], prints[b]))
    return out


def _run(spark, prints: dict[str, int], bands_sql: str, extra_keys=()):
    df = spark.createDataFrame(
        [(fp, n) for fp, n in prints.items()], "fp string, n long"
    )
    if extra_keys:
        df = df.withColumn("flen", F.length("fp"))
    got = banded_print_pairs(df, "fp", "n", bands_sql, extra_keys=extra_keys)
    return {(r.fp_a, r.fp_b, r.hamming, r.n_a, r.n_b) for r in got.collect()}


def test_image_banded_planted_hamming_1_and_2(spark):
    """64-bit dHash prints, 8 x 8-bit bands: planted pairs at Hamming 1 and
    2 match; a Hamming-4 control that still shares 4 bands (so it IS a
    candidate) is killed by the exact verify; banded == brute force."""
    base = "0110100110010110" * 4
    prints = {
        base: 3,
        _flip(base, 0): 1,        # d=1 from base (band 0 touched)
        _flip(base, 8, 16): 2,    # d=2 from base (bands 1,2), d=3 from the d=1 print
        _flip(base, 1, 9, 17, 25): 1,  # d=4 control: candidate via bands 4-7, verify kills
        "1" * 64: 2,              # far print: no band shared with the cluster
    }
    got = _run(spark, prints, _IMAGE_BANDS_SQL)
    want = _brute_pairs(prints)
    assert got == want
    # the planted distances are actually present (tolerance is load-bearing)
    assert {h for _, _, h, _, _ in got} == {1, 2}
    assert len(got) == 2
    # doc counts plumb through from the print table, aligned to fp_a/fp_b
    assert all(
        n_a == prints[a] and n_b == prints[b] for a, b, _, n_a, n_b in got
    )


def test_audio_banded_planted_hamming_1_and_2(spark):
    """30-bit audio prints, 3 x 10-bit bands: 2 flips touch at most 2 of 3
    bands, so banded == brute force at Hamming<=2; a 3-flip control that
    touches all three bands shares none and is (correctly) not even a
    candidate — and would fail the verify anyway."""
    base = "101100111000101100111000101100"
    prints = {
        base: 5,
        _flip(base, 3): 1,          # d=1
        _flip(base, 11, 23): 2,     # d=2, one flip in band 1 and one in band 2
        _flip(base, 0, 10, 20): 1,  # d=3 control: every band touched
    }
    got = _run(spark, prints, _AUDIO_BANDS_SQL)
    assert got == _brute_pairs(prints)
    assert {h for _, _, h, _, _ in got} == {1, 2} and len(got) == 2


def test_video_banded_planted_pairs_and_length_keying(spark):
    """Variable-length video prints (len = 4n - 1): planted Hamming-1/2
    pairs match within a frame count; a print of a DIFFERENT frame count
    whose leading band is byte-identical to the 4-frame base must never
    pair (the flen join key separates them); a Hamming-3 control within
    the same length is killed by the verify."""
    v4 = "101010101010101"  # n=4: 12 spatial + 3 temporal bits
    prints = {
        v4: 2,
        _flip(v4, 0): 1,        # d=1, band 0
        _flip(v4, 6, 12): 3,    # d=2, bands 1 and 2
        _flip(v4, 1, 7, 13): 1, # d=3 control (shares no band with v4... or any)
        # n=5 print (len 19) whose first 6 chars == v4's band 0: without the
        # flen key this would bucket with v4 in band 0
        v4[:6] + "1110001110001": 4,
    }
    assert len(v4[:6] + "1110001110001") == 19
    got = _run(spark, prints, _VIDEO_BANDS_SQL, extra_keys=("flen",))
    want = _brute_pairs(prints)  # _brute_pairs already skips cross-length
    assert got == want
    assert {h for _, _, h, _, _ in got} == {1, 2} and len(got) == 2
    # no cross-length pair leaked
    assert all(len(a) == len(b) for a, b, _, _, _ in got)


def test_video_banded_hamming_2_same_band_pair_still_found(spark):
    """Both flips inside ONE band (the worst case for band sharing): the
    other two bands still match, so the pair is found — the 3-band layout
    guarantees recall at Hamming<=2."""
    v4 = "110011001100110"
    prints = {v4: 1, _flip(v4, 2, 4): 1}  # both flips in band 0
    got = _run(spark, prints, _VIDEO_BANDS_SQL, extra_keys=("flen",))
    assert len(got) == 1 and next(iter(got))[2] == 2


def test_image_banded_exact_group_pairs_are_superset_base(spark):
    """Exact duplicates collapse into one print row upstream (groupBy fp),
    so the pair space starts where exact grouping ends: two identical
    prints never produce a self-pair, and the counts carry the group
    sizes. Banded >= exact-group pairing holds vacuously; pin the boundary:
    Hamming 0 between DISTINCT rows cannot occur."""
    base = "0011" * 16
    prints = {base: 7, _flip(base, 63): 2}
    got = _run(spark, prints, _IMAGE_BANDS_SQL)
    assert got == _brute_pairs(prints) and len(got) == 1
    (a, b, h, n_a, n_b) = next(iter(got))
    assert h == 1 and n_a == prints[a] and n_b == prints[b]


def test_skewed_print_corpus_buckets_bounded_by_distinct_prints(spark):
    """Boilerplate skew stress (round-10 verdict #5): >=25% of a corpus
    carries ONE identical print. The matchers join on (k, band) over
    DISTINCT prints — the groupBy collapse in front of banded_print_pairs —
    so the hot print contributes exactly one row per band and the hottest
    bucket is bounded by the number of DISTINCT prints sharing a band
    value, never by document multiplicity. Pinned here by measuring the
    bands frame directly; banded output still equals brute force."""
    import random

    rng = random.Random(9)
    boiler = "0110100110010110" * 4  # the 64-bit boilerplate print
    distinct = {boiler}
    while len(distinct) < 200:
        distinct.add("".join(rng.choice("01") for _ in range(64)))

    # 40,000 docs: 10,000 (25%) share the boilerplate print, the rest
    # spread over the other 199 prints round-robin
    others = sorted(distinct - {boiler})
    rows = [(i, boiler) for i in range(10_000)] + [
        (10_000 + i, others[i % len(others)]) for i in range(30_000)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, fp string")

    # the callers' pre-collapse: one row per DISTINCT print, doc count kept
    prints = docs.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
    n_prints = prints.count()
    assert n_prints == 200  # 40k docs -> 200 print rows before banding

    # bucket sizes measured on the bands frame the matcher actually joins
    bands = (
        prints.select(F.col("fp"), F.col("n"))
        .select("*", F.explode(F.expr(_IMAGE_BANDS_SQL)).alias("bk"))
        .select("fp", "bk.k", "bk.band")
    )
    buckets = bands.groupBy("k", "band").agg(F.count(F.lit(1)).alias("sz"))
    max_bucket = buckets.agg(F.max("sz")).first()[0]

    # ground truth: distinct prints per (k, band) computed driver-side
    from collections import Counter

    c = Counter()
    for fp in distinct:
        for k in range(8):
            c[(k, fp[k * 8 : (k + 1) * 8])] += 1
    assert max_bucket == max(c.values())
    # the hottest bucket is a tiny fraction of the doc count: the 10k-doc
    # boilerplate print is ONE row, and 8-bit bands over 200 random prints
    # collide at ~200/256 per band value
    assert max_bucket <= 10  # measured 5 with this seed; docs would be 10,000

    # correctness under skew: banded == brute force over the print space
    got = {
        (r.fp_a, r.fp_b, r.hamming, r.n_a, r.n_b)
        for r in banded_print_pairs(prints, "fp", "n", _IMAGE_BANDS_SQL).collect()
    }
    cnt = {r.fp: r.n for r in prints.collect()}
    want = _brute_pairs(cnt)
    assert got == want
