"""Range-join bucketing correctness and salted-join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from realestatedeals_spark.operators.range_join import bucketed_range_join
from realestatedeals_spark.operators.skew import salted_join


def test_bucketed_range_join_matches_naive(spark):
    fact = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 5.0, 9.999, 10.0, 25.0, 30.0, 50.0, 50.9])],
        ["id", "v"],
    )
    bands = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 30.0), ("c", 30.0, 51.0), ("ab", 5.0, 25.0)],
        ["band", "lo", "hi"],
    )
    got = {
        (r["id"], r["band"])
        for r in bucketed_range_join(fact, bands, "v", bucket_width=7.0).collect()
    }
    naive = {
        (r["id"], r["band"])
        for r in fact.join(bands, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))).collect()
    }
    assert got == naive
    # boundary semantics: 10.0 belongs to band b, not a; 50.9 to c
    assert (3, "b") in got and (3, "a") not in got and (7, "c") in got


def test_bucketed_range_join_band_on_bucket_boundary(spark):
    # a band ending exactly on a bucket edge must not leak into the next bucket
    fact = spark.createDataFrame([(1, 10.0)], ["id", "v"])
    bands = spark.createDataFrame([("x", 0.0, 10.0)], ["band", "lo", "hi"])
    assert bucketed_range_join(fact, bands, "v", bucket_width=10.0).count() == 0


def test_bucket_seq_integral_boundary_at_epoch_micros(spark):
    """An ABSOLUTE float epsilon (hi - 1e-9) is a double no-op at ~1e15, so
    boundary-aligned integer intervals would explode into one extra bucket.
    The integral path must use hi - 1 and keep the half-open claim exact."""
    from realestatedeals_spark.operators.range_join import _bucket_seq

    base = 1_700_000_000_000_000  # epoch micros, multiple of the width below
    w = 1_000_000.0
    df = spark.createDataFrame(
        [(base, base + 1_000_000), (base, base + 1)],
        "lo long, hi long",
    )
    spans = [r["s"] for r in df.select(F.size(_bucket_seq(df, "lo", "hi", w)).alias("s")).collect()]
    assert spans == [1, 1]  # boundary-aligned hi stays in exactly one bucket

    # float domain: epsilon scales with bucket width, boundary stays half-open
    fdf = spark.createDataFrame([(0.0, 10.0)], "lo double, hi double")
    assert [r["s"] for r in fdf.select(F.size(_bucket_seq(fdf, "lo", "hi", 10.0)).alias("s")).collect()] == [1]


def test_interval_overlap_join_integer_epoch_domain(spark):
    """Exactness of the overlap join on a long epoch-micros domain where the
    old epsilon silently degraded bucketization."""
    from itertools import combinations

    from realestatedeals_spark.operators.range_join import interval_overlap_join

    base = 1_700_000_000_000_000
    m = 1_000_000
    ivals = [
        (1, base, base + 10 * m),
        (2, base + 10 * m, base + 11 * m),  # touches 1 at the open boundary only
        (3, base + 5 * m, base + 20 * m),
        (4, base + 30 * m, base + 31 * m),
    ]
    df = spark.createDataFrame(
        [(i, "k", lo, hi) for i, lo, hi in ivals],
        "id long, g string, lo long, hi long",
    )
    out = interval_overlap_join(df, df, keys=["g"], bucket_width=float(m))
    got = sorted(
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in out.filter(F.col("id_a") < F.col("id_b")).collect()
    )
    want = sorted(
        (a[0], b[0]) for a, b in combinations(ivals, 2) if a[1] < b[2] and b[1] < a[2]
    )
    assert got == want


def test_salted_join_equivalence_on_skewed_keys(spark):
    # 90% of big rows share one hot key — the salting target scenario
    rows = [(("hot" if i % 10 else f"k{i}"), i) for i in range(1000)]
    big = spark.createDataFrame(rows, ["k", "v"])
    small = spark.createDataFrame([("hot", 1.0), ("k10", 2.0), ("missing", 3.0)], ["k", "w"])
    for how in ("inner", "left", "left_semi", "left_anti"):
        got = sorted(
            tuple(r) for r in salted_join(big, small, on=["k"], how=how, salt=4).collect()
        )
        want = sorted(tuple(r) for r in big.join(small, on=["k"], how=how).collect())
        assert got == want, f"salted_join diverges for how={how}"


def test_salted_join_rejects_right_joins(spark):
    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    try:
        salted_join(df, df, on=["k"], how="right")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_interval_overlap_join_dedup_free_and_exact(spark):
    """Pairs sharing MANY buckets must be emitted exactly once (canonical-
    bucket rule), and the pair set must equal the brute-force answer."""
    from itertools import combinations

    from realestatedeals_spark.operators.range_join import interval_overlap_join

    ivals = [  # (id, lo, hi) — widths from sub-bucket to many-bucket
        (1, 0.0, 100.0),
        (2, 5.0, 7.0),
        (3, 50.0, 160.0),
        (4, 99.0, 101.0),
        (5, 200.0, 210.0),
        (6, 100.0, 105.0),  # touches 1 only at the open boundary → no overlap
    ]
    df = spark.createDataFrame(
        [(i, "k", lo, hi) for i, lo, hi in ivals],
        "id long, g string, lo double, hi double",
    )
    out = interval_overlap_join(df, df, keys=["g"], bucket_width=10.0)
    got = sorted(
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in out.filter(F.col("id_a") < F.col("id_b")).collect()
    )
    want = sorted(
        (a[0], b[0])
        for a, b in combinations(ivals, 2)
        if a[1] < b[2] and b[1] < a[2]
    )
    assert got == want  # exact AND no duplicates (sorted lists compare equal)


def test_interval_overlap_count_matches_bruteforce(spark):
    """Sweep-line pair count == brute-force pair count per group, including
    the strict-overlap boundary (hi == lo does NOT overlap), tied starts
    (identical lo values DO overlap and count once), and omission of groups
    with zero overlapping pairs."""
    from itertools import combinations

    from realestatedeals_spark.operators.range_join import interval_overlap_count

    ivals = [  # (group, id, lo, hi)
        ("a", 1, 0, 100),
        ("a", 2, 5, 7),
        ("a", 3, 50, 160),
        ("a", 4, 99, 101),
        ("a", 5, 200, 210),
        ("a", 6, 100, 105),   # touches 1 only at the open boundary → no pair
        ("b", 7, 0, 10),
        ("b", 8, 0, 10),      # tied starts, identical intervals → one pair
        ("b", 9, 0, 3),       # tied start with 7 and 8
        ("c", 10, 0, 1),
        ("c", 11, 1, 2),      # chain of boundary touches → zero pairs in c
        ("c", 12, 2, 3),
    ]
    df = spark.createDataFrame(ivals, "g string, id long, lo long, hi long")
    got = {
        r["g"]: r["n_overlapping_pairs"]
        for r in interval_overlap_count(df, keys=["g"]).collect()
    }
    want: dict[str, int] = {}
    for g in ("a", "b", "c"):
        rows = [(i, lo, hi) for gg, i, lo, hi in ivals if gg == g]
        n = sum(
            1
            for x, y in combinations(rows, 2)
            if x[1] < y[2] and y[1] < x[2]
        )
        if n:
            want[g] = n
    assert got == want
    assert "c" not in got  # zero-pair group omitted (inner-join-count parity)
