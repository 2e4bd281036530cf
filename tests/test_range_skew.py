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
