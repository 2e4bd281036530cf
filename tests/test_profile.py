"""Sketch accuracy: approx distinct within rsd, approx percentiles sane."""

from __future__ import annotations


def test_sketches_within_tolerance(spark, sf_dir):
    from realestatedeals_spark.plans.registry import QUERIES

    exact = QUERIES["x6_profile_exact_distinct"].fn(spark, sf_dir).first()
    approx = QUERIES["x6_profile_sketches"].fn(spark, sf_dir).first()
    for e, a in [
        (exact["distinct_parts"], approx["approx_parts"]),
        (exact["distinct_suppliers"], approx["approx_suppliers"]),
        (exact["distinct_orders"], approx["approx_orders"]),
    ]:
        assert abs(a - e) / e < 0.05, (e, a)
    q = [approx["price_q25"], approx["price_q50"], approx["price_q75"], approx["price_q99"]]
    assert q == sorted(q)


def test_hll_mergeable_estimates_within_bounds(spark, sf_dir):
    """Per-source and merged-global HLL estimates must land within the
    configured sketch's error bounds of the exact distinct counts, and the
    merged global estimate must equal sketching the union directly (the
    mergeability property the 100 TB rollup relies on)."""
    from pyspark.sql import functions as F

    from realestatedeals_spark.plans.llm_profile import x6_hll_mergeable

    out = {r["source"]: r for r in x6_hll_mergeable(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hashed = docs.select("source", F.xxhash64("text").alias("h"))
    exact = {
        r["source"]: r["d"]
        for r in hashed.groupBy("source").agg(F.count_distinct("h").alias("d")).collect()
    }
    exact["__global__"] = hashed.select("h").distinct().count()
    for src, want in exact.items():
        got = out[src]["est_distinct"]
        # lgK=12 HLL relative standard error ~1.6%; allow 4 sigma + slack 2
        assert abs(got - want) <= max(2, 0.07 * want), (src, got, want)

    direct = (
        hashed.agg(F.hll_sketch_estimate(F.hll_sketch_agg("h", F.lit(12))).alias("e"))
        .first()["e"]
    )
    assert abs(out["__global__"]["est_distinct"] - direct) <= max(2, 0.02 * direct)
