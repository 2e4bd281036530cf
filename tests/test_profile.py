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


def test_approx_quantiles_rank_error_bound(spark, sf_dir):
    """GK contract: each estimate is an element of the data whose TRUE rank
    is within n/accuracy of the target rank."""
    import numpy as np

    from realestatedeals_spark.io.sources import load_table
    from realestatedeals_spark.plans import all_queries
    from realestatedeals_spark.plans.llm_profile import _QUANT_ACCURACY

    out = {r.source: r for r in all_queries()["x6_approx_quantiles"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars").toPandas()
    for source, grp in [("__global__", docs)] + list(docs.groupby("source")):
        vals = np.sort(grp["n_chars"].to_numpy())
        n = len(vals)
        row = out[source]
        assert row.n == n
        for q, est in ((0.5, row.p50), (0.9, row.p90), (0.99, row.p99)):
            assert (vals == est).any(), f"{source} p{q}: {est} not in data"
            lo = np.searchsorted(vals, est, "left")
            hi = np.searchsorted(vals, est, "right") - 1
            target = q * (n - 1)
            tol = max(n / _QUANT_ACCURACY, 1.0) + 1
            assert lo - tol <= target <= hi + tol, (source, q, est, lo, hi, target)
