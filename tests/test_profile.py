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
