"""Bucketed table diff: exact added/removed/changed semantics + the
O(diff) drill-down guarantee (clean buckets never rejoin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realestatedeals_spark.operators.tablediff import bucket_digests, table_diff


def _t(spark, rows):
    return spark.createDataFrame(rows, "k bigint, a string, b bigint")


def test_diff_semantics(spark):
    left = _t(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30), (4, "w", 40)])
    right = _t(spark, [(1, "x", 10), (2, "y", 99), (4, "w", 40), (5, "v", 50)])
    got = {(r.k, r.status) for r in table_diff(left, right, "k", ["a", "b"]).collect()}
    assert got == {(2, "changed"), (3, "removed"), (5, "added")}


def test_identical_tables_diff_empty(spark):
    t = _t(spark, [(i, f"s{i}", i * 7) for i in range(200)])
    assert table_diff(t, t, "k", ["a", "b"]).count() == 0


def test_delimiter_straddling_values_detected(spark):
    # injective length-prefix encoding: ('a\x1fb','c') vs ('a','b\x1fc')
    # must NOT hash equal (a plain separator-join encoding collides here
    # and the changed key silently drops out of the diff)
    def _s(spark, rows):
        return spark.createDataFrame(rows, "k bigint, a string, b string")

    left = _s(spark, [(1, "a\x1fb", "c"), (2, "x", "y")])
    right = _s(spark, [(1, "a", "b\x1fc"), (2, "x", "y")])
    got = {(r.k, r.status) for r in table_diff(left, right, "k", ["a", "b"]).collect()}
    assert got == {(1, "changed")}
    # same for the v<len>: tag characters themselves appearing in data
    left = _s(spark, [(1, "v1:x", None)])
    right = _s(spark, [(1, "v1:xn", None)])
    got = {(r.k, r.status) for r in table_diff(left, right, "k", ["a", "b"]).collect()}
    assert got == {(1, "changed")}


def test_digest_pass_isolates_dirty_buckets(spark):
    # one mutated key → exactly the buckets containing it disagree, so the
    # drill-down join input is bucket-proportional, not table-proportional
    rows = [(i, f"s{i}", i * 7) for i in range(500)]
    left = _t(spark, rows)
    right = _t(spark, [(k, a, b + (1 if k == 123 else 0)) for k, a, b in rows])
    n_buckets = 64
    dl = bucket_digests(left, "k", ["a", "b"], n_buckets)
    dr = bucket_digests(right, "k", ["a", "b"], n_buckets)
    dirty = (
        dl.alias("l")
        .join(dr.alias("r"), "bucket")
        .filter(
            (F.col("l.hsum") != F.col("r.hsum")) | (F.col("l.hxor") != F.col("r.hxor"))
        )
        .count()
    )
    assert dirty == 1
    got = {(r.k, r.status) for r in table_diff(left, right, "k", ["a", "b"], n_buckets).collect()}
    assert got == {(123, "changed")}


def test_null_columns_compare_nullsafe(spark):
    left = _t(spark, [(1, None, 10), (2, "y", None)])
    right = _t(spark, [(1, None, 10), (2, "y", 2)])
    got = {(r.k, r.status) for r in table_diff(left, right, "k", ["a", "b"]).collect()}
    assert got == {(2, "changed")}


def test_diff_property_random_mutations(spark):
    # randomized adds/removes/changes across many bucket layouts: the
    # two-phase digest+drilldown diff must equal the exact per-key set diff
    import random

    random.seed(31)
    for trial in range(4):
        n = random.randrange(50, 200)
        rows = {k: (f"s{k}", k * 3 + trial) for k in range(n)}
        mutated = dict(rows)
        removed = set(random.sample(sorted(rows), k=random.randrange(0, 8)))
        for k in removed:
            del mutated[k]
        changed = set(
            random.sample(sorted(mutated), k=random.randrange(0, 8))
        )
        for k in changed:
            a, b = mutated[k]
            mutated[k] = (a, b + 1000)
        added = {n + i for i in range(random.randrange(0, 8))}
        for k in added:
            mutated[k] = (f"new{k}", k)
        left = _t(spark, [(k, a, b) for k, (a, b) in rows.items()])
        right = _t(spark, [(k, a, b) for k, (a, b) in mutated.items()])
        n_buckets = random.choice([4, 64, 1024])
        got = {
            (r.k, r.status)
            for r in table_diff(left, right, "k", ["a", "b"], n_buckets).collect()
        }
        want = (
            {(k, "removed") for k in removed}
            | {(k, "changed") for k in changed}
            | {(k, "added") for k in added}
        )
        assert got == want, (trial, n_buckets)
