"""Unit tests for the as-of join operator (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from realestatedeals_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_no_match(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", ts=_ts("2024-01-01T00:10:00"), lv=1),  # matches r@00:05
            Row(k="a", ts=_ts("2024-01-01T00:05:00"), lv=2),  # equal ts → inclusive
            Row(k="a", ts=_ts("2024-01-01T00:01:00"), lv=3),  # before any right → null
            Row(k="b", ts=_ts("2024-01-01T09:00:00"), lv=4),  # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts("2024-01-01T00:05:00"), rv=50),
            Row(k="a", ts=_ts("2024-01-01T00:02:00"), rv=20),
        ]
    )
    out = {
        r["lv"]: (r["ts_right"], r["rv"])
        for r in asof_join(left, right, on=["k"], right_cols=["rv"]).collect()
    }
    assert out[1] == (_ts("2024-01-01T00:05:00"), 50)
    assert out[2] == (_ts("2024-01-01T00:05:00"), 50)  # inclusive at equal ts
    assert out[3] == (None, None)
    assert out[4] == (None, None)


def test_asof_preserves_null_right_values(spark):
    left = spark.createDataFrame([Row(k="a", ts=_ts("2024-01-01T01:00:00"), lv=1)])
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts("2024-01-01T00:10:00"), rv=7),
            Row(k="a", ts=_ts("2024-01-01T00:20:00"), rv=None),  # newer row, null value
        ]
    )
    [row] = asof_join(left, right, on=["k"], right_cols=["rv"]).collect()
    # the matched ROW is the 00:20 one; its null value must not fall back to 7
    assert row["ts_right"] == _ts("2024-01-01T00:20:00")
    assert row["rv"] is None


def test_asof_default_right_cols_and_collision_suffix(spark):
    left = spark.createDataFrame([Row(k="a", ts=_ts("2024-01-01T01:00:00"), v=1)])
    right = spark.createDataFrame([Row(k="a", ts=_ts("2024-01-01T00:30:00"), v=9, w=3)])
    [row] = asof_join(left, right, on=["k"]).collect()
    assert row["v"] == 1 and row["v_right"] == 9 and row["w"] == 3


def test_asof_forward_small_fixture(spark):
    from realestatedeals_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10), (1, 25), (2, 5)], "uid long, ts long")
    right = spark.createDataFrame(
        [(1, 12, "a"), (1, 20, "b"), (1, 30, "c"), (2, 3, "d")], "uid long, ts long, v string"
    )
    out = {
        (r["uid"], r["ts"]): (r["ts_right"], r["v"])
        for r in asof_join(left, right, on=["uid"], direction="forward").collect()
    }
    assert out[(1, 10)] == (12, "a")   # earliest right >= 10
    assert out[(1, 25)] == (30, "c")
    assert out[(2, 5)] == (None, None)  # no right at-or-after 5 for uid 2


def test_asof_salted_equivalence_on_hot_key_fixture(spark):
    """asof_join_salted == asof_join on a 90%-hot-key fixture (VERDICT r2 #5).

    Right timestamps are unique per key so the match is deterministic; left
    timestamps include exact bucket boundaries and duplicates.
    """
    import random

    from realestatedeals_spark.operators.asof import asof_join, asof_join_salted

    rng = random.Random(7)
    left_rows = []
    for i in range(600):
        k = "hot" if i % 10 else f"cold{i % 7}"  # "hot" gets 90% of left rows
        left_rows.append((k, rng.randrange(0, 10_000), i))
    # boundary cases: left exactly on a bucket edge (width 250 below)
    left_rows += [("hot", 1000, 9001), ("hot", 250, 9002), ("nohit", 5, 9003)]
    right_ts_by_key: dict[str, set] = {}
    right_rows = []
    for i in range(2000):
        k = "hot" if i % 10 else f"cold{i % 5}"
        t = rng.randrange(0, 10_000)
        if t in right_ts_by_key.setdefault(k, set()):
            continue
        right_ts_by_key[k].add(t)
        right_rows.append((k, t, f"v{i}"))
    # a right row exactly on a bucket edge and one just before it
    for k, t in [("hot", 1000), ("hot", 999), ("hot", 250)]:
        if t not in right_ts_by_key[k]:
            right_ts_by_key[k].add(t)
            right_rows.append((k, t, f"edge{t}"))

    left = spark.createDataFrame(left_rows, "k string, ts long, lv long")
    right = spark.createDataFrame(right_rows, "k string, ts long, rv string")

    plain = asof_join(left, right, on=["k"], right_cols=["rv"])
    salted = asof_join_salted(
        left, right, on=["k"], right_cols=["rv"], bucket_width=250
    )
    assert plain.columns == salted.columns
    assert sorted(map(tuple, plain.collect()), key=lambda t: (t[0], t[1], t[2])) == sorted(
        map(tuple, salted.collect()), key=lambda t: (t[0], t[1], t[2])
    )


def test_asof_salted_no_match_and_null_right_values(spark):
    from realestatedeals_spark.operators.asof import asof_join_salted

    left = spark.createDataFrame(
        [("a", 100, 1), ("a", 5, 2), ("b", 50, 3)], "k string, ts long, lv long"
    )
    right = spark.createDataFrame(
        [Row(k="a", ts=10, rv=7), Row(k="a", ts=90, rv=None)]
    )
    out = {
        r["lv"]: (r["ts_right"], r["rv"])
        for r in asof_join_salted(
            left, right, on=["k"], right_cols=["rv"], bucket_width=16
        ).collect()
    }
    assert out[1] == (90, None)  # matched row carries its legit NULL value
    assert out[2] == (None, None)  # before any right row
    assert out[3] == (None, None)  # key with no right rows


def test_asof_salted_bad_bucket_width_raises(spark):
    import pytest as _pytest

    from realestatedeals_spark.operators.asof import asof_join_salted

    left = spark.createDataFrame([(1, 1)], "uid long, ts long")
    with _pytest.raises(ValueError):
        asof_join_salted(left, left, on=["uid"], bucket_width=0)


def test_asof_bad_direction_raises(spark):
    import pytest as _pytest

    from realestatedeals_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 1)], "uid long, ts long")
    with _pytest.raises(ValueError):
        asof_join(left, left, on=["uid"], direction="sideways")
