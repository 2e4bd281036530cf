"""operators/ranking — distributed exact rank / ntile parity vs the window
forms they replace (which serialize onto one partition)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from realestatedeals_spark.operators.ranking import global_rank, ntile_exact


def test_global_rank_matches_row_number(spark):
    df = spark.range(0, 997).select(
        (F.col("id") * 2654435761 % 1000).alias("v"), F.col("id").alias("uid")
    )
    ranked, n = global_rank(df, [F.asc("v"), F.asc("uid")], out_col="rk", num_partitions=7)
    assert n == 997
    want = df.select(
        "v", "uid", F.row_number().over(W.orderBy("v", "uid")).alias("rk")
    )
    got = {(r["v"], r["uid"]): r["rk"] for r in ranked.collect()}
    for r in want.collect():
        assert got[(r["v"], r["uid"])] == r["rk"]


def test_global_rank_desc_and_heavy_ties(spark):
    # 90% of rows share one key value — ties MUST be broken by the tiebreak
    # column and survive range partitioning splitting the tied run.
    rows = [(5 if i % 10 else i, i) for i in range(500)]
    df = spark.createDataFrame(rows, "v long, uid long")
    ranked, n = global_rank(df, [F.desc("v"), F.asc("uid")], out_col="rk", num_partitions=8)
    want = {
        (r["v"], r["uid"]): r["rk"]
        for r in df.select(
            "v", "uid", F.row_number().over(W.orderBy(F.desc("v"), F.asc("uid"))).alias("rk")
        ).collect()
    }
    got = {(r["v"], r["uid"]): r["rk"] for r in ranked.collect()}
    assert got == want and n == 500


def test_ntile_exact_matches_ntile_including_uneven_split(spark):
    # 10 rows into 4 buckets -> sizes 3,3,2,2 (the uneven arithmetic);
    # also n=3 < buckets=4 -> each row its own bucket.
    for n_rows, buckets in [(10, 4), (3, 4), (97, 4), (96, 4)]:
        df = spark.range(n_rows).select(F.col("id").alias("uid"))
        got = {
            r["uid"]: r["q"]
            for r in ntile_exact(
                df, [("uid", "asc")], buckets, out_col="q", num_partitions=5
            ).collect()
        }
        want = {
            r["uid"]: r["q"]
            for r in df.select(
                "uid", F.ntile(buckets).over(W.orderBy("uid")).cast("long").alias("q")
            ).collect()
        }
        assert got == want, f"ntile mismatch at n={n_rows}"


def test_time_tiles_matches_ntile_membership(spark):
    """streaming/replay.time_tiles must reproduce ntile's tile membership
    exactly (the replay oracles depend on batch boundaries), including
    duplicate composite keys never straddling determinism and the uneven
    split — without any unpartitioned window in the tile plans."""
    import datetime

    from realestatedeals_spark.streaming.replay import time_tiles
    from realestatedeals_spark.util import unpartitioned_windows

    base = datetime.datetime(2024, 3, 10, 0, 30)  # crosses a US DST jump
    rows = [
        (i, base + datetime.timedelta(minutes=17 * (i % 50)), f"u{i % 7}")
        for i in range(101)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id string")
    tiles = time_tiles(df, 3)
    want = df.select(
        "event_id", F.ntile(3).over(W.orderBy("ts", "event_id")).alias("tile")
    ).collect()
    want_by_tile = {
        k: {r["event_id"] for r in want if r["tile"] == k} for k in (1, 2, 3)
    }
    for k, t in enumerate(tiles, start=1):
        got = {r["event_id"] for r in t.collect()}
        assert got == want_by_tile[k], f"tile {k} membership diverged"
        plan = t._jdf.queryExecution().executedPlan().toString()
        assert unpartitioned_windows(plan) == 0


def test_global_rank_and_tiles_degenerate_inputs(spark):
    """Empty frames and n < n_tiles must not crash or mis-bucket: empty →
    all-empty tiles and total 0; 2 rows into 3 tiles → ntile's own
    placement (one row in each of the first two tiles, third empty)."""
    import datetime

    from realestatedeals_spark.operators.ranking import global_rank, ntile_exact
    from realestatedeals_spark.streaming.replay import time_tiles

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long"
    )
    ranked, n = global_rank(empty, [F.asc("ts"), F.asc("event_id")], out_col="rk")
    assert n == 0 and ranked.count() == 0
    assert all(t.count() == 0 for t in time_tiles(empty, 3))

    two = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 7), (2, datetime.datetime(2024, 1, 2), 8)],
        "event_id long, ts timestamp, user_id long",
    )
    tiles = time_tiles(two, 3)
    assert [t.count() for t in tiles] == [1, 1, 0]
    q = ntile_exact(two, [("ts", "asc"), ("event_id", "asc")], 3, out_col="q")
    assert sorted(r["q"] for r in q.collect()) == [1, 2]


def test_ntile_exact_desc_and_no_retained_storage(spark):
    """Buckets under a DESC-first composite order must match the window
    form, and — the ADVICE-r11 leak fix — consuming the ntile output must
    leave NO localCheckpoint blocks behind (the rank checkpoint is released
    inside the call, before the caller ever sees a frame)."""
    rows = [(i * 2654435761 % 97, i) for i in range(211)]
    df = spark.createDataFrame(rows, "v long, uid long")
    before = {
        r.id() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }
    got = {
        r["uid"]: r["q"]
        for r in ntile_exact(
            df, [("v", "desc"), ("uid", "asc")], 4, out_col="q", num_partitions=6
        ).collect()
    }
    want = {
        r["uid"]: r["q"]
        for r in df.select(
            "uid",
            F.ntile(4).over(W.orderBy(F.desc("v"), F.asc("uid"))).cast("long").alias("q"),
        ).collect()
    }
    assert got == want
    after = {r.id() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    assert after <= before, "ntile_exact retained executor storage"
