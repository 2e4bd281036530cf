"""Incremental aggregate view (C6): merge semantics + batching invariance.

The load-bearing property: the maintained view equals a from-scratch groupBy
no matter how the stream was sliced into micro-batches — true iff every
accumulator is mergeable and the MERGE combine is correct for inserts
(new key), updates (key in both), and passthrough (key only in the view).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from realestatedeals_spark.streaming.agg_view import (
    ParquetAggView,
    batch_partial,
    merge_into_view,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_type string, value_micros bigint"
    )


def _snap(df):
    return {
        (r.user_id, r.event_type): (r.n_events, r.sum_micros, r.min_micros, r.max_micros)
        for r in df.collect()
    }


def test_merge_insert_update_passthrough(spark):
    b1 = _events(spark, [(1, "a", 10), (1, "a", -5), (2, "b", 7)])
    b2 = _events(spark, [(1, "a", 100), (3, "c", 1)])  # update 1a, insert 3c, 2b untouched
    view = merge_into_view(batch_partial(b1, 0), batch_partial(b2, 1))
    got = _snap(view)
    assert got[(1, "a")] == (3, 105, -5, 100)
    assert got[(2, "b")] == (1, 7, 7, 7)
    assert got[(3, "c")] == (1, 1, 1, 1)
    bids = {(r.user_id, r.event_type): r.last_batch_id for r in view.collect()}
    assert bids == {(1, "a"): 1, (2, "b"): 0, (3, "c"): 1}


def test_batching_invariance(spark):
    rows = [(i % 5, "t" if i % 2 else "u", (i * 37) % 101 - 50) for i in range(60)]
    all_at_once = batch_partial(_events(spark, rows), 0)
    v = None
    for k in range(6):  # 6 uneven slices
        chunk = rows[k * 10 : (k + 1) * 10]
        v = merge_into_view(v, batch_partial(_events(spark, chunk), k))
    assert _snap(v) == _snap(all_at_once)


def test_parquet_view_generations(spark):
    with tempfile.TemporaryDirectory() as root:
        view = ParquetAggView(spark, os.path.join(root, "v"))
        assert view.current() is None
        view.foreach_batch(_events(spark, [(1, "a", 5)]), 0)
        view.foreach_batch(_events(spark, [(1, "a", 3), (2, "a", 9)]), 1)
        got = _snap(
            view.current().select(
                "user_id", "event_type", "n_events", "sum_micros", "min_micros", "max_micros"
            )
        )
        assert got == {(1, "a"): (2, 8, 3, 5), (2, "a"): (1, 9, 9, 9)}
        assert view.gen == 2


def test_restarted_driver_resumes_from_disk(spark):
    # the generation counter is derived from on-disk _SUCCESS markers, so a
    # fresh ParquetAggView over an existing root (= driver restart) sees the
    # committed state AND keeps the redelivery guard working across restarts.
    with tempfile.TemporaryDirectory() as root:
        path = os.path.join(root, "v")
        v1 = ParquetAggView(spark, path)
        v1.foreach_batch(_events(spark, [(1, "a", 5)]), 0)
        v1.foreach_batch(_events(spark, [(1, "a", 3)]), 1)
        del v1  # driver restart
        v2 = ParquetAggView(spark, path)
        assert v2.gen == 2
        before = _snap(
            v2.current().select(
                "user_id", "event_type", "n_events", "sum_micros", "min_micros", "max_micros"
            )
        )
        assert before == {(1, "a"): (2, 8, 3, 5)}
        v2.foreach_batch(_events(spark, [(1, "a", 3)]), 1)  # redelivered pre-restart batch
        assert v2.gen == 2  # guard held: no double-apply
        v2.foreach_batch(_events(spark, [(2, "b", 7)]), 2)  # new work continues
        assert v2.gen == 3
        got = _snap(
            v2.current().select(
                "user_id", "event_type", "n_events", "sum_micros", "min_micros", "max_micros"
            )
        )
        assert got == {(1, "a"): (2, 8, 3, 5), (2, "b"): (1, 7, 7, 7)}


def test_view_ignores_incomplete_generation(spark):
    # a crashed writer's half-written generation (no _SUCCESS) is invisible
    # to readers and does not collide with the next commit.
    with tempfile.TemporaryDirectory() as root:
        path = os.path.join(root, "v")
        view = ParquetAggView(spark, path)
        view.foreach_batch(_events(spark, [(1, "a", 5)]), 0)
        os.makedirs(os.path.join(path, "v=2"))  # junk, no _SUCCESS
        assert view.gen == 1
        view.foreach_batch(_events(spark, [(1, "a", 1)]), 1)
        assert view.gen == 3  # claimed past the junk dir
        got = _snap(
            view.current().select(
                "user_id", "event_type", "n_events", "sum_micros", "min_micros", "max_micros"
            )
        )
        assert got == {(1, "a"): (2, 6, 1, 5)}


def test_registered_c6_matches_batch_groupby(spark, sf_dir):
    from realestatedeals_spark.io.sources import load_events
    from realestatedeals_spark.plans.streaming_view import c6_incremental_agg_view

    got = _snap(c6_incremental_agg_view(spark, sf_dir))
    ev = load_events(spark, sf_dir)
    want = _snap(
        ev.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000000.0).cast("long")).alias("sum_micros"),
            F.min(F.floor(F.col("value") * 1000000.0).cast("long")).alias("min_micros"),
            F.max(F.floor(F.col("value") * 1000000.0).cast("long")).alias("max_micros"),
        )
    )
    assert got == want


def test_replayed_batch_is_idempotent(spark):
    # foreachBatch redelivers after a failed epoch commit: the same batch_id
    # applied twice must leave the view unchanged.
    with tempfile.TemporaryDirectory() as root:
        view = ParquetAggView(spark, os.path.join(root, "v"))
        b0 = _events(spark, [(1, "a", 5)])
        b1 = _events(spark, [(1, "a", 3)])
        view.foreach_batch(b0, 0)
        view.foreach_batch(b1, 1)
        before = _snap(
            view.current().select(
                "user_id", "event_type", "n_events", "sum_micros", "min_micros", "max_micros"
            )
        )
        gen_before = view.gen
        view.foreach_batch(b1, 1)  # redelivery
        after = _snap(
            view.current().select(
                "user_id", "event_type", "n_events", "sum_micros", "min_micros", "max_micros"
            )
        )
        assert after == before
        assert view.gen == gen_before
