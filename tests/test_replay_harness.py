"""Unit contract of streaming/replay.write_epoch_dirs: one single-file
parquet dir per batch, mtimes strictly increasing with batch index (and
stamped AFTER each write, so concurrent write completion order can never
leak into replay order), start offset honored for sentinel batches."""

from __future__ import annotations

import os

from realestatedeals_spark.streaming.replay import BASE_TS, STEP, write_epoch_dirs


def _mtimes(in_dir):
    out = {}
    for d in sorted(os.listdir(in_dir)):
        files = [f for f in os.listdir(os.path.join(in_dir, d)) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)  # exactly one data file per batch
        out[d] = os.path.getmtime(os.path.join(in_dir, d, files[0]))
    return out

def test_write_epoch_dirs_orders_by_stamp_not_completion(spark, tmp_path):
    # deliberately unequal batch sizes: the big batch finishes LAST under
    # concurrent writes, but its stamp must still be the EARLIEST
    big = spark.range(0, 20000).selectExpr("id AS doc_id", "repeat('x', 50) AS text")
    small1 = spark.range(20000, 20010).selectExpr("id AS doc_id", "'a' AS text")
    small2 = spark.range(20010, 20020).selectExpr("id AS doc_id", "'b' AS text")
    in_dir = str(tmp_path / "in")
    write_epoch_dirs(in_dir, [big, small1, small2])

    mt = _mtimes(in_dir)
    assert sorted(mt) == ["b0", "b1", "b2"]
    assert mt["b0"] == BASE_TS
    assert mt["b1"] == BASE_TS + STEP
    assert mt["b2"] == BASE_TS + 2 * STEP
    assert mt["b0"] < mt["b1"] < mt["b2"]

    # rows land in exactly the declared batch
    n0 = spark.read.parquet(in_dir + "/b0").count()
    assert n0 == 20000


def test_write_epoch_dirs_start_offset_for_sentinels(spark, tmp_path):
    docs = spark.range(3).selectExpr("id AS doc_id")
    sentinel = spark.range(1).selectExpr("-1 AS doc_id")
    in_dir = str(tmp_path / "in")
    write_epoch_dirs(in_dir, [docs], start=1)
    write_epoch_dirs(in_dir, [sentinel], start=4)
    mt = _mtimes(in_dir)
    assert sorted(mt) == ["b1", "b4"]
    assert mt["b4"] - mt["b1"] == 3 * STEP  # sentinel replays strictly last
