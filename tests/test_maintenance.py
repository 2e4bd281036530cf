"""Compaction preserves content and shrinks file counts; versioned table
reads resolve latest-complete and time-travel correctly."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from realestatedeals_spark.io.maintenance import (
    VersionedTable,
    _data_files,
    compact_parquet,
)


def test_compact_shrinks_files_preserves_rows(spark):
    with tempfile.TemporaryDirectory() as root:
        path = os.path.join(root, "t")
        df = spark.range(10000).withColumn("v", F.col("id") * 3)
        df.repartition(16).write.parquet(path)
        assert len(_data_files(path)) == 16
        before = {(r.id, r.v) for r in spark.read.parquet(path).collect()}
        stats = compact_parquet(spark, path, target_bytes=1 << 30)  # all → 1 file
        assert stats["files_before"] == 16
        assert stats["files_after"] == 1
        after = {(r.id, r.v) for r in spark.read.parquet(path).collect()}
        assert after == before


def test_compact_respects_target_size(spark):
    with tempfile.TemporaryDirectory() as root:
        path = os.path.join(root, "t")
        spark.range(50000).withColumn("s", F.sha2(F.col("id").cast("string"), 256)).repartition(
            20
        ).write.parquet(path)
        total = sum(os.path.getsize(f) for f in _data_files(path))
        stats = compact_parquet(spark, path, target_bytes=total // 4 + 1)
        assert 2 <= stats["files_after"] <= 5  # ~4 target files, coalesce granularity
        assert spark.read.parquet(path).count() == 50000


def test_versioned_table_time_travel(spark):
    with tempfile.TemporaryDirectory() as root:
        t = VersionedTable(spark, os.path.join(root, "vt"))
        assert t.latest_version() is None
        v1 = t.commit(spark.range(3))
        v2 = t.commit(spark.range(5))
        assert (v1, v2) == (1, 2)
        assert t.read().count() == 5  # latest
        assert t.read(version=1).count() == 3  # time travel
        with pytest.raises(ValueError):
            t.read(version=99)


def test_commit_conflict_loser_retries_and_converges(spark):
    # optimistic concurrency: two read-modify-writers start from the same
    # snapshot; the first claim wins, the loser gets CommitConflict, re-reads
    # the advanced table, and its retry lands — nothing lost, no junk left.
    from realestatedeals_spark.io.maintenance import CommitConflict

    with tempfile.TemporaryDirectory() as root:
        t = VersionedTable(spark, os.path.join(root, "vt"))
        t.commit(spark.range(10))  # v1: ids 0..9
        base = t.latest_version()
        # both writers read v1 and derive an appended snapshot
        snap = t.read()
        a_out = snap.union(spark.range(100, 101))
        b_out = snap.union(spark.range(200, 201))
        assert t.commit(a_out, expected_latest=base) == 2  # A wins
        with pytest.raises(CommitConflict):
            t.commit(b_out, expected_latest=base)  # B's snapshot is stale
        # B retries from the new latest — converges with BOTH writes applied
        cur = t.latest_version()
        b_retry = t.read().union(spark.range(200, 201))
        assert t.commit(b_retry, expected_latest=cur) == 3
        got = {r.id for r in t.read().collect()}
        assert got == set(range(10)) | {100, 200}
        # conflict cleanup: the loser's staged directory was removed
        assert not [d for d in os.listdir(t.root) if d.startswith(".stage-")]


def test_blind_append_skips_claimed_versions(spark):
    with tempfile.TemporaryDirectory() as root:
        t = VersionedTable(spark, os.path.join(root, "vt"))
        t.commit(spark.range(2))
        # a concurrent writer (or junk) already claimed v=2 and v=3
        os.makedirs(os.path.join(root, "vt", "v=2"))
        os.makedirs(os.path.join(root, "vt", "v=3"))
        assert t.commit(spark.range(4)) == 4  # re-claims past them, no error
        assert t.read().count() == 4


def test_vacuum_stages(spark):
    with tempfile.TemporaryDirectory() as root:
        t = VersionedTable(spark, os.path.join(root, "vt"))
        os.makedirs(os.path.join(root, "vt", ".stage-deadbeef"))
        assert t.vacuum_stages() == 1
        assert t.vacuum_stages() == 0


def test_compact_recovers_from_stale_tmp_dirs(spark):
    # a crashed prior compaction leaves .compact.tmp/.compact.old behind;
    # the rerun must clear them and succeed (previously: errorifexists threw)
    with tempfile.TemporaryDirectory() as root:
        path = os.path.join(root, "t")
        spark.range(1000).repartition(4).write.parquet(path)
        spark.range(7).write.parquet(path + ".compact.tmp")
        spark.range(8).write.parquet(path + ".compact.old")
        stats = compact_parquet(spark, path, target_bytes=1 << 30)
        assert stats["files_after"] == 1
        assert spark.read.parquet(path).count() == 1000
        assert not os.path.exists(path + ".compact.tmp")
        assert not os.path.exists(path + ".compact.old")


def test_versioned_table_ignores_incomplete(spark):
    with tempfile.TemporaryDirectory() as root:
        t = VersionedTable(spark, os.path.join(root, "vt"))
        t.commit(spark.range(4))
        # simulate a crashed writer: directory without _SUCCESS
        broken = os.path.join(root, "vt", "v=2")
        os.makedirs(broken)
        assert t.versions() == [1]
        assert t.read().count() == 4
        # next commit skips past the junk directory or fails cleanly
        v = t.commit(spark.range(6))
        assert v == 2 or v == 3  # depending on collision policy
