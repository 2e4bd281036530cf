"""Multi-table atomic catalog commits: torn-pair impossibility, lost-update
freedom under concurrent blind commits, CAS conflicts, snapshot isolation."""

from __future__ import annotations

import threading

import pytest

from realestatedeals_spark.io.catalog import Catalog
from realestatedeals_spark.io.maintenance import CommitConflict


def _df(spark, marker: int):
    return spark.createDataFrame([(marker, f"m{marker}")], "k long, tag string")


def test_two_table_commit_is_atomic_to_readers(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    v1 = cat.commit({"facts": _df(spark, 1), "view": _df(spark, 100)})
    assert [r.k for r in cat.read("facts").collect()] == [1]
    assert [r.k for r in cat.read("view").collect()] == [100]

    # a torn writer: table data published (phase 1) but NO catalog version —
    # readers keep the old consistent pair, never one side of the new one
    cat.table("facts").commit(_df(spark, 2))
    assert cat.latest_version() == v1
    assert [r.k for r in cat.read("facts").collect()] == [1]

    # the completed transaction flips both at once
    v2 = cat.commit({"facts": _df(spark, 2), "view": _df(spark, 200)})
    assert v2 == v1 + 1
    assert [r.k for r in cat.read("facts").collect()] == [2]
    assert [r.k for r in cat.read("view").collect()] == [200]


def test_snapshot_isolation_across_catalog_versions(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    v1 = cat.commit({"a": _df(spark, 1), "b": _df(spark, 10)})
    cat.commit({"a": _df(spark, 2), "b": _df(spark, 20)})
    # a reader pinned at v1 keeps the CONSISTENT OLD PAIR
    assert [r.k for r in cat.read("a", v1).collect()] == [1]
    assert [r.k for r in cat.read("b", v1).collect()] == [10]
    assert [r.k for r in cat.read("a").collect()] == [2]


def test_concurrent_blind_commits_lose_no_updates(spark, tmp_path):
    """8 threads blind-commit disjoint tables; every thread's update must be
    visible in the FINAL pins (the lost-update hazard of read-merge-write),
    every catalog version must be derived from its predecessor, and version
    numbers must be gapless."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.commit({"seed": _df(spark, 0)})
    errs: list[Exception] = []

    def worker(i: int) -> None:
        try:
            cat.commit({f"t{i}": _df(spark, i)})
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    vs = cat.versions()
    assert vs == list(range(1, 10))  # seed + 8, gapless
    final = cat.pins()
    assert {f"t{i}" for i in range(8)} <= set(final)  # nothing lost
    # monotone merge: each manifest contains every table of its predecessor
    for a, b in zip(vs, vs[1:]):
        assert set(cat.pins(a)) <= set(cat.pins(b))
    for i in range(8):
        assert [r.k for r in cat.read(f"t{i}").collect()] == [i]


def test_cas_commit_conflicts_instead_of_silently_merging(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    v1 = cat.commit({"a": _df(spark, 1)})
    cat.commit({"a": _df(spark, 2)})  # catalog moves under the CAS writer
    with pytest.raises(CommitConflict, match="catalog moved"):
        cat.commit({"a": _df(spark, 3)}, expected_latest=v1)
    # the loser's phase-1 table version is stranded garbage, not visible
    assert [r.k for r in cat.read("a").collect()] == [2]


def test_referenced_table_versions_feeds_retention(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.commit({"a": _df(spark, 1)})
    cat.commit({"a": _df(spark, 2)})
    cat.commit({"b": _df(spark, 9)})  # carries a's pin forward unchanged
    refs = cat.referenced_table_versions("a")
    assert len(refs) == 2  # two distinct pinned versions of a
    assert cat.referenced_table_versions("b") == {cat.pins()["b"]}


def test_catalog_expire_drops_only_unreferenced_versions(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.commit({"a": _df(spark, 1), "b": _df(spark, 10)})
    cat.commit({"a": _df(spark, 2)})
    cat.commit({"a": _df(spark, 3)})
    removed = cat.expire(keep_last=2)  # catalog v2, v3 survive
    assert cat.versions() == [2, 3]
    # a's v pinned only by catalog v1 is gone; pins of v2/v3 survive
    assert removed["a"], "expected at least one expired version of a"
    assert [r.k for r in cat.read("a", 2).collect()] == [2]
    assert [r.k for r in cat.read("a", 3).collect()] == [3]
    # b is pinned (carried forward) by surviving manifests: nothing removed
    assert removed["b"] == []
    assert [r.k for r in cat.read("b").collect()] == [10]


def test_stream_catalog_txn_redelivery_is_noop(spark, tmp_path):
    """foreachBatch redelivery: re-applying an epoch already recorded in
    the newest manifest must change NOTHING (no new catalog version, no
    table writes) — crash-after-publish recovery."""
    from realestatedeals_spark.plans.streaming_catalog import apply_batch

    cat = Catalog(spark, str(tmp_path / "cat"))
    b0 = spark.createDataFrame(
        [(1, 7, "click", 1.5), (2, 8, "view", 2.5)],
        "event_id long, user_id long, event_type string, value double",
    )
    assert apply_batch(cat, b0, 0) is True
    v_after = cat.latest_version()
    rows_after = sorted(
        (r.event_type, r.n_events, r.value_micros)
        for r in cat.read("agg_view").collect()
    )
    # redeliver epoch 0 (and a stale epoch below it): both no-ops
    assert apply_batch(cat, b0, 0) is False
    assert apply_batch(cat, b0, -1) is False
    assert cat.latest_version() == v_after
    assert cat.applied_epoch() == 0
    # a NEW epoch applies on top
    b1 = spark.createDataFrame(
        [(3, 7, "click", 4.0)],
        "event_id long, user_id long, event_type string, value double",
    )
    assert apply_batch(cat, b1, 1) is True
    got = {r.event_type: (r.n_events, r.value_micros) for r in cat.read("agg_view").collect()}
    assert got["click"] == (2, 5500000) and got["view"] == (1, 2500000)
    assert rows_after != sorted((k, v[0], v[1]) for k, v in got.items())


def test_branch_write_audit_publish_flow(spark, tmp_path):
    """Iceberg-style WAP: stage on a branch (main readers unaffected),
    audit the staged data, then merge = one atomic publish on main."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.commit({"facts": _df(spark, 1), "view": _df(spark, 10)})
    cat.create_branch("audit")
    cat.commit({"facts": _df(spark, 2), "view": _df(spark, 20)}, branch="audit")
    # isolation: main still serves the old consistent pair
    assert [r.k for r in cat.read("facts").collect()] == [1]
    assert [r.k for r in cat.read("facts", branch="audit").collect()] == [2]
    # "audit" passes; publish
    cat.merge("audit")
    assert [r.k for r in cat.read("facts").collect()] == [2]
    assert [r.k for r in cat.read("view").collect()] == [20]


def test_branch_merge_conflicts_when_target_moved_same_table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.commit({"facts": _df(spark, 1)})
    cat.create_branch("wip")
    cat.commit({"facts": _df(spark, 2)}, branch="wip")
    cat.commit({"facts": _df(spark, 3)})  # main moves the SAME table
    v_main = cat.latest_version()
    with pytest.raises(CommitConflict, match="conflicts on tables \\['facts'\\]"):
        cat.merge("wip")
    assert cat.latest_version() == v_main  # nothing published
    assert [r.k for r in cat.read("facts").collect()] == [3]


def test_branch_merge_is_clean_when_changes_are_disjoint(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.commit({"x": _df(spark, 1), "y": _df(spark, 10)})
    cat.create_branch("wip")
    cat.commit({"y": _df(spark, 20)}, branch="wip")
    cat.commit({"x": _df(spark, 2)})  # main moves a DIFFERENT table
    cat.merge("wip")
    assert [r.k for r in cat.read("x").collect()] == [2]   # main's move kept
    assert [r.k for r in cat.read("y").collect()] == [20]  # branch's change in


def test_expire_protects_branch_pins(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.commit({"a": _df(spark, 1)})
    cat.create_branch("keepme")
    cat.commit({"a": _df(spark, 2)})
    cat.commit({"a": _df(spark, 3)})
    cat.expire(keep_last=1)  # main keeps only the head manifest...
    # ...but the branch still pins a's ORIGINAL version: it must survive
    assert [r.k for r in cat.read("a", branch="keepme").collect()] == [1]
    assert [r.k for r in cat.read("a").collect()] == [3]


def test_branch_merge_preserves_applied_epoch(spark, tmp_path):
    """A branch merge between streaming commits must carry the target
    head's applied-epoch watermark forward, not clobber it to None —
    otherwise the next redelivered foreachBatch epoch would re-apply."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.commit({"facts": _df(spark, 1)})
    cat.create_branch("wip")
    cat.commit({"extra": _df(spark, 5)}, branch="wip")
    # a streaming sink stamps epoch 3 on main after the fork
    cat.commit({"view": _df(spark, 9)}, epoch=3)
    assert cat.applied_epoch() == 3
    cat.merge("wip")  # disjoint tables: merges cleanly
    # watermark survives the merge; a redelivery of epoch <= 3 still skips
    assert cat.applied_epoch() == 3
    assert [r.k for r in cat.read("extra").collect()] == [5]


def test_manifest_bad_version_raises_typed_value_error(spark, tmp_path):
    """Reading a catalog version that never existed (or that a concurrent
    expire() deleted) surfaces the catalog API's typed ValueError, not a
    raw FileNotFoundError."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.commit({"a": _df(spark, 1)})
    with pytest.raises(ValueError, match="no such catalog version 99"):
        cat.pins(version=99)
    with pytest.raises(ValueError, match="on branch 'main'"):
        cat.read("a", version=42)


def test_commit_drops_tables_transactionally(spark, tmp_path):
    """DROP TABLE in a transaction: the replacement and the retirements
    publish under one manifest; time travel to the pre-drop version still
    resolves; updating and dropping the same table is a typed error, as is
    dropping a table that was never pinned."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    v1 = cat.commit({"d0": _df(spark, 1), "d1": _df(spark, 2)})
    v2 = cat.commit({"merged": _df(spark, 3)}, drops=["d0", "d1"])
    assert sorted(cat.pins()) == ["merged"]
    with pytest.raises(ValueError, match="not in catalog"):
        cat.read("d0")
    # time travel: the pre-drop manifest still pins the deltas
    assert [r.k for r in cat.read("d0", version=v1).collect()] == [1]
    assert [r.k for r in cat.read("merged", version=v2).collect()] == [3]
    with pytest.raises(ValueError, match="both updated and dropped"):
        cat.commit({"merged": _df(spark, 4)}, drops=["merged"])
    with pytest.raises(ValueError, match="cannot drop unpinned"):
        cat.commit({}, drops=["ghost"])
    # a dropped name can be re-introduced later
    cat.commit({"d0": _df(spark, 9)})
    assert [r.k for r in cat.read("d0").collect()] == [9]


def test_expire_reclaims_dropped_tables(spark, tmp_path):
    """After a transactional drop, expire() must still visit the table
    (it is pinned by NO surviving manifest, so pin-derived enumeration
    would skip it) and reclaim every non-head version; the head survives
    by the in-flight-phase-1 protection contract, so a fully-dropped
    table shrinks to one bounded version."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.commit({"d0": _df(spark, 1)})
    cat.commit({"d0": _df(spark, 2)})  # d0 now has versions 1 and 2
    cat.commit({"merged": _df(spark, 3)}, drops=["d0"])
    removed = cat.expire(keep_last=1)
    assert removed.get("d0") == [1]  # non-head reclaimed
    assert cat.table("d0").versions() == [2]  # bounded head remains
    assert sorted(cat.pins()) == ["merged"]


def test_epochless_commit_preserves_applied_epoch(spark, tmp_path):
    """The applied-epoch watermark is monotone: a maintenance commit with
    no epoch (compaction, manual table update) interleaved with streaming
    sinks carries the previous manifest's epoch forward instead of
    clobbering it to None — otherwise a redelivered foreachBatch epoch
    would re-apply (round-8 ADVICE, medium)."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.commit({"facts": _df(spark, 1)}, epoch=5)
    assert cat.applied_epoch() == 5
    cat.commit({"other": _df(spark, 2)})  # epoch-less maintenance commit
    assert cat.applied_epoch() == 5
    # an explicit newer epoch still advances the watermark
    cat.commit({"facts": _df(spark, 3)}, epoch=6)
    assert cat.applied_epoch() == 6


def test_catalog_scan_lease_protects_snapshot_from_expire(spark, tmp_path):
    """Catalog.scan leases the manifest AND every pinned member-table
    version: a concurrent Catalog.expire reclaims nothing the scan needs,
    the mid-scan read stays intact, and once the scan exits the next
    expire pass reclaims the old snapshot. An un-leased reader of the
    expired catalog version gets the typed ValueError."""
    import pytest

    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.commit({"facts": _df(spark, 1), "view": _df(spark, 2)})
    v1 = cat.latest_version()
    cat.commit({"facts": _df(spark, 3)})
    cat.commit({"view": _df(spark, 4)})
    with cat.scan(v1) as read:
        cat.expire(keep_last=1)
        # the leased manifest and its pinned table versions survived
        assert [r.k for r in read("facts").collect()] == [1]
        assert [r.k for r in read("view").collect()] == [2]
    # lease released: the snapshot is reclaimable now
    cat.expire(keep_last=1)
    with pytest.raises(ValueError, match="no such catalog version"):
        cat.pins(v1)
    # and the head still reads consistently
    assert [r.k for r in cat.read("facts").collect()] == [3]
    assert [r.k for r in cat.read("view").collect()] == [4]


def test_failed_write_in_concurrent_multi_table_commit_publishes_nothing(
    spark, tmp_path
):
    """Round 10 made phase-1 table writes concurrent; the crash contract
    must hold unchanged: if ANY table's write fails, commit raises, no
    catalog version is published, and readers keep the previous
    consistent snapshot — tables whose writes succeeded stay invisible
    (stranded table versions, never torn state)."""
    from pyspark.sql import functions as F

    cat = Catalog(spark, str(tmp_path / "cat"))
    v1 = cat.commit({"facts": _df(spark, 1), "view": _df(spark, 100)})

    # a frame that fails at WRITE time (division evaluated per row)
    bad = spark.range(2).select((F.lit(1) / (F.col("id") - 1)).alias("k")).select(
        F.assert_true(F.col("k") < 1e18).alias("x"), F.lit("t").alias("tag")
    )

    with pytest.raises(Exception):
        cat.commit({"facts": _df(spark, 2), "view": bad, "extra": _df(spark, 3)})

    # no new catalog version; both tables read back the OLD snapshot
    assert cat.latest_version() == v1
    assert [r.k for r in cat.read("facts").collect()] == [1]
    assert [r.k for r in cat.read("view").collect()] == [100]
    # and a subsequent full commit still works and advances cleanly
    v2 = cat.commit({"facts": _df(spark, 2), "view": _df(spark, 200)})
    assert v2 == v1 + 1
    assert [r.k for r in cat.read("facts").collect()] == [2]
