"""C17 streaming media dedup: redelivery idempotency and streamed print
groups == batch groups (the oracle pins the same equality end-to-end)."""

from __future__ import annotations

from realestatedeals_spark.io.catalog import Catalog
from realestatedeals_spark.plans.streaming_media import apply_media_batch


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def test_media_fold_redelivery_noop(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    assert apply_media_batch(cat, _ids(spark, [0, 40, 80]), 0) is True  # one base
    assert apply_media_batch(cat, _ids(spark, [1, 2]), 1) is True
    before = sorted(
        (r.fp, r.n_tracks, r.min_track, r.max_track)
        for r in cat.read("prints").collect()
    )
    assert apply_media_batch(cat, _ids(spark, [0, 40, 80]), 0) is False
    after = sorted(
        (r.fp, r.n_tracks, r.min_track, r.max_track)
        for r in cat.read("prints").collect()
    )
    assert after == before
    # the three volume variants of base 0 collapsed into one print group
    groups = {r.n_tracks for r in cat.read("prints").collect()}
    assert 3 in groups and cat.applied_epoch() == 1


def test_cross_batch_group_merge(spark, tmp_path):
    """The same base arriving in DIFFERENT batches must merge into one
    group with correct count and min/max."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    apply_media_batch(cat, _ids(spark, [5]), 0)
    apply_media_batch(cat, _ids(spark, [45]), 1)    # base 5 at gain 2
    apply_media_batch(cat, _ids(spark, [85, 6]), 2)  # base 5 at gain 3 + base 6
    rows = {r.min_track: r for r in cat.read("prints").collect()}
    assert rows[5].n_tracks == 3 and rows[5].max_track == 85
    assert rows[6].n_tracks == 1
