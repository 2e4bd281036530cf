"""C18 streaming HLL state: redelivery idempotency, cross-batch register
merge == rescan, and max's native at-least-once tolerance (a re-applied
contribution cannot inflate a register even without the epoch skip)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realestatedeals_spark.io.catalog import Catalog
from realestatedeals_spark.operators.sketches import hll_arith_registers
from realestatedeals_spark.plans.streaming_hll import apply_hll_batch


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _state(cat):
    return sorted((r.source, r.bucket, r.register) for r in cat.read("registers").collect())


def test_hll_fold_redelivery_noop(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    b0 = [(i, f"src{i % 2}", f"doc text {i}") for i in range(30)]
    b1 = [(i, f"src{i % 2}", f"doc text {i}") for i in range(30, 60)]
    assert apply_hll_batch(cat, _docs(spark, b0), 0) is True
    assert apply_hll_batch(cat, _docs(spark, b1), 1) is True
    before = _state(cat)
    assert apply_hll_batch(cat, _docs(spark, b0), 0) is False  # epoch skip
    assert _state(cat) == before
    assert cat.applied_epoch() == 1


def test_hll_streamed_state_equals_rescan(spark, tmp_path):
    rows = [(i, f"s{i % 3}", f"content {i * 17 % 40}") for i in range(90)]
    cat = Catalog(spark, str(tmp_path / "cat"))
    for e, lo in enumerate(range(0, 90, 30)):
        apply_hll_batch(cat, _docs(spark, rows[lo : lo + 30]), e)
    rescan = sorted(
        (r.tag, r.bucket, r.register)
        for r in hll_arith_registers(_docs(spark, rows), "source", "text").collect()
    )
    assert _state(cat) == rescan


def test_hll_max_is_at_least_once_tolerant(spark, tmp_path):
    """Even if the SAME contribution lands twice under different epochs
    (an at-least-once upstream), max-merge cannot inflate any register —
    the sketch family's native replay tolerance."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    b = [(i, "s", f"text {i}") for i in range(40)]
    apply_hll_batch(cat, _docs(spark, b), 0)
    before = _state(cat)
    apply_hll_batch(cat, _docs(spark, b), 1)  # replayed content, NEW epoch
    assert _state(cat) == before
