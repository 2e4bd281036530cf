"""Streaming join-view maintenance: per-epoch delta algebra correctness
and redelivered-batch idempotency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realestatedeals_spark.plans.streaming_join_view import _JoinView


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "src string, ver bigint, k bigint, custkey bigint, rev bigint, sign bigint"
    )


def _view(view):
    cur = view.current()
    return {} if cur is None else {
        r["custkey"]: (r["n_items"], r["rev_micros"]) for r in cur.collect()
    }


def test_epoch_algebra_and_redelivery(spark, tmp_path):
    v = _JoinView(spark, str(tmp_path / "state"))
    # epoch 0: A{k=1->cust 10}, B{k=1, rev 100}
    b0 = _batch(spark, [("A", 1, 1, 10, None, 1), ("B", 1, 1, None, 100, 1)])
    v.foreach_batch(b0, 0)
    assert _view(v)[10] == (1, 100)

    # epoch 1: new B row joins the ACCUMULATED A (A_prev x dB term)
    b1 = _batch(spark, [("B", 2, 1, None, 7, 1)])
    v.foreach_batch(b1, 1)
    assert _view(v)[10] == (2, 107)

    # redelivered epoch 1 must be a no-op
    v.foreach_batch(b1, 1)
    assert _view(v)[10] == (2, 107)

    # epoch 2: A-side update re-routes the custkey (pre -1 / post +1):
    # both B rows must move from cust 10 to cust 20 via dA x B_prev
    b2 = _batch(
        spark, [("A", 3, 1, 10, None, -1), ("A", 3, 1, 20, None, 1)]
    )
    v.foreach_batch(b2, 2)
    got = _view(v)
    assert got[20] == (2, 107)
    assert got.get(10, (0, 0))[0] == 0  # fully retracted

    # epoch 3: B-side delete retracts one item from the new group
    b3 = _batch(spark, [("B", 4, 1, None, 7, -1)])
    v.foreach_batch(b3, 3)
    assert _view(v)[20] == (1, 100)


def test_torn_epoch_replay_converges(spark, tmp_path):
    """A crash AFTER an epoch's delta writes but BEFORE the watermark moves
    redelivers the epoch against the previous watermark: the replay must
    overwrite its own epoch directories and converge to the same state,
    never double-fold (the pre-r12 fold-then-append order double-counted
    dV in exactly this scenario)."""
    v = _JoinView(spark, str(tmp_path / "state"))
    v.foreach_batch(
        _batch(spark, [("A", 1, 1, 10, None, 1), ("B", 1, 1, None, 100, 1)]), 0
    )
    b1 = _batch(spark, [("B", 2, 1, None, 7, 1)])
    v.foreach_batch(b1, 1)
    want = _view(v)
    # simulate the torn commit: epoch 1's directories exist, watermark says 0
    with open(v.mark, "w") as fh:
        fh.write("0")
    v.foreach_batch(b1, 1)  # replay of the torn epoch
    assert _view(v) == want
