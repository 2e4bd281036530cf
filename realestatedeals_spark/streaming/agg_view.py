"""Incremental materialized aggregate view maintenance (engine addition).

The reference maintains one cross-cycle state object — ``currentListings``,
re-saved wholesale every poll cycle (main.py:97,135,144-171). The scalable
generalization is an *incrementally maintained aggregate view*: each
micro-batch contributes only its partial aggregate, which is MERGEd into the
persistent view by combining mergeable accumulators (count→sum, sum→sum,
min→min, max→max). The view update cost is O(|batch keys|), never
O(|all keys ever|) — the property that makes a per-key aggregate over an
unbounded stream viable at 100 TB.

Implementation: ``foreachBatch`` computes the batch's per-key partial
aggregate (map-side combine inside the batch), full-outer joins it with the
current view on the key, and combines with ``coalesce``-guarded mergeable
expressions. The view is swapped atomically (write new generation directory,
then repoint); on Delta/Iceberg this is a real ``MERGE INTO`` with
transactional idempotency on retried batches — the parquet
generation-directory swap is the connector-free stand-in and is documented
as such, not hidden.

Exactness: ``value`` doubles are floored to integer micros before entering
the stream (floor(x·1e6) is bit-identical across engines and int64 sums are
associative), so the maintained view hash-matches a from-scratch groupBy —
the oracle — regardless of how the stream was micro-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VIEW_KEY = ["user_id", "event_type"]

_ACC_COLS = ("n_events", "sum_micros", "min_micros", "max_micros", "last_batch_id")


def batch_partial(batch_df: DataFrame, batch_id: int) -> DataFrame:
    """Per-key mergeable accumulators for ONE micro-batch.

    Everything here is map-side combinable; the only shuffle is the keyed
    partial aggregate of the batch itself.
    """
    return batch_df.groupBy(*VIEW_KEY).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value_micros").alias("sum_micros"),
        F.min("value_micros").alias("min_micros"),
        F.max("value_micros").alias("max_micros"),
        F.lit(batch_id).cast("long").alias("last_batch_id"),
    )


def merge_into_view(view: DataFrame | None, partial: DataFrame) -> DataFrame:
    """Combine a batch partial into the persistent view: full-outer join on
    the key + mergeable combine. Keys absent from the batch pass through
    untouched; new keys insert. On Delta this is ``MERGE INTO view USING
    partial ON keys WHEN MATCHED UPDATE ... WHEN NOT MATCHED INSERT ...``."""
    if view is None:
        return partial
    v = view.select(*VIEW_KEY, *[F.col(c).alias(f"v_{c}") for c in _ACC_COLS])
    p = partial.select(*VIEW_KEY, *[F.col(c).alias(f"p_{c}") for c in _ACC_COLS])
    j = v.join(p, VIEW_KEY, "full_outer")
    zero = F.lit(0).cast("long")
    return j.select(
        *VIEW_KEY,
        (F.coalesce("v_n_events", zero) + F.coalesce("p_n_events", zero)).alias(
            "n_events"
        ),
        (F.coalesce("v_sum_micros", zero) + F.coalesce("p_sum_micros", zero)).alias(
            "sum_micros"
        ),
        F.least(
            F.coalesce("v_min_micros", "p_min_micros"),
            F.coalesce("p_min_micros", "v_min_micros"),
        ).alias("min_micros"),
        F.greatest(
            F.coalesce("v_max_micros", "p_max_micros"),
            F.coalesce("p_max_micros", "v_max_micros"),
        ).alias("max_micros"),
        F.coalesce("p_last_batch_id", "v_last_batch_id").alias("last_batch_id"),
    )


class ParquetAggView:
    """The C6 MERGE view persisted on ``io.maintenance.VersionedTable`` —
    each merge commits a new table version through the shared stage +
    atomic-rename protocol (one writer wins per version number; a crashed
    writer leaves only a private ``.stage-*`` dir). Readers always see the
    latest *complete* version (``_SUCCESS`` marker), derived from the
    directory listing, never from in-memory state — so a restarted driver
    over an existing view root resumes exactly where the last commit left
    off (the redelivery-idempotency guard keeps working across restarts).
    Stand-in for a Delta table MERGE with transactional idempotency;
    documented as such, not hidden."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        from realestatedeals_spark.io.maintenance import VersionedTable

        self.spark = spark
        self.root = root
        self.table = VersionedTable(spark, root)

    @property
    def gen(self) -> int:
        """Latest complete version on disk (0 = empty view). Recomputed
        per call: survives driver restarts, ignores a crashed writer's
        junk (a ``v=<n>`` without ``_SUCCESS`` is invisible to readers and
        skipped past by the next commit's claim)."""
        return self.table.latest_version() or 0

    def current(self) -> DataFrame | None:
        if self.gen == 0:
            return None
        return self.table.read()

    def commit(self, merged: DataFrame) -> None:
        self.table.commit(merged)

    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # Idempotent replay: foreachBatch re-delivers a batch after a failed
        # commit, so applying twice would double-count. last_batch_id is
        # monotone across commits (batch ids are monotone within a stream),
        # making "already applied" one max() over the view — the same
        # txn-version guard a Delta MERGE gets from its commit log.
        cur = self.current()
        if cur is not None:
            applied = cur.agg(F.max("last_batch_id")).first()[0]
            if applied is not None and batch_id <= applied:
                return
        partial = batch_partial(batch_df, batch_id)
        self.commit(merge_into_view(cur, partial))
