"""C12 — STREAMING incremental maintenance of a join view (the per-epoch
form of io_cdf_join_view's whole-history algebra).

Two change-data feeds (orders and lineitem mutations, signed rows) arrive
interleaved as file micro-batches; ``foreachBatch`` applies the DBSP /
differential-dataflow bilinear delta rule per epoch:

    dV = dA x B_prev  +  A_prev x dB  +  dA x dB

and folds dV into a persisted aggregate view, then appends the deltas to
the accumulated relations. Each epoch therefore costs O(|delta| x match)
— the snapshots are only ever touched on the join key of the incoming
delta, never rescanned — which is the cost model that keeps a 100 TB
fact-join view maintainable. A batch-id watermark makes redelivered
epochs no-ops (same guard as the SCD2 stream). The final view must
hash-match the same from-scratch oracle as io_cdf_join_view: streaming
epochs == whole-history algebra == batch recompute, bit-for-bit.

Reference parity: the reference recomputes its derived state from the
whole JSON snapshot each poll cycle (main.py:98-143); this is that
refresh done as O(changes) per cycle with deletes/updates handled.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestatedeals_spark.io.maintenance import VersionedTable
from realestatedeals_spark.io.sources import load_table
from realestatedeals_spark.plans.mor_delete_plan import _CDF_JOIN_VIEW_ORACLE
from realestatedeals_spark.plans.registry import register
from realestatedeals_spark.session import apply_session_conf
from realestatedeals_spark.streaming.replay import write_epoch_dirs

_SCHEMA = (
    "src string, ver bigint, k bigint, custkey bigint, rev bigint, sign bigint"
)


def _signed_sign() -> F.Column:
    return (
        F.when(F.col("_change_type").isin("insert", "update_postimage"), F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
    )


class _JoinView:
    """foreachBatch target: accumulated A/B relations + the running view."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        self.a_dir = os.path.join(root, "a_acc")
        self.b_dir = os.path.join(root, "b_acc")
        self.view_dir = os.path.join(root, "view")
        self.mark = os.path.join(root, "_applied_batch")

    def _read_or_none(self, path: str, schema: str) -> DataFrame | None:
        if not os.path.exists(path):
            return None
        return self.spark.read.schema(schema).parquet(path)

    def foreach_batch(self, batch: DataFrame, batch_id: int) -> None:
        # redelivery guard: an epoch already folded in must be a no-op
        if os.path.exists(self.mark):
            with open(self.mark) as fh:
                if batch_id <= int(fh.read().strip()):
                    return
        batch = batch.localCheckpoint(eager=True)
        da = batch.filter(F.col("src") == "A").select("k", "custkey", F.col("sign").alias("sa"))
        db = batch.filter(F.col("src") == "B").select(
            F.col("k").alias("kb"), "rev", F.col("sign").alias("sb")
        )
        a_prev = self._read_or_none(self.a_dir, "k bigint, custkey bigint, sa bigint")
        b_prev = self._read_or_none(self.b_dir, "kb bigint, rev bigint, sb bigint")

        terms = [da.join(db, da["k"] == db["kb"])]
        if b_prev is not None:
            terms.append(da.join(b_prev, da["k"] == b_prev["kb"]))
        if a_prev is not None:
            terms.append(a_prev.join(db, a_prev["k"] == db["kb"]))
        delta = terms[0]
        for t in terms[1:]:
            delta = delta.unionByName(t)
        dview = delta.groupBy("custkey").agg(
            F.sum(F.col("sa") * F.col("sb")).alias("n_items"),
            F.sum(F.col("sa") * F.col("sb") * F.col("rev")).alias("rev_micros"),
        )

        view_prev = self._read_or_none(
            self.view_dir, "custkey bigint, n_items bigint, rev_micros bigint"
        )
        merged = dview if view_prev is None else view_prev.unionByName(dview)
        merged = merged.groupBy("custkey").agg(
            F.sum("n_items").alias("n_items"), F.sum("rev_micros").alias("rev_micros")
        )
        tmp = self.view_dir + f".tmp-{batch_id}"
        merged.write.mode("errorifexists").parquet(tmp)
        old = self.view_dir + f".old-{batch_id}"
        if os.path.exists(self.view_dir):
            os.rename(self.view_dir, old)
        os.rename(tmp, self.view_dir)
        shutil.rmtree(old, ignore_errors=True)
        # append this epoch's deltas to the accumulated relations LAST so a
        # crash before this point replays the epoch against the old state
        da.write.mode("append").parquet(self.a_dir)
        db.write.mode("append").parquet(self.b_dir)
        with open(self.mark, "w") as fh:
            fh.write(str(batch_id))

    def current(self) -> DataFrame | None:
        return self._read_or_none(
            self.view_dir, "custkey bigint, n_items bigint, rev_micros bigint"
        )


@register(
    "c12_stream_join_view",
    oracle=_CDF_JOIN_VIEW_ORACLE,
    tags=("C12", "streaming", "view", "join", "incremental"),
)
def c12_stream_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000
                ).cast("long")
            ).alias("rev_micros")
        )
    )
    work = tempfile.mkdtemp(prefix="stream_join_view_")
    try:
        # build the same mutation history as io_cdf_join_view, then feed its
        # change logs through the stream instead of joining them wholesale
        ta = VersionedTable(spark, os.path.join(work, "orders"))
        ta.commit(orders)
        tb = VersionedTable(spark, os.path.join(work, "lineitem"))
        tb.commit(li)
        ta.delete_where(F.col("o_orderkey") % 13 == 5)
        upd_a = ta.read().filter(F.col("o_orderkey") % 11 == 2).select(
            "o_orderkey", (F.col("o_custkey") + 1000).alias("o_custkey")
        )
        ta.merge_into(upd_a, keys=["o_orderkey"])
        tb.delete_where(F.col("l_linenumber") >= 5)
        upd_b = tb.read().filter(F.col("l_orderkey") % 7 == 1).select(
            "l_orderkey", "l_linenumber", (2 * F.col("rev_micros")).alias("rev_micros")
        )
        tb.merge_into(upd_b, keys=["l_orderkey", "l_linenumber"])

        ca = ta.table_changes(keys=["o_orderkey"]).select(
            F.lit("A").alias("src"),
            F.col("_commit_version").cast("long").alias("ver"),
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("custkey"),
            F.lit(None).cast("long").alias("rev"),
            _signed_sign().alias("sign"),
        )
        cb = tb.table_changes(keys=["l_orderkey", "l_linenumber"]).select(
            F.lit("B").alias("src"),
            F.col("_commit_version").cast("long").alias("ver"),
            F.col("l_orderkey").alias("k"),
            F.lit(None).cast("long").alias("custkey"),
            F.col("rev_micros").alias("rev"),
            _signed_sign().alias("sign"),
        )
        log = ca.unionByName(cb)

        in_dir = os.path.join(work, "in")
        os.makedirs(in_dir)
        vers = sorted(r["ver"] for r in log.select("ver").distinct().collect())
        write_epoch_dirs(in_dir, [log.filter(F.col("ver") == v) for v in vers])

        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir + "/*")
        )
        view = _JoinView(spark, os.path.join(work, "state"))
        q = (
            stream.writeStream.foreachBatch(view.foreach_batch)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        final = view.current()
        assert final is not None, "stream produced no batches"
        out = final.filter(F.col("n_items") > 0).select(
            F.col("custkey").alias("o_custkey"), "n_items", "rev_micros"
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

