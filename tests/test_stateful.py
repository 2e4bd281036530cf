"""applyInPandasWithState: cross-batch per-key state inside the engine."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from realestatedeals_spark.streaming.stateful import running_user_stats

_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
    ]
)


def _run_once(spark, src: str, ckpt: str, out: str) -> None:
    stream = spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", "1").parquet(
        src + "/*"
    )

    def sink(batch_df, epoch_id):
        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out)

    q = (
        running_user_stats(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_running_user_stats_accumulates_across_batches(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    # one part-file per logical batch — otherwise maxFilesPerTrigger=1 splits
    # a batch across triggers and intermediate update rows appear in the sink
    spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 7.0)], _SCHEMA).coalesce(1).write.parquet(
        src + "/b1"
    )
    _run_once(spark, src, ckpt, out)
    first = {}
    for r in sorted(spark.read.parquet(out).collect(), key=lambda r: r["epoch"]):
        first[r["user_id"]] = r
    assert first[1]["n_events"] == 2 and abs(first[1]["total_value"] - 15.0) < 1e-9
    assert first[2]["n_events"] == 1 and abs(first[2]["max_value"] - 7.0) < 1e-9

    # batch 2 arrives later; the restarted query resumes from the checkpoint,
    # so user 1's state (2 events) must carry over → 3, and user 3 is new.
    spark.createDataFrame([(1, 1.0), (3, 2.0)], _SCHEMA).coalesce(1).write.parquet(src + "/b2")
    _run_once(spark, src, ckpt, out)
    allrows = spark.read.parquet(out).collect()
    latest = {}
    for r in sorted(allrows, key=lambda r: r["epoch"]):
        latest[r["user_id"]] = r
    assert latest[1]["n_events"] == 3
    assert abs(latest[1]["total_value"] - 16.0) < 1e-9
    assert latest[3]["n_events"] == 1
    assert latest[2]["n_events"] == 1  # untouched key keeps its state


def test_running_user_stats_matches_batch_aggregate(spark, sf_dir, tmp_path):
    from realestatedeals_spark.io.sources import load_events

    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    ev = load_events(spark, sf_dir).select("user_id", "value")
    ev.write.parquet(src + "/b1")
    _run_once(spark, src, ckpt, out)
    got = {}
    for r in sorted(spark.read.parquet(out).collect(), key=lambda r: r["epoch"]):
        got[r["user_id"]] = r  # keep the latest update per user
    want = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        assert g["n_events"] == w["n_events"]
        assert abs(g["total_value"] - w["total_value"]) < 1e-6
        assert abs(g["max_value"] - w["max_value"]) < 1e-9


def test_funnel_progress_matches_batch_funnel(spark, sf_dir, tmp_path):
    """Two ts-ordered micro-batches over the events fixture must land every
    user on the same funnel stage as the batch e6 stepping on the full
    data (state carries s/c/p across the batch boundary)."""
    from pyspark.sql.types import StringType

    from realestatedeals_spark.io.sources import load_events
    from realestatedeals_spark.streaming.stateful import funnel_progress

    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    ev = load_events(spark, sf_dir).select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    cut = ev.agg(F.percentile_approx("ts_us", 0.5, 10000)).collect()[0][0]
    ev.filter(F.col("ts_us") < cut).coalesce(1).write.parquet(src + "/b1")
    ev.filter(F.col("ts_us") >= cut).coalesce(1).write.parquet(src + "/b2")

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts_us", LongType()),
            StructField("event_type", StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src + "/*")

    def sink(batch_df, epoch_id):
        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out)

    q = (
        funnel_progress(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {}
    for r in sorted(spark.read.parquet(out).collect(), key=lambda r: r["epoch"]):
        got[r["user_id"]] = r["stage"]

    # batch oracle: the e6 stepping on the full data, per user
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id")
    s = F.min(F.when(F.col("event_type") == "signup", F.col("ts_us"))).over(w)
    b = ev.withColumn("s", s)
    c = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts_us") >= F.col("s")), F.col("ts_us"))
    ).over(w)
    b = b.withColumn("c", c)
    p = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts_us") >= F.col("c")), F.col("ts_us")
        )
    ).over(w)
    per_user = (
        b.withColumn("p", p)
        .groupBy("user_id")
        .agg(F.first("s").alias("s"), F.first("c").alias("c"), F.first("p").alias("p"))
        .collect()
    )
    want = {}
    for r in per_user:
        want[r["user_id"]] = 3 if r["p"] is not None else (
            2 if r["c"] is not None else (1 if r["s"] is not None else 0)
        )
    assert got == want


def test_funnel_event_time_chaos_permuted_arrival(spark, sf_dir, tmp_path):
    """Round-7 verdict task #6: permute intra-user arrival across
    micro-batches (events jittered ±1 ts-quartile, well inside the
    watermark slack) and the event-time funnel must STILL land every user
    on the batch e6 stepping — the retraction case funnel_progress's
    ordered-arrival assumption cannot handle. A final far-future sentinel
    pair of batches then advances the watermark past all real events and
    every user's buffer must drain to zero (state boundedness is real, not
    an unexercised claim)."""
    from pyspark.sql.types import StringType, TimestampType

    from realestatedeals_spark.io.sources import load_events
    from realestatedeals_spark.streaming.stateful import funnel_progress_event_time

    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_type")

    # deterministic chaos: base batch = ts-quartile, then ~40% of events
    # jump one batch earlier/later by hash — intra-user cross-batch disorder
    from pyspark.sql import Window as W

    q = F.ntile(4).over(W.orderBy("ts", "user_id", "event_type")) - 1
    jit = F.xxhash64("user_id", "ts", "event_type") % 5
    batch = F.greatest(
        F.lit(0),
        F.least(
            F.lit(3),
            q + F.when(jit == 0, -1).when(jit == 1, 1).otherwise(0),
        ),
    )
    tiled = ev.withColumn("b", batch)
    bounds = ev.agg(
        F.unix_micros(F.min("ts")).alias("lo"), F.unix_micros(F.max("ts")).alias("hi")
    ).first()
    delay_us = (bounds["hi"] - bounds["lo"]) // 2  # 2 quartile widths of slack
    for i in range(4):
        tiled.filter(F.col("b") == i).drop("b").coalesce(1).write.parquet(f"{src}/b{i}")
        t = 1_700_000_000 + i * 10
        for fname in os.listdir(f"{src}/b{i}"):
            os.utime(os.path.join(f"{src}/b{i}", fname), (t, t))
    # two sentinel batches per user (flush rows carry an ignored event_type):
    # the first advances the watermark past every real event, the second
    # re-invokes each group under that watermark so buffers finalize
    users = ev.select("user_id").distinct()
    for i, off in ((4, 10), (5, 20)):
        users.select(
            "user_id",
            F.timestamp_micros(F.lit(bounds["hi"] + delay_us * 2 + off)).alias("ts"),
            F.lit("flush").alias("event_type"),
        ).coalesce(1).write.parquet(f"{src}/b{i}")
        t = 1_700_000_000 + i * 10
        for fname in os.listdir(f"{src}/b{i}"):
            os.utime(os.path.join(f"{src}/b{i}", fname), (t, t))

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("event_type", StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src + "/*")

    def sink(batch_df, epoch_id):
        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out)

    q2 = (
        funnel_progress_event_time(stream, delay=f"{delay_us} microseconds")
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)

    got = {}
    for r in sorted(spark.read.parquet(out).collect(), key=lambda r: r["epoch"]):
        got[r["user_id"]] = r

    # batch oracle: e6 stepping on the full data per user (s/c/p AND stage)
    evu = ev.select("user_id", F.unix_micros("ts").alias("ts_us"), "event_type")
    w = W.partitionBy("user_id")
    s = F.min(F.when(F.col("event_type") == "signup", F.col("ts_us"))).over(w)
    b = evu.withColumn("s", s)
    c = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts_us") >= F.col("s")), F.col("ts_us"))
    ).over(w)
    b = b.withColumn("c", c)
    p = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts_us") >= F.col("c")), F.col("ts_us")
        )
    ).over(w)
    want = {
        r["user_id"]: r
        for r in b.withColumn("p", p)
        .groupBy("user_id")
        .agg(F.first("s").alias("s"), F.first("c").alias("c"), F.first("p").alias("p"))
        .collect()
    }
    assert set(got) == set(want)
    n_retracted = 0
    for uid, wrow in want.items():
        g = got[uid]
        for col, key in (("s_us", "s"), ("c_us", "c"), ("p_us", "p")):
            expect = wrow[key] if wrow[key] is not None else -1
            assert g[col] == expect, f"user {uid} {col}: {g[col]} != {expect}"
        assert g["n_buffered"] == 0, f"user {uid} buffer not drained: {g['n_buffered']}"
    # the chaos must actually have exercised disorder: at least one user's
    # intermediate emission differed from its final stage (a retraction or
    # late upgrade), else the permutation was vacuous
    inter = {}
    for r in sorted(spark.read.parquet(out).collect(), key=lambda r: r["epoch"]):
        uid = r["user_id"]
        if uid in inter and inter[uid] != r["stage"]:
            n_retracted += 1
        inter[uid] = r["stage"]
    assert n_retracted > 0, "permutation never changed any provisional stage"


def test_transition_deltas_counts_batch_boundary_pair(spark, tmp_path):
    """The transition between a user's last event of batch N and first
    event of batch N+1 must be counted exactly once — the case a stateless
    per-batch LEAD misses. Two single-user batches: signup,click | view."""
    from pyspark.sql.types import StringType, TimestampType

    from realestatedeals_spark.streaming.stateful import transition_deltas

    import datetime as dt

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
        ]
    )
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    b1 = [(1, t0, 7, "signup"), (2, t0 + dt.timedelta(minutes=1), 7, "click")]
    b2 = [(3, t0 + dt.timedelta(minutes=2), 7, "view")]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(src + "/b2")
    for i, d in enumerate(("b1", "b2")):
        full = os.path.join(src, d)
        for f in os.listdir(full):
            t = 1_700_000_000 + i * 10
            os.utime(os.path.join(full, f), (t, t))

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(
        src + "/*"
    )

    def sink(batch_df, epoch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        transition_deltas(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.from_type, r.to_type): r.n
        for r in spark.read.parquet(out)
        .groupBy("from_type", "to_type")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    # signup->click within batch 1; click->view ONLY via cross-batch state
    assert got == {("signup", "click"): 1, ("click", "view"): 1}


def test_update_transitions_multi_chunk_out_of_order():
    """One micro-batch's rows for a key can span several Arrow record
    batches that are NOT globally ordered by (ts, event_id); the counter
    must concatenate and sort ONCE, not sort each chunk independently and
    thread `last` across chunk boundaries in arrival order."""
    import pandas as pd

    from realestatedeals_spark.streaming.stateful import _update_transitions

    class _FakeState:
        def __init__(self):
            self.exists = False
            self.get = None

        def update(self, tup):
            self.exists = True
            self.get = tup

    # global order by ts: a(1) b(2) a(3) b(4) → a->b, b->a, a->b
    chunk1 = pd.DataFrame(
        {"ts": [2, 4], "event_id": [2, 4], "event_type": ["b", "b"]}
    )
    chunk2 = pd.DataFrame(
        {"ts": [1, 3], "event_id": [1, 3], "event_type": ["a", "a"]}
    )
    state = _FakeState()
    out = list(_update_transitions((7,), iter([chunk1, chunk2]), state))
    assert state.get == ("b",)
    got = {
        (r.from_type, r.to_type): r.n for r in pd.concat(out).itertuples()
    }
    # per-chunk sorting would have produced b->b and a->a phantom pairs
    assert got == {("a", "b"): 2, ("b", "a"): 1}

    # cross-batch boundary still counted once from carried state
    state2 = _FakeState()
    state2.exists, state2.get = True, ("b",)
    out2 = list(
        _update_transitions(
            (7,),
            iter([pd.DataFrame({"ts": [9], "event_id": [9], "event_type": ["c"]})]),
            state2,
        )
    )
    got2 = {(r.from_type, r.to_type): r.n for r in pd.concat(out2).itertuples()}
    assert got2 == {("b", "c"): 1} and state2.get == ("c",)

    # empty batch: state untouched, nothing emitted
    state3 = _FakeState()
    state3.exists, state3.get = True, ("z",)
    assert list(_update_transitions((7,), iter([pd.DataFrame({"ts": [], "event_id": [], "event_type": []})]), state3)) == []
    assert state3.get == ("z",)
