"""Streaming tests (SURVEY.md §5 item 4): CDC micro-batch loop with state
replacement, and event-time windows driven to completion via availableNow/
memory sinks."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from realestatedeals_spark.streaming.cdc_stream import CdcState, process_cdc_batch, start_cdc_stream
from realestatedeals_spark.streaming.windows import session_windows, sliding_rates, tumbling_counts


def test_cdc_batches_sequence(spark, tmp_path):
    state = CdcState(spark, str(tmp_path / "state"))
    emit = str(tmp_path / "emit")

    b1 = spark.createDataFrame([("m1", 100.0), ("m2", 200.0)], ["mls", "price"])
    e1 = {r["mls"]: r["status"] for r in process_cdc_batch(b1, state, emit).collect()}
    assert e1 == {"m1": "new_listing", "m2": "new_listing"}

    # cycle 2: m1 unchanged (silent), m2 price change, m3 new, nothing off
    b2 = spark.createDataFrame([("m1", 100.0), ("m2", 250.0), ("m3", 50.0)], ["mls", "price"])
    e2 = {r["mls"]: r for r in process_cdc_batch(b2, state, emit).collect()}
    assert set(e2) == {"m2", "m3"}
    assert e2["m2"]["status"] == "price_change"
    assert abs(e2["m2"]["price_change_percentage"] - 25.0) < 1e-9
    assert e2["m3"]["status"] == "new_listing"

    # cycle 3: m1 vanishes → off_market and deleted from state (hunter.py:352)
    b3 = spark.createDataFrame([("m2", 250.0), ("m3", 50.0)], ["mls", "price"])
    e3 = {r["mls"]: r["status"] for r in process_cdc_batch(b3, state, emit).collect()}
    assert e3 == {"m1": "off_market"}
    assert {r["mls"] for r in state.load().collect()} == {"m2", "m3"}

    # emissions sink accumulated every cycle
    total = spark.read.parquet(emit).count()
    assert total == 2 + 2 + 1


def test_cdc_stream_wiring(spark, tmp_path):
    """End-to-end through an actual streaming query (file source →
    foreachBatch), drained with availableNow."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    b1 = spark.createDataFrame([("m1", 100.0), ("m2", 200.0)], ["mls", "price"])
    b1.write.mode("append").parquet(in_dir)

    q = start_cdc_stream(
        spark,
        in_dir,
        schema="mls string, price double",
        state_dir=str(tmp_path / "state"),
        emit_dir=str(tmp_path / "emit"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(60)
    emitted = spark.read.parquet(str(tmp_path / "emit"))
    assert emitted.filter(F.col("status") == "new_listing").count() == 2


def events_stream(spark, tmp_path):
    from realestatedeals_spark.io.sources import load_events

    src = load_events(spark, "/root/testdata/sf0.001").limit(500)
    d = str(tmp_path / "events_in")
    src.write.mode("overwrite").parquet(d)
    return spark.readStream.schema(src.schema).parquet(d), spark.read.parquet(d)


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    stream_df, batch_df = events_stream(spark, tmp_path)
    q = (
        tumbling_counts(stream_df)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("tumb")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("select * from tumb").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in tumbling_counts(batch_df).collect()
    }
    # append mode only emits windows the watermark has closed; everything
    # emitted must match batch, and most windows must have closed
    assert got
    for k, v in got.items():
        assert want[k] == v
    assert len(got) >= len(want) * 0.5


def test_streaming_session_and_sliding_run(spark, tmp_path):
    stream_df, batch_df = events_stream(spark, tmp_path)
    for i, builder in enumerate((sliding_rates, session_windows)):
        q = (
            builder(stream_df)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(f"w{i}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert spark.sql(f"select * from w{i}").count() >= 0
    # batch forms produce rows
    assert sliding_rates(batch_df).count() > 0
    assert session_windows(batch_df).count() > 0


def test_stream_dedup_within_watermark(spark, tmp_path):
    import datetime as dt
    import os
    import time

    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from realestatedeals_spark.streaming.windows import stream_dedup

    schema = StructType(
        [StructField("event_id", LongType()), StructField("ts", TimestampType())]
    )
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    # batch 1: id 1 twice (in-batch dup) + id 2; batch 2 (newer mtime): id 1
    # again within the watermark horizon → must also be dropped
    spark.createDataFrame([(1, t0), (1, t0), (2, t0)], schema).coalesce(1).write.parquet(
        src + "/b1"
    )
    time.sleep(1.1)
    spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=5)), (3, t0 + dt.timedelta(minutes=5))], schema
    ).coalesce(1).write.parquet(src + "/b2")

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(
        src + "/*"
    )

    def sink(batch_df, epoch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        stream_dedup(stream, keys=["event_id"], watermark="30 minutes")
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert ids == [1, 2, 3], ids


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream inner join (click→purchase within 30 min, both sides
    watermarked, time-range bound in the condition): every pair the
    streaming run emits must match the batch plan, and the inner-join
    append mode must emit the complete result under availableNow."""
    from realestatedeals_spark.streaming.windows import interval_join

    stream_df, batch_df = events_stream(spark, tmp_path)

    def split(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "value"
        )
        purchases = df.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value"
        )
        return clicks, purchases

    sc, sp = split(stream_df)
    bc, bp = split(batch_df)
    # 12h interval: the sf0.001 slice is too sparse for 30-minute pairs
    q = (
        interval_join(sc, sp, within="12 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    key = lambda r: (r["user_id"], r["l_ts"], r["r_ts"])
    got = {key(r): r["lag_seconds"] for r in spark.sql("select * from ssj").collect()}
    want = {key(r): r["lag_seconds"] for r in interval_join(bc, bp, within="12 hours").collect()}
    assert got == want
    assert want  # non-vacuous: the fixture slice must contain attributed pairs
