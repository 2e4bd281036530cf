"""Event-time windowed aggregations for streams (SURVEY.md §2a.6).

The reference has no event-time handling (processing-time polls only); these
are the Spark-native operators the engine adds, exercised on the ``events``
fixture. All built-in: watermark + window/session_window — no custom state.

Batch/stream parity: each builder takes any DataFrame (batch or streaming)
so the same plan is oracle-checked in batch (plans/events.py) and run as a
stream in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, width: str = "10 minutes", watermark: str = "15 minutes") -> DataFrame:
    """Tumbling event-time window; late rows beyond the watermark drop."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sliding_rates(
    events: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "15 minutes",
) -> DataFrame:
    """Sliding window — each event lands in width/slide windows."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "60 minutes"
) -> DataFrame:
    """Built-in session_window (gap-based); the batch gaps-and-islands
    equivalent is plans/events.py::e2_sessionize."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_dedup(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming exact dedup (X1 in motion): drop repeats of the same key
    seen within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds state by (watermark × key
    arrival rate) instead of retaining every key forever — the property that
    makes streaming dedup viable on an unbounded feed. Batch frames fall
    back to plain dropDuplicates (same semantics when all data is present).
    """
    keys = keys or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "30 minutes",
    watermark: str = "60 minutes",
) -> DataFrame:
    """Stream-stream inner join: right-side events that follow a left-side
    event on the same key within ``within`` (click→purchase attribution).

    In streaming mode BOTH sides carry watermarks and the join condition
    includes the time-range bound — the two requirements that let Spark
    bound join state (each side's buffer holds only rows younger than
    watermark + interval) instead of retaining the full history. Batch
    frames run the identical plan (same condition), which is what the
    oracle checks; the streaming test asserts stream == batch.

    Output: key, left ts/value as l_ts/l_value, right ts/value as
    r_ts/r_value, lag_seconds.
    """
    lw = left.withWatermark("ts", watermark) if left.isStreaming else left
    rw = right.withWatermark("ts", watermark) if right.isStreaming else right
    l = lw.select(
        F.col(key).alias("k"), F.col("ts").alias("l_ts"), F.col("value").alias("l_value")
    )
    r = rw.select(
        F.col(key).alias("rk"), F.col("ts").alias("r_ts"), F.col("value").alias("r_value")
    )
    joined = l.join(
        r,
        (F.col("k") == F.col("rk"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
        "inner",
    )
    return joined.select(
        F.col("k").alias("user_id"),
        "l_ts",
        "l_value",
        "r_ts",
        "r_value",
        # micros-diff then floor-divide: per-side unix_timestamp() floors
        # BEFORE subtracting, which is off by one when the fractional parts
        # straddle a second boundary
        ((F.unix_micros("r_ts") - F.unix_micros("l_ts")) / 1_000_000)
        .cast("bigint")
        .alias("lag_seconds"),
    )


def interval_join_outer(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "30 minutes",
    watermark: str = "60 minutes",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every left-side event with
    its right-side matches within ``within``, or one null-padded row if
    none arrive (click→purchase abandonment).

    The outer side is what makes this interesting in streaming: Spark can
    only emit the null-match once the watermark proves no matching right
    event can still arrive (left buffer entry older than watermark +
    interval), so unmatched rows surface with watermark latency while
    matched rows stream out immediately. Same state-bounding rules as the
    inner join — both sides watermarked, time bound in the condition.
    Batch frames run the identical plan for the oracle comparison.

    Output: key, l_ts/l_value, r_ts/r_value (null when unmatched),
    lag_seconds (null when unmatched), matched flag.
    """
    lw = left.withWatermark("ts", watermark) if left.isStreaming else left
    rw = right.withWatermark("ts", watermark) if right.isStreaming else right
    l = lw.select(
        F.col(key).alias("k"), F.col("ts").alias("l_ts"), F.col("value").alias("l_value")
    )
    r = rw.select(
        F.col(key).alias("rk"), F.col("ts").alias("r_ts"), F.col("value").alias("r_value")
    )
    joined = l.join(
        r,
        (F.col("k") == F.col("rk"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
        "leftOuter",
    )
    return joined.select(
        F.col("k").alias("user_id"),
        "l_ts",
        "l_value",
        "r_ts",
        "r_value",
        ((F.unix_micros("r_ts") - F.unix_micros("l_ts")) / 1_000_000)
        .cast("bigint")
        .alias("lag_seconds"),
        F.col("r_ts").isNotNull().alias("matched"),
    )
