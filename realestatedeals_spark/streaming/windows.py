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
