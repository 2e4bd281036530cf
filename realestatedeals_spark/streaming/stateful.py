"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's only cross-batch state is the keyed listings dict carried
between poll cycles (main.py:97,135); ``cdc_stream`` reproduces that with a
snapshot MERGE. This module shows the other Spark-native state mechanism —
arbitrary per-key state inside the streaming engine itself, checkpointed by
Spark, no external snapshot table.

Scale: state lives partitioned by key in the state store (RocksDB provider
on a real cluster), one Arrow batch per key group per micro-batch; nothing
is collected to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

_STATS_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) over an events stream.

    Emits one updated row per user per micro-batch in which the user appears
    (output mode "update"); state persists across batches in Spark's state
    store. Streaming-only (Spark rejects applyInPandasWithState on batch
    frames); the oracle comparison in tests drives it with availableNow and
    checks the final state row per user against a batch groupBy.
    """
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=STATS_OUTPUT,
        stateStructType=_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
