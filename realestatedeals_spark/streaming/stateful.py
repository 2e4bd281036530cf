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


# ---------------------------------------------------------------------------
# Streaming funnel progress: the batch e6_funnel semantics (earliest signup →
# earliest click at-or-after it → earliest purchase at-or-after that) carried
# across micro-batches as per-user state.
# ---------------------------------------------------------------------------

FUNNEL_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("s_us", LongType()),
        StructField("c_us", LongType()),
        StructField("p_us", LongType()),
        StructField("stage", LongType()),
    ]
)

_FUNNEL_STATE = StructType(
    [
        StructField("s", LongType()),
        StructField("c", LongType()),
        StructField("p", LongType()),
    ]
)

_ABSENT = -1


def _update_funnel(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    s, c, p = state.get if state.exists else (_ABSENT, _ABSENT, _ABSENT)
    for pdf in pdfs:
        ts = pdf["ts_us"]
        et = pdf["event_type"]
        sig = ts[et == "signup"]
        if len(sig):
            m = int(sig.min())
            s = m if s == _ABSENT else min(s, m)
        if s != _ABSENT:
            clk = ts[(et == "click") & (ts >= s)]
            if len(clk):
                m = int(clk.min())
                c = m if c == _ABSENT else min(c, m)
        if c != _ABSENT:
            pur = ts[(et == "purchase") & (ts >= c)]
            if len(pur):
                m = int(pur.min())
                p = m if p == _ABSENT else min(p, m)
    state.update((s, c, p))
    stage = 3 if p != _ABSENT else (2 if c != _ABSENT else (1 if s != _ABSENT else 0))
    yield pd.DataFrame(
        {"user_id": [user_id], "s_us": [s], "c_us": [c], "p_us": [p], "stage": [stage]}
    )


def funnel_progress(events: DataFrame) -> DataFrame:
    """Per-user funnel stage (0 none, 1 signed up, 2 clicked, 3 purchased)
    maintained across micro-batches; state is three longs per user.

    Matches the batch ``e6_funnel`` stepping exactly when per-user event
    time is non-decreasing across micro-batches (the usual log-ingest
    discipline; enforce with a watermark + sorted replay for backfills).
    Under out-of-order arrival it is conservative: a late-arriving earlier
    signup lowers ``s`` immediately, but clicks discarded by the old ``s``
    in prior batches are not re-observed — exactly the retraction problem
    batch recomputation (e6_funnel) exists for.

    Input columns: user_id, ts_us (epoch micros), event_type.
    """
    return (
        events.select("user_id", "ts_us", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=FUNNEL_OUTPUT,
            stateStructType=_FUNNEL_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
