"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's only cross-batch state is the keyed listings dict carried
between poll cycles (main.py:97,135); ``cdc_stream`` reproduces that with a
snapshot MERGE. This module shows the other Spark-native state mechanism —
arbitrary per-key state inside the streaming engine itself, checkpointed by
Spark, no external snapshot table.

Scale: state lives partitioned by key in the state store (RocksDB provider
on a real cluster), one Arrow batch per key group per micro-batch; nothing
is collected to the driver.

API note (probed round 7): Spark 4's successor API
``transformWithStateInPandas`` (StatefulProcessor + ValueState/ListState/
MapState/timers) is present in this PySpark build but its Python↔JVM state
server requires ``google.protobuf``, which this container does not ship
(pip installs are unavailable) — the runner exits with
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE. ``applyInPandasWithState``
covers the same per-key-state semantics without that dependency, so it
stays the implementation here; the migration is mechanical (handleInputRows
receives the same per-key Arrow batches these update functions consume).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
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
    ``funnel_progress_event_time`` solves with watermark-bounded buffering.

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


# ---------------------------------------------------------------------------
# Event-time funnel with retraction (round 7, verdict task #6): the ordered-
# arrival assumption of funnel_progress replaced by watermark-bounded
# per-user event buffering. Every emission is EXACT over all events seen so
# far — a late-arriving earlier signup re-steps the whole suffix, so a
# provisional stage can go DOWN (retraction) and the final emission equals
# the batch e6 stepping under ANY within-watermark arrival permutation.
# State is bounded: events below the watermark fold irrevocably into three
# finalized longs (the sorted-prefix step is prefix-exact because post-
# watermark arrivals can only carry later timestamps), and only the
# in-flight suffix stays buffered — per-user state is O(event rate x
# watermark delay), not O(history), the property that survives 100 TB.
# ---------------------------------------------------------------------------

FUNNEL_ET_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("s_us", LongType()),
        StructField("c_us", LongType()),
        StructField("p_us", LongType()),
        StructField("stage", LongType()),
        StructField("n_buffered", LongType()),
    ]
)

_FUNNEL_ET_STATE = StructType(
    [
        StructField("s", LongType()),
        StructField("c", LongType()),
        StructField("p", LongType()),
        StructField("buf_ts", ArrayType(LongType())),
        StructField("buf_et", ArrayType(LongType())),
    ]
)

_EVENT_CODE = {"signup": 1, "click": 2, "purchase": 3}


def _step_funnel(s: int, c: int, p: int, pairs: list[tuple[int, int]]) -> tuple[int, int, int]:
    """Step the e6 semantics over (ts, code) pairs sorted by (ts, code):
    earliest signup, earliest click at-or-after it, earliest purchase
    at-or-after that. Sorting codes within equal timestamps keeps the
    at-or-after ties (click == signup ts) identical to the batch query."""
    for t, e in pairs:
        if e == 1:
            if s == _ABSENT:
                s = t
        elif e == 2:
            if c == _ABSENT and s != _ABSENT and t >= s:
                c = t
        elif e == 3:
            if p == _ABSENT and c != _ABSENT and t >= c:
                p = t
    return s, c, p


def _update_funnel_event_time(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        s, c, p, buf_ts, buf_et = state.get
        buf = list(zip(buf_ts, buf_et))
    else:
        s, c, p, buf = _ABSENT, _ABSENT, _ABSENT, []
    for pdf in pdfs:
        for t, e in zip(pdf["ts_us"], pdf["event_type"]):
            code = _EVENT_CODE.get(e)
            if code:
                buf.append((int(t), code))
    buf.sort()
    wm_us = state.getCurrentWatermarkMs() * 1000
    # finalize the complete prefix: rows with ts < watermark can never be
    # joined by later arrivals (Spark drops them as late), so folding them
    # into (s, c, p) in sorted order is exact and irrevocable
    n_final = 0
    while n_final < len(buf) and buf[n_final][0] < wm_us:
        n_final += 1
    s, c, p = _step_funnel(s, c, p, buf[:n_final])
    buf = buf[n_final:]
    state.update((s, c, p, [t for t, _ in buf], [e for _, e in buf]))
    # provisional view = finalized prefix + buffered suffix: exact over
    # every event seen so far, retractions included
    ps, pc, pp = _step_funnel(s, c, p, buf)
    stage = 3 if pp != _ABSENT else (2 if pc != _ABSENT else (1 if ps != _ABSENT else 0))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "s_us": [ps],
            "c_us": [pc],
            "p_us": [pp],
            "stage": [stage],
            "n_buffered": [len(buf)],
        }
    )


def funnel_progress_event_time(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Event-time funnel over an out-of-order stream: per-user funnel stage
    with watermark-bounded buffering and exact retraction semantics.

    ``events`` must carry ``user_id``, a TimestampType ``ts`` (the
    watermark column), and ``event_type``. Arrival order within the
    ``delay`` slack is irrelevant: every emission equals the batch
    ``e6_funnel`` stepping over all events received so far, and the final
    emission per user hash-matches the full batch computation. Events
    later than ``delay`` are dropped by the engine (the standard watermark
    contract) — the bound that keeps per-user state finite.

    ``ts_us`` is derived JVM-side with ``unix_micros`` (tz-proof) before
    the state function; the raw ``ts`` column rides along only to carry
    the watermark."""
    ev = events.withWatermark("ts", delay).select(
        "user_id", "ts", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _update_funnel_event_time,
        outputStructType=FUNNEL_ET_OUTPUT,
        stateStructType=_FUNNEL_ET_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming Markov transitions (round 7): the e30 batch transition matrix
# as cross-batch keyed state. The only state a transition counter needs is
# each user's LAST event type — the boundary pair between micro-batches is
# exactly what a stateless per-batch LEAD would miss. Ordered-arrival
# assumption as documented on funnel_progress (batches are time-tiled;
# rows sort by (ts, event_id) within the batch); the event-time-buffered
# pattern in funnel_progress_event_time is the disorder-tolerant upgrade.
# ---------------------------------------------------------------------------

TRANSITIONS_OUTPUT = StructType(
    [
        StructField("from_type", StringType()),
        StructField("to_type", StringType()),
        StructField("n", LongType()),
    ]
)

_TRANS_STATE = StructType([StructField("last_type", StringType())])


def _update_transitions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last = state.get[0] if state.exists else None
    # One micro-batch's rows for a key may arrive as MULTIPLE Arrow record
    # batches (default ~10k rows each), and the chunks are not globally
    # ordered by (ts, event_id). Sorting each chunk independently and
    # carrying `last` across them in arrival order would count the
    # chunk-boundary transitions against the wrong pairs — so concatenate
    # everything for the key first, then sort ONCE.
    parts = [pdf for pdf in pdfs if len(pdf)]
    if not parts:
        state.update((last,))
        return
    pdf = pd.concat(parts, ignore_index=True).sort_values(["ts", "event_id"])
    ets = pdf["event_type"].reset_index(drop=True)
    prev = ets.shift(1)
    if last is not None:
        prev.iloc[0] = last  # the cross-batch boundary transition
    last = ets.iloc[-1]
    state.update((last,))
    # vectorized pair counting (no per-row Python): group the aligned
    # (prev, current) columns, dropping the stateless first row
    mask = prev.notna()
    if mask.any():
        counts = (
            pd.DataFrame({"from_type": prev[mask], "to_type": ets[mask]})
            .groupby(["from_type", "to_type"])
            .size()
        )
        out = counts.astype("int64").reset_index(name="n").sort_values(
            ["from_type", "to_type"]
        )
        yield out


def transition_deltas(events: DataFrame) -> DataFrame:
    """Per-micro-batch (from_type, to_type, count) deltas per user, with
    the user's last event type carried in the state store so cross-batch
    boundary transitions are counted exactly once. Downstream, the matrix
    is a plain groupBy-sum over the emission log — the append-mode delta
    stream is itself mergeable (the same shape an incremental view keeps)."""
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_transitions,
            outputStructType=TRANSITIONS_OUTPUT,
            stateStructType=_TRANS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
