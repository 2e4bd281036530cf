"""Event-time queries on the ``events`` table (SURVEY.md §2a.6).

The reference is processing-time-only (poll loop); these are the event-time
equivalents the Spark engine adds: tumbling windows, sessionization, JSON
prop extraction. The streaming variants (watermarks, session_window) live in
``realestatedeals_spark.streaming``; these batch forms share semantics and
are oracle-checkable.

Determinism notes: timestamps are emitted as formatted strings (tz-proof);
session-gap arithmetic runs on integer epoch-micros on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from realestatedeals_spark.io.sources import load_events
from realestatedeals_spark.plans.registry import register
from realestatedeals_spark.session import apply_session_conf

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def _dsum(col: F.Column, scale: int = 4) -> F.Column:
    return F.sum(col.cast(f"decimal(25,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# Tumbling 10-minute window per event_type. Spark's window() aligns to the
# epoch; the oracle floors epoch seconds to the same 600 s grid.
# ---------------------------------------------------------------------------

_TUMBLING_ORACLE = """
SELECT strftime(to_timestamp(CAST(floor(epoch_us(ts) / 600000000) * 600 AS BIGINT)) AT TIME ZONE 'UTC', '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("e1_tumbling_window", oracle=_TUMBLING_ORACLE, tags=("window", "streaming-batch"), bench=True)
def e1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Sessionization (batch gaps-and-islands): per user, a new session starts
# after a >30-minute gap; emit per-session start/end/event-count.
# ---------------------------------------------------------------------------

_SESSION_ORACLE = f"""
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       strftime(min(ts), '{_TS_FMT_DUCK}') AS session_start,
       strftime(max(ts), '{_TS_FMT_DUCK}') AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM sessions
GROUP BY user_id, session_id
"""


@register("e2_sessionize", oracle=_SESSION_ORACLE, tags=("window", "session"), bench=True)
def e2_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    wc = W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, 0)
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wc).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), _TS_FMT_SPARK).alias("session_start"),
            F.date_format(F.max("ts"), _TS_FMT_SPARK).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Sliding (hopping) 10-minute window, 5-minute slide, per event_type. Each
# event lands in exactly length/slide = 2 windows; Spark's window() aligns
# starts to the epoch, so the oracle enumerates the two epoch-aligned starts
# per event (floor to the 300 s grid, minus 0 or 300 s) and aggregates.
# ---------------------------------------------------------------------------

_SLIDING_ORACLE = """
SELECT strftime(to_timestamp(CAST(floor(epoch_us(ts) / 300000000) * 300 - o.off AS BIGINT)) AT TIME ZONE 'UTC', '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS total_value
FROM events CROSS JOIN (VALUES (0), (300)) AS o(off)
GROUP BY 1, 2
"""


@register("e5_sliding_window", oracle=_SLIDING_ORACLE, tags=("window", "streaming-batch"))
def e5_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# JSON prop extraction (the reference's property_details dict analog,
# listing.py:34) — parse props, aggregate by event_type.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# As-of join: each click event picks up the latest error event at-or-before
# it for the same user. Oracle is DuckDB's native ASOF LEFT JOIN; the engine
# lowers it to one keyed shuffle + window carry-forward (operators/asof.py).
# ---------------------------------------------------------------------------

_ASOF_ORACLE = f"""
WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
errors AS (SELECT user_id, ts, value FROM events WHERE event_type = 'error')
SELECT c.event_id, c.user_id, strftime(c.ts, '{_TS_FMT_DUCK}') AS ts,
       strftime(e.ts, '{_TS_FMT_DUCK}') AS last_error_ts,
       e.value AS last_error_value
FROM clicks c ASOF LEFT JOIN errors e ON c.user_id = e.user_id AND c.ts >= e.ts
"""


@register("e4_asof_join_last_error", oracle=_ASOF_ORACLE, tags=("asof", "window"), bench=True)
def e4_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realestatedeals_spark.operators.asof import asof_join

    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "value")
    joined = asof_join(clicks, errors, on=["user_id"], right_cols=["value"])
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("ts"),
        F.date_format("ts_right", _TS_FMT_SPARK).alias("last_error_ts"),
        F.col("value").alias("last_error_value"),
    )


_JSON_ORACLE = """
SELECT event_type,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
"""


@register("e3_json_props", oracle=_JSON_ORACLE, tags=("json", "semi-structured"))
def e3_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").try_cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Funnel: signup → first click at-or-after signup → first purchase at-or-
# after that click, per user; one summary row with stage counts + rates.
# Scale shape: ONE user-keyed exchange feeds the stacked windows AND the
# per-user dedup (same partitioning, Catalyst reuses it); the final global
# agg sees one row per user. No self-joins, no collect.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH s AS (SELECT user_id, min(ts) AS st FROM events WHERE event_type = 'signup' GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS ct
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'click' AND e.ts >= s.st GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS pt
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= c.ct GROUP BY e.user_id)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_signup,
       (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click,
       (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase,
       CAST((SELECT count(*) FROM c) AS DOUBLE)
         / CAST((SELECT count(*) FROM s) AS DOUBLE) AS click_rate,
       CAST((SELECT count(*) FROM p) AS DOUBLE)
         / CAST((SELECT count(*) FROM s) AS DOUBLE) AS purchase_rate
"""


@register("e6_funnel", oracle=_FUNNEL_ORACLE, tags=("events", "funnel", "window"), bench=True)
def e6_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id")
    s = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    ev = ev.withColumn("s", s)
    c = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") >= F.col("s")), F.col("ts"))
    ).over(w)
    ev = ev.withColumn("c", c)
    p = F.min(
        F.when((F.col("event_type") == "purchase") & (F.col("ts") >= F.col("c")), F.col("ts"))
    ).over(w)
    per_user = (
        ev.withColumn("p", p)
        .groupBy("user_id")
        .agg(F.first("s").alias("s"), F.first("c").alias("c"), F.first("p").alias("p"))
    )
    n_s = F.count(F.col("s")).alias("n_signup")
    n_c = F.count(F.col("c")).alias("n_click")
    n_p = F.count(F.col("p")).alias("n_purchase")
    return per_user.agg(n_s, n_c, n_p).select(
        "n_signup",
        "n_click",
        "n_purchase",
        (F.col("n_click").cast("double") / F.col("n_signup").cast("double")).alias("click_rate"),
        (F.col("n_purchase").cast("double") / F.col("n_signup").cast("double")).alias(
            "purchase_rate"
        ),
    )


# ---------------------------------------------------------------------------
# Retention cohorts: cohort = user's first-seen day; report distinct active
# users per (cohort_day, day_offset) for offsets 0..7. The (user, day)
# dedup bounds the join input to active-user-days; both the first-seen agg
# and the join shuffle on user_id (co-partitioned), the final agg is on the
# tiny (cohort, offset) grid.
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH fu AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY 1),
ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
SELECT strftime(fu.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(datediff('day', fu.cohort_day, ud.d) AS INTEGER) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM ud JOIN fu USING (user_id)
WHERE datediff('day', fu.cohort_day, ud.d) BETWEEN 0 AND 7
GROUP BY fu.cohort_day, day_offset
"""


@register("e7_retention_cohorts", oracle=_RETENTION_ORACLE, tags=("events", "retention"))
def e7_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    first_seen = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    user_days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    off = F.datediff(F.col("d"), F.col("cohort_day"))
    return (
        user_days.join(first_seen, "user_id")
        .filter((off >= 0) & (off <= 7))
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            off.cast("int").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Forward as-of join: each click picks up the NEXT error at-or-after it for
# the same user (time-to-next-failure analysis) — the mirror of e4's
# backward carry, same single keyed shuffle (operators/asof.py
# direction="forward"). Oracle is DuckDB's native forward ASOF (<=).
# ---------------------------------------------------------------------------

_ASOF_FWD_ORACLE = f"""
WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
errors AS (SELECT user_id, ts, value FROM events WHERE event_type = 'error')
SELECT c.event_id, c.user_id, strftime(c.ts, '{_TS_FMT_DUCK}') AS ts,
       strftime(e.ts, '{_TS_FMT_DUCK}') AS next_error_ts,
       e.value AS next_error_value
FROM clicks c ASOF LEFT JOIN errors e ON c.user_id = e.user_id AND c.ts <= e.ts
"""


@register("e8_asof_next_error", oracle=_ASOF_FWD_ORACLE, tags=("asof", "window"))
def e8_asof_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realestatedeals_spark.operators.asof import asof_join

    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "value")
    joined = asof_join(clicks, errors, on=["user_id"], right_cols=["value"], direction="forward")
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("ts"),
        F.date_format("ts_right", _TS_FMT_SPARK).alias("next_error_ts"),
        F.col("value").alias("next_error_value"),
    )


# ---------------------------------------------------------------------------
# Interval × interval overlap COUNT: per-(user, day) activity intervals,
# number of user pairs whose intervals overlap within the day. Daily
# activity intervals mostly all overlap, so the pair set is ~n² in
# daily-active users while the answer is one count per day — the right plan
# is a per-day sweep-line (operators/range_join.interval_overlap_count):
# sort the 2n interval endpoints per day, each start contributes the
# currently-open interval count, zero pair rows ever exist. O(n log n) per
# day vs the 183 engine-seconds the bucketed pair join cost at gen sf1.0.
# interval_overlap_join remains the operator for pair-OUTPUT queries
# (see e9 / stream-stream interval joins). Oracle stays the quadratic
# within-day join — DuckDB states the answer, Spark never builds the pairs.
# ---------------------------------------------------------------------------

_OVERLAP_ORACLE = """
WITH iv AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         min(epoch_us(ts)) AS lo, max(epoch_us(ts)) + 1 AS hi
  FROM events GROUP BY 1, 2)
SELECT strftime(a.d, '%Y-%m-%d') AS day, CAST(count(*) AS BIGINT) AS n_overlapping_pairs
FROM iv a JOIN iv b
  ON a.d = b.d AND a.user_id < b.user_id AND a.lo < b.hi AND b.lo < a.hi
GROUP BY a.d
"""


@register(
    "range_join_daily_overlap",
    oracle=_OVERLAP_ORACLE,
    tags=("range-join", "interval", "sweep-line"),
    bench=True,  # round 11: driver-visible so the sweep-line fix can't silently regress
)
def range_join_daily_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realestatedeals_spark.operators.range_join import interval_overlap_count

    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    iv = (
        ev.select("user_id", F.to_date("ts").alias("d"), F.unix_micros("ts").alias("us"))
        .groupBy("user_id", "d")
        .agg(F.min("us").alias("lo"), (F.max("us") + 1).alias("hi"))
    )
    counts = interval_overlap_count(iv, keys=["d"], lo_col="lo", hi_col="hi")
    return counts.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"), "n_overlapping_pairs"
    )


# ---------------------------------------------------------------------------
# Stream-stream interval join, batch-checked: click→purchase attribution on
# the same user within 30 minutes. The registered batch plan is the EXACT
# plan streaming/windows.py::interval_join builds in streaming mode (both
# sides watermarked, time-range bound in the join condition — the two
# requirements that bound stream-stream join state); the streaming test
# (tests/test_streaming.py) asserts stream == batch on the same input.
# ---------------------------------------------------------------------------

_ATTRIB_ORACLE = """
WITH c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
SELECT c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       p.value AS purchase_value,
       CAST((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS BIGINT) AS lag_seconds
FROM c JOIN p
  ON c.user_id = p.user_id AND p.ts > c.ts
 AND p.ts <= c.ts + INTERVAL 30 MINUTE
"""


@register("e9_click_purchase_attribution", oracle=_ATTRIB_ORACLE, tags=("events", "stream-stream", "interval-join"))
def e9_click_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realestatedeals_spark.streaming.windows import interval_join

    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = interval_join(clicks, purchases, within="30 minutes")
    return out.select(
        "user_id",
        F.date_format("l_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.date_format("r_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.col("r_value").alias("purchase_value"),
        "lag_seconds",
    )


# ---------------------------------------------------------------------------
# e10 — SCD Type-2 dimension build from a change log. Each user's event
# stream is a change feed of a one-attribute entity (event_type = the
# tracked state); the operator emits versioned validity intervals with
# change DETECTION (consecutive equal states collapse into one version —
# the actual SCD2 subtlety) and an is_current flag on the open interval.
#
# Scale: one shuffle on user_id; the change-row filter preserves both the
# hash partitioning AND the sort order, so the second window (lead/version
# over change rows) reuses the exchange and the sort — the executed plan is
# ONE Exchange + ONE Sort total (pinned in tests/test_plans.py). At 100 TB
# the same plan runs per entity-key range with no driver involvement.
# ---------------------------------------------------------------------------

_SCD2_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events),
changes AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type)
SELECT user_id, event_type,
       strftime(ts, '{_TS_FMT_DUCK}') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '{_TS_FMT_DUCK}') AS valid_to,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS BIGINT) AS version,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         AS is_current
FROM changes
"""


@register("e10_scd2_intervals", oracle=_SCD2_ORACLE, tags=("events", "scd2", "window"))
def e10_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension intervals per user from the events
    change log: collapse no-op changes, then open/close validity windows."""
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    valid_to = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        "event_type",
        F.date_format("ts", _TS_FMT_SPARK).alias("valid_from"),
        F.date_format(valid_to, _TS_FMT_SPARK).alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
        valid_to.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# e11 — time-series gap fill + forward fill (engine addition; the hypertable
# "time_bucket_gapfill + locf" primitive). Daily per-(event_type, user-group)
# aggregates are joined onto a generated date spine; days with no events get
# an observed count of 0 and carry the last seen running total forward.
# ---------------------------------------------------------------------------

_GAPFILL_ORACLE = """
WITH daily AS (
  SELECT event_type, user_id % 50 AS grp, CAST(ts AS DATE) AS day,
         count(*) AS n, SUM(CAST(value AS DECIMAL(25,4))) AS tot
  FROM events GROUP BY 1, 2, 3),
bounds AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events),
keys AS (SELECT DISTINCT event_type, grp FROM daily),
spine AS (
  SELECT k.event_type, k.grp,
         CAST(unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM keys k, bounds b),
j AS (
  SELECT s.event_type, s.grp, s.day, coalesce(d.n, 0) AS n_events, d.tot AS tot
  FROM spine s LEFT JOIN daily d
    ON s.event_type = d.event_type AND s.grp = d.grp AND s.day = d.day)
SELECT event_type, CAST(grp AS BIGINT) AS grp, strftime(day, '%Y-%m-%d') AS day,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(last_value(tot IGNORE NULLS) OVER (
              PARTITION BY event_type, grp ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS filled_total
FROM j
"""


@register("e11_gap_fill_forward", oracle=_GAPFILL_ORACLE, tags=("window", "timeseries"))
def e11_gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill + LOCF: date spine via sequence()/explode against broadcast
    global bounds (one 1-row agg — no driver collect), left join of the
    daily aggregate, and last(ignorenulls) over the key window for the
    carry-forward. ONE exchange on the series key feeds both the join and
    the fill window. At 100 TB the spine is keys × days — generated, never
    shuffled at event granularity; the daily aggregate is the only
    event-proportional pass and it partial-aggregates map-side. Decimal
    sums forward-fill exactly; the double cast happens after the fill."""
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    daily = (
        ev.groupBy(
            "event_type",
            (F.col("user_id") % 50).alias("grp"),
            F.to_date("ts").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,4)")).alias("tot"),
        )
    )
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    keys = daily.select("event_type", "grp").distinct()
    spine = keys.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "grp",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    j = spine.join(daily, ["event_type", "grp", "day"], "left")
    fill = W.partitionBy("event_type", "grp").orderBy("day").rowsBetween(
        W.unboundedPreceding, 0
    )
    return j.select(
        "event_type",
        F.col("grp").cast("long").alias("grp"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.last("tot", ignorenulls=True).over(fill).cast("double").alias("filled_total"),
    )


# ---------------------------------------------------------------------------
# e12 — distinct users per sliding window: the aggregate that does NOT
# partial-combine (unlike count/sum, COUNT DISTINCT needs the full key set
# per window). Spark's shuffle carries (window, user) pairs once thanks to
# the pre-aggregate-style distinct inside the groupBy; at 100 TB the bounded
# alternative is the mergeable HLL (x6_hll_mergeable) — this is its exact
# counterpart, same relationship as olap_percentiles_exact to
# x6_approx_quantiles. 30-minute windows sliding by 10 → each event lands in
# 3 windows; the oracle enumerates the 3 start offsets explicitly.
# ---------------------------------------------------------------------------

_E12_ORACLE = """
SELECT strftime(to_timestamp(CAST(floor(epoch_us(ts) / 600000000) * 600 - o.off AS BIGINT)) AT TIME ZONE 'UTC', '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events CROSS JOIN (VALUES (0), (600), (1200)) AS o(off)
GROUP BY 1, 2
"""


@register("e12_sliding_distinct_users", oracle=_E12_ORACLE, tags=("window", "distinct"), bench=True)
def e12_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"), "event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_users",
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# e13 — robust outlier detection: median/MAD per event_type, flag
# |x - median| > 3·MAD. Medians are defined as the RANK-based lower order
# statistic (row k = floor((n+1)/2) of the ascending sort) in BOTH engines —
# no reliance on either engine's quantile interpolation mode — and values
# are integer micros, so every compared number is exact. At 100 TB the two
# order statistics each cost one keyed sort of the group (or swap in the GK
# sketch x6_approx_quantiles for a bounded-memory approximate MAD).
# ---------------------------------------------------------------------------

_E13_ORACLE = """
WITH m AS (
  SELECT event_type, CAST(floor(value * 1000000.0) AS BIGINT) AS vm FROM events),
r AS (
  SELECT event_type, vm,
         row_number() OVER (PARTITION BY event_type ORDER BY vm) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM m),
med AS (
  SELECT event_type, vm AS med FROM r WHERE rk = (n + 1) // 2),
dev AS (
  SELECT m.event_type, abs(m.vm - med.med) AS ad, med.med
  FROM m JOIN med USING (event_type)),
rd AS (
  SELECT event_type, ad, med,
         row_number() OVER (PARTITION BY event_type ORDER BY ad) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM dev),
madt AS (
  SELECT event_type, ad AS mad FROM rd WHERE rk = (n + 1) // 2)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(d.med) AS BIGINT) AS median_micros,
       CAST(min(t.mad) AS BIGINT) AS mad_micros,
       CAST(sum(CASE WHEN d.ad > 3 * t.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN madt t USING (event_type)
GROUP BY d.event_type
"""


@register("e13_mad_outliers", oracle=_E13_ORACLE, tags=("stats", "outliers"), bench=True)
def e13_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir).select(
        "event_type", F.floor(F.col("value") * 1000000.0).cast("long").alias("vm")
    )

    def rank_median(df: DataFrame, col: str, out: str) -> DataFrame:
        w = W.partitionBy("event_type").orderBy(col)
        wn = W.partitionBy("event_type")
        return (
            df.withColumn("rk", F.row_number().over(w))
            .withColumn("n", F.count(F.lit(1)).over(wn))
            .filter(F.col("rk") == F.floor((F.col("n") + 1) / 2))
            .select("event_type", F.col(col).alias(out))
        )

    med = rank_median(ev, "vm", "med")
    dev = ev.join(med, "event_type").select(
        "event_type", F.abs(F.col("vm") - F.col("med")).alias("ad"), "med"
    )
    mad = rank_median(dev.select("event_type", "ad"), "ad", "mad")
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("med").alias("median_micros"),
            F.min("mad").alias("mad_micros"),
            F.sum(F.when(F.col("ad") > 3 * F.col("mad"), 1).otherwise(0)).alias(
                "n_outliers"
            ),
        )
    )


# ---------------------------------------------------------------------------
# e14 — per-key trend slopes: least-squares slope of daily event counts,
# computed from INTEGER sufficient statistics (n, Σx, Σy, Σxy, Σx²) with one
# final double division — deterministic across engines and partitionings,
# unlike a doubles-accumulating regression. The stats partial-aggregate
# map-side; at any scale this is one shuffle on the key.
# ---------------------------------------------------------------------------

_E14_ORACLE = """
WITH daily AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx
  FROM daily GROUP BY event_type)
SELECT event_type, n_days,
       CAST(n_days*sxy - sx*sy AS DOUBLE) / CAST(n_days*sxx - sx*sx AS DOUBLE)
         AS slope_per_day
FROM s
"""


@register("e14_trend_slopes", oracle=_E14_ORACLE, tags=("stats", "trend"))
def e14_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast("long").alias("x"),
    ).agg(F.count(F.lit(1)).alias("y"))
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "event_type",
        "n_days",
        (num.cast("double") / den.cast("double")).alias("slope_per_day"),
    )


# ---------------------------------------------------------------------------
# e15 — RANGE-frame trailing window: 7-day trailing sum over a daily series
# that HAS GAPS — the case where a ROWS frame silently lies (6 preceding
# rows can span months) and the value-based RANGE frame is the correct
# tool. Spark expresses it as rangeBetween(-6, 0) over the integer day
# number; integer micros end-to-end. One shuffle on the series key.
# ---------------------------------------------------------------------------

_E15_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT) AS tot
  FROM events GROUP BY 1, 2)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, tot,
       CAST(SUM(tot) OVER (PARTITION BY event_type ORDER BY day
              RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS BIGINT)
         AS trailing_7d
FROM daily
"""


@register("e15_trailing_7day_range", oracle=_E15_ORACLE, tags=("window", "range-frame"), bench=True)
def e15_trailing_7day_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 1000000.0).cast("long")).alias("tot")
    )
    dn = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")).cast("long")
    w = (
        W.partitionBy("event_type")
        .orderBy(dn)
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "tot",
        F.sum("tot").over(w).alias("trailing_7d"),
    )


# ---------------------------------------------------------------------------
# e16 — OHLC bars: per (event_type, day) open/high/low/close from
# min_by/max_by keyed on (ts, event_id) — the order-statistic aggregates
# that replace a sort-within-group. Ties on ts are broken by event_id in
# BOTH engines so the picked row is unique; values are integer micros.
# One shuffle on the bar key; everything partial-aggregates map-side
# (min_by/max_by are mergeable).
# ---------------------------------------------------------------------------

_E16_ORACLE = """
WITH k AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord_key,
         CAST(floor(value*1000000.0) AS BIGINT) AS vm
  FROM events)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
       CAST(arg_min(vm, ord_key) AS BIGINT) AS open,
       CAST(max(vm) AS BIGINT) AS high,
       CAST(min(vm) AS BIGINT) AS low,
       CAST(arg_max(vm, ord_key) AS BIGINT) AS close,
       CAST(count(*) AS BIGINT) AS n
FROM k
GROUP BY 1, 2
"""


@register("e16_ohlc_bars", oracle=_E16_ORACLE, tags=("timeseries", "ohlc"), bench=True)
def e16_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir).select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 1000000.0).cast("long").alias("vm"),
    )
    key = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return ev.groupBy("event_type", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")).agg(
        F.min_by("vm", key).alias("open"),
        F.max("vm").alias("high"),
        F.min("vm").alias("low"),
        F.max_by("vm", key).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# e17 — per-user inter-event gap statistics through the GROUPED-MAP Arrow
# path (applyInPandas): the custom-per-group-computation escape hatch the
# engine offers when window expressions can't express the logic (here they
# could — the point is certifying the path itself with a hash-exact
# oracle). Each user's events arrive as ONE pandas frame, vectorized numpy
# diff over the (ts, event_id)-sorted epoch-microsecond column; gaps are
# integers, so the oracle (lag() SQL) matches exactly. Scale: one shuffle
# on user_id; per-group memory is that user's events — bounded by the
# hottest key, the documented applyInPandas constraint (salt or pre-reduce
# hot keys first).
# ---------------------------------------------------------------------------

_E17_ORACLE = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(count(*) + 1 AS BIGINT) AS n_events,
       CAST(min(gap) AS BIGINT) AS min_gap_us,
       CAST(max(gap) AS BIGINT) AS max_gap_us,
       CAST(sum(gap) AS BIGINT) AS span_us
FROM g WHERE gap IS NOT NULL
GROUP BY user_id
"""


@register("e17_user_gap_stats_arrow", oracle=_E17_ORACLE, tags=("arrow", "grouped-map"))
def e17_user_gap_stats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    apply_session_conf(spark)
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )

    def gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["us", "event_id"])
        us = pdf["us"].to_numpy(dtype=np.int64)
        if len(us) < 2:  # no gaps — mirror the oracle's WHERE gap IS NOT NULL
            return pd.DataFrame(
                columns=["user_id", "n_events", "min_gap_us", "max_gap_us", "span_us"]
            )
        d = np.diff(us)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(us)],
                "min_gap_us": [int(d.min())],
                "max_gap_us": [int(d.max())],
                "span_us": [int(d.sum())],
            }
        )

    return (
        ev.groupBy("user_id")
        .applyInPandas(
            gaps,
            schema="user_id bigint, n_events bigint, min_gap_us bigint, "
            "max_gap_us bigint, span_us bigint",
        )
    )


# ---------------------------------------------------------------------------
# e18 — day-of-week seasonality: counts and within-type shares per ISO
# weekday. The share is ONE division of two exact longs (deterministic both
# engines); dayofweek is computed on the UTC-pinned session so the oracle's
# isodow matches Spark's dayofweek remapping exactly.
# ---------------------------------------------------------------------------

_E18_ORACLE = """
WITH d AS (
  SELECT event_type, CAST(isodow(CAST(ts AS DATE)) AS INTEGER) AS dow FROM events),
c AS (
  SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1, 2),
t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY event_type)
SELECT c.event_type, c.dow, c.n,
       CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS share
FROM c JOIN t USING (event_type)
"""


@register("e18_dow_seasonality", oracle=_E18_ORACLE, tags=("timeseries", "seasonality"))
def e18_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    # Spark dayofweek: 1=Sunday..7=Saturday → remap to ISO 1=Monday..7=Sunday
    iso_dow = ((F.dayofweek(F.to_date("ts")) + 5) % 7) + 1
    c = ev.groupBy("event_type", iso_dow.cast("int").alias("dow")).agg(
        F.count(F.lit(1)).alias("n")
    )
    t = c.groupBy("event_type").agg(F.sum("n").alias("tot"))
    return c.join(t, "event_type").select(
        "event_type",
        "dow",
        "n",
        (F.col("n").cast("double") / F.col("tot").cast("double")).alias("share"),
    )


# ---------------------------------------------------------------------------
# e19 — inter-arrival distribution: per-event-type histogram of per-user
# gap magnitudes (bucket = decimal digit count of the microsecond gap — an
# order-of-magnitude histogram whose bucketing, integer string length, is
# trivially identical in both engines; log2/log10 would risk last-ulp
# disagreement at bucket edges). The burst-vs-idle shape per event type at
# a glance; one user-keyed window pass plus one small aggregate.
# ---------------------------------------------------------------------------

_E19_ORACLE = """
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
)
SELECT event_type,
       CAST(length(CAST(gap AS VARCHAR)) AS INTEGER) AS gap_digits,
       CAST(count(*) AS BIGINT) AS n
FROM g WHERE gap IS NOT NULL AND gap > 0
GROUP BY 1, 2
"""


@register("e19_interarrival_histogram", oracle=_E19_ORACLE, tags=("timeseries", "histogram"))
def e19_interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return (
        ev.select("event_type", gap.alias("gap"))
        .filter(F.col("gap").isNotNull() & (F.col("gap") > 0))
        .groupBy(
            "event_type",
            F.length(F.col("gap").cast("string")).cast("int").alias("gap_digits"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# e20 — user growth curve: daily new users (first-seen) and the cumulative
# registered-user count over time — the growth analytics primitive. Two
# keyed passes: min-ts per user, then a day aggregate with a running sum
# window; all integers.
# ---------------------------------------------------------------------------

_E20_ORACLE = """
WITH first_seen AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id),
daily AS (
  SELECT d0 AS day, CAST(count(*) AS BIGINT) AS new_users
  FROM first_seen GROUP BY d0)
SELECT strftime(day, '%Y-%m-%d') AS day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM daily
"""


@register("e20_user_growth_curve", oracle=_E20_ORACLE, tags=("timeseries", "growth"))
def e20_user_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    first_seen = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    daily = first_seen.groupBy(F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


# ---------------------------------------------------------------------------
# e21 — alert runs: maximal consecutive-day runs where a type's daily count
# exceeds its own mean (integer threshold = total div n_days) — the
# monitoring primitive that turns point alerts into incidents with start /
# end / duration. Gaps-and-islands over the day spine per type; threshold
# derivation, grouping, and all outputs are integer-exact.
# ---------------------------------------------------------------------------

_E21_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
thr AS (
  SELECT event_type, CAST(sum(n) // count(*) AS BIGINT) AS cut
  FROM daily GROUP BY event_type),
hot AS (
  SELECT d.event_type, d.day, d.n
  FROM daily d JOIN thr USING (event_type) WHERE d.n > thr.cut),
isl AS (
  SELECT event_type, day, n,
         CAST(day - DATE '1970-01-01' AS BIGINT)
           - row_number() OVER (PARTITION BY event_type ORDER BY day) AS grp
  FROM hot)
SELECT event_type,
       strftime(min(day), '%Y-%m-%d') AS run_start,
       strftime(max(day), '%Y-%m-%d') AS run_end,
       CAST(count(*) AS BIGINT) AS run_days,
       CAST(sum(n) AS BIGINT) AS run_events
FROM isl
GROUP BY event_type, grp
"""


@register("e21_alert_runs", oracle=_E21_ORACLE, tags=("timeseries", "alerts"))
def e21_alert_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    thr = daily.groupBy("event_type").agg(
        F.floor(F.sum("n") / F.count(F.lit(1))).cast("long").alias("cut")
    )
    hot = daily.join(thr, "event_type").filter(F.col("n") > F.col("cut"))
    w = W.partitionBy("event_type").orderBy("day")
    isl = hot.withColumn(
        "grp",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")).cast("long")
        - F.row_number().over(w),
    )
    return isl.groupBy("event_type", "grp").agg(
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("run_start"),
        F.date_format(F.max("day"), "yyyy-MM-dd").alias("run_end"),
        F.count(F.lit(1)).alias("run_days"),
        F.sum("n").alias("run_events"),
    ).drop("grp")


# ---------------------------------------------------------------------------
# e22 — week-over-week change: weekly event counts per type with the
# previous week's count and the WoW delta as an exact integer plus a ratio
# from one division of two longs. Weeks key on ISO year-week strings so
# both engines bucket identically across year boundaries.
# ---------------------------------------------------------------------------

_E22_ORACLE = """
WITH weekly AS (
  SELECT event_type, strftime(CAST(date_trunc('week', ts) AS DATE), '%Y-%m-%d') AS iso_week,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2)
SELECT event_type, iso_week, n,
       lag(n) OVER (PARTITION BY event_type ORDER BY iso_week) AS prev_n,
       n - lag(n) OVER (PARTITION BY event_type ORDER BY iso_week) AS delta,
       CAST(n AS DOUBLE)
         / CAST(lag(n) OVER (PARTITION BY event_type ORDER BY iso_week) AS DOUBLE)
         AS wow_ratio
FROM weekly
"""


@register("e22_wow_change", oracle=_E22_ORACLE, tags=("timeseries", "wow"))
def e22_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    # key each week by its Monday (date_trunc('week') is Monday-start in
    # BOTH engines) — no week-number pattern needed (Spark 3+ forbids the
    # week-based date_format fields) and no year-boundary ambiguity
    iso_week = F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd")
    weekly = ev.groupBy("event_type", iso_week.alias("iso_week")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("event_type").orderBy("iso_week")
    prev = F.lag("n").over(w)
    return weekly.select(
        "event_type",
        "iso_week",
        "n",
        prev.alias("prev_n"),
        (F.col("n") - prev).alias("delta"),
        (F.col("n").cast("double") / prev.cast("double")).alias("wow_ratio"),
    )


# ---------------------------------------------------------------------------
# e23 — stream-stream LEFT OUTER interval join, batch-checked (round 7):
# click→purchase ABANDONMENT. e9 is the inner join (attributed pairs);
# this is its outer companion — every click, matched or null-padded — the
# plan whose streaming form can only emit the null rows after the
# watermark proves no purchase can still arrive. The registered batch
# plan is EXACTLY the plan streaming/windows.py::interval_join_outer
# builds in streaming mode; tests/test_streaming.py asserts stream ==
# batch on the same input (with a far-future sentinel advancing the
# watermark so append mode flushes the unmatched buffer).
# ---------------------------------------------------------------------------

_ABANDON_ORACLE = """
WITH c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
SELECT c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       p.value AS purchase_value,
       CAST((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS BIGINT) AS lag_seconds,
       p.ts IS NOT NULL AS matched
FROM c LEFT JOIN p
  ON c.user_id = p.user_id AND p.ts > c.ts
 AND p.ts <= c.ts + INTERVAL 30 MINUTE
"""


@register("e23_click_abandonment", oracle=_ABANDON_ORACLE, tags=("events", "stream-stream", "interval-join", "outer"))
def e23_click_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realestatedeals_spark.streaming.windows import interval_join_outer

    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = interval_join_outer(clicks, purchases, within="30 minutes")
    return out.select(
        "user_id",
        F.date_format("l_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.date_format("r_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.col("r_value").alias("purchase_value"),
        "lag_seconds",
        "matched",
    )


# ---------------------------------------------------------------------------
# e24 — per-user EWMA (round 7): the recursive aggregate SQL window frames
# cannot express (each step consumes the previous ACCUMULATOR, not a frame
# of inputs). Re-expressed as a fold over the time-sorted value array with
# α = 1/8 — both engines run the identical multiply/add sequence per
# element (exactly-representable α, left fold seeded with the first
# value), so the floating EWMA is hash-exact, per the repo's sorted-fold
# determinism recipe. Scale: one shuffle on user_id; per-user arrays are
# event-history bounded (chunk by era for unbounded keys).
# ---------------------------------------------------------------------------

_EWMA_ORACLE = """
WITH vals AS (
  SELECT user_id, list(value ORDER BY ts, event_id) AS vs,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id)
SELECT user_id, n_events,
       list_reduce(vs, (acc, x) -> (acc * 0.875) + (x * 0.125)) AS ewma,
       vs[-1] AS last_value
FROM vals
"""


@register("e24_ewma", oracle=_EWMA_ORACLE, tags=("events", "window", "fold"))
def e24_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    arr = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "value"))
    )
    per_user = ev.groupBy("user_id").agg(
        F.transform(arr, lambda s: s["value"]).alias("vs"),
        F.count(F.lit(1)).alias("n_events"),
    )
    ewma = F.aggregate(
        F.slice(F.col("vs"), 2, F.size("vs") - 1),
        F.element_at(F.col("vs"), 1),
        lambda acc, x: (acc * F.lit(0.875)) + (x * F.lit(0.125)),
    )
    return per_user.select(
        "user_id",
        "n_events",
        ewma.alias("ewma"),
        F.element_at("vs", -1).alias("last_value"),
    )


# ---------------------------------------------------------------------------
# e25 — Holt's linear-trend forecast (round 7): the COUPLED double
# recursion (level and trend update from each other) that neither window
# frames nor a single list fold can express. Spark side: per-user sorted
# value array + one F.aggregate fold with a STRUCT accumulator; oracle
# side: the same recursion replayed row-by-row with a recursive CTE (the
# ADPCM-oracle pattern, float edition). α=1/4 and β=1/8 are exactly
# representable, every step is multiply/add in a fixed order, so level,
# trend, and the one-step forecast are hash-exact doubles cross-engine.
# ---------------------------------------------------------------------------

_HOLT_ORACLE = """
WITH RECURSIVE vals AS (
  SELECT user_id, list(value ORDER BY ts, event_id) AS vs,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id),
st(user_id, i, lev, tr) AS (
  SELECT user_id, 1::BIGINT, vs[1], 0.0::DOUBLE FROM vals
  UNION ALL
  SELECT st.user_id, i + 1,
         (0.25 * v.vs[CAST(i + 1 AS INT)]) + (0.75 * (lev + tr)),
         (0.125 * (((0.25 * v.vs[CAST(i + 1 AS INT)]) + (0.75 * (lev + tr))) - lev))
           + (0.875 * tr)
  FROM st JOIN vals v USING (user_id) WHERE st.i < v.n)
SELECT st.user_id, v.n AS n_events, st.lev AS level, st.tr AS trend,
       st.lev + st.tr AS forecast_next
FROM st JOIN vals v USING (user_id) WHERE st.i = v.n
"""


@register("e25_holt_forecast", oracle=_HOLT_ORACLE, tags=("events", "forecast", "fold"))
def e25_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    per_user = ev.groupBy("user_id").agg(
        F.transform(arr, lambda s: s["value"]).alias("vs"),
        F.count(F.lit(1)).alias("n_events"),
    )
    init = F.struct(
        F.element_at(F.col("vs"), 1).alias("lev"), F.lit(0.0).alias("tr")
    )
    step = lambda acc, x: F.struct(
        ((F.lit(0.25) * x) + (F.lit(0.75) * (acc["lev"] + acc["tr"]))).alias("lev"),
        (
            F.lit(0.125)
            * (((F.lit(0.25) * x) + (F.lit(0.75) * (acc["lev"] + acc["tr"]))) - acc["lev"])
            + F.lit(0.875) * acc["tr"]
        ).alias("tr"),
    )
    fin = F.aggregate(F.slice(F.col("vs"), 2, F.size("vs") - 1), init, step)
    return per_user.select(
        "user_id",
        "n_events",
        fin["lev"].alias("level"),
        fin["tr"].alias("trend"),
        (fin["lev"] + fin["tr"]).alias("forecast_next"),
    )


# ---------------------------------------------------------------------------
# e26 — classical additive seasonal decomposition (trend + day-of-hour
# seasonal + remainder) over the hourly value series, kept hash-exact:
# trend is a centered 25-point moving sum with integer-micros division
# (both engines truncate BIGINT division toward zero, verified), defined
# only where the full ±12-hour window exists; the seasonal component is
# the per-hour-of-day mean deviation over trend-covered points; the
# remainder closes the identity y = trend + seasonal + resid exactly.
# Scale shape: one hourly pre-aggregation (map-side combine), one
# range-partitioned window pass, and a 24-row broadcast join back.
# ---------------------------------------------------------------------------

_E26_ORACLE = """
WITH hourly AS (
  SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600 AS BIGINT) AS hsec,
         CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1
),
t AS (
  SELECT hsec, y,
         sum(y) OVER w AS s25,
         count(*) OVER w AS c25
  FROM hourly
  WINDOW w AS (ORDER BY hsec ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
),
tr AS (
  SELECT hsec, y,
         CASE WHEN c25 = 25 THEN s25 // 25 ELSE NULL END AS trend,
         (hsec // 3600) % 24 AS hod
  FROM t
),
seas AS (
  SELECT hod, CAST(sum(y - trend) // count(*) AS BIGINT) AS seasonal
  FROM tr WHERE trend IS NOT NULL GROUP BY hod
)
SELECT strftime(to_timestamp(tr.hsec) AT TIME ZONE 'UTC', '%Y-%m-%d %H:%M:%S') AS hour_start,
       CAST(tr.y AS BIGINT) AS y_micros,
       CAST(tr.trend AS BIGINT) AS trend_micros,
       CAST(seas.seasonal AS BIGINT) AS seasonal_micros,
       CAST(tr.y - tr.trend - seas.seasonal AS BIGINT) AS resid_micros
FROM tr LEFT JOIN seas ON tr.hod = seas.hod
"""


@register("e26_seasonal_decompose", oracle=_E26_ORACLE, tags=("window", "timeseries"))
def e26_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir).select("ts", "value")
    hourly = ev.groupBy(
        (F.floor(F.unix_micros("ts") / 3600000000) * 3600).cast("long").alias("hsec")
    ).agg(F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias("y"))
    w = W.orderBy("hsec").rowsBetween(-12, 12)
    t = hourly.select(
        "hsec",
        "y",
        F.sum("y").over(w).alias("s25"),
        F.count(F.lit(1)).over(w).alias("c25"),
    )
    tr = t.select(
        "hsec",
        "y",
        F.when(F.col("c25") == 25, F.expr("s25 div 25")).alias("trend"),
        F.expr("(hsec div 3600) % 24").alias("hod"),
    )
    seas = (
        tr.filter(F.col("trend").isNotNull())
        .groupBy("hod")
        .agg(F.expr("sum(y - trend) div count(1)").cast("long").alias("seasonal"))
    )
    out = tr.join(F.broadcast(seas), "hod", "left").select(
        F.date_format(F.to_timestamp(F.col("hsec")), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_start"
        ),
        F.col("y").alias("y_micros"),
        F.col("trend").alias("trend_micros"),
        F.col("seasonal").alias("seasonal_micros"),
        (F.col("y") - F.col("trend") - F.col("seasonal")).alias("resid_micros"),
    )
    return out


# ---------------------------------------------------------------------------
# e27 — CUSUM changepoint detection on the hourly event-count series.
# Deviations from the global mean are kept exact by scaling with the hour
# count: S_t = sum_{i<=t} (c_i * n_hours - total) is the classic CUSUM
# curve times n_hours, all BIGINT — so the peak (the changepoint estimate,
# argmax |S_t|, earliest hour on ties) is hash-exact with no float mean.
# ---------------------------------------------------------------------------

_E27_ORACLE = """
WITH hourly AS (
  SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600 AS BIGINT) AS hsec,
         count(*) AS c
  FROM events GROUP BY 1),
t AS (
  SELECT hsec, c, sum(c) OVER () AS total, count(*) OVER () AS nh FROM hourly),
s AS (
  SELECT hsec, c, sum(c * nh - total) OVER (ORDER BY hsec) AS s_scaled FROM t)
SELECT strftime(to_timestamp(hsec) AT TIME ZONE 'UTC', '%Y-%m-%d %H:%M:%S') AS hour_start,
       CAST(c AS BIGINT) AS n_events,
       CAST(s_scaled AS BIGINT) AS s_scaled,
       row_number() OVER (ORDER BY abs(s_scaled) DESC, hsec) = 1 AS is_peak
FROM s
"""


@register("e27_cusum_changepoint", oracle=_E27_ORACLE, tags=("window", "timeseries"))
def e27_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM curve + changepoint flag over hourly event counts.

    Scale shape: the raw stream collapses to one row per hour in the
    first groupBy (map-side combined); every window after that runs on
    the tiny hourly frame, so the unpartitioned ordering is bounded by
    the calendar, not the data volume.
    """
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir).select("ts")
    hourly = ev.groupBy(
        (F.floor(F.unix_micros("ts") / 3600000000) * 3600).cast("long").alias("hsec")
    ).agg(F.count(F.lit(1)).alias("c"))
    t = hourly.select(
        "hsec",
        "c",
        F.sum("c").over(W.partitionBy()).alias("total"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("nh"),
    )
    s = t.select(
        "hsec",
        "c",
        F.sum(F.col("c") * F.col("nh") - F.col("total"))
        .over(W.orderBy("hsec"))
        .alias("s_scaled"),
    )
    rk = F.row_number().over(W.orderBy(F.abs("s_scaled").desc(), "hsec"))
    return s.select(
        F.date_format(F.to_timestamp("hsec"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        F.col("c").alias("n_events"),
        "s_scaled",
        (rk == 1).alias("is_peak"),
    )


# ---------------------------------------------------------------------------
# x6 — EXACT distinct counting via mergeable bitmaps. count(DISTINCT) at
# scale either expands rows (one shuffle record per (group, value)) or
# falls back to approx_count_distinct; Spark's bitmap aggregates give a
# third way — partial per-bucket bitmaps built map-side, OR-merged, then
# popcounted — exact like the expand, mergeable like the sketch. The
# oracle is plain COUNT(DISTINCT), so the hash match proves the bitmap
# path is exactly lossless.
# ---------------------------------------------------------------------------

_X6_BITMAP_ORACLE = """
SELECT strftime(to_timestamp(CAST(floor(epoch_us(ts) / 86400000000) * 86400 AS BIGINT)) AT TIME ZONE 'UTC', '%Y-%m-%d') AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""


@register("x6_bitmap_distinct", oracle=_X6_BITMAP_ORACLE, tags=("X6", "profiling", "bitmap"))
def x6_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day exact distinct users via two-level bitmap aggregation.

    Scale shape: stage 1 groups on (day, bitmap bucket) and builds each
    bucket's bitmap with map-side partial aggregation — the shuffle
    carries one bitmap per (day, bucket), never one record per user;
    stage 2 popcounts and sums. Both stages are plain hash aggregates, no
    expand, no sketch error.
    """
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir).select("ts", "user_id")
    day = (F.floor(F.unix_micros("ts") / 86400000000) * 86400).cast("long")
    lvl1 = (
        ev.select(
            day.alias("dsec"),
            F.bitmap_bucket_number("user_id").alias("bucket"),
            F.bitmap_bit_position("user_id").alias("pos"),
        )
        .groupBy("dsec", "bucket")
        .agg(
            F.bitmap_construct_agg("pos").alias("bm"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return (
        lvl1.groupBy("dsec")
        .agg(
            F.sum(F.bitmap_count("bm")).alias("n_users"),
            F.sum("cnt").alias("n_events"),
        )
        .select(
            F.date_format(F.to_timestamp("dsec"), "yyyy-MM-dd").alias("day"),
            "n_users",
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# e28 — sequence-pattern matching (MATCH_RECOGNIZE's core): find "V"
# patterns per user — a strictly-decreasing run of >= 3 values followed
# immediately by a strictly-increasing run of >= 3 — via sign-of-diff +
# gaps-and-islands. Pure window algebra: no NFA, no per-row Python, and
# the same (user, ts) sort feeds every stage. Depth is reported in floor
# micros so the oracle is hash-exact.
# ---------------------------------------------------------------------------

_E28_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id, value,
         sign(value - lag(value) OVER w) AS sgn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
flagged AS (
  SELECT user_id, ts, event_id, value, sgn,
         CASE WHEN lag(sgn) OVER w2 IS NULL OR sgn <> lag(sgn) OVER w2
              THEN 1 ELSE 0 END AS new_run
  FROM e WHERE sgn IS NOT NULL AND sgn <> 0
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)),
runs AS (
  SELECT user_id, ts, event_id, value, sgn,
         sum(new_run) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS run_id
  FROM flagged),
agg AS (
  SELECT user_id, run_id, min(sgn) AS sgn, count(*) AS len,
         min_by(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                       || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS v_first,
         max_by(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                       || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS v_last,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS t_first,
         strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS t_last
  FROM runs GROUP BY user_id, run_id),
paired AS (
  SELECT user_id, sgn, len, t_first, t_last, v_first, v_last,
         lead(sgn) OVER w3 AS nsgn, lead(len) OVER w3 AS nlen,
         lead(t_last) OVER w3 AS nt_last, lead(v_last) OVER w3 AS nv_last
  FROM agg
  WINDOW w3 AS (PARTITION BY user_id ORDER BY run_id))
SELECT user_id,
       t_first AS v_start, t_last AS v_bottom, nt_last AS v_end,
       CAST(len AS BIGINT) AS down_steps, CAST(nlen AS BIGINT) AS up_steps,
       CAST(floor(v_first * 1000000) - floor(v_last * 1000000) AS BIGINT) AS depth_micros
FROM paired
WHERE sgn = -1 AND nsgn = 1 AND len >= 3 AND nlen >= 3
"""


@register("e28_vshape_patterns", oracle=_E28_ORACLE, tags=("window", "pattern"))
def e28_vshape_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user V-shaped value patterns (>=3 strict drops then >=3 strict
    rises) — the row-pattern-matching workload, done as window algebra.

    Scale shape: one exchange on user_id; every window (diff sign, run
    islands, run aggregate, adjacent-run pairing) reuses that partitioning
    and the (ts, event_id) sort, so pattern matching costs one shuffle
    regardless of pattern length.
    """
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.withColumn("sgn", F.signum(F.col("value") - F.lag("value").over(w)))
    runs = (
        e.filter(F.col("sgn").isNotNull() & (F.col("sgn") != 0))
        .withColumn(
            "new_run",
            F.when(
                F.lag("sgn").over(w).isNull() | (F.col("sgn") != F.lag("sgn").over(w)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("run_id", F.sum("new_run").over(w))
    )
    key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    agg = runs.groupBy("user_id", "run_id").agg(
        F.min("sgn").alias("sgn"),
        F.count(F.lit(1)).alias("len"),
        F.min_by("value", key).alias("v_first"),
        F.max_by("value", key).alias("v_last"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("t_first"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("t_last"),
    )
    w3 = W.partitionBy("user_id").orderBy("run_id")
    paired = agg.select(
        "user_id", "sgn", "len", "t_first", "t_last", "v_first", "v_last",
        F.lead("sgn").over(w3).alias("nsgn"),
        F.lead("len").over(w3).alias("nlen"),
        F.lead("t_last").over(w3).alias("nt_last"),
        F.lead("v_last").over(w3).alias("nv_last"),
    )
    return paired.filter(
        (F.col("sgn") == -1) & (F.col("nsgn") == 1) & (F.col("len") >= 3) & (F.col("nlen") >= 3)
    ).select(
        "user_id",
        F.col("t_first").alias("v_start"),
        F.col("t_last").alias("v_bottom"),
        F.col("nt_last").alias("v_end"),
        F.col("len").alias("down_steps"),
        F.col("nlen").alias("up_steps"),
        (
            F.floor(F.col("v_first") * 1000000) - F.floor(F.col("v_last") * 1000000)
        ).cast("long").alias("depth_micros"),
    )


# ---------------------------------------------------------------------------
# E29 — VARIANT shredding (round 7): Spark 4's open-encoded semi-structured
# type (parse_json → VARIANT → typed variant_get paths) replacing
# string-JSON re-parsing per access. The fixture's props is a flat one-key
# object, so the query synthesizes a deterministically NESTED envelope
# (object → object → array) around it on BOTH engines and shreds typed
# leaves back out — path navigation, array indexing, try_-missing-path
# semantics, and typed casts are what's checked. At scale VARIANT binary
# beats per-access string JSON parsing (parse once per row, navigate
# cheaply), and the shredded leaves land in ordinary columnar aggregates.
# The oracle side uses DuckDB's JSON navigation over the identical
# synthesized document.
# ---------------------------------------------------------------------------

_E29_VARIANT_ORACLE = """
WITH j AS (
  SELECT event_type,
         '{"meta":{"src":"' || event_type || '","flags":['
           || (user_id % 2) || ',' || (user_id % 5) || ']},"payload":{"k":'
           || COALESCE(json_extract_string(props, '$.k'), 'null') || '}}' AS js
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract(js, '$.payload.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(CAST(json_extract(js, '$.meta.flags[0]') AS BIGINT)) AS BIGINT) AS sum_flag0,
       CAST(SUM(CAST(json_extract(js, '$.meta.flags[1]') AS BIGINT)) AS BIGINT) AS sum_flag1,
       CAST(SUM(CAST(json_extract(js, '$.meta.missing') AS BIGINT)) AS BIGINT) AS sum_missing,
       MIN(json_extract_string(js, '$.meta.src')) AS src_min
FROM j
GROUP BY event_type
"""


@register("e29_variant_shred", oracle=_E29_VARIANT_ORACLE, tags=("json", "semi-structured", "variant"))
def e29_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed aggregates over VARIANT paths: parse the synthesized nested
    document ONCE per row into Spark 4's VARIANT, then navigate
    object/array paths with variant_get (try_variant_get for the
    deliberately missing path — NULL, never an error)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.select(
            "event_type",
            F.expr(f"parse_json({_e29_js_sql()})").alias("v"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("variant_get(v, '$.payload.k', 'long')")).alias("sum_k"),
            F.sum(F.expr("variant_get(v, '$.meta.flags[0]', 'long')")).alias("sum_flag0"),
            F.sum(F.expr("variant_get(v, '$.meta.flags[1]', 'long')")).alias("sum_flag1"),
            F.sum(F.expr("try_variant_get(v, '$.meta.missing', 'long')")).alias("sum_missing"),
            F.min(F.expr("variant_get(v, '$.meta.src', 'string')")).alias("src_min"),
        )
    )


def _e29_js_sql() -> str:
    """The synthesized document as a SQL expression (same text shape as the
    oracle's || chain, Spark function names)."""
    return (
        "'{\"meta\":{\"src\":\"' || event_type || '\",\"flags\":[' || "
        "CAST(user_id % 2 AS STRING) || ',' || CAST(user_id % 5 AS STRING) || "
        "']},\"payload\":{\"k\":' || "
        "COALESCE(get_json_object(props, '$.k'), 'null') || '}}'"
    )


# ---------------------------------------------------------------------------
# E30 — Markov transition matrix over per-user event sequences (round 7):
# the classic product-analytics "what happens next" operator. LEAD over the
# (user, ts, event_id)-ordered stream forms transitions; one keyed count +
# one partition-sum window turn them into exact row-normalized
# probabilities. Two exchanges total (user-keyed window, then the
# from_type-keyed agg/window, which Catalyst shares); probabilities divide
# two exact BIGINTs on both engines, so the matrix is hash-exact.
# ---------------------------------------------------------------------------

_E30_TRANSITIONS_ORACLE = """
WITH nxt AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM nxt WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS prob
FROM c
"""


@register("e30_transition_matrix", oracle=_E30_TRANSITIONS_ORACLE, tags=("window", "markov", "funnel"))
def e30_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition counts and row-normalized probabilities over
    each user's (ts, event_id)-ordered stream."""
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    c = nxt.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    wt = W.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wt).cast("double")).alias("prob"),
    )


# ---------------------------------------------------------------------------
# E31 — RFM segmentation (round 7): the standard customer-value quartiling.
# Recency (micros from the user's last purchase to the corpus max ts),
# frequency (purchase count), monetary (exact decimal-accumulated value)
# per user, then NTILE(4) per dimension with a user_id tiebreak so the
# quartile edges are deterministic on both engines.
#
# Round 11: the three quartiles were F.ntile(4) over UNPARTITIONED windows
# — three single-partition sorts of the whole per-user frame, a straight
# scale-killer at 10⁹ users. Now each dimension runs through
# operators/ranking.ntile_exact, which (round 12) ranks only the NARROW
# order-key projection, collects the 3 quartile-boundary keys, and assigns
# buckets by lexicographic comparison — reproducing ntile's exact uneven-
# bucket arithmetic, so the oracle is UNCHANGED and still hash-exact while
# no stage ever serializes onto one partition, nothing joins, and no rank
# checkpoint outlives the call (the r11 form leaked one full-width
# localCheckpoint per dimension — ADVICE r11). The user frame is
# checkpointed once so the three boundary ranks don't re-aggregate events.
# ---------------------------------------------------------------------------

_E31_RFM_ORACLE = """
WITH p AS (
  SELECT user_id,
         max(ts) AS last_ts,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS monetary
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
),
m AS (SELECT max(ts) AS mx FROM events),
r AS (
  SELECT user_id,
         epoch_us(m.mx) - epoch_us(p.last_ts) AS recency_us,
         frequency, monetary
  FROM p, m
)
SELECT user_id, CAST(recency_us AS BIGINT) AS recency_us, frequency, monetary,
       CAST(ntile(4) OVER (ORDER BY recency_us ASC, user_id) AS BIGINT) AS r_quartile,
       CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS BIGINT) AS f_quartile,
       CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS BIGINT) AS m_quartile
FROM r
"""


@register("e31_rfm_segments", oracle=_E31_RFM_ORACLE, tags=("window", "segmentation"))
def e31_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/frequency/monetary quartiles per purchasing user. Quartiles
    need a total order, but NOT a single-partition window: each dimension
    goes through ntile_exact's boundary split (narrow key rank → 3 collected
    boundary keys → comparison chain), so the per-user frame itself is
    never ranked, joined, or windowed."""
    from realestatedeals_spark.operators.ranking import (
        adaptive_rank_partitions,
        ntile_exact,
    )

    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            _dsum(F.col("value")).alias("monetary"),
        )
    )
    mx = ev.agg(F.max("ts").alias("mx"))
    r = (
        p.crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            (F.unix_micros("mx") - F.unix_micros("last_ts")).alias("recency_us"),
            "frequency",
            "monetary",
        )
        .localCheckpoint(eager=True)  # feeds 3 rank paths + their counts jobs
    )
    # partitions ∝ users: shared sizing with global_rank's adaptive path
    n_users = r.count()  # free: r is already materialized
    npart = adaptive_rank_partitions(n_users, spark)
    orders = {
        "r_quartile": [("recency_us", "asc"), ("user_id", "asc")],
        "f_quartile": [("frequency", "desc"), ("user_id", "asc")],
        "m_quartile": [("monetary", "desc"), ("user_id", "asc")],
    }
    out = r
    for col, specs in orders.items():
        out = ntile_exact(out, specs, n_buckets=4, out_col=col, num_partitions=npart)
    return out.select(
        "user_id", "recency_us", "frequency", "monetary",
        "r_quartile", "f_quartile", "m_quartile",
    )


# ---------------------------------------------------------------------------
# E32 — top session paths (round 7): the clickstream "common journeys"
# report. Sessions reuse e2's 30-minute gaps-and-islands; each session's
# first 5 event types concatenate (in (ts, event_id) order — the ordered
# string-agg is the cross-engine determinism point: Spark sorts collected
# (rn, type) structs, DuckDB uses ORDER BY inside string_agg) into a path,
# and paths are counted. Top 20 by (count desc, path) so the cut is exact.
# ---------------------------------------------------------------------------

_E32_PATHS_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
),
ranked AS (
  SELECT user_id, session_id, event_type,
         row_number() OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id) AS rn
  FROM sess
),
paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ranked WHERE rn <= 5
  GROUP BY user_id, session_id
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
"""


@register("e32_top_session_paths", oracle=_E32_PATHS_ORACLE, tags=("window", "session", "funnel"))
def e32_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 most common first-5-event session journeys. One user-keyed
    exchange covers sessionization AND ranking (same partitioning); the
    path agg collects ≤5 structs per session and sorts them — bounded,
    deterministic — and the global top-20 is TakeOrderedAndProject."""
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    wc = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    sess = ev.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(wc).cast("long")
    )
    rn = F.row_number().over(
        W.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    )
    ranked = sess.withColumn("rn", rn).filter(F.col("rn") <= 5)
    paths = (
        ranked.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda x: x.event_type,
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# E33 — time-to-convert latency distribution (round 7): per user, earliest
# signup → earliest purchase at-or-after it; the latency distribution
# (exact interpolated percentiles over integer micros) is the product
# metric funnels feed. Spark percentile() and DuckDB quantile_cont share
# the linear-interpolation definition (verified bit-equal on
# olap_percentiles_exact), so the result is hash-exact. One user-keyed
# aggregate per stage, then a single global percentile over user-count
# rows — events-scale work happens in the keyed min()s.
# ---------------------------------------------------------------------------

_E33_TTC_ORACLE = """
WITH s AS (SELECT user_id, min(epoch_us(ts)) AS st FROM events
           WHERE event_type = 'signup' GROUP BY 1),
p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS pt
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.st
      GROUP BY e.user_id),
lat AS (SELECT p.user_id, p.pt - s.st AS latency_us FROM p JOIN s USING (user_id))
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       quantile_cont(latency_us, 0.25) AS p25_us,
       quantile_cont(latency_us, 0.5) AS p50_us,
       quantile_cont(latency_us, 0.75) AS p75_us,
       quantile_cont(latency_us, 0.9) AS p90_us,
       CAST(min(latency_us) AS BIGINT) AS min_us,
       CAST(max(latency_us) AS BIGINT) AS max_us
FROM lat
"""


@register("e33_time_to_convert", oracle=_E33_TTC_ORACLE, tags=("funnel", "percentile"))
def e33_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase latency percentiles over converting users."""
    apply_session_conf(spark)
    ev = load_events(spark, sf_dir)
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("st"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("pt"))
        .join(s, "user_id")
        .filter(F.col("pt") >= F.col("st"))
        .groupBy("user_id")
        .agg(F.min("pt").alias("pt"), F.first("st").alias("st"))
    )
    lat = p.select((F.col("pt") - F.col("st")).alias("latency_us"))
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.percentile("latency_us", F.lit(0.25)).alias("p25_us"),
        F.percentile("latency_us", F.lit(0.5)).alias("p50_us"),
        F.percentile("latency_us", F.lit(0.75)).alias("p75_us"),
        F.percentile("latency_us", F.lit(0.9)).alias("p90_us"),
        F.min("latency_us").alias("min_us"),
        F.max("latency_us").alias("max_us"),
    )
