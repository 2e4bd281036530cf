"""SparkSession factory tuned for the target workload.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the same
conf set is what we would ship on a multi-executor cluster — AQE on (runtime
shuffle coalescing + skew-join splitting), Arrow on (fast pandas/Pandas-UDF
interchange), UTC session timezone (oracle comparability), and shuffle
partitions sized to cores locally (on a real cluster this is overridden to
~2-3× total executor cores; AQE coalesces down from there).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    # Runtime re-planning: coalesce small shuffle partitions, split skewed
    # ones, demote to broadcast join when a side turns out small.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas interchange and Pandas UDFs (the sanctioned slow path).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics vs the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Broadcast threshold: dims (region/nation/supplier/contacts) are tiny at
    # every SF; 64 MB keeps them broadcast even at sf100-equivalent dims.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Runtime Bloom-filter join pruning (build a Bloom filter from the
    # selective side, push it into the probe-side scan) — on by default in
    # Spark 4, pinned here so a cluster-wide override can't silently drop a
    # scan-reduction lever the 100 TB join plans assume.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Let AQE size cached-plan output too (round 12): a .cache() inside a
    # query (c16's stream-static LM model) otherwise materializes at the
    # raw shuffle-partition count — 32 near-empty blocks locally, and at
    # any scale a partitioning AQE would have coalesced by bytes. Off by
    # default only to preserve output-partitioning compatibility for jobs
    # that rely on cached distribution, which nothing here does.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    # Scans: 128 MB split targets — the parquet default, stated explicitly
    # because the 100 TB sizing math depends on it.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    # Serve filterless MIN/MAX/COUNT straight from parquet footers (row-group
    # statistics) — a full-corpus profiling pass (x6) touches metadata, not
    # data. Only kicks in when every aggregate is pushable; harmless otherwise.
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.ui.explainMode": "formatted",
}


def get_spark(
    app_name: str = "realestatedeals-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's conf set.

    ``SPARK_GRAFT_CPUS`` (default 32) sizes both local parallelism and the
    shuffle-partition count; on a real cluster pass ``master`` and
    ``shuffle_partitions`` explicitly.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if master.startswith("local"):
        conf.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        conf.setdefault("spark.ui.enabled", "false")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def apply_session_conf(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable subset of the conf to an existing session.

    The driver hands our queries a session we did not build; everything our
    plans rely on for correctness (UTC timestamps, Arrow) is runtime-settable
    and applied here defensively.
    """
    for key in (
        "spark.sql.session.timeZone",
        "spark.sql.execution.arrow.pyspark.enabled",
        "spark.sql.adaptive.enabled",
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
    ):
        try:
            spark.conf.set(key, DEFAULT_CONF.get(key, "true"))
        except Exception:
            pass  # conf locked down — non-fatal, defaults are close enough
    return spark
