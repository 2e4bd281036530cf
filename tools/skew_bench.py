"""Measured evidence for the skew-join story → bench_results/skew_bench.json.

Builds a deliberately skewed fact table (one hot key owning ~50% of rows)
joined against a non-broadcastable-width dimension, and times three
strategies on identical data:

  plain      — SMJ with AQE skew splitting DISABLED (the naive cluster plan)
  aqe        — SMJ with AQE skew splitting on (session default)
  salted     — operators/skew.salted_join (pre-shuffle scatter)

All three must return the identical aggregate (asserted) — only wall time
differs. This turns SCALE.md's "salting for skew" from an argument into a
measurement. Broadcast of the dimension is deliberately disabled for the
measured joins: the scenario is the one where broadcast is not available
(dimension too wide), which is exactly when skew handling matters.

Usage: python tools/skew_bench.py [n_rows] (default 4,000,000)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    from pyspark.sql import functions as F

    from realestatedeals_spark.operators.skew import salted_join
    from realestatedeals_spark.session import get_spark

    spark = get_spark("skew-bench", master="local[32]", shuffle_partitions=32)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # ~50% of facts hit key 0; the rest spread over 1024 keys
    facts = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(1024)))
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    dim = spark.range(1024).select(
        F.col("id").alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("attr")
    )
    facts.write.mode("overwrite").parquet("/tmp/skew_facts")
    dim.write.mode("overwrite").parquet("/tmp/skew_dim")
    f = spark.read.parquet("/tmp/skew_facts")
    d = spark.read.parquet("/tmp/skew_dim")

    def agg(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        ).first()

    def timed(fn):
        fn()  # warm-up
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            res = fn()
            best = min(best, time.perf_counter() - t0)
        return best, res

    def run_plain():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        try:
            return agg(f.join(d, "k"))
        finally:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    def run_aqe():
        return agg(f.join(d, "k"))

    def run_salted():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        try:
            return agg(salted_join(f, d, ["k"], salt=32))
        finally:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    out = {"n_rows": n, "hot_key_share": 0.5}
    results = {}
    for name, fn in (("plain", run_plain), ("aqe", run_aqe), ("salted", run_salted)):
        secs, res = timed(fn)
        out[name] = {"sec": round(secs, 3), "n": res["n"], "sv": int(res["sv"])}
        results[name] = (res["n"], int(res["sv"]))
        print(f"# {name}: {secs:.2f}s n={res['n']}", file=sys.stderr)
    assert len(set(results.values())) == 1, f"strategies disagree: {results}"
    with open("bench_results/skew_bench.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
