"""Measured evidence for the skew-join story → bench_results/skew_bench.json.

Builds deliberately skewed fact tables joined against a
non-broadcastable-width dimension, and times three strategies on identical
data:

  plain      — SMJ with AQE skew splitting DISABLED (the naive cluster plan)
  aqe        — SMJ with AQE skew splitting on (session default)
  salted     — operators/skew.salted_join (pre-shuffle scatter)

All three must return the identical aggregate (asserted) — only wall time
differs. This turns SCALE.md's "salting for skew" from an argument into a
measurement. Broadcast of the dimension is deliberately disabled for the
measured joins: the scenario is the one where broadcast is not available
(dimension too wide), which is exactly when skew handling matters.

Two key distributions (round-5 VERDICT item 5):

  hot   — one pathological hot key owning ~50% of rows (the adversarial
          single-reducer case AQE's split-one-partition design targets)
  zipf  — bounded Zipf(s) rank-frequency keys via inverse-CDF sampling of
          a Pareto tail (realistic web/corpus key skew: a FEW hot keys of
          geometrically decreasing weight, then a long tail)

Usage: python tools/skew_bench.py [n_rows ...] (default: 4M and 40M — the
sf0.1- and sf1.0-scale runs; each size runs both distributions)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

N_KEYS = 1024


def build_facts(spark, n: int, dist: str):
    from pyspark.sql import functions as F

    u = (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) + 0.5) / 1_000_000.0
    if dist == "hot":
        # ~50% of facts hit key 0; the rest spread over N_KEYS keys
        k = (
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        )
    elif dist == "zipf":
        # bounded Zipf via Pareto inverse CDF: rank ∝ u^(-1/(s-1)), s=1.5 —
        # top key ≈ 29% of rows, top-8 ≈ 64%, then a long tail (measured)
        s = 1.5
        rank = F.floor(F.pow(u, -1.0 / (s - 1.0)))
        k = F.least(rank, F.lit(N_KEYS - 1)).cast("long")
    else:
        raise ValueError(dist)
    return spark.range(n).select(k.alias("k"), (F.col("id") % 1000).alias("v"))


def run_one(spark, n: int, dist: str) -> dict:
    from pyspark.sql import functions as F

    from realestatedeals_spark.operators.skew import salted_join

    facts = build_facts(spark, n, dist)
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("attr")
    )
    facts.write.mode("overwrite").parquet("/tmp/skew_facts")
    dim.write.mode("overwrite").parquet("/tmp/skew_dim")
    f = spark.read.parquet("/tmp/skew_facts")
    d = spark.read.parquet("/tmp/skew_dim")

    def agg(df):
        return df.agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")).first()

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

    out = {"dist": dist, "n_rows": n}
    results = {}
    for name, fn in (("plain", run_plain), ("aqe", run_aqe), ("salted", run_salted)):
        secs, res = timed(fn)
        out[name] = {"sec": round(secs, 3), "n": res["n"], "sv": int(res["sv"])}
        results[name] = (res["n"], int(res["sv"]))
        print(f"# {dist} n={n} {name}: {secs:.2f}s rows={res['n']}", file=sys.stderr)
    assert len(set(results.values())) == 1, f"strategies disagree: {results}"
    out["winner"] = min(("plain", "aqe", "salted"), key=lambda s: out[s]["sec"])
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [4_000_000, 40_000_000]
    from realestatedeals_spark.session import get_spark

    spark = get_spark("skew-bench", master="local[32]", shuffle_partitions=32)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    runs = []
    for n in sizes:
        for dist in ("hot", "zipf"):
            runs.append(run_one(spark, n, dist))
    out = {"n_keys": N_KEYS, "runs": runs}
    with open("bench_results/skew_bench.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
