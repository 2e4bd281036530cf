"""Bench harness — runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized via a count-shaped action (collect on the already
small outputs) after a warm-up of the session; per-query wall time is
reported, total is the headline metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from realestatedeals_spark.plans import bench_queries
    from realestatedeals_spark.session import get_spark

    spark = get_spark("bench")
    # Warm-up outside the timed region: one untimed pass of the full set so
    # the timed pass measures steady-state plan execution, not JVM/codegen
    # warmup of whichever query happens to run first.
    for name, fn in bench_queries().items():
        fn(spark, sf_dir).count()

    # Best-of-2 timed runs per query: the host shows 2-4× run-to-run noise
    # under load, and the min of repeated full executions is the standard
    # steady-state estimator (every timed run still executes the query
    # end-to-end — nothing is cached between runs beyond the JVM warm-up).
    timings: dict[str, float] = {}
    for name, fn in bench_queries().items():
        best, n = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
