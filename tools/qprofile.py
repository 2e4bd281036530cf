"""Per-query profiler for optimization work (guide §1): for each named
registry query, reports the plan-construction vs execution wall split,
Spark job and task counts (from the app status store — deterministic,
host-noise-proof), and best/median over N timed runs.

Usage: SPARK_GRAFT_SF_DIR=... python tools/qprofile.py [-n N] q1 q2 ...
Prints one JSON line per query and a trailing summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _job_stats(spark, after_job_id: int) -> tuple[int, int, int]:
    """(max_job_id, n_jobs, n_tasks) for jobs with id > after_job_id."""
    store = spark.sparkContext._jsc.sc().statusStore()
    it = store.jobsList(None)
    max_id, n_jobs, n_tasks = after_job_id, 0, 0
    for i in range(it.size()):
        j = it.apply(i)
        jid = j.jobId()
        if jid > after_job_id:
            n_jobs += 1
            n_tasks += j.numTasks()
        if jid > max_id:
            max_id = jid
    return max_id, n_jobs, n_tasks


def main() -> None:
    args = sys.argv[1:]
    n_runs = 3
    if args and args[0] == "-n":
        n_runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from realestatedeals_spark.plans import registry  # noqa: F401 — registers
    from realestatedeals_spark.plans.registry import QUERIES
    from realestatedeals_spark.session import get_spark
    from realestatedeals_spark.util import TRAINER_CACHE

    spark = get_spark("qprofile")
    out = {}
    for name in args:
        fn = QUERIES[name].fn
        spark.sparkContext.setJobDescription(f"qprofile:{name}")
        fn(spark, sf_dir).count()  # warm-up (JVM/codegen/listing caches)
        runs = []
        for _ in range(n_runs):
            TRAINER_CACHE.clear()
            last_id, _, _ = _job_stats(spark, -1)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            _, n_jobs, n_tasks = _job_stats(spark, last_id)
            runs.append(
                {
                    "construct": round(t1 - t0, 3),
                    "execute": round(t2 - t1, 3),
                    "total": round(t2 - t0, 3),
                    "jobs": n_jobs,
                    "tasks": n_tasks,
                }
            )
        runs.sort(key=lambda r: r["total"])
        rec = {
            "best": runs[0],
            "median_total": runs[len(runs) // 2]["total"],
            "loadavg": round(os.getloadavg()[0], 2),
        }
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print(json.dumps({"summary": {k: v["best"]["total"] for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
