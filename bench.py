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

    load_start = os.getloadavg()[0]
    spark = get_spark("bench")
    # Warm-up outside the timed region: one untimed pass of the full set so
    # the timed pass measures steady-state plan execution, not JVM/codegen
    # warmup of whichever query happens to run first. Failure-isolated: a
    # raising query is recorded and skipped, never aborts the harness.
    failed: dict[str, str] = {}
    for name, fn in bench_queries().items():
        try:
            fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001 — isolate per-query failures
            failed[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: FAILED in warm-up: {failed[name]}", file=sys.stderr)

    # Best-of-3 timed runs per query (round-7 verdict task #4): the host
    # shows 2-4× run-to-run noise under load, and single-shot timing cannot
    # resolve a 1.4× delta on a 2-second query. min of repeated full
    # executions is the standard steady-state estimator; the median is
    # recorded alongside so a best/median gap flags a noisy measurement
    # (every timed run still executes the query end-to-end — nothing is
    # cached between runs beyond the JVM warm-up).
    # Trainer-memo honesty (ADVICE r11): the warm-up pass above populates the
    # session-scoped TRAINER_CACHE, so without a reset every timed run of the
    # k-means/PQ-backed queries would replay memoized centroids and the
    # headline would silently exclude training cost that earlier rounds'
    # numbers included. The cache is cleared before EVERY timed run, so each
    # run executes end-to-end including training; the artifact discloses it.
    from realestatedeals_spark.util import TRAINER_CACHE

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name, fn in bench_queries().items():
        if name in failed:
            continue
        runs: list[float] = []
        n = 0
        try:
            for _ in range(3):
                TRAINER_CACHE.clear()
                t0 = time.perf_counter()
                n = fn(spark, sf_dir).count()
                runs.append(time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001
            failed[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: FAILED in timed run: {failed[name]}", file=sys.stderr)
            continue
        runs.sort()
        timings[name] = round(runs[0], 3)
        medians[name] = round(runs[len(runs) // 2], 3)
        print(
            f"# {name}: {n} rows best={timings[name]}s median={medians[name]}s",
            file=sys.stderr,
        )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    # The driver keeps only the last ~2000 chars of stdout and parses the
    # JSON line out of that tail — round 7's line broke 2000 chars when the
    # medians dict was inlined and the driver recorded "parsed": null. The
    # stdout line therefore stays COMPACT (best-of-3 timings only, separators
    # without spaces); the full payload incl. medians/method/errors goes to
    # bench_results/bench_full.json on disk.
    # Self-diagnosis fields (round 11, verdict task 6): the round-10 driver
    # artifact recorded 100.4s on a contended host vs 55.4s clean, and only
    # a judge re-run could tell. median_total and start/end 1-minute
    # loadavg make that call from the artifact alone: a clean run has
    # median_total ≈ value and loadavg ≈ the bench's own cores; a contended
    # one shows median_total >> value and/or high external load. Per-query
    # medians stay in bench_results/bench_full.json — inlining them doubled
    # the line past the driver's ~2000-char stdout tail window (round 7).
    load_end = os.getloadavg()[0]
    payload: dict = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "median_total": round(sum(medians.values()), 3),
        "loadavg": [round(load_start, 1), round(load_end, 1)],
        "queries": {**timings, **{k: "error" for k in failed}},
        "sf": sf_val,
        "trainer_cache": "cleared_before_each_timed_run",
    }
    full = {
        **payload,
        "queries_median": medians,
        "method": (
            "warmup pass + best-of-3 per query; value = sum of bests; "
            "TRAINER_CACHE cleared before every timed run so training cost "
            "is measured, not memoized (ADVICE r11)"
        ),
    }
    if failed:
        full["errors"] = failed
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_results")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "bench_full.json"), "w") as fh:
        json.dump(full, fh, indent=1)
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1900:  # hard guard: never exceed the driver's tail window
        slim = dict(payload)
        slim["queries"] = {k: v for k, v in sorted(
            payload["queries"].items(), key=lambda kv: -(kv[1] if isinstance(kv[1], float) else 9e9)
        )[:20]}
        slim["note"] = "top20 by time; full set in bench_results/bench_full.json"
        line = json.dumps(slim, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
