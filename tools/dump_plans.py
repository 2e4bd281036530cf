"""Dump .explain("formatted") for registry queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> <query> [query ...]
e.g.   python tools/dump_plans.py r12 before x3_ivfpq_stored_topk c16_stream_lm_score

Queries that materialize side state (streaming replays, stored indexes)
execute fully; the dumped plan is the plan of the RETURNED frame — for a
replay twin that is a small checkpointed/created result, so the interesting
before/after evidence for those lives in the phase-timing notes in
OPTIMIZATION_*.md instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from realestatedeals_spark.plans import all_queries
    from realestatedeals_spark.session import get_spark

    spark = get_spark("dump-plans")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    qs = all_queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
