"""CLI: ``python -m realestatedeals_spark <command>``.

A user-facing entrypoint over the registered query surface:

    python -m realestatedeals_spark list [--tag X2]
    python -m realestatedeals_spark run x2_minhash_near_dup --sf-dir /root/testdata/sf0.01 -n 20
    python -m realestatedeals_spark explain tpch_q3_shipping_priority

``run`` prints the result (truncated with ``-n``); ``explain`` prints the
formatted physical plan (the thing to read before scaling a query up).
"""

from __future__ import annotations

import argparse
import os
import sys


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="realestatedeals_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ls = sub.add_parser("list", help="list registered queries")
    ls.add_argument("--tag", help="filter by tag (e.g. X2, window, profile)")

    for name in ("run", "explain"):
        sp = sub.add_parser(name)
        sp.add_argument("query")
        sp.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
        if name == "run":
            sp.add_argument("-n", type=int, default=20, help="rows to show")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)
    from realestatedeals_spark.plans.registry import QUERIES

    if args.cmd == "list":
        for name, q in sorted(QUERIES.items()):
            if args.tag and args.tag not in q.tags:
                continue
            oracle = "oracle" if q.oracle else "rows-only"
            print(f"{name:40s} [{', '.join(q.tags)}] ({oracle})")
        return 0

    if args.query not in QUERIES:
        print(f"unknown query: {args.query} (see `list`)", file=sys.stderr)
        return 2
    from realestatedeals_spark.session import get_spark

    spark = get_spark("cli")
    df = QUERIES[args.query].fn(spark, args.sf_dir)
    if args.cmd == "explain":
        print(
            df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        )
    else:
        df.show(args.n, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
