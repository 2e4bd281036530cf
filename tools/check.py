"""Local correctness harness mirroring the driver's t2 gate.

Runs every ``queries()`` entry at a given SF dir, runs the matching
``oracle_sql()`` in DuckDB over the same parquet tables, and compares
row-count + schema-arity + order-insensitive values (sorted columns by name,
sorted rows). Floats compare with a small relative tolerance AND are flagged
when not bit-identical, since the driver's value-hash is presumed exact.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Bound the oracle engine so a heavy oracle (all-pairs dedup at gen
    # sf1.0) degrades to disk spill instead of taking the host down, and
    # spills to a known location instead of filling an arbitrary tmp dir.
    # Both caps are env-overridable: the brute-Jaccard decontamination
    # oracle at gen sf1.0 sits right at the 60GB default (measured 55.8GiB
    # before failing to place one more block), so a remainder re-run on an
    # otherwise idle host legitimately wants a bigger budget — without
    # changing what a default sweep can consume.
    con.execute(f"SET memory_limit='{os.environ.get('SPARK_GRAFT_DUCK_MEM', '24GB')}'")
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    con.execute(
        "SET max_temp_directory_size="
        f"'{os.environ.get('SPARK_GRAFT_DUCK_SPILL', '60GB')}'"
    )
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df):  # pandas DataFrame → sorted-by-name cols, row-sorted values
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except Exception:
                pass
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def values_equal(a, b) -> tuple[bool, bool, str]:
    """Returns (equal_exact, equal_tolerant, first_diff_desc)."""
    if a.shape != b.shape:
        return False, False, f"shape {a.shape} vs {b.shape}"
    exact = True
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    exact = False
                    if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                        return False, False, f"col {c} row {i}: {x!r} vs {y!r}"
            elif x != y:
                if (x is None) != (y is None) or str(x) != str(y):
                    return False, False, f"col {c} row {i}: {x!r} vs {y!r}"
    return exact, True, ""


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as E
    from realestatedeals_spark.session import get_spark

    spark = get_spark("check")
    if os.environ.get("SPARK_GRAFT_HOSTILE_TZ"):
        # simulate the driver's session (not ours): non-UTC timezone probes
        # that every tz-sensitive query self-defends via apply_session_conf
        spark.conf.set("spark.sql.session.timeZone", os.environ["SPARK_GRAFT_HOSTILE_TZ"])
    con = duck_connect(sf_dir)
    qs, oracles = E.queries(), E.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        if os.environ.get("SPARK_GRAFT_HOSTILE_TZ"):
            # re-assert before every query: a prior query's apply_session_conf
            # resets to UTC and would mask gaps in later queries
            spark.conf.set(
                "spark.sql.session.timeZone", os.environ["SPARK_GRAFT_HOSTILE_TZ"]
            )
        try:
            sdf = fn(spark, sf_dir).toPandas()
            t_spark = time.time() - t0
        except Exception:
            print(f"FAIL {name}: SPARK ERROR\n{traceback.format_exc()}")
            n_fail += 1
            results[name] = {"status": "fail", "reason": "spark_error"}
            continue
        sql = oracles.get(name)
        if sql is None:
            dt = time.time() - t0
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({dt:.1f}s)")
            n_rows_only += 1
            results[name] = {
                "status": "rows_only", "rows": len(sdf),
                "sec": round(dt, 2), "spark_sec": round(t_spark, 2),
            }
            continue
        t_or = time.time()
        try:
            odf = con.execute(sql).fetchdf()
        except Exception:
            print(f"FAIL {name}: ORACLE ERROR\n{traceback.format_exc()}")
            n_fail += 1
            results[name] = {"status": "fail", "reason": "oracle_error"}
            # a resource failure (OOM / disk-full spill) wedges the
            # connection's memory accounting: every later oracle would fail
            # on tiny allocations. Reconnect so one heavy oracle cannot
            # poison the rest of the sweep.
            try:
                con.close()
            except Exception:
                pass
            con = duck_connect(sf_dir)
            continue
        t_oracle = time.time() - t_or
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            results[name] = {"status": "fail", "reason": f"rowcount {len(sdf)} vs {len(odf)}"}
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            n_fail += 1
            results[name] = {"status": "fail", "reason": "columns mismatch"}
            continue
        try:
            a, b = normalize(sdf), normalize(odf)
        except Exception:
            print(f"FAIL {name}: NORMALIZE ERROR\n{traceback.format_exc()}")
            n_fail += 1
            results[name] = {"status": "fail", "reason": "normalize_error"}
            continue
        exact, tol, diff = values_equal(a, b)
        dt = time.time() - t0
        if not tol:
            print(f"FAIL {name}: {diff} ({dt:.1f}s)")
            n_fail += 1
            results[name] = {"status": "fail", "reason": diff}
        elif not exact:
            print(f"PASS~ {name}: tolerant-only (float last-bit) {len(sdf)} rows ({dt:.1f}s)")
            n_pass += 1
            results[name] = {"status": "pass_tolerant", "rows": len(sdf), "sec": round(dt, 2),
                             "spark_sec": round(t_spark, 2),
                             "oracle_sec": round(t_oracle, 2)}
        else:
            print(f"PASS {name}: {len(sdf)} rows ({dt:.1f}s)")
            n_pass += 1
            results[name] = {"status": "pass", "rows": len(sdf), "sec": round(dt, 2),
                             "spark_sec": round(t_spark, 2),
                             "oracle_sec": round(t_oracle, 2)}
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": n_rows_only,
                    "queries": results,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
