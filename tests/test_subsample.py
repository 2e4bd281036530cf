"""operators/subsample — the anchor-subsample rule must be bit-identical
between the Spark column expression and its DuckDB restatement (the oracle
states the SAME membership), identity below the cap, and ~cap-sized above."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from realestatedeals_spark.operators.subsample import (
    anchor_subsample,
    anchor_subsample_sql,
    mix31,
    mix31_sql,
)


def test_mix31_spark_duckdb_parity(spark):
    n = 50_000
    got = {
        r["i"]: r["m"]
        for r in spark.range(n).select(
            F.col("id").alias("i"), mix31(F.col("id")).alias("m")
        ).collect()
    }
    want = dict(
        duckdb.connect()
        .execute(f"SELECT i, {mix31_sql('i')} FROM range({n}) t(i)")
        .fetchall()
    )
    assert got == want
    # output range claim: [0, 2^31)
    assert 0 <= min(got.values()) and max(got.values()) < 2**31


def test_anchor_subsample_identity_and_membership(spark):
    small = spark.range(4000).select(F.col("id").alias("doc_id"))
    assert anchor_subsample(small, "doc_id", 5000).count() == 4000  # identity

    big = spark.range(200_000).select(F.col("id").alias("doc_id"))
    ids = sorted(r["doc_id"] for r in anchor_subsample(big, "doc_id", 5000).collect())
    # roughly cap-sized (mix31 is uniform-ish, not exact)
    assert 2500 <= len(ids) <= 7500
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT i AS doc_id FROM range(200000) t(i)")
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM {anchor_subsample_sql('documents', 'doc_id', 5000)} s"
        ).fetchall()
    )
    assert ids == want  # the oracle states the SAME membership
