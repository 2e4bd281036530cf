"""Blocked fuzzy join: candidate blocking must bound the join, the verify
must agree with the standard Levenshtein definition (cross-engine contract),
and planted near-matches must surface while cross-block pairs never do."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from realestatedeals_spark.plans.linkage import fuzzy_blocked_join


def _frame(spark):
    rows = [
        (1, "red widget", 5),
        (2, "rad widget", 5),   # dist 1, same block
        (3, "red widget", 7),   # identical name, DIFFERENT block (size)
        (4, "blue widget", 5),  # dist 4 from "red widget" — beyond threshold
        (5, "xyz widget", 5),    # dist 3 from "red widget" — at the threshold
        (6, "red gizmo", 5),    # different noun → different block
    ]
    return spark.createDataFrame(rows, ["p_partkey", "p_name", "p_size"])


def _match(spark):
    out = fuzzy_blocked_join(
        _frame(spark),
        key="p_partkey",
        name="p_name",
        block_cols=[F.element_at(F.split("p_name", " "), -1), F.col("p_size")],
    )
    return {(r["key_a"], r["key_b"]): r["dist"] for r in out.collect()}


def test_fuzzy_blocked_join_planted(spark):
    got = _match(spark)
    assert got[(1, 2)] == 1          # near name, same block
    assert got[(1, 5)] == 3          # at the verify threshold
    assert (1, 4) not in got          # same block but dist 4 > threshold
    assert (1, 3) not in got          # identical name but different block
    assert not any(6 in p for p in got)  # different noun never a candidate
    assert got == {(1, 2): 1, (1, 5): 3, (2, 5): 3}


def test_levenshtein_cross_engine_contract(spark):
    """Spark's levenshtein must equal DuckDB's on a probe set — this is the
    assumption that makes the j5 oracle exact."""
    probes = [
        ("kitten", "sitting"),
        ("red widget", "rad widget"),
        ("small ring", "red ring"),
        ("", "abc"),
        ("same", "same"),
        ("ab", "ba"),
    ]
    sdf = spark.createDataFrame(probes, ["a", "b"]).select(
        "a", "b", F.levenshtein("a", "b").alias("d")
    )
    got = {(r["a"], r["b"]): r["d"] for r in sdf.collect()}
    con = duckdb.connect()
    for a, b in probes:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert got[(a, b)] == want, (a, b, got[(a, b)], want)


def test_fuzzy_group_linkage_counts(spark):
    """Group collapse must report the exact id-level pair cardinalities the
    naive pair join would enumerate."""
    from realestatedeals_spark.plans.linkage import fuzzy_group_linkage

    rows = (
        [(i, "red widget", 5) for i in range(3)]       # group of 3
        + [(10 + i, "rad widget", 5) for i in range(2)]  # group of 2, dist 1
        + [(20, "red widget", 7)]                        # other block
    )
    df = spark.createDataFrame(rows, ["p_partkey", "p_name", "p_size"])
    out = fuzzy_group_linkage(
        df, name="p_name",
        block_cols=[F.element_at(F.split("p_name", " "), -1), F.col("p_size")],
    )
    got = {(r["name_a"], r["name_b"], r["blk1"]): (r["dist"], r["n_pairs"]) for r in out.collect()}
    assert got[("red widget", "red widget", 5)] == (0, 3)   # C(3,2)
    assert got[("rad widget", "rad widget", 5)] == (0, 1)   # C(2,2)
    assert got[("rad widget", "red widget", 5)] == (1, 6)   # 2*3 cross pairs
    assert ("red widget", "red widget", 7) not in got        # singleton group
    assert len(got) == 3


def test_er_golden_records_transitivity_and_survivorship(spark, sf_dir):
    """B (name typo, same phone) and C (phone typo, same name) never match
    each other directly — they must land in one cluster via A, and the
    survivor must carry the untruncated name and the max balance (C's)."""
    from realestatedeals_spark.plans.linkage import er_golden_records

    out = {r.cluster_id: r for r in er_golden_records(spark, sf_dir).collect()}

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'"
    )
    # a customer key divisible by 6 with ≥4 digits of phone overlap would be
    # fully merged; at sf0.001 keys are small, so pick the semantics that
    # hold everywhere: every k%3==0 customer has A+B merged (same digits)
    ks = [k for (k,) in con.execute(
        "SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0"
    ).fetchall()]
    assert ks, "fixture should have k%3 customers"
    for k in ks:
        cl = out[3 * k]
        assert cl.n_records >= 2  # A and B at least
        assert not cl.name.endswith(" " + str(k)[:-1])  # not the truncation
        assert cl.name.endswith(" " + str(k))  # canonical = untruncated
        assert cl.n_phones >= 1
    # every record appears exactly once across clusters
    n_records = con.execute(
        "SELECT count(*) + sum(CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END)"
        " + sum(CASE WHEN c_custkey % 6 = 0 THEN 1 ELSE 0 END) FROM customer"
    ).fetchone()[0]
    assert sum(r.n_records for r in out.values()) == n_records
    # survivorship: max_cents must dominate the A record's cents
    a_cents = dict(con.execute(
        "SELECT c_custkey * 3, CAST(ROUND(c_acctbal * 100) AS BIGINT) FROM customer"
    ).fetchall())
    for cid, r in out.items():
        if cid in a_cents and r.n_records >= 2:
            assert r.max_cents >= a_cents[cid]
