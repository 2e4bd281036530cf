"""Heavy-hitter operator: exactness vs brute force + candidate-superset
guarantee (operators/sketches.py)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from realestatedeals_spark.operators.sketches import (
    heavy_hitter_candidates,
    heavy_hitters,
)


def _tokens(spark, counts: dict[str, int], seed: int = 7):
    rows = [(t,) for t, c in counts.items() for _ in range(c)]
    random.Random(seed).shuffle(rows)
    return spark.createDataFrame(rows, "term string").repartition(4)


def test_heavy_hitters_exact_vs_bruteforce(spark):
    counts = {"hot": 500, "warm": 120, "cool": 40, **{f"rare{i}": 2 for i in range(50)}}
    toks = _tokens(spark, counts)
    k = 10  # threshold n/k = 76; expect hot + warm only
    got = {r.term: r.cnt for r in heavy_hitters(toks, k=k).collect()}
    n = sum(counts.values())
    want = {t: c for t, c in counts.items() if c * k > n}
    assert got == want == {"hot": 500, "warm": 120}


def test_candidate_pass_is_superset_of_true_heavies(spark):
    counts = {f"t{i}": (i + 1) * 3 for i in range(80)}
    toks = _tokens(spark, counts)
    n = sum(counts.values())
    for k in (5, 20, 50):
        capacity = 2 * k
        cand = {r.term for r in heavy_hitter_candidates(toks, "term", capacity).collect()}
        heavies = {t for t, c in counts.items() if c * (capacity + 1) > n}
        assert heavies <= cand


def test_bursty_batches_candidate_set_globally_bounded(spark):
    """Adversarial bursty distribution: each Arrow batch is dominated by a
    DIFFERENT rare term, so the per-batch candidate pass alone would emit
    one candidate per batch — a broadcast that grows with batch count (the
    r2 VERDICT scale concern). The second-level Misra-Gries merge must bound
    the global candidate set at < capacity+1 terms regardless of batch
    count, while keeping the exact heavy-hitter output."""
    from realestatedeals_spark.operators.sketches import (
        heavy_hitter_candidate_set,
    )

    k = 3
    capacity = 2 * k
    rows = []
    for i in range(200):  # 200 batch-sized units: 40 hot + 60 unique burst
        rows += [("hot",)] * 40 + [(f"burst{i}",)] * 60
    toks = spark.createDataFrame(rows, "term string").coalesce(1)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        summary = heavy_hitter_candidates(toks, "term", capacity)
        n_cand = heavy_hitter_candidate_set(summary, "term", capacity).count()
        # burst terms dominate their own batch but merge to weight 60 << n/(cap+1)
        assert n_cand <= capacity, f"candidate broadcast grew to {n_cand} terms"
        got = {r.term: r.cnt for r in heavy_hitters(toks, k=k).collect()}
        assert got == {"hot": 8000}  # 40% share; every burst term is 0.3%
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_heavy_hitters_empty_and_no_heavy(spark):
    uniform = _tokens(spark, {f"u{i}": 5 for i in range(40)})
    assert heavy_hitters(uniform, k=10).count() == 0  # all shares = 1/40 < 1/10
    empty = spark.createDataFrame([], "term string")
    assert heavy_hitters(empty, k=10).count() == 0


def test_heavy_hitters_single_batch_of_one_term(spark):
    toks = spark.range(100).select(F.lit("only").alias("term"))
    got = heavy_hitters(toks, k=2).collect()
    assert [(r.term, r.cnt) for r in got] == [("only", 100)]


def test_winnowing_shared_run_guarantee(spark):
    """Winnowing guarantee (SIGMOD'03): documents sharing w+k-1 = 6
    consecutive tokens share at least one fingerprint; disjoint docs
    share none."""
    from realestatedeals_spark.plans.llm_text import x4_winnow_fingerprints  # noqa: F401
    from realestatedeals_spark.plans.registry import QUERIES
    import tempfile

    shared = "alpha beta gamma delta epsilon zeta"
    docs = [
        (1, f"one two three {shared} four five six", "en", "t", 1),
        (2, f"seven eight {shared} nine ten eleven twelve", "en", "t", 1),
        (3, "totally different words with no overlap at all here", "en", "t", 1),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, source string, n_chars int")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = QUERIES["x4_winnow_fingerprints"].fn(spark, d).collect()
    fps = {}
    for r in out:
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2], "docs sharing a 6-token run must share a fingerprint"
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])


def test_cli_list_and_unknown_query():
    from realestatedeals_spark.__main__ import main

    assert main(["list", "--tag", "X6"]) == 0
    assert main(["run", "no_such_query"]) == 2


def test_cms_never_undercounts_and_bounds_overshoot(spark, sf_dir):
    from pyspark.sql import functions as F

    from realestatedeals_spark.io.sources import load_table
    from realestatedeals_spark.operators.sketches import cms_estimate, cms_table

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("term")
    )
    n = tokens.count()
    exact = tokens.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    depth, width = 4, 2048
    cms = cms_table(tokens, "term", depth, width)
    est = cms_estimate(cms, exact.select("term"), "term", depth, width)
    j = exact.join(est, "term").collect()
    assert len(j) > 0
    for r in j:
        assert r.cms_est >= r.cnt, r  # one-sided error, always
        # CMS guarantee: overshoot ≤ 2n/width w.p. ≥ 1−2^-depth PER QUERY;
        # allow the union over all terms a small multiple of the bound
        assert r.cms_est - r.cnt <= 6 * n / width, r


def test_cms_table_is_mergeable_by_groupby_sum(spark, sf_dir):
    """Sketching two halves separately and summing cells must equal the
    one-pass sketch — the mergeability the 100 TB story relies on."""
    from pyspark.sql import functions as F

    from realestatedeals_spark.io.sources import load_table
    from realestatedeals_spark.operators.sketches import cms_table

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("term"),
    )
    whole = {
        (r.row, r.bucket): r.cnt
        for r in cms_table(tokens, "term").collect()
    }
    a = cms_table(tokens.filter(F.col("doc_id") % 2 == 0), "term")
    b = cms_table(tokens.filter(F.col("doc_id") % 2 == 1), "term")
    merged = {
        (r.row, r.bucket): r.cnt
        for r in a.unionByName(b).groupBy("row", "bucket").agg(
            F.sum("cnt").alias("cnt")
        ).collect()
    }
    assert merged == whole


def test_kmv_union_sketch_is_losslessly_mergeable(spark):
    """merge(sketch(A), sketch(B)) must EQUAL sketch(A ∪ B) element-for-
    element — the property that lets per-shard sketches combine at 100 TB
    without touching the raw data again."""
    from realestatedeals_spark.operators.sketches import kmv_merge, kmv_sketch

    rows = [(i, f"val-{i * 7919 % 5000}") for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, v string")
    a = df.filter(F.col("id") % 2 == 0)
    b = df.filter(F.col("id") % 3 == 0)
    sa = kmv_sketch(a, F.lit("s"), "v").collect()[0]
    sb = kmv_sketch(b, F.lit("s"), "v").collect()[0]
    direct = kmv_sketch(a.unionByName(b), F.lit("s"), "v").collect()[0]
    merged = (
        spark.createDataFrame([(sa["mins"], sb["mins"])], "ma array<double>, mb array<double>")
        .select(kmv_merge(F.col("ma"), F.col("mb")).alias("mu"))
        .collect()[0]["mu"]
    )
    assert merged == direct["mins"]


def test_kmv_estimates_within_theory_bounds(spark):
    """On planted sets with known overlap the KMV estimates must land
    within ~4 relative standard errors (RSE ≈ 1/sqrt(k-2) ≈ 0.127 at
    k=64) of the exact values — the textbook accuracy of the sketch, not a
    fixture accident."""
    from realestatedeals_spark.plans.llm_profile import x6_kmv_set_ops
    import pandas as pd
    import tempfile, os

    # synthetic corpus: 6000 distinct texts; A = even ids (3000),
    # B = ids % 3 == 0 (2000), intersection = ids % 6 == 0 (1000)
    with tempfile.TemporaryDirectory() as d:
        pd.DataFrame(
            {"doc_id": range(6000), "text": [f"text-{i}" for i in range(6000)],
             "lang": ["en"] * 6000, "source": ["s"] * 6000,
             "n_chars": [10] * 6000}
        ).to_parquet(os.path.join(d, "documents.parquet"))
        r = x6_kmv_set_ops(spark, d).collect()[0]
    tol = 4 / (62**0.5)
    for est, exact in (
        (r["est_a"], r["exact_a"]), (r["est_b"], r["exact_b"]),
        (r["est_union"], r["exact_union"]), (r["est_inter"], r["exact_inter"]),
    ):
        assert abs(est - exact) <= tol * exact, (est, exact)
    assert r["exact_a"] == 3000 and r["exact_b"] == 2000
    assert r["exact_inter"] == 1000 and r["exact_union"] == 4000
