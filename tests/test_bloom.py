"""Bloom-filter pruning operator (operators/bloom.py) + llm_clean plans."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from realestatedeals_spark.operators.bloom import (
    _positions,
    build_bloom,
    might_contain,
    sizing,
)


def test_sizing_geometry():
    n_bits, k = sizing(10_000, 0.01)
    # textbook: ~9.59 bits/item, ~7 probes at 1%
    assert 9 * 10_000 <= n_bits <= 11 * 10_000
    assert 6 <= k <= 8
    # degenerate inputs stay sane
    nb, kk = sizing(0, 0.01)
    assert nb >= 8 and kk >= 1


def test_positions_deterministic_and_in_range():
    v = np.array([0, 1, -5, 2**62, -(2**62)], dtype=np.int64)
    p1 = _positions(v, 1024, 5)
    p2 = _positions(v, 1024, 5)
    assert (p1 == p2).all()
    assert p1.shape == (5, 5)
    assert (p1 >= 0).all() and (p1 < 1024).all()


def test_no_false_negatives_and_bounded_fpr(spark):
    rng = np.random.default_rng(7)
    members = rng.integers(-(2**62), 2**62, size=5_000, dtype=np.int64)
    members = np.unique(members)
    non_members = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    non_members = np.setdiff1d(non_members, members)

    n_bits, k = sizing(len(members), 0.01)
    mdf = spark.createDataFrame([(int(x),) for x in members], "v long")
    packed = build_bloom(mdf, "v", n_bits, k)

    probe = spark.createDataFrame(
        [(int(x), True) for x in members] + [(int(x), False) for x in non_members],
        "v long, is_member boolean",
    )
    hit = probe.withColumn("hit", might_contain(spark, packed, n_bits, k, F.col("v")))
    agg = hit.groupBy("is_member").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("hit").cast("long")).alias("hits")
    )
    rows = {r.is_member: r for r in agg.collect()}
    # every member must test positive — bloom filters cannot false-negative
    assert rows[True].hits == rows[True].n
    # false-positive rate near the design point (3x slack for variance)
    fpr = rows[False].hits / rows[False].n
    assert fpr < 0.03, fpr


def test_bloom_decontaminate_matches_exact(spark, sf_dir):
    from realestatedeals_spark.plans.llm_clean import x8_bloom_decontaminate
    from realestatedeals_spark.plans.llm_sample import x8_decontaminate

    exact = {
        (r.doc_id, r.n_shared) for r in x8_decontaminate(spark, sf_dir).collect()
    }
    bloom = {
        (r.doc_id, r.n_shared)
        for r in x8_bloom_decontaminate(spark, sf_dir).collect()
    }
    assert exact == bloom
    assert len(bloom) > 0


def test_bloom_actually_prunes(spark, sf_dir):
    """The point of the operator: the shuffle-join input shrinks."""
    from realestatedeals_spark.operators.dedup import shingle_table
    from realestatedeals_spark.io.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_table(docs, k=4)
    ev = sh.filter(F.col("_id") % 50 == 0).select("shingle").distinct()
    n_bits, k = sizing(ev.count(), fpp=0.01)
    packed = build_bloom(ev, "shingle", n_bits, k)

    corpus = sh.filter(F.col("_id") % 50 != 0)
    total = corpus.count()
    kept = corpus.filter(
        might_contain(spark, packed, n_bits, k, F.col("shingle"))
    ).count()
    true_matches = corpus.join(ev, "shingle").count()
    assert kept < total  # pruned something
    assert kept >= true_matches  # kept every true match
    # survivors ≈ true matches + fpp * rest; allow generous slack
    assert kept <= true_matches + 0.05 * (total - true_matches) + 50


@pytest.mark.parametrize("name", ["x4_pii_scrub", "x4_chunk_documents"])
def test_clean_queries_run(spark, sf_dir, name):
    from realestatedeals_spark.plans import all_queries

    df = all_queries()[name](spark, sf_dir)
    assert df.count() > 0


def test_pii_scrub_redacts(spark, sf_dir):
    from realestatedeals_spark.plans import all_queries

    row = (
        all_queries()["x4_pii_scrub"](spark, sf_dir)
        .orderBy("doc_id")
        .first()
    )
    # injection guarantees at least one of each PII class per row
    assert row.n_emails >= 1 and row.n_phones >= 1 and row.n_ips >= 1


def test_chunks_cover_all_tokens(spark, sf_dir):
    """Stride < chunk size ⇒ concatenating stride-prefixes of every chunk
    except the last, plus the whole last chunk, reconstructs the doc's
    token count."""
    from pyspark.sql import Window

    from realestatedeals_spark.plans import all_queries
    from realestatedeals_spark.io.sources import load_table

    chunks = all_queries()["x4_chunk_documents"](spark, sf_dir)
    w_last = F.max("chunk_id").over(Window.partitionBy("doc_id"))
    per_doc = (
        chunks.withColumn("last", w_last)
        .withColumn(
            "covered",
            F.when(F.col("chunk_id") < F.col("last"), F.lit(48)).otherwise(
                F.col("n_chunk_tokens")
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("covered").alias("n_tokens"))
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).cast("long").alias(
            "expect"
        ),
    )
    bad = per_doc.join(docs, "doc_id").filter(F.col("n_tokens") != F.col("expect"))
    assert bad.count() == 0
