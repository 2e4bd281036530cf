"""Zipf-skew behavior of the LM scorer's token-keyed joins (round-8
verdict task #4): the unigram joins carry the hottest keys on natural-
language corpora; the salted path must be row-identical to the plain one
and must actually spread the hot key across salt partitions when the
join is forced to shuffle (no broadcast)."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from realestatedeals_spark.plans.llm_lm import _model, score_documents


def _zipf_corpus(spark, tmp_path, n_docs=400, seed=11):
    """Tiny power-law corpus: head token ~25% of positions."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(25)]
    w = 1.0 / np.arange(1, len(vocab) + 1)
    p = w / w.sum()
    rows = []
    for d in range(n_docs):
        k = int(rng.integers(6, 40))
        rows.append((d, " ".join(np.array(vocab)[rng.choice(len(vocab), k, p=p)])))
    sf_dir = str(tmp_path / "corpus")
    spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(length(text) AS LONG) AS n_chars",
    ).write.parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_salted_scorer_equals_plain_on_zipf_corpus(spark, tmp_path):
    """salted_join is a physical rewrite only: the salted unigram joins
    produce the exact same per-doc score rows as the plain joins on a
    corpus whose head token holds ~25% of positions."""
    sf_dir = _zipf_corpus(spark, tmp_path)
    model = _model(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") % 2 == 1
    ).select("doc_id", "text")
    plain = {tuple(r) for r in score_documents(docs, model).collect()}
    salted = {tuple(r) for r in score_documents(docs, model, salt_unigrams=8).collect()}
    assert plain == salted and len(plain) > 0


def test_salt_spreads_hot_unigram_key_across_partitions(spark, tmp_path):
    """With broadcast disabled (the regime where skew exists at all: a
    vocabulary-sized unigram table too big to broadcast forces a shuffle
    join), the plain shuffle puts every position of the head token in ONE
    partition; the salted join spreads them across the salt count. Pin
    the mechanism by hashing the join keys the way the shuffle does."""
    sf_dir = _zipf_corpus(spark, tmp_path)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    head = toks.groupBy("w").count().orderBy(F.col("count").desc()).first()
    n_tot = toks.count()
    assert head["count"] / n_tot > 0.15  # the corpus is genuinely skewed
    # plain shuffle key: one partition owns the whole hot key
    plain_parts = (
        toks.select(F.pmod(F.xxhash64("w"), F.lit(32)).alias("pt"))
        .groupBy("pt").count()
    )
    plain_max = plain_parts.agg(F.max("count")).first()[0]
    assert plain_max >= head["count"]  # the hot key is a partition floor
    # salted key: salt = hash of the WHOLE row (salted_join's big side),
    # so the hot key's positions spread over (w, salt) buckets
    salted_parts = (
        toks.select(
            "w",
            F.pmod(F.xxhash64(F.struct("doc_id", "pos", "w")), F.lit(8)).alias("_salt"),
        )
        .select(F.pmod(F.xxhash64("w", "_salt"), F.lit(32)).alias("pt"))
        .groupBy("pt").count()
    )
    salted_max = salted_parts.agg(F.max("count")).first()[0]
    assert salted_max < plain_max  # strictly better balance
    # and the end-to-end salted scorer still runs without broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        model = _model(spark, sf_dir)
        out = score_documents(
            docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text"),
            model,
            salt_unigrams=8,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in plan  # the salt reached the physical join keys
        assert out.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
