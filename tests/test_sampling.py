"""X7 deterministic sampling: split invariants + reproducibility."""

from __future__ import annotations

import pyspark.sql.functions as F

from realestatedeals_spark.plans.llm_sample import (
    x7_hash_split,
    x7_stratified_sample,
)

SF_DIR = "/root/testdata/sf0.001"


def test_hash_split_partitions_whole_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    split = x7_hash_split(spark, SF_DIR).collect()
    assert {r["split"] for r in split} == {"train", "valid", "test"}
    assert sum(r["n_docs"] for r in split) == docs.count()
    by = {r["split"]: r["n_docs"] for r in split}
    # 12/16 hex chars → train should dominate
    assert by["train"] > by["valid"] and by["train"] > by["test"]


def test_hash_split_stable_across_repartition(spark):
    # same rows regardless of physical partitioning → retry/backfill-safe
    a = {tuple(r) for r in x7_hash_split(spark, SF_DIR).collect()}
    b = {
        tuple(r)
        for r in x7_hash_split(spark, SF_DIR).repartition(13).collect()
    }
    assert a == b


def test_stratified_sample_quota_and_determinism(spark):
    s = x7_stratified_sample(spark, SF_DIR)
    per_lang = s.groupBy("lang").count().collect()
    assert all(r["count"] <= 40 for r in per_lang)
    first = {tuple(r) for r in s.collect()}
    second = {tuple(r) for r in x7_stratified_sample(spark, SF_DIR).collect()}
    assert first == second
    # sample rows exist in the corpus (no fabricated keys)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert (
        s.join(docs, ["doc_id", "lang"], "left_anti").count() == 0
    )


def test_stratified_prefilter_matches_full_window(spark):
    """The hash-threshold pre-filter must be output-invariant (the guard
    falls back on any shortfall), including at tiny quotas and quotas
    exceeding the stratum size."""
    from realestatedeals_spark.plans.llm_sample import stratified_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for quota in (1, 7, 40, 10_000):
        fast = {tuple(r) for r in stratified_sample(docs, quota, prefilter=True).collect()}
        full = {tuple(r) for r in stratified_sample(docs, quota, prefilter=False).collect()}
        assert fast == full, quota


def test_sequence_pack_tiles_exactly(spark, sf_dir):
    """Packing invariants: per (lang, seq_id) the segments tile the sequence
    contiguously from offset 0 (except the final partial sequence per lang),
    segment lengths are positive, and every doc's segments cover exactly
    [0, n_tokens) without gap or overlap."""
    from pyspark.sql import functions as F

    from realestatedeals_spark.plans.llm_sample import _SEQ_LEN, x8_sequence_pack

    out = x8_sequence_pack(spark, sf_dir).collect()
    assert out
    by_seq: dict = {}
    by_doc: dict = {}
    for r in out:
        assert r["doc_tok_end"] > r["doc_tok_start"]
        by_seq.setdefault((r["lang"], r["seq_id"]), []).append(r)
        by_doc.setdefault(r["doc_id"], []).append(r)
    max_seq = {}
    for (lang, sid), segs in by_seq.items():
        max_seq[lang] = max(max_seq.get(lang, -1), sid)
    for (lang, sid), segs in by_seq.items():
        segs.sort(key=lambda r: r["seq_offset"])
        pos = 0
        for seg in segs:
            assert seg["seq_offset"] == pos, (lang, sid, seg)
            pos += seg["doc_tok_end"] - seg["doc_tok_start"]
        if sid < max_seq[lang]:
            assert pos == _SEQ_LEN, (lang, sid, pos)
        else:
            assert 0 < pos <= _SEQ_LEN
    for did, segs in by_doc.items():
        segs.sort(key=lambda r: r["doc_tok_start"])
        pos = 0
        for seg in segs:
            assert seg["doc_tok_start"] == pos
            pos = seg["doc_tok_end"]


def test_weighted_sample_rate_tracks_weight(spark, tmp_path):
    """Long documents (w=1000) must be kept ~10x as often as short ones
    (w=100): P(keep) = 3w/10000 exactly, so with 4000 docs per stratum the
    empirical rates sit well inside 4 sigma of 30% and 3%."""
    import os

    import pandas as pd

    from realestatedeals_spark.plans.llm_sample import x7_weighted_sample

    n = 4000
    pdf = pd.DataFrame(
        {
            "doc_id": range(2 * n),
            "text": ["x"] * (2 * n),
            "lang": ["en"] * (2 * n),
            "source": ["s"] * (2 * n),
            "n_chars": [1000] * n + [100] * n,
        }
    )
    d = str(tmp_path / "corpus")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "documents.parquet"))
    kept = x7_weighted_sample(spark, d).collect()
    long_rate = sum(r["w"] == 1000 for r in kept) / n
    short_rate = sum(r["w"] == 100 for r in kept) / n
    assert abs(long_rate - 0.30) < 4 * (0.3 * 0.7 / n) ** 0.5
    assert abs(short_rate - 0.03) < 4 * (0.03 * 0.97 / n) ** 0.5
