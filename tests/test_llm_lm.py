"""Stupid-backoff trigram LM (plans/llm_lm.py) vs an independent
pure-Python reference scorer, plus the short-document and OOV edges the
sf fixtures never exercise."""

from __future__ import annotations

import math

from realestatedeals_spark.plans.llm_lm import (
    _ngrams,
    _score_held_out,
    _words,
    x4_lm_backoff_train,
)

MICROS = 1_000_000


def _ref_counts(train_texts):
    tri, big, uni = {}, {}, {}
    for t in train_texts:
        ws = [w for w in t.split(" ") if w]
        for i in range(len(ws)):
            uni[ws[i]] = uni.get(ws[i], 0) + 1
            if i + 1 < len(ws):
                big[(ws[i], ws[i + 1])] = big.get((ws[i], ws[i + 1]), 0) + 1
            if i + 2 < len(ws):
                k = (ws[i], ws[i + 1], ws[i + 2])
                tri[k] = tri.get(k, 0) + 1
    return tri, big, uni, sum(uni.values())


def _ref_score(text, tri, big, uni, n_total):
    """Independent stupid-backoff scorer: per-position micros (floor(x*1e6
    + 0.5), the engine-portable rounding), level counts, summed score."""
    ws = [w for w in text.split(" ") if w]
    levels = [0, 0, 0, 0]
    total = 0
    for i in range(len(ws) - 2):
        u, v, w = ws[i], ws[i + 1], ws[i + 2]
        if (u, v, w) in tri:
            s, lvl = tri[(u, v, w)] / big[(u, v)], 3
        elif (v, w) in big:
            s, lvl = 0.4 * (big[(v, w)] / uni[v]), 2
        elif w in uni:
            s, lvl = 0.16 * (uni[w] / n_total), 1
        else:
            s, lvl = 0.0, 0
        levels[lvl] += 1
        total += int(math.floor(s * MICROS + 0.5))
    return levels, total


def _write_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", f"src{i % 3}", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "lmdocs")
    df.repartition(3).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


# even doc_ids train, odd doc_ids are scored; doc 3 carries an OOV token
# ("qqq") and a bigram-only continuation; doc 5 is too short to score
TEXTS = [
    "a b c a b c d e",        # train
    "a b c d e a b",          # held: all-trigram hits
    "b c d e b c a b",        # train
    "c a b qqq b c d x y",    # held: OOV + backoff mix ("x y" unseen)
    "d e a b c a",            # train
    "a b",                    # held: < 3 tokens -> no positions
]


def test_score_matches_pure_python_reference(spark, tmp_path):
    sf_dir = _write_docs(spark, tmp_path, TEXTS)
    tri, big, uni, n_total = _ref_counts([TEXTS[0], TEXTS[2], TEXTS[4]])
    got = {r.doc_id: r for r in _score_held_out(spark, sf_dir).collect()}
    # doc 5 has 2 tokens -> zero trigram positions -> absent by contract
    assert set(got) == {1, 3}
    for did in (1, 3):
        levels, total = _ref_score(TEXTS[did], tri, big, uni, n_total)
        r = got[did]
        assert (r.tri_hits, r.bigram_backoffs, r.unigram_backoffs, r.oov) == (
            levels[3],
            levels[2],
            levels[1],
            levels[0],
        ), did
        assert r.score_sum_micros == total
        assert r.n_pos == sum(levels)
        assert r.avg_score_micros == int(math.floor(total / r.n_pos + 0.5))
    # the fixture makes every backoff level load-bearing somewhere
    assert got[3].oov >= 1 and got[3].bigram_backoffs + got[3].unigram_backoffs >= 1
    assert got[1].tri_hits >= 1


def test_train_table_matches_reference_counts(spark, tmp_path):
    sf_dir = _write_docs(spark, tmp_path, TEXTS)
    tri, big, _, _ = _ref_counts([TEXTS[0], TEXTS[2], TEXTS[4]])
    rows = x4_lm_backoff_train(spark, sf_dir).collect()
    assert len(rows) == len(tri)  # < 100, so the head IS the whole model
    for r in rows:
        assert tri[(r.u, r.v, r.w)] == r.c_uvw
        assert big[(r.u, r.v)] == r.c_uv
        assert r.p_micros == int(math.floor(r.c_uvw / r.c_uv * MICROS + 0.5))
    # deterministic head order: count desc, then gram asc
    keys = [(-r.c_uvw, r.u, r.v, r.w) for r in rows]
    assert keys == sorted(keys)


def test_ngrams_skips_short_docs(spark):
    df = _words(
        spark.createDataFrame(
            [(1, "a b"), (2, ""), (3, "x  y z")], "doc_id long, text string"
        )
    )
    got = [(r.doc_id, r.g0, r.g1, r.g2) for r in _ngrams(df, 3).collect()]
    assert got == [(3, "x", "y", "z")]  # double space collapsed by the filter
    assert _ngrams(df, 1).count() == 5
