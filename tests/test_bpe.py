"""Distributed BPE training vs an exact pure-Python reference."""

from __future__ import annotations

from collections import Counter

from realestatedeals_spark.operators.bpe import END, train_bpe, word_freq_table


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    """Sennrich-style reference: same counting (every adjacent position),
    same merge (left-to-right greedy non-overlap), same tie-break."""
    vocab = {tuple(list(w) + [END]): c for w, c in word_freqs.items()}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (l, r), w = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, l + r, w))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_matches_reference(spark, sf_dir):
    from realestatedeals_spark.io.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    wf = {r.word: r.weight for r in word_freq_table(docs).collect()}
    expect = _reference_bpe(wf, 12)
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_weight)
        for r in train_bpe(docs, 12)
    ]
    assert got == expect
    assert len(got) == 12


def test_bpe_merges_learn_frequent_words(spark, sf_dir):
    """The fixture corpus is a small closed vocabulary, so early merges must
    be building toward its most frequent words."""
    from realestatedeals_spark.io.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, 8)
    assert merges[0].pair_weight >= merges[-1].pair_weight
    assert all(m.rank == i for i, m in enumerate(merges))


def test_bpe_deterministic(spark, sf_dir):
    from realestatedeals_spark.io.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = train_bpe(docs, 6)
    b = train_bpe(docs, 6)
    assert a == b


def test_bpe_encode_matches_reference(spark, sf_dir):
    import hashlib

    from realestatedeals_spark.io.sources import load_table
    from realestatedeals_spark.operators.bpe import encode_with_merges

    docs = load_table(spark, sf_dir, "documents")
    wf = {r.word: r.weight for r in word_freq_table(docs).collect()}
    merges_ref = _reference_bpe(wf, 8)
    spark_merges = train_bpe(docs, 8)

    got = {
        r.doc_id: (r.n_bpe_tokens, r.token_hash)
        for r in encode_with_merges(docs, spark_merges).collect()
    }

    def enc_word(w):
        syms = list(w) + [END]
        for _, l, r, m, _w in merges_ref:
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                    out.append(m)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    for row in docs.select("doc_id", "text").collect():
        toks = [t for w in row.text.split() for t in enc_word(w)]
        expect = (len(toks), hashlib.sha256(" ".join(toks).encode()).hexdigest())
        assert got[row.doc_id] == expect, row.doc_id


def test_bpe_encode_compresses(spark, sf_dir):
    """Merges learned on the same corpus must shorten its token streams
    vs raw char+marker length."""
    from pyspark.sql import functions as F

    from realestatedeals_spark.io.sources import load_table
    from realestatedeals_spark.operators.bpe import encode_with_merges

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, 8)
    enc = encode_with_merges(docs, merges)
    raw = docs.select(
        "doc_id",
        (
            F.length(F.regexp_replace("text", r"\s+", ""))
            + F.size(F.filter(F.split("text", r"\s+"), lambda w: w != ""))
        ).alias("raw_syms"),
    )
    j = enc.join(raw, "doc_id")
    worse = j.filter(F.col("n_bpe_tokens") >= F.col("raw_syms")).count()
    assert worse == 0
