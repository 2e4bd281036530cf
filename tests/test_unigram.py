"""Unigram-LM tokenizer vs an enumeration-based pure-Python reference.

The engine trains with forward-backward expected counts; the reference
here computes the same expectations by EXPLICIT ENUMERATION of every
segmentation (a genuinely different formulation of the same quantity), so
agreement checks the lattice math, not the code. Viterbi encode is
brute-force-verified optimal on every word of the test corpus.
"""

from __future__ import annotations

import math
from collections import Counter

from realestatedeals_spark.operators.unigram import (
    MICROS,
    encode_unigram,
    seed_pieces,
    train_unigram,
    viterbi_segment,
)

CORPUS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a rat sat on a mat",
    "the bat and the cat",
    "rats and bats and cats",
    "mat rat bat cat",
    "the the the a a and",
    "sat sat sat on on on",
]
MAX_LEN = 4


def _segmentations(word: str, pieces: set[str], max_len: int):
    """All segmentations of word into pieces (test words are short)."""
    if word == "":
        yield ()
        return
    for l in range(1, min(max_len, len(word)) + 1):
        head = word[:l]
        if head in pieces:
            for rest in _segmentations(word[l:], pieces, max_len):
                yield (head, *rest)


def _reference_em_counts(
    word_freqs: dict[str, int], logp: dict[str, float], max_len: int
) -> dict[str, int]:
    """Expected piece counts by enumerating segmentations: E[count(p)] =
    sum_seg P(seg) * count(p in seg) / sum_seg P(seg), weighted by word
    frequency; rounded per word to int64 micros like the engine."""
    pieces = set(logp)
    acc: dict[str, int] = {}
    for word, freq in word_freqs.items():
        segs = list(_segmentations(word, pieces, max_len))
        if not segs:
            continue
        probs = [math.exp(sum(logp[p] for p in seg)) for seg in segs]
        z = sum(probs)
        per_word: dict[str, float] = {}
        for seg, pr in zip(segs, probs):
            for p in seg:
                per_word[p] = per_word.get(p, 0.0) + pr / z * freq
        for p, e in per_word.items():
            acc[p] = acc.get(p, 0) + int(round(e * MICROS))
    return acc


def _word_freqs() -> dict[str, int]:
    return dict(Counter(w for line in CORPUS for w in line.split()))


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_em_counts_match_enumeration(spark):
    from realestatedeals_spark.operators.bpe import word_freq_table
    from realestatedeals_spark.operators.unigram import _em_counts

    docs = _docs(spark)
    words = word_freq_table(docs)
    logp, chars = seed_pieces(words, max_seed=64, max_len=MAX_LEN)
    got = _em_counts(words, logp, MAX_LEN)
    expect = _reference_em_counts(_word_freqs(), logp, MAX_LEN)
    assert set(got) == set(expect)
    for p in expect:
        # forward-backward and enumeration sum floats in different orders;
        # after per-word micros rounding they may differ by 1 unit per word
        assert abs(got[p] - expect[p]) <= len(_word_freqs()), p


def test_trained_vocab_matches_reference(spark):
    """Full training loop vs a driver-side reference running the same
    schedule with enumeration-based E-steps: identical piece sets in
    identical order, log-probs equal to float tolerance."""
    docs = _docs(spark)
    got = train_unigram(
        docs, vocab_multi=6, max_len=MAX_LEN, max_seed=32, em_rounds=2, shrink=0.5
    )

    # reference trainer (same schedule, enumeration E-step, local M-step)
    wf = _word_freqs()
    subs: Counter = Counter()
    for w, c in wf.items():
        for j in range(len(w)):
            for l in range(1, min(MAX_LEN, len(w) - j) + 1):
                subs[w[j : j + l]] += c
    chars = {p for p in subs if len(p) == 1}
    multi = sorted((p for p in subs if len(p) > 1), key=lambda p: (-subs[p], p))[:32]
    kept = {p: subs[p] for p in chars | set(multi)}
    total = sum(kept.values())
    logp = {p: math.log(w) - math.log(total) for p, w in kept.items()}

    def normalize(counts):
        k = {
            p: max(c, 1) if p in chars else c
            for p, c in counts.items()
            if c > 0 or p in chars
        }
        t = sum(k.values())
        return {p: math.log(c) - math.log(t) for p, c in k.items()}

    while True:
        for _ in range(2):
            logp = normalize(_reference_em_counts(wf, logp, MAX_LEN))
        m = sorted((p for p in logp if len(p) > 1), key=lambda p: (-logp[p], p))
        if len(m) <= 6:
            break
        keep = max(6, int(len(m) * 0.5))
        logp = {p: lp for p, lp in logp.items() if len(p) == 1 or p in set(m[:keep])}
    expect = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))

    assert [p for p, _ in got] == [p for p, _ in expect]
    for (_, a), (_, b) in zip(got, expect):
        assert math.isclose(a, b, rel_tol=1e-4)


def test_viterbi_is_optimal_brute_force():
    logp = {
        "t": -4.0, "h": -4.5, "e": -3.5, "c": -4.2, "a": -3.0, "s": -3.8,
        "th": -2.5, "he": -2.8, "the": -1.5, "at": -2.0, "cat": -1.8,
        "ca": -3.1, "ts": -2.9, "cats": -2.2,
    }
    pieces = set(logp)
    for word in ["the", "cat", "cats", "thecat", "east", "sheet"]:
        if any(ch not in pieces for ch in word):
            continue
        got = viterbi_segment(word, logp, MAX_LEN)
        best = max(
            _segmentations(word, pieces, MAX_LEN),
            key=lambda seg: (sum(logp[p] for p in seg), -len(seg)),
        )
        assert sum(logp[p] for p in got) == sum(logp[p] for p in best), word
        assert "".join(got) == word


def test_viterbi_tie_breaks_deterministically():
    # two equal-score segmentations: ("ab",) vs ("a","b") with matching sums
    logp = {"a": -1.0, "b": -1.0, "ab": -2.0}
    assert viterbi_segment("ab", logp, 2) == ["ab"]  # fewer tokens wins


def test_encode_matches_driver_side_segmenter(spark):
    docs = _docs(spark)
    vocab = train_unigram(
        docs, vocab_multi=6, max_len=MAX_LEN, max_seed=32, em_rounds=2, shrink=0.5
    )
    table = dict(vocab)
    rows = {r.doc_id: r for r in encode_unigram(docs, vocab).collect()}
    import hashlib

    for i, line in enumerate(CORPUS):
        toks = [t for w in line.split() for t in viterbi_segment(w, table, MAX_LEN)]
        assert rows[i].n_unigram_tokens == len(toks)
        assert rows[i].token_hash == hashlib.sha256(" ".join(toks).encode()).hexdigest()
        assert "".join(toks) == line.replace(" ", "")


def test_training_is_deterministic(spark):
    docs = _docs(spark)
    kw = dict(vocab_multi=6, max_len=MAX_LEN, max_seed=32, em_rounds=2, shrink=0.5)
    assert train_unigram(docs, **kw) == train_unigram(docs, **kw)


def test_chars_always_survive_pruning(spark):
    """Every observed character stays in the vocab, so any word of corpus
    characters is segmentable."""
    docs = _docs(spark)
    vocab = dict(
        train_unigram(
            docs, vocab_multi=2, max_len=MAX_LEN, max_seed=16, em_rounds=1, shrink=0.5
        )
    )
    observed = {ch for line in CORPUS for ch in line if ch != " "}
    assert observed <= {p for p in vocab if len(p) == 1}
    seg = viterbi_segment("tacocat", vocab, MAX_LEN)
    assert "".join(seg) == "tacocat"


def test_lattice_counts_match_enumeration(spark):
    """lattice_count_table (integer path-count E-step, the hash-exact
    oracle companion) vs explicit enumeration: for every piece, the
    weighted number of segmentation paths through its occurrences must
    agree EXACTLY — the companion is int64 end-to-end, so no tolerance."""
    from realestatedeals_spark.operators.unigram import lattice_count_table

    docs = _docs(spark)
    got = {
        r.piece: r.paths
        for r in lattice_count_table(
            docs, max_seed=64, max_len=MAX_LEN
        ).collect()
    }

    # reference: enumerate all segmentations over the same integer seed
    # (chars + top-64 multi substrings by weight, ties piece asc)
    freqs = _word_freqs()
    subw: dict[str, int] = {}
    for word, wgt in freqs.items():
        for j in range(len(word)):
            for l in range(1, min(MAX_LEN, len(word) - j) + 1):
                p = word[j : j + l]
                subw[p] = subw.get(p, 0) + wgt
    chars = {p for p in subw if len(p) == 1}
    multi = sorted(
        (p for p in subw if len(p) > 1), key=lambda p: (-subw[p], p)
    )[:64]
    vocab = chars | set(multi)

    expect: dict[str, int] = {}
    for word, wgt in freqs.items():
        for seg in _segmentations(word, vocab, MAX_LEN):
            for p in seg:
                expect[p] = expect.get(p, 0) + wgt
    assert got == expect


def test_lattice_counts_partitioning_invariant(spark):
    """Integer path counts are bit-identical under any partitioning of the
    word table (associative int64 sums — the property the oracle relies
    on)."""
    from realestatedeals_spark.operators.unigram import lattice_count_table

    docs = _docs(spark)
    one = {
        r.piece: r.paths
        for r in lattice_count_table(docs.coalesce(1), max_seed=64, max_len=MAX_LEN).collect()
    }
    many = {
        r.piece: r.paths
        for r in lattice_count_table(docs.repartition(7), max_seed=64, max_len=MAX_LEN).collect()
    }
    assert one == many
