"""Distributed unigram-LM tokenizer training (Kudo 2018, "Subword
Regularization"; the SentencePiece unigram algorithm) — the second of the
two standard subword tokenizers, complementing operators/bpe.py.

Scale shape (same contract as BPE): the corpus is touched ONCE (whitespace
word-frequency groupBy, one shuffle). Everything after runs on the
VOCABULARY-bounded word table: EM expected-count E-steps are an
embarrassingly-parallel ``mapInPandas`` over distinct words with the
piece-probability table (vocab-sized, broadcast in the UDF closure),
followed by one piece-keyed groupBy sum; M-steps and pruning are
driver-side loops over the vocab list. No iteration re-reads the corpus.

Determinism under distributed float aggregation: per-word expected counts
are float (forward–backward over the segmentation lattice), but each
word's contribution is rounded to int64 MICROS before aggregation, so the
cross-word sum is associative-exact — the trained vocabulary is
bit-identical regardless of partitioning, task order, or retries. The
same idea keeps tpch_q1's money sums hash-exact (plans/tpch.py).

Algorithm (faithful to the paper's structure, simplified schedule):
  1. Seed: all substrings (len ≤ ``max_piece_len``) of corpus words,
     weighted by word frequency; keep every observed single char plus the
     top multi-char pieces by weight. Seed probs ∝ weights.
  2. EM: E-step computes expected piece counts per word via
     forward–backward over the lattice of all segmentations; M-step
     renormalizes. Pieces whose rounded expected count hits 0 are dropped
     (chars are floored at 1 micro so every word stays segmentable).
  3. Prune: keep chars + the top ``shrink`` fraction of multi-char pieces
     by probability; re-run EM; repeat until ≤ the target vocab size.
Ties everywhere break (weight/prob desc, piece asc) so training is
deterministic.

Encode is Viterbi (max log-prob segmentation; ties prefer fewer tokens,
then the lexicographically smaller token sequence), shipped the same way
as BPE encode: vocab in the closure, ``mapInPandas``, per-batch word memo.

No counterpart in the reference repo (no text pipeline); built for the
engine's X4 layer (SURVEY.md §2b). Tests: tests/test_unigram.py pins the
trained vocab against an independently-written pure-Python reference and
brute-force-verifies Viterbi optimality.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realestatedeals_spark.operators.bpe import word_freq_table

MICROS = 1_000_000


def _logsumexp(xs: list[float]) -> float:
    m = max(xs)
    if m == float("-inf"):
        return m
    return m + math.log(sum(math.exp(x - m) for x in xs))


def expected_counts_word(
    word: str, weight: int, logp: dict[str, float], max_len: int
) -> dict[str, float]:
    """Forward-backward expected piece counts for one word (weighted by its
    corpus frequency). Pure function so the Spark E-step and any external
    checker share one definition of the lattice."""
    n = len(word)
    alpha = [float("-inf")] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        terms = [
            alpha[j] + logp[word[j:i]]
            for j in range(max(0, i - max_len), i)
            if alpha[j] != float("-inf") and word[j:i] in logp
        ]
        if terms:
            alpha[i] = _logsumexp(terms)
    if alpha[n] == float("-inf"):
        return {}
    beta = [float("-inf")] * (n + 1)
    beta[n] = 0.0
    for j in range(n - 1, -1, -1):
        terms = [
            logp[word[j:i]] + beta[i]
            for i in range(j + 1, min(n, j + max_len) + 1)
            if beta[i] != float("-inf") and word[j:i] in logp
        ]
        if terms:
            beta[j] = _logsumexp(terms)
    z = alpha[n]
    out: dict[str, float] = {}
    for j in range(n):
        if alpha[j] == float("-inf"):
            continue
        for i in range(j + 1, min(n, j + max_len) + 1):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or beta[i] == float("-inf"):
                continue
            e = math.exp(alpha[j] + lp + beta[i] - z) * weight
            if e > 0.0:
                out[piece] = out.get(piece, 0.0) + e
    return out


def _em_counts(words: DataFrame, logp: dict[str, float], max_len: int) -> dict[str, int]:
    """One distributed E-step: expected piece counts over the word table,
    returned as exact int64 micros keyed by piece (vocab-sized dict)."""
    items = sorted(logp.items())
    table = dict(items)

    def estep(batches):
        for pdf in batches:
            # round each WORD's contribution to int64 micros independently,
            # then accumulate ints: integer addition is associative and
            # commutative, so the result is bit-identical under any
            # partitioning, batch split, row order, or task retry.
            acc: dict[str, int] = {}
            for word, weight in zip(pdf["word"], pdf["weight"]):
                for piece, e in expected_counts_word(
                    word, int(weight), table, max_len
                ).items():
                    acc[piece] = acc.get(piece, 0) + int(round(e * MICROS))
            pieces = sorted(acc)
            yield pd.DataFrame(
                {"piece": pieces, "micros": [acc[p] for p in pieces]}
            )

    counted = (
        words.mapInPandas(estep, "piece string, micros long")
        .groupBy("piece")
        .agg(F.sum("micros").alias("micros"))
        .collect()
    )
    return {r.piece: r.micros for r in counted}


def _normalize(counts: dict[str, int], chars: set[str]) -> dict[str, float]:
    """M-step: micros counts → log-probs. Chars are floored at 1 micro so
    the lattice always has a fallback path; zero-count multi-char pieces
    drop out."""
    kept = {
        p: max(c, 1) if p in chars else c for p, c in counts.items() if c > 0 or p in chars
    }
    total = sum(kept.values())
    return {p: math.log(c) - math.log(total) for p, c in kept.items()}


def seed_pieces(
    words: DataFrame, max_seed: int, max_len: int
) -> tuple[dict[str, float], set[str]]:
    """Substring-explode seed vocabulary: every observed char, plus the top
    ``max_seed`` multi-char substrings by corpus weight. One shuffle over
    the (vocab-bounded) word table."""
    sub_weights = words.select(
        F.expr(
            "explode(flatten(transform(sequence(0, length(word) - 1), "
            f"j -> transform(sequence(1, least({max_len}, length(word) - j)), "
            "l -> substr(word, j + 1, l))))) AS piece"
        ),
        "weight",
    ).groupBy("piece").agg(F.sum("weight").alias("w"))
    # truncate to the seed size ENGINE-side (TakeOrderedAndProject: per-
    # partition heaps, no global sort, driver state = max_seed rows) —
    # collecting every distinct substring would scale with vocabulary ×
    # max_len, not with the seed budget.
    char_rows = sub_weights.filter(F.length("piece") == 1).collect()
    multi_rows = (
        sub_weights.filter(F.length("piece") > 1)
        .orderBy(F.desc("w"), F.asc("piece"))
        .limit(max_seed)
        .collect()
    )
    chars = {r.piece for r in char_rows}
    kept = {r.piece: r.w for r in [*char_rows, *multi_rows]}
    total = sum(kept.values())
    logp = {p: math.log(w) - math.log(total) for p, w in kept.items()}
    return logp, chars


def train_unigram(
    docs: DataFrame,
    vocab_multi: int = 64,
    text_col: str = "text",
    max_len: int = 6,
    max_seed: int = 512,
    em_rounds: int = 2,
    shrink: float = 0.6,
) -> list[tuple[str, float]]:
    """Train a unigram-LM vocabulary of (every char) + ``vocab_multi``
    multi-char pieces. Returns [(piece, logprob)] sorted by (logprob desc,
    piece asc). Corpus is read once; all iterations are vocab-bounded."""
    words = word_freq_table(docs, text_col).localCheckpoint()
    try:
        logp, chars = seed_pieces(words, max_seed, max_len)
        while True:
            for _ in range(em_rounds):
                logp = _normalize(_em_counts(words, logp, max_len), chars)
            multi = sorted(
                (p for p in logp if len(p) > 1), key=lambda p: (-logp[p], p)
            )
            if len(multi) <= vocab_multi:
                break
            keep = max(vocab_multi, int(len(multi) * shrink))
            logp = {p: lp for p, lp in logp.items() if len(p) == 1 or p in set(multi[:keep])}
        return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
    finally:
        # the trained vocab is plain Python — the word table is dead
        from realestatedeals_spark.util import free_local_checkpoint

        free_local_checkpoint(words)


def lattice_count_table(
    docs: DataFrame,
    max_seed: int = 192,
    text_col: str = "text",
    max_len: int = 6,
    max_word_len: int = 32,
) -> DataFrame:
    """Hash-exact companion of the EM E-step (the x3_pca_gram / g3b
    pattern): the SAME distributed machinery — one corpus word-frequency
    shuffle, a per-word lattice forward-backward in ``mapInPandas`` over
    distinct words, one piece-keyed groupBy sum — but with every piece
    probability ≡ 1, so alpha/beta become INTEGER segmentation-path
    counts and each piece's aggregate is the exact number of
    (word-weighted) segmentation paths through its occurrences. A SQL
    oracle replays the DP bit-for-bit with a sliding-window recursive CTE
    (plans/llm_clean.py:_X4_UNIGRAM_LATTICE_ORACLE), which the log-space
    EM E-step (libm exp/log) cannot offer.

    Overflow bound: per-edge path count alpha[j]·beta[i] ≤ total
    segmentations ≤ 2^(n-1) with n ≤ ``max_word_len`` (=32 → ≤ 2^31);
    summed over ≤ n·max_len occurrences and weighted by corpus frequency
    the corpus total stays < 2^63 for any corpus under ~10^7 tokens per
    distinct 32-char word — int64-safe at every tested SF, and the
    ``max_word_len`` filter (mirrored in the oracle) is the documented
    guard. Seed vocabulary = every observed char + top ``max_seed``
    multi-char substrings by exact integer weight (ties piece asc) —
    integer-deterministic, unlike the log-prob seed."""
    words = (
        word_freq_table(docs, text_col)
        .filter(F.length("word") <= max_word_len)
        .localCheckpoint()
    )
    sub_weights = words.select(
        F.expr(
            "explode(flatten(transform(sequence(0, length(word) - 1), "
            f"j -> transform(sequence(1, least({max_len}, length(word) - j)), "
            "l -> substr(word, j + 1, l))))) AS piece"
        ),
        "weight",
    ).groupBy("piece").agg(F.sum("weight").alias("w"))
    chars = [r.piece for r in sub_weights.filter(F.length("piece") == 1).collect()]
    multi = [
        r.piece
        for r in sub_weights.filter(F.length("piece") > 1)
        .orderBy(F.desc("w"), F.asc("piece"))
        .limit(max_seed)
        .collect()
    ]
    vocab = set(chars) | set(multi)

    def estep(batches):
        for pdf in batches:
            acc: dict[str, int] = {}
            for word, weight in zip(pdf["word"], pdf["weight"]):
                n = len(word)
                alpha = [0] * (n + 1)
                alpha[0] = 1
                for i in range(1, n + 1):
                    s = 0
                    for j in range(max(0, i - max_len), i):
                        if alpha[j] and word[j:i] in vocab:
                            s += alpha[j]
                    alpha[i] = s
                if alpha[n] == 0:  # unsegmentable: every edge product is 0
                    continue
                beta = [0] * (n + 1)
                beta[n] = 1
                for j in range(n - 1, -1, -1):
                    s = 0
                    for i in range(j + 1, min(n, j + max_len) + 1):
                        if beta[i] and word[j:i] in vocab:
                            s += beta[i]
                    beta[j] = s
                w = int(weight)
                for j in range(n):
                    if not alpha[j]:
                        continue
                    for i in range(j + 1, min(n, j + max_len) + 1):
                        if beta[i]:
                            p = word[j:i]
                            if p in vocab:
                                acc[p] = acc.get(p, 0) + alpha[j] * beta[i] * w
            pieces = sorted(acc)
            yield pd.DataFrame(
                {"piece": pieces, "paths": [acc[p] for p in pieces]}
            )

    return (
        words.mapInPandas(estep, "piece string, paths long")
        .groupBy("piece")
        .agg(F.sum("paths").cast("long").alias("paths"))
    )


def viterbi_segment(
    word: str, logp: dict[str, float], max_len: int
) -> list[str]:
    """Max-log-prob segmentation; ties prefer FEWER tokens, then the
    lexicographically smaller token sequence. Deterministic."""
    n = len(word)
    # best[i] = (score, ntok, tokens-tuple) for word[:i]
    best: list[tuple[float, int, tuple[str, ...]] | None] = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - max_len), i):
            prev = best[j]
            piece = word[j:i]
            lp = logp.get(piece)
            if prev is None or lp is None:
                continue
            c = (prev[0] + lp, prev[1] + 1, prev[2] + (piece,))
            if (
                cand is None
                or c[0] > cand[0]
                or (c[0] == cand[0] and (c[1], c[2]) < (cand[1], cand[2]))
            ):
                cand = c
        best[i] = cand
    final = best[n]
    if final is None:  # unreachable chars: fall back to raw chars
        return list(word)
    return list(final[2])


def encode_unigram(
    docs: DataFrame,
    vocab: list[tuple[str, float]],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int = 6,
) -> DataFrame:
    """Viterbi-tokenize every document against a trained vocab. Same output
    contract as BPE encode: (id, n_unigram_tokens, token_hash)."""
    import hashlib

    table = dict(vocab)

    def encode_batch(it):
        memo: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                memo[w] = got = viterbi_segment(w, table, max_len)
            return got

        for pdf in it:
            toks = [
                [t for w in txt.split() for t in enc_word(w)]
                for txt in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_unigram_tokens": [len(t) for t in toks],
                    "token_hash": [
                        hashlib.sha256(" ".join(t).encode()).hexdigest() for t in toks
                    ],
                }
            )

    schema = f"{id_col} long, n_unigram_tokens long, token_hash string"
    return docs.select(id_col, text_col).mapInPandas(encode_batch, schema)
