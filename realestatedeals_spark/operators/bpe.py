"""Distributed BPE merge-table training (Sennrich et al. 2016, word-freq
variant) — the iterative-algorithm pattern done Spark-first.

The scale shape that makes BPE trainable on a 100 TB corpus: the corpus is
touched ONCE (whitespace-token groupBy → word-frequency table, one shuffle);
every training iteration after that runs on the VOCABULARY-sized symbol
table (distinct words + weights), which is bounded by language, not by
corpus size. Each iteration is: adjacent-pair explode + weighted groupBy
(JVM column expressions), a 1-row argmax collect (TakeOrderedAndProject —
per-partition heaps, no global sort), and a vectorized merge rewrite of the
symbol arrays. Lineage is cut every few rounds (localCheckpoint on the
vocab-bounded table) so iteration N's plan does not replay iterations
0..N-1.

Pair counting counts every adjacent position ("aaa" contributes (a,a)
twice); merging is left-to-right greedy non-overlapping — the standard BPE
convention pair, mirrored exactly by the pure-Python reference in
tests/test_bpe.py. Ties break (weight desc, left asc, right asc) so the
merge table is deterministic.

No counterpart in the reference repo (no text pipeline); built for the
engine's X4 layer (SURVEY.md §2b).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from realestatedeals_spark.util import free_local_checkpoint

END = "</w>"


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: whitespace words → (word, weight). The only
    corpus-proportional shuffle in BPE training."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """word → array of single-char symbols + end-of-word marker."""
    # Spark split uses limit=-1 (keeps trailing empties, unlike Java's
    # String.split), so the end-of-string lookahead match leaves one "" —
    # drop empties before appending the end marker.
    chars = F.filter(F.split(F.col("word"), "(?!^)"), lambda c: c != "")
    return words.select(
        F.concat(chars, F.array(F.lit(END))).alias("syms"),
        "weight",
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    pairs = F.transform(
        F.sequence(F.lit(0), F.size("syms") - 2),
        lambda i: F.struct(
            F.col("syms")[i].alias("left"), F.col("syms")[i + 1].alias("right")
        ),
    )
    return (
        syms.filter(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "weight")
        .groupBy("p.left", "p.right")
        .agg(F.sum("weight").alias("pair_weight"))
    )


def _merge_udf(left: str, right: str):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def apply_merge(col: pd.Series) -> pd.Series:
        merged = left + right

        def rewrite(syms):
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        return col.map(rewrite)

    return apply_merge


def train_bpe(docs: DataFrame, n_merges: int, text_col: str = "text") -> list[Row]:
    """Learn ``n_merges`` BPE merges; returns [(rank, left, right, merged,
    pair_weight)]. Stops early if no adjacent pair remains."""
    syms = _initial_symbols(word_freq_table(docs, text_col)).localCheckpoint()
    merges: list[Row] = []
    # Lazy checkpoints chain: a new checkpoint's RDD reads the previous one
    # until its own first action materializes it, so the previous frame can
    # only be released AFTER the next round's collect. Tracked via
    # live_ckpt (current) + pending_free (parent awaiting that action);
    # everything is dead at return (the result is a plain merge list).
    live_ckpt, pending_free = syms, None
    try:
        for rank in range(n_merges):
            best = (
                _pair_counts(syms)
                .orderBy(F.desc("pair_weight"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            if pending_free is not None:
                free_local_checkpoint(pending_free)
                pending_free = None
            if not best:
                break
            b = best[0]
            merges.append(
                Row(
                    rank=rank,
                    left=b.left,
                    right=b.right,
                    merged=b.left + b.right,
                    pair_weight=b.pair_weight,
                )
            )
            syms = syms.select(
                _merge_udf(b.left, b.right)("syms").alias("syms"), "weight"
            )
            # Cut lineage every few rounds, not every round: the table is
            # vocab-bounded, so a handful of chained Arrow-UDF rewrites re-run
            # cheaply, while an eager checkpoint per round doubles the job count.
            if (rank + 1) % 4 == 0:
                syms = syms.localCheckpoint()
                pending_free = live_ckpt
                live_ckpt = syms
    finally:
        # finally, not fall-through: a failed collect mid-training must not
        # leak the live symbol-table checkpoints for the session
        free_local_checkpoint(live_ckpt)
        if pending_free is not None:
            free_local_checkpoint(pending_free)
    return merges


def encode_with_merges(
    docs: DataFrame, merges: list[Row], text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Apply a learned merge table to tokenize documents.

    Sennrich-style encode: each word becomes char symbols + end marker, then
    every merge is applied greedily left-to-right in rank order. The merge
    table is vocab-bounded → shipped in the UDF closure (broadcast-sized);
    encoding is embarrassingly parallel mapInPandas with a per-batch word
    memo — word soup corpora re-encode each distinct word once per batch,
    not once per occurrence. Output: (id, n_bpe_tokens, token_hash) — the
    hash stands in for the token stream so the result stays narrow.
    """
    import hashlib

    table = [(m.left, m.right, m.merged) for m in merges]

    def encode_batch(it):
        memo: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                syms = list(w) + [END]
                for left, right, merged in table:
                    out, i, n = [], 0, len(syms)
                    while i < n:
                        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                            out.append(merged)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                memo[w] = got = syms
            return got

        for pdf in it:
            toks = [
                [t for w in txt.split() for t in enc_word(w)]
                for txt in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bpe_tokens": [len(t) for t in toks],
                    "token_hash": [
                        hashlib.sha256(" ".join(t).encode()).hexdigest() for t in toks
                    ],
                }
            )

    schema = f"{id_col} long, n_bpe_tokens long, token_hash string"
    return docs.select(id_col, text_col).mapInPandas(encode_batch, schema)
