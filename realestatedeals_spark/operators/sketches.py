"""Frequency-sketch operators: exact heavy hitters via candidate pruning.

The 100 TB design point: a naive ``groupBy(term).count()`` shuffles every
token (at 100 TB of text that is the whole corpus through the exchange).
Heavy hitters only need the terms whose global share exceeds ``1/k``, so we
run the classic two-pass scheme:

1. **Candidate pass** — an Arrow-batched Misra-Gries-style summary per batch
   (`mapInPandas`): within each batch the exact ``value_counts`` is available
   in memory, and any term whose *global* frequency exceeds ``n/(capacity+1)``
   must exceed ``n_b/(capacity+1)`` in at least one batch (otherwise summing
   the per-batch bounds gives ``freq ≤ Σ n_b/(capacity+1) = n/(capacity+1)``,
   a contradiction). Emitting the per-batch over-threshold terms therefore
   yields a **superset** of every global heavy hitter, with fewer than
   ``capacity+1`` survivors per batch — a tiny, bounded candidate set.
2. **Verify pass** — exact recount of candidates only: a broadcast semi-join
   keeps the shuffle proportional to candidate occurrences, never the corpus.

With ``capacity ≥ k`` the candidate superset is guaranteed, so the output is
*exact* (hash-matches the brute-force SQL oracle) while the full-token
shuffle of the naive plan is gone.

Reference parity: the reference has no sketches (its "profiling" is print
statements, e.g. /root/reference/main.py:30,52); this is a §2b X6 extension.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitter_candidates(tokens: DataFrame, col: str, capacity: int) -> DataFrame:
    """Misra-Gries-style batch summary in ONE scan of ``tokens``: candidate
    rows (a superset of every term with global frequency > n/(capacity+1),
    ≤ capacity rows per Arrow batch) plus one null-term sentinel row per
    batch carrying the batch's token count — so the global total rides along
    instead of costing a second scan."""

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vc = pdf[col].value_counts()
            cand = vc[vc * (capacity + 1) > len(pdf)]
            yield pd.DataFrame(
                {
                    col: list(cand.index.astype(str)) + [None],
                    "bn": [0] * len(cand) + [len(pdf)],
                }
            )

    return tokens.mapInPandas(mg, schema=f"{col} string, bn long")


def heavy_hitters(tokens: DataFrame, col: str = "term", k: int = 100) -> DataFrame:
    """Exact terms with global frequency > n/k, without a full-token shuffle.

    Exactly TWO scans of ``tokens``, both with bounded shuffles: the summary
    pass emits < capacity+2 rows per batch (candidates + the batch-count
    sentinel, materialized once — it is consumed by both the candidate set
    and the global total), the verify pass shuffles only candidate
    occurrences. ``capacity = 2k`` keeps the superset guarantee with slack.
    Output: (col, cnt) exact — oracle-comparable.
    """
    capacity = 2 * k
    summary = heavy_hitter_candidates(tokens, col, capacity).localCheckpoint(eager=True)
    candidates = summary.filter(F.col(col).isNotNull()).select(col).distinct()
    total = summary.agg(F.sum("bn").alias("n"))
    counts = (
        tokens.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("n"))
        .select(col, "cnt")
    )
