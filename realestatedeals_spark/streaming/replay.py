"""Shared micro-batch replay harness for the streaming twins.

Every streaming query in the registry replays a deterministic sequence of
micro-batches through a real Structured Streaming query
(``maxFilesPerTrigger=1`` + ``availableNow``), which needs the same
fixture choreography everywhere: write each batch as ONE parquet file in
its own ``b{i}`` directory, then stamp strictly increasing mtimes so the
file-source picks them up in order. This module is the one home for that
choreography.

The batch writes are independent single-file jobs, so they run
CONCURRENTLY (thread-pool job submission — the same latency shape as
Catalog.commit's parallel phase-1): the replay's fixture setup costs one
write's wall time instead of the sum. At ~0.5 s of fixed setup per
streaming query across a dozen registry entries, this is where the
headline bench's replay overhead lived (round-10 measurement in
SCALE.md).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BASE_TS = 1_700_000_000
STEP = 10


def epoch_dir_name(i: int) -> str:
    """Directory name ``write_epoch_dirs`` gives batch index ``i``. Callers
    that hold back / replay a specific batch (c3's restart-from-checkpoint
    phase) must derive the name here, never hard-code the b-prefix."""
    return f"b{i}"


def time_tiles(
    df: DataFrame, n_tiles: int, order_cols: tuple[str, ...] = ("ts", "event_id")
) -> list[DataFrame]:
    """Split ``df`` into ``n_tiles`` contiguous, row-count-balanced tiles
    under ``order_cols`` — EXACTLY ``ntile(n_tiles) OVER (ORDER BY ...)``
    membership — without the ordered-but-unpartitioned window the naive
    fixture form used (a single-partition sort of the full events table,
    re-run once per tile filter).

    Plan: global_rank the NARROW order-key frame (range partition +
    parallel rank), collect the n_tiles−1 boundary composite keys (the
    driver receives n−1 ROWS, not data), and split the original frame by
    lexicographic comparison against them — each tile is a plain filter
    over the source, no window, no global sort. ntile's uneven-split
    arithmetic (first ``n % tiles`` tiles get one extra row) is reproduced
    exactly, so batch membership — and therefore every replay oracle — is
    unchanged.

    Timestamp order columns are compared through ``unix_micros`` (order-
    isomorphic), never as collected naive datetimes, so a DST-fold
    boundary row cannot flake under a hostile session timezone.
    """
    from realestatedeals_spark.operators.ranking import free_rank_pin, global_rank

    def keyed(c: str) -> Column:
        if isinstance(df.schema[c].dataType, T.TimestampType):
            return F.unix_micros(F.col(c))
        return F.col(c)

    kcols = [f"_k{i}" for i in range(len(order_cols))]
    keys = df.select(*[keyed(c).alias(k) for c, k in zip(order_cols, kcols)])
    ranked, n = global_rank(keys, [F.asc(k) for k in kcols], out_col="_rk")
    base, rem = divmod(n, n_tiles)
    cuts, acc = [], 0
    for k in range(n_tiles - 1):
        acc += base + (1 if k < rem else 0)
        cuts.append(acc)
    by_rank = {
        r["_rk"]: tuple(r[k] for k in kcols)
        for r in ranked.filter(F.col("_rk").isin(cuts)).collect()
    }
    # The tiles below are plain filters over the ORIGINAL df — the ranked
    # frame is fully consumed by the boundary collect above, so release the
    # checkpoint global_rank pinned (one events-sized key frame per call
    # otherwise stays in executor storage for the session's lifetime).
    free_rank_pin(ranked)

    def lex_le(bound: tuple) -> Column:
        expr = keyed(order_cols[-1]) <= F.lit(bound[-1])
        for c, b in zip(reversed(order_cols[:-1]), reversed(bound[:-1])):
            expr = (keyed(c) < F.lit(b)) | ((keyed(c) == F.lit(b)) & expr)
        return expr

    tiles: list[DataFrame] = []
    prev: Column | None = None
    for cut in cuts:
        cond = lex_le(by_rank[cut]) if cut in by_rank else F.lit(False)
        tiles.append(df.filter(cond if prev is None else (cond & ~prev)))
        prev = cond
    tiles.append(df.filter(F.lit(True) if prev is None else ~prev))
    return tiles


def write_epoch_dirs(
    in_dir: str,
    batches: list[DataFrame],
    start: int = 0,
    base_ts: int = BASE_TS,
    step: int = STEP,
) -> None:
    """Write ``batches[k]`` to ``in_dir/b{start+k}`` as a single parquet
    file with mtime ``base_ts + (start+k)*step``. Writes run concurrently;
    mtimes are stamped after each write completes, so ordering is by the
    stamp alone (never by write completion order)."""
    os.makedirs(in_dir, exist_ok=True)

    def _one(k: int, df: DataFrame) -> None:
        i = start + k
        d = os.path.join(in_dir, epoch_dir_name(i))
        df.coalesce(1).write.parquet(d)
        t = base_ts + i * step
        for fname in os.listdir(d):
            os.utime(os.path.join(d, fname), (t, t))

    if len(batches) == 1:
        _one(0, batches[0])
        return
    with ThreadPoolExecutor(max_workers=min(len(batches), 8)) as pool:
        futs = [pool.submit(_one, k, df) for k, df in enumerate(batches)]
    for f in futs:
        f.result()
