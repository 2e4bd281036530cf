"""Shared micro-batch replay harness for the streaming twins.

Every streaming query in the registry replays a deterministic sequence of
micro-batches through a real Structured Streaming query
(``maxFilesPerTrigger=1`` + ``availableNow``), which needs the same
fixture choreography everywhere: write each batch as ONE parquet file in
its own ``b{i}`` directory, then stamp strictly increasing mtimes so the
file-source picks them up in order. This module is the one home for that
choreography.

The batches are written by ONE Spark job (round 12, guide §2.4): every
batch frame is tagged with a literal batch index, the union is hash-
partitioned on that index so each batch's rows land in exactly one task
(⇒ exactly one data file per batch), and the job writes
``partitionBy(_b)`` into a staging dir whose partition directories are
then renamed into place. The previous shape — N concurrent single-file
jobs from a thread pool — paid N job schedulings and N scan plans per
replay fixture; at ~0.1–0.2 s of per-job machinery across a dozen
streaming registry entries, that fixed cost was the point (round-10 and
round-12 measurements in SCALE.md / OPTIMIZATION_r12.md).
"""

from __future__ import annotations

import os
import shutil

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
    file with mtime ``base_ts + (start+k)*step``. All batches are written
    by one partitioned job (module docstring); mtimes are stamped only
    after every write has completed, so ordering is by the stamp alone
    (never by write completion order)."""
    os.makedirs(in_dir, exist_ok=True)

    def _stamp(i: int) -> None:
        d = os.path.join(in_dir, epoch_dir_name(i))
        t = base_ts + i * step
        for fname in os.listdir(d):
            os.utime(os.path.join(d, fname), (t, t))

    def _one(k: int, df: DataFrame) -> None:
        i = start + k
        df.coalesce(1).write.parquet(os.path.join(in_dir, epoch_dir_name(i)))
        _stamp(i)

    if len(batches) == 1:
        _one(0, batches[0])
        return
    # ONE job for all batches: tag each frame with its batch index (the
    # fixture frames never carry a ``_b`` column), hash-partition on it so
    # a batch is exactly one task's output (one data file per dir even when
    # two indexes hash-collide into one task — the writer splits files by
    # partition value), and rename the partition dirs into place.
    tagged = None
    for k, df in enumerate(batches):
        t = df.withColumn("_b", F.lit(start + k))
        tagged = t if tagged is None else tagged.unionByName(t)
    stage = os.path.join(in_dir, ".epochs_stage")
    tagged.repartition(len(batches), "_b").write.partitionBy("_b").parquet(stage)
    written: set[int] = set()
    for entry in os.listdir(stage):
        if entry.startswith("_b="):
            i = int(entry.split("=", 1)[1])
            os.rename(os.path.join(stage, entry), os.path.join(in_dir, epoch_dir_name(i)))
            written.add(i)
    shutil.rmtree(stage, ignore_errors=True)
    for k, df in enumerate(batches):
        i = start + k
        if i in written:
            _stamp(i)
        else:
            # an EMPTY batch produces no partition dir in the single-job
            # write; fall back to the per-batch path so the epoch (and its
            # batch-index accounting downstream) still exists
            _one(k, df)
