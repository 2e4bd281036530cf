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

from pyspark.sql import DataFrame

BASE_TS = 1_700_000_000
STEP = 10


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
        d = os.path.join(in_dir, f"b{i}")
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
