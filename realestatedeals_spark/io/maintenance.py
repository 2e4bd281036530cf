"""Table maintenance: small-file compaction + versioned snapshot reads.

The reference rewrites its whole JSON state file every cycle
(main.py:144-171) — the degenerate form of two real table-maintenance
problems at scale:

- **Small files.** Streaming sinks and per-batch writers emit one-file
  micro-batches; a year of 30-minute cycles is ~17k files per table, and
  at 100 TB a scan's task count is file-bound long before byte-bound.
  ``compact_parquet`` rewrites a directory to ⌈bytes/target⌉ files.
- **Versioned state.** The reference overwrites in place, losing history
  and crashing readers mid-write. ``VersionedTable`` writes each snapshot
  as a new ``v=<n>`` generation and resolves readers to the latest
  complete one — overwrite-by-rename semantics with time travel, the
  poor-man's Delta/Iceberg commit log (on those formats this module
  disappears in favor of OPTIMIZE and ``VERSION AS OF``).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def _data_files(path: str) -> list[str]:
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    ]


def compact_parquet(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Rewrite ``path`` with ⌈total_bytes/target_bytes⌉ files, atomically
    (write to ``<path>.compact.tmp``, then swap). Content is preserved
    row-for-row; only the file layout changes. Returns before/after file
    counts for observability.

    Scale note: ``coalesce`` (not ``repartition``) — compaction must not
    shuffle, it just narrows the write parallelism; each output task reads
    whole input files. On Delta/Iceberg this is OPTIMIZE with a file-size
    target.
    """
    before = _data_files(path)
    total = sum(os.path.getsize(f) for f in before)
    n_out = max(1, math.ceil(total / target_bytes))
    tmp = path.rstrip("/") + ".compact.tmp"
    old = path.rstrip("/") + ".compact.old"
    spark.read.parquet(path).coalesce(n_out).write.mode("errorifexists").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    import shutil

    shutil.rmtree(old)
    return {"files_before": len(before), "files_after": len(_data_files(path)), "bytes": total}


class VersionedTable:
    """Append-only snapshot versions under ``root/v=<n>``; readers resolve
    to the latest complete version, or any pinned one (time travel)."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def versions(self) -> list[int]:
        out = []
        for d in os.listdir(self.root):
            if d.startswith("v=") and os.path.exists(
                os.path.join(self.root, d, "_SUCCESS")
            ):
                out.append(int(d[2:]))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def commit(self, df: DataFrame) -> int:
        # next = max over ALL version dirs, complete or not — a crashed
        # writer's junk directory must not collide with the next commit
        all_vs = [
            int(d[2:]) for d in os.listdir(self.root) if d.startswith("v=")
        ]
        nxt = (max(all_vs) if all_vs else 0) + 1
        df.write.mode("errorifexists").parquet(os.path.join(self.root, f"v={nxt}"))
        return nxt

    def read(self, version: int | None = None) -> DataFrame:
        v = self.latest_version() if version is None else version
        if v is None or v not in self.versions():
            raise ValueError(f"no such version {version!r} in {self.root}")
        return self.spark.read.parquet(os.path.join(self.root, f"v={v}"))
