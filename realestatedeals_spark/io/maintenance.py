"""Table maintenance: small-file compaction + versioned snapshot commits.

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
  complete one — with a *transaction-log-style commit protocol*: a writer
  stages its data in a private directory, then claims the next version
  number with a single atomic ``rename``. Two concurrent writers racing
  for the same version number cannot both win — the loser's rename fails,
  it re-reads the (newly advanced) latest version, and retries or surfaces
  a ``CommitConflict`` to the caller for a read-modify-write retry. This
  is the same optimistic-concurrency shape as the Delta/Iceberg log
  protocol (stage files → atomically publish commit N); on those formats
  this module disappears in favor of their commit log, OPTIMIZE and
  ``VERSION AS OF``.

Atomicity scope: ``os.rename`` is atomic on a single POSIX filesystem —
the local-mode stand-in for an object store's conditional PUT (S3
``If-None-Match``) or HDFS rename, which is exactly what Delta's
LogStore abstracts.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(Exception):
    """Another writer committed a version the caller's snapshot didn't see.

    Raised when ``VersionedTable.commit(df, expected_latest=...)`` detects
    that the table advanced past ``expected_latest`` — the caller must
    re-read the new latest version, re-derive its output, and retry
    (optimistic concurrency, as in a Delta/Iceberg commit conflict)."""


def _data_files(path: str) -> list[str]:
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    ]


def compact_parquet(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Rewrite ``path`` with ⌈total_bytes/target_bytes⌉ files. Content is
    preserved row-for-row; only the file layout changes. Returns
    before/after file counts for observability.

    Crash-safety: stale ``.compact.tmp`` / ``.compact.old`` directories
    from a previously crashed run are removed at entry, so a rerun always
    succeeds (idempotent restart). The swap itself is two renames, NOT one
    atomic operation — there is a brief window where ``path`` does not
    exist and a concurrent reader would fail; callers needing
    always-readable swap semantics should use ``VersionedTable`` (readers
    resolve generations, never a moving path) or a real table format's
    OPTIMIZE.

    Scale note: ``coalesce`` (not ``repartition``) — compaction must not
    shuffle, it just narrows the write parallelism; each output task reads
    whole input files. On Delta/Iceberg this is OPTIMIZE with a file-size
    target.
    """
    tmp = path.rstrip("/") + ".compact.tmp"
    old = path.rstrip("/") + ".compact.old"
    for stale in (tmp, old):
        if os.path.exists(stale):
            shutil.rmtree(stale)
    before = _data_files(path)
    total = sum(os.path.getsize(f) for f in before)
    n_out = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(path).coalesce(n_out).write.mode("errorifexists").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {"files_before": len(before), "files_after": len(_data_files(path)), "bytes": total}


class VersionedTable:
    """Append-only snapshot versions under ``root/v=<n>`` with an atomic
    rename-claim commit protocol; readers resolve to the latest complete
    version, or any pinned one (time travel).

    Commit protocol (single-filesystem optimistic concurrency):

    1. The writer stages its snapshot in a private ``.stage-<uuid>``
       directory (Spark writes data files + ``_SUCCESS`` there — the
       completeness marker travels with the data).
    2. It computes the next version number ``N = latest_claimed + 1`` and
       publishes with one ``os.rename(stage, v=N)`` — atomic on POSIX.
    3. If ``v=N`` already exists (another writer won the race, or a junk
       directory squats there), the rename fails without corrupting
       either side. With no ``expected_latest`` the writer re-computes
       ``N`` and retries the rename — blind appends always converge. With
       ``expected_latest`` set (read-modify-write, e.g. a MERGE), losing
       the race means the writer's input snapshot is stale, so
       ``CommitConflict`` propagates and the caller re-reads + retries.

    A crashed writer leaves only a private ``.stage-*`` directory (never a
    partial ``v=N``); ``vacuum_stages()`` clears them.
    """

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

    def _claimed_versions(self) -> list[int]:
        # every v=* dir, complete or not: a squatting junk dir must not be
        # silently overwritten, just skipped past
        return sorted(
            int(d[2:]) for d in os.listdir(self.root) if d.startswith("v=")
        )

    def commit(
        self,
        df: DataFrame,
        expected_latest: int | None = None,
        max_retries: int = 20,
    ) -> int:
        """Atomically publish ``df`` as the next version; returns it.

        ``expected_latest``: the latest complete version the caller's
        computation was based on (``None`` = blind append, always wins
        eventually). If the table has advanced past it by claim time, the
        staged data is discarded and ``CommitConflict`` is raised — the
        caller re-reads and retries, so one of any set of concurrent
        read-modify-writers always succeeds and the rest converge.
        """
        stage = os.path.join(self.root, f".stage-{uuid.uuid4().hex}")
        df.write.mode("errorifexists").parquet(stage)
        try:
            for _ in range(max_retries):
                claimed = self._claimed_versions()
                latest_claimed = claimed[-1] if claimed else 0
                if expected_latest is not None:
                    cur = self.latest_version() or 0
                    if cur != expected_latest:
                        raise CommitConflict(
                            f"table at v={cur}, caller expected v={expected_latest}"
                        )
                nxt = latest_claimed + 1
                target = os.path.join(self.root, f"v={nxt}")
                try:
                    os.rename(stage, target)
                    return nxt
                except OSError:
                    if expected_latest is not None:
                        raise CommitConflict(
                            f"lost commit race for v={nxt} "
                            f"(caller expected latest v={expected_latest})"
                        ) from None
                    continue  # blind append: recompute N and re-claim
            raise RuntimeError(f"commit did not claim a version in {max_retries} tries")
        finally:
            if os.path.exists(stage):
                shutil.rmtree(stage)

    def read(self, version: int | None = None) -> DataFrame:
        v = self.latest_version() if version is None else version
        if v is None or v not in self.versions():
            raise ValueError(f"no such version {version!r} in {self.root}")
        return self.spark.read.parquet(os.path.join(self.root, f"v={v}"))

    def vacuum_stages(self) -> int:
        """Remove leftover ``.stage-*`` directories from crashed writers."""
        n = 0
        for d in os.listdir(self.root):
            if d.startswith(".stage-"):
                shutil.rmtree(os.path.join(self.root, d))
                n += 1
        return n
