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

Atomicity scope: the version *claim* is delegated to a ``ClaimStore`` —
the conditional-PUT primitive a deployment actually configures. The
bundled ``PosixClaimStore`` implements it with ``open(..., O_EXCL)``
marker files (atomic exactly-one-winner on any POSIX filesystem); an
object-store deployment swaps in an implementation backed by S3
``PUT If-None-Match: *`` / GCS ``x-goog-if-generation-match: 0`` on the
same one-method interface, which is exactly what Delta's LogStore
abstracts. Data movement (stage → ``v=N``) stays a plain rename and is
only ever executed by the claim winner, so it is contention-free.
"""

from __future__ import annotations

import contextlib
import json
import math
import os
import shutil
import time
import threading
import uuid
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflict(Exception):
    """Another writer committed a version the caller's snapshot didn't see.

    Raised when ``VersionedTable.commit(df, expected_latest=...)`` detects
    that the table advanced past ``expected_latest`` — the caller must
    re-read the new latest version, re-derive its output, and retry
    (optimistic concurrency, as in a Delta/Iceberg commit conflict)."""


class ConstraintViolation(Exception):
    """A commit's rows violate a registered CHECK constraint.

    Raised before any version is claimed, so a violating writer leaves
    the table untouched (its stage directory is cleaned up)."""


class StaleVersionError(ValueError):
    """The requested version does not exist — either it never did, or a
    retention pass (``expire_versions`` / ``Catalog.expire``) reclaimed it.

    Every read entry point raises this TYPED error instead of letting
    Spark fail wherever the missing files happen to surface. Retention
    contract: a reader that must survive concurrent retention takes a
    scan LEASE (``VersionedTable.scan`` / ``Catalog.scan``) — leased
    versions are never reclaimed. An un-leased reader whose lazy plan
    races an expire may still fail inside Spark's scan; re-entering any
    read API then yields this error."""


class ClaimStore:
    """The atomic-claim primitive behind ``VersionedTable.commit`` — the
    one operation a 100 TB deployment has to map onto its storage system.

    ``try_claim(v)`` must be *atomic exactly-one-winner*: of any set of
    concurrent callers for the same ``v``, exactly one receives ``True``
    and every other receives ``False``, durably (a later ``try_claim(v)``
    also returns ``False``). That is precisely the contract of an object
    store's conditional PUT (S3 ``If-None-Match: *``, GCS
    ``if-generation-match: 0``, ABS ``If-None-Match: *``) and of POSIX
    ``open(O_CREAT|O_EXCL)`` — implement one method and the whole commit
    protocol (and everything built on it: ``ParquetAggView``'s MERGE, the
    MinHash incremental index) carries over unchanged.
    """

    def try_claim(self, version: int) -> bool:  # pragma: no cover - interface
        raise NotImplementedError

    def claimed(self) -> set[int]:  # pragma: no cover - interface
        raise NotImplementedError


class PosixClaimStore(ClaimStore):
    """Claims are zero-byte ``.claim-<n>`` marker files created with
    ``open(..., 'x')`` (``O_CREAT|O_EXCL``) — atomic exactly-one-winner on
    any POSIX filesystem, unlike a bare directory rename whose target-exists
    failure mode silently *succeeds* when the squatter is an empty directory
    (ADVICE round 5). The marker doubles as the durable claim record, so a
    writer that crashes between claim and publish leaves the version number
    burned (skipped, never reused) rather than half-published."""

    def __init__(self, root: str) -> None:
        self.root = root

    def _path(self, version: int) -> str:
        return os.path.join(self.root, f".claim-{version}")

    def try_claim(self, version: int) -> bool:
        try:
            with open(self._path(version), "x"):
                return True
        except FileExistsError:
            return False

    def claimed(self) -> set[int]:
        # tolerate junk entries whose suffix is not an integer (editor/backup
        # artifacts like ".claim-3~") — crashing here would permanently brick
        # every commit to the table (ADVICE round 6)
        out = set()
        for d in os.listdir(self.root):
            suffix = d[len(".claim-"):]
            if d.startswith(".claim-") and suffix.isdigit():
                out.add(int(suffix))
        return out


class InMemoryClaimStore(ClaimStore):
    """In-memory conditional-PUT fake for contention stress tests: the same
    exactly-one-winner semantics under a lock, plus an optional
    ``pre_claim`` hook that runs *inside the race window* (before the
    caller's check) so tests can deterministically inject an adversarial
    writer claiming the version first — the interleaving a real object
    store produces under load, made reproducible. Share one instance per
    table root; a second instance is a second (oblivious) store."""

    def __init__(self, pre_claim: Callable[[int], None] | None = None) -> None:
        self._claimed: set[int] = set()
        self._lock = threading.Lock()
        self.pre_claim = pre_claim

    def try_claim(self, version: int) -> bool:
        if self.pre_claim is not None:
            self.pre_claim(version)
        return self.adversary_claim(version)

    def adversary_claim(self, version: int) -> bool:
        """The locked check-and-claim itself, without re-triggering the
        ``pre_claim`` hook — what an injected adversary calls from inside
        the hook to steal the version (calling ``try_claim`` there would
        recurse)."""
        with self._lock:
            if version in self._claimed:
                return False
            self._claimed.add(version)
            return True

    def claimed(self) -> set[int]:
        with self._lock:
            return set(self._claimed)


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

    Commit protocol (optimistic concurrency over a ``ClaimStore``):

    1. The writer stages its snapshot in a private ``.stage-<uuid>``
       directory (Spark writes data files + ``_SUCCESS`` there — the
       completeness marker travels with the data).
    2. It computes the next version number ``N = latest_claimed + 1`` and
       claims it with ``store.try_claim(N)`` — the atomic exactly-one-
       winner conditional-PUT primitive (``PosixClaimStore`` =
       ``O_CREAT|O_EXCL`` marker files; object stores plug in a
       conditional PUT on the same interface).
    3. Exactly one of any set of racing writers wins the claim; only the
       winner renames its stage to ``v=N``, so the publish itself is
       contention-free. With no ``expected_latest`` a losing writer
       re-computes ``N`` and re-claims — blind appends always converge.
       With ``expected_latest`` set (read-modify-write, e.g. a MERGE),
       losing the race means the writer's input snapshot is stale, so
       ``CommitConflict`` propagates and the caller re-reads + retries.

    Externally squatted ``v=N`` directories (junk with no claim record)
    are never renamed over — POSIX ``rename(2)`` silently *replaces* an
    empty target directory, so the winner existence-checks the target and
    treats a squatter as a lost race, skipping past it (ADVICE round 5).

    A crashed writer leaves only a private ``.stage-*`` directory, or a
    burned ``.claim-N`` with no data (skipped by readers and by later
    writers) — never a partial ``v=N``; ``vacuum_stages()`` clears stages.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        store: ClaimStore | None = None,
        clock: Callable[[], float] | None = None,
    ) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.store = store if store is not None else PosixClaimStore(root)
        self._clock = clock if clock is not None else time.time

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

    def _require_version(self, version: int | None) -> int:
        """Typed existence gate for every read entry point: raises
        ``StaleVersionError`` (a ValueError) when ``version`` never
        existed or retention reclaimed it, instead of letting Spark fail
        mid-scan on missing files."""
        if version is None or version not in self.versions():
            raise StaleVersionError(
                f"no such version {version!r} in {self.root} — it never "
                "existed or expire_versions() reclaimed it; long-running "
                "readers should hold a scan() lease"
            )
        return version

    # -- scan leases: the reader side of the retention contract ------------
    def scan(self, version: int | None = None):
        """Context manager yielding ``read(version)`` with the version (and
        its MoR base) LEASED for the duration: ``expire_versions`` treats
        leased versions as protected, so a concurrent retention pass can
        never delete files out from under the scan. This is the documented
        way for a long-running reader to coexist with retention; readers
        that skip the lease get the typed ``StaleVersionError`` on their
        next read call after an expire (never silent wrong data)."""
        v = self.latest_version() if version is None else version
        self._require_version(v)
        lease = os.path.join(self.root, f"v={v}", f"_lease-{uuid.uuid4().hex}")
        with open(lease, "w") as fh:
            fh.write(repr(self._clock()))

        @contextlib.contextmanager
        def _ctx():
            try:
                yield self.read(v)
            finally:
                with contextlib.suppress(FileNotFoundError):
                    os.unlink(lease)

        return _ctx()

    def leased_versions(self) -> set[int]:
        """Versions under an active scan lease (plus their MoR bases),
        which retention must not reclaim."""
        out = set()
        for v in self.versions():
            d = os.path.join(self.root, f"v={v}")
            if any(e.startswith("_lease-") for e in os.listdir(d)):
                out.add(v)
                base_file = os.path.join(d, "_base")
                if os.path.exists(base_file):
                    with open(base_file) as fh:
                        out.add(int(fh.read().strip()))
        return out

    def _claimed_versions(self) -> list[int]:
        # every v=* dir (complete or not — a squatting junk dir must not be
        # silently overwritten, just skipped past) UNION the claim store's
        # record (a claim whose writer crashed pre-publish burns the number)
        dirs = {int(d[2:]) for d in os.listdir(self.root) if d.startswith("v=")}
        return sorted(dirs | self.store.claimed())

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
        self._validate_constraints(df)
        stage = os.path.join(self.root, f".stage-{uuid.uuid4().hex}")
        df.write.mode("errorifexists").parquet(stage)
        self._write_schema_sidecar(stage, df)
        return self._publish(stage, expected_latest, max_retries)

    # -- schema sidecars (round 12): parquet schema INFERENCE launches a
    # footer-read job per spark.read.parquet call (measured +1 job /
    # ~0.1-0.2 s warm), and this table's read paths re-open version dirs
    # constantly (every catalog epoch, every MoR resolve). Real table
    # formats (Delta/Iceberg) carry the schema in commit metadata for
    # exactly this reason; ``_schema.json`` is that metadata here. Files
    # starting with "_" are invisible to Spark's file index, so the
    # sidecar never affects what a scan reads. Missing sidecar (dirs
    # written by earlier rounds, or externally) falls back to inference.

    def _write_schema_sidecar(self, d: str, df: DataFrame) -> None:
        with open(os.path.join(d, "_schema.json"), "w") as fh:
            fh.write(df.schema.json())

    def _read_dir(self, d: str) -> DataFrame:
        sidecar = os.path.join(d, "_schema.json")
        if os.path.exists(sidecar):
            from pyspark.sql import types as T

            with open(sidecar) as fh:
                schema = T.StructType.fromJson(json.load(fh))
            return self.spark.read.schema(schema).parquet(d)
        return self.spark.read.parquet(d)

    def _publish(self, stage: str, expected_latest: int | None, max_retries: int) -> int:
        """Claim-and-rename a fully-staged directory as the next version
        (the shared tail of ``commit`` and ``delete_where``)."""
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
                # os.path.exists guard: rename(2) silently REPLACES an empty
                # target directory, so an externally-squatted v=N (no claim
                # record, created between the listing above and here) must be
                # treated as a lost race, never renamed over (ADVICE round 5).
                # The rename itself can still lose to a squatter landing
                # inside the check→rename window: a non-empty one makes
                # rename raise OSError — also a lost race, not an abort; the
                # claim is already burned, so retrying is safe (ADVICE r6).
                if self.store.try_claim(nxt) and not os.path.exists(target):
                    try:
                        os.rename(stage, target)
                        # commit wall-clock, stamped AFTER the atomic publish
                        # so AS-OF ordering follows version order (a crash in
                        # this window leaves no marker; read_as_of falls back
                        # to the directory mtime)
                        with open(os.path.join(target, "_commit_ts"), "w") as fh:
                            fh.write(repr(self._clock()))
                        return nxt
                    except OSError:
                        pass  # squatter won the window: fall through as lost race
                if expected_latest is not None:
                    raise CommitConflict(
                        f"lost commit race for v={nxt} "
                        f"(caller expected latest v={expected_latest})"
                    )
                continue  # blind append: recompute N and re-claim
            raise RuntimeError(f"commit did not claim a version in {max_retries} tries")
        finally:
            if os.path.exists(stage):
                shutil.rmtree(stage)

    # -- merge-on-read deletes (Iceberg/Delta-style position deletion
    # vectors): a DELETE commits a version directory holding only a
    # ``_base`` pointer to the full snapshot it applies to plus a
    # ``_dv/`` parquet of (file_path, row_index) positions — no data is
    # copied or rewritten. Readers anti-join the DV against the base scan
    # using the ``_metadata.file_path``/``row_index`` hidden columns. The
    # DV is stored CUMULATIVE per version, so a read consults exactly one
    # base + one DV regardless of how many deletes stacked up; at 100 TB a
    # delete of k rows costs O(k) written bytes while the petabyte of data
    # files stands still. ``compact`` (a plain ``commit(read())``) folds
    # the DV into a fresh full snapshot when the positions grow large.

    def _resolve(self, v: int) -> tuple[int, DataFrame | None, DataFrame | None]:
        """(full-snapshot base version, cumulative DV or None, cumulative
        insert store or None) for ``v``. The DV addresses BASE data files
        only; rows born after the base live in the (small, rewritten-
        cumulative) ``_ins`` store and are updated/deleted by rewriting it
        — compaction folds both back into a full snapshot."""
        d = os.path.join(self.root, f"v={v}")
        base_file = os.path.join(d, "_base")
        if not os.path.exists(base_file):
            return v, None, None
        with open(base_file) as fh:
            base = int(fh.read().strip())
        # the DV schema is a format constant — no inference job, ever
        dv = self.spark.read.schema("file_path string, row_index bigint").parquet(
            os.path.join(d, "_dv")
        )
        ins_dir = os.path.join(d, "_ins")
        ins = self._read_dir(ins_dir) if os.path.exists(ins_dir) else None
        return base, dv, ins

    def _lineage(self, base: int) -> DataFrame:
        """Base snapshot with hidden row-position columns exposed."""
        return self._read_dir(os.path.join(self.root, f"v={base}")).select(
            "*",
            F.col("_metadata.file_path").alias("__file"),
            F.col("_metadata.row_index").alias("__pos"),
        )

    def _live_base(self, base: int, dv: DataFrame | None) -> DataFrame:
        """Base rows surviving the DV, position columns still attached."""
        live = self._lineage(base)
        if dv is not None:
            live = live.join(
                dv,
                (F.col("__file") == F.col("file_path"))
                & (F.col("__pos") == F.col("row_index")),
                "left_anti",
            )
        return live

    def read(self, version: int | None = None) -> DataFrame:
        v = self._require_version(
            self.latest_version() if version is None else version
        )
        base, dv, ins = self._resolve(v)
        if dv is None:
            return self._read_dir(os.path.join(self.root, f"v={base}"))
        out = self._live_base(base, dv).drop("__file", "__pos")
        if ins is None:
            return out
        # schema evolution: columns added by later upserts surface as null
        # on pre-evolution rows (and vice versa)
        return out.unionByName(ins, allowMissingColumns=True)

    def _commit_mor(
        self,
        base: int,
        dv: DataFrame,
        ins: DataFrame | None,
        expected_latest: int,
        max_retries: int,
    ) -> int:
        """Stage and publish a merge-on-read version (_base + _dv [+ _ins])."""
        stage = os.path.join(self.root, f".stage-{uuid.uuid4().hex}")
        os.makedirs(stage)
        dv.write.mode("errorifexists").parquet(os.path.join(stage, "_dv"))
        if ins is not None:
            ins_dir = os.path.join(stage, "_ins")
            ins.write.mode("errorifexists").parquet(ins_dir)
            self._write_schema_sidecar(ins_dir, ins)
        with open(os.path.join(stage, "_base"), "w") as fh:
            fh.write(str(base))
        with open(os.path.join(stage, "_SUCCESS"), "w") as fh:
            fh.write("")
        return self._publish(stage, expected_latest=expected_latest, max_retries=max_retries)

    def delete_where(self, cond, max_retries: int = 20) -> int:
        """Merge-on-read DELETE: matching base rows go into the cumulative
        deletion vector (data files untouched); matching post-base inserts
        are dropped from the rewritten insert store. Read-modify-write:
        the commit conflicts if the table advanced since the positions
        were computed. Returns rows deleted; no-match commits nothing."""
        cur = self.latest_version()
        if cur is None:
            raise ValueError(f"empty table {self.root}")
        base, dv, ins = self._resolve(cur)
        live = self._live_base(base, dv)
        # hits is disjoint from dv by construction (live anti-joins the DV),
        # so one count on the checkpointed hits replaces the old
        # new_dv.count() + dv.count() pair, and the union needs no
        # checkpoint of its own — _commit_mor's parquet write materializes
        # it from the stored DV files plus the hits blocks (round 12).
        hits = (
            live.filter(cond)
            .select(F.col("__file").alias("file_path"), F.col("__pos").alias("row_index"))
            .localCheckpoint(eager=True)
        )
        n = hits.count()
        new_dv = dv.unionByName(hits) if dv is not None else hits
        new_ins = ins
        if ins is not None:
            new_ins = ins.filter(~cond).localCheckpoint(eager=True)
            n += ins.count() - new_ins.count()
        if n == 0:
            return 0
        self._commit_mor(base, new_dv, new_ins, cur, max_retries)
        return n

    def merge_into(
        self,
        source: DataFrame,
        keys: list[str],
        max_retries: int = 20,
        allow_schema_evolution: bool = False,
    ) -> dict:
        """Merge-on-read UPSERT (MERGE ... WHEN MATCHED THEN UPDATE, WHEN
        NOT MATCHED THEN INSERT), key-matched: matched base rows are
        position-deleted and re-inserted with the source's values; matched
        insert-store rows are replaced in the rewritten store; unmatched
        source rows are inserted. Data files are never rewritten — an
        upsert of k rows costs O(k + |insert store|) written bytes.
        Matched rows take the source row WHOLESALE (full-row replace).
        With ``allow_schema_evolution`` the source may add or omit
        columns; missing columns read back as null on either side.
        Returns {'updated': ..., 'inserted': ...}."""
        cur = self.latest_version()
        if cur is None:
            raise ValueError(f"empty table {self.root}")
        base, dv, ins = self._resolve(cur)
        table_cols = set(self.read(cur).columns)
        if not allow_schema_evolution and set(source.columns) != table_cols:
            raise ValueError(
                f"source schema {sorted(source.columns)} != table schema "
                f"{sorted(table_cols)}; pass allow_schema_evolution=True to widen"
            )
        # constraint check covers the post-image rows this MERGE introduces
        # (kept base/insert-store rows were validated by their own commits)
        self._validate_constraints(source)
        src = source.localCheckpoint(eager=True)
        live = self._live_base(base, dv)
        # Same stats restructure as delete_where (round 12): hits is
        # disjoint from dv (live anti-joins the DV), so n_base_upd is one
        # count on the checkpointed hits, and neither new_dv nor new_ins
        # needs a checkpoint before _commit_mor — the staged parquet writes
        # materialize them from stored files + checkpointed blocks.
        hits = (
            live.join(src.select(*keys), keys, "semi")
            .select(F.col("__file").alias("file_path"), F.col("__pos").alias("row_index"))
            .localCheckpoint(eager=True)
        )
        n_base_upd = hits.count()
        new_dv = dv.unionByName(hits) if dv is not None else hits
        if ins is not None:
            kept_ins = ins.join(src.select(*keys), keys, "anti").localCheckpoint(
                eager=True
            )
            n_ins_upd = ins.count() - kept_ins.count()
            if allow_schema_evolution:
                new_ins = kept_ins.unionByName(src, allowMissingColumns=True)
            else:
                new_ins = kept_ins.unionByName(src)
        else:
            n_ins_upd = 0
            new_ins = src
        self._commit_mor(base, new_dv, new_ins, cur, max_retries)
        updated = n_base_upd + n_ins_upd
        return {"updated": updated, "inserted": src.count() - updated}

    def commit_ts(self, v: int) -> float:
        """Wall-clock commit time of version ``v`` (the ``_commit_ts``
        marker stamped right after the atomic publish; falls back to the
        version directory's mtime for a writer that crashed inside the
        rename→stamp window)."""
        d = os.path.join(self.root, f"v={v}")
        marker = os.path.join(d, "_commit_ts")
        if os.path.exists(marker):
            with open(marker) as fh:
                return float(fh.read().strip())
        return os.path.getmtime(d)

    def read_as_of(self, ts: float) -> DataFrame:
        """Time travel by wall clock: read the latest version whose commit
        time is ≤ ``ts`` (``SELECT ... TIMESTAMP AS OF`` semantics)."""
        eligible = [v for v in self.versions() if self.commit_ts(v) <= ts]
        if not eligible:
            raise ValueError(f"no version committed at or before {ts!r}")
        return self.read(eligible[-1])

    # -- CHECK constraints (Delta-style): named SQL boolean expressions
    # persisted with the table and validated on every write that adds
    # rows. Validation is ONE aggregation over the incoming rows (all
    # constraints fold into the same scan) and happens before any version
    # is claimed, so a violating writer cannot publish. SQL CHECK
    # semantics: only rows where the expression is FALSE violate; NULL
    # passes (use an explicit IS NOT NULL constraint for null bans).

    def _constraints_path(self) -> str:
        return os.path.join(self.root, "_constraints.json")

    def constraints(self) -> dict[str, str]:
        """Registered CHECK constraints, name → SQL expression."""
        p = self._constraints_path()
        if not os.path.exists(p):
            return {}
        with open(p) as fh:
            return json.load(fh)

    def set_constraint(self, name: str, expr: str) -> None:
        """Register a CHECK constraint. Existing live rows must already
        satisfy it (as in Delta's ADD CONSTRAINT), so readers can rely on
        the invariant for every version from here on."""
        if self.latest_version() is not None:
            self._validate_constraints(self.read(), {name: expr})
        cs = self.constraints()
        cs[name] = expr
        with open(self._constraints_path(), "w") as fh:
            json.dump(cs, fh, indent=1)

    def drop_constraint(self, name: str) -> bool:
        cs = self.constraints()
        found = name in cs
        cs.pop(name, None)
        with open(self._constraints_path(), "w") as fh:
            json.dump(cs, fh, indent=1)
        return found

    def _validate_constraints(
        self, df: DataFrame, checks: dict[str, str] | None = None
    ) -> None:
        checks = self.constraints() if checks is None else checks
        if not checks:
            return
        names = list(checks)
        counts = df.agg(
            *[
                F.sum(
                    F.when(~F.coalesce(F.expr(e), F.lit(True)), 1).otherwise(0)
                ).alias(f"__c{i}")
                for i, e in enumerate(checks[n] for n in names)
            ]
        ).first()
        bad = {
            n: int(counts[f"__c{i}"] or 0)
            for i, n in enumerate(names)
            if (counts[f"__c{i}"] or 0) > 0
        }
        if bad:
            detail = ", ".join(
                f"{n} ({checks[n]!r}): {c} rows" for n, c in sorted(bad.items())
            )
            raise ConstraintViolation(f"CHECK constraint(s) violated: {detail}")

    # -- change data feed (Delta CDF / Iceberg changelog semantics): a
    # row-level change log across the commit history, derivable after the
    # fact because every version is immutable. Downstream incremental
    # consumers (aggregate view refresh, index maintenance, replication)
    # read the changes instead of re-scanning snapshots.

    def _aligned(self, df: DataFrame, want: list[tuple[str, str]]) -> DataFrame:
        """Project ``df`` onto the (name, dtype) list, adding typed null
        columns for anything missing (schema-evolution alignment)."""
        cols = [
            F.col(c) if c in df.columns else F.lit(None).cast(t).alias(c)
            for c, t in want
        ]
        return df.select(*cols)

    def _classify_changes(
        self,
        old: DataFrame,
        new: DataFrame,
        keys: list[str],
        cols: list[tuple[str, str]],
        drop_unchanged: bool,
    ) -> DataFrame:
        """Keyed diff of two row sets → change rows. A key only on the old
        side is a ``delete``, only on the new side an ``insert``, on both
        an ``update_preimage`` + ``update_postimage`` pair (dropped when
        ``drop_unchanged`` and the values are null-safe equal — a snapshot
        diff cannot distinguish an untouched row from a rewrite-in-place).
        Null join keys never pair, surfacing as delete+insert; CDF assumes
        non-null unique keys per snapshot, as MERGE itself does."""
        names = [c for c, _ in cols]
        vals = [c for c in names if c not in keys]
        if not vals:
            raise ValueError("keys must not cover every column")
        o = self._aligned(old, cols).select(
            *keys, F.struct(*vals).alias("__ov"), F.lit(1).alias("__oex")
        )
        n = self._aligned(new, cols).select(
            *keys, F.struct(*vals).alias("__nv"), F.lit(1).alias("__nex")
        )
        j = o.join(n, keys, "full_outer")
        deletes = (
            j.filter(F.col("__nex").isNull())
            .select(*keys, "__ov.*")
            .withColumn("_change_type", F.lit("delete"))
        )
        inserts = (
            j.filter(F.col("__oex").isNull())
            .select(*keys, "__nv.*")
            .withColumn("_change_type", F.lit("insert"))
        )
        both = j.filter(F.col("__oex").isNotNull() & F.col("__nex").isNotNull())
        if drop_unchanged:
            both = both.filter(~F.col("__ov").eqNullSafe(F.col("__nv")))
        pre = both.select(*keys, "__ov.*").withColumn(
            "_change_type", F.lit("update_preimage")
        )
        post = both.select(*keys, "__nv.*").withColumn(
            "_change_type", F.lit("update_postimage")
        )
        out = deletes.unionByName(inserts).unionByName(pre).unionByName(post)
        return out.select(*names, "_change_type")

    def _step_changes(
        self, prev: int | None, v: int, keys: list[str]
    ) -> DataFrame:
        """Changes introduced by version ``v`` relative to ``prev``.

        Fast path — ``v`` is merge-on-read over the SAME base as ``prev``:
        the only rows whose liveness changed are (a) base positions in the
        deletion-vector delta and (b) rows differing between the two
        (small, rewritten-cumulative) insert stores, so the diff touches
        O(changes) rows and never rescans the base — the property that
        makes CDF consumable incrementally at 100 TB. Rebase steps (full
        snapshot commit, OPTIMIZE/compaction) fall back to a keyed
        snapshot diff; compaction then correctly emits nothing."""
        new_read = self.read(v)
        cols_new = [(f.name, f.dataType.simpleString()) for f in new_read.schema.fields]
        if prev is None:
            cols = cols_new
            old_read = self.spark.createDataFrame([], new_read.schema).coalesce(1)  # 1 partition: the empty parallelized frame spans defaultParallelism empty partitions otherwise (round 12)
            return self._classify_changes(
                old_read, new_read, keys, cols, drop_unchanged=True
            )
        old_read = self.read(prev)
        cols = list(cols_new)
        have = {c for c, _ in cols}
        for f in old_read.schema.fields:
            if f.name not in have:
                cols.append((f.name, f.dataType.simpleString()))
        base_p, dv_p, ins_p = self._resolve(prev)
        base_n, dv_n, ins_n = self._resolve(v)
        if dv_n is not None and base_p == base_n:
            dv_delta = dv_n.exceptAll(dv_p) if dv_p is not None else dv_n
            dead_base = self._lineage(base_n).join(
                dv_delta,
                (F.col("__file") == F.col("file_path"))
                & (F.col("__pos") == F.col("row_index")),
                "semi",
            ).drop("__file", "__pos")
            empty = self.spark.createDataFrame([], new_read.schema).coalesce(1)  # see old_read note
            ins_p_a = self._aligned(ins_p, cols) if ins_p is not None else self._aligned(empty, cols)
            ins_n_a = self._aligned(ins_n, cols) if ins_n is not None else self._aligned(empty, cols)
            old_side = self._aligned(dead_base, cols).unionByName(
                ins_p_a.exceptAll(ins_n_a)
            )
            new_side = ins_n_a.exceptAll(ins_p_a)
            # touched-by-construction: a MERGE that rewrote identical
            # values still emits its update pair (Delta CDF behavior)
            return self._classify_changes(
                old_side, new_side, keys, cols, drop_unchanged=False
            )
        return self._classify_changes(
            old_read, new_read, keys, cols, drop_unchanged=True
        )

    def table_changes(
        self, keys: list[str], v_from: int = 0, v_to: int | None = None
    ) -> DataFrame:
        """Change data feed: one row per row-level change for every commit
        in ``(v_from, v_to]``, keyed by ``keys`` (which must uniquely
        identify rows, as in ``merge_into``). Output schema = table
        columns (union across the range, schema evolution aligned) +
        ``_change_type`` (insert / delete / update_preimage /
        update_postimage) + ``_commit_version``. ``v_from=0`` reads from
        table creation (the first version emits all rows as inserts)."""
        vs = self.versions()
        if not vs:
            raise ValueError(f"empty table {self.root}")
        v_to = vs[-1] if v_to is None else v_to
        if v_from != 0 and v_from not in vs:
            raise ValueError(f"no such version {v_from} in {self.root}")
        steps = [v for v in vs if v_from < v <= v_to]
        if not steps:
            raise ValueError(f"no versions in ({v_from}, {v_to}]")
        out = None
        prev = v_from if v_from != 0 else None
        for v in steps:
            delta = self._step_changes(prev, v, keys).withColumn(
                "_commit_version", F.lit(v).cast("long")
            )
            out = delta if out is None else out.unionByName(
                delta, allowMissingColumns=True
            )
            prev = v
        return out

    def optimize(
        self,
        zorder_cols: list[str] | None = None,
        max_records_per_file: int | None = None,
        max_retries: int = 20,
    ) -> int:
        """OPTIMIZE [ZORDER BY]: rewrite the live table (deletion vectors
        and insert store folded away) as a fresh full snapshot — Z-order
        clustered when ``zorder_cols`` is given, plain coalesced layout
        otherwise — and publish it through the same conflict-checked
        commit. Readers never see a moving path; old versions stay for
        time travel until ``expire_versions``."""
        cur = self.latest_version()
        if cur is None:
            raise ValueError(f"empty table {self.root}")
        df = self.read(cur)
        stage = os.path.join(self.root, f".stage-{uuid.uuid4().hex}")
        if zorder_cols:
            zorder_layout(
                df, zorder_cols, stage, max_records_per_file=max_records_per_file
            )
        else:
            writer = df.coalesce(max(df.rdd.getNumPartitions() // 4, 1)).write.mode(
                "errorifexists"
            )
            if max_records_per_file:
                writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
            writer.parquet(stage)
        return self._publish(stage, expected_latest=cur, max_retries=max_retries)

    def build_manifest(
        self, columns: list[str], version: int | None = None
    ) -> DataFrame:
        """Per-data-file min/max/count stats for a FULL-SNAPSHOT version —
        the Iceberg/Delta data-skipping manifest. One aggregate over the
        snapshot grouped by ``_metadata.file_path`` (map-side combined, one
        output row per file); persisted under ``_manifest/v=N`` so readers
        prune from file-count-sized metadata instead of rescanning. The
        manifest is derived state: rebuildable at any time, not part of the
        commit protocol. Tight stats need clustered layout — run
        ``optimize(zorder_cols=...)`` first; merge-on-read versions must be
        compacted before stats can describe their files."""
        v = self._require_version(
            self.latest_version() if version is None else version
        )
        base, dv, ins = self._resolve(v)
        if dv is not None or ins is not None:
            raise ValueError(
                "build_manifest needs a full snapshot; run optimize() first"
            )
        df = self._read_dir(os.path.join(self.root, f"v={base}"))
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in columns:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        man = (
            df.select(F.col("_metadata.file_path").alias("file_path"), *columns)
            .groupBy("file_path")
            .agg(*aggs)
        )
        out = os.path.join(self.root, "_manifest", f"v={v}")
        man.write.mode("overwrite").parquet(out)
        return self.spark.read.parquet(out)

    def read_pruned(
        self, column: str, lo, hi, version: int | None = None
    ) -> DataFrame:
        """Read only the data files whose [min, max] envelope intersects
        [lo, hi], per the persisted manifest, then apply the predicate.
        The planner-side file listing is manifest-sized (one row per data
        file) — at 100 TB this is the catalog lookup that turns a
        full-table scan into a handful of files; the residual filter still
        reaches the parquet reader as a pushed predicate."""
        v = self._require_version(
            self.latest_version() if version is None else version
        )
        man_path = os.path.join(self.root, "_manifest", f"v={v}")
        if not os.path.exists(man_path):
            raise ValueError(
                f"no manifest for v={v}; call build_manifest(['{column}'])"
            )
        man = self.spark.read.parquet(man_path)
        if f"min_{column}" not in man.columns:
            raise ValueError(f"manifest has no stats for column {column!r}")
        files = [
            r["file_path"]
            for r in man.filter(
                (F.col(f"max_{column}") >= lo) & (F.col(f"min_{column}") <= hi)
            ).collect()
        ]
        pred = F.col(column).between(lo, hi)
        if not files:
            return self.read(v).filter(pred).limit(0)
        return self.spark.read.parquet(*files).filter(pred)

    def build_bloom_index(
        self, column: str, fpp: float = 0.01, version: int | None = None
    ) -> DataFrame:
        """Per-data-file BLOOM FILTER index over a long-valued column (the
        Delta bloom-filter-index / Parquet bloom analogue): min/max manifests
        prune RANGE predicates but are useless for point lookups on
        high-cardinality unclustered keys — any file's [min, max] spans the
        probe. A per-file bloom answers "might this file contain k?" in
        file-count-sized metadata with fpp false positives.

        Distributed build: executors emit (file_path, bit position) pairs
        (vectorized double hashing, operators/bloom.py), the per-file
        DISTINCT positions shuffle once, and each file's bitmap packs inside
        one Arrow group — the driver never sees row-proportional data.
        Derived state like the manifest: rebuildable, not part of the commit
        protocol; persisted under ``_bloom/v=N_col=<column>``."""
        from realestatedeals_spark.operators.bloom import _positions, sizing

        v = self.latest_version() if version is None else version
        if v is None or v not in self.versions():
            raise ValueError(f"no such version {version!r} in {self.root}")
        base, dv, ins = self._resolve(v)
        if dv is not None or ins is not None:
            raise ValueError(
                "build_bloom_index needs a full snapshot; run optimize() first"
            )
        df = self._read_dir(os.path.join(self.root, f"v={base}"))
        per_file = int(
            df.groupBy(F.col("_metadata.file_path"))
            .count()
            .agg(F.max("count"))
            .first()[0]
            or 1
        )
        n_bits, k = sizing(per_file, fpp)
        blooms = self._file_blooms(df, column, n_bits, k)
        out = os.path.join(self.root, "_bloom", f"v={v}_col={column}")
        blooms.write.mode("overwrite").parquet(out)
        return self.spark.read.parquet(out)

    def _file_blooms(
        self, df: DataFrame, column: str, n_bits: int, k: int
    ) -> DataFrame:
        """One packed per-file bloom row per data file of ``df``."""
        from realestatedeals_spark.operators.bloom import _positions

        @F.pandas_udf("array<long>")
        def pos_udf(vals: pd.Series) -> pd.Series:
            import numpy as np

            p = _positions(vals.to_numpy(dtype=np.int64), n_bits, k)
            return pd.Series(list(p))

        def pack(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            bits = np.zeros(n_bits, dtype=bool)
            bits[pdf["pos"].to_numpy(dtype=np.int64)] = True
            return pd.DataFrame(
                {
                    "file_path": [pdf["file_path"].iloc[0]],
                    "n_bits": [n_bits],
                    "k": [k],
                    "bitmap": [np.packbits(bits, bitorder="little").tobytes()],
                }
            )

        # NULL keys are never admitted by the index: a NULL would become NaN
        # in the int64 conversion and blow up the UDF untyped, and the
        # equality predicate read_point pushes (col == value) can never match
        # a NULL row anyway — so dropping them is both safe and semantically
        # exact for point lookups.
        return (
            df.filter(F.col(column).isNotNull())
            .select(
                F.col("_metadata.file_path").alias("file_path"),
                F.explode(pos_udf(F.col(column).cast("long"))).alias("pos"),
            )
            .distinct()
            .groupBy("file_path")
            .applyInPandas(pack, "file_path string, n_bits long, k long, bitmap binary")
        )

    def update_bloom_index(
        self, column: str, fpp: float = 0.01, version: int | None = None
    ) -> DataFrame:
        """INCREMENTAL bloom-index maintenance: for a merge-on-read version,
        only the (rewritten-cumulative, batch-sized) insert store gets new
        blooms — the base files' entries copy over unchanged, so index
        upkeep costs O(new data), not O(table). Deletions never need index
        work: a deleted key admitting its old file is just one more false
        positive, and ``read_point`` applies the deletion vector. Full
        snapshots fall back to a full build (everything rewrote)."""
        v = self.latest_version() if version is None else version
        if v is None or v not in self.versions():
            raise ValueError(f"no such version {version!r} in {self.root}")
        base, dv, ins = self._resolve(v)
        if dv is None:
            return self.build_bloom_index(column, fpp, v)
        base_idx_path = os.path.join(self.root, "_bloom", f"v={base}_col={column}")
        if not os.path.exists(base_idx_path):
            raise ValueError(
                f"no bloom index for base v={base}; build_bloom_index there first"
            )
        base_idx = self.spark.read.parquet(base_idx_path)
        first = base_idx.first()
        n_bits, k = int(first["n_bits"]), int(first["k"])
        parts = [base_idx]
        if ins is not None:
            ins_files = self.spark.read.parquet(
                os.path.join(self.root, f"v={v}", "_ins")
            )
            parts.append(self._file_blooms(ins_files, column, n_bits, k))
        combined = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        out = os.path.join(self.root, "_bloom", f"v={v}_col={column}")
        combined.write.mode("overwrite").parquet(out)
        return self.spark.read.parquet(out)

    def bloom_pruned_files(
        self, column: str, value: int, version: int | None = None
    ) -> list[str]:
        """Data files whose bloom says MIGHT contain ``value`` — the
        file-count-sized driver-side probe behind ``read_point``."""
        import numpy as np

        from realestatedeals_spark.operators.bloom import _positions

        v = self._require_version(
            self.latest_version() if version is None else version
        )
        path = os.path.join(self.root, "_bloom", f"v={v}_col={column}")
        if not os.path.exists(path):
            raise ValueError(
                f"no bloom index for v={v} col={column}; call build_bloom_index"
            )
        rows = self.spark.read.parquet(path).collect()
        keep = []
        for r in rows:
            p = _positions(np.array([value], dtype=np.int64), r.n_bits, r.k)[0]
            bm = np.frombuffer(bytes(r.bitmap), dtype=np.uint8)
            if ((bm[p >> 3] >> (p & 7).astype(np.uint8)) & 1).all():
                keep.append(r.file_path)
        return keep

    def read_point(
        self, column: str, value: int, version: int | None = None
    ) -> DataFrame:
        """Point lookup through the bloom index: open only the files whose
        bloom admits ``value`` (expected ≈ files-that-contain-it + fpp ×
        others), with the equality predicate still pushed to the reader.
        Exact regardless of pruning: blooms have no false negatives. On a
        merge-on-read version, admitted BASE files are read through the
        deletion vector and admitted INSERT-store files directly — same
        row set the full MoR read produces for this key."""
        files = self.bloom_pruned_files(column, value, version)
        pred = F.col(column) == value
        v = self.latest_version() if version is None else version
        if not files:
            return self.read(v).filter(pred).limit(0)
        base, dv, _ins = self._resolve(v)
        if dv is None:
            return self.spark.read.parquet(*files).filter(pred)
        cols = self.read(v).columns
        base_files = [f for f in files if "/_ins/" not in f]
        ins_files = [f for f in files if "/_ins/" in f]
        parts = []
        if base_files:
            live = self.spark.read.parquet(*base_files).select(
                "*",
                F.col("_metadata.file_path").alias("__file"),
                F.col("_metadata.row_index").alias("__pos"),
            )
            live = live.join(
                dv,
                (F.col("__file") == F.col("file_path"))
                & (F.col("__pos") == F.col("row_index")),
                "left_anti",
            ).drop("__file", "__pos")
            parts.append(live)
        if ins_files:
            parts.append(self.spark.read.parquet(*ins_files))
        # After schema evolution the insert store and the base snapshot may
        # carry different column sets (read() tolerates that via
        # unionByName(allowMissingColumns=True)); a strict select(*cols) on
        # each side would raise AnalysisException for the missing columns.
        # Mirror read(): select what each side HAS, union allowing missing,
        # then null-fill anything still absent so the output schema matches
        # read(v) exactly.
        parts = [p.select(*[c for c in cols if c in p.columns]) for p in parts]
        out = parts[0]
        for extra in parts[1:]:
            out = out.unionByName(extra, allowMissingColumns=True)
        # Null-fill with the column's TYPE from the full read's schema — a
        # bare lit(None) is NullType (void), which diverges from read(v)'s
        # typed schema and breaks downstream unions/writes when a column is
        # absent from every bloom-admitted part.
        read_schema = {f.name: f.dataType for f in self.read(v).schema.fields}
        for c in cols:
            if c not in out.columns:
                out = out.withColumn(c, F.lit(None).cast(read_schema[c]))
        return out.select(*cols).filter(pred)

    def referenced_bases(self) -> set[int]:
        """Full-snapshot versions some merge-on-read version points at."""
        out = set()
        for v in self.versions():
            base_file = os.path.join(self.root, f"v={v}", "_base")
            if os.path.exists(base_file):
                with open(base_file) as fh:
                    out.add(int(fh.read().strip()))
        return out

    def expire_versions(
        self, keep_last: int = 1, protect: set[int] | None = None
    ) -> list[int]:
        """Retention cleanup: drop all but the newest ``keep_last``
        versions — EXCEPT full snapshots still referenced as the base of a
        surviving merge-on-read version (dropping those would corrupt
        every DV read against them; the Iceberg expire-snapshots hazard),
        except anything in ``protect`` (a multi-table catalog passes
        its pinned versions here — io/catalog.py), and except versions
        under an ACTIVE SCAN LEASE (``scan()``). Retention contract: a
        leased version is never reclaimed, so a leased reader can run as
        long as it likes; an un-leased reader racing this pass gets the
        typed ``StaleVersionError`` from its next read call (a lazy plan
        already handed out may fail inside Spark's scan — the lease
        exists precisely so long scans opt out of that race). Returns the
        versions actually removed."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.versions()
        keep = (
            set(vs[-keep_last:])
            | (set(protect) if protect else set())
            | self.leased_versions()
        )
        keep &= set(vs)
        # transitively protect bases of anything kept
        protected = set(keep)
        for v in keep:
            base_file = os.path.join(self.root, f"v={v}", "_base")
            if os.path.exists(base_file):
                with open(base_file) as fh:
                    protected.add(int(fh.read().strip()))
        removed = []
        for v in vs:
            if v not in protected:
                shutil.rmtree(os.path.join(self.root, f"v={v}"))
                removed.append(v)
        return removed

    def vacuum_stages(self) -> int:
        """Remove leftover ``.stage-*`` directories from crashed writers."""
        n = 0
        for d in os.listdir(self.root):
            if d.startswith(".stage-"):
                shutil.rmtree(os.path.join(self.root, d))
                n += 1
        return n


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    out_path: str,
    bits_per_col: int = 8,
    max_records_per_file: int | None = None,
) -> dict:
    """Rewrite ``df`` clustered on a Z-order (Morton) curve over ``cols`` —
    the multi-dimensional file-layout optimization behind Delta/Iceberg
    ``OPTIMIZE ZORDER BY``: after the rewrite, every output file covers a
    small hyper-rectangle of the key space, so parquet min/max stats prune
    most files for predicates on ANY prefix-free subset of the dimensions
    (a plain sort only prunes its leading column).

    Spark-first construction, no UDFs:
    1. approxQuantile computes 2^bits_per_col bucket boundaries per column
       (one pass, driver holds only the tiny boundary arrays);
    2. width_bucket maps each value to its quantile rank JVM-side —
       rank-based, so skewed/arbitrary-unit columns interleave fairly;
    3. bit-interleave the ranks with shiftleft/bitwiseOR column expressions
       (whole-stage codegen, bits_per_col × n_cols terms);
    4. repartitionByRange on the z-value (range shuffle = the only
       exchange) and sortWithinPartitions before the write, so file
       boundaries follow the curve.

    Returns {files, z_col_bits, boundaries} for observability. At 100 TB
    this runs per-partition of a table as an OPTIMIZE job; readers need no
    changes — pruning comes from ordinary parquet stats.
    """
    n_buckets = 1 << bits_per_col
    probes = [float(q) / n_buckets for q in range(1, n_buckets)]
    ranks = []
    for c in cols:
        cuts = df.stat.approxQuantile(c, probes, 0.001)
        # width_bucket needs strictly ascending bounds; dedupe ties from
        # heavy-hitter values (rank collapses are fine for clustering)
        uniq: list[float] = []
        for b in cuts:
            if not uniq or b > uniq[-1]:
                uniq.append(b)
        # quantile rank = #boundaries below the value — a fold over the
        # (≤255-element) literal boundary array, all JVM-side; Spark's
        # width_bucket is uniform-width only, so it can't express this
        boundaries = F.array(*[F.lit(float(b)) for b in uniq])
        ranks.append(
            F.aggregate(
                boundaries,
                F.lit(0).cast("long"),
                lambda acc, b: acc
                + F.when(F.col(c).cast("double") > b, 1).otherwise(0).cast("long"),
            )
        )
    z = F.lit(0).cast("long")
    for bit in range(bits_per_col):
        for ci, r in enumerate(ranks):
            pos = bit * len(ranks) + ci
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(r, bit).bitwiseAND(F.lit(1)), pos)
            )
    zdf = df.withColumn("_z", z)
    writer = (
        zdf.repartitionByRange(max(df.rdd.getNumPartitions(), 1), "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("errorifexists")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(out_path)
    files = _data_files(out_path)
    return {
        "files": len(files),
        "z_col_bits": bits_per_col * len(cols),
        "cols": list(cols),
    }


def parquet_prunable_files(
    path: str, predicates: dict[str, tuple[float, float]]
) -> dict:
    """Count data files whose parquet column min/max statistics EXCLUDE a
    conjunctive range predicate {col: (lo, hi)} — the file-skipping a
    stats-aware reader (Spark parquet filter pushdown, Delta data
    skipping) gets for free. Driver-side metadata walk only; no data read."""
    import pyarrow.parquet as pq

    total = pruned = 0
    for f in _data_files(path):
        md = pq.ParquetFile(f).metadata
        mins: dict[str, float] = {}
        maxs: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i in range(g.num_columns):
                col = g.column(i)
                name = col.path_in_schema
                if name in predicates and col.statistics is not None:
                    st = col.statistics
                    mins[name] = min(mins.get(name, st.min), st.min)
                    maxs[name] = max(maxs.get(name, st.max), st.max)
        total += 1
        for c, (lo, hi) in predicates.items():
            if c in mins and (maxs[c] < lo or mins[c] > hi):
                pruned += 1
                break
    return {"total_files": total, "pruned_files": pruned}
