"""Multi-table atomic commits: a catalog layer over ``VersionedTable``.

Single-table versioning (io/maintenance.py) gives each table its own
linear history, but a pipeline that updates TWO tables (facts + the
aggregate view, postings + the doc store) needs readers to never observe
one side without the other. The catalog fixes the torn-pair problem the
way Nessie/Iceberg-REST do: table data publishes first (each updated
table gets a new version in its own history), then ONE catalog version —
a json mapping {table_name: pinned_version} — publishes atomically.
Readers resolve a catalog version and time-travel every table to its
pinned version, so a crash between table publish and catalog publish
strands only unreferenced table versions (garbage, never torn state), and
a reader holding catalog vN keeps a consistent multi-table snapshot while
writers advance.

Publish protocol: the version MANIFEST ITSELF is the claim. The writer
stages v=N.json content to a temp file and ``os.link``s it to the final
name — link fails with EEXIST iff v=N already exists, making claim and
publish one atomic conditional PUT (the direct POSIX analogue of S3
``If-None-Match: *`` on the manifest object, which is how this maps to
object storage). Unlike a separate claim marker, there is no window where
a version number is claimed but its content unreadable — so a successor
ALWAYS merges its predecessor's pins, and blind concurrent commits
serialize without lost updates. ``expected_latest`` adds compare-and-swap
semantics for read-modify-write transactions: a lost race raises
``CommitConflict`` (no silent retry) so the caller recomputes from fresh
state.

Retention note: ``VersionedTable.expire_versions`` on a member table must
keep every version some catalog version still references —
``referenced_table_versions`` exposes the pin set for exactly that check.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from realestatedeals_spark.io.maintenance import CommitConflict, VersionedTable


class Catalog:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        self._cat_dir = os.path.join(root, "_catalog")
        os.makedirs(self._cat_dir, exist_ok=True)

    # -- table access ------------------------------------------------------
    def table(self, name: str) -> VersionedTable:
        return VersionedTable(self.spark, os.path.join(self.root, name))

    # -- catalog versions --------------------------------------------------
    def versions(self) -> list[int]:
        out = []
        for f in os.listdir(self._cat_dir):
            if f.startswith("v=") and f.endswith(".json"):
                mid = f[2:-5]
                if mid.isdigit():
                    out.append(int(mid))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self._cat_dir, f"v={version}.json")) as f:
            doc = json.load(f)
        # legacy manifests are a bare pin map; current ones nest under "pins"
        return doc if "pins" in doc else {"pins": doc, "epoch": None}

    def pins(self, version: int | None = None) -> dict[str, int]:
        """{table_name: pinned table version} for a catalog version."""
        v = self.latest_version() if version is None else version
        if v is None:
            return {}
        return {k: int(x) for k, x in self._manifest(v)["pins"].items()}

    def applied_epoch(self) -> int | None:
        """Epoch id recorded by the newest manifest (exactly-once streaming:
        a foreachBatch sink skips any batch whose epoch is <= this)."""
        v = self.latest_version()
        if v is None:
            return None
        e = self._manifest(v).get("epoch")
        return None if e is None else int(e)

    def referenced_table_versions(self, name: str) -> set[int]:
        """Every version of ``name`` some catalog version still pins —
        the set expire_versions must not drop."""
        return {
            pins[name]
            for v in self.versions()
            for pins in [self.pins(v)]
            if name in pins
        }

    # -- transactions ------------------------------------------------------
    def commit(
        self,
        updates: dict[str, DataFrame],
        expected_latest: int | None = None,
        max_retries: int = 50,
        epoch: int | None = None,
    ) -> int:
        """Atomically publish new snapshots of every table in ``updates``.

        Phase 1 (no atomicity needed): each table commits its data through
        its own versioned history — these versions exist but are invisible
        until a catalog version references them. Phase 2: merge the
        CURRENT latest manifest's pins with the new ones and conditionally
        publish v=latest+1 (atomic link; see module docstring). A blind
        commit that loses the publish race re-reads the winner's pins and
        retries — no update can be lost because every published manifest
        was derived from the manifest immediately before it."""
        new_pins: dict[str, int] = {}
        for name, df in updates.items():
            new_pins[name] = self.table(name).commit(df)

        for _ in range(max_retries):
            latest = self.latest_version()
            if expected_latest is not None and latest != expected_latest:
                raise CommitConflict(
                    f"catalog moved: expected latest {expected_latest}, saw {latest}"
                )
            target = (latest if latest is not None else 0) + 1
            pins = self.pins(latest) if latest is not None else {}
            pins.update(new_pins)
            fd, tmp = tempfile.mkstemp(
                dir=self._cat_dir, prefix=f".v{target}-", suffix=".tmp"
            )
            with os.fdopen(fd, "w") as f:
                json.dump({"pins": pins, "epoch": epoch}, f, sort_keys=True)
            final = os.path.join(self._cat_dir, f"v={target}.json")
            try:
                os.link(tmp, final)  # atomic conditional publish (EEXIST = lost)
                return target
            except FileExistsError:
                if expected_latest is not None:
                    raise CommitConflict(
                        f"catalog v={target} published concurrently"
                    ) from None
                continue  # blind commit: merge the winner's pins and retry
            finally:
                os.unlink(tmp)
        raise CommitConflict(f"catalog commit lost {max_retries} publish races")

    def read(self, name: str, version: int | None = None) -> DataFrame:
        """Read table ``name`` AT THE VERSION pinned by a catalog version —
        never the table's unreferenced head."""
        pins = self.pins(version)
        if name not in pins:
            raise ValueError(f"table {name!r} not in catalog")
        return self.table(name).read(pins[name])


    def expire(self, keep_last: int = 1) -> dict[str, list[int]]:
        """Retention across the whole catalog: drop all but the newest
        ``keep_last`` catalog manifests, then expire member-table versions
        that no SURVIVING manifest pins (each table also keeps its own
        head: an unreferenced head is a harmless in-flight phase-1
        version, not garbage to race with). Returns {table: removed}."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.versions()
        for v in vs[:-keep_last]:
            os.unlink(os.path.join(self._cat_dir, f"v={v}.json"))
        tables = {name for v in self.versions() for name in self.pins(v)}
        removed: dict[str, list[int]] = {}
        for name in sorted(tables):
            t = self.table(name)
            removed[name] = t.expire_versions(
                keep_last=1, protect=self.referenced_table_versions(name)
            )
        return removed
