"""Versioned snapshot store: a minimal manifest-based table format over
immutable parquet files — atomic commits, consistent reads while writers
append, time travel by version.

The reference's stores (CouchDB mirror db, filesystem artifact tree)
expose readers to half-written state; docs/SCALE.md flags the same gap in
plain parquet-dir sinks (a reader listing a directory mid-append sees a
torn table). Real deployments reach for Delta/Iceberg/Hudi; this is the
load-bearing 20% of that idea with zero dependencies:

- Data files are IMMUTABLE: each commit writes its rows under a fresh
  ``data/b<nnnnn>/`` subdir and never touches prior files.
- A manifest (``_manifests/v<nnnnn>.json``) lists every file of a
  version: the new files plus everything the previous manifest held.
- ``_LATEST`` is a one-line pointer swapped with ``os.replace`` — the
  POSIX-atomic rename, same guarantee the artifact store's GC swap uses.
  A reader resolves the pointer ONCE, then reads only files that
  manifest names: commits landing meanwhile are simply invisible, never
  torn. Any crash before the pointer swap leaves at worst orphaned data
  files that no manifest references (harmless; vacuum() removes them).

At 100 TB the manifest would hold file-level stats (min/max per column)
for pruning and live on an object store with a CAS swap — the layout and
commit protocol here are exactly that shape.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "_manifests")
        self.latest_ptr = os.path.join(root, "_LATEST")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- versions ---------------------------------------------------------

    def latest_version(self) -> int:
        """0 = empty store; versions are 1-based."""
        if not os.path.exists(self.latest_ptr):
            return 0
        with open(self.latest_ptr) as f:
            return int(f.read().strip())

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.manifest_dir, f"v{version:05d}.json")

    def _manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    # -- write ------------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        token: str | int | None = None,
        replace: bool = False,
    ) -> int:
        """Commit ``df`` as a new atomic version; returns the version.

        ``replace=False`` (default) APPENDS: the new manifest lists the
        previous version's files plus the new ones — the table grows, the
        sink contract for incremental pipelines. ``replace=True`` makes
        the version a FULL REPLACEMENT: the manifest lists only the new
        files, while every older version stays readable via time travel —
        the contract for corpus releases, where each version IS the whole
        corpus and appending would duplicate unchanged documents.

        ``token`` makes the commit IDEMPOTENT for streaming foreachBatch:
        pass the micro-batch id, and a checkpoint-replayed batch whose
        token matches the last committed one is skipped instead of
        double-committed — the standard transactional-sink contract
        (exactly-once on top of Spark's at-least-once replay).
        """
        prev = self.latest_version()
        if token is not None and prev:
            if self._manifest(prev).get("token") == str(token):
                return prev
        batch_dir = os.path.join(
            self.data_dir, f"b{prev + 1:05d}-{uuid.uuid4().hex[:8]}"
        )
        df.write.mode("error").parquet(batch_dir)
        new_files = sorted(
            os.path.join(batch_dir, f)
            for f in os.listdir(batch_dir)
            if f.endswith(".parquet")
        )
        carried = [] if replace else (self._manifest(prev)["files"] if prev else [])
        files = carried + new_files
        version = prev + 1
        mpath = self._manifest_path(version)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": version,
                    "files": files,
                    "token": None if token is None else str(token),
                },
                f,
            )
        os.replace(tmp, mpath)
        # the commit point: readers see the new version only after this
        ptmp = self.latest_ptr + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(ptmp, "w") as f:
            f.write(str(version))
        os.replace(ptmp, self.latest_ptr)
        return version

    # -- read -------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """The table at ``version`` (default: latest). The file list is
        resolved from the manifest NOW; later commits don't affect the
        returned DataFrame."""
        v = self.latest_version() if version is None else version
        if v == 0:
            raise FileNotFoundError(f"snapshot store {self.root} is empty")
        files = self._manifest(v)["files"]
        return self.spark.read.parquet(*files)

    # -- maintenance ------------------------------------------------------

    def expire_versions(
        self, keep_last: int = 1, min_age_seconds: float = 24 * 3600.0
    ) -> dict:
        """Retire time travel older than the newest ``keep_last``
        versions (Delta's ``VACUUM``-with-retention / Iceberg's
        ``expireSnapshots``): delete the expired manifests, then reclaim
        data files that NO surviving manifest references.

        Append-mode tables reclaim nothing (every old file is carried
        forward by the surviving manifests — expiry only removes the
        ability to time-travel); replace-mode release tables reclaim
        each expired release's whole payload. File deletion delegates to
        :meth:`vacuum`, so the same ``min_age_seconds`` concurrent-writer
        guard applies. Returns {"versions_removed": [...],
        "files_removed": [...]}.
        """
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        latest = self.latest_version()
        removed_versions = []
        for v in range(1, latest - keep_last + 1):
            p = self._manifest_path(v)
            if os.path.exists(p):
                os.remove(p)
                removed_versions.append(v)
        # vacuum UNCONDITIONALLY (review finding): a crash between a
        # previous call's manifest deletion and its vacuum leaves
        # expired files that a re-run would otherwise never reclaim —
        # vacuum only removes unreferenced, aged files, so it is safe
        removed_files = self.vacuum(min_age_seconds)
        return {
            "versions_removed": removed_versions,
            "files_removed": removed_files,
        }

    def vacuum(self, min_age_seconds: float = 24 * 3600.0) -> list[str]:
        """Delete orphaned data files no manifest references (crashed
        commits); returns what was removed.

        An unreferenced file is NOT necessarily garbage: a concurrent
        writer mid-:meth:`commit` has written its ``data/`` files but not
        yet its manifest — deleting them here would corrupt the version it
        is about to publish. Instead of assuming a single writer, vacuum
        keeps any unreferenced file younger than ``min_age_seconds``
        (default 24 h, the same retention idea as Delta's ``VACUUM ...
        RETAIN``): an in-flight commit's files are always recent, while a
        crashed commit's files age past any plausible write duration.
        Pass ``0`` only when no writer can be active.
        """
        import time

        referenced: set[str] = set()
        for name in os.listdir(self.manifest_dir):
            if name.endswith(".json"):
                with open(os.path.join(self.manifest_dir, name)) as f:
                    referenced.update(json.load(f)["files"])
        now = time.time()
        removed = []
        for sub in os.listdir(self.data_dir):
            subdir = os.path.join(self.data_dir, sub)
            for fname in os.listdir(subdir):
                p = os.path.join(subdir, fname)
                if (
                    fname.endswith(".parquet")
                    and p not in referenced
                    and now - os.path.getmtime(p) >= min_age_seconds
                ):
                    os.remove(p)
                    removed.append(p)
            if not os.listdir(subdir):
                os.rmdir(subdir)
        return removed
