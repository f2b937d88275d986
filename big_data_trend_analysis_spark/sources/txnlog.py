"""Manifest-based parquet transaction log — the commit-log mechanic the
lakehouse trio was missing.

``merge_roundtrip`` (copy-on-write rewrite), ``mor_read_view`` (merge-
on-read) and ``compact_small_files`` demonstrate the table-format DATA
mechanics in stock parquet; what they lack (docs/ROADMAP.md round-7
delta) is the TRANSACTION LOG: an atomic, versioned record of which
files constitute each table snapshot. Without it, readers discover
files by directory listing — so a concurrent rewrite is visible
half-applied (old and new files listed together: rows double-counted)
and there is no time travel. This module supplies the log, Delta-style
(Armbrust et al., "Delta Lake: High-Performance ACID Table Storage over
Cloud Object Stores", VLDB 2020 — public paper), reduced to its
load-bearing core:

- ``_txnlog/v{N}.json`` holds the COMPLETE file list of snapshot N
  (the shape of Delta's checkpoint files; production Delta interleaves
  JSON deltas with periodic checkpoints — at the manifest sizes here,
  every commit is its own checkpoint) plus the add/remove delta for
  audit.
- **Atomic commit with optimistic concurrency**: the manifest is
  staged to a temp file and published with ``os.link`` — a POSIX
  create-exclusive: if another writer already committed version N the
  link fails and the loser rebases (exactly Delta's mutual-exclusion
  contract on the log object; on S3 this is a put-if-absent).
  Readers see version N fully or not at all — never a partial file
  list.
- **Snapshot isolation / time travel**: a reader pins a version and
  reads exactly that manifest's files. Files removed by a later
  rewrite remain on disk (until a vacuum) but are invisible to the
  pinned snapshot — and stale files from SUPERSEDED versions are
  invisible to the latest one, which is the property the gate query
  proves (a directory-listing read would double-count them).

Scale posture: manifests are O(files) KB-sized JSON handled on the
driver — the same driver-side-commit-log role Delta's log plays; data
files never move through the driver. Readers hand Spark the explicit
file list (what Delta's file index does), so planning cost is
O(manifest), not O(directory listing).
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

#: Subdirectories: versioned manifests, and per-commit data file sets.
LOG_DIR = "_txnlog"
DATA_DIR = "data"


class TxnLog:
    """Versioned manifest log over a directory of parquet data files."""

    def __init__(self, root: str):
        self.root = root
        self.log_path = os.path.join(root, LOG_DIR)
        os.makedirs(self.log_path, exist_ok=True)

    # -- log inspection -------------------------------------------------

    def _manifest_file(self, version: int) -> str:
        return os.path.join(self.log_path, f"v{version}.json")

    #: Committed manifests are EXACTLY ``v<int>.json`` — anything else
    #: in the log dir (staged temp files, editor artifacts, checkpoint
    #: sidecars) must be ignored, not parsed.
    _MANIFEST_RE = re.compile(r"^v(\d+)\.json$")

    def latest_version(self) -> int:
        """Highest committed version, or -1 for an empty log."""
        versions = [
            int(m.group(1))
            for name in os.listdir(self.log_path)
            if (m := self._MANIFEST_RE.match(name))
        ]
        return max(versions, default=-1)

    def manifest(self, version: int) -> dict:
        with open(self._manifest_file(version)) as f:
            return json.load(f)

    def snapshot_files(self, version: int | None = None) -> list[str]:
        """Absolute paths of the files constituting a snapshot
        (``None`` = latest)."""
        if version is None:
            version = self.latest_version()
        if version < 0:
            return []
        return [
            os.path.join(self.root, rel)
            for rel in self.manifest(version)["files"]
        ]

    # -- commit ---------------------------------------------------------

    def commit(
        self,
        add: list[str],
        remove: list[str] = (),
        expected_version: int | None = None,
    ) -> int:
        """Publish snapshot ``expected_version + 1`` atomically.

        ``add``/``remove`` are root-relative file paths. The new
        manifest's file list is the parent snapshot's minus ``remove``
        plus ``add``. Raises ``FileExistsError`` if another writer
        committed the same version first (optimistic-concurrency
        loser: re-read and rebase).
        """
        if expected_version is None:
            expected_version = self.latest_version()
        version = expected_version + 1
        prev = (
            self.manifest(expected_version)["files"]
            if expected_version >= 0
            else []
        )
        removed = set(remove)
        missing = removed - set(prev)
        if missing:
            raise ValueError(f"cannot remove files not in snapshot: {missing}")
        files = [f for f in prev if f not in removed] + list(add)
        body = {
            "version": version,
            "files": files,
            "added": list(add),
            "removed": sorted(removed),
        }
        staged = os.path.join(self.log_path, f".tmp-{uuid.uuid4().hex}.json")
        with open(staged, "w") as f:
            json.dump(body, f)
        try:
            # POSIX create-exclusive: the atomic CAS on the version slot.
            os.link(staged, self._manifest_file(version))
        finally:
            os.unlink(staged)
        return version

    def write_commit(
        self,
        df: DataFrame,
        remove: list[str] = (),
        n_files: int = 1,
        expected_version: int | None = None,
    ) -> int:
        """Land ``df`` as a new file set and commit it in one step.

        The data files go to a fresh per-commit directory (never
        overwriting a live file — commits only ever ADD paths, the
        manifest decides liveness), then the manifest publishes them
        together with the ``remove`` list.

        ``expected_version`` pins the optimistic-concurrency CAS: pass
        the version the caller READ before computing ``df`` so a
        concurrent commit surfaces as ``FileExistsError`` (rebase and
        retry) instead of silently stacking on top of a peer's append
        — a lost update. Defaults to latest-at-entry, which is only
        safe single-writer.
        """
        if expected_version is None:
            expected_version = self.latest_version()
        commit_id = uuid.uuid4().hex[:12]
        rel_dir = os.path.join(DATA_DIR, f"c{commit_id}")
        out = os.path.join(self.root, rel_dir)
        df.repartition(n_files).write.mode("error").parquet(out)
        add = sorted(
            os.path.join(rel_dir, name)
            for name in os.listdir(out)
            if name.endswith(".parquet")
        )
        return self.commit(
            add=add, remove=remove, expected_version=expected_version
        )

    # -- read -----------------------------------------------------------

    def read_snapshot(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """Read a pinned snapshot: exactly the manifest's file list —
        stale/superseded files on disk are never touched."""
        files = self.snapshot_files(version)
        if not files:
            raise ValueError("empty transaction log")
        return spark.read.parquet(*files)
