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
        versions = self._versions()
        return max(versions, default=-1)

    def earliest_version(self) -> int:
        """Lowest still-readable version (vacuum compacts the chain
        from the front), or -1 for an empty log."""
        versions = self._versions()
        return min(versions, default=-1)

    def _versions(self) -> list[int]:
        return [
            int(m.group(1))
            for name in os.listdir(self.log_path)
            if (m := self._MANIFEST_RE.match(name))
        ]

    def manifest(self, version: int) -> dict:
        try:
            with open(self._manifest_file(version)) as f:
                return json.load(f)
        except FileNotFoundError:
            earliest = self.earliest_version()
            raise ValueError(
                f"version {version} is not in the transaction log "
                f"(vacuumed or never committed); readable range is "
                f"[{earliest}, {self.latest_version()}]"
            ) from None

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
        schema_json: str | None = None,
    ) -> int:
        """Publish snapshot ``expected_version + 1`` atomically.

        ``add``/``remove`` are root-relative file paths. The new
        manifest's file list is the parent snapshot's minus ``remove``
        plus ``add``. Raises ``FileExistsError`` if another writer
        committed the same version first (optimistic-concurrency
        loser: re-read and rebase).

        ``schema_json`` (a StructType JSON) makes the schema part of
        the SAME atomic commit — Delta's metadata-update mechanic: a
        column add lands with the first files that carry it, readers
        of version N use version N's schema (older files surface the
        new column as null), and pre-evolution versions keep reading
        under THEIR pinned schema. ``None`` inherits the parent's.
        """
        if expected_version is None:
            expected_version = self.latest_version()
        version = expected_version + 1
        parent = (
            self.manifest(expected_version) if expected_version >= 0 else None
        )
        prev = parent["files"] if parent else []
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
            "schema": schema_json
            if schema_json is not None
            else (parent.get("schema") if parent else None),
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
            add=add,
            remove=remove,
            expected_version=expected_version,
            schema_json=df.schema.json(),
        )

    # -- read -----------------------------------------------------------

    def read_snapshot(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """Read a pinned snapshot: exactly the manifest's file list —
        stale/superseded files on disk are never touched.

        If the manifest pins a schema (any ``write_commit`` since the
        log was created does), the read uses THAT version's schema:
        files written before a column-add commit surface the added
        column as null, and a pre-evolution version keeps ITS
        narrower schema — transactional schema evolution without
        mergeSchema's footer-union scan.
        """
        if version is None:
            version = self.latest_version()
        files = self.snapshot_files(version)
        if not files:
            raise ValueError("empty transaction log")
        schema_json = self.manifest(version).get("schema")
        reader = spark.read
        if schema_json:
            from pyspark.sql.types import StructType

            reader = reader.schema(StructType.fromJson(json.loads(schema_json)))
        return reader.parquet(*files)

    # -- maintenance ------------------------------------------------------

    def vacuum(self, retain_versions: int = 1) -> dict:
        """Age out unreferenced data files and compact the version
        chain (Delta VACUUM + log checkpointing, folded into one op
        since every manifest here is already a complete snapshot).

        Keeps the newest ``retain_versions`` manifests; any data file
        referenced by none of them is deleted, and older manifests are
        dropped — after which those versions are unreadable BY
        CONTRACT (``manifest()`` raises with the readable range). The
        latest snapshot's bytes are untouched: vacuum only ever
        removes files the retained manifests do not list. Driver-side
        O(retained manifests + directory listing), no data movement.
        """
        if retain_versions < 1:
            raise ValueError("retain_versions must be >= 1")
        latest = self.latest_version()
        if latest < 0:
            return {
                "data_files_removed": 0,
                "manifests_removed": 0,
                "earliest_retained": -1,
            }
        horizon = max(latest - retain_versions + 1, self.earliest_version())
        keep: set[str] = set()
        for v in range(horizon, latest + 1):
            keep |= set(self.manifest(v)["files"])
        data_root = os.path.join(self.root, DATA_DIR)
        files_removed = 0
        for dirpath, _, names in os.walk(data_root, topdown=False):
            for name in names:
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, self.root)
                if rel not in keep and name.endswith(".parquet"):
                    os.unlink(full)
                    files_removed += 1
            # drop commit dirs that now hold only write sidecars
            # (_SUCCESS/.crc); surviving dirs (any parquet left) and
            # the data root itself stay untouched
            rest = os.listdir(dirpath)
            if dirpath != data_root and all(
                os.path.isfile(os.path.join(dirpath, n))
                and not n.endswith(".parquet")
                for n in rest
            ):
                for n in rest:
                    os.unlink(os.path.join(dirpath, n))
                os.rmdir(dirpath)
        manifests_removed = 0
        for v in range(self.earliest_version(), horizon):
            try:
                os.unlink(self._manifest_file(v))
                manifests_removed += 1
            except FileNotFoundError:
                pass
        return {
            "data_files_removed": files_removed,
            "manifests_removed": manifests_removed,
            "earliest_retained": horizon,
        }

    # -- change data feed -------------------------------------------------

    def read_changes(
        self,
        spark: SparkSession,
        key_cols: list[str],
        from_version: int | None = None,
        to_version: int | None = None,
    ) -> DataFrame:
        """Delta-CDF-style change feed derived from the log itself.

        For each commit k in the range, reads ONLY that commit's
        added/removed file sets — O(touched files) per version, never
        O(snapshot) — and diffs them on ``key_cols``: a key only in
        the added side is an ``insert``, only in the removed side a
        ``delete``, in both with a different payload an ``update``
        (post-image emitted; deletes carry the pre-image). Rows a
        rewrite copied verbatim (same key, same payload on both
        sides) are no-ops and dropped, so the feed equals the
        semantic snapshot-k-vs-k-1 diff while never re-reading
        untouched files. Output columns: the table's columns plus
        ``_change_type`` and ``_commit_version`` — what a downstream
        incremental consumer (``upsert_scd1``/``merge_roundtrip``)
        subscribes to.
        """
        from pyspark.sql import functions as F

        lo = self.earliest_version() if from_version is None else from_version
        hi = self.latest_version() if to_version is None else to_version
        if lo < self.earliest_version() or hi > self.latest_version() or lo > hi:
            raise ValueError(
                f"change range [{lo}, {hi}] outside readable log range "
                f"[{self.earliest_version()}, {self.latest_version()}]"
            )

        def _read(rel_files: list[str], schema_json: str | None) -> DataFrame:
            reader = spark.read
            if schema_json:
                from pyspark.sql.types import StructType

                reader = reader.schema(
                    StructType.fromJson(json.loads(schema_json))
                )
            return reader.parquet(
                *[os.path.join(self.root, rel) for rel in rel_files]
            )

        parts: list[DataFrame] = []
        for v in range(lo, hi + 1):
            m = self.manifest(v)
            added, removed = m["added"], m["removed"]
            if not added and not removed:
                continue  # pure metadata commit
            schema_json = m.get("schema")
            ver = F.lit(v).alias("_commit_version")
            if not removed:
                df = _read(added, schema_json)
                parts.append(
                    df.select(
                        *df.columns,
                        F.lit("insert").alias("_change_type"),
                        ver,
                    )
                )
                continue
            if not added:
                df = _read(removed, schema_json)
                parts.append(
                    df.select(
                        *df.columns,
                        F.lit("delete").alias("_change_type"),
                        ver,
                    )
                )
                continue
            a_df = _read(added, schema_json)
            r_df = _read(removed, schema_json)
            payload = [c for c in a_df.columns if c not in key_cols]
            a_s = a_df.select(*key_cols, F.struct(*payload).alias("_after"))
            r_s = r_df.select(*key_cols, F.struct(*payload).alias("_before"))
            j = r_s.join(a_s, list(key_cols), "full_outer")
            op = (
                F.when(F.col("_before").isNull(), F.lit("insert"))
                .when(F.col("_after").isNull(), F.lit("delete"))
                .when(
                    ~F.col("_before").eqNullSafe(F.col("_after")),
                    F.lit("update"),
                )
            )
            img = F.coalesce(F.col("_after"), F.col("_before"))
            parts.append(
                j.select(
                    *key_cols,
                    *[img.getField(c).alias(c) for c in payload],
                    op.alias("_change_type"),
                    ver,
                ).filter(F.col("_change_type").isNotNull())
            )
        if not parts:
            raise ValueError("no data commits in the requested range")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
