"""Bloom-filter file skipping for the txn-log lakehouse layer.

Zone maps (``TxnLog.snapshot_files(range_filter=...)`` — the Iceberg
column-stats mechanic, in-gate via ``txnlog_stats_skipping``) prune
RANGE predicates, but they are useless for EQUALITY probes on columns
whose values interleave across files: every file's [min, max] covers
the probe. That is exactly the dictionary/bloom gap Parquet fills with
column bloom filters and Delta fills with bloom-filter indexes — a
per-file bit set that answers "is value v DEFINITELY ABSENT from this
file?" so point lookups skip files the zone map cannot.

Kept deliberately OUTSIDE ``TxnLog`` as a sidecar index (the Delta
bloom-index shape: an auxiliary structure, not a manifest field) —
the sidecar lives at ``<root>/_blooms/v<version>.json`` and composes
with any snapshot the log exposes.

Determinism: positions come from md5 over ``"<seed>:<value>"`` (the
engine's portable-hash convention — no JVM/Python hash involved), so
the same corpus always builds the same bit set and a pruning decision
replays bit-identically anywhere.

Scale posture: building a file's bloom is ONE column-pruned scan of
that file collapsing to its distinct probe-column values; files whose
distinct count exceeds ``max_distinct`` get NO bloom and are
conservatively kept by every probe (the superset guarantee — pruning
may only shrink the scan, never drop a row). Probing is driver-side
O(manifest), the same cost class as reading the manifest.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import SparkSession

from big_data_trend_analysis_spark.sources.txnlog import TxnLog

#: Default bloom geometry: 4096 bits / 3 hashes keeps the false-
#: positive rate < 1e-6 for the per-file cardinalities the sidecar
#: accepts, at 512 bytes per (file, column).
BLOOM_BITS = 4096
BLOOM_HASHES = 3

#: Per-file distinct-value ceiling: above this the bloom is skipped
#: (file conservatively kept) — the _BOUNDED_SAMPLE_MAX discipline,
#: so building the index never collects an unbounded relation.
BLOOM_MAX_DISTINCT = 100_000


def _positions(value, m_bits: int = BLOOM_BITS, k: int = BLOOM_HASHES):
    """The k deterministic bit positions of a value (md5-seeded)."""
    return [
        int(
            hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:8], 16
        )
        % m_bits
        for seed in range(k)
    ]


def _sidecar_path(root: str, version: int) -> str:
    return os.path.join(root, "_blooms", f"v{version}.json")


def write_bloom_sidecar(
    spark: SparkSession,
    log: TxnLog,
    cols: list[str],
    version: int | None = None,
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
    max_distinct: int = BLOOM_MAX_DISTINCT,
) -> dict:
    """Build per-file blooms for ``cols`` over a snapshot's files.

    Returns the sidecar dict ``{rel: {col: {"m", "k", "bits"(hex)}}}``
    (files over the distinct ceiling carry no entry for that column).
    """
    if version is None:
        version = log.latest_version()
    manifest = log.manifest(version)
    sidecar: dict = {}
    for rel in manifest["files"]:
        path = os.path.join(log.root, rel)
        per_col: dict = {}
        for col in cols:
            vals = [
                r[0]
                for r in spark.read.parquet(path)
                .select(col)
                .distinct()
                .limit(max_distinct + 1)
                .collect()
            ]
            if len(vals) > max_distinct:
                continue  # no bloom -> conservative keep
            bits = bytearray(m_bits // 8)
            for v in vals:
                if v is None:
                    continue
                for pos in _positions(v, m_bits, k):
                    bits[pos // 8] |= 1 << (pos % 8)
            per_col[col] = {"m": m_bits, "k": k, "bits": bits.hex()}
        sidecar[rel] = per_col
    out = _sidecar_path(log.root, version)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out + ".tmp", "w") as f:
        json.dump(sidecar, f, sort_keys=True)
    os.replace(out + ".tmp", out)
    return sidecar


def bloom_prune_files(
    log: TxnLog,
    equality_filter: dict,
    version: int | None = None,
) -> list[str]:
    """Absolute paths of snapshot files that MIGHT contain every
    probed value — a file is skipped only when it has a bloom for the
    column and ALL k bits of the probe are clear (definitely absent);
    files without a sidecar entry are conservatively kept."""
    if version is None:
        version = log.latest_version()
    path = _sidecar_path(log.root, version)
    sidecar = {}
    if os.path.exists(path):
        with open(path) as f:
            sidecar = json.load(f)
    kept = []
    for abs_path in log.snapshot_files(version):
        rel = os.path.relpath(abs_path, log.root)
        entry = sidecar.get(rel, {})
        keep = True
        for col, value in equality_filter.items():
            rec = entry.get(col)
            if rec is None:
                continue  # no bloom -> conservative keep
            bits = bytes.fromhex(rec["bits"])
            hit = all(
                bits[pos // 8] & (1 << (pos % 8))
                for pos in _positions(value, rec["m"], rec["k"])
            )
            if not hit:
                keep = False
                break
        if keep:
            kept.append(abs_path)
    return kept
