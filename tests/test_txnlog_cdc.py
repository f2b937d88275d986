"""Unit tests for the transaction log and the streaming CDC apply.

The oracle gate (`txn_log_snapshot_read`, `stream_cdc_apply_live`)
proves fixture-level end-to-end equivalence; these tests pin the
concurrency and ordering corners the gate's happy path cannot reach:
the optimistic-concurrency CAS actually losing, remove-validation,
stale-file invisibility plus time travel, the out-of-order precombine
guard, and delete-tombstone persistence against a late older update.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from big_data_trend_analysis_spark.sources.txnlog import TxnLog
from big_data_trend_analysis_spark.streaming.cdc import (
    cdc_apply_sink,
    changes_from_events,
    compact_latest,
    serve_live_state,
)

CHANGE_DDL = (
    "user_id long, event_type string, event_id long, "
    "ts timestamp, value double, is_del boolean"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, CHANGE_DDL)


# ---------------------------------------------------------------- txn log


def test_txnlog_commit_cas_loser_fails(spark, tmp_path):
    """Two writers race version 1: the second ``commit`` against the
    same parent must raise, not silently overwrite the winner."""
    log = TxnLog(str(tmp_path / "t"))
    log.commit(add=["data/a.parquet"])
    v = log.latest_version()
    log.commit(add=["data/b.parquet"], expected_version=v)
    with pytest.raises(FileExistsError):
        log.commit(add=["data/c.parquet"], expected_version=v)
    # The winner's manifest is intact and the loser added nothing.
    assert log.manifest(v + 1)["added"] == ["data/b.parquet"]
    assert log.latest_version() == v + 1


def test_txnlog_remove_requires_membership(spark, tmp_path):
    log = TxnLog(str(tmp_path / "t"))
    log.commit(add=["data/a.parquet"])
    with pytest.raises(ValueError):
        log.commit(add=[], remove=["data/ghost.parquet"])


def test_txnlog_snapshot_isolation_and_time_travel(spark, tmp_path):
    """A rewrite commit hides superseded files from the latest
    snapshot while they stay on disk — and the pinned old version
    still reads them (time travel)."""
    root = str(tmp_path / "t")
    log = TxnLog(root)
    base = spark.range(10).selectExpr("id", "id * 2 AS doubled")
    log.write_commit(base, n_files=1)  # v0
    v0_files = log.manifest(0)["added"]
    rewritten = log.read_snapshot(spark, 0).filter("id >= 5")
    log.write_commit(rewritten, remove=v0_files, n_files=1)  # v1

    # Superseded files still physically present (no vacuum ran) ...
    assert all(os.path.exists(os.path.join(root, f)) for f in v0_files)
    # ... but invisible to the live snapshot,
    assert log.read_snapshot(spark).count() == 5
    # while the pinned version still sees the pre-rewrite world.
    assert log.read_snapshot(spark, 0).count() == 10
    # A directory-listing read would double-count: 15 rows on disk.
    data_rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(os.path.join(root, "data"))
        .count()
    )
    assert data_rows == 15


def test_txnlog_empty_read_raises(spark, tmp_path):
    with pytest.raises(ValueError):
        TxnLog(str(tmp_path / "t")).read_snapshot(spark)


def test_txnlog_write_commit_cas_pins_merged_from_version(spark, tmp_path):
    """ADVICE r7: ``write_commit`` must let the caller pin the version
    it merged FROM — a peer committing in between must surface as the
    documented ``FileExistsError`` CAS loss, never a silent lost
    update (or a misleading remove-validation ValueError)."""
    log = TxnLog(str(tmp_path / "t"))
    log.write_commit(spark.range(3), n_files=1)  # v0
    merged_from = log.latest_version()
    # A concurrent writer lands v1 while our merge is "in flight".
    log.commit(add=["data/peer.parquet"], expected_version=merged_from)
    with pytest.raises(FileExistsError):
        log.write_commit(
            spark.range(5), n_files=1, expected_version=merged_from
        )
    # The peer's append is intact — nothing was stacked on top of it.
    assert log.latest_version() == merged_from + 1
    assert "data/peer.parquet" in log.manifest(merged_from + 1)["files"]


def test_txnlog_latest_version_ignores_stray_files(tmp_path):
    """ADVICE r7: non-manifest names in ``_txnlog/`` (vacuum sidecars,
    editor artifacts) must be skipped, not int()-parsed."""
    log = TxnLog(str(tmp_path / "t"))
    log.commit(add=["data/a.parquet"])
    for stray in ("vacuum.json", "v1.json.swp", ".tmp-zzz.json", "vx.json"):
        with open(os.path.join(log.log_path, stray), "w") as f:
            f.write("{}")
    assert log.latest_version() == 0


# ---------------------------------------------------------------- cdc apply


TS1 = "2024-01-01 10:00:00"
TS2 = "2024-01-02 10:00:00"


def _row(uid, et, eid, ts, value, is_del=False):
    import datetime

    return (
        uid,
        et,
        eid,
        datetime.datetime.fromisoformat(ts),
        value,
        is_del,
    )


def test_cdc_out_of_order_batch_cannot_clobber(spark, tmp_path):
    """The NEWER version arrives in batch 0, an OLDER version of the
    same key in batch 1 — the precombine guard must keep the newer."""
    state = str(tmp_path / "state")
    sink = cdc_apply_sink(state)
    sink(_df(spark, [_row(1, "view", 20, TS2, 2.0)]), 0)
    sink(_df(spark, [_row(1, "view", 10, TS1, 1.0)]), 1)
    rows = serve_live_state(spark, state).collect()
    assert len(rows) == 1
    assert rows[0].event_id == 20 and rows[0].value == 2.0


def test_cdc_tombstone_survives_late_older_update(spark, tmp_path):
    """A delete (the key's latest version) lands in batch 0; an older
    update arrives in batch 1. Without a retained tombstone the key
    would resurrect; the serving view must stay empty."""
    state = str(tmp_path / "state")
    sink = cdc_apply_sink(state)
    sink(_df(spark, [_row(1, "view", 21, TS2, 9.0, is_del=True)]), 0)
    sink(_df(spark, [_row(1, "view", 7, TS1, 1.0)]), 1)
    assert serve_live_state(spark, state).count() == 0
    # The tombstone row itself is still in committed state (version 21).
    raw = TxnLog(state).read_snapshot(spark).collect()
    assert len(raw) == 1 and raw[0].is_del and raw[0].event_id == 21


def test_cdc_state_commits_are_versioned_per_batch(spark, tmp_path):
    """Each micro-batch lands as one txnlog commit: version k is the
    complete state as of batch k (time travel), and the serving view
    pinned at version 0 ignores everything batch 1 merged."""
    state = str(tmp_path / "state")
    sink = cdc_apply_sink(state)
    sink(_df(spark, [_row(1, "view", 10, TS1, 1.0)]), 0)
    sink(_df(spark, [_row(2, "view", 20, TS2, 2.0)]), 1)
    log = TxnLog(state)
    assert log.latest_version() == 1
    assert {r.event_id for r in serve_live_state(spark, state, 0).collect()} == {10}
    assert {r.event_id for r in serve_live_state(spark, state).collect()} == {10, 20}


def test_cdc_compact_ties_break_on_event_id(spark):
    """Same-ts versions: the higher event_id wins deterministically."""
    out = compact_latest(
        _df(
            spark,
            [_row(1, "view", 5, TS1, 5.0), _row(1, "view", 9, TS1, 9.0)],
        )
    ).collect()
    assert len(out) == 1 and out[0].event_id == 9


@pytest.mark.slow  # multi-minute drain; slow tier (pyproject.toml)
def test_cdc_apply_is_batch_partition_invariant(spark, tmp_path):
    """THE CDC apply invariant: any partition of the changelog into
    any number of ordered micro-batches converges to the same final
    state as a single batch apply — i.e. the precombine merge is
    associative/commutative over (ts, event_id)-versioned changes, so
    arrival slicing (file splits, retries re-slicing the stream)
    cannot change the serving answer."""
    import datetime
    import random

    base = datetime.datetime(2024, 2, 1)
    rng = random.Random(20240214)
    for trial in range(6):
        n = rng.randint(2, 12)
        rows = [
            (
                rng.randint(1, 3),
                rng.choice(["a", "b"]),
                eid,  # unique ⇒ the version order is total
                base + datetime.timedelta(seconds=rng.randint(0, 5)),
                float(rng.randint(0, 100)),
                rng.random() < 0.3,
            )
            for eid in range(n)
        ]
        all_df = _df(spark, rows)
        expected = {
            tuple(r)
            for r in compact_latest(all_df).filter("NOT is_del").drop("is_del").collect()
        }
        k = rng.randint(1, 3)
        slots = [rng.randrange(k) for _ in rows]
        state = str(tmp_path / f"cdc_inv_{trial}")
        sink = cdc_apply_sink(state)
        for b in range(k):
            batch = [r for r, s in zip(rows, slots) if s == b]
            if batch:
                sink(_df(spark, batch), b)
        got = {tuple(r) for r in serve_live_state(spark, state).collect()}
        assert got == expected, f"trial {trial}: slicing changed the state"


def test_txnlog_snapshot_is_fold_of_commits(tmp_path):
    """Log invariant (no Spark): after any sequence of add/remove
    commits, the latest manifest's file list equals the plain fold of
    the deltas, and every historical version stays readable."""
    import random

    rng = random.Random(7)
    log = TxnLog(str(tmp_path / "t"))
    live: list[str] = []
    history = []
    for i in range(25):
        adds = [f"data/f{i}_{j}.parquet" for j in range(rng.randint(1, 3))]
        removes = (
            rng.sample(live, rng.randint(0, min(2, len(live)))) if live else []
        )
        log.commit(add=adds, remove=removes)
        live = [f for f in live if f not in set(removes)] + adds
        history.append(list(live))
    assert log.latest_version() == 24
    root = str(tmp_path / "t")
    for v, expected in enumerate(history):
        got = [p.replace(root + "/", "") for p in log.snapshot_files(v)]
        assert got == expected, f"version {v} diverged from the fold"


def test_cdc_changes_op_derivation(spark):
    """op = delete iff event_id % 7 == 0 (the oracle's literal)."""
    events = spark.createDataFrame(
        [(14, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
         (15, "2024-01-01 00:00:00", 1, "view", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    flags = {r.event_id: r.is_del for r in changes_from_events(events).collect()}
    assert flags == {14: True, 15: False}


# ------------------------------------------------------------ vacuum / cdf


def test_txnlog_vacuum_ages_out_superseded_files(spark, tmp_path):
    """After vacuum(retain=1): latest snapshot byte-identical, old
    versions unreadable BY CONTRACT (ValueError with readable range),
    on-disk parquet count == live manifest count."""
    import glob

    root = str(tmp_path / "t")
    log = TxnLog(root)
    log.write_commit(spark.range(10).selectExpr("id", "id * 2 AS d"), n_files=2)
    v0_files = log.manifest(0)["added"]
    log.write_commit(spark.range(10, 15).selectExpr("id", "id * 2 AS d"), n_files=1)
    log.write_commit(
        log.read_snapshot(spark).filter("id >= 5"),
        remove=log.manifest(1)["files"],
        n_files=1,
    )  # v2 rewrite
    before = sorted(tuple(r) for r in log.read_snapshot(spark).collect())

    stats = log.vacuum(retain_versions=1)
    assert stats["earliest_retained"] == 2
    assert stats["manifests_removed"] == 2
    assert stats["data_files_removed"] == 3  # v0's two files + v1's one
    # latest snapshot byte-identical
    after = sorted(tuple(r) for r in log.read_snapshot(spark).collect())
    assert after == before
    # pinned old versions unreadable by contract
    with pytest.raises(ValueError, match=r"readable range is \[2, 2\]"):
        log.read_snapshot(spark, 0)
    assert log.earliest_version() == 2 and log.latest_version() == 2
    # disk == manifest
    on_disk = glob.glob(os.path.join(root, "data", "**", "*.parquet"), recursive=True)
    assert len(on_disk) == len(log.snapshot_files())
    assert all(not os.path.exists(os.path.join(root, f)) for f in v0_files)


def test_txnlog_vacuum_retains_requested_history(spark, tmp_path):
    log = TxnLog(str(tmp_path / "t"))
    for i in range(4):
        log.write_commit(spark.range(i, i + 3), n_files=1)
    log.vacuum(retain_versions=2)
    assert log.earliest_version() == 2
    assert log.read_snapshot(spark, 2).count() == 9  # history still reads
    with pytest.raises(ValueError):
        log.manifest(1)


def test_txnlog_cdf_matches_semantic_diff(spark, tmp_path):
    """The file-delta change feed must equal the snapshot diff: insert
    rows for appends, delete rows for purged keys, update post-images
    for repriced keys, and NO rows for rewrite-copied (unchanged)
    keys."""
    log = TxnLog(str(tmp_path / "t"))
    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)], "id long, price double"
    )
    log.write_commit(base, n_files=2)  # v0: 4 inserts
    log.write_commit(
        spark.createDataFrame([(5, 50.0)], "id long, price double"), n_files=1
    )  # v1: append
    # v2 rewrite of v0's files: drop id=2, reprice id=3, copy 1 & 4
    v2 = spark.createDataFrame(
        [(1, 10.0), (3, 33.0), (4, 40.0)], "id long, price double"
    )
    log.write_commit(v2, remove=log.manifest(0)["added"], n_files=1)

    ch = {
        (r.id, r._change_type, r._commit_version): r.price
        for r in log.read_changes(spark, key_cols=["id"]).collect()
    }
    assert ch == {
        (1, "insert", 0): 10.0,
        (2, "insert", 0): 20.0,
        (3, "insert", 0): 30.0,
        (4, "insert", 0): 40.0,
        (5, "insert", 1): 50.0,
        (2, "delete", 2): 20.0,   # pre-image
        (3, "update", 2): 33.0,   # post-image
    }
    # range reads: only v2's changes
    only_v2 = log.read_changes(spark, ["id"], from_version=2).collect()
    assert {(r.id, r._change_type) for r in only_v2} == {(2, "delete"), (3, "update")}
    with pytest.raises(ValueError, match="outside readable"):
        log.read_changes(spark, ["id"], from_version=5)


def _three_commit_log_with_rewrite(spark, tmp_path):
    """v0 base (2 files), v1 append, v2 rewrite replacing v0's files."""
    log = TxnLog(str(tmp_path / "t"))
    log.write_commit(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, price double"
        ),
        n_files=2,
    )
    log.write_commit(
        spark.createDataFrame([(4, 40.0)], "id long, price double"), n_files=1
    )
    log.write_commit(
        spark.createDataFrame(
            [(1, 10.0), (3, 33.0)], "id long, price double"
        ),
        remove=log.manifest(0)["added"],
        n_files=1,
    )
    return log


def test_txnlog_cdf_after_vacuum_raises_contract_error(spark, tmp_path):
    """ADVICE r8: vacuum deletes the pre-image ('removed') files of
    the earliest retained rewrite commit; read_changes must detect
    that UP FRONT and raise the documented 'was vacuumed' ValueError
    — never pass the range check and then die mid-scan on a missing
    path (the exact sequence: vacuum(retain=1) then default-range
    read_changes)."""
    log = _three_commit_log_with_rewrite(spark, tmp_path)
    log.vacuum(retain_versions=1)
    # default range (lo = earliest_version() = 2): v2's pre-images gone
    with pytest.raises(ValueError, match="change feed was vacuumed"):
        log.read_changes(spark, key_cols=["id"])
    # explicit pin on the vacuumed version: same contract error
    with pytest.raises(ValueError, match="change feed was vacuumed"):
        log.read_changes(spark, ["id"], from_version=2, to_version=2)


def test_txnlog_cdf_survives_vacuum_with_history_retained(spark, tmp_path):
    """retain_versions=2 keeps v1's snapshot, whose file list covers
    v2's pre-images — the change feed for every retained commit must
    still be fully derivable after the vacuum (the 'retain K >= 2 to
    keep a change window' half of the CDF retention contract)."""
    log = _three_commit_log_with_rewrite(spark, tmp_path)
    log.vacuum(retain_versions=2)
    assert log.earliest_version() == 1
    ch = {
        (r.id, r._change_type, r._commit_version): r.price
        for r in log.read_changes(spark, key_cols=["id"]).collect()
    }
    assert ch == {
        (4, "insert", 1): 40.0,
        (2, "delete", 2): 20.0,   # pre-image read from v1's retained files
        (3, "update", 2): 33.0,
    }


# ------------------------------------------------- multi-writer OCC


def test_txnlog_cas_exactly_one_winner_same_base(spark, tmp_path):
    """Two writers committing against the SAME read version: the CAS
    admits exactly one; the loser's FileExistsError rebase (re-read,
    recommit) converges with BOTH row sets present (VERDICT r8 #2)."""
    log = TxnLog(str(tmp_path / "t"))
    log.write_commit(spark.range(5).selectExpr("id"), n_files=1)  # v0
    base = log.latest_version()
    a = spark.range(100, 103).selectExpr("id")
    b = spark.range(200, 203).selectExpr("id")
    assert log.write_commit(a, expected_version=base) == 1
    with pytest.raises(FileExistsError):
        log.write_commit(b, expected_version=base)  # stale CAS: loser
    # rebase: re-read the log, recommit on the new parent
    assert log.write_commit(b, expected_version=log.latest_version()) == 2
    got = sorted(r.id for r in log.read_snapshot(spark).collect())
    assert got == [0, 1, 2, 3, 4, 100, 101, 102, 200, 201, 202]


def test_txnlog_concurrent_threads_converge(spark, tmp_path):
    """Real contention: 4 threads, all pinned to the same pre-read
    base, race write_commit behind a barrier and rebase via
    commit_retry on loss. Exactly 4 commits must land (no lost
    update) and the final snapshot is the union of every writer's
    rows."""
    import threading

    log = TxnLog(str(tmp_path / "t"))
    log.write_commit(spark.range(1).selectExpr("id"), n_files=1)  # v0
    base = log.latest_version()
    barrier = threading.Barrier(4)
    conflicts, errors = [], []

    def writer(lo):
        df = spark.range(lo, lo + 3).selectExpr("id")
        barrier.wait()
        try:
            try:
                log.write_commit(df, expected_version=base)
            except FileExistsError:
                conflicts.append(lo)
                # data files are already written by the failed attempt?
                # no — write_commit stages data BEFORE the CAS, so on
                # loss re-stage via a fresh write_commit rebase loop
                for _ in range(10):
                    try:
                        log.write_commit(
                            df, expected_version=log.latest_version()
                        )
                        return
                    except FileExistsError:
                        continue
                raise RuntimeError("did not converge")
        except Exception as exc:  # pragma: no cover - surfaced in assert
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(100 * (i + 1),)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    # exactly one winner per version slot: 4 data commits -> v4
    assert log.latest_version() == 4
    assert len(conflicts) == 3  # all but the single winner of the base slot
    got = sorted(r.id for r in log.read_snapshot(spark).collect())
    assert got == [0, 100, 101, 102, 200, 201, 202, 300, 301, 302, 400, 401, 402]


def test_txnlog_commit_retry_append_rebases_cleanly(spark, tmp_path):
    """commit_retry: a pure append rebases over a concurrent winner
    without caller involvement; a remove-set the winner already
    removed is a TRUE conflict -> ValueError, never a silent double
    apply."""
    log = TxnLog(str(tmp_path / "t"))
    log.write_commit(spark.range(3).selectExpr("id"), n_files=1)  # v0
    v0_files = log.manifest(0)["added"]

    # a winner rewrites v0 (removes its files) ...
    log.write_commit(
        spark.range(1, 3).selectExpr("id"), remove=v0_files, n_files=1
    )  # v1
    # ... an appender whose read was v0 still lands via commit_retry
    log.write_commit(spark.range(10, 12).selectExpr("id"), n_files=1)  # v2
    assert log.latest_version() == 2

    # but removing the same pre-images AGAIN is a real conflict
    with pytest.raises(ValueError, match="cannot remove"):
        log.commit_retry(add=[], remove=v0_files)


# ------------------------------------------------- partition evolution


def test_txnlog_partition_spec_evolution_and_pruning(spark, tmp_path):
    """Iceberg-style spec evolution: v0 partitioned by k1, v1 a pure
    metadata spec change to k2, v2 written under k2. Old files keep
    their recorded k1 values (prunable on k1, NOT on k2); new files
    the reverse; reads under either version see the right spec."""
    log = TxnLog(str(tmp_path / "t"))
    df0 = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "a", "y")], "id long, k1 string, k2 string"
    )
    log.write_commit(df0, partition_by=["k1"])  # v0: 2 files (a, b)
    assert log.partition_spec(0) == ["k1"]
    assert len(log.snapshot_files(0)) == 2
    log.evolve_partition_spec(["k2"])  # v1: metadata only
    assert log.partition_spec() == ["k2"]
    assert log.manifest(1)["added"] == []
    df2 = spark.createDataFrame(
        [(4, "c", "x"), (5, "c", "y")], "id long, k1 string, k2 string"
    )
    log.write_commit(df2, partition_by=["k2"])  # v2: 2 files (x, y)

    # pruning on k1: v0's b-file skipped; v2's files unprunable (kept)
    on_k1 = log.snapshot_files(partition_filter={"k1": "a"})
    assert len(on_k1) == 1 + 2
    # pruning on k2: v2's y-file skipped; v0's files unprunable (kept)
    on_k2 = log.snapshot_files(partition_filter={"k2": "x"})
    assert len(on_k2) == 2 + 1
    # correctness: pruned read + row filter == full filter (superset rule)
    got = sorted(
        r.id
        for r in log.read_snapshot(spark, partition_filter={"k2": "x"})
        .filter("k2 = 'x'")
        .collect()
    )
    assert got == [1, 2, 4]
    # partition columns survive IN the data (no basePath reconstruction)
    assert log.read_snapshot(spark).columns == ["id", "k1", "k2"]
    # time travel: v0 pruning still uses v0's own manifest
    assert len(log.snapshot_files(0, partition_filter={"k1": "b"})) == 1


def test_txnlog_partition_values_survive_hive_escaping(spark, tmp_path):
    """Partition values with path-hostile characters (space, slash,
    equals, percent, colon) hive-escape into the directory name;
    the manifest must record the ORIGINAL values (unquoted) and
    pruning must match on them exactly."""
    log = TxnLog(str(tmp_path / "t"))
    vals = ["a b", "a/b", "a=b", "a%b", "a:b"]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, k string"
    )
    log.write_commit(df, partition_by=["k"])
    recorded = sorted(
        p["k"] for p in log.manifest(0)["file_partitions"].values()
    )
    assert recorded == sorted(vals)
    for i, v in enumerate(vals):
        files = log.snapshot_files(partition_filter={"k": v})
        assert len(files) == 1, (v, files)
        got = (
            log.read_snapshot(spark, partition_filter={"k": v})
            .filter(F.col("k") == v)
            .collect()
        )
        assert [(r.id, r.k) for r in got] == [(i, v)]


def test_txnlog_partitioned_vacuum_cleans_nested_dirs(spark, tmp_path):
    """Vacuum on partitioned commits: hive-nested superseded files age
    out; the retained partitioned snapshot is byte-identical."""
    import glob

    log = TxnLog(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "id long, k string"
    )
    log.write_commit(df, partition_by=["k"])  # v0: 2 nested files
    log.write_commit(
        log.read_snapshot(spark).filter("id != 2"),
        remove=log.manifest(0)["added"],
        partition_by=["k"],
    )  # v1 rewrite: only k=a rows remain
    before = sorted(tuple(r) for r in log.read_snapshot(spark).collect())
    stats = log.vacuum(retain_versions=1)
    assert stats["data_files_removed"] == 2
    root = str(tmp_path / "t")
    on_disk = glob.glob(os.path.join(root, "data", "**", "*.parquet"), recursive=True)
    assert len(on_disk) == len(log.snapshot_files())
    assert sorted(tuple(r) for r in log.read_snapshot(spark).collect()) == before


def test_txnlog_schema_evolution_is_transactional(spark, tmp_path):
    """A column add lands atomically with its commit: the latest
    snapshot reads old files with the new column null, while the
    pre-evolution version keeps its narrower pinned schema."""
    log = TxnLog(str(tmp_path / "t"))
    log.write_commit(spark.createDataFrame([(1, "a")], "id long, name string"))
    log.write_commit(
        spark.createDataFrame(
            [(2, "b", 0.5)], "id long, name string, score double"
        )
    )
    latest = log.read_snapshot(spark)
    assert latest.columns == ["id", "name", "score"]
    rows = {r.id: r for r in latest.collect()}
    assert rows[1].score is None and rows[2].score == 0.5
    # pre-evolution version: ITS schema, not the union
    v0 = log.read_snapshot(spark, 0)
    assert v0.columns == ["id", "name"]
    assert v0.count() == 1


def test_txnlog_version_at_timestamp_resolution(spark, tmp_path):
    """timestampAsOf semantics: latest committed_at <= ts wins, the
    boundary is inclusive, pre-epoch raises, and unstamped-only logs
    refuse timestamp travel with a clear error."""
    import pytest

    log = TxnLog(str(tmp_path / "t"))
    log.write_commit(
        spark.createDataFrame([(1,)], "id long"),
        committed_at="2024-01-01T00:00:00",
    )
    log.write_commit(
        spark.createDataFrame([(2,)], "id long"),
        committed_at="2024-01-02T00:00:00",
    )
    log.write_commit(
        spark.createDataFrame([(3,)], "id long"),
        committed_at="2024-01-03T00:00:00",
    )
    assert log.version_at("2024-01-01T00:00:00") == 0  # inclusive boundary
    assert log.version_at("2024-01-02T12:00:00") == 1  # not the future v2
    assert log.version_at("2024-01-03T00:00:00") == 2  # exact last stamp
    # ADVICE r9: a FUTURE timestamp raises like Delta ('timestamp after
    # latest commit') instead of silently resolving to latest
    with pytest.raises(ValueError, match="after the latest commit"):
        log.version_at("2099-01-01T00:00:00")
    with pytest.raises(ValueError, match="precedes the earliest"):
        log.version_at("1999-01-01T00:00:00")

    # stamp hygiene at write time (ADVICE r9): non-monotonic and
    # malformed stamps are refused before they can corrupt version_at
    with pytest.raises(ValueError, match="precedes the nearest stamped"):
        log.commit(add=[], remove=[], committed_at="2023-12-31T00:00:00")
    with pytest.raises(ValueError, match="not ISO-8601"):
        log.commit(add=[], remove=[], committed_at="Jan 4 2024 00:00")
    # review finding: an UNSTAMPED intermediate commit must not open a
    # hole for a backwards stamp — the check walks to the nearest
    # stamped ancestor
    log.commit(add=[], remove=[])  # unstamped (evolve/restore default)
    with pytest.raises(ValueError, match="precedes the nearest stamped"):
        log.commit(add=[], remove=[], committed_at="2023-12-31T00:00:00")

    # unstamped log: version-number reads fine, timestamp travel refused
    bare = TxnLog(str(tmp_path / "bare"))
    bare.write_commit(spark.createDataFrame([(9,)], "id long"))
    with pytest.raises(ValueError, match="no commit timestamps"):
        bare.version_at("2024-01-01T00:00:00")


def test_txnlog_version_at_respects_vacuum(spark, tmp_path):
    """After vacuum drops old manifests, a timestamp pointing into the
    vacuumed range raises instead of silently resolving to a newer
    version (the CDF retention contract, applied to time travel)."""
    import pytest

    log = TxnLog(str(tmp_path / "t"))
    for i, day in enumerate(["01", "02", "03"]):
        log.write_commit(
            spark.createDataFrame([(i,)], "id long"),
            committed_at=f"2024-01-{day}T00:00:00",
        )
    log.vacuum(retain_versions=1)
    assert log.version_at("2024-01-03T00:00:00") == 2
    with pytest.raises(ValueError, match="precedes the earliest"):
        log.version_at("2024-01-02T00:00:00")
