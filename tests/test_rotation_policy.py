"""Self-enforcing registry rotation policy (VERDICT r5 "Next round" #2).

The driver's correctness gate hash-checks only the first
``green_ledger.WINDOW`` entries of ``QUERIES``. The policy: any query
that is NEW or whose implementation (transitive package-source
closure + oracle SQL + input tables) CHANGED since its last green
driver row must sit inside that window, so the next driver run
re-verifies it. ``tools/green_ledger.json`` records the last green
round + fingerprint per query; ingest happens at round start via
``python tools/green_ledger.py ingest CORRECTNESS_r{N}.json --round N``
(before any code edit, while HEAD equals the driver-verified tree).

These tests run without a SparkSession — registry construction and
``inspect.getsource`` only.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from tools import green_ledger


def test_ledger_exists_and_nonempty():
    ledger = green_ledger.load_ledger()
    assert ledger, "tools/green_ledger.json missing or empty — run ingest"
    for name, entry in ledger.items():
        assert set(entry) == {"round", "kind", "fingerprint"}, name
        assert entry["kind"] in ("hash", "rows_only"), name


def test_changed_or_new_queries_are_inside_the_window():
    from big_data_trend_analysis_spark.plans.registry import ORACLE_SQL, QUERIES

    names = list(QUERIES)
    pending = green_ledger.stale_or_new(QUERIES, ORACLE_SQL)
    outside = [n for n in pending if names.index(n) >= green_ledger.WINDOW]
    assert not outside, (
        f"queries changed-or-new since their last green driver row sit "
        f"OUTSIDE the first {green_ledger.WINDOW} registry positions "
        f"(the driver will not re-verify them): {outside}. "
        f"Reorder QUERIES in plans/registry.py."
    )


def test_ledger_has_no_orphans():
    """Every ledger entry must still name a registry query."""
    from big_data_trend_analysis_spark.plans.registry import QUERIES

    orphans = sorted(set(green_ledger.load_ledger()) - set(QUERIES))
    assert not orphans, f"ledger entries for deleted queries: {orphans}"


def test_fingerprint_sees_operator_body_changes():
    """The fingerprint must track the underlying operator source, not
    just the registry wrapper — guards against the hook being lost."""
    from big_data_trend_analysis_spark.operators import aggregates
    from big_data_trend_analysis_spark.plans.registry import ORACLE_SQL, QUERIES

    fn = QUERIES["agg_basic"]
    impl = getattr(fn, "__query_impl__", None)
    assert impl is not None and impl[0] is aggregates.agg_basic

    base = green_ledger.fingerprint(fn, ORACLE_SQL["agg_basic"])
    # Same wrapper, different oracle text -> different fingerprint.
    assert base != green_ledger.fingerprint(fn, ORACLE_SQL["agg_basic"] + " ")
