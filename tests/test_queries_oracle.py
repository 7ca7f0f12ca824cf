"""Cross-engine check of every driver-contract query vs its DuckDB
oracle at sf0.001 (the driver itself runs sf0.01 — same code path)."""

import os

import pytest

from easyner_spark.compare import compare_query
from easyner_spark.queries import ORACLES, QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_every_query_has_oracle():
    assert set(ORACLES) == set(QUERIES)


def test_driver_window_is_the_priority_list():
    """The round driver oracle-checks list(QUERIES)[:50]; the explicit
    _DRIVER_PRIORITY list controls exactly that window (round-3 verdict
    #1: entries registered past position 50 never got a driver row).
    QUERIES and ORACLES must share the ordering or the driver would
    pair mismatched entries."""
    from easyner_spark.queries import _DRIVER_PRIORITY

    assert len(_DRIVER_PRIORITY) == 50
    assert list(QUERIES)[:50] == _DRIVER_PRIORITY
    assert list(ORACLES) == [n for n in QUERIES if n in ORACLES]


def test_driver_window_union_invariant():
    """Rotation contract (round-4 verdict #3): every registered query
    must have a driver CORRECTNESS row no older than H rounds, where
    H = ceil(len(QUERIES) / 50) — the driver grants exactly 50 rows
    per round, so H is the tightest freshness ANY schedule can
    guarantee (at <= 100 queries this is the original two-window
    rule; LRU rotation achieves the bound for any N). New queries
    must be in the current window (they have no prior row). Each
    recorded window is exactly the 50 slots the driver checks,
    duplicate-free, and names only real queries."""
    import math

    from easyner_spark.queries import _DRIVER_ROUND, _DRIVER_WINDOWS

    for rnd, win in _DRIVER_WINDOWS.items():
        assert len(win) == 50, f"round {rnd} window != 50 slots"
        assert len(set(win)) == 50, f"round {rnd} window has duplicates"
    assert set(_DRIVER_WINDOWS[_DRIVER_ROUND]) <= set(QUERIES)
    horizon = math.ceil(len(QUERIES) / 50)
    recent: set[str] = set()
    for rnd in range(_DRIVER_ROUND - horizon + 1, _DRIVER_ROUND + 1):
        recent |= set(_DRIVER_WINDOWS.get(rnd, ()))
    stale = set(QUERIES) - recent
    assert not stale, (
        f"queries without a driver row in the last {horizon} windows: "
        f"{sorted(stale)}"
    )
    # semantics-changed queries MUST be re-gated in their recorded
    # round — their older driver rows gate outputs that no longer
    # exist, so horizon coverage alone overstates driver evidence
    from easyner_spark.queries import _MUST_REGATE

    for rnd, names in _MUST_REGATE.items():
        if rnd <= _DRIVER_ROUND:
            missing = set(names) - set(_DRIVER_WINDOWS.get(rnd, ()))
            assert not missing, (
                f"round {rnd} window must re-gate {sorted(missing)}"
            )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_duckdb(spark, name):
    diff = compare_query(spark, SF_DIR, name, QUERIES[name], ORACLES[name])
    assert diff is None, diff


def test_pending_r6_queries_match_duckdb(spark):
    """Contract pairs written while the current driver window was
    saturated: oracle-gated locally now, registered (+ window slot)
    next round. Must not collide with registered names."""
    from easyner_spark.queries import PENDING_R6

    assert PENDING_R6, "remove this test when the pending dict empties"
    for name, (fn, sql) in PENDING_R6.items():
        assert name not in QUERIES, f"{name} is registered — drop it from PENDING_R6"
        diff = compare_query(spark, SF_DIR, name, fn, sql)
        assert diff is None, (name, diff)


def test_entry_smoke(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() >= 0
    assert set(mod.oracle_sql()) <= set(mod.queries())
