"""Unit tests for the driver-window rotation policy
(__spark_entry__._window_order) — VERDICT r6 item #2.

The policy decides which ~50 queries the driver's per-round
CORRECTNESS window verifies.  Invariants pinned here:

1. failed-first: a red latest row always precedes everything else.
2. debt-first: never-checked queries fill the window before any
   green re-check; _RECHECK_NEXT is deferred while debt remains.
3. post-debt: _RECHECK_NEXT folds in and jumps the rotation queue.
4. stale-green rotation: greens ordered oldest driver round first.
5. no query is ever dropped or duplicated.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "_entry_under_test", os.path.join(_REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_entry_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def green_row(rnd):
    return {"rows_match": True, "schema_match": True, "hash_match": True,
            "_round": rnd}


def red_row(rnd):
    return {"rows_match": True, "schema_match": True, "hash_match": False,
            "_round": rnd}


NAMES = ["a", "b", "c", "d", "e", "f"]
PRIORITY = ["f", "e", "d", "c", "b", "a"]


def order(mod, rows, recheck=(), recheck_next=()):
    return mod._window_order(NAMES, rows, set(recheck), set(recheck_next),
                             PRIORITY)


def test_failed_rows_lead(entry_mod):
    rows = {"a": green_row(1), "b": red_row(3), "c": green_row(2)}
    got = order(entry_mod, rows)
    assert got[0] == "b"            # red row first
    assert set(got[1:4]) == {"d", "e", "f"}  # then debt
    assert set(got) == set(NAMES) and len(got) == len(NAMES)


def test_debt_precedes_recheck_next(entry_mod):
    # c changed contract this round (recheck_next) but d..f are still
    # never-checked: the window must burn pure debt, c stays in tail.
    rows = {"a": green_row(1), "b": green_row(2), "c": green_row(3)}
    got = order(entry_mod, rows, recheck_next={"c"})
    assert got[:3] == ["f", "e", "d"]        # debt in priority order
    assert got[3:] == ["a", "b", "c"]        # tail oldest-round-first


def test_recheck_next_folds_in_once_debt_is_zero(entry_mod):
    rows = {k: green_row(i + 1) for i, k in enumerate(NAMES)}
    got = order(entry_mod, rows, recheck_next={"c"})
    assert got[0] == "c"                     # jumps the queue post-debt
    assert got[1:] == ["a", "b", "d", "e", "f"]  # then oldest-first


def test_explicit_recheck_always_fresh(entry_mod):
    rows = {k: green_row(1) for k in NAMES}
    rows["e"]["_round"] = 5
    got = order(entry_mod, rows, recheck={"e"})
    assert got[0] == "e"


def test_stale_green_rotation_is_oldest_round_first(entry_mod):
    rows = {"a": green_row(5), "b": green_row(1), "c": green_row(3),
            "d": green_row(1), "e": green_row(2), "f": green_row(4)}
    got = order(entry_mod, rows)
    # round ties (b,d @1) broken by PRIORITY rank: d before b.
    assert got == ["d", "b", "e", "c", "f", "a"]


def test_no_drop_no_dup_under_all_states(entry_mod):
    rows = {"a": red_row(2), "b": green_row(1)}
    got = order(entry_mod, rows, recheck={"b"}, recheck_next={"a"})
    assert sorted(got) == sorted(NAMES)


def test_live_window_is_exactly_the_debt_set(entry_mod):
    """Against the real repo state: while never-checked queries
    remain, the window head is exactly that set (r7 closes debt)."""
    rows = entry_mod._driver_rows()
    sys.path.insert(0, _REPO)
    from vega_spark import registry
    names = list(registry.QUERIES)
    got = entry_mod._window_order(names, rows, entry_mod._RECHECK,
                                  entry_mod._RECHECK_NEXT,
                                  entry_mod._PRIORITY)
    debt = [k for k in names if k not in rows]
    if debt:  # pre-debt-zero state (r7)
        assert set(got[:len(debt)]) == set(debt)
    assert sorted(got) == sorted(names)
