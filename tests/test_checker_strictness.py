"""The local oracle checker (tools/check_oracle.py) is the gate every
query ships through — these tests pin its STRICTNESS so a loosening
regression can't silently re-open the round-2 failure mode (the
driver hashes exact values and exact-ish types; the local checker
must fail anything the driver would fail).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import normalize, type_problems  # noqa: E402


def test_widened_duckdb_types_fail():
    # DuckDB SUM(INTEGER) widens to HUGEINT → Arrow detour in the
    # driver → hash mismatch even when fetchall() values agree.
    for duck in ("HUGEINT", "UBIGINT", "DECIMAL(38,0)", "UINTEGER"):
        probs = type_problems({"a": "bigint"}, {"a": duck})
        assert probs, f"widened type {duck} must be flagged"


def test_cross_family_int_vs_double_fails():
    probs = type_problems({"a": "int"}, {"a": "DOUBLE"})
    assert probs and "type family" in probs[0]
    probs = type_problems({"a": "double"}, {"a": "BIGINT"})
    assert probs and "type family" in probs[0]


def test_integer_width_differences_allowed():
    # Spark int vs DuckDB BIGINT hash-matched in every driver-green
    # round-2 row — width alone must NOT fail.
    assert type_problems({"a": "int"}, {"a": "BIGINT"}) == []
    assert type_problems({"a": "bigint"}, {"a": "INTEGER"}) == []


def test_matching_families_pass():
    assert type_problems(
        {"a": "double", "b": "string", "c": "boolean", "d": "date"},
        {"a": "DOUBLE", "b": "VARCHAR", "c": "BOOLEAN", "d": "DATE"},
    ) == []


def test_normalize_is_bit_exact_on_floats():
    # 0.1 + 0.2 != 0.3 in binary; the checker must NOT forgive it.
    a = normalize([(0.1 + 0.2,)], ["x"])
    b = normalize([(0.3,)], ["x"])
    assert a != b


def test_normalize_distinguishes_negative_zero():
    # repr(-0.0) != repr(0.0): a sign-of-zero divergence between
    # engines would break the driver's exact value hash.
    assert normalize([(-0.0,)], ["x"]) != normalize([(0.0,)], ["x"])


def test_normalize_sorts_columns_by_name():
    # The driver compares columns name-sorted; engines may emit them
    # in different positional orders.
    assert normalize([(1, 2)], ["b", "a"]) == normalize([(2, 1)], ["a", "b"])


def test_normalize_nan_is_stable():
    nan = float("nan")
    assert normalize([(nan,)], ["x"]) == normalize([(nan,)], ["x"])
