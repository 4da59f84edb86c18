"""Set ops with reference-pinned semantics (FIXTURES F5):
union = bag, intersection/subtract = deduplicated."""

from __future__ import annotations

from vega_spark.operators import setops as S

A_DATA = [1, 2, 3, 4, 5, 10, 12, 13, 19, 0]
B_DATA = [3, 4, 5, 6, 7, 8, 11, 13]


def ints(spark, values, parts=2):
    return spark.createDataFrame([(v,) for v in values], "value int").repartition(parts)


def test_union_is_bag(spark):
    # reference tests/test_rdd.rs:388-394: duplicates preserved
    out = S.union_bag(ints(spark, A_DATA), ints(spark, B_DATA))
    assert out.count() == 18


def test_union_all_nary(spark):
    df = ints(spark, [1, 2])
    assert S.union_all([df, df, df]).count() == 6


def test_intersection_dedups(spark):
    # reference tests/test_rdd.rs:485-521 → [3,4,5,13]
    out = S.intersection(ints(spark, A_DATA + A_DATA), ints(spark, B_DATA))
    assert sorted(r.value for r in out.collect()) == [3, 4, 5, 13]


def test_subtract_dedups(spark):
    # reference tests/test_rdd.rs:676-699 → dedup'd survivors
    out = S.subtract(ints(spark, A_DATA + A_DATA), ints(spark, B_DATA))
    assert sorted(r.value for r in out.collect()) == [0, 1, 2, 10, 12, 19]


def test_distinct_subset(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "a")], "k int, v string")
    assert sorted(r.k for r in S.distinct(df, ["k"]).collect()) == [1, 2]


def test_except_all_bag_semantics(spark):
    # max(0, n_left - n_right) per value
    out = S.except_all(ints(spark, [1, 1, 1, 2, 3]), ints(spark, [1, 2, 2]))
    assert sorted(r.value for r in out.collect()) == [1, 1, 3]


def test_intersect_all_bag_semantics(spark):
    # min(n_left, n_right) per value
    out = S.intersect_all(ints(spark, [1, 1, 2, 2, 3]), ints(spark, [1, 1, 1, 2]))
    assert sorted(r.value for r in out.collect()) == [1, 1, 2]


def test_subtract_by_key_keeps_left_multiplicity(spark):
    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k int, v string")
    right = spark.createDataFrame([(1,), (1,), (9,)], "k int")
    out = S.subtract_by_key(left, right, "k")
    assert sorted((r.k, r.v) for r in out.collect()) == [(2, "c"), (3, "d")]
