"""Keyed aggregation, mirroring reference tests/test_pair_rdd.rs
(FIXTURES F3): group_by_key on skewed keys, reduce_by_key,
combine_by_key with a custom combiner, group_by with a derived key."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from vega_spark.operators import aggregations as A


def kv(spark, pairs, parts=4):
    return spark.createDataFrame(pairs, "key string, value int").repartition(parts)


def test_group_by_key_skewed(spark):
    # reference tests/test_pair_rdd.rs:9-37: x->1..7, y->1..8
    pairs = [("x", v) for v in range(1, 8)] + [("y", v) for v in range(1, 9)]
    out = A.group_by_key(kv(spark, pairs), ["key"], "value", sort_values=True)
    got = {r.key: list(r["values"]) for r in out.collect()}
    assert got == {"x": list(range(1, 8)), "y": list(range(1, 9))}


def test_reduce_by_key(spark):
    pairs = [("a", 1), ("b", 2), ("a", 2), ("c", 5), ("a", 3)]
    out = A.reduce_by_key(kv(spark, pairs), ["key"], F.sum("value").alias("s"))
    assert {r.key: r.s for r in out.collect()} == {"a": 6, "b": 2, "c": 5}


def test_combine_by_key_custom(spark):
    # arbitrary combiner: (sum, count, max) triple in one pass
    pairs = [("a", 1), ("b", 2), ("a", 2), ("c", 5), ("a", 3)]

    def comb(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": [pdf["key"].iloc[0]],
            "s": [int(pdf["value"].sum())],
            "c": [len(pdf)],
            "mx": [int(pdf["value"].max())],
        })

    out = A.combine_by_key(kv(spark, pairs), ["key"], comb,
                           "key string, s long, c long, mx long")
    got = {r.key: (r.s, r.c, r.mx) for r in out.collect()}
    assert got == {"a": (6, 3, 3), "b": (2, 1, 2), "c": (5, 1, 5)}


def test_group_by_derived_sign(spark):
    # reference tests/test_pair_rdd.rs:112-135: group [-3..3] by sign
    df = spark.createDataFrame([(v,) for v in range(-3, 4)], "value int")
    key = (F.when(F.col("value") < 0, "neg")
           .when(F.col("value") == 0, "zero").otherwise("pos"))
    out = A.group_by(df, key, "k", sort_values=True)
    got = {r.k: [x["value"] for x in r["values"]] for r in out.collect()}
    assert got == {"neg": [-3, -2, -1], "zero": [0], "pos": [1, 2, 3]}


def test_avg_by_key(spark):
    pairs = [("a", 2), ("a", 4), ("b", 10)]
    out = A.avg_by_key(kv(spark, pairs), ["key"], "value", "m")
    assert {r.key: r.m for r in out.collect()} == {"a": 3.0, "b": 10.0}


def test_salted_reduce_matches_plain(spark):
    pairs = [("hot", v) for v in range(1000)] + [("cold", 1)]
    df = kv(spark, pairs, 8)
    plain = {r.key: r.s for r in
             A.reduce_by_key(df, ["key"], F.sum("value").alias("s")).collect()}
    salted = {r.key: r.s for r in
              A.reduce_by_key_salted(df, ["key"], "value", "sum", "s").collect()}
    assert plain == salted


def test_rollup_cube(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3)], "k1 string, k2 string, v int")
    roll = A.rollup_agg(df, ["k1", "k2"], F.sum("v").alias("s")).collect()
    assert len(roll) == 3 + 2 + 1  # leaf + per-k1 + grand total
    cube = A.cube_agg(df, ["k1", "k2"], F.sum("v").alias("s")).collect()
    assert len(cube) == 3 + 2 + 2 + 1
    grand = [r.s for r in roll if r.k1 is None and r.k2 is None]
    assert grand == [6]


def test_pivot_explicit_values(spark):
    from vega_spark.operators.aggregations import pivot_agg
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [("d1", "a", 1.0), ("d1", "a", 2.0), ("d1", "b", 5.0),
         ("d2", "b", 7.0)], "day string, k string, v double")
    out = {r.day: (r.a, r.b) for r in
           pivot_agg(df, ["day"], "k", ["a", "b"], F.sum("v")).collect()}
    assert out == {"d1": (3.0, 5.0), "d2": (None, 7.0)}


def test_unpivot_roundtrips_pivot(spark):
    from vega_spark.operators.aggregations import unpivot
    df = spark.createDataFrame(
        [(1, 10.0, 100.0), (2, 20.0, 200.0)], "id long, x double, y double")
    long = unpivot(df, ["id"], ["x", "y"])
    assert long.count() == 4
    got = {(r.id, r.var): r.value for r in long.collect()}
    assert got[(1, "x")] == 10.0 and got[(2, "y")] == 200.0
