"""Joins & cogroup, mirroring reference tests/test_pair_rdd.rs:40-82
(FIXTURES F4/F6): inner join with duplicate keys, cogroup with
missing keys, cartesian, positional zip."""

from __future__ import annotations

from pyspark.sql import functions as F

from vega_spark.operators import joins as J
from vega_spark.operators import setops as S


def test_inner_join_dup_keys(spark):
    # F4: left unique keys 1..4; right has dup keys 1-3, key 4 unmatched
    left = spark.createDataFrame(
        [(1, "a1"), (2, "b1"), (3, "c1"), (4, "d1")], "k int, v string")
    right = spark.createDataFrame(
        [(1, "A1"), (1, "A2"), (2, "B1"), (2, "B2"), (3, "C1"), (3, "C2")],
        "k int, w string")
    out = J.join(left, right, on=["k"], how="inner")
    rows = out.collect()
    assert len(rows) == 6  # per-key cross product; key 4 dropped
    assert {r.k for r in rows} == {1, 2, 3}
    # union of two identical joins keeps duplicates (bag):
    assert S.union_bag(out, out).count() == 12


def test_cogroup_missing_sides(spark):
    left = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    right = spark.createDataFrame([(2, "X"), (3, "Y")], "k int, w string")
    out = J.cogroup(left, right, "k", "k", "v", "w")
    got = {r.key: (list(r.left_values), list(r.right_values)) for r in out.collect()}
    assert got == {1: (["a", "b"], []), 2: (["c"], ["X"]), 3: ([], ["Y"])}


def test_cartesian(spark):
    # reference tests/test_rdd.rs:354-362: [0,1] x ['α','β']
    a = spark.createDataFrame([(0,), (1,)], "x int")
    b = spark.createDataFrame([("α",), ("β",)], "y string")
    rows = {(r.x, r.y) for r in J.cartesian(a, b).collect()}
    assert rows == {(0, "α"), (0, "β"), (1, "α"), (1, "β")}


def test_zip_by_order(spark):
    # reference tests/test_rdd.rs:459-482: positional pairing
    a = spark.createDataFrame([(v,) for v in [1, 2, 3, 4, 5]], "value int")
    b = spark.createDataFrame(
        [(i, s) for i, s in enumerate(["5a", "4b", "3c", "2d", "1a"])],
        "pos int, label string")
    out = J.zip_by_order(a, b.select("pos", "label"), ["value"], ["pos"])
    got = sorted((r.value, r.label) for r in out.collect())
    assert got == [(1, "5a"), (2, "4b"), (3, "3c"), (4, "2d"), (5, "1a")]


def test_zip_with_index(spark):
    df = spark.createDataFrame([("c",), ("a",), ("b",)], "s string")
    out = J.zip_with_index(df, ["s"])
    # NB: access by key — Row.index is the tuple method, so attribute
    # access on a column literally named "index" returns the method
    assert {(r.s, r["index"]) for r in out.collect()} == \
           {("a", 0), ("b", 1), ("c", 2)}


def test_join_types_matrix(spark):
    left = spark.createDataFrame([(1, "l1"), (2, "l2")], "k int, v string")
    right = spark.createDataFrame([(2, "r2"), (3, "r3")], "k int, w string")
    assert J.join(left, right, ["k"], "inner").count() == 1
    assert J.join(left, right, ["k"], "left").count() == 2
    assert J.join(left, right, ["k"], "full").count() == 3
    assert {r.k for r in J.join(left, right, ["k"], "left_semi").collect()} == {2}
    assert {r.k for r in J.join(left, right, ["k"], "left_anti").collect()} == {1}


# --- as-of join ---------------------------------------------------------------

def test_asof_join_backward(spark):
    from vega_spark.operators.joins import asof_join
    left = spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 2), ("a", 5, 3), ("b", 7, 4)],
        "k string, ts long, event_id long")
    right = spark.createDataFrame(
        [("a", 10, 100.0), ("a", 15, 150.0), ("b", 99, 990.0)],
        "k string, ts long, px double")
    out = {r.event_id: r.px
           for r in asof_join(left, right, ["k"], "ts", ["px"]).collect()}
    # equal ts matches; ts=5 has no prior right row -> dropped (inner)
    assert out == {1: 100.0, 2: 150.0}

    outl = {r.event_id: r.px
            for r in asof_join(left, right, ["k"], "ts", ["px"],
                               how="left").collect()}
    assert outl == {1: 100.0, 2: 150.0, 3: None, 4: None}


def test_range_join_bucket_boundary(spark):
    from vega_spark.operators.joins import range_join_bucketed
    # radius 100; right at +100 (inclusive) and +101 (excluded);
    # pair spans a bucket boundary (left 950 bkt 9, right 1050 bkt 10)
    left = spark.createDataFrame([("a", 950, 1)], "k string, l_ts long, lid long")
    right = spark.createDataFrame(
        [("a", 1050, 10), ("a", 1051, 11), ("a", 950, 12), ("a", 949, 13)],
        "k string, r_ts long, rid long")
    got = sorted(r.rid for r in range_join_bucketed(
        left, right, ["k"], "l_ts", "r_ts", max_diff=100).collect())
    assert got == [10]  # strict lower bound drops ts-equal, 1051 out of range

    got2 = sorted(r.rid for r in range_join_bucketed(
        left, right, ["k"], "l_ts", "r_ts", max_diff=100,
        strict_after=False).collect())
    assert got2 == [10, 12]


def test_cogroup_apply_both_and_one_sided_keys(spark):
    import pandas as pd
    from vega_spark.operators.joins import cogroup_apply

    left = spark.createDataFrame([(1, 10), (1, 11), (3, 30)], "k int, a int")
    right = spark.createDataFrame([(1, 100), (2, 200)], "k int, b int")

    def fn(lp: pd.DataFrame, rp: pd.DataFrame) -> pd.DataFrame:
        k = int(lp["k"].iloc[0]) if len(lp) else int(rp["k"].iloc[0])
        return pd.DataFrame({"k": [k], "nl": [len(lp)], "nr": [len(rp)]})

    out = sorted((r.k, r.nl, r.nr) for r in
                 cogroup_apply(left, right, "k", "k", fn,
                               "k int, nl long, nr long").collect())
    # key present on either side shows up, with empty pandas frame for
    # the missing side — reference cogroup emits empty Vecs likewise
    assert out == [(1, 2, 1), (2, 0, 1), (3, 1, 0)]


def test_asof_forward_picks_next_at_or_after(spark):
    from vega_spark.operators.joins import asof_join
    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 250), (3, 2, 50)], "id long, k long, ts long")
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 300, 30.0), (2, 40, 4.0)],
        "k long, ts long, v double")
    out = {r["id"]: r["v"]
           for r in asof_join(left, right, ["k"], "ts", ["v"],
                              how="left", direction="forward").collect()}
    assert out[1] == 10.0   # equal ts matches forward
    assert out[2] == 30.0   # next at 300
    assert out[3] is None   # right at 40 is before 50 -> no forward match


def test_asof_tolerance_nulls_stale_matches(spark):
    from vega_spark.operators.joins import asof_join
    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 1000)], "id long, k long, ts long")
    right = spark.createDataFrame(
        [(1, 90, 9.0)], "k long, ts long, v double")
    got = {r["id"]: r["v"]
           for r in asof_join(left, right, ["k"], "ts", ["v"], how="left",
                              tolerance=50).collect()}
    assert got[1] == 9.0     # distance 10 <= 50
    assert got[2] is None    # distance 910 > 50 -> stale
    inner = asof_join(left, right, ["k"], "ts", ["v"], how="inner",
                      tolerance=50)
    assert [r["id"] for r in inner.collect()] == [1]


def test_cogroup_n_three_inputs_empty_sides(spark):
    from vega_spark.operators.joins import cogroup_n
    a = spark.createDataFrame([(1, "a1"), (2, "a2")], "k long, v string")
    b = spark.createDataFrame([(2, "b1"), (3, "b2")], "k long, v string")
    c = spark.createDataFrame([(3, "c1")], "k long, v string")
    out = {r["key"]: (r["values_0"], r["values_1"], r["values_2"])
           for r in cogroup_n([(a, "k", "v"), (b, "k", "v"),
                               (c, "k", "v")]).collect()}
    assert out[1] == (["a1"], [], [])
    assert out[2] == (["a2"], ["b1"], [])
    assert out[3] == ([], ["b2"], ["c1"])


def test_asof_carries_matched_row_atomically(spark):
    # ADVICE r01: per-column last(ignorenulls) back-filled a NULL value
    # column of the nearest right row from a FARTHER row, mixing rows
    # and leaking values past the tolerance. The struct carry keeps
    # the matched row atomic: at ts=100 the nearest right row (ts=90)
    # has price NULL, and that NULL must survive — not be filled from
    # the ts=10 row.
    left = spark.createDataFrame([(1, 100)], "user_id long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 7.0, "old"), (1, 90, None, "new")],
        "user_id long, ts long, price double, tag string")
    out = J.asof_join(left, right, ["user_id"], "ts",
                      ["price", "tag"], how="left").collect()
    assert len(out) == 1
    assert out[0]["tag"] == "new" and out[0]["price"] is None
    # tolerance checked against the matched row's own timestamp: the
    # nearest row (ts=90, dist 10) is in tolerance even though a
    # farther row is not; with tolerance=5 nothing matches at all.
    tol = J.asof_join(left, right, ["user_id"], "ts", ["price", "tag"],
                      how="left", tolerance=15).collect()
    assert tol[0]["tag"] == "new" and tol[0]["price"] is None
    none = J.asof_join(left, right, ["user_id"], "ts", ["price", "tag"],
                       how="inner", tolerance=5).collect()
    assert none == []
