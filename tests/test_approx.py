"""Approximate/partial actions (SURVEY §2.9): deadline semantics,
empty-input contract, exactness when the job finishes in time."""

from __future__ import annotations

import math

from vega_spark.operators import approx as X


def ints(spark, values, parts=4):
    if not values:
        return spark.createDataFrame([], "value int")
    return spark.createDataFrame([(v,) for v in values], "value int").repartition(parts)


def test_count_approx_exact_when_time_allows(spark):
    df = ints(spark, list(range(500)), 4)
    r = X.count_approx(df, timeout_ms=60_000)
    assert r.is_exact() and r.mean == 500 and r.confidence == 1.0


def test_count_approx_empty_contract(spark):
    # reference count_evaluator.rs:41-47 → (0, 0, 0, inf)
    r = X.count_approx(ints(spark, []), timeout_ms=60_000)
    assert r.mean == 0 and r.is_exact()


def test_count_approx_partial_extrapolates(spark):
    df = ints(spark, list(range(2000)), 16)
    # timeout 0 → only the first chunk runs; extrapolation must be
    # within a sane band and the interval must contain the mean
    r = X.count_approx(df, timeout_ms=0, chunk=4)
    assert 0 < r.mean <= 4000
    assert r.low <= r.mean <= r.high
    if not r.is_exact():
        assert r.confidence == 0.95


def test_count_by_value_approx_exact(spark):
    df = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2, "k string").repartition(2)
    got = X.count_by_value_approx(df, ["k"], timeout_ms=60_000)
    assert got[("a",)].mean == 3 and got[("b",)].mean == 2
    assert all(v.is_exact() for v in got.values())


def test_sum_approx_exact(spark):
    df = ints(spark, list(range(101)), 4)
    r = X.sum_approx(df, "value", timeout_ms=60_000)
    assert r.is_exact() and r.mean == 5050


def test_approx_count_distinct_tolerance(spark):
    df = ints(spark, list(range(1000)) * 2, 4)
    got = X.approx_count_distinct(df, "value", rsd=0.02).first()["approx_distinct"]
    assert math.isclose(got, 1000, rel_tol=0.1)


def test_percentile_approx(spark):
    df = ints(spark, list(range(1, 102)), 4)
    ps = X.percentile_approx(df, "value", [0.5]).first()["percentiles"]
    assert abs(ps[0] - 51) <= 2


# --- mergeable HLL sketches (operators/sketches.py) ---------------------------

def test_hll_merge_equals_one_shot(spark):
    from vega_spark.operators import sketches as SK
    import pyspark.sql.functions as F
    rows = [(k % 3, f"u{k % 97}") for k in range(2000)]
    df = spark.createDataFrame(rows, "grp int, uid string").repartition(8)
    shard = df.withColumn("shard", F.abs(F.hash("uid")) % 4)
    partials = SK.hll_partial(shard, ["grp", "shard"], "uid")
    merged = {r.grp: r.approx_distinct
              for r in SK.hll_merge(partials, ["grp"]).collect()}
    one = {r.grp: r.approx_distinct
           for r in SK.hll_distinct(df, ["grp"], "uid").collect()}
    assert merged == one          # merge property: rollup == direct


def test_hll_error_bound_large_cardinality(spark):
    from vega_spark.operators import sketches as SK
    df = spark.range(0, 200_000).selectExpr(
        "cast(id % 2 as int) grp", "cast(id as string) uid")
    got = {r.grp: r.approx_distinct
           for r in SK.hll_distinct(df, ["grp"], "uid").collect()}
    for g, n in got.items():
        assert abs(n - 100_000) / 100_000 < 0.05   # lgK=12 → ~1.6% rsd


def test_hll_global_merge_no_keys(spark):
    from vega_spark.operators import sketches as SK
    df = spark.createDataFrame(
        [(d, f"u{u}") for d in range(5) for u in range(30)],
        "day int, uid string")
    partials = SK.hll_partial(df, ["day"], "uid")
    total = SK.hll_merge(partials, []).first()["approx_distinct"]
    assert total == 30            # sparse mode: exact


def test_cms_never_undercounts_and_exactish_when_wide(spark):
    from pyspark.sql import functions as F
    from vega_spark.operators.sketches import cms_build, cms_estimate
    vals = ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + list("defghij")
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    sketch = cms_build(df, "v", depth=4, width=2048)
    q = df.select("v").distinct()
    est = {r.v: r.est_count for r in cms_estimate(sketch, q, "v").collect()}
    true = {r.v: r["count"] for r in df.groupBy("v").count().collect()}
    for v, t in true.items():
        assert est[v] >= t                    # CMS upper bound
    # 10 distinct values in 4x2048 cells: collisions vanishingly rare
    assert est["a"] == 50 and est["b"] == 20 and est["c"] == 5


def test_cms_merge_equals_whole(spark):
    from vega_spark.operators.sketches import cms_build, cms_merge
    a = spark.createDataFrame([("x",)] * 7 + [("y",)] * 3, "v string")
    b = spark.createDataFrame([("x",)] * 5 + [("z",)] * 2, "v string")
    merged = cms_merge(cms_build(a, "v"), cms_build(b, "v"))
    whole = cms_build(a.unionAll(b), "v")
    got = sorted((r.row, r.bucket, r.cnt) for r in merged.collect())
    want = sorted((r.row, r.bucket, r.cnt) for r in whole.collect())
    assert got == want


def test_partial_aggregate_generic_custom_evaluator(spark):
    from vega_spark.operators.approx import partial_aggregate
    df = spark.range(0, 1000, numPartitions=8)
    # custom action: max via the generic framework, exact on full run
    got = partial_aggregate(
        df.rdd,
        lambda it: max((r[0] for r in it), default=None),
        lambda a, p: p if a is None or (p is not None and p > a) else a,
        None,
        lambda acc, done, total: (acc, done, total),
        timeout_ms=60_000)
    assert got == (999, 8, 8)


def test_partial_aggregate_deadline_partial(spark):
    from vega_spark.operators.approx import partial_aggregate
    df = spark.range(0, 1000, numPartitions=8)
    acc, done, total = partial_aggregate(
        df.rdd, lambda it: sum(1 for _ in it), lambda a, p: a + p, 0,
        lambda a, d, t: (a, d, t), timeout_ms=0, chunk=2)
    assert total == 8 and 2 <= done <= 8 and acc == done * 125


def test_mean_approx_exact_and_partial(spark):
    from vega_spark.operators.approx import mean_approx
    df = spark.createDataFrame([(float(i),) for i in range(100)],
                               "value double")
    r = mean_approx(df, "value", timeout_ms=60_000)
    assert r.is_exact() and abs(r.mean - 49.5) < 1e-9
    p = mean_approx(df.repartition(8), "value", timeout_ms=0, chunk=2)
    assert p.low <= p.mean <= p.high


def test_count_by_value_approx_key_cap_overflow(spark):
    # VERDICT r01: the driver-side merge map is the reference's design
    # (grouped_count_evaluator.rs) but must fail EXPLICITLY, not OOM,
    # when cardinality exceeds the cap.
    import pytest
    df = spark.range(0, 500).selectExpr("id AS k")
    with pytest.raises(X.ApproxKeyOverflow):
        X.count_by_value_approx(df, ["k"], timeout_ms=60_000, max_keys=100)
    # under the cap: exact counts, untouched behavior
    got = X.count_by_value_approx(df, ["k"], timeout_ms=60_000, max_keys=1000)
    assert len(got) == 500 and all(v.is_exact() for v in got.values())


def test_kmv_exact_below_k_and_estimate_above(spark):
    from vega_spark.operators import sketches as SK
    # 40 distinct values with heavy duplication, k=64 > ndv: exact
    df = spark.createDataFrame([(i % 40,) for i in range(4000)], "v int")
    sk = SK.kmv_sketch(df, "v", k=64)
    assert sk.count() == 40
    est = SK.kmv_estimate(sk, k=64).first()["ndv_est"]
    assert est == 40.0
    # 5000 distinct, k=256 < ndv: estimator within 15% (md5 uniform)
    big = spark.range(5000).selectExpr("id AS v")
    est2 = SK.kmv_estimate(SK.kmv_sketch(big, "v", k=256), k=256) \
             .first()["ndv_est"]
    assert abs(est2 - 5000) / 5000 < 0.15


def test_kmv_merge_equals_whole_and_set_relations(spark):
    from vega_spark.operators import sketches as SK
    a = spark.range(0, 3000).selectExpr("id AS v")
    b = spark.range(1500, 4500).selectExpr("id AS v")
    k = 256
    merged = SK.kmv_merge(SK.kmv_sketch(a, "v", k),
                          SK.kmv_sketch(b, "v", k), k=k)
    whole = SK.kmv_sketch(a.unionAll(b), "v", k)
    assert ([r.h for r in merged.orderBy("h").collect()]
            == [r.h for r in whole.orderBy("h").collect()])
    rel = SK.kmv_set_relations(SK.kmv_sketch(a, "v", k),
                               SK.kmv_sketch(b, "v", k), k=k).first()
    # truth: |A|=3000 |B|=3000 |A∪B|=4500 |A∩B|=1500 J=1/3
    assert abs(rel["ndv_union_est"] - 4500) / 4500 < 0.2
    assert abs(rel["jaccard_est"] - 1 / 3) < 0.12
    assert abs(rel["intersection_est"] - 1500) / 1500 < 0.35


def test_kmv_grouped_exact_and_merge(spark):
    from vega_spark.operators import sketches as SK
    df = spark.createDataFrame(
        [(("a" if i % 2 == 0 else "b"), i % 50) for i in range(2000)],
        "g string, v int")
    sk = SK.kmv_sketch_by(df, ["g"], "v", k=64)
    est = {r.g: r.ndv_est for r in
           SK.kmv_estimate_by(sk, ["g"], k=64).collect()}
    # group a sees even i -> v in {0,2,..,48}: 25 distinct; b the odds
    assert est == {"a": 25.0, "b": 25.0}
    # merge of per-split partials equals the whole-data sketch
    s1 = SK.kmv_sketch_by(df.filter("v < 25"), ["g"], "v", k=64)
    s2 = SK.kmv_sketch_by(df.filter("v >= 25"), ["g"], "v", k=64)
    merged = SK.kmv_merge_by(s1.unionAll(s2), ["g"], k=64)
    whole = {(r.g, r.h) for r in sk.collect()}
    assert {(r.g, r.h) for r in merged.collect()} == whole


def test_bitmap_rollup_exact_across_batches(spark):
    from vega_spark.operators import sketches as SK
    # ids split across two 'days'; overlap must not double-count
    d1 = spark.createDataFrame([("a", i) for i in range(0, 800)],
                               "g string, uid long")
    d2 = spark.createDataFrame([("a", i) for i in range(400, 1200)]
                               + [("b", 7)], "g string, uid long")
    p = SK.bitmap_partial(d1, ["g"], "uid").unionAll(
        SK.bitmap_partial(d2, ["g"], "uid"))
    got = {r.g: r.n_distinct for r in
           SK.bitmap_merge_count(p, ["g"]).collect()}
    assert got == {"a": 1200, "b": 1}
    # ids crossing the 32k bucket boundary stay exact
    big = spark.createDataFrame(
        [("c", i) for i in range(32760, 32780)], "g string, uid long")
    got2 = SK.bitmap_merge_count(
        SK.bitmap_partial(big, ["g"], "uid"), ["g"]).first()
    assert got2.n_distinct == 20
