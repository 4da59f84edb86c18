"""Core ops + actions, mirroring reference tests/test_rdd.rs
(FIXTURES F1/F2): distinct/reduce/fold/first/take/max/min/is_empty,
with the reference's pinned empty-input edge semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vega_spark.operators import actions
from vega_spark.operators.core import (
    filter_rows,
    flat_map,
    glom,
    key_by,
    map_partitions,
    map_partitions_with_index,
    select_map,
)


def ints(spark, values, parts=2):
    if not values:
        return spark.createDataFrame([], "value int")
    return spark.createDataFrame([(v,) for v in values], "value int").repartition(parts)


def test_map_filter(spark):
    df = ints(spark, [1, 2, 3, 4])
    out = select_map(df, (F.col("value") * 2).alias("value"))
    assert sorted(r.value for r in out.collect()) == [2, 4, 6, 8]
    out = filter_rows(df, F.col("value") % 2 == 0)
    assert sorted(r.value for r in out.collect()) == [2, 4]


def test_flat_map(spark):
    # reference: flat_map x -> [x, x, x] (tests/test_rdd.rs:62-66)
    df = ints(spark, [1, 2, 3])
    out = flat_map(df, F.array(F.col("value"), F.col("value"), F.col("value")), "v")
    assert sorted(r.v for r in out.collect()) == [1, 1, 1, 2, 2, 2, 3, 3, 3]


def test_distinct_stability_across_partitions(spark):
    # reference tests/test_rdd.rs:286-322: distinct stable for 1..6 parts
    data = [1, 2, 2, 2, 3, 3, 3, 4, 4, 5]
    for p in (1, 2, 3, 6):
        out = ints(spark, data, p).distinct()
        assert sorted(r.value for r in out.collect()) == [1, 2, 3, 4, 5]


def test_reduce_none_on_empty(spark):
    # reference returns Option: None on empty (src/rdd/rdd.rs:274-290)
    assert actions.reduce_col(ints(spark, []), "value", F.sum("value")) is None
    assert actions.reduce_col(ints(spark, [1, 2, 3]), "value", F.sum("value")) == 6


def test_fold_neutral_zero(spark):
    assert actions.fold_col(ints(spark, [1, 2, 3, 4]), "value", 0, F.sum("value")) == 10
    assert actions.fold_col(ints(spark, []), "value", 0, F.sum("value")) == 0


def test_aggregate_multi(spark):
    row = actions.aggregate_cols(
        ints(spark, [1, 2, 3, 4]),
        [F.sum("value").alias("s"), F.count(F.lit(1)).alias("c")])
    assert (row["s"], row["c"]) == (10, 4)


def test_first_error_on_empty(spark):
    # reference panics on empty first (src/rdd/rdd.rs:533-543)
    with pytest.raises(ValueError):
        actions.first(ints(spark, []))
    assert actions.first(ints(spark, [7]).orderBy("value"))["value"] == 7


def test_take_and_empty(spark):
    assert actions.take(ints(spark, []), 1) == []
    assert len(actions.take(ints(spark, [1, 2, 3]), 2)) == 2


def test_max_min_is_empty(spark):
    df = ints(spark, [13, 28, 3, 4, 51, 103, 12, 113, 19])
    assert actions.max_col(df, "value") == 113
    assert actions.min_col(df, "value") == 3
    assert actions.is_empty(ints(spark, []))
    assert not actions.is_empty(df)


def test_count_by_value(spark):
    df = ints(spark, [1, 1, 2, 2, 2, 3])
    out = {r.value: r["count"] for r in actions.count_by_value(df).collect()}
    assert out == {1: 2, 2: 3, 3: 1}


def test_glom_covers_all_rows(spark):
    df = ints(spark, list(range(10)), 3)
    out = glom(df).collect()
    assert sum(len(r["items"]) for r in out) == 10


def test_key_by(spark):
    df = ints(spark, [1, 2, 3])
    out = key_by(df, F.col("value") % 2, "k").collect()
    assert sorted((r.k, r.value) for r in out) == [(0, 2), (1, 1), (1, 3)]


def test_map_partitions(spark):
    df = ints(spark, list(range(100)), 4)

    def double(batches):
        for b in batches:
            yield b.assign(value=b["value"] * 2)

    out = map_partitions(df, double, "value int")
    assert sorted(r.value for r in out.collect()) == [2 * v for v in range(100)]


def test_map_partitions_with_index(spark):
    df = ints(spark, list(range(20)), 4)

    def tag(pid, batches):
        import pandas as pd
        n = sum(len(b) for b in batches)
        yield pd.DataFrame({"pid": [pid], "n": [n]})

    out = map_partitions_with_index(df, tag, "pid int, n long").collect()
    assert sum(r.n for r in out) == 20
    assert len({r.pid for r in out}) == len(out)  # distinct partition ids


def test_save_and_read_back(spark, tmp_path):
    df = ints(spark, [1, 2, 3, 4], 2)
    path = str(tmp_path / "out_parquet")
    actions.save_as_parquet(df, path)
    assert sorted(r.value for r in spark.read.parquet(path).collect()) == [1, 2, 3, 4]
    tpath = str(tmp_path / "out_text")
    actions.save_as_text(df.select(F.col("value").cast("string")), tpath)
    back = spark.read.csv(tpath, schema="value string")
    assert sorted(int(r.value) for r in back.collect()) == [1, 2, 3, 4]


def test_sample_stratified_fractions(spark, sf_dir):
    from vega_spark.operators.sampling import sample_stratified
    from vega_spark.tables import load_table
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    totals = {r.event_type: r.n for r in
              ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    out = sample_stratified(ev, "event_type",
                            {"click": 0.5, "purchase": 1.0}, seed=7)
    got = {r.event_type: r.n for r in
           out.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(got) <= {"click", "purchase"}          # unlisted strata -> 0
    assert got.get("purchase", 0) == totals["purchase"]  # fraction 1.0 keeps all
    frac = got.get("click", 0) / totals["click"]
    assert 0.3 <= frac <= 0.7                          # Bernoulli around 0.5
    # seeded determinism
    again = sample_stratified(ev, "event_type",
                              {"click": 0.5, "purchase": 1.0}, seed=7)
    assert sorted(r.event_id for r in out.collect()) == \
        sorted(r.event_id for r in again.collect())


def test_sample_deterministic_per_key(spark):
    from vega_spark.operators.sampling import sample_deterministic_per_key
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(30)], "id long, g string")
    a = sorted((r.g, r.id) for r in
               sample_deterministic_per_key(df, "g", 2, "id").collect())
    b = sorted((r.g, r.id) for r in
               sample_deterministic_per_key(df, "g", 2, "id").collect())
    assert a == b                       # reproducible
    assert len(a) == 6                  # exactly k per key
    assert len({g for g, _ in a}) == 3


def test_observe_metrics_no_extra_pass(spark):
    from pyspark.sql import functions as F
    from vega_spark.operators.actions import with_observed_metrics
    df = spark.createDataFrame(
        [(1, None), (2, 5.0), (3, 7.0)], "id long, v double")
    observed, fetch = with_observed_metrics(
        df, "m", n=F.count(F.lit(1)), nulls=F.sum(F.isnull("v").cast("int")),
        total=F.sum("v"))
    assert observed.count() == 3           # the action that feeds observe
    m = fetch()
    assert m["n"] == 3 and m["nulls"] == 1 and m["total"] == 12.0


def test_conf_for_scale_100tb_arithmetic():
    from vega_spark.session import conf_for_scale
    # 100 TB on 1000 executors x 8 cores, 32 GB/executor -> 4 GB/core
    conf = conf_for_scale(100 * 1024**4, 8000, 4 * 1024**3)
    n = int(conf["spark.sql.shuffle.partitions"])
    # partitions sized so a decoded shuffle partition fits spill-free
    assert n * (4 * 1024**3 // 3) >= 100 * 1024**4
    assert n >= 16000  # at least 2x cores
    assert int(conf["spark.sql.files.maxPartitionBytes"]) == 128 * 1024**2
    assert int(conf["spark.sql.autoBroadcastJoinThreshold"]) <= 512 * 1024**2


def test_conf_for_scale_small_input_fills_cluster():
    from vega_spark.session import conf_for_scale
    conf = conf_for_scale(1024**3, 64, 4 * 1024**3)  # 1 GB on 64 cores
    assert int(conf["spark.sql.shuffle.partitions"]) == 128  # 2x cores floor
    # scan splits shrink so all 64 cores participate
    assert int(conf["spark.sql.files.maxPartitionBytes"]) < 128 * 1024**2


def test_stratified_sample_deterministic_fractions_and_rerun(spark):
    from vega_spark.operators.sampling import stratified_sample_deterministic
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, s string")
    kept = stratified_sample_deterministic(df, "s", {"a": 0.5, "b": 0.1},
                                           "id")
    counts = {r.s: r.n for r in
              kept.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(counts["a"] / 2000 - 0.5) < 0.06
    assert abs(counts["b"] / 2000 - 0.1) < 0.04
    # identical selection on rerun (no RNG anywhere)
    again = {r.id for r in stratified_sample_deterministic(
        df, "s", {"a": 0.5, "b": 0.1}, "id").select("id").collect()}
    assert {r.id for r in kept.select("id").collect()} == again
    # default fraction 0.0 drops unlisted strata entirely
    extra = spark.createDataFrame([(99999, "c")], "id long, s string")
    none = stratified_sample_deterministic(
        df.unionAll(extra), "s", {"a": 0.5, "b": 0.1}, "id")
    assert none.filter(F.col("s") == "c").count() == 0
