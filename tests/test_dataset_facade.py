"""End-to-end flows through the VegaContext/VegaDataset facade —
the reference's own examples re-expressed (make_rdd/group_by/join/
file_read from reference examples/)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vega_spark.dataset import VegaContext


def test_make_rdd_map_collect(spark):
    # reference examples/make_rdd.rs
    ctx = VegaContext(spark)
    out = ctx.make_rdd([1, 2, 3, 4], num_slices=2) \
        .map((F.col("value") * 2).alias("value")).collect()
    assert sorted(r.value for r in out) == [2, 4, 6, 8]


def test_chained_pipeline(spark):
    ctx = VegaContext(spark)
    got = (ctx.range(1, 100)
           .filter(F.col("value") % 2 == 0)
           .key_by(F.col("value") % 5, "k")
           .reduce_by_key(["k"], F.sum("value").alias("s"),
                          F.count(F.lit(1)).alias("n"))
           .collect())
    # evens 2..100 grouped by mod 5
    evens = [v for v in range(1, 101) if v % 2 == 0]
    expect = {}
    for v in evens:
        s, n = expect.get(v % 5, (0, 0))
        expect[v % 5] = (s + v, n + 1)
    assert {r.k: (r.s, r.n) for r in got} == expect


def test_join_example(spark):
    # reference examples/join.rs shape
    ctx = VegaContext(spark)
    col1 = [(1, ("A", "B")), (2, ("C", "D")), (3, ("E", "F")), (4, ("G", "H"))]
    left = ctx.make_rdd([(k, a, b) for k, (a, b) in col1], "k int, v1 string, v2 string")
    right = ctx.make_rdd([(1, "A1"), (1, "A2"), (2, "B1"), (2, "B2")], "k int, w string")
    j = left.join(right, on=["k"])
    assert j.count() == 4


def test_actions_and_setops(spark):
    ctx = VegaContext(spark)
    a = ctx.make_rdd([1, 2, 3, 4, 5, 10, 12, 13, 19, 0])
    b = ctx.make_rdd([3, 4, 5, 6, 7, 8, 11, 13])
    assert a.union(b).count() == 18
    assert sorted(r.value for r in a.intersection(b).collect()) == [3, 4, 5, 13]
    assert a.reduce("value", F.sum("value")) == 69
    assert a.max("value") == 19 and a.min("value") == 0
    assert not a.is_empty()
    assert a.top(2, ["value"]).collect()[0].value == 19


def test_file_read_example_flow(spark, tmp_path):
    # reference examples/file_read.rs: read text dir → parse → avg by key
    ctx = VegaContext(spark)
    d = tmp_path / "logs"
    d.mkdir()
    for i in range(3):
        (d / f"f{i}.log").write_text("a x 10\na y 20\nb x 30\n")
    ds = ctx.read_text(str(d))
    parsed = ds.map(
        F.split(F.col("value"), " ")[0].alias("c0"),
        F.split(F.col("value"), " ")[1].alias("c1"),
        F.split(F.col("value"), " ")[2].cast("double").alias("bytes"))
    out = parsed.reduce_by_key(["c0", "c1"], F.avg("bytes").alias("avg_bytes"))
    got = {(r.c0, r.c1): r.avg_bytes for r in out.collect()}
    assert got == {("a", "x"): 10.0, ("a", "y"): 20.0, ("b", "x"): 30.0}


def test_context_union_and_glom(spark):
    ctx = VegaContext(spark)
    parts = [ctx.make_rdd([i, i + 1]) for i in range(3)]
    u = ctx.union(parts)
    assert u.count() == 6
    assert u.glom().count() == u.num_partitions() or u.glom().count() <= u.num_partitions()


def test_cache_and_zip_with_index(spark):
    ctx = VegaContext(spark)
    ds = ctx.make_rdd(["c", "a", "b"]).cache()
    out = ds.zip_with_index(["value"]).collect()
    assert {(r.value, r.idx) for r in out} == {("a", 0), ("b", 1), ("c", 2)}


def test_broadcast_and_accumulator(spark):
    """Broadcast vars + accumulators — both reference gaps (SURVEY
    §2.11; accumulators stubbed at dag_scheduler.rs:23-27)."""
    from vega_spark.dataset import VegaContext
    ctx = VegaContext(spark)
    lookup = ctx.broadcast({1: "one", 2: "two"})
    seen = ctx.accumulator(0)

    ds = ctx.make_rdd([1, 2, 2, 3])

    def tag(batches):
        for pdf in batches:
            seen.add(len(pdf))
            pdf["name"] = pdf["value"].map(lambda v: lookup.value.get(v, "?"))
            yield pdf

    out = ds.map_partitions(tag, "value bigint, name string").collect()
    assert sorted((r.value, r.name) for r in out) == \
        [(1, "one"), (2, "two"), (2, "two"), (3, "?")]
    assert seen.value == 4


def test_local_checkpoint_truncates_lineage(spark):
    """Checkpointing — absent from the reference (SURVEY §2.11).
    localCheckpoint materializes and cuts the logical plan."""
    from vega_spark.dataset import VegaContext
    ds = VegaContext(spark).range(1, 100)
    chained = ds.map((F.col("value") * 2).alias("value")).filter(F.col("value") > 10)
    cp = chained.checkpoint()
    # range end is INCLUSIVE (reference semantics): 1..100, x*2>10 -> x>=6
    assert cp.count() == chained.count() == 95
    # lineage is cut: the checkpointed plan no longer contains the scan
    assert "LogicalRDD" in cp.df._jdf.queryExecution().analyzed().toString()


def test_cache_reuse_measured_scan_multiples(spark):
    """The cache contract's mechanism, end to end at sf0.001: the
    accumulator-fed probe must observe >= 2 source evaluations
    uncached and strictly fewer after VegaDataset.cache() (the second
    action serves from the InMemoryRelation). Inequalities, not exact
    multiples (r5 ADVICE): transformation-stage accumulators are not
    exactly-once under task retries/speculation."""
    from vega_spark import registry
    row = registry.QUERIES["cache_reuse_scan_count"](
        spark, "/root/testdata/sf0.001").collect()[0]
    assert (row.uncached_rescans, row.cached_lt_uncached) == (1, 1)
