"""Versioned table snapshots (operators/versioned.py) — lakehouse
time travel / snapshot isolation on plain parquet + atomic pointer.
Capability superset (reference's only sink: save_as_text_file,
src/rdd/rdd.rs:254-272)."""

from __future__ import annotations

import os
import tempfile

import pytest

from vega_spark.operators import versioned as V


def test_commit_read_time_travel(spark):
    tdir = tempfile.mkdtemp(prefix="vt_")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    assert V.commit_snapshot(df1, tdir, note="v1") == 1
    df2 = spark.createDataFrame([(1, "a2")], "id int, s string")
    assert V.commit_snapshot(df2, tdir, note="v2") == 2
    # latest resolves to v2; v1 remains readable and intact
    assert V.current_version(tdir) == 2
    assert V.read_snapshot(spark, tdir).count() == 1
    old = {(r.id, r.s) for r in V.read_snapshot(spark, tdir, 1).collect()}
    assert old == {(1, "a"), (2, "b")}


def test_history_and_unknown_version(spark):
    tdir = tempfile.mkdtemp(prefix="vt_")
    V.commit_snapshot(spark.range(3), tdir, note="first")
    V.commit_snapshot(spark.range(5), tdir, note="second")
    h = {r.version: r for r in V.history(spark, tdir).collect()}
    assert h[1].note == "first" and not h[1].is_current
    assert h[2].is_current
    with pytest.raises(ValueError):
        V.read_snapshot(spark, tdir, version=99)
    with pytest.raises(ValueError):
        V.read_snapshot(spark, tempfile.mkdtemp(prefix="vt_empty_"))


def test_pointer_flip_is_atomic_artifact(spark):
    # the commit protocol leaves no _latest.tmp behind and the
    # pointer always names a fully-written snapshot
    tdir = tempfile.mkdtemp(prefix="vt_")
    V.commit_snapshot(spark.range(10), tdir)
    assert not os.path.exists(os.path.join(tdir, "_latest.tmp"))
    v = V.current_version(tdir)
    assert os.path.isdir(os.path.join(tdir, f"v{v:05d}"))


def test_data_skipping_prunes_files_and_preserves_results(spark):
    # range-partitioned snapshot → disjoint per-file id bands → a
    # narrow predicate must skip most files while the pruned read
    # returns exactly what a full scan + filter would
    tdir = tempfile.mkdtemp(prefix="vt_skip_")
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    V.commit_snapshot(df.repartitionByRange(8, "k"), tdir,
                      stats_cols=["k"])
    kept, total = V.plan_pruned_files(tdir, {"k": (100, 120)})
    assert total == 8 and 1 <= len(kept) < total
    got = {r.k for r in V.read_snapshot_pruned(
        spark, tdir, {"k": (100, 120)}).collect()}
    assert got == set(range(100, 121))
    # open-ended bounds
    assert V.read_snapshot_pruned(
        spark, tdir, {"k": (990, None)}).count() == 10
    assert V.read_snapshot_pruned(
        spark, tdir, {"k": (None, 9)}).count() == 10


def test_data_skipping_conservative_without_stats(spark):
    # no stats collected → every file kept, result still correct;
    # fully-disjoint predicate → zero files, empty frame, schema kept
    tdir = tempfile.mkdtemp(prefix="vt_skip_")
    V.commit_snapshot(spark.range(100).withColumnRenamed("id", "k")
                      .repartition(4), tdir)
    kept, total = V.plan_pruned_files(tdir, {"k": (10, 20)})
    assert len(kept) == total > 0
    assert V.read_snapshot_pruned(spark, tdir, {"k": (10, 20)}).count() == 11
    tdir2 = tempfile.mkdtemp(prefix="vt_skip_")
    V.commit_snapshot(spark.range(100).withColumnRenamed("id", "k")
                      .repartitionByRange(4, "k"), tdir2, stats_cols=["k"])
    empty = V.read_snapshot_pruned(spark, tdir2, {"k": (5000, 6000)})
    assert empty.count() == 0 and empty.columns == ["k"]


def test_data_skipping_timestamp_stats_roundtrip(spark):
    # temporal min/max must survive the JSON manifest round-trip
    from datetime import datetime

    tdir = tempfile.mkdtemp(prefix="vt_skip_")
    rows = [(i, datetime(2024, 1, 1 + i)) for i in range(12)]
    df = spark.createDataFrame(rows, "k int, ts timestamp")
    V.commit_snapshot(df.repartitionByRange(4, "ts"), tdir,
                      stats_cols=["ts"])
    kept, total = V.plan_pruned_files(
        tdir, {"ts": (datetime(2024, 1, 3), datetime(2024, 1, 5))})
    assert total == 4 and len(kept) < total
    got = V.read_snapshot_pruned(
        spark, tdir,
        {"ts": (datetime(2024, 1, 3), datetime(2024, 1, 5))})
    assert {r.k for r in got.collect()} == {2, 3, 4}


def test_vacuum_keeps_current_and_history(spark):
    tdir = tempfile.mkdtemp(prefix="vt_")
    for i in range(4):
        V.commit_snapshot(spark.range(i + 1), tdir)
    dropped = V.vacuum(tdir, keep_last=2)
    assert dropped == [1, 2]
    # old data gone, history still lists all versions
    assert not os.path.isdir(os.path.join(tdir, "v00001"))
    assert V.history(spark, tdir).count() == 4
    assert V.read_snapshot(spark, tdir, 4).count() == 4
    with pytest.raises(Exception):
        V.read_snapshot(spark, tdir, 1).count()


def test_bloom_index_point_lookup_prunes_without_false_negatives(spark):
    from pyspark.sql import functions as F

    tdir = tempfile.mkdtemp(prefix="vt_bloom_")
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    V.commit_snapshot(df.repartition(8, "k"), tdir)
    V.add_bloom_index(spark, tdir, "k", m_bits=1 << 13, k=3)
    # every present key is found (no false negatives), with pruning
    pruned_any = False
    for probe in (0, 17, 555, 1999):
        kept, total = V.plan_bloom_files(tdir, "k", probe)
        assert total == 8 and 1 <= len(kept)
        pruned_any |= len(kept) < total
        got = V.read_snapshot_point(spark, tdir, "k", probe).collect()
        assert [(r.k, r.v) for r in got] == [(probe, probe * 2)]
    assert pruned_any
    # absent key: result empty regardless of FP survivors
    assert V.read_snapshot_point(spark, tdir, "k", 999999).count() == 0
    # un-indexed column: conservative (all files kept), still correct
    kept, total = V.plan_bloom_files(tdir, "v", 10)
    assert len(kept) == total
    assert V.read_snapshot_point(spark, tdir, "v", 10).count() == 1


def test_change_feed_classifies_and_round_trips(spark):
    from pyspark.sql import functions as F

    tdir = tempfile.mkdtemp(prefix="vt_cdf_")
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double")
    V.commit_snapshot(v1, tdir)
    v2 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", 40.0)],
        "k long, s string, v double")
    V.commit_snapshot(v2, tdir)
    feed = V.change_feed(spark, tdir, 1, 2, ["k"])
    got = {r.k: r for r in feed.collect()}
    assert set(got) == {2, 3, 4}           # 1 unchanged → absent
    assert got[2].op == "update" and got[2].s == "B"
    assert got[3].op == "delete" and got[3].s is None and got[3].v is None
    assert got[4].op == "insert" and got[4].v == 40.0
    # applying the feed to v1 reproduces v2 exactly
    from vega_spark.operators.merge import apply_changes
    changes = (feed.withColumn(
        "op", F.when(F.col("op") == "delete", "delete")
        .otherwise("upsert")).withColumn("seq", F.lit(1)))
    applied = apply_changes(V.read_snapshot(spark, tdir, 1), changes,
                            ["k"], ["seq"])
    a = {(r.k, r.s, r.v) for r in applied.collect()}
    b = {(r.k, r.s, r.v) for r in V.read_snapshot(spark, tdir, 2).collect()}
    assert a == b


def test_zorder_layout_prunes_both_dimensions(spark):
    from pyspark.sql import functions as F

    from vega_spark.operators.layout import zorder_key

    # 64x64 grid of (x, y) points, Z-order clustered into 16 files:
    # a band predicate on EITHER dimension must prune files
    tdir = tempfile.mkdtemp(prefix="vt_z2d_")
    df = (spark.range(0, 4096)
          .select((F.col("id") % 64).alias("x"),
                  (F.col("id") / 64).cast("long").alias("y")))
    z = zorder_key([F.col("x"), F.col("y")], bits=8)
    arranged = (df.withColumn("__z", z)
                .repartitionByRange(16, "__z")
                .sortWithinPartitions("__z").drop("__z"))
    V.commit_snapshot(arranged, tdir, stats_cols=["x", "y"])
    kx, total = V.plan_pruned_files(tdir, {"x": (0, 15)})
    ky, _ = V.plan_pruned_files(tdir, {"y": (0, 15)})
    kxy, _ = V.plan_pruned_files(tdir, {"x": (0, 15), "y": (0, 15)})
    assert total == 16
    assert len(kx) < total and len(ky) < total
    assert len(kxy) <= min(len(kx), len(ky))
    got = V.read_snapshot_pruned(
        spark, tdir, {"x": (0, 15), "y": (0, 15)})
    assert got.count() == 16 * 16


def test_delete_keys_rewrites_only_affected_files(spark):
    from pyspark.sql import functions as F

    tdir = tempfile.mkdtemp(prefix="vt_del_")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    V.commit_snapshot(df.repartition(10, "k"), tdir,
                      stats_cols=["k"])
    V.add_bloom_index(spark, tdir, "k", m_bits=1 << 13)
    res = V.delete_keys(spark, tdir, "k", [5, 800])
    # copy-on-write: only the files that can hold the keys rewrite
    assert res["version"] == 2
    assert res["deleted_rows"] == 2
    assert 1 <= res["rewritten"] <= 4 and res["linked"] >= 6
    assert res["rewritten"] + res["linked"] >= 10 - res["rewritten"]
    # new version correct; old version intact (time travel)
    cur = V.read_snapshot(spark, tdir)
    assert cur.count() == 998
    assert cur.filter(F.col("k").isin([5, 800])).count() == 0
    assert V.read_snapshot(spark, tdir, 1).count() == 1000
    # carried indexes still serve reads on the new version
    kept, total = V.plan_pruned_files(tdir, {"k": (0, 50)})
    assert len(kept) <= total
    got = V.read_snapshot_point(spark, tdir, "k", 801)
    assert [r.k for r in got.collect()] == [801]
    # deleting an absent key is a no-op version bump
    res2 = V.delete_keys(spark, tdir, "k", [999999])
    assert res2["deleted_rows"] == 0
    assert V.read_snapshot(spark, tdir).count() == 998


def test_stream_to_versioned_epochs_and_parity(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from vega_spark.operators.versioned import history, read_snapshot
    from vega_spark.streaming import sources as SS
    from vega_spark.streaming.sinks import stream_to_versioned

    arrivals = str(tmp_path / "arrivals")
    table = str(tmp_path / "table")
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("b", 4), ("a", 5), ("c", 6)],
        "k string, v long")
    df.repartition(3).write.parquet(arrivals)

    q = stream_to_versioned(
        SS.stream_parquet(spark, arrivals, "k string, v long",
                          max_files_per_trigger=1),
        table, ["k"], {"n": F.count(F.lit(1)), "s": F.sum("v")},
        checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    assert history(spark, table).count() == 3  # one version per epoch
    got = {(r.k, r.n, r.s) for r in read_snapshot(spark, table).collect()}
    assert got == {("a", 3, 8), ("b", 2, 7), ("c", 1, 6)}
    # earlier versions are readable (time travel over the ingest)
    v1 = read_snapshot(spark, table, version=1)
    assert 0 < v1.agg(F.sum("n")).collect()[0][0] < 6
    assert os.path.isfile(os.path.join(table, "_latest"))


def test_upsert_sink_foreachbatch_body_is_idempotent(spark, tmp_path):
    # the exactly-once contract: re-running an epoch's body with the
    # SAME batch must leave the maintained table unchanged
    import os

    from vega_spark.operators.merge import merge_into

    target_path = str(tmp_path / "maintained")
    batch = spark.createDataFrame(
        [(1, "x"), (2, "y")], "k long, v string")
    batch.write.parquet(target_path)

    def epoch_body(b):
        target = spark.read.parquet(target_path)
        merged = merge_into(target, b.select(*target.columns), ["k"],
                            broadcast_source=True)
        tmp = target_path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        old = target_path + ".old"
        os.rename(target_path, old)
        os.rename(tmp, target_path)
        import shutil
        shutil.rmtree(old)

    delta = spark.createDataFrame([(2, "y2"), (3, "z")], "k long, v string")
    epoch_body(delta)
    after_once = sorted(tuple(r) for r in
                        spark.read.parquet(target_path).collect())
    epoch_body(delta)  # redelivery of the same epoch
    after_twice = sorted(tuple(r) for r in
                         spark.read.parquet(target_path).collect())
    assert after_once == after_twice == [(1, "x"), (2, "y2"), (3, "z")]


def test_optimize_table_disjoint_ranges_and_content(spark, tmp_path):
    from pyspark.sql import functions as F

    from vega_spark.operators.versioned import (commit_snapshot,
                                                optimize_table,
                                                plan_pruned_files,
                                                read_snapshot)
    table = str(tmp_path / "t")
    df = spark.range(0, 10_000).selectExpr("id AS k", "id % 7 AS v")
    commit_snapshot(df.repartition(12), table, stats_cols=["k"])
    before_kept, before_total = plan_pruned_files(table, {"k": (0, 100)})
    assert len(before_kept) == before_total  # hash layout: no skipping
    v = optimize_table(spark, table, ["k"], n_files=6)
    assert v == 2
    after_kept, after_total = plan_pruned_files(table, {"k": (0, 100)})
    assert after_total == 6 and len(after_kept) <= 2  # clustered: skips
    a = read_snapshot(spark, table, 1).agg(F.sum("k"), F.sum("v")).collect()
    b = read_snapshot(spark, table, 2).agg(F.sum("k"), F.sum("v")).collect()
    assert a == b


def test_tag_version_pins_snapshot_by_name(spark, tmp_path):
    import pytest

    from vega_spark.operators.versioned import (commit_snapshot, read_tag,
                                                tag_version)
    table = str(tmp_path / "t")
    commit_snapshot(spark.range(0, 10), table)
    tag_version(table, "audit-2024")          # tags v1
    commit_snapshot(spark.range(0, 99), table)
    # the tag still reads v1 even though _latest moved to v2
    assert read_tag(spark, table, "audit-2024").count() == 10
    assert tag_version(table, "latest-now") == 2
    assert read_tag(spark, table, "latest-now").count() == 99
    with pytest.raises(ValueError):
        read_tag(spark, table, "nope")
    with pytest.raises(ValueError):
        tag_version(table, "bad", version=7)


def test_stream_to_versioned_min_max_merge_fns(spark, tmp_path):
    # ADVICE r2: a min/max metric must merge with min/max across
    # epochs, not F.sum — and an undeclared merge fn must not corrupt
    from pyspark.sql import functions as F

    from vega_spark.operators.versioned import read_snapshot
    from vega_spark.streaming import sources as SS
    from vega_spark.streaming.sinks import stream_to_versioned

    arrivals = str(tmp_path / "arrivals")
    table = str(tmp_path / "table")
    df = spark.createDataFrame(
        [("a", 10), ("a", 2), ("b", 30), ("b", 4), ("a", 50), ("c", 6)],
        "k string, v long")
    df.repartition(3).write.parquet(arrivals)

    q = stream_to_versioned(
        SS.stream_parquet(spark, arrivals, "k string, v long",
                          max_files_per_trigger=1),
        table, ["k"],
        {"n": F.count(F.lit(1)), "lo": F.min("v"), "hi": F.max("v")},
        checkpoint=str(tmp_path / "ckpt"),
        merge_fns={"lo": "min", "hi": "max"})
    q.awaitTermination(180)

    got = {(r.k, r.n, r.lo, r.hi)
           for r in read_snapshot(spark, table).collect()}
    assert got == {("a", 3, 2, 50), ("b", 2, 4, 30), ("c", 1, 6, 6)}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="merge_fns"):
        stream_to_versioned(
            SS.stream_parquet(spark, arrivals, "k string, v long"),
            table, ["k"], {"lo": F.min("v")},
            checkpoint=str(tmp_path / "ckpt2"),
            merge_fns={"lo": "avg"})


def test_stream_to_versioned_rejects_stray_merge_fn_key(spark, tmp_path):
    # ADVICE r3: a typo'd merge_fns key must raise, not silently
    # fall back to F.sum for the intended metric
    import pytest
    from pyspark.sql import functions as F

    from vega_spark.streaming import sources as SS
    from vega_spark.streaming.sinks import stream_to_versioned

    arrivals = str(tmp_path / "arrivals")
    spark.createDataFrame([("a", 1)], "k string, v long") \
        .write.parquet(arrivals)
    with pytest.raises(ValueError, match="unknown.*high"):
        stream_to_versioned(
            SS.stream_parquet(spark, arrivals, "k string, v long"),
            str(tmp_path / "table"), ["k"],
            {"hi": F.max("v")},
            checkpoint=str(tmp_path / "ckpt"),
            merge_fns={"high": "max"})
