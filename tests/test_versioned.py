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
