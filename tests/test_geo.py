"""Geospatial grid family: cell density, bucketed radius join,
nearest-hub assignment (functions/geo)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vega_spark.functions.geo import (
    cell_density,
    neighbor_pairs,
    nearest_hub,
    synthetic_coords,
)
from vega_spark.plans.advisor import assert_scale_safe


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id long, lat double, lon double")


def test_neighbor_pairs_finds_cross_cell_pair(spark):
    # A and B straddle a cell boundary (cells differ at r=1.0) but are
    # 0.2 deg apart; C is far away. The 3x3 neighborhood must find
    # (A, B) and nothing else.
    df = _pts(spark, [(1, 0.9, 0.0), (2, 1.1, 0.0), (3, 50.0, 50.0)])
    got = neighbor_pairs(df, "id", radius_deg=1.0).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(1, 2)]
    assert abs(got[0].dist2 - 0.04) < 1e-9


def test_neighbor_pairs_excludes_beyond_radius(spark):
    # same cell, but distance 0.9 > r=0.5
    df = _pts(spark, [(1, 0.05, 0.0), (2, 0.45, 0.8)])
    assert neighbor_pairs(df, "id", radius_deg=0.5).count() == 0


def test_cell_density_counts_and_order(spark):
    df = _pts(spark, [(i, 10.5, 20.5) for i in range(3)]
              + [(10, -5.5, 3.5), (11, -5.5, 3.5)] + [(20, 80.0, 0.0)])
    got = cell_density(df, cell_deg=1.0, top=2).collect()
    assert [(r.cell_x, r.cell_y, r.n) for r in got] == [
        (10, 20, 3), (-6, 3, 2)]


def test_nearest_hub_assigns_and_breaks_ties_by_hub_id(spark):
    hubs = _pts(spark, [(1, 0.0, 0.0), (2, 10.0, 0.0)])
    # p1 near hub1, p2 near hub2, p3 EXACTLY between -> lower hub id
    pts = _pts(spark, [(100, 1.0, 0.0), (101, 9.0, 0.0), (102, 5.0, 0.0)])
    got = {r.hub: r.n_points
           for r in nearest_hub(pts, hubs, "id", "id").collect()}
    assert got == {1: 2, 2: 1}


def test_synthetic_coords_in_range_and_deterministic(spark):
    df = synthetic_coords(
        spark.range(200).withColumnRenamed("id", "k"), "k")
    row = df.agg(F.min("lat"), F.max("lat"), F.min("lon"),
                 F.max("lon")).collect()[0]
    assert -90 <= row[0] and row[1] < 90
    assert -180 <= row[2] and row[3] < 180
    a = df.orderBy("k").limit(5).collect()
    b = synthetic_coords(
        spark.range(200).withColumnRenamed("id", "k"),
        "k").orderBy("k").limit(5).collect()
    assert a == b


def test_geo_plans_scale_safe(spark, sf_dir):
    from vega_spark.registry import QUERIES
    for name in ("geo_cell_density_customers",
                 "geo_neighbor_pairs_customers",
                 "geo_nearest_hub_nations"):
        assert_scale_safe(QUERIES[name](spark, sf_dir))


def test_trajectory_length_known_path(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    # user walks a right triangle: (0,0) -> (0,3) -> (4,3): 3 + 4 = 7
    rows = [(1, base, 1, 0.0, 0.0),
            (1, base + dt.timedelta(minutes=1), 2, 0.0, 3.0),
            (1, base + dt.timedelta(minutes=2), 3, 4.0, 3.0)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "lat double, lon double")
    from vega_spark.functions.geo import trajectory_length
    got = trajectory_length(df, "user_id", "ts", "event_id").collect()
    assert got[0].n_steps == 2
    assert abs(got[0].path_deg - 7.0) < 1e-6


def test_copresence_counts_shared_buckets(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 10.1, 10.1), (2, base, 10.2, 10.2),  # same cell+hour
        (1, base + dt.timedelta(hours=1), 10.1, 10.1),
        (2, base + dt.timedelta(hours=1), 10.3, 10.3),  # again together
        (3, base, 50.0, 50.0),                          # elsewhere
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, lat double, lon double")
    from vega_spark.functions.geo import copresence_pairs
    got = copresence_pairs(df, "user_id", "ts", cell_deg=1.0).collect()
    assert [(r.k1, r.k2, r.n_shared) for r in got] == [(1, 2, 2)]


def test_copresence_hot_bucket_cap(spark):
    # 30 users in ONE (hour, cell) bucket: with max_bucket=4 only
    # pairs among the 4 lowest keys survive; the library default is
    # exhaustive (max_bucket=None — r5 ADVICE: no silent truncation
    # in library calls; the registry entry point opts into 1000).
    from vega_spark.functions.geo import copresence_pairs
    rows = [(u, "2026-01-01 10:00:00", 10.5, 20.5) for u in range(30)]
    df = spark.createDataFrame(rows, "user_id long, ts string, lat double, lon double") \
        .withColumn("ts", F.to_timestamp("ts"))
    capped = copresence_pairs(df, "user_id", "ts", top=100, max_bucket=4)
    got = {(r.k1, r.k2) for r in capped.collect()}
    assert got == {(a, b) for a in range(4) for b in range(a + 1, 4)}
    full = copresence_pairs(df, "user_id", "ts", top=1000, max_bucket=None)
    dflt = copresence_pairs(df, "user_id", "ts", top=1000)
    assert full.count() == 30 * 29 // 2 == dflt.count()
