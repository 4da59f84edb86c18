"""PMI collocations, Gini concentration, WOE/IV, user growth
(functions/text, operators/stats, functions/mlprep,
functions/analytics)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from vega_spark.functions.analytics import user_growth
from vega_spark.functions.mlprep import woe_iv
from vega_spark.functions.text import pmi_collocations
from vega_spark.operators.stats import gini_by_group
from vega_spark.plans.advisor import assert_scale_safe


def test_pmi_ranks_exclusive_pair_above_common_words(spark):
    # "alpha beta" always co-occur exclusively; "the" pairs with
    # everything -> PMI(alpha, beta) must rank on top
    docs = [("alpha beta",)] * 6 + [("the x",), ("the y",), ("the z",),
                                    ("the w",), ("the v",)]
    df = spark.createDataFrame(docs, "text string")
    got = pmi_collocations(df, "text", min_count=5, top=5).collect()
    assert (got[0].w1, got[0].w2) == ("alpha", "beta")
    # exact PMI: nxy=6, nx=ny=6, nu=22, nb=11
    expect = round(math.log(6 * 22 * 22 / (11 * 6 * 6)), 6)
    assert got[0].pmi == expect


def test_gini_extremes(spark):
    # group a: perfectly equal -> gini 0; group b: one holder -> high
    rows = [(i, "a", 10.0) for i in range(4)]
    rows += [(10, "b", 0.0), (11, "b", 0.0), (12, "b", 0.0),
             (13, "b", 100.0)]
    df = spark.createDataFrame(rows, "id long, k string, v double")
    got = {r.k: r.gini for r in
           gini_by_group(df, "k", "v", "id").collect()}
    assert got["a"] == 0.0
    # rank form with one holder of everything: 2*4/(4*1) - 5/4 = 0.75
    assert got["b"] == 0.75


def test_woe_iv_separating_feature(spark):
    # label=1 concentrated in high bins -> positive woe up top,
    # negative at the bottom, IV clearly > 0
    rows = [(float(v), 1 if v >= 80 else 0) for v in range(100)]
    df = spark.createDataFrame(rows, "value double, y int")
    got = woe_iv(df, F.col("y") == 1, "value", bins=10).collect()
    by_bin = {r.bin: r for r in got}
    assert by_bin[9].woe > 1.0
    assert by_bin[0].woe < 0.0
    assert got[0].iv == got[-1].iv and got[0].iv > 1.0


def test_user_growth_cumulative(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base), (2, base),
            (1, base + dt.timedelta(days=1)),          # not new on day 2
            (3, base + dt.timedelta(days=1)),
            (4, base + dt.timedelta(days=3))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = [(r.new_users, r.cum_users)
           for r in user_growth(df).collect()]
    assert got == [(2, 2), (1, 3), (1, 4)]


def test_concentration_plans_scale_safe(spark, sf_dir):
    from vega_spark.registry import QUERIES
    for name in ("pmi_collocations_docs", "gini_event_values",
                 "woe_iv_purchase_value", "user_growth_daily"):
        assert_scale_safe(QUERIES[name](spark, sf_dir))


def test_temporal_join_scd2_picks_containing_version(spark):
    from vega_spark.functions.analytics import temporal_join_scd2
    dim = spark.createDataFrame(
        [(1, "bronze", 0, 100), (1, "gold", 100, None),
         (2, "silver", 50, None)],
        "user_id long, state string, valid_from long, valid_to long")
    facts = spark.createDataFrame(
        [(1, 99), (1, 100), (1, 500), (2, 10), (3, 7)],
        "user_id long, ts long")
    got = {(r.user_id, r.ts): r.state
           for r in temporal_join_scd2(facts, dim, "user_id",
                                       "ts").collect()}
    assert got == {(1, 99): "bronze", (1, 100): "gold",
                   (1, 500): "gold", (2, 10): None, (3, 7): None}


def test_rfm_segments_scores_and_counts(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 20)
    rows = []
    # whale: active today, 600 events of value 100 -> (4,4,4)
    for i in range(600):
        rows.append((1, base, 100.0))
    # lapsed light user: 1 event 30 days ago, small value -> (1,1,1)
    rows.append((2, base - dt.timedelta(days=30), 1.0))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    from vega_spark.functions.analytics import rfm_segments
    got = {(r.r_score, r.f_score, r.m_score): r.n_users
           for r in rfm_segments(df).collect()}
    assert got == {(4, 4, 4): 1, (1, 1, 1): 1}


def test_scd2_rfm_plans_scale_safe(spark, sf_dir):
    from vega_spark.registry import QUERIES
    for name in ("scd2_temporal_purchases", "rfm_user_segments"):
        assert_scale_safe(QUERIES[name](spark, sf_dir))


def test_active_time_merges_overlapping_windows(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    # user 1: events at 0 and 3 min (windows overlap -> ONE session
    # covering 0..8 min = 480 s); user 2: 0 and 20 min (two disjoint
    # 5-min windows = 600 s)
    rows = [(1, base), (1, base + dt.timedelta(minutes=3)),
            (2, base), (2, base + dt.timedelta(minutes=20))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    from vega_spark.functions.analytics import active_time_per_user
    got = {r.user_id: (r.n_sessions, r.active_s)
           for r in active_time_per_user(df).collect()}
    assert got == {1: (1, 480), 2: (2, 600)}


def test_funnel_time_boxed_enforces_deadlines(spark):
    # user 1: click 30min after view (inside 1h), purchase 2h after
    # click (inside 24h) -> full funnel
    # user 2: click 2h after view -> deadline missed at stage 2
    h = 3_600_000_000
    rows = [(1, "view", 0), (1, "click", h // 2), (1, "purchase", 3 * h),
            (2, "view", 0), (2, "click", 2 * h), (2, "purchase", 3 * h)]
    df = spark.createDataFrame(rows,
                               "user_id long, event_type string, ts_us long")
    from vega_spark.functions.analytics import funnel_time_boxed
    got = funnel_time_boxed(df).collect()[0]
    assert (got.n_stage1, got.n_stage2_within,
            got.n_stage3_within) == (2, 1, 1)


def test_dau_wau_rolling_distinct(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    # user 1 active day 0 and day 8; user 2 active day 0 only.
    # day 0: dau 2, wau 2. day 8: dau 1; wau(8) covers days 2-8 ->
    # only user 1 -> 1. new_users: day0=2, day8=0.
    rows = [(1, base), (2, base), (1, base + dt.timedelta(days=8))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    from vega_spark.functions.analytics import dau_wau
    got = {r.day - int(base.timestamp() // 86400):
           (r.dau, r.wau, r.new_users) for r in dau_wau(df).collect()}
    assert got == {0: (2, 2, 2), 8: (1, 1, 0)}


def test_corr_by_group_exact_signs(spark):
    from vega_spark.operators.stats import corr_by_group
    rows = [("up", float(i), float(2 * i)) for i in range(10)]
    rows += [("down", float(i), float(-3 * i)) for i in range(10)]
    rows += [("flat", float(i), 5.0) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r.k: r.corr for r in corr_by_group(df, "k", "x", "y").collect()}
    assert got["up"] == 1.0 and got["down"] == -1.0
    assert got["flat"] is None


def test_activity_heatmap_shares_sum_to_one(spark, sf_dir):
    from pyspark.sql import functions as FF
    from vega_spark.functions.analytics import activity_heatmap
    from vega_spark.tables import load_table
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", FF.timestamp_micros(FF.expr("ts div 1000")))
    hm = activity_heatmap(ev)
    tot = hm.agg(FF.sum("n"), FF.sum("share")).collect()[0]
    assert tot[0] == ev.count()
    assert abs(tot[1] - 1.0) < 1e-3
    assert hm.count() <= 168


def test_session_depth_buckets_and_bounce(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base)]                                   # bounce
    rows += [(2, base + dt.timedelta(minutes=i)) for i in range(4)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    from vega_spark.functions.analytics import session_depth_stats
    got = {r.depth: (r.n_sessions, r.share)
           for r in session_depth_stats(df).collect()}
    assert got["1 (bounce)"] == (1, 0.5)
    assert got["3-5"] == (1, 0.5)


def test_time_decay_attribution_weights(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1, 12)
    # purchase at noon; view 6h before (one half-life -> 0.5 credit);
    # click 12h before (-> 0.25); old view 2 days before (outside)
    rows = [(1, "purchase", base),
            (1, "view", base - dt.timedelta(hours=6)),
            (1, "click", base - dt.timedelta(hours=12)),
            (1, "view", base - dt.timedelta(days=2))]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp")
    from vega_spark.functions.analytics import time_decay_attribution
    got = {r.channel: (r.n_touches, r.credit)
           for r in time_decay_attribution(df).collect()}
    assert got == {"view": (1, 0.5), "click": (1, 0.25)}


def test_dod_wow_calendar_gap_safe(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    # day 0: 10 events; day 1: 20 (dod +1.0); day 3: 5 — yesterday
    # (day 2) is MISSING, so dod must be NULL, not compared to day 1
    rows = []
    for d, n in ((0, 10), (1, 20), (3, 5)):
        rows += [("view", base + dt.timedelta(days=d, seconds=i))
                 for i in range(n)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    from vega_spark.functions.analytics import dod_wow_change
    got = {r.day - int(base.timestamp() // 86400): r.dod_pct
           for r in dod_wow_change(df).collect()}
    assert got[1] == 1.0
    assert got[3] is None


def test_file_layout_skew_report_contract(spark, sf_dir):
    from vega_spark.registry import QUERIES
    r = QUERIES["file_layout_skew_report"](spark, sf_dir).collect()[0]
    assert r.total_rows > 0
    assert r.files_positive == 1
    assert r.bounds_consistent == 1
