"""TF-IDF, funnel, FK-audit semantics (functions/text.tf_idf,
functions/analytics)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vega_spark.functions.analytics import fk_orphans, funnel_stages
from vega_spark.functions.text import tf_idf
from vega_spark.plans import inspect as I


def test_tfidf_values_and_topk(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "apple")],
        "doc_id long, text string")
    out = {(r.doc, r.term): r for r in tf_idf(docs, "text", "doc_id",
                                              top_k=2).collect()}
    # apple: df=2 -> idf = ln(4/3)+1; doc1 tf=2
    idf_apple = math.log(4.0 / 3.0) + 1.0
    assert abs(out[(1, "apple")].tfidf - round(2 * idf_apple, 6)) < 1e-9
    assert out[(1, "apple")].rk == 1            # beats banana in doc 1
    assert out[(3, "apple")].tf == 1
    # every doc emits <= top_k rows
    assert max(r.rk for r in out.values()) <= 2


def test_funnel_ordering_is_strict(spark):
    rows = [
        (1, "view", 10.0), (1, "click", 20.0), (1, "purchase", 30.0),  # full
        (2, "click", 5.0), (2, "view", 10.0),   # click BEFORE view: stage1 only
        (3, "view", 1.0), (3, "click", 2.0),    # no purchase: stage2
        (4, "purchase", 1.0),                   # purchase only: no stages
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, value double") \
        .select("user_id", "event_type",
                F.col("value").cast("timestamp").alias("ts"))
    r = funnel_stages(ev).collect()[0]
    assert (r.n_stage1, r.n_stage2, r.n_stage3) == (3, 2, 1)


def test_funnel_single_exchange(spark):
    ev = spark.createDataFrame(
        [(1, "view", 1.0)], "user_id long, event_type string, value double") \
        .select("user_id", "event_type",
                F.col("value").cast("timestamp").alias("ts"))
    txt = I.plan_text(funnel_stages(ev))
    assert txt.count("hashpartitioning(u") == 1, txt


def test_fk_orphans_counts(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    out = {r.relation: r.n_orphans
           for r in fk_orphans([("c.fk", child, "fk", parent, "pk")]).collect()}
    assert out == {"c.fk": 1}


def test_user_event_gaps_exact_ns(spark):
    from vega_spark.functions.analytics import user_event_gaps
    rows = [(1, 100, 1000), (2, 100, 4000), (3, 100, 6000),  # gaps 3000, 2000
            (4, 200, 500)]                                    # single event
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long")
    out = {r.user_id: r for r in user_event_gaps(df).collect()}
    assert (out[100].n_events, out[100].n_gaps) == (3, 2)
    assert out[100].sum_gap == 5000 and out[100].max_gap == 3000
    assert (out[200].n_gaps, out[200].sum_gap) == (0, 0)
    assert out[200].max_gap is None


def test_user_event_gaps_tiebreak_by_event_id(spark):
    from vega_spark.functions.analytics import user_event_gaps
    # two events at the same ts: ordering must fall back to event_id
    df = spark.createDataFrame(
        [(2, 1, 100), (1, 1, 100), (3, 1, 400)],
        "event_id long, user_id long, ts long")
    r = user_event_gaps(df).first()
    assert r.n_gaps == 2 and r.sum_gap == 300 and r.max_gap == 300


def test_cooccurrence_pairs_counts_and_threshold(spark):
    from vega_spark.functions.analytics import cooccurrence_pairs
    rows = [(1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "b"), (3, "a")]   # dup item in basket ignored
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {(r.item_a, r.item_b): r.n_baskets for r in
           cooccurrence_pairs(df, "basket", "item", min_count=2).collect()}
    assert out == {("a", "b"): 3}           # (a,c) and (b,c) appear once
    all_pairs = {(r.item_a, r.item_b): r.n_baskets for r in
                 cooccurrence_pairs(df, "basket", "item",
                                    min_count=1).collect()}
    assert all_pairs == {("a", "b"): 3, ("a", "c"): 1, ("b", "c"): 1}


def test_cooccurrence_max_basket_cap(spark):
    from vega_spark.functions.analytics import cooccurrence_pairs
    rows = [(1, f"i{k:02d}") for k in range(10)]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = cooccurrence_pairs(df, "basket", "item", min_count=1,
                             max_basket=3).collect()
    # capped to first 3 sorted items -> C(3,2)=3 pairs
    assert len(out) == 3


def test_drift_psi_zero_for_identical_distributions(spark):
    from pyspark.sql import functions as F

    from vega_spark.functions.analytics import drift_psi
    rows = [("a", p, float(v)) for p in ("base", "compare")
            for v in (5, 15, 25, 35)]
    df = spark.createDataFrame(rows, "grp string, per string, value double")
    out = drift_psi(df, "grp", "value", F.col("per"), 0.0, 40.0, 4).collect()
    assert len(out) == 1 and abs(out[0]["psi"]) < 1e-9


def test_drift_psi_detects_shift(spark):
    from pyspark.sql import functions as F

    from vega_spark.functions.analytics import drift_psi
    base = [("a", "base", 5.0)] * 90 + [("a", "base", 35.0)] * 10
    comp = [("a", "compare", 5.0)] * 10 + [("a", "compare", 35.0)] * 90
    df = spark.createDataFrame(base + comp,
                               "grp string, per string, value double")
    out = drift_psi(df, "grp", "value", F.col("per"), 0.0, 40.0, 4).collect()
    assert out[0]["psi"] > 0.25  # major shift


def test_drift_psi_out_of_range_clamps(spark):
    from pyspark.sql import functions as F

    from vega_spark.functions.analytics import drift_psi
    df = spark.createDataFrame(
        [("a", "base", -100.0), ("a", "base", 999.0),
         ("a", "compare", -100.0), ("a", "compare", 999.0)],
        "grp string, per string, value double")
    out = drift_psi(df, "grp", "value", F.col("per"), 0.0, 40.0, 4).collect()
    assert abs(out[0]["psi"]) < 1e-9  # clamped identically both periods


def test_triangle_count_known_graphs(spark):
    from vega_spark.functions.graph import triangle_count
    # K4 + a pendant, with noise: self-loop, duplicate, reversed edge
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 5), (2, 1), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.triangles for r in triangle_count(df).collect()}
    # K4 has 4 triangles, each of nodes 1-4 sits in exactly 3;
    # pendant node 5 is in none (absent from the result)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # star graph: no triangles at all
    star = spark.createDataFrame([(0, i) for i in range(1, 6)],
                                 "src long, dst long")
    assert triangle_count(star).count() == 0


def test_ewma_by_key_fold_semantics(spark):
    from vega_spark.functions.analytics import ewma_by_key
    rows = [(1, i, float(v)) for i, v in enumerate([10, 20, 30, 40])]
    df = spark.createDataFrame(rows, "k int, seq int, v double")
    got = {r.seq: r.ewma for r in
           ewma_by_key(df, "k", ["seq"], "v", alpha=0.3,
                       window_rows=3).collect()}
    # seq 0: seed only; seq 1: 10*.7+20*.3; seq 2 folds 10,20,30;
    # seq 3's frame drops 10 (bounded window restart at 20)
    assert got[0] == 10.0
    assert abs(got[1] - (10 * 0.7 + 20 * 0.3)) < 1e-12
    assert abs(got[2] - ((10 * 0.7 + 20 * 0.3) * 0.7 + 30 * 0.3)) < 1e-12
    assert abs(got[3] - ((20 * 0.7 + 30 * 0.3) * 0.7 + 40 * 0.3)) < 1e-12


def test_key_skew_report_shares_and_order(spark):
    from vega_spark.operators.stats import key_skew_report
    rows = [("hot",)] * 70 + [("warm",)] * 20 + [("cold",)] * 10
    df = spark.createDataFrame(rows, "k string")
    got = key_skew_report(df, ["k"], top_n=2).collect()
    assert [r.k for r in got] == ["hot", "warm"]
    assert got[0].cnt == 70 and got[0].share == 0.7
    # 3 groups, mean size 100/3: hot is 2.1x the mean
    assert got[0].x_mean == 2.1


def test_attribution_first_last_touch_semantics(spark):
    from vega_spark.functions.analytics import attribution_touch
    rows = [
        (1, "view", 10, 100), (1, "click", 20, 101),
        (1, "purchase", 30, 102),            # first=view@10, last=click@20
        (1, "view", 40, 103),
        (1, "purchase", 50, 104),            # first=view@10, last=view@40
        (2, "purchase", 5, 200),             # direct: no touches
        (3, "purchase", 7, 300), (3, "view", 9, 301),  # touch AFTER conv
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts long, event_id long")
    got = {r.conversion_id: r for r in attribution_touch(df).collect()}
    assert (got[102].first_touch_type, got[102].first_touch_ts) == ("view", 10)
    assert (got[102].last_touch_type, got[102].last_touch_ts) == ("click", 20)
    assert (got[104].first_touch_ts, got[104].last_touch_ts) == (10, 40)
    assert got[200].first_touch_type is None
    assert got[300].first_touch_type is None   # strictly-before only


def test_label_propagation_two_cliques(spark):
    from vega_spark.functions.graph import label_propagation
    # two DISCONNECTED triangles: each converges to its own min label
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.community
           for r in label_propagation(df, iters=3).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == got[12] == 10
    # with a bridge the min-tie-break lets small labels bleed across —
    # inherent LPA dynamics; what we pin is DETERMINISM across reruns
    bridged = spark.createDataFrame(edges + [(3, 10)], "src long, dst long")
    a = {r.node: r.community
         for r in label_propagation(bridged, iters=3).collect()}
    b = {r.node: r.community
         for r in label_propagation(bridged, iters=3).collect()}
    assert a == b


def test_inverted_index_and_or_search(spark):
    from vega_spark.functions.search import (build_inverted_index,
                                             search_terms)
    docs = spark.createDataFrame([
        (1, "spark shuffle join"), (2, "spark scan"),
        (3, "shuffle only here"), (4, "nothing relevant")],
        "doc_id long, text string")
    idx = build_inverted_index(docs)
    hit_and = {r.doc_id for r in
               search_terms(idx, ["spark", "shuffle"], "and").collect()}
    assert hit_and == {1}
    hit_or = {r.doc_id for r in
              search_terms(idx, ["spark", "shuffle"], "or").collect()}
    assert hit_or == {1, 2, 3}
    # max_df banding drops stop terms from the index entirely
    idx2 = build_inverted_index(docs, max_df=2)
    assert idx2.filter(F.col("term") == "spark").count() == 2
    docs5 = docs.unionByName(spark.createDataFrame(
        [(5, "spark spark spark")], "doc_id long, text string"))
    idx3 = build_inverted_index(docs5, max_df=2)
    assert idx3.filter(F.col("term") == "spark").count() == 0


def test_personalized_pagerank_concentrates_on_seeds(spark):
    from pyspark.sql import functions as F

    from vega_spark.functions.graph import pagerank, personalized_pagerank

    # path graph 1-2-3-4-5-6 with seed {1}: mass decays with hop
    # distance from the seed, unlike uniform pagerank
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "a long, b long")
    seeds = spark.createDataFrame([(1,)], "u long")
    got = {r.node: r.rank
           for r in personalized_pagerank(edges, "a", "b", seeds,
                                          iters=4).collect()}
    # seed holds the largest mass; the near half dominates the far
    # half (per-hop monotonicity does NOT hold — finite power
    # iteration oscillates by walk parity on bipartite-ish paths)
    assert got[1] == max(got.values())
    assert got[1] + got[2] + got[3] > 3 * (got[4] + got[5] + got[6])
    # far end gets (almost) nothing; uniform PR gives it real mass
    upr = {r.node: r.rank for r in pagerank(edges, "a", "b",
                                            iters=4).collect()}
    assert got[6] < 0.05 and upr[6] > 0.4


def test_personalized_pagerank_seed_restart_mass(spark):
    from vega_spark.functions.graph import personalized_pagerank
    # two disconnected components; seeding only component A leaves
    # component B at exactly zero through every iteration
    edges = spark.createDataFrame([(1, 2), (3, 4)], "a long, b long")
    seeds = spark.createDataFrame([(1,)], "u long")
    got = {r.node: r.rank
           for r in personalized_pagerank(edges, "a", "b", seeds,
                                          iters=3).collect()}
    assert got[3] == 0.0 and got[4] == 0.0 and got[1] > 0 and got[2] > 0


def test_theil_sen_robust_to_outlier_day(spark):
    import datetime

    from vega_spark.functions.analytics import theil_sen_daily_trend

    # days 0..9 with n = 100 + 10*day, except day 5 spikes to 5000:
    # OLS would bend hard; the Theil-Sen median slope stays ~10/day
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(10):
        n = 5000 if d == 5 else 100 + 10 * d
        ts_ns = int((base + datetime.timedelta(days=d)).timestamp()) \
            * 1_000_000_000
        for _ in range(n):
            rows.append((eid, ts_ns))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts long")
    r = theil_sen_daily_trend(ev).collect()[0]
    assert r.n_days == 10 and r.n_pairs == 45
    assert abs(r.slope_micro - 10_000_000) < 2_000_000  # ~10 events/day


def test_diff_in_diff_constructed_effect(spark):
    import datetime

    from vega_spark.functions.analytics import diff_in_diff

    # control means 10 -> 12 (+2); treated 10 -> 15 (+5): DiD = +3.00
    def ts_ns(day):
        return int(datetime.datetime(2024, 1, day).timestamp()) \
            * 1_000_000_000

    rows = []
    for uid, day, val in [(2, 10, 10.0), (2, 20, 15.0),   # treated (even)
                          (1, 10, 10.0), (1, 20, 12.0)]:  # control (odd)
        for i in range(5):
            rows.append((uid, ts_ns(day) + i, val))
    ev = spark.createDataFrame(rows, "user_id long, ts long, value double")
    r = diff_in_diff(ev).collect()[0]
    # mean_micro = floor(1e4 * cents / n) -> dollars in 1e-6 units
    assert (r.t_pre, r.t_post, r.c_pre, r.c_post) == (
        10_000_000, 15_000_000, 10_000_000, 12_000_000)
    assert r.did_micro == 3_000_000


def test_cuped_perfect_covariate_collapses_variants(spark):
    import datetime

    from vega_spark.functions.analytics import cuped_adjusted_means

    # every user's post metric EQUALS their pre covariate -> θ = 1
    # and both variants' adjusted means collapse to the global mean
    def ts_ns(day):
        return int(datetime.datetime(2024, 1, day).timestamp()) \
            * 1_000_000_000

    rows = []
    for uid, val in [(1, 5.0), (2, 20.0), (3, 7.0), (4, 40.0)]:
        rows.append((uid, ts_ns(5), val))    # pre
        rows.append((uid, ts_ns(25), val))   # post = pre
    ev = spark.createDataFrame(rows, "user_id long, ts long, value double")
    got = {r.variant: r for r in cuped_adjusted_means(ev).collect()}
    assert got[0].theta_micro == 1_000_000
    assert got[0].adj_mean_y_micro == got[1].adj_mean_y_micro
    # raw means differ wildly between variants; CUPED removed it all
    assert got[0].mean_y_micro != got[1].mean_y_micro
