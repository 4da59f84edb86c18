"""ML feature-prep layer (functions/mlprep.py) + Holt smoothing —
capability superset over the reference's RDD-only surface
(SURVEY.md §2.11)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vega_spark.functions import mlprep as M


def test_feature_vector_zscore_minmax_onehot(spark):
    rows = [(1, 10.0, "a", "p1"), (2, 20.0, "b", "p2"),
            (3, 30.0, "a", "p3"), (4, 40.0, "c", "p4")]
    df = spark.createDataFrame(
        rows, "id int, v double, cat string, props string").repartition(4)
    got = {r.id: r for r in M.feature_vector(
        df, "id", "v", "cat", ["a", "b", "c"], "props",
        hash_buckets=8).collect()}
    # mean 25, pop-std sqrt(125): z for v=10 is -15/sqrt(125)
    assert math.isclose(got[1].z_value, round(-15 / math.sqrt(125), 6))
    assert math.isclose(got[4].z_value, round(15 / math.sqrt(125), 6))
    assert got[1].mm_value == 0.0 and got[4].mm_value == 1.0
    assert math.isclose(got[2].mm_value, round(1 / 3, 6))
    assert (got[1].is_a, got[1].is_b, got[1].is_c) == (1, 0, 0)
    assert (got[2].is_a, got[2].is_b, got[2].is_c) == (0, 1, 0)
    assert all(0 <= got[i].hash_bucket < 8 for i in got)
    # deterministic hashing: same input -> same bucket
    again = {r.id: r.hash_bucket for r in M.feature_vector(
        df, "id", "v", "cat", ["a", "b", "c"], "props",
        hash_buckets=8).collect()}
    assert again == {i: got[i].hash_bucket for i in got}


def test_target_encode_shrinks_rare_categories(spark):
    # common: 100 rows mean 10; rare: 1 row value 1000; global pull
    rows = [("common", 10.0)] * 100 + [("rare", 1000.0)]
    df = spark.createDataFrame(rows, "cat string, t double").repartition(4)
    got = {r.cat: r for r in M.target_encode(df, "cat", "t", m=10).collect()}
    g_mean = (100 * 10.0 + 1000.0) / 101
    exp_rare = (1000.0 + 10 * g_mean) / (1 + 10)
    exp_common = (100 * 10.0 + 10 * g_mean) / (100 + 10)
    assert math.isclose(got["rare"].target_enc, round(exp_rare, 6))
    assert math.isclose(got["common"].target_enc, round(exp_common, 6))
    # rare is pulled far off its raw mean toward the prior
    assert got["rare"].target_enc < 200


def test_naive_bayes_separable_corpus(spark):
    # two languages with disjoint vocabularies -> perfect diagonal
    rows = ([(i, "aa bb aa cc", "en") for i in range(20)]
            + [(100 + i, "xx yy xx zz", "fr") for i in range(20)])
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {(r.actual, r.predicted): r.n_docs
           for r in M.naive_bayes_confusion(
               df, vocab_size=10, alpha=1.0).collect()}
    assert got == {("en", "en"): 20, ("fr", "fr"): 20}


def test_naive_bayes_tie_breaks_to_smallest_label(spark):
    # doc text outside the vocabulary + equal priors -> score = prior
    # for every label -> deterministic min-label prediction
    rows = [(1, "qq", "b"), (2, "qq", "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = M.naive_bayes_confusion(df, vocab_size=2, alpha=1.0).collect()
    preds = {(r.actual, r.predicted): r.n_docs for r in out}
    # both docs share the vocab, same score under both labels -> 'a'
    assert sum(n for (a, p), n in preds.items() if p == "a") == 2


def test_holt_linear_exact_on_linear_series(spark):
    from vega_spark.functions.analytics import holt_linear_forecast
    # perfectly linear hourly series: level tracks it exactly and the
    # h=3 forecast continues the line (Holt is exact on linear input)
    rows2 = [("t", 1700000000 + 3600 * h, 10.0 + 5.0 * h)
             for h in range(12)]
    df2 = spark.createDataFrame(rows2, "event_type string, es long, v double") \
        .select("event_type", F.timestamp_seconds(F.col("es")).alias("ts"),
                F.col("v").alias("value"))
    r = holt_linear_forecast(df2, alpha=0.5, beta=0.25, horizon=3).first()
    assert r.n_hours == 12
    assert math.isclose(r.level, 10.0 + 5.0 * 11)
    assert math.isclose(r.trend, 5.0)
    assert math.isclose(r.forecast_h3, 10.0 + 5.0 * 14)


def test_ols_two_feature_recovers_plane(spark):
    # y = 3 + 2*x1 + 0.5*x2 exactly -> exact coefficients, r2 = 1
    rows = []
    for x1 in range(10):
        for x2 in range(10):
            rows.append((3.0 + 2.0 * x1 + 0.5 * x2, float(x1),
                         float(x2) / 100.0))
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double") \
        .repartition(8)
    r = M.ols_two_feature(df, "y", "x1", "x2",
                          y_scale=100, x2_scale=100).first()
    assert r.n == 100
    assert math.isclose(r.b0, 3.0, abs_tol=1e-6)
    assert math.isclose(r.b1, 2.0, abs_tol=1e-6)
    # x2 natural units: y changes 0.5 per 1.0 of the raw x2 column =
    # 0.5/0.01 per unit of x2 as passed (x2 column is x2/100)
    assert math.isclose(r.b2, 50.0, abs_tol=1e-4)
    assert math.isclose(r.r2, 1.0, abs_tol=1e-9)


def test_decision_stump_finds_planted_threshold(spark):
    # label exactly (v >= 60): best split sits at the 60 boundary and
    # the gain equals the parent impurity (pure children)
    rows = [(float(v), v >= 60) for v in range(100)]
    df = spark.createDataFrame(rows, "v double, y boolean").repartition(8)
    r = M.decision_stump(df, "y", "v", bins=100).first()
    assert r.n == 100 and r.n_pos == 40
    # parent gini = 2*.4*.6 = .48, children pure -> gain = .48
    assert math.isclose(r.gini_gain, 0.48, abs_tol=1e-9)
    assert abs(r.split_value - 60.0) <= 1.0   # one grid cell
    # no-signal label: gain ~ 0
    rows2 = [(float(v % 10), (v // 10) % 2 == 0) for v in range(200)]
    df2 = spark.createDataFrame(rows2, "v double, y boolean")
    r2 = M.decision_stump(df2, "y", "v", bins=50).first()
    assert r2.gini_gain < 0.02


def test_user_feature_mart_exact_features(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    rows = [(1, "view", 10.0, base, 1),
            (1, "purchase", 20.0, base + dt.timedelta(hours=2), 2),
            (1, "view", 30.0, base + dt.timedelta(days=2), 3)]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, value double, "
              "ts timestamp, event_id long")
    from vega_spark.functions.mlprep import user_feature_mart
    r = user_feature_mart(df).collect()[0]
    assert (r.n_events, r.n_conversions) == (3, 1)
    assert (r.active_days, r.span_days) == (2, 3)
    assert r.total_value == 60.0 and r.mean_value == 20.0
    assert r.max_gap_s == (2 * 24 - 2) * 3600


def test_pca_fit_matches_numpy_and_projects(spark):
    import numpy as np

    from vega_spark.functions import mlprep as M

    rng = np.random.default_rng(11)
    # correlated 3-col data on the cents grid (exact after scaling)
    base = rng.normal(size=(300, 3)) @ np.array(
        [[3.0, 1.0, 0.0], [0.0, 2.0, 0.5], [0.0, 0.0, 0.2]])
    data = np.round(base + 10.0, 2)
    rows = [tuple(float(v) for v in r) for r in data]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    model = M.pca_fit(df, ["a", "b", "c"])
    # covariance path must equal numpy's population covariance
    cov_np = np.cov(data.T, bias=True)
    vals_np = np.sort(np.linalg.eigvalsh(cov_np))[::-1]
    assert np.allclose(model["explained_variance"], vals_np, atol=1e-9)
    # components orthonormal, deterministic sign
    C = model["components"]
    assert np.allclose(C @ C.T, np.eye(3), atol=1e-9)
    for k in range(3):
        assert C[k, np.abs(C[k]).argmax()] > 0
    # JVM projection == numpy projection
    proj = M.pca_project(df, model, 2).select("pc1", "pc2").collect()
    got = np.array([[r.pc1, r.pc2] for r in proj])
    exp = (data - model["mean"]) @ C[:2].T
    # row order: collect preserves input order on a narrow plan
    assert np.allclose(np.sort(got, axis=0), np.sort(exp, axis=0),
                       atol=1e-8)
    # variance along pc1 equals the top eigenvalue
    assert abs(got[:, 0].var() - vals_np[0]) < 1e-6


def test_covariance_pairs_partition_invariant(spark):
    from vega_spark.functions import mlprep as M

    rows = [(float(i % 7), float((i * 3) % 11)) for i in range(200)]
    df1 = spark.createDataFrame(rows, "x double, y double")
    a = {(r.ci, r.cj): r.cov_num
         for r in M.covariance_pairs(df1, ["x", "y"]).collect()}
    b = {(r.ci, r.cj): r.cov_num
         for r in M.covariance_pairs(df1.repartition(13), ["x", "y"])
         .collect()}
    assert a == b


def test_cv_stump_separable_data_is_perfect(spark):
    from pyspark.sql import functions as F

    from vega_spark.functions import mlprep as M

    # perfectly separable at v=50: every fold must find the split
    # and score 100% held-out accuracy
    rows = [(i, float(i % 100), i % 100 >= 50) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, v double, y boolean")
    out = M.cv_decision_stump(df, "y", "v", "id", folds=4, bins=50)
    res = out.collect()
    assert len(res) == 4
    assert all(r.acc == 1.0 for r in res)
    assert all(abs(r.split_value - 50.0) < 2.1 for r in res)
    assert sum(r.n_test for r in res) == 1000
    for r in res:
        assert r.n_train + r.n_test == 1000
    # inverted labels must flip child predictions, not accuracy
    inv = M.cv_decision_stump(df.withColumn("y", ~F.col("y")),
                              "y", "v", "id", folds=4, bins=50)
    assert all(r.acc == 1.0 for r in inv.collect())


def test_conformal_coverage_guarantee(spark):
    import numpy as np

    from pyspark.sql import functions as F

    from vega_spark.functions import mlprep as M

    rng = np.random.default_rng(5)
    rows = [(i, "g" + str(i % 2), float(rng.normal(0, 1.0)))
            for i in range(4000)]
    df = (spark.createDataFrame(rows, "id long, g string, y double")
          .withColumn("pred", F.lit(0.0)))
    out = {r.g: r for r in M.conformal_intervals(
        df, "y", "pred", "id", "g", alpha=0.1).collect()}
    assert set(out) == {"g0", "g1"}
    for r in out.values():
        # distribution-free guarantee (conservative binning): the
        # serve half must reach ~1-alpha coverage
        assert r.coverage >= 0.88
        # and the interval shouldn't be vacuous: q̂ ≈ N(0,1) 90%
        # quantile of |y| (≈1.64), far below the max residual
        assert 1.3 < r.qhat < 2.3
        assert r.n_cal + r.n_serve == 2000
    # tighter alpha → wider interval
    out2 = {r.g: r for r in M.conformal_intervals(
        df, "y", "pred", "id", "g", alpha=0.01).collect()}
    for g in out:
        assert out2[g].qhat > out[g].qhat
        assert out2[g].coverage >= out[g].coverage
