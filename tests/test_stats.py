"""Statistics layer (operators/stats.py) — capability superset over
the reference's max/min/fold-only numeric surface (SURVEY §2.2)."""

from __future__ import annotations

import math

from vega_spark.operators import stats as ST


def test_corr_matrix_one_pass(spark):
    df = spark.createDataFrame(
        [(float(i), 2.0 * i, float(-i)) for i in range(50)],
        "a double, b double, c double")
    got = {(r.col_x, r.col_y): r.corr
           for r in ST.corr_matrix(df, ["a", "b", "c"]).collect()}
    assert math.isclose(got[("a", "b")], 1.0)
    assert math.isclose(got[("a", "c")], -1.0)
    assert math.isclose(got[("b", "c")], -1.0)
    assert len(got) == 3          # n*(n-1)/2 pairs, no self/dup pairs


def test_covariance_sample_vs_pop(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.0), (3.0, 6.0)], "x double, y double")
    assert math.isclose(ST.covariance(df, "x", "y", sample=True), 2.0)
    assert math.isclose(ST.covariance(df, "x", "y", sample=False), 4.0 / 3)


def test_crosstab_tidy_counts(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("b", "y")], "u string, v string")
    got = {(r.u, r.v): r.n for r in ST.crosstab(df, "u", "v").collect()}
    assert got == {("a", "x"): 2, ("a", "y"): 1, ("b", "y"): 1}


def test_freq_items_finds_heavy_hitter(spark):
    rows = [("hot",)] * 900 + [(f"cold{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    [items] = ST.freq_items(df, ["k"], support=0.5).first()
    assert "hot" in items         # no false negatives above support


def test_heavy_hitters_exact_threshold(spark):
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = {r.k: r.n for r in ST.heavy_hitters_exact(df, "k", 3).collect()}
    assert got == {"a": 5, "b": 3}


def test_summary_stats_long_format(spark):
    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (3.0, 30.0)], "x double, y double")
    got = {r.col: r for r in ST.summary_stats(df, ["x", "y"]).collect()}
    assert got["x"].n == 3 and math.isclose(got["x"].mean, 2.0)
    assert math.isclose(got["y"].min, 10.0) and math.isclose(got["y"].max, 30.0)
    assert math.isclose(got["x"].stddev, 1.0)


def test_histogram_fixed_edges(spark):
    from vega_spark.operators.stats import histogram_fixed
    df = spark.createDataFrame(
        [(v,) for v in [0.0, 1.0, 4.9, 5.0, 9.9, 10.0, 10.1, -1.0]],
        "x double")
    out = {r.bucket: r.n for r in
           histogram_fixed(df, "x", 0.0, 10.0, 2).collect()}
    # [0,5): 0,1,4.9 ; [5,10]: 5.0,9.9,10.0 (closed upper edge); -1, 10.1 dropped
    assert out == {0: 3, 1: 3}


def test_percentile_by_group_exact(spark):
    from vega_spark.operators.stats import percentile_by_group
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 10.0),
         ("b", 5.0)], "g string, x double")
    out = {r.g: r for r in
           percentile_by_group(df, ["g"], "x", [0.5]).collect()}
    assert out["a"].p0_5 == 2.5      # interpolated between 2 and 3
    assert out["b"].p0_5 == 5.0


def test_ab_test_z_detects_planted_effect(spark):
    from vega_spark.operators.stats import ab_test_zscores
    # treatment shifted by +2.0 with small noise: decisive z;
    # a no-effect group stays insignificant
    rows = []
    for i in range(400):
        noise = (i % 7) * 0.01
        rows.append(("shifted", "control", 10.0 + noise))
        rows.append(("shifted", "treatment", 12.0 + noise))
        rows.append(("flat", "control", 5.0 + noise))
        rows.append(("flat", "treatment", 5.0 + noise))
    df = spark.createDataFrame(rows, "g string, variant string, value double")
    got = {r.g: r for r in ab_test_zscores(
        df, ["g"], "variant", "value", "control", "treatment").collect()}
    assert got["shifted"].z_score > 10
    assert abs(got["flat"].z_score) < 1e-6
    assert got["shifted"].n_c == 400 and got["shifted"].n_t == 400
    assert abs(got["shifted"].mean_treatment
               - got["shifted"].mean_control - 2.0) < 1e-9


def test_hist_quantile_rollup_merge_and_accuracy(spark):
    from vega_spark.operators.stats import (hist_merge_quantiles,
                                            hist_partial)
    # uniform 0..1000 over [0,1000): quantile estimates within a bin
    df = spark.createDataFrame(
        [(("a" if i % 2 == 0 else "b"), float(i % 1000))
         for i in range(4000)], "g string, v double")
    bins, lo, hi = 100, 0.0, 1000.0
    p = hist_partial(df, ["g"], "v", lo, hi, bins)
    got = {(r.g, r.q): r.quantile_est for r in hist_merge_quantiles(
        p, ["g"], [0.5, 0.9], lo, hi, bins).collect()}
    for g in ("a", "b"):
        assert abs(got[(g, 0.5)] - 500) <= hi / bins
        assert abs(got[(g, 0.9)] - 900) <= hi / bins
    # merging per-shard partials == whole-data partials
    p1 = hist_partial(df.filter("v < 300"), ["g"], "v", lo, hi, bins)
    p2 = hist_partial(df.filter("v >= 300"), ["g"], "v", lo, hi, bins)
    merged = hist_merge_quantiles(p1.unionAll(p2), ["g"], [0.5],
                                  lo, hi, bins)
    whole = hist_merge_quantiles(p, ["g"], [0.5], lo, hi, bins)
    assert ({(r.g, r.quantile_est) for r in merged.collect()}
            == {(r.g, r.quantile_est) for r in whole.collect()})
    # clamping: out-of-range values land in edge bins, never lost
    oob = spark.createDataFrame([("c", -50.0), ("c", 5000.0)],
                                "g string, v double")
    pc = hist_partial(oob, ["g"], "v", lo, hi, bins)
    assert pc.agg({"cnt": "sum"}).first()[0] == 2


def test_binned_roc_auc_perfect_and_random(spark):
    from pyspark.sql import functions as F
    # perfect separation: positives all score higher -> AUC = 1
    rows = [(float(i), i >= 50) for i in range(100)]
    df = spark.createDataFrame(rows, "s double, y boolean").repartition(8)
    r = ST.binned_roc_auc(df, "y", "s", bins=64).first()
    assert r.n_pos == 50 and r.n_neg == 50
    assert r.auc == 1.0
    # anti-separation -> AUC = 0
    r2 = ST.binned_roc_auc(df, ~F.col("y"), "s", bins=64).first()
    assert r2.auc == 0.0
    # label independent of score -> AUC = 0.5 (ties take midrank)
    rows3 = [(float(i % 10), (i // 10) % 2 == 0) for i in range(200)]
    df3 = spark.createDataFrame(rows3, "s double, y boolean")
    r3 = ST.binned_roc_auc(df3, "y", "s", bins=64).first()
    assert abs(r3.auc - 0.5) < 1e-9


def test_binned_roc_auc_matches_exact_rank_auc(spark):
    # binned with bins >> distinct scores == exact Mann-Whitney AUC
    import random
    rng = random.Random(7)
    rows = [(round(rng.random(), 3), rng.random() < 0.4) for _ in range(500)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    got = ST.binned_roc_auc(df, "y", "s", bins=2048).first().auc
    pos = sorted(s for s, y in rows if y)
    neg = sorted(s for s, y in rows if not y)
    num = sum((sum(1 for n in neg if n < p)
               + 0.5 * sum(1 for n in neg if n == p)) for p in pos)
    exact = num / (len(pos) * len(neg))
    assert abs(got - exact) < 2e-3   # off only by within-bin smearing


def test_ks_binned_detects_shift_and_null_case(spark):
    rows = ([("a", float(v % 50)) for v in range(500)]
            + [("b", 50.0 + v % 50) for v in range(500)])
    df = spark.createDataFrame(rows, "g string, v double").repartition(8)
    r = ST.ks_binned(df, "g", "v", "a", "b", bins=20, lo=0.0,
                     hi=100.0).first()
    assert r.n_a == 500 and r.n_b == 500
    assert r.ks_stat == 1.0          # disjoint supports -> max gap 1
    r2 = ST.ks_binned(df, "g", "v", "a", "a", bins=20, lo=0.0,
                      hi=100.0).first()
    assert r2.ks_stat == 0.0         # identical samples -> 0


def test_dp_noisy_counts_deterministic_and_bounded(spark):
    rows = [(f"g{i % 3}",) for i in range(300)]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    a = {r.k: (r.n_noisy, r.noise)
         for r in ST.dp_noisy_counts(df, "k", epsilon=1.0, seed=3).collect()}
    b = {r.k: (r.n_noisy, r.noise)
         for r in ST.dp_noisy_counts(df, "k", epsilon=1.0, seed=3).collect()}
    assert a == b                    # seeded -> reproducible release
    c = {r.k: r.noise
         for r in ST.dp_noisy_counts(df, "k", epsilon=1.0, seed=4).collect()}
    assert any(c[k] != a[k][1] for k in c)   # seed rotates the draw
    for k, (nz, noise) in a.items():
        assert abs(nz - 100 - noise) < 1e-9  # noisy = true + noise


def test_k_anonymity_audit_exact_counts(spark):
    # classes: (a: 1 row), (b: 3 rows), (c: 10 rows)
    rows = [("a", 0)] + [("b", 0)] * 3 + [("c", 0)] * 10
    df = spark.createDataFrame(rows, "q string, z int").repartition(4)
    got = {r.k: (r.classes_at_risk, r.rows_at_risk, r.risk_share)
           for r in ST.k_anonymity_audit(df, ["q", "z"],
                                         ks=(2, 5, 11)).collect()}
    assert got[2] == (1, 1, round(1 / 14, 6))
    assert got[5] == (2, 4, round(4 / 14, 6))
    assert got[11] == (3, 14, 1.0)


def test_calibration_bins_perfect_calibration(spark):
    import random
    rng = random.Random(3)
    # score IS the true probability: pos_rate tracks mean_score
    rows = [(p / 10 + 0.05, rng.random() < p / 10 + 0.05)
            for p in range(10) for _ in range(500)]
    df = spark.createDataFrame(rows, "s double, y boolean").repartition(8)
    out = ST.calibration_bins(df, "y", "s", bins=10).collect()
    assert len(out) == 10
    for r in out:
        assert r.n == 500
        assert math.isclose(r.mean_score, r.bin / 10 + 0.05, abs_tol=1e-6)
        assert abs(r.pos_rate - r.mean_score) < 0.08   # sampling noise


def test_decile_lift_separated_scores(spark):
    # top 10% of scores are all positive, rest negative
    rows = [(float(i), i >= 900) for i in range(1000)]
    df = spark.createDataFrame(rows, "s double, y boolean").repartition(8)
    out = {r.tier: r for r in ST.decile_lift(df, "y", "s",
                                             bins=1000).collect()}
    assert out[0].n_pos == 100 and out[0].n_rows == 100
    assert out[0].lift == 10.0
    assert all(out[t].n_pos == 0 for t in range(1, 10))
    assert sum(r.n_rows for r in out.values()) == 1000


def test_profile_table_exact_counts_and_top(spark):
    rows = [("a", 1), ("a", None), ("b", 2), ("b", 2), ("b", None)]
    df = spark.createDataFrame(rows, "s string, x int").repartition(4)
    got = {r.column: r for r in ST.profile_table(df, ["s", "x"]).collect()}
    assert got["s"].n_rows == 5 and got["s"].n_null == 0
    assert got["s"].n_distinct == 2
    assert (got["s"].top_value, got["s"].top_count) == ("b", 3)
    assert got["x"].n_null == 2 and got["x"].n_distinct == 2
    assert (got["x"].top_value, got["x"].top_count) == ("2", 2)
    # tie breaks to the smallest value: a/b both 1 -> 'a'
    df2 = spark.createDataFrame([("b",), ("a",)], "s string")
    r2 = ST.profile_table(df2, ["s"]).first()
    assert r2.top_value == "a" and r2.top_count == 1


def test_quality_suite_verdicts(spark):
    from vega_spark.operators.quality import check_suite

    rows = [(1, "a", 5.0), (2, "b", 50.0), (3, None, -1.0), (3, "d", 7.0)]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    out = {(r.check, r.column): r for r in check_suite(df, [
        {"check": "completeness", "column": "s", "min_ratio": 1.0},
        {"check": "completeness", "column": "id", "min_ratio": 1.0},
        {"check": "uniqueness", "column": "id", "min_ratio": 1.0},
        {"check": "in_range", "column": "v", "lo": 0, "hi": 100,
         "min_ratio": 0.9},
        {"check": "matches", "column": "s", "pattern": "^[a-c]$",
         "min_ratio": 0.5},
        {"check": "row_count", "min_rows": 5},
    ]).collect()}
    c = out[("completeness", "s")]
    assert (c.observed, c.expected, c.passed) == (3, 4, False)
    assert out[("completeness", "id")].passed
    u = out[("uniqueness", "id")]
    assert (u.observed, u.passed) == (3, False)
    r = out[("in_range", "v")]
    assert (r.observed, r.metric, r.passed) == (3, 0.75, False)
    m = out[("matches", "s")]
    assert (m.observed, m.passed) == (2, True)
    rc = out[("row_count", "*")]
    assert (rc.observed, rc.expected, rc.passed) == (4, 5, False)


def test_quality_suite_unknown_check_raises(spark):
    import pytest

    from vega_spark.operators.quality import check_suite

    df = spark.range(3)
    with pytest.raises(ValueError):
        check_suite(df, [{"check": "nope"}])


def test_trimmed_mean_drops_outliers(spark):
    from vega_spark.operators.stats import trimmed_mean_by
    # 10 values: eight 10.00s plus outliers 0.01 and 1000.00 ->
    # k=1 each side, trimmed mean is exactly 10.00
    rows = [("a", i, 10.0) for i in range(8)]
    rows += [("a", 8, 0.01), ("a", 9, 1000.0)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    r = trimmed_mean_by(df, "event_type", "value", "event_id").collect()[0]
    assert (r.n, r.k_trimmed, r.n_kept) == (10, 1, 8)
    assert r.trimmed_mean_micro == 10_000_000  # exactly $10


def test_winsorized_mean_clamps_outliers(spark):
    from vega_spark.operators.stats import winsorized_mean_by
    # eight 10.00s + outliers 0.01 and 1000.00: k=1 each side, the
    # extremes clamp to 10.00 -> winsorized mean is exactly $10
    rows = [("a", i, 10.0) for i in range(8)]
    rows += [("a", 8, 0.01), ("a", 9, 1000.0)]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, value double")
    r = winsorized_mean_by(df, "event_type", "value",
                           "event_id").collect()[0]
    assert (r.n, r.winsorized_mean_micro) == (10, 10_000_000)
