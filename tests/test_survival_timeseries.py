"""Round-2 continuation families: Kaplan-Meier survival, hourly
autocorrelation, CUSUM change point, logistic GD, l-diversity,
clustering coefficient (functions/analytics, functions/mlprep,
functions/graph, operators/stats)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from vega_spark.functions.analytics import (
    cusum_changepoint,
    hourly_autocorrelation,
    kaplan_meier,
)
from vega_spark.functions.graph import clustering_coefficient
from vega_spark.functions.mlprep import logistic_regression_gd
from vega_spark.operators.stats import l_diversity_audit
from vega_spark.plans.advisor import assert_scale_safe


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")


def _t(h, m=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h, minutes=m)


def test_kaplan_meier_textbook_curve(spark):
    # 4 users: convert after 1h, 1h, 2h; one never converts
    # (censored at the data's end, 3h after their start).
    rows = []
    for u, conv_h in ((1, 1), (2, 1), (3, 2)):
        rows += [(u, _t(0), "view"), (u, _t(conv_h), "purchase")]
    rows += [(4, _t(0), "view"), (4, _t(3), "view")]
    out = kaplan_meier(_ev(spark, rows)).collect()
    # t=1: n=4, d=2 -> S=0.5 ; t=2: n=2, d=1 -> S=0.25
    assert [(r.dur_units, r.n_risk, r.n_converted, r.survival)
            for r in out] == [(1, 4, 2, 0.5), (2, 2, 1, 0.25)]


def test_kaplan_meier_all_convert_hits_zero(spark):
    rows = []
    for u in (1, 2):
        rows += [(u, _t(0), "view"), (u, _t(u), "purchase")]
    out = kaplan_meier(_ev(spark, rows)).collect()
    assert out[-1].survival == 0.0


def test_acf_periodic_series_peaks_at_period(spark):
    # y alternates 10, 0 hourly: r1 = -1, r2 = +1 (up to the
    # missing-hours edge effect; with a full grid it's exact)
    rows = []
    for h in range(48):
        n = 10 if h % 2 == 0 else 2
        for i in range(n):
            rows.append((1, _t(h, i % 50), "view"))
    out = {r.lag: r.acf
           for r in hourly_autocorrelation(
               _ev(spark, rows), lags=(1, 2)).collect()}
    assert out[1] < -0.8
    assert out[2] > 0.8


def test_cusum_detects_level_shift_hour(spark):
    # 2/hour for hours 0-23, then 12/hour for 24-47: the max
    # |cumulative deviation| lands exactly at the last pre-shift hour
    rows = []
    for h in range(48):
        n = 2 if h < 24 else 12
        for i in range(n):
            rows.append((1, _t(h, i), "view"))
    out = cusum_changepoint(_ev(spark, rows)).collect()
    assert len(out) == 1
    base_h = int(_t(0).timestamp() // 3600)
    assert out[0].cp_hour == base_h + 23
    assert out[0].cusum_stat > 1.0  # far above the ~0.5 noise level


def test_logreg_learns_separable_signal(spark):
    # y=1 iff value > 50 (scaled feature > 0.005): two GD steps must
    # find a positive slope and beat the 50% base rate
    rows = [(float(v), 1 if v > 50 else 0) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "value double, y long")
    out = logistic_regression_gd(
        df, F.col("y"), F.round(F.col("value") * 100, 0)).collect()[0]
    assert out.n == 100
    assert out.w1 > 0
    assert out.accuracy >= 0.5
    assert out.log_loss < math.log(2) + 0.2


def test_l_diversity_counts_exact(spark):
    # class (a): sensitive {x, y} -> l=2 ; class (b): {x} -> l=1
    rows = [("a", "x"), ("a", "y"), ("a", "x"), ("b", "x"), ("b", "x")]
    df = spark.createDataFrame(rows, "q string, s string")
    out = {r.l: r for r in
           l_diversity_audit(df, ["q"], "s", ls=(2, 3)).collect()}
    assert (out[2].classes_at_risk, out[2].rows_at_risk) == (1, 2)
    assert (out[3].classes_at_risk, out[3].rows_at_risk) == (2, 5)
    assert out[2].risk_share == 0.4


def test_clustering_coefficient_triangle_plus_pendant(spark):
    # triangle 1-2-3 plus pendant 3-4: cc(1)=cc(2)=1, cc(3)=1/3,
    # deg(4)=1 excluded -> avg = (1 + 1 + 1/3) / 3
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long")
    out = clustering_coefficient(edges).collect()[0]
    assert (out.n_nodes, out.n_deg_ge2, out.n_triangles) == (4, 3, 1)
    assert abs(out.avg_cc - (1 + 1 + 1 / 3) / 3) < 1e-5


def test_new_family_plans_scale_safe(spark, sf_dir):
    from vega_spark.registry import QUERIES
    for name in ("acf_hourly_events", "cusum_changepoint_hours",
                 "kaplan_meier_conversion", "logreg_purchase_value",
                 "l_diversity_docs", "clustering_coeff_parts"):
        assert_scale_safe(QUERIES[name](spark, sf_dir))


def test_stl_lite_decomposition_identity_and_seasonality(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from vega_spark.functions.analytics import stl_lite_hourly

    # 6 days, deterministic daily cycle: hour-of-day h gets h events
    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for d in range(6):
        for h in range(24):
            for _ in range(h):
                rows.append(("a", base + dt.timedelta(days=d, hours=h)))
                eid += 1
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = stl_lite_hourly(df).collect()
    assert len(out) == 6 * 24 - 23 + 22  # dense span min..max hour
    for r in out:
        # decomposition identity up to the two roundings
        assert abs((r.trend + r.seasonal + r.residual) - r.y) < 2e-6
    # interior rows: pure cycle → residual ~0 and seasonal carries
    # the signal (trend flat at the daily mean)
    interior = [r for r in out if 24 <= r.xh - min(x.xh for x in out)
                <= 5 * 24 - 13]
    assert interior
    assert max(abs(r.residual) for r in interior) < 1.5
    assert max(abs(r.seasonal) for r in interior) > 5.0


def test_stl_lite_zero_fills_gaps(spark):
    import datetime as dt

    from vega_spark.functions.analytics import stl_lite_hourly

    base = dt.datetime(2024, 3, 1)
    rows = [("a", base), ("a", base + dt.timedelta(hours=5))]
    out = {r.xh: r for r in stl_lite_hourly(
        spark.createDataFrame(rows, "event_type string, ts timestamp")
    ).collect()}
    assert len(out) == 6          # dense hours 0..5
    ys = [r.y for r in out.values()]
    assert sorted(ys) == [0, 0, 0, 0, 1, 1]


def test_stl_residual_anomalies_flags_injected_burst(spark):
    import datetime

    from pyspark.sql import functions as F

    from vega_spark.functions.analytics import stl_residual_anomalies

    # 6 days of a clean daily pattern (10 + hour-of-day) with ONE
    # injected 500-event burst: only that hour may be flagged
    base = datetime.datetime(2024, 3, 1)
    rows, eid = [], 0
    for h in range(24 * 6):
        n = 10 + (h % 24) + (500 if h == 77 else 0)
        ts = int((base + datetime.timedelta(hours=h)).timestamp())
        for _ in range(n):
            rows.append((eid, "a", ts * 1_000_000))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, event_type string, ts long") \
        .withColumn("ts", F.timestamp_micros("ts"))
    got = stl_residual_anomalies(ev, k_mad=6).collect()
    assert len(got) >= 1
    flagged_hours = {r.xh for r in got}
    burst_xh = int((base + datetime.timedelta(hours=77)).timestamp()) // 3600
    assert burst_xh in flagged_hours
    # every flag traces back to the burst: inside its ±12h trend
    # shadow, or sharing its hour-of-day slot (the burst pulls that
    # slot's seasonal mean up, making clean days read negative there)
    assert all(abs(x - burst_xh) <= 12 or x % 24 == burst_xh % 24
               for x in flagged_hours)
