"""End-to-end Structured Streaming: real readStream file sources →
windows/stateful ops → memory/parquet/foreachBatch sinks.

Capability superset over the reference (it has no streaming,
SURVEY.md §2.11). The batch/stream duality check (stream result ==
batch result of the same transform) is the core correctness claim.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vega_spark.streaming import sources as S
from vega_spark.streaming import stateful as ST
from vega_spark.streaming import windows as W

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"

ROWS_1 = [
    (1, "2024-01-01 00:01:00", 10, "click", 1.0),
    (2, "2024-01-01 00:02:00", 11, "click", 2.0),
    (3, "2024-01-01 00:07:00", 12, "view", 3.0),
    (4, "2024-01-01 00:08:00", 10, "click", 4.0),
    (2, "2024-01-01 00:02:00", 11, "click", 2.0),     # exact duplicate of id 2
]
ROWS_2 = [
    (5, "2024-01-01 03:01:00", 10, "view", 5.0),
    (6, "2024-01-01 03:02:00", 13, "click", 6.0),
    (3, "2024-01-01 03:02:30", 12, "view", 3.0),      # id 3 again, later arrival
]
ROWS_3 = [
    (7, "2024-01-01 06:00:00", 14, "click", 7.0),
]


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, e, v) for i, ts, u, e, v in rows],
        "event_id long, ts_s string, user_id long, event_type string, value double",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "user_id", "event_type", "value")


@pytest.fixture()
def arrivals(spark, tmp_path):
    """Directory that new event files 'arrive' into."""
    d = tmp_path / "in"
    d.mkdir()

    def arrive(rows, name):
        _mk(spark, rows).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "stage" / name))
        import shutil
        import glob
        src = glob.glob(str(tmp_path / "stage" / name / "part-*.parquet"))[0]
        shutil.copy(src, str(d / f"{name}.parquet"))

    return d, arrive


def test_stream_equals_batch_windowed_agg(spark, arrivals):
    d, arrive = arrivals
    arrive(ROWS_1, "f1")
    arrive(ROWS_2, "f2")

    stream = S.stream_parquet(spark, str(d), SCHEMA, max_files_per_trigger=1)
    q = S.to_memory(W.windowed_agg(stream, "ts", "event_type", "value",
                                   window_len="5 minutes"),
                    "win_agg", output_mode="complete")
    q.processAllAvailable()
    q.stop()
    got = {(r.win.start.isoformat(), r.event_type): (r.n, r.total)
           for r in spark.sql("SELECT * FROM win_agg").collect()}

    batch = W.windowed_agg(_mk(spark, ROWS_1).union(_mk(spark, ROWS_2)),
                           "ts", "event_type", "value", window_len="5 minutes")
    want = {(r.win.start.isoformat(), r.event_type): (r.n, r.total)
            for r in batch.collect()}
    assert got == want and len(want) >= 4


def test_running_totals_state_across_batches(spark, arrivals):
    d, arrive = arrivals
    arrive(ROWS_1, "f1")
    stream = S.stream_parquet(spark, str(d), SCHEMA)
    q = S.to_memory(ST.running_totals(stream, "event_type", "value"),
                    "run_tot", output_mode="update")
    q.processAllAvailable()
    mid = {r.event_type: (r.n, r.total)
           for r in spark.sql("SELECT * FROM run_tot").collect()}
    assert mid["click"] == (4, 9.0)    # ROWS_1 incl. duplicate row

    arrive(ROWS_2, "f2")               # second micro-batch → state must carry
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM run_tot").collect()
    final = {}
    for r in rows:                      # update mode appends; last write wins
        final[r.event_type] = (r.n, r.total)
    assert final["click"] == (5, 15.0)
    assert final["view"] == (3, 11.0)


def test_custom_sessionize_event_time_timeout(spark, arrivals):
    d, arrive = arrivals
    stream = S.stream_parquet(spark, str(d), SCHEMA)
    sess = ST.sessionize_custom(stream, "ts", "event_type",
                                gap_s=1800, watermark="1 hour")
    q = S.to_memory(sess, "sessions", output_mode="append")
    arrive(ROWS_1, "f1")
    q.processAllAvailable()
    arrive(ROWS_2, "f2")               # 3h gap → f1 sessions close on arrival
    q.processAllAvailable()
    arrive(ROWS_3, "f3")               # 6h event → closes f2's click session
    q.processAllAvailable()
    q.stop()
    got = {(r.event_type, r.session_start.isoformat(),
            r.session_end.isoformat(), r.n_events)
           for r in spark.sql("SELECT * FROM sessions").collect()}
    # f1 'click' session: 00:01..00:08, 4 events (incl. dup row)
    assert ("click", "2024-01-01T00:01:00", "2024-01-01T00:08:00", 4) in got
    assert ("view", "2024-01-01T00:07:00", "2024-01-01T00:07:00", 1) in got
    assert ("click", "2024-01-01T03:02:00", "2024-01-01T03:02:00", 1) in got


def test_stream_dedup_within_watermark(spark, arrivals):
    d, arrive = arrivals
    arrive(ROWS_1, "f1")
    stream = S.stream_parquet(spark, str(d), SCHEMA)
    q = S.to_memory(ST.dedup_within_watermark(stream, ["event_id"], "ts",
                                              watermark="10 hours"),
                    "dedup", output_mode="append")
    q.processAllAvailable()
    arrive(ROWS_2, "f2")
    q.processAllAvailable()
    q.stop()
    ids = [r.event_id for r in spark.sql("SELECT event_id FROM dedup").collect()]
    assert sorted(ids) == [1, 2, 3, 4, 5, 6]  # both dup arrivals dropped


def test_parquet_sink_exactly_once(spark, arrivals, tmp_path):
    d, arrive = arrivals
    arrive(ROWS_1, "f1")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    stream = S.stream_parquet(spark, str(d), SCHEMA)
    S.drain(S.to_parquet(stream.select("event_id", "value"), out, ckpt))
    assert spark.read.parquet(out).count() == len(ROWS_1)

    # restart with same checkpoint, no new files → nothing reprocessed
    stream = S.stream_parquet(spark, str(d), SCHEMA)
    S.drain(S.to_parquet(stream.select("event_id", "value"), out, ckpt))
    assert spark.read.parquet(out).count() == len(ROWS_1)

    arrive(ROWS_2, "f2")               # only the new file is processed
    stream = S.stream_parquet(spark, str(d), SCHEMA)
    S.drain(S.to_parquet(stream.select("event_id", "value"), out, ckpt))
    assert spark.read.parquet(out).count() == len(ROWS_1) + len(ROWS_2)


def test_foreach_batch_sink(spark, arrivals, tmp_path):
    d, arrive = arrivals
    arrive(ROWS_1, "f1")
    seen: list[tuple[int, int]] = []

    def sink(batch_df, epoch_id):
        seen.append((epoch_id, batch_df.count()))

    stream = S.stream_parquet(spark, str(d), SCHEMA)
    S.drain(S.to_foreach_batch(stream, sink, str(tmp_path / "ck2"),
                               output_mode="append"))
    assert sum(n for _, n in seen) == len(ROWS_1)


def test_stream_stream_interval_join(spark, arrivals):
    from vega_spark.streaming import joins as SJ
    d, arrive = arrivals
    arrive(ROWS_1, "f1")
    arrive(ROWS_2, "f2")

    src = S.stream_parquet(spark, str(d), SCHEMA, max_files_per_trigger=1)
    clicks = (src.filter(F.col("event_type") == "click")
              .select("user_id", F.col("ts").alias("click_ts"),
                      F.col("event_id").alias("click_id")))
    views = (src.filter(F.col("event_type") == "view")
             .select("user_id", F.col("ts").alias("view_ts"),
                     F.col("event_id").alias("view_id")))
    joined = SJ.interval_join(clicks, views, "user_id",
                              "click_ts", "view_ts",
                              lower="0 seconds", upper="4 hours")
    q = S.to_memory(joined.select("user_id", "click_id", "view_id"), "ssj")
    q.processAllAvailable()
    q.stop()
    got = {(r.user_id, r.click_id, r.view_id)
           for r in spark.sql("SELECT * FROM ssj").collect()}

    # batch expectation: same condition as a plain join
    b = _mk(spark, ROWS_1).union(_mk(spark, ROWS_2))
    bc = b.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"))
    bv = (b.filter(F.col("event_type") == "view")
          .select(F.col("user_id").alias("v_user"),
                  F.col("ts").alias("view_ts"),
                  F.col("event_id").alias("view_id")))
    want = {(r.user_id, r.click_id, r.view_id) for r in bc.join(
        bv, (F.col("user_id") == F.col("v_user")) &
            (F.col("view_ts") >= F.col("click_ts")) &
            (F.col("view_ts") <= F.col("click_ts") + F.expr(
                "INTERVAL 4 hours"))).collect()}
    assert got == want and len(want) >= 2


def test_stream_static_join_enriches(spark, arrivals, tmp_path):
    from vega_spark.streaming import joins as SJ
    d, arrive = arrivals
    arrive(ROWS_1, "f1")
    dim = spark.createDataFrame(
        [(10, "gold"), (11, "silver")], "user_id long, tier string")
    src = S.stream_parquet(spark, str(d), SCHEMA)
    q = S.to_memory(SJ.stream_static_join(src, dim, "user_id")
                    .select("event_id", "tier"), "ssj_static")
    q.processAllAvailable()
    q.stop()
    got = {(r.event_id, r.tier)
           for r in spark.sql("SELECT * FROM ssj_static").collect()}
    assert got == {(1, "gold"), (4, "gold"), (2, "silver")}


def test_upsert_sink_maintains_keyed_table(spark, arrivals, tmp_path):
    from vega_spark.streaming.sinks import upsert_to_parquet
    d, arrive = arrivals
    target = str(tmp_path / "state_tbl")

    # batch 1: users 10, 11
    arrive([(1, "2024-01-01 00:00:00", 10, "view", 1.0),
            (2, "2024-01-01 00:01:00", 11, "view", 2.0)], "b1")
    src = S.stream_parquet(spark, str(d), SCHEMA, max_files_per_trigger=10)
    latest = src.select("user_id", "event_type", "value")
    q = upsert_to_parquet(latest, target, ["user_id"],
                          str(tmp_path / "ckpt_upsert"))
    S.drain(q)
    got = {r.user_id: (r.event_type, r.value)
           for r in spark.read.parquet(target).collect()}
    assert got == {10: ("view", 1.0), 11: ("view", 2.0)}

    # batch 2: user 10 updated, user 12 inserted
    arrive([(3, "2024-01-01 00:05:00", 10, "click", 9.0),
            (4, "2024-01-01 00:06:00", 12, "view", 3.0)], "b2")
    q = upsert_to_parquet(latest, target, ["user_id"],
                          str(tmp_path / "ckpt_upsert"))
    S.drain(q)
    got = {r.user_id: (r.event_type, r.value)
           for r in spark.read.parquet(target).collect()}
    assert got == {10: ("click", 9.0), 11: ("view", 2.0), 12: ("view", 3.0)}


def test_running_totals_tws_matches_legacy_api(spark, arrivals):
    # same semantics on the Spark 4 transformWithStateInPandas API;
    # the state-server protocol needs protobuf (not in this container)
    import pytest
    pytest.importorskip("google.protobuf")
    d, arrive = arrivals
    arrive(ROWS_1, "f1")
    stream = S.stream_parquet(spark, str(d), SCHEMA)
    agg = ST.running_totals_tws(stream, "event_type", "value")
    q = S.to_memory(agg, "run_tot_tws", output_mode="update")
    q.processAllAvailable()
    mid = {r.event_type: (r.n, r.total)
           for r in spark.sql("SELECT * FROM run_tot_tws").collect()}
    assert mid["click"] == (4, 9.0)

    arrive(ROWS_2, "f2")
    q.processAllAvailable()
    q.stop()
    final = {}
    for r in spark.sql("SELECT * FROM run_tot_tws").collect():
        final[r.event_type] = (r.n, r.total)
    want = {}
    for ts, et, v in ROWS_1 + ROWS_2:
        n, t = want.get(et, (0, 0.0))
        want[et] = (n + 1, t + v)
    assert {k: v for k, v in final.items()} == \
        {k: (n, round(t, 6)) for k, (n, t) in want.items()} or final == want


def test_running_totals_tws_raises_clear_error_without_protobuf(spark):
    import pytest
    try:
        import google.protobuf  # noqa: F401
        pytest.skip("protobuf installed - gate not exercised")
    except ImportError:
        pass
    df = spark.createDataFrame([("a", 1.0)], "event_type string, value double")
    with pytest.raises(ImportError, match="protobuf"):
        ST.running_totals_tws(df, "event_type", "value")


def test_streaming_session_windows_match_batch_sessionize(spark, sf_dir):
    # stream/batch parity: the streaming session_window drain must
    # equal the batch gap-sessionizer row for row
    from vega_spark.registry import QUERIES
    stream_rows = sorted(
        map(tuple, QUERIES["streaming_session_windows"](
            spark, sf_dir).collect()))
    batch_rows = sorted(
        map(tuple, QUERIES["sessionize_gap"](spark, sf_dir).collect()))
    assert stream_rows == batch_rows
