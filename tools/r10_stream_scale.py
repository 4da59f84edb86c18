"""File-sink drain variant for the STREAMING scale smokes (r10,
VERDICT r9 #5 / SCALE_NOTES): the declared `streaming_dedup_exact` and
`streaming_session_windows` queries drain to a MEMORY sink by contract,
which is what dies first at scale (driver collect > maxResultSize at
300x for dedup; COMPLETE-mode re-materialization heap-OOM for
sessions) — the stateful operators themselves were unproven past 300x.
This harness replays the same arrival choreography and the same
stateful operators into a PARQUET sink (append mode — the production
drain shape), so the smoke measures the operator, not the sink.

The declared queries are untouched; this is a perf instrument like
scale_bench. Verification per query:

- dedup: the sink's batch aggregate must EQUAL the single-copy batch
  answer (the declared contract, computed from files).
- sessions: append mode needs a watermark to finalize windows; with a
  0-second delay every session whose close precedes the end-of-stream
  watermark emits. Check: emitted rows are a SUBSET of the batch
  gaps-and-islands truth (exact match on (user, start, n)), and the
  non-emitted remainder is only watermark-open tail sessions.

Usage: python tools/r10_stream_scale.py FACTOR [dedup|sessions|both]
Appends per-row results to BENCH_scale_{FACTOR}x.json under
"stream_file_sink".
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sized_session(scale_dir: str):
    from vega_spark.session import conf_for_scale, get_session
    spark = get_session("r10-stream-scale")
    input_bytes = sum(os.path.getsize(os.path.join(dp, f))
                      for dp, _dn, fns in os.walk(scale_dir)
                      for f in fns)
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mem = os.environ.get("SPARK_DRIVER_MEMORY", "16g").lower()
    mem_bytes = int(float(mem.rstrip("gm"))
                    * (1024**3 if mem.endswith("g") else 1024**2))
    for k, v in conf_for_scale(input_bytes, cores,
                               mem_bytes // max(cores, 1)).items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
    return spark


def run_dedup(spark, scale_dir: str, rocksdb: bool = False) -> dict:
    from vega_spark.session import drain_shuffle_partitions, pinned_conf
    from vega_spark.streaming import sources as SS
    from vega_spark.streaming.stateful import dedup_exact_stream
    from vega_spark.tables import load_table

    if rocksdb:
        # dedup state is UNBOUNDED key state (every id ever seen) and
        # the HDFS-backed provider keeps every loaded partition's map
        # in the (single, local-mode) JVM — at 1000x that is ~20M
        # keys x rows resident at once and the heap dies (observed).
        # RocksDB moves it to native/disk: VERDICT r9 #6's "re-A/B at
        # real state volume". Runtime-settable; pinned per run.
        for k, v in (__import__(
                "vega_spark.streaming.sources", fromlist=["x"])
                .rocksdb_state_store_conf().items()):
            spark.conf.set(k, v)

    ev = load_table(spark, scale_dir, "events").select(
        "event_id", "event_type", "value")
    stage = tempfile.mkdtemp(prefix="vega_sscale_dd_")
    sink = tempfile.mkdtemp(prefix="vega_sscale_dd_sink_")
    ckpt = tempfile.mkdtemp(prefix="vega_sscale_dd_ckpt_")
    try:
        # natural partitioning (no coalesce(4) — that is the tiny-SF
        # contract shape; at scale the drain reads many splits)
        ev.write.mode("overwrite").parquet(
            os.path.join(stage, "arrival=1"))
        os.makedirs(os.path.join(stage, "arrival=2"), exist_ok=True)
        for f in os.listdir(os.path.join(stage, "arrival=1")):
            if f.endswith(".parquet"):
                os.link(os.path.join(stage, "arrival=1", f),
                        os.path.join(stage, "arrival=2", f))
        parts = drain_shuffle_partitions(stage)
        stream = SS.stream_parquet(
            spark, os.path.join(stage, "*"),
            "event_id long, event_type string, value double")
        deduped = dedup_exact_stream(stream, ["event_id"])
        t0 = time.perf_counter()
        with pinned_conf(spark, "spark.sql.shuffle.partitions", parts):
            q = (deduped.writeStream.format("parquet")
                 .option("path", sink)
                 .option("checkpointLocation", ckpt)
                 .outputMode("append")
                 .trigger(availableNow=True)
                 .queryName("dd_" + uuid.uuid4().hex[:8]).start())
            q.awaitTermination()
        wall = round(time.perf_counter() - t0, 2)
        got = {r["event_type"]: (r["n"], r["n_ids"], r["total"])
               for r in (spark.read.parquet(sink)
                         .groupBy("event_type")
                         .agg(F.count(F.lit(1)).alias("n"),
                              F.count_distinct("event_id").alias("n_ids"),
                              F.round(F.sum("value"), 2).alias("total"))
                         .collect())}
        want = {r["event_type"]: (r["n"], r["n_ids"], r["total"])
                for r in (ev.groupBy("event_type")
                          .agg(F.count(F.lit(1)).alias("n"),
                               F.count_distinct("event_id").alias("n_ids"),
                               F.round(F.sum("value"), 2).alias("total"))
                          .collect())}
        return {"wall_sec": wall, "state_partitions": int(parts),
                "rows_match_single_copy_batch": got == want,
                "n_types": len(got)}
    finally:
        for d in (stage, sink, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def run_sessions(spark, scale_dir: str) -> dict:
    from vega_spark.session import drain_shuffle_partitions, pinned_conf
    from vega_spark.streaming import sources as SS
    from vega_spark.tables import load_table

    ev = load_table(spark, scale_dir, "events")
    stage = tempfile.mkdtemp(prefix="vega_sscale_sess_")
    sink = tempfile.mkdtemp(prefix="vega_sscale_sess_sink_")
    ckpt = tempfile.mkdtemp(prefix="vega_sscale_sess_ckpt_")
    try:
        # Stage a TIME-ORDERED arrival (the production shape a
        # watermark models): range-partition by ts so file k's events
        # all precede file k+1's, with ascending mtimes so the file
        # source replays them in order. One giant AvailableNow batch
        # would build ALL session state before the first eviction
        # (observed 300x heap-OOM with the unordered single-batch
        # form); ordered incremental batches let the 0-second
        # watermark evict closed sessions as the drain progresses —
        # the steady-state behavior of a real session stream.
        raw_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _dn, fns in os.walk(
                os.path.join(scale_dir, "events.parquet"))
            for f in fns)
        n_range = max(8, raw_bytes // (32 << 20))
        (ev.select("user_id",
                   F.timestamp_micros(F.expr("ts div 1000")).alias("ts"))
         .repartitionByRange(n_range, "ts")
         .sortWithinPartitions("ts")
         .write.mode("overwrite").parquet(stage))
        pfiles = sorted(f for f in os.listdir(stage)
                        if f.endswith(".parquet"))
        base_t = time.time() - 10 * len(pfiles)
        for i, f in enumerate(pfiles):
            os.utime(os.path.join(stage, f),
                     (base_t + 10 * i, base_t + 10 * i))
        # session-window state is ~ARRIVAL-sized between evictions
        # (every event sits in an open session until the watermark
        # passes it) — size at 16 MB/partition, not the 64 MB
        # bounded-fraction default of the contract drains
        parts = drain_shuffle_partitions(
            stage, bytes_per_partition=16 << 20)
        # watermark eviction lags one batch, so peak open state spans
        # ~2 batch time-bands; ~2 files/batch keeps that band small
        # (8-file batches still held ~2/8 of the timeline's sessions
        # → heap-OOM at 1000x), and retaining a single in-memory map
        # version halves the HDFS provider's residency
        spark.conf.set("spark.sql.streaming.maxBatchesToRetainInMemory",
                       "1")
        stream = SS.stream_parquet(spark, stage,
                                   "user_id long, ts timestamp",
                                   max_files_per_trigger=2)
        agg = (stream
               .withWatermark("ts", "0 seconds")
               .groupBy(F.session_window("ts", "30 minutes")
                        .alias("session"), "user_id")
               .agg(F.count(F.lit(1)).alias("n_events")))
        t0 = time.perf_counter()
        with pinned_conf(spark, "spark.sql.shuffle.partitions", parts):
            q = (agg.select("user_id",
                            F.unix_micros(F.col("session.start"))
                            .alias("session_start_us"),
                            "n_events")
                 .writeStream.format("parquet")
                 .option("path", sink)
                 .option("checkpointLocation", ckpt)
                 .outputMode("append")
                 .trigger(availableNow=True)
                 .queryName("sess_" + uuid.uuid4().hex[:8]).start())
            q.awaitTermination()
        wall = round(time.perf_counter() - t0, 2)
        emitted = spark.read.parquet(sink)
        n_emitted = emitted.count()
        # batch gaps-and-islands truth (sessionize_gap shape)
        from pyspark.sql.window import Window
        base = ev.select("user_id",
                         F.timestamp_micros(F.expr("ts div 1000"))
                         .alias("ts"))
        w = Window.partitionBy("user_id").orderBy("ts")
        # exact-microsecond gap, matching session_window's arithmetic
        # (cast("long") truncates to seconds and mis-breaks pairs in
        # [1799s, 1800s) — measured as exactly one false split per
        # replica before the fix)
        brk = F.when(
            F.unix_micros(F.col("ts"))
            - F.lag(F.unix_micros(F.col("ts"))).over(w)
            >= 1800 * 1_000_000,
            1).otherwise(0)
        truth = (base.withColumn("__b", brk)
                 .withColumn("__s", F.sum("__b").over(
                     w.rowsBetween(Window.unboundedPreceding, 0)))
                 .groupBy("user_id", "__s")
                 .agg(F.unix_micros(F.min("ts"))
                      .alias("session_start_us"),
                      F.count(F.lit(1)).alias("n_events")))
        n_truth = truth.count()
        # every emitted row must be a truth row (exact subset)
        wrong = (emitted.join(
            truth.select("user_id", "session_start_us", "n_events"),
            ["user_id", "session_start_us", "n_events"], "left_anti")
            .count())
        return {"wall_sec": wall, "state_partitions": int(parts),
                "n_emitted": n_emitted, "n_truth_sessions": n_truth,
                "emitted_not_in_truth": wrong,
                "subset_ok": wrong == 0}
    finally:
        for d in (stage, sink, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    factor = int(sys.argv[1])
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    rocksdb = "--rocksdb" in sys.argv
    scale_dir = f"/tmp/vega_scale_sf{factor}x"
    assert os.path.isdir(os.path.join(scale_dir, "events.parquet")), \
        f"replica missing — run tools/scale_bench.py {factor} first"
    spark = _sized_session(scale_dir)
    out: dict[str, dict] = {}
    if which in ("dedup", "both"):
        key = ("streaming_dedup_exact_rocksdb" if rocksdb
               else "streaming_dedup_exact")
        out[key] = run_dedup(spark, scale_dir, rocksdb=rocksdb)
        out[key]["provider"] = "rocksdb" if rocksdb else "hdfs"
        print(json.dumps({key: out[key]}), flush=True)
    if which in ("sessions", "both"):
        out["streaming_session_windows"] = run_sessions(spark, scale_dir)
        print(json.dumps({"streaming_session_windows":
                          out["streaming_session_windows"]}), flush=True)
    path = os.path.join(REPO, f"BENCH_scale_{factor}x.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except Exception:
        doc = {}
    doc.setdefault("stream_file_sink", {}).update(out)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"# merged into {path}", flush=True)


if __name__ == "__main__":
    main()
