"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's richest state machinery is the map-side combiner
triple (reference src/aggregator.rs:8-31) applied within one batch
job; it has no notion of state that persists *across* arrivals. This
module is the streaming-native generalization: per-key state kept in
Spark's state store across micro-batches, Arrow-batched into pandas
for the user logic.

Scale notes:
- State is partitioned by grouping key across executors; each task
  only loads its keys' state (RocksDB state store in production —
  ``spark.sql.streaming.stateStore.providerClass``).
- Always bound state: watermark-based eviction (timeout conf
  ``EventTimeTimeout``) or TTL (``ProcessingTimeTimeout``) — an
  unbounded keyed state is the streaming OOM at 100 TB.
- Emit deltas, not full state, in ``update`` mode: output size per
  batch stays O(touched keys).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(events: DataFrame, key_col: str,
                   value_col: str, key_type: str = "string") -> DataFrame:
    """Cumulative per-key (count, sum) maintained across micro-batches.

    Equivalent batch op is ``groupBy(key).agg(count, sum)`` — but here
    each micro-batch emits the *updated running* totals for the keys
    it touched, which no built-in streaming agg exposes without a
    window.
    """
    out_schema = f"{key_col} {key_type}, n bigint, total double"
    state_schema = "n bigint, total double"

    def update(key: tuple[Any, ...],
               pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

    return (events.groupBy(key_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update",
                                    GroupStateTimeout.NoTimeout))


def sessionize_custom(events: DataFrame, ts_col: str, key_col: str,
                      gap_s: int = 1800,
                      watermark: str = "1 hour") -> DataFrame:
    """Session windows with custom per-session logic — the
    hand-rolled equivalent of ``F.session_window`` for when the
    session needs state built-ins can't express (here: event count +
    value range per closed session).

    Sessions close via event-time timeout: once the watermark passes
    ``last_seen + gap``, the state times out and the session row is
    emitted. Watermark bounds state size.
    """
    out_schema = (f"{key_col} string, session_start timestamp, "
                  "session_end timestamp, n_events bigint")
    state_schema = "start_us long, end_us long, n bigint"

    gap_us = gap_s * 1_000_000

    def _row(k, start_us, end_us, n):
        return {key_col: k,
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(end_us, unit="us"),
                "n_events": n}

    def update(key: tuple[Any, ...],
               pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame([_row(key[0], start_us, end_us, n)])
            return
        start_us, end_us, n = state.get if state.exists else (None, None, 0)
        closed: list[dict] = []
        ts_all: list[int] = []
        for pdf in pdfs:
            # robust to pandas datetime64[ns] vs [us] resolution
            ts_all.extend(
                pdf[ts_col].values.astype("datetime64[us]").astype("int64"))
        # events within one micro-batch sort cleanly; cross-batch
        # disorder beyond the watermark is dropped upstream by Spark
        for t in sorted(ts_all):
            if start_us is None:
                start_us = end_us = int(t)
                n = 1
            elif t - end_us > gap_us:          # gap exceeded → close session
                closed.append(_row(key[0], start_us, end_us, n))
                start_us = end_us = int(t)
                n = 1
            else:
                end_us = max(end_us, int(t))
                n += 1
        state.update((start_us, end_us, n))
        # tail flush: watermark passing last_event + gap emits the open session
        state.setTimeoutTimestamp(end_us // 1_000 + gap_s * 1_000)  # ms
        if closed:
            yield pd.DataFrame(closed)

    return (events.withWatermark(ts_col, watermark)
            .groupBy(key_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "append",
                                    GroupStateTimeout.EventTimeTimeout))


def dedup_exact_stream(events: DataFrame, id_cols: list[str]) -> DataFrame:
    """Exact streaming deduplication: ``dropDuplicates`` with
    UNBOUNDED key state — every id ever seen is remembered, so a
    duplicate is dropped no matter how late it arrives and the result
    is batch-identical (micro-batch-split independent). The state
    grows with distinct ids: right for bounded key spaces (entity
    upserts, replayed ledgers); for open-ended streams prefer
    :func:`dedup_within_watermark`, which bounds state by eviction."""
    return events.dropDuplicates(id_cols)


def dedup_within_watermark(events: DataFrame, id_cols: list[str],
                           ts_col: str,
                           watermark: str = "1 hour") -> DataFrame:
    """Streaming deduplication bounded by the watermark: duplicates
    arriving within ``watermark`` of the first sighting are dropped;
    state for an id is evicted once the watermark passes it. The
    unbounded-state variant (``dropDuplicates`` alone) is a leak at
    scale — this is the 100 TB-safe form."""
    return (events.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(id_cols))


def running_totals_tws(events: DataFrame, key_col: str,
                       value_col: str, key_type: str = "string") -> DataFrame:
    """`running_totals` on the Spark 4 ``transformWithStateInPandas``
    API (the successor to applyInPandasWithState): state is a named
    ValueState handle managed by the state-store provider (RocksDB in
    production — see sources.rocksdb_state_store_conf), which unlocks
    per-state TTL, multiple state variables, and timers. Semantics
    here are identical to `running_totals`, so either implementation
    can back the same pipeline."""
    try:  # the state-server protocol needs protobuf at runtime
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas needs the `protobuf` package "
            "(state-server protocol); install protobuf or use "
            "running_totals (applyInPandasWithState) which has "
            "identical semantics") from exc

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    # transformWithState requires the RocksDB state-store provider
    # (the default HDFS-backed provider doesn't implement the new
    # state API); queries started after this conf pick it up.
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider")

    out_schema = f"{key_col} {key_type}, n bigint, total double"

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n bigint, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = (self._state.get() if self._state.exists()
                        else (0, 0.0))
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._state.update((n, total))
            yield pd.DataFrame({key_col: [key[0]], "n": [n],
                                "total": [total]})

        def close(self) -> None:
            pass

    return (events.groupBy(key_col)
            .transformWithStateInPandas(Totals(), out_schema, "Update",
                                        "None"))
