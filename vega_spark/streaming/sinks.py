"""Streaming sinks beyond the built-ins: the maintained-table
(upsert) pattern.

A training-data pipeline's streaming leg usually lands in a KEYED
table that later batch stages read — "latest state per entity" —
which Spark's file sinks can't express (append-only). The standard
production answer is foreachBatch + MERGE INTO; against plain
parquet (this container has no lakehouse format) the merge result is
rewritten via a two-phase directory swap, which is the documented
non-ACID stand-in: on Delta/Iceberg the SAME foreachBatch body calls
the table's own MERGE and gets ACID + concurrent readers for free.

Scale notes: each micro-batch merge is one broadcast (small delta) or
shuffled (big delta) join keyed on the merge keys — see
operators/merge.py. The rewrite cost is the real reason lakehouse
formats exist; the recipe isolates it in one place.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from vega_spark.operators.merge import merge_into
from vega_spark.streaming.sources import to_foreach_batch


def upsert_to_parquet(stream: DataFrame, target_path: str,
                      keys: list[str], checkpoint: str,
                      available_now: bool = True) -> StreamingQuery:
    """Maintain a keyed parquet table from a stream: every micro-batch
    is MERGEd into the table (match on ``keys`` → update, no match →
    insert). Duplicate keys WITHIN one micro-batch are collapsed with
    dropDuplicates (arbitrary survivor) — pre-aggregate upstream if
    last-writer-wins ordering matters.

    Idempotence: re-delivered batches re-merge the same rows to the
    same keys — the terminal state is unchanged, which is the
    exactly-once contract foreachBatch requires of its body."""
    spark = stream.sparkSession

    def body(batch: DataFrame, epoch_id: int) -> None:
        if not batch.take(1):
            return
        delta = batch.dropDuplicates(keys)
        if os.path.isdir(target_path):
            target = spark.read.parquet(target_path)
            merged = merge_into(target, delta.select(*target.columns),
                                keys, broadcast_source=True)
        else:
            merged = delta
        tmp = target_path + f".__epoch_{epoch_id}_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        old = target_path + ".__old"
        if os.path.isdir(target_path):
            os.rename(target_path, old)
        os.rename(tmp, target_path)
        shutil.rmtree(old, ignore_errors=True)

    return to_foreach_batch(stream, body, checkpoint,
                            output_mode="update",
                            available_now=available_now)


def stream_to_versioned(stream: DataFrame, table_dir: str,
                        keys: list[str], agg_exprs,
                        checkpoint: str,
                        available_now: bool = True,
                        merge_fns: dict | None = None) -> StreamingQuery:
    """Streaming leg of the lakehouse layer: every micro-batch's
    keyed aggregate is MERGED with the previous snapshot and committed
    as a NEW immutable version via operators/versioned.commit_snapshot
    — so downstream batch readers get atomic pointer flips, time
    travel over the ingest history, and vacuum/retention, instead of
    the bare directory swap of upsert_to_parquet.

    ``agg_exprs`` maps metric column name -> aggregate over the raw
    batch.  ``merge_fns`` maps each metric column to the re-aggregate
    applied over (snapshot ∪ delta) — one of "sum", "min", "max" —
    and defaults to "sum" (correct for sum and count-as-sum metrics).
    A min/max batch aggregate MUST declare its merge function here:
    re-summing a min across epochs silently corrupts the snapshot.
    Re-merging a re-delivered batch's DELTA is the only
    non-idempotent hazard; exactly-once relies on foreachBatch's
    epoch guarantee like every additive rollup. Per micro-batch cost:
    one keyed aggregate over the batch + one over (snapshot ∪ delta)
    — the snapshot is metric-table sized (|keys| rows), never raw
    history."""
    from pyspark.sql import functions as F  # noqa: F401

    from vega_spark.operators.versioned import (commit_snapshot,
                                                current_version,
                                                read_snapshot)
    spark = stream.sparkSession
    _MERGE = {"sum": F.sum, "min": F.min, "max": F.max}
    merge_fns = dict(merge_fns or {})
    unknown = {c: f for c, f in merge_fns.items() if f not in _MERGE}
    if unknown:
        raise ValueError(f"merge_fns values must be one of {set(_MERGE)}; "
                         f"got {unknown}")
    stray = set(merge_fns) - set(agg_exprs)
    if stray:
        # a typo'd metric name would otherwise be silently ignored and
        # that metric re-summed across epochs — the exact min/max
        # snapshot corruption merge_fns exists to prevent
        raise ValueError(f"merge_fns keys must name agg_exprs metrics; "
                         f"unknown: {sorted(stray)} "
                         f"(metrics: {sorted(agg_exprs)})")

    def body(batch: DataFrame, epoch_id: int) -> None:
        if not batch.take(1):
            return
        delta = batch.groupBy(*keys).agg(
            *[e.alias(c) for c, e in agg_exprs.items()])
        if current_version(table_dir):
            prev = read_snapshot(spark, table_dir)
            merged = (prev.unionByName(delta)
                      .groupBy(*keys)
                      .agg(*[_MERGE[merge_fns.get(c, "sum")](c).alias(c)
                             for c in agg_exprs]))
        else:
            merged = delta
        commit_snapshot(merged.coalesce(1), table_dir,
                        note=f"epoch {epoch_id}")

    return to_foreach_batch(stream, body, checkpoint,
                            output_mode="update",
                            available_now=available_now)
