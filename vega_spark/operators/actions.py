"""Materializing actions (SURVEY.md §2.2) with reference-pinned edge
semantics.

Reference parity:
- collect()        reference src/rdd/rdd.rs:420-434
- count()          reference src/rdd/rdd.rs:436-447
- reduce(f)        reference src/rdd/rdd.rs:274-290  (None on empty!)
- fold(init, f)    reference src/rdd/rdd.rs:292-322
- aggregate(...)   reference src/rdd/rdd.rs:324-350
- first()          reference src/rdd/rdd.rs:533-543  (error on empty)
- take(n)          reference src/rdd/rdd.rs:559-620  (Spark's CollectLimit
                   has the same incremental scale-up built in)
- max()/min()      reference src/rdd/rdd.rs:1080-1099
- is_empty()       reference src/rdd/rdd.rs:1071-1078
- count_by_value() reference src/rdd/rdd.rs:449-459  (returns a dataset,
                   not a driver-side map)
- save_as_text_file reference src/rdd/rdd.rs:254-272

Scale notes: every action here funnels through Spark's DAG scheduler;
aggregating actions (count/reduce/fold/max/min) are partial+final
HashAggregate — one shuffle of one row per partition. ``collect`` is
driver-bound by definition; callers at 100 TB should aggregate or
write instead (the library keeps it for API parity, as the reference
does).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F


def collect(df: DataFrame) -> list[Row]:
    return df.collect()


def count(df: DataFrame) -> int:
    return df.count()


def reduce_col(df: DataFrame, col: str, agg: Column) -> Any | None:
    """``reduce(f)`` over one column with a commutative+associative
    aggregate expression. Reference returns Option — None on empty
    input (src/rdd/rdd.rs:278: collect into Option then reduce);
    Spark's RDD.reduce throws instead, so we pin the reference
    behavior explicitly. ONE job: the row count rides in the same
    aggregate, so emptiness costs no second scan (the earlier
    isEmpty() pre-check was a whole extra job)."""
    row = df.agg(agg.alias("r"), F.count(F.lit(1)).alias("n")).first()
    return None if row["n"] == 0 else row["r"]


def fold_col(df: DataFrame, col: str, zero: Any, agg: Column) -> Any:
    """``fold(init, f)``. The reference applies ``init`` once per
    partition and once at the driver (src/rdd/rdd.rs:292-322) — for
    the commutative/associative ops it requires, a neutral ``zero``
    makes that identical to a plain aggregate, which is what we run
    (partial+final HashAggregate; no partition-count dependence)."""
    row = df.agg(agg.alias("r")).first()
    v = row["r"]
    return zero if v is None else v


def aggregate_cols(df: DataFrame, aggs: Sequence[Column]) -> Row:
    """``aggregate(init, seq, comb)`` → multi-output aggregate. The
    (seq, comb) closure pair becomes aggregate expressions; arbitrary
    combiners go through pandas UDAFs (see aggregations.combine_by_key)."""
    return df.agg(*aggs).first()


def first(df: DataFrame) -> Row:
    """Error on empty input, like the reference (take(1) then index)."""
    rows = df.take(1)
    if not rows:
        raise ValueError("first() on empty dataset")  # reference panics too
    return rows[0]


def take(df: DataFrame, num: int) -> list[Row]:
    """Spark's take == the reference's incremental partition scan with
    the same 2x scale-up heuristic (CollectLimit incremental)."""
    return df.take(num)


def is_empty(df: DataFrame) -> bool:
    return df.isEmpty()


def max_col(df: DataFrame, col: str) -> Any | None:
    return reduce_col(df, col, F.max(col))


def min_col(df: DataFrame, col: str) -> Any | None:
    return reduce_col(df, col, F.min(col))


def count_by_value(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """(value → count) as a *dataset* (the reference's count_by_value
    is map + reduce_by_key, returning an RDD, src/rdd/rdd.rs:449-459).
    One shuffle with map-side partial count."""
    cols = list(cols or df.columns)
    return df.groupBy(*cols).agg(F.count(F.lit(1)).alias("count"))


def save_as_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """save_as_text_file: one part file per partition. Rows are
    CSV-formatted (the reference uses Debug formatting — a
    representation choice, not a semantic one)."""
    df.write.mode(mode).csv(path)


def save_as_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                    partition_by: Sequence[str] = ()) -> None:
    """The scale-appropriate sink: columnar, splittable, statistics.
    ``partition_by`` gives partition pruning to downstream readers."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def save_as_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per row, one file per partition).
    Interchange format — splittable but row-oriented and schema-free;
    parquet is the right sink for anything re-read at scale."""
    df.write.mode(mode).json(path)


def save_as_orc(df: DataFrame, path: str, mode: str = "overwrite",
                partition_by: Sequence[str] = ()) -> None:
    """ORC sink — columnar alternative with the same pushdown/pruning
    properties as parquet (kept for ecosystems standardized on ORC)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def save_single_file(df: DataFrame, path: str, fmt: str = "csv",
                     mode: str = "overwrite") -> None:
    """Driver-convenience: coalesce(1) then write — ONE output file.
    Deliberately explicit (not the default): a single writer task is a
    scale anti-pattern; only for small final results (report tables)."""
    getattr(df.coalesce(1).write.mode(mode), fmt)(path)


def with_observed_metrics(df: DataFrame, name: str, **metric_exprs):
    """Accumulator-pattern metrics via ``df.observe``: named aggregate
    expressions evaluated DURING the next action on ``df`` — row
    counts, null tallies, sums — with zero extra passes over the
    data (the reference's accumulator field is an unfinished stub:
    src/scheduler/dag_scheduler.rs:23-27, local_scheduler.rs:317).

    Returns (observed_df, fetch) where ``fetch()`` reads the metrics
    row after an action has run. Works identically on a 1000-executor
    cluster: metrics merge on the driver like task accumulators, no
    collect of data rows.

    CAVEAT: the action must execute the DATAFRAME plan — count(),
    collect(), any write (``for_each_consume`` below). ``df.foreach``
    / RDD-lineage actions bypass the CollectMetrics node and leave
    ``fetch()`` blocked forever."""
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(obs, *[expr.alias(alias)
                                 for alias, expr in metric_exprs.items()])

    def fetch() -> dict:
        return obs.get

    return observed, fetch


def for_each_consume(df: DataFrame) -> None:
    """Drive one full distributed pass over ``df`` for its side
    effects (observed metrics, cache population) via the noop sink:
    every row is consumed on its executor, nothing is written or
    collected, and — unlike ``df.foreach``'s RDD detour — the
    DataFrame plan (incl. any CollectMetrics) is what executes."""
    df.write.format("noop").mode("overwrite").save()
