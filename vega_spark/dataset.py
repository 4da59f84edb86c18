"""VegaContext / VegaDataset — the reference's user-facing API shape
(Context + typed Rdd, reference src/context.rs:147-164 +
src/rdd/rdd.rs:173-183) as a thin facade over DataFrames.

A user of the reference writes::

    let ctx = Context::new()?;
    let nums = ctx.make_rdd(vec![1,2,3,4], 2);
    let doubled = nums.map(Fn!(|x| x * 2)).collect();

Here::

    ctx = VegaContext(spark)
    nums = ctx.make_rdd([1, 2, 3, 4], num_slices=2)
    doubled = nums.map((F.col("value") * 2).alias("value")).collect()

The closure argument becomes a Column expression (JVM-side,
Catalyst-optimized); arbitrary Python logic goes through
``map_partitions`` (Arrow-batched). Every method delegates to the
operator modules, which carry the reference citations and the scale
notes — this class is purely the ergonomic surface.

Chaining is lazy exactly like the reference: every transformation
returns a new VegaDataset wrapping an unevaluated DataFrame; only
actions (collect/count/reduce/...) run jobs.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from vega_spark.operators import actions as _act
from vega_spark.operators import aggregations as _agg
from vega_spark.operators import approx as _approx
from vega_spark.operators import core as _core
from vega_spark.operators import joins as _joins
from vega_spark.operators import partitioning as _part
from vega_spark.operators import sampling as _samp
from vega_spark.operators import setops as _set
from vega_spark.operators import topk as _topk
from vega_spark.sources import readers as _read


class VegaContext:
    """``Context`` equivalent: session handle + dataset constructors."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def make_rdd(self, data: Sequence[Any], schema: str | None = None,
                 num_slices: int | None = None) -> "VegaDataset":
        """``make_rdd`` / ``parallelize``. Scalars become a single
        ``value`` column; tuples need an explicit schema."""
        if schema is None:
            rows = [(v,) for v in data]
            first = data[0] if len(data) else 0
            t = {int: "bigint", float: "double", str: "string"}.get(type(first), "string")
            schema = f"value {t}"
        else:
            rows = list(data)
        return VegaDataset(_read.parallelize(self.spark, rows, schema, num_slices))

    def range(self, start: int, end: int, step: int = 1,
              num_slices: int | None = None) -> "VegaDataset":
        """Reference semantics: end INCLUSIVE (context.rs:419-431)."""
        return VegaDataset(_read.range_inclusive(self.spark, start, end, step, num_slices))

    def read_parquet(self, path: str, columns: Sequence[str] | None = None) -> "VegaDataset":
        return VegaDataset(_read.read_parquet(self.spark, path, columns))

    def read_csv(self, path: str, schema: str, **kw) -> "VegaDataset":
        return VegaDataset(_read.read_csv(self.spark, path, schema, **kw))

    def read_text(self, path: str) -> "VegaDataset":
        return VegaDataset(_read.read_text_lines(self.spark, path))

    def read_files(self, path: str, glob: str | None = None,
                   whole: bool = True) -> "VegaDataset":
        """``LocalFsReaderConfig`` equivalent (whole-file bytes or paths)."""
        fn = _read.read_whole_files if whole else _read.read_file_paths
        return VegaDataset(fn(self.spark, path, glob))

    def union(self, datasets: Sequence["VegaDataset"]) -> "VegaDataset":
        """``Context::union(&[rdds])``."""
        return VegaDataset(_set.union_all([d.df for d in datasets]))

    def broadcast(self, value: Any):
        """Broadcast variable — absent from the reference (SURVEY
        §2.11); Spark ships the value once per executor instead of
        once per task. For DataFrame joins prefer ``F.broadcast`` on
        the small side; this is for lookup structures used inside
        mapInPandas/applyInPandas logic."""
        return self.spark.sparkContext.broadcast(value)

    def accumulator(self, init: float = 0):
        """Accumulator — stubbed in the reference (SURVEY §2.11:
        dag_scheduler.rs:23-27 `accum_updates` never populated).
        Workers add, only the driver reads. Spark guarantees
        exactly-once application only inside actions; transforms may
        re-run on retry — use for metrics, not results."""
        return self.spark.sparkContext.accumulator(init)


class VegaDataset:
    """Typed-RDD surface over a DataFrame (reference Rdd trait,
    src/rdd/rdd.rs:173-183). Transformations lazy, actions eager."""

    def __init__(self, df: DataFrame):
        self.df = df

    # --- narrow transforms (§2.3) ------------------------------------
    def map(self, *exprs: Column | str) -> "VegaDataset":
        return VegaDataset(_core.select_map(self.df, *exprs))

    def filter(self, predicate: Column) -> "VegaDataset":
        return VegaDataset(_core.filter_rows(self.df, predicate))

    def flat_map(self, array_expr: Column, out_name: str = "value",
                 keep: Sequence[str] = ()) -> "VegaDataset":
        return VegaDataset(_core.flat_map(self.df, array_expr, out_name, keep))

    def key_by(self, key_expr: Column, key_name: str = "key") -> "VegaDataset":
        return VegaDataset(_core.key_by(self.df, key_expr, key_name))

    def map_values(self, key_cols: Sequence[str], value_expr: Column,
                   value_name: str = "value") -> "VegaDataset":
        return VegaDataset(_core.map_values(self.df, key_cols, value_expr, value_name))

    def flat_map_values(self, key_cols: Sequence[str], values_array: Column,
                        value_name: str = "value") -> "VegaDataset":
        return VegaDataset(_core.flat_map_values(self.df, key_cols, values_array, value_name))

    def map_partitions(self, fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]],
                       schema: str) -> "VegaDataset":
        return VegaDataset(_core.map_partitions(self.df, fn, schema))

    def map_partitions_with_index(self, fn, schema: str) -> "VegaDataset":
        return VegaDataset(_core.map_partitions_with_index(self.df, fn, schema))

    def glom(self) -> "VegaDataset":
        return VegaDataset(_core.glom(self.df))

    # --- keyed aggregation (§2.5) ------------------------------------
    def reduce_by_key(self, key_cols: Sequence[str], *aggs: Column) -> "VegaDataset":
        return VegaDataset(_agg.reduce_by_key(self.df, key_cols, *aggs))

    def group_by_key(self, key_cols: Sequence[str], value_col: str,
                     sort_values: bool = False) -> "VegaDataset":
        return VegaDataset(_agg.group_by_key(self.df, key_cols, value_col, sort_values))

    def group_by(self, key_expr: Column, key_name: str = "key",
                 sort_values: bool = False) -> "VegaDataset":
        return VegaDataset(_agg.group_by(self.df, key_expr, key_name, sort_values))

    def combine_by_key(self, key_cols: Sequence[str], combine, schema: str) -> "VegaDataset":
        return VegaDataset(_agg.combine_by_key(self.df, key_cols, combine, schema))

    def count_by_value(self, cols: Sequence[str] | None = None) -> "VegaDataset":
        return VegaDataset(_act.count_by_value(self.df, cols))

    # --- joins (§2.4) --------------------------------------------------
    def join(self, other: "VegaDataset", on, how: str = "inner",
             broadcast_right: bool = False) -> "VegaDataset":
        return VegaDataset(_joins.join(self.df, other.df, on, how, broadcast_right))

    def cogroup(self, other: "VegaDataset", left_key: str, right_key: str,
                left_value: str, right_value: str, **kw) -> "VegaDataset":
        return VegaDataset(_joins.cogroup(self.df, other.df, left_key, right_key,
                                          left_value, right_value, **kw))

    def cartesian(self, other: "VegaDataset") -> "VegaDataset":
        return VegaDataset(_joins.cartesian(self.df, other.df))

    def zip(self, other: "VegaDataset", self_order: Sequence[str],
            other_order: Sequence[str]) -> "VegaDataset":
        return VegaDataset(_joins.zip_by_order(self.df, other.df, self_order, other_order))

    def zip_with_index(self, order: Sequence[str], index_name: str = "idx") -> "VegaDataset":
        return VegaDataset(_joins.zip_with_index(self.df, order, index_name))

    # --- set ops (§2.6) -------------------------------------------------
    def union(self, other: "VegaDataset") -> "VegaDataset":
        return VegaDataset(_set.union_bag(self.df, other.df))

    def distinct(self, subset: Sequence[str] | None = None) -> "VegaDataset":
        return VegaDataset(_set.distinct(self.df, subset))

    def intersection(self, other: "VegaDataset") -> "VegaDataset":
        return VegaDataset(_set.intersection(self.df, other.df))

    def subtract(self, other: "VegaDataset") -> "VegaDataset":
        return VegaDataset(_set.subtract(self.df, other.df))

    # --- layout (§2.7) ----------------------------------------------------
    def repartition(self, n: int) -> "VegaDataset":
        return VegaDataset(_part.repartition(self.df, n))

    def partition_by_key(self, n: int, key_cols: Sequence[str]) -> "VegaDataset":
        return VegaDataset(_part.repartition_by_key(self.df, n, key_cols))

    def coalesce(self, n: int) -> "VegaDataset":
        return VegaDataset(_part.coalesce(self.df, n))

    def num_partitions(self) -> int:
        return _part.num_partitions(self.df)

    # --- sampling (§2.8) ---------------------------------------------------
    def sample(self, with_replacement: bool, fraction: float,
               seed: int | None = None) -> "VegaDataset":
        return VegaDataset(_samp.sample(self.df, with_replacement, fraction, seed))

    def random_split(self, weights: Sequence[float],
                     seed: int | None = None) -> list["VegaDataset"]:
        return [VegaDataset(d) for d in _samp.random_split(self.df, weights, seed)]

    def take_sample(self, with_replacement: bool, num: int,
                    seed: int | None = None) -> list[Row]:
        return _samp.take_sample(self.df, with_replacement, num, seed)

    # --- ordering / top-k ----------------------------------------------------
    def top(self, num: int, order: Sequence[str]) -> "VegaDataset":
        return VegaDataset(_topk.top(self.df, num, order))

    def take_ordered(self, num: int, order: Sequence[str]) -> "VegaDataset":
        return VegaDataset(_topk.take_ordered(self.df, num, order))

    def sort_by(self, *order: Column | str) -> "VegaDataset":
        """Global sort — a reference gap (§2.11), Spark built-in."""
        return VegaDataset(self.df.orderBy(*order))

    # --- actions (§2.2) ---------------------------------------------------------
    def collect(self) -> list[Row]:
        return _act.collect(self.df)

    def count(self) -> int:
        return _act.count(self.df)

    def reduce(self, col: str, agg: Column) -> Any | None:
        return _act.reduce_col(self.df, col, agg)

    def fold(self, col: str, zero: Any, agg: Column) -> Any:
        return _act.fold_col(self.df, col, zero, agg)

    def aggregate(self, aggs: Sequence[Column]) -> Row:
        return _act.aggregate_cols(self.df, aggs)

    def first(self) -> Row:
        return _act.first(self.df)

    def take(self, num: int) -> list[Row]:
        return _act.take(self.df, num)

    def is_empty(self) -> bool:
        return _act.is_empty(self.df)

    def max(self, col: str) -> Any | None:
        return _act.max_col(self.df, col)

    def min(self, col: str) -> Any | None:
        return _act.min_col(self.df, col)

    def for_each_partition(self, fn: Callable[[pd.DataFrame], None]) -> None:
        _core.for_each_partition(self.df, fn)

    def save_as_text_file(self, path: str) -> None:
        _act.save_as_text(self.df, path)

    def save_as_parquet(self, path: str, partition_by: Sequence[str] = ()) -> None:
        _act.save_as_parquet(self.df, path, partition_by=partition_by)

    def cache(self) -> "VegaDataset":
        """RddVals.should_cache, finished (reference left it unwired)."""
        self.df.cache()
        return self

    def checkpoint(self) -> "VegaDataset":
        """Checkpointing — absent from the reference (SURVEY §2.11).
        ``localCheckpoint`` materializes the partitions and truncates
        lineage; on a cluster prefer ``spark.sparkContext.
        setCheckpointDir`` + ``df.checkpoint()`` for fault-tolerant
        (storage-backed) truncation of very deep plans."""
        return VegaDataset(self.df.localCheckpoint())

    # --- approximate actions (§2.9) ---------------------------------------------
    def count_approx(self, timeout_ms: float, confidence: float = 0.95) -> _approx.BoundedDouble:
        return _approx.count_approx(self.df, timeout_ms, confidence)

    def count_by_value_approx(self, cols: Sequence[str], timeout_ms: float,
                              confidence: float = 0.95):
        return _approx.count_by_value_approx(self.df, cols, timeout_ms, confidence)
