"""Keyed aggregation — the combine_by_key family (SURVEY.md §2.5).

Reference parity: the general mechanism is ``combine_by_key`` over a
shuffle with an Aggregator triple (create_combiner / merge_value /
merge_combiners, reference src/aggregator.rs:8-31) executed as
two-phase hash aggregation: map-side partial combine
(src/dependency.rs:164-229) then reduce-side merge
(src/rdd/shuffled_rdd.rs:149-170). That is *exactly* Spark's
partial+final HashAggregate, so every specialization below is a
``groupBy().agg()`` and the map-side combine comes from Catalyst for
free:

- combine_by_key   reference src/rdd/pair_rdd.rs:20-33
- reduce_by_key    reference src/rdd/pair_rdd.rs:54-80
- group_by_key     reference src/rdd/pair_rdd.rs:35-52 (Vec combiner,
                   src/aggregator.rs:33-53)
- group_by(f)      reference src/rdd/rdd.rs:948-1016 (key_by + group)
- count_by_value   reference src/rdd/rdd.rs:449-459
- avg-by-key       reference examples/file_read.rs:26-28 ((sum,count)
                   combiner then divide)

Capability superset (absent in the reference, SURVEY §2.11): rollup /
cube / grouping sets / distinct aggregates — Spark built-ins.

Scale notes: groupBy shuffles on the key — at 100 TB the win is
(a) partial aggregation before the exchange (automatic), (b) AQE
coalescing the post-shuffle partitions, (c) for skewed keys, salting
(see ``reduce_by_key_salted``). ``group_by_key``/collect_list has no
map-side combine by nature (same in the reference and Spark) — prefer
reduce-style aggregates when the downstream allows.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def reduce_by_key(df: DataFrame, key_cols: Sequence[str], *aggs: Column) -> DataFrame:
    """``reduce_by_key(f)``: per-key commutative/associative combine.
    Map-side partial + reduce-side final HashAggregate."""
    return df.groupBy(*key_cols).agg(*aggs)


def group_by_key(df: DataFrame, key_cols: Sequence[str], value_col: str,
                 sort_values: bool = False) -> DataFrame:
    """``group_by_key()``: per-key value list. ``sort_values`` gives a
    deterministic array order (the reference's Vec order is partition
    /arrival order — explicitly not a stable contract; tests in the
    reference sort before asserting, tests/test_pair_rdd.rs:30)."""
    arr = F.collect_list(value_col)
    if sort_values:
        arr = F.sort_array(arr)
    return df.groupBy(*key_cols).agg(arr.alias("values"))


def group_by(df: DataFrame, key_expr: Column, key_name: str = "key",
             sort_values: bool = False) -> DataFrame:
    """``group_by(f)`` = key_by + group_by_key: groups whole rows."""
    arr = F.collect_list(F.struct(*df.columns))
    out = df.groupBy(key_expr.alias(key_name)).agg(arr.alias("values"))
    if sort_values:
        out = out.withColumn("values", F.sort_array(F.col("values")))
    return out


def count_by_value(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    return df.groupBy(*cols).agg(F.count(F.lit(1)).alias("count"))


def avg_by_key(df: DataFrame, key_cols: Sequence[str], value_col: str,
               out_name: str = "avg") -> DataFrame:
    """The reference's de-facto benchmark aggregate: (sum, count)
    combiner then divide (examples/file_read.rs:26-28). Spark's avg is
    the same partial (sum,count) pair under the hood."""
    return df.groupBy(*key_cols).agg(F.avg(value_col).alias(out_name))


def combine_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    combine: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """``combine_by_key(aggregator, partitioner)`` with an *arbitrary*
    combiner that built-in aggregates can't express: the Aggregator
    triple becomes a per-group pandas function (applyInPandas).

    The shuffle routes each key to one task (HashPartitioner ≡ hash
    exchange); unlike built-in aggregates there is no map-side
    combine on this path — the price of arbitrary Python combiners.
    ``combine`` receives the full group and returns exactly the
    combined record(s) with ``schema``."""
    return df.groupBy(*key_cols).applyInPandas(combine, schema=schema)


def reduce_by_key_salted(df: DataFrame, key_cols: Sequence[str],
                         value_col: str, agg_name: str, out_name: str,
                         salt_buckets: int = 16) -> DataFrame:
    """Skew-resistant reduce_by_key: two-round aggregation with a
    random salt. Round 1 aggregates (key, salt) — spreading a hot key
    over ``salt_buckets`` reducers — round 2 merges the partials.
    Only sum/count/min/max compose this way (re-aggregable).

    At 100 TB a single hot key (null join keys, default values) makes
    one straggler task; AQE skew handling covers joins but not
    aggregations, hence this operator."""
    if agg_name not in {"sum", "count", "min", "max"}:
        raise ValueError("salting requires a re-aggregable aggregate")
    fn = getattr(F, agg_name)
    partial = (
        df.withColumn("__salt", (F.rand(seed=7) * salt_buckets).cast("int"))
        .groupBy(*key_cols, "__salt")
        .agg(fn(value_col).alias("__partial"))
    )
    merge = F.sum if agg_name in {"sum", "count"} else fn
    return partial.groupBy(*key_cols).agg(merge("__partial").alias(out_name))


def rollup_agg(df: DataFrame, key_cols: Sequence[str], *aggs: Column) -> DataFrame:
    """GROUP BY ROLLUP — capability superset (reference has none)."""
    return df.rollup(*key_cols).agg(*aggs)


def cube_agg(df: DataFrame, key_cols: Sequence[str], *aggs: Column) -> DataFrame:
    """GROUP BY CUBE — capability superset."""
    return df.cube(*key_cols).agg(*aggs)


def grouping_sets_agg(df: DataFrame, sets: Sequence[Sequence[str]],
                      all_keys: Sequence[str], agg_sql: str) -> DataFrame:
    """GROUPING SETS via the SQL surface (no DataFrame literal API).
    ``agg_sql`` is the aggregate list, e.g. "sum(v) AS s, count(*) AS c"."""
    df.createOrReplaceTempView("__gs_in")
    sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in sets)
    keys_sql = ", ".join(all_keys)
    return df.sparkSession.sql(
        f"SELECT {keys_sql}, {agg_sql} FROM __gs_in GROUP BY GROUPING SETS ({sets_sql})"
    )


def pivot_agg(df: DataFrame, key_cols: Sequence[str], pivot_col: str,
              pivot_values: Sequence[str], agg: Column) -> DataFrame:
    """Wide contingency/rollup: one column per pivot value. The value
    list is REQUIRED here (not inferred): inference runs an extra
    distinct job over the full table and can explode the schema —
    at 100 TB the caller must bound the width explicitly."""
    return (df.groupBy(*key_cols)
            .pivot(pivot_col, list(pivot_values))
            .agg(agg))


def unpivot(df: DataFrame, id_cols: Sequence[str],
            value_cols: Sequence[str],
            var_name: str = "var", value_name: str = "value") -> DataFrame:
    """Wide → long (melt). Narrow op: each input row fans out to
    len(value_cols) rows inside the same task, no shuffle."""
    return df.unpivot(list(id_cols), list(value_cols), var_name, value_name)
