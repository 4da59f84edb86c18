"""Joins & cogroup (SURVEY.md §2.4).

Reference parity:
- join(other, n)    reference src/rdd/pair_rdd.rs:104-121 — inner
  equi-join implemented as cogroup + per-key cross product; the only
  physical strategy is a shuffled hash cogroup. Here Catalyst picks
  broadcast-hash / sort-merge / shuffled-hash per side sizes, and the
  full join-type matrix (left/right/full/semi/anti) is a capability
  superset the reference lacks.
- cogroup(...)      reference src/rdd/pair_rdd.rs:123-155,
  src/rdd/co_grouped_rdd.rs:66-250 — N-ary group across datasets with
  shuffle elision for co-partitioned inputs (:102-126). Spark elides
  the exchange the same way via HashPartitioning propagation.
- cartesian(other)  reference src/rdd/rdd.rs:352-362, cartesian_rdd.rs:31-139
- zip(other)        reference src/rdd/rdd.rs:818-829, zip_rdd.rs:32-150 —
  positional pairing; no DataFrame equivalent, emulated with
  row_number over an explicit ordering (the only well-defined
  ordering at scale; partition-order zip is nondeterministic after
  any shuffle, so the explicit-key form is strictly safer).

Scale notes: ``join`` broadcasts the small side automatically below
spark.sql.autoBroadcastJoinThreshold and via AQE at runtime; pass
``broadcast_right=True`` to force it for dimension tables. Skewed
join keys are split by AQE (skewJoin enabled in session defaults).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column,
         how: str = "inner", broadcast_right: bool = False) -> DataFrame:
    """Equi-join (reference: inner only; all Spark join types exposed).
    Duplicate keys multiply (per-key cross product) exactly as the
    reference's cogroup+flatten does."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def cogroup(left: DataFrame, right: DataFrame,
            left_key: str, right_key: str,
            left_value: str, right_value: str,
            key_name: str = "key",
            sort_values: bool = True) -> DataFrame:
    """``cogroup``: for every key present in either input, the list of
    left values and the list of right values (empty array when the
    side lacks the key — the reference emits empty Vecs likewise).

    Physical shape: two partial aggregations (collect_list per side)
    then a full-outer shuffle join on the key. When both inputs are
    already hash-partitioned on the key the exchanges are elided —
    the same co-partitioning optimization as the reference's narrow
    cogroup dependency."""
    lg = left.groupBy(F.col(left_key).alias(key_name)).agg(
        F.collect_list(left_value).alias("left_values"))
    rg = right.groupBy(F.col(right_key).alias(key_name)).agg(
        F.collect_list(right_value).alias("right_values"))
    out = lg.join(rg, on=key_name, how="full_outer").select(
        key_name,
        F.coalesce("left_values", F.array()).alias("left_values"),
        F.coalesce("right_values", F.array()).alias("right_values"),
    )
    if sort_values:
        out = out.select(
            key_name,
            F.sort_array("left_values").alias("left_values"),
            F.sort_array("right_values").alias("right_values"),
        )
    return out


def cartesian(left: DataFrame, right: DataFrame) -> DataFrame:
    """Cross product. The reference materializes the right side per
    task (cartesian_rdd.rs:107-139); Spark's BroadcastNestedLoopJoin
    does the same with a broadcast, or falls back to
    CartesianProduct. Keep one side small."""
    return left.crossJoin(right)


def zip_by_order(left: DataFrame, right: DataFrame,
                 left_order: Sequence[str], right_order: Sequence[str]) -> DataFrame:
    """``zip``: positional pairing of two equal-length datasets under
    explicit total orderings (reference zips partition iterators —
    that ordering is only reproducible with an explicit sort key).

    Implementation: row_number over each ordering, inner join on the
    index. Two range-partitioned sorts + one join; at 100 TB prefer a
    shared key over positional semantics."""
    from pyspark.sql.window import Window

    lw = Window.orderBy(*[F.col(c) for c in left_order])
    rw = Window.orderBy(*[F.col(c) for c in right_order])
    li = left.withColumn("__idx", F.row_number().over(lw))
    ri = right.withColumn("__idx", F.row_number().over(rw))
    # disambiguate colliding column names with suffixes, like rdd.zip's tuple
    rcols = [F.col(c).alias(c if c not in left.columns else c + "_right")
             for c in right.columns]
    return li.join(ri.select("__idx", *rcols), on="__idx", how="inner").drop("__idx")


def zip_with_index(df: DataFrame, order: Sequence[str],
                   index_name: str = "index") -> DataFrame:
    """zipWithIndex under an explicit ordering (0-based)."""
    from pyspark.sql.window import Window

    w = Window.orderBy(*[F.col(c) for c in order])
    return df.withColumn(index_name, F.row_number().over(w) - F.lit(1))
