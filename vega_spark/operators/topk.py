"""Top-k and ordering (SURVEY.md §2.2 top/take_ordered + §2.11 gap
fill: the reference has NO global sort — only heap-based top-k).

Reference parity:
- top(num)          reference src/rdd/rdd.rs:1101-1117 + bounded
  priority queue src/utils/bounded_priority_queue.rs:8-58 — largest k
  via per-partition heaps merged at the driver. Spark's
  TakeOrderedAndProject is the identical algorithm (per-partition
  top-k, no global sort, no full shuffle) and is what
  orderBy(...).limit(k) plans to.
- take_ordered(num) reference src/rdd/rdd.rs:1119-1153 — smallest k.

Capability superset: full global ordering via orderBy (range
exchange + per-partition sort) — absent in the reference.

Scale notes: orderBy(...).limit(k) never sorts the full dataset —
verify the plan shows TakeOrderedAndProject, not Sort+Exchange.
Always pass tiebreaker columns if downstream compares exact row
sets: top-k under ties is otherwise nondeterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top(df: DataFrame, num: int, order: Sequence[Column | str]) -> DataFrame:
    """Largest k under ``order`` (descending on each given column)."""
    cols = [F.col(c).desc() if isinstance(c, str) else c.desc() for c in order]
    return df.orderBy(*cols).limit(num)


def take_ordered(df: DataFrame, num: int, order: Sequence[Column | str]) -> DataFrame:
    """Smallest k (ascending)."""
    cols = [F.col(c).asc() if isinstance(c, str) else c.asc() for c in order]
    return df.orderBy(*cols).limit(num)


def topk_per_group(df: DataFrame, group_cols: Sequence[str],
                   order: Sequence[Column], k: int,
                   rank_name: str = "rk") -> DataFrame:
    """Top-k per group — window row_number + filter. The scale-safe
    form of "the reference's heap per key": one hash exchange on the
    group key, per-partition sort, no global sort."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn(rank_name, F.row_number().over(w))
              .filter(F.col(rank_name) <= k))


def sort_global(df: DataFrame, order: Sequence[Column | str]) -> DataFrame:
    """Total order across ALL partitions. Plans as a range-partitioned
    sort (sampled split points -> Exchange rangepartitioning -> local
    sort per partition) — each partition holds a contiguous key range,
    so downstream writes stay globally sorted and a merged read is
    ordered. This is the scale-correct total sort; coalesce(1)+sort
    would serialize on one task. Only use when a TOTAL order is
    required — for top/bottom-k use top/take_ordered (no full sort)."""
    return df.orderBy(*order)
