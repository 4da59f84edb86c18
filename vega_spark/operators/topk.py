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


def pareto_frontier(df: DataFrame, maximize: Sequence[str]) -> DataFrame:
    """Skyline / Pareto-optimal rows: keep every row not dominated by
    another (q dominates p iff q >= p on ALL ``maximize`` columns and
    q > p on at least one). Numeric and temporal columns only.

    Distributed shape (the classic two-phase skyline): an Arrow-
    batched local frontier per partition first — dominance is
    transitive, so any row dominated within its partition is dominated
    globally and can never re-enter — then the same kernel over the
    single-partition union of survivors. On independently-distributed
    data a d-dim frontier is O(log^(d-1) n) rows, so phase 2's input
    is partitions x a-few-dozen candidates (same driver-merge scale as
    TakeOrdered); the full table is touched exactly once, no shuffle
    of non-candidates. Duplicated points never dominate each other
    (no strict coordinate), so exact ties all survive — matching the
    SQL NOT EXISTS formulation oracles replay."""
    import numpy as np
    import pandas as pd

    cols = list(df.columns)
    keys = list(maximize)

    def _columns(pdf: "pd.DataFrame") -> list["np.ndarray"]:
        # native dtypes end to end: int64 cents / epoch-ns never pass
        # through float64 (2^53 would merge distinct values)
        arrs = []
        for c in keys:
            s = pdf[c]
            if np.issubdtype(s.dtype, np.datetime64):
                arrs.append(s.astype("int64").to_numpy())
            else:
                arrs.append(s.to_numpy())
        return arrs

    def _frontier(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) == 0:
            return pdf
        arrs = _columns(pdf)
        # descending lexicographic scan: any dominator of a row sorts
        # strictly before it, and (by transitivity) every row is
        # dominated by a KEPT row or none — one pass, kept set stays
        # frontier-sized
        order = np.lexsort(tuple(reversed(arrs)))[::-1]
        kept_idx: list[int] = []
        kept_rows: list[tuple] = []
        for i in order:
            v = tuple(a[i] for a in arrs)
            dominated = False
            for w in kept_rows:
                ge = all(wj >= vj for wj, vj in zip(w, v))
                if ge and any(wj > vj for wj, vj in zip(w, v)):
                    dominated = True
                    break
            if not dominated:
                kept_idx.append(i)
                kept_rows.append(v)
        return pdf.iloc[sorted(kept_idx)]

    def _kernel(it):
        # frontier per Arrow batch, then once over the batch
        # survivors: partition memory stays bounded by frontier size,
        # not partition size
        parts = [f for f in (map(_frontier, it))]
        parts = [f for f in parts if len(f)]
        if not parts:
            return
        yield _frontier(pd.concat(parts, ignore_index=True))

    local = df.select(*cols).mapInPandas(_kernel, df.select(*cols).schema)
    return local.repartition(1).mapInPandas(_kernel, local.schema)


def sort_global(df: DataFrame, order: Sequence[Column | str]) -> DataFrame:
    """Total order across ALL partitions. Plans as a range-partitioned
    sort (sampled split points -> Exchange rangepartitioning -> local
    sort per partition) — each partition holds a contiguous key range,
    so downstream writes stay globally sorted and a merged read is
    ordered. This is the scale-correct total sort; coalesce(1)+sort
    would serialize on one task. Only use when a TOTAL order is
    required — for top/bottom-k use top/take_ordered (no full sort)."""
    return df.orderBy(*order)
