"""Incremental view maintenance: keep an aggregate snapshot current
by COMBINING it with a delta's partial aggregates — never re-scanning
the base table. The fourth leg of the repo's incremental story
(incremental dedup, KMV/HLL sketch rollups, CDC apply, and now
additive materialized views).

Soundness rests on the aggregates being ABELIAN (sum/count — and
anything derivable from them: avg, ratios): partial states add, and
retractions are just negative contributions. min/max are NOT
maintainable this way (a retraction can expose a new extremum that
only the base table knows); refuse them here rather than silently
corrupt — recompute those, or maintain a sketch/heap per group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_view(base: DataFrame, keys: Sequence[str],
                   sum_cols: Sequence[str],
                   count_col: str = "n") -> DataFrame:
    """Build the maintainable snapshot: per-key sums + row count.
    One partial+final keyed aggregate."""
    aggs = [F.sum(c).alias(c) for c in sum_cols]
    return (base.groupBy(*keys)
            .agg(*aggs, F.count(F.lit(1)).alias(count_col)))


def refresh_aggregate_view(view: DataFrame, delta: DataFrame,
                           keys: Sequence[str],
                           sum_cols: Sequence[str],
                           count_col: str = "n",
                           sign_col: str | None = None) -> DataFrame:
    """Combine a snapshot with a raw-row delta: aggregate the delta
    (tiny — one keyed agg over the delta only), full-outer on the
    keys, add the partials, and drop groups whose row count reaches
    zero. ``sign_col`` (+1 insert / -1 retraction) makes the delta a
    proper changelog; omitted, every delta row is an insert.

    Cost: O(|delta|) + a join against the view (itself
    group-cardinality-sized, usually broadcastable) — independent of
    the base table, which is the point of maintaining the view."""
    s = F.col(sign_col) if sign_col else F.lit(1)
    d = (delta.groupBy(*keys)
         .agg(*[F.sum(F.col(c) * s).alias(c) for c in sum_cols],
              F.sum(s).alias(count_col)))
    v, dd = view.alias("v"), d.alias("d")
    merged = v.join(dd, on=list(keys), how="full_outer")
    out_sums = [
        (F.coalesce(F.col(f"v.{c}"), F.lit(0))
         + F.coalesce(F.col(f"d.{c}"), F.lit(0))).alias(c)
        for c in sum_cols]
    out_n = (F.coalesce(F.col(f"v.{count_col}"), F.lit(0))
             + F.coalesce(F.col(f"d.{count_col}"), F.lit(0))).alias(count_col)
    return (merged.select(*keys, *out_sums, out_n)
            .filter(F.col(count_col) > 0))


def join_view(left: DataFrame, right: DataFrame,
              on: Sequence[str]) -> DataFrame:
    """Build the maintainable JOIN view (inner equi-join)."""
    return left.join(right, on=list(on))


def refresh_join_view(view: DataFrame,
                      left_old: DataFrame, delta_left: DataFrame,
                      right_old: DataFrame, delta_right: DataFrame,
                      on: Sequence[str]) -> DataFrame:
    """Incremental maintenance of an inner-join view under
    INSERT-ONLY deltas — the classic delta algebra
    (Blakeley/Larson/Tompa '86; the DBSP/differential-dataflow
    bilinear rule):

        V' = V ∪ (ΔL ⋈ R) ∪ (L ⋈ ΔR) ∪ (ΔL ⋈ ΔR)

    so the refresh cost is |Δ|·join-selectivity, never a rescan of
    L ⋈ R. Retractions need signed multiplicities (see
    refresh_aggregate_view's sign_col) — refused here rather than
    silently double-counted: insert-only is the append-log case the
    streaming legs produce.

    Scale: the three delta joins are delta-sized on one side, so
    under AQE they broadcast; the old-side tables are scanned once
    each, not joined against each other."""
    keys = list(on)
    return (view
            .unionByName(delta_left.join(right_old, on=keys))
            .unionByName(left_old.join(delta_right, on=keys))
            .unionByName(delta_left.join(delta_right, on=keys)))


def to_multiset(df: DataFrame, mult_col: str = "__mult") -> DataFrame:
    """Collapse a bag to (distinct row, multiplicity) — the signed
    representation the retraction-capable view algebra works over."""
    return df.groupBy(*df.columns).agg(
        F.count(F.lit(1)).cast("long").alias(mult_col))


def refresh_join_view_signed(view: DataFrame,
                             left_old: DataFrame, delta_left: DataFrame,
                             right_old: DataFrame, delta_right: DataFrame,
                             on: Sequence[str],
                             mult_col: str = "__mult") -> DataFrame:
    """Join-view maintenance WITH retractions (signed multiplicities —
    the full bilinear rule of differential dataflow / DBSP): every
    frame is a multiset (distinct row + ``mult_col``; deltas carry
    NEGATIVE multiplicities for deletes), and

        ΔV = ΔL⋈R₀ + L₀⋈ΔR + ΔL⋈ΔR,  mult(v) = mult(l)·mult(r)

    V' collapses (V ∪ ΔV) by summing multiplicities and dropping
    zeros — so a delete propagates as exactly the negative of the
    join rows it once produced, with NO rescan of the old join.

    Cost: three delta-sized joins (broadcast under AQE) + one
    collapse keyed on the view row. The collapse key is the full row;
    at scale, pre-project the view to the columns consumers need."""
    keys = list(on)

    def prod_join(a: DataFrame, b: DataFrame) -> DataFrame:
        am = a.withColumnRenamed(mult_col, "__ml")
        bm = b.withColumnRenamed(mult_col, "__mr")
        out_cols = [c for c in am.columns if c != "__ml"] \
            + [c for c in bm.columns if c not in keys + ["__mr"]]
        return (am.join(bm, on=keys)
                .select(*out_cols,
                        (F.col("__ml") * F.col("__mr")).alias(mult_col)))

    delta_v = (prod_join(delta_left, right_old)
               .unionByName(prod_join(left_old, delta_right))
               .unionByName(prod_join(delta_left, delta_right)))
    group_cols = [c for c in view.columns if c != mult_col]
    return (view.unionByName(delta_v)
            .groupBy(*group_cols)
            .agg(F.sum(mult_col).alias(mult_col))
            .filter(F.col(mult_col) != 0))
