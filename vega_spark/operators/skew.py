"""Skew-mitigation operators: salting for hot keys.

The reference's only physical join/agg strategy is a hash shuffle on
the raw key (src/rdd/shuffled_rdd.rs, src/partitioner.rs:27-58) — a
single hot key lands one reducer with the whole key's data, the
classic straggler at 100 TB. Spark's AQE skew-join splitting handles
the *join* case at runtime; these operators are the explicit salting
forms for when AQE can't help: aggregation skew (AQE never splits an
aggregation key) and deterministic pre-planned salting.

Semantics are identical to the unsalted join/agg — salting is pure
physical re-layout, which is why these queries oracle-check against
plain SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# aggregate decompositions: (partial expr, final expr) per kind
_DECOMP = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_join(left: DataFrame, right: DataFrame,
                key_cols: Sequence[str], n_salt: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join with the left (large, skewed) side salted into
    ``n_salt`` sub-keys and the right side replicated ``n_salt``x.

    Hot left keys spread over ``n_salt`` reducers; cost is an
    ``n_salt``x blow-up of the right side's shuffle — use when right
    is small-ish but above the broadcast threshold (below it, just
    broadcast). The salt is a deterministic hash of the whole left
    row, so the operator stays reproducible and pure.
    """
    key_cols = list(key_cols)
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                   F.lit(n_salt))
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    return (l.join(r, on=key_cols + ["__salt"], how=how)
            .drop("__salt"))


def salted_agg(df: DataFrame, key_cols: Sequence[str],
               aggs: Sequence[tuple[str, str, str]],
               n_salt: int = 8) -> DataFrame:
    """Two-phase aggregation with an explicit salt: groupBy(key, salt)
    partial → groupBy(key) final. ``aggs`` is (col, kind, alias) with
    kind in {sum, count, min, max} (the decomposable set — avg is
    sum/count composed by the caller).

    Spark's partial/final HashAggregate already combines map-side; the
    salt additionally splits the *reduce side* of a hot key across
    ``n_salt`` tasks, which plain partial aggregation cannot do when
    one grouping key dominates a partition's output.
    """
    key_cols = list(key_cols)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    partial = (df.withColumn("__salt", salt)
               .groupBy(*key_cols, "__salt")
               .agg(*[_DECOMP[kind][0](col).alias(alias)
                      for col, kind, alias in aggs]))
    return (partial.groupBy(*key_cols)
            .agg(*[_DECOMP[kind][1](alias).alias(alias)
                   for _, kind, alias in aggs]))
