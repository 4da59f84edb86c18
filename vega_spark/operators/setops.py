"""Set operations (SURVEY.md §2.6) with reference-pinned semantics:
union is a BAG (duplicates kept); intersection and subtract are SETS
(output deduplicated).

Reference parity:
- union            reference src/rdd/rdd.rs:805-816, union_rdd.rs:60-345 —
  bag semantics (tests/test_rdd.rs:388-432 expects duplicates). The
  reference's partitioner-aware variant (shared partitioner → narrow
  deps) is Spark's union + AQE partition handling.
- distinct         reference src/rdd/rdd.rs:500-531 (map to (x, None)
  → reduce_by_key keep-one → keys) ≡ groupBy-all-columns, which is
  what Spark's Deduplicate physical plan does.
- intersection     reference src/rdd/rdd.rs:831-838, :900-946 —
  cogroup both sides, keep keys present in both, DEDUPLICATED.
- subtract         reference src/rdd/rdd.rs:840-899 — output
  deduplicated (tests/test_rdd.rs:676-699): matches df.except
  (EXCEPT DISTINCT), not exceptAll.

Scale notes: distinct/intersect/except shuffle on the full row; at
100 TB prefer deduplicating on a key or content hash (see
functions.dedup) so the exchange carries hashes, not payloads.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def union_bag(left: DataFrame, right: DataFrame) -> DataFrame:
    """Bag union (UNION ALL). Concatenation of inputs, like the
    reference's RangeDependency union — no shuffle at all."""
    return left.unionByName(right)


def union_all(datasets: Sequence[DataFrame]) -> DataFrame:
    """``Context::union(&[rdds])``: n-ary bag union."""
    it = iter(datasets)
    out = next(it)
    for d in it:
        out = out.unionByName(d)
    return out


def distinct(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Distinct rows (optionally on a column subset — keeps only those
    columns, mirroring the reference's key-only distinct)."""
    return (df.select(*subset) if subset else df).distinct()


def intersection(left: DataFrame, right: DataFrame) -> DataFrame:
    """INTERSECT (distinct) — matches reference dedup semantics."""
    return left.intersect(right)


def subtract(left: DataFrame, right: DataFrame) -> DataFrame:
    """EXCEPT (distinct) — the reference deduplicates survivors."""
    return left.subtract(right)


def except_all(left: DataFrame, right: DataFrame) -> DataFrame:
    """EXCEPT ALL (bag semantics — multiplicity-aware difference).

    Superset of the reference's ``subtract`` (src/rdd/rdd.rs:840-899,
    which deduplicates): each row survives max(0, n_left - n_right)
    times. Spark plans this as a single hash aggregate over a
    multiplicity counter — one shuffle on the full row, same cost
    shape as distinct."""
    return left.exceptAll(right)


def intersect_all(left: DataFrame, right: DataFrame) -> DataFrame:
    """INTERSECT ALL (bag semantics): each row appears
    min(n_left, n_right) times. Superset of the reference's
    deduplicating ``intersection`` (src/rdd/rdd.rs:831-838)."""
    return left.intersectAll(right)


def subtract_by_key(left: DataFrame, right: DataFrame,
                    key: str | Sequence[str]) -> DataFrame:
    """Pair-RDD ``subtractByKey``: keep left rows whose KEY does not
    appear in right; left payload survives with its multiplicity
    (only keys are compared — Spark's RDD subtractByKey semantics;
    the reference has only the full-row ``subtract``).

    Scale: a LEFT ANTI join — Catalyst broadcasts the right side
    when it is small (key-only projection makes that likely even for
    big tables), else shuffles only the key column of the right side."""
    keys = [key] if isinstance(key, str) else list(key)
    return left.join(right.select(*keys).distinct(), on=keys, how="left_anti")
