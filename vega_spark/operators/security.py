"""Row- and column-level security views: a declarative policy
(row predicate per role + per-column mask) compiled into a plain
DataFrame the consumer queries as if it were the table — the
governance layer every multi-tenant lakehouse needs before handing
analysts raw PII-bearing tables.

Masks are pure Column expressions, so Catalyst still pushes the ROW
predicate into the scan (masking happens in the projection above the
filter, never blocking pushdown) and prunes unread columns normally:
the secured view costs what an equivalent hand-written projection
costs. Deterministic masks (sha2 tokenization, bucketing) keep JOINs
and GROUP BYs working on masked data — equal plaintext masks to
equal tokens — which plain redaction destroys.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- mask builders (each: Column -> Column) --------------------------------


def mask_hash(c: Column, salt: str = "") -> Column:
    """Deterministic tokenization: sha256(salt || value), hex. Joins
    and distinct-counts keep working; the plaintext does not leave."""
    return F.sha2(F.concat(F.lit(salt), c.cast("string")), 256)


def mask_bucket(c: Column, width: int) -> Column:
    """Numeric generalization: floor to a ``width``-sized bucket
    (k-anonymity-style coarsening that keeps aggregates meaningful)."""
    return (F.floor(c / width) * width).cast("long")


def mask_last(c: Column, keep: int = 2) -> Column:
    """Partial redaction: all but the last ``keep`` characters become
    '*' (the familiar '******37' account display form)."""
    s = c.cast("string")
    return F.when(F.length(s) <= keep, s).otherwise(
        F.concat(F.repeat(F.lit("*"), (F.length(s) - keep).cast("int")),
                 F.substring(s, -keep, keep)))


def secure_view(df: DataFrame,
                row_filter: Column | None,
                column_masks: Mapping[str, Column],
                drop_columns: tuple[str, ...] = ()) -> DataFrame:
    """Compile a security policy into a DataFrame: apply the row
    predicate FIRST (so it reaches the scan as a pushed filter),
    then replace each policy-masked column with its mask expression
    and drop the forbidden ones entirely. Column names/types are
    stable, so downstream queries are unchanged."""
    out = df.filter(row_filter) if row_filter is not None else df
    cols = []
    for name in out.columns:
        if name in drop_columns:
            continue
        if name in column_masks:
            cols.append(column_masks[name].alias(name))
        else:
            cols.append(F.col(name))
    return out.select(*cols)
