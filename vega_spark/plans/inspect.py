"""Plan inspection helpers — the "did Catalyst do what we designed
for" checks (SURVEY.md §4: every reference optimization is native to
Spark; these helpers let tests *assert* that instead of hoping).

Used by tests to pin scale-relevant plan properties:
- filters/projections reach the parquet scan (PushedFilters/ReadSchema)
- small-side joins broadcast (BroadcastHashJoin)
- top-k plans as TakeOrderedAndProject, not Sort+Exchange
- aggregations are partial+final HashAggregate
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def plan_text(df: DataFrame) -> str:
    """Formatted physical plan as a string (no stdout side effects)."""
    try:
        return formatted_plan(df)
    except Exception:
        return df._jdf.queryExecution().explainString("formatted")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    txt = plan_text(df)
    return "PushedFilters" in txt and fragment in txt


def scan_reads_only(df: DataFrame, columns: set[str], table_fragment: str) -> bool:
    """True if the parquet scan's ReadSchema contains exactly/at most
    the given columns (column pruning reached the reader)."""
    txt = plan_text(df)
    for block in txt.split("\n\n"):
        if "Scan parquet" in block and table_fragment in block and "ReadSchema" in block:
            line = [ln for ln in block.splitlines() if "ReadSchema" in ln][0]
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            read_cols = {c.split(":")[0].strip() for c in inner.split(",") if c}
            return read_cols <= columns
    return False


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_text(df)


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in plan_text(df)


def count_exchanges(df: DataFrame) -> int:
    txt = plan_text(df)
    return sum(1 for ln in txt.splitlines()
               if ln.strip().startswith("Exchange") or " Exchange" in ln.split("(")[0])


def has_partial_aggregate(df: DataFrame) -> bool:
    """Partial+final HashAggregate (map-side combine present)."""
    txt = plan_text(df)
    return txt.count("HashAggregate") >= 2 or "partial_" in txt
