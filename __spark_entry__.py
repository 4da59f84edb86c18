"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (the reference's de-facto benchmark
aggregate, examples/file_read.rs:13-29, over the events table) at
sf0.001.

``queries()`` / ``oracle_sql()`` — the operator registry lives in
``vega_spark.registry``; every SURVEY.md §2 operator family has at
least one entry, and each SQL-expressible one carries a DuckDB
oracle with column names/types/rounding aligned on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from vega_spark import registry  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["weblog_agg"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(registry.ORACLES)
