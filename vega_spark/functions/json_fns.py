"""JSON column surface (§2.10 superset — the reference has no
function library at all; semi-structured props columns are a staple
of event pipelines).

All expression-only: from_json / get_json_object run JVM-side inside
whole-stage codegen, so JSON decode fuses into the scan — a 100 TB
events table is parsed in one narrow pass with column pruning still
reaching the parquet reader (only the props column is materialized).

Prefer ``from_json`` with an explicit schema over repeated
``get_json_object`` calls: one parse per row instead of one per
extraction path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def parse_json_col(df: DataFrame, col: str, schema: str | StructType,
                   out: str = "props_struct") -> DataFrame:
    """Decode a JSON string column once into a typed struct column."""
    return df.withColumn(out, F.from_json(F.col(col), schema))


def json_get(col: str | Column, path: str) -> Column:
    """Single-path extraction (string result; cast at the call site).
    ``path`` is a JSONPath like ``$.k``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)
