"""vega_spark — a PySpark-native analytics engine with the capability
surface of rajasekarv/vega (a from-scratch Rust reimplementation of
Spark's RDD core), re-expressed DataFrame-first.

The reference's scheduler/shuffle/cache/executor layers (~70% of its
code) are Spark itself in this stack; what lives here is the operator
library with reference-pinned semantics (see SURVEY.md §2), plus
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale:

- every operator is declarative (Catalyst-optimizable) unless the
  semantics genuinely require per-partition imperative logic;
- joins broadcast small sides, aggregations rely on partial/final
  HashAggregate, filters/projections push down to the parquet scan;
- Python stays out of the hot path (Arrow-batched pandas UDFs only
  where built-ins can't express the op).
"""

from vega_spark.session import get_session
from vega_spark.tables import TABLE_NAMES, load_table, load_tables, register_views

__all__ = [
    "get_session",
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
]

__version__ = "0.1.0"
