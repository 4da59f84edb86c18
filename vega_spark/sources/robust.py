"""Malformed-input tolerance for semi-structured reads — open-crawl
corpora ALWAYS contain broken records; a 100 TB ingest that dies on
row 40 billion is not an option, and silently dropping rows is
worse. Spark's PERMISSIVE mode keeps every malformed line in a
quarantine column so the pipeline can count, sample and triage them
(the observe() metrics in operators/actions.py pair well here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_json_permissive(spark: SparkSession, path: str,
                         schema: str) -> DataFrame:
    """JSON-lines read that quarantines malformed rows instead of
    failing (or dropping them): schema gains a ``_corrupt_record``
    string column holding the raw line when parsing fails."""
    full = schema + f", {CORRUPT_COL} string"
    return (spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path))


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_quarantine_col, quarantined_raw_lines).

    Spark refuses queries that reference ONLY the internal corrupt
    column over a raw JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_
    CORRUPT_RECORD_COLUMN) — the documented pattern is to persist the
    parsed result first, which also means the triage pass parses the
    input once, not once per branch."""
    df = df.cache()
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()) \
            .select(F.col(CORRUPT_COL).alias("raw"))
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return good, bad
