"""Table loaders for the driver's synthetic TPC-H-ish star schema
(TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under a scale
directory such as /root/testdata/sf0.01.

Reference parity: ``read_source(config, decoder)`` + the pluggable
``ReaderConfiguration`` (reference src/context.rs:445-455,
src/io/mod.rs:11-16) maps to ``spark.read.<format>``; Spark's split
planning replaces the reference's size-balanced bin packing
(src/io/local_file_reader.rs:221-295) and its host pinning becomes
locality preference, which is a no-op on object storage.

Scale notes: parquet scans get predicate pushdown + column pruning
from Catalyst for free — callers should select/filter on the loaded
DataFrame and let the optimizer reach the scan. At 100 TB each
"table" is a directory of many files (possibly partitioned by date);
``load_table`` takes any path spark.read.parquet accepts.

Time-column contract: the engine's event-time column ``events.ts`` is
normalized at load to **BIGINT nanoseconds since epoch (naive wall
clock, UTC)** regardless of the physical parquet type:

- parquet timestamp[ns] → read raw via
  spark.sql.legacy.parquet.nanosAsLong=true (already BIGINT ns);
- parquet timestamp[us/ms] (TIMESTAMP_NTZ / TIMESTAMP) → converted
  with ``unix_micros`` under the pinned UTC session timezone, so the
  naive wall clock is preserved exactly.

All derived time columns then use pure integer arithmetic so results
are session-timezone-independent and match a UTC-naive oracle
(DuckDB reads the same parquet as naive TIMESTAMP and extracts the
same wall-clock fields).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_NS_PER_HOUR = 3_600 * 10**9
_NS_PER_DAY = 86_400 * 10**9


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table. For ``events`` the ``ts`` column is
    normalized to BIGINT nanoseconds (see module docstring)."""
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:
            pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and "ts" in df.columns:
        kind = dict(df.dtypes)["ts"]
        if kind != "bigint":
            # TIMESTAMP_NTZ (µs/ms physical) → naive wall clock → ns.
            # Cast NTZ→LTZ is wall-clock-preserving under UTC session
            # tz (pinned above); unix_micros is then exact integer µs.
            df = df.withColumn(
                "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register every table as a temp view (for the SQL surface)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name + suffix)


# --- timezone-independent event-time helpers (ts = BIGINT ns since epoch) ---

def ts_hour_of_day(col: str | F.Column = "ts") -> F.Column:
    """Hour-of-day 0..23 from a BIGINT-nanos column (UTC wall clock).
    Matches DuckDB ``EXTRACT(hour FROM ts)`` on the naive timestamp."""
    c = F.col(col) if isinstance(col, str) else col
    return ((c % _NS_PER_DAY) / _NS_PER_HOUR).cast("int")


def ts_date(col: str | F.Column = "ts") -> F.Column:
    """DATE from BIGINT-nanos (days since epoch — TZ-independent)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_from_unix_date((c / _NS_PER_DAY).cast("int"))


def ts_hour_bucket_epoch_s(col: str | F.Column = "ts") -> F.Column:
    """Tumbling 1-hour window start as BIGINT epoch seconds.
    Matches DuckDB ``EXTRACT(epoch FROM date_trunc('hour', ts))``."""
    c = F.col(col) if isinstance(col, str) else col
    return ((c / _NS_PER_HOUR).cast("bigint") * 3600).cast("bigint")
