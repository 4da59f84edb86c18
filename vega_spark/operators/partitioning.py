"""Physical layout operators (SURVEY.md §2.7).

Reference parity:
- HashPartitioner       reference src/partitioner.rs:27-58 (MetroHash
  mod n) → hash exchange (Murmur3 in Spark; only layout, never
  results, depends on the hash function).
- partition_by_key      reference src/rdd/pair_rdd.rs:157-171
- coalesce(n, false)    reference src/rdd/rdd.rs:364-418,
  coalesced_rdd.rs:113-732 — Spark's DefaultPartitionCoalescer is the
  same locality-aware bin-packing algorithm.
- repartition(n)        reference src/rdd/rdd.rs:390-417, :545-557 —
  RoundRobinPartitioning, same random-start round-robin.

Scale notes: explicit repartitioning is mostly *pre-positioning* —
hash-partition on a join/agg key once, reuse the layout across
stages (Exchange reuse), or bucket at write time so future joins
skip the shuffle entirely. AQE coalesces small post-shuffle
partitions at runtime, so over-partitioning is self-healing;
under-partitioning (giant partitions → spill) is not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repartition_by_key(df: DataFrame, num_partitions: int,
                       key_cols: Sequence[str]) -> DataFrame:
    """``partition_by_key(partitioner)``: hash exchange on the key."""
    return df.repartition(num_partitions, *[F.col(c) for c in key_cols])


def repartition(df: DataFrame, num_partitions: int) -> DataFrame:
    """Round-robin exchange (coalesce(n, shuffle=true))."""
    return df.repartition(num_partitions)


def repartition_by_range(df: DataFrame, num_partitions: int,
                         cols: Sequence[str]) -> DataFrame:
    """Range partitioning — the reference has no RangePartitioner
    (SURVEY §2.11 gap); needed for globally sorted output at scale."""
    return df.repartitionByRange(num_partitions, *[F.col(c) for c in cols])


def coalesce(df: DataFrame, num_partitions: int) -> DataFrame:
    """Narrow partition merge, no shuffle."""
    return df.coalesce(num_partitions)


def num_partitions(df: DataFrame) -> int:
    return df.rdd.getNumPartitions()


def partition_sizes(df: DataFrame) -> DataFrame:
    """Rows per partition (diagnostic — this is how tests assert
    layout like the reference's coalesce tests, tests/test_rdd.rs:365-385)."""
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy(F.col("__pid").alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows"))
    )


def write_bucketed(df: DataFrame, table_name: str, buckets: int,
                   key_cols: Sequence[str], path: str | None = None) -> None:
    """Bucketed write: pre-shuffled layout on disk so future joins /
    aggs on ``key_cols`` skip the exchange. The 100 TB answer to
    "co-located joins" (reference's partitioner-equality shuffle
    elision, co_grouped_rdd.rs:102-126, made durable)."""
    w = df.write.mode("overwrite").bucketBy(buckets, *key_cols).sortBy(*key_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def compact_small_files(spark, path: str, target_file_bytes: int = 128 * 2**20,
                        out_path: str | None = None) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files (default 128 MiB — the classic
    HDFS/object-store sweet spot). The small-files problem is the #1
    operational failure of long-running ingestion at scale: a 100 TB
    table that has degraded to millions of KB-sized files pays
    per-file open cost on every scan; this is the maintenance pass
    that restores scan throughput. Returns the output file count.

    Narrow when shrinking (coalesce — no shuffle); round-robin
    repartition (one shuffle) when the directory is already fewer
    files than the target, which rebalances skewed file sizes too."""
    import math
    import os

    total = sum(os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path) for f in fs
                if f.endswith(".parquet"))
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    cur = df.rdd.getNumPartitions()
    df = df.coalesce(n) if cur > n else df.repartition(n)
    dest = out_path or path + ".__compacted"
    df.write.mode("overwrite").parquet(dest)
    if out_path is None:
        import shutil
        shutil.rmtree(path)
        os.rename(dest, path)
        dest = path
    return len([f for f in os.listdir(dest) if f.endswith(".parquet")])
