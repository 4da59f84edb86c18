"""SparkSession bootstrap.

Reference parity: ``Context::new / with_mode`` (reference
src/context.rs:147-164, :209-303) — driver bootstrap for local or
distributed execution. In this engine the cluster manager, scheduler,
shuffle service and cache are Spark's own; this module only pins the
configuration that matters for correctness (UTC session time zone,
nanosecond-parquet handling) and for scale (AQE, Arrow, sensible
shuffle parallelism).

Scale notes (100 TB design intent):
- AQE on: runtime partition coalescing + skew-join splitting replace
  any hand-tuned partition counts at large SF.
- ``spark.sql.shuffle.partitions`` is only the *initial* value; AQE
  re-plans. On a real cluster set it ~2-3x total cores.
- Arrow enabled for any pandas-UDF path (the sanctioned slow path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "vega_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a local SparkSession with engine defaults.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract) or '*'.
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # events.parquet stores timestamp[ns]; Spark 4 rejects NANOS
        # unless read as raw int64 (we do wall-clock integer math on it)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable engine confs to an externally
    provided session (the driver passes its own session to
    ``__spark_entry__.entry``/``queries``)."""
    for k, v in {
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # static conf in this session — accept as-is
            pass
    return spark
