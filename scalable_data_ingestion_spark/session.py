"""SparkSession factory.

Single place that owns Spark configuration so every entry point (tests,
bench, driver harness, CLI) gets the same tuned session.

Scale notes (100 TB / 1000-executor posture):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting,
  broadcast-join demotion/promotion based on observed sizes.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE
  coalesces. Locally we match core count; on a real cluster this would
  be ~2-3x total cores and AQE handles the rest.
- UTC session timezone so timestamp semantics are stable and match the
  DuckDB oracle.
- Arrow enabled for any toPandas / pandas-UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "scalable_data_ingestion_spark") -> SparkSession:
    """Build (or fetch) the tuned SparkSession."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # No carriage-return progress bars on stdout: the bench harness
        # prints one machine-parsed JSON line and progress noise breaks
        # tail-based parsers (BENCH_r03 regression).
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # testdata events.parquet stores TIMESTAMP(NANOS); read as long
        # (catalog.table converts to TimestampType).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
