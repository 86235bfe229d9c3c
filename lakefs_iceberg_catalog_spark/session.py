"""SparkSession construction + per-query session prep.

Local-mode testing config; the knobs that matter at cluster scale (AQE,
shuffle partitions, broadcast threshold) are the same names a 1000-executor
deployment would tune — nothing here is local-only logic.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "lakefs_iceberg_catalog_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def prep(spark: SparkSession) -> SparkSession:
    """Runtime-settable conf applied defensively inside every query fn.

    The driver owns the SparkSession passed to ``queries()`` callables; pin the
    runtime-mutable settings correctness depends on (UTC session timezone so
    parquet timestamps compare equal to DuckDB's naive UTC timestamps).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark
