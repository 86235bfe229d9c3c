"""Testdata table access.

Mirrors the reference's scan entry point (`spark.read.table(...)` over an
Iceberg catalog — SURVEY.md §3.1); here the catalog dimension is a path
prefix, so `scan_table` is `spark.read.parquet` + temp-view registration.
Column pruning + predicate pushdown come for free from the parquet V2 source
(verified via .explain in tests/bench).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import prep

TABLES = [
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
]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}")
    prep(spark)  # pin UTC etc. even when the caller owns the session (driver)
    if name == "events":
        # events.ts encoding varies by testdata generation: TIMESTAMP(NANOS)
        # (Spark's vectorized reader rejects it → read as raw int64 nanos and
        # truncate to micros, the identical truncation DuckDB applies) or
        # TIMESTAMP(MICROS) without UTC adjustment (Spark 4 infers
        # TIMESTAMP_NTZ, which watermarks/windows reject). Normalize both to
        # TIMESTAMP; the session timezone is pinned UTC by prep(), so the
        # NTZ→TZ cast is value-identical.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dt == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def views(spark: SparkSession, sf_dir: str, *names: str) -> SparkSession:
    """Register the named tables (default: all) as temp views and return spark.

    Temp views are session-scoped metadata only — each query re-resolves the
    parquet footer, the same "no stale caches" policy the reference pins with
    ``cache-enabled=false`` (tests/conftest.py:65).
    """
    prep(spark)
    for name in names or TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark
