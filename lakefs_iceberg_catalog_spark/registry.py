"""Central operator registry.

Each operator module registers ``name -> fn(spark, sf_dir) -> DataFrame`` plus
(optionally) an equivalent ANSI-SQL string runnable by DuckDB on the same
parquet tables.  ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin
wrappers over these dicts, and the pytest suite replays the driver's
Spark-vs-DuckDB comparison for every registered pair.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_OPERATOR_MODULES = [
    "lakefs_iceberg_catalog_spark.operators.relational",
    "lakefs_iceberg_catalog_spark.operators.joins",
    "lakefs_iceberg_catalog_spark.operators.windows",
    "lakefs_iceberg_catalog_spark.operators.scalars",
    "lakefs_iceberg_catalog_spark.operators.advanced",
    "lakefs_iceberg_catalog_spark.operators.sources",
    "lakefs_iceberg_catalog_spark.operators.dedup",
    "lakefs_iceberg_catalog_spark.operators.similarity",
    "lakefs_iceberg_catalog_spark.operators.text",
    "lakefs_iceberg_catalog_spark.operators.multimodal",
    "lakefs_iceberg_catalog_spark.operators.pipeline",
    "lakefs_iceberg_catalog_spark.operators.versioned",
    "lakefs_iceberg_catalog_spark.operators.versioned_dml",
    "lakefs_iceberg_catalog_spark.streaming.batch_equiv",
]


def register(name: str, oracle: str | None = None):
    """Decorator: register a query callable (and its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate operator key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module (idempotent) so the registry is full."""
    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Modules land incrementally across build rounds; missing ones are
            # simply not yet implemented.
            if e.name and not e.name.startswith("lakefs_iceberg_catalog_spark"):
                raise
