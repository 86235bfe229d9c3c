"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``lakefs_iceberg_catalog_spark``; this module is a
thin adapter over its operator registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lakefs_iceberg_catalog_spark import registry, shipping
from lakefs_iceberg_catalog_spark.operators import relational

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q3-shaped: scan + filter + broadcast/shuffle joins + hash agg +
    top-k (SURVEY.md §7 Phase 0).
    """
    shipping.ensure_workers_can_import(spark)
    return relational.flagship_top_unshipped(spark, SMOKE_SF_DIR)


def _shipped(fn: Callable[[SparkSession, str], DataFrame]):
    """Wrap an operator so (a) the package source reaches the Python workers
    before any cloudpickled executor function needs to import it — the
    driver calls from an arbitrary cwd where only ITS sys.path knows us —
    and (b) the PREVIOUS query's query-scoped caches are released first
    (operators/util.py:scoped_persist), so the driver's 50-key sweep holds
    at most one query's cached partitions at any time."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from lakefs_iceberg_catalog_spark.operators.util import release_scoped

        release_scoped()
        shipping.ensure_workers_can_import(spark)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry.load_all()
    return {name: _shipped(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every oracle-checkable query; keys absent
    here (approx sketches, LSH candidates, stateful streaming) get the
    driver's weaker rows-only check."""
    registry.load_all()
    return dict(registry.ORACLES)
