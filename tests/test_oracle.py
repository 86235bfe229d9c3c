"""Replay of the driver's correctness gate: every registered query with an
oracle runs on Spark AND DuckDB at SF_DIR; results must match exactly
(order-insensitive, column-name-sorted — see conftest.assert_frames_match).

Queries without an oracle (approx/LSH/stateful) get a rows-run smoke check
here; their semantic assertions live in their dedicated test modules.
"""

from __future__ import annotations

import pytest

from lakefs_iceberg_catalog_spark import registry

from .conftest import SF_DIR, assert_driver_canonicalizable, assert_frames_match

registry.load_all()

ORACLE_KEYS = sorted(k for k in registry.QUERIES if k in registry.ORACLES)
ROWS_ONLY_KEYS = sorted(k for k in registry.QUERIES if k not in registry.ORACLES)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(spark, duck, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    assert_driver_canonicalizable(df.schema, name)
    spark_pdf = df.toPandas()
    duck_pdf = duck.sql(registry.ORACLES[name]).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_runs(spark, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    assert_driver_canonicalizable(df.schema, name)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    out = e.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
    assert "revenue" in out.columns


def test_registry_contract():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 10


def test_readme_inventory_counts_match_registry():
    """README's operator-inventory heading must state the REAL registry
    counts — doc drift here misreports coverage to every reader."""
    import os
    import re

    readme = open(
        os.path.join(os.path.dirname(__file__), "..", "README.md")
    ).read()
    m = re.search(r"\((\d+) keys, (\d+) DuckDB-oracle-checked\)", readme)
    assert m, "README inventory heading missing its (N keys, M ...) counts"
    assert int(m.group(1)) == len(registry.QUERIES), (
        f"README says {m.group(1)} keys, registry has {len(registry.QUERIES)}"
    )
    assert int(m.group(2)) == len(registry.ORACLES), (
        f"README says {m.group(2)} oracle-checked, registry has {len(registry.ORACLES)}"
    )


def test_every_key_explicitly_sweep_prioritized():
    """Every registered key must appear in _SWEEP_PRIORITY: a key left to
    implicit registration order could silently displace the driver's
    50-slot sweep window when module import order shifts."""
    from lakefs_iceberg_catalog_spark.registry import _SWEEP_PRIORITY

    listed = set(_SWEEP_PRIORITY)
    missing = [k for k in registry.QUERIES if k not in listed]
    assert not missing, f"keys not in _SWEEP_PRIORITY: {missing}"
    stale = [k for k in listed if k not in registry.QUERIES]
    assert not stale, f"_SWEEP_PRIORITY names unknown keys: {stale}"
