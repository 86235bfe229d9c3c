"""Property test for the correctness keystone: `dround` must round doubles
bit-for-bit the way DuckDB's round(DOUBLE, n) does, across the float space —
including the half-way boundaries where Spark's BigDecimal HALF_UP disagrees
with C-style round(x*10^n)/10^n."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def py_dround(x: float, scale: int) -> float:
    """Reference implementation of the Spark expression in operators/util.py
    (floor(x*f + 0.5)/f with sign handling), evaluated in float64."""
    import math

    f = float(10**scale)
    v = x * f
    out = math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)
    return out / f


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@settings(max_examples=500, deadline=None)
@given(
    x=st.floats(
        min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
    ),
    scale=st.integers(min_value=0, max_value=6),
)
def test_dround_matches_duckdb(duck, x, scale):
    got = py_dround(x, scale)
    want = duck.execute(
        "SELECT round(CAST(? AS DOUBLE), ?)", [x, scale]
    ).fetchone()[0]
    assert got == want or (got != got and want != want), (x, scale, got, want)


@settings(max_examples=200, deadline=None)
@given(cents=st.integers(min_value=-10_000_000, max_value=10_000_000))
def test_dround_half_cent_boundaries(duck, cents):
    """Adversarial: values sitting exactly on x.xx5 decimal boundaries."""
    x = cents / 1000.0 + 0.005
    got = py_dround(x, 2)
    want = duck.execute("SELECT round(CAST(? AS DOUBLE), 2)", [x]).fetchone()[0]
    assert got == want, (x, got, want)


def test_spark_expression_agrees_with_python_model(spark):
    """The JVM expression (floor-based dround) equals the python model on a
    boundary-heavy sample — ties the property test to the actual operator
    expression."""
    from pyspark.sql import functions as F

    from lakefs_iceberg_catalog_spark.operators.util import dround

    xs = [i / 1000.0 + 0.005 for i in range(-5000, 5000, 37)] + [
        51546.284999999996, 28694.684999999998, 2.675, -2.675, 0.125,
    ]
    df = spark.createDataFrame([(x,) for x in xs], "x double").select(
        "x", dround("x", 2).alias("r")
    )
    for row in df.collect():
        assert row.r == py_dround(row.x, 2), row
