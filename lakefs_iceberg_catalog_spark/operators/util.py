"""Shared expression helpers for oracle-deterministic results."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Ceiling for any driver-side result materialization. The collect-and-
# recreate pattern exists ONLY so fixture-scale results survive temp-dir
# cleanup (versioned-catalog scenarios, source round-trips, streaming
# sinks); it must never silently become a way to funnel an unbounded
# distributed result through the driver. Fixture results are 6-20k rows;
# anything above this ceiling is a misuse, not a bigger fixture.
MATERIALIZE_ROW_CEILING = 100_000


class MaterializeCeilingError(RuntimeError):
    """A driver-side materialization exceeded MATERIALIZE_ROW_CEILING."""


def bounded_rows(df: DataFrame, ceiling: int = MATERIALIZE_ROW_CEILING) -> list:
    """Collect at most ``ceiling`` rows; raise if the result is larger.
    The probe collects ceiling+1 rows (never the full oversized result), so
    the driver's exposure is bounded even in the failure path."""
    rows = df.limit(ceiling + 1).collect()
    if len(rows) > ceiling:
        raise MaterializeCeilingError(
            f"driver-side materialization exceeds {ceiling} rows; "
            "this pattern is for bounded fixture results only — write the "
            "result to storage and read it back instead"
        )
    return rows


def materialize_bounded(
    spark: SparkSession, df: DataFrame, ceiling: int = MATERIALIZE_ROW_CEILING
) -> DataFrame:
    """Driver-side collect-and-recreate with an explicit row ceiling."""
    return spark.createDataFrame(bounded_rows(df, ceiling), df.schema)


def dround(col: Column | str, scale: int = 2) -> Column:
    """Round a double exactly the way DuckDB rounds DOUBLE: scale by 10^s,
    C-style round-half-away-from-zero **in double arithmetic**, scale back.

    Spark's built-in ``round`` converts the exact binary double to BigDecimal
    and applies HALF_UP on its full decimal expansion — at half-way boundaries
    (x.xx5) the two disagree (e.g. 51546.284999999996*100 lands on
    5154628.5000...01 in binary, so DuckDB rounds up while BigDecimal sees
    ...2849... and rounds down).  All oracle-compared doubles go through this
    helper so Spark and DuckDB round identically by construction.
    """
    c = F.col(col) if isinstance(col, str) else col
    f = F.lit(float(10 ** scale))
    x = c * f
    return (F.when(x >= 0, F.floor(x + F.lit(0.5))).otherwise(-F.floor(-x + F.lit(0.5)))) / f
