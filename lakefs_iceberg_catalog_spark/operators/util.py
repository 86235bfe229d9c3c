"""Shared expression helpers for oracle-deterministic results."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


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
