"""Numerically *reproducible* aggregates for oracle-checked queries.

Problem: ``SUM(double)`` depends on summation order, which differs between
Spark's partial/final aggregation tree and any other engine (and between two
Spark runs with different partitioning).  For value-hash comparison against a
DuckDB oracle we need bit-identical results.

Fix: round each row's value to a fixed decimal scale *before* summing by
casting to DECIMAL — decimal addition is exact and associative, so the sum is
order-independent and matches any engine doing the same per-row conversion.
The final cast back to double is exact for the magnitudes involved.

This also reflects good 100 TB practice: money-like measures belong in
DECIMAL, where re-partitioning can never change the answer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scale 4 keeps cents-level data exact; precision 25 >> any sf we run.
_DEC = "decimal(25,4)"


def dsum(expr: Column) -> Column:
    """Order-independent sum of a double expression (per-row rounded to 4
    decimal places).  Oracle-side equivalent:
    ``CAST(SUM(CAST(x AS DECIMAL(25,4))) AS DOUBLE)``."""
    return F.sum(expr.cast(_DEC)).cast("double")


def davg(expr: Column) -> Column:
    """Order-independent mean: exact decimal sum / count, in double.
    Oracle-side equivalent:
    ``CAST(SUM(CAST(x AS DECIMAL(25,4))) AS DOUBLE) / COUNT(x)``."""
    return F.sum(expr.cast(_DEC)).cast("double") / F.count(expr)
