"""Helpers for cross-engine-deterministic aggregation.

Summing doubles is order-dependent; Spark's partial/final aggregation
order differs run-to-run and engine-to-engine. Casting the row-level
double (bit-identical in Spark and DuckDB — same parquet bits, IEEE
row-local arithmetic) to a decimal and summing exactly removes the
order dependence entirely; the final cast back to double is then a
single deterministic rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-insensitive exact sum of a double expression, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """avg = exact-decimal sum / count, divided in double (deterministic)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB fragment mirroring dsum()."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB fragment mirroring davg()."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr}) AS {alias}"
    )
