"""Oracle-parity helpers (SURVEY.md §2 conventions, hardened).

The driver hash-compares Spark results against DuckDB results value-by-value,
so floating-point aggregates must be *bit-identical*, not merely close.
Summing doubles is order-dependent; Spark and DuckDB will not sum 60k doubles
in the same order. The fix used throughout this engine: cast each addend to a
wide DECIMAL, sum exactly (order-independent), then cast the final value to
DOUBLE — IEEE nearest-rounding of one exact decimal is deterministic on both
engines. Per-row arithmetic (x*y, x-y, ...) is IEEE-identical everywhere and
needs no rounding at all.

Scale note: decimal aggregation stays inside whole-stage codegen and is only
modestly slower than double sums; at 100 TB you would flip `DEC_SUM` to plain
double sums if bit-parity with a second engine were not a requirement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for sums of ~1e9-magnitude values over billions of rows.
DEC = "decimal(38,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Exact order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """avg = exact-decimal sum cast to double, divided by count (deterministic)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB-side twin of dsum()."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB-side twin of davg()."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def sql_count(alias: str, expr: str = "*") -> str:
    return f"COUNT({expr}) AS {alias}"
