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


# Fixed-point int64 sums: ~4× faster than decimal aggregation (decimal
# accumulators leave the compact-long representation and pay per-row object
# arithmetic — measured 1.85 s vs 0.4 s on the 600k-row flagship agg).
# round(x·10^6) is the identical IEEE double op on both engines, int64 sums
# are exact, and the final /10^6 (+ optional /count) are deterministic
# single roundings. Overflow bound: |x|·10^6·rows < 2^63 — holds through
# sf≈100 for this corpus; beyond that, or for unbounded magnitudes, use
# dsum (decimal) instead. 10^6 matches DEC's scale of 6.
_ISCALE = 1_000_000


def isum(col: Column | str, alias: str) -> Column:
    """Exact order-independent sum via fixed-point int64, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(F.round(c * _ISCALE).cast("long")).cast("double")
        / F.lit(float(_ISCALE))
    ).alias(alias)


def iavg(col: Column | str, alias: str) -> Column:
    """avg from the fixed-point sum: /10^6 then /count (deterministic)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(F.round(c * _ISCALE).cast("long")).cast("double")
        / F.lit(float(_ISCALE))
        / F.count(c)
    ).alias(alias)


def fround(col: Column, digits: int, alias: str) -> Column:
    """Fast deterministic rounding for NON-NEGATIVE doubles:
    floor(x·10^d + 0.5)/10^d — pure double arithmetic, identical IEEE ops
    on both engines, ~3× cheaper than round() (Spark's round routes every
    value through BigDecimal — measured 0.87 s vs 0.28 s per 4 columns ×
    600k rows). Matches round-half-up; for negatives it would round toward
    +∞ where round() rounds away from zero — callers must guarantee x ≥ 0
    (use F.round + ROUND otherwise)."""
    p = float(10**digits)
    return (F.floor(col * p + F.lit(0.5)) / p).alias(alias)


def sql_fround(expr: str, digits: int, alias: str) -> str:
    """DuckDB-side twin of fround()."""
    p = f"{10**digits}.0"
    return f"floor(({expr}) * {p} + 0.5) / {p} AS {alias}"


def sql_isum(expr: str, alias: str) -> str:
    """DuckDB-side twin of isum()."""
    return (
        f"CAST(SUM(CAST(round(({expr}) * {_ISCALE}) AS BIGINT)) AS DOUBLE)"
        f" / {_ISCALE}.0 AS {alias}"
    )


def sql_iavg(expr: str, alias: str) -> str:
    """DuckDB-side twin of iavg()."""
    return (
        f"CAST(SUM(CAST(round(({expr}) * {_ISCALE}) AS BIGINT)) AS DOUBLE)"
        f" / {_ISCALE}.0 / COUNT({expr}) AS {alias}"
    )
