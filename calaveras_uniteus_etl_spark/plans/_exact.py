"""Cross-engine deterministic aggregate arithmetic.

Floating-point SUM/AVG are summation-order dependent, and Spark's
partitioned partial aggregation orders differently from DuckDB's —
naive double sums would make value-hash comparison flaky. Every money/
double aggregate therefore goes through EXACT decimal arithmetic and is
cast to DOUBLE at the end: exact in both engines → bit-identical
doubles → stable hashes, at any partition count.

The decimal precisions are chosen so products stay exact (never hit the
38-digit cap where engines start rounding differently):
``dec(12,2) * dec(6,4) -> dec(19,6)``, ``* dec(6,4) -> dec(26,10)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"  # prices (< 10^10)
RATE = "decimal(6,4)"  # discount/tax factors (0..1, 4dp)
VALUE6 = "decimal(18,6)"  # generic double measure


def dec(col: Column | str, prec: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(prec)


def exact_sum(col: Column, alias: str, scale: int = 2) -> Column:
    """Exact decimal SUM, surfaced as DOUBLE.

    The sum stays in the decimal domain (order-independent), is rounded
    to ``scale``, and only then cast to double. Surfacing DOUBLE (not
    DECIMAL) matters for the differential harness: Spark's toPandas
    yields ``Decimal`` objects while DuckDB's ``.df()`` yields float64,
    and ``str(Decimal('49612.30')) != str(49612.3)`` — trailing-zero
    cents hash-mismatch. Identical float64 bits stringify identically.

    Exactness requirement: the rounded sum's unscaled value must stay
    below 2^53 — then the int→double conversion is exact in both
    engines and the final division by 10^scale is a single correctly-
    rounded IEEE op, giving bit-identical doubles. Callers pick
    ``scale`` so magnitude × 10^scale < 9e15 (money → 2-4dp).
    """
    return F.sum(col).cast(f"decimal(38,{scale})").cast("double").alias(alias)


def exact_avg(col: Column, count_col: Column, alias: str) -> Column:
    """AVG as exact-decimal SUM cast to DOUBLE, divided by COUNT.

    Safe while the sum's unscaled value stays below 2^53 (true for
    scale ≤ 4 at these magnitudes): the decimal→double cast is then
    exact in both engines, and double division of identical operands
    is IEEE-deterministic — no rounding needed.
    """
    return (F.sum(col).cast("double") / F.count(count_col)).alias(alias)


# --- DuckDB oracle-side fragments (same shapes, same names) ---------------


def o_sum(expr: str, alias: str, prec: str = "DECIMAL(12,2)", scale: int = 2) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS {prec})) AS DECIMAL(38,{scale}))"
        f" AS DOUBLE) AS {alias}"
    )


def o_avg(expr: str, count_expr: str, alias: str, prec: str = "DECIMAL(12,2)") -> str:
    return (
        f"CAST(SUM(CAST({expr} AS {prec})) AS DOUBLE) / COUNT({count_expr}) AS {alias}"
    )
