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
    """Exact decimal SUM, surfaced as DECIMAL(38, scale).

    Kept in the decimal domain to the very end: DuckDB's decimal→double
    cast goes through int128 and loses precision once the unscaled
    value exceeds 2^53 (observed at scale 10), while Spark's BigDecimal
    cast rounds correctly — so a double output would hash-mismatch.
    Identical decimal values stringify identically; no FP involved.
    """
    return F.sum(col).cast(f"decimal(38,{scale})").alias(alias)


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
    return f"CAST(SUM(CAST({expr} AS {prec})) AS DECIMAL(38,{scale})) AS {alias}"


def o_avg(expr: str, count_expr: str, alias: str, prec: str = "DECIMAL(12,2)") -> str:
    return (
        f"CAST(SUM(CAST({expr} AS {prec})) AS DOUBLE) / COUNT({count_expr}) AS {alias}"
    )
