"""Sequential exponential smoothing over a BOUNDED grain.

Holt's linear-trend recursion (level/trend double exponential
smoothing) is inherently sequential — ``l_t`` depends on ``l_{t-1}`` —
so it cannot be a window function or an associative fold. The scale
contract that keeps it 100 TB-safe is the same one the grain-bounded
window allowlist (tests/test_plan_lint.py) enforces elsewhere: the
DISTRIBUTED part of the plan is the aggregation of the fact table down
to a calendar grain (days, months — cardinality set by the date
domain, not the data volume), and only that bounded relation enters
the sequential scan, as ONE Arrow batch through ``applyInPandas``.
``holt_linear`` refuses grains above ``max_rows`` so a mis-grained
caller fails loudly instead of funnelling a fact table through one
task.

Smoothing parameters default to ``alpha = beta = 0.5``: exact binary
fractions, so every recursion step is an IEEE-exact halving plus
additions whose expression tree is written IDENTICALLY here and in the
DuckDB recursive-CTE oracle (plans/queries_aggregates.py f95) —
bit-identical doubles cross-engine, no tolerance needed.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Output contract: the input grain row + the smoothing state.
_OUT_SUFFIX = "level double, trend double, fitted double"

# Sequential-scan ceiling: generous for any calendar grain (8000 days
# ≈ 22 years) yet far below fact-table cardinality at any SF.
MAX_GRAIN_ROWS = 8192


def _holt_scan(
    rows: Iterable[tuple[str, float]], alpha: float, beta: float
) -> list[tuple[float, float, float]]:
    """The recursion itself, shared by the UDF and unit tests.

    fitted_t = l_{t-1} + b_{t-1} (the one-step-ahead forecast); the
    anchor row has no prior state, so fitted_1 = y_1 by definition —
    both engines define it that way, so no NULL/NaN crosses Arrow.
    """
    out: list[tuple[float, float, float]] = []
    level = trend = 0.0
    for i, (_, y) in enumerate(rows):
        y = float(y)
        if i == 0:
            level, trend, fitted = y, 0.0, y
        else:
            fitted = level + trend
            new_level = alpha * y + (1.0 - alpha) * (level + trend)
            trend = beta * (new_level - level) + (1.0 - beta) * trend
            level = new_level
        out.append((level, trend, fitted))
    return out


def holt_linear(
    grain: DataFrame,
    time_col: str,
    value_col: str,
    *,
    alpha: float = 0.5,
    beta: float = 0.5,
    max_rows: int = MAX_GRAIN_ROWS,
) -> DataFrame:
    """Holt linear-trend smoothing of a pre-aggregated bounded grain.

    ``grain`` must already be one row per ``time_col`` value (the
    caller's distributed aggregation did the heavy lifting); this adds
    ``level``, ``trend`` and ``fitted`` columns via one sequential
    Arrow batch. Raises inside the task if the grain exceeds
    ``max_rows`` — the guard that keeps "bounded" honest.
    """
    in_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in grain.schema.fields
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns=["__g"])
        if len(pdf) > max_rows:
            raise ValueError(
                f"holt_linear: grain has {len(pdf)} rows > max_rows="
                f"{max_rows}; aggregate to a bounded grain first"
            )
        pdf = pdf.sort_values(time_col).reset_index(drop=True)
        state = _holt_scan(
            zip(pdf[time_col], pdf[value_col]), alpha, beta
        )
        pdf["level"] = [s[0] for s in state]
        pdf["trend"] = [s[1] for s in state]
        pdf["fitted"] = [s[2] for s in state]
        return pdf

    return (
        grain.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(
            lambda _, pdf: fit(pdf),
            schema=f"{in_schema}, {_OUT_SUFFIX}",
        )
    )
