"""SELECT-only ad-hoc SQL execution with auto-LIMIT.

Re-expresses the reference's ad-hoc query endpoint (/root/reference/
core/app.py:2248-2280): uppercase-prefix SELECT guard, automatic LIMIT
injection, and a timed result envelope. Spark SQL replaces SQLite as
the executor; the guard semantics are preserved.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_LIMIT_RE = re.compile(r"\bLIMIT\s+\d+", re.IGNORECASE)


class QueryNotAllowedError(ValueError):
    """Raised for non-SELECT statements."""


def run_select_only(spark: SparkSession, sql: str, limit: int = 1000) -> DataFrame:
    """Execute ``sql`` if (and only if) it is a single SELECT.

    A ``LIMIT`` is appended when absent, mirroring the reference's
    auto-cap. The limit rides on top of whatever the query declares.
    """
    stripped = sql.strip().rstrip(";")
    if not stripped.upper().startswith("SELECT"):
        raise QueryNotAllowedError("only SELECT statements are allowed")
    if ";" in stripped:
        raise QueryNotAllowedError("multiple statements are not allowed")
    if not _LIMIT_RE.search(stripped):
        stripped = f"{stripped} LIMIT {int(limit)}"
    return spark.sql(stripped)


@dataclass
class QueryResult:
    """Timed result envelope (reference QueryResult, core/database.py:37-63)."""

    columns: list[str]
    records: list[dict]
    row_count: int
    execution_time_ms: float
    query: str = field(default="", repr=False)


def execute_query(spark: SparkSession, sql: str, limit: int = 1000) -> QueryResult:
    """Run the gated query and collect a bounded, timed result."""
    t0 = time.perf_counter()
    df = run_select_only(spark, sql, limit=limit)
    rows = df.limit(limit).collect()
    elapsed_ms = (time.perf_counter() - t0) * 1000.0
    return QueryResult(
        columns=list(df.columns),
        records=[r.asDict(recursive=True) for r in rows],
        row_count=len(rows),
        execution_time_ms=elapsed_ms,
        query=sql,
    )
