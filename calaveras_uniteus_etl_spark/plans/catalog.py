"""Registry of named queries with DuckDB oracles.

A query is a function ``(spark, sf_dir) -> DataFrame`` plus (usually)
an equivalent ANSI-SQL string for the DuckDB oracle. Column names are
part of the contract: the driver sorts columns by name before value
hashing, so every computed column is aliased identically on both sides.

Cross-engine determinism rules used throughout the query modules:

- money/double sums go through exact DECIMAL arithmetic, then cast to
  DOUBLE — identical bit patterns in Spark and DuckDB regardless of
  partition/summation order;
- averages are expressed as exact-decimal SUM divided by COUNT;
- every top-k has a total-order tiebreak (unique key last);
- "now" never appears — timestamps are injected constants.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query function to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco
