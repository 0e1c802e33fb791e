"""Synthetic-table loading (TESTDATA.md star schema).

One ``spark.read.parquet`` per table; temp views registered so queries
can mix DataFrame API and Spark SQL. Reads are plain declarative scans
— Catalyst handles column pruning and predicate pushdown into the
parquet reader, which is what makes the same plans viable at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# factor (region/nation are fixed-size; supplier/part/customer grow
# slowly). Fact tables (orders/lineitem/events) are never broadcast.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark reads only
        # as an epoch-nanos long (spark.sql.legacy.parquet.nanosAsLong).
        # Truncate to microseconds — the same truncation DuckDB applies
        # when casting TIMESTAMP_NS to TIMESTAMP.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all tables and register them as temp views."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
