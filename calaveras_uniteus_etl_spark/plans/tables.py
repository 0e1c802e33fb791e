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


def _enable_nanos_as_long(spark: SparkSession) -> None:
    """Make TIMESTAMP(NANOS) parquet readable on ANY SparkSession.

    events.parquet stores ts as INT64 TIMESTAMP(NANOS,false), which a
    vanilla Spark session rejects outright (PARQUET_TYPE_ILLEGAL).
    ``spark.sql.legacy.parquet.nanosAsLong`` is a runtime-settable SQL
    conf, so plans set it themselves instead of depending on how the
    caller built the session.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        # A Spark build that refuses the conf at runtime will surface a
        # clear PARQUET_TYPE_ILLEGAL on the read below; nothing to mask.
        pass


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}")
    if name == "events":
        _enable_nanos_as_long(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark reads only
        # as an epoch-nanos long (spark.sql.legacy.parquet.nanosAsLong).
        # Truncate to microseconds — the same truncation DuckDB applies
        # when casting TIMESTAMP_NS to TIMESTAMP.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def events_in_range(
    spark: SparkSession, sf_dir: str, start_iso: str, end_iso: str
) -> DataFrame:
    """events filtered to [start, end] with the predicate ON THE SCAN.

    ``table()`` converts the raw TIMESTAMP(NANOS) long to a timestamp
    column first, which leaves any later range predicate sitting above
    a projection — Parquet row-group statistics never see it. Here the
    bounds are converted to epoch-nanos ints and applied to the raw
    long column, so min/max skipping works (the difference between
    scanning a day and scanning 100 TB of history); the ns→µs
    conversion happens above the already-filtered scan.
    """
    import datetime as _dt

    def ns(s: str) -> int:
        t = _dt.datetime.fromisoformat(s).replace(tzinfo=_dt.timezone.utc)
        return int(t.timestamp()) * 1_000_000_000

    _enable_nanos_as_long(spark)
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    filtered = raw.filter(
        (F.col("ts") >= F.lit(ns(start_iso))) & (F.col("ts") <= F.lit(ns(end_iso)))
    )
    return filtered.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all tables and register them as temp views."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
