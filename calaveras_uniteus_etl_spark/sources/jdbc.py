"""JDBC read/write — the any-to-any DB migration surface (SURVEY A11).

The reference migrates schema+rows between sqlite/mssql/postgres/mysql
with a hand-rolled type converter (/root/reference/core/app.py:
5938-6313, core/database_schema_converter.py:16-275). On Spark the
entire concern collapses to ``spark.read.jdbc`` → ``df.write.jdbc``:
Spark's JDBC dialects own the per-vendor type mapping, and the
warehouse's declared StructTypes are the single source of truth.

Spark bundles the Derby driver (metastore dependency), so the whole
surface is integration-tested in-container against embedded Derby
(tests/test_jdbc.py); a second vendor is exercised end-to-end when a
cached public duckdb_jdbc jar is present — a DuckDB-file source read
through a partitioned JDBC scan and landed in Derby, the literal
any-to-any migration the reference performs. Pointing at Postgres/
MSSQL is a URL + driver jar swap — a deployment step, not a code
change.

Scale notes: reads partition on a numeric/temporal column
(``partitionColumn`` + bounds → one concurrent cursor per partition);
writes batch via ``batchsize``. Without a partition column a JDBC read
is a single-cursor scan — fine for dimension tables, wrong for facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from calaveras_uniteus_etl_spark.schema import TABLE_SCHEMAS


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """Parallel JDBC scan of one table (partitioned when bounds given)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    **options: str,
) -> None:
    """Batched JDBC write (the reference's `method='multi'` analog)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def migrate_warehouse_to_jdbc(
    spark: SparkSession, warehouse, url: str, tables: list[str] | None = None, **options
) -> dict[str, int]:
    """Copy warehouse tables to an external RDBMS (A11 forward path).

    The reference's 375-line converter is unnecessary: Spark's JDBC
    dialect derives the DDL from each table's StructType.
    """
    counts: dict[str, int] = {}
    for name in tables or list(TABLE_SCHEMAS):
        if not warehouse.exists(name):
            continue
        df = warehouse.read(name)
        write_jdbc_table(df, url, name, mode="overwrite", **options)
        counts[name] = df.count()
    return counts
