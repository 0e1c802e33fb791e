"""JDBC migration surface (SURVEY A11) against embedded Derby.

Spark bundles the Derby driver (for the Hive metastore), which makes a
real RDBMS round-trip testable in-container: write → partitioned
parallel read → values identical. This is the same code path a
production deployment points at Postgres/MSSQL by swapping the URL and
driver — exactly the reference's multi-RDBMS migration concern
(core/app.py:5938-6313), minus its 375-line type converter.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from calaveras_uniteus_etl_spark.sources.jdbc import (
    migrate_warehouse_to_jdbc,
    read_jdbc_table,
    write_jdbc_table,
)
from calaveras_uniteus_etl_spark.warehouse import Warehouse

DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture()
def derby_url(tmp_path) -> str:
    return f"jdbc:derby:{os.path.join(str(tmp_path), 'derbydb')};create=true"


def test_jdbc_round_trip_partitioned(spark, derby_url):
    df = spark.range(0, 200).select(
        F.col("id"),
        (F.col("id") * 1.5).cast("double").alias("v"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
    )
    write_jdbc_table(df, derby_url, "t1", mode="overwrite", driver=DRIVER)
    back = read_jdbc_table(
        spark,
        derby_url,
        "t1",
        partition_column="id",
        lower_bound=0,
        upper_bound=200,
        num_partitions=4,
        driver=DRIVER,
    )
    # the read must actually be partitioned (one cursor per split)
    assert back.rdd.getNumPartitions() == 4
    got = {(r.id, r.v, r.name) for r in back.collect()}
    want = {(i, i * 1.5, f"n{i}") for i in range(200)}
    assert got == want


def test_jdbc_filter_and_column_pushdown(spark, derby_url):
    """The migration path must be auditable for scale, not just values:
    a predicate on the partition column has to reach the JDBC source as
    a pushed filter (issued inside the per-partition WHERE clauses, so
    the RDBMS prunes rows server-side) and an unused column must not be
    fetched at all (column pruning in the issued SELECT)."""
    df = spark.range(0, 200).select(
        F.col("id"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("pad"), F.col("id")).alias("payload"),
    )
    write_jdbc_table(df, derby_url, "t_push", mode="overwrite", driver=DRIVER)
    back = read_jdbc_table(
        spark,
        derby_url,
        "t_push",
        partition_column="id",
        lower_bound=0,
        upper_bound=200,
        num_partitions=4,
        driver=DRIVER,
    )
    q = back.filter(F.col("id") >= 150).select("id", "v")
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = next(
        line for line in plan.splitlines() if "JDBCRelation" in line
    )
    # predicate pushed into the source scan, not evaluated Spark-side
    assert "GreaterThanOrEqual" in scan, scan
    # column pruning: the issued SELECT must not carry the payload col
    assert "payload" not in scan.lower(), scan
    # and the pushed-down semantics are value-correct
    assert sorted((r.id, r.v) for r in q.collect()) == [
        (i, 2 * i) for i in range(150, 200)
    ]


def test_jdbc_append_vs_overwrite(spark, derby_url):
    df = spark.range(0, 10).withColumnRenamed("id", "k")
    write_jdbc_table(df, derby_url, "t2", mode="overwrite", driver=DRIVER)
    write_jdbc_table(df, derby_url, "t2", mode="append", driver=DRIVER)
    n = read_jdbc_table(spark, derby_url, "t2", driver=DRIVER).count()
    assert n == 20
    write_jdbc_table(df, derby_url, "t2", mode="overwrite", driver=DRIVER)
    assert read_jdbc_table(spark, derby_url, "t2", driver=DRIVER).count() == 10


def test_migrate_warehouse_to_jdbc(spark, tmp_path, derby_url):
    wh = Warehouse(spark, os.path.join(str(tmp_path), "wh"))
    people = spark.createDataFrame(
        [("p1", "alice", 30.0), ("p2", "bob", 40.0)],
        ["person_id", "name", "income"],
    )
    wh.write("people", people)
    counts = migrate_warehouse_to_jdbc(
        spark, wh, derby_url, tables=["people"], driver=DRIVER
    )
    assert counts == {"people": 2}
    back = read_jdbc_table(spark, derby_url, "people", driver=DRIVER)
    assert {r.person_id for r in back.collect()} == {"p1", "p2"}


def _find_duckdb_jdbc_jar() -> str | None:
    """Locate a duckdb_jdbc jar in the local coursier/ivy caches.

    The jar is the public org.duckdb:duckdb_jdbc Maven artifact; we
    only use it if a build tool already cached it locally (no network).
    """
    import glob

    for root in ("~/.cache/coursier", "~/.ivy2", "~/.m2"):
        hits = glob.glob(
            os.path.expanduser(os.path.join(root, "**", "duckdb_jdbc-*.jar")),
            recursive=True,
        )
        if hits:
            return sorted(hits)[-1]
    return None


_DUCKDB_JAR = _find_duckdb_jdbc_jar()


@pytest.mark.skipif(_DUCKDB_JAR is None, reason="no duckdb_jdbc jar cached locally")
def test_jdbc_cross_vendor_migration(tmp_path):
    """A11's actual claim is any-to-any VENDOR migration. This runs the
    real shape: a DuckDB database (written by the native engine) is
    read through Spark's JDBC source — partitioned, one cursor per
    split — and landed in embedded Derby via the same write_jdbc_table
    used everywhere, then read back and value-compared. Runs in a
    subprocess because spark.jars only applies at JVM launch (the
    suite's shared session can't load the DuckDB driver).

    Note: DuckDB is source-only here. Its JDBC driver opens a separate
    database instance per connection, so Spark's create-on-one-
    connection / insert-on-another write protocol can't target it —
    a driver limitation, not a write_jdbc_table one (the write path is
    proven against Derby above).
    """
    import subprocess
    import sys as _sys
    import textwrap

    import duckdb

    src_db = os.path.join(str(tmp_path), "src.duckdb")
    con = duckdb.connect(src_db)
    con.execute(
        "CREATE TABLE people AS "
        "SELECT i AS id, i * 2.5 AS income, 'p' || i AS name "
        "FROM range(100) t(i)"
    )
    con.close()

    derby = os.path.join(str(tmp_path), "derby_dst")
    prog = textwrap.dedent(
        f"""
        from pyspark.sql import SparkSession
        from calaveras_uniteus_etl_spark.sources.jdbc import (
            read_jdbc_table, write_jdbc_table)
        spark = (SparkSession.builder.master("local[2]")
                 .config("spark.jars", {_DUCKDB_JAR!r})
                 .config("spark.ui.enabled", "false")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        src = read_jdbc_table(
            spark, "jdbc:duckdb:{src_db}", "people",
            partition_column="id", lower_bound=0, upper_bound=100,
            num_partitions=4, driver="org.duckdb.DuckDBDriver")
        assert src.rdd.getNumPartitions() == 4  # parallel cursors
        dst_url = "jdbc:derby:{derby};create=true"
        write_jdbc_table(src, dst_url, "people", mode="overwrite",
                         driver={DRIVER!r})
        back = read_jdbc_table(spark, dst_url, "people", driver={DRIVER!r})
        got = {{(r.id, r.income, r.name) for r in back.collect()}}
        assert got == {{(i, i * 2.5, f"p{{i}}") for i in range(100)}}, got
        spark.stop()
        print("MIGRATION_OK")
        """
    )
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    res = subprocess.run(
        [_sys.executable, "-c", prog], capture_output=True, text=True,
        env=env, timeout=300,
    )
    assert "MIGRATION_OK" in res.stdout, res.stderr[-3000:]
