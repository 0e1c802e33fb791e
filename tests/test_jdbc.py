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
