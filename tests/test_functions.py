"""Unit tests for the custom datetime/hash expressions.

SURVEY.md §7.3 flags SQLite ``%Y-W%W`` week bucketing as the single
most likely cross-engine hash-mismatch source — so it gets a dense
year-boundary sweep against DuckDB's C-library ``strftime`` (same
semantics family as SQLite's). julian-day diffs and PHI hashing get
golden checks against independently computed values.
"""

from __future__ import annotations

import datetime as dt
import hashlib

import duckdb
import pytest

from pyspark.sql import functions as F

from calaveras_uniteus_etl_spark.functions.datetime_ext import (
    julian_day_diff,
    sqlite_week,
)
from calaveras_uniteus_etl_spark.functions.hashing import (
    duckdb_md5_long_sql,
    md5_long,
    salted_sha256,
)


def _boundary_dates() -> list[dt.date]:
    """Every day around each year boundary 1996→2026 (covers Jan-1
    falling on every weekday across three decades, all leap years
    including the century year 2000, and week 52/53 cases), plus
    mid-year spot checks."""
    days = []
    for year in range(1996, 2027):
        for delta in range(-10, 11):
            days.append(dt.date(year, 1, 1) + dt.timedelta(days=delta))
    for year in (2000, 2004, 2020, 2023, 2024):
        days.extend([dt.date(year, 6, 15), dt.date(year, 12, 31)])
    return sorted(set(days))


def test_sqlite_week_matches_c_strftime(spark):
    dates = _boundary_dates()
    df = spark.createDataFrame(
        [(d.isoformat() + " 12:00:00",) for d in dates], "ts_str string"
    ).withColumn("ts", F.col("ts_str").cast("timestamp"))
    got = {
        r["ts_str"][:10]: r["wk"]
        for r in df.select("ts_str", sqlite_week("ts").alias("wk")).collect()
    }
    con = duckdb.connect()
    for d in dates:
        expect = con.execute(
            "SELECT strftime(TIMESTAMP '" + d.isoformat() + " 12:00:00', '%Y-W%W')"
        ).fetchone()[0]
        assert got[d.isoformat()] == expect, d


def test_julian_day_diff_fractional(spark):
    df = spark.createDataFrame(
        [("2024-01-02 06:00:00", "2024-01-01 00:00:00"),
         ("2024-01-01 00:00:00.500000", "2024-01-01 00:00:00")],
        "a string, b string",
    ).select(
        julian_day_diff(F.col("a").cast("timestamp"), F.col("b").cast("timestamp"))
        .alias("d")
    )
    vals = [r["d"] for r in df.collect()]
    assert vals[0] == pytest.approx(1.25, abs=0)
    assert vals[1] == pytest.approx(0.5 / 86400, rel=1e-12)


def test_salted_sha256_matches_reference_semantics(spark):
    """sha256(salt || value || salt), with NULL/''/'nan' passthrough
    (reference core/etl_service.py:720-739, core/config.py:225-243)."""
    salt = "s3cr3t"
    df = spark.createDataFrame(
        [("john",), ("",), (None,), ("NaN",)], "v string"
    ).select("v", salted_sha256("v", salt).alias("h"))
    rows = {r["v"]: r["h"] for r in df.collect()}
    assert rows["john"] == hashlib.sha256(f"{salt}john{salt}".encode()).hexdigest()
    assert rows[""] == ""
    assert rows[None] is None
    assert rows["NaN"] == "NaN"  # literal nan passes through unhashed


def test_md5_long_cross_engine(spark):
    vals = ["", "a", "hello world", "ünïcode"]
    df = spark.createDataFrame([(v,) for v in vals], "v string").select(
        "v", md5_long("v").alias("h")
    )
    got = {r["v"]: r["h"] for r in df.collect()}
    con = duckdb.connect()
    for v in vals:
        expect = con.execute(
            f"SELECT {duckdb_md5_long_sql('?')}", [v]
        ).fetchone()[0]
        assert got[v] == expect, v
        assert got[v] == int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
