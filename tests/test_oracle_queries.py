"""Differential test: every registered query with an oracle must match
DuckDB on row count, column names, and order-insensitive value hash —
a local replica of the driver's correctness gate (sf0.001 for speed;
the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from calaveras_uniteus_etl_spark.plans import REGISTRY
from tests.oracle_harness import compare

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    result = compare(spark, sf_dir, name)
    assert result["cols_match"], (
        f"{name} columns differ: spark={result['spark_cols']} "
        f"oracle={result['oracle_cols']}"
    )
    assert result["rows_match"], (
        f"{name} row counts differ: spark={result['spark_rows']} "
        f"oracle={result['oracle_rows']}"
    )
    assert result["values_match"], f"{name} values differ: {result['first_diffs']}"


def test_registry_nonempty():
    assert len(REGISTRY) >= 25


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(e.queries()) == len(REGISTRY)
    assert set(e.oracle_sql()) <= set(e.queries())
