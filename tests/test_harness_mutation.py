"""Mutation tests of the differential gate itself.

A correctness gate that cannot fail is indistinguishable from no gate:
these tests plant deliberately WRONG oracle pairings in a scratch
registry entry and assert ``tests/oracle_harness.compare`` flags each
defect class — value drift, row-count drift, column-name drift, and
dtype drift — through the exact canonicalization path the driver uses.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from calaveras_uniteus_etl_spark.plans.catalog import REGISTRY, QuerySpec
from tests.oracle_harness import compare

SF = "/root/testdata/sf0.001"


@pytest.fixture
def scratch_spec():
    """Temporarily install a registry entry; always clean up."""
    installed = []

    def install(name, fn, oracle):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle)
        installed.append(name)
        return name

    yield install
    for name in installed:
        REGISTRY.pop(name, None)


def _nations(spark, sf_dir):
    from calaveras_uniteus_etl_spark.plans.tables import table

    return (
        table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("n_regionkey")
    )


def test_gate_passes_on_a_true_pairing(spark, scratch_spec):
    name = scratch_spec(
        "__meta_ok",
        _nations,
        "SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
    )
    r = compare(spark, SF, name)
    assert r["rows_match"] and r["cols_match"] and r["values_match"]


def test_gate_catches_value_drift(spark, scratch_spec):
    name = scratch_spec(
        "__meta_value_drift",
        _nations,
        "SELECT n_regionkey, CAST(COUNT(*) + 1 AS BIGINT) AS n "
        "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
    )
    r = compare(spark, SF, name)
    assert not r["values_match"]
    assert r["first_diffs"]


def test_gate_catches_row_count_drift(spark, scratch_spec):
    name = scratch_spec(
        "__meta_row_drift",
        _nations,
        "SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM nation GROUP BY n_regionkey HAVING n_regionkey >= 1",
    )
    r = compare(spark, SF, name)
    assert not r["rows_match"]


def test_gate_catches_column_name_drift(spark, scratch_spec):
    name = scratch_spec(
        "__meta_col_drift",
        _nations,
        "SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_nations "
        "FROM nation GROUP BY n_regionkey",
    )
    r = compare(spark, SF, name)
    assert not r["cols_match"]


def test_gate_catches_dtype_drift(spark, scratch_spec):
    # same VALUES, but the oracle surfaces them as DOUBLE: the
    # type-faithful canon must see '5.0' != '5'
    name = scratch_spec(
        "__meta_dtype_drift",
        _nations,
        "SELECT n_regionkey, CAST(COUNT(*) AS DOUBLE) AS n "
        "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
    )
    r = compare(spark, SF, name)
    assert not r["values_match"]
    assert r["dtype_diffs"]


def test_gate_catches_ordering_independent_equality(spark, scratch_spec):
    # row order must NOT matter: a reversed oracle ordering still passes
    name = scratch_spec(
        "__meta_order_free",
        _nations,
        "SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey DESC",
    )
    r = compare(spark, SF, name)
    assert r["values_match"]
