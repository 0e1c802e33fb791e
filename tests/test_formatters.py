"""Tests for collect-side chart formatters (reference service.py:51-82,
handlers.py:857-878, router.py:470-503 shapes) and for the oracle
harness's value canonicalization (silent drift there would invalidate
every differential check)."""

from __future__ import annotations

from decimal import Decimal

from calaveras_uniteus_etl_spark.reports.formatters import (
    labels_datasets,
    labels_values,
    sankey,
)
import pandas as pd

from tests.oracle_harness import _canon_frame, _cells


def test_labels_values_null_default(spark):
    df = spark.createDataFrame(
        [("a", 3), (None, 2), ("b", 1)], "k string, n long"
    )
    out = labels_values(df.orderBy("n", ascending=False), "k", "n")
    assert out == {"labels": ["a", "Unknown", "b"], "values": [3, 2, 1]}


def test_labels_datasets_pivot(spark):
    df = spark.createDataFrame(
        [("jan", "open", 2), ("jan", "closed", 1), ("feb", "open", 4)],
        "period string, status string, n long",
    )
    out = labels_datasets(df.orderBy("period", "status"), "period", "status", "n")
    assert out["labels"] == ["feb", "jan"]
    data = {d["label"]: d["data"] for d in out["datasets"]}
    assert data == {"open": [4, 2], "closed": [0, 1]}  # missing cell → 0


def test_sankey_node_indexing(spark):
    df = spark.createDataFrame(
        [("A", "B", 5), ("B", "C", 3), ("A", "C", 1), (None, "C", 9)],
        "src string, dst string, v long",
    )
    out = sankey(df.orderBy("src", "dst"), "src", "dst", "v")
    names = [n["name"] for n in out["nodes"]]
    assert names == ["A", "B", "C"]  # first-seen order; NULL link dropped
    assert {(l["source"], l["target"], l["value"]) for l in out["links"]} == {
        (0, 1, 5), (0, 2, 1), (1, 2, 3)
    }


def test_canon_is_type_faithful():
    # the whole point of the strict canon: Decimal('1.00') and 1.0 must
    # NOT compare equal — DuckDB's .df() gives float64 where Spark's
    # toPandas gives Decimal, and the driver hashes the difference
    dec = pd.DataFrame({"v": [Decimal("1.00")]})
    flt = pd.DataFrame({"v": [1.0]})
    assert _cells(_canon_frame(dec)) != _cells(_canon_frame(flt))
    # identical float64 bits stringify identically
    assert _cells(_canon_frame(pd.DataFrame({"v": [0.1 + 0.2]}))) == _cells(
        _canon_frame(pd.DataFrame({"v": [0.30000000000000004]}))
    )


def test_canon_column_and_row_order_insensitive():
    a = pd.DataFrame({"b": [2, 1], "a": ["x", "y"]})
    b = pd.DataFrame({"a": ["y", "x"], "b": [1, 2]})
    assert _cells(_canon_frame(a)) == _cells(_canon_frame(b))
