"""Local replica of the driver's DuckDB differential check.

Runs a registered Spark query and its oracle SQL side-by-side, then
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, values canonicalized). Matches
the driver's CORRECTNESS gate closely enough that a pass here predicts
a pass there.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from calaveras_uniteus_etl_spark.plans.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon(v: Any) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # full precision — the engine contract is bit-identical doubles
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark, sf_dir: str, name: str) -> dict:
    """Run query `name` on Spark and DuckDB; return a comparison dict."""
    from calaveras_uniteus_etl_spark.plans import REGISTRY

    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = list(sdf.columns)

    con = duckdb_connection(sf_dir)
    try:
        res = con.execute(spec.oracle)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
    finally:
        con.close()

    s_canon = canonical_rows(s_cols, s_rows)
    o_canon = canonical_rows(o_cols, o_rows)
    mismatches = [
        (a, b) for a, b in zip(s_canon, o_canon) if a != b
    ][:5]
    return {
        "name": name,
        "rows_match": len(s_rows) == len(o_rows),
        "cols_match": sorted(s_cols) == sorted(o_cols),
        "values_match": s_canon == o_canon,
        "spark_rows": len(s_rows),
        "oracle_rows": len(o_rows),
        "spark_cols": sorted(s_cols),
        "oracle_cols": sorted(o_cols),
        "first_diffs": mismatches,
    }
