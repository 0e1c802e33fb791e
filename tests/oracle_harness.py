"""Local replica of the driver's DuckDB differential check.

Runs a registered Spark query and its oracle SQL side-by-side and
compares row count, column names, and an order-insensitive value
canonicalization — deliberately through the SAME conversion paths the
driver uses:

- Spark results via ``toPandas()`` (DECIMAL -> ``Decimal`` objects),
- DuckDB results via ``.df()``    (DECIMAL -> float64),

then per-cell ``str()`` after sorting columns and rows. This is
intentionally type-faithful: ``str(Decimal('49612.30')) !=
str(49612.3)``, and DuckDB HUGEINT sums come back float64
(``'1807.0'`` vs ``'1807'``) — the round-1 harness normalized those
differences away and masked 8 driver hash mismatches. A query passes
here only if both engines surface the SAME dtypes, which is the
engine contract (DOUBLE/BIGINT/VARCHAR final outputs, never DECIMAL).

A list-valued output cell raises inside ``sort_values`` (pandas cannot
factorize lists) — exactly as it does in the driver's canon, so such
queries fail loudly here instead of there.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from calaveras_uniteus_etl_spark.plans.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-shaped canonicalization: sorted columns, sorted rows."""
    cols = sorted(df.columns)
    out = df[cols]
    if len(out):
        out = out.sort_values(by=cols, kind="mergesort")
    return out.reset_index(drop=True)


def _cells(df: pd.DataFrame) -> list[tuple[str, ...]]:
    return [tuple(str(v) for v in row) for row in df.itertuples(index=False)]


def compare(spark, sf_dir: str, name: str) -> dict:
    """Run query `name` on Spark and DuckDB; return a comparison dict."""
    from calaveras_uniteus_etl_spark.plans import REGISTRY

    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir).toPandas()

    con = duckdb_connection(sf_dir)
    try:
        odf = con.execute(spec.oracle).df()
    finally:
        con.close()

    s_canon = _canon_frame(sdf)
    o_canon = _canon_frame(odf)
    s_cells = _cells(s_canon)
    o_cells = _cells(o_canon)
    mismatches = [(a, b) for a, b in zip(s_cells, o_cells) if a != b][:5]
    dtype_diffs = [
        (c, str(s_canon[c].dtype), str(o_canon[c].dtype))
        for c in s_canon.columns
        if c in o_canon.columns and str(s_canon[c].dtype) != str(o_canon[c].dtype)
    ]
    return {
        "name": name,
        "rows_match": len(sdf) == len(odf),
        "cols_match": sorted(sdf.columns) == sorted(odf.columns),
        "values_match": s_cells == o_cells,
        "spark_rows": len(sdf),
        "oracle_rows": len(odf),
        "spark_cols": sorted(sdf.columns),
        "oracle_cols": sorted(odf.columns),
        "dtype_diffs": dtype_diffs,
        "first_diffs": mismatches,
    }
