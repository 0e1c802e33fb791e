"""Collect-side result shaping (reference /root/reference/core/reports/
service.py:51-82 and handlers.py:857-878).

The reference's endpoints return ``{labels, values}`` or
``{labels, datasets}`` chart JSON, with NULL group keys defaulted at
the formatter level (``row[0] or 'Unknown'`` — SURVEY §7.3 trap #6).
These helpers reproduce that exact shaping after ``collect()``; they
are the ONLY place unbounded results may reach the driver, and every
caller bounds them first (top-k limits are part of each query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def labels_values(
    df: DataFrame,
    label_col: str,
    value_col: str,
    null_label: str = "Unknown",
    limit: int = 1000,
) -> dict:
    rows = df.limit(limit).collect()
    return {
        "labels": [r[label_col] if r[label_col] is not None else null_label for r in rows],
        "values": [r[value_col] for r in rows],
    }


def labels_datasets(
    df: DataFrame,
    label_col: str,
    series_col: str,
    value_col: str,
    null_label: str = "Unknown",
    limit: int = 10_000,
) -> dict:
    """Pivot (label, series, value) rows into Chart.js-style datasets
    (reference handlers.py:857-878)."""
    rows = df.limit(limit).collect()
    labels: list = []
    series: dict[str, dict] = {}
    for r in rows:
        lab = r[label_col] if r[label_col] is not None else null_label
        ser = r[series_col] if r[series_col] is not None else null_label
        if lab not in labels:
            labels.append(lab)
        series.setdefault(ser, {})[lab] = r[value_col]
    return {
        "labels": labels,
        "datasets": [
            {"label": s, "data": [vals.get(lab, 0) for lab in labels]}
            for s, vals in series.items()
        ],
    }


def sankey(df: DataFrame, source_col: str, target_col: str, value_col: str, limit: int = 200) -> dict:
    """Node/link indexing for Sankey charts (reference router.py:470-503)."""
    rows = df.limit(limit).collect()
    nodes: list[str] = []

    def idx(name: str) -> int:
        if name not in nodes:
            nodes.append(name)
        return nodes.index(name)

    links = [
        {"source": idx(r[source_col]), "target": idx(r[target_col]), "value": r[value_col]}
        for r in rows
        if r[source_col] is not None and r[target_col] is not None
    ]
    return {"nodes": [{"name": n} for n in nodes], "links": links}
