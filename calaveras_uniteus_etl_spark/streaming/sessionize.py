"""Streaming sessionization: built-in session windows + custom state.

Two implementations of the same 6-hour-gap session semantics as the
batch ``s2_sessionization`` (plans/queries_streaming.py):

- :func:`session_window_agg` — Spark's built-in ``session_window``
  (gap-merged windows maintained by the state store; the watermark
  closes sessions). Prefer this: pure built-ins, codegen, RocksDB
  state.
- :func:`sessionize_with_state` — the same operator hand-built on
  ``applyInPandasWithState``, as the template for stateful logic the
  built-ins can't express (the driver-brief "custom stateful operator"
  slot). State is one (start, last, count) triple per user; closed
  sessions are emitted when a subsequent event arrives beyond the gap.
  Arrow-batched; state transitions are per-group, not per-row.

Both are batch-equivalent to lag+cumsum gap-and-island: tested in
tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_GAP = "6 hours"
_GAP_US = 6 * 3600 * 1_000_000

SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"


def session_window_agg(
    events: DataFrame,
    gap: str = SESSION_GAP,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Built-in session windows: one row per (user, session)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(key_col, F.session_window(ts_col, gap).alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def _sessionize_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
) -> Iterator[pd.DataFrame]:
    """Per-user state transition: emit sessions closed by a later event.

    State survives micro-batches (and restarts, via the checkpoint), so
    a session left open at the end of one batch closes correctly when
    the next batch's first event is beyond the gap.
    """
    (user_id,) = key
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us, last_us, n = None, None, 0

    closed: list[tuple[int, int, int, int]] = []
    for pdf in pdfs:
        # Arrow hands ts as datetime64[ns]; state keys are epoch-µs
        ts_us = (pdf["ts"].astype("int64") // 1000).sort_values()
        for t in ts_us:
            t = int(t)
            if last_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > _GAP_US:
                closed.append((user_id, start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = t, n + 1

    state.update((start_us, last_us, n))
    out = pd.DataFrame(
        closed, columns=["user_id", "session_start", "session_end", "n_events"]
    )
    if not out.empty:
        out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
    else:
        out = out.astype(
            {
                "user_id": "int64",
                "session_start": "datetime64[us]",
                "session_end": "datetime64[us]",
                "n_events": "int64",
            }
        )
    yield out


def sessionize_with_state(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState``.

    Emits one row per CLOSED session (a session closes when a later
    event for the same user arrives beyond the gap) — the last session
    per user stays in state until more data arrives.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.select(key_col, "ts").groupBy(key_col).applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
