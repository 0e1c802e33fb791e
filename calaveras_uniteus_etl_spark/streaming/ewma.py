"""Streaming EWMA drift monitor — custom stateful operator.

The streaming twin of ``s7_ewma_drift`` (plans/queries_streaming.py):
per user, an exponentially weighted moving average of purchase value
with dyadic weights (alpha = 1/2) truncated to the trailing
``EWMA_DEPTH`` events, the tail mass folded into the oldest term.
State per key is the trailing cent-quantized values (newest first)
plus the lifetime event count — a bounded O(depth) footprint per key,
which is what makes the operator viable on a billion-key stream.

Exactness contract (shared with the batch twin): values quantize to
BIGINT cents once, the weighted sum is an integer dot product, and the
only float op is the final division by the constant weight mass — so a
micro-batched streaming run and the batch window plan produce
bit-identical doubles. Parity is asserted in tests/test_streaming.py
across a two-trigger availableNow run with a real checkpoint.

Like streaming/sessionize.py, this is the ``applyInPandasWithState``
template for stateful logic the built-in windowed aggregates cannot
express (a per-key recursion over event order, not a commutative
aggregate).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EWMA_DEPTH = 8
_WEIGHTS = [1 << (EWMA_DEPTH - 2 - j) for j in range(EWMA_DEPTH - 1)] + [1]
_DENOM = (1 << (EWMA_DEPTH - 1)) * 100

EWMA_OUTPUT_SCHEMA = (
    "user_id bigint, n_purchases bigint, last_value double, ewma double"
)
_STATE_SCHEMA = "cents array<bigint>, n bigint"


def _ewma_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
) -> Iterator[pd.DataFrame]:
    """Per-user transition: fold the batch into the trailing window.

    Emits one row per micro-batch per user once the user has seen
    ``EWMA_DEPTH`` purchases (mirroring the batch twin's n >= depth
    gate); earlier batches only accumulate state.
    """
    (user_id,) = key
    if state.exists:
        cents, n = list(state.get[0]), int(state.get[1])
    else:
        cents, n = [], 0  # newest-first trailing window

    for pdf in pdfs:
        ordered = pdf.sort_values(["ts", "event_id"])
        for v in ordered["cents"]:
            cents.insert(0, int(v))
            n += 1
        del cents[EWMA_DEPTH:]

    state.update((cents, n))
    if n < EWMA_DEPTH:
        out = pd.DataFrame(
            columns=["user_id", "n_purchases", "last_value", "ewma"]
        ).astype(
            {
                "user_id": "int64",
                "n_purchases": "int64",
                "last_value": "float64",
                "ewma": "float64",
            }
        )
    else:
        dot = sum(w * c for w, c in zip(_WEIGHTS, cents))
        out = pd.DataFrame(
            [(user_id, n, float(cents[0]) / 100, float(dot) / _DENOM)],
            columns=["user_id", "n_purchases", "last_value", "ewma"],
        )
    yield out


def ewma_with_state(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Trailing-window EWMA via ``applyInPandasWithState``.

    Input: an events stream (or batch DataFrame in a foreachBatch) with
    ``ts``, ``event_id``, ``event_type``, ``value``; only purchases
    update the average. Output: the post-batch EWMA per active key.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    purchases = events.filter(F.col("event_type") == "purchase").select(
        key_col,
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return purchases.groupBy(key_col).applyInPandasWithState(
        _ewma_group,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
