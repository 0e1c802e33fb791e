"""Watermarked window aggregates over an event stream.

The streaming twin of ``plans/queries_streaming.s1_tumbling_window``:
the grouped plan is IDENTICAL (``F.window`` bucketing + hash
aggregate); streaming only adds the watermark, which bounds state by
telling Spark when a window can no longer receive late rows and may be
finalized/evicted.

Scale notes: state per key is one aggregate row; watermark delay is the
late-data SLA — at 100 TB of events the knobs that matter are
shuffle partitions for the (window, key) exchange and the state-store
backend (RocksDB for large key spaces), both session-level configs, not
plan changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    events: DataFrame,
    window: str = "6 hours",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window count + sum; works on batch and stream alike.

    On a streaming DataFrame the watermark enables append-mode output
    (a window emits once it is final); on a batch DataFrame the
    watermark is a no-op and the result equals s1_tumbling_window.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window).alias("win"), key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_gap: str = "1 hour",
    watermark: str = "1 hour",
    extra: tuple[str, ...] = (),
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join within an event-time interval.

    The canonical attribution shape: right-side events joined to
    left-side events of the same key that happened within ``max_gap``
    BEFORE them. On streams both sides carry watermarks and the time
    bound lets Spark evict join state (unbounded state otherwise); on
    batch DataFrames the same plan is an ordinary join + range filter,
    which is what the parity test exercises.

    ``how="left_outer"`` keeps unmatched LEFT rows (right columns
    null). Streaming semantics differ from batch in TIMING only: an
    unmatched left row cannot emit until the watermark passes the end
    of its join interval (before that, a matching right row could
    still arrive), so null-joined rows surface one watermark delay
    late — the same total rows as the batch twin, proven across
    triggers in tests/test_streaming.py.
    """
    from pyspark.sql import functions as F

    l, r = left, right
    if l.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    cond = (
        (l[key_col] == r[key_col])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {max_gap}"))
    )
    cols = [l[key_col].alias(key_col), l[left_ts], r[right_ts]]
    for c in extra:  # payload passthrough, resolved from its side
        in_l, in_r = c in l.columns, c in r.columns
        if in_l and in_r:
            raise ValueError(
                f"interval_join: extra column {c!r} exists on both sides; "
                "rename one side before joining (silent left-side "
                "resolution would be a wrong-column hazard)"
            )
        if not (in_l or in_r):
            raise ValueError(f"interval_join: extra column {c!r} on neither side")
        cols.append(l[c] if in_l else r[c])
    if how not in ("inner", "left_outer"):
        raise ValueError(f"interval_join: unsupported how={how!r}")
    return l.join(r, cond, how).select(*cols)
