"""Structured Streaming surface.

The reference's only time-driven behavior is a polling scheduler
(/root/reference/core/app.py:157-410, SURVEY.md §2.K) — no streaming
semantics to port. This package is the idiomatic-Spark upgrade path:

- ``ingest``: file-source streaming ingest with checkpointed
  exactly-once file tracking (replaces the reference's md5-based
  processed-file bookkeeping, core/etl_service.py:364-370);
- ``windows``: watermarked tumbling-window aggregates (the streaming
  twin of plans/queries_streaming.s1_tumbling_window);
- ``sessionize``: built-in ``session_window`` aggregation plus a
  custom stateful operator via ``applyInPandasWithState`` (the
  streaming twin of s2_sessionization);
- ``ewma``: per-key trailing-window EWMA drift monitor, the second
  ``applyInPandasWithState`` operator (streaming twin of
  s7_ewma_drift) — a per-key recursion over event order that no
  built-in windowed aggregate expresses.
"""

from calaveras_uniteus_etl_spark.streaming.enrich import (  # noqa: F401
    enrich_with_dimension,
)
from calaveras_uniteus_etl_spark.streaming.ewma import (  # noqa: F401
    ewma_with_state,
)
from calaveras_uniteus_etl_spark.streaming.ingest import stream_ingest  # noqa: F401
from calaveras_uniteus_etl_spark.streaming.rollup import (  # noqa: F401
    apply_batch,
    merge_rollup,
    stream_rollup,
)
from calaveras_uniteus_etl_spark.streaming.windows import (  # noqa: F401
    windowed_agg,
)
from calaveras_uniteus_etl_spark.streaming.sessionize import (  # noqa: F401
    session_window_agg,
    sessionize_with_state,
)
