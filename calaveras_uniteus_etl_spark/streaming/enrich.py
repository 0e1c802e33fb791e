"""Stream-static dimension enrichment.

The streaming counterpart of the batch broadcast join (E7): each
micro-batch joins against a static dimension table. Spark plans a
stream-static join per micro-batch, so a broadcast hint on the static
side makes every batch a map-side hash join — no stream-side shuffle,
no state store. This is the canonical "attach reference data to an
event stream" pattern; slowly-changing dimensions re-read per batch
via a ``foreachBatch`` refresh instead (out of scope here — the
reference has no streaming surface at all, SURVEY.md §2.K).

Scale notes: the stream side keeps its source partitioning end to end;
dimension churn only matters at batch boundaries. If the dimension
outgrows broadcast size, drop the hint and let AQE pick a shuffled
join — the operator contract is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dimension(
    stream: DataFrame,
    dimension: DataFrame,
    stream_key: str,
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """Join a (streaming or batch) fact frame onto a static dimension.

    Broadcast is a hint, not a requirement: Spark ignores it where a
    broadcast is illegal (e.g. right side of some outer shapes) and
    AQE re-plans oversized dimensions.
    """
    return stream.join(
        F.broadcast(dimension), stream[stream_key] == dimension[dim_key], how
    )
