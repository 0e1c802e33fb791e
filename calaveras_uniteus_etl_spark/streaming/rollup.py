"""Incrementally-maintained aggregate table via foreachBatch.

The streaming twin of the c8 merge proof: each micro-batch's partial
aggregate (count + exact-decimal sum per key) merges into a persistent
rollup table, and because counts and decimal sums are associative the
maintained table equals a full batch recompute after any sequence of
micro-batches. This is the pattern for serving-layer tables at 100 TB:
the stream only ever shuffles its own micro-batch on the rollup key,
and the merge rewrites a key-grain table that stays aggregate-sized.

Restart safety: the checkpoint's offset log makes each file's
contribution exactly-once at the source; the merge itself is
idempotent per batch because the warehouse write is an atomic swap —
a crash between merge and commit replays the batch against the
PRE-swap table state only if the swap did not happen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from calaveras_uniteus_etl_spark.warehouse import Warehouse

ROLLUP_TABLE = "events_rollup"


def _partials(batch: DataFrame, key: str, value: str) -> DataFrame:
    return batch.groupBy(key).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col(value).cast("decimal(18,6)"))
        .cast("decimal(38,6)")
        .alias("sum_value"),
    )


def merge_rollup(existing: DataFrame, partial: DataFrame, key: str) -> DataFrame:
    """Merge a partial aggregate into the rollup (associative math only)."""
    e = existing.select(
        key, "n_events", F.col("sum_value").cast("decimal(38,6)").alias("sum_value")
    )
    return (
        e.unionByName(partial)
        .groupBy(key)
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_value").cast("decimal(38,6)").alias("sum_value"),
        )
    )


def stream_rollup(
    spark: SparkSession,
    input_dir: str,
    warehouse: Warehouse,
    checkpoint_dir: str,
    schema,
    key: str = "event_type",
    value: str = "value",
) -> StreamingQuery:
    """Drain ``input_dir`` maintaining the rollup table exactly once."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        partial = _partials(batch, key, value)
        if warehouse.exists(ROLLUP_TABLE):
            merged = merge_rollup(warehouse.read(ROLLUP_TABLE), partial, key)
        else:
            merged = partial.select(
                key,
                F.col("n_events").cast("bigint").alias("n_events"),
                "sum_value",
            )
        warehouse.write(ROLLUP_TABLE, merged)

    stream = spark.readStream.schema(schema).parquet(input_dir)
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
