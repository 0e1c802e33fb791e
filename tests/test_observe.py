"""Observation API: free in-flight metrics for ops dashboards.

``df.observe`` attaches named aggregates that are computed DURING the
action (no second scan) — the engine-native way to emit row counts /
quality tallies from a production job. These tests prove the observed
metrics equal a direct aggregate, including under filters, so the ETL
pipeline can rely on them for its load bookkeeping at zero extra cost.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from calaveras_uniteus_etl_spark.plans.tables import table

SF = "/root/testdata/sf0.001"


def test_observe_matches_direct_aggregate(spark):
    obs = Observation("ingest")
    df = table(spark, SF, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("total"),
        F.sum(
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
        ).alias("n_final"),
    )
    df.write.format("noop").mode("overwrite").save()
    got = obs.get
    direct = (
        table(spark, SF, "orders")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("total"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            ).alias("n_final"),
        )
        .first()
    )
    assert got["n_rows"] == direct["n_rows"]
    assert got["total"] == direct["total"]
    assert got["n_final"] == direct["n_final"]


def test_observe_sees_pre_filter_rows(spark):
    """Metrics attach at the observe() point in the plan: observing
    BEFORE a filter counts every scanned row — the dropped-row tally
    an ingest job reports without a second pass."""
    obs = Observation("pre_filter")
    base = table(spark, SF, "orders").observe(
        obs, F.count(F.lit(1)).alias("scanned")
    )
    kept = base.filter(F.col("o_orderstatus") == "O").count()
    scanned = obs.get["scanned"]
    total = table(spark, SF, "orders").count()
    assert scanned == total
    assert kept < total
