"""Accuracy gate for sketch-backed queries with no cross-engine oracle.

f2_approx_count_distinct is rows-only at the driver (HLL++ sketches are
engine-private, so no DuckDB hash can match). Its accuracy claim is
checked here instead: per group, the HLL++ estimate at rsd=0.01 must
sit within 3·rsd of the exact COUNT(DISTINCT) — a >3-sigma bound the
sketch satisfies with overwhelming probability on every group size.
"""

from pyspark.sql import functions as F

from calaveras_uniteus_etl_spark.plans.queries_aggregates import (
    f2_approx_count_distinct,
)
from calaveras_uniteus_etl_spark.plans.tables import table

SF_DIR = "/root/testdata/sf0.01"
RSD = 0.01


def test_approx_count_distinct_within_3_rsd(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in f2_approx_count_distinct(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["exact_users"]
        for r in table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .collect()
    }
    assert set(approx) == set(exact) and len(exact) > 0
    for etype, ex in exact.items():
        ap = approx[etype]
        assert abs(ap - ex) <= max(1.0, 3 * RSD * ex), (
            etype,
            ex,
            ap,
        )
