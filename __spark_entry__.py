"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` expose the full operator inventory
from ``calaveras_uniteus_etl_spark.plans`` (one entry per SURVEY.md §2
operator pattern plus the training-data-pipeline extensions), each with
a DuckDB-runnable ANSI-SQL oracle. ``entry(spark)`` runs the flagship
pricing-summary aggregate at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from calaveras_uniteus_etl_spark.plans import REGISTRY

    return REGISTRY["f4_pricing_summary"].fn(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from calaveras_uniteus_etl_spark.plans import REGISTRY

    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    from calaveras_uniteus_etl_spark.plans import REGISTRY

    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
