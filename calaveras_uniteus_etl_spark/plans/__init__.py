"""Query plans: the judge-facing operator inventory.

Every operator family from SURVEY.md §2 is expressed here as a named
query over the driver's synthetic tables, each paired with an ANSI-SQL
oracle that DuckDB runs on the same parquet files. The registry is what
``__spark_entry__.queries()`` / ``oracle_sql()`` expose.
"""

from calaveras_uniteus_etl_spark.plans.catalog import REGISTRY, QuerySpec  # noqa: F401
from calaveras_uniteus_etl_spark.plans import (  # noqa: F401  (import = register)
    queries_aggregates,
    queries_dedup,
    queries_etl,
    queries_filters,
    queries_joins,
    queries_multimodal,
    queries_similarity,
    queries_streaming,
    queries_text,
)
