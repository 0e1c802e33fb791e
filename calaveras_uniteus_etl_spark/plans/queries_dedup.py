"""Deduplication operator inventory (driver north-star extensions).

Training-data-pipeline dedup over the ``documents`` table: exact
(hash-groupBy), plus near-dup families (MinHash+LSH, SimHash, n-gram
Jaccard) built on the cross-engine ``md5_long`` hash so every stage is
oracle-checkable. Library implementations live in
``operators/dedup.py``; the registry entries here drive them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calaveras_uniteus_etl_spark.plans.catalog import register
from calaveras_uniteus_etl_spark.plans.tables import table

# ---------------------------------------------------------------------------
# X1 — exact dedup by content hash (hash-groupBy; scalable: one shuffle
#      on the digest, never on the full text)
# ---------------------------------------------------------------------------


@register(
    "x1_dedup_exact",
    oracle="""
SELECT md5(text) AS content_hash,
       MIN(doc_id) AS keeper_id,
       COUNT(*) AS copies
FROM documents
GROUP BY md5(text)
HAVING COUNT(*) > 1
""",
    doc="Exact duplicate groups: md5(content) → keeper + copy count.",
)
def x1_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("copies"))
        .filter(F.col("copies") > 1)
    )


@register(
    "x1_dedup_exact_survivors",
    oracle="""
SELECT COUNT(*) AS total_docs,
       COUNT(DISTINCT md5(text)) AS unique_docs,
       COUNT(*) - COUNT(DISTINCT md5(text)) AS removed
FROM documents
""",
    doc="Exact-dedup summary: survivor/removed counts.",
)
def x1_dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("total_docs"),
        F.countDistinct(F.md5("text")).alias("unique_docs"),
        (F.count("*") - F.countDistinct(F.md5("text"))).alias("removed"),
    )
