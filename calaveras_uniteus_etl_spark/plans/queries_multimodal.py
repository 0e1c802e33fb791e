"""Multimodal operator inventory (driver north-star extensions).

The media table is synthesized from ``documents`` (payload = utf-8
bytes of the text, media_type assigned round-robin) so the pipeline is
reproducible from the driver's parquet alone. Feature extraction runs
through the REAL mapInPandas plumbing (operators/multimodal.py) with a
deterministic fake decode whose formulas the DuckDB oracle mirrors
exactly — DuckDB's ``md5(VARCHAR)`` hashes the same utf-8 bytes Spark's
``md5(BINARY)`` sees, so digests agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calaveras_uniteus_etl_spark.operators.multimodal import extract_features
from calaveras_uniteus_etl_spark.plans.catalog import register
from calaveras_uniteus_etl_spark.plans.tables import table

# hex→int fold of a 15-hex-char slice of an md5 digest string (DuckDB
# has no conv(); identical to int(digest[a:a+15], 16))
def _duck_fold(expr: str) -> str:
    return (
        f"list_reduce(list_transform(string_split_regex({expr}, ''), "
        "ch -> strpos('0123456789abcdef', ch) - 1), (a, b) -> a * 16 + b)"
    )


_H1 = _duck_fold("substr(md5(text), 1, 15)")
_H2 = _duck_fold("substr(md5(text), 16, 15)")


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread before the Arrow/pandas decode stage (source is one file)
    d = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3).cast("int") + 1,
        ).alias("media_type"),
    )


@register(
    "x11_multimodal_features",
    oracle=f"""
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest,
       CASE WHEN doc_id % 3 IN (0, 2) THEN CAST({_H1} % 1920 + 1 AS INT) END AS width,
       CASE WHEN doc_id % 3 IN (0, 2) THEN CAST({_H2} % 1080 + 1 AS INT) END AS height,
       CASE WHEN doc_id % 3 IN (1, 2) THEN CAST({_H1} % 600 + 1 AS INT) END AS duration_s,
       CASE WHEN doc_id % 3 = 1 THEN CAST(8000 + ({_H2} % 8) * 4000 AS INT) END AS sample_rate
FROM documents
""",
    doc="Multimodal feature extraction: binary payload column → Arrow-"
    "batched mapInPandas decode (deterministic fake; real codecs stub "
    "behind import-try) with fixed output schema.",
)
def x11_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(_media(spark, sf_dir))


@register(
    "x11_multimodal_rollup",
    oracle=f"""
WITH feats AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CASE WHEN doc_id % 3 IN (0, 2) THEN CAST({_H1} % 1920 + 1 AS INT) END AS width
  FROM documents
)
SELECT media_type,
       COUNT(*) AS n_items,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(width) AS BIGINT) AS sum_width
FROM feats
GROUP BY media_type
""",
    doc="Rollup over extracted media features: per-type counts, byte "
    "totals — the mapInPandas output feeding a normal hash aggregate.",
)
def x11_multimodal_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(_media(spark, sf_dir))
    return feats.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("width").cast("bigint").alias("sum_width"),
    )
