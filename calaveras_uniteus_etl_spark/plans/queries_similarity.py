"""Similarity-search operator inventory (driver north-star extensions).

ANN over the ``embeddings`` table (array<float>, 64-dim). Brute-force
cosine top-k is the exactness baseline; the LSH-bucketed variant
(operators/similarity.py) is the scale path. Dot products use built-in
higher-order functions (zip_with + aggregate) — JVM-side, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from calaveras_uniteus_etl_spark.plans.catalog import register
from calaveras_uniteus_etl_spark.plans.tables import table

# ---------------------------------------------------------------------------
# X5 — brute-force cosine top-k for a bounded query set
# ---------------------------------------------------------------------------

_TOPK = 5
_N_QUERY = 8  # vec_id < 8 are the probe vectors

_X5_ORACLE = f"""
WITH probes AS (
  SELECT vec_id AS query_id, embedding AS q FROM embeddings WHERE vec_id < {_N_QUERY}
),
scored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
         ROUND(list_dot_product(p.q, e.embedding)
               / NULLIF(sqrt(list_dot_product(p.q, p.q))
                        * sqrt(list_dot_product(e.embedding, e.embedding)), 0),
               4) AS cosine
  FROM probes p, embeddings e
  WHERE e.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
  FROM scored
) WHERE rn <= {_TOPK}
"""


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


@register(
    "x5_cosine_topk",
    oracle=_X5_ORACLE,
    doc="Brute-force cosine top-k (zip_with/aggregate dot product, "
    "broadcast probe set, rank via window). Baseline for ANN.",
)
def x5_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < _N_QUERY).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    joined = e.join(F.broadcast(probes), F.col("vec_id") != F.col("query_id"))
    num = _dot(F.col("q"), F.col("embedding"))
    den = F.nullif(
        F.sqrt(_dot(F.col("q"), F.col("q")))
        * F.sqrt(_dot(F.col("embedding"), F.col("embedding"))),
        F.lit(0.0),
    )
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(num / den, 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select("query_id", "neighbor_id", "cosine")
    )
