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


# ---------------------------------------------------------------------------
# X6 — LSH-bucketed ANN (scale path) + embedding-cosine near-dup
#
# Same cosine arithmetic as X5, but candidates come from sign-random-
# projection buckets (operators/similarity.py) instead of the full cross
# product: the candidate join shuffles on (table, bucket) small-int keys,
# so cost scales with bucket occupancy, not corpus size.
# ---------------------------------------------------------------------------

from calaveras_uniteus_etl_spark.operators import similarity as sim

_ANN_TOPK = 3
_NEARDUP_MIN = 0.4

_DUCK_COSINE = """ROUND(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))
       / NULLIF(sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))
                * sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[]))), 0), 4)"""


def _spark_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectors with bucket ids and a precomputed norm, cached.

    The self-join and the cosine step both reuse this one relation:
    buckets/norms are computed once per vector, never per candidate
    pair, and the join carries (vec_id, tbl, bucket) — 3 small ints —
    until the final embedding join-back.
    """
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        sim.buckets_array_expr().alias("bks"),
    ).cache()


_BUCKET_CAP = 1000  # mega-bucket guard; see queries_dedup.BUCKET_CAP


def _spark_buckets(vecs: DataFrame) -> DataFrame:
    b = vecs.select("vec_id", F.posexplode("bks").alias("tbl", "bucket"))
    ok = (
        b.groupBy("tbl", "bucket")
        .agg(F.count("*").alias("bc"))
        .filter(F.col("bc") <= _BUCKET_CAP)
        .drop("bc")
    )
    return b.join(ok, ["tbl", "bucket"])


def _duck_buckets_cte() -> str:
    return f"""
  buckets_all AS (
    SELECT vec_id, embedding, t.tbl AS tbl, bks[t.tbl + 1] AS bucket
    FROM (SELECT vec_id, embedding, {sim.duck_buckets_list_sql()} AS bks FROM embeddings)
    CROSS JOIN (SELECT unnest(range({sim.N_TABLES})) AS tbl) t
  ), bok AS (
    SELECT tbl, bucket FROM buckets_all GROUP BY tbl, bucket HAVING COUNT(*) <= 1000
  ), buckets AS (
    SELECT buckets_all.* FROM buckets_all JOIN bok USING (tbl, bucket)
  )"""


@register(
    "x6_ann_lsh_topk",
    oracle=f"""
WITH {_duck_buckets_cte()},
probes AS (
  SELECT * FROM buckets WHERE vec_id < {_N_QUERY}
),
cand AS (
  SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         p.embedding AS q, c.embedding AS e
  FROM probes p JOIN buckets c
    ON p.tbl = c.tbl AND p.bucket = c.bucket AND p.vec_id <> c.vec_id
),
scored AS (
  SELECT query_id, neighbor_id, {_DUCK_COSINE.format(a="q", b="e")} AS cosine
  FROM cand
)
SELECT query_id, neighbor_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
  FROM scored
) WHERE rn <= {_ANN_TOPK}
""",
    doc="LSH-bucketed ANN top-k: sign-random-projection buckets (8 tables "
    "× 4 bits) prune candidates before exact cosine ranking — the scale "
    "path next to X5's brute force.",
)
def x6_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _spark_vecs(spark, sf_dir)
    b = _spark_buckets(vecs)
    probes = b.filter(F.col("vec_id") < _N_QUERY).select(
        F.col("vec_id").alias("query_id"), "tbl", "bucket"
    )
    cand = (
        F.broadcast(probes)
        .join(b, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    qside = vecs.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q"),
        F.col("nrm").alias("qn"),
    )
    nside = vecs.select(
        F.col("vec_id").alias("neighbor_id"), "embedding", F.col("nrm").alias("en")
    )
    scored = (
        cand.join(F.broadcast(qside), "query_id")
        .join(nside, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("q"), F.col("embedding"))
                / F.nullif(F.col("qn") * F.col("en"), F.lit(0.0)),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _ANN_TOPK)
        .select("query_id", "neighbor_id", "cosine")
    )


@register(
    "x6_embed_neardup",
    oracle=f"""
WITH {_duck_buckets_cte()},
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
         a.embedding AS ea, b.embedding AS eb
  FROM buckets a JOIN buckets b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, {_DUCK_COSINE.format(a="ea", b="eb")} AS cosine
FROM cand
WHERE {_DUCK_COSINE.format(a="ea", b="eb")} >= {_NEARDUP_MIN}
""",
    doc="Embedding-cosine near-dup pairs: LSH bucket collision → exact "
    "cosine ≥ 0.4. Approximate-recall by construction; oracle mirrors "
    "the same buckets exactly.",
)
def x6_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _spark_vecs(spark, sf_dir)
    b = _spark_buckets(vecs)
    a, c = b.alias("a"), b.alias("c")
    # candidate mining carries only (vec_id, vec_id): the distinct and
    # the shuffle never see the 64-float payload
    cand = (
        a.join(
            c,
            (F.col("a.tbl") == F.col("c.tbl"))
            & (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.vec_id") < F.col("c.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("c.vec_id").alias("vec_b"))
        .distinct()
    )
    aside = vecs.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    bside = vecs.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cosine = F.round(
        _dot(F.col("ea"), F.col("eb"))
        / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
        4,
    )
    return (
        cand.join(aside, "vec_a")
        .join(bside, "vec_b")
        .select("vec_a", "vec_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= _NEARDUP_MIN)
    )
