"""Similarity-search operator inventory (driver north-star extensions).

ANN over the ``embeddings`` table (array<float>, 64-dim). Brute-force
cosine top-k is the exactness baseline; the LSH-bucketed variant
(operators/similarity.py) is the scale path. Pair scoring uses flat
left-folded sum chains (JVM whole-stage codegen); the one Python
touchpoint is the Arrow-vectorized bucket UDF
(``operators/similarity.buckets_array_udf``), whose np.cumsum fold
order is bit-identical to the SQL chains.
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
    """Left-fold dot product as an explicit sum chain.

    Bit-identical to ``aggregate(zip_with(...))`` (same fold order,
    seed 0.0 + first product is exact) and to DuckDB's
    ``list_dot_product``, but a flat ~250-node arithmetic expression
    runs inside whole-stage codegen instead of the interpreted
    higher-order-function path. Accepts Column or name; columns must
    be simple references (the chain indexes them by name).
    """
    an = a._jc.toString() if not isinstance(a, str) else a
    bn = b._jc.toString() if not isinstance(b, str) else b
    terms = " + ".join(
        f"(cast({an}[{i}] as double) * cast({bn}[{i}] as double))"
        for i in range(sim.EMBED_DIM)
    )
    return F.expr("(" + terms + ")")


@register(
    "x5_cosine_topk",
    oracle=_X5_ORACLE,
    doc="Brute-force cosine top-k (zip_with/aggregate dot product, "
    "broadcast probe set, rank via window). Baseline for ANN.",
)
def x5_cosine_topk(
    spark: SparkSession, sf_dir: str, *, vecs: DataFrame | None = None
) -> DataFrame:
    # single-file source → rebalance so the per-row dot products fan
    # out across cores (narrow data, wide compute); norms precomputed
    # once per side — identical operands, so bit-parity with the
    # oracle's inline sqrt(list_dot_product(...)) holds.
    # Composites (x38/x41/x42) pass a prebuilt featurization via
    # `vecs` so the exact and approximate rankers they compare share
    # ONE materialization of the corpus scan + norms instead of each
    # branch re-reading and re-hashing it (the r6 3.5x regression).
    e = (
        vecs.select("vec_id", "embedding", "nrm")
        if vecs is not None
        else _spark_base(spark, sf_dir)
    )
    probes = e.filter(F.col("vec_id") < _N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q"),
        F.col("nrm").alias("qn"),
    )
    joined = e.join(F.broadcast(probes), F.col("vec_id") != F.col("query_id"))
    num = _dot(F.col("q"), F.col("embedding"))
    den = F.nullif(F.col("qn") * F.col("nrm"), F.lit(0.0))
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


# ---------------------------------------------------------------------------
# Session-level embedding index
#
# A production vector store builds its index (norms + LSH bucket
# signatures) ONCE per corpus and amortizes it across every query that
# follows — rebuilding the featurization per query is the actual
# anti-pattern at 100 TB (re-reading and re-hashing the full corpus
# each time). The registry contract (keying, eviction, why not the
# session CacheManager) lives in plans/_session_index.py.
# ---------------------------------------------------------------------------

from calaveras_uniteus_etl_spark.plans._session_index import (
    materialize,
    session_index,
)


def _vec_index(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(vecs, buckets): the corpus featurization, built once per session.

    vecs = (vec_id, embedding, nrm, bks) — norms + SRP-LSH bucket
    signatures, computed once per vector, never per candidate pair.
    buckets = the exploded capped (vec_id, tbl, bucket) postings —
    candidate joins carry these 3 small ints until the final
    embedding join-back.
    """
    return session_index(
        spark, sf_dir, "embedding_index", lambda: _vec_index_build(spark, sf_dir)
    )


def _vec_featurize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LAZY featurization plan — norms + SRP-LSH signatures over the
    corpus scan. Split out from the build so the plan lint can walk it;
    the checkpoint in _vec_index_build would otherwise hide it behind a
    leaf."""
    # repartition first: the synthetic source is one parquet file → one
    # task, which would serialize the 32 hyperplane dot products per
    # vector onto a single core. At scale the source arrives already
    # partitioned and this is a cheap narrow-width rebalance.
    e = table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    return e.select(
        "vec_id",
        "embedding",
        "label",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        sim.buckets_array_udf().alias("bks"),
    )


def _postings_plan(vecs: DataFrame) -> DataFrame:
    """The LAZY capped-postings plan over a featurized relation."""
    b = vecs.select("vec_id", F.posexplode("bks").alias("tbl", "bucket"))
    # the cap relation has at most N_TABLES * 2^N_PLANES rows regardless
    # of corpus size — broadcast it so the cap filter never shuffles b
    ok = (
        b.groupBy("tbl", "bucket")
        .agg(F.count("*").alias("bc"))
        .filter(F.col("bc") <= _BUCKET_CAP)
        .drop("bc")
    )
    return b.join(F.broadcast(ok), ["tbl", "bucket"])


def _vec_index_build(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    vecs = materialize(_vec_featurize_plan(spark, sf_dir))
    buckets = materialize(_postings_plan(vecs))
    return vecs, buckets


def _spark_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding, nrm): the bucket-free slice of the index.

    A free projection of the cached featurization — the exact and IVF
    rankers (x5/x13/x41/x42) share the same materialization the LSH
    path uses, so no ranker ever re-scans or re-norms the corpus.
    """
    vecs, _ = _vec_index(spark, sf_dir)
    return vecs.select("vec_id", "embedding", "nrm")


def _probe_pair_scores(e: DataFrame) -> DataFrame:
    """(query_id, neighbor_id, cosine) for every probe × corpus pair.

    The single scoring pass the recall audits (x38/x41) derive BOTH
    arms from: the exact ranker is a window over all pairs, an ANN
    arm is a window over the candidate-flagged subset — the cosine
    arithmetic runs once per pair, never once per arm. Rounding and
    tie-breaks match standalone x5/x6/x13 exactly.
    """
    probes = e.filter(F.col("vec_id") < _N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q"),
        F.col("nrm").alias("qn"),
    )
    return e.join(F.broadcast(probes), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            _dot(F.col("q"), F.col("embedding"))
            / F.nullif(F.col("qn") * F.col("nrm"), F.lit(0.0)),
            4,
        ).alias("cosine"),
    )


def _payload_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(vec_a, ea, na) / (vec_b, eb, nb) payload join-back relations.

    Sourced from the parquet scan, NOT the checkpointed index: the scan
    carries size statistics, so Catalyst broadcasts these joins at
    small corpora and falls back to shuffle joins at scale, whereas a
    stats-less checkpoint leaf forces sort-merge everywhere. The norm
    expression is identical to the index's, so bit-parity with the
    oracles holds.
    """
    pay = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    aside = pay.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    bside = pay.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    return aside, bside


from calaveras_uniteus_etl_spark.plans.queries_dedup import BUCKET_CAP as _BUCKET_CAP


def _duck_buckets_cte() -> str:
    # ids only — candidate mining never carries the vector payload;
    # scoring joins embeddings back by id (mirrors the Spark plan)
    return f"""
  buckets_all AS (
    SELECT vec_id, t.tbl AS tbl, bks[t.tbl + 1] AS bucket
    FROM (SELECT vec_id, {sim.duck_buckets_list_sql()} AS bks FROM embeddings)
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
  SELECT vec_id, tbl, bucket FROM buckets WHERE vec_id < {_N_QUERY}
),
cand AS (
  SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM probes p JOIN buckets c
    ON p.tbl = c.tbl AND p.bucket = c.bucket AND p.vec_id <> c.vec_id
),
scored AS (
  SELECT query_id, neighbor_id, {_DUCK_COSINE.format(a="q.embedding", b="e.embedding")}
           AS cosine
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.query_id
  JOIN embeddings e ON e.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
  FROM scored
) WHERE rn <= {_ANN_TOPK}
""",
    doc="LSH-bucketed ANN top-k: sign-random-projection buckets "
    f"({sim.N_TABLES} tables × {sim.N_PLANES} bits) prune candidates "
    "before exact cosine ranking — the scale path next to X5's brute "
    "force.",
)
def x6_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs, b = _vec_index(spark, sf_dir)
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
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckets a JOIN buckets b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
scored AS (
  SELECT vec_a, vec_b,
         {_DUCK_COSINE.format(a="ea.embedding", b="eb.embedding")} AS cosine
  FROM cand
  JOIN embeddings ea ON ea.vec_id = cand.vec_a
  JOIN embeddings eb ON eb.vec_id = cand.vec_b
)
SELECT vec_a, vec_b, cosine FROM scored
WHERE cosine >= {_NEARDUP_MIN}
""",
    doc="Embedding-cosine near-dup pairs: LSH bucket collision → exact "
    "cosine ≥ 0.4. Approximate-recall by construction; oracle mirrors "
    "the same buckets exactly.",
)
def x6_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs, b = _vec_index(spark, sf_dir)
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
        # the distinct's post-shuffle stage is a few MB of id pairs, so
        # AQE coalesces it to ~1 partition — which would serialize the
        # downstream cosine scoring onto one core. Re-spread by the
        # join-back key (cheap: bare int pairs; at scale this hash
        # partitioning is reusable by the payload join on vec_a).
        .repartition(spark.sparkContext.defaultParallelism, "vec_a")
    )
    # payload join-backs from the parquet scan (stats visible -> CBO
    # broadcasts when small, shuffles when huge); see _payload_sides
    aside, bside = _payload_sides(spark, sf_dir)
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


# ---------------------------------------------------------------------------
# X13 — IVF ANN (inverted-file index; the second scale path next to LSH)
#
# Classic IVF structure: a coarse quantizer assigns every vector to its
# nearest centroid (inverted lists); a query probes only the nprobe
# nearest lists. Centroids here are the first 16 corpus vectors —
# deterministic, so the oracle mirrors them exactly; a production
# deployment replaces them with k-means centroids without touching the
# query shape. Assignment is an argmax over 16 cosines (broadcast
# centroids, no shuffle); the probe join shuffles only (centroid, id)
# pairs. At 100 TB: lists are the partition key, so a query touches
# nprobe/nlists of the corpus.
# ---------------------------------------------------------------------------

_N_CENTROIDS = 16
_N_PROBE = 2

_DUCK_COS_RAW = """(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))
       / NULLIF(sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))
                * sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[]))), 0))"""


@register(
    "x13_ann_ivf_topk",
    oracle=f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS c FROM embeddings WHERE vec_id < {_N_CENTROIDS}
), assign AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, cents.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_DUCK_COS_RAW.format(a="e.embedding", b="cents.c")} DESC, cents.cid) AS rn
    FROM embeddings e CROSS JOIN cents
  ) WHERE rn = 1
), probe_lists AS (
  SELECT query_id, cid FROM (
    SELECT p.vec_id AS query_id, cents.cid,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id
                              ORDER BY {_DUCK_COS_RAW.format(a="p.embedding", b="cents.c")} DESC, cents.cid) AS rn
    FROM embeddings p CROSS JOIN cents WHERE p.vec_id < {_N_QUERY}
  ) WHERE rn <= {_N_PROBE}
), cand AS (
  SELECT pl.query_id, a.vec_id AS neighbor_id, q.embedding AS qe, a.embedding AS ne
  FROM probe_lists pl
  JOIN assign a ON a.cid = pl.cid
  JOIN embeddings q ON q.vec_id = pl.query_id
  WHERE a.vec_id <> pl.query_id
)
SELECT query_id, neighbor_id, cosine FROM (
  SELECT query_id, neighbor_id,
         ROUND({_DUCK_COS_RAW.format(a="qe", b="ne")}, 4) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ROUND({_DUCK_COS_RAW.format(a="qe", b="ne")}, 4) DESC, neighbor_id) AS rn
  FROM cand
) WHERE rn <= {_ANN_TOPK}
""",
    doc="IVF ANN top-k: coarse-quantizer assignment to 16 deterministic "
    "centroid lists, nprobe=2 probe join, exact cosine rerank — the "
    "inverted-file scale path next to X6's LSH.",
)
def x13_ann_ivf_topk(
    spark: SparkSession, sf_dir: str, *, base: DataFrame | None = None
) -> DataFrame:
    # norm precomputed once per vector — sqrt(dot(v, v)) over identical
    # operands is bit-identical wherever it is evaluated, so the oracle
    # (which recomputes it inline) still hash-matches. Composites pass
    # a prebuilt `base` so the exact ranker they compare against shares
    # the same materialization.
    e = (
        base.select("vec_id", "embedding", "nrm")
        if base is not None
        else _spark_base(spark, sf_dir)
    )
    cents = e.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c"),
        F.col("nrm").alias("cn"),
    )
    cos_raw = _dot(F.col("embedding"), F.col("c")) / F.nullif(
        F.col("nrm") * F.col("cn"), F.lit(0.0)
    )
    # payload dropped BEFORE the assignment window: the shuffle carries
    # (vec_id, cid, cc) ints+double, never 16 copies of the embedding
    scored = e.crossJoin(F.broadcast(cents)).select("vec_id", "cid", cos_raw.alias("cc"))
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cc"), F.asc("cid"))
    # top-nprobe rows only — (vec_id, cid, rn) ints; feeds BOTH the
    # corpus assignment (rn=1) and the probe lists — unpinned, the
    # 16-cosine-per-vector assignment window executed twice
    ranked = (
        scored.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= _N_PROBE)
        .select("vec_id", "cid", "rn")
        .localCheckpoint(eager=True)
    )
    assign = ranked.filter(F.col("rn") == 1).select("vec_id", "cid")
    probe_lists = (
        ranked.filter((F.col("vec_id") < _N_QUERY) & (F.col("rn") <= _N_PROBE))
        .select(F.col("vec_id").alias("query_id"), "cid")
    )
    probes = e.filter(F.col("vec_id") < _N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    # candidate mining on bare (query_id, neighbor_id); embeddings join
    # back late by id — at scale this is the only corpus-wide shuffle
    cand = (
        F.broadcast(probe_lists)
        .join(assign, "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .join(F.broadcast(probes), "query_id")
        .join(
            e.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("ne"),
                F.col("nrm").alias("nn"),
            ),
            "neighbor_id",
        )
    )
    cosine = F.round(
        _dot(F.col("qe"), F.col("ne"))
        / F.nullif(F.col("qn") * F.col("nn"), F.lit(0.0)),
        4,
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", cosine.alias("cosine"))
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= _ANN_TOPK)
        .select("query_id", "neighbor_id", "cosine")
    )


# ---------------------------------------------------------------------------
# X19 — int8 embedding quantization (symmetric, per-vector scale)
#
# The storage path for planet-scale embedding tables: 4x smaller than
# float32, with the per-vector max-abs scale kept alongside. Rounding
# is floor(x + 0.5) — explicit round-half-up, identical in both engines
# (never the engines' round(), whose half-tie behavior differs).
# Reconstruction error is reported per vector so the quality loss is
# observable, not assumed.
# ---------------------------------------------------------------------------


@register(
    "x19_embed_quantize_int8",
    oracle="""
WITH m AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         list_max(list_transform(CAST(embedding AS DOUBLE[]), v -> abs(v))) AS max_abs
  FROM embeddings
), q AS (
  SELECT vec_id, max_abs,
         CASE WHEN max_abs = 0 THEN CAST(0 AS DOUBLE) ELSE 127 / max_abs END AS scale,
         CASE WHEN max_abs = 0 THEN list_transform(e, v -> CAST(0 AS BIGINT))
              ELSE list_transform(e, v -> CAST(floor(v * (127 / max_abs) + 0.5) AS BIGINT))
         END AS qv,
         e
  FROM m
)
SELECT vec_id, scale, array_to_string(qv, '-') AS qv_str,
       list_reduce(list_transform(range(len(e)),
         i -> CASE WHEN scale = 0 THEN abs(e[i+1])
                   ELSE abs(e[i+1] - qv[i+1] / scale) END),
         (a, b) -> a + b) / len(e) AS mean_abs_err
FROM q
""",
    doc="Symmetric int8 quantization with per-vector scale: explicit "
    "floor(x+0.5) round-half-up (engine-neutral), quantized array and "
    "mean reconstruction error oracle-checked per vector.",
)
def x19_embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    m = e.select(
        "vec_id",
        F.expr("transform(embedding, v -> cast(v as double))").alias("e"),
    ).select(
        "vec_id",
        "e",
        F.expr("array_max(transform(e, v -> abs(v)))").alias("max_abs"),
    )
    q = m.select(
        "vec_id",
        "e",
        F.expr("case when max_abs = 0 then cast(0 as double) else 127 / max_abs end").alias(
            "scale"
        ),
        F.expr(
            "case when max_abs = 0 then transform(e, v -> cast(0 as bigint)) "
            "else transform(e, v -> cast(floor(v * (127 / max_abs) + 0.5) as bigint)) end"
        ).alias("qv"),
    )
    return q.select(
        "vec_id",
        "scale",
        # serialized to a scalar: the harness canon sorts/hashes cells,
        # and pandas cannot factorize list-valued cells
        F.expr("array_join(transform(qv, v -> cast(v as string)), '-')").alias(
            "qv_str"
        ),
        F.expr(
            "aggregate(transform(sequence(0, size(e)-1), "
            "i -> case when scale = 0 then abs(e[i]) else abs(e[i] - qv[i] / scale) end), "
            "cast(0 as double), (a, b) -> a + b) / size(e)"
        ).alias("mean_abs_err"),
    )


# ---------------------------------------------------------------------------
# X23 — k-means centroid refinement (2 Lloyd iterations, exact parity)
#
# x13's IVF uses deterministic seed centroids; a real deployment refines
# them with Lloyd iterations. Iterative floating-point k-means is not
# reproducible across engines (mean-of-doubles depends on reduction
# order), so this operator runs in FIXED-POINT: embeddings quantize to
# integers (floor(x·2^20) — exact: a double times a power of two only
# shifts the exponent), cluster sums are exact BIGINTs, and each
# centroid mean divides identical integer operands → identical doubles
# everywhere. Distances are left-folded squared-diff chains (the x5/x6
# fold-order contract). Assignment ties break on cid.
#
# Scale shape per iteration: assignment is a broadcast of ≤k centroid
# arrays (no shuffle of the corpus), recentering is one groupBy(cid,
# dim) over exploded dims — (int, int, long) rows, map-side combined.
# Output is the per-(cid, dim) refined mean + cluster size: 1024 scalar
# rows, canon-friendly.
# ---------------------------------------------------------------------------

_KM_SCALE = 1 << 20
_KM_K = _N_CENTROIDS  # reuse the IVF seed count


def _sqdist_spark(vcol: str, ccol: str) -> str:
    terms = [
        f"((cast({vcol}[{i}] as double) - {ccol}[{i}]) * "
        f"(cast({vcol}[{i}] as double) - {ccol}[{i}]))"
        for i in range(sim.EMBED_DIM)
    ]
    return "(" + " + ".join(terms) + ")"


def _sqdist_duck(vcol: str, ccol: str) -> str:
    terms = [
        f"((CAST({vcol}[{i + 1}] AS DOUBLE) - {ccol}[{i + 1}]) * "
        f"(CAST({vcol}[{i + 1}] AS DOUBLE) - {ccol}[{i + 1}]))"
        for i in range(sim.EMBED_DIM)
    ]
    return "(" + " + ".join(terms) + ")"


def _km_assign_spark(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """argmin_cid dist(v, c) via broadcast crossJoin + min-struct agg.

    The (dist ASC, cid ASC) rank-1 row of the former window is exactly
    MIN(STRUCT(dist, cid)) — dist is a null-free sum of squares, so the
    lexicographic struct minimum reproduces the tie-break bit-for-bit.
    The agg collapses the K rows per vector map-side (the crossJoin
    emits them contiguously), so the exchange carries n rows instead of
    n·K and the per-vector sort disappears (guide §2.3/§2.4).
    """
    d = F.expr(_sqdist_spark("q", "c"))
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id", "q", "cid", d.alias("dist")
    )
    return (
        scored.groupBy("vec_id", "q")
        .agg(
            F.min(F.struct(F.col("dist"), F.col("cid")))["cid"].alias("cid")
        )
        .select("vec_id", "q", "cid")
    )


def _km_recenter_spark(assign: DataFrame) -> DataFrame:
    """Exact integer recentering → DOUBLE centroid arrays."""
    by_dim = (
        assign.select("cid", F.posexplode("q").alias("dim", "val"))
        .groupBy("cid", "dim")
        .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
        .select(
            "cid", "dim", (F.col("s").cast("double") / F.col("n")).alias("m"), "n"
        )
    )
    return by_dim.groupBy("cid").agg(
        F.expr("transform(array_sort(collect_list(struct(dim, m))), x -> x.m)").alias(
            "c"
        ),
        F.max("n").alias("n_members"),
    )


def _km_duck_cte() -> str:
    """DuckDB twin of quantize → assign → recenter → assign → recenter."""
    q = (
        "list_transform(CAST(embedding AS DOUBLE[]), "
        f"x -> CAST(floor(x * {_KM_SCALE}) AS BIGINT))"
    )
    recenter = f"""
  {{out}} AS (
    SELECT cid, list(m ORDER BY dim) AS c, MAX(n) AS n_members
    FROM (
      SELECT cid, dim, CAST(SUM(val) AS DOUBLE) / COUNT(*) AS m, COUNT(*) AS n
      FROM (
        SELECT cid, d.dim AS dim, q[d.dim + 1] AS val
        FROM {{assign}} CROSS JOIN
             (SELECT unnest(range({sim.EMBED_DIM})) AS dim) d
      ) GROUP BY cid, dim
    ) GROUP BY cid
  )"""
    assign = """
  {out} AS (
    SELECT vec_id, q, cid FROM (
      SELECT v.vec_id, v.q, c.cid,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                ORDER BY {dist} ASC, c.cid) AS rn
      FROM qvecs v CROSS JOIN {cents} c
    ) WHERE rn = 1
  )"""
    return f"""
  qvecs AS (
    SELECT vec_id, {q} AS q FROM embeddings
  ), seeds AS (
    SELECT vec_id AS cid, list_transform(q, x -> CAST(x AS DOUBLE)) AS c
    FROM qvecs WHERE vec_id < {_KM_K}
  ),{assign.format(out="a1", cents="seeds", dist=_sqdist_duck("v.q", "c.c"))},
  {recenter.format(out="c1", assign="a1")},{assign.format(
        out="a2", cents="c1", dist=_sqdist_duck("v.q", "c.c")
    )},
  {recenter.format(out="c2", assign="a2")}"""


@register(
    "x23_kmeans_refine",
    oracle=f"""
WITH {_km_duck_cte()}
SELECT cid, n_members, d.dim AS dim, c[d.dim + 1] AS c_mean
FROM c2 CROSS JOIN (SELECT unnest(range({sim.EMBED_DIM})) AS dim) d
""",
    doc="Fixed-point k-means refinement of the IVF seed centroids: 2 "
    "Lloyd iterations with exact integer cluster sums (floor(x*2^20) "
    "quantization), broadcast assignment, tie-broken argmin — "
    "bit-identical centroid means across engines.",
)
def x23_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _spark_base(spark, sf_dir)
    qvecs = e.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> cast(floor(cast(x as double) * {_KM_SCALE}) as bigint))"
        ).alias("q"),
    ).localCheckpoint(eager=True)
    seeds = qvecs.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"),
        F.expr("transform(q, x -> cast(x as double))").alias("c"),
    )
    a1 = _km_assign_spark(qvecs, seeds)
    c1 = _km_recenter_spark(a1)
    a2 = _km_assign_spark(qvecs, c1.select("cid", "c"))
    c2 = _km_recenter_spark(a2)
    return c2.select(
        "cid", "n_members", F.posexplode("c").alias("dim", "c_mean")
    ).select("cid", "n_members", F.col("dim").cast("bigint").alias("dim"), "c_mean")


# ---------------------------------------------------------------------------
# X29 — SemDeDup-style semantic prune (cluster ∩ LSH bucket → cosine)
#
# Semantic dedup à la SemDeDup (Abbas et al. 2023): embeddings are
# clustered (the x23 fixed-point assignment over the x13 seed
# centroids), and within each cluster, pairs above a cosine threshold
# are pruned down to one survivor (lowest vec_id). Raw within-cluster
# all-pairs is quadratic in cluster size — the guard here intersects
# cluster membership with the x6 SRP-LSH buckets, so candidates are
# (same cluster AND same bucket), each bucket already capped at
# BUCKET_CAP. At 100 TB the knobs move together: more centroids keeps
# cluster occupancy flat, more LSH bits keeps bucket occupancy flat,
# and the candidate join still shuffles only (tbl, bucket, cid, id)
# ints. Output: each pruned vector with its best-keeper neighbor.
# ---------------------------------------------------------------------------

_X29_TAU = 0.3


@register(
    "x29_semdedup_prune",
    oracle=f"""
WITH {_duck_buckets_cte()},
qvecs AS (
  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
           x -> CAST(floor(x * {_KM_SCALE}) AS BIGINT)) AS q
  FROM embeddings
), seeds AS (
  SELECT vec_id AS cid, list_transform(q, x -> CAST(x AS DOUBLE)) AS c
  FROM qvecs WHERE vec_id < {_KM_K}
), assign AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {{dist}} ASC, c.cid) AS rn
    FROM qvecs v CROSS JOIN seeds c
  ) WHERE rn = 1
), ba AS (
  SELECT b.vec_id, b.tbl, b.bucket, a.cid
  FROM buckets b JOIN assign a USING (vec_id)
), cand AS (
  SELECT DISTINCT x.cid AS cid, x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM ba x JOIN ba y
    ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.cid = y.cid
   AND x.vec_id < y.vec_id
), scored AS (
  SELECT cid, vec_a, vec_b,
         {_DUCK_COSINE.format(a="ea.embedding", b="eb.embedding")} AS cosine
  FROM cand
  JOIN embeddings ea ON ea.vec_id = cand.vec_a
  JOIN embeddings eb ON eb.vec_id = cand.vec_b
)
SELECT cid, vec_a AS kept_id, vec_b AS pruned_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_b
                               ORDER BY cosine DESC, vec_a) AS rn
  FROM scored WHERE cosine >= {_X29_TAU}
) WHERE rn = 1
""".format(dist=_sqdist_duck("v.q", "c.c")),
    doc="SemDeDup-style semantic prune: fixed-point k-means cluster "
    "membership intersected with SRP-LSH buckets bounds the candidate "
    f"pairs; cosine >= {_X29_TAU} prunes to the lowest-id survivor.",
)
def x29_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs, b = _vec_index(spark, sf_dir)
    qvecs = vecs.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> cast(floor(cast(x as double) * {_KM_SCALE}) as bigint))"
        ).alias("q"),
    )
    seeds = qvecs.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"),
        F.expr("transform(q, x -> cast(x as double))").alias("c"),
    )
    assign = _km_assign_spark(qvecs, seeds).select("vec_id", "cid")
    # (tbl, bucket, cid, vec_id) ints; feeds BOTH candidate self-join
    # sides — unpinned, the k-means argmin (K distances per vector)
    # executed twice
    ba = b.join(assign, "vec_id").localCheckpoint(eager=True)
    x, y = ba.alias("x"), ba.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.tbl") == F.col("y.tbl"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.cid") == F.col("y.cid"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.cid").alias("cid"),
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
        )
        # ONE exchange for dedup + the final window (§2.4): hash-
        # partition on the window key FIRST — vec_b is a subset of the
        # distinct keys, so the dedup aggregate runs on that
        # partitioning without re-shuffling, and the vec_b window
        # reuses it. The old distinct().repartition("vec_a") shape paid
        # three exchanges (distinct keys, vec_a, then the window's
        # vec_b).
        .repartition(spark.sparkContext.defaultParallelism, "vec_b")
        .distinct()
    )
    # payload join-backs from the parquet scan (stats visible -> CBO
    # broadcasts when small, shuffles when huge); see _payload_sides
    aside, bside = _payload_sides(spark, sf_dir)
    cosine = F.round(
        _dot(F.col("ea"), F.col("eb"))
        / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
        4,
    )
    scored = (
        cand.join(aside, "vec_a")
        .join(bside, "vec_b")
        .select("cid", "vec_a", "vec_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= _X29_TAU)
    )
    w = Window.partitionBy("vec_b").orderBy(F.desc("cosine"), F.asc("vec_a"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cid",
            F.col("vec_a").alias("kept_id"),
            F.col("vec_b").alias("pruned_id"),
            "cosine",
        )
    )


# ---------------------------------------------------------------------------
# X38 — ANN recall audit (approximate vs exact, same run)
#
# The acceptance gate for any ANN rollout: what fraction of the TRUE
# top-k does the bucketed index return? Runs the exact ranker (x5) and
# the LSH ranker (x6) over the same probe set and reports per-probe
# recall@k. Cost is one brute-force pass over the bounded probe set —
# the audit is run on a sample at scale, never the full corpus, which
# is exactly what the bounded probe set models.
# ---------------------------------------------------------------------------

_RECALL_K = _ANN_TOPK  # compare at the ANN's own k


@register(
    "x38_ann_recall_audit",
    oracle=f"""
WITH {_duck_buckets_cte()},
aprobes AS (
  SELECT vec_id, tbl, bucket FROM buckets WHERE vec_id < {_N_QUERY}
),
acand AS (
  SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM aprobes p JOIN buckets c
    ON p.tbl = c.tbl AND p.bucket = c.bucket AND p.vec_id <> c.vec_id
),
ascored AS (
  SELECT query_id, neighbor_id,
         {_DUCK_COSINE.format(a="q.embedding", b="e.embedding")} AS cosine
  FROM acand
  JOIN embeddings q ON q.vec_id = acand.query_id
  JOIN embeddings e ON e.vec_id = acand.neighbor_id
),
ann AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rn
    FROM ascored
  ) WHERE rn <= {_RECALL_K}
),
eprobes AS (
  SELECT vec_id AS query_id, embedding AS q
  FROM embeddings WHERE vec_id < {_N_QUERY}
),
escored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
         ROUND(list_dot_product(p.q, e.embedding)
               / NULLIF(sqrt(list_dot_product(p.q, p.q))
                        * sqrt(list_dot_product(e.embedding, e.embedding)), 0),
               4) AS cosine
  FROM eprobes p, embeddings e
  WHERE e.vec_id <> p.query_id
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rn
    FROM escored
  ) WHERE rn <= {_RECALL_K}
)
SELECT x.query_id,
       CAST(COUNT(a.neighbor_id) AS BIGINT) AS ann_hits,
       ROUND(COUNT(a.neighbor_id) / {_RECALL_K}.0, 4) AS recall_at_k
FROM exact x
LEFT JOIN ann a
  ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
GROUP BY x.query_id
ORDER BY x.query_id
""",
    doc=f"ANN quality audit: recall@{_RECALL_K} of the LSH-bucketed "
    "ranker (x6) against the exact cosine ranker (x5) per probe — the "
    "acceptance metric for trading exactness for bucket pruning.",
)
def x38_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE featurization AND one scoring pass for both rankers: every
    # LSH candidate pair is a subset of the exact ranker's probe-pair
    # set, so both arms derive from a single scored relation — the
    # cosine arithmetic runs once per (probe, neighbor) pair, never
    # once per arm. Identical expressions on identical rows keep the
    # arms bit-equal to standalone x5/x6 (the oracle mirrors both).
    vecs, buckets = _vec_index(spark, sf_dir)
    scored = _probe_pair_scores(vecs.select("vec_id", "embedding", "nrm"))
    pb = buckets.filter(F.col("vec_id") < _N_QUERY).select(
        F.col("vec_id").alias("query_id"), "tbl", "bucket"
    )
    # candidate set is probe-bounded (≤ N_QUERY × tables × BUCKET_CAP
    # pairs by construction) — broadcast it as a membership flag
    cand = (
        F.broadcast(pb)
        .join(buckets, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
        .withColumn("is_cand", F.lit(1))
    )
    # Both arms in ONE window pass over the flagged pairs: rank among
    # all pairs = the exact ranker; rank among candidate pairs = the
    # LSH ranker (ordering candidates first makes row_number 1..m over
    # them — identical to ranking the candidate-only relation). Both
    # windows and the groupBy share the query_id partitioning, so the
    # whole audit is one shuffle of (probe, neighbor) id pairs.
    flagged = scored.join(F.broadcast(cand), ["query_id", "neighbor_id"], "left")
    w_exact = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    w_cand = Window.partitionBy("query_id").orderBy(
        F.desc(F.coalesce("is_cand", F.lit(0))),
        F.desc("cosine"),
        F.asc("neighbor_id"),
    )
    hit = (
        (F.col("is_cand") == 1) & (F.row_number().over(w_cand) <= _ANN_TOPK)
    ).cast("int")
    return (
        flagged.select(
            "query_id",
            F.row_number().over(w_exact).alias("xr"),
            hit.alias("hit"),
        )
        .filter(F.col("xr") <= _RECALL_K)
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("ann_hits"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))) / float(_RECALL_K), 4
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# X41 — IVF recall audit (the x38 audit for the inverted-file path)
#
# Same acceptance metric, other index: recall@k of the nprobe=2 IVF
# ranker (x13) against the exact ranker. Together with x38 this gives
# the recall-per-index-family table an ANN rollout decision needs.
# ---------------------------------------------------------------------------


@register(
    "x41_ivf_recall_audit",
    oracle=f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS c FROM embeddings WHERE vec_id < {_N_CENTROIDS}
), assign AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, cents.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_DUCK_COS_RAW.format(a="e.embedding", b="cents.c")} DESC, cents.cid) AS rn
    FROM embeddings e CROSS JOIN cents
  ) WHERE rn = 1
), probe_lists AS (
  SELECT query_id, cid FROM (
    SELECT p.vec_id AS query_id, cents.cid,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id
                              ORDER BY {_DUCK_COS_RAW.format(a="p.embedding", b="cents.c")} DESC, cents.cid) AS rn
    FROM embeddings p CROSS JOIN cents WHERE p.vec_id < {_N_QUERY}
  ) WHERE rn <= {_N_PROBE}
), icand AS (
  SELECT pl.query_id, a.vec_id AS neighbor_id, q.embedding AS qe, a.embedding AS ne
  FROM probe_lists pl
  JOIN assign a ON a.cid = pl.cid
  JOIN embeddings q ON q.vec_id = pl.query_id
  WHERE a.vec_id <> pl.query_id
), ivf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ROUND({_DUCK_COS_RAW.format(a="qe", b="ne")}, 4) DESC, neighbor_id) AS rn
    FROM icand
  ) WHERE rn <= {_ANN_TOPK}
),
eprobes AS (
  SELECT vec_id AS query_id, embedding AS q
  FROM embeddings WHERE vec_id < {_N_QUERY}
),
escored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
         ROUND(list_dot_product(p.q, e.embedding)
               / NULLIF(sqrt(list_dot_product(p.q, p.q))
                        * sqrt(list_dot_product(e.embedding, e.embedding)), 0),
               4) AS cosine
  FROM eprobes p, embeddings e
  WHERE e.vec_id <> p.query_id
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rn
    FROM escored
  ) WHERE rn <= {_ANN_TOPK}
)
SELECT x.query_id,
       CAST(COUNT(i.neighbor_id) AS BIGINT) AS ivf_hits,
       ROUND(COUNT(i.neighbor_id) / {_ANN_TOPK}.0, 4) AS recall_at_k
FROM exact x
LEFT JOIN ivf i
  ON i.query_id = x.query_id AND i.neighbor_id = x.neighbor_id
GROUP BY x.query_id
ORDER BY x.query_id
""",
    doc=f"IVF quality audit: recall@{_ANN_TOPK} of the nprobe={_N_PROBE} "
    "inverted-file ranker (x13) against the exact cosine ranker — "
    "together with x38 this is the recall-per-index-family comparison "
    "an ANN rollout decides on.",
)
def x41_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one featurization and one scoring pass for both arms (x38 shape):
    # IVF candidates are a subset of the probe-pair set, so the exact
    # ranker and the IVF ranker derive from the same scored relation
    base = _spark_base(spark, sf_dir)
    scored = _probe_pair_scores(base)
    cents = base.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c"),
        F.col("nrm").alias("cn"),
    )
    cos_raw = _dot(F.col("embedding"), F.col("c")) / F.nullif(
        F.col("nrm") * F.col("cn"), F.lit(0.0)
    )
    # payload dropped before the assignment window (x13 shape): the
    # shuffle carries (vec_id, cid, cc) ints+double only
    ranked = (
        base.crossJoin(F.broadcast(cents))
        .select("vec_id", "cid", cos_raw.alias("cc"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("cc"), F.asc("cid"))
            ),
        )
    )
    assign = ranked.filter(F.col("rn") == 1).select("vec_id", "cid")
    probe_lists = ranked.filter(
        (F.col("vec_id") < _N_QUERY) & (F.col("rn") <= _N_PROBE)
    ).select(F.col("vec_id").alias("query_id"), "cid")
    # candidate membership = "neighbor's centroid is one of the query's
    # probed lists". An IVF list is corpus/nlists vectors — unbounded,
    # so the candidate PAIRS are never materialized or broadcast;
    # instead the neighbor's cid joins in by id and the probe→list map
    # (N_QUERY × nprobe rows, genuinely tiny) broadcasts as the flag.
    flagged = scored.join(
        assign.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
    ).join(
        F.broadcast(probe_lists.withColumn("is_cand", F.lit(1))),
        ["query_id", "cid"],
        "left",
    )
    w_exact = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    w_cand = Window.partitionBy("query_id").orderBy(
        F.desc(F.coalesce("is_cand", F.lit(0))),
        F.desc("cosine"),
        F.asc("neighbor_id"),
    )
    hit = (
        (F.col("is_cand") == 1) & (F.row_number().over(w_cand) <= _ANN_TOPK)
    ).cast("int")
    return (
        flagged.select(
            "query_id",
            F.row_number().over(w_exact).alias("xr"),
            hit.alias("hit"),
        )
        .filter(F.col("xr") <= _ANN_TOPK)
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("ivf_hits"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))) / float(_ANN_TOPK), 4
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# X42 — IVF nprobe sweep (recall/cost tuning table)
#
# The actual tuning decision behind x41: how much recall does each
# extra probed list buy, and at what candidate volume? Centroid
# assignment and probe-list ranking are computed ONCE; each nprobe row
# is only a different rank cutoff over the same relation. Output: one
# row per nprobe with total candidates (cost proxy) and mean recall@k
# across the probe set.
# ---------------------------------------------------------------------------

_SWEEP_PROBES = (1, 2, 4)


def _ivf_sweep_oracle() -> str:
    head = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS c FROM embeddings WHERE vec_id < {_N_CENTROIDS}
), assign AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, cents.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_DUCK_COS_RAW.format(a="e.embedding", b="cents.c")} DESC, cents.cid) AS rn
    FROM embeddings e CROSS JOIN cents
  ) WHERE rn = 1
), pranked AS (
  SELECT p.vec_id AS query_id, cents.cid,
         ROW_NUMBER() OVER (PARTITION BY p.vec_id
                            ORDER BY {_DUCK_COS_RAW.format(a="p.embedding", b="cents.c")} DESC, cents.cid) AS rn
  FROM embeddings p CROSS JOIN cents WHERE p.vec_id < {_N_QUERY}
), eprobes AS (
  SELECT vec_id AS query_id, embedding AS q
  FROM embeddings WHERE vec_id < {_N_QUERY}
), escored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
         ROUND(list_dot_product(p.q, e.embedding)
               / NULLIF(sqrt(list_dot_product(p.q, p.q))
                        * sqrt(list_dot_product(e.embedding, e.embedding)), 0),
               4) AS cosine
  FROM eprobes p, embeddings e
  WHERE e.vec_id <> p.query_id
), exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rn
    FROM escored
  ) WHERE rn <= {_ANN_TOPK}
)"""
    arms = []
    for np_ in _SWEEP_PROBES:
        head += f""",
cand{np_} AS (
  SELECT pl.query_id, a.vec_id AS neighbor_id, q.embedding AS qe, a.embedding AS ne
  FROM (SELECT query_id, cid FROM pranked WHERE rn <= {np_}) pl
  JOIN assign a ON a.cid = pl.cid
  JOIN embeddings q ON q.vec_id = pl.query_id
  WHERE a.vec_id <> pl.query_id
),
ivf{np_} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ROUND({_DUCK_COS_RAW.format(a="qe", b="ne")}, 4) DESC, neighbor_id) AS rn
    FROM cand{np_}
  ) WHERE rn <= {_ANN_TOPK}
)"""
        arms.append(f"""
SELECT {np_} AS nprobe,
       (SELECT COUNT(*) FROM cand{np_}) AS total_candidates,
       ROUND((SELECT COUNT(*) FROM exact x JOIN ivf{np_} i
              ON i.query_id = x.query_id AND i.neighbor_id = x.neighbor_id)
             / ({_N_QUERY} * {_ANN_TOPK}.0), 4) AS mean_recall""")
    return head + "\n" + "\nUNION ALL".join(arms) + "\nORDER BY nprobe"


@register(
    "x42_ivf_nprobe_sweep",
    oracle=_ivf_sweep_oracle(),
    doc="IVF tuning table: candidate volume (cost proxy) and mean "
    f"recall@{_ANN_TOPK} per nprobe in {_SWEEP_PROBES} — assignment "
    "and probe ranking computed once, each row only a rank cutoff.",
)
def x42_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the session index cache materializes (vec, norm) once — the sweep
    # and the exact arm both read it, nothing re-scans the corpus
    e = _spark_base(spark, sf_dir)
    cents = e.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c"),
        F.col("nrm").alias("cn"),
    )
    cos_raw = _dot(F.col("embedding"), F.col("c")) / F.nullif(
        F.col("nrm") * F.col("cn"), F.lit(0.0)
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", cos_raw.alias("cc")
    )
    # Corpus assignment = rank-1 of (cc DESC NULLS LAST, cid ASC), which
    # is MIN(STRUCT(coalesce(-cc, +inf), cid)) exactly (cc is null only
    # for zero-norm vectors; +inf reproduces NULLS LAST). The agg
    # collapses the 16 centroid rows per vector map-side — the former
    # full-corpus window shuffled and sorted n·16 rows and cached them.
    assign = scored.groupBy("vec_id").agg(
        F.min(
            F.struct(
                F.coalesce(-F.col("cc"), F.lit(float("inf"))).alias("o"),
                F.col("cid").alias("cid"),
            )
        )["cid"].alias("cid")
    )
    probes = e.filter(F.col("vec_id") < _N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    w_exact = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    exact = (
        # the exact arm scores the same corpus — reuse the cached e
        # instead of re-scanning + re-norming it inside x5. Consumed
        # by exactly ONE join below, so it stays lazy: the r11 .cache()
        # added a materialization barrier (plus an unpersist and an
        # eager output checkpoint to sequence it) for a relation that
        # is never reused — three extra jobs per invocation (§5:
        # persist only when reuse outweighs the pressure).
        x5_cosine_topk(spark, sf_dir, vecs=e)
        .withColumn("rn", F.row_number().over(w_exact))
        .filter(F.col("rn") <= _ANN_TOPK)
        .select("query_id", "neighbor_id")
    )
    # Sweep arms as DATA, not a driver loop: each (query, neighbor)
    # candidate pair enters the sweep at the rank its neighbor's
    # centroid holds in the query's probe ranking, so a broadcast
    # non-equi join against the tiny arms relation fans each pair out
    # to every nprobe that includes it. One cosine per pair, one
    # window pass for all arms, ONE action total (the old shape ran
    # 2 actions per arm plus per-arm cosine recompute).
    max_np = max(_SWEEP_PROBES)
    # probe-list ranking only needs the _N_QUERY probe vectors: rank
    # that tiny slice with a window instead of windowing the corpus
    w_probe = Window.partitionBy("vec_id").orderBy(F.desc("cc"), F.asc("cid"))
    pl = (
        scored.filter(F.col("vec_id") < _N_QUERY)
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= max_np)
        .select(
            F.col("vec_id").alias("query_id"), "cid", F.col("rn").alias("entry")
        )
    )
    pairs = (
        F.broadcast(pl)
        .join(assign, "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "entry")
    )
    cosine = F.round(
        _dot(F.col("qe"), F.col("ne"))
        / F.nullif(F.col("qn") * F.col("nn"), F.lit(0.0)),
        4,
    )
    # Pinned: the per-pair cosine relation feeds BOTH output branches
    # (recall hits AND total-candidate counts) — unpinned, the join +
    # dot-product subtree executed twice. nprobe-bounded candidate
    # rows of 4 scalars each, far smaller than the corpus.
    scored_pairs = (
        pairs.join(F.broadcast(probes), "query_id")
        .join(
            e.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("ne"),
                F.col("nrm").alias("nn"),
            ),
            "neighbor_id",
        )
        .select("query_id", "neighbor_id", "entry", cosine.alias("cosine"))
        .localCheckpoint(eager=True)
    )
    arms = spark.createDataFrame(
        [(int(k),) for k in _SWEEP_PROBES], "nprobe int"
    )
    armed = scored_pairs.join(
        F.broadcast(arms), F.col("entry") <= F.col("nprobe")
    )
    w_arm = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    hits = (
        armed.withColumn("rn2", F.row_number().over(w_arm))
        .filter(F.col("rn2") <= _ANN_TOPK)
        .join(exact, ["query_id", "neighbor_id"])
        .groupBy("nprobe")
        .agg(F.count("*").alias("hits"))
    )
    out = (
        armed.groupBy("nprobe")
        .agg(F.count("*").alias("total_candidates"))
        .join(hits, "nprobe", "left")
        .select(
            "nprobe",
            F.col("total_candidates").cast("bigint").alias("total_candidates"),
            F.round(
                F.coalesce(F.col("hits"), F.lit(0))
                / F.lit(_N_QUERY * float(_ANN_TOPK)),
                4,
            ).alias("mean_recall"),
        )
        .orderBy("nprobe")
    )
    return out


# ---------------------------------------------------------------------------
# X51 — embedding batch health check
#
# The validation gate before vectors reach an index or trainer: count
# zero/near-zero vectors and norm outliers, and profile the norm
# distribution. Norms reuse x5's deterministic left-fold dot product;
# aggregate sums run over ROUND(norm*1e6) BIGINTs so the totals are
# order-independent — never a raw double sum across partitions.
# ---------------------------------------------------------------------------

_X51_LOW = 0.5  # norm below → suspicious (near-zero / truncated)
_X51_HIGH = 12.0  # norm above → suspicious (unnormalized / corrupt)


@register(
    "x51_embedding_health",
    oracle=f"""
WITH norms AS (
  SELECT vec_id,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
), q AS (
  SELECT vec_id, nrm, CAST(ROUND(nrm * 1e6) AS BIGINT) AS nrm_micro
  FROM norms
)
SELECT COUNT(*) AS n_vecs,
       CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       CAST(SUM(CASE WHEN nrm > 0 AND nrm < {_X51_LOW} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_norm,
       CAST(SUM(CASE WHEN nrm > {_X51_HIGH} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high_norm,
       CAST(MIN(nrm_micro) AS BIGINT) AS min_norm_micro,
       CAST(MAX(nrm_micro) AS BIGINT) AS max_norm_micro,
       CAST(SUM(nrm_micro) AS DOUBLE) / COUNT(*) AS avg_norm_micro
FROM q
""",
    doc="Embedding batch health: zero-vector and norm-outlier counts "
    "plus a micro-quantized norm profile (BIGINT sums, order-"
    "independent) — the gate before vectors reach an index.",
)
def x51_embedding_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _spark_base(spark, sf_dir)
    nrm = F.col("nrm")
    q = e.select(
        nrm.alias("nrm"),
        F.round(nrm * 1e6).cast("bigint").alias("nrm_micro"),
    )
    return q.agg(
        F.count("*").alias("n_vecs"),
        F.sum(F.when(F.col("nrm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero"),
        F.sum(
            F.when((F.col("nrm") > 0) & (F.col("nrm") < _X51_LOW), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_low_norm"),
        F.sum(F.when(F.col("nrm") > _X51_HIGH, 1).otherwise(0))
        .cast("bigint")
        .alias("n_high_norm"),
        F.min("nrm_micro").cast("bigint").alias("min_norm_micro"),
        F.max("nrm_micro").cast("bigint").alias("max_norm_micro"),
        (F.sum("nrm_micro").cast("double") / F.count("*")).alias("avg_norm_micro"),
    )


# ---------------------------------------------------------------------------
# X62 — hard-negative mining for contrastive training
#
# Embedding-model training data needs hard negatives: pairs the coarse
# retrieval space confuses (same SRP-LSH bucket — a retriever would
# surface one for the other) that are semantically NOT matches
# (different label, low exact cosine). Random negatives are too easy;
# all-pairs mining is quadratic. Bucket-collision candidates reuse x6's
# exact machinery — the id-pair shuffle never carries payloads — and
# the label filter + low-cosine tail selects the confusable non-matches
# (RocketQA/ANCE-style mining, hash-bucket flavored).
# ---------------------------------------------------------------------------

_HARDNEG_MAX = 0.2  # exact-cosine ceiling: below = semantically far
_HARDNEG_PER_ANCHOR = 5  # hardest negatives kept per anchor


@register(
    "x62_hard_negatives",
    oracle=f"""
WITH {{bcte}},
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckets a JOIN buckets b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b,
       CAST(ea.label AS INT) AS label_a,
       CAST(eb.label AS INT) AS label_b,
       {{cosexpr}} + 0.0 AS cosine
FROM cand
JOIN embeddings ea ON ea.vec_id = cand.vec_a
JOIN embeddings eb ON eb.vec_id = cand.vec_b
WHERE ea.label <> eb.label
  AND {{cosexpr}} <= {_HARDNEG_MAX}
QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_a
                           ORDER BY {{cosexpr}} DESC, vec_b) <= {_HARDNEG_PER_ANCHOR}
ORDER BY vec_a, vec_b
""".format(
        bcte=_duck_buckets_cte(),
        cosexpr=_DUCK_COSINE.format(a="ea.embedding", b="eb.embedding"),
    ),
    doc=f"Contrastive hard negatives: SRP-LSH bucket collisions with "
    f"different labels and exact cosine ≤ {_HARDNEG_MAX} — the "
    "confusable non-matches an embedding trainer should sample; "
    "id-pair candidate shuffle, payloads join back late (x6 shape).",
)
def x62_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs, b = _vec_index(spark, sf_dir)
    # payload sides come from the parquet scan, not the checkpointed
    # index: the scan carries size stats, so Catalyst broadcasts these
    # joins at small corpora and falls back to shuffle joins at scale —
    # a stats-less checkpoint leaf forces sort-merge everywhere. The
    # norm expression is identical, so bit-parity with the oracle holds.
    lab = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        F.col("label").cast("int").alias("label"),
    )
    # labels ride the bucket postings (3 ints + label) so the
    # cross-label requirement prunes candidate pairs BEFORE the
    # payload join and the 64-term cosine chain — near-dup buckets
    # concentrate same-label vectors, so most collisions die here
    bl = b.join(lab.select("vec_id", "label"), "vec_id")
    a, c = bl.alias("a"), bl.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.tbl") == F.col("c.tbl"))
            & (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.vec_id") < F.col("c.vec_id"))
            & (F.col("a.label") != F.col("c.label")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("c.vec_id").alias("vec_b"),
            F.col("a.label").alias("label_a"),
            F.col("c.label").alias("label_b"),
        )
        # ONE exchange for dedup + the top-N window (§2.4): partition
        # on the window key (vec_a ⊂ distinct keys) BEFORE the dedup
        # aggregate, so distinct runs without another shuffle and the
        # vec_a window reuses the partitioning — was two exchanges.
        .repartition(spark.sparkContext.defaultParallelism, "vec_a")
        .distinct()
    )
    aside = lab.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    bside = lab.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    # + 0.0 folds IEEE negative zero into +0.0 — the low-cosine tail
    # otherwise rounds to -0.0 under one engine's formatting and 0.0
    # under the other's.
    cosine = F.round(
        _dot(F.col("ea"), F.col("eb"))
        / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
        4,
    ) + F.lit(0.0)
    return (
        cand.join(aside, "vec_a")
        .join(bside, "vec_b")
        .select("vec_a", "vec_b", "label_a", "label_b", cosine.alias("cosine"))
        .filter(F.col("cosine") <= _HARDNEG_MAX)
        # hardest (closest-to-boundary) N per anchor: the pairs an
        # embedding trainer actually samples, and the output stays
        # anchor-bounded at any corpus size
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_a").orderBy(F.desc("cosine"), "vec_b")
            ),
        )
        .filter(F.col("rn") <= _HARDNEG_PER_ANCHOR)
        .drop("rn")
        .orderBy("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# X63 — embedding feature covariance (whitening / PCA preparation)
#
# The one-pass statistic every embedding-space analysis starts from:
# the dim×dim covariance of the corpus (whitening, PCA, OOD scoring,
# feature-collapse detection all consume it). The distributed shape is
# the point — each vector explodes to its (dim, value) pairs, the
# per-vector self-join emits the upper-triangle products (2080 rows
# per vector at 64 dims, partitioned by vec_id so the join never
# shuffles payloads), and one groupBy((di, dj)) reduces across the
# corpus with map-side partial aggregation. Values quantize to
# milli-units so every sum is an exact BIGINT; the unnormalized
# covariance numerator n·Σxy − Σx·Σy stays integer end-to-end
# (comfortably inside BIGINT through sf100) — no float summation
# order anywhere.
# ---------------------------------------------------------------------------

_COV_TOPK = 20


@register(
    "x63_embed_covariance",
    oracle=f"""
WITH q AS (
  SELECT vec_id, d.dim AS dim,
         CAST(ROUND(CAST(embedding[d.dim + 1] AS DOUBLE) * 1000) AS BIGINT)
           AS qv
  FROM embeddings CROSS JOIN (SELECT unnest(range({sim.EMBED_DIM})) AS dim) d
), n AS (
  SELECT COUNT(DISTINCT vec_id) AS n FROM q
), sums AS (
  SELECT dim, CAST(SUM(qv) AS BIGINT) AS sx FROM q GROUP BY dim
), prods AS (
  SELECT a.dim AS di, b.dim AS dj, CAST(SUM(a.qv * b.qv) AS BIGINT) AS sxy
  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.dim <= b.dim
  GROUP BY a.dim, b.dim
)
SELECT CAST(di AS INT) AS di, CAST(dj AS INT) AS dj,
       CAST(n.n * sxy - sa.sx * sb.sx AS BIGINT) AS cov_num
FROM prods
JOIN sums sa ON sa.dim = di
JOIN sums sb ON sb.dim = dj
CROSS JOIN n
ORDER BY abs(n.n * sxy - sa.sx * sb.sx) DESC, di, dj
LIMIT {_COV_TOPK}
""",
    doc=f"Top-{_COV_TOPK} covariance entries of the embedding feature "
    "space (unnormalized integer numerator n·Σxy − Σx·Σy in "
    "milli-unit² — exact BIGINT, no float sums). Per-vector "
    "upper-triangle product explode, one corpus-wide reduce.",
)
def x63_embed_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-vector quantized array, pinned once: the n/sums/prods branches
    # all read it. The upper-triangle products are emitted PER ROW (one
    # flatten'd 2080-entry struct array per vector) and reduced by one
    # map-side-partial groupBy((di, dj)) — the former per-vector explode
    # self-join shuffled n·64 rows to both SMJ sides and sorted them;
    # this shape shuffles only ≤2080 partial rows per task (guide §2.3/
    # §2.4: aggregate before the shuffle, remove the join outright).
    e = table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    base = e.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))"
        ).alias("qa"),
    ).localCheckpoint(eager=True)
    n = base.agg(F.count_distinct("vec_id")).first()[0]
    sums = (
        base.select(F.posexplode("qa").alias("dim", "qv"))
        .groupBy("dim")
        .agg(F.sum("qv").cast("bigint").alias("sx"))
    )
    tri = F.expr(
        f"flatten(transform(sequence(0, {sim.EMBED_DIM - 1}), i -> "
        f"transform(sequence(i, {sim.EMBED_DIM - 1}), j -> "
        "struct(i as di, j as dj, qa[i] * qa[j] as p))))"
    )
    prods = (
        base.select(F.explode(tri).alias("t"))
        .groupBy(F.col("t.di").alias("di"), F.col("t.dj").alias("dj"))
        .agg(F.sum("t.p").cast("bigint").alias("sxy"))
    )
    sa = sums.select(F.col("dim").alias("di"), F.col("sx").alias("sxa"))
    sb = sums.select(F.col("dim").alias("dj"), F.col("sx").alias("sxb"))
    cov = F.lit(n) * F.col("sxy") - F.col("sxa") * F.col("sxb")
    return (
        prods.join(F.broadcast(sa), "di")
        .join(F.broadcast(sb), "dj")
        .select(
            F.col("di").cast("int").alias("di"),
            F.col("dj").cast("int").alias("dj"),
            cov.cast("bigint").alias("cov_num"),
        )
        .orderBy(F.abs(F.col("cov_num")).desc(), "di", "dj")
        .limit(_COV_TOPK)
    )


# ---------------------------------------------------------------------------
# X69 — kNN label agreement (embedding-quality eval)
#
# The curation question behind every embedding column: do nearby
# vectors share labels? A collapsed or shuffled embedding scores ~at
# chance; a healthy one scores high. Protocol: 10% deterministic probe
# sample (vec_id % 10), exact top-5 cosine neighbors (rank on the
# 4-dp-rounded cosine with id tiebreak, x5's convention), per-label
# mean agreement as exact-integer matched/(5·n) division. At corpus
# scale the candidate set comes from the ANN index (x6/x13/x64)
# instead of the cross join — the eval math is unchanged; the probe
# side is sampled and broadcast, so the pass is one corpus scan.
# ---------------------------------------------------------------------------

_X69_K = 5


@register(
    "x69_knn_label_eval",
    oracle=f"""
WITH probes AS (
  SELECT vec_id AS probe_id, embedding AS q, label AS probe_label
  FROM embeddings WHERE vec_id % 10 = 0
), scored AS (
  SELECT p.probe_id, p.probe_label, e.vec_id AS neighbor_id,
         e.label AS neighbor_label,
         ROUND({_DUCK_COS_RAW.format(a="p.q", b="e.embedding")}, 4) AS cosine
  FROM probes p JOIN embeddings e ON e.vec_id <> p.probe_id
), knn AS (
  SELECT probe_id, probe_label, neighbor_label FROM (
    SELECT probe_id, probe_label, neighbor_label,
           ROW_NUMBER() OVER (PARTITION BY probe_id
                              ORDER BY cosine DESC, neighbor_id) AS rn
    FROM scored
  ) WHERE rn <= {_X69_K}
), per_probe AS (
  SELECT probe_id, probe_label,
         SUM(CASE WHEN neighbor_label = probe_label THEN 1 ELSE 0 END) AS matched
  FROM knn GROUP BY probe_id, probe_label
)
SELECT probe_label AS label,
       COUNT(*) AS n_probes,
       CAST(SUM(matched) AS BIGINT) AS matched_neighbors,
       ROUND(CAST(SUM(matched) AS DOUBLE) / (COUNT(*) * {_X69_K}), 4)
         AS agreement
FROM per_probe
GROUP BY probe_label
ORDER BY probe_label
""",
    doc=f"Embedding-quality eval: top-{_X69_K} exact-cosine neighbors "
    "of a 10% deterministic probe sample, per-label mean "
    "neighbor-label agreement (collapse/shuffle detector; ANN "
    "candidates replace the cross join at corpus scale).",
)
def x69_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The session index already materializes (vec_id, embedding, label,
    # nrm) once per corpus — read it instead of re-scanning, re-norming
    # and re-pinning the corpus per run (the amortization every other
    # embedding ranker uses; norm expression identical, so oracle
    # parity holds).
    vecs, _ = _vec_index(spark, sf_dir)
    e = vecs.select("vec_id", "embedding", "label", "nrm")
    probes = e.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("q"),
        F.col("label").alias("probe_label"),
        F.col("nrm").alias("qn"),
    )
    joined = e.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
    num = _dot(F.col("q"), F.col("embedding"))
    den = F.nullif(F.col("qn") * F.col("nrm"), F.lit(0.0))
    scored = joined.select(
        "probe_id",
        "probe_label",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.round(num / den, 4).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    knn = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _X69_K
    )
    per_probe = knn.groupBy("probe_id", "probe_label").agg(
        F.sum(
            F.when(F.col("neighbor_label") == F.col("probe_label"), 1).otherwise(0)
        ).alias("matched")
    )
    return (
        per_probe.groupBy(F.col("probe_label").alias("label"))
        .agg(
            F.count("*").alias("n_probes"),
            F.sum("matched").cast("bigint").alias("matched_neighbors"),
            F.round(
                F.sum("matched").cast("double")
                / (F.count("*") * _X69_K),
                4,
            ).alias("agreement"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# X76 — Johnson–Lindenstrauss projection + distortion audit
#
# Dimensionality reduction as a DISTRIBUTED MATRIX MULTIPLY: project
# every embedding from 64 to 16 dims with a deterministic ±1 random
# matrix (Achlioptas), expressed relationally — explode the vector to
# (vec_id, dim, val), join the broadcast (dim, j, sign) matrix, group
# by (vec_id, j) — the join-aggregate form that scales to any corpus
# and any d×k (never a d·k-term codegen expression). Everything is
# exact: embeddings quantize to ints (floor(x·2²⁰), the x23 contract),
# signs are ±1 from md5, so projections are BIGINT sums.
#
# The audit is the JL lemma's promise: pairwise squared distances on
# the probe set, original vs projected/k, ratio ≈ 1. Both distances
# are exact BIGINT quadratics; the ratio divides identical operands.
# ---------------------------------------------------------------------------

_JL_K = 16
_JL_QSCALE = 1 << 20


@register(
    "x76_jl_projection_audit",
    oracle=f"""
WITH q AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * {_JL_QSCALE}) AS BIGINT)) AS qv
  FROM embeddings WHERE vec_id < {_N_QUERY}
), flat AS (
  SELECT vec_id, d.dim AS dim, qv[d.dim + 1] AS val
  FROM q CROSS JOIN (SELECT unnest(range({sim.EMBED_DIM})) AS dim) d
), r AS (
  SELECT dim, j,
         1 - 2 * ({{h}} % 2) AS sign
  FROM (SELECT unnest(range({sim.EMBED_DIM})) AS dim) dd
  CROSS JOIN (SELECT unnest(range({_JL_K})) AS j) jj
), proj AS (
  SELECT f.vec_id, r.j, CAST(SUM(f.val * r.sign) AS BIGINT) AS p
  FROM flat f JOIN r ON r.dim = f.dim
  GROUP BY f.vec_id, r.j
), pd AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         SUM((a.p - b.p) * (a.p - b.p)) AS d2_proj
  FROM proj a JOIN proj b ON a.j = b.j AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
), od AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         SUM((a.val - b.val) * (a.val - b.val)) AS d2_orig
  FROM flat a JOIN flat b ON a.dim = b.dim AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT od.va AS vec_a, od.vb AS vec_b,
       CAST(od.d2_orig AS BIGINT) AS d2_orig,
       CAST(pd.d2_proj AS BIGINT) AS d2_proj,
       CAST(pd.d2_proj AS DOUBLE) / {_JL_K} / NULLIF(od.d2_orig, 0)
         AS distortion_ratio
FROM od JOIN pd ON pd.va = od.va AND pd.vb = od.vb
ORDER BY vec_a, vec_b
""".format(
        h=__import__(
            "calaveras_uniteus_etl_spark.functions.hashing",
            fromlist=["duckdb_md5_long_sql"],
        ).duckdb_md5_long_sql(
            "'jl:' || CAST(dim AS VARCHAR) || ':' || CAST(j AS VARCHAR)"
        )
    ),
    doc=f"JL/Achlioptas ±1 projection 64→{_JL_K} as a relational "
    "matrix multiply (explode → broadcast sign join → group), exact "
    "BIGINT projections from quantized embeddings, pairwise "
    "distance-distortion audit on the probe set (ratio ≈ 1).",
)
def x76_jl_projection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.functions.hashing import md5_long

    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _N_QUERY)
    q = e.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> cast(floor(cast(x as double) * {_JL_QSCALE}) as bigint))"
        ).alias("qv"),
    )
    flat = q.select("vec_id", F.posexplode("qv").alias("dim", "val"))
    dims = spark.range(sim.EMBED_DIM).select(F.col("id").cast("int").alias("dim"))
    js = spark.range(_JL_K).select(F.col("id").cast("int").alias("j"))
    r = (
        dims.crossJoin(js)  # 64×16 constant matrix — broadcast by size
        .withColumn(
            "sign",
            1
            - 2
            * F.pmod(
                md5_long(
                    F.concat(
                        F.lit("jl:"),
                        F.col("dim").cast("string"),
                        F.lit(":"),
                        F.col("j").cast("string"),
                    )
                ),
                F.lit(2),
            ),
        )
    )
    proj = (
        flat.join(F.broadcast(r), "dim")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("val") * F.col("sign")).cast("bigint").alias("p"))
    )
    a, b = proj.alias("a"), proj.alias("b")
    pd_ = (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"))
        .agg(
            F.sum((F.col("a.p") - F.col("b.p")) * (F.col("a.p") - F.col("b.p")))
            .alias("d2_proj")
        )
    )
    fa, fb = flat.alias("fa"), flat.alias("fb")
    od = (
        fa.join(
            fb,
            (F.col("fa.dim") == F.col("fb.dim"))
            & (F.col("fa.vec_id") < F.col("fb.vec_id")),
        )
        .groupBy(F.col("fa.vec_id").alias("va"), F.col("fb.vec_id").alias("vb"))
        .agg(
            F.sum(
                (F.col("fa.val") - F.col("fb.val"))
                * (F.col("fa.val") - F.col("fb.val"))
            ).alias("d2_orig")
        )
    )
    return (
        od.join(pd_, ["va", "vb"])
        .select(
            F.col("va").alias("vec_a"),
            F.col("vb").alias("vec_b"),
            F.col("d2_orig").cast("bigint"),
            F.col("d2_proj").cast("bigint"),
            (
                F.col("d2_proj").cast("double")
                / _JL_K
                / F.nullif(F.col("d2_orig"), F.lit(0))
            ).alias("distortion_ratio"),
        )
        .orderBy("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# X77 — cluster labeling (c-TF-IDF top terms per embedding cluster)
#
# Clusters are only useful to a curator once they are EXPLAINED: join
# the embedding-space partition (the IVF/k-means assignment, x13) back
# to the documents (vec_id = doc_id in the synthetic star) and label
# every cluster with its most distinctive terms — class-based TF-IDF
# (BERTopic's c-TF-IDF): term frequency within the cluster × ln of
# inverse cluster-frequency. Cross-modal: the only query that joins
# the embeddings table to document text.
#
# Determinism: x12's conventions — the score rounds to 6dp before
# ranking (ln agrees to 1 ulp, rounding collapses it), ties break on
# the term. Scale shape: assignment is a broadcast of 16 centroids;
# tokens shuffle once on (cid, term) with map-side combine; the
# cluster-df relation is vocabulary-sized and broadcast back.
# ---------------------------------------------------------------------------

_X77_TOPK = 3


@register(
    "x77_cluster_labels",
    oracle=f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS c FROM embeddings
  WHERE vec_id < {_N_CENTROIDS}
), assign AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, cents.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_DUCK_COS_RAW.format(a="e.embedding", b="cents.c")} DESC, cents.cid) AS rn
    FROM embeddings e CROSS JOIN cents
  ) WHERE rn = 1
), toks AS (
  SELECT doc_id, unnest(string_split(
           lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS term
  FROM documents
), ctf AS (
  SELECT a.cid, t.term, COUNT(*) AS tf
  FROM toks t JOIN assign a ON a.vec_id = t.doc_id
  WHERE t.term <> ''
  GROUP BY a.cid, t.term
), cdf AS (
  SELECT term, COUNT(*) AS df FROM ctf GROUP BY term
), scored AS (
  SELECT ctf.cid, ctf.term, ctf.tf, cdf.df,
         ROUND(ctf.tf * ln(CAST({_N_CENTROIDS} AS DOUBLE) / cdf.df), 6)
           AS ctfidf
  FROM ctf JOIN cdf USING (term)
)
SELECT cid, term, tf, df, ctfidf FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY cid
                               ORDER BY ctfidf DESC, term) AS rn
  FROM scored
) WHERE rn <= {_X77_TOPK}
ORDER BY cid, ctfidf DESC, term
""",
    doc=f"Cluster labeling: c-TF-IDF top-{_X77_TOPK} terms per "
    "embedding cluster (tf-in-cluster x ln(K/cluster-df), 6dp-rounded "
    "rank, term tiebreak) — the cross-modal explain step after "
    "k-means/IVF partitioning.",
)
def x77_cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _spark_base(spark, sf_dir)
    cents = e.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("c"),
        F.col("nrm").alias("cn"),
    )
    cos_raw = _dot(F.col("embedding"), F.col("c")) / F.nullif(
        F.col("nrm") * F.col("cn"), F.lit(0.0)
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("cc"), F.asc("cid")
    )
    assign = (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", "cid", cos_raw.alias("cc"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )
    d = table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.explode(
                F.split(
                    F.expr(r"lower(regexp_replace(trim(text), '\\s+', ' '))"), " "
                )
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    ctf = (
        toks.join(assign, toks.doc_id == assign.vec_id)
        .groupBy("cid", "term")
        .agg(F.count("*").alias("tf"))
    )
    cdf = ctf.groupBy("term").agg(F.count("*").alias("df"))
    scored = ctf.join(F.broadcast(cdf), "term").select(
        "cid",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.lit(float(_N_CENTROIDS)) / F.col("df")), 6
        ).alias("ctfidf"),
    )
    w = Window.partitionBy("cid").orderBy(F.desc("ctfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _X77_TOPK)
        .select("cid", "term", "tf", "df", "ctfidf")
        .orderBy("cid", F.desc("ctfidf"), "term")
    )


# ---------------------------------------------------------------------------
# X90 — graded ranking-quality eval: NDCG@10 + MRR per ranker
#
# x38/x41 audit RECALL (set overlap with the exact ranker); a retrieval
# deployment tunes on POSITION-WEIGHTED quality. Two rankers over the
# same probe set — exact cosine and the unnormalized inner product
# (the classic norm-bias ablation) — scored against binary relevance
# (label match) with NDCG@10 and MRR. Every rank weight 1/log2(i+1)
# and its cumulative ideal sum is precomputed in Python as an integer
# micro-unit literal shared verbatim by both engines, so DCG/IDCG are
# exact integer sums and per-query NDCG divides identical ints; the
# per-ranker mean goes through 12dp-quantized decimals.
#
# Scale: probes broadcast against the corpus (the x5 shape); rank
# windows partition per (ranker, query) on the probe-bounded scored
# relation; label counts broadcast. The ranker comparison is a
# column-order change, not a second scan.
# ---------------------------------------------------------------------------

import math as _math

_X90_K = 10
_X90_PROBE_MOD = 25  # vec_id % 25 == 0 → probe set

_X90_W = [round(1e6 / _math.log2(i + 1)) for i in range(1, _X90_K + 1)]
_X90_WCUM = [sum(_X90_W[: i + 1]) for i in range(_X90_K)]

_X90_WT_CASE = (
    "CASE rnk "
    + " ".join(f"WHEN {i + 1} THEN {w}" for i, w in enumerate(_X90_W))
    + " ELSE 0 END"
)
_X90_IDCG_CASE = (
    "CASE LEAST(n_rel, 10) "
    + " ".join(f"WHEN {i + 1} THEN {w}" for i, w in enumerate(_X90_WCUM))
    + " ELSE 0 END"
)

_X90_ORACLE = f"""
WITH probes AS (
  SELECT vec_id AS query_id, embedding AS q, label AS qlabel
  FROM embeddings WHERE vec_id % {_X90_PROBE_MOD} = 0
), rel_counts AS (
  SELECT label, COUNT(*) AS n_with FROM embeddings GROUP BY label
), scored AS (
  SELECT p.query_id, p.qlabel, e.vec_id AS neighbor_id, e.label,
         list_dot_product(CAST(p.q AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
           AS dot,
         list_dot_product(CAST(p.q AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
           / NULLIF(sqrt(list_dot_product(CAST(p.q AS DOUBLE[]),
                                          CAST(p.q AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[]))), 0)
           AS cosine
  FROM probes p, embeddings e
  WHERE e.vec_id <> p.query_id
), ranked AS (
  SELECT 'cosine' AS ranker, query_id, qlabel, label,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rnk
  FROM scored
  UNION ALL
  SELECT 'dot', query_id, qlabel, label,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dot DESC, neighbor_id ASC)
  FROM scored
), grades AS (
  SELECT ranker, query_id, qlabel,
         CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel, rnk
  FROM ranked WHERE rnk <= {_X90_K}
), per_query AS (
  SELECT g.ranker, g.query_id,
         CAST(SUM(g.rel * ({_X90_WT_CASE})) AS BIGINT) AS dcg_us,
         CAST(MIN(CASE WHEN g.rel = 1 THEN ROUND(1000000.0 / g.rnk)
                       ELSE 0 END) AS BIGINT) AS _unused,
         CAST(MAX(CASE WHEN g.rel = 1 THEN ROUND(1000000.0 / g.rnk)
                       ELSE 0 END) AS BIGINT) AS rr_us
  FROM grades g GROUP BY g.ranker, g.query_id
), with_ideal AS (
  SELECT pq.ranker, pq.query_id, pq.dcg_us, pq.rr_us,
         (SELECT {_X90_IDCG_CASE} FROM (
            SELECT CAST(rc.n_with - 1 AS BIGINT) AS n_rel
            FROM probes p2 JOIN rel_counts rc ON rc.label = p2.qlabel
            WHERE p2.query_id = pq.query_id)) AS idcg_us
  FROM per_query pq
)
SELECT ranker,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       ROUND(CAST(SUM(CAST(ROUND(CAST(dcg_us AS DOUBLE) / idcg_us, 12)
                           AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 9)
         AS mean_ndcg,
       ROUND(CAST(SUM(CAST(rr_us AS DECIMAL(38,0))) AS DOUBLE)
             / (COUNT(*) * 1e6), 9) AS mean_mrr,
       CAST(SUM(CASE WHEN dcg_us = idcg_us THEN 1 ELSE 0 END) AS BIGINT)
         AS n_perfect
FROM with_ideal
GROUP BY ranker
ORDER BY ranker
"""


@register(
    "x90_ndcg_eval",
    oracle=_X90_ORACLE,
    doc="Ranking-quality eval: NDCG@10 + MRR of the exact-cosine and "
    "unnormalized-dot rankers against label-match relevance; rank "
    "weights and ideal cumulative sums are shared integer micro-unit "
    "literals, so DCG/IDCG are exact and per-query NDCG divides "
    "identical ints — the position-weighted companion to x38's "
    "recall audits.",
)
def x90_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # norms precomputed PER SIDE (the x5 contract) — never per pair:
    # the pair relation then evaluates ONE dot chain per candidate.
    # The session index materializes (vec_id, embedding, label, nrm)
    # once per corpus; the corpus side, probe broadcast, rel_counts and
    # ideal broadcast all read that leaf (4 subtree executions before).
    vecs, _ = _vec_index(spark, sf_dir)
    e = vecs.select("vec_id", "embedding", "label", "nrm")
    probes = e.filter(F.col("vec_id") % _X90_PROBE_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q"),
        F.col("label").alias("qlabel"),
        F.col("nrm").alias("qn"),
    )
    rel_counts = e.groupBy("label").agg(F.count("*").alias("n_with"))
    dot = _dot(F.col("q"), F.col("embedding"))
    scored = (
        e.join(F.broadcast(probes), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "qlabel",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            dot.alias("dot"),
            (dot / F.nullif(F.col("qn") * F.col("nrm"), F.lit(0.0))).alias(
                "cosine"
            ),
        )
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    w_dot = Window.partitionBy("query_id").orderBy(
        F.desc("dot"), F.asc("neighbor_id")
    )
    # both ranks in ONE pass: the two windows share the query_id
    # exchange (two sorts, one shuffle), then stack() melts to the
    # (ranker, rnk) long form without rescanning the scored relation
    ranked = (
        scored.withColumn("rnk_cos", F.row_number().over(w_cos))
        .withColumn("rnk_dot", F.row_number().over(w_dot))
        .select(
            "query_id",
            "qlabel",
            "label",
            F.expr(
                "stack(2, 'cosine', rnk_cos, 'dot', rnk_dot)"
                " as (ranker, rnk)"
            ),
        )
    )
    grades = ranked.filter(F.col("rnk") <= _X90_K).select(
        "ranker",
        "query_id",
        "qlabel",
        F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0).alias("rel"),
        "rnk",
    )
    per_query = grades.groupBy("ranker", "query_id", "qlabel").agg(
        F.sum(F.col("rel") * F.expr(_X90_WT_CASE))
        .cast("bigint")
        .alias("dcg_us"),
        F.max(
            F.when(
                F.col("rel") == 1,
                F.round(F.lit(1000000.0) / F.col("rnk")),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("rr_us"),
    )
    ideal = (
        probes.select("query_id", "qlabel")
        .join(F.broadcast(rel_counts), F.col("qlabel") == F.col("label"))
        .select(
            "query_id",
            (F.col("n_with") - 1).cast("bigint").alias("n_rel"),
        )
        .select("query_id", F.expr(_X90_IDCG_CASE).alias("idcg_us"))
    )
    with_ideal = per_query.join(F.broadcast(ideal), "query_id")
    ndcg = F.col("dcg_us").cast("double") / F.col("idcg_us")
    return (
        with_ideal.groupBy("ranker")
        .agg(
            F.count("*").cast("bigint").alias("n_queries"),
            F.round(
                F.sum(F.round(ndcg, 12).cast("decimal(38,12)")).cast("double")
                / F.count("*"),
                9,
            ).alias("mean_ndcg"),
            F.round(
                F.sum(F.col("rr_us").cast("decimal(38,0)")).cast("double")
                / (F.count("*") * F.lit(1e6)),
                9,
            ).alias("mean_mrr"),
            F.sum(
                F.when(F.col("dcg_us") == F.col("idcg_us"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_perfect"),
        )
        .orderBy("ranker")
    )


# ---------------------------------------------------------------------------
# X93 — centroid silhouette (cluster-validation score per IVF cell)
#
# x13 builds the IVF partition and x77 labels it; nothing yet says
# whether the partition is any GOOD. The centroid-form silhouette
# does: per vector, a = cosine distance to its own (argmax) centroid
# and b = distance to the nearest OTHER centroid — which, under
# argmax assignment, are exactly 1 − top1 and 1 − top2 of its
# centroid cosines — and s = (b − a) / max(a, b). Clusters whose mean
# s approaches 0 are blurred into a neighbor (merge candidates);
# negative means misassignment. One broadcast centroid join, a
# per-vector top-2 window (partitioned by vec_id — parallel at any
# scale), 12dp-quantized means per cell.
# ---------------------------------------------------------------------------


@register(
    "x93_cluster_silhouette",
    oracle=f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS c FROM embeddings
  WHERE vec_id < {_N_CENTROIDS}
), scored AS (
  SELECT e.vec_id, cents.cid,
         {_DUCK_COS_RAW.format(a="e.embedding", b="cents.c")} AS cos
  FROM embeddings e CROSS JOIN cents
), ranked AS (
  SELECT vec_id, cid, cos,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, cid ASC) AS rn
  FROM scored
), top2 AS (
  SELECT o.vec_id, o.cid AS own_cid,
         1.0 - o.cos AS a_dist, 1.0 - s.cos AS b_dist
  FROM ranked o JOIN ranked s
    ON s.vec_id = o.vec_id AND o.rn = 1 AND s.rn = 2
), sil AS (
  SELECT own_cid, a_dist, b_dist,
         CASE WHEN GREATEST(a_dist, b_dist) > 0
              THEN (b_dist - a_dist) / GREATEST(a_dist, b_dist)
              ELSE 0.0 END AS s
  FROM top2
)
SELECT own_cid AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       ROUND(CAST(SUM(CAST(ROUND(s, 12) AS DECIMAL(38,12))) AS DOUBLE)
             / COUNT(*), 9) AS mean_silhouette,
       ROUND(CAST(SUM(CAST(ROUND(a_dist, 12) AS DECIMAL(38,12))) AS DOUBLE)
             / COUNT(*), 9) AS mean_own_dist,
       ROUND(CAST(SUM(CAST(ROUND(b_dist, 12) AS DECIMAL(38,12))) AS DOUBLE)
             / COUNT(*), 9) AS mean_next_dist
FROM sil
GROUP BY own_cid
ORDER BY cluster_id
""",
    doc="Centroid-form silhouette per IVF cell: a = 1 − top1 centroid "
    "cosine, b = 1 − top2 (nearest other cell under argmax "
    "assignment), s = (b−a)/max(a,b); 12dp-quantized per-cluster "
    "means — the cluster-validation gate for x13's partition and "
    "x29/x77's consumers.",
)
def x93_cluster_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _spark_base(spark, sf_dir)
    cents = e.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c"),
        F.col("nrm").alias("cn"),
    )
    cos = _dot(F.col("embedding"), F.col("c")) / F.nullif(
        F.col("nrm") * F.col("cn"), F.lit(0.0)
    )
    scored = e.join(F.broadcast(cents)).select(
        "vec_id", "cid", cos.alias("cos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cid"))
    ranked = scored.withColumn("rn", F.row_number().over(w))
    own = ranked.filter(F.col("rn") == 1).select(
        "vec_id",
        F.col("cid").alias("own_cid"),
        (F.lit(1.0) - F.col("cos")).alias("a_dist"),
    )
    nxt = ranked.filter(F.col("rn") == 2).select(
        "vec_id", (F.lit(1.0) - F.col("cos")).alias("b_dist")
    )
    sil = own.join(nxt, "vec_id").select(
        "own_cid",
        "a_dist",
        "b_dist",
        F.when(
            F.greatest("a_dist", "b_dist") > 0,
            (F.col("b_dist") - F.col("a_dist"))
            / F.greatest("a_dist", "b_dist"),
        )
        .otherwise(F.lit(0.0))
        .alias("s"),
    )

    def qmean(col, alias):
        return F.round(
            F.sum(F.round(col, 12).cast("decimal(38,12)")).cast("double")
            / F.count("*"),
            9,
        ).alias(alias)

    return (
        sil.groupBy(F.col("own_cid").alias("cluster_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            qmean(F.col("s"), "mean_silhouette"),
            qmean(F.col("a_dist"), "mean_own_dist"),
            qmean(F.col("b_dist"), "mean_next_dist"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# X125 — embedding outlier census (diagonal Mahalanobis distance)
#
# x51 gates on norms (a degenerate-vector check); a corpus health pass
# also wants DISTRIBUTIONAL outliers — vectors far from the centroid
# relative to per-dimension spread. Full Mahalanobis needs a d×d
# inverse; the standard at-scale proxy is the diagonal form
# Σ_j (x_j − μ_j)²/σ_j² (a per-dimension z-score energy), which only
# needs d means and variances. Fixed-point contract (x23): embeddings
# quantize to floor(x·2^20) BIGINTs, so Σx and Σx² per dimension are
# exact integers (Σx² through DECIMAL(38,0) — past 2^53 at corpus
# scale), μ and σ² divide identical operands, and each dimension's
# z² contribution quantizes to an integer micro before the per-vector
# BIGINT sum — order-free everywhere. Constant dimensions (σ² = 0)
# are excluded on both engines by the same predicate.
# Scale shape: one (dim) aggregate (64 rows, broadcast back), one
# groupBy(vec_id) that reuses the vec_id partitioning, top-k via
# TakeOrderedAndProject.
# ---------------------------------------------------------------------------

_X125_TOPK = 20
_X125_SCALE = 1 << 20


@register(
    "x125_mahalanobis_outliers",
    oracle=f"""
WITH q AS (
  SELECT vec_id, label,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * {_X125_SCALE}) AS BIGINT)) AS q
  FROM embeddings
), ex AS (
  SELECT vec_id, label, d.dim AS dim, q[d.dim + 1] AS val
  FROM q CROSS JOIN (SELECT unnest(range({sim.EMBED_DIM})) AS dim) d
), st AS (
  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(val) AS BIGINT) AS s,
         CAST(SUM(CAST(val AS DECIMAL(38,0)) * val) AS DECIMAL(38,0)) AS ss
  FROM ex GROUP BY dim
), z AS (
  SELECT ex.vec_id, ex.label,
         CAST(round((val - CAST(s AS DOUBLE) / n)
                    * (val - CAST(s AS DOUBLE) / n)
                    / ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n)
                    * 1000000) AS BIGINT) AS zmicro
  FROM ex JOIN st USING (dim)
  WHERE CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n > 0
)
SELECT vec_id, CAST(MAX(label) AS INT) AS label,
       CAST(SUM(zmicro) AS BIGINT) AS maha2_micro
FROM z GROUP BY vec_id
ORDER BY maha2_micro DESC, vec_id
LIMIT {_X125_TOPK}
""",
    doc=f"Diagonal-Mahalanobis embedding outliers: fixed-point "
    f"(floor(x·2^20)) per-dimension exact moments, micro-quantized z² "
    f"contributions summed as BIGINTs per vector, top-{_X125_TOPK} by "
    "distance — the distributional sibling of x51's norm gate.",
)
def x125_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    ex = e.select(
        "vec_id",
        "label",
        F.posexplode(
            F.expr(
                "transform(embedding, x -> "
                f"cast(floor(cast(x as double) * {_X125_SCALE}) as bigint))"
            )
        ).alias("dim", "val"),
    )
    st = ex.groupBy("dim").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("val").cast("bigint").alias("s"),
        F.sum(F.col("val").cast("decimal(38,0)") * F.col("val"))
        .cast("decimal(38,0)")
        .alias("ss"),
    )
    dv = F.col("val") - F.col("s").cast("double") / F.col("n")
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / F.col("n")
    z = (
        ex.join(F.broadcast(st), "dim")
        .filter(
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
            > 0
        )
        .select(
            "vec_id",
            "label",
            F.round(dv * dv / var * 1e6).cast("bigint").alias("zmicro"),
        )
    )
    return (
        z.groupBy("vec_id")  # reuses the vec_id partitioning
        .agg(
            F.max("label").cast("int").alias("label"),
            F.sum("zmicro").cast("bigint").alias("maha2_micro"),
        )
        .orderBy(F.desc("maha2_micro"), "vec_id")
        .limit(_X125_TOPK)
    )


# ---------------------------------------------------------------------------
# X134 — class-balance weights (inverse-frequency + effective number)
#
# Imbalanced labels need reweighting before training; the two standard
# recipes are inverse frequency (w ∝ n_total/n_c) and the effective
# number of samples (Cui et al. 2019): w ∝ (1−β)/(1−β^{n_c}), which
# discounts duplicate-ish samples inside a class. β^n with INTEGER n
# is exp(n·ln β) — ln β is frozen as a repr'd Python literal (no
# runtime libm disagreement feeds the exponent) and one exp evaluates
# over identical doubles. Inverse frequency normalizes to mean 1 over
# SAMPLES (Σ n_c·w = N); effective number to mean 1 over CLASSES (a
# 12dp-quantized decimal sum) — both from exact integer class counts.
# One label-grain aggregate (bounded), everything after on the class
# dimension.
# ---------------------------------------------------------------------------

import math as _m134

_X134_BETA = 0.999
_X134_LN_BETA = repr(_m134.log(_X134_BETA))


@register(
    "x134_class_balance_weights",
    oracle=f"""
WITH cls AS (
  SELECT CAST(label AS INT) AS label, CAST(COUNT(*) AS BIGINT) AS n_c
  FROM embeddings GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k
  FROM cls
), eff AS (
  SELECT label, n_c,
         (1.0 - {_X134_BETA!r}) / (1.0 - exp(n_c * {_X134_LN_BETA}))
           AS raw_eff
  FROM cls
), norm AS (
  SELECT CAST(SUM(CAST(ROUND(raw_eff, 12) AS DECIMAL(38,12))) AS DOUBLE)
           AS sum_eff
  FROM eff
)
SELECT e.label, e.n_c,
       ROUND(CAST(t.n AS DOUBLE) / (t.k * e.n_c), 6) AS w_inv_freq,
       ROUND(e.raw_eff * t.k / n1.sum_eff, 6) AS w_eff_num
FROM eff e CROSS JOIN tot t CROSS JOIN norm n1
ORDER BY e.label
""",
    doc=f"Class-balance weights over embedding labels: inverse "
    f"frequency and Cui et al.'s effective number (β = {_X134_BETA}, "
    "β^n as exp(n·repr-frozen ln β)); inverse frequency sample-mean-1, "
    "effective number class-mean-1 via a 12dp-quantized decimal sum — "
    "the reweighting table a trainer consumes for imbalanced classes.",
)
def x134_class_balance_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    cls = e.groupBy(F.col("label").cast("int").alias("label")).agg(
        F.count("*").cast("bigint").alias("n_c")
    )
    tot = cls.agg(
        F.sum("n_c").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
    )
    raw_eff = (F.lit(1.0) - F.lit(_X134_BETA)) / (
        F.lit(1.0) - F.exp(F.col("n_c") * F.expr(_X134_LN_BETA))
    )
    eff = cls.select("label", "n_c", raw_eff.alias("raw_eff"))
    norm = eff.agg(
        F.sum(F.round(F.col("raw_eff"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("sum_eff")
    )
    return (
        eff.crossJoin(F.broadcast(tot))  # 1-row scalars
        .crossJoin(F.broadcast(norm))
        .select(
            "label",
            "n_c",
            F.round(
                F.col("n").cast("double") / (F.col("k") * F.col("n_c")), 6
            ).alias("w_inv_freq"),
            F.round(
                F.col("raw_eff") * F.col("k") / F.col("sum_eff"), 6
            ).alias("w_eff_num"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# X136 — leave-one-class-out centroid influence
#
# "Which class drags the embedding distribution?" — the cheap,
# exact answer is leave-one-out algebra on SUMS: removing class c
# moves the centroid from G/N to (G − S_c)/(N − n_c) per dimension,
# with no second pass over the data. Fixed-point contract (x23):
# values quantize to floor(x·2^20) BIGINTs so per-(class, dim) sums
# are exact; each dimension's squared shift micro-quantizes before
# the per-class BIGINT sum (x125's order-free pattern); classes rank
# by the exact integer shift2_micro. Scale shape: one (label, dim)
# aggregate (bounded: |classes|·64 rows), pure closed-form algebra
# after.
# ---------------------------------------------------------------------------


@register(
    "x136_class_centroid_influence",
    oracle=f"""
WITH q AS (
  SELECT CAST(label AS INT) AS label,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * {1 << 20}) AS BIGINT)) AS q
  FROM embeddings
), ex AS (
  SELECT label, d.dim AS dim, q[d.dim + 1] AS val
  FROM q CROSS JOIN (SELECT unnest(range({sim.EMBED_DIM})) AS dim) d
), ld AS (
  SELECT label, dim, CAST(SUM(val) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n_l
  FROM ex GROUP BY label, dim
), gd AS (
  SELECT dim, CAST(SUM(s) AS BIGINT) AS g, CAST(SUM(n_l) AS BIGINT) AS n
  FROM ld GROUP BY dim
), shift AS (
  SELECT ld.label, ld.n_l,
         CAST(round((CAST(gd.g AS DOUBLE) / gd.n
                     - CAST(gd.g - ld.s AS DOUBLE) / (gd.n - ld.n_l))
                    * (CAST(gd.g AS DOUBLE) / gd.n
                       - CAST(gd.g - ld.s AS DOUBLE) / (gd.n - ld.n_l))
                    * 1000000) AS BIGINT) AS term_micro
  FROM ld JOIN gd USING (dim)
)
SELECT label, CAST(MAX(n_l) AS BIGINT) AS n_vecs,
       CAST(SUM(term_micro) AS BIGINT) AS shift2_micro,
       ROUND(sqrt(CAST(SUM(term_micro) AS DOUBLE) / 1000000.0), 6)
         AS shift_q
FROM shift
GROUP BY label
ORDER BY shift2_micro DESC, label
""",
    doc="Leave-one-class-out centroid influence: removing class c moves "
    "the centroid from G/N to (G−S_c)/(N−n_c) — exact closed-form "
    "algebra on fixed-point per-(class, dim) sums, micro-quantized "
    "squared shifts summed as BIGINTs, classes ranked by the exact "
    "integer — which class drags the embedding distribution, with no "
    "second data pass.",
)
def x136_class_centroid_influence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    ex = e.select(
        F.col("label").cast("int").alias("label"),
        F.posexplode(
            F.expr(
                "transform(embedding, x -> "
                f"cast(floor(cast(x as double) * {1 << 20}) as bigint))"
            )
        ).alias("dim", "val"),
    )
    ld = ex.groupBy("label", "dim").agg(
        F.sum("val").cast("bigint").alias("s"),
        F.count("*").cast("bigint").alias("n_l"),
    )
    gd = ld.groupBy("dim").agg(
        F.sum("s").cast("bigint").alias("g"),
        F.sum("n_l").cast("bigint").alias("n"),
    )
    gc = F.col("g").cast("double") / F.col("n")
    loo = (F.col("g") - F.col("s")).cast("double") / (
        F.col("n") - F.col("n_l")
    )
    shift = ld.join(F.broadcast(gd), "dim").select(
        "label",
        "n_l",
        F.round((gc - loo) * (gc - loo) * 1e6)
        .cast("bigint")
        .alias("term_micro"),
    )
    return (
        shift.groupBy("label")
        .agg(
            F.max("n_l").cast("bigint").alias("n_vecs"),
            F.sum("term_micro").cast("bigint").alias("shift2_micro"),
        )
        .select(
            "label",
            "n_vecs",
            "shift2_micro",
            F.round(
                F.sqrt(F.col("shift2_micro").cast("double") / 1e6), 6
            ).alias("shift_q"),
        )
        .orderBy(F.desc("shift2_micro"), "label")
    )


# ---------------------------------------------------------------------------
# X145 — top principal direction of the embedding cloud (power iteration)
#
# The dominant eigenvector of x63's covariance matrix — the direction
# every "all-but-the-top" embedding post-processing (Mu & Viswanath
# 2018) removes first, and the axis a feature-collapse audit inspects.
# The data-sized work is exactly x63's one-pass integer covariance
# (milli-quantized values, exact BIGINT numerators n·Σxy − Σx·Σy);
# the iteration then runs on the DIMENSION grain (64×64 rows, pinned
# once), so 12 power steps cost 12 joins over a settled tiny relation.
#
# Iteration shape matters: a per-step ∞-norm rescale would reference
# each iterate TWICE (max scalar + division), doubling the logical
# plan per step — 2^12 blowup on BOTH engines. Instead the matrix is
# normalized ONCE by its max-|entry| (exact integer max), the chain
# w_{t+1} = Ĉ·w_t stays strictly linear, and λ is recovered at the
# end as max|w_12| / max|w_11| rescaled back to covariance units.
# Determinism contract is f90's: 14dp-quantized products under exact
# decimal sums each step, maxima over exact values, final ratios as
# doubles of identically-derived operands — both engines walk
# bit-identical iterates. Engine extension.
# ---------------------------------------------------------------------------

_X145_ITERS = 12


def _x145_oracle() -> str:
    steps = []
    for i in range(1, _X145_ITERS + 1):
        steps.append(
            f"w{i} AS (SELECT c.di AS dim, "
            "CAST(SUM(CAST(ROUND(c.cw * v.w, 14) AS DECIMAL(38,14))) "
            f"AS DOUBLE) AS w FROM cs c JOIN w{i - 1} v ON v.dim = c.dj "
            "GROUP BY c.di)"
        )
    chain = ",\n".join(steps)
    last, prev = f"w{_X145_ITERS}", f"w{_X145_ITERS - 1}"
    from calaveras_uniteus_etl_spark.operators import similarity as sim

    return f"""
WITH q AS (
  SELECT vec_id, d.dim AS dim,
         CAST(ROUND(CAST(embedding[d.dim + 1] AS DOUBLE) * 1000) AS BIGINT)
           AS qv
  FROM embeddings CROSS JOIN (SELECT unnest(range({sim.EMBED_DIM})) AS dim) d
), n AS (
  SELECT COUNT(DISTINCT vec_id) AS n FROM q
), sums AS (
  SELECT dim, CAST(SUM(qv) AS BIGINT) AS sx FROM q GROUP BY dim
), prods AS (
  SELECT a.dim AS di, b.dim AS dj, CAST(SUM(a.qv * b.qv) AS BIGINT) AS sxy
  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.dim <= b.dim
  GROUP BY a.dim, b.dim
), covu AS (
  SELECT di, dj, CAST(n.n * sxy - sa.sx * sb.sx AS BIGINT) AS cv
  FROM prods
  JOIN sums sa ON sa.dim = di
  JOIN sums sb ON sb.dim = dj
  CROSS JOIN n
), cov AS (
  SELECT di, dj, cv FROM covu
  UNION ALL
  SELECT dj AS di, di AS dj, cv FROM covu WHERE di <> dj
), mxc AS (
  SELECT CAST(MAX(ABS(cv)) AS BIGINT) AS mx FROM covu
), cs AS (
  SELECT di, dj,
         ROUND(CAST(cv AS DOUBLE) / CAST(mx AS DOUBLE), 14) AS cw
  FROM cov CROSS JOIN mxc
), w0 AS (
  SELECT dim, CAST(1.0 AS DOUBLE) AS w
  FROM (SELECT unnest(range({sim.EMBED_DIM})) AS dim)
),
{chain},
mlast AS (SELECT MAX(ABS(w)) AS m FROM {last}),
mprev AS (SELECT MAX(ABS(w)) AS m FROM {prev})
SELECT CAST(v.dim AS INT) AS dim,
       ROUND(v.w / mlast.m, 8) AS loading,
       ROUND((mlast.m / mprev.m) * CAST(mxc.mx AS DOUBLE), 2) AS lambda_num
FROM {last} v CROSS JOIN mlast CROSS JOIN mprev CROSS JOIN mxc
ORDER BY dim
"""


@register(
    "x145_top_principal_direction",
    oracle=_x145_oracle(),
    doc="Dominant eigenvector of the embedding covariance via "
    f"{_X145_ITERS} quantized power-iteration steps on the pinned "
    "64×64 integer-covariance grain (matrix max-normalized ONCE so "
    "the chain stays linear; 14dp-quantized terms under exact decimal "
    "sums — bit-identical iterates); λ recovered from the last two "
    "iterates' maxima. The all-but-the-top / feature-collapse audit "
    "direction.",
)
def x145_top_principal_direction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # Quantized per-vector arrays pinned once; the covariance numerator
    # comes from a PER-ROW upper-triangle product flatten reduced by a
    # map-side-partial groupBy — x63's shape (the former explode
    # self-join shuffled and sorted n·64 rows on both SMJ sides).
    e = table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    base = e.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))"
        ).alias("qa"),
    ).localCheckpoint(eager=True)
    # lazy 1-row broadcast scalar (no eager driver count)
    nrow = base.agg(F.count_distinct("vec_id").cast("bigint").alias("n"))
    sums = (
        base.select(F.posexplode("qa").alias("dim", "qv"))
        .groupBy("dim")
        .agg(F.sum("qv").cast("bigint").alias("sx"))
    )
    tri = F.expr(
        f"flatten(transform(sequence(0, {sim.EMBED_DIM - 1}), i -> "
        f"transform(sequence(i, {sim.EMBED_DIM - 1}), j -> "
        "struct(i as di, j as dj, qa[i] * qa[j] as p))))"
    )
    prods = (
        base.select(F.explode(tri).alias("t"))
        .groupBy(F.col("t.di").alias("di"), F.col("t.dj").alias("dj"))
        .agg(F.sum("t.p").cast("bigint").alias("sxy"))
    )
    sa = sums.select(F.col("dim").alias("di"), F.col("sx").alias("sxa"))
    sb = sums.select(F.col("dim").alias("dj"), F.col("sx").alias("sxb"))
    covu = (
        prods.join(F.broadcast(sa), "di")
        .join(F.broadcast(sb), "dj")
        .crossJoin(F.broadcast(nrow))
        .select(
            "di",
            "dj",
            (F.col("n") * F.col("sxy") - F.col("sxa") * F.col("sxb"))
            .cast("bigint")
            .alias("cv"),
        )
    )
    # the 64×64 grain is dimension-bounded: pin it BEFORE the mirror
    # union so the per-vector product join runs once and the 12-step
    # loop iterates over a settled tiny relation (f90 contract)
    covu = covu.localCheckpoint(eager=True)
    cov = covu.union(
        covu.filter(F.col("di") != F.col("dj")).select(
            F.col("dj").alias("di"), F.col("di").alias("dj"), "cv"
        )
    )
    mxc = covu.agg(F.max(F.abs(F.col("cv"))).cast("bigint").alias("mx"))
    cs = cov.crossJoin(F.broadcast(mxc)).select(
        "di",
        "dj",
        F.round(
            F.col("cv").cast("double") / F.col("mx").cast("double"), 14
        ).alias("cw"),
    )
    # The iterate is a 64-row dimension-grain vector: keep it on ONE
    # partition so every per-step join and groupBy satisfies its
    # distribution without an Exchange — the 12 steps fuse into a
    # single stage (the profiled plan previously carried 294 Exchanges
    # for 24 logical ones). The mirrored matrix rides in as one reused
    # broadcast built from the pinned covu leaf; the data-sized work
    # (explode + product self-join) stays distributed above.
    v = (
        spark.range(sim.EMBED_DIM)
        .select(F.col("id").cast("int").alias("dim"), F.lit(1.0).alias("w"))
        .coalesce(1)
    )
    prev = None
    for _ in range(_X145_ITERS):
        prev = v
        v = (
            v.join(F.broadcast(cs), F.col("dim") == F.col("dj"))
            .select(
                "di",
                F.round(F.col("cw") * F.col("w"), 14)
                .cast("decimal(38,14)")
                .alias("term"),
            )
            .groupBy("di")
            .agg(F.sum("term").cast("double").alias("w"))
            .select(F.col("di").alias("dim"), "w")
        )
    # Pin the LAST TWO iterates in one action: lazy, the λ maxima and
    # the final projection each re-walked the whole 12-step chain (and
    # re-built the cs broadcast) — 3 executions for one loop. The union
    # shares the single cs broadcast via ReusedExchange, so the chain
    # runs once; everything below reads 128 pinned rows.
    pinned = (
        prev.select(F.lit(0).alias("step"), "dim", "w")
        .union(v.select(F.lit(1).alias("step"), "dim", "w"))
        .localCheckpoint(eager=True)
    )
    prev = pinned.filter(F.col("step") == 0).select("dim", "w")
    v = pinned.filter(F.col("step") == 1).select("dim", "w")
    mlast = v.agg(F.max(F.abs(F.col("w"))).alias("m_last"))
    mprev = prev.agg(F.max(F.abs(F.col("w"))).alias("m_prev"))
    return (
        v.crossJoin(F.broadcast(mlast))
        .crossJoin(F.broadcast(mprev))
        .crossJoin(F.broadcast(mxc))
        .select(
            F.col("dim").cast("int").alias("dim"),
            F.round(F.col("w") / F.col("m_last"), 8).alias("loading"),
            F.round(
                (F.col("m_last") / F.col("m_prev"))
                * F.col("mx").cast("double"),
                2,
            ).alias("lambda_num"),
        )
        .orderBy("dim")
    )
