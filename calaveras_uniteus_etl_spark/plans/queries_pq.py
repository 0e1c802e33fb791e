"""Product-quantization ANN (x56/x57): the memory-bounded scale path.

IVF (x13) cuts the candidate set; PQ cuts the *memory*: each 64-dim
float vector (256 bytes) compresses to M=8 sub-space code indices
(8 bytes), and query-time distance is a table lookup sum (ADC —
asymmetric distance computation, Jégou et al. 2011, "Product
Quantization for Nearest Neighbor Search"). At 100 TB of embeddings
the codes fit in a fraction of executor memory and the scan is a
join against a broadcast lookup table — no vector payload moves.

Engine-deterministic construction (no trained state, same rules as
x23's fixed-point k-means): vectors quantize to floor(x·2^20) bigints;
the per-subspace codebook is the first K=16 corpus vectors' sub-slices
(seeds, exactly the x13/x23 seeding rule); assignment is exact-integer
argmin of squared distance with code-id tiebreak. Every distance is
integer arithmetic — bit-identical in Spark and DuckDB. Max term:
(2·2^20)² ≈ 4.4e12 × 8 dims × 8 subspaces ≪ 2^63, no overflow.

Scale notes: code assignment is a narrow map over a broadcast
codebook (K·M = 128 rows); the ADC scan shuffles only (probe, vec_id,
partial-distance) triples and aggregates map-side; top-k is a
per-probe window over ~corpus rows with fixed-width keys. Nothing
carries the raw vectors past the encode stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from calaveras_uniteus_etl_spark.operators import similarity as sim
from calaveras_uniteus_etl_spark.plans.catalog import register
from calaveras_uniteus_etl_spark.plans.tables import table

_SCALE = 1 << 20  # fixed-point factor, same as x23's k-means
_M = 8  # subspaces
_SUB = sim.EMBED_DIM // _M  # dims per subspace (8)
_K = 16  # codes per subspace → 4-bit codes
_N_PROBES = 8  # query vectors for the ADC top-k
_TOPK = 5

_Q_SQL = (
    "list_transform(CAST(embedding AS DOUBLE[]), "
    f"x -> CAST(floor(x * {_SCALE}) AS BIGINT))"
)

# Shared DuckDB CTE: quantized vectors, seed codebook, per-subspace
# integer argmin assignment. dims d and subspaces m are 0-based;
# DuckDB lists are 1-indexed, hence the +1.
_PQ_CTE = f"""
  qvecs AS (
    SELECT vec_id, {_Q_SQL} AS q FROM embeddings
  ), cb AS (
    SELECT vec_id AS code, q FROM qvecs WHERE vec_id < {_K}
  ), dists AS (
    SELECT v.vec_id, m.m, c.code,
           SUM((v.q[m.m * {_SUB} + d.d + 1] - c.q[m.m * {_SUB} + d.d + 1])
               * (v.q[m.m * {_SUB} + d.d + 1] - c.q[m.m * {_SUB} + d.d + 1]))
             AS sqdist
    FROM qvecs v
    CROSS JOIN (SELECT unnest(range({_M})) AS m) m
    CROSS JOIN cb c
    CROSS JOIN (SELECT unnest(range({_SUB})) AS d) d
    GROUP BY v.vec_id, m.m, c.code
  ), codes AS (
    SELECT vec_id, m, code, sqdist FROM (
      SELECT vec_id, m, code, sqdist,
             ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                ORDER BY sqdist, code) AS rn
      FROM dists
    ) WHERE rn = 1
  )"""


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e.select(
        "vec_id",
        F.expr(
            "transform(cast(embedding as array<double>), "
            f"x -> cast(floor(x * {_SCALE}) as bigint))"
        ).alias("q"),
    )


def _sqdist(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, t) -> acc + t)"
    )


def _assign_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, m, code, sqdist): per-subspace argmin over the broadcast
    codebook — the PQ encode stage; the corpus is scanned once."""
    qv = _quantized(spark, sf_dir)
    subs = qv.select(
        "vec_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {_M - 1}), "
                f"m -> struct(m as m, slice(q, m * {_SUB} + 1, {_SUB}) as sub))"
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.m").alias("m"), F.col("s.sub").alias("sub"))
    cb = (
        qv.filter(F.col("vec_id") < _K)
        .select(
            F.col("vec_id").alias("code"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, {_M - 1}), "
                    f"m -> struct(m as m, slice(q, m * {_SUB} + 1, {_SUB}) as csub))"
                )
            ).alias("s"),
        )
        .select("code", F.col("s.m").alias("cm"), F.col("s.csub").alias("csub"))
    )
    scored = subs.join(F.broadcast(cb), F.col("m") == F.col("cm")).select(
        "vec_id", "m", "code", _sqdist("sub", "csub").alias("sqdist")
    )
    w = Window.partitionBy("vec_id", "m").orderBy("sqdist", "code")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "x56_pq_codes",
    oracle=f"""
WITH {_PQ_CTE}
SELECT vec_id, CAST(m AS BIGINT) AS m, CAST(code AS BIGINT) AS code,
       CAST(sqdist AS BIGINT) AS sqdist
FROM codes
""",
    doc="PQ encode: 64-dim vectors → 8 sub-space code indices (4-bit "
    "codes from a 16-seed codebook), exact-integer argmin with code "
    "tiebreak. One corpus scan against a 128-row broadcast codebook; "
    "output is 8 bytes/vector — the 100 TB memory story.",
)
def x56_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _assign_codes(spark, sf_dir).select(
        "vec_id",
        F.col("m").cast("bigint").alias("m"),
        F.col("code").cast("bigint").alias("code"),
        "sqdist",
    )


@register(
    "x57_pq_ann_topk",
    oracle=f"""
WITH {_PQ_CTE}, probes AS (
    SELECT vec_id AS probe_id, q FROM qvecs WHERE vec_id < {_N_PROBES}
  ), lut AS (
    SELECT p.probe_id, m.m, c.code,
           SUM((p.q[m.m * {_SUB} + d.d + 1] - c.q[m.m * {_SUB} + d.d + 1])
               * (p.q[m.m * {_SUB} + d.d + 1] - c.q[m.m * {_SUB} + d.d + 1]))
             AS part
    FROM probes p
    CROSS JOIN (SELECT unnest(range({_M})) AS m) m
    CROSS JOIN cb c
    CROSS JOIN (SELECT unnest(range({_SUB})) AS d) d
    GROUP BY p.probe_id, m.m, c.code
  ), adc AS (
    SELECT l.probe_id, k.vec_id, SUM(l.part) AS adc_dist
    FROM codes k JOIN lut l ON l.m = k.m AND l.code = k.code
    WHERE k.vec_id <> l.probe_id
    GROUP BY l.probe_id, k.vec_id
  )
SELECT probe_id, vec_id, CAST(adc_dist AS BIGINT) AS adc_dist,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT probe_id, vec_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY adc_dist, vec_id) AS rank
  FROM adc
) WHERE rank <= {_TOPK}
""",
    doc="PQ-ADC top-k: per-probe lookup table (probe × subspace × code "
    "= 1024 rows, broadcast) joined to the 8-byte code relation; "
    "distance is the map-side SUM of 8 LUT entries, top-k a "
    "per-probe window. The corpus-sized scan carries codes only — "
    "the asymmetric-distance shape that stays in memory at 100 TB.",
)
def x57_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = _assign_codes(spark, sf_dir).select("vec_id", "m", "code")
    qv = _quantized(spark, sf_dir)
    probes = qv.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("q").alias("pq")
    )
    cb = (
        qv.filter(F.col("vec_id") < _K)
        .select(
            F.col("vec_id").alias("code"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, {_M - 1}), "
                    f"m -> struct(m as m, slice(q, m * {_SUB} + 1, {_SUB}) as csub))"
                )
            ).alias("s"),
        )
        .select("code", F.col("s.m").alias("m"), F.col("s.csub").alias("csub"))
    )
    lut = (
        probes.crossJoin(F.broadcast(cb))  # P×M×K = 1024 rows: constant
        .select(
            "probe_id",
            "m",
            "code",
            _sqdist(f"slice(pq, m * {_SUB} + 1, {_SUB})", "csub").alias("part"),
        )
    )
    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .groupBy("probe_id", "vec_id")
        .agg(F.sum("part").alias("adc_dist"))
    )
    w = Window.partitionBy("probe_id").orderBy("adc_dist", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOPK)
        .select(
            "probe_id",
            "vec_id",
            "adc_dist",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# X64 — IVF-PQ with asymmetric distance (IVFADC; Jégou et al. 2011 §IV)
#
# The production-scale composition of x13 and x56/x57: a coarse
# quantizer cuts the candidate set to nprobe inverted lists, and PQ
# codes computed on the RESIDUAL (vector − its coarse centroid) cut
# the memory — residual energy is much smaller than vector energy, so
# the same code budget buys finer resolution. Query time: per probed
# cell, a (subspace × code) lookup table against the probe's residual
# in that cell; candidate distance is a sum of M table entries over
# vectors whose coarse cell was probed.
#
# Deterministic construction (same rules as the module header): fixed-
# point integer vectors; coarse centroids = first C corpus vectors;
# residual codebook = residuals of the first K vectors; every argmin
# is exact-integer with id tiebreak — bit-identical in both engines.
# Residual elements are bounded by 2·2^20, so a subspace term is
# ≤ (4·2^20)² · 8 ≈ 1.4e14 ≪ 2^63: no overflow anywhere.
#
# Scale notes: the corpus-sized relations carry (vec_id, cid) and the
# 8-byte codes only; centroids (C=8), codebook (K·M=128) and the LUT
# (P·nprobe·M·K=1024) are all broadcast. The ADC join hits only the
# vectors in probed cells — nprobe/C of the corpus — and aggregates
# map-side. This is the plan you run when 100 TB of embeddings will
# neither fit in memory raw nor be scanned per query.
# ---------------------------------------------------------------------------

_C = 8  # coarse cells (IVF lists)
_NPROBE = 2
_P = 4  # query vectors
_DIM = sim.EMBED_DIM


@register(
    "x64_ivfpq_adc",
    oracle=f"""
WITH qvecs AS (
    SELECT vec_id, {_Q_SQL} AS q FROM embeddings
  ), cents AS (
    SELECT vec_id AS cid, q AS cq FROM qvecs WHERE vec_id < {_C}
  ), cdist AS (
    SELECT v.vec_id, c.cid,
           SUM((v.q[d.d + 1] - c.cq[d.d + 1])
               * (v.q[d.d + 1] - c.cq[d.d + 1])) AS sqd
    FROM qvecs v
    CROSS JOIN cents c
    CROSS JOIN (SELECT unnest(range({_DIM})) AS d) d
    GROUP BY v.vec_id, c.cid
  ), assign AS (
    SELECT vec_id, cid FROM (
      SELECT vec_id, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sqd, cid) AS rn
      FROM cdist
    ) WHERE rn = 1
  ), res AS (
    SELECT v.vec_id, a.cid,
           list_transform(range(1, {_DIM + 1}), i -> v.q[i] - c.cq[i]) AS r
    FROM qvecs v
    JOIN assign a ON a.vec_id = v.vec_id
    JOIN cents c ON c.cid = a.cid
  ), cb AS (
    SELECT vec_id AS code, r AS cr FROM res WHERE vec_id < {_K}
  ), rdists AS (
    SELECT v.vec_id, m.m, c.code,
           SUM((v.r[m.m * {_SUB} + d.d + 1] - c.cr[m.m * {_SUB} + d.d + 1])
               * (v.r[m.m * {_SUB} + d.d + 1] - c.cr[m.m * {_SUB} + d.d + 1]))
             AS sqdist
    FROM res v
    CROSS JOIN (SELECT unnest(range({_M})) AS m) m
    CROSS JOIN cb c
    CROSS JOIN (SELECT unnest(range({_SUB})) AS d) d
    GROUP BY v.vec_id, m.m, c.code
  ), codes AS (
    SELECT vec_id, m, code FROM (
      SELECT vec_id, m, code,
             ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                ORDER BY sqdist, code) AS rn
      FROM rdists
    ) WHERE rn = 1
  ), plist AS (
    SELECT vec_id AS probe_id, cid FROM (
      SELECT vec_id, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sqd, cid) AS rn
      FROM cdist WHERE vec_id < {_P}
    ) WHERE rn <= {_NPROBE}
  ), pres AS (
    SELECT pl.probe_id, pl.cid,
           list_transform(range(1, {_DIM + 1}), i -> q.q[i] - c.cq[i]) AS pr
    FROM plist pl
    JOIN qvecs q ON q.vec_id = pl.probe_id
    JOIN cents c ON c.cid = pl.cid
  ), lut AS (
    SELECT p.probe_id, p.cid, m.m, c.code,
           SUM((p.pr[m.m * {_SUB} + d.d + 1] - c.cr[m.m * {_SUB} + d.d + 1])
               * (p.pr[m.m * {_SUB} + d.d + 1] - c.cr[m.m * {_SUB} + d.d + 1]))
             AS part
    FROM pres p
    CROSS JOIN (SELECT unnest(range({_M})) AS m) m
    CROSS JOIN cb c
    CROSS JOIN (SELECT unnest(range({_SUB})) AS d) d
    GROUP BY p.probe_id, p.cid, m.m, c.code
  ), adc AS (
    SELECT l.probe_id, k.vec_id, SUM(l.part) AS adc_dist
    FROM codes k
    JOIN assign a ON a.vec_id = k.vec_id
    JOIN lut l ON l.cid = a.cid AND l.m = k.m AND l.code = k.code
    WHERE k.vec_id <> l.probe_id
    GROUP BY l.probe_id, k.vec_id
  )
SELECT probe_id, vec_id, CAST(adc_dist AS BIGINT) AS adc_dist,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT probe_id, vec_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY adc_dist, vec_id) AS rank
  FROM adc
) WHERE rank <= {_TOPK}
""",
    doc="IVF-PQ ADC top-k (IVFADC): coarse cells from 8 deterministic "
    "centroids, 4-bit PQ codes on the coarse residuals, per-probe "
    "per-cell lookup tables (1024 rows, broadcast), candidates "
    "restricted to nprobe=2 probed cells. The memory-and-candidate "
    "bounded ANN plan for corpus-scale embeddings.",
)
def x64_ivfpq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = _quantized(spark, sf_dir)
    cents = qv.filter(F.col("vec_id") < _C).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cq")
    )
    # coarse distances once for BOTH corpus assignment and probe lists
    cdist = qv.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", _sqdist("q", "cq").alias("sqd")
    )
    w_vec = Window.partitionBy("vec_id").orderBy("sqd", "cid")
    ranked = cdist.withColumn("rn", F.row_number().over(w_vec))
    assign = ranked.filter(F.col("rn") == 1).select("vec_id", "cid")
    plist = (
        ranked.filter((F.col("vec_id") < _P) & (F.col("rn") <= _NPROBE))
        .select(F.col("vec_id").alias("probe_id"), "cid")
    )
    res = (
        qv.join(assign, "vec_id")
        .join(F.broadcast(cents), "cid")
        .select(
            "vec_id",
            "cid",
            F.expr("zip_with(q, cq, (x, y) -> x - y)").alias("r"),
        )
    )
    sub_expr = (
        f"transform(sequence(0, {_M - 1}), "
        f"m -> struct(m as m, slice(r, m * {_SUB} + 1, {_SUB}) as sub))"
    )
    cb = (
        res.filter(F.col("vec_id") < _K)
        .select(
            F.col("vec_id").alias("code"),
            F.explode(F.expr(sub_expr)).alias("s"),
        )
        .select("code", F.col("s.m").alias("m"), F.col("s.sub").alias("csub"))
    )
    # cid rides along through encode so the ADC stage needs no join
    # back to the assignment — one corpus-corpus join fewer.
    subs = res.select(
        "vec_id", "cid", F.explode(F.expr(sub_expr)).alias("s")
    ).select(
        "vec_id", "cid", F.col("s.m").alias("m"), F.col("s.sub").alias("sub")
    )
    w_code = Window.partitionBy("vec_id", "m").orderBy("sqdist", "code")
    codes = (
        subs.join(F.broadcast(cb), "m")
        .select(
            "vec_id", "cid", "m", "code", _sqdist("sub", "csub").alias("sqdist")
        )
        .withColumn("rn", F.row_number().over(w_code))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid", "m", "code")
    )
    pres = (
        plist.join(qv, F.col("probe_id") == F.col("vec_id"))
        .join(F.broadcast(cents), "cid")
        .select(
            "probe_id",
            "cid",
            F.expr("zip_with(q, cq, (x, y) -> x - y)").alias("pr"),
        )
    )
    lut = pres.crossJoin(F.broadcast(cb.withColumnRenamed("m", "cm"))).select(
        "probe_id",
        "cid",
        F.col("cm").alias("m"),
        "code",
        _sqdist(f"slice(pr, cm * {_SUB} + 1, {_SUB})", "csub").alias("part"),
    )
    adc = (
        codes.join(F.broadcast(lut), ["cid", "m", "code"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .groupBy("probe_id", "vec_id")
        .agg(F.sum("part").alias("adc_dist"))
    )
    w_top = Window.partitionBy("probe_id").orderBy("adc_dist", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w_top))
        .filter(F.col("rank") <= _TOPK)
        .select(
            "probe_id",
            "vec_id",
            "adc_dist",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )
