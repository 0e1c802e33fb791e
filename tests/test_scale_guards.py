"""Prove the quadratic-tail guards actually fire.

The LSH mega-bucket cap and the Jaccard posting df-cap are inactive at
the driver's test SFs (max bucket ≈20, max df = 25) — these tests build
the adversarial inputs the guards exist for (boilerplate-heavy corpora
where one bucket/shingle would otherwise dominate the self-join
quadratically) and assert the caps bound candidate volume instead of
letting it explode.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from calaveras_uniteus_etl_spark.operators import dedup as dd
from calaveras_uniteus_etl_spark.plans.queries_dedup import BUCKET_CAP


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    """1500 identical docs (one mega-bucket) + 50 distinct ones."""
    same = [(i, "the quick brown fox jumps over the lazy dog again and again") for i in range(1500)]
    diff = [(10_000 + i, f"unique document number {i} with its own distinct words {i * 7}") for i in range(50)]
    return spark.createDataFrame(same + diff, "doc_id long, text string")


def _lsh_bands(docs):
    d = dd.with_shingles(docs)
    sigs = (
        d.withColumn("hs", dd.shingle_hashes_expr())
        .withColumn("sig", dd.minhash_sig_expr())
        .select("doc_id", "sig")
    )
    return sigs.select(
        "doc_id", F.posexplode(dd.band_keys_expr()).alias("band", "band_key")
    )


def test_lsh_mega_bucket_cap_fires(spark, boilerplate_docs):
    bands = _lsh_bands(boilerplate_docs)
    occupancy = bands.groupBy("band", "band_key").count()
    assert occupancy.agg(F.max("count")).collect()[0][0] == 1500  # mega-bucket exists
    ok = occupancy.filter(F.col("count") <= BUCKET_CAP).drop("count")
    capped = bands.join(F.broadcast(ok), ["band", "band_key"])
    a, b = capped.alias("a"), capped.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).count()
    # uncapped, the identical docs alone contribute 1500*1499/2 pairs
    # per band (~4.5M over 4 bands); with the cap the mega-buckets are
    # dropped entirely and only the distinct-doc tail can pair up
    assert pairs < 100_000


def test_jaccard_posting_df_cap_fires(spark, boilerplate_docs):
    d = dd.with_shingles(boilerplate_docs)
    sh_all = d.select("doc_id", F.explode(dd.shingle_digests_expr()).alias("g"))
    df_counts = sh_all.groupBy("g").count()
    assert df_counts.agg(F.max("count")).collect()[0][0] >= 1500  # stop-shingles exist
    sh = (
        sh_all.withColumn("df", F.count("*").over(Window.partitionBy("g")))
        .filter(F.col("df") <= BUCKET_CAP)
        .drop("df")
    )
    # every posting that survives has a bounded list, so the self-join
    # is bounded by cap^2 per shingle instead of corpus^2
    remaining_max_df = (
        sh.groupBy("g").count().agg(F.max("count")).collect()[0][0]
    )
    assert remaining_max_df is None or remaining_max_df <= BUCKET_CAP
    pairs = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .count()
    )
    assert pairs < 200_000


def test_embedding_bucket_cap_shares_constant(spark):
    # the similarity path reuses the SAME cap constant — one knob to
    # tune at deploy time, no drift between the dedup and ANN miners
    from calaveras_uniteus_etl_spark.plans import queries_similarity as qs

    assert qs._BUCKET_CAP == BUCKET_CAP


# ---------------------------------------------------------------------------
# x71 degree-oriented triangle counting — property: equals the naive
# O(n^3) model on arbitrary small graphs (orientation must count every
# triangle exactly once, regardless of degree ties).
# ---------------------------------------------------------------------------


from hypothesis import HealthCheck as _HealthCheck
from hypothesis import given as _given
from hypothesis import settings as _hyp_settings
from hypothesis import strategies as _st


def _count_triangles_spark(spark, edge_list):
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(min(u, v), max(u, v)) for u, v in edge_list], "u long, v long"
    ).distinct()
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    rank = lambda d, n: d * F.lit(4294967296).cast("long") + n  # noqa: E731
    ranked = (
        edges.join(deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
        .select(
            "u", "v",
            rank(F.col("du"), F.col("u")).alias("ru"),
            rank(F.col("dv"), F.col("v")).alias("rv"),
        )
    )
    fwd = F.col("ru") < F.col("rv")
    ori = ranked.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(fwd, F.col("rv")).otherwise(F.col("ru")).alias("rdst"),
    )
    x, y = ori.alias("x"), ori.alias("y")
    wedge = x.join(
        y, (F.col("x.src") == F.col("y.src")) & (F.col("x.rdst") < F.col("y.rdst"))
    ).select(F.col("x.dst").alias("b"), F.col("y.dst").alias("c"))
    return wedge.join(
        ori, (F.col("src") == F.col("b")) & (F.col("dst") == F.col("c"))
    ).count()


@_hyp_settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[_HealthCheck.function_scoped_fixture],
)
@_given(
    edges=_st.lists(
        _st.tuples(
            _st.integers(min_value=0, max_value=9),
            _st.integers(min_value=0, max_value=9),
        ).filter(lambda e: e[0] != e[1]),
        min_size=0,
        max_size=30,
    )
)
def test_triangle_orientation_matches_naive(spark, edges):
    import itertools

    und = {frozenset(e) for e in edges}
    nodes = sorted({n for e in und for n in e})
    want = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if {frozenset((a, b)), frozenset((a, c)), frozenset((b, c))} <= und
    )
    if not und:
        return  # empty edge relation: createDataFrame needs rows
    got = _count_triangles_spark(spark, [tuple(e) for e in und])
    assert got == want
