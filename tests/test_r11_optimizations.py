"""Focused equivalence tests for the round-11 optimization rewrites.

Each test pins the EXACT property a rewrite relies on, on synthetic
frames where the old and new shapes can be compared directly — the
oracle gate already proves end-to-end equality on the real tables;
these keep the internals honest if someone edits them later.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_min_struct_argmin_matches_window_rank(spark):
    """_km_assign_spark's MIN(STRUCT(dist, cid)) must reproduce the
    ROW_NUMBER() OVER (ORDER BY dist ASC, cid ASC) = 1 row exactly,
    ties included."""
    rows = [
        (1, 5.0, 2), (1, 5.0, 1), (1, 7.0, 0),   # tie on dist -> cid 1
        (2, 0.0, 9), (2, 0.0, 3), (2, 0.0, 4),   # triple tie -> cid 3
        (3, 2.0, 7),
    ]
    df = spark.createDataFrame(rows, "vec_id int, dist double, cid int")
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cid"))
    via_window = {
        (r.vec_id, r.cid)
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    via_agg = {
        (r.vec_id, r.cid)
        for r in df.groupBy("vec_id")
        .agg(F.min(F.struct(F.col("dist"), F.col("cid")))["cid"].alias("cid"))
        .collect()
    }
    assert via_agg == via_window


def test_neg_coalesce_inf_reproduces_desc_nulls_last(spark):
    """x42's MIN(STRUCT(coalesce(-cc, +inf), cid)) must reproduce
    ORDER BY cc DESC NULLS LAST, cid ASC rank-1 — including the
    all-null and negative-zero corners."""
    rows = [
        (1, 0.9, 2), (1, None, 0), (1, 0.9, 1),      # tie -> cid 1
        (2, None, 5), (2, None, 4),                   # all null -> cid 4
        (3, 0.0, 8), (3, -0.0, 6),                    # -0.0 == 0.0 -> cid 6
    ]
    df = spark.createDataFrame(rows, "vec_id int, cc double, cid int")
    w = Window.partitionBy("vec_id").orderBy(F.desc("cc"), F.asc("cid"))
    via_window = {
        (r.vec_id, r.cid)
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    via_agg = {
        (r.vec_id, r.cid)
        for r in df.groupBy("vec_id")
        .agg(
            F.min(
                F.struct(
                    F.coalesce(-F.col("cc"), F.lit(float("inf"))).alias("o"),
                    F.col("cid").alias("cid"),
                )
            )["cid"].alias("cid")
        )
        .collect()
    }
    assert via_agg == via_window


def test_sorted_array_pair_generation_matches_self_join(spark):
    """e15/x73/x141's nested-transform pair census must equal the
    self-join's counts — including single-member keys (the
    sequence(0,-1) guard) and keys whose pairs repeat across rows."""
    rows = [
        (10, 3), (10, 1), (10, 2),
        (11, 5),                      # singleton: no pairs
        (12, 2), (12, 1),
        (13, 1), (13, 2),             # same pair as key 12
    ]
    df = spark.createDataFrame(rows, "k bigint, m bigint")
    a, b = df.alias("a"), df.alias("b")
    via_join = {
        (r.pa, r.pb): r.c
        for r in a.join(
            b, (F.col("a.k") == F.col("b.k")) & (F.col("a.m") < F.col("b.m"))
        )
        .groupBy(F.col("a.m").alias("pa"), F.col("b.m").alias("pb"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    per_k = df.groupBy("k").agg(F.sort_array(F.collect_list("m")).alias("ms"))
    via_arrays = {
        (r.pa, r.pb): r.c
        for r in per_k.filter(F.size("ms") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, size(ms) - 2), i -> "
                    "transform(sequence(i + 1, size(ms) - 1), j -> "
                    "struct(ms[i] as pa, ms[j] as pb))))"
                )
            ).alias("t")
        )
        .groupBy(F.col("t.pa").alias("pa"), F.col("t.pb").alias("pb"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert via_arrays == via_join


def test_triangle_products_match_explode_self_join(spark):
    """x63/x145's per-row upper-triangle flatten must equal the
    (vec_id, dim) explode self-join's per-(di, dj) product sums."""
    rows = [(1, [2, -3, 5]), (2, [0, 7, 1])]
    df = spark.createDataFrame(rows, "vec_id int, qa array<bigint>")
    q = df.select("vec_id", F.posexplode("qa").alias("dim", "qv"))
    a, b = q.alias("a"), q.alias("b")
    via_join = {
        (r.di, r.dj): r.sxy
        for r in a.join(
            b,
            (F.col("a.vec_id") == F.col("b.vec_id"))
            & (F.col("a.dim") <= F.col("b.dim")),
        )
        .groupBy(F.col("a.dim").alias("di"), F.col("b.dim").alias("dj"))
        .agg(F.sum(F.col("a.qv") * F.col("b.qv")).alias("sxy"))
        .collect()
    }
    tri = F.expr(
        "flatten(transform(sequence(0, 2), i -> "
        "transform(sequence(i, 2), j -> "
        "struct(i as di, j as dj, qa[i] * qa[j] as p))))"
    )
    via_arrays = {
        (r.di, r.dj): r.sxy
        for r in df.select(F.explode(tri).alias("t"))
        .groupBy(F.col("t.di").alias("di"), F.col("t.dj").alias("dj"))
        .agg(F.sum("t.p").alias("sxy"))
        .collect()
    }
    assert via_arrays == via_join


def test_bm25_doc_stats_match_token_stream(spark, sf_dir):
    """_bm25_doc_stats (size(split) lengths + query-term array filter)
    must reproduce the former exploded token stream's per-doc lengths
    and query-term counts on the real corpus."""
    from calaveras_uniteus_etl_spark.plans.queries_text import (
        _BM25_TERMS,
        _bm25_doc_stats,
    )
    from calaveras_uniteus_etl_spark.operators.dedup import NORM_SPARK
    from calaveras_uniteus_etl_spark.plans.tables import table

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.expr(f"split({NORM_SPARK.format(col='text')}, ' ')")
        ).alias("term"),
    )
    old_lens = {r.doc_id: r.dl for r in toks.groupBy("doc_id").agg(F.count("*").alias("dl")).collect()}
    old_tf = {
        (r.doc_id, r.term): r.tf
        for r in toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .collect()
    }
    docs = _bm25_doc_stats(spark, sf_dir)  # r12: reads the tokenized-corpus artifact
    new_lens = {r.doc_id: r.dl for r in docs.select("doc_id", "dl").collect()}
    new_tf = {
        (r.doc_id, r.term): r.tf
        for r in docs.select("doc_id", F.explode("qtoks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .collect()
    }
    assert new_lens == old_lens
    assert new_tf == old_tf


def test_jvm_function_cache_is_installed_and_transparent(spark):
    """The session-module lookup memo must be installed, hit its cache
    on repeat calls, and return working JavaMember handles."""
    from pyspark.sql.functions import builtin as b

    assert getattr(b._get_jvm_function, "_cuetl_cached", False)
    sc = spark.sparkContext
    f1 = b._get_jvm_function("lit", sc)
    f2 = b._get_jvm_function("lit", sc)
    assert f1 is f2  # memoized handle, not a fresh reflection lookup
    assert spark.range(1).select(F.lit(42).alias("x")).first().x == 42
