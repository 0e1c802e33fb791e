"""operators/salting.py — reusable skew-proof join.

Proofs: (1) result equivalence with the plain join on skewed data,
(2) the physical plan actually spreads the hot key (join keys include
the salt; ShuffledHashJoin under the hint), (3) salt determinism
across evaluations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from calaveras_uniteus_etl_spark.operators.salting import (
    SALT_COL,
    fact_salt,
    salted_join,
)


def _skewed(spark):
    # 5000 fact rows, 90% on key 1 (the hot key), dim of 10 keys
    fact = spark.range(5000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, 1)
        .otherwise(F.col("id") % 10)
        .alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    dim = spark.range(10).select(
        F.col("id").alias("dk"), F.concat(F.lit("g"), F.col("id")).alias("grp")
    )
    return fact, dim


def test_salted_join_matches_plain_join(spark):
    fact, dim = _skewed(spark)
    got = sorted(
        (r.row_id, r.grp)
        for r in salted_join(
            fact, dim, "k", "dk", salt_from="row_id", n_salts=6
        ).collect()
    )
    want = sorted(
        (r.row_id, r.grp)
        for r in fact.join(dim, fact.k == dim.dk).collect()
    )
    assert got == want and len(want) == 5000


def test_salted_join_plan_contains_salted_keys(spark):
    fact, dim = _skewed(spark)
    plan = (
        salted_join(fact, dim, "k", "dk", salt_from="row_id", n_salts=6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin" in plan, plan
    assert SALT_COL in plan, plan  # the join key set includes the salt


def test_fact_salt_deterministic_and_bounded(spark):
    df = spark.range(500).select(
        "id", fact_salt("id", 7).alias("s1"), fact_salt("id", 7).alias("s2")
    )
    rows = df.collect()
    assert all(r.s1 == r.s2 for r in rows)
    assert {r.s1 for r in rows} <= set(range(7))
    # all salts used (uniformity smoke)
    assert len({r.s1 for r in rows}) == 7
