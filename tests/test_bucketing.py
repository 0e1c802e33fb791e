"""Bucketed co-located join: the no-shuffle fact-to-fact join path.

Writes two tables bucketed on the shared join key and asserts the join
plan contains NO shuffle exchange on either side — the physical
property that makes repeated large joins affordable at scale.
"""

from __future__ import annotations

from calaveras_uniteus_etl_spark.warehouse import Warehouse


def test_cobucketed_join_has_no_exchange(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    orders = spark.range(0, 1000).selectExpr(
        "id AS o_key", "cast(id % 7 as double) AS o_val"
    )
    items = spark.range(0, 3000).selectExpr(
        "id % 1000 AS l_key", "cast(id as double) AS l_val"
    )
    wh.write_bucketed("b_orders", orders, ["o_key"], n_buckets=8)
    wh.write_bucketed("b_items", items, ["l_key"], n_buckets=8)

    # hint to sort-merge: at test row counts Catalyst would broadcast,
    # which bypasses bucketing entirely; at fact-table scale SMJ is the
    # strategy the bucketing exists for
    joined = (
        spark.table("b_orders")
        .hint("merge")
        .join(
            spark.table("b_items").hint("merge"),
            spark.table("b_orders").o_key == spark.table("b_items").l_key,
        )
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert joined.count() == 3000

    # sanity: the same SMJ over non-bucketed parquet DOES shuffle
    p1, p2 = str(tmp_path / "p1"), str(tmp_path / "p2")
    orders.write.parquet(p1)
    items.write.parquet(p2)
    a, b = spark.read.parquet(p1).hint("merge"), spark.read.parquet(p2).hint("merge")
    plain = a.join(b, a.o_key == b.l_key)
    assert "Exchange" in plain._jdf.queryExecution().executedPlan().toString()
