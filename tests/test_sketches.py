"""Direct library-API tests for operators/sketches.py.

The registry queries (x117/x118/x120/x122) prove the sketches against
DuckDB; these prove the OPERATOR surface users compose directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from calaveras_uniteus_etl_spark.operators.sketches import (
    HLL_M,
    histogram_bins,
    histogram_quantiles,
    hll_distinct,
    hll_merge,
    hll_registers,
    hll_summarize,
)


def test_hll_distinct_is_close_and_duplicates_are_free(spark):
    df = spark.range(5000).select(F.col("id"))
    dup = df.unionAll(df).unionAll(df)  # duplicates must not move the sketch
    [a] = hll_distinct(df, "id").collect()
    [b] = hll_distinct(dup, "id").collect()
    assert a["sum_scaled"] == b["sum_scaled"]
    assert abs(a["hll_estimate"] - 5000) / 5000 < 4 * 1.04 / (HLL_M ** 0.5)


def test_hll_merge_any_sharding_equals_global(spark):
    df = spark.range(3000)
    global_regs = {
        (r["idx"],): r["mr"] for r in hll_registers(df, "id").collect()
    }
    for nshards in (2, 7):
        sharded = df.withColumn("s", (F.col("id") % nshards).cast("int"))
        merged = hll_merge(hll_registers(sharded, "id", "s"))
        got = {(r["idx"],): r["mr"] for r in merged.collect()}
        assert got == global_regs, nshards


def test_hll_summarize_groups(spark):
    df = spark.range(4000).select(
        F.col("id"), (F.col("id") % 2).alias("g")
    )
    rows = {
        r["g"]: r
        for r in hll_summarize(hll_registers(df, "id", "g"), "g").collect()
    }
    assert set(rows) == {0, 1}
    for r in rows.values():
        assert abs(r["hll_estimate"] - 2000) / 2000 < 4 * 1.04 / (HLL_M ** 0.5)


def test_histogram_quantiles_median_of_uniform(spark):
    df = spark.range(10000).select((F.col("id") * 6000).alias("v"))
    bins = histogram_bins(df, "v", bins=256, domain=60_000_000)
    rows = {
        r["q"]: r
        for r in histogram_quantiles(
            bins, (50, 99), bins=256, domain=60_000_000
        ).collect()
    }
    w = 60_000_000 // 256
    assert abs(rows[50]["est_cents"] - 30_000_000) <= w
    assert abs(rows[99]["est_cents"] - 59_400_000) <= w
    assert all(r["n_total"] == 10000 for r in rows.values())


def test_histogram_bins_clamp_and_merge(spark):
    df = spark.range(100).select((F.lit(10) ** 9).alias("v"))  # past domain
    bins = histogram_bins(df, "v", bins=256, domain=60_000_000).collect()
    assert len(bins) == 1 and bins[0]["bin"] == 255 and bins[0]["cnt"] == 100
