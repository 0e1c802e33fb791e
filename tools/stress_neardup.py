"""10x-replication stress probe for the near-dup/membership miners.

Builds a worst-case duplicate-density corpus — every sf0.1 document
replicated 10 times under distinct doc_ids (50k docs, 10 exact copies
each) — and times the pair-mining / membership stages on it. This is
the README's "Measured scaling" evidence: candidate volume must track
true duplicate mass (clusters x C(10,2)), never corpus size squared,
and the bucket caps must keep the tails bounded.

Usage: python tools/stress_neardup.py [base_sf_dir] [replicas]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("stress-neardup")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="stress_sf_")
    try:
        d = spark.read.parquet(os.path.join(base, "documents.parquet"))
        n_base = d.count()
        reps_df = spark.range(reps).select(F.col("id").alias("rep"))
        big = (
            d.crossJoin(reps_df)
            .select(
                (F.col("rep") * 1_000_000 + F.col("doc_id")).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            )
        )
        big.write.parquet(os.path.join(tmp, "documents.parquet"))
        print(f"corpus: {n_base} base docs x {reps} = {n_base * reps}")

        from calaveras_uniteus_etl_spark.plans import REGISTRY

        for name in (
            "x2_minhash_signatures",
            "x2_minhash_lsh_pairs",
            "x33_source_overlap",
            "x34_bloom_membership",
            "x36_cluster_size_dist",
        ):
            t0 = time.time()
            n = REGISTRY[name].fn(spark, tmp).count()
            print(f"{name:28s} {time.time() - t0:7.2f}s  rows={n}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
