"""Isolated per-query timing: warm session, best-of-N wall time.

Usage: python tools/time_queries.py [--sf DIR] [--best N] q1 q2 ...
Prints one JSON line {name: best_sec, ...}. The session is warmed with
one throwaway action so JVM/codegen startup is not billed to the first
query.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--best", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("time_queries")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm

    from calaveras_uniteus_etl_spark.plans import REGISTRY

    out = {}
    for name in args.names:
        spec = REGISTRY[name]
        best = float("inf")
        for _ in range(args.best):
            t0 = time.perf_counter()
            spec.fn(spark, args.sf).collect()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
