"""10x-replication stress probe for the near-dup/membership miners.

Builds a worst-case duplicate-density corpus — every sf0.1 document
replicated 10 times under distinct doc_ids (50k docs, 10 exact copies
each) — and times the pair-mining / membership stages on it, next to
the same stages on the unreplicated base corpus. This is the README's
"Measured scaling" evidence: candidate volume must track true duplicate
mass (clusters x C(10,2)), never corpus size squared, and the bucket
caps must keep the tails bounded.

Writes a BENCH-style JSON line to BENCH_STRESS.json at the repo root:
per-query seconds and row counts at 1x and Rx plus the time-scaling
ratio, so the scale story is a recorded artifact rather than prose.

Usage: python tools/stress_neardup.py [base_sf_dir] [replicas]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_MINERS = (
    "x2_minhash_signatures",
    "x2_minhash_lsh_pairs",
    "x33_source_overlap",
    "x34_bloom_membership",
    "x36_cluster_size_dist",
)


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

    from calaveras_uniteus_etl_spark.plans import REGISTRY

    def run_suite(sf_dir: str) -> dict[str, dict[str, float]]:
        out = {}
        for name in _MINERS:
            t0 = time.time()
            n = REGISTRY[name].fn(spark, sf_dir).count()
            sec = time.time() - t0
            out[name] = {"sec": round(sec, 3), "rows": n}
            print(f"{name:28s} {sec:7.2f}s  rows={n}")
        return out

    # Warm the JVM/codegen on the base corpus first so the measured 1x
    # pass is not inflated by startup cost (which would fake sub-linear
    # ratios at 10x).
    print("--- warmup (unrecorded) ---")
    run_suite(base)

    print(f"--- base corpus ({base}) ---")
    base_stats = run_suite(base)

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
        print(f"--- {reps}x corpus: {n_base} base docs x {reps} = {n_base * reps} ---")
        big_stats = run_suite(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    queries = {}
    for name in _MINERS:
        b, g = base_stats[name], big_stats[name]
        queries[name] = {
            "sec_1x": b["sec"],
            "rows_1x": b["rows"],
            f"sec_{reps}x": g["sec"],
            f"rows_{reps}x": g["rows"],
            # <reps means sub-linear time scaling at reps-x data volume
            "time_ratio": round(g["sec"] / b["sec"], 2) if b["sec"] else None,
        }
    record = {
        "metric": "neardup_stress_total",
        "value": round(sum(s["sec"] for s in big_stats.values()), 2),
        "unit": "sec",
        "queries": queries,
        "sf": f"{base}@{reps}x",
        "base_docs": n_base,
        "stress_docs": n_base * reps,
    }
    out_path = os.path.join(_REPO, "BENCH_STRESS.json")
    with open(out_path, "w") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
