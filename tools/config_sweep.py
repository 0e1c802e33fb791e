"""Config-adversarial correctness sweep.

The cross-engine contract (plans/_exact.py) claims results are
independent of partitioning and physical strategy: decimal-exact sums,
total orders under every LIMIT, engine-neutral hashes. This sweep
re-runs the ENTIRE oracled registry against DuckDB under deliberately
hostile Spark configs — a prime shuffle-partition count (different
partition boundaries), AQE disabled (no runtime coalescing), broadcast
joins disabled (every join becomes a shuffle join, so join-side
ordering changes), and whole-stage codegen off (interpreted evaluation
path) — and fails if ANY query's value canon drifts under ANY config.

Usage: python tools/config_sweep.py [sf_dir] [config|-] [query ...]
(config "-" = all configs; trailing query names restrict the sweep —
used to pre-check a round's new additions before the full receipt run)
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

CONFIGS = {
    "prime_partitions": {"spark.sql.shuffle.partitions": "7"},
    "aqe_off": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "13",
    },
    "no_broadcast": {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "5",
    },
    "no_codegen": {
        "spark.sql.codegen.wholeStage": "false",
        "spark.sql.shuffle.partitions": "11",
    },
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only_cfg = sys.argv[2] if len(sys.argv) > 2 else None
    if only_cfg == "-":
        only_cfg = None
    only_queries = set(sys.argv[3:])

    failures: list[tuple[str, str, str]] = []
    for cfg_name, conf in CONFIGS.items():
        if only_cfg and cfg_name != only_cfg:
            continue
        # Fresh JVM per config: these confs must apply at session build.
        from pyspark.sql import SparkSession

        builder = (
            SparkSession.builder.master("local[16]")
            .appName(f"config-sweep-{cfg_name}")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "8g")
        )
        for k, v in conf.items():
            builder = builder.config(k, v)
        spark = builder.getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")

        from calaveras_uniteus_etl_spark.plans import REGISTRY
        from tests.oracle_harness import compare

        t0 = time.time()
        n = 0
        for name, spec in REGISTRY.items():
            if spec.oracle is None:
                continue
            if only_queries and name not in only_queries:
                continue
            n += 1
            try:
                r = compare(spark, sf_dir, name)
                ok = r["rows_match"] and r["cols_match"] and r["values_match"]
                if not ok:
                    failures.append((cfg_name, name, str(r.get("first_diffs", ""))[:200]))
                    print(f"FAIL [{cfg_name}] {name}")
            except Exception as exc:  # noqa: BLE001
                failures.append((cfg_name, name, repr(exc)[:200]))
                print(f"ERROR [{cfg_name}] {name}: {exc!r}"[:300])
        print(f"[{cfg_name}] {n} oracled queries in {time.time()-t0:.0f}s")
        spark.stop()
        # a stopped session leaves a dead default in the builder cache
        SparkSession.builder._options = {}

    print(f"sweep failures: {failures if failures else 'NONE'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
