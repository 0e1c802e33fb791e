"""Full-fidelity replica of the driver's correctness gate.

Builds a VANILLA SparkSession — no engine conf presets at all, exactly
like the driver's harness — and runs every registry query against its
DuckDB oracle at the given scale factor using the strict pandas canon
from tests/oracle_harness.py. Queries without an oracle get a
rows-only smoke run.

Usage:  python tools/driver_check.py [sf_dir] [query ...]
Prints one status line per query and a summary; exits non-zero if any
query fails.
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    # Vanilla on purpose: the plans must self-provision anything they
    # need (e.g. nanosAsLong inside plans/tables.py). Only perf knobs.
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("driver-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )

    sys.path.insert(0, ".")
    from calaveras_uniteus_etl_spark.plans import REGISTRY
    from tests.oracle_harness import compare

    unknown = sorted(set(only or []) - set(REGISTRY))
    if unknown:
        # a typo'd name must not read as an all-green run
        print(f"unknown query name(s): {unknown}")
        return 2

    failures = []
    t_all = time.time()
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            if spec.oracle is None:
                n = spec.fn(spark, sf_dir).count()
                status, detail = "rows-only", f"rows={n}"
            else:
                r = compare(spark, sf_dir, name)
                ok = r["rows_match"] and r["cols_match"] and r["values_match"]
                status = "PASS" if ok else "FAIL"
                detail = (
                    f"rows={r['spark_rows']}/{r['oracle_rows']} "
                    f"dtypes={r['dtype_diffs']} diffs={r['first_diffs'][:2]}"
                    if not ok
                    else f"rows={r['spark_rows']}"
                )
                if not ok:
                    failures.append(name)
        except Exception as ex:  # noqa: BLE001 — report and continue
            status, detail = "ERROR", repr(ex)[:200]
            failures.append(name)
        print(f"{status:9s} {name:32s} {time.time() - t0:6.2f}s  {detail}")
        sys.stdout.flush()

    n_run = len(only) if only else len(REGISTRY)
    print(
        f"\n{n_run - len(failures)}/{n_run} green in "
        f"{time.time() - t_all:.0f}s; failures: {failures}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
