"""Dump `.explain("formatted")` for named queries to files.

Usage: python tools/plan_snapshot.py OUT_DIR SUFFIX [--sf DIR] q1 q2 ...

Writes OUT_DIR/<name>_<SUFFIX>.txt for each query — the before/after
plan evidence for optimization rounds. Queries whose construction
eagerly executes a pinned subtree (localCheckpoint) will run that
subtree; everything else stays unexecuted.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("suffix")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from calaveras_uniteus_etl_spark.session import get_spark

    spark = get_spark(app_name="plan_snapshot")
    spark.sparkContext.setLogLevel("ERROR")

    from calaveras_uniteus_etl_spark.plans import REGISTRY

    os.makedirs(args.out_dir, exist_ok=True)
    for name in args.names:
        df = REGISTRY[name].fn(spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
