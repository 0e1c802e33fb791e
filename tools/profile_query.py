"""Per-query profiler: wall time, job/stage counts, and the formatted plan.

Usage: python tools/profile_query.py [--sf DIR] [--best N] [--plan-dir DIR] q1 q2 ...

For each query: runs it N times against a warm session (same count()
action as bench.py), reports best wall seconds plus how many Spark
jobs/stages/tasks the LAST run launched (from the status tracker), and
optionally writes `.explain("formatted")` to <plan-dir>/<name>.txt.
The job/stage census is the measurement §1 of the optimization guide
asks for without a UI: a 64-row query launching 40 stages is paying
scheduling, not compute.
"""

from __future__ import annotations

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
    ap.add_argument("--best", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from calaveras_uniteus_etl_spark.session import get_spark

    spark: SparkSession = get_spark(app_name="profile_query")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    from calaveras_uniteus_etl_spark.plans import REGISTRY

    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in args.names:
        spec = REGISTRY[name]
        # warmup run at the bench SF so codegen/broadcast paths are hot
        spec.fn(spark, args.sf).count()
        best = float("inf")
        jobs0 = stages0 = None
        for _ in range(args.best):
            j_before = tracker.getJobIdsForGroup(None)
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf)
            df.count()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            j_after = tracker.getJobIdsForGroup(None)
            new_jobs = sorted(set(j_after) - set(j_before))
            n_stages = 0
            n_tasks = 0
            for j in new_jobs:
                info = tracker.getJobInfo(j)
                if info is not None:
                    n_stages += len(info.stageIds)
                    for s in info.stageIds:
                        si = tracker.getStageInfo(s)
                        if si is not None:
                            n_tasks += si.numTasks
            if dt < best:
                best = dt
                jobs0, stages0 = len(new_jobs), n_stages
        plan_txt = None
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = spec.fn(spark, args.sf)
            plan_txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plan_dir, f"{name}.txt"), "w") as f:
                f.write(plan_txt)
        n_exchange = plan_txt.count("Exchange") if plan_txt else None
        out[name] = {
            "best_s": round(best, 3),
            "jobs": jobs0,
            "stages": stages0,
            "exchanges": n_exchange,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
