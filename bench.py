#!/usr/bin/env python3
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect). A warmup
pass on the smallest table absorbs JVM/session startup so measurements
reflect query execution, not initialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Benchmark set = the ENTIRE registry, in registry order — every
# operator the engine claims is timed every round; nothing is cherry-
# picked. Resolved inside main() after the registry imports.


def _calibration() -> dict[str, float]:
    """Single-core CPU baseline recorded INTO the bench receipt.

    Box throughput varies ~1.3× between sessions with identical code
    (r9 bench moved 216.6→278.4s on a zero-query-diff tree; verified
    environmental by an A/B control). These three numbers — pure-Python
    loop, BLAS float64 matmul, hashlib md5 — let any two rounds' bench
    totals be normalized mechanically instead of argued. Measured
    BEFORE the Spark session exists, so the box is idle.
    """
    import hashlib

    import numpy as np

    t0 = time.perf_counter()
    acc = 0
    for i in range(20_000_000):
        acc += i
    py = time.perf_counter() - t0

    a = np.random.default_rng(0).random((2048, 2048))
    b = np.random.default_rng(1).random((2048, 2048))
    t0 = time.perf_counter()
    for _ in range(6):
        b = a @ b
        b *= 1e-4  # keep magnitudes bounded across iterations
    mm = time.perf_counter() - t0

    buf = b"\xa5" * (64 << 20)
    t0 = time.perf_counter()
    hashlib.md5(buf).hexdigest()
    md = time.perf_counter() - t0
    return {
        "py_loop_20M_s": round(py, 4),
        "matmul6x2048_s": round(mm, 4),
        "md5_64MB_s": round(md, 4),
    }


# Calibration probe assigned to each plan family (by query module).
# The embedding/ANN/PQ families are BLAS-bound (numpy matmul inside
# the one Arrow UDF and the index build); the dedup family is
# hash-throughput-bound (md5 signatures); everything else tracks the
# general single-core clock. The mapping is a CONVENTION — its job is
# to make round-over-round comparisons mechanical, not to be a perfect
# cost model.
_PROBE_BY_MODULE_SUFFIX = {
    "queries_similarity": "matmul6x2048_s",
    "queries_pq": "matmul6x2048_s",
    "queries_dedup": "md5_64MB_s",
    "queries_multimodal": "md5_64MB_s",
}
_DEFAULT_PROBE = "py_loop_20M_s"

# Sub-second queries show ±2x pure session noise (r10 verdict measured
# the same tree at 316.5s vs 285.0s totals); the regression gate only
# fires where the baseline signal exceeds it.
NOISE_FLOOR_S = 0.5
REGRESSION_RATIO = 1.5


def probe_for(name: str, registry) -> str:
    spec = registry.get(name)
    mod = getattr(spec.fn, "__module__", "") if spec is not None else ""
    return _PROBE_BY_MODULE_SUFFIX.get(mod.rsplit(".", 1)[-1], _DEFAULT_PROBE)


def normalized_ratios(
    timings: dict[str, float],
    calibration: dict[str, float],
    baseline: dict,
    registry,
) -> tuple[dict[str, float], list[str]]:
    """Per-query time ratio vs the baseline round, CPU-normalized.

    ratio = (t_now / probe_now) / (t_prev / probe_prev) with the probe
    chosen per plan family — so a round run on a 1.3x-slower box (or a
    box with 4.8x slower BLAS, as r10 was) compares ~1.0 for unchanged
    queries instead of needing a prose argument. Returns the ratio map
    and the regression list: ratio > REGRESSION_RATIO where the
    baseline time clears NOISE_FLOOR_S. New queries (absent from the
    baseline) are skipped.
    """
    prev_q = baseline.get("queries", {})
    prev_cal = baseline.get("calibration", {})
    ratios: dict[str, float] = {}
    regressions: list[str] = []
    for name, t_now in timings.items():
        t_prev = prev_q.get(name)
        if not t_prev:
            continue
        probe = probe_for(name, registry)
        c_now, c_prev = calibration.get(probe), prev_cal.get(probe)
        if not c_now or not c_prev:
            continue
        ratio = (t_now / c_now) / (t_prev / c_prev)
        ratios[name] = round(ratio, 4)
        if ratio > REGRESSION_RATIO and t_prev >= NOISE_FLOOR_S:
            regressions.append(name)
    return ratios, regressions


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    calibration = _calibration()
    from calaveras_uniteus_etl_spark.session import get_spark
    from calaveras_uniteus_etl_spark.plans import REGISTRY

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    headline = list(REGISTRY)

    # Warmup (JMH-style): run every headline query once at the smallest
    # SF so janino codegen + JIT + Python/Arrow worker startup happen
    # before the clock starts — measurements reflect query execution,
    # not per-process JVM initialization. The warmup SF is 100× smaller,
    # so no data-dependent work is amortized into it.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(sf_dir):
        for name in headline:
            spec = REGISTRY.get(name)
            if spec is not None:
                spec.fn(spark, warm_dir).count()

    # Session-index build cost, timed EXPLICITLY (ADVICE r07): the
    # per-query numbers below are deliberately warm-index marginal
    # costs — the production posture, where a corpus is indexed once
    # and amortized across the workload — so the one-time build would
    # otherwise land in no query's best-of-two. Clear the registry,
    # then time each artifact's cold build at the bench SF in
    # dependency order (each line is the MARGINAL cost given its
    # predecessors: pair mining on top of signatures, labels on top of
    # pairs). Totals below exclude these; BENCH_FULL.json carries them.
    from calaveras_uniteus_etl_spark.plans._session_index import (
        session_index_clear,
    )
    from calaveras_uniteus_etl_spark.plans.queries_dedup import (
        _lsh_pair_matches,
        _neardup_labels,
        _shingle_postings,
        _sigs_index,
        _simhash_fp,
    )
    from calaveras_uniteus_etl_spark.plans.queries_multimodal import (
        _features_index,
    )
    from calaveras_uniteus_etl_spark.plans.queries_similarity import _vec_index
    from calaveras_uniteus_etl_spark.plans.queries_text import _tok_index

    session_index_clear()
    index_build: dict[str, float] = {}
    for bname, bfn in [
        ("minhash_sigs", _sigs_index),
        ("shingle_postings", _shingle_postings),
        ("lsh_pair_nm", _lsh_pair_matches),
        ("neardup_labels", _neardup_labels),
        ("embedding_index", _vec_index),
        ("media_features", _features_index),
        ("tokenized_corpus", _tok_index),
        ("simhash_fp", _simhash_fp),
    ]:
        t0 = time.perf_counter()
        bfn(spark, sf_dir)
        index_build[bname] = round(time.perf_counter() - t0, 4)
    index_build["total"] = round(sum(index_build.values()), 4)

    # Best-of-two per query, as two INTERLEAVED full passes (pass 1
    # times every query in registry order, then pass 2 re-times them
    # all) rather than back-to-back repeats. Back-to-back runs made
    # the number order-sensitive: a query moved to the front of the
    # registry ran "cold" (right after warmup) both times, while a
    # mid-run query enjoyed a fully warmed session — the r6 rotation
    # made the streaming trio look 3x slower with unchanged plans.
    # With an interleaved second pass, every query's second sample
    # runs against a fully warm session, so the min is comparable
    # across rounds regardless of registry order.
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in headline:
            spec = REGISTRY.get(name)
            if spec is None:
                continue
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            assert n >= 0
            prev = timings.get(name)
            timings[name] = dt if prev is None else min(prev, dt)
    timings = {name: round(t, 4) for name, t in timings.items()}
    queries_total = round(sum(timings.values()), 4)
    # r11 verdict item 1 (measurement-bug fix, declared in
    # OPTIMIZATION_r12.md): the headline `value` now INCLUDES the
    # session-index build — per-query numbers stay warm-index marginal
    # costs (unchanged methodology, comparable round-over-round), but
    # the one-time build no longer lives in an untimed bucket, so work
    # migrated into an index artifact keeps paying its cost in the
    # printed total. `queries_total_sec` preserves the old headline for
    # comparison against pre-r12 receipts.
    total = round(queries_total + index_build["total"], 4)

    # CPU-normalized round-over-round ratios (r10 verdict item 1):
    # BENCH_BASELINE.json is the prior round's final BENCH_FULL,
    # refreshed at receipts time; tests/test_bench_normalization.py
    # gates the regression list so outliers get a mechanical verdict.
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
    )
    ratios: dict[str, float] = {}
    regressions: list[str] = []
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        ratios, regressions = normalized_ratios(
            timings, calibration, baseline, REGISTRY
        )

    sf_label = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    sf_val = float(sf_label) if sf_label else sf_dir
    # The driver captures only the LAST ~2000 chars of stdout; a
    # 190-query dict blows that budget and the record lands unparsed
    # (BENCH_r02/r03 are tail-truncated for exactly this reason). So:
    # full per-query detail goes to BENCH_FULL.json in the repo, and
    # the printed line carries the totals plus a representative
    # per-plan-family subset — guaranteed to fit the tail window.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"),
        "w",
    ) as f:
        json.dump(
            {
                "metric": "headline_queries_total",
                "value": total,  # queries + index build (r12)
                "unit": "sec",
                "queries": timings,
                "queries_total_sec": queries_total,
                "index_build": index_build,
                "index_timing": "warm",  # per-query numbers are warm-index
                "calibration": calibration,
                "normalized_ratio": ratios,
                "normalized_regressions": regressions,
                "sf": sf_val,
            },
            f,
        )
        f.write("\n")
    subset = [
        "f4_pricing_summary",
        "h4_local_supplier_volume",
        "h19_large_volume_orders",
        "h23_product_profit",
        "e12_link_rank",
        "s2_sessionization",
        "s4_interval_join",
        "x2_minhash_lsh_pairs",
        "x4_ngram_jaccard",
        "x6_embed_neardup",
        "x14_neardup_components",
        "x47_bm25_search",
        "x57_pq_ann_topk",
        "x64_ivfpq_adc",
        "f29_pareto_revenue",
        "x117_hll_registers",
        "x120_histogram_quantiles",
        "x121_waterfill_budget",
    ]
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,  # queries + index build (r12)
            "unit": "sec",
            "queries": {q: timings[q] for q in subset if q in timings},
            "queries_total_sec": queries_total,
            "slowest": slowest,
            "index_build_sec": index_build,
            "n_queries": len(timings),
            "n_norm_regressions": len(regressions),
            "detail": "BENCH_FULL.json",
            "sf": sf_val,
        }
    )
    assert len(line) < 1900, len(line)  # driver tail window is 2000 chars
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
