"""Registry-wide physical-plan lint — every query, every round.

test_plan_shape.py asserts hand-picked plan properties per query
family; this file sweeps the ENTIRE registry so a scale regression in
a NEW query fails CI the day it lands, without anyone remembering to
write a bespoke plan test. Three properties are linted on every
registry entry's executed plan at sf0.001:

1. No ``CartesianProduct`` — unless the name is in CARTESIAN_ALLOW
   with a justification (the relation is dimension-grain by
   construction, so |A|x|B| is bounded regardless of data volume).
2. No ``BatchEvalPython`` — row-at-a-time Python UDFs are banned
   outright; Python reaches the JVM only via Arrow (ArrowEvalPython /
   MapInPandas / FlatMapGroupsInPandas), which the lint allows.
3. No data-sized single-partition WindowExec: a ``Window`` whose input
   is an ``Exchange SinglePartition`` funnels the whole relation
   through ONE task to sort it. Two shapes are acceptable and
   recognized:
   - the distributed-prefix pattern (operators/prefix.py): the window
     runs over per-partition offsets (≤ one row per shuffle
     partition), identifiable by its ``__prefix_``/``__pf_`` columns;
   - windows over GRAIN-BOUNDED relations (days, months, deciles,
     bounded value domains) — these must be explicitly allowlisted in
     GLOBAL_WINDOW_ALLOW with the boundedness argument, so every new
     global window gets a human scale review before it ships.

A stale-entry check keeps both allowlists honest: an entry whose query
no longer triggers the pattern (or no longer exists) fails the lint
until it is removed.
"""

from __future__ import annotations

import re

from calaveras_uniteus_etl_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"

# Queries whose CartesianProduct is over dimension-grain inputs.
CARTESIAN_ALLOW = {
    "x73_kmv_sketch_merge": (
        "source-pair self-join: both sides are the distinct `source` "
        "relation (bounded dimension, ~dozens of rows at any corpus "
        "size); the KMV sketches themselves are k-bounded"
    ),
}

# Queries whose single-partition window is over a GRAIN-bounded
# relation — cardinality set by a domain (days, months, categories,
# a quantized value range), not by the data volume. Each entry is
# (reason, bound, probe): the probe computes the actual window-key
# cardinality from the source tables at lint SF and
# test_global_window_allow_bounds asserts it <= bound — so every
# boundedness argument is pinned by a measured number, not prose.
# Probe keys (resolved in _GRAIN_PROBES): the grain the query windows.
GLOBAL_WINDOW_ALLOW = {
    "r8_share_mix": (
        "share-category grain (method x language report dimension)",
        30, "share_categories",
    ),
    "f39_kaplan_meier": (
        "distinct-tenure-day grain, bounded by the date range",
        3000, "tenure_days",
    ),
    "f56_nelson_aalen": (
        "distinct-tenure-day grain, bounded by the date range",
        3000, "tenure_days",
    ),
    "h27_cumulative_crossover": ("calendar-day grain", 3000, "order_days"),
    "f44_downsample_ltob": ("calendar-day grain", 3000, "order_days"),
    "f45_mann_whitney": (
        "2dp-quantized event-value grain (<= 100*max_value+1 rows; "
        "~18k observed at sf0.1 vs ~6M raw events)",
        60_000, "event_values",
    ),
    "f51_changepoint": ("calendar-day grain", 3000, "order_days"),
    "f85_ljung_box": (
        "lag grain: the cumulative-Q window runs over the 7-row "
        "per-lag autocovariance relation",
        7, "lags",
    ),
    "g32_record_breaking_days": ("calendar-day grain", 3000, "order_days"),
    "f52_seasonal_strength": ("calendar-day grain", 3000, "order_days"),
    "f54_runs_test": ("calendar-day grain", 3000, "order_days"),
    "g20_peak_census": ("calendar-day grain", 3000, "order_days"),
    "f19_rolling_daily": ("calendar-day grain", 3000, "event_days"),
    "g3_user_growth": ("calendar-day grain", 3000, "event_days"),
    "g12_rolling_correlation": ("calendar-day grain", 3000, "event_days"),
    "f28_yoy_revenue": ("calendar-month grain", 120, "order_months"),
    "f63_revenue_var_cvar": (
        "per-day revenue grain (<= #days rows)", 3000, "order_days",
    ),
    "x35_lsh_threshold_sweep": (
        "signature-match-count grain (6..K=12)", 7, "lsh_match_counts",
    ),
    "x80_heaps_law_curve": ("corpus-decile grain", 10, "doc_deciles"),
    "x82_ks_test": (
        "distinct doc-length grain (bounded by max doc length)",
        4096, "doc_lengths",
    ),
    "m12_t_closeness": (
        "nation grain: global sensitive CDF", 25, "nations",
    ),
    "x120_histogram_quantiles": (
        "fixed 256-bin histogram grain", 256, "x120_bins",
    ),
    "x121_waterfill_budget": (
        "source grain (~dozens of sources)", 64, "doc_sources",
    ),
    "f67_kruskal_wallis": (
        "quantity value grain (integers 1..50)", 50, "quantities",
    ),
    "f70_gini_split": (
        "fixed 256-bin cents grain (candidate thresholds)",
        256, "f70_bins",
    ),
    "g28_max_drawdown": ("calendar-day grain", 3000, "order_days"),
    "g29_anomaly_days": ("calendar-day grain", 3000, "order_days"),
    # f96_isotonic_discount's cumsum window ALSO runs on the 50-row
    # quantity grain, but it executes inside the eager materialize()
    # pin, so the returned plan the lint sweeps never contains it —
    # no allowlist entry needed (the stale-entry check enforces this).
    "f97_bh_fdr": (
        "nation grain: BH rank/step-up windows over 25 per-nation "
        "test rows",
        25, "nations",
    ),
}

# Grain probes: each computes the window-key cardinality a
# GLOBAL_WINDOW_ALLOW entry claims is bounded, from the source tables
# at lint SF. Import-light lambdas; heavier probes import inside.
def _pq(spark, name):
    return spark.read.parquet(f"{SF}/{name}.parquet")


def _share_categories(spark):
    from pyspark.sql import functions as F

    return (
        _pq(spark, "events")
        .select(
            "event_type",
            (F.get_json_object("props", "$.k").cast("long") % 3).alias("l"),
        )
        .distinct()
        .count()
    )


def _tenure_days(spark):
    from pyspark.sql import functions as F

    return (
        _pq(spark, "orders")
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("t")
        )
        .select("t")
        .distinct()
        .count()
    )


def _distinct(tbl, expr_sql):
    def probe(spark):
        return (
            _pq(spark, tbl)
            .selectExpr(f"{expr_sql} AS k")
            .distinct()
            .count()
        )

    return probe


def _lsh_match_counts(spark):
    from pyspark.sql import functions as F

    from calaveras_uniteus_etl_spark.plans.queries_dedup import (
        _lsh_pair_matches,
    )

    return (
        _lsh_pair_matches(spark, SF)
        .filter(F.col("nm") >= 6)
        .select("nm")
        .distinct()
        .count()
    )


def _doc_deciles(spark):
    from pyspark.sql import functions as F

    d = _pq(spark, "documents")
    n = d.count()
    return (
        d.select(
            F.least(F.lit(9), (F.col("doc_id") * 10 / n).cast("int")).alias(
                "k"
            )
        )
        .distinct()
        .count()
    )


def _x120_bins(spark):
    from calaveras_uniteus_etl_spark.plans.queries_aggregates import (
        _X120_BINS,
        _X120_W,
    )

    return _distinct(
        "orders",
        f"least(cast(round(o_totalprice * 100) as bigint) div {_X120_W}, "
        f"{_X120_BINS - 1})",
    )(spark)


def _f70_bins(spark):
    from calaveras_uniteus_etl_spark.plans.queries_aggregates import (
        _F70_BINS,
        _F70_W,
    )

    return _distinct(
        "orders",
        f"least(cast(round(o_totalprice * 100) as bigint) div {_F70_W}, "
        f"{_F70_BINS - 1})",
    )(spark)


def _f85_lags(spark):
    from calaveras_uniteus_etl_spark.plans.queries_aggregates import (
        _F85_LAGS,
    )

    return _F85_LAGS


_GRAIN_PROBES = {
    "share_categories": _share_categories,
    "lags": _f85_lags,
    "tenure_days": _tenure_days,
    "order_days": _distinct("orders", "o_orderdate"),
    "order_months": _distinct("orders", "date_format(o_orderdate, 'yyyy-MM')"),
    "event_days": _distinct("events", "to_date(ts)"),
    "event_values": _distinct("events", "value"),
    "lsh_match_counts": _lsh_match_counts,
    "doc_deciles": _doc_deciles,
    "doc_lengths": _distinct("documents", "n_chars"),
    "nations": _distinct("customer", "c_nationkey"),
    "x120_bins": _x120_bins,
    "doc_sources": _distinct("documents", "source"),
    "quantities": _distinct("lineitem", "cast(l_quantity as bigint)"),
    "f70_bins": _f70_bins,
}


def test_global_window_allow_bounds(spark):
    """Every GLOBAL_WINDOW_ALLOW boundedness argument is pinned by a
    measured number: the claimed window-key grain, computed from the
    source tables at lint SF, must not exceed the entry's bound. A
    value-domain drift (doc lengths ballooning, a new quantity range)
    fails here instead of silently invalidating the scale story."""
    failures = {}
    for name, (reason, bound, probe_key) in GLOBAL_WINDOW_ALLOW.items():
        got = _GRAIN_PROBES[probe_key](spark)
        if got > bound:
            failures[name] = f"{probe_key}={got} > bound {bound} ({reason})"
    assert not failures, f"allowlisted grain exceeds its bound: {failures}"


_WINDOW_RE = re.compile(r"\bWindow \[")
_PREFIX_MARKERS = ("__prefix_", "__pf_")


def _single_partition_windows(plan: str) -> list[str]:
    """Window lines whose input (within the next 3 lines) is an
    Exchange SinglePartition, excluding the distributed-prefix shape."""
    lines = plan.splitlines()
    hits = []
    for i, line in enumerate(lines):
        if not _WINDOW_RE.search(line):
            continue
        below = "\n".join(lines[i + 1 : i + 4])
        if "Exchange SinglePartition" not in below:
            continue
        if any(m in line for m in _PREFIX_MARKERS):
            continue  # prefix-operator offsets: <= one row per partition
        hits.append(line.strip()[:160])
    return hits


def test_registry_plan_lint(spark):
    cartesian: dict[str, bool] = {}
    global_win: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    row_udf: list[str] = []

    for name, spec in REGISTRY.items():
        try:
            plan = (
                spec.fn(spark, SF)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as ex:  # noqa: BLE001 - lint must name the query
            errors[name] = f"{type(ex).__name__}: {ex}"
            continue
        if "CartesianProduct" in plan:
            cartesian[name] = True
        if "BatchEvalPython" in plan:
            row_udf.append(name)
        hits = _single_partition_windows(plan)
        if hits:
            global_win[name] = hits

    assert not errors, f"queries failed to plan: {errors}"
    assert not row_udf, (
        f"row-at-a-time Python UDF (BatchEvalPython) in: {row_udf}"
    )

    bad_cartesian = sorted(set(cartesian) - set(CARTESIAN_ALLOW))
    assert not bad_cartesian, (
        "CartesianProduct without an allowlist justification: "
        f"{bad_cartesian}"
    )
    stale_cartesian = sorted(set(CARTESIAN_ALLOW) - set(cartesian))
    assert not stale_cartesian, (
        f"CARTESIAN_ALLOW entries no longer needed: {stale_cartesian}"
    )

    bad_win = {
        n: hits for n, hits in global_win.items()
        if n not in GLOBAL_WINDOW_ALLOW
    }
    assert not bad_win, (
        "data-sized single-partition window (use operators/prefix.py "
        f"or allowlist with a boundedness argument): {bad_win}"
    )
    stale_win = sorted(set(GLOBAL_WINDOW_ALLOW) - set(global_win))
    assert not stale_win, (
        f"GLOBAL_WINDOW_ALLOW entries no longer needed: {stale_win}"
    )


def test_session_index_build_plans_lint(spark):
    """The registry lint above sees a checkpoint LEAF wherever a query
    reads a session-indexed artifact — the featurization upstream of
    the leaf is invisible to it. Lint the BUILD plans explicitly (the
    lazy pre-checkpoint shapes), so the indexing layer can't hide a
    cartesian, a row-wise Python UDF, or a data-sized global sort."""
    from pyspark.sql import functions as F

    from calaveras_uniteus_etl_spark.plans.queries_dedup import (
        _label_step,
        _lsh_pair_plan,
        _spark_sigs,
    )
    from calaveras_uniteus_etl_spark.plans.queries_similarity import (
        _postings_plan,
        _vec_featurize_plan,
    )

    feat = _vec_featurize_plan(spark, SF)
    pairs = _lsh_pair_plan(spark, SF).select("doc_a", "doc_b")
    edges = pairs.select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    )
    builds = {
        "minhash_sigs": _spark_sigs(spark, SF),
        "lsh_pair_nm": _lsh_pair_plan(spark, SF),
        "neardup_label_step": _label_step(edges, labels),
        "embedding_featurize": feat,
        "embedding_postings": _postings_plan(feat),
    }
    for name, df in builds.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BatchEvalPython" not in plan, (name, plan)
        hits = _single_partition_windows(plan)
        assert not hits, (name, hits)
