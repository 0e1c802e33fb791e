"""Query plans: the judge-facing operator inventory.

Every operator family from SURVEY.md §2 is expressed here as a named
query over the driver's synthetic tables, each paired with an ANSI-SQL
oracle that DuckDB runs on the same parquet files. The registry is what
``__spark_entry__.queries()`` / ``oracle_sql()`` expose.
"""

from calaveras_uniteus_etl_spark.plans.catalog import REGISTRY, QuerySpec  # noqa: F401
from calaveras_uniteus_etl_spark.plans import (  # noqa: F401  (import = register)
    queries_aggregates,
    queries_dedup,
    queries_etl,
    queries_filters,
    queries_joins,
    queries_lifecycle,
    queries_multimodal,
    queries_pq,
    queries_reports,
    queries_similarity,
    queries_streaming,
    queries_text,
    queries_tpch,
)

# The driver's correctness harness walks the registry in order and caps
# how many entries it checks per round (50 per round so far). Iteration
# order therefore front-loads the entries with the LEAST driver
# evidence. Which entries already have evidence is DERIVED — at import
# time _reorder_registry() reads every CORRECTNESS_r*.json at the repo
# root and front-loads the registry names with no green row there. The
# hand-rotated _NEVER_CHECKED list this replaces went stale three
# rounds running (and round 4's missing file silently dropped a whole
# window); deriving from the driver's own evidence files kills that
# defect class: a new CORRECTNESS file automatically rotates the next
# round's window, with no manual edit.
#
# _ADDITION_ORDER below is the only remaining list, and it is
# APPEND-ONLY: it records the historical order queries were added, so
# the oldest evidence debt drains first. Entries are never removed or
# reordered — once a name earns a green driver row, the derivation
# skips past it here. New queries append at the bottom.
# f2_approx_count_distinct is pinned dead last: it is rows-only by
# design (HLL sketches are engine-private, no SQL oracle) and can
# never earn a hash-green row, so it must not burn a check slot (its
# accuracy is covered by a 3·rsd tolerance test in
# tests/test_approx_tolerance.py).
_ADDITION_ORDER = [
    # --- the lost round-4 window (50) = the round-6 window, green r06 ---
    "f31_grouping_sets",
    "m4_column_profile",
    "i2_set_ops",
    "g8_spend_deciles",
    "x55_cluster_representative",
    "j2_json_props",
    "h9_disjunctive_brackets",
    "h10_priority_semi",
    "h11_value_share",
    "h12_inactive_rich",
    "x61_media_phash_neardup",
    "x56_pq_codes",
    "x57_pq_ann_topk",
    "r6_provider_performance",
    "r7_correlation_matrix",
    "r8_share_mix",
    "x29_semdedup_prune",
    "x38_ann_recall_audit",
    "x51_embedding_health",
    "x62_hard_negatives",
    "x63_embed_covariance",
    "s3_replay_dedup",
    "s4_interval_join",
    "s5_last_touch_attribution",
    "x25_unigram_logprob",
    "x27_doc_chunking",
    "x28_source_mixture",
    "x30_weighted_sample",
    "x31_dsir_weights",
    "x37_source_cap",
    "x43_countmin_freq",
    "x47_bm25_search",
    "x48_exact_contamination",
    "x49_token_budget_fill",
    "x58_bigram_logprob",
    "x59_hybrid_rrf",
    "x60_bpe_pair_counts",
    "h13_volume_shipping",
    "h14_market_share",
    "h15_custdist",
    "h16_promo_effect",
    "h17_top_supplier",
    "h18_small_qty_avg",
    "h19_large_volume_orders",
    "h20_supplier_variety",
    "h21_waiting_orders",
    "h22_min_cost_supplier",
    "h23_product_profit",
    "h24_late_priority_lines",
    "h25_dominant_part_suppliers",
    # --- block 2: round-4b additions, unwitnessed (54) ---
    "f39_kaplan_meier",
    "f40_linear_attribution",
    "g14_gap_fill_ffill",
    "g15_trailing_range_window",
    "g16_event_precedence",
    "m8_k_anonymity",
    "x86_editdist_join",
    "x87_zipf_slope",
    "x88_stratified_sample",
    "c11_delta_join_view",
    "f41_winsorized_stats",
    "f42_forecast_backtest",
    "g17_rfm_segments",
    "x89_khop_reach",
    "e17_bloom_prejoin",
    "m9_zone_map_pruning",
    "h27_cumulative_crossover",
    "f43_cohort_ltv",
    "d11_prefix_suggest",
    "x90_ndcg_eval",
    "x91_char_entropy_filter",
    "h28_yoy_switchers",
    "e18_grid_radius_join",
    "s9_incremental_sessionize",
    "f44_downsample_ltob",
    "x92_bpe_merge_loop",
    "x93_cluster_silhouette",
    "i3_unpivot_metrics",
    "j4_array_suite",
    "f45_mann_whitney",
    "g18_concurrency_curve",
    "f46_theil_sen",
    "x94_greedy_coverage",
    "r5_employee_workload",
    "x95_purged_time_folds",
    "g19_segment_migration",
    "f47_capture_recapture",
    "f48_acf",
    "x96_tokenizer_fertility",
    "f49_anova_oneway",
    "f50_burstiness",
    "x97_hashed_bow_source_sim",
    "f51_changepoint",
    "e19_skyline_customers",
    "x98_cdc_chunking",
    "m10_freshness_audit",
    "d12_topk_plus_others",
    "x99_corpus_fingerprint",
    "f52_seasonal_strength",
    "f53_grouped_elasticity",
    "h29_ranked_rollup",
    "f54_runs_test",
    "g20_peak_census",
    "m11_join_cardinality_audit",
    # --- block 3: round-5 additions, unwitnessed (30) ---
    "f55_fisher_price_index",
    "f56_nelson_aalen",
    "g21_interval_union_coverage",
    "x100_repetition_gate",
    "f57_hill_tail_index",
    "x101_unigram_sampling_table",
    "x102_systematic_resample",
    "x103_retention_wilson_ci",
    "i4_multiset_ops",
    "j5_datetime_suite",
    "x104_eb_shrinkage",
    "s10_session_window_native",
    "f59_gumbel_block_maxima",
    "x105_multiscale_repeat_census",
    "x106_ccnet_terciles",
    "x107_distinct_ngram_diversity",
    "x108_term_adaptation",
    "f60_mann_kendall",
    "f61_spearman_rank_corr",
    "x109_padding_waste",
    "x110_lsh_band_planner",
    "f62_tukey_outliers",
    "f63_revenue_var_cvar",
    "f64_monthly_revenue_bands",
    "x113_minhash_k_sweep",
    "x112_contamination_n_sweep",
    "j6_conditional_suite",
    "x114_dedup_strategy_matrix",
    "x115_dup_graph_hubs",
    "x116_shard_checksums",
    # --- round-6 additions (64) ---
    "x117_hll_registers",
    "x118_hll_shard_merge",
    "x119_pmi_collocations",
    "e20_fellegi_sunter",
    "f65_calibration_brier",
    "m12_t_closeness",
    "x120_histogram_quantiles",
    "f66_roc_auc",
    "x121_waterfill_budget",
    "x122_grouped_hll",
    "x123_heavy_hitters",
    "x124_source_jsd",
    "f67_kruskal_wallis",
    "m13_referential_integrity",
    "x125_mahalanobis_outliers",
    "f68_cross_correlation",
    "m14_dp_histogram",
    "m15_bloom_sizing",
    "j7_regex_suite",
    "x126_source_length_quantiles",
    "g22_growth_accounting",
    "f69_cohen_kappa",
    "f70_gini_split",
    "g23_engagement_ratios",
    "x127_simpson_paradox",
    "f71_dispersion_index",
    "g24_interarrival_stats",
    "x128_pii_census",
    "x129_feature_hash_collisions",
    "x130_log_odds_terms",
    "f72_ab_readout",
    "x131_temperature_mixture",
    "f73_cuped_readout",
    "f74_power_analysis",
    "j8_bitwise_suite",
    "g25_event_trigrams",
    "r9_quarterly_review",
    "m16_partition_gaps",
    "x132_source_data_card",
    "f75_dow_uniformity",
    "f76_hhi_concentration",
    "g26_time_to_first_purchase",
    "f77_negbin_fit",
    "m17_expectation_battery",
    "g27_ship_latency_percentiles",
    "f78_wilcoxon_signed_rank",
    "x133_cross_source_dups",
    "e21_null_safe_join",
    "x134_class_balance_weights",
    "x135_truncation_loss",
    "x136_class_centroid_influence",
    "f79_mcnemar_test",
    "g28_max_drawdown",
    "f80_partial_correlation",
    "g29_anomaly_days",
    "f81_effect_sizes",
    "x137_winnowing",
    "x138_rule_ablation",
    "f82_welch_t",
    "m18_double_fire_audit",
    "g30_circular_time_stats",
    "d13_rank_semantics",
    "f83_sign_test",
    "g31_weekend_lift",
    # --- round-10 additions (10): freeze lifted after CORRECTNESS_r09 ---
    "f84_inequality_indices",
    "f85_ljung_box",
    "f86_jarque_bera",
    "f87_cramers_v_gtest",
    "f88_permutation_test",
    "f89_ks_two_sample",
    "g32_record_breaking_days",
    "g33_transition_entropy",
    "g34_funnel_conversion",
    "h30_multiband_counts",
    "f90_markov_stationary",
    "h31_dense_order_buyers",
    "h32_am_pm_ratio",
    "f91_odds_ratio",
    "f92_kendall_tau_grid",
    "x139_prefix_dup_census",
    "f93_cochran_armitage",
    "f94_peaks_over_threshold",
    "m19_id_order_audit",
    # --- round-11 additions ---
    "h33_repeat_part_buyers",
    "h34_weekly_shortfall",
    "f95_holt_trend",
    "f96_isotonic_discount",
    "f97_bh_fdr",
    "x140_curriculum_stages",
    "h35_month_deviation",
    "f98_chow_break",
    "x141_source_containment",
    "x142_soft_dedup_weights",
    "x143_bigram_entropy_rate",
    # --- round-11 second-session additions ---
    "f99_anderson_darling",
    "h36_channel_growth",
    "f100_pinball_quantiles",
    "f101_grubbs_outlier",
    "x144_shard_novelty",
    "x145_top_principal_direction",
    "m20_benford_audit",
]

# Rows-only-by-design entries that can never earn a hash-green row —
# pinned dead last so they never burn a driver check slot.
_ROWS_ONLY_LAST = ["f2_approx_count_distinct"]


# Files successfully parsed by the last _driver_green_names call —
# tests assert this is nonzero so a broken evidence-root resolution
# (installed package, odd checkout layout) can never silently count
# every query as unwitnessed debt and defeat the rotation.
_EVIDENCE_FILES_PARSED = 0


def _driver_green_names(root=None) -> set[str]:
    """Names with at least one green row in any CORRECTNESS_r*.json.

    Green = the driver's hard signal: no error, row counts matched,
    and the value hash MATCHED. hash_match=None (the weaker rows-only
    check) counts only for queries that are rows-only BY DESIGN
    (_ROWS_ONLY_LAST, or a row carrying an explicit rows_only flag) —
    for an oracled query a hash-less row (driver timeout, partial run)
    must NOT retire it from the check window. A FAILED row (err, count
    mismatch, or hash mismatch) never counts, so a regressed query
    rotates back to the front of the next window.

    The evidence root defaults to the repo checkout holding this
    package; SPARK_GRAFT_EVIDENCE_ROOT overrides it for installed or
    relocated layouts.
    """
    import json
    import os
    from pathlib import Path

    global _EVIDENCE_FILES_PARSED
    if root is None:
        root = os.environ.get("SPARK_GRAFT_EVIDENCE_ROOT") or Path(
            __file__
        ).resolve().parents[2]
    rows_only = set(_ROWS_ONLY_LAST)
    green: set[str] = set()
    parsed = 0
    # live receipts at the root + superseded rounds relocated to
    # evidence/archive/ (the hygiene move must not turn archived green
    # rows back into rotation debt)
    paths = sorted(Path(root).glob("CORRECTNESS_r*.json")) + sorted(
        Path(root).glob("evidence/archive/CORRECTNESS_r*.json")
    )
    for path in paths:
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue  # an unreadable evidence file must not crash imports
        if not isinstance(rows, dict):
            continue
        parsed += 1
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("err") is not None or row.get("rows_match") is not True:
                continue
            if row.get("schema_match") is False:
                continue
            hash_ok = row.get("hash_match") is True or (
                row.get("hash_match") is None
                and (name in rows_only or row.get("rows_only") is True)
            )
            if hash_ok:
                green.add(name)
    _EVIDENCE_FILES_PARSED = parsed
    return green


def _reorder_registry() -> None:
    """Front-load registry names with no green driver row.

    Unwitnessed names come first, ordered by _ADDITION_ORDER (oldest
    debt first; names missing from the hint keep registration order
    behind it). Witnessed names follow in registration order; the
    rows-only entries go dead last. Derived entirely from the
    CORRECTNESS_r*.json evidence files — no per-round edits.
    """
    green = _driver_green_names()
    hint_pos = {n: i for i, n in enumerate(_ADDITION_ORDER)}
    pinned = set(_ROWS_ONLY_LAST)
    debt = [
        n
        for n in REGISTRY
        if n not in green and n not in pinned
    ]
    debt.sort(key=lambda n: hint_pos.get(n, len(hint_pos)))
    placed = set(debt) | pinned
    middle = [n for n in REGISTRY if n not in placed]
    back = [n for n in _ROWS_ONLY_LAST if n in REGISTRY]
    ordered = {n: REGISTRY[n] for n in debt + middle + back}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()
