"""Round-10 query families: mathematical invariants on top of the
differential gate (tests/test_oracle_queries.py covers value parity;
these pin the properties the statistics must satisfy regardless of
data, so a future refactor that stays self-consistent with a wrong
formula still fails)."""

from __future__ import annotations

import math

import pytest

from calaveras_uniteus_etl_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return REGISTRY[name].fn(spark, SF).collect()


def test_inequality_indices_bounds(spark):
    row = _run(spark, "f84_inequality_indices")[0]
    assert 0.0 <= row.gini < 1.0
    assert row.theil_t >= 0.0
    assert 0.0 <= row.atkinson < 1.0
    assert 0.0 <= row.hoover < 0.5  # Hoover <= Gini for any distribution
    assert row.hoover <= row.gini


def test_ljung_box_monotone_q(spark):
    rows = _run(spark, "f85_ljung_box")
    assert [r.lag for r in rows] == list(range(1, 8))
    qs = [r.q_stat for r in rows]
    assert all(b >= a for a, b in zip(qs, qs[1:]))  # Q is a cumsum of >=0
    assert all(-1.0 <= r.rho <= 1.0 for r in rows)


def test_jarque_bera_nonnegative(spark):
    rows = _run(spark, "f86_jarque_bera")
    assert len(rows) == 5
    assert all(r.jb_stat >= 0.0 for r in rows)


def test_cramers_v_in_unit_interval(spark):
    row = _run(spark, "f87_cramers_v_gtest")[0]
    assert 0.0 <= row.cramers_v <= 1.0
    assert row.chi2 >= 0.0
    assert row.g_stat >= 0.0
    assert row.dof == (row.n_segments - 1) * (row.n_priorities - 1)


def test_permutation_p_value_range(spark):
    row = _run(spark, "f88_permutation_test")[0]
    # add-one estimator: p in [1/(R+1), 1]
    assert 1.0 / (row.n_reps + 1) - 1e-9 <= row.p_value <= 1.0
    assert 0 <= row.n_extreme <= row.n_reps
    assert 0 < row.thr_bp < 10000


def test_ks_statistic_range(spark):
    row = _run(spark, "f89_ks_two_sample")[0]
    assert 0.0 <= row.ks_stat <= 1.0
    assert row.ks_scaled >= 0.0
    assert row.n1 > 0 and row.n2 > 0


def test_markov_stationary_is_distribution(spark):
    rows = _run(spark, "f90_markov_stationary")
    total = sum(r.stationary_prob for r in rows)
    assert math.isclose(total, 1.0, abs_tol=1e-6)
    assert all(r.stationary_prob > 0 for r in rows)
    # stationarity: pi P == pi (re-derive P independently of the query)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from calaveras_uniteus_etl_spark.plans.tables import table

    e = table(spark, SF, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
        .groupBy("prev", "event_type")
        .count()
        .collect()
    )
    row_tot = {}
    for p in pairs:
        row_tot[p.prev] = row_tot.get(p.prev, 0) + p["count"]
    pi = {r.event_type: r.stationary_prob for r in rows}
    for j in pi:
        nxt = sum(
            pi[p.prev] * p["count"] / row_tot[p.prev]
            for p in pairs
            if p.event_type == j
        )
        assert math.isclose(nxt, pi[j], abs_tol=1e-4), j


def test_record_breaking_days_shape(spark):
    rows = _run(spark, "g32_record_breaking_days")
    assert rows == sorted(rows, key=lambda r: r.yr)
    # the first year contains the first day, which is always a record
    assert rows[0].n_records >= 1
    assert all(0 <= r.n_records <= r.n_days for r in rows)
    # yearly best-day revenue must be a running record only in a year
    # where a record fell; the global max year must contain a record
    best = max(rows, key=lambda r: r.best_day_rev)
    assert best.n_records >= 1


def test_transition_entropy_bounds(spark):
    rows = _run(spark, "g33_transition_entropy")
    for r in rows:
        assert 0.0 <= r.h_bits <= math.log2(max(r.n_next_types, 1)) + 1e-9


def test_funnel_monotone(spark):
    row = _run(spark, "g34_funnel_conversion")[0]
    assert row.n_users >= row.step1_users >= row.step2_users >= row.step3_users
    for c in (row.conv_view, row.conv_click, row.conv_purchase):
        assert c is None or 0.0 <= c <= 1.0
    if row.step3_users:
        assert row.avg_hours_to_convert > 0


def test_multiband_partition(spark):
    row = _run(spark, "h30_multiband_counts")[0]
    bands = [row[f"band{i}"] for i in range(1, 9)]
    assert sum(bands) == row.n_lines  # bands partition the filtered scan


def test_dense_order_distribution_conserves(spark):
    rows = _run(spark, "h31_dense_order_buyers")
    assert all(r.dense_orders >= 1 and r.n_customers >= 1 for r in rows)


def test_am_pm_counts_positive_ratio(spark):
    rows = _run(spark, "h32_am_pm_ratio")
    for r in rows:
        assert r.am_events >= 0 and r.pm_events >= 0
        if r.pm_events:
            assert r.am_pm_ratio == pytest.approx(
                r.am_events / r.pm_events, abs=1e-6
            )


def test_odds_ratio_consistency(spark):
    row = _run(spark, "f91_odds_ratio")[0]
    assert row.or_ci_lo <= row.odds_ratio <= row.or_ci_hi
    assert row.odds_ratio > 0 and row.relative_risk > 0


def test_kendall_tau_bounds(spark):
    row = _run(spark, "f92_kendall_tau_grid")[0]
    assert -1.0 <= row.tau_b <= 1.0
    # concordant + discordant can never exceed total pairs
    assert row.concordant + row.discordant <= (
        row.n_lines * (row.n_lines - 1) / 2
    )


def test_prefix_dup_census_conserves(spark):
    rows = _run(spark, "x139_prefix_dup_census")
    for r in rows:
        assert r.dup_prefixes <= r.n_prefixes
        assert r.docs_in_dup_groups >= 2 * r.dup_prefixes
        assert 0.0 <= r.dup_share <= 1.0


def test_cochran_armitage_consistency(spark):
    row = _run(spark, "f93_cochran_armitage")[0]
    assert 0 <= row.n_returned <= row.n_orders
    # z and T share a sign (variance is positive)
    assert (row.trend_t >= 0) == (row.z_stat >= 0)


def test_pot_gpd_moments(spark):
    row = _run(spark, "f94_peaks_over_threshold")[0]
    assert row.n_exceedances > 0
    assert row.mean_excess > 0
    assert row.beta_hat > 0  # scale parameter is positive by construction
    assert row.xi_hat < 0.5  # moment estimator bound (finite variance)


def test_id_order_audit_conserves(spark):
    row = _run(spark, "m19_id_order_audit")[0]
    assert 0 <= row.n_inversions <= row.n_pairs
    assert 0 <= row.users_affected <= row.users_total
    assert 0.0 <= row.inversion_rate <= 1.0
