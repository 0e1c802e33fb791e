"""Model checks for the lifecycle/governance query family (round 4).

The DuckDB oracles prove cross-engine agreement; these prove the MATH
on sf0.001 with naive single-node Python models, plus the invariants
each operator must satisfy on any data (credit conservation, KM
monotonicity, dense-calendar completeness, k-anonymity partition).
"""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import timedelta

import duckdb
import pytest

from calaveras_uniteus_etl_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF).collect()


def _duck(sql):
    con = duckdb.connect()
    for t in ("customer", "orders", "documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).fetchall()


# ---------------------------------------------------------------------------
# f39 — Kaplan-Meier
# ---------------------------------------------------------------------------


def _km_model():
    """Naive product-limit estimator on the raw orders."""
    rows = _duck(
        """
        SELECT date_diff('day', MIN(o_orderdate), MAX(o_orderdate)),
               MAX(o_orderdate) < DATE '2001-02-01'
        FROM orders GROUP BY o_custkey
        """
    )
    subjects = [(int(t), bool(ev)) for t, ev in rows]
    times = sorted({t for t, ev in subjects if ev})
    out = {}
    s = 1.0
    for t in times:
        d = sum(1 for tt, ev in subjects if ev and tt == t)
        n = sum(1 for tt, _ in subjects if tt >= t)
        s *= 1.0 - d / n
        out[t] = (d, n, s)
    return out


def test_f39_matches_python_model(spark):
    model = _km_model()
    got = {r["tenure_days"]: r for r in _rows(spark, "f39_kaplan_meier")}
    assert set(got) == set(model)
    for t, (d, n, s) in model.items():
        r = got[t]
        assert r["n_events"] == d
        assert r["n_at_risk"] == n
        # engine quantizes each ln-factor to micro-nats; error per
        # factor ≤ 5e-7 nats, so the product agrees well within 1e-4
        assert r["survival"] == pytest.approx(s, abs=1e-4)


def test_f39_survival_is_monotone_nonincreasing(spark):
    rows = sorted(_rows(spark, "f39_kaplan_meier"), key=lambda r: r["tenure_days"])
    assert rows, "no churn events in fixture"
    last = 1.0
    for r in rows:
        assert 0.0 <= r["survival"] <= last + 1e-12
        last = r["survival"]
    # risk set shrinks as tenure grows
    risks = [r["n_at_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)


# ---------------------------------------------------------------------------
# f40 — linear attribution
# ---------------------------------------------------------------------------


def _attr_model():
    """Per-purchase equal-split credit, remainder to earliest click."""
    pairs = _duck(
        """
        SELECT c.ts, c.event_id, p.event_id, p.value
        FROM events c JOIN events p
          ON p.user_id = c.user_id AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL 30 MINUTE
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        """
    )
    per_p = defaultdict(list)
    for c_ts, c_id, p_id, p_val in pairs:
        per_p[p_id].append((c_ts, c_id, p_val))
    hours = defaultdict(lambda: [0, 0.0])  # hour -> [credit_us, value]
    for touches in per_p.values():
        touches.sort()
        n = len(touches)
        for i, (c_ts, _c_id, p_val) in enumerate(touches):
            credit = 1000000 // n + (1000000 % n if i == 0 else 0)
            hour = c_ts.replace(minute=0, second=0, microsecond=0)
            hours[hour][0] += credit
            hours[hour][1] += p_val * credit / 1e6
    return per_p, hours


def test_f40_matches_python_model(spark):
    per_p, hours = _attr_model()
    got = {r["click_hour"]: r for r in _rows(spark, "f40_linear_attribution")}
    assert set(got) == set(hours)
    for hour, (credit_us, value) in hours.items():
        r = got[hour]
        assert r["credit_us"] == credit_us
        assert r["value_credited"] == pytest.approx(value, abs=1e-6)


def test_f40_credit_is_conserved(spark):
    """Total credit equals exactly 1e6 micro-credits per attributed
    purchase — the invariant that makes fractional attribution sum to
    the purchase count regardless of touch multiplicity."""
    per_p, _ = _attr_model()
    rows = _rows(spark, "f40_linear_attribution")
    assert sum(r["credit_us"] for r in rows) == 1000000 * len(per_p)


# ---------------------------------------------------------------------------
# g14 — gap fill + forward fill
# ---------------------------------------------------------------------------


def test_g14_matches_python_model(spark):
    daily = _duck(
        """
        SELECT user_id, CAST(ts AS DATE),
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))
                    AS DOUBLE)
        FROM events GROUP BY 1, 2
        """
    )
    per_user = defaultdict(dict)
    for uid, day, v in daily:
        per_user[uid][day] = v
    got = {r["user_id"]: r for r in _rows(spark, "g14_gap_fill_ffill")}
    # audited subset only — every reported user must be modeled
    assert got, "hash-audited subset is empty at sf0.001"
    for uid, r in got.items():
        days = per_user[uid]
        d0, d1 = min(days), max(days)
        span = (d1 - d0).days + 1
        assert r["n_days"] == span
        assert r["n_observed"] == len(days)
        assert r["n_filled"] == span - len(days)
        # forward-fill model
        total, last = 0.0, None
        for i in range(span):
            day = d0 + timedelta(days=i)
            last = days.get(day, last)
            total += last
        assert r["filled_sum"] == pytest.approx(total, abs=1e-6)


# ---------------------------------------------------------------------------
# g15 — trailing RANGE window
# ---------------------------------------------------------------------------


def test_g15_matches_naive_trailing_sums(spark):
    orders = _duck(
        "SELECT o_custkey, o_orderdate, CAST(o_totalprice AS DOUBLE) FROM orders"
    )
    by_cust = defaultdict(list)
    for ck, od, price in orders:
        by_cust[ck].append((od, price))
    month_stats = defaultdict(lambda: [0, 0.0])
    for hist in by_cust.values():
        for od, _ in hist:
            trail = sum(
                p for od2, p in hist if 0 <= (od - od2).days <= 90
            )
            m = od.strftime("%Y-%m")
            month_stats[m][0] += 1
            month_stats[m][1] += trail
    got = {r["order_month"]: r for r in _rows(spark, "g15_trailing_range_window")}
    assert set(got) == set(month_stats)
    for m, (n, total) in month_stats.items():
        assert got[m]["n_orders"] == n
        assert got[m]["trail_total"] == pytest.approx(total, abs=0.02)
        assert got[m]["avg_trailing"] == pytest.approx(total / n, rel=1e-9)


# ---------------------------------------------------------------------------
# g16 — precedence census
# ---------------------------------------------------------------------------


def test_g16_matches_python_model(spark):
    firsts = _duck(
        "SELECT user_id, event_type, MIN(ts) FROM events GROUP BY 1, 2"
    )
    per_user = defaultdict(dict)
    for uid, et, ts in firsts:
        per_user[uid][et] = ts
    model = defaultdict(lambda: [0, 0, 0, 0])
    for types in per_user.values():
        ts = sorted(types)
        for i, a in enumerate(ts):
            for b in ts[i + 1 :]:
                key = (a, b)
                model[key][0] += 1
                if types[a] < types[b]:
                    model[key][1] += 1
                elif types[a] > types[b]:
                    model[key][2] += 1
                else:
                    model[key][3] += 1
    got = {
        (r["type_a"], r["type_b"]): r for r in _rows(spark, "g16_event_precedence")
    }
    assert set(got) == set(model)
    for key, (both, a_first, b_first, tie) in model.items():
        r = got[key]
        assert (
            r["n_users_both"],
            r["n_a_first"],
            r["n_b_first"],
            r["n_tie"],
        ) == (both, a_first, b_first, tie)
        # partition: every co-occurring user is classified exactly once
        assert r["n_a_first"] + r["n_b_first"] + r["n_tie"] == r["n_users_both"]


# ---------------------------------------------------------------------------
# m8 — k-anonymity audit
# ---------------------------------------------------------------------------


def test_m8_census_partitions_the_table(spark):
    rows = _rows(spark, "m8_k_anonymity")
    (n_customers,) = _duck("SELECT COUNT(*) FROM customer")[0]
    assert sum(r["n_rows"] for r in rows) == n_customers
    for r in rows:
        assert r["n_rows"] == r["k_size"] * r["n_classes"]
        assert 1 <= r["min_l_diversity"] <= r["k_size"]
        assert r["below_k"] == (1 if r["k_size"] < 5 else 0)


def test_m8_matches_python_model(spark):
    custs = _duck(
        "SELECT c_mktsegment, CAST(FLOOR(c_acctbal / 1000) AS BIGINT),"
        " c_nationkey FROM customer"
    )
    classes = defaultdict(list)
    for seg, band, nk in custs:
        classes[(seg, band)].append(nk)
    census = defaultdict(lambda: [0, 0, math.inf])
    for members in classes.values():
        k = len(members)
        census[k][0] += 1
        census[k][1] += k
        census[k][2] = min(census[k][2], len(set(members)))
    got = {r["k_size"]: r for r in _rows(spark, "m8_k_anonymity")}
    assert set(got) == set(census)
    for k, (n_classes, n_rows, min_l) in census.items():
        r = got[k]
        assert r["n_classes"] == n_classes
        assert r["n_rows"] == n_rows
        assert r["min_l_diversity"] == min_l
