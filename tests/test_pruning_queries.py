"""Model checks for e17 (bloom pre-join), m9 (zone-map pruning), h27
(cumulative crossover) on sf0.001."""

from __future__ import annotations

import hashlib
from collections import defaultdict
from decimal import Decimal

import duckdb
import pytest

from calaveras_uniteus_etl_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF).collect()


def _duck(sql):
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).fetchall()


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# e17 — bloom pre-join
# ---------------------------------------------------------------------------


def test_e17_matches_python_bloom(spark):
    dim = {
        k
        for (k,) in _duck(
            "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
        )
    }
    facts = _duck("SELECT o_orderkey, o_custkey FROM orders")
    bits = 4096 * 32

    def positions(key):
        return [_md5_long(f"{i}:#{key}") % bits for i in range(3)]

    filt = set()
    for k in dim:
        filt.update(positions(k))
    n_pass = sum(1 for _, ck in facts if all(p in filt for p in positions(ck)))
    n_exact = sum(1 for _, ck in facts if ck in dim)
    (row,) = _rows(spark, "e17_bloom_prejoin")
    assert row["n_fact"] == len(facts)
    assert row["n_dim"] == len(dim)
    assert row["n_bloom_pass"] == n_pass
    assert row["n_exact_match"] == n_exact
    assert row["n_false_pass"] == n_pass - n_exact
    # no false negatives, ever — the filter may only over-approximate
    assert row["n_bloom_pass"] >= row["n_exact_match"]


# ---------------------------------------------------------------------------
# m9 — zone maps
# ---------------------------------------------------------------------------


def test_m9_matches_python_model(spark):
    rows = _duck(
        """
        SELECT date_diff('day', DATE '1995-01-01', o_orderdate) // 30,
               o_orderdate, CAST(o_totalprice AS DECIMAL(12,2))
        FROM orders
        """
    )
    zones = defaultdict(list)
    for fid, od, price in rows:
        zones[fid].append((od, price))
    import datetime

    d_lo = datetime.datetime(1998, 1, 1)
    d_hi = datetime.datetime(1998, 3, 31)
    model = {}
    for pred in ("orderdate", "totalprice"):
        n_skipped = rows_scanned = 0
        for members in zones.values():
            if pred == "orderdate":
                mn, mx = min(m[0] for m in members), max(m[0] for m in members)
                skip = mx < d_lo or mn > d_hi
            else:
                mn, mx = min(m[1] for m in members), max(m[1] for m in members)
                skip = mx < 50000 or mn > 60000
            n_skipped += skip
            rows_scanned += 0 if skip else len(members)
        model[pred] = (len(zones), n_skipped, rows_scanned)
    got = {r["predicate"]: r for r in _rows(spark, "m9_zone_map_pruning")}
    assert set(got) == set(model)
    for pred, (n_files, n_skipped, scanned) in model.items():
        r = got[pred]
        assert r["n_files"] == n_files
        assert r["n_skipped"] == n_skipped
        assert r["rows_scanned"] == scanned
        assert r["scan_fraction"] == pytest.approx(
            scanned / len(rows), abs=1e-6
        )


def test_m9_correlated_predicate_prunes_more(spark):
    """The point of the query: the layout-correlated predicate must
    skip strictly more files than the uncorrelated one."""
    got = {r["predicate"]: r for r in _rows(spark, "m9_zone_map_pruning")}
    assert got["orderdate"]["n_skipped"] > got["totalprice"]["n_skipped"]


# ---------------------------------------------------------------------------
# h27 — cumulative crossover
# ---------------------------------------------------------------------------


def test_h27_matches_python_model(spark):
    rows = _duck(
        """
        SELECT CAST(o_orderdate AS DATE), o_orderpriority,
               CAST(o_totalprice AS DECIMAL(12,2))
        FROM orders
        """
    )
    daily = defaultdict(lambda: [Decimal(0), Decimal(0)])
    for day, prio, price in rows:
        daily[day][0 if prio in ("1-URGENT", "2-HIGH") else 1] += price
    cu = cs = Decimal(0)
    ahead = 0
    leads = []
    for day in sorted(daily):
        cu += daily[day][0]
        cs += daily[day][1]
        leads.append((cu - cs, day))
        ahead += cu > cs
    max_lead = max(l for l, _ in leads)
    min_lead = min(l for l, _ in leads)
    peak_day = min((d for l, d in leads if l == max_lead))
    (row,) = _rows(spark, "h27_cumulative_crossover")
    assert row["n_days"] == len(daily)
    assert row["days_urgent_ahead"] == ahead
    assert row["max_lead"] == pytest.approx(float(max_lead), abs=1e-6)
    assert row["max_deficit"] == pytest.approx(float(min_lead), abs=1e-6)
    assert row["peak_lead_day"] == peak_day.strftime("%Y-%m-%d")


# ---------------------------------------------------------------------------
# h28 — YoY switchers
# ---------------------------------------------------------------------------


def test_h28_matches_python_model(spark):
    rows = _duck(
        """
        SELECT o_custkey, date_part('year', o_orderdate), o_orderpriority,
               CAST(o_totalprice AS DECIMAL(12,2))
        FROM orders WHERE date_part('year', o_orderdate) IN (1999, 2000)
        """
    )
    seg = dict(_duck("SELECT c_custkey, c_mktsegment FROM customer"))
    grain = defaultdict(lambda: Decimal(0))
    for ck, yr, prio, price in rows:
        ch = "u" if prio in ("1-URGENT", "2-HIGH") else "s"
        grain[(ck, int(yr), ch)] += price
    custs = {ck for ck, _, _ in grain}
    model = defaultdict(lambda: [0, Decimal(0), Decimal(0)])
    for ck in custs:
        # both years must exist at the grain (inner join semantics)
        if not any((ck, 1999, c) in grain for c in "us"):
            continue
        if not any((ck, 2000, c) in grain for c in "us"):
            continue
        ud = grain[(ck, 2000, "u")] - grain[(ck, 1999, "u")]
        sd = grain[(ck, 2000, "s")] - grain[(ck, 1999, "s")]
        if ud > 0 and sd < 0:
            m = model[seg[ck]]
            m[0] += 1
            m[1] += ud
            m[2] += sd
    got = {r["segment"]: r for r in _rows(spark, "h28_yoy_switchers")}
    assert set(got) == set(model)
    for s, (n, gain, loss) in model.items():
        r = got[s]
        assert r["n_switchers"] == n
        assert r["urgent_gain"] == pytest.approx(float(gain), abs=0.01)
        assert r["standard_loss"] == pytest.approx(float(loss), abs=0.01)


# ---------------------------------------------------------------------------
# e18 — grid radius join
# ---------------------------------------------------------------------------


def test_e18_matches_brute_force(spark):
    custs = _duck("SELECT c_custkey, c_mktsegment FROM customer")
    supps = _duck2("SELECT s_suppkey FROM supplier")

    def coord(prefix, key, mod, offs):
        return (_md5_long(f"{prefix}{key}") % mod) / 100.0 - offs

    spos = [
        (coord("slat:", sk, 18000, 90), coord("slon:", sk, 36000, 180))
        for (sk,) in supps
    ]
    per_seg = defaultdict(lambda: [0, 0, 0.0])
    for ck, seg in custs:
        lat = coord("lat:", ck, 18000, 90)
        lon = coord("lon:", ck, 36000, 180)
        d2s = [
            (lat - sa) ** 2 + (lon - so) ** 2
            for sa, so in spos
            if (lat - sa) ** 2 + (lon - so) ** 2 <= 4.0
        ]
        if d2s:
            s = per_seg[seg]
            s[0] += 1
            s[1] += len(d2s)
            s[2] += min(d2s) ** 0.5
    got = {r["segment"]: r for r in _rows(spark, "e18_grid_radius_join")}
    assert set(got) == set(per_seg)
    for seg, (n_cov, n_pairs, dist_sum) in per_seg.items():
        r = got[seg]
        assert r["n_customers_covered"] == n_cov
        assert r["n_pairs"] == n_pairs
        assert r["avg_nearest_dist"] == pytest.approx(
            dist_sum / n_cov, abs=1e-6
        )


def _duck2(sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW supplier AS SELECT * FROM read_parquet('{SF}/supplier.parquet')"
    )
    return con.execute(sql).fetchall()


def test_e18_blocking_is_equi_join(spark):
    """The grid join must be a hash/merge equi-join on the cell key —
    a nested loop means the blocking key fell out and the plan IS the
    cross product the grid exists to avoid."""
    plan = REGISTRY["e18_grid_radius_join"].fn(spark, SF)
    txt = plan._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in txt, txt
    assert "BroadcastNestedLoopJoin" not in txt, txt
