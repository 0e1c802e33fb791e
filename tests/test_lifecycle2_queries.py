"""Model checks for c11 (delta-join view), f41 (winsorized moments),
f42 (forecast backtest), g17 (RFM segments), x89 (k-hop BFS reach) on
sf0.001 — naive Python re-derivations plus per-operator invariants."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from decimal import Decimal

import duckdb
import pytest

from calaveras_uniteus_etl_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF).collect()


def _duck(sql):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "events", "documents", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).fetchall()


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ntile(rank: int, total: int, n: int) -> int:
    q, r = divmod(total, n)
    threshold = r * (q + 1)
    if rank <= threshold:
        return (rank - 1) // (q + 1) + 1
    return r + (rank - threshold - 1) // q + 1


# ---------------------------------------------------------------------------
# c11 — delta-join view
# ---------------------------------------------------------------------------


def test_c11_slices_partition_both_tables(spark):
    """The old/delta split must be a PARTITION (disjoint, covering) of
    each table — otherwise the delta algebra silently over/under
    counts regardless of the join result."""
    (n_orders,) = _duck("SELECT COUNT(*) FROM orders")[0]
    (n_old, n_new) = _duck(
        "SELECT COUNT(*) FILTER (o_orderkey % 10 != 0),"
        " COUNT(*) FILTER (o_orderkey % 10 = 0) FROM orders"
    )[0]
    assert n_old + n_new == n_orders and n_new > 0
    (n_lines,) = _duck("SELECT COUNT(*) FROM lineitem")[0]
    (l_old, l_new) = _duck(
        "SELECT COUNT(*) FILTER (l_orderkey % 7 != 0),"
        " COUNT(*) FILTER (l_orderkey % 7 = 0) FROM lineitem"
    )[0]
    assert l_old + l_new == n_lines and l_new > 0


def test_c11_reconstitutes_full_join(spark):
    want = {
        p: (n, pytest.approx(rev, abs=1e-6))
        for p, n, rev in _duck(
            """
            SELECT o_orderpriority, COUNT(*),
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                                 * (1 - CAST(l_discount AS DECIMAL(6,4))))
                             AS DECIMAL(38,6)) AS DOUBLE)
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY 1
            """
        )
    }
    got = {r["priority"]: (r["n_lines"], r["revenue"]) for r in _rows(spark, "c11_delta_join_view")}
    assert set(got) == set(want)
    for p, (n, rev) in want.items():
        assert got[p][0] == n
        assert got[p][1] == rev


# ---------------------------------------------------------------------------
# f41 — winsorized moments
# ---------------------------------------------------------------------------


def test_f41_matches_python_model(spark):
    vals = sorted(
        v for (v,) in _duck("SELECT value FROM events WHERE value IS NOT NULL")
    )

    def q_cont(p):
        # linear-interpolated quantile, the quantile_cont/percentile def
        idx = p * (len(vals) - 1)
        lo, frac = int(idx), idx - int(idx)
        return vals[lo] if frac == 0 else vals[lo] * (1 - frac) + vals[lo + 1] * frac

    p05, p95 = q_cont(0.05), q_cont(0.95)
    clamped = [min(p95, max(p05, v)) for v in vals]
    n = len(clamped)
    mean = sum(clamped) / n
    var = sum(v * v for v in clamped) / n - mean * mean
    (row,) = _rows(spark, "f41_winsorized_stats")
    assert row["n"] == n
    assert row["p05"] == pytest.approx(p05, rel=1e-12)
    assert row["p95"] == pytest.approx(p95, rel=1e-12)
    assert row["n_clamped_lo"] == sum(1 for v in vals if v < p05)
    assert row["n_clamped_hi"] == sum(1 for v in vals if v > p95)
    assert row["mean_w"] == pytest.approx(mean, rel=1e-9)
    assert row["std_w"] == pytest.approx(var**0.5, rel=1e-6)
    # winsorized std can never exceed the raw std
    raw_mean = sum(vals) / n
    raw_std = (sum(v * v for v in vals) / n - raw_mean * raw_mean) ** 0.5
    assert row["std_w"] <= raw_std + 1e-12


# ---------------------------------------------------------------------------
# f42 — forecast backtest
# ---------------------------------------------------------------------------


def test_f42_matches_python_model(spark):
    daily = dict(
        _duck(
            """
            SELECT date_diff('day', DATE '1995-01-01', o_orderdate),
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                             AS DECIMAL(38,2)) AS DOUBLE)
            FROM orders GROUP BY 1
            """
        )
    )
    scored = [
        (y, daily[d - 1], daily[d - 7])
        for d, y in daily.items()
        if d - 1 in daily and d - 7 in daily
    ]
    n = len(scored)
    mae_n = sum(abs(y - f) for y, f, _ in scored) / n
    mae_s = sum(abs(y - f) for y, _, f in scored) / n
    mape_s = sum(abs(y - f) / y for y, _, f in scored) / n
    (row,) = _rows(spark, "f42_forecast_backtest")
    assert row["n_eval"] == n
    assert row["mae_naive"] == pytest.approx(mae_n, rel=1e-6)
    assert row["mae_snaive"] == pytest.approx(mae_s, rel=1e-6)
    assert row["mape_snaive"] == pytest.approx(mape_s, rel=1e-6)
    assert row["skill_vs_naive"] == pytest.approx(1 - mae_s / mae_n, abs=1e-6)


# ---------------------------------------------------------------------------
# g17 — RFM segments
# ---------------------------------------------------------------------------


def test_g17_matches_python_model(spark):
    custs = _duck(
        """
        SELECT o_custkey,
               date_diff('day', MAX(o_orderdate), DATE '2001-08-15'),
               COUNT(*),
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                         AS DECIMAL(38,2)) AS DOUBLE)
        FROM orders GROUP BY 1
        """
    )
    total = len(custs)

    def tiles(keyfn):
        order = sorted(custs, key=keyfn)
        return {
            row[0]: _ntile(i + 1, total, 5) for i, row in enumerate(order)
        }

    r_q = tiles(lambda r: (-r[1], r[0]))
    f_q = tiles(lambda r: (r[2], r[0]))
    m_q = tiles(lambda r: (r[3], r[0]))
    segs = defaultdict(lambda: [0, 0.0])
    for ck, _rec, _fr, mon in custs:
        code = r_q[ck] * 100 + f_q[ck] * 10 + m_q[ck]
        segs[code][0] += 1
        segs[code][1] += mon
    got = {r["segment_code"]: r for r in _rows(spark, "g17_rfm_segments")}
    assert set(got) == set(segs)
    for code, (n, value) in segs.items():
        assert got[code]["n_customers"] == n
        assert got[code]["segment_value"] == pytest.approx(value, abs=0.02)


def test_g17_quintiles_are_balanced(spark):
    """Each axis must distribute customers evenly (NTILE balance):
    per-axis tile sizes differ by at most 1."""
    rows = _rows(spark, "g17_rfm_segments")
    for shift in (100, 10, 1):
        axis = Counter()
        for r in rows:
            axis[(r["segment_code"] // shift) % 10] += r["n_customers"]
        assert set(axis) == {1, 2, 3, 4, 5}
        assert max(axis.values()) - min(axis.values()) <= 1


# ---------------------------------------------------------------------------
# x89 — k-hop BFS
# ---------------------------------------------------------------------------


def test_x89_matches_python_bfs(spark):
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in REGISTRY["x2_minhash_lsh_pairs"].fn(spark, SF).collect()
    ]
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    seeds = {n for n in adj if _md5_long(f"bfs:{n}") % 3 == 0}
    hop = {n: 0 for n in seeds}
    frontier = set(seeds)
    for h in (1, 2, 3):
        nxt = {m for n in frontier for m in adj[n]} - set(hop)
        for m in nxt:
            hop[m] = h
        frontier = nxt
    want = Counter(hop.values())
    got = {r["hop"]: r["n_docs"] for r in _rows(spark, "x89_khop_reach")}
    assert got == dict(want)


# ---------------------------------------------------------------------------
# f43 — cohort LTV
# ---------------------------------------------------------------------------


def test_f43_matches_python_model(spark):
    orders = _duck(
        """
        SELECT o_custkey,
               CAST(date_part('year', o_orderdate) * 12
                    + date_part('month', o_orderdate) AS BIGINT),
               CAST(o_totalprice AS DECIMAL(12,2))
        FROM orders
        """
    )
    first_m = {}
    for ck, m, _ in orders:
        first_m[ck] = min(first_m.get(ck, m), m)
    cohort_size = defaultdict(int)
    for ck, fm in first_m.items():
        cohort_size[fm // 12] += 1
    aged = defaultdict(lambda: Decimal(0))
    for ck, m, price in orders:
        aged[(first_m[ck] // 12, m - first_m[ck])] += price
    got = {
        (r["cohort_year"], r["age_months"]): r
        for r in _rows(spark, "f43_cohort_ltv")
    }
    assert set(got) == set(aged)
    for cohort in {c for c, _ in aged}:
        cum = Decimal(0)
        for age in sorted(a for c, a in aged if c == cohort):
            cum += aged[(cohort, age)]
            r = got[(cohort, age)]
            assert r["n_customers"] == cohort_size[cohort]
            assert r["cum_revenue"] == pytest.approx(float(cum), abs=0.01)
            assert r["ltv_per_customer"] == pytest.approx(
                float(cum) / cohort_size[cohort], abs=1e-4
            )


def test_f43_curve_is_monotone(spark):
    """LTV only accumulates: within a cohort the curve never dips."""
    rows = sorted(
        _rows(spark, "f43_cohort_ltv"),
        key=lambda r: (r["cohort_year"], r["age_months"]),
    )
    last = {}
    for r in rows:
        c = r["cohort_year"]
        assert r["cum_revenue"] >= last.get(c, 0.0) - 1e-9
        last[c] = r["cum_revenue"]


# ---------------------------------------------------------------------------
# d11 — prefix suggestions
# ---------------------------------------------------------------------------


def test_d11_matches_python_model(spark):
    names = dict(
        _duck("SELECT p_name, COUNT(*) FROM part GROUP BY p_name")
    )
    model = {}
    for plen in (2, 3):
        buckets = defaultdict(list)
        for name, n in names.items():
            if len(name) >= plen:
                buckets[name[:plen]].append((-n, name))
        for prefix, cands in buckets.items():
            for rank, (negn, name) in enumerate(sorted(cands)[:3], 1):
                model[(prefix, rank)] = (name, -negn)
    got = {
        (r["prefix"], r["rank"]): (r["suggestion"], r["n_parts"])
        for r in _rows(spark, "d11_prefix_suggest")
    }
    assert got == model


# ---------------------------------------------------------------------------
# f44 — LTOB downsampling
# ---------------------------------------------------------------------------


def test_f44_matches_python_model(spark):
    daily = sorted(
        _duck(
            """
            SELECT date_diff('day', DATE '1995-01-01', o_orderdate),
                   strftime(o_orderdate, '%Y-%m'),
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                             AS DECIMAL(38,2)) AS DOUBLE)
            FROM orders GROUP BY 1, 2
            """
        )
    )
    best = {}
    for i in range(1, len(daily) - 1):
        (xp, _, yp), (d, bucket, y), (xn, _, yn) = (
            daily[i - 1],
            daily[i],
            daily[i + 1],
        )
        area = abs((xp - xn) * (y - yp) - (xp - d) * (yn - yp)) / 2.0
        cur = best.get(bucket)
        if cur is None or (-area, d) < (-cur[1], cur[0]):
            best[bucket] = (d, area, y)
    got = {r["bucket"]: r for r in _rows(spark, "f44_downsample_ltob")}
    assert set(got) == set(best)
    for bucket, (d, area, y) in best.items():
        r = got[bucket]
        assert r["day_ord"] == d
        assert r["value"] == pytest.approx(y, abs=0.01)
        assert r["area"] == pytest.approx(area, abs=1e-4)


# ---------------------------------------------------------------------------
# g18 — concurrency curve
# ---------------------------------------------------------------------------


def test_g18_matches_python_sweep_line(spark):
    events = _duck("SELECT user_id, event_id, epoch_us(ts) FROM events")
    per_user = defaultdict(list)
    for uid, eid, t in events:
        per_user[uid].append((t, eid))
    gap = 12 * 3600 * 1_000_000
    sessions = []
    for uid, evs in per_user.items():
        evs.sort()
        start = prev = evs[0][0]
        for t, _ in evs[1:]:
            if t - prev > gap:
                sessions.append((uid, start, prev))
                start = t
            prev = t
        sessions.append((uid, start, prev))
    bounds = sorted(
        [(s, 1, uid) for uid, s, _ in sessions]
        + [(e + 1, -1, uid) for uid, _, e in sessions],
        key=lambda b: (b[0], b[1], b[2]),
    )
    conc = 0
    curve = []
    for t, d, _ in bounds:
        conc += d
        curve.append((t, conc))
    peak = max(c for _, c in curve)
    first_peak = min(t for t, c in curve if c == peak)
    weighted = sum(
        c * (curve[i + 1][0] - t) for i, (t, c) in enumerate(curve[:-1])
    )
    span = curve[-1][0] - curve[0][0]
    (row,) = _rows(spark, "g18_concurrency_curve")
    assert row["n_sessions"] == len(sessions)
    assert row["max_concurrent"] == peak
    assert row["first_peak_us"] == first_peak
    assert row["avg_concurrency"] == pytest.approx(weighted / span, abs=1e-6)


# ---------------------------------------------------------------------------
# g19 — segment migration
# ---------------------------------------------------------------------------


def test_g19_matches_python_model(spark):
    rows = _duck(
        """
        SELECT o_custkey, date_part('year', o_orderdate),
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                         AS DECIMAL(38,2)) AS DOUBLE)
        FROM orders WHERE date_part('year', o_orderdate) IN (1999, 2000)
        GROUP BY 1, 2
        """
    )
    by_year = defaultdict(list)
    for ck, yr, spend in rows:
        by_year[int(yr)].append((spend, ck))
    tiles = {}
    for yr, lst in by_year.items():
        lst.sort()
        for i, (_, ck) in enumerate(lst):
            tiles[(yr, ck)] = _ntile(i + 1, len(lst), 5)
    matrix = defaultdict(int)
    for yr, ck in list(tiles):
        if yr == 1999 and (2000, ck) in tiles:
            matrix[(tiles[(1999, ck)], tiles[(2000, ck)])] += 1
    row_n = defaultdict(int)
    for (qf, _qt), n in matrix.items():
        row_n[qf] += n
    got = {
        (r["q_from"], r["q_to"]): r for r in _rows(spark, "g19_segment_migration")
    }
    assert set(got) == set(matrix)
    for key, n in matrix.items():
        r = got[key]
        assert r["n_customers"] == n
        assert r["row_share"] == pytest.approx(n / row_n[key[0]], abs=1e-6)


# ---------------------------------------------------------------------------
# f47 — capture-recapture
# ---------------------------------------------------------------------------


def test_f47_matches_python_model(spark):
    rows = _duck(
        "SELECT o_custkey, date_part('year', o_orderdate) FROM orders"
    )
    p1 = {ck for ck, yr in rows if yr == 1997}
    p2 = {ck for ck, yr in rows if yr == 1998}
    n_true = len({ck for ck, _ in rows})
    n1, n2, m = len(p1), len(p2), len(p1 & p2)
    chapman = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    (row,) = _rows(spark, "f47_capture_recapture")
    assert (row["n1"], row["n2"], row["m"], row["n_true"]) == (n1, n2, m, n_true)
    assert row["chapman_estimate"] == pytest.approx(chapman, abs=1e-3)
    assert row["estimate_ratio"] == pytest.approx(chapman / n_true, abs=1e-5)
    # the estimator needs overlap; with heavy overlap it lands near
    # (and statistically around) the true count
    assert m > 0
    assert 0.5 < row["estimate_ratio"] < 2.0


# ---------------------------------------------------------------------------
# x95 — purged folds
# ---------------------------------------------------------------------------


def test_x95_matches_python_model(spark):
    rows = _duck("SELECT epoch_us(ts) FROM events")
    ts = [t for (t,) in rows]
    t0, t1 = min(ts), max(ts) + 1
    K, EMB = 5, 6 * 3600 * 1_000_000
    folds = defaultdict(lambda: [0, 0])
    for t in ts:
        f = min(K - 1, (K * (t - t0)) // (t1 - t0))
        lo = t0 + (f * (t1 - t0)) // K
        hi = t0 + ((f + 1) * (t1 - t0)) // K
        purged = (f > 0 and t - lo < EMB) or (f < K - 1 and hi - t <= EMB)
        folds[f][0] += 1
        folds[f][1] += purged
    got = {r["fold"]: r for r in _rows(spark, "x95_purged_time_folds")}
    assert set(got) == set(folds)
    for f, (n, purged) in folds.items():
        r = got[f]
        assert r["n_events"] == n
        assert r["n_purged"] == purged
        assert r["n_usable"] == n - purged


# ---------------------------------------------------------------------------
# f50 — burstiness
# ---------------------------------------------------------------------------


def test_f50_matches_python_model(spark):
    rows = _duck(
        "SELECT user_id, event_id, epoch_us(ts) FROM events"
    )
    per_user = defaultdict(list)
    for uid, eid, t in rows:
        per_user[uid].append((t, eid))
    bands = defaultdict(lambda: [0, 0.0])
    for uid, evs in per_user.items():
        evs.sort()
        gaps = [
            (evs[i + 1][0] - evs[i][0]) // 1_000_000
            for i in range(len(evs) - 1)
        ]
        if len(gaps) < 3:
            continue
        n = len(gaps)
        mu = sum(gaps) / n
        sigma = (sum(g * g for g in gaps) / n - mu * mu) ** 0.5
        b = (sigma - mu) / (sigma + mu)
        band = (
            "regular" if b < -0.05 else ("poisson_like" if b <= 0.05 else "bursty")
        )
        bands[band][0] += 1
        bands[band][1] += b
    got = {r["band"]: r for r in _rows(spark, "f50_burstiness")}
    assert set(got) == set(bands)
    for band, (n, total) in bands.items():
        r = got[band]
        assert r["n_users"] == n
        assert r["mean_burstiness"] == pytest.approx(total / n, abs=1e-6)
        assert -1.0 <= r["mean_burstiness"] <= 1.0


# ---------------------------------------------------------------------------
# d12 — top-k + Others
# ---------------------------------------------------------------------------


def test_d12_conserves_revenue(spark):
    """The fold must conserve mass: per-segment slice revenues sum to
    the segment's total revenue, and nation counts sum to the
    nation-domain size present in that segment."""
    from calaveras_uniteus_etl_spark.plans import REGISTRY

    rows = REGISTRY["d12_topk_plus_others"].fn(spark, SF).collect()
    want = {
        seg: total
        for seg, total in _duck(
            """
            SELECT c_mktsegment,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                             AS DECIMAL(38,2)) AS DOUBLE)
            FROM orders JOIN customer ON c_custkey = o_custkey
            GROUP BY 1
            """
        )
    }
    per_seg = defaultdict(float)
    named = defaultdict(int)
    for r in rows:
        per_seg[r["segment"]] += r["revenue"]
        if r["slice"] != "Others":
            named[r["segment"]] += 1
    assert set(per_seg) == set(want)
    for seg, total in want.items():
        assert per_seg[seg] == pytest.approx(total, abs=0.05)
        assert named[seg] <= 3  # at most K named slices


# ---------------------------------------------------------------------------
# x99 — corpus fingerprint
# ---------------------------------------------------------------------------


def test_x99_matches_python_model_and_detects_change(spark):
    from calaveras_uniteus_etl_spark.plans import REGISTRY

    docs = _duck("SELECT source, doc_id, text FROM documents")
    M = (1 << 31) - 1
    import hashlib as _h

    def dg(doc_id, text):
        return (
            int(_h.md5(f"{doc_id}|{text}".encode()).hexdigest()[:15], 16) % M
        )

    subtree = defaultdict(lambda: [0, 0])
    for src, doc_id, text in docs:
        subtree[src][0] += 1
        subtree[src][1] = (subtree[src][1] + dg(doc_id, text)) % M
    root = sum(h for _, h in subtree.values()) % M
    got = {r["source"]: r for r in REGISTRY["x99_corpus_fingerprint"].fn(spark, SF).collect()}
    assert set(got) == set(subtree)
    for src, (n, h) in subtree.items():
        assert got[src]["n_docs"] == n
        assert got[src]["source_hash"] == h
        assert got[src]["corpus_hash"] == root
    # sensitivity: flipping one byte of one doc changes its subtree hash
    src0, d0, t0 = docs[0]
    altered = (subtree[src0][1] - dg(d0, t0) + dg(d0, t0 + "x")) % M
    assert altered != subtree[src0][1]
