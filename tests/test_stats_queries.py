"""Model checks for the statistical / linkage query family.

The DuckDB oracles prove cross-engine agreement; these prove the MATH
— each operator is re-derived with a naive single-node Python model on
the sf0.001 tables and compared, plus the invariants every statistic
must satisfy regardless of data (bounds, degrees of freedom,
completeness of blocked candidate generation).
"""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pytest

from calaveras_uniteus_etl_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF).collect()


def _duck(sql):
    con = duckdb.connect()
    for t in ("customer", "orders", "documents", "events", "lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).fetchall()


def test_e14_deletion_blocking_is_complete(spark):
    """Blocked ER must find EXACTLY the naive O(n^2) within-nation
    edit-distance-1 pairs — deletion neighborhoods are complete for
    distance 1, so any missing pair is a blocking bug."""

    def lev_le1(a: str, b: str) -> bool:
        if abs(len(a) - len(b)) > 1:
            return False
        if len(a) > len(b):
            a, b = b, a
        if len(a) == len(b):
            return sum(x != y for x, y in zip(a, b)) <= 1
        # one insertion: advance past the single mismatch
        i = j = diffs = 0
        while i < len(a) and j < len(b):
            if a[i] == b[j]:
                i += 1
                j += 1
            else:
                diffs += 1
                if diffs > 1:
                    return False
                j += 1
        return True

    custs = _duck("SELECT c_custkey, c_nationkey, c_name FROM customer")
    naive = set()
    for i, (ka, na, sa) in enumerate(custs):
        for kb, nb, sb in custs[i + 1:]:
            if na == nb and lev_le1(sa, sb):
                naive.add((min(ka, kb), max(ka, kb)))
    got = {(r.id_a, r.id_b) for r in _rows(spark, "e14_entity_resolution")}
    assert got == naive


def test_f34_chi2_matches_python_model(spark):
    obs = _duck("SELECT lang, source, COUNT(*) FROM documents GROUP BY 1, 2")
    langs = sorted({r[0] for r in obs})
    srcs = sorted({r[1] for r in obs})
    cell = {(r[0], r[1]): r[2] for r in obs}
    n = sum(cell.values())
    rt = {g: sum(v for (a, _), v in cell.items() if a == g) for g in langs}
    ct = {s: sum(v for (_, b), v in cell.items() if b == s) for s in srcs}
    chi2 = 0.0
    for g in langs:
        for s in srcs:
            e = rt[g] * ct[s] / n
            o = cell.get((g, s), 0)
            chi2 += round((o - e) ** 2 / e, 6)
    (row,) = _rows(spark, "f34_chi_square")
    assert row.n_docs == n
    assert row.dof == (len(langs) - 1) * (len(srcs) - 1)
    assert row.chi2 >= 0
    assert row.chi2 == pytest.approx(chi2, abs=1e-6)


def test_f35_gini_matches_python_model(spark):
    rev = _duck(
        "SELECT CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100)"
        "       AS BIGINT)"
        "  FROM orders GROUP BY o_custkey"
    )
    xs = sorted(v for (v,) in rev)
    n, tot = len(xs), sum(xs)
    weighted = sum((i + 1) * x for i, x in enumerate(xs))
    gini = 2 * weighted / (n * tot) - (n + 1) / n
    (row,) = _rows(spark, "f35_gini_revenue")
    assert 0.0 <= row.gini < 1.0
    assert row.n_customers == n
    assert row.gini == pytest.approx(gini, abs=1e-9)


def test_x82_ks_bounds_and_model(spark):
    lens = _duck(
        "SELECT source, n_chars FROM documents WHERE source IN ('src0','src1')"
    )
    a = sorted(v for s, v in lens if s == "src0")
    b = sorted(v for s, v in lens if s == "src1")
    support = sorted(set(a) | set(b))
    import bisect

    d = max(
        abs(
            bisect.bisect_right(a, x) / len(a)
            - bisect.bisect_right(b, x) / len(b)
        )
        for x in support
    )
    (row,) = _rows(spark, "x82_ks_test")
    assert 0.0 <= row.d_stat <= 1.0
    assert row.d_stat == pytest.approx(d, abs=1e-9)
    assert row.ks_stat == pytest.approx(
        d * math.sqrt(len(a) * len(b) / (len(a) + len(b))), abs=1e-6
    )


def test_g12_pearson_bounded(spark):
    rows = _rows(spark, "g12_rolling_correlation")
    assert rows  # 30-day fixture must yield >= 24 full windows
    for r in rows:
        if r.pearson_r is not None:
            assert -1.0 - 1e-9 <= r.pearson_r <= 1.0 + 1e-9


def test_g11_mad_scores_match_python_model(spark):
    daily = _duck(
        "SELECT event_type, strftime(ts, '%Y-%m-%d'), COUNT(*)"
        " FROM events GROUP BY 1, 2"
    )

    def med(xs):
        xs = sorted(xs)
        m = len(xs) // 2
        return xs[m] if len(xs) % 2 else (xs[m - 1] + xs[m]) / 2

    by_type: dict = {}
    for t, _, c in daily:
        by_type.setdefault(t, []).append(c)
    meds = {t: med(v) for t, v in by_type.items()}
    mads = {t: med([abs(c - meds[t]) for c in v]) for t, v in by_type.items()}
    for r in _rows(spark, "g11_anomaly_flags"):
        assert r.med == meds[r.event_type]
        assert r.mad == mads[r.event_type]
        expect = round((r.cnt - r.med) / (1.4826 * r.mad), 6)
        assert r.robust_z == pytest.approx(expect, abs=1e-9)
        assert r.is_anomaly == (abs(r.robust_z) > 3)


def test_m7_shards_are_contiguous_and_complete(spark):
    rows = _rows(spark, "m7_compaction_plan")
    n_docs = _duck("SELECT COUNT(*), SUM(n_chars) FROM documents")[0]
    assert sum(r.n_docs for r in rows) == n_docs[0]
    assert sum(r.shard_bytes for r in rows) == n_docs[1]
    by_src: dict = {}
    for r in sorted(rows, key=lambda r: (r.source, r.shard)):
        by_src.setdefault(r.source, []).append(r)
    for src, shards in by_src.items():
        # shard ids dense from 0; doc-id ranges strictly increasing
        assert [s.shard for s in shards] == list(range(len(shards)))
        for a, b in zip(shards, shards[1:]):
            assert a.last_doc < b.first_doc


def test_e16_matches_naive_nearest(spark):
    evs = _duck(
        "SELECT event_id, user_id, event_type, epoch_us(ts) FROM events"
        " WHERE event_type IN ('purchase', 'error')"
    )
    purchases = [(e, u, t) for e, u, k, t in evs if k == "purchase"]
    errors = [(e, u, t) for e, u, k, t in evs if k == "error"]
    naive = {}
    for pe, pu, pt in purchases:
        best = None
        for ee, eu, et in errors:
            if eu != pu or abs(et - pt) > 3_600_000_000:
                continue
            key = (abs(et - pt), ee)
            if best is None or key < best[0]:
                best = (key, ee, et - pt)
        if best:
            naive[pe] = (best[1], best[2])
    got = {
        r.event_id: (r.nearest_error_id, r.gap_us)
        for r in _rows(spark, "e16_nearest_event_join")
    }
    assert got == naive


def test_x84_rbo_bounds_and_self_agreement(spark):
    (row,) = _rows(spark, "x84_rank_biased_overlap")
    assert 0.0 <= row.rbo <= 1.0
    assert 0 <= row.n_shared <= 50


def test_f37_shares_sum_to_one(spark):
    rows = _rows(spark, "f37_benford_audit")
    assert [r.digit for r in rows] == list(range(1, 10))
    assert sum(r.n_orders for r in rows) == _duck(
        "SELECT COUNT(*) FROM orders WHERE o_totalprice > 0"
    )[0][0]
    assert sum(r.observed_share for r in rows) == pytest.approx(1.0, abs=1e-6)


def test_x85_bootstrap_matches_python_model(spark):
    import hashlib

    from calaveras_uniteus_etl_spark.plans.queries_text import (
        _X85_B,
        _X85_CDF,
    )

    docs = _duck("SELECT doc_id, n_chars FROM documents")

    def md5_long(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def weight(doc_id, b) -> int:
        u = (md5_long(f"boot:{doc_id}:{b}") % 1_000_000_000) / 1e9
        for k, c in enumerate(_X85_CDF):
            if u < c:
                return k
        return 6

    means = []
    for b in range(_X85_B):
        sw = sx = 0
        for doc_id, n_chars in docs:
            w = weight(doc_id, b)
            sw += w
            sx += w * n_chars
        means.append(sx / sw)
    means.sort()

    def q(p):  # type-7 linear interpolation (Spark percentile/DuckDB)
        h = (len(means) - 1) * p
        lo = int(h)
        return means[lo] + (h - lo) * (means[min(lo + 1, len(means) - 1)] - means[lo])

    (row,) = _rows(spark, "x85_poisson_bootstrap")
    assert row.ci_lo <= row.ci_hi
    assert row.ci_lo == pytest.approx(q(0.025), abs=1e-6)
    assert row.ci_hi == pytest.approx(q(0.975), abs=1e-6)
    assert row.ci_lo <= row.mean_len <= row.ci_hi


def test_f38_mi_matches_python_model(spark):
    obs = _duck("SELECT lang, source, COUNT(*) FROM documents GROUP BY 1, 2")
    n = sum(c for _, _, c in obs)
    rt: dict = {}
    ct: dict = {}
    for g, s, c in obs:
        rt[g] = rt.get(g, 0) + c
        ct[s] = ct.get(s, 0) + c
    mi = sum(
        round((c / n) * math.log(c * n / (rt[g] * ct[s])), 12)
        for g, s, c in obs
    )
    hx = sum(round(-(r / n) * math.log(r / n), 12) for r in rt.values())
    hy = sum(round(-(s / n) * math.log(s / n), 12) for s in ct.values())
    (row,) = _rows(spark, "f38_mutual_information")
    assert row.mi_nats >= -1e-9  # MI is nonnegative
    assert row.mi_nats <= min(hx, hy) + 1e-9
    assert 0.0 <= row.nmi <= 1.0
    assert row.mi_nats == pytest.approx(mi, abs=1e-9)
    assert row.h_lang == pytest.approx(hx, abs=1e-9)
    assert row.h_src == pytest.approx(hy, abs=1e-9)


def test_g13_deciles_partition_customers(spark):
    rows = _rows(spark, "g13_decile_profile")
    assert [r.decile for r in rows] == list(range(1, 11))
    n_cust = _duck(
        "SELECT COUNT(DISTINCT o_custkey) FROM orders"
    )[0][0]
    assert sum(r.n_customers for r in rows) == n_cust
    # NTILE balance: sizes differ by at most 1
    sizes = [r.n_customers for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for r in rows:
        assert 0.0 < r.top_segment_share <= 1.0


def test_f45_mann_whitney_matches_python_model(spark):
    """U, z and rank-biserial re-derived with naive midranks."""
    rows = _duck(
        "SELECT event_type, value FROM events"
        " WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL"
    )
    vals = sorted((v, et) for et, v in rows)
    # midranks with ties
    ranks = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j][0] == vals[i][0]:
            j += 1
        mid = (i + 1 + j) / 2  # average of ranks i+1..j
        ranks[vals[i][0]] = mid
        i = j
    n1 = sum(1 for _, et in vals if et == "click")
    n2 = len(vals) - n1
    r1 = sum(ranks[v] for v, et in vals if et == "click")
    u = r1 - n1 * (n1 + 1) / 2
    from collections import Counter as _C

    tie = sum(t**3 - t for t in _C(v for v, _ in vals).values())
    n = n1 + n2
    var = n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (u - n1 * n2 / 2) / var**0.5
    rb = 1 - 2 * u / (n1 * n2)
    (row,) = _rows(spark, "f45_mann_whitney")
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["u_stat"] == pytest.approx(u, abs=1e-9)
    assert row["z_score"] == pytest.approx(z, abs=1e-6)
    assert row["rank_biserial"] == pytest.approx(rb, abs=1e-6)
    # bounds: U in [0, n1*n2], effect size in [-1, 1]
    assert 0 <= row["u_stat"] <= n1 * n2
    assert -1.0 <= row["rank_biserial"] <= 1.0


def test_f46_theil_sen_matches_python_model(spark):
    rows = _duck(
        """
        SELECT date_diff('day', DATE '1995-01-01', o_orderdate) // 7,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                         AS DECIMAL(38,2)) AS DOUBLE)
        FROM orders GROUP BY 1
        """
    )
    pts = sorted(rows)

    def q_cont(vals, p):
        vals = sorted(vals)
        idx = p * (len(vals) - 1)
        lo, frac = int(idx), idx - int(idx)
        return vals[lo] if frac == 0 else vals[lo] * (1 - frac) + vals[lo + 1] * frac

    slopes = [
        (y2 - y1) / (w2 - w1)
        for i, (w1, y1) in enumerate(pts)
        for (w2, y2) in pts[i + 1 :]
    ]
    m = q_cont(slopes, 0.5)
    b = q_cont([y - m * w for w, y in pts], 0.5)
    (row,) = _rows(spark, "f46_theil_sen")
    assert row["n_weeks"] == len(pts)
    assert row["n_pairs"] == len(slopes)
    assert row["ts_slope"] == pytest.approx(m, rel=1e-9)
    assert row["ts_intercept"] == pytest.approx(b, rel=1e-9)


def test_f48_acf_matches_python_model(spark):
    rows = _duck(
        """
        SELECT date_diff('day', DATE '1995-01-01', o_orderdate),
               CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                               AS DECIMAL(38,2)), 0) AS BIGINT)
        FROM orders GROUP BY 1
        """
    )
    series = dict(rows)
    got = {r["lag"]: r for r in _rows(spark, "f48_acf")}
    assert set(got) == set(range(1, 15))
    for lag in range(1, 15):
        pairs = [
            (series[d], series[d - lag])
            for d in series
            if d - lag in series
        ]
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        corr = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        r = got[lag]
        assert r["n_pairs"] == n
        assert r["acf"] == pytest.approx(corr, abs=1e-6)
        assert -1.0 <= r["acf"] <= 1.0


def test_f49_anova_matches_python_model(spark):
    rows = _duck("SELECT source, n_chars FROM documents")
    groups = {}
    for src, n in rows:
        groups.setdefault(src, []).append(n)
    N = sum(len(v) for v in groups.values())
    T = sum(sum(v) for v in groups.values())
    SS = sum(x * x for v in groups.values() for x in v)
    sum_tg2 = sum(sum(v) ** 2 / len(v) for v in groups.values())
    ss_b = sum_tg2 - T * T / N
    ss_w = SS - sum_tg2
    k = len(groups)
    f_stat = (ss_b / (k - 1)) / (ss_w / (N - k))
    eta2 = ss_b / (SS - T * T / N)
    (row,) = _rows(spark, "f49_anova_oneway")
    assert row["n_groups"] == k and row["n_docs"] == N
    assert row["ss_between"] == pytest.approx(ss_b, rel=1e-9)
    assert row["ss_within"] == pytest.approx(ss_w, rel=1e-9)
    assert row["f_stat"] == pytest.approx(f_stat, abs=1e-5)
    assert row["eta_squared"] == pytest.approx(eta2, abs=1e-6)
    # partition of variance: components reassemble the total
    assert row["ss_between"] + row["ss_within"] == pytest.approx(
        SS - T * T / N, rel=1e-9
    )
    assert 0.0 <= row["eta_squared"] <= 1.0


def test_f51_changepoint_matches_python_model(spark):
    rows = _duck(
        """
        SELECT date_diff('day', DATE '1995-01-01', o_orderdate),
               CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                               AS DECIMAL(38,2)), 0) AS BIGINT)
        FROM orders GROUP BY 1
        """
    )
    pts = sorted(rows)
    n = len(pts)
    s_n = sum(y for _, y in pts)
    s_k = 0
    best = None
    for k, (d, y) in enumerate(pts, 1):
        s_k += y
        d_k = abs(s_k - k * s_n / n)
        if best is None or (-d_k, d) < (-best[0], best[1]):
            best = (d_k, d)
    d_max, cp = best
    before = [y for d, y in pts if d <= cp]
    after = [y for d, y in pts if d > cp]
    (row,) = _rows(spark, "f51_changepoint")
    assert row["n_days"] == n
    assert row["changepoint_day"] == cp
    assert row["d_max"] == pytest.approx(d_max, abs=1e-3)
    assert row["mean_before"] == pytest.approx(
        sum(before) / len(before), abs=1e-3
    )
    assert row["mean_after"] == pytest.approx(
        sum(after) / len(after), abs=1e-3
    )


def test_f52_seasonal_strength_matches_python_model(spark):
    rows = _duck(
        """
        SELECT date_diff('day', DATE '1995-01-01', o_orderdate),
               CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                               AS DECIMAL(38,2)), 0) AS BIGINT)
        FROM orders GROUP BY 1
        """
    )
    pts = sorted(rows)
    n = len(pts)
    det = []
    for i, (d, y) in enumerate(pts):
        lo, hi = max(0, i - 3), min(n, i + 4)
        trend = sum(v for _, v in pts[lo:hi]) / (hi - lo)
        det.append((d, y - trend))
    dow_mean = {}
    for dow in range(7):
        vals = [v for d, v in det if d % 7 == dow]
        dow_mean[dow] = sum(vals) / len(vals)
    rem = [v - dow_mean[d % 7] for d, v in det]
    dvals = [v for _, v in det]

    def var(xs):
        m = sum(xs) / len(xs)
        return sum(x * x for x in xs) / len(xs) - m * m

    fs = max(0.0, 1.0 - var(rem) / var(dvals))
    (row,) = _rows(spark, "f52_seasonal_strength")
    assert row["n_days"] == n
    assert row["var_detrended"] == pytest.approx(var(dvals), rel=1e-6)
    assert row["var_remainder"] == pytest.approx(var(rem), rel=1e-6)
    assert row["seasonal_strength"] == pytest.approx(fs, abs=1e-5)
    assert 0.0 <= row["seasonal_strength"] <= 1.0
    # removing the seasonal component can only shrink variance
    assert row["var_remainder"] <= row["var_detrended"] + 1e-9


def test_f53_grouped_elasticity_matches_python_model(spark):
    rows = _duck(
        """
        SELECT p.p_type, l.l_quantity, l.l_extendedprice
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
        """
    )
    groups = {}
    for ptype, qty, price in rows:
        lx = round(math.log(float(price) / float(qty)) * 10000)
        ly = round(math.log(float(qty)) * 10000)
        groups.setdefault(ptype, []).append((lx, ly))
    got = {r["ptype"]: r for r in _rows(spark, "f53_grouped_elasticity")}
    assert set(got) == set(groups)
    for ptype, pts in groups.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        r = got[ptype]
        assert r["n"] == n
        assert r["elasticity"] == pytest.approx(slope, abs=1e-5)
        assert r["r2"] == pytest.approx(r2, abs=1e-5)
        assert 0.0 <= r["r2"] <= 1.0


def test_f54_runs_test_matches_python_model(spark):
    rows = _duck(
        """
        SELECT date_diff('day', DATE '1995-01-01', o_orderdate),
               CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                               AS DECIMAL(38,2)), 0) AS BIGINT)
        FROM orders GROUP BY 1
        """
    )
    pts = sorted(rows)
    sgns = []
    for (d0, y0), (d1, y1) in zip(pts, pts[1:]):
        if y1 != y0:
            sgns.append(1 if y1 > y0 else -1)
    n_up = sum(1 for s in sgns if s == 1)
    n_down = len(sgns) - n_up
    runs = 1 + sum(1 for a, b in zip(sgns, sgns[1:]) if a != b)
    n = n_up + n_down
    exp_r = 2 * n_up * n_down / n + 1
    var_r = (
        2 * n_up * n_down * (2 * n_up * n_down - n) / (n * n * (n - 1))
    )
    z = (runs - exp_r) / var_r**0.5
    (row,) = _rows(spark, "f54_runs_test")
    assert (row["n_up"], row["n_down"], row["n_runs"]) == (n_up, n_down, runs)
    assert row["expected_runs"] == pytest.approx(exp_r, abs=1e-5)
    assert row["z_score"] == pytest.approx(z, abs=1e-5)
    # runs count is bounded by the move count
    assert 1 <= row["n_runs"] <= n


def test_g20_peak_census_matches_python_model(spark):
    rows = _duck(
        """
        SELECT date_diff('day', DATE '1995-01-01', o_orderdate),
               CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                               AS DECIMAL(38,2)), 0) AS BIGINT)
        FROM orders GROUP BY 1
        """
    )
    pts = sorted(rows)
    kinds = {}
    for i in range(1, len(pts) - 1):
        d, y = pts[i]
        yp, yn = pts[i - 1][1], pts[i + 1][1]
        if y > yp and y >= yn:
            kinds.setdefault("peak", []).append((d, y))
        elif y < yp and y <= yn:
            kinds.setdefault("trough", []).append((d, y))
    got = {r["kind"]: r for r in _rows(spark, "g20_peak_census")}
    assert set(got) == set(kinds)
    for kind, days in kinds.items():
        r = got[kind]
        assert r["n_days"] == len(days)
        best = min(((-y, d) if kind == "peak" else (y, d)) for d, y in days)
        assert r["best_day"] == best[1]
        assert r["best_value"] == (-best[0] if kind == "peak" else best[0])


def test_m11_join_cardinality_matches_python_model(spark):
    orders = [k for (k,) in _duck("SELECT o_custkey FROM orders")]
    custs = [k for (k,) in _duck("SELECT c_custkey FROM customer")]
    from collections import Counter as _C

    a_rows, a_ndv = _C(), defaultdict(set)
    for k in orders:
        a_rows[k % 32] += 1
        a_ndv[k % 32].add(k)
    c_rows, c_ndv = _C(), defaultdict(set)
    for k in custs:
        c_rows[k % 32] += 1
        c_ndv[k % 32].add(k)
    est = sum(
        a_rows[b] * c_rows[b] / max(len(a_ndv[b]), len(c_ndv[b]))
        for b in set(a_rows) & set(c_rows)
    )
    cset = set(custs)
    actual = sum(1 for k in orders if k in cset)
    (row,) = _rows(spark, "m11_join_cardinality_audit")
    assert row["actual_rows"] == actual
    assert row["estimated_rows"] == pytest.approx(est, abs=1e-3)
    assert row["rel_error"] == pytest.approx((est - actual) / actual, abs=1e-5)


def test_f95_holt_matches_naive_recursion(spark):
    """Holt smoothing must equal the naive single-node recursion on
    the monthly series, and the fitted one-step forecasts must be the
    prior level+trend (anchor: fitted_1 = y_1)."""
    monthly = _duck(
        "SELECT strftime(o_orderdate, '%Y-%m') AS m, "
        "CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) "
        "AS DECIMAL(38,2)) AS DOUBLE) FROM orders GROUP BY m ORDER BY m"
    )
    level = trend = None
    expect = {}
    for i, (m, y) in enumerate(monthly):
        if i == 0:
            level, trend, fitted = y, 0.0, y
        else:
            fitted = level + trend
            new_level = 0.5 * y + 0.5 * (level + trend)
            trend = 0.5 * (new_level - level) + 0.5 * trend
            level = new_level
        expect[m] = (round(level, 6), round(trend, 6), round(fitted, 6))
    rows = _rows(spark, "f95_holt_trend")
    assert len(rows) == len(monthly)
    for r in rows:
        el, et, ef = expect[r["month"]]
        assert r["level"] == pytest.approx(el, abs=1e-9)
        assert r["trend"] == pytest.approx(et, abs=1e-9)
        assert r["fitted"] == pytest.approx(ef, abs=1e-9)
        assert r["residual"] == pytest.approx(
            round(r["y"] - r["fitted"], 6), abs=1e-6
        )


def test_f96_isotonic_matches_pava(spark):
    """The minimax closed form must equal the classic sequential
    pool-adjacent-violators algorithm (weighted), and the fit must be
    monotone non-decreasing in quantity."""
    grain = _duck(
        "SELECT CAST(l_quantity AS BIGINT) q, COUNT(*) n, "
        "CAST(SUM(CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) s "
        "FROM lineitem GROUP BY q ORDER BY q"
    )
    # weighted PAVA: pool blocks while a violator exists
    blocks = []  # [sum, weight, count_of_grain_rows]
    for _, n, s in grain:
        blocks.append([s, n, 1])
        while len(blocks) > 1 and (
            blocks[-2][0] / blocks[-2][1] > blocks[-1][0] / blocks[-1][1]
        ):
            s2, w2, c2 = blocks.pop()
            blocks[-1][0] += s2
            blocks[-1][1] += w2
            blocks[-1][2] += c2
    pava = []
    for s, w, c in blocks:
        pava.extend([s / w] * c)
    rows = sorted(_rows(spark, "f96_isotonic_discount"),
                  key=lambda r: r["quantity"])
    assert len(rows) == len(grain)
    fits = [r["iso_fit"] for r in rows]
    assert fits == sorted(fits)  # isotonic by construction
    for r, expect, (q, n, _) in zip(rows, pava, grain):
        assert r["quantity"] == q and r["n_lines"] == n
        assert r["iso_fit"] == pytest.approx(round(expect, 6), abs=1e-6)


def test_f97_bh_matches_manual_stepup(spark):
    """BH rejection set must equal the manual step-up on the query's
    own p-values, and the erfc-polynomial p must track math.erfc to
    the approximation's documented 1.5e-7 bound."""
    rows = sorted(_rows(spark, "f97_bh_fdr"), key=lambda r: r["p_rank"])
    m = len(rows)
    assert [r["p_rank"] for r in rows] == list(range(1, m + 1))
    ps = [r["p_value"] for r in rows]
    assert ps == sorted(ps)
    kmax = max(
        (i + 1 for i, p in enumerate(ps) if p <= (i + 1) * 0.10 / m),
        default=0,
    )
    for i, r in enumerate(rows):
        assert r["rejected"] == (1 if i + 1 <= kmax else 0)
        assert r["bh_crit"] == pytest.approx(
            round((i + 1) * 0.10 / m, 6), abs=1e-6
        )
        true_p = math.erfc(abs(r["z_stat"]) / math.sqrt(2.0))
        assert r["p_value"] == pytest.approx(true_p, abs=2e-6)


def test_x140_stages_partition_the_corpus(spark):
    """Curriculum stages must partition the corpus (doc and token
    masses add up), be difficulty-ordered, and balance token mass to
    within one document's tokens per boundary."""
    totals = _duck(
        "SELECT COUNT(*), SUM(len(string_split("
        "lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' '))), "
        "MAX(len(string_split("
        "lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')))"
        " FROM documents"
    )[0]
    n_docs, n_tokens, max_doc_tokens = totals
    rows = sorted(_rows(spark, "x140_curriculum_stages"),
                  key=lambda r: r["stage"])
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["tokens"] for r in rows) == n_tokens
    assert [r["stage"] for r in rows] == list(range(len(rows)))
    # stages are difficulty-ordered: envelopes may touch (ties) but
    # can never invert
    for a, b in zip(rows, rows[1:]):
        assert a["min_difficulty"] <= b["min_difficulty"]
        assert a["max_difficulty"] <= b["max_difficulty"]
    # equal-mass up to one document straddling each boundary
    ideal = n_tokens / 8
    for r in rows:
        assert abs(r["tokens"] - ideal) <= max_doc_tokens


def test_holt_linear_refuses_unbounded_grain(spark):
    """The sequential Arrow scan is only legitimate on a BOUNDED
    grain: a mis-grained caller (fact-table cardinality) must fail
    loudly inside the task, not funnel the relation through one
    worker."""
    from pyspark.errors.exceptions.captured import PythonException

    from calaveras_uniteus_etl_spark.operators.smoothing import holt_linear

    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id").cast("string").alias("t"),
        F.col("id").cast("double").alias("y"),
    )
    with pytest.raises(PythonException, match="max_rows"):
        holt_linear(df, "t", "y", max_rows=10).collect()
    assert holt_linear(df, "t", "y", max_rows=100).count() == 100
