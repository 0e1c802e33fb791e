"""Model checks for the round-6 additions.

The DuckDB oracles prove cross-engine agreement; these prove the MATH
— HLL estimator accuracy and mergeability against a naive Python
model, Fellegi-Sunter score ordering, calibration-bin conservation,
t-closeness bounds, PMI lift identities.
"""

from __future__ import annotations

import hashlib
import math

import duckdb

from calaveras_uniteus_etl_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF).collect()


def _duck(sql):
    con = duckdb.connect()
    for t in ("customer", "orders", "documents", "events", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).fetchall()


# ---------------------------------------------------------------------------
# x117/x118 — HyperLogLog
# ---------------------------------------------------------------------------


def _py_hll_registers(keys):
    """Naive single-node model of the exact md5-fold sketch."""
    regs = {}
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        idx, rest = h >> 51, h & ((1 << 51) - 1)
        rho = 52 if rest == 0 else 52 - rest.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


def test_x117_matches_python_model(spark):
    [(m, n_exact, n_set, sum_scaled, est, rel_err)] = _rows(
        spark, "x117_hll_registers"
    )
    keys = [r[0] for r in _duck("SELECT DISTINCT event_id FROM events")]
    regs = _py_hll_registers(keys)
    assert n_exact == len(keys)
    assert n_set == len(regs)
    model_sum = sum(1 << (52 - r) for r in regs.values()) + (
        512 - len(regs)
    ) * (1 << 52)
    assert sum_scaled == model_sum
    alpha = 0.7213 / (1 + 1.079 / 512)
    model_est = alpha * 512 * 512 * float(1 << 52) / model_sum
    assert est == model_est  # bit-identical: same integer inputs, same ops


def test_x117_estimator_accuracy(spark):
    [(m, n_exact, *_rest, est, rel_err)] = [
        (r["m"], r["n_exact"], r["hll_estimate"], r["rel_err"])
        for r in _rows(spark, "x117_hll_registers")
    ]
    # raw HLL standard error is 1.04/sqrt(m) ~= 4.6%; allow 4 sigma
    assert rel_err < 4 * 1.04 / math.sqrt(512), rel_err


def test_x118_merge_equals_global(spark):
    rows = {r["scope"]: r for r in _rows(spark, "x118_hll_shard_merge")}
    assert set(rows) == {"0", "1", "2", "3", "merged"}
    merged = rows["merged"]
    # max-merge of shard registers must reproduce the global sketch:
    # x117 computes the same registers from the unsharded input
    [(m, n_exact, n_set, sum_scaled, est, rel_err)] = _rows(
        spark, "x117_hll_registers"
    )
    assert merged["sum_scaled"] == sum_scaled
    assert merged["hll_estimate"] == est
    assert merged["n_exact"] == n_exact
    # shards partition the keys
    assert sum(rows[s]["n_exact"] for s in "0123") == n_exact


# ---------------------------------------------------------------------------
# e20 — Fellegi-Sunter
# ---------------------------------------------------------------------------


def test_e20_score_orders_by_agreement(spark):
    rows = _rows(spark, "e20_fellegi_sunter")
    assert rows, "blocking produced no candidate pairs"
    # score must be monotone in the agreement pattern: for every pair
    # of result rows where A's agreements are a superset of B's, A's
    # score must be >= B's (each field's agreement ratio > its
    # disagreement ratio because m > u everywhere here).
    def key(r):
        return (r["seg_agree"], r["band_agree"], r["act_agree"])

    scores = {}
    for r in rows:
        scores.setdefault(key(r), set()).add(r["score_milli"])
    for ka, sa in scores.items():
        for kb, sb in scores.items():
            if ka != kb and all(x >= y for x, y in zip(ka, kb)):
                assert min(sa) >= max(sb), (ka, kb)
    # identical agreement pattern => identical score (u-stats global)
    for k, s in scores.items():
        assert len(s) == 1, (k, s)


# ---------------------------------------------------------------------------
# f65 — calibration / Brier
# ---------------------------------------------------------------------------


def test_f65_bins_conserve_orders_and_bound_brier(spark):
    rows = _rows(spark, "f65_calibration_brier")
    [(n_orders,)] = _duck("SELECT COUNT(*) FROM orders")
    assert sum(r["n_orders"] for r in rows) == n_orders
    for r in rows:
        assert 0 <= r["n_pos"] <= r["n_orders"]
        # mean prediction lies inside the bin's milli-range
        mean_pred = r["sum_pred_milli"] / r["n_orders"]
        assert r["bin"] * 100 <= mean_pred < (r["bin"] + 1) * 100
        # per-row Brier contribution is bounded by 1000^2
        assert 0 <= r["brier_sum"] <= r["n_orders"] * 1000 * 1000


def test_f65_in_sample_rate_predictor_is_calibrated(spark):
    # an in-sample historical-rate predictor is calibrated by
    # construction: per bin, observed rate tracks mean prediction to
    # within the bin width plus quantization slack
    for r in _rows(spark, "f65_calibration_brier"):
        mean_pred = r["sum_pred_milli"] / r["n_orders"]
        obs = 1000.0 * r["n_pos"] / r["n_orders"]
        assert abs(mean_pred - obs) <= 100 + 1, r


# ---------------------------------------------------------------------------
# m12 — t-closeness
# ---------------------------------------------------------------------------


def test_m12_bounds_and_model(spark):
    rows = _rows(spark, "m12_t_closeness")
    assert 0 < len(rows) <= 20
    for r in rows:
        assert 0 <= r["t_milli"] <= 1000  # EMD of CDFs is in [0, 1]
        assert r["k_size"] >= 1
    # descending by t_milli with deterministic tie-break
    ts = [r["t_milli"] for r in rows]
    assert ts == sorted(ts, reverse=True)


def test_m12_singleton_class_has_high_t(spark):
    # a k=1 class concentrates all sensitive mass on one value; its
    # CDF gap vs the ~uniform global nation distribution must be large
    # (a median-positioned step vs uniform has mean gap ~= 0.25, the
    # minimum over step positions)
    rows = [r for r in _rows(spark, "m12_t_closeness") if r["k_size"] == 1]
    for r in rows:
        assert r["t_milli"] >= 240, r


# ---------------------------------------------------------------------------
# x119 — PMI collocations
# ---------------------------------------------------------------------------


def test_x119_lift_identity(spark):
    rows = _rows(spark, "x119_pmi_collocations")
    if not rows:  # tiny SF may have no bigram above min-count
        return
    [(n_tok,)] = _duck(
        "SELECT COUNT(*) FROM (SELECT unnest(string_split(lower("
        "regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), ' ')) AS t "
        "FROM documents) WHERE t <> ''"
    )
    for r in rows[:10]:
        lift = (
            r["pair_count"]
            * float(n_tok)
            / (r["w1_count"] * float(r["w2_count"]))
        )
        assert abs(r["lift_micro"] - round(lift * 1e6)) <= 1, r
        assert r["pair_count"] >= 5
        # a pair can't outnumber either constituent
        assert r["pair_count"] <= min(r["w1_count"], r["w2_count"])


# ---------------------------------------------------------------------------
# x120 — histogram quantiles
# ---------------------------------------------------------------------------


def test_x120_within_one_bin_of_exact(spark):
    rows = {r["q"]: r for r in _rows(spark, "x120_histogram_quantiles")}
    assert set(rows) == {25, 50, 75, 90, 99}
    width = 60_000_000 // 256
    for q, r in rows.items():
        [(exact,)] = _duck(
            f"SELECT quantile_disc(CAST(ROUND(o_totalprice*100) AS BIGINT), "
            f"{q / 100}) FROM orders"
        )
        assert abs(r["est_cents"] - exact) <= width, (q, r["est_cents"], exact)
        # rank bookkeeping: the located bin really contains the target
        assert r["cum_before"] < r["target_rank"] <= r["cum_before"] + r["bin_cnt"]
    [(n,)] = _duck("SELECT COUNT(*) FROM orders")
    assert all(r["n_total"] == n for r in rows.values())


# ---------------------------------------------------------------------------
# f66 — grouped ROC AUC
# ---------------------------------------------------------------------------


def test_f66_matches_naive_auc(spark):
    rows = _rows(spark, "f66_roc_auc")
    assert len(rows) == 5
    naive = _duck(
        """
        WITH feat AS (
          SELECT c_mktsegment AS seg,
                 CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mon,
                 CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS pband,
                 CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
          FROM orders JOIN customer ON c_custkey = o_custkey
        ), rates AS (
          SELECT seg, mon, pband,
                 CAST(SUM(y) * 1000 AS BIGINT) // COUNT(*) AS p
          FROM feat GROUP BY seg, mon, pband
        ), sc AS (SELECT f.seg, f.y, r.p FROM feat f JOIN rates r USING (seg, mon, pband))
        SELECT a.seg,
               SUM(CASE WHEN a.p > b.p THEN 1.0 WHEN a.p = b.p THEN 0.5 ELSE 0 END)
                 / COUNT(*) AS auc
        FROM sc a JOIN sc b ON a.seg = b.seg AND a.y = 1 AND b.y = 0
        GROUP BY a.seg
        """
    )
    got = {r["seg"]: r["auc_micro"] / 1e6 for r in rows}
    for seg, auc in naive:
        assert abs(got[seg] - auc) < 1e-6, (seg, got[seg], auc)
    for r in rows:
        assert 0 <= r["auc_micro"] <= 1_000_000


# ---------------------------------------------------------------------------
# x121 — water-filling budget
# ---------------------------------------------------------------------------


def test_x121_waterfill_invariants(spark):
    rows = _rows(spark, "x121_waterfill_budget")
    [(total,)] = _duck(
        "SELECT COUNT(*) FROM (SELECT unnest(string_split(lower("
        "regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), ' ')) AS t, source "
        "FROM documents)"
    )
    budget = total * 60 // 100
    assert sum(r["quota"] for r in rows) == budget  # exact spend
    for r in rows:
        assert 0 <= r["quota"] <= r["n_tokens"]
    capped = [r for r in rows if r["capped"]]
    uncapped = [r for r in rows if not r["capped"]]
    # every uncapped source keeps everything
    for r in uncapped:
        assert r["quota"] == r["n_tokens"]
    if capped:
        lo = min(r["quota"] for r in capped)
        hi = max(r["quota"] for r in capped)
        assert hi - lo <= 1  # capped quotas differ only by the remainder +1
        # no uncapped source exceeds the level (sortedness of the cut)
        assert all(r["n_tokens"] <= hi for r in uncapped)


# ---------------------------------------------------------------------------
# x122 — grouped HLL
# ---------------------------------------------------------------------------


def test_x122_per_source_registers_match_python_model(spark):
    rows = {r["source"]: r for r in _rows(spark, "x122_grouped_hll")}
    toks = _duck(
        "SELECT DISTINCT source, t FROM (SELECT source, unnest("
        "string_split(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', "
        "'g')), ' ')) AS t FROM documents)"
    )
    per = {}
    for src, term in toks:
        per.setdefault(src, set()).add(term)
    assert set(rows) == set(per)
    for src, terms in per.items():
        regs = _py_hll_registers_str(terms)
        model_sum = sum(1 << (52 - r) for r in regs.values()) + (
            512 - len(regs)
        ) * (1 << 52)
        assert rows[src]["n_exact"] == len(terms)
        assert rows[src]["sum_scaled"] == model_sum, src


def _py_hll_registers_str(keys):
    regs = {}
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        idx, rest = h >> 51, h & ((1 << 51) - 1)
        rho = 52 if rest == 0 else 52 - rest.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


# ---------------------------------------------------------------------------
# x123 — exact heavy hitters (two-phase)
# ---------------------------------------------------------------------------

_NORM_SQL = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"


def _py_term_counts():
    rows = _duck(f"SELECT {_NORM_SQL} FROM documents")
    from collections import Counter

    c = Counter()
    for (norm,) in rows:
        c.update(t for t in norm.split(" ") if t)
    return c


def test_x123_matches_exact_python_counts(spark):
    counts = _py_term_counts()
    n = sum(counts.values())
    expect = sorted(
        ((t, c) for t, c in counts.items() if c * 40 > n),
        key=lambda tc: (-tc[1], tc[0]),
    )
    rows = _rows(spark, "x123_heavy_hitters")
    assert [(r["term"], r["cnt"]) for r in rows] == expect
    for r in rows:
        assert r["share"] == round(r["cnt"] / n, 6)


def test_x123_candidates_are_a_superset_under_any_partitioning(spark):
    """Pigeonhole guarantee: per-batch survivors cover every true HH."""
    from pyspark.sql import functions as F

    from calaveras_uniteus_etl_spark.operators.sketches import (
        local_heavy_candidates,
    )
    from calaveras_uniteus_etl_spark.plans.queries_text import NORM_SPARK
    from calaveras_uniteus_etl_spark.plans.tables import table

    counts = _py_term_counts()
    n = sum(counts.values())
    true_hh = {t for t, c in counts.items() if c * 40 > n}
    toks = (
        table(spark, SF, "documents")
        .select(
            F.explode(
                F.expr(f"split({NORM_SPARK.format(col='text')}, ' ')")
            ).alias("term")
        )
        .filter(F.col("term") != "")
    )
    for parts in (1, 3, 17):
        cand = {
            r["term"]
            for r in local_heavy_candidates(
                toks.repartition(parts), "term", k=40
            ).collect()
        }
        assert true_hh <= cand, parts


# ---------------------------------------------------------------------------
# x124 — pairwise Jensen-Shannon divergence
# ---------------------------------------------------------------------------


def test_x124_matches_float_jsd_and_bounds(spark):
    import math as m

    rows = _rows(spark, "x124_source_jsd")
    # 20 sources -> 190 ordered pairs
    assert len(rows) == 190
    per = {}
    for (src, norm) in _duck(f"SELECT source, {_NORM_SQL} FROM documents"):
        d = per.setdefault(src, {})
        for t in norm.split(" "):
            if t:
                d[t] = d.get(t, 0) + 1
    for r in rows[:25]:
        pa, qa = per[r["source_a"]], per[r["source_b"]]
        ta, tb = sum(pa.values()), sum(qa.values())
        jsd = 0.0
        for t in set(pa) | set(qa):
            p = pa.get(t, 0) / ta
            q = qa.get(t, 0) / tb
            mix = (p + q) / 2
            if p:
                jsd += 0.5 * p * m.log(p / mix)
            if q:
                jsd += 0.5 * q * m.log(q / mix)
        assert 0.0 <= r["jsd_nats"] <= m.log(2) + 1e-9
        assert abs(r["jsd_nats"] - jsd) < 1e-4  # micro-nat quantization
        shared_a = sum(pa[t] for t in pa if t in qa)
        assert r["only_a_tokens"] == ta - shared_a


# ---------------------------------------------------------------------------
# f67 — Kruskal-Wallis
# ---------------------------------------------------------------------------


def test_f67_matches_python_rank_model(spark):
    [(n, k, h_stat, tie_c, h_corr)] = _rows(spark, "f67_kruskal_wallis")
    data = _duck(
        "SELECT CAST(l_quantity AS BIGINT), l_returnflag FROM lineitem"
    )
    assert n == len(data) and k == 3
    # mid-ranks over the value domain
    from collections import Counter, defaultdict

    vt = Counter(q for q, _ in data)
    cum, mid = 0, {}
    for q in sorted(vt):
        mid[q] = cum + (vt[q] + 1) / 2
        cum += vt[q]
    rsum, ng = defaultdict(float), Counter()
    for q, flag in data:
        rsum[flag] += mid[q]
        ng[flag] += 1
    s = sum(rsum[f] ** 2 / ng[f] for f in rsum)
    h = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
    c = 1.0 - sum(t**3 - t for t in vt.values()) / (n**3 - n)
    assert abs(h_stat - h) < 1e-4
    assert abs(tie_c - c) < 2e-6  # tie_c is 6dp-rounded
    assert abs(h_corr - h / c) < 1e-4


# ---------------------------------------------------------------------------
# m13 — referential integrity
# ---------------------------------------------------------------------------


def test_m13_counts_and_clean_fks(spark):
    rows = {r["relation"]: r for r in _rows(spark, "m13_referential_integrity")}
    assert len(rows) == 7
    [(n_orders,)] = _duck("SELECT COUNT(*) FROM orders")
    assert rows["orders->customer"]["child_rows"] == n_orders
    # the synthetic star schema is referentially clean: audit proves it
    for r in rows.values():
        assert r["orphan_rows"] == 0 and r["orphan_rate"] == 0.0


# ---------------------------------------------------------------------------
# x125 — diagonal Mahalanobis outliers
# ---------------------------------------------------------------------------


def test_x125_matches_python_fixed_point_model(spark):
    import math as m

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    vecs = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    q = {vid: [m.floor(float(x) * (1 << 20)) for x in emb] for vid, emb in vecs}
    dims = len(next(iter(q.values())))
    nvec = len(q)
    maha = {vid: 0 for vid in q}
    for j in range(dims):
        vals = [q[vid][j] for vid in q]
        s, ss = sum(vals), sum(v * v for v in vals)
        # mirror the engine op order exactly: double(ss) - double(s)*s/n
        s_d, ss_d = float(s), float(ss)
        if not (ss_d - s_d * s / nvec > 0):
            continue
        var = (ss_d - s_d * s / nvec) / nvec
        mu = s_d / nvec
        for vid in q:
            dv = q[vid][j] - mu
            # engines round half away from zero, not banker's
            maha[vid] += m.floor(dv * dv / var * 1e6 + 0.5)
    top = sorted(maha.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = _rows(spark, "x125_mahalanobis_outliers")
    assert [(r["vec_id"], r["maha2_micro"]) for r in rows] == top


# ---------------------------------------------------------------------------
# f68 — cross-correlation
# ---------------------------------------------------------------------------


def test_f68_matches_python_pearson_model(spark):
    rows = _rows(spark, "f68_cross_correlation")
    assert [r["lag"] for r in rows] == list(range(-7, 8))
    daily = _duck(
        "SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,"
        " event_type, CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT),"
        " COUNT(*) FROM events WHERE event_type IN ('purchase','click')"
        " GROUP BY 1, 2"
    )
    x = {d: cents for d, et, cents, _ in daily if et == "purchase"}
    y = {d: n for d, et, _, n in daily if et == "click"}
    import math as m

    for r in rows:
        lag = r["lag"]
        pairs = [(x[d], y[d + lag]) for d in x if d + lag in y]
        n = len(pairs)
        assert r["n_pairs"] == n
        sx = sum(p for p, _ in pairs)
        sy = sum(q for _, q in pairs)
        sxy = sum(p * q for p, q in pairs)
        sxx = sum(p * p for p, _ in pairs)
        syy = sum(q * q for _, q in pairs)
        num = n * sxy - sx * sy
        den = m.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        assert abs(r["xcorr"] - num / den) < 1e-5


# ---------------------------------------------------------------------------
# m14 — DP histogram release
# ---------------------------------------------------------------------------


def test_m14_noise_matches_python_laplace_model(spark):
    import math as m

    rows = _rows(spark, "m14_dp_histogram")
    assert len(rows) == 25
    for r in rows:
        h = int(
            hashlib.md5(f"m14|{r['nation']}".encode()).hexdigest()[:15], 16
        )
        num = (1 << 60) - abs(2 * h - (1 << 60))
        sgn = 1 if 2 * h >= (1 << 60) else -1
        ln_micro = m.floor(m.log(num / (1 << 60)) * 1e6 + 0.5)
        noise = -sgn * ln_micro / 1e6
        assert abs(r["noise"] - noise) < 2e-6
        assert abs(r["noisy_count"] - (r["true_count"] + noise)) < 2e-6
        # Laplace(1/eps=1): |noise| is Exp(1)-ish, sanity-bound it
        assert abs(noise) < 25


def test_m14_true_counts_match_duck(spark):
    rows = {r["nation"]: r["true_count"] for r in _rows(spark, "m14_dp_histogram")}
    for nation, n in _duck(
        "SELECT n_name, COUNT(*) FROM customer c JOIN "
        "read_parquet('/root/testdata/sf0.001/nation.parquet') n "
        "ON n.n_nationkey = c.c_nationkey GROUP BY 1"
    ):
        assert rows[nation] == n


# ---------------------------------------------------------------------------
# m15 — bloom sizing advisor
# ---------------------------------------------------------------------------


def test_m15_matches_closed_form(spark):
    import math as m

    rows = _rows(spark, "m15_bloom_sizing")
    assert len(rows) == 8  # 4 key columns x 2 fp targets
    ndv = dict(
        _duck(
            "SELECT 'lineitem.l_orderkey', COUNT(DISTINCT l_orderkey) FROM lineitem "
            "UNION ALL SELECT 'lineitem.l_partkey', COUNT(DISTINCT l_partkey) FROM lineitem "
            "UNION ALL SELECT 'lineitem.l_suppkey', COUNT(DISTINCT l_suppkey) FROM lineitem "
            "UNION ALL SELECT 'orders.o_custkey', COUNT(DISTINCT o_custkey) FROM orders"
        )
    )
    for r in rows:
        n = ndv[r["key_col"]]
        assert r["ndv"] == n
        mult = -m.log(r["fp"]) / m.log(2) ** 2
        bits = m.ceil(n * mult)
        assert r["bits"] == bits
        assert r["k_hashes"] == m.floor(bits / n * m.log(2) + 0.5)
        assert r["n_bytes"] == (bits + 7) // 8
        # textbook sanity: ~9.6 bits/key at 1%, ~14.4 at 0.1%
        assert 9 <= r["bits"] / n <= 15


# ---------------------------------------------------------------------------
# j7 — regex battery
# ---------------------------------------------------------------------------


def test_j7_matches_python_re(spark):
    import re

    rows = _rows(spark, "j7_regex_suite")
    names = dict(
        _duck("SELECT c_custkey, c_name FROM customer WHERE c_custkey < 80")
    )
    assert len(rows) == len(names)
    for r in rows[:20]:
        name = names[r["c_custkey"]]
        mo = re.search(r"([0-9]+)", name)
        assert r["first_digit_run"] == (mo.group(1) if mo else "")
        assert r["digits_masked"] == re.sub(r"[0-9]", "#", name)
        assert r["n_zero_runs"] == len(re.findall(r"0+", name))
        assert r["has_double_zero"] == bool(re.search("00", name))
        assert r["ilike_hit"] is True
        assert r["after_hash"] == name.split("#")[1]
        tail = re.search(r"[1-9][0-9]*$", name)
        assert r["nonzero_tail"] == (tail.group(0) if tail else "")


# ---------------------------------------------------------------------------
# x126 — grouped histogram quantiles
# ---------------------------------------------------------------------------


def test_x126_within_one_bin_of_exact_per_source(spark):
    rows = _rows(spark, "x126_source_length_quantiles")
    exact = {}
    for src, qd in _duck(
        "SELECT source, quantile_disc(n_chars, [0.25, 0.50, 0.90]) "
        "FROM documents GROUP BY source"
    ):
        for q, v in zip((25, 50, 90), qd):
            exact[(src, q)] = v
    assert len(rows) == len(exact)  # every (source, q) located exactly once
    for r in rows:
        err = abs(r["est_cents"] - exact[(r["source"], r["q"])])
        assert err <= 8, r  # one 8-char bin width


def test_x126_group_totals_conserve_docs(spark):
    rows = _rows(spark, "x126_source_length_quantiles")
    per_source = dict(_duck("SELECT source, COUNT(*) FROM documents GROUP BY 1"))
    for r in rows:
        assert r["n_total"] == per_source[r["source"]]


# ---------------------------------------------------------------------------
# g22 — growth accounting
# ---------------------------------------------------------------------------


def test_g22_matches_python_model_and_identities(spark):
    rows = {r["d"]: r for r in _rows(spark, "g22_growth_accounting")}
    act = _duck(
        "SELECT DISTINCT user_id, "
        "date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) FROM events"
    )
    days = {}
    for uid, d in act:
        days.setdefault(uid, set()).add(d)
    max_d = max(d for s in days.values() for d in s)
    from collections import Counter

    model = {s: Counter() for s in ("new", "retained", "resurrected", "churned")}
    for uid, ds in days.items():
        sds = sorted(ds)
        for i, d in enumerate(sds):
            if i == 0:
                model["new"][d] += 1
            elif d - sds[i - 1] == 1:
                model["retained"][d] += 1
            else:
                model["resurrected"][d] += 1
            if (d + 1 not in ds) and d + 1 <= max_d:
                model["churned"][d + 1] += 1
    all_days = set().union(*(c.keys() for c in model.values()))
    assert set(rows) == all_days
    for d, r in rows.items():
        assert r["n_new"] == model["new"][d]
        assert r["n_retained"] == model["retained"][d]
        assert r["n_resurrected"] == model["resurrected"][d]
        assert r["n_churned"] == model["churned"][d]
        assert (
            r["net_growth"]
            == r["n_new"] + r["n_resurrected"] - r["n_churned"]
        )
    # conservation: DAU(d) - DAU(d-1) == net growth counted on day d
    dau = Counter()
    for uid, ds in days.items():
        for d in ds:
            dau[d] += 1
    for d, r in rows.items():
        if d - 1 in dau or d in dau:
            assert dau.get(d, 0) - dau.get(d - 1, 0) == r["net_growth"], d


# ---------------------------------------------------------------------------
# f69 — Cohen's kappa
# ---------------------------------------------------------------------------


def test_f69_matches_confusion_matrix_kappa(spark):
    [(n_docs, n_agree, po, pe, kappa)] = _rows(spark, "f69_cohen_kappa")
    cm = {
        (r["lang_actual"], r["lang_pred"]): r["n_docs"]
        for r in _rows(spark, "x7_language_confusion")
    }
    n = sum(cm.values())
    agree = sum(v for (a, p), v in cm.items() if a == p)
    rows_m, cols_m = {}, {}
    for (a, p), v in cm.items():
        rows_m[a] = rows_m.get(a, 0) + v
        cols_m[p] = cols_m.get(p, 0) + v
    pe_num = sum(rows_m.get(c, 0) * cols_m.get(c, 0)
                 for c in set(rows_m) | set(cols_m))
    assert n_docs == n and n_agree == agree
    assert abs(po - agree / n) < 1e-6
    assert abs(pe - pe_num / n / n) < 1e-6
    model_kappa = (agree / n - pe_num / n**2) / (1 - pe_num / n**2)
    assert abs(kappa - model_kappa) < 1e-5
    assert -1.0 <= kappa <= 1.0


# ---------------------------------------------------------------------------
# f70 — Gini decision stump
# ---------------------------------------------------------------------------


def test_f70_matches_python_stump(spark):
    [row] = _rows(spark, "f70_gini_split")
    data = _duck(
        "SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT), "
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END FROM orders"
    )
    w = 60_000_000 // 256
    from collections import Counter

    n_b, pos_b = Counter(), Counter()
    for cents, y in data:
        b = min(cents // w, 255)
        n_b[b] += 1
        pos_b[b] += y
    n_tot, pos_tot = sum(n_b.values()), sum(pos_b.values())
    best = None
    n_l = pos_l = 0
    for b in sorted(n_b):
        n_l += n_b[b]
        pos_l += pos_b[b]
        if n_l >= n_tot:
            break
        n_r, pos_r = n_tot - n_l, pos_tot - pos_l
        left = pos_l * (n_l - pos_l) / n_l if n_l else 0.0
        right = pos_r * (n_r - pos_r) / n_r if n_r else 0.0
        imp = 2.0 * (left + right) / n_tot
        if best is None or imp < best[0]:
            best = (imp, b, n_l, pos_l, n_r, pos_r)
    imp, b, n_l, pos_l, n_r, pos_r = best
    assert row["threshold_cents"] == (b + 1) * w
    assert (row["n_left"], row["pos_left"]) == (n_l, pos_l)
    assert (row["n_right"], row["pos_right"]) == (n_r, pos_r)
    assert abs(row["split_gini"] - imp) < 1e-6
    base = 2.0 * pos_tot * (n_tot - pos_tot) / n_tot / n_tot
    assert abs(row["base_gini"] - base) < 1e-6
    assert abs(row["gain"] - (base - imp)) < 1e-6
    # a split can never be worse than the root
    assert row["gain"] >= -1e-12


# ---------------------------------------------------------------------------
# g23 — engagement ratios
# ---------------------------------------------------------------------------


def test_g23_matches_python_rolling_distinct(spark):
    rows = {r["d"]: r for r in _rows(spark, "g23_engagement_ratios")}
    act = _duck(
        "SELECT DISTINCT user_id, "
        "date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) FROM events"
    )
    by_day = {}
    for uid, d in act:
        by_day.setdefault(d, set()).add(uid)
    assert set(rows) == set(by_day)
    for d, r in rows.items():
        dau = by_day[d]
        wau = set().union(*(by_day.get(x, set()) for x in range(d - 6, d + 1)))
        mau = set().union(*(by_day.get(x, set()) for x in range(d - 27, d + 1)))
        assert r["dau"] == len(dau)
        assert r["wau"] == len(wau)
        assert r["mau"] == len(mau)
        assert r["dau"] <= r["wau"] <= r["mau"]  # window nesting
        assert r["dau_wau"] == round(len(dau) / len(wau), 6)
        assert r["dau_mau"] == round(len(dau) / len(mau), 6)


# ---------------------------------------------------------------------------
# x127 — Simpson's paradox detector
# ---------------------------------------------------------------------------


def test_x127_matches_python_sign_model(spark):
    rows = _rows(spark, "x127_simpson_paradox")
    assert len(rows) == 10  # 5 event types -> 10 ordered pairs
    cells = {}
    for d, t, cents, n in _duck(
        "SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)), "
        "event_type, SUM(CAST(round(value*100) AS BIGINT)), COUNT(*) "
        "FROM events GROUP BY 1, 2"
    ):
        cells[(d, t)] = (cents, n)

    def sgn(a, b):
        return (a > b) - (a < b)

    for r in rows:
        ta, tb = r["type_a"], r["type_b"]
        ca = sum(c for (d, t), (c, n) in cells.items() if t == ta)
        na = sum(n for (d, t), (c, n) in cells.items() if t == ta)
        cb = sum(c for (d, t), (c, n) in cells.items() if t == tb)
        nb = sum(n for (d, t), (c, n) in cells.items() if t == tb)
        agg_sign = sgn(ca * nb, cb * na)
        assert r["agg_sign"] == agg_sign
        days = {d for (d, t) in cells if t in (ta, tb)}
        both = [d for d in days if (d, ta) in cells and (d, tb) in cells]
        assert r["n_strata"] == len(both)
        agree = rev = 0
        for d in both:
            (xc, xn), (yc, yn) = cells[(d, ta)], cells[(d, tb)]
            s = sgn(xc * yn, yc * xn)
            agree += s == agg_sign
            rev += s == -agg_sign and s != 0
        assert r["n_agree"] == agree and r["n_reverse"] == rev
        assert r["paradox"] == (2 * rev > len(both))


# ---------------------------------------------------------------------------
# f71 — dispersion index
# ---------------------------------------------------------------------------


def test_f71_matches_python_moments(spark):
    rows = _rows(spark, "f71_dispersion_index")
    assert len(rows) == 5
    data = _duck("SELECT user_id, event_type FROM events")
    users = {u for u, _ in data}
    from collections import Counter

    per = Counter(data)
    for r in rows:
        cs = [per.get((u, r["event_type"]), 0) for u in users]
        n, sc = len(cs), sum(cs)
        scc = sum(c * c for c in cs)
        assert r["n_users"] == n and r["n_events"] == sc
        mean = sc / n
        var = (n * scc - sc * sc) / (n * (n - 1))
        assert abs(r["mean_c"] - mean) < 1e-6
        assert abs(r["var_c"] - var) < 1e-6
        assert abs(r["dispersion"] - var / mean) < 1e-5
        assert abs(r["chi2_stat"] - (n - 1) * var / mean) < 1e-3


# ---------------------------------------------------------------------------
# g24 — inter-arrival statistics
# ---------------------------------------------------------------------------


def test_g24_matches_python_gap_moments(spark):
    rows = _rows(spark, "g24_interarrival_stats")
    assert len(rows) == 5
    data = _duck(
        "SELECT user_id, event_type, event_id, epoch_us(ts) FROM events"
    )
    per = {}
    for uid, et, eid, us in data:
        per.setdefault((uid, et), []).append((us, eid))
    gaps_by_type = {}
    for (uid, et), evs in per.items():
        evs.sort()
        for (a, _), (b, _) in zip(evs, evs[1:]):
            gaps_by_type.setdefault(et, []).append(b - a)
    for r in rows:
        gs = gaps_by_type[r["event_type"]]
        n, sg = len(gs), sum(gs)
        sgg = sum(g * g for g in gs)
        assert r["n_gaps"] == n
        assert r["mean_gap_us"] == sg // n
        cv2 = (n * float(sgg) - float(sg) * sg) / (float(sg) * sg)
        assert abs(r["cv2"] - cv2) < 1e-6
        assert r["cv2"] > 0


# ---------------------------------------------------------------------------
# x128 — PII census
# ---------------------------------------------------------------------------


def test_x128_clean_corpus_and_digest(spark):
    rows = _rows(spark, "x128_pii_census")
    assert len(rows) == 20
    clean_digest = dict(
        _duck("SELECT source, min(md5(text)) FROM documents GROUP BY source")
    )
    for r in rows:
        # the synthetic corpus is PII-free; the audit must prove it
        for det in ("n_email", "n_phone", "n_ssn", "n_pan"):
            assert r[det] == 0, (r["source"], det)
        assert r["n_pii_docs"] == 0 and r["pii_rate"] == 0.0
        # no masking happened -> scrub digest == plain-text digest
        assert r["scrub_digest_min"] == clean_digest[r["source"]]


def test_x128_detectors_fire_on_planted_pii(spark):
    import re

    from calaveras_uniteus_etl_spark.plans.queries_text import (
        _X128_MASK,
        _X128_PATS,
    )

    planted = (
        "reach me at jane.doe+spam@example.co.uk or +1 (415) 555-0199, "
        "ssn 123-45-6789, card 4242424242424242"
    )
    hits = {n: len(re.findall(p, planted)) for n, p in _X128_PATS.items()}
    assert all(v >= 1 for v in hits.values()), hits
    scrubbed = planted
    for p in _X128_PATS.values():
        scrubbed = re.sub(p, _X128_MASK, scrubbed)
    for p in _X128_PATS.values():
        assert not re.search(p, scrubbed)
    # the Spark expressions agree with Python re on the same text
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(planted,)], ["text"])
    got = df.select(
        *[
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit(p), F.lit(0))
            ).alias(n)
            for n, p in _X128_PATS.items()
        ]
    ).collect()[0]
    for n in _X128_PATS:
        assert got[n] == hits[n], n


# ---------------------------------------------------------------------------
# x129 — feature-hash collisions
# ---------------------------------------------------------------------------


def test_x129_matches_python_bucketing(spark):
    import math as m

    rows = _rows(spark, "x129_feature_hash_collisions")
    assert [r["m"] for r in rows] == [256, 1024, 4096]
    terms = {
        t
        for (norm,) in _duck(
            r"SELECT lower(regexp_replace(trim(text), '\s+', ' ', 'g')) "
            "FROM documents"
        )
        for t in norm.split(" ")
        if t
    }
    for r in rows:
        buckets = {
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % r["m"]
            for t in terms
        }
        assert r["v_terms"] == len(terms)
        assert r["occupied"] == len(buckets)
        assert r["colliding"] == len(terms) - len(buckets)
        expected = r["m"] * (1.0 - m.exp(len(terms) * m.log(1 - 1 / r["m"])))
        assert abs(r["expected_occupied"] - expected) < 1e-3
        # the observed occupancy should be near the birthday expectation
        assert abs(r["occupied"] - expected) <= 4 * m.sqrt(r["m"]) + 2


# ---------------------------------------------------------------------------
# x130 — log-odds discriminative terms
# ---------------------------------------------------------------------------


def test_x130_matches_python_monroe_model(spark):
    import math as m

    rows = _rows(spark, "x130_log_odds_terms")
    assert len(rows) == 60  # 3 per source
    tf, corpus, tot = {}, {}, {}
    for (src, norm) in _duck(
        r"SELECT source, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) "
        "FROM documents"
    ):
        for t in norm.split(" "):
            if t:
                tf[(src, t)] = tf.get((src, t), 0) + 1
                corpus[t] = corpus.get(t, 0) + 1
                tot[src] = tot.get(src, 0) + 1
    g = sum(corpus.values())
    a0 = 100.0
    by_src = {}
    for (src, t), y in tf.items():
        aw = a0 * corpus[t] / g
        y_rest, n, n_rest = corpus[t] - y, tot[src], g - tot[src]
        delta = m.log((y + aw) / (n + a0 - y - aw)) - m.log(
            (y_rest + aw) / (n_rest + a0 - y_rest - aw)
        )
        z = round(delta / m.sqrt(1.0 / (y + aw) + 1.0 / (y_rest + aw)), 6)
        by_src.setdefault(src, []).append((z, t, y))
    for src, scored in by_src.items():
        top = sorted(scored, key=lambda s: (-s[0], s[1]))[:3]
        got = [
            (r["z_score"], r["term"], r["term_count"])
            for r in rows
            if r["source"] == src
        ]
        assert got == top, src


# ---------------------------------------------------------------------------
# f72 — A/B readout
# ---------------------------------------------------------------------------


def test_f72_matches_python_experiment_model(spark):
    import math as m

    [row] = _rows(spark, "f72_ab_readout")
    custs = [c for (c,) in _duck("SELECT c_custkey FROM customer")]
    urgent = {
        c
        for (c,) in _duck(
            "SELECT DISTINCT o_custkey FROM orders "
            "WHERE o_orderpriority = '1-URGENT'"
        )
    }
    arms = {
        c: int(hashlib.md5(str(c).encode()).hexdigest()[:15], 16) % 2
        for c in custs
    }
    n_a = sum(1 for c in custs if arms[c] == 0)
    n_b = len(custs) - n_a
    c_a = sum(1 for c in custs if arms[c] == 0 and c in urgent)
    c_b = sum(1 for c in custs if arms[c] == 1 and c in urgent)
    assert (row["n_a"], row["n_b"], row["c_a"], row["c_b"]) == (
        n_a,
        n_b,
        c_a,
        c_b,
    )
    assert abs(row["srm_chi2"] - (n_a - n_b) ** 2 / (n_a + n_b)) < 1e-6
    # a healthy 50/50 hash split: chi2 < 10.83 (p = 0.001 threshold)
    assert row["srm_chi2"] < 10.83
    p = (c_a + c_b) / (n_a + n_b)
    z = (c_b / n_b - c_a / n_a) / m.sqrt(
        p * (1 - p) * (1 / n_a + 1 / n_b)
    )
    assert abs(row["z_stat"] - z) < 1e-5


# ---------------------------------------------------------------------------
# x131 — temperature mixture
# ---------------------------------------------------------------------------


def test_x131_quotas_sum_to_budget_and_flatten(spark):
    import math as m

    rows = _rows(spark, "x131_temperature_mixture")
    langs = dict(_duck("SELECT lang, COUNT(*) FROM documents GROUP BY lang"))
    by_tau = {}
    for r in rows:
        by_tau.setdefault(r["tau_x10"], []).append(r)
    assert set(by_tau) == {5, 10}
    for tau, rs in by_tau.items():
        assert {r["lang"] for r in rs} == set(langs)
        # exact budget conservation — the largest-remainder property
        assert sum(r["quota"] for r in rs) == 10_000
        for r in rs:
            assert r["n_docs"] == langs[r["lang"]]
            if tau == 5:
                assert r["weight"] == m.floor(
                    m.sqrt(langs[r["lang"]]) * 1e6 + 0.5
                )
            else:
                assert r["weight"] == langs[r["lang"]]
    # τ=0.5 flattens: low-resource languages gain share vs proportional
    smallest = min(langs, key=lambda l: (langs[l], l))
    q5 = {r["lang"]: r["quota"] for r in by_tau[5]}
    q10 = {r["lang"]: r["quota"] for r in by_tau[10]}
    if len(set(langs.values())) > 1:
        assert q5[smallest] >= q10[smallest]


# ---------------------------------------------------------------------------
# f73 — CUPED readout
# ---------------------------------------------------------------------------


def test_f73_matches_python_cuped_model(spark):
    [row] = _rows(spark, "f73_cuped_readout")
    per = {
        c: (0, 0)
        for (c,) in _duck("SELECT c_custkey FROM customer")
    }
    for c, x, y in _duck(
        "SELECT o_custkey, "
        "SUM(CASE WHEN o_orderdate >= DATE '1995-01-01' AND "
        "o_orderdate < DATE '1996-01-01' "
        "THEN CAST(round(o_totalprice*100) AS BIGINT) ELSE 0 END), "
        "SUM(CASE WHEN o_orderdate >= DATE '1996-01-01' AND "
        "o_orderdate < DATE '1997-01-01' "
        "THEN CAST(round(o_totalprice*100) AS BIGINT) ELSE 0 END) "
        "FROM orders GROUP BY 1"
    ):
        if c in per:
            per[c] = (int(x), int(y))
    n = len(per)
    xs = [x for x, _ in per.values()]
    ys = [y for _, y in per.values()]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in per.values())
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    cov_n = n * float(sxy) - float(sx) * sy
    varx_n = n * float(sxx) - float(sx) * sx
    vary_n = n * float(syy) - float(sy) * sy
    assert row["n_customers"] == n
    assert abs(row["theta"] - cov_n / varx_n) < 1e-5
    rho2 = (cov_n * cov_n) / (varx_n * vary_n)
    assert abs(row["rho2"] - rho2) < 1e-5
    assert 0.0 <= row["rho2"] <= 1.0
    assert abs(row["var_reduction_pct"] - 100.0 * rho2) < 1e-3


# ---------------------------------------------------------------------------
# f74 — power analysis
# ---------------------------------------------------------------------------


def test_f74_matches_python_sample_size(spark):
    import math as m

    rows = _rows(spark, "f74_power_analysis")
    assert [r["mde"] for r in rows] == [0.01, 0.02, 0.05]
    [(n_cust,)] = _duck("SELECT COUNT(*) FROM customer")
    [(n_conv,)] = _duck(
        "SELECT COUNT(*) FROM customer c WHERE EXISTS ("
        "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_orderpriority = '1-URGENT')"
    )
    z2 = (1.959963984540054 + 0.8416212335729143) ** 2
    p = n_conv / n_cust
    for r in rows:
        assert (r["n_cust"], r["n_conv"]) == (n_cust, n_conv)
        assert r["p_base"] == round(p, 6)
        assert r["n_per_arm"] == m.ceil(2.0 * z2 * p * (1 - p) / r["mde"] ** 2)
    # sizing is monotone: smaller effects need more samples
    ns = [r["n_per_arm"] for r in rows]
    assert ns[0] > ns[1] > ns[2]


# ---------------------------------------------------------------------------
# j8 — bitwise battery
# ---------------------------------------------------------------------------


def test_j8_matches_python_bit_model(spark):
    rows = _rows(spark, "j8_bitwise_suite")
    keys = sorted(
        c for (c,) in _duck("SELECT c_custkey FROM customer WHERE c_custkey < 80")
    )
    assert [r["c_custkey"] for r in rows] == keys
    import functools
    import operator

    flags = [k % 256 for k in keys]
    agg_or = functools.reduce(operator.or_, flags)
    agg_and = functools.reduce(operator.and_, [f | 16 for f in flags])
    agg_xor = functools.reduce(operator.xor, flags)
    for r, k in zip(rows, keys):
        f = k % 256
        assert r["low_nibble"] == f & 15
        assert r["with_msb"] == f | 128
        assert r["inverted_byte"] == f ^ 255
        assert r["doubled"] == f << 1
        assert r["quartered"] == f >> 2
        assert r["popcount"] == bin(f).count("1")
        assert r["is_odd"] == bool(f & 1)
        assert (r["agg_or"], r["agg_and"], r["agg_xor"]) == (
            agg_or,
            agg_and,
            agg_xor,
        )


# ---------------------------------------------------------------------------
# g25 — event trigrams
# ---------------------------------------------------------------------------


def test_g25_matches_python_sequence_model(spark):
    rows = _rows(spark, "g25_event_trigrams")
    data = _duck("SELECT user_id, ts, event_id, event_type FROM events")
    per = {}
    for uid, ts, eid, et in data:
        per.setdefault(uid, []).append((ts, eid, et))
    from collections import Counter

    occ, users = Counter(), {}
    for uid, evs in per.items():
        evs.sort()
        ets = [et for _, _, et in evs]
        for a, b, c in zip(ets, ets[1:], ets[2:]):
            occ[(a, b, c)] += 1
            users.setdefault((a, b, c), set()).add(uid)
    top = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [
        ((r["e1"], r["e2"], r["e3"]), r["n_occurrences"]) for r in rows
    ] == top
    for r in rows:
        assert r["n_users"] == len(users[(r["e1"], r["e2"], r["e3"])])


# ---------------------------------------------------------------------------
# r9 — quarterly review
# ---------------------------------------------------------------------------


def test_r9_matches_duck_rollup(spark):
    rows = {r["yq"]: r for r in _rows(spark, "r9_quarterly_review")}
    want = {
        yq: (n, nc, float(rev), urg)
        for yq, n, nc, rev, urg in _duck(
            "SELECT year(o_orderdate) * 10 + quarter(o_orderdate), COUNT(*), "
            "COUNT(DISTINCT o_custkey), "
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)), "
            "ROUND(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 "
            "ELSE 0 END) * 1.0 / COUNT(*), 6) FROM orders GROUP BY 1"
        )
    }
    assert set(rows) == set(want)
    for yq, r in rows.items():
        n, nc, rev, urg = want[yq]
        assert (r["n_orders"], r["n_customers"]) == (n, nc)
        assert r["revenue"] == rev
        assert abs(r["avg_order_value"] - rev / n) < 1e-6
        assert abs(r["urgent_share"] - float(urg)) < 1e-9
        assert 0.0 <= r["urgent_share"] <= 1.0


# ---------------------------------------------------------------------------
# m16 — partition gaps
# ---------------------------------------------------------------------------


def test_m16_matches_python_gap_model(spark):
    rows = {r["event_type"]: r for r in _rows(spark, "m16_partition_gaps")}
    act = _duck(
        "SELECT DISTINCT event_type, "
        "date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) FROM events"
    )
    per = {}
    for et, d in act:
        per.setdefault(et, set()).add(d)
    lo = min(min(s) for s in per.values())
    hi = max(max(s) for s in per.values())
    assert set(rows) == set(per)
    for et, present in per.items():
        r = rows[et]
        missing = sorted(set(range(lo, hi + 1)) - present)
        assert r["expected_days"] == hi - lo + 1
        assert r["present_days"] == len(present)
        assert r["missing_days"] == len(missing)
        if missing:
            assert r["first_gap_day"] == missing[0]
            assert r["last_gap_day"] == missing[-1]
        else:
            assert r["first_gap_day"] == -1 and r["last_gap_day"] == -1
        # internal consistency
        assert r["present_days"] + r["missing_days"] == r["expected_days"]


# ---------------------------------------------------------------------------
# x132 — source data card
# ---------------------------------------------------------------------------


def test_x132_consistent_with_component_queries(spark):
    import math as m

    rows = {r["source"]: r for r in _rows(spark, "x132_source_data_card")}
    assert len(rows) == 20
    counts = dict(_duck("SELECT source, COUNT(*) FROM documents GROUP BY 1"))
    langs = {}
    for src, lang, c in _duck(
        "SELECT source, lang, COUNT(*) FROM documents GROUP BY 1, 2"
    ):
        langs.setdefault(src, {})[lang] = c
    # pass-all retention must aggregate to x70's corpus-wide number
    [x70] = _rows(spark, "x70_gopher_quality_gate")
    total_pass = sum(
        round(r["gopher_retention"] * counts[s])
        for s, r in rows.items()
    )
    assert total_pass == x70["n_pass_all"]
    for src, r in rows.items():
        assert r["n_docs"] == counts[src]
        assert r["n_langs"] == len(langs[src])
        assert 0.0 <= r["dup_rate"] < 1.0
        assert r["uniq_fp"] <= r["n_docs"]
        n = counts[src]
        h = -sum(c * m.log(c / n) for c in langs[src].values()) / n
        assert abs(r["lang_entropy_nats"] - h) < 1e-4
        assert 0.0 <= r["gopher_retention"] <= 1.0


# ---------------------------------------------------------------------------
# f75 / f76 / g26
# ---------------------------------------------------------------------------


def test_f75_matches_python_gof(spark):
    [row] = _rows(spark, "f75_dow_uniformity")
    days = dict(
        _duck("SELECT dayofweek(o_orderdate), COUNT(*) FROM orders GROUP BY 1")
    )
    n = sum(days.values())
    chi2 = sum((o - n / 7) ** 2 / (n / 7) for o in days.values())
    # pad absent weekdays as zero-count cells
    chi2 += (7 - len(days)) * (n / 7)
    assert row["n_orders"] == n
    assert row["n_days_present"] == len(days)
    assert row["min_day"] == min(days.values())
    assert row["max_day"] == max(days.values())
    assert abs(row["chi2_stat"] - chi2) < 1e-4
    assert row["df"] == 6


def test_f76_matches_python_hhi(spark):
    [row] = _rows(spark, "f76_hhi_concentration")
    cents = [
        c
        for (_, c) in _duck(
            "SELECT c.c_nationkey, "
            "SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) "
            "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
            "GROUP BY 1"
        )
    ]
    tot = sum(cents)
    hhi = sum(c * c for c in cents) / (tot * tot)
    assert row["n_nations"] == len(cents)
    assert row["total_cents"] == tot
    assert abs(row["hhi"] - hhi) < 1e-6
    assert abs(row["hhi_bps"] - round(10000 * hhi, 2)) < 0.02
    assert abs(row["effective_n"] - 1 / hhi) < 1e-3
    # concentration bounds: 1/k <= HHI <= 1
    assert 1 / len(cents) - 1e-9 <= row["hhi"] <= 1.0


def test_g26_matches_python_latency_model(spark):
    rows = {r["hours_bucket"]: r["n_users"] for r in _rows(spark, "g26_time_to_first_purchase")}
    data = _duck("SELECT user_id, event_type, epoch_us(ts) FROM events")
    s_us, p_us = {}, {}
    for uid, et, us in data:
        if et == "signup":
            s_us[uid] = min(s_us.get(uid, us), us)
        elif et == "purchase":
            p_us[uid] = min(p_us.get(uid, us), us)
    from collections import Counter

    model = Counter()
    for uid, s in s_us.items():
        p = p_us.get(uid)
        if p is not None and p >= s:
            model[(p - s) // 3600000000] += 1
        else:
            model[-1] += 1
    assert rows == dict(model)
    # conservation: every signed-up user appears exactly once
    assert sum(rows.values()) == len(s_us)


# ---------------------------------------------------------------------------
# f77 / m17
# ---------------------------------------------------------------------------


def test_f77_matches_python_negbin_model(spark):
    import math as m

    rows = _rows(spark, "f77_negbin_fit")
    assert len(rows) == 5
    data = _duck("SELECT user_id, event_type FROM events")
    users = {u for u, _ in data}
    from collections import Counter

    per = Counter(data)
    for r in rows:
        cs = [per.get((u, r["event_type"]), 0) for u in users]
        n, sc = len(cs), sum(cs)
        scc = sum(c * c for c in cs)
        mean = sc / n
        var = (n * scc - sc * sc) / (n * (n - 1))
        assert abs(r["mean_c"] - mean) < 1e-6
        assert abs(r["var_c"] - var) < 1e-6
        assert r["zero_frac_obs"] == round(
            sum(1 for c in cs if c == 0) / n, 6
        )
        if var > mean:
            r_mm = mean * mean / (var - mean)
            assert abs(r["r_hat"] - r_mm) < 1e-5
            assert abs(r["p_hat"] - mean / var) < 1e-6
            fit = m.exp(r_mm * (m.floor(m.log(mean / var) * 1e6 + 0.5) / 1e6))
            assert abs(r["zero_frac_fit"] - fit) < 1e-5
            assert 0.0 <= r["zero_frac_fit"] <= 1.0
        else:
            assert r["r_hat"] == -1 and r["p_hat"] == -1


def test_m17_all_expectations_pass_and_count(spark):
    rows = {r["check_name"]: r for r in _rows(spark, "m17_expectation_battery")}
    assert len(rows) == 9
    [(n_orders,)] = _duck("SELECT COUNT(*) FROM orders")
    [(n_lineitem,)] = _duck("SELECT COUNT(*) FROM lineitem")
    assert rows["orders_price_positive"]["n_checked"] == n_orders
    assert rows["lineitem_quantity_domain"]["n_checked"] == n_lineitem
    # the synthetic feed satisfies every declared invariant
    for name, r in rows.items():
        assert r["n_violations"] == 0 and r["passed"] is True, name


# ---------------------------------------------------------------------------
# g27 — ship latency percentiles
# ---------------------------------------------------------------------------


def test_g27_matches_python_exact_percentiles(spark):
    import math as m

    rows = _rows(spark, "g27_ship_latency_percentiles")
    assert len(rows) == 15  # 5 priorities x 3 quantiles
    data = _duck(
        "SELECT o.o_orderpriority, date_diff('day', CAST(o.o_orderdate AS "
        "DATE), CAST(l.l_shipdate AS DATE)) FROM lineitem l JOIN orders o "
        "ON o.o_orderkey = l.l_orderkey"
    )
    per = {}
    for pr, d in data:
        per.setdefault(pr, []).append(d)
    for r in rows:
        lats = sorted(per[r["priority"]])
        n = len(lats)
        assert r["n_lines"] == n
        target = m.ceil(r["q"] * n / 100)
        assert r["latency_days"] == lats[target - 1], (r["priority"], r["q"])
        assert r["latency_days"] >= 0


# ---------------------------------------------------------------------------
# f78 — Wilcoxon signed-rank
# ---------------------------------------------------------------------------


def test_f78_matches_python_paired_rank_model(spark):
    import math as m

    [row] = _rows(spark, "f78_wilcoxon_signed_rank")
    per = {c: [0, 0] for (c,) in _duck("SELECT c_custkey FROM customer")}
    for c, x, y in _duck(
        "SELECT o_custkey, "
        "SUM(CASE WHEN o_orderdate >= DATE '1995-01-01' AND o_orderdate < "
        "DATE '1996-01-01' THEN CAST(round(o_totalprice*100) AS BIGINT) "
        "ELSE 0 END), "
        "SUM(CASE WHEN o_orderdate >= DATE '1996-01-01' AND o_orderdate < "
        "DATE '1997-01-01' THEN CAST(round(o_totalprice*100) AS BIGINT) "
        "ELSE 0 END) FROM orders GROUP BY 1"
    ):
        if c in per:
            per[c] = [int(x), int(y)]
    diffs = [y - x for x, y in per.values() if y != x]
    n = len(diffs)
    assert row["n_pairs"] == n
    # mid-ranks of |d| (doubled to stay integral)
    from collections import Counter

    vt = Counter(abs(d) for d in diffs)
    cum, mr2 = 0, {}
    for v in sorted(vt):
        mr2[v] = 2 * cum + vt[v] + 1
        cum += vt[v]
    w2p = sum(mr2[abs(d)] for d in diffs if d > 0)
    assert row["w2_plus"] == w2p
    t3 = sum(t**3 - t for t in vt.values())
    assert row["tie_cubes"] == t3
    z = (w2p / 2 - n * (n + 1) / 4) / m.sqrt(
        n * (n + 1) * (2 * n + 1) / 24 - t3 / 48
    )
    assert abs(row["z_stat"] - z) < 1e-5


# ---------------------------------------------------------------------------
# x133 — cross-source duplicate census
# ---------------------------------------------------------------------------


def test_x133_matches_python_fingerprint_model(spark):
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in _rows(spark, "x133_cross_source_dups")
    }
    assert len(rows) == 190
    fps = {}
    for src, fp, n in _duck(
        r"SELECT source, md5(lower(regexp_replace(trim(text), '\s+', ' ',"
        r" 'g'))), COUNT(*) FROM documents GROUP BY 1, 2"
    ):
        fps.setdefault(fp, {})[src] = n
    from collections import Counter

    shared, da, db = Counter(), Counter(), Counter()
    for fp, srcs in fps.items():
        ss = sorted(srcs)
        for i, s1 in enumerate(ss):
            for s2 in ss[i + 1:]:
                shared[(s1, s2)] += 1
                da[(s1, s2)] += srcs[s1]
                db[(s1, s2)] += srcs[s2]
    for pair, r in rows.items():
        assert r["shared_fingerprints"] == shared.get(pair, 0), pair
        assert r["docs_in_a"] == da.get(pair, 0)
        assert r["docs_in_b"] == db.get(pair, 0)


# ---------------------------------------------------------------------------
# e21 — null-safe join semantics
# ---------------------------------------------------------------------------


def test_e21_null_semantics_identities(spark):
    rows = {r["join_kind"]: r for r in _rows(spark, "e21_null_safe_join")}
    assert set(rows) == {"coalesce_bridge", "null_safe_eq", "standard_eq"}
    # null-safe equality and the COALESCE bridge are the same relation
    assert (
        rows["null_safe_eq"]["n_key_pairs"]
        == rows["coalesce_bridge"]["n_key_pairs"]
    )
    assert (
        rows["null_safe_eq"]["n_row_pairs"]
        == rows["coalesce_bridge"]["n_row_pairs"]
    )
    # standard equality drops exactly the NULL bucket (both sides have
    # one: nationkeys divisible by 5 exist in customer and supplier)
    assert (
        rows["standard_eq"]["n_key_pairs"]
        == rows["null_safe_eq"]["n_key_pairs"] - 1
    )
    [(n_c,)] = _duck(
        "SELECT COUNT(*) FROM customer WHERE c_nationkey % 5 = 0"
    )
    n_s = _duck(
        "SELECT COUNT(*) FROM read_parquet("
        f"'{SF}/supplier.parquet') WHERE s_nationkey % 5 = 0"
    )[0][0]
    assert (
        rows["null_safe_eq"]["n_row_pairs"]
        - rows["standard_eq"]["n_row_pairs"]
        == n_c * n_s
    )


# ---------------------------------------------------------------------------
# x134 / x135
# ---------------------------------------------------------------------------


def test_x134_matches_python_weight_model(spark):
    import math as m

    rows = _rows(spark, "x134_class_balance_weights")
    con = duckdb.connect()
    counts = dict(
        con.execute(
            f"SELECT CAST(label AS INT), COUNT(*) FROM "
            f"read_parquet('{SF}/embeddings.parquet') GROUP BY 1"
        ).fetchall()
    )
    n, k = sum(counts.values()), len(counts)
    beta = 0.999
    raw = {
        lbl: (1 - beta) / (1 - m.exp(c * m.log(beta)))
        for lbl, c in counts.items()
    }
    sum_eff = sum(raw.values())
    assert len(rows) == k
    for r in rows:
        c = counts[r["label"]]
        assert r["n_c"] == c
        assert abs(r["w_inv_freq"] - n / (k * c)) < 1e-6
        assert abs(r["w_eff_num"] - raw[r["label"]] * k / sum_eff) < 1e-5
    # normalization contracts: inverse-frequency is mean-1 over SAMPLES
    # (sum of n_c * w = n), effective-number is mean-1 over CLASSES
    assert abs(sum(counts[r["label"]] * r["w_inv_freq"] for r in rows) / n - 1.0) < 1e-4
    assert abs(sum(r["w_eff_num"] for r in rows) / k - 1.0) < 1e-4


def test_x135_matches_python_truncation_model(spark):
    rows = _rows(spark, "x135_truncation_loss")
    assert [r["lim"] for r in rows] == [64, 128, 256, 512]
    import re

    lens = [
        len(re.split(r"\s+", t.strip())) if t.strip() else 0
        for (t,) in _duck("SELECT text FROM documents")
    ]
    total = sum(lens)
    for r in rows:
        lim = r["lim"]
        lost = sum(max(0, n - lim) for n in lens)
        assert r["n_docs"] == len(lens)
        assert r["docs_truncated"] == sum(1 for n in lens if n > lim)
        assert r["tokens_lost"] == lost
        assert r["loss_share"] == round(lost / total, 6)
        assert abs(r["retained_share"] - (1 - lost / total)) < 2e-6
    # monotone: a larger window never loses more
    losses = [r["tokens_lost"] for r in rows]
    assert losses == sorted(losses, reverse=True)


# ---------------------------------------------------------------------------
# x136 — class centroid influence
# ---------------------------------------------------------------------------


def test_x136_matches_python_loo_model(spark):
    import math as m

    rows = _rows(spark, "x136_class_centroid_influence")
    con = duckdb.connect()
    vecs = con.execute(
        f"SELECT CAST(label AS INT), embedding FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    dims = len(vecs[0][1])
    per = {}
    for lbl, emb in vecs:
        q = [m.floor(float(x) * (1 << 20)) for x in emb]
        st = per.setdefault(lbl, [0] * dims + [0])
        for j in range(dims):
            st[j] += q[j]
        st[dims] += 1
    g = [sum(per[l][j] for l in per) for j in range(dims)]
    n = sum(per[l][dims] for l in per)
    model = {}
    for lbl, st in per.items():
        tot = 0
        for j in range(dims):
            gc = g[j] / n
            loo = (g[j] - st[j]) / (n - st[dims])
            tot += m.floor((gc - loo) * (gc - loo) * 1e6 + 0.5)
        model[lbl] = (st[dims], tot)
    assert len(rows) == len(model)
    for r in rows:
        n_l, tot = model[r["label"]]
        assert r["n_vecs"] == n_l
        assert r["shift2_micro"] == tot
        assert abs(r["shift_q"] - round(m.sqrt(tot / 1e6), 6)) < 1e-9
    # sorted by exact integer influence, descending
    vals = [r["shift2_micro"] for r in rows]
    assert vals == sorted(vals, reverse=True)


# ---------------------------------------------------------------------------
# f79 — McNemar
# ---------------------------------------------------------------------------


def test_f79_cells_conserve_and_chi2(spark):
    [row] = _rows(spark, "f79_mcnemar_test")
    [(n_docs,)] = _duck("SELECT COUNT(*) FROM documents")
    cells = (
        row["both_right"],
        row["full_only_right"],
        row["half_only_right"],
        row["both_wrong"],
    )
    assert sum(cells) == n_docs
    b, c = row["full_only_right"], row["half_only_right"]
    if b + c > 0:
        assert row["mcnemar_chi2"] == round((b - c) ** 2 / (b + c), 6)
        assert row["mcnemar_chi2_cc"] == round(
            (abs(b - c) - 1) ** 2 / (b + c), 6
        )
    # the full 8-stopword model must dominate its 4-stopword ablation
    # in paired wins (more stopwords can only add evidence here)
    assert b >= c
    # full-model accuracy from the cells equals f69's observed agreement
    [(k_docs, n_agree, *_rest)] = [
        (r["n_docs"], r["n_agree"]) for r in _rows(spark, "f69_cohen_kappa")
    ]
    assert row["both_right"] + row["full_only_right"] == n_agree


# ---------------------------------------------------------------------------
# g28 — max drawdown
# ---------------------------------------------------------------------------


def test_g28_matches_python_drawdown_model(spark):
    [row] = _rows(spark, "g28_max_drawdown")
    daily = dict(
        _duck(
            "SELECT date_diff('day', DATE '1995-01-01', o_orderdate), "
            "CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) "
            "AS DECIMAL(38,2)), 0) AS BIGINT) FROM orders GROUP BY 1"
        )
    )
    nd, t = len(daily), sum(daily.values())
    cum, runmax, best = 0, None, None
    for d in sorted(daily):
        cum += daily[d] * nd - t
        runmax = cum if runmax is None else max(runmax, cum)
        depth = runmax - cum
        if best is None or depth > best[0]:
            best = (depth, d)
    depth, trough = best
    assert row["n_days"] == nd
    assert row["depth_scaled"] == depth
    assert row["trough_day"] == trough
    assert abs(row["depth_dollars"] - round(depth / nd, 4)) < 1e-9
    assert depth >= 0


# ---------------------------------------------------------------------------
# f80 — partial correlation
# ---------------------------------------------------------------------------


def test_f80_matches_python_partial_corr(spark):
    import math as m

    [row] = _rows(spark, "f80_partial_correlation")
    data = _duck(
        "SELECT CAST(l_quantity AS BIGINT), "
        "CAST(round(l_extendedprice*100) AS BIGINT), "
        "CAST(round(l_discount*10000) AS BIGINT) FROM lineitem"
    )
    n = len(data)
    assert row["n_lines"] == n

    def pearson(ai, bi):
        sa = sum(r[ai] for r in data)
        sb = sum(r[bi] for r in data)
        sab = sum(r[ai] * r[bi] for r in data)
        saa = sum(r[ai] * r[ai] for r in data)
        sbb = sum(r[bi] * r[bi] for r in data)
        return (n * sab - sa * sb) / m.sqrt(
            (n * saa - sa * sa) * (n * sbb - sb * sb)
        )

    r_xy, r_xz, r_yz = pearson(0, 1), pearson(0, 2), pearson(1, 2)
    assert abs(row["r_xy"] - r_xy) < 1e-5
    assert abs(row["r_xz"] - r_xz) < 1e-5
    assert abs(row["r_yz"] - r_yz) < 1e-5
    part = (r_xy - r_xz * r_yz) / m.sqrt(
        (1 - r_xz**2) * (1 - r_yz**2)
    )
    assert abs(row["r_xy_given_z"] - part) < 1e-5
    # the synthetic generator draws price independent of quantity, so
    # only the correlation-coefficient bounds are data-independent
    for col in ("r_xy", "r_xz", "r_yz", "r_xy_given_z"):
        assert -1.0 <= row[col] <= 1.0


# ---------------------------------------------------------------------------
# g29 — anomaly days
# ---------------------------------------------------------------------------


def test_g29_matches_python_control_chart(spark):
    rows = {r["d"]: r for r in _rows(spark, "g29_anomaly_days")}
    daily = dict(
        _duck(
            "SELECT date_diff('day', DATE '1995-01-01', o_orderdate), "
            "CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) "
            "AS DECIMAL(38,2)), 0) AS BIGINT) FROM orders GROUP BY 1"
        )
    )
    days = sorted(daily)
    flagged = {}
    for i, d in enumerate(days):
        win = [daily[days[j]] for j in range(max(0, i - 7), i)]
        n = len(win)
        if n < 5:
            continue
        sy, syy = sum(win), sum(v * v for v in win)
        y = daily[d]
        dev = n * y - sy
        if (n - 1) * dev * dev > 4 * n * (n * syy - sy * sy):
            flagged[d] = dev
    assert set(rows) == set(flagged)
    for d, r in rows.items():
        assert r["dev_scaled"] == flagged[d]
        assert r["lhs"] > r["rhs"]  # the flag condition, restated


# ---------------------------------------------------------------------------
# f81 — effect sizes
# ---------------------------------------------------------------------------


def test_f81_matches_python_effect_model(spark):
    import math as m

    [row] = _rows(spark, "f81_effect_sizes")
    data = _duck(
        "SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END, "
        "CAST(round(o_totalprice*100) AS BIGINT) FROM orders"
    )
    g1 = [c for g, c in data if g == 1]
    g0 = [c for g, c in data if g == 0]
    n1, n0 = len(g1), len(g0)
    assert (row["n_urgent"], row["n_other"]) == (n1, n0)
    mean_diff = sum(g1) / n1 - sum(g0) / n0
    ss1 = sum(c * c for c in g1) - sum(g1) ** 2 / n1
    ss0 = sum(c * c for c in g0) - sum(g0) ** 2 / n0
    sp = m.sqrt((ss1 + ss0) / (n1 + n0 - 2))
    d = mean_diff / sp
    assert abs(row["mean_diff_dollars"] - mean_diff / 100) < 1e-2
    assert abs(row["pooled_sd_dollars"] - sp / 100) < 1e-2
    assert abs(row["cohens_d"] - d) < 1e-5
    j = 1 - 3 / (4 * (n1 + n0 - 2) - 1)
    assert abs(row["hedges_g"] - d * j) < 1e-5
    # the correction always shrinks |d|, and vanishes as df grows
    assert abs(row["hedges_g"]) <= abs(row["cohens_d"]) + 1e-12


# ---------------------------------------------------------------------------
# x137 — winnowing
# ---------------------------------------------------------------------------


def test_x137_matches_python_winnowing_model(spark):
    rows = {r["source"]: r for r in _rows(spark, "x137_winnowing")}
    docs = _duck(
        r"SELECT source, doc_id, lower(regexp_replace(trim(text), '\s+',"
        r" ' ', 'g')) FROM documents"
    )
    K, W, C, HMOD = 5, 4, 2_000_000, 1 << 40
    from collections import defaultdict

    totals = defaultdict(int)
    sel_count = defaultdict(int)
    sel_hashes = defaultdict(set)
    for src, doc_id, norm in docs:
        ws = norm.split(" ")
        if len(ws) < K:
            continue
        grams = [
            " ".join(ws[i:i + K]) for i in range(len(ws) - K + 1)
        ]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % HMOD
            for g in grams
        ]
        n = len(hs)
        totals[src] += n
        keys = [hs[i] * C - (i + 1) for i in range(n)]
        chosen = set()
        for a in range(0, n - W + 1):
            m = min(keys[a:a + W])
            chosen.add((-m) % C)  # position of the window min
        sel_count[src] += len(chosen)
        for pos in chosen:
            sel_hashes[src].add(hs[pos - 1])
    for src, r in rows.items():
        assert r["total_grams"] == totals[src]
        assert r["selected"] == sel_count[src], src
        assert r["distinct_digests"] == len(sel_hashes[src])
        # density near the 2/(w+1) theory
        assert abs(r["density"] - r["density_theory"]) < 0.08
        # guaranteed coverage: every window has at least one selection,
        # so density can never fall below 1/w
        assert r["density"] >= 1.0 / W - 1e-9


# ---------------------------------------------------------------------------
# x138 — rule ablation
# ---------------------------------------------------------------------------


def test_x138_consistent_with_x70(spark):
    rows = {r["rule"]: r for r in _rows(spark, "x138_rule_ablation")}
    [x70] = _rows(spark, "x70_gopher_quality_gate")
    n_docs = x70["n_docs"]
    assert len(rows) == 5
    for rule, r in rows.items():
        # per-rule fail counts must equal x70's own columns
        assert r["n_fail"] == x70[rule], rule
        assert 0 <= r["unique_kills"] <= r["n_fail"]
        # removing a rule can only increase retention, by exactly the
        # share of its unique kills
        assert r["retention"] == round(x70["n_pass_all"] / n_docs, 6)
        assert (
            abs(
                r["retention_without_rule"]
                - (x70["n_pass_all"] + r["unique_kills"]) / n_docs
            )
            < 2e-6
        )
        assert abs(
            r["reclaim_share"] - r["unique_kills"] / n_docs
        ) < 2e-6


# ---------------------------------------------------------------------------
# f82 — Welch's t
# ---------------------------------------------------------------------------


def test_f82_matches_python_welch_model(spark):
    import math as m

    [row] = _rows(spark, "f82_welch_t")
    data = _duck(
        "SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END, "
        "CAST(round(o_totalprice*100) AS BIGINT) FROM orders"
    )
    g1 = [c for g, c in data if g == 1]
    g0 = [c for g, c in data if g == 0]
    n1, n0 = len(g1), len(g0)
    assert (row["n_urgent"], row["n_other"]) == (n1, n0)

    def var_over_n(xs):
        n = len(xs)
        s = sum(xs)
        ss = sum(x * x for x in xs)
        return ((ss - s * s / n) / (n - 1)) / n

    v1, v0 = var_over_n(g1), var_over_n(g0)
    mean_diff = sum(g1) / n1 - sum(g0) / n0
    t = mean_diff / m.sqrt(v1 + v0)
    df = (v1 + v0) ** 2 / (v1**2 / (n1 - 1) + v0**2 / (n0 - 1))
    assert abs(row["welch_t"] - t) < 1e-5
    assert abs(row["df_ws"] - df) < 1e-2
    # Welch df is bounded by min(n)-1 below and n1+n0-2 above
    assert min(n1, n0) - 1 <= row["df_ws"] <= n1 + n0 - 2


# ---------------------------------------------------------------------------
# m18 — double-fire audit
# ---------------------------------------------------------------------------


def test_m18_matches_python_retry_model(spark):
    rows = {r["event_type"]: r for r in _rows(spark, "m18_double_fire_audit")}
    data = _duck(
        "SELECT user_id, event_type, event_id, epoch_us(ts), "
        "CAST(round(value*100) AS BIGINT) FROM events"
    )
    per = {}
    for uid, et, eid, us, c in data:
        per.setdefault((uid, et), []).append((us, eid, c))
    from collections import Counter

    gaps, suspects = Counter(), Counter()
    for (uid, et), evs in per.items():
        evs.sort()
        for (u1, _, c1), (u2, _, c2) in zip(evs, evs[1:]):
            gaps[et] += 1
            if u2 - u1 < 1_000_000 and c1 == c2:
                suspects[et] += 1
    assert set(rows) == set(gaps)
    for et, r in rows.items():
        assert r["n_gaps"] == gaps[et]
        assert r["n_suspect"] == suspects[et]
        assert r["suspect_share"] == round(suspects[et] / gaps[et], 6)


# ---------------------------------------------------------------------------
# g30 — circular time statistics
# ---------------------------------------------------------------------------


def test_g30_matches_python_circular_model(spark):
    import math as m

    rows = {r["event_type"]: r for r in _rows(spark, "g30_circular_time_stats")}
    data = _duck("SELECT event_type, epoch_us(ts) FROM events")
    per = {}
    for et, us in data:
        th = 2 * m.pi * (us % 86400000000) / 86400000000.0
        c = m.floor(m.cos(th) * 1e6 + 0.5)
        s_ = m.floor(m.sin(th) * 1e6 + 0.5)
        sc, ss, n = per.get(et, (0, 0, 0))
        per[et] = (sc + c, ss + s_, n + 1)
    assert set(rows) == set(per)
    for et, (sc, ss, n) in per.items():
        r = rows[et]
        assert r["n_events"] == n
        rbar = m.sqrt(float(sc) * sc + float(ss) * ss) / (1e6 * n)
        assert abs(r["resultant_r"] - rbar) < 1e-6
        hour = (m.atan2(float(ss), float(sc)) / (2 * m.pi) * 24 + 24) % 24
        assert abs(r["mean_hour"] - hour) < 1e-3
        assert 0.0 <= r["resultant_r"] <= 1.0
        assert 0.0 <= r["mean_hour"] < 24.0


# ---------------------------------------------------------------------------
# d13 — rank semantics
# ---------------------------------------------------------------------------


def test_d13_tie_semantics_identities(spark):
    rows = {r["prio"]: r for r in _rows(spark, "d13_rank_semantics")}
    counts = {}
    for prio, q in _duck(
        "SELECT o_orderpriority, CAST(round(o_totalprice) AS BIGINT) % 100 "
        "FROM orders"
    ):
        counts.setdefault(prio, {}).setdefault(q, 0)
        counts[prio][q] += 1
    assert set(rows) == set(counts)
    for prio, r in rows.items():
        n = sum(counts[prio].values())
        distinct = len(counts[prio])
        last_tie = max(counts[prio])  # group of the largest key value
        assert r["n_rows"] == n
        # row_number is a total order: max == n; rank's max is the
        # start of the LAST tie group; dense_rank's max counts groups
        assert r["max_row_number"] == n
        assert r["max_rank"] == n - counts[prio][last_tie] + 1
        assert r["distinct_values"] == distinct
        assert r["n_tiles"] == 4
        # percent_rank max = (max_rank - 1) / (n - 1)
        assert r["max_percent_rank"] == round(
            (n - counts[prio][last_tie]) / (n - 1), 6
        )


# ---------------------------------------------------------------------------
# f83 / g31
# ---------------------------------------------------------------------------


def test_f83_matches_python_sign_model(spark):
    import math as m

    [row] = _rows(spark, "f83_sign_test")
    per = {c: [0, 0] for (c,) in _duck("SELECT c_custkey FROM customer")}
    for c, x, y in _duck(
        "SELECT o_custkey, "
        "SUM(CASE WHEN o_orderdate >= DATE '1995-01-01' AND o_orderdate < "
        "DATE '1996-01-01' THEN CAST(round(o_totalprice*100) AS BIGINT) "
        "ELSE 0 END), "
        "SUM(CASE WHEN o_orderdate >= DATE '1996-01-01' AND o_orderdate < "
        "DATE '1997-01-01' THEN CAST(round(o_totalprice*100) AS BIGINT) "
        "ELSE 0 END) FROM orders GROUP BY 1"
    ):
        if c in per:
            per[c] = [int(x), int(y)]
    pos = sum(1 for x, y in per.values() if y > x)
    neg = sum(1 for x, y in per.values() if y < x)
    tie = sum(1 for x, y in per.values() if y == x)
    assert (row["n_pos"], row["n_neg"], row["n_tie"]) == (pos, neg, tie)
    assert abs(row["z_stat"] - (pos - neg) / m.sqrt(pos + neg)) < 1e-5
    assert pos + neg + tie == len(per)


def test_g31_matches_python_lift_model(spark):
    [row] = _rows(spark, "g31_weekend_lift")
    daily = {}
    for day, dow, rev, n in _duck(
        "SELECT o_orderdate, dayofweek(o_orderdate), "
        "CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) "
        "AS DECIMAL(38,2)), 0) AS BIGINT), COUNT(*) FROM orders GROUP BY 1, 2"
    ):
        daily[day] = (dow in (0, 6), int(rev), n)
    we = [(r, n) for is_w, r, n in daily.values() if is_w]
    wd = [(r, n) for is_w, r, n in daily.values() if not is_w]
    assert row["weekend_days"] == len(we)
    assert row["weekday_days"] == len(wd)
    assert row["weekend_orders"] == sum(n for _, n in we)
    assert row["weekday_orders"] == sum(n for _, n in wd)
    we_rev = sum(r for r, _ in we) / len(we)
    wd_rev = sum(r for r, _ in wd) / len(wd)
    assert abs(row["weekend_daily_rev"] - we_rev) < 1e-2
    assert abs(row["weekday_daily_rev"] - wd_rev) < 1e-2
    assert abs(row["lift"] - we_rev / wd_rev) < 1e-5
    # the 2:5 day ratio is roughly reflected in order volume
    assert row["weekend_days"] + row["weekday_days"] == len(daily)
