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
