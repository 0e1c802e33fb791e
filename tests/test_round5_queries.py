"""Model checks for the round-5 additions.

The DuckDB oracles prove cross-engine agreement; these prove the MATH
— each operator re-derived with a naive single-node Python model on
the sf0.001 tables, plus the closed-form invariants each estimator
must satisfy (index-number bounds, estimator inequalities, union
bounds).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

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


def _round_half_up(x: float) -> int:
    # F.round / DuckDB ROUND semantics for positive operands
    return math.floor(x + 0.5)


# --- f56 Nelson-Aalen ------------------------------------------------------


def _tenure_model():
    rows = _duck(
        "SELECT o_custkey, date_diff('day', MIN(o_orderdate),"
        " MAX(o_orderdate)),"
        " CASE WHEN MAX(o_orderdate) < DATE '2001-02-01' THEN 1 ELSE 0 END"
        " FROM orders GROUP BY 1"
    )
    return [(t, c) for _, t, c in rows]


def test_f56_matches_python_model(spark):
    subj = _tenure_model()
    d = Counter(t for t, c in subj if c)
    h_nano = 0
    expect = []
    for t in sorted(d):
        n = sum(1 for tt, _ in subj if tt >= t)
        h_nano += _round_half_up(d[t] / n * 1e9)
        expect.append((t, d[t], n, h_nano / 1e9))
    got = [
        (r.tenure_days, r.n_events, r.n_at_risk, r.cum_hazard)
        for r in _rows(spark, "f56_nelson_aalen")
    ]
    assert got == expect


def test_f56_dominates_kaplan_meier(spark):
    """exp(-H_NA) >= S_KM pointwise (1-x <= e^-x per factor) — the
    classic estimator inequality ties the two survival queries
    together; equality only in the no-event limit."""
    na = {r.tenure_days: r.fh_survival for r in _rows(spark, "f56_nelson_aalen")}
    km = {r.tenure_days: r.survival for r in _rows(spark, "f39_kaplan_meier")}
    assert set(na) == set(km)
    for t in na:
        assert na[t] >= km[t] - 1e-9, (t, na[t], km[t])
    assert all(v >= 0 for v in na.values())


def test_f56_hazard_monotone(spark):
    rows = sorted(_rows(spark, "f56_nelson_aalen"), key=lambda r: r.tenure_days)
    for a, b in zip(rows, rows[1:]):
        assert b.cum_hazard >= a.cum_hazard
        assert b.hazard_var >= a.hazard_var


# --- f55 Fisher price index ------------------------------------------------


def _price_model():
    rows = _duck(
        "SELECT CAST(year(l_shipdate) AS BIGINT), l_partkey,"
        " CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE),"
        " CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)"
        " FROM lineitem GROUP BY 1, 2"
    )
    return {
        (y, p): (_round_half_up(s / q * 1e4), q) for y, p, s, q in rows
    }


def test_f55_matches_python_model(spark):
    py = _price_model()
    base = {p: v for (y, p), v in py.items() if y == 1996}
    expect = {}
    for y in sorted({y for y, _ in py}):
        nl = dl = np_ = dp = 0
        n_parts = 0
        for p, (pm0, q0) in base.items():
            if (y, p) not in py:
                continue
            pm, q = py[(y, p)]
            n_parts += 1
            nl += pm * q0
            dl += pm0 * q0
            np_ += pm * q
            dp += pm0 * q
        if n_parts:
            expect[y] = (n_parts, nl / dl, np_ / dp)
    got = {
        r.yr: (r.n_parts, r.laspeyres, r.paasche)
        for r in _rows(spark, "f55_fisher_price_index")
    }
    assert got == expect


def test_f55_base_year_is_unity_and_fisher_between(spark):
    rows = _rows(spark, "f55_fisher_price_index")
    by_year = {r.yr: r for r in rows}
    b = by_year[1996]
    assert b.laspeyres == 1.0 and b.paasche == 1.0 and b.fisher == 1.0
    for r in rows:
        lo, hi = sorted((r.laspeyres, r.paasche))
        assert lo - 1e-12 <= r.fisher <= hi + 1e-12
        # geometric mean consistency
        assert math.isclose(
            r.fisher, math.sqrt(r.laspeyres * r.paasche), rel_tol=1e-12
        )


# --- g21 interval-union coverage -------------------------------------------


def _union_len(starts, length):
    total = 0
    cur_s = cur_e = None
    for s in sorted(starts):
        e = s + length
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        total += cur_e - cur_s
    return total


def test_g21_matches_python_model(spark):
    ev = _duck("SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) FROM events")
    per_user = defaultdict(list)
    for u, t in ev:
        per_user[u].append(t)
    length = 30 * 60 * 1_000_000
    bands = defaultdict(lambda: [0, 0, 0])
    for u, starts in per_user.items():
        cov = _union_len(starts, length)
        # island count: starts beyond every previous interval's end
        n_isl, max_end = 0, None
        for s in sorted(starts):
            if max_end is None or s > max_end:
                n_isl += 1
            max_end = s + length if max_end is None else max(max_end, s + length)
        assert cov <= len(starts) * length
        assert cov >= length  # every active user covers >= one window
        band = cov // 3_600_000_000
        bands[band][0] += 1
        bands[band][1] += n_isl
        bands[band][2] += cov
    got = {
        r.coverage_hours_band: (r.n_users, r.n_islands, r.total_coverage_us)
        for r in _rows(spark, "g21_interval_union_coverage")
    }
    assert got == {b: tuple(v) for b, v in bands.items()}


# --- x100 repetition gate --------------------------------------------------


def test_x100_matches_python_model(spark):
    docs = _duck("SELECT text FROM documents")
    n_docs = len(docs)
    fails = Counter()
    n_pass = 0
    for (text,) in docs:
        w = re.sub(r"\s+", " ", text.strip()).lower().split(" ")
        n, nd = len(w), len(set(w))
        top2 = max(
            Counter(zip(w, w[1:])).values(), default=0
        )
        top3 = max(
            Counter(zip(w, w[1:], w[2:])).values(), default=0
        )
        f1 = 5 * (n - nd) > 3 * n
        f2 = 20 * top2 > (n - 1)
        f3 = 25 * top3 > (n - 2)
        fails["fail_dup_word"] += f1
        fails["fail_top_2gram"] += f2
        fails["fail_top_3gram"] += f3
        n_pass += not (f1 or f2 or f3)
    [r] = _rows(spark, "x100_repetition_gate")
    assert r.n_docs == n_docs
    assert r.fail_dup_word == fails["fail_dup_word"]
    assert r.fail_top_2gram == fails["fail_top_2gram"]
    assert r.fail_top_3gram == fails["fail_top_3gram"]
    assert r.n_pass_all == n_pass
    assert r.retention_rate == n_pass / n_docs


# --- f57 Hill tail index ---------------------------------------------------


def test_f57_matches_python_model(spark):
    prices = sorted(
        (p, k) for k, p in _duck("SELECT o_orderkey, o_totalprice FROM orders")
    )
    top = sorted(prices, key=lambda t: (-t[0], t[1]))[:201]
    xk1 = top[200][0]
    s_nano = sum(_round_half_up(math.log(p / xk1) * 1e9) for p, _ in top[:200])
    [r] = REGISTRY["f57_hill_tail_index"].fn(spark, SF).collect()
    assert r.k == 200
    assert r.x_threshold == xk1
    assert math.isclose(r.hill_h, s_nano / 200e9, rel_tol=1e-12)
    assert math.isclose(r.tail_alpha, 200e9 / s_nano, rel_tol=1e-12)
    assert r.hill_h > 0 and r.tail_alpha > 0


# --- x101 negative-sampling table ------------------------------------------


def test_x101_buckets_partition_the_grid(spark):
    rows = sorted(
        _rows(spark, "x101_unigram_sampling_table"),
        key=lambda r: (-r.cnt, r.token),
    )
    grid = 1 << 20
    assert rows[0].bucket_start == 0
    assert rows[-1].bucket_end == grid
    for a, b in zip(rows, rows[1:]):
        assert a.bucket_end == b.bucket_start  # contiguous, no gaps
    for r in rows:
        assert r.bucket_end >= r.bucket_start
        # slice width tracks the smoothed weight within rounding
        expect = r.weight_micro / sum(x.weight_micro for x in rows) * grid
        assert abs((r.bucket_end - r.bucket_start) - expect) <= 2


def test_x101_weight_is_count_to_the_3_4(spark):
    for r in _rows(spark, "x101_unigram_sampling_table"):
        assert r.weight_micro == _round_half_up(r.cnt**0.75 * 1e6)


# --- x102 systematic resample ----------------------------------------------


def test_x102_matches_python_model(spark):
    docs = _duck("SELECT doc_id, source, n_chars FROM documents ORDER BY doc_id")
    w = sum(c for _, _, c in docs)
    k = 64
    per_src = defaultdict(lambda: [0, 0, 0])
    cum = 0

    def npts(c):
        return (2 * c * k - w) // (2 * w) + 1 if 2 * c * k >= w else 0

    total_draws = 0
    for doc_id, src, c in docs:
        cum += c
        mult = npts(cum) - npts(cum - c)
        total_draws += mult
        if mult > 0:
            per_src[src][0] += mult
            per_src[src][1] += 1
            per_src[src][2] += doc_id * mult
    assert total_draws == k  # systematic draws exactly K
    got = {
        r.source: (r.n_draws, r.n_docs_drawn, r.draw_checksum)
        for r in _rows(spark, "x102_systematic_resample")
    }
    assert got == {s: tuple(v) for s, v in per_src.items()}


# --- x103 Wilson interval --------------------------------------------------


def test_x103_wilson_properties(spark):
    rows = _rows(spark, "x103_retention_wilson_ci")
    for r in rows:
        assert 0.0 <= r.wilson_low <= r.p_hat <= r.wilson_high <= 1.0
        z, z2 = 1.96, 1.96 * 1.96
        n, p = r.n, r.s / r.n
        half = z * math.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))
        denom = 1 + z2 / n
        assert math.isclose(r.wilson_low, (p + z2 / (2 * n) - half) / denom,
                            rel_tol=1e-12)
        assert math.isclose(r.wilson_high, (p + z2 / (2 * n) + half) / denom,
                            rel_tol=1e-12)


# --- i4 multiset ops -------------------------------------------------------


def test_i4_matches_python_model(spark):
    rows = _duck(
        "SELECT o_custkey, year(o_orderdate) FROM orders"
        " WHERE year(o_orderdate) IN (1997, 1998)"
    )
    a = Counter(k for k, y in rows if y == 1997)
    b = Counter(k for k, y in rows if y == 1998)
    inter = {k: min(a[k], b[k]) for k in a if k in b}
    exc = {k: a[k] - b.get(k, 0) for k in a if a[k] > b.get(k, 0)}
    got = {r.op: (r.n_rows, r.key_checksum) for r in _rows(spark, "i4_multiset_ops")}
    assert got["intersect_all"] == (
        sum(inter.values()),
        sum(k * m for k, m in inter.items()),
    )
    assert got["except_all"] == (
        sum(exc.values()),
        sum(k * m for k, m in exc.items()),
    )


# --- j5 calendar scalars ---------------------------------------------------


def test_j5_calendar_identities(spark):
    import datetime

    rows = [r for r in _rows(spark, "j5_datetime_suite") if r.qtr is not None]
    assert rows
    for r in rows:
        ms = datetime.date.fromisoformat(r.month_start)
        qs = datetime.date.fromisoformat(r.quarter_start)
        me = datetime.date.fromisoformat(r.month_end)
        nm = datetime.date.fromisoformat(r.next_month_clamped)
        assert ms.day == 1 and qs.day == 1
        assert qs.month in (1, 4, 7, 10)
        assert r.qtr == (ms.month - 1) // 3 + 1
        # month_end is the last day of the representative's month
        assert (me + datetime.timedelta(days=1)).day == 1
        assert me.month == ms.month and me.year == ms.year
        # add_months lands in the following month
        assert (nm.year * 12 + nm.month) - (ms.year * 12 + ms.month) == 1


# --- x104 EB shrinkage -----------------------------------------------------


def test_x104_shrinkage_properties(spark):
    rows = _rows(spark, "x104_eb_shrinkage")
    ns = sum(r.s for r in rows)
    nn = sum(r.n for r in rows)
    m = ns / nn
    for r in rows:
        lo, hi = sorted((r.raw_rate, m))
        # posterior mean lies between the raw rate and the pooled mean
        assert lo - 1e-12 <= r.shrunk_rate <= hi + 1e-12
    # smaller sources shrink proportionally harder
    far = [
        (r.n, abs(r.shrunk_rate - r.raw_rate) / (abs(m - r.raw_rate) + 1e-15))
        for r in rows
        if abs(m - r.raw_rate) > 1e-9
    ]
    if len(far) > 2:
        big_n = max(far)[0]
        small_n = min(far)[0]
        big_pull = dict(far)[big_n]
        small_pull = dict(far)[small_n]
        assert small_pull >= big_pull - 1e-9


# --- s10 native session_window ---------------------------------------------


def test_s10_agrees_with_g21_union_coverage(spark):
    """total session span per user ≡ g21's union-of-intervals coverage
    (a session's span is exactly the union of its events' 30-min
    windows) — ties the native operator to the island sweep."""
    s10 = {r.user_id: r.total_span_us for r in _rows(spark, "s10_session_window_native")}
    per_user = defaultdict(list)
    for u, t in _duck(
        "SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) FROM events"
    ):
        per_user[u].append(t)
    gap = 30 * 60 * 1_000_000
    for u, starts in per_user.items():
        assert s10[u] == _union_len(starts, gap)


# --- f59 Gumbel block maxima -----------------------------------------------


def test_f59_matches_python_model(spark):
    rows = _duck(
        "SELECT date_trunc('month', d) AS mo, CAST(MAX(rev) AS DOUBLE) FROM ("
        " SELECT CAST(o_orderdate AS DATE) AS d,"
        "        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))"
        "             AS DECIMAL(38,2)) AS rev"
        " FROM orders GROUP BY 1) GROUP BY 1"
    )
    mx = [m for _, m in rows]
    k = len(mx)
    mean = sum(mx) / k  # python sum over ~36 floats: tolerance below
    [r] = _rows(spark, "f59_gumbel_block_maxima")
    assert r.n_months == k
    assert math.isclose(r.mean_max, mean, rel_tol=1e-9)
    var = sum((x - r.mean_max) ** 2 for x in mx) / (k - 1)
    assert math.isclose(r.var_max, var, rel_tol=1e-6)
    beta = math.sqrt(r.var_max) * math.sqrt(6.0) / math.pi
    assert math.isclose(r.gumbel_beta, beta, rel_tol=1e-12)
    assert math.isclose(
        r.gumbel_mu, r.mean_max - 0.5772156649015329 * beta, rel_tol=1e-12
    )
    # the 1-in-100 return level must exceed the location and the mean
    assert r.return_level_p99 > r.gumbel_mu
    assert r.return_level_p99 > r.mean_max


# --- x105 multi-scale repeat census ----------------------------------------


def test_x105_matches_python_model(spark):
    docs = _duck("SELECT doc_id, text FROM documents")
    spans = (1, 2, 4, 8, 16, 32, 64)
    expect = {s: [0, 0, 0] for s in spans}
    for doc_id, text in docs:
        norm = re.sub(r"\s+", " ", text.strip()).lower()
        for s in spans:
            if len(norm) < s:
                continue
            c = Counter(norm[i : i + s] for i in range(len(norm) - s + 1))
            dups = {g: n for g, n in c.items() if n >= 2}
            if dups:
                expect[s][0] += 1
                expect[s][1] += len(dups)
                expect[s][2] += sum(dups.values())
    got = {
        r.span: (r.n_docs_with_repeat, r.n_repeat_classes, r.n_repeat_positions)
        for r in _rows(spark, "x105_multiscale_repeat_census")
    }
    assert got == {s: tuple(v) for s, v in expect.items()}


def test_x105_repeat_docs_monotone_in_span(spark):
    """A length-2s repeat contains length-s repeats, so the doc count
    can only fall as the span grows."""
    rows = sorted(_rows(spark, "x105_multiscale_repeat_census"),
                  key=lambda r: r.span)
    for a, b in zip(rows, rows[1:]):
        assert b.n_docs_with_repeat <= a.n_docs_with_repeat


# --- x106 CCNet terciles ---------------------------------------------------


def test_x106_matches_python_model(spark):
    toks = _duck(
        "SELECT doc_id, unnest(string_split(lower(regexp_replace(trim(text),"
        " '\\s+', ' ', 'g')), ' ')) FROM documents"
    )
    srcs = dict(_duck("SELECT doc_id, source FROM documents"))
    vocab = Counter(t for _, t in toks)
    total = sum(vocab.values())
    lp = {t: _round_half_up(math.log(c / total) * 1e6) for t, c in vocab.items()}
    per_doc = defaultdict(lambda: [0, 0])
    for d, t in toks:
        per_doc[d][0] += lp[t]
        per_doc[d][1] += 1
    order = sorted(per_doc, key=lambda d: (-(per_doc[d][0] / per_doc[d][1]), d))
    n = len(order)
    expect = defaultdict(lambda: [0, 0])
    for rn, d in enumerate(order, start=1):
        b = "head" if 3 * rn <= n else ("middle" if 3 * rn <= 2 * n else "tail")
        expect[(b, srcs[d])][0] += 1
        expect[(b, srcs[d])][1] += per_doc[d][1]
    got = {
        (r.bucket, r.source): (r.n_docs, r.n_tokens)
        for r in _rows(spark, "x106_ccnet_terciles")
    }
    assert got == {k: tuple(v) for k, v in expect.items()}


def test_x106_buckets_are_balanced(spark):
    rows = _rows(spark, "x106_ccnet_terciles")
    per_bucket = defaultdict(int)
    for r in rows:
        per_bucket[r.bucket] += r.n_docs
    n = sum(per_bucket.values())
    assert per_bucket["head"] == n // 3
    assert per_bucket["head"] + per_bucket["middle"] == (2 * n) // 3


# --- x107 distinct-n diversity ---------------------------------------------


def _x107_model():
    toks = _duck(
        "SELECT source, string_split(lower(regexp_replace(trim(text),"
        " '\\s+', ' ', 'g')), ' ') FROM documents"
    )
    expect = {}
    for n in (1, 2, 3):
        per_src = defaultdict(Counter)
        for src, t in toks:
            for i in range(len(t) - n + 1):
                per_src[src][tuple(t[i : i + n])] += 1
        for src, c in per_src.items():
            total, distinct = sum(c.values()), len(c)
            expect[(src, n)] = (
                total,
                distinct,
                _round_half_up(distinct / total * 1e4) / 1e4,
            )
    return expect


def test_x107_matches_python_model(spark):
    got = {
        (r.source, r.n): (r.n_grams, r.n_distinct, r.distinct_ratio)
        for r in _rows(spark, "x107_distinct_ngram_diversity")
    }
    assert got == _x107_model()


def test_x107_gram_counts_decrease_with_n(spark):
    rows = _rows(spark, "x107_distinct_ngram_diversity")
    by_src = defaultdict(dict)
    for r in rows:
        by_src[r.source][r.n] = r
    for src, d in by_src.items():
        assert set(d) == {1, 2, 3}
        # each doc contributes exactly len-n+1 grams, so totals strictly
        # decrease with n while uniqueness (the diversity signal) rises
        assert d[1].n_grams > d[2].n_grams > d[3].n_grams
        assert d[1].distinct_ratio < d[2].distinct_ratio < d[3].distinct_ratio


# --- x108 term adaptation ---------------------------------------------------


def _x108_model():
    toks = _duck(
        "SELECT doc_id, unnest(string_split(lower(regexp_replace(trim(text),"
        " '\\s+', ' ', 'g')), ' ')) FROM documents"
    )
    n_docs = _duck("SELECT COUNT(*) FROM documents")[0][0]
    per = Counter(toks)
    df, df2 = Counter(), Counter()
    for (_, term), c in per.items():
        df[term] += 1
        if c >= 2:
            df2[term] += 1
    ranked = sorted(df, key=lambda t: (-df[t], t))[:50]
    return {
        t: (
            df[t],
            df2[t],
            _round_half_up(df2[t] / df[t] * 1e4) / 1e4,
            _round_half_up(df[t] / n_docs * 1e4) / 1e4,
        )
        for t in ranked
    }


def test_x108_matches_python_model(spark):
    got = {
        r.term: (r.df, r.df2, r.adaptation, r.base_rate)
        for r in _rows(spark, "x108_term_adaptation")
    }
    assert got == _x108_model()


def test_x108_bounds_and_ranking(spark):
    # Hard invariants only: the synthetic corpus draws tokens nearly
    # independently, so Church's adaptation>>independence inequality
    # (which motivates the metric on real text) is NOT asserted here —
    # the exact-model test above already pins every value.
    n_docs = _duck("SELECT COUNT(*) FROM documents")[0][0]
    rows = _rows(spark, "x108_term_adaptation")
    assert 0 < len(rows) <= 50
    dfs = [r.df for r in rows]
    assert dfs == sorted(dfs, reverse=True)  # top-50 by DF
    for r in rows:
        assert 0 <= r.df2 <= r.df <= n_docs
        assert 0.0 <= r.adaptation <= 1.0
        assert 0.0 < r.base_rate <= 1.0


# --- f60 Mann-Kendall --------------------------------------------------------


def _daily_revenue_model():
    return [
        y
        for _, y in sorted(
            _duck(
                "SELECT date_diff('day', DATE '1995-01-01', o_orderdate),"
                " CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))"
                " AS DECIMAL(38,2)), 0) AS BIGINT)"
                " FROM orders GROUP BY 1"
            )
        )
    ]


def test_f60_matches_python_model(spark):
    ys = _daily_revenue_model()
    n = len(ys)
    s = sum(
        (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    tt = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(ys).values() if t > 1
    )
    var_s = (n * (n - 1) * (2 * n + 5) - tt) / 18.0
    z = (
        (s - 1) / math.sqrt(var_s)
        if s > 0
        else (s + 1) / math.sqrt(var_s)
        if s < 0
        else 0.0
    )
    (r,) = _rows(spark, "f60_mann_kendall")
    assert r.n_days == n
    assert r.s_stat == s
    assert abs(r.var_s - var_s) <= 1e-4
    assert abs(r.z_score - z) <= 1e-6


def test_f60_s_bounds(spark):
    (r,) = _rows(spark, "f60_mann_kendall")
    max_pairs = r.n_days * (r.n_days - 1) // 2
    assert -max_pairs <= r.s_stat <= max_pairs
    assert r.var_s > 0


# --- f61 Spearman rank correlation ------------------------------------------


def _cust_xy():
    return _duck(
        "SELECT CAST(COUNT(*) AS BIGINT),"
        " CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)"
        " FROM orders GROUP BY o_custkey"
    )


def _avg_ranks(vals):
    order = sorted(vals)
    first = {}
    for i, v in enumerate(order):
        first.setdefault(v, i)
    cnt = Counter(vals)
    return [first[v] + (cnt[v] + 1) / 2 for v in vals]


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    return (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )


def test_f61_matches_python_model(spark):
    pts = _cust_xy()
    xs = [x for x, _ in pts]
    ys = [y for _, y in pts]
    rho = _pearson(_avg_ranks(xs), _avg_ranks(ys))
    r_raw = _pearson(xs, ys)
    (r,) = _rows(spark, "f61_spearman_rank_corr")
    assert r.n_customers == len(pts)
    assert abs(r.spearman_rho - rho) <= 1e-6
    assert abs(r.pearson_r - r_raw) <= 1e-6


def test_f61_correlations_in_range(spark):
    (r,) = _rows(spark, "f61_spearman_rank_corr")
    assert -1.0 <= r.spearman_rho <= 1.0
    assert -1.0 <= r.pearson_r <= 1.0
    # order count and total spend must correlate positively
    assert r.spearman_rho > 0.5 and r.pearson_r > 0.5


# --- x109 padding waste -------------------------------------------------------


def test_x109_matches_python_model(spark):
    lens = [
        n
        for (n,) in _duck(
            "SELECT len(string_split(lower(regexp_replace(trim(text),"
            " '\\s+', ' ', 'g')), ' ')) FROM documents"
        )
    ]
    got = {r.context_len: r for r in _rows(spark, "x109_padding_waste")}
    assert set(got) == {128, 512, 2048}
    for L, r in got.items():
        seqs = sum((n + L - 1) // L for n in lens)
        toks = sum(lens)
        waste = seqs * L - toks
        assert r.n_docs == len(lens)
        assert r.n_seqs == seqs
        assert r.n_tokens == toks
        assert r.padding_tokens == waste
        assert r.waste_pct == _round_half_up(waste / (seqs * L) * 1e4) / 1e4


def test_x109_waste_grows_with_context_len(spark):
    rows = sorted(_rows(spark, "x109_padding_waste"), key=lambda r: r.context_len)
    # same corpus at every L, padding (and waste share) monotone in L
    assert len({r.n_tokens for r in rows}) == 1
    for a, b in zip(rows, rows[1:]):
        assert b.padding_tokens >= a.padding_tokens
        assert b.waste_pct >= a.waste_pct
        assert b.n_seqs <= a.n_seqs


# --- x110 LSH band planner ---------------------------------------------------


def test_x110_matches_python_model(spark):
    import hashlib

    from calaveras_uniteus_etl_spark.operators import dedup as dd
    from calaveras_uniteus_etl_spark.plans.queries_dedup import (
        _X110_CONFIGS,
        _X110_STARS,
        _spark_sigs,
    )

    sigs = [r.sig for r in _spark_sigs(spark, SF).collect()]
    got = {
        (r.n_bands, r.n_rows): r for r in _rows(spark, "x110_lsh_band_planner")
    }
    assert set(got) == set(_X110_CONFIGS)
    for b, r_ in _X110_CONFIGS:
        buckets = Counter()
        for sig in sigs:
            for i in range(b):
                key = ",".join(str(v) for v in sig[i * r_ : i * r_ + r_])
                buckets[(i, hashlib.md5(key.encode()).hexdigest())] += 1
        # band index is NOT part of the bucket key in the query: a digest
        # collision across bands would merge buckets there. Rebuild the
        # query's exact keying (digest only) for the comparison.
        by_digest = Counter()
        for sig in sigs:
            for i in range(b):
                key = ",".join(str(v) for v in sig[i * r_ : i * r_ + r_])
                by_digest[hashlib.md5(key.encode()).hexdigest()] += 1
        r = got[(b, r_)]
        assert r.s_star == _X110_STARS[b]
        assert r.n_buckets == len(by_digest)
        assert r.n_multi_buckets == sum(1 for v in by_digest.values() if v > 1)
        assert r.max_bucket == max(by_digest.values())
        assert r.candidate_pairs == sum(
            v * (v - 1) // 2 for v in by_digest.values()
        )


def test_x110_pairs_monotone_in_rows(spark):
    # fewer rows per band -> stricter bucket key is FALSE: more rows per
    # band means a LONGER key, so buckets only split and pair counts can
    # only fall as n_rows grows (n_bands falls).
    rows = sorted(_rows(spark, "x110_lsh_band_planner"), key=lambda r: r.n_rows)
    for a, b in zip(rows, rows[1:]):
        assert b.candidate_pairs <= a.candidate_pairs
        assert 0.0 < a.s_star < b.s_star < 1.0


# --- f62 Tukey outlier census -------------------------------------------------


def test_f62_matches_python_model(spark):
    from decimal import Decimal

    pts = _duck("SELECT o_orderpriority, o_totalprice FROM orders")
    per = defaultdict(list)
    for prio, v in pts:
        per[prio].append(Decimal(str(v)).quantize(Decimal("0.01")))
    got = {r.prio: r for r in _rows(spark, "f62_tukey_outliers")}
    assert set(got) == set(per)
    for prio, vals in per.items():
        vals.sort()
        n = len(vals)
        q1 = vals[(1 * n + 3) // 4 - 1]
        q2 = vals[(2 * n + 3) // 4 - 1]
        q3 = vals[(3 * n + 3) // 4 - 1]
        iqr = q3 - q1
        n_low = sum(1 for v in vals if 2 * v < 2 * q1 - 3 * iqr)
        n_high = sum(1 for v in vals if 2 * v > 2 * q3 + 3 * iqr)
        r = got[prio]
        assert r.n == n
        assert (r.q1, r.q2, r.q3) == (float(q1), float(q2), float(q3))
        assert (r.n_low, r.n_high) == (n_low, n_high)
        assert r.outlier_pct == _round_half_up((n_low + n_high) / n * 1e4) / 1e4


def test_f62_quartiles_ordered_and_fences_sane(spark):
    for r in _rows(spark, "f62_tukey_outliers"):
        assert r.q1 <= r.q2 <= r.q3
        assert r.n_low + r.n_high < r.n  # fences never reject everything
        assert 0.0 <= r.outlier_pct < 0.5


# --- f63 VaR / CVaR -----------------------------------------------------------


def test_f63_matches_python_model(spark):
    ys = sorted(_daily_revenue_model())
    n = len(ys)
    var_p05 = ys[-(-n // 20) - 1]  # ceil(n/20), 1-based -> index
    median = ys[-(-n // 2) - 1]
    tail = [y for y in ys if y <= var_p05]
    (r,) = _rows(spark, "f63_revenue_var_cvar")
    assert r.n_days == n
    assert r.var_p05 == var_p05
    assert r.median == median
    assert r.n_tail_days == len(tail)
    assert r.es_p05 == sum(tail) / len(tail)
    assert r.var_to_median == _round_half_up(var_p05 / median * 1e4) / 1e4


def test_f63_coherence(spark):
    (r,) = _rows(spark, "f63_revenue_var_cvar")
    # ES is a tail mean bounded by its quantile; both sit left of median
    assert r.es_p05 <= r.var_p05 <= r.median
    assert 20 * r.n_tail_days >= r.n_days  # ties can only grow the tail
    assert 0.0 < r.var_to_median <= 1.0


# --- f64 monthly revenue bands ------------------------------------------------


def test_f64_matches_python_model(spark):
    rows = _duck(
        "SELECT strftime(o_orderdate, '%Y-%m'),"
        " date_diff('day', DATE '1995-01-01', o_orderdate),"
        " CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))"
        " AS DECIMAL(38,2)), 0) AS BIGINT)"
        " FROM orders GROUP BY 1, 2"
    )
    per = defaultdict(list)
    for m, _, y in rows:
        per[m].append(y)
    got = {r.month: r for r in _rows(spark, "f64_monthly_revenue_bands")}
    assert set(got) == set(per)
    for m, ys in per.items():
        ys.sort()
        n = len(ys)
        p10 = ys[-(-n // 10) - 1]
        p50 = ys[-(-n // 2) - 1]
        p90 = ys[-(-(9 * n) // 10) - 1]
        r = got[m]
        assert (r.n_days, r.p10, r.p50, r.p90) == (n, p10, p50, p90)
        assert r.rel_spread == _round_half_up((p90 - p10) / p50 * 1e4) / 1e4


def test_f64_bands_ordered(spark):
    for r in _rows(spark, "f64_monthly_revenue_bands"):
        assert r.p10 <= r.p50 <= r.p90
        assert 0 < r.n_days <= 31
        assert r.rel_spread >= 0.0


# --- x113 MinHash K sweep -----------------------------------------------------


def test_x113_k12_reproduces_x26(spark):
    # same candidate population, same micro-unit contract: the K=12 arm
    # must agree with x26's error audit exactly
    x26 = _rows(spark, "x26_minhash_error")[0]
    by_k = {r.k: r for r in _rows(spark, "x113_minhash_k_sweep")}
    assert set(by_k) == {4, 8, 12}
    assert by_k[12].n_pairs == x26.n_pairs
    assert by_k[12].mean_abs_err == x26.mean_abs_err
    assert by_k[12].max_abs_err == x26.max_abs_err


def test_x113_estimator_inequalities(spark):
    rows = _rows(spark, "x113_minhash_k_sweep")
    n_pairs = {r.n_pairs for r in rows}
    assert len(n_pairs) == 1  # identical pair population at every arm
    for r in rows:
        assert 0.0 <= r.mean_abs_err <= r.rmse + 1e-12  # Jensen
        assert r.rmse <= r.max_abs_err + 1e-12
        assert r.max_abs_err <= 1.0


# --- x112 contamination width sweep --------------------------------------------


def test_x112_monotone_in_n(spark):
    # longer grams are strictly harder to collide on: every (doc, 21-gram)
    # hit implies hits at 13 and 8 — flagged docs/grams must not grow with n
    rows = sorted(_rows(spark, "x112_contamination_n_sweep"), key=lambda r: r.n_gram)
    assert [r.n_gram for r in rows] == [8, 13, 21]
    assert len({r.n_train_docs for r in rows}) == 1
    for a, b in zip(rows, rows[1:]):
        assert b.n_contaminated_docs <= a.n_contaminated_docs
    for r in rows:
        assert 0 <= r.n_contaminated_docs <= r.n_train_docs
        assert r.contaminated_rate == _round_half_up(
            r.n_contaminated_docs / r.n_train_docs * 1e4
        ) / 1e4


def test_x112_n13_consistent_with_x18(spark):
    # the n=13 arm flags exactly the docs x18 reports (x18 emits one row
    # per contaminated train doc)
    x18_docs = len(_rows(spark, "x18_decontamination"))
    by_n = {r.n_gram: r for r in _rows(spark, "x112_contamination_n_sweep")}
    assert by_n[13].n_contaminated_docs == x18_docs


# --- j6 conditional suite -------------------------------------------------------


def test_j6_matches_python_model(spark):
    rows = _duck(
        "SELECT o_orderkey, CAST(o_totalprice AS DOUBLE), o_orderpriority"
        " FROM orders WHERE o_orderkey % 97 = 5"
    )
    got = {r.o_orderkey: r for r in _rows(spark, "j6_conditional_suite")}
    assert set(got) == {k for k, _, _ in rows}
    for k, price, prio in rows:
        r = got[k]
        assert r.hi_floor == max(price, 100000.0)
        assert r.lo_cap == min(price, 100000.0)
        lead = prio.split("-")[0]
        assert r.prio_num == (int(lead) if lead.isdigit() else None)
        assert r.bad_cast is None
        assert r.price_sign == (
            1 if price > 150000 else -1 if price < 150000 else 0
        )
        assert r.key_mod7 == k % 7
        assert r.price_bucket == (
            0 if price < 0 else 7 if price >= 600000 else 1 + int(price // 100000)
        )
        assert r.key_low_bits == k & 255
        assert r.size_label == ("big" if price > 200000 else "small")


# --- x114 dedup strategy matrix ------------------------------------------------


def test_x114_union_and_bounds(spark):
    rows = {r.strategy: r for r in _rows(spark, "x114_dedup_strategy_matrix")}
    assert set(rows) == {"exact", "minhash", "simhash", "any"}
    n_docs = _duck("SELECT COUNT(*) FROM documents")[0][0]
    any_ = rows["any"]
    for s in ("exact", "minhash", "simhash"):
        r = rows[s]
        # each single strategy is a subset of the union
        assert r.n_flagged_docs <= any_.n_flagged_docs
        assert r.flagged_tokens <= any_.flagged_tokens
        assert 0 <= r.n_flagged_docs <= n_docs
        assert 0.0 <= r.pct_docs <= 1.0 and 0.0 <= r.pct_tokens <= 1.0
    # union bound: |any| <= sum of parts
    assert any_.n_flagged_docs <= sum(
        rows[s].n_flagged_docs for s in ("exact", "minhash", "simhash")
    )


def test_x114_minhash_arm_matches_pair_miner(spark):
    # the minhash arm must flag exactly the distinct doc_b of x2's pair
    # miner at est >= 0.5
    pairs = REGISTRY["x2_minhash_lsh_pairs"].fn(spark, SF).collect()
    flagged = {p.doc_b for p in pairs}
    rows = {r.strategy: r for r in _rows(spark, "x114_dedup_strategy_matrix")}
    assert rows["minhash"].n_flagged_docs == len(flagged)


# --- x115 dup-graph hub census ---------------------------------------------------


def test_x115_degree_conservation(spark):
    rows = _rows(spark, "x115_dup_graph_hubs")
    pairs = REGISTRY["x2_minhash_lsh_pairs"].fn(spark, SF).collect()
    # handshake lemma: total endpoint share == 2 * |edges|
    assert sum(r.endpoint_share for r in rows) == 2 * len(pairs)
    deg = Counter()
    for p in pairs:
        deg[p.doc_a] += 1
        deg[p.doc_b] += 1
    assert sum(r.n_docs for r in rows) == len(deg)


def test_x115_band_ranges_are_disjoint_and_ordered(spark):
    rows = sorted(_rows(spark, "x115_dup_graph_hubs"), key=lambda r: r.min_degree)
    bounds = {"1": (1, 1), "2": (2, 2), "3-5": (3, 5), "6-10": (6, 10), "11+": (11, None)}
    for a, b in zip(rows, rows[1:]):
        assert a.max_degree < b.min_degree
    for r in rows:
        lo, hi = bounds[r.degree_band]
        assert r.min_degree >= lo
        assert hi is None or r.max_degree <= hi
        assert r.n_docs >= 1
        assert r.n_docs * r.min_degree <= r.endpoint_share <= r.n_docs * r.max_degree


# --- x116 shard checksums --------------------------------------------------------


def _md5_long(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_x116_matches_python_model(spark):
    import hashlib

    docs = _duck("SELECT doc_id, text FROM documents")
    MOD = 2305843009213693951
    per = defaultdict(lambda: [0, [], 0])
    for doc_id, text in docs:
        shard = _md5_long(f"shard:{doc_id}") % 8
        h = hashlib.md5(text.encode()).hexdigest()
        d = _md5_long(f"ck:{doc_id}:{h}")
        per[shard][0] += 1
        per[shard][1].append(doc_id)
        per[shard][2] += d
    got = {r.shard: r for r in _rows(spark, "x116_shard_checksums")}
    assert set(got) == set(per)
    for shard, (n, ids, tot) in per.items():
        r = got[shard]
        assert r.n_docs == n
        assert r.min_doc_id == min(ids)
        assert r.max_doc_id == max(ids)
        assert r.checksum == tot % MOD


def test_x116_checksum_detects_membership_change(spark):
    # moving any one doc between shards must change both shard sums:
    # model-level property of the commutative checksum (no Spark rerun)
    docs = _duck("SELECT doc_id, text FROM documents LIMIT 2")
    import hashlib

    d0 = _md5_long(
        f"ck:{docs[0][0]}:{hashlib.md5(docs[0][1].encode()).hexdigest()}"
    )
    assert d0 != 0  # a zero digest would make membership invisible
