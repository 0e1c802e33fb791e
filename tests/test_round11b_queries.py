"""Model checks for the round-11 second-batch queries.

The DuckDB oracles prove cross-engine agreement; these prove the MATH:
each statistic is re-derived with a naive single-node Python model on
the sf0.001 tables (exact integers where the query is exact, floats
where it divides), plus the invariants each must satisfy regardless
of data.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from calaveras_uniteus_etl_spark.operators.dedup import NORM_DUCK
from calaveras_uniteus_etl_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF).collect()


def _duck(sql):
    con = duckdb.connect()
    for t in ("customer", "orders", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).fetchall()


def _order_split():
    """(urgent_flag, cents) per order — the f89/f99 split."""
    return _duck(
        "SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
        " THEN 1 ELSE 0 END,"
        " CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
        " FROM orders"
    )


def test_f99_ad_matches_python_model(spark):
    """A² re-derived from the textbook Scholz–Stephens k=2 reduction
    over the distinct-value grid, exact integer numerators."""
    data = _order_split()
    n1 = sum(a for a, _ in data)
    nn = len(data)
    n2 = nn - n1
    grid = {}
    for a, x in data:
        c1, ll = grid.get(x, (0, 0))
        grid[x] = (c1 + a, ll + 1)
    m = b = 0
    total = 0.0
    n_terms = 0
    for x in sorted(grid):
        c1, ll = grid[x]
        m += c1
        b += ll
        if b < nn:
            d = nn * m - n1 * b
            total += ll * d * d / (n1 * n2 * b * (nn - b))
            n_terms += 1
    (row,) = _rows(spark, "f99_anderson_darling")
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["n_terms"] == n_terms
    assert row["ad_stat"] == pytest.approx(total, abs=1e-5)
    assert row["ad_stat"] >= 0.0


def test_f100_pinball_matches_naive_argmin(spark):
    """Each reported quantile must be the EXACT integer-loss argmin
    over every distinct candidate (smallest candidate on ties), and
    must satisfy the quantile characterization F(q) ≥ τ."""
    cents = sorted(x for _, x in _order_split())
    n = len(cents)
    distinct = sorted(set(cents))
    rows = _rows(spark, "f100_pinball_quantiles")
    assert [r["tau_pct"] for r in rows] == [10, 25, 50, 75, 90]
    for r in rows:
        tau = r["tau_pct"]
        best = min(
            (
                tau * sum(y - q for y in cents if y > q)
                + (100 - tau) * sum(q - y for y in cents if y < q),
                q,
            )
            for q in distinct
        )
        assert (r["loss_cp"], r["q_cents"]) == best
        assert r["n_orders"] == n
        # argmin of the pinball loss IS a tau-quantile
        le = sum(1 for y in cents if y <= r["q_cents"])
        assert le * 100 >= tau * n


def test_f101_grubbs_matches_python_model(spark):
    """G, the moments and the arg-day re-derived naively per year."""
    daily = _duck(
        "SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT),"
        " date_diff('day', DATE '1995-01-01', o_orderdate),"
        " CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)"
        " // 100000"
        " FROM orders GROUP BY 1, 2"
    )
    years = {}
    for yr, d, y in daily:
        years.setdefault(yr, []).append((d, int(y)))
    rows = {r["yr"]: r for r in _rows(spark, "f101_grubbs_outlier")}
    assert set(rows) == set(years)
    for yr, pts in years.items():
        n = len(pts)
        sy = sum(y for _, y in pts)
        sy2 = sum(y * y for _, y in pts)
        adev, day, yout = max(
            (abs(n * y - sy), -d, y) for d, y in pts
        )  # max deviation, smallest day on ties
        day = -day
        sd = math.sqrt((n * sy2 - sy * sy) / (n * (n - 1)))
        r = rows[yr]
        assert r["n_days"] == n
        assert r["mean_kusd"] == pytest.approx(sy / n, abs=1e-5)
        assert r["sd_kusd"] == pytest.approx(sd, abs=1e-5)
        assert r["g_stat"] == pytest.approx((adev / n) / sd, abs=1e-5)
        assert r["out_day"] == day and r["out_rev_kusd"] == yout
        # a studentized deviate is bounded by (n-1)/sqrt(n)
        assert r["g_stat"] <= (n - 1) / math.sqrt(n) + 1e-9


def test_h36_matches_naive_winner_list(spark):
    """Winner set and ordering re-derived naively; the decimal
    cross-multiplication must agree with exact Fraction ratios."""
    from fractions import Fraction

    data = _duck(
        "SELECT o_custkey, EXTRACT(year FROM o_orderdate),"
        " CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
        " THEN 1 ELSE 0 END,"
        " CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
        " FROM orders WHERE EXTRACT(year FROM o_orderdate) IN (1996, 1997)"
    )
    per = {}
    for ck, yr, u, cents in data:
        key = (yr, u)
        agg = per.setdefault(ck, {})
        agg[key] = agg.get(key, 0) + cents
    winners = []
    for ck, agg in per.items():
        u94, u95 = agg.get((1996, 1), 0), agg.get((1997, 1), 0)
        s94, s95 = agg.get((1996, 0), 0), agg.get((1997, 0), 0)
        if u94 > 0 and s94 > 0 and Fraction(u95, u94) > Fraction(s95, s94):
            winners.append((ck, u94, u95, s94, s95))
    winners.sort(key=lambda w: (-w[2] / w[1], w[0]))
    rows = _rows(spark, "h36_channel_growth")
    assert len(rows) == min(20, len(winners))
    for r, (ck, u94, u95, s94, s95) in zip(rows, winners):
        assert r["custkey"] == ck
        assert (
            r["urgent_1996_cents"],
            r["urgent_1997_cents"],
            r["standard_1996_cents"],
            r["standard_1997_cents"],
        ) == (u94, u95, s94, s95)
        assert r["urgent_ratio"] == pytest.approx(u95 / u94, abs=1e-6)
        assert r["standard_ratio"] == pytest.approx(s95 / s94, abs=1e-6)


def test_x144_novelty_partitions_the_vocabulary(spark):
    """Every distinct gram is novel in exactly one shard: the novel
    counts must partition the corpus vocabulary; the first nonempty
    shard is 100% novel; ratios recompute from the counts."""
    rows = sorted(_rows(spark, "x144_shard_novelty"), key=lambda r: r["shard"])
    assert rows, "shards must not be empty"
    assert rows[0]["novelty_ratio"] == 1.0
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_distinct"] <= r["n_instances"]
        assert r["novelty_ratio"] == pytest.approx(
            round(r["n_novel"] / r["n_distinct"], 6), abs=1e-9
        )
    (total_vocab,) = _duck(
        f"""
        WITH toks AS (
          SELECT string_split({NORM_DUCK.format(col="text")}, ' ') AS t
          FROM documents
        )
        SELECT COUNT(DISTINCT g) FROM (
          SELECT unnest([md5(array_to_string(t[i:i+2], ' '))
                         for i in range(1, len(t) - 1)]) AS g
          FROM toks WHERE len(t) >= 3
        )
        """
    )[0]
    assert sum(r["n_novel"] for r in rows) == total_vocab


def test_x145_matches_numpy_power_iteration(spark):
    """The iterate re-derived with numpy running the SAME quantized
    recurrence, and the direction checked against the true dominant
    eigenvector when the spectral gap is decisive."""
    vecs = _duck("SELECT embedding FROM embeddings ORDER BY vec_id")
    emb = np.array([v[0] for v in vecs], dtype=np.float64)
    q = np.floor(np.abs(emb) * 1000.0 + 0.5) * np.sign(emb)  # half-away
    q = q.astype(np.int64)
    n = q.shape[0]
    sx = q.sum(axis=0)
    c = n * (q.T @ q) - np.outer(sx, sx)  # exact int64 numerators
    mx = np.abs(c).max()
    cs = np.round(c.astype(np.float64) / float(mx), 14)
    w = np.ones(cs.shape[0])
    for _ in range(12):
        prev = w
        w = np.round(cs * w[None, :], 14).sum(axis=1)
    m_last, m_prev = np.abs(w).max(), np.abs(prev).max()
    loading = w / m_last
    lam = (m_last / m_prev) * float(mx)
    rows = sorted(_rows(spark, "x145_top_principal_direction"),
                  key=lambda r: r["dim"])
    assert [r["dim"] for r in rows] == list(range(cs.shape[0]))
    got = np.array([r["loading"] for r in rows])
    assert np.max(np.abs(got - loading)) < 1e-5
    assert rows[0]["lambda_num"] == pytest.approx(lam, rel=1e-6)
    assert np.max(np.abs(got)) == pytest.approx(1.0, abs=1e-8)
    # against the true eigenvector, when 12 steps is provably enough
    evals, evecs = np.linalg.eigh(c.astype(np.float64))
    lam1, lam2 = evals[-1], abs(evals[-2])
    if lam2 > 0 and lam1 / lam2 > 1.5:
        top = evecs[:, -1]
        cos = abs(got @ top) / (np.linalg.norm(got) * np.linalg.norm(top))
        assert cos > 0.999
        assert lam == pytest.approx(lam1, rel=0.01)


def test_m20_benford_matches_python_model(spark):
    """Counts, shares and chi2 re-derived naively; Benford shares sum
    to 1 and observed shares partition the order count."""
    digs = _duck(
        "SELECT CAST(SUBSTR(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2))"
        " * 100 AS BIGINT) AS VARCHAR), 1, 1) AS INT), COUNT(*)"
        " FROM orders GROUP BY 1"
    )
    counts = dict(digs)
    n = sum(counts.values())
    ps = {d: math.log10(1 + 1 / d) for d in range(1, 10)}
    chi2 = sum(
        (counts.get(d, 0) - n * p) ** 2 / (n * p) for d, p in ps.items()
        if d in counts
    )
    rows = sorted(_rows(spark, "m20_benford_audit"), key=lambda r: r["digit"])
    assert [r["digit"] for r in rows] == sorted(counts)
    assert sum(r["n_obs"] for r in rows) == n
    assert sum(ps.values()) == pytest.approx(1.0, abs=1e-12)
    for r in rows:
        assert r["n_obs"] == counts[r["digit"]]
        assert r["share"] == pytest.approx(counts[r["digit"]] / n, abs=1e-6)
        assert r["benford_p"] == pytest.approx(ps[r["digit"]], abs=1e-6)
        assert r["deviation"] == pytest.approx(
            counts[r["digit"]] / n - ps[r["digit"]], abs=2e-6
        )
        assert r["chi2_total"] == pytest.approx(chi2, abs=1e-4)
