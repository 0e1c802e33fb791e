"""Model checks for x86 (edit-distance join), x87 (Zipf fit), x88
(stratified sampler) on sf0.001 — naive Python re-derivations plus the
invariants each must satisfy on any data."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb
import pytest

from calaveras_uniteus_etl_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF).collect()


def _duck(sql):
    con = duckdb.connect()
    for t in ("part", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).fetchall()


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


# ---------------------------------------------------------------------------
# x86 — edit-distance join
# ---------------------------------------------------------------------------


def test_x86_matches_naive_quadratic_join(spark):
    """The count-filtered pipeline must return EXACTLY the brute-force
    pairs — any missing pair is a lossless-filter bug."""
    names = [
        r[0]
        for r in _duck(
            "SELECT DISTINCT p_name FROM part WHERE length(p_name) >= 6"
        )
    ]
    want = {
        (a, b): _lev(a, b)
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if _lev(a, b) <= 2
    }
    want = {(min(k), max(k)): v for k, v in want.items()}
    got = {(r["name_a"], r["name_b"]): r["editdist"] for r in _rows(spark, "x86_editdist_join")}
    assert got == want


def test_x86_count_filter_bound_is_lossless_here(spark):
    """Precondition of the losslessness argument: every joined name is
    long enough that the count-filter bound stays ≥ 1 at k=2, q=2."""
    names = _duck("SELECT DISTINCT p_name FROM part")
    for (n,) in names:
        if len(n) >= 6:
            assert (len(n) - 1) - 2 * 2 >= 1


# ---------------------------------------------------------------------------
# x87 — Zipf slope
# ---------------------------------------------------------------------------


def _zipf_model():
    import re

    docs = _duck("SELECT text FROM documents")
    counts = Counter()
    for (text,) in docs:
        counts.update(t.lower() for t in re.findall(r"[A-Za-z0-9]+", text))
    head = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
    xs = [math.log(i + 1) for i in range(len(head))]
    ys = [math.log(f) for _, f in head]
    n = len(head)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    return n, slope, r2


def test_x87_matches_python_model(spark):
    n, slope, r2 = _zipf_model()
    (row,) = _rows(spark, "x87_zipf_slope")
    assert row["n_ranks"] == n
    # 1e-4-nat quantization of the coordinates: slope agrees to ~1e-3
    assert row["zipf_slope"] == pytest.approx(slope, abs=2e-3)
    assert row["r2"] == pytest.approx(r2, abs=2e-3)
    assert row["zipf_slope"] < 0  # frequency decays with rank
    assert 0.0 <= row["r2"] <= 1.0


# ---------------------------------------------------------------------------
# x88 — stratified sampler
# ---------------------------------------------------------------------------


def _strata_model():
    rows = _duck("SELECT lang, doc_id FROM documents")
    strata = defaultdict(list)
    for lang, doc_id in rows:
        strata[lang].append(doc_id)
    n = sum(len(v) for v in strata.values())
    out = {}
    for lang, ids in strata.items():
        n_h = len(ids)
        n_target = max(1, n_h * 64 // n)
        chosen = sorted(ids, key=lambda d: (_md5_long(f"ss:{d}"), d))[:n_target]
        checksum = sum(_md5_long(f"ss:{d}") % 1000000007 for d in chosen)
        out[lang] = (n_h, n_target, checksum)
    return out


def test_x88_matches_python_model(spark):
    model = _strata_model()
    got = {r["lang"]: r for r in _rows(spark, "x88_stratified_sample")}
    assert set(got) == set(model)
    for lang, (n_h, n_target, checksum) in model.items():
        r = got[lang]
        assert r["n_stratum"] == n_h
        assert r["n_target"] == n_target
        assert r["n_sampled"] == n_target  # exact allocation, not expected
        assert r["sample_checksum"] == checksum


def test_x88_allocation_is_exact_and_proportional(spark):
    rows = _rows(spark, "x88_stratified_sample")
    total = sum(r["n_stratum"] for r in rows)
    for r in rows:
        assert r["n_sampled"] == r["n_target"] <= r["n_stratum"]
        # proportionality within the integer-floor band
        lo = r["n_stratum"] * 64 // total
        assert r["n_target"] == max(1, lo)


# ---------------------------------------------------------------------------
# x90 — NDCG/MRR ranking eval
# ---------------------------------------------------------------------------


def test_x90_matches_python_model(spark):
    rows = _duck_embed("SELECT vec_id, embedding, label FROM embeddings")
    by_id = {vid: (emb, lab) for vid, emb, lab in rows}
    label_count = Counter(lab for _, _, lab in rows)
    W = [round(1e6 / math.log2(i + 1)) for i in range(1, 11)]
    WCUM = [sum(W[: i + 1]) for i in range(10)]

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        return s

    model = {}
    for ranker in ("cosine", "dot"):
        ndcgs, rrs, perfect = [], [], 0
        for qid, (q, qlab) in by_id.items():
            if qid % 25 != 0:
                continue
            scored = []
            for vid, (emb, lab) in by_id.items():
                if vid == qid:
                    continue
                d = dot(q, emb)
                key = (
                    d / ((dot(q, q) ** 0.5) * (dot(emb, emb) ** 0.5))
                    if ranker == "cosine"
                    else d
                )
                scored.append((-key, vid, lab))
            scored.sort()
            top = scored[:10]
            dcg = sum(
                W[i] for i, (_, _, lab) in enumerate(top) if lab == qlab
            )
            rr = max(
                (round(1e6 / (i + 1)) for i, (_, _, lab) in enumerate(top)
                 if lab == qlab),
                default=0,
            )
            idcg = WCUM[min(label_count[qlab] - 1, 10) - 1]
            ndcgs.append(dcg / idcg)
            rrs.append(rr)
            perfect += dcg == idcg
        model[ranker] = (
            len(ndcgs),
            sum(ndcgs) / len(ndcgs),
            sum(rrs) / (len(rrs) * 1e6),
            perfect,
        )
    got = {r["ranker"]: r for r in _rows(spark, "x90_ndcg_eval")}
    assert set(got) == set(model)
    for ranker, (n, ndcg, mrr, perfect) in model.items():
        r = got[ranker]
        assert r["n_queries"] == n
        assert r["mean_ndcg"] == pytest.approx(ndcg, abs=1e-6)
        assert r["mean_mrr"] == pytest.approx(mrr, abs=1e-6)
        assert r["n_perfect"] == perfect
        assert 0.0 <= r["mean_ndcg"] <= 1.0
        assert 0.0 <= r["mean_mrr"] <= 1.0


def _duck_embed(sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    return con.execute(sql).fetchall()


# ---------------------------------------------------------------------------
# x91 — char entropy filter
# ---------------------------------------------------------------------------


def test_x91_matches_python_model(spark):
    docs = _duck("SELECT doc_id, text FROM documents WHERE length(text) > 0")
    bands = defaultdict(lambda: [0, 0, 10**18, -(10**18)])
    for _doc, text in docs:
        counts = Counter(text)
        n = sum(counts.values())
        ent_us = sum(
            round(-(c / n) * math.log(c / n) * 1e6) for c in counts.values()
        )
        band = (
            "too_repetitive"
            if ent_us < 2_700_000
            else ("noise_like" if ent_us > 2_900_000 else "keep")
        )
        b = bands[band]
        b[0] += 1
        b[1] += ent_us
        b[2] = min(b[2], ent_us)
        b[3] = max(b[3], ent_us)
    got = {r["band"]: r for r in _rows(spark, "x91_char_entropy_filter")}
    assert set(got) == set(bands)
    for band, (n, tot, mn, mx) in bands.items():
        r = got[band]
        assert r["n_docs"] == n
        assert r["mean_entropy_nats"] == pytest.approx(tot / n / 1e6, abs=1e-6)
        assert r["min_entropy"] == pytest.approx(mn / 1e6, abs=1e-6)
        assert r["max_entropy"] == pytest.approx(mx / 1e6, abs=1e-6)


# ---------------------------------------------------------------------------
# x92 — BPE merge loop
# ---------------------------------------------------------------------------


def test_x92_matches_python_bpe(spark):
    import re

    docs = _duck("SELECT text FROM documents")
    vocab = Counter()
    for (text,) in docs:
        # NORM: lowercase + collapse non-alnum to single spaces (the
        # shared dedup normalizer); reuse its behavior via the corpus
        # words that survive the engine's own filter
        norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
        for w in norm.split():
            if len(w) >= 3:
                vocab[w] += 1
    reps = {f" {' '.join(w)} ": n for w, n in vocab.items()}
    want = []
    for rnd in (1, 2, 3):
        counts = Counter()
        for rep, n in reps.items():
            syms = rep.split()
            for a, b in zip(syms, syms[1:]):
                counts[f"{a} {b}"] += n
        best, cnt = min(
            ((p, c) for p, c in counts.items()),
            key=lambda pc: (-pc[1], pc[0]),
        )
        merged = best.replace(" ", "")
        new_reps = defaultdict(int)
        for rep, n in reps.items():
            new_reps[rep.replace(f" {best} ", f" {merged} ")] += n
        reps = dict(new_reps)
        n_symbols = len({s for rep in reps for s in rep.split()})
        want.append((rnd, best, cnt, n_symbols))
    got = [
        (r["merge_round"], r["merged_pair"], r["pair_count"], r["n_symbols"])
        for r in sorted(
            _rows(spark, "x92_bpe_merge_loop"),
            key=lambda r: r["merge_round"],
        )
    ]
    assert got == want


# ---------------------------------------------------------------------------
# x93 — centroid silhouette
# ---------------------------------------------------------------------------


def test_x93_matches_python_model(spark):
    rows = _duck_embed("SELECT vec_id, embedding FROM embeddings")
    cents = [(vid, emb) for vid, emb in rows if vid < 16]

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        return s

    stats = defaultdict(lambda: [0, 0.0, 0.0, 0.0])
    for vid, emb in rows:
        en = dot(emb, emb) ** 0.5
        cos = sorted(
            (
                (-dot(emb, c) / (en * dot(c, c) ** 0.5), cid)
                for cid, c in cents
            )
        )
        (nc1, cid1), (nc2, _cid2) = cos[0], cos[1]
        a, b = 1.0 + nc1, 1.0 + nc2
        s = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        st = stats[cid1]
        st[0] += 1
        st[1] += s
        st[2] += a
        st[3] += b
    got = {r["cluster_id"]: r for r in _rows(spark, "x93_cluster_silhouette")}
    assert set(got) == set(stats)
    for cid, (n, s_sum, a_sum, b_sum) in stats.items():
        r = got[cid]
        assert r["n_members"] == n
        assert r["mean_silhouette"] == pytest.approx(s_sum / n, abs=1e-6)
        assert r["mean_own_dist"] == pytest.approx(a_sum / n, abs=1e-6)
        assert r["mean_next_dist"] == pytest.approx(b_sum / n, abs=1e-6)
        # own centroid is the argmax: a <= b always, so s >= 0
        assert r["mean_silhouette"] >= 0.0
        assert r["mean_own_dist"] <= r["mean_next_dist"] + 1e-12


# ---------------------------------------------------------------------------
# x94 — greedy max coverage
# ---------------------------------------------------------------------------


def test_x94_matches_python_greedy(spark):
    import re

    docs = _duck("SELECT doc_id, text FROM documents")
    shingles = {}
    for doc_id, text in docs:
        if _md5_long(f"mc:{doc_id}") % 5 != 0:
            continue
        norm = re.sub(r"\s+", " ", text.strip()).lower()
        w = norm.split(" ")
        if len(w) >= 3:
            shingles[doc_id] = {
                " ".join(w[i : i + 3]) for i in range(len(w) - 2)
            }
    covered = set()
    picked = set()
    want = []
    for rnd in (1, 2, 3, 4):
        best = min(
            (
                (-len(sh - covered), did)
                for did, sh in shingles.items()
                if did not in picked and len(sh - covered) > 0
            )
        )
        gain, did = -best[0], best[1]
        picked.add(did)
        covered |= shingles[did]
        want.append((rnd, did, gain, len(covered)))
    got = [
        (r["round"], r["picked_doc"], r["gain"], r["covered_total"])
        for r in sorted(_rows(spark, "x94_greedy_coverage"), key=lambda r: r["round"])
    ]
    assert got == want


def test_x94_gains_are_diminishing(spark):
    """Submodularity: greedy marginal gains never increase."""
    rows = sorted(_rows(spark, "x94_greedy_coverage"), key=lambda r: r["round"])
    gains = [r["gain"] for r in rows]
    assert gains == sorted(gains, reverse=True)
    # covered_total is the running sum of gains (disjoint new shingles)
    total = 0
    for r in rows:
        total += r["gain"]
        assert r["covered_total"] == total


# ---------------------------------------------------------------------------
# x97 — hashed BoW source similarity
# ---------------------------------------------------------------------------


def test_x97_matches_python_model(spark):
    import re

    docs = _duck("SELECT source, text FROM documents")
    vecs = defaultdict(lambda: defaultdict(int))
    for src, text in docs:
        for tok in re.findall(r"[a-z0-9]+", text.lower()):
            vecs[src][_md5_long(f"fh:{tok}") % 64] += 1
    sources = sorted(vecs)
    want = {}
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            shared = set(vecs[a]) & set(vecs[b])
            dot = sum(vecs[a][k] * vecs[b][k] for k in shared)
            na = sum(c * c for c in vecs[a].values()) ** 0.5
            nb = sum(c * c for c in vecs[b].values()) ** 0.5
            want[(a, b)] = (len(shared), dot / (na * nb))
    got = {
        (r["source_a"], r["source_b"]): (r["shared_buckets"], r["cosine"])
        for r in _rows(spark, "x97_hashed_bow_source_sim")
    }
    assert set(got) == set(want)
    for key, (shared, cos) in want.items():
        assert got[key][0] == shared
        assert got[key][1] == pytest.approx(cos, abs=1e-6)
        assert 0.0 <= got[key][1] <= 1.0


# ---------------------------------------------------------------------------
# x98 — content-defined chunking
# ---------------------------------------------------------------------------


def test_x98_matches_python_model(spark):
    import re

    docs = _duck("SELECT doc_id, text FROM documents")
    n_docs = n_chunks = total_len = 0
    hashes = set()
    for doc_id, text in docs:
        t = re.sub(r"\s+", " ", text.strip()).lower()
        if len(t) < 8:
            continue
        n_docs += 1
        # boundaries AFTER position p (1-based) where window hash folds to 0
        bounds = [
            p
            for p in range(8, len(t) + 1)
            if _md5_long(f"cdc:{t[p - 8:p]}") % 64 == 0
        ]
        starts = [8] + [p + 1 for p in bounds if p + 1 <= len(t)]
        # chunk k spans positions [start_k, next_bound]; reconstruct via
        # the same min/max-position arithmetic as the query
        chunk_positions = {}
        cum = 0
        bset = set(bounds)
        for p in range(8, len(t) + 1):
            chunk_positions.setdefault(cum, []).append(p)
            if p in bset:
                cum += 1
        for _idx, ps in chunk_positions.items():
            lo, hi = min(ps), max(ps)
            chunk = t[lo - 8 : hi]
            n_chunks += 1
            total_len += hi - lo + 8
            hashes.add(hashlib.md5(chunk.encode()).hexdigest())
    (row,) = _rows(spark, "x98_cdc_chunking")
    assert row["n_docs"] == n_docs
    assert row["n_chunks"] == n_chunks
    assert row["mean_chunk_len"] == pytest.approx(total_len / n_chunks, abs=1e-6)
    assert row["distinct_chunks"] == len(hashes)
    assert row["dup_chunk_fraction"] == pytest.approx(
        1 - len(hashes) / n_chunks, abs=1e-6
    )
    # CDC exists to expose duplication — some chunk mass must repeat
    # even at the smallest fixture
    assert row["dup_chunk_fraction"] > 0.0
