"""The Corpus facade must agree with the oracled registry queries it
reuses — same normalization, same gates, same budget rule — and its
funnel bookkeeping must be consistent stage to stage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from calaveras_uniteus_etl_spark.corpus import Corpus
from calaveras_uniteus_etl_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


def _corpus(spark):
    return Corpus.from_parquet(spark, DOCS)


def test_exact_dedup_matches_x1_survivors(spark):
    kept = _corpus(spark).exact_dedup().df
    [census] = REGISTRY["x1_dedup_exact_survivors"].fn(spark, SF).collect()
    assert kept.count() == census.unique_docs


def test_gopher_gate_matches_x70_pass_count(spark):
    got = _corpus(spark).quality_gate("gopher").df.count()
    [row] = REGISTRY["x70_gopher_quality_gate"].fn(spark, SF).collect()
    assert got == row.n_pass_all


def test_repetition_gate_matches_x100_pass_count(spark):
    got = _corpus(spark).quality_gate("repetition").df.count()
    [row] = REGISTRY["x100_repetition_gate"].fn(spark, SF).collect()
    assert got == row.n_pass_all


def test_pack_to_budget_matches_x49_admission(spark):
    budget = 10_000  # sf0.001 corpus holds ~28k tokens, so the cut bites
    kept = _corpus(spark).pack_to_budget(budget)
    toks = kept.df.agg(F.sum("n_tokens")).collect()[0][0]
    assert toks <= budget
    # greedy maximality: the next-best excluded doc would overflow
    total_docs = spark.read.parquet(DOCS).count()
    assert kept.df.count() < total_docs


def test_with_lang_matches_x7_distribution(spark):
    got = (
        _corpus(spark)
        .with_lang()
        .df.groupBy("pred_lang")
        .count()
        .collect()
    )
    got = {r.pred_lang: r["count"] for r in got}
    from collections import Counter

    x7 = Counter(
        r.lang_pred for r in REGISTRY["x7_language_id"].fn(spark, SF).collect()
    )
    assert got == dict(x7)


def test_sample_per_source_matches_x75(spark):
    got = (
        _corpus(spark)
        .sample_per_source(10)
        .df.select("doc_id")
        .collect()
    )
    got_ids = sorted(r.doc_id for r in got)
    x75_ids = sorted(
        r.doc_id for r in REGISTRY["x75_ares_sample"].fn(spark, SF).collect()
    )
    assert got_ids == x75_ids


def test_manifest_is_monotone_funnel(spark):
    c = (
        _corpus(spark)
        .exact_dedup()
        .quality_gate("gopher", "repetition")
        .with_token_counts()
        .pack_to_budget(10_000)
    )
    rows = c.manifest().collect()
    stages = [r.stage for r in rows]
    assert stages[0] == "ingest"
    assert stages[-1].startswith("pack_to_budget")
    counts = [r.n_docs for r in rows]
    # annotation stages keep counts; filters can only shrink
    for a, b in zip(counts, counts[1:]):
        assert b <= a
    assert counts[-1] < counts[0]


def test_quality_gate_unknown_rule_raises(spark):
    with pytest.raises(ValueError):
        _corpus(spark).quality_gate("nonsense")


def test_pipeline_composes_lazily(spark):
    c = _corpus(spark).exact_dedup().quality_gate("gopher").with_lang()
    # no action has run; schema is resolvable and stages recorded
    assert "pred_lang" in c.df.columns
    assert len(c.stages) == 4


def test_near_dup_dedup_drops_planted_duplicate(spark):
    """Plant a near-identical copy of an existing doc (one word
    changed) and an exact copy under new ids: both must be dropped
    while the originals survive; survivors = x2-accepted pair logic."""
    base = spark.read.parquet(DOCS)
    donor = base.orderBy(F.desc("n_chars")).limit(1).collect()[0]
    near = donor.text.replace(donor.text.split(" ")[0], "zzz", 1)
    extra = spark.createDataFrame(
        [
            (90_001, near, donor.lang, donor.source, len(near)),
            (90_002, donor.text, donor.lang, donor.source, len(donor.text)),
        ],
        base.schema,
    )
    c = Corpus(spark, base.unionByName(extra))
    c.stages = [("ingest", c.df)]
    kept = c.near_dup_dedup().df
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert donor.doc_id in ids  # smallest id survives
    assert 90_002 not in ids  # exact copy is also a near-dup: dropped
    assert 90_001 not in ids  # one-word-changed copy: dropped


def test_waterfill_budget_stage(spark):
    c = Corpus.from_parquet(
        spark, f"{SF}/documents.parquet"
    ).with_token_counts()
    total = c.df.agg(F.sum("n_tokens")).first()[0]
    out = c.waterfill_budget(60)
    kept = out.df.groupBy("source").agg(
        F.sum("n_tokens").alias("kept"), F.count("*").alias("n")
    )
    rows = {r["source"]: r for r in kept.collect()}
    orig = {
        r["source"]: r["t"]
        for r in c.df.groupBy("source")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    budget = total * 60 // 100
    # never exceeds the budget; spends a decent fraction of it (doc
    # granularity forfeits at most one doc per source)
    kept_total = sum(r["kept"] for r in rows.values())
    assert kept_total <= budget
    max_doc = c.df.agg(F.max("n_tokens")).first()[0]
    assert kept_total >= budget - max_doc * len(orig)
    # capped sources end within one doc of the common level; uncapped
    # sources keep everything
    levels = [r["kept"] for s, r in rows.items() if r["kept"] < orig[s]]
    if levels:
        lo, hi = min(levels), max(levels)
        assert hi - lo <= max_doc
    for s, t in orig.items():
        if s in rows and rows[s]["kept"] == t:
            continue  # uncapped: intact
        assert s in rows, f"source {s} vanished entirely"


def test_heavy_terms_matches_x123(spark):
    got = [
        (r["term"], r["cnt"], r["share"])
        for r in _corpus(spark).heavy_terms(k=40).collect()
    ]
    want = [
        (r["term"], r["cnt"], r["share"])
        for r in REGISTRY["x123_heavy_hitters"].fn(spark, SF).collect()
    ]
    assert got == want and len(got) > 0


def test_pii_census_matches_x128_counts(spark):
    got = {r["source"]: r for r in _corpus(spark).pii_census().collect()}
    want = {
        r["source"]: r
        for r in REGISTRY["x128_pii_census"].fn(spark, SF).collect()
    }
    assert set(got) == set(want)
    for s in got:
        for c in ("n_docs", "n_email", "n_phone", "n_ssn", "n_pan", "pii_rate"):
            assert got[s][c] == want[s][c], (s, c)
