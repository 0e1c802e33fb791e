"""Contract tests for the session-level index registry.

The registry amortizes per-corpus artifacts (MinHash signatures, LSH
postings, component labels) across queries via eager localCheckpoints.
localCheckpoint blocks die with their executor, so on a real cluster a
preempted node would otherwise fail every downstream consumer with
CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND and no recompute path. These tests
pin the failure story: a hit whose blocks are gone is detected by the
driver-side storage health check, evicted, and rebuilt once — the next
consumer answers correctly. Also pinned: hits are amortized (same
object back), the scope LRU keeps two corpora warm (the suite
alternates sf0.001/sf0.01), and concurrent consumers share one build.
"""

from __future__ import annotations

import threading

import pytest

from calaveras_uniteus_etl_spark.plans import _session_index as si
from calaveras_uniteus_etl_spark.plans._session_index import (
    session_index,
    session_index_clear,
    session_index_peek,
)

SF = "/root/testdata/sf0.001"


def _leaf_rdd(df):
    leaves = df._jdf.queryExecution().analyzed().collectLeaves()
    assert leaves.size() == 1
    leaf = leaves.apply(0)
    assert leaf.getClass().getSimpleName() == "LogicalRDD"
    return leaf.rdd()


def _ckpt(spark, n, tag):
    return (
        spark.range(n)
        .selectExpr("id", f"id * 2 as v_{tag}")
        .localCheckpoint(eager=True)
    )


@pytest.fixture(autouse=True)
def _fresh_registry():
    session_index_clear()
    yield
    session_index_clear()


def test_hit_is_amortized_and_peekable(spark):
    builds = []

    def build():
        builds.append(1)
        return _ckpt(spark, 100, "a")

    first = session_index(spark, SF, "t_artifact", build)
    again = session_index(spark, SF, "t_artifact", build)
    assert again is first and len(builds) == 1
    assert session_index_peek(spark, SF, "t_artifact") is first
    assert session_index_peek(spark, SF, "t_missing") is None


def test_lost_blocks_trigger_one_rebuild(spark):
    """Simulate executor loss: unpersist the checkpoint blocks out from
    under a cached entry. The next consumer must get a rebuilt artifact
    that answers correctly — not CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND."""
    builds = []

    def build():
        builds.append(1)
        return _ckpt(spark, 1000, "b")

    df = session_index(spark, SF, "t_lossy", build)
    want = df.count()
    _leaf_rdd(df).unpersist(True)  # executor death: blocks vanish

    rebuilt = session_index(spark, SF, "t_lossy", build)
    assert rebuilt is not df and len(builds) == 2
    assert rebuilt.count() == want
    # healthy again: no further rebuilds
    assert session_index(spark, SF, "t_lossy", build) is rebuilt
    assert len(builds) == 2


def test_lost_blocks_detected_on_tuple_artifacts(spark):
    def build():
        return (_ckpt(spark, 50, "c"), _ckpt(spark, 60, "d"))

    a1, b1 = session_index(spark, SF, "t_tuple", build)
    _leaf_rdd(b1).unpersist(True)  # lose only the SECOND member
    a2, b2 = session_index(spark, SF, "t_tuple", build)
    assert (a2, b2) != (a1, b1)
    assert a2.count() == 50 and b2.count() == 60


def test_lost_blocks_detected_under_projection(spark):
    # _neardup_labels_build returns a select() OVER its checkpoint —
    # the leaf walk must still find the checkpoint RDD underneath.
    def build():
        return _ckpt(spark, 40, "e").selectExpr("id")

    df = session_index(spark, SF, "t_proj", build)
    assert df.count() == 40
    _leaf_rdd(df).unpersist(True)
    assert session_index(spark, SF, "t_proj", build).count() == 40


def test_scope_lru_keeps_two_corpora_warm(spark):
    built = []

    def build(tag):
        built.append(tag)
        return _ckpt(spark, 10, "f")

    session_index(spark, "/corpus/one", "art", lambda: build("one"))
    session_index(spark, "/corpus/two", "art", lambda: build("two"))
    # alternating between two corpora must NOT thrash (pre-r08 the
    # registry evicted all other scopes on every miss)
    session_index(spark, "/corpus/one", "art", lambda: build("one*"))
    session_index(spark, "/corpus/two", "art", lambda: build("two*"))
    assert built == ["one", "two"]
    # a third corpus evicts the least-recently-used (one), keeps two
    session_index(spark, "/corpus/three", "art", lambda: build("three"))
    assert session_index_peek(spark, "/corpus/one", "art") is None
    assert session_index_peek(spark, "/corpus/two", "art") is not None


def test_concurrent_consumers_share_one_build(spark):
    builds = []
    barrier = threading.Barrier(4)
    results = []

    def build():
        builds.append(1)
        return _ckpt(spark, 20, "g")

    def consume():
        barrier.wait()
        results.append(session_index(spark, SF, "t_conc", build))

    threads = [threading.Thread(target=consume) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(builds) == 1
    assert all(r is results[0] for r in results)


def test_lost_blocks_end_to_end_registry_consumer(spark):
    """The receipt for the cluster-scale failure story: a registry
    query builds the signature index, the index's blocks are lost
    (executor death), and the NEXT invocation of the query rebuilds
    transparently and returns the identical answer."""
    from calaveras_uniteus_etl_spark.plans import REGISTRY

    fn = REGISTRY["x110_lsh_band_planner"].fn
    want = sorted(map(tuple, fn(spark, SF).collect()))
    sigs = session_index_peek(spark, SF, "minhash_sigs")
    assert sigs is not None
    _leaf_rdd(sigs).unpersist(True)  # executor death
    got = sorted(map(tuple, fn(spark, SF).collect()))
    assert got == want
    rebuilt = session_index_peek(spark, SF, "minhash_sigs")
    assert rebuilt is not None and rebuilt is not sigs


def test_reliable_checkpoint_mode(spark, tmp_path, monkeypatch):
    """With SPARK_GRAFT_INDEX_CHECKPOINT_DIR set, artifacts materialize
    as RELIABLE (file-backed) checkpoints: they survive executor loss
    outright, so the block health check deliberately skips them (no
    rebuild churn), and the files land on the configured store."""
    ckpt = tmp_path / "ckpt"
    monkeypatch.setenv("SPARK_GRAFT_INDEX_CHECKPOINT_DIR", str(ckpt))

    def build():
        return si.materialize(spark.range(30).selectExpr("id", "id * 3 as v"))

    df = session_index(spark, SF, "t_reliable", build)
    assert df.count() == 30
    key = (spark.sparkContext.applicationId, SF, "t_reliable")
    assert si._LEAF_RDDS[key] == []  # file-backed: exempt from health check
    assert session_index(spark, SF, "t_reliable", build) is df
    parts = [p for p in ckpt.rglob("*") if p.is_file()]
    assert parts, "no checkpoint files written to the reliable store"


def test_registry_artifacts_carry_health_info(spark):
    """The real index builds must register their leaf RDDs for the
    health check — an artifact with no captured leaves silently opts
    out of the lost-block rebuild path."""
    from calaveras_uniteus_etl_spark.plans.queries_dedup import (
        _lsh_pair_matches,
        _neardup_labels,
        _sigs_index,
    )
    from calaveras_uniteus_etl_spark.plans.queries_similarity import _vec_index

    _sigs_index(spark, SF)
    _lsh_pair_matches(spark, SF)
    _neardup_labels(spark, SF)
    _vec_index(spark, SF)
    for key, infos in si._LEAF_RDDS.items():
        assert infos, f"no leaf RDDs captured for {key}"
        assert all(nparts > 0 for _, nparts in infos)
    names = {k[2] for k in si._CACHE}
    assert {
        "minhash_sigs",
        "lsh_pair_nm",
        "neardup_labels",
        "embedding_index",
    } <= names
