"""Session-level index registry for corpus-derived artifacts.

A production engine builds its per-corpus indexes (LSH signatures,
bucket postings, connected-component labels, embedding featurizations)
ONCE and amortizes them across every query that follows; rebuilding
them per query is the real anti-pattern at 100 TB — each rebuild
re-reads and re-hashes the whole corpus. This registry is that
amortization point: artifacts are eagerly-materialized DataFrames
(localCheckpoint), keyed by (Spark application, corpus dir, artifact
name).

Deliberately NOT the session CacheManager: cached plans would be
substituted into other queries' physical plans and the entries would
need explicit unpersist bookkeeping. Checkpointed RDDs pinned here are
plain leaf relations; replacing an entry drops the reference and the
ContextCleaner reclaims the blocks.

Memory bound: entries for any other (application, corpus) pair are
evicted whenever a new corpus is indexed, so at most one corpus'
artifacts are ever held. The driver's test corpora are immutable, so
keying by directory is exact; a deployment over mutable data adds a
snapshot/version component to the key.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import SparkSession

_CACHE: dict[tuple[str, str, str], Any] = {}


def session_index(
    spark: SparkSession, sf_dir: str, name: str, build: Callable[[], Any]
) -> Any:
    """Return the artifact `name` for (session, corpus), building once.

    `build` must return an eagerly-materialized relation (or tuple of
    relations) — typically `.localCheckpoint(eager=True)` — so every
    consumer reads a lineage-free leaf.
    """
    scope = (spark.sparkContext.applicationId, sf_dir)
    key = (*scope, name)
    hit = _CACHE.get(key)
    if hit is None:
        hit = build()
        for stale in [k for k in _CACHE if (k[0], k[1]) != scope]:
            del _CACHE[stale]
        _CACHE[key] = hit
    return hit
