"""Random-hyperplane LSH for embedding similarity (scale path).

Brute-force cosine top-k (plans/queries_similarity.py) is exact but
O(probes × corpus). The scale path buckets vectors by sign-random-
projection: T hash tables, each hashing a vector to a P-bit bucket
(bit p = sign of the dot product with a fixed random hyperplane).
Similar vectors collide with probability 1 − θ/π per bit, so searching
only same-bucket candidates trades recall for a corpus-size-independent
candidate set — the standard SRP-LSH construction (Charikar 2002).

Determinism contract: hyperplane entries are ±1 Rademacher signs
derived from md5 of "plane:dim" (computed once here with hashlib, then
inlined as literals into BOTH the Spark plan and the DuckDB oracle), so
the same buckets fall out of both engines bit-for-bit. Dot products are
left-fold sums of float→double-exact products — Spark's ``aggregate``
and DuckDB's ``list_reduce`` associate identically, so even near-zero
dots sign-match.

Scale notes: bucketing is a narrow projection (no shuffle); the
candidate join shuffles on (table, bucket) — small ints, never the
vector payload twice (the probe side is broadcast-sized); tune T and P
for the recall/cost point (T tables multiply recall, P bits divide
candidate volume by ~2^P).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

EMBED_DIM = 64
N_TABLES = 8
N_PLANES = 4  # bits per table → 2^4 buckets/table


def _sign(plane: int, dim: int) -> float:
    h = int(hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()[:15], 16)
    return 1.0 if h % 2 == 1 else -1.0


def plane_signs(plane: int) -> list[float]:
    """Deterministic ±1 hyperplane; identical in engine and oracle."""
    return [_sign(plane, i) for i in range(EMBED_DIM)]


# --- Spark side ------------------------------------------------------------


def _dot_signs_spark(vec_col: str, signs: list[float]) -> str:
    lits = ", ".join(f"{s:.1f}D" for s in signs)
    return (
        f"aggregate(zip_with({vec_col}, array({lits}), (x, y) -> cast(x as double) * y), "
        "cast(0 as double), (acc, v) -> acc + v)"
    )


def bucket_expr(table_idx: int, vec_col: str = "embedding") -> Column:
    """P-bit bucket id of `vec_col` under hash table `table_idx`."""
    bits = " + ".join(
        f"(case when {_dot_signs_spark(vec_col, plane_signs(table_idx * N_PLANES + p))} > 0 "
        f"then {1 << p} else 0 end)"
        for p in range(N_PLANES)
    )
    return F.expr(bits)


def buckets_array_expr(vec_col: str = "embedding") -> Column:
    """Array of all T bucket ids (posexplode → (table, bucket) rows)."""
    return F.array(*[bucket_expr(t, vec_col) for t in range(N_TABLES)])


# --- DuckDB oracle side ----------------------------------------------------


def _dot_signs_duck(vec_expr: str, signs: list[float]) -> str:
    lits = ", ".join(f"{s:.1f}" for s in signs)
    return (
        f"list_reduce(list_transform(range({EMBED_DIM}), "
        f"i -> CAST({vec_expr}[i+1] AS DOUBLE) * ([{lits}])[i+1]), (a, b) -> a + b)"
    )


def duck_bucket_sql(table_idx: int, vec_expr: str = "embedding") -> str:
    return " + ".join(
        f"(CASE WHEN {_dot_signs_duck(vec_expr, plane_signs(table_idx * N_PLANES + p))} > 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )


def duck_buckets_list_sql(vec_expr: str = "embedding") -> str:
    return "[" + ", ".join(duck_bucket_sql(t, vec_expr) for t in range(N_TABLES)) + "]"
