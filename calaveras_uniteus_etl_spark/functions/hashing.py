"""Deterministic, cross-engine hash primitives.

``salted_sha256`` re-expresses the reference's PHI hashing — its only
custom scalar function (``hash_value``, /root/reference/core/config.py:
225-243: ``sha256(salt + value + salt)`` hexdigest) — with Spark
built-ins, so no Python UDF is needed.

``md5_long`` is the engine's portable 60-bit hash: the first 15 hex
chars of ``md5`` parsed as an integer. It is reproducible in any engine
with an ``md5`` function (DuckDB oracle included), unlike Spark's
``hash()``/``xxhash64`` whose seeds/algorithms are engine-private. The
MinHash / SimHash / LSH operators build on it so their outputs are
hash-checkable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def salted_sha256(col: Column | str, salt: str) -> Column:
    """PHI-safe salted hash: ``sha256(salt || value || salt)``.

    Mirrors the reference's skip rules: NULL / empty / literal ``'nan'``
    values pass through unhashed (/root/reference/core/etl_service.py:
    720-739).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNull() | (c == F.lit("")) | (F.lower(c) == F.lit("nan")), c
    ).otherwise(F.sha2(F.concat(F.lit(salt), c, F.lit(salt)), 256))


def md5_long(col: Column | str) -> Column:
    """First 15 hex chars of md5 as a non-negative 60-bit long."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_seeded(col: Column | str, seed: int) -> Column:
    """Seeded variant: independent hash family member per seed.

    Prepending the seed re-keys md5, giving the k independent hash
    functions MinHash needs (one permutation per seed).
    """
    c = F.col(col) if isinstance(col, str) else col
    return md5_long(F.concat(F.lit(f"{seed}:"), c))


def duckdb_md5_long_sql(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`md5_long` over ``expr``.

    DuckDB has no hex→int conversion function, so fold the hex digits:
    verified to produce values identical to Spark's
    ``conv(substr(md5(x),1,15),16,10)``.
    """
    return (
        "list_reduce(list_transform("
        f"string_split_regex(substr(md5({expr}), 1, 15), ''), "
        "x -> strpos('0123456789abcdef', x) - 1), (a, b) -> a * 16 + b)"
    )


def duckdb_md5_long_seeded_sql(expr: str, seed: int) -> str:
    """DuckDB SQL equivalent of :func:`md5_long_seeded`."""
    return duckdb_md5_long_sql(f"'{seed}:' || {expr}")


def duckdb_md5_long_flat_sql(md5_expr: str) -> str:
    """Lambda-free DuckDB twin of :func:`md5_long` over a *hex* column.

    ``duckdb_md5_long_sql`` builds per-row lists and folds them with
    lambdas — fine at report grain, ~3× slower than plain expressions
    when an oracle evaluates it per character position (x105). This
    variant takes an expression yielding the md5 HEX STRING (compute
    ``md5(x)`` once in an inner SELECT) and expands the 15-digit fold
    into a static vectorizable polynomial. Verified equal to the
    lambda fold digit-for-digit.
    """
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({md5_expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (14 - i)}"
        for i in range(15)
    )
