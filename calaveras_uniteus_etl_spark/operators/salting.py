"""Skew-proof equi-join via key salting (the e11/m5 companion API).

A shuffle join on a skewed key sends every row of the hottest key to
ONE reducer; at 100 TB the job is as slow as that one task. Salting
splits each hot key into ``n_salts`` sub-keys: the fact side derives a
deterministic salt from a unique column (md5-based, engine-neutral —
never Spark-private ``hash()``), the dimension side replicates each
row across all salts with a constant-width explode, and the join key
becomes ``(key, salt)`` — the hot key's rows now land on ``n_salts``
reducers. Dimension-side cost is ``n_salts×`` replication, which is
why this targets the fact⋈dim shape with a skewed FACT key; for
dim-sized sides a plain broadcast is strictly better, and AQE's
skew-join handles moderate cases automatically — reach for explicit
salting when the skew is extreme and known (m5_join_key_skew_audit is
the measurement that decides).

Used by e11_salted_skew_join (plans/queries_joins.py) and the salted
two-stage aggregation (f17); reference scale concern:
core/app.py's hottest report joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def fact_salt(unique_col: str, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from a unique fact column
    (md5-derived 60-bit value mod n — engine-neutral, uniform)."""
    return F.expr(
        f"cast(conv(substr(md5(cast({unique_col} as string)), 1, 15), 16, 10)"
        f" as bigint) % {n_salts}"
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_from: str,
    n_salts: int = 8,
    use_shuffle_hash_hint: bool = True,
) -> DataFrame:
    """Inner-join ``fact`` to ``dim`` on ``fact_key = dim_key`` with the
    shuffle spread across ``n_salts`` sub-partitions per key.

    ``salt_from`` is a unique (or near-unique) fact column the salt is
    derived from. The shuffle_hash hint skips the sort-merge sort —
    with salting the per-reducer slices are bounded, which is exactly
    when hash join is safe. Result rows are identical to the unsalted
    join; only the physical distribution changes.
    """
    salted = fact.withColumn(SALT_COL, fact_salt(salt_from, n_salts))
    exploded = dim.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    left = salted.hint("shuffle_hash") if use_shuffle_hash_hint else salted
    return left.join(
        exploded,
        (salted[fact_key] == exploded[dim_key])
        & (salted[SALT_COL] == exploded[SALT_COL]),
    ).drop(SALT_COL)
