"""Near-duplicate detection building blocks (training-data pipeline).

The reference has only exact-identity dedup (file-level md5 skip,
/root/reference/core/etl_service.py:364-370); the near-dup family here
is the driver's north-star extension for 100 TB corpus curation:

- word n-gram shingling → **MinHash** signatures → **LSH band join**
  (candidate pairs without the O(n²) cross product);
- **SimHash** bit-vote fingerprints → banded hamming join;
- exact **n-gram Jaccard** via an inverted shingle index join.

Everything is built from Spark built-in expressions (higher-order array
functions + md5) — no Python UDFs, whole-stage-codegen friendly — and
every builder has a DuckDB SQL twin generated from the *same*
parameters, so each stage is oracle-checkable bit-for-bit. The hash
primitive is ``md5_long`` (functions/hashing.py): engine-neutral,
unlike Spark's private ``hash()``/``xxhash64`` seeds.

Scale notes (the reason for this shape):

- the LSH band join shuffles on ``(band, band_key)`` — tiny keys, never
  the document text; candidate volume is controlled by (bands × rows),
  not corpus size;
- the inverted-index Jaccard join shuffles on the shingle digest; at
  real scale you cap posting lists (drop shingles with document
  frequency above a threshold) — stop-shingles contribute almost no
  discrimination but quadratic pair volume;
- signatures are fixed-width arrays (K longs), so the self-join carries
  O(K) bytes per row regardless of document length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from calaveras_uniteus_etl_spark.functions.hashing import duckdb_md5_long_sql

# Shared parameters — the Spark plans and DuckDB oracles are generated
# from these, so they can never drift apart.
SHINGLE_WORDS = 3
MINHASH_K = 12
LSH_BANDS = 4
LSH_ROWS = 3  # BANDS * ROWS == MINHASH_K
SIMHASH_BITS = 32
SIMHASH_BYTE_BANDS = 4

assert LSH_BANDS * LSH_ROWS == MINHASH_K

# ---------------------------------------------------------------------------
# Normalization + shingling
# ---------------------------------------------------------------------------

# Spark SQL and DuckDB SQL twins. Both: lowercase, collapse whitespace,
# split into words, build distinct word-3-shingles (documents shorter
# than the shingle width fall back to the whole normalized text).
NORM_SPARK = r"lower(regexp_replace(trim({col}), '\\s+', ' '))"
NORM_DUCK = r"lower(regexp_replace(trim({col}), '\s+', ' ', 'g'))"


def with_shingles(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``norm``, ``w`` (words) and ``shingles`` columns (Spark)."""
    n = SHINGLE_WORDS
    gram = "concat(" + ", ' ', ".join(f"w[i+{j}]" for j in range(n)) + ")"
    return (
        df.withColumn("norm", F.expr(NORM_SPARK.format(col=text_col)))
        .withColumn("w", F.expr("split(norm, ' ')"))
        .withColumn(
            "shingles",
            F.expr(
                f"case when size(w) >= {n} then "
                f"array_distinct(transform(sequence(0, size(w)-{n}), i -> {gram})) "
                "else array(norm) end"
            ),
        )
    )


def duck_shingles_cte(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB CTE body producing (doc_id, shingles) — twin of above."""
    n = SHINGLE_WORDS
    norm = NORM_DUCK.format(col=text_col)
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""
  base AS (
    SELECT doc_id, {norm} AS norm, string_split({norm}, ' ') AS w
    FROM {table}
  ), shing AS (
    SELECT doc_id,
           CASE WHEN len(w) >= {n} THEN list_distinct(list_transform(
                range(1, len(w) - {n - 2}), i -> {gram}))
           ELSE [norm] END AS shingles
    FROM base
  )"""


# ---------------------------------------------------------------------------
# MinHash signatures
#
# Each shingle is md5-hashed ONCE to a 31-bit base value; the K hash-
# family members are affine permutations (a_s·h + b_s) mod p of that
# base — the classic universal-hashing construction. This cuts the
# md5 count by K× (the dominant cost at scale: md5 is ~50× an int
# multiply) while keeping every value reproducible in any engine:
# a_s·h < p·2^31 < 2^62 never overflows signed 64-bit. The modulus must
# sit just ABOVE the hash domain (first prime past 2^31): a modulus far
# larger than the domain would leave the affine map nearly unwrapped —
# order-preserving — so every seed would elect the same argmin shingle
# and the signature positions would be correlated instead of
# independent.
# ---------------------------------------------------------------------------

_H_BITS = 2147483648  # 2^31 — base-hash domain
_PRIME = 2147483659  # first prime > 2^31


def _affine_coeff(kind: str, s: int) -> int:
    import hashlib

    h = int(hashlib.md5(f"minhash-{kind}:{s}".encode()).hexdigest()[:15], 16)
    return h % (_PRIME - 1) + 1  # 1 .. p−1, never 0


MINHASH_A = tuple(_affine_coeff("a", s) for s in range(MINHASH_K))
MINHASH_B = tuple(_affine_coeff("b", s) for s in range(MINHASH_K))


def shingle_hashes_expr() -> Column:
    """31-bit base hash per shingle (Spark; one md5 per shingle)."""
    return F.expr(
        "transform(shingles, g -> "
        f"cast(conv(substr(md5(g), 1, 15), 16, 10) as bigint) % {_H_BITS})"
    )


def duck_shingle_hashes_sql() -> str:
    fold = duckdb_md5_long_sql("g")
    return f"list_transform(shingles, g -> {fold} % {_H_BITS})"


def shingle_digests_expr() -> Column:
    """Full-width (60-bit) digest per shingle — inverted-index keys."""
    return F.expr(
        "transform(shingles, g -> cast(conv(substr(md5(g), 1, 15), 16, 10) as bigint))"
    )


def duck_shingle_digests_sql() -> str:
    fold = duckdb_md5_long_sql("g")
    return f"list_transform(shingles, g -> {fold})"


def minhash_sig_expr(hashes_col: str = "hs") -> Column:
    """K-wide MinHash signature from the base-hash array (Spark).

    One zip_with loop over literal coefficient arrays rather than K
    unrolled array_min subtrees: the generated code stays small enough
    for JIT, which cuts cold-run time ~5× at identical output.
    """
    a_lits = ", ".join(f"{a}L" for a in MINHASH_A)
    b_lits = ", ".join(f"{b}L" for b in MINHASH_B)
    return F.expr(
        f"zip_with(array({a_lits}), array({b_lits}), "
        f"(a, b) -> array_min(transform({hashes_col}, h -> (a * h + b) % {_PRIME}L)))"
    )


def duck_minhash_sig_sql(hashes_col: str = "hs") -> str:
    """DuckDB twin of :func:`minhash_sig_expr`."""
    mins = ", ".join(
        f"list_min(list_transform({hashes_col}, h -> ({a} * h + {b}) % {_PRIME}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    )
    return f"[{mins}]"


def band_keys_expr() -> Column:
    """Array of LSH band keys (comma-joined signature slices), Spark."""
    parts = ", ".join(f"sig[b*{LSH_ROWS}+{j}]" for j in range(LSH_ROWS))
    return F.expr(
        f"transform(sequence(0, {LSH_BANDS - 1}), b -> concat_ws(',', {parts}))"
    )


def duck_band_key_sql(band_var: str = "t.b") -> str:
    """DuckDB band-key expression for 1-based list indexing."""
    return " || ',' || ".join(
        f"CAST(sig[{band_var}*{LSH_ROWS}+{j + 1}] AS VARCHAR)" for j in range(LSH_ROWS)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_exprs() -> tuple[Column, Column]:
    """(token-hash array, simhash) columns over ``w`` words (Spark).

    Bit j of the fingerprint is set when more than half of the token
    hashes have bit j set (the classic +1/−1 bit vote with unit
    weights).
    """
    hs = F.expr(
        "transform(w, t -> cast(conv(substr(md5(concat('sh:', t)), 1, 15), 16, 10) as bigint))"
    )
    votes = " + ".join(
        f"(case when 2 * size(filter(hs, h -> (h div {1 << j}) % 2 = 1)) > size(hs) "
        f"then cast({1 << j} as bigint) else 0 end)"
        for j in range(SIMHASH_BITS)
    )
    return hs, F.expr(votes)


def duck_simhash_sql() -> str:
    """DuckDB simhash expression over an ``hs`` token-hash list column."""
    return " + ".join(
        f"(CASE WHEN 2 * len(list_filter(hs, h -> (h // {1 << j}) % 2 = 1)) > len(hs) "
        f"THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )


def duck_token_hash_sql() -> str:
    fold = duckdb_md5_long_sql("'sh:' || t")
    return f"list_transform(w, t -> {fold})"
