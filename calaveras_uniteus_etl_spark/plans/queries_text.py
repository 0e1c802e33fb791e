"""Text-analysis operator inventory (driver north-star extensions).

Whitespace/regex tokenization, quality scoring, fingerprinting and a
deterministic language-ID heuristic over ``documents`` — all built-in
expressions (regexp/length/split), all oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calaveras_uniteus_etl_spark.plans.catalog import register
from calaveras_uniteus_etl_spark.plans.tables import table

# ---------------------------------------------------------------------------
# X9 — token counting (whitespace + word-regex)
# ---------------------------------------------------------------------------


@register(
    "x9_token_counts",
    oracle=r"""
SELECT doc_id,
       length(text) AS n_chars_actual,
       CASE WHEN trim(text) = '' THEN 0
            ELSE length(string_split_regex(trim(text), '\s+')) END AS n_ws_tokens,
       length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_word_tokens
FROM documents
""",
    doc="Token counts: whitespace-split and word-regex token counts "
    "per document (BPE-ish pre-tokenization shape).",
)
def x9_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        F.when(t == "", 0)
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("long")
        .alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z0-9]+"), F.lit(0)))
        .cast("long")
        .alias("n_word_tokens"),
    )


# ---------------------------------------------------------------------------
# X10 — document fingerprint (normalized-content hash)
# ---------------------------------------------------------------------------


@register(
    "x10_fingerprint",
    oracle=r"""
SELECT doc_id,
       md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents
""",
    doc="Normalization fingerprint: lower + whitespace-collapse + md5 "
    "(rolling-hash stand-in, byte-exact across engines).",
)
def x10_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return d.select("doc_id", F.md5(normalized).alias("fingerprint"))
