"""Text-analysis operator inventory (driver north-star extensions).

Whitespace/regex tokenization, quality scoring, fingerprinting and a
deterministic language-ID heuristic over ``documents`` — all built-in
expressions (regexp/length/split), all oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from calaveras_uniteus_etl_spark.plans._session_index import (
    materialize,
    session_index,
)
from calaveras_uniteus_etl_spark.plans.catalog import register
from calaveras_uniteus_etl_spark.plans.tables import table


def _tok_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-indexed tokenized corpus: (doc_id, lang, source,
    n_chars, w) where ``w = split(NORM(text), ' ')``.

    ~28 text queries run this exact normalize+split pass over the full
    corpus independently — at 100 TB each rebuild re-reads and
    re-tokenizes every document, the same anti-pattern the shingle/
    signature indexes already remove (guide §2.4/§6). The artifact
    carries documents' light metadata columns so consumers that group
    by lang/source/n_chars never join back to the base table. Built in
    bench.py's index phase (cost timed, counted in the headline);
    queries needing the raw/normalized TEXT itself keep reading the
    parquet scan.
    """
    from calaveras_uniteus_etl_spark.operators.dedup import NORM_SPARK

    return session_index(
        spark,
        sf_dir,
        "tokenized_corpus",
        lambda: materialize(
            # natural scan partitioning, no repartition: at scale the
            # leaf inherits the source's real split count; at the test
            # SFs consumers keep the same 1-task map shape the raw
            # scan gave them (32-way leaf measured +0.1-0.3s/query in
            # pure stage/task overhead on sub-second consumers)
            table(spark, sf_dir, "documents")
            .select(
                "doc_id",
                "lang",
                "source",
                "n_chars",
                F.expr(f"split({NORM_SPARK.format(col='text')}, ' ')").alias(
                    "w"
                ),
            )
        ),
    )


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


# ---------------------------------------------------------------------------
# X7 — language identification (stopword-hit heuristic)
# ---------------------------------------------------------------------------

from calaveras_uniteus_etl_spark.operators.dedup import NORM_DUCK, NORM_SPARK

_STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "it", "a"),
    "es": ("el", "la", "de", "que", "y", "los", "se", "del"),
    "fr": ("le", "et", "les", "des", "une", "du", "dans", "est"),
    "de": ("der", "die", "und", "den", "von", "zu", "das", "mit"),
}
_LANG_ORDER = ("en", "es", "fr", "de")


def _pred_case(hit: dict[str, str]) -> str:
    """Shared argmax-with-tiebreak CASE (identical SQL both engines)."""
    clauses = []
    for i, lang in enumerate(_LANG_ORDER):
        geq = " AND ".join(
            f"{hit[lang]} >= {hit[other]}" for other in _LANG_ORDER[i + 1 :]
        )
        cond = f"{hit[lang]} > 0" + (f" AND {geq}" if geq else "")
        clauses.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " ELSE 'und' END"


def _hits_spark(lang: str) -> str:
    lits = ", ".join(f"'{t}'" for t in _STOPWORDS[lang])
    return f"size(filter(w, t -> t in ({lits})))"


def _hits_duck(lang: str) -> str:
    lits = ", ".join(f"'{t}'" for t in _STOPWORDS[lang])
    return f"len(list_filter(w, t -> t IN ({lits})))"


_X7_PRED_SPARK = _pred_case({lang: _hits_spark(lang) for lang in _LANG_ORDER})
_X7_PRED_DUCK = _pred_case({lang: _hits_duck(lang) for lang in _LANG_ORDER})


@register(
    "x7_language_id",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, string_split({NORM_DUCK.format(col="text")}, ' ') AS w
  FROM documents
)
SELECT doc_id, lang AS lang_actual, {_X7_PRED_DUCK} AS lang_pred
FROM toks
""",
    doc="Language-ID n-gram/stopword heuristic: per-language stopword "
    "hit counts, argmax with deterministic tiebreak.",
)
def x7_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    return _tok_index(spark, sf_dir).select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        F.expr(_X7_PRED_SPARK).alias("lang_pred"),
    )


@register(
    "x7_language_confusion",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, string_split({NORM_DUCK.format(col="text")}, ' ') AS w
  FROM documents
)
SELECT lang AS lang_actual, {_X7_PRED_DUCK} AS lang_pred, COUNT(*) AS n_docs
FROM toks
GROUP BY 1, 2
""",
    doc="Language-ID confusion matrix: actual × predicted counts.",
)
def x7_language_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    return (
        _tok_index(spark, sf_dir)
        .groupBy(
            F.col("lang").alias("lang_actual"),
            F.expr(_X7_PRED_SPARK).alias("lang_pred"),
        )
        .agg(F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# X8 — document quality scoring
#
# Ratios are emitted as raw doubles (no rounding): both engines divide
# bit-identical operands, so the quotients are IEEE-identical — and
# skipping ROUND avoids engine-specific tie-break behavior on exactly
# representable midpoints.
# ---------------------------------------------------------------------------

_X8_STOP = ", ".join(f"'{t}'" for t in _STOPWORDS["en"])


@register(
    "x8_quality_score",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, text, {NORM_DUCK.format(col="text")} AS norm,
         string_split({NORM_DUCK.format(col="text")}, ' ') AS w
  FROM documents
), m AS (
  SELECT doc_id,
         length(text) AS n_chars_actual,
         CASE WHEN norm = '' THEN 0 ELSE len(w) END AS n_tokens,
         CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"-]', '', 'g')) AS BIGINT) AS n_punct,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
         len(list_filter(w, t -> t IN ({_X8_STOP}))) AS n_stop
  FROM toks
)
SELECT doc_id, n_tokens,
       CAST(n_punct AS DOUBLE) / NULLIF(n_chars_actual, 0) AS punct_ratio,
       CAST(n_digits AS DOUBLE) / NULLIF(n_chars_actual, 0) AS digit_ratio,
       CAST(n_stop AS DOUBLE) / NULLIF(n_tokens, 0) AS stopword_ratio,
       CAST(n_chars_actual - (n_tokens - 1) AS DOUBLE) / NULLIF(n_tokens, 0) AS mean_token_len,
       CASE WHEN n_tokens >= 30 AND n_stop > 0 THEN 'good'
            WHEN n_tokens >= 15 THEN 'fair'
            ELSE 'poor' END AS quality_bucket
FROM m
""",
    doc="Quality scoring: token count, punct/digit/stopword ratios, mean "
    "token length, threshold bucket — all built-in expressions.",
)
def x8_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    norm = NORM_SPARK.format(col="text")
    m = (
        d.withColumn("norm", F.expr(norm))
        .withColumn("w", F.expr("split(norm, ' ')"))
        .select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars_actual"),
            F.expr("case when norm = '' then 0 else size(w) end")
            .cast("long")
            .alias("n_tokens"),
            F.expr(
                """cast(length(text) - length(regexp_replace(text, '[.,;:!?\\'"-]', '')) as bigint)"""
            ).alias("n_punct"),
            F.expr(
                "cast(length(text) - length(regexp_replace(text, '[0-9]', '')) as bigint)"
            ).alias("n_digits"),
            F.expr(f"cast(size(filter(w, t -> t in ({_X8_STOP}))) as bigint)").alias(
                "n_stop"
            ),
        )
    )
    return m.select(
        "doc_id",
        "n_tokens",
        (F.col("n_punct").cast("double") / F.nullif(F.col("n_chars_actual"), F.lit(0)))
        .alias("punct_ratio"),
        (F.col("n_digits").cast("double") / F.nullif(F.col("n_chars_actual"), F.lit(0)))
        .alias("digit_ratio"),
        (F.col("n_stop").cast("double") / F.nullif(F.col("n_tokens"), F.lit(0)))
        .alias("stopword_ratio"),
        ((F.col("n_chars_actual") - (F.col("n_tokens") - 1)).cast("double")
         / F.nullif(F.col("n_tokens"), F.lit(0))).alias("mean_token_len"),
        F.expr(
            "case when n_tokens >= 30 and n_stop > 0 then 'good' "
            "when n_tokens >= 15 then 'fair' else 'poor' end"
        ).alias("quality_bucket"),
    )


# ---------------------------------------------------------------------------
# X12 — TF-IDF top terms per document
#
# Classic text-pipeline scoring, all relational: explode tokens → tf per
# (doc, term) → df per term → idf = ln(N/df) → top-3 terms per doc by
# window rank. Determinism: N/df is double division of identical ints,
# and the score is quantized to 6dp before ranking/output: JVM and
# DuckDB libm ln() agree to within 1 ulp but not always exactly, and
# rounding collapses that (verified: the raw doubles differ on real
# inputs at the 16th digit). Ranking ties break on the term itself. Scale shape: two shuffles (doc-term agg,
# term df) + a broadcast of the tiny df relation back onto tf.
# ---------------------------------------------------------------------------

_TFIDF_TOPK = 3


@register(
    "x12_tfidf_top_terms",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({NORM_DUCK.format(col="text")}, ' ')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS rn
  FROM scored
) WHERE rn <= {_TFIDF_TOPK}
""",
    doc="TF-IDF top-3 terms per doc: tf x ln(N/df), window rank with "
    "term tiebreak — two shuffles plus a broadcast df join.",
)
def x12_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    # session tokenized corpus (already spread by doc_id at build)
    d = _tok_index(spark, sf_dir)
    toks = d.select("doc_id", F.explode("w").alias("term"))
    # tf feeds the document-frequency rollup AND the scoring join —
    # unpinned, the tokenize + (doc, term) aggregation ran twice
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    df_rel = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # scalar; at scale a cheap count job, never a collect of rows
    scored = tf.join(F.broadcast(df_rel), "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TFIDF_TOPK)
        .select("doc_id", "term", "tf", "df", "tfidf")
    )


# ---------------------------------------------------------------------------
# X15 — deterministic train/val/test split (hash bucketing)
#
# The split every training-data pipeline needs: assignment must be a
# pure function of a stable key (reproducible across runs, engines, and
# re-shards — never rand()). md5-derived bucket in [0,100): <90 train,
# <95 val, else test.
# ---------------------------------------------------------------------------

from calaveras_uniteus_etl_spark.functions.hashing import duckdb_md5_long_sql as _fold
from calaveras_uniteus_etl_spark.functions.hashing import duckdb_md5_long_flat_sql as _flat_fold


@register(
    "x15_train_test_split",
    oracle=f"""
WITH b AS (
  SELECT doc_id, {_fold("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM b GROUP BY 1
""",
    doc="Deterministic train/val/test split: md5(doc_id) bucket in "
    "[0,100) → 90/5/5 — reproducible across runs/engines/shards, "
    "never rand().",
)
def x15_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    bucket = F.expr(
        "cast(conv(substr(md5(concat('split:', cast(doc_id as string))), 1, 15), 16, 10) as bigint) % 100"
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return d.groupBy(split.alias("split")).agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


# ---------------------------------------------------------------------------
# X16 — PII scrubbing (regex redaction)
#
# The text-side counterpart of the ETL's PHI hashing: emails, phone
# numbers, and SSN-shaped tokens replaced with typed placeholders.
# Patterns stay in the RE2 ∩ Java-regex common subset (no backrefs, no
# lookaround) so Spark and DuckDB compile them identically.
# ---------------------------------------------------------------------------

_PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
)


@register(
    "x16_pii_scrub",
    oracle=f"""
SELECT doc_id,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
           '{_PII_PATTERNS[0][0]}', '{_PII_PATTERNS[0][1]}', 'g'),
           '{_PII_PATTERNS[1][0].replace("'", "''")}', '{_PII_PATTERNS[1][1]}', 'g'),
           '{_PII_PATTERNS[2][0]}', '{_PII_PATTERNS[2][1]}', 'g')) AS scrubbed_hash,
       length(regexp_replace(regexp_replace(regexp_replace(text,
           '{_PII_PATTERNS[0][0]}', '{_PII_PATTERNS[0][1]}', 'g'),
           '{_PII_PATTERNS[1][0].replace("'", "''")}', '{_PII_PATTERNS[1][1]}', 'g'),
           '{_PII_PATTERNS[2][0]}', '{_PII_PATTERNS[2][1]}', 'g')) AS scrubbed_len
FROM documents
""",
    doc="PII scrubbing: email/phone/SSN regex redaction with typed "
    "placeholders (RE2∩Java-regex subset); scrubbed text verified "
    "byte-exactly via md5.",
)
def x16_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    scrubbed = F.col("text")
    for pat, repl in _PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return d.select(
        "doc_id",
        F.md5(scrubbed).alias("scrubbed_hash"),
        F.length(scrubbed).cast("long").alias("scrubbed_len"),
    )


# ---------------------------------------------------------------------------
# X17 — repetition quality signals (Gopher-style filters)
#
# Repetitious documents are the classic LLM-pretraining failure mode;
# the standard filters measure duplicate-line fraction and the mass of
# the most frequent n-gram. Both are pure relational/array expressions
# over the token list — no UDFs.
# ---------------------------------------------------------------------------


@register(
    "x17_repetition_signals",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split({NORM_DUCK.format(col="text")}, ' ') AS w
  FROM documents
), grams AS (
  SELECT doc_id, len(w) AS n_tokens,
         CASE WHEN len(w) >= 2 THEN
           list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
         ELSE [] END AS g2
  FROM toks
), top2 AS (
  SELECT doc_id, n_tokens,
         len(g2) AS n_bigrams,
         CASE WHEN len(g2) = 0 THEN 0
              ELSE (SELECT MAX(c) FROM (
                     SELECT COUNT(*) AS c FROM unnest(g2) AS t(x) GROUP BY x))
         END AS top_bigram_count
  FROM grams
)
SELECT doc_id, n_tokens,
       CAST(top_bigram_count AS DOUBLE) / NULLIF(n_bigrams, 0) AS top_bigram_frac,
       CASE WHEN CAST(top_bigram_count AS DOUBLE) / NULLIF(n_bigrams, 0) > 0.2
            THEN 'drop' ELSE 'keep' END AS repetition_verdict
FROM top2
""",
    doc="Gopher-style repetition filter: mass fraction of the most "
    "frequent bigram per doc, keep/drop verdict at 0.2 — array exprs "
    "only, no UDFs.",
)
def x17_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    m = _tok_index(spark, sf_dir).select(
        "doc_id",
        F.size("w").cast("long").alias("n_tokens"),
        F.expr(
            "case when size(w) >= 2 then "
            "transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1])) "
            "else array() end"
        ).alias("g2"),
    )
    # most-frequent-bigram count via aggregate over the distinct grams:
    # size(filter(g2, x = g)) per distinct g, max'd — stays array-side,
    # avoiding an explode+groupBy shuffle per doc
    top = m.select(
        "doc_id",
        "n_tokens",
        F.size("g2").cast("long").alias("n_bigrams"),
        F.expr(
            "case when size(g2) = 0 then 0 else "
            "array_max(transform(array_distinct(g2), g -> size(filter(g2, x -> x = g)))) end"
        )
        .cast("long")
        .alias("top_bigram_count"),
    )
    frac = F.col("top_bigram_count").cast("double") / F.nullif(
        F.col("n_bigrams"), F.lit(0)
    )
    return top.select(
        "doc_id",
        "n_tokens",
        frac.alias("top_bigram_frac"),
        F.when(frac > 0.2, "drop").otherwise("keep").alias("repetition_verdict"),
    )


# ---------------------------------------------------------------------------
# X18 — benchmark decontamination (13-gram collision check)
#
# The standard eval-contamination test: does a training document share
# any 13-gram with the benchmark set? Both sides join on 60-bit gram
# digests (inverted index), so the check shuffles 8-byte keys, never
# text. Benchmark stand-in: doc_id < 50.
# ---------------------------------------------------------------------------

_DECONTAM_N = 13


def _gram13_duck(src: str) -> str:
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(_DECONTAM_N))
    from calaveras_uniteus_etl_spark.functions.hashing import duckdb_md5_long_sql

    return f"""
  SELECT doc_id, unnest(CASE WHEN len(w) >= {_DECONTAM_N} THEN
           list_distinct(list_transform(range(1, len(w) - {_DECONTAM_N - 2}),
             i -> {duckdb_md5_long_sql(gram)}))
         ELSE [] END) AS g
  FROM (SELECT doc_id, string_split({NORM_DUCK.format(col="text")}, ' ') AS w
        FROM documents {src})"""


@register(
    "x18_decontamination",
    oracle=f"""
WITH bench AS ({_gram13_duck("WHERE doc_id < 50")}),
train AS ({_gram13_duck("WHERE doc_id >= 50")}),
hits AS (
  SELECT t.doc_id, COUNT(DISTINCT t.g) AS contaminated_grams
  FROM train t JOIN (SELECT DISTINCT g FROM bench) b ON t.g = b.g
  GROUP BY t.doc_id
)
SELECT doc_id, contaminated_grams FROM hits
""",
    doc="Benchmark decontamination: 13-gram digest collision between "
    "train docs and the benchmark set (doc_id<5); inverted-index join "
    "on 8-byte digests.",
)
def x18_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _DECONTAM_N
    gram = "concat(" + ", ' ', ".join(f"w[i+{j}]" for j in range(n)) + ")"
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    grams = _tok_index(spark, sf_dir).select(
        "doc_id",
        F.explode(
            F.expr(
                f"case when size(w) >= {n} then "
                f"array_distinct(transform(sequence(0, size(w)-{n}), "
                f"i -> cast(conv(substr(md5({gram}), 1, 15), 16, 10) as bigint))) "
                "else array() end"
            )
        ).alias("g"),
        # one long per gram; feeds the bench probe set AND the train
        # side — unpinned, the md5-per-gram pass ran twice
    ).localCheckpoint(eager=True)
    bench = grams.filter(F.col("doc_id") < 50).select("g").distinct()
    train = grams.filter(F.col("doc_id") >= 50)
    return (
        train.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("contaminated_grams"))
    )


# ---------------------------------------------------------------------------
# X20 — deterministic stratified sampling (per-language quotas)
#
# Corpus curation needs per-stratum rates (e.g. upsample low-resource
# languages); like X15 the assignment must be a pure function of the
# key. Rates here: en 10%, others 50% — checked by comparing sampled
# counts per language against the hash-bucket predicate itself.
# ---------------------------------------------------------------------------

_STRATA_PCT = {"en": 10, "es": 50, "fr": 50, "de": 50, "zh": 50}


def _strata_case(bucket: str) -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' AND {bucket} < {pct} THEN 1"
        for lang, pct in _STRATA_PCT.items()
    )
    return f"CASE {whens} ELSE 0 END"


@register(
    "x20_stratified_sample",
    oracle=f"""
WITH b AS (
  SELECT doc_id, lang,
         {_fold("'strat:' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_total,
       CAST(SUM({_strata_case("bucket")}) AS BIGINT) AS n_sampled
FROM b GROUP BY lang
""",
    doc="Deterministic stratified sampling: per-language md5-bucket "
    "quotas (en 10%, others 50%) — reproducible curation-rate control.",
)
def x20_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    bucket = F.expr(
        "cast(conv(substr(md5(concat('strat:', cast(doc_id as string))), 1, 15), 16, 10) as bigint) % 100"
    )
    keep = F.lit(0)
    for lang, pct in _STRATA_PCT.items():
        keep = F.when((F.col("lang") == lang) & (bucket < pct), 1).otherwise(keep)
    return d.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.sum(keep).cast("bigint").alias("n_sampled"),
    )

# ---------------------------------------------------------------------------
# X21 — composed corpus-curation funnel (the end-to-end pipeline story)
#
# Every large-scale pretraining corpus goes through the same gauntlet:
# exact dedup → language ID → quality gate → split assignment. This
# query composes the already-oracled stages (x1 keeper, x7 lang-id, x8
# quality bucket, x15 split) into ONE cumulative retention funnel, the
# number a pipeline owner actually reads ("how many docs/tokens survive
# to training?").
#
# Scale shape: a single projection computes all per-doc flags (built-in
# expressions only), ONE shuffle on the 16-byte content digest elects
# exact-dedup keepers (window MIN, no self-join), and a map-side
# partially-aggregated conditional SUM reduces to one row — unpivoted
# to the 5-stage funnel. No joins, no second pass over text.
# ---------------------------------------------------------------------------

_X21_STAGES = (
    ("1_raw", "true"),
    ("2_exact_dedup", "is_keeper"),
    ("3_lang_identified", "is_keeper AND lang_pred <> 'und'"),
    ("4_quality_pass", "is_keeper AND lang_pred <> 'und' AND n_tokens >= 15"),
    (
        "5_train_split",
        "is_keeper AND lang_pred <> 'und' AND n_tokens >= 15 AND split = 'train'",
    ),
)


@register(
    "x21_curation_funnel",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, text, md5(text) AS digest,
         {NORM_DUCK.format(col="text")} AS norm,
         string_split({NORM_DUCK.format(col="text")}, ' ') AS w
  FROM documents
), flags AS (
  SELECT doc_id,
         doc_id = MIN(doc_id) OVER (PARTITION BY digest) AS is_keeper,
         CASE WHEN norm = '' THEN 0 ELSE len(w) END AS n_tokens,
         {_X7_PRED_DUCK} AS lang_pred,
         CASE WHEN {_fold("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 90
              THEN 'train'
              WHEN {_fold("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 95
              THEN 'val' ELSE 'test' END AS split
  FROM toks
), agg AS (
  SELECT
    {", ".join(
        f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS d{i}, "
        f"CAST(SUM(CASE WHEN {cond} THEN n_tokens ELSE 0 END) AS BIGINT) AS t{i}"
        for i, (_, cond) in enumerate(_X21_STAGES)
    )}
  FROM flags
)
{" UNION ALL ".join(
    f"SELECT '{stage}' AS stage, d{i} AS n_docs, t{i} AS n_tokens FROM agg"
    for i, (stage, _) in enumerate(_X21_STAGES)
)}
""",
    doc="Composed corpus-curation funnel: exact-dedup keeper → lang-id "
    "→ quality gate → train split, cumulative doc/token retention per "
    "stage — one text pass, one digest shuffle, one aggregate.",
)
def x21_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    norm = NORM_SPARK.format(col="text")
    bucket = (
        "cast(conv(substr(md5(concat('split:', cast(doc_id as string))), 1, 15), 16, 10)"
        " as bigint) % 100"
    )
    flags = (
        d.withColumn("norm", F.expr(norm))
        .withColumn("w", F.expr("split(norm, ' ')"))
        .select(
            "doc_id",
            F.md5("text").alias("digest"),
            F.expr("case when norm = '' then 0 else size(w) end")
            .cast("long")
            .alias("n_tokens"),
            F.expr(_X7_PRED_SPARK).alias("lang_pred"),
            F.expr(
                f"case when {bucket} < 90 then 'train' "
                f"when {bucket} < 95 then 'val' else 'test' end"
            ).alias("split"),
        )
        .withColumn(
            "is_keeper",
            F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("digest")),
        )
    )
    agg = flags.agg(
        *[
            e
            for i, (_, cond) in enumerate(_X21_STAGES)
            for e in (
                F.sum(F.when(F.expr(cond), 1).otherwise(0))
                .cast("long")
                .alias(f"d{i}"),
                F.sum(F.when(F.expr(cond), F.col("n_tokens")).otherwise(0))
                .cast("long")
                .alias(f"t{i}"),
            )
        ]
    )
    stack = ", ".join(
        f"'{stage}', d{i}, t{i}" for i, (stage, _) in enumerate(_X21_STAGES)
    )
    return agg.select(
        F.expr(f"stack({len(_X21_STAGES)}, {stack}) as (stage, n_docs, n_tokens)")
    )

# ---------------------------------------------------------------------------
# X22 — vocabulary statistics (tokenizer-construction shape)
#
# Global term frequencies with rank and cumulative corpus share — the
# aggregation behind building a tokenizer vocab / frequency cutoff.
# Scale shape: one shuffle (term counts, map-side combined), then
# ORDER BY + LIMIT k which Spark executes as TakeOrderedAndProject
# (per-partition top-k, never a global sort); the rank/cumulative
# window runs over the k survivors only, and the corpus total joins in
# as a broadcast scalar. Determinism: counts are exact BIGINTs, the
# running share divides identical integer operands → identical doubles.
# ---------------------------------------------------------------------------

_VOCAB_TOPK = 50


@register(
    "x22_vocab_topk",
    oracle=f"""
WITH toks AS (
  SELECT unnest(string_split({NORM_DUCK.format(col="text")}, ' ')) AS term
  FROM documents
), tf AS (
  SELECT term, COUNT(*) AS tf FROM toks WHERE term <> '' GROUP BY term
), top AS (
  SELECT term, tf FROM tf ORDER BY tf DESC, term LIMIT {_VOCAB_TOPK}
), total AS (
  SELECT SUM(tf) AS total_tf FROM tf
)
SELECT term, tf,
       CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS BIGINT) AS rank,
       CAST(SUM(tf) OVER (ORDER BY tf DESC, term
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         / CAST(total_tf AS DOUBLE) AS cum_share
FROM top CROSS JOIN total
""",
    doc="Vocabulary top-k: exact term frequencies, rank, cumulative "
    "corpus share — TakeOrderedAndProject top-k, window only over the "
    "k survivors, broadcast scalar total.",
)
def x22_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    # session tokenized corpus (already spread by doc_id at build)
    toks = _tok_index(spark, sf_dir).select(
        F.explode("w").alias("term")
    ).filter(F.col("term") != "")
    # term counts feed BOTH the top-k and the corpus-total scalar: pin
    # the vocabulary-sized relation once instead of running the
    # normalize+split+explode+groupBy subtree twice
    tf = toks.groupBy("term").agg(F.count("*").alias("tf")).localCheckpoint(
        eager=True
    )
    top = tf.orderBy(F.desc("tf"), F.asc("term")).limit(_VOCAB_TOPK)
    total = tf.agg(F.sum("tf").alias("total_tf"))
    w = Window.orderBy(F.desc("tf"), F.asc("term"))
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "term",
            "tf",
            F.row_number().over(w).cast("bigint").alias("rank"),
            (
                F.sum("tf").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double")
                / F.col("total_tf").cast("double")
            ).alias("cum_share"),
        )
    )

# ---------------------------------------------------------------------------
# X24 — sequence packing (concat-and-chunk into training sequences)
#
# The last step before tokens hit the trainer: documents concatenate in
# a deterministic order and chunk into fixed-budget sequences; a doc's
# pack is floor(start_offset / budget). A single global cumulative sum
# is inherently sequential, so packing is SHARD-LOCAL — docs hash into
# shards (md5 bucket: deterministic, engine-neutral) and the running
# offset windows over (split, shard) partitions, all of which pack in
# parallel. That is exactly how real pipelines shard this job; the
# price is per-shard (not global) boundary waste, which the output
# makes observable. Integer arithmetic end-to-end — no float risk.
# ---------------------------------------------------------------------------

_PACK_BUDGET = 4096
_PACK_SHARDS = 8


@register(
    "x24_sequence_packing",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN {NORM_DUCK.format(col="text")} = '' THEN 0
              ELSE len(string_split({NORM_DUCK.format(col="text")}, ' ')) END AS n_tokens,
         CASE WHEN {_fold("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 90
              THEN 'train'
              WHEN {_fold("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 95
              THEN 'val' ELSE 'test' END AS split,
         {_fold("'shard:' || CAST(doc_id AS VARCHAR)")} % {_PACK_SHARDS} AS shard
  FROM documents
), packed AS (
  SELECT split, shard, n_tokens,
         (SUM(n_tokens) OVER (PARTITION BY split, shard ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tokens)
           // {_PACK_BUDGET} AS pack_id
  FROM toks
)
SELECT split, CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(DISTINCT pack_id) AS BIGINT) AS n_packs,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM packed
GROUP BY split, shard
""",
    doc="Sequence packing: shard-local concat-and-chunk into "
    f"{_PACK_BUDGET}-token training sequences (md5 shard hashing, "
    "running integer offsets per (split, shard) — fully parallel, "
    "deterministic pack ids).",
)
def x24_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    # (`w = array('')` iff norm = '': trim() means a non-empty norm
    # never starts with a space, and a NULL norm yields NULL both ways)
    d = _tok_index(spark, sf_dir)
    bucket = (
        "cast(conv(substr(md5(concat('{tag}:', cast(doc_id as string))), 1, 15), 16, 10)"
        " as bigint)"
    )
    toks = d.select(
        "doc_id",
        F.expr(
            "case when w = array('') then 0 else size(w) end"
        ).cast("long").alias("n_tokens"),
        F.expr(
            f"case when {bucket.format(tag='split')} % 100 < 90 then 'train' "
            f"when {bucket.format(tag='split')} % 100 < 95 then 'val' else 'test' end"
        ).alias("split"),
        F.expr(f"{bucket.format(tag='shard')} % {_PACK_SHARDS}").alias("shard"),
    )
    w = (
        Window.partitionBy("split", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # integer div end-to-end: double division would round past 2^53,
    # and shard-cumulative token offsets can reach there at 100 TB
    packed = toks.withColumn(
        "offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).withColumn("pack_id", F.expr(f"offset div {_PACK_BUDGET}"))
    return packed.groupBy("split", F.col("shard").cast("bigint").alias("shard")).agg(
        F.countDistinct("pack_id").cast("bigint").alias("n_packs"),
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# X25 — corpus-LM unigram log-probability score (perplexity proxy)
#
# The CCNet-style quality signal: score each document by the mean
# log-probability of its tokens under the corpus's own unigram
# distribution — boilerplate/templated docs score high, gibberish and
# off-distribution docs score low, and the score feeds the curation
# funnel's keep/drop decision the same way the reference's quality
# gates feed its ETL issue log (x8's structural cousin, learned from
# data instead of fixed ratios).
#
# Two passes over the token relation, both map-side combined:
#   1. vocab counts -> p(t) = cnt/total; ln p is quantized to integer
#      MICRO-NATS immediately (round(ln*1e6)) so the per-doc sum is a
#      BIGINT sum — order-independent across partitions/engines (a
#      double sum of ln values would be summation-order dependent);
#   2. per-doc BIGINT sum + count; the mean divides the same two
#      numbers in both engines (one IEEE op, bit-identical).
# The vocab relation is broadcast (bounded by distinct tokens, far
# under any fact-table scale); total token count is one scalar agg.
# ---------------------------------------------------------------------------


@register(
    "x25_unigram_logprob",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({NORM_DUCK.format(col="text")}, ' ')) AS term
  FROM documents
), vocab AS (
  SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term
), total AS (
  SELECT SUM(cnt) AS n_tokens FROM vocab
), lp AS (
  SELECT term,
         CAST(ROUND(ln(CAST(cnt AS DOUBLE) / n_tokens) * 1e6) AS BIGINT)
           AS lp_micro
  FROM vocab CROSS JOIN total
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(lp.lp_micro) AS BIGINT) AS lp_micro_sum,
       CAST(SUM(lp.lp_micro) AS DOUBLE) / (1e6 * COUNT(*)) AS avg_logprob
FROM toks t JOIN lp USING (term)
GROUP BY t.doc_id
""",
    doc="Per-doc mean unigram log-prob under the corpus LM "
    "(micro-nat BIGINT arithmetic for cross-engine exactness).",
)
def x25_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus (already spread by doc_id at build)
    toks = _tok_index(spark, sf_dir).select(
        "doc_id", F.explode("w").alias("term")
    )
    # The vocab rollup feeds BOTH the total-tokens scalar and the
    # log-prob table — unpinned, the tokenize+rollup subtree executed
    # twice (once inside the broadcast scalar, once for lp), making
    # three full tokenize passes with the scoring join below. Pin the
    # vocabulary-sized (Heaps' law) relation once; the token stream
    # itself stays unmaterialized and is tokenized exactly twice —
    # once into the vocab, once for the scoring join — the honest
    # two-pass unigram-LM shape.
    vocab = (
        toks.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    tot = vocab.agg(F.sum("cnt").cast("double").alias("__n_tokens"))
    lp = vocab.crossJoin(F.broadcast(tot)).select(
        "term",
        F.round(
            F.log(F.col("cnt").cast("double") / F.col("__n_tokens")) * 1e6
        )
        .cast("bigint")
        .alias("lp_micro"),
    )
    return (
        toks.join(F.broadcast(lp), "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("lp_micro").cast("bigint").alias("lp_micro_sum"),
            (F.sum("lp_micro").cast("double") / (1e6 * F.count("*"))).alias(
                "avg_logprob"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X27 — overlapping document chunking (RAG / context-window prep)
#
# The complement of x24's packing: packing concatenates SHORT docs up
# to the context length, chunking splits LONG docs down to it, with a
# stride overlap so no boundary context is lost. One explode over a
# per-doc integer sequence — no shuffle at all until a downstream op
# needs one (the chunk table inherits the scan's partitioning), and
# chunk identity is content-addressed (md5 of the chunk words) so
# downstream exact-dedup of chunks composes with x1. Spark
# slice(w, s+1, C) ≡ DuckDB list_slice(w, s+1, s+C): both 1-based,
# both truncate at the end of the list.
# ---------------------------------------------------------------------------

_CHUNK_WORDS = 32
_CHUNK_STRIDE = 24  # 8-word overlap between consecutive chunks


@register(
    "x27_doc_chunking",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split({NORM_DUCK.format(col="text")}, ' ') AS w
  FROM documents
), spans AS (
  SELECT doc_id, w, len(w) AS n_words,
         1 + (GREATEST(len(w) - {_CHUNK_WORDS}, 0) + {_CHUNK_STRIDE} - 1)
             // {_CHUNK_STRIDE} AS n_chunks
  FROM toks
), chunks AS (
  SELECT doc_id,
         CAST(t.i AS BIGINT) AS chunk_idx,
         CAST(t.i * {_CHUNK_STRIDE} AS BIGINT) AS start_word,
         list_slice(w, t.i * {_CHUNK_STRIDE} + 1,
                    t.i * {_CHUNK_STRIDE} + {_CHUNK_WORDS}) AS cw
  FROM spans CROSS JOIN (SELECT unnest(range(1000)) AS i) t
  WHERE t.i < n_chunks
)
SELECT doc_id, chunk_idx, start_word,
       CAST(len(cw) AS BIGINT) AS chunk_words,
       md5(array_to_string(cw, ' ')) AS chunk_md5
FROM chunks
""",
    doc="Stride-overlap chunking of long docs (32-word chunks, 24-word "
    "stride): per-doc integer explode, content-addressed chunk ids.",
)
def x27_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus (already spread by doc_id at build)
    toks = _tok_index(spark, sf_dir).select("doc_id", "w")
    spans = toks.withColumn(
        "n_chunks",
        F.lit(1)
        + (
            (F.greatest(F.size("w") - _CHUNK_WORDS, F.lit(0)) + _CHUNK_STRIDE - 1)
            / _CHUNK_STRIDE
        ).cast("int"),
    )
    chunks = spans.select(
        "doc_id",
        F.explode(F.expr("sequence(0, n_chunks - 1)")).alias("chunk_idx"),
        "w",
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        (F.col("chunk_idx") * _CHUNK_STRIDE).cast("bigint").alias("start_word"),
        F.slice(
            "w",
            F.col("chunk_idx") * _CHUNK_STRIDE + 1,
            F.lit(_CHUNK_WORDS),
        ).alias("cw"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "start_word",
        F.size("cw").cast("bigint").alias("chunk_words"),
        F.md5(F.array_join("cw", " ")).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# X28 — training-mixture source weights (domain reweighting)
#
# Building a training mix means deciding how hard to up/down-sample
# each source so the sampled token distribution hits a target (here:
# uniform across sources — the DoReMi-style learned target drops in by
# replacing one literal vector). Weight = target_share / actual_share,
# computed from per-source token mass in micro-units so every engine
# sees identical integers; the final weights divide identical operands.
# One aggregate over (source), a scalar total, broadcast arithmetic —
# the entire query is two map-side-combined passes at any corpus size.
# ---------------------------------------------------------------------------


@register(
    "x28_source_mixture",
    oracle=f"""
WITH per_source AS (
  SELECT source,
         COUNT(*) AS n_docs,
         SUM(len(string_split({NORM_DUCK.format(col="text")}, ' '))) AS n_tokens
  FROM documents GROUP BY source
), total AS (
  SELECT SUM(n_tokens) AS all_tokens, COUNT(*) AS n_sources FROM per_source
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_tokens AS DOUBLE) / all_tokens AS token_share,
       CAST(1.0 AS DOUBLE) / n_sources AS target_share,
       (CAST(1.0 AS DOUBLE) / n_sources)
         / (CAST(n_tokens AS DOUBLE) / all_tokens) AS sample_weight
FROM per_source CROSS JOIN total
""",
    doc="Per-source token mass and up/down-sampling weights toward a "
    "uniform token target — the mixture arithmetic of a training-data "
    "curation run.",
)
def x28_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    per_source = _tok_index(spark, sf_dir).groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size("w")).cast("bigint").alias("n_tokens"),
    )
    total = per_source.agg(
        F.sum("n_tokens").alias("all_tokens"),
        F.count("*").alias("n_sources"),
    )
    share = F.col("n_tokens").cast("double") / F.col("all_tokens")
    target = F.lit(1.0) / F.col("n_sources")
    return per_source.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        share.alias("token_share"),
        target.alias("target_share"),
        (target / share).alias("sample_weight"),
    )


# ---------------------------------------------------------------------------
# X30 — deterministic weighted sampling (quality-proportional keep)
#
# Importance sampling for mixture construction: each document is kept
# with probability proportional to a quality proxy (here length,
# clamped), decided by a salted md5 draw — u = md5_long("ws:"+doc_id)
# mod 1024 < weight — so the sample is a pure function of the doc id:
# reproducible across engines, re-runs, and partitionings, and
# requires no RNG state, no global pass, no shuffle (the decision is a
# narrow per-row projection; only the audit rollup below aggregates).
# Integer-only arithmetic end-to-end: no double→int casts to disagree
# on (Spark truncates, DuckDB rounds).
# ---------------------------------------------------------------------------

_X30_DENOM = 1024  # weight granularity (parts per 1024)


@register(
    "x30_weighted_sample",
    oracle=f"""
WITH draws AS (
  SELECT source, lang,
         least({_X30_DENOM}, n_chars * 4) AS w_ppk,
         list_reduce(list_transform(
           string_split_regex(substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 15), ''),
           x -> strpos('0123456789abcdef', x) - 1), (a, b) -> a * 16 + b)
           % {_X30_DENOM} AS u
  FROM documents
)
SELECT source, lang,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN u < w_ppk THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN u < w_ppk THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS kept_share,
       CAST(SUM(w_ppk) AS DOUBLE) / (COUNT(*) * {_X30_DENOM}) AS expected_share
FROM draws
GROUP BY source, lang
ORDER BY source, lang
""",
    doc="Deterministic weighted sampling: keep-probability ∝ clamped "
    "doc length, decided by a salted md5 draw per doc id — "
    "reproducible, shuffle-free, integer-only; per-(source, lang) "
    "kept-vs-expected audit rollup.",
)
def x30_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.functions.hashing import md5_long

    d = table(spark, sf_dir, "documents")
    draws = d.select(
        "source",
        "lang",
        F.least(F.lit(_X30_DENOM), F.col("n_chars") * 4).alias("w_ppk"),
        (
            md5_long(F.concat(F.lit("ws:"), F.col("doc_id").cast("string")))
            % _X30_DENOM
        ).alias("u"),
    )
    kept = F.sum(F.when(F.col("u") < F.col("w_ppk"), 1).otherwise(0))
    return (
        draws.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_total"),
            kept.cast("bigint").alias("n_kept"),
            (kept.cast("double") / F.count("*")).alias("kept_share"),
            (
                F.sum("w_ppk").cast("double")
                / (F.count("*") * F.lit(_X30_DENOM))
            ).alias("expected_share"),
        )
        .orderBy("source", "lang")
    )


# ---------------------------------------------------------------------------
# X31 — DSIR-style importance weights (hashed-n-gram log-ratio)
#
# Data Selection via Importance Resampling (Xie et al. 2023): score
# each raw document by how target-like its token distribution is,
# using hashed unigram buckets — w(doc) = Σ_tokens ln(p_target(b) /
# q_raw(b)) with Laplace smoothing. Docs scoring high are resampled
# into the training mixture (x30's weighted sampler is the natural
# consumer of these weights, x28's mixture the natural target spec).
#
# Cross-engine arithmetic follows x25's micro-nat contract: bucket
# counts are exact BIGINTs, each bucket's log-ratio quantizes to
# integer micro-nats once (ROUND(ln-diff × 1e6)), per-doc sums are
# BIGINT — order-independent — and the mean divides the same two
# numbers everywhere. Scale shape: the bucket relation is fixed-size
# (B=256 rows, broadcast); the token relation is scanned twice (count
# pass + score pass), both map-side combined; totals are two scalar
# aggregates, never a row collect.
# ---------------------------------------------------------------------------

_DSIR_B = 256  # hashed feature buckets
_DSIR_TARGET_LANG = "en"


@register(
    "x31_dsir_weights",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(string_split({NORM_DUCK.format(col="text")}, ' ')) AS term
  FROM documents
), bt AS (
  SELECT doc_id, lang, {_fold("term")} % {_DSIR_B} AS b
  FROM toks
), raw AS (
  SELECT b, COUNT(*) AS r_cnt FROM bt GROUP BY b
), tgt AS (
  SELECT b, COUNT(*) AS t_cnt FROM bt WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY b
), tot AS (
  SELECT (SELECT SUM(r_cnt) FROM raw) AS r_total,
         (SELECT COALESCE(SUM(t_cnt), 0) FROM tgt) AS t_total
), lr AS (
  SELECT raw.b,
         CAST(ROUND((ln(CAST(COALESCE(t_cnt, 0) + 1 AS DOUBLE)
                        / (t_total + {_DSIR_B}))
                     - ln(CAST(r_cnt + 1 AS DOUBLE)
                          / (r_total + {_DSIR_B}))) * 1e6) AS BIGINT) AS lr_micro
  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot
)
SELECT bt.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(lr.lr_micro) AS BIGINT) AS dsir_micro_sum,
       CAST(SUM(lr.lr_micro) AS DOUBLE) / (1e6 * COUNT(*)) AS avg_importance
FROM bt JOIN lr USING (b)
GROUP BY bt.doc_id
""",
    doc="DSIR importance weights: hashed-unigram bucket log-ratio of "
    f"the {_DSIR_TARGET_LANG!r}-target vs raw distribution (Laplace-"
    "smoothed), micro-nat BIGINT per-doc sums.",
)
def x31_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.functions.hashing import md5_long

    # session tokenized corpus (already spread by doc_id at build)
    toks = _tok_index(spark, sf_dir).select(
        "doc_id", "lang", F.explode("w").alias("term")
    )
    # eager localCheckpoint: the exploded+hashed token relation feeds
    # three plan branches (raw bucket counts, target bucket counts,
    # the final per-doc score join) plus the lazy totals scalar —
    # without it the md5-dense explode re-runs for each, and unlike
    # cache() no entry outlives the query in the session CacheManager.
    # ~3 longs/token, O(corpus tokens).
    bt = toks.select(
        "doc_id", "lang", (md5_long("term") % _DSIR_B).alias("b")
    ).localCheckpoint(eager=True)
    raw = bt.groupBy("b").agg(F.count("*").alias("r_cnt"))
    tgt = (
        bt.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count("*").alias("t_cnt"))
    )
    # Both corpus totals as ONE lazy 1-row broadcast scalar off the
    # checkpoint leaf (two eager .first() calls here were two extra
    # blocking jobs). float(total + B) and the double cast of the
    # BIGINT sum produce identical IEEE operands, so lr_micro holds.
    totals = bt.agg(
        (F.count("*") + F.lit(_DSIR_B)).cast("double").alias("__r_den"),
        (
            F.coalesce(
                F.sum(
                    F.when(F.col("lang") == _DSIR_TARGET_LANG, 1).otherwise(0)
                ),
                F.lit(0),
            )
            + F.lit(_DSIR_B)
        )
        .cast("double")
        .alias("__t_den"),
    )
    lr = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("t_cnt"), F.lit(0)) + 1).cast(
                            "double"
                        )
                        / F.col("__t_den")
                    )
                    - F.log(
                        (F.col("r_cnt") + 1).cast("double") / F.col("__r_den")
                    )
                )
                * 1e6
            )
            .cast("bigint")
            .alias("lr_micro"),
        )
    )
    return (
        bt.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("lr_micro").cast("bigint").alias("dsir_micro_sum"),
            (F.sum("lr_micro").cast("double") / (1e6 * F.count("*"))).alias(
                "avg_importance"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X37 — per-source document cap (corpus balancing)
#
# The mixture-shaping primitive next to x28/x30: bound every source's
# contribution to at most N docs, chosen by a salted-hash draw so the
# survivor set is deterministic, unbiased, and identical on every
# engine and every rerun — never "first N in file order", which bakes
# crawl order into the corpus. One window rank per source; the
# checksum column proves the SAME docs survive, not just the same
# count.
# ---------------------------------------------------------------------------

_X37_CAP = 15


@register(
    "x37_source_cap",
    oracle=f"""
WITH ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rn <= {_X37_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN rn <= {_X37_CAP} THEN doc_id END) AS BIGINT)
         AS kept_id_checksum
FROM ranked
GROUP BY source
ORDER BY source
""",
    doc=f"Per-source cap: keep at most {_X37_CAP} docs per source by a "
    "deterministic salted-hash draw (window rank over md5 order), with "
    "a survivor-id checksum so engines must agree on WHICH docs stay.",
)
def x37_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents").select("source", "doc_id")
    w = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.concat(F.lit("cap:"), F.col("doc_id").cast("string"))), "doc_id"
        )
    )
    ranked = d.withColumn("rn", w)
    kept = F.when(F.col("rn") <= _X37_CAP, 1).otherwise(0)
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept).cast("bigint").alias("n_kept"),
            F.sum(F.when(F.col("rn") <= _X37_CAP, F.col("doc_id")))
            .cast("bigint")
            .alias("kept_id_checksum"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X43 — count-min sketch frequency audit
#
# The third sketch in the scale toolkit (next to f2's HLL cardinality
# and x34's Bloom membership): approximate term frequencies in D×W
# counters instead of one cell per distinct term. Count-min is fully
# deterministic given its hash family, so the whole sketch — and its
# one-sided error (estimate ≥ truth, never below) — is oracle-checked
# cell for cell. The audit output compares the estimate against the
# exact count for the exact top-20 terms; `overestimate` quantifies
# collision noise at this W.
# ---------------------------------------------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 1024  # counters per row
_CMS_AUDIT_K = 20  # audit the exact top-k terms


def _cms_oracle() -> str:
    from calaveras_uniteus_etl_spark.functions.hashing import duckdb_md5_long_sql

    norm = NORM_DUCK.format(col="text")
    cell = duckdb_md5_long_sql("CAST(d AS VARCHAR) || ':' || term")
    probe_cell = duckdb_md5_long_sql("CAST(rows_d.d AS VARCHAR) || ':' || t.term")
    return f"""
WITH toks AS (
  SELECT unnest(string_split({norm}, ' ')) AS term FROM documents
), toks_ne AS (
  SELECT term FROM toks WHERE term <> ''
), rows_d AS (SELECT unnest(range({_CMS_D})) AS d),
cms AS (
  SELECT d, {cell} % {_CMS_W} AS bucket, COUNT(*) AS cnt
  FROM toks_ne CROSS JOIN rows_d
  GROUP BY d, {cell} % {_CMS_W}
), exact AS (
  SELECT term, COUNT(*) AS exact_n FROM toks_ne GROUP BY term
  ORDER BY exact_n DESC, term LIMIT {_CMS_AUDIT_K}
), est AS (
  SELECT t.term, t.exact_n, MIN(c.cnt) AS cms_n
  FROM exact t CROSS JOIN rows_d
  JOIN cms c ON c.d = rows_d.d AND c.bucket = {probe_cell} % {_CMS_W}
  GROUP BY t.term, t.exact_n
)
SELECT term, exact_n, CAST(cms_n AS BIGINT) AS cms_n,
       CAST(cms_n - exact_n AS BIGINT) AS overestimate
FROM est
ORDER BY exact_n DESC, term
"""


@register(
    "x43_countmin_freq",
    oracle=_cms_oracle(),
    doc=f"Count-min sketch ({_CMS_D}x{_CMS_W} counters, md5-seeded "
    "rows) with a frequency audit over the exact top-20 terms: "
    "estimate = min over rows, one-sided error (cms_n >= exact_n) "
    "quantified per term.",
)
def x43_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.functions.hashing import md5_long_seeded

    # Term-frequency rollup FIRST: the sketch's cell counts are sums of
    # per-term counts (the D md5 digests are functions of the TERM, not
    # the occurrence), so hashing each distinct term once and summing
    # its count gives bit-identical cell totals with md5 work divided
    # by the mean term frequency — and the token stream is never
    # materialized (guide §2.3). The term-grain rollup is pinned: it
    # feeds the sketch AND the exact-count probe. Tokens come from the
    # session tokenized corpus (split once per corpus, §2.4).
    toks = _tok_index(spark, sf_dir).select(
        F.explode("w").alias("term")
    ).filter(F.col("term") != "")
    tf = (
        toks.groupBy("term")
        .agg(F.count("*").alias("exact_n"))
        .localCheckpoint(eager=True)
    )

    cells = tf.select(
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        (md5_long_seeded("term", i) % _CMS_W).alias("bucket"),
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("c"),
    ).select("c.d", "c.bucket", "exact_n")
    cms = cells.groupBy("d", "bucket").agg(F.sum("exact_n").alias("cnt"))

    exact = tf.orderBy(F.desc("exact_n"), F.asc("term")).limit(_CMS_AUDIT_K)
    probe_cells = exact.select(
        "term",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        (md5_long_seeded("term", i) % _CMS_W).alias("bucket"),
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("c"),
    ).select("term", "exact_n", "c.d", "c.bucket")
    est = (
        F.broadcast(probe_cells)
        .join(cms, ["d", "bucket"])
        .groupBy("term", "exact_n")
        .agg(F.min("cnt").alias("cms_n"))
    )
    return est.select(
        "term",
        "exact_n",
        F.col("cms_n").cast("bigint").alias("cms_n"),
        (F.col("cms_n") - F.col("exact_n")).cast("bigint").alias("overestimate"),
    ).orderBy(F.desc("exact_n"), "term")


# ---------------------------------------------------------------------------
# X44 — chunk-duplication census (partial-overlap dedup signal)
#
# Doc-level dedup misses documents that share long passages without
# being near-dups overall (quotes, licenses, syndicated sections).
# This censuses x27's content-addressed chunks across the corpus: the
# copies-per-chunk histogram is the partial-overlap profile a chunk-
# level dedup pass would act on. One groupBy on the 128-bit chunk
# digest — text never shuffles twice — then a tiny histogram rollup.
# ---------------------------------------------------------------------------

from calaveras_uniteus_etl_spark.plans.catalog import REGISTRY as _TEXT_REG

_X27_SQL = _TEXT_REG["x27_doc_chunking"].oracle


@register(
    "x44_chunk_dup_census",
    oracle=f"""
WITH x27 AS ({_X27_SQL}),
occ AS (
  SELECT chunk_md5,
         COUNT(*) AS copies,
         COUNT(DISTINCT doc_id) AS docs
  FROM x27 GROUP BY chunk_md5
)
SELECT copies,
       COUNT(*) AS n_chunk_hashes,
       CAST(SUM(copies) AS BIGINT) AS chunk_instances,
       CAST(SUM(docs) AS BIGINT) AS doc_slots
FROM occ
GROUP BY copies
ORDER BY copies
""",
    doc="Chunk-duplication census over x27's content-addressed chunks: "
    "copies-per-chunk histogram (distinct docs carried alongside) — "
    "the partial-overlap signal doc-level dedup misses.",
)
def x44_chunk_dup_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = x27_doc_chunking(spark, sf_dir)
    occ = chunks.groupBy("chunk_md5").agg(
        F.count("*").alias("copies"),
        F.countDistinct("doc_id").alias("docs"),
    )
    return (
        occ.groupBy("copies")
        .agg(
            F.count("*").alias("n_chunk_hashes"),
            F.sum("copies").cast("bigint").alias("chunk_instances"),
            F.sum("docs").cast("bigint").alias("doc_slots"),
        )
        .orderBy("copies")
    )


# ---------------------------------------------------------------------------
# X47 — BM25 lexical search (top-k for a fixed query)
#
# The retrieval op next to ANN: Okapi BM25 over the corpus for a fixed
# term set. Cross-engine determinism follows x25's micro-unit
# contract: idf (the only transcendental) quantizes once to integer
# micro-nats, the tf-normalization factor — a pure arithmetic function
# of identical integer operands — quantizes to micro-units, and the
# per-doc score is a SUM of exact BIGINT products. Scale shape: tf is
# one groupBy over (doc, query-term) after an explode FILTERED to the
# query terms (the scan never indexes the whole vocabulary), doc
# lengths ride the same pass, df/avgdl are broadcast scalars.
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "table")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20



def _bm25_doc_stats(spark, sf_dir):
    """(doc_id, dl, qtoks) with no per-query tokenize pass at all.

    ``dl`` is the full token count (size of the split array) and
    ``qtoks`` keeps only the query-term tokens, so the token stream is
    never exploded or materialized — the former shape checkpointed
    every (doc_id, term) row just to count lengths and filter ~3 terms
    back out (guide §2.3: shuffle/pin metadata, not payloads). The
    arrays come from the session tokenized corpus (split once per
    corpus); the null-split filter reproduces explode semantics
    exactly (a doc whose normalized text is NULL emitted no token rows
    before).
    """
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return (
        _tok_index(spark, sf_dir).select("doc_id", F.col("w").alias("__w"))
        .filter(F.col("__w").isNotNull())
        .select(
            "doc_id",
            F.size("__w").cast("long").alias("dl"),
            F.expr(f"filter(__w, t -> t in ({terms}))").alias("qtoks"),
        )
        .localCheckpoint(eager=True)
    )


def _bm25_lex_scores(docs):
    """Okapi BM25 lexical scores for the fixed query _BM25_TERMS over a
    ``_bm25_doc_stats`` relation -> (doc_id, score_pico).

    Shared by x47 (pure BM25 top-k) and x59 (the lexical arm of the
    hybrid RRF fusion). avgdl / n_docs ride a lazy 1-row broadcast
    scalar (an eager .first() would be a separate blocking job over
    the pinned doc stats); n_docs - df is exact in double far past
    2^53, so idf_micro is bit-identical to the integer-literal form.
    """
    lens = docs.select("doc_id", "dl")
    stats = lens.agg(
        (F.sum("dl").cast("double") / F.count("*")).alias("__avgdl"),
        F.count("*").cast("double").alias("__n_docs"),
    )
    # query-term-grain rollup off the pinned doc stats; counts equal
    # the former token-stream filter + groupBy exactly
    tf = (
        docs.select("doc_id", F.explode("qtoks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    df_rel = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = df_rel.crossJoin(F.broadcast(stats)).select(
        "term",
        "__avgdl",
        F.round(
            F.log(
                (F.col("__n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1
            )
            * 1e6
        )
        .cast("bigint")
        .alias("idf_micro"),
    )
    tfnorm = F.round(
        F.col("tf")
        / (
            F.col("tf")
            + _BM25_K1
            * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("__avgdl"))
        )
        * 1e6
    ).cast("bigint")
    return (
        tf.join(F.broadcast(idf), "term")
        .join(lens, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(F.col("idf_micro") * tfnorm).alias("score_pico"))
    )


@register(
    "x47_bm25_search",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({NORM_DUCK.format(col="text")}, ' ')) AS term
  FROM documents
), lens AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
         COUNT(*) AS n_docs
  FROM lens
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN {_BM25_TERMS!r}
  GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
), idf AS (
  SELECT term,
         CAST(ROUND(ln((n_docs - df + 0.5) / (df + 0.5) + 1) * 1e6) AS BIGINT)
           AS idf_micro
  FROM df CROSS JOIN stats
), scored AS (
  SELECT tf.doc_id,
         SUM(idf_micro *
             CAST(ROUND(tf / (tf + {_BM25_K1} * (1 - {_BM25_B}
                  + {_BM25_B} * dl / avgdl)) * 1e6) AS BIGINT)) AS score_pico
  FROM tf
  JOIN idf USING (term)
  JOIN lens USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, CAST(score_pico AS BIGINT) AS score_pico
FROM scored
ORDER BY score_pico DESC, doc_id
LIMIT {_BM25_TOPK}
""",
    doc=f"Okapi BM25 top-{_BM25_TOPK} for the fixed query "
    f"{_BM25_TERMS}: query-term-filtered tf pass, broadcast df/avgdl, "
    "idf and tf-norm quantized to exact integer micro-units (x25's "
    "cross-engine log contract), TakeOrdered top-k.",
)
def x47_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _bm25_lex_scores(_bm25_doc_stats(spark, sf_dir))
        .select("doc_id", F.col("score_pico").cast("bigint").alias("score_pico"))
        .orderBy(F.desc("score_pico"), "doc_id")
        .limit(_BM25_TOPK)
    )


# ---------------------------------------------------------------------------
# X48 — exact contamination probes (substring containment)
#
# x18's 13-gram collision catches paraphrase-scale overlap; this is
# the blunt, zero-false-positive complement: does any training doc
# CONTAIN a benchmark probe string verbatim? Probes are 6-word spans
# lifted deterministically from the benchmark docs (doc_id < 5), the
# probe set broadcasts (it is tiny by construction), and the scan is
# one `contains` pass over normalized text — no index, no shuffle of
# text, linear in corpus bytes.
# ---------------------------------------------------------------------------

_X48_SPAN = 6  # words per probe string


@register(
    "x48_exact_contamination",
    oracle=f"""
WITH bench AS (
  SELECT doc_id AS probe_id,
         array_to_string(list_slice(
           string_split({NORM_DUCK.format(col="text")}, ' '), 1, {_X48_SPAN}), ' ')
           AS probe
  FROM documents WHERE doc_id < 5
), train AS (
  SELECT doc_id, {NORM_DUCK.format(col="text")} AS norm
  FROM documents WHERE doc_id >= 5
)
SELECT probe_id, probe,
       CAST(COUNT(CASE WHEN contains(norm, probe) THEN 1 END) AS BIGINT)
         AS contaminated_docs,
       CAST(MIN(CASE WHEN contains(norm, probe) THEN doc_id END) AS BIGINT)
         AS first_doc
FROM bench CROSS JOIN train
GROUP BY probe_id, probe
ORDER BY probe_id
""",
    doc=f"Exact contamination: {_X48_SPAN}-word probe strings lifted "
    "from the benchmark docs (doc_id<5), broadcast `contains` scan "
    "over the train split — the zero-false-positive complement to "
    "x18's n-gram collision check.",
)
def x48_exact_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    norm = F.expr(NORM_SPARK.format(col="text"))
    bench = (
        d.filter(F.col("doc_id") < 5)
        .select(
            F.col("doc_id").alias("probe_id"),
            F.array_join(F.slice(F.split(norm, " "), 1, _X48_SPAN), " ").alias(
                "probe"
            ),
        )
    )
    train = d.filter(F.col("doc_id") >= 5).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).select("doc_id", norm.alias("norm"))
    hit = F.col("norm").contains(F.col("probe"))
    return (
        train.join(F.broadcast(bench))
        .groupBy("probe_id", "probe")
        .agg(
            F.count(F.when(hit, 1)).cast("bigint").alias("contaminated_docs"),
            F.min(F.when(hit, F.col("doc_id"))).cast("bigint").alias("first_doc"),
        )
        .orderBy("probe_id")
    )


# ---------------------------------------------------------------------------
# X49 — token-budget greedy fill (curation under a budget)
#
# "Give me the best docs that fit in N tokens": order the corpus by a
# deterministic quality proxy and admit documents while the running
# token total stays within budget. One ranked cumulative-sum window —
# the same plan shape as g3's running total — with the admission test
# on the PRE-add prefix sum so the first over-budget doc is excluded,
# deterministic on every engine. Output is the per-source composition
# of the admitted set, not the doc list (stable, small).
# ---------------------------------------------------------------------------

_X49_BUDGET = 50_000  # token budget


@register(
    "x49_token_budget_fill",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, source,
         len(string_split({NORM_DUCK.format(col="text")}, ' ')) AS n_tokens,
         length(text) - length(replace(text, ' ', '')) AS quality_proxy
  FROM documents
), ranked AS (
  SELECT *,
         SUM(n_tokens) OVER (ORDER BY quality_proxy DESC, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prior_tokens
  FROM scored
), admitted AS (
  SELECT * FROM ranked
  WHERE COALESCE(prior_tokens, 0) + n_tokens <= {_X49_BUDGET}
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens
FROM admitted
GROUP BY source
ORDER BY source
""",
    doc=f"Token-budget curation: admit docs in deterministic quality "
    f"order while the running total fits {_X49_BUDGET} tokens (prefix-"
    "sum window, first over-budget doc excluded); reports the "
    "admitted set's per-source composition.",
)
def x49_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.operators.prefix import prefix_rank

    d = table(spark, sf_dir, "documents")
    norm = F.expr(NORM_SPARK.format(col="text"))
    scored = d.select(
        "doc_id",
        "source",
        F.size(F.split(norm, " ")).alias("n_tokens"),
        (
            F.length("text") - F.length(F.replace(F.col("text"), F.lit(" ")))
        ).alias("quality_proxy"),
    )
    # The prefix sum runs over EVERY document, so it uses the
    # distributed two-phase operator, not a single-partition global
    # window. Inclusive running total ≤ budget ≡ the oracle's
    # COALESCE(exclusive, 0) + n_tokens ≤ budget; token counts are
    # integers, so the re-association is exact.
    ranked = prefix_rank(
        scored,
        [F.desc("quality_proxy"), F.asc("doc_id")],
        "n_tokens",
        cum_col="cum_tokens",
        # regex-normalize+tokenize scoring pass would run 2x in the
        # range boundary sampling
        pin_input=True,
    )
    admitted = ranked.filter(F.col("cum_tokens") <= _X49_BUDGET)
    return (
        admitted.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X50 — per-document curation manifest (the pipeline's endpoint)
#
# x21 reports the funnel's stage COUNTS; this emits the per-document
# VERDICT — keep or the first failing stage — which is the artifact a
# downstream trainer actually consumes (and the audit trail a data
# steward reviews). Same one-text-pass flags as x21 (shared stage
# definitions), one digest-window shuffle, deterministic everywhere.
# ---------------------------------------------------------------------------

_X50_REASON_SQL = """CASE
  WHEN NOT is_keeper THEN 'drop:exact_dup'
  WHEN lang_pred = 'und' THEN 'drop:lang_unknown'
  WHEN n_tokens < 15 THEN 'drop:quality'
  ELSE 'keep:' || split END"""


@register(
    "x50_curation_manifest",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, text, md5(text) AS digest,
         {NORM_DUCK.format(col="text")} AS norm,
         string_split({NORM_DUCK.format(col="text")}, ' ') AS w
  FROM documents
), flags AS (
  SELECT doc_id,
         doc_id = MIN(doc_id) OVER (PARTITION BY digest) AS is_keeper,
         CASE WHEN norm = '' THEN 0 ELSE len(w) END AS n_tokens,
         {_X7_PRED_DUCK} AS lang_pred,
         CASE WHEN {_fold("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 90
              THEN 'train'
              WHEN {_fold("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 95
              THEN 'val' ELSE 'test' END AS split
  FROM toks
)
SELECT doc_id,
       {_X50_REASON_SQL} AS verdict,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM flags
ORDER BY doc_id
""",
    doc="Per-document curation manifest: keep (with split) or the "
    "first failing stage (exact dup / unknown lang / quality floor) — "
    "x21's shared stage logic surfaced at document grain, the artifact "
    "a trainer consumes.",
)
def x50_curation_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    norm = NORM_SPARK.format(col="text")
    bucket = (
        "cast(conv(substr(md5(concat('split:', cast(doc_id as string))), 1, 15), 16, 10)"
        " as bigint) % 100"
    )
    flags = (
        d.withColumn("norm", F.expr(norm))
        .withColumn("w", F.expr("split(norm, ' ')"))
        .select(
            "doc_id",
            F.md5("text").alias("digest"),
            F.expr("case when norm = '' then 0 else size(w) end")
            .cast("long")
            .alias("n_tokens"),
            F.expr(_X7_PRED_SPARK).alias("lang_pred"),
            F.expr(
                f"case when {bucket} < 90 then 'train' "
                f"when {bucket} < 95 then 'val' else 'test' end"
            ).alias("split"),
        )
        .withColumn(
            "is_keeper",
            F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("digest")),
        )
    )
    verdict = F.expr(
        "CASE WHEN NOT is_keeper THEN 'drop:exact_dup' "
        "WHEN lang_pred = 'und' THEN 'drop:lang_unknown' "
        "WHEN n_tokens < 15 THEN 'drop:quality' "
        "ELSE concat('keep:', split) END"
    )
    return flags.select(
        "doc_id", verdict.alias("verdict"), F.col("n_tokens").cast("bigint")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# X54 — training-shard assignment balance
#
# The write-side check before emitting training shards: assign every
# doc to one of N shards by a salted hash (reshard-stable, engine-
# identical) and verify the doc/token balance across shards — skewed
# shards starve data loaders. Shares divide exact integer totals.
# ---------------------------------------------------------------------------

_X54_SHARDS = 8


@register(
    "x54_shard_balance",
    oracle=f"""
WITH assigned AS (
  SELECT {_fold("'shard:' || CAST(doc_id AS VARCHAR)")} % {_X54_SHARDS} AS shard,
         len(string_split({NORM_DUCK.format(col="text")}, ' ')) AS n_tokens
  FROM documents
), tot AS (
  SELECT COUNT(*) AS all_docs, SUM(n_tokens) AS all_tokens FROM assigned
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_tokens) AS DOUBLE) / all_tokens AS token_share
FROM assigned CROSS JOIN tot
GROUP BY shard, all_tokens
ORDER BY shard
""",
    doc=f"Shard balance: md5-salted assignment of docs to "
    f"{_X54_SHARDS} training shards with per-shard doc/token counts "
    "and token share — the loader-starvation check before writing "
    "shards.",
)
def x54_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    shard = F.expr(
        "cast(conv(substr(md5(concat('shard:', cast(doc_id as string))), 1, 15),"
        f" 16, 10) as bigint) % {_X54_SHARDS}"
    )
    assigned = _tok_index(spark, sf_dir).select(
        shard.alias("shard"), F.size("w").alias("n_tokens")
    )
    # corpus token total as a lazy 1-row broadcast scalar — an eager
    # .first() would scan+tokenize documents once just for the literal
    tot = assigned.agg(F.sum("n_tokens").cast("double").alias("__all_tokens"))
    return (
        assigned.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("n_tokens").cast("double").alias("__shard_tokens"),
        )
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "token_share", F.col("__shard_tokens") / F.col("__all_tokens")
        )
        .drop("__shard_tokens", "__all_tokens")
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# X58 — bigram LM scoring (CCNet-style perplexity filter, one order up
# from x25's unigram model).
#
# Per-document mean conditional log-probability under an add-one-
# smoothed bigram model trained on the corpus itself: p(w2|w1) =
# (c(w1,w2)+1) / (c(w1)+V). The standard quality gate for web-scale
# pretraining data (Wenzek et al. 2020, "CCNet") keeps low-perplexity
# documents; this computes the score columnarly — bigrams come from a
# zip of the shifted token array (no self-join), the bigram-count
# relation is corpus-sized so it joins back by SHUFFLE on (w1,w2)
# (data-sized state is never broadcast), and the per-doc rollup
# aggregates map-side. Probabilities round to micro-nat BIGINTs (the
# x25 trick) so the sum is order-independent and engine-exact.
# ---------------------------------------------------------------------------


@register(
    "x58_bigram_logprob",
    oracle=f"""
WITH docs AS (
  SELECT doc_id, string_split({NORM_DUCK.format(col="text")}, ' ') AS w
  FROM documents
), toks AS (
  SELECT doc_id, unnest(w) AS term FROM docs
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(len(w) - 1),
                i -> struct_pack(w1 := w[i + 1], w2 := w[i + 2]))) AS b
  FROM docs WHERE len(w) >= 2
), bge AS (
  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg
), cu AS (
  SELECT term, COUNT(*) AS c1 FROM toks GROUP BY term
), vocab AS (
  SELECT COUNT(*) AS v FROM cu
), cbg AS (
  SELECT w1, w2, COUNT(*) AS c2 FROM bge GROUP BY w1, w2
), lp AS (
  SELECT cbg.w1, cbg.w2,
         CAST(ROUND(ln((CAST(c2 AS DOUBLE) + 1)
                       / (CAST(c1 AS DOUBLE) + v)) * 1e6) AS BIGINT)
           AS lp_micro
  FROM cbg JOIN cu ON cu.term = cbg.w1 CROSS JOIN vocab
)
SELECT e.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(lp.lp_micro) AS BIGINT) AS lp_micro_sum,
       CAST(SUM(lp.lp_micro) AS DOUBLE) / (1e6 * COUNT(*)) AS avg_logprob
FROM bge e JOIN lp ON lp.w1 = e.w1 AND lp.w2 = e.w2
GROUP BY e.doc_id
""",
    doc="Per-doc mean bigram conditional log-prob, add-one smoothing "
    "over the corpus LM (micro-nat BIGINT arithmetic; bigrams from "
    "a shifted-array zip, counts joined back by shuffle).",
)
def x58_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The normalized word arrays feed the unigram stream AND both
    # bigram consumers (counts + the scoring join): all read the
    # session tokenized corpus — already a pinned leaf, so the
    # downstream explodes re-run over pinned blocks (cheap).
    docs = _tok_index(spark, sf_dir).select("doc_id", "w")
    toks = docs.select("doc_id", F.explode("w").alias("term"))
    bge = (
        docs.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(w, 1, size(w) - 1), "
                    "slice(w, 2, size(w) - 1), "
                    "(a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    # Unigram counts feed the vocab-size scalar AND the smoothing
    # join: pin the vocabulary-sized rollup once (x25's r11 pattern).
    cu = (
        toks.groupBy("term")
        .agg(F.count("*").alias("c1"))
        .localCheckpoint(eager=True)
    )
    vsz = cu.agg(F.count("*").cast("double").alias("__v"))
    cbg = bge.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    lp = (
        cbg.join(cu, cbg.w1 == cu.term)
        .crossJoin(F.broadcast(vsz))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("c2").cast("double") + F.lit(1.0))
                    / (F.col("c1").cast("double") + F.col("__v"))
                )
                * 1e6
            )
            .cast("bigint")
            .alias("lp_micro"),
        )
    )
    # lp is corpus-vocabulary-sized: shuffle join on the bigram key
    # (broadcast would ship data-sized state to every executor)
    return (
        bge.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum("lp_micro").cast("bigint").alias("lp_micro_sum"),
            (F.sum("lp_micro").cast("double") / (1e6 * F.count("*"))).alias(
                "avg_logprob"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X59 — hybrid retrieval: reciprocal-rank fusion of BM25 and cosine
#
# The standard production retrieval stack (Cormack et al. 2009 RRF;
# every hybrid search engine since): a lexical ranking and a semantic
# ranking computed independently, fused by summed reciprocal ranks
# score = Σ 1/(60 + rank). Ranks are ROW_NUMBER under total orders
# (score DESC, doc_id), the fusion term is quantized to micro-units
# (ROUND(1e6/(60+r)) — .5 ties round identically half-away in both
# engines), and the two rankings meet in a FULL OUTER join on doc_id
# so docs found by only one ranker still score. embeddings.vec_id is
# documents.doc_id grain, so the fusion key is shared.
#
# Scale shape: each ranker's global ORDER BY is rank assignment over
# an already-aggregated doc-grain relation (corpus-sized, not
# token-sized); the fusion join carries (doc_id, rank) pairs only;
# top-k is TakeOrderedAndProject.
# ---------------------------------------------------------------------------

_X59_PROBE = 7  # vec_id whose embedding is the semantic query
_X59_RRF_K = 60
_X59_TOPK = 20
_X59_CAND = 100  # per-ranker candidate cutoff before rank assignment


@register(
    "x59_hybrid_rrf",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({NORM_DUCK.format(col="text")}, ' ')) AS term
  FROM documents
), lens AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
         COUNT(*) AS n_docs
  FROM lens
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN {_BM25_TERMS!r}
  GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
), idf AS (
  SELECT term,
         CAST(ROUND(ln((n_docs - df + 0.5) / (df + 0.5) + 1) * 1e6) AS BIGINT)
           AS idf_micro
  FROM df CROSS JOIN stats
), lex AS (
  SELECT tf.doc_id,
         SUM(idf_micro *
             CAST(ROUND(tf / (tf + {_BM25_K1} * (1 - {_BM25_B}
                  + {_BM25_B} * dl / avgdl)) * 1e6) AS BIGINT)) AS score_pico
  FROM tf
  JOIN idf USING (term)
  JOIN lens USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id
), lexrank AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score_pico DESC, doc_id) AS r
  FROM (SELECT * FROM lex ORDER BY score_pico DESC, doc_id
        LIMIT {_X59_CAND})
), probe AS (
  SELECT embedding AS q FROM embeddings WHERE vec_id = {_X59_PROBE}
), semrank AS (
  SELECT vec_id AS doc_id,
         ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS r
  FROM (
    SELECT e.vec_id,
           ROUND(list_dot_product(p.q, e.embedding)
                 / NULLIF(sqrt(list_dot_product(p.q, p.q))
                          * sqrt(list_dot_product(e.embedding, e.embedding)),
                          0),
                 4) AS cos
    FROM embeddings e CROSS JOIN probe p
    WHERE e.vec_id <> {_X59_PROBE}
    ORDER BY cos DESC, e.vec_id
    LIMIT {_X59_CAND}
  )
)
SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
       CAST(COALESCE(l.r, 0) AS BIGINT) AS lex_rank,
       CAST(COALESCE(s.r, 0) AS BIGINT) AS sem_rank,
       CAST(COALESCE(CAST(ROUND(1e6 / ({_X59_RRF_K} + l.r)) AS BIGINT), 0)
          + COALESCE(CAST(ROUND(1e6 / ({_X59_RRF_K} + s.r)) AS BIGINT), 0)
          AS BIGINT) AS rrf_micro
FROM lexrank l
FULL JOIN semrank s USING (doc_id)
ORDER BY rrf_micro DESC, doc_id
LIMIT {_X59_TOPK}
""",
    doc=f"Hybrid retrieval top-{_X59_TOPK}: BM25 ranking fused with "
    f"cosine-to-probe ranking by reciprocal-rank fusion "
    f"(k={_X59_RRF_K}, micro-unit quantized). Each ranker takes its "
    f"top-{_X59_CAND} via TakeOrderedAndProject before rank "
    "assignment, so the global window sorts a bounded candidate set; "
    "full-outer fusion join on doc-grain rank pairs (x47 lexical, "
    "x5 semantic shapes).",
)
def x59_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.plans.queries_similarity import _dot

    lex = _bm25_lex_scores(_bm25_doc_stats(spark, sf_dir))
    # Candidate cutoff FIRST (TakeOrderedAndProject — a per-partition
    # top-N reduce, no all-rows single-partition shuffle), so the
    # global ROW_NUMBER window only ever sorts _X59_CAND rows.
    lexrank = (
        lex.orderBy(F.desc("score_pico"), "doc_id")
        .limit(_X59_CAND)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("score_pico"), "doc_id"))
            .alias("lex_r"),
        )
    )

    e = table(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == _X59_PROBE).select(
        F.col("embedding").alias("q")
    )
    cos = F.round(
        _dot("q", "embedding")
        / F.nullif(
            F.sqrt(_dot("q", "q")) * F.sqrt(_dot("embedding", "embedding")),
            F.lit(0.0),
        ),
        4,
    )
    semrank = (
        e.filter(F.col("vec_id") != _X59_PROBE)
        .crossJoin(F.broadcast(probe))  # 1-row probe: broadcast by construction
        .select(F.col("vec_id").alias("doc_id"), cos.alias("cos"))
        .orderBy(F.desc("cos"), "doc_id")
        .limit(_X59_CAND)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("cos"), "doc_id"))
            .alias("sem_r"),
        )
    )

    rrf = lambda r: F.coalesce(  # noqa: E731
        F.round(F.lit(1e6) / (F.lit(_X59_RRF_K) + r)).cast("bigint"), F.lit(0)
    )
    return (
        lexrank.join(semrank, "doc_id", "full")
        .select(
            "doc_id",
            F.coalesce("lex_r", F.lit(0)).cast("bigint").alias("lex_rank"),
            F.coalesce("sem_r", F.lit(0)).cast("bigint").alias("sem_rank"),
            (rrf(F.col("lex_r")) + rrf(F.col("sem_r")))
            .cast("bigint")
            .alias("rrf_micro"),
        )
        .orderBy(F.desc("rrf_micro"), "doc_id")
        .limit(_X59_TOPK)
    )


# ---------------------------------------------------------------------------
# X60 — BPE merge-candidate counting (tokenizer-training inner loop)
#
# One round of byte-pair-encoding training reduced to its scale-
# critical step: count adjacent symbol pairs across the corpus and
# surface the top merge candidates. The trick that survives 100 TB is
# the grain change BEFORE the expensive explode: aggregate the token
# stream to the VOCABULARY first (word, n_uses) — vocab size grows
# ~O(corpus^0.5) (Heaps' law), so the pair explode and the pair
# shuffle run on vocab-grain rows weighted by n_uses, never on the
# raw token stream. This is exactly how production BPE trainers
# (SentencePiece, HF tokenizers) structure the count.
# ---------------------------------------------------------------------------

_X60_TOPK = 25
_X60_MIN_WORD = 2


@register(
    "x60_bpe_pair_counts",
    oracle=f"""
WITH toks AS (
  SELECT unnest(string_split({NORM_DUCK.format(col="text")}, ' ')) AS word
  FROM documents
), vocab AS (
  SELECT word, COUNT(*) AS n_uses FROM toks
  WHERE length(word) >= {_X60_MIN_WORD}
  GROUP BY word
), pairs AS (
  SELECT unnest(list_transform(range(length(word) - 1),
                               i -> substr(word, i + 1, 2))) AS pair,
         n_uses
  FROM vocab
)
SELECT pair, CAST(SUM(n_uses) AS BIGINT) AS n_pairs
FROM pairs
GROUP BY pair
ORDER BY n_pairs DESC, pair
LIMIT {_X60_TOPK}
""",
    doc=f"Top-{_X60_TOPK} BPE merge candidates: adjacent character "
    "pairs counted corpus-wide. Token stream collapses to vocab "
    "grain first (Heaps'-law shrink), so the pair explode/shuffle "
    "carries (word, n_uses) rows only.",
)
def x60_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    vocab = (
        _tok_index(spark, sf_dir)
        .select(F.explode("w").alias("word"))
        .filter(F.length("word") >= _X60_MIN_WORD)
        .groupBy("word")
        .agg(F.count("*").alias("n_uses"))
    )
    pairs = vocab.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
        "n_uses",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n_uses").cast("bigint").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "pair")
        .limit(_X60_TOPK)
    )


# ---------------------------------------------------------------------------
# X68 — vocabulary coverage / OOV audit (tokenizer-fit per source)
#
# Before committing to a tokenizer vocabulary, measure what it covers:
# with the vocab fixed to the corpus's top-V terms (x22's universe),
# the per-source out-of-vocabulary token rate tells you which sources
# a V-sized vocab under-serves (code, non-Latin scripts, noisy OCR).
# Shape: the vocab is a V-row broadcast; the corpus side is one token
# explode + left-semi-style membership flag + per-source aggregate —
# no shuffle wider than (source, 2 counters).
# ---------------------------------------------------------------------------

_X68_VOCAB = 500


@register(
    "x68_vocab_coverage",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, unnest(string_split({NORM_DUCK.format(col="text")}, ' ')) AS term
  FROM documents
), toks_ne AS (
  SELECT doc_id, source, term FROM toks WHERE term <> ''
), tf AS (
  SELECT term, COUNT(*) AS tf FROM toks_ne GROUP BY term
), vocab AS (
  SELECT term FROM tf ORDER BY tf DESC, term LIMIT {_X68_VOCAB}
)
SELECT source,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS oov_tokens,
       ROUND(CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS oov_rate
FROM toks_ne t LEFT JOIN vocab v ON t.term = v.term
GROUP BY source
ORDER BY source
""",
    doc=f"Per-source out-of-vocabulary rate against the corpus top-"
    f"{_X68_VOCAB} vocabulary: the tokenizer-fit audit that flags "
    "sources a fixed-size vocab under-serves. Vocab is a broadcast "
    "top-k; the corpus pass is one explode + membership aggregate.",
)
def x68_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    toks = (
        _tok_index(spark, sf_dir)
        .select("source", F.explode("w").alias("term"))
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy("term").agg(F.count("*").alias("tf"))
    vocab = (
        tf.orderBy(F.desc("tf"), F.asc("term"))
        .limit(_X68_VOCAB)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("oov_tokens"),
            F.round(
                F.sum(
                    F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
                ).cast("double")
                / F.count("*"),
                4,
            ).alias("oov_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X70 — Gopher-style quality gate (rule battery with per-rule counts)
#
# The document-level heuristic filter suite from Rae et al. 2021
# ("Scaling Language Models: ... Gopher", §A1.1), re-expressed as one
# relational pass: every rule is a boolean over per-doc integer
# counters, aggregated to per-rule failure counts plus the pass-all
# retention rate. x8 scores documents; THIS gates them — the form a
# curation pipeline actually applies before training. All rule
# comparisons are integer cross-multiplications (no float thresholds:
# "mean word length in [3,10]" is 3·n ≤ chars ≤ 10·n), so the result
# hashes identically on both engines; the single double is the final
# retention ratio (IEEE division of identical ints). One scan, one
# 1-row aggregate — map-side partials make it corpus-size-proof.
# ---------------------------------------------------------------------------

_X70_STOP_ALL = ", ".join(
    f"'{t}'" for ts in _STOPWORDS.values() for t in ts
)
_X70_MIN_WORDS, _X70_MAX_WORDS = 30, 50_000


def _x70_flags(n, chars, stop, alpha, digits, normlen) -> dict[str, str]:
    """Rule → fail-predicate SQL, identical text in both dialects."""
    return {
        "fail_word_count": f"({n} < {_X70_MIN_WORDS} OR {n} > {_X70_MAX_WORDS})",
        "fail_mean_word_len": f"(3 * {n} > {chars} OR {chars} > 10 * {n})",
        "fail_min_stopwords": f"({stop} < 2)",
        "fail_alpha_frac": f"(10 * {alpha} < 8 * {n})",
        "fail_digit_frac": f"(5 * {digits} > {normlen})",
    }


_X70_FLAGS = _x70_flags("n", "chars", "stop", "alpha", "digits", "normlen")
_X70_FAIL_ANY = " OR ".join(_X70_FLAGS.values())


@register(
    "x70_gopher_quality_gate",
    oracle=f"""
WITH m AS (
  SELECT len(w) AS n,
         length(norm) - (len(w) - 1) AS chars,
         len(list_filter(w, t -> t IN ({_X70_STOP_ALL}))) AS stop,
         len(list_filter(w, t -> regexp_matches(t, '[a-z]'))) AS alpha,
         length(norm) - length(regexp_replace(norm, '[0-9]', '', 'g')) AS digits,
         length(norm) AS normlen
  FROM (
    SELECT {NORM_DUCK.format(col="text")} AS norm,
           string_split({NORM_DUCK.format(col="text")}, ' ') AS w
    FROM documents
  )
)
SELECT COUNT(*) AS n_docs,
       {", ".join(f"CAST(SUM(CASE WHEN {p} THEN 1 ELSE 0 END) AS BIGINT) AS {r}" for r, p in _X70_FLAGS.items())},
       CAST(SUM(CASE WHEN NOT ({_X70_FAIL_ANY}) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pass_all,
       CAST(SUM(CASE WHEN NOT ({_X70_FAIL_ANY}) THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS retention_rate
FROM m
""",
    doc="Gopher rule battery (Rae et al. 2021 A1.1): word-count bounds, "
    "mean-word-length 3-10, >=2 stopwords, >=80% alphabetic words, "
    "<=20% digit chars — per-rule failure counts and pass-all "
    "retention in one integer-arithmetic aggregate pass.",
)
def x70_gopher_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    norm_sql = NORM_SPARK.format(col="text")
    m = d.select(
        F.expr(norm_sql).alias("norm"),
        F.expr(f"split({norm_sql}, ' ')").alias("w"),
    ).select(
        F.expr("size(w)").alias("n"),
        F.expr("length(norm) - (size(w) - 1)").alias("chars"),
        F.expr(f"size(filter(w, t -> t in ({_X70_STOP_ALL})))").alias("stop"),
        F.expr("size(filter(w, t -> t rlike '[a-z]'))").alias("alpha"),
        F.expr(
            "length(norm) - length(regexp_replace(norm, '[0-9]', ''))"
        ).alias("digits"),
        F.length("norm").alias("normlen"),
    )
    aggs = [F.count("*").alias("n_docs")]
    for rule, pred in _X70_FLAGS.items():
        aggs.append(
            F.sum(F.when(F.expr(pred), 1).otherwise(0)).cast("bigint").alias(rule)
        )
    pass_all = F.when(~F.expr(_X70_FAIL_ANY), 1).otherwise(0)
    aggs.append(F.sum(pass_all).cast("bigint").alias("n_pass_all"))
    aggs.append(
        (F.sum(pass_all).cast("double") / F.count("*")).alias("retention_rate")
    )
    return m.agg(*aggs)


# ---------------------------------------------------------------------------
# X75 — weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res)
#
# x30 draws a Bernoulli sample (each doc independently, sample size
# varies); A-Res draws EXACTLY k docs per source with probability
# proportional to weight and without replacement — the curation
# primitive for "pick the best k representatives, longer docs more
# likely". Key = −ln(u)/w (the exponential race): the k smallest keys
# are the sample. u derives from the doc's md5 (deterministic, no
# query-time randomness), w = n_chars.
#
# Determinism: u = (md5_long+1)/2⁶⁰ is exact in both engines; ln()
# agrees to 1 ulp (~1e-16 relative), so the key is quantized to
# picoseconds of the race clock (round(key·1e12) → BIGINT): the 1-ulp
# disagreement is ~8 orders of magnitude below the quantum, and all
# ranking is integer with doc_id tiebreak.
#
# Scale shape: the per-source selection reuses the two-phase bottom-k
# idiom (x72): partition-local row_number bounds every sort by the
# partition, survivors (≤ k·P per source) merge on a tiny relation —
# low-cardinality source grouping never becomes a data-sized sort.
# ---------------------------------------------------------------------------

_X75_K = 10
_X75_SCALE = 1_000_000_000_000  # picoscale race clock


@register(
    "x75_ares_sample",
    oracle=f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         CAST(round(-ln((({{h}}) + 1) / 1152921504606846976.0)
                    / n_chars * {_X75_SCALE}) AS BIGINT) AS key_pico
  FROM documents WHERE n_chars > 0
), ranked AS (
  SELECT source, doc_id, n_chars, key_pico,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY key_pico, doc_id) AS rank
  FROM keyed
)
SELECT source, rank, doc_id, n_chars, key_pico
FROM ranked WHERE rank <= {_X75_K}
ORDER BY source, rank
""".format(
        h=__import__(
            "calaveras_uniteus_etl_spark.functions.hashing",
            fromlist=["duckdb_md5_long_sql"],
        ).duckdb_md5_long_sql("'ares:' || CAST(doc_id AS VARCHAR)")
    ),
    doc=f"A-Res weighted reservoir: exactly {_X75_K} docs per source, "
    "probability ∝ n_chars, without replacement — exponential-race "
    "keys −ln(u)/w from the doc md5, picosecond-quantized BIGINT "
    "ranking, two-phase bottom-k selection (no data-sized sort).",
)
def x75_ares_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.functions.hashing import md5_long

    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select("source", "doc_id", "n_chars")
    )
    u = (md5_long(F.concat(F.lit("ares:"), F.col("doc_id").cast("string"))) + 1) / F.lit(
        float(1 << 60)
    )
    keyed = d.withColumn(
        "key_pico",
        F.round(-F.log(u) / F.col("n_chars") * _X75_SCALE).cast("bigint"),
    )
    # two-phase bottom-k per source (x72's idiom)
    w1 = Window.partitionBy("source", "pid").orderBy("key_pico", "doc_id")
    local = (
        keyed.withColumn("pid", F.spark_partition_id())
        .withColumn("lrn", F.row_number().over(w1))
        .filter(F.col("lrn") <= _X75_K)
        .drop("pid", "lrn")
    )
    w2 = Window.partitionBy("source").orderBy("key_pico", "doc_id")
    return (
        local.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= _X75_K)
        .select("source", "rank", "doc_id", "n_chars", "key_pico")
        .orderBy("source", "rank")
    )


# ---------------------------------------------------------------------------
# X79 — per-source token entropy / perplexity (corpus diversity audit)
#
# The mixture-design question x28 weights answer: how DIVERSE is each
# source's token distribution? Shannon entropy H = −Σ p·ln p over the
# source's unigram distribution, surfaced with vocab size, TTR, and
# perplexity e^H. Summing ln-terms in floating point is reduction-
# order poison, so the x25/x58 micro-nat contract applies: each
# term's −ln(cnt/total) quantizes to an integer micro-nat, the
# per-source sum is Σ cnt·q — exact BIGINT — and only the final
# normalization divides identical operands. Perplexity rounds to 4dp
# (exp agrees to 1 ulp; rounding collapses it).
#
# Scale shape: one (source, term) shuffle with map-side combine; the
# per-source totals join is |sources| rows, broadcast.
# ---------------------------------------------------------------------------


@register(
    "x79_source_entropy",
    oracle=f"""
WITH toks AS (
  SELECT source, unnest(string_split({NORM_DUCK.format(col="text")}, ' ')) AS term
  FROM documents
), tf AS (
  SELECT source, term, COUNT(*) AS cnt FROM toks
  WHERE term <> '' GROUP BY source, term
), tot AS (
  SELECT source, CAST(SUM(cnt) AS BIGINT) AS total FROM tf GROUP BY source
), q AS (
  SELECT tf.source, tf.cnt,
         CAST(round(-ln(CAST(tf.cnt AS DOUBLE) / tot.total) * 1000000)
              AS BIGINT) AS q_micro
  FROM tf JOIN tot USING (source)
)
SELECT q.source AS source,
       MAX(tot.total) AS n_tokens,
       COUNT(*) AS vocab_size,
       CAST(COUNT(*) AS DOUBLE) / MAX(tot.total) AS type_token_ratio,
       CAST(SUM(q.cnt * q.q_micro) AS DOUBLE) / (1000000.0 * MAX(tot.total))
         AS entropy_nats,
       ROUND(exp(CAST(SUM(q.cnt * q.q_micro) AS DOUBLE)
                 / (1000000.0 * MAX(tot.total))), 4) AS perplexity
FROM q JOIN tot USING (source)
GROUP BY q.source
ORDER BY q.source
""",
    doc="Per-source Shannon entropy of the unigram distribution "
    "(micro-nat integer contract: exact BIGINT Σ cnt·q), vocab size, "
    "type-token ratio, and 4dp perplexity — the diversity signal "
    "behind mixture weighting.",
)
def x79_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    toks = (
        _tok_index(spark, sf_dir)
        .select("source", F.explode("w").alias("term"))
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy("source", "term").agg(F.count("*").alias("cnt"))
    tot = tf.groupBy("source").agg(F.sum("cnt").cast("bigint").alias("total"))
    q = tf.join(F.broadcast(tot), "source").select(
        "source",
        "cnt",
        F.round(-F.log(F.col("cnt").cast("double") / F.col("total")) * 1e6)
        .cast("bigint")
        .alias("q_micro"),
    )
    ent = F.sum(F.col("cnt") * F.col("q_micro")).cast("double") / (
        1e6 * F.max("total")
    )
    return (
        q.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.max("total").alias("n_tokens"),
            F.count("*").alias("vocab_size"),
            (F.count("*").cast("double") / F.max("total")).alias(
                "type_token_ratio"
            ),
            ent.alias("entropy_nats"),
            F.round(F.exp(ent), 4).alias("perplexity"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X80 — Heaps-law vocabulary growth curve (vocab vs corpus size)
#
# The tokenizer/vocab-sizing audit: how fast does the vocabulary grow
# as the corpus grows? Scan the corpus in ingest order (doc_id),
# checkpoint at every decile, report cumulative docs/tokens/distinct
# terms. Relationally: a term contributes to the vocabulary at its
# FIRST doc (min doc_id) — one aggregate — then both tokens and
# first-occurrences histogram into doc-id deciles and cumulative-sum
# over a 10-row relation (window over a constant-size grain, scale-
# free). All integers.
# ---------------------------------------------------------------------------


@register(
    "x80_heaps_law_curve",
    oracle=f"""
WITH n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), toks AS (
  SELECT doc_id, unnest(string_split({NORM_DUCK.format(col="text")}, ' ')) AS term
  FROM documents
), tok_b AS (
  SELECT LEAST(9, CAST(floor(doc_id * 10 / n.n_docs) AS INT)) AS decile,
         COUNT(*) AS n_tokens
  FROM toks CROSS JOIN n WHERE term <> '' GROUP BY 1
), firsts AS (
  SELECT term, MIN(doc_id) AS first_doc FROM toks WHERE term <> '' GROUP BY term
), voc_b AS (
  SELECT LEAST(9, CAST(floor(first_doc * 10 / n.n_docs) AS INT)) AS decile,
         COUNT(*) AS new_terms
  FROM firsts CROSS JOIN n GROUP BY 1
), doc_b AS (
  SELECT LEAST(9, CAST(floor(doc_id * 10 / n.n_docs) AS INT)) AS decile,
         COUNT(*) AS n_docs
  FROM documents CROSS JOIN n GROUP BY 1
)
SELECT d.decile AS decile,
       CAST(SUM(d.n_docs) OVER w AS BIGINT) AS docs_cum,
       CAST(SUM(COALESCE(t.n_tokens, 0)) OVER w AS BIGINT) AS tokens_cum,
       CAST(SUM(COALESCE(v.new_terms, 0)) OVER w AS BIGINT) AS vocab_cum
FROM doc_b d
LEFT JOIN tok_b t ON t.decile = d.decile
LEFT JOIN voc_b v ON v.decile = d.decile
WINDOW w AS (ORDER BY d.decile ROWS UNBOUNDED PRECEDING)
ORDER BY decile
""",
    doc="Heaps-law audit: cumulative docs/tokens/vocabulary at corpus "
    "deciles in ingest order — term joins the vocab at its min doc_id; "
    "the only window runs over the 10-row decile grain.",
)
def x80_heaps_law_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    d = _tok_index(spark, sf_dir)
    n_docs = d.count()  # scalar job over the pinned leaf, x25's pattern
    dec = lambda c: F.least(F.lit(9), (c * 10 / n_docs).cast("int"))  # noqa: E731
    toks = (
        d.select("doc_id", F.explode("w").alias("term"))
        .filter(F.col("term") != "")
    )
    tok_b = toks.groupBy(dec(F.col("doc_id")).alias("decile")).agg(
        F.count("*").alias("n_tokens")
    )
    voc_b = (
        toks.groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(dec(F.col("first_doc")).alias("decile"))
        .agg(F.count("*").alias("new_terms"))
    )
    doc_b = d.groupBy(dec(F.col("doc_id")).alias("decile")).agg(
        F.count("*").alias("n_docs")
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        doc_b.join(tok_b, "decile", "left")
        .join(voc_b, "decile", "left")
        .select(
            "decile",
            F.sum("n_docs").over(w).cast("bigint").alias("docs_cum"),
            F.sum(F.coalesce("n_tokens", F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("tokens_cum"),
            F.sum(F.coalesce("new_terms", F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("vocab_cum"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# X81 — per-source KL divergence from the corpus distribution
#
# x79 measures each source's internal diversity; THIS measures how far
# each source's unigram distribution sits from the corpus-wide one —
# KL(P_src ‖ P_corpus) = Σ p·ln(p/q), the domain-relevance signal DSIR
# (x31) scores documents with, here at source grain for mixture
# design. Terms the corpus has but the source lacks contribute 0
# (p = 0); every source term exists in the corpus by construction, so
# q > 0 and the ratio is always finite.
#
# Determinism: the x25/x58/x79 micro-nat contract — per-term
# ln((cnt_src·total_corpus)/(cnt_corpus·total_src)) quantizes to an
# integer micro-nat (the argument is a division of identical exact
# doubles; products stay < 2^53), the per-source sum is exact BIGINT
# Σ cnt·q, and the final normalization divides identical operands.
# Scale shape: one (source, term) aggregate, one term aggregate, a
# broadcast join of the (vocab-sized) corpus counts onto the source
# counts, one rollup.
# ---------------------------------------------------------------------------


@register(
    "x81_source_kl",
    oracle=f"""
WITH toks AS (
  SELECT source, unnest(string_split({NORM_DUCK.format(col="text")}, ' ')) AS term
  FROM documents
), tf AS (
  SELECT source, term, COUNT(*) AS cnt FROM toks
  WHERE term <> '' GROUP BY source, term
), corpus AS (
  SELECT term, CAST(SUM(cnt) AS BIGINT) AS ccnt FROM tf GROUP BY term
), tot AS (
  SELECT source, CAST(SUM(cnt) AS BIGINT) AS total FROM tf GROUP BY source
), grand AS (
  SELECT CAST(SUM(ccnt) AS BIGINT) AS g FROM corpus
), q AS (
  SELECT tf.source, tf.cnt,
         CAST(round(ln((CAST(tf.cnt AS DOUBLE) * grand.g)
                       / (CAST(corpus.ccnt AS DOUBLE) * tot.total)) * 1000000)
              AS BIGINT) AS q_micro
  FROM tf
  JOIN corpus USING (term)
  JOIN tot USING (source)
  CROSS JOIN grand
)
SELECT q.source AS source,
       MAX(tot.total) AS n_tokens,
       CAST(SUM(q.cnt * q.q_micro) AS BIGINT) AS kl_micro_sum,
       CAST(SUM(q.cnt * q.q_micro) AS DOUBLE) / (1000000.0 * MAX(tot.total))
         AS kl_nats
FROM q JOIN tot USING (source)
GROUP BY q.source
ORDER BY q.source
""",
    doc="KL(source ‖ corpus) over unigram distributions under the "
    "micro-nat integer contract (exact BIGINT Σ cnt·q) — the source-"
    "grain domain-relevance divergence behind mixture design.",
)
def x81_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    toks = (
        _tok_index(spark, sf_dir)
        .select("source", F.explode("w").alias("term"))
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy("source", "term").agg(F.count("*").alias("cnt"))
    corpus = tf.groupBy("term").agg(F.sum("cnt").cast("bigint").alias("ccnt"))
    tot = tf.groupBy("source").agg(F.sum("cnt").cast("bigint").alias("total"))
    grand = corpus.agg(F.sum("ccnt").cast("bigint").alias("g"))
    q = (
        tf.join(F.broadcast(corpus), "term")
        .join(F.broadcast(tot), "source")
        .crossJoin(F.broadcast(grand))  # 1-row scalar
        .select(
            "source",
            "cnt",
            F.round(
                F.log(
                    (F.col("cnt").cast("double") * F.col("g"))
                    / (F.col("ccnt").cast("double") * F.col("total"))
                )
                * 1e6
            )
            .cast("bigint")
            .alias("q_micro"),
        )
    )
    return (
        q.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.max("total").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("q_micro"))
            .cast("bigint")
            .alias("kl_micro_sum"),
            (
                F.sum(F.col("cnt") * F.col("q_micro")).cast("double")
                / (1e6 * F.max("total"))
            ).alias("kl_nats"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X82 — two-sample Kolmogorov–Smirnov test (source length distributions)
#
# Did src0's and src1's document-length distributions come from the
# same generator? D = sup |F̂₀(x) − F̂₁(x)| over the merged support,
# computed relationally: per-length counts per source, the merged
# distinct-length domain, cumulative counts, max gap. The cumulation
# runs over the LENGTH DOMAIN — bounded by the representable document
# sizes, not by corpus row count — so the single-partition window over
# it stays dim-sized at any corpus scale (the same argument as f19's
# day-grain windows; contrast x49, which cumulates over the data-sized
# doc relation and uses the prefix operator). ECDF values are single
# divisions of exact ints; D and the scaled statistic
# K = D·√(n₀n₁/(n₀+n₁)) are IEEE ops on identical doubles, 9/6dp
# rounded.
# ---------------------------------------------------------------------------


@register(
    "x82_ks_test",
    oracle="""
WITH two AS (
  SELECT source, n_chars FROM documents WHERE source IN ('src0', 'src1')
), per_len AS (
  SELECT n_chars,
         SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c0,
         SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c1
  FROM two GROUP BY n_chars
), totals AS (
  SELECT SUM(c0) AS n0, SUM(c1) AS n1 FROM per_len
), ecdf AS (
  SELECT SUM(c0) OVER (ORDER BY n_chars) AS cum0,
         SUM(c1) OVER (ORDER BY n_chars) AS cum1
  FROM per_len
), gaps AS (
  SELECT MAX(ABS(CAST(cum0 AS DOUBLE) / (SELECT n0 FROM totals)
                 - CAST(cum1 AS DOUBLE) / (SELECT n1 FROM totals))) AS d
  FROM ecdf
)
SELECT 'src0' AS source_a, 'src1' AS source_b,
       CAST((SELECT n0 FROM totals) AS BIGINT) AS n_a,
       CAST((SELECT n1 FROM totals) AS BIGINT) AS n_b,
       ROUND(d, 9) AS d_stat,
       ROUND(d * sqrt(CAST((SELECT n0 FROM totals) AS DOUBLE)
                      * (SELECT n1 FROM totals)
                      / ((SELECT n0 FROM totals) + (SELECT n1 FROM totals))),
             6) AS ks_stat
FROM gaps
""",
    doc="Two-sample Kolmogorov-Smirnov over doc-length ECDFs: "
    "per-length counts, length-domain cumulation (bounded support, "
    "dim-sized window), D = max ECDF gap, K = D*sqrt(n0*n1/(n0+n1)) — "
    "the distribution-shift gate between two ingest sources.",
)
def x82_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    two = d.filter(F.col("source").isin("src0", "src1"))
    per_len = two.groupBy("n_chars").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias("c1"),
    )
    # length-domain cumulation: support is bounded (document sizes),
    # so this global window never sees a data-sized relation
    w = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ecdf = per_len.select(
        F.sum("c0").over(w).alias("cum0"), F.sum("c1").over(w).alias("cum1")
    )
    totals = per_len.agg(
        F.sum("c0").cast("bigint").alias("n0"),
        F.sum("c1").cast("bigint").alias("n1"),
    )
    gaps = (
        ecdf.crossJoin(F.broadcast(totals))  # 1-row scalar
        .agg(
            F.max(
                F.abs(
                    F.col("cum0").cast("double") / F.col("n0")
                    - F.col("cum1").cast("double") / F.col("n1")
                )
            ).alias("d"),
            F.max("n0").alias("n0"),
            F.max("n1").alias("n1"),
        )
    )
    return gaps.select(
        F.lit("src0").alias("source_a"),
        F.lit("src1").alias("source_b"),
        F.col("n0").alias("n_a"),
        F.col("n1").alias("n_b"),
        F.round("d", 9).alias("d_stat"),
        F.round(
            F.col("d")
            * F.sqrt(
                F.col("n0").cast("double")
                * F.col("n1")
                / (F.col("n0") + F.col("n1"))
            ),
            6,
        ).alias("ks_stat"),
    )


# ---------------------------------------------------------------------------
# X84 — rank-biased overlap between two document rankers
#
# How much do two curation rankers agree? RBO (Webber et al. 2010,
# "A similarity measure for indefinite rankings") compares top-K lists
# with top-weighted emphasis: RBO@K = (1−p)·Σ_{d=1..K} p^{d−1}·X_d/d,
# X_d = |A∩B in top d|. Rankers here: corpus docs by n_chars vs by
# whitespace token count (both deterministic with doc_id tiebreak).
# Relational form — no per-depth recomputation: a doc shared by both
# top-K lists enters every depth d ≥ m = max(rank_A, rank_B), so its
# total contribution is Σ_{d=m..K} p^{d−1}/d, evaluated by joining
# shared docs to a K-row depth table (broadcast). Each term is
# 12dp-quantized to DECIMAL before the exact sum (p^{d−1} is libm pow
# — the quantize collapses ulp divergence); the K-deep lists come from
# TakeOrderedAndProject, so no global sort materializes. One row out.
# ---------------------------------------------------------------------------

_X84_K = 50
_X84_P = 0.9


@register(
    "x84_rank_biased_overlap",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, n_chars,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
  FROM documents
), rank_a AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS ra
  FROM toks QUALIFY ra <= {_X84_K}
), rank_b AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS rb
  FROM toks QUALIFY rb <= {_X84_K}
), shared AS (
  SELECT GREATEST(a.ra, b.rb) AS m
  FROM rank_a a JOIN rank_b b USING (doc_id)
), depths AS (
  SELECT CAST(unnest(range(1, {_X84_K} + 1)) AS BIGINT) AS d
), terms AS (
  SELECT CAST(ROUND(power({_X84_P}, d - 1) / d, 12) AS DECIMAL(38,12)) AS t
  FROM shared JOIN depths ON depths.d >= shared.m
)
SELECT CAST((SELECT COUNT(*) FROM shared) AS BIGINT) AS n_shared,
       ROUND((1 - {_X84_P}) * CAST(COALESCE(SUM(t), 0) AS DOUBLE), 9) AS rbo
FROM terms
""",
    doc="Rank-biased overlap (p=0.9, K=50) between the char-length "
    "and token-count rankers: shared docs contribute "
    "sum_{{d>=max(rank_a,rank_b)}} p^(d-1)/d via a broadcast depth "
    "table, 12dp-quantized exact sums — the top-weighted ranker "
    "agreement readout.",
)
def x84_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "n_chars",
        F.when(F.trim("text") == "", 0)
        .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
        .alias("n_tokens"),
    )
    w_a = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    w_b = Window.orderBy(F.desc("n_tokens"), F.asc("doc_id"))
    # top-K via orderBy+limit (TakeOrderedAndProject), rank attached
    # AFTER the K-row cut — the global window then runs on K rows only
    top_a = (
        toks.orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(_X84_K)
        .select("doc_id", F.row_number().over(w_a).alias("ra"))
    )
    top_b = (
        toks.orderBy(F.desc("n_tokens"), F.asc("doc_id"))
        .limit(_X84_K)
        .select("doc_id", F.row_number().over(w_b).alias("rb"))
    )
    shared = top_a.join(top_b, "doc_id").select(
        F.greatest("ra", "rb").alias("m")
    )
    depths = spark.range(1, _X84_K + 1).select(F.col("id").alias("d"))
    terms = shared.join(F.broadcast(depths), F.col("d") >= F.col("m")).select(
        F.round(F.pow(F.lit(_X84_P), F.col("d") - 1) / F.col("d"), 12)
        .cast("decimal(38,12)")
        .alias("t")
    )
    n_shared = shared.agg(F.count("*").cast("bigint").alias("n_shared"))
    rbo = terms.agg(
        F.round(
            (1 - _X84_P)
            * F.coalesce(F.sum("t"), F.lit(0).cast("decimal(38,12)"))
            .cast("double"),
            9,
        ).alias("rbo")
    )
    return n_shared.crossJoin(rbo)  # 1-row × 1-row scalars


# ---------------------------------------------------------------------------
# X85 — Poisson bootstrap confidence interval (mean document length)
#
# Error bars that survive 100 TB: the classic bootstrap resamples n
# rows with replacement B times — impossible to coordinate across a
# cluster — but the POISSON bootstrap (Chamandy et al., "Estimating
# uncertainty for massive data streams", Google 2012) replaces the
# multinomial with independent per-row Poisson(1) weights, making each
# replicate a single weighted aggregate that partial-aggregates
# map-side like any other sum. Weights are DERANDOMIZED: u =
# md5(doc_id, replicate) mod 1e9 / 1e9, inverted through the
# Poisson(1) CDF as literal thresholds — identical integers, identical
# CASE in both engines. The replicate means are exact-int divisions;
# the 2.5/97.5 percentile interpolation runs over B=200 identical
# doubles. Shuffle cost is B rows per map partition (the fanout
# collapses in the partial aggregate), not B× the data.
# ---------------------------------------------------------------------------

_X85_B = 200  # bootstrap replicates
# Poisson(1) CDF: P(X<=k) for k = 0..5; u above the last bucket -> 6
_X85_CDF = (0.3678794411714423, 0.7357588823428846, 0.9196986029286058,
            0.9810118431238462, 0.9963401531726563, 0.9994058151824183)


def _poisson_weight_sql(u: str) -> str:
    """Branchless-ish CASE mapping uniform ``u`` to a Poisson(1) draw."""
    cases = " ".join(
        f"WHEN {u} < {c!r} THEN {k}" for k, c in enumerate(_X85_CDF)
    )
    return f"CASE {cases} ELSE 6 END"


@register(
    "x85_poisson_bootstrap",
    oracle=f"""
WITH reps AS (
  SELECT CAST(unnest(range({_X85_B})) AS BIGINT) AS b
), draws AS (
  SELECT r.b, d.n_chars,
         {_poisson_weight_sql(
             "(" + __import__(
                 "calaveras_uniteus_etl_spark.functions.hashing",
                 fromlist=["duckdb_md5_long_sql"],
             ).duckdb_md5_long_sql(
                 "'boot:' || CAST(d.doc_id AS VARCHAR) || ':' || CAST(r.b AS VARCHAR)"
             ) + " % 1000000000) / 1e9"
         )} AS w
  FROM documents d CROSS JOIN reps r
), means AS (
  SELECT b,
         CAST(SUM(w * n_chars) AS DOUBLE) / NULLIF(SUM(w), 0) AS m
  FROM draws GROUP BY b
), base AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_len
  FROM documents
)
SELECT base.n_docs,
       ROUND(base.mean_len, 9) AS mean_len,
       CAST({_X85_B} AS BIGINT) AS n_replicates,
       ROUND(quantile_cont(means.m, 0.025), 9) AS ci_lo,
       ROUND(quantile_cont(means.m, 0.975), 9) AS ci_hi
FROM means CROSS JOIN base
GROUP BY base.n_docs, base.mean_len
""",
    doc="Poisson bootstrap CI for mean doc length: derandomized "
    "per-(row, replicate) Poisson(1) weights from md5 uniforms, B=200 "
    "weighted means that partial-aggregate map-side, 2.5/97.5 "
    "percentile interval — cluster-scale error bars without "
    "coordinated resampling.",
)
def x85_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.functions.hashing import md5_long

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    reps = spark.range(_X85_B).select(F.col("id").alias("b"))
    u = (
        F.pmod(
            md5_long(
                F.concat(
                    F.lit("boot:"),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            ),
            F.lit(1_000_000_000),
        )
        / F.lit(1e9)
    )
    w = F.lit(6)
    for k in range(len(_X85_CDF) - 1, -1, -1):
        w = F.when(u < _X85_CDF[k], F.lit(k)).otherwise(w)
    draws = d.crossJoin(F.broadcast(reps)).select(
        "b", "n_chars", w.alias("w")
    )
    means = draws.groupBy("b").agg(
        (
            F.sum(F.col("w") * F.col("n_chars")).cast("double")
            / F.nullif(F.sum("w"), F.lit(0))
        ).alias("m")
    )
    base = d.agg(
        F.count("*").alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("mean_len"),
    )
    return (
        means.crossJoin(F.broadcast(base))  # B-row × 1-row scalar
        .groupBy("n_docs", "mean_len")
        .agg(
            F.expr("percentile(m, 0.025D)").alias("lo"),
            F.expr("percentile(m, 0.975D)").alias("hi"),
        )
        .select(
            "n_docs",
            F.round("mean_len", 9).alias("mean_len"),
            F.lit(_X85_B).cast("bigint").alias("n_replicates"),
            F.round("lo", 9).alias("ci_lo"),
            F.round("hi", 9).alias("ci_hi"),
        )
    )


# ---------------------------------------------------------------------------
# X87 — Zipf's-law fit (log-log OLS over the ranked vocabulary)
#
# x80 fits Heaps' law (vocabulary growth); this fits the other classic
# corpus power law: frequency ∝ rank^(-s). Tokens are the same word
# regexp as x9, ranked by (count DESC, token ASC) — a total order, so
# the top-K cut is deterministic in both engines. Coordinates are
# ln(rank) and ln(freq) quantized once to integer 1e-4 nats; all five
# OLS moments are then BIGINT sums (every product bounded well inside
# int64 and 2^53 for K ≤ 500), so slope / intercept / r² divide
# identical integers — bit-exact cross-engine, same contract as f26.
#
# Scale: token counting is one explode + hash aggregate (map-side
# partial combine); the ranked head is top-K-limited (TakeOrdered) so
# the rank window runs over ≤ K rows — never a data-sized relation.
# ---------------------------------------------------------------------------

_X87_TOPK = 500
_X87_LNQ = 10_000  # ln quantization: 1e-4 nats


@register(
    "x87_zipf_slope",
    oracle=f"""
WITH tokens AS (
  SELECT lower(t) AS token
  FROM (SELECT UNNEST(regexp_extract_all(text, '[A-Za-z0-9]+')) AS t
        FROM documents)
), counts AS (
  SELECT token, COUNT(*) AS freq FROM tokens GROUP BY token
), head AS (
  SELECT token, freq FROM counts
  ORDER BY freq DESC, token ASC LIMIT {_X87_TOPK}
), coords AS (
  SELECT CAST(ROUND(LN(CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC)
                            AS DOUBLE)) * {_X87_LNQ}) AS BIGINT) AS lx,
         CAST(ROUND(LN(CAST(freq AS DOUBLE)) * {_X87_LNQ}) AS BIGINT) AS ly
  FROM head
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(lx) AS BIGINT) AS sx, CAST(SUM(ly) AS BIGINT) AS sy,
         CAST(SUM(lx * ly) AS BIGINT) AS sxy,
         CAST(SUM(lx * lx) AS BIGINT) AS sxx,
         CAST(SUM(ly * ly) AS BIGINT) AS syy
  FROM coords
)
SELECT n AS n_ranks,
       CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) AS zipf_slope,
       (CAST(sy AS DOUBLE) / n
        - (CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx))
          * (CAST(sx AS DOUBLE) / n)) / {_X87_LNQ} AS ln_c,
       CAST(n * sxy - sx * sy AS DOUBLE) * (n * sxy - sx * sy)
         / (CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)) AS r2
FROM s
""",
    doc="Zipf's-law fit: OLS of ln(freq) on ln(rank) over the top-500 "
    "vocabulary (total-order cut), coordinates quantized to 1e-4 "
    "nats so all moments are exact BIGINTs — slope, intercept and "
    "r² bit-identical across engines; companion to x80's Heaps fit.",
)
def x87_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    counts = (
        d.select(
            F.explode(
                F.expr(r"regexp_extract_all(text, '[A-Za-z0-9]+', 0)")
            ).alias("t")
        )
        .select(F.lower("t").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    head = counts.orderBy(F.desc("freq"), F.asc("token")).limit(_X87_TOPK)
    # rank window over the top-K-limited head only (≤ 500 rows)
    rank_w = Window.orderBy(F.desc("freq"), F.asc("token"))
    coords = head.select(
        F.round(F.log(F.row_number().over(rank_w).cast("double")) * _X87_LNQ)
        .cast("bigint")
        .alias("lx"),
        F.round(F.log(F.col("freq").cast("double")) * _X87_LNQ)
        .cast("bigint")
        .alias("ly"),
    )
    s = coords.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("lx").cast("bigint").alias("sx"),
        F.sum("ly").cast("bigint").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).cast("bigint").alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).cast("bigint").alias("sxx"),
        F.sum(F.col("ly") * F.col("ly")).cast("bigint").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num.cast("double") / den_x
    return s.select(
        F.col("n").alias("n_ranks"),
        slope.alias("zipf_slope"),
        (
            (
                F.col("sy").cast("double") / F.col("n")
                - slope * (F.col("sx").cast("double") / F.col("n"))
            )
            / _X87_LNQ
        ).alias("ln_c"),
        (num.cast("double") * num / (den_x.cast("double") * den_y)).alias(
            "r2"
        ),
    )


# ---------------------------------------------------------------------------
# X88 — stratified sampling with exact per-stratum allocation
#
# x30 keeps rows by independent Bernoulli draws (expected share only);
# x75 reservoir-samples by weight. Neither guarantees EXACT stratum
# counts — the property a train/eval split needs. Here each language
# stratum contributes exactly n_h = max(1, N_h·64 // N) rows (integer
# proportional allocation), chosen as the n_h smallest salted-md5
# draws with doc_id as total-order tiebreak — deterministic,
# shuffle-minimal, reproducible.
#
# Scale: one hash aggregate for stratum sizes (broadcast back — the
# stratum domain is small), one row_number window PARTITIONED BY the
# stratum key (parallel across strata), no global sort. The audit
# output is stratum-grain.
# ---------------------------------------------------------------------------

_X88_TARGET = 64  # total sample size the allocation is scaled to


@register(
    "x88_stratified_sample",
    oracle=f"""
WITH sized AS (
  SELECT lang, COUNT(*) AS n_h FROM documents GROUP BY lang
), tot AS (
  SELECT CAST(SUM(n_h) AS BIGINT) AS n FROM sized
), alloc AS (
  SELECT lang, n_h,
         GREATEST(1, CAST(n_h * {_X88_TARGET} // n AS BIGINT)) AS n_target
  FROM sized CROSS JOIN tot
), ranked AS (
  SELECT d.lang, d.doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY d.lang
           ORDER BY {_fold("'ss:' || CAST(d.doc_id AS VARCHAR)")} ASC,
                    d.doc_id ASC) AS rn
  FROM documents d
)
SELECT a.lang, a.n_h AS n_stratum, a.n_target,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM({_fold("'ss:' || CAST(r.doc_id AS VARCHAR)")} % 1000000007)
            AS BIGINT) AS sample_checksum
FROM alloc a JOIN ranked r ON r.lang = a.lang AND r.rn <= a.n_target
GROUP BY a.lang, a.n_h, a.n_target
ORDER BY a.lang
""",
    doc="Exact-allocation stratified sampler: each lang stratum "
    "contributes exactly max(1, N_h*64 div N) rows chosen by smallest "
    "salted-md5 draw with doc_id tiebreak — per-stratum row_number "
    "window, broadcast allocation; audit reports target vs sampled "
    "and an order-free checksum of the chosen ids.",
)
def x88_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.functions.hashing import md5_long

    d = table(spark, sf_dir, "documents")
    sized = d.groupBy("lang").agg(F.count("*").alias("n_h"))
    tot = sized.agg(F.sum("n_h").cast("bigint").alias("n"))
    alloc = sized.crossJoin(F.broadcast(tot)).select(  # 1-row scalar
        "lang",
        "n_h",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.expr(f"n_h * {_X88_TARGET} div n").cast("bigint"),
        ).alias("n_target"),
    )
    draw = md5_long(F.concat(F.lit("ss:"), F.col("doc_id").cast("string")))
    rank_w = Window.partitionBy("lang").orderBy(
        draw.asc(), F.col("doc_id").asc()
    )
    ranked = d.select(
        "lang",
        "doc_id",
        F.row_number().over(rank_w).alias("rn"),
        (draw % 1000000007).alias("draw_mod"),
    )
    return (
        ranked.join(F.broadcast(alloc), "lang")
        .filter(F.col("rn") <= F.col("n_target"))
        .groupBy("lang", "n_h", "n_target")
        .agg(
            F.count("*").cast("bigint").alias("n_sampled"),
            F.sum("draw_mod").cast("bigint").alias("sample_checksum"),
        )
        .select(
            "lang",
            F.col("n_h").alias("n_stratum"),
            "n_target",
            "n_sampled",
            "sample_checksum",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# X91 — per-document character-entropy gibberish filter
#
# x79 measures entropy at SOURCE grain (corpus diagnostics); quality
# filtering needs it PER DOCUMENT — low char-entropy flags repeated-
# character junk, high flags random noise, both standard drop rules
# (C4/RefinedWeb lineage). Per-doc character histogram → Shannon
# entropy in integer micro-nats (each term quantized once from exact
# integer ratios, the x79 contract), then a keep/flag census per
# entropy band. Shape: one explode to (doc, char) grain, two hash
# aggregates — the explode fans out n_chars rows but carries (doc_id,
# char) only, and the per-doc rollup happens before anything joins
# back.
# ---------------------------------------------------------------------------

_X91_LO_US = 2_700_000  # < 2.7 nats → too repetitive (p05 of corpus)
_X91_HI_US = 2_900_000  # > 2.9 nats → noise-like (p95 of corpus)


@register(
    "x91_char_entropy_filter",
    oracle=f"""
WITH chars AS (
  SELECT doc_id, UNNEST(string_split_regex(text, '')) AS ch
  FROM documents WHERE length(text) > 0
), hist AS (
  SELECT doc_id, ch, COUNT(*) AS c FROM chars WHERE ch != '' GROUP BY doc_id, ch
), totals AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM hist GROUP BY doc_id
), ent AS (
  SELECT h.doc_id,
         CAST(SUM(CAST(ROUND(
           -(CAST(h.c AS DOUBLE) / t.n) * LN(CAST(h.c AS DOUBLE) / t.n) * 1e6)
           AS BIGINT)) AS BIGINT) AS ent_us
  FROM hist h JOIN totals t ON t.doc_id = h.doc_id
  GROUP BY h.doc_id
), banded AS (
  SELECT CASE WHEN ent_us < {_X91_LO_US} THEN 'too_repetitive'
              WHEN ent_us > {_X91_HI_US} THEN 'noise_like'
              ELSE 'keep' END AS band,
         ent_us
  FROM ent
)
SELECT band,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(CAST(ent_us AS DECIMAL(38,0))) AS DOUBLE)
             / (COUNT(*) * 1e6), 6) AS mean_entropy_nats,
       ROUND(CAST(MIN(ent_us) AS DOUBLE) / 1e6, 6) AS min_entropy,
       ROUND(CAST(MAX(ent_us) AS DOUBLE) / 1e6, 6) AS max_entropy
FROM banded
GROUP BY band
ORDER BY band
""",
    doc="Per-document character-entropy quality filter: Shannon "
    "entropy of each doc's char histogram in integer micro-nats "
    "(x79's quantization contract at doc grain), censused into "
    "too-repetitive / keep / noise-like bands — the C4-style "
    "gibberish drop rule.",
)
def x91_char_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    hist = (
        d.select(
            "doc_id",
            F.explode(F.split(F.col("text"), "")).alias("ch"),
        )
        .filter(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("c"))
        # feeds the per-doc totals AND the entropy join — unpinned,
        # the char-level explode + rollup ran twice
        .localCheckpoint(eager=True)
    )
    totals = hist.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n")
    )
    p = F.col("c").cast("double") / F.col("n")
    ent = (
        hist.join(totals, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(F.round(-p * F.log(p) * 1e6).cast("bigint"))
            .cast("bigint")
            .alias("ent_us")
        )
    )
    band = (
        F.when(F.col("ent_us") < _X91_LO_US, "too_repetitive")
        .when(F.col("ent_us") > _X91_HI_US, "noise_like")
        .otherwise("keep")
    )
    return (
        ent.groupBy(band.alias("band"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(
                F.sum(F.col("ent_us").cast("decimal(38,0)")).cast("double")
                / (F.count("*") * F.lit(1e6)),
                6,
            ).alias("mean_entropy_nats"),
            F.round(F.min("ent_us").cast("double") / 1e6, 6).alias(
                "min_entropy"
            ),
            F.round(F.max("ent_us").cast("double") / 1e6, 6).alias(
                "max_entropy"
            ),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# X92 — BPE merge loop (the iterations x60 only scores once)
#
# x60 ranks merge candidates for ONE round; training a tokenizer runs
# the loop: count adjacent symbol pairs (weighted by word frequency),
# merge the argmax pair everywhere, recount. Three rounds here, on
# the same vocab-grain representation as x60 (corpus collapses to
# words × n_uses first — the Heaps'-law shrink that makes the loop
# cheap at any corpus size). The per-round argmax is a 1-row collect
# (a scalar steering the next round's plan, the f25 pattern); the
# merge itself is a literal space-sentinel string replace, left-to-
# right non-overlapping in Spark, DuckDB, and Python alike. The
# oracle UNROLLS all three rounds as CTE stages — the hash match
# proves count → argmax → merge → recount end-to-end.
# ---------------------------------------------------------------------------

_X92_ROUNDS = 3


def _x92_rep_duck() -> str:
    word = f"unnest(string_split({NORM_DUCK.format(col='text')}, ' '))"
    return f"""
WITH toks AS (
  SELECT {word} AS word FROM documents
), vocab AS (
  SELECT word, COUNT(*) AS n_uses FROM toks
  WHERE length(word) >= {_X60_MIN_WORD} GROUP BY word
), rep0 AS (
  SELECT ' ' || array_to_string(string_split_regex(word, ''), ' ') || ' '
           AS rep,
         n_uses
  FROM vocab
)"""


def _x92_oracle() -> str:
    sql = _x92_rep_duck()
    pieces = []
    for r in range(1, _X92_ROUNDS + 1):
        prev = f"rep{r - 1}"
        sql += f""", pc{r} AS (
  SELECT t.pair, CAST(SUM(n_uses) AS BIGINT) AS cnt
  FROM (
    SELECT unnest(list_transform(range(len(syms) - 1),
                  i -> syms[i + 1] || ' ' || syms[i + 2])) AS pair,
           n_uses
    FROM (SELECT string_split(trim(rep), ' ') AS syms, n_uses FROM {prev})
  ) t
  GROUP BY t.pair
), best{r} AS (
  SELECT pair, cnt FROM pc{r} ORDER BY cnt DESC, pair ASC LIMIT 1
), rep{r} AS (
  SELECT replace(rep, ' ' || b.pair || ' ',
                 ' ' || replace(b.pair, ' ', '') || ' ') AS rep,
         n_uses
  FROM {prev} CROSS JOIN best{r} b
), nsym{r} AS (
  SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS n_symbols
  FROM (SELECT unnest(string_split(trim(rep), ' ')) AS s FROM rep{r})
)"""
        pieces.append(
            f"SELECT {r} AS merge_round, pair AS merged_pair, cnt AS"
            f" pair_count, (SELECT n_symbols FROM nsym{r}) AS n_symbols"
            f" FROM best{r}"
        )
    return sql + "\n" + "\nUNION ALL\n".join(pieces) + "\nORDER BY merge_round"


@register(
    "x92_bpe_merge_loop",
    oracle=_x92_oracle(),
    doc="BPE tokenizer-training loop: three rounds of weighted "
    "adjacent-pair counting, argmax merge (1-row collect steering "
    "the next plan), and literal space-sentinel merges on the vocab "
    "grain; the oracle unrolls all rounds as CTE stages, proving the "
    "full count-merge-recount cycle.",
)
def x92_bpe_merge_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    rep = (
        _tok_index(spark, sf_dir)
        .select(F.explode("w").alias("word"))
        .filter(F.length("word") >= _X60_MIN_WORD)
        .groupBy("word")
        .agg(F.count("*").alias("n_uses"))
        .select(
            F.concat(
                F.lit(" "),
                F.array_join(F.split(F.col("word"), ""), " "),
                F.lit(" "),
            ).alias("rep"),
            "n_uses",
        )
        # pin the vocab-grain representation ONCE: every job the loop
        # issues (argmax collect, merge checkpoint, symbol census)
        # would otherwise re-tokenize the whole corpus
        .localCheckpoint(eager=True)
    )
    out = None
    for r in range(1, _X92_ROUNDS + 1):
        pairs = rep.select(
            F.expr("split(trim(rep), ' ')").alias("syms"), "n_uses"
        ).select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(syms) - 2),"
                    " i -> concat(syms[i], ' ', syms[i + 1]))"
                )
            ).alias("pair"),
            "n_uses",
        )
        counts = pairs.groupBy("pair").agg(
            F.sum("n_uses").cast("bigint").alias("cnt")
        )
        best_df = counts.orderBy(F.desc("cnt"), F.asc("pair")).limit(1)
        best = best_df.first()  # 1-row scalar steering the next plan
        merged = best["pair"].replace(" ", "")
        rep = rep.select(
            F.expr(
                "replace(rep, ' ' || '{p}' || ' ', ' ' || '{m}' || ' ')".format(
                    p=best["pair"], m=merged
                )
            ).alias("rep"),
            "n_uses",
        ).localCheckpoint(eager=True)
        nsym = (
            rep.select(
                F.explode(F.expr("split(trim(rep), ' ')")).alias("s")
            )
            .agg(F.countDistinct("s").cast("bigint").alias("n_symbols"))
        )
        row = (
            best_df.select(
                F.lit(r).alias("merge_round"),
                F.col("pair").alias("merged_pair"),
                F.col("cnt").alias("pair_count"),
            )
            .crossJoin(F.broadcast(nsym))  # 1-row scalar
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("merge_round")


# ---------------------------------------------------------------------------
# X95 — purged time-series CV folds (embargoed temporal split)
#
# x15/x74 split by hash — correct for i.i.d. text, WRONG for temporal
# data, where training on the future leaks. The time-series answer
# (cf. López de Prado's purged K-fold) cuts the stream into K
# contiguous folds and PURGES every event within an embargo gap of a
# fold boundary, so no residual autocorrelation straddles the cut.
# Fold edges come from fixed epoch arithmetic (span/K on the known
# calendar), purge is a pure range predicate — no windows at all, one
# scan, engine-exact integer microsecond bounds.
# ---------------------------------------------------------------------------

_X95_FOLDS = 5
_X95_EMBARGO_US = 6 * 3600 * 1_000_000  # 6h embargo on each side


@register(
    "x95_purged_time_folds",
    oracle=f"""
WITH span AS (
  SELECT MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) + 1 AS t1 FROM events
), folded AS (
  SELECT epoch_us(ts) AS t,
         CAST(LEAST({_X95_FOLDS} - 1,
                    ({_X95_FOLDS} * (epoch_us(ts) - s.t0)) // (s.t1 - s.t0))
              AS BIGINT) AS fold,
         s.t0, s.t1
  FROM events CROSS JOIN span s
), flagged AS (
  SELECT fold,
         CASE WHEN fold > 0
                   AND t - (t0 + (fold * (t1 - t0)) // {_X95_FOLDS})
                       < {_X95_EMBARGO_US} THEN 1
              WHEN fold < {_X95_FOLDS} - 1
                   AND (t0 + ((fold + 1) * (t1 - t0)) // {_X95_FOLDS}) - t
                       <= {_X95_EMBARGO_US} THEN 1
              ELSE 0 END AS purged
  FROM folded
)
SELECT fold,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(purged) AS BIGINT) AS n_purged,
       CAST(COUNT(*) - SUM(purged) AS BIGINT) AS n_usable
FROM flagged
GROUP BY fold
ORDER BY fold
""",
    doc="Purged time-series CV folds: K contiguous temporal folds by "
    "integer-microsecond epoch arithmetic, events within a 6h "
    "embargo of any fold boundary purged (leakage-free temporal "
    "split — the time-ordered counterpart to x15/x74's hash splits); "
    "one scan, no windows.",
)
def x95_purged_time_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.functions.datetime_ext import epoch_us

    e = table(spark, sf_dir, "events").select(epoch_us("ts").alias("t"))
    span = e.agg(
        F.min("t").alias("t0"), (F.max("t") + 1).alias("t1")
    )
    k = F.lit(_X95_FOLDS)
    folded = e.crossJoin(F.broadcast(span)).select(  # 1-row scalar
        "t",
        "t0",
        "t1",
        F.least(
            (k - 1).cast("bigint"),
            F.expr(f"({_X95_FOLDS} * (t - t0)) div (t1 - t0)"),
        )
        .cast("bigint")
        .alias("fold"),
    )
    lo_edge = F.col("t0") + F.expr(
        f"(fold * (t1 - t0)) div {_X95_FOLDS}"
    )
    hi_edge = F.col("t0") + F.expr(
        f"((fold + 1) * (t1 - t0)) div {_X95_FOLDS}"
    )
    purged = (
        F.when(
            (F.col("fold") > 0)
            & (F.col("t") - lo_edge < _X95_EMBARGO_US),
            1,
        )
        .when(
            (F.col("fold") < _X95_FOLDS - 1)
            & (hi_edge - F.col("t") <= _X95_EMBARGO_US),
            1,
        )
        .otherwise(0)
    )
    return (
        folded.select("fold", purged.alias("purged"))
        .groupBy("fold")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("purged").cast("bigint").alias("n_purged"),
            (F.count("*") - F.sum("purged")).cast("bigint").alias("n_usable"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# X96 — tokenizer fertility audit (tokens/word, chars/token per lang)
#
# The sizing numbers a tokenizer decision needs per language: word
# fertility (whitespace words per regex token — how much the
# pre-tokenizer splits) and compression (chars per token — how much
# a byte-level model would pay). x68 measures vocabulary COVERAGE;
# this measures SEGMENTATION cost. All counts are exact integers from
# the same regex contract as x9; ratios divide identical BIGINTs.
# ---------------------------------------------------------------------------


@register(
    "x96_tokenizer_fertility",
    oracle=r"""
WITH counts AS (
  SELECT lang,
         CAST(SUM(length(text)) AS BIGINT) AS n_chars,
         CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                       ELSE length(string_split_regex(trim(text), '\s+'))
                  END) AS BIGINT) AS n_words,
         CAST(SUM(length(regexp_extract_all(text, '[A-Za-z0-9]+')))
              AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang
)
SELECT lang, n_docs, n_words, n_tokens,
       ROUND(CAST(n_tokens AS DOUBLE) / n_words, 6) AS tokens_per_word,
       ROUND(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS chars_per_token
FROM counts ORDER BY lang
""",
    doc="Tokenizer fertility per language: whitespace-word and regex-"
    "token counts (x9's contracts), tokens-per-word segmentation "
    "cost and chars-per-token compression — the sizing audit beside "
    "x68's coverage.",
)
def x96_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    counts = d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        F.sum(
            F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))
        )
        .cast("bigint")
        .alias("n_words"),
        F.sum(
            F.size(F.expr(r"regexp_extract_all(text, '[A-Za-z0-9]+', 0)"))
        )
        .cast("bigint")
        .alias("n_tokens"),
    )
    return counts.select(
        "lang",
        "n_docs",
        "n_words",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.col("n_words"), 6
        ).alias("tokens_per_word"),
        F.round(
            F.col("n_chars").cast("double") / F.col("n_tokens"), 6
        ).alias("chars_per_token"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# X97 — hashed bag-of-words source similarity (feature hashing)
#
# Embedding-free text vectorization (Weinberger et al. 2009 feature
# hashing): every token hashes into one of 64 buckets, per-source
# bucket counts form an integer vector, and pairwise cosine between
# source vectors measures corpus-composition similarity — the
# cheap-and-deterministic cousin of the embedding-based x6/x81
# comparisons, usable before any model exists. All counts and dot
# products are BIGINT (bucket counts ≤ millions, squares well inside
# int64); cosines divide identical integer-derived doubles. The
# bucket join is a 64-key equi-join between source vectors.
# ---------------------------------------------------------------------------

_X97_BUCKETS = 64


@register(
    "x97_hashed_bow_source_sim",
    oracle=f"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
), vec AS (
  SELECT source,
         {_fold("'fh:' || tok")} % {_X97_BUCKETS} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY 1, 2
), norms AS (
  SELECT source, CAST(SUM(c * c) AS BIGINT) AS n2 FROM vec GROUP BY source
), dots AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(SUM(a.c * b.c) AS BIGINT) AS dot,
         CAST(COUNT(*) AS BIGINT) AS shared_buckets
  FROM vec a JOIN vec b
    ON b.bucket = a.bucket AND a.source < b.source
  GROUP BY 1, 2
)
SELECT d.source_a, d.source_b, d.shared_buckets,
       ROUND(CAST(d.dot AS DOUBLE)
             / SQRT(CAST(na.n2 AS DOUBLE) * nb.n2), 6) AS cosine
FROM dots d
JOIN norms na ON na.source = d.source_a
JOIN norms nb ON nb.source = d.source_b
ORDER BY source_a, source_b
""",
    doc="Feature-hashed bag-of-words source similarity: tokens hash "
    "into 64 buckets, per-source integer count vectors, pairwise "
    "cosine over BIGINT dot products — the embedding-free corpus-"
    "composition comparison (Weinberger 2009) beside x81's KL.",
)
def x97_hashed_bow_source_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.functions.hashing import md5_long

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.expr(r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("tok"),
    )
    # (source, bucket) grain — ≤ |sources| × _X97_BUCKETS rows; feeds
    # both dot-product sides and both norm lookups — unpinned, the
    # tokenize + md5-bucket rollup ran four times
    vec = (
        toks.groupBy(
            "source",
            (
                md5_long(F.concat(F.lit("fh:"), F.col("tok"))) % _X97_BUCKETS
            ).alias("bucket"),
        )
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    norms = vec.groupBy("source").agg(
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("n2")
    )
    a = vec.select(
        F.col("source").alias("source_a"), "bucket", F.col("c").alias("ca")
    )
    b = vec.select(
        F.col("source").alias("source_b"), "bucket", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, "bucket")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("dot"),
            F.count("*").cast("bigint").alias("shared_buckets"),
        )
    )
    na = norms.select(
        F.col("source").alias("source_a"), F.col("n2").alias("na2")
    )
    nb = norms.select(
        F.col("source").alias("source_b"), F.col("n2").alias("nb2")
    )
    return (
        dots.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_buckets",
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(F.col("na2").cast("double") * F.col("nb2")),
                6,
            ).alias("cosine"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# X100 — n-gram repetition gate (Rae et al. 2021 A1.2, x70's companion)
#
# x70 checks Gopher's FORMAT rules; this is the REPETITION battery:
# duplicate-word fraction (1 - distinct/total) and the fraction of
# n-grams claimed by the single most frequent word 2-gram / 3-gram —
# the signals that catch boilerplate and template spam that format
# rules miss. Thresholds are corpus-calibrated (0.60 / 0.05 / 0.04)
# so each rule splits this synthetic corpus non-degenerately; all
# predicates are pure integer cross-multiplication.
#
# Scale shape: the top-n-gram mode runs RELATIONALLY — explode to
# (doc_id, gram), count, per-doc max — two shuffles keyed by doc_id
# (+gram), never an in-memory per-doc hashmap; the census is a 1-row
# aggregate. A doc with n words emits ~2n gram rows: linear fan-out,
# no quadratic term anywhere.
# ---------------------------------------------------------------------------

_X100_FLAGS = {
    "fail_dup_word": "(5 * (n - nd) > 3 * n)",  # dup-word frac > 0.60
    "fail_top_2gram": "(20 * topc2 > (n - 1))",  # top-2-gram frac > 0.05
    "fail_top_3gram": "(25 * topc3 > (n - 2))",  # top-3-gram frac > 0.04
}
_X100_FAIL_ANY = " OR ".join(_X100_FLAGS.values())


@register(
    "x100_repetition_gate",
    oracle=f"""
WITH m AS (
  SELECT doc_id, string_split({NORM_DUCK.format(col="text")}, ' ') AS w
  FROM documents
), s AS (
  SELECT doc_id, len(w) AS n, len(list_distinct(w)) AS nd FROM m
), bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> w[i] || ' ' || w[i+1])) AS g
  FROM m WHERE len(w) >= 2
), mx2 AS (
  SELECT doc_id, MAX(c) AS topc2
  FROM (SELECT doc_id, g, COUNT(*) AS c FROM bi GROUP BY doc_id, g)
  GROUP BY doc_id
), tri AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
           AS g
  FROM m WHERE len(w) >= 3
), mx3 AS (
  SELECT doc_id, MAX(c) AS topc3
  FROM (SELECT doc_id, g, COUNT(*) AS c FROM tri GROUP BY doc_id, g)
  GROUP BY doc_id
), per AS (
  SELECT s.doc_id, n, nd,
         COALESCE(topc2, 0) AS topc2, COALESCE(topc3, 0) AS topc3
  FROM s LEFT JOIN mx2 USING (doc_id) LEFT JOIN mx3 USING (doc_id)
)
SELECT COUNT(*) AS n_docs,
       {", ".join(f"CAST(SUM(CASE WHEN {p} THEN 1 ELSE 0 END) AS BIGINT) AS {r}" for r, p in _X100_FLAGS.items())},
       CAST(SUM(CASE WHEN NOT ({_X100_FAIL_ANY}) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pass_all,
       CAST(SUM(CASE WHEN NOT ({_X100_FAIL_ANY}) THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS retention_rate
FROM per
""",
    doc="Repetition rule battery (Rae et al. 2021 A1.2 beside x70's "
    "format rules): duplicate-word fraction plus top word-2-gram and "
    "word-3-gram occupancy, mode found relationally (explode, count, "
    "per-doc max), censused with integer cross-multiplied thresholds.",
)
def x100_repetition_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    m = _tok_index(spark, sf_dir).select("doc_id", "w")
    s = m.select(
        "doc_id",
        F.expr("size(w)").alias("n"),
        F.expr("size(array_distinct(w))").alias("nd"),
    )

    def top_gram(k: int, alias: str) -> DataFrame:
        gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(k))
        grams = m.filter(F.expr(f"size(w) >= {k}")).select(
            "doc_id",
            F.explode(
                F.expr(f"transform(sequence(0, size(w) - {k}), i -> {gram})")
            ).alias("g"),
        )
        return (
            grams.groupBy("doc_id", "g")
            .count()
            .groupBy("doc_id")
            .agg(F.max("count").alias(alias))
        )

    per = (
        s.join(top_gram(2, "topc2"), "doc_id", "left")
        .join(top_gram(3, "topc3"), "doc_id", "left")
        .select(
            "n",
            "nd",
            F.coalesce("topc2", F.lit(0)).alias("topc2"),
            F.coalesce("topc3", F.lit(0)).alias("topc3"),
        )
    )
    aggs = [F.count("*").alias("n_docs")]
    for rule, pred in _X100_FLAGS.items():
        aggs.append(
            F.sum(F.when(F.expr(pred), 1).otherwise(0))
            .cast("bigint")
            .alias(rule)
        )
    pass_all = F.when(~F.expr(_X100_FAIL_ANY), 1).otherwise(0)
    aggs.append(F.sum(pass_all).cast("bigint").alias("n_pass_all"))
    aggs.append(
        (F.sum(pass_all).cast("double") / F.count("*")).alias("retention_rate")
    )
    return per.agg(*aggs)


# ---------------------------------------------------------------------------
# X101 — unigram^0.75 negative-sampling table (word2vec prep)
#
# Skip-gram training draws negatives from the smoothed unigram
# distribution P(w) ∝ count(w)^0.75 (Mikolov et al. 2013 §2.2); the
# serving artifact is a BUCKET TABLE: each token owns a contiguous
# slice of a 2^20 grid proportional to its smoothed weight, so a
# uniform integer draw maps to a token with one range probe. Built
# here as a relational pipeline: token counts (data-sized shuffle),
# then weights/cumsum/buckets on the VOCABULARY grain (bounded —
# the only global window).
#
# Cross-engine determinism: c^0.75 is computed as sqrt(sqrt(c·c·c)) —
# double multiply and sqrt are IEEE correctly-rounded, so both engines
# produce bit-identical weights with NO libm pow() involved — then
# quantized to integer micro-units; cumsum and bucket edges are pure
# BIGINT arithmetic (floor division by the grand total).
# ---------------------------------------------------------------------------

_X101_GRID = 1 << 20


@register(
    "x101_unigram_sampling_table",
    oracle=f"""
WITH words AS (
  SELECT unnest(string_split({NORM_DUCK.format(col="text")}, ' ')) AS token
  FROM documents
), vocab AS (
  SELECT token, COUNT(*) AS cnt FROM words GROUP BY token
), wt AS (
  SELECT token, cnt,
         CAST(ROUND(SQRT(SQRT(CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE)
                              * CAST(cnt AS DOUBLE))) * 1e6) AS BIGINT)
           AS weight_micro
  FROM vocab
), cum AS (
  SELECT token, cnt, weight_micro,
         CAST(SUM(weight_micro) OVER (ORDER BY cnt DESC, token ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS BIGINT) AS c_inc,
         CAST(SUM(weight_micro) OVER () AS BIGINT) AS total
  FROM wt
)
SELECT token, cnt, weight_micro,
       CAST(((c_inc - weight_micro) * {_X101_GRID}) // total AS BIGINT)
         AS bucket_start,
       CAST((c_inc * {_X101_GRID}) // total AS BIGINT) AS bucket_end
FROM cum ORDER BY cnt DESC, token ASC
""",
    doc="Negative-sampling bucket table: unigram counts smoothed by "
    "^0.75 (computed as sqrt(sqrt(c^3)) — correctly-rounded IEEE ops "
    "only, no libm pow), micro-quantized, cumulated over the bounded "
    "vocabulary grain into contiguous slices of a 2^20 draw grid.",
)
def x101_unigram_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.operators.prefix import prefix_rank

    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    words = _tok_index(spark, sf_dir).select(
        F.explode("w").alias("token")
    )
    vocab = words.groupBy("token").agg(F.count("*").alias("cnt"))
    c = F.col("cnt").cast("double")
    wt = vocab.select(
        "token",
        "cnt",
        F.round(F.sqrt(F.sqrt(c * c * c)) * 1e6)
        .cast("bigint")
        .alias("weight_micro"),
    )
    # The cumulative sum runs over the whole VOCABULARY, which grows
    # with the corpus (Heaps' law: ~10⁸ terms at 100 TB) — a global
    # ORDER BY window would funnel it through one task. Distributed
    # prefix operator instead: range-repartition on the (cnt DESC,
    # token) total order, partition-local running sums, broadcast
    # per-partition offsets. Bit-exact (integer micro-units).
    cum = prefix_rank(
        wt,
        order=[F.desc("cnt"), F.asc("token")],
        value="weight_micro",
        cum_col="c_inc",
        total_sum_col="total",
        pin_input=True,  # tokenize+vocab rollup would run 2x in sampling
    ).select(
        "token",
        "cnt",
        "weight_micro",
        F.col("c_inc").cast("bigint").alias("c_inc"),
        F.col("total").cast("bigint").alias("total"),
    )
    grid = F.lit(_X101_GRID).cast("bigint")
    return cum.select(
        "token",
        "cnt",
        "weight_micro",
        F.expr(f"((c_inc - weight_micro) * {_X101_GRID}) div total")
        .cast("bigint")
        .alias("bucket_start"),
        F.expr(f"(c_inc * {_X101_GRID}) div total")
        .cast("bigint")
        .alias("bucket_end"),
    ).orderBy(F.desc("cnt"), F.asc("token"))


# ---------------------------------------------------------------------------
# X102 — systematic (grid) importance resampling
#
# x30/x75/x88 sample by hash race or allocation; SYSTEMATIC resampling
# is the low-variance scheme particle filters and data-mixing recipes
# use: lay K evenly-spaced grid points over the cumulative weight axis
# (offset W/2K — deterministic, no RNG) and take each document once
# per grid point its weight span covers. Long documents can be drawn
# with multiplicity >1; every stratum of weight W/K contributes
# exactly one draw — variance provably below multinomial sampling.
#
# The cumulative weight axis over EVERY document is a data-sized
# prefix sum, so it runs on operators/prefix.py's two-phase
# repartitionByRange plan (partition-local window + broadcast
# offsets), never a single-partition sort. Grid-point counting per
# document is closed-form BIGINT arithmetic on the inclusive/exclusive
# prefix pair: npts(c) = ⌊(2cK − W)/2W⌋ + 1 for 2cK ≥ W.
# ---------------------------------------------------------------------------

_X102_K = 64


@register(
    "x102_systematic_resample",
    oracle=f"""
WITH cum AS (
  SELECT doc_id, source, n_chars,
         CAST(SUM(n_chars) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS c_inc,
         CAST(SUM(n_chars) OVER () AS BIGINT) AS w
  FROM documents
), hits AS (
  SELECT doc_id, source,
         (CASE WHEN 2 * c_inc * {_X102_K} >= w
               THEN (2 * c_inc * {_X102_K} - w) // (2 * w) + 1 ELSE 0 END)
         - (CASE WHEN 2 * (c_inc - n_chars) * {_X102_K} >= w
                 THEN (2 * (c_inc - n_chars) * {_X102_K} - w) // (2 * w) + 1
                 ELSE 0 END) AS mult
  FROM cum
)
SELECT source,
       CAST(SUM(mult) AS BIGINT) AS n_draws,
       CAST(SUM(CASE WHEN mult > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_drawn,
       CAST(SUM(doc_id * mult) AS BIGINT) AS draw_checksum
FROM hits WHERE mult > 0
GROUP BY source ORDER BY source
""",
    doc=f"Systematic resampling: {_X102_K} evenly-spaced grid points "
    "over the cumulative n_chars axis (deterministic half-stride "
    "offset, no RNG), per-doc draw multiplicity in closed-form BIGINT "
    "arithmetic on the distributed prefix sum — the low-variance "
    "weighted resampler beside the hash-race samplers.",
)
def x102_systematic_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.operators.prefix import prefix_rank

    d = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    ranked = prefix_rank(
        d,
        [F.asc("doc_id")],
        "n_chars",
        cum_col="c_inc",
        total_sum_col="w",
    )
    k2 = 2 * _X102_K
    npts_inc = F.when(
        F.expr(f"{k2} * c_inc >= w"),
        F.expr(f"({k2} * c_inc - w) div (2 * w) + 1"),
    ).otherwise(F.lit(0))
    npts_exc = F.when(
        F.expr(f"{k2} * (c_inc - n_chars) >= w"),
        F.expr(f"({k2} * (c_inc - n_chars) - w) div (2 * w) + 1"),
    ).otherwise(F.lit(0))
    hits = ranked.select(
        "doc_id", "source", (npts_inc - npts_exc).alias("mult")
    ).filter(F.col("mult") > 0)
    return (
        hits.groupBy("source")
        .agg(
            F.sum("mult").cast("bigint").alias("n_draws"),
            F.sum(F.when(F.col("mult") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs_drawn"),
            F.sum(F.col("doc_id") * F.col("mult"))
            .cast("bigint")
            .alias("draw_checksum"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X103 — Wilson score interval on per-source retention
#
# Point retention rates (x70/x100) without uncertainty invite bad
# curation calls on small sources; the Wilson (1927) score interval is
# the standard small-n-safe CI for a binomial proportion (never
# escapes [0,1], asymmetric near the edges — unlike the Wald
# interval). Pass rule: n_chars >= threshold (a deliberately simple
# gate; the CI machinery is the operator).
#
# Cross-engine determinism: z and z² are inlined as Python-repr'd
# double literals (both engines parse decimal literals to the nearest
# double → identical bits); everything downstream is +,·,/ and sqrt —
# all IEEE correctly-rounded — evaluated in the same written order,
# so the bounds are bit-identical with NO quantization step.
# ---------------------------------------------------------------------------

_X103_MIN_CHARS = 200
_X103_Z = 1.96
_X103_Z2 = _X103_Z * _X103_Z  # exact double product, inlined by repr


@register(
    "x103_retention_wilson_ci",
    oracle=f"""
WITH agg AS (
  SELECT source, COUNT(*) AS n,
         CAST(SUM(CASE WHEN n_chars >= {_X103_MIN_CHARS} THEN 1 ELSE 0 END)
              AS BIGINT) AS s
  FROM documents GROUP BY source
)
SELECT source, n, s,
       CAST(s AS DOUBLE) / n AS p_hat,
       (CAST(s AS DOUBLE) / n + {_X103_Z2!r} / (2 * n)
        - {_X103_Z!r} * SQRT((CAST(s AS DOUBLE) / n)
                             * (1 - CAST(s AS DOUBLE) / n) / n
                             + {_X103_Z2!r} / (4.0 * n * n)))
         / (1 + {_X103_Z2!r} / n) AS wilson_low,
       (CAST(s AS DOUBLE) / n + {_X103_Z2!r} / (2 * n)
        + {_X103_Z!r} * SQRT((CAST(s AS DOUBLE) / n)
                             * (1 - CAST(s AS DOUBLE) / n) / n
                             + {_X103_Z2!r} / (4.0 * n * n)))
         / (1 + {_X103_Z2!r} / n) AS wilson_high
FROM agg ORDER BY source
""",
    doc="Wilson score 95% CI on per-source retention (pass = n_chars "
    ">= 200): repr-inlined z constants, correctly-rounded IEEE "
    "arithmetic in identical evaluation order on both engines — "
    "uncertainty-aware curation without a quantization step.",
)
def x103_retention_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    agg = d.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("n_chars") >= _X103_MIN_CHARS, 1).otherwise(0))
        .cast("bigint")
        .alias("s"),
    )
    n = F.col("n")
    p = F.col("s").cast("double") / n
    z, z2 = F.lit(_X103_Z), F.lit(_X103_Z2)
    half = z * F.sqrt(p * (F.lit(1) - p) / n + z2 / (F.lit(4.0) * n * n))
    denom = F.lit(1) + z2 / n
    return agg.select(
        "source",
        "n",
        "s",
        p.alias("p_hat"),
        ((p + z2 / (2 * n) - half) / denom).alias("wilson_low"),
        ((p + z2 / (2 * n) + half) / denom).alias("wilson_high"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# X104 — empirical-Bayes (beta-binomial) shrinkage of source retention
#
# x103 puts intervals on raw per-source rates; the other standard move
# is to SHRINK them toward the corpus: fit a Beta(α, β) prior across
# sources by method of moments (Morris 1983) and report each source's
# posterior mean (s+α)/(n+α+β) — small sources pull strongly to the
# pooled rate, large ones barely move. The estimator OLAP engines ship
# as "smoothed rates".
#
# Cross-engine determinism: pooled mean and each squared deviation are
# IEEE ops on identical operands; deviations are quantized to integer
# pico-units before the cross-source sum (order-free), and the
# K = m(1-m)/v − 1 / α / β / posterior chain is evaluated in the same
# written order on both engines. Underdispersion (v ≈ 0 or K ≤ 0)
# degenerates to the pooled mean via an explicit CASE on both sides.
#
# Scale: one data-sized shuffle to the source grain; everything after
# runs on the bounded source relation with 1-row broadcast scalars.
# ---------------------------------------------------------------------------


@register(
    "x104_eb_shrinkage",
    oracle=f"""
WITH per AS (
  SELECT source, COUNT(*) AS n,
         CAST(SUM(CASE WHEN n_chars >= {_X103_MIN_CHARS} THEN 1 ELSE 0 END)
              AS BIGINT) AS s
  FROM documents GROUP BY source
), t1 AS (
  SELECT CAST(SUM(s) AS DOUBLE) / SUM(n) AS m, COUNT(*) AS k FROM per
), t2 AS (
  SELECT CAST(SUM(CAST(ROUND((CAST(s AS DOUBLE) / n - m)
                             * (CAST(s AS DOUBLE) / n - m) * 1e12)
                       AS BIGINT)) AS BIGINT) AS v_pico
  FROM per CROSS JOIN t1
)
SELECT source, n, s,
       CAST(s AS DOUBLE) / n AS raw_rate,
       CASE WHEN v_pico <= 0
              OR (m * (1 - m))
                 / (CAST(v_pico AS DOUBLE) / (k * 1e12)) - 1 <= 0
            THEN m
            ELSE (s + m * ((m * (1 - m))
                           / (CAST(v_pico AS DOUBLE) / (k * 1e12)) - 1))
                 / (n + (m * (1 - m))
                        / (CAST(v_pico AS DOUBLE) / (k * 1e12)) - 1)
       END AS shrunk_rate
FROM per CROSS JOIN t1 CROSS JOIN t2
ORDER BY source
""",
    doc="Beta-binomial empirical-Bayes shrinkage of per-source "
    "retention (method-of-moments prior across sources, pico-"
    "quantized between-source variance): posterior means that pull "
    "small sources to the pooled rate — the smoothed-rate companion "
    "to x103's intervals.",
)
def x104_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("n_chars") >= _X103_MIN_CHARS, 1).otherwise(0))
        .cast("bigint")
        .alias("s"),
    )
    t1 = per.agg(
        (F.sum("s").cast("double") / F.sum("n")).alias("m"),
        F.count("*").alias("k"),
    )
    r = F.col("s").cast("double") / F.col("n")
    t2 = (
        per.crossJoin(F.broadcast(t1))  # 1-row scalar
        .agg(
            F.sum(
                F.round((r - F.col("m")) * (r - F.col("m")) * 1e12).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("v_pico")
        )
    )
    m, k, vp = F.col("m"), F.col("k"), F.col("v_pico")
    kk = (m * (1 - m)) / (vp.cast("double") / (k * F.lit(1e12))) - 1
    shrunk = F.when((vp <= 0) | (kk <= 0), m).otherwise(
        (F.col("s") + m * kk) / (F.col("n") + kk)
    )
    return (
        per.crossJoin(F.broadcast(t1))  # 1-row scalar
        .crossJoin(F.broadcast(t2))  # 1-row scalar
        .select(
            "source",
            "n",
            "s",
            r.alias("raw_rate"),
            shrunk.alias("shrunk_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X105 — multi-scale intra-document repeat census
#
# x100 catches repeated 2/3-grams at the word grain; this measures
# INTERNAL EXACT REPETITION AT EVERY SCALE: for span s ∈ {1,2,4,…,64}
# characters, which documents contain some length-s substring twice,
# how many repeat classes, how many positions? The multi-span profile
# separates "repeats a phrase" from "repeats a paragraph" — the
# signal that drives span-level dedup decisions (x44/x98 chunking)
# rather than a single fixed n.
#
# Substring classes are md5-folded to the repo's standard 60-bit
# fingerprint (functions/hashing.py — the same family every LSH/CDC
# operator uses; the oracle applies the IDENTICAL fold, so both
# engines agree unconditionally), which keeps the one shuffle at a
# fixed ~24 bytes/row instead of up to 64-char substring keys.
#
# Scale: one explode → one (doc, span, digest) hash aggregate → a
# 7-row census. Fan-out is ~|spans|·chars rows; at extreme corpus
# scale the spans loop can run as independent passes, and each pass's
# shuffle is digest-bounded — the same posture as x4's posting lists.
# No window, no iteration, no driver loop.
# ---------------------------------------------------------------------------

_X105_SPANS = (1, 2, 4, 8, 16, 32, 64)


@register(
    "x105_multiscale_repeat_census",
    oracle=f"""
WITH spans(s) AS (VALUES {", ".join(f"({s})" for s in _X105_SPANS)}),
m AS (
  SELECT doc_id, {NORM_DUCK.format(col="text")} AS norm FROM documents
), pos AS (
  SELECT m.doc_id, spans.s, m.norm,
         unnest(generate_series(1, length(m.norm) - spans.s + 1)) AS i
  FROM m JOIN spans ON length(m.norm) >= spans.s
), subs AS (
  SELECT doc_id, s, {_flat_fold("h")} AS dig
  FROM (SELECT doc_id, s, md5(substr(norm, i, s)) AS h FROM pos)
), grp AS (
  SELECT doc_id, s, dig, COUNT(*) AS c
  FROM subs GROUP BY doc_id, s, dig
), dup AS (
  SELECT s, COUNT(DISTINCT doc_id) AS docs, COUNT(*) AS classes,
         CAST(SUM(c) AS BIGINT) AS positions
  FROM grp WHERE c >= 2 GROUP BY s
)
SELECT CAST(spans.s AS BIGINT) AS span,
       CAST(COALESCE(dup.docs, 0) AS BIGINT) AS n_docs_with_repeat,
       CAST(COALESCE(dup.classes, 0) AS BIGINT) AS n_repeat_classes,
       CAST(COALESCE(dup.positions, 0) AS BIGINT) AS n_repeat_positions
FROM spans LEFT JOIN dup ON spans.s = dup.s
ORDER BY span
""",
    doc="Exact internal-repeat census at character spans 1..64 "
    "(60-bit md5 substring classes, identical fold on both engines): "
    "per span, documents/classes/positions with an intra-doc repeat "
    "— the multi-scale repetition profile behind span-level dedup "
    "choices, in one explode + one hash aggregate.",
)
def x105_multiscale_repeat_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import LongType

    d = table(spark, sf_dir, "documents")
    norm_sql = NORM_SPARK.format(col="text")
    spans_arr = ", ".join(str(s) for s in _X105_SPANS)
    # one explode producing (span, digest) per position per fitting span
    subs = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"""
                flatten(transform(array({spans_arr}), s ->
                  transform(
                    filter(sequence(1, greatest(length({norm_sql}) - s + 1, 1)),
                           i -> i <= length({norm_sql}) - s + 1),
                    i -> struct(s AS s,
                                conv(substring(md5(substring({norm_sql}, i, s)), 1, 15),
                                     16, 10) AS dig))))
                """
            )
        ).alias("e"),
    ).select(
        "doc_id",
        F.col("e.s").alias("s"),
        F.col("e.dig").cast(LongType()).alias("dig"),
    )
    grp = subs.groupBy("doc_id", "s", "dig").agg(F.count("*").alias("c"))
    dup = (
        grp.filter(F.col("c") >= 2)
        .groupBy("s")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias(
                "n_docs_with_repeat"
            ),
            F.count("*").cast("bigint").alias("n_repeat_classes"),
            F.sum("c").cast("bigint").alias("n_repeat_positions"),
        )
    )
    spans = d.sparkSession.createDataFrame(
        [(s,) for s in _X105_SPANS], "span int"
    )
    return (
        spans.join(dup, spans.span == dup.s, "left")
        .select(
            F.col("span").cast("bigint").alias("span"),
            F.coalesce("n_docs_with_repeat", F.lit(0))
            .cast("bigint")
            .alias("n_docs_with_repeat"),
            F.coalesce("n_repeat_classes", F.lit(0))
            .cast("bigint")
            .alias("n_repeat_classes"),
            F.coalesce("n_repeat_positions", F.lit(0))
            .cast("bigint")
            .alias("n_repeat_positions"),
        )
        .orderBy("span")
    )


# ---------------------------------------------------------------------------
# X106 — CCNet head/middle/tail partition by LM score
#
# CCNet (Wenzek et al. 2020) splits a crawl into head/middle/tail
# TERCILES by language-model perplexity and trains on the head: the
# canonical "learned quality" partition. Here the score is x25's
# per-doc mean unigram log-prob (same micro-nat contract), and the
# tercile cut is EXACT by global rank — rank ≤ N/3 is head,
# ≤ 2N/3 middle, else tail — not an approximate percentile.
#
# The global rank over every document rides the distributed prefix
# operator (repartitionByRange + partition-local row_number +
# broadcast offsets); the oracle uses a plain window ROW_NUMBER. Ties
# break on doc_id, so the cut is a total order in both engines, and
# every bucket boundary is integer arithmetic on (rank, N).
#
# Scale: x25's two token passes (map-side combined, broadcast vocab)
# + one prefix rank + a bucket×source census. No global sort, no
# single-partition window.
# ---------------------------------------------------------------------------


@register(
    "x106_ccnet_terciles",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({NORM_DUCK.format(col="text")}, ' ')) AS term
  FROM documents
), vocab AS (
  SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term
), total AS (
  SELECT SUM(cnt) AS n_tokens FROM vocab
), lp AS (
  SELECT term,
         CAST(ROUND(ln(CAST(cnt AS DOUBLE) / n_tokens) * 1e6) AS BIGINT)
           AS lp_micro
  FROM vocab CROSS JOIN total
), scored AS (
  SELECT t.doc_id,
         CAST(SUM(lp.lp_micro) AS BIGINT) AS lp_sum,
         CAST(COUNT(*) AS BIGINT) AS n_toks
  FROM toks t JOIN lp USING (term) GROUP BY t.doc_id
), ranked AS (
  SELECT d.doc_id, d.source, s.n_toks,
         ROW_NUMBER() OVER (
           ORDER BY CAST(s.lp_sum AS DOUBLE) / s.n_toks DESC, d.doc_id ASC
         ) AS rn,
         COUNT(*) OVER () AS n
  FROM documents d JOIN scored s USING (doc_id)
)
SELECT CASE WHEN 3 * rn <= n THEN 'head'
            WHEN 3 * rn <= 2 * n THEN 'middle'
            ELSE 'tail' END AS bucket,
       source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens
FROM ranked
GROUP BY 1, 2 ORDER BY bucket, source
""",
    doc="CCNet head/middle/tail terciles by x25's mean unigram "
    "log-prob (exact global-rank cuts on the distributed prefix "
    "operator, total-order tiebreak), censused per bucket and "
    "source — the learned-quality partition that picks the training "
    "slice.",
)
def x106_ccnet_terciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.operators.prefix import prefix_rank

    d = table(spark, sf_dir, "documents")
    scored = x25_unigram_logprob(spark, sf_dir).select(
        "doc_id",
        F.col("lp_micro_sum").alias("lp_sum"),
        F.col("n_tokens").alias("n_toks"),
    )
    base = d.select("doc_id", "source").join(scored, "doc_id")
    score = F.col("lp_sum").cast("double") / F.col("n_toks")
    ranked = prefix_rank(
        base.withColumn("__score", score),
        [F.desc("__score"), F.asc("doc_id")],
        rn_col="rn",
        total_rows_col="n",
        # base embeds x25's multi-pass unigram LM scoring — by far the
        # most expensive prefix input in the registry; sampling must
        # not execute it twice
        pin_input=True,
    )
    bucket = (
        F.when(3 * F.col("rn") <= F.col("n"), "head")
        .when(3 * F.col("rn") <= 2 * F.col("n"), "middle")
        .otherwise("tail")
    )
    return (
        ranked.groupBy(bucket.alias("bucket"), "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
        )
        .orderBy("bucket", "source")
    )


# ---------------------------------------------------------------------------
# X107 — distinct-n diversity census (corpus repetitiveness per source)
#
# distinct-n (Li et al. 2016, "A Diversity-Promoting Objective
# Function for Neural Conversation Models"): the fraction of n-gram
# instances that are unique. Low distinct-2/3 marks templated or
# self-repetitive sources worth down-weighting before training — the
# corpus-level cousin of x17's per-doc repetition signals and x105's
# intra-doc repeat census, aggregated to the (source, n) grain where
# mixing decisions are made.
#
# Scale shape: grams are digested (md5) BEFORE the shuffle so the
# exchange carries fixed-width digests, and the distinct count is a
# two-level aggregate — groupBy(source, n, digest) with map-side
# combine, then a (source, n)-grain rollup — instead of a
# countDistinct expand over the raw gram stream. Both engines count
# distinct digests, so collisions (if any) are identical on both
# sides and the comparison stays exact.
# ---------------------------------------------------------------------------


@register(
    "x107_distinct_ngram_diversity",
    oracle=f"""
WITH toks AS (
  SELECT source, string_split({NORM_DUCK.format(col="text")}, ' ') AS t
  FROM documents
), grams AS (
  SELECT source, ns.n,
         unnest([md5(array_to_string(t[i:i+ns.n-1], ' '))
                 for i in range(1, len(t)-ns.n+2)]) AS g
  FROM toks CROSS JOIN (VALUES (1), (2), (3)) ns(n)
), per_gram AS (
  SELECT source, n, g, COUNT(*) AS cnt FROM grams GROUP BY 1, 2, 3
)
SELECT source, n,
       CAST(SUM(cnt) AS BIGINT) AS n_grams,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(cnt), 4) AS distinct_ratio
FROM per_gram GROUP BY 1, 2 ORDER BY source, n
""",
    doc="distinct-n diversity (n=1..3) per source: unique-fraction of "
    "n-gram instances (Li et al. 2016) — the corpus-grain "
    "repetitiveness gauge for source down-weighting; digest-grain "
    "two-level aggregate, no countDistinct expand.",
)
def x107_distinct_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    toks = _tok_index(spark, sf_dir).select(
        "source", F.col("w").alias("t")
    )
    grams = (
        toks.select(
            "source",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("n"),
            "t",
        )
        # guard BEFORE sequence(): Spark's sequence(1, k) runs
        # DESCENDING when k < 1, which would fabricate grams for
        # docs shorter than n
        .filter(F.size("t") >= F.col("n"))
        .select(
            "source",
            "n",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - n + 1),"
                    " i -> md5(array_join(slice(t, i, n), ' ')))"
                )
            ).alias("g"),
        )
    )
    per_gram = grams.groupBy("source", "n", "g").agg(F.count("*").alias("cnt"))
    return (
        per_gram.groupBy("source", "n")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_grams"),
            F.count("*").cast("bigint").alias("n_distinct"),
            F.round(F.count("*").cast("double") / F.sum("cnt"), 4).alias(
                "distinct_ratio"
            ),
        )
        .orderBy("source", "n")
    )


# ---------------------------------------------------------------------------
# X108 — term adaptation (Church 2000: "the chance of two Noriegas")
#
# For each high-DF term: adaptation = P(term recurs in a doc | it
# occurred once) = df2/df1, vs the base rate P(occurs at all) = df/N.
# Church's empirical law — adaptation is closer to p/2 than the
# independence prediction p² — is the statistical fingerprint of
# topical text; terms whose adaptation ≈ base rate behave like
# function words. In a curation pipeline this separates content terms
# (good keyword features, x12's TF-IDF numerators) from glue, with no
# stopword list.
#
# Two map-side-combined aggregates on shrinking grains — (doc, term)
# then term — a broadcast 1-row N, and a TakeOrderedAndProject top-50:
# nothing data-sized crosses a single task.
# ---------------------------------------------------------------------------


@register(
    "x108_term_adaptation",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split({NORM_DUCK.format(col="text")}, ' ')) AS term
  FROM documents
), per AS (
  SELECT doc_id, term, COUNT(*) AS c FROM toks GROUP BY 1, 2
), stats AS (
  SELECT term, COUNT(*) AS df,
         CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS df2
  FROM per GROUP BY 1
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT term, df, df2,
       ROUND(CAST(df2 AS DOUBLE) / df, 4) AS adaptation,
       ROUND(CAST(df AS DOUBLE) / n_docs, 4) AS base_rate
FROM stats CROSS JOIN n
ORDER BY df DESC, term LIMIT 50
""",
    doc="Term adaptation (Church 2000): P(recurrence | occurrence) = "
    "df2/df vs base rate df/N for the top-50 DF terms — flags "
    "content terms (adaptation >> base rate) without a stopword "
    "list; doc-term then term-grain aggregates, broadcast scalar N, "
    "top-k sort.",
)
def x108_term_adaptation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    d = _tok_index(spark, sf_dir)
    toks = d.select("doc_id", F.explode("w").alias("term"))
    per = toks.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    stats = per.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum(F.when(F.col("c") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("df2"),
    )
    n = d.agg(F.count("*").alias("n_docs"))  # 1 row, broadcast by planner
    return (
        stats.crossJoin(F.broadcast(n))
        .select(
            "term",
            "df",
            "df2",
            F.round(F.col("df2").cast("double") / F.col("df"), 4).alias(
                "adaptation"
            ),
            F.round(F.col("df").cast("double") / F.col("n_docs"), 4).alias(
                "base_rate"
            ),
        )
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# X109 — padding-waste ablation at candidate context lengths
#
# The cost model that justifies x24's sequence packing: if each doc
# were padded to a multiple of the context length L instead of packed,
# how many tokens would be padding? seqs = ⌈n/L⌉, waste = seqs·L − n,
# reported at L ∈ {128, 512, 2048}. waste_pct at the chosen L is the
# exact throughput headroom packing buys — the number a capacity plan
# needs before renting the cluster.
#
# Pure integer arithmetic per doc, one map-side-combined aggregate per
# L (explode ×3), no window, no join.
# ---------------------------------------------------------------------------


@register(
    "x109_padding_waste",
    oracle=f"""
WITH toks AS (
  SELECT len(string_split({NORM_DUCK.format(col="text")}, ' ')) AS n
  FROM documents
), per AS (
  SELECT ls.l, n, (n + ls.l - 1) // ls.l AS seqs
  FROM toks CROSS JOIN (VALUES (128), (512), (2048)) ls(l)
)
SELECT l AS context_len,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(seqs) AS BIGINT) AS n_seqs,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(SUM(seqs * l - n) AS BIGINT) AS padding_tokens,
       ROUND(CAST(SUM(seqs * l - n) AS DOUBLE) / SUM(seqs * l), 4)
         AS waste_pct
FROM per GROUP BY 1 ORDER BY context_len
""",
    doc="Padding-waste ablation: per-doc pad-to-L token waste at "
    "L=128/512/2048 — the unpacked-baseline cost x24's packing "
    "eliminates; integer ceil-division, single aggregate pass.",
)
def x109_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    toks = _tok_index(spark, sf_dir).select(F.size("w").alias("n"))
    per = toks.select(
        "n",
        F.explode(
            F.array(F.lit(128), F.lit(512), F.lit(2048))
        ).alias("l"),
    ).withColumn("seqs", F.expr("(n + l - 1) div l"))
    pad = F.col("seqs") * F.col("l") - F.col("n")
    return (
        per.groupBy(F.col("l").alias("context_len"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("seqs").cast("bigint").alias("n_seqs"),
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.sum(pad).cast("bigint").alias("padding_tokens"),
            F.round(
                F.sum(pad).cast("double")
                / F.sum(F.col("seqs") * F.col("l")),
                4,
            ).alias("waste_pct"),
        )
        .orderBy("context_len")
    )


# ---------------------------------------------------------------------------
# X112 — decontamination n-gram width sensitivity (8 / 13 / 21)
#
# x18 fixes n=13 (the GPT-3 convention); this sweeps the knob the
# decontamination papers actually argue about. Shorter grams catch
# paraphrase-adjacent overlap but flag more innocents; longer grams
# only catch verbatim inclusion. For each n ∈ {8, 13, 21}: how many
# train docs collide with the benchmark set at all, and how many
# distinct gram collisions there are — the exact flagged-volume curve
# that picks n before a full-corpus decontamination run.
#
# Same digest-join shape as x18 at every arm (inverted index on
# 60-bit gram digests, benchmark side broadcast); arms are separate
# gram widths, so this is one tokenization per n — the gram windows
# genuinely differ, there is nothing to share.
# ---------------------------------------------------------------------------

_X112_NS = [8, 13, 21]


def _gramn_duck(src: str, n: int) -> str:
    from calaveras_uniteus_etl_spark.functions.hashing import duckdb_md5_long_sql

    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""
  SELECT doc_id, unnest(CASE WHEN len(w) >= {n} THEN
           list_distinct(list_transform(range(1, len(w) - {n - 2}),
             i -> {duckdb_md5_long_sql(gram)}))
         ELSE [] END) AS g
  FROM (SELECT doc_id, string_split({NORM_DUCK.format(col="text")}, ' ') AS w
        FROM documents {src})"""


_X112_ARMS_DUCK = "\nUNION ALL\n".join(
    f"""SELECT {n} AS n_gram,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE doc_id >= 50)
         AS n_train_docs,
       CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_contaminated_docs,
       CAST(COUNT(DISTINCT (t.doc_id, t.g)) AS BIGINT)
         AS contaminated_grams,
       ROUND(CAST(COUNT(DISTINCT t.doc_id) AS DOUBLE)
             / (SELECT COUNT(*) FROM documents WHERE doc_id >= 50), 4)
         AS contaminated_rate
FROM ({_gramn_duck("WHERE doc_id >= 50", n)}) t
JOIN (SELECT DISTINCT g FROM ({_gramn_duck("WHERE doc_id < 50", n)})) b
  ON t.g = b.g"""
    for n in _X112_NS
)


@register(
    "x112_contamination_n_sweep",
    oracle=f"SELECT * FROM (\n{_X112_ARMS_DUCK}\n) ORDER BY n_gram",
    doc="Decontamination width sweep: distinct train-doc and gram "
    "collisions against the benchmark set at n=8/13/21 — the "
    "flagged-volume curve that picks the gram width before a "
    "full-corpus run; x18's digest-join shape at every arm.",
)
def x112_contamination_n_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The normalized word arrays feed SIX subtrees (bench + train side
    # of each of the three gram-width arms): all read the session
    # tokenized corpus — already a pinned leaf, so the regex-normalize
    # + split pass runs once per CORPUS, not six times per query. The
    # per-arm md5 gram digests still differ and are computed per arm —
    # that part is genuinely unshareable.
    words = _tok_index(spark, sf_dir).select("doc_id", "w")
    n_train = words.filter(F.col("doc_id") >= 50).agg(
        F.count("*").cast("bigint").alias("n_train_docs")
    )
    arms = []
    for n in _X112_NS:
        gram = "concat(" + ", ' ', ".join(f"w[i+{j}]" for j in range(n)) + ")"
        grams = words.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"case when size(w) >= {n} then "
                    f"array_distinct(transform(sequence(0, size(w)-{n}), "
                    f"i -> cast(conv(substr(md5({gram}), 1, 15), 16, 10)"
                    " as bigint))) "
                    "else array() end"
                )
            ).alias("g"),
        )
        bench = grams.filter(F.col("doc_id") < 50).select("g").distinct()
        hits = grams.filter(F.col("doc_id") >= 50).join(
            F.broadcast(bench), "g"
        )
        arms.append(
            hits.agg(
                F.countDistinct("doc_id")
                .cast("bigint")
                .alias("n_contaminated_docs"),
                F.countDistinct("doc_id", "g")
                .cast("bigint")
                .alias("contaminated_grams"),
            )
            .crossJoin(F.broadcast(n_train))
            .select(
                F.lit(n).alias("n_gram"),
                "n_train_docs",
                "n_contaminated_docs",
                "contaminated_grams",
                F.round(
                    F.col("n_contaminated_docs").cast("double")
                    / F.col("n_train_docs"),
                    4,
                ).alias("contaminated_rate"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("n_gram")


# ---------------------------------------------------------------------------
# X116 — order-independent shard checksums (transfer-integrity manifest)
#
# After writing training shards (x24/x54) and copying them across
# storage systems, the receiving side needs to verify integrity
# WITHOUT re-reading in the same order — distributed writes do not
# preserve row order, so a stream hash is useless. The standard fix:
# a commutative checksum. Per shard (x54's salted assignment): the
# SUM of per-document content digests md5_long('ck:' || doc_id || ':'
# || md5(text)) reduced mod 2^61−1, plus doc count and id range. Any
# dropped, duplicated, or corrupted document moves the sum; any
# reordering does not. Sums ride DECIMAL(38,0) so the reduction is
# exact at any corpus size before the Mersenne fold.
# ---------------------------------------------------------------------------

_X116_MOD = 2305843009213693951  # 2^61 - 1


@register(
    "x116_shard_checksums",
    oracle=f"""
WITH assigned AS (
  SELECT {_fold("'shard:' || CAST(doc_id AS VARCHAR)")} % {_X54_SHARDS}
           AS shard,
         doc_id,
         {_fold("'ck:' || CAST(doc_id AS VARCHAR) || ':' || md5(text)")}
           AS digest
  FROM documents
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id,
       CAST(SUM(CAST(digest AS HUGEINT)) % {_X116_MOD} AS BIGINT)
         AS checksum
FROM assigned GROUP BY shard ORDER BY shard
""",
    doc="Commutative shard checksums: per-shard SUM of 60-bit content "
    "digests mod 2^61-1 (exact DECIMAL reduction) with doc counts "
    "and id ranges — order-independent transfer-integrity "
    "verification for distributed shard writes.",
)
def x116_shard_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.functions.hashing import md5_long

    d = table(spark, sf_dir, "documents")
    shard = F.expr(
        "cast(conv(substr(md5(concat('shard:', cast(doc_id as string))), 1, 15),"
        f" 16, 10) as bigint) % {_X54_SHARDS}"
    )
    digest = md5_long(
        F.concat(
            F.lit("ck:"),
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.md5("text"),
        )
    )
    assigned = d.select(
        shard.alias("shard"), "doc_id", digest.alias("digest")
    )
    return (
        assigned.groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
            (F.sum(F.col("digest").cast("decimal(38,0)")) % _X116_MOD)
            .cast("bigint")
            .alias("checksum"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# X119 — PMI collocation mining (log-free, exact ordering)
#
# Classic corpus collocation extraction: bigrams whose joint frequency
# far exceeds the independence expectation. PMI = log2(p(xy)/(p(x)p(y)))
# is monotone in the LIFT ratio c_xy * N / (c_x * c_y), so the ranking
# is computed WITHOUT logs — no libm, no cross-engine ulp risk (the
# x58 micro-nat rounding trick works, but a pure mul/div pipeline is
# deterministic by IEEE alone). The lift is rounded to micro-units
# from one identically-ordered double expression in both engines.
# Scale shape: unigram and bigram counts are map-side-combined
# aggregates; the count join-back is a shuffle join on the bigram key
# (vocab-sized state must never broadcast); the min-count filter
# prunes the long tail BEFORE the joins; final top-k is
# TakeOrderedAndProject.
# ---------------------------------------------------------------------------

_X119_MIN_COUNT = 5
_X119_TOPK = 50


@register(
    "x119_pmi_collocations",
    oracle=f"""
WITH docs AS (
  SELECT doc_id, string_split({NORM_DUCK.format(col="text")}, ' ') AS w
  FROM documents
), toks AS (
  SELECT unnest(w) AS term FROM docs
), n AS (
  SELECT COUNT(*) AS n_tok FROM toks
), cu AS (
  SELECT term, COUNT(*) AS c1 FROM toks GROUP BY term
), bge AS (
  SELECT b.w1 AS w1, b.w2 AS w2 FROM (
    SELECT unnest(list_transform(range(len(w) - 1),
                  i -> struct_pack(w1 := w[i + 1], w2 := w[i + 2]))) AS b
    FROM docs WHERE len(w) >= 2
  )
), cbg AS (
  SELECT w1, w2, COUNT(*) AS c2 FROM bge GROUP BY w1, w2
  HAVING COUNT(*) >= {_X119_MIN_COUNT}
)
SELECT cbg.w1, cbg.w2,
       CAST(c2 AS BIGINT) AS pair_count,
       CAST(a.c1 AS BIGINT) AS w1_count,
       CAST(b.c1 AS BIGINT) AS w2_count,
       CAST(ROUND(CAST(c2 AS DOUBLE) * CAST(n_tok AS DOUBLE)
                  / (CAST(a.c1 AS DOUBLE) * CAST(b.c1 AS DOUBLE)) * 1e6)
            AS BIGINT) AS lift_micro
FROM cbg
JOIN cu a ON a.term = cbg.w1
JOIN cu b ON b.term = cbg.w2
CROSS JOIN n
ORDER BY lift_micro DESC, cbg.w1, cbg.w2
LIMIT {_X119_TOPK}
""",
    doc="Top collocations by PMI-equivalent lift c_xy*N/(c_x*c_y): "
    f"bigram count >= {_X119_MIN_COUNT}, micro-unit rounding from one "
    "identically-ordered double expression (no logs), shuffle join of "
    "vocab-sized counts, TakeOrdered top-"
    f"{_X119_TOPK}.",
)
def x119_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The normalized word arrays feed the unigram rollup AND the
    # bigram explode, and the unigram rollup feeds THREE consumers
    # (both sides of the PMI join + the token-total scalar): the arrays
    # come from the session tokenized corpus (already pinned, split
    # once per corpus); the vocabulary-sized rollup is pinned below and
    # the token total is sum(c1) over it (identical value, no extra
    # tokenize pass).
    docs = _tok_index(spark, sf_dir).select("doc_id", "w")
    toks = docs.select(F.explode("w").alias("term"))
    cu = (
        toks.groupBy("term")
        .agg(F.count("*").alias("c1"))
        .localCheckpoint(eager=True)
    )
    ntok = cu.agg(F.sum("c1").cast("double").alias("__n_tok"))
    bge = (
        docs.filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(w, 1, size(w) - 1), "
                    "slice(w, 2, size(w) - 1), "
                    "(a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("b")
        )
        .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    cbg = (
        bge.groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
        .filter(F.col("c2") >= _X119_MIN_COUNT)
    )
    a = cu.select(F.col("term").alias("w1"), F.col("c1").alias("c1a"))
    b = cu.select(F.col("term").alias("w2"), F.col("c1").alias("c1b"))
    lift = (
        F.round(
            F.col("c2").cast("double")
            * F.col("__n_tok")
            / (F.col("c1a").cast("double") * F.col("c1b").cast("double"))
            * F.lit(1e6)
        )
        .cast("bigint")
    )
    return (
        cbg.join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(ntok))
        .select(
            "w1",
            "w2",
            F.col("c2").cast("bigint").alias("pair_count"),
            F.col("c1a").cast("bigint").alias("w1_count"),
            F.col("c1b").cast("bigint").alias("w2_count"),
            lift.alias("lift_micro"),
        )
        .orderBy(F.desc("lift_micro"), "w1", "w2")
        .limit(_X119_TOPK)
    )


# ---------------------------------------------------------------------------
# X121 — water-filling source budget allocator
#
# The quota solver between x28's mixture weights and x49's greedy
# budget fill: given per-source token counts and a total token
# budget, find the water level L such that sum_s min(n_s, L) spends
# the budget — small sources keep everything, large sources are
# capped at L, the classic fair-allocation / temperature-flattening
# primitive for corpus mixing. Closed form over the SORTED source
# grain: for the first capped row (ascending n), L = (B - cum_before)
# div (#remaining); validity pinned by (prev_n <= L < n). Integer
# remainder goes +1 to the largest capped sources (deterministic
# tie-break by name). Everything runs on the source grain (~dozens of
# rows at any corpus size — the token counts come from one map-side-
# combined aggregate over the corpus); the grain windows are bounded.
# ---------------------------------------------------------------------------

_X121_BUDGET_PCT = 60


@register(
    "x121_waterfill_budget",
    oracle=f"""
WITH toks AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT source, unnest(string_split({NORM_DUCK.format(col="text")}, ' ')) AS t
        FROM documents)
  GROUP BY source
), tot AS (
  SELECT SUM(n) AS total, COUNT(*) AS s,
         SUM(n) * {_X121_BUDGET_PCT} // 100 AS b
  FROM toks
), ordered AS (
  SELECT source, n,
         ROW_NUMBER() OVER (ORDER BY n, source) AS rn,
         SUM(n) OVER (ORDER BY n, source) - n AS cum_before,
         LAG(n) OVER (ORDER BY n, source) AS prev_n
  FROM toks
), cand AS (
  SELECT rn, cum_before,
         (b - cum_before) // (s - rn + 1) AS level,
         b - cum_before - ((b - cum_before) // (s - rn + 1)) * (s - rn + 1)
           AS remainder
  FROM ordered CROSS JOIN tot
  WHERE n > (b - cum_before) // (s - rn + 1)
    AND (prev_n IS NULL OR prev_n <= (b - cum_before) // (s - rn + 1))
), lvl AS (
  -- no cand row means the budget covers the whole corpus
  SELECT COALESCE(MAX(level), 9223372036854775807) AS level,
         COALESCE(MAX(remainder), 0) AS remainder
  FROM cand
)
SELECT source,
       n AS n_tokens,
       n > level AS capped,
       CAST(CASE WHEN n <= level THEN n
            ELSE level + CASE WHEN ROW_NUMBER() OVER (
                   PARTITION BY (n > level) ORDER BY n DESC, source
                 ) <= remainder AND n > level THEN 1 ELSE 0 END
            END AS BIGINT) AS quota
FROM toks CROSS JOIN lvl
ORDER BY source
""",
    doc=f"Water-filling allocation of a {_X121_BUDGET_PCT}% token "
    "budget across sources: closed-form level on the sorted source "
    "grain, small sources uncapped, large sources capped at the "
    "level, integer remainder to the largest capped sources — the "
    "fair corpus-mixing quota solver; sum(quota) == budget exactly.",
)
def x121_waterfill_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    toks = (
        _tok_index(spark, sf_dir)
        .select("source", F.explode("w").alias("t"))
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = toks.agg(
        F.sum("n").alias("total"),
        F.count("*").alias("s"),
        F.expr(f"sum(n) * {_X121_BUDGET_PCT} div 100").alias("b"),
    )
    # source grain (bounded): global windows over ~dozens of rows
    w_ord = Window.orderBy("n", "source")
    ordered = (
        toks.crossJoin(F.broadcast(tot))
        .withColumn("rn", F.row_number().over(w_ord))
        .withColumn("cum_before", F.sum("n").over(w_ord) - F.col("n"))
        .withColumn("prev_n", F.lag("n").over(w_ord))
    )
    level_expr = F.expr("(b - cum_before) div (s - rn + 1)")
    cand = ordered.filter(
        (F.col("n") > level_expr)
        & (F.col("prev_n").isNull() | (F.col("prev_n") <= level_expr))
    ).select(
        level_expr.alias("level"),
        (
            F.col("b")
            - F.col("cum_before")
            - level_expr * (F.col("s") - F.col("rn") + 1)
        ).alias("remainder"),
    )
    lvl = cand.agg(
        F.coalesce(F.max("level"), F.lit(9223372036854775807)).alias("level"),
        F.coalesce(F.max("remainder"), F.lit(0)).alias("remainder"),
    )
    w_extra = Window.partitionBy(F.col("n") > F.col("level")).orderBy(
        F.desc("n"), F.asc("source")
    )
    quota = F.when(F.col("n") <= F.col("level"), F.col("n")).otherwise(
        F.col("level")
        + F.when(
            (F.row_number().over(w_extra) <= F.col("remainder"))
            & (F.col("n") > F.col("level")),
            1,
        ).otherwise(0)
    )
    return (
        toks.crossJoin(F.broadcast(lvl))
        .select(
            "source",
            F.col("n").alias("n_tokens"),
            (F.col("n") > F.col("level")).alias("capped"),
            quota.cast("bigint").alias("quota"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X123 — exact heavy hitters via local candidate pruning
#
# x22 ranks the global top-k and x43 sketches frequencies with
# count-min; THIS answers the threshold question exactly — every term
# with frequency > N/k (phi-heavy hitters, phi = 1/k) — without ever
# shuffling the long tail. Phase 1 is Arrow-batched local counting
# (operators/sketches.local_heavy_candidates): by pigeonhole a global
# heavy hitter must be batch-heavy somewhere, so the union of
# per-batch survivors (≤ k−1 per batch) is a deterministic SUPERSET
# of the answer no matter how rows land in batches/partitions. Phase 2
# recounts ONLY the candidates — a broadcast semi-join (candidate set
# is bounded by k·#batches, not vocabulary size) feeding one hash
# aggregate — then applies the exact integer threshold cnt·k > N.
# The candidate SET varies with partitioning; the OUTPUT never does:
# phase 2 recounts exactly and the final filter is partition-blind.
# Scale shape: at 100 TB the vocabulary (trillions of n-grams) never
# fits a hash aggregate, but candidates do; this is the standard
# two-phase exact-HH plan (cf. Misra-Gries 1982).
# ---------------------------------------------------------------------------

_X123_K = 40  # phi = 1/40: report terms above 2.5% of all tokens


@register(
    "x123_heavy_hitters",
    oracle=f"""
WITH toks AS (
  SELECT unnest(string_split({NORM_DUCK.format(col="text")}, ' ')) AS term
  FROM documents
), tf AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks WHERE term <> '' GROUP BY term
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM tf
)
SELECT term, cnt, ROUND(CAST(cnt AS DOUBLE) / tot.n, 6) AS share
FROM tf CROSS JOIN tot
WHERE cnt * {_X123_K} > tot.n
ORDER BY cnt DESC, term
""",
    doc=f"Exact phi-heavy hitters (phi = 1/{_X123_K}): Misra-Gries-style "
    "per-batch candidate pruning (pigeonhole superset guarantee), then "
    "a broadcast-semi-join exact recount and the integer threshold "
    "cnt*k > N — the two-phase plan that never hash-aggregates the "
    "long tail.",
)
def x123_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.operators.sketches import (
        local_heavy_candidates,
    )

    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    toks = _tok_index(spark, sf_dir).select(
        F.explode("w").alias("term")
    ).filter(F.col("term") != "")
    cand = local_heavy_candidates(toks, "term", k=_X123_K).distinct()
    total = toks.agg(F.count("*").cast("bigint").alias("n"))  # 1-row scalar
    return (
        toks.join(F.broadcast(cand), "term")  # semi-shaped: cand is tiny
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(total))  # 1-row scalar
        .filter(F.col("cnt") * _X123_K > F.col("n"))
        .select(
            "term",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("n"), 6).alias(
                "share"
            ),
        )
        .orderBy(F.desc("cnt"), "term")
    )


# ---------------------------------------------------------------------------
# X124 — pairwise Jensen-Shannon divergence between source vocabularies
#
# x81 measures each source against the corpus (asymmetric KL, corpus
# support guarantees finiteness); mixture DESIGN also needs the
# source-vs-source distance matrix, and KL breaks there (sources have
# disjoint term mass → infinite). JSD is the standard fix:
# JSD(P,Q) = ½KL(P‖M) + ½KL(Q‖M), M = (P+Q)/2 — always finite,
# symmetric, bounded by ln 2. The relational trick: only SHARED terms
# need per-term log ratios (one self-join of the (source, term)
# aggregate on term with source_a < source_b — every pair in one
# shuffle); for a term one side lacks, p/m = 2 exactly, so the whole
# disjoint mass contributes (total − shared)·ln 2 in closed form and
# is never enumerated.
#
# Determinism: the x81 micro-nat contract — per-term
# ln(2·c_a·T_b / (c_a·T_b + c_b·T_a)) quantizes to an integer
# micro-nat (numerator/denominator are exact integer products < 2^53
# cast once to double), weighted sums are exact BIGINT Σ cnt·μ, and
# the final normalization adds two divisions of identical operands.
# ---------------------------------------------------------------------------

_LN2_MICRO_DUCK = "CAST(round(ln(2.0) * 1000000) AS BIGINT)"


@register(
    "x124_source_jsd",
    oracle=f"""
WITH toks AS (
  SELECT source, unnest(string_split({NORM_DUCK.format(col="text")}, ' ')) AS term
  FROM documents
), tf AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks WHERE term <> '' GROUP BY source, term
), tot AS (
  SELECT source, CAST(SUM(cnt) AS BIGINT) AS total FROM tf GROUP BY source
), pair AS (
  SELECT a.source AS sa, b.source AS sb, ta.total AS tota, tb.total AS totb,
         a.cnt AS ca, b.cnt AS cb,
         CAST(round(ln((2.0 * a.cnt * tb.total)
                       / CAST(a.cnt * tb.total + b.cnt * ta.total AS DOUBLE))
                    * 1000000) AS BIGINT) AS mu_a,
         CAST(round(ln((2.0 * b.cnt * ta.total)
                       / CAST(a.cnt * tb.total + b.cnt * ta.total AS DOUBLE))
                    * 1000000) AS BIGINT) AS mu_b
  FROM tf a JOIN tf b ON a.term = b.term AND a.source < b.source
  JOIN tot ta ON ta.source = a.source
  JOIN tot tb ON tb.source = b.source
), agg AS (
  SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS shared_terms,
         MAX(tota) AS tota, MAX(totb) AS totb,
         CAST(SUM(ca) AS BIGINT) AS shared_a,
         CAST(SUM(cb) AS BIGINT) AS shared_b,
         CAST(SUM(ca * mu_a) AS BIGINT) AS wa,
         CAST(SUM(cb * mu_b) AS BIGINT) AS wb
  FROM pair GROUP BY sa, sb
)
SELECT sa AS source_a, sb AS source_b, shared_terms,
       tota - shared_a AS only_a_tokens,
       totb - shared_b AS only_b_tokens,
       CAST(wa + (tota - shared_a) * {_LN2_MICRO_DUCK} AS DOUBLE)
         / (2000000.0 * tota)
       + CAST(wb + (totb - shared_b) * {_LN2_MICRO_DUCK} AS DOUBLE)
         / (2000000.0 * totb) AS jsd_nats
FROM agg
ORDER BY source_a, source_b
""",
    doc="Pairwise Jensen-Shannon divergence between source unigram "
    "distributions: shared terms via one self-join micro-nat sum, "
    "disjoint mass in closed form as (total − shared)·ln 2 — the "
    "symmetric always-finite source distance matrix behind mixture "
    "design, exact BIGINT weighted sums.",
)
def x124_source_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    toks = _tok_index(spark, sf_dir).select(
        "source", F.explode("w").alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("source", "term").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    tot = tf.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("total")
    )
    a, b = tf.alias("a"), tf.alias("b")
    ta = tot.select(
        F.col("source").alias("sa"), F.col("total").alias("tota")
    )
    tb = tot.select(
        F.col("source").alias("sb"), F.col("total").alias("totb")
    )
    den = (
        F.col("ca") * F.col("totb") + F.col("cb") * F.col("tota")
    ).cast("double")
    mu_a = (
        F.round(
            F.log((F.lit(2.0) * F.col("ca") * F.col("totb")) / den) * 1e6
        )
        .cast("bigint")
        .alias("mu_a")
    )
    mu_b = (
        F.round(
            F.log((F.lit(2.0) * F.col("cb") * F.col("tota")) / den) * 1e6
        )
        .cast("bigint")
        .alias("mu_b")
    )
    pair = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .select(
            F.col("a.source").alias("sa"),
            F.col("b.source").alias("sb"),
            F.col("a.cnt").alias("ca"),
            F.col("b.cnt").alias("cb"),
        )
        .join(F.broadcast(ta), "sa")
        .join(F.broadcast(tb), "sb")
        .select("sa", "sb", "tota", "totb", "ca", "cb", mu_a, mu_b)
    )
    agg = pair.groupBy("sa", "sb").agg(
        F.count("*").cast("bigint").alias("shared_terms"),
        F.max("tota").alias("tota"),
        F.max("totb").alias("totb"),
        F.sum("ca").cast("bigint").alias("shared_a"),
        F.sum("cb").cast("bigint").alias("shared_b"),
        F.sum(F.col("ca") * F.col("mu_a")).cast("bigint").alias("wa"),
        F.sum(F.col("cb") * F.col("mu_b")).cast("bigint").alias("wb"),
    )
    ln2 = F.round(F.log(F.lit(2.0)) * 1e6).cast("bigint")
    return agg.select(
        F.col("sa").alias("source_a"),
        F.col("sb").alias("source_b"),
        "shared_terms",
        (F.col("tota") - F.col("shared_a")).alias("only_a_tokens"),
        (F.col("totb") - F.col("shared_b")).alias("only_b_tokens"),
        (
            (F.col("wa") + (F.col("tota") - F.col("shared_a")) * ln2).cast(
                "double"
            )
            / (F.lit(2000000.0) * F.col("tota"))
            + (F.col("wb") + (F.col("totb") - F.col("shared_b")) * ln2).cast(
                "double"
            )
            / (F.lit(2000000.0) * F.col("totb"))
        ).alias("jsd_nats"),
    ).orderBy("source_a", "source_b")


# ---------------------------------------------------------------------------
# F69 — Cohen's kappa (chance-corrected classifier agreement)
#
# x7's confusion matrix shows WHERE the language-ID heuristic errs;
# model-eval dashboards summarize it as one chance-corrected number:
# κ = (p_o − p_e)/(1 − p_e), with p_o the observed agreement and
# p_e = Σ_c row_c·col_c / N² the agreement two independent raters with
# these marginals would reach by luck (Cohen 1960). Everything reduces
# to the class-grain confusion matrix (≤ 5×5 here): diagonal sum,
# row/col marginals, and Σ row·col are exact BIGINTs, p_o/p_e divide
# identical integers, and κ divides the two resulting doubles — the
# same expression tree both engines.
# ---------------------------------------------------------------------------


@register(
    "f69_cohen_kappa",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, string_split({NORM_DUCK.format(col="text")}, ' ') AS w
  FROM documents
), cm AS (
  SELECT lang AS actual, {_X7_PRED_DUCK} AS pred, CAST(COUNT(*) AS BIGINT) AS n
  FROM toks GROUP BY 1, 2
), marg AS (
  SELECT COALESCE(r.actual, c.pred) AS cls,
         COALESCE(r.row_n, 0) AS row_n, COALESCE(c.col_n, 0) AS col_n
  FROM (SELECT actual, CAST(SUM(n) AS BIGINT) AS row_n FROM cm GROUP BY 1) r
  FULL JOIN (SELECT pred, CAST(SUM(n) AS BIGINT) AS col_n FROM cm GROUP BY 1) c
    ON r.actual = c.pred
), s AS (
  SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM cm) AS n_docs,
         (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM cm
           WHERE actual = pred) AS n_agree,
         (SELECT CAST(SUM(row_n * col_n) AS BIGINT) FROM marg) AS pe_num
), r AS (
  SELECT n_docs, n_agree,
         CAST(n_agree AS DOUBLE) / n_docs AS po,
         CAST(pe_num AS DOUBLE) / (n_docs * n_docs) AS pe
  FROM s
)
SELECT n_docs, n_agree,
       ROUND(po, 6) AS p_observed,
       ROUND(pe, 6) AS p_expected,
       ROUND((po - pe) / (1 - pe), 6) AS kappa
FROM r
""",
    doc="Cohen's kappa of the x7 language-ID heuristic vs the labeled "
    "lang column: chance-corrected agreement from the bounded "
    "confusion-matrix grain — exact BIGINT diagonal/marginals, "
    "p_o/p_e as divisions of identical integers, one κ expression "
    "shared by both engines.",
)
def f69_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    cm = (
        _tok_index(spark, sf_dir)
        .groupBy(
            F.col("lang").alias("actual"),
            F.expr(_X7_PRED_SPARK).alias("pred"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    rowm = cm.groupBy("actual").agg(
        F.sum("n").cast("bigint").alias("row_n")
    )
    colm = cm.groupBy("pred").agg(F.sum("n").cast("bigint").alias("col_n"))
    marg = rowm.join(
        colm, rowm.actual == colm.pred, "full_outer"
    ).select(
        F.coalesce(F.col("row_n"), F.lit(0)).alias("row_n"),
        F.coalesce(F.col("col_n"), F.lit(0)).alias("col_n"),
    )
    tot = cm.agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.coalesce(
            F.sum(F.when(F.col("actual") == F.col("pred"), F.col("n"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_agree"),
    )
    pe_num = marg.agg(
        F.sum(F.col("row_n") * F.col("col_n"))
        .cast("bigint")
        .alias("pe_num")
    )
    r = tot.crossJoin(F.broadcast(pe_num)).select(  # 1-row scalars
        "n_docs",
        "n_agree",
        (F.col("n_agree").cast("double") / F.col("n_docs")).alias("po"),
        (
            F.col("pe_num").cast("double")
            / (F.col("n_docs") * F.col("n_docs"))
        ).alias("pe"),
    )
    return r.select(
        "n_docs",
        "n_agree",
        F.round("po", 6).alias("p_observed"),
        F.round("pe", 6).alias("p_expected"),
        F.round(
            (F.col("po") - F.col("pe")) / (F.lit(1) - F.col("pe")), 6
        ).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# X128 — PII detection census (pre-training scrub gate)
#
# Before text ships to a trainer, a scrub pass counts and masks
# PII-shaped spans. Detectors are deliberately simple regexes in the
# Java-regex/RE2 common subset (no lookaround): email, international-
# phone-shaped digit runs, SSN-shaped triples, and 16-digit PAN-shaped
# runs. The census reports per-source document counts, per-detector
# span totals, and the rate of any-PII docs; a scrub PREVIEW md5 of
# the fully-masked text proves both engines mask identically without
# shipping the text anywhere. On this synthetic corpus every count is
# legitimately zero — the audit proving a clean corpus is the same
# query that catches a dirty one (m13's philosophy). B5's salted PHI
# hash (functions/hashing.py) is the complementary op for fields that
# must survive as join keys.
# ---------------------------------------------------------------------------

_X128_PATS = {
    # name -> (duckdb regex, spark regex) — identical strings, listed
    # once; kept in a dict so both dialects are generated from it
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9 ()-]{7,}[0-9]",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "pan": r"[0-9]{16}",
}
_X128_MASK = "[PII]"


def _x128_duck_cols() -> str:
    cols = []
    for name, pat in _X128_PATS.items():
        cols.append(
            f"CAST(SUM(len(regexp_extract_all(text, '{pat}'))) AS BIGINT)"
            f" AS n_{name}"
        )
    any_hit = " OR ".join(
        f"regexp_matches(text, '{p}')" for p in _X128_PATS.values()
    )
    scrub = "text"
    for pat in _X128_PATS.values():
        scrub = f"regexp_replace({scrub}, '{pat}', '{_X128_MASK}', 'g')"
    cols.append(
        f"CAST(SUM(CASE WHEN {any_hit} THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_pii_docs"
    )
    cols.append(f"min(md5({scrub})) AS scrub_digest_min")
    return ",\n       ".join(cols)


@register(
    "x128_pii_census",
    oracle=f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       {_x128_duck_cols()},
       ROUND(CAST(SUM(CASE WHEN {" OR ".join(
           f"regexp_matches(text, '{p}')" for p in _X128_PATS.values()
       )} THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS pii_rate
FROM documents
GROUP BY source
ORDER BY source
""",
    doc="PII scrub census per source: span counts for email/phone/SSN/"
    "PAN-shaped detectors (RE2-subset regexes), any-PII doc rate, and "
    "an md5 digest of the fully-masked text proving both engines "
    "scrub identically — the audit gate before text reaches a "
    "trainer; complements B5's salted PHI hashing.",
)
def x128_pii_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    aggs = [F.count("*").cast("bigint").alias("n_docs")]
    for name, pat in _X128_PATS.items():
        aggs.append(
            F.sum(
                F.size(
                    F.regexp_extract_all(
                        F.col("text"), F.lit(pat), F.lit(0)
                    )
                )
            )
            .cast("bigint")
            .alias(f"n_{name}")
        )
    any_hit = None
    for pat in _X128_PATS.values():
        hit = F.col("text").rlike(pat)
        any_hit = hit if any_hit is None else (any_hit | hit)
    scrub = F.col("text")
    for pat in _X128_PATS.values():
        scrub = F.regexp_replace(scrub, pat, _X128_MASK)
    aggs.append(
        F.sum(F.when(any_hit, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pii_docs")
    )
    aggs.append(F.min(F.md5(scrub)).alias("scrub_digest_min"))
    aggs.append(
        F.round(
            F.sum(F.when(any_hit, 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("pii_rate")
    )
    return d.groupBy("source").agg(*aggs).orderBy("source")


# ---------------------------------------------------------------------------
# X129 — feature-hashing collision audit
#
# The hashing trick (Weinberger et al. 2009) buckets an unbounded
# vocabulary into m dims with no dictionary; its one cost is
# collisions. For m ∈ {256, 1024, 4096}: distinct terms, occupied
# buckets, colliding terms (terms minus buckets), and the collision
# rate — beside the birthday-problem expectation
# E[occupied] = m·(1 − (1−1/m)^V) frozen per arm as a repr'd Python
# literal factor... no: V is data-dependent, so the expectation is
# computed as exp(V·ln(1−1/m)) with the ln(1−1/m) factor per arm
# frozen as a repr'd literal (libm-safe) and ONE exp over identical
# doubles. Buckets come from the md5 fold mod m — engine-neutral,
# and the same bucketing a downstream hashed-BoW model (x97) uses.
# Scale shape: one distinct-term aggregate, a 3-arm broadcast, one
# (arm) aggregate over (term, bucket) pairs.
# ---------------------------------------------------------------------------

import math as _m

_X129_DIMS = (256, 1024, 4096)
_X129_LN = {m: repr(_m.log(1.0 - 1.0 / m)) for m in _X129_DIMS}


def _x129_duck() -> str:
    from calaveras_uniteus_etl_spark.functions.hashing import (
        duckdb_md5_long_sql,
    )

    h = duckdb_md5_long_sql("term")
    arms = "\nUNION ALL\n".join(
        f"SELECT {m} AS m, {_X129_LN[m]} AS ln1m" for m in _X129_DIMS
    )
    return f"""
WITH terms AS (
  SELECT DISTINCT unnest(string_split({NORM_DUCK.format(col="text")}, ' '))
    AS term
  FROM documents
), vocab AS (
  SELECT term, {h} AS h FROM terms WHERE term <> ''
), arms AS ({arms}),
hit AS (
  SELECT a.m, a.ln1m, v.h % a.m AS bucket
  FROM vocab v CROSS JOIN arms a
), s AS (
  SELECT m, ln1m, CAST(COUNT(*) AS BIGINT) AS v_terms,
         CAST(COUNT(DISTINCT bucket) AS BIGINT) AS occupied
  FROM hit GROUP BY m, ln1m
)
SELECT CAST(m AS BIGINT) AS m, v_terms, occupied,
       v_terms - occupied AS colliding,
       ROUND(CAST(v_terms - occupied AS DOUBLE) / v_terms, 6)
         AS collision_rate,
       ROUND(m * (1.0 - exp(v_terms * ln1m)), 4) AS expected_occupied
FROM s
ORDER BY m
""",


@register(
    "x129_feature_hash_collisions",
    oracle=_x129_duck()[0],
    doc="Feature-hashing collision audit at m ∈ {256, 1024, 4096}: "
    "vocabulary size, occupied buckets and collision rate under the "
    "engine-neutral md5-fold bucketing, beside the birthday "
    "expectation m·(1−exp(V·ln(1−1/m))) with the per-arm ln factor "
    "frozen as a repr'd literal — prices the hashing trick before a "
    "hashed-BoW model (x97) commits to a width.",
)
def x129_feature_hash_collisions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from calaveras_uniteus_etl_spark.functions.hashing import md5_long

    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    terms = (
        _tok_index(spark, sf_dir)
        .select(F.explode("w").alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    vocab = terms.select(md5_long(F.col("term")).alias("h"))
    arms = spark.range(len(_X129_DIMS)).select(
        F.element_at(
            F.array(*[F.lit(m) for m in _X129_DIMS]),
            F.col("id").cast("int") + 1,
        ).alias("m"),
        F.element_at(
            F.array(*[F.expr(_X129_LN[m]) for m in _X129_DIMS]),
            F.col("id").cast("int") + 1,
        ).alias("ln1m"),
    )
    hit = vocab.crossJoin(F.broadcast(arms)).select(
        "m", "ln1m", (F.col("h") % F.col("m")).alias("bucket")
    )
    s = hit.groupBy("m", "ln1m").agg(
        F.count("*").cast("bigint").alias("v_terms"),
        F.countDistinct("bucket").cast("bigint").alias("occupied"),
    )
    return s.select(
        F.col("m").cast("bigint").alias("m"),
        "v_terms",
        "occupied",
        (F.col("v_terms") - F.col("occupied")).alias("colliding"),
        F.round(
            (F.col("v_terms") - F.col("occupied")).cast("double")
            / F.col("v_terms"),
            6,
        ).alias("collision_rate"),
        F.round(
            F.col("m")
            * (F.lit(1.0) - F.exp(F.col("v_terms") * F.col("ln1m"))),
            4,
        ).alias("expected_occupied"),
    ).orderBy("m")


# ---------------------------------------------------------------------------
# X130 — source-discriminative terms (log-odds with a Dirichlet prior)
#
# TF-IDF (x16) finds terms rare ACROSS DOCS; mixture design wants the
# terms that DISTINGUISH A SOURCE from the rest of the corpus, and the
# standard tool is Monroe/Colaresi/Quinn's log-odds-ratio with an
# informative Dirichlet prior ("Fightin' Words", 2008): smoothing by
# α_w = α0·p_w (corpus-proportional) keeps rare terms from dominating,
# and the z-score δ/√(1/(y_iw+α_w) + 1/(y_jw+α_w)) ranks by evidence,
# not just effect size. Counts are exact BIGINTs from two hash
# aggregates; α_w, both log-odds and the variance evaluate as ONE
# shared expression over identical doubles (products < 2^53 before
# any division), 6dp-rounded; the per-source top-3 cut is a window
# over the source-partitioned term relation with a (z, term) total
# order. i-side zero counts are real zeros via the rest-of-corpus
# complement (y_rest = c_w − y_iw), never dropped rows.
# ---------------------------------------------------------------------------

_X130_ALPHA0 = 100.0  # prior mass, corpus-proportionally allocated
_X130_TOPK = 3


@register(
    "x130_log_odds_terms",
    oracle=f"""
WITH toks AS (
  SELECT source, unnest(string_split({NORM_DUCK.format(col="text")}, ' '))
    AS term
  FROM documents
), tf AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS y
  FROM toks WHERE term <> '' GROUP BY 1, 2
), corpus AS (
  SELECT term, CAST(SUM(y) AS BIGINT) AS c FROM tf GROUP BY term
), grand AS (
  SELECT CAST(SUM(c) AS BIGINT) AS g FROM corpus
), tot AS (
  SELECT source, CAST(SUM(y) AS BIGINT) AS n FROM tf GROUP BY source
), scored AS (
  SELECT tf.source, tf.term, tf.y,
         corpus.c - tf.y AS y_rest, tot.n, grand.g - tot.n AS n_rest,
         {_X130_ALPHA0!r} * corpus.c / grand.g AS aw,
         {_X130_ALPHA0!r} AS a0
  FROM tf
  JOIN corpus USING (term) JOIN tot USING (source) CROSS JOIN grand
), z AS (
  SELECT source, term, y,
         ROUND(
           (ln((y + aw) / (n + a0 - y - aw))
            - ln((y_rest + aw) / (n_rest + a0 - y_rest - aw)))
           / sqrt(1.0 / (y + aw) + 1.0 / (y_rest + aw)), 6) AS z_score
  FROM scored
)
SELECT source, term, y AS term_count, z_score FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY z_score DESC, term) AS rn
  FROM z
) WHERE rn <= {_X130_TOPK}
ORDER BY source, z_score DESC, term
""",
    doc="Source-discriminative terms by Monroe et al.'s log-odds ratio "
    f"with an informative Dirichlet prior (α0 = {_X130_ALPHA0:g}, "
    "corpus-proportional α_w), z-scored and cut to the top-3 per "
    "source under a (z, term) total order — the 'what makes this "
    "source different' signal beside x16's TF-IDF and x81's KL.",
)
def x130_log_odds_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    toks = _tok_index(spark, sf_dir).select(
        "source", F.explode("w").alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("source", "term").agg(
        F.count("*").cast("bigint").alias("y")
    )
    corpus = tf.groupBy("term").agg(F.sum("y").cast("bigint").alias("c"))
    grand = corpus.agg(F.sum("c").cast("bigint").alias("g"))
    tot = tf.groupBy("source").agg(F.sum("y").cast("bigint").alias("n"))
    a0 = F.lit(_X130_ALPHA0)
    scored = (
        tf.join(F.broadcast(corpus), "term")
        .join(F.broadcast(tot), "source")
        .crossJoin(F.broadcast(grand))  # 1-row scalar
        .select(
            "source",
            "term",
            "y",
            (F.col("c") - F.col("y")).alias("y_rest"),
            "n",
            (F.col("g") - F.col("n")).alias("n_rest"),
            (a0 * F.col("c") / F.col("g")).alias("aw"),
        )
    )
    delta = F.log(
        (F.col("y") + F.col("aw"))
        / (F.col("n") + a0 - F.col("y") - F.col("aw"))
    ) - F.log(
        (F.col("y_rest") + F.col("aw"))
        / (F.col("n_rest") + a0 - F.col("y_rest") - F.col("aw"))
    )
    var = F.lit(1.0) / (F.col("y") + F.col("aw")) + F.lit(1.0) / (
        F.col("y_rest") + F.col("aw")
    )
    z = scored.select(
        "source",
        "term",
        "y",
        F.round(delta / F.sqrt(var), 6).alias("z_score"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("z_score"), "term")
    return (
        z.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _X130_TOPK)
        .select(
            "source",
            "term",
            F.col("y").alias("term_count"),
            "z_score",
        )
        .orderBy("source", F.desc("z_score"), "term")
    )


# ---------------------------------------------------------------------------
# X131 — temperature-balanced language mixture (exact integer quotas)
#
# Multilingual corpora are sampled with temperature: raw shares p_l
# flattened to p_l^τ (τ<1 boosts low-resource languages — the
# XLM-R/mT5 recipe). τ = 0.5 is the one exponent with an exact
# engine-neutral transform (IEEE sqrt, no libm pow/exp): weights are
# micro-quantized √n_l BIGINTs, so the normalizer is an exact integer
# sum, and a 10 000-doc budget allocates by LARGEST REMAINDER on pure
# integer arithmetic — base = B·w div W, then the B − Σbase leftover
# docs go to the largest (B·w mod W, lang) remainders — quotas sum to
# B exactly, bit-identically, on any engine or partitioning. The τ=1
# (proportional) arm rides along for comparison.
# Scale shape: one lang-grain aggregate; everything after runs on the
# bounded language dimension.
# ---------------------------------------------------------------------------

_X131_BUDGET = 10_000


@register(
    "x131_temperature_mixture",
    oracle=f"""
WITH langs AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
), w AS (
  SELECT lang, n,
         CAST(round(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS w05,
         n AS w10
  FROM langs
), tot AS (
  SELECT CAST(SUM(w05) AS BIGINT) AS s05, CAST(SUM(w10) AS BIGINT) AS s10,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM w
), arms AS (
  SELECT w.lang, w.n, t.tau,
         CASE WHEN t.tau = 5 THEN w.w05 ELSE w.w10 END AS wt,
         CASE WHEN t.tau = 5 THEN tot.s05 ELSE tot.s10 END AS s
  FROM w CROSS JOIN (SELECT unnest([5, 10]) AS tau) t CROSS JOIN tot
), alloc AS (
  SELECT lang, n, tau, wt, s,
         {_X131_BUDGET} * wt // s AS base,
         {_X131_BUDGET} * wt % s AS rem,
         {_X131_BUDGET}
           - SUM({_X131_BUDGET} * wt // s) OVER (PARTITION BY tau)
           AS leftover,
         ROW_NUMBER() OVER (PARTITION BY tau
                            ORDER BY {_X131_BUDGET} * wt % s DESC, lang)
           AS rem_rank
  FROM arms
)
SELECT lang, CAST(tau AS INT) AS tau_x10, n AS n_docs,
       CAST(wt AS BIGINT) AS weight,
       CAST(base + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS quota
FROM alloc
ORDER BY tau_x10, lang
""",
    doc="Temperature-balanced language mixture: τ=0.5 weights as "
    "micro-quantized IEEE √n (no libm pow), τ=1 proportional arm, and "
    f"a {_X131_BUDGET}-doc budget allocated by largest remainder on "
    "pure integer arithmetic — quotas sum to the budget exactly on "
    "any engine; the multilingual sampling recipe at lang grain.",
)
def x131_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    langs = d.groupBy("lang").agg(F.count("*").cast("bigint").alias("n"))
    w = langs.select(
        "lang",
        "n",
        F.round(F.sqrt(F.col("n").cast("double")) * 1e6)
        .cast("bigint")
        .alias("w05"),
        F.col("n").alias("w10"),
    )
    tot = w.agg(
        F.sum("w05").cast("bigint").alias("s05"),
        F.sum("w10").cast("bigint").alias("s10"),
    )
    taus = spark.range(2).select(
        F.when(F.col("id") == 0, 5).otherwise(10).alias("tau")
    )
    arms = (
        w.crossJoin(F.broadcast(taus))
        .crossJoin(F.broadcast(tot))  # 1-row scalar
        .select(
            "lang",
            "n",
            "tau",
            F.when(F.col("tau") == 5, F.col("w05"))
            .otherwise(F.col("w10"))
            .alias("wt"),
            F.when(F.col("tau") == 5, F.col("s05"))
            .otherwise(F.col("s10"))
            .alias("s"),
        )
    )
    b = F.lit(_X131_BUDGET)
    base = F.expr(f"{_X131_BUDGET} * wt div s")
    rem = b * F.col("wt") % F.col("s")
    # language-grain windows: bounded by the lang dimension
    w_tau = Window.partitionBy("tau")
    w_rank = Window.partitionBy("tau").orderBy(F.desc(rem), "lang")
    alloc = arms.select(
        "lang",
        "n",
        "tau",
        "wt",
        base.alias("base"),
        (b - F.sum(base).over(w_tau)).alias("leftover"),
        F.row_number().over(w_rank).alias("rem_rank"),
    )
    return alloc.select(
        "lang",
        F.col("tau").cast("int").alias("tau_x10"),
        F.col("n").alias("n_docs"),
        F.col("wt").cast("bigint").alias("weight"),
        (
            F.col("base")
            + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("quota"),
    ).orderBy("tau_x10", "lang")


# ---------------------------------------------------------------------------
# X132 — per-source data card (datasheet summary)
#
# Every released corpus ships a datasheet ("Datasheets for Datasets",
# Gebru et al. 2021); this emits its quantitative core in one query —
# per source: volume (docs, tokens), exact-dup rate (distinct
# normalization fingerprints, x10's md5 contract), language mix
# (count + Shannon entropy in nats under the x81 micro-nat contract),
# and Gopher-gate retention (x70's integer rule battery, same
# fragments). Composition, not new math: one doc-grain pass feeds a
# source-grain aggregate; the lang-entropy sub-aggregate is a bounded
# (source, lang) relation broadcast back.
# ---------------------------------------------------------------------------


@register(
    "x132_source_data_card",
    oracle=f"""
WITH m AS (
  SELECT source, norm, w,
         len(w) AS n,
         length(norm) - (len(w) - 1) AS chars,
         len(list_filter(w, t -> t IN ({_X70_STOP_ALL}))) AS stop,
         len(list_filter(w, t -> regexp_matches(t, '[a-z]'))) AS alpha,
         length(norm) - length(regexp_replace(norm, '[0-9]', '', 'g'))
           AS digits,
         length(norm) AS normlen
  FROM (
    SELECT source, {NORM_DUCK.format(col="text")} AS norm,
           string_split({NORM_DUCK.format(col="text")}, ' ') AS w
    FROM documents
  )
), base AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(w)) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT md5(norm)) AS BIGINT) AS uniq_fp,
         CAST(SUM(CASE WHEN NOT ({_X70_FAIL_ANY}) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_pass
  FROM m GROUP BY source
), lc AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
), lt AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS nd,
         CAST(COUNT(*) AS BIGINT) AS n_langs
  FROM lc GROUP BY source
), ent AS (
  SELECT lc.source,
         CAST(SUM(c * CAST(round(ln(CAST(c AS DOUBLE) / lt.nd) * 1000000)
                           AS BIGINT)) AS BIGINT) AS emicro
  FROM lc JOIN lt USING (source) GROUP BY lc.source
)
SELECT base.source, n_docs, n_tokens, uniq_fp,
       ROUND(1.0 - CAST(uniq_fp AS DOUBLE) / n_docs, 6) AS dup_rate,
       lt.n_langs,
       ROUND(-CAST(ent.emicro AS DOUBLE) / (1000000.0 * n_docs), 6)
         AS lang_entropy_nats,
       ROUND(CAST(n_pass AS DOUBLE) / n_docs, 6) AS gopher_retention
FROM base JOIN lt ON lt.source = base.source
JOIN ent ON ent.source = base.source
ORDER BY base.source
""",
    doc="Per-source data card (the datasheet's quantitative core): "
    "docs, tokens, exact-dup rate from x10's md5 fingerprints, "
    "language count + Shannon entropy (x81 micro-nat contract), and "
    "x70 Gopher retention — one doc-grain pass plus a bounded "
    "(source, lang) sub-aggregate.",
)
def x132_source_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    norm_sql = NORM_SPARK.format(col="text")
    m = d.select(
        "source",
        F.expr(norm_sql).alias("norm"),
        F.expr(f"split({norm_sql}, ' ')").alias("w"),
    ).select(
        "source",
        "norm",
        "w",
        F.expr("size(w)").alias("n"),
        F.expr("length(norm) - (size(w) - 1)").alias("chars"),
        F.expr(f"size(filter(w, t -> t in ({_X70_STOP_ALL})))").alias(
            "stop"
        ),
        F.expr("size(filter(w, t -> t rlike '[a-z]'))").alias("alpha"),
        F.expr(
            "length(norm) - length(regexp_replace(norm, '[0-9]', ''))"
        ).alias("digits"),
        F.length("norm").alias("normlen"),
    )
    base = m.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.expr("size(w)")).cast("bigint").alias("n_tokens"),
        F.countDistinct(F.md5("norm")).cast("bigint").alias("uniq_fp"),
        F.sum(F.when(~F.expr(_X70_FAIL_ANY), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass"),
    )
    lc = d.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("c")
    )
    lt = lc.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("nd"),
        F.count("*").cast("bigint").alias("n_langs"),
    )
    ent = (
        lc.join(F.broadcast(lt), "source")
        .select(
            "source",
            (
                F.col("c")
                * F.round(
                    F.log(F.col("c").cast("double") / F.col("nd")) * 1e6
                ).cast("bigint")
            ).alias("term"),
        )
        .groupBy("source")
        .agg(F.sum("term").cast("bigint").alias("emicro"))
    )
    return (
        base.join(F.broadcast(lt.select("source", "n_langs")), "source")
        .join(F.broadcast(ent), "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "uniq_fp",
            F.round(
                F.lit(1.0) - F.col("uniq_fp").cast("double") / F.col("n_docs"),
                6,
            ).alias("dup_rate"),
            "n_langs",
            F.round(
                -F.col("emicro").cast("double")
                / (F.lit(1000000.0) * F.col("n_docs")),
                6,
            ).alias("lang_entropy_nats"),
            F.round(
                F.col("n_pass").cast("double") / F.col("n_docs"), 6
            ).alias("gopher_retention"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X133 — cross-source duplicate leakage (syndication census)
#
# x132's dup_rate is WITHIN-source; the curation risk that actually
# skews mixtures is CROSS-source duplication (syndicated/mirrored
# content): a doc counted once per source inflates every source's
# apparent contribution. Fingerprints (x10's md5 contract) reduce
# each doc to a digest; digests appearing in ≥ 2 sources produce the
# source-pair census — pairs shuffle digests only (never text), the
# per-digest source list is bounded by the source dimension, and the
# pair expansion is the bounded |sources|² worst case. Reports per
# source pair: shared distinct fingerprints and involved doc counts.
# ---------------------------------------------------------------------------


@register(
    "x133_cross_source_dups",
    oracle=f"""
WITH fp AS (
  SELECT source,
         md5({NORM_DUCK.format(col="text")}) AS fp,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1, 2
), grid AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM (SELECT DISTINCT source FROM documents) a
  JOIN (SELECT DISTINCT source FROM documents) b ON a.source < b.source
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.n_docs AS docs_a, b.n_docs AS docs_b
  FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
), hits AS (
  SELECT source_a, source_b,
         CAST(COUNT(*) AS BIGINT) AS shared_fingerprints,
         CAST(SUM(docs_a) AS BIGINT) AS docs_in_a,
         CAST(SUM(docs_b) AS BIGINT) AS docs_in_b
  FROM pairs GROUP BY source_a, source_b
)
SELECT g.source_a, g.source_b,
       CAST(COALESCE(h.shared_fingerprints, 0) AS BIGINT)
         AS shared_fingerprints,
       CAST(COALESCE(h.docs_in_a, 0) AS BIGINT) AS docs_in_a,
       CAST(COALESCE(h.docs_in_b, 0) AS BIGINT) AS docs_in_b
FROM grid g LEFT JOIN hits h
  ON h.source_a = g.source_a AND h.source_b = g.source_b
ORDER BY g.source_a, g.source_b
""",
    doc="Cross-source duplicate census: normalization fingerprints "
    "(x10 md5 contract) self-joined across sources — digests shuffle, "
    "text never does — reporting shared distinct fingerprints and "
    "involved doc counts on the FULL bounded pair grid (zeros kept: the "
    "all-clear is the audit), beside x132's within-source dup rate.",
)
def x133_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    fp = d.groupBy(
        "source",
        F.md5(
            F.expr(NORM_SPARK.format(col="text"))
        ).alias("fp"),
    ).agg(F.count("*").cast("bigint").alias("n_docs"))
    srcs = d.select("source").distinct()
    ga, gb = srcs.alias("ga"), srcs.alias("gb")
    grid = ga.join(
        F.broadcast(gb), F.col("ga.source") < F.col("gb.source")
    ).select(
        F.col("ga.source").alias("source_a"),
        F.col("gb.source").alias("source_b"),
    )
    a, b = fp.alias("a"), fp.alias("b")
    pairs = a.join(
        b,
        (F.col("a.fp") == F.col("b.fp"))
        & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.col("a.n_docs").alias("docs_a"),
        F.col("b.n_docs").alias("docs_b"),
    )
    hits = pairs.groupBy("source_a", "source_b").agg(
        F.count("*").cast("bigint").alias("shared_fingerprints"),
        F.sum("docs_a").cast("bigint").alias("docs_in_a"),
        F.sum("docs_b").cast("bigint").alias("docs_in_b"),
    )
    return (
        grid.join(F.broadcast(hits), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.coalesce("shared_fingerprints", F.lit(0))
            .cast("bigint")
            .alias("shared_fingerprints"),
            F.coalesce("docs_in_a", F.lit(0)).cast("bigint").alias("docs_in_a"),
            F.coalesce("docs_in_b", F.lit(0)).cast("bigint").alias("docs_in_b"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# X135 — context-window truncation loss (limit-arm sweep)
#
# x109 prices PADDING waste (docs shorter than the window); the dual
# cost is TRUNCATION — tokens cut from docs LONGER than the window.
# For L ∈ {64, 128, 256, 512} whitespace tokens: docs affected, total
# tokens lost Σ max(0, n − L), the loss share of the corpus, and the
# retained share — the table that picks a context length before
# packing (x49) commits to one. Token counts are x9's whitespace
# contract; the limit arms are a broadcast relation over one per-doc
# token-count aggregate, all integer until the final shares.
# ---------------------------------------------------------------------------

_X135_LIMITS = (64, 128, 256, 512)


@register(
    "x135_truncation_loss",
    oracle=f"""
WITH toks AS (
  SELECT CASE WHEN trim(text) = '' THEN 0
         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n
  FROM documents
), arms AS (
  SELECT unnest([{", ".join(str(x) for x in _X135_LIMITS)}]) AS lim
), s AS (
  SELECT lim, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN n > lim THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_truncated,
         CAST(SUM(CASE WHEN n > lim THEN n - lim ELSE 0 END) AS BIGINT)
           AS tokens_lost
  FROM toks CROSS JOIN arms GROUP BY lim
)
SELECT CAST(lim AS BIGINT) AS lim, n_docs, docs_truncated, tokens_lost,
       ROUND(CAST(tokens_lost AS DOUBLE) / n_tokens, 6) AS loss_share,
       ROUND(1.0 - CAST(tokens_lost AS DOUBLE) / n_tokens, 6)
         AS retained_share
FROM s
ORDER BY lim
""",
    doc="Context-window truncation loss at limits 64/128/256/512 "
    "whitespace tokens: docs affected, tokens cut, loss and retained "
    "shares — the dual of x109's padding waste; integer arithmetic "
    "until the final shares, one per-doc aggregate with broadcast "
    "limit arms.",
)
def x135_truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    toks = d.select(
        F.when(t == "", 0)
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("long")
        .alias("n")
    )
    arms = spark.range(len(_X135_LIMITS)).select(
        F.element_at(
            F.array(*[F.lit(x) for x in _X135_LIMITS]),
            F.col("id").cast("int") + 1,
        ).alias("lim")
    )
    s = (
        toks.crossJoin(F.broadcast(arms))
        .groupBy("lim")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("n") > F.col("lim"), 1).otherwise(0))
            .cast("bigint")
            .alias("docs_truncated"),
            F.sum(
                F.when(
                    F.col("n") > F.col("lim"), F.col("n") - F.col("lim")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("tokens_lost"),
        )
    )
    return s.select(
        F.col("lim").cast("bigint").alias("lim"),
        "n_docs",
        "docs_truncated",
        "tokens_lost",
        F.round(
            F.col("tokens_lost").cast("double") / F.col("n_tokens"), 6
        ).alias("loss_share"),
        F.round(
            F.lit(1.0)
            - F.col("tokens_lost").cast("double") / F.col("n_tokens"),
            6,
        ).alias("retained_share"),
    ).orderBy("lim")


# ---------------------------------------------------------------------------
# F79 — McNemar's test (paired classifier comparison)
#
# f69 scores ONE classifier against labels; shipping a change needs
# the PAIRED question: does the full 8-stopword language-ID beat a
# degraded 4-stopword variant on the same documents? Accuracy deltas
# mislead on paired data — McNemar's test uses only the DISCORDANT
# cells: b = full right / degraded wrong, c = full wrong / degraded
# right, χ² = (b−c)²/(b+c) (the continuity-corrected form
# (|b−c|−1)²/(b+c) rides along). Both predictors evaluate in one
# projection over the shared token array; every cell is an exact
# BIGINT; the statistics divide identical integers.
# ---------------------------------------------------------------------------


def _x7_pred_variant(n_stop: int) -> tuple[str, str]:
    """(spark, duck) CASE predictors using the first n_stop stopwords."""

    def hits_spark(lang: str) -> str:
        lits = ", ".join(f"'{t}'" for t in _STOPWORDS[lang][:n_stop])
        return f"size(filter(w, t -> t in ({lits})))"

    def hits_duck(lang: str) -> str:
        lits = ", ".join(f"'{t}'" for t in _STOPWORDS[lang][:n_stop])
        return f"len(list_filter(w, t -> t IN ({lits})))"

    return (
        _pred_case({lang: hits_spark(lang) for lang in _LANG_ORDER}),
        _pred_case({lang: hits_duck(lang) for lang in _LANG_ORDER}),
    )


_F79_SPARK4, _F79_DUCK4 = _x7_pred_variant(4)


@register(
    "f79_mcnemar_test",
    oracle=f"""
WITH preds AS (
  SELECT lang,
         ({_X7_PRED_DUCK}) AS p_full,
         ({_F79_DUCK4}) AS p_half
  FROM (
    SELECT lang, string_split({NORM_DUCK.format(col="text")}, ' ') AS w
    FROM documents
  )
), cells AS (
  SELECT CAST(SUM(CASE WHEN p_full = lang AND p_half = lang
                  THEN 1 ELSE 0 END) AS BIGINT) AS both_right,
         CAST(SUM(CASE WHEN p_full = lang AND p_half <> lang
                  THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN p_full <> lang AND p_half = lang
                  THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN p_full <> lang AND p_half <> lang
                  THEN 1 ELSE 0 END) AS BIGINT) AS both_wrong
  FROM preds
)
SELECT both_right, b AS full_only_right, c AS half_only_right, both_wrong,
       ROUND(CAST((b - c) * (b - c) AS DOUBLE) / NULLIF(b + c, 0), 6)
         AS mcnemar_chi2,
       ROUND(CAST((ABS(b - c) - 1) * (ABS(b - c) - 1) AS DOUBLE)
             / NULLIF(b + c, 0), 6) AS mcnemar_chi2_cc
FROM cells
""",
    doc="McNemar's paired test: the full 8-stopword language-ID vs a "
    "degraded 4-stopword variant on the same docs — discordant cells "
    "b/c as exact BIGINTs, χ² = (b−c)²/(b+c) plus the continuity-"
    "corrected form; the paired-classifier member of the eval suite "
    "beside f69's κ.",
)
def f79_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    preds = _tok_index(spark, sf_dir).select(
        "lang",
        F.expr(_X7_PRED_SPARK).alias("p_full"),
        F.expr(_F79_SPARK4).alias("p_half"),
    )
    cells = preds.agg(
        F.sum(
            F.when(
                (F.col("p_full") == F.col("lang"))
                & (F.col("p_half") == F.col("lang")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("both_right"),
        F.sum(
            F.when(
                (F.col("p_full") == F.col("lang"))
                & (F.col("p_half") != F.col("lang")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("b"),
        F.sum(
            F.when(
                (F.col("p_full") != F.col("lang"))
                & (F.col("p_half") == F.col("lang")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("c"),
        F.sum(
            F.when(
                (F.col("p_full") != F.col("lang"))
                & (F.col("p_half") != F.col("lang")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("both_wrong"),
    )
    bc = F.col("b") + F.col("c")
    return cells.select(
        "both_right",
        F.col("b").alias("full_only_right"),
        F.col("c").alias("half_only_right"),
        "both_wrong",
        F.round(
            ((F.col("b") - F.col("c")) * (F.col("b") - F.col("c")))
            .cast("double")
            / F.nullif(bc, F.lit(0)),
            6,
        ).alias("mcnemar_chi2"),
        F.round(
            (
                (F.abs(F.col("b") - F.col("c")) - 1)
                * (F.abs(F.col("b") - F.col("c")) - 1)
            ).cast("double")
            / F.nullif(bc, F.lit(0)),
            6,
        ).alias("mcnemar_chi2_cc"),
    )


# ---------------------------------------------------------------------------
# X138 — quality-rule ablation (marginal and unique kills per rule)
#
# x70 reports how many docs each rule fails; TUNING the gate needs the
# ablation view: how many docs fail ONLY this rule (its unique kills —
# what relaxing it would reclaim), and what retention becomes with the
# rule removed. One pass computes all rule booleans per doc; the
# per-rule rollup counts fails, unique kills, pass-all retention, and
# leave-one-rule-out retention — all exact integers over the x70
# fragments, no second scan.
# ---------------------------------------------------------------------------


def _x138_arms_duck() -> str:
    arms = []
    for rule in _X70_FLAGS:
        others = " OR ".join(p for r2, p in _X70_FLAGS.items() if r2 != rule)
        arms.append(
            f"SELECT '{rule}' AS rule, "
            f"CAST(SUM(CASE WHEN {_X70_FLAGS[rule]} THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS n_fail, "
            f"CAST(SUM(CASE WHEN ({_X70_FLAGS[rule]}) AND NOT ({others}) "
            f"THEN 1 ELSE 0 END) AS BIGINT) AS unique_kills, "
            f"CAST(SUM(CASE WHEN NOT ({others}) THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS pass_without_rule, "
            f"CAST(SUM(CASE WHEN NOT ({_X70_FAIL_ANY}) THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS pass_all, "
            f"CAST(COUNT(*) AS BIGINT) AS n_docs FROM m"
        )
    return "\nUNION ALL\n".join(arms)


@register(
    "x138_rule_ablation",
    oracle=f"""
WITH m AS (
  SELECT len(w) AS n,
         length(norm) - (len(w) - 1) AS chars,
         len(list_filter(w, t -> t IN ({_X70_STOP_ALL}))) AS stop,
         len(list_filter(w, t -> regexp_matches(t, '[a-z]'))) AS alpha,
         length(norm) - length(regexp_replace(norm, '[0-9]', '', 'g'))
           AS digits,
         length(norm) AS normlen
  FROM (
    SELECT {NORM_DUCK.format(col="text")} AS norm,
           string_split({NORM_DUCK.format(col="text")}, ' ') AS w
    FROM documents
  )
)
SELECT rule, n_fail, unique_kills,
       ROUND(CAST(pass_all AS DOUBLE) / n_docs, 6) AS retention,
       ROUND(CAST(pass_without_rule AS DOUBLE) / n_docs, 6)
         AS retention_without_rule,
       ROUND(CAST(pass_without_rule - pass_all AS DOUBLE) / n_docs, 6)
         AS reclaim_share
FROM ({_x138_arms_duck()})
ORDER BY rule
""",
    doc="Gopher-gate ablation: per rule, total fails, UNIQUE kills "
    "(docs no other rule catches), and leave-one-rule-out retention "
    "with the reclaim share — the tuning view over x70's battery, one "
    "scan, exact integers.",
)
def x138_rule_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    norm_sql = NORM_SPARK.format(col="text")
    m = d.select(
        F.expr(norm_sql).alias("norm"),
        F.expr(f"split({norm_sql}, ' ')").alias("w"),
    ).select(
        F.expr("size(w)").alias("n"),
        F.expr("length(norm) - (size(w) - 1)").alias("chars"),
        F.expr(f"size(filter(w, t -> t in ({_X70_STOP_ALL})))").alias(
            "stop"
        ),
        F.expr("size(filter(w, t -> t rlike '[a-z]'))").alias("alpha"),
        F.expr(
            "length(norm) - length(regexp_replace(norm, '[0-9]', ''))"
        ).alias("digits"),
        F.length("norm").alias("normlen"),
    )
    parts = []
    for rule, pred in _X70_FLAGS.items():
        others = " OR ".join(
            p for r2, p in _X70_FLAGS.items() if r2 != rule
        )
        agg = m.agg(
            F.lit(rule).alias("rule"),
            F.sum(F.when(F.expr(pred), 1).otherwise(0))
            .cast("bigint")
            .alias("n_fail"),
            F.sum(
                F.when(F.expr(pred) & ~F.expr(others), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("unique_kills"),
            F.sum(F.when(~F.expr(others), 1).otherwise(0))
            .cast("bigint")
            .alias("pass_without_rule"),
            F.sum(F.when(~F.expr(_X70_FAIL_ANY), 1).otherwise(0))
            .cast("bigint")
            .alias("pass_all"),
            F.count("*").cast("bigint").alias("n_docs"),
        )
        parts.append(agg)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.select(
        "rule",
        "n_fail",
        "unique_kills",
        F.round(
            F.col("pass_all").cast("double") / F.col("n_docs"), 6
        ).alias("retention"),
        F.round(
            F.col("pass_without_rule").cast("double") / F.col("n_docs"),
            6,
        ).alias("retention_without_rule"),
        F.round(
            (F.col("pass_without_rule") - F.col("pass_all")).cast("double")
            / F.col("n_docs"),
            6,
        ).alias("reclaim_share"),
    ).orderBy("rule")


# ---------------------------------------------------------------------------
# X139 — prefix-duplicate census (boilerplate-head detector)
#
# Web-scale corpora carry families of documents sharing a long common
# HEAD (templated boilerplate, mirrored landing pages) that full-doc
# fingerprints (x23) and MinHash (x2) under-weight because the tails
# differ. The census groups on md5 of the first 32 chars — one hash-
# aggregate on a fixed-width key, no text shuffled — and reports the
# per-source duplicate-prefix mass, the triage number that decides
# whether a head-truncation pass belongs in the dedup pipeline.
# ---------------------------------------------------------------------------


@register(
    "x139_prefix_dup_census",
    oracle="""
WITH groups AS (
  SELECT source, md5(substr(text, 1, 32)) AS pfx,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY source, pfx
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_prefixes,
       CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_prefixes,
       CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
         AS docs_in_dup_groups,
       CAST(MAX(c) AS BIGINT) AS max_group,
       ROUND(CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS DOUBLE)
             / SUM(c), 6) AS dup_share
FROM groups GROUP BY source ORDER BY source
""",
    doc="Per-source census of documents sharing a 32-char head "
    "(md5-keyed hash aggregate): duplicate-prefix group counts, doc "
    "mass, and share — the boilerplate-head triage beside x23/x2.",
)
def x139_prefix_dup_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    groups = d.groupBy(
        "source", F.md5(F.substring("text", 1, 32)).alias("pfx")
    ).agg(F.count("*").cast("bigint").alias("c"))
    dup = F.col("c") >= 2
    return (
        groups.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_prefixes"),
            F.sum(F.when(dup, 1).otherwise(0)).cast("bigint").alias("dup_prefixes"),
            F.sum(F.when(dup, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("docs_in_dup_groups"),
            F.max("c").cast("bigint").alias("max_group"),
            F.round(
                F.sum(F.when(dup, F.col("c")).otherwise(0)).cast("double")
                / F.sum("c"),
                6,
            ).alias("dup_share"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X140 — curriculum staging by equal token mass
#
# Curriculum training orders the corpus easy -> hard and feeds it in
# stages; the staging that keeps every stage the same TRAINING cost
# splits on cumulative TOKENS, not document count. Difficulty proxy:
# integer milli-chars-per-word (longer words ~ harder text — same
# class of proxy as the x11 quality score), totally ordered with
# doc_id as tiebreak. The stage boundary is an integer-exact prefix
# computation: stage = K * exclusive_cum_tokens // total_tokens — on
# the Spark side via the distributed two-phase prefix operator (no
# single-partition window over documents), on the oracle side via a
# window cumsum. Engine extension (x49 admits a budgeted prefix; this
# PARTITIONS the whole corpus into equal-mass stages).
# ---------------------------------------------------------------------------

_X140_K = 8  # number of curriculum stages


@register(
    "x140_curriculum_stages",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, n_chars,
         len(string_split({NORM_DUCK.format(col="text")}, ' ')) AS n_tokens,
         (1000 * n_chars)
           // len(string_split({NORM_DUCK.format(col="text")}, ' '))
           AS difficulty_milli
  FROM documents
), ranked AS (
  SELECT *,
         CAST(SUM(n_tokens) OVER (ORDER BY difficulty_milli, doc_id)
              AS BIGINT) AS cum_tokens,
         CAST(SUM(n_tokens) OVER () AS BIGINT) AS total_tokens
  FROM scored
), staged AS (
  SELECT *,
         LEAST({_X140_K - 1},
               ({_X140_K} * (cum_tokens - n_tokens)) // total_tokens)
           AS stage
  FROM ranked
)
SELECT CAST(stage AS BIGINT) AS stage,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens,
       CAST(MIN(difficulty_milli) AS BIGINT) AS min_difficulty,
       CAST(MAX(difficulty_milli) AS BIGINT) AS max_difficulty,
       ROUND(CAST(SUM(1000 * n_chars) AS DOUBLE) / SUM(n_tokens) / 1000, 6)
         AS chars_per_word
FROM staged
GROUP BY stage
ORDER BY stage
""",
    doc=f"Equal-token-mass curriculum staging: corpus totally ordered "
    "by integer milli-chars-per-word difficulty, split into "
    f"{_X140_K} stages on the exclusive token prefix (distributed "
    "two-phase prefix rank — no single-partition window); per-stage "
    "doc/token mass and difficulty envelope.",
)
def x140_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.operators.prefix import prefix_rank

    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    scored = _tok_index(spark, sf_dir).select(
        "doc_id",
        "n_chars",
        F.size("w").cast("bigint").alias("n_tokens"),
    ).withColumn(
        "difficulty_milli",
        F.expr("(1000 * n_chars) div n_tokens"),
    )
    ranked = prefix_rank(
        scored,
        order=[F.col("difficulty_milli"), F.col("doc_id")],
        value="n_tokens",
        cum_col="cum_tokens",
        total_sum_col="total_tokens",
        pin_input=True,  # regex-tokenize difficulty pass would run 2x
    )
    staged = ranked.withColumn(
        "stage",
        F.expr(
            f"least({_X140_K - 1}, "
            f"({_X140_K} * (cum_tokens - n_tokens)) div total_tokens)"
        ).cast("bigint"),
    )
    return (
        staged.groupBy("stage")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tokens"),
            F.min("difficulty_milli").cast("bigint").alias("min_difficulty"),
            F.max("difficulty_milli").cast("bigint").alias("max_difficulty"),
            F.round(
                F.sum(F.lit(1000) * F.col("n_chars")).cast("double")
                / F.sum("n_tokens")
                / F.lit(1000),
                6,
            ).alias("chars_per_word"),
        )
        .orderBy("stage")
    )


# ---------------------------------------------------------------------------
# X143 — bigram conditional-entropy rate per source
#
# x25/x58 score documents under corpus LMs and x87 fits the Zipf
# slope; the missing corpus-level number is the entropy RATE: how many
# bits the NEXT word carries once the previous word is known,
# H(w2|w1) = H(w1,w2) − H(w1), per source — low rate = templated/
# repetitive source, high rate = diverse text (the quick screen before
# spending LM compute). Both entropies fold over the (source, w1, w2)
# bigram count relation (joint) and its w1 marginal — exact counts,
# each p·log2 p term 12dp-quantized before an exact decimal sum (the
# g33 contract), so partition order never moves the hash.
# ---------------------------------------------------------------------------

_X143_Q = (
    "CAST(ROUND((CAST({c} AS DOUBLE) / {n}) * LOG2(CAST({c} AS DOUBLE) / {n}),"
    " 12) AS DECIMAL(38,12))"
)


@register(
    "x143_bigram_entropy_rate",
    oracle=f"""
WITH base AS (
  SELECT source, string_split({NORM_DUCK.format(col="text")}, ' ') AS w
  FROM documents
), idx AS (
  SELECT source, w, unnest(range(1, len(w))) AS i FROM base WHERE len(w) >= 2
), big AS (
  SELECT source, w[i] AS w1, w[i + 1] AS w2 FROM idx
), joint AS (
  SELECT source, w1, w2, CAST(COUNT(*) AS BIGINT) AS c
  FROM big GROUP BY source, w1, w2
), tot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM joint GROUP BY source
), h_joint AS (
  SELECT j.source,
         MAX(t.n) AS n_bigrams,
         CAST(COUNT(*) AS BIGINT) AS v_bigrams,
         -CAST(SUM({_X143_Q.format(c="j.c", n="t.n")}) AS DOUBLE) AS hj
  FROM joint j JOIN tot t ON t.source = j.source
  GROUP BY j.source
), marg AS (
  SELECT source, w1, CAST(SUM(c) AS BIGINT) AS c
  FROM joint GROUP BY source, w1
), h_prev AS (
  SELECT m.source,
         -CAST(SUM({_X143_Q.format(c="m.c", n="t.n")}) AS DOUBLE) AS hp
  FROM marg m JOIN tot t ON t.source = m.source
  GROUP BY m.source
)
SELECT j.source, j.n_bigrams, j.v_bigrams,
       ROUND(j.hj, 6) AS h_joint_bits,
       ROUND(p.hp, 6) AS h_prev_bits,
       ROUND(j.hj - p.hp, 6) AS h_rate_bits
FROM h_joint j JOIN h_prev p ON p.source = j.source
ORDER BY j.source
""",
    doc="Bigram conditional-entropy rate per source, H(w2|w1) = "
    "H(w1,w2) − H(w1) in bits: exact bigram/marginal counts, "
    "12dp-quantized p·log2 p terms summed as exact decimals — the "
    "templated-vs-diverse screen run before LM-based scoring.",
)
def x143_bigram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    big = (
        _tok_index(spark, sf_dir)
        .select("source", "w")
        .filter(F.size("w") >= 2)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2), "
                    "i -> struct(w[i] AS w1, w[i + 1] AS w2))"
                )
            ).alias("bg"),
        )
        .select("source", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    # joint feeds the per-source totals, the joint-entropy rollup AND
    # the w1 marginal — unpinned, the regex + bigram explode + groupBy
    # ran three times
    joint = (
        big.groupBy("source", "w1", "w2")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = joint.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))

    def h_term(c: F.Column, n: F.Column) -> F.Column:
        p = c.cast("double") / n
        return F.round(p * F.log2(p), 12).cast("decimal(38,12)")

    hj = (
        joint.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.max("n").alias("n_bigrams"),
            F.count("*").cast("bigint").alias("v_bigrams"),
            (-F.sum(h_term(F.col("c"), F.col("n"))).cast("double")).alias("hj"),
        )
    )
    marg = joint.groupBy("source", "w1").agg(
        F.sum("c").cast("bigint").alias("c")
    )
    hp = (
        marg.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            (-F.sum(h_term(F.col("c"), F.col("n"))).cast("double")).alias("hp")
        )
    )
    return (
        hj.join(hp, "source")
        .select(
            "source",
            "n_bigrams",
            "v_bigrams",
            F.round("hj", 6).alias("h_joint_bits"),
            F.round("hp", 6).alias("h_prev_bits"),
            F.round(F.col("hj") - F.col("hp"), 6).alias("h_rate_bits"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X144 — shard-over-shard n-gram novelty (temporal dedup decay)
#
# The ingestion-ordering view of dedup: split the corpus into 10
# doc_id-ordered shards (the stand-in for crawl snapshots) and ask,
# per shard, what fraction of its DISTINCT 3-grams was never seen in
# any earlier shard. Falling novelty is the curve that decides when
# continued crawling stops paying for itself — the shard-grain
# companion of x48's exact-contamination probe and x133's
# cross-source dup census.
#
# Scale shape: 3-grams are digested (md5) before any shuffle, the
# (shard, gram) census and the first-shard reduction are two
# map-side-combined hash aggregates on digest keys, and the
# first-occurrence join is digest⋈digest equi-join — candidate volume
# is the distinct-gram count, never n². The shard assignment needs
# MAX(doc_id), attached as a LAZY broadcast scalar (one-row
# crossJoin, no eager driver .first()).
# ---------------------------------------------------------------------------


@register(
    "x144_shard_novelty",
    oracle=f"""
WITH mx AS (
  SELECT MAX(doc_id) AS mxid FROM documents
), toks AS (
  SELECT CAST((doc_id * 10) // (mxid + 1) AS BIGINT) AS shard,
         string_split({NORM_DUCK.format(col="text")}, ' ') AS t
  FROM documents CROSS JOIN mx
), grams AS (
  SELECT shard,
         unnest([md5(array_to_string(t[i:i+2], ' '))
                 for i in range(1, len(t) - 1)]) AS g
  FROM toks WHERE len(t) >= 3
), per_sg AS (
  SELECT shard, g, CAST(COUNT(*) AS BIGINT) AS c
  FROM grams GROUP BY shard, g
), firsts AS (
  SELECT g, MIN(shard) AS first_shard FROM per_sg GROUP BY g
)
SELECT p.shard,
       CAST(SUM(p.c) AS BIGINT) AS n_instances,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN f.first_shard = p.shard THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       ROUND(CAST(SUM(CASE WHEN f.first_shard = p.shard THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS novelty_ratio
FROM per_sg p JOIN firsts f ON f.g = p.g
GROUP BY p.shard ORDER BY p.shard
""",
    doc="Per-shard 3-gram novelty over 10 doc_id-ordered shards: "
    "fraction of each shard's distinct digested 3-grams first seen in "
    "that shard — the crawl-snapshot diminishing-returns curve; "
    "digest-grain aggregates and join, lazy broadcast MAX(doc_id).",
)
def x144_shard_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session tokenized corpus: w is pre-split once per corpus (§2.4)
    d = _tok_index(spark, sf_dir)
    mx = d.agg(F.max("doc_id").alias("mxid"))
    toks = d.crossJoin(F.broadcast(mx)).select(
        F.expr("CAST((doc_id * 10) div (mxid + 1) AS BIGINT)").alias(
            "shard"
        ),
        F.col("w").alias("t"),
    )
    grams = toks.filter(F.size("t") >= 3).select(
        "shard",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 2),"
                " i -> md5(array_join(slice(t, i, 3), ' ')))"
            )
        ).alias("g"),
    )
    # (shard, digest) grain; feeds the first-shard rollup AND the
    # novelty join — unpinned, the md5-per-gram pass ran twice
    per_sg = (
        grams.groupBy("shard", "g")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    firsts = per_sg.groupBy("g").agg(F.min("shard").alias("first_shard"))
    novel = F.when(F.col("first_shard") == F.col("shard"), 1).otherwise(0)
    return (
        per_sg.join(firsts, "g")
        .groupBy("shard")
        .agg(
            F.sum("c").cast("bigint").alias("n_instances"),
            F.count("*").cast("bigint").alias("n_distinct"),
            F.sum(novel).cast("bigint").alias("n_novel"),
            F.round(
                F.sum(novel).cast("double") / F.count("*"), 6
            ).alias("novelty_ratio"),
        )
        .orderBy("shard")
    )
