"""Fluent corpus-pipeline facade over the operator library.

The registry (``plans/``) exposes every operator as a named, oracled
QUERY; this module exposes the same machinery as a composable USER
API — the way a data engineer actually strings a curation pipeline
together:

    from calaveras_uniteus_etl_spark.corpus import Corpus

    kept = (
        Corpus.from_parquet(spark, f"{sf_dir}/documents.parquet")
        .exact_dedup()
        .quality_gate("gopher", "repetition")
        .with_lang()
        .with_token_counts()
        .pack_to_budget(1_000_000)
    )
    kept.df.write.parquet(out)
    kept.manifest().show()       # per-stage retention funnel

Every stage reuses the SAME normalization / hashing / gate fragments
the oracled registry queries run (single source of truth — the
imports from ``plans.queries_text`` are deliberate), so a pipeline
built here is bit-consistent with the driver-checked definitions:
``quality_gate("gopher")`` keeps exactly the documents
``x70_gopher_quality_gate`` counts as ``n_pass_all``, and
``pack_to_budget`` admits exactly the set ``x49_token_budget_fill``
reports.

Scale posture matches the registry plans: exact dedup is one digest
groupBy, the budget fill rides the distributed prefix operator
(``operators/prefix.py`` — no single-partition window), gates are
pure JVM-side expressions, and the manifest is a union of 1-row
aggregates. Stages are lazy DataFrame transformations until an
action runs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calaveras_uniteus_etl_spark.functions.hashing import md5_long
from calaveras_uniteus_etl_spark.operators.dedup import NORM_SPARK
from calaveras_uniteus_etl_spark.operators.prefix import prefix_rank

_NORM_COL = "__corpus_norm"


def _norm_expr(text_col: str):
    return F.expr(NORM_SPARK.format(col=text_col))


def _gopher_fail_expr(text_col: str):
    """Gopher-gate FAIL predicate — x70's rule battery, same fragments."""
    from calaveras_uniteus_etl_spark.plans.queries_text import (
        _X70_FAIL_ANY,
        _X70_STOP_ALL,
    )

    norm = NORM_SPARK.format(col=text_col)
    metrics = {
        "n": f"size(split({norm}, ' '))",
        "chars": f"length({norm}) - (size(split({norm}, ' ')) - 1)",
        "stop": f"size(filter(split({norm}, ' '), t -> t in ({_X70_STOP_ALL})))",
        "alpha": f"size(filter(split({norm}, ' '), t -> t rlike '[a-z]'))",
        "digits": f"length({norm}) - length(regexp_replace({norm}, '[0-9]', ''))",
        "normlen": f"length({norm})",
    }
    # one-pass whole-word substitution: sequential .replace would
    # rewrite letters inside already-substituted expressions
    import re

    pred = re.sub(
        r"\b(" + "|".join(metrics) + r")\b",
        lambda m: f"({metrics[m.group(1)]})",
        _X70_FAIL_ANY,
    )
    return F.expr(pred)


@dataclass
class Corpus:
    """A document corpus plus the stage-by-stage retention trail."""

    spark: SparkSession
    df: DataFrame
    text_col: str = "text"
    id_col: str = "doc_id"
    stages: list[tuple[str, DataFrame]] = field(default_factory=list)

    # --- constructors ------------------------------------------------------

    @classmethod
    def from_parquet(
        cls,
        spark: SparkSession,
        path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> "Corpus":
        df = spark.read.parquet(path)
        c = cls(spark, df, text_col, id_col)
        c.stages = [("ingest", df)]
        return c

    def _next(self, stage: str, df: DataFrame) -> "Corpus":
        return Corpus(
            self.spark,
            df,
            self.text_col,
            self.id_col,
            self.stages + [(stage, df)],
        )

    # --- stages ------------------------------------------------------------

    def exact_dedup(self) -> "Corpus":
        """Keep the lowest-id document per normalized-text digest
        (x1's survivor rule: one digest groupBy, no window)."""
        dig = md5_long(_norm_expr(self.text_col))
        keep = (
            self.df.withColumn("__dig", dig)
            .groupBy("__dig")
            .agg(F.min(self.id_col).alias(self.id_col))
            .drop("__dig")
        )
        out = self.df.join(keep, self.id_col, "left_semi")
        return self._next("exact_dedup", out)

    def quality_gate(self, *rules: str) -> "Corpus":
        """Drop documents failing any named rule battery.

        ``"gopher"`` = x70's format rules; ``"repetition"`` = x100's
        duplicate-word / top-n-gram rules; ``"length"`` = the x103
        minimum-length rule. Unknown names raise.
        """
        out = self.df
        for rule in rules or ("gopher",):
            if rule == "gopher":
                out = out.filter(~_gopher_fail_expr(self.text_col))
            elif rule == "repetition":
                out = self._filter_repetition(out)
            elif rule == "length":
                from calaveras_uniteus_etl_spark.plans.queries_text import (
                    _X103_MIN_CHARS,
                )

                out = out.filter(
                    F.length(F.col(self.text_col)) >= _X103_MIN_CHARS
                )
            else:
                raise ValueError(f"unknown quality rule: {rule!r}")
        return self._next(f"quality_gate[{','.join(rules or ('gopher',))}]", out)

    def _filter_repetition(self, df: DataFrame) -> DataFrame:
        """x100's rules; the n-gram modes computed relationally."""
        from calaveras_uniteus_etl_spark.plans.queries_text import _X100_FAIL_ANY

        m = df.select(
            self.id_col,
            F.split(_norm_expr(self.text_col), " ").alias("__w"),
        )
        s = m.select(
            self.id_col,
            F.expr("size(__w)").alias("n"),
            F.expr("size(array_distinct(__w))").alias("nd"),
        )

        def top(k: int, alias: str) -> DataFrame:
            gram = " || ' ' || ".join(f"__w[i+{j}]" for j in range(k))
            return (
                m.filter(F.expr(f"size(__w) >= {k}"))
                .select(
                    self.id_col,
                    F.explode(
                        F.expr(
                            f"transform(sequence(0, size(__w) - {k}),"
                            f" i -> {gram})"
                        )
                    ).alias("g"),
                )
                .groupBy(self.id_col, "g")
                .count()
                .groupBy(self.id_col)
                .agg(F.max("count").alias(alias))
            )

        flags = (
            s.join(top(2, "topc2"), self.id_col, "left")
            .join(top(3, "topc3"), self.id_col, "left")
            .select(
                self.id_col,
                "n",
                "nd",
                F.coalesce("topc2", F.lit(0)).alias("topc2"),
                F.coalesce("topc3", F.lit(0)).alias("topc3"),
            )
        )
        keep = flags.filter(~F.expr(_X100_FAIL_ANY)).select(self.id_col)
        return df.join(keep, self.id_col, "left_semi")

    def with_lang(self, out_col: str = "pred_lang") -> "Corpus":
        """Attach x7's stopword-hit language prediction."""
        from calaveras_uniteus_etl_spark.plans.queries_text import _X7_PRED_SPARK

        # the prediction CASE references the word array as `filter(w, `;
        # substitute that exact call shape (a bare "w" replace would
        # clobber WHEN/THEN keywords)
        pred = _X7_PRED_SPARK.replace(
            "filter(w, ",
            f"filter(split({NORM_SPARK.format(col=self.text_col)}, ' '), ",
        )
        out = self.df.withColumn(out_col, F.expr(pred))
        return self._next("with_lang", out)

    def with_token_counts(self, out_col: str = "n_tokens") -> "Corpus":
        """Whitespace token counts (x9's counting contract)."""
        norm = _norm_expr(self.text_col)
        out = self.df.withColumn(
            out_col,
            F.when(F.trim(F.col(self.text_col)) == "", 0).otherwise(
                F.size(F.split(norm, " "))
            ),
        )
        return self._next("with_token_counts", out)

    def pack_to_budget(
        self,
        budget: int,
        quality_col: str | None = None,
        token_col: str = "n_tokens",
    ) -> "Corpus":
        """Admit highest-quality documents until the token budget fills
        (x49's rule) via the distributed prefix sum — no
        single-partition window at any corpus size."""
        df = self.df
        if token_col not in df.columns:
            df = self.with_token_counts(token_col).df
        if quality_col is None:
            quality_col = "__q"
            df = df.withColumn(
                quality_col,
                F.length(self.text_col)
                - F.length(F.replace(F.col(self.text_col), F.lit(" "))),
            )
        ranked = prefix_rank(
            df,
            [F.desc(quality_col), F.asc(self.id_col)],
            token_col,
            cum_col="__cum",
        )
        out = ranked.filter(F.col("__cum") <= budget).drop("__cum", "__q")
        return self._next(f"pack_to_budget[{budget}]", out)

    def sample_per_source(
        self, k: int, source_col: str = "source", weight_col: str = "n_chars"
    ) -> "Corpus":
        """x75's A-Res draw: exactly k docs per source, probability
        proportional to weight, deterministic (hash race, no RNG)."""
        from pyspark.sql.window import Window

        u = (md5_long(F.concat(F.lit("ares:"), F.col(self.id_col).cast("string")))
             + 1) / F.lit(float(1 << 60))
        key = -F.log(u) / F.col(weight_col)
        w = Window.partitionBy(source_col).orderBy(
            F.round(key * 1e12).cast("bigint"), F.col(self.id_col)
        )
        out = (
            self.df.filter(F.col(weight_col) > 0)
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .drop("__rk")
        )
        return self._next(f"sample_per_source[{k}]", out)

    def waterfill_budget(
        self,
        pct: int = 60,
        source_col: str = "source",
        token_col: str = "n_tokens",
    ) -> "Corpus":
        """Cap each source at the water-filling token level (x121's
        solver): small sources keep everything, large sources are cut
        at the common level that spends ``pct``% of total tokens —
        the fair corpus-mixing quota, per-doc admission in ingest
        (id) order. Level math runs on the bounded source grain; the
        per-source fill is a source-partitioned running sum."""
        from pyspark.sql.window import Window

        df = self.df
        if token_col not in df.columns:
            df = self.with_token_counts(token_col).df
        toks = df.groupBy(source_col).agg(
            F.sum(token_col).cast("bigint").alias("__n")
        )
        tot = toks.agg(
            F.count("*").alias("__s"),
            F.expr(f"sum(__n) * {int(pct)} div 100").alias("__b"),
        )
        w_ord = Window.orderBy("__n", source_col)
        ordered = (
            toks.crossJoin(F.broadcast(tot))
            .withColumn("__rn", F.row_number().over(w_ord))
            .withColumn(
                "__cb", F.sum("__n").over(w_ord) - F.col("__n")
            )
            .withColumn("__pn", F.lag("__n").over(w_ord))
        )
        lvl_expr = F.expr("(__b - __cb) div (__s - __rn + 1)")
        lvl = (
            ordered.filter(
                (F.col("__n") > lvl_expr)
                & (F.col("__pn").isNull() | (F.col("__pn") <= lvl_expr))
            )
            .agg(
                F.coalesce(F.max(lvl_expr), F.lit(9223372036854775807)).alias(
                    "__level"
                )
            )
        )
        w_fill = Window.partitionBy(source_col).orderBy(self.id_col)
        out = (
            df.crossJoin(F.broadcast(lvl))
            .withColumn("__cum", F.sum(token_col).over(w_fill))
            .filter(F.col("__cum") <= F.col("__level"))
            .drop("__cum", "__level")
        )
        return self._next(f"waterfill_budget[{pct}%]", out)

    def near_dup_dedup(self, min_est_sim: float = 0.5) -> "Corpus":
        """Drop near-duplicates: x2's MinHash/LSH miner with the
        keep-smallest-id survivor rule (the larger id of every
        accepted pair is removed)."""
        losers = _near_dup_losers(
            self.df, self.text_col, self.id_col, min_est_sim
        )
        out = self.df.join(losers, self.id_col, "left_anti")
        return self._next(f"near_dup_dedup[{min_est_sim}]", out)

    # --- readouts ----------------------------------------------------------

    def heavy_terms(self, k: int = 40) -> DataFrame:
        """Exact phi-heavy hitters (phi = 1/k) over the current corpus:
        every term with frequency > N/k, with exact counts and shares
        (x123's two-phase plan — local candidate pruning, broadcast
        exact recount; the long tail is never hash-aggregated)."""
        from calaveras_uniteus_etl_spark.operators.sketches import (
            local_heavy_candidates,
        )

        toks = self.df.select(
            F.explode(F.split(_norm_expr(self.text_col), " ")).alias("term")
        ).filter(F.col("term") != "")
        cand = local_heavy_candidates(toks, "term", k=k).distinct()
        total = toks.agg(F.count("*").cast("bigint").alias("n"))
        return (
            toks.join(F.broadcast(cand), "term")
            .groupBy("term")
            .agg(F.count("*").cast("bigint").alias("cnt"))
            .crossJoin(F.broadcast(total))  # 1-row scalar
            .filter(F.col("cnt") * k > F.col("n"))
            .select(
                "term",
                "cnt",
                F.round(F.col("cnt").cast("double") / F.col("n"), 6).alias(
                    "share"
                ),
            )
            .orderBy(F.desc("cnt"), "term")
        )

    def pii_census(self) -> DataFrame:
        """Per-source PII detector counts over the current corpus —
        x128's regex battery (email/phone/SSN/PAN spans, any-PII doc
        rate) on whatever survives the pipeline so far."""
        from calaveras_uniteus_etl_spark.plans.queries_text import (
            _X128_PATS,
        )

        t = F.col(self.text_col)
        aggs = [F.count("*").cast("bigint").alias("n_docs")]
        any_hit = None
        for name, pat in _X128_PATS.items():
            aggs.append(
                F.sum(
                    F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
                )
                .cast("bigint")
                .alias(f"n_{name}")
            )
            hit = t.rlike(pat)
            any_hit = hit if any_hit is None else (any_hit | hit)
        aggs.append(
            F.round(
                F.sum(F.when(any_hit, 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("pii_rate")
        )
        return self.df.groupBy("source").agg(*aggs).orderBy("source")

    def manifest(self) -> DataFrame:
        """Per-stage retention funnel: one row per pipeline stage."""
        parts = []
        for i, (stage, df) in enumerate(self.stages):
            parts.append(
                df.agg(
                    F.lit(i).alias("stage_idx"),
                    F.lit(stage).alias("stage"),
                    F.count("*").alias("n_docs"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.orderBy("stage_idx")


def _near_dup_losers(
    df: DataFrame, text_col: str, id_col: str, min_est_sim: float
):
    """IDs to drop under the keep-smallest-neighbor near-dup rule.

    x2's MinHash/LSH miner verbatim (same shingles, signatures, band
    keys, BUCKET_CAP, acceptance bar): a document is dropped iff an
    accepted near-duplicate with a smaller id exists. Deterministic,
    one pass; cluster-exact collapse (x14's components) remains the
    registry's job.
    """
    from calaveras_uniteus_etl_spark.operators import dedup as dd
    from calaveras_uniteus_etl_spark.plans.queries_dedup import BUCKET_CAP

    sigs = (
        dd.with_shingles(df, text_col)
        .withColumn("hs", dd.shingle_hashes_expr())
        .withColumn("sig", dd.minhash_sig_expr())
        .select(F.col(id_col).alias("__nd_id"), "sig")
        .cache()
    )
    bands = sigs.select(
        "__nd_id", F.posexplode(dd.band_keys_expr()).alias("band", "band_key")
    )
    ok = (
        bands.groupBy("band", "band_key")
        .agg(F.count("*").alias("bc"))
        .filter(F.col("bc") <= BUCKET_CAP)
        .drop("bc")
    )
    bands = bands.join(ok, ["band", "band_key"])
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.__nd_id") < F.col("b.__nd_id")),
        )
        .select(
            F.col("a.__nd_id").alias("__a"), F.col("b.__nd_id").alias("__b")
        )
        .distinct()
    )
    pairs = cand.join(
        sigs.select(F.col("__nd_id").alias("__a"), F.col("sig").alias("sa")),
        "__a",
    ).join(
        sigs.select(F.col("__nd_id").alias("__b"), F.col("sig").alias("sb")),
        "__b",
    )
    nm = F.expr(
        f"size(filter(sequence(0, {dd.MINHASH_K - 1}), i -> sa[i] = sb[i]))"
    )
    accepted = pairs.select("__a", "__b", nm.alias("nm")).filter(
        F.col("nm").cast("double") / dd.MINHASH_K >= min_est_sim
    )
    # drop the LARGER id of each accepted pair
    return accepted.select(F.col("__b").alias(id_col)).distinct()
