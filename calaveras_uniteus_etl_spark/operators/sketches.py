"""Mergeable sketch operators: deterministic HLL and histogram quantiles.

The library form of the x117/x118/x120/x122 registry queries — users
compose these directly (``hll_distinct(df, "user_id")``) the way the
registry proves them. Both sketches are built on engine-neutral
primitives (md5-fold hashing, integer shifts) so results are
bit-reproducible across engines, shards, and partitionings:

- **HLL** (Flajolet et al. 2007): 2^p max(rho) registers from a
  60-bit md5 fold. The harmonic mean is kept EXACT until the last
  step — sum(2^-M[j]) is accumulated as the integer
  sum(2^(52-M[j])) — and the single final double division uses one
  repr'd literal, so no float enters a shuffle and no libm enters the
  plan. Registers max-merge across any sharding (``hll_merge``).
- **Histogram quantiles**: a fixed-domain equi-width bin table
  (bin-wise mergeable by addition) with all-integer rank location and
  in-bin interpolation; error bounded by one bin width.

Scale shape: both sketches reduce arbitrarily large inputs to bounded
relations (2^p registers, B bins) through one map-side-combined
aggregate — the whole point at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P = 9
HLL_M = 1 << HLL_P  # 512 registers
HLL_TAIL = 51  # 60-bit md5 fold minus p index bits = 51 for p=9
_HLL_POW = 1 << HLL_TAIL
HLL_2P52 = 1 << (HLL_TAIL + 1)
# alpha_m * m^2 * 2^52 folded to ONE double literal: bare SQL decimal
# literals are DECIMAL with engine-specific division scales, but a
# repr'd double parses identically everywhere and the one remaining
# division over exact integers is IEEE-deterministic.
HLL_NUMERATOR = 0.7213 / (1.0 + 1.079 / HLL_M) * (HLL_M * HLL_M) * float(
    1 << 52
)
HLL_EST_SQL = f"{HLL_NUMERATOR!r} / CAST(sum_scaled AS DOUBLE)"


def hll_register_pairs(df: DataFrame, key: Column | str) -> DataFrame:
    """(idx, r) register observations for every input row.

    ``key`` is hashed with a 60-bit md5 fold; callers group with
    ``max(r)`` (optionally alongside their own grouping columns) to
    get the register table. One narrow projection — no shuffle here.
    """
    k = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(k.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    d = df.withColumn("__hll_h", h).withColumn(
        "__hll_rest", F.col("__hll_h") % _HLL_POW
    )
    rho = F.when(F.col("__hll_rest") == 0, F.lit(HLL_TAIL + 1)).otherwise(
        F.lit(HLL_TAIL + 1) - F.length(F.bin(F.col("__hll_rest")))
    )
    return d.withColumn(
        "idx", F.expr(f"__hll_h div {_HLL_POW}").cast("int")
    ).withColumn("r", rho.cast("int")).drop("__hll_h", "__hll_rest")


def hll_registers(df: DataFrame, key: Column | str, *group_cols: str) -> DataFrame:
    """Register table max(r) per (group_cols..., idx) — <= |groups| x m
    rows at any input size, one map-side-combined aggregate."""
    pairs = hll_register_pairs(df, key)
    return pairs.groupBy(*group_cols, "idx").agg(F.max("r").alias("mr"))


def hll_merge(registers: DataFrame, *group_cols: str) -> DataFrame:
    """Merge register tables by max — the property that lets shards
    sketch independently. Input columns: (..., idx, mr)."""
    return registers.groupBy(*group_cols, "idx").agg(
        F.max("mr").alias("mr")
    )


def hll_summarize(registers: DataFrame, *group_cols: str) -> DataFrame:
    """Estimate from a register table: n_registers_set, the EXACT
    integer harmonic sum, and the double estimate."""
    s = registers.groupBy(*group_cols).agg(
        F.count("*").alias("n_registers_set"),
        (
            F.sum(F.expr("shiftleft(cast(1 as bigint), 52 - mr)"))
            + (F.lit(HLL_M) - F.count("*")) * F.lit(HLL_2P52)
        )
        .cast("bigint")
        .alias("sum_scaled"),
    )
    return s.withColumn("hll_estimate", F.expr(HLL_EST_SQL))


def hll_distinct(df: DataFrame, key: Column | str, *group_cols: str) -> DataFrame:
    """One-call distinct-count estimate, optionally per group."""
    return hll_summarize(hll_registers(df, key, *group_cols), *group_cols)


# ---------------------------------------------------------------------------
# Histogram quantiles
# ---------------------------------------------------------------------------


def histogram_bins(
    df: DataFrame,
    value: Column | str,
    *,
    bins: int,
    domain: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Fixed-domain equi-width bin counts over an integer value column.

    The bin table is bounded (<= |groups| x bins rows) and mergeable
    across shards/days by bin-wise addition; values past the domain
    clamp into the last bin.
    """
    v = F.col(value) if isinstance(value, str) else value
    w = domain // bins
    # integer div, never float division: double arithmetic drifts past
    # 2^53 and floor(a/b) != a div b on engines that truncate
    d = df.withColumn("__hq_v", v.cast("bigint"))
    return d.groupBy(
        *group_cols,
        F.least(F.expr(f"__hq_v div {w}"), F.lit(bins - 1)).alias("bin"),
    ).agg(F.count("*").alias("cnt"))


def histogram_quantiles(
    bin_table: DataFrame,
    quantiles: tuple[int, ...],
    *,
    bins: int,
    domain: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Locate integer-interpolated quantile estimates in a bin table.

    All-integer: target rank = ceil(q*N/100) via div, in-bin
    interpolation ((rank - cum_before) * width) div cnt. The
    cumulative runs over the bounded bin grain (per group when
    ``group_cols`` is set — the window is group-partitioned, so it
    parallelizes across groups); the quantile arms are a broadcast
    relation located in one non-equi join. Error <= one bin width by
    construction.
    """
    from pyspark.sql.window import Window

    w = domain // bins
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*group_cols)
    cum = bin_table.select(
        *group_cols,
        "bin",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        (F.sum("cnt").over(w_cum) - F.col("cnt")).alias("cum_before"),
        F.sum("cnt").over(w_all).alias("n_total"),
    )
    spark = bin_table.sparkSession
    arms = spark.range(len(quantiles)).select(
        F.element_at(
            F.array(*[F.lit(q) for q in quantiles]),
            F.col("id").cast("int") + 1,
        ).alias("q")
    )
    rank = F.expr("(q * n_total + 99) div 100")
    located = F.broadcast(arms).join(
        cum, (rank > F.col("cum_before")) & (rank <= F.col("cum"))
    )
    return located.select(
        *group_cols,
        F.col("q").cast("int").alias("q"),
        F.col("n_total").cast("bigint").alias("n_total"),
        rank.cast("bigint").alias("target_rank"),
        F.col("bin").cast("bigint").alias("bin_idx"),
        F.col("cum_before").cast("bigint").alias("cum_before"),
        F.col("cnt").cast("bigint").alias("bin_cnt"),
        (
            F.col("bin") * w
            + F.expr(
                f"((q * n_total + 99) div 100 - cum_before) * {w} div cnt"
            )
        )
        .cast("bigint")
        .alias("est_cents"),
    ).orderBy(*group_cols, "q")


# ---------------------------------------------------------------------------
# Heavy-hitter candidates (Misra-Gries-style local pruning)
# ---------------------------------------------------------------------------


def local_heavy_candidates(
    df: DataFrame, term_col: str = "term", *, k: int
) -> DataFrame:
    """Candidate generation for exact phi-heavy hitters (phi = 1/k).

    Arrow-batched local counting with the Misra-Gries guarantee: a
    value whose GLOBAL count exceeds N/k must, by pigeonhole, exceed
    n_b/k in at least one batch b (sum(n_b) = N), so the union of
    per-batch survivors is a deterministic SUPERSET of every true
    heavy hitter regardless of how rows fall into batches. Each task
    emits at most k-1 candidates per Arrow batch instead of shuffling
    its whole long tail, so the exact recount that follows joins
    against a bounded broadcast relation -- the two-phase shape that
    makes exact heavy hitters tractable when the term domain is far
    larger than executor memory.

    Returns a one-column DataFrame of candidate terms (with
    duplicates across batches; ``.distinct()`` it before broadcast).
    """
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField(term_col, T.StringType())])

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            s = pdf[term_col]
            if len(s) == 0:
                continue
            vc = s.value_counts()
            keep = vc[vc * k > len(s)]
            yield pd.DataFrame({term_col: keep.index.astype(str)})

    return df.select(term_col).mapInPandas(gen, schema=schema)
