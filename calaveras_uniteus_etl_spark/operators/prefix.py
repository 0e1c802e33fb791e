"""Distributed prefix aggregation — running sums without the global sort.

A window like ``SUM(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)``
with no PARTITION BY compiles to a single-partition WindowExec: Spark
funnels the WHOLE relation through one task to sort it. Fine on a
dim-sized rollup; catastrophic when the relation scales with the data
(per-customer revenue at 100 TB is 10⁸⁺ rows through one thread).

``prefix_rank`` computes the same result with a two-phase plan that
stays parallel at any scale:

1. ``repartitionByRange(n, ...)`` on the total order — each task owns
   one contiguous key range. ``n`` is ALWAYS explicit so the exchange
   plans as ``REPARTITION_BY_NUM``, which AQE never coalesces: the
   offsets branch re-derives the same exchange (RangePartitioner's
   sample seed is deterministic), and partition ids must agree between
   the two branches for the offset join to be correct.
2. A *partition-local* window keyed on ``spark_partition_id()`` —
   every task sorts only its own slice.
3. A per-partition ``(rows, sum)`` rollup — at most one row per
   shuffle partition — turned into exclusive prefix offsets with a
   window over that tiny relation, then **broadcast** back and added.

The ranged relation is materialized once (eager ``localCheckpoint``)
before partition ids are read: both the rollup branch and the output
branch then consume the same physical blocks. This is load-bearing —
re-executing the range exchange per branch is NOT safe, because
``RangePartitioner`` samples with an RDD-id-derived seed, so two
executions can draw different boundaries and assign boundary-adjacent
rows different partition ids, silently corrupting the offset join.

The result is bit-exact equal to the global window for integer and
DECIMAL sums (both are associative/exact); for float sums the
re-association can differ in the last ulp, so keep those on the
global-window path or quantize first (as f29 does with cents).

Used by the data-sized prefix queries: f29_pareto_revenue,
g8_spend_deciles, x49_token_budget_fill (plans/queries_aggregates.py,
plans/queries_text.py). tests/test_plan_shape.py asserts the plans
carry no single-partition Exchange feeding a WindowExec.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "__prefix_pid"
_LOCAL_SUM = "__prefix_local_sum"
_LOCAL_RN = "__prefix_local_rn"
_OFF_SUM = "__prefix_off_sum"
_OFF_ROWS = "__prefix_off_rows"
_PART_SUM = "__prefix_part_sum"
_PART_ROWS = "__prefix_part_rows"


def prefix_rank(
    df: DataFrame,
    order: list[Column],
    value: str | list[str] | None = None,
    *,
    cum_col: str | list[str | None] | None = None,
    rn_col: str | None = None,
    total_sum_col: str | list[str | None] | None = None,
    total_rows_col: str | None = None,
    partitions: int | None = None,
    pin_input: bool = False,
) -> DataFrame:
    """Attach running-total / rank / grand-total columns over a total order.

    ``order`` must be a TOTAL order (include a unique tiebreaker such as
    the primary key) — ties straddling a range boundary would otherwise
    make the split nondeterministic. Columns produced (all optional):

    - ``cum_col``: inclusive running ``SUM(value)`` in ``order``
      (exclusive prefix = ``cum_col - value``).
    - ``rn_col``: global 1-based ``row_number`` in ``order`` (BIGINT).
    - ``total_sum_col`` / ``total_rows_col``: grand total of ``value`` /
      row count, attached to every row (replaces ``... OVER ()``).

    ``value`` may be a LIST of measure columns, with ``cum_col`` /
    ``total_sum_col`` lists of matching length (``None`` entries skip
    that output for that measure). All measures share ONE range
    exchange, one pinned materialization, and one offsets broadcast —
    a k-measure scan costs the same shuffle as a 1-measure scan
    (two-sample ECDFs, multi-metric Pareto), instead of k pinned
    range-partitioned copies of the relation.

    ``pin_input=True`` materializes ``df`` (eager localCheckpoint)
    BEFORE the range exchange. ``repartitionByRange`` executes its
    child subtree twice — once for the RangePartitioner's boundary
    sampling job and once for the exchange itself — so callers whose
    input is a nontrivial subtree (a scan + aggregation, a join)
    should pin: the subtree then runs once and both passes read the
    pinned blocks. Leave False when the input is a bare scan or an
    already-pinned leaf, where the extra materialization would cost
    more than the re-execution it saves.
    """
    values: list[str] = (
        [] if value is None else [value] if isinstance(value, str) else list(value)
    )
    cum_cols: list[str | None] = (
        [None] * len(values)
        if cum_col is None
        else [cum_col] if isinstance(cum_col, str) else list(cum_col)
    )
    tot_cols: list[str | None] = (
        [None] * len(values)
        if total_sum_col is None
        else [total_sum_col] if isinstance(total_sum_col, str)
        else list(total_sum_col)
    )
    if values and (len(cum_cols) != len(values) or len(tot_cols) != len(values)):
        raise ValueError("prefix_rank: cum_col/total_sum_col length != value length")
    wants_sum_output = any(c is not None for c in cum_cols + tot_cols)
    if rn_col is None and total_rows_col is None and not wants_sum_output:
        raise ValueError("prefix_rank: request at least one output column")
    if wants_sum_output and not values:
        raise ValueError("prefix_rank: cum_col/total_sum_col need a value column")
    need_sum = bool(values) and wants_sum_output

    n = partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    if pin_input:
        df = df.localCheckpoint(eager=True)
    # The ranged relation is PINNED (eager localCheckpoint) before the
    # pid is read: the offsets branch below re-reads the same blocks as
    # the output branch, so partition ids agree BY CONSTRUCTION.
    # Without the pin, the two branches may each re-execute the range
    # exchange, and RangePartitioner's sampled boundaries are not
    # stable across executions (the sample seed derives from the RDD
    # id) — rows near a boundary can land in different pids per branch
    # and the offset join silently mis-adds (observed intermittently
    # at sf0.1 under a vanilla 200-partition session). One data-sized
    # materialization is the price of multi-consumer determinism —
    # the same trade x14's label-propagation loop makes per round.
    part = (
        df.repartitionByRange(n, *order)
        .localCheckpoint(eager=True)
        .withColumn(_PID, F.spark_partition_id())
    )
    w_local = Window.partitionBy(_PID).orderBy(*order)
    local = part.withColumn(_LOCAL_RN, F.row_number().over(w_local))
    if need_sum:
        w_run = w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        for i, (v, cc) in enumerate(zip(values, cum_cols)):
            if cc is not None:
                local = local.withColumn(f"{_LOCAL_SUM}{i}", F.sum(v).over(w_run))

    # Per-partition totals: ≤ one row per shuffle partition, so the
    # global windows below run over a cluster-sized (not data-sized)
    # relation and the join back is broadcast by construction.
    aggs = [F.count(F.lit(1)).alias(_PART_ROWS)]
    if need_sum:
        for i, (v, cc, tc) in enumerate(zip(values, cum_cols, tot_cols)):
            if cc is not None or tc is not None:
                aggs.append(F.sum(v).alias(f"{_PART_SUM}{i}"))
    totals = local.groupBy(_PID).agg(*aggs)
    w_excl = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off_cols = [F.col(_PID)]
    if rn_col is not None or total_rows_col is not None:
        off_cols.append(
            F.coalesce(F.sum(_PART_ROWS).over(w_excl), F.lit(0)).alias(_OFF_ROWS)
        )
    if total_rows_col is not None:
        off_cols.append(F.sum(_PART_ROWS).over(w_all).alias(total_rows_col))
    if need_sum:
        for i, (cc, tc) in enumerate(zip(cum_cols, tot_cols)):
            part_sum = f"{_PART_SUM}{i}"
            if cc is not None:
                sum_type = totals.schema[part_sum].dataType
                off_cols.append(
                    F.coalesce(
                        F.sum(part_sum).over(w_excl), F.lit(0).cast(sum_type)
                    ).alias(f"{_OFF_SUM}{i}")
                )
            if tc is not None:
                off_cols.append(F.sum(part_sum).over(w_all).alias(tc))
    offsets = totals.select(*off_cols)

    out = local.join(F.broadcast(offsets), _PID)
    drop = [_PID, _LOCAL_RN, _OFF_ROWS]
    for i, cc in enumerate(cum_cols):
        if cc is not None:
            out = out.withColumn(
                cc, F.col(f"{_LOCAL_SUM}{i}") + F.col(f"{_OFF_SUM}{i}")
            )
            drop += [f"{_LOCAL_SUM}{i}", f"{_OFF_SUM}{i}"]
    if rn_col is not None:
        out = out.withColumn(
            rn_col, (F.col(_LOCAL_RN).cast("bigint") + F.col(_OFF_ROWS))
        )
    return out.drop(*drop)


def ntile_from_rank(rn: Column, total: Column, n: int) -> Column:
    """SQL NTILE(n) derived from a global rank + total row count.

    Standard NTILE semantics (Spark and DuckDB agree): with ``q =
    total div n`` and ``r = total mod n``, the first ``r`` tiles get
    ``q + 1`` rows, the rest ``q``. Exact integer arithmetic
    throughout; combined with :func:`prefix_rank` this replaces a
    single-partition ``NTILE() OVER (ORDER BY ...)`` with a fully
    parallel plan. CASE is short-circuit per row, so the ``q = 0``
    branch (total < n, every row inside the first ``r`` tiles) never
    divides by zero. Divisions go through double, exact for counts
    below 2^53 (~9e15 rows — far past 100 TB row counts).
    """
    q = F.floor(total / F.lit(n)).cast("bigint")
    r = (total % F.lit(n)).cast("bigint")
    threshold = r * (q + F.lit(1))
    in_big = rn <= threshold
    big_tile = F.floor((rn - F.lit(1)) / (q + F.lit(1))) + F.lit(1)
    small_tile = r + F.floor((rn - threshold - F.lit(1)) / q) + F.lit(1)
    return F.when(in_big, big_tile).otherwise(small_tile).cast("int")


def prefix_fold_min(
    df: DataFrame,
    order: list[Column],
    value: str,
    *,
    out_col: str,
    exclusive: bool = False,
    partitions: int | None = None,
    pin_input: bool = False,
) -> DataFrame:
    """Running MIN over a total order — same two-phase plan as
    :func:`prefix_rank`, generalized to the other associative fold a
    skyline/staircase needs.

    1. range-repartition on the total order (explicit ``n`` →
       REPARTITION_BY_NUM, AQE-stable), pin with an eager
       localCheckpoint so both branches read identical partitions;
    2. partition-local running min keyed on ``spark_partition_id()``;
    3. per-partition mins (≤ one row per partition) → exclusive
       prefix-min offsets via a window over that tiny relation,
       broadcast back, combined with ``least``.

    ``exclusive=True`` yields the prefix min of STRICTLY PRECEDING
    rows (NULL for the global first row) — the form a dominance test
    consumes. MIN is associative and order-insensitive, so the result
    is exactly the single-partition window's, at any partition count.

    ``pin_input``: same contract as :func:`prefix_rank` — pin a
    nontrivial input subtree once instead of letting the range
    boundary sampling re-execute it.
    """
    n = partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    if pin_input:
        df = df.localCheckpoint(eager=True)
    part = (
        df.repartitionByRange(n, *order)
        .localCheckpoint(eager=True)
        .withColumn(_PID, F.spark_partition_id())
    )
    w_local = Window.partitionBy(_PID).orderBy(*order)
    frame = (
        w_local.rowsBetween(Window.unboundedPreceding, -1)
        if exclusive
        else w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn("__pf_local_min", F.min(value).over(frame))

    totals = local.groupBy(_PID).agg(F.min(value).alias("__pf_part_min"))
    w_excl = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        F.col(_PID),
        F.min("__pf_part_min").over(w_excl).alias("__pf_off_min"),
    )
    out = local.join(F.broadcast(offsets), _PID).withColumn(
        out_col,
        F.when(
            F.col("__pf_local_min").isNull(), F.col("__pf_off_min")
        ).otherwise(
            F.when(
                F.col("__pf_off_min").isNull(), F.col("__pf_local_min")
            ).otherwise(F.least("__pf_local_min", "__pf_off_min"))
        ),
    )
    return out.drop(_PID, "__pf_local_min", "__pf_off_min")
