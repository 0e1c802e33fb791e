"""Customer-lifecycle and governance operators (round-4 additions).

Survival analysis, multi-touch attribution, calendar densification,
RANGE-frame trailing windows, first-occurrence ordering and a
k-anonymity/l-diversity privacy audit — the "customer lifecycle &
governance" layer a health-data warehouse (the reference domain,
core/app.py report endpoints) runs on top of the relational core.

Scale notes per query are in each docstring; the common theme: every
window is either partitioned by a data key (user/customer) or runs
over an aggregated grain whose domain is provably small (distinct
tenure days, event-type pairs), never over a data-sized relation in
one partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from calaveras_uniteus_etl_spark.functions.datetime_ext import epoch_us
from calaveras_uniteus_etl_spark.functions.hashing import (
    duckdb_md5_long_sql,
    md5_long,
)
from calaveras_uniteus_etl_spark.plans._exact import (
    MONEY,
    VALUE6,
    dec,
    exact_sum,
    o_sum,
)
from calaveras_uniteus_etl_spark.plans.catalog import register
from calaveras_uniteus_etl_spark.plans.tables import table

# ---------------------------------------------------------------------------
# F39 — Kaplan-Meier survival curve over customer tenure
#
# The product-limit estimator (Kaplan & Meier 1958): at each distinct
# event time t_i, S(t_i) = Π_{j≤i} (1 - d_j/n_j) with d_j = churn
# events at t_j and n_j = subjects still at risk (tenure ≥ t_j).
# "Tenure" is days between a customer's first and last order;
# "churned" means the last order predates a fixed cutoff (constant —
# no now()), otherwise the subject is right-censored.
#
# Cross-engine determinism: each factor's log is quantized once to
# integer micro-nats (ROUND(ln(1-d/n)·1e6)), the cumulative sum runs
# over BIGINTs ordered by the unique tenure key, and the final
# EXP(sum/1e6) rounds to 9dp — identical in Spark and DuckDB. A
# terminal d=n event (everyone at risk dies) would make ln(0)
# singular; a cumulative flag pins survival to exactly 0 from that
# point instead.
#
# Scale: customer-grain aggregate shuffles once; the KM window runs
# over DISTINCT TENURE DAYS (bounded by the calendar span, ~2.4k rows
# at any SF — an aggregated grain, not a data-sized relation), so the
# single-partition window is safe by construction.
# ---------------------------------------------------------------------------

_F39_CUTOFF = "2001-02-01"  # churned iff last order strictly before this


@register(
    "f39_kaplan_meier",
    oracle=f"""
WITH cust AS (
  SELECT o_custkey,
         date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) AS tenure,
         CASE WHEN MAX(o_orderdate) < DATE '{_F39_CUTOFF}' THEN 1 ELSE 0 END
           AS churned
  FROM orders GROUP BY o_custkey
), grain AS (
  SELECT tenure, COUNT(*) AS at_t,
         CAST(SUM(churned) AS BIGINT) AS d
  FROM cust GROUP BY tenure
), risk AS (
  SELECT tenure, d,
         CAST(SUM(at_t) OVER (ORDER BY tenure DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT)
           AS n
  FROM grain
), km AS (
  SELECT tenure, d, n,
         CAST(SUM(CASE WHEN d < n
                       THEN CAST(ROUND(LN(1.0 - CAST(d AS DOUBLE) / n) * 1e6)
                                 AS BIGINT)
                       ELSE 0 END)
              OVER (ORDER BY tenure
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT)
           AS log_us,
         MAX(CASE WHEN d = n THEN 1 ELSE 0 END)
           OVER (ORDER BY tenure
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS died_out
  FROM risk WHERE d > 0
)
SELECT tenure AS tenure_days, d AS n_events, n AS n_at_risk,
       CASE WHEN died_out = 1 THEN 0.0
            ELSE ROUND(EXP(CAST(log_us AS DOUBLE) / 1e6), 9) END AS survival
FROM km ORDER BY tenure_days
""",
    doc="Kaplan-Meier product-limit survival over customer tenure "
    "(churn = last order before a constant cutoff, else censored): "
    "micro-nat-quantized log factors cumulated over the distinct-"
    "tenure grain, d=n extinction pinned to exact 0.",
)
def f39_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("tenure"),
        F.when(
            F.max("o_orderdate") < F.lit(_F39_CUTOFF).cast("date"), 1
        )
        .otherwise(0)
        .alias("churned"),
    )
    grain = cust.groupBy("tenure").agg(
        F.count("*").alias("at_t"),
        F.sum("churned").cast("bigint").alias("d"),
    )
    # Distinct-tenure grain: bounded by calendar days, safe to window.
    w_desc = Window.orderBy(F.desc("tenure")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = grain.select(
        "tenure", "d", F.sum("at_t").over(w_desc).alias("n")
    ).filter(F.col("d") > 0)
    w_asc = Window.orderBy("tenure").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    log_term = F.when(
        F.col("d") < F.col("n"),
        F.round(
            F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n")) * 1e6
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    km = risk.select(
        "tenure",
        "d",
        "n",
        F.sum(log_term).over(w_asc).alias("log_us"),
        F.max(F.when(F.col("d") == F.col("n"), 1).otherwise(0))
        .over(w_asc)
        .alias("died_out"),
    )
    return km.select(
        F.col("tenure").alias("tenure_days"),
        F.col("d").alias("n_events"),
        F.col("n").alias("n_at_risk"),
        F.when(F.col("died_out") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("log_us").cast("double") / 1e6), 9))
        .alias("survival"),
    ).orderBy("tenure_days")


# ---------------------------------------------------------------------------
# F40 — linear multi-touch attribution (the fractional twin of s5)
#
# s5 credits each purchase to ONE click (last-touch argmax); the other
# industry-standard model splits the credit EQUALLY across every click
# in the lookback window. Same interval-join shape, no argmax — each
# pair carries weight 1/n_clicks(purchase), and credit rolls up per
# click-hour. Fractions are exact in micro-credit integers: each pair
# contributes round(1e6/n)/1e6 with the remainder assigned to the
# EARLIEST click (deterministic in both engines), so per-hour credit
# sums are bit-identical and total credit per purchase is exactly 1.
#
# Scale: one user_id shuffle for the interval join (same as s4/s5),
# the per-purchase count/rank windows partition by purchase id —
# already co-partitioned, no extra exchange.
# ---------------------------------------------------------------------------

_F40_GAP_MIN = 30  # shares s5's lookback constant


@register(
    "f40_linear_attribution",
    oracle=f"""
WITH pairs AS (
  SELECT c.ts AS c_ts, p.event_id AS p_id, p.value AS p_value,
         COUNT(*) OVER (PARTITION BY p.event_id) AS n_touch,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts ASC, c.event_id ASC) AS rn
  FROM events c
  JOIN events p
    ON p.user_id = c.user_id
   AND p.ts >= c.ts
   AND p.ts <= c.ts + INTERVAL {_F40_GAP_MIN} MINUTE
  WHERE c.event_type = 'click' AND p.event_type = 'purchase'
), credited AS (
  SELECT c_ts, p_value,
         CAST((1000000 // n_touch)
              + CASE WHEN rn = 1 THEN 1000000 % n_touch ELSE 0 END
              AS BIGINT) AS credit_us
  FROM pairs
)
SELECT time_bucket(INTERVAL '1 hour', c_ts) AS click_hour,
       CAST(SUM(credit_us) AS BIGINT) AS credit_us,
       ROUND(CAST(SUM(credit_us) AS DOUBLE) / 1e6, 6) AS purchases_credited,
       CAST(SUM(CAST(ROUND(p_value * credit_us / 1e6, 12)
                     AS DECIMAL(38,12))) AS DOUBLE) AS value_credited
FROM credited
GROUP BY 1
ORDER BY click_hour
""",
    doc="Linear multi-touch attribution: every click in the 30-min "
    "lookback splits the purchase credit equally — integer micro-"
    "credits with the division remainder pinned to the earliest "
    "click, rolled up per click-hour; fractional twin of s5's "
    "last-touch argmax.",
)
def f40_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.streaming.windows import interval_join

    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        F.col("value").alias("p_value"),
    )
    pairs = interval_join(
        clicks,
        buys,
        left_ts="c_ts",
        right_ts="p_ts",
        max_gap=f"{_F40_GAP_MIN} minutes",
        extra=("c_id", "p_id", "p_value"),
    )
    w_cnt = Window.partitionBy("p_id")
    w_rn = Window.partitionBy("p_id").orderBy(
        F.asc("c_ts"), F.asc("c_id")
    )
    credited = (
        pairs.withColumn("n_touch", F.count("*").over(w_cnt))
        .withColumn("rn", F.row_number().over(w_rn))
        .select(
            "c_ts",
            "p_value",
            (
                F.expr("1000000 div n_touch")
                + F.when(
                    F.col("rn") == 1, F.lit(1000000) % F.col("n_touch")
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("credit_us"),
        )
    )
    return (
        credited.groupBy(F.window("c_ts", "1 hour").alias("win"))
        .agg(
            F.sum("credit_us").cast("bigint").alias("credit_us"),
            F.round(F.sum("credit_us").cast("double") / 1e6, 6).alias(
                "purchases_credited"
            ),
            F.sum(
                F.round(
                    F.col("p_value") * F.col("credit_us") / F.lit(1e6), 12
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("value_credited"),
        )
        .select(
            F.col("win.start").alias("click_hour"),
            "credit_us",
            "purchases_credited",
            "value_credited",
        )
        .orderBy("click_hour")
    )


# ---------------------------------------------------------------------------
# G14 — calendar densification + forward fill (gap-fill)
#
# Sparse event streams become dense daily series: explode each user's
# [first_day, last_day] span with sequence(), left-join observed
# per-day aggregates, then forward-fill the last observed value with
# last_value(ignoreNulls) over the per-user day order. The audited
# subset (md5(user) % 8 == 0) keeps the checked output small while the
# operator itself is corpus-wide.
#
# Scale: the explode fans out ≤ span-days rows per user (bounded by
# the calendar, not the data); the fill window partitions by user_id —
# one shuffle, no global sort. At 100 TB the same plan holds: day
# grain × users is the output's intrinsic size.
# ---------------------------------------------------------------------------


@register(
    "g14_gap_fill_ffill",
    oracle=f"""
WITH keep AS (
  SELECT user_id FROM (SELECT DISTINCT user_id FROM events) u
  WHERE {duckdb_md5_long_sql("'gf:' || CAST(user_id AS VARCHAR)")} % 8 = 0
), daily AS (
  SELECT e.user_id, CAST(e.ts AS DATE) AS day,
         CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DECIMAL(38,6))
              AS DOUBLE) AS day_value
  FROM events e JOIN keep k ON k.user_id = e.user_id
  GROUP BY e.user_id, CAST(e.ts AS DATE)
), span AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
), calendar AS (
  SELECT s.user_id, CAST(gs.d AS DATE) AS day
  FROM span s, LATERAL (
    SELECT UNNEST(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS d
  ) gs
), filled AS (
  SELECT c.user_id, c.day,
         d.day_value IS NOT NULL AS observed,
         LAST_VALUE(d.day_value IGNORE NULLS)
           OVER (PARTITION BY c.user_id ORDER BY c.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
  FROM calendar c LEFT JOIN daily d
    ON d.user_id = c.user_id AND d.day = c.day
)
SELECT user_id,
       COUNT(*) AS n_days,
       CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
         AS n_observed,
       CAST(SUM(CASE WHEN observed THEN 0 ELSE 1 END) AS BIGINT)
         AS n_filled,
       CAST(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
         AS filled_sum
FROM filled
GROUP BY user_id
ORDER BY user_id
""",
    doc="Gap-fill: densify each audited user's day span with "
    "sequence()/generate_series, forward-fill the last observed "
    "daily value (last_value ignoreNulls per user), report observed/"
    "filled day counts and the exact-decimal sum of the dense series.",
)
def g14_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    keep = (
        e.select("user_id")
        .distinct()
        .filter(
            md5_long(F.concat(F.lit("gf:"), F.col("user_id").cast("string")))
            % 8
            == 0
        )
    )
    daily = (
        e.join(F.broadcast(keep), "user_id")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(exact_sum(dec("value", VALUE6), "day_value", scale=6))
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = calendar.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.col("day_value").isNotNull().alias("observed"),
        F.last("day_value", ignorenulls=True).over(w).alias("v"),
    )
    return (
        filled.groupBy("user_id")
        .agg(
            F.count("*").alias("n_days"),
            F.sum(F.when(F.col("observed"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_observed"),
            F.sum(F.when(F.col("observed"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_filled"),
            exact_sum(dec("v", VALUE6), "filled_sum", scale=6),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# G15 — trailing RANGE-frame window (rolling 90-day customer spend)
#
# The one windowing mode the suite lacked: a time-RANGE frame (not
# ROWS) — at each order, the customer's total spend over the trailing
# 90 days INCLUDING same-day peers. Spark expresses it as
# rangeBetween(-90, 0) over a day-ordinal; DuckDB as RANGE BETWEEN 90
# PRECEDING. Both engines give ties (same customer, same date) the
# identical frame, so the per-order values match exactly; the check
# output aggregates per order-month to stay small.
#
# Scale: the window partitions by o_custkey — per-customer order
# history through one task, bounded by a customer's lifetime orders
# (hundreds), not the corpus. One shuffle, reused by the final
# aggregate's month grain only after the window.
# ---------------------------------------------------------------------------

_G15_DAYS = 90
_G15_EPOCH = "1995-01-01"  # day-ordinal origin (any fixed date works)


@register(
    "g15_trailing_range_window",
    oracle=f"""
WITH spend AS (
  SELECT o_custkey, o_orderdate,
         date_diff('day', DATE '{_G15_EPOCH}', o_orderdate) AS day_ord,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price
  FROM orders
), trail AS (
  SELECT o_orderdate,
         CAST(CAST(SUM(price) OVER (
                PARTITION BY o_custkey ORDER BY day_ord
                RANGE BETWEEN {_G15_DAYS} PRECEDING AND CURRENT ROW)
              AS DECIMAL(38,2)) AS DOUBLE) AS trail_spend
  FROM spend
)
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       COUNT(*) AS n_orders,
       {o_sum("trail_spend", "trail_total", prec="DECIMAL(18,2)")},
       CAST(CAST(SUM(CAST(trail_spend AS DECIMAL(18,2))) AS DECIMAL(38,2))
            AS DOUBLE) / COUNT(*) AS avg_trailing
FROM trail
GROUP BY 1
ORDER BY order_month
""",
    doc="Trailing 90-day per-customer spend via a time-RANGE window "
    "frame (rangeBetween on a day ordinal — same-day peers share the "
    "frame in both engines), aggregated to per-month count / total / "
    "average of the trailing sums.",
)
def g15_trailing_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    spend = o.select(
        "o_custkey",
        "o_orderdate",
        F.datediff(
            F.col("o_orderdate"), F.lit(_G15_EPOCH).cast("date")
        ).alias("day_ord"),
        dec("o_totalprice", MONEY).alias("price"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_ord")
        .rangeBetween(-_G15_DAYS, 0)
    )
    trailing = spend.select(
        "o_orderdate",
        F.sum("price")
        .over(w)
        .cast("decimal(38,2)")
        .cast("double")
        .alias("trail_spend"),
    )
    return (
        trailing.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
        )
        .agg(
            F.count("*").alias("n_orders"),
            exact_sum(dec("trail_spend", "decimal(18,2)"), "trail_total"),
            (
                F.sum(dec("trail_spend", "decimal(18,2)"))
                .cast("decimal(38,2)")
                .cast("double")
                / F.count("*")
            ).alias("avg_trailing"),
        )
        .orderBy("order_month")
    )


# ---------------------------------------------------------------------------
# G16 — first-occurrence precedence census ("A before B" matrix)
#
# For every ordered pair of event types: among users who emitted both,
# how many saw their FIRST A strictly before their FIRST B, after, or
# at the same microsecond (tie)? The funnel-ordering diagnostic that
# doesn't assume a fixed funnel (f32 checks one ordered path; this
# scores all pairs). Shape: one (user, type) min-ts aggregate, then a
# self-join on user over the 5-type grain — 25× fan-out of a
# user-count-sized relation, broadcast-free equi-join.
#
# Scale: the per-user pivot is one shuffle on user_id; the pair join
# is user_id-co-partitioned with ≤ |types|² rows per user. Type
# domains are schema-bounded, so the fan-out constant is fixed.
# ---------------------------------------------------------------------------


@register(
    "g16_event_precedence",
    oracle="""
WITH firsts AS (
  SELECT user_id, event_type, MIN(ts) AS first_ts
  FROM events GROUP BY user_id, event_type
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       COUNT(*) AS n_users_both,
       CAST(SUM(CASE WHEN a.first_ts < b.first_ts THEN 1 ELSE 0 END)
            AS BIGINT) AS n_a_first,
       CAST(SUM(CASE WHEN a.first_ts > b.first_ts THEN 1 ELSE 0 END)
            AS BIGINT) AS n_b_first,
       CAST(SUM(CASE WHEN a.first_ts = b.first_ts THEN 1 ELSE 0 END)
            AS BIGINT) AS n_tie
FROM firsts a
JOIN firsts b ON b.user_id = a.user_id AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type
ORDER BY type_a, type_b
""",
    doc="First-occurrence precedence matrix: for each unordered event-"
    "type pair, counts of users whose first A precedes / follows / "
    "ties their first B — the assumption-free funnel-ordering census "
    "beside f32's fixed-path funnel.",
)
def g16_event_precedence(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts")
    )
    a = firsts.select(
        "user_id",
        F.col("event_type").alias("type_a"),
        F.col("first_ts").alias("ts_a"),
    )
    b = firsts.select(
        "user_id",
        F.col("event_type").alias("type_b"),
        F.col("first_ts").alias("ts_b"),
    )
    pairs = a.join(b, "user_id").filter(F.col("type_a") < F.col("type_b"))
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(
            F.count("*").alias("n_users_both"),
            F.sum(F.when(F.col("ts_a") < F.col("ts_b"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_a_first"),
            F.sum(F.when(F.col("ts_a") > F.col("ts_b"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_b_first"),
            F.sum(F.when(F.col("ts_a") == F.col("ts_b"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_tie"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# M8 — k-anonymity / l-diversity privacy audit
#
# The reference pipeline hashes PHI (B5) but never AUDITS the residual
# re-identification risk of the quasi-identifiers it keeps. Standard
# privacy metrics (Sweeney 2002; Machanavajjhala et al. 2007): group
# rows by the quasi-identifier tuple (market segment × account-balance
# band), then report, per group-size k: how many equivalence classes
# have that size, how many rows they cover, and the minimum
# l-diversity (distinct values of the sensitive attribute, nation)
# among them. Classes with k < 5 are the publishable-risk set.
#
# Scale: two hash aggregates (QI grain, then size grain) — the first
# shuffles on the QI tuple, the second on a tiny size domain. No
# windows, no joins.
# ---------------------------------------------------------------------------

_M8_BAND = 1000  # acctbal band width
_M8_K = 5  # publishable threshold


@register(
    "m8_k_anonymity",
    oracle=f"""
WITH classes AS (
  SELECT c_mktsegment,
         CAST(FLOOR(c_acctbal / {_M8_BAND}) AS BIGINT) AS bal_band,
         COUNT(*) AS k_size,
         COUNT(DISTINCT c_nationkey) AS l_div
  FROM customer
  GROUP BY c_mktsegment, CAST(FLOOR(c_acctbal / {_M8_BAND}) AS BIGINT)
)
SELECT k_size,
       COUNT(*) AS n_classes,
       CAST(SUM(k_size) AS BIGINT) AS n_rows,
       MIN(l_div) AS min_l_diversity,
       CASE WHEN k_size < {_M8_K} THEN 1 ELSE 0 END AS below_k
FROM classes
GROUP BY k_size
ORDER BY k_size
""",
    doc="k-anonymity / l-diversity audit: equivalence classes over the "
    "(market segment, balance band) quasi-identifier, censused by "
    "class size with minimum nation-diversity per size and a below-"
    "k=5 risk flag — the privacy gate beside B5's PHI hashing.",
)
def m8_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / _M8_BAND)
        .cast("bigint")
        .alias("bal_band"),
    ).agg(
        F.count("*").alias("k_size"),
        F.countDistinct("c_nationkey").alias("l_div"),
    )
    return (
        classes.groupBy("k_size")
        .agg(
            F.count("*").alias("n_classes"),
            F.sum("k_size").cast("bigint").alias("n_rows"),
            F.min("l_div").alias("min_l_diversity"),
        )
        .select(
            "k_size",
            "n_classes",
            "n_rows",
            "min_l_diversity",
            F.when(F.col("k_size") < _M8_K, 1).otherwise(0).alias("below_k"),
        )
        .orderBy("k_size")
    )


# ---------------------------------------------------------------------------
# G17 — RFM segmentation (three independent quintile cuts, one segment
#       census)
#
# The classic lifecycle scoring: Recency (days since last order at a
# fixed as-of constant), Frequency (order count), Monetary (lifetime
# exact-decimal spend), each cut into quintiles INDEPENDENTLY, then a
# census per (r,f,m) cell. Each quintile is a global NTILE over a
# data-sized customer relation — so each cut reuses operators/
# prefix.py's distributed rank (range repartition + broadcast
# offsets + the shared tile formula) instead of a single-partition
# NTILE window; three cuts = three range exchanges, the honest
# minimum for three different total orders. Tile orders are chosen so
# 5 always means "best" (most recent / most frequent / highest
# spend), with custkey as the total-order tiebreak in both engines.
# ---------------------------------------------------------------------------

_G17_ASOF = "2001-08-15"  # fixed as-of date (max order date + 2 weeks)


@register(
    "g17_rfm_segments",
    oracle=f"""
WITH cust AS (
  SELECT o_custkey,
         date_diff('day', MAX(o_orderdate), DATE '{_G17_ASOF}') AS recency,
         COUNT(*) AS freq,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
           AS monetary
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT o_custkey, monetary,
         NTILE(5) OVER (ORDER BY recency DESC, o_custkey) AS r_q,
         NTILE(5) OVER (ORDER BY freq ASC,    o_custkey) AS f_q,
         NTILE(5) OVER (ORDER BY monetary ASC, o_custkey) AS m_q
  FROM cust
)
SELECT r_q * 100 + f_q * 10 + m_q AS segment_code,
       COUNT(*) AS n_customers,
       CAST(CAST(SUM(monetary) AS DECIMAL(38,2)) AS DOUBLE) AS segment_value
FROM scored
GROUP BY r_q * 100 + f_q * 10 + m_q
ORDER BY segment_code
""",
    doc="RFM segmentation: recency/frequency/monetary quintiles via "
    "three distributed prefix-rank cuts (no single-partition NTILE), "
    "5 = best on every axis, censused per (r,f,m) segment code with "
    "exact-decimal segment value.",
)
def g17_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.operators.prefix import (
        ntile_from_rank,
        prefix_rank,
    )

    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(_G17_ASOF).cast("date"), F.max("o_orderdate")
        ).alias("recency"),
        F.count("*").alias("freq"),
        F.sum(dec("o_totalprice", MONEY))
        .cast("decimal(38,2)")
        .alias("monetary"),
    )

    def quintile(df, order, col):
        # pin each cut's input: the first is the orders scan+RFM
        # aggregate, the later ones re-derive the previous cut's
        # window+join — all nontrivial, all otherwise executed twice
        # by the range boundary sampling
        ranked = prefix_rank(
            df, order, rn_col="__rn", total_rows_col="__n", pin_input=True
        )
        return ranked.withColumn(
            col, ntile_from_rank(F.col("__rn"), F.col("__n"), 5)
        ).drop("__rn", "__n")

    scored = quintile(
        cust, [F.desc("recency"), F.asc("o_custkey")], "r_q"
    )
    scored = quintile(
        scored, [F.asc("freq"), F.asc("o_custkey")], "f_q"
    )
    scored = quintile(
        scored, [F.asc("monetary"), F.asc("o_custkey")], "m_q"
    )
    return (
        scored.groupBy(
            (
                F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q")
            ).alias("segment_code")
        )
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("monetary")
            .cast("decimal(38,2)")
            .cast("double")
            .alias("segment_value"),
        )
        .orderBy("segment_code")
    )


# ---------------------------------------------------------------------------
# F43 — cohort LTV curve (the monetary sibling of f10's retention)
#
# f10 counts how many of each cohort come back; finance wants how much
# they are WORTH over time: cumulative revenue per acquisition cohort
# at each age, divided by the cohort's size — the LTV curve that
# payback-period decisions read. Cohort = first-order year, age =
# months since that first order (integer month arithmetic, no
# date-diff rounding ambiguity). The cumulative window partitions by
# cohort over the month-age grain — both calendar-bounded, safe at
# any SF. Revenue stays exact DECIMAL through the running sum; the
# per-customer division divides identical doubles.
# ---------------------------------------------------------------------------


@register(
    "f43_cohort_ltv",
    oracle="""
WITH firsts AS (
  SELECT o_custkey,
         MIN(date_part('year', o_orderdate) * 12
             + date_part('month', o_orderdate)) AS first_m
  FROM orders GROUP BY o_custkey
), sized AS (
  SELECT first_m // 12 AS cohort_year, COUNT(*) AS n_customers
  FROM (SELECT o_custkey, CAST(first_m AS BIGINT) AS first_m FROM firsts) f
  GROUP BY first_m // 12
), aged AS (
  SELECT CAST(f.first_m // 12 AS BIGINT) AS cohort_year,
         CAST(date_part('year', o.o_orderdate) * 12
              + date_part('month', o.o_orderdate) - f.first_m AS BIGINT)
           AS age_months,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
           AS rev
  FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
  GROUP BY 1, 2
), curve AS (
  SELECT cohort_year, age_months,
         CAST(SUM(rev) OVER (PARTITION BY cohort_year ORDER BY age_months
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS DECIMAL(38,2)) AS cum_rev
  FROM aged
)
SELECT c.cohort_year, c.age_months, s.n_customers,
       CAST(c.cum_rev AS DOUBLE) AS cum_revenue,
       ROUND(CAST(c.cum_rev AS DOUBLE) / s.n_customers, 6)
         AS ltv_per_customer
FROM curve c JOIN sized s ON s.cohort_year = c.cohort_year
ORDER BY c.cohort_year, c.age_months
""",
    doc="Cohort LTV curve: cumulative exact-decimal revenue per first-"
    "order-year cohort at each integer month age, divided by cohort "
    "size — the monetary sibling of f10's retention; cohort-"
    "partitioned windows over the calendar-bounded age grain.",
)
def f43_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    month_idx = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast(
        "bigint"
    )
    firsts = o.groupBy("o_custkey").agg(F.min(month_idx).alias("first_m"))
    sized = firsts.groupBy(
        F.expr("first_m div 12").alias("cohort_year")
    ).agg(F.count("*").alias("n_customers"))
    aged = (
        o.join(firsts, "o_custkey")
        .groupBy(
            F.expr("first_m div 12").cast("bigint").alias("cohort_year"),
            (month_idx - F.col("first_m")).cast("bigint").alias("age_months"),
        )
        .agg(
            F.sum(dec("o_totalprice", MONEY))
            .cast("decimal(38,2)")
            .alias("rev")
        )
    )
    w = (
        Window.partitionBy("cohort_year")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = aged.select(
        "cohort_year",
        "age_months",
        F.sum("rev").over(w).cast("decimal(38,2)").alias("cum_rev"),
    )
    return (
        curve.join(F.broadcast(sized), "cohort_year")
        .select(
            "cohort_year",
            "age_months",
            "n_customers",
            F.col("cum_rev").cast("double").alias("cum_revenue"),
            F.round(
                F.col("cum_rev").cast("double") / F.col("n_customers"), 6
            ).alias("ltv_per_customer"),
        )
        .orderBy("cohort_year", "age_months")
    )


# ---------------------------------------------------------------------------
# G19 — segment-migration matrix (quintile transitions year over year)
#
# g17 scores customers once; retention teams watch how they MOVE: the
# 5×5 matrix of spend-quintile transitions between two fixed years.
# Each year's quintile is an independent distributed prefix-rank cut
# over that year's active customers (the g8/g17 operator — no
# single-partition NTILE), the two scorings join on the customer key,
# and each origin row is share-normalized. Diagonal mass = segment
# stability; below-diagonal = churn risk.
# ---------------------------------------------------------------------------

_G19_Y1, _G19_Y2 = 1999, 2000


@register(
    "g19_segment_migration",
    oracle=f"""
WITH spend AS (
  SELECT o_custkey, date_part('year', o_orderdate) AS yr,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
           AS spend
  FROM orders WHERE date_part('year', o_orderdate) IN ({_G19_Y1}, {_G19_Y2})
  GROUP BY 1, 2
), tiled AS (
  SELECT o_custkey, yr,
         NTILE(5) OVER (PARTITION BY yr ORDER BY spend, o_custkey) AS q
  FROM spend
), paired AS (
  SELECT a.o_custkey, a.q AS q_from, b.q AS q_to
  FROM tiled a JOIN tiled b
    ON b.o_custkey = a.o_custkey AND a.yr = {_G19_Y1} AND b.yr = {_G19_Y2}
), totals AS (
  SELECT q_from, COUNT(*) AS row_n FROM paired GROUP BY q_from
)
SELECT p.q_from AS q_from, p.q_to AS q_to,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(COUNT(*) AS DOUBLE) / t.row_n, 6) AS row_share
FROM paired p JOIN totals t ON t.q_from = p.q_from
GROUP BY p.q_from, p.q_to, t.row_n
ORDER BY p.q_from, p.q_to
""",
    doc="Segment-migration matrix: spend quintiles of 1999 vs 2000 "
    "(independent distributed prefix-rank cuts per year — the "
    "g8/g17 operator), joined per customer, row-share-normalized "
    "5×5 transition census.",
)
def g19_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.operators.prefix import (
        ntile_from_rank,
        prefix_rank,
    )

    o = table(spark, sf_dir, "orders")

    def year_tiles(year, q_col):
        spend = (
            o.filter(F.year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(
                F.sum(dec("o_totalprice", MONEY))
                .cast("decimal(38,2)")
                .alias("spend")
            )
        )
        ranked = prefix_rank(
            spend,
            [F.asc("spend"), F.asc("o_custkey")],
            rn_col="__rn",
            total_rows_col="__n",
            pin_input=True,  # per-year orders scan+agg would run 2x
        )
        return ranked.select(
            "o_custkey",
            ntile_from_rank(F.col("__rn"), F.col("__n"), 5).alias(q_col),
        )

    paired = year_tiles(_G19_Y1, "q_from").join(
        year_tiles(_G19_Y2, "q_to"), "o_custkey"
    )
    # Pinned: the 25-row migration matrix feeds the row-total broadcast
    # AND the final share join — unpinned, each re-executed BOTH year
    # cuts (two prefix windows + the customer join) end to end.
    counts = (
        paired.groupBy("q_from", "q_to")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .localCheckpoint(eager=True)
    )
    totals = counts.groupBy("q_from").agg(
        F.sum("n_customers").alias("row_n")
    )
    return (
        counts.join(F.broadcast(totals), "q_from")
        .select(
            "q_from",
            "q_to",
            "n_customers",
            F.round(
                F.col("n_customers").cast("double") / F.col("row_n"), 6
            ).alias("row_share"),
        )
        .orderBy("q_from", "q_to")
    )


# ---------------------------------------------------------------------------
# F47 — capture-recapture population estimate (Chapman estimator)
#
# The mark-recapture trick applied to warehouse coverage: treat two
# disjoint periods' active customers as capture samples; the Chapman
# estimator N̂ = (n1+1)(n2+1)/(m+1) − 1 then estimates the TRUE
# active population — including customers seen in neither period.
# The same arithmetic estimates corpus coverage from two crawl
# snapshots (the dedup-world use). Three distinct-count aggregates
# feed exact integer algebra; the estimate divides identical
# integer-derived doubles. The audit column compares N̂ to the
# directly-counted distinct population.
# ---------------------------------------------------------------------------

_F47_Y1, _F47_Y2 = 1997, 1998


@register(
    "f47_capture_recapture",
    oracle=f"""
WITH p1 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE date_part('year', o_orderdate) = {_F47_Y1}
), p2 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE date_part('year', o_orderdate) = {_F47_Y2}
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m
  FROM p1 JOIN p2 USING (o_custkey)
), stats AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM p1) AS n1,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM p2) AS n2,
         (SELECT m FROM m) AS m,
         (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
           AS n_true
)
SELECT n1, n2, m, n_true,
       ROUND(CAST((n1 + 1) AS DOUBLE) * (n2 + 1) / (m + 1) - 1, 4)
         AS chapman_estimate,
       ROUND((CAST((n1 + 1) AS DOUBLE) * (n2 + 1) / (m + 1) - 1) / n_true,
             6) AS estimate_ratio
FROM stats
""",
    doc="Chapman capture-recapture estimate of the active population "
    "from two disjoint yearly samples: N̂ = (n1+1)(n2+1)/(m+1) − 1 "
    "over exact distinct counts, audited against the directly "
    "counted total — the coverage-estimation trick for two crawl "
    "snapshots.",
)
def f47_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    p1 = (
        o.filter(F.year("o_orderdate") == _F47_Y1)
        .select("o_custkey")
        .distinct()
    )
    p2 = (
        o.filter(F.year("o_orderdate") == _F47_Y2)
        .select("o_custkey")
        .distinct()
    )
    n1 = p1.agg(F.count("*").cast("bigint").alias("n1"))
    n2 = p2.agg(F.count("*").cast("bigint").alias("n2"))
    m = p1.join(p2, "o_custkey").agg(
        F.count("*").cast("bigint").alias("m")
    )
    n_true = o.agg(
        F.countDistinct("o_custkey").cast("bigint").alias("n_true")
    )
    chapman = (
        (F.col("n1") + 1).cast("double")
        * (F.col("n2") + 1)
        / (F.col("m") + 1)
        - 1
    )
    return (
        n1.crossJoin(F.broadcast(n2))  # all sides 1-row scalars
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(n_true))
        .select(
            "n1",
            "n2",
            "m",
            "n_true",
            F.round(chapman, 4).alias("chapman_estimate"),
            F.round(chapman / F.col("n_true"), 6).alias("estimate_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# F50 — burstiness census of inter-event gaps
#
# g1 profiles gap MAGNITUDE; temporal-dynamics work (Goh & Barabási
# 2008) asks about gap SHAPE: B = (σ − μ)/(σ + μ) per user, −1 for
# metronome regularity, 0 for Poisson, → +1 for bursts. Gaps are
# exact integer SECONDS (µs div 10⁶), so per-user moments are BIGINT
# sums comfortably inside 2⁵³ (per-user event counts × gap² ≪ 9e15)
# and σ/μ divide identical integer-derived doubles. One user-
# partitioned LAG, one user-grain rollup, one census by burstiness
# band; users with < 3 gaps are excluded (σ undefined territory)
# identically in both engines.
# ---------------------------------------------------------------------------


@register(
    "f50_burstiness",
    oracle="""
WITH gaps AS (
  SELECT user_id,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS gap_s
  FROM events
), per_user AS (
  SELECT user_id, CAST(COUNT(gap_s) AS BIGINT) AS n,
         CAST(SUM(gap_s) AS BIGINT) AS s1,
         CAST(SUM(gap_s * gap_s) AS BIGINT) AS s2
  FROM gaps WHERE gap_s IS NOT NULL
  GROUP BY user_id HAVING COUNT(gap_s) >= 3
), scored AS (
  SELECT user_id,
         (SQRT(CAST(s2 AS DOUBLE) / n
               - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
          - CAST(s1 AS DOUBLE) / n)
         / (SQRT(CAST(s2 AS DOUBLE) / n
                 - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
            + CAST(s1 AS DOUBLE) / n) AS b
  FROM per_user
)
SELECT CASE WHEN b < -0.05 THEN 'regular'
            WHEN b <= 0.05 THEN 'poisson_like'
            ELSE 'bursty' END AS band,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(CAST(SUM(CAST(ROUND(b, 12) AS DECIMAL(38,12))) AS DOUBLE)
             / COUNT(*), 9) AS mean_burstiness
FROM scored
GROUP BY 1
ORDER BY band
""",
    doc="Burstiness census (Goh & Barabási): B = (σ−μ)/(σ+μ) of each "
    "user's integer-second inter-event gaps (BIGINT moments), "
    "censused into regular / poisson-like / bursty bands with a "
    "12dp-quantized mean — the gap-shape companion to g1's gap "
    "magnitudes.",
)
def f50_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.functions.datetime_ext import epoch_us

    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", epoch_us("ts").alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    gaps = e.select(
        "user_id",
        F.expr("(t - lag(t) over (partition by user_id order by t, event_id))"
               " div 1000000").alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    per_user = (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap_s").cast("bigint").alias("n"),
            F.sum("gap_s").cast("bigint").alias("s1"),
            F.sum(F.col("gap_s") * F.col("gap_s"))
            .cast("bigint")
            .alias("s2"),
        )
        .filter(F.col("n") >= 3)
    )
    mu = F.col("s1").cast("double") / F.col("n")
    sigma = F.sqrt(F.col("s2").cast("double") / F.col("n") - mu * mu)
    scored = per_user.select(((sigma - mu) / (sigma + mu)).alias("b"))
    band = (
        F.when(F.col("b") < -0.05, "regular")
        .when(F.col("b") <= 0.05, "poisson_like")
        .otherwise("bursty")
    )
    return (
        scored.groupBy(band.alias("band"))
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.round(
                F.sum(F.round(F.col("b"), 12).cast("decimal(38,12)")).cast(
                    "double"
                )
                / F.count("*"),
                9,
            ).alias("mean_burstiness"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# F56 — Nelson-Aalen cumulative hazard (f39's estimator-dual)
#
# Kaplan-Meier multiplies survival factors; Nelson-Aalen SUMS hazard
# increments d_j/n_j at each distinct event time (Nelson 1972, Aalen
# 1978) — the estimator epidemiology uses when the hazard itself (not
# survival) is the readout, plus its variance Σ d_j(n_j−d_j)/n_j³
# (Klein 1991). Same churn/censoring frame as f39 (shared constant, no
# now()); the Fleming-Harrington survival exp(−H) rides along as the
# cross-check against f39's product-limit curve.
#
# Cross-engine determinism: each increment is ONE IEEE division of
# identical integer-derived doubles, quantized to integer nano-units
# (hazard) / pico-units (variance) before the cumulative sum, so the
# running totals are order-free BIGINT arithmetic; the final /1e9,
# /1e12 and ROUND(EXP(−H), 9) follow f39's validated pattern.
#
# Scale: identical to f39 — one customer-grain shuffle, then every
# window runs over the DISTINCT TENURE DAYS grain (calendar-bounded,
# ~2.4k rows at any SF), never a data-sized relation.
# ---------------------------------------------------------------------------


@register(
    "f56_nelson_aalen",
    oracle=f"""
WITH cust AS (
  SELECT o_custkey,
         date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) AS tenure,
         CASE WHEN MAX(o_orderdate) < DATE '{_F39_CUTOFF}' THEN 1 ELSE 0 END
           AS churned
  FROM orders GROUP BY o_custkey
), grain AS (
  SELECT tenure, COUNT(*) AS at_t,
         CAST(SUM(churned) AS BIGINT) AS d
  FROM cust GROUP BY tenure
), risk AS (
  SELECT tenure, d,
         CAST(SUM(at_t) OVER (ORDER BY tenure DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT)
           AS n
  FROM grain
), na AS (
  SELECT tenure, d, n,
         CAST(SUM(CAST(ROUND(CAST(d AS DOUBLE) / n * 1e9) AS BIGINT))
              OVER (ORDER BY tenure
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS h_nano,
         CAST(SUM(CAST(ROUND(CAST(d AS DOUBLE) * (n - d) / n / n / n * 1e12)
                       AS BIGINT))
              OVER (ORDER BY tenure
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS v_pico
  FROM risk WHERE d > 0
)
SELECT tenure AS tenure_days, d AS n_events, n AS n_at_risk,
       CAST(h_nano AS DOUBLE) / 1e9 AS cum_hazard,
       CAST(v_pico AS DOUBLE) / 1e12 AS hazard_var,
       ROUND(EXP(-CAST(h_nano AS DOUBLE) / 1e9), 9) AS fh_survival
FROM na ORDER BY tenure_days
""",
    doc="Nelson-Aalen cumulative hazard over customer tenure (same "
    "churn frame as f39): nano-quantized d/n increments and pico-"
    "quantized d(n-d)/n^3 variance cumulated as BIGINTs over the "
    "distinct-tenure grain, with the Fleming-Harrington exp(-H) "
    "survival as the product-limit cross-check.",
)
def f56_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("tenure"),
        F.when(F.max("o_orderdate") < F.lit(_F39_CUTOFF).cast("date"), 1)
        .otherwise(0)
        .alias("churned"),
    )
    grain = cust.groupBy("tenure").agg(
        F.count("*").alias("at_t"),
        F.sum("churned").cast("bigint").alias("d"),
    )
    # Distinct-tenure grain: bounded by calendar days, safe to window.
    w_desc = Window.orderBy(F.desc("tenure")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = grain.select(
        "tenure", "d", F.sum("at_t").over(w_desc).alias("n")
    ).filter(F.col("d") > 0)
    w_asc = Window.orderBy("tenure").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d, n = F.col("d").cast("double"), F.col("n")
    h_inc = F.round(d / n * 1e9).cast("bigint")
    v_inc = F.round(d * (F.col("n") - F.col("d")) / n / n / n * 1e12).cast(
        "bigint"
    )
    na = risk.select(
        "tenure",
        "d",
        "n",
        F.sum(h_inc).over(w_asc).cast("bigint").alias("h_nano"),
        F.sum(v_inc).over(w_asc).cast("bigint").alias("v_pico"),
    )
    return na.select(
        F.col("tenure").alias("tenure_days"),
        F.col("d").alias("n_events"),
        F.col("n").alias("n_at_risk"),
        (F.col("h_nano").cast("double") / 1e9).alias("cum_hazard"),
        (F.col("v_pico").cast("double") / 1e12).alias("hazard_var"),
        F.round(F.exp(-F.col("h_nano").cast("double") / 1e9), 9).alias(
            "fh_survival"
        ),
    ).orderBy("tenure_days")


# ---------------------------------------------------------------------------
# G21 — interval-union coverage (merge overlapping activity windows)
#
# Each event opens a 30-minute activity interval; a user's true active
# time is the LENGTH OF THE UNION of those intervals — the classic
# overlap-merge primitive (enrollment overlap, on-call coverage,
# machine uptime) that naive SUM(length) double-counts. Islands are
# detected with the prefix-max-end sweep: an interval starts a new
# island iff its start exceeds the max end of ALL preceding intervals
# (rows frame ending at 1 PRECEDING), island id = running sum of the
# start flags — gaps-and-islands generalized from g10's unit-day grain
# to arbitrary-length microsecond intervals.
#
# Cross-engine determinism: all arithmetic is integer µs (epoch_us);
# the window order (ts, event_id) is a total order so both engines see
# identical frames. Census output is banded by whole coverage-hours —
# bounded rows regardless of SF.
#
# Scale: every window partitions by user_id; the island grouping
# reuses the same user_id exchange (Catalyst keeps the partitioning),
# and the final census is a tiny aggregate. No data-sized relation
# ever sorts in one task.
# ---------------------------------------------------------------------------

_G21_LEN_US = 30 * 60 * 1_000_000  # each event opens a 30-min interval


@register(
    "g21_interval_union_coverage",
    oracle=f"""
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
         epoch_us(ts) + {_G21_LEN_US} AS e
  FROM events
), mk AS (
  SELECT user_id, event_id, s, e,
         CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) IS NULL
                OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS ni
  FROM iv
), isl AS (
  SELECT user_id, s, e,
         SUM(ni) OVER (PARTITION BY user_id ORDER BY s, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM mk
), spans AS (
  SELECT user_id, island, MAX(e) - MIN(s) AS len_us
  FROM isl GROUP BY user_id, island
), per_user AS (
  SELECT user_id, COUNT(*) AS n_islands,
         CAST(SUM(len_us) AS BIGINT) AS coverage_us
  FROM spans GROUP BY user_id
)
SELECT CAST(coverage_us // 3600000000 AS BIGINT) AS coverage_hours_band,
       COUNT(*) AS n_users,
       CAST(SUM(n_islands) AS BIGINT) AS n_islands,
       CAST(SUM(coverage_us) AS BIGINT) AS total_coverage_us
FROM per_user
GROUP BY coverage_hours_band
ORDER BY coverage_hours_band
""",
    doc="Union-of-intervals coverage per user (30-min activity windows "
    "merged via the prefix-max-end island sweep), censused into whole-"
    "hour coverage bands: the overlap-merge primitive that SUM(length) "
    "double-counts, in exact integer microseconds.",
)
def g21_interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("s"),
        (epoch_us("ts") + F.lit(_G21_LEN_US)).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_end = F.max("e").over(w_prev)
    mk = iv.withColumn(
        "ni",
        F.when(prev_end.isNull() | (F.col("s") > prev_end), 1).otherwise(0),
    )
    isl = mk.select(
        "user_id", "s", "e", F.sum("ni").over(w_run).alias("island")
    )
    spans = isl.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("len_us")
    )
    per_user = spans.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.sum("len_us").cast("bigint").alias("coverage_us"),
    )
    return (
        per_user.groupBy(
            F.floor(F.col("coverage_us") / F.lit(3_600_000_000))
            .cast("bigint")
            .alias("coverage_hours_band")
        )
        .agg(
            F.count("*").alias("n_users"),
            F.sum("n_islands").cast("bigint").alias("n_islands"),
            F.sum("coverage_us").cast("bigint").alias("total_coverage_us"),
        )
        .orderBy("coverage_hours_band")
    )


# ---------------------------------------------------------------------------
# M12 — t-closeness privacy audit (Earth Mover's Distance over the
#       ordered sensitive attribute)
#
# The step after m8's k-anonymity/l-diversity: a class can be large
# (high k) and diverse (high l) yet still leak — if its SENSITIVE
# distribution differs sharply from the global one, membership alone
# is informative. t-closeness (Li et al. 2007) bounds the EMD between
# the class and global sensitive distributions; for an ordered
# attribute the EMD is the mean absolute CDF gap. Both CDFs are
# milli-quantized integer rationals (cum*1000 div n) before the
# comparison, so the statistic is exact and engine-identical. Scale
# shape: one aggregate to the (QI class × sensitive value) grain, a
# window partitioned BY CLASS for the class CDFs, the global CDF over
# the 25-value nation grain (bounded), broadcast back; top-k classes
# via TakeOrdered.
# ---------------------------------------------------------------------------

_M12_BAND = 1000  # same QI banding as m8
_M12_TOPK = 20


@register(
    "m12_t_closeness",
    oracle=f"""
WITH cv AS (
  SELECT c_mktsegment AS seg,
         CAST(FLOOR(c_acctbal / {_M12_BAND}) AS BIGINT) AS bal_band,
         c_nationkey AS v,
         COUNT(*) AS cnt
  FROM customer GROUP BY 1, 2, 3
), gv AS (
  SELECT c_nationkey AS v, COUNT(*) AS cnt FROM customer GROUP BY 1
), g_cdf AS (
  SELECT v,
         CAST(SUM(cnt) OVER (ORDER BY v) * 1000
              // (SUM(cnt) OVER ()) AS BIGINT) AS pg_milli
  FROM gv
), nv AS (
  SELECT COUNT(*) AS n_values FROM gv
), grid AS (
  -- densify: the class CDF must be evaluated at EVERY sensitive
  -- value, not only the ones the class contains — a sparse class
  -- carries its cumulative forward through absent values
  SELECT c.seg, c.bal_band, gv.v, COALESCE(cv.cnt, 0) AS cnt
  FROM (SELECT DISTINCT seg, bal_band FROM cv) c
  CROSS JOIN gv
  LEFT JOIN cv ON cv.seg = c.seg AND cv.bal_band = c.bal_band
             AND cv.v = gv.v
), class_cdf AS (
  SELECT seg, bal_band, v,
         CAST(SUM(cnt) OVER (PARTITION BY seg, bal_band ORDER BY v) * 1000
              // (SUM(cnt) OVER (PARTITION BY seg, bal_band)) AS BIGINT)
           AS pc_milli,
         SUM(cnt) OVER (PARTITION BY seg, bal_band) AS k_size
  FROM grid
)
SELECT seg, bal_band,
       CAST(MAX(k_size) AS BIGINT) AS k_size,
       CAST(SUM(ABS(pc_milli - pg_milli)) // (MAX(n_values) - 1) AS BIGINT)
         AS t_milli
FROM class_cdf JOIN g_cdf USING (v) CROSS JOIN nv
GROUP BY seg, bal_band
ORDER BY t_milli DESC, seg, bal_band
LIMIT {_M12_TOPK}
""",
    doc="t-closeness audit over m8's QI classes: milli-quantized CDF "
    "gap (ordered EMD) between each class's nation distribution and "
    "the global one — classes ranked by leakage; class CDFs from a "
    "class-partitioned window, global CDF on the bounded nation "
    f"grain, top-{_M12_TOPK} TakeOrdered.",
)
def m12_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    cv = c.groupBy(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / _M12_BAND).cast("bigint").alias("bal_band"),
        F.col("c_nationkey").alias("v"),
    ).agg(F.count("*").alias("cnt"))
    gv = c.groupBy(F.col("c_nationkey").alias("v")).agg(
        F.count("*").alias("cnt")
    )
    # densify the (class x sensitive-value) grid: a sparse class must
    # still contribute a CDF point at every value (cumulative carried
    # through absences), or its EMD is undercounted. The value
    # relation is nation-grain (25 rows) — broadcast cross join.
    grid = (
        cv.select("seg", "bal_band")
        .distinct()
        .crossJoin(F.broadcast(gv.select("v")))
        .join(cv, ["seg", "bal_band", "v"], "left")
        .select(
            "seg", "bal_band", "v", F.coalesce("cnt", F.lit(0)).alias("cnt")
        )
    )
    w_cls = Window.partitionBy("seg", "bal_band").orderBy("v")
    w_cls_all = Window.partitionBy("seg", "bal_band")
    class_cdf = grid.select(
        "seg",
        "bal_band",
        "v",
        (F.sum("cnt").over(w_cls) * 1000)
        .cast("bigint")
        .alias("_cum_scaled"),
        F.sum("cnt").over(w_cls_all).alias("k_size"),
    ).select(
        "seg",
        "bal_band",
        "v",
        F.expr("_cum_scaled div k_size").cast("bigint").alias("pc_milli"),
        "k_size",
    )
    # nation grain: 25 rows at any scale — bounded global window
    w_g = Window.orderBy("v")
    w_g_all = Window.partitionBy()
    g_cdf = gv.select(
        "v",
        (F.sum("cnt").over(w_g) * 1000).cast("bigint").alias("_cum_scaled"),
        F.sum("cnt").over(w_g_all).alias("_n"),
    ).select(
        "v", F.expr("_cum_scaled div _n").cast("bigint").alias("pg_milli")
    )
    nv = gv.agg(F.count("*").alias("n_values"))
    return (
        class_cdf.join(F.broadcast(g_cdf), "v")
        .crossJoin(F.broadcast(nv))
        .groupBy("seg", "bal_band")
        .agg(
            F.max("k_size").cast("bigint").alias("k_size"),
            F.expr(
                "cast(sum(abs(pc_milli - pg_milli)) div (max(n_values) - 1) "
                "as bigint)"
            ).alias("t_milli"),
        )
        .orderBy(F.desc("t_milli"), "seg", "bal_band")
        .limit(_M12_TOPK)
    )
