"""Registry queries for the parameterized report-handler families
added in round 2 (reference endpoints: geographic
core/app.py:3229-3284, household scatter :4446-4463, touchpoints
:3537-3596, service pathways :4027-4056).

Each query expresses the handler's operator pattern over the synthetic
star schema so the driver's DuckDB differential gate can score it; the
healthcare-schema handlers themselves (reports/handlers.py) reuse the
same plan shapes and are fixture-tested.

Scale shapes: every pattern here pre-aggregates per-key counts before
joining back onto the spine (small shuffle payloads), keeps distinct
counts on single keys, and bounds output with HAVING/top-k — the same
discipline as the rest of the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calaveras_uniteus_etl_spark.functions.datetime_ext import julian_day_diff
from calaveras_uniteus_etl_spark.plans.catalog import register
from calaveras_uniteus_etl_spark.plans.tables import table

# ---------------------------------------------------------------------------
# R1 — geographic rollup (cases-by-location shape): dimension hierarchy
# as "location", COUNT(DISTINCT fact-id), top-15.
# ---------------------------------------------------------------------------


@register(
    "r1_cases_by_location",
    oracle="""
SELECT n_name AS city, r_name AS state,
       COUNT(DISTINCT o_orderkey) AS case_count
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
JOIN orders ON o_custkey = c_custkey
WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
GROUP BY n_name, r_name
ORDER BY case_count DESC, city, state
LIMIT 15
""",
    doc="Geographic rollup: location hierarchy join, COUNT(DISTINCT "
    "case), date filter on the fact, top-15 (cases-by-location "
    "endpoint shape, core/app.py:3229-3284).",
)
def r1_cases_by_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("city"), F.col("r_name").alias("state"))
        .agg(F.countDistinct("o_orderkey").alias("case_count"))
        .orderBy(F.desc("case_count"), "city", "state")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# R2 — household scatter shape: per-entity count, CASE bucket over the
# count, then per-bucket rollup (two-level aggregation).
# ---------------------------------------------------------------------------

_R2_BUCKET_SQL = """CASE
  WHEN order_count = 0 THEN 'Unknown'
  WHEN order_count = 1 THEN '1 order'
  WHEN order_count BETWEEN 2 AND 3 THEN '2-3 orders'
  WHEN order_count BETWEEN 4 AND 5 THEN '4-5 orders'
  ELSE '6+ orders' END"""


@register(
    "r2_household_scatter",
    oracle=f"""
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS order_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
SELECT {_R2_BUCKET_SQL} AS category,
       CAST(SUM(order_count) AS BIGINT) AS case_count,
       COUNT(*) AS client_count
FROM per_cust
GROUP BY category
ORDER BY case_count DESC, category
""",
    doc="Household-scatter shape: per-customer order count, CASE "
    "bucket over the count, per-bucket case/client rollup "
    "(core/app.py:4446-4463).",
)
def r2_household_scatter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    n = F.col("order_count")
    bucket = (
        F.when(n == 0, "Unknown")
        .when(n == 1, "1 order")
        .when(n.between(2, 3), "2-3 orders")
        .when(n.between(4, 5), "4-5 orders")
        .otherwise("6+ orders")
    )
    return (
        per_cust.groupBy(bucket.alias("category"))
        .agg(
            F.sum("order_count").alias("case_count"),
            F.count("*").alias("client_count"),
        )
        .orderBy(F.desc("case_count"), "category")
    )


# ---------------------------------------------------------------------------
# R3 — touchpoints: spine LEFT JOIN three pre-aggregated per-key
# counters; AVG skips the NULLs the joins introduce.
# ---------------------------------------------------------------------------


@register(
    "r3_touchpoint_averages",
    oracle="""
WITH oc AS (
  SELECT o_custkey AS k, COUNT(*) AS order_count FROM orders GROUP BY o_custkey
), lc AS (
  SELECT o_custkey AS k, COUNT(*) AS lineitem_count
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_custkey
), ec AS (
  SELECT user_id AS k, COUNT(*) AS event_count FROM events GROUP BY user_id
)
SELECT COUNT(DISTINCT c_custkey) AS total_clients,
       AVG(order_count) AS avg_orders_per_client,
       AVG(lineitem_count) AS avg_lineitems_per_client,
       AVG(event_count) AS avg_events_per_client
FROM customer
LEFT JOIN oc ON oc.k = c_custkey
LEFT JOIN lc ON lc.k = c_custkey
LEFT JOIN ec ON ec.k = c_custkey
""",
    doc="Touchpoint averages: customer spine LEFT JOIN three "
    "pre-aggregated per-key counters, AVG over present counts only "
    "(core/app.py:3537-3560).",
)
def r3_touchpoint_averages(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    e = table(spark, sf_dir, "events")
    oc = o.groupBy(F.col("o_custkey").alias("oc_k")).agg(
        F.count("*").alias("order_count")
    )
    lc = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("lc_k"))
        .agg(F.count("*").alias("lineitem_count"))
    )
    ec = e.groupBy(F.col("user_id").alias("ec_k")).agg(
        F.count("*").alias("event_count")
    )
    return (
        c.join(oc, c.c_custkey == F.col("oc_k"), "left")
        .join(lc, c.c_custkey == F.col("lc_k"), "left")
        .join(ec, c.c_custkey == F.col("ec_k"), "left")
        .agg(
            F.countDistinct("c_custkey").alias("total_clients"),
            F.avg("order_count").alias("avg_orders_per_client"),
            F.avg("lineitem_count").alias("avg_lineitems_per_client"),
            F.avg("event_count").alias("avg_events_per_client"),
        )
    )


@register(
    "r3_touchpoint_distribution",
    oracle="""
WITH oc AS (
  SELECT o_custkey AS k, COUNT(*) AS order_count FROM orders GROUP BY o_custkey
), ec AS (
  SELECT user_id AS k, COUNT(*) AS event_count FROM events GROUP BY user_id
), totals AS (
  SELECT c_custkey,
         COALESCE(order_count, 0) + COALESCE(event_count, 0) AS total_touchpoints
  FROM customer
  LEFT JOIN oc ON oc.k = c_custkey
  LEFT JOIN ec ON ec.k = c_custkey
)
SELECT CASE
         WHEN total_touchpoints = 0 THEN '0'
         WHEN total_touchpoints = 1 THEN '1'
         WHEN total_touchpoints BETWEEN 2 AND 3 THEN '2-3'
         WHEN total_touchpoints BETWEEN 4 AND 6 THEN '4-6'
         WHEN total_touchpoints BETWEEN 7 AND 10 THEN '7-10'
         ELSE '10+' END AS touchpoint_range,
       CAST(MIN(CASE
         WHEN total_touchpoints = 0 THEN 0
         WHEN total_touchpoints = 1 THEN 1
         WHEN total_touchpoints BETWEEN 2 AND 3 THEN 2
         WHEN total_touchpoints BETWEEN 4 AND 6 THEN 3
         WHEN total_touchpoints BETWEEN 7 AND 10 THEN 4
         ELSE 5 END) AS INT) AS bucket_order,
       COUNT(*) AS client_count
FROM totals
GROUP BY touchpoint_range
ORDER BY bucket_order
""",
    doc="Touchpoint histogram: per-client total engagement bucketed "
    "into ranges with custom bucket ordering (core/app.py:3563-3596).",
)
def r3_touchpoint_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    e = table(spark, sf_dir, "events")
    oc = o.groupBy(F.col("o_custkey").alias("oc_k")).agg(
        F.count("*").alias("order_count")
    )
    ec = e.groupBy(F.col("user_id").alias("ec_k")).agg(
        F.count("*").alias("event_count")
    )
    total = F.coalesce("order_count", F.lit(0)) + F.coalesce("event_count", F.lit(0))
    ranges = ((0, 0, "0", 0), (1, 1, "1", 1), (2, 3, "2-3", 2),
              (4, 6, "4-6", 3), (7, 10, "7-10", 4))
    bucket = F.lit("10+")
    order = F.lit(5)
    for lo, hi, label, pos in reversed(ranges):
        bucket = F.when(total.between(lo, hi), label).otherwise(bucket)
        order = F.when(total.between(lo, hi), pos).otherwise(order)
    return (
        c.join(oc, c.c_custkey == F.col("oc_k"), "left")
        .join(ec, c.c_custkey == F.col("ec_k"), "left")
        .groupBy(bucket.alias("touchpoint_range"))
        .agg(
            F.min(order).cast("int").alias("bucket_order"),
            F.count("*").alias("client_count"),
        )
        .orderBy("bucket_order")
    )


# ---------------------------------------------------------------------------
# R4 — service pathways: fact⋈fact on the case key with a strict
# temporal-order predicate, HAVING floor, avg day-gap, top-20.
# ---------------------------------------------------------------------------


@register(
    "r4_service_pathways",
    oracle="""
SELECT o_orderpriority AS initial_service,
       l_returnflag AS referral_service,
       COUNT(*) AS pathway_count,
       ROUND(SUM((epoch_us(l_shipdate) - epoch_us(o_orderdate)) / 86400e6)
             / COUNT(*), 1) AS avg_days_between
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate
GROUP BY o_orderpriority, l_returnflag
HAVING COUNT(*) >= 2
ORDER BY pathway_count DESC, initial_service, referral_service
LIMIT 20
""",
    doc="Service-pathway edges: join on the case key, referral "
    "strictly after creation, HAVING count>=2, ROUND(avg day gap, 1), "
    "top-20 (core/app.py:4027-4056).",
)
def r4_service_pathways(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    gap = julian_day_diff("l_shipdate", "o_orderdate")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy(
            F.col("o_orderpriority").alias("initial_service"),
            F.col("l_returnflag").alias("referral_service"),
        )
        .agg(
            F.count("*").alias("pathway_count"),
            F.round(F.sum(gap) / F.count("*"), 1).alias("avg_days_between"),
        )
        .filter(F.col("pathway_count") >= 2)
        .orderBy(F.desc("pathway_count"), "initial_service", "referral_service")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# R6 — provider performance: per-provider multi-COUNT(DISTINCT CASE)
# status split + resolution-day stats + completion rate, HAVING floor,
# (volume, avg-days) ordering, top-20 — the provider-performance
# endpoint shape (core/app.py:4211-4288). The day stats sum exact
# integer microsecond gaps (BIGINT) and convert once at the end, so
# the averages are bit-identical across engines; NULL avg (no
# fulfilled orders) sorts last on both sides.
# ---------------------------------------------------------------------------


@register(
    "r6_provider_performance",
    oracle="""
SELECT l_suppkey AS provider,
       COUNT(DISTINCT l_orderkey) AS total_orders,
       COUNT(DISTINCT o_custkey) AS unique_customers,
       COUNT(DISTINCT CASE WHEN o_orderstatus = 'O' THEN l_orderkey END)
         AS open_orders,
       COUNT(DISTINCT CASE WHEN o_orderstatus = 'P' THEN l_orderkey END)
         AS partial_orders,
       COUNT(DISTINCT CASE WHEN o_orderstatus = 'F' THEN l_orderkey END)
         AS fulfilled_orders,
       ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'F'
                      THEN epoch_us(l_shipdate) - epoch_us(o_orderdate) END)
                  AS DOUBLE) / 86400e6
             / COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END), 1) AS avg_days,
       ROUND(CAST(MIN(CASE WHEN o_orderstatus = 'F'
                      THEN epoch_us(l_shipdate) - epoch_us(o_orderdate) END)
                  AS DOUBLE) / 86400e6, 1) AS min_days,
       ROUND(CAST(MAX(CASE WHEN o_orderstatus = 'F'
                      THEN epoch_us(l_shipdate) - epoch_us(o_orderdate) END)
                  AS DOUBLE) / 86400e6, 1) AS max_days,
       ROUND(COUNT(DISTINCT CASE WHEN o_orderstatus = 'F' THEN l_orderkey END)
             * 100.0 / COUNT(DISTINCT l_orderkey), 1) AS completion_rate
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY l_suppkey
HAVING COUNT(DISTINCT l_orderkey) >= 5
ORDER BY total_orders DESC, avg_days ASC, provider
LIMIT 20
""",
    doc="Provider-performance shape: per-supplier multi-distinct "
    "status split, exact-integer day-gap stats, completion rate, "
    "HAVING floor, (volume, avg-days, key) top-20 "
    "(core/app.py:4211-4288).",
)
def r6_provider_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"
    )
    # parquet timestamps arrive as TIMESTAMP_NTZ; the cast matches
    # julian_day_diff's contract (session TZ differences cancel in the
    # subtraction) and keeps the gap an exact integer microsecond count
    gap_us = F.unix_micros(F.col("l_shipdate").cast("timestamp")) - F.unix_micros(
        F.col("o_orderdate").cast("timestamp")
    )
    f_gap = F.when(F.col("o_orderstatus") == "F", gap_us)

    # The direct translation is a 5-way COUNT(DISTINCT CASE ...) — a
    # 5x Expand over the joined fact feeding the aggregation shuffle.
    # Every distinct is keyed on l_orderkey, and status/custkey are
    # CONSTANT per order, so pre-aggregating the join output to the
    # (provider, order) grain first makes them plain conditional
    # counts; the per-order gap stats (sum/count/min/max over lineitem
    # rows) re-aggregate losslessly because sum-of-sums, min-of-mins
    # etc. The one remaining distinct (unique customers) plans as a
    # two-level aggregate — no Expand anywhere, and the agg shuffle
    # carries order-grain rows once instead of ~5x.
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_suppkey").alias("provider"),
            F.col("l_orderkey").alias("order_id"),
        )
        .agg(
            F.first("o_custkey").alias("custkey"),
            F.first("o_orderstatus").alias("status"),
            F.sum(f_gap).alias("gap_sum"),
            F.count(f_gap).alias("gap_n"),
            F.min(f_gap).alias("gap_min"),
            F.max(f_gap).alias("gap_max"),
        )
    )

    def n_if(status: str, alias: str):
        return (
            F.count(F.when(F.col("status") == status, F.lit(1)))
            .alias(alias)
        )

    total = F.count("*")
    fulfilled = F.count(F.when(F.col("status") == "F", F.lit(1)))
    return (
        per_order.groupBy("provider")
        .agg(
            total.alias("total_orders"),
            F.countDistinct("custkey").alias("unique_customers"),
            n_if("O", "open_orders"),
            n_if("P", "partial_orders"),
            n_if("F", "fulfilled_orders"),
            F.round(
                F.sum("gap_sum").cast("double") / 86400e6 / F.sum("gap_n"),
                1,
            ).alias("avg_days"),
            F.round(F.min("gap_min").cast("double") / 86400e6, 1).alias(
                "min_days"
            ),
            F.round(F.max("gap_max").cast("double") / 86400e6, 1).alias(
                "max_days"
            ),
            F.round(fulfilled * 100.0 / total, 1).alias("completion_rate"),
        )
        .filter(F.col("total_orders") >= 5)
        .orderBy(
            F.desc("total_orders"), F.asc_nulls_last("avg_days"), F.asc("provider")
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# R7 — demographic-correlation matrix shape: fact LEFT JOIN dimension,
# two-dimensional GROUP BY, COUNT(DISTINCT fact-id) per cell
# (core/app.py:4621-4712 age/gender-by-service, race-by-outcome).
# The grouping keys are low-cardinality, so the matrix itself is tiny;
# the only shuffle that scales with data is the join on the customer
# key, which AQE plans (no broadcast hint: the customer dimension
# scales with SF in TPC-H, unlike nation/region).
# ---------------------------------------------------------------------------


@register(
    "r7_correlation_matrix",
    oracle="""
SELECT o_orderpriority AS service,
       COALESCE(c_mktsegment, 'Unknown') AS segment,
       COUNT(DISTINCT o_orderkey) AS case_count
FROM orders LEFT JOIN customer ON c_custkey = o_custkey
GROUP BY service, segment
ORDER BY service, segment
""",
    doc="Correlation-matrix shape: fact LEFT JOIN dimension, two-dim "
    "GROUP BY with COUNT(DISTINCT fact-id), NULL dimension → "
    "'Unknown' (demographic-correlations endpoint, "
    "core/app.py:4621-4712).",
)
def r7_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .groupBy(
            F.col("o_orderpriority").alias("service"),
            F.coalesce(F.col("c_mktsegment"), F.lit("Unknown")).alias(
                "segment"
            ),
        )
        .agg(F.countDistinct("o_orderkey").alias("case_count"))
        .orderBy("service", "segment")
    )


# ---------------------------------------------------------------------------
# R8 — share-mix shape (reports/handlers.py:shares_by_method): two-key
# group with percent-of-total. The share analog on the synthetic star:
# method := event_type, language := a JSON-prop-derived bucket. The
# pct divides two exact counts (IEEE-deterministic, f8 discipline) and
# the total comes from an empty-frame window — the result is already
# aggregate-sized (|methods| x |languages| rows), so the single-
# partition window is constant cost, same as the handler.
# ---------------------------------------------------------------------------

_R8_LANG_SQL = """CASE CAST(json_extract(props, '$.k') AS BIGINT) % 3
  WHEN 0 THEN 'en' WHEN 1 THEN 'es' ELSE 'other' END"""


@register(
    "r8_share_mix",
    oracle=f"""
WITH counts AS (
  SELECT event_type AS method,
         {_R8_LANG_SQL} AS language,
         COUNT(*) AS share_count
  FROM events
  GROUP BY method, language
)
SELECT method, language, share_count,
       ROUND(share_count * 100.0 / SUM(share_count) OVER (), 1)
         AS pct_of_total
FROM counts
ORDER BY share_count DESC, method, language
""",
    doc="Share-mix report shape (shares_by_method handler): "
    "method x language counts + percent-of-total over an "
    "aggregate-sized window (resource_list_shares analytics; tables "
    "core/database_schema.py:310-360).",
)
def r8_share_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    k = F.get_json_object("props", "$.k").cast("long")
    lang = (
        F.when(k % 3 == 0, "en").when(k % 3 == 1, "es").otherwise("other")
    )
    counts = (
        table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("method"), lang.alias("language")
        )
        .agg(F.count("*").alias("share_count"))
    )
    return counts.select(
        "method",
        "language",
        "share_count",
        F.round(
            F.col("share_count")
            * 100.0
            / F.sum("share_count").over(Window.partitionBy()),
            1,
        ).alias("pct_of_total"),
    ).orderBy(F.desc("share_count"), "method", "language")


# ---------------------------------------------------------------------------
# R5 — workforce workload distribution
# (reference: core/app.py:3349-3410, /api/reports/workforce/employee-workload)
#
# The reference's shape verbatim: entity LEFT JOIN work items,
# conditional-CASE counts for "active" and "resolved", a derived
# 1dp resolution-rate percentage, HAVING total > 0, and a two-key
# DESC ORDER with LIMIT 20 (→ TakeOrderedAndProject). Employees map
# to suppliers, cases to their lineitems: active = open-status lines,
# resolved = returned flag. The percentage divides exact BIGINTs and
# rounds once, as the endpoint does with round(..., 1).
# ---------------------------------------------------------------------------


@register(
    "r5_employee_workload",
    oracle="""
SELECT s.s_name AS employee_name,
       n.n_name AS provider,
       CAST(COUNT(CASE WHEN l.l_linestatus = 'O' THEN 1 END) AS BIGINT)
         AS active_cases,
       CAST(COUNT(l.l_orderkey) AS BIGINT) AS total_cases,
       CAST(COUNT(CASE WHEN l.l_returnflag = 'R' THEN 1 END) AS BIGINT)
         AS resolved_cases,
       ROUND(CAST(COUNT(CASE WHEN l.l_returnflag = 'R' THEN 1 END)
                  AS DOUBLE) * 100
             / COUNT(l.l_orderkey), 1) AS resolution_rate
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
LEFT JOIN lineitem l ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_suppkey, s.s_name, n.n_name
HAVING COUNT(l.l_orderkey) > 0
ORDER BY active_cases DESC, total_cases DESC, employee_name
LIMIT 20
""",
    doc="Workforce workload (reference core/app.py:3349-3410): "
    "supplier LEFT JOIN lineitems with conditional active/resolved "
    "counts, 1dp resolution rate, HAVING total > 0, two-key DESC "
    "top-20 via TakeOrderedAndProject; name tiebreak added for a "
    "total order.",
)
def r5_employee_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    l = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linestatus", "l_returnflag"
    )
    resolved = F.count(F.when(F.col("l_returnflag") == "R", 1))
    total = F.count("l_orderkey")
    return (
        s.join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(l, l.l_suppkey == s.s_suppkey, "left")
        .groupBy(
            "s_suppkey",
            F.col("s_name").alias("employee_name"),
            F.col("n_name").alias("provider"),
        )
        .agg(
            F.count(F.when(F.col("l_linestatus") == "O", 1))
            .cast("bigint")
            .alias("active_cases"),
            total.cast("bigint").alias("total_cases"),
            resolved.cast("bigint").alias("resolved_cases"),
            F.round(resolved.cast("double") * 100 / total, 1).alias(
                "resolution_rate"
            ),
        )
        .filter(F.col("total_cases") > 0)
        .drop("s_suppkey")
        .orderBy(
            F.desc("active_cases"),
            F.desc("total_cases"),
            F.asc("employee_name"),
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# R9 — quarterly business review (multi-metric rollup)
#
# The reference's dashboard endpoints each return one metric per call
# (core/app.py:3229-3284 and siblings); a QBR wants them TOGETHER on
# one grain. Per calendar quarter: exact-decimal revenue, order count,
# distinct active customers, average order value (exact sum / count),
# and the urgent-order share — one pass over the fact, one hash
# aggregate on the bounded quarter grain. Quarter keys are integer
# year·10 + q (engine-neutral; no to_char formatting differences).
# ---------------------------------------------------------------------------


@register(
    "r9_quarterly_review",
    oracle="""
SELECT CAST(year(o_orderdate) * 10 + quarter(o_orderdate) AS BIGINT)
         AS yq,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                 AS DECIMAL(38,2)) AS DOUBLE) AS revenue,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
         AS avg_order_value,
       ROUND(CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
         AS urgent_share
FROM orders
GROUP BY 1
ORDER BY yq
""",
    doc="Quarterly business review: revenue (exact decimal), order "
    "count, distinct active customers, average order value and "
    "urgent share on the bounded quarter grain — the one-call QBR "
    "rollup over the reference's per-metric dashboard endpoints "
    "(core/app.py:3229-3284).",
)
def r9_quarterly_review(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.plans import _exact as X

    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            (
                F.year("o_orderdate") * 10 + F.quarter("o_orderdate")
            )
            .cast("bigint")
            .alias("yq")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
            X.exact_sum(X.dec("o_totalprice"), "revenue"),
            X.exact_avg(X.dec("o_totalprice"), F.lit(1), "avg_order_value"),
            F.round(
                F.sum(
                    F.when(F.col("o_orderpriority") == "1-URGENT", 1)
                    .otherwise(0)
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("urgent_share"),
        )
        .orderBy("yq")
    )
