"""Join operator inventory (SURVEY.md §2.E).

All reference joins are equi-joins on keys plus one range-predicate
join (E5) and one pair-edge aggregation (E8). Physical strategy is left
to Catalyst/AQE: dimension sides are hinted with ``broadcast()`` where
they are broadcast-sized at any realistic scale factor, fact-fact joins
shuffle on their keys (sort-merge with AQE skew handling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from calaveras_uniteus_etl_spark.functions.datetime_ext import (
    epoch_us,
    julian_day_diff,
)
from calaveras_uniteus_etl_spark.plans import _exact as X
from calaveras_uniteus_etl_spark.plans.catalog import register
from calaveras_uniteus_etl_spark.plans.tables import table

# ---------------------------------------------------------------------------
# E1 — dimension ⋈ fact INNER join + aggregate
#      (reference people⋈cases: core/reports/handlers.py:276,317,357)
# ---------------------------------------------------------------------------


@register(
    "e1_inner_join_agg",
    oracle="""
SELECT c_mktsegment AS segment,
       COUNT(*) AS order_count,
       COUNT(DISTINCT c_custkey) AS unique_customers,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
            AS DOUBLE) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
""",
    doc="INNER equi-join dimension→fact, grouped rollup (broadcast-hash).",
)
def e1_inner_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        F.broadcast(c)
        .join(o, c.c_custkey == o.o_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("order_count"),
            F.countDistinct("c_custkey").alias("unique_customers"),
            X.exact_sum(X.dec("o_totalprice"), "revenue"),
        )
    )


# ---------------------------------------------------------------------------
# E2 — LEFT join preserving unmatched dimension rows
#      (reference cases⟕employees workload: core/database_schema.py:431-441)
# ---------------------------------------------------------------------------


@register(
    "e2_left_join_preserve",
    oracle="""
SELECT c_custkey AS custkey,
       COUNT(o_orderkey) AS order_count,
       CAST(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0)
                 AS DECIMAL(38,2)) AS DOUBLE) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
    doc="LEFT join keeps zero-order customers (COUNT(col) skips NULLs).",
)
def e2_left_join_preserve(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(F.col("c_custkey").alias("custkey"))
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.coalesce(
                F.sum(X.dec("o_totalprice")).cast("decimal(38,2)"),
                F.lit(0).cast("decimal(38,2)"),
            )
            .cast("double")
            .alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# E3 — chained multi-table join (reference referrals⟕cases⟕people views:
#      core/database_schema.py:415-429)
# ---------------------------------------------------------------------------


@register(
    "e3_chain_join",
    oracle="""
SELECT r_name AS region, n_name AS nation,
       COUNT(*) AS order_count,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
            AS DOUBLE) AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
GROUP BY r_name, n_name
""",
    doc="4-table chained equi-join up a dimension hierarchy.",
)
def e3_chain_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("order_count"),
            X.exact_sum(X.dec("o_totalprice"), "revenue"),
        )
    )


# ---------------------------------------------------------------------------
# E4 — left-join chain + single-row multi-DISTINCT funnel
#      (reference ar⟕cases⟕referrals: core/app.py:4557-4577)
# ---------------------------------------------------------------------------


@register(
    "e4_multi_distinct_funnel",
    oracle="""
SELECT COUNT(DISTINCT c.c_custkey) AS customers,
       COUNT(DISTINCT o.o_orderkey) AS orders,
       COUNT(DISTINCT l.l_partkey) AS parts
FROM customer c
LEFT JOIN orders   o ON o.o_custkey = c.c_custkey
LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
""",
    doc="Two LEFT joins feeding one multi-COUNT(DISTINCT) row.",
)
def e4_multi_distinct_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .join(li, li.l_orderkey == o.o_orderkey, "left")
        .agg(
            F.countDistinct("c_custkey").alias("customers"),
            F.countDistinct("o_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
        )
    )


# ---------------------------------------------------------------------------
# E5 — equi-join with additional range predicate
#      (reference service pathways: core/app.py:4027-4043,
#       'r.referral_created_at > c.case_created_at' + avg julianday gap)
# ---------------------------------------------------------------------------


@register(
    "e5_range_predicate_join",
    oracle="""
SELECT o.o_orderpriority AS priority,
       COUNT(*) AS n,
       ROUND(SUM((epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) / 86400e6)
             / COUNT(*), 1) AS avg_gap_days
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
               AND l.l_shipdate > o.o_orderdate
GROUP BY o.o_orderpriority
""",
    doc="Equi-join + range predicate, fractional-day average gap.",
)
def e5_range_predicate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    gap = julian_day_diff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(gap) / F.count("*"), 1).alias("avg_gap_days"),
        )
    )


# ---------------------------------------------------------------------------
# E6 — join to pre-aggregated derived tables
#      (reference touchpoints: core/app.py:3537-3596)
# ---------------------------------------------------------------------------


@register(
    "e6_preagg_join",
    oracle="""
WITH order_stats AS (
  SELECT o_custkey, COUNT(*) AS order_count,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS spend
  FROM orders GROUP BY o_custkey
),
open_stats AS (
  SELECT o_custkey, COUNT(*) AS open_count
  FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
)
SELECT c.c_custkey AS custkey,
       COALESCE(os.order_count, 0) AS order_count,
       CAST(COALESCE(os.spend, 0) AS DOUBLE) AS spend,
       COALESCE(op.open_count, 0) AS open_count
FROM customer c
LEFT JOIN order_stats os ON os.o_custkey = c.c_custkey
LEFT JOIN open_stats  op ON op.o_custkey = c.c_custkey
""",
    doc="LEFT joins against two pre-aggregated subqueries with "
    "COALESCE(...,0) defaults.",
)
def e6_preagg_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    # distinct key aliases: both derived tables share `orders` lineage,
    # and Spark (rightly) rejects the ambiguous self-join reference
    order_stats = o.groupBy(F.col("o_custkey").alias("os_custkey")).agg(
        F.count("*").alias("order_count"),
        F.sum(X.dec("o_totalprice")).cast("decimal(38,2)").alias("spend"),
    )
    open_stats = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("op_custkey"))
        .agg(F.count("*").alias("open_count"))
    )
    return (
        c.join(order_stats, c.c_custkey == F.col("os_custkey"), "left")
        .join(open_stats, c.c_custkey == F.col("op_custkey"), "left")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.coalesce("order_count", F.lit(0)).alias("order_count"),
            F.coalesce("spend", F.lit(0).cast("decimal(38,2)"))
            .cast("double")
            .alias("spend"),
            F.coalesce("open_count", F.lit(0)).alias("open_count"),
        )
    )


# ---------------------------------------------------------------------------
# E7 — simple dimension LEFT join enrichment
#      (reference cases⟕assistance_requests: core/app.py:4413-4424)
# ---------------------------------------------------------------------------


@register(
    "e7_dim_enrich_join",
    oracle="""
SELECT s_suppkey AS suppkey, s_name AS supplier, n_name AS nation,
       CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
""",
    doc="LEFT enrichment join to a tiny dimension (always broadcast).",
)
def e7_dim_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left").select(
        F.col("s_suppkey").alias("suppkey"),
        F.col("s_name").alias("supplier"),
        F.col("n_name").alias("nation"),
        X.dec("s_acctbal").cast("double").alias("acctbal"),
    )


# ---------------------------------------------------------------------------
# E8 — pair-edge aggregation with inequality filter (network edges)
#      (reference provider collaboration: core/app.py:3198-3211, 4499-4517)
# ---------------------------------------------------------------------------


@register(
    "e8_pair_edges",
    oracle="""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       COUNT(*) AS shipments,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(6,4))))
                 AS DECIMAL(38,6)) AS DOUBLE) AS volume
FROM lineitem l
JOIN orders o    ON o.o_orderkey = l.l_orderkey
JOIN customer c  ON c.c_custkey = o.o_custkey
JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
JOIN supplier s  ON s.s_suppkey = l.l_suppkey
JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
WHERE cn.n_name <> sn.n_name
GROUP BY cust_nation, supp_nation
ORDER BY shipments DESC, cust_nation, supp_nation
LIMIT 50
""",
    doc="Directed edge list: inequality filter then GROUP BY pair, top-50.",
)
def e8_pair_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    disc_price = X.dec("l_extendedprice") * (F.lit(1) - X.dec("l_discount", X.RATE))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count("*").alias("shipments"),
            X.exact_sum(disc_price, "volume", scale=6),
        )
        .orderBy(F.desc("shipments"), "cust_nation", "supp_nation")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# E9 — as-of join (temporal nearest-predecessor; Spark-lacks operator)
#
# "Most recent click at-or-before each purchase, per user." Spark has no
# native ASOF JOIN; the scalable composition is union + one window pass:
# interleave both sides ordered by (ts, side) within each user and carry
# the last click timestamp forward — one shuffle on user_id, no
# per-group pandas, no range cross-product. DuckDB's native ASOF JOIN
# is the oracle. Clicks are pre-aggregated to one per (user, ts) so the
# at-or-before match is unambiguous in both engines.
# ---------------------------------------------------------------------------


@register(
    "e9_asof_join",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, ts
), purchases AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id, p.user_id,
       c.click_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
""",
    doc="As-of join: latest prior click per purchase via union + single "
    "window pass (Spark lacks ASOF; DuckDB's native ASOF JOIN is the "
    "oracle). One shuffle on user_id.",
)
def e9_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", "ts", "click_id", F.lit(0).alias("side"),
                F.lit(None).cast("long").alias("event_id"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("long").alias("click_id"),
        F.lit(1).alias("side"), "event_id",
    )
    both = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = both.select(
        "*",
        F.last(F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("last_click_ts"),
        F.last(F.when(F.col("side") == 0, F.col("click_id")), ignorenulls=True)
        .over(w)
        .alias("last_click_id"),
    )
    return carried.filter(F.col("side") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("last_click_id").alias("click_id"),
        (epoch_us("ts") - epoch_us("last_click_ts")).alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# E10 — semi / anti joins (the incremental-skip dataflow shape)
#
# The reference's isin/~isin upsert split (core/database.py:401-405) and
# already-processed file skip (core/etl_service.py:213-229) are semi-
# and anti-joins; here they are explicit plan nodes (LeftSemi/LeftAnti —
# no payload duplication, the build side carries keys only).
# ---------------------------------------------------------------------------


@register(
    "e10_semi_anti_join",
    oracle="""
SELECT 'with_lineitems' AS side, COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
            AS DOUBLE) AS total_price
FROM orders o WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
UNION ALL
SELECT 'without_lineitems', COUNT(*),
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
            AS DOUBLE)
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
""",
    doc="Explicit left-semi / left-anti joins (EXISTS / NOT EXISTS): "
    "the incremental-skip and upsert-split dataflow shape as plan "
    "nodes, keys-only build side.",
)
def e10_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    li_keys = table(spark, sf_dir, "lineitem").select("l_orderkey")
    cond = o.o_orderkey == li_keys.l_orderkey

    def side(name: str, how: str) -> DataFrame:
        return (
            o.join(li_keys, cond, how)
            .agg(
                F.lit(name).alias("side"),
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
                .cast("decimal(38,2)")
                .cast("double")
                .alias("total_price"),
            )
            .select("side", "n_orders", "total_price")
        )

    return side("with_lineitems", "left_semi").unionByName(
        side("without_lineitems", "left_anti")
    )


# ---------------------------------------------------------------------------
# E11 — skew-salted shuffle join (the join-side twin of F17)
#
# When the probe side is skewed on the join key AND the build side is
# too big to broadcast, a plain shuffle join sends every hot key to one
# reducer. The salted form spreads each hot key over N_SALTS reducers:
# fact rows get a deterministic md5 salt, the dim side is exploded once
# per salt value, and the join runs on (key, salt) — same rows out,
# bounded per-task input. AQE's skew-join split is the automatic
# cousin; this is the explicit spelling that also works mid-pipeline
# where AQE can't rewrite. The shuffle_hash hint keeps the demo honest
# (without it Catalyst would just broadcast the small test dim).
# ---------------------------------------------------------------------------

_JOIN_SALTS = 8


@register(
    "e11_salted_skew_join",
    oracle="""
SELECT c.c_mktsegment AS segment,
       COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DECIMAL(38,6))
            AS DOUBLE) AS sum_value
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
GROUP BY c.c_mktsegment
""",
    doc="Skew-salted shuffle join: fact salted by md5(event_id) mod 8, "
    "dim exploded per salt, join on (key, salt) — identical rows to "
    "the plain join, hot keys spread over 8 reducers.",
)
def e11_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.operators.salting import salted_join

    e = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        salted_join(
            e, c, "user_id", "c_custkey", salt_from="event_id",
            n_salts=_JOIN_SALTS,
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .cast("double")
            .alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# H4 — local-supplier volume (TPC-H Q5 shape)
#
# The canonical star-schema stress test: six tables, one year of
# orders, revenue only where the customer's and the supplier's nation
# coincide. region→nation→customer/supplier are broadcast dims (fixed
# or slowly-growing at any SF), so the only shuffles are the two
# fact-side equi-joins (orders⋈lineitem on orderkey, then the agg on
# nation) — the plan a 1000-executor cluster wants: filters pushed to
# both fact scans, dimension lookups map-side, revenue in exact
# decimals.
# ---------------------------------------------------------------------------


@register(
    "h4_local_supplier_volume",
    oracle="""
SELECT n_name AS nation,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l_discount AS DECIMAL(6,4))))
                 AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
               AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, nation
""",
    doc="TPC-H Q5 shape: 6-table star join, region-filtered, customer "
    "and supplier nation must match; dims broadcast, facts shuffle "
    "once on orderkey.",
)
def h4_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    s = table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = X.dec("l_extendedprice") * (F.lit(1) - X.dec("l_discount", X.RATE))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(rev).cast("decimal(38,6)").cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("nation"))
    )


# ---------------------------------------------------------------------------
# H5 — large-volume customers (TPC-H Q18 shape)
#
# Group-then-semi-join: the qualifying orderkeys come from an
# aggregate-HAVING subquery over the fact table itself, then rejoin
# lineitem/orders/customer for the report columns. The HAVING filter
# collapses the fact table to a tiny key set — at scale the rejoin is
# a broadcast of that key set over lineitem, never a second full
# shuffle. l_quantity is integral, so double SUMs are exact in any
# summation order.
# ---------------------------------------------------------------------------

_H5_QTY_MIN = 250


@register(
    "h5_big_order_customers",
    oracle=f"""
SELECT c.c_name AS name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS totalprice,
       CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > {_H5_QTY_MIN}
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY totalprice DESC, orderkey
LIMIT 100
""",
    doc="TPC-H Q18 shape: HAVING-filtered orderkey set semi-joined back "
    "through orders→customer, top-100 by order value.",
)
def h5_big_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > _H5_QTY_MIN)
        .select("l_orderkey")
    )
    o = table(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            X.dec("o_totalprice").cast("double").alias("totalprice"),
        )
        .agg(F.sum("l_quantity").cast("bigint").alias("sum_qty"))
        .orderBy(F.desc("totalprice"), F.asc("orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# H6 — returned-item reporting (TPC-H Q10 shape)
#
# Which customers returned the most revenue in a quarter: lineitem
# filtered to returnflag='R' (pushed to the scan), one quarter of
# orders, customer+nation dims broadcast, exact-decimal revenue,
# top-20 by revenue. The only corpus-scale shuffle is
# orders⋈lineitem on orderkey + the customer-grain aggregate; the
# TakeOrdered top-k never materializes a global sort.
# ---------------------------------------------------------------------------


@register(
    "h6_returned_items",
    oracle="""
SELECT c.c_custkey AS custkey, c.c_name AS name, n.n_name AS nation,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l_discount AS DECIMAL(6,4))))
                 AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, custkey
LIMIT 20
""",
    doc="TPC-H Q10 shape: returned-item revenue per customer over one "
    "quarter — returnflag filter pushed to the lineitem scan, "
    "customer/nation broadcast, exact-decimal revenue, top-20.",
)
def h6_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = X.dec("l_extendedprice") * (F.lit(1) - X.dec("l_discount", X.RATE))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.sum(rev).cast("decimal(38,6)").cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# E12 — link rank over the collaboration graph (iterative power method)
#
# PageRank-style importance over the e8 nation→nation shipment edges:
# rank flows along distinct edges for a FIXED 3 iterations with
# damping 0.85, all arithmetic in integer micro-rank units (integer
# division both engines truncates identically), so the result is
# bit-reproducible and the DuckDB oracle just unrolls the three
# iterations as CTEs. The Spark side is the canonical iterative-join
# driver loop (x14's pattern); per iteration the shuffle carries
# (node, rank) pairs only. Dangling mass is dropped (standard
# simplification) — both engines agree because both drop it.
# ---------------------------------------------------------------------------

_RANK_BASE = 1_000_000  # initial rank per node, micro-units
_RANK_ITERS = 3
_DAMP_NUM, _DAMP_DEN = 850_000, 1_000_000  # 0.85 damping in micro-units


def _link_rank_oracle() -> str:
    edges = """
SELECT DISTINCT cn.n_name AS src, sn.n_name AS dst
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
WHERE cn.n_name <> sn.n_name
"""
    sql = f"""
WITH edges AS ({edges}),
nodes AS (SELECT src AS n FROM edges UNION SELECT dst FROM edges),
outdeg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
r0 AS (SELECT n, CAST({_RANK_BASE} AS BIGINT) AS r FROM nodes)"""
    for t in range(1, _RANK_ITERS + 1):
        sql += f""",
c{t} AS (
  SELECT e.dst AS n, SUM(r.r // o.od) AS contrib
  FROM edges e JOIN r{t - 1} r ON r.n = e.src JOIN outdeg o ON o.src = e.src
  GROUP BY e.dst
),
r{t} AS (
  SELECT nodes.n,
         CAST({_RANK_BASE - _DAMP_NUM}
              + (COALESCE(c{t}.contrib, 0) * {_DAMP_NUM}) // {_DAMP_DEN} AS BIGINT) AS r
  FROM nodes LEFT JOIN c{t} ON c{t}.n = nodes.n
)"""
    sql += f"""
SELECT n AS nation, r AS rank_micro FROM r{_RANK_ITERS}
ORDER BY rank_micro DESC, nation
"""
    return sql


@register(
    "e12_link_rank",
    oracle=_link_rank_oracle(),
    doc=f"Link rank: {_RANK_ITERS} damped power iterations over the "
    "distinct nation→nation shipment edges, integer micro-rank "
    "arithmetic (identical truncation both engines). The fact-sized "
    "work is ONE distinct-edges pass; the iterations run over the "
    "materialized nation-grain graph (≤ |nations|² rows) as a single "
    "lazy broadcast-join chain — one job, no per-iteration barriers.",
)
def e12_link_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("src"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("dst"))
    # The only fact-sized stage: distinct nation pairs. The map-side
    # partial distinct runs at full parallelism; coalesce(1) collapses
    # just the final merge (≤ |nations|² keys per map task) so the
    # checkpointed graph is one tiny partition — the right grain for
    # the iteration joins at ANY corpus size.
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("n"))
        .unionByName(edges.select(F.col("dst").alias("n")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("od"))
    ranks = nodes.select("n", F.lit(_RANK_BASE).cast("bigint").alias("r"))
    # Dimension-grain fixpoint: every per-iteration relation is
    # nation-grain, so the whole loop stays LAZY — each rank state is
    # broadcast into the next edge join and the final plan executes as
    # one job. (The former per-iteration eager localCheckpoint spent
    # ~0.7s/iteration on barrier scheduling for 25-row states.)
    for _ in range(_RANK_ITERS):
        contrib = (
            edges.join(
                F.broadcast(ranks.withColumnRenamed("n", "src_n")),
                F.col("src_n") == F.col("src"),
            )
            .join(F.broadcast(outdeg), "src")
            .groupBy(F.col("dst").alias("cn_node"))
            .agg(F.sum(F.expr("r div od")).alias("contrib"))
        )
        ranks = nodes.join(
            F.broadcast(contrib), nodes.n == F.col("cn_node"), "left"
        ).select(
            "n",
            (
                # teleport mass, same derivation as the oracle
                F.lit(_RANK_BASE - _DAMP_NUM)
                + F.expr(f"(coalesce(contrib, 0L) * {_DAMP_NUM}) div {_DAMP_DEN}")
            )
            .cast("bigint")
            .alias("r"),
        )
    return ranks.select(
        F.col("n").alias("nation"), F.col("r").alias("rank_micro")
    ).orderBy(F.desc("rank_micro"), "nation")


# ---------------------------------------------------------------------------
# E13 — range-dimension join (non-equi broadcast)
#
# The banding pattern SQL warehouses use instead of CASE ladders: a
# tiny dimension of [lo, hi) value bands joined to the fact on a range
# predicate. With the dimension broadcast, Spark plans a
# BroadcastNestedLoopJoin whose inner side is a handful of rows — the
# fact table streams through map-side, no shuffle, no cartesian risk.
# The band table is inlined identically in both engines.
# ---------------------------------------------------------------------------

_E13_BANDS = (
    ("negative", float("-inf"), 0.0),
    ("low", 0.0, 100.0),
    ("mid", 100.0, 500.0),
    ("high", 500.0, float("inf")),
)


@register(
    "e13_range_dim_join",
    oracle="""
WITH bands(band, lo, hi) AS (
  VALUES ('negative', CAST('-infinity' AS DOUBLE), 0.0),
         ('low', 0.0, 100.0),
         ('mid', 100.0, 500.0),
         ('high', 500.0, CAST('infinity' AS DOUBLE))
)
SELECT band,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band
ORDER BY band
""",
    doc="Range-dimension (banding) join: tiny [lo, hi) band table "
    "broadcast against the fact on a non-equi predicate — the "
    "warehouse alternative to CASE ladders; fact streams map-side, "
    "no shuffle.",
)
def e13_range_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("user_id", "value")
    bands = spark.createDataFrame(
        list(_E13_BANDS), "band string, lo double, hi double"
    )
    return (
        e.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# H9 — disjunctive predicate brackets (TPC-H Q19 shape)
#
# OR of three conjunctive (brand, size-range, quantity-range) brackets
# across a fact⋈dim join. Catalyst extracts the common p_partkey
# equality as the join key, pushes the per-bracket part predicates to
# the part scan (a p_brand IN (...) superset filter) and evaluates the
# residual disjunction post-join — the classic "complex predicate
# still prunes the scan" check. Part is broadcast; lineitem never
# shuffles.
# ---------------------------------------------------------------------------

_H9_BRACKETS = (
    ("Brand#11", 1, 15, 1, 11),
    ("Brand#22", 10, 30, 10, 20),
    ("Brand#33", 20, 50, 20, 30),
)


def _h9_bracket_sql() -> str:
    return " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
        f"AND l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in _H9_BRACKETS
    )


@register(
    "h9_disjunctive_brackets",
    oracle=f"""
SELECT p_brand,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l_discount AS DECIMAL(6,4))))
                 AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {_h9_bracket_sql()}
GROUP BY p_brand
ORDER BY p_brand
""",
    doc="TPC-H Q19 shape: OR of conjunctive (brand, size, quantity) "
    "brackets over lineitem⋈part; broadcast part, residual "
    "disjunction post-join, exact-decimal revenue.",
)
def h9_disjunctive_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    bracket = None
    for b, slo, shi, qlo, qhi in _H9_BRACKETS:
        cond = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(slo, shi)
            & F.col("l_quantity").between(qlo, qhi)
        )
        bracket = cond if bracket is None else (bracket | cond)
    rev = X.dec("l_extendedprice") * (F.lit(1) - X.dec("l_discount", X.RATE))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(bracket)
        .groupBy("p_brand")
        .agg(
            F.sum(rev).cast("decimal(38,6)").cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# H10 — EXISTS semi-join by priority (TPC-H Q4 shape)
#
# Orders with at least one slow-shipping lineitem, counted by
# priority. The correlated EXISTS becomes a LEFT SEMI join on
# orderkey with the lateness predicate in the join condition — one
# shuffle on orderkey, no duplicate counting however many lineitems
# match (semi-join semantics, not DISTINCT patch-up). The testdata
# schema has no commitdate/receiptdate, so "slow" is shipdate more
# than 60 days after the order date.
# ---------------------------------------------------------------------------


@register(
    "h10_priority_semi",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="TPC-H Q4 shape: correlated EXISTS as LEFT SEMI join with the "
    "lateness predicate inside the join condition; counts stay "
    "per-order regardless of matching-lineitem multiplicity.",
)
def h10_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    slow = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, slow, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# H11 — group share vs global scalar (TPC-H Q11 shape)
#
# Parts whose revenue exceeds a fraction of TOTAL revenue. The global
# total is a 1-row aggregate crossJoined (broadcast, constant cost)
# onto the per-part rollup; the share test multiplies the DECIMAL
# part revenue by the integer share denominator instead of comparing
# against a rounded fraction — exact integer-decimal arithmetic, no
# epsilon, identical row sets in both engines at any SF. Testdata has
# no partsupp, so lineitem revenue stands in for stock value.
# ---------------------------------------------------------------------------

_H11_SHARE_DEN = 2000  # keep parts with revenue > total/2000


@register(
    "h11_value_share",
    oracle=f"""
WITH pr AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(6,4))))
              AS DECIMAL(38,6)) AS part_rev
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey AS part, CAST(part_rev AS DOUBLE) AS revenue
FROM pr
WHERE part_rev * {_H11_SHARE_DEN} > (SELECT SUM(part_rev) FROM pr)
ORDER BY revenue DESC, part
""",
    doc="TPC-H Q11 shape: per-part revenue filtered against a global "
    "total via 1-row broadcast crossJoin; share test in exact "
    "decimal-integer arithmetic (rev*DEN > total), no epsilon.",
)
def h11_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    rev = X.dec("l_extendedprice") * (F.lit(1) - X.dec("l_discount", X.RATE))
    # Materialize the per-part rollup once (localCheckpoint: blocks
    # free on GC) — both the share filter and the total derive from
    # it, so the fact table is scanned exactly once, not once per
    # consumer. At 100 TB pr is parts-sized, not fact-sized.
    pr = (
        li.groupBy("l_partkey")
        .agg(F.sum(rev).cast("decimal(38,6)").alias("part_rev"))
        .localCheckpoint(eager=True)
    )
    total = pr.agg(
        F.sum("part_rev").cast("decimal(38,6)").alias("total_rev")
    )
    return (
        pr.crossJoin(F.broadcast(total))  # 1-row total: constant cost
        .filter(F.col("part_rev") * _H11_SHARE_DEN > F.col("total_rev"))
        .select(
            F.col("l_partkey").alias("part"),
            F.col("part_rev").cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "part")
    )


# ---------------------------------------------------------------------------
# H12 — lapsed rich customers (TPC-H Q22 shape)
#
# Anti-join against the fact table gated by a global scalar (average
# positive balance). Both scalar and anti-join avoid correlated
# per-row execution: the average is a 1-row broadcast, the NOT EXISTS
# is a LEFT ANTI join on custkey with the recency predicate pushed to
# the orders scan. The average is exact-decimal then double
# (order-independent), so the > comparison selects identical
# customers in both engines. Every testdata customer has ordered at
# least once, so "inactive" is no order since the cutoff — a
# non-degenerate anti-join at every SF. No c_phone in testdata; the
# segment stands in for the country-code grouping.
# ---------------------------------------------------------------------------

_H12_CUTOFF = "2000-01-01 00:00:00"


@register(
    "h12_inactive_rich",
    oracle=f"""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
         / COUNT(*) AS ab
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment AS segment,
       COUNT(*) AS n_customers,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(38,2))
            AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT ab FROM avg_bal)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '{_H12_CUTOFF}'
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    doc="TPC-H Q22 shape: global exact-decimal AVG scalar broadcast + "
    "LEFT ANTI join on the recency-filtered fact; per-segment count "
    "and balance rollup of lapsed above-average customers.",
)
def h12_inactive_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_H12_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(X.dec("c_acctbal")).cast("double") / F.count("*")
            ).alias("ab")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))  # 1-row scalar: constant cost
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(X.dec("c_acctbal"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("total_bal"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# E14 — blocked fuzzy entity resolution (deletion-neighborhood match)
#
# Person/record matching — the reference domain's core linkage problem
# (households and clients arriving from multiple feeds with typo'd
# names; cf. core/app.py person-merge surface). Naive fuzzy matching
# is O(n²); attribute blocking alone (nation) still grows
# quadratically within blocks. This uses DELETION-NEIGHBORHOOD
# blocking, the provably-complete candidate generator for edit
# distance 1: every record emits its name plus each single-character
# deletion variant; two names within edit distance 1 are GUARANTEED to
# share a variant, so an equi-join on (nation, variant) finds every
# true match, and the exact levenshtein filter runs only on bucket
# collisions. Scale shape: per-record blowup is O(name_length)
# (bounded), each variant bucket is bounded by alphabet size × block
# cardinality of identical variants — no quadratic term anywhere; the
# join shuffles on the variant hash, the final distinct dedups
# multi-variant collisions of the same pair.
# ---------------------------------------------------------------------------


@register(
    "e14_entity_resolution",
    oracle="""
WITH variants AS (
  SELECT c_custkey, c_nationkey, c_name,
         substr(c_name, 1, CAST(i AS INTEGER))
           || substr(c_name, CAST(i AS INTEGER) + 2) AS variant
  FROM customer, UNNEST(range(0, length(c_name))) AS t(i)
  UNION ALL
  SELECT c_custkey, c_nationkey, c_name, c_name AS variant FROM customer
), pairs AS (
  SELECT DISTINCT a.c_custkey AS id_a, b.c_custkey AS id_b,
         a.c_nationkey AS nationkey, a.c_name AS name_a, b.c_name AS name_b
  FROM variants a
  JOIN variants b
    ON a.variant = b.variant
   AND a.c_nationkey = b.c_nationkey
   AND a.c_custkey < b.c_custkey
)
SELECT id_a, id_b, nationkey,
       CAST(levenshtein(name_a, name_b) AS INTEGER) AS edit_dist
FROM pairs
WHERE levenshtein(name_a, name_b) <= 1
ORDER BY id_a, id_b
""",
    doc="Blocked fuzzy entity resolution: deletion-neighborhood "
    "candidate generation (complete for edit distance 1), equi-join on "
    "(nation, variant), exact levenshtein confirm — person-linkage "
    "without the O(n^2) scan.",
)
def e14_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_name"
    )
    # name + every single-deletion variant (identity covers pure
    # insert/delete matches where lengths differ)
    # The deletion-variant explode (a Generate of ~name-length rows per
    # customer) feeds BOTH sides of the blocking self-join below —
    # Catalyst does not share the subtree, so the explode ran twice.
    # Pin it once; both join sides read the pinned blocks.
    variants = c.select(
        "c_custkey",
        "c_nationkey",
        "c_name",
        F.explode(
            F.expr(
                "array_union("
                "  transform(sequence(0, length(c_name) - 1),"
                "    i -> concat(substr(c_name, 1, i), substr(c_name, i + 2))),"
                "  array(c_name))"
            )
        ).alias("variant"),
    ).localCheckpoint(eager=True)
    a = variants.alias("a")
    b = variants.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.variant") == F.col("b.variant"))
            & (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("id_a"),
            F.col("b.c_custkey").alias("id_b"),
            F.col("a.c_nationkey").alias("nationkey"),
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_name").alias("name_b"),
        )
        .distinct()  # same pair may collide in several variant buckets
    )
    return (
        pairs.withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b").cast("int")
        )
        .filter(F.col("edit_dist") <= 1)
        .select("id_a", "id_b", "nationkey", "edit_dist")
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# E15 — market-basket pair lift (co-occurrence mining)
#
# Which part pairs land in the same order more often than chance? The
# co-occurrence primitive behind recommender candidates and prompt/
# response template mining. Pair generation is a per-order self-join
# over the DISTINCT parts of each order — fanout is bounded by the
# schema's lines-per-order cap, so pair volume is O(orders), never
# O(parts²). Per-part order counts are a dim-sized aggregate joined
# onto the pair relation (broadcast); lift = N·c_ab/(c_a·c_b) is one
# IEEE division of exact BIGINT products (< 2^53 — identical doubles
# in both engines), so the deterministic top-100 order
# (lift DESC, part ids) is stable cross-engine.
# ---------------------------------------------------------------------------


@register(
    "e15_basket_lift",
    oracle="""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op
), part_ct AS (
  SELECT l_partkey, COUNT(*) AS c FROM op GROUP BY l_partkey
), pair_ct AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS c_ab
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT part_a, part_b, c_ab AS pair_orders,
       ca.c AS orders_a, cb.c AS orders_b,
       ROUND(CAST((SELECT n_orders FROM n) * c_ab AS DOUBLE)
             / (ca.c * cb.c), 6) AS lift
FROM pair_ct
JOIN part_ct ca ON ca.l_partkey = part_a
JOIN part_ct cb ON cb.l_partkey = part_b
WHERE c_ab >= 2
ORDER BY lift DESC, part_a, part_b
LIMIT 100
""",
    doc="Market-basket pair lift: per-order distinct-part self-join "
    "(fanout bounded by lines-per-order), pair supports vs per-part "
    "supports, lift = N*c_ab/(c_a*c_b) as one IEEE division over exact "
    "ints, deterministic top-100.",
)
def e15_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # ONE exchange feeds everything (§2.4): collect_set dedups the
    # (order, part) multiset INSIDE the per-order groupBy — partially
    # map-side — so the former standalone distinct (its own full
    # exchange over the same rows, plus a checkpoint barrier) is gone
    # outright. The order-grain array relation is the single pinned
    # artifact all four consumers read: the order-count scalar and the
    # per-part order counts both derive from it (count of rows /
    # explode of the distinct-parts arrays), not from a second pass
    # over lineitem.
    per_order = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .localCheckpoint(eager=True)
    )
    n = per_order.agg(F.count("*").cast("bigint").alias("n_orders"))
    part_ct = (
        per_order.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("c"))
    )
    pair_ct = (
        per_order.filter(F.size("ps") >= 2)  # sequence(0,-1) is an error
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, size(ps) - 2), i -> "
                    "transform(sequence(i + 1, size(ps) - 1), j -> "
                    "struct(ps[i] as part_a, ps[j] as part_b))))"
                )
            ).alias("t")
        )
        .groupBy(F.col("t.part_a").alias("part_a"), F.col("t.part_b").alias("part_b"))
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= 2)
    )
    enriched = (
        pair_ct.join(
            F.broadcast(part_ct.select(F.col("l_partkey").alias("part_a"),
                                       F.col("c").alias("orders_a"))),
            "part_a",
        )
        .join(
            F.broadcast(part_ct.select(F.col("l_partkey").alias("part_b"),
                                       F.col("c").alias("orders_b"))),
            "part_b",
        )
        .crossJoin(F.broadcast(n))  # 1-row scalar
    )
    return (
        enriched.select(
            "part_a",
            "part_b",
            F.col("c_ab").alias("pair_orders"),
            "orders_a",
            "orders_b",
            F.round(
                (F.col("n_orders") * F.col("c_ab")).cast("double")
                / (F.col("orders_a") * F.col("orders_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# E16 — nearest-event temporal join (bidirectional, bucketed)
#
# "For each purchase, the nearest same-user error within ±1 hour" —
# the sensor-alignment / incident-correlation primitive. Unlike the
# as-of join (e9: most recent BEFORE), nearest looks BOTH directions,
# so sort-based as-of tricks don't apply directly. Scale-safe shape:
# errors are keyed by their hour bucket; each purchase probes exactly
# three buckets (b−1, b, b+1 — ±1h can only land there), making the
# join a bounded-fanout EQUI-join on (user, bucket), never a range
# scan. A pair can match in only one bucket (the error's own), so no
# dedup is needed. The per-purchase argmin window partitions on the
# purchase id — parallel at any event volume; candidates per purchase
# are bounded by one user's per-hour error density. All µs arithmetic
# is exact BIGINT.
# ---------------------------------------------------------------------------

_E16_WINDOW_US = 3_600_000_000  # ±1 hour in microseconds


@register(
    "e16_nearest_event_join",
    oracle=f"""
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS t
  FROM events WHERE event_type = 'purchase'
), r AS (
  SELECT event_id, user_id, epoch_us(ts) AS t
  FROM events WHERE event_type = 'error'
), cand AS (
  SELECT p.event_id, p.user_id, r.event_id AS error_id,
         CAST(r.t - p.t AS BIGINT) AS gap_us,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_id
           ORDER BY ABS(r.t - p.t), r.event_id) AS rn
  FROM p JOIN r
    ON r.user_id = p.user_id
   AND r.t BETWEEN p.t - {_E16_WINDOW_US} AND p.t + {_E16_WINDOW_US}
)
SELECT event_id, user_id, error_id AS nearest_error_id,
       gap_us, ABS(gap_us) AS abs_gap_us
FROM cand WHERE rn = 1
ORDER BY event_id
""",
    doc="Bidirectional nearest-event join: per purchase, the closest "
    "same-user error within +/-1h via hour-bucket equi-join (purchase "
    "probes buckets b-1/b/b+1), per-purchase argmin window — bounded "
    "fanout, no range scan, exact BIGINT microseconds.",
)
def e16_nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    us = epoch_us("ts")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", us.alias("t")
    )
    r = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", us.alias("rt")
    )
    bucket = lambda c: F.floor(c / _E16_WINDOW_US).cast("long")  # noqa: E731
    r_b = r.withColumn("bucket", bucket(F.col("rt")))
    p_b = p.withColumn(
        "bucket", F.explode(F.array(*[bucket(F.col("t")) + i for i in (-1, 0, 1)]))
    )
    cand = (
        p_b.join(r_b, ["user_id", "bucket"])
        .withColumn("gap_us", (F.col("rt") - F.col("t")).cast("bigint"))
        .filter(F.abs(F.col("gap_us")) <= _E16_WINDOW_US)
    )
    w = Window.partitionBy("event_id").orderBy(F.abs(F.col("gap_us")), "error_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("error_id").alias("nearest_error_id"),
            "gap_us",
            F.abs(F.col("gap_us")).alias("abs_gap_us"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# E17 — Bloom-filter pre-join pruning (runtime-filter shape, audited)
#
# The join-side use of x34's membership filter: before shuffling a
# fact table into a semi-join against a filtered dimension, build a
# Bloom filter over the dim keys (one bit_or aggregate, kilobytes),
# broadcast it, and drop fact rows that cannot match. This is what
# Spark's runtime row-level filtering does internally; expressing it
# relationally makes the payoff AUDITABLE — the output reports fact
# rows scanned, rows surviving the bloom, exact semi-join matches,
# and the false-pass overhead, i.e. the shuffle volume the filter
# saved. md5-derived bit positions are engine-neutral, so the pruning
# decision — and the audit — is bit-reproducible in DuckDB.
#
# Scale: the filter build aggregates the DIM side (small); the fact
# side is touched map-side only (broadcast probe, no shuffle before
# the prune). The exact join after pruning shuffles the survivors —
# at a selective dim, that is the entire saving.
# ---------------------------------------------------------------------------

_E17_WORDS = 4096
_E17_BITS = _E17_WORDS * 32
_E17_K = 3
_E17_SEGMENT = "BUILDING"


def _e17_oracle() -> str:
    from calaveras_uniteus_etl_spark.functions.hashing import duckdb_md5_long_sql

    # md5_long_seeded prepends "{seed}:" — mirror exactly ("i:#key")
    dfold = duckdb_md5_long_sql("cast(i as varchar) || ':#' || cast(c_custkey as varchar)")
    ffold = duckdb_md5_long_sql("cast(i as varchar) || ':#' || cast(o_custkey as varchar)")
    return f"""
WITH seeds AS (SELECT unnest(range({_E17_K})) AS i),
dim AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = '{_E17_SEGMENT}'
),
bloom AS (
  SELECT p // 32 AS word, bit_or(1::BIGINT << (p % 32)) AS w
  FROM (SELECT {dfold} % {_E17_BITS} AS p FROM dim CROSS JOIN seeds)
  GROUP BY p // 32
),
probe AS (
  SELECT o.o_orderkey, o.o_custkey, {ffold} % {_E17_BITS} AS p
  FROM orders o CROSS JOIN seeds
),
verdict AS (
  SELECT o_orderkey, o_custkey,
         bool_and(COALESCE((w & (1::BIGINT << (p % 32)))
                           = (1::BIGINT << (p % 32)), FALSE)) AS pass
  FROM probe LEFT JOIN bloom ON bloom.word = p // 32
  GROUP BY o_orderkey, o_custkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_fact,
       CAST((SELECT COUNT(*) FROM dim) AS BIGINT) AS n_dim,
       CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
       CAST(SUM(CASE WHEN v.o_custkey IN (SELECT c_custkey FROM dim)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_match,
       CAST(SUM(CASE WHEN pass AND v.o_custkey NOT IN
                          (SELECT c_custkey FROM dim)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pass,
       ROUND(1.0 - CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*), 6) AS prune_fraction
FROM verdict v
"""


@register(
    "e17_bloom_prejoin",
    oracle=_e17_oracle(),
    doc="Bloom pre-join pruning audit: 131072-bit filter over one "
    "market segment's customer keys, broadcast-probed against every "
    "order map-side; reports fact rows scanned / bloom survivors / "
    "exact matches / false passes / pruned fraction — the shuffle "
    "volume a runtime filter saves, bit-reproducible in both engines.",
)
def e17_bloom_prejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.functions.hashing import md5_long_seeded

    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    dim = c.filter(F.col("c_mktsegment") == _E17_SEGMENT).select("c_custkey")

    def positions(key_col):
        return F.array(
            *[
                md5_long_seeded(
                    F.concat(F.lit("#"), key_col.cast("string")), i
                )
                % _E17_BITS
                for i in range(_E17_K)
            ]
        )

    bloom = (
        dim.select(F.explode(positions(F.col("c_custkey"))).alias("p"))
        .select(
            (F.col("p") / 32).cast("long").alias("word"),
            F.expr("shiftleft(1L, cast(p % 32 as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("w"))
    )
    probe = o.select(
        "o_orderkey",
        "o_custkey",
        F.explode(positions(F.col("o_custkey"))).alias("p"),
    )
    verdict = (
        probe.join(
            F.broadcast(bloom),
            (F.col("p") / 32).cast("long") == F.col("word"),
            "left",
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.coalesce(
                F.expr(
                    "(w & shiftleft(1L, cast(p % 32 as int)))"
                    " = shiftleft(1L, cast(p % 32 as int))"
                ),
                F.lit(False),
            ).alias("hit"),
        )
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.expr("bool_and(hit)").alias("pass"))
    )
    exact = verdict.join(
        F.broadcast(dim.withColumnRenamed("c_custkey", "o_custkey")).withColumn(
            "is_match", F.lit(1)
        ),
        "o_custkey",
        "left",
    ).withColumn("is_match", F.coalesce(F.col("is_match"), F.lit(0)))
    n_dim = dim.count()  # dim-sized scalar, driver-side by design
    passes = F.sum(F.when(F.col("pass"), 1).otherwise(0))
    return exact.agg(
        F.count("*").cast("bigint").alias("n_fact"),
        F.lit(n_dim).cast("bigint").alias("n_dim"),
        passes.cast("bigint").alias("n_bloom_pass"),
        F.sum("is_match").cast("bigint").alias("n_exact_match"),
        F.sum(
            F.when(F.col("pass") & (F.col("is_match") == 0), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_false_pass"),
        F.round(
            F.lit(1.0) - passes.cast("double") / F.count("*"), 6
        ).alias("prune_fraction"),
    )


# ---------------------------------------------------------------------------
# E18 — grid-bucketed spatial radius join
#
# The spatial-blocking join class (none of the other join shapes cover
# it): pairs within planar radius R, found via grid cells instead of
# the O(n·m) cross product. Coordinates are md5-derived synthetic
# lat/lon per key (deterministic, engine-neutral — the tables carry no
# geo columns); each customer probes the supplier grid at its own cell
# ±1 in both axes, which is LOSSLESS because the cell edge equals R —
# no true pair can sit more than one cell away. The distance test is
# pure planar arithmetic (dlat² + dlon² ≤ R², no libm trig), so both
# engines compare bit-identical doubles; the oracle is the brute-force
# cross join, proving the 9-cell blocking loses nothing.
#
# Scale: the 9-cell explode fans the PROBE side ×9 with three small
# columns; the join is an equi-join on (cell_x, cell_y); per-customer
# min-distance resolves inside the same aggregation. At 100 TB the
# grid join touches candidate cells only — the cross product never
# materializes.
# ---------------------------------------------------------------------------

_E18_R = 2.0  # planar radius; cell edge == R makes ±1 blocking lossless


def _e18_oracle() -> str:
    from calaveras_uniteus_etl_spark.functions.hashing import duckdb_md5_long_sql

    clat = duckdb_md5_long_sql("'lat:' || CAST(c_custkey AS VARCHAR)")
    clon = duckdb_md5_long_sql("'lon:' || CAST(c_custkey AS VARCHAR)")
    slat = duckdb_md5_long_sql("'slat:' || CAST(s_suppkey AS VARCHAR)")
    slon = duckdb_md5_long_sql("'slon:' || CAST(s_suppkey AS VARCHAR)")
    return f"""
WITH cust AS (
  SELECT c_custkey, c_mktsegment,
         ({clat} % 18000) / 100.0 - 90 AS lat,
         ({clon} % 36000) / 100.0 - 180 AS lon
  FROM customer
), supp AS (
  SELECT s_suppkey,
         ({slat} % 18000) / 100.0 - 90 AS lat,
         ({slon} % 36000) / 100.0 - 180 AS lon
  FROM supplier
), pairs AS (
  SELECT c.c_custkey, c.c_mktsegment,
         (c.lat - s.lat) * (c.lat - s.lat)
           + (c.lon - s.lon) * (c.lon - s.lon) AS d2
  FROM cust c JOIN supp s
    ON (c.lat - s.lat) * (c.lat - s.lat)
       + (c.lon - s.lon) * (c.lon - s.lon) <= {_E18_R} * {_E18_R}
), per_cust AS (
  SELECT c_custkey, c_mktsegment, COUNT(*) AS n_near, MIN(d2) AS min_d2
  FROM pairs GROUP BY c_custkey, c_mktsegment
)
SELECT c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers_covered,
       CAST(SUM(n_near) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(CAST(ROUND(SQRT(min_d2), 12) AS DECIMAL(38,12)))
                  AS DOUBLE) / COUNT(*), 9) AS avg_nearest_dist
FROM per_cust
GROUP BY c_mktsegment
ORDER BY segment
"""


@register(
    "e18_grid_radius_join",
    oracle=_e18_oracle(),
    doc="Spatial radius join via grid blocking: md5-derived planar "
    "coordinates, customer probes supplier cells at ±1 (lossless — "
    "cell edge equals the radius), pure-arithmetic distance test; "
    "brute-force cross-join oracle proves the blocking loses "
    "nothing. Per-segment coverage, pair count and mean nearest "
    "distance.",
)
def e18_grid_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.functions.hashing import md5_long

    def coord(prefix, key, mod, offs):
        return (
            md5_long(F.concat(F.lit(prefix), F.col(key).cast("string")))
            % mod
        ) / 100.0 - offs

    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        coord("lat:", "c_custkey", 18000, 90).alias("lat"),
        coord("lon:", "c_custkey", 36000, 180).alias("lon"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        coord("slat:", "s_suppkey", 18000, 90).alias("slat"),
        coord("slon:", "s_suppkey", 36000, 180).alias("slon"),
    )
    # probe side fans out to its 9 candidate cells (3 small ints ride)
    probes = cust.select(
        "c_custkey",
        "c_mktsegment",
        "lat",
        "lon",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(-1, 1), dy ->"
                f" transform(sequence(-1, 1), dx -> struct("
                f"   cast(floor((lat + 90) / {_E18_R}) + dy as bigint) as cy,"
                f"   cast(floor((lon + 180) / {_E18_R}) + dx as bigint) as cx))))"
            )
        ).alias("cell"),
    ).select(
        "c_custkey",
        "c_mktsegment",
        "lat",
        "lon",
        F.col("cell.cy").alias("cell_y"),
        F.col("cell.cx").alias("cell_x"),
    )
    # supplier cells on the shifted origin to match the probe formula
    supp_cells = supp.select(
        "s_suppkey",
        "slat",
        "slon",
        F.floor((F.col("slat") + 90) / _E18_R).cast("bigint").alias("cell_y"),
        F.floor((F.col("slon") + 180) / _E18_R).cast("bigint").alias("cell_x"),
    )
    d2 = (F.col("lat") - F.col("slat")) * (F.col("lat") - F.col("slat")) + (
        F.col("lon") - F.col("slon")
    ) * (F.col("lon") - F.col("slon"))
    pairs = (
        probes.join(supp_cells, ["cell_y", "cell_x"])
        .filter(d2 <= F.lit(_E18_R * _E18_R))
        .select("c_custkey", "c_mktsegment", d2.alias("d2"))
    )
    per_cust = pairs.groupBy("c_custkey", "c_mktsegment").agg(
        F.count("*").alias("n_near"), F.min("d2").alias("min_d2")
    )
    return (
        per_cust.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("bigint").alias("n_customers_covered"),
            F.sum("n_near").cast("bigint").alias("n_pairs"),
            F.round(
                F.sum(
                    F.round(F.sqrt("min_d2"), 12).cast("decimal(38,12)")
                ).cast("double")
                / F.count("*"),
                9,
            ).alias("avg_nearest_dist"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# E19 — skyline (Pareto frontier) of customers
#
# The classic multi-criteria operator (Börzsönyi et al., ICDE 2001):
# customers not dominated on (lifetime spend ↑, recency days ↓) — the
# "best on some tradeoff" set a retention team actually contacts. The
# sort-based 2-D algorithm: order by (spend DESC, recency ASC,
# custkey), keep a row iff its recency is STRICTLY below the minimum
# recency of every preceding row — every predecessor has ≥ spend, so
# any one with ≤ recency dominates. The running min over the
# customer-grain total order comes from operators/prefix.py's new
# prefix_fold_min (two-phase, no single-partition window); the oracle
# states the same exclusive-window rule directly. Spend stays exact
# DECIMAL end-to-end; the keep rule compares exact integers.
# ---------------------------------------------------------------------------

_E19_ASOF = "2001-08-15"


@register(
    "e19_skyline_customers",
    oracle=f"""
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
           AS spend,
         date_diff('day', MAX(o_orderdate), DATE '{_E19_ASOF}') AS recency
  FROM orders GROUP BY o_custkey
), staged AS (
  SELECT o_custkey, spend, recency,
         MIN(recency) OVER (ORDER BY spend DESC, recency ASC, o_custkey ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS prev_min
  FROM cust
)
SELECT o_custkey AS custkey,
       CAST(spend AS DOUBLE) AS spend,
       CAST(recency AS BIGINT) AS recency_days
FROM staged
WHERE prev_min IS NULL OR recency < prev_min
ORDER BY spend DESC, custkey
""",
    doc="Skyline / Pareto frontier on (spend ↑, recency ↓): sort-"
    "based 2-D algorithm — keep a customer iff strictly fresher than "
    "every higher-spender — with the running min from the "
    "distributed prefix-min fold (no single-partition window); "
    "exact-decimal spend, integer recency.",
)
def e19_skyline_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.operators.prefix import prefix_fold_min

    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(X.dec("o_totalprice")).cast("decimal(38,2)").alias("spend"),
        F.datediff(
            F.lit(_E19_ASOF).cast("date"), F.max("o_orderdate")
        ).alias("recency"),
    )
    staged = prefix_fold_min(
        cust,
        [F.desc("spend"), F.asc("recency"), F.asc("o_custkey")],
        "recency",
        out_col="prev_min",
        exclusive=True,
        # pin the orders scan+aggregate: the range boundary sampling
        # would otherwise execute it a second time
        pin_input=True,
    )
    return (
        staged.filter(
            F.col("prev_min").isNull()
            | (F.col("recency") < F.col("prev_min"))
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("spend").cast("double").alias("spend"),
            F.col("recency").cast("bigint").alias("recency_days"),
        )
        .orderBy(F.desc("spend"), F.asc("custkey"))
    )


# ---------------------------------------------------------------------------
# E20 — Fellegi-Sunter record-linkage scoring
#
# e14 finds candidate duplicate records (blocking + edit distance);
# this scores candidate pairs the way production linkage engines do
# (Fellegi & Sunter 1969): each compared field contributes a
# likelihood ratio — m/u on agreement, (1-m)/(1-u) on disagreement —
# where u (chance-agreement probability) is ESTIMATED FROM THE DATA
# as sum(n_v^2)/N^2 over the field's value distribution. The u
# statistics are kept as exact integer rationals (sum of squared
# counts / squared total), so no float enters an aggregation; the
# final score is one fixed-order double product over those integers
# and double-cast m literals, rounded to milli-units — bit-identical
# across engines. Standard FS uses log-weights; the product of ratios
# is the same statistic pre-log (monotone), so the ranking is
# identical and libm stays out of the plan.
#
# Blocking: (nationkey, balance cents-digit) — 250 blocks at any
# scale; a BUCKET_CAP-style guard drops degenerate blocks (inactive
# at test SFs, mirrored in the oracle) so the within-block self-join
# can never go quadratic on a skewed block. Scored fields (market
# segment, balance band, order-activity band) are independent of the
# block key. The three u-statistic relations are 1-row aggregates,
# broadcast by construction.
# ---------------------------------------------------------------------------

_E20_CAP = 1000
_E20_TOPK = 40
# m-probabilities (P[field agrees | same entity]) — fixed literals,
# cast to double explicitly so neither engine does decimal arithmetic.
_E20_M_SEG = "CAST(0.95 AS DOUBLE)"
_E20_M_BAND = "CAST(0.80 AS DOUBLE)"
_E20_M_ACT = "CAST(0.85 AS DOUBLE)"

_E20_RATIO = (
    "(CASE WHEN {agree} THEN {m} * CAST(u_den AS DOUBLE) / CAST({num} AS DOUBLE) "
    "ELSE (CAST(1 AS DOUBLE) - {m}) * CAST(u_den AS DOUBLE) "
    "/ CAST(u_den - {num} AS DOUBLE) END)"
)


def _e20_score_sql() -> str:
    r_seg = _E20_RATIO.format(agree="seg_agree", m=_E20_M_SEG, num="u_num_seg")
    r_band = _E20_RATIO.format(
        agree="band_agree", m=_E20_M_BAND, num="u_num_band"
    )
    r_act = _E20_RATIO.format(agree="act_agree", m=_E20_M_ACT, num="u_num_act")
    return (
        f"CAST(ROUND({r_seg} * {r_band} * {r_act} * 1000) AS BIGINT)"
    )


@register(
    "e20_fellegi_sunter",
    oracle=f"""
WITH feat AS (
  SELECT c_custkey AS id, c_nationkey AS nation, c_mktsegment AS seg,
         CAST(FLOOR(c_acctbal / 500) AS BIGINT) AS band,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) % 10 AS digit
  FROM customer
), act AS (
  SELECT f.id,
         CASE WHEN o.cnt IS NULL THEN 0
              WHEN o.cnt <= 2 THEN 1
              WHEN o.cnt <= 5 THEN 2
              ELSE 3 END AS act_band
  FROM feat f LEFT JOIN (
    SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
  ) o ON o.o_custkey = f.id
), rec AS (
  SELECT feat.*, act.act_band FROM feat JOIN act ON act.id = feat.id
), n AS (
  SELECT COUNT(*) AS n_rec, CAST(COUNT(*) AS BIGINT) * COUNT(*) AS u_den
  FROM rec
), useg AS (
  SELECT SUM(c * c) AS u_num_seg FROM (
    SELECT CAST(COUNT(*) AS BIGINT) AS c FROM rec GROUP BY seg)
), uband AS (
  SELECT SUM(c * c) AS u_num_band FROM (
    SELECT CAST(COUNT(*) AS BIGINT) AS c FROM rec GROUP BY band)
), uact AS (
  SELECT SUM(c * c) AS u_num_act FROM (
    SELECT CAST(COUNT(*) AS BIGINT) AS c FROM rec GROUP BY act_band)
), ok AS (
  SELECT nation, digit FROM rec GROUP BY nation, digit
  HAVING COUNT(*) <= {_E20_CAP}
), blocked AS (
  SELECT rec.* FROM rec JOIN ok USING (nation, digit)
), pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         a.seg = b.seg AS seg_agree,
         a.band = b.band AS band_agree,
         a.act_band = b.act_band AS act_agree
  FROM blocked a JOIN blocked b
    ON a.nation = b.nation AND a.digit = b.digit AND a.id < b.id
)
SELECT id_a, id_b, seg_agree, band_agree, act_agree,
       {_e20_score_sql()} AS score_milli
FROM pairs CROSS JOIN n CROSS JOIN useg CROSS JOIN uband CROSS JOIN uact
ORDER BY score_milli DESC, id_a, id_b
LIMIT {_E20_TOPK}
""",
    doc="Fellegi-Sunter linkage scores over blocked candidate pairs: "
    "per-field likelihood ratios with data-estimated u (exact "
    "sum-of-squared-counts rationals), fixed-order double product "
    "rounded to milli-units, capped (nation, balance-digit) blocking, "
    f"TakeOrdered top-{_E20_TOPK}.",
)
def e20_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    feat = c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 500).cast("bigint").alias("band"),
        (F.round(F.col("c_acctbal") * 100).cast("bigint") % 10).alias("digit"),
    )
    cnts = o.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    act_band = (
        F.when(F.col("cnt").isNull(), 0)
        .when(F.col("cnt") <= 2, 1)
        .when(F.col("cnt") <= 5, 2)
        .otherwise(3)
    )
    # Pinned: rec feeds SIX subtrees (the n scalar, three u-statistic
    # rollups, the block census, and both blocked self-join sides) —
    # unpinned, each broadcast build re-ran the customer⋈order-counts
    # join. Six narrow ints per customer.
    rec = (
        feat.join(cnts, feat.id == cnts.o_custkey, "left")
        .select("id", "nation", "seg", "band", "digit", act_band.alias("act_band"))
        .localCheckpoint(eager=True)
    )
    n = rec.agg(
        F.count("*").alias("n_rec"),
        (F.count("*").cast("bigint") * F.count("*")).alias("u_den"),
    )

    def u_num(col: str, alias: str) -> DataFrame:
        return (
            rec.groupBy(col)
            .agg(F.count("*").cast("bigint").alias("c"))
            .agg(F.sum(F.col("c") * F.col("c")).alias(alias))
        )

    ok = (
        rec.groupBy("nation", "digit")
        .agg(F.count("*").alias("bc"))
        .filter(F.col("bc") <= _E20_CAP)
        .drop("bc")
    )
    blocked = rec.join(ok, ["nation", "digit"])
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = a.join(
        b,
        (F.col("a.nation") == F.col("b.nation"))
        & (F.col("a.digit") == F.col("b.digit"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        (F.col("a.seg") == F.col("b.seg")).alias("seg_agree"),
        (F.col("a.band") == F.col("b.band")).alias("band_agree"),
        (F.col("a.act_band") == F.col("b.act_band")).alias("act_agree"),
    )
    scored = (
        pairs.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(u_num("seg", "u_num_seg")))
        .crossJoin(F.broadcast(u_num("band", "u_num_band")))
        .crossJoin(F.broadcast(u_num("act_band", "u_num_act")))
        .select(
            "id_a",
            "id_b",
            "seg_agree",
            "band_agree",
            "act_agree",
            F.expr(_e20_score_sql()).alias("score_milli"),
        )
    )
    return scored.orderBy(
        F.desc("score_milli"), "id_a", "id_b"
    ).limit(_E20_TOPK)


# ---------------------------------------------------------------------------
# E21 — null-safe join semantics (the NULL-key parity battery)
#
# Every engine pair disagrees somewhere on NULLs; joins are where it
# costs rows. This pins the contract: a derived key that is NULL for
# one bucket of rows (NULLIF on a sentinel), joined three ways —
# standard equality (NULL matches nothing), null-safe equality
# (Spark <=>, DuckDB IS NOT DISTINCT FROM: NULL matches NULL), and a
# COALESCE-bridged key (the portable workaround) — with the row
# counts of each proving the semantics byte-for-byte across engines.
# One bounded nation-grain relation on each side.
# ---------------------------------------------------------------------------


@register(
    "e21_null_safe_join",
    oracle="""
WITH l AS (
  SELECT NULLIF(c_nationkey % 5, 0) AS k, CAST(COUNT(*) AS BIGINT) AS n_l
  FROM customer GROUP BY 1
), r AS (
  SELECT NULLIF(s_nationkey % 5, 0) AS k, CAST(COUNT(*) AS BIGINT) AS n_r
  FROM supplier GROUP BY 1
)
SELECT 'coalesce_bridge' AS join_kind,
       CAST(COUNT(*) AS BIGINT) AS n_key_pairs,
       CAST(SUM(l.n_l * r.n_r) AS BIGINT) AS n_row_pairs
FROM l JOIN r ON COALESCE(l.k, -1) = COALESCE(r.k, -1)
UNION ALL
SELECT 'null_safe_eq' AS join_kind,
       CAST(COUNT(*) AS BIGINT) AS n_key_pairs,
       CAST(SUM(l.n_l * r.n_r) AS BIGINT) AS n_row_pairs
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
UNION ALL
SELECT 'standard_eq' AS join_kind,
       CAST(COUNT(*) AS BIGINT) AS n_key_pairs,
       CAST(SUM(l.n_l * r.n_r) AS BIGINT) AS n_row_pairs
FROM l JOIN r ON l.k = r.k
ORDER BY join_kind
""",
    doc="NULL-key join parity: a NULLIF-derived key joined by standard "
    "equality (NULL matches nothing), null-safe equality (Spark <=> / "
    "DuckDB IS NOT DISTINCT FROM) and the portable COALESCE bridge — "
    "key-pair and row-pair counts pin the semantics across engines; "
    "null_safe_eq and coalesce_bridge must agree, standard_eq must "
    "drop exactly the NULL bucket.",
)
def e21_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    l = c.groupBy(
        F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("k")
    ).agg(F.count("*").cast("bigint").alias("n_l"))
    r = s.groupBy(
        F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("k")
    ).agg(F.count("*").cast("bigint").alias("n_r"))
    la, ra = l.alias("la"), r.alias("ra")

    def census(kind: str, cond) -> DataFrame:
        return (
            la.join(ra, cond)
            .agg(
                F.lit(kind).alias("join_kind"),
                F.count("*").cast("bigint").alias("n_key_pairs"),
                F.sum(F.col("la.n_l") * F.col("ra.n_r"))
                .cast("bigint")
                .alias("n_row_pairs"),
            )
        )

    out = (
        census(
            "coalesce_bridge",
            F.coalesce(F.col("la.k"), F.lit(-1))
            == F.coalesce(F.col("ra.k"), F.lit(-1)),
        )
        .unionAll(
            census("null_safe_eq", F.col("la.k").eqNullSafe(F.col("ra.k")))
        )
        .unionAll(census("standard_eq", F.col("la.k") == F.col("ra.k")))
    )
    return out.orderBy("join_kind")
