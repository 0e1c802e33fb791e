"""Deep TPC-H-shape operator coverage (h13+): the join/agg patterns a
reference user's ad-hoc analytics would grow into at warehouse scale.

The reference's report endpoints are flat GROUP BYs over one joined
view (core/app.py report routes; see SURVEY.md §2.E/§2.F); these
queries cover the harder shapes that appear the moment the same data
model is queried at scale: nation-pair volume joins (Q7), market-share
ratios (Q8), distribution-of-counts (Q13), promo share (Q14), argmax
against a global scalar (Q15), correlated-average filters (Q17),
HAVING-gated fact rollups joined back to dimensions (Q18), distinct
counting across a fact link (Q16), exists/not-exists sibling logic
(Q21), and per-group argmin selection (Q2).

Cross-engine determinism follows plans/catalog.py rules: money sums in
exact DECIMAL then DOUBLE, averages as decimal-sum / count, ratio
outputs as double division of identically-derived operands, every
LIMIT under a total order. Testdata has no partsupp table, so Q2/Q11/
Q16-style stock relations are derived from lineitem supplier links.

Scale notes (100 TB shapes): dimension sides (nation, region,
supplier, part, customer) broadcast and PRUNE the fact scans before
any shuffle; the only fact-fact shuffle is lineitem⋈orders on
orderkey, entered with both sides already dimension-filtered. Fact
rollups (per-order, per-part, per-supplier) aggregate BEFORE joining
back to dimensions, so shuffles carry keys + fixed-width aggregates,
never payload columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from calaveras_uniteus_etl_spark.plans import _exact as X
from calaveras_uniteus_etl_spark.plans.catalog import register
from calaveras_uniteus_etl_spark.plans.tables import table

# Exact per-row revenue: dec(12,2) * dec(6,4) products stay exact.
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (1 - CAST(l_discount AS DECIMAL(6,4)))"
)


def _rev() -> F.Column:
    return X.dec("l_extendedprice") * (F.lit(1) - X.dec("l_discount", X.RATE))


# ---------------------------------------------------------------------------
# H13 — nation-pair volume shipping (TPC-H Q7 shape)
# ---------------------------------------------------------------------------

_H13_A, _H13_B = "NATION_1", "NATION_2"


@register(
    "h13_volume_shipping",
    oracle=f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
       CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE (sn.n_name = '{_H13_A}' AND cn.n_name = '{_H13_B}')
   OR (sn.n_name = '{_H13_B}' AND cn.n_name = '{_H13_A}')
GROUP BY sn.n_name, cn.n_name, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    doc="TPC-H Q7 shape: nation-pair revenue by ship year. Both fact "
    "sides are dimension-pruned (supplier and customer filtered to "
    "the 2-nation pair, broadcast) BEFORE the lineitem⋈orders "
    "shuffle — at 100 TB the shuffle moves ~2/25ths of each fact.",
)
def h13_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(_H13_A, _H13_B)
    )
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # Prune each fact with its broadcast dim first; shuffle the two
    # pruned facts on orderkey; pair-filter needs both sides so it
    # sits directly above the join.
    li_s = li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    o_c = o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
    return (
        li_s.join(o_c, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            ((F.col("supp_nation") == _H13_A) & (F.col("cust_nation") == _H13_B))
            | ((F.col("supp_nation") == _H13_B) & (F.col("cust_nation") == _H13_A))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(X.exact_sum(_rev(), "revenue", scale=6))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# H14 — market share ratio (TPC-H Q8 shape)
# ---------------------------------------------------------------------------

_H14_REGION = "ASIA"
_H14_NATION = "NATION_12"  # an ASIA nation: numerator of the share
_H14_TYPE = "PROMO"
_H14_LO, _H14_HI = "1995-01-01 00:00:00", "1997-01-01 00:00:00"


@register(
    "h14_market_share",
    oracle=f"""
WITH base AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         {_REV_SQL} AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = cn.n_regionkey
  WHERE r_name = '{_H14_REGION}' AND p_type = '{_H14_TYPE}'
    AND o_orderdate >= TIMESTAMP '{_H14_LO}'
    AND o_orderdate <  TIMESTAMP '{_H14_HI}'
)
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = '{_H14_NATION}'
                          THEN volume ELSE 0 END) AS DECIMAL(38,6)) AS DOUBLE)
       / CAST(CAST(SUM(volume) AS DECIMAL(38,6)) AS DOUBLE) AS mkt_share,
       CAST(CAST(SUM(volume) AS DECIMAL(38,6)) AS DOUBLE) AS total_volume
FROM base GROUP BY o_year ORDER BY o_year
""",
    doc="TPC-H Q8 shape: one nation's share of a region's PROMO import "
    "volume by order year. Conditional and total sums both exact-"
    "decimal then DOUBLE; the share is one double division of "
    "identically-derived operands (no epsilon). part/supplier/"
    "customer-region prunes broadcast ahead of the fact shuffle.",
)
def h14_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == _H14_REGION)
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == _H14_TYPE)
        .select("p_partkey")
    )
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                n.join(
                    F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
                ).select(F.col("n_nationkey").alias("cn_key"))
            ),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .select("c_custkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_H14_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_H14_HI).cast("timestamp"))
    )
    li_pruned = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).join(
        F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
    )
    o_pruned = o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "o_orderdate"
    )
    vol = _rev()
    num = F.when(F.col("supp_nation") == _H14_NATION, vol).otherwise(
        F.lit(0).cast("decimal(19,6)")
    )
    return (
        li_pruned.join(o_pruned, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(num).cast("decimal(38,6)").cast("double")
                / F.sum(vol).cast("decimal(38,6)").cast("double")
            ).alias("mkt_share"),
            X.exact_sum(vol, "total_volume", scale=6),
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# H15 — customer order-count distribution (TPC-H Q13 shape)
# ---------------------------------------------------------------------------


@register(
    "h15_custdist",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    doc="TPC-H Q13 shape: two-level aggregate — orders per customer "
    "(LEFT join keeps zero-order customers), then the distribution "
    "of those counts. First agg shuffles on custkey, second on the "
    "small c_count domain; no payload columns move.",
)
def h15_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# H16 — promo revenue share (TPC-H Q14 shape)
# ---------------------------------------------------------------------------

_H16_LO, _H16_HI = "1996-01-01 00:00:00", "1996-02-01 00:00:00"


@register(
    "h16_promo_effect",
    oracle=f"""
SELECT 100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN {_REV_SQL} ELSE 0 END) AS DECIMAL(38,6)) AS DOUBLE)
       / CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '{_H16_LO}'
  AND l_shipdate <  TIMESTAMP '{_H16_HI}'
""",
    doc="TPC-H Q14 shape: PROMO share of one ship-month's revenue. "
    "Date range pushed to the lineitem scan (one month of row "
    "groups), part broadcast; single-row output, exact-decimal "
    "conditional sums, one double division.",
)
def h16_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_H16_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_H16_HI).cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = _rev()
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(
        F.lit(0).cast("decimal(19,6)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("decimal(38,6)").cast("double")
                / F.sum(vol).cast("decimal(38,6)").cast("double")
            ).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# H17 — top supplier by quarter revenue (TPC-H Q15 shape)
# ---------------------------------------------------------------------------

_H17_LO, _H17_HI = "1996-01-01 00:00:00", "1996-04-01 00:00:00"


@register(
    "h17_top_supplier",
    oracle=f"""
WITH sr AS (
  SELECT l_suppkey,
         CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_H17_LO}'
    AND l_shipdate <  TIMESTAMP '{_H17_HI}'
  GROUP BY l_suppkey
)
SELECT s_suppkey AS suppkey, s_name AS supplier,
       CAST(total_rev AS DOUBLE) AS total_rev
FROM sr JOIN supplier ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM sr)
ORDER BY suppkey
""",
    doc="TPC-H Q15 shape: supplier(s) achieving the quarter's MAX "
    "revenue. Per-supplier rollup materialized once "
    "(localCheckpoint), max derived from it as a 1-row broadcast; "
    "the equality test stays in exact DECIMAL so ties select "
    "identical rows in both engines.",
)
def h17_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_H17_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_H17_HI).cast("timestamp"))
    )
    sr = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_rev()).cast("decimal(38,6)").alias("total_rev"))
        .localCheckpoint(eager=True)  # scanned by max AND filter: once
    )
    mx = sr.agg(F.max("total_rev").alias("max_rev"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sr.crossJoin(F.broadcast(mx))  # 1-row max: constant cost
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier"),
            F.col("total_rev").cast("double").alias("total_rev"),
        )
        .orderBy("suppkey")
    )


# ---------------------------------------------------------------------------
# H18 — small-quantity revenue loss (TPC-H Q17 shape)
# ---------------------------------------------------------------------------

_H18_BRAND = "Brand#12"


@register(
    "h18_small_qty_avg",
    oracle=f"""
WITH pa AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
         / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
            AS DECIMAL(38,2)) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa ON pa.l_partkey = lineitem.l_partkey
WHERE p_brand = '{_H18_BRAND}'
  AND l_quantity < 0.5 * avg_qty
""",
    doc="TPC-H Q17 shape: decorrelated per-part average — the "
    "correlated subquery becomes a per-part rollup joined back to "
    "the brand-filtered fact. Threshold compares the raw double "
    "quantity against 0.5×(exact-decimal-avg), identical in both "
    "engines. Brand filter prunes via broadcast part before the "
    "rollup join.",
)
def h18_small_qty_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == _H18_BRAND)
        .select("p_partkey")
    )
    # Per-part average over the FULL fact (the correlated subquery's
    # domain), but only brand parts reach the final join — semi-prune
    # the rollup with the broadcast brand list so the shuffle carries
    # ~1/25th of the part domain.
    brand_li = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    pa = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "semi")
        .groupBy("l_partkey")
        .agg(
            (
                F.sum(X.dec("l_quantity")).cast("double") / F.count("*")
            ).alias("avg_qty")
        )
        .withColumnRenamed("l_partkey", "pa_partkey")
    )
    return (
        brand_li.join(
            F.broadcast(pa), F.col("l_partkey") == F.col("pa_partkey")
        )
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (
                F.sum(X.dec("l_extendedprice"))
                .cast("decimal(38,2)")
                .cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# H19 — large-volume orders (TPC-H Q18 shape)
# ---------------------------------------------------------------------------

_H19_QTY = 250


@register(
    "h19_large_volume_orders",
    oracle=f"""
SELECT c_name, o_orderkey AS orderkey,
       CAST(o_totalprice AS DOUBLE) AS totalprice,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
            AS DECIMAL(38,2)) AS DOUBLE) AS total_qty
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
JOIN customer ON c_custkey = o_custkey
GROUP BY c_name, o_orderkey, o_totalprice
HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > {_H19_QTY}
ORDER BY totalprice DESC, orderkey
LIMIT 100
""",
    doc="TPC-H Q18 shape: orders whose line quantity sum exceeds a "
    "threshold. The HAVING gate runs on a per-orderkey rollup FIRST "
    "(fact-only shuffle, two columns), and only surviving orderkeys "
    "join orders+customer — at 100 TB the expensive join sees ~1% "
    "of orders, not all of them. Exact-decimal HAVING both sides.",
)
def h19_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(X.dec("l_quantity")).alias("qty_sum"))
        .filter(F.col("qty_sum") > _H19_QTY)
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.col("qty_sum").cast("decimal(38,2)").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), "orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# H20 — supplier variety per part group (TPC-H Q16 shape)
# ---------------------------------------------------------------------------

_H20_EXCL = "Brand#1"


@register(
    "h20_supplier_variety",
    oracle=f"""
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON l_partkey = p_partkey
WHERE p_brand <> '{_H20_EXCL}' AND p_size BETWEEN 10 AND 40
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
LIMIT 50
""",
    doc="TPC-H Q16 shape (lineitem links stand in for partsupp): "
    "distinct suppliers per (brand, type). Part filter broadcast-"
    "prunes the fact; COUNT(DISTINCT) expands to a two-phase "
    "distinct-then-count under AQE, shuffling only 3 key columns.",
)
def h20_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != _H20_EXCL) & F.col("p_size").between(10, 40)
    ).select("p_partkey", "p_brand", "p_type")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# H21 — sole-failing-supplier orders (TPC-H Q21 shape)
# ---------------------------------------------------------------------------


@register(
    "h21_waiting_orders",
    oracle="""
WITH ord AS (
  SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp
  FROM lineitem GROUP BY l_orderkey
), rflag AS (
  SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_r_supp
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM (SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
      FROM lineitem l1
      JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R') l1
JOIN ord ON ord.l_orderkey = l1.l_orderkey
JOIN rflag ON rflag.l_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE ord.n_supp >= 2 AND rflag.n_r_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    doc="TPC-H Q21 shape (returnflag='R' stands in for the missing "
    "receipt/commit dates): suppliers who alone 'failed' multi-"
    "supplier finished orders. The correlated EXISTS / NOT EXISTS "
    "pair decorrelates into per-order distinct-supplier rollups "
    "(n_supp≥2 ∧ n_r_supp=1) joined once — three passes over the "
    "fact's key columns, zero correlated probes.",
)
def h21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    # Both per-order rollups (all suppliers / R-row suppliers) in ONE
    # fact pass and ONE shuffle: countDistinct over a conditional
    # projection replaces the second scan + second aggregation +
    # second semi-join. n_r_supp = 0 for orders with no R rows, which
    # the = 1 gate excludes exactly as the old R-filtered rollup did.
    stats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    gate = stats.filter(
        (F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1)
    ).select("l_orderkey")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"), "semi")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        l1.join(gate, "l_orderkey", "semi")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# H22 — per-part cheapest supplier (TPC-H Q2 shape)
# ---------------------------------------------------------------------------

_H22_MAX_SIZE = 5


@register(
    "h22_min_cost_supplier",
    oracle=f"""
WITH unit AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS min_unit
  FROM lineitem WHERE l_quantity > 0
  GROUP BY l_partkey, l_suppkey
), ranked AS (
  SELECT l_partkey, l_suppkey, min_unit,
         ROW_NUMBER() OVER (PARTITION BY l_partkey
                            ORDER BY min_unit, l_suppkey) AS rn
  FROM unit
)
SELECT p_partkey AS part, s_name AS supplier,
       CAST(min_unit AS DOUBLE) AS unit_price
FROM ranked
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE rn = 1 AND p_size <= {_H22_MAX_SIZE}
ORDER BY part
""",
    doc="TPC-H Q2 shape (lineitem unit prices stand in for partsupp "
    "supplycost): per-part argmin supplier via ROW_NUMBER with a "
    "suppkey tiebreak. The window partitions on partkey (reuses the "
    "rollup's shuffle), per-row double division is IEEE-identical "
    "in both engines, and the size filter broadcast-prunes last "
    "since the rollup is already part-grain (small).",
)
def h22_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 0)
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    )
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("min_unit")
    )
    w = Window.partitionBy("l_partkey").orderBy("min_unit", "l_suppkey")
    ranked = unit.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= _H22_MAX_SIZE)
        .select("p_partkey")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        ranked.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("p_partkey").alias("part"),
            F.col("s_name").alias("supplier"),
            F.col("min_unit").cast("double").alias("unit_price"),
        )
        .orderBy("part")
    )


# ---------------------------------------------------------------------------
# H23 — product-type profit (TPC-H Q9 shape)
#
# Testdata has no partsupp, so supply cost derives from the part
# dimension instead: cost = 0.5 × p_retailprice per unit. Arithmetic
# stays in the exact-decimal domain end to end — l_quantity is
# integral (1..50), so the cost product is dec(19,6) × dec(12,0) and
# the per-row amount keeps scale 6; the sum never rounds.
# ---------------------------------------------------------------------------

_H23_TOKEN = "red "  # Q9's p_name LIKE '%green%' analogue


@register(
    "h23_product_profit",
    oracle=f"""
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       CAST(CAST(SUM(
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l_discount AS DECIMAL(6,4)))
         - CAST(p_retailprice AS DECIMAL(12,2))
           * CAST(0.5 AS DECIMAL(6,4))
           * CAST(l_quantity AS DECIMAL(12,0))
       ) AS DECIMAL(38,6)) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '{_H23_TOKEN}%'
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
""",
    doc="TPC-H Q9 shape: profit (revenue minus derived supply cost) "
    "by supplier nation and order year. The part filter broadcast-"
    "prunes lineitem to ~1/9th before the single fact-fact shuffle "
    "on orderkey; supplier→nation is a broadcast chain; the rollup "
    "carries only (nation, year, amount). Reference ceiling: flat "
    "report GROUP BYs (core/app.py report routes).",
)
def h23_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(_H23_TOKEN))
        .select("p_partkey", "p_retailprice")
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = _rev() - X.dec("p_retailprice") * F.lit("0.5").cast(
        X.RATE
    ) * F.col("l_quantity").cast("decimal(12,0)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(X.exact_sum(amount, "sum_profit", scale=6))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# H24 — late-shipment priority counts (TPC-H Q12 shape)
#
# Testdata has no l_shipmode / l_commitdate / l_receiptdate, so the
# adaptation keeps Q12's exact structure with stand-ins: group by
# l_returnflag (the categorical "mode"), and "late" = shipped more
# than 60 days after the order date (the receipt>commit analogue —
# a cross-table date predicate that cannot be pushed below the join).
# ---------------------------------------------------------------------------

_H24_LO, _H24_HI = "1996-01-01 00:00:00", "1997-01-01 00:00:00"
_H24_LATE_DAYS = 60


@register(
    "h24_late_priority_lines",
    oracle=f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL {_H24_LATE_DAYS} DAY
  AND l_shipdate >= TIMESTAMP '{_H24_LO}'
  AND l_shipdate <  TIMESTAMP '{_H24_HI}'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc="TPC-H Q12 shape: per-category conditional priority counts "
    "under a cross-table lateness predicate. The shipdate range "
    "prunes the lineitem scan (pushed filter); the join carries only "
    "(orderkey, returnflag, shipdate) vs (orderkey, priority, "
    "orderdate); counts fold map-side into 3 groups.",
)
def h24_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(_H24_LO).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(_H24_HI).cast("timestamp_ntz"))
        )
        .select("l_orderkey", "l_returnflag", "l_shipdate")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            >= F.timestamp_add("DAY", F.lit(_H24_LATE_DAYS), F.col("o_orderdate"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# H25 — dominant suppliers of a part family (TPC-H Q20 shape)
#
# Q20's partsupp availability test becomes a shipped-share test:
# keep suppliers who shipped more than 30% of a red part's total 1996
# volume. Quantities are integral, so the threshold compares scaled
# BIGINTs (qty×10 > 3×total) — no doubles anywhere. The correlated
# "more than half the part's total" subquery becomes a window SUM
# over the (part, supplier) rollup, reusing its shuffle partitioning.
# ---------------------------------------------------------------------------

_H25_TOKEN = "red "
_H25_LO, _H25_HI = "1996-01-01 00:00:00", "1997-01-01 00:00:00"


@register(
    "h25_dominant_part_suppliers",
    oracle=f"""
WITH sold AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '{_H25_TOKEN}%'
    AND l_shipdate >= TIMESTAMP '{_H25_LO}'
    AND l_shipdate <  TIMESTAMP '{_H25_HI}'
  GROUP BY l_partkey, l_suppkey
), shares AS (
  SELECT l_suppkey, supp_qty,
         SUM(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
  FROM sold
)
SELECT DISTINCT s_name AS supplier, s_acctbal AS acctbal
FROM shares
JOIN supplier ON s_suppkey = l_suppkey
WHERE supp_qty * 10 > part_qty * 3
ORDER BY supplier
""",
    doc="TPC-H Q20 shape: nested semi-join — suppliers whose shipped "
    "share of any red part exceeds 30%. Part filter broadcast-prunes "
    "the fact scan; the correlated total is a window SUM on the "
    "(part, supplier) rollup (no second shuffle — same partitioning); "
    "the supplier join runs on the tiny qualifying set. Integer-"
    "scaled threshold keeps the predicate exact in both engines.",
)
def h25_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(_H25_TOKEN))
        .select("p_partkey")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(_H25_LO).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(_H25_HI).cast("timestamp_ntz"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    sold = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("supp_qty"))
    )
    shares = sold.withColumn(
        "part_qty", F.sum("supp_qty").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("supp_qty") * 10 > F.col("part_qty") * 3)
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return (
        shares.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("s_name").alias("supplier"), F.col("s_acctbal").alias("acctbal"))
        .distinct()
        .orderBy("supplier")
    )


# ---------------------------------------------------------------------------
# H26 — correlated scalar subquery, decorrelated
#
# The classic "rows above their own group's average" shape — in SQL a
# correlated scalar subquery per row; every serious optimizer
# decorrelates it into one aggregate + join, and that is how it is
# written here (window-avg over the customer partition, then filter).
# Exactness: the per-customer average is exact-decimal sum ÷ count
# (plans/_exact.py contract); the comparison is decimal-vs-double-free
# (both sides exact decimals scaled identically).
# ---------------------------------------------------------------------------


@register(
    "h26_above_avg_orders",
    oracle="""
WITH stats AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
           AS s,
         COUNT(*) AS n
  FROM orders GROUP BY o_custkey
)
SELECT o.o_custkey AS custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN CAST(o.o_totalprice AS DECIMAL(12,2)) * st.n
                          > st.s THEN 1 ELSE 0 END) AS BIGINT)
         AS above_avg_orders
FROM orders o JOIN stats st ON st.o_custkey = o.o_custkey
WHERE st.n >= 10
GROUP BY o.o_custkey
ORDER BY custkey
""",
    doc="Correlated scalar subquery decorrelated: orders priced above "
    "their own customer's average (price*n > sum avoids any division "
    "— pure exact-decimal integer-scaled comparison), per-customer "
    "counts for customers with >=10 orders.",
)
def h26_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_totalprice").cast("decimal(12,2)").alias("p")
    )
    w = Window.partitionBy("o_custkey")
    stats = o.withColumn("s", F.sum("p").over(w).cast("decimal(38,2)")).withColumn(
        "n", F.count("*").over(w)
    )
    return (
        stats.filter(F.col("n") >= 10)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.when(F.col("p") * F.col("n") > F.col("s"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("above_avg_orders"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# H27 — cumulative-series crossover (TPC-DS Q51 shape)
#
# The one TPC-DS-only window shape the TPC-H sweep lacks: two daily
# cumulative revenue series (urgent-priority vs standard-priority
# orders) full-outer aligned on the day grain, forward-filled where a
# series has no sales that day, then compared day-by-day — on how
# many days is the urgent curve ahead, and what is the maximum lead?
# All windows run on the DAY GRAIN (calendar-bounded — the same
# safe-by-construction argument as f19/f28), revenue stays in exact
# DECIMAL through the cumulative sums, and the lead maximum resolves
# ties with the earlier day.
# ---------------------------------------------------------------------------

_H27_URGENT = ("1-URGENT", "2-HIGH")


@register(
    "h27_cumulative_crossover",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CASE WHEN o_orderpriority IN {_H27_URGENT}
                       THEN CAST(o_totalprice AS DECIMAL(12,2)) END)
              AS DECIMAL(38,2)) AS urgent_rev,
         CAST(SUM(CASE WHEN o_orderpriority NOT IN {_H27_URGENT}
                       THEN CAST(o_totalprice AS DECIMAL(12,2)) END)
              AS DECIMAL(38,2)) AS std_rev
  FROM orders GROUP BY 1
), cum AS (
  SELECT day,
         CAST(SUM(COALESCE(urgent_rev, 0)) OVER w AS DECIMAL(38,2)) AS cu,
         CAST(SUM(COALESCE(std_rev, 0)) OVER w AS DECIMAL(38,2)) AS cs
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(CASE WHEN cu > cs THEN 1 ELSE 0 END) AS BIGINT)
         AS days_urgent_ahead,
       CAST(MAX(cu - cs) AS DOUBLE) AS max_lead,
       CAST(MIN(cu - cs) AS DOUBLE) AS max_deficit,
       strftime((SELECT day FROM cum ORDER BY (cu - cs) DESC, day ASC
                 LIMIT 1), '%Y-%m-%d') AS peak_lead_day
FROM cum
""",
    doc="TPC-DS Q51 shape: urgent vs standard daily revenue as two "
    "cumulative series aligned on the day grain (calendar-bounded "
    "windows), exact-decimal running sums; reports days-ahead count, "
    "max lead/deficit and the peak-lead day (earlier-day tiebreak).",
)
def h27_cumulative_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin(*_H27_URGENT)
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.when(urgent, X.dec("o_totalprice")))
        .cast("decimal(38,2)")
        .alias("urgent_rev"),
        F.sum(F.when(~urgent, X.dec("o_totalprice")))
        .cast("decimal(38,2)")
        .alias("std_rev"),
    )
    # day-grain window: calendar-bounded, safe by construction
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "day",
        F.sum(F.coalesce(F.col("urgent_rev"), F.lit(0).cast("decimal(38,2)")))
        .over(w)
        .cast("decimal(38,2)")
        .alias("cu"),
        F.sum(F.coalesce(F.col("std_rev"), F.lit(0).cast("decimal(38,2)")))
        .over(w)
        .cast("decimal(38,2)")
        .alias("cs"),
    )
    lead = F.col("cu") - F.col("cs")
    peak = (
        cum.orderBy(F.desc(lead.cast("decimal(38,2)")), F.asc("day"))
        .limit(1)
        .select(F.date_format("day", "yyyy-MM-dd").alias("peak_lead_day"))
    )
    return (
        cum.agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum(F.when(F.col("cu") > F.col("cs"), 1).otherwise(0))
            .cast("bigint")
            .alias("days_urgent_ahead"),
            F.max(lead).cast("double").alias("max_lead"),
            F.min(lead).cast("double").alias("max_deficit"),
        )
        .crossJoin(F.broadcast(peak))  # 1-row scalar
    )


# ---------------------------------------------------------------------------
# H28 — year-over-year preference switchers (TPC-DS Q4/Q11 shape)
#
# The customer-grain YoY self-compare TPC-H lacks: customers whose
# urgent-priority spend GREW between two fixed years while standard
# spend SHRANK (channel switchers — Q11 asks the web-vs-store
# version). One aggregate to the (customer, year, channel) grain,
# pivoted by CASE, self-joined per customer across the two years
# (equi-join on custkey), growth compared in exact DECIMAL — no
# doubles anywhere until the output. Output is the switcher census
# per market segment plus their spend swing.
# ---------------------------------------------------------------------------

_H28_Y1, _H28_Y2 = 1999, 2000


@register(
    "h28_yoy_switchers",
    oracle=f"""
WITH grain AS (
  SELECT o_custkey, date_part('year', o_orderdate) AS yr,
         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE 0 END)
              AS DECIMAL(38,2)) AS urgent,
         CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                       THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE 0 END)
              AS DECIMAL(38,2)) AS standard
  FROM orders WHERE date_part('year', o_orderdate) IN ({_H28_Y1}, {_H28_Y2})
  GROUP BY 1, 2
), paired AS (
  SELECT a.o_custkey,
         b.urgent - a.urgent AS urgent_delta,
         b.standard - a.standard AS standard_delta
  FROM grain a JOIN grain b
    ON b.o_custkey = a.o_custkey AND a.yr = {_H28_Y1} AND b.yr = {_H28_Y2}
), switchers AS (
  SELECT p.o_custkey, p.urgent_delta, p.standard_delta
  FROM paired p
  WHERE p.urgent_delta > 0 AND p.standard_delta < 0
)
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_switchers,
       CAST(CAST(SUM(s.urgent_delta) AS DECIMAL(38,2)) AS DOUBLE)
         AS urgent_gain,
       CAST(CAST(SUM(s.standard_delta) AS DECIMAL(38,2)) AS DOUBLE)
         AS standard_loss
FROM switchers s JOIN customer c ON c.c_custkey = s.o_custkey
GROUP BY c.c_mktsegment
ORDER BY segment
""",
    doc="TPC-DS Q4/Q11 shape: customers whose urgent-priority spend "
    "grew 1999->2000 while standard spend shrank (channel "
    "switchers), censused per market segment with exact-decimal "
    "spend swings; customer-grain pivot + per-customer year "
    "self-join.",
)
def h28_yoy_switchers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    grain = (
        o.filter(F.year("o_orderdate").isin(_H28_Y1, _H28_Y2))
        .groupBy("o_custkey", F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(
                F.when(urgent, X.dec("o_totalprice")).otherwise(
                    F.lit(0).cast("decimal(12,2)")
                )
            )
            .cast("decimal(38,2)")
            .alias("urgent"),
            F.sum(
                F.when(~urgent, X.dec("o_totalprice")).otherwise(
                    F.lit(0).cast("decimal(12,2)")
                )
            )
            .cast("decimal(38,2)")
            .alias("standard"),
        )
    )
    a = grain.filter(F.col("yr") == _H28_Y1).select(
        "o_custkey",
        F.col("urgent").alias("u1"),
        F.col("standard").alias("s1"),
    )
    b = grain.filter(F.col("yr") == _H28_Y2).select(
        "o_custkey",
        F.col("urgent").alias("u2"),
        F.col("standard").alias("s2"),
    )
    switchers = (
        a.join(b, "o_custkey")
        .select(
            "o_custkey",
            (F.col("u2") - F.col("u1")).alias("urgent_delta"),
            (F.col("s2") - F.col("s1")).alias("standard_delta"),
        )
        .filter(
            (F.col("urgent_delta") > 0) & (F.col("standard_delta") < 0)
        )
    )
    return (
        switchers.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("bigint").alias("n_switchers"),
            F.sum("urgent_delta")
            .cast("decimal(38,2)")
            .cast("double")
            .alias("urgent_gain"),
            F.sum("standard_delta")
            .cast("decimal(38,2)")
            .cast("double")
            .alias("standard_loss"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# H29 — ranked rollup (TPC-DS Q67 shape)
#
# One ROLLUP pass produces both grains — (segment, nation) detail and
# segment totals — and a rank window then keeps the top 3 WITHIN EACH
# GRAIN: detail rows rank within their segment (partitioned window,
# parallel), total rows rank across the segment domain (bounded by
# the segment vocabulary). GROUPING() distinguishes the levels in
# both engines; revenue stays exact DECIMAL through the Expand and
# both windows; (revenue DESC, name) tiebreaks make every cut
# deterministic.
# ---------------------------------------------------------------------------


@register(
    "h29_ranked_rollup",
    oracle="""
WITH rolled AS (
  SELECT c.c_mktsegment AS segment, n.n_name AS nation,
         GROUPING(n.n_name) AS is_total,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
           AS revenue
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY ROLLUP (c.c_mktsegment, n.n_name)
  HAVING c.c_mktsegment IS NOT NULL
), ranked AS (
  SELECT segment, nation, is_total, revenue,
         CASE WHEN is_total = 0
              THEN ROW_NUMBER() OVER (PARTITION BY is_total, segment
                                      ORDER BY revenue DESC, nation)
              ELSE ROW_NUMBER() OVER (PARTITION BY is_total
                                      ORDER BY revenue DESC, segment)
         END AS rnk
  FROM rolled
)
SELECT CASE WHEN is_total = 1 THEN 'segment_total'
            ELSE 'nation_detail' END AS level,
       segment,
       COALESCE(nation, '(all)') AS nation,
       CAST(revenue AS DOUBLE) AS revenue,
       CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 3
ORDER BY level, segment, rnk
""",
    doc="Ranked rollup (TPC-DS Q67 shape): one ROLLUP pass yields "
    "nation detail and segment totals, rank windows keep the top 3 "
    "within each grain — detail partitioned by segment, totals over "
    "the bounded segment domain; exact-decimal revenue through "
    "Expand and both windows.",
)
def h29_ranked_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    rolled = (
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .rollup("c_mktsegment", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("decimal(38,2)")
            .alias("revenue"),
            F.grouping("n_name").alias("is_total"),
        )
        .filter(F.col("c_mktsegment").isNotNull())
        .withColumnRenamed("c_mktsegment", "segment")
        .withColumnRenamed("n_name", "nation")
    )
    w_detail = Window.partitionBy("is_total", "segment").orderBy(
        F.desc("revenue"), F.asc("nation")
    )
    # totals: one row per segment — the segment vocabulary bounds it
    w_total = Window.partitionBy("is_total").orderBy(
        F.desc("revenue"), F.asc("segment")
    )
    ranked = rolled.withColumn(
        "rnk",
        F.when(
            F.col("is_total") == 0, F.row_number().over(w_detail)
        ).otherwise(F.row_number().over(w_total)),
    )
    return (
        ranked.filter(F.col("rnk") <= 3)
        .select(
            F.when(F.col("is_total") == 1, "segment_total")
            .otherwise("nation_detail")
            .alias("level"),
            "segment",
            F.coalesce(F.col("nation"), F.lit("(all)")).alias("nation"),
            F.col("revenue").cast("double").alias("revenue"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy("level", "segment", "rnk")
    )


# ---------------------------------------------------------------------------
# H30 — multi-band single-scan counts (TPC-DS Q88 shape)
#
# TPC-DS Q88 answers "how many sales fall in each of 8 disjoint bands"
# with EIGHT separate scans cross-joined (s1..s8 subqueries). The
# Spark-first expression is one filtered columnar scan with eight
# conditional aggregates — the scan predicate is the UNION of the
# bands (pushed to parquet), the band split is a map-side CASE, and
# the whole plan is a single partial+final hash aggregate with no
# join at all. At 100 TB that is literally 8× less I/O than the
# benchmark's own formulation.
# ---------------------------------------------------------------------------


@register(
    "h30_multiband_counts",
    oracle="""
SELECT
  CAST(SUM(CASE WHEN l_quantity BETWEEN 1  AND 5  THEN 1 ELSE 0 END) AS BIGINT) AS band1,
  CAST(SUM(CASE WHEN l_quantity BETWEEN 6  AND 10 THEN 1 ELSE 0 END) AS BIGINT) AS band2,
  CAST(SUM(CASE WHEN l_quantity BETWEEN 11 AND 15 THEN 1 ELSE 0 END) AS BIGINT) AS band3,
  CAST(SUM(CASE WHEN l_quantity BETWEEN 16 AND 20 THEN 1 ELSE 0 END) AS BIGINT) AS band4,
  CAST(SUM(CASE WHEN l_quantity BETWEEN 21 AND 25 THEN 1 ELSE 0 END) AS BIGINT) AS band5,
  CAST(SUM(CASE WHEN l_quantity BETWEEN 26 AND 30 THEN 1 ELSE 0 END) AS BIGINT) AS band6,
  CAST(SUM(CASE WHEN l_quantity BETWEEN 31 AND 35 THEN 1 ELSE 0 END) AS BIGINT) AS band7,
  CAST(SUM(CASE WHEN l_quantity BETWEEN 36 AND 40 THEN 1 ELSE 0 END) AS BIGINT) AS band8,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_quantity BETWEEN 1 AND 40
  AND l_discount BETWEEN 0.02 AND 0.08
""",
    doc="TPC-DS Q88-style eight-band census re-expressed as ONE "
    "filtered scan with conditional aggregates instead of eight "
    "cross-joined subqueries; the union-of-bands predicate pushes to "
    "the parquet reader.",
)
def h30_multiband_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 40)
        & F.col("l_discount").between(0.02, 0.08)
    )

    def band(lo: int, hi: int, alias: str):
        return (
            F.sum(
                F.when(F.col("l_quantity").between(lo, hi), 1).otherwise(0)
            )
            .cast("bigint")
            .alias(alias)
        )

    return li.agg(
        band(1, 5, "band1"),
        band(6, 10, "band2"),
        band(11, 15, "band3"),
        band(16, 20, "band4"),
        band(21, 25, "band5"),
        band(26, 30, "band6"),
        band(31, 35, "band7"),
        band(36, 40, "band8"),
        F.count("*").cast("bigint").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# H31 — dense-order buyer distribution (TPC-DS Q34 shape)
#
# Q34's "households buying 15–20 items per trip" pattern: per-order
# line counts band-filtered, rolled up per customer, then the
# DISTRIBUTION of dense-order counts (Q34 lists customers; at 100 TB
# the bounded output is the histogram, Q13-style). Both aggregates
# hash on their natural keys (orderkey, then custkey); output is
# dense-count grain — a dozen rows at any scale.
# ---------------------------------------------------------------------------


@register(
    "h31_dense_order_buyers",
    oracle="""
WITH per_order AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_orderkey
), dense AS (
  SELECT o.o_custkey, CAST(COUNT(*) AS BIGINT) AS n_dense
  FROM per_order p JOIN orders o ON p.l_orderkey = o.o_orderkey
  WHERE p.n_lines BETWEEN 5 AND 7
  GROUP BY o.o_custkey
)
SELECT n_dense AS dense_orders,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM dense GROUP BY n_dense ORDER BY n_dense
""",
    doc="TPC-DS Q34 shape: orders with 5-7 lineitems per customer, "
    "surfaced as the dense-order-count distribution (bounded output) "
    "instead of a customer list.",
)
def h31_dense_order_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").cast("bigint").alias("n_lines")
    )
    dense = (
        per_order.filter(F.col("n_lines").between(5, 7))
        .join(o, per_order.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.count("*").cast("bigint").alias("n_dense"))
    )
    return (
        dense.groupBy(F.col("n_dense").alias("dense_orders"))
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .orderBy("dense_orders")
    )


# ---------------------------------------------------------------------------
# H32 — morning/evening activity ratio (TPC-DS Q90 shape)
#
# Q90 divides web-sales counts in two hour bands; here per event type
# over the event stream: one scan, two conditional counts per group,
# exact-integer ratio. The hour-band predicate is a union pushed to
# the scan; no join (Q90's household-demographics gate has no
# counterpart column, so the band census stands alone).
# ---------------------------------------------------------------------------


@register(
    "h32_am_pm_ratio",
    oracle="""
SELECT event_type,
       CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) BETWEEN 8 AND 11
                     THEN 1 ELSE 0 END) AS BIGINT) AS am_events,
       CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) BETWEEN 19 AND 22
                     THEN 1 ELSE 0 END) AS BIGINT) AS pm_events,
       ROUND(CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) BETWEEN 8 AND 11
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / SUM(CASE WHEN EXTRACT(hour FROM ts) BETWEEN 19 AND 22
                        THEN 1 ELSE 0 END), 6) AS am_pm_ratio
FROM events
WHERE EXTRACT(hour FROM ts) BETWEEN 8 AND 11
   OR EXTRACT(hour FROM ts) BETWEEN 19 AND 22
GROUP BY event_type ORDER BY event_type
""",
    doc="TPC-DS Q90 shape: morning (08-11h) vs evening (19-22h) event "
    "counts and their ratio per event type, one filtered scan with "
    "conditional aggregates.",
)
def h32_am_pm_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("h")
    )
    am = F.col("h").between(8, 11)
    pm = F.col("h").between(19, 22)
    return (
        e.filter(am | pm)
        .groupBy("event_type")
        .agg(
            F.sum(F.when(am, 1).otherwise(0)).cast("bigint").alias("am_events"),
            F.sum(F.when(pm, 1).otherwise(0)).cast("bigint").alias("pm_events"),
            F.round(
                F.sum(F.when(am, 1).otherwise(0)).cast("double")
                / F.sum(F.when(pm, 1).otherwise(0)),
                6,
            ).alias("am_pm_ratio"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# H33 — cross-year repeat part buyers (TPC-DS Q64 shape)
#
# Q64 chains the same sale through two channels/years and compares the
# two acquisitions side by side. On this schema: customers who bought
# the SAME part in both 1999 and 2000, with each year's quantity and
# revenue and the year-over-year revenue delta. The scale posture is
# a single conditional-aggregation pivot: lineitem⋈orders reduces to
# the (custkey, partkey) grain in ONE pass with per-year conditional
# sums — no self-join, no second fact scan, "both years" is each
# year's sum being non-NULL. (The oracle keeps the textbook self-join
# formulation; the results are identical.)
# ---------------------------------------------------------------------------

_H33_Y1, _H33_Y2 = 1999, 2000


@register(
    "h33_repeat_part_buyers",
    oracle=f"""
WITH cpy AS (
  SELECT o.o_custkey AS custkey, l.l_partkey AS partkey,
         EXTRACT(year FROM o.o_orderdate) AS yr,
         CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS BIGINT) AS qty,
         CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS rev
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE EXTRACT(year FROM o.o_orderdate) IN ({_H33_Y1}, {_H33_Y2})
  GROUP BY 1, 2, 3
)
SELECT a.custkey AS custkey, a.partkey AS partkey,
       a.qty AS y1_qty, b.qty AS y2_qty,
       CAST(a.rev AS DOUBLE) AS y1_rev, CAST(b.rev AS DOUBLE) AS y2_rev,
       CAST(b.rev - a.rev AS DOUBLE) AS rev_delta
FROM cpy a
JOIN cpy b ON a.custkey = b.custkey AND a.partkey = b.partkey
WHERE a.yr = {_H33_Y1} AND b.yr = {_H33_Y2}
ORDER BY rev_delta DESC, custkey, partkey
LIMIT 15
""",
    doc="TPC-DS Q64 shape: customers who bought the same part in both "
    f"{_H33_Y1} and {_H33_Y2}, with per-year quantity/revenue and the "
    "YoY revenue delta — one conditional-aggregation pivot on the "
    "(cust, part) grain; the oracle's self-join re-expressed scan-once.",
)
def h33_repeat_part_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The oracle's year-pair self-join is re-expressed as ONE
    # conditional-aggregation pivot on (custkey, partkey): one fact
    # scan, one shuffle, no self-join and no pinned intermediate —
    # "bought in both years" is each year's conditional sum being
    # non-NULL. (An A/B at sf0.1 showed pinning the 3-key aggregate
    # for a self-join is slower than this single pass; the pivot also
    # halves the 100 TB scan cost.)
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("yr")
    )
    y1, y2 = F.col("yr") == _H33_Y1, F.col("yr") == _H33_Y2

    cpy = (
        l.join(o.filter(F.col("yr").isin(_H33_Y1, _H33_Y2)),
               l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(
            F.sum(F.when(y1, X.dec("l_quantity"))).cast("bigint").alias("y1_qty"),
            F.sum(F.when(y2, X.dec("l_quantity"))).cast("bigint").alias("y2_qty"),
            F.sum(F.when(y1, _rev())).cast("decimal(38,6)").alias("rev1"),
            F.sum(F.when(y2, _rev())).cast("decimal(38,6)").alias("rev2"),
        )
        .filter(F.col("y1_qty").isNotNull() & F.col("y2_qty").isNotNull())
    )
    return (
        cpy.select(
            "custkey",
            "partkey",
            "y1_qty",
            "y2_qty",
            F.col("rev1").cast("double").alias("y1_rev"),
            F.col("rev2").cast("double").alias("y2_rev"),
            (F.col("rev2") - F.col("rev1")).cast("double").alias("rev_delta"),
        )
        .orderBy(F.desc("rev_delta"), "custkey", "partkey")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# H34 — weekly demand-vs-shipment shortfall (TPC-DS Q72 shape)
#
# Q72 joins catalog demand to the NEXT week's inventory and flags the
# weeks where stock cannot cover the promised sale. On this schema:
# per (part, order-week) quantity ordered vs the quantity actually
# shipped in the FOLLOWING week — a lag join on a derived weekly grain.
# Both sides are aggregated to (partkey, week) BEFORE the lag join, so
# the shuffle carries one row per part-week; the part dimension joins
# broadcast for the brand rollup. Week = days-since-1992-01-01 div 7
# (integer division — identical in both engines; no ISO-week
# semantics drift).
# ---------------------------------------------------------------------------

_H34_EPOCH = "1992-01-01"


@register(
    "h34_weekly_shortfall",
    oracle=f"""
WITH demand AS (
  SELECT l.l_partkey AS partkey,
         CAST(datediff('day', DATE '{_H34_EPOCH}', o.o_orderdate)
              AS BIGINT) // 7 AS wk,
         CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2)))
              AS DECIMAL(38,2)) AS d_qty
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
), supply AS (
  SELECT l_partkey AS partkey,
         CAST(datediff('day', DATE '{_H34_EPOCH}', l_shipdate)
              AS BIGINT) // 7 AS wk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
              AS DECIMAL(38,2)) AS s_qty
  FROM lineitem
  GROUP BY 1, 2
), lagged AS (
  SELECT d.partkey, d.wk, d.d_qty,
         COALESCE(s.s_qty, CAST(0 AS DECIMAL(38,2))) AS s_qty
  FROM demand d
  LEFT JOIN supply s ON s.partkey = d.partkey AND s.wk = d.wk + 1
)
SELECT p.p_brand AS brand,
       CAST(COUNT(*) AS BIGINT) AS n_part_weeks,
       CAST(SUM(CASE WHEN g.s_qty < g.d_qty THEN 1 ELSE 0 END)
            AS BIGINT) AS n_shortfall,
       ROUND(CAST(SUM(CASE WHEN g.s_qty < g.d_qty THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS shortfall_rate,
       CAST(SUM(CASE WHEN g.d_qty > g.s_qty THEN g.d_qty - g.s_qty
                     ELSE CAST(0 AS DECIMAL(38,2)) END)
            AS DOUBLE) AS backlog_qty
FROM lagged g
JOIN part p ON p.p_partkey = g.partkey
GROUP BY p.p_brand
ORDER BY brand
""",
    doc="TPC-DS Q72 shape: per (part, week) quantity ordered vs the "
    "quantity shipped the FOLLOWING week (lag join on the aggregated "
    "weekly grain), rolled up to brand shortfall counts/rates and the "
    "exact-decimal backlog mass.",
)
def h34_weekly_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")

    def wk(col: str) -> F.Column:
        return F.expr(
            f"CAST(datediff({col}, DATE '{_H34_EPOCH}') AS BIGINT) div 7"
        )

    demand = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            wk("o_orderdate").alias("wk"),
        )
        .agg(F.sum(X.dec("l_quantity")).cast("decimal(38,2)").alias("d_qty"))
    )
    supply = l.groupBy(
        F.col("l_partkey").alias("partkey"),
        wk("l_shipdate").alias("wk"),
    ).agg(F.sum(X.dec("l_quantity")).cast("decimal(38,2)").alias("s_qty"))
    lagged = (
        demand.alias("d")
        .join(
            supply.alias("s"),
            (F.col("s.partkey") == F.col("d.partkey"))
            & (F.col("s.wk") == F.col("d.wk") + 1),
            "left",
        )
        .select(
            F.col("d.partkey").alias("partkey"),
            F.col("d.d_qty").alias("d_qty"),
            F.coalesce(
                F.col("s.s_qty"), F.lit(0).cast("decimal(38,2)")
            ).alias("s_qty"),
        )
    )
    short = F.when(F.col("s_qty") < F.col("d_qty"), 1).otherwise(0)
    return (
        lagged.join(F.broadcast(p), F.col("partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").cast("bigint").alias("n_part_weeks"),
            F.sum(short).cast("bigint").alias("n_shortfall"),
            F.round(
                F.sum(short).cast("double") / F.count("*"), 6
            ).alias("shortfall_rate"),
            F.sum(
                F.when(
                    F.col("d_qty") > F.col("s_qty"),
                    F.col("d_qty") - F.col("s_qty"),
                ).otherwise(F.lit(0).cast("decimal(38,2)"))
            )
            .cast("double")
            .alias("backlog_qty"),
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# H35 — monthly deviation from brand-year average (TPC-DS Q47 shape)
#
# Q47 finds the category/brand months whose sales deviate most from
# the year's average. Shape: one (brand, year, month) aggregate of the
# part-joined fact, a second rollup to (brand, year), joined back —
# no window needed, so the whole plan is two hash aggregates plus a
# broadcast-able dimension-grain join; the deviation filter and the
# top-k run on the bounded brand-month grain.
# ---------------------------------------------------------------------------

_H35_DEV = 0.2  # |month / yearly avg − 1| threshold


@register(
    "h35_month_deviation",
    oracle=f"""
WITH monthly AS (
  SELECT p.p_brand AS brand,
         CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS yr,
         CAST(EXTRACT(month FROM l.l_shipdate) AS BIGINT) AS mon,
         CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS rev
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2, 3
), yearly AS (
  SELECT brand, yr,
         CAST(SUM(rev) AS DECIMAL(38,6)) AS yrev,
         CAST(COUNT(*) AS BIGINT) AS n_months
  FROM monthly GROUP BY brand, yr
)
SELECT m.brand AS brand, m.yr AS yr, m.mon AS mon,
       CAST(m.rev AS DOUBLE) AS revenue,
       ROUND(CAST(y.yrev AS DOUBLE) / y.n_months, 6) AS yearly_avg,
       ROUND(CAST(m.rev AS DOUBLE)
             / (CAST(y.yrev AS DOUBLE) / y.n_months), 6) AS ratio
FROM monthly m JOIN yearly y ON y.brand = m.brand AND y.yr = m.yr
WHERE ABS(CAST(m.rev AS DOUBLE)
          / (CAST(y.yrev AS DOUBLE) / y.n_months) - 1.0) > {_H35_DEV}
ORDER BY ABS(CAST(m.rev AS DOUBLE)
             / (CAST(y.yrev AS DOUBLE) / y.n_months) - 1.0) DESC,
         brand, yr, mon
LIMIT 20
""",
    doc="TPC-DS Q47 shape: brand-months whose revenue deviates more "
    f"than {_H35_DEV:.0%} from the brand's yearly monthly average — "
    "two hash aggregates joined on the bounded (brand, year) grain, "
    "top-20 by deviation magnitude.",
)
def h35_month_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.plans._session_index import materialize

    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    monthly = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").cast("bigint").alias("yr"),
            F.month("l_shipdate").cast("bigint").alias("mon"),
        )
        .agg(F.sum(_rev()).cast("decimal(38,6)").alias("rev"))
    )
    # Pin the bounded (brand, year, month) grain once — the yearly
    # rollup and the month side both read the pinned leaf instead of
    # re-scanning the part-joined fact.
    monthly = materialize(monthly)
    yearly = monthly.groupBy("brand", "yr").agg(
        F.sum("rev").cast("decimal(38,6)").alias("yrev"),
        F.count("*").cast("bigint").alias("n_months"),
    )
    m, y = monthly.alias("m"), yearly.alias("y")
    avg = F.col("y.yrev").cast("double") / F.col("y.n_months")
    ratio = F.col("m.rev").cast("double") / avg
    dev = F.abs(ratio - F.lit(1.0))
    return (
        m.join(
            y,
            (F.col("y.brand") == F.col("m.brand"))
            & (F.col("y.yr") == F.col("m.yr")),
        )
        .filter(dev > F.lit(_H35_DEV))
        .select(
            F.col("m.brand").alias("brand"),
            F.col("m.yr").alias("yr"),
            F.col("m.mon").alias("mon"),
            F.col("m.rev").cast("double").alias("revenue"),
            F.round(avg, 6).alias("yearly_avg"),
            F.round(ratio, 6).alias("ratio"),
            dev.alias("__dev"),
        )
        .orderBy(F.desc("__dev"), "brand", "yr", "mon")
        .limit(20)
        .drop("__dev")
    )


# ---------------------------------------------------------------------------
# H36 — cross-year channel growth comparison (TPC-DS Q11 shape)
#
# Q11's signature move on the TPC-H model: per customer, total spend
# per year (1996 vs 1997) per "channel" (urgent- vs standard-priority
# orders, the stand-in for store vs web), then keep customers whose
# urgent-channel growth ratio beats their standard-channel ratio.
# One conditional-aggregation pivot over the date-pruned fact (the
# h33 lesson: a single hash aggregate, not a year×channel self-join);
# the growth comparison is EXACT — cross-multiplied in decimal, never
# a double-vs-double inequality — and the displayed ratios divide
# identical exact integers. Customer dimension broadcasts.
# Reference anchor: the report surface's year-over-year comparisons
# (core/reports/handlers.py date-window pairs); shape from TPC-DS Q11.
# ---------------------------------------------------------------------------


@register(
    "h36_channel_growth",
    oracle="""
WITH t AS (
  SELECT o_custkey AS ck,
         EXTRACT(year FROM o_orderdate) AS yr,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS u,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders
  WHERE EXTRACT(year FROM o_orderdate) IN (1996, 1997)
), w AS (
  SELECT ck,
         CAST(SUM(CASE WHEN yr = 1996 AND u = 1 THEN cents ELSE 0 END)
              AS BIGINT) AS u94,
         CAST(SUM(CASE WHEN yr = 1997 AND u = 1 THEN cents ELSE 0 END)
              AS BIGINT) AS u95,
         CAST(SUM(CASE WHEN yr = 1996 AND u = 0 THEN cents ELSE 0 END)
              AS BIGINT) AS s94,
         CAST(SUM(CASE WHEN yr = 1997 AND u = 0 THEN cents ELSE 0 END)
              AS BIGINT) AS s95
  FROM t GROUP BY ck
)
SELECT c.c_custkey AS custkey, c.c_name AS name,
       u94 AS urgent_1996_cents, u95 AS urgent_1997_cents,
       s94 AS standard_1996_cents, s95 AS standard_1997_cents,
       ROUND(CAST(u95 AS DOUBLE) / u94, 6) AS urgent_ratio,
       ROUND(CAST(s95 AS DOUBLE) / s94, 6) AS standard_ratio
FROM w JOIN customer c ON c.c_custkey = w.ck
WHERE u94 > 0 AND s94 > 0
  AND CAST(u95 AS DECIMAL(18,0)) * CAST(s94 AS DECIMAL(18,0))
      > CAST(s95 AS DECIMAL(18,0)) * CAST(u94 AS DECIMAL(18,0))
ORDER BY CAST(u95 AS DOUBLE) / u94 DESC, c.c_custkey
LIMIT 20
""",
    doc="TPC-DS Q11 shape: customers whose urgent-channel 1996→1997 "
    "spend growth beats their standard-channel growth — one "
    "conditional-aggregation pivot over the date-pruned orders scan, "
    "exact cross-multiplied ratio comparison in decimal, top-20 by "
    "urgent growth.",
)
def h36_channel_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    cents = (X.dec("o_totalprice") * 100).cast("bigint")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")

    def bucket(yr: int, is_urgent: bool) -> F.Column:
        cond = (F.year("o_orderdate") == yr) & (
            urgent if is_urgent else ~urgent
        )
        return (
            F.sum(F.when(cond, cents).otherwise(F.lit(0)))
            .cast("bigint")
        )

    w = (
        o.filter(F.year("o_orderdate").isin(1996, 1997))
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            bucket(1996, True).alias("u94"),
            bucket(1997, True).alias("u95"),
            bucket(1996, False).alias("s94"),
            bucket(1997, False).alias("s95"),
        )
    )
    d18 = "decimal(18,0)"
    grew_faster = (
        F.col("u95").cast(d18) * F.col("s94").cast(d18)
        > F.col("s95").cast(d18) * F.col("u94").cast(d18)
    )
    ratio = F.col("u95").cast("double") / F.col("u94")
    return (
        w.filter((F.col("u94") > 0) & (F.col("s94") > 0) & grew_faster)
        .join(F.broadcast(c), F.col("ck") == F.col("c_custkey"))
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("u94").alias("urgent_1996_cents"),
            F.col("u95").alias("urgent_1997_cents"),
            F.col("s94").alias("standard_1996_cents"),
            F.col("s95").alias("standard_1997_cents"),
            F.round(ratio, 6).alias("urgent_ratio"),
            F.round(
                F.col("s95").cast("double") / F.col("s94"), 6
            ).alias("standard_ratio"),
            ratio.alias("__r"),
        )
        .orderBy(F.desc("__r"), "custkey")
        .limit(20)
        .drop("__r")
    )
