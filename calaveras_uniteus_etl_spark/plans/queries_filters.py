"""Filter / projection / pagination / scalar-function inventory
(SURVEY.md §2.D, §2.J).

The reference builds WHERE clauses as SQL text (core/reports/filters.py);
here the same predicates are composable Column expressions so Catalyst
pushes them into the parquet scan (verify with .explain → PushedFilters).
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from calaveras_uniteus_etl_spark.plans.catalog import register
from calaveras_uniteus_etl_spark.plans.tables import load_tables, table

# ---------------------------------------------------------------------------
# D1 — date-range filter (reference: core/reports/filters.py:16-54)
# ---------------------------------------------------------------------------


@register(
    "d1_date_range_filter",
    oracle="""
SELECT event_id, event_type, user_id
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts <= TIMESTAMP '2024-01-20 00:00:00'
""",
    doc="Start/end date-range predicate pushed to the scan.",
)
def d1_date_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.plans.tables import events_in_range

    return events_in_range(
        spark, sf_dir, "2024-01-10 00:00:00", "2024-01-20 00:00:00"
    ).select("event_id", "event_type", "user_id")


# ---------------------------------------------------------------------------
# D2 — multi-facet WHERE builder (reference: core/reports/filters.py:57-131)
# ---------------------------------------------------------------------------


@register(
    "d2_multi_facet_filter",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
FROM orders
WHERE o_orderstatus IN ('O', 'P')
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_totalprice >= 50000
""",
    doc="Status + priority + threshold facets ANDed together.",
)
def d2_multi_facet_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderstatus").isin("O", "P")
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_totalprice") >= 50000)
        )
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# D3 — conditional join gating: date filter present → INNER JOIN + COUNT
#      DISTINCT (reference: core/reports/filters.py:134-158)
# ---------------------------------------------------------------------------


@register(
    "d3_demographics_gate",
    oracle="""
SELECT c_mktsegment AS segment, COUNT(DISTINCT c.c_custkey) AS unique_customers
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
WHERE o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
GROUP BY c_mktsegment
""",
    doc="Date-gated demographics: join + COUNT(DISTINCT) path of the "
    "conditional filter builder.",
)
def d3_demographics_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        F.broadcast(c)
        .join(o, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.countDistinct(c.c_custkey).alias("unique_customers"))
    )


# ---------------------------------------------------------------------------
# D4 — NULL / sentinel-value filters (reference: core/reports/handlers.py:87,
#      358 "NOT IN ('undisclosed','')")
# ---------------------------------------------------------------------------


@register(
    "d4_null_sentinel_filter",
    oracle="""
SELECT lang, COUNT(*) AS cnt
FROM documents
WHERE lang IS NOT NULL AND lang NOT IN ('', 'und') AND n_chars > 0
GROUP BY lang
""",
    doc="IS NOT NULL + NOT IN sentinel-set filtering before a rollup.",
)
def d4_null_sentinel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .filter(
            F.col("lang").isNotNull()
            & ~F.col("lang").isin("", "und")
            & (F.col("n_chars") > 0)
        )
        .groupBy("lang")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# D5 — LIKE substring search over selected columns
#      (reference: core/database.py:298-317)
# ---------------------------------------------------------------------------


@register(
    "d5_like_search",
    oracle="""
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_name LIKE '%widget%' OR p_type LIKE '%ECONOMY%'
""",
    doc="OR of LIKE '%term%' predicates across columns.",
)
def d5_like_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    preds = [F.col("p_name").contains("widget"), F.col("p_type").contains("ECONOMY")]
    return p.filter(reduce(or_, preds)).select("p_partkey", "p_name", "p_type")


# ---------------------------------------------------------------------------
# D6 — pagination LIMIT/OFFSET (reference: core/app.py:1774-1820)
# ---------------------------------------------------------------------------


@register(
    "d6_pagination",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus
FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 40
""",
    doc="Keyed pagination: ORDER BY unique key, OFFSET+LIMIT.",
)
def d6_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
        .offset(40)
        .limit(20)
    )


# ---------------------------------------------------------------------------
# D7 — dynamic sort column/direction (reference: core/app.py:2205-2245)
# ---------------------------------------------------------------------------


@register(
    "d7_dynamic_sort",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
""",
    doc="Validated dynamic ORDER BY col DESC with unique-key tiebreak.",
)
def d7_dynamic_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# D8 — SELECT-only ad-hoc SQL gate with auto-LIMIT
#      (reference: core/app.py:2248-2280)
# ---------------------------------------------------------------------------


@register(
    "d8_adhoc_sql_gate",
    oracle="""
SELECT n_name, COUNT(*) AS suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name ORDER BY suppliers DESC, n_name LIMIT 100
""",
    doc="Ad-hoc SQL executed through the SELECT-only guard (auto LIMIT).",
)
def d8_adhoc_sql_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.operators.adhoc import run_select_only

    load_tables(spark, sf_dir)
    return run_select_only(
        spark,
        "SELECT n_name, COUNT(*) AS suppliers "
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
        "GROUP BY n_name ORDER BY suppliers DESC, n_name",
        limit=100,
    )


# ---------------------------------------------------------------------------
# J — scalar function suite (SURVEY §2.J: COALESCE/NULLIF/CAST/concat/
#     ROUND/CASE, incl. the SQLite-CAST divergence handled via try_cast)
# ---------------------------------------------------------------------------


@register(
    "j1_scalar_suite",
    oracle="""
SELECT o_orderkey,
       UPPER(o_orderstatus) AS status_upper,
       o_orderstatus || '-' || o_orderpriority AS status_priority,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_defaulted,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
       ROUND(o_orderkey / 7.0, 2) AS key_ratio,
       COALESCE(TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT), 0)
         AS priority_num,
       COALESCE(TRY_CAST(o_orderstatus AS BIGINT), 0) AS bogus_cast,
       CASE WHEN o_totalprice > 150000 THEN 'large' ELSE 'small' END AS size_label,
       length(o_orderpriority) AS prio_len
FROM orders WHERE o_orderkey < 100
""",
    doc="Scalar-function battery: COALESCE, NULLIF, ||, ROUND, CASE, "
    "length, and SQLite-CAST-as-0 parity via coalesce(try_cast(...), 0).",
)
def j1_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("status_upper"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_priority"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_defaulted"
        ),
        F.col("o_totalprice").cast("decimal(12,2)").cast("double").alias("price_dec"),
        F.round(F.col("o_orderkey") / 7.0, 2).alias("key_ratio"),
        F.coalesce(
            F.substring("o_orderpriority", 1, 1).try_cast("long"), F.lit(0)
        ).alias("priority_num"),
        F.coalesce(F.col("o_orderstatus").try_cast("long"), F.lit(0)).alias(
            "bogus_cast"
        ),
        F.when(F.col("o_totalprice") > 150000, "large")
        .otherwise("small")
        .alias("size_label"),
        F.length("o_orderpriority").alias("prio_len"),
    )


# ---------------------------------------------------------------------------
# J2 — JSON property extraction (semi-structured scalar family)
#
# The events table carries a JSON props column, the warehouse-standard
# shape for sparse attributes. Extraction stays JVM-side
# (get_json_object is a Catalyst expression, no UDF) and the path
# filter + aggregation happen AFTER the parse projection, so at scale
# the single scan parses each props string exactly once. Oracle uses
# DuckDB's built-in JSON extension over identical paths.
# ---------------------------------------------------------------------------


@register(
    "j2_json_props",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k,
       CAST(SUM(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
) WHERE k IS NOT NULL
GROUP BY event_type
ORDER BY event_type
""",
    doc="JSON scalar extraction: get_json_object path parse of the "
    "props column (JVM-side, single parse per row) into per-type "
    "min/max/sum/avg/threshold stats; DuckDB JSON extension as oracle.",
)
def j2_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    return (
        e.filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count("*")).alias("avg_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0))
            .cast("bigint")
            .alias("n_high"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# D9 — keyset (seek) pagination
#
# d6 reproduces the reference's OFFSET pagination; OFFSET must compute
# and discard every earlier row, so page N costs O(N) — fine in SQLite,
# pathological at warehouse scale. The seek form resumes AFTER the last
# seen (sort-key, tiebreak) tuple with a sargable predicate, so every
# page costs the same: pushed scan filter + TakeOrdered page. The
# cursor below is a fixed literal so both engines page identically.
# ---------------------------------------------------------------------------

_D9_CURSOR_DATE = "1995-06-15 00:00:00"  # last seen (o_orderdate, o_orderkey)
_D9_CURSOR_KEY = 900
_D9_PAGE = 20


@register(
    "d9_keyset_pagination",
    oracle=f"""
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
       o_totalprice
FROM orders
WHERE o_orderdate > TIMESTAMP '{_D9_CURSOR_DATE}'
   OR (o_orderdate = TIMESTAMP '{_D9_CURSOR_DATE}' AND o_orderkey > {_D9_CURSOR_KEY})
ORDER BY o_orderdate, o_orderkey
LIMIT {_D9_PAGE}
""",
    doc="Keyset pagination: resume strictly after the cursor tuple "
    "(o_orderdate, o_orderkey) with a sargable predicate + TakeOrdered "
    f"page of {_D9_PAGE} — constant cost per page, unlike d6's OFFSET "
    "scan-and-discard.",
)
def d9_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    cursor_ts = F.lit(_D9_CURSOR_DATE).cast("timestamp")
    return (
        o.filter(
            (F.col("o_orderdate") > cursor_ts)
            | (
                (F.col("o_orderdate") == cursor_ts)
                & (F.col("o_orderkey") > _D9_CURSOR_KEY)
            )
        )
        .orderBy("o_orderdate", "o_orderkey")
        .limit(_D9_PAGE)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
                "o_orderdate"
            ),
            "o_totalprice",
        )
    )


# ---------------------------------------------------------------------------
# D10 — single-pass facet grid (the filter-chip counts a report UI shows)
#
# The reference's report pages run one COUNT query per filter facet;
# at fact scale that is F scans of the fact table. This computes every
# facet's value counts in ONE scan: each row explodes into (facet,
# value) pairs — a constant-width array, no shuffle growth — and a
# single hash aggregate produces the whole grid. The oracle is the
# naive per-facet UNION ALL, proving the fused plan returns exactly
# the chips the F separate queries would.
# ---------------------------------------------------------------------------


@register(
    "d10_facet_grid",
    oracle="""
SELECT 'event_type' AS facet, event_type AS val, COUNT(*) AS cnt
FROM events GROUP BY event_type
UNION ALL
SELECT 'month' AS facet, strftime(ts, '%Y-%m') AS val, COUNT(*) AS cnt
FROM events GROUP BY strftime(ts, '%Y-%m')
UNION ALL
SELECT 'value_band' AS facet,
       CASE WHEN value < 1 THEN 'lt_1'
            WHEN value < 10 THEN '1_to_10'
            ELSE 'gte_10' END AS val,
       COUNT(*) AS cnt
FROM events
GROUP BY CASE WHEN value < 1 THEN 'lt_1'
              WHEN value < 10 THEN '1_to_10'
              ELSE 'gte_10' END
ORDER BY facet, val
""",
    doc="All filter-facet counts (event_type, month, value band) in a "
    "single fact scan: rows explode into constant-width (facet, "
    "value) pairs feeding one hash aggregate — F facets for the "
    "price of one scan instead of F.",
)
def d10_facet_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calaveras_uniteus_etl_spark.functions.datetime_ext import to_month

    e = table(spark, sf_dir, "events").select("event_type", "ts", "value")
    band = (
        F.when(F.col("value") < 1, "lt_1")
        .when(F.col("value") < 10, "1_to_10")
        .otherwise("gte_10")
    )
    pairs = e.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("event_type").alias("facet"),
                    F.col("event_type").alias("val"),
                ),
                F.struct(
                    F.lit("month").alias("facet"),
                    to_month("ts").alias("val"),
                ),
                F.struct(F.lit("value_band").alias("facet"), band.alias("val")),
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(
            F.col("p.facet").alias("facet"), F.col("p.val").alias("val")
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("facet", "val")
    )


# ---------------------------------------------------------------------------
# J3 — string-function battery (the rest of the reference's scalar surface)
#
# The reference's SQL uses SQLite string functions the J1 battery did
# not cover: instr, replace, trim family, lpad/rpad-style padding,
# reverse, repeat. All are Catalyst expressions with DuckDB twins —
# parity is asserted byte-for-byte through the hash canon. Runs on the
# same bounded key window as j1 (constant output, pushed-down range).
# ---------------------------------------------------------------------------


@register(
    "j3_string_suite",
    oracle="""
SELECT c_custkey,
       instr(c_name, '0') AS pos_zero,
       replace(c_name, '#', '~') AS name_swapped,
       trim(c_name) AS name_trim,
       ltrim(c_name, 'C') AS name_ltrim_c,
       rtrim(c_name, '0123456789') AS name_no_digits,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
       rpad(substr(c_name, 1, 4), 6, '.') AS name_dotted,
       reverse(substr(c_name, 1, 6)) AS name_rev,
       repeat('-', CAST(c_custkey % 4 AS INTEGER)) AS dashes,
       substr(c_name, -3) AS name_tail
FROM customer WHERE c_custkey < 80
""",
    doc="String-scalar battery: INSTR, REPLACE, TRIM/LTRIM/RTRIM with "
    "character sets, LPAD/RPAD, REVERSE, REPEAT, negative-index "
    "SUBSTR — the reference's remaining SQLite string surface, all "
    "Catalyst built-ins (no UDFs).",
)
def j3_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 80)
    return c.select(
        "c_custkey",
        F.instr("c_name", "0").cast("bigint").alias("pos_zero"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("~")).alias("name_swapped"),
        F.trim(F.col("c_name")).alias("name_trim"),
        F.ltrim(F.col("c_name"), F.lit("C")).alias("name_ltrim_c"),
        F.rtrim(F.col("c_name"), F.lit("0123456789")).alias("name_no_digits"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.rpad(F.substring("c_name", 1, 4), 6, ".").alias("name_dotted"),
        F.reverse(F.substring("c_name", 1, 6)).alias("name_rev"),
        F.repeat(F.lit("-"), (F.col("c_custkey") % 4).cast("int")).alias("dashes"),
        F.substring(F.col("c_name"), -3, 3).alias("name_tail"),
    )


# ---------------------------------------------------------------------------
# D11 — typeahead prefix suggestions (the serving table behind D5)
#
# D5 answers one LIKE search; a search box needs the PRECOMPUTED
# top-k completions for every prefix — the suggestion table a
# typeahead service loads. Names roll up once, explode to their
# 2- and 3-char prefixes, and a rank window PARTITIONED BY PREFIX
# (parallel across prefixes at any scale) keeps the top 3 per prefix
# by (popularity DESC, name ASC) — a total order, so the cut is
# engine-independent.
# ---------------------------------------------------------------------------

_D11_TOPK = 3


@register(
    "d11_prefix_suggest",
    oracle=f"""
WITH names AS (
  SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY p_name
), exploded AS (
  SELECT substr(p_name, 1, plen) AS prefix, p_name, n_parts
  FROM names CROSS JOIN (SELECT unnest([2, 3]) AS plen) l
  WHERE length(p_name) >= plen
), ranked AS (
  SELECT prefix, p_name, n_parts,
         ROW_NUMBER() OVER (PARTITION BY prefix
                            ORDER BY n_parts DESC, p_name ASC) AS rank
  FROM exploded
)
SELECT prefix, rank, p_name AS suggestion, n_parts
FROM ranked WHERE rank <= {_D11_TOPK}
ORDER BY prefix, rank
""",
    doc="Typeahead suggestion table: every 2- and 3-char prefix of the "
    "part-name vocabulary mapped to its top-3 completions by "
    "popularity (prefix-partitioned rank window, total-order "
    "tiebreak) — the precomputed serving table behind D5's LIKE "
    "search.",
)
def d11_prefix_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    names = p.groupBy("p_name").agg(F.count("*").alias("n_parts"))
    exploded = (
        names.select(
            "p_name",
            "n_parts",
            F.explode(F.array(F.lit(2), F.lit(3))).alias("plen"),
        )
        .filter(F.length("p_name") >= F.col("plen"))
        .select(
            F.expr("substr(p_name, 1, plen)").alias("prefix"),
            "p_name",
            "n_parts",
        )
    )
    w = Window.partitionBy("prefix").orderBy(
        F.desc("n_parts"), F.asc("p_name")
    )
    return (
        exploded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _D11_TOPK)
        .select(
            "prefix",
            "rank",
            F.col("p_name").alias("suggestion"),
            "n_parts",
        )
        .orderBy("prefix", "rank")
    )


# ---------------------------------------------------------------------------
# J4 — array higher-order-function battery (the list-scalar surface)
#
# j1/j3 cover datetime and string scalars; the vector columns make
# the ARRAY surface load-bearing too: size, element filters, bounded
# folds, slices, argmax. Every HOF here is whole-stage-codegen
# JVM-side (the "UDFs are the slow path" rule applied to arrays).
# Cross-engine determinism: counts and max/min compare identical
# doubles; the two folds (l1 norm, head-3 sum) run LEFT-TO-RIGHT in
# both engines (Spark ``aggregate`` ≡ DuckDB ``list_reduce``), so
# the IEEE add sequence — and therefore the result — is bit-identical
# before the 6dp display round.
# ---------------------------------------------------------------------------


@register(
    "j4_array_suite",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive,
       CAST(list_max(embedding) AS DOUBLE) AS max_val,
       CAST(list_min(embedding) AS DOUBLE) AS min_val,
       ROUND(list_reduce(list_transform(embedding, x -> ABS(CAST(x AS DOUBLE))),
                         (a, b) -> a + b), 6) AS l1_norm,
       ROUND(list_reduce(list_transform(embedding[1:3],
                                        x -> CAST(x AS DOUBLE)),
                         (a, b) -> a + b), 6) AS head3_sum,
       CAST(list_position(embedding, list_max(embedding)) AS BIGINT)
         AS argmax_pos
FROM embeddings
WHERE vec_id % 25 = 3
ORDER BY vec_id
""",
    doc="Array HOF battery over the embedding column: size, filtered "
    "count, max/min, left-fold L1 norm and head-3 sum (Spark "
    "aggregate ≡ DuckDB list_reduce — same IEEE add order), 1-based "
    "argmax position; all JVM-side, zero UDFs.",
)
def j4_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 25 == 3
    )
    dbl = "transform(embedding, x -> cast(x as double))"
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.size(F.expr("filter(embedding, x -> x > 0)"))
        .cast("bigint")
        .alias("n_positive"),
        F.array_max("embedding").cast("double").alias("max_val"),
        F.array_min("embedding").cast("double").alias("min_val"),
        F.round(
            F.expr(
                f"aggregate({dbl}, cast(0.0 as double),"
                " (a, x) -> a + abs(x))"
            ),
            6,
        ).alias("l1_norm"),
        F.round(
            F.expr(
                "aggregate(transform(slice(embedding, 1, 3),"
                " x -> cast(x as double)), cast(0.0 as double),"
                " (a, x) -> a + x)"
            ),
            6,
        ).alias("head3_sum"),
        (
            F.expr("array_position(embedding, array_max(embedding))")
        )
        .cast("bigint")
        .alias("argmax_pos"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# D12 — top-k + "Others" rollup (the pie-chart serving shape)
#
# Every share chart wants "top 3 slices + Others": per market
# segment, the three highest-revenue nations keep their names and
# everything else folds into one Others row whose value is the exact
# remainder. Ranks come from a window PARTITIONED by segment
# (parallel at any scale); the fold is a conditional relabel + one
# more exact-decimal aggregate — revenue is conserved by construction
# and the model test asserts it.
# ---------------------------------------------------------------------------

_D12_K = 3


@register(
    "d12_topk_plus_others",
    oracle=f"""
WITH joined AS (
  SELECT c.c_mktsegment AS segment, n.n_name AS nation,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
           AS revenue
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
), ranked AS (
  SELECT segment, nation, revenue,
         ROW_NUMBER() OVER (PARTITION BY segment
                            ORDER BY revenue DESC, nation ASC) AS rnk
  FROM joined
)
SELECT segment,
       CASE WHEN rnk <= {_D12_K} THEN nation ELSE 'Others' END AS slice,
       CAST(CAST(SUM(revenue) AS DECIMAL(38,2)) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_nations
FROM ranked
GROUP BY segment, CASE WHEN rnk <= {_D12_K} THEN nation ELSE 'Others' END
ORDER BY segment, revenue DESC, slice
""",
    doc="Top-3-plus-Others rollup per market segment: segment-"
    "partitioned revenue rank, conditional relabel to 'Others', one "
    "exact-decimal re-aggregate — the pie-chart serving shape with "
    "revenue conserved by construction.",
)
def d12_topk_plus_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    joined = (
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("decimal(38,2)")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("segment").orderBy(
        F.desc("revenue"), F.asc("nation")
    )
    ranked = joined.withColumn("rnk", F.row_number().over(w))
    slice_col = F.when(
        F.col("rnk") <= _D12_K, F.col("nation")
    ).otherwise(F.lit("Others"))
    return (
        ranked.groupBy("segment", slice_col.alias("slice"))
        .agg(
            F.sum("revenue").cast("decimal(38,2)").cast("double").alias(
                "revenue"
            ),
            F.count("*").cast("bigint").alias("n_nations"),
        )
        .orderBy("segment", F.desc("revenue"), "slice")
    )


# ---------------------------------------------------------------------------
# J5 — calendar scalar battery (date_trunc / last_day / add_months /
#      quarter / dayofyear)
#
# j1 covers julianday/strftime; this completes the calendar scalar
# surface with the truncation-and-offset functions reporting layers
# lean on: month/quarter/year truncation, month-end (leap-aware),
# month addition with end-of-month clamping (add_months ≡ DuckDB
# + INTERVAL 1 MONTH), quarter and day-of-year ordinals. Grouping by
# truncated month keeps the output calendar-bounded at any SF.
#
# Cross-engine notes: Spark add_months and DuckDB month-interval
# addition both clamp Jan 31 + 1mo → Feb 28/29; both last_day
# implementations are leap-aware; day-of-year is 1-based in both.
# All outputs surface as ISO date strings/BIGINT (identical canon in
# both engines — DuckDB DATE otherwise round-trips through pandas as
# datetime64) — no floating point anywhere.
# ---------------------------------------------------------------------------


@register(
    "j5_datetime_suite",
    oracle="""
SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR)
         AS month_start,
       CAST(CAST(date_trunc('quarter', o_orderdate) AS DATE) AS VARCHAR)
         AS quarter_start,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
       CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)
            AS VARCHAR) AS next_month_clamped,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy_of_first,
       COUNT(*) AS n_orders
FROM (
  SELECT o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY date_trunc('month', o_orderdate)
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) t
WHERE rn = 1
GROUP BY 1, 2, 3, 4, 5, 6
UNION ALL
SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR),
       NULL, NULL, NULL, NULL, NULL, COUNT(*)
FROM orders GROUP BY 1
ORDER BY month_start, quarter_start NULLS FIRST
""",
    doc="Calendar scalar battery: date_trunc month/quarter, leap-aware "
    "last_day, add_months with end-of-month clamping, quarter and "
    "day-of-year ordinals — evaluated on each month's first order row "
    "(deterministic representative) plus per-month counts, all "
    "DATE/BIGINT outputs.",
)
def j5_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy(F.date_trunc("month", "o_orderdate")).orderBy(
        "o_orderdate", "o_orderkey"
    )
    first = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(
            F.date_trunc("month", "o_orderdate")
            .cast("date")
            .cast("string")
            .alias("month_start"),
            F.date_trunc("quarter", "o_orderdate")
            .cast("date")
            .cast("string")
            .alias("quarter_start"),
            F.last_day(F.col("o_orderdate").cast("date"))
            .cast("string")
            .alias("month_end"),
            F.add_months(F.col("o_orderdate").cast("date"), 1)
            .cast("string")
            .alias("next_month_clamped"),
            F.quarter("o_orderdate").cast("bigint").alias("qtr"),
            F.dayofyear("o_orderdate").cast("bigint").alias("doy_of_first"),
        )
        .agg(F.count("*").alias("n_orders"))
    )
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate")
        .cast("date")
        .cast("string")
        .alias("month_start")
    ).agg(
        F.lit(None).cast("string").alias("quarter_start"),
        F.lit(None).cast("string").alias("month_end"),
        F.lit(None).cast("string").alias("next_month_clamped"),
        F.lit(None).cast("bigint").alias("qtr"),
        F.lit(None).cast("bigint").alias("doy_of_first"),
        F.count("*").alias("n_orders"),
    )
    sel = [
        "month_start",
        "quarter_start",
        "month_end",
        "next_month_clamped",
        "qtr",
        "doy_of_first",
        "n_orders",
    ]
    return (
        first.select(*sel)
        .unionByName(monthly.select(*sel))
        .orderBy("month_start", F.col("quarter_start").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# J6 — conditional / numeric scalar battery
#
# Completes the scalar-parity family (j1 datetime/coalesce, j3
# strings, j4 arrays, j5 datetime edge cases) with the conditional
# and numeric constructs ad-hoc SQL leans on hardest: GREATEST/LEAST,
# TRY_CAST (both the salvageable and the unsalvageable string),
# SIGN, MOD, WIDTH_BUCKET, bitwise AND, and if() — every expression
# JVM-side built-ins on one projection, hash-compared cell-for-cell
# against DuckDB on a deterministic keyed sample.
# ---------------------------------------------------------------------------


@register(
    "j6_conditional_suite",
    oracle="""
SELECT o_orderkey,
       CAST(GREATEST(CAST(o_totalprice AS DECIMAL(12,2)),
                     CAST(100000.00 AS DECIMAL(12,2))) AS DOUBLE)
         AS hi_floor,
       CAST(LEAST(CAST(o_totalprice AS DECIMAL(12,2)),
                  CAST(100000.00 AS DECIMAL(12,2))) AS DOUBLE)
         AS lo_cap,
       TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
       TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
       CAST(SIGN(CAST(o_totalprice AS DECIMAL(12,2))
                 - CAST(150000.00 AS DECIMAL(12,2))) AS INTEGER)
         AS price_sign,
       CAST(o_orderkey % 7 AS BIGINT) AS key_mod7,
       -- DuckDB has no WIDTH_BUCKET: the arithmetic definition below is
       -- what Spark's width_bucket must equal on [0, 600000) / 6
       CAST(CASE WHEN CAST(o_totalprice AS DOUBLE) < 0.0 THEN 0
                 WHEN CAST(o_totalprice AS DOUBLE) >= 600000.0 THEN 7
                 ELSE 1 + FLOOR(CAST(o_totalprice AS DOUBLE) / 100000.0)
            END AS BIGINT) AS price_bucket,
       CAST(o_orderkey & 255 AS BIGINT) AS key_low_bits,
       IF(CAST(o_totalprice AS DECIMAL(12,2))
          > CAST(200000.00 AS DECIMAL(12,2)), 'big', 'small') AS size_label
FROM orders
WHERE o_orderkey % 97 = 5
ORDER BY o_orderkey
""",
    doc="Conditional/numeric scalar battery: GREATEST/LEAST on exact "
    "decimals, TRY_CAST salvage + failure, SIGN, MOD, WIDTH_BUCKET, "
    "bitwise AND, if() — one projection, zero UDFs, cell-exact vs "
    "DuckDB.",
)
def j6_conditional_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 5)
    price = F.col("o_totalprice").cast("decimal(12,2)")
    c100k = F.lit("100000.00").cast("decimal(12,2)")
    c150k = F.lit("150000.00").cast("decimal(12,2)")
    c200k = F.lit("200000.00").cast("decimal(12,2)")
    return o.select(
        "o_orderkey",
        F.greatest(price, c100k).cast("double").alias("hi_floor"),
        F.least(price, c100k).cast("double").alias("lo_cap"),
        F.expr("try_cast(substr(o_orderpriority, 1, 1) as int)").alias(
            "prio_num"
        ),
        F.expr("try_cast(o_orderpriority as int)").alias("bad_cast"),
        F.signum(price - c150k).cast("int").alias("price_sign"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("key_mod7"),
        F.expr(
            "width_bucket(cast(o_totalprice as double), 0.0d, 600000.0d, 6)"
        )
        .cast("bigint")
        .alias("price_bucket"),
        F.expr("o_orderkey & 255").cast("bigint").alias("key_low_bits"),
        F.when(price > c200k, "big").otherwise("small").alias("size_label"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# J7 — regex-function battery (completes the scalar surface)
#
# j3 covered the positional string functions; the reference's search
# endpoints also lean on pattern functions (LIKE variants and regexp
# helpers). Patterns stay in the common Java-regex/RE2 subset
# (character classes, +, anchors — no lookaround, no backrefs) so both
# engines compile identical semantics; parity is byte-for-byte through
# the hash canon on the same bounded key window as j1/j3.
# ---------------------------------------------------------------------------


@register(
    "j7_regex_suite",
    oracle=r"""
SELECT c_custkey,
       regexp_extract(c_name, '([0-9]+)', 1) AS first_digit_run,
       regexp_replace(c_name, '[0-9]', '#', 'g') AS digits_masked,
       CAST(len(regexp_extract_all(c_name, '0+')) AS BIGINT) AS n_zero_runs,
       regexp_matches(c_name, '00') AS has_double_zero,
       (c_name ILIKE '%customer%') AS ilike_hit,
       string_split(c_name, '#')[2] AS after_hash,
       regexp_extract(c_name, '[1-9][0-9]*$') AS nonzero_tail,
       regexp_matches(c_mktsegment, '^(HOUSE|MACH)') AS seg_starts_hm
FROM customer WHERE c_custkey < 80
""",
    doc="Regex-scalar battery: REGEXP_EXTRACT with group, global "
    "REGEXP_REPLACE, match counting, boolean RLIKE, ILIKE, "
    "split-part, anchored extraction — the pattern half of the "
    "reference's search surface, restricted to the Java/RE2 common "
    "subset; all Catalyst built-ins.",
)
def j7_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 80)
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("first_digit_run"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("digits_masked"),
        F.regexp_count("c_name", F.lit(r"0+"))
        .cast("bigint")
        .alias("n_zero_runs"),
        F.col("c_name").rlike("00").alias("has_double_zero"),
        F.expr("c_name ilike '%customer%'").alias("ilike_hit"),
        F.element_at(F.split("c_name", "#"), 2).alias("after_hash"),
        F.regexp_extract("c_name", r"[1-9][0-9]*$", 0).alias("nonzero_tail"),
        F.col("c_mktsegment").rlike("^(HOUSE|MACH)").alias("seg_starts_hm"),
    )


# ---------------------------------------------------------------------------
# J8 — bitwise-function battery (flags, masks, popcount)
#
# The last scalar family: bitwise ops power flag columns, bucket
# masks, and the bit-level sketches elsewhere in this repo (x61's
# hamming verify, x34's bloom words). AND/OR/XOR/NOT, shifts, and
# POPCOUNT over the key window, plus the BIT_OR / BIT_AND / BIT_XOR
# aggregates over a per-key flag byte — all Catalyst built-ins with
# DuckDB twins, byte-exact through the hash canon.
# ---------------------------------------------------------------------------


@register(
    "j8_bitwise_suite",
    oracle="""
WITH k AS (
  SELECT c_custkey, c_custkey % 256 AS flags FROM customer
   WHERE c_custkey < 80
)
SELECT c_custkey,
       flags & 15 AS low_nibble,
       flags | 128 AS with_msb,
       xor(flags, 255) AS inverted_byte,
       flags << 1 AS doubled,
       flags >> 2 AS quartered,
       CAST(bit_count(CAST(flags AS BIGINT)) AS INT) AS popcount,
       CASE WHEN flags & 1 = 1 THEN TRUE ELSE FALSE END AS is_odd,
       (SELECT CAST(bit_or(c_custkey % 256) AS BIGINT) FROM k) AS agg_or,
       (SELECT CAST(bit_and(c_custkey % 256 | 16) AS BIGINT) FROM k)
         AS agg_and,
       (SELECT CAST(bit_xor(c_custkey % 256) AS BIGINT) FROM k) AS agg_xor
FROM k
ORDER BY c_custkey
""",
    doc="Bitwise battery: AND/OR/XOR/shifts/popcount per key plus "
    "BIT_OR/BIT_AND/BIT_XOR aggregates over a flag byte — the scalar "
    "family behind flag columns and the repo's bit-level sketches "
    "(bloom words, hamming verify); all Catalyst built-ins.",
)
def j8_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 80)
    k = c.select(
        "c_custkey", (F.col("c_custkey") % 256).alias("flags")
    )
    aggs = k.agg(
        F.bit_or(F.col("flags")).cast("bigint").alias("agg_or"),
        F.bit_and(F.col("flags").bitwiseOR(16))
        .cast("bigint")
        .alias("agg_and"),
        F.bit_xor(F.col("flags")).cast("bigint").alias("agg_xor"),
    )
    return (
        k.crossJoin(F.broadcast(aggs))  # 1-row scalar
        .select(
            "c_custkey",
            F.col("flags").bitwiseAND(15).alias("low_nibble"),
            F.col("flags").bitwiseOR(128).alias("with_msb"),
            F.col("flags").bitwiseXOR(255).alias("inverted_byte"),
            F.expr("flags << 1").alias("doubled"),
            F.expr("flags >> 2").alias("quartered"),
            F.bit_count("flags").cast("int").alias("popcount"),
            (F.col("flags").bitwiseAND(1) == 1).alias("is_odd"),
            "agg_or",
            "agg_and",
            "agg_xor",
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# D13 — ranking-function tie semantics (the window parity battery)
#
# The four ranking functions disagree exactly where data ties, and a
# report that silently swaps one for another returns different rows.
# This pins all four on a TIE-RICH ordering (quantity has ~heavy
# duplication inside each priority): ROW_NUMBER (arbitrary within
# ties unless totally ordered — so the ordering here adds the unique
# key), RANK (gaps after ties), DENSE_RANK (no gaps), NTILE(4)
# (near-equal buckets), plus PERCENT_RANK pinned at 6dp. Windows are
# priority-partitioned; output is the per-priority census of each
# function's distinct values and maxima — tie semantics in numbers,
# byte-exact across engines.
# ---------------------------------------------------------------------------


@register(
    "d13_rank_semantics",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority AS prio,
         ROW_NUMBER() OVER w AS rn,
         RANK() OVER wq AS rk,
         DENSE_RANK() OVER wq AS drk,
         NTILE(4) OVER w AS nt,
         PERCENT_RANK() OVER wq AS pr
  FROM (SELECT o_orderpriority,
               CAST(round(o_totalprice) AS BIGINT) % 100 AS q,
               o_orderkey
        FROM orders) t
  WINDOW w AS (PARTITION BY prio ORDER BY q, o_orderkey),
         wq AS (PARTITION BY prio ORDER BY q)
)
SELECT prio,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MAX(rn) AS BIGINT) AS max_row_number,
       CAST(MAX(rk) AS BIGINT) AS max_rank,
       CAST(MAX(drk) AS BIGINT) AS distinct_values,
       CAST(COUNT(DISTINCT nt) AS BIGINT) AS n_tiles,
       ROUND(MAX(pr), 6) AS max_percent_rank
FROM ranked
GROUP BY prio
ORDER BY prio
""",
    doc="Ranking-function tie battery on a tie-rich key: ROW_NUMBER "
    "under a total order, RANK (gaps), DENSE_RANK (= distinct tie "
    "groups), NTILE(4), PERCENT_RANK at 6dp — per-priority maxima and "
    "censuses pin each function's tie semantics byte-exactly across "
    "engines; the window-function sibling of e21's NULL-join parity.",
)
def d13_rank_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    t = o.select(
        F.col("o_orderpriority").alias("prio"),
        (F.round(F.col("o_totalprice")).cast("bigint") % 100).alias("q"),
        "o_orderkey",
    )
    w = Window.partitionBy("prio").orderBy("q", "o_orderkey")
    wq = Window.partitionBy("prio").orderBy("q")
    ranked = t.select(
        "prio",
        F.row_number().over(w).alias("rn"),
        F.rank().over(wq).alias("rk"),
        F.dense_rank().over(wq).alias("drk"),
        F.ntile(4).over(w).alias("nt"),
        F.percent_rank().over(wq).alias("pr"),
    )
    return (
        ranked.groupBy("prio")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.max("rn").cast("bigint").alias("max_row_number"),
            F.max("rk").cast("bigint").alias("max_rank"),
            F.max("drk").cast("bigint").alias("distinct_values"),
            F.countDistinct("nt").cast("bigint").alias("n_tiles"),
            F.round(F.max("pr"), 6).alias("max_percent_rank"),
        )
        .orderBy("prio")
    )
