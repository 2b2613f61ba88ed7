"""Relational surface (SURVEY §2.7): the reference exposes raw row events and
leaves relational processing to consumers; this engine materializes CDC state
as tables, so the full Spark SQL surface applies. These queries prove the
standard OLAP shapes — scan/filter/project, multi-way joins (broadcast +
shuffle), aggregation, windows, top-k, sessionization, JSON scalars — against
the DuckDB oracle.

Float policy for cross-engine hash equality: per-row arithmetic stays double
(deterministic in both engines); SUMs go through DECIMAL (exact, order-
independent) and cast back to double at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pgcapture_spark.catalog import register_views
from pgcapture_spark.queries import q

# ------------------------------------------------------------- TPC-H Q1 shape

_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@q(
    "tpch_q1_pricing_summary",
    _Q1_SQL,
    "§2.7: grouped aggregation over the largest table (TPC-H Q1 shape);"
    " decimal-exact sums keep the hash stable across engines.",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_Q1_SQL)


# ------------------------------------------------------------- Q3 shape

_Q3_SQL = """
SELECT l_orderkey,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@q(
    "tpch_q3_shipping_priority",
    _Q3_SQL,
    "§2.7: 3-way join (broadcast dim + shuffle fact) + agg + deterministic"
    " top-k (TPC-H Q3 shape).",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(_Q3_SQL)


# ------------------------------------------------------------- Q5 shape

_Q5_SQL = """
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
"""


@q(
    "tpch_q5_local_supplier",
    _Q5_SQL,
    "§2.7: 6-way join with small-dim broadcasts (TPC-H Q5 shape).",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders", "lineitem", "supplier", "nation", "region"))
    return spark.sql(_Q5_SQL)


# ------------------------------------------------------------- Q6 shape

# the canonical pushdown showcase: single scan, all three predicates reach the
# parquet reader (PushedFilters), two-column ReadSchema, one partial+final agg.
# Discount predicate via integer cents avoids double-literal boundary ambiguity.
_Q6_SQL = """
SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


@q(
    "tpch_q6_forecast_revenue",
    _Q6_SQL,
    "§2.7: scan-heavy filter + global aggregate (TPC-H Q6 shape) — date/"
    "quantity predicates push to the parquet scan, 2-column pruned ReadSchema.",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_Q6_SQL)


# ------------------------------------------------------------- Q10 shape

_Q10_SQL = """
SELECT c_custkey, c_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, acctbal_cents, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@q(
    "tpch_q10_returned_items",
    _Q10_SQL,
    "§2.7: returned-item revenue by customer (TPC-H Q10 shape) — fact-fact"
    " shuffle join + broadcast nation dim + agg + deterministic top-20.",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    return spark.sql(_Q10_SQL)


# ------------------------------------------------------------- semi/anti join

_SEMI_ANTI_SQL = """
SELECT
  (SELECT count(*) FROM customer c WHERE EXISTS
     (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS customers_with_orders,
  (SELECT count(*) FROM customer c WHERE NOT EXISTS
     (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS customers_without_orders
"""


@q(
    "join_semi_anti",
    _SEMI_ANTI_SQL,
    "§2.7: left-semi / left-anti joins — the shapes behind the DDL skip-set"
    " (A6) and dedup maintenance (A1).",
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    cust, orders = spark.table("customer"), spark.table("orders")
    w = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").count()
    wo = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").count()
    return spark.createDataFrame(
        [(w, wo)], "customers_with_orders bigint, customers_without_orders bigint"
    )


# ------------------------------------------------------------- events: windows

_RUNNING_SQL = """
SELECT event_id, user_id, ts, value,
       sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_value,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
FROM events
"""


@q(
    "events_running_window",
    _RUNNING_SQL,
    "§2.7/C2 substrate: per-key ordered window — running sum + row_number,"
    " the primitive behind apply-ordering and debounce.",
)
def events_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_RUNNING_SQL)


_TOPK_SQL = """
SELECT user_id, event_id, ts, value FROM (
  SELECT user_id, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events
) WHERE rn <= 3
"""


@q(
    "events_topk_per_user",
    _TOPK_SQL,
    "§2.7: top-k per group (deterministic tiebreak).",
)
def events_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    df = spark.table("events")
    w = W.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "event_id", "ts", "value")
    )


# ------------------------------------------------------------- sessionization

_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, event_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sessions GROUP BY user_id, session_id
"""

_SESSION_SQL_DUCK = _SESSION_SQL.replace("INTERVAL 30 MINUTE", "INTERVAL 30 MINUTES")


@q(
    "events_sessionize",
    _SESSION_SQL_DUCK,
    "§2.7: sessionization — lag-gap flag + running sum (the batch analog of"
    " streaming session_window).",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_SESSION_SQL)


# ------------------------------------------------------------- JSON scalar

_JSON_SQL_SPARK = """
SELECT event_type,
       CAST(sum(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type
"""

_JSON_SQL_DUCK = """
SELECT event_type,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


@q(
    "events_json_extract",
    _JSON_SQL_DUCK,
    "§2.7: jsonb passthrough consumed via JSON scalar functions (the engine's"
    " analog of the reference's json/jsonb columns, decoders.py:41,120-121).",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_JSON_SQL_SPARK)


# ------------------------------------------------------------- set ops

_SETOPS_SQL = """
SELECT c_nationkey, count(*) AS n FROM (
  SELECT c_nationkey FROM customer WHERE c_acctbal > 0
  UNION ALL
  SELECT s_nationkey FROM supplier
) GROUP BY c_nationkey
"""


@q(
    "setops_union_agg",
    _SETOPS_SQL,
    "§2.7: union (the B4 merge shape) + aggregation.",
)
def setops_union_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "supplier"))
    return spark.sql(_SETOPS_SQL)


_EXCEPT_INTERSECT_SQL = """
SELECT 'except' AS op, c_nationkey FROM (
  SELECT c_nationkey FROM customer
  EXCEPT ALL
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'intersect' AS op, c_nationkey FROM (
  SELECT DISTINCT c_nationkey FROM customer
  INTERSECT
  SELECT DISTINCT s_nationkey FROM supplier
)
"""


@q(
    "setops_except_intersect",
    _EXCEPT_INTERSECT_SQL,
    "§2.7: exceptAll (multiset difference — the dedup-maintenance shape) and"
    " intersect, labeled and unioned into one result.",
)
def setops_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "supplier"))
    cust = spark.table("customer").select("c_nationkey")
    supp = spark.table("supplier").select(F.col("s_nationkey").alias("c_nationkey"))
    ex = cust.exceptAll(supp).select(F.lit("except").alias("op"), "c_nationkey")
    inter = cust.intersect(supp).select(F.lit("intersect").alias("op"), "c_nationkey")
    return ex.unionAll(inter)


# ------------------------------------------------------- approximate distinct

# HLL sketches differ across engines, so the cross-engine contract is the
# ACCURACY BOUND, not the estimate: the oracle asserts the exact count; the
# Spark side asserts its own estimate lands within 5% of exact (rsd=0.01
# sketches are far tighter than that at these cardinalities).
_APPROX_SQL_DUCK = """
SELECT event_type, count(DISTINCT user_id) AS n_exact, true AS approx_within_5pct
FROM events GROUP BY event_type
"""


@q(
    "agg_approx_distinct",
    _APPROX_SQL_DUCK,
    "§2.7: approx_count_distinct (HLL) — estimate checked against the exact"
    " distinct count under the sketch's accuracy contract.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return (
        spark.table("events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("_n_approx"),
        )
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("_n_approx") - F.col("n_exact"))
                <= 0.05 * F.col("n_exact")
            ).alias("approx_within_5pct"),
        )
    )


# ------------------------------------------------------------- rollup

_ROLLUP_SQL = """
SELECT c_mktsegment, o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_price
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY ROLLUP (c_mktsegment, o_orderpriority)
"""


@q(
    "agg_rollup",
    _ROLLUP_SQL,
    "§2.7: hierarchical aggregation (GROUP BY ROLLUP) — subtotal + grand-total"
    " rows in one pass (Expand, single shuffle).",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_ROLLUP_SQL)


# ------------------------------------------------------------- scalar gauntlet

# string/date/math scalar functions with identical cross-engine semantics
# (natural log not log10, floor-based rounding, interval arithmetic — the
# dialect-safe subset; each engine gets its own text below)
_SCALARS_SPARK = """
SELECT o_orderkey,
       upper(o_orderpriority) AS up,
       substring(o_orderpriority, 1, 3) AS sub3,
       length(o_orderstatus) AS status_len,
       concat(o_orderstatus, '-', CAST(o_orderkey % 10 AS STRING)) AS tag,
       lpad(CAST(o_orderkey % 1000 AS STRING), 6, '0') AS padded,
       translate(o_orderpriority, '-', '_') AS translated,
       year(o_orderdate) AS yr, month(o_orderdate) AS mo, day(o_orderdate) AS dom,
       date_trunc('month', o_orderdate) AS month_start,
       o_orderdate + INTERVAL '7' DAY AS plus_week,
       abs(o_totalprice - 100000.0) AS abs_diff,
       CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS price_k,
       CAST(floor(sqrt(o_totalprice) * 1000 + 0.5) AS BIGINT) AS sqrt_q,
       CAST(floor(ln(o_totalprice + 1.0) * 1000 + 0.5) AS BIGINT) AS ln_q,
       pmod(o_orderkey, 7) AS key_mod7,
       CASE WHEN o_totalprice > 150000 THEN 'high'
            WHEN o_totalprice > 50000 THEN 'mid' ELSE 'low' END AS bucket3
FROM orders
WHERE o_orderkey % 37 = 0
"""

_SCALARS_DUCK = """
SELECT o_orderkey,
       upper(o_orderpriority) AS up,
       substring(o_orderpriority, 1, 3) AS sub3,
       length(o_orderstatus) AS status_len,
       o_orderstatus || '-' || CAST(o_orderkey % 10 AS VARCHAR) AS tag,
       lpad(CAST(o_orderkey % 1000 AS VARCHAR), 6, '0') AS padded,
       replace(o_orderpriority, '-', '_') AS translated,
       year(o_orderdate) AS yr, month(o_orderdate) AS mo, day(o_orderdate) AS dom,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       o_orderdate + INTERVAL 7 DAY AS plus_week,
       abs(o_totalprice - 100000.0) AS abs_diff,
       CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS price_k,
       CAST(floor(sqrt(o_totalprice) * 1000 + 0.5) AS BIGINT) AS sqrt_q,
       CAST(floor(ln(o_totalprice + 1.0) * 1000 + 0.5) AS BIGINT) AS ln_q,
       o_orderkey % 7 AS key_mod7,
       CASE WHEN o_totalprice > 150000 THEN 'high'
            WHEN o_totalprice > 50000 THEN 'mid' ELSE 'low' END AS bucket3
FROM orders
WHERE o_orderkey % 37 = 0
"""


@q(
    "scalar_gauntlet",
    _SCALARS_DUCK,
    "§2.7: string/date/math scalar-function surface in one projection —"
    " upper/substring/concat/lpad/translate, year/month/day/date_trunc/"
    " interval arithmetic, abs/floor/sqrt/ln/mod/CASE.",
)
def scalar_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_SCALARS_SPARK)


# (moved from extras: relational LATERAL shape; driver-verified green in r1)

_LATERAL_SPARK = """
SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.totalprice_cents
FROM customer c,
LATERAL (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_cents
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY totalprice_cents DESC, o_orderkey
  LIMIT 2
) t
WHERE c.c_custkey % 10 = 4
"""

_LATERAL_DUCK = _LATERAL_SPARK  # identical syntax in DuckDB


@q(
    "join_lateral_topn",
    _LATERAL_DUCK,
    "§2.7: correlated LATERAL subquery — top-2 orders per customer, the"
    " decorrelated-apply join shape (Catalyst rewrites to a ranked join).",
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_LATERAL_SPARK)


# ------------------------------------------------------------- funnel

_FUNNEL_ORACLE = """
WITH w1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1
  FROM events),
w2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
                      AND ts <= t1 + INTERVAL 48 HOUR THEN ts END)
              OVER (PARTITION BY user_id) AS t2
  FROM w1),
w3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
                      AND ts <= t2 + INTERVAL 48 HOUR THEN ts END)
              OVER (PARTITION BY user_id) AS t3
  FROM w2)
SELECT user_id, max(t1) AS view_ts, max(t2) AS click_ts, max(t3) AS purchase_ts,
       CAST(CASE WHEN max(t1) IS NULL THEN 0
                 WHEN max(t2) IS NULL THEN 1
                 WHEN max(t3) IS NULL THEN 2 ELSE 3 END AS BIGINT) AS funnel_depth
FROM w3 GROUP BY user_id
"""

_FUNNEL_SPARK = """
WITH w1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1
  FROM events),
w2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
                      AND ts <= t1 + INTERVAL 48 HOUR THEN ts END)
              OVER (PARTITION BY user_id) AS t2
  FROM w1),
w3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
                      AND ts <= t2 + INTERVAL 48 HOUR THEN ts END)
              OVER (PARTITION BY user_id) AS t3
  FROM w2)
SELECT user_id, max(t1) AS view_ts, max(t2) AS click_ts, max(t3) AS purchase_ts,
       CAST(CASE WHEN max(t1) IS NULL THEN 0
                 WHEN max(t2) IS NULL THEN 1
                 WHEN max(t3) IS NULL THEN 2 ELSE 3 END AS BIGINT) AS funnel_depth
FROM w3 GROUP BY user_id
"""


@q(
    "events_funnel",
    _FUNNEL_ORACLE,
    "§2.7 relational: sequential conversion funnel (view → click within 48 h"
    " → purchase within 48 h) — the three dependent first-passage times are"
    " chained unordered-frame window minima over ONE user_id partitioning"
    " (one shuffle total; no self-joins per step), then folded per user.",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_FUNNEL_SPARK)


# ------------------------------------------------------------- retention

_RETENTION_ORACLE = """
WITH f AS (SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS cohort
           FROM events GROUP BY user_id),
a AS (SELECT DISTINCT e.user_id, f.cohort,
             CAST(date_diff('day', f.cohort, date_trunc('day', e.ts)) AS BIGINT)
               AS day_offset
      FROM events e JOIN f USING (user_id))
SELECT cohort, day_offset, CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY cohort, day_offset
"""

_RETENTION_SPARK = """
WITH f AS (SELECT user_id, date_trunc('day', min(ts)) AS cohort
           FROM events GROUP BY user_id),
a AS (SELECT DISTINCT e.user_id, f.cohort,
             CAST(datediff(date_trunc('day', e.ts), f.cohort) AS BIGINT)
               AS day_offset
      FROM events e JOIN f ON e.user_id = f.user_id)
SELECT cohort, day_offset, CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY cohort, day_offset
"""


@q(
    "events_retention_cohorts",
    _RETENTION_ORACLE,
    "§2.7 relational: cohort retention matrix — cohort = first-activity day"
    " per user, one row per (cohort, day-offset) with distinct active users;"
    " the cohort map re-joins on the SAME user_id partitioning the first"
    " aggregate produced (co-located join, distinct folded into the final"
    " small-key aggregate).",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_RETENTION_SPARK)


# ------------------------------------------------------------- transitions

_TRANSITIONS_SQL = """
WITH o AS (SELECT user_id, event_type, ts, event_id,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev_type
           FROM events),
c AS (SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
      FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2),
rt AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total FROM c GROUP BY 1)
SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n, rt.row_total,
       floor(CAST(c.n AS DOUBLE) / rt.row_total * 1000000 + 0.5) / 1000000 AS p_q
FROM c JOIN rt USING (from_type)
"""


@q(
    "events_markov_transitions",
    _TRANSITIONS_SQL,
    "§2.7 relational: first-order event-transition matrix — per-user ordered"
    " lag (one user_id shuffle), global (from, to) counts with map-side"
    " combine, row-normalized probabilities from exact integer counts"
    " (quantized 1e-6) — the Markov-chain view of user behavior that funnel"
    " and retention queries summarize.",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_TRANSITIONS_SQL)


# ------------------------------------------------------------- top paths

# Shared portable SQL: 3-event behavior paths per user (two leads over one
# user_id-keyed window), global exact counts with map-side combine, top-20
# via TakeOrdered (deterministic (count, path) tiebreak) — never a full sort.
_PATHS_SQL = """
WITH o AS (SELECT user_id, event_type, ts, event_id,
                  lead(event_type, 1) OVER w AS e2,
                  lead(event_type, 2) OVER w AS e3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
p AS (SELECT event_type || '>' || e2 || '>' || e3 AS path
      FROM o WHERE e3 IS NOT NULL),
c AS (SELECT path, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY path)
SELECT path, n FROM c ORDER BY n DESC, path LIMIT 20
"""


@q(
    "events_path_topk",
    _PATHS_SQL,
    "§2.7 relational: top-20 three-event behavior paths — the sequence-"
    "pattern rollup (sankey/path analysis) one step beyond the first-order"
    " transition matrix; one user_id window shuffle, exact path counts,"
    " distributed top-k.",
)
def events_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_PATHS_SQL)


# ------------------------------------------------------------- user growth

# Exact running distinct users without any sketch: a user contributes to the
# cumulative count exactly from their first-activity day, so cum_users(day) =
# Σ n_new over days <= day. Heavy work is two user_id-keyed aggregates (the
# min-day map reuses the partitioning); the running sum's single-partition
# window is over the DAY spine — calendar-bounded (365 rows/year) regardless
# of event volume, the same contract as cdc_compaction_plan's segment axis.
_GROWTH_TPL = """
WITH f AS (SELECT user_id, date_trunc('day', min(ts)) AS first_day
           FROM events GROUP BY user_id),
new_u AS (SELECT first_day AS day, CAST(count(*) AS BIGINT) AS n_new
          FROM f GROUP BY 1),
act AS (SELECT date_trunc('day', ts) AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_active,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1)
SELECT a.day, a.n_events, a.n_active,
       COALESCE(n.n_new, 0) AS n_new,
       CAST(sum(COALESCE(n.n_new, 0)) OVER (ORDER BY a.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM act a LEFT JOIN new_u n ON a.day = n.day
"""

_GROWTH_ORACLE = _GROWTH_TPL.replace(
    "date_trunc('day', ts)", "CAST(date_trunc('day', ts) AS TIMESTAMP)"
).replace(
    "date_trunc('day', min(ts))", "CAST(date_trunc('day', min(ts)) AS TIMESTAMP)"
)


@q(
    "events_cumulative_users",
    _GROWTH_ORACLE,
    "§2.7 relational: growth accounting — daily events, distinct actives,"
    " first-time users, and the EXACT cumulative distinct-user count via the"
    " first-seen-day identity (a user counts from their min-activity day, so"
    " the running total is a prefix sum over new-user counts — no sketch, no"
    " re-scan per day). The only global window runs over the calendar-bounded"
    " day spine.",
)
def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_GROWTH_TPL)
