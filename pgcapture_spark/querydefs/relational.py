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
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
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
