"""Extended TPC-H query-shape coverage (SURVEY §2.7 relational surface).

The driver's tables are a reduced TPC-H (no partsupp; lineitem lacks
commit/receipt dates and shipmode; customer lacks phone) — each query below
keeps the CLASSIC PLAN SHAPE of its TPC-H counterpart while adapting the
predicates to the available columns:

  q2  — correlated scalar-subquery MIN               (min-cost supplier, lineitem
                                                      unit price as ps_supplycost)
  q4  — semi-join EXISTS into an aggregate           (late-shipped orders)
  q7  — nation-pair volume, two broadcast dims       (year extraction + agg)
  q8  — market-share ratio of conditional sums       (region-filtered star)
  q9  — profit by nation/year with part filter       (margin proxy, no ps_cost)
  q11 — value fraction vs scalar-subquery total      (important stock, lineitem
                                                      value as partsupp value)
  q12 — conditional two-way counts by line status    (CASE aggregation)
  q13 — outer-join distribution-of-counts            (two-level aggregation)
  q14 — promo revenue share                          (ratio of filtered sums)
  q15 — view + scalar MAX join-back                  (top supplier by quarter)
  q16 — distinct-supplier count per part group       (distinct agg + NOT IN dim)
  q17 — small-quantity correlated average            (exact cross-multiplied avg)
  q18 — large-volume orders via HAVING semi-join     (group-filter-join-back)
  q19 — disjunctive multi-column predicate pushdown  (OR-of-ANDs join filter)
  q20 — nested IN with correlated share threshold    (dominant-share suppliers)
  q21 — multi-supplier wait chain (EXISTS/NOT EXISTS double correlated)
  q22 — above-average idle customers                 (anti-join + scalar avg)

Float policy (same as relational.py): money sums go through integer cents /
ten-thousandths so cross-engine hashes are exact; ratios divide two exact
integers at the end (one double op — bit-identical in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pgcapture_spark.catalog import register_views
from pgcapture_spark.queries import q

_CENTS = "CAST(floor({expr} * 10000 + 0.5) AS BIGINT)"


def _rev(expr: str = "l_extendedprice * (1 - l_discount)") -> str:
    return _CENTS.format(expr=expr)


# ------------------------------------------------------------- Q4 shape

_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


@q(
    "tpch_q4_order_priority",
    _Q4_SQL,
    "§2.7: EXISTS → left-semi join feeding an aggregate (TPC-H Q4 shape;"
    " ships-after-order replaces commit<receipt on the reduced schema).",
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(_Q4_SQL)


# ------------------------------------------------------------- Q7 shape

_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(rev) AS DOUBLE) / 10000.0 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         {_rev()} AS rev
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@q(
    "tpch_q7_volume_shipping",
    _Q7_SQL,
    "§2.7: nation-pair shipping volume by year (TPC-H Q7 shape) — twin"
    " broadcast joins against the same dim under aliases, OR'd pair filter.",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation"))
    return spark.sql(_Q7_SQL)


# ------------------------------------------------------------- Q8 shape

_Q8_SQL = f"""
SELECT o_year,
       CAST(sum(CASE WHEN nation = 'NATION_2' THEN rev ELSE 0 END) AS DOUBLE)
         / sum(rev) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         {_rev()} AS rev,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA'
    AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
"""


@q(
    "tpch_q8_market_share",
    _Q8_SQL,
    "§2.7: national market share (TPC-H Q8 shape) — 8-way star join, region"
    " broadcast, ratio of conditional integer-cent sums (exact, then one"
    " double division).",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(
        spark, sf_dir,
        ("part", "lineitem", "orders", "customer", "nation", "region", "supplier"),
    )
    return spark.sql(_Q8_SQL)


# ------------------------------------------------------------- Q9 shape

# margin proxy: no partsupp.ps_supplycost in the reduced schema, so cost =
# p_retailprice * l_quantity plays its role — the plan shape (part-filter scan,
# fact join, nation broadcast, year/nation agg) is identical.
_Q9_SQL = f"""
SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) / 10000.0 AS sum_profit
FROM (
  SELECT n_name AS nation,
         year(o_orderdate) AS o_year,
         {_rev()} - {_CENTS.format(expr="p_retailprice * l_quantity * 0.1")} AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%' OR p_brand = 'Brand#3'
) profit
GROUP BY nation, o_year
"""


@q(
    "tpch_q9_product_profit",
    _Q9_SQL,
    "§2.7: profit by nation/year (TPC-H Q9 shape) — LIKE-filtered part scan"
    " joined through the fact, margin arithmetic in exact cents.",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("part", "lineitem", "supplier", "orders", "nation"))
    return spark.sql(_Q9_SQL)


# ------------------------------------------------------------- Q12 shape

_Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > o_orderdate
GROUP BY l_linestatus
"""


@q(
    "tpch_q12_priority_lines",
    _Q12_SQL,
    "§2.7: conditional two-way counts (TPC-H Q12 shape; linestatus replaces"
    " shipmode on the reduced schema) — CASE aggregation over a fact join.",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(_Q12_SQL)


# ------------------------------------------------------------- Q13 shape

_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@q(
    "tpch_q13_customer_distribution",
    _Q13_SQL,
    "§2.7: distribution of per-customer order counts (TPC-H Q13 shape) —"
    " outer join with a join-side predicate, then a second aggregation over"
    " the first's result.",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_Q13_SQL)


# ------------------------------------------------------------- Q14 shape

_Q14_SQL = f"""
SELECT CAST(100 * sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS DOUBLE)
         / sum(rev) AS promo_revenue
FROM (
  SELECT p_type, {_rev()} AS rev
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
) pr
"""


@q(
    "tpch_q14_promo_revenue",
    _Q14_SQL,
    "§2.7: promo revenue share (TPC-H Q14 shape) — broadcast part join, ratio"
    " of conditional exact sums.",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q14_SQL)


# ------------------------------------------------------------- Q16 shape

_Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#32'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@q(
    "tpch_q16_supplier_cnt",
    _Q16_SQL,
    "§2.7: distinct-count per part group with a NOT-IN dim exclusion (TPC-H"
    " Q16 shape; lineitem plays partsupp on the reduced schema).",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("part", "lineitem", "supplier"))
    return spark.sql(_Q16_SQL)


# ------------------------------------------------------------- Q17 shape

# the correlated `l_quantity < 0.2 * avg(l_quantity)` is cross-multiplied into
# pure integers (5 * qty * n < sum) so both engines compare exactly — no
# float-average boundary ambiguity.
_Q17_SQL = f"""
SELECT CAST(sum(ext) AS DOUBLE) / 10000.0 / 7.0 AS avg_yearly
FROM (
  SELECT {_CENTS.format(expr="l.l_extendedprice")} AS ext
  FROM lineitem l
  JOIN part ON p_partkey = l.l_partkey
  JOIN (
    SELECT l_partkey AS agg_partkey,
           sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS sum_qty_c,
           count(*) AS n_qty
    FROM lineitem GROUP BY l_partkey
  ) pa ON pa.agg_partkey = l.l_partkey
  WHERE p_brand = 'Brand#23'
    AND 5 * CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT) * n_qty < sum_qty_c
) small
"""


@q(
    "tpch_q17_small_qty",
    _Q17_SQL,
    "§2.7: small-quantity revenue vs per-part average (TPC-H Q17 shape) —"
    " correlated average decorrelated into a grouped self-join; the 20%%"
    " threshold compares cross-multiplied integers for exactness.",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q17_SQL)


# ------------------------------------------------------------- Q18 shape

_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_cents,
       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) > 20000
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, totalprice_cents
ORDER BY totalprice_cents DESC, o_orderkey
LIMIT 100
"""


@q(
    "tpch_q18_large_orders",
    _Q18_SQL,
    "§2.7: large-volume orders (TPC-H Q18 shape) — HAVING-filtered group"
    " feeding an IN semi-join back into the 3-way join, deterministic top-100.",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(_Q18_SQL)


# ------------------------------------------------------------- Q19 shape

_Q19_SQL = f"""
SELECT CAST(sum({_rev()}) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@q(
    "tpch_q19_disjunctive",
    _Q19_SQL,
    "§2.7: OR-of-ANDs multi-column predicate across both join sides (TPC-H"
    " Q19 shape) — exercises disjunction pushdown/splitting.",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q19_SQL)


# ------------------------------------------------------------- Q21 shape

_Q21_BODY = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + {d60}
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + {d60}
  )
  AND n_name IN ('NATION_11', 'NATION_12', 'NATION_13')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""

_Q21_SPARK = _Q21_BODY.format(d60="INTERVAL '60' DAY")
_Q21_DUCK = _Q21_BODY.format(d60="INTERVAL 60 DAY")


@q(
    "tpch_q21_waiting_supplier",
    _Q21_DUCK,
    "§2.7: suppliers who alone shipped late on multi-supplier orders (TPC-H"
    " Q21 shape) — double-correlated EXISTS / NOT EXISTS against the same"
    " fact, the hardest decorrelation shape in the suite.",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("supplier", "lineitem", "orders", "nation"))
    return spark.sql(_Q21_SPARK)


# ------------------------------------------------------------- Q22 shape

# scalar average subquery cross-multiplied exactly: bal > avg(bal⁺) becomes
# bal_cents * n_pos > sum_pos_cents (both sides BIGINT).
_Q22_SQL = """
WITH pos AS (
  SELECT sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS sum_c,
         count(*) AS n
  FROM customer
  WHERE c_acctbal > 0.0 AND c_nationkey IN (3, 7, 11, 15, 19, 23)
)
SELECT c_nationkey AS cntry, count(*) AS numcust,
       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS totacctbal
FROM customer, pos
WHERE c_nationkey IN (3, 7, 11, 15, 19, 23)
  AND CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * pos.n > pos.sum_c
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
  )
GROUP BY c_nationkey
"""


@q(
    "tpch_q22_idle_customers",
    _Q22_SQL,
    "§2.7: above-average customers with no recent orders (TPC-H Q22 shape) — scalar"
    " aggregate broadcast-crossed in, anti-join on orders; the avg threshold"
    " is cross-multiplied for exactness.",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_Q22_SQL)


# ------------------------------------------------------------- Q2 shape

# partsupp does not exist in the reduced schema; the observed unit price per
# (part, supplier) from lineitem plays ps_supplycost — the classic Q2 plan
# shape survives: region-filtered dims, correlated scalar-subquery MIN over
# the same derived relation, equality on the minimum.
_Q2_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(floor(l_extendedprice / l_quantity * 10000 + 0.5) AS BIGINT))
           AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, c.unit_cost
FROM part
JOIN cost c     ON p_partkey = c.l_partkey
JOIN supplier   ON s_suppkey = c.l_suppkey
JOIN nation     ON s_nationkey = n_nationkey
JOIN region     ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND p_size < 10
  AND c.unit_cost = (
    SELECT min(c2.unit_cost)
    FROM cost c2
    JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
    JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
    WHERE c2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
  )
"""


@q(
    "tpch_q2_min_cost_supplier",
    _Q2_SQL,
    "§2.7: minimum-cost supplier (TPC-H Q2 shape) — correlated scalar-"
    "subquery MIN over a shared derived relation, decorrelated by Catalyst"
    " into an aggregate + join; region dims broadcast. Unit price from"
    " lineitem stands in for ps_supplycost on the reduced schema; exact"
    " ten-thousandths integers end-to-end.",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("part", "supplier", "lineitem", "nation", "region"))
    return spark.sql(_Q2_SQL)


# ------------------------------------------------------------- Q11 shape

_Q11_SQL = f"""
WITH value AS (
  SELECT l_partkey, CAST(sum({_rev("l_extendedprice")}) AS BIGINT) AS val
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, val
FROM value
WHERE val > (SELECT sum(val) * 0.001 FROM value)
"""


@q(
    "tpch_q11_important_stock",
    _Q11_SQL,
    "§2.7: important-stock identification (TPC-H Q11 shape) — grouped value"
    " per part filtered against a scalar subquery over the SAME aggregate"
    " (global-total fraction); one shuffle reused, the total a one-row"
    " broadcast. Lineitem value stands in for partsupp on the reduced"
    " schema.",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem", "supplier", "nation"))
    return spark.sql(_Q11_SQL)


# ------------------------------------------------------------- Q15 shape

_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, CAST(sum({_rev()}) AS BIGINT) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@q(
    "tpch_q15_top_supplier",
    _Q15_SQL,
    "§2.7: top supplier by quarterly revenue (TPC-H Q15 shape) — the"
    " revenue view computed once, its MAX as a one-row scalar subquery,"
    " equality join-back; exact integer cents so the max has no float"
    " ties.",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem", "supplier"))
    return spark.sql(_Q15_SQL)


# ------------------------------------------------------------- Q20 shape

# ps_availqty does not exist; "supplier shipped more than half of the part's
# 1997 volume" keeps Q20's nested-IN + correlated-threshold plan shape.
_Q20_SQL = """
WITH pq AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
tot AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS part_qty FROM pq GROUP BY l_partkey)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_3', 'NATION_5', 'NATION_7')
  AND s_suppkey IN (
    SELECT pq.l_suppkey
    FROM pq
    JOIN tot  ON tot.l_partkey = pq.l_partkey
    JOIN part ON p_partkey = pq.l_partkey
    WHERE p_name LIKE '%red%' AND pq.qty * 2 > tot.part_qty
  )
"""


@q(
    "tpch_q20_excess_share_supplier",
    _Q20_SQL,
    "§2.7: dominant-share suppliers (TPC-H Q20 shape) — nested IN subquery"
    " (→ left-semi join) whose inner relation compares a grouped quantity"
    " against a correlated per-part total; name-pattern dim filter pushed to"
    " the part scan. Shipped share stands in for ps_availqty on the reduced"
    " schema.",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem", "supplier", "nation", "part"))
    return spark.sql(_Q20_SQL)
