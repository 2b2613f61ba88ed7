"""Window-function and grouping-set surface beyond the shapes already covered
(running sums / row_number in relational.py): ranking, navigation, frames, and
multi-dimensional aggregation — §2.7's "window functions / aggregation"
rows made exhaustive.

Determinism: every window orders by (ts, event_id) — event_id is unique — so
rank/navigation output is stable in both engines. Doubles summed over frames
go through integer cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pgcapture_spark.catalog import register_views
from pgcapture_spark.queries import q

# ------------------------------------------------------- navigation + ranking

_WINDOW_GAUNTLET_SQL = """
SELECT event_id, user_id, ts, value,
       lag(value, 1)  OVER w          AS prev_value,
       lead(value, 1) OVER w          AS next_value,
       lag(value, 2, -1.0) OVER w     AS prev2_default,
       first_value(value) OVER w_full AS first_val,
       last_value(value)  OVER w_full AS last_val,
       nth_value(value, 3) OVER w_full AS third_val,
       ntile(4)       OVER w          AS quartile,
       rank()         OVER w_by_value AS value_rank,
       dense_rank()   OVER w_by_value AS value_dense_rank,
       CAST(floor(percent_rank() OVER w_by_value * 1000000 + 0.5) AS BIGINT)
         AS pct_rank_ppm,
       CAST(floor(cume_dist() OVER w_by_value * 1000000 + 0.5) AS BIGINT)
         AS cume_dist_ppm
FROM events
WHERE user_id % 10 = 3
WINDOW
  w AS (PARTITION BY user_id ORDER BY ts, event_id),
  w_full AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
  w_by_value AS (PARTITION BY user_id ORDER BY value, event_id)
"""


@q(
    "events_window_gauntlet",
    _WINDOW_GAUNTLET_SQL,
    "§2.7: full window-function surface — lag/lead (with default), first/last/"
    "nth_value, ntile, rank/dense_rank, percent_rank/cume_dist (quantized) —"
    " three frames over one scan.",
)
def events_window_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_WINDOW_GAUNTLET_SQL)


# ------------------------------------------------------------- range frames

# RANGE frame over a numeric order column: every event joined with the sum of
# values of events whose event_id is within 1000 behind it, per user.
_RANGE_FRAME_SQL = """
SELECT event_id, user_id,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY event_id
         RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) / 100.0 AS trailing_sum,
       count(*) OVER (
         PARTITION BY user_id ORDER BY event_id
         RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW
       ) AS trailing_n
FROM events
WHERE user_id % 20 = 7
"""


@q(
    "events_range_frame",
    _RANGE_FRAME_SQL,
    "§2.7: RANGE (value-based) window frames — trailing sum/count over an"
    " event_id horizon, distinct from ROWS frames.",
)
def events_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_RANGE_FRAME_SQL)


# ----------------------------------------------------- cube / grouping sets

_CUBE_SQL = """
SELECT c_mktsegment, c_nationkey,
       grouping(c_mktsegment) AS g_seg, grouping(c_nationkey) AS g_nat,
       count(*) AS n,
       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_bal
FROM customer
GROUP BY CUBE (c_mktsegment, c_nationkey)
"""


@q(
    "agg_cube",
    _CUBE_SQL,
    "§2.7: CUBE aggregation with grouping() markers — all four grouping-set"
    " combinations in one Expand pass (complements agg_rollup).",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(_CUBE_SQL)


_GSETS_SQL = """
SELECT event_type, year(ts) AS yr,
       grouping(event_type) AS g_type, grouping(year(ts)) AS g_yr,
       count(*) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_value
FROM events
GROUP BY GROUPING SETS ((event_type), (year(ts)), (event_type, year(ts)))
"""


@q(
    "agg_grouping_sets",
    _GSETS_SQL,
    "§2.7: explicit GROUPING SETS — a non-hierarchical set list (by-type,"
    " by-year, by-both) that neither ROLLUP nor CUBE expresses.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_GSETS_SQL)


# --------------------------------------------------------- percentile contract

# Like agg_approx_distinct: sketch estimates differ across engines, so the
# cross-engine contract is exactness of the TRUE percentile (DuckDB side) plus
# an in-Spark assertion that the sketch lands within rank tolerance.
_PCTL_DUCK = """
SELECT event_type,
       CAST(floor(quantile_disc(value, 0.5) * 100 + 0.5) AS BIGINT) AS p50_cents,
       CAST(floor(quantile_disc(value, 0.95) * 100 + 0.5) AS BIGINT) AS p95_cents,
       true AS approx_within_1pct_rank
FROM events GROUP BY event_type
"""


@q(
    "agg_percentile_contract",
    _PCTL_DUCK,
    "§2.7: exact discrete percentiles (median/p95 via percentile()) checked"
    " cross-engine; approx_percentile additionally asserted within 1%% rank"
    " tolerance of exact, per its sketch contract.",
)
def agg_percentile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        """
        WITH ranked AS (
          SELECT event_type, value,
                 cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
          FROM events
        ),
        exact AS (
          SELECT event_type,
                 CAST(floor(percentile_disc(0.5) WITHIN GROUP (ORDER BY value) * 100 + 0.5) AS BIGINT) AS p50d_cents,
                 CAST(floor(percentile_disc(0.95) WITHIN GROUP (ORDER BY value) * 100 + 0.5) AS BIGINT) AS p95_cents,
                 approx_percentile(value, 0.5, 10000) AS p50_approx,
                 approx_percentile(value, 0.95, 10000) AS p95_approx
          FROM events GROUP BY event_type
        )
        SELECT e.event_type, p50d_cents AS p50_cents, p95_cents,
               coalesce(
                 (SELECT min(cd) FROM ranked r
                  WHERE r.event_type = e.event_type AND r.value >= e.p50_approx)
                   BETWEEN 0.49 AND 0.52
                 AND
                 (SELECT min(cd) FROM ranked r
                  WHERE r.event_type = e.event_type AND r.value >= e.p95_approx)
                   BETWEEN 0.94 AND 0.96, true) AS approx_within_1pct_rank
        FROM exact e
        """
    )


# ------------------------------------------------------------------ pivot

# the DataFrame pivot API (wide-table contingency) — the oracle states the
# same result as explicit conditional aggregation. Pivot values are declared
# literals, so Spark skips the extra distinct-values job (at scale, always
# declare them).
_PIVOT_DUCK = """
SELECT user_id % 10 AS user_bucket,
       count(*) FILTER (event_type = 'click')    AS click,
       count(*) FILTER (event_type = 'error')    AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup')   AS signup,
       count(*) FILTER (event_type = 'view')     AS view
FROM events GROUP BY user_bucket
"""


@q(
    "agg_pivot_counts",
    _PIVOT_DUCK,
    "§2.7: pivot — event-type counts widened to columns per user bucket"
    " (declared pivot values → single-pass Expand, no distinct pre-job).",
)
def agg_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    register_views(spark, sf_dir, ("events",))
    return (
        spark.table("events")
        .withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )
