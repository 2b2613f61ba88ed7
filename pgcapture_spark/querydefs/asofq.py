"""Declared queries for the as-of join and range-join operators (§2.7 custom
additions — shapes Spark lacks as single primitives, rebuilt scale-first).

The as-of oracle uses DuckDB's NATIVE `ASOF LEFT JOIN` — a genuinely
independent implementation of the same semantics, so a hash match is strong
evidence the union+window rewrite is correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcapture_spark.catalog import register_views
from pgcapture_spark.operators.asof import asof_join
from pgcapture_spark.queries import q

# ------------------------------------------------------- as-of join (backward)

_ASOF_DUCK = """
WITH r AS (
  SELECT user_id, ts, max_by(value, event_id) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
l AS (
  SELECT event_id, user_id, ts, value
  FROM events WHERE event_type = 'purchase'
)
SELECT l.event_id, l.user_id, l.ts, l.value,
       r.ts AS asof_ts, r.click_value AS asof_click_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


@q(
    "events_asof_join",
    _ASOF_DUCK,
    "Custom operator: backward as-of join — each purchase enriched with the"
    " user's latest click at-or-before it. Spark side is the union+window"
    " rewrite (one key shuffle, no pair explosion); oracle is DuckDB's native"
    " ASOF JOIN (independent implementation).",
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    ev = spark.table("events")
    right = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("click_value"))
    )
    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return asof_join(left, right, on="user_id", ts="ts", value_cols=["click_value"])


# ------------------------------------------------- range join → bucket assign

# A range join against a SMALL interval dim would plan as a broadcast
# nested-loop join; with UNIFORM bands it collapses to a per-row width_bucket
# assignment — zero join, zero shuffle before the aggregate. The oracle keeps
# the declarative inequality-join form, so the hash match proves the rewrite.
_BANDS = [(i, 50.0 * i, 50.0 * (i + 1)) for i in range(10)]

_RANGE_DUCK = f"""
WITH bands(band_id, lo, hi) AS (
  VALUES {', '.join(f'({b}, {lo}, {hi})' for b, lo, hi in _BANDS)}
)
SELECT band_id, CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band_id, lo, hi
"""


@q(
    "events_range_band_join",
    _RANGE_DUCK,
    "Custom operator: range join against a uniform band dim, rewritten as a"
    " per-row width_bucket assignment (no join, no pre-agg shuffle); oracle"
    " keeps the inequality-join form.",
)
def events_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    n, lo, hi = len(_BANDS), _BANDS[0][1], _BANDS[-1][2]
    ev = spark.table("events").withColumn(
        "band_id", F.expr(f"width_bucket(value, {lo}, {hi}, {n})") - 1
    )
    return (
        ev.where((F.col("band_id") >= 0) & (F.col("band_id") < n))
        .groupBy("band_id")
        .agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).cast("double")
                / 100.0
            ).alias("sum_value"),
        )
        .select(
            "band_id",
            (F.col("band_id") * 50.0).alias("lo"),
            ((F.col("band_id") + 1) * 50.0).alias("hi"),
            "n_events",
            "sum_value",
        )
    )
