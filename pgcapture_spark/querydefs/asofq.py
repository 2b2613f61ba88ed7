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


# ------------------------------------------------------- interval overlap

# 10-minute intervals, 10-minute bins (bin width = max interval length, so
# each interval covers at most 2 bins)
_IOV_BIN_US = 600_000_000

_IOV_DUCK = """
WITH a AS (SELECT event_id AS a_id, user_id AS a_user, ts AS a_start,
                  ts + INTERVAL 10 MINUTE AS a_end
           FROM events WHERE event_type = 'error'),
b AS (SELECT event_id AS b_id, user_id AS b_user, ts AS b_start,
             ts + INTERVAL 10 MINUTE AS b_end
      FROM events WHERE event_type = 'click')
SELECT a_id, a_user, b_id, b_user,
       epoch_us(least(a_end, b_end)) - epoch_us(greatest(a_start, b_start))
         AS overlap_us
FROM a JOIN b ON a_start < b_end AND b_start < a_end
"""

_IOV_SPARK = f"""
WITH a AS (SELECT event_id AS a_id, user_id AS a_user,
                  CAST(ts AS TIMESTAMP) AS a_start,
                  CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS a_end
           FROM events WHERE event_type = 'error'),
b AS (SELECT event_id AS b_id, user_id AS b_user,
             CAST(ts AS TIMESTAMP) AS b_start,
             CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS b_end
      FROM events WHERE event_type = 'click'),
ab AS (SELECT *, explode(sequence(
         CAST(floor(unix_micros(a_start) / {_IOV_BIN_US}) AS BIGINT),
         CAST(floor(unix_micros(a_end - INTERVAL 1 MICROSECOND) / {_IOV_BIN_US}) AS BIGINT)
       )) AS bin FROM a),
bb AS (SELECT *, explode(sequence(
         CAST(floor(unix_micros(b_start) / {_IOV_BIN_US}) AS BIGINT),
         CAST(floor(unix_micros(b_end - INTERVAL 1 MICROSECOND) / {_IOV_BIN_US}) AS BIGINT)
       )) AS bin FROM b)
SELECT a_id, a_user, b_id, b_user,
       unix_micros(least(a_end, b_end)) - unix_micros(greatest(a_start, b_start))
         AS overlap_us
FROM ab JOIN bb ON ab.bin = bb.bin
WHERE a_start < b_end AND b_start < a_end
  AND ab.bin = greatest(CAST(floor(unix_micros(a_start) / {_IOV_BIN_US}) AS BIGINT),
                        CAST(floor(unix_micros(b_start) / {_IOV_BIN_US}) AS BIGINT))
"""


@q(
    "events_interval_overlap_join",
    _IOV_DUCK,
    "§2.7 custom join: general interval-overlap join WITHOUT an equi key"
    " (error incident windows × click activity windows, cross-user) — the"
    " bin-fragmentation rewrite: both interval sets explode onto a fixed"
    " time grid (bin width = max interval length → ≤ 2 bins each), the only"
    " corpus operation is the bin equi hash join, and each qualifying pair"
    " is emitted EXACTLY ONCE at the later interval's first bin (the"
    " canonical-bin trick — no pair-dedup shuffle). The oracle is DuckDB's"
    " native inequality join (IEJoin), an independent implementation.",
)
def events_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_IOV_SPARK)
