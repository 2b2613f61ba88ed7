"""Time-series resample + gap-fill with last-observation-carried-forward —
the hypertable-rollup shape (continuous aggregate over fixed buckets, missing
buckets materialized and value-filled). Not in the reference (it ships raw row
events); a north-star time-series addition over the ``events`` table.

Pipeline (all built-in Catalyst ops, no Python):

1. bucket aggregate: ``groupBy(entity, date_trunc(bucket, ts))`` with
   map-side partial combine — count per bucket + the LAST value in the bucket
   (``max_by`` over a deterministic total order, see ``ORD_EXPR``),
2. per-entity spine: ``sequence(min_bucket, max_bucket, interval)`` exploded —
   the dense bucket axis, generated distributed (no driver loop),
3. left join buckets onto the spine (co-partitioned with step 1's exchange),
4. LOCF: ``last(value, ignorenulls) OVER (PARTITION BY entity ORDER BY bucket
   ROWS UNBOUNDED PRECEDING..CURRENT)`` — running state is one value per
   entity, so the window streams.

Scale (100 TB): everything partitions by entity; the spine is |entities| ×
|buckets-in-range| rows generated executor-side; skewed entities can be
range-split by time first. The single shuffle key (entity) is reused by the
bucket agg, the spine join, and the LOCF window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# deterministic total order for "last event in bucket": microseconds since
# 2024-01-01 shifted left 10 bits + event_id mod 1024 as a tie-break for
# equal-microsecond events. Fits int64 for ~285 years of horizon; collisions
# require the same microsecond AND the same event_id mod 1024.
_BASE_US = 1_704_067_200_000_000
# timestampdiff (not unix_micros) so the expression works on TIMESTAMP_NTZ —
# the parquet ts column is MICROS/isAdjustedToUTC=false, which Spark 4 reads
# as NTZ; unix_micros rejects NTZ, and a cast to LTZ would depend on session tz.
ORD_SPARK = (
    f"(timestampdiff(MICROSECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00', ts)) * 1024"
    " + event_id % 1024"
)
ORD_DUCK = f"(epoch_us(ts) - {_BASE_US}) * 1024 + event_id % 1024"


def gapfill_locf(events: DataFrame, entity: str = "user_id", bucket: str = "hour") -> DataFrame:
    """Dense per-entity bucket series: event count, gap flag, and the last
    observed ``value`` carried forward across empty buckets."""
    hourly = (
        events.withColumn("_ord", F.expr(ORD_SPARK))
        .groupBy(entity, F.date_trunc(bucket, "ts").alias("bkt"))
        .agg(
            F.count("*").alias("_n"),
            F.expr("max_by(value, _ord)").alias("_last_val"),
        )
    )
    spine = (
        hourly.groupBy(entity)
        .agg(F.min("bkt").alias("_mn"), F.max("bkt").alias("_mx"))
        .select(
            entity,
            F.explode(F.expr(f"sequence(_mn, _mx, interval 1 {bucket})")).alias("bkt"),
        )
    )
    joined = spine.join(hourly, on=[entity, "bkt"], how="left")
    w = (
        Window.partitionBy(entity)
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        entity,
        "bkt",
        F.coalesce("_n", F.lit(0)).alias("n_events"),
        F.col("_n").isNull().alias("is_gap"),
        F.last("_last_val", ignorenulls=True).over(w).alias("locf_value"),
    )


def gapfill_oracle_sql(where: str, entity: str = "user_id", bucket: str = "hour") -> str:
    """DuckDB oracle: generate_series spine + IGNORE NULLS running window."""
    return f"""
WITH e AS (SELECT *, {ORD_DUCK} AS ord FROM events WHERE {where}),
hourly AS (
  SELECT {entity}, date_trunc('{bucket}', ts) AS bkt, count(*) AS n,
         arg_max(value, ord) AS last_val
  FROM e GROUP BY 1, 2
),
bounds AS (SELECT {entity}, min(bkt) AS mn, max(bkt) AS mx FROM hourly GROUP BY 1),
spine AS (
  SELECT {entity}, unnest(generate_series(mn, mx, INTERVAL 1 {bucket})) AS bkt
  FROM bounds
),
j AS (
  SELECT s.{entity}, s.bkt, h.n, h.last_val
  FROM spine s LEFT JOIN hourly h ON h.{entity} = s.{entity} AND h.bkt = s.bkt
)
SELECT {entity}, bkt, coalesce(n, 0) AS n_events, n IS NULL AS is_gap,
       last_value(last_val IGNORE NULLS) OVER (
         PARTITION BY {entity} ORDER BY bkt
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
FROM j
"""


# ----------------------------------------------- linear interpolation fill

_INTERP_CASE = """
CASE WHEN prev_c IS NOT NULL AND next_c IS NOT NULL AND next_b > prev_b
     THEN floor((prev_c + (next_c - prev_c)
                 * (CAST({dh_prev} AS DOUBLE) / {dh_span}))
          * 10000.0 + 0.5) / 1000000.0
     WHEN prev_c IS NOT NULL THEN CAST(prev_c AS DOUBLE) / 100.0
     WHEN next_c IS NOT NULL THEN CAST(next_c AS DOUBLE) / 100.0
END
"""


def gapfill_interp(events: DataFrame, entity: str = "user_id", bucket: str = "hour") -> DataFrame:
    """Dense per-entity bucket series with LINEAR interpolation across gaps
    (head/tail extended flat) — the hypertable ``interpolate()`` analog to
    :func:`gapfill_locf`.

    Bucket observations are exact integer cents (``arg_max`` under the same
    deterministic ``ORD_SPARK`` order as LOCF); the interpolated double is
    derived from exact ints by an expression tree mirrored verbatim in the
    DuckDB oracle, then quantized to 1e-6. Same scale shape as LOCF: ONE
    entity-key shuffle shared by the bucket agg, the spine join, and BOTH
    direction windows (forward last + backward first are frames over the
    same partitioning)."""
    hourly = (
        events.withColumn("_ord", F.expr(ORD_SPARK))
        .groupBy(entity, F.date_trunc(bucket, "ts").alias("bkt"))
        .agg(
            F.count("*").alias("_n"),
            F.expr(
                "max_by(CAST(floor(value * 100 + 0.5) AS BIGINT), _ord)"
            ).alias("_obs_c"),
        )
    )
    spine = (
        hourly.groupBy(entity)
        .agg(F.min("bkt").alias("_mn"), F.max("bkt").alias("_mx"))
        .select(
            entity,
            F.explode(F.expr(f"sequence(_mn, _mx, interval 1 {bucket})")).alias("bkt"),
        )
    )
    joined = spine.join(hourly, on=[entity, "bkt"], how="left")
    wb = Window.partitionBy(entity).orderBy("bkt")
    back = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = wb.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_bkt = F.when(F.col("_obs_c").isNotNull(), F.col("bkt"))
    d = joined.select(
        entity,
        "bkt",
        F.col("_n").isNull().alias("is_gap"),
        F.last("_obs_c", ignorenulls=True).over(back).alias("prev_c"),
        F.last(obs_bkt, ignorenulls=True).over(back).alias("prev_b"),
        F.first("_obs_c", ignorenulls=True).over(fwd).alias("next_c"),
        F.first(obs_bkt, ignorenulls=True).over(fwd).alias("next_b"),
    )
    interp = _INTERP_CASE.format(
        dh_prev="timestampdiff(HOUR, prev_b, bkt)",
        dh_span="timestampdiff(HOUR, prev_b, next_b)",
    )
    return d.select(
        entity, "bkt", "is_gap", F.expr(interp).alias("interp_q")
    )


def gapfill_interp_oracle_sql(where: str, entity: str = "user_id", bucket: str = "hour") -> str:
    """DuckDB oracle mirroring :func:`gapfill_interp` expression-for-
    expression (exact cents in, one shared double tree out)."""
    interp = _INTERP_CASE.format(
        dh_prev="date_diff('hour', prev_b, bkt)",
        dh_span="date_diff('hour', prev_b, next_b)",
    )
    return f"""
WITH e AS (SELECT *, {ORD_DUCK} AS ord FROM events WHERE {where}),
hourly AS (
  SELECT {entity}, date_trunc('{bucket}', ts) AS bkt, count(*) AS n,
         arg_max(CAST(floor(value * 100 + 0.5) AS BIGINT), ord) AS obs_c
  FROM e GROUP BY 1, 2
),
bounds AS (SELECT {entity}, min(bkt) AS mn, max(bkt) AS mx FROM hourly GROUP BY 1),
spine AS (
  SELECT {entity}, unnest(generate_series(mn, mx, INTERVAL 1 {bucket})) AS bkt
  FROM bounds
),
j AS (
  SELECT s.{entity}, s.bkt, h.n, h.obs_c
  FROM spine s LEFT JOIN hourly h ON h.{entity} = s.{entity} AND h.bkt = s.bkt
),
d AS (
  SELECT {entity}, bkt, n IS NULL AS is_gap,
         last_value(obs_c IGNORE NULLS) OVER (
           PARTITION BY {entity} ORDER BY bkt
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_c,
         last_value(CASE WHEN obs_c IS NOT NULL THEN bkt END IGNORE NULLS) OVER (
           PARTITION BY {entity} ORDER BY bkt
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_b,
         first_value(obs_c IGNORE NULLS) OVER (
           PARTITION BY {entity} ORDER BY bkt
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_c,
         first_value(CASE WHEN obs_c IS NOT NULL THEN bkt END IGNORE NULLS) OVER (
           PARTITION BY {entity} ORDER BY bkt
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_b
  FROM j
)
SELECT {entity}, bkt, is_gap, {interp} AS interp_q FROM d
"""
