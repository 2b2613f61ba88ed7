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
