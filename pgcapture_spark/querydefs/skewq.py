"""Skew-mitigation queries (SURVEY §2.7 / 100 TB design): explicit salting
for hot keys — `events.event_type` has only 5 values over any number of rows,
the canonical skewed-key shape."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcapture_spark.catalog import register_views
from pgcapture_spark.operators.skew import salted_join, two_phase_topk_per_key
from pgcapture_spark.queries import q

# unique, integer-exact ordering key: value has exactly 2 decimals
_ORDKEY = "CAST(floor(value * 100 + 0.5) AS BIGINT) * 100000000 + event_id"

_DUCK_TOPK_SALTED = f"""
WITH e AS (SELECT event_type, event_id, {_ORDKEY} AS ordkey FROM events),
r AS (SELECT event_type, event_id, ordkey,
             row_number() OVER (PARTITION BY event_type ORDER BY ordkey DESC) AS rank
      FROM e)
SELECT event_type, event_id, rank FROM r WHERE rank <= 3
"""


@q(
    "events_topk_salted",
    _DUCK_TOPK_SALTED,
    "Skew: top-k per hot key via two-phase salted ranking — phase 1 bounds"
    " any partition to k·n_salt rows per key, phase 2 re-ranks survivors;"
    " identical to a single window rank.",
)
def events_topk_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    e = spark.table("events").select(
        "event_type", "event_id", F.expr(_ORDKEY).alias("ordkey")
    )
    out = two_phase_topk_per_key(e, "event_type", "ordkey", k=3, n_salt=8)
    return out.select("event_type", "event_id", "rank")


_DUCK_SALTED_JOIN = """
WITH dim AS (SELECT DISTINCT event_type,
                    'cat-' || substr(event_type, 1, 1) AS category
             FROM events)
SELECT d.category, count(*) AS n,
       CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY d.category
"""


@q(
    "events_salted_join",
    _DUCK_SALTED_JOIN,
    "Skew: replicated-fragment (salted) join — big side salted into n_salt"
    " sub-keys, small side replicated per salt, spreading each hot key over"
    " n_salt partitions; row-identical to the plain join.",
)
def events_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    e = spark.table("events").select("event_type", "value")
    dim = (
        spark.table("events")
        .select("event_type")
        .distinct()
        .withColumn("category", F.concat(F.lit("cat-"), F.substring("event_type", 1, 1)))
    )
    joined = salted_join(e, dim, "event_type", n_salt=8)
    return joined.groupBy("category").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).cast("double") / 100.0
        ).alias("sum_value"),
    )
