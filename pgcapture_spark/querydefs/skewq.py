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


# ------------------------------------------------- bloom-prefilter join

# rev in exact 1e-4 units (the tpch_more _CENTS convention)
_BLOOM_REV = "CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)"

_DUCK_BLOOM_JOIN = f"""
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum({_BLOOM_REV}) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size = 1
GROUP BY p_brand
"""


@q(
    "join_bloom_prefilter",
    _DUCK_BLOOM_JOIN,
    "Scale: Bloom-prefiltered selective join — the build side's keys are"
    " aggregated distributed into an m-bit bitmap (bit_or of shifted longs,"
    " constant-bounded collect), the probe side is filtered by k codegen'd"
    " bit tests BEFORE any exchange, and the exact join removes the false"
    " positives — row-identical to the plain join with the probe shuffle cut"
    " to the matching fraction (Spark runtime-filter semantics, explicit).",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.bloomjoin import bloom_prefilter_join

    register_views(spark, sf_dir, ("lineitem", "part"))
    probe = spark.table("lineitem").select(
        "l_partkey", F.expr(_BLOOM_REV).alias("rev")
    )
    build = spark.table("part").where("p_size = 1").select("p_partkey", "p_brand")
    joined = bloom_prefilter_join(
        probe.withColumnRenamed("l_partkey", "p_partkey"), build, "p_partkey"
    )
    return joined.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n_lines"),
        (F.sum("rev").cast("double") / 10000.0).alias("revenue"),
    )
