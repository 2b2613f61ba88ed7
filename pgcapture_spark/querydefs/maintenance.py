"""Maintained-derivative operators: incremental aggregate (materialized-view
delta maintenance over the CDC feed), time-series gap-fill/LOCF rollup, and
repetition quality signals — SURVEY §2 C1-C2 consumer patterns + north-star
time-series/text additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcapture_spark.catalog import CDC_COLS, register_views
from pgcapture_spark.fixtures.cdc_feed import DUCKDB, cdc_customer_sql
from pgcapture_spark.operators.apply import apply_oracle_sql
from pgcapture_spark.operators.gapfill import gapfill_locf, gapfill_oracle_sql
from pgcapture_spark.operators.incremental import (
    group_agg,
    incremental_agg,
    incremental_agg_oracle_sql,
)
from pgcapture_spark.operators.textstats import repetition_signals
from pgcapture_spark.queries import _feed, q

_APPLIED_CUSTOMER = apply_oracle_sql(
    cdc_customer_sql(DUCKDB), "customer", "c_custkey", CDC_COLS["customer"]
)


@q(
    "cdc_incremental_agg",
    incremental_agg_oracle_sql(_APPLIED_CUSTOMER, "c_nationkey", "c_acctbal"),
    "C1-C2 consumer pattern: incremental maintenance of a GROUP BY aggregate"
    " under the change feed — base MV + O(touched-keys) delta, verified against"
    " a from-scratch aggregate of the applied snapshot (exact integer cents).",
)
def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer",))
    snap = spark.table("customer")
    base = group_agg(snap, "c_nationkey", "c_acctbal")
    return incremental_agg(
        base,
        snap,
        _feed(spark, sf_dir, "customer"),
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        CDC_COLS["customer"],
    )


@q(
    "cdc_incremental_agg_streamed",
    incremental_agg_oracle_sql(_APPLIED_CUSTOMER, "c_nationkey", "c_acctbal"),
    "C1-C2 streaming form: the MV maintained micro-batch by micro-batch in"
    " foreachBatch — snapshot + aggregate advance under ONE atomically-swung"
    " manifest (PairedState), replayed batches are no-ops; converges to the"
    " same from-scratch oracle as the batch form.",
)
def cdc_incremental_agg_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pgcapture_spark.sources.feed import materialize_feed, read_feed_stream
    from pgcapture_spark.streaming.mv import PairedState, incremental_agg_stream

    register_views(spark, sf_dir, ("customer",))
    snapshot = spark.table("customer")
    feed = _feed(spark, sf_dir, "customer")
    d = tempfile.mkdtemp(prefix="pgcs_q_mv_")
    feed_dir = f"{d}/feed"
    materialize_feed(feed, feed_dir, n_segments=5)
    schema = spark.read.parquet(feed_dir).schema
    state = PairedState(spark, f"{d}/state")
    query = incremental_agg_stream(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=2),
        state,
        snapshot,
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        CDC_COLS["customer"],
        f"{d}/ckpt",
    )
    query.awaitTermination(300)
    return state.read()[1]


_GF_WHERE = "user_id % 20 = 3"


@q(
    "ts_gapfill_locf",
    gapfill_oracle_sql(_GF_WHERE),
    "North-star time-series: hourly rollup with dense gap-filled bucket spine"
    " and last-observation-carried-forward — hypertable continuous-aggregate"
    " shape, one shuffle key (entity) reused by agg, spine join, and window.",
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return gapfill_locf(spark.table("events").where(_GF_WHERE))


_DUCK_REPETITION = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tokens
  FROM documents
),
base AS (
  SELECT doc_id, len(tokens) AS n_tokens, len(list_distinct(tokens)) AS n_distinct,
         CASE WHEN len(tokens) >= 2
              THEN list_transform(range(1, len(tokens)), i -> tokens[i] || ' ' || tokens[i + 1])
              ELSE CAST([] AS VARCHAR[]) END AS bigrams
  FROM t
),
bgr AS (SELECT doc_id, unnest(bigrams) AS bigram FROM base),
cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bgr GROUP BY 1, 2),
agg AS (SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bigram_cnt FROM cnt GROUP BY 1)
SELECT b.doc_id, b.n_tokens,
       1.0 - CAST(b.n_distinct AS DOUBLE) / greatest(b.n_tokens, 1) AS dup_token_frac,
       CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(a.top_bigram_cnt, 0) AS BIGINT) AS top_bigram_cnt,
       CAST(coalesce(a.top_bigram_cnt, 0) AS DOUBLE)
         / greatest(coalesce(a.n_bigrams, 0), 1) AS top_bigram_frac
FROM base b LEFT JOIN agg a USING (doc_id)
"""


@q(
    "text_repetition_signals",
    _DUCK_REPETITION,
    "North-star text quality: Gopher-style repetition signals — duplicate-token"
    " fraction and top-bigram fraction per document (boilerplate/degeneracy"
    " filter for pre-training corpora).",
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return repetition_signals(spark.table("documents"))


_EWMA_WHERE = "user_id % 20 = 5"

_DUCK_EWMA = f"""
WITH s AS (
  SELECT user_id,
         list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals,
         count(*) AS n_events
  FROM events WHERE {_EWMA_WHERE} GROUP BY user_id
)
SELECT user_id, n_events,
       vals[len(vals)] AS last_value,
       floor(list_reduce(vals, (acc, x) -> 0.25 * x + 0.75 * acc) * 1000000 + 0.5)
         / 1000000 AS ewma_q
FROM s
"""


@q(
    "ts_ewma",
    _DUCK_EWMA,
    "North-star time-series: per-entity exponentially weighted moving average"
    " (alpha=0.25) — series assembled in ONE entity-key shuffle, the"
    " recursive fold is a sequential array reduce (identical left-to-right"
    " IEEE op sequence in both engines, so the double result is"
    " bit-identical before quantization).",
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity series fit executor memory whenever entity cardinality
    scales with the data (the hypertable assumption shared by
    ts_similarity_topk / gapfill); for unbounded single entities, segment the
    fold with a window over pow(0.75, n-i) partial sums instead."""
    register_views(spark, sf_dir, ("events",))
    series = (
        spark.table("events")
        .where(_EWMA_WHERE)
        .groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(ts, event_id,"
                " CAST(value AS DOUBLE) AS v))), s -> s.v)"
            ).alias("vals"),
            F.count("*").alias("n_events"),
        )
    )
    return series.select(
        "user_id",
        "n_events",
        F.expr("element_at(vals, -1)").alias("last_value"),
        F.expr(
            "floor(aggregate(slice(vals, 2, size(vals) - 1),"
            " element_at(vals, 1), (acc, x) -> 0.25 * x + 0.75 * acc)"
            " * 1000000 + 0.5) / 1000000"
        ).alias("ewma_q"),
    )
