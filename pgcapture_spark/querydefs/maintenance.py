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
    " BUCKETED manifest (BucketedMultiTableState): per trigger, reads touch"
    " only the snapshot key-buckets the batch's keys hash into and the agg"
    " group-buckets the per-group delta names; replayed batches are no-ops;"
    " converges to the same from-scratch oracle as the batch form.",
)
def cdc_incremental_agg_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pgcapture_spark.sources.feed import cached_fixture_segments, read_feed_stream
    from pgcapture_spark.streaming.multi import BucketedMultiTableState
    from pgcapture_spark.streaming.mv import incremental_agg_stream

    register_views(spark, sf_dir, ("customer",))
    snapshot = spark.table("customer")
    d = tempfile.mkdtemp(prefix="pgcs_q_mv_")
    # fixture INPUT edge: the segment log synthesizes once per (kind, sf_dir)
    # per process (sources/feed.py contract) — invocations measure CONSUMPTION
    feed_dir = cached_fixture_segments(
        spark, sf_dir, "cust_feed", lambda: _feed(spark, sf_dir, "customer"),
        n_segments=5,
    )
    schema = spark.read.parquet(feed_dir).schema
    state = BucketedMultiTableState(
        spark,
        f"{d}/state",
        ["snapshot", "agg"],
        {"snapshot": "c_custkey", "agg": "c_nationkey"},
        n_buckets=16,
    )
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
    return state.read()["agg"]


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


# ------------------------------------------------------- OHLC resample

_OHLC_WHERE = "user_id % 20 = 7"

_DUCK_OHLC = f"""
WITH e AS (SELECT user_id, date_trunc('hour', ts) AS bucket, ts, event_id,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events WHERE {_OHLC_WHERE}),
r AS (SELECT *,
             row_number() OVER (PARTITION BY user_id, bucket
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, bucket
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM e)
SELECT user_id, bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       max(CASE WHEN rn_a = 1 THEN cents END) AS open_cents,
       max(cents) AS high_cents,
       min(cents) AS low_cents,
       max(CASE WHEN rn_d = 1 THEN cents END) AS close_cents,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM r GROUP BY user_id, bucket
"""


@q(
    "ts_resample_ohlc",
    _DUCK_OHLC,
    "North-star time-series: per-entity hourly OHLC downsampling (open ="
    " first by (ts, event_id), high/low/close, exact integer-cents sum) —"
    " the hypertable candlestick rollup; ONE (entity, bucket) shuffle"
    " shared by both window passes and the aggregate.",
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last per bucket are rank-picked under an explicit (ts, event_id)
    total order — not min_by(value, ts), which ties nondeterministically on
    equal timestamps. Both row_number passes and the groupBy share one hash
    partitioning on (user_id, bucket)."""
    from pyspark.sql import Window as W

    register_views(spark, sf_dir, ("events",))
    e = (
        spark.table("events")
        .where(_OHLC_WHERE)
        .select(
            "user_id",
            F.date_trunc("hour", "ts").alias("bucket"),
            "ts",
            "event_id",
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        )
    )
    pk = W.partitionBy("user_id", "bucket")
    r = e.select(
        "*",
        F.row_number().over(pk.orderBy("ts", "event_id")).alias("rn_a"),
        F.row_number().over(
            pk.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        ).alias("rn_d"),
    )
    return r.groupBy("user_id", "bucket").agg(
        F.count("*").alias("n_events"),
        F.max(F.when(F.col("rn_a") == 1, F.col("cents"))).alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).alias("close_cents"),
        F.sum("cents").alias("sum_cents"),
    )


# ------------------------------------------------------- rolling z-score

_ZS_WHERE = "user_id % 20 = 11"

_DUCK_ROLLING_Z = f"""
WITH e AS (SELECT user_id, ts, event_id,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events WHERE {_ZS_WHERE}),
w AS (SELECT user_id, ts, event_id, cents,
             CAST(sum(cents) OVER win AS BIGINT) AS s,
             CAST(sum(cents * cents) OVER win AS BIGINT) AS ss,
             CAST(count(*) OVER win AS BIGINT) AS n
      FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
SELECT user_id, event_id, cents, n,
       CASE WHEN n >= 2 AND n * ss - s * s > 0
            THEN floor((cents - CAST(s AS DOUBLE) / n)
                 / sqrt((CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)
                        / (n * (n - 1.0)))
                 * 1000000 + 0.5) / 1000000 END AS z_q,
       coalesce(abs(CASE WHEN n >= 2 AND n * ss - s * s > 0
            THEN floor((cents - CAST(s AS DOUBLE) / n)
                 / sqrt((CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)
                        / (n * (n - 1.0)))
                 * 1000000 + 0.5) / 1000000 END) > 2.0, FALSE) AS is_outlier
FROM w
"""


@q(
    "ts_rolling_zscore",
    _DUCK_ROLLING_Z,
    "North-star time-series: per-entity rolling z-score anomaly flag over a"
    " 20-row trailing frame — sums kept as exact integer cents inside the"
    " frame (order-independent), the z double derived from exact ints with"
    " an identical IEEE expression tree in both engines, quantized 1e-6.",
)
def ts_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-frame running sums are streaming window state (O(1) per row);
    the one shuffle is the entity key. Variance from (n, Σx, Σx²) in exact
    integers; z only materializes as a double at the final expression."""
    from pyspark.sql import Window as W

    register_views(spark, sf_dir, ("events",))
    e = (
        spark.table("events")
        .where(_ZS_WHERE)
        .select(
            "user_id",
            "ts",
            "event_id",
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        )
    )
    win = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, W.currentRow)
    )
    w = e.select(
        "user_id",
        "ts",
        "event_id",
        "cents",
        F.sum("cents").over(win).alias("s"),
        F.sum(F.expr("cents * cents")).over(win).alias("ss"),
        F.count("*").over(win).alias("n"),
    )
    z = (
        "CASE WHEN n >= 2 AND n * ss - s * s > 0"
        " THEN floor((cents - CAST(s AS DOUBLE) / n)"
        " / sqrt((CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)"
        " / (n * (n - 1.0)))"
        " * 1000000 + 0.5) / 1000000 END"
    )
    return w.select(
        "user_id",
        "event_id",
        "cents",
        "n",
        F.expr(z).alias("z_q"),
        F.expr(f"coalesce(abs({z}) > 2.0, FALSE)").alias("is_outlier"),
    )


# ------------------------------------------------------- compaction planner

# Log-maintenance planning (the batch analog of sources/feed.compact_log and
# the reference's Pulsar topic retention): group the change log into LSN
# segments, estimate bytes, and bin-pack consecutive segments into
# target-sized compaction groups. The prefix sum is the two-phase distributed
# scan from operators/packing.packed_batches (range partition → local cumsum
# → broadcast per-partition offsets), NEVER one global single-task window —
# the planner itself scales to a 100 TB log listing.
_SEG_SHIFT = 16_777_216  # lsn span per segment (2^24 → ≤256 segments)
_BIN_TARGET = 262_144  # compaction group target bytes


def _compaction_duck() -> str:
    from pgcapture_spark.fixtures.cdc_feed import cdc_lineitem_sql

    return f"""
WITH feed AS ({cdc_lineitem_sql(DUCKDB)}),
seg AS (
  SELECT lsn // {_SEG_SHIFT} AS seg_id,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(120 + length(present)) AS BIGINT) AS est_bytes
  FROM feed GROUP BY 1),
c AS (
  SELECT seg_id, n_rows, est_bytes,
         CAST(COALESCE(sum(est_bytes) OVER (ORDER BY seg_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_offset
  FROM seg)
SELECT seg_id, n_rows, est_bytes, start_offset,
       CAST(start_offset // {_BIN_TARGET} AS BIGINT) AS bin_id
FROM c
"""


@q(
    "cdc_compaction_plan",
    _compaction_duck(),
    "Log-compaction planning: LSN-range segments of the lineitem change log"
    " (seg = lsn DIV 2^24) with exact byte estimates, bin-packed into 256 KiB"
    " compaction groups by a running prefix sum — the OPTIMIZE/retention"
    " planner a log store runs continuously (sources/feed.compact_log is the"
    " executor; the reference's Pulsar retention is the managed analog)."
    " The cumsum is packed_batches' two-phase distributed scan, not a"
    " single-task global window.",
)
def cdc_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.packing import packed_batches

    seg = (
        _feed(spark, sf_dir, "lineitem")
        .groupBy(F.expr(f"lsn DIV {_SEG_SHIFT}").alias("seg_id"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.lit(120) + F.length("present")).cast("long").alias("est_bytes"),
        )
    )
    packed = packed_batches(
        seg,
        budget=_BIN_TARGET,
        order_col="seg_id",
        tokens_col="est_bytes",
        extra_cols=("n_rows",),
    )
    return packed.select(
        "seg_id",
        "n_rows",
        "est_bytes",
        F.col("start_offset").cast("long").alias("start_offset"),
        F.col("batch_id").cast("long").alias("bin_id"),
    )


# ----------------------------------------------------- watermark sizing

# How late does data actually arrive? Replay the event stream in a modeled
# arrival order (per-source-partition; each event's queue position is
# perturbed by a deterministic md5 jitter of up to 24 sequence slots — the
# interleaving noise a watermark must absorb, and invariant to data density
# so the model behaves identically at every SF), track the running
# per-partition watermark, and report the lateness distribution per event
# type. p95_late_s IS the watermark-delay recommendation for the
# streaming queries (streamq.py uses withWatermark — this op is how an
# operator picks the number). Integer seconds end-to-end (anchored
# timestampdiff — NTZ-safe in both engines); the running max
# partitions by the source partition (never one global single-task window);
# percentile_disc is exact and cross-engine.
_LATENESS_TPL = """
WITH base AS (
  SELECT event_id, event_type, user_id % 8 AS part,
         {epoch_s} AS ts_s,
         event_id + {md5mod24} AS arr_key
  FROM events),
wm AS (
  SELECT event_type,
         CAST(greatest(0, COALESCE(max(ts_s) OVER (PARTITION BY part
              ORDER BY arr_key, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - ts_s, 0))
              AS BIGINT) AS late_s
  FROM base)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE late_s > 0) AS BIGINT) AS n_late,
       CAST(max(late_s) AS BIGINT) AS max_late_s,
       CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY late_s) AS BIGINT)
         AS p95_late_s
FROM wm GROUP BY event_type
"""

_LATENESS_DUCK = _LATENESS_TPL.format(
    epoch_s="date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)",
    md5mod24="(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 24)",
)

_LATENESS_SPARK = _LATENESS_TPL.format(
    epoch_s="timestampdiff(SECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)",
    md5mod24=(
        "(CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10)"
        " AS BIGINT) % 24)"
    ),
)


@q(
    "events_watermark_sizing",
    _LATENESS_DUCK,
    "Streaming-ops audit: replay events in modeled per-partition arrival"
    " order (deterministic md5 jitter of ≤24 queue slots) against the"
    " running watermark"
    " and report the lateness distribution per event type — n_late,"
    " max_late_s, and the p95 that BECOMES the withWatermark delay for the"
    " streaming queries. Running max is per-source-partition (scale-safe);"
    " all arithmetic integer seconds; percentile_disc exact cross-engine.",
)
def events_watermark_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_LATENESS_SPARK)


# ------------------------------------------------- linear interpolation

_ITP_WHERE = "user_id % 20 = 9"


@q(
    "ts_interpolate_linear",
    None,  # set just below (import ordering)
    "North-star time-series: dense bucket spine with LINEAR interpolation"
    " across gaps (hypertable interpolate(), vs LOCF) — exact integer-cents"
    " observations, one entity shuffle shared by agg + spine join + both"
    " direction windows, interpolated double from a mirrored expression"
    " tree quantized 1e-6.",
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.gapfill import gapfill_interp

    register_views(spark, sf_dir, ("events",))
    return gapfill_interp(spark.table("events").where(_ITP_WHERE))


def _set_itp_oracle() -> None:
    from pgcapture_spark.operators.gapfill import gapfill_interp_oracle_sql
    from pgcapture_spark.queries import REGISTRY

    REGISTRY["ts_interpolate_linear"].oracle = gapfill_interp_oracle_sql(_ITP_WHERE)


_set_itp_oracle()


# ------------------------------------------------------- Holt linear trend

_HOLT_WHERE = "user_id % 20 = 9"

# binary-exact smoothing constants: 0.5 and 0.25 are representable doubles,
# so every recurrence step is the same IEEE op sequence in both engines
_DUCK_HOLT = f"""
WITH s AS (
  SELECT user_id,
         list([CAST(value AS DOUBLE), 0.0] ORDER BY ts, event_id) AS pairs,
         count(*) AS n_events
  FROM events WHERE {_HOLT_WHERE} GROUP BY user_id
),
f AS (
  SELECT user_id, n_events,
         list_reduce(pairs, (acc, x) ->
           [0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
            0.25 * ((0.5 * x[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
              + 0.75 * acc[2]]) AS lb
  FROM s
)
SELECT user_id, n_events,
       floor(lb[1] * 1000000 + 0.5) / 1000000 AS level_q,
       floor(lb[2] * 1000000 + 0.5) / 1000000 AS trend_q,
       floor((lb[1] + 3 * lb[2]) * 1000000 + 0.5) / 1000000 AS forecast3_q
FROM f
"""


@q(
    "ts_holt_trend",
    _DUCK_HOLT,
    "North-star time-series: per-entity Holt double exponential smoothing"
    " (level + linear trend; alpha=0.5, beta=0.25 — binary-exact constants)"
    " with a 3-step-ahead forecast. The series assembles in ONE entity-key"
    " shuffle; the recurrence folds left-to-right over [value, 0] pairs with"
    " an [level, trend] array accumulator — the identical IEEE op sequence"
    " in both engines, so the doubles are bit-identical before quantization"
    " (the ts_ewma recipe generalized to vector state). Initialization"
    " contract: level = first value, trend = 0.",
)
def ts_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity series fit executor memory under the hypertable assumption
    (see ts_ewma); the fold is inherently sequential per entity — for
    unbounded single entities, apply the linear-recurrence segmenting trick
    (state is an affine map; compose per-segment 2x2 matrices)."""
    register_views(spark, sf_dir, ("events",))
    series = (
        spark.table("events")
        .where(_HOLT_WHERE)
        .groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(ts, event_id,"
                " CAST(value AS DOUBLE) AS v))), s -> array(s.v, 0.0D))"
            ).alias("pairs"),
            F.count("*").alias("n_events"),
        )
    )
    lb = (
        "aggregate(slice(pairs, 2, size(pairs) - 1), element_at(pairs, 1),"
        " (acc, x) -> array("
        "0.5D * element_at(x, 1) + 0.5D * (element_at(acc, 1) + element_at(acc, 2)),"
        " 0.25D * ((0.5D * element_at(x, 1)"
        " + 0.5D * (element_at(acc, 1) + element_at(acc, 2)))"
        " - element_at(acc, 1)) + 0.75D * element_at(acc, 2)))"
    )
    return series.select(
        "user_id",
        "n_events",
        F.expr(
            f"floor(element_at({lb}, 1) * 1000000 + 0.5D) / 1000000"
        ).alias("level_q"),
        F.expr(
            f"floor(element_at({lb}, 2) * 1000000 + 0.5D) / 1000000"
        ).alias("trend_q"),
        F.expr(
            f"floor((element_at({lb}, 1) + 3 * element_at({lb}, 2))"
            " * 1000000 + 0.5D) / 1000000"
        ).alias("forecast3_q"),
    )
