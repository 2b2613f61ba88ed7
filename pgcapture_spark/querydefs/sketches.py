"""Mergeable-sketch aggregation — the 100 TB distinct-counting pattern: build
per-partition (event_type × day) Datasketches-HLL sketches once, then answer
any rollup by MERGING sketches instead of rescanning raw data. At scale the
daily sketch table is a few KB per group; re-aggregation over arbitrary date
ranges is O(groups), not O(events).

Cross-engine contract (same pattern as ``agg_approx_distinct``): sketch bytes
differ across engines, so the oracle asserts the exact distinct count and the
Spark side asserts its merged-sketch estimate lands within the sketch's
accuracy bound of that exact count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcapture_spark.catalog import register_views
from pgcapture_spark.queries import q

_HLL_SQL_DUCK = """
SELECT event_type, count(DISTINCT user_id) AS n_exact,
       count(DISTINCT date_trunc('day', ts)) AS n_days,
       true AS merged_within_5pct
FROM events GROUP BY event_type
"""


@q(
    "agg_hll_sketch_merge",
    _HLL_SQL_DUCK,
    "§2.7 scale path: two-level HLL — per-(type, day) sketches merged with"
    " hll_union_agg, estimate contract-checked against the exact distinct"
    " count (the store-sketches, merge-on-query rollup pattern).",
)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    ev = spark.table("events")
    daily = ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_n_est"),
        F.count("*").alias("n_days"),
    )
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    return merged.join(exact, on="event_type").select(
        "event_type",
        "n_exact",
        "n_days",
        (F.abs(F.col("_n_est") - F.col("n_exact")) <= 0.05 * F.col("n_exact")).alias(
            "merged_within_5pct"
        ),
    )


_HH_DUCK = r"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            t -> len(t) > 0)) AS token
  FROM documents
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok)
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM tok GROUP BY token
HAVING count(*) >= 0.002 * (SELECT n FROM tot)
"""


@q(
    "agg_heavy_hitters",
    _HH_DUCK,
    "§2.7 scale path / novel sketch: EXACT frequent tokens via two-pass"
    " Misra-Gries — bounded-memory per-partition summaries (one vectorized"
    " value_counts per Arrow batch, k-bounded decrement merge) produce a"
    " guaranteed-superset candidate set (≤ partitions × capacity rows,"
    " broadcast), then one exact recount of candidates only. Identical"
    " output to the naive full-vocabulary groupBy the oracle runs, without"
    " shuffling the whole key space at 100 TB.",
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.heavyhitters import heavy_hitters
    from pgcapture_spark.operators.textstats import token_rows

    register_views(spark, sf_dir, ("documents",))
    toks = token_rows(spark.table("documents")).select("token")
    return heavy_hitters(toks, "token", threshold_frac=0.002, capacity=1000)


_BPE_DUCK = r"""
WITH tok AS (
  SELECT list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0)
    AS tokens
  FROM documents
),
bg AS (
  SELECT unnest(CASE WHEN len(tokens) >= 2
                THEN list_transform(range(1, len(tokens)),
                                    i -> tokens[i] || ' ' || tokens[i + 1])
                ELSE CAST([] AS VARCHAR[]) END) AS bigram
  FROM tok
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bg)
SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
FROM bg GROUP BY bigram
HAVING count(*) >= 0.0005 * (SELECT n FROM tot)
"""


@q(
    "bpe_merge_candidates",
    _BPE_DUCK,
    "North-star: BPE-style merge-candidate mining — the frequent adjacent"
    " token pairs a tokenizer trainer merges first, computed EXACTLY by the"
    " same two-pass Misra-Gries harness as agg_heavy_hitters (bounded-memory"
    " candidates, broadcast-semi-join recount) over the exploded bigram"
    " stream. One operator, any key space.",
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.heavyhitters import heavy_hitters
    from pgcapture_spark.operators.textstats import BIGRAMS_EXPR, with_tokens

    register_views(spark, sf_dir, ("documents",))
    bigrams = (
        with_tokens(spark.table("documents"))
        .select(F.explode(F.expr(BIGRAMS_EXPR)).alias("bigram"))
    )
    return heavy_hitters(bigrams, "bigram", threshold_frac=0.0005, capacity=4000)


def _duck_bpe_apply_sql(k: int = 12) -> str:
    # rank-ordered nested replaces; ranks beyond the learned table collapse to
    # identity via the chr(1) sentinel (never present in text)
    expr = r"trim(regexp_replace(token, '(.)', '\1 ', 'g'))"
    for r in range(1, k + 1):
        expr = (
            f"replace({expr}, coalesce((SELECT pair FROM merges WHERE rnk = {r}),"
            f" chr(1)), coalesce((SELECT merged FROM merges WHERE rnk = {r}), chr(1)))"
        )
    return rf"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                             t -> len(t) > 0) AS tokens
  FROM documents
),
tr AS (SELECT doc_id, unnest(tokens) AS token FROM tok),
prs AS (
  SELECT unnest(list_transform(range(1, len(ch)), i -> ch[i] || ' ' || ch[i + 1]))
    AS pair
  FROM (SELECT string_split(token, '') AS ch FROM tr) WHERE len(ch) >= 2
),
merges AS (
  SELECT pair, replace(pair, ' ', '') AS merged,
         row_number() OVER (ORDER BY count(*) DESC, pair) AS rnk
  FROM prs GROUP BY pair QUALIFY rnk <= {k}
),
applied AS (
  SELECT doc_id, token, row_number() OVER (PARTITION BY doc_id ORDER BY rowid)
    AS tpos, {expr} AS bpe
  FROM (SELECT doc_id, token, row_number() OVER () AS rowid FROM tr)
),
per_doc AS (
  SELECT doc_id, count(*) AS n_tokens,
         CAST(sum(length(token)) AS BIGINT) AS n_chars_tok,
         CAST(sum(len(string_split(bpe, ' '))) AS BIGINT) AS n_bpe_units,
         CAST(sum(len(string_split(bpe, ' '))) AS DOUBLE)
           / greatest(sum(length(token)), 1) AS bpe_ratio,
         coalesce(min_by(bpe, tpos), '') AS first_token_bpe
  FROM applied GROUP BY doc_id
)
SELECT t.doc_id, coalesce(p.n_tokens, 0) AS n_tokens,
       coalesce(p.n_chars_tok, 0) AS n_chars_tok,
       coalesce(p.n_bpe_units, 0) AS n_bpe_units,
       coalesce(p.bpe_ratio, 0.0) AS bpe_ratio,
       coalesce(p.first_token_bpe, '') AS first_token_bpe
FROM tok t LEFT JOIN per_doc p USING (doc_id)
"""


@q(
    "text_bpe_tokenize",
    _duck_bpe_apply_sql(),
    "North-star: BPE tokenizer APPLY — the top-12 character-pair merges"
    " (rank = corpus count DESC, pair ASC; single-pass approximation of BPE"
    " training) applied in rank order as literal string replaces baked into"
    " ONE per-row JVM projection. The merge table is k-bounded and"
    " driver/broadcast-resident, as in any real tokenizer deployment; the"
    " first token's segmentation rides along so the hash pins the actual"
    " merge application.",
)
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import bpe_tokenize

    register_views(spark, sf_dir, ("documents",))
    return bpe_tokenize(spark.table("documents"), k=12)


# ------------------------------------------------------- histogram quantiles

_HISTQ_DUCK = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(floor(value / 1.0) AS BIGINT) AS bin,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
),
merged AS (SELECT bin, CAST(sum(cnt) AS BIGINT) AS cnt FROM daily GROUP BY bin),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM merged),
cum AS (SELECT bin, cnt, CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum
        FROM merged),
qs AS (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS pct)
SELECT pct, max(n) AS n,
       min(bin) AS bin_idx,
       CAST(min(bin) * 1.0 AS DOUBLE) AS est_lo,
       CAST((min(bin) + 1) * 1.0 AS DOUBLE) AS est_hi
FROM qs CROSS JOIN tot JOIN cum ON cum.cum >= ceil(pct / 100.0 * n)
GROUP BY pct
"""


@q(
    "agg_hist_quantile_merge",
    _HISTQ_DUCK,
    "§2.7 scale path: mergeable HISTOGRAM quantile sketch (the quantile leg"
    " of the sketch trio next to HLL cardinality and Misra-Gries frequency)"
    " — per-day fixed-width bin counts are associative state a few KB per"
    " day; any date-range quantile merges bins instead of rescanning raw"
    " data, and the estimate carries its exact error bound (the bin"
    " brackets the true value by construction).",
)
def agg_hist_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cumulative window runs over the MERGED histogram (≤ #bins rows —
    sketch-sized, a single partition by design), never the raw events."""
    from pyspark.sql import Window as W

    register_views(spark, sf_dir, ("events",))
    ev = spark.table("events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.expr("CAST(floor(value / 1.0) AS BIGINT)").alias("bin"),
    ).agg(F.count("*").alias("cnt"))
    merged = daily.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    cum = merged.select(
        "bin", F.sum("cnt").over(W.orderBy("bin")).alias("cum")
    )
    tot = merged.agg(F.sum("cnt").alias("n"))
    pcts = ev.sparkSession.range(0, 1).select(
        F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias("_p")
    ).select(F.col("_p").cast("bigint").alias("pct"))
    return (
        pcts.join(F.broadcast(tot))
        .join(cum, F.col("cum") >= F.ceil(F.col("pct") / 100.0 * F.col("n")))
        .groupBy("pct")
        .agg(
            F.max("n").alias("n"),
            F.min("bin").alias("bin_idx"),
            (F.min("bin") * 1.0).alias("est_lo"),
            ((F.min("bin") + 1) * 1.0).alias("est_hi"),
        )
    )


_CM_D, _CM_W = 4, 1024

_CM_DUCK = rf"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            t -> len(t) > 0)) AS token
  FROM documents
),
cells AS (
  SELECT r.i,
         ('0x' || substr(md5('cm' || CAST(r.i AS VARCHAR) || '|' || token), 1, 8))::BIGINT
           % {_CM_W} AS cell
  FROM tok CROSS JOIN range(0, {_CM_D}) r(i)
),
sketch AS (SELECT i, cell, CAST(count(*) AS BIGINT) AS c FROM cells GROUP BY i, cell),
exact AS (SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt FROM tok GROUP BY token),
top20 AS (SELECT token, exact_cnt FROM (
            SELECT *, row_number() OVER (ORDER BY exact_cnt DESC, token) AS rn
            FROM exact) WHERE rn <= 20),
est AS (
  SELECT t.token, t.exact_cnt, min(s.c) AS cm_est
  FROM top20 t CROSS JOIN range(0, {_CM_D}) r(i)
  JOIN sketch s
    ON s.i = r.i
   AND s.cell = ('0x' || substr(md5('cm' || CAST(r.i AS VARCHAR) || '|' || t.token), 1, 8))::BIGINT
                % {_CM_W}
  GROUP BY t.token, t.exact_cnt
)
SELECT token, exact_cnt, cm_est, cm_est >= exact_cnt AS overestimates
FROM est
"""


@q(
    "agg_countmin_topk",
    _CM_DUCK,
    "North-star: Count-Min sketch point queries — d=4 x w=1024 cell counts"
    " built in ONE pass (portable md5 row hashes, map-side combined into a"
    " fixed 4096-cell table regardless of corpus size, mergeable by cell-wise"
    " sum), then the top-20 tokens' estimates = min over rows of their cells."
    " Deterministic hashing makes the sketch bit-identical across engines,"
    " so estimates value-match exactly; the exact-count arm is the"
    " verification contract (overestimates must always hold — CM never"
    " undercounts).",
)
def agg_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import token_rows

    register_views(spark, sf_dir, ("documents",))
    toks = token_rows(spark.table("documents")).select("token")

    def cell(i_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("cm"), i_col.cast("string"),
                                   F.lit("|"), F.col("token"))),
                    1, 8,
                ), 16, 10,
            ).cast("bigint") % _CM_W
        )

    cells = toks.select(
        F.posexplode(F.array(*[cell(F.lit(i)) for i in range(_CM_D)])).alias("i", "cell")
    )
    sketch = cells.groupBy("i", "cell").agg(F.count("*").alias("c"))
    exact = toks.groupBy("token").agg(F.count("*").alias("exact_cnt"))
    # global top-20 via TakeOrdered (distributed heap), not a one-partition
    # full-vocabulary window
    top20 = exact.orderBy(F.desc("exact_cnt"), "token").limit(20)
    probes = top20.select(
        "token", "exact_cnt",
        F.posexplode(F.array(*[F.lit(i) for i in range(_CM_D)])).alias("_p", "i"),
    ).withColumn("cell", cell(F.col("i"))).drop("_p")
    est = (
        sketch.join(F.broadcast(probes), on=["i", "cell"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("c").alias("cm_est"))
    )
    return est.select(
        "token", "exact_cnt", "cm_est",
        (F.col("cm_est") >= F.col("exact_cnt")).alias("overestimates"),
    )


@q(
    "agg_heavy_hitters_streamed",
    _HH_DUCK,
    "North-star: CONTINUOUS-INGEST heavy hitters — document segments arrive"
    " as a stream; each micro-batch folds into a PERSISTED Misra-Gries"
    " summary (sketch-sized state, merged under the decrement rule whose"
    " error bound is additive across merges, so the accumulated key set"
    " remains a candidate SUPERSET), then one exact recount of candidates"
    " over the corpus. Converges to the batch agg_heavy_hitters / the naive"
    " GROUP BY oracle exactly; per-batch cost is batch-sized, state is"
    " capacity-bounded forever.",
)
def agg_heavy_hitters_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import os
    import tempfile

    from pgcapture_spark.operators.heavyhitters import (
        _mg_merge,
        mg_partition_summaries,
        threshold,
    )
    from pgcapture_spark.operators.textstats import token_rows
    from pgcapture_spark.sources.feed import cached_fixture_segments

    register_views(spark, sf_dir, ("documents",))
    d = tempfile.mkdtemp(prefix="pgcs_q_hhstream_")
    segs_dir = cached_fixture_segments(
        spark, sf_dir, "docs_segs",
        lambda: spark.table("documents").select("doc_id", "text"),
        n_segments=4, order_col="doc_id",
    )
    schema = spark.read.parquet(segs_dir).schema
    state_file = f"{d}/mg_state.json"
    capacity = 1000

    def _batch(bdf: DataFrame, bid: int) -> None:
        state = {"summary": {}, "n": 0, "last_batch": -1}
        if os.path.exists(state_file):
            with open(state_file) as f:
                state = json.load(f)
        if bid <= state["last_batch"]:
            return  # replayed batch — already folded (consistent gate)
        batch_summary, batch_n = mg_partition_summaries(
            token_rows(bdf).select("token"), "token", capacity
        )
        import pandas as pd

        merged = _mg_merge(
            dict(state["summary"]), pd.Series(batch_summary), capacity
        )
        tmp = state_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"summary": merged, "n": state["n"] + batch_n, "last_batch": bid}, f
            )
        os.replace(tmp, state_file)

    query = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(segs_dir)
        .writeStream.foreachBatch(_batch)
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(300)
    with open(state_file) as f:
        state = json.load(f)
    cand = spark.createDataFrame(
        [(t,) for t in sorted(state["summary"])], "token string"
    )
    toks = token_rows(spark.table("documents")).select("token")
    return (
        toks.join(F.broadcast(cand), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= threshold(state["n"], 0.002))
    )


# Sliding-window re-aggregation from STORED daily sketches — the actual
# reason sketches are stored: any window is answered by merging window-many
# per-day sketches (O(days x types x window) tiny merges), never by
# rescanning raw events per window. The exact arm below is the verification
# harness only.
_HLL_SLIDING_DUCK = """
WITH d AS (SELECT event_type, date_trunc('day', ts) AS day, user_id FROM events),
days AS (SELECT DISTINCT event_type, day FROM d)
SELECT dy.event_type, dy.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_exact,
       true AS merged_within_5pct
FROM days dy
JOIN d e ON e.event_type = dy.event_type
        AND e.day BETWEEN dy.day - INTERVAL 2 DAY AND dy.day
GROUP BY 1, 2
"""


@q(
    "events_hll_sliding_uniques",
    _HLL_SLIDING_DUCK,
    "North-star: 3-day sliding distinct users per (event_type, day) answered"
    " by MERGING stored daily HLL sketches (a window-bounded self-join over"
    " the tiny sketch table + hll_union_agg), never rescanning events per"
    " window; estimate contract-checked within 5% of the exact arm.",
)
def events_hll_sliding_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    ev = spark.table("events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
    t = daily.select(F.col("event_type").alias("t_type"), F.col("day").alias("t_day"))
    merged = (
        t.join(
            daily,
            (F.col("event_type") == F.col("t_type"))
            & (F.col("day") >= F.col("t_day") - F.expr("INTERVAL 2 DAYS"))
            & (F.col("day") <= F.col("t_day")),
        )
        .groupBy("t_type", "t_day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"))
    )
    spine = ev.select("event_type", F.date_trunc("day", "ts").alias("day"), "user_id")
    exact = (
        t.join(
            spine,
            (F.col("event_type") == F.col("t_type"))
            & (F.col("day") >= F.col("t_day") - F.expr("INTERVAL 2 DAYS"))
            & (F.col("day") <= F.col("t_day")),
        )
        .groupBy("t_type", "t_day")
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    return (
        merged.join(exact, on=["t_type", "t_day"])
        .select(
            F.col("t_type").alias("event_type"),
            # midnight TIMESTAMP on purpose: the driver canonicalizes via
            # pandas, where DuckDB's DATE also lands as datetime64 — casting
            # to Spark DATE would surface as an object column and MISMATCH
            F.col("t_day").alias("day"),
            "n_exact",
            (
                F.abs(F.col("_est") - F.col("n_exact")) <= 0.05 * F.col("n_exact")
            ).alias("merged_within_5pct"),
        )
    )


# ------------------------------------------------------- KMV (bottom-k) sketch

_KMV_DUCK = """
WITH h AS (
  SELECT event_type AS g,
         (((event_id % 2147483647) + 2147483647) % 2147483647
          * 2654435761 + 98765) % 2147483647 AS hv
  FROM events WHERE event_id IS NOT NULL
),
mins AS (
  SELECT g, FALSE AS is_union, hv,
         row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
  FROM (SELECT DISTINCT g, hv FROM h)
),
allmins AS (
  SELECT NULL AS g, TRUE AS is_union, hv,
         row_number() OVER (ORDER BY hv) AS rn
  FROM (SELECT DISTINCT hv FROM h)
),
sk AS (
  SELECT g, is_union, CAST(max(hv) AS BIGINT) AS kth_min, count(*) AS n
  FROM (SELECT * FROM mins WHERE rn <= 64
        UNION ALL SELECT * FROM allmins WHERE rn <= 64)
  GROUP BY g, is_union
)
SELECT CASE WHEN is_union THEN 'ALL' ELSE g END AS event_type, kth_min,
       CASE WHEN n < 64 THEN CAST(n AS BIGINT)
            ELSE CAST(135291469761 AS BIGINT) // kth_min END AS est_distinct
FROM sk
"""


@q(
    "agg_kmv_distinct",
    _KMV_DUCK,
    "North-star: KMV (bottom-k) distinct sketch — the mergeable summary that,"
    " unlike HLL, supports set intersection and arbitrary re-unions by"
    " construction. Per-partition k-smallest-distinct-hash folds merge into"
    " per-group sketches plus an 'ALL' union sketch built from the SUMMARIES"
    " (never re-scanning raw rows); the explicit integer-permutation hash"
    " makes Spark and the oracle bit-identical.",
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.kmv import kmv_estimates

    register_views(spark, sf_dir, ("events",))
    ev = spark.table("events").where(F.col("event_id").isNotNull())
    return kmv_estimates(ev, "event_type", "event_id", k=64)


@q(
    "agg_kmv_distinct_streamed",
    _KMV_DUCK,
    "The KMV sketch as a CONTINUOUS-INGEST consumer: event segments stream"
    " in; each micro-batch's per-group k-smallest-distinct-hash summary"
    " merges into a BUCKETED per-group sketch state (keep the k smallest of"
    " the union — the mergeable-summaries property), so state is forever"
    " <= groups x k rows, never event-volume. Estimates (per group + the"
    " 'ALL' union arm) derive from the state alone through the SAME"
    " finalizer as the batch form (kmv.kmv_finalize — the two cannot"
    " drift). The explicit integer-permutation hash makes the converged"
    " sketch bit-identical to the batch agg_kmv_distinct, so this reuses"
    " its oracle verbatim.",
)
def agg_kmv_distinct_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import Window as W

    from pgcapture_spark.operators.kmv import (
        kmv_finalize,
        kmv_partition_summaries,
    )
    from pgcapture_spark.sources.feed import cached_fixture_segments, read_feed_stream
    from pgcapture_spark.streaming.pipeline import commit_keyed_state
    from pgcapture_spark.streaming.state import BucketedSnapshotState

    register_views(spark, sf_dir, ("events",))
    k = 64
    ev = spark.table("events").where(F.col("event_id").isNotNull())
    d = tempfile.mkdtemp(prefix="pgcs_q_kmvstream_")
    feed_dir = cached_fixture_segments(
        spark, sf_dir, "kmv_events",
        lambda: ev.select("event_id", "event_type"),
        n_segments=5, order_col="event_id",
    )
    schema = spark.read.parquet(feed_dir).schema
    state = BucketedSnapshotState(spark, f"{d}/state", ["g"], n_buckets=8)

    def _ksmallest(df):
        w = W.partitionBy("g").orderBy("hv")
        return (
            df.dropDuplicates(["g", "hv"])
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .drop("_rn")
        )

    def _batch(batch_df, batch_id):
        if batch_id <= state.last_batch():
            return
        bs = kmv_partition_summaries(batch_df, "event_type", "event_id", k).persist()
        try:

            def _merge(cur):
                base = cur if cur is not None else bs.limit(0)
                return _ksmallest(base.unionByName(bs))

            commit_keyed_state(state, batch_id, bs.select("g"), _merge)
        finally:
            bs.unpersist()

    query = (
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=2)
        .writeStream.foreachBatch(_batch)
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(300)
    sk = state.read()
    if sk is None:
        sk = spark.createDataFrame([], "g string, hv long")
    return kmv_finalize(sk.select("g", "hv"), "event_type", k)
