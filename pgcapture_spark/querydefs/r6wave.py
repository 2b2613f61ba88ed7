"""Round-6 registry wave (the queued post-freeze operators, VERDICT r5 task
#2): incremental JOIN-view maintenance over the CDC feeds (batch + streamed),
theta-sketch-style top-k set intersections, edit-distance join via
deletion-neighborhood pruning, Z-order row-group clustering stats — plus the
training-pipeline tail: sequence packing, benchmark decontamination, class
balancing, corpus mix scheduling, A/B test stats, and market-basket lift.

Every query keeps the cross-engine determinism contract: integer cents /
ppm/milli quantization for money and ratios, the explicit KMV permutation for
sketches, and identical IEEE expression trees where doubles are unavoidable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcapture_spark.catalog import CDC_COLS, register_views
from pgcapture_spark.fixtures.cdc_feed import (
    DUCKDB,
    cdc_customer_sql,
    cdc_orders_sql,
)
from pgcapture_spark.operators.apply import apply_oracle_sql
from pgcapture_spark.operators.ivm import ivm_join_oracle_sql, ivm_join_view
from pgcapture_spark.operators.kmv import KMV_MOD, kmv_group_sketches, kmv_hash_expr
from pgcapture_spark.queries import _feed, q

_ORDERS_APPLIED = apply_oracle_sql(
    cdc_orders_sql(DUCKDB), "orders", "o_orderkey", CDC_COLS["orders"]
)
_CUSTOMER_APPLIED = apply_oracle_sql(
    cdc_customer_sql(DUCKDB), "customer", "c_custkey", CDC_COLS["customer"]
)


# ------------------------------------------------------------ IVM join view


@q(
    "cdc_ivm_join_view",
    ivm_join_oracle_sql(_ORDERS_APPLIED, _CUSTOMER_APPLIED),
    "Incremental maintenance of a JOIN view under BOTH tables' CDC feeds:"
    " V = per-nation order count + revenue over orders ⋈ customer, advanced"
    " by the signed delta algebra ΔO⋈C ∪ O⋈ΔC ∪ ΔO⋈ΔC (operators/ivm.py) —"
    " the downstream-materialization consumer the reference's handlers feed"
    " (pkg/pgcapture/consumer.go:86-142), extended from single-table"
    " aggregates to join views. Deltas are O(touched keys) and broadcast"
    " onto single scans of each base table; the view is NEVER recomputed"
    " from scratch. Oracle: the from-scratch view over the applied"
    " snapshots.",
)
def cdc_ivm_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    return ivm_join_view(
        spark.table("orders"),
        spark.table("customer"),
        _feed(spark, sf_dir, "orders"),
        _feed(spark, sf_dir, "customer"),
        CDC_COLS["orders"],
        CDC_COLS["customer"],
    )


@q(
    "cdc_ivm_join_view_streamed",
    ivm_join_oracle_sql(_ORDERS_APPLIED, _CUSTOMER_APPLIED),
    "The JOIN view maintained CONTINUOUSLY: one typed stream carrying orders"
    " AND customer changes; per micro-batch the signed join-view delta is"
    " computed against touched-bucket SLICES of the snapshots (reads and"
    " commits are both O(touched buckets): the unprunable O⋈ΔC term reads a"
    " custkey-co-bucketed orders projection maintained as a fourth state"
    " table — streaming/mv.py ivm_join_stream). Converges to the same from-scratch"
    " oracle as the batch form: incremental ≡ batch, the A5 contract applied"
    " to a two-table materialization.",
)
def cdc_ivm_join_view_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pgcapture_spark.fixtures.cdc_feed import SPARK, multi_feed_sql
    from pgcapture_spark.sources.feed import cached_fixture_segments, read_feed_stream
    from pgcapture_spark.streaming.multi import BucketedMultiTableState
    from pgcapture_spark.streaming.mv import ivm_join_stream

    register_views(spark, sf_dir, ("customer", "orders"))
    d = tempfile.mkdtemp(prefix="pgcs_q_ivmjoin_")
    # the feed log is an INPUT (fixture edge): synthesize + materialize once
    # per (kind, sf_dir) so repeated invocations measure CONSUMPTION
    feed_dir = cached_fixture_segments(
        spark, sf_dir, "ivm_multi",
        lambda: spark.sql(multi_feed_sql(SPARK)), n_segments=5,
    )
    schema = spark.read.parquet(feed_dir).schema
    state = BucketedMultiTableState(
        spark,
        f"{d}/state",
        ["orders", "customer", "orders_ck", "mv"],
        {
            "orders": "o_orderkey",
            "customer": "c_custkey",
            "orders_ck": "o_custkey",
            "mv": "c_nationkey",
        },
        n_buckets=16,
    )
    query = ivm_join_stream(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=3),
        state,
        spark.table("orders"),
        spark.table("customer"),
        CDC_COLS["orders"],
        CDC_COLS["customer"],
        f"{d}/ckpt",
    )
    query.awaitTermination(300)
    return state.read()["mv"]


# -------------------------------------------- theta-style sketch intersection

_THETA_K = 64


def _theta_oracle() -> str:
    hv = kmv_hash_expr("user_id")
    k = _THETA_K
    return f"""
WITH h AS (
  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS g, {hv} AS hv
  FROM events WHERE user_id IS NOT NULL
),
r AS (SELECT g, hv, row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM h),
sk AS (SELECT g, list(hv ORDER BY hv) AS mins FROM r WHERE rn <= {k} GROUP BY g),
p AS (
  SELECT a.g AS g1, b.g AS g2, a.mins AS ma, b.mins AS mb,
         list_slice(list_sort(list_distinct(list_concat(a.mins, b.mins))), 1, {k}) AS mg
  FROM sk a JOIN sk b ON a.g < b.g
),
e AS (
  SELECT g1, g2,
         len(mg) AS k_used,
         mg[len(mg)] AS kth,
         (len(ma) < {k} AND len(mb) < {k}) AS exact,
         len(list_filter(mg, x -> list_contains(ma, x) AND list_contains(mb, x)))
           AS n_both
  FROM p
),
u AS (
  SELECT g1, g2, k_used, exact, n_both,
         CASE WHEN exact THEN k_used
              ELSE (CAST(k_used - 1 AS BIGINT) * {KMV_MOD}) // kth END AS union_est,
         (CAST(1000 * n_both AS BIGINT)) // k_used AS jaccard_milli
  FROM e
)
SELECT g1, g2,
       CAST(union_est AS BIGINT) AS union_est,
       CAST(jaccard_milli AS BIGINT) AS jaccard_milli,
       CAST(CASE WHEN exact THEN n_both
                 ELSE (jaccard_milli * union_est) // 1000 END AS BIGINT)
         AS intersect_est
FROM u
ORDER BY intersect_est DESC, g1, g2
LIMIT 15
"""


@q(
    "agg_theta_intersect_topk",
    _theta_oracle(),
    "Theta-sketch-style TOP-K SET INTERSECTIONS from KMV sketches alone — the"
    " capability HLL lacks by construction (extends operators/kmv.py's"
    " pairwise estimator to a ranked sweep): per-day audience sketches"
    " (k smallest of the explicit integer permutation — bit-identical in both"
    " engines), pairwise merge of the k-bounded summaries, Bernoulli"
    " intersection density, top-15 day pairs by estimated overlap. The raw"
    " rows fold to ≤k values per group before anything joins; the pairwise"
    " stage touches ONLY sketches (G² sketch rows — LSH-bucket the pairing"
    " when G itself is huge).",
)
def agg_theta_intersect_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    k = _THETA_K
    rows = (
        spark.table("events")
        .where("user_id IS NOT NULL")
        .select(F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id")
    )
    sk = kmv_group_sketches(rows, "day", "user_id", k=k)
    p = (
        sk.alias("a")
        .join(sk.alias("b"), F.col("a.day") < F.col("b.day"))
        .select(
            F.col("a.day").alias("g1"),
            F.col("b.day").alias("g2"),
            F.col("a.mins").alias("ma"),
            F.col("b.mins").alias("mb"),
        )
        .withColumn(
            "mg", F.expr(f"slice(array_sort(array_distinct(concat(ma, mb))), 1, {k})")
        )
    )
    e = p.select(
        "g1",
        "g2",
        F.size("mg").alias("k_used"),
        F.expr("element_at(mg, size(mg))").alias("kth"),
        ((F.size("ma") < k) & (F.size("mb") < k)).alias("exact"),
        F.expr("size(array_intersect(array_intersect(mg, ma), mb))").alias("n_both"),
    )
    u = e.select(
        "g1",
        "g2",
        "k_used",
        "exact",
        "n_both",
        F.when(F.col("exact"), F.col("k_used").cast("long"))
        .otherwise(F.expr(f"CAST(k_used - 1 AS BIGINT) * {KMV_MOD} div kth"))
        .alias("union_est"),
        F.expr("CAST(1000 * n_both AS BIGINT) div k_used").alias("jaccard_milli"),
    )
    return (
        u.select(
            "g1",
            "g2",
            F.col("union_est").cast("long").alias("union_est"),
            F.col("jaccard_milli").cast("long").alias("jaccard_milli"),
            F.when(F.col("exact"), F.col("n_both").cast("long"))
            .otherwise(F.expr("(jaccard_milli * union_est) div 1000"))
            .cast("long")
            .alias("intersect_est"),
        )
        .orderBy(F.desc("intersect_est"), "g1", "g2")
        .limit(15)
    )


# ------------------------------------------------------- edit-distance join


@q(
    "dedup_editdist_join",
    """
WITH d AS (SELECT doc_id, substr(text, 1, 16) AS s FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE abs(length(a.s) - length(b.s)) <= 1 AND levenshtein(a.s, b.s) <= 1
""",
    "Edit-distance SIMILARITY JOIN (extends dedup_editdist_verify from"
    " verify-only to full join): candidate pairs come from the"
    " deletion-neighborhood signature scheme (FastSS) — each key emits"
    " itself plus its single-deletion variants, and any two strings within"
    " edit distance 1 provably share a variant — so the join is a bucketed"
    " equi-join on variants (length pruning is implied: variants differ by"
    " ≤1 char), NEVER an all-pairs scan; exact levenshtein verifies"
    " candidates. Oracle: independent brute-force over all pairs.",
)
def dedup_editdist_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    d = spark.table("documents").select(
        "doc_id", F.expr("substring(text, 1, 16)").alias("s")
    )
    variants = d.select(
        "doc_id",
        "s",
        F.explode(
            F.expr(
                "transform(sequence(0, char_length(s)), i -> "
                "CASE WHEN i = 0 THEN s "
                "ELSE concat(substring(s, 1, i - 1), substring(s, i + 1, 16)) END)"
            )
        ).alias("var"),
    )
    pairs = (
        variants.alias("x")
        .join(
            variants.alias("y"),
            (F.col("x.var") == F.col("y.var"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.s").alias("sa"),
            F.col("y.s").alias("sb"),
        )
        .distinct()
    )
    return (
        pairs.withColumn("dist", F.levenshtein("sa", "sb"))
        .where("dist <= 1")
        .select("doc_a", "doc_b", F.col("dist").cast("long").alias("dist"))
    )


# ------------------------------------------------- z-order row-group stats


def _zrg_oracle() -> str:
    from pgcapture_spark.operators.history import zorder_oracle_sql

    return f"""
WITH z AS ({zorder_oracle_sql()}),
s AS (
  SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
         min(b_user) AS u_min, max(b_user) AS u_max,
         min(b_time) AS t_min, max(b_time) AS t_max
  FROM z GROUP BY shard
)
SELECT a.shard, a.n_rows, a.u_min, a.u_max, a.t_min, a.t_max,
       CAST(sum(CASE WHEN a.u_min <= b.u_max AND b.u_min <= a.u_max
                     THEN 1 ELSE 0 END) AS BIGINT) AS u_overlaps,
       CAST(sum(CASE WHEN a.t_min <= b.t_max AND b.t_min <= a.t_max
                     THEN 1 ELSE 0 END) AS BIGINT) AS t_overlaps
FROM s a JOIN s b ON a.shard <> b.shard
GROUP BY a.shard, a.n_rows, a.u_min, a.u_max, a.t_min, a.t_max
"""


@q(
    "events_zorder_rowgroup_stats",
    _zrg_oracle(),
    "Z-order ROW-GROUP clustering statistics (extends events_zorder_layout):"
    " per Morton shard (= the file/row-group a Z-order writer would emit),"
    " the min/max footer stats on BOTH clustered dimensions plus the count"
    " of OTHER shards whose range overlaps on each dimension — the"
    " data-skipping effectiveness a lakehouse OPTIMIZE ZORDER audit reports"
    " (low overlap ⇒ a point/range predicate prunes most files). One"
    " aggregation over the scan + a shard-count-bounded self-join of the"
    " tiny stats table.",
)
def events_zorder_rowgroup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.history import zorder_layout

    register_views(spark, sf_dir, ("events",))
    s = zorder_layout(spark.table("events")).groupBy("shard").agg(
        F.count("*").alias("n_rows"),
        F.min("b_user").alias("u_min"),
        F.max("b_user").alias("u_max"),
        F.min("b_time").alias("t_min"),
        F.max("b_time").alias("t_max"),
    )
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, F.col("a.shard") != F.col("b.shard"))
        .groupBy(
            F.col("a.shard").alias("shard"),
            F.col("a.n_rows").alias("n_rows"),
            F.col("a.u_min").alias("u_min"),
            F.col("a.u_max").alias("u_max"),
            F.col("a.t_min").alias("t_min"),
            F.col("a.t_max").alias("t_max"),
        )
        .agg(
            F.sum(
                F.when(
                    (F.col("a.u_min") <= F.col("b.u_max"))
                    & (F.col("b.u_min") <= F.col("a.u_max")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("u_overlaps"),
            F.sum(
                F.when(
                    (F.col("a.t_min") <= F.col("b.t_max"))
                    & (F.col("b.t_min") <= F.col("a.t_max")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("t_overlaps"),
        )
    )


# --------------------------------------------------------- sequence packing

_SEQ_LEN = 128


@q(
    "corpus_pack_chunks",
    f"""
WITH t AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0))
           AS n_tok
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tok,
         CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
  FROM t WHERE n_tok > 0
),
b AS (
  SELECT source, doc_id, n_tok, cum, cum - n_tok AS strt,
         (cum - n_tok) // {_SEQ_LEN} AS first_chunk,
         (cum - 1) // {_SEQ_LEN} AS last_chunk
  FROM c
),
x AS (
  SELECT source, doc_id, n_tok, cum, strt, last_chunk,
         unnest(range(first_chunk, last_chunk + 1)) AS chunk_id
  FROM b
)
SELECT source, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN last_chunk = chunk_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_doc_ends,
       CAST(sum(least(cum, (chunk_id + 1) * {_SEQ_LEN})
                - greatest(strt, chunk_id * {_SEQ_LEN})) AS BIGINT) AS n_tokens
FROM x GROUP BY source, chunk_id
""",
    "LLM training-sequence PACKING (concat-and-chunk, the GPT-style packer):"
    " documents concatenate in deterministic order within each source shard"
    " and cut into fixed {0}-token sequences; per chunk: docs touched, doc"
    " boundaries inside it, tokens filled. One window cumsum per shard (no"
    " global sort — packing parallelizes by shard exactly as a distributed"
    " tokenizer does), then a bounded explode over the chunks each doc"
    " spans.".format(_SEQ_LEN),
)
def corpus_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from pgcapture_spark.operators.textstats import TOKENS_EXPR

    register_views(spark, sf_dir, ("documents",))
    s = _SEQ_LEN
    t = (
        spark.table("documents")
        .select(
            "doc_id", "source", F.size(F.expr(TOKENS_EXPR)).alias("n_tok")
        )
        .where("n_tok > 0")
    )
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    b = (
        t.withColumn("cum", F.sum("n_tok").over(w))
        .withColumn("strt", F.col("cum") - F.col("n_tok"))
        .withColumn("first_chunk", F.expr(f"strt div {s}"))
        .withColumn("last_chunk", F.expr(f"(cum - 1) div {s}"))
    )
    x = b.select(
        "source",
        "n_tok",
        "cum",
        "strt",
        "last_chunk",
        F.explode(F.expr("sequence(first_chunk, last_chunk)")).alias("chunk_id"),
    )
    return x.groupBy("source", F.col("chunk_id").cast("long").alias("chunk_id")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("last_chunk") == F.col("chunk_id"), 1).otherwise(0))
        .cast("long")
        .alias("n_doc_ends"),
        F.sum(
            F.least(F.col("cum"), (F.col("chunk_id") + 1) * s)
            - F.greatest(F.col("strt"), F.col("chunk_id") * s)
        )
        .cast("long")
        .alias("n_tokens"),
    )


# ------------------------------------------------------ decontamination

_NGRAM6_SPARK = (
    "CASE WHEN size(tokens) >= 6 THEN "
    "zip_with("
    "zip_with("
    "zip_with(slice(tokens, 1, size(tokens) - 5), slice(tokens, 2, size(tokens) - 5),"
    " (x, y) -> concat(x, ' ', y)), "
    "zip_with(slice(tokens, 3, size(tokens) - 5), slice(tokens, 4, size(tokens) - 5),"
    " (x, y) -> concat(x, ' ', y)), "
    "(a, b) -> concat(a, ' ', b)), "
    "zip_with(slice(tokens, 5, size(tokens) - 5), slice(tokens, 6, size(tokens) - 5),"
    " (x, y) -> concat(x, ' ', y)), "
    "(a, b) -> concat(a, ' ', b)) "
    "ELSE CAST(array() AS ARRAY<STRING>) END"
)

_NGRAM6_DUCK = (
    "CASE WHEN len(tokens) >= 6 THEN "
    "list_transform(range(1, len(tokens) - 4), "
    "i -> array_to_string(list_slice(tokens, i, i + 5), ' ')) "
    "ELSE CAST([] AS VARCHAR[]) END"
)


@q(
    "corpus_decontaminate",
    f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)
           AS tokens
  FROM documents
),
g AS (SELECT DISTINCT doc_id, unnest({_NGRAM6_DUCK}) AS gram FROM t),
ev AS (SELECT doc_id AS eval_id, gram FROM g WHERE doc_id % 11 = 0),
tr AS (SELECT doc_id, gram FROM g WHERE doc_id % 11 <> 0)
SELECT tr.doc_id,
       CAST(count(DISTINCT ev.eval_id) AS BIGINT) AS n_eval_docs,
       CAST(count(DISTINCT tr.gram) AS BIGINT) AS n_shared_ngrams
FROM tr JOIN ev ON tr.gram = ev.gram
GROUP BY tr.doc_id
""",
    "Benchmark DECONTAMINATION (the GPT-3/PaLM n-gram filter): training docs"
    " sharing any 6-token n-gram with the held-out eval set are flagged with"
    " the count of eval docs hit and distinct shared n-grams. The n-gram"
    " join is a bucketed equi-join on the gram (at 100 TB: hash the gram,"
    " df-cap ultra-common grams exactly like the shingle-overlap operator);"
    " constant-reference zip_with n-gram construction keeps the expression"
    " linear under predicate pushdown.",
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import with_tokens

    register_views(spark, sf_dir, ("documents",))
    g = (
        with_tokens(spark.table("documents"))
        .select("doc_id", F.explode(F.expr(_NGRAM6_SPARK)).alias("gram"))
        .distinct()
    )
    ev = g.where("doc_id % 11 = 0").select(
        F.col("doc_id").alias("eval_id"), "gram"
    )
    tr = g.where("doc_id % 11 <> 0")
    return (
        tr.join(ev, "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("eval_id").alias("n_eval_docs"),
            F.countDistinct("gram").alias("n_shared_ngrams"),
        )
    )


# ------------------------------------------------------------ A/B test stats


@q(
    "events_ab_test_stats",
    """
WITH u AS (SELECT DISTINCT user_id, user_id % 2 AS arm FROM events),
n AS (SELECT sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_t,
             sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_c
      FROM u),
conv AS (SELECT event_type, user_id, user_id % 2 AS arm,
                max(value) > 120.0 AS converted
         FROM events GROUP BY event_type, user_id, user_id % 2),
c AS (SELECT event_type,
             sum(CASE WHEN arm = 1 AND converted THEN 1 ELSE 0 END) AS conv_t,
             sum(CASE WHEN arm = 0 AND converted THEN 1 ELSE 0 END) AS conv_c
      FROM conv GROUP BY event_type)
SELECT event_type,
       CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
       CAST(conv_t AS BIGINT) AS conv_t, CAST(conv_c AS BIGINT) AS conv_c,
       (CAST(conv_t AS DOUBLE) / n_t - CAST(conv_c AS DOUBLE) / n_c)
         / nullif(sqrt((CAST(conv_t + conv_c AS DOUBLE) / (n_t + n_c))
                * (1.0 - CAST(conv_t + conv_c AS DOUBLE) / (n_t + n_c))
                * (1.0 / n_t + 1.0 / n_c)), 0.0) AS z_score
FROM c, n
""",
    "A/B experiment readout over the event stream: per event_type, users"
    " converting in each arm (arm = user hash parity) and the two-proportion"
    " pooled z-score. The z is an identical IEEE expression tree in both"
    " engines (sqrt/division of integer-derived doubles are correctly-rounded"
    " — bit-identical); all counts are distinct-user aggregates with"
    " map-side combine.",
)
def events_ab_test_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    ev = spark.table("events")
    u = ev.select("user_id").distinct().withColumn("arm", F.expr("user_id % 2"))
    n = u.agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_c"),
    )
    conv = (
        ev.groupBy("event_type", "user_id", F.expr("user_id % 2").alias("arm"))
        .agg((F.max("value") > 120.0).alias("converted"))
    )
    c = conv.groupBy("event_type").agg(
        F.sum(F.when((F.col("arm") == 1) & F.col("converted"), 1).otherwise(0)).alias(
            "conv_t"
        ),
        F.sum(F.when((F.col("arm") == 0) & F.col("converted"), 1).otherwise(0)).alias(
            "conv_c"
        ),
    )
    return c.crossJoin(F.broadcast(n)).select(
        "event_type",
        F.col("n_t").cast("long").alias("n_t"),
        F.col("n_c").cast("long").alias("n_c"),
        F.col("conv_t").cast("long").alias("conv_t"),
        F.col("conv_c").cast("long").alias("conv_c"),
        F.expr(
            "(CAST(conv_t AS DOUBLE) / n_t - CAST(conv_c AS DOUBLE) / n_c)"
            " / nullif(sqrt((CAST(conv_t + conv_c AS DOUBLE) / (n_t + n_c))"
            " * (1.0 - CAST(conv_t + conv_c AS DOUBLE) / (n_t + n_c))"
            " * (1.0 / n_t + 1.0 / n_c)), 0.0)"
        ).alias("z_score"),
    )


# ------------------------------------------------------ market-basket lift


@q(
    "basket_brand_lift",
    """
WITH ob AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM ob),
br AS (SELECT p_brand, count(*) AS n_b FROM ob GROUP BY p_brand),
pr AS (
  SELECT a.p_brand AS b1, b.p_brand AS b2, count(*) AS n_pair
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY a.p_brand, b.p_brand
)
SELECT b1, b2, CAST(n_pair AS BIGINT) AS n_pair,
       CAST((1000000 * n_pair * n_orders) // (x.n_b * y.n_b) AS BIGINT)
         AS lift_ppm
FROM pr JOIN br x ON pr.b1 = x.p_brand
        JOIN br y ON pr.b2 = y.p_brand
        CROSS JOIN tot
WHERE n_pair >= 3
ORDER BY lift_ppm DESC, b1, b2
LIMIT 25
""",
    "Market-basket association (support + lift) over order contents: brand"
    " pairs co-occurring in an order, ranked by integer-exact lift"
    " (ppm-quantized — both engines compute the same 64-bit quotient). The"
    " pair generation is an equi-join on the order key with per-order"
    " fan-out bounded by basket size (≤ items-per-order², never corpus-"
    "wide); brand marginals broadcast.",
)
def basket_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem", "part"))
    # persist the per-order brand-set projection: it feeds the totals, the
    # marginals (twice, via the b1/b2 aliases) and both sides of the pair
    # join — without the cache each reference re-scans lineitem (flagged by
    # the plan audit). The projection is the bounded summary a real pipeline
    # would materialize anyway; the next query drops the cache (queries.q).
    ob = (
        spark.table("lineitem")
        .select("l_orderkey", "l_partkey")
        .join(
            F.broadcast(spark.table("part").select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
        .distinct()
        .persist()
    )
    tot = ob.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    br = ob.groupBy("p_brand").agg(F.count("*").alias("n_b"))
    pr = (
        ob.alias("a")
        .join(
            ob.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(F.col("a.p_brand").alias("b1"), F.col("b.p_brand").alias("b2"))
        .agg(F.count("*").alias("n_pair"))
        .where("n_pair >= 3")
    )
    return (
        pr.join(F.broadcast(br.withColumnRenamed("p_brand", "b1")
                            .withColumnRenamed("n_b", "n_b1")), "b1")
        .join(F.broadcast(br.withColumnRenamed("p_brand", "b2")
                          .withColumnRenamed("n_b", "n_b2")), "b2")
        .crossJoin(F.broadcast(tot))
        .select(
            "b1",
            "b2",
            F.col("n_pair").cast("long").alias("n_pair"),
            F.expr("CAST(1000000 AS BIGINT) * n_pair * n_orders div (n_b1 * n_b2)")
            .cast("long")
            .alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "b1", "b2")
        .limit(25)
    )


# -------------------------------------------------------- class balancing


@q(
    "sample_class_balance",
    f"""
WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
m AS (SELECT min(n) AS mn FROM c),
r AS (
  SELECT vec_id, label,
         row_number() OVER (PARTITION BY label
                            ORDER BY {kmv_hash_expr("vec_id")}, vec_id) AS rn
  FROM embeddings
)
SELECT label, vec_id FROM r, m WHERE rn <= mn
""",
    "Class-balanced downsampling (the dataset-curation equalizer): every"
    " label keeps exactly min-class-count rows, chosen by a DETERMINISTIC"
    " integer hash lottery (the shared KMV permutation — bit-identical"
    " cross-engine, reproducible across runs/cluster sizes). One window per"
    " label partition; the min count broadcasts.",
)
def sample_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    register_views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    mn = emb.groupBy("label").count().agg(F.min("count").alias("mn"))
    w = W.partitionBy("label").orderBy(
        F.expr(kmv_hash_expr("vec_id")), F.col("vec_id")
    )
    return (
        emb.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(mn))
        .where(F.col("rn") <= F.col("mn"))
        .select("label", "vec_id")
    )


# -------------------------------------------------------- corpus mix schedule


@q(
    "corpus_mix_schedule",
    """
WITH t AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> len(x) > 0))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
tot AS (SELECT sum(n_tokens) AS total_tok, count(*) AS n_langs FROM t)
SELECT lang, n_docs, n_tokens,
       CAST((1000000 * n_tokens) // total_tok AS BIGINT) AS share_ppm,
       CAST((1000 * (1000000 // n_langs))
            // ((1000000 * n_tokens) // total_tok) AS BIGINT) AS repeat_milli
FROM t, tot
""",
    "Training-corpus MIX SCHEDULE: per-language token share (ppm) and the"
    " epoch repeat factor (milli) that rebalances the mixture to a uniform"
    " target — the domain-weighting step every LLM data pipeline runs before"
    " sampling. All integer-exact quotients (identical 64-bit division in"
    " both engines); one aggregate + a one-row broadcast.",
)
def corpus_mix_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import TOKENS_EXPR

    register_views(spark, sf_dir, ("documents",))
    t = (
        spark.table("documents")
        .select("lang", F.size(F.expr(TOKENS_EXPR)).alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )
    tot = t.agg(
        F.sum("n_tokens").alias("total_tok"), F.count("*").alias("n_langs")
    )
    return t.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        "n_tokens",
        F.expr("CAST(1000000 * n_tokens div total_tok AS BIGINT)").alias("share_ppm"),
        F.expr(
            "CAST((1000 * (1000000 div n_langs))"
            " div (1000000 * n_tokens div total_tok) AS BIGINT)"
        ).alias("repeat_milli"),
    )


# ======================================================== r6 second batch:
# Matryoshka truncation recall, filtered ANN, exact-integer CUSUM
# changepoints, CDC presence (TOAST-rate) profiling, linear attribution.

_DUCK_NORMED_HALF = """
SELECT vec_id, label, e,
       sqrt(list_sum(list_transform(e, v -> v * v))) AS norm,
       sqrt(list_sum(list_transform(list_slice(e, 1, 32), v -> v * v))) AS norm_h
FROM (SELECT vec_id, label, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
      FROM embeddings)
"""


@q(
    "sim_matryoshka_recall",
    f"""
WITH normed AS ({_DUCK_NORMED_HALF}),
queries AS (SELECT vec_id AS query_id, e AS qe, norm AS qn, norm_h AS qnh
            FROM normed WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, 65), i -> q.qe[i] * n.e[i]))
           / (q.qn * n.norm) AS raw_full,
         list_sum(list_transform(range(1, 33), i -> q.qe[i] * n.e[i]))
           / (q.qnh * n.norm_h) AS raw_half
  FROM queries q JOIN normed n ON n.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY raw_full DESC, neighbor_id) AS rank_full,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY raw_half DESC, neighbor_id) AS rank_half
  FROM scored
)
SELECT query_id,
       CAST(sum(CASE WHEN rank_full <= 10 AND rank_half <= 10 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_overlap,
       CAST((1000 * sum(CASE WHEN rank_full <= 10 AND rank_half <= 10
                             THEN 1 ELSE 0 END)) // 10 AS BIGINT) AS recall_milli
FROM ranked GROUP BY query_id
""",
    "Matryoshka (MRL) TRUNCATION RECALL: for each probe, the top-10 by"
    " half-dimension cosine (first 32 of 64 dims — the cheap prefix a"
    " matryoshka-trained embedding serves) is scored against the full-dim"
    " top-10; recall@10 tells whether the truncated index can serve"
    " first-pass retrieval. One broadcast-probe scan computes BOTH scores"
    " (the truncated dot is a prefix of the full fold), two windows share"
    " the single exchange.",
)
def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from pgcapture_spark.operators.similarity import DOT_EXPR, with_norm

    register_views(spark, sf_dir, ("embeddings",))
    k = 10
    base = with_norm(spark.table("embeddings")).select(
        "vec_id",
        "emb_d",
        "norm",
        F.expr(
            "sqrt(aggregate(slice(emb_d, 1, 32), CAST(0.0 AS DOUBLE),"
            " (acc, v) -> acc + v * v))"
        ).alias("norm_h"),
    )
    queries = base.where("vec_id % 50 = 0").select(
        F.col("vec_id").alias("query_id"),
        F.col("emb_d").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.col("norm_h").alias("q_norm_h"),
    )
    half_dot = (
        "aggregate(zip_with(slice({a}, 1, 32), slice({b}, 1, 32),"
        " (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    scored = base.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            F.expr(DOT_EXPR.format(a="q_emb", b="emb_d"))
            / (F.col("q_norm") * F.col("norm"))
        ).alias("raw_full"),
        (
            F.expr(half_dot.format(a="q_emb", b="emb_d"))
            / (F.col("q_norm_h") * F.col("norm_h"))
        ).alias("raw_half"),
    )
    wf = W.partitionBy("query_id").orderBy(F.desc("raw_full"), "neighbor_id")
    wh = W.partitionBy("query_id").orderBy(F.desc("raw_half"), "neighbor_id")
    ranked = scored.select(
        "query_id",
        F.row_number().over(wf).alias("rank_full"),
        F.row_number().over(wh).alias("rank_half"),
    )
    return ranked.groupBy("query_id").agg(
        F.sum(
            F.when((F.col("rank_full") <= k) & (F.col("rank_half") <= k), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_overlap"),
        F.expr(
            f"CAST(1000 * sum(CASE WHEN rank_full <= {k} AND rank_half <= {k}"
            f" THEN 1 ELSE 0 END) div {k} AS BIGINT)"
        ).alias("recall_milli"),
    )


@q(
    "sim_filtered_ann",
    f"""
WITH normed AS ({_DUCK_NORMED_HALF}),
queries AS (SELECT vec_id AS query_id, label AS q_label, e AS qe, norm AS qn
            FROM normed WHERE vec_id % 25 = 1),
scored AS (
  SELECT q.query_id, n.vec_id AS neighbor_id, n.label,
         list_sum(list_transform(range(1, 65), i -> q.qe[i] * n.e[i]))
           / (q.qn * n.norm) AS raw
  FROM queries q JOIN normed n
    ON n.label = q.q_label AND n.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, label, raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY raw DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, label, rank,
       floor(raw * 1000000 + 0.5) / 1000000 AS score
FROM ranked WHERE rank <= 5
""",
    "FILTERED vector search (the vector-DB metadata-predicate case): top-5"
    " cosine neighbors restricted to candidates sharing the probe's label —"
    " the filter composes INTO the candidate join (label equi-join key ∧"
    " broadcast probes), so selective predicates shrink the scan instead of"
    " post-filtering a larger top-k; an IVF variant would intersect cell"
    " lists with a label posting index.",
)
def sim_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from pgcapture_spark.operators.similarity import DOT_EXPR, with_norm

    register_views(spark, sf_dir, ("embeddings",))
    base = with_norm(spark.table("embeddings")).select(
        "vec_id", "label", "emb_d", "norm"
    )
    queries = base.where("vec_id % 25 = 1").select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("emb_d").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    scored = base.join(
        F.broadcast(queries),
        (F.col("label") == F.col("q_label")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "label",
        (
            F.expr(DOT_EXPR.format(a="q_emb", b="emb_d"))
            / (F.col("q_norm") * F.col("norm"))
        ).alias("raw"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("raw"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where("rank <= 5")
        .select(
            "query_id",
            "neighbor_id",
            "label",
            "rank",
            (F.floor(F.col("raw") * 1_000_000 + F.lit(0.5)) / 1_000_000).alias("score"),
        )
    )


_CUSUM_WHERE = "user_id % 10 = 1"


@q(
    "ts_changepoint_cusum",
    f"""
WITH e AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE {_CUSUM_WHERE}
),
w AS (
  SELECT user_id, ts, event_id, cents,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
         CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
         CAST(sum(cents) OVER (PARTITION BY user_id) AS BIGINT) AS total
  FROM e
),
d AS (
  SELECT user_id, event_id, i, n,
         abs(n * cum - i * total) AS d_abs,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY abs(n * cum - i * total) DESC, i) AS rn
  FROM w
)
SELECT user_id, CAST(n AS BIGINT) AS n_events, CAST(i AS BIGINT) AS cp_index,
       event_id AS cp_event_id, CAST(d_abs AS BIGINT) AS d_abs_max
FROM d WHERE rn = 1
""",
    "CUSUM CHANGE-POINT detection, exact-integer form: the classic cumulative"
    " deviation max |Σᵢ(xⱼ - x̄)| is cross-multiplied to |n·cumᵢ - i·total| so"
    " both engines compute identical 64-bit integers (no float mean). One"
    " key-hash exchange per user serves the ordering window, the running"
    " sum, the totals, and the argmax rank (ties → earliest index).",
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    register_views(spark, sf_dir, ("events",))
    e = (
        spark.table("events")
        .where(_CUSUM_WHERE)
        .select(
            "user_id",
            "ts",
            "event_id",
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        )
    )
    ordw = W.partitionBy("user_id").orderBy("ts", "event_id")
    full = W.partitionBy("user_id")
    w = e.select(
        "user_id",
        "event_id",
        F.row_number().over(ordw).alias("i"),
        F.sum("cents").over(ordw.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        F.count("*").over(full).alias("n"),
        F.sum("cents").over(full).alias("total"),
    ).withColumn("d_abs", F.abs(F.col("n") * F.col("cum") - F.col("i") * F.col("total")))
    pick = W.partitionBy("user_id").orderBy(F.desc("d_abs"), "i")
    return (
        w.withColumn("rn", F.row_number().over(pick))
        .where("rn = 1")
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_events"),
            F.col("i").cast("long").alias("cp_index"),
            F.col("event_id").alias("cp_event_id"),
            F.col("d_abs").cast("long").alias("d_abs_max"),
        )
    )


def _present_stats_duck() -> str:
    cols_list = ", ".join(f"'{c}'" for c in CDC_COLS["customer"])
    return f"""
WITH feed AS ({cdc_customer_sql(DUCKDB)}),
upd AS (SELECT present FROM feed WHERE op = 'UPDATE'),
x AS (SELECT present, unnest([{cols_list}]) AS col_name FROM upd)
SELECT col_name,
       CAST(count(*) AS BIGINT) AS n_updates,
       CAST(sum(CASE WHEN instr(',' || present || ',', ',' || col_name || ',') > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_present,
       CAST((1000000 * sum(CASE WHEN instr(',' || present || ',',
                                           ',' || col_name || ',') > 0
                                THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
         AS present_ppm
FROM x GROUP BY col_name
"""


@q(
    "cdc_present_stats",
    _present_stats_duck(),
    "CDC presence profiling (TOAST-rate observability): per column, how often"
    " UPDATE events actually carry it — 1e6−ppm ≈ the column's unchanged-"
    "TOAST rate, the statistic that says which columns force old-image"
    " lookups on apply (pkg/decode/decoder.go:106-114 presence model). A"
    " constant column-list explode over the update stream; fully scan-fused.",
)
def cdc_present_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer",))
    cols_arr = ", ".join(f"'{c}'" for c in CDC_COLS["customer"])
    upd = _feed(spark, sf_dir, "customer").where("op = 'UPDATE'").select("present")
    x = upd.select(
        "present", F.explode(F.expr(f"array({cols_arr})")).alias("col_name")
    )
    hit = "instr(',' || present || ',', ',' || col_name || ',') > 0"
    return x.groupBy("col_name").agg(
        F.count("*").alias("n_updates"),
        F.expr(f"CAST(sum(CASE WHEN {hit} THEN 1 ELSE 0 END) AS BIGINT)").alias(
            "n_present"
        ),
        F.expr(
            f"CAST(1000000 * sum(CASE WHEN {hit} THEN 1 ELSE 0 END)"
            " div count(*) AS BIGINT)"
        ).alias("present_ppm"),
    )


@q(
    "events_attribution_linear",
    """
WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
           FROM events WHERE event_type = 'purchase'),
t AS (SELECT event_id AS touch_id, user_id, event_type, ts AS t_ts
      FROM events WHERE event_type IN ('click', 'view')),
pairs AS (
  SELECT p.purchase_id, t.touch_id, t.event_type
  FROM p JOIN t ON p.user_id = t.user_id
   AND t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 3 DAY
),
per AS (
  SELECT purchase_id, touch_id, event_type,
         count(*) OVER (PARTITION BY purchase_id) AS n_touches
  FROM pairs
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum(1000000 // n_touches) AS BIGINT) AS credit_ppm
FROM per GROUP BY event_type
""",
    "Linear multi-touch ATTRIBUTION: every purchase splits 1e6 ppm of credit"
    " equally across the user's click/view touches in the 3 days before it;"
    " credit per touch type is the integer-exact sum. The pair join is"
    " user-keyed with a time-band predicate (per-user fan-out bounded by"
    " events-per-user × window — the interval-overlap-join shape, never"
    " corpus² pairs).",
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    register_views(spark, sf_dir, ("events",))
    ev = spark.table("events")
    p = ev.where("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    t = ev.where("event_type IN ('click', 'view')").select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("t_user"),
        "event_type",
        F.col("ts").alias("t_ts"),
    )
    pairs = p.join(
        t,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.expr("p_ts - INTERVAL 3 DAY")),
    ).select("purchase_id", "touch_id", "event_type")
    per = pairs.withColumn(
        "n_touches", F.count("*").over(W.partitionBy("purchase_id"))
    )
    return per.groupBy("event_type").agg(
        F.count("*").alias("n_touches"),
        F.expr("CAST(sum(1000000 div n_touches) AS BIGINT)").alias("credit_ppm"),
    )


# ======================================================== r6 third batch:
# last-touch attribution, seasonal-baseline outliers, vocab coverage,
# temperature mixing, CDC feed-order audit, embedding drift.


@q(
    "events_attribution_last_touch",
    """
WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
           FROM events WHERE event_type = 'purchase'),
t AS (SELECT event_id AS touch_id, user_id, event_type, ts AS t_ts
      FROM events WHERE event_type IN ('click', 'view')),
pairs AS (
  SELECT p.purchase_id, t.touch_id, t.event_type, t.t_ts,
         row_number() OVER (PARTITION BY p.purchase_id
                            ORDER BY t.t_ts DESC, t.touch_id DESC) AS rn
  FROM p JOIN t ON p.user_id = t.user_id
   AND t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 3 DAY
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_attributed
FROM pairs WHERE rn = 1 GROUP BY event_type
""",
    "LAST-TOUCH attribution (the companion to events_attribution_linear):"
    " each purchase credits only its most recent click/view in the 3-day"
    " window (deterministic (t_ts, touch_id) tiebreak). Same user-keyed"
    " time-band join; the per-purchase argmax is one window over the"
    " bounded pair set.",
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    register_views(spark, sf_dir, ("events",))
    ev = spark.table("events")
    p = ev.where("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    t = ev.where("event_type IN ('click', 'view')").select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("t_user"),
        "event_type",
        F.col("ts").alias("t_ts"),
    )
    pairs = p.join(
        t,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.expr("p_ts - INTERVAL 3 DAY")),
    )
    w = W.partitionBy("purchase_id").orderBy(F.desc("t_ts"), F.desc("touch_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_attributed"))
    )


_SEAS_WHERE = "user_id % 10 = 2"


@q(
    "ts_seasonal_hourly_outlier",
    f"""
WITH e AS (
  SELECT user_id, event_id, ts, hour(ts) AS hod,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE {_SEAS_WHERE}
),
b AS (
  SELECT user_id, event_id, ts, hod, cents,
         CAST(sum(cents) OVER (PARTITION BY user_id, hod) AS BIGINT)
           // CAST(count(*) OVER (PARTITION BY user_id, hod) AS BIGINT)
           AS baseline_cents
  FROM e
),
r AS (
  SELECT user_id, event_id, hod, cents, baseline_cents,
         abs(cents - baseline_cents) AS abs_residual,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY abs(cents - baseline_cents) DESC,
                                     ts, event_id) AS rn
  FROM b
)
SELECT user_id, event_id, CAST(hod AS BIGINT) AS hod, cents, baseline_cents,
       CAST(abs_residual AS BIGINT) AS abs_residual
FROM r WHERE rn = 1
""",
    "Seasonal-baseline ANOMALY: each user's hour-of-day profile (integer-div"
    " mean cents per (user, hour) — a window aggregate, no self-join) is the"
    " deseasonalized baseline; the per-user top residual is the flagged"
    " reading. One key-hash exchange serves the profile windows and the"
    " argmax rank; complements ts_rolling_zscore (trend) with the seasonal"
    " decomposition angle.",
)
def ts_seasonal_hourly_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    register_views(spark, sf_dir, ("events",))
    e = (
        spark.table("events")
        .where(_SEAS_WHERE)
        .select(
            "user_id",
            "event_id",
            "ts",
            F.hour("ts").alias("hod"),
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        )
    )
    grp = W.partitionBy("user_id", "hod")
    b = e.withColumn(
        "baseline_cents",
        F.expr(
            "CAST(sum(cents) OVER (PARTITION BY user_id, hod) AS BIGINT)"
            " div CAST(count(*) OVER (PARTITION BY user_id, hod) AS BIGINT)"
        ),
    ).withColumn("abs_residual", F.abs(F.col("cents") - F.col("baseline_cents")))
    pick = W.partitionBy("user_id").orderBy(F.desc("abs_residual"), "ts", "event_id")
    return (
        b.withColumn("rn", F.row_number().over(pick))
        .where("rn = 1")
        .select(
            "user_id",
            "event_id",
            F.col("hod").cast("long").alias("hod"),
            "cents",
            "baseline_cents",
            F.col("abs_residual").cast("long").alias("abs_residual"),
        )
    )


@q(
    "text_vocab_coverage",
    """
WITH t AS (
  SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)
           AS tokens
  FROM documents
),
tok AS (SELECT unnest(tokens) AS token FROM t),
cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY token),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM cnt),
rk AS (SELECT token, c, row_number() OVER (ORDER BY c DESC, token) AS rnk FROM cnt),
ks AS (SELECT unnest([10, 100, 1000]) AS k)
SELECT CAST(k AS BIGINT) AS k,
       CAST(sum(CASE WHEN rnk <= k THEN 1 ELSE 0 END) AS BIGINT) AS n_terms,
       CAST(sum(CASE WHEN rnk <= k THEN c ELSE 0 END) AS BIGINT) AS covered_tokens,
       CAST((1000000 * sum(CASE WHEN rnk <= k THEN c ELSE 0 END)) // max(tot.total)
            AS BIGINT) AS coverage_ppm
FROM rk, ks, tot
GROUP BY k
""",
    "VOCABULARY COVERAGE curve (the tokenizer-budget question: how much of"
    " the corpus do the top-k terms cover?): term frequencies rank"
    " deterministically and the k ∈ {10, 100, 1000} cutoffs report covered"
    " tokens + ppm share. The corpus folds to the vocab-sized count table"
    " before any ranking, so the global order is over vocabulary rows, not"
    " corpus rows.",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from pgcapture_spark.operators.textstats import token_rows

    register_views(spark, sf_dir, ("documents",))
    cnt = (
        token_rows(spark.table("documents"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    # global rank over VOCAB-sized rows (the count table), not the corpus
    rk = cnt.withColumn(
        "rnk", F.row_number().over(W.orderBy(F.desc("c"), "token"))
    )
    tot = cnt.agg(F.sum("c").cast("long").alias("total"))
    ks = spark.range(0).sparkSession.createDataFrame([(10,), (100,), (1000,)], "k long")
    return (
        rk.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("rnk") <= F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("n_terms"),
            F.sum(F.when(F.col("rnk") <= F.col("k"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("covered_tokens"),
            F.expr(
                "CAST(1000000 * sum(CASE WHEN rnk <= k THEN c ELSE 0 END)"
                " div max(total) AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )


@q(
    "corpus_temperature_mix",
    """
WITH t AS (
  SELECT lang,
         CAST(sum(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> len(x) > 0))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
s AS (
  SELECT lang, n_tokens,
         CAST((1000000 * n_tokens) // (SELECT sum(n_tokens) FROM t) AS BIGINT)
           AS share_ppm
  FROM t
),
w AS (
  SELECT lang, n_tokens, share_ppm,
         CAST(floor(sqrt(CAST(share_ppm AS DOUBLE))) AS BIGINT) AS w
  FROM s
)
SELECT lang, n_tokens, share_ppm,
       CAST((1000 * w) // (SELECT sum(w) FROM w) AS BIGINT) AS temp_weight_milli
FROM w
""",
    "TEMPERATURE-scaled sampling mix (T = 2, the standard multilingual"
    " upsampling): per-language weight ∝ √share, integer-exact end to end —"
    " sqrt of an integer-valued double is correctly rounded IEEE in both"
    " engines and floors to the same BIGINT, so the weights hash-match"
    " bit-for-bit (no pow(), whose cross-engine rounding is unspecified)."
    " Complements corpus_mix_schedule's uniform-target repeat factors.",
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import TOKENS_EXPR

    register_views(spark, sf_dir, ("documents",))
    t = (
        spark.table("documents")
        .select("lang", F.size(F.expr(TOKENS_EXPR)).alias("n_tok"))
        .groupBy("lang")
        .agg(F.sum("n_tok").cast("long").alias("n_tokens"))
    )
    tot = t.agg(F.sum("n_tokens").alias("total_tok"))
    s = t.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        F.expr("CAST(1000000 * n_tokens div total_tok AS BIGINT)").alias("share_ppm"),
    )
    w = s.withColumn(
        "w", F.expr("CAST(floor(sqrt(CAST(share_ppm AS DOUBLE))) AS BIGINT)")
    )
    wtot = w.agg(F.sum("w").alias("w_total"))
    return w.crossJoin(F.broadcast(wtot)).select(
        "lang",
        "n_tokens",
        "share_ppm",
        F.expr("CAST(1000 * w div w_total AS BIGINT)").alias("temp_weight_milli"),
    )


def _order_audit_duck() -> str:
    return f"""
WITH feed AS ({cdc_customer_sql(DUCKDB)})
SELECT lsn,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(seq) AS BIGINT) AS seq_min,
       CAST(max(seq) AS BIGINT) AS seq_max,
       (min(seq) = 1 AND max(seq) - min(seq) + 1 = count(*)
        AND count(DISTINCT seq) = count(*)) AS seq_contiguous,
       (count(DISTINCT commit_ts) = 1) AS ts_consistent
FROM feed GROUP BY lsn
"""


@q(
    "cdc_feed_order_audit",
    _order_audit_duck(),
    "CDC feed-order AUDIT (the invariants the cursor/tracker machinery relies"
    " on — pkg/cursor/main.go:20-26 (lsn, seq) total order): per transaction,"
    " seq must be gap-free from 1 and every event must share the tx's commit"
    " timestamp. One aggregation over the feed; violations surface as"
    " boolean columns a monitor alerts on (here the deterministic fixture"
    " passes both checks, so the oracle pins the audit itself).",
)
def cdc_feed_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer",))
    feed = _feed(spark, sf_dir, "customer")
    return feed.groupBy("lsn").agg(
        F.count("*").alias("n_events"),
        F.min("seq").cast("long").alias("seq_min"),
        F.max("seq").cast("long").alias("seq_max"),
        (
            (F.min("seq") == 1)
            & ((F.max("seq") - F.min("seq") + 1) == F.count("*"))
            & (F.countDistinct("seq") == F.count("*"))
        ).alias("seq_contiguous"),
        (F.countDistinct("commit_ts") == 1).alias("ts_consistent"),
    )


@q(
    "sim_embedding_drift",
    """
WITH e AS (
  SELECT vec_id, label, vec_id % 2 AS arm,
         list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb
  FROM embeddings
),
q AS (
  SELECT label, arm, i,
         CAST(sum(CAST(floor(emb[i] * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_q,
         CAST(count(*) AS BIGINT) AS n
  FROM e, (SELECT unnest(range(1, 65)) AS i) ix
  GROUP BY label, arm, i
),
c AS (
  SELECT a.label, a.i,
         a.sum_q // a.n AS cent_a, b.sum_q // b.n AS cent_b,
         a.n AS n_a, b.n AS n_b
  FROM q a JOIN q b ON a.label = b.label AND a.i = b.i
   AND a.arm = 0 AND b.arm = 1
)
SELECT label,
       CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
       CAST(floor(sqrt(CAST(sum((cent_a - cent_b) * (cent_a - cent_b))
                            AS DOUBLE))) AS BIGINT) AS l2_shift_q
FROM c GROUP BY label
""",
    "EMBEDDING DRIFT monitor: per-label centroid L2 shift between two data"
    " halves (vec_id parity as the time proxy) — the production check that a"
    " refreshed embedding model or corpus slice hasn't moved the space."
    " Integer-exact: coordinates quantize to μ-units before summing (double"
    " sums are ordering-dependent and would hash-diverge), centroids are"
    " integer quotients, and the final sqrt of an exact integer floors"
    " identically in both engines. Per-coordinate sums are one mergeable"
    " aggregation; nothing pairwise.",
)
def sim_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("embeddings",))
    e = spark.table("embeddings").select(
        "label",
        F.expr("vec_id % 2").alias("arm"),
        F.posexplode(F.expr("transform(embedding, v -> CAST(v AS DOUBLE))")).alias(
            "i0", "v"
        ),
    )
    q = (
        e.select(
            "label",
            "arm",
            (F.col("i0") + 1).alias("i"),
            F.expr("CAST(floor(v * 1000000 + 0.5) AS BIGINT)").alias("qv"),
        )
        .groupBy("label", "arm", "i")
        .agg(F.sum("qv").alias("sum_q"), F.count("*").alias("n"))
    )
    a = q.where("arm = 0").select(
        "label", "i",
        F.expr("sum_q div n").alias("cent_a"), F.col("n").alias("n_a"),
    )
    b = q.where("arm = 1").select(
        "label", "i",
        F.expr("sum_q div n").alias("cent_b"), F.col("n").alias("n_b"),
    )
    c = a.join(b, ["label", "i"])
    return c.groupBy("label").agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        F.expr(
            "CAST(floor(sqrt(CAST(sum((cent_a - cent_b) * (cent_a - cent_b))"
            " AS DOUBLE))) AS BIGINT)"
        ).alias("l2_shift_q"),
    )
