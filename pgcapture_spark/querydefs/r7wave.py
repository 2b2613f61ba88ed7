"""Round-7 registry wave: the remaining IVM hard cases (min/max with bounded
rescan, COUNT DISTINCT via a support table, a 3-table join view), the
schema-evolving streamed apply on bucketed state, tx-registry retention as a
declared maintenance op, streamed corpus-drift and exact-dedup consumers, and
the training-pipeline tail (position-based attribution, bucket-skew compaction
planning).

Every query keeps the cross-engine determinism contract: integer cents /
milli/ppm quantization, explicit portable hashes where bucketing reaches the
output, and identical IEEE expression trees where doubles are unavoidable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcapture_spark.catalog import CDC_COLS, register_views
from pgcapture_spark.fixtures.cdc_feed import (
    DUCKDB,
    cdc_customer_sql,
    cdc_orders_sql,
    ddl_feed_sql,
)
from pgcapture_spark.operators.apply import apply_oracle_sql
from pgcapture_spark.queries import _feed, q

_ORDERS_APPLIED = apply_oracle_sql(
    cdc_orders_sql(DUCKDB), "orders", "o_orderkey", CDC_COLS["orders"]
)
_CUSTOMER_APPLIED = apply_oracle_sql(
    cdc_customer_sql(DUCKDB), "customer", "c_custkey", CDC_COLS["customer"]
)


# ---------------------------------------------- schema-evolving streamed apply


@q(
    "cdc_apply_ddl_streamed",
    apply_oracle_sql(
        f"SELECT * FROM ({ddl_feed_sql()}) WHERE op <> 'DDL'",
        "(SELECT c_custkey, c_acctbal, CAST(NULL AS STRING) AS c_note FROM customer)",
        "c_custkey",
        ["c_acctbal", "c_note"],
    ),
    "A6/P5 STREAMED on bucketed state: in-stream ALTER TABLE ADD COLUMN"
    " mid-feed — the schema change is a version boundary in the"
    " EvolvingBucketedState manifest (field list swaps atomically with the"
    " bucket pointers); buckets touched after the DDL carry the new schema,"
    " untouched buckets evolve lazily via merge-schema reads + manifest"
    " alignment. Per-trigger reads and commits stay O(touched buckets)"
    " across the DDL (pkg/sink/postgres.go:296-393 semantics). Converges to"
    " the same oracle as the batch cdc_apply_ddl_evolution.",
)
def cdc_apply_ddl_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pgcapture_spark.sources.feed import cached_fixture_segments, read_feed_stream
    from pgcapture_spark.streaming.pipeline import apply_stream_with_ddl
    from pgcapture_spark.streaming.state import EvolvingBucketedState

    register_views(spark, sf_dir, ("customer",))
    d = tempfile.mkdtemp(prefix="pgcs_q_ddlstream_")
    feed_dir = cached_fixture_segments(
        spark, sf_dir, "ddl_feed", lambda: spark.sql(ddl_feed_sql()), n_segments=4
    )
    schema = spark.read.parquet(feed_dir).schema
    state = EvolvingBucketedState(spark, f"{d}/state", "c_custkey", n_buckets=16)
    query = apply_stream_with_ddl(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
        state,
        spark.table("customer").select("c_custkey", "c_acctbal"),
        "c_custkey",
        f"{d}/ckpt",
    )
    query.awaitTermination(300)
    return state.read()


# ------------------------------------------------------- IVM hard cases

_MINMAX_ORACLE = f"""
WITH applied AS ({_CUSTOMER_APPLIED})
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(CAST(floor(coalesce(c_acctbal, 0.0) * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS min_cents,
       CAST(max(CAST(floor(coalesce(c_acctbal, 0.0) * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS max_cents
FROM applied GROUP BY c_nationkey
"""


@q(
    "cdc_ivm_minmax_view",
    _MINMAX_ORACLE,
    "The NON-abelian IVM hard case: maintained per-group MIN/MAX under"
    " deletes. Support-row algebra (min/max value + extreme-population"
    " counts) decides every group whose delta is conclusive in O(delta);"
    " only groups whose extreme population is EXHAUSTED with no replacing"
    " add rescan — an exact, semi-join-pruned pass over just those groups"
    " (operators/ivm_minmax.py; incremental.py's docstring names min/max as"
    " exactly the aggregate needing this). Oracle: from-scratch min/max/"
    "count over the applied snapshot.",
)
def cdc_ivm_minmax_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.ivm_minmax import ivm_minmax_view

    register_views(spark, sf_dir, ("customer",))
    return ivm_minmax_view(
        spark.table("customer"),
        _feed(spark, sf_dir, "customer"),
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        CDC_COLS["customer"],
    )


@q(
    "cdc_ivm_minmax_view_streamed",
    _MINMAX_ORACLE,
    "The non-abelian MIN/MAX view maintained CONTINUOUSLY on bucketed state"
    " (streaming/mv.py::minmax_stream): snapshot (key-bucketed), a"
    " GROUP-co-bucketed (key, group, value) projection, and the per-group"
    " support table advance under ONE atomic manifest per micro-batch."
    " Delta-conclusive groups update by the same support algebra as the"
    " batch form (shared ivm_minmax.support_delta_update); groups whose"
    " extreme population is exhausted recompute from the co-bucketed"
    " projection's touched buckets only — the dirty rescan is GROUP-pruned,"
    " which the key bucketing alone could never give. Converges to the"
    " batch oracle.",
)
def cdc_ivm_minmax_view_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pgcapture_spark.sources.feed import cached_fixture_segments, read_feed_stream
    from pgcapture_spark.streaming.multi import BucketedMultiTableState
    from pgcapture_spark.streaming.mv import minmax_stream

    register_views(spark, sf_dir, ("customer",))
    d = tempfile.mkdtemp(prefix="pgcs_q_minmaxstream_")
    feed_dir = cached_fixture_segments(
        spark, sf_dir, "cust_feed",
        lambda: _feed(spark, sf_dir, "customer"), n_segments=5,
    )
    schema = spark.read.parquet(feed_dir).schema
    state = BucketedMultiTableState(
        spark,
        f"{d}/state",
        ["snapshot", "by_group", "support"],
        {
            "snapshot": "c_custkey",
            "by_group": "c_nationkey",
            "support": "c_nationkey",
        },
        n_buckets=16,
    )
    query = minmax_stream(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=2),
        state,
        spark.table("customer"),
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        CDC_COLS["customer"],
        f"{d}/ckpt",
    )
    query.awaitTermination(300)
    return state.read()["support"].select(
        "c_nationkey",
        F.col("n").alias("n_rows"),
        F.col("min_v").alias("min_cents"),
        F.col("max_v").alias("max_cents"),
    )


_DISTINCT_ORACLE = f"""
WITH applied AS ({_CUSTOMER_APPLIED})
SELECT c_nationkey,
       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_distinct,
       CAST(count(*) AS BIGINT) AS n_rows
FROM applied GROUP BY c_nationkey
"""


@q(
    "cdc_ivm_distinct_view",
    _DISTINCT_ORACLE,
    "Maintained COUNT(DISTINCT) per group — the other non-abelian aggregate,"
    " delta-maintained through its (group, value)→count SUPPORT table (which"
    " IS abelian: +1/-1 per signed delta row; distinct = values with count"
    " > 0, NULLs counted in rows but not distinct). No rescan ever, at the"
    " cost of support space — the textbook trade against ivm_minmax's"
    " bounded rescan (operators/ivm.py::ivm_distinct_view). Oracle:"
    " from-scratch COUNT(DISTINCT) over the applied snapshot.",
)
def cdc_ivm_distinct_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.ivm import ivm_distinct_view

    register_views(spark, sf_dir, ("customer",))
    return ivm_distinct_view(
        spark.table("customer"),
        _feed(spark, sf_dir, "customer"),
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        CDC_COLS["customer"],
    )


_STAR_ORACLE = f"""
WITH ao AS ({_ORDERS_APPLIED}), ac AS ({_CUSTOMER_APPLIED})
SELECT r.r_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(coalesce(o.o_totalprice, 0.0) * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_cents
FROM ao o
JOIN ac c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


@q(
    "cdc_ivm_starjoin_view",
    _STAR_ORACLE,
    "4-table star-schema join view maintained under BOTH fact-side feeds:"
    " V = per-REGION order count + revenue over orders ⋈ customer ⋈ nation ⋈"
    " region. Static dimensions contribute no delta terms — the change"
    " algebra is exactly the 2-table signed delta (operators/ivm.py),"
    " rolled up the nation→region chain with ONE broadcast hash join"
    " (ivm_star_view): the reason star-schema MVs stay cheap at 100 TB."
    " Oracle: the from-scratch 4-way join over the applied snapshots.",
)
def cdc_ivm_starjoin_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.ivm import (
        ivm_join_delta,
        ivm_star_view,
        join_view_base,
        signed_key_delta,
    )

    register_views(spark, sf_dir, ("customer", "orders", "nation", "region"))
    orders, customer = spark.table("orders"), spark.table("customer")
    dims = (
        spark.table("nation")
        .join(
            spark.table("region"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("c_nationkey"), "r_name")
    )
    base = (
        join_view_base(orders, customer)
        .join(F.broadcast(dims), "c_nationkey")
        .groupBy("r_name")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_cents").alias("sum_cents"),
        )
    )
    # lazy lineage cut (see ivm.ivm_join_view's note): leaf-plan the deltas
    d_o = signed_key_delta(
        orders, _feed(spark, sf_dir, "orders"), "o_orderkey", CDC_COLS["orders"]
    ).localCheckpoint(eager=False)
    d_c = signed_key_delta(
        customer, _feed(spark, sf_dir, "customer"), "c_custkey", CDC_COLS["customer"]
    ).localCheckpoint(eager=False)
    view_delta = ivm_join_delta(orders, customer, d_o, d_c)
    return ivm_star_view(view_delta, dims, base)


# ------------------------------------------------- streamed drift monitor


@q(
    "corpus_drift_psi_streamed",
    None,  # set below — reuses the batch PSI oracle verbatim
    "The drift monitor as a CONTINUOUS consumer: the 'current' corpus half"
    " arrives as a stream; each micro-batch's (feature, bucket) counts merge"
    " ADDITIVELY into a bucketed summary state (the persisted-summary"
    " pattern of agg_heavy_hitters_streamed — state is distribution-sized,"
    " never corpus-sized), and PSI against the static reference half is"
    " derived from the summary alone. Converges to the batch"
    " corpus_drift_psi oracle exactly (same Laplace smoothing, same"
    " nano-quantized terms).",
)
def corpus_drift_psi_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pgcapture_spark.querydefs.pipeline import doc_feature_rows, psi_from_counts
    from pgcapture_spark.sources.feed import cached_fixture_segments, read_feed_stream
    from pgcapture_spark.streaming.pipeline import commit_keyed_state
    from pgcapture_spark.streaming.state import BucketedSnapshotState

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").where(F.col("doc_id").isNotNull())
    d = tempfile.mkdtemp(prefix="pgcs_q_psistream_")
    feed_dir = cached_fixture_segments(
        spark, sf_dir, "psi_docs",
        lambda: docs.where("doc_id % 2 = 1").select("doc_id", "n_chars", "lang"),
        n_segments=5, order_col="doc_id",
    )
    schema = spark.read.parquet(feed_dir).schema
    state = BucketedSnapshotState(
        spark, f"{d}/state", ["feature", "bucket"], n_buckets=8
    )

    def _batch(batch_df, batch_id):
        if batch_id <= state.last_batch():
            return
        bc = (
            doc_feature_rows(batch_df)
            .groupBy("feature", "bucket")
            .agg(F.count("*").cast("long").alias("cur_cnt"))
            .persist()
        )
        try:
            def _merge(cur):
                if cur is None:
                    return bc
                m = cur.alias("c").join(
                    bc.alias("b"), on=["feature", "bucket"], how="full_outer"
                )
                return m.select(
                    "feature",
                    "bucket",
                    (
                        F.coalesce("c.cur_cnt", F.lit(0))
                        + F.coalesce("b.cur_cnt", F.lit(0))
                    ).alias("cur_cnt"),
                )

            commit_keyed_state(state, batch_id, bc.select("feature", "bucket"), _merge)
        finally:
            bc.unpersist()

    query = (
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=2)
        .writeStream.foreachBatch(_batch)
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(300)

    cur = state.read()
    ref = (
        doc_feature_rows(docs.where("doc_id % 2 = 0"))
        .groupBy("feature", "bucket")
        .agg(F.count("*").cast("long").alias("ref_cnt"))
    )
    if cur is None:
        counts = ref.withColumn("cur_cnt", F.lit(0).cast("long"))
    else:
        counts = cur.alias("c").join(
            ref.alias("r"), on=["feature", "bucket"], how="full_outer"
        ).select(
            "feature",
            "bucket",
            F.coalesce("c.cur_cnt", F.lit(0)).alias("cur_cnt"),
            F.coalesce("r.ref_cnt", F.lit(0)).alias("ref_cnt"),
        )
    return psi_from_counts(counts)


def _set_psi_streamed_oracle() -> None:
    from pgcapture_spark.querydefs.pipeline import _DUCK_PSI
    from pgcapture_spark.queries import REGISTRY

    REGISTRY["corpus_drift_psi_streamed"].oracle = _DUCK_PSI


_set_psi_streamed_oracle()


# --------------------------------------------- tx-registry retention (prune)

_PRUNE_SAFE_ORD = 214_748_364_800  # 2^31 * 100 — mid-keyspace of the lsn hash

_PRUNE_ORACLE = f"""
WITH feed AS ({cdc_customer_sql(DUCKDB)}),
tx AS (SELECT DISTINCT lsn FROM feed)
SELECT lsn,
       CAST(1704067200000000 + (lsn % 86400) * 1000000 - 946684800000000
            AS BIGINT) AS commit_us
FROM tx WHERE lsn * 100 + 99 >= {_PRUNE_SAFE_ORD}
"""


@q(
    "cdc_tx_registry_prune",
    _PRUNE_ORACLE,
    "Tx-registry RETENTION as a declared maintenance op"
    " (streaming/pipeline.py::prune_tx_registry — the compact_log analog for"
    " the wire consumers' cross-batch Begin registry): fold the protobuf"
    " stream's Begin frames into the persisted registry, then drop every"
    " transaction whose whole (Begin..Commit) ord span lies before the safe"
    " watermark — their rows can never arrive again. The maintenance commit"
    " must NOT advance the replay gate (it lands in a .pruneK version dir"
    " under the same batch_id); superseded versions vacuum. Oracle: the"
    " surviving (lsn, commit-time) set computed from the feed arithmetic.",
)
def cdc_tx_registry_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pgcapture_spark.functions.protowire import parse_messages_udf
    from pgcapture_spark.querydefs.extras import proto_customer_messages
    from pgcapture_spark.sources.feed import cached_fixture_segments
    from pgcapture_spark.streaming.pipeline import prune_tx_registry
    from pgcapture_spark.streaming.state import SnapshotState

    register_views(spark, sf_dir, ("customer",))
    d = tempfile.mkdtemp(prefix="pgcs_q_txprune_")
    feed_dir = cached_fixture_segments(
        spark, sf_dir, "proto_cust",
        lambda: proto_customer_messages(spark, sf_dir)[0], n_segments=6,
    )
    wire = spark.read.parquet(feed_dir)
    parsed = wire.select("lsn", parse_messages_udf(safe=True)("data").alias("f"))
    begins = (
        parsed.where("f.op = 'BEGIN'")
        .select("lsn", F.col("f.commit_us").alias("commit_us"))
        .dropDuplicates(["lsn"])
    )
    tx_state = SnapshotState(spark, f"{d}/txreg")
    tx_state.commit(begins, 0)
    before, after = prune_tx_registry(tx_state, _PRUNE_SAFE_ORD)
    assert after <= before and tx_state.last_batch() == 0
    return tx_state.read()


# ------------------------------------------------- streamed exact dedup

_DEDUP_STREAM_ORACLE = """
SELECT sha256(text) AS content_sha,
       CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents WHERE text IS NOT NULL
GROUP BY 1
"""


@q(
    "dedup_exact_streamed",
    _DEDUP_STREAM_ORACLE,
    "Exact dedup as a CONTINUOUS consumer: documents arrive as a stream in"
    " doc_id order; per micro-batch each text's sha256 fingerprint folds"
    " into bucketed state holding ONLY (digest, first-seen keeper,"
    " occurrence count) — 32-byte digests shuffle and persist, never"
    " document payloads, and each trigger reads/rewrites only the digest"
    " buckets the batch touches. first-seen = least(doc_id) is associative,"
    " so replays and cross-batch duplicates resolve identically to the"
    " batch oracle (min doc_id per digest).",
)
def dedup_exact_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pgcapture_spark.sources.feed import cached_fixture_segments, read_feed_stream
    from pgcapture_spark.streaming.pipeline import commit_keyed_state
    from pgcapture_spark.streaming.state import BucketedSnapshotState

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").where("text IS NOT NULL")
    d = tempfile.mkdtemp(prefix="pgcs_q_dedupstream_")
    feed_dir = cached_fixture_segments(
        spark, sf_dir, "dedup_docs",
        lambda: docs.select("doc_id", "text"),
        n_segments=5, order_col="doc_id",
    )
    schema = spark.read.parquet(feed_dir).schema
    state = BucketedSnapshotState(spark, f"{d}/state", "content_sha", n_buckets=16)

    def _batch(batch_df, batch_id):
        if batch_id <= state.last_batch():
            return
        bc = (
            batch_df.select(
                F.sha2("text", 256).alias("content_sha"), "doc_id"
            )
            .groupBy("content_sha")
            .agg(
                F.min("doc_id").cast("long").alias("keeper_doc_id"),
                F.count("*").cast("long").alias("n_docs"),
            )
            .persist()
        )
        try:
            def _merge(cur):
                if cur is None:
                    return bc
                m = cur.alias("c").join(
                    bc.alias("b"), on="content_sha", how="full_outer"
                )
                return m.select(
                    "content_sha",
                    F.least(
                        F.coalesce("c.keeper_doc_id", "b.keeper_doc_id"),
                        F.coalesce("b.keeper_doc_id", "c.keeper_doc_id"),
                    ).alias("keeper_doc_id"),
                    (
                        F.coalesce("c.n_docs", F.lit(0))
                        + F.coalesce("b.n_docs", F.lit(0))
                    ).alias("n_docs"),
                )

            commit_keyed_state(state, batch_id, bc.select("content_sha"), _merge)
        finally:
            bc.unpersist()

    query = (
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=2)
        .writeStream.foreachBatch(_batch)
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(300)
    return state.read()


# ------------------------------------- position-based multi-touch attribution

# integer division differs lexically per engine (Spark DIV, DuckDB //)
_POS_CREDIT_TPL = """
CASE WHEN n_touches = 1 THEN 1000000
     WHEN n_touches = 2 THEN 500000
     WHEN rn_a = 1 THEN 400000
     WHEN rn_d = 1 THEN 400000
     ELSE 200000 {idiv} (n_touches - 2) END
"""
_POS_CREDIT_DUCK = _POS_CREDIT_TPL.format(idiv="//")
_POS_CREDIT_SPARK = _POS_CREDIT_TPL.format(idiv="DIV")


@q(
    "events_attribution_position",
    f"""
WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
           FROM events WHERE event_type = 'purchase'),
t AS (SELECT event_id AS touch_id, user_id, event_type, ts AS t_ts
      FROM events WHERE event_type IN ('click', 'view')),
pairs AS (
  SELECT p.purchase_id, t.touch_id, t.event_type, t.t_ts
  FROM p JOIN t ON p.user_id = t.user_id
   AND t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 3 DAY
),
per AS (
  SELECT purchase_id, touch_id, event_type,
         count(*) OVER (PARTITION BY purchase_id) AS n_touches,
         row_number() OVER (PARTITION BY purchase_id
                            ORDER BY t_ts, touch_id) AS rn_a,
         row_number() OVER (PARTITION BY purchase_id
                            ORDER BY t_ts DESC, touch_id DESC) AS rn_d
  FROM pairs
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum({_POS_CREDIT_DUCK}) AS BIGINT) AS credit_ppm
FROM per GROUP BY event_type
""",
    "POSITION-BASED (U-shaped 40/20/40) attribution — completes the"
    " linear / last-touch family: first and last touch of each purchase's"
    " 3-day window earn 400k ppm each, middles split the remaining 200k"
    " (integer division; 1-touch and 2-touch journeys degenerate to 100%/"
    "50-50). Rank under an explicit (ts, touch_id) total order so ties are"
    " deterministic; one purchase-keyed exchange shared by the count and"
    " both rank passes.",
)
def events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    ).select("purchase_id", "touch_id", "event_type", "t_ts")
    pk = W.partitionBy("purchase_id")
    per = pairs.select(
        "purchase_id",
        "touch_id",
        "event_type",
        F.count("*").over(pk).alias("n_touches"),
        F.row_number().over(pk.orderBy("t_ts", "touch_id")).alias("rn_a"),
        F.row_number().over(
            pk.orderBy(F.col("t_ts").desc(), F.col("touch_id").desc())
        ).alias("rn_d"),
    )
    return per.groupBy("event_type").agg(
        F.count("*").alias("n_touches"),
        F.sum(F.expr(_POS_CREDIT_SPARK)).cast("long").alias("credit_ppm"),
    )


# --------------------------------------------- bucket-layout compaction plan

_SKEW_N_BUCKETS = 32


def _skew_plan_sql() -> str:
    from pgcapture_spark.operators.kmv import kmv_hash_expr

    hv = kmv_hash_expr("c_custkey")
    return f"""
WITH b AS (
  SELECT ({hv}) % {_SKEW_N_BUCKETS} AS bucket_id,
         28 + length(coalesce(c_name, '')) + length(coalesce(c_mktsegment, ''))
           AS est
  FROM customer
),
per AS (
  SELECT bucket_id,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(est) AS BIGINT) AS est_bytes
  FROM b GROUP BY bucket_id
),
tot AS (
  SELECT bucket_id, n_rows, est_bytes,
         CAST(sum(est_bytes) OVER () / {_SKEW_N_BUCKETS} AS BIGINT) AS target
  FROM per
)
SELECT bucket_id, n_rows, est_bytes,
       CASE WHEN est_bytes > 2 * target THEN 'split'
            WHEN est_bytes * 2 < target THEN 'compact'
            ELSE 'keep' END AS action
FROM tot
"""


@q(
    "state_bucket_skew_plan",
    _skew_plan_sql(),
    "Bucketed-state MAINTENANCE planner (the OPTIMIZE companion to the"
    " streaming state layer): audit a key-bucketed layout's balance — rows"
    " and byte estimates per bucket under a portable multiplicative hash —"
    " and emit the rewrite plan (split overweight buckets, compact"
    " underweight ones vs the uniform target). The audit costs one"
    " aggregation over the table; the totals window runs over n_buckets"
    " rows only. Integer arithmetic end-to-end, so the plan is"
    " deterministic cross-engine.",
)
def state_bucket_skew_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(_skew_plan_sql())


# ------------------------------------------------- per-group TOP-K IVM

_TOPK_ORACLE = f"""
WITH applied AS ({_CUSTOMER_APPLIED}),
ranked AS (
  SELECT c_nationkey, c_custkey,
         CAST(floor(coalesce(c_acctbal, 0.0) * 100 + 0.5) AS BIGINT) AS acct_cents,
         row_number() OVER (
           PARTITION BY c_nationkey
           ORDER BY CAST(floor(coalesce(c_acctbal, 0.0) * 100 + 0.5) AS BIGINT) DESC,
                    c_custkey ASC
         ) AS rk
  FROM applied
)
SELECT c_nationkey, CAST(rk AS BIGINT) AS rk, c_custkey, acct_cents
FROM ranked WHERE rk <= 3
"""


@q(
    "cdc_ivm_topk_view",
    _TOPK_ORACLE,
    "Maintained per-group TOP-K under deletes — the generalization of the"
    " min/max hard case: the view keeps the k best ROWS per group, so a"
    " retraction inside the kept set needs a replacement no aggregate row"
    " can name. The support is a bounded candidate window (top-m per group,"
    " m = k + slack); retractions drop out of it, additions re-trim it —"
    " O(delta) — and only groups whose surviving window falls below k while"
    " rows exist beyond it rescan (exact, semi-join-pruned;"
    " operators/ivm_topk.py). Ties break (v DESC, key ASC) — a total order"
    " both engines share. Oracle: from-scratch row_number <= k over the"
    " applied snapshot.",
)
def cdc_ivm_topk_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.ivm_topk import ivm_topk_view

    register_views(spark, sf_dir, ("customer",))
    return ivm_topk_view(
        spark.table("customer"),
        _feed(spark, sf_dir, "customer"),
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        CDC_COLS["customer"],
        k=3,
    ).select(
        "c_nationkey",
        "rk",
        "c_custkey",
        F.col("v").alias("acct_cents"),
    )


@q(
    "cdc_ivm_topk_view_streamed",
    _TOPK_ORACLE,
    "The per-group TOP-K view maintained CONTINUOUSLY on the same tri-table"
    " bucketed state as the min/max form (streaming/mv.py::topk_stream):"
    " snapshot (key-bucketed), the GROUP-co-bucketed (key, group, value)"
    " projection, and the top-m candidate window advance under ONE atomic"
    " manifest per micro-batch. Window-conclusive groups re-trim by the"
    " SHARED algebra (ivm_topk.topk_support_update — batch and streamed"
    " forms cannot drift); slack-exhausted groups rebuild from the merged"
    " by_group slice, whose group-bucketed layout also yields the exact"
    " post-batch group sizes with no stored count table. Per-trigger reads"
    " and commits are O(touched buckets). Converges to the batch oracle.",
)
def cdc_ivm_topk_view_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import Window as W

    from pgcapture_spark.sources.feed import cached_fixture_segments, read_feed_stream
    from pgcapture_spark.streaming.multi import BucketedMultiTableState
    from pgcapture_spark.streaming.mv import topk_stream

    register_views(spark, sf_dir, ("customer",))
    d = tempfile.mkdtemp(prefix="pgcs_q_topkstream_")
    feed_dir = cached_fixture_segments(
        spark, sf_dir, "cust_feed",
        lambda: _feed(spark, sf_dir, "customer"), n_segments=5,
    )
    schema = spark.read.parquet(feed_dir).schema
    state = BucketedMultiTableState(
        spark,
        f"{d}/state",
        ["snapshot", "by_group", "support"],
        {
            "snapshot": "c_custkey",
            "by_group": "c_nationkey",
            "support": "c_nationkey",
        },
        n_buckets=16,
    )
    query = topk_stream(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=2),
        state,
        spark.table("customer"),
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        CDC_COLS["customer"],
        f"{d}/ckpt",
        k=3,
    )
    query.awaitTermination(300)
    sup = state.read()["support"]
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("v").desc(), F.col("c_custkey").asc()
    )
    return (
        sup.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 3)
        .select("c_nationkey", "rk", "c_custkey", F.col("v").alias("acct_cents"))
    )


@q(
    "cdc_ivm_starjoin_view_streamed",
    _STAR_ORACLE,
    "The 4-table star view maintained CONTINUOUSLY: ivm_join_stream carries"
    " a FIFTH state table — the region-grain rollup — advanced per"
    " micro-batch by ivm_star_view over the SAME signed join-view delta"
    " (static dims add no delta terms, so the star grain costs one"
    " broadcast rollup join per trigger). All five tables commit under ONE"
    " atomic bucketed manifest; the star table's touched buckets are named"
    " by the delta's coarse keys, untouched region buckets are never read"
    " or rewritten. Reuses the batch starjoin oracle verbatim (the typed"
    " multi-table stream is oracle-equivalent to the two single-table"
    " feeds, as cdc_ivm_join_view_streamed already establishes).",
)
def cdc_ivm_starjoin_view_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pgcapture_spark.fixtures.cdc_feed import SPARK, multi_feed_sql
    from pgcapture_spark.sources.feed import cached_fixture_segments, read_feed_stream
    from pgcapture_spark.streaming.multi import BucketedMultiTableState
    from pgcapture_spark.streaming.mv import ivm_join_stream

    register_views(spark, sf_dir, ("customer", "orders", "nation", "region"))
    dims = (
        spark.table("nation")
        .join(
            spark.table("region"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("c_nationkey"), "r_name")
    )
    d = tempfile.mkdtemp(prefix="pgcs_q_ivmstar_")
    feed_dir = cached_fixture_segments(
        spark, sf_dir, "ivm_multi",
        lambda: spark.sql(multi_feed_sql(SPARK)), n_segments=5,
    )
    schema = spark.read.parquet(feed_dir).schema
    state = BucketedMultiTableState(
        spark,
        f"{d}/state",
        ["orders", "customer", "orders_ck", "mv", "mv_star"],
        {
            "orders": "o_orderkey",
            "customer": "c_custkey",
            "orders_ck": "o_custkey",
            "mv": "c_nationkey",
            "mv_star": "r_name",
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
        star_dims=dims,
    )
    query.awaitTermination(300)
    return state.read()["mv_star"]
