"""Training-data pipeline queries (north-star additions): near-dup cluster
resolution, sequence-packing batch planning, deterministic stratified
sampling. These are the ops that turn the per-doc signals (textops/vector)
into an actual dataset build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcapture_spark.catalog import register_views
from pgcapture_spark.operators.dedup import near_dup_clusters
from pgcapture_spark.operators.packing import (
    keep_hash_expr,
    packed_batches,
    stratified_sample,
)
from pgcapture_spark.operators.textstats import token_count
from pgcapture_spark.queries import q
from pgcapture_spark.querydefs.textops import _DUCK_TOKENS, _duck_minhash_sql

# ------------------------------------------------------- near-dup clusters

_DUCK_CLUSTERS = f"""
WITH RECURSIVE
pairs AS ({_duck_minhash_sql()}),
edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
          UNION ALL
          SELECT b_id AS src, a_id AS dst FROM pairs),
cc(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, c.lbl FROM cc c JOIN edges e ON e.src = c.node
),
comp AS (SELECT node AS doc_id, min(lbl) AS canonical_id FROM cc GROUP BY node),
sizes AS (SELECT canonical_id, count(*) AS cluster_size FROM comp GROUP BY 1)
SELECT comp.doc_id, comp.canonical_id, sizes.cluster_size
FROM comp JOIN sizes USING (canonical_id)
"""


@q(
    "dedup_clusters",
    _DUCK_CLUSTERS,
    "North-star: near-dup CLUSTER resolution — MinHash+LSH pairs → connected"
    " components (min-label propagation, one shuffle per round, sum-of-labels"
    " convergence certificate) → (doc, canonical, cluster size). The oracle is"
    " a recursive CTE over the same edge list.",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return near_dup_clusters(spark.table("documents"), threshold=0.1)


@q(
    "dedup_clusters_star",
    _DUCK_CLUSTERS,
    "North-star: the same cluster resolution via alternating large-star/"
    "small-star (Kiveris et al.) — O(log n) rounds on ANY graph depth where"
    " label propagation needs diameter rounds; same recursive-CTE oracle.",
)
def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.dedup import (
        connected_components_star,
        minhash_lsh_pairs,
    )

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.1)
    comp = connected_components_star(docs.select("doc_id"), pairs)
    sizes = comp.groupBy("canonical_id").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, on="canonical_id").select(
        "doc_id", "canonical_id", "cluster_size"
    )


_DUCK_SPLIT = f"""
WITH RECURSIVE
pairs AS ({_duck_minhash_sql()}),
edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
          UNION ALL
          SELECT b_id AS src, a_id AS dst FROM pairs),
cc(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, c.lbl FROM cc c JOIN edges e ON e.src = c.node
),
comp AS (SELECT node AS doc_id, min(lbl) AS canonical_id FROM cc GROUP BY node)
SELECT doc_id, canonical_id,
       CASE WHEN ('0x' || substr(md5('split|' || CAST(canonical_id AS VARCHAR)), 1, 8))::BIGINT % 10 = 0
            THEN 'val' ELSE 'train' END AS split
FROM comp
"""


@q(
    "corpus_split_leakage_safe",
    _DUCK_SPLIT,
    "North-star: leakage-safe train/validation split — the holdout decision"
    " hashes the near-dup CLUSTER canonical (md5, bit-reproducible), never"
    " the document, so a near-duplicate can never straddle the split and"
    " leak validation content into training. Naive split-by-doc-hash is the"
    " classic eval-contamination bug this op exists to prevent; same"
    " min-label components as dedup_clusters, split assignment is a pure"
    " projection on top.",
)
def corpus_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    comp = near_dup_clusters(spark.table("documents"), threshold=0.1).select(
        "doc_id", "canonical_id"
    )
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("split|"),
               F.col("canonical_id").cast("string"))), 1, 8), 16, 10)
        .cast("bigint") % 10
    )
    return comp.withColumn(
        "split", F.when(bucket == 0, F.lit("val")).otherwise(F.lit("train"))
    )


# ------------------------------------------------------- sequence packing

_PACK_BUDGET = 4096

_DUCK_PACKING = f"""
WITH t AS (SELECT doc_id, len({_DUCK_TOKENS}) AS n_tokens FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM t)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, start_offset,
       CAST(start_offset // {_PACK_BUDGET} AS BIGINT) AS batch_id
FROM c
"""


@q(
    "pack_sequences",
    _DUCK_PACKING,
    "North-star: sequence-packing batch plan — docs in stable order laid"
    " end-to-end, batch = budget-block of the start offset; the cumulative sum"
    " is the two-phase distributed prefix scan (range partition → parallel"
    " in-partition window → broadcast prefix offsets), NOT a single-task"
    " global window.",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    toks = token_count(spark.table("documents")).select("doc_id", "n_tokens")
    return packed_batches(toks, budget=_PACK_BUDGET)


# --------------------------------------------------- deterministic sampling

_RATES = {"click": 25, "view": 10, "signup": 100, "purchase": 100, "error": 0}


def _duck_sample_sql() -> str:
    keep = (
        "('0x' || substr(md5('strat|' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 100"
    )
    rates = " ".join(
        f"WHEN event_type = '{s}' THEN {p}" for s, p in sorted(_RATES.items())
    )
    return f"""
SELECT event_id, user_id, event_type, value
FROM events
WHERE {keep} < (CASE {rates} ELSE 0 END)
"""


@q(
    "sample_stratified",
    _duck_sample_sql(),
    "North-star: deterministic stratified sampling — per-stratum keep rates"
    " decided by an md5 key hash (pure function of the row), bit-reproducible"
    " across engines, partitionings and reruns; what rng sample() cannot give.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    out = stratified_sample(
        spark.table("events"), stratum_col="event_type", key_col="user_id", rates_pct=_RATES
    )
    return out.select("event_id", "user_id", "event_type", "value")


# --------------------------------------------- near-dup corpus selection

from pgcapture_spark.querydefs.textops import duck_gate_tail  # noqa: E402

_DUCK_SELECT_NEARDUP = f"""
WITH RECURSIVE
pairs AS ({_duck_minhash_sql()}),
edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
          UNION ALL
          SELECT b_id AS src, a_id AS dst FROM pairs),
cc(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, c.lbl FROM cc c JOIN edges e ON e.src = c.node
),
comp AS (SELECT node AS doc_id, min(lbl) AS canonical_id FROM cc GROUP BY node),
surv AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id IN (SELECT doc_id FROM comp WHERE doc_id = canonical_id)
){duck_gate_tail()}"""


@q(
    "corpus_select_neardup",
    _DUCK_SELECT_NEARDUP,
    "North-star: NEAR-dup corpus selection — MinHash+LSH pairs →"
    " large-star/small-star connected components (O(log n) rounds) → keep"
    " each cluster's canonical doc (min doc_id) → the fused quality +"
    " language gate. What production pre-training dedup actually runs:"
    " exact dedup misses boilerplate-variant copies. Oracle: recursive-CTE"
    " components + the shared gate tail.",
)
def corpus_select_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import corpus_select_neardup as _op

    register_views(spark, sf_dir, ("documents",))
    return _op(spark.table("documents"), threshold=0.1)


from pgcapture_spark.querydefs.textops import _duck_corpus_select_sql  # noqa: E402


@q(
    "corpus_select_streamed",
    _duck_corpus_select_sql(),
    "North-star: the corpus-selection pipeline run INCREMENTALLY — document"
    " segments consumed as a stream (doc_id-range-ordered, a few per"
    " micro-batch); per batch: min-doc-per-hash, anti-join against the"
    " seen-hash state (range order makes the first arrival the global"
    " minimum), the fused quality+language gate on the truly-new docs only,"
    " append to the selected table. Converges to EXACTLY the batch"
    " corpus_select_pipeline result (same oracle) — new data costs"
    " O(batch), not a corpus rescan.",
)
def corpus_select_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from pyspark.sql import Window as W

    from pgcapture_spark.operators.textstats import select_gate
    from pgcapture_spark.sources.feed import cached_fixture_segments

    register_views(spark, sf_dir, ("documents",))
    d = tempfile.mkdtemp(prefix="pgcs_q_selstream_")
    # fixture INPUT edge (sources/feed.py contract): the doc-segment log is
    # shared with the other doc-stream consumers — one synthesis per process
    segs_dir = cached_fixture_segments(
        spark, sf_dir, "docs_segs",
        lambda: spark.table("documents").select("doc_id", "text"),
        n_segments=4, order_col="doc_id",
    )
    schema = spark.read.parquet(segs_dir).schema
    sel_dir, seen_dir = f"{d}/selected", f"{d}/seen"
    os.makedirs(sel_dir)
    os.makedirs(seen_dir)

    def _batch(bdf: DataFrame, bid: int) -> None:
        sp = bdf.sparkSession
        cand = (
            bdf.withColumn("h", F.md5("text"))
            .withColumn(
                "_rn", F.row_number().over(W.partitionBy("h").orderBy("doc_id"))
            )
            .where("_rn = 1")
            .drop("_rn")
        )
        if any(f.endswith(".parquet") for f in os.listdir(seen_dir)):
            new = cand.join(sp.read.parquet(seen_dir), "h", "left_anti")
        else:  # first batch — no seen state yet
            new = cand
        # persist before double-use (gate + seen append) to avoid recompute
        new = new.select("doc_id", "text", "h").localCheckpoint(eager=True)
        select_gate(new).write.mode("append").parquet(sel_dir)
        new.select("h").write.mode("append").parquet(seen_dir)

    query = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(segs_dir)
        .writeStream.foreachBatch(_batch)
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(300)
    return spark.read.parquet(sel_dir)


# ------------------------------------------------------- full export pipeline

_EXPORT_BUDGET = 4096
_EXPORT_SHARDS = 8


def _duck_export_sql() -> str:
    from pgcapture_spark.querydefs.textops import _duck_corpus_select_sql

    return f"""
WITH sel AS ({_duck_corpus_select_sql()}),
c AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM sel),
b AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, start_offset,
             CAST(start_offset // {_EXPORT_BUDGET} AS BIGINT) AS batch_id
      FROM c)
SELECT doc_id, n_tokens, start_offset, batch_id,
       CAST(('0x' || substr(md5(CAST(batch_id AS VARCHAR)), 1, 8))::BIGINT
            % {_EXPORT_SHARDS} AS INT) AS shard
FROM b
"""


@q(
    "corpus_export_pipeline",
    _duck_export_sql(),
    "North-star: the COMPLETE training-data export path as one declared"
    " query — exact dedup + quality/language gate (one shuffle), two-phase"
    " distributed prefix-sum sequence packing over the survivors, and"
    " batch-level deterministic md5 shard assignment (batches never split"
    " across shards) — selection, packing, and layout composed end-to-end.",
)
def corpus_export_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.packing import packed_batches
    from pgcapture_spark.operators.textstats import corpus_select

    register_views(spark, sf_dir, ("documents",))
    sel = corpus_select(
        spark.table("documents"), min_quality=0.5, min_tokens=20, langs=("en", "de")
    )
    packed = packed_batches(
        sel.select("doc_id", "n_tokens"), budget=_EXPORT_BUDGET
    )
    from pgcapture_spark.operators.textstats import shard_expr

    return packed.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "start_offset",
        "batch_id",
        shard_expr("batch_id", _EXPORT_SHARDS).alias("shard"),
    )


# ------------------------------------------------------- training order

_DUCK_INTERLEAVE = """
WITH h AS (SELECT doc_id, source,
                  md5('order|' || CAST(doc_id AS VARCHAR)) AS hkey
           FROM documents)
SELECT doc_id, source, hkey,
       CAST(row_number() OVER (ORDER BY hkey, doc_id) - 1 AS BIGINT) AS global_pos
FROM h
"""


@q(
    "corpus_interleave",
    _DUCK_INTERLEAVE,
    "North-star: deterministic global training order — the engine-independent"
    " 'shuffle' every pre-training run needs reproducibly: order key ="
    " md5('order|'||doc_id), global position via the TWO-PHASE distributed"
    " rank (range partition on the key → per-partition row counts → prefix"
    " offsets broadcast back), NEVER a single-task global window; any source"
    " is uniformly interleaved in every contiguous window by construction.",
)
def corpus_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """packed_batches with unit weights IS the distributed rank: start_offset
    of a 1-token doc ordered by the hash key = its 0-based global position."""
    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select(
        "doc_id",
        "source",
        F.expr("md5(concat('order|', CAST(doc_id AS STRING)))").alias("hkey"),
        F.lit(1).alias("_w"),
    )
    ranked = packed_batches(
        docs,
        budget=1 << 60,
        order_col="hkey",
        tokens_col="_w",
        extra_cols=("doc_id", "source"),
    )
    return ranked.select(
        "doc_id",
        "source",
        "hkey",
        F.col("start_offset").cast("bigint").alias("global_pos"),
    )


# ------------------------------------------------------- length curriculum

_DUCK_CURRICULUM = f"""
WITH t AS (SELECT doc_id, len({_DUCK_TOKENS}) AS n_tokens FROM documents),
hist AS (SELECT n_tokens, count(*) AS cnt FROM t GROUP BY 1),
cum AS (SELECT n_tokens,
               CAST(sum(cnt) OVER (ORDER BY n_tokens) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER () AS BIGINT) AS n FROM hist),
b AS (SELECT min(CASE WHEN cum >= ceil(n / 3.0) THEN n_tokens END) AS b1,
             min(CASE WHEN cum >= ceil(2 * n / 3.0) THEN n_tokens END) AS b2
      FROM cum),
staged AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens <= b.b1 THEN 0
              WHEN n_tokens <= b.b2 THEN 1 ELSE 2 END AS stage_idx
  FROM t CROSS JOIN b),
k AS (SELECT doc_id, n_tokens, stage_idx,
             CAST(stage_idx AS VARCHAR) || md5('curr|' || CAST(doc_id AS VARCHAR))
               AS okey
      FROM staged)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CASE stage_idx WHEN 0 THEN 'short' WHEN 1 THEN 'medium'
            ELSE 'long' END AS stage,
       CAST(row_number() OVER (ORDER BY okey, doc_id) - 1 AS BIGINT)
         AS curriculum_pos
FROM k
"""


@q(
    "corpus_length_curriculum",
    _DUCK_CURRICULUM,
    "North-star: sequence-length curriculum — docs staged short/medium/long"
    " by token-count TERCILES (thresholds from the sketch-sized length"
    " histogram, broadcast back — never a corpus-wide rank), then ONE"
    " deterministic global training order: stage-major, md5-shuffled within"
    " stage, positioned by the two-phase distributed rank. The"
    " easy-to-hard schedule every curriculum-training run needs"
    " reproducibly.",
)
def corpus_length_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from pgcapture_spark.operators.packing import packed_batches

    register_views(spark, sf_dir, ("documents",))
    t = token_count(spark.table("documents")).select("doc_id", "n_tokens")
    hist = t.groupBy("n_tokens").agg(F.count("*").alias("cnt"))
    cum = hist.select(
        "n_tokens",
        F.sum("cnt").over(W.orderBy("n_tokens")).cast("bigint").alias("cum"),
        F.sum("cnt").over(
            W.orderBy("n_tokens").rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).cast("bigint").alias("n"),
    )
    b = cum.agg(
        F.min(F.when(F.col("cum") >= F.ceil(F.col("n") / 3.0), F.col("n_tokens")))
        .alias("b1"),
        F.min(F.when(F.col("cum") >= F.ceil(2 * F.col("n") / 3.0), F.col("n_tokens")))
        .alias("b2"),
    )
    staged = t.join(F.broadcast(b)).select(
        "doc_id",
        "n_tokens",
        F.when(F.col("n_tokens") <= F.col("b1"), 0)
        .when(F.col("n_tokens") <= F.col("b2"), 1)
        .otherwise(2)
        .alias("stage_idx"),
    )
    keyed = staged.select(
        "doc_id",
        "n_tokens",
        "stage_idx",
        F.expr(
            "CAST(stage_idx AS STRING) || md5(concat('curr|', CAST(doc_id AS STRING)))"
        ).alias("okey"),
        F.lit(1).alias("_w"),
    )
    ranked = packed_batches(
        keyed,
        budget=1 << 60,
        order_col="okey",
        tokens_col="_w",
        extra_cols=("doc_id", "n_tokens", "stage_idx"),
    )
    return ranked.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.when(F.col("stage_idx") == 0, "short")
        .when(F.col("stage_idx") == 1, "medium")
        .otherwise("long")
        .alias("stage"),
        F.col("start_offset").cast("bigint").alias("curriculum_pos"),
    )


# --------------------------------------------- CDC-maintained corpus refresh


def _duck_corpus_refresh_sql() -> str:
    from pgcapture_spark.fixtures.cdc_feed import DUCKDB, cdc_documents_sql
    from pgcapture_spark.operators.apply import apply_oracle_sql
    from pgcapture_spark.querydefs.textops import duck_gate_tail

    applied = apply_oracle_sql(
        cdc_documents_sql(DUCKDB),
        "documents",
        "doc_id",
        ["text", "lang", "source", "n_chars"],
    )
    return f"""
WITH applied AS ({applied}),
surv AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM applied) WHERE rn = 1
){duck_gate_tail()}"""


@q(
    "cdc_corpus_refresh_select",
    _duck_corpus_refresh_sql(),
    "The integration the engine uniquely offers: a CDC change feed over the"
    " documents table (text-rewriting UPDATEs with TOAST-omitted lang,"
    " DELETEs retiring docs, INSERTs adding deliberate near-duplicates) is"
    " APPLIED to the snapshot with the standard idempotent fold, and the"
    " training-corpus selection (exact dedup + quality/language gate) runs"
    " over the LIVE applied snapshot — CDC-maintained corpus in, curated"
    " corpus out, one declared query.",
)
def cdc_corpus_refresh_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.fixtures.cdc_feed import SPARK, cdc_documents_sql
    from pgcapture_spark.operators.apply import cdc_apply
    from pgcapture_spark.operators.textstats import corpus_select

    register_views(spark, sf_dir, ("documents",))
    feed = spark.sql(cdc_documents_sql(SPARK))
    applied = cdc_apply(
        spark.table("documents"), feed, "doc_id", ["text", "lang", "source", "n_chars"]
    )
    return corpus_select(applied, min_quality=0.5, min_tokens=20, langs=("en", "de"))


# --------------------------------------------- streaming ingest dedup

from pgcapture_spark.querydefs.textops import duck_lsh_keepfirst_sql  # noqa: E402


@q(
    "dedup_incremental_streamed",
    duck_lsh_keepfirst_sql(),
    "North-star: CONTINUOUS-INGEST near-dup dedup — document segments arrive"
    " as a stream (doc_id-ordered, a few per micro-batch); each batch's LSH"
    " bucket rows equi-join the accumulated signature state (plus the batch"
    " itself), a doc is rejected iff a lower-id doc agrees on >=2 of 8"
    " MinHash signatures in a shared band bucket, and ALL batch signatures"
    " append to state (seen, not just accepted — rejected docs still shadow"
    " later dups). Converges to the batch keep-first LSH dedup exactly;"
    " ingest cost is O(batch x bucket collisions), never a corpus rescan.",
)
def dedup_incremental_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from pgcapture_spark.operators.dedup import SIG_AGREE_EXPR, lsh_bucket_rows
    from pgcapture_spark.sources.feed import cached_fixture_segments

    register_views(spark, sf_dir, ("documents",))
    d = tempfile.mkdtemp(prefix="pgcs_q_dedupstream_")
    segs_dir = cached_fixture_segments(
        spark, sf_dir, "docs_segs",
        lambda: spark.table("documents").select("doc_id", "text"),
        n_segments=4, order_col="doc_id",
    )
    schema = spark.read.parquet(segs_dir).schema
    state_dir, out_dir = f"{d}/sigstate", f"{d}/accepted"
    os.makedirs(state_dir)
    os.makedirs(out_dir)

    agree = SIG_AGREE_EXPR.format(a="a_sigs", b="sigs")

    def _batch(bdf: DataFrame, bid: int) -> None:
        sp = bdf.sparkSession
        buckets = lsh_bucket_rows(bdf).localCheckpoint(eager=True)
        prior = buckets.select(
            F.col("doc_id").alias("a_id"),
            F.col("sigs").alias("a_sigs"),
            "band_idx",
            "band_hash",
        )
        if any(f.endswith(".parquet") for f in os.listdir(state_dir)):
            seen = sp.read.parquet(state_dir).select(
                F.col("doc_id").alias("a_id"),
                F.col("sigs").alias("a_sigs"),
                "band_idx",
                "band_hash",
            )
            prior = prior.unionByName(seen)
        rejected = (
            buckets.join(prior, ["band_idx", "band_hash"])
            .where(F.col("a_id") < F.col("doc_id"))
            .where(F.expr(agree) >= 2)
            .select("doc_id")
            .distinct()
        )
        bdf.join(rejected, "doc_id", "left_anti").select("doc_id").write.mode(
            "append"
        ).parquet(out_dir)
        buckets.write.mode("append").parquet(state_dir)

    query = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(segs_dir)
        .writeStream.foreachBatch(_batch)
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(300)
    return spark.read.parquet(out_dir)


# ------------------------------------------------------- keep-best dedup

# Keep-BEST representative per near-dup cluster (vs the keep-first policy of
# corpus_select_neardup / the streamed ingest dedup): the survivor is the
# highest-quality member, quality quantized to integer millionths so the
# cluster argmax is engine-exact. Real curation keeps the best copy, not the
# first-crawled one.
_DUCK_KEEPBEST = f"""
WITH RECURSIVE
pairs AS ({{pairs}}),
edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
          UNION ALL
          SELECT b_id AS src, a_id AS dst FROM pairs),
cc(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, c.lbl FROM cc c JOIN edges e ON e.src = c.node
),
comp AS (SELECT node AS doc_id, min(lbl) AS canonical_id FROM cc GROUP BY node),
qs AS (SELECT doc_id, CAST(floor(quality * 1000000 + 0.5) AS BIGINT)
         AS score_micro
       FROM ({{quality}})),
j AS (SELECT c.doc_id, c.canonical_id, qs.score_micro
      FROM comp c JOIN qs USING (doc_id)),
r AS (SELECT *,
             row_number() OVER (PARTITION BY canonical_id
                                ORDER BY score_micro DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY canonical_id) AS cluster_size
      FROM j)
SELECT canonical_id, doc_id AS kept_doc_id, score_micro AS best_score_micro,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(cluster_size - 1 AS BIGINT) AS n_dropped
FROM r WHERE rn = 1
"""


def _duck_keepbest_sql() -> str:
    from pgcapture_spark.querydefs.textops import _DUCK_QUALITY

    return _DUCK_KEEPBEST.format(pairs=_duck_minhash_sql(), quality=_DUCK_QUALITY)


@q(
    "corpus_dedup_keepbest",
    None,  # set below once textops is importable (module import cycle)
    "North-star curation policy: keep-BEST-quality per near-dup cluster —"
    " MinHash+LSH pairs → connected components → per-cluster argmax of the"
    " composite quality score (integer millionths, doc_id tie-break)."
    " Cluster argmax is ONE canonical_id-keyed window over the component"
    " map; singleton clusters pass through with n_dropped = 0.",
)
def corpus_dedup_keepbest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.dedup import connected_components, minhash_lsh_pairs
    from pgcapture_spark.operators.textstats import quality_score

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.1).select("a_id", "b_id")
    comp = connected_components(docs.select("doc_id"), pairs)
    scored = quality_score(docs).select(
        "doc_id",
        F.expr("CAST(floor(quality * 1000000 + 0.5) AS BIGINT)").alias("score_micro"),
    )
    j = comp.join(scored, "doc_id")
    # cluster argmax as ONE aggregation (max_by over a (score, -doc_id)
    # ordering struct) — map-side partial combine, no per-cluster sort; a
    # window-rank formulation would shuffle AND sort every row
    r = j.groupBy("canonical_id").agg(
        F.expr(
            "max_by(struct(doc_id, score_micro), struct(score_micro, -doc_id))"
        ).alias("best"),
        F.count("*").cast("long").alias("cluster_size"),
    )
    return r.select(
        "canonical_id",
        F.col("best.doc_id").alias("kept_doc_id"),
        F.col("best.score_micro").alias("best_score_micro"),
        "cluster_size",
        (F.col("cluster_size") - 1).cast("long").alias("n_dropped"),
    )


def _set_keepbest_oracle() -> None:
    from pgcapture_spark.queries import REGISTRY

    REGISTRY["corpus_dedup_keepbest"].oracle = _duck_keepbest_sql()


_set_keepbest_oracle()


# ------------------------------------------------------- corpus drift monitor

_DUCK_PSI = """
WITH feat AS (
  SELECT doc_id % 2 = 1 AS is_cur, 'len_bucket' AS feature,
         coalesce(CAST(least(CAST(floor(n_chars / 500) AS BIGINT), 7)
                       AS VARCHAR), '~') AS bucket
  FROM documents WHERE doc_id IS NOT NULL
  UNION ALL
  SELECT doc_id % 2 = 1, 'lang', coalesce(lang, '~')
  FROM documents WHERE doc_id IS NOT NULL
),
counts AS (
  SELECT feature, bucket,
         CAST(sum(CASE WHEN is_cur THEN 1 ELSE 0 END) AS BIGINT) AS cur_cnt,
         CAST(sum(CASE WHEN is_cur THEN 0 ELSE 1 END) AS BIGINT) AS ref_cnt
  FROM feat GROUP BY 1, 2
),
pf AS (
  SELECT feature, CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(cur_cnt) AS BIGINT) AS n_cur,
         CAST(sum(ref_cnt) AS BIGINT) AS n_ref
  FROM counts GROUP BY 1
),
terms AS (
  SELECT c.feature,
         CAST(floor((((c.cur_cnt + 1.0) / (pf.n_cur + pf.n_buckets))
                     - ((c.ref_cnt + 1.0) / (pf.n_ref + pf.n_buckets)))
                    * ln(((c.cur_cnt + 1.0) / (pf.n_cur + pf.n_buckets))
                         / ((c.ref_cnt + 1.0) / (pf.n_ref + pf.n_buckets)))
                    * 1000000000 + 0.5) AS BIGINT) AS t,
         pf.n_buckets, pf.n_ref, pf.n_cur
  FROM counts c JOIN pf USING (feature)
)
SELECT feature, CAST(sum(t) AS BIGINT) AS psi_nano,
       max(n_buckets) AS n_buckets, max(n_ref) AS n_ref, max(n_cur) AS n_cur
FROM terms GROUP BY feature
"""


@q(
    "corpus_drift_psi",
    _DUCK_PSI,
    "North-star: dataset drift monitor — Population Stability Index between a"
    " reference and a current corpus snapshot (deterministic doc_id halves)"
    " over the length-bucket and language distributions, Laplace-smoothed so"
    " empty buckets stay finite. One corpus scan fans out to (feature,"
    " bucket) rows; everything after the first aggregation is bucket-sized."
    " Per-term nano-quantization keeps the sum an exact integer cross-engine."
    " PSI >= 0.2 is the classic retrain/alert threshold.",
)
def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").where(F.col("doc_id").isNotNull())
    feat = doc_feature_rows(docs).withColumn(
        "is_cur", F.col("doc_id") % 2 == 1
    ).select("is_cur", "feature", "bucket")
    counts = feat.groupBy("feature", "bucket").agg(
        F.sum(F.when(F.col("is_cur"), 1).otherwise(0)).cast("long").alias("cur_cnt"),
        F.sum(F.when(F.col("is_cur"), 0).otherwise(1)).cast("long").alias("ref_cnt"),
    )
    return psi_from_counts(counts)


def doc_feature_rows(docs: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, *extra_cols, feature, bucket) rows of the drift monitor's two tracked
    distributions (length buckets capped at 7, language) — shared by the
    batch PSI, its streamed accumulator, and the windowed per-source monitor
    (which passes the extra grouping columns through)."""
    return docs.select(
        "doc_id",
        *extra_cols,
        F.explode(
            F.array(
                F.struct(
                    F.lit("len_bucket").alias("feature"),
                    F.coalesce(
                        F.expr(
                            "CAST(least(CAST(floor(n_chars / 500) AS BIGINT), 7)"
                            " AS STRING)"
                        ),
                        F.lit("~"),
                    ).alias("bucket"),
                ),
                F.struct(
                    F.lit("lang").alias("feature"),
                    F.coalesce(F.col("lang"), F.lit("~")).alias("bucket"),
                ),
            )
        ).alias("fb"),
    ).select("doc_id", *extra_cols, "fb.feature", "fb.bucket")


def psi_from_counts(
    counts: DataFrame, group_keys: tuple[str, ...] = ("feature",)
) -> DataFrame:
    """PSI per group from (*group_keys, bucket, cur_cnt, ref_cnt) rows —
    Laplace-smoothed, per-term nano-quantized (exact integer sum
    cross-engine). Per-group totals are WINDOWS over the bucket counts
    (not a second aggregation + join): one lineage, the input scans once;
    the window exchange operates on bucket-sized rows only. ``group_keys``
    defaults to the corpus-wide per-feature monitor; the windowed per-source
    variant passes (source, win, feature)."""
    from pyspark.sql import Window as W

    wf = W.partitionBy(*group_keys)
    counts = (
        counts.withColumn("n_buckets", F.count("*").over(wf))
        .withColumn("n_cur", F.sum("cur_cnt").over(wf))
        .withColumn("n_ref", F.sum("ref_cnt").over(wf))
    )
    # identical double-expression structure as the oracle, term-quantized.
    # Spark parses a bare `1.0` as DECIMAL and would pull the whole term into
    # decimal arithmetic (≈1e-6 relative drift vs the oracle's IEEE doubles);
    # the D suffix pins every literal to DOUBLE.
    term = F.expr(
        "CAST(floor((((cur_cnt + 1.0D) / (n_cur + n_buckets))"
        " - ((ref_cnt + 1.0D) / (n_ref + n_buckets)))"
        " * ln(((cur_cnt + 1.0D) / (n_cur + n_buckets))"
        " / ((ref_cnt + 1.0D) / (n_ref + n_buckets)))"
        " * 1000000000 + 0.5D) AS BIGINT)"
    )
    return (
        counts.select(*group_keys, term.alias("t"), "n_buckets", "n_ref", "n_cur")
        .groupBy(*group_keys)
        .agg(
            F.sum("t").cast("long").alias("psi_nano"),
            F.max("n_buckets").alias("n_buckets"),
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
        )
    )
