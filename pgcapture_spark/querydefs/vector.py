"""Similarity-search queries over ``embeddings`` (north-star additions):
brute-force cosine top-k (exact baseline), sign-LSH bucketed ANN (scale path),
per-label centroids."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcapture_spark.catalog import register_views
from pgcapture_spark.operators.similarity import (
    cosine_topk,
    embed_near_dup_pairs,
    ivf_topk,
    label_centroids,
    signlsh_topk,
)
from pgcapture_spark.queries import q

_DUCK_NORMED = """
SELECT vec_id, e, sqrt(list_sum(list_transform(e, v -> v * v))) AS norm
FROM (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
      FROM embeddings)
"""

_DUCK_TOPK = f"""
WITH normed AS ({_DUCK_NORMED}),
queries AS (SELECT vec_id AS query_id, e AS qe, norm AS qn FROM normed
            WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, 65), i -> q.qe[i] * n.e[i])) / (q.qn * n.norm)
           AS raw
  FROM queries q JOIN normed n ON n.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, raw,
         row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, floor(raw * 1000000 + 0.5) / 1000000 AS score
FROM ranked WHERE rank <= 5
"""


@q(
    "sim_cosine_topk",
    _DUCK_TOPK,
    "North-star: exact brute-force cosine top-5 for query vectors"
    " (vec_id % 50 = 0) — broadcast queries × corpus scan, sequential-fold dot"
    " product, deterministic tiebreak.",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("embeddings",))
    return cosine_topk(spark.table("embeddings"), "vec_id % 50 = 0", k=5)


def _duck_bucket(nbits: int = 8) -> str:
    return " + ".join(
        f"(CASE WHEN e[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)" for i in range(nbits)
    )


_DUCK_ANN = f"""
WITH normed AS ({_DUCK_NORMED}),
bucketed AS (SELECT vec_id, e, norm, {_duck_bucket()} AS bucket FROM normed),
queries AS (SELECT vec_id AS query_id, e AS qe, norm AS qn, bucket AS q_bucket
            FROM bucketed WHERE vec_id % 25 = 0),
cand AS (
  SELECT q.query_id, n.vec_id AS neighbor_id, n.bucket,
         list_sum(list_transform(range(1, 65), i -> q.qe[i] * n.e[i])) / (q.qn * n.norm)
           AS raw
  FROM queries q JOIN bucketed n
    ON n.bucket = q.q_bucket AND n.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, bucket, raw,
         row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, bucket, rank, floor(raw * 1000000 + 0.5) / 1000000 AS score
FROM ranked WHERE rank <= 3
"""


@q(
    "sim_signlsh_ann",
    _DUCK_ANN,
    "North-star: LSH-bucketed approximate NN — sign-bit bucket (2^8 cells)"
    " restricts the candidate join; IVF swaps bucket for argmin-centroid.",
)
def sim_signlsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("embeddings",))
    return signlsh_topk(spark.table("embeddings"), "vec_id % 25 = 0", k=3, nbits=8)


def _duck_near_dup(nbits: int = 4, threshold: float = 0.35) -> str:
    bucket = " + ".join(
        f"(CASE WHEN e[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)" for i in range(nbits)
    )
    return f"""
WITH normed AS ({_DUCK_NORMED}),
bucketed AS (SELECT vec_id, e, norm, {bucket} AS bucket FROM normed),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.bucket,
         list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i])) / (a.norm * b.norm)
           AS raw
  FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT a_id, b_id, bucket, floor(raw * 1000000 + 0.5) / 1000000 AS cosine
FROM pairs WHERE raw >= {threshold}
"""


@q(
    "dedup_embed_cosine",
    _duck_near_dup(),
    "North-star: embedding-cosine near-dup — sign-LSH bucketed candidate"
    " pairs verified by exact cosine >= threshold (the embedding member of"
    " the dedup family).",
)
def dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("embeddings",))
    return embed_near_dup_pairs(spark.table("embeddings"), threshold=0.35, nbits=4)


_DUCK_IVF = f"""
WITH normed AS ({_DUCK_NORMED}),
ex AS (
  SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, range(1, 65) t(i)
),
centd AS (
  SELECT label, dim,
         CAST(sum(CAST(floor(val * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1000000000.0 / count(*) AS mean_val
  FROM ex GROUP BY label, dim
),
cent AS (SELECT label AS c_label, list(mean_val ORDER BY dim) AS c_e
         FROM centd GROUP BY label),
dists AS (
  SELECT n.vec_id, c.c_label,
         list_sum(list_transform(range(1, 65),
                  i -> (n.e[i] - c.c_e[i]) * (n.e[i] - c.c_e[i]))) AS dist2
  FROM normed n CROSS JOIN cent c
),
assign AS (SELECT vec_id, c_label AS cell FROM (
             SELECT vec_id, c_label,
                    row_number() OVER (PARTITION BY vec_id ORDER BY dist2, c_label) AS rn
             FROM dists) WHERE rn = 1),
cells AS (SELECT n.vec_id, n.e, n.norm, a.cell FROM normed n JOIN assign a USING (vec_id)),
queries AS (SELECT vec_id AS query_id, e AS qe, norm AS qn, cell AS q_cell
            FROM cells WHERE vec_id % 25 = 1),
cand AS (
  SELECT q.query_id, n.vec_id AS neighbor_id, n.cell,
         list_sum(list_transform(range(1, 65), i -> q.qe[i] * n.e[i])) / (q.qn * n.norm)
           AS raw
  FROM queries q JOIN cells n
    ON n.cell = q.q_cell AND n.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cell, raw,
         row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, cell, rank, floor(raw * 1000000 + 0.5) / 1000000 AS score
FROM ranked WHERE rank <= 3
"""


@q(
    "sim_ivf_ann",
    _DUCK_IVF,
    "North-star: IVF approximate NN — vectors assigned to nearest-centroid"
    " cells (deterministic coarse quantizer from decimal-exact label"
    " centroids), queries probe their own cell (nprobe=1).",
)
def sim_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("embeddings",))
    return ivf_topk(spark.table("embeddings"), "vec_id % 25 = 1", k=3)


_DUCK_SEMDEDUP = f"""
WITH normed AS ({_DUCK_NORMED}),
ex AS (
  SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, range(1, 65) t(i)
),
centd AS (
  SELECT label, dim,
         CAST(sum(CAST(floor(val * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1000000000.0 / count(*) AS mean_val
  FROM ex GROUP BY label, dim
),
cent AS (SELECT label AS c_label, list(mean_val ORDER BY dim) AS c_e
         FROM centd GROUP BY label),
dists AS (
  SELECT n.vec_id, c.c_label,
         list_sum(list_transform(range(1, 65),
                  i -> (n.e[i] - c.c_e[i]) * (n.e[i] - c.c_e[i]))) AS dist2
  FROM normed n CROSS JOIN cent c
),
assign AS (SELECT vec_id, c_label AS cell FROM (
             SELECT vec_id, c_label,
                    row_number() OVER (PARTITION BY vec_id ORDER BY dist2, c_label) AS rn
             FROM dists) WHERE rn = 1),
cells AS (SELECT n.vec_id, n.e, n.norm, a.cell FROM normed n JOIN assign a USING (vec_id)),
pairs AS (
  SELECT b.vec_id, a.vec_id AS witness_cand, a.cell,
         list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i])) / (a.norm * b.norm)
           AS raw
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
)
SELECT vec_id, min(witness_cand) AS witness_id, cell,
       floor(min_by(raw, witness_cand) * 1000000 + 0.5) / 1000000 AS cosine
FROM pairs WHERE raw >= 0.30
GROUP BY vec_id, cell
"""


@q(
    "dedup_semantic",
    _DUCK_SEMDEDUP,
    "North-star: SemDeDup-style semantic deduplication — nearest-centroid"
    " cluster assignment (deterministic coarse quantizer), within-cluster"
    " cosine >= 0.30, drop the higher id, report the lowest-id witness."
    " Candidate pairs bounded by the cluster, never the corpus.",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.similarity import semantic_dedup

    register_views(spark, sf_dir, ("embeddings",))
    return semantic_dedup(spark.table("embeddings"), threshold=0.30)


_DUCK_CENTROIDS = """
WITH ex AS (
  SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, range(1, 65) t(i)
)
SELECT label, dim,
       CAST(sum(CAST(floor(val * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)
         / 1000000000.0 / count(*) AS mean_val,
       count(*) AS n_vecs
FROM ex GROUP BY label, dim
"""


@q(
    "sim_label_centroids",
    _DUCK_CENTROIDS,
    "North-star: per-label centroid vectors — decimal-exact elementwise means"
    " (order-independent, cluster-size invariant).",
)
def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("embeddings",))
    return label_centroids(spark.table("embeddings"))


# ---------------------------------------------------- time-series similarity

# Top-k similar users by exact integer euclidean distance over the first 32
# values (cents) of each user's event-time-ordered series — the distributed
# whole-series-matching shape (cf. retrieved papers on streaming time-series
# similarity / distributed top-k similarity search, PAPERS.md). Scale: one
# groupBy(user) to build series, the tiny query series broadcast, per-row
# fold for the distance, one global top-k — no pairwise blowup beyond
# |users| rows, and the series build is the same single shuffle at 100 TB.
_TS_SIM_DUCK = """
WITH series AS (
  SELECT user_id,
         (list(CAST(floor(value * 100 + 0.5) AS BIGINT) ORDER BY ts, event_id))[1:32]
           AS vals
  FROM events GROUP BY user_id
  HAVING count(*) >= 32
),
q AS (SELECT user_id AS q_user, vals AS q_vals FROM series
      WHERE user_id = (SELECT min(user_id) FROM series)),
dists AS (
  SELECT s.user_id, q.q_user,
         CAST(list_sum(list_transform(range(1, 33),
                  i -> (s.vals[i] - q.q_vals[i]) * (s.vals[i] - q.q_vals[i])))
           AS BIGINT) AS dist2
  FROM series s CROSS JOIN q
  WHERE s.user_id <> q.q_user
)
SELECT user_id, q_user, dist2,
       row_number() OVER (ORDER BY dist2, user_id) AS rank
FROM dists
QUALIFY rank <= 5
"""


@q(
    "ts_similarity_topk",
    _TS_SIM_DUCK,
    "North-star: whole-series time-series similarity search — top-5 users"
    " nearest to the query user's 32-step value series under exact integer"
    " (cents) euclidean distance.",
)
def ts_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    register_views(spark, sf_dir, ("events",))
    series = (
        spark.table("events")
        .groupBy("user_id")
        .agg(
            F.expr(
                "slice(transform(array_sort(collect_list(struct(ts, event_id,"
                " CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents))),"
                " s -> s.cents), 1, 32)"
            ).alias("vals"),
            F.count("*").alias("n"),
        )
        .where(F.col("n") >= 32)
        .select("user_id", "vals")
    )
    qrow = (
        series.withColumn(
            "rn", F.row_number().over(W.orderBy(F.col("user_id")))
        )
        .where(F.col("rn") == 1)
        .select(F.col("user_id").alias("q_user"), F.col("vals").alias("q_vals"))
    )
    dists = (
        series.crossJoin(F.broadcast(qrow))
        .where(F.col("user_id") != F.col("q_user"))
        .select(
            "user_id",
            "q_user",
            F.expr(
                "aggregate(zip_with(vals, q_vals, (x, y) -> (x - y) * (x - y)),"
                " 0L, (acc, v) -> acc + v)"
            ).alias("dist2"),
        )
    )
    return (
        dists.withColumn(
            "rank", F.row_number().over(W.orderBy(F.col("dist2"), F.col("user_id")))
        )
        .where(F.col("rank") <= 5)
    )


# --------------------------------------------------- product quantization ANN

# PQ/ADC: 64 dims → M=8 subspaces × 8 dims; the per-subspace codebook is the
# label-centroid slice (deterministic — a trained k-means would slot in
# identically). Corpus vectors compress to 8 small codes; each query builds an
# 8×10 distance table and scores candidates by table lookups only (ADC) — at
# 100 TB the corpus scan reads CODES (8 bytes/vector), not raw vectors, and
# the tables ride along in one broadcast. Per-subspace distances are quantized
# to integers before summing, so ranking is exact cross-engine.
_DUCK_PQ = f"""
WITH normed AS ({_DUCK_NORMED}),
ex AS (
  SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, range(1, 65) t(i)
),
centd AS (
  SELECT label, dim,
         CAST(sum(CAST(floor(val * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1000000000.0 / count(*) AS mean_val
  FROM ex GROUP BY label, dim
),
cent AS (SELECT label AS c_label, list(mean_val ORDER BY dim) AS c_e
         FROM centd GROUP BY label),
sub_d AS (
  SELECT n.vec_id, m.m, c.c_label,
         list_sum(list_transform(range(1, 9),
                  i -> (n.e[m.m * 8 + i] - c.c_e[m.m * 8 + i])
                     * (n.e[m.m * 8 + i] - c.c_e[m.m * 8 + i]))) AS d2
  FROM normed n CROSS JOIN range(0, 8) m(m) CROSS JOIN cent c
),
codes AS (
  SELECT vec_id, m, c_label AS code FROM (
    SELECT vec_id, m, c_label,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, c_label) AS rn
    FROM sub_d
  ) WHERE rn = 1
),
qd AS (
  SELECT vec_id AS query_id, m, c_label,
         CAST(floor(d2 * 1000000 + 0.5) AS BIGINT) AS d2q
  FROM sub_d WHERE vec_id % 25 = 1
),
adc AS (
  SELECT qd.query_id, v.vec_id AS neighbor_id, CAST(sum(qd.d2q) AS BIGINT) AS approx_d2q
  FROM codes v JOIN qd ON qd.m = v.m AND qd.c_label = v.code
  WHERE v.vec_id <> qd.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, approx_d2q,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY approx_d2q, neighbor_id) AS rank
FROM adc
QUALIFY rank <= 3
"""

@q(
    "sim_pq_adc_ann",
    _DUCK_PQ,
    "North-star: product-quantization ANN with asymmetric distance computation"
    " — corpus compressed to 8 subspace codes, queries score via broadcast"
    " 8×10 integer distance tables; exact integer ranking cross-engine.",
)
def sim_pq_adc_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.similarity import ivfpq_topk, pq_adc_topk

    register_views(spark, sf_dir, ("embeddings",))
    return pq_adc_topk(spark.table("embeddings"), "vec_id % 25 = 1", k=3, m=8)


# ------------------------------------------------------- int8 quantization

# symmetric per-vector int8 quantization — the memory-compression step before
# ANN at scale (4x smaller corpus, integer distance kernels). scale =
# 127 / max|x|; both engines run the identical double-precision expression, so
# values (and therefore the driver's hash) match bit-for-bit. Per-row, fused
# into the scan — no shuffle.
_QUANT_DUCK = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
m AS (SELECT vec_id, v,
             greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) AS mx
      FROM e),
qq AS (SELECT vec_id, 127.0 / mx AS scale,
              list_transform(v, x -> CAST(round(x * (127.0 / mx)) AS INT)) AS qv
       FROM m)
SELECT vec_id, scale,
       array_to_string(list_transform(qv, x -> CAST(x AS VARCHAR)), ',') AS qv,
       CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS l1_q
FROM qq
"""

_QUANT_SPARK = """
WITH e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
m AS (SELECT vec_id, v,
             greatest(aggregate(v, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(x))),
                      CAST(1e-30 AS DOUBLE)) AS mx
      FROM e),
qq AS (SELECT vec_id, 127.0 / mx AS scale,
              transform(v, x -> CAST(round(x * (127.0 / mx)) AS INT)) AS qv
       FROM m)
SELECT vec_id, scale,
       concat_ws(',', transform(qv, x -> CAST(x AS STRING))) AS qv,
       aggregate(qv, 0L, (a, x) -> a + abs(x)) AS l1_q
FROM qq
"""


@q(
    "sim_quantize_int8",
    _QUANT_DUCK,
    "North-star: symmetric int8 vector quantization (scale = 127/max|x|) —"
    " the 4x corpus-compression step for integer-kernel ANN; per-row,"
    " shuffle-free, bit-identical across engines.",
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("embeddings",))
    return spark.sql(_QUANT_SPARK)


# ------------------------------------------------------- ANN quality (recall)

_DUCK_RECALL = f"""
WITH normed AS ({_DUCK_NORMED}),
queries AS (SELECT vec_id AS query_id, e AS qe, norm AS qn, {_duck_bucket()} AS q_bucket
            FROM normed WHERE vec_id % 25 = 0),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, n.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             list_sum(list_transform(range(1, 65), i -> q.qe[i] * n.e[i]))
               / (q.qn * n.norm) DESC, n.vec_id) AS rank
    FROM queries q JOIN normed n ON n.vec_id <> q.query_id
  ) WHERE rank <= 3
),
bucketed AS (SELECT vec_id, e, norm, {_duck_bucket()} AS bucket FROM normed),
ann AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, n.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             list_sum(list_transform(range(1, 65), i -> q.qe[i] * n.e[i]))
               / (q.qn * n.norm) DESC, n.vec_id) AS rank
    FROM queries q JOIN bucketed n
      ON n.bucket = q.q_bucket AND n.vec_id <> q.query_id
  ) WHERE rank <= 3
)
SELECT e.query_id, CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
       count(a.neighbor_id) / 3.0 AS recall_at_3
FROM exact e LEFT JOIN ann a
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


@q(
    "sim_ann_recall",
    _DUCK_RECALL,
    "North-star: ANN quality evaluation — recall@3 of the sign-LSH bucketed"
    " search against the exact brute-force top-3 per query; the measurement"
    " loop every production ANN deployment runs before trusting its index.",
)
def sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    exact = cosine_topk(emb, "vec_id % 25 = 0", k=3).select("query_id", "neighbor_id")
    ann = signlsh_topk(emb, "vec_id % 25 = 0", k=3, nbits=8).select(
        "query_id", F.col("neighbor_id").alias("a_neighbor")
    )
    j = exact.join(
        ann,
        (exact.query_id == ann.query_id) & (exact.neighbor_id == ann.a_neighbor),
        "left",
    ).select(exact.query_id, "a_neighbor")
    return j.groupBy("query_id").agg(
        F.count("a_neighbor").alias("n_hits"),
        (F.count("a_neighbor") / 3.0).alias("recall_at_3"),
    )


# ------------------------------------------------- ANN parameter tuning loop

def _duck_pq_ann_cte(m: int, tag: str) -> str:
    """DuckDB CTEs for PQ/ADC top-3 at M subspaces (queries vec_id%25=0)."""
    sd = 64 // m
    return f"""
sub_d{tag} AS (
  SELECT n.vec_id, mm.m, c.c_label,
         list_sum(list_transform(range(1, {sd + 1}),
                  i -> (n.e[mm.m * {sd} + i] - c.c_e[mm.m * {sd} + i])
                     * (n.e[mm.m * {sd} + i] - c.c_e[mm.m * {sd} + i]))) AS d2
  FROM normed n CROSS JOIN range(0, {m}) mm(m) CROSS JOIN cent c
),
codes{tag} AS (
  SELECT vec_id, m, c_label AS code FROM (
    SELECT vec_id, m, c_label,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, c_label) AS rn
    FROM sub_d{tag}
  ) WHERE rn = 1
),
qd{tag} AS (
  SELECT vec_id AS query_id, m, c_label,
         CAST(floor(d2 * 1000000 + 0.5) AS BIGINT) AS d2q
  FROM sub_d{tag} WHERE vec_id % 25 = 0
),
adc{tag} AS (
  SELECT qd.query_id, v.vec_id AS neighbor_id, CAST(sum(qd.d2q) AS BIGINT) AS approx
  FROM codes{tag} v JOIN qd{tag} qd ON qd.m = v.m AND qd.c_label = v.code
  WHERE v.vec_id <> qd.query_id
  GROUP BY 1, 2
),
ann{tag} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY approx, neighbor_id) AS rank
    FROM adc{tag}
  ) WHERE rank <= 3
)"""


def _duck_ivfpq_ann_cte(m: int, tag: str) -> str:
    """IVF-PQ top-3: PQ/ADC scoring restricted to the query's coarse cell
    (reuses the tuning query's shared ``assign`` CTE; queries vec_id%25=0)."""
    sd = 64 // m
    return f"""
sub_d{tag} AS (
  SELECT n.vec_id, mm.m, c.c_label,
         list_sum(list_transform(range(1, {sd + 1}),
                  i -> (n.e[mm.m * {sd} + i] - c.c_e[mm.m * {sd} + i])
                     * (n.e[mm.m * {sd} + i] - c.c_e[mm.m * {sd} + i]))) AS d2
  FROM normed n CROSS JOIN range(0, {m}) mm(m) CROSS JOIN cent c
),
codes{tag} AS (
  SELECT vec_id, m, c_label AS code FROM (
    SELECT vec_id, m, c_label,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, c_label) AS rn
    FROM sub_d{tag}
  ) WHERE rn = 1
),
qd{tag} AS (
  SELECT vec_id AS query_id, m, c_label,
         CAST(floor(d2 * 1000000 + 0.5) AS BIGINT) AS d2q
  FROM sub_d{tag} WHERE vec_id % 25 = 0
),
adc{tag} AS (
  SELECT qd.query_id, v.vec_id AS neighbor_id, CAST(sum(qd.d2q) AS BIGINT) AS approx
  FROM codes{tag} v
  JOIN assign av ON av.vec_id = v.vec_id
  JOIN assign aq ON aq.cell = av.cell
  JOIN qd{tag} qd ON qd.m = v.m AND qd.c_label = v.code AND qd.query_id = aq.vec_id
  WHERE v.vec_id <> qd.query_id
  GROUP BY 1, 2
),
ann{tag} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY approx, neighbor_id) AS rank
    FROM adc{tag}
  ) WHERE rank <= 3
)"""


def _duck_lsh_ann_cte(nbits: int, tag: str) -> str:
    return f"""
ann{tag} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, n.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             list_sum(list_transform(range(1, 65), i -> q.qe[i] * n.e[i]))
               / (q.qn * n.norm) DESC, n.vec_id) AS rank
    FROM (SELECT *, {_duck_bucket(nbits)} AS qb FROM normed WHERE vec_id % 25 = 0)
         q(query_id, qe, qn, qb)
    JOIN (SELECT *, {_duck_bucket(nbits)} AS bucket FROM normed) n
      ON n.bucket = q.qb AND n.vec_id <> q.query_id
  ) WHERE rank <= 3
)"""


def _duck_ivf_ann_cte(nprobe: int, tag: str) -> str:
    return f"""
ann{tag} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, n.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             list_sum(list_transform(range(1, 65), i -> q.qe[i] * n.e[i]))
               / (q.qn * n.norm) DESC, n.vec_id) AS rank
    FROM probes p
    JOIN tune_queries q ON q.query_id = p.query_id
    JOIN ivf_cells n ON n.cell = p.p_cell AND n.vec_id <> q.query_id
    WHERE p.rn <= {nprobe}
  ) WHERE rank <= 3
)"""


def _duck_recall_row(method: str, param: str, tag: str) -> str:
    return f"""
SELECT '{method}' AS method, '{param}' AS param,
       CAST(count(DISTINCT e.query_id) AS BIGINT) AS n_queries,
       CAST(count(a.neighbor_id) AS BIGINT) AS total_hits,
       count(a.neighbor_id) / (3.0 * count(DISTINCT e.query_id)) AS recall_at_3
FROM exact e LEFT JOIN ann{tag} a
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id"""


_DUCK_TUNING = f"""
WITH normed AS ({_DUCK_NORMED}),
tune_queries AS (SELECT vec_id AS query_id, e AS qe, norm AS qn FROM normed
                 WHERE vec_id % 25 = 0),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, n.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             list_sum(list_transform(range(1, 65), i -> q.qe[i] * n.e[i]))
               / (q.qn * n.norm) DESC, n.vec_id) AS rank
    FROM tune_queries q JOIN normed n ON n.vec_id <> q.query_id
  ) WHERE rank <= 3
),
ex AS (
  SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, range(1, 65) t(i)
),
centd AS (
  SELECT label, dim,
         CAST(sum(CAST(floor(val * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1000000000.0 / count(*) AS mean_val
  FROM ex GROUP BY label, dim
),
cent AS (SELECT label AS c_label, list(mean_val ORDER BY dim) AS c_e
         FROM centd GROUP BY label),
ivf_dists AS (
  SELECT n.vec_id, c.c_label,
         list_sum(list_transform(range(1, 65),
                  i -> (n.e[i] - c.c_e[i]) * (n.e[i] - c.c_e[i]))) AS dist2
  FROM normed n CROSS JOIN cent c
),
assign AS (SELECT vec_id, c_label AS cell FROM (
             SELECT vec_id, c_label,
                    row_number() OVER (PARTITION BY vec_id ORDER BY dist2, c_label) AS rn
             FROM ivf_dists) WHERE rn = 1),
ivf_cells AS (SELECT n.vec_id, n.e, n.norm, a.cell
              FROM normed n JOIN assign a USING (vec_id)),
probes AS (SELECT vec_id AS query_id, c_label AS p_cell, rn FROM (
             SELECT vec_id, c_label,
                    row_number() OVER (PARTITION BY vec_id ORDER BY dist2, c_label) AS rn
             FROM ivf_dists WHERE vec_id % 25 = 0) WHERE rn <= 2),
{_duck_lsh_ann_cte(4, "_lsh4")[1:]},
{_duck_lsh_ann_cte(6, "_lsh6")[1:]},
{_duck_lsh_ann_cte(8, "_lsh8")[1:]},
{_duck_ivf_ann_cte(1, "_ivf1")[1:]},
{_duck_ivf_ann_cte(2, "_ivf2")[1:]},
{_duck_pq_ann_cte(4, "_pq4")[1:]},
{_duck_pq_ann_cte(8, "_pq8")[1:]},
{_duck_ivfpq_ann_cte(8, "_ivfpq8")[1:]}
{_duck_recall_row("signlsh", "nbits=4", "_lsh4")}
UNION ALL {_duck_recall_row("signlsh", "nbits=6", "_lsh6")}
UNION ALL {_duck_recall_row("signlsh", "nbits=8", "_lsh8")}
UNION ALL {_duck_recall_row("ivf", "nprobe=1", "_ivf1")}
UNION ALL {_duck_recall_row("ivf", "nprobe=2", "_ivf2")}
UNION ALL {_duck_recall_row("pq", "m=4", "_pq4")}
UNION ALL {_duck_recall_row("pq", "m=8", "_pq8")}
UNION ALL {_duck_recall_row("ivfpq", "m=8,nprobe=1", "_ivfpq8")}
"""


@q(
    "sim_ann_tuning",
    _DUCK_TUNING,
    "North-star: the ANN tuning loop — recall@3 vs the exact top-3 for every"
    " index family at multiple parameter points (sign-LSH nbits 4/6/8, IVF"
    " nprobe 1/2, PQ subspaces 4/8), ONE table a pipeline owner reads before"
    " picking the production index. Parameters sweep the recall/cost dial:"
    " fewer LSH bits / more probes / more subspaces → higher recall, more"
    " candidates scored.",
)
def sim_ann_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.similarity import ivfpq_topk, pq_adc_topk

    register_views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    pred = "vec_id % 25 = 0"
    exact = (
        cosine_topk(emb, pred, k=3).select("query_id", "neighbor_id").persist()
    )
    configs = [
        ("signlsh", "nbits=4", signlsh_topk(emb, pred, k=3, nbits=4)),
        ("signlsh", "nbits=6", signlsh_topk(emb, pred, k=3, nbits=6)),
        ("signlsh", "nbits=8", signlsh_topk(emb, pred, k=3, nbits=8)),
        ("ivf", "nprobe=1", ivf_topk(emb, pred, k=3, nprobe=1)),
        ("ivf", "nprobe=2", ivf_topk(emb, pred, k=3, nprobe=2)),
        ("pq", "m=4", pq_adc_topk(emb, pred, k=3, m=4)),
        ("pq", "m=8", pq_adc_topk(emb, pred, k=3, m=8)),
        ("ivfpq", "m=8,nprobe=1", ivfpq_topk(emb, pred, k=3, m=8)),
    ]
    rows = []
    for method, param, ann in configs:
        e = exact.alias("e")
        a = ann.select(
            F.col("query_id").alias("a_query"), F.col("neighbor_id").alias("a_neighbor")
        ).alias("a")
        j = e.join(
            a,
            (F.col("e.query_id") == F.col("a.a_query"))
            & (F.col("e.neighbor_id") == F.col("a.a_neighbor")),
            "left",
        )
        rows.append(
            j.agg(
                F.count_distinct(F.col("e.query_id")).alias("n_queries"),
                F.count(F.col("a.a_neighbor")).alias("total_hits"),
            ).select(
                F.lit(method).alias("method"),
                F.lit(param).alias("param"),
                "n_queries",
                "total_hits",
                (F.col("total_hits") / (3.0 * F.col("n_queries"))).alias("recall_at_3"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


_DUCK_KMEANS = """
WITH e AS (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS ed
           FROM embeddings),
init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c_label,
                ed AS c_e
         FROM e ORDER BY vec_id LIMIT 8),
d1 AS (SELECT e.vec_id, e.ed, c.c_label,
              list_sum(list_transform(range(1, 65),
                       i -> (e.ed[i] - c.c_e[i]) * (e.ed[i] - c.c_e[i]))) AS d2
       FROM e CROSS JOIN init c),
a1 AS (SELECT vec_id, ed, c_label AS cluster FROM (
         SELECT vec_id, ed, c_label,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rn
         FROM d1) WHERE rn = 1),
ex1 AS (SELECT cluster, i - 1 AS dim, ed[i] AS val FROM a1, range(1, 65) t(i)),
cd1 AS (SELECT cluster, dim,
               CAST(sum(CAST(floor(val * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1000000000.0 / count(*) AS mean_val
        FROM ex1 GROUP BY cluster, dim),
c1 AS (SELECT cluster AS c_label, list(mean_val ORDER BY dim) AS c_e
       FROM cd1 GROUP BY cluster),
d2r AS (SELECT e.vec_id, c.c_label,
               list_sum(list_transform(range(1, 65),
                        i -> (e.ed[i] - c.c_e[i]) * (e.ed[i] - c.c_e[i]))) AS d2
        FROM e CROSS JOIN c1 c)
SELECT vec_id, cluster, floor(d2 * 1000000 + 0.5) / 1000000 AS dist2q FROM (
  SELECT vec_id, c_label AS cluster, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rn
  FROM d2r) WHERE rn = 1
"""


# OOD scoring: per-candidate sum of top-3 cosines to a REFERENCE set — the
# in-distribution anchor (label 0). The reference rides as ONE broadcast row,
# so scoring is a per-row expression fused into the candidate scan: zero
# shuffle, cost linear in candidates x |reference|.
_DUCK_OOD = f"""
WITH normed AS ({_DUCK_NORMED}),
lbl AS (SELECT vec_id, label FROM embeddings),
refs AS (SELECT n.vec_id, n.e, n.norm FROM normed n JOIN lbl USING (vec_id)
         WHERE lbl.label = 0),
cands AS (SELECT n.vec_id, n.e, n.norm FROM normed n JOIN lbl USING (vec_id)
          WHERE lbl.label <> 0),
sims AS (
  SELECT c.vec_id, r.vec_id AS ref_id,
         CAST(floor(list_sum(list_transform(range(1, 65), i -> c.e[i] * r.e[i]))
                    / (c.norm * r.norm) * 1000000 + 0.5) AS BIGINT) AS cos_q
  FROM cands c CROSS JOIN refs r
),
ranked AS (
  SELECT vec_id, cos_q,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos_q DESC, ref_id) AS rn
  FROM sims
)
SELECT vec_id, CAST(sum(cos_q) AS BIGINT) AS sum_top3_cos_q
FROM ranked WHERE rn <= 3 GROUP BY vec_id
"""


@q(
    "sim_ood_knn_score",
    _DUCK_OOD,
    "North-star: out-of-distribution scoring — each candidate's summed top-3"
    " cosine to the in-distribution REFERENCE set (label 0), the kNN-distance"
    " OOD detector of data-quality pipelines. The reference set is ONE"
    " broadcast row and the top-3 fold is a per-row array expression fused"
    " into the candidate scan: zero shuffle, reference-bounded cost per row.",
)
def sim_ood_knn_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.similarity import OOD_REF_CAP, with_norm

    register_views(spark, sf_dir, ("embeddings",))
    base = with_norm(spark.table("embeddings")).select(
        "vec_id", "label", "emb_d", "norm"
    )
    # The reference set folds Spark-side into ONE row (collect_list under a
    # hard cap) — never a driver .collect(): an in-distribution class of
    # unbounded size would otherwise OOM the driver (ADVICE/verdict r4).
    # limit(cap+1) bounds executor memory BEFORE the fold; the CASE raises
    # loudly when the cap is exceeded (callers must pre-sample a reference
    # budget — a kNN anchor set beyond ~10k rows is a modeling smell anyway).
    # An empty reference set yields zero refs_row rows (size guard), so the
    # cross-broadcast join emits no candidates — same as the oracle's empty
    # CROSS JOIN.
    refs_row = (
        base.where("label = 0")
        .limit(OOD_REF_CAP + 1)
        .select(
            F.struct(
                F.col("vec_id").alias("rid"),
                F.col("emb_d").alias("e"),
                F.col("norm").alias("n"),
            ).alias("ref")
        )
        .agg(F.collect_list("ref").alias("refs_raw"))
        .select(
            F.expr(
                f"CASE WHEN size(refs_raw) > {OOD_REF_CAP} THEN"
                f" raise_error('sim_ood_knn_score: reference set exceeds the"
                f" {OOD_REF_CAP}-row broadcast budget — pass a sampled/bounded"
                f" reference')"
                " ELSE array_sort(refs_raw) END"
            ).alias("refs")
        )
        .where(F.size("refs") > 0)
    )
    # per-row: quantized cosine to every reference, (cos_q DESC, rid ASC)
    # ordering via struct sort on (-cos_q, rid), top-3 summed
    sims = (
        "transform(refs, r -> struct("
        "-CAST(floor(aggregate(zip_with(emb_d, r.e, (x, y) -> x * y),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) / (norm * r.n)"
        " * 1000000 + 0.5) AS BIGINT) AS neg_q, r.rid AS rid))"
    )
    top3sum = (
        f"aggregate(slice(array_sort({sims}), 1, 3),"
        " CAST(0 AS BIGINT), (acc, s) -> acc - s.neg_q)"
    )
    return (
        base.where("label <> 0")
        .join(F.broadcast(refs_row))
        .select("vec_id", F.expr(top3sum).alias("sum_top3_cos_q"))
    )


def _duck_kcenter(k: int = 5) -> str:
    """Unrolled greedy k-center (Gonzalez) in DuckDB: seed = lowest vec_id,
    each step picks the point FARTHEST from its nearest chosen center
    (quantized integer distances, vec_id tie-break)."""
    dist_q = ("CAST(floor(list_sum(list_transform(range(1, 65),"
              " i -> (x.ed[i] - {c}.ed[i]) * (x.ed[i] - {c}.ed[i])))"
              " * 1000000 + 0.5) AS BIGINT)")
    parts = ["WITH e AS (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS ed FROM embeddings),",
             "c1 AS (SELECT vec_id, ed FROM e ORDER BY vec_id LIMIT 1),",
             "d1 AS (SELECT x.vec_id, x.ed, " + dist_q.format(c="c1")
             + " AS dmin FROM e x CROSS JOIN c1 WHERE x.vec_id <> c1.vec_id),"]
    for r in range(2, k + 1):
        parts.append(
            f"c{r} AS (SELECT vec_id, ed, dmin FROM d{r-1} ORDER BY dmin DESC, vec_id LIMIT 1),"
        )
        if r < k:
            parts.append(
                f"d{r} AS (SELECT x.vec_id, x.ed, least(x.dmin, " + dist_q.format(c=f"c{r}")
                + f" ) AS dmin FROM d{r-1} x CROSS JOIN c{r} WHERE x.vec_id <> c{r}.vec_id),"
            )
    parts[-1] = parts[-1].rstrip(",")
    sel = ["SELECT 1 AS rank, vec_id, CAST(0 AS BIGINT) AS dmin_q FROM c1"]
    for r in range(2, k + 1):
        sel.append(f"SELECT {r} AS rank, vec_id, dmin AS dmin_q FROM c{r}")
    return "\n".join(parts) + "\n" + "\nUNION ALL\n".join(sel)


@q(
    "sample_coreset_kcenter",
    _duck_kcenter(5),
    "North-star: greedy k-center coreset selection (Gonzalez) — the"
    " diversity-sampling primitive of data-selection pipelines: k passes,"
    " each a broadcast of the chosen centers folded into a per-row"
    " min-distance expression + ONE distributed argmax (quantized integer"
    " distances, vec_id tie-break, k-bounded collects only). The farthest-"
    "point chain is bit-identical across engines.",
)
def sample_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.similarity import kcenter_select

    register_views(spark, sf_dir, ("embeddings",))
    return spark.createDataFrame(
        kcenter_select(spark.table("embeddings"), k=5),
        "rank int, vec_id bigint, dmin_q bigint",
    )


# MMR re-rank: 3-step greedy unrolled as relational stages; all arithmetic on
# floor-quantized integers so selection is bit-identical across engines.
_DUCK_MMR = f"""
WITH normed AS ({_DUCK_NORMED}),
queries AS (SELECT vec_id AS query_id, e AS qe, norm AS qn FROM normed
            WHERE vec_id % 25 = 3),
scored AS (
  SELECT q.query_id, n.vec_id AS nid, n.e, n.norm,
         CAST(floor(list_sum(list_transform(range(1, 65), i -> q.qe[i] * n.e[i]))
                    / (q.qn * n.norm) * 1000000 + 0.5) AS BIGINT) AS rel_q
  FROM queries q JOIN normed n ON n.vec_id <> q.query_id
),
pool AS (
  SELECT query_id, nid, e, norm, rel_q FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel_q DESC, nid) AS rn
    FROM scored) WHERE rn <= 5
),
psim AS (
  SELECT a.query_id, a.nid AS a_id, b.nid AS b_id,
         CAST(floor(list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i]))
                    / (a.norm * b.norm) * 1000000 + 0.5) AS BIGINT) AS sim_q
  FROM pool a JOIN pool b ON a.query_id = b.query_id AND a.nid <> b.nid
),
s1 AS (
  SELECT query_id, nid AS s1_id, 7 * rel_q AS s1_q FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY 7 * rel_q DESC, nid) AS rn
    FROM pool) WHERE rn = 1
),
c2 AS (
  SELECT p.query_id, p.nid, s1.s1_id,
         7 * p.rel_q - 3 * ps.sim_q AS mmr_q
  FROM pool p
  JOIN s1 ON s1.query_id = p.query_id AND p.nid <> s1.s1_id
  JOIN psim ps ON ps.query_id = p.query_id AND ps.a_id = p.nid
              AND ps.b_id = s1.s1_id
),
s2 AS (
  SELECT query_id, s1_id, nid AS s2_id, mmr_q AS s2_q FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY mmr_q DESC, nid) AS rn
    FROM c2) WHERE rn = 1
),
c3 AS (
  SELECT p.query_id, p.nid,
         7 * p.rel_q - 3 * greatest(p1.sim_q, p2.sim_q) AS mmr_q
  FROM pool p
  JOIN s2 ON s2.query_id = p.query_id
         AND p.nid <> s2.s1_id AND p.nid <> s2.s2_id
  JOIN psim p1 ON p1.query_id = p.query_id AND p1.a_id = p.nid
              AND p1.b_id = s2.s1_id
  JOIN psim p2 ON p2.query_id = p.query_id AND p2.a_id = p.nid
              AND p2.b_id = s2.s2_id
),
s3 AS (
  SELECT query_id, nid AS s3_id, mmr_q AS s3_q FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY mmr_q DESC, nid) AS rn
    FROM c3) WHERE rn = 1
)
SELECT query_id, 1 AS rank, s1_id AS neighbor_id, s1_q AS mmr_q FROM s1
UNION ALL
SELECT query_id, 2 AS rank, s2_id AS neighbor_id, s2_q AS mmr_q FROM s2
UNION ALL
SELECT query_id, 3 AS rank, s3_id AS neighbor_id, s3_q AS mmr_q FROM s3
"""


@q(
    "sim_mmr_rerank",
    _DUCK_MMR,
    "North-star: MMR diversity re-rank (Carbonell-Goldstein) of each query's"
    " cosine top-5 pool — greedy pick-3 maximizing 0.7*relevance -"
    " 0.3*max-sim-to-picked, unrolled as three bounded relational stages in"
    " scaled integer arithmetic (bit-identical selection across engines)."
    " Per-query cost is pool-squared, never corpus-shaped; the corpus-shaped"
    " retrieval stays one broadcast probe.",
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.similarity import mmr_rerank

    register_views(spark, sf_dir, ("embeddings",))
    return mmr_rerank(spark.table("embeddings"), "vec_id % 25 = 3", pool=5, k=3)


# SemDeDup over a TRAINED k-means codebook (the scale path: k grows with the
# corpus instead of being pinned to #labels). Codebook = kmeans_embed's k=8 /
# iters=2 deterministic Lloyd run; then the standard within-cell cosine dedup.
_DUCK_SEMDEDUP_KMEANS = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS ed
           FROM embeddings),
init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c_label,
                ed AS c_e
         FROM e ORDER BY vec_id LIMIT 8),
d1 AS (SELECT e.vec_id, e.ed, c.c_label,
              list_sum(list_transform(range(1, 65),
                       i -> (e.ed[i] - c.c_e[i]) * (e.ed[i] - c.c_e[i]))) AS d2
       FROM e CROSS JOIN init c),
a1 AS (SELECT vec_id, ed, c_label AS cluster FROM (
         SELECT vec_id, ed, c_label,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rn
         FROM d1) WHERE rn = 1),
ex1 AS (SELECT cluster, i - 1 AS dim, ed[i] AS val FROM a1, range(1, 65) t(i)),
cd1 AS (SELECT cluster, dim,
               CAST(sum(CAST(floor(val * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1000000000.0 / count(*) AS mean_val
        FROM ex1 GROUP BY cluster, dim),
c1 AS (SELECT cluster AS c_label, list(mean_val ORDER BY dim) AS c_e
       FROM cd1 GROUP BY cluster),
normed AS ({_DUCK_NORMED}),
d2r AS (SELECT n.vec_id, c.c_label,
               list_sum(list_transform(range(1, 65),
                        i -> (n.e[i] - c.c_e[i]) * (n.e[i] - c.c_e[i]))) AS d2
        FROM normed n CROSS JOIN c1 c),
assign AS (SELECT vec_id, c_label AS cell FROM (
             SELECT vec_id, c_label,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rn
             FROM d2r) WHERE rn = 1),
cells AS (SELECT n.vec_id, n.e, n.norm, a.cell FROM normed n JOIN assign a USING (vec_id)),
pairs AS (
  SELECT b.vec_id, a.vec_id AS witness_cand, a.cell,
         list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i])) / (a.norm * b.norm)
           AS raw
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
)
SELECT vec_id, min(witness_cand) AS witness_id, cell,
       floor(min_by(raw, witness_cand) * 1000000 + 0.5) / 1000000 AS cosine
FROM pairs WHERE raw >= 0.30
GROUP BY vec_id, cell
"""


@q(
    "dedup_semantic_kmeans",
    _DUCK_SEMDEDUP_KMEANS,
    "North-star: SemDeDup with a TRAINED k-means coarse quantizer (the"
    " kmeans_embed codebook, k=8 iters=2, deterministic) instead of label"
    " centroids — the 100 TB shape, where k scales with the corpus so the"
    " within-cell O(cell^2) self-join stays bounded. Codebook broadcast,"
    " per-row argmin fused into the scan, one cell shuffle.",
)
def dedup_semantic_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.similarity import kmeans_codebook, semantic_dedup

    register_views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    return semantic_dedup(
        emb, threshold=0.30, codebook=kmeans_codebook(emb, k=8, iters=2)
    )


@q(
    "kmeans_embed",
    _DUCK_KMEANS,
    "North-star: distributed Lloyd's k-means (k=8, 2 assignment rounds,"
    " deterministic lowest-vec_id init) — per-row broadcast argmin"
    " assignment fused into the scan, decimal-exact centroid update, one"
    " k-bounded collect between rounds; the clustering stage of data-mixing"
    " / SemDeDup curation.",
)
def kmeans_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.similarity import kmeans_assign

    register_views(spark, sf_dir, ("embeddings",))
    return kmeans_assign(spark.table("embeddings"), k=8, iters=2)


# IVF-PQ: cell restriction from the coarse quantizer + PQ/ADC scoring — the
# FAISS IVFPQ shape (non-residual). Queries: vec_id % 25 = 2.
_DUCK_IVFPQ = f"""
WITH normed AS ({_DUCK_NORMED}),
ex AS (
  SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, range(1, 65) t(i)
),
centd AS (
  SELECT label, dim,
         CAST(sum(CAST(floor(val * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1000000000.0 / count(*) AS mean_val
  FROM ex GROUP BY label, dim
),
cent AS (SELECT label AS c_label, list(mean_val ORDER BY dim) AS c_e
         FROM centd GROUP BY label),
dists AS (
  SELECT n.vec_id, c.c_label,
         list_sum(list_transform(range(1, 65),
                  i -> (n.e[i] - c.c_e[i]) * (n.e[i] - c.c_e[i]))) AS dist2
  FROM normed n CROSS JOIN cent c
),
assign AS (SELECT vec_id, c_label AS cell FROM (
             SELECT vec_id, c_label,
                    row_number() OVER (PARTITION BY vec_id ORDER BY dist2, c_label) AS rn
             FROM dists) WHERE rn = 1),
sub_d AS (
  SELECT n.vec_id, m.m, c.c_label,
         list_sum(list_transform(range(1, 9),
                  i -> (n.e[m.m * 8 + i] - c.c_e[m.m * 8 + i])
                     * (n.e[m.m * 8 + i] - c.c_e[m.m * 8 + i]))) AS d2
  FROM normed n CROSS JOIN range(0, 8) m(m) CROSS JOIN cent c
),
codes AS (
  SELECT vec_id, m, c_label AS code FROM (
    SELECT vec_id, m, c_label,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, c_label) AS rn
    FROM sub_d
  ) WHERE rn = 1
),
qd AS (
  SELECT vec_id AS query_id, m, c_label,
         CAST(floor(d2 * 1000000 + 0.5) AS BIGINT) AS d2q
  FROM sub_d WHERE vec_id % 25 = 2
),
adc AS (
  SELECT qd.query_id, v.vec_id AS neighbor_id, av.cell,
         CAST(sum(qd.d2q) AS BIGINT) AS approx_d2q
  FROM codes v
  JOIN assign av ON av.vec_id = v.vec_id
  JOIN assign aq ON aq.vec_id IS NOT NULL AND aq.cell = av.cell
  JOIN qd ON qd.m = v.m AND qd.c_label = v.code AND qd.query_id = aq.vec_id
  WHERE v.vec_id <> qd.query_id
  GROUP BY 1, 2, 3
)
SELECT query_id, neighbor_id, cell, approx_d2q,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY approx_d2q, neighbor_id) AS rank
FROM adc
QUALIFY rank <= 3
"""


@q(
    "sim_ivfpq_ann",
    _DUCK_IVFPQ,
    "North-star: IVF-PQ — coarse-quantizer cell restriction composed with"
    " PQ/ADC integer scoring (FAISS IVFPQ shape, non-residual); corpus scan"
    " reads (cell, codes) only, distance tables broadcast, candidates"
    " bounded by the query's cell.",
)
def sim_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.similarity import ivfpq_topk

    register_views(spark, sf_dir, ("embeddings",))
    return ivfpq_topk(spark.table("embeddings"), "vec_id % 25 = 2", k=3, m=8)


# ------------------------------------------------------- k-NN graph

_DUCK_KNN_GRAPH = f"""
WITH normed AS ({_DUCK_NORMED}),
bucketed AS (SELECT vec_id, e, norm, {_duck_bucket(6)} AS bucket FROM normed),
scored AS (
  SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
         list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i]))
           / (a.norm * b.norm) AS raw
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT src_id, dst_id,
         CAST(row_number() OVER (PARTITION BY src_id ORDER BY raw DESC, dst_id)
              AS INT) AS rank,
         raw
  FROM scored)
SELECT src_id, dst_id, rank,
       floor(raw * 1000000 + 0.5) / 1000000 AS score
FROM ranked WHERE rank <= 3
"""


@q(
    "sim_knn_graph",
    _DUCK_KNN_GRAPH,
    "North-star: approximate k-NN GRAPH build — every vector's top-3 cosine"
    " neighbors within its sign-LSH bucket (the SemDeDup/graph-index"
    " workload); candidate generation is the bucket SELF-join (one bucket"
    " hash shuffle, pair count bounded per bucket), never broadcast-all.",
)
def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.similarity import knn_graph

    register_views(spark, sf_dir, ("embeddings",))
    return knn_graph(spark.table("embeddings"), k=3, nbits=6)


# ---------------------------------------------------- PageRank on the graph

# PageRank over the k-NN graph in INTEGER rank units: total mass 1e9 is
# split evenly, each of 3 power iterations moves q//outdeg along every edge
# and re-injects floor(0.15e9/N) teleport mass. All arithmetic is BIGINT
# (// and DIV are integer division), so the per-iteration sums are
# order-independent and the result hash-matches across engines exactly —
# no float accumulation anywhere.
_PR_UNIT = 1_000_000_000
_PR_ITERS = 3


def _pagerank_duck() -> str:
    it_prev = "r0"
    steps = []
    for i in range(1, _PR_ITERS + 1):
        steps.append(
            f"""s{i} AS (
  SELECT e.dst_id AS vec_id, CAST(sum(r.q // d.d) AS BIGINT) AS c
  FROM edges e JOIN {it_prev} r ON r.vec_id = e.src_id
  JOIN deg d ON d.src_id = e.src_id
  GROUP BY e.dst_id),
r{i} AS (
  SELECT n.vec_id,
         CAST((15::BIGINT * {_PR_UNIT}) // (100 * cnt.n)
              + (85::BIGINT * COALESCE(s{i}.c, 0)) // 100 AS BIGINT) AS q
  FROM nodes n CROSS JOIN cnt LEFT JOIN s{i} ON s{i}.vec_id = n.vec_id)"""
        )
        it_prev = f"r{i}"
    return f"""
WITH knn AS ({_DUCK_KNN_GRAPH}),
edges AS (SELECT src_id, dst_id FROM knn),
nodes AS (SELECT vec_id FROM embeddings),
cnt AS (SELECT count(*) AS n FROM nodes),
deg AS (SELECT src_id, count(*) AS d FROM edges GROUP BY src_id),
r0 AS (SELECT vec_id, CAST({_PR_UNIT} // cnt.n AS BIGINT) AS q FROM nodes CROSS JOIN cnt),
{",".join(steps)}
SELECT vec_id, q AS q_pagerank FROM {it_prev}
"""


@q(
    "sim_pagerank",
    _pagerank_duck(),
    "North-star: PageRank centrality over the k-NN similarity graph (3 power"
    " iterations, damping 0.85) — the graph-quality signal used to pick"
    " representative documents from near-dup clusters. Rank mass is INTEGER"
    " units end-to-end (q DIV outdeg per edge, integer teleport), so every"
    " per-node sum is order-independent and cross-engine exact. Each"
    " iteration is one edge-join + one dst aggregation; the edge list with"
    " degrees is persisted once so the LSH candidate join runs once, not per"
    " iteration. At 100 TB you checkpoint ranks between iterations — the"
    " per-iteration shape (join on src, agg on dst) is the scale-correct"
    " one; no broadcast of the rank vector, no driver-side state.",
)
def sim_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.similarity import knn_graph

    register_views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    edges = knn_graph(emb, k=3, nbits=6).select("src_id", "dst_id")
    deg = edges.groupBy("src_id").agg(F.count("*").alias("d"))
    ed = edges.join(deg, on="src_id").persist()
    nodes = emb.select("vec_id")
    cnt = nodes.agg(F.count("*").alias("n"))
    ranks = nodes.join(F.broadcast(cnt)).select(
        "vec_id", F.expr(f"{_PR_UNIT}L DIV n").alias("q")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            ed.join(ranks, ed["src_id"] == ranks["vec_id"])
            .groupBy("dst_id")
            .agg(F.sum(F.expr("q DIV d")).alias("c"))
        )
        ranks = (
            nodes.join(F.broadcast(cnt))
            .join(contrib, nodes["vec_id"] == contrib["dst_id"], "left")
            .select(
                "vec_id",
                F.expr(
                    f"(15L * {_PR_UNIT}L) DIV (100L * n)"
                    " + (85L * COALESCE(c, 0L)) DIV 100L"
                ).alias("q"),
            )
        )
    return ranks.select("vec_id", F.col("q").alias("q_pagerank"))


# ------------------------------------------------------------- MIPS top-k

_DUCK_MIPS = f"""
WITH d AS (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
           FROM embeddings),
queries AS (SELECT vec_id AS query_id, e AS qe FROM d WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, 65), i -> q.qe[i] * n.e[i])) AS raw
  FROM queries q JOIN d n ON n.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, raw,
         row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, neighbor_id)
           AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, floor(raw * 1000000 + 0.5) / 1000000 AS score
FROM ranked WHERE rank <= 5
"""


@q(
    "sim_mips_topk",
    _DUCK_MIPS,
    "North-star: exact maximum-inner-product top-5 (the dot-product retrieval"
    " contract, ≠ cosine on unnormalized vectors) — broadcast queries ×"
    " corpus scan; the norm-augmentation reduction to cosine ANN is the"
    " indexed path, this is its exact reference.",
)
def sim_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.similarity import mips_topk

    register_views(spark, sf_dir, ("embeddings",))
    return mips_topk(spark.table("embeddings"), "vec_id % 50 = 0", k=5)


# --------------------------------------------- per-dimension standardization

# Feature standardization (z-score per embedding dimension) with ENGINE-EXACT
# statistics: elements are quantized to integer micro-units first, so the
# per-dim sums are exact bigints (order-independent across any shuffle), and
# the z doubles come from one mirrored expression tree. The per-dim stats
# table is D rows (embedding width, data-size-independent) gathered into one
# broadcastable array row; normalization is then per-row, zero additional
# shuffle. At extreme scale the xq² sums approach bigint range before
# anything else does (n·(4e6)² per dim) — switch the ss accumulator to
# DECIMAL(38,0) past ~1e5 rows per the docstring contract.
_STD_SPARK = """
WITH e AS (SELECT vec_id,
                  transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS xq
           FROM embeddings),
d AS (SELECT vec_id, dim, x FROM e LATERAL VIEW posexplode(xq) t AS dim, x),
st AS (SELECT dim, CAST(count(*) AS BIGINT) AS n, sum(x) AS s, sum(x * x) AS ss
       FROM d GROUP BY dim),
arr AS (SELECT transform(array_sort(collect_list(struct(dim, s))), y -> y.s) AS s_arr,
               transform(array_sort(collect_list(struct(dim, ss))), y -> y.ss) AS ss_arr,
               max(n) AS n
        FROM st),
z AS (SELECT vec_id,
             transform(sequence(1, size(xq)), i ->
               (CAST(element_at(xq, i) AS DOUBLE)
                  - CAST(element_at(arr.s_arr, i) AS DOUBLE) / arr.n)
               / sqrt(greatest(
                   (CAST(arr.n AS DOUBLE) * element_at(arr.ss_arr, i)
                      - CAST(element_at(arr.s_arr, i) AS DOUBLE)
                        * element_at(arr.s_arr, i))
                   / (CAST(arr.n AS DOUBLE) * arr.n), 1e-30))) AS zv
      FROM e CROSS JOIN arr)
SELECT vec_id,
       floor(sqrt(aggregate(zv, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x))
             * 1000000 + 0.5) / 1000000 AS z_l2_q,
       floor(aggregate(zv, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(x)))
             * 1000000 + 0.5) / 1000000 AS max_abs_z_q
FROM z
"""

_STD_DUCK = """
WITH e AS (SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS xq
           FROM embeddings),
d AS (SELECT vec_id, unnest(range(1, len(xq) + 1)) AS dim, unnest(xq) AS x FROM e),
st AS (SELECT dim, CAST(count(*) AS BIGINT) AS n, sum(x) AS s, sum(x * x) AS ss
       FROM d GROUP BY dim),
arr AS (SELECT list(s ORDER BY dim) AS s_arr, list(ss ORDER BY dim) AS ss_arr,
               max(n) AS n
        FROM st),
z AS (SELECT vec_id,
             list_transform(range(1, len(xq) + 1), i ->
               (CAST(xq[i] AS DOUBLE) - CAST(arr.s_arr[i] AS DOUBLE) / arr.n)
               / sqrt(greatest(
                   (CAST(arr.n AS DOUBLE) * arr.ss_arr[i]
                      - CAST(arr.s_arr[i] AS DOUBLE) * arr.s_arr[i])
                   / (CAST(arr.n AS DOUBLE) * arr.n), 1e-30))) AS zv
      FROM e CROSS JOIN arr)
SELECT vec_id,
       floor(sqrt(CAST(list_reduce(list_transform(zv, x -> x * x),
                                   (a, b) -> a + b) AS DOUBLE))
             * 1000000 + 0.5) / 1000000 AS z_l2_q,
       floor(list_reduce(list_transform(zv, x -> abs(x)),
                         (a, b) -> greatest(a, b))
             * 1000000 + 0.5) / 1000000 AS max_abs_z_q
FROM z
"""


@q(
    "sim_dim_standardize",
    _STD_DUCK,
    "North-star: per-dimension z-score standardization of the embedding"
    " corpus — exact integer-microunit sums per dim (order-independent under"
    " any shuffle), the D-row stats table gathered into ONE broadcast array"
    " row, per-row normalization with a mirrored IEEE expression tree;"
    " reports per-vector standardized L2 and max |z| quantized 1e-6.",
)
def sim_dim_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("embeddings",))
    return spark.sql(_STD_SPARK)


# --------------------------------------------- per-label centroid outliers

# Embedding-quality audit: distance of every vector to its LABEL centroid,
# top-5 farthest per label = the mislabeled/corrupt candidates a curation
# pass reviews. Centroids come from exact integer micro-unit sums (the
# sim_dim_standardize contract — order-independent under any shuffle); the
# per-vector distance is one mirrored IEEE fold over the label's centroid
# array (labels are bounded, so the centroid table broadcasts); ranking ties
# break by vec_id. Distances stay in integer micro-units.
_CO_DIST = (
    "(CAST(element_at(xq, i) AS DOUBLE)"
    " - CAST(element_at(c.s_arr, i) AS DOUBLE) / c.n)"
)
_CO_SPARK = f"""
WITH e AS (SELECT vec_id, label,
                  transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS xq
           FROM embeddings),
d AS (SELECT label, dim, x FROM e LATERAL VIEW posexplode(xq) t AS dim, x),
st AS (SELECT label, dim, CAST(count(*) AS BIGINT) AS n, sum(x) AS s
       FROM d GROUP BY label, dim),
c AS (SELECT label, transform(array_sort(collect_list(struct(dim, s))), y -> y.s) AS s_arr,
             max(n) AS n
      FROM st GROUP BY label),
z AS (SELECT vec_id, e.label,
             sqrt(aggregate(transform(sequence(1, size(xq)),
                                      i -> {_CO_DIST} * {_CO_DIST}),
                            CAST(0.0 AS DOUBLE), (a, v) -> a + v)) AS dist
      FROM e JOIN c ON e.label = c.label),
r AS (SELECT label, vec_id, dist,
             row_number() OVER (PARTITION BY label
                                ORDER BY dist DESC, vec_id) AS rn
      FROM z)
SELECT label, vec_id, CAST(floor(dist + 0.5) AS BIGINT) AS dist_micro,
       CAST(rn AS INT) AS rn
FROM r WHERE rn <= 5
"""

_CO_DIST_DUCK = "(CAST(xq[i] AS DOUBLE) - CAST(c.s_arr[i] AS DOUBLE) / c.n)"
_CO_DUCK = f"""
WITH e AS (SELECT vec_id, label,
                  list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS xq
           FROM embeddings),
d AS (SELECT label, unnest(range(1, len(xq) + 1)) AS dim, unnest(xq) AS x FROM e),
st AS (SELECT label, dim, CAST(count(*) AS BIGINT) AS n, sum(x) AS s
       FROM d GROUP BY label, dim),
c AS (SELECT label, list(s ORDER BY dim) AS s_arr, max(n) AS n
      FROM st GROUP BY label),
z AS (SELECT vec_id, e.label,
             sqrt(CAST(list_reduce(list_transform(range(1, len(xq) + 1),
                                     i -> {_CO_DIST_DUCK} * {_CO_DIST_DUCK}),
                                   (a, b) -> a + b) AS DOUBLE)) AS dist
      FROM e JOIN c ON e.label = c.label),
r AS (SELECT label, vec_id, dist,
             row_number() OVER (PARTITION BY label
                                ORDER BY dist DESC, vec_id) AS rn
      FROM z)
SELECT label, vec_id, CAST(floor(dist + 0.5) AS BIGINT) AS dist_micro,
       CAST(rn AS INT) AS rn
FROM r WHERE rn <= 5
"""


@q(
    "sim_centroid_outliers",
    _CO_DUCK,
    "North-star embedding-quality audit: top-5 farthest vectors from their"
    " label centroid — exact integer micro-unit centroid sums (shuffle-order"
    " independent), centroid table broadcast (labels bounded), one mirrored"
    " IEEE distance fold per vector, per-label rank with vec_id tie-break;"
    " the mislabeled/corrupt-embedding review queue.",
)
def sim_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("embeddings",))
    return spark.sql(_CO_SPARK)


# ------------------------------------------------- binary (1-bit) retrieval

def _duck_bincode(dim: int = 64, word_bits: int = 32) -> str:
    """DuckDB twin of operators.similarity.binary_code_expr: sign bits packed
    into 32-bit words (list of BIGINT)."""
    n_words = (dim + word_bits - 1) // word_bits
    words = []
    for w in range(n_words):
        lo = w * word_bits
        bits = " + ".join(
            f"(CASE WHEN e[{lo + i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
            for i in range(min(word_bits, dim - lo))
        )
        words.append(f"CAST({bits} AS BIGINT)")
    return "[" + ", ".join(words) + "]"


_DUCK_HAMMING = f"""
WITH normed AS ({_DUCK_NORMED}),
coded AS (SELECT vec_id, {_duck_bincode(64)} AS code FROM normed),
queries AS (SELECT vec_id AS query_id, code AS q_code FROM coded
            WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, 3),
              w -> bit_count(xor(c.code[w], q.q_code[w])))) AS INT) AS hamming
  FROM queries q JOIN coded c ON c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, hamming,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY hamming, neighbor_id) AS INT) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, hamming FROM ranked WHERE rank <= 5
"""


@q(
    "sim_hamming_topk",
    _DUCK_HAMMING,
    "North-star: 1-bit binary-code retrieval — sign bits packed into 32-bit"
    " words (32x smaller scan payload than float32), exact Hamming top-5 by"
    " XOR+popcount with broadcast queries; the billion-vector first-pass"
    " filter whose survivors are float-re-ranked (sim_cosine_topk is that"
    " exact reference).",
)
def sim_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.similarity import hamming_topk

    register_views(spark, sf_dir, ("embeddings",))
    return hamming_topk(spark.table("embeddings"), "vec_id % 50 = 0", k=5)


# ------------------------------------------------- triangles on the k-NN graph

_DUCK_TRIANGLES = f"""
WITH knn AS ({_DUCK_KNN_GRAPH}),
und AS (SELECT DISTINCT least(src_id, dst_id) AS u, greatest(src_id, dst_id) AS v
        FROM knn WHERE src_id <> dst_id),
deg AS (SELECT n, count(*) AS deg FROM (
          SELECT u AS n FROM und UNION ALL SELECT v AS n FROM und) GROUP BY n),
keyed AS (SELECT n, deg * 10000000000 + n AS okey FROM deg),
oriented AS (
  SELECT CASE WHEN ku.okey < kv.okey THEN und.u ELSE und.v END AS a,
         CASE WHEN ku.okey < kv.okey THEN und.v ELSE und.u END AS b,
         CASE WHEN ku.okey < kv.okey THEN kv.okey ELSE ku.okey END AS kb
  FROM und JOIN keyed ku ON ku.n = und.u JOIN keyed kv ON kv.n = und.v),
wedges AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM oriented e1 JOIN oriented e2 ON e1.a = e2.a AND e1.kb < e2.kb),
tris AS (
  SELECT w.x, w.y, w.z FROM wedges w
  JOIN oriented c ON c.a = w.y AND c.b = w.z)
SELECT vec_id, CAST(count(*) AS BIGINT) AS n_tri FROM (
  SELECT x AS vec_id FROM tris
  UNION ALL SELECT y FROM tris
  UNION ALL SELECT z FROM tris)
GROUP BY vec_id
"""


@q(
    "graph_triangle_count",
    _DUCK_TRIANGLES,
    "North-star: distributed triangle counting on the k-NN graph"
    " (node-iterator++ / degree-ordered orientation): symmetrize, orient"
    " every edge low-(deg,id) to high, count wedge-join-closing-edge — the"
    " orientation bounds wedge fan-out by O(sqrt(|E|)) so hub skew cannot"
    " explode the join; shuffles on node keys only.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.similarity import knn_graph, triangle_count

    register_views(spark, sf_dir, ("embeddings",))
    edges = knn_graph(spark.table("embeddings"), k=3, nbits=6).select(
        "src_id", "dst_id"
    )
    return triangle_count(edges)


# ------------------------------------------------- covariance / decorrelation

_DUCK_COV = """
WITH q AS (
  SELECT vec_id, i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS x
  FROM embeddings, range(1, 65) t(i)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
s1 AS (SELECT i, CAST(sum(x) AS BIGINT) AS si FROM q GROUP BY i),
s2 AS (
  SELECT a.i AS i, b.i AS j, CAST(sum(a.x * b.x) AS BIGINT) AS sij
  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY a.i, b.i
)
SELECT s2.i, s2.j,
       (SELECT n FROM nn) * sij - sa.si * sb.si AS cov_num
FROM s2 JOIN s1 sa ON sa.i = s2.i JOIN s1 sb ON sb.i = s2.j
"""


@q(
    "sim_embed_covariance",
    _DUCK_COV,
    "North-star: integer-exact embedding covariance (the PCA-whitening /"
    " decorrelation input) in ONE corpus pass — per-partition numpy Gram +"
    " first-moment folds inside one Arrow crossing (d^2-bounded summaries,"
    " raw vectors never shuffle), merged by addition; output is the n^2-"
    " scaled covariance numerator, an exact integer on every engine and"
    " partition layout.",
)
def sim_embed_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.similarity import embed_covariance

    register_views(spark, sf_dir, ("embeddings",))
    return embed_covariance(spark.table("embeddings"), dim=64, quant=1000)


# ------------------------------------------------- trained PQ codebooks

_DUCK_PQ_TRAIN = """
WITH e AS (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS ed
           FROM embeddings),
sub AS (SELECT vec_id, s,
               list_transform(range(1, 17), i -> ed[s * 16 + i]) AS sv
        FROM e, range(0, 4) t(s)),
init AS (SELECT s, CAST(rn - 1 AS INT) AS c_label, sv AS c_e FROM (
           SELECT s, sv,
                  row_number() OVER (PARTITION BY s ORDER BY vec_id) AS rn
           FROM sub) WHERE rn <= 4),
d1 AS (SELECT sub.vec_id, sub.s, sub.sv, c.c_label,
              list_sum(list_transform(range(1, 17),
                       i -> (sub.sv[i] - c.c_e[i]) * (sub.sv[i] - c.c_e[i]))) AS d2
       FROM sub JOIN init c ON c.s = sub.s),
a1 AS (SELECT vec_id, s, sv, c_label AS cluster FROM (
         SELECT vec_id, s, sv, c_label,
                row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c_label) AS rn
         FROM d1) WHERE rn = 1),
ex1 AS (SELECT s, cluster, i - 1 AS dim, sv[i] AS val FROM a1, range(1, 17) t(i)),
cd1 AS (SELECT s, cluster, dim,
               CAST(sum(CAST(floor(val * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1000000000.0 / count(*) AS mean_val
        FROM ex1 GROUP BY s, cluster, dim),
c1 AS (SELECT s, cluster AS c_label, list(mean_val ORDER BY dim) AS c_e
       FROM cd1 GROUP BY s, cluster),
d2r AS (SELECT sub.vec_id, sub.s, c.c_label,
               list_sum(list_transform(range(1, 17),
                        i -> (sub.sv[i] - c.c_e[i]) * (sub.sv[i] - c.c_e[i]))) AS d2
        FROM sub JOIN c1 c ON c.s = sub.s)
SELECT vec_id, CAST(s AS INT) AS subspace, c_label AS code,
       CAST(floor(d2 * 1000000 + 0.5) AS BIGINT) AS subd2_micro
FROM (SELECT vec_id, s, c_label, d2,
             row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c_label) AS rn
      FROM d2r) WHERE rn = 1
"""


@q(
    "sim_pq_train_codes",
    _DUCK_PQ_TRAIN,
    "North-star: TRAINED product-quantization codebooks — an independent"
    " decimal-exact Lloyd k-means per 16-dim subspace slice (all four"
    " subspaces per corpus pass: per-row argmin over the broadcast codebooks,"
    " one (subspace, cluster, dim) mean aggregation, k*m-bounded collect),"
    " then the corpus encoded as (vec_id, subspace, code) + quantized"
    " distortion — the m-bytes-per-vector representation a billion-vector"
    " ANN system persists; upgrades sim_pq_adc_ann's label-slice stand-in.",
)
def sim_pq_train_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.similarity import pq_train_encode

    register_views(spark, sf_dir, ("embeddings",))
    return pq_train_encode(spark.table("embeddings"), m=4, k=4, iters=2, dim=64)


# ------------------------------------------------- k-core of the mutual kNN


def _kcore_duck(k: int, rounds: int) -> str:
    """Unrolled synchronous peeling — the same generated-SQL recipe as the
    integer PageRank above: stage i's edges keep only endpoints whose stage
    i-1 degree is >= k. The Spark side runs the identical fixed rounds plus
    a fixpoint certificate (operators/kcore.py), so both engines compute
    literally the same R stages."""
    # every CTE is MATERIALIZED: DuckDB inlines CTEs by default, and each
    # stage references its predecessor several times — inlining would
    # re-expand the knn subtree exponentially across R rounds
    stages = [
        f"""e0 AS MATERIALIZED (SELECT a.src_id AS a, a.dst_id AS b
      FROM knn a JOIN knn b ON a.src_id = b.dst_id AND a.dst_id = b.src_id
      WHERE a.src_id < a.dst_id)"""
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        stages.append(
            f"""d{p} AS MATERIALIZED (SELECT node, count(*) AS c FROM (
        SELECT a AS node FROM e{p} UNION ALL SELECT b AS node FROM e{p})
      GROUP BY node),
    k{p} AS MATERIALIZED (SELECT node FROM d{p} WHERE c >= {k}),
    e{i} AS MATERIALIZED (SELECT e.a, e.b FROM e{p} e
      JOIN k{p} x ON e.a = x.node JOIN k{p} y ON e.b = y.node)"""
        )
    final = f"""SELECT node AS vec_id, CAST(c AS BIGINT) AS core_degree FROM (
      SELECT node, count(*) AS c FROM (
        SELECT a AS node FROM e{rounds} UNION ALL SELECT b AS node FROM e{rounds})
      GROUP BY node)"""
    return (
        "WITH knn AS MATERIALIZED (" + _DUCK_KNN_GRAPH + "),\n    "
        + ",\n    ".join(stages)
        + "\n"
        + final
    )


@q(
    "graph_kcore_mutual_knn",
    None,  # set below (needs the module-level KCORE_ROUNDS constant)
    "North-star graph: k-core decomposition of the MUTUAL k-NN graph — the"
    " reciprocal-neighbor density filter (SemDeDup-style community core)."
    " Synchronous peeling: every round drops ALL currently-under-degree"
    " nodes at once (degree agg + two semi-joins over the SHRINKING edge"
    " list), a compile-time round count shared with the oracle's unrolled"
    " stages, and a FIXPOINT CERTIFICATE that fails loudly if the constant"
    " were ever too small (measured 4-8 rounds at sf0.001-0.1; R=16). The"
    " iterative edge list is lineage-cut every few rounds so Catalyst plans"
    " stay round-sized (the ivm family's planning-time discipline).",
)
def graph_kcore_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.kcore import kcore_peel, mutual_edges
    from pgcapture_spark.operators.similarity import knn_graph

    register_views(spark, sf_dir, ("embeddings",))
    knn = knn_graph(spark.table("embeddings"), k=3, nbits=6)
    core = kcore_peel(mutual_edges(knn), k=2)
    return core.select(F.col("node").alias("vec_id"), "core_degree")


def _set_kcore_oracle() -> None:
    from pgcapture_spark.operators.kcore import KCORE_ROUNDS
    from pgcapture_spark.queries import REGISTRY

    REGISTRY["graph_kcore_mutual_knn"].oracle = _kcore_duck(2, KCORE_ROUNDS)


_set_kcore_oracle()
