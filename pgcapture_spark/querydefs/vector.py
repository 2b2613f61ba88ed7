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
         list_sum(list_transform(range(1, 33),
                  i -> (s.vals[i] - q.q_vals[i]) * (s.vals[i] - q.q_vals[i])))
           AS dist2
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
