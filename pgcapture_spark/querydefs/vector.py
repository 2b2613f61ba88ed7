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

_SUBD2 = (
    "aggregate(zip_with(slice(emb_d, m * 8 + 1, 8), slice(c.c_e, m * 8 + 1, 8),"
    " (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


@q(
    "sim_pq_adc_ann",
    _DUCK_PQ,
    "North-star: product-quantization ANN with asymmetric distance computation"
    " — corpus compressed to 8 subspace codes, queries score via broadcast"
    " 8×10 integer distance tables; exact integer ranking cross-engine.",
)
def sim_pq_adc_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from pgcapture_spark.operators.similarity import centroid_vectors, with_norm

    register_views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    normed = with_norm(emb).select("vec_id", "emb_d")
    cent_rows = centroid_vectors(emb).collect()
    cents_local = sorted(
        (int(r["c_label"]), [float(v) for v in r["c_e"]]) for r in cent_rows
    )
    cents_row = emb.sparkSession.createDataFrame(
        [(cents_local,)], "cents array<struct<c_label:int,c_e:array<double>>>"
    )
    with_cents = normed.join(F.broadcast(cents_row))
    # corpus → 8 codes (argmin per subspace; cents sorted by label, so
    # element_at index = label + 1 on the query side)
    corpus = with_cents.select(
        "vec_id",
        F.expr(
            "transform(sequence(0, 7), m -> array_min(transform(cents, c ->"
            f" struct({_SUBD2} AS d2, c.c_label AS lbl))).lbl)"
        ).alias("codes"),
    )
    queries = with_cents.where("vec_id % 25 = 1").select(
        F.col("vec_id").alias("query_id"),
        F.expr(
            "transform(sequence(0, 7), m -> transform(cents, c ->"
            f" CAST(floor({_SUBD2} * 1000000 + 0.5) AS BIGINT)))"
        ).alias("dtab"),
    )
    adc = (
        corpus.join(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(
                "aggregate(sequence(0, 7), 0L, (acc, m) -> acc +"
                " element_at(element_at(dtab, m + 1),"
                " element_at(codes, m + 1) + 1))"
            ).alias("approx_d2q"),
        )
    )
    w = W.partitionBy("query_id").orderBy("approx_d2q", "neighbor_id")
    return adc.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 3)


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
