"""Similarity search over embedding columns (`array<float>`).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline. The dot
  product is a sequential fold over zipped arrays (deterministic, JVM-side via
  Catalyst array expressions — no Python, no UDF).
- ``signlsh_topk``: the scale path — random-hyperplane-style LSH where the
  hyperplanes are the first ``nbits`` coordinate axes (sign bits), bucketing
  candidates into 2^nbits cells so the pairwise join is per-bucket instead of
  full cross. An IVF variant would swap the bucket id for argmin-centroid.
- ``label_centroids``: per-label mean vectors (decimal-exact sums so results
  are order-independent → reproducible across engines/cluster sizes).

At 100 TB: brute-force is a broadcast of the (small) query set against the
corpus — embarrassingly parallel scan; LSH buckets co-partition via one
shuffle on the bucket id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

DOT_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
NORM_EXPR = "sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v))"

# Hard budget for any "reference set rides as one broadcast row" operator
# (OOD scoring): the fold raises loudly past this instead of silently
# building an unbounded row. 10k × (64 doubles + id + norm) ≈ 5 MB — safely
# broadcastable; larger anchors must be pre-sampled by the caller.
OOD_REF_CAP = 10_000


def _as_double(df: DataFrame, col: str = "embedding") -> DataFrame:
    from pgcapture_spark.operators.textstats import ensure_parallelism

    return ensure_parallelism(df).withColumn(
        "emb_d", F.expr(f"transform({col}, v -> CAST(v AS DOUBLE))")
    )


def with_norm(df: DataFrame) -> DataFrame:
    return _as_double(df).withColumn("norm", F.expr(NORM_EXPR.format(a="emb_d")))


def cosine_topk(
    embeddings: DataFrame, query_pred: str, k: int = 5, quant: int = 1_000_000
) -> DataFrame:
    """Exact top-k cosine neighbors for every vector matching ``query_pred``.

    Output: (query_id, neighbor_id, rank, score) with score floor-quantized at
    1/quant for stable cross-engine comparison; rank ties broken by
    neighbor_id.
    """
    base = with_norm(embeddings).select("vec_id", "emb_d", "norm")
    queries = base.where(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb_d").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    pairs = base.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    scored = pairs.withColumn(
        "raw_score",
        F.expr(DOT_EXPR.format(a="q_emb", b="emb_d")) / (F.col("q_norm") * F.col("norm")),
    )
    w = W.partitionBy("query_id").orderBy(F.col("raw_score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            (F.floor(F.col("raw_score") * quant + F.lit(0.5)) / quant).alias("score"),
        )
    )


def sign_bucket_expr(col: str = "embedding", nbits: int = 8) -> str:
    """LSH bucket id from the sign bits of the first nbits coordinates."""
    terms = " + ".join(
        f"(CASE WHEN element_at({col}, {i + 1}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(nbits)
    )
    return f"({terms})"


def signlsh_topk(
    embeddings: DataFrame,
    query_pred: str,
    k: int = 3,
    nbits: int = 8,
    quant: int = 1_000_000,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    base = (
        with_norm(embeddings)
        .withColumn("bucket", F.expr(sign_bucket_expr("emb_d", nbits)))
        .select("vec_id", "emb_d", "norm", "bucket")
    )
    queries = base.where(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb_d").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = base.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = cand.withColumn(
        "raw_score",
        F.expr(DOT_EXPR.format(a="q_emb", b="emb_d")) / (F.col("q_norm") * F.col("norm")),
    )
    w = W.partitionBy("query_id").orderBy(F.col("raw_score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("bucket"),
            "rank",
            (F.floor(F.col("raw_score") * quant + F.lit(0.5)) / quant).alias("score"),
        )
    )


def embed_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    nbits: int = 4,
    quant: int = 1_000_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (north-star dedup family).

    Candidates = pairs sharing a sign-LSH bucket (2^nbits cells — the recall/
    cost dial: more bits, fewer candidates, lower recall), verified by exact
    cosine >= threshold. One shuffle (the bucket self-join); the cosine is a
    per-row fold. At 100 TB, nbits grows with corpus size to hold per-bucket
    pair counts flat."""
    base = (
        with_norm(embeddings)
        .withColumn("bucket", F.expr(sign_bucket_expr("emb_d", nbits)))
        .select("vec_id", "emb_d", "norm", "bucket")
    )
    a = base.select(
        F.col("vec_id").alias("a_id"),
        F.col("emb_d").alias("a_e"),
        F.col("norm").alias("a_n"),
        "bucket",
    )
    b = base.select(
        F.col("vec_id").alias("b_id"),
        F.col("emb_d").alias("b_e"),
        F.col("norm").alias("b_n"),
        "bucket",
    )
    pairs = a.join(b, "bucket").where(F.col("a_id") < F.col("b_id"))
    scored = pairs.withColumn(
        "raw", F.expr(DOT_EXPR.format(a="a_e", b="b_e")) / (F.col("a_n") * F.col("b_n"))
    )
    return scored.where(F.col("raw") >= threshold).select(
        "a_id",
        "b_id",
        "bucket",
        (F.floor(F.col("raw") * quant + F.lit(0.5)) / quant).alias("cosine"),
    )


DIST2_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def centroid_vectors(embeddings: DataFrame) -> DataFrame:
    """(c_label, c_e): per-label centroid as an ordered array — the IVF coarse
    quantizer. Built from the decimal-exact per-dim means so the quantizer is
    bit-identical across engines and cluster layouts."""
    return (
        label_centroids(embeddings)
        .groupBy(F.col("label").alias("c_label"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, mean_val))), s -> s.mean_val)"
            ).alias("c_e")
        )
    )


def _local_quantizer(embeddings: DataFrame) -> DataFrame:
    """The coarse quantizer materialized ONCE and re-injected as ONE local
    row of array<struct> — left as a lazy plan it would recompute (explode +
    two aggregations) in both branches of any self-join over the assigned
    cells. It is ≤ #cells rows — IVF coarse quantizers are driver-resident in
    any real ANN system, 100 TB included."""
    cent_rows = centroid_vectors(embeddings).collect()
    cents_local = sorted(
        (int(r["c_label"]), [float(v) for v in r["c_e"]]) for r in cent_rows
    )
    return embeddings.sparkSession.createDataFrame(
        [(cents_local,)], "cents array<struct<c_label:int,c_e:array<double>>>"
    )


def _argmin_cell_expr():
    """Nearest-centroid cell id: struct ordering = (d2, lbl) lexicographic, so
    array_min IS min_by(struct(dist2, label)) — one dist2 per centroid."""
    return F.expr(
        "array_min(transform(cents, c -> "
        f"struct({DIST2_EXPR.format(a='emb_d', b='c.c_e')} AS d2, c.c_label AS lbl))).lbl"
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.30,
    quant: int = 1_000_000,
    codebook: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (cf. Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): assign every vector to its nearest-centroid cell
    (deterministic coarse quantizer = decimal-exact label centroids, where a
    trained k-means would slot in identically), then inside each cell drop any
    vector whose cosine to a LOWER-id cell-mate is ≥ threshold, reporting the
    lowest-id witness.

    Plan shape for 100 TB: the quantizer broadcast + per-row argmin fuse into
    the scan (zero shuffle), then ONE hash shuffle on cell co-locates each
    cluster for the within-cell self-join — candidate pairs are bounded by the
    cell size, never the corpus size (the reason SemDeDup clusters before
    comparing at all). The witness pick is a per-vec_id min — folded into the
    same aggregation.

    Output: (vec_id, witness_id, cell, cosine) — one row per DROPPED vector.

    ``codebook``: a LOCAL (label, vector) list to use as the coarse quantizer
    — e.g. :func:`kmeans_codebook` with k ∝ corpus size. The default (None)
    keeps the label-centroid quantizer, whose fixed k = #labels makes cells
    grow linearly with the corpus: fine for a labeled eval set, wrong at
    100 TB where the within-cell O(cell²) self-join needs k to scale.
    """
    normed = with_norm(embeddings).select("vec_id", "emb_d", "norm")
    if codebook is not None:
        cents_row = embeddings.sparkSession.createDataFrame(
            [(sorted((int(l), [float(v) for v in e]) for l, e in codebook),)],
            "cents array<struct<c_label:int,c_e:array<double>>>",
        )
    else:
        cents_row = _local_quantizer(embeddings)
    cells = (
        normed.join(F.broadcast(cents_row))
        .withColumn("cell", _argmin_cell_expr())
        .drop("cents")
    )
    a = cells.select(
        F.col("vec_id").alias("witness_cand"),
        F.col("emb_d").alias("a_emb"),
        F.col("norm").alias("a_norm"),
        F.col("cell"),
    )
    b = cells.select(
        F.col("vec_id").alias("vec_id"),
        F.col("emb_d").alias("b_emb"),
        F.col("norm").alias("b_norm"),
        F.col("cell"),
    )
    pairs = a.join(b, on="cell").where(F.col("witness_cand") < F.col("vec_id"))
    scored = pairs.withColumn(
        "raw",
        F.expr(DOT_EXPR.format(a="a_emb", b="b_emb"))
        / (F.col("a_norm") * F.col("b_norm")),
    ).where(F.col("raw") >= threshold)
    # lowest-id witness per dropped vector, its cosine carried by min_by
    return scored.groupBy("vec_id", "cell").agg(
        F.min("witness_cand").alias("witness_id"),
        (
            F.floor(F.expr("min_by(raw, witness_cand)") * quant + F.lit(0.5)) / quant
        ).alias("cosine"),
    ).select("vec_id", "witness_id", "cell", "cosine")


def ivf_topk(
    embeddings: DataFrame,
    query_pred: str,
    k: int = 3,
    quant: int = 1_000_000,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-style approximate NN: assign every vector to its nearest centroid
    cell (coarse quantizer = label centroids, deterministic — a k-means would
    slot in identically); queries probe their ``nprobe`` nearest cells (the
    recall/cost dial — probing more cells widens the candidate set).

    Plan shape: the coarse quantizer is tiny by construction (√N cells even at
    100 TB), so it rides along as ONE broadcast row of array<struct> and the
    cell assignment is a per-row argmin expression fused into the corpus scan —
    no explode, no groupBy shuffle, no corpus re-join. The only shuffles left
    are the centroid build (grouped on label, ~cells rows) and the final
    per-query rank window. Ties in the argmin are broken by label; exact
    distance ties are measure-zero on continuous data."""
    normed = with_norm(embeddings).select("vec_id", "emb_d", "norm")
    cents_row = _local_quantizer(embeddings)
    cells = (
        normed.join(F.broadcast(cents_row))
        .withColumn("cell", _argmin_cell_expr())
        .drop("cents")
    )
    if nprobe == 1:
        queries = cells.where(query_pred).select(
            F.col("vec_id").alias("query_id"),
            F.col("emb_d").alias("q_emb"),
            F.col("norm").alias("q_norm"),
            F.col("cell").alias("q_cell"),
        )
    else:
        # nprobe nearest cells per query, exploded to (query, probe_cell)
        # rows so the candidate restriction stays an equi hash join; queries
        # are few and broadcast, so the ×nprobe fan-out is driver-trivial.
        # Each corpus vector lives in exactly ONE cell — probes are disjoint,
        # no candidate dedupe needed.
        probe_cells = F.expr(
            "slice(transform(array_sort(transform(cents, c -> "
            f"struct({DIST2_EXPR.format(a='emb_d', b='c.c_e')} AS d2,"
            " c.c_label AS lbl))), s -> s.lbl),"
            f" 1, {int(nprobe)})"
        )
        queries = (
            normed.join(F.broadcast(cents_row))
            .where(query_pred)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("emb_d").alias("q_emb"),
                F.col("norm").alias("q_norm"),
                F.explode(probe_cells).alias("q_cell"),
            )
        )
    cand = cells.join(
        F.broadcast(queries),
        (F.col("cell") == F.col("q_cell")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = cand.withColumn(
        "raw",
        F.expr(DOT_EXPR.format(a="q_emb", b="emb_d")) / (F.col("q_norm") * F.col("norm")),
    )
    w = W.partitionBy("query_id").orderBy(F.col("raw").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("cell"),
            "rank",
            (F.floor(F.col("raw") * quant + F.lit(0.5)) / quant).alias("score"),
        )
    )


def label_centroids(embeddings: DataFrame, dims: int = 64) -> DataFrame:
    """Per-label mean vector, one row per (label, dim). Decimal-exact sums —
    order-independent, so the result is identical regardless of partitioning."""
    exploded = _as_double(embeddings).select(
        "label", F.posexplode("emb_d").alias("dim", "val")
    )
    # quantize each value at 1e-9 with pure double arithmetic (bit-identical
    # across engines — double→decimal CASTs round differently), sum exactly as
    # integers, then scale back
    scaled = F.expr("CAST(floor(val * 1000000000 + 0.5) AS BIGINT)")
    return exploded.groupBy("label", "dim").agg(
        (F.sum(scaled).cast("double") / 1000000000.0 / F.count("*")).alias("mean_val"),
        F.count("*").alias("n_vecs"),
    )


def pq_adc_topk(
    embeddings: DataFrame,
    query_pred: str,
    k: int = 3,
    m: int = 8,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation.

    64 dims → ``m`` subspaces × 64/m dims; the per-subspace codebook is the
    label-centroid slice (deterministic — a trained k-means would slot in
    identically). Corpus vectors compress to ``m`` small codes; each query
    builds an m×cells integer distance table and scores candidates by table
    lookups only (ADC) — at 100 TB the corpus scan reads CODES (m bytes per
    vector), not raw vectors, and the tables ride along in one broadcast.
    ``m`` is the accuracy/compression dial: more subspaces, finer distances,
    bigger codes. Per-subspace distances are quantized to integers before
    summing, so ranking is exact cross-engine.

    Output: (query_id, neighbor_id, approx_d2q, rank)."""
    sd = 64 // m
    subd2 = (
        f"aggregate(zip_with(slice(emb_d, m * {sd} + 1, {sd}),"
        f" slice(c.c_e, m * {sd} + 1, {sd}),"
        " (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    normed = with_norm(embeddings).select("vec_id", "emb_d")
    cent_rows = centroid_vectors(embeddings).collect()
    cents_local = sorted(
        (int(r["c_label"]), [float(v) for v in r["c_e"]]) for r in cent_rows
    )
    cents_row = embeddings.sparkSession.createDataFrame(
        [(cents_local,)], "cents array<struct<c_label:int,c_e:array<double>>>"
    )
    with_cents = normed.join(F.broadcast(cents_row))
    # corpus → m codes (argmin per subspace; cents sorted by label, so
    # element_at index = label + 1 on the query side)
    corpus = with_cents.select(
        "vec_id",
        F.expr(
            f"transform(sequence(0, {m - 1}), m -> array_min(transform(cents, c ->"
            f" struct({subd2} AS d2, c.c_label AS lbl))).lbl)"
        ).alias("codes"),
    )
    queries = with_cents.where(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.expr(
            f"transform(sequence(0, {m - 1}), m -> transform(cents, c ->"
            f" CAST(floor({subd2} * 1000000 + 0.5) AS BIGINT)))"
        ).alias("dtab"),
    )
    adc = (
        corpus.join(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(
                f"aggregate(sequence(0, {m - 1}), 0L, (acc, m) -> acc +"
                " element_at(element_at(dtab, m + 1),"
                " element_at(codes, m + 1) + 1))"
            ).alias("approx_d2q"),
        )
    )
    w = W.partitionBy("query_id").orderBy("approx_d2q", "neighbor_id")
    return adc.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def kmeans_assign(
    embeddings: DataFrame, k: int = 8, iters: int = 2, quant: int = 1_000_000
) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding column — the clustering
    stage of data-mixing / SemDeDup-style curation pipelines.

    Deterministic init: the ``k`` lowest-vec_id vectors are the starting
    centroids (cluster j = j-th lowest). Each round then runs:

    1. assignment — nearest-centroid argmin as a per-row expression over ONE
       broadcast row of centroids, fused into the scan (no explode, no
       shuffle, same shape as the IVF coarse quantizer);
    2. update — decimal-exact per-(cluster, dim) means (one groupBy of
       k x dims output rows; order-independent quantized integer sums, so
       centroids are bit-identical across engines and cluster layouts).

    The k-bounded collect between rounds is the synchronization barrier every
    distributed k-means pays — centroids are driver/broadcast-resident at any
    corpus scale, and each round is one full pass (iters passes total, the
    textbook cost model).

    Output: (vec_id, cluster, dist2q) after ``iters`` assignment rounds.
    """
    assigned = _kmeans_final_assign(embeddings, k=k, iters=iters)
    return assigned.select(
        "vec_id",
        "cluster",
        (F.floor(F.col("d2") * quant + F.lit(0.5)) / quant).alias("dist2q"),
    )


def mmr_rerank(
    embeddings: DataFrame,
    query_pred: str,
    pool: int = 5,
    k: int = 3,
    lam_tenths: int = 7,
    quant: int = 1_000_000,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) of
    each query's cosine top-``pool`` candidates: greedily pick ``k`` results
    maximizing λ·relevance − (1−λ)·max-similarity-to-already-picked —
    the diversity pass between ANN retrieval and the consumer.

    Determinism contract: relevance and pairwise cosines are floor-quantized
    to integers (×``quant``) and the greedy objective is evaluated in scaled
    INTEGER arithmetic (λ in tenths: score = λ₁₀·rel_q − (10−λ₁₀)·maxsim_q),
    so selection and scores are bit-identical across engines and layouts.
    The greedy loop is unrolled ``k`` steps as relational stages — each step
    is one bounded join over the ≤``pool``-row per-query candidate sets, so
    at 100 TB the cost is (#queries × pool²), never corpus-shaped; the
    corpus-shaped work (the top-pool retrieval) stays one broadcast probe.

    Output: (query_id, rank, neighbor_id, mmr_q) — mmr_q is the scaled
    integer objective (rank 1 = λ₁₀·rel_q, nothing picked yet).
    """
    if k != 3:
        raise ValueError("mmr_rerank unrolls exactly k=3 selection steps")
    base = with_norm(embeddings).select("vec_id", "emb_d", "norm")
    queries = base.where(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb_d").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    rel_q = F.floor(
        F.expr(DOT_EXPR.format(a="q_emb", b="emb_d"))
        / (F.col("q_norm") * F.col("norm")) * quant + F.lit(0.5)
    ).cast("bigint")
    scored = (
        base.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("nid"),
                rel_q.alias("rel_q"), "emb_d", "norm")
    )
    w = W.partitionBy("query_id").orderBy(F.col("rel_q").desc(), F.col("nid"))
    pool_df = (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= pool)
        .drop("_rn")
    )
    a = pool_df.select("query_id", F.col("nid").alias("a_id"), F.col("rel_q").alias("a_rel"),
                       F.col("emb_d").alias("a_e"), F.col("norm").alias("a_n"))
    b = pool_df.select("query_id", F.col("nid").alias("b_id"),
                       F.col("emb_d").alias("b_e"), F.col("norm").alias("b_n"))
    sim_q = F.floor(
        F.expr(DOT_EXPR.format(a="a_e", b="b_e")) / (F.col("a_n") * F.col("b_n"))
        * quant + F.lit(0.5)
    ).cast("bigint")
    psim = (
        a.join(b, on="query_id").where(F.col("a_id") != F.col("b_id"))
        .select("query_id", "a_id", "b_id", sim_q.alias("sim_q"))
    )
    cand = pool_df.select("query_id", "nid", "rel_q")
    lam, com = int(lam_tenths), 10 - int(lam_tenths)

    def _argmax(df: DataFrame, score_col: str) -> DataFrame:
        ww = W.partitionBy("query_id").orderBy(F.col(score_col).desc(), F.col("nid"))
        return (
            df.withColumn("_rn", F.row_number().over(ww))
            .where("_rn = 1").drop("_rn")
        )

    s1 = _argmax(
        cand.withColumn("mmr_q", F.lit(lam) * F.col("rel_q")), "mmr_q"
    ).select("query_id", F.col("nid").alias("s1_id"), F.col("mmr_q").alias("s1_q"))
    c2 = (
        cand.join(s1, on="query_id").where(F.col("nid") != F.col("s1_id"))
        .join(
            psim.select("query_id", F.col("a_id").alias("nid"),
                        F.col("b_id").alias("s1_id"), F.col("sim_q").alias("sim1")),
            on=["query_id", "nid", "s1_id"],
        )
        .withColumn("mmr_q", F.lit(lam) * F.col("rel_q") - F.lit(com) * F.col("sim1"))
    )
    s2 = _argmax(c2, "mmr_q").select(
        "query_id", "s1_id", F.col("nid").alias("s2_id"), F.col("mmr_q").alias("s2_q")
    )
    c3 = (
        cand.join(s2.join(s1.select("query_id", "s1_id"), on=["query_id", "s1_id"]),
                  on="query_id")
        .where((F.col("nid") != F.col("s1_id")) & (F.col("nid") != F.col("s2_id")))
        .join(
            psim.select("query_id", F.col("a_id").alias("nid"),
                        F.col("b_id").alias("s1_id"), F.col("sim_q").alias("sim1")),
            on=["query_id", "nid", "s1_id"],
        )
        .join(
            psim.select("query_id", F.col("a_id").alias("nid"),
                        F.col("b_id").alias("s2_id"), F.col("sim_q").alias("sim2")),
            on=["query_id", "nid", "s2_id"],
        )
        .withColumn(
            "mmr_q",
            F.lit(lam) * F.col("rel_q")
            - F.lit(com) * F.greatest(F.col("sim1"), F.col("sim2")),
        )
    )
    s3 = _argmax(c3, "mmr_q")
    out1 = s1.select("query_id", F.lit(1).alias("rank"),
                     F.col("s1_id").alias("neighbor_id"), F.col("s1_q").alias("mmr_q"))
    out2 = s2.select("query_id", F.lit(2).alias("rank"),
                     F.col("s2_id").alias("neighbor_id"), F.col("s2_q").alias("mmr_q"))
    out3 = s3.select("query_id", F.lit(3).alias("rank"),
                     F.col("nid").alias("neighbor_id"), "mmr_q")
    return out1.unionByName(out2).unionByName(out3)


def kmeans_codebook(
    embeddings: DataFrame, k: int = 8, iters: int = 2
) -> list[tuple[int, list[float]]]:
    """The codebook ``kmeans_assign``'s FINAL assignment round uses:
    deterministic lowest-vec_id init + ``iters - 1`` decimal-exact Lloyd
    update rounds. Returned as a k-bounded LOCAL list (label, vector) —
    driver/broadcast-resident at any corpus scale, the trained coarse
    quantizer that plugs into :func:`semantic_dedup` / IVF so cell count
    scales with the corpus instead of being pinned to #labels."""
    if int(iters) < 1:
        raise ValueError(f"iters must be >= 1 (got {iters}): round 1 IS the assignment")
    normed = _as_double(embeddings).select("vec_id", "emb_d")
    init = normed.orderBy("vec_id").limit(k).collect()
    cents_local = [(j, [float(v) for v in r["emb_d"]]) for j, r in enumerate(init)]
    scaled = F.expr("CAST(floor(val * 1000000000 + 0.5) AS BIGINT)")
    for _ in range(int(iters) - 1):
        assigned = _broadcast_argmin_assign(normed, cents_local)
        means = (
            assigned.select("cluster", F.posexplode("emb_d").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(
                (F.sum(scaled).cast("double") / 1000000000.0 / F.count("*")).alias(
                    "mean_val"
                )
            )
            .groupBy("cluster")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(dim, mean_val))),"
                    " s -> s.mean_val)"
                ).alias("c_e")
            )
            .collect()
        )
        cents_local = sorted((int(r["cluster"]), [float(v) for v in r["c_e"]]) for r in means)
    return cents_local


def _broadcast_argmin_assign(
    normed: DataFrame, cents_local: list[tuple[int, list[float]]]
) -> DataFrame:
    """One Lloyd assignment round: nearest-centroid argmin as a per-row
    expression over ONE broadcast row of centroids, fused into the scan."""
    spark = normed.sparkSession
    cents_row = spark.createDataFrame(
        [(cents_local,)], "cents array<struct<c_label:int,c_e:array<double>>>"
    )
    best = F.expr(
        "array_min(transform(cents, c -> "
        f"struct({DIST2_EXPR.format(a='emb_d', b='c.c_e')} AS d2, c.c_label AS lbl)))"
    )
    return (
        normed.join(F.broadcast(cents_row))
        .withColumn("_best", best)
        .select(
            "vec_id",
            "emb_d",
            F.col("_best.lbl").alias("cluster"),
            F.col("_best.d2").alias("d2"),
        )
    )


def _kmeans_final_assign(embeddings: DataFrame, k: int, iters: int) -> DataFrame:
    normed = _as_double(embeddings).select("vec_id", "emb_d")
    return _broadcast_argmin_assign(normed, kmeans_codebook(embeddings, k, iters))


def ivfpq_topk(
    embeddings: DataFrame,
    query_pred: str,
    k: int = 3,
    m: int = 8,
) -> DataFrame:
    """IVF-PQ: coarse-quantizer cell restriction (IVF) composed with
    product-quantization ADC scoring — the production ANN shape (FAISS
    IVFPQ, non-residual variant: codes quantize the raw vector, cells only
    bound the candidate set).

    At 100 TB the corpus scan reads (cell, codes) — m+1 small ints per
    vector, never raw vectors; the per-query distance tables and cell ids
    ride in ONE broadcast; the only shuffle is the final per-query rank
    window. Recall dial: nprobe on the IVF side (here 1), m on the PQ side.

    Output: (query_id, neighbor_id, cell, approx_d2q, rank)."""
    sd = 64 // m
    subd2 = (
        f"aggregate(zip_with(slice(emb_d, m * {sd} + 1, {sd}),"
        f" slice(c.c_e, m * {sd} + 1, {sd}),"
        " (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    normed = with_norm(embeddings).select("vec_id", "emb_d")
    cents_row = _local_quantizer(embeddings)
    with_cents = normed.join(F.broadcast(cents_row))
    codes_expr = F.expr(
        f"transform(sequence(0, {m - 1}), m -> array_min(transform(cents, c ->"
        f" struct({subd2} AS d2, c.c_label AS lbl))).lbl)"
    )
    corpus = with_cents.select(
        "vec_id", _argmin_cell_expr().alias("cell"), codes_expr.alias("codes")
    )
    queries = with_cents.where(query_pred).select(
        F.col("vec_id").alias("query_id"),
        _argmin_cell_expr().alias("q_cell"),
        F.expr(
            f"transform(sequence(0, {m - 1}), m -> transform(cents, c ->"
            f" CAST(floor({subd2} * 1000000 + 0.5) AS BIGINT)))"
        ).alias("dtab"),
    )
    adc = (
        corpus.join(
            F.broadcast(queries),
            (F.col("cell") == F.col("q_cell")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cell",
            F.expr(
                f"aggregate(sequence(0, {m - 1}), 0L, (acc, m) -> acc +"
                " element_at(element_at(dtab, m + 1),"
                " element_at(codes, m + 1) + 1))"
            ).alias("approx_d2q"),
        )
    )
    w = W.partitionBy("query_id").orderBy("approx_d2q", "neighbor_id")
    return adc.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def knn_graph(
    embeddings: DataFrame, k: int = 3, nbits: int = 6, quant: int = 1_000_000
) -> DataFrame:
    """Approximate k-NN GRAPH construction — every vector's top-k cosine
    neighbors restricted to its sign-LSH bucket (the graph-build workload
    behind SemDeDup clustering / graph-based ANN indexes). Unlike
    :func:`signlsh_topk` (few queries, broadcast), here EVERY vector is a
    query, so the candidate generation is the bucket SELF-join: one hash
    shuffle on the bucket id co-locates each bucket, pair count is bounded
    per bucket (nbits is the dial), and the per-source rank window reuses
    the same partitioning. Vectors alone in their bucket emit no edges —
    the recall/coverage trade every bucketed ANN makes.

    Output: (src_id, dst_id, rank, score), rank ties broken by dst_id."""
    base = (
        with_norm(embeddings)
        .withColumn("bucket", F.expr(sign_bucket_expr("emb_d", nbits)))
        .select("vec_id", "emb_d", "norm", "bucket")
    )
    a = base.select(
        F.col("vec_id").alias("src_id"),
        F.col("emb_d").alias("a_emb"),
        F.col("norm").alias("a_norm"),
        "bucket",
    )
    b = base.select(
        F.col("vec_id").alias("dst_id"),
        F.col("emb_d").alias("b_emb"),
        F.col("norm").alias("b_norm"),
        "bucket",
    )
    scored = (
        a.join(b, on="bucket")
        .where(F.col("src_id") != F.col("dst_id"))
        .withColumn(
            "raw",
            F.expr(DOT_EXPR.format(a="a_emb", b="b_emb"))
            / (F.col("a_norm") * F.col("b_norm")),
        )
    )
    w = W.partitionBy("src_id").orderBy(F.col("raw").desc(), F.col("dst_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "src_id",
            "dst_id",
            "rank",
            (F.floor(F.col("raw") * quant + F.lit(0.5)) / quant).alias("score"),
        )
    )


def mips_topk(
    embeddings: DataFrame, query_pred: str, k: int = 5, quant: int = 1_000_000
) -> DataFrame:
    """Exact top-k MAXIMUM INNER PRODUCT search (MIPS) — the retrieval
    contract of dot-product-trained embedding models, distinct from cosine
    when vectors are unnormalized (a long vector can beat a better-aligned
    short one). Same scale shape as :func:`cosine_topk`: broadcast the tiny
    query set, stream the corpus, per-row sequential-fold dot product,
    per-query rank window. At index scale MIPS reduces to cosine by the
    norm-augmentation transform (append sqrt(M² − |x|²) to each corpus
    vector, 0 to queries) and then any cosine ANN (sign-LSH/IVF/PQ here)
    applies; this operator is the exact reference those indexes are measured
    against (sim_ann_recall pattern)."""
    base = _as_double(embeddings).select("vec_id", "emb_d")
    queries = base.where(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("emb_d").alias("q_emb")
    )
    pairs = base.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    scored = pairs.withColumn(
        "raw_score", F.expr(DOT_EXPR.format(a="q_emb", b="emb_d"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("raw_score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            (F.floor(F.col("raw_score") * quant + F.lit(0.5)) / quant).alias("score"),
        )
    )


def kcenter_select(
    embeddings: DataFrame, k: int = 5, quant: int = 1_000_000
) -> list[tuple[int, int, int]]:
    """Greedy k-center (Gonzalez farthest-point) coreset selection — the
    diversity-sampling primitive of data-selection pipelines.

    Seed = lowest vec_id; each of the k-1 following rounds broadcasts the
    chosen centers, folds them into ONE per-row min-distance array expression
    (floor-quantized integer distances so selection is bit-identical across
    engines), and takes a single distributed argmax with vec_id tie-break.
    All collects are k-bounded (one row per round); the scan side never moves.

    Returns ``[(rank, vec_id, dmin_q), ...]`` — at most k entries, fewer when
    the corpus is smaller than k, and ``[]`` for an empty corpus (mirroring a
    relational unroll whose seed CTE is empty).
    """
    e = _as_double(embeddings).select("vec_id", "emb_d")
    spark = e.sparkSession
    seed_rows = e.orderBy("vec_id").limit(1).collect()
    if not seed_rows:
        return []
    seed = seed_rows[0]
    centers = [(1, int(seed["vec_id"]), [float(v) for v in seed["emb_d"]], 0)]
    for r in range(2, k + 1):
        cents_row = spark.createDataFrame(
            [([c[2] for c in centers],)], "cents array<array<double>>"
        )
        dmin = F.expr(
            "array_min(transform(cents, c -> CAST(floor("
            + DIST2_EXPR.format(a="emb_d", b="c")
            + f" * {quant} + 0.5) AS BIGINT)))"
        )
        chosen = [c[1] for c in centers]
        rows = (
            e.where(~F.col("vec_id").isin(chosen))
            .join(F.broadcast(cents_row))
            .select("vec_id", "emb_d", dmin.alias("dmin"))
            .orderBy(F.desc("dmin"), "vec_id")
            .limit(1)
            .collect()
        )
        if not rows:  # corpus smaller than k
            break
        picked = rows[0]
        centers.append(
            (r, int(picked["vec_id"]), [float(v) for v in picked["emb_d"]],
             int(picked["dmin"]))
        )
    return [(r, v, d) for r, v, _, d in centers]


def binary_code_expr(col: str = "emb_d", dim: int = 64, word_bits: int = 32) -> str:
    """SQL expression packing a float vector's SIGN BITS into an
    ``array<bigint>`` of ``word_bits``-bit words (bit i of word w set iff
    element ``w*word_bits + i`` is >= 0). 32-bit words keep every value far
    from BIGINT's sign bit, so XOR/popcount below never touch overflow.

    One-bit quantization is the extreme memory point of the quantization
    ladder (int8 → PQ → binary): a 64-dim float32 vector becomes 8 bytes —
    32× smaller — and distance becomes XOR+popcount, which is why binary
    codes are the standard first-pass filter at billion-vector scale."""
    n_words = (dim + word_bits - 1) // word_bits
    words = []
    for w in range(n_words):
        lo = w * word_bits
        bits = " + ".join(
            f"(CASE WHEN element_at({col}, {lo + i + 1}) >= 0 THEN {1 << i}L ELSE 0L END)"
            for i in range(min(word_bits, dim - lo))
        )
        words.append(f"({bits})")
    return "array(" + ", ".join(words) + ")"


def hamming_topk(
    embeddings: DataFrame, query_pred: str, k: int = 5, dim: int = 64
) -> DataFrame:
    """Exact Hamming top-k over 1-bit sign codes — the binary-quantized
    retrieval pass (query set broadcast, corpus streamed, per-row XOR +
    popcount, per-query rank window). Same scale shape as
    :func:`cosine_topk`, but the scanned payload is 32× smaller and the
    per-pair cost is two ``bit_count`` instructions instead of a 64-term
    float dot product; at 100 TB this is the candidate generator whose
    survivors are re-ranked by the exact float score.

    Output: (query_id, neighbor_id, rank, hamming); ties broken by smaller
    hamming then neighbor_id."""
    base = _as_double(embeddings).select(
        "vec_id", F.expr(binary_code_expr("emb_d", dim)).alias("code")
    )
    queries = base.where(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("q_code")
    )
    pairs = base.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    scored = pairs.withColumn(
        "hamming",
        F.expr(
            "aggregate(zip_with(code, q_code, (a, b) -> bit_count(a ^ b)),"
            " 0, (acc, x) -> acc + x)"
        ),
    )
    w = W.partitionBy("query_id").orderBy("hamming", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", "hamming")
    )


def triangle_count(edges_directed: DataFrame) -> DataFrame:
    """Per-node triangle counts on an undirected graph given as directed
    edges (e.g. the k-NN graph) — the clustering-coefficient / community-
    density primitive.

    The classic distributed shape (MR "node-iterator++"): symmetrize +
    dedupe, then ORIENT every edge from its lower-(degree, id) endpoint to
    the higher one. Orientation makes the edge relation a DAG in which each
    triangle appears as exactly ONE wedge (two out-edges of its smallest
    node) plus one closing edge, so the count is wedge ⋈ edge — and because
    out-degrees under degree-ordering are bounded by O(sqrt(|E|)), the wedge
    fan-out that would explode on skewed hubs stays bounded; this is why the
    orientation is by (degree, id), not just id. Both joins shuffle on node
    keys only; nothing is ever collected.

    Output: (vec_id, n_tri) for every node in ≥1 triangle."""
    und = (
        edges_directed.select(
            F.least("src_id", "dst_id").alias("u"),
            F.greatest("src_id", "dst_id").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    # total order key: degree-major, id-minor (ids are distinct, so no ties).
    # A STRUCT, not a packed BIGINT: struct comparison is lexicographic in
    # Spark, so the ordering is exact for the full 64-bit id range (packing
    # deg*1e10+n would silently corrupt the order once ids reach 1e10 —
    # ADVICE r4).
    okey = F.struct(F.col("deg").alias("d"), F.col("n").alias("i")).alias("okey")
    keyed = deg.select("n", okey)
    oriented = (
        und.join(keyed.withColumnRenamed("n", "u").withColumnRenamed("okey", "ku"), "u")
        .join(keyed.withColumnRenamed("n", "v").withColumnRenamed("okey", "kv"), "v")
        .select(
            F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(F.col("ku") < F.col("kv"), F.col("kv")).otherwise(F.col("ku")).alias("kb_"),
            F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("b"),
        )
        .select("a", "b", F.col("kb_").alias("kb"))
    )
    # oriented is referenced three times below (both wedge legs + the closing
    # edge); persist so the upstream edge derivation (e.g. the k-NN graph)
    # runs once, not once per reference — |E| rows, tiny next to the input
    oriented = oriented.persist()
    e1 = oriented.select(F.col("a").alias("x"), F.col("b").alias("y"), F.col("kb").alias("ky"))
    e2 = oriented.select(F.col("a").alias("x"), F.col("b").alias("z"), F.col("kb").alias("kz"))
    wedges = e1.join(e2, "x").where(F.col("ky") < F.col("kz"))
    closing = oriented.select(F.col("a").alias("y"), F.col("b").alias("z"))
    tris = wedges.join(closing, ["y", "z"]).select("x", "y", "z")
    # one reference to tris: explode the three corners instead of a 3-arm union
    return (
        tris.select(F.explode(F.array("x", "y", "z")).alias("vec_id"))
        .groupBy("vec_id")
        .agg(F.count("*").alias("n_tri"))
    )


# ------------------------------------------------- covariance / PCA whitening

def embed_covariance_moments(
    embeddings: DataFrame, dim: int = 64, quant: int = 1000
) -> DataFrame:
    """Integer-exact covariance moments of the embedding matrix in ONE pass —
    the mergeable-summaries shape: each partition folds its rows into a d×d
    Gram matrix + per-dimension sums + a count with one numpy matmul inside
    one Arrow crossing (summary size d², independent of rows), and the tiny
    summaries merge by addition. The raw vectors never shuffle.

    Elements are floor-quantized (``round(x * quant)`` as int64) so every
    moment is an exact integer — bit-identical across engines and partition
    layouts (float summation order can never leak in).

    Output rows (1-indexed dims): (i, j, v) where
      (i >= 1, j >= i)  v = Σ x_qi · x_qj   (upper-triangle Gram)
      (i >= 1, j = 0)   v = Σ x_qi          (first moments)
      (i = 0, j = 0)    v = n               (row count)

    int64 headroom: |x_q| ≤ quant·max|x|; Gram entries grow ∝ n and the
    n-scaled covariance in :func:`embed_covariance` ∝ n² — ample through
    bench scales (~1e17 at sf0.1 with quant=1000); for a 100 TB corpus run
    per-shard moments and combine as floats (means/covariances are exactly
    mergeable from these summaries).
    """
    import numpy as np
    import pandas as pd

    e = embeddings.select(
        F.expr(f"transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * {quant} + 0.5) AS BIGINT))").alias("xq")
    ).where(F.size("xq") == dim)

    iu, ju = np.triu_indices(dim)

    def part(batches):
        g = np.zeros((dim, dim), dtype=np.int64)
        s = np.zeros(dim, dtype=np.int64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["xq"].to_numpy()).astype(np.int64)
            g += x.T @ x
            s += x.sum(axis=0)
            n += len(x)
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "i": np.concatenate([iu + 1, np.arange(1, dim + 1), [0]]),
                "j": np.concatenate([ju + 1, np.zeros(dim, dtype=np.int64), [0]]),
                "v": np.concatenate([g[iu, ju], s, [n]]),
            }
        )

    return (
        e.mapInPandas(part, schema="i int, j int, v long")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
    )


def embed_covariance(
    embeddings: DataFrame, dim: int = 64, quant: int = 1000
) -> DataFrame:
    """Exact integer n²-scaled covariance: for 1 ≤ i ≤ j ≤ d,
    ``cov_num = n·Σx_i x_j − (Σx_i)(Σx_j)`` over the quantized elements
    (= n² · cov · quant², every factor an exact integer). The moment table is
    d²-bounded, so the final reshape is broadcast joins over ~d²/2 rows."""
    # the moment table is referenced four times below (count, two first-moment
    # legs, Gram); persist so the corpus pass runs once — d² rows cached
    m = embed_covariance_moments(embeddings, dim=dim, quant=quant).persist()
    n_row = m.where("i = 0 AND j = 0").select(F.col("v").alias("n"))
    firsts = m.where("i >= 1 AND j = 0").select(F.col("i").alias("d"), F.col("v").alias("s"))
    gram = m.where("j >= 1")
    return (
        gram.join(F.broadcast(n_row))
        .join(F.broadcast(firsts.withColumnsRenamed({"d": "i", "s": "si"})), "i")
        .join(F.broadcast(firsts.withColumnsRenamed({"d": "j", "s": "sj"})), "j")
        .select(
            "i", "j",
            (F.col("n") * F.col("v") - F.col("si") * F.col("sj")).alias("cov_num"),
        )
    )


def pca_whiten(
    embeddings: DataFrame, k: int = 8, dim: int = 64, quant: int = 1000,
    eps: float = 1e-9,
) -> DataFrame:
    """PCA whitening — project each embedding onto the top-k principal
    components scaled to unit variance (the decorrelation step ahead of
    quantization / semantic clustering).

    Scale shape: the covariance comes from :func:`embed_covariance_moments`
    (one pass, d²-bounded summaries); the eigendecomposition runs driver-side
    on the d×d matrix (numpy, microseconds — NOT data-sized); the (mean, W)
    projection broadcasts back as one literal row and the projection itself
    is a per-row JVM expression fused into the scan. Sign convention: each
    eigenvector's largest-|coordinate| entry is made positive, so the output
    is deterministic across LAPACK builds.

    Output: (vec_id, y array<double>[k]).
    """
    import numpy as np

    mrows = embed_covariance_moments(embeddings, dim=dim, quant=quant).collect()
    n = next(r["v"] for r in mrows if r["i"] == 0)
    s = np.zeros(dim)
    g = np.zeros((dim, dim))
    for r in mrows:
        if r["i"] >= 1 and r["j"] == 0:
            s[r["i"] - 1] = r["v"]
        elif r["j"] >= 1:
            g[r["i"] - 1, r["j"] - 1] = r["v"]
            g[r["j"] - 1, r["i"] - 1] = r["v"]
    mean = s / n / quant
    cov = (g / n - np.outer(s, s) / n / n) / (quant * quant)
    vals, vecs = np.linalg.eigh(cov)   # ascending
    order = np.argsort(vals)[::-1][:k]
    vals, vecs = vals[order], vecs[:, order]
    flip = np.sign(vecs[np.abs(vecs).argmax(axis=0), np.arange(vecs.shape[1])])
    vecs = vecs * flip
    w = vecs / np.sqrt(np.maximum(vals, 0.0) + eps)   # d × k

    spark = embeddings.sparkSession
    proj_row = spark.createDataFrame(
        [([float(v) for v in mean], [[float(x) for x in w[:, j]] for j in range(w.shape[1])])],
        "mu array<double>, w array<array<double>>",
    )
    comp = F.expr(
        "transform(w, col -> aggregate("
        "zip_with(emb_raw, zip_with(mu, col, (m, c) -> struct(m AS m, c AS c)),"
        " (x, mc) -> (x - mc.m) * mc.c),"
        " 0D, (acc, t) -> acc + t))"
    )
    return (
        embeddings.select(
            "vec_id",
            F.expr("transform(embedding, v -> CAST(v AS DOUBLE))").alias("emb_raw"),
        )
        .join(F.broadcast(proj_row))
        .select("vec_id", comp.alias("y"))
    )


# ------------------------------------------------- PQ codebook training

def pq_train_codebooks(
    embeddings: DataFrame, m: int = 4, k: int = 4, iters: int = 2,
    dim: int = 64,
) -> list[list[tuple[int, list[float]]]]:
    """TRAIN the product-quantization codebooks: an independent k-means per
    subspace slice (the production PQ recipe — label-centroid slices are the
    deterministic stand-in `pq_adc_topk` defaults to; this is the trained
    upgrade, exactly as `kmeans_codebook` upgrades the SemDeDup quantizer).

    All ``m`` subspaces train SIMULTANEOUSLY: each Lloyd round is ONE corpus
    pass — per-row argmin against every subspace's broadcast codebook, one
    (subspace, cluster, dim) decimal-exact mean aggregation (k·m·(dim/m)
    output rows), one k·m-bounded collect. Deterministic init: subspace
    slices of the ``k`` lowest-vec_id vectors. Clusters that lose all
    members drop out of the codebook (mirrored by the SQL oracle).

    Returns ``[subspace][(label, subvector)]`` — driver/broadcast-resident
    at any corpus scale."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sd = dim // m
    e = _as_double(embeddings).select("vec_id", "emb_d")
    init = e.orderBy("vec_id").limit(k).collect()
    cbs: list[list[tuple[int, list[float]]]] = [
        [
            (j, [float(v) for v in r["emb_d"]][s * sd : (s + 1) * sd])
            for j, r in enumerate(init)
        ]
        for s in range(m)
    ]
    for _ in range(int(iters) - 1):
        asg = _pq_assign(e, cbs, sd)
        scaled = F.expr("CAST(floor(val * 1000000000 + 0.5) AS BIGINT)")
        means = (
            asg.select("codes", F.posexplode("emb_d").alias("dim0", "val"))
            .select(
                (F.col("dim0") / sd).cast("int").alias("s"),
                (F.col("dim0") % sd).alias("dim"),
                F.expr(f"element_at(codes, CAST(dim0 / {sd} AS INT) + 1)").alias("cluster"),
                "val",
            )
            .groupBy("s", "cluster", "dim")
            .agg(
                (F.sum(scaled).cast("double") / 1000000000.0 / F.count("*")).alias(
                    "mean_val"
                )
            )
            .groupBy("s", "cluster")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(dim, mean_val))),"
                    " t -> t.mean_val)"
                ).alias("c_e")
            )
            .collect()
        )
        cbs = [
            sorted(
                (int(r["cluster"]), [float(v) for v in r["c_e"]])
                for r in means
                if r["s"] == s
            )
            for s in range(m)
        ]
    return cbs


def _pq_assign(
    e: DataFrame, cbs: list[list[tuple[int, list[float]]]], sd: int
) -> DataFrame:
    """One PQ assignment pass: per-row, per-subspace argmin over the
    broadcast codebooks. Adds ``codes`` (array<int>, by subspace) and
    ``subd2`` (array<double>, the winning squared distances)."""
    spark = e.sparkSession
    cb_row = spark.createDataFrame(
        [([(s, [(lbl, ce) for lbl, ce in cb] ) for s, cb in enumerate(cbs)],)],
        "cbs array<struct<s:int,cs:array<struct<lbl:int,ce:array<double>>>>>",
    )
    subd2 = (
        f"aggregate(zip_with(slice(emb_d, cb.s * {sd} + 1, {sd}), c.ce,"
        " (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    best = F.expr(
        f"transform(cbs, cb -> array_min(transform(cb.cs, c ->"
        f" struct({subd2} AS d2, c.lbl AS lbl))))"
    )
    return (
        e.join(F.broadcast(cb_row))
        .withColumn("_best", best)
        .select(
            "vec_id",
            "emb_d",
            F.expr("transform(_best, b -> b.lbl)").alias("codes"),
            F.expr("transform(_best, b -> b.d2)").alias("subd2"),
        )
    )


def pq_train_encode(
    embeddings: DataFrame, m: int = 4, k: int = 4, iters: int = 2,
    dim: int = 64, quant: int = 1_000_000,
) -> DataFrame:
    """Train the PQ codebooks, then encode the corpus against them: one row
    per (vec_id, subspace) with the assigned code and the floor-quantized
    squared subspace distortion. The codes are what a 100 TB ANN system
    persists (m bytes per vector); the distortion column is the training
    quality signal (sums to the k-means objective)."""
    sd = dim // m
    cbs = pq_train_codebooks(embeddings, m=m, k=k, iters=iters, dim=dim)
    e = _as_double(embeddings).select("vec_id", "emb_d")
    asg = _pq_assign(e, cbs, sd)
    return asg.select(
        "vec_id",
        F.posexplode("codes").alias("subspace", "code"),
        F.expr(
            f"CAST(floor(element_at(subd2, CAST(subspace AS INT) + 1) * {quant}"
            " + 0.5) AS BIGINT)"
        ).alias("subd2_micro"),
    ).select("vec_id", "subspace", "code", "subd2_micro")


def pq_trained_adc_topk(
    embeddings: DataFrame,
    query_pred: str,
    k: int = 3,
    m: int = 4,
    kc: int = 4,
    iters: int = 2,
    dim: int = 64,
    quant: int = 1_000_000,
) -> DataFrame:
    """ADC top-k over TRAINED per-subspace codebooks — `pq_adc_topk` with
    :func:`pq_train_codebooks` in place of the label-centroid-slice stand-in
    (the production composition: train, encode, scan codes, score by table
    lookups). Codebooks are densified to positional labels so a corpus code
    IS the distance-table index; the corpus scan reads m small codes per
    vector and each query ships one m×kc integer table in the broadcast.

    Output: (query_id, neighbor_id, approx_d2q, rank)."""
    sd = dim // m
    cbs = pq_train_codebooks(embeddings, m=m, k=kc, iters=iters, dim=dim)
    # dense positional labels (sorted original-label order preserved, so the
    # (d2, lbl) argmin picks the same winner): code == table index
    cbs = [[(i, vec) for i, (_lbl, vec) in enumerate(cb)] for cb in cbs]
    e = _as_double(embeddings).select("vec_id", "emb_d")
    corpus = _pq_assign(e, cbs, sd).select("vec_id", "codes")
    spark = e.sparkSession
    cb_row = spark.createDataFrame(
        [([(s, [(lbl, ce) for lbl, ce in cb]) for s, cb in enumerate(cbs)],)],
        "cbs array<struct<s:int,cs:array<struct<lbl:int,ce:array<double>>>>>",
    )
    subd2 = (
        f"aggregate(zip_with(slice(emb_d, cb.s * {sd} + 1, {sd}), c.ce,"
        " (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    queries = (
        e.where(query_pred)
        .join(F.broadcast(cb_row))
        .select(
            F.col("vec_id").alias("query_id"),
            F.expr(
                f"transform(cbs, cb -> transform(cb.cs, c ->"
                f" CAST(floor({subd2} * {quant} + 0.5) AS BIGINT)))"
            ).alias("dtab"),
        )
    )
    adc = (
        corpus.join(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(
                f"aggregate(sequence(0, {m - 1}), 0L, (acc, s) -> acc +"
                " element_at(element_at(dtab, s + 1),"
                " element_at(codes, s + 1) + 1))"
            ).alias("approx_d2q"),
        )
    )
    w = W.partitionBy("query_id").orderBy("approx_d2q", "neighbor_id")
    return adc.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
