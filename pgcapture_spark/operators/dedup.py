"""Deduplication operators for training-data pipelines: exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design notes (the part that matters at 100 TB):

- exact dedup is a single hash-aggregate on a digest — the canonical
  group-by-md5 shape; Catalyst does map-side partial aggregation.
- n-gram Jaccard restricts the candidate join to shingles with bounded
  document frequency (stop-shingle pruning) — without it the self-join on a
  common shingle is quadratic in its df. The threshold is a tunable; the
  verification step computes TRUE Jaccard over full shingle sets only for the
  surviving candidate pairs.
- MinHash+LSH is the scale path: O(docs × k) signature computation (per-row
  array expressions, no shuffle), then banding turns near-dup search into an
  equi-join on (band, band_hash) — the classic shingle→minhash→band→bucket
  pipeline, entirely in built-in expressions (md5 as the hash family:
  min(md5(i || shingle)) over the shingle set).
- SimHash packs each doc into one 32-bit value; candidate pairs come from a
  cheap equality/banding join, verified by bit_count(xor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgcapture_spark.operators.textstats import shingle_rows, with_tokens


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups on normalized text (md5 digest group-by);
    canonical id = min doc_id."""
    return (
        docs.select("doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_docs"))
    )


def shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) distinct pairs."""
    return shingle_rows(docs).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.1, max_df: int = 64
) -> DataFrame:
    """Near-dup pairs by true Jaccard over 3-gram shingle sets.

    Candidates = pairs sharing at least one shingle whose document frequency is
    in [2, max_df] (stop-shingle pruning bounds the self-join blow-up); then
    true Jaccard on the full sets, kept at >= threshold.
    """
    s = shingle_sets(docs).cache()
    df_counts = s.groupBy("shingle").agg(F.count("*").alias("df"))
    rare = s.join(
        df_counts.where((F.col("df") >= 2) & (F.col("df") <= max_df)), "shingle"
    ).select("doc_id", "shingle")
    pairs = (
        rare.alias("a")
        .join(rare.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    sizes = s.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    inter = (
        pairs.join(s.alias("sa"), F.col("a_id") == F.col("sa.doc_id"))
        .join(
            s.alias("sb"),
            (F.col("b_id") == F.col("sb.doc_id")) & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("inter_cnt"))
    )
    out = (
        inter.join(sizes.alias("na"), F.col("a_id") == F.col("na.doc_id"))
        .join(sizes.alias("nb"), F.col("b_id") == F.col("nb.doc_id"))
        .select(
            "a_id",
            "b_id",
            "inter_cnt",
            (F.col("na.n_shingles") + F.col("nb.n_shingles") - F.col("inter_cnt")).alias(
                "union_cnt"
            ),
        )
        .withColumn("jaccard", F.col("inter_cnt") / F.col("union_cnt"))
    )
    return out.where(F.col("jaccard") >= threshold)


def minhash_signatures(docs: DataFrame, k: int = 8) -> DataFrame:
    """k-permutation MinHash signature: sig_i = min over shingles of
    md5(i || '|' || shingle). Per-row array expressions only — no shuffle.

    Built from shingle ROWS with a map-side-combinable min aggregate (min over
    duplicate shingles == min over the set). Docs with zero shingles simply
    have no signature row and drop out of the bucket equi-join."""
    rows = shingle_rows(docs)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"sig_{i}")
        for i in range(k)
    ]
    return rows.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame, k: int = 8, bands: int = 4, threshold: float = 0.1
) -> DataFrame:
    """LSH banding over MinHash signatures: docs sharing any band bucket are
    candidates; verified by true Jaccard >= threshold. Returns
    (a_id, b_id, est_sim, jaccard)."""
    rows_per_band = k // bands
    sigs = minhash_signatures(docs, k)
    band_cols = []
    for b in range(bands):
        parts = [f"sig_{b * rows_per_band + r}" for r in range(rows_per_band)]
        band_cols.append(F.md5(F.concat_ws("|", *parts)).alias(f"band_{b}"))
    banded = sigs.select("doc_id", *[f"sig_{i}" for i in range(k)], *band_cols)

    buckets = None
    for b in range(bands):
        part = banded.select(
            "doc_id", F.lit(b).alias("band_idx"), F.col(f"band_{b}").alias("band_hash")
        )
        buckets = part if buckets is None else buckets.unionByName(part)
    cand = (
        buckets.alias("a")
        .join(buckets.alias("b"), ["band_idx", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    # estimated similarity = fraction of agreeing signature components
    est = cand.join(sigs.alias("sa"), F.col("a_id") == F.col("sa.doc_id")).join(
        sigs.alias("sb"), F.col("b_id") == F.col("sb.doc_id")
    )
    agree = sum(
        F.when(F.col(f"sa.sig_{i}") == F.col(f"sb.sig_{i}"), 1).otherwise(0) for i in range(k)
    )
    est = est.select("a_id", "b_id", (agree / F.lit(k)).alias("est_sim"))

    s = shingle_sets(docs)
    sizes = s.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    inter = (
        est.join(s.alias("sa2"), F.col("a_id") == F.col("sa2.doc_id"))
        .join(
            s.alias("sb2"),
            (F.col("b_id") == F.col("sb2.doc_id"))
            & (F.col("sa2.shingle") == F.col("sb2.shingle")),
        )
        .groupBy("a_id", "b_id", "est_sim")
        .agg(F.count("*").alias("inter_cnt"))
    )
    out = (
        inter.join(sizes.alias("za"), F.col("a_id") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("b_id") == F.col("zb.doc_id"))
        .select(
            "a_id",
            "b_id",
            "est_sim",
            (
                F.col("inter_cnt")
                / (F.col("za.n_shingles") + F.col("zb.n_shingles") - F.col("inter_cnt"))
            ).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= threshold)


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """32-bit SimHash over token hashes: per-bit majority vote of
    conv(md5(token)[0:8], 16, 10). One explode + one aggregate (map-side
    combinable) — scales linearly."""
    toks = with_tokens(docs).select("doc_id", F.explode("tokens").alias("token"))
    toks = toks.withColumn(
        "th", F.expr("CAST(conv(substring(md5(token), 1, 8), 16, 10) AS BIGINT)")
    )
    votes = [
        F.sum(F.expr(f"CASE WHEN (shiftright(th, {b}) & 1) = 1 THEN 1 ELSE -1 END")).alias(
            f"v_{b}"
        )
        for b in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    value = None
    for b in range(bits):
        term = F.when(F.col(f"v_{b}") >= 0, F.lit(1 << b).cast("bigint")).otherwise(F.lit(0))
        value = term if value is None else (value + term)
    return agg.select("doc_id", value.alias("simhash"))
