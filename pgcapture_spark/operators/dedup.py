"""Deduplication operators for training-data pipelines: exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design notes (the part that matters at 100 TB):

- exact dedup is a single hash-aggregate on a digest — the canonical
  group-by-md5 shape; Catalyst does map-side partial aggregation.
- everything shingle-based starts from PER-ROW ARRAYS (textstats.SHINGLES_EXPR
  — zip_with over token slices): signature computation is a projection fused
  into the parquet scan, zero shuffles. The only shuffles left are the ones
  the algorithms *require*: the candidate equi-join (on a rare shingle or an
  LSH bucket) and its dedup.
- true-Jaccard verification is ``size(array_intersect(a_set, b_set))`` on the
  candidate pairs — per-row, replacing the explode + shingle-equi-join +
  two groupBys of the naive formulation. Doc shingle-set arrays join onto the
  (small) candidate-pair set; AQE broadcasts the side that is small.
- n-gram Jaccard restricts the candidate join to shingles with bounded
  document frequency (stop-shingle pruning) — without it the self-join on a
  common shingle is quadratic in its df.
- MinHash+LSH is the scale path: O(docs × k) signature computation, then
  banding turns near-dup search into an equi-join on (band, band_hash) — the
  classic shingle→minhash→band→bucket pipeline, entirely in built-in
  expressions (md5 as the hash family: min(md5(i || shingle))).
- SimHash packs each doc into one 32-bit value — a single projection;
  near-dups pair via bit_count(xor) downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgcapture_spark.operators.textstats import with_shingles, with_tokens


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups on normalized text (md5 digest group-by);
    canonical id = min doc_id."""
    return (
        docs.select("doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_docs"))
    )


def shingle_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, sh_set) — per-doc DISTINCT shingle array (per-row
    array_distinct, no shuffle). Docs with < 3 tokens are dropped, matching
    the row formulation where they produce no shingle rows."""
    return (
        with_shingles(docs)
        .where(F.size("shingles") > 0)
        .select("doc_id", F.array_distinct("shingles").alias("sh_set"))
    )


def shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) distinct pairs — explode of the per-doc set."""
    return shingle_docs(docs).select("doc_id", F.explode("sh_set").alias("shingle"))


def _jaccard_verify(pairs: DataFrame, sets: DataFrame, extra: list[str]) -> DataFrame:
    """Attach per-row true Jaccard to candidate (a_id, b_id) pairs via
    array_intersect on the per-doc shingle sets."""
    out = (
        pairs.join(sets.select(F.col("doc_id").alias("a_id"), F.col("sh_set").alias("_sa")), "a_id")
        .join(sets.select(F.col("doc_id").alias("b_id"), F.col("sh_set").alias("_sb")), "b_id")
        .withColumn("inter_cnt", F.size(F.array_intersect("_sa", "_sb")).cast("long"))
        .withColumn(
            "union_cnt",
            (F.size("_sa") + F.size("_sb")).cast("long") - F.col("inter_cnt"),
        )
        .withColumn("jaccard", F.col("inter_cnt") / F.col("union_cnt"))
    )
    return out.select("a_id", "b_id", *extra, "inter_cnt", "union_cnt", "jaccard")


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.1, max_df: int = 64
) -> DataFrame:
    """Near-dup pairs by true Jaccard over 3-gram shingle sets.

    Candidates = pairs sharing at least one shingle whose document frequency is
    in [2, max_df] (stop-shingle pruning bounds the self-join blow-up); then
    true Jaccard on the full sets (array_intersect, per-row), kept at
    >= threshold."""
    sets = shingle_docs(docs).cache()
    s = sets.select("doc_id", F.explode("sh_set").alias("shingle"))
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
    out = _jaccard_verify(pairs, sets, extra=[])
    return out.where(F.col("jaccard") >= threshold)


# MinHash = 2-universal linear probes over ONE md5-derived base hash per
# shingle: h = first 8 md5 hex digits mod 2^30, sig_i = min((a_i·h + b_i) mod p)
# with p = 2^31 − 1. One md5 per shingle instead of k; products stay < 2^60 so
# the bigint arithmetic is wrap-free and identical in Spark and DuckDB.
MINHASH_P = 2_147_483_647
_H30 = 1 << 30
BASE_HASH_EXPR = (
    "transform(shingles, s -> CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT) % {m})"
).format(m=_H30)


def minhash_ab(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) probe constants, 0 < a_i, b_i < 2^30."""
    return [
        ((2_654_435_761 * (i + 1)) % (_H30 - 1) + 1, (40_503 * (i + 7)) % _H30)
        for i in range(k)
    ]


def _sig_cols(k: int, hashes_col: str = "_hs") -> list:
    return [
        F.expr(f"array_min(transform({hashes_col}, h -> ({a} * h + {b}) % {MINHASH_P}))").alias(
            f"sig_{i}"
        )
        for i, (a, b) in enumerate(minhash_ab(k))
    ]


def minhash_signatures(docs: DataFrame, k: int = 8) -> DataFrame:
    """k-permutation MinHash signature: sig_i = min over shingles of the i-th
    universal-hash probe. Pure per-row array expressions — a projection fused
    into the scan, NO shuffle (min over duplicate shingles == min over the
    set). Docs with zero shingles are dropped."""
    return (
        with_shingles(docs)
        .where(F.size("shingles") > 0)
        .withColumn("_hs", F.expr(BASE_HASH_EXPR))
        .select("doc_id", *_sig_cols(k))
    )


def minhash_lsh_pairs(
    docs: DataFrame, k: int = 8, bands: int = 4, threshold: float = 0.1
) -> DataFrame:
    """LSH banding over MinHash signatures: docs sharing any band bucket are
    candidates; verified by true Jaccard >= threshold. Returns
    (a_id, b_id, est_sim, jaccard).

    Plan shape: ONE projection computes signatures + shingle set per doc
    (cached — it is tiny relative to the corpus: k ints + the set per doc);
    bands explode 1→bands rows; the bucket equi-join on (band_idx, band_hash)
    is the only required shuffle; candidate pairs pull BOTH the signature and
    the shingle set in a single join per side (two joins total), then est_sim
    and true Jaccard are per-row expressions on the joined pair rows."""
    rows_per_band = k // bands
    # plan-audit note: this subtree is referenced four times (bucket self-
    # join sides + both signature legs) and so re-scans the corpus four
    # times. Measured at sf0.1: caching it (or the exploded shingle rows in
    # the truth arm) is 15-40% SLOWER than the re-derivations — whole-stage
    # codegen pipelines shingle+minhash faster than cache materialize +
    # InMemoryTableScan can replay it. Eval harness is sample-scale by
    # contract, so corpus-sized re-scans are bounded by the sample.
    base = (
        with_shingles(docs)
        .where(F.size("shingles") > 0)
        .withColumn("_hs", F.expr(BASE_HASH_EXPR))
        .select("doc_id", F.array_distinct("shingles").alias("sh_set"), *_sig_cols(k))
        .cache()
    )
    band_hashes = F.array(
        *[
            F.md5(
                F.concat_ws("|", *[f"sig_{b * rows_per_band + r}" for r in range(rows_per_band)])
            )
            for b in range(bands)
        ]
    )
    buckets = base.select(
        "doc_id", F.posexplode(band_hashes).alias("band_idx", "band_hash")
    )
    cand = (
        buckets.alias("a")
        .join(buckets.alias("b"), ["band_idx", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    a_side = base.select(
        F.col("doc_id").alias("a_id"),
        F.col("sh_set").alias("_sa"),
        *[F.col(f"sig_{i}").alias(f"_sa_{i}") for i in range(k)],
    )
    b_side = base.select(
        F.col("doc_id").alias("b_id"),
        F.col("sh_set").alias("_sb"),
        *[F.col(f"sig_{i}").alias(f"_sb_{i}") for i in range(k)],
    )
    paired = (
        cand.join(a_side, "a_id")
        .join(b_side, "b_id")
        .withColumn(
            "est_sim",
            sum(
                F.when(F.col(f"_sa_{i}") == F.col(f"_sb_{i}"), 1).otherwise(0) for i in range(k)
            )
            / F.lit(k),
        )
        .withColumn("inter_cnt", F.size(F.array_intersect("_sa", "_sb")).cast("long"))
        .withColumn(
            "union_cnt",
            (F.size("_sa") + F.size("_sb")).cast("long") - F.col("inter_cnt"),
        )
        .withColumn("jaccard", F.col("inter_cnt") / F.col("union_cnt"))
    )
    return paired.where(F.col("jaccard") >= threshold).select(
        "a_id", "b_id", "est_sim", "jaccard"
    )


def connected_components(nodes: DataFrame, edges: DataFrame, max_iters: int = 25) -> DataFrame:
    """Min-label propagation over an undirected edge list: every node ends up
    labeled with the smallest node id reachable from it. Input: ``nodes``
    (doc_id), ``edges`` (a_id, b_id). Output: (doc_id, canonical_id) —
    singletons map to themselves.

    Each round is one shuffle (neighbor-min groupBy) + one join; labels are
    monotonically non-increasing ints, so the label SUM is a convergence
    certificate — checked every SECOND round (labels only shrink, so a
    skipped check can never miss convergence, it just runs one extra cheap
    round; halves the scalar-action job count). Rounds needed = graph
    diameter — near-dup clusters are shallow (chains of a few docs), so this
    converges in a handful of rounds; an adversarially deep graph would call
    for large-star/small-star halving instead. localCheckpoint truncates the
    growing lineage each round (the iterative-algorithm standard)."""
    sym = edges.selectExpr("a_id AS src", "b_id AS dst").unionAll(
        edges.selectExpr("b_id AS src", "a_id AS dst")
    )
    labels = nodes.select(F.col("doc_id"), F.col("doc_id").alias("lbl"))
    prev_sum = None
    for i in range(max_iters):
        labels = labels.localCheckpoint(eager=True)
        if i % 2 == 0:
            cur_sum = labels.agg(F.sum("lbl")).first()[0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        nbr_min = (
            sym.join(labels, sym.src == labels.doc_id)
            .groupBy("dst")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        labels = (
            labels.join(nbr_min, labels.doc_id == nbr_min.dst, "left")
            .select(
                "doc_id",
                F.least(F.col("lbl"), F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
            )
        )
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iters} rounds")
    return labels.select("doc_id", F.col("lbl").alias("canonical_id"))


def near_dup_clusters(docs: DataFrame, threshold: float = 0.1) -> DataFrame:
    """Near-duplicate clusters: MinHash+LSH pairs → connected components →
    (doc_id, canonical_id, cluster_size). The full-pipeline dedup op: what a
    training-data run uses to keep ONE representative per duplicate group."""
    pairs = minhash_lsh_pairs(docs, threshold=threshold).select("a_id", "b_id")
    comp = connected_components(docs.select("doc_id"), pairs)
    sizes = comp.groupBy("canonical_id").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "canonical_id").select("doc_id", "canonical_id", "cluster_size")


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """32-bit SimHash over token hashes: per-bit majority vote of
    conv(md5(token)[0:8], 16, 10). Pure per-row expressions (transform +
    aggregate over the token array) — a single projection, zero shuffles,
    scales linearly. Docs with zero tokens are dropped (parity with the
    row/groupBy formulation)."""
    t = (
        with_tokens(docs)
        .where(F.size("tokens") > 0)
        .withColumn(
            "_ths",
            F.expr("transform(tokens, t -> CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT))"),
        )
    )
    votes = [
        F.expr(
            f"aggregate(_ths, 0, (acc, h) -> acc + "
            f"(CASE WHEN (shiftright(h, {b}) & 1) = 1 THEN 1 ELSE -1 END))"
        ).alias(f"v_{b}")
        for b in range(bits)
    ]
    agg = t.select("doc_id", *votes)
    value = None
    for b in range(bits):
        term = F.when(F.col(f"v_{b}") >= 0, F.lit(1 << b).cast("bigint")).otherwise(F.lit(0))
        value = term if value is None else (value + term)
    return agg.select("doc_id", value.alias("simhash"))


def connected_components_star(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = 30
) -> DataFrame:
    """Alternating large-star / small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
    depth-robust alternative to min-label propagation: rounds needed are
    O(log n) on ANY graph, where propagation needs graph-diameter rounds
    (a 200-deep chain converges here in ~6 rounds vs 200).

    Spark shape: each half-round is ONE min-aggregate on the node key plus
    one join back — no collect_set, so a high-degree node never materializes
    its neighbor list on a single executor; edges stay (hi, lo)-normalized
    and distinct. Convergence certificate = (edge count, hash sum), one
    scalar action per round; localCheckpoint truncates lineage.

    Returns (doc_id, canonical_id) with canonical = component minimum;
    singletons map to themselves."""
    e = (
        edges.selectExpr("a_id AS a", "b_id AS b")
        .where("a <> b")
        .selectExpr("greatest(a, b) AS hi", "least(a, b) AS lo")
        .distinct()
    )
    prev_cert = None
    for _ in range(max_rounds):
        e = e.localCheckpoint(eager=True)
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.hash("hi", "lo").cast("long")), F.lit(0)).alias("h"),
        ).first()
        cert = (row["n"], row["h"])
        if cert == prev_cert:
            break
        prev_cert = cert
        # large-star: connect every strictly-larger neighbor of u to
        # min(N(u) ∪ {u})
        sym = e.selectExpr("hi AS u", "lo AS v").unionAll(
            e.selectExpr("lo AS u", "hi AS v")
        )
        lm = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", F.col("u")).alias("m"))
        )
        e1 = (
            sym.where("v > u")
            .join(lm, on="u")
            .selectExpr("v AS hi", "m AS lo")  # m <= u < v, already normalized
            .where("hi <> lo")
            .distinct()
        )
        # small-star: connect every smaller-or-equal neighbor of u (and u
        # itself) to min(N<=(u) ∪ {u})
        sm = (
            e1.groupBy("hi")
            .agg(F.min("lo").alias("ml"))
            .select("hi", F.least("ml", F.col("hi")).alias("m"))
        )
        small = e1.join(sm, on="hi").selectExpr("lo AS a", "m AS b").unionAll(
            sm.selectExpr("hi AS a", "m AS b")
        )
        e = (
            small.where("a <> b")
            .selectExpr("greatest(a, b) AS hi", "least(a, b) AS lo")
            .distinct()
        )
    else:
        raise RuntimeError(f"connected_components_star: no convergence in {max_rounds}")
    roots = e.selectExpr("hi AS doc_id", "lo AS _root")
    return nodes.select("doc_id").join(roots, on="doc_id", how="left").select(
        "doc_id", F.coalesce("_root", "doc_id").alias("canonical_id")
    )


def editdist_verified_pairs(
    docs: DataFrame,
    k: int = 8,
    bands: int = 4,
    jaccard_floor: float = 0.1,
    prefix: int = 120,
) -> DataFrame:
    """Near-dup candidates (MinHash LSH banding) re-verified by EDIT DISTANCE:
    the second-stage filter fuzzy-dedup pipelines run when token-set overlap
    is too coarse (reorderings score high Jaccard but high edit distance).

    Scale shape: candidate generation is the bounded LSH bucket join (never
    all-pairs); the verify step pulls a fixed-length text PREFIX per side —
    Levenshtein is O(prefix²) per pair, constant and cache-friendly, instead
    of O(len²) on unbounded documents, and the join ships ``prefix`` chars
    per row, not whole documents.

    Output: (a_id, b_id, jaccard, lev, norm_lev, near_dup)."""
    pairs = minhash_lsh_pairs(docs, k=k, bands=bands, threshold=jaccard_floor)
    texts = docs.select("doc_id", F.expr(f"substring(text, 1, {prefix})").alias("_pfx"))
    a_t = texts.select(F.col("doc_id").alias("a_id"), F.col("_pfx").alias("_pa"))
    b_t = texts.select(F.col("doc_id").alias("b_id"), F.col("_pfx").alias("_pb"))
    verified = (
        pairs.join(a_t, "a_id")
        .join(b_t, "b_id")
        .withColumn("lev", F.levenshtein("_pa", "_pb").cast("long"))
        .withColumn(
            "norm_lev",
            F.col("lev").cast("double")
            / F.greatest(F.length("_pa"), F.length("_pb"), F.lit(1)),
        )
    )
    return verified.select(
        "a_id",
        "b_id",
        "jaccard",
        "lev",
        "norm_lev",
        (F.col("norm_lev") <= 0.8).alias("near_dup"),
    )


def containment_pairs(
    docs: DataFrame, threshold: float = 0.5, max_df: int = 64, min_shared: int = 2
) -> DataFrame:
    """DIRECTED near-duplicate pairs by shingle containment C(A→B) =
    |sh(A) ∩ sh(B)| / |sh(A)| — the asymmetric cousin of Jaccard that
    catches quotes, boilerplate supersets, and partial copies Jaccard
    misses (a 40-token quote inside a 4000-token page has tiny Jaccard but
    containment ≈ 1). Same stop-shingle-pruned candidate join as
    :func:`ngram_jaccard_pairs` (df ∈ [2, max_df] bounds the self-join) —
    candidates are kept UNORDERED (a < b, half the distinct + half the
    verify joins), must share at least ``min_shared`` pruned shingles (the
    recall/cost dial — a pair at containment ≥ 0.5 shares dozens, so 2 is
    nearly free and cuts the candidate set ~10×), and each verified pair
    fans out to its two directions per-row; both survive when they clear
    the threshold.

    Output: (contained_id, container_id, inter_cnt, n_contained,
    containment), one row per direction meeting ``threshold``."""
    sets = shingle_docs(docs).cache()
    s = sets.select("doc_id", F.explode("sh_set").alias("shingle"))
    df_counts = s.groupBy("shingle").agg(F.count("*").alias("df"))
    rare = s.join(
        df_counts.where((F.col("df") >= 2) & (F.col("df") <= max_df)), "shingle"
    ).select("doc_id", "shingle")
    pairs = (
        rare.alias("a")
        .join(rare.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("_nsh"))
        .where(F.col("_nsh") >= int(min_shared))
        .select("a_id", "b_id")
    )
    verified = (
        pairs.join(
            sets.select(F.col("doc_id").alias("a_id"), F.col("sh_set").alias("_sa")),
            "a_id",
        )
        .join(
            sets.select(F.col("doc_id").alias("b_id"), F.col("sh_set").alias("_sb")),
            "b_id",
        )
        .withColumn("inter_cnt", F.size(F.array_intersect("_sa", "_sb")).cast("long"))
        .withColumn("_na", F.size("_sa").cast("long"))
        .withColumn("_nb", F.size("_sb").cast("long"))
    )
    both = verified.select(
        "inter_cnt",
        F.explode(
            F.expr(
                "array(struct(a_id AS contained_id, b_id AS container_id, _na AS n_contained),"
                " struct(b_id AS contained_id, a_id AS container_id, _nb AS n_contained))"
            )
        ).alias("d"),
    ).select("d.contained_id", "d.container_id", "inter_cnt", "d.n_contained")
    return (
        both.withColumn("containment", F.col("inter_cnt") / F.col("n_contained"))
        .where(F.col("containment") >= threshold)
        .select("contained_id", "container_id", "inter_cnt", "n_contained", "containment")
    )


def lsh_candidate_pairs(
    docs: DataFrame, k: int = 8, bands: int = 4, min_agree: int = 2
) -> DataFrame:
    """The CANDIDATE half of :func:`minhash_lsh_pairs` — bucket-join pairs
    with their signature-agreement count, WITHOUT Jaccard verification.
    Exposed separately so the evaluation harness can measure the candidate
    generator's precision/recall against exact ground truth (returns
    (a_id, b_id, agree) with agree >= ``min_agree`` of ``k`` signatures)."""
    rows_per_band = k // bands
    # plan-audit note: this subtree is referenced four times (bucket self-
    # join sides + both signature legs) and so re-scans the corpus four
    # times. Measured at sf0.1: caching it (or the exploded shingle rows in
    # the truth arm) is 15-40% SLOWER than the re-derivations — whole-stage
    # codegen pipelines shingle+minhash faster than cache materialize +
    # InMemoryTableScan can replay it. Eval harness is sample-scale by
    # contract, so corpus-sized re-scans are bounded by the sample.
    base = (
        with_shingles(docs)
        .where(F.size("shingles") > 0)
        .withColumn("_hs", F.expr(BASE_HASH_EXPR))
        .select("doc_id", *_sig_cols(k))
    )
    band_hashes = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|", *[f"sig_{b * rows_per_band + r}" for r in range(rows_per_band)]
                )
            )
            for b in range(bands)
        ]
    )
    buckets = base.select(
        "doc_id", F.posexplode(band_hashes).alias("band_idx", "band_hash")
    )
    cand = (
        buckets.alias("a")
        .join(buckets.alias("b"), ["band_idx", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    a_side = base.select(
        F.col("doc_id").alias("a_id"),
        *[F.col(f"sig_{i}").alias(f"_sa_{i}") for i in range(k)],
    )
    b_side = base.select(
        F.col("doc_id").alias("b_id"),
        *[F.col(f"sig_{i}").alias(f"_sb_{i}") for i in range(k)],
    )
    return (
        cand.join(a_side, "a_id")
        .join(b_side, "b_id")
        .withColumn(
            "agree",
            sum(
                F.when(F.col(f"_sa_{i}") == F.col(f"_sb_{i}"), 1).otherwise(0)
                for i in range(k)
            ).cast("int"),
        )
        .where(F.col("agree") >= min_agree)
        .select("a_id", "b_id", "agree")
    )


def exact_jaccard_pairs_uncapped(docs: DataFrame, threshold: float = 0.1) -> DataFrame:
    """Exact ground-truth near-dup pairs: inverted-index candidates with NO
    df cap (complete — any pair with jaccard >= threshold shares a shingle),
    verified by true Jaccard. This is the EVALUATION arm only: at corpus
    scale you run it on a sample, never the full table (the df-capped
    production path is ngram_jaccard_pairs)."""
    s = shingle_sets(docs)
    sizes = s.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = s.select(F.col("doc_id").alias("a_id"), "shingle")
    b = s.select(F.col("doc_id").alias("b_id"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("inter_cnt"))
    )
    na = sizes.select(F.col("doc_id").alias("a_id"), F.col("n_shingles").alias("_na"))
    nb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n_shingles").alias("_nb"))
    return (
        inter.join(na, "a_id")
        .join(nb, "b_id")
        .withColumn(
            "jaccard",
            F.col("inter_cnt")
            / (F.col("_na") + F.col("_nb") - F.col("inter_cnt")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def lsh_bucket_rows(docs: DataFrame, k: int = 8, bands: int = 4) -> DataFrame:
    """The banded-LSH index rows an INCREMENTAL dedup maintains as state:
    one row per (doc, band) carrying the band's bucket hash plus the full
    signature vector for verification — (doc_id, band_idx, band_hash, sigs).

    Per-row projection fused into the scan (signatures + band hashes are
    the same universal-hash MinHash as :func:`minhash_lsh_pairs`); the only
    join an ingest batch pays is the (band_idx, band_hash) equi-join against
    this state — O(batch x bucket collisions), never a corpus rescan."""
    rows_per_band = k // bands
    # plan-audit note: this subtree is referenced four times (bucket self-
    # join sides + both signature legs) and so re-scans the corpus four
    # times. Measured at sf0.1: caching it (or the exploded shingle rows in
    # the truth arm) is 15-40% SLOWER than the re-derivations — whole-stage
    # codegen pipelines shingle+minhash faster than cache materialize +
    # InMemoryTableScan can replay it. Eval harness is sample-scale by
    # contract, so corpus-sized re-scans are bounded by the sample.
    base = (
        with_shingles(docs)
        .where(F.size("shingles") > 0)
        .withColumn("_hs", F.expr(BASE_HASH_EXPR))
        .select("doc_id", *_sig_cols(k))
    )
    band_hashes = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|", *[f"sig_{b * rows_per_band + r}" for r in range(rows_per_band)]
                )
            )
            for b in range(bands)
        ]
    )
    return base.select(
        "doc_id",
        F.array(*[F.col(f"sig_{i}") for i in range(k)]).alias("sigs"),
        F.posexplode(band_hashes).alias("band_idx", "band_hash"),
    )


SIG_AGREE_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)"
)
