"""Text-analysis operators for large-scale training-data pipelines: token
counting, quality scoring, heuristic language ID, document fingerprinting.

Not part of the reference's surface (it ships raw row events); these are the
north-star additions (BASELINE.json) over the ``documents`` table.

Scale design: everything is per-row array expressions (split/filter/transform/
aggregate) — NO shuffle, NO Python, fully fused into the parquet scan by
whole-stage codegen. A 100 TB corpus maps straight through.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tokens: lowercase, whitespace-split, empties dropped
TOKENS_EXPR = "filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)"

# NOTE on shingles: a per-index formulation (transform(sequence(...), i ->
# element_at(tokens, i) ...)) is QUADRATIC when a pushed-down predicate or
# collapsed projection inlines the ``tokens`` alias — every element_at then
# re-runs the split PER ELEMENT. The zip_with-over-slices form below references
# ``tokens`` a CONSTANT number of times, so even a full inline (e.g. the
# size(shingles)>0 predicate pushed to the scan) costs O(tokens), not
# O(tokens²). Measured at sf0.1: per-row arrays beat the posexplode +
# window-lead row pipeline ~5× warm (no doc_id shuffle at all).
SHINGLES_EXPR = (
    "CASE WHEN size(tokens) >= 3 THEN "
    "zip_with(slice(tokens, 1, size(tokens) - 2), "
    "zip_with(slice(tokens, 2, size(tokens) - 2), slice(tokens, 3, size(tokens) - 2), "
    "(x, y) -> concat(x, ' ', y)), "
    "(a, b) -> concat(a, ' ', b)) "
    "ELSE CAST(array() AS ARRAY<STRING>) END"
)

# heuristic language markers (synthetic corpus vocabulary, arbitrary but fixed)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a"),
    "es": ("data", "row"),
    "de": ("table", "key"),
    "fr": ("value", "query"),
    "zh": ("hash", "join"),
}
LANG_ORDER = ("en", "es", "de", "fr", "zh")  # tie-break priority


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """CPU-heavy per-row operators need one task per core. A 100 TB corpus has
    thousands of input splits; a small local file has one — repartition only
    when the scan under-splits, so no shuffle is added at scale.

    The probe is plan-free (file list + byte sizes, no ``df.rdd`` conversion —
    that would force an RDD translation of the plan on every invocation): scan
    parallelism is estimated as max(#files, bytes/128MB), the same quantities
    Spark's own file-split planner uses."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:  # non-file source — leave the plan alone
        return df
    if not files:
        return df
    total = 0
    for f in files:
        p = f.removeprefix("file:")
        try:
            total += os.path.getsize(p)
        except OSError:
            return df  # remote/unstattable storage: assume well-split
    est_splits = max(len(files), total // (128 * 1024 * 1024))
    if est_splits < target:
        return df.repartition(target)
    return df


def with_tokens(docs: DataFrame) -> DataFrame:
    return ensure_parallelism(docs).withColumn("tokens", F.expr(TOKENS_EXPR))


def token_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, token) rows — the codegen-friendly token representation."""
    return ensure_parallelism(docs).select(
        "doc_id", F.posexplode(F.expr(TOKENS_EXPR)).alias("pos", "token")
    )


def with_shingles(docs: DataFrame) -> DataFrame:
    """docs + ``shingles`` array column (3-token shingles, duplicates kept) —
    pure per-row expressions, zero shuffles."""
    return with_tokens(docs).withColumn("shingles", F.expr(SHINGLES_EXPR))


def shingle_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) rows (3-token shingles, duplicates kept): explode of
    the per-row shingle array — linear, no doc_id shuffle. Docs with < 3
    tokens contribute no rows (explode drops empty arrays)."""
    return with_shingles(docs).select("doc_id", F.explode("shingles").alias("shingle"))


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace/regex tokenization + counts (BPE-ish sub-token count as the
    letter-run count — a cheap deterministic proxy)."""
    return with_tokens(docs).select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.length("text").alias("n_chars_text"),
        F.expr("size(filter(split(lower(text), '[^a-z0-9]+'), t -> length(t) > 0))").alias(
            "n_word_runs"
        ),
    )


def _marker_count(lang: str) -> Column:
    toks = ", ".join(f"'{t}'" for t in LANG_MARKERS[lang])
    return F.expr(f"size(filter(tokens, t -> t in ({toks})))")


def lang_scores(docs: DataFrame) -> DataFrame:
    df = with_tokens(docs)
    for lang in LANG_ORDER:
        df = df.withColumn(f"score_{lang}", _marker_count(lang))
    return df


def predicted_lang_col() -> Column:
    """argmax of the ``score_<lang>`` columns with the fixed LANG_ORDER
    tie-break — requires the score columns to already be in scope."""
    pred = None
    for lang in LANG_ORDER:
        cond = None
        for other in LANG_ORDER:
            if other == lang:
                continue
            c = F.col(f"score_{lang}") >= F.col(f"score_{other}")
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return pred.otherwise(F.lit(LANG_ORDER[0]))


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic n-gram language ID: argmax of marker-token hit counts with a
    fixed tie-break order."""
    df = lang_scores(docs)
    df = df.withColumn("predicted_lang", predicted_lang_col())
    return df.select(
        "doc_id",
        "lang",
        *[f"score_{la}" for la in LANG_ORDER],
        "predicted_lang",
        (F.col("predicted_lang") == F.col("lang")).alias("correct"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Composite quality score: length, mean token length, stopword ratio,
    digit ratio — the usual pre-training heuristics, pure arithmetic.

    One `aggregate` pass folds token count / total length / stopword hits into
    a single struct, so the tokenizing `split` runs ONCE per row even after
    CollapseProject inlines the alias (three separate token expressions would
    re-split 3×); digit counting is `translate` (char map), not a regex scan.
    Measured 6× faster at sf0.1."""
    df = ensure_parallelism(docs)
    df = df.select(
        "doc_id",
        F.expr(
            f"aggregate({TOKENS_EXPR}, named_struct('n', 0L, 'sumlen', 0L, 'stop', 0L),"
            " (acc, t) -> named_struct("
            "'n', acc.n + 1L,"
            " 'sumlen', acc.sumlen + length(t),"
            " 'stop', acc.stop + CASE WHEN t IN ('the', 'a', 'of') THEN 1L ELSE 0L END))"
        ).alias("_st"),
        F.length("text").alias("n_chars"),
        (
            F.length("text") - F.length(F.expr("translate(text, '0123456789', '')"))
        ).alias("_n_digits"),
    ).select(
        "doc_id",
        F.col("_st.n").alias("n_tokens"),
        "n_chars",
        (F.col("_st.sumlen").cast("double") / F.greatest(F.col("_st.n"), F.lit(1))).alias(
            "mean_token_len"
        ),
        (F.col("_st.stop").cast("double") / F.greatest(F.col("_st.n"), F.lit(1))).alias(
            "stopword_ratio"
        ),
        (F.col("_n_digits").cast("double") / F.greatest(F.col("n_chars"), F.lit(1))).alias(
            "digit_ratio"
        ),
    )
    return df.withColumn(
        "quality",
        F.expr(
            "0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)"
            " + 0.3 * (1.0 - stopword_ratio)"
            " + 0.2 * least(mean_token_len / 8.0, 1.0)"
            " + 0.1 * (1.0 - digit_ratio)"
        ),
    )


def select_gate(
    surv: DataFrame,
    min_quality: float = 0.5,
    min_tokens: int = 20,
    langs: tuple[str, ...] = ("en", "de"),
) -> DataFrame:
    """The fused quality + language selection gate over already-deduped docs:
    token stats, stopword/digit ratios, and ALL language marker counts fold
    in a SINGLE ``aggregate`` pass over one tokenization per row (an 8-field
    accumulator struct) — per-row expressions only, fused into the caller's
    stage. Output: (doc_id, n_tokens, quality, predicted_lang), selected rows
    only."""
    init = ["'n', 0L", "'sumlen', 0L", "'stop', 0L"] + [
        f"'{la}', 0L" for la in LANG_ORDER
    ]
    upd = [
        "'n', acc.n + 1L",
        "'sumlen', acc.sumlen + length(t)",
        "'stop', acc.stop + CASE WHEN t IN ('the', 'a', 'of') THEN 1L ELSE 0L END",
    ]
    for la in LANG_ORDER:
        toks = ", ".join(f"'{m}'" for m in LANG_MARKERS[la])
        upd.append(f"'{la}', acc.{la} + CASE WHEN t IN ({toks}) THEN 1L ELSE 0L END")
    agg = (
        f"aggregate({TOKENS_EXPR}, named_struct({', '.join(init)}),"
        f" (acc, t) -> named_struct({', '.join(upd)}))"
    )
    df = surv.select(
        "doc_id",
        F.expr(agg).alias("_st"),
        F.length("text").alias("_nc"),
        (
            F.length("text") - F.length(F.expr("translate(text, '0123456789', '')"))
        ).alias("_nd"),
    ).select(
        "doc_id",
        F.col("_st.n").alias("n_tokens"),
        F.expr(
            "0.4 * least(CAST(_st.n AS DOUBLE) / 100.0, 1.0)"
            " + 0.3 * (1.0 - CAST(_st.stop AS DOUBLE) / greatest(_st.n, 1L))"
            " + 0.2 * least(CAST(_st.sumlen AS DOUBLE) / greatest(_st.n, 1L) / 8.0, 1.0)"
            " + 0.1 * (1.0 - CAST(_nd AS DOUBLE) / greatest(_nc, 1))"
        ).alias("quality"),
        *[F.col(f"_st.{la}").alias(f"score_{la}") for la in LANG_ORDER],
    )
    df = df.withColumn("predicted_lang", predicted_lang_col())
    return df.where(
        (F.col("quality") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
        & F.col("predicted_lang").isin(*langs)
    ).select("doc_id", "n_tokens", "quality", "predicted_lang")


def corpus_select(
    docs: DataFrame,
    min_quality: float = 0.5,
    min_tokens: int = 20,
    langs: tuple[str, ...] = ("en", "de"),
) -> DataFrame:
    """One-pass training-corpus selection: EXACT dedup (keep the lowest
    doc_id per md5(text)), then the fused quality + language gate — the
    end-to-end document-selection step every pre-training data pipeline runs
    before tokenization.

    Scale shape: ONE hash-partition shuffle total (the dedup window on the
    text hash); every metric after it is per-row and fuses into the same
    stage. No joins, no second scan, no re-split."""
    from pyspark.sql import Window as W

    surv = (
        ensure_parallelism(docs)
        .withColumn(
            "_rn",
            F.row_number().over(W.partitionBy(F.md5("text")).orderBy("doc_id")),
        )
        .where(F.col("_rn") == 1)
    )
    return select_gate(surv, min_quality, min_tokens, langs)


def corpus_select_neardup(
    docs: DataFrame,
    threshold: float = 0.1,
    min_quality: float = 0.5,
    min_tokens: int = 20,
    langs: tuple[str, ...] = ("en", "de"),
) -> DataFrame:
    """NEAR-dup corpus selection: MinHash+LSH pairs → large-star/small-star
    connected components (O(log n) rounds) → keep each cluster's canonical
    document (min doc_id; singletons keep themselves) → fused quality +
    language gate. The full near-duplicate member of the selection family —
    what production pre-training dedup actually runs (exact dedup misses
    boilerplate-variant copies).

    Scale shape: the LSH band bucket-join and the log-rounds star iterations
    are the only key-space shuffles (both bounded — no all-pairs); canonical
    filtering is a doc_id-co-partitioned semi join; the gate is per-row."""
    from pgcapture_spark.operators.dedup import (
        connected_components_star,
        minhash_lsh_pairs,
    )

    comp = connected_components_star(
        docs.select("doc_id"), minhash_lsh_pairs(docs, threshold=threshold)
    )
    reps = comp.where(F.col("doc_id") == F.col("canonical_id")).select("doc_id")
    surv = ensure_parallelism(docs).join(reps, "doc_id", "left_semi")
    return select_gate(surv, min_quality, min_tokens, langs)


# 2-gram variant of SHINGLES_EXPR (same constant-reference zip_with shape)
BIGRAMS_EXPR = (
    "CASE WHEN size(tokens) >= 2 THEN "
    "zip_with(slice(tokens, 1, size(tokens) - 1), slice(tokens, 2, size(tokens) - 1), "
    "(a, b) -> concat(a, ' ', b)) "
    "ELSE CAST(array() AS ARRAY<STRING>) END"
)


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition quality signals per document: duplicate-token
    fraction (1 − distinct/total) and top-bigram fraction (occurrences of the
    most frequent bigram / total bigrams) — high values flag boilerplate and
    degenerate repetition for pre-training filtering.

    Shape: per-row token stats fused into the scan; the bigram mode needs a
    (doc_id, bigram) count — explode + two-level groupBy with map-side combine,
    then a doc_id join back (shares the doc_id exchange). Linear in corpus
    size, two shuffles on doc_id — the 100 TB shape."""
    base = with_tokens(docs).select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.expr("size(array_distinct(tokens))").alias("_n_distinct"),
        F.expr(BIGRAMS_EXPR).alias("_bigrams"),
    )
    bg_cnt = (
        base.select("doc_id", F.explode("_bigrams").alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bigram_cnt"))
    )
    return (
        base.drop("_bigrams")
        .join(bg_cnt, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_tokens",
            (
                F.lit(1.0)
                - F.col("_n_distinct").cast("double") / F.greatest("n_tokens", F.lit(1))
            ).alias("dup_token_frac"),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("top_bigram_cnt", F.lit(0)).alias("top_bigram_cnt"),
            (
                F.coalesce("top_bigram_cnt", F.lit(0)).cast("double")
                / F.greatest(F.coalesce("n_bigrams", F.lit(0)), F.lit(1))
            ).alias("top_bigram_frac"),
        )
    )


def fingerprint(docs: DataFrame, k: int = 4) -> DataFrame:
    """Document fingerprint: k-min sketch over shingle hashes (winnowing-lite —
    the k lexicographically-smallest md5s of the 3-gram shingles, joined).
    Docs with < 3 tokens fingerprint as ''."""
    return with_shingles(docs).select(
        "doc_id",
        F.expr(
            f"concat_ws('-', slice(array_sort(transform(shingles, s -> md5(s))), 1, {k}))"
        ).alias("fingerprint"),
    )


# 5-token contamination grams: same constant-reference slice shape as
# SHINGLES_EXPR/BIGRAMS_EXPR, one per starting position
GRAMS5_EXPR = (
    "CASE WHEN size(tokens) >= 5 THEN "
    "transform(sequence(1, size(tokens) - 4), i -> concat_ws(' ', slice(tokens, i, 5))) "
    "ELSE CAST(array() AS ARRAY<STRING>) END"
)


def decontaminate(docs: DataFrame, eval_pred: str = "doc_id % 97 = 5") -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any 5-token
    n-gram with the evaluation set — the train/test-overlap scrub every
    pre-training pipeline runs before training.

    Shape: per-row gram arrays fused into the scan, deduped PER ROW with
    array_distinct (so (doc_id, gram) is unique with NO corpus-wide shuffle);
    the eval-set gram list is DISTINCT-ed and BROADCAST (a benchmark suite is
    tiny next to the corpus — at 100 TB the eval grams are megabytes); the
    train side equi-joins on gram map-side, then one doc_id count. The only
    corpus-wide shuffle is the final per-doc aggregate of matching rows
    (already tiny)."""
    grams = with_tokens(docs).select(
        "doc_id", F.explode(F.expr(f"array_distinct({GRAMS5_EXPR})")).alias("gram")
    )
    eval_grams = grams.where(eval_pred).select("gram").distinct()
    train = grams.where(f"NOT ({eval_pred})")
    return (
        train.join(F.broadcast(eval_grams), on="gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )


# ---------------------------------------------------------- rule-based gates

# Gopher/C4-style document quality rules (cf. Rae et al. 2021 "Scaling
# Language Models: ... Gopher" table A1; Raffel et al. 2020 C4 heuristics).
# Each rule is a boolean; `keep` is their conjunction. All metrics are pure
# per-row expressions — one tokenize, no shuffle, fused into the scan.
STOPWORDS = ("the", "a", "of", "value", "table")


def quality_rules(docs: DataFrame, keep_tokens: bool = False) -> DataFrame:
    """Per-document rule flags + keep decision.

    Rules (metric → bound): token count in [20, 100000]; mean token length in
    [2, 12]; fraction of tokens containing a letter >= 0.8; symbol ratio
    ('#'/'…' per token) <= 0.1; distinct-token fraction >= 0.3 (the repetition
    gate — word-soup spam collapses here); >= 2 distinct stopwords present.

    ``keep_tokens=True`` carries the token array through to the output so a
    downstream token-level consumer (the NB classifier) labels and explodes
    in the SAME scan — no doc_id join to reattach labels.
    """
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    df = ensure_parallelism(docs).select(
        "doc_id",
        F.expr(TOKENS_EXPR).alias("tokens"),
        F.length("text").alias("n_chars"),
        (
            F.length("text") - F.length(F.expr("translate(text, '#…', '')"))
        ).alias("_n_sym"),
    )
    m = df.select(
        *(["doc_id", "tokens"] if keep_tokens else ["doc_id"]),
        F.size("tokens").alias("n_tokens"),
        (
            F.expr("aggregate(tokens, 0L, (acc, t) -> acc + length(t))").cast("double")
            / F.greatest(F.size("tokens"), F.lit(1))
        ).alias("mean_token_len"),
        (
            F.expr("size(filter(tokens, t -> t rlike '[a-z]'))").cast("double")
            / F.greatest(F.size("tokens"), F.lit(1))
        ).alias("frac_alpha_tokens"),
        (
            F.col("_n_sym").cast("double") / F.greatest(F.size("tokens"), F.lit(1))
        ).alias("symbol_ratio"),
        (
            F.expr("size(array_distinct(tokens))").cast("double")
            / F.greatest(F.size("tokens"), F.lit(1))
        ).alias("frac_distinct_tokens"),
        F.expr(f"size(array_intersect(tokens, array({stops})))").alias(
            "n_distinct_stopwords"
        ),
    )
    rules = m.select(
        "*",
        ((F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 100000)).alias("r_wordcount"),
        ((F.col("mean_token_len") >= 2.0) & (F.col("mean_token_len") <= 12.0)).alias(
            "r_meanlen"
        ),
        (F.col("frac_alpha_tokens") >= 0.8).alias("r_alpha"),
        (F.col("symbol_ratio") <= 0.1).alias("r_symbols"),
        (F.col("frac_distinct_tokens") >= 0.3).alias("r_distinct"),
        (F.col("n_distinct_stopwords") >= 2).alias("r_stopwords"),
    )
    return rules.withColumn(
        "keep",
        F.col("r_wordcount")
        & F.col("r_meanlen")
        & F.col("r_alpha")
        & F.col("r_symbols")
        & F.col("r_distinct")
        & F.col("r_stopwords"),
    )


def mix_sample(
    docs: DataFrame, alpha: float = 0.5, target_frac: float = 0.5
) -> DataFrame:
    """Temperature-based domain-mixture sampling (the multilingual-corpus
    rebalance: sample language l with probability ∝ n_l^alpha, cf. the
    mBERT/XLM exponential-smoothing recipe). Deterministic: the per-doc coin
    is md5(doc_id) mapped to [0,1), so the sample is reproducible across runs,
    engines and cluster layouts.

    Scale shape: ONE tiny groupBy(lang) builds the rate table (≤ #langs rows,
    broadcast back); the keep decision is a per-row hash compare fused into
    the scan — no corpus shuffle at all. Weights are quantized to integers
    before the cross-language sum so the rate is bit-identical cross-engine.

    Output: the sampled rows (doc_id, lang, rate) — rate floor-quantized."""
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_l"))
    tot = counts.agg(
        F.sum("n_l").alias("n_total"),
        F.sum(F.expr(f"CAST(floor(pow(n_l, {alpha}) * 1000000 + 0.5) AS BIGINT)")).alias(
            "w_total"
        ),
    )
    rates = (
        counts.join(F.broadcast(tot))
        .withColumn(
            "wq", F.expr(f"CAST(floor(pow(n_l, {alpha}) * 1000000 + 0.5) AS BIGINT)")
        )
        .withColumn(
            "rate",
            F.expr(
                f"least(1.0, {target_frac} * CAST(wq AS DOUBLE) / w_total"
                " * n_total / n_l)"
            ),
        )
        .select("lang", "rate")
    )
    u = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
        " / 4294967296.0"
    )
    return (
        ensure_parallelism(docs)
        .join(F.broadcast(rates), on="lang")
        .where(u < F.col("rate"))
        .select(
            "doc_id",
            "lang",
            (F.floor(F.col("rate") * 1000000 + F.lit(0.5)) / 1000000).alias("rate"),
        )
    )


def corpus_stats(docs: DataFrame) -> DataFrame:
    """Per-(lang, source) dataset statistics: doc count, token totals, exact
    token-count median/p90 — the dataset-card numbers a curation pipeline
    reports. One tokenize + one groupBy; exact percentiles (interpolating
    definition, identical formula cross-engine on integer inputs)."""
    base = with_tokens(docs).select(
        "lang", "source", F.size("tokens").alias("n_tokens"), F.length("text").alias("n_chars")
    )
    return base.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("mean_chars"),
        F.expr("percentile(n_tokens, 0.5D)").alias("median_tokens"),
        F.expr("percentile(n_tokens, 0.9D)").alias("p90_tokens"),
    )


def bpe_merge_table(docs: DataFrame, k: int = 12) -> list[tuple[str, str]]:
    """Top-k character-pair merges by corpus frequency (rank = cnt DESC, pair
    ASC) — the single-pass approximation of BPE training's first k merges
    (true BPE recounts after each merge; rank-ordered application below is
    the standard APPLY semantics given any merge table). k-bounded driver
    collect: a tokenizer merge table is driver/broadcast-resident in any real
    pipeline, 100 TB included."""
    pairs = (
        with_tokens(docs)
        .select(F.explode("tokens").alias("token"))
        .select(F.expr("split(token, '')").alias("ch"))
        .where(F.size("ch") >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(ch, 1, size(ch) - 1), slice(ch, 2, size(ch) - 1),"
                    " (x, y) -> concat(x, ' ', y))"
                )
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair"))
        .limit(k)
    )
    return [(r["pair"], r["pair"].replace(" ", "")) for r in pairs.collect()]


def bpe_tokenize(docs: DataFrame, k: int = 12) -> DataFrame:
    """Apply the learned BPE merge table: each token becomes its spaced char
    sequence, merges replace in rank order (left-to-right non-overlapping —
    the BPE apply convention), and the doc reports its unit count plus the
    first token's segmentation (so the hash check pins the actual merge
    application, not just counts).

    Scale shape: the merge table is a list of literal string replaces baked
    into ONE per-row projection — whole-stage-codegen JVM string ops, zero
    Python, zero shuffles beyond the tiny pair-count groupBy that trains the
    table. Output: (doc_id, n_tokens, n_chars_tok, n_bpe_units, bpe_ratio,
    first_token_bpe)."""
    merges = bpe_merge_table(docs, k=k)
    apply_expr = "trim(regexp_replace(t, '(.)', '$1 '))"

    def _sq(s: str) -> str:
        # corpus-derived pairs are spliced as SQL string literals: escape
        # backslashes and quotes or an apostrophe in a learned pair (it's,
        # don't) produces malformed SQL and a ParseException
        return s.replace("\\", "\\\\").replace("'", "\\'")

    for pair, merged in merges:
        apply_expr = f"replace({apply_expr}, '{_sq(pair)}', '{_sq(merged)}')"
    df = with_tokens(ensure_parallelism(docs)).select(
        "doc_id",
        "tokens",
        F.expr(f"transform(tokens, t -> {apply_expr})").alias("bpe_arr"),
    )
    return df.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.expr("aggregate(tokens, 0L, (acc, t) -> acc + length(t))").alias(
            "n_chars_tok"
        ),
        F.expr(
            "aggregate(bpe_arr, 0L, (acc, s) -> acc + size(split(s, ' ')))"
        ).alias("n_bpe_units"),
        F.expr(
            "CAST(aggregate(bpe_arr, 0L, (acc, s) -> acc + size(split(s, ' '))) AS DOUBLE)"
            " / greatest(aggregate(tokens, 0L, (acc, t) -> acc + length(t)), 1)"
        ).alias("bpe_ratio"),
        F.expr("coalesce(element_at(bpe_arr, 1), '')").alias("first_token_bpe"),
    )


def line_dedup(docs: DataFrame, line_tokens: int = 10) -> DataFrame:
    """Corpus-wide line-level exact deduplication (the C4 / "Deduplicating
    Training Data Makes Language Models Better" curation stage): documents
    split into consecutive ``line_tokens``-token lines; every occurrence of a
    line after the corpus-wide FIRST (ordered by (doc_id, line_no)) is
    dropped, and each document is reassembled from its surviving lines.

    Scale shape: line construction is a per-row split/slice expression fused
    into the scan (no shuffle); ONE corpus-wide shuffle keyed on the line
    text ranks occurrences (window row_number — the same hash partitioning a
    groupBy(line) would need, without the join-back); ONE doc_id shuffle
    reassembles documents. A boilerplate line repeated across the whole
    corpus lands in one partition, but the window state is rank-only
    (streaming, O(1) memory per key); for pathological skew swap in
    groupBy(line).agg(min(struct(doc_id, line_no))) + join-back.

    Output: (doc_id, n_lines, n_kept, dedup_text). Training-pipeline
    extension (SURVEY north-star); no reference-file counterpart.
    """
    from pyspark.sql import Window as W

    lt = int(line_tokens)
    lines = (
        ensure_parallelism(docs)
        .select("doc_id", F.expr("split(text, ' ')").alias("ts"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "CASE WHEN size(ts) = 0 THEN CAST(array() AS ARRAY<STRING>)"
                    f" ELSE transform(sequence(0, CAST(ceil(size(ts) / {lt}.0) AS INT) - 1),"
                    f" i -> concat_ws(' ', slice(ts, i * {lt} + 1, {lt}))) END"
                )
            ).alias("line_no", "line"),
        )
    )
    ranked = lines.withColumn(
        "rn", F.row_number().over(W.partitionBy("line").orderBy("doc_id", "line_no"))
    )
    return ranked.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.count(F.when(F.col("rn") == 1, True)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.expr(
                "transform(filter(array_sort(collect_list(struct(line_no, rn, line))),"
                " s -> s.rn = 1), s -> s.line)"
            ),
        ).alias("dedup_text"),
    )


def shard_expr(key_col: str, n_shards: int):
    """THE shard hash — md5(key)[0:8] as int, mod ``n_shards``. One
    definition for every export path (doc shards, packed-batch shards, CLI):
    change the hash here or engines silently disagree on shard layout."""
    return (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % int(n_shards)
    ).cast("int")


def shard_assign(docs: DataFrame, n_shards: int = 8) -> DataFrame:
    """Deterministic training-export shard assignment: shard =
    md5(doc_id)[0:8] as int, mod ``n_shards`` — content-independent,
    engine-independent (NOT Spark's xxhash64, so an exporter in any engine
    lands rows identically). The write path is
    ``df.repartition(n_shards, "shard").write.partitionBy("shard")`` —
    per-row expression here, shuffle only at the writer.
    """
    return docs.withColumn("shard", shard_expr("doc_id", n_shards))


def shard_plan(docs: DataFrame, n_shards: int = 8) -> DataFrame:
    """Per-shard export manifest over :func:`shard_assign`: doc/char/token
    totals and id bounds per shard — the balance check a 100 TB export runs
    before committing a layout (detects skewed shards BEFORE the write).
    One groupBy on the tiny shard key."""
    base = shard_assign(with_tokens(docs), n_shards).select(
        "shard", "doc_id", F.length("text").alias("n_chars"), F.size("tokens").alias("n_toks")
    )
    return base.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_toks").alias("total_tokens"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


def dsir_weights(docs: DataFrame, target_pred: str = "lang = 'en'") -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, Data Selection via
    Importance Resampling): per-document mean log p_target(w)/p_raw(w) under
    add-1-smoothed unigram LMs — target = the ``target_pred`` subset, raw =
    the whole corpus. Documents that look like the target domain score > 0
    and get up-sampled by the selection stage.

    Per-token log-ratios are quantized to integer 1e-4 nats BEFORE the
    per-doc sum (order-independent integer aggregation → hash-exact across
    engines and cluster layouts, the same contract as unigram surprisal).

    Scale shape: two token-count aggregations (one filtered) build the LMs
    — map-side combined, vocabulary-sized output; totals ride in one
    broadcast row; scoring is ONE token-key join + ONE doc_id groupBy.

    Output: (doc_id, n_tokens, total_q_nats, mean_logratio_nats, keep).
    """
    tok = with_tokens(docs).select(
        "doc_id", F.expr(target_pred).alias("is_tgt"), F.explode("tokens").alias("token")
    )
    cnt = tok.groupBy("token").agg(
        F.count("*").alias("cnt_r"),
        F.count(F.when(F.col("is_tgt"), True)).alias("cnt_t"),
    )
    totals = cnt.agg(
        F.sum("cnt_r").alias("n_r"),
        F.sum("cnt_t").alias("n_t"),
        F.count("*").alias("vocab"),
    )
    lm = cnt.join(F.broadcast(totals)).select(
        "token",
        F.expr(
            "CAST(floor((ln((CAST(cnt_t AS DOUBLE) + 1.0) / (n_t + vocab))"
            " - ln((CAST(cnt_r AS DOUBLE) + 1.0) / (n_r + vocab)))"
            " * 10000 + 0.5) AS BIGINT)"
        ).alias("q_ratio"),
    )
    return (
        tok.join(lm, on="token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("q_ratio").alias("total_q_nats"),
            (F.sum("q_ratio").cast("double") / 10000.0 / F.count("*")).alias(
                "mean_logratio_nats"
            ),
        )
        .withColumn("keep", F.col("total_q_nats") > 0)
    )


def substring_dedup(docs: DataFrame, k: int = 8) -> DataFrame:
    """Exact substring-level deduplication (the span-removal stage of Lee et
    al. 2021, "Deduplicating Training Data Makes Language Models Better"):
    every ``k``-token gram occurring at two or more positions corpus-wide
    keeps its FIRST occurrence (ordered by (doc_id, pos)) and every later
    occurrence marks its ``k`` token positions for removal; documents are
    reassembled from the surviving tokens.

    The reference paper builds a suffix array on one machine; the
    distributed-friendly restatement is gram-cover: per-row gram construction
    fused into the scan (no shuffle), ONE corpus-wide shuffle on the gram
    text (rank-only window state, same hash partitioning a groupBy would
    need). Covered positions collapse to ONE small per-doc position set
    (collect_set over only the duplicated occurrences) joined back on
    doc_id; removal + reassembly are then pure per-row array expressions —
    the corpus text itself is shuffled exactly once (the doc_id join), never
    re-exploded token-by-token. A boilerplate gram repeated across the
    corpus lands in one partition but carries only (doc_id, pos) pairs.

    Tokenization is a plain single-space split (positions must be exact for
    reassembly, so no lowercase/filter normalization here — dedup is literal,
    like the reference paper's byte-level spans).

    Output: (doc_id, n_tokens, n_removed, dedup_text).
    """
    from pyspark.sql import Window as W

    k = int(k)
    t = ensure_parallelism(docs).select("doc_id", F.expr("split(text, ' ')").alias("ts"))
    grams = t.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"CASE WHEN size(ts) >= {k} THEN transform(sequence(1, size(ts) - {k} + 1),"
                f" i -> concat_ws(' ', slice(ts, i, {k})))"
                " ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("p0", "gram"),
    ).select("doc_id", (F.col("p0") + 1).cast("bigint").alias("pos"), "gram")
    ranked = grams.select(
        "doc_id",
        "pos",
        F.row_number().over(W.partitionBy("gram").orderBy("doc_id", "pos")).alias("rn"),
        F.count("*").over(W.partitionBy("gram")).alias("cnt"),
    )
    cov = (
        ranked.where("cnt >= 2 AND rn >= 2")
        .select("doc_id", F.explode(F.expr(f"sequence(pos, pos + {k} - 1)")).alias("cp"))
        .groupBy("doc_id")
        .agg(F.collect_set("cp").alias("cps"))
    )
    return (
        t.join(cov, on="doc_id", how="left")
        .select(
            "doc_id",
            "ts",
            F.expr("coalesce(cps, CAST(array() AS ARRAY<BIGINT>))").alias("cps"),
        )
        .select(
            "doc_id",
            F.size("ts").cast("bigint").alias("n_tokens"),
            F.size("cps").cast("bigint").alias("n_removed"),
            F.concat_ws(
                " ",
                F.expr(
                    "filter(transform(sequence(1, size(ts)),"
                    " i -> IF(array_contains(cps, CAST(i AS BIGINT)), NULL,"
                    " element_at(ts, i))), x -> x IS NOT NULL)"
                ),
            ).alias("dedup_text"),
        )
    )


def nb_quality_classifier(docs: DataFrame) -> DataFrame:
    """Model-based quality classifier (the CCNet / GPT-3 "quality filter"
    stage): a multinomial Naive Bayes scorer whose training labels come from
    the :func:`quality_rules` heuristic gate — the standard bootstrap where a
    cheap rule battery seeds a smooth model that generalizes past the rules'
    hard edges. No external model: train = two token histograms + a prior.

    Per-token log-likelihood ratio ln p(t|keep)/p(t|drop) under add-1
    smoothing is quantized to integer 1e-4 nats BEFORE the per-doc sum (the
    repo-wide order-independence policy), so scores are exact integers.

    Shape: labeling is per-row and explodes in the SAME scan (keep_tokens
    passthrough — no doc_id join to reattach labels); class histograms are
    one token-key groupBy with map-side combine; class totals/vocab one tiny
    agg broadcast back; scoring joins tokens to the BROADCAST LLR table and
    folds per doc — at 100 TB the model is vocab-bounded (MBs), the corpus
    is touched twice (train count + score), both embarrassingly parallel,
    and the only corpus-wide exchanges are the two token-key/doc-key aggs.

    Output: (doc_id, n_tokens, token_llr_q, total_llr_q, pred_good).
    """
    labeled = quality_rules(docs, keep_tokens=True).select("doc_id", "keep", "tokens")
    tok = labeled.select("doc_id", "keep", F.explode("tokens").alias("token"))
    cls = tok.agg(
        F.count(F.when(F.col("keep"), True)).alias("tg"),
        F.count(F.when(~F.col("keep"), True)).alias("tb"),
        F.countDistinct("token").alias("vsize"),
    )
    prior = labeled.select("doc_id", "keep").agg(
        F.expr(
            "CAST(floor((ln(CAST(count(IF(keep, 1, NULL)) AS DOUBLE))"
            " - ln(CAST(count(IF(NOT keep, 1, NULL)) AS DOUBLE))) * 10000 + 0.5) AS BIGINT)"
        ).alias("q_prior")
    )
    tc = tok.groupBy("token").agg(
        F.count(F.when(F.col("keep"), True)).alias("cg"),
        F.count(F.when(~F.col("keep"), True)).alias("cb"),
    )
    llr = tc.join(F.broadcast(cls)).select(
        "token",
        F.expr(
            "CAST(floor((ln((cg + 1.0) / (tg + vsize)) - ln((cb + 1.0) / (tb + vsize)))"
            " * 10000 + 0.5) AS BIGINT)"
        ).alias("q_llr"),
    )
    return (
        tok.select("doc_id", "token")
        .join(F.broadcast(llr), on="token")
        .join(F.broadcast(prior))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("q_llr").alias("token_llr_q"),
            (F.sum("q_llr") + F.max("q_prior")).alias("total_llr_q"),
            ((F.sum("q_llr") + F.max("q_prior")) > 0).alias("pred_good"),
        )
    )


def bigram_surprisal(docs: DataFrame) -> DataFrame:
    """Interpolated bigram-LM surprisal (the KenLM-shaped quality signal one
    step up from :func:`unigram surprisal <dsir_weights>`): per-doc mean
    -ln p(w2|w1) under p = 0.75·c(w1w2)/c(w1·) + 0.25·c(w2)/N — backoff to
    the unigram keeps unseen-in-context tokens finite without add-1 washing
    out the bigram signal. Per-position surprisal is quantized to integer
    1e-4 nats BEFORE the per-doc sum (the repo-wide order-independence
    policy).

    Scale shape: one token-key agg (unigram LM, vocab-bounded → broadcast)
    and one bigram-key agg build the model; scoring is ONE bigram-key join
    (the bigram table is larger than the vocab — it shuffles, it does not
    broadcast) + ONE doc_id fold. Documents with < 2 tokens have no bigram
    positions and drop out (same as the oracle's inner join).

    Output: (doc_id, n_bigrams, total_q_nats, mean_surprisal_nats).
    """
    t = with_tokens(docs)
    ucnt = (
        t.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cu"))
    )
    tot = ucnt.agg(F.sum("cu").alias("n"))
    bg = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(tokens) >= 2 THEN"
                " transform(sequence(1, size(tokens) - 1),"
                " i -> concat(element_at(tokens, i), chr(31), element_at(tokens, i + 1)))"
                " ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("bigram"),
    )
    bcnt = bg.groupBy("bigram").agg(F.count("*").alias("cb"))
    u1 = F.broadcast(ucnt.select(F.col("token").alias("w1"), F.col("cu").alias("cu1")))
    u2 = F.broadcast(ucnt.select(F.col("token").alias("w2"), F.col("cu").alias("cu2")))
    lm = (
        bcnt.withColumn("w1", F.expr("split(bigram, chr(31))[0]"))
        .withColumn("w2", F.expr("split(bigram, chr(31))[1]"))
        .join(u1, on="w1")
        .join(u2, on="w2")
        .join(F.broadcast(tot))
        .select(
            "bigram",
            F.expr(
                "CAST(floor(-ln(0.75 * CAST(cb AS DOUBLE) / cu1"
                " + 0.25 * CAST(cu2 AS DOUBLE) / n) * 10000 + 0.5) AS BIGINT)"
            ).alias("q_nats"),
        )
    )
    return (
        bg.join(lm, on="bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("q_nats").alias("total_q_nats"),
            (F.sum("q_nats").cast("double") / 10000.0 / F.count("*")).alias(
                "mean_surprisal_nats"
            ),
        )
    )
