"""Training-data text operators over ``documents`` (north-star additions):
token counting, quality scoring, language ID, fingerprinting, dedup family.

Oracle construction: the DuckDB SQL mirrors the Spark array-expression logic
exactly (same tokenization regex, same md5-based hash family, same arithmetic),
so value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcapture_spark.catalog import register_views
from pgcapture_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from pgcapture_spark.operators.textstats import (
    LANG_MARKERS,
    LANG_ORDER,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from pgcapture_spark.queries import q

# ---------------------------------------------------------------- shared SQL

_DUCK_TOKENS = r"list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0)"
_DUCK_SHINGLES = (
    "CASE WHEN len(tokens) >= 3 THEN "
    "list_transform(range(1, len(tokens) - 1), "
    "i -> tokens[i] || ' ' || tokens[i + 1] || ' ' || tokens[i + 2]) "
    "ELSE CAST([] AS VARCHAR[]) END"
)
_DUCK_DOCS_TOK = f"SELECT doc_id, lang, text, {_DUCK_TOKENS} AS tokens FROM documents"
_DUCK_DOCS_SH = f"SELECT doc_id, tokens, {_DUCK_SHINGLES} AS shingles FROM ({_DUCK_DOCS_TOK})"


@q(
    "text_token_count",
    f"""
WITH t AS ({_DUCK_DOCS_TOK})
SELECT doc_id, len(tokens) AS n_tokens, length(text) AS n_chars_text,
       len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0))
         AS n_word_runs
FROM t
""",
    "North-star: token counting (whitespace + alnum-run tokenizers).",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    out = token_count(spark.table("documents"))
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_chars_text").cast("long").alias("n_chars_text"),
        F.col("n_word_runs").cast("long").alias("n_word_runs"),
    )


_DUCK_QUALITY = f"""
WITH t AS ({_DUCK_DOCS_TOK}),
m AS (
  SELECT doc_id,
         len(tokens) AS n_tokens,
         length(text) AS n_chars,
         CAST(coalesce(list_sum(list_transform(tokens, x -> length(x))), 0) AS DOUBLE)
           / greatest(len(tokens), 1) AS mean_token_len,
         CAST(len(list_filter(tokens, x -> x in ('the', 'a', 'of'))) AS DOUBLE)
           / greatest(len(tokens), 1) AS stopword_ratio,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS digit_ratio
  FROM t
)
SELECT doc_id, n_tokens, n_chars, mean_token_len, stopword_ratio, digit_ratio,
       0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
       + 0.3 * (1.0 - stopword_ratio)
       + 0.2 * least(mean_token_len / 8.0, 1.0)
       + 0.1 * (1.0 - digit_ratio) AS quality
FROM m
"""


@q(
    "text_quality_score",
    _DUCK_QUALITY,
    "North-star: composite quality heuristics (length/stopword/digit ratios).",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    out = quality_score(spark.table("documents"))
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
        "mean_token_len",
        "stopword_ratio",
        "digit_ratio",
        "quality",
    )


def _duck_lang_sql() -> str:
    score_cols = []
    for lang in LANG_ORDER:
        toks = ", ".join(f"'{t}'" for t in LANG_MARKERS[lang])
        score_cols.append(
            f"len(list_filter(tokens, x -> x in ({toks}))) AS score_{lang}"
        )
    whens = []
    for lang in LANG_ORDER:
        conds = " AND ".join(
            f"score_{lang} >= score_{o}" for o in LANG_ORDER if o != lang
        )
        whens.append(f"WHEN {conds} THEN '{lang}'")
    case = "CASE " + " ".join(whens) + f" ELSE '{LANG_ORDER[0]}' END"
    scores = ", ".join(f"score_{la}" for la in LANG_ORDER)
    return f"""
WITH t AS ({_DUCK_DOCS_TOK}),
s AS (SELECT doc_id, lang, {', '.join(score_cols)} FROM t),
p AS (SELECT doc_id, lang, {scores}, {case} AS predicted_lang FROM s)
SELECT doc_id, lang, {scores}, predicted_lang, predicted_lang = lang AS correct FROM p
"""


@q(
    "text_lang_id",
    _duck_lang_sql(),
    "North-star: heuristic language ID — marker-token scoring with fixed"
    " tie-break (n-gram heuristic family).",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    out = lang_id(spark.table("documents"))
    return out.select(
        "doc_id",
        "lang",
        *[F.col(f"score_{la}").cast("long").alias(f"score_{la}") for la in LANG_ORDER],
        "predicted_lang",
        "correct",
    )


@q(
    "text_fingerprint",
    f"""
WITH sh AS ({_DUCK_DOCS_SH})
SELECT doc_id,
       array_to_string(list_sort(list_transform(shingles, s -> md5(s)))[1:4], '-')
         AS fingerprint
FROM sh
""",
    "North-star: document fingerprint — k-min sketch of shingle md5s"
    " (winnowing-lite rolling-hash family).",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return fingerprint(spark.table("documents"))


# ---------------------------------------------------------------- dedup family

@q(
    "dedup_exact",
    """
SELECT md5(lower(trim(text))) AS text_hash, min(doc_id) AS canonical_id,
       count(*) AS n_docs
FROM documents GROUP BY 1
""",
    "North-star: exact dedup — digest group-by, canonical id = min doc_id.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return exact_dedup_groups(spark.table("documents"))


_DUCK_SHINGLE_SETS = f"""
SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM ({_DUCK_DOCS_SH})
"""

_DUCK_JACCARD = f"""
WITH s AS ({_DUCK_SHINGLE_SETS}),
dfc AS (SELECT shingle, count(*) AS df FROM s GROUP BY 1),
rare AS (SELECT s.doc_id, s.shingle FROM s JOIN dfc USING (shingle)
         WHERE dfc.df BETWEEN 2 AND 64),
pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
          FROM rare a JOIN rare b USING (shingle)
          WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM s GROUP BY 1),
inter AS (SELECT p.a_id, p.b_id, count(*) AS inter_cnt
          FROM pairs p
          JOIN s sa ON sa.doc_id = p.a_id
          JOIN s sb ON sb.doc_id = p.b_id AND sb.shingle = sa.shingle
          GROUP BY 1, 2)
SELECT i.a_id, i.b_id, i.inter_cnt,
       na.n_shingles + nb.n_shingles - i.inter_cnt AS union_cnt,
       CAST(i.inter_cnt AS DOUBLE) / (na.n_shingles + nb.n_shingles - i.inter_cnt) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.a_id
JOIN sizes nb ON nb.doc_id = i.b_id
WHERE CAST(i.inter_cnt AS DOUBLE) / (na.n_shingles + nb.n_shingles - i.inter_cnt) >= 0.1
"""


@q(
    "dedup_ngram_jaccard",
    _DUCK_JACCARD,
    "North-star: n-gram Jaccard near-dup — stop-shingle-pruned candidate join"
    " + true Jaccard verification.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return ngram_jaccard_pairs(spark.table("documents"), threshold=0.1, max_df=64)


def _duck_minhash_sql(k: int = 8, bands: int = 4) -> str:
    from pgcapture_spark.operators.dedup import MINHASH_P, minhash_ab

    rpb = k // bands
    sigs = ",\n       ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MINHASH_P})) AS sig_{i}"
        for i, (a, b) in enumerate(minhash_ab(k))
    )
    band_rows = "\nUNION ALL\n".join(
        "SELECT doc_id, {b} AS band_idx, md5({parts}) AS band_hash FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(
                f"CAST(sig_{b * rpb + r} AS VARCHAR)" for r in range(rpb)
            ),
        )
        for b in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.sig_{i} = sb.sig_{i} THEN 1 ELSE 0 END)" for i in range(k)
    )
    return f"""
WITH sh AS ({_DUCK_DOCS_SH}),
hashed AS (SELECT doc_id, list_transform(shingles,
             s -> ('0x' || substr(md5(s), 1, 8))::BIGINT % 1073741824) AS hs
           FROM sh),
sigs AS (SELECT doc_id, {sigs} FROM hashed),
banded AS ({band_rows}),
cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
         FROM banded a JOIN banded b USING (band_idx, band_hash)
         WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
est AS (SELECT c.a_id, c.b_id, ({agree}) / {k} AS est_sim
        FROM cand c JOIN sigs sa ON sa.doc_id = c.a_id
        JOIN sigs sb ON sb.doc_id = c.b_id),
s AS ({_DUCK_SHINGLE_SETS}),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM s GROUP BY 1),
inter AS (SELECT e.a_id, e.b_id, e.est_sim, count(*) AS inter_cnt
          FROM est e
          JOIN s sa2 ON sa2.doc_id = e.a_id
          JOIN s sb2 ON sb2.doc_id = e.b_id AND sb2.shingle = sa2.shingle
          GROUP BY 1, 2, 3)
SELECT i.a_id, i.b_id, i.est_sim,
       CAST(i.inter_cnt AS DOUBLE) / (za.n_shingles + zb.n_shingles - i.inter_cnt) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.a_id
JOIN sizes zb ON zb.doc_id = i.b_id
WHERE CAST(i.inter_cnt AS DOUBLE) / (za.n_shingles + zb.n_shingles - i.inter_cnt) >= 0.1
"""


@q(
    "dedup_minhash_lsh",
    _duck_minhash_sql(),
    "North-star: MinHash+LSH near-dup — shingle→minhash→band→bucket-join,"
    " verified by true Jaccard (the scale path).",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return minhash_lsh_pairs(spark.table("documents"), k=8, bands=4, threshold=0.1)


def _duck_simhash_sql(bits: int = 32) -> str:
    votes = ",\n       ".join(
        f"sum(CASE WHEN ((th >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS v_{b}"
        for b in range(bits)
    )
    value = " + ".join(
        f"(CASE WHEN v_{b} >= 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)" for b in range(bits)
    )
    return f"""
WITH t AS ({_DUCK_DOCS_TOK}),
toks AS (SELECT doc_id, unnest(tokens) AS token FROM t),
hashed AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 8))::BIGINT AS th FROM toks),
agg AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id)
SELECT doc_id, {value} AS simhash FROM agg
"""


@q(
    "dedup_simhash",
    _duck_simhash_sql(),
    "North-star: 32-bit SimHash — per-bit majority vote over token hashes;"
    " near-dups pair via bit_count(xor) <= r downstream.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return simhash(spark.table("documents"))


# ---------------------------------------------------------------- tf-idf

# determinism across engines: tf and idf are quantized SEPARATELY (ppm / milli)
# before the score multiply, so the only cross-engine float ops are one IEEE
# division (exact-rounded identically everywhere) and one ln() (quantized at
# 1e-3, far coarser than any libm ulp divergence); the score is then an exact
# BIGINT product. Scale: two grouped aggregations + one broadcast scalar —
# the same shape at 100 TB, no driver-side collection.
_DUCK_TFIDF = f"""
WITH t AS ({_DUCK_DOCS_TOK}),
tok AS (SELECT doc_id, unnest(tokens) AS token FROM t),
cnt AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY 1),
dfq AS (SELECT token, count(*) AS df FROM cnt GROUP BY 1),
tot AS (SELECT count(*) AS nd FROM documents),
scored AS (
  SELECT doc_id, token,
         CAST(floor(CAST(c AS DOUBLE) / CAST(n AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS tf_ppm,
         CAST(floor(ln(CAST(nd + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS idf_milli
  FROM cnt JOIN dl USING (doc_id) JOIN dfq USING (token) CROSS JOIN tot
)
SELECT doc_id, token, tf_ppm, idf_milli, tf_ppm * idf_milli AS score, rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tf_ppm * idf_milli DESC, token) AS rank
  FROM scored
)
WHERE rank <= 3
"""


@q(
    "text_tfidf_topterms",
    _DUCK_TFIDF,
    "North-star: tf-idf keyword extraction — top-3 terms per document;"
    " tf/idf quantized separately so the ranking score is an exact integer"
    " product in both engines.",
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from pgcapture_spark.operators.textstats import token_rows

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    cnt = token_rows(docs).groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    # doc length and document frequency as WINDOWS over cnt, not separate
    # aggregations: grouped-agg branches would each recompute the tokenize +
    # explode lineage (three full corpus passes in the physical plan); the
    # window chain keeps ONE pass, and the doc_id window shares its exchange
    # with the final ranking window.
    tot = docs.agg(F.count("*").alias("nd"))
    cnt = cnt.withColumn("df", F.count("*").over(W.partitionBy("token"))).withColumn(
        "n", F.sum("c").over(W.partitionBy("doc_id"))
    )
    scored = (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "token",
            F.expr(
                "CAST(floor(CAST(c AS DOUBLE) / CAST(n AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
            ).alias("tf_ppm"),
            F.expr(
                "CAST(floor(ln(CAST(nd + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)) * 1000 + 0.5) AS BIGINT)"
            ).alias("idf_milli"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(
        (F.col("tf_ppm") * F.col("idf_milli")).desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "doc_id",
            "token",
            "tf_ppm",
            "idf_milli",
            (F.col("tf_ppm") * F.col("idf_milli")).alias("score"),
            "rank",
        )
    )


# ------------------------------------------------------- document chunking

# fixed-size overlapping token windows (chunk 64, overlap 16 → stride 48) —
# the context-window splitting step of a training-data pipeline. Per-row:
# explode the stride-spaced chunk starts, slice the token array per start;
# fused into the scan, no shuffle. Tail fragments are kept (standard practice).
_CHUNK, _STRIDE = 64, 48

_CHUNK_SPARK_TPL = f"""
WITH t AS (SELECT doc_id, {{tok}} AS tokens FROM documents),
s AS (SELECT doc_id, tokens, explode(sequence(1, size(tokens), {_STRIDE})) AS st
      FROM t WHERE size(tokens) >= 1)
SELECT doc_id, CAST((st - 1) DIV {_STRIDE} AS INT) AS chunk_idx, st AS chunk_start,
       size(slice(tokens, st, {_CHUNK})) AS n_chunk_tokens,
       concat_ws(' ', slice(tokens, st, {_CHUNK})) AS chunk_text
FROM s
"""

_CHUNK_DUCK = f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS tokens FROM documents),
s AS (SELECT doc_id, tokens, unnest(range(1, len(tokens) + 1, {_STRIDE})) AS st
      FROM t WHERE len(tokens) >= 1)
SELECT doc_id, CAST((st - 1) // {_STRIDE} AS INT) AS chunk_idx, st AS chunk_start,
       len(tokens[st : st + {_CHUNK} - 1]) AS n_chunk_tokens,
       array_to_string(tokens[st : st + {_CHUNK} - 1], ' ') AS chunk_text
FROM s
"""


@q(
    "text_chunk_split",
    _CHUNK_DUCK,
    "North-star dataset build: overlapping fixed-token-window chunking"
    " (chunk 64 / stride 48) — per-row explode of stride starts + array"
    " slices, shuffle-free.",
)
def text_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import TOKENS_EXPR

    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_CHUNK_SPARK_TPL.format(tok=TOKENS_EXPR))


# ------------------------------------------------------------- PII scrubbing

# Deterministic synthetic PII is appended per doc (same expression both
# engines) so the scrub path is exercised on every row; patterns use the
# regex-dialect intersection (character classes, bounded quantifiers) that
# Java regex and RE2 interpret identically. Pure per-row string ops — fused
# into the scan, no shuffle, the 100 TB shape.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9\-]{6,}[0-9]"

_PII_AUG = (
    "text || ' Contact user' || CAST(doc_id AS {str_t}) || '@example.com'"
    " || ' or +1-555-' || CAST(1000 + doc_id % 9000 AS {str_t}) || ' now.'"
)

# Spark SQL string literals process backslash escapes; DuckDB's do not —
# double the backslashes for the Spark rendering only.
_EMAIL_RE_SP = _EMAIL_RE.replace("\\", "\\\\")
_PHONE_RE_SP = _PHONE_RE.replace("\\", "\\\\")

_PII_SPARK = f"""
WITH aug AS (SELECT doc_id, {_PII_AUG.format(str_t='STRING')} AS t FROM documents)
SELECT doc_id,
       regexp_count(t, '{_EMAIL_RE_SP}') AS n_emails,
       regexp_count(t, '{_PHONE_RE_SP}') AS n_phones,
       regexp_replace(regexp_replace(t, '{_EMAIL_RE_SP}', '<EMAIL>'),
                      '{_PHONE_RE_SP}', '<PHONE>') AS scrubbed
FROM aug
"""

_PII_DUCK = f"""
WITH aug AS (SELECT doc_id, {_PII_AUG.format(str_t='VARCHAR')} AS t FROM documents)
SELECT doc_id,
       len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones,
       regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed
FROM aug
"""


@q(
    "text_scrub_pii",
    _PII_DUCK,
    "North-star text hygiene: PII scrub — email/phone detection counts +"
    " redaction via dialect-intersection regexes; per-row, shuffle-free.",
)
def text_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_PII_SPARK)


# --------------------------------------------------------- string gauntlet

# string-function surface with identical cross-engine semantics (levenshtein,
# reverse/repeat, split_part, instr/left/right, trim family) — complements the
# date/math scalar_gauntlet.
_STRGAUNTLET_BODY = """
SELECT doc_id,
       levenshtein(substring(lower(text), 1, 12), 'data analysis') AS lev12,
       reverse(lang) AS lang_rev,
       repeat(lang, 3) AS lang3,
       split_part(source, 'rc', 2) AS src_num,
       instr(lower(text), 'the') AS first_the,
       left(text, 5) AS head5,
       right(text, 5) AS tail5,
       length(ltrim(' ' || text)) AS len_lt,
       length(rtrim(text || ' ')) AS len_rt,
       lower(substring(text, 3, 7)) AS low37,
       replace(lang, 'e', '3') AS leet
FROM documents
WHERE doc_id % 5 = 2
"""


@q(
    "text_string_gauntlet",
    _STRGAUNTLET_BODY,
    "§2.7: string scalar surface — levenshtein, reverse/repeat, split_part,"
    " instr, left/right, trim family, replace (one projection, no shuffle).",
)
def text_string_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_STRGAUNTLET_BODY)


# ---------------------------------------------------------- array gauntlet

# higher-order / array surface: distinct+sort, intersect (sorted — engines
# differ on result order), flatten, contains/position, slice, fold. One scan,
# all per-row.
# array columns are serialized to canonical strings (space-joined; tokens are
# whitespace-split so the delimiter cannot collide) — the driver's row
# canonicalizer cannot hash top-level arrays.
_ARR_SPARK_TPL = """
WITH t AS (SELECT doc_id, {tok} AS tokens FROM documents WHERE doc_id % 7 = 3)
SELECT doc_id,
       concat_ws(' ', array_sort(array_distinct(tokens))) AS uniq_sorted,
       concat_ws(' ', array_sort(array_intersect(tokens, array('the', 'data', 'row'))))
         AS marker_hits,
       CAST(size(flatten(array(slice(tokens, 1, 2), slice(tokens, 3, 2)))) AS BIGINT)
         AS flat4,
       array_contains(tokens, 'the') AS has_the,
       array_position(tokens, 'the') AS pos_the,
       element_at(tokens, 1) AS first_tok,
       aggregate(slice(tokens, 1, 10), 0L, (acc, t) -> acc + length(t)) AS len10
FROM t
"""

_ARR_DUCK = f"""
WITH t AS (SELECT doc_id, {{duck_tokens}} AS tokens FROM documents WHERE doc_id % 7 = 3)
SELECT doc_id,
       coalesce(array_to_string(list_sort(list_distinct(tokens)), ' '), '') AS uniq_sorted,
       coalesce(array_to_string(list_sort(list_intersect(tokens, ['the', 'data', 'row'])), ' '),
                '') AS marker_hits,
       CAST(len(flatten([tokens[1:2], tokens[3:4]])) AS BIGINT) AS flat4,
       list_contains(tokens, 'the') AS has_the,
       CAST(coalesce(list_position(tokens, 'the'), 0) AS BIGINT) AS pos_the,
       tokens[1] AS first_tok,
       CAST(coalesce(list_sum(list_transform(tokens[1:10], t -> length(t))), 0) AS BIGINT)
         AS len10
FROM t
"""


@q(
    "text_array_gauntlet",
    _ARR_DUCK.format(duck_tokens=_DUCK_TOKENS),
    "§2.7: array / higher-order-function surface — distinct, sorted intersect,"
    " flatten, contains/position, element_at, slice-fold — per-row, fused into"
    " the scan.",
)
def text_array_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    from pgcapture_spark.operators.textstats import TOKENS_EXPR

    return spark.sql(_ARR_SPARK_TPL.format(tok=TOKENS_EXPR))


# ------------------------------------------------------- decontamination

_DUCK_DECONT = f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS tokens FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(tokens) - 3),
                i -> array_to_string(tokens[i:i + 4], ' ')))) AS gram
  FROM t WHERE len(tokens) >= 5
),
eval_g AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 5),
train AS (SELECT doc_id, gram FROM g WHERE doc_id % 97 <> 5)
SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
FROM train tr JOIN eval_g e USING (gram)
GROUP BY tr.doc_id
"""


@q(
    "text_decontaminate",
    _DUCK_DECONT,
    "North-star: benchmark decontamination — training documents sharing any"
    " 5-token n-gram with the eval set (doc_id % 97 = 5), the train/test-"
    "overlap scrub before pre-training; eval grams broadcast, per-row gram"
    " construction fused into the scan.",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import decontaminate

    register_views(spark, sf_dir, ("documents",))
    return decontaminate(spark.table("documents"))


# ------------------------------------------------------- unigram surprisal

# per-token surprisal is quantized to integer 1e-4 nats BEFORE summing, so the
# per-doc mean is an exact integer sum (order-independent) divided at the end —
# the same float policy as the TPC-H cents sums.
_DUCK_SURPRISAL = f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS tokens FROM documents),
tok AS (SELECT doc_id, unnest(tokens) AS token FROM t),
tot AS (SELECT count(*) AS n_total FROM tok),
freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
scored AS (
  SELECT tok.doc_id,
         CAST(floor(-ln(CAST(freq.cnt AS DOUBLE) / tot.n_total) * 10000 + 0.5)
              AS BIGINT) AS q_nats
  FROM tok JOIN freq USING (token) CROSS JOIN tot
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(q_nats) AS BIGINT) AS total_q_nats,
       CAST(sum(q_nats) AS DOUBLE) / 10000.0 / count(*) AS mean_surprisal_nats
FROM scored GROUP BY doc_id
"""


@q(
    "text_unigram_surprisal",
    _DUCK_SURPRISAL,
    "North-star: unigram surprisal quality signal — per-doc mean -ln p(token)"
    " under the corpus unigram model (the importance/quality weighting used in"
    " data-selection pipelines); token surprisal quantized to integer 1e-4"
    " nats so the aggregate is order-independent and hash-exact.",
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import token_rows

    register_views(spark, sf_dir, ("documents",))
    tok = token_rows(spark.table("documents")).select("doc_id", "token")
    total = tok.agg(F.count("*").alias("n_total"))
    freq = (
        tok.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .join(F.broadcast(total))
        .select(
            "token",
            F.expr(
                "CAST(floor(-ln(CAST(cnt AS DOUBLE) / n_total) * 10000 + 0.5) AS BIGINT)"
            ).alias("q_nats"),
        )
    )
    return (
        tok.join(freq, on="token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("q_nats").alias("total_q_nats"),
            (F.sum("q_nats").cast("double") / 10000.0 / F.count("*")).alias(
                "mean_surprisal_nats"
            ),
        )
    )


# ------------------------------------------------------- corpus selection

def duck_gate_tail(
    min_quality: float = 0.5, min_tokens: int = 20, langs: tuple[str, ...] = ("en", "de")
) -> str:
    """The quality + language gate CTE tail, appended after a ``surv``
    (doc_id, text) CTE — shared by every corpus-selection oracle."""
    score_cols = []
    for lang in LANG_ORDER:
        toks = ", ".join(f"'{t}'" for t in LANG_MARKERS[lang])
        score_cols.append(
            f"len(list_filter(tokens, x -> x in ({toks}))) AS score_{lang}"
        )
    whens = []
    for lang in LANG_ORDER:
        conds = " AND ".join(
            f"score_{lang} >= score_{o}" for o in LANG_ORDER if o != lang
        )
        whens.append(f"WHEN {conds} THEN '{lang}'")
    case = "CASE " + " ".join(whens) + f" ELSE '{LANG_ORDER[0]}' END"
    in_list = ", ".join(f"'{la}'" for la in langs)
    return f""",
t AS (SELECT doc_id, text, {_DUCK_TOKENS} AS tokens FROM surv),
m AS (
  SELECT doc_id,
         len(tokens) AS n_tokens,
         length(text) AS n_chars,
         coalesce(list_sum(list_transform(tokens, x -> length(x))), 0) AS sumlen,
         len(list_filter(tokens, x -> x in ('the', 'a', 'of'))) AS stop,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS nd,
         {", ".join(score_cols)}
  FROM t
),
p AS (
  SELECT doc_id, n_tokens,
         0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
         + 0.3 * (1.0 - CAST(stop AS DOUBLE) / greatest(n_tokens, 1))
         + 0.2 * least(CAST(sumlen AS DOUBLE) / greatest(n_tokens, 1) / 8.0, 1.0)
         + 0.1 * (1.0 - CAST(nd AS DOUBLE) / greatest(n_chars, 1)) AS quality,
         {case} AS predicted_lang
  FROM m
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, quality, predicted_lang
FROM p WHERE quality >= {min_quality} AND n_tokens >= {min_tokens}
  AND predicted_lang IN ({in_list})
"""


def _duck_corpus_select_sql(
    min_quality: float = 0.5, min_tokens: int = 20, langs: tuple[str, ...] = ("en", "de")
) -> str:
    return f"""
WITH surv AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents) WHERE rn = 1
){duck_gate_tail(min_quality, min_tokens, langs)}"""


@q(
    "corpus_select_pipeline",
    _duck_corpus_select_sql(),
    "North-star: the end-to-end training-corpus SELECTION pipeline — exact"
    " dedup (keep lowest doc_id per md5(text)), composite quality gate, and"
    " language-ID gate in ONE pass: a single hash-partition shuffle (the"
    " dedup window), then all metrics (token stats + every language's marker"
    " counts) fold in one aggregate over one tokenization per surviving row."
    " No joins, no second scan — the shape that holds at 100 TB.",
)
def corpus_select_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import corpus_select

    register_views(spark, sf_dir, ("documents",))
    return corpus_select(
        spark.table("documents"), min_quality=0.5, min_tokens=20, langs=("en", "de")
    )


# ------------------------------------------------- rule gates / mix / stats

_DUCK_RULES = f"""
WITH t AS (SELECT doc_id, text, {_DUCK_TOKENS} AS tokens FROM documents),
m AS (
  SELECT doc_id,
         len(tokens) AS n_tokens,
         CAST(coalesce(list_sum(list_transform(tokens, x -> length(x))), 0) AS DOUBLE)
           / greatest(len(tokens), 1) AS mean_token_len,
         CAST(len(list_filter(tokens, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
           / greatest(len(tokens), 1) AS frac_alpha_tokens,
         CAST(length(text) - length(replace(replace(text, '#', ''), '…', '')) AS DOUBLE)
           / greatest(len(tokens), 1) AS symbol_ratio,
         CAST(len(list_distinct(tokens)) AS DOUBLE)
           / greatest(len(tokens), 1) AS frac_distinct_tokens,
         len(list_filter(['the', 'a', 'of', 'value', 'table'],
                         s -> list_contains(tokens, s))) AS n_distinct_stopwords
  FROM t)
SELECT doc_id, n_tokens, mean_token_len, frac_alpha_tokens, symbol_ratio,
       frac_distinct_tokens, n_distinct_stopwords,
       (n_tokens BETWEEN 20 AND 100000) AS r_wordcount,
       (mean_token_len BETWEEN 2.0 AND 12.0) AS r_meanlen,
       (frac_alpha_tokens >= 0.8) AS r_alpha,
       (symbol_ratio <= 0.1) AS r_symbols,
       (frac_distinct_tokens >= 0.3) AS r_distinct,
       (n_distinct_stopwords >= 2) AS r_stopwords,
       ((n_tokens BETWEEN 20 AND 100000) AND (mean_token_len BETWEEN 2.0 AND 12.0)
        AND frac_alpha_tokens >= 0.8 AND symbol_ratio <= 0.1
        AND frac_distinct_tokens >= 0.3 AND n_distinct_stopwords >= 2) AS keep
FROM m
"""


@q(
    "text_quality_rules",
    _DUCK_RULES,
    "North-star: Gopher/C4-style rule-based quality gate — token-count bounds,"
    " mean token length, alphabetic fraction, symbol ratio, distinct-token"
    " (repetition) fraction, stopword presence; per-row expressions fused"
    " into the scan, zero shuffles.",
)
def text_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import quality_rules

    register_views(spark, sf_dir, ("documents",))
    out = quality_rules(spark.table("documents"))
    return out.drop("tokens")


_DUCK_MIX = """
WITH counts AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
tot AS (SELECT CAST(sum(n_l) AS BIGINT) AS n_total,
               CAST(sum(CAST(floor(pow(n_l, 0.5) * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
                 AS w_total
        FROM counts),
rates AS (
  SELECT lang,
         least(1.0, 0.5 * CAST(CAST(floor(pow(n_l, 0.5) * 1000000 + 0.5) AS BIGINT)
                               AS DOUBLE) / w_total * n_total / n_l) AS rate
  FROM counts CROSS JOIN tot)
SELECT d.doc_id, d.lang, floor(r.rate * 1000000 + 0.5) / 1000000 AS rate
FROM documents d JOIN rates r USING (lang)
WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0
      < r.rate
"""


@q(
    "corpus_mix_sample",
    _DUCK_MIX,
    "North-star: temperature-based domain-mixture sampling (p_l ∝ n_l^0.5,"
    " the multilingual rebalance) — deterministic md5(doc_id) coin, tiny"
    " rate table broadcast back, keep decision fused into the scan.",
)
def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import mix_sample

    register_views(spark, sf_dir, ("documents",))
    return mix_sample(spark.table("documents"), alpha=0.5, target_frac=0.5)


_DUCK_STATS = f"""
WITH t AS (SELECT lang, source, len({_DUCK_TOKENS}) AS n_tokens,
                  length(text) AS n_chars FROM documents)
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS DOUBLE) / count(*) AS mean_chars,
       quantile_cont(n_tokens, 0.5) AS median_tokens,
       quantile_cont(n_tokens, 0.9) AS p90_tokens
FROM t GROUP BY lang, source
"""


@q(
    "corpus_stats",
    _DUCK_STATS,
    "North-star: per-(lang, source) dataset-card statistics — counts, token"
    " totals, exact interpolated median/p90 token counts; one tokenize, one"
    " groupBy.",
)
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import corpus_stats as _stats

    register_views(spark, sf_dir, ("documents",))
    return _stats(spark.table("documents"))


_DUCK_EDITDIST = f"""
WITH pairs AS (SELECT a_id, b_id, jaccard FROM ({_duck_minhash_sql()}) mh),
t AS (SELECT doc_id, substr(text, 1, 120) AS pfx FROM documents)
SELECT p.a_id, p.b_id, p.jaccard,
       CAST(levenshtein(ta.pfx, tb.pfx) AS BIGINT) AS lev,
       CAST(levenshtein(ta.pfx, tb.pfx) AS DOUBLE)
         / greatest(length(ta.pfx), length(tb.pfx), 1) AS norm_lev,
       (CAST(levenshtein(ta.pfx, tb.pfx) AS DOUBLE)
         / greatest(length(ta.pfx), length(tb.pfx), 1) <= 0.8) AS near_dup
FROM pairs p JOIN t ta ON ta.doc_id = p.a_id JOIN t tb ON tb.doc_id = p.b_id
"""


@q(
    "dedup_editdist_verify",
    _DUCK_EDITDIST,
    "North-star: fuzzy dedup second stage — MinHash-LSH candidates re-verified"
    " by Levenshtein over fixed 120-char prefixes (O(prefix²) per pair, never"
    " O(len²) on unbounded docs); candidates stay LSH-bounded, never"
    " all-pairs.",
)
def dedup_editdist_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.dedup import editdist_verified_pairs

    register_views(spark, sf_dir, ("documents",))
    return editdist_verified_pairs(spark.table("documents"))


_DUCK_LINE_DEDUP = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
idx AS (
  SELECT doc_id, ts,
         unnest(range(0, CAST(ceil(len(ts) / 10.0) AS BIGINT))) AS i
  FROM toks
),
lines AS (
  SELECT doc_id, CAST(i AS BIGINT) AS line_no,
         array_to_string(ts[i * 10 + 1 : i * 10 + 10], ' ') AS line
  FROM idx
),
marked AS (
  SELECT doc_id, line_no, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
  FROM lines
)
SELECT doc_id, count(*) AS n_lines,
       count(*) FILTER (WHERE rn = 1) AS n_kept,
       coalesce(string_agg(line, ' ' ORDER BY line_no) FILTER (WHERE rn = 1), '')
         AS dedup_text
FROM marked GROUP BY doc_id
"""


@q(
    "text_line_dedup",
    _DUCK_LINE_DEDUP,
    "North-star: corpus-wide line-level exact dedup (C4 / Lee et al. stage) —"
    " 10-token lines, first occurrence wins corpus-wide, documents reassembled"
    " from survivors. One line-key shuffle + one doc_id shuffle.",
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import line_dedup

    register_views(spark, sf_dir, ("documents",))
    return line_dedup(spark.table("documents"))


_DUCK_SHARD_PLAN = """
WITH t AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
              AS INT) AS shard,
         doc_id, length(text) AS n_chars,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> length(x) > 0)) AS n_toks
  FROM documents
)
SELECT shard, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM t GROUP BY shard
"""


@q(
    "corpus_shard_plan",
    _DUCK_SHARD_PLAN,
    "North-star: deterministic export-shard manifest — engine-independent"
    " md5(doc_id) shard assignment with per-shard doc/char/token totals and"
    " id bounds (the skew check before a 100 TB partitioned write).",
)
def corpus_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import shard_plan

    register_views(spark, sf_dir, ("documents",))
    return shard_plan(spark.table("documents"))


_DUCK_DSIR = f"""
WITH tok AS (
  SELECT doc_id, lang = 'en' AS is_tgt, unnest({_DUCK_TOKENS}) AS token
  FROM documents
),
cnt AS (
  SELECT token, count(*) AS cnt_r,
         count(*) FILTER (WHERE is_tgt) AS cnt_t
  FROM tok GROUP BY token
),
tot AS (SELECT CAST(sum(cnt_r) AS BIGINT) AS n_r, CAST(sum(cnt_t) AS BIGINT) AS n_t,
               count(*) AS vocab FROM cnt),
lm AS (
  SELECT token,
         CAST(floor((ln((CAST(cnt_t AS DOUBLE) + 1.0) / (n_t + vocab))
                   - ln((CAST(cnt_r AS DOUBLE) + 1.0) / (n_r + vocab)))
                   * 10000 + 0.5) AS BIGINT) AS q_ratio
  FROM cnt CROSS JOIN tot
)
SELECT t.doc_id, count(*) AS n_tokens,
       CAST(sum(l.q_ratio) AS BIGINT) AS total_q_nats,
       CAST(sum(l.q_ratio) AS DOUBLE) / 10000.0 / count(*) AS mean_logratio_nats,
       CAST(sum(l.q_ratio) AS BIGINT) > 0 AS keep
FROM tok t JOIN lm l USING (token)
GROUP BY t.doc_id
"""


@q(
    "corpus_dsir_weights",
    _DUCK_DSIR,
    "North-star: DSIR importance weights — per-doc mean log"
    " p_target/p_raw under add-1 unigram LMs (target = lang 'en'),"
    " integer-quantized per token so the aggregate is order-independent;"
    " two LM aggs + one token join + one doc groupBy.",
)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import dsir_weights

    register_views(spark, sf_dir, ("documents",))
    return dsir_weights(spark.table("documents"))


_DUCK_DOMAIN_CAP = f"""
WITH t AS ({_DUCK_DOCS_TOK}),
m AS (
  SELECT doc_id, source,
         len(tokens) AS n_tokens,
         length(text) AS n_chars,
         CAST(coalesce(list_sum(list_transform(tokens, x -> length(x))), 0) AS DOUBLE)
           / greatest(len(tokens), 1) AS mean_token_len,
         CAST(len(list_filter(tokens, x -> x in ('the', 'a', 'of'))) AS DOUBLE)
           / greatest(len(tokens), 1) AS stopword_ratio,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS digit_ratio
  FROM (SELECT d.doc_id, d.source, d.text, {_DUCK_TOKENS} AS tokens
        FROM documents d) AS sub(doc_id, source, text, tokens)
),
scored AS (
  SELECT doc_id, source, n_tokens,
         0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
         + 0.3 * (1.0 - stopword_ratio)
         + 0.2 * least(mean_token_len / 8.0, 1.0)
         + 0.1 * (1.0 - digit_ratio) AS quality
  FROM m
),
ranked AS (
  SELECT doc_id, source, n_tokens, quality,
         row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id)
           AS source_rank
  FROM scored
)
SELECT doc_id, source, n_tokens,
       floor(quality * 1000000 + 0.5) / 1000000 AS quality_q,
       source_rank, source_rank <= 15 AS keep
FROM ranked
"""


@q(
    "corpus_domain_cap",
    _DUCK_DOMAIN_CAP,
    "North-star: per-domain frequency capping — at most K docs per source,"
    " ranked by the quality heuristic (ties by doc_id); the Common-Crawl"
    " 'cap each domain' curation stage. One shuffle on the domain key,"
    " rank-only window state.",
)
def corpus_domain_cap(spark: SparkSession, sf_dir: str, k: int = 15) -> DataFrame:
    from pyspark.sql import Window as W

    register_views(spark, sf_dir, ("documents",))
    scored = quality_score(
        spark.table("documents")
    ).join(spark.table("documents").select("doc_id", "source"), "doc_id")
    w = W.partitionBy("source").orderBy(F.col("quality").desc(), F.col("doc_id"))
    return (
        scored.withColumn("source_rank", F.row_number().over(w))
        .select(
            "doc_id",
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.floor(F.col("quality") * 1000000 + F.lit(0.5)) / 1000000).alias(
                "quality_q"
            ),
            "source_rank",
            (F.col("source_rank") <= k).alias("keep"),
        )
    )


# ------------------------------------------------------- substring dedup

_SUBSTR_K = 8

_DUCK_SUBSTR_DEDUP = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
gpos AS (SELECT doc_id, ts,
                unnest(CASE WHEN len(ts) >= {_SUBSTR_K}
                            THEN range(1, len(ts) - {_SUBSTR_K} + 2) ELSE [] END) AS pos
         FROM t),
g AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
             array_to_string(ts[pos:pos + {_SUBSTR_K} - 1], ' ') AS gram
      FROM gpos),
r AS (SELECT doc_id, pos,
             row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn,
             count(*) OVER (PARTITION BY gram) AS cnt
      FROM g),
covx AS (SELECT doc_id, pos, unnest(range(0, {_SUBSTR_K})) AS off
         FROM r WHERE cnt >= 2 AND rn >= 2),
cov AS (SELECT DISTINCT doc_id, pos + off AS cp FROM covx),
tokpos AS (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS pos FROM t),
tok AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, ts[pos] AS tok FROM tokpos)
SELECT tok.doc_id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(cov.cp) AS BIGINT) AS n_removed,
       coalesce(string_agg(CASE WHEN cov.cp IS NULL THEN tok.tok END,
                           ' ' ORDER BY tok.pos), '') AS dedup_text
FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.cp
GROUP BY tok.doc_id
"""


@q(
    "dedup_substring",
    _DUCK_SUBSTR_DEDUP,
    "North-star: exact substring-span dedup (Lee et al. 2021) — every 8-token"
    " gram repeated corpus-wide keeps its first occurrence, later occurrences"
    " mark their token span for removal, documents reassembled from"
    " survivors; gram-cover restatement of the paper's suffix-array pass"
    " (one gram-key shuffle, rank-only window state).",
)
def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import substring_dedup

    register_views(spark, sf_dir, ("documents",))
    return substring_dedup(spark.table("documents"), k=_SUBSTR_K)


# ------------------------------------------------------- NB quality model

# labels = the quality_rules conjunction (the _DUCK_RULES battery), re-stated
# here as a CTE so the oracle is self-contained.
_DUCK_NB_QUALITY = f"""
WITH t AS (SELECT doc_id, text, {_DUCK_TOKENS} AS tokens FROM documents),
m AS (
  SELECT doc_id, tokens,
         len(tokens) AS n_tokens,
         CAST(coalesce(list_sum(list_transform(tokens, x -> length(x))), 0) AS DOUBLE)
           / greatest(len(tokens), 1) AS mean_token_len,
         CAST(len(list_filter(tokens, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
           / greatest(len(tokens), 1) AS frac_alpha_tokens,
         CAST(length(text) - length(replace(replace(text, '#', ''), '…', ''))
              AS DOUBLE) / greatest(len(tokens), 1) AS symbol_ratio,
         CAST(len(list_distinct(tokens)) AS DOUBLE)
           / greatest(len(tokens), 1) AS frac_distinct_tokens,
         len(list_filter(['the', 'a', 'of', 'value', 'table'],
                         s -> list_contains(tokens, s))) AS n_distinct_stopwords
  FROM t),
lab AS (
  SELECT doc_id, tokens,
         ((n_tokens BETWEEN 20 AND 100000) AND (mean_token_len BETWEEN 2.0 AND 12.0)
          AND frac_alpha_tokens >= 0.8 AND symbol_ratio <= 0.1
          AND frac_distinct_tokens >= 0.3 AND n_distinct_stopwords >= 2) AS keep
  FROM m),
tok AS (SELECT doc_id, keep, unnest(tokens) AS token FROM lab),
cls AS (SELECT count(*) FILTER (WHERE keep) AS tg,
               count(*) FILTER (WHERE NOT keep) AS tb,
               count(DISTINCT token) AS vsize
        FROM tok),
prior AS (SELECT CAST(floor((ln(count(*) FILTER (WHERE keep) * 1.0)
                 - ln(count(*) FILTER (WHERE NOT keep) * 1.0)) * 10000 + 0.5)
                 AS BIGINT) AS q_prior
          FROM lab),
tc AS (SELECT token, count(*) FILTER (WHERE keep) AS cg,
              count(*) FILTER (WHERE NOT keep) AS cb
       FROM tok GROUP BY token),
llr AS (SELECT token,
               CAST(floor((ln((cg + 1.0) / (tg + vsize))
                    - ln((cb + 1.0) / (tb + vsize))) * 10000 + 0.5) AS BIGINT) AS q_llr
        FROM tc CROSS JOIN cls)
SELECT tok.doc_id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(q_llr) AS BIGINT) AS token_llr_q,
       CAST(sum(q_llr) + max(q_prior) AS BIGINT) AS total_llr_q,
       (sum(q_llr) + max(q_prior) > 0) AS pred_good
FROM tok JOIN llr USING (token) CROSS JOIN prior
GROUP BY tok.doc_id
"""


@q(
    "text_nb_quality",
    _DUCK_NB_QUALITY,
    "North-star: model-based quality classifier (CCNet/GPT-3 stage) —"
    " multinomial Naive Bayes seeded by the rule-gate labels, add-1"
    " smoothed, per-token LLR quantized to integer 1e-4 nats; model is"
    " vocab-bounded and broadcast, corpus touched twice (count + score).",
)
def text_nb_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import nb_quality_classifier

    register_views(spark, sf_dir, ("documents",))
    return nb_quality_classifier(spark.table("documents"))


# ------------------------------------------------------- bigram surprisal

_DUCK_BIGRAM_SURPRISAL = f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS tokens FROM documents),
uni AS (SELECT unnest(tokens) AS token FROM t),
ucnt AS (SELECT token, count(*) AS cu FROM uni GROUP BY token),
tot AS (SELECT count(*) AS n FROM uni),
bg AS (SELECT doc_id, unnest(CASE WHEN len(tokens) >= 2
         THEN list_transform(range(1, len(tokens)),
                             i -> tokens[i] || chr(31) || tokens[i + 1])
         ELSE [] END) AS bigram FROM t),
bcnt AS (SELECT bigram, count(*) AS cb FROM bg GROUP BY bigram),
lm AS (
  SELECT bcnt.bigram,
         CAST(floor(-ln(0.75 * CAST(bcnt.cb AS DOUBLE) / u1.cu
                        + 0.25 * CAST(u2.cu AS DOUBLE) / tot.n)
              * 10000 + 0.5) AS BIGINT) AS q_nats
  FROM bcnt
  JOIN ucnt u1 ON u1.token = string_split(bcnt.bigram, chr(31))[1]
  JOIN ucnt u2 ON u2.token = string_split(bcnt.bigram, chr(31))[2]
  CROSS JOIN tot)
SELECT bg.doc_id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(q_nats) AS BIGINT) AS total_q_nats,
       CAST(sum(q_nats) AS DOUBLE) / 10000.0 / count(*) AS mean_surprisal_nats
FROM bg JOIN lm USING (bigram)
GROUP BY bg.doc_id
"""


@q(
    "text_bigram_surprisal",
    _DUCK_BIGRAM_SURPRISAL,
    "North-star: interpolated bigram-LM surprisal (KenLM-shaped quality"
    " signal) — per-doc mean -ln(0.75·p_bigram + 0.25·p_unigram), per-"
    "position surprisal quantized to integer 1e-4 nats; unigram LM"
    " broadcast, bigram table shuffle-joined (larger than vocab).",
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import bigram_surprisal

    register_views(spark, sf_dir, ("documents",))
    return bigram_surprisal(spark.table("documents"))


# ------------------------------------------------------- containment dedup

_DUCK_CONTAINMENT = f"""
WITH s AS ({_DUCK_SHINGLE_SETS}),
dfc AS (SELECT shingle, count(*) AS df FROM s GROUP BY 1),
rare AS (SELECT s.doc_id, s.shingle FROM s JOIN dfc USING (shingle)
         WHERE dfc.df BETWEEN 2 AND 64),
pairs AS (SELECT a.doc_id AS contained_id, b.doc_id AS container_id
          FROM rare a JOIN rare b USING (shingle)
          WHERE a.doc_id <> b.doc_id GROUP BY 1, 2
          HAVING count(*) >= 2),
sizes AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
inter AS (SELECT p.contained_id, p.container_id, count(*) AS inter_cnt
          FROM pairs p
          JOIN s sa ON sa.doc_id = p.contained_id
          JOIN s sb ON sb.doc_id = p.container_id AND sb.shingle = sa.shingle
          GROUP BY 1, 2)
SELECT i.contained_id, i.container_id, i.inter_cnt,
       CAST(na.n AS BIGINT) AS n_contained,
       CAST(i.inter_cnt AS DOUBLE) / na.n AS containment
FROM inter i JOIN sizes na ON na.doc_id = i.contained_id
WHERE CAST(i.inter_cnt AS DOUBLE) / na.n >= 0.5
"""


@q(
    "dedup_containment",
    _DUCK_CONTAINMENT,
    "North-star: DIRECTED shingle-containment near-dup — |sh(A)∩sh(B)|/|sh(A)|"
    " catches quotes and boilerplate supersets that symmetric Jaccard misses;"
    " stop-shingle-pruned candidates must share >= 2 pruned shingles (the"
    " recall/cost dial, ~10x fewer candidates), per-row array_intersect"
    " verification once per unordered pair, both directions emitted at 0.5.",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.dedup import containment_pairs

    register_views(spark, sf_dir, ("documents",))
    return containment_pairs(spark.table("documents"), threshold=0.5)


# ------------------------------------------------------- perplexity buckets

_DUCK_PPL_BUCKETS = f"""
WITH t AS (SELECT doc_id, lang, {_DUCK_TOKENS} AS tokens FROM documents),
tok AS (SELECT doc_id, unnest(tokens) AS token FROM t),
tot AS (SELECT count(*) AS n_total FROM tok),
freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
scored AS (
  SELECT tok.doc_id,
         CAST(floor(-ln(CAST(freq.cnt AS DOUBLE) / tot.n_total) * 10000 + 0.5)
              AS BIGINT) AS q_nats
  FROM tok JOIN freq USING (token) CROSS JOIN tot),
per_doc AS (
  SELECT s.doc_id, t.lang,
         CAST(floor(CAST(sum(q_nats) AS DOUBLE) / count(*)) AS BIGINT) AS q_mean
  FROM scored s JOIN t ON t.doc_id = s.doc_id GROUP BY s.doc_id, t.lang),
hist AS (SELECT lang, q_mean, count(*) AS cnt FROM per_doc GROUP BY 1, 2),
cum AS (SELECT lang, q_mean,
               CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY q_mean) AS BIGINT)
                 AS cum,
               CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n FROM hist),
b AS (SELECT lang,
             min(CASE WHEN cum >= ceil(n / 3.0) THEN q_mean END) AS b1,
             min(CASE WHEN cum >= ceil(2 * n / 3.0) THEN q_mean END) AS b2
      FROM cum GROUP BY lang)
SELECT p.doc_id, p.lang, p.q_mean,
       CASE WHEN q_mean <= b1 THEN 'head'
            WHEN q_mean <= b2 THEN 'middle' ELSE 'tail' END AS ppl_bucket
FROM per_doc p JOIN b USING (lang)
"""


@q(
    "corpus_perplexity_buckets",
    _DUCK_PPL_BUCKETS,
    "North-star: CCNet head/middle/tail — per-language perplexity terciles"
    " of the unigram-LM surprisal; tercile THRESHOLDS come from the per-"
    "language histogram of integer-quantized scores (sketch-sized cumulative"
    " window, broadcast back), NOT a corpus-wide rank — the assignment is a"
    " per-row comparison, scale-exact up to quantization ties.",
)
def corpus_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from pgcapture_spark.operators.textstats import token_rows

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    tok = token_rows(docs).select("doc_id", "token")
    total = tok.agg(F.count("*").alias("n_total"))
    freq = (
        tok.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .join(F.broadcast(total))
        .select(
            "token",
            F.expr(
                "CAST(floor(-ln(CAST(cnt AS DOUBLE) / n_total) * 10000 + 0.5) AS BIGINT)"
            ).alias("q_nats"),
        )
    )
    per_doc = (
        tok.join(F.broadcast(freq), on="token")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "CAST(floor(CAST(sum(q_nats) AS DOUBLE) / count(*)) AS BIGINT)"
            ).alias("q_mean")
        )
        .join(docs.select("doc_id", "lang"), on="doc_id")
    )
    hist = per_doc.groupBy("lang", "q_mean").agg(F.count("*").alias("cnt"))
    cum = hist.select(
        "lang",
        "q_mean",
        F.sum("cnt").over(W.partitionBy("lang").orderBy("q_mean")).alias("cum"),
        F.sum("cnt").over(W.partitionBy("lang")).alias("n"),
    )
    b = cum.groupBy("lang").agg(
        F.min(F.when(F.expr("cum >= ceil(n / 3.0)"), F.col("q_mean"))).alias("b1"),
        F.min(F.when(F.expr("cum >= ceil(2 * n / 3.0)"), F.col("q_mean"))).alias("b2"),
    )
    return per_doc.join(F.broadcast(b), on="lang").select(
        "doc_id",
        "lang",
        "q_mean",
        F.expr(
            "CASE WHEN q_mean <= b1 THEN 'head'"
            " WHEN q_mean <= b2 THEN 'middle' ELSE 'tail' END"
        ).alias("ppl_bucket"),
    )


# ------------------------------------------------- dedup evaluation harness

_EVAL_MIN_AGREE = 2  # of 8 signatures (est_sim >= 0.25)

def _duck_lsh_pred_cte(k: int = 8, bands: int = 4, min_agree: int = _EVAL_MIN_AGREE) -> str:
    """The shared CTE chain shingles -> minhash sigs -> banded buckets ->
    candidate pairs -> agreement-verified pairs (``pred``), used by both the
    eval harness and the keep-first oracles — ONE definition of the LSH
    candidate semantics on the DuckDB side."""
    from pgcapture_spark.operators.dedup import MINHASH_P, minhash_ab

    rpb = k // bands
    sigs = ",\n       ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MINHASH_P})) AS sig_{i}"
        for i, (a, b) in enumerate(minhash_ab(k))
    )
    band_rows = "\nUNION ALL\n".join(
        "SELECT doc_id, {b} AS band_idx, md5({parts}) AS band_hash FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(
                f"CAST(sig_{b * rpb + r} AS VARCHAR)" for r in range(rpb)
            ),
        )
        for b in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.sig_{i} = sb.sig_{i} THEN 1 ELSE 0 END)" for i in range(k)
    )
    return f"""sh AS ({_DUCK_DOCS_SH}),
hashed AS (SELECT doc_id, list_transform(shingles,
             s -> ('0x' || substr(md5(s), 1, 8))::BIGINT % 1073741824) AS hs
           FROM sh),
sigs AS (SELECT doc_id, {sigs} FROM hashed),
banded AS ({band_rows}),
cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
         FROM banded a JOIN banded b USING (band_idx, band_hash)
         WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
pred AS (SELECT c.a_id, c.b_id
         FROM cand c JOIN sigs sa ON sa.doc_id = c.a_id
         JOIN sigs sb ON sb.doc_id = c.b_id
         WHERE ({agree}) >= {min_agree})"""


def duck_lsh_keepfirst_sql(k: int = 8, bands: int = 4) -> str:
    """Oracle for the streamed keep-first dedup: a doc survives iff NO
    lower-id doc is an agreement-verified LSH candidate against it."""
    return f"""
WITH {_duck_lsh_pred_cte(k, bands)}
SELECT d.doc_id
FROM documents d
WHERE d.doc_id NOT IN (SELECT b_id FROM pred)
"""


def _duck_lsh_eval_sql(k: int = 8, bands: int = 4) -> str:
    return f"""
WITH {_duck_lsh_pred_cte(k, bands)},
s AS ({_DUCK_SHINGLE_SETS}),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM s GROUP BY 1),
inter AS (SELECT sa2.doc_id AS a_id, sb2.doc_id AS b_id, count(*) AS inter_cnt
          FROM s sa2 JOIN s sb2 ON sb2.shingle = sa2.shingle
           AND sa2.doc_id < sb2.doc_id
          GROUP BY 1, 2),
truth AS (
  SELECT i.a_id, i.b_id
  FROM inter i JOIN sizes za ON za.doc_id = i.a_id
  JOIN sizes zb ON zb.doc_id = i.b_id
  WHERE CAST(i.inter_cnt AS DOUBLE)
        / (za.n_shingles + zb.n_shingles - i.inter_cnt) >= 0.1),
hit AS (SELECT a_id, b_id FROM pred INTERSECT SELECT a_id, b_id FROM truth)
SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
       CAST((SELECT count(*) FROM pred) AS BIGINT) AS n_pred,
       CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit,
       CAST(1000 * (SELECT count(*) FROM hit)
            // GREATEST((SELECT count(*) FROM pred), 1) AS BIGINT)
         AS precision_milli,
       CAST(1000 * (SELECT count(*) FROM hit)
            // GREATEST((SELECT count(*) FROM truth), 1) AS BIGINT)
         AS recall_milli
"""


@q(
    "dedup_lsh_eval",
    _duck_lsh_eval_sql(),
    "North-star evaluation harness: precision/recall of the MinHash-LSH"
    " candidate generator (agree>=2 of 8 signatures) against EXACT ground"
    " truth — uncapped inverted-index pairs verified by true Jaccard>=0.1."
    " The quality contract behind dedup_minhash_lsh, the near-dup analog of"
    " sim_ann_recall. Ground truth is the evaluation arm (run on a sample"
    " at corpus scale); metrics are integer milli-units, order-independent.",
)
def dedup_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.dedup import (
        exact_jaccard_pairs_uncapped,
        lsh_candidate_pairs,
    )

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    pred = (
        lsh_candidate_pairs(docs, k=8, bands=4, min_agree=_EVAL_MIN_AGREE)
        .select("a_id", "b_id")
        .withColumn("in_pred", F.lit(1).cast("long"))
    )
    truth = (
        exact_jaccard_pairs_uncapped(docs, threshold=0.1)
        .select("a_id", "b_id")
        .withColumn("in_truth", F.lit(1).cast("long"))
    )
    # full-outer tag join + ONE aggregation: each heavy lineage (banded LSH
    # candidates, exact inverted-index truth) is evaluated exactly once —
    # an intersect + three separate count aggs would run both twice
    counts = (
        pred.join(truth, on=["a_id", "b_id"], how="full")
        .agg(
            F.coalesce(F.sum("in_truth"), F.lit(0)).cast("long").alias("n_truth"),
            F.coalesce(F.sum("in_pred"), F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce(F.sum(F.col("in_pred") * F.col("in_truth")), F.lit(0))
            .cast("long")
            .alias("n_hit"),
        )
    )
    return counts.select(
        "n_truth",
        "n_pred",
        "n_hit",
        F.expr("1000L * n_hit DIV GREATEST(n_pred, 1L)").alias("precision_milli"),
        F.expr("1000L * n_hit DIV GREATEST(n_truth, 1L)").alias("recall_milli"),
    )


# --------------------------------------------- cross-source contamination

_DUCK_XSOURCE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, source, unnest(shingles) AS shingle
  FROM (SELECT doc_id, source, {_DUCK_SHINGLES} AS shingles
        FROM (SELECT doc_id, source, {_DUCK_TOKENS} AS tokens FROM documents))
),
df AS (SELECT shingle FROM sh GROUP BY shingle
       HAVING count(*) BETWEEN 2 AND 64),
ss AS (SELECT s.shingle, s.source, CAST(count(*) AS BIGINT) AS n
       FROM sh s JOIN df USING (shingle) GROUP BY 1, 2)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(count(*) AS BIGINT) AS n_shared_shingles,
       CAST(sum(a.n * b.n) AS BIGINT) AS n_doc_pairs
FROM ss a JOIN ss b ON a.shingle = b.shingle AND a.source < b.source
GROUP BY 1, 2
"""


@q(
    "corpus_cross_source_overlap",
    _DUCK_XSOURCE,
    "Curation diagnostic: the cross-source contamination matrix — for every"
    " source pair, how many 3-gram shingles (document frequency capped to"
    " [2, 64], the stop-shingle prune shared with dedup_ngram_jaccard) appear"
    " in both, and how many document pairs they connect. The self-join runs"
    " on per-(shingle, source) COUNTS, never exploded doc pairs — the pair"
    " count is Σ n_a·n_b, so a 100 TB corpus joins |shingles|-sized sides.",
)
def corpus_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import with_shingles

    register_views(spark, sf_dir, ("documents",))
    sh = (
        with_shingles(spark.table("documents"))
        .where(F.size("shingles") > 0)
        .select("doc_id", "source", F.explode(F.array_distinct("shingles")).alias("shingle"))
    )
    # aggregate ONCE to (shingle, source) counts; df per shingle is then the
    # sum over sources of those counts. The counts table is consumed three
    # times (df branch + both sides of the pair self-join), so it is
    # persisted — post-aggregation it is bounded by distinct shingles x
    # sources, never corpus rows; without it the tokenize+explode lineage
    # runs four times.
    ss0 = (
        sh.groupBy("shingle", "source")
        .agg(F.count("*").cast("long").alias("n"))
        .persist()
    )
    df_ok = (
        ss0.groupBy("shingle")
        .agg(F.sum("n").alias("_df"))
        .where((F.col("_df") >= 2) & (F.col("_df") <= 64))
        .select("shingle")
    )
    ss = ss0.join(df_ok, "shingle")
    a, b = ss.alias("a"), ss.alias("b")
    return (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(
            F.count("*").cast("long").alias("n_shared_shingles"),
            F.sum(F.col("a.n") * F.col("b.n")).cast("long").alias("n_doc_pairs"),
        )
    )


# ------------------------------------------------------- vocabulary coverage

_OOV_VOCAB_N = 256

# deterministic vocab: top-N tokens by (global count DESC, token ASC). The
# vocab is a CONSTANT-N table — broadcast to the per-token membership join;
# the per-doc rate then folds in the doc_id aggregate. rank (not row_number)
# would admit >N on count ties, so the tie-break is part of the contract.
_DUCK_OOV = f"""
WITH tok AS (SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents),
cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
vocab AS (SELECT token FROM cnt
          ORDER BY c DESC, token ASC LIMIT {_OOV_VOCAB_N}),
tagged AS (SELECT t.doc_id,
                  CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS is_oov
           FROM tok t LEFT JOIN vocab v ON t.token = v.token)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(is_oov) AS BIGINT) AS n_oov,
       floor(CAST(sum(is_oov) AS DOUBLE) / count(*) * 1000000 + 0.5)
         / 1000000 AS oov_rate_q
FROM tagged GROUP BY doc_id
"""


@q(
    "text_oov_rate",
    _DUCK_OOV,
    "North-star tokenizer diagnostics: per-document out-of-vocabulary rate"
    " against a corpus-derived top-256 vocab (count DESC, token ASC"
    " tie-break) — the vocab is constant-N so membership is a broadcast"
    " join; token counts and the per-doc fold are the only shuffles. The"
    " coverage signal that sizes a tokenizer's vocab before training.",
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import token_rows

    register_views(spark, sf_dir, ("documents",))
    tok = token_rows(spark.table("documents"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("token").asc())
        .limit(_OOV_VOCAB_N)
        .select("token")
    )
    tagged = tok.join(F.broadcast(vocab.withColumn("_v", F.lit(1))), "token", "left")
    return tagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("_v").isNull(), 1).otherwise(0)).cast("long").alias("n_oov"),
        F.expr(
            "floor(CAST(sum(CASE WHEN _v IS NULL THEN 1 ELSE 0 END) AS DOUBLE)"
            " / count(*) * 1000000 + 0.5) / 1000000"
        ).alias("oov_rate_q"),
    )


# ------------------------------------------------------------ Zipf slope

_ZIPF_TOP_N = 1000

# Least-squares fit of ln(freq) against ln(rank) over the top-N tokens — the
# corpus-health diagnostic (natural text tracks slope ~ -1; synthetic or
# boilerplate-heavy corpora drift off). Token counts are exact ints; the
# top-N table is CONSTANT-N (rank ties broken by token, same contract as
# text_oov_rate's vocab); the regression sums fold over ONE rank-ordered
# array in a single row, so the double accumulation order is identical in
# both engines (the 1000-element collect is bounded, like the IVF centroid
# gather).
_DUCK_ZIPF = f"""
WITH tok AS (SELECT unnest({_DUCK_TOKENS}) AS token FROM documents),
cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY token),
top0 AS (SELECT token, c FROM cnt ORDER BY c DESC, token ASC LIMIT {_ZIPF_TOP_N}),
top AS (SELECT c, row_number() OVER (ORDER BY c DESC, token ASC) AS r FROM top0),
arr AS (SELECT list(ln(CAST(r AS DOUBLE)) ORDER BY r) AS xs,
               list(ln(CAST(c AS DOUBLE)) ORDER BY r) AS ys,
               CAST(count(*) AS BIGINT) AS n
        FROM top),
s AS (SELECT n,
             list_reduce(xs, (a, b) -> a + b) AS sx,
             list_reduce(ys, (a, b) -> a + b) AS sy,
             list_reduce(list_transform(xs, x -> x * x), (a, b) -> a + b) AS sxx,
             list_reduce(list_transform(range(1, len(xs) + 1),
                                        i -> xs[i] * ys[i]), (a, b) -> a + b) AS sxy
      FROM arr)
SELECT n,
       floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1000000 + 0.5)
         / 1000000 AS slope_q,
       floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
             * 1000000 + 0.5) / 1000000 AS intercept_q
FROM s
"""

_SPARK_ZIPF = f"""
WITH tok AS (SELECT explode({{tokens}}) AS token FROM documents),
cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY token),
top0 AS (SELECT token, c FROM cnt ORDER BY c DESC, token ASC LIMIT {_ZIPF_TOP_N}),
top AS (SELECT c, row_number() OVER (ORDER BY c DESC, token ASC) AS r FROM top0),
arr AS (SELECT transform(array_sort(collect_list(struct(r, CAST(r AS DOUBLE) AS rd, CAST(c AS DOUBLE) AS cd))),
                         y -> ln(y.rd)) AS xs,
               transform(array_sort(collect_list(struct(r, CAST(r AS DOUBLE) AS rd, CAST(c AS DOUBLE) AS cd))),
                         y -> ln(y.cd)) AS ys,
               CAST(count(*) AS BIGINT) AS n
        FROM top),
s AS (SELECT n,
             aggregate(xs, CAST(0.0 AS DOUBLE), (a, b) -> a + b) AS sx,
             aggregate(ys, CAST(0.0 AS DOUBLE), (a, b) -> a + b) AS sy,
             aggregate(transform(xs, x -> x * x), CAST(0.0 AS DOUBLE),
                       (a, b) -> a + b) AS sxx,
             aggregate(zip_with(xs, ys, (x, y) -> x * y), CAST(0.0 AS DOUBLE),
                       (a, b) -> a + b) AS sxy
      FROM arr)
SELECT n,
       floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1000000 + 0.5)
         / 1000000 AS slope_q,
       floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
             * 1000000 + 0.5) / 1000000 AS intercept_q
FROM s
"""


@q(
    "text_zipf_slope",
    _DUCK_ZIPF,
    "North-star corpus-health diagnostic: least-squares Zipf slope of"
    " ln(freq) vs ln(rank) over the top-1000 tokens (count DESC, token"
    " tie-break) — natural text sits near -1, synthetic/boilerplate corpora"
    " drift. Exact integer counts; the regression folds over ONE bounded"
    " rank-ordered array so the double accumulation order matches across"
    " engines.",
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import TOKENS_EXPR

    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_SPARK_ZIPF.format(tokens=TOKENS_EXPR))
