"""Ranked retrieval over the document corpus: BM25 scoring and the
inverted-index build — the search-side operators a training-data pipeline
uses for decontamination lookups, boilerplate hunting, and corpus QA
(complementing `text_decontaminate`'s n-gram overlap with term-ranked
retrieval).

Float policy (same as `text_unigram_surprisal` / `text_tfidf_topterms`):
the per-(doc, term) BM25 contribution is quantized to an integer 1e-4 units
BEFORE the per-doc sum, so the aggregate is an order-independent integer sum
and the ranking is hash-exact across engines. The scoring math itself is a
single shared SQL template rendered per dialect (only the tokenizer and
array functions differ), so both engines evaluate the identical IEEE-754
expression tree.

Scale shape: the query-term list is a tiny IN-list pushed into the token
stream (filter before the (doc, term) aggregation), so the only shuffles are
the tf groupBy and the df groupBy over MATCHED terms only — never the full
vocabulary. The inverted index caps posting lists per term (top-N doc_ids by
a bounded window) so no collect_list is unbounded at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pgcapture_spark.catalog import register_views
from pgcapture_spark.queries import q

# Query terms drawn from the synthetic corpus vocabulary; k1/b are the
# classic BM25 defaults. N_TOP bounds the result.
_QUERY_TERMS = ("hash", "merge", "window", "scan")
_K1, _B = 1.2, 0.75
_N_TOP = 20

_IN_LIST = ", ".join(f"'{t}'" for t in _QUERY_TERMS)

# one scoring template, two tokenizer dialects — identical float tree
_BM25_TPL = """
WITH t AS (SELECT doc_id, {tokens} AS tokens FROM documents),
dl AS (SELECT doc_id, {length}(tokens) AS dl FROM t),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dl),
tok AS (SELECT doc_id, {unnest}(tokens) AS term FROM t),
hits AS (
  SELECT doc_id, term, count(*) AS tf
  FROM tok WHERE term IN ({in_list}) GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
scored AS (
  SELECT h.doc_id,
         CAST(floor(
           ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * (tf * {k1p1}) / (tf + {k1} * ({one_minus_b} + {b} * dl * n_docs
                                           / CAST(total_dl AS DOUBLE)))
           * 10000 + 0.5) AS BIGINT) AS q_contrib
  FROM hits h JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
         CAST(sum(q_contrib) AS BIGINT) AS q_bm25
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_terms_hit, q_bm25,
       CAST(row_number() OVER (ORDER BY q_bm25 DESC, doc_id) AS INT) AS rank
FROM agg ORDER BY rank LIMIT {n_top}
"""

_COMMON = dict(
    in_list=_IN_LIST,
    k1=_K1,
    k1p1=_K1 + 1.0,
    b=_B,
    one_minus_b=1.0 - _B,
    n_top=_N_TOP,
)

_BM25_DUCK = _BM25_TPL.format(
    tokens=r"list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0)",
    length="len",
    unnest="unnest",
    **_COMMON,
)


@q(
    "text_bm25_topk",
    _BM25_DUCK,
    "North-star retrieval: BM25 top-k over the corpus for a fixed query-term"
    " set (k1=1.2, b=0.75) — tf per (doc, term) and df per term computed only"
    " over IN-list-matched tokens (the tiny query filter pushes below both"
    " shuffles), per-contribution integer quantization so the per-doc sum is"
    " order-independent, global top-k is one TakeOrdered. The lookup side of"
    " the decontamination / boilerplate-hunt workflow.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import TOKENS_EXPR

    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        _BM25_TPL.format(tokens=TOKENS_EXPR, length="size", unnest="explode", **_COMMON)
    )


# ------------------------------------------------------------ inverted index

_MIN_DF = 5
_MAX_POSTINGS = 100
_MAX_TERMS = 50

_INVIDX_DUCK = rf"""
WITH t AS (SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'),
                              x -> len(x) > 0) AS tokens
           FROM documents),
tok AS (SELECT doc_id, unnest(tokens) AS term FROM t),
hits AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
ranked AS (
  SELECT term, doc_id, tf,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
  FROM hits),
agg AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf,
         string_agg(CASE WHEN rn <= {_MAX_POSTINGS}
                         THEN CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR)
                    END, ',' ORDER BY doc_id) AS postings
  FROM ranked GROUP BY term)
SELECT term, df, cf, postings,
       CAST(row_number() OVER (ORDER BY df DESC, term) AS INT) AS term_rank
FROM agg WHERE df >= {_MIN_DF}
ORDER BY term_rank LIMIT {_MAX_TERMS}
"""


@q(
    "text_inverted_index",
    _INVIDX_DUCK,
    "North-star retrieval: inverted-index build — per-term posting lists"
    " ('doc:tf' joined, ordered by doc_id, CAPPED at 100 postings via a"
    " bounded per-term window so no aggregation buffer is unbounded at"
    " 100 TB), exact df/cf over the full term, top-50 terms by df. The"
    " index-construction half of the BM25 retrieval pair.",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.textstats import token_rows

    register_views(spark, sf_dir, ("documents",))
    tok = token_rows(spark.table("documents")).select("doc_id", "token")
    hits = tok.groupBy("token", "doc_id").agg(F.count("*").alias("tf"))
    rn_w = W.partitionBy("token").orderBy("doc_id")
    ranked = hits.withColumn("rn", F.row_number().over(rn_w))
    agg = ranked.groupBy("token").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") <= _MAX_POSTINGS,
                            F.struct("doc_id", "tf"),
                        )
                    )
                ),
                lambda s: F.concat_ws(":", s["doc_id"], s["tf"]),
            ),
            ",",
        ).alias("postings"),
    )
    # top-N terms FIRST via distributed TakeOrdered, then the rank window runs
    # over only those N rows (never a single-task window over the vocabulary)
    top = agg.where(F.col("df") >= _MIN_DF).orderBy(
        F.col("df").desc(), F.col("token")
    ).limit(_MAX_TERMS)
    out_w = W.orderBy(F.col("df").desc(), F.col("token"))
    return top.withColumn("term_rank", F.row_number().over(out_w).cast("int")).select(
        F.col("token").alias("term"), "df", "cf", "postings", "term_rank"
    )
