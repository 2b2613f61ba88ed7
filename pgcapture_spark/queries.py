"""Declared-query registry: every implemented operator from SURVEY.md §2 gets
(a) a Spark callable ``(spark, sf_dir) -> DataFrame`` and (b) when expressible,
a DuckDB oracle SQL string over the same parquet views — the driver hash-
compares the two at sf0.01 (CORRECTNESS gate).

Shared derivations (the CDC feeds) are rendered from ONE portable SQL text per
dialect (fixtures/cdc_feed.py), so both engines see bit-identical inputs.
Query definitions live in ``querydefs/``; importing this module populates
``REGISTRY``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from pgcapture_spark.catalog import register_views
from pgcapture_spark.fixtures.cdc_feed import (
    SPARK,
    cdc_customer_sql,
    cdc_lineitem_sql,
    cdc_orders_sql,
)


@dataclass
class Q:
    """A declared query: Spark implementation + optional DuckDB oracle."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Q] = {}


def q(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # a few queries persist() a shared branch of their returned plan
            # (they cannot unpersist before the caller's action); dropping
            # leftovers at the NEXT query's entry keeps long sessions
            # (driver gate, local_gate, bench) from accumulating orphaned
            # cache blocks. Cross-query reuse lives in parquet fixture
            # caches, never in Spark cache, so this is always safe.
            spark.catalog.clearCache()
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = Q(fn=wrapped, oracle=oracle, doc=doc)
        return fn

    return deco


def _feed(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    register_views(spark, sf_dir, (table,))
    sql = {
        "customer": cdc_customer_sql,
        "orders": cdc_orders_sql,
        "lineitem": cdc_lineitem_sql,
    }[table](SPARK)
    return spark.sql(sql)


# populate the registry (import populates REGISTRY; the explicit _WINDOW
# reorder below — not import order — decides what the driver verifies first).
from pgcapture_spark.querydefs import (  # noqa: E402,F401
    asofq as _qd_asofq,
    backfill as _qd_backfill,
    core as _qd_core,
    extras as _qd_extras,
    maintenance as _qd_maintenance,
    surface as _qd_surface,
    streamq as _qd_streamq,
    tpch_more as _qd_tpch_more,
    relational as _qd_relational,
    textops as _qd_textops,
    sketches as _qd_sketches,
    skewq as _qd_skewq,
    windows_more as _qd_windows_more,
    pipeline as _qd_pipeline,
    media as _qd_media,
    vector as _qd_vector,
    history as _qd_history,
    retrieval as _qd_retrieval,
)

# The driver verifies the FIRST ~50 registry entries each round. Rounds 1-4
# drove 172/218 queries green (CORRECTNESS_r01..r04 — r3 and r4 were 50/50).
# ROUND-5 WINDOW (the staged _WINDOW_R5 from round 4, now applied): the 46
# never-driver-verified queries in dependency-family order — time-series,
# events analytics, text tail, sketches, media, graph/vector residue, and
# the r4 late wave — padded to 50 with 4 previously-green canaries that
# exercise the four engine pillars (CDC apply, TPC-H join planning, LSH
# dedup, vector search). This single window completes cumulative driver
# coverage of the full 218-query registry.
#
# FREEZE discipline (round-4 verdict task #7): no new declared queries this
# round — registry stays at 218 until cumulative driver coverage is 218/218.
# New-operator ideas queue for r6:
#   QUEUED_R6: incremental view maintenance over the CDC feeds (delta-agg),
#   top-k theta-sketch set intersections, string-edit-distance join via
#   length+prefix pruning, Parquet row-group z-order clustering stats.
_WINDOW: tuple[str, ...] = (
    # CDC / time-series residue
    "cdc_tx_stats", "events_interval_overlap_join", "ts_ewma",
    "ts_resample_ohlc", "ts_rolling_zscore", "ts_interpolate_linear",
    "ts_ohlc_streamed", "cdc_compaction_plan", "events_watermark_sizing",
    # events analytics
    "events_funnel", "events_retention_cohorts", "events_markov_transitions",
    "events_cumulative_users", "text_bigram_surprisal", "text_oov_rate",
    "text_zipf_slope", "bpe_merge_candidates", "text_bpe_tokenize",
    "agg_hist_quantile_merge", "join_bloom_prefilter", "media_neardup_phash",
    "media_audio_windows", "media_scene_cuts", "sim_knn_graph",
    "sim_pagerank", "sim_mips_topk", "sim_dim_standardize",
    "sim_centroid_outliers", "sample_weighted_reservoir",
    "events_zorder_layout", "corpus_split_leakage_safe", "sim_mmr_rerank",
    "agg_countmin_topk", "agg_heavy_hitters_streamed",
    "events_hll_sliding_uniques", "sample_coreset_kcenter",
    "media_dedup_exact", "sim_ood_knn_score", "events_path_topk",
    "corpus_length_curriculum", "sim_hamming_topk", "graph_triangle_count",
    "agg_kmv_distinct", "sim_embed_covariance", "corpus_drift_psi",
    "sim_pq_train_codes",
    # canaries (driver-green r1/r2)
    "cdc_apply_customer", "tpch_q1_pricing_summary", "dedup_minhash_lsh",
    "sim_cosine_topk",
)


def _reorder(window: tuple[str, ...]) -> None:
    missing = [n for n in window if n not in REGISTRY]
    if missing:
        raise KeyError(f"_WINDOW names not in REGISTRY: {missing}")
    tail = {n: q for n, q in REGISTRY.items() if n not in set(window)}
    ordered = {n: REGISTRY[n] for n in window}
    ordered.update(tail)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder(_WINDOW)
