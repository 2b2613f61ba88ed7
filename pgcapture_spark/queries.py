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

# The driver verifies the FIRST ~50 registry entries each round. Rounds 1+2
# drove 73/119 queries green (CORRECTNESS_r01/r02); this round's window is the
# 46 queries that have never received a driver-green row — all of tpch_more,
# windows_more, sketches, skewq, every vector query, the relational/textops
# tail, and the four round-1 failures whose fixes were only proven locally —
# padded with the four most load-bearing already-green applies as canaries.
# Verified coverage accumulates across rounds instead of re-checking greens.
#
# ROUND-4 ROTATION PLAN: if CORRECTNESS_r03 comes back green, the only
# never-driver-verified queries left are the ones added after this window was
# frozen — corpus_select_pipeline, corpus_select_neardup,
# corpus_select_streamed, agg_heavy_hitters, bpe_merge_candidates,
# tpch_q2/q11/q15/q20, cdc_apply_from_pglogical, and the r3 second wave
# (text_quality_rules, corpus_mix_sample, corpus_stats,
# dedup_editdist_verify, dedup_semantic, text_bpe_tokenize) and the r3
# sixth wave (text_bm25_topk, text_inverted_index, events_pit_scd2_join,
# sim_pagerank, cdc_compaction_plan, events_watermark_sizing) and the r3
# seventh wave (cdc_scd2_streamed, dedup_lsh_eval, cdc_multi_source_lww,
# sim_mips_topk) and the r3
# eighth wave (media_audio_windows, dedup_incremental_streamed) and the r3
# third wave (text_line_dedup, corpus_shard_plan, kmeans_embed,
# sim_ivfpq_ann, corpus_dsir_weights, cdc_apply_from_proto, cdc_apply_proto_streamed, cdc_checkpoint_keys, ts_ewma, cdc_apply_proto_multi_streamed, cdc_apply_from_proto_text, corpus_domain_cap, cdc_apply_pgoutput_streamed, ...)
# and the r3 ninth wave (join_bloom_prefilter, ts_interpolate_linear,
# corpus_cross_source_overlap, media_scene_cuts, events_cumulative_users,
# corpus_dedup_keepbest, sim_dim_standardize, text_oov_rate,
# sim_centroid_outliers, cdc_tx_stats, text_zipf_slope)
# and the r3 fourth wave (dedup_substring, text_nb_quality, ts_resample_ohlc,
# ts_rolling_zscore, ts_ohlc_streamed, text_bigram_surprisal, events_funnel,
# events_retention_cohorts, media_neardup_phash,
# events_interval_overlap_join, agg_hist_quantile_merge,
# corpus_export_pipeline, dedup_containment, corpus_interleave,
# sim_knn_graph, corpus_perplexity_buckets, cdc_corpus_refresh_select,
# events_markov_transitions) and the r3 fifth wave (cdc_scd2_history,
# cdc_time_travel, cdc_churn_stats, sample_weighted_reservoir,
# events_zorder_layout, ...) — put those first next round, pad with
# canaries.
_WINDOW: tuple[str, ...] = (
    # round-1 failures, fixed in r2 but rotated out before re-check
    "events_running_window",
    "sample_stratified",
    "media_features_pandas",
    "text_array_gauntlet",
    # TPC-H tail (13) — never in a driver window
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q12_priority_lines",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive",
    "tpch_q21_waiting_supplier",
    "tpch_q22_idle_customers",
    # relational / setops / scalar tail
    "events_topk_per_user",
    "events_sessionize",
    "events_json_extract",
    "setops_union_agg",
    "setops_except_intersect",
    "agg_approx_distinct",
    "agg_rollup",
    "scalar_gauntlet",
    # textops tail (new in r2)
    "text_decontaminate",
    "text_unigram_surprisal",
    # sketches / skew
    "agg_hll_sketch_merge",
    "events_topk_salted",
    "events_salted_join",
    # windows_more
    "events_window_gauntlet",
    "events_range_frame",
    "agg_cube",
    "agg_grouping_sets",
    "agg_percentile_contract",
    "agg_pivot_counts",
    # pipeline additions
    "dedup_clusters_star",
    # vector suite (12)
    "sim_cosine_topk",
    "sim_signlsh_ann",
    "dedup_embed_cosine",
    "sim_ivf_ann",
    "sim_label_centroids",
    "ts_similarity_topk",
    "sim_pq_adc_ann",
    "sim_quantize_int8",
    "sim_ann_recall",
    # new this round: in-band Relation-message schema learning (no DDL text),
    # the ANN recall tuning table, and the pgoutput wire-framing end-to-end
    # (a superset exercise of the typed customer apply, which the driver's
    # entry() smoke still covers directly)
    "cdc_relation_learn",
    "sim_ann_tuning",
    "cdc_apply_from_pgoutput",
    # already-green canary: the composite binary apply whose decode path was
    # fused this round
    "cdc_apply_from_binary_feed_composite",
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
