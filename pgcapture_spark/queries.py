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
    r6wave as _qd_r6wave,
    r7wave as _qd_r7wave,
)

# The driver verifies the FIRST ~50 registry entries each round. Rounds 1-5
# drove ALL 218 pre-freeze queries green; round 6 added 22 more (cumulative
# 241/241 per the r6 verdict).
# ROUND-7 WINDOW: the 16 NEW r7-wave queries (the non-abelian IVM hard
# cases — min/max AND top-k with bounded GROUP-pruned rescans, batch +
# streamed on tri-table bucketed state; COUNT DISTINCT via its abelian
# support table; the 4-table star join view, batch + STREAMED as a fifth
# state table on ivm_join_stream — plus the schema-evolving streamed apply
# on EvolvingBucketedState, tx-registry retention as a declared maintenance
# op, the streamed PSI drift monitor, streamed exact dedup, and the
# streamed KMV sketch on summary-sized bucketed state, position-based
# attribution, and the bucket-skew compaction planner), then the streamed
# consumers RE-verified
# because round 7 changed their read side (O(touched-bucket) reads for the
# IVM join view + incremental agg; mark_batch/collect_set/commit-contract
# changes touch every bucketed-state consumer), padded with
# previously-green canaries across the engine pillars.
# Rotated OUT of the r7 window (all previously driver-green; greens are
# cumulative, so rotation changes verification coverage, not status):
# sim_cosine_topk, agg_theta_intersect_topk, events_attribution_linear,
# corpus_pack_chunks, ts_changepoint_cusum, text_vocab_coverage.
#
# PACE discipline: add no more new queries per round than one ~50-slot
# driver window verifies; every addition lands with a DuckDB oracle and
# goes straight into the window (never the unverified pool).
# QUEUED_R8 candidates (stage into the next window, same pace rule):
#   per-source windowed PSI drift (time-bucketed extension of
#   corpus_drift_psi_streamed), snapshot-diff planner over LIVE
#   bucketed-state manifests.
_WINDOW: tuple[str, ...] = (
    # --- r7 wave (new this round; 16 queries) ---
    "agg_kmv_distinct_streamed", "cdc_ivm_starjoin_view_streamed",
    "ts_holt_trend", "graph_kcore_mutual_knn",
    "cdc_ivm_topk_view", "cdc_ivm_topk_view_streamed",
    "cdc_ivm_minmax_view", "cdc_ivm_minmax_view_streamed",
    "cdc_ivm_distinct_view", "cdc_ivm_starjoin_view",
    "cdc_apply_ddl_streamed", "cdc_tx_registry_prune",
    "corpus_drift_psi_streamed", "dedup_exact_streamed",
    "events_attribution_position", "state_bucket_skew_plan",
    # --- streamed consumers re-verified on the r7 read-side changes ---
    "cdc_ivm_join_view_streamed", "cdc_incremental_agg_streamed",
    "cdc_apply_customer_streamed", "cdc_apply_customer_feedsource",
    "cdc_apply_multi_streamed", "cdc_apply_proto_streamed",
    "cdc_apply_proto_multi_streamed", "cdc_apply_proto_multi_streamed_orders",
    "cdc_apply_pgoutput_streamed", "cdc_apply_pglogical_streamed",
    "cdc_scd2_streamed", "cdc_apply_lineitem_composite_streamed",
    "corpus_drift_psi",
    # --- canaries (previously driver-green; engine pillars) ---
    "cdc_apply_customer", "cdc_apply_orders", "cdc_apply_from_proto",
    "cdc_toast_effective_image", "backfill_union_merge",
    "cdc_apply_ddl_evolution", "cdc_incremental_agg", "cdc_ivm_join_view",
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "events_asof_join", "events_stream_windowed", "ts_ohlc_streamed",
    "dedup_minhash_lsh", "dedup_editdist_join", "corpus_dedup_keepbest",
    "sim_ivf_ann", "sim_filtered_ann", "kmeans_embed",
    "graph_triangle_count", "agg_kmv_distinct",
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
