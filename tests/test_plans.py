"""Physical-plan audits: the scale claims (pushdown, pruning, broadcast,
map-side combine, shuffle-free per-row ops) asserted against the actual
Catalyst output, so a regression that silently de-optimizes a plan fails CI —
the 100 TB design is enforced, not aspirational."""

from __future__ import annotations

import re

from pgcapture_spark.queries import REGISTRY
from tests.conftest import SF_SMALL


def plan_str(spark, name: str, mode: str = "formatted") -> str:
    df = REGISTRY[name].fn(spark, SF_SMALL)
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def plan_tree(spark, name: str) -> str:
    """Just the operator tree (formatted mode repeats every node in a detail
    section below the tree, which would double string counts)."""
    return plan_str(spark, name).split("\n\n")[0]


def scan_sections(plan: str) -> list[str]:
    """The per-node detail blocks for parquet scans in a formatted plan."""
    return [
        m.group(0)
        for m in re.finditer(r"\(\d+\) Scan parquet.*?(?=\n\(\d+\)|\Z)", plan, re.S)
    ]


def test_q3_broadcasts_dims_and_pushes_filters(spark):
    tree = plan_tree(spark, "tpch_q3_shipping_priority")
    assert tree.count("BroadcastHashJoin") == 2  # customer + orders broadcast
    assert "SortMergeJoin" not in tree
    plan = plan_str(spark, "tpch_q3_shipping_priority")
    scans = {s.split("file:")[1].split("]")[0]: s for s in scan_sections(plan)}
    cust = next(v for k, v in scans.items() if "customer" in k)
    assert "EqualTo(c_mktsegment,BUILDING)" in cust
    li = next(v for k, v in scans.items() if "lineitem" in k)
    assert "GreaterThan(l_shipdate" in li
    # column pruning: q3 needs 4 of lineitem's columns, scan must not read more
    read = re.search(r"ReadSchema: struct<([^>]*)>", li).group(1)
    assert sorted(c.split(":")[0] for c in read.split(",")) == [
        "l_discount", "l_extendedprice", "l_orderkey", "l_shipdate",
    ]


def test_q1_pushdown_pruning_and_partial_agg(spark):
    plan = plan_str(spark, "tpch_q1_pricing_summary")
    li = next(s for s in scan_sections(plan) if "lineitem" in s)
    assert "LessThanOrEqual(l_shipdate" in li
    read = re.search(r"ReadSchema: struct<([^>]*)>", li).group(1)
    assert "l_orderkey" not in read and "l_suppkey" not in read  # pruned
    # map-side partial aggregation: two HashAggregates around one Exchange
    tree = plan_tree(spark, "tpch_q1_pricing_summary")
    assert tree.count("HashAggregate") == 2
    assert tree.count("Exchange") == 1


def test_q5_star_join_all_broadcast(spark):
    tree = plan_tree(spark, "tpch_q5_local_supplier")
    assert tree.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in tree
    region = next(
        s
        for s in scan_sections(plan_str(spark, "tpch_q5_local_supplier"))
        if "region.parquet" in s
    )
    assert "EqualTo(r_name,ASIA)" in region


def test_q6_all_predicates_pushed_scan_pruned(spark):
    plan = plan_str(spark, "tpch_q6_forecast_revenue")
    li = next(s for s in scan_sections(plan) if "lineitem" in s)
    for pushed in (
        "GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate", "LessThan(l_quantity",
    ):
        assert pushed in li
    read = re.search(r"ReadSchema: struct<([^>]*)>", li).group(1)
    assert sorted(c.split(":")[0] for c in read.split(",")) == [
        "l_discount", "l_extendedprice", "l_quantity", "l_shipdate",
    ]
    tree = plan_tree(spark, "tpch_q6_forecast_revenue")
    assert tree.count("HashAggregate") == 2 and tree.count("Exchange") == 1


def test_q10_pushdown_and_streaming_topk(spark):
    plan = plan_str(spark, "tpch_q10_returned_items")
    li = next(s for s in scan_sections(plan) if "lineitem" in s)
    assert "EqualTo(l_returnflag,R)" in li
    orders = next(s for s in scan_sections(plan) if "orders" in s)
    assert "GreaterThanOrEqual(o_orderdate" in orders
    tree = plan_tree(spark, "tpch_q10_returned_items")
    # top-20 must be TakeOrderedAndProject (per-partition heap + merge),
    # never a global Sort of the full aggregate
    assert "TakeOrderedAndProject" in tree
    assert "BroadcastHashJoin" in tree  # nation dim broadcast


def test_per_row_text_ops_have_no_shuffle(spark):
    # fingerprint/simhash are pure projections: the only allowed Exchange is
    # the under-split repartition (round-robin), never a hash/range shuffle
    for name in ("text_fingerprint", "dedup_simhash", "text_quality_score"):
        plan = plan_str(spark, name, mode="simple")
        assert "hashpartitioning" not in plan, name
        assert "rangepartitioning" not in plan, name
        assert "SortMergeJoin" not in plan, name


def test_text_ops_never_convert_to_rdd(spark, monkeypatch):
    # ensure_parallelism must stay plan-free: a DataFrame.rdd access forces an
    # RDD translation of the whole plan on every text-op invocation
    from pyspark.sql import DataFrame

    def _boom(self):
        raise AssertionError("text op accessed DataFrame.rdd")

    monkeypatch.setattr(DataFrame, "rdd", property(_boom))
    from pgcapture_spark.queries import REGISTRY

    df = REGISTRY["text_fingerprint"].fn(spark, SF_SMALL)
    assert df.columns  # plan built without touching .rdd


def test_brute_force_topk_broadcasts_queries(spark):
    plan = plan_str(spark, "sim_cosine_topk")
    assert "Broadcast" in plan  # query set is broadcast, corpus is streamed


def test_exact_dedup_single_shuffle_with_partial_agg(spark):
    plan = plan_str(spark, "dedup_exact", mode="simple")
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2


def test_cdc_apply_no_cartesian_and_pushdown(spark):
    plan = plan_str(spark, "cdc_apply_customer")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_is_window_not_nested_loop(spark):
    # the union+window rewrite must never plan a pair-exploding non-equi join:
    # one Window over the key, no BroadcastNestedLoopJoin / CartesianProduct
    tree = plan_tree(spark, "events_asof_join")
    assert "BroadcastNestedLoopJoin" not in tree
    assert "CartesianProduct" not in tree
    assert "Window" in tree


def test_range_band_join_collapses_to_bucket_assign(spark):
    # uniform-band range join = per-row width_bucket + one partial/final agg;
    # no join operator of any kind in the plan
    tree = plan_tree(spark, "events_range_band_join")
    assert "Join" not in tree
    assert tree.count("HashAggregate") == 2


def test_tfidf_single_tokenize_pass(spark):
    # doc-length and document-frequency are windows over ONE (doc_id, token)
    # aggregation — a grouped-agg formulation would tokenize the corpus three
    # times (one Generate per branch)
    tree = plan_tree(spark, "text_tfidf_topterms")
    assert tree.count("Generate") == 1
    assert "WindowGroupLimit" in tree  # rank<=3 pushed into the sort


def test_q18_semi_join_before_wide_join(spark):
    # the HAVING>threshold group feeds a LeftSemi that prunes orders/lineitem
    # BEFORE the 3-way join — never a full join then filter
    tree = plan_tree(spark, "tpch_q18_large_orders")
    assert "LeftSemi" in tree
    assert "TakeOrderedAndProject" in tree  # top-100 never fully sorts


def test_incremental_agg_touched_key_pruning(spark):
    # the delta path must prune the snapshot to touched keys with a (broadcast)
    # semi-join — never rescan-and-join the full table, never a cartesian
    tree = plan_tree(spark, "cdc_incremental_agg")
    assert "LeftSemi" in tree
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_gapfill_reuses_entity_partitioning(spark):
    # spine generation is a distributed explode(sequence(...)), the LOCF window
    # streams per entity; no nested-loop join anywhere
    plan = plan_str(spark, "ts_gapfill_locf", mode="simple")
    assert "Generate explode(sequence" in plan
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_repetition_signals_partial_agg(spark):
    # both aggregation levels (doc_id×bigram counts, per-doc sum/max) must get
    # map-side partial combine: 2 exchanges, 2 partial+final pairs + the
    # two-level fold
    plan = plan_str(spark, "text_repetition_signals", mode="simple")
    assert plan.count("hashpartitioning") == 2
    assert plan.count("partial_") >= 2
    assert "SortMergeJoin" not in plan  # doc_id join back is broadcast


def test_q21_correlated_exists_decorrelate(spark):
    # EXISTS → LeftSemi, NOT EXISTS → LeftAnti, both against the fact —
    # no nested-loop fallback
    tree = plan_tree(spark, "tpch_q21_waiting_supplier")
    assert "LeftSemi" in tree and "LeftAnti" in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert "CartesianProduct" not in tree


def test_decontaminate_broadcasts_eval_grams(spark):
    # eval-set grams must ride as a broadcast; the corpus side must never
    # sort-merge or shuffle for the join
    plan = plan_str(spark, "text_decontaminate", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_fused_binary_decode_single_crossing(spark):
    """A full-width decode of the 13-column composite lineitem wire feed must
    auto-fuse into ONE decode UDF (one Python boundary crossing), while the
    narrow customer feed stays on the lazy prunable path — the FUSE_THRESHOLD
    contract of decode_binary_feed."""
    from pgcapture_spark.catalog import register_views
    from pgcapture_spark.operators.generic_feed import decode_binary_feed, to_binary_feed
    from pgcapture_spark.queries import _feed
    from pgcapture_spark.querydefs.extras import _LI_OLD_KEYS, LINEITEM_FIELD_OIDS

    register_views(spark, SF_SMALL, ("lineitem",))
    typed = _feed(spark, SF_SMALL, "lineitem")
    wire = to_binary_feed(typed, LINEITEM_FIELD_OIDS, old_key=_LI_OLD_KEYS)
    fused = decode_binary_feed(wire, LINEITEM_FIELD_OIDS, old_key=_LI_OLD_KEYS)
    plan = spark._jvm.PythonSQLUtils.explainString(fused._jdf.queryExecution(), "formatted")
    n_udfs = len(set(re.findall(r"pythonUDF\d+", plan)))
    # 1 encode (fixture edge) + 1 old-key encode + 1 fused decode
    assert n_udfs <= 3, f"expected fused single-crossing decode, got {n_udfs} UDFs"


def test_corpus_select_single_shuffle(spark):
    """corpus_select_pipeline must plan exactly ONE hash-partition Exchange
    (the dedup window) — quality + language metrics fuse into the post-window
    stage as per-row expressions, no joins, no second pass. (The extra
    RoundRobin exchange is ensure_parallelism's under-split-local-file
    repartition, absent on a well-split 100 TB scan.)"""
    simple = plan_str(spark, "corpus_select_pipeline", "simple")
    assert simple.count("Exchange hashpartitioning") == 1, simple
    tree = plan_tree(spark, "corpus_select_pipeline")
    assert "Join" not in tree, tree


def test_cube_single_expand_with_partial_agg(spark):
    """agg_cube: all grouping-set combinations in ONE Expand pass with
    map-side partial aggregation — not one scan per grouping set."""
    tree = plan_tree(spark, "agg_cube")
    assert tree.count("Expand") == 1, tree
    assert tree.count("Scan parquet") == 1, tree
    assert tree.count("HashAggregate") >= 2, tree  # partial + final


def test_window_gauntlet_single_scan_single_sort(spark):
    """events_window_gauntlet: every window function shares one scan and one
    per-user exchange — frames differ, partitioning does not."""
    simple = plan_str(spark, "events_window_gauntlet", "simple")
    assert simple.count("Exchange hashpartitioning") == 1, simple
    tree = plan_tree(spark, "events_window_gauntlet")
    assert tree.count("Scan parquet") == 1, tree


def test_quality_rules_zero_shuffle(spark):
    """The rule gate is pure per-row expressions — no Exchange at all."""
    tree = plan_tree(spark, "text_quality_rules")
    assert tree.count("Exchange") <= 1  # at most the ensure_parallelism repartition
    assert "SortMergeJoin" not in tree and "HashAggregate" not in tree


def test_mix_sample_broadcasts_rate_table(spark):
    """Rate table (≤ #langs rows) must broadcast; the corpus side must NOT
    shuffle on lang."""
    tree = plan_tree(spark, "corpus_mix_sample")
    assert "BroadcastHashJoin" in tree
    assert "SortMergeJoin" not in tree


def test_semantic_dedup_single_cell_shuffle(spark):
    """Quantizer broadcast + per-row argmin; the within-cell self-join is the
    only corpus shuffle (plus the final group) — no SMJ on the full corpus
    without co-location, no nested-loop blowup."""
    tree = plan_tree(spark, "dedup_semantic")
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" in tree or "BroadcastHashJoin" in tree


def test_semantic_dedup_kmeans_broadcast_codebook(spark):
    """Trained-codebook SemDeDup keeps the SemDeDup plan contract: the k-means
    codebook rides as ONE broadcast row (argmin fused into the scan), and the
    only corpus joins are cell-keyed — candidate pairs bounded by cell size,
    never a cartesian blowup."""
    tree = plan_tree(spark, "dedup_semantic_kmeans")
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" in tree or "BroadcastHashJoin" in tree


def test_bpe_tokenize_apply_is_single_projection(spark):
    """The merge application is literal string replaces in ONE projection —
    no Python eval, no join against a merge table."""
    tree = plan_tree(spark, "text_bpe_tokenize")
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree
    assert "Join" not in tree  # merge table baked in as literals


def test_line_dedup_two_shuffles_no_python(spark):
    """Line construction is per-row (fused into the scan); the only
    exchanges are the line-key window and the doc_id reassembly group."""
    tree = plan_tree(spark, "text_line_dedup")
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree
    assert "CartesianProduct" not in tree
    plan = plan_str(spark, "text_line_dedup", mode="simple")
    assert plan.count("Exchange") <= 3  # window + partial/final agg pair


def test_kmeans_assignment_broadcasts_centroids(spark):
    """Assignment is a per-row argmin over ONE broadcast centroid row — the
    corpus is never shuffled or exploded for assignment."""
    from pgcapture_spark.operators.similarity import kmeans_assign

    docs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    df = kmeans_assign(docs, k=4, iters=1)
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    tree = plan.split("\n\n")[0]
    assert "Broadcast" in tree
    assert "CartesianProduct" not in tree
    assert "Exchange hashpartitioning" not in tree  # no corpus shuffle


def test_ivfpq_corpus_reads_codes_not_vectors(spark):
    """The ADC join streams the corpus against broadcast queries — no SMJ,
    no cartesian; candidates bounded by the cell equi-key."""
    tree = plan_tree(spark, "sim_ivfpq_ann")
    assert "SortMergeJoin" not in tree
    assert "CartesianProduct" not in tree
    assert "BroadcastHashJoin" in tree or "BroadcastNestedLoopJoin" in tree


def test_substring_dedup_gram_shuffle_only(spark):
    """Gram-cover substring dedup: the corpus text is exchanged once for the
    gram window; coverage folds to a per-doc position set and the removal +
    reassembly are per-row array expressions — no token-level re-explode of
    the corpus, no cartesian, at most gram + cov-agg + (non-broadcast) join
    exchanges."""
    tree = plan_tree(spark, "dedup_substring")
    assert "CartesianProduct" not in tree
    assert tree.count("Exchange hashpartitioning") <= 3
    # reassembly must not be a collect_list over every token
    assert "collect_list" not in tree


def test_nb_quality_scores_via_broadcast_llr(spark):
    """The NB model (LLR table + prior) must ride as broadcasts; labels are
    computed in the same scan as tokens (no doc_id label join)."""
    tree = plan_tree(spark, "text_nb_quality")
    assert "BroadcastHashJoin" in tree
    assert "SortMergeJoin" not in tree
    assert tree.count("Exchange hashpartitioning") <= 3


def test_interval_overlap_is_bin_equijoin(spark):
    """The overlap join must run as a hash join on the bin key — no
    BroadcastNestedLoopJoin / CartesianProduct fallback for the non-equi
    predicate (it rides as a post-join filter)."""
    tree = plan_tree(spark, "events_interval_overlap_join")
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert "BroadcastHashJoin" in tree or "SortMergeJoin" in tree or "ShuffledHashJoin" in tree


def test_hist_quantile_window_is_sketch_sized(spark):
    """The cumulative window runs over the merged histogram (≤ #bins rows),
    so the raw-event side contributes only partial-aggregated bin counts —
    partial_sum must appear below the exchange."""
    plan = plan_str(spark, "agg_hist_quantile_merge", mode="simple")
    assert "partial_" in plan


def test_knn_graph_bucket_selfjoin_shares_partitioning(spark):
    """The k-NN graph build must not broadcast the full corpus or fall back
    to nested-loop; candidates come from a bucket-keyed join."""
    tree = plan_tree(spark, "sim_knn_graph")
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_funnel_single_user_shuffle(spark):
    """Three dependent first-passage minima must share ONE user_id
    partitioning — chained unordered-frame windows, no per-step self-joins."""
    tree = plan_tree(spark, "events_funnel")
    assert "Join" not in tree  # no self-joins at all
    assert tree.count("Exchange") == 1
    assert tree.count("Window") == 3


def test_corpus_refresh_fuses_apply_and_gate(spark):
    """CDC apply + selection: the apply fold is one aggregation, the gate is
    per-row — no extra corpus-wide join beyond the apply merge and the dedup
    window."""
    tree = plan_tree(spark, "cdc_corpus_refresh_select")
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_bm25_filters_terms_before_aggregation(spark):
    """The query-term IN filter must run below both shuffles (only matched
    tokens aggregate), and the top-k must be a distributed TakeOrdered."""
    tree = plan_tree(spark, "text_bm25_topk")
    assert "TakeOrderedAndProject" in tree
    assert "CartesianProduct" not in tree
    # tf and df aggregations are partial (map-side combine before exchange)
    assert tree.count("HashAggregate") >= 4


def test_inverted_index_topk_is_distributed(spark):
    """Top-50 terms come from TakeOrdered, never a vocabulary-wide
    single-partition window."""
    tree = plan_tree(spark, "text_inverted_index")
    assert "TakeOrderedAndProject" in tree


def test_pit_join_is_union_window_not_interval_join(spark):
    """The PIT SCD2 join must be the union+ordered-window shape: zero
    interval pair joins, no nested-loop, windows partitioned by the key."""
    tree = plan_tree(spark, "events_pit_scd2_join")
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    plan = plan_str(spark, "events_pit_scd2_join")
    # every window spec names the key as its partition column (no global
    # single-task window anywhere in the as-of carry)
    import re as _re

    for spec in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert spec.startswith(("c_custkey", "k#")), spec


def test_pagerank_no_cartesian_and_bounded_exchanges(spark):
    """3 integer power iterations: each is one src equi-join + one dst
    aggregation; the count scalar rides a 1-row broadcast. No cartesian
    product over nodes, no full-graph broadcast."""
    tree = plan_tree(spark, "sim_pagerank")
    assert "CartesianProduct" not in tree


def test_compaction_plan_prefix_sum_is_two_phase(spark):
    """The planner's cumsum uses packed_batches' per-range-partition window
    plus a broadcast offset join — never one global single-task window over
    the segment listing (the only SinglePartition window runs on the tiny
    one-row-per-range-partition totals)."""
    plan = plan_str(spark, "cdc_compaction_plan")
    # the data-sized cumsum window partitions by the range-partition id
    assert "windowspecdefinition(_pid" in plan
    # the offsets come back via broadcast, not a shuffle join
    assert "BroadcastHashJoin" in plan


def test_watermark_sizing_window_is_partitioned(spark):
    """The running watermark max partitions by the source partition — a
    global arrival-order window would serialize the stream through one
    task."""
    plan = plan_str(spark, "events_watermark_sizing")
    assert "windowspecdefinition(part#" in plan
    tree = plan_tree(spark, "events_watermark_sizing")
    assert tree.count("Window") == 1


def test_audio_windows_plan_is_explode_then_arrow_map(spark):
    """The audio leg's scale shape: the window plan (sequence+explode) and
    the Arrow decode stage run WITHOUT any exchange — work distributes by
    the parquet scan's own partitioning; no shuffle-by-blob, no collect."""
    tree = plan_tree(spark, "media_audio_windows")
    assert "MapInPandas" in tree
    assert "Generate" in tree
    assert "posexplode" in plan_str(spark, "media_audio_windows")
    assert "Exchange" not in tree
    assert "CartesianProduct" not in tree


def test_lsh_bucket_rows_no_keyed_shuffle(spark):
    """The streamed dedup's per-batch index build must stay a fused per-row
    projection: signatures + band hashes compute map-side with NO keyed
    (hash) shuffle before the state equi-join — the only exchange allowed
    is ensure_parallelism's round-robin widening for tiny inputs, which
    disappears at real split counts."""
    from pgcapture_spark.catalog import register_views
    from pgcapture_spark.operators.dedup import lsh_bucket_rows

    register_views(spark, SF_SMALL, ("documents",))
    df = lsh_bucket_rows(spark.table("documents"))
    full = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "hashpartitioning" not in full
    assert "rangepartitioning" not in full
    assert "posexplode" in full


def test_heavy_hitters_recount_broadcasts_candidates(spark):
    """Pass 2 of Misra-Gries must semi-join the corpus against BROADCAST
    candidates (sketch-sized), never shuffle the corpus by value."""
    tree = plan_tree(spark, "agg_heavy_hitters")
    assert "BroadcastHashJoin" in tree and "LeftSemi" in tree
    assert "SortMergeJoin" not in tree


def test_bloom_prefilter_probe_filters_before_join(spark):
    """join_bloom_prefilter: the probe side must carry the k-bit-test filter
    BELOW the join (pre-shuffle), the bitmap as a literal (no extra join or
    shuffle to distribute it), and the exact join stays broadcast."""
    tree = plan_tree(spark, "join_bloom_prefilter")
    assert tree.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in tree and "CartesianProduct" not in tree
    plan = plan_str(spark, "join_bloom_prefilter")
    # the bit tests are codegen'd xxhash64 probes in a Filter above the
    # lineitem scan, inside the same stage (no exchange between them)
    filt = next(
        m.group(0)
        for m in re.finditer(r"\(\d+\) Filter.*?(?=\n\(\d+\)|\Z)", plan, re.S)
        if "xxhash64" in m.group(0)
    )
    assert filt.count("xxhash64") >= 4  # all k probes fused in one filter
    li = next(s for s in scan_sections(plan) if "lineitem" in s)
    read = re.search(r"ReadSchema: struct<([^>]*)>", li).group(1)
    assert "l_quantity" not in read  # pruning survives the bloom filter


def test_interpolate_windows_share_entity_partitioning(spark):
    """ts_interpolate_linear: forward and backward windows must run over ONE
    entity partitioning — no second exchange between the two Window nodes."""
    tree = plan_tree(spark, "ts_interpolate_linear")
    windows = [ln for ln in tree.split("\n") if "Window" in ln]
    assert len(windows) >= 1
    # slice the tree between the first and last Window node: no Exchange
    first = tree.index(windows[0])
    last = tree.index(windows[-1])
    assert "Exchange" not in tree[first:last]


def test_cross_source_overlap_joins_counts_not_docs(spark):
    """corpus_cross_source_overlap: the self-join input is the per-(shingle,
    source) COUNT aggregate (post-aggregation), never exploded doc rows, and
    the df-cap filter runs before the join."""
    tree = plan_tree(spark, "corpus_cross_source_overlap")
    assert "CartesianProduct" not in tree
    # pair aggregation sees an already-aggregated join: HashAggregate nodes
    # for (shingle,source) counts appear below the final join in the tree
    join_pos = tree.index("SortMergeJoin") if "SortMergeJoin" in tree else tree.index("Join")
    below = tree[join_pos:]
    assert "HashAggregate" in below


def test_scene_cuts_plan_is_explode_then_arrow_map_then_window(spark):
    """media_scene_cuts: frame plan (explode) feeds ONE Arrow-batched python
    map, then a single media-key window — no per-row python UDF, no extra
    exchange between the map and the lag window beyond the media key."""
    tree = plan_tree(spark, "media_scene_cuts")
    assert "MapInPandas" in tree or "ArrowEvalPython" in tree
    assert "BatchEvalPython" not in tree  # never row-at-a-time python
    assert tree.count("Window") == 1
    assert "Generate" in tree  # the sequence+explode frame plan


def test_cumulative_users_single_partition_window_on_day_spine_only(spark):
    """events_cumulative_users: the heavy aggregates are user/day keyed; the
    single-partition running sum sits on the day spine (post-aggregation),
    so exactly one SinglePartition exchange and it feeds the final window."""
    plan = plan_str(spark, "events_cumulative_users")
    assert plan.count("SinglePartition") == 1
    assert plan_tree(spark, "events_cumulative_users").count("Window") == 1


def test_keepbest_cluster_argmax_is_one_aggregation(spark):
    """corpus_dedup_keepbest: the per-cluster argmax is a max_by aggregation
    (map-side partial combine), NEVER a window rank that would sort every
    row; candidate generation stays bucket-joined (no cartesian)."""
    tree = plan_tree(spark, "corpus_dedup_keepbest")
    assert "CartesianProduct" not in tree
    assert "Window" not in tree


def test_standardize_stats_gather_is_broadcast_single_row(spark):
    """sim_dim_standardize: the per-dim stats gather into ONE row that joins
    back by broadcast (nested-loop over a single row, never a shuffled
    cross); exactly one posexplode Generate feeds the stats aggregate."""
    tree = plan_tree(spark, "sim_dim_standardize")
    assert tree.count("Generate") == 1
    assert "CartesianProduct" not in tree
    assert "SortMergeJoin" not in tree


def test_oov_vocab_is_topk_then_broadcast(spark):
    """text_oov_rate: the top-256 vocab comes from TakeOrderedAndProject
    (per-partition heap, never a global sort) and membership is a broadcast
    join against the constant-N vocab."""
    tree = plan_tree(spark, "text_oov_rate")
    assert "TakeOrderedAndProject" in tree
    assert "BroadcastHashJoin" in tree
    assert "SortMergeJoin" not in tree


def test_centroid_outliers_broadcast_centroids_one_window(spark):
    """sim_centroid_outliers: the bounded centroid table broadcasts to the
    per-vector distance join; per-label ranking is one window; candidate
    generation never goes cartesian."""
    tree = plan_tree(spark, "sim_centroid_outliers")
    assert "BroadcastHashJoin" in tree
    assert tree.count("Window") == 1 or "WindowGroupLimit" in tree
    assert "CartesianProduct" not in tree


def test_mmr_rerank_broadcast_queries_no_cartesian(spark):
    """The corpus-shaped stage is ONE broadcast probe (query set broadcast);
    every greedy-step join is keyed on query_id over pool-bounded rows —
    no cartesian product, no Python."""
    tree = plan_tree(spark, "sim_mmr_rerank")
    assert "CartesianProduct" not in tree
    assert "Broadcast" in tree
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree


def test_countmin_sketch_fixed_size_and_broadcast_probe(spark):
    """Sketch build is one partial-agg'd pass (fixed 4x1024 cells); the
    top-20 probe side is broadcast against the sketch — no corpus-shaped
    join, no Python."""
    tree = plan_tree(spark, "agg_countmin_topk")
    assert "CartesianProduct" not in tree
    assert "BroadcastHashJoin" in tree
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree


def test_leakage_safe_split_is_projection_over_components(spark):
    """Split assignment must add NO new shuffle beyond the cluster
    resolution it builds on (same exchange count as dedup_clusters)."""
    base = plan_str(spark, "dedup_clusters", mode="simple")
    split = plan_str(spark, "corpus_split_leakage_safe", mode="simple")
    assert split.count("Exchange") <= base.count("Exchange")
    assert "CartesianProduct" not in split


def test_sliding_hll_no_cartesian_no_python(spark):
    """The sliding merge is a window-bounded range join over the tiny daily
    sketch table; nothing crosses to Python, nothing goes cartesian."""
    tree = plan_tree(spark, "events_hll_sliding_uniques")
    assert "CartesianProduct" not in tree
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree


def test_media_dedup_hashes_before_shuffle(spark):
    """The sha256 projection must sit below the exchange — payload bytes
    never shuffle, only digests do — and the agg is partial'd map-side."""
    plan = plan_str(spark, "media_dedup_exact", mode="simple")
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2
    before_exchange = plan.split("Exchange")[-1]  # below the shuffle
    assert "sha2" in before_exchange


def test_ood_score_zero_shuffle(spark):
    """The reference set rides as one broadcast row; OOD scoring must add
    NO exchange over the candidate scan and no Python."""
    plan = plan_str(spark, "sim_ood_knn_score", mode="simple")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only exchanges allowed: the deliberate round-robin parallelism
    # repartition, the reference fold's SinglePartition agg, and the
    # reference broadcast — never a keyed shuffle
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    # the reference fold is Spark-side (collect_list → one broadcast row),
    # never a driver collect: the broadcast join must be in the plan
    assert "Broadcast" in plan
    assert "collect_list" in plan
    tree = plan_tree(spark, "sim_ood_knn_score")
    assert "CartesianProduct" not in tree


def test_ood_reference_cap_raises_loudly(spark, monkeypatch):
    """A reference set past OOD_REF_CAP must fail the PRODUCTION query with
    the budget message, never silently build an unbounded broadcast row
    (ADVICE r4: this was the package's one unbounded driver collect). Drives
    sim_ood_knn_score itself under a toy cap — the querydef imports the
    constant at call time, so the monkeypatch reaches the real raise path."""
    import pytest

    import pgcapture_spark.operators.similarity as sim

    assert sim.OOD_REF_CAP >= 1000  # the real cap is a genuine budget
    # sf0.001 has ~56 label-0 rows; a cap of 5 must trip the raise
    monkeypatch.setattr(sim, "OOD_REF_CAP", 5)
    with pytest.raises(Exception, match="broadcast budget"):
        REGISTRY["sim_ood_knn_score"].fn(spark, SF_SMALL).collect()


def test_path_topk_takeordered_not_full_sort(spark):
    """Global top-20 must be a distributed TakeOrdered, not a total sort of
    the path vocabulary."""
    tree = plan_tree(spark, "events_path_topk")
    assert "TakeOrderedAndProject" in tree


def test_length_curriculum_broadcast_thresholds_no_python(spark):
    """Tercile thresholds (one row) broadcast onto the doc scan; the only
    corpus-shaped exchange is the rank's range partition — no Python, no
    cartesian blowup."""
    tree = plan_tree(spark, "corpus_length_curriculum")
    assert "CartesianProduct" not in tree
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree
    assert "Broadcast" in tree


def test_hamming_topk_broadcast_queries_mapside_topk(spark):
    """The query side is broadcast (never a corpus-keyed shuffle to meet it);
    the per-query top-k is taken MAP-SIDE (partial WindowGroupLimit) before
    the single rank exchange, so only <=k rows per query per partition
    shuffle; the XOR+popcount distance stays JVM-side."""
    tree = plan_tree(spark, "sim_hamming_topk")
    assert "BroadcastNestedLoopJoin" in tree or "BroadcastHashJoin" in tree
    assert tree.count("WindowGroupLimit") == 2  # Partial + Final
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree
    assert "SortMergeJoin" not in tree


def test_triangle_count_no_cartesian_node_keyed_joins(spark):
    """Every join in the wedge pipeline is keyed (node ids) — no cartesian
    product, no nested-loop join anywhere; the oriented edge list is cached
    (InMemoryTableScan) so the upstream k-NN graph is derived once, and the
    three triangle corners are exploded, not 3-arm unioned."""
    tree = plan_tree(spark, "graph_triangle_count")
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert "HashAggregate" in tree
    assert "InMemoryTableScan" in tree
    # above the cache point (the explain inlines the cached plan, whose
    # degree computation legitimately unions the two edge endpoints): the
    # corner fan-out is an explode, not a 3-arm self-union of the triangles
    assert "Union" not in tree.split("InMemoryRelation")[0]


def test_kmv_single_scan_single_sketch_shuffle(spark):
    """Pass 1 (per-partition k-smallest fold) is ONE Arrow crossing over ONE
    corpus scan; pass 2 is one hash aggregation of the sketch rows — a second
    scan would mean the 'ALL' arm recomputed the corpus."""
    plan = plan_str(spark, "agg_kmv_distinct")
    assert len(scan_sections(plan)) == 1
    tree = plan_tree(spark, "agg_kmv_distinct")
    assert tree.count("MapInPandas") == 1


def test_covariance_single_scan_sketch_sized_merge(spark):
    """The whole covariance is ONE corpus scan + one Arrow crossing; the
    merge and reshape operate on d^2-bounded summary rows (broadcast joins
    only — a shuffle join there would mean the reshape went corpus-shaped)."""
    plan = plan_str(spark, "sim_embed_covariance")
    # the moment table is persisted: every reference above the cache point is
    # an InMemoryTableScan; exactly one parquet scan + one Arrow crossing live
    # inside the cached subtree
    tree = plan_tree(spark, "sim_embed_covariance")
    top = tree.split("InMemoryRelation")[0]
    assert "InMemoryTableScan" in tree
    assert "Scan parquet" not in top and "MapInPandas" not in top
    assert "SortMergeJoin" not in top
    assert "CartesianProduct" not in tree
    # inside the cache: the single corpus scan and single crossing
    cached = plan.split("InMemoryRelation")[1]
    assert cached.count("MapInPandas") == 1


def test_drift_psi_single_scan_bucket_sized_tail(spark):
    """PSI reads the corpus once (the explode fans rows out INSIDE the scan
    stage); the per-feature totals are windows over the SAME lineage as the
    bucket counts — no join of any kind, and every post-aggregation operator
    works on bucket-sized rows."""
    plan = plan_str(spark, "corpus_drift_psi")
    assert len(scan_sections(plan)) == 1
    tree = plan_tree(spark, "corpus_drift_psi")
    assert "Join" not in tree
    assert "Window" in tree
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree


def test_pq_train_codes_broadcast_codebooks_no_cartesian(spark):
    """The final encode pass: per-row argmin against ONE broadcast codebook
    row fused into the scan — a single-row build side (BroadcastNestedLoop
    with no condition is the correct plan for a 1-row dimension), never a
    corpus-shaped join, no Python crossing, top-level plan is a projection."""
    tree = plan_tree(spark, "sim_pq_train_codes")
    assert "CartesianProduct" not in tree
    assert "SortMergeJoin" not in tree
    assert "Broadcast" in tree
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree
    assert "Generate" in tree  # the (vec_id, subspace) posexplode
