"""Unit tests for the pipeline operators: connected components, sequence
packing (two-phase prefix sum == naive global window), stratified sampling
determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from pgcapture_spark.operators.dedup import connected_components
from pgcapture_spark.operators.packing import packed_batches, stratified_sample


def test_connected_components_chain_and_singleton(spark):
    # chain 1-2-3-4 (diameter 3), pair 10-11, singleton 20
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 10, 11, 20)], "doc_id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a_id long, b_id long"
    )
    got = {r.doc_id: r.canonical_id for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_raises_without_convergence(spark):
    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "a_id long, b_id long"
    )
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(nodes, edges, max_iters=2)


def test_packed_batches_matches_single_window(spark):
    rows = [(i, 7 + (i * 13) % 50) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    got = packed_batches(df, budget=100, n_ranges=8)
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    want = (
        df.withColumn("start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("batch_id", F.floor(F.col("start_offset") / F.lit(100)))
        .select("doc_id", "n_tokens", "start_offset", "batch_id")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # batches are contiguous in doc order and every batch start is in-budget
    per_batch = got.groupBy("batch_id").agg(
        F.min("start_offset").alias("lo"), F.max("start_offset").alias("hi")
    )
    for r in per_batch.collect():
        assert r.lo // 100 == r.hi // 100 == r.batch_id


def test_stratified_sample_deterministic_and_rate(spark):
    rows = [(i, ["a", "b"][i % 2]) for i in range(2000)]
    df = spark.createDataFrame(rows, "user_id long, stratum string")
    out1 = stratified_sample(df, "stratum", "user_id", {"a": 30, "b": 0})
    out2 = stratified_sample(df.repartition(7), "stratum", "user_id", {"a": 30, "b": 0})
    got1 = sorted(r.user_id for r in out1.collect())
    got2 = sorted(r.user_id for r in out2.collect())
    assert got1 == got2  # partitioning-independent
    assert all(u % 2 == 0 for u in got1)  # stratum b dropped
    assert 0.2 < len(got1) / 1000 < 0.4  # ~30% of stratum a


def test_star_components_deep_chain(spark):
    """A 200-node path graph: min-label propagation would need ~200 rounds
    (far beyond its max_iters), large-star/small-star halves depth each
    round — everything must collapse to canonical 0 within the round cap."""
    from pgcapture_spark.operators.dedup import connected_components_star

    n = 200
    nodes = spark.range(n).selectExpr("id AS doc_id")
    edges = spark.range(n - 1).selectExpr("id AS a_id", "id + 1 AS b_id")
    out = connected_components_star(nodes, edges)
    got = {r.doc_id: r.canonical_id for r in out.collect()}
    assert got == {i: 0 for i in range(n)}


def test_star_components_match_propagation(spark):
    """On the real LSH near-dup graph both component algorithms must produce
    identical (doc, canonical) labelings."""
    from pgcapture_spark.operators.dedup import (
        connected_components,
        connected_components_star,
        minhash_lsh_pairs,
    )
    from pgcapture_spark.catalog import register_views
    from tests.conftest import SF_SMALL

    register_views(spark, SF_SMALL, ("documents",))
    docs = spark.table("documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.1)
    nodes = docs.select("doc_id")
    a = connected_components(nodes, pairs)
    b = connected_components_star(nodes, pairs)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
