"""Bloom-prefilter join operator contracts: no false negatives (every build
key survives the probe filter), false positives removed by the exact join,
and the bitmap stays constant-size regardless of build cardinality."""

from __future__ import annotations

from pyspark.sql import functions as F

from pgcapture_spark.operators.bloomjoin import (
    bloom_build,
    bloom_prefilter_join,
    bloom_probe_filter,
)

M = 1 << 14  # small bitmap to force a measurable false-positive rate


def test_no_false_negatives_and_exact_join_equivalence(spark):
    build = spark.range(0, 100).withColumnRenamed("id", "k")
    probe = spark.range(0, 2000).withColumnRenamed("id", "k")

    bloom = bloom_build(build, "k", M)
    assert len(bloom) == M // 8

    survivors = {r["k"] for r in bloom_probe_filter(probe, "k", bloom, M).collect()}
    assert set(range(100)) <= survivors  # every true key tests positive

    joined = {
        r["k"] for r in bloom_prefilter_join(probe, build, "k", M).collect()
    }
    plain = {r["k"] for r in probe.join(build, "k").collect()}
    assert joined == plain  # bloom stage invisible in the result


def test_bitmap_size_independent_of_build(spark):
    small = bloom_build(spark.range(0, 10).withColumnRenamed("id", "k"), "k", M)
    large = bloom_build(spark.range(0, 5000).withColumnRenamed("id", "k"), "k", M)
    assert len(small) == len(large) == M // 8
    # a denser build sets more bits, never a bigger structure
    assert sum(bin(b).count("1") for b in large) > sum(
        bin(b).count("1") for b in small
    )


def test_semi_join_form(spark):
    build = spark.range(0, 50).withColumnRenamed("id", "k")
    probe = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    semi = bloom_prefilter_join(probe, build, "k", M, how="left_semi")
    assert {r["k"] for r in semi.collect()} == set(range(50))
    assert semi.columns == ["k", "v"]


def test_outer_join_forms_rejected(spark):
    """Join types that RETAIN unmatched probe rows (left/full/anti) are not
    result-preserving under a probe-side prefilter (bloom-negative probe rows
    would vanish) — must raise, not silently drop rows."""
    import pytest

    build = spark.range(0, 10).withColumnRenamed("id", "k")
    probe = spark.range(0, 100).withColumnRenamed("id", "k")
    for how in ("left", "full", "left_anti"):
        with pytest.raises(ValueError, match="not result-preserving"):
            bloom_prefilter_join(probe, build, "k", M, how=how)


def test_right_join_form_preserved(spark):
    """A right join keeps NO unmatched probe rows, so the probe-side bloom
    prefilter IS result-preserving for it: unmatched build rows still appear
    (with null probe columns), and the bloom only drops probe rows that are
    guaranteed non-matching."""
    build = spark.range(0, 60).select(
        F.col("id").alias("k"), (F.col("id") + 100).alias("b")
    )
    probe = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    got = bloom_prefilter_join(probe, build, "k", M, how="right")
    want = probe.join(F.broadcast(build), on="k", how="right")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # unmatched build rows (k in 40..59) survive with null v
    assert got.where("v IS NULL").count() == 20
