"""Misra-Gries two-pass heavy hitters: EXACT equality with the naive global
groupBy (the whole point — bounded-memory candidates must be a superset of
every true heavy hitter, then the recount is exact), independent of
partitioning and at the tightest legal capacity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgcapture_spark.operators.heavyhitters import heavy_hitters, threshold


def _skewed(spark, n_parts):
    # zipf-ish: token t_k appears ~ n/k times; plus a long unique tail
    return spark.sql(
        """
        SELECT concat('t', CAST(k AS STRING)) AS token
        FROM (SELECT id, explode(sequence(1, 20)) AS k FROM range(500))
        WHERE id % k = 0
        UNION ALL
        SELECT concat('u', CAST(id AS STRING)) FROM range(3000)
        """
    ).repartition(n_parts)


def _exact(rows, frac):
    total = rows.count()
    return (
        rows.groupBy("token")
        .count()
        .withColumnRenamed("count", "cnt")
        .where(F.col("cnt") >= threshold(total, frac))
    )


@pytest.mark.parametrize("n_parts", [1, 7])
@pytest.mark.parametrize("capacity", [51, 1000])
def test_equals_naive_groupby(spark, n_parts, capacity):
    rows = _skewed(spark, n_parts)
    frac = 0.02  # requires capacity > 49
    got = heavy_hitters(rows, "token", threshold_frac=frac, capacity=capacity)
    exp = _exact(rows, frac)
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_capacity_guard():
    # frac at or below 1/(capacity+1) voids the superset guarantee → must raise
    with pytest.raises(ValueError, match="superset guarantee"):
        heavy_hitters(None, "token", threshold_frac=0.0001, capacity=100)


def test_null_values_excluded_from_counts_and_total(spark):
    """The explicit NULL contract: NULLs never become candidates AND never
    inflate N — without the up-front filter, pandas value_counts dropped
    NULLs from the sketch while len(pdf) still counted them, shifting every
    threshold."""
    data = [("a",)] * 40 + [("b",)] * 10 + [(None,)] * 950
    rows = spark.createDataFrame(data, "token string").repartition(3)
    got = {
        r["token"]: r["cnt"]
        for r in heavy_hitters(
            rows, "token", threshold_frac=0.5, capacity=10
        ).collect()
    }
    # N must be 50 (nulls excluded): 'a' has 40/50 = 80% >= 50%. If nulls
    # leaked into N=1000, nothing would pass the 50% bar.
    assert got == {"a": 40}


def test_pass2_is_broadcast_semi_join(spark):
    rows = _skewed(spark, 4)
    got = heavy_hitters(rows, "token", threshold_frac=0.02, capacity=100)
    plan = spark._jvm.PythonSQLUtils.explainString(got._jdf.queryExecution(), "formatted")
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree and "LeftSemi" in tree, tree
    assert "SortMergeJoin" not in tree


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=5, deadline=None)
@given(
    data=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    n_parts=st.integers(min_value=1, max_value=5),
)
def test_property_equals_exact(spark, data, n_parts):
    """Any multiset, any partitioning: two-pass MG output == naive groupBy
    (capacity at the legal bound for the chosen threshold)."""
    rows = spark.createDataFrame(
        [(f"t{v}",) for v in data], "token string"
    ).repartition(n_parts)
    frac = 0.05  # needs capacity > 19
    got = heavy_hitters(rows, "token", threshold_frac=frac, capacity=21)
    exp = _exact(rows, frac)
    g = sorted(map(tuple, got.collect()))
    e = sorted(map(tuple, exp.collect()))
    assert g == e
