"""Round-10 state-layer contracts: no-op commits don't burn the retention
window (history dedup via batch ranges), manifest_asof returns fresh copies
on every branch, initialize rejects unknown snapshot keys, and retained
history entries carry schema/registry snapshots for schema-as-of reads."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from pgcapture_spark.streaming.multi import BucketedMultiTableState
from pgcapture_spark.streaming.state import BucketedSnapshotState


def _mini(spark, n=8):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def test_noop_mark_batch_does_not_burn_retention(spark):
    d = tempfile.mkdtemp(prefix="t_r10_noop_")
    st = BucketedSnapshotState(spark, d, "k", n_buckets=4, retain_versions=2)
    st.initialize(_mini(spark))
    st.commit_buckets(_mini(spark).where("k < 4"), [0, 1, 2, 3], 0)
    st.vacuum()
    st.commit_buckets(
        _mini(spark).where("k < 4").withColumn("v", F.col("v") + 1),
        [0, 1, 2, 3],
        1,
    )
    st.vacuum()
    # three quiet batches: replay gate advances, no retention slot consumed
    for b in (2, 3, 4):
        st.mark_batch(b)
    st.commit_buckets(
        _mini(spark).where("k < 4").withColumn("v", F.col("v") + 2),
        [0, 1, 2, 3],
        5,
    )
    st.vacuum()
    st.commit_buckets(
        _mini(spark).where("k < 4").withColumn("v", F.col("v") + 3),
        [0, 1, 2, 3],
        6,
    )
    st.vacuum()
    # window of 2 still resolves batch 1 after TWO later data commits — the
    # three no-ops absorbed into batch 1's entry instead of burning slots
    # (pre-dedup they would have evicted it three commits ago)
    assert st.retained_batches() == [4, 5, 6]
    m1 = st.manifest_asof(1)
    for b in (2, 3, 4):
        assert st.manifest_asof(b)["buckets"] == m1["buckets"]
        assert st.manifest_asof(b)["batch_id"] == b
    rows = {r["k"]: r["v"] for r in st.read_asof(m1).collect()}
    assert rows[0] == 1  # batch-1 image, not a later one
    with pytest.raises(ValueError):
        st.manifest_asof(0)


def test_manifest_asof_returns_copies(spark):
    d = tempfile.mkdtemp(prefix="t_r10_copy_")
    st = BucketedSnapshotState(spark, d, "k", n_buckets=4, retain_versions=True)
    st.initialize(_mini(spark))
    st.commit_buckets(_mini(spark).where("k < 4"), [0, 1, 2, 3], 0)
    st.commit_buckets(_mini(spark).where("k < 4"), [0, 1, 2, 3], 1)
    m = st.manifest_asof(0)
    m["buckets"]["0"] = "poisoned"
    assert st.manifest_asof(0)["buckets"]["0"] != "poisoned"


def test_initialize_rejects_unknown_tables(spark):
    d = tempfile.mkdtemp(prefix="t_r10_unknown_")
    st = BucketedMultiTableState(
        spark, d, ["a"], {"a": "k"}, n_buckets=2
    )
    with pytest.raises(ValueError, match="not declared tables"):
        st.initialize({"a": _mini(spark), "misspelled": _mini(spark)})
    # partial dicts still allowed (the rebucket empty-table shape)
    st2 = BucketedMultiTableState(
        spark, d + "_2", ["a", "b"], {"a": "k", "b": "k"}, n_buckets=2
    )
    st2.initialize({"a": _mini(spark)})
    assert st2.initialized()


def test_compact_preserves_content_and_gate(spark):
    d = tempfile.mkdtemp(prefix="t_r10_compact_")
    st = BucketedSnapshotState(spark, d, "k", n_buckets=4, retain_versions=2)
    st.initialize(_mini(spark))
    for b in range(3):
        st.commit_buckets(
            _mini(spark).where("k < 4").withColumn("v", F.col("v") + b),
            [0, 1, 2, 3],
            b,
        )
        st.vacuum()
    before = sorted((r["k"], r["v"]) for r in st.read().collect())
    m1 = st.manifest_asof(1)
    v1 = st.compact()
    assert st.last_batch() == 2  # replay gate unchanged
    assert set(st.manifest_snapshot()["buckets"].values()) == {v1}
    assert sorted((r["k"], r["v"]) for r in st.read().collect()) == before
    # retained history still resolves after compaction vacuumed stale dirs
    asof1 = sorted((r["k"], r["v"]) for r in st.read_asof(m1).collect())
    assert asof1 != before and len(asof1) == len(before)
    # idempotent re-run writes a FRESH generation dir, never in place
    v2 = st.compact()
    assert v2 != v1
    assert sorted((r["k"], r["v"]) for r in st.read().collect()) == before


def test_history_entry_carries_schema(spark):
    from pgcapture_spark.streaming.state import EvolvingBucketedState

    d = tempfile.mkdtemp(prefix="t_r10_schema_")
    st = EvolvingBucketedState(spark, d, "k", n_buckets=4, retain_versions=2)
    st.initialize(_mini(spark))
    fields_v1 = [["k", "bigint"], ["v", "bigint"]]
    st.commit_buckets(
        _mini(spark).where("k < 4"), [0, 1, 2, 3], 0, extra={"schema": fields_v1}
    )
    fields_v2 = fields_v1 + [["w", "string"]]
    st.commit_buckets(
        _mini(spark).where("k < 4").withColumn("w", F.lit("x")),
        [0, 1, 2, 3],
        1,
        extra={"schema": fields_v2},
    )
    # the retained entry for batch 0 pins the pre-ALTER field list
    m0 = st.manifest_asof(0)
    assert m0["schema"] == fields_v1
    asof = st.read_asof(m0)
    assert asof.columns == ["k", "v"]
    assert st.read().columns == ["k", "v", "w"]
