"""Round-8 operator tests: the last two full-rewrite streamed consumers moved
onto bucketed state (backfill_streamed / the dynamic relation-learning apply),
each with an untouched-bucket read audit."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from pgcapture_spark.catalog import CDC_COLS, register_views
from pgcapture_spark.operators.apply import cdc_apply
from pgcapture_spark.queries import _feed
from pgcapture_spark.streaming.state import BucketedSnapshotState
from tests.conftest import SF_SMALL

_CUST_COLS = CDC_COLS["customer"]


class _RecordingBucketedState(BucketedSnapshotState):
    """BucketedSnapshotState that records every slice read's bucket list and
    any full-snapshot read — a SUBCLASS (not a wrapper) because
    commit_keyed_state dispatches on isinstance."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.read_calls: list[list[int]] = []
        self.full_reads = 0

    def read_buckets(self, buckets):
        self.read_calls.append(list(buckets))
        return super().read_buckets(buckets)

    def read(self):
        self.full_reads += 1
        return super().read()


def test_backfill_streamed_bucketed_reads_touched_only(spark):
    """The DBLog interleave (stream quartiles × consistent dump chunks —
    the reference's core path, pkg/dblog/gateway.go:151-216) folded through
    BucketedSnapshotState: every micro-batch (dump chunk and stream segment
    alike) reads a STRICT bucket subset, never the full snapshot; untouched
    buckets keep their prior version pointers; the fold converges to the
    batch apply of the whole feed."""
    from pgcapture_spark.querydefs.backfill import build_dblog_interleave_feed
    from pgcapture_spark.sources.feed import read_feed_stream
    from pgcapture_spark.streaming.pipeline import apply_stream

    register_views(spark, SF_SMALL, ("customer",))
    base = spark.table("customer")
    feed = _feed(spark, SF_SMALL, "customer")
    expected = cdc_apply(base, feed, "c_custkey", _CUST_COLS)

    d = tempfile.mkdtemp(prefix="pgcs_t_bfaudit_")
    # 256 buckets >> keys per segment at sf0.001 (~150 customers total), so a
    # legitimate touched-bucket read can never cover the bucket space
    n_buckets = 256
    try:
        _, feed_dir = build_dblog_interleave_feed(spark, SF_SMALL, d)
        schema = spark.read.parquet(feed_dir).schema
        state = _RecordingBucketedState(
            spark, f"{d}/state", "c_custkey", n_buckets=n_buckets
        )
        q = apply_stream(
            read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
            state,
            base.where("1=0"),
            "c_custkey",
            _CUST_COLS,
            f"{d}/ckpt",
        )
        q.awaitTermination(300)

        # the stream itself never materialized the full snapshot
        assert state.full_reads == 0
        assert len(state.read_calls) >= 8, "8 segments must each have read a slice"
        assert all(0 < len(b) < n_buckets for b in state.read_calls)

        # untouched buckets still point at the initial (empty-seed) version
        manifest = json.load(open(f"{d}/state/MANIFEST.json"))
        vers = set(manifest["buckets"].values())
        assert "vinit" in vers and len(vers) > 1

        got = state.read().select(*expected.columns)
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dynamic_apply_bucketed_reads_touched_only(spark):
    """The dynamic relation-learning apply on its bucketed layout: a static
    table seeded from its snapshot AND a table CREATEd mid-stream both read
    strict bucket subsets per micro-batch — never a full-table
    materialization — while the registry rides the manifest. Converges to
    the typed batch apply for the static table."""
    from tests.test_dynamic_registry import _generic_stream_df

    from pgcapture_spark.operators.generic_feed import CUSTOMER_FIELD_OIDS
    from pgcapture_spark.sources.feed import materialize_feed, read_feed_stream
    from pgcapture_spark.streaming.multi import (
        DynamicMultiTableState,
        apply_stream_dynamic,
    )
    from pgcapture_spark.streaming.registry import RelationRegistry

    class _Recording(DynamicMultiTableState):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.read_calls: list[tuple[str, int]] = []

        def read_buckets(self, table, buckets):
            self.read_calls.append((table, len(buckets)))
            return super().read_buckets(table, buckets)

    d = tempfile.mkdtemp(prefix="pgcs_t_dynaudit_")
    n_buckets = 256
    try:
        feed, _ = _generic_stream_df(spark)
        materialize_feed(feed, f"{d}/feed", n_segments=6, order_col="ord")
        schema = spark.read.parquet(f"{d}/feed").schema

        reg = RelationRegistry()
        reg.learn_static("customer", ["c_custkey"], CUSTOMER_FIELD_OIDS)
        state = _Recording(spark, f"{d}/state", reg, n_buckets=n_buckets)
        q = apply_stream_dynamic(
            read_feed_stream(spark, f"{d}/feed", schema, max_files_per_trigger=2),
            state,
            {"customer": spark.table("customer")},
            f"{d}/ckpt",
        )
        q.awaitTermination(300)

        # every stream-time read was a strict bucket subset, for the seeded
        # static table AND the mid-stream-learned one (read() calls
        # read_buckets with the full range — only the final read below does)
        assert state.read_calls
        assert all(0 < n < n_buckets for _, n in state.read_calls)
        assert {t for t, _ in state.read_calls} >= {"customer", "sidecar"}

        # registry rides the manifest
        manifest = json.load(open(f"{d}/state/MANIFEST.json"))
        assert "sidecar" in manifest["registry"]

        expected = cdc_apply(
            spark.table("customer"),
            _feed(spark, SF_SMALL, "customer"),
            "c_custkey",
            _CUST_COLS,
        )
        got = DynamicMultiTableState(spark, f"{d}/state", RelationRegistry(),
                                     n_buckets=n_buckets).read()["customer"]
        assert got.select(*expected.columns).exceptAll(expected).count() == 0
        assert expected.exceptAll(got.select(*expected.columns)).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)
