"""DDL schema evolution (SURVEY §2 A6, §7 P5): parser, batch apply with an
in-stream ALTER, and the streaming pipeline variant."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pgcapture_spark.catalog import register_views
from pgcapture_spark.fixtures.cdc_feed import ddl_feed_sql
from pgcapture_spark.operators.ddl import evolve_snapshot, parse_alter
from pgcapture_spark.queries import REGISTRY
from pgcapture_spark.sources.feed import materialize_feed, read_feed_stream
from pgcapture_spark.streaming.pipeline import apply_stream_with_ddl
from pgcapture_spark.streaming.state import SnapshotState
from tests.conftest import SF_SMALL


def test_parse_alter_add_drop():
    a = parse_alter("ALTER TABLE public.customer ADD COLUMN c_note text")
    assert a.schema == "public" and a.table == "customer"
    assert a.add == [("c_note", "string")] and a.drop == []

    b = parse_alter("alter table t add col1 int8, drop column old1, add if not exists col2 double precision;")
    assert b.add == [("col1", "bigint"), ("col2", "double")]
    assert b.drop == ["old1"]

    assert parse_alter("CREATE INDEX foo ON t(x)") is None
    assert parse_alter("ALTER TABLE t OWNER TO bob") is None


def test_evolve_snapshot_add_is_null_filled(spark):
    df = spark.createDataFrame([(1, 2.0)], "k bigint, v double")
    out, cols = evolve_snapshot(df, ["v"], parse_alter("ALTER TABLE t ADD COLUMN note text"))
    assert cols == ["v", "note"]
    row = out.collect()[0]
    assert row.note is None


def test_bucketed_ddl_drop_column_hides_lazily(spark):
    """DROP COLUMN on the bucketed path: the dropped column disappears from
    reads immediately (manifest alignment) even while untouched buckets'
    old files still physically carry it; a later ADD of a same-typed new
    column NULL-fills for pre-DDL rows."""
    d = tempfile.mkdtemp(prefix="pgcs_ddldrop_")
    try:
        from pgcapture_spark.streaming.state import EvolvingBucketedState

        snap = spark.createDataFrame(
            [(i, float(i), f"m{i}") for i in range(40)],
            "k bigint, v double, m string",
        )
        feed = spark.createDataFrame(
            [
                # batch 1 territory: plain update of k=1
                (100, "UPDATE", None, 1, 99.0, None, "k,v"),
                # batch 2: DROP m, ADD note; post-DDL update sets note on k=2
                (200, "DDL", "ALTER TABLE t DROP COLUMN m, ADD COLUMN note text",
                 None, None, None, ""),
                (300, "UPDATE", None, 2, None, "hello", "k,note"),
            ],
            "ord bigint, op string, query string, k bigint, v double,"
            " note string, present string",
        )
        feed_dir = f"{d}/feed"
        materialize_feed(feed, feed_dir, n_segments=2)
        schema = spark.read.parquet(feed_dir).schema
        state = EvolvingBucketedState(spark, f"{d}/state", "k", n_buckets=16)
        q = apply_stream_with_ddl(
            read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
            state, snap, "k", f"{d}/ckpt",
        )
        q.awaitTermination(120)
        final = state.read()
        assert sorted(final.columns) == ["k", "note", "v"]  # m gone, note added
        rows = {r.k: r for r in final.collect()}
        assert len(rows) == 40
        assert rows[1].v == 99.0 and rows[1].note is None
        assert rows[2].note == "hello"
        assert rows[3].note is None  # untouched bucket row: lazy NULL-fill
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bucketed_ddl_apply_lazy_evolution(spark):
    """EvolvingBucketedState: the ALTER is a version boundary — buckets
    untouched by any post-init batch keep their ORIGINAL vinit files (never
    rewritten for the DDL), yet the aligned read surfaces the added column
    as NULL for them; the stream converges to the batch result."""
    import json

    from pgcapture_spark.streaming.state import EvolvingBucketedState

    d = tempfile.mkdtemp(prefix="pgcs_ddlbkt_")
    try:
        register_views(spark, SF_SMALL, ("customer",))
        feed = spark.sql(ddl_feed_sql())
        expected = REGISTRY["cdc_apply_ddl_evolution"].fn(spark, SF_SMALL)

        feed_dir = f"{d}/feed"
        materialize_feed(feed, feed_dir, n_segments=4)
        schema = spark.read.parquet(feed_dir).schema
        state = EvolvingBucketedState(spark, f"{d}/state", "c_custkey", n_buckets=64)
        q = apply_stream_with_ddl(
            read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
            state,
            spark.table("customer").select("c_custkey", "c_acctbal"),
            "c_custkey",
            f"{d}/ckpt",
        )
        q.awaitTermination(120)
        final = state.read()
        assert sorted(final.columns) == sorted(expected.columns)
        assert final.exceptAll(expected).count() == 0
        assert expected.exceptAll(final).count() == 0
        assert final.where("c_note IS NOT NULL").count() > 0

        manifest = json.load(open(f"{d}/state/MANIFEST.json"))
        # the evolved field list rides in the manifest
        assert ["c_note", "string"] in manifest["schema"]
        # lazy evolution: at 64 buckets >> touched keys, some buckets still
        # point at the pre-DDL vinit files — the DDL rewrote nothing it
        # didn't have to
        assert "vinit" in set(manifest["buckets"].values())
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_apply_with_ddl_matches_batch(spark):
    d = tempfile.mkdtemp(prefix="pgcs_ddl_")
    try:
        register_views(spark, SF_SMALL, ("customer",))
        feed = spark.sql(ddl_feed_sql())
        expected = REGISTRY["cdc_apply_ddl_evolution"].fn(spark, SF_SMALL)

        feed_dir = f"{d}/feed"
        materialize_feed(feed, feed_dir, n_segments=4)
        schema = spark.read.parquet(feed_dir).schema
        state = SnapshotState(spark, f"{d}/state")
        q = apply_stream_with_ddl(
            read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
            state,
            spark.table("customer").select("c_custkey", "c_acctbal"),
            "c_custkey",
            f"{d}/ckpt",
        )
        q.awaitTermination(120)
        final = state.read()
        assert sorted(final.columns) == sorted(expected.columns)
        assert final.exceptAll(expected).count() == 0
        assert expected.exceptAll(final).count() == 0
        # the evolved column is genuinely populated post-DDL
        assert final.where("c_note IS NOT NULL").count() > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)
