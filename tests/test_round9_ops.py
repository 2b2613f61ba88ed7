"""Round-9 operator tests: the bounded time-travel retention window, the
per-table dynamic seeding guard (crash between two tables' seeds), composite
replica identities on the dynamic relation-learning path (with read audit),
and the multi-table bucket-layout migration."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from pgcapture_spark.catalog import CDC_COLS, register_views
from pgcapture_spark.queries import _feed
from pgcapture_spark.streaming.state import BucketedSnapshotState
from tests.conftest import SF_SMALL

_CUST_COLS = CDC_COLS["customer"]


# ------------------------------------------------------- retention window


def _mk_rows(spark, lo, hi, v):
    return spark.createDataFrame(
        [(k, f"{v}-{k}") for k in range(lo, hi)], "k bigint, val string"
    )


def test_retention_window_bounds_storage_and_fails_loudly(spark):
    """retain_versions=N: history trims to the last N superseded manifests,
    vacuum removes version dirs referenced by none of the retained
    manifests (storage bounded), manifest_asof inside the window resolves
    the exact point-in-time content, and both manifest_asof and read_asof
    past the window fail loudly instead of returning holes."""
    import pytest

    d = tempfile.mkdtemp(prefix="pgcs_t_retention_")
    try:
        state = BucketedSnapshotState(
            spark, f"{d}/st", "k", n_buckets=4, retain_versions=2
        )
        state.initialize(_mk_rows(spark, 0, 8, "base"))
        stale = None
        # every batch rewrites the SAME keys, so each commit fully supersedes
        # the previous one's version for those buckets — batch 0's version
        # dir becomes unreferenced once the window slides past it
        for b in range(4):
            delta = _mk_rows(spark, 0, 2, f"b{b}")
            tb = state.touched_buckets(delta)
            cur = state.read_buckets(tb)
            # commit_buckets replaces the touched buckets wholesale — pass
            # the FULL merged slice (the consumers' merge_images analog)
            merged = cur.alias("c").join(delta.alias("d"), "k", "left_outer").select(
                "k", F.coalesce("d.val", "c.val").alias("val")
            )
            state.commit_buckets(merged, tb, b)
            state.vacuum()
            if b == 0:
                stale = state.manifest_snapshot()  # references v0 — trimmed later

        assert state.retained_batches() == [1, 2, 3]

        # inside the window: exact point-in-time content
        asof2 = state.read_asof(state.manifest_asof(2))
        rows = {r.k: r.val for r in asof2.collect()}
        assert rows[0] == "b2-0" and rows[6] == "base-6"  # b3 not yet applied

        # past the window: loud, not a hole — batch 0's version dir was
        # vacuumed when the history window slid past it
        assert "v000000000000" not in os.listdir(f"{d}/st")
        with pytest.raises(ValueError, match="not retained"):
            state.manifest_asof(0)
        with pytest.raises(ValueError, match="retention window"):
            state.read_asof(stale)

        # storage bound: on-disk version dirs == retained manifests' targets
        referenced = set()
        for b in state.retained_batches():
            referenced.update(state.manifest_asof(b)["buckets"].values())
        on_disk = {
            n
            for n in os.listdir(f"{d}/st")
            if n.startswith("v") and os.path.isdir(os.path.join(f"{d}/st", n))
        }
        assert on_disk == referenced
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_retention_multi_history_is_cross_table_consistent(spark):
    """BucketedMultiTableState retention: a retained entry carries EVERY
    table's pointer map from one atomic swap, vacuum keeps exactly the
    retained targets, and as-of reads resolve each table at that commit."""
    import pytest

    from pgcapture_spark.streaming.multi import BucketedMultiTableState

    d = tempfile.mkdtemp(prefix="pgcs_t_retmulti_")
    try:
        state = BucketedMultiTableState(
            spark, f"{d}/st", ["a", "b"], {"a": "k", "b": "k"},
            n_buckets=4, retain_versions=1,
        )
        state.initialize(
            {"a": _mk_rows(spark, 0, 4, "a0"), "b": _mk_rows(spark, 0, 4, "b0")}
        )
        def _merged(t, delta):
            tb = state.touched_buckets(t, delta)
            cur = state.read_buckets(t, tb)
            full = cur.alias("c").join(delta.alias("d"), "k", "left_outer").select(
                "k", F.coalesce("d.val", "c.val").alias("val")
            )
            return full, tb

        for i in range(3):
            state.commit(
                {
                    "a": _merged("a", _mk_rows(spark, i, i + 1, f"a{i + 1}")),
                    "b": _merged("b", _mk_rows(spark, i, i + 1, f"b{i + 1}")),
                },
                i,
            )
            state.vacuum()
        assert state.retained_batches() == [1, 2]
        m1 = state.manifest_asof(1)
        a1 = {r.k: r.val for r in state.read_asof("a", m1).collect()}
        b1 = {r.k: r.val for r in state.read_asof("b", m1).collect()}
        assert a1[1] == "a2-1" and a1[2] == "a0-2"  # batch 2 not yet applied
        assert b1[1] == "b2-1" and b1[2] == "b0-2"
        with pytest.raises(ValueError, match="not retained"):
            state.manifest_asof(0)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --------------------------------------------- dynamic seeding crash guard


def test_dynamic_seed_recovers_from_crash_between_tables(spark):
    """ADVICE r8 (medium): a crash AFTER seeding table A but BEFORE table B
    must not strand B — the per-table guard re-seeds B on restart (a table
    is seeded iff its bucket pointers exist). Simulated by pre-seeding only
    one of two initial snapshots (exactly the post-crash manifest state)
    and then running the stream."""
    from pgcapture_spark.operators.generic_feed import to_binary_feed
    from pgcapture_spark.sources.feed import materialize_feed, read_feed_stream
    from pgcapture_spark.streaming.multi import (
        DynamicMultiTableState,
        apply_stream_dynamic,
    )
    from pgcapture_spark.streaming.registry import RelationRegistry

    d = tempfile.mkdtemp(prefix="pgcs_t_seedcrash_")
    try:
        meta = ("lsn", "seq", "ord", "commit_ts", "op", "table_name", "query")
        typed = spark.sql(
            """
SELECT id + 1 AS lsn, 1 AS seq, CAST(id AS BIGINT) AS ord,
       CAST(NULL AS TIMESTAMP) AS commit_ts, 'UPDATE' AS op,
       CAST(id % 3 AS BIGINT) AS m_id,
       CAST(id AS DOUBLE) AS m_value,
       CAST(NULL AS BIGINT) AS old_m_id,
       'm_id,m_value' AS present
FROM range(6) t(id)
"""
        )
        wire = (
            to_binary_feed(
                typed, [("m_id", 20), ("m_value", 701)],
                old_key=("old_m_id", "m_id", 20),
            )
            .withColumn("table_name", F.lit("t_a"))
            .withColumn("query", F.lit(None).cast("string"))
            .select(*meta, "fields", "old_fields")
        )
        materialize_feed(wire, f"{d}/feed", n_segments=2)
        schema = spark.read.parquet(f"{d}/feed").schema

        reg = RelationRegistry()
        reg.learn_static("t_a", ["m_id"], [("m_id", 20), ("m_value", 701)])
        reg.learn_static("t_b", ["m_id"], [("m_id", 20), ("m_value", 701)])
        snaps = {
            "t_a": spark.createDataFrame(
                [(100, 1.0)], "m_id bigint, m_value double"
            ),
            "t_b": spark.createDataFrame(
                [(200, 2.0), (201, 3.0)], "m_id bigint, m_value double"
            ),
        }
        state = DynamicMultiTableState(spark, f"{d}/state", reg)
        # the simulated crash: t_a seeded, manifest swapped, t_b never seeded
        state.seed_table("t_a", snaps["t_a"])
        assert state.initialized()  # the r8 whole-state guard would skip t_b

        q = apply_stream_dynamic(
            read_feed_stream(spark, f"{d}/feed", schema, max_files_per_trigger=1),
            state,
            snaps,
            f"{d}/ckpt",
        )
        q.awaitTermination(300)
        out = state.read()
        b_rows = {r.m_id: r.m_value for r in out["t_b"].collect()}
        assert b_rows == {200: 2.0, 201: 3.0}, b_rows  # t_b's base survived
        a_rows = {r.m_id: r.m_value for r in out["t_a"].collect()}
        assert a_rows[100] == 1.0 and set(a_rows) == {0, 1, 2, 100}
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ------------------------------------- composite dynamic path: read audit


def test_dynamic_composite_key_bucketed_reads_touched_only(spark):
    """The composite-identity dynamic apply reads strict bucket subsets per
    micro-batch (the r8 read-audit contract, now with a two-column key) and
    converges to the typed batch apply of the same feed."""
    from pgcapture_spark.fixtures.cdc_feed import metrics_composite_feed_sql
    from pgcapture_spark.operators.apply import cdc_apply
    from pgcapture_spark.operators.generic_feed import to_binary_feed
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

        def read_buckets(self, table, buckets, fields=None):
            self.read_calls.append((table, len(buckets)))
            return super().read_buckets(table, buckets, fields=fields)

    d = tempfile.mkdtemp(prefix="pgcs_t_dyncomp_")
    n_buckets = 64
    try:
        meta = ("lsn", "seq", "ord", "commit_ts", "op", "table_name", "query")
        typed = spark.sql(metrics_composite_feed_sql())
        wire = (
            to_binary_feed(
                typed,
                [("g_id", 20), ("s_id", 20), ("m_value", 701), ("m_note", 25)],
                old_key=[("old_g_id", "g_id", 20), ("old_s_id", "s_id", 20)],
            )
            .withColumn("table_name", F.lit("readings"))
            .withColumn("query", F.lit(None).cast("string"))
            .select(*meta, "fields", "old_fields")
        )
        materialize_feed(wire, f"{d}/feed", n_segments=4)
        schema = spark.read.parquet(f"{d}/feed").schema

        reg = RelationRegistry()
        reg.learn_static(
            "readings",
            ["g_id", "s_id"],
            [("g_id", 20), ("s_id", 20), ("m_value", 701), ("m_note", 25)],
        )
        state = _Recording(spark, f"{d}/state", reg, n_buckets=n_buckets)
        assert state.keys["readings"] == ["g_id", "s_id"]  # adopted
        q = apply_stream_dynamic(
            read_feed_stream(spark, f"{d}/feed", schema, max_files_per_trigger=1),
            state,
            {},
            f"{d}/ckpt",
        )
        q.awaitTermination(300)

        assert state.read_calls
        assert all(0 < n < n_buckets for _, n in state.read_calls)

        expected = cdc_apply(
            typed.select("g_id", "s_id", "m_value", "m_note").limit(0),
            typed,
            ["g_id", "s_id"],
            ["m_value", "m_note"],
        )
        got = state.read()["readings"]
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --------------------------------------------------- multi-table rebucket


def test_rebucket_multi_preserves_every_table_and_gate(spark):
    """BucketedMultiTableState.rebucket: every table's content is identical
    under the new layout, the replay gate carries, the source state is
    untouched, and retained history does NOT leak into the fresh root."""
    from pgcapture_spark.streaming.multi import BucketedMultiTableState

    d = tempfile.mkdtemp(prefix="pgcs_t_rbmulti_")
    try:
        state = BucketedMultiTableState(
            spark, f"{d}/st", ["a", "b"], {"a": "k", "b": "k"}, n_buckets=8
        )
        state.initialize(
            {"a": _mk_rows(spark, 0, 10, "a"), "b": _mk_rows(spark, 0, 6, "b")}
        )
        da = _mk_rows(spark, 3, 5, "a1")
        state.commit({"a": (da, state.touched_buckets("a", da))}, 7)

        new = state.rebucket(f"{d}/st2", new_n_buckets=3)
        assert new.last_batch() == 7 and new.n_buckets == 3
        for t in ("a", "b"):
            src = {r.k: r.val for r in state.read()[t].collect()}
            dst = {r.k: r.val for r in new.read()[t].collect()}
            assert src == dst, t
        assert state.last_batch() == 7  # source untouched
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_retention_dynamic_bounds_storage_and_carries_through_rebucket(spark):
    """DynamicMultiTableState retention: the same bounded-history contract as
    the static states on a table set learned at runtime — retained entries
    resolve as-of reads, vacuum keeps exactly the retained pointer targets,
    manifest_asof past the window fails loudly, and rebucket carries the
    retain_versions setting onto the migrated root."""
    import pytest

    from pgcapture_spark.streaming.multi import DynamicMultiTableState
    from pgcapture_spark.streaming.registry import RelationRegistry

    d = tempfile.mkdtemp(prefix="pgcs_t_retdyn_")
    try:
        reg = RelationRegistry()
        reg.learn_static("t_a", ["k"], [("k", 20), ("val", 25)])
        state = DynamicMultiTableState(
            spark, f"{d}/st", reg, n_buckets=4, retain_versions=1
        )
        state.seed_table("t_a", _mk_rows(spark, 0, 4, "a0"))
        for i in range(3):
            delta = _mk_rows(spark, i, i + 1, f"a{i + 1}")
            tb = state.touched_buckets("t_a", delta)
            cur = state.read_buckets("t_a", tb)
            full = cur.alias("c").join(delta.alias("d"), "k", "left_outer").select(
                "k", F.coalesce("d.val", "c.val").alias("val")
            )
            state.commit({"t_a": (full, tb)}, i)
            state.vacuum()
        assert state.retained_batches() == [1, 2]
        a1 = {r.k: r.val for r in state.read_asof("t_a", state.manifest_asof(1)).collect()}
        assert a1[1] == "a2-1" and a1[2] == "a0-2"  # batch 2 not yet applied
        with pytest.raises(ValueError, match="not retained"):
            state.manifest_asof(0)
        # vacuum bound: on-disk version dirs == union of retained pointers
        referenced: set[str] = set()
        for b in state.retained_batches():
            for per_t in state.manifest_asof(b)["buckets"].values():
                referenced.update(per_t.values())
        on_disk = {
            n
            for n in os.listdir(state.root)
            if n.startswith("v") and os.path.isdir(os.path.join(state.root, n))
        }
        assert on_disk == referenced, (sorted(on_disk), sorted(referenced))
        migrated = state.rebucket(f"{d}/st2", new_n_buckets=2)
        assert migrated.retain_versions == 1  # retention contract carried
        assert migrated.last_batch() == state.last_batch()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_rebucket_dynamic_carries_registry(spark):
    """DynamicMultiTableState.rebucket: the learned relation registry rides
    the migrated manifest, so a fresh handle on the new root rehydrates
    every relation without re-observing its CREATE/Relation events."""
    from pgcapture_spark.streaming.multi import DynamicMultiTableState
    from pgcapture_spark.streaming.registry import RelationRegistry

    d = tempfile.mkdtemp(prefix="pgcs_t_rbdyn_")
    try:
        reg = RelationRegistry()
        reg.learn_static("t_a", ["m_id"], [("m_id", 20), ("m_value", 701)])
        state = DynamicMultiTableState(spark, f"{d}/st", reg, n_buckets=8)
        state.seed_table(
            "t_a",
            spark.createDataFrame([(1, 1.5), (2, 2.5)], "m_id bigint, m_value double"),
        )
        new = state.rebucket(f"{d}/st2", new_n_buckets=2)
        rehydrated = DynamicMultiTableState(
            spark, f"{d}/st2", RelationRegistry(), n_buckets=2
        )
        assert rehydrated.registry.tables() == ["t_a"]
        got = {r.m_id: r.m_value for r in rehydrated.read()["t_a"].collect()}
        assert got == {1: 1.5, 2: 2.5}
        assert new.n_buckets == 2
    finally:
        shutil.rmtree(d, ignore_errors=True)
