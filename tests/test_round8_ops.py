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

    def read_buckets(self, buckets, fields=None):
        self.read_calls.append(list(buckets))
        return super().read_buckets(buckets, fields=fields)

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


def test_fuse_groups_subset_schema_rule(spark):
    """BucketedMultiTableState.commit's write fusion: tables fuse ONLY when
    they share the touched-bucket list, the bucketing key columns, and one
    schema is a subset of the other — by_group/support (topk shape) fuse;
    minmax's support (disjoint value columns beyond the group key) and
    differently-bucketed or differently-keyed tables never do."""
    from pgcapture_spark.streaming.multi import BucketedMultiTableState

    d = tempfile.mkdtemp(prefix="pgcs_t_fuse_")
    try:
        state = BucketedMultiTableState(
            spark, d,
            ["by_group", "support", "minmax_sup", "orders_ck"],
            {"by_group": "g", "support": "g", "minmax_sup": "g", "orders_ck": "o"},
            n_buckets=8,
        )
        bg = spark.createDataFrame([(1, 10, 5)], "k bigint, g bigint, v bigint")
        sup = spark.createDataFrame(
            [(1, 10, 5, None)], "k bigint, g bigint, v bigint, _th bigint"
        )
        mm = spark.createDataFrame(
            [(10, 1, 5, 1, 5, 1)],
            "g bigint, n bigint, min_v bigint, cnt_min bigint,"
            " max_v bigint, cnt_max bigint",
        )
        ck = spark.createDataFrame([(1, 10, 5)], "k bigint, o bigint, v bigint")
        groups = state._fuse_groups(
            {
                "by_group": (bg, [0, 1]),
                "support": (sup, [0, 1]),       # subset schema, same key+buckets -> fuse
                "minmax_sup": (mm, [0, 1]),     # only 'g' shared -> no fuse
                "orders_ck": (ck, [0, 1]),      # different key -> no fuse
            }
        )
        assert sorted(map(sorted, groups)) == [
            ["by_group", "support"], ["minmax_sup"], ["orders_ck"],
        ]
        # different bucket list blocks fusion even with identical schemas
        groups2 = state._fuse_groups(
            {"by_group": (bg, [0, 1]), "support": (sup, [0, 2])}
        )
        assert sorted(map(sorted, groups2)) == [["by_group"], ["support"]]

        # end-to-end: the fused write lands per-table dirs readable alone
        allb = list(range(8))
        state.commit({"by_group": (bg, allb), "support": (sup, allb)}, 0)
        got_bg = state.read_buckets("by_group", list(range(8)))
        got_sup = state.read_buckets("support", list(range(8)))
        assert got_bg.select("k", "g", "v").collect() == bg.collect()
        assert [tuple(r) for r in got_sup.select("k", "g", "v", "_th").collect()] == [
            (1, 10, 5, None)
        ]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_manifest_diff_reads_only_changed_buckets(spark):
    """snapshot_diff_asof prunes to the buckets whose version pointers
    differ between the two retained manifests — and still produces the
    complete diff (equal pointers reference identical immutable files)."""
    from pgcapture_spark.operators.timetravel import (
        changed_buckets,
        diff_frames,
        snapshot_diff_asof,
    )
    from pgcapture_spark.querydefs.r8wave import _run_retained_apply

    state, manifests = _run_retained_apply(spark, SF_SMALL)
    m_a, m_b = manifests[1], state.manifest_snapshot()
    n = state.n_buckets
    diff_b = changed_buckets(m_a, m_b, n)
    assert 0 < len(diff_b) <= n

    reads: list[int] = []
    orig = state.read_asof

    def recording(manifest, buckets=None):
        reads.append(len(buckets) if buckets is not None else n)
        return orig(manifest, buckets)

    state.read_asof = recording
    got = snapshot_diff_asof(state, m_a, m_b, "c_custkey", _CUST_COLS)
    # pruned: both sides read exactly the changed-bucket lists
    assert reads == [len(diff_b), len(diff_b)]

    full = diff_frames(
        orig(m_a).select("c_custkey", *_CUST_COLS),
        orig(m_b).select("c_custkey", *_CUST_COLS),
        "c_custkey",
        _CUST_COLS,
    )
    assert got.exceptAll(full).count() == 0
    assert full.exceptAll(got).count() == 0


def test_debounce_flush_rules_match_reference_fold(spark):
    """The declared cdc_debounce_flush_rules window algebra must deliver
    EXACTLY what a direct simulation of the reference's DebounceHandler
    state machine delivers (pkg/pgcapture/debounce.go:87-155): per (key,
    interval) buffer, INSERT/DELETE flush-then-fire, UPDATE replace-if-
    newer with lsn=0 dump events always counting as latest, arriving older
    events dropped, interval end flushes the survivor."""
    import duckdb

    from pgcapture_spark.queries import REGISTRY

    sf = SF_SMALL
    con = duckdb.connect()
    rows = con.sql(
        f"""
        SELECT event_id AS id, user_id AS k,
               event_id % 11 = 3 AS dump,
               CASE WHEN event_id % 11 = 3 THEN 'UPDATE'
                    WHEN event_id % 5 = 0 THEN 'INSERT'
                    WHEN event_id % 5 = 1 THEN 'DELETE'
                    ELSE 'UPDATE' END AS op,
               CASE WHEN event_id % 11 = 3 THEN event_id
                    ELSE 100000000 + event_id * 100 END AS ck,
               (event_id * 48271) % 2147483647 AS at
        FROM '{sf}/events.parquet'
        WHERE event_id IS NOT NULL AND user_id IS NOT NULL
        ORDER BY at, id
        """
    ).fetchall()

    # the reference fold, per (key, interval) buffer
    delivered: set[tuple] = set()
    buffers: dict[tuple, tuple] = {}  # (k, iv) -> (id, ck, dump)
    for id_, k, dump, op, ck, at in rows:
        iv = at // 268435456
        bk = (k, iv)
        if op in ("INSERT", "DELETE"):
            if bk in buffers:
                delivered.add((k, buffers.pop(bk)[0], "debounced"))
            delivered.add((k, id_, "direct"))
        else:  # UPDATE: replace-if-newer, dump always latest, older dropped
            prev = buffers.get(bk)
            if prev is None or dump or ck > prev[1]:
                buffers[bk] = (id_, ck, dump)  # prev (if any) committed, not delivered
            # else: arriving older — committed, dropped
    for (k, _iv), (id_, _ck, _d) in buffers.items():  # interval-end flush
        delivered.add((k, id_, "debounced"))

    got = {
        (r.user_id, r.event_id, r.kind)
        for r in REGISTRY["cdc_debounce_flush_rules"].fn(spark, sf).collect()
    }
    assert got == delivered


def test_debounce_survivor_closed_form_property():
    """The closed-form survivor rule the two debounce queries encode —
    'the earliest arrival all of whose successors are non-dump and
    checkpoint-older' — must equal the sequential replace-if-newer fold
    (dump always replaces; older arrivals drop) for EVERY sequence, not
    just the fixture's. Pure-Python hypothesis sweep over one segment;
    distinct checkpoints (the fixture's construction guarantees this —
    equal checkpoints only arise from redelivery of one event)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @st.composite
    def segments(draw):
        n = draw(st.integers(min_value=1, max_value=9))
        cks = draw(
            st.lists(
                st.integers(min_value=0, max_value=1000),
                min_size=n, max_size=n, unique=True,
            )
        )
        dumps = draw(st.lists(st.booleans(), min_size=n, max_size=n))
        return list(zip(cks, dumps))

    @given(segments())
    @settings(max_examples=300, deadline=None)
    def run(seg):
        # sequential fold (the reference semantics)
        stored = None
        for i, (ck, dump) in enumerate(seg):
            if stored is None or dump or ck > seg[stored][0]:
                stored = i
        # closed form: earliest i with all later (non-dump and ck < ck_i)
        ok = [
            i
            for i in range(len(seg))
            if all(
                (not d2) and c2 < seg[i][0] for c2, d2 in seg[i + 1 :]
            )
        ]
        assert ok, "at least the last element always qualifies"
        assert min(ok) == stored

    run()


def test_debounce_keychange_rules_match_reference_fold(spark):
    """cdc_debounce_keychange_rules vs a direct simulation of the full
    Handle() state machine INCLUDING the old-image flush path
    (pkg/pgcapture/debounce.go:112-119): an UPDATE carrying an old image
    delivers the OLD key's buffered event first; when old == new key the
    arriving event then stores unconditionally (its own flush emptied the
    buffer) — even with an older checkpoint."""
    import duckdb

    from pgcapture_spark.queries import REGISTRY

    sf = SF_SMALL
    con = duckdb.connect()
    rows = con.sql(
        f"""
        SELECT event_id AS id, user_id % 40 AS k,
               (user_id + event_id) % 40 AS alt,
               event_id % 11 = 3 AS dump,
               CASE WHEN event_id % 11 = 3 THEN 'UPDATE'
                    WHEN event_id % 5 = 0 THEN 'INSERT'
                    WHEN event_id % 5 = 1 THEN 'DELETE'
                    ELSE 'UPDATE' END AS op,
               event_id % 11 <> 3 AND event_id % 5 NOT IN (0, 1)
                 AND event_id % 7 = 2 AS has_old,
               CASE WHEN event_id % 11 = 3 THEN event_id
                    ELSE 100000000 + event_id * 100 END AS ck,
               (event_id * 48271) % 2147483647 AS at
        FROM '{sf}/events.parquet'
        WHERE event_id IS NOT NULL AND user_id IS NOT NULL
        ORDER BY at, id
        """
    ).fetchall()

    delivered: set[tuple] = set()
    buffers: dict[tuple, tuple] = {}  # (key, iv) -> (id, ck, dump)
    for id_, k, alt, dump, op, has_old, ck, at in rows:
        iv = at // 268435456
        if op in ("INSERT", "DELETE"):
            if (k, iv) in buffers:
                delivered.add((k, buffers.pop((k, iv))[0], "debounced"))
            delivered.add((k, id_, "direct"))
            continue
        # UPDATE: the old-image flush runs FIRST, unconditionally
        if has_old and (alt, iv) in buffers:
            delivered.add((alt, buffers.pop((alt, iv))[0], "debounced"))
        prev = buffers.get((k, iv))
        if prev is None or dump or ck > prev[1]:
            buffers[(k, iv)] = (id_, ck, dump)
        # else: arriving older — committed, dropped
    for (k, _iv), (id_, _ck, _d) in buffers.items():
        delivered.add((k, id_, "debounced"))

    got = {
        (r.user_key, r.event_id, r.kind)
        for r in REGISTRY["cdc_debounce_keychange_rules"].fn(spark, sf).collect()
    }
    assert got == delivered
    # the fixture must actually exercise the key-change path
    n_kc = sum(1 for r in rows if r[5] and r[1] != r[2])
    assert n_kc > 5, f"fixture produced only {n_kc} cross-key old images"


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

        def read_buckets(self, table, buckets, fields=None):
            self.read_calls.append((table, len(buckets)))
            return super().read_buckets(table, buckets, fields=fields)

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
