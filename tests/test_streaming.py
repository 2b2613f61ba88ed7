"""Streaming pipeline tests (SURVEY §7 P3): the streamed apply must converge to
the batch cdc_apply result; replays must be idempotent; debounce emits one row
per key per micro-batch."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pgcapture_spark.catalog import CDC_COLS, register_views
from pgcapture_spark.operators.apply import cdc_apply
from pgcapture_spark.queries import _feed
from pgcapture_spark.sources.feed import materialize_feed, read_feed_stream
from pgcapture_spark.streaming.pipeline import apply_stream, debounce_stream
from pgcapture_spark.streaming.state import SnapshotState
from tests.conftest import SF_SMALL


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="pgcs_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_apply_converges_and_is_idempotent(spark, tmpdir):
    register_views(spark, SF_SMALL, ("customer",))
    snapshot = spark.table("customer")
    feed = _feed(spark, SF_SMALL, "customer")
    expected = cdc_apply(snapshot, feed, "c_custkey", CDC_COLS["customer"])

    feed_dir = f"{tmpdir}/feed"
    materialize_feed(feed, feed_dir, n_segments=6)
    schema = spark.read.parquet(feed_dir).schema

    state = SnapshotState(spark, f"{tmpdir}/state")
    batches: list[int] = []
    stream = read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=2)
    q = apply_stream(
        stream,
        state,
        snapshot,
        "c_custkey",
        CDC_COLS["customer"],
        f"{tmpdir}/ckpt",
        on_batch=lambda bid, n: batches.append(bid),
    )
    q.awaitTermination(120)
    assert len(batches) >= 2, "expected multiple micro-batches"

    final = state.read()
    assert final.exceptAll(expected).count() == 0
    assert expected.exceptAll(final).count() == 0

    # replay with a FRESH streaming checkpoint but the SAME state: every batch
    # id is at-or-below the manifest -> all skipped, state unchanged
    last = state.last_batch()
    q2 = apply_stream(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=2),
        state,
        snapshot,
        "c_custkey",
        CDC_COLS["customer"],
        f"{tmpdir}/ckpt2",
    )
    q2.awaitTermination(120)
    assert state.last_batch() == last
    final2 = state.read()
    assert final2.exceptAll(expected).count() == 0


def test_streaming_debounce_one_row_per_key_per_batch(spark, tmpdir):
    feed = _feed(spark, SF_SMALL, "customer")
    feed_dir = f"{tmpdir}/feed"
    materialize_feed(feed, feed_dir, n_segments=4)
    schema = spark.read.parquet(feed_dir).schema

    flushed: list[tuple[int, int, int]] = []

    def sink(df, batch_id):
        rows = df.groupBy("c_custkey").count().where("count > 1").count()
        flushed.append((batch_id, df.count(), rows))

    q = debounce_stream(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
        "c_custkey",
        sink,
        f"{tmpdir}/ckpt",
    )
    q.awaitTermination(120)
    assert len(flushed) >= 2
    total = sum(n for _, n, _ in flushed)
    assert total <= feed.count()
    # invariant: never more than one emitted row per key within a batch
    assert all(dups == 0 for _, _, dups in flushed)


def test_stateful_debounce_timer_flush(spark, tmpdir):
    """With a short interval, buffered UPDATEs are flushed by the processing-
    time timer (reference: the Interval ticker, debounce.go:87-104)."""
    from pgcapture_spark.streaming.debounce_state import stateful_debounce

    feed = spark.createDataFrame(
        [(1, 10, 1, 100, "UPDATE"), (2, 11, 1, 101, "UPDATE")],
        "key bigint, lsn bigint, seq int, arr bigint, op string",
    )
    feed_dir = f"{tmpdir}/feed"
    feed.coalesce(1).write.parquet(feed_dir)
    schema = spark.read.parquet(feed_dir).schema
    stream = spark.readStream.schema(schema).parquet(feed_dir)
    q = (
        stateful_debounce(stream, "key", interval_ms=2000)
        .writeStream.format("parquet")
        .option("path", f"{tmpdir}/out")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    deadline = time.time() + 60
    rows = []
    while time.time() < deadline:
        try:
            rows = spark.read.parquet(f"{tmpdir}/out").collect()
        except Exception:
            rows = []
        if len(rows) == 2:
            break
        time.sleep(1)
    q.stop()
    assert len(rows) == 2
    assert all(r.flush_kind == "timer" for r in rows)
    assert sorted(r.key for r in rows) == [1, 2]


def test_bucketed_apply_touches_only_changed_buckets(spark, tmpdir):
    """BucketedSnapshotState: converges to the batch cdc_apply result while
    rewriting only the key-buckets each micro-batch touches."""
    import json

    from pgcapture_spark.streaming.pipeline import apply_stream_bucketed
    from pgcapture_spark.streaming.state import BucketedSnapshotState

    register_views(spark, SF_SMALL, ("customer",))
    snapshot = spark.table("customer")
    # a narrow feed slice so most buckets stay untouched
    feed = _feed(spark, SF_SMALL, "customer").where("c_custkey % 29 = 0")
    expected = cdc_apply(snapshot, feed, "c_custkey", CDC_COLS["customer"])

    feed_dir = f"{tmpdir}/feed"
    materialize_feed(feed, feed_dir, n_segments=4)
    schema = spark.read.parquet(feed_dir).schema

    state = BucketedSnapshotState(spark, f"{tmpdir}/state", "c_custkey", n_buckets=32)
    state.initialize(snapshot)
    touched: list[list[int]] = []
    q = apply_stream_bucketed(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
        state,
        "c_custkey",
        CDC_COLS["customer"],
        f"{tmpdir}/ckpt",
        on_batch=lambda bid, bs: touched.append(bs),
    )
    q.awaitTermination(120)
    assert len(touched) >= 2

    final = state.read().select(*expected.columns)
    assert final.exceptAll(expected).count() == 0
    assert expected.exceptAll(final).count() == 0

    # untouched buckets still point at the initial version — never rewritten
    manifest = json.load(open(f"{tmpdir}/state/MANIFEST.json"))
    versions = set(manifest["buckets"].values())
    assert "vinit" in versions, "expected some buckets never rewritten"
    ever_touched = {b for bs in touched for b in bs}
    for b, v in manifest["buckets"].items():
        if int(b) not in ever_touched:
            assert v == "vinit"


def test_bucketed_apply_crash_resume_and_vacuum(spark, tmpdir):
    """Kill the stream mid-way, restart with the SAME checkpoint + state:
    replayed batches are skipped by the batch-id gate, the rest apply, and
    the final state equals the batch result. vacuum() then drops superseded
    versions without changing the readable state."""
    from pgcapture_spark.streaming.pipeline import apply_stream_bucketed
    from pgcapture_spark.streaming.state import BucketedSnapshotState

    register_views(spark, SF_SMALL, ("customer",))
    snapshot = spark.table("customer")
    feed = _feed(spark, SF_SMALL, "customer")
    expected = cdc_apply(snapshot, feed, "c_custkey", CDC_COLS["customer"])

    feed_dir = f"{tmpdir}/feed"
    materialize_feed(feed, feed_dir, n_segments=6)
    schema = spark.read.parquet(feed_dir).schema

    state = BucketedSnapshotState(spark, f"{tmpdir}/state", "c_custkey", n_buckets=16)
    state.initialize(snapshot)

    # phase 1: stop (crash) after the first committed batch
    stopper = {}

    def on_batch(bid, buckets):
        stopper.setdefault("first", bid)

    q = apply_stream_bucketed(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
        state, "c_custkey", CDC_COLS["customer"], f"{tmpdir}/ckpt",
        on_batch=on_batch,
    )
    import time
    deadline = time.time() + 60
    while "first" not in stopper and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)
    assert state.last_batch() >= 0
    mid_batch = state.last_batch()

    # phase 2: resume with the SAME checkpoint dir — picks up where it left off
    q2 = apply_stream_bucketed(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
        state, "c_custkey", CDC_COLS["customer"], f"{tmpdir}/ckpt",
    )
    q2.awaitTermination(120)
    assert state.last_batch() > mid_batch

    final = state.read().select(*expected.columns)
    assert final.exceptAll(expected).count() == 0
    assert expected.exceptAll(final).count() == 0

    removed = state.vacuum()
    assert isinstance(removed, list)
    final2 = state.read().select(*expected.columns)
    assert final2.exceptAll(expected).count() == 0


class _RecordingMultiState:
    """BucketedMultiTableState wrapper that records every read's bucket list
    (and any full-snapshot read) — the O(touched-reads) audit used by the MV
    consumer tests."""

    def __init__(self, inner):
        self._inner = inner
        self.read_calls: list[tuple[str, list[int]]] = []
        self.full_reads = 0

    def read_buckets(self, table, buckets):
        self.read_calls.append((table, list(buckets)))
        return self._inner.read_buckets(table, buckets)

    def read(self):
        self.full_reads += 1
        return self._inner.read()

    def __getattr__(self, name):
        return getattr(self._inner, name)


def test_bucketed_mv_converges_and_replay_is_noop(spark, tmpdir):
    """Bucketed MV pair (snapshot + agg under ONE manifest): converges to the
    from-scratch aggregate of the applied snapshot; a full replay with a fresh
    streaming checkpoint but the same state changes nothing (no double
    retract/add); per-batch reads touch only the buckets the batch names —
    never the full snapshot."""
    from pgcapture_spark.operators.incremental import group_agg
    from pgcapture_spark.streaming.multi import BucketedMultiTableState
    from pgcapture_spark.streaming.mv import incremental_agg_stream

    register_views(spark, SF_SMALL, ("customer",))
    snapshot = spark.table("customer")
    feed = _feed(spark, SF_SMALL, "customer")
    applied = cdc_apply(snapshot, feed, "c_custkey", CDC_COLS["customer"])
    expected = group_agg(applied, "c_nationkey", "c_acctbal")

    feed_dir = f"{tmpdir}/feed"
    materialize_feed(feed, feed_dir, n_segments=5)
    schema = spark.read.parquet(feed_dir).schema
    # 64 buckets >> distinct keys per micro-batch at sf0.001, so a touched-
    # bucket read can NEVER legitimately cover all buckets — makes the
    # strict-subset audit below deterministic
    n_buckets = 64

    def mk_state():
        return BucketedMultiTableState(
            spark,
            f"{tmpdir}/state",
            ["snapshot", "agg"],
            {"snapshot": "c_custkey", "agg": "c_nationkey"},
            n_buckets=n_buckets,
        )

    state = _RecordingMultiState(mk_state())
    q = incremental_agg_stream(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=2),
        state,
        snapshot,
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        CDC_COLS["customer"],
        f"{tmpdir}/ckpt",
    )
    q.awaitTermination(120)
    got = mk_state().read()
    agg_f, snap_f = got["agg"], got["snapshot"]
    assert agg_f.exceptAll(expected).count() == 0
    assert expected.exceptAll(agg_f).count() == 0
    # the co-committed snapshot equals the batch apply too
    assert snap_f.exceptAll(applied).count() == 0

    # O(touched) read audit: the consumer never materialized the full state,
    # and every per-batch snapshot read was a strict subset of the buckets
    # (segments are ~1/3 of the keyspace each → far fewer than all buckets)
    assert state.full_reads == 0
    snap_reads = [b for t, b in state.read_calls if t == "snapshot"]
    assert snap_reads and all(len(b) < n_buckets for b in snap_reads)

    last = state.last_batch()
    q2 = incremental_agg_stream(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=2),
        mk_state(),
        snapshot,
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        CDC_COLS["customer"],
        f"{tmpdir}/ckpt2",
    )
    q2.awaitTermination(120)
    assert mk_state().last_batch() == last
    agg2 = mk_state().read()["agg"]
    assert agg2.exceptAll(expected).count() == 0


def test_multi_table_stream_atomic_convergence(spark, tmpdir):
    """Both tables converge to their batch applies; the manifest advances once
    per batch for ALL tables (no torn cross-table state on replay)."""
    from pgcapture_spark.fixtures.cdc_feed import SPARK, multi_feed_sql
    from pgcapture_spark.streaming.multi import MultiTableState, apply_stream_multi_table

    register_views(spark, SF_SMALL, ("customer", "orders"))
    feed = spark.sql(multi_feed_sql(SPARK))
    cust_feed = _feed(spark, SF_SMALL, "customer")
    ord_feed = _feed(spark, SF_SMALL, "orders")
    expected_c = cdc_apply(
        spark.table("customer"), cust_feed, "c_custkey", CDC_COLS["customer"]
    )
    expected_o = cdc_apply(
        spark.table("orders"), ord_feed, "o_orderkey", CDC_COLS["orders"]
    )

    feed_dir = f"{tmpdir}/feed"
    materialize_feed(feed, feed_dir, n_segments=4)
    schema = spark.read.parquet(feed_dir).schema
    state = MultiTableState(spark, f"{tmpdir}/state", ["customer", "orders"])
    q = apply_stream_multi_table(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=2),
        state,
        {"customer": spark.table("customer"), "orders": spark.table("orders")},
        {"customer": "c_custkey", "orders": "o_orderkey"},
        {"customer": CDC_COLS["customer"], "orders": CDC_COLS["orders"]},
        f"{tmpdir}/ckpt",
    )
    q.awaitTermination(120)
    final = state.read()
    for df, exp in ((final["customer"], expected_c), (final["orders"], expected_o)):
        assert df.exceptAll(exp).count() == 0
        assert exp.exceptAll(df).count() == 0

    # replay with fresh checkpoint: batch ids all at-or-below manifest → no-op
    last = state.last_batch()
    q2 = apply_stream_multi_table(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=2),
        state,
        {"customer": spark.table("customer"), "orders": spark.table("orders")},
        {"customer": "c_custkey", "orders": "o_orderkey"},
        {"customer": CDC_COLS["customer"], "orders": CDC_COLS["orders"]},
        f"{tmpdir}/ckpt2",
    )
    q2.awaitTermination(120)
    assert state.last_batch() == last


def test_tws_debounce_matches_golden_spec(spark, tmpdir):
    """The transformWithStateInPandas form of the exact debounce must emit
    exactly the golden expected set (same spec as the applyInPandasWithState
    form) when the feed is drained with no timer."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState's Python worker requires protobuf",
    )
    from pgcapture_spark.fixtures.cdc_feed import debounce_expected_sql, debounce_feed_sql
    from pgcapture_spark.catalog import register_views
    from pgcapture_spark.sources.feed import materialize_feed, read_feed_stream
    from pgcapture_spark.streaming.debounce_tws import stateful_debounce_tws
    from tests.conftest import SF_SMALL

    register_views(spark, SF_SMALL, ("customer",))
    feed = spark.sql(debounce_feed_sql())
    feed_dir = f"{tmpdir}/feed"
    materialize_feed(feed, feed_dir, n_segments=5, order_col="arr")
    schema = spark.read.parquet(feed_dir).schema
    stream = read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            stateful_debounce_tws(stream, "key")
            .writeStream.format("parquet")
            .option("path", f"{tmpdir}/out")
            .option("checkpointLocation", f"{tmpdir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    got = spark.read.schema(
        "key bigint, lsn bigint, seq int, arr bigint, op string, flush_kind string"
    ).parquet(f"{tmpdir}/out")
    exp = spark.sql(debounce_expected_sql())
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_tws_debounce_kernel_rules_no_spark():
    """Drive the transformWithState processor directly with a fake state
    handle — the rule kernel (flush-by-insert/delete, dump-latest, equal
    flush-then-store, older-drop) is exercised without the protobuf worker
    the full API needs."""
    import pandas as pd

    from pgcapture_spark.streaming.debounce_tws import DebounceProcessor

    class _FakeValueState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = tuple(v)

        def clear(self):
            self.v = None

    class _FakeHandle:
        def getValueState(self, name, schema):
            return _FakeValueState()

    p = DebounceProcessor()
    p.init(_FakeHandle())

    def run(rows):
        pdf = pd.DataFrame(rows, columns=["lsn", "seq", "arr", "op"])
        out = list(p.handleInputRows((7,), iter([pdf]), None))
        return [tuple(r) for r in out[0].itertuples(index=False)] if out else []

    # UPDATE buffers; newer replaces; older drops; DELETE flushes newest
    got = run([(5, 1, 1, "UPDATE"), (5, 2, 2, "UPDATE"), (5, 1, 3, "UPDATE"),
               (5, 9, 4, "DELETE")])
    assert got == [
        (7, 5, 2, 2, "UPDATE", "flush_by_delete"),
        (7, 5, 9, 4, "DELETE", "immediate"),
    ]
    # dump (lsn=0) always replaces, INSERT flushes it
    got = run([(6, 1, 1, "UPDATE"), (0, 7, 2, "UPDATE"), (6, 9, 3, "INSERT")])
    assert got == [
        (7, 0, 7, 2, "UPDATE", "flush_by_insert"),
        (7, 6, 9, 3, "INSERT", "immediate"),
    ]
    # equal checkpoint: flush-then-store; buffer survives across batches
    got = run([(8, 3, 1, "UPDATE"), (8, 3, 2, "UPDATE")])
    assert got == [(7, 8, 3, 1, "UPDATE", "flush_by_equal")]
    got = run([(8, 9, 9, "DELETE")])
    assert got == [
        (7, 8, 3, 2, "UPDATE", "flush_by_delete"),
        (7, 8, 9, 9, "DELETE", "immediate"),
    ]


class TestApplyWireStream:
    """Streamed apply over protobuf Message bytes — cross-batch tx registry."""

    def _run(self, spark, n_segments, max_files):
        from pgcapture_spark.operators.generic_feed import CUSTOMER_FIELD_OIDS
        from pgcapture_spark.querydefs.extras import proto_customer_messages
        from pgcapture_spark.streaming.pipeline import apply_wire_stream

        register_views(spark, SF_SMALL, ("customer",))
        snapshot = spark.table("customer")
        msgs, _ = proto_customer_messages(spark, SF_SMALL)
        d = tempfile.mkdtemp(prefix="pgcs_t_wire_")
        materialize_feed(msgs, f"{d}/wire", n_segments=n_segments)
        schema = spark.read.parquet(f"{d}/wire").schema
        state = SnapshotState(spark, f"{d}/state")
        tx_state = SnapshotState(spark, f"{d}/txreg")
        q = apply_wire_stream(
            read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=max_files),
            state, tx_state, snapshot, "c_custkey",
            CUSTOMER_FIELD_OIDS, CDC_COLS["customer"], f"{d}/ckpt",
        )
        q.awaitTermination(300)
        return d, state, tx_state, msgs

    def test_tx_registry_spans_batches(self, spark):
        """One file per trigger: transactions straddle batch boundaries, so
        rows must find their Begin's commit time in the PERSISTED registry,
        not the current batch. The registry must end up covering every tx."""
        from pyspark.sql import functions as F

        d, state, tx_state, msgs = self._run(spark, n_segments=8, max_files=1)
        try:
            reg = tx_state.read()
            assert reg.where(F.col("_commit_us").isNull()).count() == 0
            feed_lsns = {r["lsn"] for r in msgs.select("lsn").distinct().collect()}
            reg_lsns = {r["lsn"] for r in reg.collect()}
            assert feed_lsns <= reg_lsns
            # converged snapshot equals the one-shot batch apply
            batch = cdc_apply(
                spark.table("customer"),
                _feed(spark, SF_SMALL, "customer"),
                "c_custkey",
                CDC_COLS["customer"],
            )
            assert state.read().exceptAll(batch).count() == 0
            assert batch.exceptAll(state.read()).count() == 0
        finally:
            shutil.rmtree(d, ignore_errors=True)


    def test_corrupt_messages_quarantine_with_parked_copy(self, spark):
        """The proto consumer shares make_quarantine with the dialect core:
        a poisoned Message batch parks (raw bytes preserved) and healthy
        batches keep applying — previously the parse exception killed the
        stream with no dead-letter at all."""
        import glob

        from pgcapture_spark.operators.generic_feed import CUSTOMER_FIELD_OIDS
        from pgcapture_spark.querydefs.extras import proto_customer_messages
        from pgcapture_spark.streaming.pipeline import apply_wire_stream

        register_views(spark, SF_SMALL, ("customer",))
        msgs, _ = proto_customer_messages(spark, SF_SMALL)
        rows = msgs.orderBy("lsn", "seq").collect()
        mid = len(rows) // 2
        # truncated length-delimited proto body -> parse error in safe mode
        doctored = [
            (r["lsn"], r["seq"], r["ord"],
             bytearray(b"\x1a\x7fshort") if i in (mid, mid + 1) else r["data"])
            for i, r in enumerate(rows)
        ]
        msgs2 = spark.createDataFrame(
            doctored, "lsn bigint, seq int, ord bigint, data binary"
        )
        d = tempfile.mkdtemp(prefix="pgcs_t_wire_poison_")
        try:
            materialize_feed(msgs2, f"{d}/wire", n_segments=8)
            schema = spark.read.parquet(f"{d}/wire").schema
            state = SnapshotState(spark, f"{d}/state")
            tx_state = SnapshotState(spark, f"{d}/txreg")
            q = apply_wire_stream(
                read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=1),
                state, tx_state, spark.table("customer"), "c_custkey",
                CUSTOMER_FIELD_OIDS, CDC_COLS["customer"], f"{d}/ckpt",
            )
            q.awaitTermination(300)
            parked = sorted(glob.glob(f"{d}/ckpt/deadletter/batch_*"))
            assert parked, "poisoned batch must be parked"
            parked_rows = spark.read.parquet(*parked)
            assert parked_rows.where("hex(data) = '1A7F73686F7274'").count() == 2
            assert state.read() is not None and state.read().count() > 0
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestApplyWireStreamMulti:
    def test_both_tables_converge_and_share_tx_registry(self, spark):
        """The single wire stream must advance BOTH snapshots to their batch
        apply results, and the shared registry covers the union lsn space."""
        from pyspark.sql import functions as F

        from pgcapture_spark.operators.generic_feed import CUSTOMER_FIELD_OIDS
        from pgcapture_spark.querydefs.extras import (
            ORDERS_FIELD_OIDS,
            proto_multi_messages,
        )
        from pgcapture_spark.streaming.multi import MultiTableState
        from pgcapture_spark.streaming.pipeline import apply_wire_stream_multi

        msgs, _ = proto_multi_messages(spark, SF_SMALL)
        d = tempfile.mkdtemp(prefix="pgcs_t_wire_multi_")
        try:
            materialize_feed(msgs, f"{d}/wire", n_segments=7)
            schema = spark.read.parquet(f"{d}/wire").schema
            state = MultiTableState(spark, f"{d}/state", ["customer", "orders"])
            tx_state = SnapshotState(spark, f"{d}/txreg")
            q = apply_wire_stream_multi(
                read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=2),
                state, tx_state,
                {"customer": spark.table("customer"), "orders": spark.table("orders")},
                {"customer": "c_custkey", "orders": "o_orderkey"},
                {"customer": CUSTOMER_FIELD_OIDS, "orders": ORDERS_FIELD_OIDS},
                {"customer": CDC_COLS["customer"], "orders": CDC_COLS["orders"]},
                f"{d}/ckpt",
            )
            q.awaitTermination(300)
            got = state.read()
            for t, key in (("customer", "c_custkey"), ("orders", "o_orderkey")):
                batch = cdc_apply(
                    spark.table(t), _feed(spark, SF_SMALL, t), key, CDC_COLS[t]
                )
                assert got[t].exceptAll(batch).count() == 0, t
                assert batch.exceptAll(got[t]).count() == 0, t
            reg = tx_state.read()
            assert reg.where(F.col("_commit_us").isNull()).count() == 0
            feed_lsns = {r["lsn"] for r in msgs.select("lsn").distinct().collect()}
            assert feed_lsns <= {r["lsn"] for r in reg.collect()}
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestApplyPgoutputStream:
    def test_relation_cache_persists_across_batches(self, spark):
        """One file per trigger: only batch 0 carries the Relation frame, so
        every later batch decodes against the PERSISTED relation cache. The
        cache must hold the full flagged column list and the converged
        snapshot must equal the batch apply."""
        from pgcapture_spark.operators.generic_feed import CUSTOMER_FIELD_OIDS
        from pgcapture_spark.querydefs.extras import customer_wire_frames
        from pgcapture_spark.streaming.pipeline import apply_pgoutput_stream

        register_views(spark, SF_SMALL, ("customer",))
        frames, _, _ = customer_wire_frames(spark, SF_SMALL, "pgoutput")
        d = tempfile.mkdtemp(prefix="pgcs_t_pgout_stream_")
        try:
            materialize_feed(frames, f"{d}/wire", n_segments=8)
            schema = spark.read.parquet(f"{d}/wire").schema
            state = SnapshotState(spark, f"{d}/state")
            tx_state = SnapshotState(spark, f"{d}/txreg")
            rel_state = SnapshotState(spark, f"{d}/relcache")
            q = apply_pgoutput_stream(
                read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=1),
                state, tx_state, rel_state,
                spark.table("customer"), CDC_COLS["customer"], f"{d}/ckpt",
            )
            q.awaitTermination(300)
            cache = sorted(
                (r["pos"], r["name"], r["oid"], r["flag"]) for r in rel_state.read().collect()
            )
            assert [(n, o) for _, n, o, _ in cache] == CUSTOMER_FIELD_OIDS
            assert [n for _, n, _, fl in cache if fl & 1] == ["c_custkey"]
            batch = cdc_apply(
                spark.table("customer"),
                _feed(spark, SF_SMALL, "customer"),
                "c_custkey",
                CDC_COLS["customer"],
            )
            assert state.read().exceptAll(batch).count() == 0
            assert batch.exceptAll(state.read()).count() == 0
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_foreign_relation_isolated_and_redefinition_replaces(self, spark):
        """Two wire-robustness contracts: (1) a SECOND relation's R frame and
        row events in the same stream must not cross-wire into the customer
        schema (rows are filtered by rel_oid, the relation is picked by
        column coverage); (2) a later R frame REDEFINING the relation with
        fewer columns replaces the cache entry wholesale — no stale tail
        positions — and a relation that no longer covers the expected
        columns quarantines (state carried forward) instead of crashing."""
        from pyspark.sql import functions as F

        from pgcapture_spark.functions.pgoutput import (
            build_begin,
            build_commit,
            build_relation,
            build_row_change,
        )
        from pgcapture_spark.functions.pgtypes import ENCODERS
        from pgcapture_spark.querydefs.extras import customer_wire_frames
        from pgcapture_spark.streaming.pipeline import apply_pgoutput_stream

        register_views(spark, SF_SMALL, ("customer",))
        frames, _, _ = customer_wire_frames(spark, SF_SMALL, "pgoutput")
        max_lsn = frames.agg(F.max("lsn")).collect()[0][0]
        lsn2 = int(max_lsn) + 1
        intruder = [
            (0, 1, -1, bytearray(build_relation(
                777, "public", "intruder", "d",
                [("i_id", 20, True), ("i_v", 25, False)],
            ))),
            (lsn2, 0, lsn2 * 100, bytearray(build_begin(lsn2, 1_000_000, 7))),
            (lsn2, 1, lsn2 * 100 + 1, bytearray(build_row_change(
                "I", 777, [("b", ENCODERS[20](123)), ("t", b"x")]
            ))),
            (lsn2, 99, lsn2 * 100 + 99, bytearray(build_commit(lsn2, lsn2, 1_000_000))),
        ]
        intruder_df = spark.createDataFrame(
            intruder, "lsn bigint, seq int, ord bigint, data binary"
        )
        d = tempfile.mkdtemp(prefix="pgcs_t_pgout_intruder_")
        try:
            materialize_feed(frames.unionAll(intruder_df), f"{d}/wire", n_segments=4)
            schema = spark.read.parquet(f"{d}/wire").schema
            state = SnapshotState(spark, f"{d}/state")
            tx_state = SnapshotState(spark, f"{d}/txreg")
            rel_state = SnapshotState(spark, f"{d}/relcache")
            q = apply_pgoutput_stream(
                read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=2),
                state, tx_state, rel_state,
                spark.table("customer"), CDC_COLS["customer"], f"{d}/ckpt",
            )
            q.awaitTermination(300)
            # intruder rows never cross-wire: converged == plain batch apply
            batch = cdc_apply(
                spark.table("customer"), _feed(spark, SF_SMALL, "customer"),
                "c_custkey", CDC_COLS["customer"],
            )
            assert state.read().exceptAll(batch).count() == 0
            assert batch.exceptAll(state.read()).count() == 0
            cache = rel_state.read().collect()
            assert {r["rel_oid"] for r in cache} == {16385, 777}

            # phase 2 (fresh stream): a LATER R frame redefining 16385 with
            # FEWER columns arrives in the same batch as the original — the
            # last one (by wire order) wins wholesale, leaving no stale tail
            # positions; the reduced relation no longer covers the expected
            # columns -> every batch quarantines and the snapshot stays at
            # the initial state instead of crashing or applying wrongly
            redef = spark.createDataFrame(
                [(0, 9, -1, bytearray(build_relation(
                    16385, "public", "customer", "d",
                    [("c_custkey", 20, True), ("c_name", 25, False)],
                )))],
                "lsn bigint, seq int, ord bigint, data binary",
            )
            materialize_feed(frames.unionAll(redef), f"{d}/wire2", n_segments=3)
            state2 = SnapshotState(spark, f"{d}/state2")
            tx2 = SnapshotState(spark, f"{d}/txreg2")
            rel2 = SnapshotState(spark, f"{d}/relcache2")
            q2 = apply_pgoutput_stream(
                read_feed_stream(spark, f"{d}/wire2", schema, max_files_per_trigger=2),
                state2, tx2, rel2,
                spark.table("customer"), CDC_COLS["customer"], f"{d}/ckpt2",
            )
            q2.awaitTermination(300)
            after = sorted(
                (r["pos"], r["name"]) for r in rel2.read().collect()
                if r["rel_oid"] == 16385
            )
            assert after == [(0, "c_custkey"), (1, "c_name")]  # no stale tail
            got2 = state2.read()
            if got2 is not None:  # nothing ever applied under quarantine
                snap = spark.table("customer")
                assert got2.exceptAll(snap).count() == 0
                assert snap.exceptAll(got2).count() == 0
        finally:
            shutil.rmtree(d, ignore_errors=True)



def test_streaming_scd2_converges_and_is_idempotent(spark, tmpdir):
    """Incremental SCD2 (per-micro-batch version-table merge) must equal the
    one-shot scd2_history of the whole feed, and replays must be no-ops."""
    from pgcapture_spark.operators.history import scd2_history
    from pgcapture_spark.streaming.pipeline import scd2_stream

    register_views(spark, SF_SMALL, ("customer",))
    snapshot = spark.table("customer")
    feed = _feed(spark, SF_SMALL, "customer")
    expected = scd2_history(snapshot, feed, "c_custkey", CDC_COLS["customer"])

    feed_dir = f"{tmpdir}/feed"
    materialize_feed(feed, feed_dir, n_segments=6)
    schema = spark.read.parquet(feed_dir).schema

    state = SnapshotState(spark, f"{tmpdir}/state")
    q = scd2_stream(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=2),
        state,
        snapshot,
        "c_custkey",
        CDC_COLS["customer"],
        f"{tmpdir}/ckpt",
    )
    q.awaitTermination(120)

    final = state.read()
    assert final.exceptAll(expected).count() == 0
    assert expected.exceptAll(final).count() == 0

    # replay against the same state: batch-id gate makes it a no-op
    last = state.last_batch()
    q2 = scd2_stream(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=2),
        state,
        snapshot,
        "c_custkey",
        CDC_COLS["customer"],
        f"{tmpdir}/ckpt2",
    )
    q2.awaitTermination(120)
    assert state.last_batch() == last
    final2 = state.read()
    assert final2.exceptAll(expected).count() == 0
    assert expected.exceptAll(final2).count() == 0


def test_pgoutput_stream_deadletter_and_fail_after_n(spark):
    """Undecodable batches park their raw frames under
    {ckpt}/deadletter/batch_* BEFORE the checkpoint advances, and after
    max_consecutive_skips consecutive parked batches the stream fails loudly
    instead of silently applying nothing forever (a consumer pinned to a
    table name the wire never carries must not drop the feed on the floor)."""
    import glob

    from pyspark.errors import StreamingQueryException

    from pgcapture_spark.querydefs.extras import customer_wire_frames
    from pgcapture_spark.streaming.pipeline import apply_pgoutput_stream

    register_views(spark, SF_SMALL, ("customer",))
    frames, _, _ = customer_wire_frames(spark, SF_SMALL, "pgoutput")
    d = tempfile.mkdtemp(prefix="pgcs_t_pgout_dead_")
    try:
        materialize_feed(frames, f"{d}/wire", n_segments=8)
        schema = spark.read.parquet(f"{d}/wire").schema
        state = SnapshotState(spark, f"{d}/state")
        tx_state = SnapshotState(spark, f"{d}/txreg")
        rel_state = SnapshotState(spark, f"{d}/relcache")
        q = apply_pgoutput_stream(
            read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=1),
            state, tx_state, rel_state,
            spark.table("customer"), CDC_COLS["customer"], f"{d}/ckpt",
            table="no_such_table", max_consecutive_skips=3,
        )
        with pytest.raises(
            StreamingQueryException,
            match="data batches quarantined since the last successful apply",
        ):
            q.awaitTermination(300)
        parked = glob.glob(f"{d}/ckpt/deadletter/batch_*")
        assert len(parked) == 3  # every skipped batch parked before the raise
        for p in parked:  # parked frames are the raw wire rows, re-playable
            assert spark.read.parquet(p).columns == ["lsn", "seq", "ord", "data"]
        # nothing was ever applied under quarantine
        assert state.read() is None
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_corrupt_frames_quarantine_instead_of_killing_stream(spark):
    """Byte-level corruption — the most literal 'undecodable data' — must
    route through the SAME dead-letter path as schema failures: the poisoned
    batch parks (raw frames preserved for replay), healthy batches keep
    applying (the streak resets on success), and the stream completes. Before
    safe-mode parsing, the parser exception killed the stream with no parked
    copy and no recovery path (restart would hit the same byte forever)."""
    import glob

    from pgcapture_spark.querydefs.extras import customer_wire_frames
    from pgcapture_spark.streaming.pipeline import apply_pgoutput_stream

    register_views(spark, SF_SMALL, ("customer",))
    frames, _, _ = customer_wire_frames(spark, SF_SMALL, "pgoutput")
    d = tempfile.mkdtemp(prefix="pgcs_t_pgout_poison_")
    try:
        # poison a mid-feed slice of DATA frames (keep ord=-1 R frames valid):
        # garbage tag byte -> unknown frame tag -> ERROR row in safe mode
        rows = frames.orderBy("lsn", "seq").collect()
        data_idx = [i for i, r in enumerate(rows) if r["ord"] != -1]
        poison = set(data_idx[len(data_idx) // 2 : len(data_idx) // 2 + 3])
        doctored = [
            (r["lsn"], r["seq"], r["ord"],
             bytearray(b"\xfe\xff\x00garbage") if i in poison else r["data"])
            for i, r in enumerate(rows)
        ]
        frames2 = spark.createDataFrame(
            doctored, "lsn bigint, seq int, ord bigint, data binary"
        )
        materialize_feed(frames2, f"{d}/wire", n_segments=8)
        schema = spark.read.parquet(f"{d}/wire").schema
        state = SnapshotState(spark, f"{d}/state")
        tx_state = SnapshotState(spark, f"{d}/txreg")
        rel_state = SnapshotState(spark, f"{d}/relcache")
        q = apply_pgoutput_stream(
            read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=1),
            state, tx_state, rel_state,
            spark.table("customer"), CDC_COLS["customer"], f"{d}/ckpt",
            table="customer", max_consecutive_skips=3,
        )
        q.awaitTermination(300)  # completes: poisoned batches < 3 consecutive
        parked = sorted(glob.glob(f"{d}/ckpt/deadletter/batch_*"))
        assert parked, "poisoned batch must be parked"
        # every poisoned frame is in the parked copy, replayable
        parked_rows = spark.read.parquet(*parked)
        assert (
            parked_rows.where("hex(data) = 'FEFF0067617262616765'").count()
            == len(poison)
        )
        # healthy batches applied: snapshot exists and reflects the feed
        # minus the parked batches' events
        assert state.read() is not None and state.read().count() > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_pgoutput_deadletter_replay_recovers_full_snapshot(spark):
    """The documented recovery path end-to-end, in the LSN-CORRECT order: a
    consumer pinned to the wrong table quarantines its data batches
    (checkpoint advances PAST them, raw frames parked), fails loudly; the
    operator fixes the pin, (1) replays the parked deadletter frames FIRST
    (they are the oldest unapplied events — the snapshot fold carries no
    per-row lsn lineage, so replay must precede the tail), then (2) resumes
    the ORIGINAL checkpoint over the fixed consumer, which applies only the
    tail on top. The final snapshot must equal a clean end-to-end run.

    This pins three load-bearing mechanics at once: the relation cache
    persisted from a batch that itself quarantined, the tx registry folded
    UNCONDITIONALLY (parked rows' commit timestamps survive the crash), and
    the resume gate seeding from the replayed snapshot (state.read() is None
    after the crash — nothing was ever applied — so the resumed stream
    starts from the initial_snapshot argument)."""
    import glob

    from pyspark.errors import StreamingQueryException

    from pgcapture_spark.querydefs.extras import customer_wire_frames
    from pgcapture_spark.streaming.pipeline import apply_pgoutput_stream

    register_views(spark, SF_SMALL, ("customer",))
    frames, _, _ = customer_wire_frames(spark, SF_SMALL, "pgoutput")
    d = tempfile.mkdtemp(prefix="pgcs_t_pgout_replay_")
    try:
        materialize_feed(frames, f"{d}/wire", n_segments=8)
        schema = spark.read.parquet(f"{d}/wire").schema
        state = SnapshotState(spark, f"{d}/state")
        tx_state = SnapshotState(spark, f"{d}/txreg")
        rel_state = SnapshotState(spark, f"{d}/relcache")
        q = apply_pgoutput_stream(
            read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=1),
            state, tx_state, rel_state,
            spark.table("customer"), CDC_COLS["customer"], f"{d}/ckpt",
            table="no_such_table", max_consecutive_skips=3,
        )
        with pytest.raises(StreamingQueryException):
            q.awaitTermination(300)
        parked = sorted(glob.glob(f"{d}/ckpt/deadletter/batch_*"))
        assert len(parked) == 3
        assert state.read() is None  # nothing applied under quarantine

        # (1) replay the parked frames FIRST, folding into the original
        # snapshot (fresh state dir + checkpoint: replay batch ids restart
        # at 0). Relation cache + tx registry are the PERSISTED ones from
        # the crashed run — the R frame and Begin times arrived in batches
        # that themselves quarantined.
        materialize_feed(
            spark.read.parquet(*parked), f"{d}/wire_replay", n_segments=2
        )
        state_r = SnapshotState(spark, f"{d}/state_replay")
        q2 = apply_pgoutput_stream(
            read_feed_stream(spark, f"{d}/wire_replay", schema, max_files_per_trigger=1),
            state_r, tx_state, rel_state,
            spark.table("customer"), CDC_COLS["customer"], f"{d}/ckpt_replay",
            table="customer", max_consecutive_skips=3,
        )
        q2.awaitTermination(300)
        after_replay = state_r.read()
        assert after_replay is not None

        # (2) resume the ORIGINAL checkpoint with the fixed pin: offsets are
        # already past the parked batches, so only the tail is consumed, and
        # the crashed state is empty so the fold seeds from after_replay.
        q3 = apply_pgoutput_stream(
            read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=1),
            state, tx_state, rel_state,
            after_replay, CDC_COLS["customer"], f"{d}/ckpt",
            table="customer", max_consecutive_skips=3,
        )
        q3.awaitTermination(300)
        recovered = state.read()
        assert recovered is not None

        # clean end-to-end run for comparison
        state_c = SnapshotState(spark, f"{d}/state_clean")
        tx_c = SnapshotState(spark, f"{d}/txreg_clean")
        rel_c = SnapshotState(spark, f"{d}/relcache_clean")
        qc = apply_pgoutput_stream(
            read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=2),
            state_c, tx_c, rel_c,
            spark.table("customer"), CDC_COLS["customer"], f"{d}/ckpt_clean",
            table="customer", max_consecutive_skips=3,
        )
        qc.awaitTermination(300)
        clean = state_c.read()
        assert recovered.exceptAll(clean).count() == 0
        assert clean.exceptAll(recovered).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_pglogical_stream_relation_cache_and_registry_split(spark):
    """The pglogical dialect's split of duties, streamed: batch 0's R frame
    carries names/order only; later batches (one file per trigger) decode
    positional tuples against the PERSISTED name cache zipped with the
    caller's type registry, converging to the batch apply. A registry missing
    a wire column must quarantine, not mis-decode."""
    import glob

    from pyspark.errors import StreamingQueryException

    from pgcapture_spark.operators.generic_feed import CUSTOMER_FIELD_OIDS
    from pgcapture_spark.querydefs.extras import customer_wire_frames
    from pgcapture_spark.streaming.pipeline import apply_pglogical_stream

    register_views(spark, SF_SMALL, ("customer",))
    frames, _, _ = customer_wire_frames(spark, SF_SMALL, "pglogical")
    d = tempfile.mkdtemp(prefix="pgcs_t_pglog_stream_")
    try:
        materialize_feed(frames, f"{d}/wire", n_segments=8)
        schema = spark.read.parquet(f"{d}/wire").schema
        state = SnapshotState(spark, f"{d}/state")
        tx_state = SnapshotState(spark, f"{d}/txreg")
        rel_state = SnapshotState(spark, f"{d}/relcache")
        q = apply_pglogical_stream(
            read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=1),
            state, tx_state, rel_state,
            spark.table("customer"), "c_custkey", CUSTOMER_FIELD_OIDS,
            CDC_COLS["customer"], f"{d}/ckpt", table="customer",
        )
        q.awaitTermination(300)
        cache = sorted((r["pos"], r["name"]) for r in rel_state.read().collect())
        assert [n for _, n in cache] == [n for n, _ in CUSTOMER_FIELD_OIDS]
        batch = cdc_apply(
            spark.table("customer"),
            _feed(spark, SF_SMALL, "customer"),
            "c_custkey",
            CDC_COLS["customer"],
        )
        assert state.read().exceptAll(batch).count() == 0
        assert batch.exceptAll(state.read()).count() == 0

        # registry missing a wire column -> quarantine + loud failure
        state2 = SnapshotState(spark, f"{d}/state2")
        tx2 = SnapshotState(spark, f"{d}/txreg2")
        rel2 = SnapshotState(spark, f"{d}/relcache2")
        q2 = apply_pglogical_stream(
            read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=1),
            state2, tx2, rel2,
            spark.table("customer"), "c_custkey", CUSTOMER_FIELD_OIDS[:-1],
            CDC_COLS["customer"], f"{d}/ckpt2", table="customer",
            max_consecutive_skips=2,
        )
        with pytest.raises(StreamingQueryException, match="not in the schema registry"):
            q2.awaitTermination(300)
        assert len(glob.glob(f"{d}/ckpt2/deadletter/batch_*")) == 2
        assert state2.read() is None
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("dialect", ["pgoutput", "pglogical"])
def test_wire_stream_restart_decodes_from_persisted_relation_cache(spark, dialect):
    """Restart contract for the wire-dialect consumers: phase 1 consumes the
    first half of the log (including the only Relation frame) and stops;
    phase 2 restarts with the SAME checkpoint + states over the grown log.
    Later batches carry NO R frame, so phase 2 can only decode through the
    PERSISTED relation cache — converging to the batch apply proves the
    registry survives restarts (the reference keeps its decoder registry
    in-process and re-learns on reconnect; we persist instead)."""
    import os

    from pgcapture_spark.operators.generic_feed import CUSTOMER_FIELD_OIDS
    from pgcapture_spark.querydefs.extras import customer_wire_frames
    from pgcapture_spark.streaming.pipeline import (
        apply_pglogical_stream,
        apply_pgoutput_stream,
    )

    register_views(spark, SF_SMALL, ("customer",))
    frames, _, _ = customer_wire_frames(spark, SF_SMALL, dialect)
    d = tempfile.mkdtemp(prefix=f"pgcs_t_wire_restart_{dialect}_")
    try:
        materialize_feed(frames, f"{d}/all", n_segments=8)
        parts = sorted(
            f for f in os.listdir(f"{d}/all")
            if f.startswith("part-") and not f.endswith(".crc")
        )
        os.makedirs(f"{d}/wire")
        for name in parts[:4]:
            src = f"{d}/all/{name}"
            shutil.copy2(src, f"{d}/wire/{name}")
        schema = spark.read.parquet(f"{d}/all").schema
        state = SnapshotState(spark, f"{d}/state")
        tx_state = SnapshotState(spark, f"{d}/txreg")
        rel_state = SnapshotState(spark, f"{d}/relcache")

        def start():
            stream = read_feed_stream(
                spark, f"{d}/wire", schema, max_files_per_trigger=2
            )
            if dialect == "pgoutput":
                return apply_pgoutput_stream(
                    stream, state, tx_state, rel_state, spark.table("customer"),
                    CDC_COLS["customer"], f"{d}/ckpt", table="customer",
                )
            return apply_pglogical_stream(
                stream, state, tx_state, rel_state, spark.table("customer"),
                "c_custkey", CUSTOMER_FIELD_OIDS, CDC_COLS["customer"],
                f"{d}/ckpt", table="customer",
            )

        q = start()
        q.awaitTermination(300)
        mid = state.last_batch()
        assert mid >= 0
        # the log grows while the consumer is down (no new R frames arrive)
        for name in parts[4:]:
            shutil.copy2(f"{d}/all/{name}", f"{d}/wire/{name}")
        q2 = start()
        q2.awaitTermination(300)
        assert state.last_batch() > mid
        batch = cdc_apply(
            spark.table("customer"), _feed(spark, SF_SMALL, "customer"),
            "c_custkey", CDC_COLS["customer"],
        )
        final = state.read()
        assert final.exceptAll(batch).count() == 0
        assert batch.exceptAll(final).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_framing_only_batches_advance_without_quarantine(spark):
    """Finding-4 regression: micro-batches containing ONLY transaction
    framing (B/C frames — ord <> -1 but no I/U/D row events) must advance the
    checkpoint cleanly, not count toward max_consecutive_skips. A consumer
    started mid-log whose first triggers see only straddling-transaction
    framing previously died with 'consecutive batches quarantined' after 3
    such batches."""
    import glob
    import os
    import time

    from pyspark.sql import functions as F

    from pgcapture_spark.functions.pgoutput import build_begin, build_commit
    from pgcapture_spark.querydefs.extras import customer_wire_frames
    from pgcapture_spark.streaming.pipeline import apply_pgoutput_stream

    register_views(spark, SF_SMALL, ("customer",))
    frames, _, _ = customer_wire_frames(spark, SF_SMALL, "pgoutput")
    max_lsn = int(frames.agg(F.max("lsn")).collect()[0][0])
    framing = []
    for i in range(4):  # 4 framing-only transactions, no R frame, no rows
        lsn = max_lsn + 1 + i
        framing.append((lsn, 0, lsn * 100, bytearray(build_begin(lsn, 1_000_000, 7))))
        framing.append(
            (lsn, 99, lsn * 100 + 99, bytearray(build_commit(lsn, lsn, 1_000_000)))
        )
    framing_df = spark.createDataFrame(
        framing, "lsn bigint, seq int, ord bigint, data binary"
    )
    d = tempfile.mkdtemp(prefix="pgcs_t_framing_only_")
    try:
        materialize_feed(framing_df, f"{d}/pre", n_segments=3)
        materialize_feed(frames, f"{d}/main", n_segments=4)
        # assemble the log so the 3 framing-only segments are the OLDEST
        # files: with maxFilesPerTrigger=1 they become batches 0-2, all
        # before the Relation frame ever arrives
        os.makedirs(f"{d}/wire")
        ordered = []
        for prefix, src in (("a", f"{d}/pre"), ("b", f"{d}/main")):
            for name in sorted(os.listdir(src)):
                if name.startswith("part-") and not name.endswith(".crc"):
                    dst = f"{d}/wire/part-{prefix}-{name[5:]}"
                    shutil.copy(f"{src}/{name}", dst)
                    ordered.append(dst)
        t0 = time.time() - 10 * len(ordered)
        for i, p in enumerate(ordered):
            os.utime(p, (t0 + 10 * i, t0 + 10 * i))
        schema = spark.read.parquet(f"{d}/wire").schema
        state = SnapshotState(spark, f"{d}/state")
        tx_state = SnapshotState(spark, f"{d}/txreg")
        rel_state = SnapshotState(spark, f"{d}/relcache")
        q = apply_pgoutput_stream(
            read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=1),
            state, tx_state, rel_state,
            spark.table("customer"), CDC_COLS["customer"], f"{d}/ckpt",
            table="customer", max_consecutive_skips=3,
        )
        q.awaitTermination(300)
        assert glob.glob(f"{d}/ckpt/deadletter/batch_*") == []
        # the framing-only begins still fold into the cross-batch tx registry
        reg_lsns = {r["lsn"] for r in tx_state.read().collect()}
        assert {max_lsn + 1 + i for i in range(4)} <= reg_lsns
        batch = cdc_apply(
            spark.table("customer"), _feed(spark, SF_SMALL, "customer"),
            "c_custkey", CDC_COLS["customer"],
        )
        assert state.read().exceptAll(batch).count() == 0
        assert batch.exceptAll(state.read()).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_legacy_nameless_relation_cache_keeps_decoding(spark):
    """Finding-5 regression: a lineage whose persisted relation cache predates
    the rel_name column (its R frames live in already-consumed batches, so
    the name can never be re-learned in-band) must keep decoding via the
    NULL-name coverage fallback when the consumer is pinned to a table name
    — not quarantine every batch until the stream dies."""
    import os

    from pgcapture_spark.querydefs.extras import customer_wire_frames
    from pgcapture_spark.streaming.pipeline import apply_pgoutput_stream

    register_views(spark, SF_SMALL, ("customer",))
    frames, _, _ = customer_wire_frames(spark, SF_SMALL, "pgoutput")
    d = tempfile.mkdtemp(prefix="pgcs_t_nameless_cache_")
    try:
        materialize_feed(frames, f"{d}/all", n_segments=8)
        parts = sorted(
            f for f in os.listdir(f"{d}/all")
            if f.startswith("part-") and not f.endswith(".crc")
        )
        os.makedirs(f"{d}/wire")
        for name in parts[:4]:
            shutil.copy2(f"{d}/all/{name}", f"{d}/wire/{name}")
        schema = spark.read.parquet(f"{d}/all").schema
        state = SnapshotState(spark, f"{d}/state")
        tx_state = SnapshotState(spark, f"{d}/txreg")
        rel_state = SnapshotState(spark, f"{d}/relcache")

        def start():
            return apply_pgoutput_stream(
                read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=2),
                state, tx_state, rel_state, spark.table("customer"),
                CDC_COLS["customer"], f"{d}/ckpt", table="customer",
                max_consecutive_skips=3,
            )

        q = start()
        q.awaitTermination(300)
        # simulate the pre-upgrade lineage: cache rows without rel_name
        rel_state.commit(
            rel_state.read().drop("rel_name"), rel_state.last_batch() + 1
        )
        # the log grows while the consumer is down; no new R frames arrive
        for name in parts[4:]:
            shutil.copy2(f"{d}/all/{name}", f"{d}/wire/{name}")
        q2 = start()
        q2.awaitTermination(300)
        batch = cdc_apply(
            spark.table("customer"), _feed(spark, SF_SMALL, "customer"),
            "c_custkey", CDC_COLS["customer"],
        )
        final = state.read()
        assert final.exceptAll(batch).count() == 0
        assert batch.exceptAll(final).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------- round 6:
# wire consumers on bucketed state (O(touched) commits) + proto dead-letter
# recovery parity with pgoutput


def _write_two_segment_wire(spark, msgs, cutoff_ord: int, wire_dir: str) -> None:
    """Materialize a wire-frame DF as exactly two ord-split segment files with
    strictly increasing mtimes (batch 0 = everything below cutoff, batch 1 =
    the rest) — lets a test control precisely which keys the LAST micro-batch
    touches."""
    import os
    import time

    os.makedirs(wire_dir, exist_ok=True)
    slices = [
        msgs.where(f"ord < {cutoff_ord}").orderBy("ord"),
        msgs.where(f"ord >= {cutoff_ord}").orderBy("ord"),
    ]
    t0 = time.time() - 100
    for i, df in enumerate(slices):
        tmp = f"{wire_dir}.tmp{i}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and not f.endswith(".crc")
        )
        dst = os.path.join(wire_dir, f"seg-{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        os.utime(dst, (t0 + 50 * i, t0 + 50 * i))
        shutil.rmtree(tmp, ignore_errors=True)


def test_wire_stream_bucketed_rewrites_only_touched_buckets(spark):
    """Round-6 headline fix, asserted at the WIRE consumer: apply_wire_stream
    committing through BucketedSnapshotState rewrites, per micro-batch, ONLY
    the key-buckets that batch's change rows hash into. The last micro-batch
    is pinned to the final two transactions (a handful of keys), so its
    version dir must contain just those keys' buckets and every other bucket
    pointer must still name an older version. Also pins vacuum(): after
    convergence the state root holds exactly the versions the manifest
    references."""
    import json
    import os

    from pgcapture_spark.operators.generic_feed import CUSTOMER_FIELD_OIDS
    from pgcapture_spark.querydefs.extras import proto_customer_messages
    from pgcapture_spark.streaming.pipeline import apply_wire_stream
    from pgcapture_spark.streaming.state import BucketedSnapshotState

    register_views(spark, SF_SMALL, ("customer",))
    snapshot = spark.table("customer")
    feed = _feed(spark, SF_SMALL, "customer")
    expected = cdc_apply(snapshot, feed, "c_custkey", CDC_COLS["customer"])
    msgs, _ = proto_customer_messages(spark, SF_SMALL)

    # cutoff: the second-largest lsn's Begin ord -> batch 1 = last two txs
    lsns = sorted(r[0] for r in feed.select("lsn").distinct().collect())
    cutoff = lsns[-2] * 100
    suffix_keys = feed.where(f"lsn >= {lsns[-2]}").select("c_custkey")

    d = tempfile.mkdtemp(prefix="pgcs_t_wire_bucketed_")
    try:
        _write_two_segment_wire(spark, msgs, cutoff, f"{d}/wire")
        schema = spark.read.parquet(f"{d}/wire").schema
        state = BucketedSnapshotState(spark, f"{d}/state", "c_custkey", n_buckets=32)
        tx_state = SnapshotState(spark, f"{d}/txreg")
        q = apply_wire_stream(
            read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=1),
            state, tx_state, snapshot, "c_custkey", CUSTOMER_FIELD_OIDS,
            CDC_COLS["customer"], f"{d}/ckpt",
        )
        q.awaitTermination(300)

        final = state.read().select(*expected.columns)
        assert final.exceptAll(expected).count() == 0
        assert expected.exceptAll(final).count() == 0

        manifest = json.load(open(f"{d}/state/MANIFEST.json"))
        assert manifest["batch_id"] == 1
        last_version = f"v{1:012d}"
        repointed = {int(b) for b, v in manifest["buckets"].items() if v == last_version}
        expected_buckets = set(state.touched_buckets(suffix_keys))
        assert repointed == expected_buckets
        assert len(repointed) < state.n_buckets, "last batch must not rewrite all buckets"
        # the last version dir holds ONLY the touched buckets' files
        on_disk = {
            int(name.split("=")[1])
            for name in os.listdir(f"{d}/state/{last_version}")
            if name.startswith("_b=")
        }
        assert on_disk == expected_buckets
        # and the clustered write keeps it to ONE data file per bucket
        for b in on_disk:
            files = [
                f for f in os.listdir(f"{d}/state/{last_version}/_b={b}")
                if f.startswith("part-") and not f.endswith(".crc")
            ]
            assert len(files) == 1, (b, files)
        # vacuum contract: state root holds exactly the referenced versions
        referenced = set(manifest["buckets"].values())
        versions_on_disk = {
            n for n in os.listdir(f"{d}/state")
            if os.path.isdir(f"{d}/state/{n}") and n.startswith("v")
        }
        assert versions_on_disk == referenced
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _poison_first_segments(spark, wire_dir: str, n: int) -> None:
    """Overwrite the Change frames (ord % 100 in 1..98) of the N oldest
    segment files with undecodable bytes, in place, preserving file names and
    mtimes (Begin/Commit frames stay valid — the tx registry must keep
    folding from quarantined batches)."""
    import os

    from pyspark.sql import functions as F

    parts = sorted(
        f for f in os.listdir(wire_dir)
        if f.startswith("part-") and not f.endswith(".crc")
    )
    for name in parts[:n]:
        p = os.path.join(wire_dir, name)
        st = os.stat(p)
        df = spark.read.parquet(f"file://{p}")
        doctored = df.withColumn(
            "data",
            F.when(
                F.col("ord") % 100 % 99 != 0,
                F.lit(bytearray(b"\xfe\xff\x00garbage")),
            ).otherwise(F.col("data")),
        )
        tmp = p + ".doctor"
        doctored.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and not f.endswith(".crc")
        )
        os.replace(os.path.join(tmp, part), p)
        shutil.rmtree(tmp, ignore_errors=True)
        # the local FS keeps a sidecar checksum per part file; the replaced
        # bytes invalidate it
        crc = os.path.join(wire_dir, f".{name}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        os.utime(p, (st.st_atime, st.st_mtime))


def test_proto_deadletter_replay_recovers_full_snapshot(spark):
    """The documented recovery order, exercised on the PROTO single-table
    consumer (parity with the pgoutput test): the first three data batches
    carry undecodable Change bytes -> each parks under deadletter/ and the
    stream fails loudly at max_consecutive_skips; the operator repairs the
    parked frames from the upstream log (join on the (lsn, seq, ord) offsets
    — re-fetch-by-offset, the Pulsar replay model), replays them FIRST into a
    fresh state, then resumes the ORIGINAL checkpoint (already past the
    parked batches) seeded from the replayed snapshot. Final state must equal
    the batch apply. Begin frames in the poisoned batches stay valid, so this
    also pins the unconditional tx-registry fold: the parked rows' commit
    timestamps survive the crash."""
    import glob

    from pyspark.errors import StreamingQueryException

    from pgcapture_spark.operators.generic_feed import CUSTOMER_FIELD_OIDS
    from pgcapture_spark.querydefs.extras import proto_customer_messages
    from pgcapture_spark.streaming.pipeline import apply_wire_stream
    from pgcapture_spark.streaming.state import BucketedSnapshotState

    register_views(spark, SF_SMALL, ("customer",))
    snapshot = spark.table("customer")
    feed = _feed(spark, SF_SMALL, "customer")
    expected = cdc_apply(snapshot, feed, "c_custkey", CDC_COLS["customer"])
    msgs, _ = proto_customer_messages(spark, SF_SMALL)

    d = tempfile.mkdtemp(prefix="pgcs_t_proto_replay_")
    try:
        materialize_feed(msgs, f"{d}/wire_clean", n_segments=8)
        shutil.copytree(f"{d}/wire_clean", f"{d}/wire", copy_function=shutil.copy2)
        _poison_first_segments(spark, f"{d}/wire", 3)
        schema = spark.read.parquet(f"{d}/wire").schema

        state = BucketedSnapshotState(spark, f"{d}/state", "c_custkey", n_buckets=16)
        tx_state = SnapshotState(spark, f"{d}/txreg")
        q = apply_wire_stream(
            read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=1),
            state, tx_state, snapshot, "c_custkey", CUSTOMER_FIELD_OIDS,
            CDC_COLS["customer"], f"{d}/ckpt", max_consecutive_skips=3,
        )
        with pytest.raises(
            StreamingQueryException,
            match="data batches quarantined since the last successful apply",
        ):
            q.awaitTermination(300)
        parked = sorted(glob.glob(f"{d}/ckpt/deadletter/batch_*"))
        assert len(parked) == 3
        assert state.read() is None  # nothing applied under quarantine

        # (1) repair parked frames by offset against the upstream log, replay
        # FIRST (oldest unapplied events) into a fresh state; tx registry is
        # the PERSISTED one from the crashed run
        clean = spark.read.parquet(f"{d}/wire_clean")
        repaired = (
            spark.read.parquet(*parked)
            .select("lsn", "seq", "ord")
            .join(clean, ["lsn", "seq", "ord"])
            .select("lsn", "seq", "ord", "data")
        )
        materialize_feed(repaired, f"{d}/wire_replay", n_segments=2)
        state_r = BucketedSnapshotState(
            spark, f"{d}/state_replay", "c_custkey", n_buckets=16
        )
        q2 = apply_wire_stream(
            read_feed_stream(spark, f"{d}/wire_replay", schema, max_files_per_trigger=1),
            state_r, tx_state, snapshot, "c_custkey", CUSTOMER_FIELD_OIDS,
            CDC_COLS["customer"], f"{d}/ckpt_replay", max_consecutive_skips=3,
        )
        q2.awaitTermination(300)
        after_replay = state_r.read()
        assert after_replay is not None

        # (2) resume the ORIGINAL checkpoint: offsets already past the parked
        # batches; the crashed state is empty, so the fold seeds from the
        # replayed snapshot
        q3 = apply_wire_stream(
            read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=1),
            state, tx_state, after_replay, "c_custkey", CUSTOMER_FIELD_OIDS,
            CDC_COLS["customer"], f"{d}/ckpt", max_consecutive_skips=3,
        )
        q3.awaitTermination(300)
        recovered = state.read().select(*expected.columns)
        assert recovered.exceptAll(expected).count() == 0
        assert expected.exceptAll(recovered).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_proto_multi_deadletter_replay_recovers_both_tables(spark):
    """Same recovery order on the MULTI-TABLE proto consumer: poisoned data
    batches park before the checkpoint advances, the cross-batch tx registry
    keeps folding, repaired frames replay first, and the resumed stream
    converges BOTH tables (under one atomic bucketed manifest) to their batch
    apply results."""
    import glob

    from pyspark.errors import StreamingQueryException

    from pgcapture_spark.catalog import CDC_COLS as _CC
    from pgcapture_spark.operators.generic_feed import CUSTOMER_FIELD_OIDS
    from pgcapture_spark.querydefs.extras import ORDERS_FIELD_OIDS, proto_multi_messages
    from pgcapture_spark.streaming.multi import BucketedMultiTableState
    from pgcapture_spark.streaming.pipeline import apply_wire_stream_multi

    register_views(spark, SF_SMALL, ("customer", "orders"))
    snapshots = {
        "customer": spark.table("customer"),
        "orders": spark.table("orders"),
    }
    expected = {
        "customer": cdc_apply(
            snapshots["customer"], _feed(spark, SF_SMALL, "customer"),
            "c_custkey", _CC["customer"],
        ),
        "orders": cdc_apply(
            snapshots["orders"], _feed(spark, SF_SMALL, "orders"),
            "o_orderkey", _CC["orders"],
        ),
    }
    msgs, _ = proto_multi_messages(spark, SF_SMALL)
    keys = {"customer": "c_custkey", "orders": "o_orderkey"}
    oids = {"customer": CUSTOMER_FIELD_OIDS, "orders": ORDERS_FIELD_OIDS}
    cols = {"customer": _CC["customer"], "orders": _CC["orders"]}

    def _mk_state(root):
        return BucketedMultiTableState(
            spark, root, ["customer", "orders"], keys, n_buckets=16
        )

    d = tempfile.mkdtemp(prefix="pgcs_t_proto_multi_replay_")
    try:
        materialize_feed(msgs, f"{d}/wire_clean", n_segments=8)
        shutil.copytree(f"{d}/wire_clean", f"{d}/wire", copy_function=shutil.copy2)
        _poison_first_segments(spark, f"{d}/wire", 3)
        schema = spark.read.parquet(f"{d}/wire").schema

        state = _mk_state(f"{d}/state")
        tx_state = SnapshotState(spark, f"{d}/txreg")
        q = apply_wire_stream_multi(
            read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=1),
            state, tx_state, snapshots, keys, oids, cols,
            f"{d}/ckpt", max_consecutive_skips=3,
        )
        with pytest.raises(StreamingQueryException):
            q.awaitTermination(300)
        parked = sorted(glob.glob(f"{d}/ckpt/deadletter/batch_*"))
        assert len(parked) == 3
        assert state.read() is None

        clean = spark.read.parquet(f"{d}/wire_clean")
        repaired = (
            spark.read.parquet(*parked)
            .select("lsn", "seq", "ord")
            .join(clean, ["lsn", "seq", "ord"])
            .select("lsn", "seq", "ord", "data")
        )
        materialize_feed(repaired, f"{d}/wire_replay", n_segments=2)
        state_r = _mk_state(f"{d}/state_replay")
        q2 = apply_wire_stream_multi(
            read_feed_stream(spark, f"{d}/wire_replay", schema, max_files_per_trigger=1),
            state_r, tx_state, snapshots, keys, oids, cols,
            f"{d}/ckpt_replay", max_consecutive_skips=3,
        )
        q2.awaitTermination(300)
        after_replay = state_r.read()
        assert after_replay is not None

        q3 = apply_wire_stream_multi(
            read_feed_stream(spark, f"{d}/wire", schema, max_files_per_trigger=1),
            state, tx_state, after_replay, keys, oids, cols,
            f"{d}/ckpt", max_consecutive_skips=3,
        )
        q3.awaitTermination(300)
        recovered = state.read()
        for t in ("customer", "orders"):
            got = recovered[t].select(*expected[t].columns)
            assert got.exceptAll(expected[t]).count() == 0, t
            assert expected[t].exceptAll(got).count() == 0, t
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_prune_tx_registry_retention(spark, tmpdir):
    """tx-registry retention maintenance: entries whose whole transaction
    (ord slots [lsn*100, lsn*100+99]) lies before the safe watermark are
    dropped; the manifest batch_id is UNCHANGED (the stream's replay gate
    must not advance — the next real micro-batch would be skipped);
    superseded versions vacuum away; re-running is idempotent; and a
    subsequent fold under the next batch id still commits."""
    import json
    import os

    from pgcapture_spark.streaming.pipeline import probe_and_fold_tx, prune_tx_registry

    tx = SnapshotState(spark, f"{tmpdir}/txreg")
    reg = spark.createDataFrame(
        [(10, 111), (20, 222), (30, 333), (40, 444)], "lsn bigint, _commit_us bigint"
    )
    tx.commit(reg, 5)

    # safe_ord = 3000: txs 10 and 20 end at ord 1099/2099 < 3000 -> pruned;
    # tx 30 ends at 3099 >= 3000 -> kept
    before, after = prune_tx_registry(tx, safe_ord=3000)
    assert (before, after) == (4, 2)
    assert sorted(r["lsn"] for r in tx.read().collect()) == [30, 40]
    assert tx.last_batch() == 5  # replay gate untouched
    manifest = json.load(open(f"{tmpdir}/txreg/MANIFEST.json"))
    assert manifest["version"].endswith(".prune1")
    versions = [n for n in os.listdir(f"{tmpdir}/txreg")
                if os.path.isdir(f"{tmpdir}/txreg/{n}")]
    assert versions == [manifest["version"]]  # old versions vacuumed

    # idempotent re-run: monotone, writes the next K, same content
    b2, a2 = prune_tx_registry(tx, safe_ord=3000)
    assert (b2, a2) == (2, 2)
    assert json.load(open(f"{tmpdir}/txreg/MANIFEST.json"))["version"].endswith(
        ".prune2"
    )

    # the stream's next fold still commits (gate intact)
    parsed = spark.createDataFrame(
        [(50, 0, 5000, ("BEGIN", None, 555, 0))],
        "lsn bigint, seq int, ord bigint,"
        " f struct<op:string, parse_error:string, commit_us:bigint, n:int>",
    )
    probe, reg2 = probe_and_fold_tx(parsed, tx, batch_id=6)
    assert tx.last_batch() == 6
    assert sorted(r["lsn"] for r in reg2.collect()) == [30, 40, 50]
