"""Round-10 optimization contracts: the fused multi-table bucket probe
returns exactly what the per-table probes did (one driver job instead of N),
and the wire-dialect relation cache persists only when a batch actually
carries Relation frames (steady-state triggers stop rewriting an unchanged
cache — and stop leaking one version dir per trigger)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_touched_buckets_multi_matches_per_table(spark):
    from pgcapture_spark.streaming.multi import BucketedMultiTableState

    d = tempfile.mkdtemp(prefix="t_r10_probe_")
    try:
        st = BucketedMultiTableState(
            spark, d, ["a", "b"], {"a": "k", "b": ["k", "g"]}, n_buckets=8
        )
        a_keys = spark.range(40).select(F.col("id").alias("k"))
        b_keys = spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("g")
        )
        fused = st.touched_buckets_multi({"a": a_keys, "b": b_keys})
        assert fused["a"] == st.touched_buckets("a", a_keys)
        assert fused["b"] == st.touched_buckets("b", b_keys)
        # empty key sets still get an (empty) entry — callers branch on it
        empty = a_keys.where("k < 0")
        fused2 = st.touched_buckets_multi({"a": empty, "b": b_keys})
        assert fused2["a"] == []
        assert fused2["b"] == st.touched_buckets("b", b_keys)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_tx_registry_skips_rewrite_on_beginless_batch(spark):
    """probe_and_fold_tx commit-on-change: a batch carrying NO Begin frames
    leaves the persisted tx registry byte-identical, so its per-trigger
    rewrite must be SKIPPED (no new version dir, replay gate untouched,
    returned registry still resolves) — while the first-ever batch (no
    registry on disk yet) and any batch WITH Begins still commit."""
    from pgcapture_spark.streaming.pipeline import probe_and_fold_tx
    from pgcapture_spark.streaming.state import SnapshotState

    schema = (
        "lsn bigint, seq int, ord bigint,"
        " f struct<op:string, parse_error:string, commit_us:bigint, n:int>"
    )

    def _versions(root: str) -> list[str]:
        return sorted(
            n for n in os.listdir(root)
            if n.startswith("v") and os.path.isdir(os.path.join(root, n))
        )

    d = tempfile.mkdtemp(prefix="t_r10_txskip_")
    try:
        tx = SnapshotState(spark, f"{d}/txreg")
        # first-ever batch, begin-less: must still initialize the registry
        rows_only = spark.createDataFrame(
            [(10, 1, 1001, ("INSERT", None, None, 1))], schema
        )
        probe, reg = probe_and_fold_tx(rows_only, tx, batch_id=0)
        assert (probe["n_begins"] or 0) == 0
        assert tx.last_batch() == 0 and reg.count() == 0
        v0 = _versions(f"{d}/txreg")

        # batch WITH a Begin commits a new version
        with_begin = spark.createDataFrame(
            [(20, 0, 2000, ("BEGIN", None, 222, 0)),
             (20, 1, 2001, ("INSERT", None, None, 1))], schema
        )
        probe, reg = probe_and_fold_tx(with_begin, tx, batch_id=1)
        assert probe["n_begins"] == 1
        assert tx.last_batch() == 1
        assert sorted(r["lsn"] for r in reg.collect()) == [20]
        v1 = _versions(f"{d}/txreg")
        assert v1 != v0

        # begin-less batch AFTER the registry exists: rewrite skipped —
        # same version dirs on disk, gate unmoved, registry still resolves
        probe, reg = probe_and_fold_tx(rows_only, tx, batch_id=2)
        assert (probe["n_begins"] or 0) == 0
        assert _versions(f"{d}/txreg") == v1
        assert tx.last_batch() == 1  # gate only guards its own idempotence
        assert sorted(r["lsn"] for r in reg.collect()) == [20]

        # and the next Begin-carrying batch still commits on top
        with_begin2 = spark.createDataFrame(
            [(30, 0, 3000, ("BEGIN", None, 333, 0))], schema
        )
        _, reg = probe_and_fold_tx(with_begin2, tx, batch_id=3)
        assert tx.last_batch() == 3
        assert sorted(r["lsn"] for r in reg.collect()) == [20, 30]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_wire_rel_cache_commits_only_on_relation_frames(spark):
    """8 one-file triggers, the Relation frame only in batch 0: the relation
    cache must be written EXACTLY once (one version dir, manifest pinned at
    batch 0) — steady-state triggers reuse the driver-side memo instead of
    rewriting an unchanged cache — while the converged snapshot still equals
    the one-shot batch apply."""
    from pgcapture_spark.catalog import CDC_COLS, register_views
    from pgcapture_spark.operators.apply import cdc_apply
    from pgcapture_spark.queries import _feed
    from pgcapture_spark.querydefs.extras import customer_wire_frames
    from pgcapture_spark.sources.feed import materialize_feed, read_feed_stream
    from pgcapture_spark.streaming.pipeline import apply_pgoutput_stream
    from pgcapture_spark.streaming.state import SnapshotState

    register_views(spark, SF_SMALL, ("customer",))
    frames, _, _ = customer_wire_frames(spark, SF_SMALL, "pgoutput")
    d = tempfile.mkdtemp(prefix="t_r10_relmemo_")
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
        # exactly one persisted cache version, committed by the R-frame batch
        vers = [
            n for n in os.listdir(f"{d}/relcache")
            if n.startswith("v") and os.path.isdir(os.path.join(f"{d}/relcache", n))
        ]
        assert len(vers) == 1, vers
        assert rel_state.last_batch() == 0
        # later batches decoded via the memo: convergence is unchanged
        batch = cdc_apply(
            spark.table("customer"), _feed(spark, SF_SMALL, "customer"),
            "c_custkey", CDC_COLS["customer"],
        )
        got = state.read()
        assert got.exceptAll(batch).count() == 0
        assert batch.exceptAll(got).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)
