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
        assert len(probe["_begin_rows"] or []) == 0
        assert tx.last_batch() == 0 and reg.count() == 0
        v0 = _versions(f"{d}/txreg")

        # batch WITH a Begin commits a new version
        with_begin = spark.createDataFrame(
            [(20, 0, 2000, ("BEGIN", None, 222, 0)),
             (20, 1, 2001, ("INSERT", None, None, 1))], schema
        )
        probe, reg = probe_and_fold_tx(with_begin, tx, batch_id=1)
        assert len(probe["_begin_rows"] or []) == 1
        assert tx.last_batch() == 1
        assert sorted(r["lsn"] for r in reg.collect()) == [20]
        v1 = _versions(f"{d}/txreg")
        assert v1 != v0

        # begin-less batch AFTER the registry exists: rewrite skipped —
        # same version dirs on disk, gate unmoved, registry still resolves
        probe, reg = probe_and_fold_tx(rows_only, tx, batch_id=2)
        assert len(probe["_begin_rows"] or []) == 0
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


def test_cluster_by_key_gives_task_bucket_identity(spark):
    """cluster_by_key's WRITE-side contract: after repartition(n_buckets,
    keys) feeding a write (no join downstream — EnsureRequirements leaves a
    by-num repartition alone there), Spark partition p holds exactly the
    keys whose _bucket_col == p — one task and one file per bucket for the
    default commit paths and compact()."""
    from pgcapture_spark.streaming.state import BucketedSnapshotState

    d = tempfile.mkdtemp(prefix="t_r10_cluster_")
    try:
        st = BucketedSnapshotState(spark, d, "k", n_buckets=8)
        df = spark.range(500).select(F.col("id").alias("k"))
        got = (
            st.cluster_by_key(df)
            .select(F.spark_partition_id().alias("p"), st._bucket_col().alias("b"))
            .where("p <> b")
            .count()
        )
        assert got == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_preclustered_commit_equals_unclustered(spark):
    """commit_buckets(pre_clustered=True) writing the full-outer merge
    join's output AS-IS (the join's own exchanges key-cluster it; a full
    outer equi-join can never broadcast) produces the same state content as
    the default re-clustered write, adds no exchange of its own, and keeps
    the per-bucket file count bounded (exactly one here: the join's
    partition count is the session's 8 = n_buckets, and AQE coalescing only
    merges whole partitions)."""
    from pgcapture_spark.operators.apply import last_image, merge_images
    from pgcapture_spark.streaming.state import BucketedSnapshotState

    snap = spark.range(200).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
    changes = spark.range(60).select(
        F.col("id").alias("ord"),
        F.when(F.col("id") % 9 == 0, "DELETE").otherwise("UPDATE").alias("op"),
        (F.col("id") * 3).alias("k"),
        (F.col("id") + 0.5).alias("v"),
        F.lit("k,v").alias("present"),
    )
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    states = []
    try:
        for pre in (False, True):
            d = tempfile.mkdtemp(prefix="t_r10_preclust_")
            st = BucketedSnapshotState(spark, d, "k", n_buckets=8)
            st.initialize(snap)
            img = last_image(changes, "k", ["v"]).persist()
            try:
                buckets = st.touched_buckets(img.select("k"))
                base = st.read_buckets(buckets).select("k", "v")
                merged = merge_images(base, img, "k", ["v"])
                if pre:
                    # the write must inherit the join's layout: the merge
                    # plan carries only the join's own exchanges, none
                    # user-pinned (AQE stays free to coalesce them)
                    plan = merged._jdf.queryExecution().executedPlan().toString()
                    assert "REPARTITION_BY_NUM" not in plan, plan
                    assert "BroadcastHashJoin" not in plan, plan
                st.commit_buckets(merged, buckets, 0, pre_clustered=pre)
            finally:
                img.unpersist()
            states.append((d, st, sorted(buckets)))
        (d0, st0, b0), (d1, st1, b1) = states
        assert b0 == b1
        a = sorted(map(tuple, st0.read().collect()))
        b = sorted(map(tuple, st1.read().collect()))
        assert a == b and len(a) > 0
        vdir = os.path.join(d1, "v000000000000")
        for name in os.listdir(vdir):
            if name.startswith("_b="):
                files = [f for f in os.listdir(os.path.join(vdir, name)) if f.endswith(".parquet")]
                assert len(files) == 1, (name, files)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
        for d, _, _ in states:
            shutil.rmtree(d, ignore_errors=True)


def test_explicit_schema_read_matches_mergeschema_align(spark):
    """An explicit field-list read of mixed-schema bucket files equals the
    mergeSchema + align_to_fields pair it replaces: files lacking a column
    NULL-fill, files carrying a dropped column ignore it — without the
    distributed footer-merge job."""
    from pgcapture_spark.streaming.state import align_to_fields

    d = tempfile.mkdtemp(prefix="t_r10_schema_")
    try:
        old = spark.createDataFrame([(1, "a", 10.0)], "k bigint, name string, gone double")
        new = spark.createDataFrame([(2, "b", 7)], "k bigint, name string, added int")
        old.write.parquet(f"{d}/f1")
        new.write.parquet(f"{d}/f2")
        fields = [("k", "bigint"), ("name", "string"), ("added", "int")]
        via_merge = align_to_fields(
            spark.read.option("mergeSchema", "true").parquet(f"{d}/f1", f"{d}/f2"),
            fields,
        )
        via_schema = spark.read.schema("`k` bigint, `name` string, `added` int").parquet(
            f"{d}/f1", f"{d}/f2"
        )
        a = sorted(map(tuple, via_merge.collect()))
        b = sorted(map(tuple, via_schema.collect()))
        assert a == b == [(1, "a", None), (2, "b", 7)]
        assert via_merge.columns == via_schema.columns
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_tx_registry_delta_commits_match_full_rewrites(spark):
    """The tx registry's append-only delta commits (commit_delta) resolve to
    exactly the registry the old full-rewrite-per-batch produced: unions of
    base + deltas on read, first-writer-wins across re-delivered Begins,
    vacuum keeps live deltas, and the prune maintenance rewrite SUPERSEDES
    the delta dirs (storage collapses back to one version)."""
    import json

    from pgcapture_spark.streaming.pipeline import (
        probe_and_fold_tx,
        prune_tx_registry,
    )
    from pgcapture_spark.streaming.state import SnapshotState

    schema = (
        "lsn bigint, seq int, ord bigint,"
        " f struct<op:string, parse_error:string, commit_us:bigint, n:int>"
    )
    d = tempfile.mkdtemp(prefix="t_r10_txdelta_")
    try:
        tx = SnapshotState(spark, f"{d}/txreg")
        b0 = spark.createDataFrame(
            [(10, 0, 1000, ("BEGIN", None, 111, 0))], schema
        )
        probe_and_fold_tx(b0, tx, batch_id=0)
        # second batch: one NEW Begin + one re-delivered duplicate of lsn 10
        # carrying a DIFFERENT commit_us — first writer must win
        b1 = spark.createDataFrame(
            [(10, 0, 1000, ("BEGIN", None, 999, 0)),
             (20, 0, 2000, ("BEGIN", None, 222, 0))], schema
        )
        _, reg = probe_and_fold_tx(b1, tx, batch_id=1)
        got = {r["lsn"]: r["_commit_us"] for r in reg.collect()}
        assert got == {10: 111, 20: 222}
        m = json.load(open(f"{d}/txreg/MANIFEST.json"))
        assert m["deltas"] == ["v000000000001.delta"]
        # vacuum (ran inside the fold) kept base + delta on disk
        dirs = sorted(
            n for n in os.listdir(f"{d}/txreg")
            if os.path.isdir(os.path.join(f"{d}/txreg", n))
        )
        assert dirs == ["v000000000000", "v000000000001.delta"]
        # prune compacts: full rewrite supersedes the deltas
        prune_tx_registry(tx, safe_ord=0)
        m2 = json.load(open(f"{d}/txreg/MANIFEST.json"))
        assert m2.get("deltas", []) == []
        dirs2 = [
            n for n in os.listdir(f"{d}/txreg")
            if os.path.isdir(os.path.join(f"{d}/txreg", n))
        ]
        assert dirs2 == [m2["version"]]
        got2 = {r["lsn"]: r["_commit_us"] for r in tx.read().collect()}
        assert got2 == {10: 111, 20: 222}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_tx_registry_delta_autocompaction_bounds_fanin(spark):
    """The delta list is BOUNDED: each delta dir is written as ONE file, and
    once delta_compact_threshold dirs ride the manifest the next delta
    commit folds everything into one fresh full version — the per-trigger
    read fan-in (listing + footers + scan tasks) stays O(threshold) instead
    of growing with stream age (the quadratic the unbounded list would
    re-create in file-count form, with prune cadence the only bound)."""
    import json

    from pgcapture_spark.streaming.state import SnapshotState

    d = tempfile.mkdtemp(prefix="t_r10_txcompact_")
    try:
        st = SnapshotState(spark, f"{d}/txreg")
        st.delta_compact_threshold = 2
        st.commit(
            spark.createDataFrame([(0, 100)], "lsn bigint, _commit_us bigint")
            .coalesce(1),
            0,
        )
        for b in (1, 2, 3, 4, 5):
            st.commit_delta(
                spark.createDataFrame([(b * 10, b * 100)], "lsn bigint, _commit_us bigint"),
                b,
            )
            st.vacuum()
        m = json.load(open(f"{d}/txreg/MANIFEST.json"))
        # batches 1,2 appended; batch 3 hit the threshold and folded into a
        # fresh full version; 4,5 appended onto the new base
        assert m["version"] == "v000000000003"
        assert m["deltas"] == ["v000000000004.delta", "v000000000005.delta"]
        dirs = sorted(
            n for n in os.listdir(f"{d}/txreg")
            if os.path.isdir(os.path.join(f"{d}/txreg", n))
        )
        assert dirs == ["v000000000003", "v000000000004.delta", "v000000000005.delta"]
        # each delta dir is exactly one parquet file
        for dd in m["deltas"]:
            files = [f for f in os.listdir(f"{d}/txreg/{dd}") if f.endswith(".parquet")]
            assert len(files) == 1, (dd, files)
        got = {r["lsn"]: r["_commit_us"] for r in st.read().collect()}
        assert got == {0: 100, 10: 100, 20: 200, 30: 300, 40: 400, 50: 500}
    finally:
        shutil.rmtree(d, ignore_errors=True)
