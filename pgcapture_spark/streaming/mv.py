"""Streamed materialized-view maintenance: keep aggregates AND the snapshots
they derive from in sync under the CDC stream, micro-batch by micro-batch —
the streaming forms of ``operators/incremental.py`` and ``operators/ivm.py``.

Consistency design: the snapshot(s) and the aggregate MUST advance together —
if a crash landed between two separate commits, a replayed batch would compute
its delta against a half-advanced state and double-count. Every consumer here
therefore commits ALL of its tables through ONE ``BucketedMultiTableState``
manifest rename (the same exactly-once recipe as ``SnapshotState``: immutable
version dirs + atomic swap + batch-id replay gate — reference analog: the
sources-table checkpoint upsert rides in the same pipeline Sync as the data,
pkg/sink/postgres.go:599-645).

Scale design (the round-7 discipline): per micro-batch, BOTH the read side and
the commit side are O(touched buckets), never O(snapshot):

- before-images come from ``read_buckets`` of the key-buckets the batch's own
  keys name (the semi-join prune needs nothing else),
- the mixed delta-join terms read only the buckets the DELTA's join keys hash
  into — for the term whose join key is not the base table's bucketing key,
  the consumer maintains a CO-BUCKETED PROJECTION of that table as an extra
  state table advanced by the same fold (the reference analog: a consumer
  maintaining its own index over the replicated rows,
  pkg/pgcapture/consumer.go:86-142),
- the signed delta (ivm.signed_key_delta) doubles as the snapshot merge:
  slice ∖ touched-keys ∪ (+1 images) — one fold per table per trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pgcapture_spark.operators.incremental import (
    group_agg,
    merge_agg_delta,
    signed_agg_delta,
)
from pgcapture_spark.operators.ivm import signed_key_delta


def _merge_slice_with_delta(
    slice_df: DataFrame, delta: DataFrame, key: str, cols: list[str]
) -> DataFrame:
    """Advance a snapshot SLICE with a signed per-key delta: rows of touched
    keys are replaced by their +1 images (a DELETE has no +1 row, so the key
    drops), untouched slice rows pass through. Exactly ``cdc_apply`` confined
    to the slice — the -1/+1 images were already resolved by
    ``signed_key_delta`` (TOAST inheritance included), so no second fold."""
    survivors = slice_df.select(key, *cols).join(
        delta.select(key).distinct(), key, "left_anti"
    )
    return survivors.unionByName(delta.where(F.col("s") == 1).select(key, *cols))


def incremental_agg_stream(
    feed_stream: DataFrame,
    state,  # BucketedMultiTableState over ["snapshot", "agg"]
    initial_snapshot: DataFrame,
    key: str,
    group_col: str,
    val_col: str,
    cols: list[str],
    checkpoint_dir: str,
) -> StreamingQuery:
    """foreachBatch MV maintenance on bucketed state: per micro-batch,

    1. read ONLY the snapshot key-buckets the batch's keys touch,
    2. compute the signed row delta (retract old images / add resolved new
       images — one fold),
    3. advance the snapshot slice with that same delta,
    4. fold the delta to per-group (dn, dc), read ONLY the agg buckets those
       groups hash into, merge (count-0 groups drop),
    5. commit both tables' touched buckets under ONE atomic manifest.

    Converges to ``group_agg(applied snapshot)`` — identical oracle as the
    batch ``incremental_agg``. Replayed batches are no-ops via the manifest
    batch-id gate; a batch that touches nothing advances the gate with a
    manifest rename only."""

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= state.last_batch():
            return
        if not state.initialized():
            state.initialize(
                {
                    "snapshot": initial_snapshot.select(key, *cols),
                    "agg": group_agg(initial_snapshot, group_col, val_col),
                }
            )
        kb = state.touched_buckets("snapshot", batch_df.select(key))
        if not kb:
            state.mark_batch(batch_id)
            return
        snap_slice = state.read_buckets("snapshot", kb)
        if snap_slice is None:
            snap_slice = initial_snapshot.select(key, *cols).limit(0)
        # lazy lineage cut, not persist — the per-TRIGGER planning-time
        # discipline (see topk_stream's note): every downstream reference
        # plans against a leaf instead of re-embedding the feed-fold subtree
        delta = signed_key_delta(snap_slice, batch_df, key, cols).localCheckpoint(
            eager=False
        )
        d_agg = signed_agg_delta(delta, group_col, val_col).persist()
        try:
            merged = {
                "snapshot": (
                    _merge_slice_with_delta(snap_slice, delta, key, cols),
                    kb,
                )
            }
            gb = state.touched_buckets("agg", d_agg.select(group_col))
            if gb:
                agg_slice = state.read_buckets("agg", gb)
                if agg_slice is None:
                    agg_slice = group_agg(initial_snapshot, group_col, val_col).limit(0)
                merged["agg"] = (merge_agg_delta(agg_slice, d_agg, group_col), gb)
            state.commit(merged, batch_id)
            state.vacuum()
        finally:
            d_agg.unpersist()

    return (
        feed_stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def minmax_stream(
    feed_stream: DataFrame,
    state,  # BucketedMultiTableState over ["snapshot", "by_group", "support"]
    initial_snapshot: DataFrame,
    key: str,
    group_col: str,
    val_col: str,
    cols: list[str],
    checkpoint_dir: str,
) -> StreamingQuery:
    """Streamed maintenance of the NON-abelian per-group MIN/MAX view — the
    full form of ``operators/ivm_minmax.py`` with all three tables advancing
    under one atomic bucketed manifest:

    - ``snapshot`` (bucketed by KEY): before-image lookups + the merge, read
      by the batch's key-buckets only,
    - ``by_group`` (the (key, group, v) projection bucketed by GROUP — the
      same co-bucketed-index move as ivm_join_stream's orders_ck): gives the
      dirty rescan a GROUP-pruned read, which the key bucketing could never
      provide,
    - ``support`` (bucketed by GROUP): one row per group; delta-conclusive
      groups update by the shared support algebra
      (ivm_minmax.support_delta_update — batch and streamed forms cannot
      drift), exhausted-extreme groups recompute from the post-batch
      ``by_group`` slice of just their buckets.

    Per-trigger cost: O(touched key-buckets) + O(touched group-buckets) +
    O(dirty groups' population) — never O(snapshot). Converges to the
    from-scratch min/max/count of the applied snapshot."""
    from pgcapture_spark.operators.incremental import cents_col
    from pgcapture_spark.operators.ivm_minmax import (
        minmax_support,
        support_delta_update,
    )

    def _vals(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(key), F.col(group_col), cents_col(F.col(val_col)).alias("v")
        )

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= state.last_batch():
            return
        if not state.initialized():
            vals0 = _vals(initial_snapshot)
            state.initialize(
                {
                    "snapshot": initial_snapshot.select(key, *cols),
                    "by_group": vals0,
                    "support": minmax_support(
                        vals0.select(group_col, "v"), group_col
                    ),
                }
            )
        kb = state.touched_buckets("snapshot", batch_df.select(key))
        if not kb:
            state.mark_batch(batch_id)
            return
        snap_slice = state.read_buckets("snapshot", kb)
        if snap_slice is None:
            snap_slice = initial_snapshot.select(key, *cols).limit(0)
        # lazy lineage cuts, not persist — the per-TRIGGER planning-time
        # discipline (see topk_stream's note)
        delta = signed_key_delta(snap_slice, batch_df, key, cols).localCheckpoint(
            eager=False
        )
        d_vals = delta.select(
            F.col(key),
            F.col(group_col),
            F.col("s"),
            cents_col(F.col(val_col)).alias("v"),
        )
        merged = {
            "snapshot": (
                _merge_slice_with_delta(snap_slice, delta, key, cols),
                kb,
            )
        }
        gb = state.touched_buckets("by_group", d_vals.select(group_col))
        if not gb:
            state.commit(merged, batch_id)
            state.vacuum()
            return
        bg_slice = state.read_buckets("by_group", gb)
        if bg_slice is None:
            bg_slice = _vals(initial_snapshot).limit(0)
        bg_slice = bg_slice.select(key, group_col, "v")
        merged_bg = (
            bg_slice.join(delta.select(key).distinct(), key, "left_anti")
            .unionByName(d_vals.where("s = 1").select(key, group_col, "v"))
            .localCheckpoint(eager=False)
        )
        sup_slice = state.read_buckets("support", gb)
        if sup_slice is None:
            sup_slice = minmax_support(
                _vals(initial_snapshot).select(group_col, "v"), group_col
            ).limit(0)
        sup_slice = sup_slice.select(
            group_col, "n", "min_v", "cnt_min", "max_v", "cnt_max"
        )
        upd = support_delta_update(
            sup_slice, d_vals.select(group_col, "s", "v"), group_col
        ).persist()
        try:
            untouched = sup_slice.join(
                upd.select(group_col), group_col, "left_anti"
            )
            clean = upd.where(~F.col("_dirty") & (F.col("n") > 0)).drop(
                "_dirty"
            )
            dirty_groups = upd.where("_dirty").select(group_col)
            rescan = minmax_support(
                merged_bg.join(
                    F.broadcast(dirty_groups), group_col, "left_semi"
                ).select(group_col, "v"),
                group_col,
            )
            new_sup = untouched.unionByName(clean).unionByName(rescan)
            merged["by_group"] = (merged_bg, gb)
            merged["support"] = (new_sup, gb)
            state.commit(merged, batch_id)
            state.vacuum()
        finally:
            upd.unpersist()

    return (
        feed_stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ivm_join_stream(
    feed_stream: DataFrame,
    state,  # BucketedMultiTableState over ["orders", "customer", "orders_ck", "mv"] (+ "mv_star" with star_dims)
    initial_orders: DataFrame,
    initial_customer: DataFrame,
    orders_cols: list[str],
    customer_cols: list[str],
    checkpoint_dir: str,
    table_col: str = "table_name",
    star_dims: DataFrame | None = None,
) -> StreamingQuery:
    """Streamed JOIN-view maintenance: ONE typed stream carrying orders AND
    customer changes; each micro-batch computes the signed join-view delta
    (operators/ivm.py) and advances both snapshots, the view, AND a
    custkey-co-bucketed orders projection under one atomic bucketed manifest.
    A crash between writes leaves the manifest on the previous batch, so a
    replayed delta can never double-count.

    Per-trigger cost is O(touched buckets) on BOTH sides now:

    - ``signed_key_delta``'s before-image semi-join reads only the buckets of
      the batch's own keys,
    - the ΔO⋈C term joins on ``c_custkey`` — customer's own bucketing key —
      so the customer scan is ``read_buckets`` of ΔO's custkeys,
    - the O⋈ΔC term joins orders on ``o_custkey``, which the ``o_orderkey``
      bucketing cannot prune, so the consumer maintains ``orders_ck``: the
      (o_orderkey, o_custkey, o_totalprice) projection bucketed BY
      ``o_custkey``, advanced by the same signed delta (its buckets are
      named by the delta's ± custkey images). The reference analog is a
      consumer maintaining its own index over replicated rows
      (pkg/pgcapture/consumer.go:86-142); this is that index, IVM-maintained.

    Converges to ``join_view_base(applied orders, applied customer)`` — the
    same from-scratch oracle as the batch ``cdc_ivm_join_view``.

    ``star_dims`` (optional): a static c_nationkey → r_name dimension chain.
    When given, the state carries a FIFTH table ``mv_star`` — the view
    rolled up to region grain — advanced per batch by ``ivm_star_view`` over
    the SAME view delta (static dims add no delta terms of their own, so
    the star view costs one broadcast rollup join per trigger; the reason
    star-schema MVs stay cheap at 100 TB). Its touched buckets are named by
    the delta's coarse keys; untouched region buckets are never read or
    rewritten."""
    from pgcapture_spark.operators.ivm import (
        ivm_join_delta,
        ivm_star_view,
        join_view_base,
        merge_view_delta,
    )

    keys = {"orders": "o_orderkey", "customer": "c_custkey"}
    cols = {"orders": orders_cols, "customer": customer_cols}
    initial = {"orders": initial_orders, "customer": initial_customer}
    _CK_COLS = ["o_custkey", "o_totalprice"]

    # the ckb = cb probe fuse below hard-codes a cross-table contract:
    # customer and orders_ck must BOTH bucket on the custkey value (one
    # shared pmod(hash(custkey), n_buckets) id space), or the fused probe
    # would strand rows — fail at construction, not mid-commit via
    # _assert_buckets_within (ADVICE r7)
    if state.keys.get("customer") != "c_custkey" or state.keys.get("orders_ck") != "o_custkey":
        raise ValueError(
            "ivm_join_stream requires state keyed customer=c_custkey and "
            f"orders_ck=o_custkey (got {state.keys!r}) — the fused custkey "
            "probe assumes both tables share the custkey bucket-id space"
        )

    def _empty(t: str) -> DataFrame:
        return initial[t].select(keys[t], *cols[t]).limit(0)

    def _star_base(o: DataFrame, c: DataFrame) -> DataFrame:
        return (
            join_view_base(o, c)
            .join(F.broadcast(star_dims), "c_nationkey")
            .groupBy("r_name")
            .agg(
                F.sum("n_orders").alias("n_orders"),
                F.sum("sum_cents").alias("sum_cents"),
            )
        )

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= state.last_batch():
            return
        if not state.initialized():
            seed = {
                "orders": initial_orders.select("o_orderkey", *orders_cols),
                "customer": initial_customer.select("c_custkey", *customer_cols),
                "orders_ck": initial_orders.select("o_orderkey", *_CK_COLS),
                "mv": join_view_base(initial_orders, initial_customer),
            }
            if star_dims is not None:
                seed["mv_star"] = _star_base(initial_orders, initial_customer)
            state.initialize(seed)
        subs = {
            t: batch_df.where(F.col(table_col) == F.lit(t)).select(
                "ord", "op", "present", keys[t], *cols[t]
            )
            for t in ("orders", "customer")
        }
        # before-image slices: ONLY the key-buckets this batch's keys touch.
        # Deltas are lazily lineage-cut, not persisted — the per-TRIGGER
        # planning-time discipline (see topk_stream's note). The two tables'
        # probes FUSE into one driver job (touched_buckets_multi — the same
        # union-probe shape fold_commit_multi uses): r10 optimization, the
        # per-trigger probe count dropped from 5-6 collects to 3.
        kb = state.touched_buckets_multi(
            {t: subs[t].select(keys[t]) for t in ("orders", "customer")}
        )
        slices, deltas = {}, {}
        for t in ("orders", "customer"):
            cur = state.read_buckets(t, kb[t]) if kb[t] else None
            slices[t] = (
                cur.select(keys[t], *cols[t]) if cur is not None else _empty(t)
            )
            deltas[t] = signed_key_delta(
                slices[t], subs[t], keys[t], cols[t]
            ).localCheckpoint(eager=False)
        do, dc = deltas["orders"], deltas["customer"]
        # mixed delta-join terms read only the buckets the DELTA's join keys
        # hash into: customer by ΔO's custkeys, orders (via the co-bucketed
        # projection) by ΔC's custkeys — one fused probe job for both.
        # customer and orders_ck share the state's bucket count and the
        # bucket id is pmod(hash(value), n) — the same custkey values land
        # in the same ids regardless of which table (or column name) carries
        # them, so the ΔO⋈C read probe doubles as the orders_ck merge probe
        mixed = state.touched_buckets_multi(
            {
                "customer": do.select(F.col("o_custkey").alias("c_custkey")),
                "orders_ck": dc.select(F.col("c_custkey").alias("o_custkey")),
            }
        )
        cb, ob = mixed["customer"], mixed["orders_ck"]
        cust_t1 = state.read_buckets("customer", cb) if cb else None
        cust_t1 = (
            cust_t1.select("c_custkey", *customer_cols)
            if cust_t1 is not None
            else _empty("customer")
        )
        ord_t2 = state.read_buckets("orders_ck", ob) if ob else None
        ord_t2 = (
            ord_t2.select("o_orderkey", *_CK_COLS)
            if ord_t2 is not None
            else initial_orders.select("o_orderkey", *_CK_COLS).limit(0)
        )
        view_delta = ivm_join_delta(ord_t2, cust_t1, do, dc).localCheckpoint(
            eager=False
        )
        merged: dict[str, tuple[DataFrame, list[int]]] = {}
        for t in ("orders", "customer"):
            if kb[t]:
                merged[t] = (
                    _merge_slice_with_delta(slices[t], deltas[t], keys[t], cols[t]),
                    kb[t],
                )
        # orders_ck advances with ΔO: its touched buckets are named by
        # the delta's ± custkey images (an o_custkey UPDATE moves the row
        # between buckets — the -1 names the old bucket, the +1 the new).
        # Those are exactly the ids the cb probe already collected (same
        # custkey values, same shared bucket-id space — see above)
        ckb = cb
        if ckb:
            base_ck = state.read_buckets("orders_ck", ckb)
            base_ck = (
                base_ck.select("o_orderkey", *_CK_COLS)
                if base_ck is not None
                else initial_orders.select("o_orderkey", *_CK_COLS).limit(0)
            )
            merged["orders_ck"] = (
                _merge_slice_with_delta(base_ck, do, "o_orderkey", _CK_COLS),
                ckb,
            )
        view_probes = {"mv": view_delta.select("c_nationkey")}
        if star_dims is not None:
            view_probes["mv_star"] = view_delta.join(
                F.broadcast(star_dims), "c_nationkey"
            ).select("r_name")
        view_touched = state.touched_buckets_multi(view_probes)
        mv_buckets = view_touched["mv"]
        if mv_buckets:
            mv_cur = state.read_buckets("mv", mv_buckets)
            if mv_cur is None:
                # every touched mv bucket may be EMPTY in every referenced
                # version (partitionBy writes no dir for empty buckets —
                # e.g. a previously-unseen nation group): the slice is
                # simply the empty view
                mv_cur = join_view_base(initial_orders, initial_customer).limit(0)
            merged["mv"] = (merge_view_delta(mv_cur, view_delta), mv_buckets)
        if star_dims is not None:
            sb = view_touched["mv_star"]
            if sb:
                star_cur = state.read_buckets("mv_star", sb)
                if star_cur is None:
                    star_cur = _star_base(
                        initial_orders, initial_customer
                    ).limit(0)
                merged["mv_star"] = (
                    ivm_star_view(view_delta, star_dims, star_cur),
                    sb,
                )
        if merged:
            state.commit(merged, batch_id)
            state.vacuum()
        else:
            state.mark_batch(batch_id)

    return (
        feed_stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def topk_stream(
    feed_stream: DataFrame,
    state,  # BucketedMultiTableState over ["snapshot", "by_group", "support"]
    initial_snapshot: DataFrame,
    key: str,
    group_col: str,
    val_col: str,
    cols: list[str],
    checkpoint_dir: str,
    k: int = 3,
    m: int | None = None,
) -> StreamingQuery:
    """Streamed maintenance of the per-group TOP-K view — the full form of
    ``operators/ivm_topk.py`` on the same tri-table bucketed state as
    ``minmax_stream``:

    - ``snapshot`` (bucketed by KEY): before-image lookups + the merge,
    - ``by_group`` (the (key, group, v) projection bucketed by GROUP): the
      group-pruned source for the dirty rescan AND the exact post-batch
      group sizes (a group's rows all live in one bucket, so the merged
      slice is complete for every touched group),
    - ``support`` (bucketed by GROUP): the top-m candidate window per group;
      delta-conclusive groups re-trim by the shared window algebra
      (ivm_topk.topk_support_update — batch and streamed forms cannot
      drift), slack-exhausted groups rebuild from the merged by_group slice.

    Per-trigger cost: O(touched key-buckets) + O(touched group-buckets) —
    never O(snapshot). Converges to the from-scratch ranked top-k."""
    from pgcapture_spark.operators.incremental import cents_col
    from pgcapture_spark.operators.ivm_topk import topk_support, topk_support_update

    if m is None:
        m = 2 * k + 2

    def _vals(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(key), F.col(group_col), cents_col(F.col(val_col)).alias("v")
        )

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= state.last_batch():
            return
        if not state.initialized():
            vals0 = _vals(initial_snapshot)
            state.initialize(
                {
                    "snapshot": initial_snapshot.select(key, *cols),
                    "by_group": vals0,
                    "support": topk_support(vals0, key, group_col, m),
                }
            )
        kb = state.touched_buckets("snapshot", batch_df.select(key))
        if not kb:
            state.mark_batch(batch_id)
            return
        snap_slice = state.read_buckets("snapshot", kb)
        if snap_slice is None:
            snap_slice = initial_snapshot.select(key, *cols).limit(0)
        # lazy lineage cut, not persist (the same planning-time discipline as
        # the batch forms, operators/ivm*.py): the delta is referenced by
        # every downstream branch, and with plain persist each reference
        # embeds the whole feed-fold subtree in the logical plan — per
        # TRIGGER, so the streamed form pays Catalyst planning 3× per batch.
        # Blocks free via ContextCleaner when the batch closure drops them —
        # which needs a driver GC: the engine session pins
        # spark.cleaner.periodicGC.interval=5min (session.py) so long-running
        # streams pool at most a few triggers' worth of delta blocks. The
        # trade-off vs persist(): executor loss fails the batch (Spark
        # retries it) instead of recomputing lineage that no longer exists.
        delta = signed_key_delta(snap_slice, batch_df, key, cols).localCheckpoint(
            eager=False
        )
        d_vals = delta.select(
            F.col(key),
            F.col(group_col),
            F.col("s"),
            cents_col(F.col(val_col)).alias("v"),
        )
        merged = {
            "snapshot": (
                _merge_slice_with_delta(snap_slice, delta, key, cols),
                kb,
            )
        }
        meta = None
        upd_cached: list = []
        try:
            gb = state.touched_buckets("by_group", d_vals.select(group_col))
            if gb:
                bg_slice = state.read_buckets("by_group", gb)
                if bg_slice is None:
                    bg_slice = _vals(initial_snapshot).limit(0)
                bg_slice = bg_slice.select(key, group_col, "v")
                # referenced by the by_group write, the post-batch group
                # counts, AND the dirty rescan — leaf-plan it too
                merged_bg = (
                    bg_slice.join(delta.select(key).distinct(), key, "left_anti")
                    .unionByName(d_vals.where("s = 1").select(key, group_col, "v"))
                    .localCheckpoint(eager=False)
                )
                sup_slice = state.read_buckets("support", gb)
                if sup_slice is None:
                    # schema-only empty frame (window rows + threshold)
                    sup_slice = (
                        _vals(initial_snapshot)
                        .limit(0)
                        .withColumn("_th", F.col("v"))
                    )
                sup_slice = sup_slice.select(key, group_col, "v", "_th")
                touched = d_vals.select(group_col).distinct()
                # exact post-batch group sizes: the merged by_group slice is
                # COMPLETE for every touched group (group-bucketed layout),
                # so no stored count table is needed
                n_post = (
                    merged_bg.join(F.broadcast(touched), group_col, "left_semi")
                    .groupBy(group_col)
                    .agg(F.count("*").alias("n"))
                )
                trimmed, meta, upd_cached = topk_support_update(
                    sup_slice, n_post, d_vals, key, group_col, k, m
                )
                meta = meta.persist()
                dirty = meta.where("_dirty").select(group_col)
                untouched = sup_slice.join(
                    F.broadcast(touched), group_col, "left_anti"
                )
                clean = trimmed.join(F.broadcast(dirty), group_col, "left_anti")
                rescan = topk_support(
                    merged_bg.join(F.broadcast(dirty), group_col, "left_semi"),
                    key,
                    group_col,
                    m,
                )
                new_sup = untouched.unionByName(clean).unionByName(rescan)
                merged["by_group"] = (merged_bg, gb)
                merged["support"] = (new_sup, gb)
            state.commit(merged, batch_id)
            state.vacuum()
        finally:
            if meta is not None:
                meta.unpersist()
            for f in upd_cached:
                f.unpersist()

    return (
        feed_stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
