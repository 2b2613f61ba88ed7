"""Streamed materialized-view maintenance: keep a GROUP BY aggregate AND the
snapshot it derives from in sync under the CDC stream, micro-batch by
micro-batch — the streaming form of ``operators/incremental.py``.

Consistency design: the snapshot and the aggregate MUST advance together — if
a crash landed between two separate commits, a replayed batch would compute
its delta against a half-advanced state and double-count. ``PairedState``
therefore writes BOTH tables under one version directory and swings ONE
manifest atomically (same exactly-once recipe as ``SnapshotState``: immutable
version dirs + atomic rename + batch-id replay gate — reference analog: the
sources-table checkpoint upsert rides in the same pipeline Sync as the data,
pkg/sink/postgres.go:599-645).

Scale: the per-batch delta path is O(touched keys) (semi-join prune +
``cdc_apply`` fold + abelian delta merge); the snapshot side would use the
bucketed merge-on-read layout at 100 TB (streaming/state.py) — composing the
two is mechanical, kept simple here.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from pgcapture_spark.operators.apply import cdc_apply
from pgcapture_spark.operators.incremental import delta_merge, group_agg


class PairedState:
    """Two co-versioned tables (snapshot + aggregate) under one manifest."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _manifest(self) -> str:
        return os.path.join(self.root, "MANIFEST.json")

    def last_batch(self) -> int:
        if not os.path.exists(self._manifest):
            return -1
        with open(self._manifest) as f:
            return json.load(f)["batch_id"]

    def read(self) -> tuple[DataFrame, DataFrame] | None:
        if not os.path.exists(self._manifest):
            return None
        with open(self._manifest) as f:
            version = json.load(f)["version"]
        base = os.path.join(self.root, version)
        return (
            self.spark.read.parquet(os.path.join(base, "snapshot")),
            self.spark.read.parquet(os.path.join(base, "agg")),
        )

    def commit(self, snapshot: DataFrame, agg: DataFrame, batch_id: int) -> None:
        version = f"v{batch_id:012d}"
        base = os.path.join(self.root, version)
        snapshot.write.mode("overwrite").parquet(os.path.join(base, "snapshot"))
        agg.write.mode("overwrite").parquet(os.path.join(base, "agg"))
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump({"version": version, "batch_id": batch_id}, f)
        os.replace(tmp, self._manifest)


def incremental_agg_stream(
    feed_stream: DataFrame,
    state: PairedState,
    initial_snapshot: DataFrame,
    key: str,
    group_col: str,
    val_col: str,
    cols: list[str],
    checkpoint_dir: str,
) -> StreamingQuery:
    """foreachBatch MV maintenance: per micro-batch, retract the touched keys'
    old images from the aggregate, add their new images, and advance snapshot
    + aggregate atomically. Converges to ``group_agg(applied snapshot)``."""

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= state.last_batch():
            return  # replayed batch — paired state already advanced
        pair = state.read()
        if pair is None:
            current, base = initial_snapshot, group_agg(initial_snapshot, group_col, val_col)
        else:
            current, base = pair
        touched = batch_df.select(key).distinct()
        old_part = current.join(touched, key, "left_semi")
        new_part = cdc_apply(old_part, batch_df, key, cols)
        new_agg = delta_merge(base, old_part, new_part, group_col, val_col)
        # snapshot advance reuses the SAME fold; only touched keys change, so
        # union of untouched rows + new images = cdc_apply(current, batch)
        new_snapshot = cdc_apply(current, batch_df, key, cols)
        state.commit(new_snapshot, new_agg, batch_id)

    return (
        feed_stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ivm_join_stream(
    feed_stream: DataFrame,
    state,  # BucketedMultiTableState over ["orders", "customer", "mv"]
    initial_orders: DataFrame,
    initial_customer: DataFrame,
    orders_cols: list[str],
    customer_cols: list[str],
    checkpoint_dir: str,
    table_col: str = "table_name",
) -> StreamingQuery:
    """Streamed JOIN-view maintenance: ONE typed stream carrying orders AND
    customer changes; each micro-batch computes the signed join-view delta
    (operators/ivm.py) against the CURRENT snapshots, then BOTH snapshots and
    the view advance under one atomic bucketed manifest — touched key-buckets
    only, the round-6 state discipline. A crash between writes leaves the
    manifest on the previous batch, so a replayed delta can never
    double-count (the PairedState consistency argument, three tables wide).

    Converges to ``join_view_base(applied orders, applied customer)`` — the
    same from-scratch oracle as the batch ``cdc_ivm_join_view``."""
    from pyspark.sql import functions as F

    from pgcapture_spark.operators.apply import last_image, merge_images
    from pgcapture_spark.operators.ivm import (
        ivm_join_delta,
        join_view_base,
        merge_view_delta,
        signed_key_delta,
    )

    keys = {"orders": "o_orderkey", "customer": "c_custkey"}
    cols = {"orders": orders_cols, "customer": customer_cols}
    initial = {"orders": initial_orders, "customer": initial_customer}

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= state.last_batch():
            return
        if not state.initialized():
            state.initialize(
                {
                    "orders": initial_orders.select("o_orderkey", *orders_cols),
                    "customer": initial_customer.select("c_custkey", *customer_cols),
                    "mv": join_view_base(initial_orders, initial_customer),
                }
            )
        cur = state.read()
        subs = {
            t: batch_df.where(F.col(table_col) == F.lit(t)).select(
                "ord", "op", "present", keys[t], *cols[t]
            )
            for t in ("orders", "customer")
        }
        deltas = {
            t: signed_key_delta(cur[t], subs[t], keys[t], cols[t]).persist()
            for t in ("orders", "customer")
        }
        view_delta = ivm_join_delta(
            cur["orders"], cur["customer"], deltas["orders"], deltas["customer"]
        ).persist()
        try:
            merged: dict[str, tuple[DataFrame, list[int]]] = {}
            for t in ("orders", "customer"):
                img = last_image(subs[t], keys[t], cols[t])
                buckets = state.touched_buckets(t, deltas[t].select(keys[t]))
                if not buckets:
                    continue
                base = state.read_buckets(t, buckets)
                base = (
                    base.select(keys[t], *cols[t])
                    if base is not None
                    else initial[t].select(keys[t], *cols[t]).limit(0)
                )
                merged[t] = (merge_images(base, img, keys[t], cols[t]), buckets)
            mv_buckets = state.touched_buckets("mv", view_delta.select("c_nationkey"))
            if mv_buckets:
                mv_cur = state.read_buckets("mv", mv_buckets)
                assert mv_cur is not None, "mv state must be initialized"
                merged["mv"] = (merge_view_delta(mv_cur, view_delta), mv_buckets)
            if merged:
                state.commit(merged, batch_id)
                state.vacuum()
        finally:
            view_delta.unpersist()
            for d in deltas.values():
                d.unpersist()

    return (
        feed_stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
