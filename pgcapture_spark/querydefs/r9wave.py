"""Round-9 registry wave: the BOUNDED time-travel retention window (vacuum
keeps storage O(live + N commits), as-of past the window fails loudly), the
dynamic relation-learning path generalized to COMPOSITE replica identities,
the multi-table states gaining the manifest-layer warehouse ops the
single-table state got in r8 (transactionally-consistent AS-OF reads,
pointer-pruned per-table diffs, executed bucket-layout migration), the
multi-table DBLog interleave (dump chunks for customer AND orders riding one
Message stream — the gateway serves many tables,
pkg/dblog/gateway.go:159-173), and the windowed drift monitor as a
continuous consumer.

Determinism contract as everywhere: integer ord/checkpoint encodings,
percentile_disc segment boundaries both engines can name, nano-quantized PSI
terms.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcapture_spark.catalog import CDC_COLS, register_views
from pgcapture_spark.fixtures.cdc_feed import (
    DUCKDB,
    SPARK,
    cdc_customer_sql,
    cdc_orders_sql,
    metrics_composite_feed_sql,
    multi_feed_sql,
)
from pgcapture_spark.operators.apply import apply_oracle_sql, cdc_apply
from pgcapture_spark.operators.ivm import ivm_join_oracle_sql
from pgcapture_spark.queries import _feed, q
from pgcapture_spark.querydefs.r8wave import _asof_feed_sql, _run_retained_apply

_CUST_COLS = CDC_COLS["customer"]
_ORD_COLS = CDC_COLS["orders"]


def _check(cond, *detail) -> None:
    """Inline declared-query contract guard. Explicit raise, not ``assert``:
    these are load-bearing (storage bound, loud-failure-past-window, carried
    replay gate) and must survive ``python -O`` (ADVICE r9)."""
    if not cond:
        raise AssertionError(*detail)


_ORDERS_APPLIED = apply_oracle_sql(
    cdc_orders_sql(DUCKDB), "orders", "o_orderkey", _ORD_COLS
)
_CUSTOMER_APPLIED = apply_oracle_sql(
    cdc_customer_sql(DUCKDB), "customer", "c_custkey", _CUST_COLS
)


# ------------------------------------------------ bounded retention window


@q(
    "cdc_time_travel_retention",
    apply_oracle_sql(_asof_feed_sql(), "customer", "c_custkey", _CUST_COLS),
    "The time-travel retention WINDOW (the Delta/Iceberg"
    " deleted-file-retention analog, closing r8's all-or-nothing flag): the"
    " streamed apply runs with retain_versions=2, so every commit pushes the"
    " superseded manifest onto a bounded history list riding the manifest"
    " itself, vacuum removes version dirs referenced by NEITHER the current"
    " pointers NOR the retained history (storage is O(live + N commits of"
    " rewrites) — asserted: the on-disk version dirs are EXACTLY the"
    " retained manifests' pointer targets), and manifest_asof past the"
    " window fails loudly (asserted for the trimmed batch 0) instead of"
    " silently reading a hole. Returns the AS-OF read at batch 1 — inside"
    " the window — against the same oracle as the unbounded"
    " cdc_time_travel_manifest.",
)
def cdc_time_travel_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    state, _manifests = _run_retained_apply(spark, sf_dir, retain=2)
    # window of 2 over batches 0..3: history holds batches 1 and 2, plus the
    # current manifest at 3 — batch 0 (and the vinit state at -1) trimmed
    _check(state.retained_batches() == [1, 2, 3], state.retained_batches())
    try:
        state.manifest_asof(0)
        raise AssertionError("manifest_asof(0) must fail past the retention window")
    except ValueError:
        pass
    # storage bound: every on-disk version dir is referenced by a retained
    # manifest (vacuum ran after each commit), and vice versa
    referenced: set[str] = set()
    for b in state.retained_batches():
        referenced.update(state.manifest_asof(b)["buckets"].values())
    on_disk = {
        n
        for n in os.listdir(state.root)
        if n.startswith("v") and os.path.isdir(os.path.join(state.root, n))
    }
    _check(on_disk == referenced, sorted(on_disk), sorted(referenced))
    return state.read_asof(state.manifest_asof(1)).select("c_custkey", *_CUST_COLS)


# ------------------------------------ composite keys on the dynamic path


@q(
    "cdc_relation_learn_composite",
    apply_oracle_sql(
        metrics_composite_feed_sql(),
        "(SELECT CAST(NULL AS BIGINT) AS g_id, CAST(NULL AS BIGINT) AS s_id,"
        " CAST(NULL AS DOUBLE) AS m_value, CAST(NULL AS STRING) AS m_note"
        " WHERE 1 = 0)",
        ["g_id", "s_id"],
        ["m_value", "m_note"],
    ),
    "In-band relation learning with a COMPOSITE replica identity (closing"
    " the r8 quarantine): the Relation ('R') message flags TWO key columns"
    " (pkg/decode/pgoutput.go:93-117 per-column key flags; the identity may"
    " be any column set, pkg/decode/schema.go:161-191), the learned table"
    " buckets on the hash of BOTH, DELETE events carry old images for both"
    " identity columns in old_fields, and the dynamic apply merges keyed on"
    " the pair — the same multi-column contract the typed pipeline and"
    " BucketedSnapshotState already enforce, now on the dynamic path."
    " Oracle: the presence-aware last-image fold of the same typed feed"
    " onto an empty snapshot, grouped by (g_id, s_id).",
)
def cdc_relation_learn_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = _relcomp_state(spark, sf_dir)
    _check(state.keys["readings"] == ["g_id", "s_id"])  # adopted, not quarantined
    return state.read()["readings"]


# one converged dynamic-learn run per (process, sf_dir) — the composite
# declare and the dynamic-state rebucket read the same state
_RELCOMP_DIRS: dict[str, str] = {}


def _relcomp_wire_feed(spark: SparkSession) -> DataFrame:
    """The composite-identity wire feed: one Relation message (BOTH identity
    columns key-flagged, bin[0]) followed by the binary-rendered typed feed."""
    from pgcapture_spark.operators.generic_feed import to_binary_feed

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
    rel = spark.createDataFrame(
        [(0, 0, -1, None, "RELATION", "readings", None)],
        "lsn bigint, seq int, ord bigint, commit_ts timestamp, op string,"
        " table_name string, query string",
    ).select(
        *meta,
        F.expr(
            "array(named_struct('name', 'g_id', 'oid', 20, 'bin', X'01'),"
            " named_struct('name', 's_id', 'oid', 20, 'bin', X'01'),"
            " named_struct('name', 'm_value', 'oid', 701, 'bin', X'00'),"
            " named_struct('name', 'm_note', 'oid', 25, 'bin', X'00'))"
        ).alias("fields"),
        F.expr(
            "CAST(NULL AS array<struct<name:string,oid:int,bin:binary>>)"
        ).alias("old_fields"),
    )
    return rel.unionAll(wire)


def _relcomp_state(spark: SparkSession, sf_dir: str):
    import tempfile

    from pgcapture_spark.sources.feed import (
        cached_fixture_segments,
        read_feed_stream,
    )
    from pgcapture_spark.streaming.multi import (
        DynamicMultiTableState,
        apply_stream_dynamic,
    )
    from pgcapture_spark.streaming.registry import RelationRegistry

    feed_dir = cached_fixture_segments(
        spark, sf_dir, "relcomp_wire", lambda: _relcomp_wire_feed(spark),
        n_segments=4,
    )
    key = os.path.abspath(sf_dir)
    d = _RELCOMP_DIRS.get(key)
    if d is None or not os.path.isdir(f"{d}/state"):
        d = tempfile.mkdtemp(prefix="pgcs_q_relcomp_")
        schema = spark.read.parquet(feed_dir).schema
        state = DynamicMultiTableState(spark, f"{d}/state", RelationRegistry())
        query = apply_stream_dynamic(
            read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=2),
            state,
            {},
            f"{d}/ckpt",
        )
        query.awaitTermination(300)
        _RELCOMP_DIRS[key] = d
    return DynamicMultiTableState(spark, f"{d}/state", RelationRegistry())


# -------------------------- multi-table manifest ops (shared converged run)

# one converged retained ivm run per (process, sf_dir) — three manifest-layer
# queries read the same state; parquet-backed, never Spark cache
_IVM_ASOF_DIRS: dict[str, str] = {}

_IVM_TABLES = ["orders", "customer", "orders_ck", "mv"]
_IVM_KEYS = {
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "orders_ck": "o_custkey",
    "mv": "c_nationkey",
}


def _retained_ivm_state(spark: SparkSession, sf_dir: str):
    """The streamed JOIN-view consumer (ivm_join_stream) run over the multi
    feed split at EXACT ord quartiles (one segment per trigger → batches
    0..3, boundaries DuckDB can name) on a retain_versions=2
    BucketedMultiTableState — every commit pushes the superseded cross-table
    manifest onto the bounded history, so batches 1..3 are as-of resolvable
    while batch 0 (and vinit) age out of the window (asserted by
    cdc_time_travel_retention_multi). The quartile feed is a cached INPUT
    (fixture edge, one synthesis per process+sf_dir); the state fold — the
    consumption being measured — rebuilds per cache reset."""
    import tempfile

    from pgcapture_spark.sources.feed import (
        cached_fixture_pieces,
        ord_quartile_bounds,
        read_feed_stream,
    )
    from pgcapture_spark.streaming.multi import BucketedMultiTableState
    from pgcapture_spark.streaming.mv import ivm_join_stream

    register_views(spark, sf_dir, ("customer", "orders"))

    def _build():
        # persist: the 4 piece writes + the quartile job otherwise recompute
        # the synthesized multi feed once each
        feed = spark.sql(multi_feed_sql(SPARK)).persist()
        bounds = ord_quartile_bounds(feed)
        pieces, lo = [], -1
        for hi in bounds:
            pieces.append(feed.where((F.col("ord") > lo) & (F.col("ord") <= hi)))
            lo = hi
        return pieces, feed.unpersist

    feed_dir = cached_fixture_pieces(spark, sf_dir, "ivmasof_quart", _build)
    key = os.path.abspath(sf_dir)
    d = _IVM_ASOF_DIRS.get(key)
    if d is None or not os.path.isdir(f"{d}/state"):
        d = tempfile.mkdtemp(prefix="pgcs_q_ivmasof_")
        schema = spark.read.parquet(feed_dir).schema
        state = BucketedMultiTableState(
            spark, f"{d}/state", _IVM_TABLES, _IVM_KEYS,
            n_buckets=16, retain_versions=2,
        )
        query = ivm_join_stream(
            read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
            state,
            spark.table("orders"),
            spark.table("customer"),
            _ORD_COLS,
            _CUST_COLS,
            f"{d}/ckpt",
        )
        query.awaitTermination(300)
        _IVM_ASOF_DIRS[key] = d
    from pgcapture_spark.streaming.multi import BucketedMultiTableState

    return BucketedMultiTableState(
        spark, f"{d}/state", _IVM_TABLES, _IVM_KEYS, n_buckets=16, retain_versions=2
    )


def _prefix_sql(table_feed_sql: str) -> str:
    """DuckDB rendering of 'everything micro-batches 0 and 1 carried': feed
    rows at or below the ord MEDIAN of the COMBINED multi-table feed — the
    same percentile_disc boundary the Spark segments split at."""
    mf = multi_feed_sql(DUCKDB)
    return (
        f"SELECT * FROM ({table_feed_sql}) WHERE ord <= ("
        f"SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY ord) FROM ({mf}))"
    )


@q(
    "cdc_ivm_view_asof_manifest",
    ivm_join_oracle_sql(
        apply_oracle_sql(
            _prefix_sql(cdc_orders_sql(DUCKDB)), "orders", "o_orderkey", _ORD_COLS
        ),
        apply_oracle_sql(
            _prefix_sql(cdc_customer_sql(DUCKDB)), "customer", "c_custkey", _CUST_COLS
        ),
    ),
    "AS-OF read over the MULTI-table manifest: the IVM join view as of a"
    " PAST commit, resolved from the retained cross-table manifest alone —"
    " no replay, no view recomputation. Because every table's pointers swing"
    " in ONE atomic rename per batch, the retained entry is a"
    " transactionally CONSISTENT snapshot across all four state tables (the"
    " r8 single-table time travel, generalized). Oracle: the view recomputed"
    " from scratch over both snapshots applied to the feed prefix the first"
    " two micro-batches carried.",
)
def cdc_ivm_view_asof_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = _retained_ivm_state(spark, sf_dir)
    return state.read_asof("mv", state.manifest_asof(1)).select(
        "c_nationkey", "n_orders", "sum_cents"
    )


@q(
    "cdc_snapshot_diff_asof_multi",
    None,  # set below (diff_oracle_sql over the prefix/full applied orders)
    "Pointer-pruned snapshot diff of ONE table inside the multi-table state:"
    " the orders table between the retained manifest as of batch 1 and the"
    " current one — only buckets whose version pointers DIFFER are read from"
    " either side (equal pointers reference identical immutable files; the"
    " r8 single-table pruning argument, per table of the cross-table"
    " manifest). At 100 TB the audit of what a few commits did to one table"
    " of a many-table consumer costs those commits' rewritten buckets, with"
    " pruning decided driver-side from two tiny manifests.",
)
def cdc_snapshot_diff_asof_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.timetravel import snapshot_diff_asof_table

    state = _retained_ivm_state(spark, sf_dir)
    return snapshot_diff_asof_table(
        state,
        "orders",
        state.manifest_asof(1),
        state.manifest_asof(state.last_batch()),
        "o_orderkey",
        _ORD_COLS,
    )


def _set_diff_multi_oracle() -> None:
    from pgcapture_spark.operators.timetravel import diff_oracle_sql
    from pgcapture_spark.queries import REGISTRY

    REGISTRY["cdc_snapshot_diff_asof_multi"].oracle = diff_oracle_sql(
        apply_oracle_sql(
            _prefix_sql(cdc_orders_sql(DUCKDB)), "orders", "o_orderkey", _ORD_COLS
        ),
        _ORDERS_APPLIED,
        "o_orderkey",
        _ORD_COLS,
    )


_set_diff_multi_oracle()


@q(
    "state_rebucket_multi_migrate",
    ivm_join_oracle_sql(_ORDERS_APPLIED, _CUSTOMER_APPLIED),
    "EXECUTE the bucket-layout migration for a WHOLE multi-table state"
    " (closing r8's single-table-only rebucket): the live 4-table join-view"
    " consumer state (16 key-buckets) is rewritten under 8 into a fresh"
    " root — per table one full read + one bucket-clustered write, the"
    " source untouched during the copy, the replay gate carried so the"
    " stream and every consumer view resume exactly where the old layout"
    " stopped. Oracle: the maintained join view read from the MIGRATED"
    " state must equal the from-scratch view over the fully-applied"
    " snapshots — migration changes layout, never content.",
)
def state_rebucket_multi_migrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = _retained_ivm_state(spark, sf_dir)
    migrated = state.rebucket(state.root + "_rb8", new_n_buckets=8)
    _check(migrated.last_batch() == state.last_batch())  # replay gate carried
    _check(migrated.n_buckets == 8)
    return migrated.read()["mv"].select("c_nationkey", "n_orders", "sum_cents")


# ------------------------------------------- multi-table DBLog interleave

_BF_MULTI_DIRS: dict[str, str] = {}

_BF_KEYS = {"customer": "c_custkey", "orders": "o_orderkey"}
_BF_COLS = {"customer": _CUST_COLS, "orders": _ORD_COLS}


def _backfill_multi_snapshots(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The multi-table DBLog gateway conversation: dump chunks for customer
    AND orders interleaved into ONE typed multi-table stream (the gateway
    serves every table's dumps through the same Message stream,
    pkg/dblog/gateway.go:159-173), folded from EMPTY snapshots by the
    atomic multi-table apply. 8 segments: each stream quartile followed by
    one segment carrying BOTH tables' chunks, each chunk the consistent
    replica image as-of its injection point (the watermark rule,
    pkg/dblog/dumper.go:172-186)."""
    import tempfile

    from pgcapture_spark.operators.backfill import dump_chunk
    from pgcapture_spark.sources.feed import (
        cached_fixture_pieces,
        ord_quartile_bounds,
        read_feed_stream,
    )
    from pgcapture_spark.streaming.multi import (
        BucketedMultiTableState,
        apply_stream_multi_table,
    )

    register_views(spark, sf_dir, ("customer", "orders"))
    tables = ["customer", "orders"]
    base = {t: spark.table(t) for t in tables}

    def _build():
        # the gateway conversation is an INPUT (fixture edge): 8 segments,
        # each chunk a cdc_apply replica image — persist the source feeds so
        # the 4 quartile-piece writes and 8 chunk jobs don't recompute the
        # synthesized feeds from scratch each
        feed = spark.sql(multi_feed_sql(SPARK)).persist()
        tfeeds = {t: _feed(spark, sf_dir, t).persist() for t in tables}
        bounds = ord_quartile_bounds(feed)

        def _pad(df: DataFrame) -> DataFrame:
            return df.unionByName(feed.limit(0), allowMissingColumns=True).select(
                *feed.columns
            )

        pieces, lo = [], -1
        for i, hi in enumerate(bounds):
            pieces.append(feed.where((F.col("ord") > lo) & (F.col("ord") <= hi)))
            chunks = None
            for t in tables:
                # the "replica" as-of this stream position (per-table feeds
                # share the multi feed's ord domain), chunked on key buckets
                replica = cdc_apply(
                    base[t],
                    tfeeds[t].where(F.col("ord") <= hi),
                    _BF_KEYS[t],
                    _BF_COLS[t],
                )
                ch = _pad(
                    dump_chunk(
                        replica, _BF_KEYS[t], _BF_COLS[t], 16 * i, 16 * i + 15,
                        dump_id=i,
                    ).withColumn("table_name", F.lit(t))
                )
                chunks = ch if chunks is None else chunks.unionByName(ch)
            pieces.append(chunks)
            lo = hi

        def _cleanup():
            feed.unpersist()
            for df in tfeeds.values():
                df.unpersist()

        return pieces, _cleanup

    feed_dir = cached_fixture_pieces(spark, sf_dir, "bfmulti_interleave", _build)
    key = os.path.abspath(sf_dir)
    d = _BF_MULTI_DIRS.get(key)
    if d is None or not os.path.isdir(f"{d}/state"):
        d = tempfile.mkdtemp(prefix="pgcs_q_bfmulti_")
        schema = spark.read.parquet(feed_dir).schema
        state = BucketedMultiTableState(
            spark, f"{d}/state", tables, _BF_KEYS, n_buckets=16
        )
        query = apply_stream_multi_table(
            read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
            state,
            {t: base[t].where("1=0") for t in tables},
            _BF_KEYS,
            _BF_COLS,
            f"{d}/ckpt",
        )
        query.awaitTermination(300)
        _BF_MULTI_DIRS[key] = d
    from pgcapture_spark.streaming.multi import BucketedMultiTableState

    return BucketedMultiTableState(
        spark, f"{d}/state", tables, _BF_KEYS, n_buckets=16
    ).read()


@q(
    "backfill_streamed_multi",
    apply_oracle_sql(cdc_customer_sql(DUCKDB), "customer", "c_custkey", _CUST_COLS),
    "B4 multi-table: the DBLog gateway interleaving dump chunks for customer"
    " AND orders through ONE Message stream (pkg/dblog/gateway.go:159-173 —"
    " the gateway serves every table the controller schedules), folded from"
    " EMPTY snapshots by the atomic multi-table apply on key-bucketed state:"
    " each micro-batch (stream quartile or two-table chunk segment alike)"
    " reads and rewrites only the key-buckets it touches, in BOTH tables,"
    " under one manifest rename. Converges per table to the batch apply of"
    " that table's full feed — this query checks customer,"
    " backfill_streamed_multi_orders the other side of the same converged"
    " manifest.",
)
def backfill_streamed_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _backfill_multi_snapshots(spark, sf_dir)["customer"]


@q(
    "backfill_streamed_multi_orders",
    apply_oracle_sql(cdc_orders_sql(DUCKDB), "orders", "o_orderkey", _ORD_COLS),
    "The ORDERS side of the multi-table DBLog interleave: same converged"
    " manifest as backfill_streamed_multi — both tables of the gateway"
    " conversation are oracle-checked.",
)
def backfill_streamed_multi_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _backfill_multi_snapshots(spark, sf_dir)["orders"]


# ---------------------------------------- windowed drift monitor, streamed


@q(
    "corpus_drift_psi_windowed_streamed",
    None,  # set below — reuses the batch windowed-PSI oracle verbatim
    "The per-source WINDOWED drift monitor as a CONTINUOUS consumer: the"
    " corpus arrives as a stream; each micro-batch's (source, window,"
    " feature, bucket) counts merge ADDITIVELY into a bucketed summary state"
    " (distribution-sized, never corpus-sized), and the rolling"
    " window-vs-predecessor PSI is derived from the summary alone — the"
    " count table IS the bucketed-state shape, so the monitor needs no"
    " second corpus scan ever (r8's corpus_drift_psi_windowed, made"
    " incremental). Converges to the batch oracle exactly (same Laplace"
    " smoothing, same nano-quantized terms).",
)
def corpus_drift_psi_windowed_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pgcapture_spark.querydefs.pipeline import doc_feature_rows, psi_from_counts
    from pgcapture_spark.sources.feed import cached_fixture_segments, read_feed_stream
    from pgcapture_spark.streaming.pipeline import commit_keyed_state
    from pgcapture_spark.streaming.state import BucketedSnapshotState

    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").where(F.col("doc_id").isNotNull())
    d = tempfile.mkdtemp(prefix="pgcs_q_psiwinstream_")
    feed_dir = cached_fixture_segments(
        spark, sf_dir, "psiwin_docs",
        lambda: docs.select("doc_id", "n_chars", "lang", "source"),
        n_segments=5, order_col="doc_id",
    )
    schema = spark.read.parquet(feed_dir).schema
    state = BucketedSnapshotState(
        spark, f"{d}/state", ["src", "win", "feature", "bucket"], n_buckets=8
    )

    def _batch(batch_df, batch_id):
        if batch_id <= state.last_batch():
            return
        bc = (
            doc_feature_rows(
                batch_df.withColumn(
                    "win", F.floor(F.col("doc_id") / 128).cast("long")
                ).withColumn("src", F.coalesce(F.col("source"), F.lit("~"))),
                extra_cols=("win", "src"),
            )
            .groupBy("src", "win", "feature", "bucket")
            .agg(F.count("*").cast("long").alias("c"))
            .persist()
        )
        try:
            def _merge(cur):
                if cur is None:
                    return bc
                m = cur.alias("a").join(
                    bc.alias("b"),
                    on=["src", "win", "feature", "bucket"],
                    how="full_outer",
                )
                return m.select(
                    "src",
                    "win",
                    "feature",
                    "bucket",
                    (
                        F.coalesce("a.c", F.lit(0)) + F.coalesce("b.c", F.lit(0))
                    ).alias("c"),
                )

            commit_keyed_state(
                state, batch_id, bc.select("src", "win", "feature", "bucket"), _merge
            )
        finally:
            bc.unpersist()

    query = (
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=2)
        .writeStream.foreachBatch(_batch)
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(300)

    counts = state.read()
    # window pairing + PSI from the SUMMARY alone (same algebra as the batch
    # corpus_drift_psi_windowed: shift-by-one self-join of the count table,
    # one-row broadcast max_win bound, shared nano-quantized PSI)
    cur = counts.select(
        F.col("src").alias("source"), "win", "feature", "bucket", F.col("c")
    )
    ref = counts.select(
        F.col("src").alias("source"),
        (F.col("win") + 1).alias("win"),
        "feature",
        "bucket",
        F.col("c").alias("ref_c"),
    )
    max_win = counts.select(F.max("win").alias("mx"))
    pair = (
        cur.join(ref, ["source", "win", "feature", "bucket"], "full_outer")
        .select(
            "source",
            "win",
            "feature",
            "bucket",
            F.coalesce(F.col("c"), F.lit(0)).alias("cur_cnt"),
            F.coalesce(F.col("ref_c"), F.lit(0)).alias("ref_cnt"),
        )
        .join(F.broadcast(max_win))
        .where((F.col("win") >= 1) & (F.col("win") <= F.col("mx")))
        .drop("mx")
    )
    return psi_from_counts(pair, ("source", "win", "feature"))


def _set_psi_windowed_streamed_oracle() -> None:
    from pgcapture_spark.queries import REGISTRY
    from pgcapture_spark.querydefs.r8wave import _PSI_WINDOWED_DUCK

    REGISTRY["corpus_drift_psi_windowed_streamed"].oracle = _PSI_WINDOWED_DUCK


_set_psi_windowed_streamed_oracle()


# ------------------------- wave 2: retention bound on the CROSS-TABLE
# manifest, view delta between retained manifests, dynamic-state migration


@q(
    "cdc_time_travel_retention_multi",
    apply_oracle_sql(
        _prefix_sql(cdc_customer_sql(DUCKDB)), "customer", "c_custkey", _CUST_COLS
    ),
    "The retention WINDOW on the CROSS-TABLE manifest (the multi-table form"
    " of cdc_time_travel_retention): the retained join-view consumer runs"
    " with retain_versions=2 over batches 0..3, so the bounded history holds"
    " batches 1..3 while batch 0 and the vinit seed age out — asserted"
    " inline: manifest_asof(0) fails loudly, and the on-disk version dirs"
    " are EXACTLY the union of every retained manifest's pointer targets"
    " across ALL FOUR state tables (vacuum keeps storage O(live + N commits"
    " of rewrites) — a version dir referenced by ANY table of ANY retained"
    " entry survives, everything else is removed). Returns the customer"
    " table as of batch 1 — a transactionally consistent cross-table"
    " snapshot entry, read on a DIFFERENT table than the mv/orders the"
    " sibling as-of queries check.",
)
def cdc_time_travel_retention_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = _retained_ivm_state(spark, sf_dir)
    _check(state.retained_batches() == [1, 2, 3], state.retained_batches())
    try:
        state.manifest_asof(0)
        raise AssertionError("manifest_asof(0) must fail past the retention window")
    except ValueError:
        pass
    referenced: set[str] = set()
    for b in state.retained_batches():
        for per_t in state.manifest_asof(b)["buckets"].values():
            referenced.update(per_t.values())
    on_disk = {
        n
        for n in os.listdir(state.root)
        if n.startswith("v") and os.path.isdir(os.path.join(state.root, n))
    }
    _check(on_disk == referenced, sorted(on_disk), sorted(referenced))
    return state.read_asof("customer", state.manifest_asof(1)).select(
        "c_custkey", *_CUST_COLS
    )


_VIEW_PREFIX_SQL = ivm_join_oracle_sql(
    apply_oracle_sql(
        _prefix_sql(cdc_orders_sql(DUCKDB)), "orders", "o_orderkey", _ORD_COLS
    ),
    apply_oracle_sql(
        _prefix_sql(cdc_customer_sql(DUCKDB)), "customer", "c_custkey", _CUST_COLS
    ),
)
_VIEW_FULL_SQL = ivm_join_oracle_sql(_ORDERS_APPLIED, _CUSTOMER_APPLIED)


@q(
    "cdc_ivm_view_delta_manifest",
    None,  # set below (diff_oracle_sql over the prefix/full recomputed view)
    "Pointer-pruned delta of the DERIVED view itself: what the commits since"
    " batch 1 did to the maintained per-nation aggregate — the mv table of"
    " the cross-table manifest diffed between the retained entry and the"
    " current one, reading ONLY mv buckets whose version pointers differ."
    " The audit a serving layer actually wants ('which nations moved since"
    " the last publish?') costs the few aggregate buckets the commits"
    " rewrote — never a view recomputation, never the base tables. Oracle:"
    " the ADDED/REMOVED/CHANGED contract between the view recomputed from"
    " scratch at the feed prefix and at the full feed.",
)
def cdc_ivm_view_delta_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.timetravel import snapshot_diff_asof_table

    state = _retained_ivm_state(spark, sf_dir)
    return snapshot_diff_asof_table(
        state,
        "mv",
        state.manifest_asof(1),
        state.manifest_asof(state.last_batch()),
        "c_nationkey",
        ["n_orders", "sum_cents"],
    )


def _set_view_delta_oracle() -> None:
    from pgcapture_spark.operators.timetravel import diff_oracle_sql
    from pgcapture_spark.queries import REGISTRY

    REGISTRY["cdc_ivm_view_delta_manifest"].oracle = diff_oracle_sql(
        _VIEW_PREFIX_SQL, _VIEW_FULL_SQL, "c_nationkey", ["n_orders", "sum_cents"]
    )


_set_view_delta_oracle()


# one retained dynamic-learn run per (process, sf_dir)
_RELRET_DIRS: dict[str, str] = {}


def _relret_state(spark: SparkSession, sf_dir: str):
    """The composite relation-learn apply split at EXACT ord quartiles of
    the data rows (the Relation message at ord=-1 rides piece 0) on a
    retain_versions=2 DynamicMultiTableState — batches 0..3, retained
    window [1, 2, 3]."""
    import tempfile

    from pgcapture_spark.sources.feed import (
        cached_fixture_pieces,
        ord_quartile_bounds,
        read_feed_stream,
    )
    from pgcapture_spark.streaming.multi import (
        DynamicMultiTableState,
        apply_stream_dynamic,
    )
    from pgcapture_spark.streaming.registry import RelationRegistry

    def _build():
        wire = _relcomp_wire_feed(spark).persist()
        # quartiles over the DATA rows (ord >= 0) — the DuckDB oracle names
        # the same boundaries over the typed feed, which has no Relation row
        bounds = ord_quartile_bounds(wire.where(F.col("ord") >= 0))
        pieces, lo = [], -2  # ord=-1 Relation message lands in piece 0
        for hi in bounds:
            pieces.append(wire.where((F.col("ord") > lo) & (F.col("ord") <= hi)))
            lo = hi
        return pieces, wire.unpersist

    feed_dir = cached_fixture_pieces(spark, sf_dir, "relret_quart", _build)
    key = os.path.abspath(sf_dir)
    d = _RELRET_DIRS.get(key)
    if d is None or not os.path.isdir(f"{d}/state"):
        d = tempfile.mkdtemp(prefix="pgcs_q_relret_")
        schema = spark.read.parquet(feed_dir).schema
        state = DynamicMultiTableState(
            spark, f"{d}/state", RelationRegistry(), retain_versions=2
        )
        query = apply_stream_dynamic(
            read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
            state,
            {},
            f"{d}/ckpt",
        )
        query.awaitTermination(300)
        _RELRET_DIRS[key] = d
    return DynamicMultiTableState(
        spark, f"{d}/state", RelationRegistry(), retain_versions=2
    )


def _relcomp_prefix_sql() -> str:
    """DuckDB rendering of 'everything micro-batches 0 and 1 carried': typed
    feed rows at or below the ord MEDIAN — the same percentile_disc boundary
    the Spark pieces split at."""
    mf = metrics_composite_feed_sql()
    return (
        f"SELECT * FROM ({mf}) WHERE ord <= ("
        f"SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY ord) FROM ({mf}))"
    )


@q(
    "cdc_time_travel_retention_dynamic",
    apply_oracle_sql(
        _relcomp_prefix_sql(),
        "(SELECT CAST(NULL AS BIGINT) AS g_id, CAST(NULL AS BIGINT) AS s_id,"
        " CAST(NULL AS DOUBLE) AS m_value, CAST(NULL AS STRING) AS m_note"
        " WHERE 1 = 0)",
        ["g_id", "s_id"],
        ["m_value", "m_note"],
    ),
    "The retention window on the DYNAMIC relation-learning state — the last"
    " state class without declared time travel: the composite-identity"
    " learn run (relation adopted from an in-band 'R' message, bucketed on"
    " BOTH key columns) commits with retain_versions=2 over batches 0..3,"
    " so the bounded history holds [1, 2, 3] while batch 0 ages out —"
    " asserted inline: manifest_asof(0) fails loudly, and the on-disk"
    " version dirs are EXACTLY the union of the retained manifests' pointer"
    " targets (vacuum bounds storage on a state whose table set wasn't even"
    " known at construction). Returns the learned table as of batch 1 —"
    " the fold of the feed prefix the first two micro-batches carried."
    " Oracle: the presence-aware last-image fold of the typed feed at or"
    " below its ord median (percentile_disc — both engines name the same"
    " boundary) onto an empty snapshot.",
)
def cdc_time_travel_retention_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = _relret_state(spark, sf_dir)
    _check(state.keys["readings"] == ["g_id", "s_id"])
    _check(state.retained_batches() == [1, 2, 3], state.retained_batches())
    try:
        state.manifest_asof(0)
        raise AssertionError("manifest_asof(0) must fail past the retention window")
    except ValueError:
        pass
    referenced: set[str] = set()
    for b in state.retained_batches():
        for per_t in state.manifest_asof(b)["buckets"].values():
            referenced.update(per_t.values())
    on_disk = {
        n
        for n in os.listdir(state.root)
        if n.startswith("v") and os.path.isdir(os.path.join(state.root, n))
    }
    _check(on_disk == referenced, sorted(on_disk), sorted(referenced))
    return state.read_asof("readings", state.manifest_asof(1)).select(
        "g_id", "s_id", "m_value", "m_note"
    )


_RELCOMP_FULL_FOLD = apply_oracle_sql(
    metrics_composite_feed_sql(),
    "(SELECT CAST(NULL AS BIGINT) AS g_id, CAST(NULL AS BIGINT) AS s_id,"
    " CAST(NULL AS DOUBLE) AS m_value, CAST(NULL AS STRING) AS m_note"
    " WHERE 1 = 0)",
    ["g_id", "s_id"],
    ["m_value", "m_note"],
)


def _diff_dynamic_oracle() -> str:
    prefix = apply_oracle_sql(
        _relcomp_prefix_sql(),
        "(SELECT CAST(NULL AS BIGINT) AS g_id, CAST(NULL AS BIGINT) AS s_id,"
        " CAST(NULL AS DOUBLE) AS m_value, CAST(NULL AS STRING) AS m_note"
        " WHERE 1 = 0)",
        ["g_id", "s_id"],
        ["m_value", "m_note"],
    )
    return f"""
WITH snap_a AS ({prefix}), snap_b AS ({_RELCOMP_FULL_FOLD})
SELECT COALESCE(a.g_id, b.g_id) AS g_id,
       COALESCE(a.s_id, b.s_id) AS s_id,
       CASE WHEN a.g_id IS NULL THEN 'ADDED'
            WHEN b.g_id IS NULL THEN 'REMOVED'
            ELSE 'CHANGED' END AS status,
       CASE WHEN a.g_id IS NULL OR b.g_id IS NULL THEN ''
            ELSE concat_ws(',',
                CASE WHEN a.m_value IS DISTINCT FROM b.m_value THEN 'm_value' END,
                CASE WHEN a.m_note IS DISTINCT FROM b.m_note THEN 'm_note' END)
       END AS changed_cols
FROM snap_a a FULL OUTER JOIN snap_b b ON a.g_id = b.g_id AND a.s_id = b.s_id
WHERE a.g_id IS NULL OR b.g_id IS NULL
   OR a.m_value IS DISTINCT FROM b.m_value OR a.m_note IS DISTINCT FROM b.m_note
"""


@q(
    "cdc_snapshot_diff_asof_dynamic",
    None,  # set below (composite-key diff oracle over the prefix/full folds)
    "Pointer-pruned snapshot diff on the DYNAMIC state under a COMPOSITE"
    " replica identity: the runtime-learned readings table between the"
    " retained manifest as of batch 1 and the current one — only buckets"
    " whose version pointers differ are read from either side (the same"
    " exactness argument as the single/multi forms: equal pointers"
    " reference identical immutable files), and the ADDED/REMOVED/CHANGED"
    " contract keys on BOTH identity columns (null-safe per-column change"
    " lists). Completes the manifest-ops symmetry: every state class —"
    " single, multi-table, dynamic — now declares time travel, retention,"
    " diff, and migration.",
)
def cdc_snapshot_diff_asof_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.timetravel import changed_buckets_table

    state = _relret_state(spark, sf_dir)
    m_a = state.manifest_asof(1)
    m_b = state.manifest_asof(state.last_batch())
    kb = changed_buckets_table(m_a, m_b, "readings", state.n_buckets)
    _check(kb, "the relret fixture commits past batch 1 — buckets must differ")
    keys, cols = ["g_id", "s_id"], ["m_value", "m_note"]
    a = state.read_asof("readings", m_a, kb).select(*keys, *cols).alias("a")
    b = state.read_asof("readings", m_b, kb).select(*keys, *cols).alias("b")
    joined = a.join(
        b,
        [F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}")) for k in keys],
        "full_outer",
    )
    a_absent = F.col("a.g_id").isNull() & F.col("a.s_id").isNull()
    b_absent = F.col("b.g_id").isNull() & F.col("b.s_id").isNull()
    any_diff = None
    for c in cols:
        d = ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
        any_diff = d if any_diff is None else (any_diff | d)
    changed = F.concat_ws(
        ",",
        *[
            F.when(~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")), F.lit(c))
            for c in cols
        ],
    )
    return joined.where(a_absent | b_absent | any_diff).select(
        *[F.coalesce(F.col(f"a.{k}"), F.col(f"b.{k}")).alias(k) for k in keys],
        F.when(a_absent, F.lit("ADDED"))
        .when(b_absent, F.lit("REMOVED"))
        .otherwise(F.lit("CHANGED"))
        .alias("status"),
        F.when(a_absent | b_absent, F.lit("")).otherwise(changed).alias(
            "changed_cols"
        ),
    )


def _set_diff_dynamic_oracle() -> None:
    from pgcapture_spark.queries import REGISTRY

    REGISTRY["cdc_snapshot_diff_asof_dynamic"].oracle = _diff_dynamic_oracle()


_set_diff_dynamic_oracle()


@q(
    "state_rebucket_dynamic_migrate",
    apply_oracle_sql(
        metrics_composite_feed_sql(),
        "(SELECT CAST(NULL AS BIGINT) AS g_id, CAST(NULL AS BIGINT) AS s_id,"
        " CAST(NULL AS DOUBLE) AS m_value, CAST(NULL AS STRING) AS m_note"
        " WHERE 1 = 0)",
        ["g_id", "s_id"],
        ["m_value", "m_note"],
    ),
    "EXECUTE the bucket-layout migration for a DYNAMIC relation-learning"
    " state (the last state class without a declared migration): the"
    " converged composite-identity learn run (32 key-buckets) is rewritten"
    " under 8 into a fresh root with the learned relation REGISTRY riding"
    " the new manifest's same atomic swap — a stream resuming on the"
    " migrated root rehydrates every learned relation (composite keys"
    " included) without re-observing its Relation events. Asserted inline:"
    " replay gate carried, registry fields and the two-column identity"
    " carried. Oracle: unchanged content — migration changes layout, never"
    " data (same fold oracle as cdc_relation_learn_composite).",
)
def state_rebucket_dynamic_migrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.streaming.multi import DynamicMultiTableState
    from pgcapture_spark.streaming.registry import RelationRegistry

    state = _relcomp_state(spark, sf_dir)
    migrated = state.rebucket(state.root + "_rb8", new_n_buckets=8)
    _check(migrated.last_batch() == state.last_batch())  # replay gate carried
    _check(migrated.n_buckets == 8)
    # the real rehydration claim: a FRESH handle on the migrated root (an
    # empty registry passed in) learns everything from the manifest alone
    reopened = DynamicMultiTableState(spark, migrated.root, RelationRegistry(), n_buckets=8)
    _check(reopened.keys["readings"] == ["g_id", "s_id"])  # identity carried
    _check(reopened.registry.fields("readings") == state.registry.fields("readings"))
    return reopened.read()["readings"]
