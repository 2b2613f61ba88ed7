"""Round-10 registry wave: SCHEMA-AS-OF time travel (each retained history
entry carries the registry / field-list snapshot that was authoritative at
its commit, so an as-of read crossing an ALTER shows the THEN-current
columns — closing r9's documented divergence), the retention window under
NO-OP batches (pointer-identical commits absorb into a batch range instead
of burning retention slots — ADVICE r9 made a declared contract), the dump
REQUEUE path on the streamed DBLog interleave (a chunk delivered twice
converges unchanged — pkg/dblog/gateway.go:178-216 requeue semantics), and
the dynamic-state DBLog interleave (a relation learned mid-stream receives
its dump chunks through the same Message stream).

Determinism contract as everywhere: integer ord/checkpoint encodings and
percentile_disc segment boundaries both engines can name.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcapture_spark.catalog import CDC_COLS, register_views
from pgcapture_spark.fixtures.cdc_feed import (
    DUCKDB,
    cdc_customer_sql,
    ddl_feed_sql,
    metrics_composite_feed_sql,
    metrics_evolve_feed_sql,
)
from pgcapture_spark.operators.apply import apply_oracle_sql
from pgcapture_spark.queries import _feed, q
from pgcapture_spark.querydefs.r8wave import _asof_feed_sql
from pgcapture_spark.querydefs.r9wave import _check

_CUST_COLS = CDC_COLS["customer"]
_ORD_COLS = CDC_COLS["orders"]

_EVOLVE_EMPTY_4 = (
    "(SELECT CAST(NULL AS BIGINT) AS g_id, CAST(NULL AS BIGINT) AS s_id,"
    " CAST(NULL AS DOUBLE) AS m_value, CAST(NULL AS STRING) AS m_note"
    " WHERE 1 = 0)"
)
_EVOLVE_EMPTY_5 = (
    "(SELECT CAST(NULL AS BIGINT) AS g_id, CAST(NULL AS BIGINT) AS s_id,"
    " CAST(NULL AS DOUBLE) AS m_value, CAST(NULL AS STRING) AS m_note,"
    " CAST(NULL AS INT) AS m_flag WHERE 1 = 0)"
)


def _evolve_prefix_sql() -> str:
    """DuckDB rendering of 'everything micro-batches 0 and 1 carried': typed
    evolve-feed rows at or below the ord MEDIAN (percentile_disc — the same
    boundary the Spark pieces split at). All such rows are PRE-ALTER (the
    DDL rides at odd ord 95 > the median 94)."""
    mf = metrics_evolve_feed_sql()
    return (
        f"SELECT * FROM ({mf}) WHERE ord <= ("
        f"SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY ord) FROM ({mf}))"
    )


# one converged evolve-learn run per (process, sf_dir) — the schema-as-of
# declare and the evolved current read share the same state
_EVOLVE_DIRS: dict[str, str] = {}


def _evolve_wire_feed(spark: SparkSession) -> DataFrame:
    """The schema-evolving wire feed: a Relation message declaring the
    ORIGINAL four columns (both identity columns key-flagged), the binary
    rendering of the typed evolve feed, and an in-band DDL event (``ALTER
    TABLE readings ADD COLUMN m_flag int``) at ord 95 — strictly between
    the last pre-ALTER data row (ord 94) and the first post-ALTER one
    (ord 96). Pre-ALTER wire rows physically lack the m_flag field (absent
    from ``present`` → omitted from the fields array), exactly a column
    that does not exist yet."""
    from pgcapture_spark.operators.generic_feed import to_binary_feed

    meta = ("lsn", "seq", "ord", "commit_ts", "op", "table_name", "query")
    typed = spark.sql(metrics_evolve_feed_sql())
    wire = (
        to_binary_feed(
            typed,
            [
                ("g_id", 20),
                ("s_id", 20),
                ("m_value", 701),
                ("m_note", 25),
                ("m_flag", 23),
            ],
            old_key=[("old_g_id", "g_id", 20), ("old_s_id", "s_id", 20)],
        )
        .withColumn("table_name", F.lit("readings"))
        .withColumn("query", F.lit(None).cast("string"))
        .select(*meta, "fields", "old_fields")
    )
    _no_fields = F.expr(
        "CAST(NULL AS array<struct<name:string,oid:int,bin:binary>>)"
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
        _no_fields.alias("old_fields"),
    )
    ddl = spark.createDataFrame(
        [
            (
                48,
                0,
                95,
                None,
                "DDL",
                "readings",
                "ALTER TABLE readings ADD COLUMN m_flag int",
            )
        ],
        "lsn bigint, seq int, ord bigint, commit_ts timestamp, op string,"
        " table_name string, query string",
    ).select(*meta, _no_fields.alias("fields"), _no_fields.alias("old_fields"))
    return rel.unionAll(ddl).unionAll(wire)


def _evolve_state(spark: SparkSession, sf_dir: str):
    """The evolve wire feed split at EXACT ord quartiles of the DATA rows
    (Relation at ord −1 rides piece 0; the DDL at ord 95 rides piece 2 —
    the first post-median piece) on a retain_versions=2
    DynamicMultiTableState: batches 0..3, retained window [1, 2, 3], with
    the ALTER learned in batch 2 — so the retained entry for batch 1
    carries the PRE-ALTER registry snapshot."""
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
        wire = _evolve_wire_feed(spark).persist()
        bounds = ord_quartile_bounds(
            wire.where(~F.col("op").isin("DDL", "RELATION"))
        )
        pieces, lo = [], -2  # ord=-1 Relation lands in piece 0
        for hi in bounds:
            pieces.append(wire.where((F.col("ord") > lo) & (F.col("ord") <= hi)))
            lo = hi
        return pieces, wire.unpersist

    feed_dir = cached_fixture_pieces(spark, sf_dir, "evolve_quart", _build)
    key = os.path.abspath(sf_dir)
    d = _EVOLVE_DIRS.get(key)
    if d is None or not os.path.isdir(f"{d}/state"):
        d = tempfile.mkdtemp(prefix="pgcs_q_evolve_")
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
        _EVOLVE_DIRS[key] = d
    return DynamicMultiTableState(
        spark, f"{d}/state", RelationRegistry(), retain_versions=2
    )


@q(
    "cdc_time_travel_schema_asof",
    apply_oracle_sql(
        _evolve_prefix_sql(), _EVOLVE_EMPTY_4, ["g_id", "s_id"], ["m_value", "m_note"]
    ),
    "SCHEMA-AS-OF time travel on the dynamic relation-learning state"
    " (closing the r9 verdict's top item): the feed ALTERs the learned table"
    " between batch 1 and batch 3 (in-band DDL at ord 95, learned in batch"
    " 2), and because every retained history entry now carries the REGISTRY"
    " snapshot that was authoritative at its commit, the as-of-batch-1 read"
    " aligns to the THEN-current field list — the pre-ALTER four columns,"
    " NOT today's five (asserted inline: the current read has m_flag, the"
    " as-of read does not). Oracle: the presence-aware fold of the typed"
    " feed at or below its ord median, at the pre-ALTER schema.",
)
def cdc_time_travel_schema_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = _evolve_state(spark, sf_dir)
    _check(state.retained_batches() == [1, 2, 3], state.retained_batches())
    cur = state.read()["readings"]
    _check(
        cur.columns == ["g_id", "s_id", "m_value", "m_note", "m_flag"], cur.columns
    )
    asof = state.read_asof("readings", state.manifest_asof(1))
    _check(asof.columns == ["g_id", "s_id", "m_value", "m_note"], asof.columns)
    return asof


@q(
    "cdc_relation_learn_evolve",
    apply_oracle_sql(
        metrics_evolve_feed_sql(),
        _EVOLVE_EMPTY_5,
        ["g_id", "s_id"],
        ["m_value", "m_note", "m_flag"],
    ),
    "In-band ALTER on a mid-stream-LEARNED relation (the reference's two"
    " refresh triggers composed: a Relation message materializes the table,"
    " a later DDL event evolves it — pkg/decode/schema.go:114-159): the"
    " dynamic apply decodes post-ALTER rows with the evolved field list,"
    " buckets touched after the ALTER carry the new column, untouched"
    " buckets evolve lazily (merge-schema reads + registry alignment), and"
    " presence semantics make pre-ALTER rows behave as never-set (m_flag"
    " NULL) while post-ALTER partial updates inherit. Oracle: the"
    " presence-aware fold of the full typed feed at the evolved schema.",
)
def cdc_relation_learn_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = _evolve_state(spark, sf_dir)
    _check(state.registry.fields("readings")[-1] == ("m_flag", 23))
    return state.read()["readings"]


# ------------------------------- schema-as-of on the EVOLVING single state


def _ddl_prefix_sql() -> str:
    feed = f"SELECT * FROM ({ddl_feed_sql()}) WHERE op <> 'DDL'"
    return (
        f"SELECT * FROM ({feed}) WHERE ord <= ("
        f"SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY ord) FROM ({feed}))"
    )


_DDL_RETAINED_DIRS: dict[str, str] = {}


def _ddl_retained_state(spark: SparkSession, sf_dir: str):
    """The in-stream-DDL apply (apply_stream_with_ddl, r7) split at exact
    ord quartiles of the DATA rows on a retain_versions=2
    EvolvingBucketedState: wave-1 spans the first two batches (the DDL ord
    sits above the data median — 60% of rows are wave-1), so the retained
    entry for batch 1 carries the PRE-DDL field list in its ``schema``."""
    import tempfile

    from pgcapture_spark.sources.feed import (
        cached_fixture_pieces,
        ord_quartile_bounds,
        read_feed_stream,
    )
    from pgcapture_spark.streaming.pipeline import apply_stream_with_ddl
    from pgcapture_spark.streaming.state import EvolvingBucketedState

    register_views(spark, sf_dir, ("customer",))

    def _build():
        feed = spark.sql(ddl_feed_sql()).persist()
        bounds = ord_quartile_bounds(feed.where(F.col("op") != "DDL"))
        pieces, lo = [], -1
        for hi in bounds:
            pieces.append(feed.where((F.col("ord") > lo) & (F.col("ord") <= hi)))
            lo = hi
        return pieces, feed.unpersist

    feed_dir = cached_fixture_pieces(spark, sf_dir, "ddlret_quart", _build)
    key = os.path.abspath(sf_dir)
    d = _DDL_RETAINED_DIRS.get(key)
    if d is None or not os.path.isdir(f"{d}/state"):
        d = tempfile.mkdtemp(prefix="pgcs_q_ddlret_")
        schema = spark.read.parquet(feed_dir).schema
        state = EvolvingBucketedState(
            spark, f"{d}/state", "c_custkey", n_buckets=16, retain_versions=2
        )
        query = apply_stream_with_ddl(
            read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
            state,
            spark.table("customer").select("c_custkey", "c_acctbal"),
            "c_custkey",
            f"{d}/ckpt",
        )
        query.awaitTermination(300)
        _DDL_RETAINED_DIRS[key] = d
    return EvolvingBucketedState(
        spark, f"{d}/state", "c_custkey", n_buckets=16, retain_versions=2
    )


@q(
    "cdc_schema_asof_evolving",
    apply_oracle_sql(
        _ddl_prefix_sql(),
        "(SELECT c_custkey, c_acctbal FROM customer)",
        "c_custkey",
        ["c_acctbal"],
    ),
    "SCHEMA-AS-OF on the EVOLVING bucketed state (the typed-pipeline twin of"
    " cdc_time_travel_schema_asof): the streamed apply crosses an in-band"
    " ALTER TABLE ADD COLUMN in batch 2; each retained history entry carries"
    " the manifest ``schema`` field list that was authoritative at its"
    " commit, so the as-of-batch-1 read aligns to the PRE-DDL columns"
    " (c_custkey, c_acctbal — no c_note; asserted inline against the current"
    " read, which has it). Oracle: the presence-aware fold of the wave-1"
    " half of the feed onto the base snapshot, at the pre-DDL schema.",
)
def cdc_schema_asof_evolving(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = _ddl_retained_state(spark, sf_dir)
    _check(state.retained_batches() == [1, 2, 3], state.retained_batches())
    cur = state.read()
    _check("c_note" in cur.columns, cur.columns)
    asof = state.read_asof(state.manifest_asof(1))
    _check(asof.columns == ["c_custkey", "c_acctbal"], asof.columns)
    return asof


# ------------------------------------ retention under NO-OP micro-batches


# ------------------------------------------ compaction EXECUTION (A1/ops)


@q(
    "state_compact_execute",
    apply_oracle_sql(cdc_customer_sql(DUCKDB), "customer", "c_custkey", _CUST_COLS),
    "EXECUTE storage compaction on a live bucketed state (the OPTIMIZE /"
    " Pulsar-topic-compaction analog the r7 planner queries only PLANNED,"
    " pkg/sink/pulsar.go:143 broker-side compaction): after the 4-batch"
    " retained apply the state's storage spans one version dir per commit"
    " (asserted); compact() rewrites the snapshot as ONE fresh version dir"
    " (one file per bucket), re-points every bucket WITHOUT advancing the"
    " replay gate (batch_id unchanged, asserted — a maintenance commit may"
    " never move the stream's resume position), and vacuums the superseded"
    " dirs while retained history entries keep their old maps — the as-of"
    " read at batch 1 still resolves after compaction (asserted)."
    " Oracle: the full-feed fold — compaction changes layout, never"
    " content.",
)
def state_compact_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.querydefs.r8wave import _run_retained_apply

    state, _manifests = _run_retained_apply(spark, sf_dir, retain=2)
    gate = state.last_batch()
    # pre-compaction the state's storage spans one version dir per commit
    # (the retained window keeps them); pointer maps may or may not scatter
    # depending on how many buckets each batch touched at this SF
    before_dirs = {
        n
        for n in os.listdir(state.root)
        if n.startswith("v") and os.path.isdir(os.path.join(state.root, n))
    }
    _check(len(before_dirs) > 1, sorted(before_dirs))
    version = state.compact()
    after = set(state.manifest_snapshot()["buckets"].values())
    _check(after == {version}, sorted(after))  # ONE dir post-compaction
    _check(state.last_batch() == gate, state.last_batch())  # gate unchanged
    # time travel inside the window survives compaction
    _check(state.read_asof(state.manifest_asof(1)).count() > 0)
    return state.read().select("c_custkey", *_CUST_COLS)


_SEG_SHIFT = 16_777_216  # mirrors maintenance.py's planner constants
_BIN_TARGET = 262_144


def _compaction_exec_duck() -> str:
    from pgcapture_spark.fixtures.cdc_feed import cdc_lineitem_sql
    from pgcapture_spark.querydefs.maintenance import _compaction_duck

    return f"""
WITH feed AS ({cdc_lineitem_sql(DUCKDB)}), plan AS ({_compaction_duck()})
SELECT p.bin_id, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(f.ord) AS BIGINT) AS min_ord, CAST(max(f.ord) AS BIGINT) AS max_ord
FROM feed f JOIN plan p ON f.lsn // {_SEG_SHIFT} = p.seg_id
GROUP BY p.bin_id
"""


@q(
    "cdc_compaction_execute",
    None,  # set below (needs maintenance.py's planner SQL)
    "EXECUTE the r7 log-compaction PLAN (cdc_compaction_plan bin-packs LSN"
    " segments into 256 KiB groups; this query performs the rewrite): the"
    " lineitem change log is clustered by the plan's bin assignment and"
    " written ONE FILE PER COMPACTION GROUP (asserted by walking the"
    " compacted log — every bin directory holds exactly one parquet file),"
    " the same shape compact_log/Pulsar retention produces broker-side."
    " The join of log rows to the tiny plan is a broadcast; the rewrite is"
    " one clustered write job. Oracle: per-bin row counts and ord ranges of"
    " the compacted log must equal the plan applied to the original feed —"
    " compaction moves bytes, never records.",
)
def cdc_compaction_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pgcapture_spark.operators.packing import packed_batches

    feed = _feed(spark, sf_dir, "lineitem")
    seg = feed.groupBy(F.expr(f"lsn DIV {_SEG_SHIFT}").alias("seg_id")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.lit(120) + F.length("present")).cast("long").alias("est_bytes"),
    )
    plan = packed_batches(
        seg, budget=_BIN_TARGET, order_col="seg_id", tokens_col="est_bytes",
        extra_cols=("n_rows",),
    ).select("seg_id", F.col("batch_id").cast("long").alias("bin_id"))
    tagged = feed.withColumn("seg_id", F.expr(f"lsn DIV {_SEG_SHIFT}")).join(
        F.broadcast(plan), "seg_id"
    )
    out = tempfile.mkdtemp(prefix="pgcs_q_compactexec_") + "/log"
    (
        # one task per bin → one file per bin directory (collisions merely
        # put two bins in one task; partitionBy still splits their files)
        tagged.repartition(F.col("bin_id"))
        .write.mode("overwrite")
        .partitionBy("bin_id")
        .parquet(out)
    )
    for name in os.listdir(out):
        if name.startswith("bin_id="):
            files = [
                f
                for f in os.listdir(os.path.join(out, name))
                if f.endswith(".parquet")
            ]
            _check(len(files) == 1, name, files)
    compacted = spark.read.parquet(out)
    return compacted.groupBy("bin_id").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("ord").cast("long").alias("min_ord"),
        F.max("ord").cast("long").alias("max_ord"),
    )


def _set_compaction_exec_oracle() -> None:
    from pgcapture_spark.queries import REGISTRY

    REGISTRY["cdc_compaction_execute"].oracle = _compaction_exec_duck()


_set_compaction_exec_oracle()


_COMPACT_MULTI_DIRS: dict[str, str] = {}


def _compact_multi_state(spark: SparkSession, sf_dir: str):
    """A converged 2-table consumer state for the multi-table compaction
    declare: the multi feed split at exact ord quartiles (the same cached
    piece fixture the retained-ivm queries read) folded from the base
    snapshots by the atomic multi-table apply with retain_versions=2.
    OWN state dir — compaction mutates layout, so it never runs against a
    fixture other queries share."""
    import tempfile

    from pgcapture_spark.fixtures.cdc_feed import multi_feed_sql
    from pgcapture_spark.fixtures.cdc_feed import SPARK as _SPARK_D
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
    keys = {"customer": "c_custkey", "orders": "o_orderkey"}
    cols = {"customer": _CUST_COLS, "orders": _ORD_COLS}
    base = {t: spark.table(t) for t in tables}

    def _build():
        feed = spark.sql(multi_feed_sql(_SPARK_D)).persist()
        bounds = ord_quartile_bounds(feed)
        pieces, lo = [], -1
        for hi in bounds:
            pieces.append(feed.where((F.col("ord") > lo) & (F.col("ord") <= hi)))
            lo = hi
        return pieces, feed.unpersist

    feed_dir = cached_fixture_pieces(spark, sf_dir, "ivmasof_quart", _build)
    key = os.path.abspath(sf_dir)
    d = _COMPACT_MULTI_DIRS.get(key)
    if d is None or not os.path.isdir(f"{d}/state"):
        d = tempfile.mkdtemp(prefix="pgcs_q_compactmulti_")
        schema = spark.read.parquet(feed_dir).schema
        state = BucketedMultiTableState(
            spark, f"{d}/state", tables, keys, n_buckets=16, retain_versions=2
        )
        query = apply_stream_multi_table(
            read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
            state,
            base,
            keys,
            cols,
            f"{d}/ckpt",
        )
        query.awaitTermination(300)
        _COMPACT_MULTI_DIRS[key] = d
    from pgcapture_spark.streaming.multi import BucketedMultiTableState

    return BucketedMultiTableState(
        spark, f"{d}/state", tables, keys, n_buckets=16, retain_versions=2
    )


@q(
    "state_compact_multi_execute",
    apply_oracle_sql(cdc_customer_sql(DUCKDB), "customer", "c_custkey", _CUST_COLS),
    "Storage compaction EXECUTED on a WHOLE multi-table state (completing"
    " the compaction symmetry started by state_compact_execute): every"
    " table's live snapshot rewrites bucket-clustered under one fresh"
    " generation-named version dir (tables write concurrently), ALL tables'"
    " pointers swing in ONE atomic manifest rename with the replay gate"
    " unchanged (asserted), vacuum drops dirs referenced by neither the new"
    " pointers nor the retained window, and the as-of read at batch 1 still"
    " resolves afterwards (asserted). Oracle: the customer table's content"
    " is exactly the full-feed fold — compaction changes layout, never"
    " content, across every table of the consumer at once.",
)
def state_compact_multi_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = _compact_multi_state(spark, sf_dir)
    gate = state.last_batch()
    version = state.compact()
    m = state._load()
    _check(state.last_batch() == gate, state.last_batch())
    for t in ("customer", "orders"):
        _check(set(m["buckets"][t].values()) == {version}, t, m["buckets"][t])
    _check(state.read_asof("customer", state.manifest_asof(1)).count() > 0)
    return state.read()["customer"].select("c_custkey", *_CUST_COLS)


_COMPACT_DYN_DIRS: dict[str, str] = {}


@q(
    "state_compact_dynamic_execute",
    apply_oracle_sql(
        metrics_composite_feed_sql(),
        _EVOLVE_EMPTY_4,
        ["g_id", "s_id"],
        ["m_value", "m_note"],
    ),
    "Storage compaction EXECUTED on the DYNAMIC relation-learning state (the"
    " last state class without a declared compaction — every class now"
    " declares time travel, retention, diff, migration AND compaction): the"
    " runtime-learned composite-identity table rewrites bucket-clustered"
    " under one generation dir with the learned REGISTRY riding the same"
    " atomic swap, so a FRESH handle on the compacted root rehydrates the"
    " relation — identity pair included — from the manifest alone"
    " (asserted), with the replay gate unchanged (asserted). Compaction is"
    " also where lazy schema evolution catches up physically: frames align"
    " to the current registry field list before the rewrite. Oracle: the"
    " full typed-feed fold — layout changed, content identical.",
)
def state_compact_dynamic_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pgcapture_spark.sources.feed import cached_fixture_segments, read_feed_stream
    from pgcapture_spark.streaming.multi import (
        DynamicMultiTableState,
        apply_stream_dynamic,
    )
    from pgcapture_spark.streaming.registry import RelationRegistry
    from pgcapture_spark.querydefs.r9wave import _relcomp_wire_feed

    feed_dir = cached_fixture_segments(
        spark, sf_dir, "relcomp_wire", lambda: _relcomp_wire_feed(spark),
        n_segments=4,
    )
    key = os.path.abspath(sf_dir)
    d = _COMPACT_DYN_DIRS.get(key)
    if d is None or not os.path.isdir(f"{d}/state"):
        d = tempfile.mkdtemp(prefix="pgcs_q_compactdyn_")
        schema = spark.read.parquet(feed_dir).schema
        state = DynamicMultiTableState(spark, f"{d}/state", RelationRegistry())
        query = apply_stream_dynamic(
            read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=2),
            state,
            {},
            f"{d}/ckpt",
        )
        query.awaitTermination(300)
        _COMPACT_DYN_DIRS[key] = d
    state = DynamicMultiTableState(spark, f"{d}/state", RelationRegistry())
    gate = state.last_batch()
    version = state.compact()
    _check(state.last_batch() == gate, state.last_batch())
    _check(
        set(state._load()["buckets"]["readings"].values()) == {version}
    )
    # fresh handle on the compacted root: registry rehydrated from the swap
    reopened = DynamicMultiTableState(spark, state.root, RelationRegistry())
    _check(reopened.keys["readings"] == ["g_id", "s_id"])
    return reopened.read()["readings"]


# ------------------------------------ multi-source LWW as a streamed fold


@q(
    "cdc_multi_source_lww_streamed",
    None,  # set below (the batch LWW oracle verbatim)
    "The multi-source last-writer-wins merge as a CONTINUOUS consumer"
    " (cdc_multi_source_lww made streaming): the two regions' events are"
    " re-stamped with the LWW total order (commit_ts, region, seq), split"
    " at exact ord quartiles of THAT order, and folded segment by segment"
    " onto key-bucketed state — per trigger only the touched key-buckets"
    " are read and rewritten, so the active-active merge runs at the same"
    " O(touched) cost as the single-origin apply. Inline guard: the"
    " convergence domain (no key sees a partial-presence write after its"
    " DELETE under the LWW order — the condition under which per-batch"
    " folding equals the one-shot fold) is asserted, not assumed."
    " Output: every key BOTH regions wrote, with the winning region.",
)
def cdc_multi_source_lww_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pgcapture_spark.querydefs.history import (
        _LWW_COLS,
        _LWW_ORD_SPARK,
        _LWW_SKEW,
    )
    from pgcapture_spark.sources.feed import (
        cached_fixture_segments,
        read_feed_stream,
    )
    from pgcapture_spark.streaming.pipeline import apply_stream
    from pgcapture_spark.streaming.state import BucketedSnapshotState

    register_views(spark, sf_dir, ("customer",))
    a = _feed(spark, sf_dir, "customer")
    b = a.where("op = 'UPDATE' AND seq = 1").select(
        "lsn",
        F.lit(1).alias("seq"),
        "ord",
        F.expr(_LWW_SKEW).alias("commit_ts"),
        F.lit("UPDATE").alias("op"),
        "c_custkey",
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("int").alias("c_nationkey"),
        (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit(None).cast("bigint").alias("old_c_custkey"),
        F.lit("c_custkey,c_acctbal").alias("present"),
    )
    cols = [c.strip() for c in _LWW_COLS.split(",")]

    def _combined():
        return (
            a.select(*cols)
            .withColumn("region", F.lit(0))
            .unionByName(b.select(*cols).withColumn("region", F.lit(1)))
            .withColumn("ord", F.expr(_LWW_ORD_SPARK))
        )

    feed_dir = cached_fixture_segments(
        spark, sf_dir, "lww_combined", _combined, n_segments=4
    )
    # the guard and the winning-region conf below read the MATERIALIZED log
    # (bit-identical to _combined(); segments are fixture INPUT) instead of
    # re-deriving the two-region synthesis once per reference
    combined = spark.read.parquet(feed_dir)
    # convergence-domain guard (the streamed per-batch fold equals the
    # one-shot fold only while no key's DELETE precedes a partial-presence
    # write in LWW order — a re-insert must carry full presence)
    full_present = "c_custkey," + ",".join(_CUST_COLS)
    viol = (
        combined.groupBy("c_custkey")
        .agg(
            F.max(F.when(F.col("op") == "DELETE", F.col("ord"))).alias("del_ord"),
            F.max(
                F.when(
                    (F.col("op") != "DELETE")
                    & (F.col("present") != full_present),
                    F.col("ord"),
                )
            ).alias("partial_ord"),
        )
        .where(
            F.col("del_ord").isNotNull()
            & F.col("partial_ord").isNotNull()
            & (F.col("partial_ord") > F.col("del_ord"))
        )
        .count()
    )
    if viol:
        raise ValueError(
            f"LWW streamed fold outside its convergence domain: {viol} keys "
            "see a partial-presence write after their DELETE under the LWW "
            "order — the per-batch fold would diverge from the one-shot "
            "oracle there"
        )
    d = tempfile.mkdtemp(prefix="pgcs_q_lwwstream_")
    schema = combined.schema
    state = BucketedSnapshotState(spark, f"{d}/state", "c_custkey", n_buckets=16)
    query = apply_stream(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
        state,
        spark.table("customer"),
        "c_custkey",
        _CUST_COLS,
        f"{d}/ckpt",
    )
    query.awaitTermination(300)
    conf = (
        combined.groupBy("c_custkey")
        .agg(
            F.expr("CAST(max_by(region, ord) AS BIGINT)").alias("winning_region"),
            F.countDistinct("region").alias("_nr"),
        )
        .where(F.col("_nr") == 2)
        .drop("_nr")
    )
    return state.read().join(conf, on="c_custkey")


def _set_lww_streamed_oracle() -> None:
    from pgcapture_spark.queries import REGISTRY
    from pgcapture_spark.querydefs.history import _lww_duck

    REGISTRY["cdc_multi_source_lww_streamed"].oracle = _lww_duck()


_set_lww_streamed_oracle()


# ---------------------- as-of JOIN across tables of one retained manifest


def _asof_join_duck() -> str:
    from pgcapture_spark.querydefs.r9wave import _prefix_sql

    cust = apply_oracle_sql(
        _prefix_sql(cdc_customer_sql(DUCKDB)), "customer", "c_custkey", _CUST_COLS
    )
    from pgcapture_spark.fixtures.cdc_feed import cdc_orders_sql

    orders = apply_oracle_sql(
        _prefix_sql(cdc_orders_sql(DUCKDB)), "orders", "o_orderkey", _ORD_COLS
    )
    return f"""
WITH c AS ({cust}), o AS ({orders})
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(coalesce(o.o_totalprice, 0.0) * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_cents
FROM o JOIN c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


@q(
    "cdc_asof_join_retained",
    None,  # set below
    "AS-OF JOIN across two tables of ONE retained cross-table manifest (the"
    " serving-layer audit join): customer and orders both resolved from the"
    " manifest entry for batch 1 — because all four state tables' pointers"
    " swung in a single atomic rename at that commit, the join is"
    " transactionally CONSISTENT (neither side can show a later or earlier"
    " state than the other), which a per-table as-of on two independent"
    " states cannot guarantee. Revenue per market segment as of the pinned"
    " commit, computed from the state layer alone — no feed replay, no view."
    " Oracle: the same join-aggregate over both snapshots recomputed at the"
    " feed prefix the first two micro-batches carried.",
)
def cdc_asof_join_retained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.querydefs.r9wave import _retained_ivm_state

    state = _retained_ivm_state(spark, sf_dir)
    m1 = state.manifest_asof(1)
    cust = state.read_asof("customer", m1).select("c_custkey", "c_mktsegment")
    orders = state.read_asof("orders", m1).select("o_custkey", "o_totalprice")
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(
                F.expr(
                    "CAST(floor(coalesce(o_totalprice, 0.0) * 100 + 0.5) AS BIGINT)"
                )
            )
            .cast("long")
            .alias("sum_cents"),
        )
    )


def _set_asof_join_oracle() -> None:
    from pgcapture_spark.queries import REGISTRY

    REGISTRY["cdc_asof_join_retained"].oracle = _asof_join_duck()


_set_asof_join_oracle()


# --------------------------- dump REQUEUE on the streamed DBLog interleave

_BF_REQUEUE_DIRS: dict[str, str] = {}


def _bf_requeue_state(spark: SparkSession, sf_dir: str):
    """The gateway conversation WITH a requeued chunk and a zero-row chunk
    (pkg/dblog/gateway.go:178-216, scheduler.go:151-244 Requeue/ack
    semantics): segment 3 delivers the chunk for buckets 32-63 (dump_id=1,
    consistent as-of the second stream quartile), segment 5 RE-delivers the
    same scheduled chunk — re-dumped at retry time, so consistent as-of the
    THIRD quartile, exactly what the dumper's fresh TID-range SELECT returns
    after a cooldown retry — and segment 7 is a ZERO-ROW chunk (a range
    holding no keys), which must auto-ack: an empty micro-batch advancing
    the replay gate via mark_batch, never touching state. Convergence is the
    DBLog invariant: dump rows (ord=1) lose to every later stream event, and
    a re-delivered chunk's content is itself a consistent replica image."""
    import tempfile

    from pgcapture_spark.operators.backfill import dump_chunk
    from pgcapture_spark.sources.feed import (
        cached_fixture_pieces,
        ord_quartile_bounds,
        read_feed_stream,
    )
    from pgcapture_spark.streaming.pipeline import apply_stream
    from pgcapture_spark.streaming.state import BucketedSnapshotState

    from pgcapture_spark.operators.apply import cdc_apply

    register_views(spark, sf_dir, ("customer",))
    base = spark.table("customer")

    def _build():
        feed = _feed(spark, sf_dir, "customer").persist()
        bounds = ord_quartile_bounds(feed)

        def _pad(df):
            return df.unionByName(feed.limit(0), allowMissingColumns=True).select(
                *feed.columns
            )

        def _replica(hi):
            return cdc_apply(
                base, feed.where(F.col("ord") <= hi), "c_custkey", _CUST_COLS
            )

        q1, q2, q3, q4 = bounds
        pieces = [
            feed.where(F.col("ord") <= q1),
            _pad(dump_chunk(_replica(q1), "c_custkey", _CUST_COLS, 0, 31, dump_id=0)),
            feed.where((F.col("ord") > q1) & (F.col("ord") <= q2)),
            # first delivery of chunk 1 (buckets 32-63, as-of quartile 2)
            _pad(dump_chunk(_replica(q2), "c_custkey", _CUST_COLS, 32, 63, dump_id=1)),
            feed.where((F.col("ord") > q2) & (F.col("ord") <= q3)),
            # REQUEUED re-delivery of chunk 1: same dump job, re-dumped at
            # retry time (consistent as-of quartile 3)
            _pad(dump_chunk(_replica(q3), "c_custkey", _CUST_COLS, 32, 63, dump_id=1)),
            feed.where((F.col("ord") > q3) & (F.col("ord") <= q4)),
            # zero-row chunk: bucket range holding no keys → auto-ack
            _pad(dump_chunk(_replica(q4), "c_custkey", _CUST_COLS, 64, 70, dump_id=2)),
        ]
        return pieces, feed.unpersist

    feed_dir = cached_fixture_pieces(spark, sf_dir, "bfrequeue", _build)
    key = os.path.abspath(sf_dir)
    d = _BF_REQUEUE_DIRS.get(key)
    if d is None or not os.path.isdir(f"{d}/state"):
        d = tempfile.mkdtemp(prefix="pgcs_q_bfrequeue_")
        schema = spark.read.parquet(feed_dir).schema
        state = BucketedSnapshotState(spark, f"{d}/state", "c_custkey", n_buckets=32)
        query = apply_stream(
            read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
            state,
            base.where("1=0"),
            "c_custkey",
            _CUST_COLS,
            f"{d}/ckpt",
        )
        query.awaitTermination(300)
        _BF_REQUEUE_DIRS[key] = d
    return (
        BucketedSnapshotState(spark, f"{d}/state", "c_custkey", n_buckets=32),
        feed_dir,
    )


@q(
    "backfill_requeue_streamed",
    apply_oracle_sql(cdc_customer_sql(DUCKDB), "customer", "c_custkey", _CUST_COLS),
    "B2/B5 bound to an oracle (closing the r9 verdict's infra-only gap): the"
    " DBLog gateway conversation with a REQUEUED dump chunk — the chunk for"
    " buckets 32-63 is delivered, then re-delivered two segments later as"
    " the scheduler's cooldown retry re-dumps it at the newer stream"
    " position (pkg/dblog/scheduler.go:151-244 requeue + 2s·2ⁿ cooldown;"
    " gateway.go:178-216 the client nack path) — plus a ZERO-ROW chunk whose"
    " empty micro-batch must auto-ack (scheduler.go: an empty dump acks"
    " without apply; here: mark_batch advances the replay gate, state"
    " untouched). Audit-asserted inline: the feed log demonstrably carries"
    " the dump_id=1 chunk in TWO distinct segments and the zero-row segment"
    " is empty, yet the 8-trigger fold converges to exactly the full-feed"
    " apply — double delivery changes nothing (idempotent last-image merge;"
    " dump ord=1 loses to all later stream events).",
)
def backfill_requeue_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    state, feed_dir = _bf_requeue_state(spark, sf_dir)
    # the delivered-twice audit: both chunk segments carry dump_id=1 rows
    seg3 = spark.read.parquet(os.path.join(feed_dir, "seg-003.parquet"))
    seg5 = spark.read.parquet(os.path.join(feed_dir, "seg-005.parquet"))
    n3 = seg3.where("lsn = 0 AND seq = 1").count()
    n5 = seg5.where("lsn = 0 AND seq = 1").count()
    _check(n3 > 0 and n5 > 0, n3, n5)
    # the zero-row chunk segment is empty, and its batch advanced the gate
    n7 = spark.read.parquet(os.path.join(feed_dir, "seg-007.parquet")).count()
    _check(n7 == 0, n7)
    _check(state.last_batch() == 7, state.last_batch())
    return state.read()


# --------------------- dynamic-state DBLog interleave (learned mid-stream)

_DYN_INTERLEAVE_DIRS: dict[str, str] = {}


def _dyn_interleave_state(spark: SparkSession, sf_dir: str):
    """Relation event, row changes, AND dump chunks for a mid-stream-learned
    composite-identity table, all riding ONE generic binary stream onto
    DynamicMultiTableState (the r9 headliners combined: the gateway serves
    whatever the controller schedules — including tables that appeared after
    capture start, pkg/dblog/gateway.go:159-173). Chunks are wire-rendered
    replica images consistent as-of their injection point, relabeled
    (lsn=0, seq=dump_id, ord=1); the dynamic apply decodes them through the
    registry the stream itself taught it."""
    import tempfile

    from pgcapture_spark.operators.apply import cdc_apply
    from pgcapture_spark.operators.generic_feed import to_binary_feed
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
    from pgcapture_spark.querydefs.r9wave import _relcomp_wire_feed

    def _build():
        wire = _relcomp_wire_feed(spark).persist()
        typed = spark.sql(metrics_composite_feed_sql()).persist()
        empty = spark.createDataFrame(
            [], "g_id bigint, s_id bigint, m_value double, m_note string"
        )
        bounds = ord_quartile_bounds(wire.where(F.col("ord") >= 0))

        def _pad(df):
            return df.unionByName(wire.limit(0), allowMissingColumns=True).select(
                *wire.columns
            )

        def _chunk(hi, g_lo, g_hi, dump_id):
            # the consistent replica image of the learned table as-of the
            # stream position, TID-range-chunked on g_id, wire-rendered
            replica = cdc_apply(
                empty,
                typed.where(F.col("ord") <= hi),
                ["g_id", "s_id"],
                ["m_value", "m_note"],
            ).where(F.col("g_id").between(g_lo, g_hi))
            chunk_typed = replica.select(
                F.lit(0).cast("bigint").alias("lsn"),
                F.lit(dump_id).cast("int").alias("seq"),
                F.lit(1).cast("bigint").alias("ord"),
                F.lit(None).cast("timestamp").alias("commit_ts"),
                F.lit("UPDATE").alias("op"),
                "g_id",
                "s_id",
                "m_value",
                "m_note",
                F.lit("g_id,s_id,m_value,m_note").alias("present"),
            )
            return _pad(
                to_binary_feed(
                    chunk_typed,
                    [("g_id", 20), ("s_id", 20), ("m_value", 701), ("m_note", 25)],
                )
                .withColumn("table_name", F.lit("readings"))
                .withColumn("query", F.lit(None).cast("string"))
            )

        q1, q2, q3, q4 = bounds
        pieces = [
            wire.where(F.col("ord") <= q1),  # Relation (ord -1) + quartile 1
            _chunk(q1, 0, 2, 0),
            wire.where((F.col("ord") > q1) & (F.col("ord") <= q2)),
            _chunk(q2, 3, 5, 1),
            wire.where((F.col("ord") > q2) & (F.col("ord") <= q3)),
            wire.where((F.col("ord") > q3) & (F.col("ord") <= q4)),
        ]

        def _cleanup():
            wire.unpersist()
            typed.unpersist()

        return pieces, _cleanup

    feed_dir = cached_fixture_pieces(spark, sf_dir, "dyninterleave", _build)
    key = os.path.abspath(sf_dir)
    d = _DYN_INTERLEAVE_DIRS.get(key)
    if d is None or not os.path.isdir(f"{d}/state"):
        d = tempfile.mkdtemp(prefix="pgcs_q_dyninter_")
        schema = spark.read.parquet(feed_dir).schema
        state = DynamicMultiTableState(spark, f"{d}/state", RelationRegistry())
        query = apply_stream_dynamic(
            read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
            state,
            {},
            f"{d}/ckpt",
        )
        query.awaitTermination(300)
        _DYN_INTERLEAVE_DIRS[key] = d
    return (
        DynamicMultiTableState(spark, f"{d}/state", RelationRegistry()),
        feed_dir,
    )


@q(
    "backfill_dynamic_interleave",
    apply_oracle_sql(
        metrics_composite_feed_sql(),
        _EVOLVE_EMPTY_4,
        ["g_id", "s_id"],
        ["m_value", "m_note"],
    ),
    "The dynamic-state DBLog interleave (r9's two headliners combined): a"
    " Relation event teaches the consumer a COMPOSITE-identity table"
    " mid-stream, and the SAME generic binary stream then carries both its"
    " row changes and its scheduled dump chunks (wire-rendered replica"
    " images as-of each injection point, relabeled lsn=0/ord=1, chunked on"
    " g_id ranges — the gateway serves whatever the controller schedules,"
    " including tables that appeared after capture start,"
    " pkg/dblog/gateway.go:159-173). Every segment folds onto bucketed"
    " dynamic state through the registry the stream itself taught;"
    " audit-asserted inline: both chunk segments demonstrably carry lsn=0"
    " dump rows, and the learned identity is the (g_id, s_id) pair."
    " Converges to the full typed-feed fold onto an empty snapshot.",
)
def backfill_dynamic_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    state, feed_dir = _dyn_interleave_state(spark, sf_dir)
    _check(state.keys["readings"] == ["g_id", "s_id"])
    for seg in ("seg-001.parquet", "seg-003.parquet"):
        n = (
            spark.read.parquet(os.path.join(feed_dir, seg))
            .where("lsn = 0")
            .count()
        )
        _check(n > 0, seg, n)
    return state.read()["readings"]


@q(
    "cdc_retention_noop_batches",
    apply_oracle_sql(_asof_feed_sql(), "customer", "c_custkey", _CUST_COLS),
    "The retention window under NO-OP micro-batches (ADVICE r9 as a declared"
    " contract): the customer apply runs with TWO EMPTY segments injected"
    " between the ord-median split and the second half, retain_versions=2."
    " Empty batches advance the replay gate via mark_batch but their"
    " pointer-identical history entries ABSORB into the newest retained"
    " entry as a batch range — so the window's slots are consumed only by"
    " commits that actually supersede data: after batches 0..5 (commits at"
    " 0,1,4,5; no-ops at 2,3) the as-of read at batch 1 still resolves"
    " (as do 2 and 3, to the same state), while without the dedup the two"
    " no-ops would have evicted it. Asserted inline: retained window shape,"
    " batch-1/2/3 pointer identity, loud failure at batch 0, and the"
    " storage bound (on-disk version dirs == union of retained pointer"
    " targets). Oracle: the fold of the feed at or below its ord median.",
)
def cdc_retention_noop_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pgcapture_spark.sources.feed import (
        cached_fixture_pieces,
        ord_quartile_bounds,
        read_feed_stream,
    )
    from pgcapture_spark.streaming.pipeline import apply_stream
    from pgcapture_spark.streaming.state import BucketedSnapshotState

    register_views(spark, sf_dir, ("customer",))
    base = spark.table("customer")

    def _build():
        feed = _feed(spark, sf_dir, "customer").persist()
        bounds = ord_quartile_bounds(feed)
        pieces, lo = [], -1
        for i, hi in enumerate(bounds):
            pieces.append(feed.where((F.col("ord") > lo) & (F.col("ord") <= hi)))
            if i == 1:  # two empty segments right after the median split
                pieces.append(feed.where(F.lit(False)))
                pieces.append(feed.where(F.lit(False)))
            lo = hi
        return pieces, feed.unpersist

    # fixture INPUT edge (sources/feed.py contract); the 6-trigger fold — the
    # consumption under test — runs per invocation
    feed_dir = cached_fixture_pieces(spark, sf_dir, "noopret_quart", _build)
    d = tempfile.mkdtemp(prefix="pgcs_q_noopret_")
    schema = spark.read.parquet(feed_dir).schema
    state = BucketedSnapshotState(
        spark, f"{d}/state", "c_custkey", n_buckets=16, retain_versions=2
    )
    query = apply_stream(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
        state,
        base,
        "c_custkey",
        _CUST_COLS,
        f"{d}/ckpt",
    )
    query.awaitTermination(300)
    # commits at 0,1,4,5; marks at 2,3 absorbed into the batch-1 entry
    _check(state.retained_batches() == [3, 4, 5], state.retained_batches())
    m1, m2, m3 = (state.manifest_asof(b) for b in (1, 2, 3))
    _check(m1["buckets"] == m2["buckets"] == m3["buckets"])
    try:
        state.manifest_asof(0)
        raise AssertionError("manifest_asof(0) must fail past the retention window")
    except ValueError:
        pass
    referenced: set[str] = set()
    for b in state.retained_batches():
        referenced.update(state.manifest_asof(b)["buckets"].values())
    on_disk = {
        n
        for n in os.listdir(state.root)
        if n.startswith("v") and os.path.isdir(os.path.join(state.root, n))
    }
    _check(on_disk == referenced, sorted(on_disk), sorted(referenced))
    return state.read_asof(m1).select("c_custkey", *_CUST_COLS)
