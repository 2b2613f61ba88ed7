"""Dynamic relation registry (SURVEY §2 S-side schema learning): a CREATE
TABLE event MID-STREAM materializes a never-before-seen table and its
subsequent row events decode (binary wire fields) and apply — the
PGXSchemaLoader-refresh behavior (pkg/decode/schema.go:114-159) end-to-end
on Structured Streaming, plus manifest rehydration on restart."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pgcapture_spark.catalog import register_views
from pgcapture_spark.operators.ddl import parse_create
from pgcapture_spark.operators.generic_feed import (
    CUSTOMER_FIELD_OIDS,
    to_binary_feed,
)
from pgcapture_spark.queries import _feed
from pgcapture_spark.sources.feed import materialize_feed, read_feed_stream
from pgcapture_spark.streaming.multi import DynamicMultiTableState, apply_stream_dynamic
from pgcapture_spark.streaming.registry import RelationRegistry
from tests.conftest import SF_SMALL

_CREATE_SIDECAR = (
    "CREATE TABLE public.sidecar (s_id bigint PRIMARY KEY, s_note text, s_score float8)"
)

_FEED_META = ("lsn", "seq", "ord", "commit_ts", "op", "table_name", "query")


def test_parse_create_table():
    ct = parse_create(_CREATE_SIDECAR)
    assert ct.schema == "public" and ct.table == "sidecar"
    assert ct.fields == [("s_id", 20), ("s_note", 25), ("s_score", 701)]
    assert ct.key == ["s_id"]

    ct2 = parse_create("create table t (a int4, b varchar, primary key (a));")
    assert ct2.fields == [("a", 23), ("b", 1043)] and ct2.key == ["a"]
    assert parse_create("ALTER TABLE t ADD c int") is None


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="pgcs_dynreg_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _generic_stream_df(spark):
    """customer binary feed + mid-stream CREATE TABLE sidecar + sidecar
    row events (INSERT/UPDATE/DELETE), one ordered generic stream."""
    register_views(spark, SF_SMALL, ("customer",))
    typed = _feed(spark, SF_SMALL, "customer")
    cust = (
        to_binary_feed(typed, CUSTOMER_FIELD_OIDS, old_key=("old_c_custkey", "c_custkey", 20))
        .withColumn("table_name", F.lit("customer"))
        .withColumn("query", F.lit(None).cast("string"))
        .select(*_FEED_META, "fields", "old_fields")
    )
    # place the DDL above ~60% of customer ords; sidecar events above everything
    p60, mx = typed.selectExpr(
        "percentile_approx(ord, 0.6)", "max(ord)"
    ).first()
    ddl = spark.createDataFrame(
        [(int(p60), 1, int(p60), None, "DDL", "sidecar", _CREATE_SIDECAR)],
        "lsn bigint, seq int, ord bigint, commit_ts timestamp, op string,"
        " table_name string, query string",
    ).select(
        *_FEED_META,
        F.expr("CAST(NULL AS array<struct<name:string,oid:int,bin:binary>>)").alias(
            "fields"
        ),
        F.expr("CAST(NULL AS array<struct<name:string,oid:int,bin:binary>>)").alias(
            "old_fields"
        ),
    )
    side_typed = spark.sql(
        f"""
        SELECT id + 1 AS lsn, 1 AS seq, {int(mx)} + id * 10 + 1 AS ord,
               CAST(NULL AS TIMESTAMP) AS commit_ts,
               CASE WHEN id % 5 = 4 THEN 'DELETE'
                    WHEN id % 3 = 0 THEN 'UPDATE' ELSE 'INSERT' END AS op,
               id AS s_id,
               CASE WHEN id % 4 = 2 THEN CAST(NULL AS STRING)
                    ELSE 'note-' || id END AS s_note,
               id / 4.0 AS s_score,
               CASE WHEN id % 5 = 4 THEN id ELSE CAST(NULL AS BIGINT) END AS old_s_id,
               CASE WHEN id % 5 = 4 THEN ''
                    WHEN id % 2 = 0 THEN 's_id,s_note,s_score'
                    ELSE 's_id,s_note' END AS present
        FROM range(40) t(id)
        """
    )
    side = (
        to_binary_feed(
            side_typed,
            [("s_id", 20), ("s_note", 25), ("s_score", 701)],
            old_key=("old_s_id", "s_id", 20),
        )
        .withColumn("table_name", F.lit("sidecar"))
        .withColumn("query", F.lit(None).cast("string"))
        .select(*_FEED_META, "fields", "old_fields")
    )
    return cust.unionAll(ddl).unionAll(side), side_typed


def test_create_table_mid_stream_materializes_and_applies(spark, tmpdir):
    feed, side_typed = _generic_stream_df(spark)
    feed_dir = f"{tmpdir}/feed"
    materialize_feed(feed, feed_dir, n_segments=6, order_col="ord")
    schema = spark.read.parquet(feed_dir).schema

    reg = RelationRegistry()
    reg.learn_static("customer", ["c_custkey"], CUSTOMER_FIELD_OIDS)
    state = DynamicMultiTableState(spark, f"{tmpdir}/state", reg)
    q = apply_stream_dynamic(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=2),
        state,
        {"customer": spark.table("customer")},
        f"{tmpdir}/ckpt",
    )
    q.awaitTermination(300)

    snaps = state.read()
    assert set(snaps) == {"customer", "sidecar"}

    # sidecar: survivors = inserted/updated ids minus deletes; deletes are the
    # id % 5 == 4 rows (old-image-only events), updates of never-inserted keys
    # still upsert (idempotent batched-insert semantics, A3)
    side = snaps["sidecar"].orderBy("s_id").collect()
    expect = side_typed.where("op <> 'DELETE'").select("s_id").distinct()
    deleted = side_typed.where("op = 'DELETE'").select("s_id")
    exp_ids = {r.s_id for r in expect.collect()} - {r.s_id for r in deleted.collect()}
    assert {r.s_id for r in side} == exp_ids
    by_id = {r.s_id: r for r in side}
    for i in sorted(exp_ids):
        # last image: note NULLed when id%4==2, score present only when id%2==0
        row = by_id[i]
        if i % 4 == 2:
            assert row.s_note is None
        else:
            assert row.s_note == f"note-{i}"
        if i % 2 == 0:
            assert row.s_score == pytest.approx(i / 4.0)
        else:
            assert row.s_score is None  # never set for odd ids (absent field)

    # customer converges to the one-shot batch apply (same as typed pipeline)
    from pgcapture_spark.catalog import CDC_COLS
    from pgcapture_spark.operators.apply import cdc_apply

    batch = cdc_apply(
        spark.table("customer"),
        _feed(spark, SF_SMALL, "customer"),
        "c_custkey",
        CDC_COLS["customer"],
    )
    got = snaps["customer"]
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0

    # restart: a FRESH state (static registry only) rehydrates the learned
    # relation from the manifest — no re-observation of the CREATE TABLE
    reg2 = RelationRegistry()
    reg2.learn_static("customer", ["c_custkey"], CUSTOMER_FIELD_OIDS)
    state2 = DynamicMultiTableState(spark, f"{tmpdir}/state", reg2)
    assert "sidecar" in state2.registry.tables()
    assert state2.registry.key("sidecar") == ["s_id"]
    assert set(state2.read()) == {"customer", "sidecar"}


_ALTER_SIDECAR = "ALTER TABLE public.sidecar ADD COLUMN s_tag text"


def test_alter_table_mid_stream_evolves_relation(spark, tmpdir):
    """CREATE TABLE, a wave of INSERTs, then an in-stream ALTER ADD COLUMN,
    then UPDATEs setting only the new column: the registry refreshes the
    relation shape mid-stream, snapshots align (new column NULL-filled), and
    the fold inherits untouched columns across the DDL boundary."""
    meta = "lsn bigint, seq int, ord bigint, commit_ts timestamp, op string," \
           " table_name string, query string"
    fields_t = "array<struct<name:string,oid:int,bin:binary>>"

    def ddl_row(ord_, query):
        return spark.createDataFrame(
            [(ord_, 1, ord_, None, "DDL", "sidecar", query)], meta
        ).select(
            "*",
            F.expr(f"CAST(NULL AS {fields_t})").alias("fields"),
            F.expr(f"CAST(NULL AS {fields_t})").alias("old_fields"),
        )

    wave1 = spark.sql(
        """
        SELECT id + 10 AS lsn, 1 AS seq, 100 + id AS ord,
               CAST(NULL AS TIMESTAMP) AS commit_ts, 'INSERT' AS op,
               id AS s_id, 'note-' || id AS s_note, id / 2.0 AS s_score,
               CAST(NULL AS BIGINT) AS old_s_id,
               's_id,s_note,s_score' AS present
        FROM range(10) t(id)
        """
    )
    w1 = (
        to_binary_feed(
            wave1,
            [("s_id", 20), ("s_note", 25), ("s_score", 701)],
            old_key=("old_s_id", "s_id", 20),
        )
        .withColumn("table_name", F.lit("sidecar"))
        .withColumn("query", F.lit(None).cast("string"))
        .select(*_FEED_META, "fields", "old_fields")
    )
    wave2 = spark.sql(
        """
        SELECT id + 50 AS lsn, 1 AS seq, 300 + id AS ord,
               CAST(NULL AS TIMESTAMP) AS commit_ts, 'UPDATE' AS op,
               id AS s_id, 'tag-' || id AS s_tag,
               CAST(NULL AS BIGINT) AS old_s_id,
               's_id,s_tag' AS present
        FROM range(10) t(id) WHERE id % 2 = 0
        """
    )
    w2 = (
        to_binary_feed(
            wave2, [("s_id", 20), ("s_tag", 25)], old_key=("old_s_id", "s_id", 20)
        )
        .withColumn("table_name", F.lit("sidecar"))
        .withColumn("query", F.lit(None).cast("string"))
        .select(*_FEED_META, "fields", "old_fields")
    )
    feed = (
        ddl_row(1, _CREATE_SIDECAR)
        .unionAll(w1)
        .unionAll(ddl_row(200, _ALTER_SIDECAR))
        .unionAll(w2)
    )
    feed_dir = f"{tmpdir}/feed"
    materialize_feed(feed, feed_dir, n_segments=4, order_col="ord")
    schema = spark.read.parquet(feed_dir).schema

    reg = RelationRegistry()
    state = DynamicMultiTableState(spark, f"{tmpdir}/state", reg)
    q = apply_stream_dynamic(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
        state,
        {},
        f"{tmpdir}/ckpt",
    )
    q.awaitTermination(300)

    assert state.registry.fields("sidecar") == [
        ("s_id", 20), ("s_note", 25), ("s_score", 701), ("s_tag", 25),
    ]
    side = {r.s_id: r for r in state.read()["sidecar"].collect()}
    assert set(side) == set(range(10))
    for i in range(10):
        assert side[i].s_note == f"note-{i}"  # inherited across the ALTER
        assert side[i].s_score == pytest.approx(i / 2.0)
        assert side[i].s_tag == (f"tag-{i}" if i % 2 == 0 else None)


_CREATE_NOPK = "CREATE TABLE public.keyless (k_a bigint, k_b text)"
_CREATE_COMPOSITE = (
    "CREATE TABLE public.duo (d_a bigint, d_b bigint, d_v text, PRIMARY KEY (d_a, d_b))"
)


def test_dynamic_apply_quarantines_non_single_key_relations(spark, tmpdir):
    """A mid-stream CREATE with no PRIMARY KEY (key=[]) or a composite PK must
    NOT crash the multi-table query (the old code indexed reg.key(t)[0]) and
    must NOT mis-apply on the first key column: such relations are
    quarantined — snapshot carried forward untouched — while single-key
    tables keep applying."""
    meta = "lsn bigint, seq int, ord bigint, commit_ts timestamp, op string," \
           " table_name string, query string"
    fields_t = "array<struct<name:string,oid:int,bin:binary>>"

    def ddl_row(ord_, table, query):
        return spark.createDataFrame(
            [(ord_, 1, ord_, None, "DDL", table, query)], meta
        ).select(
            "*",
            F.expr(f"CAST(NULL AS {fields_t})").alias("fields"),
            F.expr(f"CAST(NULL AS {fields_t})").alias("old_fields"),
        )

    wave = spark.sql(
        """
        SELECT id + 10 AS lsn, 1 AS seq, 100 + id AS ord,
               CAST(NULL AS TIMESTAMP) AS commit_ts, 'INSERT' AS op,
               id AS s_id, 'note-' || id AS s_note, id / 2.0 AS s_score,
               CAST(NULL AS BIGINT) AS old_s_id,
               's_id,s_note,s_score' AS present
        FROM range(8) t(id)
        """
    )
    w = (
        to_binary_feed(
            wave,
            [("s_id", 20), ("s_note", 25), ("s_score", 701)],
            old_key=("old_s_id", "s_id", 20),
        )
        .withColumn("table_name", F.lit("sidecar"))
        .withColumn("query", F.lit(None).cast("string"))
        .select(*_FEED_META, "fields", "old_fields")
    )
    feed = (
        ddl_row(1, "sidecar", _CREATE_SIDECAR)
        .unionAll(ddl_row(2, "keyless", _CREATE_NOPK))
        .unionAll(ddl_row(3, "duo", _CREATE_COMPOSITE))
        .unionAll(w)
    )
    feed_dir = f"{tmpdir}/feed"
    materialize_feed(feed, feed_dir, n_segments=2, order_col="ord")
    schema = spark.read.parquet(feed_dir).schema

    reg = RelationRegistry()
    state = DynamicMultiTableState(spark, f"{tmpdir}/state", reg)
    q = apply_stream_dynamic(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
        state,
        {},
        f"{tmpdir}/ckpt",
    )
    q.awaitTermination(300)  # would raise StreamingQueryException pre-guard

    snaps = state.read()
    assert set(snaps) == {"sidecar", "keyless", "duo"}
    assert snaps["keyless"].count() == 0  # quarantined, carried forward empty
    assert snaps["duo"].count() == 0
    assert {r.s_id for r in snaps["sidecar"].collect()} == set(range(8))


def test_relation_message_resend_evolves_schema(spark, tmpdir):
    """A re-sent Relation ('R') message for a KNOWN table with an extra
    column overwrites the cache entry (the reference refreshes its schema
    cache on every relation message, independent of DDL): the snapshot
    aligns (new column NULL-filled) and later events populate it — the
    R-message twin of the ALTER-TABLE evolution test."""
    meta = "lsn bigint, seq int, ord bigint, commit_ts timestamp, op string," \
           " table_name string, query string"

    def rel_row(ord_, cols):
        entries = ", ".join(
            f"named_struct('name', '{n}', 'oid', {oid}, 'bin', {'X' + chr(39) + ('01' if k else '00') + chr(39)})"
            for n, oid, k in cols
        )
        return spark.createDataFrame(
            [(ord_, 1, ord_, None, "RELATION", "gauge", None)], meta
        ).select(
            "*",
            F.expr(f"array({entries})").alias("fields"),
            F.expr(
                "CAST(NULL AS array<struct<name:string,oid:int,bin:binary>>)"
            ).alias("old_fields"),
        )

    v1 = [("g_id", 20, True), ("g_val", 701, False)]
    v2 = v1 + [("g_tag", 25, False)]
    wave1 = spark.sql(
        """
        SELECT id + 10 AS lsn, 1 AS seq, 100 + id AS ord,
               CAST(NULL AS TIMESTAMP) AS commit_ts, 'INSERT' AS op,
               id AS g_id, id / 2.0 AS g_val,
               CAST(NULL AS BIGINT) AS old_g_id, 'g_id,g_val' AS present
        FROM range(6) t(id)
        """
    )
    w1 = (
        to_binary_feed(wave1, [("g_id", 20), ("g_val", 701)], old_key=("old_g_id", "g_id", 20))
        .withColumn("table_name", F.lit("gauge"))
        .withColumn("query", F.lit(None).cast("string"))
        .select(*_FEED_META, "fields", "old_fields")
    )
    wave2 = spark.sql(
        """
        SELECT id + 50 AS lsn, 1 AS seq, 300 + id AS ord,
               CAST(NULL AS TIMESTAMP) AS commit_ts, 'UPDATE' AS op,
               id AS g_id, 'tag-' || id AS g_tag,
               CAST(NULL AS BIGINT) AS old_g_id, 'g_id,g_tag' AS present
        FROM range(6) t(id) WHERE id % 2 = 0
        """
    )
    w2 = (
        to_binary_feed(wave2, [("g_id", 20), ("g_tag", 25)], old_key=("old_g_id", "g_id", 20))
        .withColumn("table_name", F.lit("gauge"))
        .withColumn("query", F.lit(None).cast("string"))
        .select(*_FEED_META, "fields", "old_fields")
    )
    feed = rel_row(1, v1).unionAll(w1).unionAll(rel_row(200, v2)).unionAll(w2)
    feed_dir = f"{tmpdir}/feed"
    materialize_feed(feed, feed_dir, n_segments=3, order_col="ord")
    schema = spark.read.parquet(feed_dir).schema

    reg = RelationRegistry()
    state = DynamicMultiTableState(spark, f"{tmpdir}/state", reg)
    q = apply_stream_dynamic(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
        state,
        {},
        f"{tmpdir}/ckpt",
    )
    q.awaitTermination(300)

    assert state.registry.fields("gauge") == [("g_id", 20), ("g_val", 701), ("g_tag", 25)]
    rows = {r.g_id: r for r in state.read()["gauge"].collect()}
    assert set(rows) == set(range(6))
    for i in range(6):
        assert rows[i].g_val == pytest.approx(i / 2.0)  # inherited across refresh
        assert rows[i].g_tag == (f"tag-{i}" if i % 2 == 0 else None)
