"""Round-6 wave contracts: join-view IVM (batch delta algebra + streamed
crash/resume convergence on bucketed state), theta-style sketch intersection
vs the driver-side estimator, and the deletion-neighborhood edit-distance
join vs brute force. The oracle-parity sweep (tests/test_oracle_parity.py)
covers every wave query against DuckDB; these tests pin the semantics the
oracle can't see (delta algebra internals, state layout, candidate-scheme
completeness)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pgcapture_spark.catalog import CDC_COLS, register_views
from pgcapture_spark.operators.apply import cdc_apply
from pgcapture_spark.operators.ivm import (
    ivm_join_view,
    join_view_base,
    signed_key_delta,
)
from pgcapture_spark.queries import _feed
from tests.conftest import SF_SMALL


def test_signed_key_delta_insert_update_toast_delete(spark):
    """The retract/add rows of every CDC verb: DELETE emits only the before
    image (-1); INSERT only the after (+1); an UPDATE whose 'v' column is
    TOAST-absent inherits the before value into its +1 row."""
    snap = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")], "k bigint, v int, t string"
    )
    feed = spark.createDataFrame(
        [
            # UPDATE key 1: t changes, v ABSENT from present -> inherits 10
            (100, "UPDATE", "k,t", 1, None, "a2"),
            # DELETE key 2
            (200, "DELETE", "k", 2, None, None),
            # INSERT key 4
            (300, "INSERT", "k,v,t", 4, 40, "d"),
        ],
        "ord bigint, op string, present string, k bigint, v int, t string",
    )
    rows = {
        (r["k"], r["s"]): (r["v"], r["t"])
        for r in signed_key_delta(snap, feed, "k", ["v", "t"]).collect()
    }
    assert rows == {
        (1, -1): (10, "a"),
        (1, 1): (10, "a2"),  # TOAST-absent v inherited
        (2, -1): (20, "b"),  # delete: no +1 row
        (4, 1): (40, "d"),  # insert: no -1 row
    }


def test_ivm_join_view_matches_from_scratch(spark):
    """The delta-maintained join view equals the view recomputed over the
    APPLIED snapshots (Spark-side independent check; the DuckDB oracle runs
    the same from-scratch comparison in the parity sweep)."""
    register_views(spark, SF_SMALL, ("customer", "orders"))
    orders, customer = spark.table("orders"), spark.table("customer")
    feed_o = _feed(spark, SF_SMALL, "orders")
    feed_c = _feed(spark, SF_SMALL, "customer")
    maintained = ivm_join_view(
        orders, customer, feed_o, feed_c, CDC_COLS["orders"], CDC_COLS["customer"]
    )
    applied_o = cdc_apply(orders, feed_o, "o_orderkey", CDC_COLS["orders"])
    applied_c = cdc_apply(customer, feed_c, "c_custkey", CDC_COLS["customer"])
    scratch = join_view_base(applied_o, applied_c)
    assert maintained.exceptAll(scratch).count() == 0
    assert scratch.exceptAll(maintained).count() == 0
    # and the maintained view actually changed something vs the base view
    base = join_view_base(orders, customer)
    assert maintained.exceptAll(base).count() > 0


def test_ivm_join_stream_crash_resume_bucketed(spark):
    """Streamed join-view maintenance on the bucketed tri-table state:
    (1) kill after the first batch, resume the same checkpoint — replayed
    batches are no-ops and the view converges to the batch IVM result;
    (2) the state root holds exactly the manifest-referenced versions
    (vacuum wired); (3) the mv advances under the SAME manifest as the
    snapshots (one atomic swing)."""
    import json
    import os
    import time

    from pgcapture_spark.fixtures.cdc_feed import SPARK, multi_feed_sql
    from pgcapture_spark.sources.feed import materialize_feed, read_feed_stream
    from pgcapture_spark.streaming.multi import BucketedMultiTableState
    from pgcapture_spark.streaming.mv import ivm_join_stream

    register_views(spark, SF_SMALL, ("customer", "orders"))
    orders, customer = spark.table("orders"), spark.table("customer")
    expected = ivm_join_view(
        orders,
        customer,
        _feed(spark, SF_SMALL, "orders"),
        _feed(spark, SF_SMALL, "customer"),
        CDC_COLS["orders"],
        CDC_COLS["customer"],
    )

    d = tempfile.mkdtemp(prefix="pgcs_t_ivmstream_")
    try:
        feed = spark.sql(multi_feed_sql(SPARK))
        materialize_feed(feed, f"{d}/feed", n_segments=6)
        schema = spark.read.parquet(f"{d}/feed").schema

        def mk_state():
            return BucketedMultiTableState(
                spark,
                f"{d}/state",
                ["orders", "customer", "orders_ck", "mv"],
                {
                    "orders": "o_orderkey",
                    "customer": "c_custkey",
                    "orders_ck": "o_custkey",
                    "mv": "c_nationkey",
                },
                n_buckets=8,
            )

        state = mk_state()
        # phase 1: crash after the first committed batch
        q = ivm_join_stream(
            read_feed_stream(spark, f"{d}/feed", schema, max_files_per_trigger=1),
            state, orders, customer,
            CDC_COLS["orders"], CDC_COLS["customer"], f"{d}/ckpt",
        )
        deadline = time.time() + 120
        while state.last_batch() < 0 and time.time() < deadline:
            time.sleep(0.2)
        q.stop()
        q.awaitTermination(60)
        assert state.last_batch() >= 0
        mid = state.last_batch()

        # phase 2: resume the SAME checkpoint + state
        q2 = ivm_join_stream(
            read_feed_stream(spark, f"{d}/feed", schema, max_files_per_trigger=1),
            mk_state(), orders, customer,
            CDC_COLS["orders"], CDC_COLS["customer"], f"{d}/ckpt",
        )
        q2.awaitTermination(300)
        state = mk_state()
        assert state.last_batch() > mid
        got = state.read()["mv"]
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0

        # one manifest governs all four tables (incl. the custkey-co-bucketed
        # orders projection); vacuum keeps only referenced
        manifest = json.load(open(f"{d}/state/MANIFEST.json"))
        assert set(manifest["buckets"]) == {"orders", "customer", "orders_ck", "mv"}
        referenced = {
            v for per_t in manifest["buckets"].values() for v in per_t.values()
        }
        on_disk = {
            n for n in os.listdir(f"{d}/state")
            if os.path.isdir(f"{d}/state/{n}") and n.startswith("v")
        }
        assert on_disk == referenced
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ivm_join_stream_reads_touched_buckets_only(spark):
    """Round-7 scale audit: per micro-batch the streamed IVM consumer reads
    ONLY bucket slices — never a full-state materialization — and every
    slice's bucket list is a strict subset of the bucket space (with
    n_buckets ≫ keys-per-batch a legitimate touched set can never cover all
    buckets). The O⋈ΔC term reads the custkey-co-bucketed orders projection
    (orders_ck), pruned by ΔC's custkeys."""
    from tests.test_streaming import _RecordingMultiState

    from pgcapture_spark.fixtures.cdc_feed import SPARK, multi_feed_sql
    from pgcapture_spark.sources.feed import materialize_feed, read_feed_stream
    from pgcapture_spark.streaming.multi import BucketedMultiTableState
    from pgcapture_spark.streaming.mv import ivm_join_stream

    register_views(spark, SF_SMALL, ("customer", "orders"))
    orders, customer = spark.table("orders"), spark.table("customer")
    expected = ivm_join_view(
        orders,
        customer,
        _feed(spark, SF_SMALL, "orders"),
        _feed(spark, SF_SMALL, "customer"),
        CDC_COLS["orders"],
        CDC_COLS["customer"],
    )
    d = tempfile.mkdtemp(prefix="pgcs_t_ivmaudit_")
    n_buckets = 256
    try:
        feed = spark.sql(multi_feed_sql(SPARK))
        materialize_feed(feed, f"{d}/feed", n_segments=4)
        schema = spark.read.parquet(f"{d}/feed").schema

        def mk_state():
            return BucketedMultiTableState(
                spark,
                f"{d}/state",
                ["orders", "customer", "orders_ck", "mv"],
                {
                    "orders": "o_orderkey",
                    "customer": "c_custkey",
                    "orders_ck": "o_custkey",
                    "mv": "c_nationkey",
                },
                n_buckets=n_buckets,
            )

        state = _RecordingMultiState(mk_state())
        q = ivm_join_stream(
            read_feed_stream(spark, f"{d}/feed", schema, max_files_per_trigger=1),
            state, orders, customer,
            CDC_COLS["orders"], CDC_COLS["customer"], f"{d}/ckpt",
        )
        q.awaitTermination(300)

        assert state.full_reads == 0
        assert state.read_calls, "stream must have read bucket slices"
        by_table: dict[str, list[list[int]]] = {}
        for t, b in state.read_calls:
            by_table.setdefault(t, []).append(b)
        # all four tables were sliced, every slice strictly partial
        assert set(by_table) == {"orders", "customer", "orders_ck", "mv"}
        for t, reads in by_table.items():
            assert all(0 < len(b) < n_buckets for b in reads), t
        # the mv has ≤25 nation groups — its slices are tiny by construction
        assert all(len(b) <= 25 for b in by_table["mv"])

        got = mk_state().read()["mv"]
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_theta_intersect_matches_driver_estimator(spark):
    """The Spark expression pipeline of agg_theta_intersect_topk must compute
    EXACTLY operators/kmv.kmv_intersect_estimate for every pair it emits —
    same merged sketch, same integer quotients."""
    from pgcapture_spark.operators.kmv import kmv_group_sketches, kmv_intersect_estimate
    from pgcapture_spark.querydefs.r6wave import agg_theta_intersect_topk

    register_views(spark, SF_SMALL, ("events",))
    rows = (
        spark.table("events")
        .where("user_id IS NOT NULL")
        .select(F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id")
    )
    sketches = {
        r["day"]: list(r["mins"])
        for r in kmv_group_sketches(rows, "day", "user_id", k=64).collect()
    }
    got = agg_theta_intersect_topk(spark, SF_SMALL).collect()
    assert got, "expected at least one day pair"
    for r in got:
        ref = kmv_intersect_estimate(sketches[r["g1"]], sketches[r["g2"]], k=64)
        assert r["union_est"] == ref["union_est"], (r["g1"], r["g2"])
        assert r["jaccard_milli"] == ref["jaccard_milli"], (r["g1"], r["g2"])
        assert r["intersect_est"] == ref["intersect_est"], (r["g1"], r["g2"])


def test_editdist_join_complete_vs_bruteforce(spark):
    """Deletion-neighborhood candidates find EVERY pair within edit distance
    1 (the FastSS completeness guarantee) — compared against an exhaustive
    all-pairs levenshtein on the same keys, plus a synthetic insert/subst/
    delete triple that must all surface."""
    from pgcapture_spark.querydefs.r6wave import dedup_editdist_join

    got = {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in dedup_editdist_join(spark, SF_SMALL).collect()
    }
    d = spark.table("documents").select(
        "doc_id", F.expr("substring(text, 1, 16)").alias("s")
    )
    brute = {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in d.alias("a")
        .join(d.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein("a.s", "b.s").cast("long").alias("dist"),
        )
        .where("dist <= 1")
        .collect()
    }
    assert got == brute

    # synthetic: substitution, deletion, insertion neighbors all found
    docs = spark.createDataFrame(
        [(1, "spark"), (2, "spork"), (3, "spar"), (4, "sparks"), (5, "duck")],
        "doc_id bigint, s string",
    )
    variants = docs.select(
        "doc_id",
        "s",
        F.explode(
            F.expr(
                "transform(sequence(0, char_length(s)), i -> CASE WHEN i = 0 THEN s"
                " ELSE concat(substring(s, 1, i - 1), substring(s, i + 1, 16)) END)"
            )
        ).alias("var"),
    )
    pairs = (
        variants.alias("x")
        .join(
            variants.alias("y"),
            (F.col("x.var") == F.col("y.var"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select("x.doc_id", "y.doc_id", F.levenshtein("x.s", "y.s").alias("dist"))
        .distinct()
        .where("dist <= 1")
    )
    found = {(r[0], r[1]) for r in pairs.collect()}
    assert found == {(1, 2), (1, 3), (1, 4)}


@pytest.mark.parametrize("name", ["corpus_pack_chunks", "corpus_mix_schedule"])
def test_pack_and_mix_conservation(spark, name):
    """Conservation laws the oracle comparison can't articulate: packing
    chunk tokens sum to the corpus token count (no token lost or double
    counted across chunk boundaries); mix shares sum to ~1e6 ppm."""
    from pgcapture_spark.operators.textstats import TOKENS_EXPR
    from pgcapture_spark.querydefs import r6wave

    register_views(spark, SF_SMALL, ("documents",))
    total = (
        spark.table("documents")
        .select(F.size(F.expr(TOKENS_EXPR)).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    if name == "corpus_pack_chunks":
        got = r6wave.corpus_pack_chunks(spark, SF_SMALL)
        assert got.agg(F.sum("n_tokens")).collect()[0][0] == total
        # every chunk except each source's last is exactly full
        per = got.groupBy("source").agg(
            F.max("chunk_id").alias("mx"),
            F.sum(F.when(F.col("n_tokens") != 128, 1).otherwise(0)).alias("partial"),
        )
        assert per.where("partial > 1").count() == 0
    else:
        got = r6wave.corpus_mix_schedule(spark, SF_SMALL)
        s = got.agg(F.sum("share_ppm")).collect()[0][0]
        n_langs = got.count()
        # floor rounding loses < 1 ppm per language
        assert 1_000_000 - n_langs <= s <= 1_000_000


def test_cusum_changepoint_matches_float_reference():
    """The cross-multiplied integer CUSUM |n·cumᵢ - i·total| picks the same
    argmax as the textbook float form max |Σ(xⱼ - x̄)| (it is the float
    statistic scaled by n·100 — scaling preserves the argmax), checked on a
    synthetic series with a known mean shift at index 6. (The query itself
    is oracle-checked in the parity sweep; this pins the algebraic identity
    the integer form relies on.)"""
    vals = [1.0, 1.2, 0.9, 1.1, 1.0, 1.05, 5.0, 5.2, 4.9, 5.1]
    cents = [int(v * 100 + 0.5) for v in vals]
    n, total = len(cents), sum(cents)
    cum, best = 0, (0, -1)
    for i, c in enumerate(cents, start=1):
        cum += c
        d = abs(n * cum - i * total)
        if d > best[0]:
            best = (d, i)
    # float reference argmax
    mean = sum(vals) / len(vals)
    fcum, fbest = 0.0, (0.0, -1)
    for i, v in enumerate(vals, start=1):
        fcum += v - mean
        if abs(fcum) > fbest[0]:
            fbest = (abs(fcum), i)
    assert best[1] == fbest[1] == 6  # the shift lands after index 6
