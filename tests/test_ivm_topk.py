"""Per-group TOP-K IVM contracts (operators/ivm_topk.py + streaming/mv.py::
topk_stream): the window algebra's clean/dirty classification, the bounded
rescan's exactness, deterministic tie-breaks, and the streamed form's
touched-bucket read discipline. The oracle-parity sweep checks the declared
queries against DuckDB; these pin the semantics the oracle can't see —
that the slack absorbs what it should and the rescan fires when it must."""

from __future__ import annotations

from pyspark.sql import functions as F

from pgcapture_spark.operators.ivm_topk import ivm_topk_view, topk_support


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k bigint, g int, v double")


def _feed_rows(spark, rows):
    # (ord, op, present, k, g, v)
    return spark.createDataFrame(
        rows, "ord bigint, op string, present string, k bigint, g int, v double"
    )


def _run(spark, snap_rows, feed_rows, k=2, m=None):
    snap = _mk(spark, snap_rows)
    feed = _feed_rows(spark, feed_rows)
    out = ivm_topk_view(snap, feed, "k", "g", "v", ["g", "v"], k=k, m=m)
    return {(r["g"], r["rk"]): (r["k"], r["v"]) for r in out.collect()}


def test_topk_delete_inside_window_with_zero_slack_rescans(spark):
    """m == k: any retraction inside the window exhausts it — the rescan
    must surface the rows below the (now stale) floor."""
    got = _run(
        spark,
        [(1, 0, 9.0), (2, 0, 8.0), (3, 0, 7.0), (4, 0, 5.0)],
        [(100, "DELETE", "k", 1, None, None), (200, "DELETE", "k", 2, None, None)],
        k=2,
        m=2,
    )
    assert got == {(0, 1): (3, 700), (0, 2): (4, 500)}


def test_topk_slack_absorbs_one_delete_clean(spark):
    """With slack, a single retraction leaves >= k window survivors — the
    clean path alone must already be exact (no rescan needed)."""
    got = _run(
        spark,
        [(1, 0, 9.0), (2, 0, 8.0), (3, 0, 7.0), (4, 0, 5.0)],
        [(100, "DELETE", "k", 1, None, None)],
        k=2,
        m=4,
    )
    assert got == {(0, 1): (2, 800), (0, 2): (3, 700)}


def test_topk_insert_takes_rank_one(spark):
    got = _run(
        spark,
        [(1, 0, 9.0), (2, 0, 8.0)],
        [(100, "INSERT", "k,g,v", 7, 0, 100.0)],
        k=2,
    )
    assert got == {(0, 1): (7, 10000), (0, 2): (1, 900)}


def test_topk_update_moves_row_between_groups(spark):
    """An UPDATE that changes the group retracts from g=0's window and adds
    to g=1 — both sides resolve in one pass."""
    got = _run(
        spark,
        [(1, 0, 9.0), (2, 0, 8.0), (3, 1, 3.0)],
        [(100, "UPDATE", "k,g,v", 1, 1, 7.0)],
        k=2,
        m=2,
    )
    assert got == {(0, 1): (2, 800), (1, 1): (1, 700), (1, 2): (3, 300)}


def test_topk_group_emptied_drops(spark):
    got = _run(
        spark,
        [(1, 0, 5.0), (2, 1, 2.0)],
        [(100, "DELETE", "k", 1, None, None)],
        k=2,
    )
    assert got == {(1, 1): (2, 200)}


def test_topk_new_group_from_inserts_only(spark):
    got = _run(
        spark,
        [(1, 0, 5.0)],
        [
            (100, "INSERT", "k,g,v", 7, 3, 2.0),
            (200, "INSERT", "k,g,v", 8, 3, 8.0),
        ],
        k=2,
    )
    assert got == {(0, 1): (1, 500), (3, 1): (8, 800), (3, 2): (7, 200)}


def test_topk_ties_break_by_ascending_key(spark):
    """Equal values rank by ascending key — the total order both engines
    share, so the trim boundary is deterministic."""
    got = _run(
        spark,
        [(5, 0, 7.0), (2, 0, 7.0), (9, 0, 7.0)],
        [(100, "INSERT", "k,g,v", 1, 0, 7.0)],
        k=3,
        m=3,
    )
    assert got == {(0, 1): (1, 700), (0, 2): (2, 700), (0, 3): (5, 700)}


def test_topk_delete_below_window_only_counts(spark):
    """Retracting a row outside the window cannot change the top-k; only the
    group size moves (and must not trip the dirty classifier)."""
    got = _run(
        spark,
        [(1, 0, 9.0), (2, 0, 8.0), (3, 0, 1.0)],
        [(100, "DELETE", "k", 3, None, None)],
        k=2,
        m=2,
    )
    assert got == {(0, 1): (1, 900), (0, 2): (2, 800)}


def test_topk_converges_on_cdc_feed(spark):
    """At sf0.001 the customer feed (inserts + updates + deletes) must land
    exactly on the from-scratch ranked top-k of the applied snapshot, with
    the declared query's own (k, m)."""
    from pyspark.sql import Window as W

    from pgcapture_spark.catalog import CDC_COLS, register_views
    from pgcapture_spark.operators.apply import cdc_apply
    from pgcapture_spark.operators.incremental import cents_col
    from pgcapture_spark.queries import _feed
    from tests.conftest import SF_SMALL

    register_views(spark, SF_SMALL, ("customer",))
    snap = spark.table("customer")
    feed = _feed(spark, SF_SMALL, "customer")
    got = ivm_topk_view(
        snap, feed, "c_custkey", "c_nationkey", "c_acctbal",
        CDC_COLS["customer"], k=3,
    )
    applied = cdc_apply(snap, feed, "c_custkey", CDC_COLS["customer"])
    w = W.partitionBy("c_nationkey").orderBy(
        cents_col(F.col("c_acctbal")).desc(), F.col("c_custkey").asc()
    )
    expected = (
        applied.withColumn("rk", F.row_number().over(w).cast("long"))
        .where("rk <= 3")
        .select(
            "c_nationkey", "rk", "c_custkey",
            cents_col(F.col("c_acctbal")).alias("v"),
        )
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_topk_stream_crash_resume_and_touched_reads_only(spark):
    """Streamed top-k on the tri-table bucketed state: kill after the first
    committed batch, resume the same checkpoint — converges to the
    from-scratch ranked view; every per-batch read is a strict bucket
    subset (never a full-state materialization)."""
    import shutil
    import tempfile
    import time

    from pyspark.sql import Window as W

    from pgcapture_spark.catalog import CDC_COLS, register_views
    from pgcapture_spark.operators.apply import cdc_apply
    from pgcapture_spark.operators.incremental import cents_col
    from pgcapture_spark.queries import _feed
    from pgcapture_spark.sources.feed import materialize_feed, read_feed_stream
    from pgcapture_spark.streaming.multi import BucketedMultiTableState
    from pgcapture_spark.streaming.mv import topk_stream
    from tests.conftest import SF_SMALL
    from tests.test_streaming import _RecordingMultiState

    register_views(spark, SF_SMALL, ("customer",))
    snap = spark.table("customer")
    feed = _feed(spark, SF_SMALL, "customer")
    applied = cdc_apply(snap, feed, "c_custkey", CDC_COLS["customer"])
    w = W.partitionBy("c_nationkey").orderBy(
        cents_col(F.col("c_acctbal")).desc(), F.col("c_custkey").asc()
    )
    expected = (
        applied.withColumn("rk", F.row_number().over(w).cast("long"))
        .where("rk <= 3")
        .select(
            "c_nationkey", "rk", "c_custkey",
            cents_col(F.col("c_acctbal")).alias("v"),
        )
    )
    d = tempfile.mkdtemp(prefix="pgcs_t_topkstream_")
    n_buckets = 64
    try:
        materialize_feed(feed, f"{d}/feed", n_segments=5)
        schema = spark.read.parquet(f"{d}/feed").schema

        def mk_state():
            return BucketedMultiTableState(
                spark,
                f"{d}/state",
                ["snapshot", "by_group", "support"],
                {
                    "snapshot": "c_custkey",
                    "by_group": "c_nationkey",
                    "support": "c_nationkey",
                },
                n_buckets=n_buckets,
            )

        def run(st, ckpt):
            return topk_stream(
                read_feed_stream(spark, f"{d}/feed", schema, max_files_per_trigger=1),
                st, snap, "c_custkey", "c_nationkey", "c_acctbal",
                CDC_COLS["customer"], ckpt, k=3,
            )

        state = _RecordingMultiState(mk_state())
        q = run(state, f"{d}/ckpt")
        deadline = time.time() + 120
        while state.last_batch() < 0 and time.time() < deadline:
            time.sleep(0.2)
        q.stop()
        q.awaitTermination(60)
        assert state.last_batch() >= 0
        mid = state.last_batch()

        state2 = _RecordingMultiState(mk_state())
        q2 = run(state2, f"{d}/ckpt")
        q2.awaitTermination(300)
        assert state2.last_batch() > mid

        for st in (state, state2):
            assert st.full_reads == 0
            assert all(0 < len(b) < n_buckets for _, b in st.read_calls)

        sup = mk_state().read()["support"].select("c_custkey", "c_nationkey", "v")
        ws = W.partitionBy("c_nationkey").orderBy(
            F.col("v").desc(), F.col("c_custkey").asc()
        )
        got = (
            sup.withColumn("rk", F.row_number().over(ws).cast("long"))
            .where("rk <= 3")
            .select("c_nationkey", "rk", "c_custkey", "v")
        )
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_topk_support_is_topm_window(spark):
    vals = _mk(spark, [(1, 0, 9.0), (2, 0, 8.0), (3, 0, 7.0), (4, 1, 1.0)]).select(
        "k", "g", F.col("v").alias("v")
    )
    got = {
        (r["g"], r["k"]) for r in topk_support(vals, "k", "g", 2).collect()
    }
    assert got == {(0, 1), (0, 2), (1, 4)}


def test_topk_low_adds_refilling_gutted_window_still_rescans(spark):
    """The case a survivor-count classifier gets silently wrong (caught at
    sf0.01 by the oracle): most of the window is retracted while LOW
    insertions refill it past k. The k-th trimmed value fails the strict
    threshold test, so the group must rescan and surface the unseen rows
    between the additions and the old floor."""
    got = _run(
        spark,
        [(1, 0, 9.0), (2, 0, 8.0), (3, 0, 7.0), (4, 0, 5.0)],
        [
            (100, "DELETE", "k", 1, None, None),
            (200, "INSERT", "k,g,v", 7, 0, 0.01),
        ],
        k=2,
        m=2,
    )
    # true top-2 after the batch: 8.0 (key 2) and the UNSEEN 7.0 (key 3),
    # not the refilling 0.01 add
    assert got == {(0, 1): (2, 800), (0, 2): (3, 700)}


def test_topk_threshold_survives_clean_update_for_next_delta(spark):
    """Two-step continuation: after a clean batch, the stored window's
    threshold must still bound the unseen rows — a second batch gutting the
    window must rescan against them, not trust the refilled floor."""
    from pgcapture_spark.operators.ivm_topk import topk_support, ivm_topk_view

    snap = _mk(
        spark,
        [(1, 0, 9.0), (2, 0, 8.0), (3, 0, 7.0), (4, 0, 6.0), (5, 0, 5.0)],
    )
    # stored support for m=3: {9,8,7}, threshold 700
    S0 = topk_support(
        snap.select("k", "g", (F.floor(F.col("v") * 100 + 0.5)).cast("long").alias("v")),
        "k",
        "g",
        3,
    )
    # batch 1 (clean): delete key 3 (window tail), add 6.5 -> window {9,8,650}?
    # no: 6.5 <= threshold 7.0 joins the unseen population; window {9,8}
    # stays clean for k=2 (kth=800 > 700)
    feed1 = _feed_rows(
        spark,
        [
            (100, "DELETE", "k", 3, None, None),
            (200, "INSERT", "k,g,v", 9, 0, 6.5),
        ],
    )
    out1 = ivm_topk_view(snap, feed1, "k", "g", "v", ["g", "v"], k=2, m=3, support=S0)
    got1 = {(r["g"], r["rk"]): (r["k"], r["v"]) for r in out1.collect()}
    assert got1 == {(0, 1): (1, 900), (0, 2): (2, 800)}


# --------------------------------------------------------- property sweep

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _topk_case(draw):
    n_snap = draw(st.integers(0, 10))
    snap = [
        (kk, draw(st.integers(0, 3)), float(draw(st.integers(0, 15))))
        for kk in range(1, n_snap + 1)
    ]
    n_ops = draw(st.integers(1, 8))
    ops = []
    next_key = n_snap + 1
    for i in range(n_ops):
        kind = draw(st.sampled_from(["INSERT", "DELETE", "UPDATE", "UPDATE_PARTIAL"]))
        if kind == "INSERT":
            key = next_key
            next_key += 1
            ops.append(
                (100 * (i + 1), "INSERT", "k,g,v", key,
                 draw(st.integers(0, 3)), float(draw(st.integers(0, 15))))
            )
        else:
            hi = next_key - 1
            key = draw(st.integers(1, max(1, hi)))
            if kind == "DELETE":
                ops.append((100 * (i + 1), "DELETE", "k", key, None, None))
            elif kind == "UPDATE":
                ops.append(
                    (100 * (i + 1), "UPDATE", "k,g,v", key,
                     draw(st.integers(0, 3)), float(draw(st.integers(0, 15))))
                )
            else:
                # group rides the before image (TOAST-absent column)
                ops.append(
                    (100 * (i + 1), "UPDATE", "k,v", key,
                     None, float(draw(st.integers(0, 15))))
                )
    k = draw(st.integers(1, 4))
    m = k + draw(st.integers(0, 4))
    return snap, ops, k, m


@settings(max_examples=12, deadline=None)
@given(case=_topk_case())
def test_topk_property_converges_to_from_scratch(spark, case):
    """Randomized sweep over snapshots, op mixes (inserts, deletes, full and
    TOAST-partial updates, cross-group moves, feed-born keys), k, and slack
    — including m == k (every in-window retraction dirties) and heavy value
    ties (the (v DESC, key ASC) trim boundary). The maintained view must
    equal the from-scratch ranked top-k of the applied snapshot."""
    from pyspark.sql import Window as W

    from pgcapture_spark.operators.apply import cdc_apply
    from pgcapture_spark.operators.incremental import cents_col

    snap_rows, ops, k, m = case
    snap = spark.createDataFrame(snap_rows, "k bigint, g int, v double")
    feed = _feed_rows(spark, ops)
    got = {
        (r["g"], r["rk"]): (r["k"], r["v"])
        for r in ivm_topk_view(snap, feed, "k", "g", "v", ["g", "v"], k=k, m=m).collect()
    }
    applied = cdc_apply(snap, feed, "k", ["g", "v"])
    w = W.partitionBy("g").orderBy(cents_col(F.col("v")).desc(), F.col("k").asc())
    expected = {
        (r["g"], r["rk"]): (r["k"], r["v"])
        for r in applied.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select("g", "rk", "k", cents_col(F.col("v")).alias("v"))
        .collect()
    }
    assert got == expected, f"k={k} m={m} ops={ops} snap={snap_rows}"


def test_topk_rejects_window_smaller_than_k(spark):
    """m < k can never certify a top-k (every touched group would rescan) —
    always a caller bug, rejected loudly."""
    import pytest

    with pytest.raises(ValueError, match="must be >= k"):
        _run(
            spark,
            [(1, 0, 9.0)],
            [(100, "DELETE", "k", 1, None, None)],
            k=3,
            m=2,
        )
