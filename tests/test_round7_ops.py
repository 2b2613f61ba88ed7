"""Round-7 wave contracts: the non-abelian IVM cases (min/max support-row
algebra + bounded dirty rescan; COUNT DISTINCT support table), the star-view
rollup, and the schema-evolving bucketed apply's interaction pieces. The
oracle-parity sweep (tests/test_oracle_parity.py) checks every wave query
against DuckDB at sf0.001; these tests pin the semantics the oracle can't
see — that the dirty path actually fires and resolves exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from pgcapture_spark.operators.ivm import ivm_distinct_view
from pgcapture_spark.operators.ivm_minmax import ivm_minmax_view, minmax_support


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k bigint, g int, v double")


def _feed_rows(spark, rows):
    # (ord, op, present, k, g, v)
    return spark.createDataFrame(
        rows, "ord bigint, op string, present string, k bigint, g int, v double"
    )


def _run(spark, snap_rows, feed_rows):
    snap = _mk(spark, snap_rows)
    feed = _feed_rows(spark, feed_rows)
    return {
        r["g"]: (r["n_rows"], r["min_cents"], r["max_cents"])
        for r in ivm_minmax_view(snap, feed, "k", "g", "v", ["g", "v"]).collect()
    }


def test_minmax_delete_of_exhausted_min_rescans_to_second_smallest(spark):
    """The hard case: the ONLY row at the min is deleted, no add replaces it
    — support algebra cannot know the runner-up, the dirty rescan must find
    it among survivors."""
    got = _run(
        spark,
        [(1, 0, 1.00), (2, 0, 5.00), (3, 0, 9.00)],
        [(100, "DELETE", "k", 1, None, None)],
    )
    assert got == {0: (2, 500, 900)}


def test_minmax_delete_at_min_with_duplicate_population_stays_clean(spark):
    """Two rows share the min; deleting one leaves the extreme population
    alive — decided by the support counts alone (no rescan needed for
    correctness; the result must still be exact)."""
    got = _run(
        spark,
        [(1, 0, 1.00), (2, 0, 1.00), (3, 0, 9.00)],
        [(100, "DELETE", "k", 1, None, None)],
    )
    assert got == {0: (2, 100, 900)}


def test_minmax_add_below_min_and_above_max(spark):
    got = _run(
        spark,
        [(1, 0, 5.00)],
        [
            (100, "INSERT", "k,g,v", 7, 0, 0.50),
            (200, "INSERT", "k,g,v", 8, 0, 11.00),
        ],
    )
    assert got == {0: (3, 50, 1100)}


def test_minmax_update_moves_row_between_groups(spark):
    """An UPDATE that changes the group retracts from g=0 (exhausting its
    max) and adds to g=1 — both sides must resolve."""
    got = _run(
        spark,
        [(1, 0, 5.00), (2, 0, 1.00), (3, 1, 3.00)],
        [(100, "UPDATE", "k,g,v", 1, 1, 7.00)],
    )
    assert got == {0: (1, 100, 100), 1: (2, 300, 700)}


def test_minmax_group_emptied_drops(spark):
    got = _run(
        spark,
        [(1, 0, 5.00), (2, 1, 2.00)],
        [(100, "DELETE", "k", 1, None, None)],
    )
    assert got == {1: (1, 200, 200)}


def test_minmax_new_group_from_inserts_only(spark):
    got = _run(
        spark,
        [(1, 0, 5.00)],
        [
            (100, "INSERT", "k,g,v", 7, 3, 2.00),
            (200, "INSERT", "k,g,v", 8, 3, 8.00),
        ],
    )
    assert got == {0: (1, 500, 500), 3: (2, 200, 800)}


def test_minmax_exhausted_min_replaced_by_lower_add_stays_clean(spark):
    """Min population exhausted BUT an add sits at-or-below the old min —
    conclusive without rescan."""
    got = _run(
        spark,
        [(1, 0, 1.00), (2, 0, 9.00)],
        [
            (100, "DELETE", "k", 1, None, None),
            (200, "INSERT", "k,g,v", 7, 0, 0.25),
        ],
    )
    assert got == {0: (2, 25, 900)}


def test_minmax_dirty_path_actually_fires_on_cdc_feed(spark):
    """At sf0.001 the customer feed's deletes hit several nations' extreme
    holders — the declared query must be exercising the rescan branch, not
    coasting on clean algebra. Reconstructs the classifier's dirty set and
    asserts it is non-empty."""
    from pgcapture_spark.catalog import CDC_COLS, register_views
    from pgcapture_spark.operators.incremental import cents_col
    from pgcapture_spark.operators.ivm import signed_key_delta
    from pgcapture_spark.queries import _feed
    from tests.conftest import SF_SMALL

    register_views(spark, SF_SMALL, ("customer",))
    snap = spark.table("customer")
    feed = _feed(spark, SF_SMALL, "customer")
    S = minmax_support(
        snap.select("c_nationkey", cents_col(F.col("c_acctbal")).alias("v")),
        "c_nationkey",
    )
    delta = signed_key_delta(snap, feed, "c_custkey", CDC_COLS["customer"])
    d = delta.select(
        "c_nationkey", "s", cents_col(F.col("c_acctbal")).alias("v")
    ).join(F.broadcast(S), "c_nationkey", "left")
    dd = d.groupBy("c_nationkey").agg(
        F.sum(F.when(F.col("v") == F.col("min_v"), F.col("s")).otherwise(0)).alias("dm"),
        F.min(F.when(F.col("s") == 1, F.col("v"))).alias("min_add"),
    )
    dirty = (
        dd.join(S, "c_nationkey")
        .where(
            (F.col("cnt_min") + F.col("dm") <= 0)
            & (F.col("min_add").isNull() | (F.col("min_add") > F.col("min_v")))
        )
        .count()
    )
    assert dirty > 0


def test_minmax_stream_crash_resume_and_touched_reads_only(spark):
    """Streamed min/max on the tri-table bucketed state: kill after the
    first committed batch, resume the same checkpoint — converges to the
    from-scratch aggregate; every per-batch read is a strict bucket subset
    (never a full-state materialization)."""
    import shutil
    import tempfile
    import time

    from pgcapture_spark.catalog import CDC_COLS, register_views
    from pgcapture_spark.operators.apply import cdc_apply
    from pgcapture_spark.operators.incremental import cents_col
    from pgcapture_spark.queries import _feed
    from pgcapture_spark.sources.feed import materialize_feed, read_feed_stream
    from pgcapture_spark.streaming.multi import BucketedMultiTableState
    from pgcapture_spark.streaming.mv import minmax_stream
    from tests.conftest import SF_SMALL
    from tests.test_streaming import _RecordingMultiState

    register_views(spark, SF_SMALL, ("customer",))
    snap = spark.table("customer")
    feed = _feed(spark, SF_SMALL, "customer")
    applied = cdc_apply(snap, feed, "c_custkey", CDC_COLS["customer"])
    expected = applied.groupBy("c_nationkey").agg(
        F.count("*").alias("n_rows"),
        F.min(cents_col(F.col("c_acctbal"))).alias("min_cents"),
        F.max(cents_col(F.col("c_acctbal"))).alias("max_cents"),
    )
    d = tempfile.mkdtemp(prefix="pgcs_t_minmaxstream_")
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
            return minmax_stream(
                read_feed_stream(spark, f"{d}/feed", schema, max_files_per_trigger=1),
                st, snap, "c_custkey", "c_nationkey", "c_acctbal",
                CDC_COLS["customer"], ckpt,
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

        sup = mk_state().read()["support"]
        got = sup.select(
            "c_nationkey",
            F.col("n").alias("n_rows"),
            F.col("min_v").alias("min_cents"),
            F.col("max_v").alias("max_cents"),
        )
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_distinct_view_null_values_count_rows_not_distinct(spark):
    snap = spark.createDataFrame(
        [(1, 0, "A"), (2, 0, "B"), (3, 0, None), (4, 1, "A")],
        "k bigint, g int, v string",
    )
    feed = spark.createDataFrame(
        [
            # UPDATE key 2 to NULL v (explicit set): g0 loses value B
            (100, "UPDATE", "k,v", 2, None, None),
            # INSERT a new value in g1
            (200, "INSERT", "k,g,v", 9, 1, "C"),
            # DELETE the only NULL row in g0
            (300, "DELETE", "k", 3, None, None),
        ],
        "ord bigint, op string, present string, k bigint, g int, v string",
    )
    got = {
        r["g"]: (r["n_distinct"], r["n_rows"])
        for r in ivm_distinct_view(snap, feed, "k", "g", "v", ["g", "v"]).collect()
    }
    # g0: rows {1:A, 2:NULL} -> distinct 1, rows 2; g1: {4:A, 9:C} -> 2, 2
    assert got == {0: (1, 2), 1: (2, 2)}


# --------------------------------------------------------- property sweep

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _minmax_case(draw):
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
            key = draw(st.integers(1, max(1, next_key - 1)))
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
    return snap, ops


@settings(max_examples=12, deadline=None)
@given(case=_minmax_case())
def test_minmax_property_converges_to_from_scratch(spark, case):
    """Randomized sweep over snapshots and op mixes (inserts, deletes, full
    and TOAST-partial updates, cross-group moves, feed-born keys, duplicate
    extreme populations by construction of the small value domain): the
    support-algebra view must equal the from-scratch min/max/count of the
    applied snapshot."""
    from pgcapture_spark.operators.apply import cdc_apply
    from pgcapture_spark.operators.incremental import cents_col

    snap_rows, ops = case
    snap = spark.createDataFrame(snap_rows, "k bigint, g int, v double")
    feed = _feed_rows(spark, ops)
    got = {
        r["g"]: (r["n_rows"], r["min_cents"], r["max_cents"])
        for r in ivm_minmax_view(snap, feed, "k", "g", "v", ["g", "v"]).collect()
    }
    applied = cdc_apply(snap, feed, "k", ["g", "v"])
    expected = {
        r["g"]: (r["n_rows"], r["min_cents"], r["max_cents"])
        for r in applied.groupBy("g")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(cents_col(F.col("v"))).alias("min_cents"),
            F.max(cents_col(F.col("v"))).alias("max_cents"),
        )
        .collect()
    }
    assert got == expected, f"ops={ops} snap={snap_rows}"


def test_kmv_streamed_state_is_k_bounded_and_converges(spark, tmpdir):
    """The streamed KMV consumer's state must stay <= k rows per group
    forever (the mergeable-summaries bound) and the converged sketch must
    equal the batch estimator's bit-for-bit (same explicit permutation
    hash, shared kmv_finalize)."""
    from pgcapture_spark.operators.kmv import kmv_estimates
    from pgcapture_spark.queries import REGISTRY
    from tests.conftest import SF_SMALL

    got = REGISTRY["agg_kmv_distinct_streamed"].fn(spark, SF_SMALL)
    ev = spark.table("events").where(F.col("event_id").isNotNull())
    expected = kmv_estimates(ev, "event_type", "event_id", k=64)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
    # the bit-identical match to the batch sketch IS the k-bound proof:
    # a state row beyond each group's k smallest would change kth_min


def test_ivm_star_stream_fifth_table_converges_and_reads_slices_only(spark):
    """The star-grain table rides ivm_join_stream's fold as a FIFTH state
    table: converges to the batch ivm_star_view result, advances under the
    same atomic manifest, and its per-batch reads are strict bucket
    subsets like every other table's."""
    import shutil
    import tempfile

    from pgcapture_spark.catalog import CDC_COLS, register_views
    from pgcapture_spark.fixtures.cdc_feed import SPARK, multi_feed_sql
    from pgcapture_spark.queries import REGISTRY, _feed
    from pgcapture_spark.sources.feed import materialize_feed, read_feed_stream
    from pgcapture_spark.streaming.multi import BucketedMultiTableState
    from pgcapture_spark.streaming.mv import ivm_join_stream
    from tests.conftest import SF_SMALL
    from tests.test_streaming import _RecordingMultiState

    register_views(spark, SF_SMALL, ("customer", "orders", "nation", "region"))
    expected = REGISTRY["cdc_ivm_starjoin_view"].fn(spark, SF_SMALL)
    orders, customer = spark.table("orders"), spark.table("customer")
    dims = (
        spark.table("nation")
        .join(spark.table("region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("c_nationkey"), "r_name")
    )
    d = tempfile.mkdtemp(prefix="pgcs_t_starstream_")
    n_buckets = 64
    try:
        feed = spark.sql(multi_feed_sql(SPARK))
        materialize_feed(feed, f"{d}/feed", n_segments=4)
        schema = spark.read.parquet(f"{d}/feed").schema
        def mk_state():
            return BucketedMultiTableState(
                spark,
                f"{d}/state",
                ["orders", "customer", "orders_ck", "mv", "mv_star"],
                {
                    "orders": "o_orderkey",
                    "customer": "c_custkey",
                    "orders_ck": "o_custkey",
                    "mv": "c_nationkey",
                    "mv_star": "r_name",
                },
                n_buckets=n_buckets,
            )

        state = _RecordingMultiState(mk_state())
        q = ivm_join_stream(
            read_feed_stream(spark, f"{d}/feed", schema, max_files_per_trigger=1),
            state, orders, customer,
            CDC_COLS["orders"], CDC_COLS["customer"], f"{d}/ckpt",
            star_dims=dims,
        )
        q.awaitTermination(300)
        got = mk_state().read()["mv_star"]
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0
        assert state.full_reads == 0
        star_reads = [b for t, b in state.read_calls if t == "mv_star"]
        assert star_reads and all(0 < len(b) < n_buckets for b in star_reads)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_kcore_peel_known_graph_and_nonconvergence_guard(spark):
    """Hand-checkable peel: a triangle survives the 2-core, a pendant chain
    peels away transitively (needing >1 round); a rounds bound too small
    fails loudly instead of returning the intermediate state."""
    import pytest

    from pgcapture_spark.operators.kcore import kcore_peel

    # triangle 1-2-3 + chain 3-4-5 (4 and 5 peel in successive rounds)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], "a bigint, b bigint"
    )
    got = {
        (r["node"], r["core_degree"]) for r in kcore_peel(edges, k=2).collect()
    }
    assert got == {(1, 2), (2, 2), (3, 2)}
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore_peel(edges, k=2, rounds=1)


def test_mutual_edges_keeps_reciprocal_pairs_only(spark):
    from pgcapture_spark.operators.kcore import mutual_edges

    directed = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (4, 2), (2, 4), (4, 2)],
        "src_id bigint, dst_id bigint",
    )
    got = {(r["a"], r["b"]) for r in mutual_edges(directed).collect()}
    assert got == {(1, 2), (2, 4)}
