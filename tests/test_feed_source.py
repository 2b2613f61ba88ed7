"""The ``pgcapture_feed`` Python Data Source: batch and streaming reads must
deliver exactly the materialized log, in segment (= LSN-range) order per
trigger, and the apply pipeline over it must converge to the batch apply."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pgcapture_spark.catalog import CDC_COLS, register_views
from pgcapture_spark.operators.apply import cdc_apply
from pgcapture_spark.queries import _feed
from pgcapture_spark.sources.feed import materialize_feed
from pgcapture_spark.sources.feed_source import FeedDataSource
from tests.conftest import SF_SMALL


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="pgcs_fsrc_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def feed_dir(spark, tmpdir):
    register_views(spark, SF_SMALL, ("customer",))
    feed = _feed(spark, SF_SMALL, "customer")
    d = f"{tmpdir}/feed"
    materialize_feed(feed, d, n_segments=4)
    spark.dataSource.register(FeedDataSource)
    return d


def test_batch_read_equals_parquet(spark, feed_dir):
    via_source = spark.read.format("pgcapture_feed").option("path", feed_dir).load()
    direct = spark.read.parquet(feed_dir)
    # nullability flags may differ (arrow keeps parquet required-ness, Spark's
    # native reader relaxes to nullable) — names and types must agree
    assert [(f.name, f.dataType) for f in via_source.schema] == [
        (f.name, f.dataType) for f in direct.schema
    ]
    assert via_source.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_source).count() == 0


def test_stream_apply_over_source_converges(spark, feed_dir, tmpdir):
    from pgcapture_spark.streaming.pipeline import apply_stream
    from pgcapture_spark.streaming.state import SnapshotState

    snapshot = spark.table("customer")
    feed = _feed(spark, SF_SMALL, "customer")
    expected = cdc_apply(snapshot, feed, "c_custkey", CDC_COLS["customer"])

    stream = (
        spark.readStream.format("pgcapture_feed")
        .option("path", feed_dir)
        .option("maxFilesPerTrigger", "2")
        .load()
    )
    state = SnapshotState(spark, f"{tmpdir}/state")
    batches: list[int] = []
    q = apply_stream(
        stream,
        state,
        snapshot,
        "c_custkey",
        CDC_COLS["customer"],
        f"{tmpdir}/ckpt",
        on_batch=lambda bid, n: batches.append(bid),
        available_now=False,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(batches) >= 2, "maxFilesPerTrigger=2 over 4 segments -> >=2 batches"
    final = state.read()
    assert final.exceptAll(expected).count() == 0
    assert expected.exceptAll(final).count() == 0


def test_stream_writer_log_append_round_trip(spark, feed_dir, tmpdir):
    """readStream(pgcapture_feed) → writeStream(pgcapture_feed): the log-append
    sink persists exactly the input segments' rows, with per-batch commit
    markers (no partial/staged files visible)."""
    import os

    out_dir = f"{tmpdir}/log"
    os.makedirs(out_dir, exist_ok=True)
    stream = (
        spark.readStream.format("pgcapture_feed")
        .option("path", feed_dir)
        .option("maxFilesPerTrigger", "2")
        .load()
    )
    q = (
        stream.writeStream.format("pgcapture_feed")
        .option("path", out_dir)
        .option("checkpointLocation", f"{tmpdir}/wckpt")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    markers = [f for f in os.listdir(out_dir) if f.startswith("_commit_")]
    assert len(markers) >= 2, "expected >=2 committed micro-batches"
    assert not os.listdir(os.path.join(out_dir, ".staging")), "staging must drain"
    written = spark.read.format("pgcapture_feed").option("path", out_dir).load()
    direct = spark.read.parquet(feed_dir)
    assert written.exceptAll(direct).count() == 0
    assert direct.exceptAll(written).count() == 0


def test_batch_read_filter_pushdown(spark, feed_dir):
    """Comparison predicates reach the pyarrow scan (row-group pruning) and
    results stay correct — the resume-filter shape `lsn > X` (S4)."""
    direct = spark.read.parquet(feed_dir)
    cut = direct.selectExpr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lsn)").first()[0]
    via = (
        spark.read.format("pgcapture_feed")
        .option("path", feed_dir)
        .load()
        .where(f"lsn > {cut} AND op = 'UPDATE'")
    )
    exp = direct.where(f"lsn > {cut} AND op = 'UPDATE'")
    assert via.count() == exp.count() > 0
    assert via.exceptAll(exp).count() == 0


def test_sink_dedupes_across_writer_lineages(spark, feed_dir, tmpdir):
    """Two independent sink runs re-deliver the same batchIds with IDENTICAL
    content; the fingerprinted commit markers recognize the replay and drop
    the second run — producer dedup persists across restarts (the Pulsar
    LSN-derived sequence-id model, pkg/sink/pulsar.go), so the log is NOT
    doubled. (A second lineage with different content fails loudly instead —
    see test_sink_foreign_lineage_fails_loudly.)"""
    import os

    out_dir = f"{tmpdir}/log"
    os.makedirs(out_dir, exist_ok=True)
    for i in range(2):
        q = (
            spark.readStream.format("pgcapture_feed")
            .option("path", feed_dir)
            .option("maxFilesPerTrigger", "4")
            .load()
            .writeStream.format("pgcapture_feed")
            .option("path", out_dir)
            .option("checkpointLocation", f"{tmpdir}/ck{i}")
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    feed = spark.read.parquet(feed_dir)
    n = feed.count()
    assert spark.read.parquet(out_dir).count() == n
    assert not os.listdir(os.path.join(out_dir, ".staging")), "staging must drain"


def test_sink_foreign_lineage_fails_loudly(spark, feed_dir, tmpdir):
    """A DIFFERENT writer lineage on the same log dir (fresh checkpoint →
    batchIds restart at 0) delivering DIFFERENT content must fail loudly at
    commit, not be silently discarded by the first lineage's markers — a
    common ops mistake (deleting the checkpoint to reprocess) should surface
    as an error, not data loss."""
    import os

    from pyspark.errors import StreamingQueryException

    out_dir = f"{tmpdir}/log"
    os.makedirs(out_dir, exist_ok=True)

    def run(ckpt: str, transform):
        src = (
            spark.readStream.format("pgcapture_feed")
            .option("path", feed_dir)
            .option("maxFilesPerTrigger", "4")
            .load()
        )
        q = (
            transform(src)
            .writeStream.format("pgcapture_feed")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(f"{tmpdir}/ck0", lambda df: df)
    n = spark.read.parquet(feed_dir).count()
    assert spark.read.parquet(out_dir).count() == n
    with pytest.raises(StreamingQueryException, match="different content fingerprint"):
        run(f"{tmpdir}/ck1", lambda df: df.where("op = 'UPDATE'"))
    # the foreign lineage must not have corrupted the log
    assert spark.read.parquet(out_dir).count() == n


def test_log_compaction_collapses_redelivery(spark, feed_dir, tmpdir):
    """A log holding duplicated records (e.g. upstream re-sent below the sink's
    marker horizon) compacts back to ONE record per (lsn, seq), keeping the
    LATEST per key — topic-compaction semantics (pkg/sink/pulsar.go:143)."""
    import os
    import shutil

    from pgcapture_spark.sources.feed import compact_log

    out_dir = f"{tmpdir}/log"
    os.makedirs(out_dir, exist_ok=True)
    # double the log directly: same segments under two name epochs
    for i, f in enumerate(sorted(os.listdir(feed_dir))):
        if not f.startswith("part-"):
            continue
        shutil.copy(f"{feed_dir}/{f}", f"{out_dir}/part-s{i:012d}-00000.parquet")
        shutil.copy(f"{feed_dir}/{f}", f"{out_dir}/part-s{1000 + i:012d}-00000.parquet")
    feed = spark.read.parquet(feed_dir)
    n = feed.count()
    assert spark.read.parquet(out_dir).count() == 2 * n
    before, after = compact_log(spark, out_dir)
    assert (before, after) == (2 * n, n)
    compacted = spark.read.format("pgcapture_feed").option("path", out_dir).load()
    assert compacted.count() == n
    assert compacted.select("lsn", "seq").distinct().count() == n


def test_compaction_preserves_commit_markers(spark, feed_dir, tmpdir):
    """compact_log rewrites part-* segments but must LEAVE the _commit_*
    markers: they are the stream writer's replay gate, and dropping them would
    let an in-flight batch replay re-append rows that were just compacted."""
    import os

    from pgcapture_spark.sources.feed import compact_log

    out_dir = f"{tmpdir}/log"
    os.makedirs(out_dir, exist_ok=True)
    q = (
        spark.readStream.format("pgcapture_feed")
        .option("path", feed_dir)
        .option("maxFilesPerTrigger", "2")
        .load()
        .writeStream.format("pgcapture_feed")
        .option("path", out_dir)
        .option("checkpointLocation", f"{tmpdir}/ck")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    markers_before = sorted(f for f in os.listdir(out_dir) if f.startswith("_commit_"))
    assert markers_before
    n = spark.read.parquet(feed_dir).count()
    before, after = compact_log(spark, out_dir)
    assert after == n
    markers_after = sorted(f for f in os.listdir(out_dir) if f.startswith("_commit_"))
    assert markers_after == markers_before, "compaction must not touch the replay gate"


def test_stream_restart_from_checkpoint_no_duplicates(spark, feed_dir, tmpdir):
    """Restart a stopped query from its checkpoint: the reader's admission
    cursor starts at 0 in the fresh instance, so without flooring it by the
    checkpointed offsets the offset log would regress and replay the whole
    log as duplicates. Also: segments appended BETWEEN the runs are read
    exactly once."""
    import os

    out = f"{tmpdir}/restart_out"
    ckpt = f"{tmpdir}/restart_ckpt"

    def run_once():
        q = (
            spark.readStream.format("pgcapture_feed")
            .option("path", feed_dir)
            .option("maxFilesPerTrigger", "1")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    n1 = spark.read.parquet(feed_dir).count()
    assert spark.read.parquet(out).count() == n1

    # append one more segment (names sort after the existing ones), restart
    extra_src = sorted(
        f for f in os.listdir(feed_dir) if f.startswith("part-") and f.endswith(".parquet")
    )[0]
    import shutil as _sh

    _sh.copy(os.path.join(feed_dir, extra_src), os.path.join(feed_dir, "part-zzz-extra.parquet"))
    extra_n = spark.read.parquet(os.path.join(feed_dir, "part-zzz-extra.parquet")).count()
    run_once()
    total = spark.read.parquet(out).count()
    assert total == n1 + extra_n, f"expected {n1}+{extra_n}, got {total} (duplicates on restart)"


def test_binary_feed_decode_is_column_pruned(spark):
    """Decode-at-the-edge laziness: selecting ONE decoded column must plan
    exactly one Python decode UDF — untouched columns' codecs are pruned
    away by Catalyst (the 100 TB binary-passthrough contract, SURVEY §4)."""
    import re

    from pgcapture_spark.operators.generic_feed import (
        CUSTOMER_FIELD_OIDS,
        decode_binary_feed,
        to_binary_feed,
    )

    register_views(spark, SF_SMALL, ("customer",))
    typed = _feed(spark, SF_SMALL, "customer")
    wire = to_binary_feed(typed, CUSTOMER_FIELD_OIDS, old_key=("old_c_custkey", "c_custkey", 20))
    decoded = decode_binary_feed(
        wire, CUSTOMER_FIELD_OIDS, old_key=("old_c_custkey", "c_custkey", 20)
    )
    narrow = decoded.select("lsn", "c_acctbal")
    plan = spark._jvm.PythonSQLUtils.explainString(narrow._jdf.queryExecution(), "formatted")
    # decode UDFs surface as pythonUDF* expressions inside ArrowEvalPython
    # nodes; the ENCODE udf (fixture edge) is one more — so the narrow plan
    # must contain exactly 2 distinct python UDF evals (1 encode + 1 decode),
    # while the full-width plan has 1 encode + 6 decodes + old-key encode
    narrow_udfs = len(set(re.findall(r"pythonUDF\d+", plan)))
    full_plan = spark._jvm.PythonSQLUtils.explainString(
        decoded._jdf.queryExecution(), "formatted"
    )
    full_udfs = len(set(re.findall(r"pythonUDF\d+", full_plan)))
    assert narrow_udfs < full_udfs, (plan, full_plan)
    assert narrow_udfs <= 2, f"expected ≤2 python UDFs in pruned plan, got {narrow_udfs}"


def test_sink_same_rowcount_foreign_lineage_fails(spark, feed_dir, tmpdir):
    """The harder foreign-lineage case: a second writer lineage delivering the
    SAME row count but DIFFERENT content (here: every seq shifted by +1000)
    must be caught by the order-independent content checksum in the commit
    marker — a bare total-row-count fingerprint would let it commit silently."""
    import os

    from pyspark.errors import StreamingQueryException

    out_dir = f"{tmpdir}/log"
    os.makedirs(out_dir, exist_ok=True)

    def run(ckpt: str, transform):
        src = (
            spark.readStream.format("pgcapture_feed")
            .option("path", feed_dir)
            .option("maxFilesPerTrigger", "4")
            .load()
        )
        q = (
            transform(src)
            .writeStream.format("pgcapture_feed")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    from pyspark.sql import functions as F

    run(f"{tmpdir}/ck0", lambda df: df)
    n = spark.read.parquet(feed_dir).count()
    assert spark.read.parquet(out_dir).count() == n
    with pytest.raises(StreamingQueryException, match="different content fingerprint"):
        run(f"{tmpdir}/ck1", lambda df: df.withColumn("seq", F.col("seq") + 1000))
    assert spark.read.parquet(out_dir).count() == n  # log not corrupted


def test_content_xsum_invariant_under_resplit():
    """The commit-marker content checksum must be identical for ANY re-split
    of the same logical rows into Arrow batches. The trap: pandas derives a
    batch's numeric dtype from that batch's VALUES (an int64 column converts
    to float64 only when the batch holds a null), so a value-level encoding
    would hash "7" in one task layout and "7.0" in another and a legitimate
    crash-replay re-split would trip the foreign-lineage guard. The checksum
    canonicalizes per Arrow TYPE, so every split sums to the same value."""
    import pyarrow as pa

    from pgcapture_spark.sources.feed_source import _content_xsum

    table = pa.table(
        {
            "k": pa.array([7, 8, None, 9], type=pa.int64()),
            "f": pa.array([1.5, None, 2.5, 3.5], type=pa.float64()),
            "s": pa.array(["a", "b", None, "d"], type=pa.string()),
            "b": pa.array([b"\xff\x00", None, b"ok", b""], type=pa.binary()),
            "arr": pa.array([[1, 2], None, [], [3]], type=pa.list_(pa.int64())),
        }
    )
    MOD = 0xFFFFFFFFFFFFFFFF

    def xsum_of_split(bounds):
        total = 0
        for lo, hi in bounds:
            for b in table.slice(lo, hi - lo).to_batches():
                total = (total + _content_xsum(b)) & MOD
        return total

    whole = xsum_of_split([(0, 4)])
    # isolate the null-bearing rows vs mix them — dtype-flip trap layouts
    assert xsum_of_split([(0, 2), (2, 4)]) == whole
    assert xsum_of_split([(0, 1), (1, 2), (2, 3), (3, 4)]) == whole
    assert xsum_of_split([(0, 3), (3, 4)]) == whole
    # and content changes still move it
    changed = pa.table(
        {
            "k": pa.array([7, 8, None, 10], type=pa.int64()),
            "f": table["f"],
            "s": table["s"],
            "b": table["b"],
            "arr": table["arr"],
        }
    )
    assert (
        sum(_content_xsum(b) for b in changed.to_batches()) & MOD
    ) != whole
