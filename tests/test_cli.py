"""CLI smoke: the capture → apply pipeline driven through the command surface
(the engine's pg2pulsar / pulsar2pg analog) must converge to the batch apply."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from pgcapture_spark.catalog import CDC_COLS
from pgcapture_spark.cli import main
from pgcapture_spark.operators.apply import cdc_apply
from pgcapture_spark.queries import _feed
from tests.conftest import SF_SMALL


@pytest.fixture(autouse=True)
def _restore_sql_confs(spark):
    """cli.main() calls get_spark() with CLI-default confs; getOrCreate
    MUTATES the runtime SQL confs of the suite's shared session (master is
    fixed, SQL confs are not), silently flipping shuffle.partitions 8 → 32
    for every test that runs after this module (r10 opt round root-cause).
    Snapshot and restore the confs get_spark sets so the suite's session
    config is order-independent."""
    keys = ["spark.sql.shuffle.partitions"]
    saved = {k: spark.conf.get(k) for k in keys}
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)


def test_cli_capture_then_apply(spark):
    d = tempfile.mkdtemp(prefix="pgcs_cli_test_")
    feed = _feed(spark, SF_SMALL, "customer")
    feed.write.mode("overwrite").parquet(f"{d}/feed_in")
    snapshot = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    snapshot.write.mode("overwrite").parquet(f"{d}/snapshot")

    assert main([
        "capture", "--feed-dir", f"{d}/feed_in", "--log-dir", f"{d}/log",
        "--segments", "4",
    ]) == 0
    assert main([
        "apply", "--log-dir", f"{d}/log", "--snapshot", f"{d}/snapshot",
        "--state-dir", f"{d}/state", "--key", "c_custkey",
        "--cols", ",".join(CDC_COLS["customer"]),
    ]) == 0

    from pgcapture_spark.streaming.state import SnapshotState

    got = {
        r["c_custkey"]: (r["c_name"], r["c_acctbal"])
        for r in SnapshotState(spark, f"{d}/state").read().collect()
    }
    want = {
        r["c_custkey"]: (r["c_name"], r["c_acctbal"])
        for r in cdc_apply(snapshot, feed, "c_custkey", CDC_COLS["customer"]).collect()
    }
    assert got == want


def test_cli_backfill(spark):
    d = tempfile.mkdtemp(prefix="pgcs_cli_bf_")
    feed = _feed(spark, SF_SMALL, "customer")
    feed.write.mode("overwrite").parquet(f"{d}/log")
    snapshot = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    snapshot.write.mode("overwrite").parquet(f"{d}/snapshot")

    assert main([
        "backfill", "--snapshot", f"{d}/snapshot", "--log-dir", f"{d}/log",
        "--state-dir", f"{d}/state", "--key", "c_custkey",
        "--cols", ",".join(CDC_COLS["customer"]),
    ]) == 0

    got = spark.read.parquet(f"{d}/state")
    want = cdc_apply(snapshot, feed, "c_custkey", CDC_COLS["customer"])
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_cli_compact(spark, tmp_path=None):
    import os
    import shutil
    import tempfile

    from pgcapture_spark.catalog import register_views
    from pgcapture_spark.cli import main
    from pgcapture_spark.queries import _feed
    from pgcapture_spark.sources.feed import materialize_feed
    from tests.conftest import SF_SMALL

    d = tempfile.mkdtemp(prefix="pgcs_cli_compact_")
    try:
        register_views(spark, SF_SMALL, ("customer",))
        feed = _feed(spark, SF_SMALL, "customer")
        src = f"{d}/src"
        materialize_feed(feed, src, n_segments=3)
        log = f"{d}/log"
        os.makedirs(log)
        for i, f in enumerate(sorted(os.listdir(src))):
            if f.startswith("part-"):
                shutil.copy(f"{src}/{f}", f"{log}/part-s{i:012d}-00000.parquet")
                shutil.copy(f"{src}/{f}", f"{log}/part-s{100 + i:012d}-00000.parquet")
        n = feed.count()
        assert spark.read.parquet(log).count() == 2 * n
        assert main(["compact", "--log-dir", log]) == 0
        assert spark.read.parquet(log).count() == n
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_cli_select(spark, capsys):
    d = tempfile.mkdtemp(prefix="pgcs_cli_sel_")
    from pgcapture_spark.operators.textstats import corpus_select

    docs_path = f"{SF_SMALL}/documents.parquet"
    assert main([
        "select", "--docs", docs_path, "--out-dir", f"{d}/sel",
        "--min-quality", "0.5", "--min-tokens", "20", "--langs", "en,de",
    ]) == 0
    got = spark.read.parquet(f"{d}/sel")
    want = corpus_select(spark.read.parquet(docs_path))
    assert got.count() == want.count() > 0
    assert got.select("doc_id").exceptAll(want.select("doc_id")).count() == 0
    out = capsys.readouterr().out
    assert "selected" in out and "exact-dedup" in out


def test_cli_ann_tune(capsys):
    assert main(["ann-tune", "--sf-dir", SF_SMALL]) == 0
    out = capsys.readouterr().out
    assert "recall@3" in out
    # all three families at their parameter points
    for frag in ("signlsh", "nbits=4", "ivf", "nprobe=2", "pq", "m=8"):
        assert frag in out, out


def test_cli_stats(capsys):
    docs_path = f"{SF_SMALL}/documents.parquet"
    assert main(["stats", "--docs", docs_path]) == 0
    out = capsys.readouterr().out
    assert "lang" in out and "med_tok" in out
    assert any(line.startswith("en") for line in out.splitlines())


def test_cli_mix(spark, capsys):
    import shutil
    import tempfile

    from pgcapture_spark.operators.textstats import mix_sample

    d = tempfile.mkdtemp(prefix="pgcs_cli_mix_")
    try:
        docs_path = f"{SF_SMALL}/documents.parquet"
        assert main(["mix", "--docs", docs_path, "--out-dir", f"{d}/mix"]) == 0
        got = spark.read.parquet(f"{d}/mix")
        want = mix_sample(spark.read.parquet(docs_path))
        assert got.count() == want.count() > 0
        out = capsys.readouterr().out
        assert "sampled" in out
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_cli_export(spark, capsys):
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="pgcs_cli_export_")
    try:
        docs_path = f"{SF_SMALL}/documents.parquet"
        assert main(["export", "--docs", docs_path, "--out-dir", f"{d}/exp"]) == 0
        got = spark.read.parquet(f"{d}/exp")
        # batches must never split across shards
        assert (
            got.groupBy("batch_id").agg(F.countDistinct("shard").alias("ns"))
            .where("ns > 1").count() == 0
        )
        assert "exported" in capsys.readouterr().out
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_cli_interleave(spark, capsys):
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="pgcs_cli_il_")
    try:
        docs_path = f"{SF_SMALL}/documents.parquet"
        assert main(["interleave", "--docs", docs_path, "--out-dir", f"{d}/il"]) == 0
        got = spark.read.parquet(f"{d}/il")
        n = got.count()
        # global_pos is a permutation of 0..n-1
        assert got.select("global_pos").distinct().count() == n
        assert got.agg(F.min("global_pos"), F.max("global_pos")).first() == (0, n - 1)
        assert "training order" in capsys.readouterr().out
    finally:
        shutil.rmtree(d, ignore_errors=True)
