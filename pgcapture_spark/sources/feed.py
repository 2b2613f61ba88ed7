"""CDC feed as a streaming source.

The reference's source is a replication slot / Pulsar topic pull loop
(pkg/source/postgres.go:51-163, pkg/source/pulsar.go:38-156). The Spark-native
equivalent is any replayable ordered source consumed with ``readStream``; here
the deterministic feed is materialized to ordered parquet files (one file per
LSN range = the topic-segment analog) and consumed with the file source +
``maxFilesPerTrigger`` (the backpressure knob, mirroring the reference's
bounded channels — pkg/source/main.go:76).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession


def materialize_feed(
    feed: DataFrame, out_dir: str, n_segments: int = 8, order_col: str = "ord"
) -> None:
    """Write the feed as ``n_segments`` LSN-ordered parquet files — a durable,
    replayable log (the Pulsar-topic analog). Range-partitioning by ord keeps
    each file an LSN range, and part-file NAMES follow the range order.

    Spark's file streaming source admits files oldest-mtime-first, but a single
    parallel parquet write gives every part file the same mtime — segment order
    would be arbitrary and a transaction straddling a boundary could be applied
    out of LSN order. The log contract (totally ordered, like the reference's
    Pulsar topic — pkg/sink/pulsar.go:143 keys by LSN|seq) requires delivery in
    ord order, so stamp strictly increasing mtimes by part-file name. A real
    deployment gets this from the source's offsets (Kafka/Delta); files are the
    local-test stand-in."""
    (
        feed.repartitionByRange(n_segments, order_col)
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    parts = sorted(
        f for f in os.listdir(out_dir) if f.startswith("part-") and not f.endswith(".crc")
    )
    t0 = time.time() - 10 * len(parts)
    for i, name in enumerate(parts):
        ts = t0 + 10 * i
        os.utime(os.path.join(out_dir, name), (ts, ts))


def write_segments(pieces: list[DataFrame], feed_dir: str) -> None:
    """Write each piece as ONE parquet segment (``seg-%03d``) with strictly
    increasing mtimes — the same log contract as :func:`materialize_feed`
    (delivery in segment order), but with CALLER-CHOSEN piece boundaries.
    Unlike ``repartitionByRange`` (sampled split points), explicit pieces
    split at boundaries an oracle can name — e.g. ord quartiles via
    ``percentile_disc``, so a DuckDB side can reproduce exactly which events
    each micro-batch carried (the AS-OF fixtures need this)."""
    import shutil
    import tempfile

    os.makedirs(feed_dir, exist_ok=True)
    tmp_root = tempfile.mkdtemp(prefix="pgcs_seg_")
    try:
        n = len(pieces)
        t0 = time.time() - 10 * (n + 1)
        for idx, df in enumerate(pieces):
            tmp = os.path.join(tmp_root, f"piece{idx}")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(
                f for f in os.listdir(tmp)
                if f.startswith("part-") and f.endswith(".parquet")
            )
            dst = os.path.join(feed_dir, f"seg-{idx:03d}.parquet")
            shutil.move(os.path.join(tmp, part), dst)
            ts = t0 + 10 * idx
            os.utime(dst, (ts, ts))
    finally:
        import shutil as _sh

        _sh.rmtree(tmp_root, ignore_errors=True)


def ord_quartile_bounds(feed: DataFrame, order_col: str = "ord") -> list[int]:
    """Exact ord quartile boundaries (3 percentile_disc scalars + max — ONE
    tiny aggregate job). percentile_disc picks actual ord values, so DuckDB's
    percentile_disc names the same boundaries on the same feed."""
    from pyspark.sql import functions as F

    row = feed.agg(
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY {order_col})"
            ).alias(f"p{i}")
            for i, p in enumerate((0.25, 0.5, 0.75))
        ],
        F.max(order_col).alias("p3"),
    ).collect()[0]
    return [int(row[i]) for i in range(4)]


def compact_log(
    spark: SparkSession,
    log_dir: str,
    n_segments: int = 4,
    key_cols: tuple[str, ...] = ("lsn", "seq"),
    order_col: str = "ord",
) -> tuple[int, int]:
    """Offline log compaction by checkpoint key — the engine's Pulsar
    topic-compaction analog (message key = LSN|seq, pkg/sink/pulsar.go:143):
    re-delivered events collapse to one record per ``(lsn, seq)`` and the
    segment files are rewritten fewer and ordered. Single-writer maintenance
    (the reference's compaction also runs broker-side, not under concurrent
    appends). Returns (rows_before, rows_after)."""
    import shutil

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.read.parquet(log_dir)
    before = df.count()
    # keep the LATEST record per key (row_number over ord desc), matching topic
    # compaction semantics — dropDuplicates would keep an arbitrary one
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    compacted = (
        df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )
    tmp = log_dir.rstrip("/") + ".compacting"
    materialize_feed(compacted, tmp, n_segments=n_segments, order_col=order_col)
    after = spark.read.parquet(tmp).count()
    # crash-safe swap: park the live segments in a backup subdir (rename, not
    # delete), install the compacted files, then drop the backup — a crash
    # mid-swap leaves every record recoverable from backup + tmp.
    # _commit_* markers stay in place: they are the stream writer's replay
    # gate, and removing them would let an in-flight batch replay re-append
    # rows that were just compacted (duplicates until the next compaction).
    backup = log_dir.rstrip("/") + ".precompact"
    shutil.rmtree(backup, ignore_errors=True)
    os.makedirs(backup)
    for name in os.listdir(log_dir):
        p = os.path.join(log_dir, name)
        if name.startswith(("part-", "_SUCCESS")) and os.path.isfile(p):
            os.replace(p, os.path.join(backup, name))
    for name in sorted(os.listdir(tmp)):
        if name.startswith("part-"):
            os.replace(os.path.join(tmp, name), os.path.join(log_dir, name))
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(backup, ignore_errors=True)
    return before, after


def read_feed_stream(
    spark: SparkSession, feed_dir: str, schema, max_files_per_trigger: int = 1
) -> DataFrame:
    """Consume the materialized feed as a stream, a few segments per
    micro-batch."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(feed_dir)
    )


# ------------------------------------------------- fixture-edge log cache

# The wire/feed log a consumer query reads is an INPUT, not part of the work
# under test: the reference's consumer benchmarks read a Pulsar topic that
# already exists (pkg/source/pulsar.go pull loop), they never re-encode it.
# Synthesize + materialize each derived log ONCE per (kind, sf_dir) per
# process so repeated invocations (bench double passes, test retries)
# measure CONSUMPTION. Keys include sf_dir, so different scale tiers never
# collide; the builders are deterministic, so reuse is value-identical.
_FIXTURE_CACHE: dict[tuple[str, str], str | list[str]] = {}


def cached_fixture_parquet(spark: SparkSession, sf_dir: str, kind: str, build):
    """Plain-parquet variant: returns the cached DataFrame."""
    import tempfile

    key = (kind, os.path.abspath(sf_dir))
    d = _FIXTURE_CACHE.get(key)
    if d is None or not os.path.isdir(d):
        root = tempfile.mkdtemp(prefix=f"pgcs_fixcache_{kind}_")
        d = os.path.join(root, "data")
        build().write.mode("overwrite").parquet(d)
        _FIXTURE_CACHE[key] = d
    return spark.read.parquet(d)


def cached_fixture_parquet_tuple(spark: SparkSession, sf_dir: str, kind: str, build, n: int):
    """Multi-output variant: ``build()`` returns a tuple of ``n`` DataFrames
    that share expensive upstream synthesis — ONE builder invocation writes
    all ``n`` on a cold cache (three separate single-output caches would each
    re-run the shared synthesis)."""
    import tempfile

    key = (f"tuple:{kind}:{n}", os.path.abspath(sf_dir))
    dirs = _FIXTURE_CACHE.get(key)
    if dirs is None or not all(os.path.isdir(d) for d in dirs):
        root = tempfile.mkdtemp(prefix=f"pgcs_fixcache_{kind}_")
        dfs = build()
        assert len(dfs) == n
        dirs = []
        for i, df in enumerate(dfs):
            d = os.path.join(root, f"d{i}")
            df.write.mode("overwrite").parquet(d)
            dirs.append(d)
        _FIXTURE_CACHE[key] = dirs
    return tuple(spark.read.parquet(d) for d in dirs)


def cached_fixture_segments(
    spark: SparkSession,
    sf_dir: str,
    kind: str,
    build,
    n_segments: int = 6,
    order_col: str = "ord",
) -> str:
    """Ordered-segment variant (for readStream consumers): returns the log
    directory path."""
    import tempfile

    key = (f"seg:{kind}:{n_segments}:{order_col}", os.path.abspath(sf_dir))
    d = _FIXTURE_CACHE.get(key)
    if d is None or not os.path.isdir(d):
        root = tempfile.mkdtemp(prefix=f"pgcs_segcache_{kind}_")
        d = os.path.join(root, "log")
        materialize_feed(build(), d, n_segments=n_segments, order_col=order_col)
        _FIXTURE_CACHE[key] = d
    return d


def cached_fixture_pieces(spark: SparkSession, sf_dir: str, kind: str, build) -> str:
    """CALLER-CHOSEN piece boundaries variant of ``cached_fixture_segments``
    (the AS-OF / interleave fixtures split at exact ord quartiles or inject
    dump-chunk segments — boundaries ``materialize_feed``'s range split can't
    express). ``build`` returns ``(pieces, cleanup)``: the ordered list of
    piece DataFrames and a cleanup callable (or None) invoked after the
    segments are written — builders persist their source feed so the
    per-piece writes don't recompute the whole synthesized feed once per
    piece. The log is an INPUT (fixture edge): synthesized once per
    (kind, sf_dir) per process so repeated invocations measure CONSUMPTION,
    the same contract as ``cached_fixture_segments``."""
    import tempfile

    key = (f"pieces:{kind}", os.path.abspath(sf_dir))
    d = _FIXTURE_CACHE.get(key)
    if d is None or not os.path.isdir(d):
        root = tempfile.mkdtemp(prefix=f"pgcs_segcache_{kind}_")
        d = os.path.join(root, "log")
        pieces, cleanup = build()
        try:
            write_segments(pieces, d)
        finally:
            if cleanup is not None:
                cleanup()
        _FIXTURE_CACHE[key] = d
    return d
