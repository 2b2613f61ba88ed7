"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what we would set on a real cluster: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), shuffle partitions
sized to cores (not the 200 default), UTC session timezone so results compare
bit-for-bit with the DuckDB oracle, and Arrow enabled for the few pandas-UDF
paths (PG binary decode, multimodal stubs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "pgcapture-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = str(shuffle_partitions or cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at Spark's default (true): byte-based
        # coalescing is blind to per-row CPU, and an in-session alternating
        # A/B (scripts/ab_conf.py, r10 opt round) showed false serializing
        # the CPU-heavy small-byte stages — cdc_apply_from_binary_feed_
        # composite 2.0 -> 4.2 s min with a 42 s bimodal outlier, and
        # cdc_compaction_execute 3.3 -> 8.2 s (the Arrow decode / compaction
        # rewrite run on ~1 coalesced partition). The scale lever for the
        # 100 TB "fewer, larger reduce partitions" goal (guide §2.2) is
        # advisoryPartitionSizeInBytes, env-overridable below; on a real
        # cluster set 64-256 MB advisory with parallelismFirst still true so
        # coalescing never drops below the cluster's parallelism floor.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "64m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the default 100-entry codegen class cache thrashes across a workload
        # of many distinct plan shapes, silently recompiling stages (measured
        # 2-3 s per large expression tree); the cache is driver-side and small
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        # the CDC apply fold is N parallel max_by(struct, ord) aggregates —
        # struct buffers force SortAggregate, and its whole-stage-generated
        # method for a wide fold blows past the JIT huge-method limit, so the
        # "generated" code runs as uncompiled bytecode: measured 2-5x SLOWER
        # than Spark's interpreted sort-agg path at both sf0.001 and sf0.1
        # (14.6s -> 3.3s on the 11-column binary composite apply). Hash
        # aggregates keep codegen; only SortAggregate opts out.
        .config("spark.sql.codegen.aggregate.sortAggregate.enabled", "false")
        # events.parquet stores TIMESTAMP(NANOS); read as long + convert in catalog.load
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # write micros, not INT96: Arrow/pyarrow readers (the pgcapture_feed
        # source) map INT96 to unsupported nanoseconds, and INT96 is deprecated
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # let the pgcapture_feed Python source receive pushed filters
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # the streamed consumers cut per-trigger lineage with
        # localCheckpoint(eager=False); those RDD blocks are freed by the
        # ContextCleaner only when a driver GC runs, so on a long-running
        # stream the default 30min periodic-GC interval lets per-trigger
        # delta blocks pool in executor storage between cycles (ADVICE r8).
        # 5min bounds the pool to a few triggers' worth of small deltas.
        .config("spark.cleaner.periodicGC.interval", "5min")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def route_tempfiles_private(prefix: str = "pgcs_proc_") -> str:
    """Route every ``tempfile.mkdtemp`` this process makes (querydef state /
    checkpoint / fixture scratch roots) under ONE fresh private directory.

    Concurrent engine processes — gate, plan audit, bench, driver replica,
    a judge's own re-runs — each create ``pgcs_q_*`` scratch dirs, and any
    prefix-glob cleanup (or same-name collision) against bare /tmp is a
    shared failure surface: the r9 gate flake was plan_audit's exit cleanup,
    running concurrently, deleting the gate's in-flight feed segments (and
    the r8 ``cdc_relation_learn`` checkpoint-dir flake was the same class).
    tests/conftest.py applies the identical routing for pytest sessions.

    Returns the root. Cleanup is registered via ``atexit`` so the scratch
    tree is removed even when the caller exits on an exception (ADVICE r9:
    happy-path-only rmtree leaked roots from crashed runs); callers may
    still rmtree it explicitly — the duplicate removal is a no-op."""
    import atexit
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix=prefix)
    tempfile.tempdir = root
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root
