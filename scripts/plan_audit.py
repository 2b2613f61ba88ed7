"""Registry-wide physical-plan audit: build (never execute) every batch
query's plan at sf0.001 and flag the two classic scale-killers — a
CartesianProduct anywhere, and any SINGLE input scanned more times than the
threshold (repeated derivation of the same table). Complements tests/test_plans.py:
the tests pin specific shapes on the critical operators; this sweep catches
a regression sneaking into any of the other ~190.

The STREAMED queries (foreachBatch bodies) can't be plan-built without
running — so they get an EXECUTED-plan sweep instead (verdict r4 task #5):
run each streamed query once at sf0.001, harvest every SQL execution it
produced from the session's SQL status store (the same formatted plan
string the Spark UI shows, including the micro-batch bodies' inner actions),
and run the identical cartesian/rescan checks over each captured plan.

Fixture-union queries (the synthetic CDC feeds union several event waves
over one source table, and sim_ann_tuning unions eight ANN variants) scan
their SOURCE many times by design — the threshold is per-query-tunable via
ALLOWED_SCANS rather than silenced, so a real regression still trips.

Usage: PYTHONPATH=. python scripts/plan_audit.py [sf_dir] [--batch-only]
Exit code 1 if anything flags.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# executor Python workers don't inherit driver sys.path mutations — they
# resolve module-by-reference pickles (the mapInPandas parsers the streamed
# sweep executes) via PYTHONPATH, so export it before the JVM starts or a
# foreign-cwd run fails only on the UDF-bearing queries (same recipe as
# scripts/driver_replica.py)
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_REPO, os.environ.get("PYTHONPATH", "")) if p
)

from pyspark.sql import SparkSession

# streamed queries run a real stream when invoked; iterative operators do
# driver-side rounds at plan-build time — both are execution, not planning,
# and are covered by their own tests instead.
SKIP_SUBSTR = ("streamed",)
SKIP = {
    "kmeans_embed", "sim_ivfpq_ann", "sim_ivf_ann", "sim_pq_adc_ann",
    "dedup_semantic", "dedup_semantic_kmeans", "sample_coreset_kcenter",
    "sim_pagerank", "sim_mmr_rerank", "sim_ood_knn_score",
    "sim_pq_train_codes", "sim_knn_graph", "graph_triangle_count",
    "cdc_log_sink_roundtrip", "cdc_log_compaction",
    "cdc_apply_customer_feedsource",
}
DEFAULT_MAX_SCANS = 4
# fixture-union shapes: many scans of the SOURCE table synthesize the feed /
# the variant union — bounded by the fixture, not the data
ALLOWED_SCANS = {
    "cdc_ddl_skipset": 100, "cdc_dead_letter_split": 40,
    "sim_ann_tuning": 20, "cdc_incremental_agg": 18,
    "cdc_frame_suppression": 14, "cdc_compaction_plan": 12,
    "cdc_apply_customer": 10, "cdc_feed_customer": 8,
    # multi-regional / two-point fixtures derive several feeds from one table
    "cdc_multi_source_lww": 18, "cdc_snapshot_diff": 18,
    "events_pit_scd2_join": 8, "backfill_watermark_guard": 8,
    "backfill_union_merge": 8,
    # measured: caching the shared derivations in these is SLOWER than the
    # codegen-pipelined re-scans at bench scale (see dedup.py's
    # lsh_candidate_pairs note; same alternating-A/B result for the bigram
    # LM's vocab-sized unigram table, 1.3s -> 1.7s persisted at sf0.1)
    "dedup_lsh_eval": 8, "text_bigram_surprisal": 6,
    # the percentile gauntlet's arms each scan by design (contract test)
    "agg_percentile_contract": 6,
    # CCNet terciles: LM build + threshold quantiles + scoring arms each
    # re-derive the token stream (same measured re-scan-beats-cache result)
    "corpus_perplexity_buckets": 8,
    # the IVM batch views lineage-cut their signed deltas (lazy
    # localCheckpoint — see ivm.ivm_join_view's note), so every delta
    # reference plans against a leaf and the formatted explain shows 1-2
    # base scans; they ride the cdc_ BLANKET now (re-measured after the
    # cut: join 2, minmax 2, starjoin 2, distinct 1, topk 1)
}
BLANKET = 8  # everything CDC-feed-derived scans its source ~5-8x

# per-execution scan limit for streamed queries' inner plans: a micro-batch
# body reads its wire segment + persisted state/registry parquet a handful
# of times (snapshot fold = read + union + max_by over one state file); the
# fixture-build executions (feed synthesis) reuse the batch allowances above
STREAMED_MAX_SCANS = 8
STREAMED_ALLOWED = {
    # fixture synthesis inside the first run derives several waves from the
    # source table (same shape as the batch-side ALLOWED_SCANS entries)
    "cdc_apply_customer_streamed": 10,
    "cdc_apply_multi_streamed": 18,
    "cdc_incremental_agg_streamed": 18,
    "backfill_streamed": 10,
    "cdc_scd2_streamed": 10,
    "dedup_incremental_streamed": 10,
    "corpus_select_streamed": 10,
    # the multi-table wire fixture's ONE-TIME synthesis write expands the
    # customer CDC-feed SQL under three references (row frames, the B/C
    # frame union's lsn spine, and the feed itself — extras.py
    # proto_multi_messages._build_both), ~21 scans of customer.parquet;
    # cached as parquet afterwards, so no micro-batch ever pays this
    "cdc_apply_proto_multi_streamed": 24,
}


def audit_streamed(spark, registry, sf_dir: str, flags: list) -> int:
    """Run each streamed query once; harvest and check every SQL execution
    it produced (micro-batch inner actions included) via the status store."""
    import glob
    import shutil
    import tempfile
    import time

    store = spark._jsparkSession.sharedState().statusStore()

    def _drain_listener_bus() -> None:
        # the SQL status store is fed by the ASYNC listener bus — harvest
        # without a barrier and late events land in the NEXT query's window
        # (misattributed limits) or are missed entirely. waitUntilEmpty() is
        # the same barrier Spark's own tests use; fall back to a settle
        # sleep if the private API moves.
        try:
            spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
        except Exception:  # noqa: BLE001
            time.sleep(2.0)

    def _last_id() -> int:
        lst = store.executionsList()
        return lst.apply(lst.size() - 1).executionId() if lst.size() else -1

    from tests.test_plans import scan_sections

    # the streamed queries mkdtemp converged-run/fixture scratch dirs that
    # nothing else cleans in a script session — snapshot what exists, rmtree
    # only what THIS sweep created. main() routes tempfile under a PRIVATE
    # per-process root, so this glob can never see (or later delete) another
    # concurrent process's dirs — the r9 gate flake: this very cleanup,
    # running in a concurrent audit, deleted a gate query's feed segments
    # mid-stream when both processes shared bare /tmp
    pre_existing = set(glob.glob(os.path.join(tempfile.gettempdir(), "pgcs_q_*")))
    n_plans = 0
    for name, qd in registry.items():
        if "streamed" not in name:
            continue
        _drain_listener_bus()
        before = _last_id()
        try:
            with contextlib.redirect_stdout(io.StringIO()):
                qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            flags.append((name, f"streamed run failed: {type(e).__name__}: {e}"))
            continue
        _drain_listener_bus()
        lst = store.executionsList()
        limit = STREAMED_ALLOWED.get(name, STREAMED_MAX_SCANS)
        for i in range(lst.size()):
            ex = lst.apply(i)
            if ex.executionId() <= before:
                continue
            plan = ex.physicalPlanDescription()
            n_plans += 1
            tree = plan.split("\n\n")[0]
            if "CartesianProduct" in tree:
                flags.append(
                    (name, f"CartesianProduct in executed plan #{ex.executionId()}")
                )
            per_input: dict[str, int] = {}
            for sec in scan_sections(plan):
                path = sec.split("file:")[1].split("]")[0] if "file:" in sec else "?"
                per_input[path] = per_input.get(path, 0) + 1
            worst = max(per_input.items(), key=lambda kv: kv[1], default=("-", 0))
            if worst[1] > limit:
                flags.append((
                    name,
                    f"{worst[1]} scans of {worst[0].rsplit('/', 1)[-1]} in executed"
                    f" plan #{ex.executionId()} (limit {limit})",
                ))
    from pgcapture_spark.querydefs.streamq import _PROTO_MULTI_DIRS

    _PROTO_MULTI_DIRS.clear()
    for d in set(glob.glob(os.path.join(tempfile.gettempdir(), "pgcs_q_*"))) - pre_existing:
        shutil.rmtree(d, ignore_errors=True)
    return n_plans


def main() -> int:
    import shutil

    from pgcapture_spark.session import route_tempfiles_private

    scratch = route_tempfiles_private("pgcs_audit_")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    batch_only = "--batch-only" in sys.argv
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pgcapture_spark.queries import REGISTRY
    from tests.test_plans import scan_sections

    flags: list[tuple[str, str]] = []
    n_checked = 0
    for name, qd in REGISTRY.items():
        if name in SKIP or any(s in name for s in SKIP_SUBSTR):
            continue
        n_checked += 1
        try:
            with contextlib.redirect_stdout(io.StringIO()):
                df = qd.fn(spark, sf_dir)
                plan = spark._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
        except Exception as e:  # noqa: BLE001
            flags.append((name, f"plan build failed: {type(e).__name__}: {e}"))
            continue
        tree = plan.split("\n\n")[0]
        if "CartesianProduct" in tree:
            flags.append((name, "CartesianProduct in plan"))
        limit = ALLOWED_SCANS.get(
            name, BLANKET if name.startswith("cdc_") else DEFAULT_MAX_SCANS
        )
        per_input: dict[str, int] = {}
        for sec in scan_sections(plan):
            path = sec.split("file:")[1].split("]")[0] if "file:" in sec else "?"
            per_input[path] = per_input.get(path, 0) + 1
        worst = max(per_input.items(), key=lambda kv: kv[1], default=("-", 0))
        if worst[1] > limit:
            flags.append((
                name,
                f"{worst[1]} scans of {worst[0].rsplit('/', 1)[-1]} (limit {limit})",
            ))
    n_streamed = 0
    if not batch_only:
        n_streamed = audit_streamed(spark, REGISTRY, sf_dir, flags)
    print(
        f"audited {n_checked} batch plans + {n_streamed} executed streamed"
        f" plans; {len(flags)} flagged"
    )
    for name, why in flags:
        print(f"  FLAG {name}: {why}")
    spark.stop()
    shutil.rmtree(scratch, ignore_errors=True)
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())
