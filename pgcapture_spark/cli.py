"""Operational entry points — the engine's analog of the reference's commands
(`cmd/pg2pulsar.go`, `cmd/pulsar2pg.go`, `cmd/controller.go` + gateway/agent):

  capture   feed parquet dir → durable ordered event-log segments      (E1)
  apply     event log → snapshot state via the streaming pipeline      (E2)
  backfill  snapshot + event log → converged state with dump chunks    (E3/B4)
  lag       replication-lag report over an applied state               (A9)
  compact   log compaction by checkpoint key (latest per (lsn, seq))   (A1)
  select    training-corpus selection (dedup + quality + language)
  ann-tune  ANN recall@3 tuning table (sign-LSH / IVF / PQ sweeps)

Each subcommand is a thin wrapper over the library operators; everything
testable without a cluster (`local[N]` session from session.py).

Usage:
  python -m pgcapture_spark.cli capture --feed-dir IN --log-dir OUT [--segments 8]
  python -m pgcapture_spark.cli apply --log-dir IN --snapshot S --state-dir D \
      --key K --cols a,b,c [--checkpoint C]
  python -m pgcapture_spark.cli backfill --snapshot S --log-dir IN --state-dir D \
      --key K --cols a,b,c
  python -m pgcapture_spark.cli lag --state-dir D --ts-col commit_ts
"""

from __future__ import annotations

import argparse
import sys
import tempfile

from pgcapture_spark.session import get_spark


def _cmd_capture(args) -> int:
    from pgcapture_spark.sources.feed import materialize_feed

    spark = get_spark(app="pgcs-capture")
    feed = spark.read.parquet(args.feed_dir)
    materialize_feed(feed, args.log_dir, n_segments=args.segments, order_col=args.order_col)
    n = spark.read.parquet(args.log_dir).count()
    print(f"captured {n} events into {args.log_dir} ({args.segments} segments)")
    return 0


def _cmd_apply(args) -> int:
    from pgcapture_spark.sources.feed import read_feed_stream
    from pgcapture_spark.streaming.pipeline import apply_stream
    from pgcapture_spark.streaming.state import SnapshotState

    spark = get_spark(app="pgcs-apply")
    snapshot = spark.read.parquet(args.snapshot)
    schema = spark.read.parquet(args.log_dir).schema
    ckpt = args.checkpoint or tempfile.mkdtemp(prefix="pgcs_cli_ckpt_")
    state = SnapshotState(spark, args.state_dir)
    query = apply_stream(
        read_feed_stream(spark, args.log_dir, schema, args.max_files_per_trigger),
        state,
        snapshot,
        args.key,
        args.cols.split(","),
        ckpt,
    )
    query.awaitTermination(args.timeout)
    out = state.read()
    print(f"applied; state rows = {out.count()} at {args.state_dir}")
    return 0


def _cmd_backfill(args) -> int:
    from pgcapture_spark.operators.apply import cdc_apply
    from pgcapture_spark.operators.backfill import backfill_union, dump_chunk

    spark = get_spark(app="pgcs-backfill")
    snapshot = spark.read.parquet(args.snapshot)
    changes = spark.read.parquet(args.log_dir)
    cols = args.cols.split(",")
    dumps = dump_chunk(snapshot, args.key, cols, 0, args.buckets - 1, dump_id=1,
                       n_buckets=args.buckets)
    merged = backfill_union(changes, dumps)
    out = cdc_apply(snapshot.where("1=0"), merged, args.key, cols)
    out.write.mode("overwrite").parquet(args.state_dir)
    print(f"backfilled; state rows = {spark.read.parquet(args.state_dir).count()}")
    return 0


def _cmd_lag(args) -> int:
    import datetime

    from pyspark.sql import functions as F

    from pgcapture_spark.streaming.pipeline import replication_lag_seconds

    spark = get_spark(app="pgcs-lag")
    state = spark.read.parquet(args.state_dir)
    last = state.agg(F.max(args.ts_col)).collect()[0][0]
    lag = replication_lag_seconds(last, datetime.datetime.now(datetime.timezone.utc))
    print(f"last applied {args.ts_col} = {last}; replication lag = {lag:.1f}s")
    return 0


def _cmd_compact(args) -> int:
    from pgcapture_spark.sources.feed import compact_log

    spark = get_spark(app="pgcs-compact")
    before, after = compact_log(
        spark,
        args.log_dir,
        n_segments=args.segments,
        key_cols=tuple(args.key_cols.split(",")),
        order_col=args.order_col,
    )
    print(f"compacted {args.log_dir}: {before} -> {after} records")
    return 0


def _cmd_select(args) -> int:
    from pgcapture_spark.operators.textstats import corpus_select, corpus_select_neardup

    spark = get_spark(app="pgcs-select")
    docs = spark.read.parquet(args.docs)
    langs = tuple(args.langs.split(","))
    if args.neardup:
        out = corpus_select_neardup(
            docs,
            threshold=args.threshold,
            min_quality=args.min_quality,
            min_tokens=args.min_tokens,
            langs=langs,
        )
    else:
        out = corpus_select(
            docs, min_quality=args.min_quality, min_tokens=args.min_tokens, langs=langs
        )
    out.write.mode("overwrite").parquet(args.out_dir)
    n_in = docs.count()
    n_out = spark.read.parquet(args.out_dir).count()
    mode = "near-dup" if args.neardup else "exact-dedup"
    print(f"selected {n_out}/{n_in} docs ({mode}) into {args.out_dir}")
    return 0


def _cmd_stats(args) -> int:
    from pgcapture_spark.operators.textstats import corpus_stats

    spark = get_spark(app="pgcs-stats")
    docs = spark.read.parquet(args.docs)
    rows = corpus_stats(docs).orderBy("lang", "source").collect()
    print(f"{'lang':5} {'source':8} {'docs':>6} {'tokens':>9} {'mean_chars':>10} "
          f"{'med_tok':>8} {'p90_tok':>8}")
    for r in rows:
        print(
            f"{r.lang:5} {r.source:8} {r.n_docs:6d} {r.total_tokens:9d} "
            f"{r.mean_chars:10.1f} {r.median_tokens:8.1f} {r.p90_tokens:8.1f}"
        )
    return 0


def _cmd_mix(args) -> int:
    from pgcapture_spark.operators.textstats import mix_sample

    spark = get_spark(app="pgcs-mix")
    docs = spark.read.parquet(args.docs)
    out = mix_sample(docs, alpha=args.alpha, target_frac=args.target_frac)
    out.write.mode("overwrite").parquet(args.out_dir)
    n_in, n_out = docs.count(), spark.read.parquet(args.out_dir).count()
    print(f"sampled {n_out}/{n_in} docs (alpha={args.alpha}) into {args.out_dir}")
    return 0


def _cmd_ann_tune(args) -> int:
    from pgcapture_spark.queries import REGISTRY

    spark = get_spark(app="pgcs-ann-tune")
    sf_dir = args.sf_dir
    rows = REGISTRY["sim_ann_tuning"].fn(spark, sf_dir).orderBy("method", "param").collect()
    print(f"{'method':8} {'param':10} {'queries':>7} {'hits':>5} recall@3")
    for r in rows:
        print(
            f"{r.method:8} {r.param:10} {r.n_queries:7d} {r.total_hits:5d} "
            f"{r.recall_at_3:.4f}"
        )
    return 0


def _cmd_export(args) -> int:
    """select → pack → shard: the complete export path, written partitioned
    by shard (the write is the only shuffle consumer of the shard column)."""
    from pgcapture_spark.operators.packing import packed_batches
    from pgcapture_spark.operators.textstats import corpus_select
    from pyspark.sql import functions as F

    spark = get_spark(app="pgcs-export")
    docs = spark.read.parquet(args.docs)
    langs = tuple(args.langs.split(","))
    sel = corpus_select(
        docs, min_quality=args.min_quality, min_tokens=args.min_tokens, langs=langs
    )
    packed = packed_batches(sel.select("doc_id", "n_tokens"), budget=args.budget)
    from pgcapture_spark.operators.textstats import shard_expr

    out = packed.withColumn("shard", shard_expr("batch_id", args.shards))
    out.repartition(args.shards, "shard").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(args.out_dir)
    n = spark.read.parquet(args.out_dir).count()
    nb = spark.read.parquet(args.out_dir).select("batch_id").distinct().count()
    print(f"exported {n} docs in {nb} batches across {args.shards} shards to {args.out_dir}")
    return 0


def _cmd_interleave(args) -> int:
    """Reproducible global training order (two-phase distributed rank)."""
    spark = get_spark(app="pgcs-interleave")
    from pgcapture_spark.operators.packing import packed_batches
    from pyspark.sql import functions as F

    docs = spark.read.parquet(args.docs).select(
        "doc_id",
        F.expr("md5(concat('order|', CAST(doc_id AS STRING)))").alias("hkey"),
        F.lit(1).alias("_w"),
    )
    ranked = packed_batches(
        docs, budget=1 << 60, order_col="hkey", tokens_col="_w", extra_cols=("doc_id",)
    ).select("doc_id", F.col("start_offset").alias("global_pos"))
    ranked.write.mode("overwrite").parquet(args.out_dir)
    print(f"wrote training order for {ranked.count()} docs to {args.out_dir}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pgcapture_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("capture", help="feed → ordered event-log segments (E1)")
    c.add_argument("--feed-dir", required=True)
    c.add_argument("--log-dir", required=True)
    c.add_argument("--segments", type=int, default=8)
    c.add_argument("--order-col", default="ord")
    c.set_defaults(fn=_cmd_capture)

    a = sub.add_parser("apply", help="event log → snapshot state (E2)")
    a.add_argument("--log-dir", required=True)
    a.add_argument("--snapshot", required=True)
    a.add_argument("--state-dir", required=True)
    a.add_argument("--key", required=True)
    a.add_argument("--cols", required=True, help="comma-separated non-key columns")
    a.add_argument("--checkpoint")
    a.add_argument("--max-files-per-trigger", type=int, default=2)
    a.add_argument("--timeout", type=int, default=600)
    a.set_defaults(fn=_cmd_apply)

    b = sub.add_parser("backfill", help="snapshot ∪ log → converged state (B4)")
    b.add_argument("--snapshot", required=True)
    b.add_argument("--log-dir", required=True)
    b.add_argument("--state-dir", required=True)
    b.add_argument("--key", required=True)
    b.add_argument("--cols", required=True)
    b.add_argument("--buckets", type=int, default=64)
    b.set_defaults(fn=_cmd_backfill)

    lg = sub.add_parser("lag", help="replication-lag report (A9)")
    lg.add_argument("--state-dir", required=True)
    lg.add_argument("--ts-col", default="commit_ts")
    lg.set_defaults(fn=_cmd_lag)

    cp = sub.add_parser("compact", help="log compaction by checkpoint key (A1)")
    cp.add_argument("--log-dir", required=True)
    cp.add_argument("--segments", type=int, default=4)
    cp.add_argument("--key-cols", default="lsn,seq")
    cp.add_argument("--order-col", default="ord")
    cp.set_defaults(fn=_cmd_compact)

    se = sub.add_parser("select", help="training-corpus selection pipeline")
    se.add_argument("--docs", required=True, help="documents parquet path")
    se.add_argument("--out-dir", required=True)
    se.add_argument("--neardup", action="store_true", help="MinHash+LSH near-dup dedup")
    se.add_argument("--threshold", type=float, default=0.1)
    se.add_argument("--min-quality", type=float, default=0.5)
    se.add_argument("--min-tokens", type=int, default=20)
    se.add_argument("--langs", default="en,de")
    se.set_defaults(fn=_cmd_select)

    at = sub.add_parser("ann-tune", help="ANN recall@3 tuning table")
    at.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    at.set_defaults(fn=_cmd_ann_tune)

    st = sub.add_parser("stats", help="per-(lang, source) dataset-card stats")
    st.add_argument("--docs", required=True)
    st.set_defaults(fn=_cmd_stats)

    mx = sub.add_parser("mix", help="temperature domain-mixture sampling")
    mx.add_argument("--docs", required=True)
    mx.add_argument("--out-dir", required=True)
    mx.add_argument("--alpha", type=float, default=0.5)
    mx.add_argument("--target-frac", type=float, default=0.5)
    mx.set_defaults(fn=_cmd_mix)
    ex = sub.add_parser("export", help="select -> pack -> shard export path")
    ex.add_argument("--docs", required=True)
    ex.add_argument("--out-dir", required=True)
    ex.add_argument("--budget", type=int, default=4096)
    ex.add_argument("--shards", type=int, default=8)
    ex.add_argument("--min-quality", type=float, default=0.5)
    ex.add_argument("--min-tokens", type=int, default=20)
    ex.add_argument("--langs", default="en,de")
    ex.set_defaults(fn=_cmd_export)

    il = sub.add_parser("interleave", help="deterministic global training order")
    il.add_argument("--docs", required=True)
    il.add_argument("--out-dir", required=True)
    il.set_defaults(fn=_cmd_interleave)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
