"""DBLog dump/backfill — the reference's algorithmic core, Spark-first.

Reference behavior (SURVEY §2.5): a Controller schedules TID-range chunks of a
table; the Gateway interleaves each chunk into the live change stream, with
every dumped row relabeled ``op='UPDATE', checkpoint=(lsn=0, seq=dumpID)``
(pkg/dblog/dumper.go:112-170, pkg/dblog/gateway.go:198-212), guarded by the
watermark rule *replica applied LSN ≥ stream LSN* (dumper.go:172-186).

Spark restatement: a chunk is a partition-pruned batch read (`WHERE bucket
BETWEEN lo AND hi` — prunes at the parquet scan exactly like the TID range
prunes heap pages); the merge is a plain ``union`` whose reconciliation falls
out of cdc_apply's last-image fold, because dump rows carry ``ord`` below every
stream event and therefore NEVER overwrite a newer change. At 100 TB the chunk
loop is Spark's own task scheduling over the pruned splits — no driver-side
collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DUMP_ORD = 1  # below every stream ord (stream ord = lsn*100+seq, lsn ≥ 1)


def with_bucket(snapshot: DataFrame, key: str, n_buckets: int = 64) -> DataFrame:
    """Chunking column — the analog of heap-page ranges (`relpages` chunking,
    example/schedule/main.go:23-42). Deterministic: key mod n."""
    return snapshot.withColumn("bucket", (F.col(key) % n_buckets).cast("int"))


def dump_chunk(
    snapshot: DataFrame,
    key: str,
    cols: list[str],
    lo: int,
    hi: int,
    dump_id: int = 1,
    n_buckets: int = 64,
) -> DataFrame:
    """One scheduled chunk: partition-pruned scan relabeled as synthetic
    UPDATE events with checkpoint (lsn=0, seq=dump_id) — reference
    pkg/dblog/dumper.go:122 (TID-range SELECT) + gateway.go:198-212."""
    full_present = ",".join([key, *cols])
    return (
        with_bucket(snapshot, key, n_buckets)
        .where(F.col("bucket").between(lo, hi))
        .select(
            F.lit(0).cast("bigint").alias("lsn"),
            F.lit(dump_id).cast("int").alias("seq"),
            F.lit(DUMP_ORD).cast("bigint").alias("ord"),
            F.lit("UPDATE").alias("op"),
            F.col(key),
            *[F.col(c) for c in cols],
            F.lit(full_present).alias("present"),
        )
    )


def watermark_guard(sources: DataFrame, min_lsn: int) -> DataFrame:
    """The dump-consistency precondition (reference ``checkLSN``,
    pkg/dblog/dumper.go:133-137,172-186): a dump from a replica is valid only
    if that replica has applied at least ``min_lsn``; otherwise the chunk is
    requeued (ErrLSNFallBehind / ErrLSNMissing). Returns per-source verdicts."""
    return sources.groupBy("source_id").agg(
        F.max("commit_lsn").alias("applied_lsn"),
        (F.max("commit_lsn") >= F.lit(min_lsn)).alias("allowed"),
    )


def backfill_union(stream_changes: DataFrame, dumps: DataFrame) -> DataFrame:
    """The DBLog merge (gateway.go:113-217): dump chunks unioned into the live
    stream. Correctness: dump ord < every stream ord, so the downstream
    last-image fold lets real changes win — the watermark paper's invariant."""
    return stream_changes.unionByName(dumps, allowMissingColumns=True)
