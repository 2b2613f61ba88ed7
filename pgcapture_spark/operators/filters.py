"""Row-level routing/projection operators of the reference's gateway and sink.

All are single Catalyst expressions — they fuse into the scan via whole-stage
codegen and push down to parquet where possible (no shuffle, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pgcapture_spark.operators.apply import present_contains


def table_regex_filter(changes: DataFrame, pattern: str, fqn_col: str = "fqn") -> DataFrame:
    """Per-consumer table filter (reference: the gateway's ``TableRegex``
    parameter, pkg/dblog/gateway.go:159-173,219-227): keep only changes whose
    ``schema.table`` matches; non-matching rows are committed silently (here:
    simply not returned — checkpointing is the streaming layer's job)."""
    return changes.where(F.col(fqn_col).rlike(pattern))


def suppress_non_changes(stream: DataFrame, op_col: str = "op") -> DataFrame:
    """Forward only row-change messages; Begin/Commit/KeepAlive frames are
    dropped (reference: pkg/dblog/gateway.go:159-173 — only ``Change`` is sent,
    everything else auto-committed)."""
    return stream.where(F.col(op_col).isin("INSERT", "UPDATE", "DELETE"))


def old_image_projection(changes: DataFrame, old_cols: list[str]) -> DataFrame:
    """DELETE old-image projection, NULLs dropped (reference ``makeOldPBTuple``
    noNull=true, pkg/decode/decoder.go:56-82): emit the identity-key image of
    deleted rows."""
    df = changes.where(F.col("op") == "DELETE")
    conds: Column | None = None
    for c in old_cols:
        cond = F.col(c).isNotNull()
        conds = cond if conds is None else (conds | cond)
    return df.where(conds).select("lsn", "seq", "ord", *old_cols)


def toast_backfill_image(
    updates: DataFrame, snapshot: DataFrame, key: str, cols: list[str]
) -> DataFrame:
    """Per-event EFFECTIVE new image under replica-identity-FULL semantics:
    columns absent from the event (unchanged TOAST) are backfilled from the
    old image — here the snapshot row (reference ``makeNewPBTuple``'s
    ``goto ReAppend`` path, pkg/decode/decoder.go:84-118)."""
    upd = updates.where(F.col("op") == "UPDATE").alias("u")
    joined = upd.join(snapshot.alias("s"), on=key, how="inner")
    out = [F.col("lsn"), F.col("seq"), F.col("ord"), F.col(key)]
    for c in cols:
        out.append(
            F.when(present_contains(c), F.col(f"u.{c}")).otherwise(F.col(f"s.{c}")).alias(c)
        )
    return joined.select(*out)


def drop_generated(changes: DataFrame, generated_cols: list[str]) -> DataFrame:
    """Drop ``GENERATED ALWAYS`` columns from insert images (reference:
    pkg/sink/postgres.go:401-404 with ColumnInfo.Filter,
    pkg/decode/schema.go:80-98) — catalog-driven projection."""
    return changes.drop(*generated_cols)


VALID_OPS = ("INSERT", "UPDATE", "DELETE", "BEGIN", "COMMIT", "KEEPALIVE", "DDL")


def dead_letter_split(
    stream: DataFrame, op_col: str = "op", valid_ops: tuple[str, ...] = VALID_OPS
) -> tuple[DataFrame, DataFrame]:
    """Route malformed messages to a dead-letter side output with a reason —
    the engine form of the reference's per-record Requeue(reason) / redelivery
    path (pkg/dblog/gateway.go:82-107, pkg/source/pulsar.go:276-280): a record
    the consumer cannot process must not poison the stream NOR be silently
    dropped. Returns ``(good, dlq)``; dlq rows carry ``reason``. Both branches
    are single pushdown-friendly filters over the same scan."""
    is_valid = F.col(op_col).isin(*valid_ops)
    good = stream.where(is_valid)
    dlq = stream.where(~is_valid).withColumn(
        "reason", F.concat(F.lit("unknown_op:"), F.col(op_col))
    )
    return good, dlq
