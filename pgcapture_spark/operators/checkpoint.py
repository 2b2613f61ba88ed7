"""Checkpoint/cursor operators — the reference's resume machinery.

A checkpoint is ``(LSN uint64, Seq uint32)`` ordered lexicographically
(reference: pb/pgcapture.proto:9-13, pkg/cursor/main.go:13-26). In the engine
it is the pair of columns ``(lsn, seq)`` (and ``ord = lsn*100 + seq`` where a
single sortable value is convenient).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resume_filter(changes: DataFrame, lsn: int, seq: int = 0) -> DataFrame:
    """Catch-up drop on resume: replay from a stored checkpoint skips every
    message at-or-before it (reference: PulsarReaderSource's consistency
    filter, pkg/source/pulsar.go:110-156; PulsarSink's ``consistent`` gate,
    pkg/sink/pulsar.go:116-127). Strict ``(lsn, seq)`` lexicographic order."""
    return changes.where(
        (F.col("lsn") > F.lit(lsn)) | ((F.col("lsn") == F.lit(lsn)) & (F.col("seq") > F.lit(seq)))
    )


def last_checkpoint(log: DataFrame) -> DataFrame:
    """Resume-point discovery: the maximum ``(lsn, seq)`` in the durable log
    (reference: PulsarTracker reads the topic tail backward,
    pkg/cursor/pulsar.go:30-51). One-row result ``(last_lsn, last_seq)``."""
    return log.agg(
        F.expr("max_by(lsn, ord)").alias("last_lsn"),
        F.expr("max_by(seq, ord)").alias("last_seq"),
    )


def scan_checkpoint_from_log(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """PITR bootstrap: regex-scan server-log lines for the redo point
    (reference: ScanCheckpointFromLog, pkg/sink/postgres.go:677-700; regexes
    at :697-700). Returns the matching lines' extracted LSN strings."""
    extracted = lines.select(
        F.regexp_extract(F.col(line_col), r"redo done at ([0-9A-F]+/[0-9A-F]+)", 1).alias(
            "redo_lsn"
        )
    )
    return extracted.where(F.col("redo_lsn") != "")
