"""Per-key debounce — last-write-wins within an interval.

Reference: ``DebounceHandler`` (pkg/pgcapture/debounce.go:87-155): UPDATEs for
the same key within the flush interval collapse to the newest one;
INSERT/DELETE flush immediately. The batch form is a keyed window: one row per
(key, interval bucket), the event with the highest checkpoint wins; dump events
(lsn=0) rank as latest via the ord encoding (they only appear in backfill
context where they are reconciled by cdc_apply instead).

Scale: row_number over (key, bucket) — one shuffle, no Python; the streaming
form is ``debounce_stream`` in streaming/pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def debounce_batch(
    events: DataFrame,
    key: str,
    order_cols: list[str],
    interval_col: str,
    interval: str = "hour",
) -> DataFrame:
    """Keep the newest event per (key, interval bucket).

    ``interval_col`` is a timestamp; the bucket is ``date_trunc(interval)``.
    ``order_cols`` break ties (highest wins), mirroring the checkpoint
    comparison in debounce.go:120-137.
    """
    bucket = F.date_trunc(interval, F.col(interval_col)).alias("debounce_window")
    df = events.withColumn("debounce_window", bucket)
    w = W.partitionBy(key, "debounce_window").orderBy(*[F.col(c).desc() for c in order_cols])
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
