"""Consumer API — the engine's public read surface, mirroring the reference's
client (`pkg/pgcapture/consumer.go:38-142`, `pkg/pgcapture/dblog.go:23-98`):

    consumer = CaptureConsumer(table_regex=r"public\\.(customer|orders)")
    consumer.register("public.customer", handle_customer)   # per-table handler
    query = consumer.consume(stream, checkpoint_dir)

Reference → Spark mapping:
- ``NewDBLogConsumer`` + ``CaptureInit{TableRegex}`` → the regex filter is
  applied server-side-equivalent: before dispatch, so non-matching tables are
  never delivered (gateway.go:159-173).
- ``ConsumeAsync(Model, handler)`` per-table handler registry keyed
  ``schema.table`` (consumer.go:86-142, reflect.go:35-63) → ``register``.
- auto-commit of non-matching messages → rows without a handler are simply
  not delivered; the micro-batch checkpoint advances regardless (the
  at-least-once ack loop collapses into foreachBatch + checkpointing).
- ``DebounceHandler`` wrapping → ``debounce=True`` reduces each micro-batch
  to the newest event per key before dispatch (the batch form of C2; the
  exact stateful form is streaming/debounce_state.py).

Handlers receive (batch_df, batch_id) per table per micro-batch — batch-level
dispatch, not per-row callbacks: at 100 TB a handler is itself a DataFrame
program (write, merge, aggregate), not a Python loop.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pgcapture_spark.operators.apply import last_image_window

Handler = Callable[[DataFrame, int], None]


class CaptureConsumer:
    def __init__(
        self,
        table_regex: str | None = None,
        fqn_col: str = "fqn",
        op_col: str = "op",
    ):
        self.table_regex = table_regex
        self.fqn_col = fqn_col
        self.op_col = op_col
        self._handlers: dict[str, Handler] = {}

    def register(self, fqn: str, handler: Handler) -> "CaptureConsumer":
        """Register a per-table handler (reference: ConsumeAsync's model
        registry, keyed schema.table)."""
        self._handlers[fqn] = handler
        return self

    def _dispatch(
        self, batch_df: DataFrame, batch_id: int, debounce_key: str | None
    ) -> None:
        # frame suppression (T5) + table regex (T4) before any handler sees data
        changes = batch_df.where(F.col(self.op_col).isin("INSERT", "UPDATE", "DELETE"))
        if self.table_regex is not None:
            changes = changes.where(F.col(self.fqn_col).rlike(self.table_regex))
        for fqn, handler in self._handlers.items():
            if self.table_regex is not None and not re.search(self.table_regex, fqn):
                continue  # handler excluded by the capture-init regex
            tbl = changes.where(F.col(self.fqn_col) == fqn)
            if debounce_key is not None:
                tbl = last_image_window(tbl, debounce_key)
            handler(tbl, batch_id)

    def consume(
        self,
        stream: DataFrame,
        checkpoint_dir: str,
        debounce_key: str | None = None,
    ) -> StreamingQuery:
        """Start consuming a STREAMING change feed; handlers fire per
        micro-batch. ``debounce_key`` enables per-key last-write-wins within
        each batch (DebounceHandler's interval == the trigger interval)."""
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: self._dispatch(df, bid, debounce_key)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def consume_batch(self, feed: DataFrame, debounce_key: str | None = None) -> None:
        """One-shot batch dispatch over a static feed (the replay analog)."""
        self._dispatch(feed, 0, debounce_key)
