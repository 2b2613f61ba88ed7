"""``spark.readStream.format("pgcapture_feed")`` — a first-class streaming
source for the materialized CDC event log, built on the Python Data Source API
(Spark 4+).

This is the engine-native form of the reference's source surface: the
``PGXSource``/``PulsarReaderSource`` pull loops (pkg/source/postgres.go:51-163,
pkg/source/pulsar.go:38-156) become a DataSource whose

- **offset** is an index into the ordered, immutable segment-file list — the
  (LSN, Seq)-ordered log position (pkg/cursor/main.go:13-26); restart replays
  from the committed offset exactly like seeking a serialized MessageID,
- **backpressure knob** is ``maxFilesPerTrigger`` (the reference's bounded
  1000-slot channel, pkg/source/main.go:76),
- **partitions** are the admitted segment files (one task per segment), read
  as Arrow record batches — vectorized end-to-end, no per-row Python loop.

Usage::

    spark.dataSource.register(FeedDataSource)
    stream = (spark.readStream.format("pgcapture_feed")
              .option("path", feed_dir).option("maxFilesPerTrigger", "2").load())

Segments are written by ``materialize_feed`` (ord-range-partitioned, file
names sort in LSN order), so file-index order IS log order. At scale the same
reader shape points at a real topic/log; the offset dict swaps file indices
for broker cursors.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)


def _segments(path: str) -> list[str]:
    """Ordered immutable segment list (names sort in ord/LSN order)."""
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.startswith("part-") and f.endswith(".parquet")
    )


class _SegmentPartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


def _as_micros(table):
    """Spark's Arrow bridge rejects ns timestamps (files written elsewhere may
    carry them); cast any timestamp[ns] column down to microseconds."""
    import pyarrow as pa

    fields = [
        pa.field(f.name, pa.timestamp("us", tz=f.type.tz))
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        else f
        for f in table.schema
    ]
    schema = pa.schema(fields)
    return table.cast(schema) if schema != table.schema else table


def _read_arrow(file_path: str) -> Iterator:
    import pyarrow.parquet as pq

    # one segment = one task; emit the file's row groups as record batches
    yield from _as_micros(pq.read_table(file_path)).to_batches()


class _FeedStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, max_files: int):
        self.path = path
        self.max_files = max_files

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        # admit at most max_files new segments per micro-batch (backpressure);
        # the segment list only grows, so the index is a monotone offset.
        # self._last starts at 0 in a fresh reader instance, so on restart it
        # must be floored by every offset Spark hands back (partitions/commit
        # below) — otherwise the offset log would regress below the
        # checkpointed position and replay the whole log as duplicates.
        n = len(_segments(self.path))
        cur = getattr(self, "_last", 0)
        nxt = min(n, max(cur, cur + self.max_files))
        self._last = nxt
        return {"index": nxt}

    def _floor(self, off: dict) -> None:
        # recover the admission cursor from checkpointed offsets (restart path)
        self._last = max(getattr(self, "_last", 0), off["index"])

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        self._floor(start)
        self._floor(end)
        files = _segments(self.path)[start["index"] : end["index"]]
        return [_SegmentPartition(f) for f in files]

    def read(self, partition: _SegmentPartition) -> Iterator:
        return _read_arrow(partition.file_path)

    def commit(self, end: dict) -> None:
        # segments are immutable; nothing to ack upstream (the checkpoint dir
        # already persisted `end` — the reference's sources-table role). Still
        # floor the cursor so a restart that replays commit() cannot regress.
        self._floor(end)


class _FeedBatchReader(DataSourceReader):
    """Batch reads with comparison-filter pushdown: supported filters become
    pyarrow parquet predicates, so row groups whose min/max statistics exclude
    the predicate are never read — the reference's partition-pruned snapshot
    scan (TID ranges, pkg/dblog/dumper.go:112-143) generalized to any stats
    column (e.g. ``lsn > resume`` prunes whole segments of the log)."""

    def __init__(self, path: str):
        self.path = path
        self.pushed: list = []

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            IsNotNull,
            LessThan,
            LessThanOrEqual,
        )

        supported = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
        for f in filters:
            if isinstance(f, supported) and len(f.attribute) == 1:
                self.pushed.append(f)
                # fully handled at the scan — but keeping Spark's residual
                # evaluation is free and guards stats-only pruning
                yield f
            elif isinstance(f, IsNotNull):
                yield f  # implied by any pushed comparison; let Spark keep it
            else:
                yield f

    def _arrow_filter(self):
        if not self.pushed:
            return None
        import pyarrow.compute as pc
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        ops = {
            EqualTo: lambda f, v: f == v,
            GreaterThan: lambda f, v: f > v,
            GreaterThanOrEqual: lambda f, v: f >= v,
            LessThan: lambda f, v: f < v,
            LessThanOrEqual: lambda f, v: f <= v,
        }
        expr = None
        for flt in self.pushed:
            e = ops[type(flt)](pc.field(flt.attribute[0]), flt.value)
            expr = e if expr is None else expr & e
        return expr

    def partitions(self) -> list[InputPartition]:
        return [_SegmentPartition(f) for f in _segments(self.path)]

    def read(self, partition: _SegmentPartition) -> Iterator:
        import pyarrow.parquet as pq

        flt = self._arrow_filter()
        table = pq.read_table(partition.file_path, filters=flt)
        yield from _as_micros(table).to_batches()


class _StagedFile(WriterCommitMessage):
    def __init__(self, path: str, rows: int, xsum: int = 0):
        self.path = path
        self.rows = rows
        self.xsum = xsum  # order-independent content checksum (mod 2**64 sum)


def _content_xsum(batch) -> int:
    """Order- and task-layout-independent content checksum of an Arrow batch:
    per-row 64-bit hashes summed mod 2**64. Summation commutes across rows,
    batches, files, and tasks, so any re-split of the same logical rows yields
    the same value — while any content change moves it (the restarted-batchId
    foreign-lineage case a bare row count cannot catch).

    Canonicalization happens at the ARROW level, per declared column type, not
    after ``to_pandas``: pandas picks the batch dtype from the batch's *values*
    (an int64 column converts to float64 only when that batch contains a null),
    so the same logical row would hash as "7" in one task layout and "7.0" in
    another and a legitimate crash-replay re-split would trip the
    foreign-lineage guard. ``pc.cast(col, string)`` is driven by the column's
    Arrow type alone, so every re-split of the same rows encodes identically.
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = {}
    for name, col in zip(batch.schema.names, batch.columns):
        t = col.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            cols[name] = col.to_pandas()  # object dtype in every layout
        elif (
            pa.types.is_binary(t)
            or pa.types.is_large_binary(t)
            or pa.types.is_fixed_size_binary(t)
            or pa.types.is_nested(t)
        ):
            # routed by TYPE, never by a value-driven cast failure (binary
            # casts succeed or fail per-value on UTF-8 validity, which would
            # re-introduce layout dependence). ``to_pylist`` gives Python
            # bytes / lists / dicts whose repr is exact and layout-invariant.
            cols[name] = pd.Series(
                [None if v is None else repr(v) for v in col.to_pylist()],
                dtype=object,
            )
        else:
            try:
                # type-driven canonical text (ints stay "7", never "7.0")
                cols[name] = pc.cast(col, pa.string()).to_pandas()
            except pa.ArrowNotImplementedError:  # type-driven, not per-value
                cols[name] = pd.Series(
                    [None if v is None else repr(v) for v in col.to_pylist()],
                    dtype=object,
                )
    hashes = pd.util.hash_pandas_object(pd.DataFrame(cols), index=False)
    return int(hashes.astype("uint64").sum()) & 0xFFFFFFFFFFFFFFFF


class _FeedStreamWriter(DataSourceStreamArrowWriter):
    """Append micro-batches to the segment log — the durable-log sink
    (reference A1: PulsarSink.Apply, pkg/sink/pulsar.go:99-175). Exactly-once
    recipe: executors write STAGED parquet files and return them as commit
    messages; the driver's ``commit`` renames them to ordered segment names
    ``part-s{batchId}-{task}`` and drops a ``_commit_{batchId}`` marker.

    Exactly-once across restarts: both the segment names and the marker are
    keyed by batchId (the checkpoint dir makes batchId unique and monotone per
    query lineage — the reference's Pulsar producer derives its dedup
    sequence-id from the LSN for the same reason, pkg/sink/pulsar.go). A
    replayed batch either sees its marker (verify + drop staged files), or
    re-renames onto the SAME final names (idempotent) if the previous attempt
    crashed between rename and marker. ``abort`` deletes the staged files, so
    readers never see partial output. ``part-s…`` sorts after any compacted
    ``part-0…`` Spark names, so lexicographic order stays append order.

    Lineage guard: batchId alone is NOT content-derived, so a *different*
    writer lineage on the same log dir (operator deletes the checkpoint to
    reprocess → batchIds restart at 0) would silently collide with the old
    markers. The marker therefore records a content fingerprint (file count +
    per-file row counts); a marker hit with a MATCHING fingerprint is a replay
    of the same data (drop — identical output either way), a mismatch is a
    foreign lineage and commit fails loudly instead of silently discarding
    data. Recovery: point the new lineage at a fresh log dir, or clear the
    ``_commit_*`` markers after confirming the old log is disposable.
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.join(path, ".staging"), exist_ok=True)

    def write(self, iterator) -> WriterCommitMessage:
        import uuid

        import pyarrow.parquet as pq

        staged = os.path.join(self.path, ".staging", f"{uuid.uuid4().hex}.parquet")
        writer, rows, xsum = None, 0, 0
        try:
            for batch in iterator:
                if writer is None:
                    writer = pq.ParquetWriter(staged, batch.schema)
                writer.write_batch(batch)
                rows += batch.num_rows
                if batch.num_rows:
                    xsum = (xsum + _content_xsum(batch)) & 0xFFFFFFFFFFFFFFFF
        finally:
            if writer is not None:
                writer.close()
        if rows == 0:
            if os.path.exists(staged):
                os.remove(staged)
            return _StagedFile("", 0)
        return _StagedFile(staged, rows, xsum)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.path, f"_commit_{batch_id:012d}")

    def commit(self, messages, batchId: int) -> None:
        import json

        staged = [m for m in messages if m is not None and m.rows > 0]
        # fingerprint must be TASK-LAYOUT-INDEPENDENT: a same-lineage replay
        # after a crash may split the identical input into a different number
        # of tasks (different host cores / maxPartitionBytes), so per-file
        # row distributions would wedge a legitimate replay. Total row count
        # plus an order-independent per-row-hash sum is invariant under any
        # re-split of the same rows but moves on ANY content change — so a
        # restarted-batchId foreign lineage is caught even when its row
        # count happens to collide.
        total_rows = sum(m.rows for m in staged)
        total_xsum = sum(getattr(m, "xsum", 0) for m in staged) & 0xFFFFFFFFFFFFFFFF
        fingerprint = {"total_rows": total_rows, "xsum": total_xsum}
        marker = self._marker(batchId)
        if os.path.exists(marker):
            with open(marker) as f:
                raw = f.read().strip()
            try:
                recorded = json.loads(raw)
            except ValueError:  # pre-fingerprint marker: bare file count
                recorded = {}
            if "total_rows" in recorded:
                rec_total = recorded["total_rows"]
            elif isinstance(recorded.get("rows"), list):  # legacy per-file form
                rec_total = sum(recorded["rows"])
            else:
                rec_total = None
            same = rec_total is None or rec_total == total_rows
            if same and "xsum" in recorded:  # content check when both sides have it
                same = recorded["xsum"] == total_xsum
            if not same:
                raise RuntimeError(
                    f"pgcapture_feed sink: batch {batchId} already committed to "
                    f"{self.path} with a different content fingerprint "
                    f"({recorded} vs {fingerprint}). This log dir belongs to "
                    "another writer lineage (e.g. its checkpoint was deleted and "
                    "batchIds restarted). Refusing to silently drop data — use a "
                    "fresh log dir, or clear _commit_* markers if the old log is "
                    "disposable."
                )
            for m in staged:  # replayed batch, same content — drop staged copies
                if os.path.exists(m.path):
                    os.remove(m.path)
            return
        for i, m in enumerate(staged):
            final = os.path.join(self.path, f"part-s{batchId:012d}-{i:05d}.parquet")
            os.replace(m.path, final)  # deterministic names → replay-idempotent
        with open(marker, "w") as f:
            json.dump(fingerprint, f)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and m.path and os.path.exists(m.path):
                os.remove(m.path)


def register_feed_source(spark) -> None:
    """Register the source AND enable Python-source filter pushdown (off by
    default in a vanilla session; without it Spark refuses to initialize a
    reader that implements pushFilters). Runtime-settable."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(FeedDataSource)


class FeedDataSource(DataSource):
    """The ``pgcapture_feed`` source: batch and streaming reads over a
    materialized ordered event log, plus the streaming log-append sink."""

    @classmethod
    def name(cls) -> str:
        return "pgcapture_feed"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("pgcapture_feed requires .option('path', <feed dir>)")
        return path

    def schema(self):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        files = _segments(self._path())
        if not files:
            raise ValueError(f"pgcapture_feed: no segments in {self._path()}")
        sch = pq.read_schema(files[0])
        fields = [
            pa.field(f.name, pa.timestamp("us", tz=f.type.tz))
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
            else f
            for f in sch
        ]
        return from_arrow_schema(pa.schema(fields))

    def reader(self, schema) -> DataSourceReader:
        return _FeedBatchReader(self._path())

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _FeedStreamReader(
            self._path(), int(self.options.get("maxfilespertrigger", "1"))
        )

    def streamWriter(self, schema, overwrite: bool) -> _FeedStreamWriter:
        return _FeedStreamWriter(self._path())
