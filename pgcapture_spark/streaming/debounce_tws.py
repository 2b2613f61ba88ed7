"""Exact stateful debounce on the ``transformWithStateInPandas`` API — the
same ``DebounceHandler`` rules as ``debounce_state.py`` (SURVEY §2 C2,
pkg/pgcapture/debounce.go:87-155) expressed with Spark's current
arbitrary-stateful-processing surface (StatefulProcessor + typed ValueState,
RocksDB state store).

Why both forms exist: ``applyInPandasWithState`` is the long-stable API;
``transformWithState`` is its successor (composable typed state, timers,
initial state, state data source for inspection). The engine keeps the rules
in one shape per API so either can host the consumer surface; the test suite
pins them to the same golden expected-output SQL.

Scale: identical to the older form — state is one buffered event per key in
the per-partition RocksDB store; one key shuffle per micro-batch.

Runtime requirements beyond the older form: the RocksDB state store provider
AND the ``protobuf`` Python package (the transformWithState driver worker
speaks protobuf to the JVM state server) — absent protobuf, use
``debounce_state.stateful_debounce``; the rules are identical and pinned to
the same golden spec.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from pgcapture_spark.streaming.debounce_state import OUTPUT_SCHEMA, STATE_SCHEMA, _is_newer

try:  # PySpark >= 4 ships the StatefulProcessor surface
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _HAVE_TWS = True
except ImportError:  # pragma: no cover - older runtime
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAVE_TWS = False

_COLS = ["key", "lsn", "seq", "arr", "op", "flush_kind"]


class DebounceProcessor(StatefulProcessor):
    """One buffered UPDATE per key; INSERT/DELETE flush-then-fire; newer
    replaces, equal flushes-then-stores, older drops; dump (lsn=0) always
    newest."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._buf = handle.getValueState("buf", STATE_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues):
        (k,) = key
        buffered = tuple(self._buf.get()) if self._buf.exists() else None
        events: list[tuple] = []
        for pdf in rows:
            events.extend(
                (int(r.lsn), int(r.seq), int(r.arr), str(r.op))
                for r in pdf.itertuples(index=False)
            )
        events.sort(key=lambda r: r[2])  # arrival order within the batch

        out: list[tuple] = []
        for e_lsn, e_seq, e_arr, e_op in events:
            if e_op in ("INSERT", "DELETE"):
                if buffered is not None:
                    out.append((k, *buffered, "flush_by_" + e_op.lower()))
                    buffered = None
                out.append((k, e_lsn, e_seq, e_arr, e_op, "immediate"))
            else:  # UPDATE
                if buffered is None:
                    buffered = (e_lsn, e_seq, e_arr, e_op)
                else:
                    cmp = _is_newer(e_lsn, e_seq, buffered[0], buffered[1])
                    if cmp > 0:
                        buffered = (e_lsn, e_seq, e_arr, e_op)
                    elif cmp == 0:
                        out.append((k, *buffered, "flush_by_equal"))
                        buffered = (e_lsn, e_seq, e_arr, e_op)
                    # cmp < 0: arrival dropped

        if buffered is not None:
            self._buf.update(buffered)
        elif self._buf.exists():
            self._buf.clear()
        if out:
            yield pd.DataFrame(out, columns=_COLS)

    def close(self) -> None:  # no external resources
        pass


def stateful_debounce_tws(events: DataFrame, key_col: str = "key") -> DataFrame:
    """``transformWithStateInPandas`` form of the exact debounce. Requires the
    RocksDB state store provider (set by the caller/session):
    ``spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``.
    """
    if not _HAVE_TWS:  # pragma: no cover
        raise NotImplementedError("transformWithState requires PySpark >= 4")
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=DebounceProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
