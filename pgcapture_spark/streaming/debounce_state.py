"""Exact stateful debounce — the reference's ``DebounceHandler`` rules ported
to ``applyInPandasWithState`` (SURVEY §2 C2, §7 hard part 3).

Reference semantics (pkg/pgcapture/debounce.go:87-155):

- the handler keeps AT MOST ONE buffered UPDATE per key;
- an arriving INSERT or DELETE flushes the buffered event for that key (if
  any), then fires immediately itself (debounce.go:106-118);
- an arriving UPDATE compares checkpoints with the buffered one
  (debounce.go:120-137):
    * dump events (``lsn == 0``, emitted by the DBLog gateway with
      checkpoint {0, dumpID} — pkg/dblog/gateway.go:198-212) ALWAYS count
      as latest → replace the buffer,
    * strictly newer (lsn, seq) → replace the buffer (older one dropped,
      i.e. committed without handling),
    * exactly equal checkpoint → flush the buffered event, then store the
      arrival,
    * older → drop the arrival;
- a periodic timer flushes the buffer every Interval (debounce.go:87-104) —
  here the GroupState processing-time timeout.

Events are processed in ARRIVAL order (``arr`` column), not checkpoint order —
the whole point of the dump-latest rule is that a dump row's checkpoint
(lsn=0) says nothing about its arrival position.

Scale: state is one row per key (the buffered event), partitioned by key by
the streaming state store; each micro-batch shuffles once on the key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# emitted-event schema: the event columns + why it was emitted
OUTPUT_SCHEMA = (
    "key bigint, lsn bigint, seq int, arr bigint, op string, "
    "flush_kind string"
)
STATE_SCHEMA = "lsn bigint, seq int, arr bigint, op string"


def _is_newer(e_lsn: int, e_seq: int, b_lsn: int, b_seq: int) -> int:
    """-1 older, 0 equal, +1 newer; dump (lsn=0) always newest
    (debounce.go:120-126)."""
    if e_lsn == 0:
        return 1
    if (e_lsn, e_seq) == (b_lsn, b_seq):
        return 0
    return 1 if (e_lsn, e_seq) > (b_lsn, b_seq) else -1


def _make_debounce_fn(interval_ms: int | None):
    def _debounce_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        out: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                b_lsn, b_seq, b_arr, b_op = state.get
                out.append((k, b_lsn, b_seq, b_arr, b_op, "timer"))
                state.remove()
            yield pd.DataFrame(out, columns=["key", "lsn", "seq", "arr", "op", "flush_kind"])
            return

        buffered = tuple(state.get) if state.exists else None
        rows: list[tuple] = []
        for pdf in pdfs:
            rows.extend(
                (int(r.lsn), int(r.seq), int(r.arr), str(r.op))
                for r in pdf.itertuples(index=False)
            )
        rows.sort(key=lambda r: r[2])  # arrival order within the batch

        for e_lsn, e_seq, e_arr, e_op in rows:
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
                        buffered = (e_lsn, e_seq, e_arr, e_op)  # older one dropped
                    elif cmp == 0:
                        out.append((k, *buffered, "flush_by_equal"))
                        buffered = (e_lsn, e_seq, e_arr, e_op)
                    # cmp < 0: arrival dropped

        if buffered is not None:
            state.update(buffered)
            if interval_ms is not None:
                state.setTimeoutDuration(interval_ms)
        elif state.exists:
            state.remove()

        yield pd.DataFrame(out, columns=["key", "lsn", "seq", "arr", "op", "flush_kind"])

    return _debounce_fn


def stateful_debounce(
    events: DataFrame, key_col: str = "key", interval_ms: int | None = None
) -> DataFrame:
    """Apply the exact DebounceHandler rules to a STREAMING events DataFrame
    with columns (key, lsn, seq, arr, op). Returns the emitted-event stream.

    ``interval_ms`` is the flush timer (reference DebounceHandler.Interval).
    ``None`` disables it — buffered UPDATEs then stay buffered until an
    INSERT/DELETE flushes them, and an availableNow run terminates as soon as
    the data is drained (with timers pending, Structured Streaming keeps
    ticking empty batches until they fire)."""
    timeout = (
        GroupStateTimeout.NoTimeout if interval_ms is None else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy(key_col).applyInPandasWithState(
        _make_debounce_fn(interval_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
