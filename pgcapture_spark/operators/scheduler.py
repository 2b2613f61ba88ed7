"""Backfill chunk scheduler — the driver-side analog of the reference's
MemoryScheduler/Controller (pkg/dblog/scheduler.go:42-244, control.go:29-64).

Spark replaces the gateway-client fan-out with its own task scheduler, so what
remains is the ORCHESTRATION contract the reference implements:

- FIFO chunk order, at most ``max_in_flight`` outstanding (scheduler.go:91-97
  keeps 1 per client),
- failed chunks are requeued at the FRONT with exponential cooldown
  2^(n-1) * base capped at ``backoff_cap`` doublings (scheduler.go:209-223),
- every chunk is processed exactly once (delivery is retried, completion is
  recorded once),
- an optional watermark guard is re-checked before each attempt
  (dumper.go:172-186 — ErrLSNFallBehind requeues rather than fails).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class Chunk:
    lo: int
    hi: int
    attempts: int = 0


@dataclass
class BackfillReport:
    completed: list[tuple[int, int]] = field(default_factory=list)
    requeues: list[tuple[int, int, str]] = field(default_factory=list)
    cooldowns: list[float] = field(default_factory=list)


def run_backfill(
    chunks: list[Chunk],
    process: Callable[[Chunk], None],
    guard: Callable[[], bool] | None = None,
    max_attempts: int = 9,
    backoff_base_s: float = 2.0,
    backoff_cap: int = 8,
    sleeper: Callable[[float], None] = time.sleep,
) -> BackfillReport:
    """Drive the chunk queue to completion. ``process`` runs one partition-
    pruned read+merge (a Spark job); ``guard`` is the LSN watermark check."""
    report = BackfillReport()
    queue = list(chunks)
    while queue:
        chunk = queue.pop(0)
        if chunk.attempts > 0:
            cooldown = backoff_base_s * (2 ** (min(chunk.attempts, backoff_cap) - 1))
            report.cooldowns.append(cooldown)
            sleeper(cooldown)
        try:
            if guard is not None and not guard():
                raise RuntimeError("LSN fall-behind (watermark guard)")
            process(chunk)
            report.completed.append((chunk.lo, chunk.hi))
        except Exception as e:  # noqa: BLE001 — requeue semantics
            chunk.attempts += 1
            if chunk.attempts >= max_attempts:
                raise
            report.requeues.append((chunk.lo, chunk.hi, str(e)))
            queue.insert(0, chunk)  # front-requeue, scheduler.go:151-170
    return report


def make_chunks(n_buckets: int, chunk_size: int) -> list[Chunk]:
    """Bucket ranges — the relpages→page-range chunking analog
    (example/schedule/main.go:23-42)."""
    return [
        Chunk(lo, min(lo + chunk_size - 1, n_buckets - 1))
        for lo in range(0, n_buckets, chunk_size)
    ]
