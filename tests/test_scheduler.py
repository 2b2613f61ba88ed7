"""Scheduler contract tests — mirrors the reference's scheduler_test.go
properties: FIFO order, exactly-once completion, front-requeue with
exponential cooldown, watermark-guard requeue."""

from __future__ import annotations

import pytest

from pgcapture_spark.operators.scheduler import Chunk, make_chunks, run_backfill


def test_fifo_exactly_once():
    chunks = make_chunks(64, 8)
    seen = []
    run_backfill(chunks, lambda c: seen.append((c.lo, c.hi)), sleeper=lambda s: None)
    assert seen == [(i, i + 7) for i in range(0, 64, 8)]


def test_requeue_backoff_schedule():
    fails = {"n": 0}

    def flaky(c: Chunk):
        if c.lo == 8 and fails["n"] < 3:
            fails["n"] += 1
            raise RuntimeError("boom")

    slept: list[float] = []
    report = run_backfill(
        make_chunks(24, 8), flaky, sleeper=slept.append
    )
    # 2s * 2^(n-1): 2, 4, 8
    assert slept == [2.0, 4.0, 8.0]
    assert [r[:2] for r in report.requeues] == [(8, 15)] * 3
    assert report.completed == [(0, 7), (8, 15), (16, 23)]


def test_guard_requeues_then_gives_up():
    calls = {"n": 0}

    def guard():
        calls["n"] += 1
        return False

    with pytest.raises(RuntimeError, match="fall-behind"):
        run_backfill(
            make_chunks(8, 8), lambda c: None, guard=guard, max_attempts=3,
            sleeper=lambda s: None,
        )
    assert calls["n"] == 3
