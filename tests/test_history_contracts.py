"""Contract tests for history/layout operators (weighted reservoir, Z-order).

Pins the two parameter-contract fixes: non-positive weights hold ZERO lottery
tickets (Spark's ``sequence(0, w-1)`` descends for w <= 0, which would mint
phantom tickets), ``max_weight`` actually clamps, and ``zorder_layout``
emits EXACTLY ``n_shards`` shard ids for non-power-of-two shard counts
(a fixed cell width emits an extra runt shard whenever the code space is
not divisible by ``n_shards``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pgcapture_spark.operators.history import weighted_reservoir, zorder_layout


def test_zero_and_negative_weights_never_sampled(spark):
    rows = [(f"d{i}", "en", 1 if i % 2 == 0 else 0) for i in range(20)]
    rows += [("dneg", "en", -3)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "w"])
    got = weighted_reservoir(docs, "w", "lang", "doc_id", k=50).collect()
    ids = {r["doc_id"] for r in got}
    assert ids == {f"d{i}" for i in range(20) if i % 2 == 0}
    assert all(r["w"] == 1 for r in got)


def test_max_weight_clamps_ticket_count(spark):
    docs = spark.createDataFrame(
        [("big", "en", 500), ("small", "en", 1)], ["doc_id", "lang", "w"]
    )
    got = {r["doc_id"]: r["w"] for r in
           weighted_reservoir(docs, "w", "lang", "doc_id", k=5, max_weight=3).collect()}
    assert got["big"] == 3
    assert got["small"] == 1


def test_zorder_exact_shard_count_non_divisor(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    for n in (32, 48, 100):
        out = zorder_layout(events, n_shards=n)
        stats = out.agg(
            F.min("shard").alias("lo"), F.max("shard").alias("hi")
        ).collect()[0]
        assert stats["lo"] >= 0
        assert stats["hi"] <= n - 1, f"n_shards={n} produced shard {stats['hi']}"


def test_zorder_negative_user_ids_stay_in_range(spark):
    """Negative ids under C-style % would emit negative 'bits' and corrupt
    the Morton code; the positive-remainder bucket keeps zval and shard in
    range for the full id domain."""
    import datetime

    rows = [
        (i, uid, datetime.datetime(2024, 1, 1, h, m))
        for i, (uid, h, m) in enumerate(
            [(-1, 0, 0), (-255, 23, 59), (-(2**40), 12, 30), (7, 6, 6)]
        )
    ]
    events = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = zorder_layout(events, n_shards=32, nbits=8).collect()
    assert len(out) == 4
    for r in out:
        assert 0 <= r["b_user"] < 256, r
        assert 0 <= r["zval"] < (1 << 16), r
        assert 0 <= r["shard"] < 32, r


def test_zorder_shard_monotone_in_zval(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = zorder_layout(events, n_shards=48)
    ranges = out.groupBy("shard").agg(
        F.min("zval").alias("lo"), F.max("zval").alias("hi")
    )
    a, b = ranges.alias("a"), ranges.alias("b")
    bad = a.join(
        b, (F.col("a.shard") < F.col("b.shard")) & (F.col("a.hi") > F.col("b.lo"))
    ).count()
    assert bad == 0
