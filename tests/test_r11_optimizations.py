"""Round-11 optimization contracts for the driver-memoized tx registry:
lifetime growth is BOUNDED (the every-Kth delta-compaction fold now prunes
below the safe ord watermark), the driver memo always mirrors the committed
parquet content (restart rehydration included), first-writer-wins survives
the memo path, and an outstanding deadletter holds the prune watermark down
so parked frames can still resolve their commit timestamps on replay."""

from __future__ import annotations

import json
import os
import shutil
import tempfile


_SCHEMA = (
    "lsn bigint, seq int, ord bigint,"
    " f struct<op:string, parse_error:string, commit_us:bigint, n:int>"
)


def _batch_df(spark, lsn: int):
    """One micro-batch: a Begin for tx ``lsn`` plus one data row — ords are
    the engine's lsn*100+seq log positions, so batches arrive in ord order
    (the log contract the prune watermark relies on)."""
    return spark.createDataFrame(
        [
            (lsn, 0, lsn * 100, ("BEGIN", None, lsn * 7, 0)),
            (lsn, 1, lsn * 100 + 1, ("INSERT", None, None, 1)),
        ],
        _SCHEMA,
    )


def _reg_rows(reg) -> dict[int, int]:
    return {r["lsn"]: r["_commit_us"] for r in reg.collect()}


def test_tx_registry_autoprune_bounds_lifetime_growth(spark):
    """N Begin-carrying batches -> registry rows stay bounded: every
    delta_compact_threshold-th commit folds base + deltas into one fresh
    version AND drops entries whose whole tx lies strictly below the
    batch's min data ord (no future frame can reference them under the
    ordered-log contract). The returned registry must still resolve every
    lsn the CURRENT batch carries, and the committed parquet content must
    equal the memo-backed frame at every step."""
    from pgcapture_spark.streaming.pipeline import probe_and_fold_tx
    from pgcapture_spark.streaming.state import SnapshotState

    d = tempfile.mkdtemp(prefix="t_r11_txprune_")
    try:
        tx = SnapshotState(spark, f"{d}/txreg")
        tx.delta_compact_threshold = 3
        n_batches = 12
        for b in range(n_batches):
            lsn = 10 + b
            _, reg = probe_and_fold_tx(_batch_df(spark, lsn), tx, batch_id=b)
            got = _reg_rows(reg)
            # the current batch's tx always resolves
            assert got[lsn] == lsn * 7
            # memo-backed frame == committed parquet content
            assert got == _reg_rows(tx.read())
        # growth is bounded: with threshold 3 the fold+prune ran several
        # times, and each prune drops everything below the then-current
        # batch's min ord — far fewer than one row per batch survives
        final = _reg_rows(tx.read())
        assert len(final) < n_batches, final
        # entries below the last prune watermark are gone; the newest ones
        # (at or above it) survive
        assert (10 + n_batches - 1) in final
        # delta fan-in stayed bounded on disk
        m = json.load(open(f"{d}/txreg/MANIFEST.json"))
        assert len(m.get("deltas", [])) <= tx.delta_compact_threshold
        dirs = [
            n for n in os.listdir(f"{d}/txreg")
            if os.path.isdir(os.path.join(f"{d}/txreg", n))
        ]
        assert len(dirs) <= tx.delta_compact_threshold + 1
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_tx_registry_memo_rehydrates_and_first_writer_wins(spark):
    """A fresh SnapshotState on the same root (process restart) rehydrates
    the memo from the committed registry: a re-delivered Begin with a
    CONFLICTING commit_us still loses to the first writer, and the returned
    registry equals the parquet content."""
    from pgcapture_spark.streaming.pipeline import probe_and_fold_tx
    from pgcapture_spark.streaming.state import SnapshotState

    d = tempfile.mkdtemp(prefix="t_r11_txmemo_")
    try:
        tx = SnapshotState(spark, f"{d}/txreg")
        b0 = spark.createDataFrame(
            [(10, 0, 1000, ("BEGIN", None, 111, 0))], _SCHEMA
        )
        probe_and_fold_tx(b0, tx, batch_id=0)

        # restart: new object, no memo — must rehydrate from parquet
        tx2 = SnapshotState(spark, f"{d}/txreg")
        b1 = spark.createDataFrame(
            [
                (10, 0, 1000, ("BEGIN", None, 999, 0)),  # conflicting dup
                (20, 0, 2000, ("BEGIN", None, 222, 0)),
            ],
            _SCHEMA,
        )
        _, reg = probe_and_fold_tx(b1, tx2, batch_id=1)
        assert _reg_rows(reg) == {10: 111, 20: 222}
        assert _reg_rows(tx2.read()) == {10: 111, 20: 222}
        # the delta dir holds ONLY the genuinely-new row (O(new) written)
        m = json.load(open(f"{d}/txreg/MANIFEST.json"))
        assert m["deltas"] == ["v000000000001.delta"]
        delta = spark.read.parquet(f"{d}/txreg/v000000000001.delta")
        assert _reg_rows(delta) == {20: 222}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_tx_registry_autoprune_respects_deadletter_floor(spark):
    """An outstanding parked batch holds the prune watermark at its min ord:
    entries the parked frames will need on replay survive compaction even
    when the live stream's position has moved far past them."""
    from pgcapture_spark.streaming.pipeline import probe_and_fold_tx
    from pgcapture_spark.streaming.state import SnapshotState

    d = tempfile.mkdtemp(prefix="t_r11_txfloor_")
    try:
        tx = SnapshotState(spark, f"{d}/txreg")
        tx.delta_compact_threshold = 2
        floors = {}
        for b in range(8):
            lsn = 10 + b
            # a batch parked early in the stream pins the floor at ord 1000
            floor = 1000 if b >= 2 else None
            _, reg = probe_and_fold_tx(
                _batch_df(spark, lsn), tx, batch_id=b, deadletter_floor=floor
            )
            floors[b] = _reg_rows(reg)
        final = _reg_rows(tx.read())
        # lsn 10 occupies ords [1000, 1099] — at/above the floor, so every
        # fold kept it despite the stream position reaching ord ~1700
        assert 10 in final and final[10] == 70
        # and without the floor the same entry WOULD have been pruned
        d2 = tempfile.mkdtemp(prefix="t_r11_txfloor2_")
        try:
            tx2 = SnapshotState(spark, f"{d2}/txreg")
            tx2.delta_compact_threshold = 2
            for b in range(8):
                _, reg2 = probe_and_fold_tx(
                    _batch_df(spark, 10 + b), tx2, batch_id=b
                )
            assert 10 not in _reg_rows(tx2.read())
        finally:
            shutil.rmtree(d2, ignore_errors=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_wire_probe_bucket_agg_matches_fold(spark):
    """The fused key-bucket aggregate (riding the wire consumers' protocol
    probe) must reproduce BucketedSnapshotState.touched_buckets over the
    decoded fold's key column EXACTLY — same coalesced key value (DELETE key
    from old_fields), same decoded type (hash agreement), same
    pmod(hash, n) id space, per table. Covers I/U/D, a DELETE carrying the
    key only in its old tuple, a NULL-key row, and multi-table tagging."""
    from pyspark.sql import functions as F

    from pgcapture_spark.functions.pgtypes import enc_int4, enc_int8
    from pgcapture_spark.streaming.pipeline import _wire_key_bucket_agg

    wire_schema = (
        "lsn bigint, seq int, ord bigint,"
        " f struct<op:string, commit_us:bigint, table:string,"
        " new_fields:array<struct<name:string,oid:int,bin:binary,"
        "has_val:boolean,fmt:string>>,"
        " old_fields:array<struct<name:string,oid:int,bin:binary,"
        "has_val:boolean,fmt:string>>, parse_error:string>"
    )

    def nf(name, oid, b):
        return (name, oid, b, b is not None, "b")

    n_buckets = 7
    rows = [
        # INSERT table a, key 101 (int4)
        (1, 0, 100, ("INSERT", None, "a", [nf("k", 23, enc_int4(101))], None, None)),
        # UPDATE table a, key 202 new + 101 old (new wins the coalesce)
        (1, 1, 101, ("UPDATE", None, "a",
                     [nf("k", 23, enc_int4(202))],
                     [nf("k", 23, enc_int4(101))], None)),
        # DELETE table a: key ONLY in old_fields
        (1, 2, 102, ("DELETE", None, "a", None,
                     [nf("k", 23, enc_int4(303))], None)),
        # NULL key row (no key field at all) — hash(NULL) bucket, not dropped
        (1, 3, 103, ("INSERT", None, "a", [nf("x", 23, enc_int4(9))], None, None)),
        # table b rows (int8 key) must not leak into a's set and vice versa
        (2, 0, 200, ("INSERT", None, "b", [nf("id", 20, enc_int8(5_000_000_000))], None, None)),
        ("3", 0, 300, ("BEGIN", 777, "a", None, None, None)),
    ]
    rows = [(int(r[0]), r[1], r[2], r[3]) for r in rows]
    parsed = spark.createDataFrame(rows, wire_schema)

    probe = parsed.agg(
        _wire_key_bucket_agg("k", 23, n_buckets, "a", "_kb_a"),
        _wire_key_bucket_agg("id", 20, n_buckets, "b", "_kb_b"),
    ).collect()[0]

    # the oracle: decode the fold's key column the consumers' way and bucket
    def expected(vals, typ):
        df = spark.createDataFrame([(v,) for v in vals], f"k {typ}")
        return sorted(
            r[0]
            for r in df.select(
                F.pmod(F.hash("k"), F.lit(n_buckets)).alias("b")
            ).distinct().collect()
        )

    assert sorted(probe["_kb_a"]) == expected([101, 202, 303, None], "int")
    assert sorted(probe["_kb_b"]) == expected([5_000_000_000], "bigint")


def test_quarantine_tracks_parked_ord_floor(spark):
    """make_quarantine records the minimum ord across parked batches —
    the deadletter horizon the tx-registry auto-prune must respect."""
    from pgcapture_spark.streaming.pipeline import make_quarantine

    d = tempfile.mkdtemp(prefix="t_r11_qfloor_")
    try:
        skip_streak, quarantine = make_quarantine("t", d, max_consecutive_skips=5)
        assert skip_streak["ord_floor"] is None
        b1 = spark.createDataFrame(
            [(1, 0, 5000, b"x")], "lsn bigint, seq int, ord bigint, data binary"
        )
        quarantine(b1, 0, "test")
        assert skip_streak["ord_floor"] == 5000
        b2 = spark.createDataFrame(
            [(1, 0, 3000, b"x")], "lsn bigint, seq int, ord bigint, data binary"
        )
        quarantine(b2, 1, "test")
        assert skip_streak["ord_floor"] == 3000  # min across parks
        # parked parquet still lands under deadletter/ (unchanged contract)
        assert sorted(os.listdir(os.path.join(d, "deadletter"))) == [
            "batch_000000000000",
            "batch_000000000001",
        ]
    finally:
        shutil.rmtree(d, ignore_errors=True)
