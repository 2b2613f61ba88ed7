"""pgoutput wire framing: builder/parser round-trips and byte-level goldens
for every message type the reference's readers handle
(pkg/decode/pgoutput.go:71-175), plus the Arrow-batched frame-parser UDF."""

from __future__ import annotations

import struct

from pgcapture_spark.functions.pgoutput import (
    build_begin,
    build_commit,
    build_relation,
    build_row_change,
    build_tuple,
    parse_frame,
    parse_frames_udf,
)


def test_begin_golden_and_roundtrip():
    b = build_begin(0x0102030405060708, 123_456_789, 42)
    assert len(b) == 21 and b[0:1] == b"B"  # the reference's length check
    assert b[1:9] == bytes.fromhex("0102030405060708")
    f = parse_frame(b)
    assert (f["op"], f["final_lsn"], f["commit_us"], f["xid"]) == (
        "BEGIN", 0x0102030405060708, 123_456_789, 42,
    )


def test_commit_golden_and_roundtrip():
    c = build_commit(1000, 1001, 999)
    assert len(c) == 26 and c[0:1] == b"C"  # the reference's length check
    f = parse_frame(c)
    assert (f["op"], f["commit_lsn"], f["end_lsn"], f["commit_us"]) == (
        "COMMIT", 1000, 1001, 999,
    )


def test_relation_roundtrip_and_identity_guard():
    r = build_relation(
        16385, "public", "customer", "d",
        [("c_custkey", 20, True), ("c_name", 25, False)],
    )
    f = parse_frame(r)
    assert f["op"] == "RELATION"
    assert (f["rel_oid"], f["rel_nsp"], f["rel_name"], f["rel_ident"]) == (
        16385, "public", "customer", "d",
    )
    assert f["rel_cols"] == [
        {"flag": 1, "name": "c_custkey", "oid": 20},
        {"flag": 0, "name": "c_name", "oid": 25},
    ]
    # replica identity must be one of d/n/f/i — same guard as the reference
    bad = bytearray(r)
    bad[r.index(b"customer\x00") + len(b"customer\x00")] = ord("x")
    try:
        parse_frame(bytes(bad))
        raise AssertionError("expected bad replica identity to raise")
    except ValueError as e:
        assert "replica identity" in str(e)


def test_row_change_tuple_formats():
    # INSERT: b / n / u formats
    ins = build_row_change(
        "I", 7, [("b", struct.pack(">q", 5)), ("n", None), ("u", None)]
    )
    f = parse_frame(ins)
    assert f["op"] == "INSERT" and f["rel_oid"] == 7 and f["old_tuple"] is None
    assert [t["format"] for t in f["new_tuple"]] == ["b", "n", "u"]
    assert f["new_tuple"][0]["bin"] == struct.pack(">q", 5)
    assert f["new_tuple"][1]["bin"] is None

    # DELETE: key-only old image, no new tuple
    de = build_row_change("D", 7, None, [("b", b"\x2a"), ("n", None)], old_kind="K")
    f = parse_frame(de)
    assert f["op"] == "DELETE" and f["new_tuple"] is None
    assert [t["format"] for t in f["old_tuple"]] == ["b", "n"]

    # UPDATE with old key image AND new tuple
    up = build_row_change("U", 7, [("b", b"\x01")], [("b", b"\x02")], old_kind="K")
    f = parse_frame(up)
    assert f["op"] == "UPDATE"
    assert f["old_tuple"][0]["bin"] == b"\x02"
    assert f["new_tuple"][0]["bin"] == b"\x01"

    # text datum: trailing NUL trimmed (reference ReadTuple behavior)
    t = build_tuple([("t", b"abc\x00")])
    tf = parse_frame(b"I" + struct.pack(">I", 7) + b"N" + t)
    assert tf["new_tuple"][0]["bin"] == b"abc"


def test_parse_frames_udf_batch(spark):
    frames = [
        (1, build_begin(10, 999, 1)),
        (2, build_row_change("I", 7, [("b", struct.pack(">i", 3)), ("u", None)])),
        (3, build_commit(10, 11, 999)),
    ]
    df = spark.createDataFrame(frames, "i int, data binary")
    out = {r.i: r.f for r in df.select("i", parse_frames_udf()("data").alias("f")).collect()}
    assert out[1].op == "BEGIN" and out[1].final_lsn == 10
    assert out[2].op == "INSERT" and out[2].rel_oid == 7
    assert [t.format for t in out[2].new_tuple] == ["b", "u"]
    assert out[3].op == "COMMIT" and out[3].end_lsn == 11


# ---------------------------------------------------------- pglogical dialect

from pgcapture_spark.functions import pglogical as pgl


def test_pglogical_begin_commit_goldens():
    b = pgl.build_begin(10, 999, 7)
    assert len(b) == 22 and b[:2] == b"B\x00"  # the reference's length check
    f = pgl.parse_frame(b)
    assert (f["op"], f["final_lsn"], f["commit_us"], f["xid"]) == ("BEGIN", 10, 999, 7)
    c = pgl.build_commit(10, 11, 999)
    assert len(c) == 26
    f = pgl.parse_frame(c)
    assert (f["op"], f["commit_lsn"], f["end_lsn"]) == ("COMMIT", 10, 11)


def test_pglogical_relation_markers_and_no_oids():
    r = pgl.build_relation(16385, "public", "customer", ["c_custkey", "c_name"])
    # 'A' attribute-list marker, per-column 'C' + flags + 'N' + String16 name
    assert b"A\x00\x02C\x00N" in r
    f = pgl.parse_frame(r)
    assert f["op"] == "RELATION" and f["rel_nsp"] == "public"
    assert [c["name"] for c in f["rel_cols"]] == ["c_custkey", "c_name"]
    assert all(c["oid"] == 0 for c in f["rel_cols"])  # schema loader's job
    # missing 'T' tuple marker must raise (the reference's guard)
    bad = b"I\x00" + struct.pack(">I", 7) + b"N" + struct.pack(">h", 0)
    try:
        pgl.parse_frame(bad)
        raise AssertionError("expected missing tuple marker to raise")
    except ValueError as e:
        assert "T" in str(e)


def test_pglogical_row_change_roundtrip():
    up = pgl.build_row_change(
        "U", 9, [("b", b"\x01"), ("u", None)], [("b", b"\x02")], old_kind="K"
    )
    f = pgl.parse_frame(up)
    assert f["op"] == "UPDATE" and f["rel_oid"] == 9
    assert [t["format"] for t in f["new_tuple"]] == ["b", "u"]
    assert f["old_tuple"][0]["bin"] == b"\x02"
