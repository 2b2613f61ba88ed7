"""Round-trip and property tests for the hand-rolled pgcapture protobuf wire
codec (pb/pgcapture.proto:16-59 semantics; no protobuf package dependency)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pgcapture_spark.functions.protowire import (
    _read_varint,
    _varint,
    build_begin,
    build_change,
    build_commit,
    build_field,
    parse_message,
)


class TestVarint:
    @given(st.integers(min_value=0, max_value=2**64 - 1))
    @settings(max_examples=200)
    def test_roundtrip(self, n):
        val, pos = _read_varint(_varint(n), 0)
        assert val == n and pos == len(_varint(n))

    def test_known_encodings(self):
        # protobuf reference vectors
        assert _varint(0) == b"\x00"
        assert _varint(1) == b"\x01"
        assert _varint(127) == b"\x7f"
        assert _varint(128) == b"\x80\x01"
        assert _varint(300) == b"\xac\x02"


class TestChangeRoundtrip:
    def test_insert_with_null_and_toast(self):
        new = [
            build_field("a", 20, b"\x00\x01"),
            build_field("b", 25, None),  # oneof unset = explicit SQL NULL
            # column "c" omitted entirely = unchanged TOAST
        ]
        msg = build_change("INSERT", "public", "t", new)
        p = parse_message(msg)
        assert p["op"] == "INSERT"
        assert p["schema"] == "public" and p["table"] == "t"
        assert [f["name"] for f in p["new_fields"]] == ["a", "b"]
        a, b = p["new_fields"]
        assert a["bin"] == b"\x00\x01" and a["has_val"] and a["oid"] == 20
        assert b["bin"] is None and not b["has_val"]  # NULL, not TOAST
        assert p["old_fields"] == []

    def test_delete_carries_old_key_only(self):
        old = [build_field("k", 20, b"\x2a")]
        p = parse_message(build_change("DELETE", "s", "t", [], old))
        assert p["op"] == "DELETE"
        assert p["new_fields"] == []
        assert [f["name"] for f in p["old_fields"]] == ["k"]

    def test_update_op_enum_zero_default(self):
        # proto3 omits zero-valued varints: INSERT (op=0) must survive that
        p_ins = parse_message(build_change("INSERT", "s", "t", []))
        p_upd = parse_message(build_change("UPDATE", "s", "t", []))
        assert p_ins["op"] == "INSERT" and p_upd["op"] == "UPDATE"

    @given(st.binary(min_size=0, max_size=64), st.integers(1, 100000))
    @settings(max_examples=50)
    def test_field_bytes_roundtrip(self, payload, oid):
        p = parse_message(build_change("UPDATE", "s", "t", [build_field("x", oid, payload)]))
        [f] = p["new_fields"]
        assert f["bin"] == payload and f["oid"] == oid


class TestTxFrames:
    def test_begin_commit(self):
        b = parse_message(build_begin(12345, 777, xid=9))
        assert b["op"] == "BEGIN" and b["commit_us"] == 777 and b["xid"] == 9
        c = parse_message(build_commit(12345, 12346, 777))
        assert c["op"] == "COMMIT" and c["commit_us"] == 777

    def test_zero_commit_time_roundtrips(self):
        # commit_us = 0 is omitted on the wire (proto3 default); the parser
        # must still yield a BEGIN with commit_us None-or-0 semantics
        b = parse_message(build_begin(1, 0, xid=0))
        assert b["op"] == "BEGIN"
        assert not b["commit_us"]  # 0 or None — never a wrong value


class TestCheckpoint:
    @given(st.integers(0, 2**64 - 1), st.integers(0, 2**32 - 1), st.binary(max_size=32))
    @settings(max_examples=100)
    def test_proto_roundtrip(self, lsn, seq, data):
        from pgcapture_spark.functions.protowire import build_checkpoint, parse_checkpoint

        p = parse_checkpoint(build_checkpoint(lsn, seq, data))
        assert (p["lsn"], p["seq"], p["data"]) == (lsn, seq, data)

    @given(st.integers(0, 2**64 - 1), st.integers(0, 2**32 - 1))
    @settings(max_examples=100)
    def test_key_roundtrip(self, lsn, seq):
        from pgcapture_spark.functions.protowire import (
            checkpoint_from_key,
            checkpoint_to_key,
        )

        assert checkpoint_from_key(checkpoint_to_key(lsn, seq)) == (lsn, seq)

    def test_key_matches_pglogrepl_format(self):
        from pgcapture_spark.functions.protowire import checkpoint_to_key

        # pglogrepl.LSN(0x1_0000_002A).String() == "1/2A"; seq lowercase hex
        assert checkpoint_to_key((1 << 32) | 0x2A, 255) == "1/2A|ff"
        assert checkpoint_to_key(0, 0) == "0/0|0"
