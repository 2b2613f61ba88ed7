"""pgcapture protobuf wire framing — build and parse the reference's actual
on-wire Message bytes (pb/pgcapture.proto:16-59: Message{oneof Begin=1,
Commit=2, Change=3}, Change{op=1, schema=2, table=3, repeated Field new=4,
old=5}, Field{name=1, oid=2, oneof binary=3 / text=4}) using a hand-rolled
proto3 wire-format codec — varint + length-delimited primitives only, no
protobuf package dependency.

Presence model (pkg/decode/decoder.go:106-114): a column OMITTED from
``new`` is an unchanged TOAST value; a Field present with NEITHER binary nor
text set (empty oneof) is an explicit SQL NULL. proto3 cannot distinguish
"oneof unset" from "absent message fields" except by the oneof itself, which
is exactly the reference's NULL encoding.

Spark shape: mirrors functions/pgoutput.py — builders are the fixture edge
(the real producer is the reference's pg2pulsar), ONE Arrow-batched pandas
UDF parses the message stream into the generic-feed struct in a single
Python crossing; because proto Fields carry (name, oid) inline, the parsed
output IS the generic binary feed — no relation zip step at all.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pgcapture_spark.functions.pgoutput import make_safe

# ------------------------------------------------------------ wire primitives

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _key(field_no: int, wire_type: int) -> bytes:
    return _varint((field_no << 3) | wire_type)


def _ld(field_no: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _key(field_no, 2) + _varint(len(payload)) + payload


def _vi(field_no: int, value: int) -> bytes:
    """Varint field (wire type 0); proto3 omits zero-valued scalars."""
    if value == 0:
        return b""
    return _key(field_no, 0) + _varint(value)


# ----------------------------------------------------------------- builders

_OPNUM = {"INSERT": 0, "UPDATE": 1, "DELETE": 2}
_OPNAME = {v: k for k, v in _OPNUM.items()}


def build_field(
    name: str, oid: int, bin_val: bytes | None, present: bool = True, fmt: str = "b"
) -> bytes:
    """Field{name=1, oid=2, oneof binary=3 / text=4}; ``bin_val=None`` with
    ``present`` = explicit NULL (oneof unset). ``fmt='t'`` emits the datum on
    the text arm of the oneof."""
    out = _ld(1, name.encode()) + _vi(2, oid)
    if present and bin_val is not None:
        out += _ld(4 if fmt == "t" else 3, bin_val)
    return out


def build_change(
    op: str,
    schema: str,
    table: str,
    new: list[bytes],
    old: list[bytes] | None = None,
) -> bytes:
    """Message{change=3} bytes. ``new``/``old`` are pre-built Field payloads."""
    ch = _vi(1, _OPNUM[op]) + _ld(2, schema.encode()) + _ld(3, table.encode())
    for f in new:
        ch += _ld(4, f)
    for f in old or ():
        ch += _ld(5, f)
    return _ld(3, ch)


def build_begin(final_lsn: int, commit_us: int, xid: int) -> bytes:
    return _ld(1, _vi(1, final_lsn) + _vi(2, commit_us) + _vi(3, xid))


def build_commit(commit_lsn: int, end_lsn: int, commit_us: int) -> bytes:
    return _ld(2, _vi(1, commit_lsn) + _vi(2, end_lsn) + _vi(3, commit_us))


# ------------------------------------------------------------------- parser

def _scan(buf: bytes):
    """Yield (field_no, wire_type, value) over one message's fields."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field_no, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            if pos + ln > n:
                # python slicing would silently truncate — a frame cut
                # mid-field (or an inflated length prefix) must RAISE so
                # safe mode can quarantine it, not parse "successfully"
                # with missing fields masquerading as TOAST-absent columns.
                # (Truncation that removes WHOLE fields is undetectable at
                # the proto layer by design — proto3 carries no message
                # length or checksum; that class is the transport's job.)
                raise ValueError(
                    f"length-delimited field overruns buffer "
                    f"({pos}+{ln} > {n})"
                )
            val = buf[pos : pos + ln]
            pos += ln
        else:  # 1/5: fixed64/fixed32 — not used by pgcapture.proto
            raise ValueError(f"unsupported wire type {wt}")
        yield field_no, wt, val


def _req_int(v, what: str, bound: int = 2**63 - 1) -> int:
    """Validate a varint destined for a typed Spark column INSIDE the
    parser: an oversized (or wrong-wire-type) value must raise HERE so safe
    mode converts it to an op='ERROR' row — otherwise the pandas→Arrow cast
    overflows OUTSIDE make_safe and kills the stream with no quarantine."""
    if not isinstance(v, int) or v < 0 or v > bound:
        raise ValueError(f"{what} out of range for its column: {v!r}")
    return v


def _parse_field(buf: bytes) -> dict:
    name, oid, bin_val, has_val, fmt = "", 0, None, False, "b"
    for fno, _, val in _scan(buf):
        if fno == 1:
            name = val.decode()
        elif fno == 2:
            oid = _req_int(val, "field oid", bound=2**31 - 1)  # int32 column
        elif fno == 3:
            bin_val, has_val, fmt = bytes(val), True, "b"
        elif fno == 4:  # text arm of the oneof: utf-8 datum, oid picks codec
            bin_val, has_val, fmt = bytes(val), True, "t"
    return {"name": name, "oid": oid, "bin": bin_val, "has_val": has_val, "fmt": fmt}


def empty_message() -> dict:
    """The None-filled Message dict (every _MSG_T field) — single source of
    truth shared by the parser and safe mode's ERROR record."""
    return {
        "op": None,
        "commit_us": None,
        "xid": None,
        "schema": None,
        "table": None,
        "new_fields": None,
        "old_fields": None,
        "parse_error": None,
    }


def parse_message(buf: bytes) -> dict:
    """One Message → flat dict (op, lsn metadata, field lists)."""
    out = empty_message()
    for fno, _, body in _scan(buf):
        if fno == 1:  # Begin
            out["op"] = "BEGIN"
            for f, _, v in _scan(body):
                if f == 2:
                    out["commit_us"] = _req_int(v, "begin commit_us")
                elif f == 3:
                    out["xid"] = _req_int(v, "begin xid")
        elif fno == 2:  # Commit
            out["op"] = "COMMIT"
            for f, _, v in _scan(body):
                if f == 3:
                    out["commit_us"] = _req_int(v, "commit commit_us")
        elif fno == 3:  # Change
            op_num = 0
            new, old = [], []
            for f, _, v in _scan(body):
                if f == 1:
                    op_num = v
                elif f == 2:
                    out["schema"] = v.decode()
                elif f == 3:
                    out["table"] = v.decode()
                elif f == 4:
                    new.append(_parse_field(v))
                elif f == 5:
                    old.append(_parse_field(v))
            out["op"] = _OPNAME[op_num]
            out["new_fields"] = new
            out["old_fields"] = old
        elif fno == 4:  # KeepAlive
            out["op"] = "KEEPALIVE"
    return out


_FIELDS_T = "array<struct<name:string,oid:int,bin:binary,has_val:boolean,fmt:string>>"
_MSG_T = (
    "op string, commit_us bigint, xid bigint, schema string, table string,"
    f" new_fields {_FIELDS_T}, old_fields {_FIELDS_T}, parse_error string"
)


# corrupt bytes → op='ERROR' message (shared wrapper, see pgoutput.make_safe)
parse_message_safe = make_safe(parse_message, empty_message)


def parse_messages_udf(safe: bool = False):
    """Arrow-batched Message parser: binary column → typed struct, one Python
    crossing for the whole stream (same contract as pgoutput.parse_frames_udf).
    ``safe=True`` maps corrupt messages to op='ERROR' rows."""
    fn = parse_message_safe if safe else parse_message

    @F.pandas_udf(f"struct<{_MSG_T}>")
    def _udf(data: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([fn(bytes(b)) for b in data])

    return _udf


# ----------------------------------------------- Checkpoint (pkg/cursor)

def build_checkpoint(lsn: int, seq: int, data: bytes = b"") -> bytes:
    """Checkpoint{lsn=1, seq=2, data=3} (pb/pgcapture.proto:10-14)."""
    out = _vi(1, lsn) + _vi(2, seq)
    if data:
        out += _ld(3, data)
    return out


def parse_checkpoint(buf: bytes) -> dict:
    out = {"lsn": 0, "seq": 0, "data": b""}
    for fno, _, val in _scan(buf):
        if fno == 1:
            out["lsn"] = val
        elif fno == 2:
            out["seq"] = val
        elif fno == 3:
            out["data"] = bytes(val)
    return out


def checkpoint_to_key(lsn: int, seq: int) -> str:
    """pkg/cursor/main.go:28-30: pglogrepl "%X/%X" LSN text + '|' + hex seq."""
    return f"{lsn >> 32:X}/{lsn & 0xFFFFFFFF:X}|{seq:x}"


def checkpoint_from_key(key: str) -> tuple[int, int]:
    lsn_s, seq_s = key.split("|")
    hi, lo = lsn_s.split("/")
    return (int(hi, 16) << 32) | int(lo, 16), int(seq_s, 16)
