"""pglogical_output wire framing — the reference's SECOND wire dialect
(pkg/decode/pglogical.go:43-175). Same logical content as pgoutput, different
framing:

- every message carries a flags byte after the tag
- ``B``: u8 flags, u64 final_lsn, u64 commit_time, u32 xid (len 22)
- ``C``: u8 flags, u64 commit_lsn, u64 end_lsn, u64 commit_time (len 26)
- ``R``: u8 flags, u32 oid, String8 namespace, String8 relname, ``'A'``,
  i16 ncols, per column ``'C'`` + u8 flags + ``'N'`` + String16 name —
  NO type OIDs: types/identity come from the schema loader (the catalog's
  role here), exactly the reference's split of duties
- ``I``/``U``/``D``: u8 flags, u32 oid, then ('K'|'O'|'N')-tagged tuples
- tuple: ``'T'`` marker, i16 ncols, per column u8 format ∈ {b,t,n,u} with
  u32-length datums for b/t (text NUL-trimmed)

String8 = u8 length + bytes; String16 = u16 length + bytes. The parser
returns the SAME frame struct as the pgoutput dialect (rel_cols carry oid 0 /
flag 0 — the consumer merges types and identity from its schema registry), so
both dialects collapse to one downstream pipeline, mirroring the reference's
single ``pb.Message`` surface.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import functions as F

from pgcapture_spark.functions.pgoutput import (
    _FRAME_TYPE,
    _OPS,
    _Reader,
    _read_tuple,
    empty_frame,
    make_safe,
)


# ---------------------------------------------------------------- builders

def _str8(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">B", len(b)) + b


def _str16(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">H", len(b)) + b


def build_begin(final_lsn: int, commit_us: int, xid: int) -> bytes:
    return b"B" + struct.pack(">BQQI", 0, final_lsn, commit_us, xid)


def build_commit(commit_lsn: int, end_lsn: int, commit_us: int) -> bytes:
    return b"C" + struct.pack(">BQQQ", 0, commit_lsn, end_lsn, commit_us)


def build_relation(oid: int, nsp: str, name: str, cols: list[str]) -> bytes:
    out = b"R\x00" + struct.pack(">I", oid) + _str8(nsp) + _str8(name)
    out += b"A" + struct.pack(">h", len(cols))
    for cname in cols:
        out += b"C\x00N" + _str16(cname)
    return out


def build_tuple(fields: list[tuple[str, bytes | None]]) -> bytes:
    out = b"T" + struct.pack(">h", len(fields))
    for fmt, datum in fields:
        out += fmt.encode()
        if fmt in ("b", "t"):
            out += struct.pack(">I", len(datum)) + datum
    return out


def build_row_change(
    op: str,
    oid: int,
    new_tuple: list[tuple[str, bytes | None]] | None,
    old_tuple: list[tuple[str, bytes | None]] | None = None,
    old_kind: str = "K",
) -> bytes:
    out = op.encode() + b"\x00" + struct.pack(">I", oid)
    if old_tuple is not None:
        out += old_kind.encode() + build_tuple(old_tuple)
    if new_tuple is not None:
        out += b"N" + build_tuple(new_tuple)
    return out


# ----------------------------------------------------------------- parser

def _read_tuple_pgl(r: _Reader) -> list[dict]:
    if chr(r.u8()) != "T":
        raise ValueError("expected T tuple marker")
    return _read_tuple(r)


def parse_frame(data: bytes) -> dict:
    out = empty_frame()
    tag = chr(data[0])
    r = _Reader(data)
    r.u8()  # tag
    r.u8()  # flags — every pglogical message carries one
    if tag == "B":
        if len(data) != 22:
            raise ValueError("begin wrong length")
        out["op"] = "BEGIN"
        out["final_lsn"], out["commit_us"] = r.u64(), r.u64()
        out["xid"] = r.u32()
    elif tag == "C":
        if len(data) != 26:
            raise ValueError("commit wrong length")
        out["op"] = "COMMIT"
        out["commit_lsn"], out["end_lsn"], out["commit_us"] = r.u64(), r.u64(), r.u64()
    elif tag == "R":
        out["op"] = "RELATION"
        out["rel_oid"] = r.u32()
        # bounds-checked takes (not raw slices): a frame cut inside a name
        # must RAISE so safe mode quarantines it — a silently-truncated
        # relation name would otherwise become the PERSISTED schema
        out["rel_nsp"] = r.take(r.u8()).decode("utf-8")
        out["rel_name"] = r.take(r.u8()).decode("utf-8")
        if chr(r.u8()) != "A":
            raise ValueError("relation expected A")
        cols = []
        for _ in range(r.i16()):
            if chr(r.u8()) != "C":
                raise ValueError("relation expected C")
            r.u8()  # column flags
            if chr(r.u8()) != "N":
                raise ValueError("relation expected N")
            (ln,) = struct.unpack_from(">H", r.b, r.i)
            r.i += 2
            name = r.take(ln).decode("utf-8")
            # no type oid / key flag on the wire — schema loader's job
            cols.append({"flag": 0, "name": name, "oid": 0})
        out["rel_cols"] = cols
    elif tag in ("I", "U", "D"):
        out["op"] = _OPS[ord(tag)]
        out["rel_oid"] = r.u32()
        kind = chr(r.u8())
        if kind != "N":
            out["old_tuple"] = _read_tuple_pgl(r)
            if tag == "U":
                kind = chr(r.u8())
        if kind == "N":
            out["new_tuple"] = _read_tuple_pgl(r)
    else:
        raise ValueError(f"unknown frame tag {tag!r}")
    if r.i != len(data):
        # trailing bytes = corruption (see pgoutput.parse_frame)
        raise ValueError(f"{r.i} bytes parsed, {len(data)} in frame")
    return out


# corrupt bytes → op='ERROR' frame (shared wrapper, see pgoutput.make_safe)
parse_frame_safe = make_safe(parse_frame, empty_frame)


def parse_frames_udf(safe: bool = False):
    """Arrow-batched pglogical frame parser — same output struct as the
    pgoutput dialect, so downstream pipelines are dialect-agnostic.
    ``safe=True`` maps corrupt frames to op='ERROR' rows."""
    fn = parse_frame_safe if safe else parse_frame

    @F.pandas_udf(f"struct<{_FRAME_TYPE}>")
    def _udf(data: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([fn(bytes(b)) for b in data])

    return _udf
