"""pgoutput wire framing — parse (and, at the fixture edge, build) the actual
logical-replication message bytes.

Message formats (the public pgoutput protocol; framing mirrored by the
reference's readers, pkg/decode/pgoutput.go:71-175):

- ``B``: u64 final_lsn, u64 commit_time (µs since 2000-01-01), u32 xid
- ``C``: u8 flags, u64 commit_lsn, u64 end_lsn, u64 commit_time
- ``R``: u32 rel oid, cstr namespace, cstr relname, u8 replica identity
  ∈ {d,n,f,i}, i16 ncols, then per column: u8 flag (bit0 = identity key),
  cstr name, u32 type oid, u32 typmod
- ``I``: u32 rel oid, 'N', tuple
- ``U``: u32 rel oid, optional ('K'|'O') old-tuple, 'N', new tuple
- ``D``: u32 rel oid, ('K'|'O'), old tuple
- tuple: i16 ncols, per column u8 format — 'n' (SQL NULL), 'u' (unchanged
  TOAST, value NOT sent), 'b' (u32 len + PG binary datum), 't' (u32 len +
  text datum)

Spark shape: ONE Arrow-batched pandas UDF parses a binary frame column into a
typed struct (single Python crossing for the whole stream — the same fused-
codec contract as decode_binary_feed); everything downstream (relation zip,
presence filtering, OID decode, apply fold) is Catalyst + the existing
fixed-OID codecs. The builder half is the fixture edge only — the real
producer is Postgres itself.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import functions as F

# ---------------------------------------------------------------- builders

def _cstr(s: str) -> bytes:
    return s.encode("utf-8") + b"\x00"


def build_begin(final_lsn: int, commit_us: int, xid: int) -> bytes:
    return b"B" + struct.pack(">QQI", final_lsn, commit_us, xid)


def build_commit(commit_lsn: int, end_lsn: int, commit_us: int) -> bytes:
    return b"C" + struct.pack(">BQQQ", 0, commit_lsn, end_lsn, commit_us)


def build_relation(
    oid: int, nsp: str, name: str, ident: str, cols: list[tuple[str, int, bool]]
) -> bytes:
    """cols: [(col_name, type_oid, is_identity_key)]."""
    out = b"R" + struct.pack(">I", oid) + _cstr(nsp) + _cstr(name)
    out += ident.encode() + struct.pack(">h", len(cols))
    for cname, toid, is_key in cols:
        out += struct.pack(">B", 1 if is_key else 0) + _cstr(cname)
        out += struct.pack(">Ii", toid, -1)
    return out


def build_tuple(fields: list[tuple[str, bytes | None]]) -> bytes:
    """fields: [(format, datum)] with format ∈ {'n','u','b','t'}."""
    out = struct.pack(">h", len(fields))
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
    out = op.encode() + struct.pack(">I", oid)
    if old_tuple is not None:
        out += old_kind.encode() + build_tuple(old_tuple)
    if new_tuple is not None:
        out += b"N" + build_tuple(new_tuple)
    return out


# ----------------------------------------------------------------- parser

_OPS = {ord("I"): "INSERT", ord("U"): "UPDATE", ord("D"): "DELETE"}


class _Reader:
    """Bounds-CHECKED cursor: every variable-length read validates it stays
    inside the frame. Python slicing would silently return a SHORT datum for
    a frame cut mid-field — which would then parse 'successfully', bypass
    safe mode's ERROR routing, and fold a truncated value into the snapshot
    as if the wire had said so. (Fixed-width reads already raise via
    struct.unpack_from; cstr raises via bytes.index when the terminator is
    cut off.)"""

    __slots__ = ("b", "i")

    def __init__(self, b: bytes):
        self.b, self.i = b, 0

    def u8(self) -> int:
        v = self.b[self.i]
        self.i += 1
        return v

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.b, self.i)
        self.i += 4
        return v

    def i16(self) -> int:
        (v,) = struct.unpack_from(">h", self.b, self.i)
        self.i += 2
        return v

    def u64(self) -> int:
        (v,) = struct.unpack_from(">Q", self.b, self.i)
        self.i += 8
        return v

    def cstr(self) -> str:
        j = self.b.index(0, self.i)
        s = self.b[self.i : j].decode("utf-8")
        self.i = j + 1
        return s

    def take(self, n: int) -> bytes:
        """n raw bytes, refusing to run past the frame end."""
        if n < 0 or self.i + n > len(self.b):
            raise ValueError(
                f"field of {n} bytes overruns frame ({self.i}+{n} > {len(self.b)})"
            )
        v = self.b[self.i : self.i + n]
        self.i += n
        return v

    def bytes32(self) -> bytes:
        return self.take(self.u32())


def _read_tuple(r: _Reader) -> list[dict]:
    n = r.i16()
    out = []
    for _ in range(n):
        fmt = chr(r.u8())
        if fmt == "b":
            out.append({"format": fmt, "bin": r.bytes32()})
        elif fmt == "t":
            # the reference trims a trailing NUL from text datums
            out.append({"format": fmt, "bin": r.bytes32().rstrip(b"\x00")})
        elif fmt in ("n", "u"):
            out.append({"format": fmt, "bin": None})
        else:
            raise ValueError(f"unsupported tuple format {fmt!r}")
    return out


def empty_frame() -> dict:
    """The None-filled frame dict (every _FRAME_TYPE field), shared by both
    wire dialects' parsers and the safe-mode ERROR frame."""
    return {
        "op": None, "xid": None, "final_lsn": None, "commit_lsn": None,
        "end_lsn": None, "commit_us": None, "rel_oid": None, "rel_nsp": None,
        "rel_name": None, "rel_ident": None, "rel_cols": None,
        "old_tuple": None, "new_tuple": None, "parse_error": None,
    }


def parse_frame(data: bytes) -> dict:
    """One pgoutput frame → plain dict (None-filled for absent members)."""
    out = empty_frame()
    tag = chr(data[0])
    r = _Reader(data)
    r.u8()
    if tag == "B":
        # exact fixed layout (tag + 8 + 8 + 4): a corrupt frame whose first
        # byte happens to collide with 'B' must not parse into a garbage
        # Begin — the tx registry folds Begins UNCONDITIONALLY (even from
        # batches that quarantine), so a pseudo-Begin would poison a real
        # transaction's commit time with no repair path
        if len(data) != 21:
            raise ValueError(f"begin frame wrong length {len(data)}")
        out["op"] = "BEGIN"
        out["final_lsn"], out["commit_us"] = r.u64(), r.u64()
        out["xid"] = r.u32()
    elif tag == "C":
        if len(data) != 26:
            raise ValueError(f"commit frame wrong length {len(data)}")
        out["op"] = "COMMIT"
        r.u8()  # flags
        out["commit_lsn"], out["end_lsn"], out["commit_us"] = r.u64(), r.u64(), r.u64()
    elif tag == "R":
        out["op"] = "RELATION"
        out["rel_oid"] = r.u32()
        out["rel_nsp"], out["rel_name"] = r.cstr(), r.cstr()
        ident = chr(r.u8())
        if ident not in ("d", "n", "f", "i"):
            raise ValueError(f"relation: bad replica identity {ident!r}")
        out["rel_ident"] = ident
        cols = []
        for _ in range(r.i16()):
            flag = r.u8()
            name = r.cstr()
            toid = r.u32()
            r.u32()  # typmod
            cols.append({"flag": flag, "name": name, "oid": toid})
        out["rel_cols"] = cols
    elif tag in ("I", "U", "D"):
        out["op"] = _OPS[ord(tag)]
        out["rel_oid"] = r.u32()
        kind = chr(r.u8())
        if kind != "N":
            out["old_tuple"] = _read_tuple(r)
            if tag == "U":
                kind = chr(r.u8())
        if kind == "N":
            out["new_tuple"] = _read_tuple(r)
    else:
        raise ValueError(f"unknown frame tag {tag!r}")
    if r.i != len(data):
        # trailing bytes = corruption (every pgoutput frame is fully
        # self-describing); a silent remainder could hide a cut-and-spliced
        # frame that still parsed
        raise ValueError(f"{r.i} bytes parsed, {len(data)} in frame")
    return out


_FRAME_TYPE = (
    "op string, xid bigint, final_lsn bigint, commit_lsn bigint, end_lsn bigint,"
    " commit_us bigint, rel_oid bigint, rel_nsp string, rel_name string,"
    " rel_ident string,"
    # oid is BIGINT: pg type oids are unsigned 32-bit, so an int32 column
    # would Arrow-overflow for legitimate oids >= 2^31 — OUTSIDE make_safe,
    # killing the stream with no quarantine
    " rel_cols array<struct<flag:int,name:string,oid:bigint>>,"
    " old_tuple array<struct<format:string,bin:binary>>,"
    " new_tuple array<struct<format:string,bin:binary>>,"
    " parse_error string"
)


def make_safe(parse_fn, empty_fn):
    """Wrap a strict wire parser into safe mode: corrupt bytes become an
    op='ERROR' record carrying the reason instead of raising — the
    STREAMING consumers' mode, where a poison frame must route to the
    dead-letter quarantine (park + fail-after-N) rather than kill the
    stream with no recovery path. Batch queries keep the strict raising
    parsers: silently dropping an ERROR row through an op-filter would
    mask corruption. Shared by all three codecs (pgoutput, pglogical,
    protowire) so the ERROR contract cannot drift per dialect."""

    def safe(data: bytes) -> dict:
        try:
            return parse_fn(data)
        except Exception as e:  # noqa: BLE001 — any malformed-bytes failure
            out = empty_fn()
            out["op"] = "ERROR"
            out["parse_error"] = f"{type(e).__name__}: {e}"
            return out

    return safe


parse_frame_safe = make_safe(parse_frame, empty_frame)


def parse_frames_udf(safe: bool = False):
    """Arrow-batched frame parser: binary column → typed frame struct (one
    Python crossing for the whole message stream). ``safe=True`` maps
    corrupt frames to op='ERROR' rows (see :func:`parse_frame_safe`)."""
    fn = parse_frame_safe if safe else parse_frame

    @F.pandas_udf(f"struct<{_FRAME_TYPE}>")
    def _udf(data: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([fn(bytes(b)) for b in data])

    return _udf
