"""PostgreSQL binary wire-format decoders (SURVEY §2 D7, §1.3).

The reference ships values in PG binary format end-to-end and decodes only at
the consumer edge, driven by the type OID (pkg/decode/decoder.go:70-79; the
Python client's registry python/pgcapture/decoders.py:157-225). This module
rebuilds that decode edge for Spark: pure-Python codecs for the supported OID
set + Arrow-batched pandas UDFs so decoding is vectorized per batch, not per
row.

Format notes (PostgreSQL wire protocol, public docs):
- integers/floats: big-endian fixed width
- date: int32 days since 2000-01-01; timestamp(tz): int64 µs since 2000-01-01
  (the Y2K epoch shift: 946684800 s — decoders.py:17, pkg/sink/postgres.go:729)
- jsonb: 1-byte version header (=1) then utf8 (decoders.py:120-121)
- uuid: 16 raw bytes
- arrays: int32 ndim, int32 hasnull, int32 elem-oid, then per-dim
  (int32 len, int32 lower-bound), then elements as int32 length-prefixed
  payloads, -1 = NULL (decoders.py:126-155); N-dim supported.

Lazy decode at scale: keep values as ``binary`` columns and decode only the
columns a query touches — Catalyst column pruning then skips the UDF for
untouched columns (SURVEY §4 "binary passthrough").
"""

from __future__ import annotations

import datetime as dt
import json
import struct
import uuid as _uuid
from collections.abc import Callable

import pandas as pd
from pyspark.sql import functions as F

# ---- epoch constants -------------------------------------------------------
PG_EPOCH = dt.datetime(2000, 1, 1, tzinfo=dt.timezone.utc)
PG_EPOCH_DATE = dt.date(2000, 1, 1)
MICROS_Y2K_SHIFT = 946_684_800_000_000  # µs between 1970-01-01 and 2000-01-01

# ---- scalar codecs ---------------------------------------------------------

def dec_bool(b: bytes) -> bool:
    return b[0] != 0


def dec_bytea(b: bytes) -> bytes:
    return bytes(b)


def dec_int2(b: bytes) -> int:
    return struct.unpack(">h", b)[0]


def dec_int4(b: bytes) -> int:
    return struct.unpack(">i", b)[0]


def dec_int8(b: bytes) -> int:
    return struct.unpack(">q", b)[0]


def dec_float4(b: bytes) -> float:
    return struct.unpack(">f", b)[0]


def dec_float8(b: bytes) -> float:
    return struct.unpack(">d", b)[0]


def dec_text(b: bytes) -> str:
    return b.decode("utf-8")


def dec_json(b: bytes) -> str:
    return b.decode("utf-8")


def dec_jsonb(b: bytes) -> str:
    if b[0] != 1:
        raise ValueError(f"unsupported jsonb version {b[0]}")
    return b[1:].decode("utf-8")


def dec_date(b: bytes) -> dt.date:
    days = struct.unpack(">i", b)[0]
    return PG_EPOCH_DATE + dt.timedelta(days=days)


def dec_time(b: bytes) -> int:
    """time = µs since midnight (kept as int64, matching decoders.py:93-95)."""
    return struct.unpack(">q", b)[0]


def dec_timestamp(b: bytes) -> dt.datetime:
    micros = struct.unpack(">q", b)[0]
    return (PG_EPOCH + dt.timedelta(microseconds=micros)).replace(tzinfo=None)


def dec_timestamptz(b: bytes) -> dt.datetime:
    micros = struct.unpack(">q", b)[0]
    return PG_EPOCH + dt.timedelta(microseconds=micros)


def dec_uuid(b: bytes) -> str:
    return str(_uuid.UUID(bytes=bytes(b)))


# element-oid → (decoder, name); array oids map to element decoders
SCALAR_DECODERS: dict[int, Callable[[bytes], object]] = {
    16: dec_bool,
    17: dec_bytea,
    20: dec_int8,
    21: dec_int2,
    23: dec_int4,
    25: dec_text,
    114: dec_json,
    700: dec_float4,
    701: dec_float8,
    1042: dec_text,  # bpchar
    1043: dec_text,  # varchar
    1082: dec_date,
    1083: dec_time,
    1114: dec_timestamp,
    1184: dec_timestamptz,
    2950: dec_uuid,
    3802: dec_jsonb,
}

# array oid → element oid (the reference's supported set, decoders.py:160-224)
ARRAY_OIDS: dict[int, int] = {
    1000: 16,
    1001: 17,
    1005: 21,
    1007: 23,
    1016: 20,
    1009: 25,
    1014: 1042,
    1015: 1043,
    1021: 700,
    1022: 701,
    1115: 1114,
    1182: 1082,
    1185: 1184,
    2951: 2950,
    3807: 3802,
}


def dec_array(b: bytes, elem_decoder: Callable[[bytes], object]):
    """N-dimensional PG array → nested Python lists (decoders.py:126-155)."""
    ndim, _hasnull, _oid = struct.unpack(">iii", b[:12])
    off = 12
    dims = []
    for _ in range(ndim):
        ln, _lb = struct.unpack(">ii", b[off : off + 8])
        dims.append(ln)
        off += 8

    def read_elem():
        nonlocal off
        (ln,) = struct.unpack(">i", b[off : off + 4])
        off += 4
        if ln == -1:
            return None
        val = elem_decoder(b[off : off + ln])
        off += ln
        return val

    def build(level: int):
        if level == ndim - 1:
            return [read_elem() for _ in range(dims[level])]
        return [build(level + 1) for _ in range(dims[level])]

    if ndim == 0:
        return []
    return build(0)


def decode_value(oid: int, b: bytes | None):
    """Decode one binary datum by OID (None stays SQL NULL —
    pkg/decode/decoder.go:73-74)."""
    if b is None:
        return None
    if oid in SCALAR_DECODERS:
        return SCALAR_DECODERS[oid](b)
    if oid in ARRAY_OIDS:
        return dec_array(b, SCALAR_DECODERS[ARRAY_OIDS[oid]])
    raise ValueError(f"unsupported OID {oid}")


# ---- Spark surface ---------------------------------------------------------

_SPARK_TYPES: dict[int, str] = {
    16: "boolean",
    17: "binary",
    20: "long",
    21: "short",
    23: "int",
    25: "string",
    114: "string",
    700: "float",
    701: "double",
    1042: "string",
    1043: "string",
    1082: "date",
    1083: "long",
    1114: "timestamp",
    1184: "timestamp",
    2950: "string",
    3802: "string",
}


def spark_type_for_oid(oid: int) -> str:
    if oid in _SPARK_TYPES:
        return _SPARK_TYPES[oid]
    if oid in ARRAY_OIDS:
        return f"array<{_SPARK_TYPES[ARRAY_OIDS[oid]]}>"
    raise ValueError(f"unsupported OID {oid}")


# fixed-width wire types: (big-endian numpy dtype, native dtype, pandas
# nullable dtype) — decoded with ONE frombuffer over the batch, no per-row call
_NP_FIXED: dict[int, tuple[str, str, str]] = {
    20: (">i8", "int64", "Int64"),
    23: (">i4", "int32", "Int32"),
    21: (">i2", "int16", "Int16"),
    700: (">f4", "float32", "Float32"),
    701: (">f8", "float64", "Float64"),
}


def decode_series(oid: int, s: pd.Series) -> pd.Series:
    """Vectorized batch decode of one PG-binary column (pandas in → pandas
    out). Fixed-width types concatenate the batch's non-null payloads and
    decode with one ``np.frombuffer`` byte-order cast — zero per-row Python
    in the hot path; timestamps build datetime64[us] directly (never ns, so
    PG timestamps outside pandas' 1677–2262 ns range decode fine);
    variable-width/object types fall back to the per-row codec."""
    import numpy as np

    if oid in _NP_FIXED:
        be, native, nullable = _NP_FIXED[oid]
        notnull = s.notna().to_numpy()
        joined = b"".join(v for v, ok in zip(s, notnull) if ok)
        vals = np.frombuffer(joined, dtype=be).astype(native)
        out = np.zeros(len(s), dtype=native)
        out[notnull] = vals
        return pd.Series(pd.array(out, dtype=nullable)).mask(~notnull)

    if oid in (1114, 1184):
        notnull = s.notna().to_numpy()
        joined = b"".join(v for v, ok in zip(s, notnull) if ok)
        us = np.frombuffer(joined, dtype=">i8").astype("int64")
        out = np.zeros(len(s), dtype="int64")
        out[notnull] = us + MICROS_Y2K_SHIFT
        return pd.Series(out.astype("datetime64[us]")).mask(~notnull)

    if oid in (25, 1042, 1043, 114):
        return pd.Series([None if b is None else bytes(b).decode("utf-8") for b in s])

    return pd.Series([decode_value(oid, b) for b in s], dtype="object")


def pg_decode_udf(oid: int):
    """Arrow-batched decoder UDF for a fixed-OID binary column (one UDF per
    column — the lazy, Catalyst-prunable path; see
    operators/generic_feed.decode_binary_feed for the fused variant)."""
    out_type = spark_type_for_oid(oid)

    @F.pandas_udf(out_type)
    def _udf(s: pd.Series) -> pd.Series:
        return decode_series(oid, s)

    return _udf


# ---- encoders (fixture edge) ----------------------------------------------
# Inverse codecs for building binary-passthrough feeds in tests/fixtures; the
# real producer is Postgres itself (the reference re-sends these bytes without
# decoding, pkg/decode/decoder.go:70-79, pkg/sink/postgres.go:422-434).

def enc_int2(v: int) -> bytes:
    return struct.pack(">h", int(v))


def enc_int4(v: int) -> bytes:
    return struct.pack(">i", int(v))


def enc_int8(v: int) -> bytes:
    return struct.pack(">q", int(v))


def enc_float4(v: float) -> bytes:
    return struct.pack(">f", float(v))


def enc_float8(v: float) -> bytes:
    return struct.pack(">d", float(v))


def enc_text(v: str) -> bytes:
    return str(v).encode("utf-8")


def enc_timestamp(v) -> bytes:
    """datetime/pd.Timestamp → int64 µs since 2000-01-01 (UTC wall clock)."""
    ts = pd.Timestamp(v)
    if ts.tz is not None:
        ts = ts.tz_convert("UTC").tz_localize(None)
    return struct.pack(">q", ts.value // 1000 - MICROS_Y2K_SHIFT)


def enc_date(v) -> bytes:
    d = v.date() if isinstance(v, dt.datetime) else v
    return struct.pack(">i", (d - PG_EPOCH_DATE).days)


ENCODERS: dict[int, Callable[[object], bytes]] = {
    16: lambda v: b"\x01" if v else b"\x00",
    20: enc_int8,
    21: enc_int2,
    23: enc_int4,
    25: enc_text,
    700: enc_float4,
    701: enc_float8,
    1042: enc_text,
    1043: enc_text,
    1082: enc_date,
    1114: enc_timestamp,
    1184: enc_timestamp,
}


def pg_decode_json_udf():
    """Generic (oid, binary) → canonical JSON string — for heterogeneous golden
    tables (FIXTURES.md T4)."""
    def _to_jsonable(v):
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, (dt.datetime, dt.date)):
            return v.isoformat()
        if isinstance(v, list):
            return [_to_jsonable(x) for x in v]
        return v

    @F.pandas_udf("string")
    def _udf(oids: pd.Series, blobs: pd.Series) -> pd.Series:
        out = []
        for oid, b in zip(oids, blobs):
            v = decode_value(int(oid), None if b is None else bytes(b))
            out.append(json.dumps(_to_jsonable(v), separators=(",", ":")))
        return pd.Series(out)

    return _udf


# ------------------------------------------------------- text-format datums

# The wire's SECOND datum representation (pb/pgcapture.proto:57 `string text`;
# pgoutput tuple format 't'): PG text output re-parsed into language types.
# The reference's consumer scans text datums through the same pgtype.Map
# (pkg/pgcapture/consumer.go:144-185); binary stays the hot path — text is
# what a plugin emits when binary transfer is unavailable.

TEXT_ENCODERS: dict[int, Callable[[object], bytes]] = {
    16: lambda v: (b"t" if v else b"f"),
    20: lambda v: str(int(v)).encode(),
    23: lambda v: str(int(v)).encode(),
    21: lambda v: str(int(v)).encode(),
    700: lambda v: repr(float(v)).encode(),
    701: lambda v: repr(float(v)).encode(),  # repr = shortest exact round-trip
    25: lambda v: str(v).encode(),
    1043: lambda v: str(v).encode(),
    1114: lambda v: v.strftime("%Y-%m-%d %H:%M:%S.%f").encode(),
}


def decode_text_datum(oid: int, b: bytes):
    """One text datum → Python value (None passes through)."""
    if b is None:
        return None
    s = bytes(b).decode()
    if oid == 16:
        return s == "t"
    if oid in (20, 21, 23):
        return int(s)
    if oid in (700, 701):
        return float(s)
    if oid == 1114:
        from datetime import datetime

        fmt = "%Y-%m-%d %H:%M:%S.%f" if "." in s else "%Y-%m-%d %H:%M:%S"
        return datetime.strptime(s, fmt)
    return s  # 25 / 1043 and any other textual type


def decode_text_series(oid: int, s: pd.Series) -> pd.Series:
    """Arrow-batched text decode: one Series of utf-8 datums → typed values.
    int/float columns vectorize through pandas astype; the rest map per
    value (text datums are the fallback path, not the 100 TB hot path)."""
    if oid in (20, 21, 23):
        dec = s.map(lambda b: int(bytes(b).decode()) if b is not None else None)
        return dec.astype("Int64" if oid == 20 else "Int32")
    if oid in (700, 701):
        return s.map(lambda b: float(bytes(b).decode()) if b is not None else None).astype(
            "float64"
        )
    out = s.map(lambda b: decode_text_datum(oid, b))
    if oid == 1114:
        return pd.Series(out, dtype="datetime64[us]")
    return out
