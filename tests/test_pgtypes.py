"""Golden-value tests for the PG binary decoders (FIXTURES.md T4 pattern):
hand-packed wire-format datums → expected Python/Spark values, exercised both
as plain codecs and through the pandas-UDF surface."""

from __future__ import annotations

import datetime as dt
import struct

from pyspark.sql import functions as F

from pgcapture_spark.functions.pgtypes import (
    decode_value,
    pg_decode_json_udf,
    pg_decode_udf,
)


def _arr(elem_oid: int, elems: list[bytes | None], ndim_dims=None) -> bytes:
    dims = ndim_dims or [(len(elems), 1)]
    out = struct.pack(">iii", len(dims), int(any(e is None for e in elems)), elem_oid)
    for ln, lb in dims:
        out += struct.pack(">ii", ln, lb)
    for e in elems:
        out += struct.pack(">i", -1) if e is None else struct.pack(">i", len(e)) + e
    return out


GOLDENS = [
    (16, b"\x01", True),
    (16, b"\x00", False),
    (17, b"\xde\xad\xbe\xef", b"\xde\xad\xbe\xef"),
    (21, struct.pack(">h", -7), -7),
    (23, struct.pack(">i", 123456), 123456),
    (20, struct.pack(">q", -(2**40)), -(2**40)),
    (700, struct.pack(">f", 1.5), 1.5),
    (701, struct.pack(">d", -2.25), -2.25),
    (25, "héllo".encode(), "héllo"),
    (1042, b"pad ", "pad "),
    (114, b'{"a":1}', '{"a":1}'),
    (3802, b'\x01{"a":{"b":null}}', '{"a":{"b":null}}'),
    (1082, struct.pack(">i", 0), dt.date(2000, 1, 1)),
    (1082, struct.pack(">i", 366), dt.date(2001, 1, 1)),
    (1083, struct.pack(">q", 3_600_000_000), 3_600_000_000),
    (
        1114,
        struct.pack(">q", 86_400_000_000),
        dt.datetime(2000, 1, 2, 0, 0, 0),
    ),
    (
        1184,
        struct.pack(">q", 1_000_000),
        dt.datetime(2000, 1, 1, 0, 0, 1, tzinfo=dt.timezone.utc),
    ),
    (
        2950,
        bytes.fromhex("0102030405060708090a0b0c0d0e0f10"),
        "01020304-0506-0708-090a-0b0c-0d0e0f10".replace("-0b0c-", "-0b0c") ,
    ),
    (1007, _arr(23, [struct.pack(">i", 1), None, struct.pack(">i", 3)]), [1, None, 3]),
    (1009, _arr(25, [b"x", b"yz"]), ["x", "yz"]),
    (
        1007,
        _arr(
            23,
            [struct.pack(">i", v) for v in (1, 2, 3, 4, 5, 6)],
            ndim_dims=[(2, 1), (3, 1)],
        ),
        [[1, 2, 3], [4, 5, 6]],
    ),
]


def test_scalar_and_array_goldens():
    for oid, blob, expected in GOLDENS:
        got = decode_value(oid, blob)
        assert got == expected, f"oid={oid}: {got!r} != {expected!r}"
    assert decode_value(23, None) is None  # NULL passthrough


def test_udf_decode_int_and_timestamp(spark):
    rows = [
        (1, struct.pack(">i", 42)),
        (2, struct.pack(">i", -1)),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id int, raw binary")
    out = df.select("id", pg_decode_udf(23)("raw").alias("v")).collect()
    assert {r.id: r.v for r in out} == {1: 42, 2: -1, 3: None}

    ts = spark.createDataFrame(
        [(1, struct.pack(">q", 86_400_000_000))], "id int, raw binary"
    ).select(pg_decode_udf(1114)("raw").alias("ts"))
    [r] = ts.collect()
    assert r.ts == dt.datetime(2000, 1, 2, 0, 0, 0)


def test_udf_decode_timestamp_outside_ns_range(spark):
    """PG timestamps outside pandas' ns range (1677–2262) must decode — the
    vectorized path builds datetime64[us] directly, never ns (a
    pd.to_datetime(unit='us') detour would raise OutOfBoundsDatetime)."""
    y3000 = dt.datetime(3000, 1, 1)
    y1500 = dt.datetime(1500, 6, 15, 12, 30)
    y2k = dt.datetime(2000, 1, 1)
    rows = [
        (1, struct.pack(">q", int((y3000 - y2k).total_seconds()) * 1_000_000)),
        (2, struct.pack(">q", int((y1500 - y2k).total_seconds()) * 1_000_000)),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id int, raw binary")
    out = {r.id: r.ts for r in df.select("id", pg_decode_udf(1114)("raw").alias("ts")).collect()}
    assert out == {1: y3000, 2: y1500, 3: None}


def test_generic_json_udf(spark):
    rows = [
        (16, b"\x01"),
        (23, struct.pack(">i", 7)),
        (1009, _arr(25, [b"x", None])),
    ]
    df = spark.createDataFrame(rows, "oid int, raw binary")
    out = df.select(pg_decode_json_udf()(F.col("oid"), F.col("raw")).alias("j")).collect()
    assert [r.j for r in out] == ["true", "7", '["x",null]']


# ---------------------------------------------------------------- round trips

from hypothesis import given, settings
from hypothesis import strategies as st

from pgcapture_spark.functions.pgtypes import (
    ENCODERS,
    SCALAR_DECODERS,
    enc_date,
    enc_timestamp,
)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_roundtrip_int8(v):
    assert SCALAR_DECODERS[20](ENCODERS[20](v)) == v


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_roundtrip_int4(v):
    assert SCALAR_DECODERS[23](ENCODERS[23](v)) == v


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**15), max_value=2**15 - 1))
def test_roundtrip_int2(v):
    assert SCALAR_DECODERS[21](ENCODERS[21](v)) == v


@settings(max_examples=200, deadline=None)
@given(st.floats(allow_nan=False, width=64))
def test_roundtrip_float8(v):
    assert SCALAR_DECODERS[701](ENCODERS[701](v)) == v


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_roundtrip_text(v):
    assert SCALAR_DECODERS[25](ENCODERS[25](v)) == v


@settings(max_examples=100, deadline=None)
@given(st.booleans())
def test_roundtrip_bool(v):
    assert SCALAR_DECODERS[16](ENCODERS[16](v)) is v


@settings(max_examples=200, deadline=None)
@given(
    st.datetimes(
        min_value=dt.datetime(1900, 1, 1),
        max_value=dt.datetime(2200, 1, 1),
    ).map(lambda d: d.replace(microsecond=(d.microsecond // 1) ))
)
def test_roundtrip_timestamp(v):
    assert SCALAR_DECODERS[1114](enc_timestamp(v)) == v


@settings(max_examples=200, deadline=None)
@given(st.dates(min_value=dt.date(1900, 1, 1), max_value=dt.date(2200, 1, 1)))
def test_roundtrip_date(v):
    assert SCALAR_DECODERS[1082](enc_date(v)) == v
