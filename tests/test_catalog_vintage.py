"""Parquet timestamp-vintage regression: the driver's testdata flipped its
``events.ts`` physical type between rounds (TIMESTAMP(NANOS) in r1,
TIMESTAMP(MICROS) from r2). ``catalog.load`` must present BOTH vintages as
microsecond TimestampType with identical values, so every timestamp query is
insensitive to which vintage the driver regenerates next."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from pgcapture_spark.catalog import load


@pytest.fixture()
def vintage_dirs():
    d = tempfile.mkdtemp(prefix="pgcs_vintage_")
    stamps = [
        dt.datetime(2024, 1, 1, 0, 0, 0),
        dt.datetime(2024, 6, 15, 12, 34, 56, 789012),
        dt.datetime(2025, 12, 31, 23, 59, 59, 999999),
    ]
    tbl_us = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(stamps, pa.timestamp("us")),
        }
    )
    tbl_ns = tbl_us.cast(
        pa.schema([pa.field("event_id", pa.int64()), pa.field("ts", pa.timestamp("ns"))])
    )
    # two sf-style dirs, each holding an events.parquet of its vintage
    import os

    for name, tbl in (("us", tbl_us), ("ns", tbl_ns)):
        os.makedirs(f"{d}/{name}", exist_ok=True)
        pq.write_table(tbl, f"{d}/{name}/events.parquet", version="2.6")
    yield d, stamps
    shutil.rmtree(d, ignore_errors=True)


def test_load_normalizes_both_timestamp_vintages(spark, vintage_dirs):
    d, stamps = vintage_dirs
    # confirm the fixture really produced two different physical vintages
    assert pq.read_schema(f"{d}/us/events.parquet").field("ts").type == pa.timestamp("us")
    assert pq.read_schema(f"{d}/ns/events.parquet").field("ts").type == pa.timestamp("ns")

    out = {}
    for name in ("us", "ns"):
        df = load(spark, f"{d}/{name}", "events")
        [ts_field] = [f for f in df.schema.fields if f.name == "ts"]
        assert isinstance(ts_field.dataType, T.TimestampType | T.TimestampNTZType), (
            f"{name}: ts surfaced as {ts_field.dataType}"
        )
        out[name] = {r["event_id"]: r["ts"] for r in df.collect()}
    assert out["us"] == out["ns"]
    assert out["us"][2] == stamps[1]
