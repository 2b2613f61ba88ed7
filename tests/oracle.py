"""Local replica of the driver's correctness gate: run a declared Spark query
and its DuckDB oracle on the same parquet dir, then compare row count, column
names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb

from pgcapture_spark.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style value hash tolerance: canonicalize to 12 significant digits
        return f"{v:.12g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)


def assert_parity(spark, name: str, fn, oracle_sql: str, sf_dir: str, limit_diff: int = 5):
    sdf = fn(spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    res = con.sql(oracle_sql)
    duck_cols = [c.lower() for c in res.columns]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    a = _norm_rows(spark_cols, spark_rows)
    b = _norm_rows(duck_cols, duck_rows)
    assert len(a) == len(b), f"{name}: row count spark={len(a)} duck={len(b)}"
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:limit_diff]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
