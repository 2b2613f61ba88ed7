"""Local replica of the driver's correctness gate: run a declared Spark query
and its DuckDB oracle on the same parquet dir, then compare row count, column
names, order-insensitive values, AND pandas-level dtypes.

The driver canonicalizes both results as pandas frames (sort columns by name,
sort rows, hash values). Round-1 evidence on its dtype sensitivity: DuckDB
HUGEINT (→ python-object/float column) vs Spark BIGINT hash-MISMATCHED
(cdc_incremental_agg r1 fail, fixed by CAST AS BIGINT), while plain integer
*widths* hash EQUAL — cdc_seq_rederive was green with Spark int32
(row_number) against DuckDB int64. _dtype_token therefore collapses all
numpy integer widths to one token but keeps python-object ints ("pyint",
the HUGEINT shape) distinct. The row sort also dies on top-level array
cells; both strictures are mirrored here so the class is caught locally.
"""

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


def _dtype_token(dtype, sample) -> str:
    """Collapse a pandas dtype to the granularity the driver's hash is
    sensitive to: integer *width* matters (int32 ≠ int64 ≠ hugeint-as-float),
    datetime unit (ns vs us) does not, all floats are one family."""
    import numpy as np

    kind = getattr(dtype, "kind", None)
    if kind in ("i", "u"):
        # r1 driver evidence: int32 vs int64 hash EQUAL (cdc_seq_rederive was
        # green with row_number int32 vs DuckDB int64); only the
        # HUGEINT→float64/object conversion mismatches. Collapse widths.
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind in ("M", "m"):
        return "ts"
    # object column: judge by first non-null value
    for v in sample:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, (list, tuple, np.ndarray)):
            return "ARRAY"
        if isinstance(v, bytes):
            return "bytes"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            # python-object ints (e.g. DuckDB HUGEINT) — distinct from int64
            return "pyint"
        if isinstance(v, float):
            return "float"
        if isinstance(v, str):
            return "str"
        import datetime
        import decimal

        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, (datetime.datetime,)):
            return "ts"
        if isinstance(v, datetime.date):
            return "date"
        return type(v).__name__
    return "all-null"


def _frame_dtypes(pdf) -> dict:
    out = {}
    for c in pdf.columns:
        col = pdf[c]
        tok = _dtype_token(col.dtype, col.head(50).tolist())
        out[c.lower()] = tok
    return out


def assert_parity(spark, name: str, fn, oracle_sql: str, sf_dir: str, limit_diff: int = 5):
    sdf = fn(spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_pdf = sdf.toPandas()
    spark_rows = [tuple(r) for r in spark_pdf.itertuples(index=False, name=None)]

    con = duckdb_conn(sf_dir)
    res = con.sql(oracle_sql)
    duck_cols = [c.lower() for c in res.columns]
    duck_pdf = res.df()
    duck_rows = [tuple(r) for r in duck_pdf.itertuples(index=False, name=None)]
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )

    # driver's _canon sorts rows via pandas and dies on list cells — forbid them
    sd = _frame_dtypes(spark_pdf)
    dd = _frame_dtypes(duck_pdf)
    arrays = [c for c, t in {**sd, **dd}.items() if t == "ARRAY"]
    assert not arrays, (
        f"{name}: top-level array column(s) {arrays} — the driver canonicalizer "
        "cannot hash these; serialize with to_json/concat_ws in BOTH engines"
    )

    # dtype parity at the driver's sensitivity (int width, hugeint-as-object)
    dtype_diffs = {
        c: (sd.get(c), dd.get(c))
        for c in sd
        if sd.get(c) != dd.get(c)
        and "all-null" not in (sd.get(c), dd.get(c))
    }
    assert not dtype_diffs, (
        f"{name}: dtype mismatch (spark, duckdb) per column: {dtype_diffs} — "
        "align widths with CAST(... AS BIGINT) / .cast('long')"
    )

    def _clean(rows):
        # pandas converts None→NaN/NaT; normalize back for value compare
        import numpy as np
        import pandas as pd

        out = []
        for r in rows:
            out.append(
                tuple(
                    None
                    if (v is pd.NaT or (isinstance(v, float) and math.isnan(v)))
                    else (
                        v.to_pydatetime()
                        if isinstance(v, pd.Timestamp)
                        else (v.item() if isinstance(v, np.generic) else v)
                    )
                    for v in r
                )
            )
        return out

    a = _norm_rows(spark_cols, _clean(spark_rows))
    b = _norm_rows(duck_cols, _clean(duck_rows))
    assert len(a) == len(b), f"{name}: row count spark={len(a)} duck={len(b)}"
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:limit_diff]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
    return len(a), len(b)
