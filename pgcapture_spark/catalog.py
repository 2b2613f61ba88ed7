"""Table catalog: the schema/key registry the reference keeps in its
``PGXSchemaLoader`` (reference: pkg/decode/schema.go:114-191) — here a static
registry over the driver's parquet tables plus helpers to load/register them.

At 100 TB scale each entry would also carry partitioning/bucketing metadata;
``load`` is a plain parquet scan so Catalyst gets pushdown + pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# every driver-provided table (TESTDATA.md)
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# primary keys — plays the role of the reference's replica-identity/key cache
# (pkg/decode/schema.go:161-191, query at pkg/sql/source.go:9-18)
KEYS: dict[str, str] = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",  # composite in truth; l_linenumber disambiguates
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

# non-key columns of the CDC-mutated tables (FIXTURES.md T2); lineitem is the
# composite-replica-identity case — key (l_orderkey, l_linenumber)
CDC_COLS: dict[str, list[str]] = {
    "customer": ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "orders": [
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ],
    "lineitem": [
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ],
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # Session-agnostic reads (the driver builds its own vanilla session):
    # nanosAsLong guards against TIMESTAMP(NANOS) parquet vintages, and a UTC
    # session tz makes any NTZ→LTZ cast downstream deterministic. Both are
    # runtime-settable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    # TIMESTAMP(NANOS) parquet columns arrive as long (nanosAsLong); normalize
    # to microsecond timestamps, matching what DuckDB presents for the oracle.
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if isinstance(field.dataType, T.LongType) and field.name in ("ts",):
            # FLOOR division, not `div` (truncate-toward-zero): a pre-epoch
            # nanos value must round DOWN to the earlier microsecond —
            # -500 ns is 23:59:59.999999, not 00:00:00.000000 — matching how
            # DuckDB/pandas materialize TIMESTAMP(NANOS). Identical for the
            # non-negative timestamps in the fixtures; correct for any
            # pre-1970 vintage.
            n = field.name
            df = df.withColumn(
                n,
                F.expr(
                    f"timestamp_micros(({n} - ((({n} % 1000) + 1000) % 1000)) div 1000)"
                ),
            )
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register the base tables as temp views (names match the DuckDB oracle's
    pre-registered views, so one SQL text can run on either engine)."""
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
