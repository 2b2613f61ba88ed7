"""Core CDC queries: the feeds themselves + the apply operator (SURVEY §2
S2/A3-A5/T2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pgcapture_spark.catalog import CDC_COLS, register_views
from pgcapture_spark.fixtures.cdc_feed import (
    DUCKDB,
    cdc_customer_sql,
    cdc_lineitem_sql,
    cdc_orders_sql,
)
from pgcapture_spark.operators.apply import apply_oracle_sql, cdc_apply, last_image_window
from pgcapture_spark.queries import _feed, q


@q(
    "cdc_feed_customer",
    cdc_customer_sql(DUCKDB),
    "S2: the deterministic change feed itself — (lsn, seq) total order, op mix,"
    " presence/TOAST encoding (FIXTURES.md T2).",
)
def cdc_feed_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _feed(spark, sf_dir, "customer")


@q("cdc_feed_orders", cdc_orders_sql(DUCKDB), "S2 (orders variant).")
def cdc_feed_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _feed(spark, sf_dir, "orders")


@q(
    "cdc_feed_lineitem",
    cdc_lineitem_sql(DUCKDB),
    "S2 (lineitem variant — composite-key events, old key image on DELETE).",
)
def cdc_feed_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _feed(spark, sf_dir, "lineitem")


@q(
    "cdc_apply_customer",
    apply_oracle_sql(cdc_customer_sql(DUCKDB), "customer", "c_custkey", CDC_COLS["customer"]),
    "A3-A5/T2: replay the customer feed onto the snapshot — last-image-per-key"
    " fold with TOAST inheritance + explicit NULL sets + deletes + inserts"
    " (pkg/sink/postgres.go:207-278, pkg/decode/decoder.go:106-114).",
)
def cdc_apply_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer",))
    return cdc_apply(
        spark.table("customer"),
        _feed(spark, sf_dir, "customer"),
        "c_custkey",
        CDC_COLS["customer"],
    )


@q(
    "cdc_apply_orders",
    apply_oracle_sql(cdc_orders_sql(DUCKDB), "orders", "o_orderkey", CDC_COLS["orders"]),
    "A3-A5 on orders (timestamp column inherited through TOAST absence).",
)
def cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return cdc_apply(
        spark.table("orders"),
        _feed(spark, sf_dir, "orders"),
        "o_orderkey",
        CDC_COLS["orders"],
    )


@q(
    "cdc_apply_lineitem_composite",
    apply_oracle_sql(
        cdc_lineitem_sql(DUCKDB),
        "lineitem",
        ["l_orderkey", "l_linenumber"],
        CDC_COLS["lineitem"],
    ),
    "A3-A5/T7 with a COMPOSITE replica identity: apply the lineitem feed keyed"
    " on (l_orderkey, l_linenumber) — the multi-column key/set split of"
    " pkg/sink/postgres.go:507-547 / identity cache pkg/decode/schema.go:161-191.",
)
def cdc_apply_lineitem_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem",))
    return cdc_apply(
        spark.table("lineitem"),
        _feed(spark, sf_dir, "lineitem"),
        ["l_orderkey", "l_linenumber"],
        CDC_COLS["lineitem"],
    )


@q(
    "cdc_last_event_customer",
    f"""
WITH feed AS ({cdc_customer_sql(DUCKDB)})
SELECT lsn, seq, ord, commit_ts, op, c_custkey, c_name, c_nationkey, c_acctbal,
       c_mktsegment, old_c_custkey, present
FROM feed
QUALIFY row_number() OVER (PARTITION BY c_custkey ORDER BY ord DESC) = 1
""",
    "A5/E2: newest raw event per key — the per-batch reduction the apply"
    " pipeline performs before merging (window variant).",
)
def cdc_last_event_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return last_image_window(_feed(spark, sf_dir, "customer"), "c_custkey")
