"""Round-7 registry wave: the remaining IVM hard cases (min/max with bounded
rescan, COUNT DISTINCT via a support table, a 3-table join view), the
schema-evolving streamed apply on bucketed state, tx-registry retention as a
declared maintenance op, streamed corpus-drift and exact-dedup consumers, and
the training-pipeline tail (position-based attribution, bucket-skew compaction
planning).

Every query keeps the cross-engine determinism contract: integer cents /
milli/ppm quantization, explicit portable hashes where bucketing reaches the
output, and identical IEEE expression trees where doubles are unavoidable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcapture_spark.catalog import CDC_COLS, register_views
from pgcapture_spark.fixtures.cdc_feed import (
    DUCKDB,
    cdc_customer_sql,
    cdc_orders_sql,
    ddl_feed_sql,
)
from pgcapture_spark.operators.apply import apply_oracle_sql
from pgcapture_spark.queries import _feed, q

_ORDERS_APPLIED = apply_oracle_sql(
    cdc_orders_sql(DUCKDB), "orders", "o_orderkey", CDC_COLS["orders"]
)
_CUSTOMER_APPLIED = apply_oracle_sql(
    cdc_customer_sql(DUCKDB), "customer", "c_custkey", CDC_COLS["customer"]
)


# ---------------------------------------------- schema-evolving streamed apply


@q(
    "cdc_apply_ddl_streamed",
    apply_oracle_sql(
        f"SELECT * FROM ({ddl_feed_sql()}) WHERE op <> 'DDL'",
        "(SELECT c_custkey, c_acctbal, CAST(NULL AS STRING) AS c_note FROM customer)",
        "c_custkey",
        ["c_acctbal", "c_note"],
    ),
    "A6/P5 STREAMED on bucketed state: in-stream ALTER TABLE ADD COLUMN"
    " mid-feed — the schema change is a version boundary in the"
    " EvolvingBucketedState manifest (field list swaps atomically with the"
    " bucket pointers); buckets touched after the DDL carry the new schema,"
    " untouched buckets evolve lazily via merge-schema reads + manifest"
    " alignment. Per-trigger reads and commits stay O(touched buckets)"
    " across the DDL (pkg/sink/postgres.go:296-393 semantics). Converges to"
    " the same oracle as the batch cdc_apply_ddl_evolution.",
)
def cdc_apply_ddl_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pgcapture_spark.sources.feed import cached_fixture_segments, read_feed_stream
    from pgcapture_spark.streaming.pipeline import apply_stream_with_ddl
    from pgcapture_spark.streaming.state import EvolvingBucketedState

    register_views(spark, sf_dir, ("customer",))
    d = tempfile.mkdtemp(prefix="pgcs_q_ddlstream_")
    feed_dir = cached_fixture_segments(
        spark, sf_dir, "ddl_feed", lambda: spark.sql(ddl_feed_sql()), n_segments=4
    )
    schema = spark.read.parquet(feed_dir).schema
    state = EvolvingBucketedState(spark, f"{d}/state", "c_custkey", n_buckets=16)
    query = apply_stream_with_ddl(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
        state,
        spark.table("customer").select("c_custkey", "c_acctbal"),
        "c_custkey",
        f"{d}/ckpt",
    )
    query.awaitTermination(300)
    return state.read()
