"""Consumer API (SURVEY §2 C1/T4/T5): per-table handler dispatch over the
generic feed — streaming and batch forms."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from pgcapture_spark.catalog import register_views
from pgcapture_spark.consumer import CaptureConsumer
from pgcapture_spark.fixtures.cdc_feed import SPARK, generic_feed_sql
from pgcapture_spark.sources.feed import materialize_feed, read_feed_stream
from tests.conftest import SF_SMALL


def _generic_feed(spark):
    register_views(spark, SF_SMALL, ("customer", "orders"))
    g = spark.sql(generic_feed_sql(SPARK))
    return g.withColumn("fqn", F.concat_ws(".", "schema_name", "table_name"))


def test_streaming_consume_dispatches_per_table_with_regex(spark):
    d = tempfile.mkdtemp(prefix="pgcs_consumer_")
    try:
        feed = _generic_feed(spark)
        n_customer_changes = feed.where(
            "fqn = 'public.customer' AND op IN ('INSERT','UPDATE','DELETE')"
        ).count()
        materialize_feed(feed, f"{d}/feed", n_segments=3)
        schema = spark.read.parquet(f"{d}/feed").schema

        got: dict[str, int] = {"public.customer": 0, "public.orders": 0}

        consumer = CaptureConsumer(table_regex=r"^public\.customer$")
        consumer.register("public.customer", lambda df, bid: got.__setitem__(
            "public.customer", got["public.customer"] + df.count()))
        consumer.register("public.orders", lambda df, bid: got.__setitem__(
            "public.orders", got["public.orders"] + df.count()))

        q = consumer.consume(
            read_feed_stream(spark, f"{d}/feed", schema, max_files_per_trigger=1),
            f"{d}/ckpt",
        )
        q.awaitTermination(120)
        # regex keeps customer, excludes orders entirely (handler never fires);
        # BEGIN/COMMIT frames suppressed
        assert got["public.customer"] == n_customer_changes
        assert got["public.orders"] == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_batch_consume_with_debounce(spark):
    feed = _generic_feed(spark).withColumn(
        "key", F.col("key_str").cast("bigint")
    )
    seen: list[int] = []
    dups: list[int] = []

    def handler(df, bid):
        seen.append(df.count())
        dups.append(df.groupBy("key").count().where("count > 1").count())

    consumer = CaptureConsumer()
    consumer.register("public.customer", handler)
    consumer.consume_batch(feed, debounce_key="key")
    n_keys = feed.where(
        "fqn = 'public.customer' AND op IN ('INSERT','UPDATE','DELETE')"
    ).select("key").distinct().count()
    assert seen == [n_keys]  # one row per key after debounce
    assert dups == [0]


def test_asof_forward_direction(spark):
    from pgcapture_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (2, 5, "c")], "k int, ts int, tag string"
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (1, 30, 300.0), (3, 1, 999.0)],
        "k int, ts int, v double",
    )
    fwd = {
        (r["k"], r["ts"]): (r["asof_ts"], r["asof_v"])
        for r in asof_join(
            left, right, on="k", ts="ts", value_cols=["v"], direction="forward"
        ).collect()
    }
    # earliest right.ts >= left.ts; ties (ts=10) match; key 2 has no right rows
    assert fwd == {(1, 10): (10, 100.0), (1, 25): (30, 300.0), (2, 5): (None, None)}
    bwd = {
        (r["k"], r["ts"]): (r["asof_ts"], r["asof_v"])
        for r in asof_join(
            left, right, on="k", ts="ts", value_cols=["v"], direction="backward"
        ).collect()
    }
    assert bwd == {(1, 10): (10, 100.0), (1, 25): (20, 200.0), (2, 5): (None, None)}
