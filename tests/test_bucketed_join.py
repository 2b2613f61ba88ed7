"""Bucketed co-located merge (SURVEY §2.7 / scale design): a snapshot stored
``bucketBy(key)`` joins the folded change images with NO shuffle on the
snapshot side — only the (small) image side exchanges, into the bucket count.
At 100 TB this is the difference between re-shuffling the whole table per
apply and shuffling just the change set."""

from __future__ import annotations

import re
import shutil
import tempfile

import pytest

from pgcapture_spark.catalog import CDC_COLS, register_views
from pgcapture_spark.operators.apply import cdc_apply, last_image, merge_images
from pgcapture_spark.queries import _feed
from tests.conftest import SF_SMALL


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="pgcs_buck_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_bucketed_snapshot_merge_shuffles_only_images(spark, tmpdir):
    register_views(spark, SF_SMALL, ("customer",))
    spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    (
        spark.table("customer")
        .write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", f"{tmpdir}/customer_bucketed")
        .mode("overwrite")
        .saveAsTable("customer_bucketed")
    )
    try:
        snap = spark.table("customer_bucketed")
        feed = _feed(spark, SF_SMALL, "customer")
        img = last_image(feed, "c_custkey", CDC_COLS["customer"])
        merged = merge_images(snap, img, "c_custkey", CDC_COLS["customer"])
        plan = spark._jvm.PythonSQLUtils.explainString(
            merged._jdf.queryExecution(), "simple"
        )
        # the bucketed scan provides the join's partitioning: exactly ONE
        # exchange in the whole plan (the image side), none above the scan
        assert "Bucketed: true" in plan
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
        # and the result still matches the plain-snapshot apply
        expected = cdc_apply(
            spark.table("customer"), feed, "c_custkey", CDC_COLS["customer"]
        )
        assert merged.exceptAll(expected).count() == 0
        assert expected.exceptAll(merged).count() == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS customer_bucketed")
