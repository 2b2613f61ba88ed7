"""DDL replay helpers.

Reference: ``handleDDL``/``parseDDL`` (pkg/sink/postgres.go:296-393): DDL
statements that themselves perform DML (CREATE TABLE AS / SELECT INTO /
INSERT...) put their target relations in a *skip set* — subsequent row events
for those relations WITHIN THE SAME TRANSACTION are duplicates of work the DDL
already did, and are dropped. Consecutive identical DDL is deduped by crc32.

Spark restatement: the skip set is an anti-join of changes against DDL-touched
(tx, relation) pairs; schema evolution itself is applied to the target table's
schema registry (catalog.py) — at scale, a Delta/Iceberg ``ALTER TABLE``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ddl_skip_filter(
    changes: DataFrame,
    ddl_touched: DataFrame,
    tx_col: str = "lsn",
    rel_col: str = "table_name",
) -> DataFrame:
    """Drop change events whose (transaction, relation) appears in the DDL
    skip set — LEFT ANTI join, broadcast (the skip set is tiny)."""
    return changes.join(
        F.broadcast(ddl_touched.select(tx_col, rel_col).distinct()),
        on=[tx_col, rel_col],
        how="left_anti",
    )


def dedupe_consecutive_ddl(ddl: DataFrame) -> DataFrame:
    """Dedupe identical consecutive DDL statements (reference crc32 dedupe,
    pkg/sink/postgres.go:304-312): keep a DDL event only if the previous event
    in (lsn, seq) order has a different statement."""
    from pyspark.sql import Window as W

    w = W.orderBy("lsn", "seq")  # global order — DDL streams are tiny
    return (
        ddl.withColumn("_prev", F.lag("query").over(w))
        .where(F.col("_prev").isNull() | (F.col("_prev") != F.col("query")))
        .drop("_prev")
    )
