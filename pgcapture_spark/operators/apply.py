"""``cdc_apply`` — replay a change feed onto a snapshot (the engine's core).

Reference semantics being reproduced (see SURVEY.md §2 A3-A5, §7 P1):

- events are applied in total ``(lsn, seq)`` order (pkg/cursor/main.go:20-26;
  the sink's tx state machine pkg/sink/postgres.go:207-278),
- INSERT/UPDATE/DELETE resolve per key; the last event wins
  (idempotent upsert — pkg/sink/postgres.go:395-593),
- a column ABSENT from an UPDATE's ``present`` list is unchanged TOAST: the
  previous image's value must be kept (pkg/decode/decoder.go:106-114), while a
  column present with value NULL is an explicit SQL NULL set,
- the reference applies one transaction at a time; at Spark scale we instead
  reduce every micro-batch/feed to its FINAL image per key before merging —
  per-key ordering is preserved, cross-key transactional co-visibility is
  relaxed to per-batch atomicity (documented semantic delta, SURVEY §7).

Scale design (100 TB): ONE shuffle total on the key.  The per-key fold is an
aggregation (``max_by`` over the ``ord`` = lsn*100+seq order, with a FILTER on
column presence), NOT a window — aggregations get map-side partial combine, so
a feed with many events per key collapses before the exchange.  The final-image
side is then FULL OUTER joined with the snapshot on the key; with AQE on, a
small change set broadcasts against an arbitrarily large snapshot, and a
bucketed/partitioned snapshot co-locates the join.  Everything is built-in
Catalyst expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def present_contains(col: str) -> Column:
    """Membership test in the comma-joined ``present`` column list."""
    return F.instr(F.concat(F.lit(","), F.col("present"), F.lit(",")), f",{col},") > 0


def _keys(key: str | list[str]) -> list[str]:
    """Key columns as a list — the reference's replica identity may be any
    column set (pkg/decode/schema.go:161-191), so every operator here accepts
    a single name or a composite key."""
    return [key] if isinstance(key, str) else list(key)


def last_image(
    changes: DataFrame, key: str | list[str], cols: list[str], order_col: str = "ord"
) -> DataFrame:
    """Reduce a change feed to one row per key: the final operation plus, for
    every column, the LAST value that was actually present in an event image
    (struct-wrapped so an explicit NULL set is distinguishable from "never
    set")."""
    aggs = [
        F.expr(f"max_by(op, {order_col})").alias("_last_op"),
        F.max(order_col).alias("_last_ord"),
    ]
    for c in cols:
        aggs.append(
            F.expr(
                f"max_by(named_struct('v', {c}), {order_col}) "
                f"FILTER (WHERE instr(',' || present || ',', ',{c},') > 0)"
            ).alias(f"_set_{c}")
        )
    return changes.groupBy(*_keys(key)).agg(*aggs)


def merge_images(
    snapshot: DataFrame, img: DataFrame, key: str | list[str], cols: list[str]
) -> DataFrame:
    """Merge pre-folded per-key final images into a snapshot (the join half of
    ``cdc_apply``). Full outer: snapshot-only rows pass through, image-only
    rows are inserts, matches resolve per column; DELETE images drop the row.

    Scale note: a FULL OUTER join cannot broadcast, so this shuffles both
    sides — correct for a one-shot replay where the change set touches most
    keys. For incremental apply at 100 TB use BucketedSnapshotState
    (streaming/state.py), which confines the join to the key-buckets the
    micro-batch actually touches."""
    joined = snapshot.alias("s").join(img.alias("i"), on=_keys(key), how="full_outer")
    alive = joined.where(F.col("_last_op").isNull() | (F.col("_last_op") != "DELETE"))
    out = [F.col(k) for k in _keys(key)]
    for c in cols:
        out.append(
            F.when(F.col(f"_set_{c}").isNotNull(), F.col(f"_set_{c}.v"))
            .otherwise(F.col(f"s.{c}"))
            .alias(c)
        )
    return alive.select(*out)


def cdc_apply(
    snapshot: DataFrame, changes: DataFrame, key: str | list[str], cols: list[str]
) -> DataFrame:
    """Apply ``changes`` (schema: ord/op/present + key + cols) to ``snapshot``.

    Returns the new snapshot with columns ``[key, *cols]``: deleted keys
    removed, updated columns folded (explicit NULLs kept, TOAST-absent columns
    inherited from the snapshot), new keys inserted.
    """
    return merge_images(snapshot, last_image(changes, key, cols), key, cols)


def last_image_window(
    changes: DataFrame, key: str | list[str], order_col: str = "ord"
) -> DataFrame:
    """Window-based variant: the raw last EVENT per key (no per-column fold) —
    the shape used by the apply pipeline's per-batch reduction (SURVEY §3 E2)
    and by consumers that only want the newest row event."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*_keys(key)).orderBy(F.col(order_col).desc())
    return (
        changes.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )


def apply_oracle_sql(feed_sql: str, table: str, key: str | list[str], cols: list[str]) -> str:
    """DuckDB oracle for ``cdc_apply`` over the portable feed SQL — the same
    fold expressed in ANSI-ish SQL (arg_max + FILTER + struct wrap)."""
    keys = _keys(key)
    set_aggs = ",\n         ".join(
        f"arg_max(CASE WHEN instr(',' || present || ',', ',{c},') > 0 "
        f"THEN {{'v': {c}}} END, ord) "
        f"FILTER (WHERE instr(',' || present || ',', ',{c},') > 0) AS set_{c}"
        for c in cols
    )
    finals = ",\n       ".join(
        f"CASE WHEN i.set_{c} IS NOT NULL THEN (i.set_{c}).v ELSE s.{c} END AS {c}" for c in cols
    )
    key_list = ", ".join(keys)
    key_out = ",\n       ".join(f"COALESCE(s.{k}, i.{k}) AS {k}" for k in keys)
    key_on = " AND ".join(f"s.{k} = i.{k}" for k in keys)
    return f"""
WITH feed AS ({feed_sql}),
img AS (
  SELECT {key_list},
         arg_max(op, ord) AS last_op,
         {set_aggs}
  FROM feed GROUP BY {key_list}
)
SELECT {key_out},
       {finals}
FROM {table} s FULL OUTER JOIN img i ON {key_on}
WHERE i.last_op IS NULL OR i.last_op <> 'DELETE'
"""
