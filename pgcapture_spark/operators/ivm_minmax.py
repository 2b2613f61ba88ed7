"""Incremental maintenance of MIN/MAX aggregates under CDC deletes — the
classic NON-abelian case (SURVEY §2 C1-C2 consumer patterns, extending
``operators/incremental.py``, whose docstring names exactly this restriction:
"min/max are not [delta-maintainable] — they need a rescan on delete").

The standard MV answer (what this module implements): maintain a tiny
per-group SUPPORT row (min value + how many rows sit at it, same for max,
plus the row count) and classify each group's delta:

- additions at-or-below the current min (or above the max) move the extreme
  directly — O(delta),
- retractions strictly inside the (min, max) interval change nothing but the
  count — O(delta),
- retractions that EXHAUST the extreme's population, with no add taking its
  place, mark the group DIRTY: the next extreme is unknowable from the
  support row, so ONLY those groups rescan — a semi-join-pruned pass over
  the base table (predicate pushdown reaches the scan; at 100 TB with the
  base partitioned/clustered by group this is a partition-pruned read, and
  the dirty set is typically a vanishing fraction of groups per batch).

The rescan is exact, not a fallback heuristic: survivors of a dirty group =
(snapshot rows of that group whose key the batch never touched) ∪ (the
delta's +1 images landing in that group) — the same signed-delta identity the
bucketed snapshot merge uses (streaming/mv.py).

Cross-engine determinism: values are exact integer cents throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgcapture_spark.operators.incremental import cents_col
from pgcapture_spark.operators.ivm import signed_key_delta


def minmax_support(vals: DataFrame, group_col: str) -> DataFrame:
    """The maintained support table from a (group, v) projection: one row per
    group with (n, min_v, cnt_min, max_v, cnt_max). One scan, ONE shuffle —
    the extreme-population counts come from window functions sharing the
    groupBy's partitioning."""
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col)
    with_ext = vals.select(
        group_col,
        "v",
        F.min("v").over(w).alias("_mn"),
        F.max("v").over(w).alias("_mx"),
    )
    return with_ext.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.first("_mn").alias("min_v"),
        F.sum(F.when(F.col("v") == F.col("_mn"), 1).otherwise(0)).alias("cnt_min"),
        F.first("_mx").alias("max_v"),
        F.sum(F.when(F.col("v") == F.col("_mx"), 1).otherwise(0)).alias("cnt_max"),
    )


def ivm_minmax_view(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    group_col: str,
    val_col: str,
    cols: list[str],
    support: DataFrame | None = None,
) -> DataFrame:
    """Maintain V = (count, min, max) per group under a CDC feed without a
    full rescan: support-row algebra for the delta-decidable groups, an exact
    bounded rescan for the dirty ones. ``support`` is the stored support
    table (recomputed here when absent — a real deployment reads it).

    Returns (group_col, n_rows, min_cents, max_cents); groups whose count
    reaches 0 drop. Converges to the from-scratch aggregate of the applied
    snapshot (the oracle)."""
    snap_vals = snapshot.select(
        F.col(group_col), cents_col(F.col(val_col)).alias("v")
    )
    S = support if support is not None else minmax_support(snap_vals, group_col)

    delta = signed_key_delta(snapshot, changes, key, cols).persist()
    d_vals = delta.select(
        F.col(key), F.col(group_col), F.col("s"), cents_col(F.col(val_col)).alias("v")
    )
    # per-group delta facts against the (broadcast, group-sized) support row
    j = d_vals.join(F.broadcast(S), group_col, "left")
    dd = j.groupBy(group_col).agg(
        F.sum("s").alias("dn"),
        F.sum(F.when(F.col("v") == F.col("min_v"), F.col("s")).otherwise(0)).alias(
            "d_cnt_min"
        ),
        F.sum(F.when(F.col("v") == F.col("max_v"), F.col("s")).otherwise(0)).alias(
            "d_cnt_max"
        ),
        F.min(F.when(F.col("s") == 1, F.col("v"))).alias("min_add"),
        F.max(F.when(F.col("s") == 1, F.col("v"))).alias("max_add"),
    )

    m = S.alias("s").join(dd.alias("d"), group_col, "full_outer")
    exists = F.col("s.n").isNotNull()
    touched = F.col("d.dn").isNotNull()
    n_new = F.coalesce("s.n", F.lit(0)) + F.coalesce("d.dn", F.lit(0))
    min_alive = (F.coalesce("s.cnt_min", F.lit(0)) + F.coalesce("d.d_cnt_min", F.lit(0))) > 0
    max_alive = (F.coalesce("s.cnt_max", F.lit(0)) + F.coalesce("d.d_cnt_max", F.lit(0))) > 0
    dirty_min = exists & touched & ~min_alive & (
        F.col("d.min_add").isNull() | (F.col("d.min_add") > F.col("s.min_v"))
    )
    dirty_max = exists & touched & ~max_alive & (
        F.col("d.max_add").isNull() | (F.col("d.max_add") < F.col("s.max_v"))
    )
    new_min = (
        F.when(~exists, F.col("d.min_add"))
        .when(min_alive, F.least("s.min_v", F.coalesce("d.min_add", "s.min_v")))
        .otherwise(F.col("d.min_add"))  # exhausted but an add took over (≤ old min)
    )
    new_max = (
        F.when(~exists, F.col("d.max_add"))
        .when(max_alive, F.greatest("s.max_v", F.coalesce("d.max_add", "s.max_v")))
        .otherwise(F.col("d.max_add"))
    )
    classified = m.select(
        F.col(group_col),
        n_new.alias("n_rows"),
        new_min.alias("min_cents"),
        new_max.alias("max_cents"),
        (dirty_min | dirty_max).alias("_dirty"),
    ).persist()

    clean = classified.where(~F.col("_dirty") & (F.col("n_rows") > 0)).drop("_dirty")

    # exact bounded rescan of the dirty groups only: survivors = untouched
    # snapshot rows of those groups ∪ the delta's +1 images landing there
    dirty_groups = classified.where("_dirty").select(group_col)
    untouched = snapshot.select(
        F.col(key), F.col(group_col), cents_col(F.col(val_col)).alias("v")
    ).join(F.broadcast(dirty_groups), group_col, "left_semi").join(
        delta.select(key).distinct(), key, "left_anti"
    ).select(group_col, "v")
    readds = d_vals.where("s = 1").join(
        F.broadcast(dirty_groups), group_col, "left_semi"
    ).select(group_col, "v")
    rescan = (
        untouched.unionByName(readds)
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_rows"),
            F.min("v").alias("min_cents"),
            F.max("v").alias("max_cents"),
        )
    )
    return clean.unionByName(rescan)
