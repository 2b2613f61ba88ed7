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

``support_delta_update`` carries the FULL support algebra (new extreme
populations included), so the streamed consumer (streaming/mv.py
``minmax_stream``) maintains the support table itself with the identical
rules — batch and streamed forms cannot drift.

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


def support_delta_update(S: DataFrame, d_vals: DataFrame, group_col: str) -> DataFrame:
    """The support algebra: given the current support table (or the slice of
    it covering every touched group) and a signed value delta
    (group, s, v), return ONE row per TOUCHED group:

        (group, n, min_v, cnt_min, max_v, cnt_max, _dirty)

    with the new support values for delta-conclusive groups, and
    ``_dirty = true`` (extreme columns NULL) where an extreme's population
    was exhausted with no add taking its place — those groups need the
    bounded rescan. Groups reaching n = 0 come back with n = 0 (callers
    drop them). The delta is assumed SMALL (a micro-batch / one feed's
    touched keys): both aggregations here are delta-sized, and the support
    side joins broadcast."""
    dd = (
        d_vals.join(F.broadcast(S), group_col, "left")
        .groupBy(group_col)
        .agg(
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
    )
    # populations at the ADD extremes (only adds can sit strictly beyond the
    # old extremes, so these counts are add-only by construction)
    add_cnts = (
        d_vals.where("s = 1")
        .join(F.broadcast(dd.select(group_col, "min_add", "max_add")), group_col)
        .groupBy(group_col)
        .agg(
            F.sum(F.when(F.col("v") == F.col("min_add"), 1).otherwise(0)).alias(
                "n_at_min_add"
            ),
            F.sum(F.when(F.col("v") == F.col("max_add"), 1).otherwise(0)).alias(
                "n_at_max_add"
            ),
        )
    )
    m = (
        dd.join(F.broadcast(add_cnts), group_col, "left")
        .alias("d")
        .join(F.broadcast(S).alias("s"), group_col, "left")
    )
    exists = F.col("s.n").isNotNull()
    n_new = F.coalesce("s.n", F.lit(0)) + F.col("d.dn")
    min_alive = (F.coalesce("s.cnt_min", F.lit(0)) + F.col("d.d_cnt_min")) > 0
    max_alive = (F.coalesce("s.cnt_max", F.lit(0)) + F.col("d.d_cnt_max")) > 0
    min_takeover = F.col("d.min_add").isNotNull() & (
        ~exists | (F.col("d.min_add") < F.col("s.min_v"))
    )
    max_takeover = F.col("d.max_add").isNotNull() & (
        ~exists | (F.col("d.max_add") > F.col("s.max_v"))
    )
    dirty_min = exists & ~min_alive & ~min_takeover & (n_new > 0)
    dirty_max = exists & ~max_alive & ~max_takeover & (n_new > 0)
    new_min = F.when(min_takeover, F.col("d.min_add")).when(
        min_alive, F.col("s.min_v")
    )
    new_cnt_min = F.when(min_takeover, F.col("d.n_at_min_add")).when(
        min_alive, F.coalesce("s.cnt_min", F.lit(0)) + F.col("d.d_cnt_min")
    )
    new_max = F.when(max_takeover, F.col("d.max_add")).when(
        max_alive, F.col("s.max_v")
    )
    new_cnt_max = F.when(max_takeover, F.col("d.n_at_max_add")).when(
        max_alive, F.coalesce("s.cnt_max", F.lit(0)) + F.col("d.d_cnt_max")
    )
    return m.select(
        F.col(group_col),
        n_new.alias("n"),
        new_min.alias("min_v"),
        new_cnt_min.alias("cnt_min"),
        new_max.alias("max_v"),
        new_cnt_max.alias("cnt_max"),
        (dirty_min | dirty_max).alias("_dirty"),
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
    upd = support_delta_update(
        S, d_vals.select(group_col, "s", "v"), group_col
    ).persist()

    untouched = S.join(upd.select(group_col), group_col, "left_anti").select(
        F.col(group_col),
        F.col("n").alias("n_rows"),
        F.col("min_v").alias("min_cents"),
        F.col("max_v").alias("max_cents"),
    )
    clean = upd.where(~F.col("_dirty") & (F.col("n") > 0)).select(
        F.col(group_col),
        F.col("n").alias("n_rows"),
        F.col("min_v").alias("min_cents"),
        F.col("max_v").alias("max_cents"),
    )

    # exact bounded rescan of the dirty groups only: survivors = untouched
    # snapshot rows of those groups ∪ the delta's +1 images landing there
    dirty_groups = upd.where("_dirty").select(group_col)
    survivors = _dirty_survivors(
        snapshot, delta, d_vals, dirty_groups, key, group_col, val_col
    )
    rescan = survivors.groupBy(group_col).agg(
        F.count("*").alias("n_rows"),
        F.min("v").alias("min_cents"),
        F.max("v").alias("max_cents"),
    )
    return untouched.unionByName(clean).unionByName(rescan)


def _dirty_survivors(
    snapshot: DataFrame,
    delta: DataFrame,
    d_vals: DataFrame,
    dirty_groups: DataFrame,
    key: str,
    group_col: str,
    val_col: str,
) -> DataFrame:
    untouched = (
        snapshot.select(
            F.col(key), F.col(group_col), cents_col(F.col(val_col)).alias("v")
        )
        .join(F.broadcast(dirty_groups), group_col, "left_semi")
        .join(delta.select(key).distinct(), key, "left_anti")
        .select(group_col, "v")
    )
    readds = (
        d_vals.where("s = 1")
        .join(F.broadcast(dirty_groups), group_col, "left_semi")
        .select(group_col, "v")
    )
    return untouched.unionByName(readds)
