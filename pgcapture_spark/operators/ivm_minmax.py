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
    # the support build is a full window scan; it is referenced three times
    # (both support_delta_update joins + the final merge), so persist the
    # 1-row-per-group result — a stored-support deployment reads it instead
    S = (
        support
        if support is not None
        else minmax_support(snap_vals, group_col).persist()
    )

    # lazy lineage cut, not persist: the delta feeds the support update,
    # the dirty rescan, and the merge — leaf-planning each reference (see
    # ivm.ivm_join_view's note; measured on ivm_topk 16.5s -> 4.0s warm)
    delta = signed_key_delta(snapshot, changes, key, cols).localCheckpoint(
        eager=False
    )
    d_vals = delta.select(
        F.col(key), F.col(group_col), F.col("s"), cents_col(F.col(val_col)).alias("v")
    )
    upd = support_delta_update(
        S, d_vals.select(group_col, "s", "v"), group_col
    ).persist()

    # exact bounded rescan of the dirty groups only: survivors = untouched
    # snapshot rows of those groups ∪ the delta's +1 images landing there.
    # Each side aggregates SEPARATELY and the group-sized results merge with
    # a full-outer join — NOT a union of the two row sources: both share the
    # persisted delta subtree, and a union defeats its cache substitution
    # (the DeduplicateRelations trap), re-deriving the whole feed fold per
    # branch (measured ~2× the query at sf0.1).
    dirty_groups = upd.where("_dirty").select(group_col)
    rescan = _dirty_rescan(
        snapshot, delta, d_vals, dirty_groups, key, group_col, val_col
    )
    # assemble by FULL-OUTER merging the three group-sized frames, NOT a
    # union of branches: unioning branches that share a persisted subtree
    # (delta / upd here) defeats the cache substitution entirely
    # (DeduplicateRelations re-ids the repeated relation before the cache
    # lookup — the documented Catalyst trap, see operators/ivm.py), so the
    # feed fold would re-derive per branch. Coalesce order encodes the
    # precedence: rescan (dirty) > support update (touched clean) >
    # stored support row (untouched); a dirty group with survivors always
    # has a rescan row, and one without survivors has upd.n = 0.
    m = (
        S.alias("s")
        .join(upd.alias("u"), group_col, "full_outer")
        .join(rescan.alias("r"), group_col, "full_outer")
    )
    return m.select(
        F.col(group_col),
        F.coalesce("r.rs_n", "u.n", "s.n").alias("n_rows"),
        F.coalesce("r.rs_min", "u.min_v", "s.min_v").alias("min_cents"),
        F.coalesce("r.rs_max", "u.max_v", "s.max_v").alias("max_cents"),
    ).where(F.col("n_rows") > 0)


def _dirty_rescan(
    snapshot: DataFrame,
    delta: DataFrame,
    d_vals: DataFrame,
    dirty_groups: DataFrame,
    key: str,
    group_col: str,
    val_col: str,
) -> DataFrame:
    """(group, rs_n, rs_min, rs_max) for the dirty groups, from the two
    survivor sources aggregated independently and join-merged (see caller)."""
    a1 = (
        snapshot.select(
            F.col(key), F.col(group_col), cents_col(F.col(val_col)).alias("v")
        )
        .join(F.broadcast(dirty_groups), group_col, "left_semi")
        .join(delta.select(key).distinct(), key, "left_anti")
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n1"),
            F.min("v").alias("mn1"),
            F.max("v").alias("mx1"),
        )
    )
    a2 = (
        d_vals.where("s = 1")
        .join(F.broadcast(dirty_groups), group_col, "left_semi")
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n2"),
            F.min("v").alias("mn2"),
            F.max("v").alias("mx2"),
        )
    )
    merged = a1.join(a2, group_col, "full_outer")
    return merged.select(
        F.col(group_col),
        (F.coalesce("n1", F.lit(0)) + F.coalesce("n2", F.lit(0))).alias("rs_n"),
        F.least(
            F.coalesce("mn1", "mn2"), F.coalesce("mn2", "mn1")
        ).alias("rs_min"),
        F.greatest(
            F.coalesce("mx1", "mx2"), F.coalesce("mx2", "mx1")
        ).alias("rs_max"),
    )
