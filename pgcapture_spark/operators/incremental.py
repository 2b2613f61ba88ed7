"""Incremental aggregate maintenance over a CDC feed — materialized-view delta
maintenance, the downstream consumer pattern the reference's debounced handlers
feed (SURVEY.md §2 C1-C2: per-table handlers reacting to row changes; the
classic use is keeping an aggregate in sync without rescanning the base table).

Semantics: given a maintained GROUP BY aggregate ``base`` over ``snapshot`` and
a change feed, produce the aggregate of the *applied* snapshot by combining
``base`` with a delta computed ONLY from the touched keys:

    delta(g) = agg(new image of touched keys) - agg(old image of touched keys)
    final(g) = base(g) + delta(g),  groups with count 0 dropped

Scale design (100 TB): the base aggregate is a tiny maintained table (one row
per group) that at scale would be read, not recomputed — ``incremental_agg``
takes it as a DataFrame so callers pass the stored MV. The delta path is
O(touched keys): a semi-join prunes the snapshot to touched keys (broadcastable
when the change set is small — AQE decides), one ``cdc_apply`` fold, and a
union-aggregate with map-side partial combine. No full-table rescan; count and
sum are the delta-maintainable aggregates (min/max are not — they need a rescan
on delete, which is exactly why MVs restrict themselves to abelian aggregates).

Determinism contract: monetary sums are exact integer cents
(``floor(x * 100 + 0.5)`` — identical IEEE double ops in Spark and DuckDB), so
the incremental result hash-matches a from-scratch oracle bit-for-bit; NULL
values count as 0 cents in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pgcapture_spark.operators.apply import last_image


def cents(col: str) -> Column:
    """Exact integer cents of a double column; NULL → 0 (both engines)."""
    return F.expr(f"CAST(floor(coalesce({col}, 0.0) * 100 + 0.5) AS BIGINT)")


def cents_col(c: Column) -> Column:
    """Column-expression form of :func:`cents`."""
    return F.floor(F.coalesce(c, F.lit(0.0)) * 100 + F.lit(0.5)).cast("long")


def group_agg(df: DataFrame, group_col: str, val_col: str) -> DataFrame:
    """The maintained aggregate shape: count + exact-cents sum per group."""
    return df.groupBy(group_col).agg(
        F.count("*").alias("n_rows"), F.sum(cents(val_col)).alias("bal_cents")
    )


def _apply_delta(base: DataFrame, delta: DataFrame, group_col: str) -> DataFrame:
    """base + delta per group; groups whose count reaches 0 are dropped."""
    merged = base.alias("b").join(delta.alias("d"), on=group_col, how="full_outer")
    return merged.select(
        F.col(group_col),
        (F.coalesce("b.n_rows", F.lit(0)) + F.coalesce("d.dn", F.lit(0))).alias("n_rows"),
        (F.coalesce("b.bal_cents", F.lit(0)) + F.coalesce("d.dc", F.lit(0))).alias(
            "bal_cents"
        ),
    ).where(F.col("n_rows") > 0)


def merge_agg_delta(base: DataFrame, delta: DataFrame, group_col: str) -> DataFrame:
    """Public form of :func:`_apply_delta` — merge a per-group (dn, dc) delta
    into a maintained aggregate slice (full-outer; count-0 groups drop).
    ``base`` may be any SLICE of the maintained table that covers every group
    ``delta`` names (the bucketed streaming consumer feeds it the touched
    agg-buckets only)."""
    return _apply_delta(base, delta, group_col)


def signed_agg_delta(signed: DataFrame, group_col: str, val_col: str) -> DataFrame:
    """Per-group (dn, dc) delta from a SIGNED row delta (operators/ivm.py
    ``signed_key_delta`` output: s = ±1 plus the full row image): each signed
    row contributes (s, s·cents(val)); groups with a zero net delta drop so
    the downstream agg-bucket probe touches only genuinely-changed groups."""
    contrib = signed.select(
        F.col(group_col),
        F.col("s").alias("dn"),
        (F.col("s") * cents(val_col)).alias("dc"),
    )
    return (
        contrib.groupBy(group_col)
        .agg(F.sum("dn").alias("dn"), F.sum("dc").alias("dc"))
        .where((F.col("dn") != 0) | (F.col("dc") != 0))
    )


def delta_merge(
    base: DataFrame, old_part: DataFrame, new_part: DataFrame, group_col: str, val_col: str
) -> DataFrame:
    """Combine a maintained aggregate with the retract/add contributions of the
    touched keys' old and new images — for callers that already hold MATERIALIZED
    old/new images (the streaming form reads them from state, so evaluating
    each side once is free there)."""
    contrib = old_part.select(
        F.col(group_col),
        F.lit(-1).cast("long").alias("dn"),
        (-cents(val_col)).alias("dc"),
    ).unionByName(
        new_part.select(
            F.col(group_col),
            F.lit(1).cast("long").alias("dn"),
            cents(val_col).alias("dc"),
        )
    )
    delta = contrib.groupBy(group_col).agg(
        F.sum("dn").alias("dn"), F.sum("dc").alias("dc")
    )
    return _apply_delta(base, delta, group_col)


def incremental_agg(
    base: DataFrame,
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    group_col: str,
    val_col: str,
    cols: list[str],
) -> DataFrame:
    """Maintain ``base = group_agg(snapshot)`` under ``changes`` without a full
    rescan: old/new images of the touched keys only.

    Single-pass lazy form: the feed is folded ONCE (``last_image``), the old
    images join it once, and each joined row explodes into its retract (old
    image) and add (resolved new image) contributions — so the expensive
    feed/snapshot subtrees are evaluated exactly once even though the delta
    needs both sides. (A union of separate old/new branches would re-evaluate
    the whole join tree per branch — measured 6× slower at sf0.1.)"""
    img = last_image(changes, key, cols)
    old = snapshot.join(img.select(key), key, "left_semi").withColumn("_old", F.lit(1))
    j = img.alias("i").join(old.alias("s"), on=key, how="left_outer")

    def resolved(c: str) -> Column:
        return F.when(F.col(f"_set_{c}").isNotNull(), F.col(f"_set_{c}.v")).otherwise(
            F.col(f"s.{c}")
        )

    contrib = (
        j.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(f"s.{group_col}").alias("g"),
                        F.lit(-1).cast("long").alias("dn"),
                        (-cents_col(F.col(f"s.{val_col}"))).alias("dc"),
                        (F.col("_old") == 1).alias("ok"),
                    ),
                    F.struct(
                        resolved(group_col).alias("g"),
                        F.lit(1).cast("long").alias("dn"),
                        cents_col(resolved(val_col)).alias("dc"),
                        (F.col("_last_op") != "DELETE").alias("ok"),
                    ),
                )
            ).alias("c")
        )
        .where(F.col("c.ok"))
        .select(F.col("c.g").alias(group_col), "c.dn", "c.dc")
    )
    delta = contrib.groupBy(group_col).agg(F.sum("dn").alias("dn"), F.sum("dc").alias("dc"))
    return _apply_delta(base, delta, group_col)


def incremental_agg_oracle_sql(applied_sql: str, group_col: str, val_col: str) -> str:
    """Oracle: the same aggregate computed FROM SCRATCH over the applied
    snapshot — incremental maintenance must be indistinguishable from it."""
    return f"""
WITH applied AS ({applied_sql})
SELECT {group_col}, count(*) AS n_rows,
       CAST(sum(CAST(floor(coalesce({val_col}, 0.0) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS bal_cents
FROM applied
GROUP BY {group_col}
"""
