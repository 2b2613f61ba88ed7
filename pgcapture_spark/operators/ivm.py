"""Incremental view maintenance of a JOIN view under CDC feeds — the delta
algebra that keeps a two-table materialized aggregate in sync without
rescanning either base table (SURVEY §2 C1-C2: the reference's per-table
consumers exist precisely to maintain downstream materializations,
pkg/pgcapture/consumer.go:86-142; this extends ``operators/incremental.py``
from single-table GROUP BY views to views over a JOIN).

Delta rule (signed-multiset semantics): for V = γ(O ⋈ C),

    Δ(O ⋈ C) = ΔO ⋈ C  ∪  O ⋈ ΔC  ∪  ΔO ⋈ ΔC

where O, C are the BEFORE states and ΔO/ΔC are signed per-key deltas
(-1 × before image, +1 × after image of every touched key). Joined-pair
multiplicities multiply, so the cross term carries sign s_o·s_c. The delta
then aggregates per group and merges into the maintained view with the
abelian +/- rule (groups reaching count 0 drop).

Scale design (100 TB): ΔO and ΔC are O(touched keys). The two mixed terms
each scan ONE base table once with the (small) delta broadcast onto it —
never a base×base join, never a full-view recompute; a custkey-bucketed
orders layout would turn even those scans into bucket lookups. The cross
term is delta×delta (tiny). Sums are exact integer cents (the
cross-engine determinism contract shared with ``operators/incremental.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pgcapture_spark.operators.apply import last_image
from pgcapture_spark.operators.incremental import cents


def signed_key_delta(
    snapshot: DataFrame, changes: DataFrame, key: str, cols: list[str]
) -> DataFrame:
    """Signed per-key delta of a change feed against its snapshot: one row
    with ``s = -1`` per touched key that existed before (its before image)
    and one with ``s = +1`` per touched key that survives (its resolved
    after image — TOAST-absent columns inherited from the before image).

    Single-pass lazy form (same rationale as ``incremental_agg``): the feed
    folds ONCE, the before images join it once, and each joined row explodes
    into its retract/add contributions — separate old/new branches would
    re-evaluate the whole fold per branch."""
    img = last_image(changes, key, cols)
    old = snapshot.join(img.select(key), key, "left_semi").withColumn(
        "_old", F.lit(1)
    )
    j = img.alias("i").join(old.alias("s"), on=key, how="left_outer")

    def resolved(c: str) -> Column:
        return F.when(F.col(f"_set_{c}").isNotNull(), F.col(f"_set_{c}.v")).otherwise(
            F.col(f"s.{c}")
        )

    contrib = j.select(
        F.col(key),
        F.explode(
            F.array(
                F.struct(
                    F.lit(-1).cast("long").alias("s"),
                    *[F.col(f"s.{c}").alias(c) for c in cols],
                    F.col("_old").isNotNull().alias("keep"),
                ),
                F.struct(
                    F.lit(1).cast("long").alias("s"),
                    *[resolved(c).alias(c) for c in cols],
                    (F.col("_last_op") != "DELETE").alias("keep"),
                ),
            )
        ).alias("e"),
    ).where(F.col("e.keep"))
    return contrib.select(key, "e.s", *[F.col(f"e.{c}").alias(c) for c in cols])


def ivm_join_delta(
    orders_before: DataFrame,
    customer_before: DataFrame,
    d_orders: DataFrame,
    d_customer: DataFrame,
) -> DataFrame:
    """The three delta-join terms of V = γ_{c_nationkey}(orders ⋈ customer),
    aggregated to per-group (dn, dc). Deltas broadcast onto the base scans;
    the base tables are never joined to each other here."""
    o0 = orders_before.select(
        F.col("o_custkey").alias("ck"), cents("o_totalprice").alias("cts")
    )
    c0 = customer_before.select(F.col("c_custkey").alias("ck"), "c_nationkey")
    do = d_orders.select(
        F.col("o_custkey").alias("ck"),
        cents("o_totalprice").alias("cts"),
        F.col("s").alias("so"),
    )
    dc = d_customer.select(
        F.col("c_custkey").alias("ck"), "c_nationkey", F.col("s").alias("sc")
    )
    t1 = c0.join(F.broadcast(do), "ck").select(
        "c_nationkey", F.col("so").alias("sgn"), "cts"
    )
    t2 = o0.join(F.broadcast(dc), "ck").select(
        "c_nationkey", F.col("sc").alias("sgn"), "cts"
    )
    t3 = do.join(dc, "ck").select(
        "c_nationkey", (F.col("so") * F.col("sc")).alias("sgn"), "cts"
    )

    # each term aggregates SEPARATELY and the tiny per-group results merge
    # with full-outer joins — NOT a union of the three raw-contribution
    # branches: unioning branches that share a persisted subtree defeats the
    # cache substitution (DeduplicateRelations re-ids the repeated relation
    # before the cache lookup), so the deltas' feed folds would re-evaluate
    # per branch (measured: the persisted RDDs never materialize under the
    # union form). Join-merging preserves the substitution.
    def _agg(t: DataFrame, i: int) -> DataFrame:
        return t.groupBy("c_nationkey").agg(
            F.sum("sgn").alias(f"dn{i}"),
            F.sum(F.col("sgn") * F.col("cts")).alias(f"dc{i}"),
        )

    merged = (
        _agg(t1, 1)
        .join(_agg(t2, 2), "c_nationkey", "full_outer")
        .join(_agg(t3, 3), "c_nationkey", "full_outer")
    )
    zero = F.lit(0).cast("long")
    return merged.select(
        "c_nationkey",
        (
            F.coalesce("dn1", zero) + F.coalesce("dn2", zero) + F.coalesce("dn3", zero)
        ).alias("dn"),
        (
            F.coalesce("dc1", zero) + F.coalesce("dc2", zero) + F.coalesce("dc3", zero)
        ).alias("dc"),
    ).where((F.col("dn") != 0) | (F.col("dc") != 0))


def join_view_base(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """The maintained view's from-scratch shape (the one-time backfill):
    per-nation order count + exact-cents revenue over orders ⋈ customer."""
    return (
        orders.select(F.col("o_custkey").alias("ck"), cents("o_totalprice").alias("cts"))
        .join(customer.select(F.col("c_custkey").alias("ck"), "c_nationkey"), "ck")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_orders"), F.sum("cts").alias("sum_cents"))
    )


def merge_view_delta(base: DataFrame, delta: DataFrame) -> DataFrame:
    """base + delta per group; groups whose count reaches 0 drop (untouched
    groups pass through — the full-outer keeps them with a NULL delta)."""
    merged = base.alias("b").join(delta.alias("d"), on="c_nationkey", how="full_outer")
    return merged.select(
        F.col("c_nationkey"),
        (F.coalesce("b.n_orders", F.lit(0)) + F.coalesce("d.dn", F.lit(0))).alias(
            "n_orders"
        ),
        (F.coalesce("b.sum_cents", F.lit(0)) + F.coalesce("d.dc", F.lit(0))).alias(
            "sum_cents"
        ),
    ).where(F.col("n_orders") > 0)


def ivm_join_view(
    orders: DataFrame,
    customer: DataFrame,
    orders_feed: DataFrame,
    customer_feed: DataFrame,
    orders_cols: list[str],
    customer_cols: list[str],
    base: DataFrame | None = None,
) -> DataFrame:
    """Maintain V = γ_{c_nationkey}(orders ⋈ customer) under BOTH tables'
    change feeds. ``base`` is the stored MV (recomputed here when absent —
    a real deployment reads it, never recomputes)."""
    if base is None:
        base = join_view_base(orders, customer)
    # lineage-cut the (touched-keys-sized) deltas rather than persist: each
    # is referenced by two of the three delta-join terms, and with plain
    # persist every reference embeds the whole feed-fold subtree in the
    # logical plan — Catalyst PLANNING, not execution, then dominates (the
    # ivm_topk measurement: 16.5s -> 4.0s warm at sf0.1 from this one
    # change; same class here). The lazy localCheckpoint materializes once,
    # costs O(delta) executor storage, and every downstream reference plans
    # against a leaf. Trade-off vs persist: lineage is TRUNCATED — executor
    # loss fails the query instead of recomputing, and the blocks free via
    # GC, not catalog.clearCache (see ivm_topk.ivm_topk_view's note; use
    # reliable checkpointing where executor loss matters).
    d_o = signed_key_delta(
        orders, orders_feed, "o_orderkey", orders_cols
    ).localCheckpoint(eager=False)
    d_c = signed_key_delta(
        customer, customer_feed, "c_custkey", customer_cols
    ).localCheckpoint(eager=False)
    return merge_view_delta(base, ivm_join_delta(orders, customer, d_o, d_c))


def ivm_distinct_view(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    group_col: str,
    dist_col: str,
    cols: list[str],
    support: DataFrame | None = None,
) -> DataFrame:
    """Maintained COUNT(DISTINCT dist_col) per group — the other classic
    non-abelian aggregate, made delta-maintainable through its standard
    SUPPORT TABLE: one (group, value) → row-count table, which IS abelian
    (adds +1, retracts -1); distinct = values with count > 0. A retraction
    never forces a rescan here (unlike min/max) because the support keeps
    every value's population, at the cost of a support table proportional to
    the number of DISTINCT (group, value) pairs — the textbook space/rescan
    trade between the two maintenance strategies.

    Returns (group_col, n_distinct, n_rows); NULL values count toward
    n_rows but not n_distinct (SQL COUNT(DISTINCT) semantics). Groups with
    0 rows drop."""
    sup = (
        support
        if support is not None
        else snapshot.groupBy(group_col, dist_col).agg(F.count("*").alias("cnt"))
    )
    delta = signed_key_delta(snapshot, changes, key, cols).localCheckpoint(
        eager=False
    )
    d_sup = (
        delta.groupBy(group_col, dist_col)
        .agg(F.sum("s").alias("dcnt"))
        .where(F.col("dcnt") != 0)
    )
    merged = sup.alias("b").join(
        d_sup.alias("d"), on=[group_col, dist_col], how="full_outer"
    ).select(
        F.col(group_col),
        F.col(dist_col),
        (F.coalesce("b.cnt", F.lit(0)) + F.coalesce("d.dcnt", F.lit(0))).alias("cnt"),
    ).where(F.col("cnt") > 0)
    return merged.groupBy(group_col).agg(
        F.count(F.when(F.col(dist_col).isNotNull(), 1)).alias("n_distinct"),
        F.sum("cnt").alias("n_rows"),
    )


def ivm_star_view(
    view_delta: DataFrame,
    dims: DataFrame,
    base: DataFrame,
) -> DataFrame:
    """Roll a maintained join-view delta UP a static dimension chain (the
    star-schema form): ``view_delta`` is the per-c_nationkey (dn, dc) delta
    from :func:`ivm_join_delta`; ``dims`` maps c_nationkey → the coarser
    grain (e.g. nation ⋈ region → r_name, 25 rows — broadcast); ``base`` is
    the stored coarse view. Static dimensions contribute no delta terms of
    their own, so a 4-table view costs exactly the 2-table delta plus one
    broadcast hash join — the reason star-schema MVs scale."""
    d_coarse = (
        view_delta.join(F.broadcast(dims), "c_nationkey")
        .groupBy("r_name")
        .agg(F.sum("dn").alias("dn"), F.sum("dc").alias("dc"))
    )
    merged = base.alias("b").join(d_coarse.alias("d"), on="r_name", how="full_outer")
    return merged.select(
        F.col("r_name"),
        (F.coalesce("b.n_orders", F.lit(0)) + F.coalesce("d.dn", F.lit(0))).alias(
            "n_orders"
        ),
        (F.coalesce("b.sum_cents", F.lit(0)) + F.coalesce("d.dc", F.lit(0))).alias(
            "sum_cents"
        ),
    ).where(F.col("n_orders") > 0)


def ivm_join_oracle_sql(orders_applied_sql: str, customer_applied_sql: str) -> str:
    """From-scratch oracle: the view recomputed over the APPLIED snapshots."""
    return f"""
SELECT c.c_nationkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(coalesce(o.o_totalprice, 0.0) * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_cents
FROM ({orders_applied_sql}) o JOIN ({customer_applied_sql}) c
  ON o.o_custkey = c.c_custkey
GROUP BY c.c_nationkey
"""
