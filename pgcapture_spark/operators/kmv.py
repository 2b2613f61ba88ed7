"""K-minimum-values (KMV / bottom-k) distinct sketch — the mergeable
distinct-count summary that, unlike HLL, supports set INTERSECTION and
arbitrary unions by construction: the k smallest hash values of a set are a
uniform sample of its distinct hashes, so the k-th minimum estimates density
((k-1)/F(h_k)) and two sketches merge by taking the k smallest of their
union. Reference scope: the engine's sketch family (SURVEY §2.8) alongside
HLL (`agg_hll_sketch_merge`), Misra-Gries (`agg_heavy_hitters`) and the
mergeable histogram (`agg_hist_quantile_merge`).

Determinism contract: the hash is an explicit integer permutation
``h(u) = (((u mod M + M) mod M) * 2654435761 + 98765) mod (2^31 - 1)``
computed in BIGINT, so Spark and any ANSI-SQL oracle produce bit-identical
sketches — no engine hash functions involved. The input is reduced to the
POSITIVE remainder mod M before the multiply: (M-1) * 2654435761 + 98765
≈ 5.77e18 < 2^63-1, so the arithmetic never overflows BIGINT in either
engine for ANY input (Spark would silently wrap above ~3.47e9 without the
pre-reduction; DuckDB would error), and the double-mod keeps negative
inputs in [0, M) in both engines' C-style ``%`` semantics.

Scale shape (the mergeable-summaries pattern, same as heavyhitters.py):
pass 1 folds each PARTITION into per-group k-smallest lists inside one
Arrow-batched crossing (bounded memory: k values per group per partition);
pass 2 merges the k-bounded summaries with one hash aggregation. The raw
column never shuffles; only sketch rows (≤ partitions × groups × k) move.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KMV_MOD = 2_147_483_647  # 2^31 - 1
KMV_MULT = 2_654_435_761
KMV_ADD = 98_765


def kmv_hash_expr(col: str) -> str:
    """The shared Spark/ANSI hash: BIGINT arithmetic, no engine hash.

    The input is reduced to its positive remainder mod ``KMV_MOD`` FIRST so
    the subsequent multiply stays within BIGINT for all 64-bit inputs (see
    module docstring) and the result is always in [0, KMV_MOD)."""
    r = f"((CAST({col} AS BIGINT) % {KMV_MOD}) + {KMV_MOD}) % {KMV_MOD}"
    return f"(({r}) * {KMV_MULT} + {KMV_ADD}) % {KMV_MOD}"


def kmv_partition_summaries(
    rows: DataFrame, group_col: str, value_col: str, k: int
) -> DataFrame:
    """Pass 1: per-partition, per-group k smallest DISTINCT hash values.
    Output rows (group, hv) — at most k per group per partition.

    NULL contract: NULL VALUES are excluded (a NULL is not a distinct value
    to a COUNT(DISTINCT col) oracle), explicitly and before the hash — a
    NULL hv would otherwise reach the pandas fold as NaN in a float64 column
    and trip the range assertion with a misleading overflow message. NULL
    GROUPS are real groups and are kept."""
    hashed = rows.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"),
        F.expr(kmv_hash_expr(value_col)).alias("hv"),
    )

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # dropna=False: a NULL group key is a real group (the oracle's
        # GROUP BY keeps it); pandas' default would silently drop it.
        mins: dict[object, pd.Series] = {}
        for pdf in batches:
            if not (pdf["hv"] >= 0).all():
                raise ValueError(
                    "kmv hash out of range — permutation must land in [0, MOD)"
                )
            for g, sub in pdf.groupby("g", sort=False, dropna=False):
                key = None if pd.isna(g) else g
                cur = sub["hv"]
                if key in mins:
                    cur = pd.concat([mins[key], cur])
                mins[key] = cur.drop_duplicates().nsmallest(k)
        for g, s in mins.items():
            yield pd.DataFrame({"g": pd.Series([g] * len(s), dtype=object), "hv": s.to_numpy()})

    return hashed.mapInPandas(part, schema="g string, hv long")


def kmv_estimates(
    rows: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct estimate plus the merged-across-groups ('ALL')
    union sketch — demonstrating the merge property: the union's k smallest
    are always contained in the per-group k-smallest lists, so the global
    sketch is computed from the tiny summaries, never the raw data.

    Output: (group, kth_min, est_distinct). When a group holds fewer than k
    distinct values the sketch IS the exact distinct set: kth_min = max of
    the sketch and est_distinct = its size (both engines share this rule).
    """
    return kmv_finalize(
        kmv_partition_summaries(rows, group_col, value_col, k), group_col, k
    )


def kmv_finalize(summaries: DataFrame, group_col: str, k: int) -> DataFrame:
    """Pass 2, shared by the batch estimator and the streamed consumer (so
    the two cannot drift): turn (g, hv) summary rows — each group's k (or
    fewer) smallest distinct hashes, possibly with per-partition duplicates
    — into (group, kth_min, est_distinct) rows plus the 'ALL' union arm.

    The union arm merges the per-group SUMMARIES, never the raw rows:
    any hash among the global k smallest is among its own partition-group's
    k smallest, so the summaries contain it. Fanning each summary row out
    to (g, is_union=false) + (NULL, is_union=true) keeps the whole pass-2 a
    SINGLE scan of the summaries + one hash aggregation (a second
    reference to `summaries` would recompute its lineage). The union
    arm is a separate BOOLEAN grouping key — not a magic string — so a
    real group literally named 'ALL' (or a NULL group) can never merge into
    it; only the output LABEL is shared (documented display convention)."""
    both = (
        summaries.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("g").alias("gk"), F.lit(False).alias("is_union")
                    ),
                    F.struct(
                        F.lit(None).cast("string").alias("gk"),
                        F.lit(True).alias("is_union"),
                    ),
                )
            ).alias("e"),
            "hv",
        )
        .groupBy(F.col("e.gk").alias("gk"), F.col("e.is_union").alias("is_union"))
        .agg(
            F.expr(
                f"slice(array_sort(array_distinct(collect_list(hv))), 1, {k})"
            ).alias("mins")
        )
    )
    n = F.size("mins")
    kth = F.element_at("mins", n).cast("long")
    # integer `div`, never float division: (k-1)*MOD // kth must match the
    # oracle's exact integer quotient bit-for-bit
    est = F.expr(f"CAST({(k - 1) * KMV_MOD} AS BIGINT) div element_at(mins, size(mins))")
    return both.select(
        F.when(F.col("is_union"), F.lit("ALL")).otherwise(F.col("gk")).alias(group_col),
        kth.alias("kth_min"),
        F.when(n < k, n.cast("long")).otherwise(est).alias("est_distinct"),
    )


def kmv_group_sketches(
    rows: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per-group merged KMV sketch as ONE row (group, mins array) — the
    persistable summary the set-operation estimators below consume."""
    return (
        kmv_partition_summaries(rows, group_col, value_col, k)
        .groupBy("g")
        .agg(
            F.expr(
                f"slice(array_sort(array_distinct(collect_list(hv))), 1, {k})"
            ).alias("mins")
        )
        .select(F.col("g").alias(group_col), "mins")
    )


def kmv_intersect_estimate(
    mins_a: list[int], mins_b: list[int], k: int = 64
) -> dict:
    """Set operations from two KMV sketches ALONE — the capability HLL lacks
    by construction (Beyer et al.: the k smallest of A ∪ B are contained in
    sketch(A) ∪ sketch(B), and within that merged sketch, membership in both
    input sketches is an unbiased Bernoulli sample of the intersection
    density). Pure integer driver-side math on two k-bounded lists.

    Returns {union_est, jaccard_milli, intersect_est, k_used}: k_used is the
    merged sketch size actually available (min(k, |union sketch|)); when both
    inputs hold fewer than k values the sketches ARE the sets and every
    number is exact."""
    sa, sb = set(mins_a), set(mins_b)
    merged = sorted(sa | sb)[:k]
    k_used = len(merged)
    if k_used == 0:
        return {"union_est": 0, "jaccard_milli": 0, "intersect_est": 0, "k_used": 0}
    exact = len(mins_a) < k and len(mins_b) < k
    if exact:
        union_est = len(merged)
    else:
        union_est = (k_used - 1) * KMV_MOD // merged[-1]
    n_both = sum(1 for h in merged if h in sa and h in sb)
    jaccard_milli = 1000 * n_both // k_used
    # |A ∩ B| ≈ J(A,B) · |A ∪ B|; exact when the sketches are the sets
    intersect_est = n_both if exact else jaccard_milli * union_est // 1000
    return {
        "union_est": int(union_est),
        "jaccard_milli": int(jaccard_milli),
        "intersect_est": int(intersect_est),
        "k_used": k_used,
    }
