"""Sequence packing and deterministic sampling for training-data pipelines
(north-star additions).

- ``packed_batches``: assign documents (in a stable global order) to
  token-budget batches — the planning step before sequence packing writes
  concatenated training examples. batch_id = which budget-block the doc's
  START offset falls in, i.e. greedy streaming fill that never reorders docs.
- ``stratified_sample``: per-stratum downsampling that is DETERMINISTIC and
  engine-independent — the keep decision is a pure function of the row key
  (md5-derived uniform hash), so the same rows are kept on any cluster, any
  partitioning, any engine. This is what reproducible pipeline reruns need;
  rng-based sample()/sampleBy() cannot give it.

Scale note on the cumulative sum: a naive ``Window.orderBy(doc_id)`` drags the
whole corpus through ONE task. ``packed_batches`` instead does the two-phase
prefix sum: range-partition by the order key, cumsum WITHIN each partition
(parallel window), then add each partition's broadcast prefix offset — the
classic distributed scan; wall-clock is one parallel window + one tiny agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def packed_batches(
    docs_with_tokens: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_ranges: int = 32,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, n_tokens, start_offset, batch_id): docs in ``order_col`` order
    are laid end-to-end; batch_id = start_offset div budget. ``extra_cols``
    ride through the prefix scan (no join-back needed to recover them)."""
    ranged = docs_with_tokens.repartitionByRange(n_ranges, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_in = (
        W.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = ranged.withColumn("_local_end", F.sum(tokens_col).over(w_in))
    # per-partition totals -> running prefix before each partition (tiny: one
    # row per range partition, broadcast back onto the data)
    totals = (
        local.groupBy("_pid")
        .agg(F.max("_local_end").alias("_ptotal"))
        .withColumn(
            "_prefix",
            F.coalesce(
                F.sum("_ptotal").over(
                    W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_prefix")
    )
    return (
        local.join(F.broadcast(totals), "_pid")
        .withColumn("start_offset", F.col("_prefix") + F.col("_local_end") - F.col(tokens_col))
        # integer div, not floor(double /): offsets are exact BIGINTs and a
        # double round-trip loses exactness past 2^53 total tokens
        .withColumn("batch_id", F.expr(f"start_offset div {int(budget)}"))
        .select(order_col, tokens_col, *extra_cols, "start_offset", "batch_id")
    )


def keep_hash_expr(key_col: str, salt: str = "strat") -> str:
    """Uniform [0,100) bucket from md5 of (salt|key) — identical SQL exists in
    every engine, so the sample is bit-reproducible anywhere."""
    return (
        f"CAST(conv(substring(md5(concat('{salt}|', CAST({key_col} AS STRING))), 1, 8), 16, 10)"
        " AS BIGINT) % 100"
    )


def stratified_sample(
    df: DataFrame, stratum_col: str, key_col: str, rates_pct: dict[str, int]
) -> DataFrame:
    """Keep ~rates_pct[stratum]% of each stratum, decided per-row by the key
    hash (no rng, no state): row kept iff hash_bucket < rate. Strata missing
    from ``rates_pct`` are dropped (rate 0)."""
    bucket = F.expr(keep_hash_expr(key_col))
    rate = None
    for stratum, pct in sorted(rates_pct.items()):
        clause = F.when(F.col(stratum_col) == stratum, F.lit(pct))
        rate = clause if rate is None else rate.when(F.col(stratum_col) == stratum, F.lit(pct))
    rate = rate.otherwise(F.lit(0)) if rate is not None else F.lit(0)
    return df.where(bucket < rate)
