"""Skew mitigation: salted joins and two-phase aggregation.

At 100 TB a handful of hot keys (one viral document, one monster customer)
can put an entire shuffle partition on one executor. Two standing remedies:

- **AQE skew-join splitting** (on in session.py) — handles skewed
  sort-merge joins at runtime by splitting oversized partitions. Free, but
  only applies to SMJ and only per-partition.
- **Explicit salting** (this module) — deterministic plan-level spreading
  for the cases AQE doesn't cover: a shuffled join where one key dominates
  (salt the big side, replicate the small side × n_salt), and ordered /
  collect-style aggregations that lack map-side combine.

``salted_join`` trades a ×n_salt blow-up of the SMALL side for an even
spread of the big side's hot keys across n_salt partitions — the classic
replicated-fragment join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted into
    ``n_salt`` sub-keys and the small side replicated once per salt value.
    Row-identical to ``big.join(small, key, how)`` for inner/left joins, but
    a hot key's rows land in n_salt partitions instead of one."""
    salted_big = big.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)))
    salted_small = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(n_salt - 1).cast("long"))),
    )
    return salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")


def two_phase_topk_per_key(
    df: DataFrame, key: str, order_col: str, k: int, n_salt: int = 8
) -> DataFrame:
    """Top-k per key without one partition per hot key: phase 1 takes the
    local top-k within (key, salt) — bounding any partition's work to
    k·n_salt rows per key — phase 2 re-ranks the k·n_salt survivors.
    Result identical to a single window rank (ties broken by ``order_col``
    descending only, so callers should pass a unique ordering column)."""
    from pyspark.sql import Window as W

    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)))
    w1 = W.partitionBy(key, "_salt").orderBy(F.col(order_col).desc())
    survivors = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w2 = W.partitionBy(key).orderBy(F.col(order_col).desc())
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
    )
