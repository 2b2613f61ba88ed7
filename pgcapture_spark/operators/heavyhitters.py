"""Misra-Gries heavy hitters — two-pass EXACT frequent items at 100 TB scale.

The naive ``groupBy(token).count()`` shuffles the entire key space; with a
billion-distinct vocabulary that shuffle IS the job. The mergeable-summary
route (Misra-Gries; cf. the mergeable-summaries literature, PAPERS.md) keeps
per-partition state bounded at ``capacity`` entries:

- **Pass 1 (candidates)**: each partition folds its rows into a Misra-Gries
  summary via ``mapInPandas`` — per Arrow batch one vectorized
  ``value_counts`` (no per-row Python), then a k-bounded merge with the MG
  decrement rule. The summary underestimates a local count by at most
  n_p/(capacity+1), so any token with global count > N/(capacity+1) survives
  with positive weight in at least one partition: the union of candidates is
  a SUPERSET of every true heavy hitter. Candidate volume ≤ partitions ×
  capacity — tiny, broadcastable.
- **Pass 2 (exact recount)**: one more scan counts ONLY candidate rows
  (broadcast semi-join, no full-vocab shuffle) and applies the threshold.
  Because candidates ⊇ true heavy hitters and the recount is exact, the
  output EQUALS the naive global groupBy — verifiable against a plain SQL
  oracle — at a fraction of the shuffle.

Soundness requires ``threshold_frac > 1/(capacity+1)``; the constructor
enforces it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mg_merge(summary: dict, counts: pd.Series, capacity: int) -> dict:
    """Merge exact batch counts into a Misra-Gries summary, keeping at most
    ``capacity`` entries (decrement-by-the-(k+1)-largest rule — the mergeable-
    summaries formulation, error ≤ n/(capacity+1))."""
    for token, c in counts.items():
        summary[token] = summary.get(token, 0) + int(c)
    if len(summary) > capacity:
        d = sorted(summary.values(), reverse=True)[capacity]
        summary = {t: c - d for t, c in summary.items() if c - d > 0}
    return summary


def heavy_hitters(
    rows: DataFrame,
    col: str,
    threshold_frac: float = 0.002,
    capacity: int = 1000,
) -> DataFrame:
    """Exact frequent items of ``rows[col]`` with global frequency ≥
    ``threshold_frac`` of all rows. Output: (``col``, cnt) — identical to
    ``GROUP BY col HAVING count >= threshold_frac * N``.

    NULL contract (explicit, not accidental): NULL values are EXCLUDED —
    from candidates, from the recount, and from N. The filter lives in
    :func:`mg_partition_summaries` (shared with the streamed variant); pass
    2's equality semi-join can never match a NULL key, so the recount side
    needs no second filter. Without the explicit exclusion, pandas
    ``value_counts`` would silently drop NULLs from the sketch while the row
    total still counted them: three half-behaviors. Callers who want NULL as
    a real key must encode it first."""
    if threshold_frac <= 1.0 / (capacity + 1):
        raise ValueError(
            f"threshold_frac {threshold_frac} must exceed 1/(capacity+1)="
            f"{1.0 / (capacity + 1):.2e} for the candidate superset guarantee"
        )
    spark = rows.sparkSession
    # pass 1 is the SAME mergeable-summary fold the streamed variant uses —
    # one implementation of the MG decrement/sentinel scheme to keep in sync.
    # The merged summary's key set is still a superset of every true heavy
    # hitter (merging MG summaries keeps global error ≤ N/(capacity+1), the
    # mergeable-summaries bound), which is all pass 2 needs.
    summary, total = mg_partition_summaries(rows, col, capacity)
    candidates = spark.createDataFrame(
        [(v,) for v in sorted(summary)], f"{col} string"
    )
    return (
        rows.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .count()
        .withColumnRenamed("count", "cnt")
        .where(F.col("cnt") >= threshold(total, threshold_frac))
    )


def threshold(total: int, frac: float) -> Column:
    """The threshold as the same double-precision product both engines
    compute, so boundary comparisons agree bit-for-bit."""
    return F.lit(float(frac)) * F.lit(int(total))


def mg_partition_summaries(
    rows: DataFrame, col: str, capacity: int
) -> tuple[dict, int]:
    """One pass over ``rows``: per-partition Misra-Gries summaries (the same
    bounded fold as :func:`heavy_hitters` pass 1) collected WITH their
    residual weights and merged driver-side into one summary dict. The
    collect is sketch-sized (≤ partitions × capacity rows, never data);
    returns (summary, n_rows). Summaries produced this way are mergeable:
    folding them into an accumulated summary with the same decrement rule
    keeps the global error ≤ N/(capacity+1) (the mergeable-summaries bound),
    so the accumulated key set stays a superset of every true heavy hitter —
    the contract the streamed variant leans on.

    NULLs are excluded from both the summary and the total (see
    :func:`heavy_hitters`'s NULL contract)."""
    rows = rows.where(F.col(col).isNotNull())

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            summary = _mg_merge(summary, pdf[col].value_counts(), capacity)
        yield pd.DataFrame(
            {
                col: list(summary.keys()) + [None],
                "w": list(summary.values()) + [None],
                "_n": [None] * len(summary) + [n],
            }
        )

    sketch = rows.select(col).mapInPandas(
        part, schema=f"{col} string, w long, _n long"
    ).collect()
    total = sum(r["_n"] for r in sketch if r["_n"] is not None)
    merged: dict = {}
    for r in sketch:
        if r[col] is not None:
            merged[r[col]] = merged.get(r[col], 0) + int(r["w"])
    if len(merged) > capacity:
        d = sorted(merged.values(), reverse=True)[capacity]
        merged = {t: c - d for t, c in merged.items() if c - d > 0}
    return merged, total
