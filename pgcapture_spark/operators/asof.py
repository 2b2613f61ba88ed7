"""As-of (temporal point-in-time) join — an operator Spark lacks natively.

The CDC consumer frequently needs "the latest right-side row at or before this
left row's timestamp, per key" (e.g. enrich an event with the most recent
snapshot state the reference's debounce/last-image machinery maintains,
pkg/pgcapture/debounce.go:87-139 keeps exactly this per-key latest row).

Scale design — union + ordered window, NOT an inequality join:
a naive `l JOIN r ON l.key = r.key AND r.ts <= l.ts` explodes to O(|matches|²)
pairs per key before the per-row max is taken (and Spark would plan it as a
BroadcastNestedLoopJoin for the non-equi condition). Instead we tag and UNION
the two sides, then take `last(right_value, ignorenulls) OVER (PARTITION BY key
ORDER BY ts, side)` — ONE shuffle on the key, linear work, no row explosion;
the same pattern holds at 100 TB because the window never materializes pairs.

Right rows sort BEFORE left rows at equal ts (side 0 < 1), giving the standard
`ts_right <= ts_left` as-of semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach `value_cols` of the latest right row with
    `right.ts <= left.ts` (direction='backward'; 'forward' = earliest
    right.ts >= left.ts), matched on key column `on`.

    `right` must be unique per (on, ts) — pre-aggregate if not (determinism).
    Output = all left rows + `asof_<ts>` + requested value columns (null when
    no right row qualifies).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)

    l_cols = left.columns
    tagged_r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.col(ts).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in l_cols if c not in (on, ts)],
    )
    tagged_l = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.lit(None).cast(dict(right.dtypes)[ts]).alias("_r_ts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in value_cols],
        *[F.col(c) for c in l_cols if c not in (on, ts)],
    )
    both = tagged_r.unionByName(tagged_l)

    if direction == "backward":
        # right rows first at equal ts => right.ts == left.ts matches
        w = (
            W.partitionBy(on)
            .orderBy(F.col(ts).asc(), F.col("_side").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        pick: Column = F.last
    else:
        w = (
            W.partitionBy(on)
            .orderBy(F.col(ts).asc(), F.col("_side").desc())
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        pick = F.first

    carried = [pick(F.col("_r_ts"), ignorenulls=True).over(w).alias(f"asof_{ts}")] + [
        pick(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
        for c in value_cols
    ]
    return (
        both.select("*", *carried)
        .where(F.col("_side") == 1)
        .select(*l_cols, f"asof_{ts}", *[f"asof_{c}" for c in value_cols])
    )
