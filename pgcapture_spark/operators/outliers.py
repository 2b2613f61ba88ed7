"""Grouped-map Pandas operator: per-key robust outlier flagging (median/MAD).

The one aggregate family Catalyst can't express natively in a single pass —
nested medians — done the idiomatic Spark way: ``groupBy(key).applyInPandas``
with an Arrow-batched numpy kernel per group. At 100 TB this is one shuffle on
the key and embarrassingly parallel across groups; group size (events per
user) is what must fit in memory, not the table.

Exactness: values are quantized to integer cents BEFORE the kernel, so the
medians are exact doubles (x or x.5) and the 3×MAD comparison is deterministic
across engines.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUTLIER_SCHEMA = (
    "user_id long, event_id long, value_cents long, med_cents double,"
    " mad_cents double, is_outlier boolean"
)


def mad_outliers(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Flag per-key outliers: |v - median(v)| > 3 * median(|v - median(v)|)."""

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
