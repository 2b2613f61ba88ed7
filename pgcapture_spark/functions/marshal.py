"""Presence-aware JSON marshaling.

Reference: the client's reflection MarshalJSON (pkg/pgcapture/json.go:22-111)
treats pgtype *Undefined* (unchanged TOAST) as ``omitempty`` — absent columns
are OMITTED from the JSON, explicit SQL NULLs serialize as ``null``.

Built portably with concat_ws (NULL parts vanish) so the Spark output is
byte-identical to the DuckDB oracle; numeric columns are serialized through
DECIMAL casts to pin the text formatting across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pgcapture_spark.operators.apply import present_contains


def _json_part(col: str, rendered: Column) -> Column:
    """One `"col":value` fragment — NULL (→ omitted by concat_ws) when the
    column is absent from the event's present list; literal null when present
    but SQL NULL."""
    value = F.when(F.col(col).isNull(), F.lit("null")).otherwise(rendered)
    return F.when(present_contains(col), F.concat(F.lit(f'"{col}":'), value))


def json_string(col: str) -> Column:
    return F.concat(F.lit('"'), F.col(col), F.lit('"'))


def json_decimal(col: str, prec: int = 12, scale: int = 2) -> Column:
    return F.col(col).cast(f"decimal({prec},{scale})").cast("string")


def json_int(col: str) -> Column:
    return F.col(col).cast("string")


def marshal_events(changes: DataFrame, parts: dict[str, Column]) -> DataFrame:
    """Serialize each event's new image to canonical JSON with omitted-absent
    semantics. ``parts`` maps column name → rendered value expression."""
    fragments = [_json_part(c, rendered) for c, rendered in parts.items()]
    return changes.select(
        "lsn",
        "seq",
        "ord",
        "op",
        F.concat(F.lit("{"), F.concat_ws(",", *fragments), F.lit("}")).alias("payload"),
    )
