"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (CDC apply of the deterministic
customer change feed onto the sf0.001 snapshot). ``queries()`` exposes every
declared operator from SURVEY.md §2; ``oracle_sql()`` the matching DuckDB SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pgcapture_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: replay the scripted customer CDC feed onto the sf0.001
    snapshot (SURVEY §7 P1 minimum slice)."""
    return REGISTRY["cdc_apply_customer"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}
