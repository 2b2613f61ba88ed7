"""Point-in-time reads and diffs over LIVE bucketed-state manifests.

The bucketed snapshot state (streaming/state.py) is merge-on-read with
immutable version dirs and a tiny manifest of bucket→version pointers — the
same bones as Delta/Iceberg snapshots. That makes two warehouse operations
nearly free:

- **AS-OF read**: a saved manifest snapshot IS the table as of that commit;
  resolving bucket paths from it (``read_asof``) reads that state without
  any log replay (the reference's consumers would re-apply the feed up to a
  pinned LSN — ``cdc_time_travel``; here the state layer itself answers).
- **snapshot diff**: two manifests differ exactly in the buckets whose
  version pointers differ — buckets sharing a pointer reference the SAME
  immutable files and cannot differ. The diff therefore reads ONLY the
  changed buckets of each side, never the full snapshots: at 100 TB a diff
  between adjacent commits costs the few buckets those commits rewrote
  (the manifest comparison is driver-side over n_buckets entries).

Reference scope: pgcapture keeps every applied state only as the live
downstream table; the version history the engine's state layer accumulates
makes the audit queries (what changed between LSN A and B —
pkg/sink/postgres.go:595-645's sources bookkeeping is the per-commit pin)
answerable from retained manifests alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def changed_buckets(m_a: dict, m_b: dict, n_buckets: int) -> list[int]:
    """Buckets whose version pointers differ between two manifest snapshots —
    the complete support of the diff (equal pointers ⇒ identical immutable
    files). Driver-side over n_buckets dict entries."""
    ba, bb = m_a.get("buckets", {}), m_b.get("buckets", {})
    return [b for b in range(n_buckets) if ba.get(str(b)) != bb.get(str(b))]


def diff_frames(
    a: DataFrame, b: DataFrame, key: str, cols: list[str]
) -> DataFrame:
    """(key, status, changed_cols) rows where two keyed frames differ:
    ADDED (b only), REMOVED (a only), CHANGED (both, any column differs —
    null-safe). Shared by the feed-level cdc_snapshot_diff and the
    manifest-level planner."""
    a, b = a.alias("a"), b.alias("b")
    joined = a.join(b, F.col(f"a.{key}") == F.col(f"b.{key}"), "full_outer")
    changed = F.concat_ws(
        ",",
        *[
            F.when(~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")), F.lit(c))
            for c in cols
        ],
    )
    any_diff = None
    for c in cols:
        d = ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
        any_diff = d if any_diff is None else (any_diff | d)
    status = (
        F.when(F.col(f"a.{key}").isNull(), F.lit("ADDED"))
        .when(F.col(f"b.{key}").isNull(), F.lit("REMOVED"))
        .otherwise(F.lit("CHANGED"))
    )
    return joined.where(
        F.col(f"a.{key}").isNull() | F.col(f"b.{key}").isNull() | any_diff
    ).select(
        F.coalesce(F.col(f"a.{key}"), F.col(f"b.{key}")).alias(key),
        status.alias("status"),
        F.when(
            F.col(f"a.{key}").isNull() | F.col(f"b.{key}").isNull(), F.lit("")
        ).otherwise(changed).alias("changed_cols"),
    )


def snapshot_diff_asof(
    state, m_a: dict, m_b: dict, key: str, cols: list[str]
) -> DataFrame:
    """Diff two retained manifest snapshots of one BucketedSnapshotState,
    reading ONLY the buckets whose pointers differ (see module note). Rows
    in unchanged buckets are byte-identical on both sides by construction —
    they can never appear in the diff, so pruning them is exact."""
    diff_b = changed_buckets(m_a, m_b, state.n_buckets)
    empty = None
    a = state.read_asof(m_a, diff_b) if diff_b else None
    b = state.read_asof(m_b, diff_b) if diff_b else None
    if a is None or b is None:
        # a side with no files in the changed buckets is simply empty there
        schema_src = a if a is not None else b
        if schema_src is None:
            # no changed buckets at all — empty diff with the right schema
            sample = state.read()
            if sample is None:
                # uninitialized (or all-empty) state: there is no schema to
                # shape the empty diff — fail loudly instead of AttributeError
                raise ValueError(
                    "snapshot_diff_asof: state has no readable data to derive "
                    "the diff schema from (uninitialized or every bucket "
                    "empty) — nothing to diff"
                )
            empty = sample.select(key, *cols).limit(0)
            a = b = empty
        else:
            empty = schema_src.select(key, *cols).limit(0)
            a = a if a is not None else empty
            b = b if b is not None else empty
    return diff_frames(a.select(key, *cols), b.select(key, *cols), key, cols)


def changed_buckets_table(
    m_a: dict, m_b: dict, table: str, n_buckets: int
) -> list[int]:
    """Per-table form of ``changed_buckets`` over two CROSS-TABLE manifest
    snapshots (BucketedMultiTableState.manifest_asof): the named table's
    buckets whose version pointers differ."""
    ba = m_a.get("buckets", {}).get(table, {})
    bb = m_b.get("buckets", {}).get(table, {})
    return [b for b in range(n_buckets) if ba.get(str(b)) != bb.get(str(b))]


def snapshot_diff_asof_table(
    state, table: str, m_a: dict, m_b: dict, key: str, cols: list[str]
) -> DataFrame:
    """Diff ONE table of a BucketedMultiTableState between two retained
    cross-table manifests, reading only the buckets whose pointers differ
    (the multi-table form of ``snapshot_diff_asof`` — the pruning argument
    is identical: equal pointers reference the same immutable files). Both
    manifests come from one atomic rename each, so the diff is a
    transactionally consistent audit of what the commits in between did to
    this table."""
    diff_b = changed_buckets_table(m_a, m_b, table, state.n_buckets)
    a = state.read_asof(table, m_a, diff_b) if diff_b else None
    b = state.read_asof(table, m_b, diff_b) if diff_b else None
    if a is None or b is None:
        schema_src = a if a is not None else b
        if schema_src is None:
            sample = state.read_buckets(table, list(range(state.n_buckets)))
            if sample is None:
                raise ValueError(
                    f"snapshot_diff_asof_table: table {table!r} has no "
                    "readable data to derive the diff schema from"
                )
            schema_src = sample
        empty = schema_src.select(key, *cols).limit(0)
        a = a if a is not None else empty
        b = b if b is not None else empty
    return diff_frames(a.select(key, *cols), b.select(key, *cols), key, cols)


def diff_oracle_sql(snap_a_sql: str, snap_b_sql: str, key: str, cols: list[str]) -> str:
    """DuckDB oracle for the ADDED/REMOVED/CHANGED diff contract between two
    keyed snapshot SQLs — shared by the single- and multi-table manifest
    diff queries."""
    changed = ",\n    ".join(
        f"CASE WHEN a.{c} IS DISTINCT FROM b.{c} THEN '{c}' END" for c in cols
    )
    any_diff = " OR ".join(f"a.{c} IS DISTINCT FROM b.{c}" for c in cols)
    return f"""
WITH snap_a AS ({snap_a_sql}), snap_b AS ({snap_b_sql})
SELECT COALESCE(a.{key}, b.{key}) AS {key},
       CASE WHEN a.{key} IS NULL THEN 'ADDED'
            WHEN b.{key} IS NULL THEN 'REMOVED'
            ELSE 'CHANGED' END AS status,
       CASE WHEN a.{key} IS NULL OR b.{key} IS NULL THEN ''
            ELSE concat_ws(',', {changed}) END AS changed_cols
FROM snap_a a FULL OUTER JOIN snap_b b ON a.{key} = b.{key}
WHERE a.{key} IS NULL OR b.{key} IS NULL OR {any_diff}
"""
