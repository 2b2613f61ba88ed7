"""Downstream history/layout operators over the CDC feed and corpus tables.

``scd2_history`` turns the change feed into a slowly-changing-dimension
type-2 version table — the warehouse-side artifact a pgcapture consumer most
often builds from the stream (the reference hands consumers per-event
old/new images precisely so they can maintain this: pb/pgcapture.proto:24-51
Change old/new tuples, pkg/decode/decoder.go:84-118 TOAST inheritance).

``weighted_reservoir`` and ``zorder_layout`` extend the training-data
pipeline surface: exact weight-proportional sampling without replacement and
a multi-dimensional file-layout key for data skipping at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from pgcapture_spark.operators.filters import present_contains


def scd2_history(
    snapshot: DataFrame, changes: DataFrame, key: str, cols: list[str]
) -> DataFrame:
    """SCD type-2 version table from a change feed seeded by the snapshot.

    One output row per non-DELETE event: the EFFECTIVE image at that event
    (explicit NULLs kept, TOAST-absent columns inherited from the running
    image, ultimately the snapshot row), ``valid_from`` = the event's
    commit_ts, ``valid_to`` = the next event's commit_ts for the key (NULL
    while open), ``version`` = 1-based per-key ordinal, ``is_current`` =
    open AND not superseded by a DELETE.

    Scale shape: both windows partition by the key, so Spark plans ONE
    exchange on ``key`` and reuses it; the snapshot join is a plain equi-join
    on the same key (co-partitioned after AQE). No per-row Python, no
    collects — linear in feed size at any scale.
    """
    snap = snapshot.select(key, *[F.col(c).alias(f"_snap_{c}") for c in cols])
    ev = changes.join(snap, on=key, how="left")
    return _scd2_fold(
        ev, key, cols, fallback=lambda c: F.col(f"_snap_{c}"), version_base=F.lit(0)
    )


def _scd2_fold(ev: DataFrame, key: str, cols: list[str], fallback, version_base):
    """Shared SCD2 effective-image fold (used by both the one-shot history
    build and the incremental maintenance step, so the 'incremental ≡ batch'
    convergence contract can't drift): running last(set) image per column
    with ``fallback(c)`` below it, valid_to = lead(commit_ts), DELETE rows
    consumed, version = ``version_base`` + per-key ordinal. All windows share
    one key exchange."""
    img_w = (
        W.partitionBy(key).orderBy("ord").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    lead_w = W.partitionBy(key).orderBy("ord")
    out = ev
    for c in cols:
        set_c = F.when(present_contains(c), F.struct(F.col(c).alias("v")))
        eff = F.last(set_c, ignorenulls=True).over(img_w)
        out = out.withColumn(
            f"_eff_{c}", F.when(eff.isNotNull(), eff["v"]).otherwise(fallback(c))
        )
    out = out.withColumn("_valid_to", F.lead("commit_ts").over(lead_w))
    out = out.where(F.col("op") != "DELETE")
    ver_w = W.partitionBy(key).orderBy("ord")
    return out.select(
        key,
        (version_base + F.row_number().over(ver_w)).cast("long").alias("version"),
        F.col("commit_ts").alias("valid_from"),
        F.col("_valid_to").alias("valid_to"),
        F.col("_valid_to").isNull().alias("is_current"),
        *[F.col(f"_eff_{c}").alias(c) for c in cols],
    )


def scd2_oracle_sql(feed_sql: str, table: str, key: str, cols: list[str]) -> str:
    """DuckDB oracle for ``scd2_history`` — identical window algebra."""
    snap_sel = ", ".join(f"s.{c} AS _snap_{c}" for c in cols)
    set_exprs = ",\n         ".join(
        f"last(CASE WHEN instr(',' || present || ',', ',{c},') > 0 "
        f"THEN {{'v': {c}}} END IGNORE NULLS) "
        f"OVER (PARTITION BY {key} ORDER BY ord "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS set_{c}"
        for c in cols
    )
    finals = ",\n       ".join(
        f"CASE WHEN set_{c} IS NOT NULL THEN (set_{c}).v ELSE _snap_{c} END AS {c}"
        for c in cols
    )
    return f"""
WITH feed AS ({feed_sql}),
ev AS (
  SELECT f.*, {snap_sel}
  FROM feed f LEFT JOIN {table} s USING ({key})
),
img AS (
  SELECT {key}, ord, commit_ts, op,
         {set_exprs},
         lead(commit_ts) OVER (PARTITION BY {key} ORDER BY ord) AS valid_to,
         {", ".join(f"_snap_{c}" for c in cols)}
  FROM ev
)
SELECT {key},
       CAST(row_number() OVER (PARTITION BY {key} ORDER BY ord) AS BIGINT) AS version,
       commit_ts AS valid_from,
       valid_to,
       (valid_to IS NULL) AS is_current,
       {finals}
FROM img
WHERE op <> 'DELETE'
"""


def weighted_reservoir(
    docs: DataFrame,
    weight_col: str,
    group_col: str,
    id_col: str = "doc_id",
    k: int = 50,
    max_weight: int = 8,
) -> DataFrame:
    """Exact weight-proportional sampling WITHOUT replacement, per group.

    Each row holds ``w`` lottery tickets (``w`` = small-integer weight); each
    ticket is an independent deterministic uniform (md5 of ``id:i``); a row's
    priority is its best (minimum) ticket. Ranking rows by priority is
    EXACTLY sequential weighted sampling without replacement: the global
    minimum ticket is uniform over all Σw tickets, so the first pick lands on
    row i with probability w_i/Σw, and so on conditionally — the
    Efraimidis–Spirakis guarantee with integer-only arithmetic (no ln/pow,
    so bit-identical across engines).

    Scale shape: tickets are a per-row ``transform`` + ``array_min`` fused
    into the scan (no explode, no shuffle); selection is two-phase top-k —
    local top-k per (group, salt) bucket, then final top-k per group — so a
    single giant group never funnels the corpus through one partition.

    Weights are clamped to ``[1, max_weight]`` AFTER excluding non-positive
    weights entirely (zero tickets = never sampled). The exclusion matters:
    Spark's ``sequence(0, w-1)`` DESCENDS for w <= 0 (default step -1), which
    would hand a zero-weight row phantom tickets instead of none.
    """
    w_clamped = f"least(CAST({weight_col} AS INT), {int(max_weight)})"
    priority = F.expr(
        f"""array_min(transform(sequence(0, {w_clamped} - 1),
        i -> CAST(conv(substring(md5(concat(CAST({id_col} AS STRING), ':',
                  CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT)))"""
    )
    base = docs.where(F.col(weight_col).cast("int") > 0).select(
        F.col(id_col),
        F.col(group_col),
        F.expr(w_clamped).cast("long").alias("w"),
        priority.alias("priority"),
    )
    salt = F.pmod(F.xxhash64(id_col), F.lit(64))
    local_w = W.partitionBy(group_col, salt).orderBy("priority", id_col)
    pruned = (
        base.withColumn("_lrk", F.row_number().over(local_w))
        .where(F.col("_lrk") <= k)
        .drop("_lrk")
    )
    final_w = W.partitionBy(group_col).orderBy("priority", id_col)
    return (
        pruned.withColumn("rk", F.row_number().over(final_w).cast("long"))
        .where(F.col("rk") <= k)
    )


def reservoir_oracle_sql(
    weight_expr: str,
    group_col: str,
    id_col: str = "doc_id",
    k: int = 50,
    max_weight: int = 8,
) -> str:
    """DuckDB oracle: same tickets (same clamp + w<=0 exclusion),
    single-phase rank (same result set)."""
    w_clamped = f"least(CAST({weight_expr} AS INT), {int(max_weight)})"
    return f"""
WITH base AS (
  SELECT {id_col}, {group_col},
         CAST({w_clamped} AS BIGINT) AS w,
         list_min(list_transform(range({w_clamped}),
           i -> ('0x' || substr(md5(CAST({id_col} AS VARCHAR) || ':' ||
                 CAST(i AS VARCHAR)), 1, 8))::BIGINT)) AS priority
  FROM documents
  WHERE CAST({weight_expr} AS INT) > 0
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY {group_col}
            ORDER BY priority, {id_col}) AS BIGINT) AS rk
  FROM base
)
SELECT {id_col}, {group_col}, w, priority, rk FROM ranked WHERE rk <= {k}
"""


def zorder_bits_sql(b1: str, b2: str, nbits: int = 8) -> str:
    """Portable SQL for the Morton (Z-order) interleave of two ``nbits``-bit
    bucket ids — pure integer arithmetic (floor-div + mod), identical text on
    Spark SQL and DuckDB. ``b1`` owns the odd (high) bit positions."""
    terms = []
    for i in range(nbits):
        terms.append(f"(CAST(floor(({b1}) / {1 << i}) AS BIGINT) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(CAST(floor(({b2}) / {1 << i}) AS BIGINT) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def zorder_layout(
    events: DataFrame, n_shards: int = 32, nbits: int = 8
) -> DataFrame:
    """Z-order file-layout key over (user bucket, time-of-day bucket).

    At 100 TB the win is data skipping: writing shards sorted by the Morton
    code co-locates rows close in BOTH dimensions, so min/max footer stats
    prune scans filtered on either ``user_id`` ranges or time-of-day windows
    (the multi-dimensional clustering Delta/Iceberg OPTIMIZE ZORDER performs).
    Pure per-row integer arithmetic fused into the scan; the only shuffle a
    real writer would add is the final ``repartitionByRange(shard, zval)``.
    """
    b1 = "CAST((user_id % 256 + 256) % 256 AS BIGINT)"  # positive remainder:
    # a negative id under C-style % would emit negative 'bits' and corrupt
    # the Morton code in BOTH engines identically-wrongly
    b2 = "CAST(hour(ts) * 10 + CAST(floor(minute(ts) / 6) AS INT) AS BIGINT)"
    z = zorder_bits_sql(b1, b2, nbits)
    # shard = floor(zval * n_shards / 2^(2 nbits)) — exactly n_shards ids for
    # ANY n_shards (a fixed cell width would emit an n_shards+1'th runt shard
    # whenever 2^(2 nbits) % n_shards != 0)
    zspace = 1 << (2 * nbits)
    return events.select(
        "event_id",
        F.expr(b1).alias("b_user"),
        F.expr(b2).alias("b_time"),
        F.expr(z).cast("long").alias("zval"),
        F.expr(f"CAST(floor(({z}) * {n_shards} / {zspace}) AS BIGINT)").alias("shard"),
    )


def zorder_oracle_sql(n_shards: int = 32, nbits: int = 8) -> str:
    b1 = "CAST((user_id % 256 + 256) % 256 AS BIGINT)"  # positive remainder:
    # a negative id under C-style % would emit negative 'bits' and corrupt
    # the Morton code in BOTH engines identically-wrongly
    b2 = "CAST(hour(ts) * 10 + CAST(floor(minute(ts) / 6) AS INT) AS BIGINT)"
    z = zorder_bits_sql(b1, b2, nbits)
    zspace = 1 << (2 * nbits)
    return f"""
SELECT event_id,
       {b1} AS b_user,
       {b2} AS b_time,
       CAST({z} AS BIGINT) AS zval,
       CAST(floor(CAST(({z}) AS BIGINT) * {n_shards} / {zspace}) AS BIGINT) AS shard
FROM events
"""


def scd2_apply_batch(
    versions: DataFrame | None,
    snapshot: DataFrame,
    batch: DataFrame,
    key: str,
    cols: list[str],
) -> DataFrame:
    """One incremental SCD2 maintenance step: merge a micro-batch of change
    events into the running version table, so that replaying the feed batch
    by batch converges to :func:`scd2_history` of the whole feed (the same
    incremental-equals-batch contract the apply pipeline has).

    Per batch: (1) the latest version row per touched key seeds the
    effective-image fold (TOAST-absent columns inherit from it, else from the
    initial snapshot); (2) the still-open latest version of a touched key is
    CLOSED at the batch's first event commit_ts for that key (the lead() the
    batch algorithm would have seen); (3) new version rows continue the
    per-key version numbering. Untouched keys' rows pass through unchanged.

    Scale shape: one key-hash exchange over the BATCH (windows + joins all
    share it), one equi-join against the version state pruned to touched
    keys, and the state union — O(batch + touched-key versions) per step,
    never a full-state rewrite of untouched keys' content.
    """
    snap = snapshot.select(key, *[F.col(c).alias(f"_snap_{c}") for c in cols])

    if versions is not None:
        last_w = W.partitionBy(key).orderBy(F.col("version").desc())
        prior = (
            versions.withColumn("_rn", F.row_number().over(last_w))
            .where(F.col("_rn") == 1)
            .select(
                key,
                F.col("version").alias("_pv"),
                *[F.col(c).alias(f"_prior_{c}") for c in cols],
            )
        )
    else:
        prior = None

    ev = batch.join(snap, on=key, how="left")
    if prior is not None:
        ev = ev.join(prior, on=key, how="left")
    else:
        ev = ev.withColumn("_pv", F.lit(None).cast("long"))
        for c in cols:
            dt = dict(batch.dtypes)[c]
            ev = ev.withColumn(f"_prior_{c}", F.lit(None).cast(dt))

    new_rows = _scd2_fold(
        ev,
        key,
        cols,
        fallback=lambda c: F.when(
            F.col("_pv").isNotNull(), F.col(f"_prior_{c}")
        ).otherwise(F.col(f"_snap_{c}")),
        version_base=F.coalesce(F.col("_pv"), F.lit(0)),
    )

    if versions is None:
        return new_rows

    # close the open latest version of every touched key at the batch's
    # first event commit_ts (what lead() would have produced in one shot)
    firsts = batch.groupBy(key).agg(
        F.min_by("commit_ts", "ord").alias("_first_ts"),
        F.max(F.lit(1)).alias("_touched"),
    )
    lastv = (
        versions.groupBy(key).agg(F.max("version").alias("_maxv"))
    )
    upd = (
        versions.join(firsts, on=key, how="left")
        .join(lastv, on=key)
        .withColumn(
            "_close",
            (F.col("_touched") == 1)
            & F.col("valid_to").isNull()
            & (F.col("version") == F.col("_maxv")),
        )
        .select(
            key,
            "version",
            "valid_from",
            F.when(F.col("_close"), F.col("_first_ts"))
            .otherwise(F.col("valid_to"))
            .alias("valid_to"),
            (
                F.when(F.col("_close"), F.lit(False)).otherwise(F.col("is_current"))
            ).alias("is_current"),
            *cols,
        )
    )
    return upd.unionByName(new_rows)
