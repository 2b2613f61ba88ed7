"""CDC-downstream history analytics: SCD2 dimension build, point-in-time
time travel, churn stats — the warehouse artifacts a pgcapture consumer
maintains from the stream (the reference ships per-event old/new images for
exactly this: pb/pgcapture.proto:24-51, pkg/decode/decoder.go:84-118) — plus
the weighted-reservoir sample and Z-order layout for the curation pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcapture_spark.catalog import CDC_COLS, register_views
from pgcapture_spark.fixtures.cdc_feed import (
    DUCKDB,
    cdc_customer_sql,
    cdc_lineitem_sql,
    cdc_orders_sql,
)
from pgcapture_spark.operators.apply import apply_oracle_sql, cdc_apply
from pgcapture_spark.operators.history import (
    reservoir_oracle_sql,
    scd2_history,
    scd2_oracle_sql,
    weighted_reservoir,
    zorder_layout,
    zorder_oracle_sql,
)
from pgcapture_spark.queries import _feed, q

# ------------------------------------------------------------------ SCD2


@q(
    "cdc_scd2_history",
    scd2_oracle_sql(cdc_customer_sql(DUCKDB), "customer", "c_custkey", CDC_COLS["customer"]),
    "SCD type-2 dimension from the customer feed: one version row per"
    " non-DELETE event with the running EFFECTIVE image (TOAST inheritance"
    " from the prior version / snapshot, explicit NULLs kept),"
    " valid_from/valid_to interval, is_current — the consumer-side artifact"
    " the reference's old/new images exist to enable (pb/pgcapture.proto:"
    "24-51). One exchange on the key, reused by every window.",
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer",))
    return scd2_history(
        spark.table("customer"),
        _feed(spark, sf_dir, "customer"),
        "c_custkey",
        CDC_COLS["customer"],
    )


# ------------------------------------------------------------ time travel

_PIN_LSN = 2147483648  # 2^31 — mid-keyspace, same pin as cdc_resume_filter


@q(
    "cdc_time_travel",
    apply_oracle_sql(
        f"SELECT * FROM ({cdc_customer_sql(DUCKDB)}) WHERE lsn <= {_PIN_LSN}",
        "customer",
        "c_custkey",
        CDC_COLS["customer"],
    ),
    "Point-in-time snapshot (time travel): the table AS OF a pinned LSN —"
    " the apply fold over only the change prefix lsn <= 2^31"
    " (pkg/sink/postgres.go:207-278 replayed to a cursor, the DBLog"
    " read-your-writes contract). The LSN predicate pushes into the feed"
    " scan before the single key-fold shuffle.",
)
def cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer",))
    feed = _feed(spark, sf_dir, "customer").where(F.col("lsn") <= _PIN_LSN)
    return cdc_apply(spark.table("customer"), feed, "c_custkey", CDC_COLS["customer"])


# ------------------------------------------------------------- churn stats


def _churn_duck(feed_sql: str, table: str, key_expr: str) -> str:
    return f"""
SELECT '{table}' AS table_name, op, CAST(hour(commit_ts) AS INT) AS hr,
       count(*) AS n_events,
       count(DISTINCT {key_expr}) AS n_keys,
       count(DISTINCT lsn) AS n_txs
FROM ({feed_sql}) GROUP BY op, hr
"""


@q(
    "cdc_churn_stats",
    " UNION ALL ".join(
        (
            _churn_duck(cdc_customer_sql(DUCKDB), "customer", "c_custkey"),
            _churn_duck(cdc_orders_sql(DUCKDB), "orders", "o_orderkey"),
            _churn_duck(
                cdc_lineitem_sql(DUCKDB),
                "lineitem",
                "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)",
            ),
        )
    ),
    "Operational churn statistics per (table, op, hour): event count,"
    " distinct keys touched, distinct transactions — the replication"
    " monitoring rollup next to cdc_replication_lag (A9,"
    " pkg/sink/postgres.go:662-675). Three partial-aggregated groupBys,"
    " union of tiny results.",
)
def cdc_churn_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for table, key_expr in (
        ("customer", F.col("c_custkey").cast("string")),
        ("orders", F.col("o_orderkey").cast("string")),
        (
            "lineitem",
            F.concat_ws("|", F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string")),
        ),
    ):
        feed = _feed(spark, sf_dir, table)
        outs.append(
            feed.groupBy(
                F.lit(table).alias("table_name"),
                "op",
                F.hour("commit_ts").cast("int").alias("hr"),
            ).agg(
                F.count("*").alias("n_events"),
                F.countDistinct(key_expr).alias("n_keys"),
                F.countDistinct("lsn").alias("n_txs"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


# --------------------------------------------------------- snapshot diff


def _diff_duck() -> str:
    cols = CDC_COLS["customer"]
    feed = cdc_customer_sql(DUCKDB)
    snap_a = apply_oracle_sql(
        f"SELECT * FROM ({feed}) WHERE lsn <= {_PIN_LSN}",
        "customer", "c_custkey", cols,
    )
    snap_b = apply_oracle_sql(feed, "customer", "c_custkey", cols)
    changed = ",\n    ".join(
        f"CASE WHEN a.{c} IS DISTINCT FROM b.{c} THEN '{c}' END" for c in cols
    )
    any_diff = " OR ".join(f"a.{c} IS DISTINCT FROM b.{c}" for c in cols)
    return f"""
WITH snap_a AS ({snap_a}), snap_b AS ({snap_b})
SELECT COALESCE(a.c_custkey, b.c_custkey) AS c_custkey,
       CASE WHEN a.c_custkey IS NULL THEN 'ADDED'
            WHEN b.c_custkey IS NULL THEN 'REMOVED'
            ELSE 'CHANGED' END AS status,
       CASE WHEN a.c_custkey IS NULL OR b.c_custkey IS NULL THEN ''
            ELSE concat_ws(',', {changed}) END AS changed_cols
FROM snap_a a FULL OUTER JOIN snap_b b ON a.c_custkey = b.c_custkey
WHERE a.c_custkey IS NULL OR b.c_custkey IS NULL OR {any_diff}
"""


@q(
    "cdc_snapshot_diff",
    _diff_duck(),
    "Snapshot diff between two points in time: the table AS OF lsn=2^31 vs"
    " AS OF the full log — per key ADDED / REMOVED / CHANGED with the list"
    " of changed columns (NULL-safe IS DISTINCT FROM). The audit artifact"
    " behind schema-change reviews and replication validation; both sides"
    " share one feed scan, one full-outer join on the key.",
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer",))
    cols = CDC_COLS["customer"]
    feed = _feed(spark, sf_dir, "customer")
    snap = spark.table("customer")
    from pgcapture_spark.operators.timetravel import diff_frames

    a = cdc_apply(snap, feed.where(F.col("lsn") <= _PIN_LSN), "c_custkey", cols)
    b = cdc_apply(snap, feed, "c_custkey", cols)
    return diff_frames(a, b, "c_custkey", cols)


# ------------------------------------------------------ FK consistency


def _fk_duck() -> str:
    cust = apply_oracle_sql(
        cdc_customer_sql(DUCKDB), "customer", "c_custkey", CDC_COLS["customer"]
    )
    ords = apply_oracle_sql(
        cdc_orders_sql(DUCKDB), "orders", "o_orderkey", CDC_COLS["orders"]
    )
    return f"""
WITH cust AS ({cust}), ords AS ({ords})
SELECT o.o_custkey, count(*) AS n_orphan_orders
FROM ords o LEFT JOIN cust c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
GROUP BY o.o_custkey
"""


@q(
    "cdc_fk_consistency",
    _fk_duck(),
    "Cross-table referential-integrity audit AFTER replay: orders whose"
    " o_custkey no longer resolves in the applied customer snapshot"
    " (deleted customers, never-inserted references) — the consistency"
    " check a replica operator runs after cross-table apply"
    " (pkg/sink/postgres.go apply order gives no FK ordering guarantee)."
    " Anti-join on the key, then a tiny grouped count.",
)
def cdc_fk_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    cust = cdc_apply(
        spark.table("customer"),
        _feed(spark, sf_dir, "customer"),
        "c_custkey",
        CDC_COLS["customer"],
    )
    ords = cdc_apply(
        spark.table("orders"),
        _feed(spark, sf_dir, "orders"),
        "o_orderkey",
        CDC_COLS["orders"],
    )
    orphans = ords.join(cust, ords["o_custkey"] == cust["c_custkey"], "left_anti")
    return orphans.groupBy("o_custkey").agg(F.count("*").alias("n_orphan_orders"))


# ------------------------------------------- weighted reservoir + Z-order

_W_EXPR_SPARK = "1 + least(7, CAST(floor(n_chars / 500) AS INT))"
_W_EXPR_DUCK = "1 + least(7, CAST(floor(n_chars / 500) AS INT))"


@q(
    "sample_weighted_reservoir",
    reservoir_oracle_sql(_W_EXPR_DUCK, "lang", "doc_id", 50),
    "North-star: EXACT weight-proportional sampling without replacement per"
    " language (Efraimidis–Spirakis semantics via integer lottery tickets —"
    " min of w deterministic md5 uniforms per doc; first pick lands on doc i"
    " with probability w_i/Σw, exactly). No ln/pow (cross-engine"
    " bit-identical); per-row tickets fused into the scan; two-phase salted"
    " top-k so one giant language never funnels through a single partition.",
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").withColumn("_w", F.expr(_W_EXPR_SPARK))
    return weighted_reservoir(docs, "_w", "lang", "doc_id", k=50)


@q(
    "events_zorder_layout",
    zorder_oracle_sql(),
    "North-star: Z-order (Morton) layout key over (user bucket, time-of-day"
    " bucket) — the multi-dimensional clustering that makes parquet footer"
    " min/max stats prune scans on EITHER dimension at 100 TB (Delta/Iceberg"
    " OPTIMIZE ZORDER). Pure integer bit-interleave fused into the scan;"
    " a writer adds only repartitionByRange(shard, zval).",
)
def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return zorder_layout(spark.table("events"))


# --------------------------------------------- point-in-time (PIT) join


def _pit_duck() -> str:
    scd2 = scd2_oracle_sql(
        cdc_customer_sql(DUCKDB), "customer", "c_custkey", CDC_COLS["customer"]
    )
    return f"""
WITH scd2 AS ({scd2})
SELECT e.event_id, e.user_id, e.ts, e.event_type,
       v.version, v.c_acctbal, v.c_mktsegment,
       v.version IS NOT NULL AS matched
FROM events e LEFT JOIN scd2 v
  ON v.c_custkey = e.user_id AND v.valid_from <= e.ts
 AND (v.valid_to IS NULL OR e.ts < v.valid_to)
"""


@q(
    "events_pit_scd2_join",
    _pit_duck(),
    "Point-in-time (temporal) join: each event joined to the customer SCD2"
    " version VALID AT the event timestamp — the feature-store /"
    " training-label join that prevents feature leakage (the reason the"
    " reference ships per-event old/new images: pb/pgcapture.proto:24-51)."
    " NOT an interval pair join: version rows and events union on the key,"
    " one ordered window carries the last version image onto each event, so"
    " the cost is two key-hash exchanges and zero pair explosion at 100 TB"
    " (same shape as events_asof_join, querydefs/asofq.py).",
)
def events_pit_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    register_views(spark, sf_dir, ("customer", "events"))
    scd2 = scd2_history(
        spark.table("customer"),
        _feed(spark, sf_dir, "customer"),
        "c_custkey",
        CDC_COLS["customer"],
    )
    v = scd2.select(
        F.col("c_custkey").alias("k"),
        F.col("valid_from").alias("t"),
        F.lit(0).alias("kind"),
        F.struct("version", "valid_to", "c_acctbal", "c_mktsegment").alias("img"),
    )
    e = spark.table("events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        "event_id",
        "event_type",
    )
    u = v.unionByName(e, allowMissingColumns=True)
    w = (
        W.partitionBy("k")
        .orderBy("t", "kind", F.col("img.version"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.withColumn("_img", F.last("img", ignorenulls=True).over(w)).where(
        F.col("kind") == 1
    )
    valid = F.col("_img").isNotNull() & (
        F.col("_img.valid_to").isNull() | (F.col("t") < F.col("_img.valid_to"))
    )
    return carried.select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t").alias("ts"),
        "event_type",
        F.when(valid, F.col("_img.version")).alias("version"),
        F.when(valid, F.col("_img.c_acctbal")).alias("c_acctbal"),
        F.when(valid, F.col("_img.c_mktsegment")).alias("c_mktsegment"),
        valid.alias("matched"),
    )


# ----------------------------------------- multi-source LWW conflict merge

# Two replication sources feeding ONE logical table (the active-active /
# multi-region scenario the single-origin reference leaves to the consumer).
# Region 0 is the fixture feed; region 1 is a second-writer stream derived
# from it — one UPDATE per updated key, clock-skewed +1 h (even lsn) or
# -1 h (odd lsn) with a bumped c_acctbal — so wall-clock LWW genuinely
# resolves BOTH ways: region 1 wins where its clock ran ahead, region 0
# where it lagged. Events re-order under the LWW total order
# (commit_ts, region, seq) and the standard idempotent fold applies the
# winning sequence.

_LWW_ORD_DUCK = "CAST((epoch_us(commit_ts) * 2 + region) * 100 + seq AS BIGINT)"
_LWW_ORD_SPARK = "CAST((unix_micros(commit_ts) * 2 + region) * 100 + seq AS BIGINT)"

_LWW_SKEW = (
    "CASE WHEN lsn % 2 = 0 THEN commit_ts + INTERVAL 1 HOUR"
    " ELSE commit_ts - INTERVAL 1 HOUR END"
)


def _lww_region_b(feed_sql: str, str_t: str, int_t: str) -> str:
    return f"""
SELECT lsn, 1 AS seq, ord, {_LWW_SKEW} AS commit_ts, 'UPDATE' AS op, c_custkey,
       CAST(NULL AS {str_t}) AS c_name, CAST(NULL AS {int_t}) AS c_nationkey,
       c_acctbal + 1000.0 AS c_acctbal, CAST(NULL AS {str_t}) AS c_mktsegment,
       CAST(NULL AS BIGINT) AS old_c_custkey, 'c_custkey,c_acctbal' AS present
FROM ({feed_sql}) WHERE op = 'UPDATE' AND seq = 1
"""


_LWW_COLS = (
    "lsn, seq, ord, commit_ts, op, c_custkey, c_name, c_nationkey,"
    " c_acctbal, c_mktsegment, old_c_custkey, present"
)


def _lww_duck() -> str:
    feed = cdc_customer_sql(DUCKDB)
    b = _lww_region_b(feed, "VARCHAR", "INTEGER")
    combined = (
        f"SELECT {_LWW_COLS}, 0 AS region FROM ({feed})"
        f" UNION ALL SELECT {_LWW_COLS}, 1 AS region FROM ({b})"
    )
    mod_feed = f"SELECT * REPLACE ({_LWW_ORD_DUCK} AS ord) FROM ({combined})"
    applied = apply_oracle_sql(mod_feed, "customer", "c_custkey", CDC_COLS["customer"])
    return f"""
WITH applied AS ({applied}),
f AS (SELECT c_custkey, CAST(region AS BIGINT) AS region, {_LWW_ORD_DUCK} AS ord
      FROM ({combined})),
conf AS (SELECT c_custkey, CAST(arg_max(region, ord) AS BIGINT) AS winning_region
         FROM f GROUP BY c_custkey HAVING count(DISTINCT region) = 2)
SELECT a.*, c.winning_region FROM applied a JOIN conf c USING (c_custkey)
"""


@q(
    "cdc_multi_source_lww",
    _lww_duck(),
    "Multi-source last-writer-wins merge: the feed plus a clock-skewed"
    " second-writer stream (region 1: one bumped-acctbal UPDATE per updated"
    " key, ±1 h skew by lsn parity) re-ordered by the LWW key"
    " (commit_ts, region, seq) and folded with the same idempotent apply —"
    " the conflict-resolution contract an active-active consumer layers on"
    " top of per-origin ordering (the reference guarantees order per origin"
    " only; pkg/source/postgres.go:224-231). Output: the merged image of"
    " every key BOTH regions wrote, with the winning region — wins split"
    " both ways by construction. One re-stamped ord expression, the shared"
    " one-shuffle fold, a tiny conflict-key join.",
)
def cdc_multi_source_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer",))
    a = _feed(spark, sf_dir, "customer")
    b = a.where("op = 'UPDATE' AND seq = 1").select(
        "lsn",
        F.lit(1).alias("seq"),
        "ord",
        F.expr(_LWW_SKEW).alias("commit_ts"),
        F.lit("UPDATE").alias("op"),
        "c_custkey",
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("int").alias("c_nationkey"),
        (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit(None).cast("bigint").alias("old_c_custkey"),
        F.lit("c_custkey,c_acctbal").alias("present"),
    )
    cols = [c.strip() for c in _LWW_COLS.split(",")]
    combined = (
        a.select(*cols).withColumn("region", F.lit(0))
        .unionByName(b.select(*cols).withColumn("region", F.lit(1)))
        .withColumn("ord", F.expr(_LWW_ORD_SPARK))
    )
    merged = cdc_apply(
        spark.table("customer"), combined, "c_custkey", CDC_COLS["customer"]
    )
    conf = (
        combined.groupBy("c_custkey")
        .agg(
            F.expr("CAST(max_by(region, ord) AS BIGINT)").alias("winning_region"),
            F.countDistinct("region").alias("_nr"),
        )
        .where(F.col("_nr") == 2)
        .drop("_nr")
    )
    return merged.join(conf, on="c_custkey")
