"""Round-8 registry wave: point-in-time operations over the LIVE bucketed
state's own version history (AS-OF read + pointer-pruned snapshot diff — the
manifest layer doubles as a Delta/Iceberg-style time-travel catalog), the
consumer-side debounce flush rules as an exact batch oracle (C2's full
semantics incl. the lsn=0 dump-event precedence, pkg/pgcapture/debounce.go:
87-155), and the per-source WINDOWED drift monitor (the time-bucketed
extension of corpus_drift_psi).

Determinism contract as everywhere: integer ord/checkpoint encodings,
percentile_disc segment boundaries both engines can name, nano-quantized PSI
terms.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcapture_spark.catalog import CDC_COLS, register_views
from pgcapture_spark.fixtures.cdc_feed import DUCKDB, cdc_customer_sql, cdc_orders_sql
from pgcapture_spark.operators.apply import apply_oracle_sql
from pgcapture_spark.queries import _feed, q

_CUST_COLS = CDC_COLS["customer"]


# -------------------------------------------------- manifest time travel

def _ttm_feed_dir(spark: SparkSession, sf_dir: str) -> str:
    """The customer feed split at EXACT ord quartiles as a 4-segment log —
    fixture INPUT shared by every retained-apply query (one synthesis per
    (kind, sf_dir) per process, the sources/feed.py input-edge contract;
    previously each invocation re-synthesized the feed and recomputed it
    once per piece write)."""
    from pgcapture_spark.sources.feed import cached_fixture_pieces, ord_quartile_bounds

    register_views(spark, sf_dir, ("customer",))

    def _build():
        feed = _feed(spark, sf_dir, "customer").persist()
        bounds = ord_quartile_bounds(feed)
        pieces, lo = [], -1
        for hi in bounds:
            pieces.append(feed.where((F.col("ord") > lo) & (F.col("ord") <= hi)))
            lo = hi
        return pieces, feed.unpersist

    return cached_fixture_pieces(spark, sf_dir, "ttmanifest_quart", _build)


def _run_retained_apply(spark: SparkSession, sf_dir: str, retain: bool | int = True):
    """Shared fixture for the manifest queries: apply the customer feed in 4
    micro-batches split at EXACT ord quartiles (percentile_disc — DuckDB can
    name the same boundaries) onto a retain_versions BucketedSnapshotState,
    capturing a manifest snapshot after every commit. ``retain`` is the
    retention mode (True = keep all, int N = the bounded window — r9wave's
    retention queries). Returns (state, manifests dict batch_id → manifest).
    The 4-batch fold (the consumption under test) runs per invocation; only
    the segment log is cached input (``_ttm_feed_dir``)."""
    import tempfile

    from pgcapture_spark.sources.feed import read_feed_stream
    from pgcapture_spark.streaming.pipeline import apply_stream
    from pgcapture_spark.streaming.state import BucketedSnapshotState

    feed_dir = _ttm_feed_dir(spark, sf_dir)
    base = spark.table("customer")
    d = tempfile.mkdtemp(prefix="pgcs_q_ttmanifest_")
    schema = spark.read.parquet(feed_dir).schema
    state = BucketedSnapshotState(
        spark, f"{d}/state", "c_custkey", n_buckets=16, retain_versions=retain
    )
    manifests: dict[int, dict] = {}

    def _capture(batch_id: int, _n: int) -> None:
        manifests[batch_id] = state.manifest_snapshot()

    query = apply_stream(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
        state,
        base,
        "c_custkey",
        _CUST_COLS,
        f"{d}/ckpt",
        on_batch=_capture,
    )
    query.awaitTermination(300)
    return state, manifests


# one converged retain-all run per (process, sf_dir) — the three read-only
# manifest queries (as-of read, pointer-pruned diff, rebucket-into-fresh-root)
# share the same state; parquet-backed, never Spark cache. The bench's payer
# (cdc_time_travel_manifest) resets this cache per timed pass so the 4-batch
# fold cost never vanishes from the totals (bench.py _CACHED_RUN_RESETS).
_TTM_DIRS: dict[str, str] = {}


def _retained_manifest_state(spark: SparkSession, sf_dir: str):
    import tempfile

    from pgcapture_spark.sources.feed import read_feed_stream
    from pgcapture_spark.streaming.pipeline import apply_stream
    from pgcapture_spark.streaming.state import BucketedSnapshotState

    feed_dir = _ttm_feed_dir(spark, sf_dir)
    key = os.path.abspath(sf_dir)
    d = _TTM_DIRS.get(key)
    if d is None or not os.path.isdir(f"{d}/state"):
        d = tempfile.mkdtemp(prefix="pgcs_q_ttmshared_")
        schema = spark.read.parquet(feed_dir).schema
        state = BucketedSnapshotState(
            spark, f"{d}/state", "c_custkey", n_buckets=16, retain_versions=True
        )
        query = apply_stream(
            read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=1),
            state,
            spark.table("customer"),
            "c_custkey",
            _CUST_COLS,
            f"{d}/ckpt",
        )
        query.awaitTermination(300)
        _TTM_DIRS[key] = d
    return BucketedSnapshotState(
        spark, f"{d}/state", "c_custkey", n_buckets=16, retain_versions=True
    )


def _asof_feed_sql() -> str:
    """The DuckDB rendering of 'everything the first two micro-batches
    carried': feed rows at or below the ord MEDIAN (batch 0 = ≤ q1,
    batch 1 = ≤ q2 — the same percentile_disc boundaries the Spark side
    split segments at)."""
    feed = cdc_customer_sql(DUCKDB)
    return (
        f"SELECT * FROM ({feed}) WHERE ord <= ("
        f"SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY ord) FROM ({feed}))"
    )


@q(
    "cdc_time_travel_manifest",
    apply_oracle_sql(_asof_feed_sql(), "customer", "c_custkey", _CUST_COLS),
    "AS-OF read over the LIVE bucketed state's own version history: a saved"
    " manifest snapshot maps every bucket to the version dir current at that"
    " commit, so the table AS OF micro-batch 1 is ONE manifest-resolved read"
    " — no feed replay (cdc_time_travel re-applies the log to a pinned LSN;"
    " this answers from the state layer alone, the Delta/Iceberg time-travel"
    " shape). retain_versions is the retention window that keeps superseded"
    " version dirs resolvable.",
)
def cdc_time_travel_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # manifest_asof(1) resolves the identical pointer map the on_batch capture
    # used to record (retain-all history keeps every superseded manifest), so
    # the three read-only manifest queries can share one converged run
    state = _retained_manifest_state(spark, sf_dir)
    return state.read_asof(state.manifest_asof(1)).select("c_custkey", *_CUST_COLS)


def _diff_manifest_duck() -> str:
    feed = cdc_customer_sql(DUCKDB)
    snap_a = apply_oracle_sql(_asof_feed_sql(), "customer", "c_custkey", _CUST_COLS)
    snap_b = apply_oracle_sql(feed, "customer", "c_custkey", _CUST_COLS)
    changed = ",\n    ".join(
        f"CASE WHEN a.{c} IS DISTINCT FROM b.{c} THEN '{c}' END" for c in _CUST_COLS
    )
    any_diff = " OR ".join(f"a.{c} IS DISTINCT FROM b.{c}" for c in _CUST_COLS)
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
    "cdc_snapshot_diff_manifest",
    _diff_manifest_duck(),
    "Snapshot-diff planner over LIVE bucketed-state manifests: two retained"
    " manifest snapshots differ exactly in the buckets whose version"
    " pointers differ (equal pointers reference the same immutable files),"
    " so the ADDED/REMOVED/CHANGED audit reads ONLY those buckets from each"
    " side — at 100 TB a diff between adjacent commits costs the few buckets"
    " they rewrote, with the pruning decided driver-side from two tiny"
    " manifests (operators/timetravel.py). Same output contract as the"
    " feed-replay cdc_snapshot_diff.",
)
def cdc_snapshot_diff_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.timetravel import snapshot_diff_asof

    state = _retained_manifest_state(spark, sf_dir)
    return snapshot_diff_asof(
        state, state.manifest_asof(1), state.manifest_snapshot(), "c_custkey",
        _CUST_COLS,
    )


# -------------------------------------------------- bucket-layout migration


@q(
    "state_rebucket_migrate",
    apply_oracle_sql(cdc_customer_sql(DUCKDB), "customer", "c_custkey", _CUST_COLS),
    "EXECUTE the layout migration state_bucket_skew_plan only plans: a live"
    " bucketed state built by the streamed apply (16 key-buckets) is"
    " rewritten under a different bucket count (8) — one full read + one"
    " bucket-clustered write into a fresh root, the source untouched during"
    " the copy and the replay gate carried over so the stream resumes where"
    " the old layout stopped (the OPTIMIZE/ZORDER-execution analog for the"
    " state layer; at 100 TB this is the planned-downtime-free answer to"
    " bucket skew or growth). Oracle: the migrated state must equal the"
    " batch apply of the whole feed — migration changes layout, never"
    " content.",
)
def state_rebucket_migrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = _retained_manifest_state(spark, sf_dir)
    # rebucket writes a FRESH root next to the shared state (the source is
    # untouched — the migration contract); re-runs overwrite idempotently
    migrated = state.rebucket(state.root + "_rb8", new_n_buckets=8)
    if migrated.last_batch() != state.last_batch():  # replay gate carried
        raise AssertionError(
            f"rebucket lost the replay gate: {migrated.last_batch()} != "
            f"{state.last_batch()}"
        )
    return migrated.read().select("c_custkey", *_CUST_COLS)


# ----------------------------------------- consumer-maintained secondary index

_ORDERS_APPLIED = apply_oracle_sql(
    cdc_orders_sql(DUCKDB), "orders", "o_orderkey", CDC_COLS["orders"]
)


@q(
    "cdc_secondary_index_view",
    f"SELECT o_orderkey, o_custkey, o_totalprice FROM ({_ORDERS_APPLIED})",
    "The consumer-maintained SECONDARY INDEX as its own verified artifact:"
    " ivm_join_stream's orders_ck state table — the (o_orderkey, o_custkey,"
    " o_totalprice) projection bucketed by o_custkey, advanced per trigger"
    " by the same signed delta as the primary snapshot (its touched buckets"
    " named by the delta's ± custkey images, so an o_custkey UPDATE moves"
    " the row between buckets). This is the reference's"
    " consumer-maintaining-its-own-index pattern"
    " (pkg/pgcapture/consumer.go:86-142) made first-class: the index table"
    " itself must equal the applied base table's projection — previously"
    " only implied through the join view it serves.",
)
def cdc_secondary_index_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pgcapture_spark.fixtures.cdc_feed import SPARK, multi_feed_sql
    from pgcapture_spark.sources.feed import cached_fixture_segments, read_feed_stream
    from pgcapture_spark.streaming.multi import BucketedMultiTableState
    from pgcapture_spark.streaming.mv import ivm_join_stream

    register_views(spark, sf_dir, ("customer", "orders"))
    d = tempfile.mkdtemp(prefix="pgcs_q_secidx_")
    feed_dir = cached_fixture_segments(
        spark, sf_dir, "ivm_multi",
        lambda: spark.sql(multi_feed_sql(SPARK)), n_segments=5,
    )
    schema = spark.read.parquet(feed_dir).schema
    state = BucketedMultiTableState(
        spark,
        f"{d}/state",
        ["orders", "customer", "orders_ck", "mv"],
        {
            "orders": "o_orderkey",
            "customer": "c_custkey",
            "orders_ck": "o_custkey",
            "mv": "c_nationkey",
        },
        n_buckets=16,
    )
    query = ivm_join_stream(
        read_feed_stream(spark, feed_dir, schema, max_files_per_trigger=3),
        state,
        spark.table("orders"),
        spark.table("customer"),
        CDC_COLS["orders"],
        CDC_COLS["customer"],
        f"{d}/ckpt",
    )
    query.awaitTermination(300)
    return state.read()["orders_ck"].select("o_orderkey", "o_custkey", "o_totalprice")


def _assert_ck_unique(base: DataFrame) -> None:
    """ck-encoding collision guard (ADVICE r8): the closed-form survivor's
    strict ``later_max < ck`` omits the reference's equal-checkpoint branch
    (debounce.go: Checkpoint.Equal → handle(prev) then store — BOTH deliver),
    which is equivalent to the sequential fold only while checkpoint
    encodings never collide. Dump cks (= id) and non-dump cks (= 1e8 +
    id·100) first collide at event_id ≥ 1e8 — fail loudly before a larger
    events fixture could silently break oracle fidelity."""
    mx = base.agg(F.max("id").alias("m")).first()["m"]
    if not (mx is None or mx < 100_000_000):
        # explicit raise, not assert: this contract guard must survive
        # ``python -O`` (ADVICE r9 — assert is stripped under optimized mode)
        raise ValueError(
            f"debounce ck encoding collides at event_id >= 1e8 (max id {mx});"
            " the closed form would diverge from the reference's"
            " equal-checkpoint branch (deliver both) there"
        )


# -------------------------------------------------- debounce flush rules

_DEBOUNCE_DUCK = """
WITH base AS (
  SELECT event_id AS id, user_id AS k FROM events
  WHERE event_id IS NOT NULL AND user_id IS NOT NULL
),
e AS (
  SELECT id, k, id % 11 = 3 AS is_dump,
         CASE WHEN id % 11 = 3 THEN 'UPDATE'
              WHEN id % 5 = 0 THEN 'INSERT'
              WHEN id % 5 = 1 THEN 'DELETE'
              ELSE 'UPDATE' END AS op,
         CASE WHEN id % 11 = 3 THEN id ELSE 100000000 + id * 100 END AS ck
  FROM base
),
arr AS (
  -- pseudo arrival TIME (not a dense rank — no global sort at any scale):
  -- a fixed permutation-ish hash of the checkpoint order; ties break by id
  SELECT *, (id * 48271) % 2147483647 AS at FROM e
),
win AS (SELECT *, CAST(floor(at / 268435456.0) AS BIGINT) AS iv FROM arr),
segd AS (
  SELECT *, count(*) FILTER (WHERE op IN ('INSERT', 'DELETE')) OVER (
      PARTITION BY k, iv ORDER BY at, id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seg
  FROM win
),
sfx AS (
  SELECT *,
         max(CASE WHEN is_dump THEN 1 ELSE 0 END) OVER wl AS later_dump,
         max(ck) OVER wl AS later_max
  FROM segd WHERE op = 'UPDATE'
  WINDOW wl AS (PARTITION BY k, iv, seg ORDER BY at, id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
),
surv AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY k, iv, seg ORDER BY at, id) AS rn
    FROM sfx
    WHERE coalesce(later_dump, 0) = 0 AND (later_max IS NULL OR later_max < ck)
  ) WHERE rn = 1
)
SELECT k AS user_id, iv AS interval_id, CAST(seg AS BIGINT) AS segment_id,
       id AS event_id, op, is_dump, 'debounced' AS kind
FROM surv
UNION ALL
SELECT k, iv, CAST(seg AS BIGINT), id, op, is_dump, 'direct'
FROM segd WHERE op IN ('INSERT', 'DELETE')
"""


@q(
    "cdc_debounce_flush_rules",
    _DEBOUNCE_DUCK,
    "C2's EXACT flush rules as a batch oracle (pkg/pgcapture/debounce.go:"
    " 87-155), on a requeue-REORDERED arrival stream — the condition the"
    " rules exist for: INSERT/DELETE flush the key's buffered UPDATE then"
    " deliver immediately (segment boundaries); within a segment the stored"
    " survivor follows the sequential replace-if-newer fold where an"
    " arriving lsn=0 dump ALWAYS counts as latest and an arriving older"
    " event is dropped. The fold's survivor is closed-form: the earliest"
    " arrival all of whose successors are non-dump and checkpoint-older —"
    " two suffix-frame window aggregates, no per-row state. Delivered ="
    " direct I/D events + per-(key, interval, segment) survivors.",
)
def cdc_debounce_flush_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    register_views(spark, sf_dir, ("events",))
    base = (
        spark.table("events")
        .where(F.col("event_id").isNotNull() & F.col("user_id").isNotNull())
        .select(F.col("event_id").alias("id"), F.col("user_id").alias("k"))
    )
    _assert_ck_unique(base)
    e = base.select(
        "id",
        "k",
        (F.col("id") % 11 == 3).alias("is_dump"),
        F.when(F.col("id") % 11 == 3, F.lit("UPDATE"))
        .when(F.col("id") % 5 == 0, F.lit("INSERT"))
        .when(F.col("id") % 5 == 1, F.lit("DELETE"))
        .otherwise(F.lit("UPDATE"))
        .alias("op"),
        F.when(F.col("id") % 11 == 3, F.col("id"))
        .otherwise(F.lit(100000000) + F.col("id") * 100)
        .alias("ck"),
    )
    # deterministic requeue shuffle: pseudo arrival TIME is a fixed hash of
    # the checkpoint order (the gateway redelivers out of order; the
    # debounce rules exist to keep the newest image winning anyway). A time
    # value, NOT a dense global rank — intervals are slices of the pseudo
    # clock, so no single-partition global sort exists at any scale; every
    # window below partitions by (key, interval).
    arr = e.withColumn("at", (F.col("id") * 48271) % 2147483647).withColumn(
        "iv", F.floor(F.col("at") / 268435456.0).cast("long")
    )
    # segment = number of PRIOR direct (I/D) flush points for this key+interval
    w_seg = (
        W.partitionBy("k", "iv")
        .orderBy("at", "id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    segd = arr.withColumn(
        "seg",
        F.count(F.when(F.col("op").isin("INSERT", "DELETE"), 1)).over(w_seg),
    )
    upd = segd.where(F.col("op") == "UPDATE")
    w_later = (
        W.partitionBy("k", "iv", "seg")
        .orderBy("at", "id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    sfx = upd.withColumn(
        "later_dump", F.max(F.when(F.col("is_dump"), 1).otherwise(0)).over(w_later)
    ).withColumn("later_max", F.max("ck").over(w_later))
    ok = sfx.where(
        (F.coalesce(F.col("later_dump"), F.lit(0)) == 0)
        & (F.col("later_max").isNull() | (F.col("later_max") < F.col("ck")))
    )
    w_first = W.partitionBy("k", "iv", "seg").orderBy("at", "id")
    surv = ok.withColumn("rn", F.row_number().over(w_first)).where("rn = 1")
    out_cols = [
        F.col("k").alias("user_id"),
        F.col("iv").alias("interval_id"),
        F.col("seg").cast("long").alias("segment_id"),
        F.col("id").alias("event_id"),
        "op",
        "is_dump",
    ]
    return surv.select(*out_cols, F.lit("debounced").alias("kind")).unionByName(
        segd.where(F.col("op").isin("INSERT", "DELETE")).select(
            *out_cols, F.lit("direct").alias("kind")
        )
    )


# ------------------------------------------- debounce key-change flush path

_DEBOUNCE_KC_DUCK = """
WITH base AS (
  SELECT event_id AS id, user_id % 40 AS k, (user_id + event_id) % 40 AS alt
  FROM events WHERE event_id IS NOT NULL AND user_id IS NOT NULL
),
e AS (
  SELECT id, k, id % 11 = 3 AS is_dump,
         CASE WHEN id % 11 = 3 THEN 'UPDATE'
              WHEN id % 5 = 0 THEN 'INSERT'
              WHEN id % 5 = 1 THEN 'DELETE'
              ELSE 'UPDATE' END AS op,
         id % 11 <> 3 AND id % 5 NOT IN (0, 1) AND id % 7 = 2 AS has_old,
         CASE WHEN id % 11 <> 3 AND id % 5 NOT IN (0, 1) AND id % 7 = 2
              THEN alt END AS old_k,
         CASE WHEN id % 11 = 3 THEN id ELSE 100000000 + id * 100 END AS ck,
         (id * 48271) % 2147483647 AS at
  FROM base
),
win AS (SELECT *, CAST(floor(at / 268435456.0) AS BIGINT) AS iv FROM e),
-- boundary rows: I/D events on their own key, plus every UPDATE carrying an
-- old image on the OLD key (the Handle() old-image flush) — b=1 sorts a
-- boundary AFTER its own event row at the same (at, id)
stream AS (
  SELECT k AS bk, iv, at, id, 0 AS b, op, is_dump, has_old, old_k, ck FROM win
  UNION ALL
  SELECT old_k, iv, at, id, 1, NULL, NULL, NULL, NULL, NULL
  FROM win WHERE has_old
  UNION ALL
  SELECT k, iv, at, id, 1, NULL, NULL, NULL, NULL, NULL
  FROM win WHERE op IN ('INSERT', 'DELETE')
),
segd AS (
  SELECT *, CAST(coalesce(sum(b) OVER (
      PARTITION BY bk, iv ORDER BY at, id, b
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      + CASE WHEN b = 0 AND coalesce(has_old, false) AND old_k = bk
             THEN 1 ELSE 0 END AS BIGINT) AS seg
  FROM stream
),
upd AS (SELECT * FROM segd WHERE b = 0 AND op = 'UPDATE'),
sfx AS (
  SELECT *,
         max(CASE WHEN is_dump THEN 1 ELSE 0 END) OVER wl AS later_dump,
         max(ck) OVER wl AS later_max
  FROM upd
  WINDOW wl AS (PARTITION BY bk, iv, seg ORDER BY at, id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
),
surv AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY bk, iv, seg ORDER BY at, id) AS rn
    FROM sfx
    WHERE coalesce(later_dump, 0) = 0 AND (later_max IS NULL OR later_max < ck)
  ) WHERE rn = 1
)
SELECT bk AS user_key, iv AS interval_id, id AS event_id, op, is_dump,
       'debounced' AS kind
FROM surv
UNION ALL
SELECT bk, iv, id, op, is_dump, 'direct'
FROM segd WHERE b = 0 AND op IN ('INSERT', 'DELETE')
"""


@q(
    "cdc_debounce_keychange_rules",
    _DEBOUNCE_KC_DUCK,
    "C2's remaining flush rule — the KEY-CHANGE path: an UPDATE carrying an"
    " old image flushes (delivers) the OLD key's buffered event before its"
    " own replace-if-newer fold runs on the NEW key"
    " (pkg/pgcapture/debounce.go:112-119: handle(prev) + delete on"
    " debounceKey(change.Old)); when old and new key coincide, the arriving"
    " event therefore stores UNCONDITIONALLY — even an older checkpoint —"
    " because its own flush emptied the buffer. Modeled as a boundary"
    " relation (I/D events + old-image flush markers on the OLD key), a"
    " per-(key, interval) running boundary count assigning segments (an"
    " update's own same-key marker opens its segment, counted explicitly),"
    " and the same closed-form suffix-condition survivor per segment —"
    " still pure window algebra, no per-row state. Verified against a"
    " direct simulation of the reference fold in tests.",
)
def cdc_debounce_keychange_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    register_views(spark, sf_dir, ("events",))
    base = (
        spark.table("events")
        .where(F.col("event_id").isNotNull() & F.col("user_id").isNotNull())
        .select(
            F.col("event_id").alias("id"),
            (F.col("user_id") % 40).alias("k"),
            ((F.col("user_id") + F.col("event_id")) % 40).alias("alt"),
        )
    )
    _assert_ck_unique(base)
    is_dump = F.col("id") % 11 == 3
    is_ins = F.col("id") % 5 == 0
    is_del = F.col("id") % 5 == 1
    has_old = ~is_dump & ~is_ins & ~is_del & (F.col("id") % 7 == 2)
    e = base.select(
        "id",
        "k",
        is_dump.alias("is_dump"),
        F.when(is_dump, F.lit("UPDATE"))
        .when(is_ins, F.lit("INSERT"))
        .when(is_del, F.lit("DELETE"))
        .otherwise(F.lit("UPDATE"))
        .alias("op"),
        has_old.alias("has_old"),
        F.when(has_old, F.col("alt")).alias("old_k"),
        F.when(is_dump, F.col("id"))
        .otherwise(F.lit(100000000) + F.col("id") * 100)
        .alias("ck"),
        ((F.col("id") * 48271) % 2147483647).alias("at"),
    ).withColumn("iv", F.floor(F.col("at") / 268435456.0).cast("long"))
    nulls = [
        F.lit(None).cast(t).alias(c)
        for c, t in (
            ("op", "string"), ("is_dump", "boolean"), ("has_old", "boolean"),
            ("old_k", "bigint"), ("ck", "bigint"),
        )
    ]
    stream = (
        e.select(
            F.col("k").alias("bk"), "iv", "at", "id", F.lit(0).alias("b"),
            "op", "is_dump", "has_old", "old_k", "ck",
        )
        .unionByName(
            e.where("has_old").select(
                F.col("old_k").alias("bk"), "iv", "at", "id",
                F.lit(1).alias("b"), *nulls,
            )
        )
        .unionByName(
            e.where(F.col("op").isin("INSERT", "DELETE")).select(
                F.col("k").alias("bk"), "iv", "at", "id",
                F.lit(1).alias("b"), *nulls,
            )
        )
    )
    w_seg = (
        W.partitionBy("bk", "iv")
        .orderBy("at", "id", "b")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    segd = stream.withColumn(
        "seg",
        (
            F.coalesce(F.sum("b").over(w_seg), F.lit(0))
            + F.when(
                (F.col("b") == 0)
                & F.coalesce(F.col("has_old"), F.lit(False))
                & (F.col("old_k") == F.col("bk")),
                1,
            ).otherwise(0)
        ).cast("long"),
    )
    upd = segd.where((F.col("b") == 0) & (F.col("op") == "UPDATE"))
    w_later = (
        W.partitionBy("bk", "iv", "seg")
        .orderBy("at", "id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    sfx = upd.withColumn(
        "later_dump", F.max(F.when(F.col("is_dump"), 1).otherwise(0)).over(w_later)
    ).withColumn("later_max", F.max("ck").over(w_later))
    ok = sfx.where(
        (F.coalesce(F.col("later_dump"), F.lit(0)) == 0)
        & (F.col("later_max").isNull() | (F.col("later_max") < F.col("ck")))
    )
    w_first = W.partitionBy("bk", "iv", "seg").orderBy("at", "id")
    surv = ok.withColumn("rn", F.row_number().over(w_first)).where("rn = 1")
    out = [
        F.col("bk").alias("user_key"),
        F.col("iv").alias("interval_id"),
        F.col("id").alias("event_id"),
        "op",
        "is_dump",
    ]
    return surv.select(*out, F.lit("debounced").alias("kind")).unionByName(
        segd.where((F.col("b") == 0) & F.col("op").isin("INSERT", "DELETE")).select(
            *out, F.lit("direct").alias("kind")
        )
    )


# -------------------------------------------------- windowed drift monitor

_PSI_WINDOWED_DUCK = """
WITH feat AS (
  SELECT CAST(floor(doc_id / 128) AS BIGINT) AS win, coalesce(source, '~') AS source,
         'len_bucket' AS feature,
         coalesce(CAST(least(CAST(floor(n_chars / 500) AS BIGINT), 7)
                       AS VARCHAR), '~') AS bucket
  FROM documents WHERE doc_id IS NOT NULL
  UNION ALL
  SELECT CAST(floor(doc_id / 128) AS BIGINT), coalesce(source, '~'), 'lang',
         coalesce(lang, '~')
  FROM documents WHERE doc_id IS NOT NULL
),
counts AS (
  SELECT source, win, feature, bucket, CAST(count(*) AS BIGINT) AS c
  FROM feat GROUP BY 1, 2, 3, 4
),
pair AS (
  SELECT coalesce(cur.source, ref.source) AS source,
         coalesce(cur.win, ref.win + 1) AS win,
         coalesce(cur.feature, ref.feature) AS feature,
         coalesce(cur.bucket, ref.bucket) AS bucket,
         coalesce(cur.c, 0) AS cur_cnt, coalesce(ref.c, 0) AS ref_cnt
  FROM counts cur FULL OUTER JOIN counts ref
    ON cur.source = ref.source AND cur.feature = ref.feature
   AND cur.bucket = ref.bucket AND cur.win = ref.win + 1
  WHERE coalesce(cur.win, ref.win + 1)
        BETWEEN 1 AND (SELECT max(win) FROM counts)
),
tot AS (
  SELECT *, CAST(count(*) OVER wg AS BIGINT) AS n_buckets,
         CAST(sum(cur_cnt) OVER wg AS BIGINT) AS n_cur,
         CAST(sum(ref_cnt) OVER wg AS BIGINT) AS n_ref
  FROM pair WINDOW wg AS (PARTITION BY source, win, feature)
),
terms AS (
  SELECT source, win, feature,
         CAST(floor((((cur_cnt + 1.0) / (n_cur + n_buckets))
                     - ((ref_cnt + 1.0) / (n_ref + n_buckets)))
                    * ln(((cur_cnt + 1.0) / (n_cur + n_buckets))
                         / ((ref_cnt + 1.0) / (n_ref + n_buckets)))
                    * 1000000000 + 0.5) AS BIGINT) AS t,
         n_buckets, n_ref, n_cur
  FROM tot
)
SELECT source, win, feature, CAST(sum(t) AS BIGINT) AS psi_nano,
       max(n_buckets) AS n_buckets, max(n_ref) AS n_ref, max(n_cur) AS n_cur
FROM terms GROUP BY 1, 2, 3
"""


@q(
    "corpus_drift_psi_windowed",
    _PSI_WINDOWED_DUCK,
    "Per-source WINDOWED drift: PSI between every corpus window and its"
    " predecessor (doc_id windows as the ingestion-time proxy), per source"
    " and tracked feature — the rolling monitor a continuously-refreshed"
    " training corpus runs, vs corpus_drift_psi's one-shot snapshot pair."
    " Bucket counts aggregate once; the window pairing is a self-join of the"
    " DISTRIBUTION-sized count table shifted by one window (never a second"
    " corpus scan), then the shared Laplace-smoothed nano-quantized PSI"
    " (psi_from_counts) grouped by (source, win, feature). A (source, win)"
    " whose source vanished mid-stream still surfaces (cur_cnt=0 rows) —"
    " disappearance IS drift.",
)
def corpus_drift_psi_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.querydefs.pipeline import doc_feature_rows, psi_from_counts

    register_views(spark, sf_dir, ("documents",))
    docs = (
        spark.table("documents")
        .where(F.col("doc_id").isNotNull())
        .withColumn("win", F.floor(F.col("doc_id") / 128).cast("long"))
        .withColumn("src", F.coalesce(F.col("source"), F.lit("~")))
    )
    counts = (
        doc_feature_rows(docs, extra_cols=("win", "src"))
        .groupBy("src", "win", "feature", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )
    cur = counts.select(
        F.col("src").alias("source"), "win", "feature", "bucket", F.col("c")
    )
    ref = counts.select(
        F.col("src").alias("source"),
        (F.col("win") + 1).alias("win"),
        "feature",
        "bucket",
        F.col("c").alias("ref_c"),
    )
    max_win = counts.select(F.max("win").alias("mx"))
    pair = (
        cur.join(ref, ["source", "win", "feature", "bucket"], "full_outer")
        .select(
            "source",
            "win",
            "feature",
            "bucket",
            F.coalesce(F.col("c"), F.lit(0)).alias("cur_cnt"),
            F.coalesce(F.col("ref_c"), F.lit(0)).alias("ref_cnt"),
        )
        # one-row broadcast bound: windows past the corpus end (created by
        # the ref shift) and window 0 (no predecessor) drop
        .join(F.broadcast(max_win))
        .where((F.col("win") >= 1) & (F.col("win") <= F.col("mx")))
        .drop("mx")
    )
    return psi_from_counts(pair, ("source", "win", "feature"))
