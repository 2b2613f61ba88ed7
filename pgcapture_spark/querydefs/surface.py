"""Consumer-surface / sink-side operators (SURVEY §2 T1-T9, S4, S10, A2, A6,
C2, D7-timestamps): routing filters, projections, checkpoints, debounce, JSON
marshaling, DDL skip-set."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcapture_spark.catalog import CDC_COLS, register_views
from pgcapture_spark.fixtures.cdc_feed import DUCKDB, SPARK, cdc_customer_sql, generic_feed_sql
from pgcapture_spark.functions.marshal import json_decimal, json_int, json_string, marshal_events
from pgcapture_spark.operators.checkpoint import (
    last_checkpoint,
    resume_filter,
    scan_checkpoint_from_log,
)
from pgcapture_spark.operators.ddl import ddl_skip_filter, dedupe_consecutive_ddl
from pgcapture_spark.operators.debounce import debounce_batch
from pgcapture_spark.operators.filters import (
    old_image_projection,
    suppress_non_changes,
    table_regex_filter,
    toast_backfill_image,
)
from pgcapture_spark.queries import _feed, q

_GENERIC_COLS = "lsn, seq, ord, op, schema_name, table_name, key_str"


def _generic(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(generic_feed_sql(SPARK))


# ------------------------------------------------------------- T4 / T5

@q(
    "cdc_table_regex_filter",
    f"""
WITH g AS ({generic_feed_sql(DUCKDB)})
SELECT {_GENERIC_COLS} FROM g
WHERE op IN ('INSERT','UPDATE','DELETE')
  AND regexp_matches(schema_name || '.' || table_name, '^public\\.cust.*')
""",
    "T4: per-consumer TableRegex filter (pkg/dblog/gateway.go:159-173,219-227).",
)
def cdc_table_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = suppress_non_changes(_generic(spark, sf_dir))
    g = g.withColumn("fqn", F.concat_ws(".", "schema_name", "table_name"))
    return table_regex_filter(g, r"^public\.cust.*").select(*_GENERIC_COLS.split(", "))


@q(
    "cdc_frame_suppression",
    f"""
WITH g AS ({generic_feed_sql(DUCKDB)})
SELECT {_GENERIC_COLS} FROM g WHERE op IN ('INSERT','UPDATE','DELETE')
""",
    "T5: Begin/Commit/KeepAlive frames dropped; only Change rows forwarded"
    " (pkg/dblog/gateway.go:159-173).",
)
def cdc_frame_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    return suppress_non_changes(_generic(spark, sf_dir))


# ------------------------------------------------------------- T1 / T2 / T6

@q(
    "cdc_old_image_delete",
    f"""
WITH feed AS ({cdc_customer_sql(DUCKDB)})
SELECT lsn, seq, ord, old_c_custkey FROM feed
WHERE op = 'DELETE' AND old_c_custkey IS NOT NULL
""",
    "T1: DELETE old-image projection, NULLs dropped (makeOldPBTuple,"
    " pkg/decode/decoder.go:56-82).",
)
def cdc_old_image_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    return old_image_projection(_feed(spark, sf_dir, "customer"), ["old_c_custkey"])


@q(
    "cdc_toast_effective_image",
    f"""
WITH feed AS ({cdc_customer_sql(DUCKDB)})
SELECT f.lsn, f.seq, f.ord, f.c_custkey,
       CASE WHEN instr(',' || f.present || ',', ',c_name,') > 0 THEN f.c_name ELSE s.c_name END AS c_name,
       CASE WHEN instr(',' || f.present || ',', ',c_nationkey,') > 0 THEN f.c_nationkey ELSE s.c_nationkey END AS c_nationkey,
       CASE WHEN instr(',' || f.present || ',', ',c_acctbal,') > 0 THEN f.c_acctbal ELSE s.c_acctbal END AS c_acctbal,
       CASE WHEN instr(',' || f.present || ',', ',c_mktsegment,') > 0 THEN f.c_mktsegment ELSE s.c_mktsegment END AS c_mktsegment
FROM feed f JOIN customer s USING (c_custkey)
WHERE f.op = 'UPDATE'
""",
    "T2: replica-identity-FULL effective image — TOAST-absent columns"
    " backfilled from the old image (makeNewPBTuple ReAppend,"
    " pkg/decode/decoder.go:84-118).",
)
def cdc_toast_effective_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer",))
    return toast_backfill_image(
        _feed(spark, sf_dir, "customer"),
        spark.table("customer"),
        "c_custkey",
        CDC_COLS["customer"],
    )


@q(
    "cdc_generated_col_filter",
    f"""
WITH feed AS ({cdc_customer_sql(DUCKDB)})
SELECT lsn, seq, ord, c_custkey, c_name, c_nationkey, c_mktsegment
FROM feed WHERE op = 'INSERT'
""",
    "T6: GENERATED ALWAYS columns dropped from inserts (pkg/sink/"
    "postgres.go:401-404; here c_acctbal plays the generated column).",
)
def cdc_generated_col_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    feed = _feed(spark, sf_dir, "customer").where(F.col("op") == "INSERT")
    return feed.select("lsn", "seq", "ord", "c_custkey", "c_name", "c_nationkey", "c_mktsegment")


# ------------------------------------------------------------- S4 / A2 / S10 / D7

_RESUME_LSN = 2147483648  # 2^31 — mid-keyspace


@q(
    "cdc_resume_filter",
    f"""
WITH feed AS ({cdc_customer_sql(DUCKDB)})
SELECT lsn, seq, ord, commit_ts, op, c_custkey, c_name, c_nationkey, c_acctbal,
       c_mktsegment, old_c_custkey, present
FROM feed
WHERE lsn > {_RESUME_LSN} OR (lsn = {_RESUME_LSN} AND seq > 1)
""",
    "S4: resume catch-up drop — strict (lsn, seq) order"
    " (pkg/source/pulsar.go:110-156, pkg/sink/pulsar.go:116-127).",
)
def cdc_resume_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resume_filter(_feed(spark, sf_dir, "customer"), _RESUME_LSN, 1)


@q(
    "cdc_checkpoint_max",
    f"""
WITH feed AS ({cdc_customer_sql(DUCKDB)})
SELECT arg_max(lsn, ord) AS last_lsn, arg_max(seq, ord) AS last_seq FROM feed
""",
    "A2: resume-point discovery — max (lsn, seq) in the log"
    " (pkg/cursor/pulsar.go:30-51).",
)
def cdc_checkpoint_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    return last_checkpoint(_feed(spark, sf_dir, "customer"))


@q(
    "cdc_log_scan_checkpoint",
    """
WITH lines AS (
  SELECT CASE WHEN event_id % 7 = 0
              THEN 'LOG:  redo done at 1A2/' || upper(to_hex(event_id))
              ELSE 'LOG:  checkpoint starting: time' END AS line
  FROM events
)
SELECT regexp_extract(line, 'redo done at ([0-9A-F]+/[0-9A-F]+)', 1) AS redo_lsn
FROM lines WHERE regexp_matches(line, 'redo done at ([0-9A-F]+/[0-9A-F]+)')
""",
    "S10: PITR bootstrap — regex-scan server log for the redo LSN"
    " (ScanCheckpointFromLog, pkg/sink/postgres.go:677-700).",
)
def cdc_log_scan_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    lines = spark.sql(
        """
        SELECT CASE WHEN event_id % 7 = 0
                    THEN 'LOG:  redo done at 1A2/' || upper(hex(event_id))
                    ELSE 'LOG:  checkpoint starting: time' END AS line
        FROM events
        """
    )
    return scan_checkpoint_from_log(lines)


@q(
    "pg_epoch_decode",
    """
SELECT event_id,
       make_timestamp(946684800000000 + event_id * 1000000 + (event_id % 1000) * 1000)
         AS decoded_ts
FROM events
""",
    "D7: PG binary timestamp decode — µs since 2000-01-01 shifted to the unix"
    " epoch (python/pgcapture/decoders.py:97-109, pkg/sink/postgres.go:729-731).",
)
def pg_epoch_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT event_id,
               timestamp_micros(946684800000000 + event_id * 1000000 + (event_id % 1000) * 1000)
                 AS decoded_ts
        FROM events
        """
    )


# ------------------------------------------------------------- C2 debounce

@q(
    "cdc_debounce_events",
    """
SELECT user_id, debounce_window, event_id, ts, event_type, value FROM (
  SELECT user_id, date_trunc('hour', ts) AS debounce_window, event_id, ts,
         event_type, value
  FROM events
) QUALIFY row_number() OVER (
    PARTITION BY user_id, debounce_window ORDER BY ts DESC, event_id DESC) = 1
""",
    "C2: per-key debounce — last-write-wins within the interval"
    " (DebounceHandler, pkg/pgcapture/debounce.go:87-155); batch-window form.",
)
def cdc_debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    df = spark.table("events")
    out = debounce_batch(df, "user_id", ["ts", "event_id"], "ts", "hour")
    return out.select("user_id", "debounce_window", "event_id", "ts", "event_type", "value")


# ------------------------------------------------------------- T9 JSON

_MARSHAL_DUCK = f"""
WITH feed AS ({cdc_customer_sql(DUCKDB)})
SELECT lsn, seq, ord, op,
  '{{' || concat_ws(',',
    CASE WHEN instr(',' || present || ',', ',c_custkey,') > 0
         THEN '"c_custkey":' || CASE WHEN c_custkey IS NULL THEN 'null' ELSE CAST(c_custkey AS STRING) END END,
    CASE WHEN instr(',' || present || ',', ',c_name,') > 0
         THEN '"c_name":' || CASE WHEN c_name IS NULL THEN 'null' ELSE '"' || c_name || '"' END END,
    CASE WHEN instr(',' || present || ',', ',c_nationkey,') > 0
         THEN '"c_nationkey":' || CASE WHEN c_nationkey IS NULL THEN 'null' ELSE CAST(c_nationkey AS STRING) END END,
    CASE WHEN instr(',' || present || ',', ',c_acctbal,') > 0
         THEN '"c_acctbal":' || CASE WHEN c_acctbal IS NULL THEN 'null' ELSE CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS STRING) END END,
    CASE WHEN instr(',' || present || ',', ',c_mktsegment,') > 0
         THEN '"c_mktsegment":' || CASE WHEN c_mktsegment IS NULL THEN 'null' ELSE '"' || c_mktsegment || '"' END END
  ) || '}}' AS payload
FROM feed
"""


@q(
    "cdc_json_marshal",
    _MARSHAL_DUCK,
    "T9: presence-aware JSON marshal — unchanged-TOAST columns OMITTED,"
    " explicit SQL NULLs serialized as null (pkg/pgcapture/json.go:22-111).",
)
def cdc_json_marshal(spark: SparkSession, sf_dir: str) -> DataFrame:
    feed = _feed(spark, sf_dir, "customer")
    return marshal_events(
        feed,
        {
            "c_custkey": json_int("c_custkey"),
            "c_name": json_string("c_name"),
            "c_nationkey": json_int("c_nationkey"),
            "c_acctbal": json_decimal("c_acctbal"),
            "c_mktsegment": json_string("c_mktsegment"),
        },
    )


# ------------------------------------------------------------- A6 DDL

@q(
    "cdc_ddl_skipset",
    f"""
WITH g AS ({generic_feed_sql(DUCKDB)}),
changes AS (SELECT {_GENERIC_COLS} FROM g WHERE op IN ('INSERT','UPDATE','DELETE')),
ddl_touched AS (
  SELECT DISTINCT lsn, 'customer' AS table_name FROM changes WHERE lsn % 5 = 0
)
SELECT c.* FROM changes c
LEFT JOIN ddl_touched d ON c.lsn = d.lsn AND c.table_name = d.table_name
WHERE d.lsn IS NULL
""",
    "A6: DDL-touched relations skip-set — row events duplicated by"
    " DML-in-DDL within the same tx are dropped (anti-join;"
    " pkg/sink/postgres.go:339-365).",
)
def cdc_ddl_skipset(spark: SparkSession, sf_dir: str) -> DataFrame:
    changes = suppress_non_changes(_generic(spark, sf_dir))
    ddl_touched = (
        changes.where(F.col("lsn") % 5 == 0)
        .select("lsn")
        .distinct()
        .withColumn("table_name", F.lit("customer"))
    )
    return ddl_skip_filter(changes, ddl_touched)


@q(
    "cdc_ddl_dedupe",
    """
SELECT lsn, seq, query FROM (
  SELECT n_nationkey AS lsn, 0 AS seq,
         'ALTER TABLE t ADD COLUMN c' || CAST(CAST(floor(n_nationkey / 3) AS INT) AS STRING) AS query
  FROM nation
)
QUALIFY lag(query) OVER (ORDER BY lsn, seq) IS NULL
     OR lag(query) OVER (ORDER BY lsn, seq) <> query
""",
    "A6: crc32-style dedupe of identical consecutive DDL"
    " (pkg/sink/postgres.go:304-312) — lag-based.",
)
def cdc_ddl_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("nation",))
    ddl = spark.sql(
        """
        SELECT n_nationkey AS lsn, 0 AS seq,
               'ALTER TABLE t ADD COLUMN c' || CAST(CAST(floor(n_nationkey / 3) AS INT) AS STRING) AS query
        FROM nation
        """
    )
    return dedupe_consecutive_ddl(ddl)


# ------------------------------------------------------- T9⁻¹ JSON unmarshal

_UNMARSHAL_DUCK = f"""
WITH m AS ({_MARSHAL_DUCK})
SELECT lsn, seq, ord, op,
       CAST(payload->>'c_custkey' AS BIGINT) AS c_custkey,
       payload->>'c_name' AS c_name,
       CAST(payload->>'c_nationkey' AS INTEGER) AS c_nationkey,
       CAST(CAST(payload->>'c_acctbal' AS DECIMAL(12,2)) AS DOUBLE) AS c_acctbal,
       payload->>'c_mktsegment' AS c_mktsegment,
       coalesce(array_to_string(json_keys(payload), ','), '') AS present_keys
FROM m
"""


@q(
    "cdc_json_unmarshal",
    _UNMARSHAL_DUCK,
    "T9 inverse / consumer decode (python client analog, decoders.py + "
    "client.py): each engine unmarshals ITS OWN marshaled payload with its"
    " native JSON parser — typed field extraction plus the key list, so the"
    " NULL-vs-absent distinction survives the round trip.",
)
def cdc_json_unmarshal(spark: SparkSession, sf_dir: str) -> DataFrame:
    marshaled = cdc_json_marshal(spark, sf_dir)
    return marshaled.select(
        "lsn",
        "seq",
        "ord",
        "op",
        F.get_json_object("payload", "$.c_custkey").cast("bigint").alias("c_custkey"),
        F.get_json_object("payload", "$.c_name").alias("c_name"),
        F.get_json_object("payload", "$.c_nationkey").cast("int").alias("c_nationkey"),
        F.get_json_object("payload", "$.c_acctbal")
        .cast("decimal(12,2)")
        .cast("double")
        .alias("c_acctbal"),
        F.get_json_object("payload", "$.c_mktsegment").alias("c_mktsegment"),
        F.array_join(F.json_object_keys("payload"), ",").alias("present_keys"),
    )


# ------------------------------------------------------------- C4 dead letter

# a deterministic subset of the generic feed is corrupted (op relabeled) to
# exercise the dead-letter path; the split must neither poison the stream nor
# silently drop the bad records (reference: Requeue(reason) + redelivery,
# pkg/dblog/gateway.go:82-107)
_DLQ_DUCK = f"""
WITH g AS ({generic_feed_sql(DUCKDB)}),
mutated AS (
  SELECT lsn, seq, ord,
         CASE WHEN ord % 97 = 0 THEN 'OP_' || CAST(ord % 7 AS VARCHAR) ELSE op END AS op,
         schema_name, table_name, key_str
  FROM g
)
SELECT lsn, seq, ord, op, schema_name, table_name, key_str,
       'unknown_op:' || op AS reason
FROM mutated
WHERE op NOT IN ('INSERT', 'UPDATE', 'DELETE', 'BEGIN', 'COMMIT', 'KEEPALIVE', 'DDL')
"""


@q(
    "cdc_dead_letter_split",
    _DLQ_DUCK,
    "C4: dead-letter routing — malformed messages side-output with a reason"
    " instead of poisoning the stream or vanishing (Requeue(reason) analog,"
    " pkg/dblog/gateway.go:82-107).",
)
def cdc_dead_letter_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.filters import dead_letter_split

    g = _generic(spark, sf_dir).withColumn(
        "op",
        F.expr("CASE WHEN ord % 97 = 0 THEN 'OP_' || CAST(ord % 7 AS STRING) ELSE op END"),
    )
    _good, dlq = dead_letter_split(g)
    return dlq.select(*_GENERIC_COLS.split(", "), "reason")
