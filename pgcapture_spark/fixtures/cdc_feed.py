"""Deterministic CDC change feeds derived from the driver's snapshot tables.

Models FIXTURES.md T2 (`cdc_customer`, `cdc_orders`): a scripted stream of
INSERT/UPDATE/DELETE row events, flattened transaction framing
(`lsn` = tx LSN from Begin, `seq` = position within tx — reference:
pb/pgcapture.proto:24-51, pkg/source/postgres.go:224-231), with

- explicit NULL-setting UPDATEs (value NULL, column listed in ``present``),
- unchanged-TOAST omission (column ABSENT from ``present``; consumers must keep
  the previous image — reference: pkg/decode/decoder.go:106-114),
- DELETE carrying only the old key image (pkg/decode/pgoutput.go:119-135),
- INSERTs of brand-new keys, and an INSERT-then-UPDATE class.

The feed is pure arithmetic over the snapshot keys (multiplicative hashing by
the odd constant 2654435761, a bijection mod 2^32, so ``lsn`` is unique per
transaction and pseudo-randomly ordered). It is rendered as SQL that runs
IDENTICALLY on Spark SQL and DuckDB — the only dialect difference is the
micros→timestamp constructor — which is what makes every downstream operator
oracle-checkable by the driver.

``present`` is a comma-joined column list (portable across both engines;
membership test = ``instr(',' || present || ',', ',col,') > 0``).
"""

from __future__ import annotations

SPARK = "spark"
DUCKDB = "duckdb"

# 2024-01-01 00:00:00 UTC in microseconds
_EPOCH_2024_US = 1_704_067_200_000_000


def _ts_micros(expr: str, dialect: str) -> str:
    """timestamp from microseconds-since-unix-epoch, per dialect."""
    if dialect == SPARK:
        return f"timestamp_micros({expr})"
    return f"make_timestamp({expr})"


def _commit_ts(dialect: str) -> str:
    return _ts_micros(f"{_EPOCH_2024_US} + (h % 86400) * 1000000", dialect)


def cdc_customer_sql(dialect: str) -> str:
    """Change feed over ``customer`` (key c_custkey).

    Event classes by cls = h % 10:
      0-2 → 1-3 UPDATEs in one tx (seq = j); c_name TOAST-omitted when
            (h+j) % 11 = 0; c_mktsegment explicitly NULLed when (h+j) % 7 = 0
      3   → DELETE (old key image only)
      4   → INSERT of new key c_custkey + 10_000_000
      5   → INSERT of new key c_custkey + 20_000_000 then UPDATE of its acctbal
    """
    ts = _commit_ts(dialect)
    return f"""
WITH __cust AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
         ((c_custkey + 1) * 2654435761) % 4294967296 AS h,
         (((c_custkey + 1) * 2654435761) % 4294967296) % 10 AS cls,
         1 + ((((c_custkey + 1) * 2654435761) % 4294967296) % 3) AS nev
  FROM customer
),
__upd AS (
  SELECT *, 1 AS j FROM __cust WHERE cls <= 2
  UNION ALL SELECT *, 2 AS j FROM __cust WHERE cls <= 2 AND nev >= 2
  UNION ALL SELECT *, 3 AS j FROM __cust WHERE cls <= 2 AND nev >= 3
)
SELECT h AS lsn, j AS seq, h * 100 + j AS ord, {ts} AS commit_ts, 'UPDATE' AS op,
       c_custkey,
       CASE WHEN (h + j) % 11 = 0 THEN CAST(NULL AS STRING)
            ELSE 'Customer#' || CAST(c_custkey AS STRING) || '#v' || CAST(j AS STRING) END AS c_name,
       CAST((c_custkey + j) % 25 AS INT) AS c_nationkey,
       CAST(h % 100000 AS DOUBLE) / 100.0 + j AS c_acctbal,
       CASE WHEN (h + j) % 7 = 0 THEN CAST(NULL AS STRING)
            ELSE 'SEG' || CAST((h + j) % 5 AS STRING) END AS c_mktsegment,
       CAST(NULL AS BIGINT) AS old_c_custkey,
       CASE WHEN (h + j) % 11 = 0
            THEN 'c_custkey,c_nationkey,c_acctbal,c_mktsegment'
            ELSE 'c_custkey,c_name,c_nationkey,c_acctbal,c_mktsegment' END AS present
FROM __upd
UNION ALL
SELECT h, 1, h * 100 + 1, {ts}, 'DELETE',
       c_custkey,
       CAST(NULL AS STRING), CAST(NULL AS INT), CAST(NULL AS DOUBLE), CAST(NULL AS STRING),
       c_custkey, ''
FROM __cust WHERE cls = 3
UNION ALL
SELECT h, 1, h * 100 + 1, {ts}, 'INSERT',
       c_custkey + 10000000,
       'NewCustomer#' || CAST(c_custkey + 10000000 AS STRING),
       CAST(c_custkey % 25 AS INT),
       CAST(h % 50000 AS DOUBLE) / 100.0,
       'SEG' || CAST(h % 5 AS STRING),
       CAST(NULL AS BIGINT),
       'c_custkey,c_name,c_nationkey,c_acctbal,c_mktsegment'
FROM __cust WHERE cls = 4
UNION ALL
SELECT h, 1, h * 100 + 1, {ts}, 'INSERT',
       c_custkey + 20000000,
       'NewCustomer#' || CAST(c_custkey + 20000000 AS STRING),
       CAST(c_custkey % 25 AS INT),
       CAST(h % 50000 AS DOUBLE) / 100.0,
       'SEG' || CAST(h % 5 AS STRING),
       CAST(NULL AS BIGINT),
       'c_custkey,c_name,c_nationkey,c_acctbal,c_mktsegment'
FROM __cust WHERE cls = 5
UNION ALL
SELECT h, 2, h * 100 + 2, {ts}, 'UPDATE',
       c_custkey + 20000000,
       CAST(NULL AS STRING), CAST(NULL AS INT),
       CAST(h % 50000 AS DOUBLE) / 100.0 + 7.5,
       CAST(NULL AS STRING),
       CAST(NULL AS BIGINT),
       'c_custkey,c_acctbal'
FROM __cust WHERE cls = 5
"""


def cdc_orders_sql(dialect: str) -> str:
    """Change feed over ``orders`` (key o_orderkey). Same class scheme as
    customer, minus the INSERT+UPDATE class; o_orderdate is never updated
    (absent from every UPDATE's ``present`` — a permanently-TOASTed column),
    and o_custkey is TOAST-omitted when (h+j) % 11 = 0."""
    ts = _commit_ts(dialect)
    return f"""
WITH __ord AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
         ((o_orderkey + 1) * 2654435761) % 4294967296 AS h,
         (((o_orderkey + 1) * 2654435761) % 4294967296) % 10 AS cls,
         1 + ((((o_orderkey + 1) * 2654435761) % 4294967296) % 3) AS nev
  FROM orders
),
__upd AS (
  SELECT *, 1 AS j FROM __ord WHERE cls <= 2
  UNION ALL SELECT *, 2 AS j FROM __ord WHERE cls <= 2 AND nev >= 2
  UNION ALL SELECT *, 3 AS j FROM __ord WHERE cls <= 2 AND nev >= 3
)
SELECT h AS lsn, j AS seq, h * 100 + j AS ord, {ts} AS commit_ts, 'UPDATE' AS op,
       o_orderkey,
       CASE WHEN (h + j) % 11 = 0 THEN CAST(NULL AS BIGINT)
            ELSE (o_orderkey + j) % 150000 + 1 END AS o_custkey,
       CASE WHEN (h + j) % 3 = 0 THEN 'F' WHEN (h + j) % 3 = 1 THEN 'O' ELSE 'P' END AS o_orderstatus,
       CAST(h % 10000000 AS DOUBLE) / 100.0 + j AS o_totalprice,
       CAST(NULL AS TIMESTAMP) AS o_orderdate,
       CASE WHEN (h + j) % 7 = 0 THEN CAST(NULL AS STRING)
            ELSE CAST((h + j) % 5 + 1 AS STRING) || '-PRI' END AS o_orderpriority,
       CAST(NULL AS BIGINT) AS old_o_orderkey,
       CASE WHEN (h + j) % 11 = 0
            THEN 'o_orderkey,o_orderstatus,o_totalprice,o_orderpriority'
            ELSE 'o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderpriority' END AS present
FROM __upd
UNION ALL
SELECT h, 1, h * 100 + 1, {ts}, 'DELETE',
       o_orderkey,
       CAST(NULL AS BIGINT), CAST(NULL AS STRING), CAST(NULL AS DOUBLE),
       CAST(NULL AS TIMESTAMP), CAST(NULL AS STRING),
       o_orderkey, ''
FROM __ord WHERE cls = 3
UNION ALL
SELECT h, 1, h * 100 + 1, {ts}, 'INSERT',
       o_orderkey + 100000000,
       o_orderkey % 150000 + 1,
       'O',
       CAST(h % 10000000 AS DOUBLE) / 100.0,
       {_ts_micros(f"{_EPOCH_2024_US} + (h % 31536000) * 1000000", dialect)},
       CAST(h % 5 + 1 AS STRING) || '-PRI',
       CAST(NULL AS BIGINT),
       'o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,o_orderpriority'
FROM __ord WHERE cls = 4
"""


def cdc_lineitem_sql(dialect: str) -> str:
    """Change feed over ``lineitem`` — COMPOSITE key (l_orderkey,
    l_linenumber), the replica-identity-is-several-columns case the reference
    supports via its identity cache (pkg/decode/schema.go:161-191, key/set
    split pkg/sink/postgres.go:507-547).

    Class scheme (cls = h % 10, h hashed from BOTH key parts):
      0-2 → 1-3 UPDATEs in one tx: l_quantity/l_extendedprice set;
            l_extendedprice TOAST-omitted when (h+j) % 11 = 0;
            l_returnflag explicitly NULLed when (h+j) % 7 = 0;
            every other column inherited (never in ``present``)
      3   → DELETE (old composite key image)
      4   → INSERT of a brand-new composite key (l_orderkey + 10^7, same
            linenumber)
    """
    ts = _commit_ts(dialect)
    return f"""
WITH __li AS (
  SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate,
         ((l_orderkey * 7 + l_linenumber + 1) * 2654435761) % 4294967296 AS h,
         (((l_orderkey * 7 + l_linenumber + 1) * 2654435761) % 4294967296) % 10 AS cls,
         1 + ((((l_orderkey * 7 + l_linenumber + 1) * 2654435761) % 4294967296) % 3) AS nev
  FROM lineitem
),
__upd AS (
  SELECT *, 1 AS j FROM __li WHERE cls <= 2
  UNION ALL SELECT *, 2 AS j FROM __li WHERE cls <= 2 AND nev >= 2
  UNION ALL SELECT *, 3 AS j FROM __li WHERE cls <= 2 AND nev >= 3
)
SELECT h AS lsn, j AS seq, h * 100 + j AS ord, {ts} AS commit_ts, 'UPDATE' AS op,
       l_orderkey, l_linenumber,
       CAST(NULL AS BIGINT) AS l_partkey,
       CAST(NULL AS BIGINT) AS l_suppkey,
       CAST(h % 50 AS DOUBLE) + j AS l_quantity,
       CASE WHEN (h + j) % 11 = 0 THEN CAST(NULL AS DOUBLE)
            ELSE CAST(h % 10000000 AS DOUBLE) / 100.0 + j END AS l_extendedprice,
       CAST(NULL AS DOUBLE) AS l_discount,
       CAST(NULL AS DOUBLE) AS l_tax,
       CASE WHEN (h + j) % 7 = 0 THEN CAST(NULL AS STRING)
            ELSE substring('ARN', CAST((h + j) % 3 AS INT) + 1, 1) END AS l_returnflag,
       CAST(NULL AS STRING) AS l_linestatus,
       CAST(NULL AS TIMESTAMP) AS l_shipdate,
       CAST(NULL AS BIGINT) AS old_l_orderkey,
       CAST(NULL AS INT) AS old_l_linenumber,
       CASE WHEN (h + j) % 11 = 0
            THEN 'l_orderkey,l_linenumber,l_quantity,l_returnflag'
            ELSE 'l_orderkey,l_linenumber,l_quantity,l_extendedprice,l_returnflag'
            END AS present
FROM __upd
UNION ALL
SELECT h, 1, h * 100 + 1, {ts}, 'DELETE',
       l_orderkey, l_linenumber,
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS TIMESTAMP),
       l_orderkey, l_linenumber, ''
FROM __li WHERE cls = 3
UNION ALL
SELECT h, 1, h * 100 + 1, {ts}, 'INSERT',
       l_orderkey + 10000000, l_linenumber,
       h % 20000 + 1, h % 1000 + 1,
       CAST(h % 50 AS DOUBLE),
       CAST(h % 10000000 AS DOUBLE) / 100.0,
       CAST(h % 10 AS DOUBLE) / 100.0,
       CAST(h % 8 AS DOUBLE) / 100.0,
       substring('ARN', CAST(h % 3 AS INT) + 1, 1),
       'O',
       {_ts_micros(f"{_EPOCH_2024_US} + (h % 31536000) * 1000000", dialect)},
       CAST(NULL AS BIGINT), CAST(NULL AS INT),
       'l_orderkey,l_linenumber,l_partkey,l_suppkey,l_quantity,l_extendedprice,'
         || 'l_discount,l_tax,l_returnflag,l_linestatus,l_shipdate'
FROM __li WHERE cls = 4
"""


def multi_feed_sql(dialect: str) -> str:
    """TYPED multi-table feed: customer and orders change events in ONE
    ordered stream (table-tagged, disjoint payload columns NULL-padded) — the
    wire shape of the reference's single replication stream carrying every
    table's changes (pb/pgcapture.proto:40-51). The apply side splits by
    ``table_name`` and folds each table with its own key/columns, advancing
    all snapshots atomically per micro-batch."""
    return f"""
WITH __fc AS ({cdc_customer_sql(dialect)}),
__fo AS ({cdc_orders_sql(dialect)})
SELECT lsn, seq, ord, commit_ts, op, 'customer' AS table_name,
       c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, present,
       CAST(NULL AS BIGINT) AS o_orderkey, CAST(NULL AS BIGINT) AS o_custkey,
       CAST(NULL AS STRING) AS o_orderstatus, CAST(NULL AS DOUBLE) AS o_totalprice,
       CAST(NULL AS TIMESTAMP) AS o_orderdate, CAST(NULL AS STRING) AS o_orderpriority
FROM __fc
UNION ALL
SELECT lsn, seq, ord, commit_ts, op, 'orders',
       CAST(NULL AS BIGINT), CAST(NULL AS STRING), CAST(NULL AS INT),
       CAST(NULL AS DOUBLE), CAST(NULL AS STRING), present,
       o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM __fo
"""


def metrics_feed_sql() -> str:
    """Change feed for a table that exists NOWHERE at startup — the schema
    arrives in-band as a Relation ('R') message (no DDL text), so this feed
    exercises the reference's relation-message refresh path
    (pkg/decode/pgoutput.go:93-117). Key m_id (20 keys × 3 events), presence
    model fully exercised: TOAST-absent m_note (id%3=0), explicit-NULL m_note
    (id%4=2), DELETE as old-key-only (id%7=6). Pure integer arithmetic — the
    same text runs on Spark SQL and DuckDB."""
    return """
WITH __ev AS (SELECT id FROM range(60) t(id))
SELECT id + 1 AS lsn, 1 AS seq, CAST(id AS BIGINT) AS ord,
       CAST(NULL AS TIMESTAMP) AS commit_ts,
       CASE WHEN id % 7 = 6 THEN 'DELETE'
            WHEN id < 20 THEN 'INSERT' ELSE 'UPDATE' END AS op,
       id % 20 AS m_id,
       CASE WHEN id % 7 = 6 THEN CAST(NULL AS DOUBLE)
            ELSE CAST(id AS DOUBLE) / 2 END AS m_value,
       CASE WHEN id % 7 = 6 OR id % 4 = 2 THEN CAST(NULL AS STRING)
            ELSE 'n-' || CAST(id AS STRING) END AS m_note,
       CASE WHEN id % 7 = 6 THEN id % 20 ELSE CAST(NULL AS BIGINT) END AS old_m_id,
       CASE WHEN id % 7 = 6 THEN ''
            WHEN id % 3 = 0 THEN 'm_id,m_value'
            ELSE 'm_id,m_value,m_note' END AS present
FROM __ev
"""


def metrics_composite_feed_sql() -> str:
    """Change feed for a mid-stream-learned table whose replica identity is
    COMPOSITE — (g_id, s_id) — exercising the dynamic relation-learning
    path's multi-column key support (the reference identity may be any
    column set, pkg/decode/schema.go:161-191). 24 key pairs × 3 events;
    presence model fully exercised: TOAST-absent m_note (id%3=0),
    explicit-NULL m_note (id%4=2), DELETE as old-key-only images carrying
    BOTH identity columns (id%7=6). Pure integer arithmetic — the same text
    runs on Spark SQL and DuckDB."""
    return """
WITH __ev AS (SELECT id FROM range(72) t(id))
SELECT id + 1 AS lsn, 1 AS seq, CAST(id AS BIGINT) AS ord,
       CAST(NULL AS TIMESTAMP) AS commit_ts,
       CASE WHEN id % 7 = 6 THEN 'DELETE'
            WHEN id < 24 THEN 'INSERT' ELSE 'UPDATE' END AS op,
       CAST(id % 6 AS BIGINT) AS g_id,
       CAST(floor(id / 6.0) AS BIGINT) % 4 AS s_id,
       CASE WHEN id % 7 = 6 THEN CAST(NULL AS DOUBLE)
            ELSE CAST(id AS DOUBLE) / 2 END AS m_value,
       CASE WHEN id % 7 = 6 OR id % 4 = 2 THEN CAST(NULL AS STRING)
            ELSE 'n-' || CAST(id AS STRING) END AS m_note,
       CASE WHEN id % 7 = 6 THEN CAST(id % 6 AS BIGINT)
            ELSE CAST(NULL AS BIGINT) END AS old_g_id,
       CASE WHEN id % 7 = 6 THEN CAST(floor(id / 6.0) AS BIGINT) % 4
            ELSE CAST(NULL AS BIGINT) END AS old_s_id,
       CASE WHEN id % 7 = 6 THEN ''
            WHEN id % 3 = 0 THEN 'g_id,s_id,m_value'
            ELSE 'g_id,s_id,m_value,m_note' END AS present
FROM __ev
"""


def metrics_evolve_feed_sql() -> str:
    """The composite-identity feed EXTENDED by a mid-stream ALTER: same
    event classes as ``metrics_composite_feed_sql`` (24 composite keys,
    TOAST-absent m_note id%3=0, explicit-NULL m_note id%4=2, DELETE
    old-key-only images id%7=6) over 96 events at ord = 2*id, plus a new
    ``m_flag`` column that exists only AFTER the ALTER boundary (id ≥ 48,
    ord ≥ 96): pre-ALTER events never list it in ``present`` (the wire rows
    physically lack the field — exactly a column that didn't exist yet),
    post-ALTER full-presence rows set it. The odd ord 95 is reserved for
    the DDL event the wire fixture injects between id 47 and 48. Pure
    integer arithmetic — the same text runs on Spark SQL and DuckDB."""
    return """
WITH __ev AS (SELECT id FROM range(96) t(id))
SELECT id + 1 AS lsn, 1 AS seq, CAST(id * 2 AS BIGINT) AS ord,
       CAST(NULL AS TIMESTAMP) AS commit_ts,
       CASE WHEN id % 7 = 6 THEN 'DELETE'
            WHEN id < 24 THEN 'INSERT' ELSE 'UPDATE' END AS op,
       CAST(id % 6 AS BIGINT) AS g_id,
       CAST(floor(id / 6.0) AS BIGINT) % 4 AS s_id,
       CASE WHEN id % 7 = 6 THEN CAST(NULL AS DOUBLE)
            ELSE CAST(id AS DOUBLE) / 2 END AS m_value,
       CASE WHEN id % 7 = 6 OR id % 4 = 2 THEN CAST(NULL AS STRING)
            ELSE 'n-' || CAST(id AS STRING) END AS m_note,
       CASE WHEN id >= 48 AND id % 7 <> 6 AND id % 3 <> 0 AND id % 4 <> 2
            THEN CAST(id % 5 AS INT) ELSE CAST(NULL AS INT) END AS m_flag,
       CASE WHEN id % 7 = 6 THEN CAST(id % 6 AS BIGINT)
            ELSE CAST(NULL AS BIGINT) END AS old_g_id,
       CASE WHEN id % 7 = 6 THEN CAST(floor(id / 6.0) AS BIGINT) % 4
            ELSE CAST(NULL AS BIGINT) END AS old_s_id,
       CASE WHEN id % 7 = 6 THEN ''
            WHEN id % 3 = 0 THEN 'g_id,s_id,m_value'
            WHEN id >= 48 AND id % 4 <> 2 THEN 'g_id,s_id,m_value,m_note,m_flag'
            ELSE 'g_id,s_id,m_value,m_note' END AS present
FROM __ev
"""


def generic_feed_sql(dialect: str) -> str:
    """FIXTURES.md T1-shaped generic stream: customer+orders change events
    flattened to metadata columns, PLUS Begin/Commit frame rows per
    transaction (op='BEGIN'/'COMMIT') — so frame-suppression (gateway
    forwards only Change messages, pkg/dblog/gateway.go:159-173) is testable."""
    return f"""
WITH __fc AS ({cdc_customer_sql(dialect)}),
__fo AS ({cdc_orders_sql(dialect)}),
__changes AS (
  SELECT lsn, seq, ord, op, 'public' AS schema_name, 'customer' AS table_name,
         CAST(c_custkey AS STRING) AS key_str
  FROM __fc
  UNION ALL
  SELECT lsn, seq, ord, op, 'public', 'orders', CAST(o_orderkey AS STRING)
  FROM __fo
),
__txs AS (SELECT DISTINCT lsn FROM __changes)
SELECT * FROM __changes
UNION ALL
SELECT lsn, 0, lsn * 100, 'BEGIN', CAST(NULL AS STRING), CAST(NULL AS STRING),
       CAST(NULL AS STRING)
FROM __txs
UNION ALL
SELECT lsn, 99, lsn * 100 + 99, 'COMMIT', CAST(NULL AS STRING), CAST(NULL AS STRING),
       CAST(NULL AS STRING)
FROM __txs
"""


_DEBOUNCE_BASE = """
SELECT c_custkey, ((c_custkey + 1) * 2654435761) % 4294967296 AS h,
       (((c_custkey + 1) * 2654435761) % 4294967296) % 10 AS cls,
       1 + ((((c_custkey + 1) * 2654435761) % 4294967296) % 3) AS nev
FROM customer
"""


def debounce_feed_sql() -> str:
    """Arrival-ordered event feed (key, lsn, seq, arr, op) exercising EVERY
    DebounceHandler rule (pkg/pgcapture/debounce.go:87-155). Pure integer
    arithmetic — the same text runs on Spark SQL and DuckDB.

    Per key class (cls = h % 10):
      0-2 → nev UPDATEs then a DELETE: the last UPDATE flushes, earlier drop
      3   → lone DELETE (immediate)
      4   → INSERT; two UPDATEs (second supersedes first); DELETE flush
      5   → INSERT; one UPDATE that stays buffered forever (suppressed)
      6   → UPDATE; then a DUMP row (lsn=0 — always counts as latest,
            replacing the buffer); DELETE flushes the dump row
      7   → UPDATE (seq 5); an out-of-order OLDER UPDATE (seq 2) that must be
            dropped; DELETE flushes seq 5
      8   → two UPDATEs with EQUAL checkpoints: flush-then-store
      9   → lone UPDATE, buffered forever (suppressed)
    """
    return f"""
WITH __c AS ({_DEBOUNCE_BASE}),
__upd AS (
  SELECT *, 1 AS j FROM __c WHERE cls <= 2
  UNION ALL SELECT *, 2 AS j FROM __c WHERE cls <= 2 AND nev >= 2
  UNION ALL SELECT *, 3 AS j FROM __c WHERE cls <= 2 AND nev >= 3
)
SELECT c_custkey AS key, h AS lsn, j AS seq, h * 100 + j AS arr, 'UPDATE' AS op FROM __upd
UNION ALL SELECT c_custkey, h, 50, h * 100 + 50, 'DELETE' FROM __c WHERE cls <= 2
UNION ALL SELECT c_custkey, h, 1, h * 100 + 1, 'DELETE' FROM __c WHERE cls = 3
UNION ALL SELECT c_custkey + 10000000, h, 1, h * 100 + 1, 'INSERT' FROM __c WHERE cls = 4
UNION ALL SELECT c_custkey + 10000000, h, 10, h * 100 + 10, 'UPDATE' FROM __c WHERE cls = 4
UNION ALL SELECT c_custkey + 10000000, h, 11, h * 100 + 11, 'UPDATE' FROM __c WHERE cls = 4
UNION ALL SELECT c_custkey + 10000000, h, 20, h * 100 + 20, 'DELETE' FROM __c WHERE cls = 4
UNION ALL SELECT c_custkey + 20000000, h, 1, h * 100 + 1, 'INSERT' FROM __c WHERE cls = 5
UNION ALL SELECT c_custkey + 20000000, h, 2, h * 100 + 2, 'UPDATE' FROM __c WHERE cls = 5
UNION ALL SELECT c_custkey, h, 1, h * 100 + 1, 'UPDATE' FROM __c WHERE cls = 6
UNION ALL SELECT c_custkey, 0, 7, h * 100 + 2, 'UPDATE' FROM __c WHERE cls = 6
UNION ALL SELECT c_custkey, h, 20, h * 100 + 3, 'DELETE' FROM __c WHERE cls = 6
UNION ALL SELECT c_custkey, h, 5, h * 100 + 1, 'UPDATE' FROM __c WHERE cls = 7
UNION ALL SELECT c_custkey, h, 2, h * 100 + 2, 'UPDATE' FROM __c WHERE cls = 7
UNION ALL SELECT c_custkey, h, 9, h * 100 + 9, 'DELETE' FROM __c WHERE cls = 7
UNION ALL SELECT c_custkey, h, 3, h * 100 + 1, 'UPDATE' FROM __c WHERE cls = 8
UNION ALL SELECT c_custkey, h, 3, h * 100 + 2, 'UPDATE' FROM __c WHERE cls = 8
UNION ALL SELECT c_custkey, h, 1, h * 100 + 1, 'UPDATE' FROM __c WHERE cls = 9
"""


def debounce_expected_sql() -> str:
    """The debounce semantics as a golden SQL spec: exactly which events the
    DebounceHandler emits for ``debounce_feed_sql`` (no timer flushes — the
    interval outlives the stream). Runs identically on Spark SQL and DuckDB."""
    return f"""
WITH __c AS ({_DEBOUNCE_BASE})
SELECT c_custkey AS key, h AS lsn, nev AS seq, h * 100 + nev AS arr, 'UPDATE' AS op,
       'flush_by_delete' AS flush_kind FROM __c WHERE cls <= 2
UNION ALL SELECT c_custkey, h, 50, h * 100 + 50, 'DELETE', 'immediate' FROM __c WHERE cls <= 2
UNION ALL SELECT c_custkey, h, 1, h * 100 + 1, 'DELETE', 'immediate' FROM __c WHERE cls = 3
UNION ALL SELECT c_custkey + 10000000, h, 1, h * 100 + 1, 'INSERT', 'immediate' FROM __c WHERE cls = 4
UNION ALL SELECT c_custkey + 10000000, h, 11, h * 100 + 11, 'UPDATE', 'flush_by_delete' FROM __c WHERE cls = 4
UNION ALL SELECT c_custkey + 10000000, h, 20, h * 100 + 20, 'DELETE', 'immediate' FROM __c WHERE cls = 4
UNION ALL SELECT c_custkey + 20000000, h, 1, h * 100 + 1, 'INSERT', 'immediate' FROM __c WHERE cls = 5
UNION ALL SELECT c_custkey, 0, 7, h * 100 + 2, 'UPDATE', 'flush_by_delete' FROM __c WHERE cls = 6
UNION ALL SELECT c_custkey, h, 20, h * 100 + 3, 'DELETE', 'immediate' FROM __c WHERE cls = 6
UNION ALL SELECT c_custkey, h, 5, h * 100 + 1, 'UPDATE', 'flush_by_delete' FROM __c WHERE cls = 7
UNION ALL SELECT c_custkey, h, 9, h * 100 + 9, 'DELETE', 'immediate' FROM __c WHERE cls = 7
UNION ALL SELECT c_custkey, h, 3, h * 100 + 1, 'UPDATE', 'flush_by_equal' FROM __c WHERE cls = 8
"""


def ddl_feed_sql() -> str:
    """Feed with an in-stream DDL event (SURVEY §2 A6, §7 P5): wave-1 UPDATEs
    touch c_acctbal only; then ``ALTER TABLE customer ADD COLUMN c_note text``
    (lsn 2^32+1 > every wave-1 hash lsn); wave-2 UPDATEs set the NEW column
    for cls 6/7 keys. Pre-DDL events never list c_note in ``present`` — the
    same presence encoding as unchanged TOAST — so one fold applies cleanly
    after the schema evolves. Pure integer arithmetic; one text, both engines.
    """
    return f"""
WITH __c AS ({_DEBOUNCE_BASE})
SELECT h AS lsn, 1 AS seq, h * 100 + 1 AS ord, 'UPDATE' AS op,
       CAST(NULL AS STRING) AS query,
       c_custkey,
       CAST(h % 100000 AS DOUBLE) / 100.0 AS c_acctbal,
       CAST(NULL AS STRING) AS c_note,
       'c_custkey,c_acctbal' AS present
FROM __c WHERE cls <= 2
UNION ALL
SELECT 4294967297, 1, 429496729701, 'DDL',
       'ALTER TABLE public.customer ADD COLUMN c_note text',
       CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS STRING), ''
UNION ALL
SELECT 4294967300 + c_custkey, 1, (4294967300 + c_custkey) * 100 + 1, 'UPDATE',
       CAST(NULL AS STRING),
       c_custkey,
       CAST(NULL AS DOUBLE),
       'note-' || CAST(c_custkey AS STRING),
       'c_custkey,c_note'
FROM __c WHERE cls IN (6, 7)
"""


FEEDS = {
    "customer": cdc_customer_sql,
    "orders": cdc_orders_sql,
    "lineitem": cdc_lineitem_sql,
}

FEED_KEYS = {
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "lineitem": ["l_orderkey", "l_linenumber"],
}


def cdc_documents_sql(dialect: str) -> str:
    """Change feed over ``documents`` (key doc_id) — the corpus-refresh
    fixture wiring the CDC surface to the curation surface.

    Event classes by cls = h % 10:
      0-2 → UPDATE rewriting the text (deterministic version suffix);
            ``lang`` TOAST-omitted when h % 11 = 0 (consumer must inherit),
            ``source`` explicitly NULLed when h % 7 = 0
      3   → DELETE (old key image only) — the doc leaves the corpus
      4   → INSERT of doc_id + 10_000_000 whose text is the base text plus
            a suffix — a deliberate near-duplicate the downstream dedup
            stage must catch

    Same portable-SQL contract as the other feeds (identical text on Spark
    SQL and DuckDB); ``commit_ts`` omitted — the apply fold orders on
    ``ord`` alone.
    """
    return """
WITH __docs AS (
  SELECT doc_id, text, lang, source,
         ((doc_id + 1) * 2654435761) % 4294967296 AS h
  FROM documents
)
SELECT h AS lsn, 1 AS seq, h * 100 + 1 AS ord, 'UPDATE' AS op,
       doc_id,
       text || ' update v' || CAST(h % 3 AS STRING) AS text,
       CASE WHEN h % 11 = 0 THEN CAST(NULL AS STRING) ELSE lang END AS lang,
       CASE WHEN h % 7 = 0 THEN CAST(NULL AS STRING) ELSE source END AS source,
       CAST(length(text || ' update v' || CAST(h % 3 AS STRING)) AS BIGINT) AS n_chars,
       CAST(NULL AS BIGINT) AS old_doc_id,
       CASE WHEN h % 11 = 0 THEN 'doc_id,text,source,n_chars'
            ELSE 'doc_id,text,lang,source,n_chars' END AS present
FROM __docs WHERE h % 10 <= 2
UNION ALL
SELECT h, 1, h * 100 + 1, 'DELETE', doc_id,
       CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS STRING),
       CAST(NULL AS BIGINT), doc_id, 'doc_id'
FROM __docs WHERE h % 10 = 3
UNION ALL
SELECT h, 1, h * 100 + 1, 'INSERT', doc_id + 10000000,
       text || ' fresh copy', lang, source,
       CAST(length(text || ' fresh copy') AS BIGINT),
       CAST(NULL AS BIGINT), 'doc_id,text,lang,source,n_chars'
FROM __docs WHERE h % 10 = 4
"""
