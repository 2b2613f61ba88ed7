"""DDL replay helpers.

Reference: ``handleDDL``/``parseDDL`` (pkg/sink/postgres.go:296-393): DDL
statements that themselves perform DML (CREATE TABLE AS / SELECT INTO /
INSERT...) put their target relations in a *skip set* — subsequent row events
for those relations WITHIN THE SAME TRANSACTION are duplicates of work the DDL
already did, and are dropped. Consecutive identical DDL is deduped by crc32.

Spark restatement: the skip set is an anti-join of changes against DDL-touched
(tx, relation) pairs; schema evolution itself is applied to the target table's
schema registry (catalog.py) — at scale, a Delta/Iceberg ``ALTER TABLE``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Schema evolution (SURVEY §7 P5): the reference executes captured DDL against
# the target and refreshes its column cache (pkg/sink/postgres.go:357-393,
# pkg/decode/schema.go refresh on DDL events). The Spark analog: evolve the
# snapshot's schema (add NULL-filled / drop columns) and the apply column
# list. Only the ALTER TABLE subset that affects the row shape is parsed —
# the reference parses full SQL with pg_query but likewise only *reacts* to
# relation/column effects.

_PG_TO_SPARK_TYPE = {
    "text": "string",
    "varchar": "string",
    "character varying": "string",
    "bpchar": "string",
    "bool": "boolean",
    "boolean": "boolean",
    "int2": "smallint",
    "smallint": "smallint",
    "int4": "int",
    "int": "int",
    "integer": "int",
    "int8": "bigint",
    "bigint": "bigint",
    "float4": "float",
    "real": "float",
    "float8": "double",
    "double precision": "double",
    "date": "date",
    "timestamp": "timestamp",
    "timestamptz": "timestamp",
    "jsonb": "string",
    "json": "string",
    "uuid": "string",
    "bytea": "binary",
}

_ALTER_RE = re.compile(r"^\s*ALTER\s+TABLE\s+(?:(\w+)\.)?(\w+)\s+(.+)$", re.I | re.S)
_ADD_RE = re.compile(r"^ADD\s+(?:COLUMN\s+)?(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+([\w ]+?)\s*$", re.I)
_DROP_RE = re.compile(r"^DROP\s+(?:COLUMN\s+)?(?:IF\s+EXISTS\s+)?(\w+)\s*$", re.I)


@dataclass
class AlterTable:
    schema: str | None
    table: str
    add: list[tuple[str, str]] = field(default_factory=list)  # (col, spark type)
    drop: list[str] = field(default_factory=list)


def parse_alter(query: str) -> AlterTable | None:
    """Parse ``ALTER TABLE [schema.]t ADD/DROP COLUMN ...`` (comma-separated
    actions). Returns None for DDL that doesn't change row shape."""
    m = _ALTER_RE.match(query.strip().rstrip(";"))
    if not m:
        return None
    out = AlterTable(schema=m.group(1), table=m.group(2))
    for action in re.split(r",(?![^()]*\))", m.group(3)):
        action = action.strip()
        if am := _ADD_RE.match(action):
            pg_type = am.group(2).strip().lower()
            out.add.append((am.group(1), _PG_TO_SPARK_TYPE.get(pg_type, "string")))
        elif dm := _DROP_RE.match(action):
            out.drop.append(dm.group(1))
    return out if (out.add or out.drop) else None


def evolve_snapshot(
    snapshot: DataFrame, cols: list[str], alter: AlterTable
) -> tuple[DataFrame, list[str]]:
    """Apply an AlterTable to a snapshot DataFrame + its apply column list:
    added columns appear NULL-filled (exactly what the target table shows
    after ALTER TABLE ADD COLUMN), dropped ones disappear."""
    out = snapshot
    new_cols = list(cols)
    for col, spark_type in alter.add:
        if col not in out.columns:
            out = out.withColumn(col, F.lit(None).cast(spark_type))
            new_cols.append(col)
    for col in alter.drop:
        if col in out.columns:
            out = out.drop(col)
            new_cols = [c for c in new_cols if c != col]
    return out, new_cols


# PG type name → wire OID (the subset the decode registry supports,
# python/pgcapture/decoders.py:157-225)
_PG_TO_OID = {
    "bool": 16,
    "boolean": 16,
    "bytea": 17,
    "int8": 20,
    "bigint": 20,
    "int2": 21,
    "smallint": 21,
    "int4": 23,
    "int": 23,
    "integer": 23,
    "text": 25,
    "json": 114,
    "float4": 700,
    "real": 700,
    "float8": 701,
    "double precision": 701,
    "bpchar": 1042,
    "varchar": 1043,
    "character varying": 1043,
    "date": 1082,
    "timestamp": 1114,
    "timestamptz": 1184,
    "uuid": 2950,
    "jsonb": 3802,
}

_CREATE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?:(\w+)\.)?(\w+)\s*\((.*)\)\s*$",
    re.I | re.S,
)
_PK_RE = re.compile(r"^PRIMARY\s+KEY\s*\(([^)]+)\)$", re.I)


@dataclass
class CreateTable:
    """A learned relation: the in-stream Relation-message role
    (pkg/decode/schema.go:114-159 — PGXSchemaLoader refresh)."""

    schema: str | None
    table: str
    fields: list[tuple[str, int]] = field(default_factory=list)  # (col, oid)
    key: list[str] = field(default_factory=list)


def parse_create(query: str) -> CreateTable | None:
    """Parse ``CREATE TABLE [schema.]t (col type [PRIMARY KEY], ...,
    [PRIMARY KEY (a, b)])`` into a relation descriptor with wire OIDs."""
    m = _CREATE_RE.match(query.strip().rstrip(";"))
    if not m:
        return None
    out = CreateTable(schema=m.group(1), table=m.group(2))
    for item in re.split(r",(?![^()]*\))", m.group(3)):
        item = item.strip()
        if pk := _PK_RE.match(item):
            out.key = [c.strip() for c in pk.group(1).split(",")]
            continue
        toks = item.split()
        if len(toks) < 2:
            continue
        name = toks[0]
        inline_pk = "primary" in (t.lower() for t in toks)
        type_toks = []
        for t in toks[1:]:
            if t.lower() in ("primary", "key", "not", "null", "unique", "default"):
                break
            type_toks.append(t.lower())
        pg_type = " ".join(type_toks)
        out.fields.append((name, _PG_TO_OID.get(pg_type, 25)))
        if inline_pk:
            out.key.append(name)
    return out if out.fields else None


def ddl_skip_filter(
    changes: DataFrame,
    ddl_touched: DataFrame,
    tx_col: str = "lsn",
    rel_col: str = "table_name",
) -> DataFrame:
    """Drop change events whose (transaction, relation) appears in the DDL
    skip set — LEFT ANTI join, broadcast (the skip set is tiny)."""
    return changes.join(
        F.broadcast(ddl_touched.select(tx_col, rel_col).distinct()),
        on=[tx_col, rel_col],
        how="left_anti",
    )


def dedupe_consecutive_ddl(ddl: DataFrame) -> DataFrame:
    """Dedupe identical consecutive DDL statements (reference crc32 dedupe,
    pkg/sink/postgres.go:304-312): keep a DDL event only if the previous event
    in (lsn, seq) order has a different statement."""
    from pyspark.sql import Window as W

    w = W.orderBy("lsn", "seq")  # global order — DDL streams are tiny
    return (
        ddl.withColumn("_prev", F.lag("query").over(w))
        .where(F.col("_prev").isNull() | (F.col("_prev") != F.col("query")))
        .drop("_prev")
    )


def parse_alter_oids(query: str) -> tuple[str, list[tuple[str, int]], list[str]] | None:
    """ALTER TABLE parsed to wire OIDs (for the dynamic relation registry):
    returns (table, added [(col, oid)], dropped [col]) or None."""
    m = _ALTER_RE.match(query.strip().rstrip(";"))
    if not m:
        return None
    table = m.group(2)
    add: list[tuple[str, int]] = []
    drop: list[str] = []
    for action in re.split(r",(?![^()]*\))", m.group(3)):
        action = action.strip()
        if am := _ADD_RE.match(action):
            pg_type = am.group(2).strip().lower()
            add.append((am.group(1), _PG_TO_OID.get(pg_type, 25)))
        elif dm := _DROP_RE.match(action):
            drop.append(dm.group(1))
    return (table, add, drop) if (add or drop) else None
