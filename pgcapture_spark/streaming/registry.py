"""Dynamic relation registry — in-stream schema learning.

The reference's ``PGXSchemaLoader`` refreshes its type/identity caches when
relation-changing events arrive, so a table never seen at startup still
decodes and applies (pkg/decode/schema.go:114-159; Relation messages
pkg/decode/pgoutput.go). The Spark analog: a registry of
``table → (key cols, [(col, oid)])`` seeded from the static catalog and
extended mid-stream by CREATE TABLE DDL events; it serializes into the
multi-table state manifest so a restart rehydrates the learned relations
(replayed batches are skipped, so the DDL would not be re-observed).
"""

from __future__ import annotations

from pgcapture_spark.functions.pgtypes import spark_type_for_oid
from pgcapture_spark.operators.ddl import CreateTable, parse_alter_oids, parse_create


class RelationRegistry:
    def __init__(self) -> None:
        # table → {"key": [...], "fields": [(name, oid), ...]}
        self._rel: dict[str, dict] = {}

    # -- learning ------------------------------------------------------------
    def learn_static(self, table: str, key: list[str], fields: list[tuple[str, int]]) -> None:
        self._rel[table] = {"key": list(key), "fields": [list(f) for f in fields]}

    def learn_create(self, create: CreateTable) -> bool:
        """Register a relation from a CREATE TABLE event; idempotent (the
        reference's refresh also overwrites the cache entry). Returns True if
        the table is new."""
        new = create.table not in self._rel
        self.learn_static(create.table, create.key, create.fields)
        return new

    def learn_relation(
        self, table: str, columns: list[tuple[str, int, bool]]
    ) -> bool:
        """In-band Relation ('R') message: the column list arrives as stream
        data with per-column key flags — no DDL text involved, mirroring the
        pgoutput Relation message (pkg/decode/pgoutput.go:93-117: oid,
        namespace, name, replica identity, flagged column list) that refreshes
        the reference's schema cache independently of any DDL
        (pkg/decode/schema.go:114-159). ``columns`` is
        ``[(name, type_oid, is_key)]``; idempotent — a re-sent Relation
        message overwrites the cache entry. Returns True if the table is
        new."""
        new = table not in self._rel
        self.learn_static(
            table,
            [n for n, _, is_key in columns if is_key],
            [(n, oid) for n, oid, _ in columns],
        )
        return new

    def learn_ddl(self, query: str) -> str | None:
        """Feed one DDL statement; returns the table name if a NEW relation
        materialized, else None. ALTER TABLE against a KNOWN relation evolves
        its field list in place (the cache-refresh path,
        pkg/decode/schema.go:114-159 / pkg/sink/postgres.go:357-393)."""
        ct = parse_create(query)
        if ct is not None:
            return ct.table if self.learn_create(ct) else None
        alt = parse_alter_oids(query)
        if alt is not None and alt[0] in self._rel:
            table, add, drop = alt
            rel = self._rel[table]
            known = {n for n, _ in rel["fields"]}
            for name, oid in add:
                if name not in known:
                    rel["fields"].append([name, oid])
            dropset = set(drop) - set(rel["key"])  # identity columns never drop
            rel["fields"] = [f for f in rel["fields"] if f[0] not in dropset]
        return None

    # -- lookup --------------------------------------------------------------
    def tables(self) -> list[str]:
        return list(self._rel)

    def key(self, table: str) -> list[str]:
        return list(self._rel[table]["key"])

    def fields(self, table: str) -> list[tuple[str, int]]:
        return [tuple(f) for f in self._rel[table]["fields"]]

    def value_cols(self, table: str) -> list[str]:
        k = set(self.key(table))
        return [n for n, _ in self.fields(table) if n not in k]

    def spark_schema(self, table: str) -> str:
        return ", ".join(
            f"{name} {spark_type_for_oid(oid)}" for name, oid in self.fields(table)
        )

    def empty_snapshot(self, spark, table: str):
        return spark.createDataFrame([], self.spark_schema(table))

    # -- persistence (manifest round-trip) ------------------------------------
    def to_dict(self) -> dict:
        return {t: {"key": r["key"], "fields": r["fields"]} for t, r in self._rel.items()}

    @classmethod
    def from_dict(cls, d: dict) -> RelationRegistry:
        reg = cls()
        for t, r in d.items():
            reg.learn_static(t, r["key"], [tuple(f) for f in r["fields"]])
        return reg
