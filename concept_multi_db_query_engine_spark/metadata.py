"""Metadata model + O(1) index.

Mirrors the reference's metadata registry (METADATA.md:8-112): databases,
tables (dual naming apiName ↔ physicalName), columns, FK relations, external
CDC syncs, caches, and roles. Everything is declared/static — queries never
touch Spark schema inference (README.md:420-446).

Dataclasses accept either keyword construction or ``from_dict`` on the
camelCase JSON shapes the reference uses, so metadata configs can be written
as plain dicts (the reference loads metadata as JSON through async providers,
METADATA.md:150-215).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Literal

Engine = Literal["postgres", "clickhouse", "iceberg", "spark", "parquet"]
RelationType = Literal["many-to-one", "one-to-many", "one-to-one"]
Lag = Literal["seconds", "minutes", "hours"]

# freshness / lag ordering for the planner (reference README.md:251-252)
LAG_ORDER = {"realtime": 0, "seconds": 1, "minutes": 2, "hours": 3}


@dataclass
class DatabaseMeta:
    """METADATA.md:8-14."""

    id: str
    engine: str = "spark"
    trino_catalog: str | None = None

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "DatabaseMeta":
        return cls(
            id=d["id"],
            engine=d.get("engine", "spark"),
            trino_catalog=d.get("trinoCatalog"),
        )


@dataclass
class ColumnMeta:
    """METADATA.md:38-45."""

    api_name: str
    physical_name: str
    type: str
    nullable: bool = False
    masking_fn: str | None = None

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ColumnMeta":
        return cls(
            api_name=d["apiName"],
            physical_name=d.get("physicalName", d["apiName"]),
            type=d["type"],
            nullable=d.get("nullable", False),
            masking_fn=d.get("maskingFn"),
        )


@dataclass
class RelationMeta:
    """FK relation (METADATA.md:48-58): ``column`` on this table references
    ``references_table.references_column``."""

    column: str
    references_table: str
    references_column: str
    type: str = "many-to-one"

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "RelationMeta":
        refs = d["references"]
        return cls(
            column=d["column"],
            references_table=refs["table"],
            references_column=refs["column"],
            type=d.get("type", "many-to-one"),
        )


@dataclass
class TableMeta:
    """METADATA.md:20-28."""

    id: str
    api_name: str
    database: str
    physical_name: str
    columns: list[ColumnMeta]
    primary_key: list[str] = field(default_factory=list)
    relations: list[RelationMeta] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "TableMeta":
        return cls(
            id=d.get("id", d["apiName"]),
            api_name=d["apiName"],
            database=d["database"],
            physical_name=d.get("physicalName", d["apiName"]),
            columns=[
                c if isinstance(c, ColumnMeta) else ColumnMeta.from_dict(c)
                for c in d["columns"]
            ],
            primary_key=list(d.get("primaryKey", [])),
            relations=[
                r if isinstance(r, RelationMeta) else RelationMeta.from_dict(r)
                for r in d.get("relations", [])
            ],
        )


@dataclass
class ExternalSync:
    """CDC replica topology (METADATA.md:63-69)."""

    source_table: str
    target_database: str
    target_physical_name: str
    estimated_lag: str = "seconds"
    method: str = "debezium"

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ExternalSync":
        return cls(
            source_table=d["sourceTable"],
            target_database=d["targetDatabase"],
            target_physical_name=d["targetPhysicalName"],
            estimated_lag=d.get("estimatedLag", "seconds"),
            method=d.get("method", "debezium"),
        )


@dataclass
class CachedTableMeta:
    """METADATA.md:81-86: by-PK point lookups, key pattern like 'users:{id}'."""

    table_id: str
    key_pattern: str
    columns: list[str] | None = None

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "CachedTableMeta":
        return cls(
            table_id=d["tableId"],
            key_pattern=d["keyPattern"],
            columns=d.get("columns"),
        )


@dataclass
class CacheMeta:
    """METADATA.md:75-86."""

    id: str
    tables: list[CachedTableMeta]
    engine: str = "memory"

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "CacheMeta":
        return cls(
            id=d["id"],
            engine=d.get("engine", "memory"),
            tables=[
                t if isinstance(t, CachedTableMeta) else CachedTableMeta.from_dict(t)
                for t in d.get("tables", [])
            ],
        )


@dataclass
class TableRoleAccess:
    """METADATA.md:102-112."""

    table_id: str
    allowed_columns: list[str] | str = "*"
    masked_columns: list[str] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "TableRoleAccess":
        return cls(
            table_id=d["tableId"],
            allowed_columns=d.get("allowedColumns", "*"),
            masked_columns=list(d.get("maskedColumns", [])),
        )


@dataclass
class RoleMeta:
    """METADATA.md:102-112; ``tables='*'`` = all tables, all columns,
    no masking."""

    id: str
    tables: list[TableRoleAccess] | str = "*"

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "RoleMeta":
        tables = d.get("tables", "*")
        if isinstance(tables, list):
            tables = [
                t if isinstance(t, TableRoleAccess) else TableRoleAccess.from_dict(t)
                for t in tables
            ]
        return cls(id=d["id"], tables=tables)


@dataclass
class Metadata:
    """Top-level metadata config (METADATA.md:138-147)."""

    databases: list[DatabaseMeta]
    tables: list[TableMeta]
    syncs: list[ExternalSync] = field(default_factory=list)
    caches: list[CacheMeta] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Metadata":
        return cls(
            databases=[
                x if isinstance(x, DatabaseMeta) else DatabaseMeta.from_dict(x)
                for x in d.get("databases", [])
            ],
            tables=[
                x if isinstance(x, TableMeta) else TableMeta.from_dict(x)
                for x in d.get("tables", [])
            ],
            syncs=[
                x if isinstance(x, ExternalSync) else ExternalSync.from_dict(x)
                for x in d.get("externalSyncs", d.get("syncs", []))
            ],
            caches=[
                x if isinstance(x, CacheMeta) else CacheMeta.from_dict(x)
                for x in d.get("caches", [])
            ],
        )


@dataclass(frozen=True)
class ResolvedRelation:
    """A usable join edge between two tables, after bidirectional lookup.

    ``fk_table.fk_column`` references ``pk_table.pk_column``; ``many_side``
    tells which end can contribute multiple rows per key (drives the counted-
    EXISTS compilation).
    """

    fk_table: str  # table id holding the FK
    fk_column: str  # apiName on fk_table
    pk_table: str  # table id holding the referenced column
    pk_column: str  # apiName on pk_table
    type: str


class MetadataIndex:
    """Prebuilt O(1) lookup maps (reference README.md:152-158: six Maps built
    at init, atomically swapped on reload). Pure Python, zero Spark."""

    def __init__(self, metadata: Metadata, roles: list[RoleMeta]):
        self.metadata = metadata
        self.roles = roles

        self.databases_by_id: dict[str, DatabaseMeta] = {
            d.id: d for d in metadata.databases
        }
        self.tables_by_api: dict[str, TableMeta] = {
            t.api_name: t for t in metadata.tables
        }
        self.tables_by_id: dict[str, TableMeta] = {t.id: t for t in metadata.tables}
        self.columns_by_table: dict[str, dict[str, ColumnMeta]] = {
            t.id: {c.api_name: c for c in t.columns} for t in metadata.tables
        }
        self.roles_by_id: dict[str, RoleMeta] = {r.id: r for r in roles}
        self.syncs_by_source: dict[str, list[ExternalSync]] = {}
        for s in metadata.syncs:
            self.syncs_by_source.setdefault(s.source_table, []).append(s)
        self.cache_by_table: dict[str, tuple[CacheMeta, CachedTableMeta]] = {}
        for c in metadata.caches:
            for ct in c.tables:
                self.cache_by_table[ct.table_id] = (c, ct)

        # bidirectional relation edges: (table_id_a, table_id_b) → relation
        self._edges: dict[tuple[str, str], ResolvedRelation] = {}
        for t in metadata.tables:
            for r in t.relations:
                ref = self.tables_by_api.get(r.references_table) or self.tables_by_id.get(
                    r.references_table
                )
                if ref is None:
                    continue  # config validation reports this
                edge = ResolvedRelation(
                    fk_table=t.id,
                    fk_column=r.column,
                    pk_table=ref.id,
                    pk_column=r.references_column,
                    type=r.type,
                )
                # both directions resolve to the same edge (METADATA.md:48-58)
                self._edges.setdefault((t.id, ref.id), edge)
                self._edges.setdefault((ref.id, t.id), edge)

    def table(self, api_name: str) -> TableMeta | None:
        return self.tables_by_api.get(api_name)

    def column(self, table_id: str, api_name: str) -> ColumnMeta | None:
        cols = self.columns_by_table.get(table_id)
        return cols.get(api_name) if cols else None

    def relation_between(
        self, table_id_a: str, table_id_b: str
    ) -> ResolvedRelation | None:
        """Bidirectional FK lookup used by join + EXISTS resolution."""
        return self._edges.get((table_id_a, table_id_b))

    def find_relation_to_any(
        self, new_table_id: str, existing_table_ids: list[str]
    ) -> tuple[ResolvedRelation, str] | None:
        """Transitive join resolution (QUERY.md:50-53): the new table may
        relate to the ``from`` table or any already-joined table; first match
        in declaration order wins. Returns (edge, intermediary_table_id)."""
        for existing in existing_table_ids:
            edge = self.relation_between(new_table_id, existing)
            if edge is not None:
                return edge, existing
        return None

    def replicas_of(self, table_id: str) -> list[ExternalSync]:
        return self.syncs_by_source.get(table_id, [])
