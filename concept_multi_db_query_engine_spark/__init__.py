"""PySpark-native rebuild of making-ventures/concept-multi-db-query-engine.

A metadata-driven federated query engine: applications submit a *typed query
object* (not SQL) using logical apiNames; the engine validates it against
registered metadata + role-based access control, plans which source serves it,
translates logical names to physical names, builds a Spark DataFrame plan
(Catalyst handles all physical execution), and maps results back to apiNames
with column masking applied.

Reference behavior spec: /root/reference/README.md:36-82 (pipeline),
QUERY.md:8-112 (DSL). This is a ground-up Spark-first implementation, not a
port — Spark replaces Postgres/ClickHouse/Trino as both the executor and the
federation layer.
"""

from .errors import (
    ConfigError,
    ConnectionError,
    ExecutionError,
    MultiDbError,
    PlannerError,
    ProviderError,
    ValidationError,
)
from .metadata import (
    CachedTableMeta,
    CacheMeta,
    ColumnMeta,
    DatabaseMeta,
    ExternalSync,
    Metadata,
    MetadataIndex,
    RelationMeta,
    RoleMeta,
    TableMeta,
    TableRoleAccess,
)
from .dialects import (
    DIALECTS,
    ClickHouseRenderer,
    PostgresRenderer,
    TrinoRenderer,
    renderer_for,
)
from .http_client import MultiDbClient
from .pipeline import MultiDb, create_multi_db
from .providers import (
    MetadataProvider,
    RoleProvider,
    static_metadata,
    static_roles,
)
from .sources import (
    CatalogSource,
    FormatSource,
    MemorySource,
    ParquetSource,
    SourceRegistry,
)

__all__ = [
    "CacheMeta",
    "CatalogSource",
    "FormatSource",
    "ClickHouseRenderer",
    "DIALECTS",
    "CachedTableMeta",
    "ColumnMeta",
    "ConfigError",
    "ConnectionError",
    "DatabaseMeta",
    "ExecutionError",
    "ExternalSync",
    "MemorySource",
    "Metadata",
    "MetadataIndex",
    "MultiDb",
    "MetadataProvider",
    "MultiDbClient",
    "MultiDbError",
    "ParquetSource",
    "PlannerError",
    "PostgresRenderer",
    "ProviderError",
    "RelationMeta",
    "RoleMeta",
    "RoleProvider",
    "SourceRegistry",
    "TableMeta",
    "TableRoleAccess",
    "TrinoRenderer",
    "ValidationError",
    "create_multi_db",
    "renderer_for",
    "static_metadata",
    "static_roles",
]

__version__ = "0.1.0"
