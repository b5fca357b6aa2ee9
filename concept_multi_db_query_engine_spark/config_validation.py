"""Config validation — runs at init/reload, collects ALL issues into one
ConfigError (reference README.md:338-347, 420-431; STAGES.md:62-83).

Codes: INVALID_API_NAME, DUPLICATE_API_NAME, INVALID_REFERENCE,
INVALID_RELATION, INVALID_SYNC, INVALID_CACHE.
"""

from __future__ import annotations

import re

from . import coltypes
from .errors import (
    DUPLICATE_API_NAME,
    INVALID_API_NAME,
    INVALID_CACHE,
    INVALID_REFERENCE,
    INVALID_RELATION,
    INVALID_SYNC,
    ConfigError,
    ErrorItem,
)
from .metadata import Metadata, RoleMeta

# reference README.md:420-431: ^[a-z][a-zA-Z0-9]*$, 1-64 chars.
STRICT_API_NAME = re.compile(r"^[a-z][a-zA-Z0-9]{0,63}$")
# engine extension: allow snake_case apiNames (used for physical-style
# registries like the TPC-H fixture tables where apiName == physicalName).
RELAXED_API_NAME = re.compile(r"^[a-z][a-zA-Z0-9_]{0,63}$")

# 29 reserved words (README.md:420-431 cites "~29 reserved words")
RESERVED_WORDS = frozenset(
    {
        "select", "from", "where", "join", "group", "order", "limit",
        "offset", "having", "table", "column", "and", "or", "not", "in",
        "like", "between", "exists", "count", "sum", "avg", "min", "max",
        "distinct", "null", "true", "false", "as", "by",
    }
)


def validate_config(
    metadata: Metadata,
    roles: list[RoleMeta],
    *,
    strict_api_names: bool = True,
) -> None:
    """Raise ConfigError with every issue collected, or return None."""
    errors: list[ErrorItem] = []
    pattern = STRICT_API_NAME if strict_api_names else RELAXED_API_NAME

    def check_name(name: str, where: str) -> None:
        if not isinstance(name, str) or not pattern.match(name):
            errors.append(
                ErrorItem(
                    INVALID_API_NAME,
                    f"invalid apiName '{name}' in {where}",
                    {"apiName": name, "where": where},
                )
            )
        elif name.lower() in RESERVED_WORDS:
            errors.append(
                ErrorItem(
                    INVALID_API_NAME,
                    f"reserved apiName '{name}' in {where}",
                    {"apiName": name, "where": where},
                )
            )

    db_ids = set()
    for db in metadata.databases:
        if db.id in db_ids:
            errors.append(
                ErrorItem(DUPLICATE_API_NAME, f"duplicate database id '{db.id}'")
            )
        db_ids.add(db.id)

    table_apis: set[str] = set()
    table_ids: set[str] = set()
    for t in metadata.tables:
        check_name(t.api_name, f"table '{t.id}'")
        if t.api_name in table_apis:
            errors.append(
                ErrorItem(
                    DUPLICATE_API_NAME,
                    f"duplicate table apiName '{t.api_name}'",
                    {"apiName": t.api_name},
                )
            )
        table_apis.add(t.api_name)
        table_ids.add(t.id)
        if t.database not in db_ids:
            errors.append(
                ErrorItem(
                    INVALID_REFERENCE,
                    f"table '{t.id}' references unknown database '{t.database}'",
                    {"table": t.id, "database": t.database},
                )
            )
        col_apis: set[str] = set()
        for c in t.columns:
            check_name(c.api_name, f"column '{t.id}.{c.api_name}'")
            if c.api_name in col_apis:
                errors.append(
                    ErrorItem(
                        DUPLICATE_API_NAME,
                        f"duplicate column apiName '{c.api_name}' in table '{t.id}'",
                        {"table": t.id, "apiName": c.api_name},
                    )
                )
            col_apis.add(c.api_name)
            if c.type not in coltypes.ALL_TYPES:
                errors.append(
                    ErrorItem(
                        INVALID_REFERENCE,
                        f"column '{t.id}.{c.api_name}' has unknown type '{c.type}'",
                        {"table": t.id, "column": c.api_name, "type": c.type},
                    )
                )
        for pk in t.primary_key:
            if pk not in col_apis:
                errors.append(
                    ErrorItem(
                        INVALID_REFERENCE,
                        f"primary key column '{pk}' not found in table '{t.id}'",
                        {"table": t.id, "column": pk},
                    )
                )

    # relations (need the full table set first)
    by_api = {t.api_name: t for t in metadata.tables}
    by_id = {t.id: t for t in metadata.tables}
    for t in metadata.tables:
        own_cols = {c.api_name for c in t.columns}
        for r in t.relations:
            if r.column not in own_cols:
                errors.append(
                    ErrorItem(
                        INVALID_RELATION,
                        f"relation column '{r.column}' not found in table '{t.id}'",
                        {"table": t.id, "column": r.column},
                    )
                )
            target = by_api.get(r.references_table) or by_id.get(r.references_table)
            if target is None:
                errors.append(
                    ErrorItem(
                        INVALID_RELATION,
                        f"relation on '{t.id}' references unknown table "
                        f"'{r.references_table}'",
                        {"table": t.id, "references": r.references_table},
                    )
                )
            elif r.references_column not in {c.api_name for c in target.columns}:
                errors.append(
                    ErrorItem(
                        INVALID_RELATION,
                        f"relation on '{t.id}' references unknown column "
                        f"'{r.references_table}.{r.references_column}'",
                        {"table": t.id, "references": r.references_table,
                         "column": r.references_column},
                    )
                )
            if r.type not in ("many-to-one", "one-to-many", "one-to-one"):
                errors.append(
                    ErrorItem(
                        INVALID_RELATION,
                        f"relation on '{t.id}' has invalid type '{r.type}'",
                        {"table": t.id, "type": r.type},
                    )
                )

    for s in metadata.syncs:
        if s.source_table not in table_ids:
            errors.append(
                ErrorItem(
                    INVALID_SYNC,
                    f"sync source table '{s.source_table}' not found",
                    {"sourceTable": s.source_table},
                )
            )
        if s.target_database not in db_ids:
            errors.append(
                ErrorItem(
                    INVALID_SYNC,
                    f"sync target database '{s.target_database}' not found",
                    {"targetDatabase": s.target_database},
                )
            )
        if s.estimated_lag not in ("seconds", "minutes", "hours"):
            errors.append(
                ErrorItem(
                    INVALID_SYNC,
                    f"sync on '{s.source_table}' has invalid lag "
                    f"'{s.estimated_lag}'",
                    {"sourceTable": s.source_table, "lag": s.estimated_lag},
                )
            )

    for cache in metadata.caches:
        for ct in cache.tables:
            t = by_id.get(ct.table_id)
            if t is None:
                errors.append(
                    ErrorItem(
                        INVALID_CACHE,
                        f"cache '{cache.id}' references unknown table "
                        f"'{ct.table_id}'",
                        {"cache": cache.id, "table": ct.table_id},
                    )
                )
                continue
            placeholders = re.findall(r"\{([^}]+)\}", ct.key_pattern)
            for p in placeholders:
                if p not in {c.api_name for c in t.columns}:
                    errors.append(
                        ErrorItem(
                            INVALID_CACHE,
                            f"cache key pattern placeholder '{p}' is not a "
                            f"column of '{ct.table_id}'",
                            {"cache": cache.id, "placeholder": p},
                        )
                    )
            if ct.columns:
                cols = {c.api_name for c in t.columns}
                for c in ct.columns:
                    if c not in cols:
                        errors.append(
                            ErrorItem(
                                INVALID_CACHE,
                                f"cached column '{c}' not found in table "
                                f"'{ct.table_id}'",
                                {"cache": cache.id, "column": c},
                            )
                        )

    role_ids: set[str] = set()
    for role in roles:
        if role.id in role_ids:
            errors.append(
                ErrorItem(DUPLICATE_API_NAME, f"duplicate role id '{role.id}'")
            )
        role_ids.add(role.id)
        if role.tables == "*":
            continue
        for ta in role.tables:  # type: ignore[union-attr]
            t = by_id.get(ta.table_id)
            if t is None:
                errors.append(
                    ErrorItem(
                        INVALID_REFERENCE,
                        f"role '{role.id}' references unknown table "
                        f"'{ta.table_id}'",
                        {"role": role.id, "table": ta.table_id},
                    )
                )
                continue
            cols = {c.api_name for c in t.columns}
            allowed = ta.allowed_columns
            if allowed != "*":
                for c in allowed:
                    if c not in cols:
                        errors.append(
                            ErrorItem(
                                INVALID_REFERENCE,
                                f"role '{role.id}' allows unknown column "
                                f"'{ta.table_id}.{c}'",
                                {"role": role.id, "table": ta.table_id, "column": c},
                            )
                        )
            for c in ta.masked_columns:
                if c not in cols:
                    errors.append(
                        ErrorItem(
                            INVALID_REFERENCE,
                            f"role '{role.id}' masks unknown column "
                            f"'{ta.table_id}.{c}'",
                            {"role": role.id, "table": ta.table_id, "column": c},
                        )
                    )

    if errors:
        raise ConfigError(
            f"configuration invalid: {len(errors)} issue(s)", errors=errors
        )
