"""Access control: scope algebra + masking resolution.

Reference semantics (METADATA.md:90-99, QUERY.md:118-126):

- Within a scope (user / service): UNION of role grants. Masking follows the
  union — if ANY role in the scope provides unmasked access to a column, the
  column is unmasked in that scope.
- Between scopes: INTERSECTION. A column is accessible only if every present
  scope allows it; it is masked if ANY scope masks it.
- An omitted scope imposes no restriction. An EMPTY role list is different:
  zero roles → zero permissions → all tables denied.

Pure Python set algebra over metadata — zero Spark, zero I/O.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from .errors import UNKNOWN_ROLE, ErrorItem
from .metadata import MetadataIndex, RoleMeta


@dataclass
class TableAccess:
    """Effective access to one table: which columns may be selected and which
    of those must be masked."""

    allowed: set[str]
    masked: set[str]


@dataclass
class EffectiveAccess:
    """Resolved access for one query context. ``unrestricted`` is True when
    no scope was provided at all (no ACL in play)."""

    unrestricted: bool
    tables: dict[str, TableAccess] = field(default_factory=dict)

    def can_read_table(self, table_id: str) -> bool:
        return self.unrestricted or table_id in self.tables

    def allowed_columns(self, table_id: str, all_columns: list[str]) -> list[str]:
        if self.unrestricted:
            return list(all_columns)
        ta = self.tables.get(table_id)
        if ta is None:
            return []
        return [c for c in all_columns if c in ta.allowed]

    def can_read_column(self, table_id: str, column: str) -> bool:
        if self.unrestricted:
            return True
        ta = self.tables.get(table_id)
        return ta is not None and column in ta.allowed

    def is_masked(self, table_id: str, column: str) -> bool:
        if self.unrestricted:
            return False
        ta = self.tables.get(table_id)
        return ta is not None and column in ta.masked


def _scope_union(
    index: MetadataIndex, roles: list[RoleMeta]
) -> dict[str, TableAccess]:
    """UNION within a scope: accumulate allowed columns; a column is masked in
    the scope only if every role that grants it masks it."""
    out: dict[str, TableAccess] = {}
    # per table: columns granted unmasked by at least one role
    unmasked: dict[str, set[str]] = {}
    for role in roles:
        if role.tables == "*":
            for t in index.metadata.tables:
                cols = {c.api_name for c in t.columns}
                acc = out.setdefault(t.id, TableAccess(set(), set()))
                acc.allowed |= cols
                unmasked.setdefault(t.id, set()).update(cols)
            continue
        for ta in role.tables:  # type: ignore[union-attr]
            t = index.tables_by_id.get(ta.table_id)
            if t is None:
                continue
            all_cols = {c.api_name for c in t.columns}
            allowed = (
                all_cols
                if ta.allowed_columns == "*"
                else set(ta.allowed_columns) & all_cols
            )
            masked_here = set(ta.masked_columns) & allowed
            acc = out.setdefault(t.id, TableAccess(set(), set()))
            acc.allowed |= allowed
            unmasked.setdefault(t.id, set()).update(allowed - masked_here)
    for table_id, acc in out.items():
        acc.masked = acc.allowed - unmasked.get(table_id, set())
    return out


def resolve_access(
    index: MetadataIndex, context: dict[str, Any] | None
) -> tuple[EffectiveAccess, list[ErrorItem]]:
    """Compute effective access for an execution context
    ``{'roles': {'user': [...], 'service': [...]}}``.

    Returns (access, errors) — unknown role ids are collected as UNKNOWN_ROLE
    items (validation rule 13, README.md:283) rather than raised here, so the
    validator can report them alongside other issues.
    """
    errors: list[ErrorItem] = []
    scopes = (context or {}).get("roles") or {}
    scope_results: list[dict[str, TableAccess]] = []

    for scope_name in ("user", "service"):
        role_ids = scopes.get(scope_name)
        if role_ids is None:
            continue  # omitted scope = no restriction
        roles: list[RoleMeta] = []
        for rid in role_ids:
            role = index.roles_by_id.get(rid)
            if role is None:
                errors.append(
                    ErrorItem(
                        UNKNOWN_ROLE,
                        f"unknown role '{rid}' in scope '{scope_name}'",
                        {"role": rid, "scope": scope_name},
                    )
                )
            else:
                roles.append(role)
        # empty list (or all-unknown) = zero permissions for this scope
        scope_results.append(_scope_union(index, roles))

    if not scope_results:
        return EffectiveAccess(unrestricted=True), errors

    # INTERSECTION between scopes; masking from any scope is preserved
    table_ids = set(scope_results[0])
    for s in scope_results[1:]:
        table_ids &= set(s)
    tables: dict[str, TableAccess] = {}
    for tid in table_ids:
        allowed = set.intersection(*(s[tid].allowed for s in scope_results))
        if not allowed:
            continue
        masked = set.union(*(s[tid].masked & allowed for s in scope_results))
        tables[tid] = TableAccess(allowed=allowed, masked=masked)
    return EffectiveAccess(unrestricted=False, tables=tables), errors
