"""Error taxonomy.

Mirrors the reference's six error classes (reference README.md:326-414):
every error carries a machine-readable ``code``, an ``errors[]`` list of
item-level issues (all collected, never one-at-a-time — README.md:286), and a
``to_json()`` wire shape so typed errors can be reconstructed across an HTTP
boundary (reference HTTP_CLIENT.md:78-83).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass
class ErrorItem:
    """One validation/config issue. ``code`` is the stable identifier the
    contract suite asserts on (e.g. UNKNOWN_TABLE, INVALID_FILTER)."""

    code: str
    message: str
    details: dict[str, Any] | None = None

    def to_json(self) -> dict[str, Any]:
        out: dict[str, Any] = {"code": self.code, "message": self.message}
        if self.details is not None:
            out["details"] = self.details
        return out


class MultiDbError(Exception):
    """Base class. ``code`` discriminates the family; ``errors`` carries the
    collected item-level issues."""

    code = "MULTI_DB_ERROR"

    def __init__(self, message: str, errors: list[ErrorItem] | None = None):
        super().__init__(message)
        self.message = message
        self.errors: list[ErrorItem] = errors or []

    def to_json(self) -> dict[str, Any]:
        return {
            "code": self.code,
            "message": self.message,
            "errors": [e.to_json() for e in self.errors],
        }

    @property
    def error_codes(self) -> list[str]:
        return [e.code for e in self.errors]


class ValidationError(MultiDbError):
    """Query failed one or more of the 14 validation rules
    (reference README.md:271-284). HTTP 400."""

    code = "VALIDATION_ERROR"


class ConfigError(MultiDbError):
    """Metadata/role configuration invalid at init or reload
    (reference README.md:338-347). HTTP 400."""

    code = "CONFIG_ERROR"


class PlannerError(MultiDbError):
    """No strategy can serve the query (reference README.md:262-266).
    HTTP 422."""

    code = "PLANNER_ERROR"


class ExecutionError(MultiDbError):
    """Backend execution failed. HTTP 500."""

    code = "EXECUTION_ERROR"


class ConnectionError(MultiDbError):  # noqa: A001 - mirrors reference class name
    """One or more sources unreachable at init/health-check. HTTP 503."""

    code = "CONNECTION_ERROR"


class ProviderError(MultiDbError):
    """Metadata/role provider load failed. HTTP 503."""

    code = "PROVIDER_ERROR"


# Item-level codes (query validation rules 1-14, README.md:271-284)
UNKNOWN_TABLE = "UNKNOWN_TABLE"
UNKNOWN_COLUMN = "UNKNOWN_COLUMN"
ACCESS_DENIED = "ACCESS_DENIED"
INVALID_FILTER = "INVALID_FILTER"
INVALID_VALUE = "INVALID_VALUE"
INVALID_JOIN = "INVALID_JOIN"
INVALID_GROUP_BY = "INVALID_GROUP_BY"
INVALID_HAVING = "INVALID_HAVING"
INVALID_ORDER_BY = "INVALID_ORDER_BY"
INVALID_BY_IDS = "INVALID_BY_IDS"
INVALID_LIMIT = "INVALID_LIMIT"
INVALID_EXISTS = "INVALID_EXISTS"
UNKNOWN_ROLE = "UNKNOWN_ROLE"
INVALID_AGGREGATION = "INVALID_AGGREGATION"

# Config validation codes (README.md:338-347)
INVALID_API_NAME = "INVALID_API_NAME"
DUPLICATE_API_NAME = "DUPLICATE_API_NAME"
INVALID_REFERENCE = "INVALID_REFERENCE"
INVALID_RELATION = "INVALID_RELATION"
INVALID_SYNC = "INVALID_SYNC"
INVALID_CACHE = "INVALID_CACHE"

# Planner / lifecycle / execution codes (README.md:393)
NO_STRATEGY = "NO_STRATEGY"
FRESHNESS_UNMET = "FRESHNESS_UNMET"
EXECUTOR_MISSING = "EXECUTOR_MISSING"
CACHE_PROVIDER_MISSING = "CACHE_PROVIDER_MISSING"
QUERY_FAILED = "QUERY_FAILED"
QUERY_TIMEOUT = "QUERY_TIMEOUT"
PROVIDER_LOAD_FAILED = "PROVIDER_LOAD_FAILED"
