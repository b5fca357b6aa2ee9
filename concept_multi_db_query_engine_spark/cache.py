"""Cache providers — the P0 strategy's key-value store
(reference METADATA.md:230-235: Redis MGET by key pattern, no TTL because a
CDC pipeline keeps it fresh).

In the Spark rebuild the provider interface is identical; the default
implementation is an in-memory dict, optionally warmed from the table's
DataFrame (fixture-scale convenience — at 100 TB the cache would be a real
Redis/keyed store populated by the CDC stream, and this interface slots it
in without touching the planner).
"""

from __future__ import annotations

from typing import Any


class CacheProvider:
    def get_many(self, keys: list[str]) -> dict[str, dict[str, Any] | None]:
        raise NotImplementedError

    def ping(self) -> bool:
        return True

    def close(self) -> None:
        pass


class MemoryCache(CacheProvider):
    """rows: key string (e.g. 'users:42') → row dict keyed by column apiName."""

    def __init__(self, rows: dict[str, dict[str, Any]] | None = None):
        self.rows: dict[str, dict[str, Any]] = dict(rows or {})

    def put(self, key: str, row: dict[str, Any]) -> None:
        self.rows[key] = row

    def get_many(self, keys: list[str]) -> dict[str, dict[str, Any] | None]:
        return {k: self.rows.get(k) for k in keys}


def build_key(pattern: str, row: dict[str, Any]) -> str:
    """'users:{id}' + {'id': 42} → 'users:42'."""
    out = pattern
    for k, v in row.items():
        out = out.replace("{" + k + "}", str(v))
    return out
