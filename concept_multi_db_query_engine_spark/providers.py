"""Metadata / role providers (METADATA.md:150-215).

The reference loads metadata and roles exclusively through async providers —
``MetadataProvider.load()`` / ``RoleProvider.load()`` — so that
``reloadMetadata()`` / ``reloadRoles()`` work uniformly regardless of where
config lives (static object, config service, database). Static configs use
the built-in ``staticMetadata`` / ``staticRoles`` helpers (METADATA.md:163-169).

Load failures surface as ``ProviderError`` (init step ①, README.md:149-161);
a reload whose provider or validation fails preserves the previous snapshot
(TESTS.md:382 #228) — the engine keeps serving the old config.
"""

from __future__ import annotations

from typing import Any

from .errors import PROVIDER_LOAD_FAILED, ErrorItem, ProviderError
from .metadata import Metadata, RoleMeta


class MetadataProvider:
    """Interface: ``load()`` returns a MetadataConfig (dict or Metadata)."""

    def load(self) -> Metadata | dict[str, Any]:
        raise NotImplementedError


class RoleProvider:
    """Interface: ``load()`` returns the role list."""

    def load(self) -> list[RoleMeta] | list[dict[str, Any]]:
        raise NotImplementedError


class StaticMetadataProvider(MetadataProvider):
    """``staticMetadata(...)`` helper: wraps a fixed config
    (METADATA.md:163-169)."""

    def __init__(self, config: Metadata | dict[str, Any]):
        self._config = config

    def load(self) -> Metadata | dict[str, Any]:
        return self._config


class StaticRoleProvider(RoleProvider):
    """``staticRoles(...)`` helper: wraps a fixed role list."""

    def __init__(self, roles: list[RoleMeta] | list[dict[str, Any]]):
        self._roles = roles

    def load(self) -> list[RoleMeta] | list[dict[str, Any]]:
        return self._roles


def static_metadata(config: Metadata | dict[str, Any]) -> StaticMetadataProvider:
    return StaticMetadataProvider(config)


def static_roles(
    roles: list[RoleMeta] | list[dict[str, Any]],
) -> StaticRoleProvider:
    return StaticRoleProvider(roles)


def load_via(provider: MetadataProvider | RoleProvider, what: str) -> Any:
    """Call ``provider.load()``, wrapping any failure as ProviderError."""
    try:
        return provider.load()
    except Exception as exc:
        raise ProviderError(
            f"{what} provider load failed: {exc}",
            [ErrorItem(PROVIDER_LOAD_FAILED, str(exc), {"provider": what})],
        ) from exc
