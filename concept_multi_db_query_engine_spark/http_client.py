"""HTTP client over the 4-endpoint surface (HTTP_CLIENT.md:30-84).

Implements the same query surface as the in-process ``MultiDb`` so the
contract suite runs against both (HTTP_CLIENT.md:87-148): ``query()``,
``validate_query()``, ``validate_config()``, ``health()``.

Key behaviors mirrored from the spec:

- **Error deserialization** — the server sends ``toJSON()`` bodies; the
  client reconstructs the typed error class from the ``code`` field, so
  callers catch ``ValidationError``/``ExecutionError``/... with no
  transport-awareness (HTTP_CLIENT.md:78-79, contract C1200-C1206).
- **Timeout** — socket timeout surfaces as ``ConnectionError`` with code
  ``REQUEST_TIMEOUT`` (C1205); an unreachable server as ``NETWORK_ERROR``
  (C1204).
- **Optional local validation** — ``validate_before_send`` runs the
  zero-I/O validator before any network call when metadata/roles were
  provided (HTTP_CLIENT.md:80).
- **No retry logic** — intentionally simple (HTTP_CLIENT.md:84).
"""

from __future__ import annotations

import json
import socket
import urllib.error
import urllib.request
from typing import Any

from .access import resolve_access
from .errors import (
    ConfigError,
    ConnectionError,
    ErrorItem,
    ExecutionError,
    MultiDbError,
    PlannerError,
    ProviderError,
    ValidationError,
)
from .metadata import Metadata, MetadataIndex, RoleMeta
from .query_validation import QueryValidator

NETWORK_ERROR = "NETWORK_ERROR"
REQUEST_TIMEOUT = "REQUEST_TIMEOUT"

_ERROR_CLASSES: dict[str, type[MultiDbError]] = {
    "VALIDATION_ERROR": ValidationError,
    "CONFIG_ERROR": ConfigError,
    "PLANNER_ERROR": PlannerError,
    "EXECUTION_ERROR": ExecutionError,
    "CONNECTION_ERROR": ConnectionError,
    "PROVIDER_ERROR": ProviderError,
}


def _reconstruct(body: dict[str, Any]) -> MultiDbError:
    cls = _ERROR_CLASSES.get(str(body.get("code")), ExecutionError)
    return cls(
        str(body.get("message", "")),
        [
            ErrorItem(
                str(e.get("code", "")), str(e.get("message", "")),
                e.get("details"),
            )
            for e in body.get("errors", [])
            if isinstance(e, dict)
        ],
    )


class MultiDbClient:
    """Typed client for a multi-db query server (HTTP_CLIENT.md:30-56)."""

    def __init__(
        self,
        base_url: str,
        *,
        headers: dict[str, str] | None = None,
        timeout_s: float = 30.0,
        validate_before_send: bool = False,
        metadata: Metadata | dict[str, Any] | None = None,
        roles: list[RoleMeta] | list[dict[str, Any]] | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.headers = dict(headers or {})
        self.timeout_s = timeout_s
        self._index: MetadataIndex | None = None
        if validate_before_send:
            if metadata is None or roles is None:
                raise ValueError(
                    "validate_before_send requires metadata and roles"
                )
            if isinstance(metadata, dict):
                metadata = Metadata.from_dict(metadata)
            roles = [
                r if isinstance(r, RoleMeta) else RoleMeta.from_dict(r)
                for r in roles
            ]
            self._index = MetadataIndex(metadata, roles)

    # -- transport ---------------------------------------------------------------

    def _request(
        self, method: str, path: str, payload: dict[str, Any] | None = None
    ) -> tuple[int, dict[str, Any]]:
        data = None if payload is None else json.dumps(payload).encode()
        req = urllib.request.Request(
            f"{self.base_url}{path}",
            data=data,
            method=method,
            headers={"Content-Type": "application/json", **self.headers},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return resp.status, json.loads(resp.read() or b"{}")
        except urllib.error.HTTPError as exc:
            try:
                return exc.code, json.loads(exc.read() or b"{}")
            except (json.JSONDecodeError, ValueError):
                return exc.code, {"code": "EXECUTION_ERROR",
                                  "message": str(exc)}
        except (socket.timeout, TimeoutError) as exc:
            raise ConnectionError(
                f"request timed out after {self.timeout_s}s",
                [ErrorItem(REQUEST_TIMEOUT, str(exc))],
            ) from exc
        except urllib.error.URLError as exc:
            if isinstance(exc.reason, (socket.timeout, TimeoutError)):
                raise ConnectionError(
                    f"request timed out after {self.timeout_s}s",
                    [ErrorItem(REQUEST_TIMEOUT, str(exc.reason))],
                ) from exc
            raise ConnectionError(
                f"server unreachable: {exc.reason}",
                [ErrorItem(NETWORK_ERROR, str(exc.reason))],
            ) from exc

    # -- surface (same shape as MultiDb) -----------------------------------------

    def query(
        self,
        definition: dict[str, Any],
        context: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        if self._index is not None:
            access, errors = resolve_access(self._index, context)
            errors = list(errors)
            errors.extend(
                QueryValidator(self._index, access).validate(definition)
            )
            if errors:  # fail fast, no network round trip
                raise ValidationError(
                    f"query invalid: {len(errors)} issue(s)", errors=errors
                )
        status, body = self._request(
            "POST", "/query",
            {"definition": definition, "context": context},
        )
        if status != 200:
            raise _reconstruct(body)
        return body

    def validate_query(
        self,
        definition: dict[str, Any],
        context: dict[str, Any] | None = None,
    ) -> list[dict[str, Any]]:
        status, body = self._request(
            "POST", "/validate/query",
            {"definition": definition, "context": context},
        )
        if status != 200:
            raise _reconstruct(body)
        return list(body.get("errors", []))

    def validate_config(
        self,
        metadata: dict[str, Any],
        roles: list[dict[str, Any]],
        *,
        strict_api_names: bool = True,
    ) -> list[dict[str, Any]]:
        status, body = self._request(
            "POST", "/validate/config",
            {"metadata": metadata, "roles": roles,
             "strictApiNames": strict_api_names},
        )
        if status != 200:
            raise _reconstruct(body)
        return list(body.get("errors", []))

    def health(self) -> dict[str, Any]:
        status, body = self._request("GET", "/health")
        if status != 200:
            raise _reconstruct(body)
        return body
