"""Query planner: strategy selection P0-P4 (reference README.md:232-266).

Preference order (rule-based, topology-driven, no cost model):

- P0 ``cache``      — byIds point-lookup served from a cache provider.
- P1 ``direct``     — every table lives in one database (originals).
- P2 ``materialized`` — replicas (CDC-synced copies) let all tables co-locate
  in one database, and every replica's estimated lag satisfies the query's
  freshness requirement (``realtime`` bans replicas outright).
- P3 ``trino-cross-db`` — federation. In the reference, Trino; here Spark
  reads every source natively, so federation is simply "use the originals".
- P4 — typed PlannerError (unreachable source).

The strategy label is kept honest in ``meta.strategy`` even though Spark
executes all of them the same way (the reference's enum, QUERY.md:162).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from .errors import (
    EXECUTOR_MISSING,
    FRESHNESS_UNMET,
    NO_STRATEGY,
    ErrorItem,
    ExecutionError,
    PlannerError,
)
from .metadata import LAG_ORDER, MetadataIndex, TableMeta
from .resolver import TableRoute
from .sources import SourceRegistry


@dataclass
class PlanDecision:
    strategy: str  # 'cache' | 'direct' | 'materialized' | 'trino-cross-db'
    target_database: str
    dialect: str | None  # target engine's dialect; None for cache-only hits
    routes: dict[str, TableRoute] = field(default_factory=dict)
    cache_id: str | None = None


# DatabaseMeta.engine -> sql-only dialect (SQL_DIALECTS.md:5-28). Spark
# executes every strategy; a foreign engine declaration makes sql-only text
# target that engine's syntax instead (dialect selection mirrors the
# reference: single-DB strategies use the target DB's dialect, cross-DB
# federation over foreign engines renders Trino, README.md:36-82).
_ENGINE_DIALECTS = {
    "postgres": "postgres",
    "clickhouse": "clickhouse",
    # a database reached through a Trino coordinator renders Trino SQL;
    # the reference has no standalone Iceberg executor — Iceberg tables
    # are accessed via Trino (README.md:246), so an iceberg-engine
    # database renders the Trino dialect too
    "trino": "trino",
    "iceberg": "trino",
}


def _db_dialect(index: MetadataIndex, db_id: str) -> str:
    db = index.databases_by_id.get(db_id)
    return _ENGINE_DIALECTS.get(db.engine if db else "", "spark")


def _federation_dialect(index: MetadataIndex, tables: list[TableMeta]) -> str:
    """Cross-DB: trino when any participating database declares a foreign
    engine (the reference's P3 always federates through Trino); all-Spark
    topologies stay honest with 'spark' — Spark IS the federation layer."""
    engines = {
        (index.databases_by_id.get(t.database).engine
         if index.databases_by_id.get(t.database) else "spark")
        for t in tables
    }
    if engines & set(_ENGINE_DIALECTS) or "iceberg" in engines:
        return "trino"
    return "spark"


def collect_tables(index: MetadataIndex, defn: dict[str, Any]) -> list[TableMeta]:
    """All tables a query touches: from + joins + EXISTS tables, recursively
    through filter groups and nested EXISTS."""
    out: list[TableMeta] = []
    seen: set[str] = set()

    def add(api: str | None) -> None:
        if not api:
            return
        t = index.table(api)
        if t is not None and t.id not in seen:
            seen.add(t.id)
            out.append(t)

    def walk_filters(filters: list[Any]) -> None:
        for f in filters or []:
            if not isinstance(f, dict):
                continue
            if "logic" in f:
                walk_filters(f.get("conditions") or [])
            elif "exists" in f or ("table" in f and "column" not in f):
                add(f.get("table"))
                walk_filters(f.get("filters") or [])

    add(defn.get("from"))
    for j in defn.get("joins") or []:
        if isinstance(j, dict):
            add(j.get("table"))
            walk_filters(j.get("filters") or [])
    walk_filters(defn.get("filters") or [])
    return out


def cache_eligible(
    index: MetadataIndex, defn: dict[str, Any], requested_columns: list[str]
) -> tuple[str, Any] | None:
    """P0 conditions (README.md:234-241): byIds only, no filters/joins/
    groupBy/aggregations, single-column PK, table cached, cache covers the
    requested columns, freshness is not 'realtime' (the cache is CDC-kept,
    lag ≈ seconds)."""
    if not defn.get("byIds"):
        return None
    if any(
        defn.get(k)
        for k in ("filters", "joins", "groupBy", "aggregations", "having")
    ):
        return None
    if defn.get("freshness") == "realtime":
        return None
    table = index.table(defn["from"])
    if table is None or len(table.primary_key) != 1:
        return None
    entry = index.cache_by_table.get(table.id)
    if entry is None:
        return None
    cache_meta, cached_table = entry
    if cached_table.columns is not None:
        covered = set(cached_table.columns)
        if not set(requested_columns) <= covered:
            return None
    return cache_meta.id, cached_table


def plan_query(
    index: MetadataIndex,
    registry: SourceRegistry,
    defn: dict[str, Any],
) -> PlanDecision:
    tables = collect_tables(index, defn)
    freshness = defn.get("freshness")
    max_lag = LAG_ORDER.get(freshness, 99) if freshness else 99

    # Explicit non-realtime freshness opts into replica offload even when a
    # direct plan exists: contract C1711/C1716 assert `freshness: 'seconds'`
    # (lag allows) routes a single-table query to its CDC replica, while
    # C1715 asserts 'realtime' never does (CONTRACT_TESTS.md:1182-1187).
    if freshness is not None and freshness != "realtime":
        # candidates without a registered source are skipped inside
        # _replica_plan, so an unregistered replica target falls through to
        # P1 direct (the original still satisfies any freshness: zero lag)
        offload = _replica_plan(
            index, registry, tables, max_lag, require_replica=True
        )
        if offload is not None:
            return PlanDecision(
                strategy="materialized",
                target_database=offload[0],
                dialect=_db_dialect(index, offload[0]),
                routes=offload[1],
            )

    # P1: all originals in one database
    dbs = {t.database for t in tables}
    if len(dbs) == 1:
        db = next(iter(dbs))
        try:
            _require_source(registry, db, tables)
        except ExecutionError:
            # the original source is gone; if a replica COULD serve but the
            # query's freshness rejects it (e.g. 'realtime' vs any lag),
            # that is a planning conflict, not a missing executor —
            # FRESHNESS_UNMET (C1253, CONTRACT_TESTS.md:931)
            relaxed = _replica_plan(
                index, registry, tables, 99, require_replica=True
            )
            if relaxed is not None:
                usable = _replica_plan(
                    index, registry, tables, max_lag, require_replica=True
                )
                if usable is not None:
                    return PlanDecision(
                        strategy="materialized",
                        target_database=usable[0],
                        dialect=_db_dialect(index, usable[0]),
                        routes=usable[1],
                    )
                raise PlannerError(
                    "replica exists but query freshness rejects its lag "
                    "and the original source is unavailable",
                    [
                        ErrorItem(
                            FRESHNESS_UNMET,
                            f"freshness '{freshness}' rejects the only "
                            f"available replica of database '{db}'",
                            {"database": db, "freshness": freshness},
                        )
                    ],
                ) from None
            raise
        return PlanDecision(
            strategy="direct",
            target_database=db,
            dialect=_db_dialect(index, db),
            routes={t.id: TableRoute(t.database, t.physical_name) for t in tables},
        )

    # P2: replicas co-locate everything in one database, within freshness.
    found = _replica_plan(
        index, registry, tables, max_lag, require_replica=False
    )
    if found is not None:
        return PlanDecision(
            strategy="materialized",
            target_database=found[0],
            dialect=_db_dialect(index, found[0]),
            routes=found[1],
        )

    # P3: federation — Spark reads every source natively
    missing = [t for t in tables if not registry.has(t.database)]
    if missing:
        raise PlannerError(
            "no strategy can serve this query",
            [
                ErrorItem(
                    NO_STRATEGY,
                    f"table '{t.api_name}' lives in database '{t.database}' "
                    "which has no registered source",
                    {"table": t.api_name, "database": t.database},
                )
                for t in missing
            ],
        )
    return PlanDecision(
        strategy="trino-cross-db",
        target_database="spark",
        dialect=_federation_dialect(index, tables),
        routes={t.id: TableRoute(t.database, t.physical_name) for t in tables},
    )


def _replica_plan(
    index: MetadataIndex,
    registry: SourceRegistry,
    tables: list[TableMeta],
    max_lag: int,
    *,
    require_replica: bool,
) -> tuple[str, dict[str, TableRoute]] | None:
    """Find a REGISTERED database that can serve every table (original or
    CDC replica within ``max_lag``). Prefer the database already holding the
    most originals (README.md:253-255); unregistered candidates are skipped
    (not selected then failed post-hoc, which could shadow a registered
    alternative). With ``require_replica`` the plan must actually use >=1
    replica route — the explicit-freshness offload path (C1711) — so a
    pure-originals plan falls through to P1 direct instead."""
    candidates: dict[str, int] = {}
    for t in tables:
        candidates[t.database] = candidates.get(t.database, 0) + 1
    for t in tables:  # replica target DBs are candidates too (0 originals)
        for s in index.replicas_of(t.id):
            if LAG_ORDER[s.estimated_lag] <= max_lag:
                candidates.setdefault(s.target_database, 0)
    best: tuple[int, str, dict[str, TableRoute]] | None = None
    for db, originals in sorted(candidates.items(), key=lambda kv: -kv[1]):
        if not registry.has(db):
            continue
        routes: dict[str, TableRoute] = {}
        n_replicas = 0
        ok = True
        for t in tables:
            if t.database == db:
                routes[t.id] = TableRoute(db, t.physical_name)
                continue
            replica = next(
                (
                    s
                    for s in index.replicas_of(t.id)
                    if s.target_database == db
                    and LAG_ORDER[s.estimated_lag] <= max_lag
                ),
                None,
            )
            if replica is None:
                ok = False
                break
            # tablesUsed[].source is 'replica' per the contract (C1711,
            # CONTRACT_TESTS.md:1182) — QUERY.md:167's 'materialized' enum
            # value is contradicted by the contract's own assertion; the
            # behavioral suite wins.
            routes[t.id] = TableRoute(
                db, replica.target_physical_name, source="replica"
            )
            n_replicas += 1
        if not ok or (require_replica and n_replicas == 0):
            continue
        if best is None or originals > best[0]:
            best = (originals, db, routes)
    if best is None:
        return None
    return best[1], best[2]


def _require_source(
    registry: SourceRegistry, db: str, tables: list[TableMeta]
) -> None:
    """A strategy was selected but its target database has no registered
    source — the reference's EXECUTOR_MISSING ExecutionError (C1260,
    CONTRACT_TESTS.md:942), distinct from P4's no-topological-strategy
    PlannerError."""
    if not registry.has(db):
        raise ExecutionError(
            f"database '{db}' has no registered source",
            [
                ErrorItem(
                    EXECUTOR_MISSING,
                    f"no executor/source for database '{db}'",
                    {"database": db},
                )
            ],
        )
