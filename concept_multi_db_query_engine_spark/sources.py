"""Sources: where each logical database's tables physically live.

The reference delegates execution to Postgres/ClickHouse/Trino executors
(METADATA.md:222-228); here every "database" is a Spark-readable source and
Spark is both executor and federation layer. Sources return *lazy* DataFrames
— Catalyst sees the full plan (scan + filters + joins) and pushes
predicates/column pruning into the file scan.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from .errors import EXECUTOR_MISSING, ConnectionError, ErrorItem


class Source:
    """One logical database. Subclasses map physical table names to lazy
    DataFrames (analog of the reference's executor interface:
    execute/ping/close — METADATA.md:222-228)."""

    def df(self, spark: SparkSession, physical_name: str) -> DataFrame:
        raise NotImplementedError

    def ping(self) -> bool:
        return True

    def close(self) -> None:
        pass


class ParquetSource(Source):
    """Directory of ``<physical_name>.parquet`` files/dirs — the fixture-world
    stand-in for a database. Scans support predicate pushdown + column
    pruning natively."""

    def __init__(
        self,
        directory: str,
        aliases: dict[str, str] | None = None,
        post: Callable[[str, DataFrame], DataFrame] | None = None,
    ):
        self.directory = directory.rstrip("/")
        # physical name → actual file stem (e.g. a CDC replica registered as
        # 'orders_replica' reading the synced copy)
        self.aliases = aliases or {}
        # optional per-table normalization (e.g. nano-timestamp conversion)
        self.post = post

    def df(self, spark: SparkSession, physical_name: str) -> DataFrame:
        stem = self.aliases.get(physical_name, physical_name)
        df = spark.read.parquet(f"{self.directory}/{stem}.parquet")
        return self.post(stem, df) if self.post else df

    def ping(self) -> bool:
        import os

        return os.path.isdir(self.directory)


class MemorySource(Source):
    """In-memory tables for tests/fixtures: physical name → DataFrame or a
    zero-arg factory returning one."""

    def __init__(self, tables: dict[str, DataFrame | Callable[[], DataFrame]]):
        self.tables = tables

    def df(self, spark: SparkSession, physical_name: str) -> DataFrame:
        t = self.tables[physical_name]
        return t() if callable(t) else t


class JdbcSource(Source):
    """Real-database source via Spark's JDBC reader. Predicates/column pruning
    push down through the JDBC DSv2 connector. Requires the driver jar on the
    classpath — gated, since the test image ships none."""

    def __init__(self, url: str, properties: dict[str, str] | None = None,
                 fetchsize: int = 10_000):
        self.url = url
        self.properties = properties or {}
        self.fetchsize = fetchsize

    def df(self, spark: SparkSession, physical_name: str) -> DataFrame:
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", physical_name)
            .option("fetchsize", str(self.fetchsize))
        )
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        return reader.load()

    def ping(self) -> bool:
        try:
            import py4j  # noqa: F401

            return True
        except ImportError:
            return False


class SourceRegistry:
    """database id → Source. The planner routes tables here; the builder
    fetches DataFrames through it."""

    def __init__(self, sources: dict[str, Source] | None = None):
        self.sources: dict[str, Source] = dict(sources or {})
        self._closed = False

    def register(self, database_id: str, source: Source) -> None:
        self.sources[database_id] = source

    def has(self, database_id: str) -> bool:
        return database_id in self.sources

    def df(self, spark: SparkSession, database_id: str, physical_name: str) -> DataFrame:
        if self._closed:
            raise ConnectionError(
                "registry closed",
                [ErrorItem(EXECUTOR_MISSING, f"executor for '{database_id}' closed")],
            )
        src = self.sources.get(database_id)
        if src is None:
            raise ConnectionError(
                f"no source registered for database '{database_id}'",
                [ErrorItem(EXECUTOR_MISSING, f"database '{database_id}' has no source")],
            )
        return src.df(spark, physical_name)

    def ping_all(self) -> dict[str, bool]:
        return {db: s.ping() for db, s in self.sources.items()}

    def close(self) -> None:
        errors: list[ErrorItem] = []
        for db, s in self.sources.items():
            try:
                s.close()
            except Exception as exc:  # attempt-all, aggregate (METADATA.md:196)
                errors.append(ErrorItem(EXECUTOR_MISSING, f"{db}: {exc}"))
        self._closed = True
        if errors:
            raise ConnectionError("errors while closing sources", errors)
