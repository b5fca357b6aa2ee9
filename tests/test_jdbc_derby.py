"""Real JDBC round-trip (verdict missing-item: e2e read path).

The container has no network database, but Spark ships the embedded Derby
engine (derby-*.jar, used for the Hive metastore) — a genuine JDBC database
running in-process. We write a table through Spark's JDBC writer, then read
it back through the engine's JdbcSource: parallel range partitioning with
probed bounds, filter pushdown, and the full validate→plan→resolve→build
pipeline on top of a JDBC-backed database.
"""

from __future__ import annotations

import uuid

import pytest

from concept_multi_db_query_engine_spark import MultiDb, SourceRegistry
from concept_multi_db_query_engine_spark.sources import JdbcSource

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

METADATA = {
    "databases": [{"id": "ext-db", "engine": "postgres"}],
    "tables": [{
        "id": "widgets", "apiName": "widgets", "database": "ext-db",
        "physicalName": "WIDGETS", "primaryKey": ["id"],
        "columns": [
            {"apiName": "id", "physicalName": "ID", "type": "int"},
            {"apiName": "name", "physicalName": "NAME", "type": "string"},
            {"apiName": "price", "physicalName": "PRICE", "type": "decimal"},
            {"apiName": "bucket", "physicalName": "BUCKET", "type": "int"},
        ],
    }],
}

ROLES = [{"id": "admin", "tables": "*"}]


@pytest.fixture(scope="module")
def derby_engine(spark):
    url = f"jdbc:derby:/tmp/derby_mdb_{uuid.uuid4().hex[:8]};create=true"
    rows = [(i, f"widget-{i:04d}", float(i) * 1.5, i % 7) for i in range(500)]
    df = spark.createDataFrame(
        rows, "ID bigint, NAME string, PRICE double, BUCKET bigint"
    )
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "WIDGETS")
        .option("driver", DRIVER)
        # Derby maps StringType to CLOB by default, which can't be compared;
        # force a VARCHAR so predicates push down
        .option("createTableColumnTypes", "NAME VARCHAR(64)")
        .save()
    )
    source = JdbcSource(
        url,
        properties={"driver": DRIVER},
        partition_column="ID",
        num_partitions=4,
    )
    engine = MultiDb(
        spark, METADATA, ROLES, SourceRegistry({"ext-db": source}),
    )
    return engine, source


class TestJdbcRoundTrip:
    def test_full_scan_through_pipeline(self, derby_engine):
        engine, _ = derby_engine
        res = engine.query({"from": "widgets", "executeMode": "count"})
        assert res["count"] == 500

    def test_filters_and_projection(self, derby_engine):
        engine, _ = derby_engine
        res = engine.query({
            "from": "widgets", "columns": ["id", "name"],
            "filters": [
                {"column": "id", "operator": ">=", "value": 490},
                {"column": "name", "operator": "startsWith", "value": "widget"},
            ],
            "orderBy": [{"column": "id", "direction": "asc"}],
        })
        assert [r["id"] for r in res["data"]] == list(range(490, 500))
        assert res["data"][0]["name"] == "widget-0490"

    def test_by_ids_point_lookup(self, derby_engine):
        engine, _ = derby_engine
        res = engine.query({"from": "widgets", "byIds": [3, 141, 499]})
        assert sorted(r["id"] for r in res["data"]) == [3, 141, 499]

    def test_parallel_range_partitioning(self, derby_engine):
        engine, source = derby_engine
        # bounds are probed (MIN/MAX remote query) and the scan splits into
        # num_partitions parallel range queries
        df = source.df(engine.spark, "WIDGETS")
        assert df.rdd.getNumPartitions() == 4
        assert df.count() == 500

    def test_aggregation_over_jdbc(self, derby_engine):
        engine, _ = derby_engine
        res = engine.query({
            "from": "widgets",
            "groupBy": [{"column": "bucket"}],
            "aggregations": [{"column": "*", "fn": "count", "alias": "n"}],
            "orderBy": [{"column": "bucket", "direction": "asc"}],
        })
        assert len(res["data"]) == 7
        assert sum(r["n"] for r in res["data"]) == 500
