"""End-to-end CDC replica path: a Structured Streaming job materializes the
replica, and the planner's 'materialized' strategy serves a federated query
from it with results identical to the fresh-path plan."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from concept_multi_db_query_engine_spark import testdata
from concept_multi_db_query_engine_spark.pipeline import MultiDb
from concept_multi_db_query_engine_spark.sources import (
    ParquetSource,
    Source,
    SourceRegistry,
)
from concept_multi_db_query_engine_spark.streaming import cdc

SF_DIR = "/root/testdata/sf0.001"

QUERY = {
    "from": "events",
    "columns": ["event_id", "event_type"],
    "joins": [{"table": "customer", "type": "inner",
               "columns": ["c_mktsegment"]}],
    "filters": [{"column": "event_type", "operator": "=",
                 "value": "signup"},
                {"column": "event_id", "operator": "<", "value": 500}],
}


class _RoutedSource(Source):
    """Lake source whose customer_replica lives in the streamed directory;
    everything else reads the shared testdata dir."""

    def __init__(self, spark: SparkSession, replica_path: str):
        self.spark = spark
        self.replica_path = replica_path
        self.base = ParquetSource(SF_DIR, post=testdata.normalize_table)

    def df(self, spark, physical_name):
        if physical_name == "customer_replica":
            return spark.read.parquet(self.replica_path)
        return self.base.df(spark, physical_name)

    def ping(self):
        return True


@pytest.fixture(scope="module")
def replicated_engine(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cdc")
    replica = str(tmp / "customer_replica")
    cdc.replicate_parquet_table(
        spark, f"{SF_DIR}/customer.parquet", replica, str(tmp / "ckpt")
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    registry = SourceRegistry({
        "warehouse": ParquetSource(SF_DIR),
        "lake": _RoutedSource(spark, replica),
    })
    return MultiDb(
        spark, testdata.METADATA, testdata.ROLES, registry,
        strict_api_names=False,
    ), replica


def test_replica_has_all_rows(spark, replicated_engine):
    _, replica = replicated_engine
    assert (
        spark.read.parquet(replica).count()
        == spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    )


def test_stale_freshness_routes_to_streamed_replica(replicated_engine):
    engine, _ = replicated_engine
    result = engine.query({**QUERY, "freshness": "hours"})
    assert result["meta"]["strategy"] == "materialized"
    used = {t["physicalName"] for t in result["meta"]["tablesUsed"]}
    assert "customer_replica" in used
    fresh = engine.query({**QUERY, "freshness": "realtime"})
    assert fresh["meta"]["strategy"] != "materialized"
    key = lambda r: (r["event_id"])  # noqa: E731
    assert sorted(result["data"], key=key) == sorted(fresh["data"], key=key)


def test_replication_is_incremental(spark, replicated_engine, tmp_path):
    """Re-running the streaming job against an unchanged source processes
    nothing new (checkpoint-driven exactly-once)."""
    _, replica = replicated_engine
    before = spark.read.parquet(replica).count()
    # second cycle, same checkpoint: no duplicate rows
    # (checkpoint lives next to the replica from the fixture)
    import pathlib

    ckpt = str(pathlib.Path(replica).parent / "ckpt")
    cdc.replicate_parquet_table(
        spark, f"{SF_DIR}/customer.parquet", replica, ckpt
    )
    assert spark.read.parquet(replica).count() == before
