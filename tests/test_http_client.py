"""HTTP client: typed-error reconstruction over the wire (contract
C1200-C1206, CONTRACT_TESTS.md:906-918) and the executor contract
(C1800-C1804, CONTRACT_TESTS.md:1191-1202) against the Source interface."""

from __future__ import annotations

import pytest

from concept_multi_db_query_engine_spark import (
    ConnectionError as MdbConnectionError,
)
from concept_multi_db_query_engine_spark import (
    ExecutionError,
    PlannerError,
    ProviderError,
    ValidationError,
    http_server,
    testdata,
)
from concept_multi_db_query_engine_spark.http_client import MultiDbClient
from concept_multi_db_query_engine_spark.sources import (
    MemorySource,
    ParquetSource,
    SourceRegistry,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def client(spark):
    engine = testdata.build_engine(spark, SF_DIR)
    srv = http_server.serve_background(engine)
    yield MultiDbClient(f"http://127.0.0.1:{srv.server_address[1]}")
    srv.shutdown()


class TestClientQueries:
    def test_query_round_trip(self, client):
        res = client.query(
            {"from": "customer", "columns": ["c_custkey", "c_name"],
             "limit": 3},
        )
        assert res["kind"] == "data"
        assert len(res["data"]) == 3
        assert len(res["meta"]["columns"]) == 2

    def test_count_round_trip(self, client):
        res = client.query({"from": "region", "executeMode": "count"})
        assert res["kind"] == "count"
        assert res["count"] == 5

    def test_validate_endpoints(self, client):
        assert client.validate_query({"from": "region"}) == []
        issues = client.validate_query({"from": "ghostTable"})
        assert any(i["code"] == "UNKNOWN_TABLE" for i in issues)
        cfg_issues = client.validate_config(
            {"databases": [], "tables": [
                {"id": "t", "apiName": "Bad_Name", "database": "ghost",
                 "physicalName": "x", "primaryKey": ["id"],
                 "columns": [{"apiName": "id", "physicalName": "id",
                              "type": "int"}]}]},
            [],
        )
        assert cfg_issues

    def test_health_round_trip(self, client):
        h = client.health()
        assert h["healthy"] is True
        assert "warehouse" in h["executors"]


class TestErrorDeserialization:
    def test_c1200_c1201_validation_error_reconstructed(self, client):
        with pytest.raises(ValidationError) as err:
            client.query({"from": "ghostTable"})
        assert isinstance(err.value, ValidationError)
        assert err.value.to_json()["code"] == "VALIDATION_ERROR"
        assert any(e["code"] == "UNKNOWN_TABLE"
                   for e in err.value.to_json()["errors"])

    def test_c1204_network_error_on_unreachable(self):
        dead = MultiDbClient("http://127.0.0.1:1", timeout_s=2)
        with pytest.raises(MdbConnectionError) as err:
            dead.query({"from": "region"})
        assert "NETWORK_ERROR" in err.value.error_codes

    def test_c1205_request_timeout(self, client):
        # 1ms budget: connect succeeds locally but the response can't land
        slow = MultiDbClient(client.base_url, timeout_s=0.001)
        try:
            slow.query({"from": "lineitem", "limit": 1})
        except MdbConnectionError as err:
            assert "REQUEST_TIMEOUT" in err.error_codes
        else:  # pragma: no cover - fast host answered within 1ms
            pytest.skip("host answered within 1ms")

    def test_validate_before_send_fails_fast(self, spark):
        # no server at this URL — local validation must reject first,
        # proving zero network round trip
        local = MultiDbClient(
            "http://127.0.0.1:1",
            validate_before_send=True,
            metadata=testdata.METADATA,
            roles=testdata.ROLES,
        )
        with pytest.raises(ValidationError):
            local.query({"from": "ghostTable"})


class TestExecutorContract:
    """C1800-C1804 against the Source interface (our DbExecutor analog)."""

    def test_c1800_ping_healthy(self, spark):
        src = ParquetSource(SF_DIR)
        assert src.ping() is True

    def test_c1801_df_returns_rows(self, spark):
        src = ParquetSource(SF_DIR)
        rows = src.df(spark, "region").collect()
        assert len(rows) == 5
        assert rows[0].asDict()

    def test_c1802_unknown_table_raises(self, spark):
        src = ParquetSource(SF_DIR)
        with pytest.raises(Exception):
            src.df(spark, "__nonexistent_table_xyz__").collect()

    def test_c1803_close_resolves(self, spark):
        src = MemorySource({})
        src.close()  # must not raise

    def test_c1804_registry_close_all(self, spark):
        reg = SourceRegistry({
            "a": MemorySource({}), "b": ParquetSource(SF_DIR),
        })
        reg.close()  # attempt-all semantics, no raise
        assert reg.ping_all()  # stateless sources may still answer (C1804
        # note: acceptable for stateless executors like Trino REST)


@pytest.fixture(scope="module")
def fixture_client(spark):
    """The CONTRACT fixture engine behind HTTP — the reference runs the same
    query-contract suite against 'direct' and 'http-client' factories to
    catch serialization drift (CONTRACT_TESTS.md:33-49)."""
    from concept_multi_db_query_engine_spark import MultiDb
    from tests import fixtures

    engine = MultiDb(spark, fixtures.METADATA, fixtures.ROLES,
                     fixtures.build_registry(spark))
    srv = http_server.serve_background(engine)
    yield MultiDbClient(f"http://127.0.0.1:{srv.server_address[1]}")
    srv.shutdown()


class TestHttpQueryContract:
    """Spot checks of the shared query contract through the HTTP transport:
    same row sets as direct mode, with JSON-safe value encodings."""

    def test_c100_same_rowset_over_http(self, fixture_client):
        res = fixture_client.query({
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "status", "operator": "=",
                         "value": "active"}],
        })
        assert sorted(r["id"] for r in res["data"]) == [1, 4]

    def test_booleans_stay_json_booleans(self, fixture_client):
        # C1704 over the wire: true/false/null, never 0/1
        res = fixture_client.query(
            {"from": "samples", "columns": ["id", "isActive"]}
        )
        vals = {r["id"]: r["isActive"] for r in res["data"]}
        assert vals[1] is True and vals[3] is False and vals[4] is None

    def test_timestamps_serialize_iso8601(self, fixture_client):
        # C1705: timestamps cross the JSON boundary as ISO 8601 strings
        res = fixture_client.query(
            {"from": "samples", "columns": ["id", "createdAt"]}
        )
        vals = {r["id"]: r["createdAt"] for r in res["data"]}
        assert vals[1] == "2024-01-15T10:00:00"

    def test_arrays_stay_json_arrays(self, fixture_client):
        res = fixture_client.query(
            {"from": "samples", "columns": ["id", "tags"]}
        )
        vals = {r["id"]: r["tags"] for r in res["data"]}
        assert vals[1] == ["fast", "new"]
        assert vals[4] is None

    def test_masking_applied_over_http(self, fixture_client):
        res = fixture_client.query(
            {"from": "users", "columns": ["id", "email"]},
            {"roles": {"user": ["tenant-user"]}},
        )
        vals = {r["id"]: r["email"] for r in res["data"]}
        assert vals["uuid-c1"] == "a***@***.com"

    def test_counted_exists_over_http(self, fixture_client):
        res = fixture_client.query({
            "from": "samples", "columns": ["id"],
            "filters": [{"table": "sampleItems",
                         "count": {"operator": ">=", "value": 2}}],
        })
        assert sorted(r["id"] for r in res["data"]) == [1, 5]

    def test_meta_shape_survives_transport(self, fixture_client):
        res = fixture_client.query(
            {"from": "samples", "columns": ["id", "amount"]}
        )
        cols = {c["apiName"]: c for c in res["meta"]["columns"]}
        assert cols["amount"]["type"] == "decimal"
        assert cols["id"]["nullable"] is False
        assert res["meta"]["strategy"] == "direct"
