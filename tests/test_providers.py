"""Metadata/role provider abstraction (METADATA.md:150-215): providers back
init + no-arg reload; load failure raises ProviderError and a failed reload
preserves the previous snapshot (TESTS.md:382 #228)."""

from __future__ import annotations

import pytest

from concept_multi_db_query_engine_spark import (
    ConfigError,
    MemorySource,
    MetadataProvider,
    ProviderError,
    RoleProvider,
    ValidationError,
    create_multi_db,
    static_metadata,
    static_roles,
)

from tests import fixtures


class FlakyMetadataProvider(MetadataProvider):
    """Serves a mutable config; can be switched to fail on demand."""

    def __init__(self, config):
        self.config = config
        self.fail = False
        self.loads = 0

    def load(self):
        self.loads += 1
        if self.fail:
            raise RuntimeError("config service unreachable")
        return self.config


class FlakyRoleProvider(RoleProvider):
    def __init__(self, roles):
        self.roles = roles
        self.fail = False

    def load(self):
        if self.fail:
            raise RuntimeError("role service down")
        return self.roles


@pytest.fixture()
def providers_engine(spark):
    mp = FlakyMetadataProvider(fixtures.METADATA)
    rp = FlakyRoleProvider(fixtures.ROLES)
    engine = create_multi_db(
        spark,
        sources=fixtures.build_registry(spark),
        metadata_provider=mp,
        role_provider=rp,
    )
    return engine, mp, rp


class TestProviderInit:
    def test_init_via_providers(self, providers_engine):
        engine, mp, rp = providers_engine
        assert mp.loads == 1
        res = engine.query({"from": "samples", "columns": ["id"]})
        assert len(res["data"]) == 5

    def test_init_provider_failure_raises_provider_error(self, spark):
        mp = FlakyMetadataProvider(fixtures.METADATA)
        mp.fail = True
        with pytest.raises(ProviderError):
            create_multi_db(
                spark,
                sources=fixtures.build_registry(spark),
                metadata_provider=mp,
                role_provider=FlakyRoleProvider(fixtures.ROLES),
            )

    def test_static_helpers(self, spark):
        engine = create_multi_db(
            spark,
            sources=fixtures.build_registry(spark),
            metadata_provider=static_metadata(fixtures.METADATA),
            role_provider=static_roles(fixtures.ROLES),
        )
        assert engine.query({"from": "products"})["data"]


class TestProviderReload:
    def test_reload_recalls_provider(self, providers_engine):
        engine, mp, rp = providers_engine
        # provider now serves a config where samples.note is gone
        trimmed = {
            **fixtures.METADATA,
            "tables": [
                {**t, "columns": [c for c in t["columns"]
                                  if c["apiName"] != "note"]}
                if t["id"] == "samples" else t
                for t in fixtures.METADATA["tables"]
            ],
        }
        mp.config = trimmed
        engine.reload_metadata()  # no-arg → provider.load()
        assert mp.loads == 2
        with pytest.raises(ValidationError):
            engine.query({"from": "samples", "columns": ["note"]})
        # restore for other tests sharing the session engine fixture
        mp.config = fixtures.METADATA
        engine.reload_metadata()

    def test_reload_failure_preserves_old_snapshot_228(self, providers_engine):
        engine, mp, rp = providers_engine
        mp.fail = True
        with pytest.raises(ProviderError):
            engine.reload_metadata()
        # old snapshot still serves queries
        res = engine.query({"from": "samples", "columns": ["id", "note"]})
        assert len(res["data"]) == 5

    def test_reload_invalid_config_preserves_old_snapshot(
        self, providers_engine
    ):
        engine, mp, rp = providers_engine
        mp.config = {
            **fixtures.METADATA,
            "tables": fixtures.METADATA["tables"]
            + [{
                "id": "bad", "apiName": "samples",  # duplicate apiName
                "database": "pg-main", "physicalName": "x",
                "primaryKey": ["id"],
                "columns": [{"apiName": "id", "physicalName": "id",
                             "type": "int"}],
            }],
        }
        with pytest.raises(ConfigError):
            engine.reload_metadata()
        assert engine.query({"from": "samples", "columns": ["id"]})["data"]

    def test_reload_roles_failure_preserves_old(self, providers_engine):
        engine, mp, rp = providers_engine
        rp.fail = True
        with pytest.raises(ProviderError):
            engine.reload_roles()
        res = engine.query(
            {"from": "orders", "columns": ["id"]},
            {"roles": {"user": ["viewer"]}},
        )
        assert len(res["data"]) == 5
