from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from concept_multi_db_query_engine_spark import MultiDb  # noqa: E402
from concept_multi_db_query_engine_spark.cache import MemoryCache  # noqa: E402
from concept_multi_db_query_engine_spark.session import get_spark  # noqa: E402

from tests import fixtures  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="cmdbqe-tests", cpus=4, shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def engine(spark):
    """Contract-fixture engine: two 'databases' + CDC replica + users cache."""
    registry = fixtures.build_registry(spark)
    users_cache = MemoryCache(
        {
            f"users:{r[0]}": {
                "id": r[0], "email": r[1], "phone": r[2], "firstName": r[3],
                "lastName": r[4], "role": r[5], "age": r[6], "managerId": r[7],
                "createdAt": r[8],
            }
            for r in fixtures.USERS_ROWS
        }
    )
    return MultiDb(
        spark,
        fixtures.METADATA,
        fixtures.ROLES,
        registry,
        caches={"redis-main": users_cache},
    )


def ids_of(result, key="id"):
    return sorted(r[key] for r in result["data"])
