from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from concept_multi_db_query_engine_spark import MultiDb  # noqa: E402
from concept_multi_db_query_engine_spark.cache import MemoryCache  # noqa: E402
from concept_multi_db_query_engine_spark.session import get_spark  # noqa: E402

from tests import fixtures  # noqa: E402

# The `slow` tier is data-driven: tests/slow_tests.txt lists the exact
# node ids of the heavyweight end-to-end/scale/fuzz tests (measured
# >= ~3 s each on an idle machine).  A collection hook applies the
# marker so parametrized functions (e.g. test_parity[...]) can have
# only their slow PARAMETERS tiered out, keeping the cheap parameters
# in the default run.  pytest.ini deselects `slow` by default; run the
# full suite with `-m ""`.
_SLOW_IDS = frozenset(
    ln.strip()
    for ln in (Path(__file__).resolve().parent / "slow_tests.txt")
    .read_text()
    .splitlines()
    if ln.strip() and not ln.lstrip().startswith("#")
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        nid = item.nodeid
        if nid in _SLOW_IDS or f"tests/{nid}" in _SLOW_IDS:
            item.add_marker(pytest.mark.slow)


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
