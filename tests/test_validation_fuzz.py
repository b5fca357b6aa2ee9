"""Property-based robustness: the zero-I/O validation layer must NEVER
raise on arbitrary JSON-shaped input — it either returns a (possibly empty)
issue list, and every issue carries a stable string code. Raw-JSON queries
bypass static typing in the reference too (SECURITY.md:7-23); this is the
injection-layer-1 guarantee."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from concept_multi_db_query_engine_spark import testdata
from concept_multi_db_query_engine_spark.pipeline import MultiDb
from concept_multi_db_query_engine_spark.sources import (
    MemorySource,
    SourceRegistry,
)


@pytest.fixture(scope="module")
def engine(spark):
    # validation is zero-I/O: empty memory sources suffice
    registry = SourceRegistry({
        "warehouse": MemorySource({}),
        "lake": MemorySource({}),
    })
    return MultiDb(
        spark, testdata.METADATA, testdata.ROLES, registry,
        strict_api_names=False,
    )


_scalar = st.one_of(
    st.none(), st.booleans(), st.integers(), st.floats(allow_nan=False),
    st.text(max_size=12),
)
_value = st.recursive(
    _scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.text(max_size=8), inner, max_size=4),
    ),
    max_leaves=12,
)

_table_name = st.sampled_from(
    ["orders", "customer", "lineitem", "events", "nope", "", 7]
)
_column_name = st.sampled_from(
    ["o_orderkey", "c_custkey", "value", "ghost", "", None, 3.5]
)
_operator = st.sampled_from(
    ["=", "!=", ">", "in", "between", "like", "arrayContains",
     "levenshteinLte", "isNull", "bogus", "", None]
)

_filter = st.fixed_dictionaries(
    {},
    optional={
        "column": _column_name,
        "table": _table_name,
        "operator": _operator,
        "value": _value,
        "refColumn": _column_name,
        "exists": st.booleans(),
        "count": _value,
        "logic": st.sampled_from(["and", "or", "xor", None]),
        "conditions": st.lists(st.deferred(lambda: _filter), max_size=3),
        "filters": st.lists(st.deferred(lambda: _filter), max_size=3),
        "not": _value,
    },
)

_definition = st.fixed_dictionaries(
    {},
    optional={
        "from": _table_name,
        "columns": st.one_of(_value, st.lists(_column_name, max_size=4)),
        "distinct": _value,
        "filters": st.lists(_filter, max_size=4),
        "joins": st.lists(
            st.fixed_dictionaries(
                {},
                optional={
                    "table": _table_name,
                    "type": st.sampled_from(["inner", "left", "full", ""]),
                    "columns": st.lists(_column_name, max_size=3),
                    "filters": st.lists(_filter, max_size=2),
                },
            ),
            max_size=3,
        ),
        "groupBy": _value,
        "aggregations": _value,
        "having": _value,
        "orderBy": _value,
        "limit": _value,
        "offset": _value,
        "byIds": _value,
        "freshness": _value,
        "executeMode": _value,
        "debug": _value,
    },
)


@settings(
    max_examples=300,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(definition=_definition)
def test_validation_never_raises(engine, definition):
    issues = engine.validate_query(definition)
    assert isinstance(issues, list)
    for issue in issues:
        assert isinstance(issue.get("code"), str) and issue["code"]
        assert isinstance(issue.get("message"), str)


@settings(
    max_examples=100,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(definition=_definition, roles=st.lists(
    st.sampled_from(["admin", "restricted", "ghost-role", "", 42]),
    max_size=3,
))
def test_validation_with_contexts_never_raises(engine, definition, roles):
    issues = engine.validate_query(
        definition, {"roles": {"user": roles}}
    )
    assert isinstance(issues, list)


def test_well_formed_query_validates_clean(engine):
    issues = engine.validate_query({
        "from": "orders",
        "columns": ["o_orderkey", "o_totalprice"],
        "filters": [{"column": "o_totalprice", "operator": ">",
                     "value": 100.0}],
        "orderBy": [{"column": "o_orderkey", "direction": "asc"}],
        "limit": 10,
    })
    assert issues == []
