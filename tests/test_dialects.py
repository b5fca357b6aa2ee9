"""Golden-SQL-shape tests for the Postgres / ClickHouse / Trino dialect
renderers (reference SQL_DIALECTS.md:5-28 dialect table, :30 counted-subquery
strategies, :32-57 type maps, :203-207 Trino catalog qualification; test
style mirrors TESTS.md:209-320's golden-SQL assertions).

All three dialects render from the SAME ResolvedPlan the contract-fixture
engine resolves, so these are end-to-end ``executeMode: 'sql-only'`` checks
through validation + ACL + planner + resolver — not unit tests of the
renderer in isolation.
"""

from __future__ import annotations

import pytest

from concept_multi_db_query_engine_spark import MultiDb
from concept_multi_db_query_engine_spark.dialects import (
    ClickHouseRenderer,
    PostgresRenderer,
    TrinoRenderer,
    renderer_for,
)

from tests import fixtures

ADMIN = {"roles": {"user": ["admin"]}}


def _sql(engine, defn, context=ADMIN):
    res = engine.query({**defn, "executeMode": "sql-only"}, context)
    assert res["kind"] == "sql"
    return res["sql"], res["params"]


@pytest.fixture(scope="module")
def engine(spark):
    """Contract-fixture engine: pg-main is engine 'postgres', ch-analytics
    is engine 'clickhouse' — single-DB queries pick those dialects."""
    return MultiDb(
        spark, fixtures.METADATA, fixtures.ROLES,
        fixtures.build_registry(spark),
    )


class TestDialectSelection:
    def test_pg_table_renders_postgres(self, engine):
        res = engine.query(
            {"from": "orders", "columns": ["status"],
             "executeMode": "sql-only"}, ADMIN)
        assert res["meta"]["dialect"] == "postgres"
        assert '"order_status"' in res["sql"]  # double-quoted identifiers

    def test_ch_table_renders_clickhouse(self, engine):
        res = engine.query(
            {"from": "events", "columns": ["type"],
             "executeMode": "sql-only"}, ADMIN)
        assert res["meta"]["dialect"] == "clickhouse"
        assert "`event_type`" in res["sql"]  # backtick-quoted identifiers

    def test_cross_db_renders_trino(self, engine):
        res = engine.query(
            {"from": "events", "columns": ["id"],
             "joins": [{"table": "users", "columns": []}],
             "executeMode": "sql-only"}, ADMIN)
        assert res["meta"]["dialect"] == "trino"
        assert res["meta"]["strategy"] == "trino-cross-db"


class TestPostgres:
    def test_placeholders_are_dollar_numbered(self, engine):
        sql, params = _sql(engine, {
            "from": "orders", "columns": ["id"],
            "filters": [{"column": "status", "operator": "=",
                         "value": "active"}],
        })
        assert "$1" in sql
        assert params == ["active"]

    def test_in_renders_any_with_array_cast(self, engine):
        sql, params = _sql(engine, {
            "from": "orders", "columns": ["id"],
            "filters": [{"column": "status", "operator": "in",
                         "value": ["active", "pending"]}],
        })
        assert "= ANY($1::text[])" in sql
        assert params == [["active", "pending"]]

    def test_not_in_renders_all(self, engine):
        sql, _ = _sql(engine, {
            "from": "orders", "columns": ["id"],
            "filters": [{"column": "quantity", "operator": "notIn",
                         "value": [1, 2]}],
        })
        assert "<> ALL($1::integer[])" in sql

    def test_ilike_native(self, engine):
        sql, _ = _sql(engine, {
            "from": "orders", "columns": ["id"],
            "filters": [{"column": "status", "operator": "ilike",
                         "value": "ACT%"}],
        })
        assert "ILIKE $1" in sql

    def test_levenshtein_fn(self, engine):
        sql, params = _sql(engine, {
            "from": "orders", "columns": ["id"],
            "filters": [{"column": "status", "operator": "levenshteinLte",
                         "value": {"text": "activ", "maxDistance": 2}}],
        })
        assert "levenshtein(" in sql and "<= $2" in sql
        assert params == ["activ", 2]

    def test_array_ops(self, engine):
        sql, _ = _sql(engine, {
            "from": "samples", "columns": ["id"],
            "filters": [
                {"column": "tags", "operator": "arrayContains",
                 "value": "a"},
                {"column": "tags", "operator": "arrayContainsAll",
                 "value": ["a", "b"]},
                {"column": "tags", "operator": "arrayContainsAny",
                 "value": ["a", "b"]},
                {"column": "tags", "operator": "arrayIsEmpty"},
            ],
        })
        assert "$1::text = ANY(" in sql
        assert "@> $2::text[]" in sql
        assert "&& $3::text[]" in sql
        assert "cardinality(" in sql

    def test_counted_exists_gte_short_circuits_with_limit(self, engine):
        sql, params = _sql(engine, {
            "from": "samples", "columns": ["id"],
            "filters": [{"table": "sampleItems",
                         "count": {"operator": ">=", "value": 2}}],
        })
        assert "LIMIT 2" in sql and ">= $1" in sql
        assert params == [2]

    def test_counted_exists_lt_stays_correlated(self, engine):
        sql, _ = _sql(engine, {
            "from": "samples", "columns": ["id"],
            "filters": [{"table": "sampleItems",
                         "count": {"operator": "<", "value": 2}}],
        })
        assert "(SELECT COUNT(*) FROM" in sql and "< $1" in sql
        assert "LIMIT" not in sql


class TestClickHouse:
    def test_named_typed_placeholders(self, engine):
        sql, params = _sql(engine, {
            "from": "events", "columns": ["id"],
            "filters": [{"column": "type", "operator": "=",
                         "value": "purchase"}],
        })
        assert "{p1:String}" in sql
        assert params == ["purchase"]

    def test_in_renders_tuple(self, engine):
        sql, _ = _sql(engine, {
            "from": "events", "columns": ["id"],
            "filters": [{"column": "orderId", "operator": "in",
                         "value": [1, 2]}],
        })
        assert "IN tuple({p1:Int32}, {p2:Int32})" in sql

    def test_ilike_function_form(self, engine):
        sql, _ = _sql(engine, {
            "from": "events", "columns": ["id"],
            "filters": [{"column": "type", "operator": "ilike",
                         "value": "PUR%"}],
        })
        assert "ilike(" in sql

    def test_starts_with_native_function(self, engine):
        sql, params = _sql(engine, {
            "from": "events", "columns": ["id"],
            "filters": [{"column": "type", "operator": "startsWith",
                         "value": "pur"}],
        })
        assert "startsWith(" in sql
        assert params == ["pur"]  # plain text, not a LIKE pattern

    def test_not_between_wraps_in_not(self, engine):
        sql, _ = _sql(engine, {
            "from": "events", "columns": ["id"],
            "filters": [{"column": "orderId", "operator": "notBetween",
                         "value": {"from": 1, "to": 5}}],
        })
        assert "NOT (" in sql and "BETWEEN" in sql

    def test_levenshtein_edit_distance_uint32(self, engine):
        sql, _ = _sql(engine, {
            "from": "events", "columns": ["id"],
            "filters": [{"column": "type", "operator": "levenshteinLte",
                         "value": {"text": "purchse", "maxDistance": 2}}],
        })
        assert "editDistance(" in sql and "{p2:UInt32}" in sql

    def test_array_ops_function_forms(self, engine):
        sql, _ = _sql(engine, {
            "from": "events", "columns": ["id"],
            "filters": [
                {"column": "tags", "operator": "arrayContains",
                 "value": "a"},
                {"column": "tags", "operator": "arrayContainsAll",
                 "value": ["a", "b"]},
                {"column": "tags", "operator": "arrayIsNotEmpty"},
            ],
        })
        assert "has(" in sql and "hasAll(" in sql and "notEmpty(" in sql

    def test_null_inclusive_ne_expands(self, engine):
        # no IS DISTINCT FROM in ClickHouse: != becomes (<> OR IS NULL)
        sql, _ = _sql(engine, {
            "from": "events", "columns": ["id"],
            "filters": [{"column": "type", "operator": "!=",
                         "value": "purchase"}],
        })
        assert "<> {p1:String}" in sql and "IS NULL" in sql

    def _counted(self, op, value=2):
        from concept_multi_db_query_engine_spark.plans import ExistsPlan

        return ExistsPlan(
            alias="s2", table_id="chSampleItems", database="ch-analytics",
            physical_name="sample_items", outer_alias="t0",
            outer_physical="id", child_physical="sample_id",
            child_is_fk_side=True, count_op=op, count_value=value,
        )

    def test_counted_exists_gte_decorrelates(self):
        sql = ClickHouseRenderer()._tree(self._counted(">="))
        assert "GROUP BY" in sql and "HAVING COUNT(*) >=" in sql
        assert " IN (SELECT" in sql

    def test_counted_exists_lte_inverts_to_not_in(self):
        # <= N inverts: NOT IN (... HAVING COUNT(*) > N) — keeps
        # zero-child parents (CROSS_DB_NORMALIZATION.md:14-28)
        sql = ClickHouseRenderer()._tree(self._counted("<="))
        assert "NOT IN (SELECT" in sql and "HAVING COUNT(*) >" in sql

    def test_counted_exists_eq_stays_correlated(self):
        # the threshold param is hardcoded UInt64 (SQL_DIALECTS.md:20, :55)
        sql = ClickHouseRenderer()._tree(self._counted("="))
        assert "(SELECT COUNT(*) FROM" in sql and "= {p1:UInt64}" in sql

    def test_decorrelated_guards_null_fk(self):
        # a NULL fk entering the NOT IN list would empty the result set on
        # CH/Trino; the subquery must filter it (and a NULL fk never
        # correlates, so the guard is semantics-preserving for IN too)
        for op in ("<=", ">="):
            sql = ClickHouseRenderer()._tree(self._counted(op))
            assert "IS NOT NULL" in sql, sql

    def test_timestamp_params_wrap_parse_best_effort(self, engine):
        # CH DateTime params reject ISO-8601 'Z' suffixes — timestamp
        # params render parseDateTimeBestEffort({pN:String})
        # (CROSS_DB_NORMALIZATION.md §2, C133)
        sql, params = _sql(engine, {
            "from": "events", "columns": ["id"],
            "filters": [{"column": "timestamp", "operator": "between",
                         "value": {"from": "2024-01-01T00:00:00Z",
                                   "to": "2024-03-31T23:59:59Z"}}],
        })
        assert "parseDateTimeBestEffort({p1:String})" in sql
        assert "parseDateTimeBestEffort({p2:String})" in sql
        assert "{p1:DateTime}" not in sql
        import datetime as dt

        assert [p.replace(tzinfo=None) if isinstance(p, dt.datetime) else p
                for p in params] == [dt.datetime(2024, 1, 1, 0, 0, 0),
                                     dt.datetime(2024, 3, 31, 23, 59, 59)]
        sql, _ = _sql(engine, {
            "from": "events", "columns": ["id"],
            "filters": [{"column": "timestamp", "operator": ">=",
                         "value": "2024-01-01T00:00:00Z"}],
        })
        assert "parseDateTimeBestEffort({p1:String})" in sql


class TestTrino:
    def test_question_mark_placeholders(self, engine):
        sql, params = _sql(engine, {
            "from": "events", "columns": ["id"],
            "joins": [{"table": "users", "columns": []}],
            "filters": [{"column": "type", "operator": "=",
                         "value": "click"}],
        })
        assert "?" in sql
        assert params == ["click"]

    def test_catalog_qualified_tables(self, engine):
        # cross-DB federation qualifies EVERY table with its catalog
        # (SQL_DIALECTS.md:203-207); fixtures declare no trinoCatalog so
        # the database id is the qualifier
        sql, _ = _sql(engine, {
            "from": "events", "columns": ["id"],
            "joins": [{"table": "users", "columns": []}],
        })
        assert '"ch-analytics".' in sql and '"pg-main".' in sql

    def test_lower_like_lower_for_ilike(self, engine):
        sql, _ = _sql(engine, {
            "from": "events", "columns": ["id"],
            "joins": [{"table": "users", "columns": []}],
            "filters": [{"column": "type", "operator": "ilike",
                         "value": "CLI%"}],
        })
        assert "lower(" in sql and "LIKE lower(" in sql


class TestRendererRegistry:
    def test_renderer_for_known_dialects(self):
        assert isinstance(renderer_for("postgres"), PostgresRenderer)
        assert isinstance(renderer_for("clickhouse"), ClickHouseRenderer)
        assert isinstance(renderer_for("trino"), TrinoRenderer)

    def test_unknown_falls_back_to_spark(self):
        r = renderer_for(None)
        assert r.dialect == "spark"

    def test_pg_quote_doubles_embedded_quotes(self):
        assert PostgresRenderer().quote('a"b') == '"a""b"'

    def test_ch_quote_doubles_backticks(self):
        assert ClickHouseRenderer().quote("a`b") == "`a``b`"


class TestParamOrdering:
    """Placeholder numbering must match params order exactly — the bug
    class a decorrelating dialect can introduce by re-walking the inner
    filter tree (double-registering its parameters)."""

    def _counted_with_inner_filter(self, op):
        from concept_multi_db_query_engine_spark.plans import (
            ExistsPlan,
            GroupNode,
            ValueFilter,
        )

        inner = GroupNode("and", [
            ValueFilter("s2", "status", "string", "=", "shipped"),
        ])
        return ExistsPlan(
            alias="s2", table_id="items", database="db",
            physical_name="items", outer_alias="t0", outer_physical="id",
            child_physical="parent_id", child_is_fk_side=True,
            where=inner, count_op=op, count_value=3,
        )

    def test_clickhouse_decorrelated_params_register_once(self):
        r = ClickHouseRenderer()
        sql = r._tree(self._counted_with_inner_filter(">="))
        assert r.params == ["shipped", 3]
        # threshold is the hardcoded-UInt64 context (SQL_DIALECTS.md:55)
        assert "{p1:String}" in sql and "{p2:UInt64}" in sql
        assert "{p3" not in sql

    def test_postgres_limit_form_params_register_once(self):
        r = PostgresRenderer()
        sql = r._tree(self._counted_with_inner_filter(">"))
        assert r.params == ["shipped", 3]
        assert "$1" in sql and "$2" in sql and "$3" not in sql
        assert "LIMIT 4" in sql  # strict > N short-circuits at N+1

    def test_trino_not_in_inversion_params_register_once(self):
        r = TrinoRenderer()
        sql = r._tree(self._counted_with_inner_filter("<="))
        assert r.params == ["shipped", 3]
        assert sql.count("?") == 2
        assert "NOT IN (SELECT" in sql and "HAVING COUNT(*) >" in sql
