"""Access control scope algebra (METADATA.md:90-99) + masking (C800-C815
analogs)."""

from __future__ import annotations

import pytest

from concept_multi_db_query_engine_spark import ValidationError


def run(engine, defn, context=None):
    return engine.query(defn, context)


class TestScopeAlgebra:
    def test_no_context_unrestricted(self, engine):
        res = run(engine, {"from": "orders", "columns": ["id", "internalNote"]})
        assert len(res["data"]) == 5

    def test_role_column_trimming_on_default_selection(self, engine):
        res = run(
            engine, {"from": "orders"},
            {"roles": {"user": ["viewer"]}},
        )
        assert set(res["data"][0].keys()) == {"id", "status", "createdAt",
                                              "quantity"}

    def test_denied_column_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(
                engine, {"from": "orders", "columns": ["id", "internalNote"]},
                {"roles": {"user": ["viewer"]}},
            )
        assert "ACCESS_DENIED" in e.value.error_codes

    def test_denied_table_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, {"from": "invoices"}, {"roles": {"user": ["viewer"]}})
        assert "ACCESS_DENIED" in e.value.error_codes

    def test_empty_roles_zero_permissions(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, {"from": "orders"}, {"roles": {"user": []}})
        assert "ACCESS_DENIED" in e.value.error_codes

    def test_no_access_role(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, {"from": "orders"}, {"roles": {"user": ["no-access"]}})
        assert "ACCESS_DENIED" in e.value.error_codes

    def test_unknown_role(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, {"from": "orders"}, {"roles": {"user": ["ghost"]}})
        assert "UNKNOWN_ROLE" in e.value.error_codes

    def test_union_within_scope(self, engine):
        # viewer alone can't see orders.total; tenant-user can (masked)
        res = run(
            engine,
            {"from": "orders", "columns": ["id", "total", "quantity"]},
            {"roles": {"user": ["viewer", "tenant-user"]}},
        )
        assert len(res["data"]) == 5

    def test_union_unmasks(self, engine):
        # tenant-user masks total; admin unmasks everything; union = unmasked
        res = run(
            engine,
            {"from": "orders", "columns": ["id", "total"],
             "orderBy": [{"column": "id", "direction": "asc"}]},
            {"roles": {"user": ["tenant-user", "admin"]}},
        )
        assert float(res["data"][0]["total"]) == 100.0
        assert res["meta"]["columns"][1]["masked"] is False

    def test_intersection_between_scopes(self, engine):
        # admin user via orders-service: only orders/products/users visible
        with pytest.raises(ValidationError) as e:
            run(
                engine, {"from": "invoices"},
                {"roles": {"user": ["admin"], "service": ["orders-service"]}},
            )
        assert "ACCESS_DENIED" in e.value.error_codes
        res = run(
            engine, {"from": "orders", "columns": ["id"]},
            {"roles": {"user": ["admin"], "service": ["orders-service"]}},
        )
        assert len(res["data"]) == 5

    def test_masking_from_any_scope_preserved(self, engine):
        # admin (user) unmasks; reporting-service masks total → stays masked
        res = run(
            engine,
            {"from": "orders", "columns": ["id", "total"],
             "orderBy": [{"column": "id", "direction": "asc"}]},
            {"roles": {"user": ["admin"], "service": ["reporting-service"]}},
        )
        assert float(res["data"][0]["total"]) == 0.0  # number-masked
        assert res["meta"]["columns"][1]["masked"] is True


class TestMaskingFunctions:
    def test_email_mask(self, engine):
        res = run(
            engine,
            {"from": "users", "columns": ["id", "email"],
             "byIds": ["uuid-c1"]},
            {"roles": {"user": ["tenant-user"]}},
        )
        # cache path or direct — masking identical
        assert res["data"][0]["email"] == "a***@***.com"

    def test_number_mask(self, engine):
        res = run(
            engine,
            {"from": "orders", "columns": ["id", "total"],
             "filters": [{"column": "id", "operator": "=", "value": 1}]},
            {"roles": {"user": ["tenant-user"]}},
        )
        assert float(res["data"][0]["total"]) == 0.0

    def test_full_and_date_mask(self, engine):
        res = run(
            engine,
            {"from": "orders",
             "columns": ["id", "internalNote", "createdAt", "customerId"],
             "filters": [{"column": "id", "operator": "=", "value": 1}]},
            {"roles": {"user": ["analyst"]}},
        )
        row = res["data"][0]
        assert row["internalNote"] == "***"
        assert str(row["createdAt"]).startswith("2024-01-01")
        assert row["customerId"] == "uuid****"  # uuid mask: first 4 chars

    def test_null_passthrough(self, engine):
        res = run(
            engine,
            {"from": "orders", "columns": ["id", "internalNote"],
             "filters": [{"column": "id", "operator": "=", "value": 2}]},
            {"roles": {"user": ["analyst"]}},
        )
        assert res["data"][0]["internalNote"] is None

    def test_name_and_phone_mask(self, engine):
        res = run(
            engine,
            {"from": "users", "columns": ["id", "firstName", "phone"],
             "filters": [{"column": "id", "operator": "=", "value": "uuid-c1"}]},
            {"roles": {"user": ["analyst"]}},
        )
        row = res["data"][0]
        assert row["firstName"] == "A***e"
        assert row["phone"] == "+1***890"

    def test_aggregation_alias_never_masked(self, engine):
        # total is masked for tenant-user, but SUM(total) alias is unmasked
        res = run(
            engine,
            {"from": "orders", "columns": [],
             "aggregations": [{"column": "total", "fn": "sum",
                               "alias": "totalSum"}]},
            {"roles": {"user": ["tenant-user"]}},
        )
        assert float(res["data"][0]["totalSum"]) == 800.0
        assert res["meta"]["columns"][0]["masked"] is False

    def test_filter_on_masked_column_uses_raw_values(self, engine):
        # masking is post-query: filters see raw data (reference semantics)
        res = run(
            engine,
            {"from": "orders", "columns": ["id", "total"],
             "filters": [{"column": "total", "operator": ">", "value": 150}]},
            {"roles": {"user": ["tenant-user"]}},
        )
        assert sorted(r["id"] for r in res["data"]) == [2, 4]
        assert all(float(r["total"]) == 0.0 for r in res["data"])
