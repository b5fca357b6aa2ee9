"""End-to-end core slice: projection, the filter operators, orderBy/limit/
offset, distinct, count, byIds — contract sections 3, 7, 8 analogs
(CONTRACT_TESTS.md:455-540, 615-700)."""

from __future__ import annotations

import pytest

from concept_multi_db_query_engine_spark import ValidationError


def ids_of(result, key="id"):
    return sorted(r[key] for r in result["data"])


def run(engine, **defn):
    return engine.query(defn)


class TestBasicSelect:
    def test_c100_equality_filter(self, engine):
        res = run(
            engine, **{
                "from": "samples",
                "filters": [{"column": "status", "operator": "=",
                             "value": "active"}],
            }
        )
        assert res["kind"] == "data"
        assert ids_of(res) == [1, 4]

    def test_select_all_columns_by_default(self, engine):
        res = run(engine, **{"from": "samples"})
        assert len(res["data"]) == 5
        assert set(res["data"][0].keys()) == {
            "id", "name", "email", "category", "amount", "discount", "status",
            "tags", "scores", "isActive", "note", "createdAt", "dueDate",
            "externalId", "managerId",
        }

    def test_column_projection(self, engine):
        res = run(engine, **{"from": "samples", "columns": ["id", "name"]})
        assert set(res["data"][0].keys()) == {"id", "name"}
        assert res["meta"]["columns"][0]["apiName"] == "id"

    def test_distinct(self, engine):
        res = run(engine, **{"from": "samples", "columns": ["category"],
                             "distinct": True})
        cats = sorted(r["category"] for r in res["data"])
        assert cats == ["clothing", "electronics", "food"]

    def test_order_by_desc_limit(self, engine):
        res = run(
            engine, **{
                "from": "samples", "columns": ["id", "amount"],
                "orderBy": [{"column": "amount", "direction": "desc"}],
                "limit": 2,
            }
        )
        assert [r["id"] for r in res["data"]] == [4, 2]

    def test_offset_pagination(self, engine):
        res = run(
            engine, **{
                "from": "samples", "columns": ["id"],
                "orderBy": [{"column": "id", "direction": "asc"}],
                "limit": 2, "offset": 2,
            }
        )
        assert [r["id"] for r in res["data"]] == [3, 4]

    def test_count_mode(self, engine):
        res = run(
            engine, **{
                "from": "samples", "executeMode": "count",
                "filters": [{"column": "category", "operator": "=",
                             "value": "electronics"}],
            }
        )
        assert res["kind"] == "count"
        assert res["count"] == 3
        assert res["meta"]["columns"] == []

    def test_count_ignores_limit_and_order(self, engine):
        res = run(
            engine, **{
                "from": "samples", "executeMode": "count", "limit": 1,
                "orderBy": [{"column": "id", "direction": "asc"}],
            }
        )
        assert res["count"] == 5

    def test_count_distinct_values_c1713(self, engine):
        res = run(
            engine, **{
                "from": "samples", "executeMode": "count",
                "columns": ["category"], "distinct": True,
            }
        )
        assert res["count"] == 3

    def test_by_ids(self, engine):
        res = run(engine, **{"from": "samples", "byIds": [1, 3],
                             "columns": ["id", "name"]})
        assert ids_of(res) == [1, 3]


class TestComparisonOperators:
    @pytest.mark.parametrize(
        "op,value,expected",
        [
            ("=", "electronics", [1, 3, 5]),
            ("!=", "electronics", [2, 4]),
        ],
    )
    def test_eq_ne(self, engine, op, value, expected):
        res = run(engine, **{
            "from": "samples",
            "filters": [{"column": "category", "operator": op, "value": value}],
        })
        assert ids_of(res) == expected

    @pytest.mark.parametrize(
        "op,value,expected",
        [
            (">", 100, [2, 4, 5]),
            (">=", 100, [1, 2, 4, 5]),
            ("<", 100, [3]),
            ("<=", 100, [1, 3]),
        ],
    )
    def test_numeric_comparisons(self, engine, op, value, expected):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "amount", "operator": op, "value": value}],
        })
        assert ids_of(res) == expected

    def test_timestamp_comparison(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "createdAt", "operator": ">",
                         "value": "2024-03-01T00:00:00Z"}],
        })
        assert ids_of(res) == [3, 4, 5]

    def test_date_between(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "dueDate", "operator": "between",
                         "value": {"from": "2024-02-01", "to": "2024-05-01"}}],
        })
        assert ids_of(res) == [1, 2, 4]

    def test_not_between_excludes_nulls(self, engine):
        # sample 3 has NULL dueDate → excluded by 3VL
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "dueDate", "operator": "notBetween",
                         "value": {"from": "2024-02-01", "to": "2024-05-01"}}],
        })
        assert ids_of(res) == [5]


class TestMembershipAndPatterns:
    def test_in(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "status", "operator": "in",
                         "value": ["active", "paid"]}],
        })
        assert ids_of(res) == [1, 2, 4]

    def test_not_in(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "status", "operator": "notIn",
                         "value": ["active", "paid"]}],
        })
        assert ids_of(res) == [3, 5]

    def test_like(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "email", "operator": "like",
                         "value": "%a@test.com"}],
        })
        assert ids_of(res) == [1, 2, 3, 4]  # alpha beta gamma delta

    def test_ilike(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "name", "operator": "ilike",
                         "value": "ALPHA"}],
        })
        assert ids_of(res) == [1]

    def test_contains_literal_percent_safe(self, engine):
        # contains treats value literally (auto-escaped in SQL dialects;
        # literal Contains expression here)
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "note", "operator": "contains",
                         "value": "ote-"}],
        })
        assert ids_of(res) == [1, 3, 5]

    def test_icontains(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "name", "operator": "icontains",
                         "value": "EpsiLON"}],
        })
        assert ids_of(res) == [5]

    def test_starts_ends_with(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "name", "operator": "startsWith",
                         "value": "Be"}],
        })
        assert ids_of(res) == [2]
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "email", "operator": "endsWith",
                         "value": "test.com"}],
        })
        assert len(res["data"]) == 5

    def test_not_contains_excludes_null(self, engine):
        # notContains on note: NULL notes (2, 4) excluded by 3VL
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "note", "operator": "notContains",
                         "value": "note-1"}],
        })
        assert ids_of(res) == [3, 5]

    def test_levenshtein(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "name", "operator": "levenshteinLte",
                         "value": {"text": "Alphax", "maxDistance": 1}}],
        })
        assert ids_of(res) == [1]


class TestNullAndArrayOperators:
    def test_is_null(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "discount", "operator": "isNull"}],
        })
        assert ids_of(res) == [2, 4]

    def test_is_not_null(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "note", "operator": "isNotNull"}],
        })
        assert ids_of(res) == [1, 3, 5]

    def test_array_contains(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "tags", "operator": "arrayContains",
                         "value": "fast"}],
        })
        assert ids_of(res) == [1, 3, 5]

    def test_array_contains_all(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "tags", "operator": "arrayContainsAll",
                         "value": ["fast", "new"]}],
        })
        assert ids_of(res) == [1, 5]

    def test_array_contains_any(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "tags", "operator": "arrayContainsAny",
                         "value": ["new", "slow"]}],
        })
        assert ids_of(res) == [1, 2, 5]

    def test_array_is_empty_null_is_not_empty(self, engine):
        # sample 4 has scores=[]; sample 3 has scores=NULL → NULL ≠ empty
        # (README.md:318 3VL)
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "scores", "operator": "arrayIsEmpty"}],
        })
        assert ids_of(res) == [4]

    def test_array_is_not_empty(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "scores", "operator": "arrayIsNotEmpty"}],
        })
        assert ids_of(res) == [1, 2, 5]


class TestFilterGroups:
    def test_or_group(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{
                "logic": "or",
                "conditions": [
                    {"column": "status", "operator": "=", "value": "paid"},
                    {"column": "amount", "operator": ">", "value": 250},
                ],
            }],
        })
        assert ids_of(res) == [2, 4]

    def test_nested_not_group(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{
                "logic": "or", "not": True,
                "conditions": [
                    {"column": "status", "operator": "=", "value": "active"},
                    {"column": "category", "operator": "=", "value": "clothing"},
                ],
            }],
        })
        assert ids_of(res) == [3, 5]

    def test_column_vs_column_filter(self, engine):
        # discount < amount (both decimal) — rows with non-null discount
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"column": "discount", "operator": "<",
                         "refColumn": "amount"}],
        })
        assert ids_of(res) == [1, 3, 5]


class TestValidationErrors:
    def test_unknown_table(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{"from": "nope"})
        assert "UNKNOWN_TABLE" in e.value.error_codes

    def test_unknown_column(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{"from": "samples", "columns": ["nope"]})
        assert "UNKNOWN_COLUMN" in e.value.error_codes

    def test_errors_collected_not_first_only(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{
                "from": "samples", "columns": ["nope1", "nope2"],
                "limit": -1,
            })
        codes = e.value.error_codes
        assert codes.count("UNKNOWN_COLUMN") == 2
        assert "INVALID_LIMIT" in codes

    def test_empty_in_list_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{
                "from": "samples",
                "filters": [{"column": "status", "operator": "in", "value": []}],
            })
        assert "INVALID_VALUE" in e.value.error_codes

    def test_null_element_in_list_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{
                "from": "samples",
                "filters": [{"column": "status", "operator": "in",
                             "value": ["a", None]}],
            })
        assert "INVALID_VALUE" in e.value.error_codes

    def test_type_mismatch_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{
                "from": "samples",
                "filters": [{"column": "amount", "operator": "=",
                             "value": "not-a-number"}],
            })
        assert "INVALID_VALUE" in e.value.error_codes

    def test_comparison_on_boolean_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{
                "from": "samples",
                "filters": [{"column": "isActive", "operator": ">",
                             "value": True}],
            })
        assert "INVALID_FILTER" in e.value.error_codes

    def test_scalar_op_on_array_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{
                "from": "samples",
                "filters": [{"column": "tags", "operator": "=", "value": "x"}],
            })
        assert "INVALID_FILTER" in e.value.error_codes

    def test_array_op_on_scalar_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{
                "from": "samples",
                "filters": [{"column": "name", "operator": "arrayContains",
                             "value": "x"}],
            })
        assert "INVALID_FILTER" in e.value.error_codes

    def test_is_null_on_non_nullable_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{
                "from": "samples",
                "filters": [{"column": "name", "operator": "isNull"}],
            })
        assert "INVALID_FILTER" in e.value.error_codes

    def test_offset_without_limit_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{"from": "samples", "offset": 5})
        assert "INVALID_LIMIT" in e.value.error_codes

    def test_by_ids_composite_pk_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{"from": "orderItems", "byIds": [1]})
        assert "INVALID_BY_IDS" in e.value.error_codes

    def test_by_ids_empty_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{"from": "samples", "byIds": []})
        assert "INVALID_BY_IDS" in e.value.error_codes

    def test_invalid_enum_operator_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{
                "from": "samples",
                "filters": [{"column": "name", "operator": "DROP TABLE",
                             "value": "x"}],
            })
        assert "INVALID_FILTER" in e.value.error_codes
