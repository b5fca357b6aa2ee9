"""Joins (C200-C207) and aggregations/groupBy/having (C300-C326 analogs)."""

from __future__ import annotations

from decimal import Decimal

import pytest

from concept_multi_db_query_engine_spark import ValidationError


def run(engine, **defn):
    return engine.query(defn)


def ids_of(result, key="id"):
    return sorted(r[key] for r in result["data"])


class TestJoins:
    def test_c200_left_join_default(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "joins": [{"table": "sampleItems", "columns": ["label"]}],
        })
        # left join: sample 4 (no items) kept with NULL label
        assert len(res["data"]) == 7
        labels_for_4 = [r["label"] for r in res["data"] if r["id"] == 4]
        assert labels_for_4 == [None]

    def test_c201_inner_join(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "joins": [{"table": "sampleItems", "type": "inner",
                       "columns": ["label"]}],
        })
        assert 4 not in ids_of(res)
        assert len(res["data"]) == 6

    def test_c202_transitive_three_table_join(self, engine):
        # sampleDetails relates to sampleItems (already joined), not samples
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "joins": [
                {"table": "sampleItems", "type": "inner", "columns": ["label"]},
                {"table": "sampleDetails", "type": "inner", "columns": ["info"]},
            ],
        })
        assert len(res["data"]) == 4  # 4 detail rows
        assert {r["label"] for r in res["data"]} == {
            "item-A", "item-B", "item-C", "item-E",
        }

    def test_c203_join_column_selection(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "joins": [{"table": "sampleItems", "columns": ["label"]}],
        })
        assert set(res["data"][0].keys()) == {"id", "label"}

    def test_c204_join_for_group_only(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": [],
            "joins": [{"table": "sampleItems", "type": "inner", "columns": []}],
            "groupBy": [{"column": "category", "table": "sampleItems"}],
            "aggregations": [{"column": "*", "fn": "count", "alias": "n"}],
        })
        # no sampleItem columns in SELECT (columns: []) — rows carry only the
        # aggregate, one per group
        assert all(set(r.keys()) == {"n"} for r in res["data"])
        assert sorted(r["n"] for r in res["data"]) == [1, 2, 3]

    def test_c205_join_scoped_filter_acts_inner(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "joins": [{
                "table": "sampleItems", "columns": ["label"],
                "filters": [{"column": "category", "operator": "=",
                             "value": "electronics"}],
            }],
        })
        # WHERE placement: LEFT JOIN + filter behaves as INNER (QUERY.md:57-60)
        assert ids_of(res) == [1, 3, 5]
        assert {r["label"] for r in res["data"]} == {
            "item-A", "item-D", "item-F",
        }

    def test_c206_collision_qualification(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id", "category"],
            "joins": [{"table": "sampleItems", "type": "inner",
                       "columns": ["id", "category"]}],
        })
        keys = set(res["data"][0].keys())
        assert keys == {"samples.id", "samples.category", "sampleItems.id",
                        "sampleItems.category"}
        meta_names = {c["apiName"] for c in res["meta"]["columns"]}
        assert meta_names == keys

    def test_c207_top_level_vs_join_scoped_filter_equal(self, engine):
        a = run(engine, **{
            "from": "samples", "columns": ["id"],
            "joins": [{
                "table": "sampleItems", "columns": ["id"],
                "filters": [{"column": "category", "operator": "=",
                             "value": "electronics"}],
            }],
        })
        b = run(engine, **{
            "from": "samples", "columns": ["id"],
            "joins": [{"table": "sampleItems", "columns": ["id"]}],
            "filters": [{"column": "category", "table": "sampleItems",
                         "operator": "=", "value": "electronics"}],
        })
        key = lambda r: (r["samples.id"], r["sampleItems.id"])  # noqa: E731
        assert sorted(a["data"], key=key) == sorted(b["data"], key=key)

    def test_self_join_rejected(self, engine):
        # explicit self-join is not supported (SURVEY §2.4); self-reference
        # works only through relations (e.g. managerId EXISTS filters)
        with pytest.raises(ValidationError) as e:
            run(engine, **{
                "from": "samples", "columns": ["id"],
                "joins": [{"table": "samples"}],
            })
        assert "INVALID_JOIN" in e.value.error_codes

    def test_unrelated_join_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{
                "from": "samples",
                "joins": [{"table": "products"}],
            })
        assert "INVALID_JOIN" in e.value.error_codes

    def test_cross_database_join_is_federated(self, engine):
        # users (pg-main) × events (ch-analytics) → trino-cross-db analog
        res = run(engine, **{
            "from": "users", "columns": ["id"],
            "joins": [{"table": "events", "type": "inner", "columns": ["type"]}],
        })
        assert res["meta"]["strategy"] == "trino-cross-db"
        assert len(res["data"]) == 3


class TestAggregations:
    def test_c300_count_star(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": [],
            "aggregations": [{"column": "*", "fn": "count", "alias": "total"}],
        })
        assert res["data"] == [{"total": 5}]

    def test_count_column_skips_nulls(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": [],
            "aggregations": [{"column": "discount", "fn": "count",
                              "alias": "n"}],
        })
        assert res["data"] == [{"n": 3}]

    def test_sum_avg_min_max(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": [],
            "aggregations": [
                {"column": "amount", "fn": "sum", "alias": "s"},
                {"column": "amount", "fn": "min", "alias": "lo"},
                {"column": "amount", "fn": "max", "alias": "hi"},
            ],
        })
        row = res["data"][0]
        assert row["s"] == Decimal("800")
        assert row["lo"] == Decimal("50")
        assert row["hi"] == Decimal("300")

    def test_group_by_with_count(self, engine):
        res = run(engine, **{
            "from": "samples",
            "groupBy": [{"column": "category"}],
            "aggregations": [{"column": "*", "fn": "count", "alias": "n"}],
            "orderBy": [{"column": "n", "direction": "desc"},
                        {"column": "category", "direction": "asc"}],
        })
        assert [(r["category"], r["n"]) for r in res["data"]] == [
            ("electronics", 3), ("clothing", 1), ("food", 1),
        ]

    def test_group_by_joined_column_aggregation(self, engine):
        # SUM over a joined table's column with table qualifier (QUERY.md:29)
        res = run(engine, **{
            "from": "samples", "columns": ["category"],
            "joins": [{"table": "sampleItems", "type": "inner", "columns": []}],
            "groupBy": [{"column": "category"}],
            "aggregations": [{"column": "amount", "table": "sampleItems",
                              "fn": "sum", "alias": "itemTotal"}],
            "orderBy": [{"column": "category", "direction": "asc"}],
        })
        assert [(r["category"], r["itemTotal"]) for r in res["data"]] == [
            ("clothing", Decimal("40")),
            ("electronics", Decimal("235")),
        ]

    def test_having_on_alias(self, engine):
        res = run(engine, **{
            "from": "samples",
            "groupBy": [{"column": "category"}],
            "aggregations": [{"column": "amount", "fn": "sum", "alias": "s"}],
            "having": [{"column": "s", "operator": ">", "value": 150}],
            "orderBy": [{"column": "category", "direction": "asc"}],
        })
        assert [r["category"] for r in res["data"]] == ["clothing", "electronics",
                                                        "food"]
        res = run(engine, **{
            "from": "samples",
            "groupBy": [{"column": "category"}],
            "aggregations": [{"column": "amount", "fn": "sum", "alias": "s"}],
            "having": [{"column": "s", "operator": ">", "value": 250}],
        })
        assert {r["category"] for r in res["data"]} == {"electronics", "food"}

    def test_avg_returns_fractional(self, engine):
        res = run(engine, **{
            "from": "sampleItems", "columns": [],
            "aggregations": [{"column": "quantity", "fn": "avg",
                              "alias": "avgQty"}],
        })
        assert abs(float(res["data"][0]["avgQty"]) - 14 / 6) < 1e-9
        meta = res["meta"]["columns"][0]
        assert meta["type"] == "decimal"  # avg → always decimal (QUERY.md:173)

    def test_sum_all_null_group_is_null(self, engine):
        # C326 analog: discount of 'paid' samples is all-NULL → SUM NULL
        res = run(engine, **{
            "from": "samples",
            "filters": [{"column": "status", "operator": "=", "value": "paid"}],
            "groupBy": [{"column": "status"}],
            "aggregations": [{"column": "discount", "fn": "sum", "alias": "s"}],
        })
        assert res["data"] == [{"status": "paid", "s": None}]

    def test_having_is_null_on_all_null_sum(self, engine):
        res = run(engine, **{
            "from": "samples",
            "groupBy": [{"column": "status"}],
            "aggregations": [{"column": "discount", "fn": "sum", "alias": "s"}],
            "having": [{"column": "s", "operator": "isNull"}],
        })
        assert {r["status"] for r in res["data"]} == {"paid"}

    def test_ungrouped_selected_column_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{
                "from": "samples", "columns": ["name"],
                "groupBy": [{"column": "category"}],
                "aggregations": [{"column": "*", "fn": "count", "alias": "n"}],
            })
        assert "INVALID_GROUP_BY" in e.value.error_codes

    def test_having_without_aggregations_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{
                "from": "samples",
                "having": [{"column": "x", "operator": ">", "value": 1}],
            })
        assert "INVALID_HAVING" in e.value.error_codes

    def test_having_non_alias_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{
                "from": "samples",
                "groupBy": [{"column": "category"}],
                "aggregations": [{"column": "*", "fn": "count", "alias": "n"}],
                "having": [{"column": "amount", "operator": ">", "value": 1}],
            })
        assert "INVALID_HAVING" in e.value.error_codes

    def test_duplicate_alias_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{
                "from": "samples", "columns": [],
                "aggregations": [
                    {"column": "*", "fn": "count", "alias": "x"},
                    {"column": "amount", "fn": "sum", "alias": "x"},
                ],
            })
        assert "INVALID_AGGREGATION" in e.value.error_codes

    def test_array_group_by_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{
                "from": "samples",
                "groupBy": [{"column": "tags"}],
                "aggregations": [{"column": "*", "fn": "count", "alias": "n"}],
            })
        assert "INVALID_GROUP_BY" in e.value.error_codes
