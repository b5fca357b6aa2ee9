"""EXISTS / NOT EXISTS / counted EXISTS — the C600-C613 contract analogs,
including EXISTS inside OR groups (C603) and nested EXISTS (C604)."""

from __future__ import annotations

import pytest

from concept_multi_db_query_engine_spark import ValidationError


def run(engine, **defn):
    return engine.query(defn)


def ids_of(result, key="id"):
    return sorted(r[key] for r in result["data"])


class TestExists:
    def test_plain_exists(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"table": "sampleItems", "exists": True}],
        })
        assert ids_of(res) == [1, 2, 3, 5]  # sample 4 has no items

    def test_not_exists(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"table": "sampleItems", "exists": False}],
        })
        assert ids_of(res) == [4]

    def test_exists_with_inner_filter(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{
                "table": "sampleItems", "exists": True,
                "filters": [{"column": "category", "operator": "=",
                             "value": "electronics"}],
            }],
        })
        assert ids_of(res) == [1, 3, 5]

    def test_c603_exists_inside_or_group(self, engine):
        # EXISTS composed with OR — cannot be a plain semi-join
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{
                "logic": "or",
                "conditions": [
                    {"table": "sampleItems", "exists": False},
                    {"column": "status", "operator": "=", "value": "paid"},
                ],
            }],
        })
        assert ids_of(res) == [2, 4]

    def test_c604_nested_exists(self, engine):
        # samples with an item that has a detail: items 1,2,3,5 have details
        # → samples 1 (items 1,2), 2 (item 3), 5 (item 5=item-E id5)
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{
                "table": "sampleItems", "exists": True,
                "filters": [{"table": "sampleDetails", "exists": True}],
            }],
        })
        assert ids_of(res) == [1, 2, 5]

    def test_nested_not_exists(self, engine):
        # samples whose EVERY item lacks details → samples with an item
        # having no detail: items 4 (sample 3), 6 (sample 5)
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{
                "table": "sampleItems", "exists": True,
                "filters": [{"table": "sampleDetails", "exists": False}],
            }],
        })
        assert ids_of(res) == [3, 5]

    def test_exists_on_self_relation(self, engine):
        # samples that manage someone: ids 1 (manages 2,3) and 2 (manages 5)
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"table": "samples", "exists": True}],
        })
        assert ids_of(res) == [1, 2]


class TestCountedExists:
    @pytest.mark.parametrize(
        "op,value,expected",
        [
            ("=", 2, [1, 5]),
            ("!=", 2, [2, 3, 4]),
            (">", 1, [1, 5]),
            (">=", 1, [1, 2, 3, 5]),
            ("<", 1, [4]),       # zero-child parents included (C611)
            ("<=", 1, [2, 3, 4]),
            ("=", 0, [4]),
            (">=", 0, [1, 2, 3, 4, 5]),
        ],
    )
    def test_counted_exists(self, engine, op, value, expected):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{
                "table": "sampleItems",
                "count": {"operator": op, "value": value},
            }],
        })
        assert ids_of(res) == expected

    def test_counted_with_inner_filter(self, engine):
        # samples with >= 2 active items: sample 1 (item-A, item-B)
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{
                "table": "sampleItems",
                "count": {"operator": ">=", "value": 2},
                "filters": [{"column": "status", "operator": "=",
                             "value": "active"}],
            }],
        })
        assert ids_of(res) == [1]

    def test_c605_counted_gte_1_equals_plain_exists(self, engine):
        a = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"table": "sampleItems",
                         "count": {"operator": ">=", "value": 1}}],
        })
        b = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{"table": "sampleItems", "exists": True}],
        })
        assert ids_of(a) == ids_of(b)

    def test_counted_inside_or_group(self, engine):
        res = run(engine, **{
            "from": "samples", "columns": ["id"],
            "filters": [{
                "logic": "or",
                "conditions": [
                    {"table": "sampleItems",
                     "count": {"operator": ">=", "value": 2}},
                    {"column": "status", "operator": "=", "value": "cancelled"},
                ],
            }],
        })
        assert ids_of(res) == [1, 3, 5]

    def test_negative_count_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{
                "from": "samples",
                "filters": [{"table": "sampleItems",
                             "count": {"operator": ">=", "value": -1}}],
            })
        assert "INVALID_EXISTS" in e.value.error_codes

    def test_unrelated_exists_rejected(self, engine):
        with pytest.raises(ValidationError) as e:
            run(engine, **{
                "from": "samples",
                "filters": [{"table": "products", "exists": True}],
            })
        assert "INVALID_EXISTS" in e.value.error_codes
