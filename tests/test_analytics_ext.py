"""Edge-case unit tests for the extended analytics operators (as-of join,
sessionization, props rollup) on tiny hand-built frames — the oracle-parity
suite covers the realistic distributions; these pin boundary semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from concept_multi_db_query_engine_spark import operators as ops


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 12, minute, second)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "L1"), (1, _ts(30), "L2"), (2, _ts(5), "L3")],
        "k long, ts timestamp, who string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), "R@10"), (1, _ts(20), "R@20"), (1, _ts(40), "R@40")],
        "k long, ts timestamp, tag string",
    )
    out = {
        r["who"]: r["asof_tag"]
        for r in ops.asof_join(left, right, "k", "ts", ["tag"]).collect()
    }
    # equal timestamps are inclusive (L1 sees R@10); L2 sees R@20 not R@40;
    # key 2 has no right rows at all -> NULL
    assert out == {"L1": "R@10", "L2": "R@20", "L3": None}


def test_asof_join_no_earlier_right_row_is_null(spark):
    left = spark.createDataFrame(
        [(1, _ts(1), "early")], "k long, ts timestamp, who string"
    )
    right = spark.createDataFrame(
        [(1, _ts(2), "later")], "k long, ts timestamp, tag string"
    )
    rows = ops.asof_join(left, right, "k", "ts", ["tag"]).collect()
    assert rows[0]["asof_tag"] is None


def test_sessionize_boundaries(spark):
    # user 1: events at 12:00, 12:10, 13:00 with 30-min gap -> 2 sessions
    events = spark.createDataFrame(
        [
            (1, _ts(0), 1, "a", 1.0, "{}"),
            (2, _ts(10), 1, "b", 2.0, "{}"),
            (3, dt.datetime(2024, 1, 1, 13, 0), 1, "a", 3.0, "{}"),
            (4, _ts(59), 2, "a", 5.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    rows = sorted(
        (r["user_id"], r["n_events"], r["sum_value"])
        for r in ops.sessionize(events, gap_minutes=30).collect()
    )
    assert rows == [(1, 1, 3.0), (1, 2, 3.0), (2, 1, 5.0)]


def test_sessionize_gap_is_strict(spark):
    # exactly 30:00 apart -> same session (strictly-greater starts new)
    events = spark.createDataFrame(
        [(1, _ts(0), 1, "a", 1.0, "{}"), (2, _ts(30), 1, "a", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    rows = ops.sessionize(events, gap_minutes=30).collect()
    assert len(rows) == 1 and rows[0]["n_events"] == 2


def test_props_rollup_null_and_malformed_json(spark):
    events = spark.createDataFrame(
        [
            (1, _ts(0), 1, "a", 0.0, '{"k": 5}'),
            (2, _ts(1), 1, "a", 0.0, None),
            (3, _ts(2), 1, "a", 0.0, "not-json"),
            (4, _ts(3), 1, "a", 0.0, '{"k": 7}'),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    row = ops.props_rollup(events).collect()[0]
    # count(*) counts all rows; sum/min/max/avg skip unparseable -> NULL ks
    assert row["n"] == 4
    assert row["sum_k"] == 12
    assert row["avg_k"] == 6.0
