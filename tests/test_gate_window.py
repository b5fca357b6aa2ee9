"""Pins the driver-facing gate composition: the correctness gate grades
the FIRST 50 ``queries()`` entries, and this round's window carries the
stale-round-1 rotation (the round-4 verdict's top item). An accidental
reorder before grading would silently waste the window — this test makes
that a loud failure. Update deliberately when rotating next round."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_every_query_has_an_oracle():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(q) == set(o), (
        f"missing oracles: {sorted(set(q) - set(o))}; "
        f"orphan oracles: {sorted(set(o) - set(q))}"
    )


def test_front_50_carries_the_stale_r1_rotation():
    front = list(entry_mod.queries())[:50]
    stale_r1 = {
        "tpch_q1", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q7",
        "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q13", "tpch_q14",
        "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18", "tpch_q19",
        "tpch_q22", "by_ids", "federated_join", "group_by_no_agg",
        "order_limit_offset",
    }
    missing = stale_r1 - set(front)
    assert not missing, f"stale-r1 rows fell out of the window: {missing}"
    # the round-5 code-change re-verifies must also be inside
    for name in ("order_value_quantiles", "customer_revenue_deciles",
                 "events_hourly_anomaly"):
        assert name in front, name


def test_gate_priority_names_are_real_and_unique():
    # `ordered = {n: out.pop(n) for n in _GATE_PRIORITY if n in out}`
    # silently ignores unknown names — a typo would quietly drop a row
    # out of its intended grading slot. (The core-DSL block is
    # intentionally absent from the list: it rotates as the dict tail.)
    q = set(entry_mod.queries())
    prio = list(entry_mod._GATE_PRIORITY)
    unknown = [n for n in prio if n not in q]
    assert not unknown, f"typo'd names in _GATE_PRIORITY: {unknown}"
    dupes = {n for n in prio if prio.count(n) > 1}
    assert not dupes, f"duplicate names in _GATE_PRIORITY: {dupes}"
