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


def test_front_50_carries_the_round7_composition():
    front = list(entry_mod.queries())[:50]
    # the 26 round-6 rows that have never had a driver row (the round-6
    # verdict's top item) grade on first appearance this round
    first_appearance = {
        "dedup_semantic", "dedup_semantic_survivors",
        "docs_bpe_train", "docs_bpe_encode",
        "stats_bootstrap_ci", "stats_bh_correction", "events_mad_outliers",
        "graph_label_propagation", "docs_url_dedup",
        "docs_importance_weights", "events_windowed_funnel",
        "events_heavy_hitters", "docs_best_fit_pack", "embeddings_whiten",
        "sim_cosine_histogram", "events_session_paths",
        "events_reservoir_sample", "events_daily_ewma",
        "orders_zorder_layout", "events_skew_report",
        "corpus_snapshot_diff", "docs_truncation_report",
        "corpus_budget_allocation", "orders_equidepth_histogram",
        "orders_frequent_values", "docs_dup_ngram_fraction",
    }
    missing = first_appearance - set(front)
    assert not missing, f"queued round-6 rows fell out: {missing}"
    # rows whose sf0.1 bench regressed in round 6 re-verify as guards
    for name in ("stats_corr_matrix", "dedup_containment"):
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
