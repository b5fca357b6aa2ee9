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


def test_front_50_carries_the_round6_composition():
    front = list(entry_mod.queries())[:50]
    # the 25 round-5b/5c rows that have never had a driver row (the
    # round-5 verdict's top item) grade on first appearance this round
    first_appearance = {
        "stats_corr_matrix", "stats_ols_regression", "events_ab_test",
        "docs_chi_square", "embeddings_kmeans",
        "embeddings_kmeans_centroids", "embeddings_random_projection",
        "embeddings_pq_encode", "sim_topk_pq", "stats_ols_by_group",
        "stats_ks_test", "stats_welch_t_test", "stats_mann_whitney",
        "dedup_containment", "text_char_entropy", "orders_psi_drift",
        "graph_triangles", "docs_token_jsd_drift",
        "embeddings_corpus_stats", "events_kmv_resemblance",
        "sim_topk_rp_lsh", "events_session_stats",
        "graph_personalized_pagerank", "text_unigram_logprob",
        "text_bigram_logprob",
    }
    missing = first_appearance - set(front)
    assert not missing, f"queued r5b/5c rows fell out: {missing}"
    # rows whose runtime or module changed this round must re-verify
    for name in ("dedup_minhash_lsh", "dedup_minhash_estimate",
                 "rolling_revenue_7d", "order_value_quantiles",
                 "customer_revenue_deciles", "graph_pagerank_dangling"):
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
