"""Edge-case unit tests for the round-5 operators: grouping-set
rollup/cube, event transitions, co-occurrence, revenue concentration, PII
scrub, C4-style line dedup, rolling active users, table profiling,
integer PageRank, unpivot, histograms, monthly growth, and the one-pass
feature matrix. The driver's DuckDB oracle gate covers realistic
distributions; these pin boundary semantics on tiny hand-built frames."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from concept_multi_db_query_engine_spark import operators as ops
from concept_multi_db_query_engine_spark.operators.graph import SCALE


def _orders(spark):
    return spark.createDataFrame(
        [
            (1, 10, "HIGH", "F", 100.0),
            (2, 10, "HIGH", "O", 50.0),
            (3, 20, "LOW", "F", 25.0),
        ],
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_orderstatus string, o_totalprice double",
    )


# ---- grouped_rollup ----------------------------------------------------


def test_rollup_has_subtotals_and_grand_total(spark):
    rows = {
        (r["priority"], r["status"]): r
        for r in ops.grouped_rollup(_orders(spark), "rollup").collect()
    }
    # leaf rows + per-priority subtotals + grand total, no status-only rows
    assert rows[("HIGH", "F")]["n_orders"] == 1
    assert rows[("HIGH", "ALL")]["n_orders"] == 2
    assert rows[("HIGH", "ALL")]["revenue"] == 150.0
    assert rows[("ALL", "ALL")]["n_orders"] == 3
    assert rows[("ALL", "ALL")]["revenue"] == 175.0
    assert ("ALL", "F") not in rows
    # grouping flags disambiguate subtotal rows from data rows
    assert rows[("HIGH", "ALL")]["g_status"] == 1
    assert rows[("HIGH", "ALL")]["g_pri"] == 0
    assert rows[("ALL", "ALL")] ["g_pri"] == 1


def test_cube_adds_status_marginals(spark):
    rows = {
        (r["priority"], r["status"]): r
        for r in ops.grouped_rollup(_orders(spark), "cube").collect()
    }
    assert rows[("ALL", "F")]["n_orders"] == 2
    assert rows[("ALL", "F")]["revenue"] == 125.0
    assert rows[("ALL", "O")]["n_orders"] == 1
    # full lattice: 3 leaves + 2 pri subtotals + 2 status subtotals + total
    assert len(rows) == 8


def test_rollup_rejects_unknown_mode(spark):
    with pytest.raises(ValueError):
        ops.grouped_rollup(_orders(spark), "grouping_sets")


# ---- event_transitions -------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1, 12, m), u, t, 0.0, "{}")
            for i, (m, u, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_transitions_counts_and_shares(spark):
    # user 1: view -> click -> click ; user 2: view -> click
    ev = _events(
        spark,
        [(0, 1, "view"), (1, 1, "click"), (2, 1, "click"),
         (0, 2, "view"), (1, 2, "click")],
    )
    out = {
        (r["prev_type"], r["next_type"]): r
        for r in ops.event_transitions(ev).collect()
    }
    assert out[("view", "click")]["n_transitions"] == 2
    assert out[("view", "click")]["n_users"] == 2
    assert out[("view", "click")]["share_of_source"] == 1.0
    assert out[("click", "click")]["n_transitions"] == 1
    assert out[("click", "click")]["n_users"] == 1
    # a single-event user contributes no transitions
    assert len(out) == 2


def test_transitions_tie_broken_by_event_id(spark):
    # two events at the identical timestamp: order falls back to event_id,
    # so the walk is view(id 0) -> click(id 1) deterministically
    ev = _events(spark, [(5, 1, "view"), (5, 1, "click")])
    out = ops.event_transitions(ev).collect()
    assert len(out) == 1
    assert (out[0]["prev_type"], out[0]["next_type"]) == ("view", "click")


# ---- revenue_concentration ---------------------------------------------


def test_concentration_shares_are_pareto_ordered(spark):
    orders = spark.createDataFrame(
        [(i, i % 20, "P", "F", float(1000 - i)) for i in range(200)],
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_orderstatus string, o_totalprice double",
    )
    rows = ops.revenue_concentration(orders).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # 20 customers -> 2 per decile; decile 1 holds the biggest spenders
    assert all(r["numcust"] == 2 for r in rows)
    shares = [r["revenue_share"] for r in rows]
    assert shares == sorted(shares, reverse=True)
    assert abs(sum(shares) - 1.0) < 1e-12
    assert abs(rows[-1]["cumulative_share"] - 1.0) < 1e-12
    cums = [r["cumulative_share"] for r in rows]
    assert cums == sorted(cums)


# ---- pii_scrub ---------------------------------------------------------


def test_pii_scrub_redacts_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "reach me at bob.smith+x@corp.example.org or 10.0.0.1 ok"),
            (2, "call +1 555 123 4567 twice: 555 123 4567 also works"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ops.pii_scrub(docs).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_ipv4"] == 1
    assert out[1]["clean_text"] == "reach me at <EMAIL> or <IP> ok"
    assert out[2]["n_phone"] == 2
    assert out[2]["clean_text"] == "call <PHONE> twice: <PHONE> also works"
    assert out[3]["n_email"] == out[3]["n_ipv4"] == out[3]["n_phone"] == 0
    assert out[3]["clean_text"] == "nothing sensitive here"


def test_pii_scrub_counts_are_independent_of_replacement_order(spark):
    # an IP inside an email's domain would be hidden by sequential
    # replacement; counts are measured on the raw text so both report
    docs = spark.createDataFrame(
        [(1, "x@10.0.0.1.example.com")], "doc_id long, text string"
    )
    row = ops.pii_scrub(docs).collect()[0]
    assert row["n_email"] == 1
    assert row["n_ipv4"] == 1  # counted on raw text even though masked
    assert row["clean_text"] == "<EMAIL>"


# ---- line_dedup --------------------------------------------------------


def _lines(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, line_no long, line string"
    )


def test_line_dedup_drops_shared_lines_and_keeps_order(spark):
    lines = _lines(
        spark,
        [
            (1, 0, "unique to one"),
            (1, 1, "shared banner"),
            (1, 2, "also unique"),
            (2, 0, "shared banner"),
            (2, 1, "second doc text"),
        ],
    )
    out = {r["doc_id"]: r for r in ops.line_dedup(lines, 2).collect()}
    assert out[1]["n_lines_kept"] == 2
    assert out[1]["clean_text"] == "unique to one\nalso unique"
    assert out[2]["clean_text"] == "second doc text"


def test_line_dedup_within_doc_repeat_survives(spark):
    # the same line twice in ONE doc is not cross-document boilerplate
    lines = _lines(spark, [(1, 0, "la la"), (1, 1, "la la")])
    out = ops.line_dedup(lines, 2).collect()[0]
    assert out["n_lines_kept"] == 2
    assert out["clean_text"] == "la la\nla la"


def test_line_dedup_doc_losing_all_lines_stays_present(spark):
    lines = _lines(
        spark, [(1, 0, "banner"), (2, 0, "banner"), (3, 0, "real content")]
    )
    out = {r["doc_id"]: r for r in ops.line_dedup(lines, 2).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_lines_kept"] == 0 and out[1]["clean_text"] == ""
    assert out[3]["clean_text"] == "real content"


# ---- rolling_active_users ----------------------------------------------


def test_rolling_active_users_window_semantics(spark):
    # user 1 active on day 1 and day 9; user 2 on day 2 only.
    ev = spark.createDataFrame(
        [
            (0, dt.datetime(2024, 1, 1, 5), 1, "view", 0.0, "{}"),
            (1, dt.datetime(2024, 1, 2, 5), 2, "view", 0.0, "{}"),
            (2, dt.datetime(2024, 1, 9, 5), 1, "view", 0.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        r["day"].day: r["active_users"]
        for r in ops.rolling_active_users(ev, window_days=7).collect()
    }
    # only observed activity days are reported
    assert set(out) == {1, 2, 9}
    assert out[1] == 1          # day 1: user 1
    assert out[2] == 2          # day 2: users 1 (day 1 in window) + 2
    assert out[9] == 1          # day 9: day-2 activity fell out of window


def test_rolling_active_users_no_double_count(spark):
    # the same user active on two days inside one window counts once
    ev = spark.createDataFrame(
        [
            (0, dt.datetime(2024, 1, 1, 5), 7, "view", 0.0, "{}"),
            (1, dt.datetime(2024, 1, 2, 5), 7, "view", 0.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        r["day"].day: r["active_users"]
        for r in ops.rolling_active_users(ev, window_days=7).collect()
    }
    assert out == {1: 1, 2: 1}


# ---- profile_table -----------------------------------------------------


def test_profile_table_per_column_stats(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "b", None), (2, None, 8.0)],
        "k long, s string, v double",
    )
    rows = {r["col_name"]: r for r in ops.profile_table(df).collect()}
    assert set(rows) == {"k", "s", "v"}
    assert all(r["n_rows"] == 3 for r in rows.values())
    assert rows["k"]["n_null"] == 0 and rows["k"]["n_distinct"] == 2
    assert rows["k"]["min_num"] == 1.0 and rows["k"]["max_num"] == 2.0
    assert rows["k"]["min_str"] is None
    assert rows["s"]["n_null"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["s"]["min_str"] == "a" and rows["s"]["max_str"] == "b"
    assert rows["s"]["min_num"] is None
    assert rows["v"]["n_null"] == 1
    assert rows["v"]["min_num"] == 2.0 and rows["v"]["max_num"] == 8.0


def test_profile_table_column_subset(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    rows = ops.profile_table(df, columns=["s"]).collect()
    assert len(rows) == 1 and rows[0]["col_name"] == "s"


# ---- pagerank ----------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_symmetric_cycle_equal_ranks(spark):
    out = {
        r["node"]: r["rank_scaled"]
        for r in ops.pagerank(_edges(spark, [(1, 2), (2, 1)]), 8).collect()
    }
    assert out[1] == out[2]
    # two nodes sharing all mass: each stays near SCALE/2 (floor-div leak)
    assert abs(out[1] - SCALE // 2) < SCALE // 100


def test_pagerank_hub_outranks_leaves(spark):
    # leaves 2..5 all point at hub 1; hub points back at leaf 2
    edges = _edges(spark, [(2, 1), (3, 1), (4, 1), (5, 1), (1, 2)])
    out = {r["node"]: r["rank_scaled"] for r in ops.pagerank(edges, 8).collect()}
    # the 1<->2 two-cycle oscillates with iteration parity, so compare the
    # cycle members against the in-edge-less leaves, not each other
    assert out[1] > out[3] and out[2] > out[3]
    assert out[3] == out[4] == out[5]


def test_pagerank_sink_keeps_receiving_without_emitting(spark):
    # 1 -> 2 and 2 has no out-edges: 2's inflow leaks, 1 decays to base
    out = {r["node"]: r for r in ops.pagerank(_edges(spark, [(1, 2)]), 8).collect()}
    assert set(out) == {1, 2}
    assert out[2]["rank_scaled"] > out[1]["rank_scaled"]
    assert out[1]["rank"] > 0.0


def test_pagerank_deterministic_across_runs(spark):
    edges = _edges(spark, [(i, (i * 7) % 23) for i in range(23)])
    a = sorted((r["node"], r["rank_scaled"])
               for r in ops.pagerank(edges, 6).collect())
    b = sorted((r["node"], r["rank_scaled"])
               for r in ops.pagerank(edges.repartition(13), 6).collect())
    assert a == b  # partitioning cannot change integer results


def test_pagerank_dangling_redistribution_conserves_mass(spark):
    # 1 -> 2, 2 is a sink: the default recurrence leaks 2's inflow every
    # round, the round-6 redistribute_dangling option shares it back, so
    # total mass stays near SCALE (floor-division dust only) instead of
    # decaying toward the undamped base
    edges = _edges(spark, [(1, 2)])
    leaky = sum(r["rank_scaled"]
                for r in ops.pagerank(edges, 8).collect())
    kept = sum(r["rank_scaled"]
               for r in ops.pagerank(
                   edges, 8, redistribute_dangling=True).collect())
    assert kept > leaky
    assert abs(kept - SCALE) < SCALE // 100
    assert leaky < SCALE * 60 // 100


def test_pagerank_dangling_matches_python_replay_exactly(spark):
    # integer recurrence with per-round dangling mass, replayed in pure
    # Python over a graph with two sinks and a cycle
    pairs = [(1, 2), (2, 3), (3, 1), (1, 4), (2, 5)]
    nodes = sorted({x for p in pairs for x in p})
    n = len(nodes)
    init = SCALE // n
    base = init * 15 // 100
    outdeg = {}
    for s, _ in pairs:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: init for v in nodes}
    for _ in range(7):
        dm = sum(rank[v] for v in nodes if v not in outdeg)
        contrib = {v: 0 for v in nodes}
        for s, d in pairs:
            contrib[d] += rank[s] // outdeg[s]
        rank = {
            v: base + 85 * (contrib[v] + dm // n) // 100 for v in nodes
        }
    got = {
        r["node"]: r["rank_scaled"]
        for r in ops.pagerank(
            _edges(spark, pairs), 7, redistribute_dangling=True).collect()
    }
    assert got == rank


# ---- unpivot / histogram / monthly growth ------------------------------


def test_unpivot_round_trip_drops_empty_cells(spark):
    orders = spark.createDataFrame(
        [(1, 10, "P", "F", 100.0, dt.datetime(1995, 3, 1)),
         (2, 10, "P", "F", 50.0, dt.datetime(1997, 6, 1))],
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_orderstatus string, o_totalprice double, o_orderdate timestamp",
    )
    customer = spark.createDataFrame(
        [(10, "c10", "SEG", 0)],
        "c_custkey long, c_name string, c_mktsegment string, c_nationkey int",
    )
    nation = spark.createDataFrame(
        [(0, "ALGERIA", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    rows = {
        (r["nation"], r["o_year"]): r["revenue"]
        for r in ops.nation_revenue_unpivot(orders, customer, nation).collect()
    }
    # only the two populated (nation, year) cells survive the melt
    assert rows == {("ALGERIA", 1995): 100.0, ("ALGERIA", 1997): 50.0}


def test_numeric_histogram_bins_and_shares(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in (5, 15, 25, 95, None) if v is not None]
        + [(None,)],
        "x double",
    )
    rows = {r["bin_start"]: r for r in
            ops.numeric_histogram(df, "x", 10.0).collect()}
    assert set(rows) == {0.0, 10.0, 20.0, 90.0}
    assert rows[0.0]["n"] == 1 and rows[0.0]["share"] == 0.25
    assert rows[90.0]["n"] == 1


def test_monthly_growth_lag_and_rate(spark):
    orders = spark.createDataFrame(
        [(1, 1, "P", "F", 100.0, dt.datetime(1995, 1, 5)),
         (2, 1, "P", "F", 100.0, dt.datetime(1995, 1, 20)),
         (3, 1, "P", "F", 300.0, dt.datetime(1995, 2, 3))],
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_orderstatus string, o_totalprice double, o_orderdate timestamp",
    )
    rows = sorted(ops.monthly_revenue_growth(orders).collect(),
                  key=lambda r: r["month"])
    assert rows[0]["revenue"] == 200.0 and rows[0]["prev_revenue"] is None
    assert rows[0]["growth"] is None
    assert rows[1]["revenue"] == 300.0 and rows[1]["prev_revenue"] == 200.0
    assert rows[1]["growth"] == 0.5


# ---- input validation --------------------------------------------------


def test_operator_input_guards(spark):
    edges = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        ops.pagerank(edges, iterations=0)
    with pytest.raises(ValueError):
        ops.pagerank(edges, damping_pct=101)
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        ops.numeric_histogram(df, "x", 0.0)
    lines = _lines(spark, [(1, 0, "a")])
    with pytest.raises(ValueError):
        ops.line_dedup(lines, min_docs=0)
    ev = _events(spark, [(0, 1, "view")])
    with pytest.raises(ValueError):
        ops.rolling_active_users(ev, window_days=0)


# ---- event_cooccurrence ------------------------------------------------


def test_cooccurrence_measures(spark):
    # users: 1={A,B}, 2={A,B}, 3={A}, 4={C}
    ev = _events(
        spark,
        [(0, 1, "A"), (1, 1, "B"), (2, 2, "A"), (3, 2, "B"),
         (4, 3, "A"), (5, 4, "C"), (6, 1, "A")],  # duplicate A for user 1
    )
    rows = {(r["type_a"], r["type_b"]): r
            for r in ops.event_cooccurrence(ev).collect()}
    assert set(rows) == {("A", "B")}
    r = rows[("A", "B")]
    assert r["n_both"] == 2 and r["n_a"] == 3 and r["n_b"] == 2
    assert r["support"] == 0.5              # 2 of 4 users
    assert r["confidence_a_to_b"] == 2 / 3  # P(B | A)
    assert r["lift"] == (2 * 4) / (3 * 2)   # > 1: positively associated


# ---- feature_matrix ----------------------------------------------------


def test_feature_matrix_agrees_with_individual_operators(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat and the cat sat again"),
         (2, "xy")],
        "doc_id long, text string",
    )
    fm = {r["doc_id"]: r for r in ops.feature_matrix(docs).collect()}
    q = {r["doc_id"]: r for r in ops.quality_score(docs).collect()}
    g = {r["doc_id"]: r for r in ops.gopher_quality_rules(docs).collect()}
    l = {r["doc_id"]: r for r in ops.language_id(docs).collect()}
    rep = {r["doc_id"]: r for r in ops.repetition_score(docs).collect()}
    for d in (1, 2):
        assert fm[d]["quality"] == q[d]["quality"]
        assert fm[d]["stop_ratio"] == q[d]["stop_ratio"]
        assert fm[d]["gopher_pass"] == g[d]["passes"]
        assert fm[d]["mean_word_len"] == g[d]["mean_word_len"]
        assert fm[d]["lang_pred"] == l[d]["lang_pred"]
        assert fm[d]["lang_conf"] == l[d]["lang_conf"]
    assert fm[1]["rep_dup_frac"] == rep[1]["dup_frac"]
    assert fm[2]["rep_dup_frac"] is None  # too short for trigrams
    assert 2 not in rep  # the standalone operator filters short docs out


def test_profile_table_approx_mode_tracks_exact(spark):
    df = spark.range(0, 2000).selectExpr("id", "id % 37 AS m")
    exact = {r["col_name"]: r["n_distinct"]
             for r in ops.profile_table(df).collect()}
    approx = {r["col_name"]: r["n_distinct"]
              for r in ops.profile_table(df, exact=False).collect()}
    assert exact == {"id": 2000, "m": 37}
    for c in exact:
        assert abs(approx[c] - exact[c]) / exact[c] < 0.05


def test_curation_pipeline_composes_lazily(spark):
    """End-to-end corpus curation as ONE lazy plan: feature gate ->
    PII scrub -> exact-dedup survivors. Each stage consumes the previous
    stage's frame; nothing materializes until the final action."""
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat and the dog sat on the rug ok"),
         (2, "the cat sat on the mat and the dog sat on the rug ok"),
         (3, "zz zz zz"),
         (4, "reach admin@example.com for the keys to all of the doors")],
        "doc_id long, text string",
    )
    feats = ops.feature_matrix(docs)
    keep = feats.where(F.col("quality") >= 0.3).select("doc_id")
    gated = docs.join(keep, "doc_id")
    scrubbed = ops.pii_scrub(gated).withColumnRenamed("clean_text", "text")
    final = scrubbed.select("doc_id", "text").join(
        ops.exact_duplicates(scrubbed.select("doc_id", "text"))
        .select("doc_id"),
        "doc_id", "left_anti",
    )
    ids = sorted(r["doc_id"] for r in final.collect())
    assert 3 not in ids          # failed the quality gate
    assert 2 not in ids          # exact duplicate of doc 1
    assert 1 in ids and 4 in ids
    row4 = {r["doc_id"]: r["text"] for r in
            scrubbed.select("doc_id", "text").collect()}[4]
    assert "<EMAIL>" in row4 and "admin@" not in row4


# ---- rfm_segments ------------------------------------------------------


def test_rfm_quartiles_and_code(spark):
    # 8 customers with clean gradients on every dimension
    rows = []
    oid = 0
    for c in range(8):
        for k in range(c + 1):  # frequency grows with custkey
            rows.append((oid, c, "P", "F", float((c + 1) * 100),
                         dt.datetime(1995, 1, 1 + c)))  # recency grows too
            oid += 1
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_orderstatus string, o_totalprice double, o_orderdate timestamp",
    )
    out = {r["o_custkey"]: r for r in ops.rfm_segments(orders).collect()}
    # customer 7 ordered most recently/most often/most revenue: all q1
    assert out[7]["r_days"] == 0 and out[7]["rfm"] == "111"
    # customer 0: oldest single cheap order -> all q4
    assert out[0]["rfm"] == "444"
    # quartile sizes are exact NTILE: 8 customers -> 2 per quartile
    from collections import Counter
    assert Counter(r["r_q"] for r in out.values()) == {1: 2, 2: 2, 3: 2, 4: 2}


def test_corpus_drift_ratios_and_deltas(spark):
    mk = lambda rows: spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    base = "the cat is on the mat and a dog is of the park " * 3
    a = mk([(1, base, "en", "web", 100), (2, base, "en", "web", 100)])
    b = mk([(3, base, "en", "web", 100), (4, base, "en", "web", 100),
            (5, base, "en", "web", 100), (6, base, "en", "books", 100)])
    out = {r["source"]: r for r in ops.corpus_drift(a, b).collect()}
    assert out["web"]["a_docs"] == 2 and out["web"]["b_docs"] == 3
    assert out["web"]["docs_ratio"] == 1.5
    assert out["web"]["quality_delta"] == 0.0  # identical text
    # a source present only in snapshot B survives the outer join
    assert out["books"]["a_docs"] is None
    assert out["books"]["docs_ratio"] is None


def test_l2_normalize_unit_norm_and_zero_vector(spark):
    emb = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in
           ops.l2_normalize_embeddings(emb).collect()}
    assert out[1]["norm"] == 5.0
    assert out[1]["unit_vec"] == [0.6, 0.8]
    assert out[2]["norm"] == 0.0
    assert out[2]["unit_vec"] == [0.0, 0.0]  # zero vector passes through


def test_winsorize_clamps_tails_only(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "k long, v double"
    )
    out = {r["k"]: r for r in
           ops.winsorize(df, "v", lower=0.05, upper=0.95).collect()}
    assert out[1]["is_clipped"] and out[1]["v_winsorized"] == 5.0
    assert out[100]["is_clipped"] and out[100]["v_winsorized"] == 95.0
    assert not out[50]["is_clipped"] and out[50]["v_winsorized"] == 50.0
    assert sum(r["is_clipped"] for r in out.values()) == 9  # 1-4, 96-100


def test_rollup_null_data_key_disambiguated_by_grouping_flag(spark):
    # a DATA row whose priority is NULL coalesces to the same 'ALL' label
    # as the subtotal rows — the grouping flags are what keep them apart
    orders = spark.createDataFrame(
        [(1, 1, None, "F", 10.0), (2, 1, "HIGH", "F", 5.0)],
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_orderstatus string, o_totalprice double",
    )
    rows = ops.grouped_rollup(orders, "rollup").collect()
    all_f = [r for r in rows
             if r["priority"] == "ALL" and r["status"] == "F"]
    # one is the NULL-priority data row (g_pri=0), one would be a
    # status-level subtotal if this were CUBE; under ROLLUP only the data
    # row exists at (ALL, F)
    assert len(all_f) == 1 and all_f[0]["g_pri"] == 0
    grand = [r for r in rows if r["g_pri"] == 1 and r["g_status"] == 1]
    assert len(grand) == 1 and grand[0]["n_orders"] == 2


def test_vocab_growth_tracks_new_words_per_prefix(spark):
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a c"), (2, "d d"), (3, "a b c d")],
        "doc_id long, text string",
    )
    rows = {r["bucket"]: r for r in
            ops.vocab_growth(docs, n_buckets=4).collect()}
    assert rows[0]["new_words"] == 2 and rows[0]["vocab_cum"] == 2  # a,b
    assert rows[1]["new_words"] == 1 and rows[1]["vocab_cum"] == 3  # +c
    assert rows[2]["new_words"] == 1 and rows[2]["vocab_cum"] == 4  # +d
    assert rows[3]["new_words"] == 0 and rows[3]["vocab_cum"] == 4
    assert rows[3]["tokens_cum"] == 2 + 2 + 2 + 4


def test_funnel_steps_order_matters(spark):
    # user 1 completes in order; user 2 clicks BEFORE viewing (breaks at
    # step 2); user 3 never signs up
    ev = _events(
        spark,
        [(0, 1, "signup"), (1, 1, "view"), (2, 1, "click"),
         (0, 2, "signup"), (1, 2, "click"), (2, 2, "view"),
         (0, 3, "view"), (1, 3, "click")],
    )
    rows = {r["step_idx"]: r for r in
            ops.funnel_steps(ev, ["signup", "view", "click"]).collect()}
    assert rows[0]["n_users"] == 2          # users 1 and 2 signed up
    assert rows[1]["n_users"] == 2          # both viewed after signup
    assert rows[2]["n_users"] == 1          # only user 1 clicked after view
    assert rows[2]["pct_of_first"] == 0.5
    assert rows[2]["pct_of_prev"] == 0.5
    with pytest.raises(ValueError):
        ops.funnel_steps(ev, ["signup"])


def test_pagerank_empty_edge_list_returns_empty_frame(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    out = ops.pagerank(empty)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "node", "rank_scaled", "rank"
    ]
