"""Round-11 scale pins, continuing the round-9/10 discipline: the new
KMV distinct-n-gram twin's per-n top-k must compile to Catalyst's
two-level WindowGroupLimit — the PARTIAL pass keeps each map task's k
smallest hashes per n BEFORE the exchange, so the per-n reducer never
receives the full distinct-hash frame."""

from __future__ import annotations

from concept_multi_db_query_engine_spark import operators as ops
from concept_multi_db_query_engine_spark import testdata

SF_DIR = "/root/testdata/sf0.001"


def executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def unpartitioned_window_lines(plan: str) -> list[str]:
    bad = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: *(0123456789)").strip()
        if s.startswith("Window [") and s.count("], [") < 2:
            bad.append(line)
    return bad


class TestKmvNgramTwoLevelTopK:
    def test_group_limit_runs_partial_before_exchange(self, spark):
        docs = testdata.load_table(spark, SF_DIR, "documents")
        df = ops.distinct_ngram_diversity_approx(docs, max_n=2, k=64)
        plan = executed(df)
        # no un-partitioned window anywhere
        bad = unpartitioned_window_lines(plan)
        assert not bad, "\n".join(bad)
        # the rank <= k filter must compile to the two-level
        # WindowGroupLimit: a PARTIAL map-side top-k per n before the
        # shuffle, then the Final pass — the reducer for a kind sees
        # <= k * n_tasks hashes, never the full distinct frame
        assert "WindowGroupLimit" in plan, plan
        assert ", Partial" in plan, plan
        assert ", Final" in plan, plan
        # round 12: the filter ranks with dense_rank DIRECTLY on the raw
        # hash stream — the round-11 (n, hash) pre-distinct, whose
        # exchange shuffled every distinct hash once, is gone; dedup now
        # runs after the partial top-k, on <= k * n_tasks survivors
        assert "dense_rank" in plan, plan
        # and the Partial pass must sit on the scan side with no KEYED
        # exchange below it (the round-11 (n, hash) pre-distinct shuffle
        # must stay gone).  The fan-out's RoundRobinPartitioning is the
        # one allowed exchange: it is the scale-adaptive parallelism
        # repartition of the tokenized projection, not a corpus-keyed
        # shuffle, and it must be shared (ReusedExchange) rather than
        # executed once per branch.  (Final executed section = the text
        # before AQE's "== Initial Plan ==".)
        lines = plan.split("== Initial Plan ==")[0].splitlines()
        start = next(i for i, ln in enumerate(lines) if ", Partial" in ln)
        for ln in lines[start + 1:]:
            if "Scan parquet" in ln:
                break
            if "Exchange" in ln:
                assert "RoundRobinPartitioning" in ln, ln
        # the shared fan-out exchange must actually be SHARED: the
        # executed section needs a ReusedExchange (a regression to
        # per-branch re-execution would keep the RoundRobin lines but
        # run the tokenized projection once per aggregate branch)
        executed_section = plan.split("== Initial Plan ==")[0]
        assert "ReusedExchange" in executed_section, plan


class TestVocabRichnessScale:
    def test_two_aggregates_no_window_no_collect(self, spark):
        docs = testdata.load_table(spark, SF_DIR, "documents")
        df = ops.vocab_richness(docs)
        plan = executed(df)
        assert not unpartitioned_window_lines(plan)
        # the token-frequency stage must map-side combine: a partial
        # HashAggregate below the token-key exchange
        assert "partial_count" in plan or "Partial" in plan, plan


class TestBradleyTerryScale:
    def test_win_matrix_leg_has_no_pair_join_no_global_window(
        self, spark
    ):
        # bradley_terry() runs its heavy legs eagerly (bounded driver
        # collects), so pin the W2 leg's plan by rebuilding it the way
        # the operator does: per-value pivot -> offset-rank prefix
        # counts -> one k^2-column aggregate
        from pyspark.sql import functions as F

        orders = testdata.load_table(spark, SF_DIR, "orders")
        groups = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
        cells = orders.groupBy(
            F.col("o_totalprice").alias("v")
        ).agg(
            *[
                F.sum(
                    F.when(F.col("o_orderpriority") == g, 1).otherwise(0)
                ).cast("long").alias(f"c{i}")
                for i, g in enumerate(groups)
            ]
        )
        cum, _ = ops.distributed_prefix_counts(
            cells, "v", [f"c{i}" for i in range(len(groups))]
        )
        w2 = cum.agg(
            *[
                F.sum(
                    F.expr(
                        f"CAST(c{i} AS DECIMAL(38,0)) "
                        f"* (2 * __cum_c{j} - c{j})"
                    )
                ).alias(f"w2_{i}_{j}")
                for i in range(len(groups))
                for j in range(len(groups))
                if i != j
            ]
        )
        plan = executed(w2)
        # within-partition running sums only — the offset-rank shape
        assert not unpartitioned_window_lines(plan)
        # the n^2 tournament is algebraic: no pair join of any kind
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "SortMergeJoin" not in plan

    def test_returns_k_rows_and_is_deterministic(self, spark):
        orders = testdata.load_table(spark, SF_DIR, "orders")
        a = ops.bradley_terry(
            orders, "o_orderpriority", "o_totalprice", iterations=5
        ).collect()
        b = ops.bradley_terry(
            orders, "o_orderpriority", "o_totalprice", iterations=5
        ).collect()
        assert a == b and len(a) == 5


class TestRankingEvalScale:
    def test_query_side_broadcast(self, spark):
        emb = testdata.load_table(spark, SF_DIR, "embeddings")
        queries = emb.where("vec_id < 3")
        df = ops.ann_ranking_eval(emb, queries, k=5, bits=4)
        plan = executed(df)
        # the LSH candidate join must broadcast the (tiny) query side,
        # never shuffle the corpus by bucket
        assert "BroadcastHashJoin" in plan, plan
        assert not unpartitioned_window_lines(plan)


class TestBruteForceLegPinnedOnce:
    def test_recall_and_ranking_eval_run_one_blas_scan(self, spark):
        # the exact top-k leg is localCheckpoint'ed inside the eval
        # operators, so the EXECUTED plan of the returned frame must
        # contain NO MapInPandas at all — the BLAS leg ran exactly
        # once, at pin time, not once per downstream reference
        emb = testdata.load_table(spark, SF_DIR, "embeddings")
        q = emb.where("vec_id < 3")
        for df in (
            ops.ann_recall_at_k(emb, q, k=5, bits=4),
            ops.ann_ranking_eval(emb, q, k=5, bits=4),
        ):
            plan = executed(df)
            assert "MapInPandas" not in plan, plan

    def test_matryoshka_truth_leg_pinned(self, spark):
        # truth is referenced 3x per tested dim; pinned, the executed
        # plan re-runs the brute-force leg only for the per-dim
        # truncated scans (one MapInPandas each), never for truth
        emb = testdata.load_table(spark, SF_DIR, "embeddings")
        df = ops.matryoshka_recall(emb, dims=[8, 16], k=5, n_queries=3)
        # AQE's toString duplicates subtrees into an "== Initial Plan =="
        # section — count only the final executed section
        plan = executed(df).split("== Initial Plan ==")[0]
        assert plan.count("MapInPandas") <= 2, plan


class TestScanBudgets:
    # regression lock for the round-11 multi-reference audit, extended
    # in round 12 to the FULL registry: tests/scan_budgets.json freezes
    # every gate row's "Scan parquet" count (generated by
    # tests/gen_scan_budgets.py at sf0.001); a multi-reference
    # regression anywhere now fails here instead of waiting for the
    # next manual sweep. Budgets are ceilings — improvements pass;
    # regenerate the JSON to ratchet down (or after an INTENTIONAL
    # plan-shape change, loudly, in its own commit).
    # The hand-audited rows below OVERRIDE the generated table (they
    # are the authoritative bounds from the round-11 audit).
    BUDGETS = {
        "events_funnel_steps": 1,
        "sim_ivf_tuning": 3,
        "sim_rank_rbo": 1,
        "embeddings_triplets": 1,
        "docs_fleiss_kappa": 1,
        "orders_friedman": 1,
        "docs_chi_square": 1,
        "docs_cramers_v": 1,
        "orders_cusum_control": 2,
        "events_kmv_resemblance": 1,
        "events_cooccurrence": 1,
        "suppliers_fellegi_sunter": 2,
        "docs_bm25_topk": 1,
        "text_tfidf_top_terms": 1,
        "events_hourly_anomaly": 2,
        "orders_tukey_hsd": 1,
        "orders_dunns_test": 1,
        "orders_srm_check": 1,
        "docs_isotonic_calibration": 1,
        "orders_simpson_paradox": 1,
        "docs_token_jsd_drift": 2,
    }

    def test_full_registry_stays_within_scan_budgets(self, spark):
        import json
        import os

        import __spark_entry__ as entry

        path = os.path.join(os.path.dirname(__file__), "scan_budgets.json")
        with open(path) as f:
            generated = json.load(f)
        qs = entry.queries()
        missing = sorted(set(qs) - set(generated))
        assert not missing, (
            f"new queries without a scan budget {missing}: run "
            "`python tests/gen_scan_budgets.py " + " ".join(missing) + "`"
        )
        over = []
        for name in sorted(qs):
            budget = min(self.BUDGETS.get(name, 10 ** 9), generated[name])
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            plan = (
                df._jdf.queryExecution().executedPlan().toString()
                .split("== Initial Plan ==")[0]
            )
            n = plan.count("Scan parquet")
            if n > budget:
                over.append((name, n, budget))
            spark.catalog.clearCache()
        assert not over, (
            f"{over} — a query's executed plan re-scans its source more "
            "often than its frozen budget; if the plan change is "
            "intentional, regenerate with tests/gen_scan_budgets.py"
        )
