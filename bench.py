#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"queries": {...wall...}, "queries_cpu": {...cpu...}, "sf": ...,
 "cpu_value": total_cpu_sec, "metric": ..., "value": total_wall_sec}

Each query is materialized through the noop sink — full plan execution
(scan → shuffle → aggregate) without driver-collect overhead distorting the
measurement.

Two numbers per row:

- **wall** — elapsed seconds. Sensitive to co-tenant CPU steal on this
  host (documented ±30% across machine states in rounds 10-11).
- **cpu** — process CPU seconds actually consumed: the local-mode JVM's
  utime+stime from /proc (all 32 executor threads live in that one
  process) plus the Python driver's process_time. Steal-invariant —
  a co-tenant burst inflates wall but not cpu — so round-over-round
  regression calls should cite the cpu column.

Timing attribution: queries whose operators execute Spark jobs at
CONSTRUCTION time (eager localCheckpoint pins, driver-side model fits)
are auto-detected via the status-tracker job counter and reported as
construction + min-of-2 action — the pinned legs are timed exactly once,
cold. Purely lazy queries keep the historical min-of-2 action timing.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from concept_multi_db_query_engine_spark.session import get_spark  # noqa: E402

HEADLINE = [
    # engine-DSL pipeline (validation → ACL → plan → build → execute)
    "filter_eq",
    "filter_pattern_group",
    "join_inner",
    "join_transitive",
    "skew_salted_join",
    "skew_salted_count",
    "agg_group_count",
    "agg_having",
    "counted_exists_gte",
    "exists_in_or_group",
    "nested_exists",
    "order_limit_offset",
    "federated_join",
    "masking_role",
    # analytics
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q4",
    "tpch_q6",
    "tpch_q12",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "tpch_q2",
    "tpch_q11",
    "orders_rollup",
    "orders_cube",
    "orders_profile",
    "events_approx_distinct_kmv",
    "rolling_revenue_7d",
    "customer_order_gaps",
    "nation_revenue_pivot",
    "nation_revenue_unpivot",
    "orders_price_histogram",
    "orders_monthly_growth",
    "customer_revenue_deciles",
    "customer_revenue_concentration",
    "customer_rfm_segments",
    "customer_segments_setops",
    "purchase_click_attribution",
    "text_tfidf_top_terms",
    "text_top_bigrams",
    "window_topk_per_group",
    "events_hourly_rollup",
    "events_hourly_anomaly",
    "order_value_quantiles",
    "orders_winsorize",
    "order_value_quantiles_approx",
    "customer_revenue_deciles_approx",
    "events_funnel",
    "events_funnel_steps",
    "events_cohort_retention",
    "events_sessionize",
    "events_asof_attribution",
    "events_props_rollup",
    "events_transitions",
    "events_cooccurrence",
    "events_rolling_active_users",
    # LLM-data-pipeline operators
    "text_token_stats",
    "text_quality_score",
    "text_fingerprint",
    "text_bpe_token_stats",
    "text_contamination_check",
    "text_repetition_score",
    "text_gopher_rules",
    "text_pii_scrub",
    "docs_feature_matrix",
    "corpus_report",
    "corpus_drift",
    "docs_vocab_growth",
    "docs_stratified_sample",
    "docs_pack_sequences",
    "docs_chunk",
    "docs_hash_split",
    "docs_weighted_sample",
    "docs_clean_corpus",
    "docs_line_dedup",
    "dedup_exact",
    "dedup_incremental",
    "dedup_clusters",
    "dedup_ngram_jaccard",
    "dedup_repeated_passages",
    "dedup_minhash_lsh",
    "dedup_minhash_estimate",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "sim_topk_bruteforce",
    "sim_knn_label_vote",
    "sim_knn_graph",
    "graph_pagerank",
    "graph_pagerank_dangling",
    "embeddings_quantize_int8",
    "embeddings_l2_normalize",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "sim_recall_at_k",
    "multimodal_frame_sample",
    "multimodal_decode_stats",
    "dedup_survivors",
    "sketch_distinct_comparison",
    # statistics / clustering family (round 5b)
    "stats_corr_matrix",
    "stats_ols_regression",
    "events_ab_test",
    "docs_chi_square",
    "embeddings_kmeans",
    "embeddings_random_projection",
    "embeddings_pq_encode",
    "sim_topk_pq",
    "stats_ols_by_group",
    "stats_ks_test",
    "events_mad_outliers",
    "stats_bh_correction",
    "stats_bootstrap_ci",
    "dedup_semantic",
    "embeddings_whiten",
    "sim_cosine_histogram",
    "docs_importance_weights",
    "docs_url_dedup",
    "docs_best_fit_pack",
    "events_heavy_hitters",
    "events_windowed_funnel",
    "graph_label_propagation",
    "events_session_paths",
    "events_reservoir_sample",
    "events_daily_ewma",
    "orders_zorder_layout",
    "events_skew_report",
    "corpus_snapshot_diff",
    "docs_truncation_report",
    "corpus_budget_allocation",
    "orders_equidepth_histogram",
    "orders_frequent_values",
    "docs_bpe_train",
    "docs_bpe_encode",
    "docs_dup_ngram_fraction",
    "dedup_semantic_survivors",
    "stats_welch_t_test",
    "stats_mann_whitney",
    "dedup_containment",
    "text_char_entropy",
    "orders_psi_drift",
    "graph_triangles",
    "graph_adamic_adar",
    "orders_market_basket",
    "docs_token_jsd_drift",
    "embeddings_corpus_stats",
    "events_kmv_resemblance",
    "sim_topk_rp_lsh",
    "events_session_stats",
    "graph_personalized_pagerank",
    "text_unigram_logprob",
    "text_bigram_logprob",
    # round-7 additions
    "orders_bloom_prefilter",
    "orders_upsert_compaction",
    "events_sliding_distinct_kmv",
    "sim_topk_ivf_pq",
    "stats_theil_sen",
    "orders_incremental_state",
    "orders_seasonal_decompose",
    "events_changepoint",
    "docs_lang_confusion",
    "dedup_lsh_tuning",
    "embeddings_pca_project",
    "embeddings_abtt",
    "dedup_minhash_incremental",
    "docs_perplexity_partition",
    "orders_seasonal_forecast",
    "suppliers_fuzzy_match",
    "docs_temperature_mix",
    "docs_nb_language",
    # round-8 additions
    "docs_bpe_encode_large",
    "multimodal_png_decode",
    "multimodal_y4m_decode",
    "docs_quality_logistic",
    "docs_score_calibration",
    "events_kaplan_meier",
    "sim_snn_graph",
    "docs_domain_quota",
    "docs_boilerplate_prefixes",
    "lineitem_join_size_estimate",
    "events_markov_attribution",
    "docs_bm25_topk",
    "docs_hybrid_rrf",
    "docs_grouped_split",
    "orders_conformal_interval",
    "dedup_span_removal",
    "events_position_attribution",
    "docs_mutual_information",
    "embeddings_matryoshka",
    "orders_quantile_regression",
    "docs_c2st_drift",
    "docs_feature_auc",
    "embeddings_negative_samples",
    "sim_ivf_tuning",
    "dedup_span_incremental",
    # round-8 late wave
    "orders_hilbert_layout",
    "orders_pruning_report",
    "graph_hits",
    "dedup_prefix_filter",
    "docs_pareto_frontier",
    "text_pmi_collocations",
    "orders_benford",
    "docs_woe_iv",
    "docs_kappa_lang",
    "sim_rank_rbo",
    "embeddings_silhouette",
    "docs_gains_table",
    "text_vocab_coverage",
    "orders_neyman_allocation",
    "docs_shrunk_rates",
    "events_scd2_history",
    "docs_quantile_normalize",
    "events_cross_correlation",
    "events_autocorrelation",
    "orders_expectations",
    "docs_lexical_diversity",
    "text_burstiness",
    "customers_l_diversity",
    "events_concurrency",
    "docs_target_encoding",
    "orders_wasserstein",
    "orders_table_digest",
    "graph_k_core",
    "events_exit_rates",
    "docs_sliced_accuracy",
    "events_diff_in_diff",
    "docs_mix_diversity",
    "lineitem_weighted_median",
    "docs_cramers_v",
    "embeddings_hard_negatives",
    "docs_threshold_sweep",
    "orders_seasonal_strength",
    "embeddings_triplets",
    "orders_cohort_ltv",
    "customers_fd_check",
    "schema_inclusion_deps",
    "parts_price_band_join",
    "orders_gap_fill",
    "parts_trending_brands",
    "events_log_rank",
    "events_growth_accounting",
    "orders_neyman_sample",
    "orders_holt_forecast",
    "embeddings_truncation_energy",
    "orders_cohens_d",
    "orders_forecast_backtest",
    "orders_daily_quantile_bands",
    "events_arrival_dispersion",
    "parts_abc_classes",
    "events_anomaly_leaderboard",
    "docs_distinctive_terms",
    "orders_fulfillment_sla",
    "orders_anova",
    "orders_kruskal_wallis",
    "orders_mann_kendall",
    "lineitem_spearman",
    "customers_gini",
    "orders_durbin_watson",
    "customers_theil_index",
    "orders_failures_sample",
    "embeddings_margin_pairs",
    "events_ab_sample_size",
    # round-8 rows previously missing from the bench
    "customers_k_anonymity",
    "events_conversion_lag",
    "embeddings_centroid_drift",
    "orders_seasonal_anomaly",
    # round-9 wave: distribution stats on the distributed-prefix
    # primitive, readability/Zipf, b-bit minhash, drift, calibration
    "orders_cvm",
    "orders_energy_distance",
    "lineitem_trimmed_mean",
    "orders_hodges_lehmann",
    "lineitem_kendall_tau",
    "lineitem_percent_rank",
    "docs_reading_ease",
    "docs_zipf_fit",
    "dedup_bbit_minhash",
    "orders_anderson_darling",
    "orders_page_hinkley",
    "docs_isotonic_calibration",
    "orders_simpson_paradox",
    "orders_ks_drift_leaderboard",
    "events_nelson_aalen",
    "orders_uplift_deciles",
    "orders_propensity_ate",
    "dedup_cross_source",
    "multimodal_wav_decode",
    "lineitem_poisson_rate",
    "events_sprt",
    "orders_mmd_drift",
    "orders_cuped",
    "orders_ab_proportion_plan",
    "orders_brown_forsythe",
    "orders_srm_check",
    # round-10 wave: distribution shape, post-hoc / paired / stratified
    # tests, regression diagnostics, resampling, control charts, time
    # series, graph topology, two-stage retrieval, blocking quality
    "orders_jarque_bera",
    "orders_welch_anova",
    "orders_tukey_hsd",
    "lineitem_partial_correlation",
    "orders_point_biserial",
    "orders_grubbs",
    "orders_mcnemar",
    "orders_cochran_armitage",
    "customers_mantel_haenszel",
    "orders_mood_median",
    "lineitem_cronbach_alpha",
    "orders_cusum_control",
    "orders_holm_correction",
    "lineitem_breusch_pagan",
    "orders_cooks_distance",
    "lineitem_vif",
    "orders_ljung_box",
    "orders_permutation_test",
    "graph_assortativity",
    "graph_connected_components",
    "sim_topk_two_stage",
    "dedup_blocking_quality",
    "docs_distinct_ngrams",
    "docs_distinct_ngrams_approx",
    "docs_rake_keywords",
    "orders_hurst_exponent",
    "events_granger_causality",
    "lineitem_lin_ccc",
    "docs_bland_altman",
    "orders_shewhart_xbar",
    "orders_bollinger_bands",
    "graph_resource_allocation",
    "orders_jonckheere_terpstra",
    "suppliers_fellegi_sunter",
    "multimodal_bmp_decode",
    "orders_dunns_test",
    "embeddings_intrinsic_dim",
    "orders_grouping_sets",
    "orders_sample_entropy",
    "orders_runs_test",
    "orders_bartlett",
    "orders_levene",
    "orders_friedman",
    "orders_kendalls_w",
    "docs_cochran_q",
    "docs_fleiss_kappa",
    "orders_page_trend",
    "orders_pot_gpd",
    "docs_vocab_richness",
    "sim_ranking_eval",
    "orders_bradley_terry",
    # round-12 wave: curation ops — DSIR resampling, online preference
    # ratings, DoReMi-lite mixture weights
    "docs_dsir_resample",
    "orders_elo_ratings",
    "docs_doremi_mixture",
    "sim_kcenter_sample",
    "docs_epoch_allocation",
]


class _CpuClock:
    """Cumulative process-CPU seconds: local-mode JVM (utime+stime from
    /proc — one process holds every executor thread) + the Python driver.
    Steal-invariant: co-tenant load inflates wall time, not this."""

    def __init__(self, spark) -> None:
        self._pid = None
        self._tck = 100.0
        try:
            self._pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())
            self._tck = float(os.sysconf("SC_CLK_TCK"))
            self.now()  # probe /proc once; disable on any failure
        except Exception:
            self._pid = None

    def now(self) -> float:
        py = time.process_time()
        if self._pid is None:
            return py
        with open(f"/proc/{self._pid}/stat") as f:
            # field 2 (comm) may contain spaces/parens; utime/stime are
            # fields 14/15 → idx 11/12 after the closing paren
            parts = f.read().rsplit(") ", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / self._tck + py


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="cmdbqe-bench", cpus=cpus)

    queries = entry_mod.queries()
    # JVM/codegen warmup on the smallest table
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    # pre-warm the parquet schema memo for every table: the FIRST
    # schema-inferring read of a path runs a 1-task footer job, which would
    # otherwise be billed to (and mis-flag as construction-eager) whichever
    # query touches that table first
    from concept_multi_db_query_engine_spark import testdata as _td

    for _t in ("region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events", "documents", "embeddings"):
        _td.load_table(spark, sf_dir, _t)

    clock = _CpuClock(spark)
    tracker = spark.sparkContext.statusTracker()

    def _max_job_id() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else -1

    timings: dict[str, float] = {}
    cpu_timings: dict[str, float] = {}

    def _emit() -> None:
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        # Key order matters: the driver archives only the TAIL of this
        # line, so the headline totals ("value"/"metric") go LAST — a
        # truncated head loses individual per-query rows, never totals.
        print(
            json.dumps(
                {
                    "queries": timings,
                    "queries_cpu": cpu_timings,
                    "sf": float(sf)
                    if sf.replace(".", "").isdigit() else sf,
                    "n_queries": len(timings),
                    "unit": "sec",
                    "cpu_metric":
                        "headline-suite process-CPU time (JVM+py)",
                    "cpu_value": round(sum(cpu_timings.values()), 4),
                    "metric": "headline-suite wall time",
                    "value": round(sum(timings.values()), 4),
                }
            ),
            flush=True,
        )

    def _on_term(signum, frame) -> None:
        # an external timeout must not cost the whole run: emit the
        # rows that completed and exit cleanly
        print(f"[bench] SIGTERM after {len(timings)} rows - emitting "
              "partial suite", file=sys.stderr)
        _emit()
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)

    def _record(name: str, wall: float, cpu: float) -> None:
        timings[name] = round(wall, 4)
        cpu_timings[name] = round(cpu, 4)
        # progress marker so a killed/stalled run still shows where it
        # was (stdout stays the one-JSON-line contract)
        print(f"[bench] {name} {wall:.3f}s cpu={cpu:.3f}s", file=sys.stderr)

    def _noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def _timed(fn) -> tuple[float, float]:
        w0, c0 = time.perf_counter(), clock.now()
        fn()
        return time.perf_counter() - w0, clock.now() - c0

    def _min2(df) -> tuple[float, float]:
        # two executions, report the min of each column: the host shows
        # multi-second CPU steal from co-tenants, so a single wall sample
        # can be 4x off; min-of-2 measures the engine's steady-state plan,
        # not the neighbors. Rows whose FIRST sample exceeds 5 s keep that
        # single sample: steal distorts long rows proportionally less, the
        # CPU column bounds them anyway, and re-running the suite's
        # heaviest rows doubles exactly the wall time that risks an
        # external timeout.
        w, c = _timed(lambda: _noop(df))
        if w > 5.0:
            return w, c
        w2, c2 = _timed(lambda: _noop(df))
        return min(w, w2), min(c, c2)

    for name in HEADLINE:
        if name == "dedup_minhash_lsh":
            # The two minhash scoring modes share their signature stage
            # (shingle scan + 16 min-aggregates) — in one session a user
            # computes it once (operators.minhash_frames) and runs both
            # modes over it, so the bench does the same: the shared stage
            # is timed ONCE as its own row, and each mode's row then
            # measures only the work unique to it. Gate entries stay
            # self-contained — this sharing lives only here.
            from concept_multi_db_query_engine_spark import operators as ops
            from concept_multi_db_query_engine_spark import testdata as td

            docs = td.load_table(spark, sf_dir, "documents")
            sh, sigs = ops.minhash_frames(docs, k=5, num_hashes=16)
            sh, sigs = sh.persist(), sigs.persist()

            def _shared() -> None:
                _noop(sigs)
                sh.count()

            w, c = _timed(_shared)
            _record("dedup_minhash_shared_sigs", w, c)
            _record("dedup_minhash_lsh", *_min2(
                ops.minhash_lsh_pairs(docs, k=5, num_hashes=16, bands=4,
                                      threshold=0.5, frames=(sh, sigs))))
            _record("dedup_minhash_estimate", *_min2(
                ops.minhash_estimate_pairs(docs, k=5, num_hashes=16,
                                           bands=4, min_estimate=0.5,
                                           frames=(sh, sigs))))
            _record("dedup_bbit_minhash", *_min2(
                ops.bbit_minhash_pairs(docs, k=5, num_hashes=16,
                                       bands=4, b_bits=8,
                                       frames=(sh, sigs))))
            sh.unpersist()
            sigs.unpersist()
            spark.catalog.clearCache()
            continue
        if name in ("dedup_minhash_estimate", "dedup_bbit_minhash"):
            continue  # timed alongside dedup_minhash_lsh above
        if name == "graph_pagerank":
            # pagerank does its heavy lifting (edge materialization + the
            # iteration checkpoints) at CONSTRUCTION time, so the generic
            # noop-write timing of the returned frame measures almost
            # nothing. The k-NN edge build is already benched as
            # sim_knn_graph, so the honest non-double-counting row is:
            # materialize the edges outside the timer, then time pagerank
            # construction + first action over the ready graph.
            from concept_multi_db_query_engine_spark import operators as ops
            from concept_multi_db_query_engine_spark import testdata as td
            from pyspark.sql import functions as SF

            emb = td.load_table(spark, sf_dir, "embeddings")
            edges = ops.knn_graph(emb, k=5).select(
                SF.col("vec_id").alias("src"),
                SF.col("neighbor_id").alias("dst"),
            ).localCheckpoint(eager=True)

            def _run() -> None:
                _noop(ops.pagerank(edges, iterations=8))

            _record(name, *_timed(_run))
            spark.catalog.clearCache()
            continue
        if name == "graph_pagerank_dangling":
            # same construction-time-iteration shape as graph_pagerank;
            # even-src edges so the dangling redistribution actually runs
            from concept_multi_db_query_engine_spark import operators as ops
            from concept_multi_db_query_engine_spark import testdata as td
            from pyspark.sql import functions as SF

            emb = td.load_table(spark, sf_dir, "embeddings")
            edges = ops.knn_graph(emb, k=5).select(
                SF.col("vec_id").alias("src"),
                SF.col("neighbor_id").alias("dst"),
            ).where(SF.col("src") % 2 == 0).localCheckpoint(eager=True)

            def _run() -> None:
                _noop(ops.pagerank(edges, iterations=6,
                                   redistribute_dangling=True))

            _record(name, *_timed(_run))
            spark.catalog.clearCache()
            continue
        if name == "dedup_semantic_survivors":
            # pairs are already benched as dedup_semantic; this row
            # times the part unique to it — connected-components
            # resolution + the survivor anti-join — over ready pairs
            from concept_multi_db_query_engine_spark import operators as ops
            from concept_multi_db_query_engine_spark import testdata as td
            from pyspark.sql import functions as SF

            emb = td.load_table(spark, sf_dir, "embeddings")
            pairs = ops.semantic_dedup_pairs(
                emb, k=8, iterations=3, threshold=0.3
            ).select("d1", "d2").localCheckpoint(eager=True)

            def _run() -> None:
                dropped = ops.duplicate_clusters(pairs).where(
                    "doc_id != cluster_id"
                ).select(SF.col("doc_id").alias("vec_id"))
                _noop(emb.select("vec_id", "label").join(
                    dropped, "vec_id", "left_anti"))

            _record(name, *_timed(_run))
            spark.catalog.clearCache()
            continue
        if name == "docs_bpe_train":
            # training runs its per-round collects at CONSTRUCTION time
            # (the returned frame is just the tiny merge table), so the
            # honest row times construction + first action, one sample
            from concept_multi_db_query_engine_spark import operators as ops
            from concept_multi_db_query_engine_spark import testdata as td

            docs = td.load_table(spark, sf_dir, "documents")

            def _run() -> None:
                _noop(ops.bpe_train_merges(docs, n_merges=8))

            _record(name, *_timed(_run))
            spark.catalog.clearCache()
            continue
        if name == "graph_label_propagation":
            # iterative op with localCheckpoint state: a min-of-2 noop
            # timing would measure the cached second run. Same honest
            # shape as the pagerank rows: ready edges outside the timer,
            # construction + first action inside, single sample.
            from concept_multi_db_query_engine_spark import operators as ops
            from concept_multi_db_query_engine_spark import testdata as td
            from pyspark.sql import functions as SF

            emb = td.load_table(spark, sf_dir, "embeddings")
            edges = ops.knn_graph(emb, k=5).select(
                SF.col("vec_id").alias("src"),
                SF.col("neighbor_id").alias("dst"),
            ).localCheckpoint(eager=True)

            def _run() -> None:
                _noop(ops.label_propagation(edges, iterations=4))

            _record(name, *_timed(_run))
            spark.catalog.clearCache()
            continue
        if name == "graph_personalized_pagerank":
            # same construction-time-iteration shape as graph_pagerank:
            # time PPR construction + first action over ready edges
            from concept_multi_db_query_engine_spark import operators as ops
            from concept_multi_db_query_engine_spark import testdata as td
            from pyspark.sql import functions as SF

            emb = td.load_table(spark, sf_dir, "embeddings")
            edges = ops.knn_graph(emb, k=5).select(
                SF.col("vec_id").alias("src"),
                SF.col("neighbor_id").alias("dst"),
            ).localCheckpoint(eager=True)

            def _run() -> None:
                _noop(ops.personalized_pagerank(edges, [0, 1, 2],
                                                iterations=8))

            _record(name, *_timed(_run))
            spark.catalog.clearCache()
            continue
        # Generic row. Operators that execute Spark jobs at CONSTRUCTION
        # time (eager localCheckpoint pins, driver-side model fits) do
        # their dominant work before any noop action — detected via the
        # status-tracker job counter and billed: construction once (cold)
        # + min-of-2 action. Purely lazy plans keep min-of-2 action only.
        j0 = _max_job_id()
        w0, c0 = time.perf_counter(), clock.now()
        df = queries[name](spark, sf_dir)
        cons_w = time.perf_counter() - w0
        cons_c = clock.now() - c0
        construction_ran_jobs = _max_job_id() > j0
        act_w, act_c = _min2(df)
        if construction_ran_jobs:
            _record(name, cons_w + act_w, cons_c + act_c)
        else:
            _record(name, act_w, act_c)
        spark.catalog.clearCache()

    _emit()


if __name__ == "__main__":
    main()
