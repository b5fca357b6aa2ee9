"""Round-12 curation wave: DSIR resampling, online (Elo-style)
preference ratings, DoReMi-lite mixture weights."""

from __future__ import annotations

import pytest

from concept_multi_db_query_engine_spark import operators as ops


class TestDsirResample:
    def test_shape_ranks_and_determinism(self, spark):
        rows = [(i, "alpha beta gamma delta " * 3) for i in range(20)]
        rows += [(100 + i, "omega psi chi phi " * 3) for i in range(20)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        target = docs.where("doc_id >= 100")
        a = ops.dsir_resample(docs, target, n_sample=5,
                              n_buckets=64).collect()
        b = ops.dsir_resample(docs, target, n_sample=5,
                              n_buckets=64).collect()
        assert a == b and len(a) == 5
        assert [r["sample_rank"] for r in a] == [1, 2, 3, 4, 5]

    def test_target_lookalikes_score_higher(self, spark):
        # docs matching the target's n-grams must carry higher
        # log-weights than off-target docs
        rows = [(i, "alpha beta gamma delta " * 3) for i in range(20)]
        rows += [(100 + i, "omega psi chi phi " * 3) for i in range(20)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        target = docs.where("doc_id >= 100")
        w = {
            r["doc_id"]: r["log_weight"]
            for r in ops.dsir_resample(docs, target, n_sample=40,
                                       n_buckets=64).collect()
        }
        assert min(w[i] for i in range(100, 120)) > \
            max(w[i] for i in range(20))

    def test_single_token_doc_has_unigram_only(self, spark):
        docs = spark.createDataFrame(
            [(1, "solo"), (2, "a b")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in ops.dsir_resample(
            docs, docs, n_sample=2, n_buckets=16).collect()}
        assert out[1]["n_features"] == 1      # no bigram from one token
        assert out[2]["n_features"] == 3      # a, b, 'a b'

    def test_bucket_guard(self, spark):
        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="n_buckets"):
            ops.dsir_resample(docs, docs, n_buckets=4)


class TestEloPreferenceRatings:
    def test_single_match_hand_computed(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 2.0), (2, "b", 1.0)], "o long, g string, v double"
        )
        out = {r["grp"]: r for r in ops.elo_preference_ratings(
            df, "g", "v", "o").collect()}
        # p = 0.5, delta = round(32 * (1 - 0.5) * 1e6) = 16e6
        assert out["a"]["rating"] == 1516.0
        assert out["b"]["rating"] == 1484.0
        assert out["a"]["wins"] == 1.0 and out["b"]["wins"] == 0.0
        assert out["a"]["n_played"] == 1 and out["b"]["n_played"] == 1

    def test_tie_moves_nothing_from_equal_ratings(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 5.0), (2, "b", 5.0)], "o long, g string, v double"
        )
        out = {r["grp"]: r for r in ops.elo_preference_ratings(
            df, "g", "v", "o").collect()}
        assert out["a"]["rating"] == out["b"]["rating"] == 1500.0
        assert out["a"]["wins"] == 0.5 and out["b"]["wins"] == 0.5

    def test_same_group_pairs_skipped(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 1.0)],
            "o long, g string, v double",
        )
        out = {r["grp"]: r for r in ops.elo_preference_ratings(
            df, "g", "v", "o").collect()}
        # only the (2: a) vs (3: b) pair plays
        assert out["a"]["n_played"] == 1 and out["b"]["n_played"] == 1

    def test_guards(self, spark):
        df = spark.createDataFrame(
            [(i, f"g{i}", float(i)) for i in range(30)],
            "o long, g string, v double",
        )
        with pytest.raises(ValueError, match="max_groups"):
            ops.elo_preference_ratings(df, "g", "v", "o", max_groups=10)
        with pytest.raises(ValueError, match="n_matches"):
            ops.elo_preference_ratings(df, "g", "v", "o", n_matches=0)

    def test_rating_mass_conserved_exactly(self, spark):
        # deltas are symmetric integers on the micro lattice, so total
        # rating mass is conserved EXACTLY: sum(rating) == k * 1500
        from concept_multi_db_query_engine_spark import testdata as td

        orders = td.load_table(
            spark, "/root/testdata/sf0.001", "orders")
        out = ops.elo_preference_ratings(
            orders, "o_orderpriority", "o_totalprice", "o_orderkey",
            n_matches=400,
        ).collect()
        micros = [int(round(r["rating"] * 1e6)) for r in out]
        assert sum(micros) == len(out) * 1_500_000_000


class TestDoremiMixture:
    def test_uniform_corpus_gives_uniform_weights(self, spark):
        rows = [(f"d{i}", "tok alpha beta") for i in range(4)
                for _ in range(10)]
        docs = spark.createDataFrame(rows, "source string, text string")
        out = ops.doremi_mixture_weights(docs, iterations=4).collect()
        assert len(out) == 4
        for r in out:
            assert r["excess_loss"] == 0.0
            assert r["doremi_weight"] == 0.25

    def test_hard_domain_upweighted(self, spark):
        rows = [("easy", "common words here") for _ in range(30)]
        rows += [("rare", "unseen exotic vocabulary") for _ in range(3)]
        docs = spark.createDataFrame(rows, "source string, text string")
        out = {r["source"]: r for r in
               ops.doremi_mixture_weights(docs).collect()}
        assert out["rare"]["excess_loss"] > 0.0
        assert out["rare"]["doremi_weight"] > out["easy"]["doremi_weight"]
        total = sum(r["doremi_weight"] for r in out.values())
        assert abs(total - 1.0) < 1e-4

    def test_domain_guard(self, spark):
        rows = [(f"d{i}", "x") for i in range(20)]
        docs = spark.createDataFrame(rows, "source string, text string")
        with pytest.raises(ValueError, match="max_domains"):
            ops.doremi_mixture_weights(docs, max_domains=10)


class TestKcenterDiversity:
    def test_traversal_picks_extremes_first(self, spark):
        # two tight clusters on opposite axes + one outlier: the seed
        # is id 0 (cluster A); pick 2 must come from the farthest
        # group, and radii must be non-increasing
        rows = [(i, [1.0, 0.0, 0.0]) for i in range(5)]
        rows += [(10 + i, [0.0, 1.0, 0.0]) for i in range(5)]
        rows += [(99, [0.0, 0.0, 1.0])]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        out = ops.kcenter_diversity_sample(emb, n_sample=3).collect()
        assert out[0]["vec_id"] == 0 and out[0]["min_dist"] is None
        assert out[1]["vec_id"] in (10, 11, 12, 13, 14, 99)
        assert out[1]["min_dist"] == 1.0  # orthogonal: 1 - cos(90°)
        assert out[2]["min_dist"] <= out[1]["min_dist"]

    def test_deterministic_and_degenerate_raises(self, spark):
        rows = [(i, [1.0, 0.0]) for i in range(3)]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        with pytest.raises(ValueError, match="coverage radius"):
            ops.kcenter_diversity_sample(emb, n_sample=2)
        with pytest.raises(ValueError, match="n_sample"):
            ops.kcenter_diversity_sample(emb, n_sample=0)

class TestPartitionInvariance:
    def test_dsir_and_doremi_partition_invariant(self, spark):
        # every weight is an exact BIGINT sum of micro-quantized terms,
        # so repartitioning must not move a single output bit
        from concept_multi_db_query_engine_spark import testdata as td

        docs = td.load_table(spark, "/root/testdata/sf0.001", "documents")
        tgt = docs.where("lang = 'en'")
        a = ops.dsir_resample(docs, tgt, n_sample=20,
                              n_buckets=128).collect()
        b = ops.dsir_resample(docs.repartition(7), tgt.repartition(3),
                              n_sample=20, n_buckets=128).collect()
        assert a == b
        c = ops.doremi_mixture_weights(docs).collect()
        d = ops.doremi_mixture_weights(docs.repartition(11)).collect()
        assert c == d

    def test_kcenter_partition_invariant(self, spark):
        from concept_multi_db_query_engine_spark import testdata as td

        emb = td.load_table(spark, "/root/testdata/sf0.001", "embeddings")
        a = ops.kcenter_diversity_sample(emb, n_sample=5).collect()
        b = ops.kcenter_diversity_sample(
            emb.repartition(9), n_sample=5).collect()
        assert a == b


class TestEpochAllocation:
    def test_waterfill_fills_epoch_levels_in_order(self, spark):
        rows = [("a", "w " * 10), ("b", "w " * 10)]
        docs = spark.createDataFrame(rows, "source string, text string")
        # budget = 300% of 20 tokens = 60 = 3 full epochs for both
        out = {r["source"]: r for r in ops.epoch_allocation(
            docs, budget_ratio_pct=300, decay_quarters=2).collect()}
        for s in ("a", "b"):
            assert out[s]["tokens_drawn"] == 30
            assert out[s]["epochs"] == 3.0
            # 10 * (1 + 1/2 + 1/4) = 17.5 effective
            assert out[s]["effective_tokens"] == 17.5

    def test_boundary_source_takes_fraction(self, spark):
        rows = [("a", "w " * 10), ("b", "w " * 10)]
        docs = spark.createDataFrame(rows, "source string, text string")
        # budget = 125% of 20 = 25: both full epoch 1 (20), then 'a'
        # gets 5 of its second epoch, 'b' none
        out = {r["source"]: r for r in ops.epoch_allocation(
            docs, budget_ratio_pct=125, decay_quarters=2).collect()}
        assert out["a"]["tokens_drawn"] == 15
        assert out["b"]["tokens_drawn"] == 10
        assert out["a"]["epochs"] == 1.5
        assert out["a"]["effective_tokens"] == 12.5  # 10 + 5/2
        assert out["b"]["effective_tokens"] == 10.0

    def test_max_epochs_caps_the_draw(self, spark):
        docs = spark.createDataFrame(
            [("a", "w " * 10)], "source string, text string")
        out = ops.epoch_allocation(
            docs, budget_ratio_pct=10_000, max_epochs=2).collect()[0]
        assert out["tokens_drawn"] == 20  # 2 epochs, budget unused

    def test_guards(self, spark):
        docs = spark.createDataFrame(
            [("a", "w")], "source string, text string")
        with pytest.raises(ValueError, match="decay_quarters"):
            ops.epoch_allocation(docs, decay_quarters=4)
        with pytest.raises(ValueError, match="max_epochs"):
            ops.epoch_allocation(docs, max_epochs=0)
