"""Dedicated edge-case tests for the round-11 operator wave:
Chao1/Good-Turing vocabulary richness, graded LSH ranking eval
(NDCG@k / MRR / precision@k), and Bradley-Terry preference strengths.
Covers closed-form known cases, guard rails, and a brute-force MM
parity check for the Bradley-Terry fit (same fixed-point replayed on
naively-counted pairwise wins)."""

from __future__ import annotations

import math

import pytest

from concept_multi_db_query_engine_spark import operators as ops


class TestVocabRichness:
    def test_closed_form_counts(self, spark):
        # a x2, b x2, c x1, d x1 -> types=4 tokens=6 f1=2 f2=2
        docs = spark.createDataFrame(
            [("a a b",), ("b c",), ("d",)], "text string"
        )
        r = ops.vocab_richness(docs).collect()[0]
        assert (r["types"], r["tokens"], r["f1"], r["f2"]) == (4, 6, 2, 2)
        # chao1 = 4 + 2*1/(2*3) = 4.333333 (HALF_UP at 1e-6)
        assert r["chao1_types"] == pytest.approx(4.333333, abs=1e-9)
        assert r["gt_coverage"] == pytest.approx(0.666667, abs=1e-9)
        assert r["unseen_mass"] == pytest.approx(0.333333, abs=1e-9)

    def test_no_singletons_full_coverage(self, spark):
        docs = spark.createDataFrame(
            [("x y x y",), ("x y",)], "text string"
        )
        r = ops.vocab_richness(docs).collect()[0]
        assert r["f1"] == 0
        # f1 = 0 -> chao1 collapses to observed types, coverage = 1
        assert r["chao1_types"] == float(r["types"])
        assert r["gt_coverage"] == 1.0
        assert r["unseen_mass"] == 0.0

    def test_tokenization_matches_zipf_convention(self, spark):
        # non [a-z] splits; case folds — "It's IT" -> it, s, it
        docs = spark.createDataFrame([("It's IT",)], "text string")
        r = ops.vocab_richness(docs).collect()[0]
        assert r["tokens"] == 3 and r["types"] == 2

    def test_bigram_species(self, spark):
        # "a b a b" -> bigrams: "a b", "b a", "a b" -> types=2, f1=1
        # ("b a"), f2=1 ("a b"); short docs (< n tokens) emit nothing
        docs = spark.createDataFrame(
            [("a b a b",), ("x",)], "text string"
        )
        r = ops.vocab_richness(docs, ngram_n=2).collect()[0]
        assert (r["types"], r["tokens"], r["f1"], r["f2"]) == (2, 3, 1, 1)
        # chao1 = 2 + 1*0/(2*2) = 2
        assert r["chao1_types"] == 2.0

    def test_ngram_guard(self, spark):
        docs = spark.createDataFrame([("a",)], "text string")
        with pytest.raises(ValueError):
            ops.vocab_richness(docs, ngram_n=0)


class TestAnnRankingEval:
    def _emb(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_perfect_index_scores_one(self, spark):
        # every vector in one sign bucket (all-positive lead dims) ->
        # the LSH candidates equal the brute-force pool -> perfect
        rows = [
            (i, [1.0 + 0.1 * i, 0.5, 0.25, 0.125, float(i % 3)])
            for i in range(12)
        ]
        df = self._emb(spark, rows)
        out = ops.ann_ranking_eval(
            df, df.where("vec_id < 2"), k=5, bits=4
        ).collect()
        assert len(out) == 2
        for r in out:
            assert r["n_hits"] == 5
            assert r["ndcg"] == pytest.approx(1.0, abs=2e-6)
            assert r["mrr"] == 1.0
            assert r["precision_at_k"] == 1.0

    def test_split_buckets_lose_recall_not_order(self, spark):
        # two sign buckets; the query's bucket holds only 3 of its 5
        # true neighbors -> precision 3/5, but within-bucket order is
        # exact so the first hit is still rank 1
        rows = [
            (0, [1.0, 1.0, 1.0, 1.0, 0.0]),
            (1, [0.9, 1.0, 1.0, 1.0, 0.1]),
            (2, [0.8, 1.0, 1.0, 1.0, 0.2]),
            (3, [-1.0, 1.0, 1.0, 1.0, 0.3]),
            (4, [-0.9, 1.0, 1.0, 1.0, 0.4]),
            (5, [0.7, 1.0, 1.0, 1.0, 0.5]),
        ]
        df = self._emb(spark, rows)
        r = ops.ann_ranking_eval(
            df, df.where("vec_id = 0"), k=5, bits=4
        ).collect()[0]
        assert r["n_hits"] == 3
        assert r["precision_at_k"] == pytest.approx(0.6)
        assert r["mrr"] == 1.0
        assert 0.0 < r["ndcg"] < 1.0

    def test_k_guard(self, spark):
        df = self._emb(spark, [(0, [1.0, 1.0, 1.0, 1.0])])
        with pytest.raises(ValueError):
            ops.ann_ranking_eval(df, df, k=0)

    def test_dcg_lattice_matches_float_reference(self, spark):
        # the nano-quantized DCG must match a float NDCG to ~1e-6
        rows = [
            (i, [1.0, 1.0, 1.0, 1.0, float((i * 7) % 5), float(i % 4)])
            for i in range(10)
        ]
        df = self._emb(spark, rows)
        out = ops.ann_ranking_eval(
            df, df.where("vec_id < 3"), k=4, bits=4
        ).collect()
        idcg = sum((5 - i) / math.log2(i + 1) for i in range(1, 5))
        for r in out:
            # perfect single-bucket index: rel at pos i is 5-i
            assert r["ndcg"] == pytest.approx(
                sum((5 - i) / math.log2(i + 1) for i in range(1, 5))
                / idcg,
                abs=1e-5,
            )


class TestBradleyTerry:
    def test_dominant_group_wins(self, spark):
        rows = [("hi", 100.0 + i) for i in range(30)] + [
            ("lo", float(i)) for i in range(30)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = ops.bradley_terry(df, "g", "v", iterations=25).collect()
        by = {r["grp"]: r for r in out}
        assert by["hi"]["wins"] == 900.0  # all 30*30 comparisons won
        assert by["hi"]["win_rate"] == 1.0
        assert by["hi"]["bt_strength"] > 0.99
        assert by["lo"]["bt_strength"] < 0.01
        # normalized strengths
        assert sum(r["bt_strength"] for r in out) == pytest.approx(
            1.0, abs=1e-5
        )

    def test_ties_split_as_half_wins(self, spark):
        # identical value distributions -> every pair either tied or
        # symmetric -> wins equal, strengths equal
        rows = [(g, float(v % 5)) for g in ("a", "b") for v in range(20)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = ops.bradley_terry(df, "g", "v").collect()
        assert out[0]["wins"] == out[1]["wins"] == 200.0  # 400 comps / 2
        assert out[0]["bt_strength"] == pytest.approx(0.5, abs=1e-9)
        assert out[1]["bt_strength"] == pytest.approx(0.5, abs=1e-9)

    def test_mm_parity_with_naive_pairwise(self, spark):
        # brute-force the tournament in Python, replay the same MM, and
        # demand bit-level agreement with the distributed fit
        import itertools

        data = {
            "a": [3.0, 1.0, 4.0, 1.0, 5.0, 9.0],
            "b": [2.0, 6.0, 5.0, 3.0, 5.0],
            "c": [8.0, 9.0, 7.0, 9.0],
        }
        rows = [(g, v) for g, vs in data.items() for v in vs]
        df = spark.createDataFrame(rows, "g string, v double")
        groups = sorted(data)
        k = len(groups)
        w2 = [[0.0] * k for _ in range(k)]
        for i, j in itertools.permutations(range(k), 2):
            for x in data[groups[i]]:
                for y in data[groups[j]]:
                    if x > y:
                        w2[i][j] += 2.0
                    elif x == y:
                        w2[i][j] += 1.0
        nd = [float(len(data[g])) for g in groups]
        p = [1.0] * k
        for _ in range(25):
            newp = []
            for i in range(k):
                ws = 0.0
                den = 0.0
                for j in range(k):
                    if j == i:
                        continue
                    ws = ws + w2[i][j]
                    den = den + ((nd[i] * nd[j]) / (p[i] + p[j]))
                newp.append((ws / 2.0) / den if den > 0.0 else 0.0)
            s = 0.0
            for x in newp:
                s = s + x
            p = [x / s for x in newp] if s > 0.0 else newp
        out = ops.bradley_terry(df, "g", "v", iterations=25).collect()
        for i, r in enumerate(out):
            assert r["grp"] == groups[i]
            expected = round(p[i] * 1e6)
            assert round(r["bt_strength"] * 1e6) == expected

    def test_max_groups_guard(self, spark):
        rows = [(float(i), float(i)) for i in range(50)]
        df = spark.createDataFrame(rows, "g double, v double")
        with pytest.raises(ValueError, match="max_groups"):
            ops.bradley_terry(df, "g", "v", max_groups=10)

    def test_needs_two_groups(self, spark):
        df = spark.createDataFrame([("a", 1.0)], "g string, v double")
        with pytest.raises(ValueError, match=">= 2"):
            ops.bradley_terry(df, "g", "v")
