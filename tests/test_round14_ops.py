"""Round-14 post-training (SFT / preference) wave: conversation-turn
dedup, role-aware atomic packing, the hashed n-gram classifier front
end, and the preference-pair health report — each with a hand-computed
case and a pure-Python second-modality reference (the stats-family
discipline)."""

from __future__ import annotations

import hashlib
import random

import pytest

from concept_multi_db_query_engine_spark import operators as ops
from concept_multi_db_query_engine_spark import testdata

SF_DIR = "/root/testdata/sf0.001"

TURN_SCHEMA = "conv_id long, turn_idx long, role string, text string"


class TestConversationTurnDedup:
    def test_hand_case(self, spark):
        turns = spark.createDataFrame(
            [(1, 0, "user", "hi"),
             (1, 1, "assistant", "sure thing"),
             (2, 0, "user", "hello"),
             (2, 1, "assistant", "sure thing"),     # dup of (1, 1)
             (3, 1, "assistant", "sure thing"),     # dup of (1, 1)
             (3, 3, "assistant", "something else"),
             (4, 0, "user", "sure thing")],         # user turn: ignored
            TURN_SCHEMA)
        out = ops.conversation_turn_dedup(turns).collect()
        assert [(r["conv_id"], r["turn_idx"], r["canon_conv"],
                 r["canon_turn"], r["n_copies"]) for r in out] == [
            (2, 1, 1, 1, 3), (3, 1, 1, 1, 3)]
        assert all(r["role"] == "assistant" for r in out)
        assert out[0]["fingerprint"] == hashlib.md5(
            b"sure thing").hexdigest()

    def test_null_text_excluded_and_empty_output(self, spark):
        turns = spark.createDataFrame(
            [(1, 1, "assistant", None), (2, 1, "assistant", None),
             (3, 1, "assistant", "once")],
            TURN_SCHEMA)
        assert ops.conversation_turn_dedup(turns).count() == 0

    def test_python_reference(self, spark):
        rng = random.Random(14)
        rows = [(c, t, "user" if t % 2 == 0 else "assistant",
                 "reply %d" % rng.randint(0, 6))
                for c in range(20) for t in range(rng.randint(1, 6))]
        turns = spark.createDataFrame(rows, TURN_SCHEMA)
        got = [(r["conv_id"], r["turn_idx"], r["canon_conv"],
                r["canon_turn"], r["n_copies"])
               for r in ops.conversation_turn_dedup(turns).collect()]
        # independent dict-based replay
        groups: dict[str, list] = {}
        for c, t, role, txt in sorted(rows):
            if role == "assistant":
                groups.setdefault(txt, []).append((c, t))
        want = sorted(
            (c, t, occ[0][0], occ[0][1], len(occ))
            for occ in groups.values() for (c, t) in occ[1:])
        assert got == want


class TestPackConversations:
    def test_atomic_and_budget(self, spark):
        # single shard: conversations of 5/5/5/4 tokens at budget 10
        # pack greedily as bins [0, 0, 1, 1]
        rows = []
        for conv, n in [(0, 5), (16, 5), (32, 5), (48, 4)]:
            rows.append((conv, 0, "user", " ".join(["u"] * (n - 2))))
            rows.append((conv, 1, "assistant", "a a"))
        turns = spark.createDataFrame(rows, TURN_SCHEMA)
        out = {r["conv_id"]: r for r in ops.pack_conversations(
            turns, budget_tokens=10, n_shards=16).collect()}
        assert all(r["shard"] == 0 for r in out.values())
        assert [out[c]["bin"] for c in (0, 16, 32, 48)] == [0, 0, 1, 1]
        assert out[0]["n_tokens"] == 5
        assert out[0]["n_trainable_tokens"] == 2  # assistant turns only
        assert out[48]["n_turns"] == 2

    def test_oversized_conversation_gets_own_bin(self, spark):
        rows = [(0, 0, "assistant", " ".join(["x"] * 3)),
                (16, 0, "assistant", " ".join(["y"] * 50)),  # > budget
                (32, 0, "assistant", " ".join(["z"] * 3))]
        turns = spark.createDataFrame(rows, TURN_SCHEMA)
        out = {r["conv_id"]: r["bin"] for r in ops.pack_conversations(
            turns, budget_tokens=10, n_shards=16).collect()}
        assert out == {0: 0, 16: 1, 32: 2}

    def test_python_reference_across_shards(self, spark):
        rng = random.Random(41)
        rows = []
        for conv in range(60):
            for t in range(rng.randint(1, 4)):
                n = rng.randint(1, 9)
                rows.append((conv, t,
                             "user" if t % 2 == 0 else "assistant",
                             " ".join(["w"] * n)))
        turns = spark.createDataFrame(rows, TURN_SCHEMA)
        got = {r["conv_id"]: (r["shard"], r["n_tokens"], r["bin"])
               for r in ops.pack_conversations(
                   turns, budget_tokens=12, n_shards=4).collect()}
        # independent replay: per-shard greedy in conv order
        toks: dict[int, int] = {}
        for c, _t, _r, txt in rows:
            toks[c] = toks.get(c, 0) + len(txt.split(" "))
        want = {}
        for shard in range(4):
            bin_i, running = 0, 0
            for c in sorted(x for x in toks if x % 4 == shard):
                t = toks[c]
                if running > 0 and running + t > 12:
                    bin_i += 1
                    running = 0
                want[c] = (shard, t, bin_i)
                running += t
        assert got == want

    def test_budget_validation(self, spark):
        turns = spark.createDataFrame(
            [(1, 0, "user", "x")], TURN_SCHEMA)
        with pytest.raises(ValueError, match="budget_tokens"):
            ops.pack_conversations(turns, budget_tokens=0)


class TestHashedNgramFeatures:
    def test_histogram_matches_python_md5_replay(self, spark):
        docs = spark.createDataFrame(
            [(1, "the fast scan"), (2, "one"), (3, "a b a")],
            "doc_id long, text string")
        frame, feats = ops.hashed_ngram_features(
            docs, n_buckets=8, salt="t14")
        assert len(feats) == 8
        rows = {r["doc_id"]: r for r in frame.select(
            "doc_id", "__ft_n", "__ft_cnt").collect()}

        def bucket(g: str) -> int:
            h = hashlib.md5(f"{g}:t14".encode()).hexdigest()
            return int(h[:15], 16) % 8

        for doc_id, text in [(1, "the fast scan"), (2, "one"),
                             (3, "a b a")]:
            w = text.split(" ")
            grams = w + [f"{a} {b}" for a, b in zip(w, w[1:])]
            cnt = [0] * 8
            for g in grams:
                cnt[bucket(g)] += 1
            assert rows[doc_id]["__ft_n"] == len(grams)
            assert list(rows[doc_id]["__ft_cnt"]) == cnt

    def test_single_word_doc_has_no_bigrams(self, spark):
        docs = spark.createDataFrame(
            [(1, "solo")], "doc_id long, text string")
        frame, _ = ops.hashed_ngram_features(docs, n_buckets=4)
        assert frame.collect()[0]["__ft_n"] == 1  # unigram only

    def test_feature_exprs_feed_logistic_train(self, spark):
        # en-ish docs use 'the', others don't: the classifier must
        # separate them (the features genuinely carry the signal)
        rows = [(i, "the quick the lazy the dog", 1) for i in range(10)]
        rows += [(10 + i, "uno dos tres cuatro cinco seis", 0)
                 for i in range(10)]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, y long")
        frame, feats = ops.hashed_ngram_features(docs, n_buckets=16)
        w = ops.logistic_train(frame, feats, "y", lr=1.0, iterations=12)
        scored = ops.logistic_score(frame, w, feats, "y")
        acc = scored.selectExpr(
            "avg(CASE WHEN predicted = (label = 1) THEN 1.0 "
            "ELSE 0.0 END) AS a").collect()[0]["a"]
        assert float(acc) == 1.0

    def test_bucket_validation(self, spark):
        docs = spark.createDataFrame(
            [(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="n_buckets"):
            ops.hashed_ngram_features(docs, n_buckets=1)


class TestPreferencePairReport:
    def test_hand_case(self, spark):
        pairs = spark.createDataFrame(
            [("web", 10, 5, 2.0, 1.0),     # margin +1, chosen longer
             ("web", 3, 8, 1.5, 1.5),      # margin 0 (nonpos), shorter
             ("code", 4, 4, 0.5, 2.0),     # margin -1.5, equal length
             ("code", None, 4, 1.0, 0.0)],  # NULL: dropped
            "domain string, chosen_tokens long, rejected_tokens long, "
            "chosen_reward double, rejected_reward double")
        out = {r["domain"]: r
               for r in ops.preference_pair_report(pairs).collect()}
        assert out["web"]["n_pairs"] == 2
        assert out["web"]["mean_margin"] == pytest.approx(0.5)
        assert out["web"]["frac_margin_nonpos"] == pytest.approx(0.5)
        assert out["web"]["mean_chosen_tokens"] == pytest.approx(6.5)
        assert out["web"]["mean_rejected_tokens"] == pytest.approx(6.5)
        assert out["web"]["frac_chosen_longer"] == pytest.approx(0.5)
        assert out["code"]["n_pairs"] == 1
        assert out["code"]["mean_margin"] == pytest.approx(-1.5)
        assert out["code"]["frac_margin_nonpos"] == pytest.approx(1.0)
        assert out["code"]["frac_chosen_longer"] == pytest.approx(0.0)

    def test_python_reference(self, spark):
        rng = random.Random(77)
        rows = [("d%d" % rng.randint(0, 3), rng.randint(1, 40),
                 rng.randint(1, 40),
                 round(rng.uniform(-2, 4), 3), round(rng.uniform(-2, 4), 3))
                for _ in range(200)]
        pairs = spark.createDataFrame(
            rows, "domain string, chosen_tokens long, "
            "rejected_tokens long, chosen_reward double, "
            "rejected_reward double")
        got = {r["domain"]: r
               for r in ops.preference_pair_report(pairs).collect()}
        by_dom: dict[str, list] = {}
        for d, ct, rt, cr, rr in rows:
            by_dom.setdefault(d, []).append((ct, rt, cr, rr))

        def q(x):  # the operator's micro-lattice quantization
            import math
            return int(math.floor(abs(x) * 1e6 + 0.5)) * (
                1 if x >= 0 else -1)

        for d, lst in by_dom.items():
            n = len(lst)
            margins = [q(cr) - q(rr) for _ct, _rt, cr, rr in lst]
            assert got[d]["n_pairs"] == n
            assert got[d]["mean_margin"] == pytest.approx(
                round(sum(margins) / 1e6 / n, 6), abs=1e-9)
            assert got[d]["frac_margin_nonpos"] == pytest.approx(
                round(sum(1 for m in margins if m <= 0) / n, 6))
            assert got[d]["mean_chosen_tokens"] == pytest.approx(
                round(sum(x[0] for x in lst) / n, 6))
            assert got[d]["frac_chosen_longer"] == pytest.approx(
                round(sum(1 for x in lst if x[0] > x[1]) / n, 6))


class TestBestOfNSelection:
    def test_hand_case(self, spark):
        cands = spark.createDataFrame(
            [(1, 0, 2.0, 10), (1, 1, 5.0, 20), (1, 2, 5.0, 30),
             (2, 0, 1.0, 7),
             (3, 0, None, 9), (3, 1, 0.5, 11)],
            "prompt_id long, candidate_id long, reward double, "
            "toks long")
        out = {r["prompt_id"]: r for r in ops.best_of_n_selection(
            cands, tokens_col="toks").collect()}
        # tie at reward 5.0 -> smallest candidate id wins
        assert out[1]["best_candidate"] == 1
        assert out[1]["best_reward"] == 5.0
        assert out[1]["second_reward"] == 5.0
        assert out[1]["reward_gap"] == 0.0
        assert out[1]["n_candidates"] == 3
        assert out[1]["best_tokens"] == 20
        # single candidate: no runner-up
        assert out[2]["second_reward"] is None
        assert out[2]["reward_gap"] is None
        assert out[2]["n_candidates"] == 1
        # NULL reward excluded from ranking AND the count
        assert out[3]["best_candidate"] == 1
        assert out[3]["n_candidates"] == 1

    def test_python_reference(self, spark):
        rng = random.Random(9)
        rows = [(p, c, round(rng.uniform(0, 3), 3))
                for p in range(40) for c in range(rng.randint(1, 6))]
        cands = spark.createDataFrame(
            rows, "prompt_id long, candidate_id long, reward double")
        got = [(r["prompt_id"], r["best_candidate"], r["best_reward"],
                r["second_reward"], r["n_candidates"])
               for r in ops.best_of_n_selection(cands).collect()]
        want = []
        by_p: dict[int, list] = {}
        for p, c, r in rows:
            by_p.setdefault(p, []).append((-r, c))
        for p in sorted(by_p):
            lst = sorted(by_p[p])
            want.append((p, lst[0][1], -lst[0][0],
                         -lst[1][0] if len(lst) > 1 else None,
                         len(lst)))
        assert got == want


class TestWaveInvariantsOnTestdata:
    """Real-data invariants at sf0.001 — properties that must hold for
    ANY corpus, checked on the driver's own turn/pair derivations."""

    def _turns(self, spark):
        from pyspark.sql import functions as F

        docs = testdata.load_table(spark, SF_DIR, "documents")
        return docs.where("text IS NOT NULL").select(
            F.col("doc_id").alias("conv_id"),
            F.expr("split(text, ' ')").alias("w"),
        ).select(
            "conv_id",
            F.posexplode(F.expr(
                "transform(sequence(0, CAST((size(w) - 1) / 8 AS INT)), "
                "i -> concat_ws(' ', slice(w, i * 8 + 1, 8)))"
            )).alias("turn_idx", "text"),
        ).withColumn("role", F.expr(
            "CASE WHEN turn_idx % 2 = 0 THEN 'user' "
            "ELSE 'assistant' END"))

    def test_pack_bins_respect_budget_and_are_contiguous(self, spark):
        out = ops.pack_conversations(
            self._turns(spark), budget_tokens=256, n_shards=16
        ).collect()
        by_bin: dict[tuple, list] = {}
        for r in out:
            assert r["shard"] == r["conv_id"] % 16
            assert 0 < r["n_trainable_tokens"] <= r["n_tokens"]
            by_bin.setdefault((r["shard"], r["bin"]), []).append(
                r["n_tokens"])
        # a bin over budget can only be a single oversized conversation
        for toks in by_bin.values():
            assert sum(toks) <= 256 or len(toks) == 1
        # bins are contiguous 0..max per shard
        for shard in {s for s, _ in by_bin}:
            bins = sorted(b for s, b in by_bin if s == shard)
            assert bins == list(range(len(bins)))

    def test_turn_dedup_copy_accounting(self, spark):
        turns = self._turns(spark)
        dups = ops.conversation_turn_dedup(turns).collect()
        assert dups  # the synthetic corpus genuinely repeats turns
        # per fingerprint: exactly n_copies - 1 duplicate rows, all
        # pointing at one canonical that is NOT itself listed
        by_fp: dict[str, list] = {}
        for r in dups:
            by_fp.setdefault(r["fingerprint"], []).append(r)
        for fp, rows in by_fp.items():
            n_copies = {r["n_copies"] for r in rows}
            assert len(n_copies) == 1
            assert len(rows) == n_copies.pop() - 1
            canon = {(r["canon_conv"], r["canon_turn"]) for r in rows}
            assert len(canon) == 1
            assert canon.pop() not in {
                (r["conv_id"], r["turn_idx"]) for r in rows}

    def test_best_of_n_winner_dominates_group(self, spark):
        from pyspark.sql import functions as F

        docs = testdata.load_table(spark, SF_DIR, "documents").where(
            "text IS NOT NULL AND n_chars IS NOT NULL")
        cands = docs.select(
            F.expr("CAST(doc_id DIV 5 AS BIGINT)").alias("prompt_id"),
            F.expr("CAST(doc_id % 5 AS BIGINT)").alias("candidate_id"),
            F.expr("CAST(n_chars AS DOUBLE)").alias("reward"),
        )
        out = {r["prompt_id"]: r
               for r in ops.best_of_n_selection(cands).collect()}
        groups: dict[int, list] = {}
        for r in cands.collect():
            groups.setdefault(r["prompt_id"], []).append(
                (r["reward"], r["candidate_id"]))
        assert set(out) == set(groups)
        for p, lst in groups.items():
            r = out[p]
            assert r["n_candidates"] == len(lst)
            assert r["best_reward"] == max(x[0] for x in lst)
            # the winner is the smallest id among reward-tied maxima
            assert r["best_candidate"] == min(
                c for v, c in lst if v == r["best_reward"])
            if len(lst) > 1:
                assert r["reward_gap"] is not None
                assert r["reward_gap"] >= 0.0


class TestWavePlanShapes:
    """Executed-plan locks for the wave: partitioned windows only, one
    Arrow stage in the packer, narrow-map scoring."""

    def _executed(self, df) -> str:
        df.write.format("noop").mode("overwrite").save()
        return df._jdf.queryExecution().executedPlan().toString().split(
            "== Initial Plan ==")[0]

    def _no_global_window(self, plan: str) -> None:
        import re

        bad = [ln for ln in plan.splitlines()
               if re.search(r"Window .*\[\], \[", ln)
               or "No Partition Defined" in ln]
        assert not bad, "un-partitioned Window nodes:\n" + "\n".join(bad)

    def _turns(self, spark):
        from pyspark.sql import functions as F

        docs = testdata.load_table(spark, SF_DIR, "documents")
        return docs.where("text IS NOT NULL").select(
            F.col("doc_id").alias("conv_id"),
            F.posexplode(F.expr(
                "transform(sequence(0, CAST((size(split(text, ' ')) - 1)"
                " / 8 AS INT)), i -> concat_ws(' ', "
                "slice(split(text, ' '), i * 8 + 1, 8)))"
            )).alias("turn_idx", "text"),
        ).withColumn("role", F.expr(
            "CASE WHEN turn_idx % 2 = 0 THEN 'user' "
            "ELSE 'assistant' END"))

    def test_turn_dedup_windows_are_fingerprint_partitioned(self, spark):
        plan = self._executed(
            ops.conversation_turn_dedup(self._turns(spark)))
        self._no_global_window(plan)

    def test_pack_runs_exactly_one_arrow_stage(self, spark):
        plan = self._executed(ops.pack_conversations(
            self._turns(spark), budget_tokens=256, n_shards=16))
        assert plan.count("FlatMapGroupsInPandas") == 1
        self._no_global_window(plan)

    def test_best_of_n_window_is_prompt_partitioned(self, spark):
        from pyspark.sql import functions as F

        docs = testdata.load_table(spark, SF_DIR, "documents").where(
            "text IS NOT NULL AND n_chars IS NOT NULL")
        cands = docs.select(
            F.expr("CAST(doc_id DIV 5 AS BIGINT)").alias("prompt_id"),
            F.expr("CAST(doc_id % 5 AS BIGINT)").alias("candidate_id"),
            F.expr("CAST(n_chars AS DOUBLE)").alias("reward"))
        plan = self._executed(ops.best_of_n_selection(cands))
        self._no_global_window(plan)

    def test_hashed_ngram_scoring_is_a_narrow_map(self, spark):
        docs = testdata.load_table(spark, SF_DIR, "documents").where(
            "lang IS NOT NULL")
        frame, feats = ops.hashed_ngram_features(docs, n_buckets=8)
        w = [0.01] * (len(feats) + 1)  # frozen weights: no training
        plan = self._executed(ops.logistic_score(frame, w, feats))
        # The only exchange allowed is the featurizer's scale-adaptive
        # fan-out (a round-robin repartition of the raw rows so the
        # hash/fold lambdas parallelize on single-row-group files); no
        # aggregation or join shuffle may appear in the scoring path.
        shuffles = [ln for ln in plan.splitlines() if "Exchange" in ln]
        assert all("RoundRobinPartitioning" in ln for ln in shuffles), shuffles
        assert len(shuffles) <= 1, shuffles
