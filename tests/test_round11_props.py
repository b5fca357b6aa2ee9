"""Independent randomized property checks for the round-11 operators —
seeded ``random`` over small frames (the test_round8/9_props.py
pattern: re-derivations arranged differently from both the operator
AND its oracle, so a shared algebraic mistake cannot hide).  The
Bradley-Terry fit gets the heaviest rotation: the naive O(n²)
tournament is materialized here and the MM fixed point replayed on it
from first principles."""

from __future__ import annotations

import itertools
import math
import random
import re
from collections import Counter

from concept_multi_db_query_engine_spark import operators as ops


def _half_up6(x: float) -> float:
    # the engines' round(x, 6): half away from zero
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def test_vocab_richness_random_corpora(spark):
    words = ["ka", "ro", "mi", "ta", "zu", "le", "no", "vi"]
    for seed in range(5):
        rng = random.Random(300 + seed)
        n = rng.choice([1, 2, 3])
        docs = []
        for _ in range(rng.randint(3, 12)):
            toks = [rng.choice(words) for _ in range(rng.randint(0, 9))]
            # noise separators + case to exercise tokenization parity
            sep = rng.choice([" ", ", ", "; ", "--"])
            docs.append((sep.join(t.upper() if rng.random() < 0.3
                                  else t for t in toks),))
        df = spark.createDataFrame(docs, "text string")
        r = ops.vocab_richness(df, ngram_n=n).collect()[0]
        grams = Counter()
        for (text,) in docs:
            toks = [t for t in re.split("[^a-z]+", text.lower()) if t]
            for i in range(len(toks) - n + 1):
                grams[" ".join(toks[i:i + n])] += 1
        types = len(grams)
        tokens = sum(grams.values())
        f1 = sum(1 for c in grams.values() if c == 1)
        f2 = sum(1 for c in grams.values() if c == 2)
        assert (r["types"], r["tokens"], r["f1"], r["f2"]) == (
            types, tokens, f1, f2,
        ), (seed, n)
        chao1 = types + f1 * (f1 - 1) / (2.0 * (f2 + 1))
        assert r["chao1_types"] == _half_up6(chao1)
        if tokens:
            assert r["gt_coverage"] == _half_up6(1.0 - f1 / tokens)


def test_ranking_eval_random_embeddings(spark):
    for seed in range(4):
        rng = random.Random(400 + seed)
        dim = rng.choice([4, 6])
        n = rng.randint(8, 16)
        k = rng.choice([3, 5])
        vecs = {
            i: [round(rng.uniform(-1, 1), 3) or 0.001 for _ in range(dim)]
            for i in range(n)
        }
        df = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()],
            "vec_id long, embedding array<double>",
        )
        q_ids = sorted(rng.sample(range(n), 2))
        out = {
            r["query_id"]: r
            for r in ops.ann_ranking_eval(
                df, df.where(f"vec_id in ({q_ids[0]}, {q_ids[1]})"),
                k=k, bits=4,
            ).collect()
        }

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return round(d / (na * nb), 6)

        def topk(qid, pool):
            scored = sorted(
                (((-cos(vecs[qid], vecs[c])), c) for c in pool
                 if c != qid),
            )
            return [c for _, c in scored[:k]]

        def bucket(v):
            return sum(
                (1 << (3 - j)) for j in range(4) if v[j] > 0.0
            )

        disc = [int(round(1e9 / math.log2(i + 1)))
                for i in range(1, k + 1)]
        idcg = float(sum((k + 1 - i) * disc[i - 1]
                         for i in range(1, k + 1)))
        for qid in q_ids:
            exact = topk(qid, vecs)
            pool = [c for c in vecs if bucket(vecs[c]) == bucket(vecs[qid])]
            approx = topk(qid, pool)
            rel = {c: k - i for i, c in enumerate(exact)}
            hits = sum(1 for c in approx if c in rel)
            dcg = sum(rel[c] * disc[pos]
                      for pos, c in enumerate(approx) if c in rel)
            first = next(
                (pos + 1 for pos, c in enumerate(approx) if c in rel),
                None,
            )
            r = out[qid]
            assert r["n_hits"] == hits, (seed, qid)
            assert r["ndcg"] == _half_up6(dcg / idcg), (seed, qid)
            assert r["mrr"] == (
                _half_up6(1.0 / first) if first else 0.0
            )
            assert r["precision_at_k"] == _half_up6(hits / k)


def test_bradley_terry_random_tournaments(spark):
    for seed in range(5):
        rng = random.Random(500 + seed)
        k = rng.randint(2, 4)
        groups = [f"g{i}" for i in range(k)]
        data = {
            g: [float(rng.randint(0, 12)) for _ in range(rng.randint(2, 9))]
            for g in groups
        }
        rows = [(g, v) for g, vs in data.items() for v in vs]
        df = spark.createDataFrame(rows, "g string, v double")
        iters = rng.choice([5, 25])
        out = ops.bradley_terry(df, "g", "v", iterations=iters).collect()
        # naive tournament
        w2 = [[0.0] * k for _ in range(k)]
        for i, j in itertools.permutations(range(k), 2):
            for x in data[groups[i]]:
                for y in data[groups[j]]:
                    w2[i][j] += 2.0 if x > y else (1.0 if x == y else 0.0)
        nd = [float(len(data[g])) for g in groups]
        p = [1.0] * k
        for _ in range(iters):
            newp = []
            for i in range(k):
                ws = den = 0.0
                for j in range(k):
                    if j != i:
                        ws = ws + w2[i][j]
                        den = den + ((nd[i] * nd[j]) / (p[i] + p[j]))
                newp.append((ws / 2.0) / den if den > 0.0 else 0.0)
            s = 0.0
            for x in newp:
                s = s + x
            p = [x / s for x in newp] if s > 0.0 else newp
        n_total = sum(len(v) for v in data.values())
        for i, r in enumerate(out):
            assert r["grp"] == groups[i]
            wins = sum(w2[i][j] for j in range(k) if j != i) / 2.0
            assert r["wins"] == wins
            comps = nd[i] * (n_total - nd[i])
            assert r["win_rate"] == _half_up6(wins / comps)
            assert r["bt_strength"] == _half_up6(p[i]), (seed, i)
