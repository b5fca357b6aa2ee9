"""Independent Python references for the stats/clustering operators.

The DuckDB oracles deliberately mirror the operators' expression text
(that is what makes them bit-replayable), so they cannot catch a shared
algebraic mistake.  These tests recompute each statistic from scratch in
plain Python over randomized small frames — different summation orders,
different formula arrangements — and accept the operator's rounded
output within a float tolerance.  Seeded ``random`` keeps runs
reproducible without hypothesis's Spark-session overhead per example.
"""

from __future__ import annotations

import itertools
import math
import random

from concept_multi_db_query_engine_spark import operators as ops


def _py_corr(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    return (n * sxy - sx * sy) / den if den else None


def test_corr_matches_python_reference(spark):
    rng = random.Random(42)
    for trial in range(3):
        # quantize inputs to 4 decimals: the operator's DECIMAL(12,4)
        # cast makes that the measured resolution
        xs = [round(rng.uniform(-50, 50), 4) for _ in range(200)]
        ys = [round(0.7 * x + rng.gauss(0, 10), 4) for x in xs]
        df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
        got = ops.column_correlations(df, ["x", "y"]).collect()[0]["corr"]
        want = _py_corr(xs, ys)
        assert abs(got - want) < 1e-5, (trial, got, want)


def test_ols_matches_python_reference(spark):
    rng = random.Random(7)
    xs = [round(rng.uniform(0, 100), 4) for _ in range(300)]
    ys = [round(3.5 * x - 20 + rng.gauss(0, 5), 4) for x in xs]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    r = ops.ols_fit(df, "x", "y").collect()[0]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    assert abs(r["slope"] - slope) < 1e-5
    assert abs(r["intercept"] - intercept) < 1e-4


def test_welch_matches_python_reference(spark):
    rng = random.Random(3)
    a = [round(rng.gauss(10, 3), 4) for _ in range(80)]
    b = [round(rng.gauss(12, 5), 4) for _ in range(60)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ops.welch_t_test(df, "v", "g", "a", "b").collect()[0]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    se = math.sqrt(va / len(a) + vb / len(b))
    t = (ma - mb) / se
    dfw = (va / len(a) + vb / len(b)) ** 2 / (
        (va / len(a)) ** 2 / (len(a) - 1)
        + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert abs(r["t_stat"] - t) < 1e-4
    assert abs(r["df_welch"] - dfw) < 1e-2


def test_ks_matches_bruteforce(spark):
    rng = random.Random(11)
    # integer values force plenty of ties across and within groups
    a = [rng.randint(0, 30) for _ in range(120)]
    b = [rng.randint(5, 35) for _ in range(90)]
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ops.ks_test(df, "v", "g", "a", "b").collect()[0]
    d = max(
        abs(
            sum(1 for x in a if x <= v) / len(a)
            - sum(1 for x in b if x <= v) / len(b)
        )
        for v in set(a) | set(b)
    )
    assert abs(r["d_stat"] - d) < 1e-6


def test_mann_whitney_matches_bruteforce(spark):
    rng = random.Random(13)
    a = [rng.randint(0, 15) for _ in range(40)]
    b = [rng.randint(5, 20) for _ in range(50)]
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ops.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    u = sum(
        1.0 if x > y else (0.5 if x == y else 0.0)
        for x in a for y in b
    )
    assert r["u_a"] == u


def test_chi_square_matches_python_reference(spark):
    rng = random.Random(17)
    rows = [
        (rng.choice(["s1", "s2", "s3"]), rng.choice(["en", "fr"]))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "source string, lang string")
    r = ops.chi_square_independence(df, "source", "lang").collect()[0]
    n = len(rows)
    cells: dict = {}
    ra: dict = {}
    cb: dict = {}
    for s, l in rows:
        cells[(s, l)] = cells.get((s, l), 0) + 1
        ra[s] = ra.get(s, 0) + 1
        cb[l] = cb.get(l, 0) + 1
    chi2 = sum(
        (obs - ra[s] * cb[l] / n) ** 2 / (ra[s] * cb[l] / n)
        for (s, l), obs in cells.items()
    )
    assert abs(r["chi2"] - chi2) < 1e-4


def test_psi_matches_python_reference(spark):
    rng = random.Random(23)
    a = [round(rng.gauss(50, 15), 4) for _ in range(300)]
    b = [round(rng.gauss(58, 15), 4) for _ in range(250)]
    fa = spark.createDataFrame([(v,) for v in a], "v double")
    fb = spark.createDataFrame([(v,) for v in b], "v double")
    r = ops.psi_drift(fa, fb, "v", bin_width=10.0).collect()[0]
    ca: dict = {}
    cb: dict = {}
    for v in a:
        ca[math.floor(v / 10.0)] = ca.get(math.floor(v / 10.0), 0) + 1
    for v in b:
        cb[math.floor(v / 10.0)] = cb.get(math.floor(v / 10.0), 0) + 1
    psi = sum(
        (ca[k] / len(a) - cb[k] / len(b))
        * math.log((ca[k] / len(a)) / (cb[k] / len(b)))
        for k in set(ca) & set(cb)
    )
    assert abs(r["psi"] - psi) < 1e-6
    assert r["n_skipped_bins"] == len(set(ca) ^ set(cb))


def test_triangles_match_bruteforce(spark):
    rng = random.Random(29)
    nodes = list(range(12))
    edges = {
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.35
    }
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "src long, dst long"
    )
    got = {r["node"]: r["triangles"]
           for r in ops.triangle_counts(df).collect()}
    want: dict = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= edges:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    present = {n for a, b in edges for n in (a, b)}
    for n in present:
        assert got[n] == want.get(n, 0), n


def test_kmeans_matches_python_reference_exactly(spark):
    """The strongest check: a pure-Python replay of the SAME integer
    recurrence (micro-unit quantization, lowest-(dist2,cid) argmin,
    truncating-division means, empty-cluster carry) must agree with the
    distributed implementation BIT-FOR-BIT — not within tolerance."""
    rng = random.Random(31)
    vecs = [[rng.uniform(-1, 1) for _ in range(6)] for _ in range(40)]
    import struct as _struct

    def f32(x):  # the parquet column is float32; createDataFrame keeps it
        return _struct.unpack("f", _struct.pack("f", x))[0]

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    k, iters = 3, 3
    q = [
        [int(_py_round_half_away(f32(x) * 10**6)) for x in v] for v in vecs
    ]
    cents = {cid: list(q[cid]) for cid in range(k)}  # lowest ids 0..k-1

    def assign():
        out = {}
        for vid, vq in enumerate(q):
            best = min(
                (sum((a - b) ** 2 for a, b in zip(vq, cents[c])), c)
                for c in sorted(cents)
            )
            out[vid] = best
        return out

    for _ in range(iters):
        a = assign()
        new = {}
        for cid in cents:
            members = [q[v] for v, (_, c) in a.items() if c == cid]
            if members:
                new[cid] = [
                    trunc_div(sum(col), len(members))
                    for col in zip(*members)
                ]
            else:
                new[cid] = cents[cid]
        cents = new
    want = {vid: (c, d) for vid, (d, c) in assign().items()}

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["cluster"], r["dist2_scaled"])
        for r in ops.kmeans_assign(df, k=k, iterations=iters).collect()
    }
    assert got == want


def _py_round_half_away(x: float) -> float:
    f = math.floor(abs(x))
    frac = abs(x) - f
    r = f + 1 if frac >= 0.5 else f
    return r if x >= 0 else -r


def test_personalized_pagerank_matches_python_reference_exactly(spark):
    """Pure-Python replay of the integer PPR recurrence — bit-for-bit,
    like the kmeans replay."""
    rng = random.Random(37)
    edges = sorted({
        (rng.randrange(15), rng.randrange(15)) for _ in range(40)
    })
    seeds = [0, 3]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank_scaled"]
        for r in ops.personalized_pagerank(
            df, seeds, iterations=6).collect()
    }

    nodes = sorted({n for e in edges for n in e})
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    scale = 10**9
    init = scale // len(seeds)
    base = init * 15 // 100
    rank = {n: (init if n in seeds else 0) for n in nodes}
    for _ in range(6):
        contrib: dict = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + rank[s] // outdeg[s]
        rank = {
            n: (base if n in seeds else 0) + 85 * contrib.get(n, 0) // 100
            for n in nodes
        }
    assert got == rank


def test_unigram_score_matches_python_reference(spark):
    rng = random.Random(41)
    vocab_pool = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab_pool) for _ in range(rng.randint(3, 12)))
        for _ in range(25)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    top_n = 10
    got = {r["doc_id"]: r["bits_per_token"]
           for r in ops.unigram_logprob_score(docs, top_n=top_n).collect()}

    counts: dict = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    n_total = sum(counts.values())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
    vocab = dict(top)
    tail1 = n_total - sum(vocab.values()) + 1
    denom = float(n_total + 1)
    for i, t in enumerate(texts):
        toks = [w for w in t.split(" ") if w]
        bits = -sum(
            math.log2(vocab.get(w, tail1) / denom) for w in sorted(toks)
        ) / len(toks)
        assert abs(got[i] - bits) < 1e-3, i


def test_token_jsd_matches_python_reference(spark):
    rng = random.Random(43)
    pool = [f"t{i}" for i in range(40)]
    mk = lambda n, lo: " ".join(  # noqa: E731
        rng.choice(pool[lo:lo + 25]) for _ in range(n))
    a_texts = [mk(rng.randint(5, 15), 0) for _ in range(20)]
    b_texts = [mk(rng.randint(5, 15), 10) for _ in range(20)]
    fa = spark.createDataFrame(
        [(i, t) for i, t in enumerate(a_texts)], "doc_id long, text string")
    fb = spark.createDataFrame(
        [(i, t) for i, t in enumerate(b_texts)], "doc_id long, text string")
    top_n = 15
    r = ops.token_jsd_drift(fa, fb, top_n=top_n).collect()[0]

    ca: dict = {}
    cb: dict = {}
    for t in a_texts:
        for w in t.split(" "):
            ca[w] = ca.get(w, 0) + 1
    for t in b_texts:
        for w in t.split(" "):
            cb[w] = cb.get(w, 0) + 1
    na, nb = sum(ca.values()), sum(cb.values())
    combined = {w: ca.get(w, 0) + cb.get(w, 0) for w in set(ca) | set(cb)}
    vocab = [w for w, _ in sorted(
        combined.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]]
    rows = [(ca.get(w, 0), cb.get(w, 0)) for w in vocab]
    rows.append((na - sum(c for c, _ in rows),
                 nb - sum(c for _, c in rows)))  # OTHER

    def term(c_a, c_b):
        p, q = c_a / na, c_b / nb
        m = (p + q) / 2.0
        out = 0.0
        if c_a > 0:
            out += 0.5 * p * math.log(p / m)
        if c_b > 0:
            out += 0.5 * q * math.log(q / m)
        return out

    want = sum(term(x, y) for x, y in rows)
    assert abs(r["jsd"] - want) < 1e-6
    assert r["n_tokens_a"] == na and r["n_tokens_b"] == nb


def test_kmv_resemblance_matches_python_reference(spark):
    """Replays the sketch algorithm itself (same md5 hash, k-min merge,
    rho estimator) — exact equality on the estimates."""
    import hashlib

    rng = random.Random(47)
    a_vals = sorted({rng.randrange(10**6) for _ in range(400)})
    b_vals = sorted({rng.randrange(10**6) for _ in range(350)}
                    | set(a_vals[:150]))
    fa = spark.createDataFrame([(v,) for v in a_vals], "u long")
    fb = spark.createDataFrame([(v,) for v in b_vals], "u long")
    k = 64
    r = ops.kmv_set_resemblance(fa, fb, "u", k=k).collect()[0]

    def h(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) / (
            1 << 60)

    sa = sorted({h(v) for v in a_vals})[:k]
    sb = sorted({h(v) for v in b_vals})[:k]
    m = sorted(set(sa) | set(sb))[:k]
    n_both = sum(1 for x in m if x in set(sa) and x in set(sb))
    k_used = len(m)
    rho = n_both / k_used
    union = k_used if k_used < k else (k - 1) / max(m)
    assert r["k_used"] == k_used and r["n_both"] == n_both
    assert r["jaccard_est"] == round(rho, 4)
    assert r["union_est"] == round(union, 4)
