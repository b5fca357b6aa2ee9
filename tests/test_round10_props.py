"""Independent randomized property checks for the round-10 operators —
seeded ``random`` over small frames (the test_round8/9_props.py
pattern: re-derivations arranged DIFFERENTLY from both the operator
and its oracle, so a shared algebraic mistake cannot hide), plus
structural identities between family members (Welch ANOVA ↔ Welch t,
Tukey ↔ pooled t, CUSUM mirror symmetry, JT reversal antisymmetry)."""

from __future__ import annotations

import math
import random

from concept_multi_db_query_engine_spark import operators as ops


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _half_away(v: float) -> int:
    return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)


def test_jarque_bera_rederived_and_affine_invariant(spark):
    """Skewness/kurtosis re-derived from centered Python moments must
    match, and both are invariant under positive affine maps (the
    cents-lattice quantization makes this exact only when the affine
    image stays on the lattice — use integer a, b)."""
    rng = random.Random(11)
    xs = [float(rng.randint(-50, 200)) for _ in range(300)]
    df = _df(spark, [(x,) for x in xs], "v double")
    got = ops.jarque_bera(df, "v").collect()[0]
    n = len(xs)
    mu = sum(x * 100 for x in xs) / n / 100  # cents lattice mean
    m2 = sum((x - mu) ** 2 for x in xs) / n
    m3 = sum((x - mu) ** 3 for x in xs) / n
    m4 = sum((x - mu) ** 4 for x in xs) / n
    skew = m3 / (math.sqrt(m2) * m2)
    exk = m4 / (m2 * m2) - 3.0
    assert abs(got["skewness"] - skew) < 1e-4
    assert abs(got["ex_kurtosis"] - exk) < 1e-4
    # affine: y = 3x + 700 (integer map keeps the cents lattice exact)
    df2 = _df(spark, [(3.0 * x + 700.0,) for x in xs], "v double")
    got2 = ops.jarque_bera(df2, "v").collect()[0]
    assert abs(got2["skewness"] - got["skewness"]) < 1e-4
    assert abs(got2["ex_kurtosis"] - got["ex_kurtosis"]) < 1e-4


def test_welch_anova_two_groups_equals_welch_t_squared(spark):
    """For k = 2 Welch's F* is exactly the Welch t² (and df2 equals
    the Welch-Satterthwaite df)."""
    rng = random.Random(23)
    a = [float(rng.randint(100, 400)) for _ in range(40)]
    b = [float(rng.randint(250, 700)) for _ in range(55)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = _df(spark, rows, "g string, v double")
    got = ops.welch_anova(df, "g", "v").collect()[0]

    def mv(xs):
        n = len(xs)
        m = sum(xs) / n
        return n, m, sum((x - m) ** 2 for x in xs) / (n - 1)

    na, ma, va = mv(a)
    nb, mb, vb = mv(b)
    t2 = (ma - mb) ** 2 / (va / na + vb / nb)
    dfw = (va / na + vb / nb) ** 2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    assert abs(got["f_stat"] - t2) < max(1e-3, t2 * 1e-3)
    assert abs(got["df2"] - dfw) < max(1e-2, dfw * 1e-3)


def test_tukey_two_groups_equals_scaled_pooled_t(spark):
    """For k = 2 the studentized range q is sqrt(2)·|t_pooled|."""
    rng = random.Random(31)
    a = [float(rng.randint(100, 500)) for _ in range(30)]
    b = [float(rng.randint(200, 800)) for _ in range(45)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = _df(spark, rows, "g string, v double")
    got = ops.tukey_hsd(df, "g", "v").collect()[0]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    ssw = sum((x - ma) ** 2 for x in a) + sum((x - mb) ** 2 for x in b)
    msw = ssw / (na + nb - 2)
    t = abs(ma - mb) / math.sqrt(msw * (1 / na + 1 / nb))
    assert abs(got["q_stat"] - math.sqrt(2.0) * t) < 2e-2


def test_mcnemar_swap_inverts_ratio_keeps_chi(spark):
    rng = random.Random(7)
    rows = [(rng.random() < 0.6, rng.random() < 0.4)
            for _ in range(200)]
    df = _df(spark, rows, "a boolean, b boolean")
    r1 = ops.mcnemar_test(df, "a", "b").collect()[0]
    r2 = ops.mcnemar_test(df, "b", "a").collect()[0]
    assert r1["mcnemar_chi2"] == r2["mcnemar_chi2"]
    assert (r1["n_10"], r1["n_01"]) == (r2["n_01"], r2["n_10"])
    if r1["discordant_ratio"] and r2["discordant_ratio"]:
        assert abs(r1["discordant_ratio"] * r2["discordant_ratio"]
                   - 1.0) < 1e-4


def test_mantel_haenszel_single_stratum_is_plain_or(spark):
    rng = random.Random(13)
    rows = [("s", rng.random() < 0.5, rng.random() < 0.45)
            for _ in range(400)]
    df = _df(spark, rows, "st string, e boolean, y boolean")
    got = ops.mantel_haenszel(df, "st", "e", "y").collect()[0]
    a = sum(1 for _, e, y in rows if e and y)
    b = sum(1 for _, e, y in rows if e and not y)
    c = sum(1 for _, e, y in rows if not e and y)
    d = sum(1 for _, e, y in rows if not e and not y)
    assert abs(got["or_mh"] - (a * d) / (b * c)) < 1e-3


def test_cusum_mirror_symmetry(spark):
    """Negating the series swaps the positive and negative CUSUM arms
    exactly (same micro lattice, same running minima)."""
    rng = random.Random(41)
    vals = [float(rng.randint(0, 100)) for _ in range(120)]
    df1 = _df(spark, list(enumerate(vals)), "idx long, x double")
    df2 = _df(spark, [(i, -v) for i, v in enumerate(vals)],
              "idx long, x double")
    r1 = ops.cusum_control(df1, "idx", "x").collect()[0]
    r2 = ops.cusum_control(df2, "idx", "x").collect()[0]
    assert r1["cusum_pos_max"] == r2["cusum_neg_max"]
    assert r1["cusum_neg_max"] == r2["cusum_pos_max"]
    assert r1["pos_peak_idx"] == r2["neg_peak_idx"]


def test_runs_test_negation_invariant(spark):
    """Negating every value mirrors signs around the (negated) median
    — the run structure and z are unchanged."""
    rng = random.Random(43)
    vals = [float(rng.randint(0, 1000)) for _ in range(151)]
    df1 = _df(spark, list(enumerate(vals)), "idx long, x double")
    df2 = _df(spark, [(i, -v) for i, v in enumerate(vals)],
              "idx long, x double")
    r1 = ops.runs_test(df1, "idx", "x").collect()[0]
    r2 = ops.runs_test(df2, "idx", "x").collect()[0]
    assert r1["n_runs"] == r2["n_runs"]
    assert (r1["n_pos"], r1["n_neg"]) == (r2["n_neg"], r2["n_pos"])
    assert r1["z_stat"] == r2["z_stat"]


def test_jonckheere_score_reversal_negates_z(spark):
    rng = random.Random(47)
    rows = []
    for s in (1, 2, 3, 4):
        rows += [(s, float(rng.randint(0, 50) + 10 * s))
                 for _ in range(25)]
    df = _df(spark, rows, "s long, v double")
    fwd = ops.jonckheere_terpstra(df, "s", "v").collect()[0]
    rev = ops.jonckheere_terpstra(df, "5 - s", "v").collect()[0]
    assert abs(fwd["z_stat"] + rev["z_stat"]) < 2e-6
    # total comparable pairs conservation: JT_fwd + JT_rev = Σ n_g n_h
    ns = [25, 25, 25, 25]
    total = sum(ns[i] * ns[j] for i in range(4) for j in range(i + 1, 4))
    assert abs(fwd["jt_stat"] + rev["jt_stat"] - total) < 1e-6


def test_ljung_box_lag1_rederived(spark):
    rng = random.Random(53)
    vals = [float(rng.randint(0, 40)) for _ in range(80)]
    df = _df(spark, list(enumerate(vals)), "idx long, x double")
    out = {r["lag"]: r for r in
           ops.ljung_box(df, "idx", "x", max_lag=2).collect()}
    n = len(vals)
    mu = sum(vals) / n
    den = sum((v - mu) ** 2 for v in vals)
    r1 = sum((vals[i] - mu) * (vals[i + 1] - mu)
             for i in range(n - 1)) / den
    assert abs(out[1]["r_k"] - r1) < 1e-4
    q2 = n * (n + 2) * sum(
        out[k]["r_k"] ** 2 / (n - k) for k in (1, 2)
    )
    assert abs(out[2]["q_stat"] - q2) < 5e-3


def test_permutation_p_bounds_and_determinism(spark):
    rng = random.Random(59)
    rows = [(i, float(rng.randint(0, 100)), rng.random() < 0.5)
            for i in range(150)]
    df = _df(spark, rows, "id long, v double, g boolean")
    r1 = ops.permutation_test_mean(df, "v", "g", "id", n_perm=32) \
        .collect()[0]
    r2 = ops.permutation_test_mean(
        df.repartition(7), "v", "g", "id", n_perm=32
    ).collect()[0]
    assert r1 == r2  # md5 lanes: partitioning-independent
    assert 1.0 / 33.0 - 1e-6 <= r1["p_value"] <= 1.0


def test_bartlett_scale_invariant(spark):
    """Multiplying every value by a constant shifts each ln s² by the
    same 2·ln c, which cancels in M — the statistic is scale-free (up
    to the decimal lattice)."""
    rng = random.Random(61)
    rows = [(g, float(rng.randint(50, 150) * (i % 3 + 1)))
            for i, g in enumerate(["a", "b", "c"] * 60)]
    df1 = _df(spark, rows, "g string, v double")
    df2 = _df(spark, [(g, v * 4.0) for g, v in rows],
              "g string, v double")
    r1 = ops.bartlett_test(df1, "g", "v").collect()[0]
    r2 = ops.bartlett_test(df2, "g", "v").collect()[0]
    assert abs(r1["bartlett_stat"] - r2["bartlett_stat"]) < 5e-3


def test_kendalls_w_matches_friedman_identity(spark):
    """W = χ²_F(corrected) / (b(k−1)) — the textbook link between the
    two statistics on the SAME ranks.  The two operators quantize on
    different lattices (Friedman rounds each R²/4 to whole units, W
    micro-rounds the centered squares), so the identity holds to
    lattice precision, not bit-exactly."""
    rng = random.Random(67)
    rows = [(f"b{b}", f"t{t}", float(rng.randint(0, 30) + 4 * t))
            for b in range(12) for t in range(5)]
    df = _df(spark, rows, "blk string, t string, v double")
    fr = ops.friedman_test(df, "blk", "t", "v").collect()[0]
    w = ops.kendalls_w(df, "blk", "t", "v").collect()[0]
    assert abs(w["chi2"] - fr["chi2_corrected"]) < 0.15
    assert abs(w["w_stat"] - fr["chi2_corrected"] / (12 * 4)) < 5e-3


def test_fleiss_two_categories_rederived(spark):
    rng = random.Random(71)
    votes = []
    for s in range(50):
        for _ in range(3):
            votes.append((s, "en" if rng.random() < 0.7 else "other"))
    df = _df(spark, votes, "s long, c string")
    got = ops.fleiss_kappa(df, "s", "c", n_raters=3).collect()[0]
    from collections import Counter

    by_s = {}
    for s, c in votes:
        by_s.setdefault(s, Counter())[c] += 1
    m = 3
    pis = [(sum(v * v for v in cnt.values()) - m) / (m * (m - 1))
           for cnt in by_s.values()]
    p_bar = sum(pis) / len(pis)
    cat = Counter(c for _, c in votes)
    tot = sum(cat.values())
    p_e = sum((v / tot) ** 2 for v in cat.values())
    kappa = (p_bar - p_e) / (1 - p_e)
    assert abs(got["p_bar"] - p_bar) < 1e-4
    assert abs(got["p_e"] - p_e) < 1e-4
    assert abs(got["kappa"] - kappa) < 1e-3


def test_breusch_pagan_lm_rederived(spark):
    rng = random.Random(73)
    rows = []
    for v in range(1, 61):
        noise = float(rng.randint(-v, v))  # fanning residuals
        rows.append((float(v), 3.0 * v + 10.0 + noise))
    df = _df(spark, rows, "x double, y double")
    got = ops.breusch_pagan(df, "x", "y").collect()[0]
    # re-derive with the SAME quantized model (b, a from op output)
    b, a = got["slope"], got["intercept"]
    eq = [(_half_away((y - (a + b * x)) * 100.0)) for x, y in rows]
    xq = [_half_away(x * 100.0) for x, _ in rows]
    n = len(rows)
    u1, u2 = sum(xq), sum(q * q for q in xq)
    v1 = sum(e * e for e in eq)
    v2 = sum((e * e) ** 2 for e in eq)
    uv = sum(e * e * q for e, q in zip(eq, xq))
    num = (n * uv - u1 * v1) ** 2
    den = (n * u2 - u1 * u1) * (n * v2 - v1 * v1)
    r2 = num / den
    assert abs(got["r2_aux"] - r2) < 1e-4
    assert abs(got["lm_stat"] - n * r2) < 5e-3


def test_hurst_white_noise_near_half(spark):
    """md5-derived iid noise: H should land loosely near 0.5 — a sanity
    band, not an exact identity (R/S small-sample bias skews high)."""
    import hashlib

    vals = [
        int(hashlib.md5(f"h{i}".encode()).hexdigest()[:4], 16) / 65536.0
        for i in range(512)
    ]
    df = _df(spark, list(enumerate(vals)), "idx long, x double")
    r = ops.hurst_exponent(df, "idx", "x").collect()[0]
    assert 0.3 < r["hurst"] < 0.75
