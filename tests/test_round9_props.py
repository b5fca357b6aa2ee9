"""Independent randomized property checks for the round-9 operators —
seeded ``random`` over small frames (the test_round8_props.py pattern:
formula arrangements that differ from both the operator AND its oracle,
so a shared algebraic mistake cannot hide).  The distributed-prefix
primitive gets the heaviest rotation: every statistic built on it is
re-derived here from first principles on the same data."""

from __future__ import annotations

import bisect
import itertools
import math
import random
from collections import Counter

from pyspark.sql import functions as F

from concept_multi_db_query_engine_spark import operators as ops


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_prefix_counts_random_partitionings(spark):
    """The primitive must be exact for ANY input partitioning and any
    duplicate/count structure — five seeds, varying partition counts."""
    for seed in range(5):
        rng = random.Random(100 + seed)
        vals = [round(rng.uniform(-5, 5), 1) for _ in range(rng.randint(
            5, 120))]
        cnt = Counter(vals)
        df = _df(spark, [(v, c) for v, c in cnt.items()],
                 "v double, c long").repartition(rng.randint(1, 13))
        out, totals = ops.distributed_prefix_counts(df, "v", ["c"])
        rows = sorted(out.collect(), key=lambda r: r["v"])
        acc = 0
        for r in rows:
            assert r["__before_c"] == acc
            acc += r["c"]
        assert totals["c"] == acc == len(vals)


def test_cvm_between_zero_and_ks_bound(spark):
    """0 ≤ T, and the pooled-term identity: T equals the direct
    definition Σ_pooled (F_A−F_B)² scaled by n_a·n_b/N² (re-derived
    with bisect, a different mechanism than cumulative windows)."""
    rng = random.Random(17)
    rows = [("a", float(rng.randint(0, 12))) for _ in range(90)]
    rows += [("b", float(rng.randint(2, 18))) for _ in range(60)]
    df = _df(spark, rows, "g string, v double")
    got = ops.cramer_von_mises(df, "v", "g", "a", "b").collect()[0]
    A = sorted(v for g, v in rows if g == "a")
    B = sorted(v for g, v in rows if g == "b")
    na, nb = len(A), len(B)
    t = sum(
        (bisect.bisect_right(A, v) / na - bisect.bisect_right(B, v) / nb)
        ** 2
        for v in (A + B)
    ) * na * nb / (na + nb) ** 2
    assert got["cvm_t"] >= 0.0
    assert abs(got["cvm_t"] - t) < 5e-5


def test_energy_distance_equals_pairwise_definition(spark):
    rng = random.Random(23)
    rows = [("a", round(rng.uniform(0, 9), 1)) for _ in range(40)]
    rows += [("b", round(rng.uniform(3, 14), 1)) for _ in range(55)]
    df = _df(spark, rows, "g string, v double")
    got = ops.energy_distance(df, "v", "g", "a", "b").collect()[0]
    A = [v for g, v in rows if g == "a"]
    B = [v for g, v in rows if g == "b"]
    exy = sum(abs(a - b) for a in A for b in B) / (len(A) * len(B))
    exx = sum(abs(a - b) for a in A for b in A) / len(A) ** 2
    eyy = sum(abs(a - b) for a in B for b in B) / len(B) ** 2
    assert abs(got["energy_d2"] - (2 * exy - exx - eyy)) < 5e-6
    assert got["energy_d2"] >= -1e-9  # energy distance is nonnegative


def test_kendall_tau_pair_classification(spark):
    """C, D re-derived by brute pair enumeration; τ-b in [-1, 1]."""
    rng = random.Random(31)
    data = [(rng.randint(0, 9), rng.randint(0, 6)) for _ in range(200)]
    df = _df(spark, data, "x int, y int")
    row = ops.kendall_tau_b(df, "x", "y").collect()[0]
    c = d = 0
    for (x1, y1), (x2, y2) in itertools.combinations(data, 2):
        s = (x1 - x2) * (y1 - y2)
        c += s > 0
        d += s < 0
    assert int(row["concordant"]) == c
    assert int(row["discordant"]) == d
    assert -1.0 <= row["tau_b"] <= 1.0


def test_anderson_darling_shift_monotonicity(spark):
    """A² must grow as one sample shifts farther from the other —
    the tail-weighting property the statistic exists for."""
    rng = random.Random(41)
    base = [float(rng.randint(0, 30)) for _ in range(120)]
    prev = None
    for shift in (0, 5, 15):
        rows = [("a", v) for v in base]
        rows += [("b", v + shift) for v in base]
        df = _df(spark, rows, "g string, v double")
        a2 = ops.anderson_darling_2s(
            df, "v", "g", "a", "b").collect()[0]["a2_akn"]
        if prev is not None:
            assert a2 > prev
        prev = a2


def test_nelson_aalen_dominates_km_log(spark):
    """H(t) ≥ −ln(S_km(t)) pointwise (Jensen on the log of products vs
    sums) — a cross-operator invariant re-deriving nothing."""
    rng = random.Random(53)
    rows = [(rng.randint(1, 20), rng.random() < 0.75) for _ in range(250)]
    df = _df(spark, rows, "dur int, obs boolean")
    km = {r["t"]: r["survival"] for r in
          ops.kaplan_meier(df, "dur", "obs").collect()}
    for r in ops.nelson_aalen(df, "dur", "obs").collect():
        s = km[r["t"]]
        if s > 0:
            assert r["cum_hazard"] <= -math.log(s) + 1e-4


def test_rank_columns_total_mass(spark):
    """Σ cnt·rank_avg = n(n+1)/2 exactly (tie-averaged ranks preserve
    the rank total), and cume_dist ends at exactly 1."""
    rng = random.Random(61)
    vals = [float(rng.randint(0, 25)) for _ in range(300)]
    df = _df(spark, [(v,) for v in vals], "v double")
    rows = sorted(ops.rank_columns(df, "v").collect(),
                  key=lambda r: r["value"])
    n = len(vals)
    mass = sum(r["cnt"] * r["rank_avg"] for r in rows)
    assert abs(mass - n * (n + 1) / 2) < 1e-3
    assert rows[-1]["cume_dist"] == 1.0


def test_ks_leaderboard_two_group_symmetry(spark):
    """With exactly two groups, 'a vs rest' and 'b vs rest' are the
    same two-sample comparison — both D statistics must be equal and
    must match ks_test on the same split."""
    rng = random.Random(71)
    rows = [("a", float(rng.randint(0, 15))) for _ in range(130)]
    rows += [("b", float(rng.randint(5, 25))) for _ in range(90)]
    df = _df(spark, rows, "g string, v double")
    lb = {r["group"]: r for r in
          ops.ks_drift_leaderboard(df, "v", "g", k=5).collect()}
    assert lb["a"]["d_num"] == lb["b"]["d_num"]
    ks = ops.ks_test(df, "v", "g", "a", "b").collect()[0]
    assert lb["a"]["d_num"] == ks["d_num"]


def test_uplift_random_treatment_has_near_zero_qini(spark):
    """Outcome independent of treatment: the final cumulative Qini is
    exactly kt − kc·nt/nc, which concentrates near 0."""
    rng = random.Random(83)
    rows = [(rng.random(), rng.random() < 0.5, int(rng.random() < 0.3),
             i) for i in range(800)]
    df = _df(spark, rows, "s double, t boolean, y int, id long")
    out = ops.uplift_deciles(df, "s", "t", "y", "id", 4).collect()
    kt = sum(y for _, t, y, _ in rows if t)
    kc = sum(y for _, t, y, _ in rows if not t)
    nt = sum(1 for _, t, _, _ in rows if t)
    nc = len(rows) - nt
    assert abs(out[-1]["qini_cum"] - (kt - kc * nt / nc)) < 1e-3
    # with no real effect the endpoint sits well inside ±3·sqrt(n)
    assert abs(out[-1]["qini_cum"]) < 3 * math.sqrt(len(rows))


def test_simpson_weighted_group_diffs_bracket_pool(spark):
    """Each group's diff and the pooled diff are reported on the same
    quantization; a reversal flag requires strictly opposite signs."""
    rng = random.Random(97)
    rows = []
    for g, (pt, pc, n) in {"x": (0.7, 0.5, 120), "y": (0.3, 0.2, 80)
                           }.items():
        rows += [(g, True, int(rng.random() < pt)) for _ in range(n)]
        rows += [(g, False, int(rng.random() < pc)) for _ in range(n)]
    df = _df(spark, rows, "g string, t boolean, y int")
    for r in ops.simpson_paradox(df, "g", "t", "y").collect():
        if r["reversed"]:
            assert r["diff"] * r["overall_diff"] < 0
