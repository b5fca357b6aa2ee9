"""Round-6 operator tests: MAD outliers, one-vs-rest Welch z +
Benjamini-Hochberg, deterministic Poisson-bootstrap CI — each replayed
against an independent pure-Python reference (the property-test
discipline of tests/test_stats_properties.py)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from concept_multi_db_query_engine_spark import operators as ops


# ---- mad_outliers ---------------------------------------------------------


def _round_half_up(x, nd):
    # Spark's round() on doubles goes through BigDecimal.valueOf (the
    # shortest decimal repr) with HALF_UP; Python's round() is
    # half-to-even on the binary value — they disagree exactly on the
    # .5-boundary cases randomized inputs eventually hit
    from decimal import ROUND_HALF_UP, Decimal
    return float(Decimal(repr(x)).quantize(
        Decimal(f"1e-{nd}"), rounding=ROUND_HALF_UP))


def _py_median(xs):
    s = sorted(xs)
    n = len(s)
    pos = 0.5 * (n - 1)
    lo = int(pos)
    frac = pos - lo
    hi = s[lo + 1] if frac > 0 else s[lo]
    return _round_half_up(s[lo] + (hi - s[lo]) * frac, 4)


def test_mad_outliers_matches_python_reference(spark):
    vals = [10.0, 11.0, 12.0, 11.5, 10.5, 12.5, 11.2, 400.0, -300.0, 11.8]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double"
    )
    med = _py_median(vals)
    mad = _py_median([abs(v - med) for v in vals])
    want = {}
    for i, v in enumerate(vals):
        z = round((v - med) / (1.4826 * mad), 6)
        if abs(z) > 3.5:
            want[i] = z
    got = {
        r["id"]: r["robust_z"]
        for r in ops.mad_outliers(df, "v", ["id"]).collect()
    }
    assert got == want
    assert set(got) == {7, 8}  # the two planted outliers, nothing else


def test_mad_outliers_zero_mad_flags_nothing(spark):
    # constant column: MAD = 0 -> z NULL-guarded -> no outliers (never a
    # divide-by-zero error under ANSI mode)
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(20)], "id long, v double"
    )
    assert ops.mad_outliers(df, "v", ["id"]).count() == 0


# ---- welch_z_many + bh_adjust --------------------------------------------


def _py_norm_p(z):
    pdf = 0.3989422804014327 * math.exp(-(z * z) / 2.0)
    t = 1.0 / (1.0 + 0.2316419 * abs(z))
    poly = t * (0.31938153 + t * (-0.356563782 + t * (1.781477937
               + t * (-1.821255978 + t * 1.330274429))))
    return min(1.0, round(2.0 * pdf * poly, 8))


def test_welch_z_many_matches_python_reference(spark):
    rows = []
    data = {"a": [1.0, 2.0, 3.0, 4.0], "b": [10.0, 12.0, 11.0],
            "c": [2.0, 3.0, 2.5, 3.5, 2.2]}
    for g, vs in data.items():
        rows += [(g, v) for v in vs]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = {r["grp"]: r for r in
           ops.welch_z_many(df, "grp", "v").collect()}
    allv = [v for vs in data.values() for v in vs]
    for g, vs in data.items():
        rest = [v for v in allv if v not in vs or True]
        rest = [v for gg, vv in data.items() if gg != g for v in vv]
        n, rn = len(vs), len(rest)
        mg, mr = sum(vs) / n, sum(rest) / rn
        vg = (sum(v * v for v in vs) - sum(vs) ** 2 / n) / (n - 1)
        vr = (sum(v * v for v in rest) - sum(rest) ** 2 / rn) / (rn - 1)
        z = (mg - mr) / math.sqrt(vg / n + vr / rn)
        assert out[g]["n"] == n
        assert out[g]["mean"] == round(mg, 6)
        assert out[g]["z"] == pytest.approx(round(z, 6), abs=2e-6)
        assert out[g]["p_value"] == pytest.approx(_py_norm_p(z), abs=2e-6)


def test_welch_z_many_degenerate_group_yields_null(spark):
    # a single-row group has no variance estimate: z and p must be NULL
    df = spark.createDataFrame(
        [("solo", 5.0)] + [("big", float(i)) for i in range(10)],
        "grp string, v double",
    )
    out = {r["grp"]: r for r in ops.welch_z_many(df, "grp", "v").collect()}
    assert out["solo"]["z"] is None and out["solo"]["p_value"] is None


def _py_bh(ps, alpha=0.05):
    """(rank, q, significant) per index, nulls sorted last with None q."""
    items = sorted(
        range(len(ps)),
        key=lambda i: (ps[i] is None, ps[i] if ps[i] is not None else 0, i),
    )
    m = sum(1 for p in ps if p is not None)
    q_raw = {}
    for rank, i in enumerate(items, 1):
        q_raw[i] = None if ps[i] is None else ps[i] * m / rank
    out = {}
    running = None
    for rank in range(len(items), 0, -1):
        i = items[rank - 1]
        if q_raw[i] is not None:
            running = q_raw[i] if running is None else min(running, q_raw[i])
            q = round(min(1.0, running), 8)
            out[i] = (rank, q, q <= alpha)
        else:
            out[i] = (rank, None, None)
    return out


def test_bh_adjust_matches_python_reference(spark):
    ps = [0.001, 0.04, 0.03, 0.5, None, 0.012]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], "idx long, p_value double"
    )
    got = {r["idx"]: (r["p_rank"], r["q_value"], r["significant_bh"])
           for r in ops.bh_adjust(df, "p_value", key_col="idx").collect()}
    assert got == _py_bh(ps)


def test_bh_adjust_q_values_are_monotone_step_up(spark):
    ps = [0.01, 0.02, 0.03, 0.04, 0.05, 0.9]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], "idx long, p_value double"
    )
    rows = sorted(ops.bh_adjust(df, "p_value", key_col="idx").collect(),
                  key=lambda r: r["p_rank"])
    qs = [r["q_value"] for r in rows]
    assert qs == sorted(qs)  # step-up adjustment is non-decreasing in rank


# ---- bootstrap_mean_ci ----------------------------------------------------


def _py_poisson_weight(rid, salt, b, thresholds):
    # round-6 lane scheme: one md5 per 8-replicate block, replicate b
    # reads 16-bit lane b % 8 of block b // 8
    hexd = hashlib.md5(f"{rid}:{salt}:{b // 8}".encode()).hexdigest()
    u = int(hexd[(b % 8) * 4:(b % 8) * 4 + 4], 16)
    for k, t in enumerate(thresholds):
        if u < t:
            return k
    return len(thresholds)


def test_bootstrap_ci_matches_python_replay_exactly(spark):
    from concept_multi_db_query_engine_spark.operators.stats import (
        _poisson1_thresholds,
    )

    ids = list(range(40))
    vals = [float(100 + (i * 37) % 50) + 0.25 for i in ids]
    df = spark.createDataFrame(
        list(zip(ids, vals)), "id long, v double"
    )
    B = 16
    ts = _poisson1_thresholds()
    means = []
    for b in range(B):
        sw = swx = 0
        for i, v in zip(ids, vals):
            w = _py_poisson_weight(i, "boot", b, ts)
            sw += w
            swx += w * v
        means.append(swx / sw)
    means.sort()
    lo_pos = 0.025 * (B - 1)
    hi_pos = 0.975 * (B - 1)
    li, lf = int(lo_pos), lo_pos - int(lo_pos)
    hi, hf = int(hi_pos), hi_pos - int(hi_pos)
    want_lo = round(means[li] + (means[min(li + 1, B - 1)] - means[li]) * lf, 6)
    want_hi = round(means[hi] + (means[min(hi + 1, B - 1)] - means[hi]) * hf, 6)
    row = ops.bootstrap_mean_ci(df, "v", "id", n_replicates=B).collect()[0]
    assert row["n_rows"] == len(ids)
    assert row["mean"] == round(sum(vals) / len(vals), 6)
    assert row["ci_lo"] == pytest.approx(want_lo, abs=1e-6)
    assert row["ci_hi"] == pytest.approx(want_hi, abs=1e-6)
    assert row["ci_lo"] < row["mean"] < row["ci_hi"]


def test_bootstrap_ci_is_partitioning_independent(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 17).cast("double").alias("v")
    )
    a = ops.bootstrap_mean_ci(df, "v", "id", n_replicates=12).collect()[0]
    b = ops.bootstrap_mean_ci(
        df.repartition(13), "v", "id", n_replicates=12).collect()[0]
    assert a == b


def test_bootstrap_ci_validates_ci(spark):
    df = spark.range(5).select("id", F.lit(1.0).alias("v"))
    with pytest.raises(ValueError, match="ci"):
        ops.bootstrap_mean_ci(df, "v", "id", ci=1.5)


# ---- semantic dedup / standardize / cosine histogram ----------------------


def _vec(*seed, dim=8):
    import random
    rng = random.Random(str(seed))
    return [round(rng.uniform(-1, 1), 3) for _ in range(dim)]


def test_semantic_dedup_finds_planted_near_duplicates(spark):
    base_a = _vec(1)
    base_b = [-x for x in base_a]
    rows = []
    # two tight families (copies with a tiny epsilon on one component)
    for i in range(4):
        va = list(base_a)
        va[0] = round(va[0] + i * 1e-3, 6)
        vb = list(base_b)
        vb[1] = round(vb[1] + i * 1e-3, 6)
        rows.append((i, va))
        rows.append((10 + i, vb))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = ops.semantic_dedup_pairs(
        df, k=2, iterations=3, threshold=0.99
    ).collect()
    got = {(r["d1"], r["d2"]) for r in pairs}
    # every within-family pair is found, no cross-family pair sneaks in
    fam_a = {(i, j) for i in range(4) for j in range(4) if i < j}
    fam_b = {(10 + i, 10 + j) for i in range(4) for j in range(4) if i < j}
    assert got == fam_a | fam_b
    for r in pairs:
        assert r["cosine"] >= 0.99


def test_semantic_dedup_within_cluster_only(spark):
    # opposite vectors land in different k=2 clusters: their (negative)
    # cosine is never even computed, so no pair can cross clusters
    rows = [(i, _vec(9, i)) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = ops.semantic_dedup_pairs(df, k=3, iterations=2, threshold=-2.0)
    assign = {
        r["vec_id"]: r["cluster"]
        for r in ops.kmeans_assign(df, k=3, iterations=2).collect()
    }
    for r in pairs.collect():
        assert assign[r["d1"]] == assign[r["d2"]] == r["cluster"]


def test_standardize_embeddings_python_replay(spark):
    rows = [(i, [float(i), float(10 - i), 5.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["z_vec"]
           for r in ops.standardize_embeddings(df, dim=3).collect()}
    cols = list(zip(*[v for _, v in rows]))
    for vid, vec in rows:
        for j, x in enumerate(vec):
            q = [round(c * 1e6) for c in cols[j]]
            n = len(q)
            mean = sum(q) / n
            var = sum(v * v for v in q) / n - mean * mean
            xq = round(x * 1e6)
            want = (round((xq - mean) / math.sqrt(var), 6)
                    if var > 0 else None)
            assert out[vid][j] == want, (vid, j)


def test_standardize_constant_dim_is_null_not_error(spark):
    rows = [(i, [1.5, float(i)]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for r in ops.standardize_embeddings(df, dim=2).collect():
        assert r["z_vec"][0] is None
        assert r["z_vec"][1] is not None


def test_cosine_histogram_bins_partition_all_adjacent_pairs(spark):
    rows = [(i, _vec(3, i)) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    hist = ops.cosine_similarity_histogram(df, n_bins=10).collect()
    assert sum(r["n_pairs"] for r in hist) == 39
    for r in hist:
        assert 0 <= r["bin"] <= 9
        assert r["hi"] == pytest.approx(r["lo"] + 0.2, abs=1e-9)


def test_cosine_histogram_identical_vectors_land_in_top_bin(spark):
    v = _vec(7)
    df = spark.createDataFrame(
        [(i, v) for i in range(5)], "vec_id long, embedding array<float>"
    )
    hist = ops.cosine_similarity_histogram(df, n_bins=20).collect()
    assert len(hist) == 1 and hist[0]["bin"] == 19
    assert hist[0]["n_pairs"] == 4


# ---- importance weights / url dedup / greedy packing ----------------------


def test_importance_weights_favor_target_like_docs(spark):
    target_rows = [(i, "alpha beta gamma delta") for i in range(10)]
    source_extra = [(100 + i, "omega psi chi phi") for i in range(10)]
    docs = spark.createDataFrame(
        target_rows + source_extra, "doc_id long, text string"
    )
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    out = {r["doc_id"]: r["avg_log_ratio"]
           for r in ops.importance_weights(docs, target, top_n=50).collect()}
    # docs made of target vocabulary outweigh pure-source docs
    assert out[0] > out[100]
    assert all(out[i] == out[0] for i in range(10))


def test_importance_weights_empty_doc_is_null(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           ops.importance_weights(docs, docs, top_n=10).collect()}
    assert out[2]["n_tokens"] == 0 and out[2]["avg_log_ratio"] is None
    # target == source: every ratio is 1, every weight exactly 0
    assert out[1]["avg_log_ratio"] == 0.0


def test_url_normalize_dedup_groups_variants(spark):
    urls = [
        (1, "https://www.Example.com/Page/1"),
        (2, "HTTP://example.com/page/1/"),
        (3, "example.com/page/1?utm=x"),
        (4, "https://example.com/page/1#section"),
        (5, "https://other.org/a"),
    ]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    out = {r["canonical_url"]: r
           for r in ops.url_normalize_dedup(df, "url").collect()}
    assert set(out) == {"example.com/page/1", "other.org/a"}
    grp = out["example.com/page/1"]
    assert grp["n_docs"] == 4 and grp["n_variants"] == 4
    assert grp["keep_id"] == 1
    assert out["other.org/a"]["n_docs"] == 1


def test_pack_documents_greedy_respects_budget_and_order(spark):
    rows = [(i, " ".join(["w"] * n))
            for i, n in enumerate([50, 40, 30, 20, 10, 5, 120])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        ops.pack_documents_greedy(
            df, budget_tokens=100, n_shards=1).collect(),
        key=lambda r: (r["bin"], -r["n_tokens"], r["doc_id"]),
    )
    # NFD order: 120 | 50 40 | 30 20 10 5 -> oversize doc alone in bin 0
    by_bin = {}
    for r in out:
        by_bin.setdefault(r["bin"], []).append(r["n_tokens"])
    assert by_bin == {0: [120], 1: [50, 40], 2: [30, 20, 10, 5]}
    for r in out:
        if r["n_tokens"] <= 100:
            assert r["bin_fill"] <= 100


def test_pack_documents_greedy_shards_are_independent(spark):
    rows = [(i, " ".join(["w"] * (10 + i % 7))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ops.pack_documents_greedy(df, budget_tokens=64, n_shards=4)
    for r in out.collect():
        assert r["shard"] == r["doc_id"] % 4
        assert r["bin_fill"] <= 64  # no doc here exceeds the budget


# ---- count-min / windowed funnel / label propagation ----------------------


def test_count_min_estimates_never_undercount(spark):
    rows = [(f"k{i % 30}",) for i in range(500)]
    df = spark.createDataFrame(rows, "k string")
    out = ops.count_min_estimates(df, "k", depth=4, width=16).collect()
    assert len(out) == 30
    for r in out:
        assert r["cms_estimate"] >= r["exact_count"]
        assert r["overcount"] == r["cms_estimate"] - r["exact_count"]


def test_count_min_wide_sketch_is_exact(spark):
    # width >> keys: collisions vanish and every estimate is exact
    rows = [(f"k{i % 10}",) for i in range(200)]
    df = spark.createDataFrame(rows, "k string")
    for r in ops.count_min_estimates(df, "k", depth=4, width=4096).collect():
        assert r["cms_estimate"] == r["exact_count"] == 20


def test_count_min_matches_python_replay(spark):
    keys = [f"u{i % 7}" for i in range(60)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    depth, width = 3, 8
    sketch = {}
    for k in keys:
        for j in range(depth):
            h = int(hashlib.md5(f"{k}:cms:{j}".encode())
                    .hexdigest()[:15], 16) % width
            sketch[(j, h)] = sketch.get((j, h), 0) + 1
    want = {}
    for k in set(keys):
        want[k] = min(
            sketch[(j, int(hashlib.md5(f"{k}:cms:{j}".encode())
                           .hexdigest()[:15], 16) % width)]
            for j in range(depth)
        )
    got = {r["k"]: r["cms_estimate"]
           for r in ops.count_min_estimates(
               df, "k", depth=depth, width=width).collect()}
    assert got == want


def test_windowed_funnel_respects_conversion_window(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def h(hours):
        return t0 + dt.timedelta(hours=hours)

    rows = [
        # user 1: full funnel inside the window
        (1, "signup", h(0)), (1, "view", h(5)), (1, "purchase", h(8)),
        # user 2: view arrives after the window -> stops at step 1
        (2, "signup", h(0)), (2, "view", h(200)), (2, "purchase", h(201)),
        # user 3: purchase before the view doesn't count; none after
        (3, "signup", h(0)), (3, "purchase", h(1)), (3, "view", h(2)),
        # user 4: no signup at all
        (4, "view", h(0)), (4, "purchase", h(1)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    out = {r["user_id"]: r for r in
           ops.windowed_funnel(df, window_hours=168).collect()}
    assert out[1]["reached_step"] == 3
    assert out[2]["reached_step"] == 1 and out[2]["step2_ts"] is None
    assert out[3]["reached_step"] == 2 and out[3]["step3_ts"] is None
    assert out[4]["reached_step"] == 0


def test_label_propagation_separates_disjoint_cliques(spark):
    tri = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(tri, "src long, dst long")
    out = {r["node"]: r["label"]
           for r in ops.label_propagation(df, iterations=4).collect()}
    assert out[1] == out[2] == out[3]
    assert out[10] == out[11] == out[12]
    assert out[1] != out[10]


def test_label_propagation_deterministic_across_partitioning(spark):
    edges = [(i, (i * 3) % 17) for i in range(17)] + [(i, i + 17) for i in range(5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted((r["node"], r["label"])
               for r in ops.label_propagation(df, 4).collect())
    b = sorted((r["node"], r["label"])
               for r in ops.label_propagation(df.repartition(7), 4).collect())
    assert a == b


def test_label_propagation_resolves_bipartite_oscillation(spark):
    # synchronous LPA period-2-cycles on a complete bipartite graph
    # (the two sides swap labels forever); the least(l_T, l_{T-1})
    # resolution must map the cycle to ONE labeling, invariant to
    # running extra rounds — and unite the flip-locked sides (K33 is
    # one community)
    k33 = [(a, b) for a in (1, 2, 3) for b in (10, 11, 12)]
    df = spark.createDataFrame(k33, "src long, dst long")
    outs = [sorted((r["node"], r["label"])
                   for r in ops.label_propagation(df, t).collect())
            for t in (4, 5, 6)]
    assert outs[0] == outs[1] == outs[2]
    labels = {lab for _, lab in outs[0]}
    assert len(labels) == 1  # the flip-locked block is one community
    # the documented raw mode still oscillates on this fixture — the
    # regression this test pins the resolution against
    s4 = sorted((r["node"], r["label"]) for r in ops.label_propagation(
        df, 4, resolve_oscillation=False).collect())
    s5 = sorted((r["node"], r["label"]) for r in ops.label_propagation(
        df, 5, resolve_oscillation=False).collect())
    assert s4 != s5


# ---- session paths / reservoir / EWMA / z-order / skew report -------------


def test_session_paths_orders_and_splits_on_gap(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "signup"),
        (2, 1, t0 + dt.timedelta(minutes=5), "view"),
        # 2h gap -> new session
        (3, 1, t0 + dt.timedelta(hours=2, minutes=10), "purchase"),
        (4, 2, t0, "signup"),
        (5, 2, t0 + dt.timedelta(minutes=1), "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {r["path"]: r["n_sessions"]
           for r in ops.session_paths(df, gap_minutes=30).collect()}
    assert out == {"signup>view": 2, "purchase": 1}


def test_reservoir_sample_deterministic_and_sized(spark):
    df = spark.createDataFrame(
        [(i, f"t{i % 3}") for i in range(90)], "event_id long, grp string"
    )
    a = ops.reservoir_sample_per_group(df, "grp", 4, id_col="event_id")
    rows_a = sorted((r["grp"], r["event_id"]) for r in a.collect())
    rows_b = sorted(
        (r["grp"], r["event_id"])
        for r in ops.reservoir_sample_per_group(
            df.repartition(7), "grp", 4, id_col="event_id").collect()
    )
    assert rows_a == rows_b
    from collections import Counter
    sizes = Counter(g for g, _ in rows_a)
    assert sizes == {"t0": 4, "t1": 4, "t2": 4}
    # re-salting changes the picks
    rows_c = sorted(
        (r["grp"], r["event_id"])
        for r in ops.reservoir_sample_per_group(
            df, "grp", 4, id_col="event_id", salt="other").collect()
    )
    assert rows_a != rows_c


def test_daily_ewma_constant_series_is_flat(spark):
    import datetime as dt

    rows = []
    eid = 0
    for d in range(40):
        for _ in range(7):  # exactly 7 events every day
            rows.append((eid, dt.datetime(2024, 1, 1 + d % 27, 12)
                         + dt.timedelta(days=27 * (d // 27)), "a"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    out = ops.daily_ewma(df.withColumn("user_id", F.lit(1))).collect()
    for r in out:
        # weighted average of a constant is that constant at any window
        assert r["ewma"] == pytest.approx(7.0, abs=1e-6), r


def test_daily_ewma_zero_fills_gap_days(spark):
    import datetime as dt

    rows = [(1, dt.datetime(2024, 1, 1), "a"),
            (2, dt.datetime(2024, 1, 5), "a")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    ).withColumn("user_id", F.lit(1))
    out = {str(r["day"]): r for r in ops.daily_ewma(df).collect()}
    assert len(out) == 5  # the 3 silent days appear
    assert out["2024-01-03"]["n"] == 0
    assert 0 < out["2024-01-03"]["ewma"] < 1  # decayed day-1 mass


def test_zorder_code_matches_python_interleave(spark):
    df = spark.createDataFrame(
        [(i, i * 7 % 300, i * 13 % 300) for i in range(100)],
        "id long, a long, b long",
    )
    out = {r["id"]: r["zorder"]
           for r in ops.zorder_code(df, "a", "b", bits=10).collect()}
    for i in range(100):
        a, b = (i * 7 % 300) & 1023, (i * 13 % 300) & 1023
        want = 0
        for j in range(10):
            want |= ((a >> j) & 1) << (2 * j)
            want |= ((b >> j) & 1) << (2 * j + 1)
        assert out[i] == want


def test_zorder_code_int32_columns_wide_bits(spark):
    # regression: 32-bit INT input columns used to keep the shift
    # arithmetic in 32-bit — bits=16 emitted shiftleft(..., 31) which
    # overflowed to -2^31, and bits>16 wrapped shift amounts mod 32.
    # The BIGINT cast inside morton_expr makes every term 64-bit.
    vals = [(0, 65535, 65535), (1, 32768, 32768), (2, 16777215, 1),
            (3, 12345678, 87654321)]
    df = spark.createDataFrame(vals, "id int, a int, b int")
    for bits in (16, 24):
        out = {r["id"]: r["zorder"]
               for r in ops.zorder_code(df, "a", "b", bits=bits).collect()}
        mask = (1 << bits) - 1
        for i, a, b in vals:
            a, b = a & mask, b & mask
            want = 0
            for j in range(bits):
                want |= ((a >> j) & 1) << (2 * j)
                want |= ((b >> j) & 1) << (2 * j + 1)
            assert out[i] == want, (bits, i)
            assert out[i] >= 0


def test_zorder_layout_clusters_both_dimensions(spark):
    # rows sorted by z-code: consecutive rows must be close in BOTH
    # dimensions on average — closer than the column-sorted layout is
    # in its non-sorted dimension
    df = spark.createDataFrame(
        [(i, (i * 37) % 64, (i * 11) % 64) for i in range(512)],
        "id long, a long, b long",
    )
    rows = ops.zorder_layout(df, "a", "b", bits=6, num_partitions=4) \
        .collect()
    seq = [(r["a"], r["b"]) for r in rows]

    def avg_jump(vals):
        return sum(abs(x - y) for x, y in zip(vals, vals[1:])) / (
            len(vals) - 1)

    ja = avg_jump([a for a, _ in seq])
    jb = avg_jump([b for _, b in seq])
    # a purely a-sorted layout would give jb ~ uniform-random (~21);
    # z-order keeps both below half of that
    assert ja < 11 and jb < 11


def test_join_skew_report_shares_and_ranks(spark):
    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("cold",)] * 10
    df = spark.createDataFrame(rows, "k string")
    out = {r["rank"]: r for r in
           ops.join_skew_report(df, "k", top_n=2).collect()}
    assert out[1]["k"] == "hot" and out[1]["cnt"] == 60
    assert out[1]["share_ppm"] == 600000
    assert out[2]["k"] == "warm" and out[2]["share_ppm"] == 300000
    assert len(out) == 2


# ---- snapshot diff / truncation report / budget allocation ----------------


def test_corpus_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", "s1"), (2, "b", "s1"), (3, "c", "s2")],
        "doc_id long, text string, source string",
    )
    new = spark.createDataFrame(
        [(1, "a", "s1"),        # unchanged
         (2, "b CHANGED", "s1"),  # changed
         (4, "d", "s2")],        # added; doc 3 removed
        "doc_id long, text string, source string",
    )
    out = {(r["source"], r["status"]): r["n_docs"]
           for r in ops.corpus_snapshot_diff(old, new).collect()}
    assert out == {("s1", "unchanged"): 1, ("s1", "changed"): 1,
                   ("s2", "added"): 1, ("s2", "removed"): 1}


def test_truncation_report_exact_token_accounting(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 10), "en"),
         (2, " ".join(["w"] * 100), "en"),
         (3, " ".join(["w"] * 50), "fr")],
        "doc_id long, text string, lang string",
    )
    out = {r["lang"]: r for r in
           ops.truncation_report(docs, max_tokens=64).collect()}
    en = out["en"]
    assert (en["n_docs"], en["n_truncated"]) == (2, 1)
    assert (en["total_tokens"], en["kept_tokens"]) == (110, 74)
    assert en["lost_ppm"] == (110 - 74) * 1_000_000 // 110
    fr = out["fr"]
    assert fr["n_truncated"] == 0 and fr["lost_ppm"] == 0


def test_budget_allocation_caps_and_redistributes(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n), s)
         for i, (n, s) in enumerate(
             [(800, "big")] * 1 + [(100, "a")] * 1 + [(100, "b")] * 1)],
        "doc_id long, text string, source string",
    )
    # budget 1000, cap 40% -> big's raw 800 capped at 400; leftover
    # 1000 - (400+100+100) = 400 redistributed to a and b by tokens
    out = {r["source"]: r for r in ops.budget_allocation(
        docs, budget_tokens=1000, cap_ppm=400_000).collect()}
    assert out["big"]["capped"] is True
    assert out["big"]["alloc_tokens"] == 400
    assert out["a"]["alloc_tokens"] == 100 + 400 * 100 // 200 == 300
    assert out["b"]["alloc_tokens"] == 300
    # epochs: a must repeat 3x to fill its allocation
    assert out["a"]["epochs_ppm"] == 3_000_000
    assert out["big"]["epochs_ppm"] == 500_000


def _waterfill_reference(tokens_by_src, budget, cap):
    """Pure-Python iterative water-filling: pin capped sources at the
    cap, re-split the remainder proportionally, repeat until no cap
    binds — the semantics budget_allocation's closed form must match."""
    capped = set()
    while True:
        unc = {s: t for s, t in tokens_by_src.items() if s not in capped}
        unc_tok = sum(unc.values())
        rem = budget - cap * len(capped)
        raw = {s: (rem * t // unc_tok if unc_tok else 0)
               for s, t in unc.items()}
        newly = {s for s, v in raw.items() if v > cap}
        if not newly:
            return {s: (cap if s in capped else raw[s])
                    for s in tokens_by_src}, capped
        capped |= newly


def test_budget_allocation_hard_caps_never_overshoot(spark):
    # Hard-cap fixture: the old single redistribution pass gave
    # mid = 10 + 680*10//20 = 350 > cap 300 — an overshoot. Water-
    # filling pins every source at <= cap and matches the iterative
    # pure-Python fixpoint exactly.
    toks = {"big": 980, "mid": 10, "small": 10}
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n), s)
         for i, (s, n) in enumerate(toks.items())],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in ops.budget_allocation(
        docs, budget_tokens=1000, cap_ppm=300_000).collect()}
    want, capped = _waterfill_reference(toks, 1000, 300)
    for s in toks:
        assert out[s]["alloc_tokens"] == want[s], s
        assert out[s]["alloc_tokens"] <= 300, s
        assert out[s]["capped"] == (s in capped), s


def test_budget_allocation_matches_iterative_fixpoint(spark):
    # broader sweep: several cap regimes against the iterative reference
    toks = {"s1": 500, "s2": 300, "s3": 120, "s4": 60, "s5": 20}
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n), s)
         for i, (s, n) in enumerate(toks.items())],
        "doc_id long, text string, source string",
    )
    for cap_ppm in (150_000, 250_000, 400_000, 900_000):
        out = {r["source"]: r for r in ops.budget_allocation(
            docs, budget_tokens=2000, cap_ppm=cap_ppm).collect()}
        cap = 2000 * cap_ppm // 1_000_000
        want, capped = _waterfill_reference(toks, 2000, cap)
        for s in toks:
            assert out[s]["alloc_tokens"] == want[s], (cap_ppm, s)
            assert out[s]["capped"] == (s in capped), (cap_ppm, s)


def test_budget_allocation_validates_inputs(spark):
    docs = spark.createDataFrame(
        [(1, "w", "s")], "doc_id long, text string, source string")
    with pytest.raises(ValueError):
        ops.budget_allocation(docs, budget_tokens=0)
    with pytest.raises(ValueError):
        ops.budget_allocation(docs, budget_tokens=10, cap_ppm=0)


# ---- equi-depth histogram / frequent values -------------------------------


def test_equidepth_histogram_balanced_bins(spark):
    df = spark.range(1000).select(
        (F.col("id") * 37 % 1000).cast("double").alias("v")
    )
    out = sorted(ops.equidepth_histogram(df, "v", 10).collect(),
                 key=lambda r: r["bin"])
    assert [r["bin"] for r in out] == list(range(10))
    # equi-depth: every bin within ±1 of n/k on a permutation of 0..999
    for r in out:
        assert abs(r["n"] - 100) <= 1, r
    assert out[0]["lo"] is None and out[-1]["hi"] is None
    for a, b in zip(out, out[1:]):
        assert a["hi"] == b["lo"]


def test_equidepth_histogram_validates_bins(spark):
    df = spark.range(10).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError):
        ops.equidepth_histogram(df, "v", 1)


def test_frequent_values_per_column_topk(spark):
    df = spark.createDataFrame(
        [("a", "x")] * 5 + [("b", "x")] * 3 + [("c", "y")] * 2,
        "p string, s string",
    )
    out = {(r["col_name"], r["rank"]): r for r in
           ops.frequent_values(df, ["p", "s"], k=2).collect()}
    assert out[("p", 1)]["value"] == "a" and out[("p", 1)]["cnt"] == 5
    assert out[("p", 1)]["share_ppm"] == 500000
    assert out[("p", 2)]["value"] == "b"
    assert out[("s", 1)]["value"] == "x" and out[("s", 1)]["cnt"] == 8
    assert len(out) == 4  # k=2 per column, nothing more


# ---- BPE training ---------------------------------------------------------


def _py_bpe(word_counts, n_merges):
    """Reference Sennrich BPE on a word-frequency dict."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = {}
        for toks, c in vocab.items():
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (l, r), wc = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, l + r, wc))
        new_vocab = {}
        for toks, c in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if (i + 1 < len(toks) and toks[i] == l
                        and toks[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_python_reference(spark):
    words = {"lower": 5, "low": 7, "newest": 6, "widest": 3, "new": 2}
    text = " ".join(w for w, c in words.items() for _ in range(c))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [(r["rank"], r["lhs"], r["rhs"], r["merged"],
            r["weighted_count"])
           for r in ops.bpe_train_merges(docs, n_merges=6)
           .orderBy("rank").collect()]
    assert got == _py_bpe(words, 6)


def test_bpe_batched_learning_is_bit_stable_vs_sequential(spark):
    # the DISTRIBUTED batched learner (top-M disjoint prefix,
    # conflict-count truncation; forced via local_vocab_limit=0) must
    # produce EXACTLY the sequential merge table — exercised on a
    # tie-heavy vocab where naive batching diverges
    words = {"lower": 5, "low": 7, "newest": 6, "widest": 3, "new": 2,
             "aaab": 4, "aabb": 4, "abab": 4, "banana": 3, "bandana": 2}
    text = " ".join(w for w, c in words.items() for _ in range(c))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    want = _py_bpe(words, 20)
    for bs in (1, 2, 4, 16):
        got = [(r["rank"], r["lhs"], r["rhs"], r["merged"],
                r["weighted_count"])
               for r in ops.bpe_train_merges(
                   docs, n_merges=20, batch_size=bs,
                   local_vocab_limit=0)
               .orderBy("rank").collect()]
        assert got == want, f"batch_size={bs} diverged from sequential"


def test_bpe_local_and_distributed_paths_agree_on_real_corpus(spark):
    # 64 merges on the sf0.001 corpus: the driver-local dictionary
    # path (default — vocab fits) == the distributed batched path
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    loc = [(r["rank"], r["lhs"], r["rhs"], r["merged"],
            r["weighted_count"])
           for r in ops.bpe_train_merges(docs, n_merges=64)
           .orderBy("rank").collect()]
    assert ops.bpe_train_merges.last_rounds == 0  # took the local path
    bat = [(r["rank"], r["lhs"], r["rhs"], r["merged"],
            r["weighted_count"])
           for r in ops.bpe_train_merges(
               docs, n_merges=64, batch_size=16, local_vocab_limit=0)
           .orderBy("rank").collect()]
    assert ops.bpe_train_merges.last_rounds > 0  # took the batched path
    assert bat == loc
    assert len(bat) == 64


def test_bpe_merge_is_greedy_left_nonoverlapping(spark):
    # 'aaaa' under merge (a,a) must become (aa, aa) — never (a, aa, a)
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aa")], "doc_id long, text string"
    )
    m = {r["rank"]: r for r in
         ops.bpe_train_merges(docs, n_merges=2,
                              local_vocab_limit=0).collect()}
    assert (m[1]["lhs"], m[1]["rhs"]) == ("a", "a")
    # after round 1: aaaa -> (aa)(aa) x2 and aa -> (aa); so (aa, aa)
    # pairs dominate round 2
    assert (m[2]["lhs"], m[2]["rhs"]) == ("aa", "aa")
    assert m[2]["merged"] == "aaaa"


def test_bpe_stops_when_no_pairs_remain(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b")], "doc_id long, text string"
    )
    rows = ops.bpe_train_merges(docs, n_merges=10).collect()
    assert len(rows) == 0  # single-char words have no pairs to merge


def test_bpe_encode_applies_frozen_merges_in_order(spark):
    docs = spark.createDataFrame(
        [(1, "abab ab"), (2, "xy")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in ops.bpe_encode_stats(
        docs, [("a", "b"), ("ab", "ab")]).collect()}
    # 'abab' -> (ab)(ab) -> (abab): 1 token from 4 chars; 'ab' -> 1
    assert out[1]["n_chars"] == 6
    assert out[1]["n_bpe_tokens"] == 2
    assert out[1]["compression_ppm"] == 4 * 1_000_000 // 6
    # no merges apply to 'xy'
    assert out[2]["n_bpe_tokens"] == 2 and out[2]["compression_ppm"] == 0


def test_bpe_encode_runs_unchanged_on_a_stream(spark):
    import os
    import tempfile

    docs_path = "/root/testdata/sf0.001/documents.parquet"
    batch = spark.read.parquet(docs_path)
    merges = ops.bpe_train_merges(batch, n_merges=4).orderBy("rank") \
        .collect()
    want = {r["doc_id"]: r["n_bpe_tokens"]
            for r in ops.bpe_encode_stats(batch, merges).collect()}
    d = tempfile.mkdtemp(prefix="stream-bpe-")
    os.symlink(docs_path, os.path.join(d, "documents.parquet"))
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        ops.bpe_encode_stats(stream, merges)
        .writeStream.format("memory").queryName("bpe_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in spark.sql("SELECT * FROM bpe_stream").collect()}
    assert got == want


# ---- randomized property replays (seeded, multi-trial) ---------------------


def test_bh_adjust_randomized_replay(spark):
    import random
    rng = random.Random(11)
    for trial in range(3):
        ps = [round(rng.random(), 8) for _ in range(rng.randint(3, 12))]
        if trial == 2:
            ps[rng.randrange(len(ps))] = None
        df = spark.createDataFrame(
            [(i, p) for i, p in enumerate(ps)], "idx long, p_value double"
        )
        got = {r["idx"]: (r["p_rank"], r["q_value"], r["significant_bh"])
               for r in ops.bh_adjust(df, "p_value", key_col="idx")
               .collect()}
        assert got == _py_bh(ps), (trial, ps)


def test_mad_outliers_randomized_replay(spark):
    import random
    rng = random.Random(23)
    for trial in range(3):
        vals = [round(rng.gauss(100, 5), 4) for _ in range(150)]
        vals += [round(rng.choice([-1, 1]) * rng.uniform(300, 900), 4)
                 for _ in range(4)]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id long, v double"
        )
        med = _py_median(vals)
        mad = _py_median([abs(v - med) for v in vals])
        want = {
            i: _round_half_up((v - med) / (1.4826 * mad), 6)
            for i, v in enumerate(vals)
            if abs(_round_half_up((v - med) / (1.4826 * mad), 6)) > 3.5
        }
        got = {r["id"]: r["robust_z"]
               for r in ops.mad_outliers(df, "v", ["id"]).collect()}
        assert got == want, trial
        assert len(got) >= 4  # every planted outlier caught


def test_count_min_randomized_overcount_invariant(spark):
    import random
    rng = random.Random(37)
    for trial in range(2):
        keys = [f"k{rng.randint(0, 40)}" for _ in range(400)]
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        from collections import Counter
        exact = Counter(keys)
        out = ops.count_min_estimates(df, "k", depth=3, width=32,
                                      salt=f"t{trial}").collect()
        assert {r["k"] for r in out} == set(exact)
        for r in out:
            assert r["exact_count"] == exact[r["k"]]
            assert r["cms_estimate"] >= r["exact_count"]
        # total sketch mass conservation: sum over any depth row == n
        sk = {(r["j"], r["bucket"]): r["c"] for r in ops.count_min_sketch(
            df, "k", depth=3, width=32, salt=f"t{trial}").collect()}
        for j in range(3):
            assert sum(c for (jj, _), c in sk.items() if jj == j) == 400


def test_bpe_randomized_reference_replay(spark):
    import random
    rng = random.Random(51)
    for trial in range(2):
        words = {}
        for _ in range(rng.randint(5, 12)):
            w = "".join(rng.choice("abcde")
                        for _ in range(rng.randint(2, 7)))
            words[w] = words.get(w, 0) + rng.randint(1, 9)
        text = " ".join(w for w, c in words.items() for _ in range(c))
        docs = spark.createDataFrame(
            [(1, text)], "doc_id long, text string"
        )
        got = [(r["rank"], r["lhs"], r["rhs"], r["merged"],
                r["weighted_count"])
               for r in ops.bpe_train_merges(docs, n_merges=5)
               .orderBy("rank").collect()]
        assert got == _py_bpe(words, 5), (trial, words)


def test_duplicate_ngram_fraction_counts_positions(spark):
    shared = "one two three four five"
    docs = spark.createDataFrame(
        [(1, shared + " aaa bbb"),
         (2, shared + " ccc ddd"),
         (3, "totally different words here now")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           ops.duplicate_ngram_fraction(docs, n=5).collect()}
    # doc 1 has 3 5-gram positions; only position 1 (the shared prefix)
    # appears in 2 docs
    assert out[1]["n_grams"] == 3 and out[1]["dup_grams"] == 1
    assert out[1]["dup_fraction"] == round(1 / 3, 6)
    assert out[3]["dup_grams"] == 0 and out[3]["dup_fraction"] == 0.0


def test_duplicate_ngram_fraction_short_docs_null(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "a b c d e f")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           ops.duplicate_ngram_fraction(docs, n=5).collect()}
    assert out[1]["n_grams"] == 0 and out[1]["dup_fraction"] is None
    assert out[2]["n_grams"] == 2


def test_semantic_survivors_drop_all_but_lowest_in_family(spark):
    base = _vec(1)
    rows = []
    for i in range(4):  # one tight family 0..3 + four loners
        v = list(base)
        v[0] = round(v[0] + i * 1e-3, 6)
        rows.append((i, v, 0))
    rows += [(10 + i, _vec(99, i), 1) for i in range(4)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    pairs = ops.semantic_dedup_pairs(df, k=2, iterations=3,
                                     threshold=0.99).select("d1", "d2")
    dropped = ops.duplicate_clusters(pairs).where(
        "doc_id != cluster_id"
    ).selectExpr("doc_id AS vec_id")
    survivors = sorted(
        r["vec_id"]
        for r in df.select("vec_id").join(dropped, "vec_id", "left_anti")
        .collect()
    )
    assert survivors == [0, 10, 11, 12, 13]


# ---- multimodal: env-gated real codec -------------------------------------


def test_image_decode_stats_falls_back_without_pil(spark):
    from concept_multi_db_query_engine_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(1, "hello"), (2, "")], "doc_id long, text string")
    media = multimodal.as_media_table(docs)
    out = multimodal.image_decode_stats(media)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "width", "height", "format",
        "n_bytes", "brightness", "is_valid",
    ]
    if not multimodal.HAS_PIL:
        # identical to the stub path byte-for-byte
        want = sorted(map(tuple, multimodal.fake_decode_stats(media)
                          .collect()))
        got = sorted(map(tuple, out.collect()))
        assert got == want


def test_image_decode_stats_with_real_codec(spark):
    from concept_multi_db_query_engine_spark.operators import multimodal

    if not multimodal.HAS_PIL:
        import pytest
        pytest.skip("PIL not available in this container")
    import io

    from PIL import Image

    def png(color, w, h):
        buf = io.BytesIO()
        Image.new("L", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    rows = [(1, png(0, 4, 2), 4, 2, "png"),
            (2, png(255, 3, 3), 3, 3, "png"),
            (3, b"not an image", 0, 0, "junk"),
            (4, None, 0, 0, "null")]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["doc_id"]: r
           for r in multimodal.image_decode_stats(media).collect()}
    assert (out[1]["width"], out[1]["height"]) == (4, 2)
    assert out[1]["format"] == "png" and out[1]["is_valid"]
    assert out[1]["brightness"] == 0.0
    assert out[2]["brightness"] == 255.0
    assert out[3]["is_valid"] is False and out[3]["n_bytes"] > 0
    assert out[4]["is_valid"] is False and out[4]["n_bytes"] == 0
