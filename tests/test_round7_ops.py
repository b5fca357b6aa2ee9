"""Round-7 operator tests: upsert compaction, sliding KMV distinct —
replayed against independent pure-Python references."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest
from pyspark.sql import functions as F

from concept_multi_db_query_engine_spark import operators as ops


# ---- upsert_latest_wins ---------------------------------------------------


def test_upsert_applies_updates_inserts_and_deletes(spark):
    snap = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)],
        "id long, v string, version long",
    )
    chg = spark.createDataFrame(
        [(2, "b2", 2, False),   # update
         (4, "d", 2, False),    # insert
         (3, None, 2, True)],   # delete
        "id long, v string, version long, is_delete boolean",
    )
    out = {r["id"]: r["v"] for r in ops.upsert_latest_wins(
        snap, chg, "id", "version", delete_col="is_delete").collect()}
    assert out == {1: "a", 2: "b2", 4: "d"}


def test_upsert_change_beats_snapshot_at_equal_version(spark):
    snap = spark.createDataFrame([(1, "old", 5)],
                                 "id long, v string, version long")
    chg = spark.createDataFrame([(1, "new", 5)],
                                "id long, v string, version long")
    out = ops.upsert_latest_wins(snap, chg, "id").collect()
    assert out[0]["v"] == "new"


def test_upsert_stale_change_loses(spark):
    snap = spark.createDataFrame([(1, "cur", 9)],
                                 "id long, v string, version long")
    chg = spark.createDataFrame([(1, "stale", 3)],
                                "id long, v string, version long")
    out = ops.upsert_latest_wins(snap, chg, "id").collect()
    assert out[0]["v"] == "cur"


def test_upsert_single_shuffle_plan(spark):
    snap = spark.createDataFrame([(i, "x", 1) for i in range(50)],
                                 "id long, v string, version long")
    chg = spark.createDataFrame([(i, "y", 2) for i in range(0, 50, 5)],
                                "id long, v string, version long")
    plan = ops.upsert_latest_wins(snap, chg, "id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # the one keyed window shuffle


def test_upsert_validates_delete_col(spark):
    df = spark.createDataFrame([(1, 1)], "id long, version long")
    with pytest.raises(ValueError):
        ops.upsert_latest_wins(df, df, "id", delete_col="nope")


# ---- sliding_distinct_kmv -------------------------------------------------


def _h60(v):
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) / (1 << 60)


def test_sliding_kmv_matches_python_replay(spark):
    rows = []
    base = dt.datetime(2024, 3, 1)
    # users cycle so windows overlap meaningfully
    for d in range(10):
        for u in range(d * 3, d * 3 + 12):
            rows.append((len(rows), base + dt.timedelta(days=d), u % 40))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, "
                                     "user_id long")
    k, win = 8, 3
    got = {r["day"].date(): r for r in ops.sliding_distinct_kmv(
        df, "ts", "user_id", window_days=win, k=k).collect()}
    # python replay
    daily = {}
    for _, ts, u in rows:
        daily.setdefault(ts.date(), set()).add(u)
    days = sorted(daily)
    for d in days:
        keys = set()
        for back in range(win):
            keys |= daily.get(d - dt.timedelta(days=back), set())
        hashes = sorted(_h60(u) for u in keys)
        kmin = hashes[:k]
        want = (round((k - 1) / max(kmin), 4) if len(kmin) >= k
                else float(len(kmin)))
        r = got[d]
        assert r["exact_distinct"] == len(keys), d
        assert r["k_used"] == len(kmin), d
        assert r["approx_distinct"] == pytest.approx(want, abs=1e-9), d


def test_sliding_kmv_estimate_within_error_bound(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(days=i % 5), i % 500)
            for i in range(2500)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, "
                                     "user_id long")
    for r in ops.sliding_distinct_kmv(df, window_days=5, k=64).collect():
        # last day's 5-day window sees all 500 users; KMV rel error
        # ~1/sqrt(k-2) ≈ 13% — assert a loose 3-sigma band
        if r["k_used"] == 64:
            assert r["approx_distinct"] == pytest.approx(
                r["exact_distinct"], rel=0.45)
        else:
            assert r["approx_distinct"] == r["k_used"]
            assert r["exact_distinct"] == r["k_used"]


# ---- ivf_pq_topk ----------------------------------------------------------


def _toy_embeddings(spark, n=40, dim=8):
    rows = []
    for i in range(n):
        # 4 well-separated families in dim-8 space
        fam = i % 4
        base = [0.0] * 8
        base[fam * 2] = 1.0
        base[fam * 2 + 1] = 0.5
        vec = [round(v + ((i * 7 + j * 3) % 10) * 0.01, 6)
               for j, v in enumerate(base)]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_pq_equals_pq_when_probing_all_cells(spark):
    emb = _toy_embeddings(spark)
    q = emb.where("vec_id < 3")
    full = sorted(
        (r["query_id"], r["vec_id"], r["adc_dist2"], r["rank"])
        for r in ops.pq_topk(emb, q, dim=8, m=2, k=4, iterations=2,
                             topk=4).collect())
    ivf = sorted(
        (r["query_id"], r["vec_id"], r["adc_dist2"], r["rank"])
        for r in ops.ivf_pq_topk(emb, q, dim=8, n_cells=4, n_probe=4,
                                 m=2, k=4, iterations=2, topk=4).collect())
    assert ivf == full  # probing every cell recovers exhaustive PQ search


def test_ivf_pq_candidates_come_from_probed_cells_only(spark):
    emb = _toy_embeddings(spark)
    q = emb.where("vec_id < 2")
    coarse = ops.kmeans_fit(emb, k=4, iterations=2)
    cells = {r["vec_id"]: r["cluster"]
             for r in ops.kmeans_encode(emb, coarse).collect()}
    out = ops.ivf_pq_topk(emb, q, dim=8, n_cells=4, n_probe=1,
                          m=2, k=4, iterations=2, topk=10).collect()
    for qid in (0, 1):
        returned = {r["vec_id"] for r in out if r["query_id"] == qid}
        # with n_probe=1 every returned vector shares ONE cell
        assert len({cells[v] for v in returned}) == 1
        # the query's own nearest cell is its own cell (it is corpus too)
        assert cells[qid] in {cells[v] for v in returned}


def test_ivf_pq_validates_inputs(spark):
    emb = _toy_embeddings(spark)
    with pytest.raises(ValueError):
        ops.ivf_pq_topk(emb, emb, dim=8, m=3)
    with pytest.raises(ValueError):
        ops.ivf_pq_topk(emb, emb, dim=8, n_cells=2, n_probe=3)


# ---- theil_sen ------------------------------------------------------------


def test_theil_sen_ignores_gross_outliers(spark):
    # OLS would be dragged far off by the planted spike; Theil-Sen must
    # recover the clean line exactly
    rows = [(i, float(i), 2.5 * i + 7.0 + (1000.0 if i == 5 else 0.0))
            for i in range(10)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    r = ops.theil_sen(df, "id", "x", "y").collect()[0]
    assert (r["n_points"], r["n_pairs"]) == (10, 45)
    assert r["slope"] == 2.5
    assert r["intercept"] == 7.0


def test_theil_sen_matches_python_replay(spark):
    import statistics

    rows = [(i, float(i % 7), float((i * 13) % 11) + 0.5)
            for i in range(12)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    r = ops.theil_sen(df, "id", "x", "y").collect()[0]
    slopes = []
    for i in range(12):
        for j in range(i + 1, 12):
            xi, yi = rows[i][1], rows[i][2]
            xj, yj = rows[j][1], rows[j][2]
            if xi != xj:
                slopes.append((yj - yi) / (xj - xi))
    slope = round(statistics.median(slopes), 4)
    icpt = round(statistics.median(
        [y - slope * x for _, x, y in rows]), 4)
    assert r["n_pairs"] == len(slopes)
    assert r["slope"] == pytest.approx(slope, abs=1e-9)
    assert r["intercept"] == pytest.approx(icpt, abs=1e-9)


def test_theil_sen_skips_null_points(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 2.0), (2, 2.0, 4.0), (3, None, 9.0), (4, 3.0, None)],
        "id long, x double, y double")
    r = ops.theil_sen(df, "id", "x", "y").collect()[0]
    assert r["n_points"] == 2 and r["slope"] == 2.0


# ---- incremental_state_merge ----------------------------------------------


def test_incremental_merge_equals_one_shot_reduce(spark):
    rows = [(i, f"g{i % 3}", float(i) + 0.25) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    one_shot = {tuple(r)[:1][0]: tuple(r)[1:] for r in
                ops.reduce_to_state(df, "g", "v").collect()}
    state = ops.reduce_to_state(df.where("id % 4 != 0"), "g", "v")
    merged = {tuple(r)[:1][0]: tuple(r)[1:] for r in
              ops.incremental_state_merge(
                  state, df.where("id % 4 = 0"), "g", "v").collect()}
    assert merged == one_shot


def test_incremental_merge_is_associative_across_batches(spark):
    rows = [(i, "k", float(i * 7 % 13)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    # fold three batches in two different orders -> same state
    b = [df.where(f"id % 3 = {k}") for k in range(3)]
    s1 = ops.incremental_state_merge(
        ops.incremental_state_merge(
            ops.reduce_to_state(b[0], "g", "v"), b[1], "g", "v"),
        b[2], "g", "v").collect()
    s2 = ops.incremental_state_merge(
        ops.incremental_state_merge(
            ops.reduce_to_state(b[2], "g", "v"), b[0], "g", "v"),
        b[1], "g", "v").collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))


# ---- seasonal_decompose ---------------------------------------------------


def test_seasonal_decompose_recovers_planted_components(spark):
    # value = 10*idx + 100 + seasonal_profile[season] (+ one spike);
    # robust trend + median seasonal must recover both near-exactly
    profile = {0: 50.0, 1: -30.0, 2: -20.0}
    rows = []
    for i in range(24):
        s = i % 3
        v = 10.0 * i + 100.0 + profile[s] + (500.0 if i == 7 else 0.0)
        rows.append((i, s, v))
    df = spark.createDataFrame(rows, "idx long, season int, value double")
    out = {r["idx"]: r for r in ops.seasonal_decompose(
        df, "idx", "season", "value").collect()}
    assert len(out) == 24
    # the trend/seasonal split is determined up to a constant: the
    # Theil-Sen intercept absorbs the MEDIAN seasonal offset (-20
    # here), and the seasonal medians re-center the profile around it.
    # The slope itself recovers exactly despite the spike.
    assert out[12]["trend"] - out[0]["trend"] == pytest.approx(
        120.0, abs=1e-6)
    assert out[0]["trend"] == pytest.approx(100.0 - 20.0, abs=0.1)
    shifted = {s: v + 20.0 for s, v in profile.items()}
    for i in (3, 4, 5):
        s = i % 3
        assert out[i]["seasonal"] == pytest.approx(shifted[s], abs=0.1)
    # decomposition identity holds per row
    for i, r in out.items():
        assert r["value"] == pytest.approx(
            r["trend"] + r["seasonal"] + r["residual"], abs=2e-4)
    # the spike lands in the residual, nowhere else
    assert out[7]["residual"] == pytest.approx(500.0, abs=1.0)


# ---- changepoint_mean_shift -----------------------------------------------


def test_changepoint_finds_planted_level_shift(spark):
    # level 10 for idx 0..19, level 30 for idx 20..39 -> split at 19
    rows = [(i, 10.0 if i < 20 else 30.0) for i in range(40)]
    df = spark.createDataFrame(rows, "idx long, v double")
    r = ops.changepoint_mean_shift(df, "idx", "v").collect()[0]
    assert r["change_idx"] == 19
    assert r["n_periods"] == 40
    assert r["mean_before"] == 10.0
    assert r["mean_after"] == 30.0


def test_changepoint_stat_matches_python_replay(spark):
    vals = [float((i * 7) % 5 + (8 if i >= 6 else 0)) for i in range(12)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "idx long, v double")
    r = ops.changepoint_mean_shift(df, "idx", "v").collect()[0]
    n = len(vals)
    total = sum(vals)
    best = max(
        ((abs(n * sum(vals[:k]) - k * total), -k) for k in range(1, n)),
    )
    stat, k = best[0], -best[1]
    assert r["change_idx"] == k - 1  # change_idx is the k-th period
    assert r["stat"] == pytest.approx(stat, abs=1e-6)


# ---- language_confusion ---------------------------------------------------


def test_language_confusion_cells_and_shares(spark):
    en = "the of and to in is was for on with that it as at by"
    zz = "xq zv wk jj qq zz xx vv ww kk"
    docs = spark.createDataFrame(
        [(1, en, "en"), (2, en, "en"), (3, zz, "en"),
         (4, zz, "zz"), (5, en, "zz")],
        "doc_id long, text string, lang string",
    )
    out = {(r["declared"], r["predicted"]): r
           for r in ops.language_confusion(docs).collect()}
    assert out[("en", "en")]["n_docs"] == 2
    assert out[("en", "und")]["n_docs"] == 1
    assert out[("zz", "und")]["n_docs"] == 1
    assert out[("zz", "en")]["n_docs"] == 1
    assert out[("en", "en")]["share_ppm"] == 2 * 1_000_000 // 3
    assert out[("zz", "en")]["share_ppm"] == 500_000


# ---- lsh_tuning_curve -----------------------------------------------------


def test_lsh_tuning_curve_matches_formula(spark):
    out = ops.lsh_tuning_curve(spark, num_hashes=16).collect()
    # every (b, r) factorization of 16 x 9 similarity grid points
    assert len(out) == 5 * 9
    for row in out:
        b, r, s = row["bands"], row["rows_per_band"], row["similarity"]
        assert b * r == 16
        assert row["p_candidate"] == pytest.approx(
            1.0 - (1.0 - s ** r) ** b, abs=1e-6)
        assert row["threshold_s"] == pytest.approx(
            (1.0 / b) ** (1.0 / r), abs=1e-4)
    # monotone in s for each factorization
    by_fact = {}
    for row in out:
        by_fact.setdefault(row["bands"], []).append(
            (row["similarity"], row["p_candidate"]))
    for cells in by_fact.values():
        ps = [p for _, p in sorted(cells)]
        assert ps == sorted(ps)


# ---- pca_power_iteration / pca_project_top --------------------------------


def test_pca_recovers_dominant_direction(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    d = 8
    direction = np.zeros(d)
    direction[2] = 0.8
    direction[5] = 0.6
    # strong variance along `direction`, small isotropic noise
    rows = []
    for i in range(200):
        v = float(rng.randn()) * 3.0 * direction + rng.randn(d) * 0.05
        rows.append((i, [round(float(x), 6) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    comp = ops.pca_power_iteration(df, dim=d, iterations=30)
    comp = np.array(comp)
    assert abs(np.linalg.norm(comp) - 1.0) < 1e-9
    # cosine with the planted direction ~ 1 (sign-fixed)
    assert abs(abs(float(comp @ direction)) - 1.0) < 1e-3
    # numpy eigensolver agreement on the empirical covariance
    x = np.array([r[1] for r in rows], dtype=float)
    c = np.cov(x.T, bias=True)
    evals, evecs = np.linalg.eigh(c)
    top = evecs[:, -1]
    assert abs(abs(float(comp @ top)) - 1.0) < 1e-6


def test_pca_component_is_partitioning_independent(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = ops.pca_power_iteration(emb, dim=64, iterations=10)
    b = ops.pca_power_iteration(emb.repartition(13), dim=64,
                                iterations=10)
    assert a == b  # exact integer Gram sums -> bit-identical model


def test_pca_projection_is_narrow_map(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = ops.pca_project_top(emb, dim=64, iterations=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # the projection itself never shuffles


def test_abtt_output_is_centered_and_component_free(spark):
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    comp = np.array(ops.pca_power_iteration(emb, dim=64, iterations=20))
    rows = ops.abtt_transform(emb, dim=64, iterations=20).collect()
    mat = np.array([[float(t) for t in r["abtt_q_csv"].split(",")]
                    for r in rows])
    # micro-unit quantization: tolerances in micro-units (rounding 0.5)
    n, d = mat.shape
    assert d == 64 and n == emb.count()
    # column means ~ 0 (mean removed; quantization noise < 1 unit)
    assert np.abs(mat.mean(axis=0)).max() < 1.0
    # projections onto the removed component ~ 0
    proj = mat @ comp
    assert np.abs(proj).max() < d  # <= d/2 units of rounding noise


# ---- minhash_incremental_pairs --------------------------------------------


def test_minhash_incremental_finds_cross_set_near_dups(spark):
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    docs = []
    # corpus docs 1..3; batch docs 100..102
    docs.append((1, base))                       # corpus
    docs.append((2, base.replace("pi", "PI")))   # corpus near-dup of 1
    docs.append((3, "totally different words entirely unrelated "
                    "content here nothing shared at all with others"))
    docs.append((100, base))                     # batch: dup of corpus 1
    # near-dup: perturb the LAST word — only one shingle changes
    # (jaccard 15/17), which the 4x4 banding catches under the current
    # two-hash family (banding recall is family-dependent by design;
    # the lsh_tuning_curve row documents the S-curve)
    docs.append((101, base.replace("upsilon", "UPSILON")))
    docs.append((102, "completely novel text with brand new tokens "
                      "never seen before in any corpus document ever"))
    corpus = spark.createDataFrame(
        [d for d in docs if d[0] < 100], "doc_id long, text string")
    batch = spark.createDataFrame(
        [d for d in docs if d[0] >= 100], "doc_id long, text string")
    out = {(r["new_id"], r["corpus_id"]): r["jaccard"]
           for r in ops.minhash_incremental_pairs(
               corpus, batch, k=5, num_hashes=16, bands=4,
               threshold=0.5).collect()}
    assert out[(100, 1)] == 1.0          # exact dup found
    assert (101, 1) in out               # near-dup found
    assert all(n != 102 for n, _ in out)  # novel doc matches nothing
    # pairs only cross the batch/corpus boundary, never within a side
    assert all(n >= 100 and c < 100 for n, c in out)


def test_minhash_incremental_agrees_with_self_join_on_union(spark):
    # cross-boundary pairs of the full self-join == incremental output
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    full = {(min(r["d1"], r["d2"]), max(r["d1"], r["d2"])): r["jaccard"]
            for r in ops.minhash_lsh_pairs(docs, k=5, num_hashes=16,
                                           bands=4, threshold=0.5)
            .collect()}
    cross_full = {p: j for p, j in full.items()
                  if (p[0] % 4 == 0) != (p[1] % 4 == 0)}
    inc = {(min(r["new_id"], r["corpus_id"]),
            max(r["new_id"], r["corpus_id"])): r["jaccard"]
           for r in ops.minhash_incremental_pairs(
               docs.where("doc_id % 4 != 0"),
               docs.where("doc_id % 4 = 0"),
               k=5, num_hashes=16, bands=4, threshold=0.5).collect()}
    assert inc == cross_full


# ---- perplexity_partition -------------------------------------------------


def test_perplexity_partition_thirds_and_ranges(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    out = {r["bucket"]: r for r in
           ops.perplexity_partition(docs).collect()}
    assert set(out) == {"head", "middle", "tail"}
    n = docs.count()
    total = sum(r["n_docs"] for r in out.values())
    assert total == n
    # tertile cut: each bucket holds about a third of the docs
    for r in out.values():
        assert abs(r["n_docs"] - n / 3) < n * 0.12
    # buckets are ordered by perplexity: head's max <= middle's min etc.
    assert out["head"]["hi_bits"] <= out["middle"]["lo_bits"]
    assert out["middle"]["hi_bits"] <= out["tail"]["lo_bits"]
    assert out["head"]["share_ppm"] + out["middle"]["share_ppm"] + \
        out["tail"]["share_ppm"] >= 999_998


def test_seasonal_forecast_projects_planted_pattern(spark):
    # value = 10*idx + 100 + profile[idx % 3]; forecast must continue it
    profile = {0: 50.0, 1: -30.0, 2: -20.0}
    rows = [(i, i % 3, 10.0 * i + 100.0 + profile[i % 3])
            for i in range(24)]
    df = spark.createDataFrame(rows, "idx long, season int, value double")
    out = {int(r["idx"]): r for r in ops.seasonal_forecast(
        df, "idx", "season", "value", horizon=6,
        season_of_idx="CAST(pmod(idx, 3) AS BIGINT)").collect()}
    assert sorted(out) == list(range(24, 30))
    for i in range(24, 30):
        want = 10.0 * i + 100.0 + profile[i % 3]
        assert out[i]["forecast"] == pytest.approx(want, abs=0.2), i
        assert out[i]["season"] == i % 3


# ---- fuzzy_join_blocked ---------------------------------------------------


def test_fuzzy_join_matches_within_block_and_budget(spark):
    left = spark.createDataFrame(
        [(1, "AB-0001-x"), (2, "AB-0002-y"), (3, "CD-0003-z")],
        "id long, name string",
    )
    # 1 -> one suffix typo (dist 1); 2 -> two edits (dist 2, over
    # budget); 3 -> identical (dist 0)
    right = spark.createDataFrame(
        [(11, "AB-0001-q"), (12, "AB-0002-qq"), (13, "CD-0003-z")],
        "id long, name string",
    )
    out = {(r["l_id"], r["r_id"]): r["distance"] for r in
           ops.fuzzy_join_blocked(
               left, right, "id", "id", "name", "name",
               "substr({k}, 1, 7)", max_distance=1).collect()}
    assert out == {(1, 11): 1, (3, 13): 0}


def test_fuzzy_join_never_crosses_blocks(spark):
    # identical strings in DIFFERENT blocks never meet: blocking is a
    # hard recall contract, not a hint
    left = spark.createDataFrame([(1, "AAA-x")], "id long, name string")
    right = spark.createDataFrame([(2, "BBB-x")], "id long, name string")
    assert ops.fuzzy_join_blocked(
        left, right, "id", "id", "name", "name",
        "substr({k}, 1, 3)", max_distance=99).count() == 0


def test_fuzzy_join_plan_is_single_equi_join(spark):
    left = spark.createDataFrame([(1, "AAAA")], "id long, name string")
    plan = ops.fuzzy_join_blocked(
        left, left, "id", "id", "name", "name", "substr({k}, 1, 2)"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


# ---- temperature_mix ------------------------------------------------------


def test_temperature_mix_flattens_toward_uniform(spark):
    docs = spark.createDataFrame(
        [(i, "w " * (900 if i < 90 else 1), "big" if i < 90 else "small")
         for i in range(100)],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in
           ops.temperature_mix(docs, alpha_quarters=1).collect()}
    big, small = out["big"], out["small"]
    # alpha < 1 up-samples the small source, down-samples the big one
    assert small["boost"] > 1.0 > big["boost"]
    # shares still sum to 1 and order is preserved
    assert big["mix_share"] + small["mix_share"] == pytest.approx(1.0)
    assert big["mix_share"] > small["mix_share"]
    # natural share is the exact integer ppm
    assert big["natural_ppm"] == big["tokens"] * 1_000_000 // (
        big["tokens"] + small["tokens"])


def test_temperature_mix_alpha_grid_matches_python(spark):
    import math
    docs = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "a b c d e f", "s2"), (3, "a", "s3")],
        "doc_id long, text string, source string",
    )
    toks = {"s1": 3, "s2": 6, "s3": 1}
    for q, alpha in ((1, 0.25), (2, 0.5), (3, 0.75)):
        out = {r["source"]: r["mix_share"] for r in
               ops.temperature_mix(docs, alpha_quarters=q).collect()}
        tot = sum(t ** alpha for t in toks.values())
        for s, t in toks.items():
            assert out[s] == pytest.approx(t ** alpha / tot, abs=5e-6), (
                q, s)
    with pytest.raises(ValueError):
        ops.temperature_mix(docs, alpha_quarters=4)


# ---- naive_bayes_language -------------------------------------------------


def test_naive_bayes_learns_separable_vocab(spark):
    # two languages with disjoint vocabularies: every doc must be
    # predicted as its own class
    rows = []
    for i in range(30):
        rows.append((i, "der die das und nicht", "de"))
        rows.append((100 + i, "the and of to is", "en"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = ops.naive_bayes_language(docs, vocab_size=16).collect()
    assert len(out) == 60
    for r in out:
        assert r["predicted"] == r["declared"], r
        assert r["n_tokens"] == 5


def test_naive_bayes_oov_falls_back_to_prior(spark):
    # equal per-class token mass makes the smoothing denominators equal,
    # so a pure-OOV doc is decided by the document prior alone (with
    # UNEQUAL mass the smaller class legitimately wins OOV tokens:
    # its 1/(N_l+V+1) is larger — real multinomial-NB behavior)
    rows = [(i, "aaa", "en") for i in range(9)] + [
        (9, "ccc ccc ccc ccc ccc ccc ccc ccc ccc", "de")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    score = spark.createDataFrame(
        [(99, "zzz qqq xxx", "de")], "doc_id long, text string, lang string")
    out = ops.naive_bayes_language(
        docs, vocab_size=4, score_docs=score).collect()
    assert len(out) == 1
    assert out[0]["predicted"] == "en"  # prior 9:1 decides


def test_naive_bayes_scoring_plan_has_no_exchange(spark):
    rows = [(i, "a b", "en") for i in range(4)] + [(4, "c d", "de")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    score = spark.createDataFrame(
        [(99, "a b", "en")], "doc_id long, text string, lang string")
    plan = ops.naive_bayes_language(
        docs, vocab_size=4, score_docs=score
    )._jdf.queryExecution().executedPlan().toString()
    # inference is a pure narrow map over the scored frame (the DSIR
    # discipline): the model rides in as literals, never as a join
    assert "Exchange" not in plan
    assert "Join" not in plan
