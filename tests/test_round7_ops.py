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
