"""Independent randomized property checks for the round-8 operators —
seeded ``random`` over small frames (the test_stats_properties.py
pattern: different formula arrangements than both the operator AND its
oracle, so a shared algebraic mistake cannot hide)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from concept_multi_db_query_engine_spark import operators as ops


def test_span_removal_defining_properties(spark):
    """After removal: (1) the cleaned text is a subsequence of the
    original tokens; (2) NO cross-document duplicated 8-gram survives
    anywhere; (3) n_tokens - n_removed == len(cleaned tokens)."""
    rng = random.Random(8)
    vocab = [f"w{i}" for i in range(12)]
    shared = " ".join(rng.choices(vocab, k=9))
    texts = []
    for i in range(14):
        body = " ".join(rng.choices(vocab, k=rng.randint(3, 25)))
        if i % 3 == 0:
            body = f"{body} {shared}"
        texts.append((i, body))
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           ops.dedup_span_removal(docs, n=8).collect()}
    originals = dict(texts)
    cleaned_tokens = {}
    for i, orig in texts:
        toks = orig.split(" ")
        ct = out[i]["cleaned_text"].split(" ") if out[i]["cleaned_text"] \
            else []
        cleaned_tokens[i] = ct
        assert out[i]["n_tokens"] == len(toks)
        assert out[i]["n_tokens"] - out[i]["n_removed"] == len(ct)
        # subsequence check
        it = iter(toks)
        assert all(any(t == x for x in it) for t in ct)
    # recompute duplicated grams from the ORIGINALS and assert none
    # survive in any cleaned text
    grams = {}
    for i, orig in texts:
        toks = orig.split(" ")
        for j in range(len(toks) - 7):
            g = " ".join(toks[j:j + 8])
            grams.setdefault(g, set()).add(i)
    dup = {g for g, d in grams.items() if len(d) >= 2}
    for i, ct in cleaned_tokens.items():
        for j in range(len(ct) - 7):
            assert " ".join(ct[j:j + 8]) not in dup


def test_kaplan_meier_is_nonincreasing_step_function(spark):
    rng = random.Random(21)
    rows = [(float(rng.randint(1, 40)), rng.random() < 0.6)
            for _ in range(300)]
    df = spark.createDataFrame(rows, "t double, ev boolean")
    out = sorted(ops.kaplan_meier(df, "t", "ev").collect(),
                 key=lambda r: r["t"])
    last = 1.0
    for r in out:
        assert 0.0 <= r["survival"] <= last + 1e-9
        last = r["survival"]
    # risk sets strictly decrease over event times
    risks = [r["n_risk"] for r in out]
    assert risks == sorted(risks, reverse=True)


def test_conformal_coverage_guarantee_on_exchangeable_split(spark):
    """Split-conformal's point: calibrate on half, test on the other
    half of an exchangeable sample → coverage >= 1 - alpha - slack."""
    rng = random.Random(5)
    vals = [(i, rng.gauss(0, 1.0)) for i in range(600)]
    calib = spark.createDataFrame(
        [(0.0, v) for i, v in vals if i % 2 == 0],
        "pred double, actual double")
    test = [v for i, v in vals if i % 2 == 1]
    q = ops.conformal_interval(calib, "pred", "actual",
                               alpha=0.2).collect()[0]["q_hat"]
    covered = sum(1 for v in test if abs(v) <= q) / len(test)
    assert covered >= 0.8 - 0.07  # finite-sample slack


def test_rrf_is_monotone_in_rank(spark):
    # a doc ranked better in one list, equal in the other, must fuse
    # at least as high
    a = spark.createDataFrame([(i, i) for i in range(1, 9)],
                              "doc_id long, rank int")
    b = spark.createDataFrame([(i, 9 - i) for i in range(1, 9)],
                              "doc_id long, rank int")
    out = {r["doc_id"]: r["rrf_score"]
           for r in ops.rrf_fuse(a, b, k=60, topk=8).collect()}
    # symmetric construction: doc i and doc 9-i swap ranks → equal
    for i in range(1, 5):
        assert out[i] == pytest.approx(out[9 - i])


def test_mutual_information_bounds_and_symmetry(spark):
    rng = random.Random(13)
    rows = [(f"x{rng.randint(0, 3)}", f"y{rng.randint(0, 4)}")
            for _ in range(400)]
    df = spark.createDataFrame(rows, "x string, y string")
    r1 = ops.mutual_information(df, "x", "y").collect()[0]
    r2 = ops.mutual_information(
        df.select(F.col("y").alias("x"), F.col("x").alias("y")),
        "x", "y").collect()[0]
    assert r1["mi_nats"] == pytest.approx(r2["mi_nats"], abs=2e-6)
    assert 0.0 <= r1["mi_nats"] + 1e-6
    assert r1["mi_nats"] <= min(r1["h_x"], r1["h_y"]) + 1e-6
    assert -1e-9 <= r1["nmi"] <= 1.0 + 1e-9


def test_bm25_length_normalization_property(spark):
    # same tf, shorter doc → higher BM25 (b > 0)
    docs = spark.createDataFrame(
        [(0, "hit " + "pad " * 3), (1, "hit " + "pad " * 30)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["score"]
           for r in ops.bm25_topk(docs, ["hit"], k=2).collect()}
    assert out[0] > out[1]


def test_domain_quota_is_a_uniform_subsample_property(spark):
    """md5-order picking is content-independent: the kept fraction per
    deterministic id-class should be near quota/n for every class."""
    docs = spark.createDataFrame(
        [(i, "dom", "t") for i in range(400)],
        "doc_id long, source string, text string",
    )
    kept = [r["doc_id"] for r in
            ops.domain_quota_sample(docs, quota=100).collect()]
    # ids are uniformly hashed: even/odd classes should split ~50/50
    evens = sum(1 for i in kept if i % 2 == 0)
    assert 30 <= evens <= 70


def test_markov_attribution_effects_bounded(spark):
    rng = random.Random(3)
    chans = ["view", "click", "error"]
    paths = []
    for _ in range(40):
        p = [rng.choice(chans) for _ in range(rng.randint(1, 5))]
        if rng.random() < 0.5:
            p.append("purchase")
        paths.append(p)
    rows = []
    import datetime as dt

    for uid, path in enumerate(paths):
        for i, et in enumerate(path):
            rows.append((uid * 100 + i, uid,
                         dt.datetime(2024, 1, 1, 0, 0, i), et))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, "
              "event_type string")
    out = ops.markov_removal_attribution(ev).collect()
    for r in out:
        assert 0.0 <= r["p_removed"] <= r["p_full"] + 1e-9
        assert -1e-9 <= r["removal_effect"] <= 1.0 + 1e-9
        assert -1e-9 <= r["attribution_share"] <= 1.0 + 1e-9
    assert sum(r["attribution_share"] for r in out) == pytest.approx(
        1.0, abs=1e-5)


def test_c2st_auc_is_label_flip_symmetric(spark):
    rng = random.Random(17)
    a = spark.createDataFrame(
        [(i, rng.random()) for i in range(60)], "doc_id long, f double")
    b = spark.createDataFrame(
        [(100 + i, rng.random() + 0.5) for i in range(60)],
        "doc_id long, f double")
    auc_ab = ops.c2st_drift(a, b, ["f"], lr=2.0,
                            iterations=8).collect()[0]["auc"]
    auc_ba = ops.c2st_drift(b, a, ["f"], lr=2.0,
                            iterations=8).collect()[0]["auc"]
    # swapping old/new retrains with flipped labels: the classifier
    # re-learns the flipped decision, so both directions report the
    # SAME drift magnitude
    assert auc_ab == pytest.approx(auc_ba, abs=0.05)
    assert auc_ab > 0.7  # the planted +0.5 shift is detectable
