"""Bloom prefilter: no false negatives, replayable false positives, and
the narrow-map plan shape that makes it a pre-shuffle lever."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from concept_multi_db_query_engine_spark import operators as ops


def _py_bits(key, salt, n_bits, n_hashes):
    out = []
    for j in range(n_hashes):
        h = hashlib.md5(f"{key}:{salt}:{j}".encode()).hexdigest()
        out.append(int(h[:15], 16) % n_bits)
    return out


def _py_bloom_pass(key, member_keys, salt, n_bits, n_hashes):
    bits = set()
    for m in member_keys:
        bits.update(_py_bits(m, salt, n_bits, n_hashes))
    return all(b in bits for b in _py_bits(key, salt, n_bits, n_hashes))


def test_bloom_prefilter_never_drops_a_match(spark):
    dim = spark.createDataFrame([(i,) for i in range(0, 100, 7)], "k long")
    fact = spark.createDataFrame([(i,) for i in range(200)], "fk long")
    out = {r["fk"] for r in ops.bloom_prefilter(
        fact, dim, "fk", "k", n_bits=256, n_hashes=3).collect()}
    members = set(range(0, 100, 7))
    assert members <= out  # every true match survives
    # and every passed row is exactly what the python replay passes
    want = {i for i in range(200)
            if _py_bloom_pass(i, members, "bloom", 256, 3)}
    assert out == want


def test_bloom_join_report_counts_match_python_replay(spark):
    dim = spark.createDataFrame([(i,) for i in range(0, 60, 3)], "k long")
    fact = spark.createDataFrame([(i % 90,) for i in range(300)], "fk long")
    row = ops.bloom_join_report(
        fact, dim, "fk", "k", n_bits=128, n_hashes=2).collect()[0]
    members = set(range(0, 60, 3))
    facts = [i % 90 for i in range(300)]
    n_match = sum(1 for f in facts if f in members)
    n_pass = sum(1 for f in facts
                 if _py_bloom_pass(f, members, "bloom", 128, 2))
    assert row["n_fact"] == 300
    assert row["n_match"] == n_match
    assert row["n_pass"] == n_pass
    assert row["n_false_pos"] == n_pass - n_match
    assert row["fp_rate_ppm"] == (
        (n_pass - n_match) * 1_000_000 // (300 - n_match))


def test_bloom_prefilter_plan_is_narrow(spark):
    # the fact side must reach the filter without any exchange: the
    # packed filter rides a BroadcastNestedLoopJoin of ONE row and the
    # probe is a plain Filter over the scan
    dim = spark.createDataFrame([(i,) for i in range(10)], "k long")
    fact = spark.createDataFrame([(i,) for i in range(100)], "fk long")
    plan = ops.bloom_prefilter(fact, dim, "fk", "k", n_bits=256) \
        ._jdf.queryExecution().executedPlan().toString()
    # exchanges exist only on the tiny dim->words build side (groupBy),
    # never on the fact side after the broadcast join
    after_join = plan.split("BroadcastNestedLoopJoin")[0]
    assert "Exchange" not in after_join


def test_bloom_validates_inputs(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        ops.bloom_filter_words(df, "k", n_bits=100)  # not a multiple of 32
    with pytest.raises(ValueError):
        ops.bloom_filter_words(df, "k", n_hashes=0)
