"""Salted joins / aggregations: result-equality with the plain formulation
on a deliberately skewed key distribution (90% of rows share one key)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from concept_multi_db_query_engine_spark import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # 9000 rows of key 1, 1000 spread over keys 2..101
    left = spark.range(10000).select(
        F.when(F.col("id") < 9000, 1)
        .otherwise((F.col("id") % 100) + 2)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(1, 102).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim"),
    )
    return left, right


def test_salted_join_matches_plain_inner(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("dim").alias("s")
    )
    salted = skew.salted_join(left, right, "k", n_salts=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("dim").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_keeps_unmatched(spark, skewed):
    left, _ = skewed
    right_partial = spark.range(1, 3).select(
        F.col("id").alias("k"), F.lit("x").alias("dim")
    )
    out = skew.salted_join(left, right_partial, "k", n_salts=4, how="left")
    assert out.count() == left.count()
    assert out.where(F.col("dim").isNull()).count() == \
        left.where(~F.col("k").isin(1, 2)).count()


def test_salted_count_matches_plain(spark, skewed):
    left, _ = skewed
    plain = {r["k"]: r["n"] for r in left.groupBy("k").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["k"]: r["n"] for r in
              skew.salted_count_by_key(left, "k").collect()}
    assert plain == salted
