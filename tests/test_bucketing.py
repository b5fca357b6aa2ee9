"""Bucketed co-located joins: writing both sides bucketed on the join key
must eliminate every shuffle Exchange from the join plan, and results must
match the plain join."""

from __future__ import annotations

import pytest

from concept_multi_db_query_engine_spark import bucketing, testdata

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # spark.sql.warehouse.dir is static per-session; tables land in the
    # default ./spark-warehouse and are dropped on teardown
    orders = testdata.load_table(spark, SF_DIR, "orders")
    lineitem = testdata.load_table(spark, SF_DIR, "lineitem")
    bucketing.write_bucketed(orders, "b_orders", "o_orderkey", 4)
    bucketing.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", 4,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    joined = bucketing.bucketed_join(
        spark, "b_lineitem", "b_orders", "o_orderkey"
    )
    # force a non-broadcast join so the exchange test is meaningful
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.bucketed_join(
            spark, "b_lineitem", "b_orders", "o_orderkey"
        )
        assert bucketing.exchange_count(joined) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_unbucketed_join_does_exchange(spark, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = testdata.load_table(spark, SF_DIR, "orders")
        lineitem = testdata.load_table(spark, SF_DIR, "lineitem") \
            .withColumnRenamed("l_orderkey", "o_orderkey")
        plain = lineitem.join(orders, "o_orderkey")
        assert bucketing.exchange_count(plain) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    bucketed = bucketing.bucketed_join(
        spark, "b_lineitem", "b_orders", "o_orderkey"
    )
    orders = testdata.load_table(spark, SF_DIR, "orders")
    lineitem = testdata.load_table(spark, SF_DIR, "lineitem") \
        .withColumnRenamed("l_orderkey", "o_orderkey")
    plain = lineitem.join(orders, "o_orderkey")
    assert bucketed.count() == plain.count()


def test_incremental_dedup_against_bucketed_fingerprint_store(spark):
    """Substantiates the incremental_new_docs scale claim: with the corpus
    fingerprint store bucketed on `fingerprint`, the daily anti-join never
    re-shuffles the (huge) corpus side — only the (small) incoming batch
    exchanges, into the store's bucket layout."""
    from pyspark.sql import functions as F

    from concept_multi_db_query_engine_spark import operators as ops

    docs = testdata.load_table(spark, SF_DIR, "documents")
    corpus_fp = docs.where("doc_id % 2 = 0").select(
        F.md5("text").alias("fingerprint"))
    bucketing.write_bucketed(corpus_fp, "b_fingerprints", "fingerprint", 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = ops.incremental_new_docs(
            docs.where("doc_id % 2 = 1"), spark.table("b_fingerprints"))
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        # exactly one exchange: the batch's fingerprint window/join shuffle;
        # the bucketed store side reads in place
        assert final.count("Exchange hashpartitioning") == 1, final
        # parity with the unbucketed formulation
        want = sorted(
            r["doc_id"] for r in ops.incremental_new_docs(
                docs.where("doc_id % 2 = 1"), corpus_fp).collect())
        assert sorted(r["doc_id"] for r in out.collect()) == want
        assert want  # non-vacuous
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_fingerprints")
