"""Edge-case semantics for the insights operators (the DuckDB parity sweep
in test_oracle_parity.py covers the happy path at sf0.01; these pin the
corner cases on tiny in-memory frames)."""

from __future__ import annotations

import datetime as dt

from concept_multi_db_query_engine_spark import operators as ops


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, "
              "o_orderdate timestamp",
    )


def test_order_gaps_single_order_customer_has_null_avg(spark):
    df = _orders(spark, [
        (1, 10, 5.0, dt.datetime(1995, 1, 1)),
        (2, 20, 5.0, dt.datetime(1995, 1, 1)),
        (3, 20, 5.0, dt.datetime(1995, 1, 11)),
    ])
    out = {r["o_custkey"]: r for r in ops.customer_order_gaps(df).collect()}
    assert out[10]["n_orders"] == 1
    assert out[10]["avg_gap_days"] is None
    assert out[10]["max_gap_days"] is None
    assert out[20]["avg_gap_days"] == 10.0
    assert out[20]["max_gap_days"] == 10


def test_rolling_revenue_window_sums_prior_6_days(spark):
    df = _orders(spark, [
        (1, 1, 100.0, dt.datetime(1995, 1, 1)),
        (2, 1, 10.0, dt.datetime(1995, 1, 7)),   # day 6: inside window
        (3, 1, 1.0, dt.datetime(1995, 1, 8)),    # day 7: day 0 ages out
    ])
    rows = {r["order_day"].isoformat(): r["revenue_7d"]
            for r in ops.rolling_revenue_7d(df).collect()}
    assert rows["1995-01-01"] == 100.0
    assert rows["1995-01-07"] == 110.0
    assert rows["1995-01-08"] == 11.0


def test_setops_segments_partition_customers(spark):
    df = _orders(spark, [
        (1, 1, 1.0, dt.datetime(1995, 6, 1)),   # lapsed
        (2, 2, 1.0, dt.datetime(1995, 6, 1)),   # retained...
        (3, 2, 1.0, dt.datetime(1996, 6, 1)),
        (4, 3, 1.0, dt.datetime(1996, 6, 1)),   # acquired
        (5, 4, 1.0, dt.datetime(1997, 6, 1)),   # in neither year
    ])
    got = {r["segment"]: r["numcust"]
           for r in ops.customer_segments_setops(df).collect()}
    assert got == {"retained": 1, "lapsed": 1, "acquired": 1}


def test_attribution_counts_only_window_clicks_and_keeps_zeroes(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    events = spark.createDataFrame(
        [
            (1, t0, 7, "purchase", None),
            (2, t0 - dt.timedelta(minutes=59), 7, "click", None),
            (3, t0 - dt.timedelta(minutes=61), 7, "click", None),  # too old
            (4, t0, 7, "click", None),                   # not strictly before
            (5, t0 - dt.timedelta(minutes=5), 8, "click", None),   # other user
            (6, t0, 9, "purchase", None),                # zero clicks
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )
    got = {r["event_id"]: r["n_clicks_before"]
           for r in ops.purchase_click_attribution(events).collect()}
    assert got == {1: 1, 6: 0}


def test_top_bigrams_handles_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "a b a b")],
        "doc_id long, text string",
    )
    got = [(r["bigram"], r["n"]) for r in ops.top_bigrams(docs).collect()]
    assert got == [("a b", 2), ("b a", 1)]


def test_tfidf_rare_term_outranks_common(spark):
    docs = spark.createDataFrame(
        [(1, "common rare common"), (2, "common other"), (3, "common misc")],
        "doc_id long, text string",
    )
    top = {r["doc_id"]: r["term"]
           for r in ops.tfidf_top_terms(docs, k=1).collect()}
    assert top[1] == "rare"   # df=1 beats the everywhere-term (idf 0)


def test_distributed_ntile_matches_window_ntile(spark):
    """distributed_ntile must reproduce ntile(k) OVER (ORDER BY ...) exactly
    — including the uneven-bucket rule (first n%k buckets one row larger)
    and the n<k edge — while keeping every stage parallel."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    for n, k in [(97, 10), (100, 10), (5, 10), (1, 3), (23, 4)]:
        df = spark.range(n).select(
            F.col("id").alias("key"),
            (F.col("id") * 37 % 101).alias("v"),
        )
        sort = [F.col("v").desc(), F.col("key").asc()]
        got = {
            r["key"]: r["b"]
            for r in ops.distributed_ntile(df, sort, k, "b").collect()
        }
        w = Window.orderBy(*sort)
        want = {
            r["key"]: r["b"]
            for r in df.withColumn("b", F.ntile(k).over(w)).collect()
        }
        assert got == want, (n, k)
