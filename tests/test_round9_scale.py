"""Round-9 scale work: the distributed ranking primitive and the
no-single-task-window guarantee for the rank/cumulative statistics
family (the round-8 verdict's one systemic scale flag — Spearman,
Kruskal-Wallis, Gini, Wasserstein, plus log-rank, ABC classes, shrunk
rates, exact AUC, and vocab coverage ran tie-averaged ranks through a
GLOBAL un-partitioned window: fine for bounded domains, corpus-sized
through one task for continuous columns at 100 TB).

Two layers:

* unit tests of :func:`distributed_prefix_counts` against brute-force
  Python prefix sums (long counts, DECIMAL sums, multi-column
  orderings, the ``with_lead`` step width), and
* physical-plan pins — every rerouted operator's executed plan must
  contain NO un-partitioned Window node (a Window node whose spec has
  no partition columns), and the rank-filter top-k family must keep
  Catalyst's TakeOrderedAndProject/WindowGroupLimit rewrite.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from concept_multi_db_query_engine_spark import operators as ops
from concept_multi_db_query_engine_spark import testdata

SF_DIR = "/root/testdata/sf0.001"


def executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def unpartitioned_window_lines(plan: str) -> list[str]:
    """Window nodes print as ``Window [exprs], [part], [order]`` when
    partitioned and ``Window [exprs], [order]`` when global — a global
    node has exactly one top-level ``], [`` separator."""
    bad = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: *(0123456789)").strip()
        if s.startswith("Window [") and s.count("], [") < 2:
            bad.append(line)
    return bad


class TestDistributedPrefixCounts:
    def test_long_counts_match_bruteforce(self, spark):
        rows = [(float(v % 17), 1 + v % 3) for v in range(500)]
        df = spark.createDataFrame(rows, "v double, c long") \
            .groupBy("v").agg(F.sum("c").cast("long").alias("c"))
        out, totals = ops.distributed_prefix_counts(df, "v", ["c"])
        got = {r["v"]: (r["__before_c"], r["__cum_c"])
               for r in out.collect()}
        base = sorted(
            df.groupBy("v").agg(F.sum("c").alias("c")).collect(),
            key=lambda r: r["v"],
        )
        acc = 0
        for r in base:
            assert got[r["v"]] == (acc, acc + r["c"])
            acc += r["c"]
        assert totals["c"] == acc

    def test_decimal_sums_and_multicol_order(self, spark):
        rows = [(f"k{i:03d}", Decimal(str((i * 7) % 13)) / 4)
                for i in range(200)]
        df = spark.createDataFrame(rows, "key string, v decimal(18,2)")
        out, totals = ops.distributed_prefix_counts(
            df, [F.col("v").desc(), F.col("key").asc()], ["v"],
        )
        got = sorted(out.collect(), key=lambda r: (-r["v"], r["key"]))
        acc = Decimal(0)
        for r in got:
            assert r["__before_v"] == acc
            acc += r["v"]
            assert r["__cum_v"] == acc
        assert totals["v"] == acc

    def test_with_lead_gives_global_next_value(self, spark):
        vals = [float(v) for v in (3, 1, 4, 1, 5, 9, 2, 6)]
        df = spark.createDataFrame(
            [(v, 1) for v in vals], "v double, c long"
        ).groupBy("v").agg(F.sum("c").cast("long").alias("c"))
        out, _ = ops.distributed_prefix_counts(
            df, "v", ["c"], with_lead=True
        )
        rows = sorted(out.collect(), key=lambda r: r["v"])
        distinct = sorted(set(vals))
        for i, r in enumerate(rows):
            expected = distinct[i + 1] if i + 1 < len(distinct) else None
            assert r["__next_v"] == expected

    def test_with_lead_rejects_multicol(self, spark):
        df = spark.createDataFrame([(1.0, 1)], "v double, c long")
        with pytest.raises(ValueError):
            ops.distributed_prefix_counts(
                df, [F.col("v").asc()], ["c"], with_lead=True
            )

    def test_many_partitions_still_exact(self, spark):
        # the idiom's whole point: correctness must not depend on how
        # repartitionByRange happens to cut the range
        df = spark.range(0, 2000).select(
            (F.col("id") % 97).cast("double").alias("v"),
            F.lit(1).cast("long").alias("c"),
        ).groupBy("v").agg(F.sum("c").cast("long").alias("c")) \
            .repartition(16)
        out, totals = ops.distributed_prefix_counts(df, "v", ["c"])
        assert totals["c"] == 2000
        rows = sorted(out.collect(), key=lambda r: r["v"])
        acc = 0
        for r in rows:
            assert r["__before_c"] == acc
            acc += r["c"]
        assert acc == 2000


class TestNoSingleTaskWindows:
    """Every operator rerouted in round 9 must execute with zero
    un-partitioned Window nodes, at any data size."""

    def _assert_clean(self, df):
        plan = executed(df)
        bad = unpartitioned_window_lines(plan)
        assert not bad, f"global single-task window(s) survived: {bad}"

    def test_spearman(self, spark):
        li = testdata.load_table(spark, SF_DIR, "lineitem")
        self._assert_clean(
            ops.spearman_corr(li, "l_quantity", "l_extendedprice"))

    def test_kruskal_wallis(self, spark):
        orders = testdata.load_table(spark, SF_DIR, "orders")
        self._assert_clean(
            ops.kruskal_wallis(orders, "o_orderpriority", "o_totalprice"))

    def test_gini(self, spark):
        orders = testdata.load_table(spark, SF_DIR, "orders")
        self._assert_clean(ops.gini_coefficient(orders, "o_totalprice"))

    def test_wasserstein(self, spark):
        orders = testdata.load_table(spark, SF_DIR, "orders")
        self._assert_clean(ops.wasserstein_1d(
            orders, "o_totalprice", "o_orderpriority",
            "1-URGENT", "5-LOW"))

    def test_log_rank(self, spark):
        orders = testdata.load_table(spark, SF_DIR, "orders")
        df = orders.select(
            (F.col("o_orderkey") % 50).alias("dur"),
            (F.col("o_orderkey") % 3 != 0).alias("obs"),
            "o_orderpriority",
        )
        self._assert_clean(ops.log_rank_test(
            df, "dur", "obs", "o_orderpriority = '1-URGENT'"))

    def test_abc_classes(self, spark):
        li = testdata.load_table(spark, SF_DIR, "lineitem")
        self._assert_clean(
            ops.abc_classes(li, "l_partkey", "l_extendedprice"))

    def test_shrunk_rates(self, spark):
        orders = testdata.load_table(spark, SF_DIR, "orders")
        self._assert_clean(ops.shrunk_rates_report(
            orders, "o_orderpriority",
            "CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END"))

    def test_ks_test(self, spark):
        orders = testdata.load_table(spark, SF_DIR, "orders")
        self._assert_clean(ops.ks_test(
            orders, "o_totalprice", "o_orderstatus", "F", "O"))


class TestTopKRewriteHolds:
    """The rank-filter top-k family relies on Catalyst rewriting
    ``row_number() OVER (ORDER BY ...) <= k`` into a
    TakeOrderedAndProject / WindowGroupLimit — per-partition top-k, so
    the trailing window only ever sees ≤ k rows.  Pin it: an
    intervening operator that blocks the rewrite would silently
    reintroduce a corpus-sized single-task sort."""

    def _assert_topk(self, df):
        plan = executed(df)
        assert ("TakeOrderedAndProject" in plan
                or "WindowGroupLimit" in plan), plan

    def test_bm25(self, spark):
        docs = testdata.load_table(spark, SF_DIR, "documents")
        self._assert_topk(ops.bm25_topk(docs, ["data", "quality"], k=5))

    def test_boilerplate_prefixes(self, spark):
        docs = testdata.load_table(spark, SF_DIR, "documents")
        self._assert_topk(ops.boilerplate_prefixes(docs, min_docs=1))

    def test_distinctive_terms(self, spark):
        docs = testdata.load_table(spark, SF_DIR, "documents")
        self._assert_topk(ops.distinctive_terms(docs, target="web", k=5))

    def test_trending_report(self, spark):
        events = testdata.load_table(spark, SF_DIR, "events")
        self._assert_topk(ops.trending_report(
            events, "event_type", "dayofmonth(ts) > 15", k=5))

    def test_anomaly_leaderboard(self, spark):
        orders = testdata.load_table(spark, SF_DIR, "orders")
        series = orders.groupBy(
            "o_orderpriority",
            F.month("o_orderdate").alias("m"),
        ).agg(F.sum("o_totalprice").alias("v"))
        self._assert_topk(ops.metric_anomaly_leaderboard(
            series, "o_orderpriority", "m", "v", current_idx=6, k=3))

    def test_vocab_coverage_limits_before_ranking(self, spark):
        docs = testdata.load_table(spark, SF_DIR, "documents")
        plan = executed(ops.vocab_coverage(docs, ks=[10, 100]))
        assert "TakeOrderedAndProject" in plan


class TestWave23NoSingleTaskWindows(TestNoSingleTaskWindows):
    """The round-9 waves built ON the primitive must stay clean too."""

    def test_cramer_von_mises(self, spark):
        orders = testdata.load_table(spark, SF_DIR, "orders")
        self._assert_clean(ops.cramer_von_mises(
            orders, "o_totalprice", "o_orderstatus", "F", "O"))

    def test_energy_distance(self, spark):
        orders = testdata.load_table(spark, SF_DIR, "orders")
        self._assert_clean(ops.energy_distance(
            orders, "o_totalprice", "o_orderstatus", "F", "O"))

    def test_anderson_darling(self, spark):
        orders = testdata.load_table(spark, SF_DIR, "orders")
        self._assert_clean(ops.anderson_darling_2s(
            orders, "o_totalprice", "o_orderstatus", "F", "O"))

    def test_nelson_aalen_ungrouped(self, spark):
        orders = testdata.load_table(spark, SF_DIR, "orders")
        df = orders.select(
            (F.col("o_orderkey") % 40).alias("dur"),
            (F.col("o_orderkey") % 3 != 0).alias("obs"),
        )
        self._assert_clean(ops.nelson_aalen(df, "dur", "obs"))

    def test_kaplan_meier_ungrouped(self, spark):
        orders = testdata.load_table(spark, SF_DIR, "orders")
        df = orders.select(
            (F.col("o_orderkey") % 40).alias("dur"),
            (F.col("o_orderkey") % 3 != 0).alias("obs"),
        )
        self._assert_clean(ops.kaplan_meier(df, "dur", "obs"))

    def test_ks_drift_leaderboard_topk_rewrites(self, spark):
        # group-partitioned cumulatives + primitive for the global one;
        # the final rank-filter must keep the TakeOrdered rewrite
        orders = testdata.load_table(spark, SF_DIR, "orders")
        df = ops.ks_drift_leaderboard(
            orders, "o_totalprice", "o_orderpriority", k=3)
        plan = executed(df)
        assert ("TakeOrderedAndProject" in plan
                or "WindowGroupLimit" in plan), plan

    def test_sprt_cumulative_is_distributed(self, spark):
        events = testdata.load_table(spark, SF_DIR, "events")
        daily = events.groupBy(
            F.expr("CAST(ts AS DATE)").alias("day")
        ).agg(
            F.sum(F.expr(
                "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
            )).alias("s"),
            F.count(F.lit(1)).alias("t"),
        ).select(
            F.expr("datediff(day, DATE '1995-01-01')").cast("long")
            .alias("idx"),
            "s", "t",
        )
        self._assert_clean(ops.sprt_test(
            daily, "idx", "s", "t", p0=0.05, p1=0.15))
