"""Round-10 scale pins: physical-plan shape checks for the new
operator wave, following the round-9 discipline — operators over FACT
tables must contain no un-partitioned Window node in their executed
plans (series-contract operators run their bounded global windows
over pre-aggregated model frames and are checked for exactly that),
two-stage model broadcasts must actually broadcast, and the
Jonckheere prefix-counts reroute must keep its windows
__pid-partitioned."""

from __future__ import annotations

from pyspark.sql import functions as F

from concept_multi_db_query_engine_spark import operators as ops
from concept_multi_db_query_engine_spark import testdata

SF_DIR = "/root/testdata/sf0.001"


def executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def unpartitioned_window_lines(plan: str) -> list[str]:
    bad = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: *(0123456789)").strip()
        if s.startswith("Window [") and s.count("], [") < 2:
            bad.append(line)
    return bad


class TestFactTableOpsHaveNoGlobalWindow:
    """Every round-10 operator whose input is a FACT table (not the
    bounded series/model contract) must execute without a global
    Window: their reductions are single aggregations, prefix-counts
    passes, or broadcast-model joins by construction."""

    def _assert_clean(self, df):
        plan = executed(df)
        bad = unpartitioned_window_lines(plan)
        assert not bad, f"un-partitioned Window nodes:\n" + "\n".join(bad)

    def test_moment_family(self, spark):
        orders = testdata.load_table(spark, SF_DIR, "orders")
        self._assert_clean(ops.jarque_bera(orders, "o_totalprice"))
        self._assert_clean(
            ops.welch_anova(orders, "o_orderpriority", "o_totalprice"))
        self._assert_clean(
            ops.tukey_hsd(orders, "o_orderpriority", "o_totalprice"))
        self._assert_clean(ops.grubbs_test(orders, "o_totalprice"))
        self._assert_clean(ops.point_biserial(
            orders, "o_orderpriority = '1-URGENT'", "o_totalprice"))

    def test_categorical_family(self, spark):
        orders = testdata.load_table(spark, SF_DIR, "orders")
        cust = testdata.load_table(spark, SF_DIR, "customer")
        self._assert_clean(ops.mcnemar_test(
            orders, "o_totalprice > 150000",
            "o_orderpriority IN ('1-URGENT', '2-HIGH')"))
        self._assert_clean(ops.cochran_armitage(
            orders, "CAST(substr(o_orderpriority, 1, 1) AS BIGINT)",
            "o_orderstatus = 'F'"))
        self._assert_clean(ops.mantel_haenszel(
            cust, "c_nationkey", "c_mktsegment = 'BUILDING'",
            "c_acctbal > 0"))

    def test_regression_family_broadcasts_the_model_row(self, spark):
        li = testdata.load_table(spark, SF_DIR, "lineitem")
        bp = ops.breusch_pagan(li, "l_quantity", "l_extendedprice")
        plan = executed(bp)
        assert not unpartitioned_window_lines(plan)
        assert "BroadcastNestedLoopJoin" in plan \
            or "BroadcastExchange" in plan
        orders = testdata.load_table(spark, SF_DIR, "orders").select(
            "o_orderkey",
            F.expr("CAST(datediff(CAST(o_orderdate AS DATE), "
                   "DATE '1992-01-01') AS DOUBLE)").alias("xday"),
            "o_totalprice",
        )
        cd = ops.cooks_distance(
            orders, "o_orderkey", "xday", "o_totalprice", top_k=5)
        plan = executed(cd)
        assert "BroadcastNestedLoopJoin" in plan \
            or "BroadcastExchange" in plan
        # the top-k cut must stay a TakeOrdered, not a global sort
        assert "TakeOrderedAndProject" in plan

    def test_jonckheere_windows_are_pid_partitioned(self, spark):
        orders = testdata.load_table(spark, SF_DIR, "orders")
        jt = ops.jonckheere_terpstra(
            orders, "CAST(substr(o_orderpriority, 1, 1) AS BIGINT)",
            "o_totalprice")
        plan = executed(jt)
        bad = unpartitioned_window_lines(plan)
        assert not bad, (
            "JT must route ranks through distributed_prefix_counts "
            "(__pid-partitioned windows), found global:\n"
            + "\n".join(bad)
        )

    def test_permutation_and_bland_altman_single_scan_shapes(self, spark):
        orders = testdata.load_table(spark, SF_DIR, "orders")
        pt = ops.permutation_test_mean(
            orders, "o_totalprice", "o_orderpriority = '1-URGENT'",
            "o_orderkey", n_perm=16)
        assert not unpartitioned_window_lines(executed(pt))
        docs = testdata.load_table(spark, SF_DIR, "documents").select(
            F.expr("CAST(size(split(text, ' ')) AS DOUBLE)").alias("a"),
            F.expr("CAST(length(text) AS DOUBLE)").alias("b"),
        )
        ba = ops.bland_altman(docs, "a", "b")
        plan = executed(ba)
        assert not unpartitioned_window_lines(plan)
        assert "BroadcastNestedLoopJoin" in plan \
            or "BroadcastExchange" in plan


class TestSeriesContractOpsStayBounded:
    """CUSUM / Bollinger / Ljung-Box / Hurst run ordered windows over
    the AGGREGATED series frame (bounded by the time domain) — the
    documented page_hinkley exception. The pin here is that the global
    window's INPUT is the post-aggregation frame: the executed plan
    must show an aggregate BELOW the window, never a raw scan feeding
    it. Cheap structural proxy: the ops execute correctly on a series
    frame and their plans contain a HashAggregate."""

    def _daily(self, spark):
        return (
            testdata.load_table(spark, SF_DIR, "orders")
            .groupBy(F.expr("CAST(o_orderdate AS DATE)").alias("day"))
            .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
            .select(
                F.expr("datediff(day, DATE '1992-01-01')").alias("idx"),
                "cnt",
            )
        )

    def test_series_ops_aggregate_before_windowing(self, spark):
        daily = self._daily(spark)
        for df in (
            ops.cusum_control(daily, "idx", "cnt"),
            ops.bollinger_bands(daily, "idx", "cnt", window=20),
            ops.ljung_box(daily, "idx", "cnt", max_lag=5),
        ):
            plan = executed(df)
            assert "HashAggregate" in plan

    def test_hurst_block_windows_are_partitioned(self, spark):
        daily = self._daily(spark)
        h = ops.hurst_exponent(daily, "idx", "cnt")
        plan = executed(h)
        # the per-block cumulative windows are partitioned by block id;
        # the only global windows are the series row_number (bounded)
        # and the 4-row model frame — count the global nodes
        bad = unpartitioned_window_lines(plan)
        assert len(bad) <= 1, (
            "only the bounded series row_number may be global:\n"
            + "\n".join(bad)
        )


class TestLateWavePlanShapes:
    def test_dunns_rank_windows_are_pid_partitioned(self, spark):
        orders = testdata.load_table(spark, SF_DIR, "orders")
        plan = executed(ops.dunns_test(
            orders, "o_orderpriority", "o_totalprice"))
        bad = unpartitioned_window_lines(plan)
        assert not bad, "\n".join(bad)

    def test_grouping_sets_single_expand_no_window(self, spark):
        import __spark_entry__ as entry_mod

        df = entry_mod.queries()["orders_grouping_sets"](
            spark, SF_DIR)
        plan = executed(df)
        assert plan.count("Expand") >= 1
        assert not unpartitioned_window_lines(plan)

    def test_fellegi_sunter_single_aggregation(self, spark):
        import __spark_entry__ as entry_mod

        df = entry_mod.queries()["suppliers_fellegi_sunter"](
            spark, SF_DIR)
        plan = executed(df)
        assert not unpartitioned_window_lines(plan)
