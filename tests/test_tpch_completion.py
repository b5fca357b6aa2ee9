"""Semantic unit tests for the four queries that complete the TPC-H
suite (Q2/Q11/Q20/Q21 — adapted to the testdata schema, which lacks
``partsupp`` and the lineitem commit/receipt dates; see
operators/tpch_ext.py for the adaptation contract). Each test builds a
hand-computable micro-fixture and checks the decision boundary the
query shape exists to express: Q21's only-late-supplier rule, Q2's
min-cost tie handling, Q11's above-average threshold, Q20's strict
dominance share."""

from __future__ import annotations

import datetime as dt

from concept_multi_db_query_engine_spark import operators as ops


def _dims(spark):
    region = spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(0, "NATION_0", 0), (1, "NATION_1", 0), (2, "NATION_2", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    supplier = spark.createDataFrame(
        [(1, "SUPP_1", 0, 100.0), (2, "SUPP_2", 1, 200.0),
         (3, "SUPP_3", 2, 300.0)],
        "s_suppkey int, s_name string, s_nationkey int, s_acctbal double",
    )
    return region, nation, supplier


def _ts(day):
    return dt.datetime(1996, 1, day)


# ---- tpch_q21 -------------------------------------------------------------


def test_q21_counts_only_sole_late_supplier_in_multi_supplier_orders(spark):
    region, nation, supplier = _dims(spark)
    orders = spark.createDataFrame(
        [(10, "F", _ts(1)), (20, "F", _ts(1)), (30, "F", _ts(1)),
         (40, "O", _ts(1))],
        "o_orderkey int, o_orderstatus string, o_orderdate timestamp",
    )
    late = dt.datetime(1996, 6, 1)     # > 90 days after Jan 1
    ontime = dt.datetime(1996, 1, 15)
    lineitem = spark.createDataFrame(
        [
            # order 10: supp 1 late (twice), supp 2 on time -> counts 2
            (10, 1, late), (10, 1, late), (10, 2, ontime),
            # order 20: both suppliers late -> nobody counts
            (20, 1, late), (20, 2, late),
            # order 30: single supplier, late -> no second supplier, skip
            (30, 1, late),
            # order 40: status O -> ignored entirely
            (40, 1, late), (40, 2, ontime),
        ],
        "l_orderkey int, l_suppkey int, l_shipdate timestamp",
    )
    got = {r["s_name"]: r["numwait"]
           for r in ops.tpch_q21(lineitem, orders, supplier, nation,
                                 region).collect()}
    assert got == {"SUPP_1": 2}


# ---- tpch_q2 --------------------------------------------------------------


def test_q2_keeps_all_regional_min_cost_ties_and_ignores_foreign(spark):
    region, nation, supplier = _dims(spark)
    part = spark.createDataFrame(
        [(100, "cold widget", "ECONOMY", 5, 1.0),
         (200, "hot bolt", "PROMO", 5, 1.0)],
        "p_partkey int, p_name string, p_type string, p_size int, "
        "p_retailprice double",
    )
    li = spark.createDataFrame(
        [
            # part 100: supp1 unit 10.0, supp2 unit 10.0 (tie), supp3
            # (ASIA) unit 1.0 — cheapest but outside the region, so the
            # regional min is 10.0 and BOTH European suppliers match
            (100, 1, 2.0, 20.0), (100, 2, 5.0, 50.0), (100, 3, 1.0, 1.0),
            # part 200: wrong p_type, never surfaces
            (200, 1, 1.0, 5.0),
        ],
        "l_partkey int, l_suppkey int, l_quantity double, "
        "l_extendedprice double",
    )
    rows = ops.tpch_q2(li, supplier, nation, region, part).collect()
    assert {(r["s_name"], r["p_partkey"], r["unit_cost"]) for r in rows} \
        == {("SUPP_1", 100, 10.0), ("SUPP_2", 100, 10.0)}
    # ordered by s_acctbal desc -> SUPP_2 (200.0) first
    assert [r["s_name"] for r in rows] == ["SUPP_2", "SUPP_1"]


# ---- tpch_q11 -------------------------------------------------------------


def test_q11_threshold_is_avg_multiple_over_regional_value(spark):
    region, nation, supplier = _dims(spark)
    # regional (EUROPE) values: part 1 -> 900, part 2 -> 60, part 3 -> 40
    # (supp3's ASIA rows are excluded). avg = 1000/3; 1.5*avg = 500.
    li = spark.createDataFrame(
        [(1, 1, 900.0), (2, 2, 60.0), (3, 1, 40.0), (1, 3, 5000.0)],
        "l_partkey int, l_suppkey int, l_extendedprice double",
    )
    rows = ops.tpch_q11(li, supplier, nation, region).collect()
    assert [(r["p_partkey"], r["part_value"]) for r in rows] == [(1, 900.0)]


# ---- tpch_q20 -------------------------------------------------------------


def test_q20_strict_dominance_share_and_name_prefix(spark):
    region, nation, supplier = _dims(spark)
    part = spark.createDataFrame(
        [(100, "cold widget", "ECONOMY", 5, 1.0),
         (200, "cold bolt", "ECONOMY", 5, 1.0),
         (300, "hot ring", "ECONOMY", 5, 1.0)],
        "p_partkey int, p_name string, p_type string, p_size int, "
        "p_retailprice double",
    )
    inw = dt.datetime(1996, 6, 1)
    li = spark.createDataFrame(
        [
            # part 100: supp1 ships 70 of 100 -> dominant
            (100, 1, 70.0, inw), (100, 2, 30.0, inw),
            # part 200: exact 50/50 split -> strict > fails for both
            (200, 1, 50.0, inw), (200, 2, 50.0, inw),
            # part 300: dominant but name fails the prefix
            (300, 2, 99.0, inw), (300, 1, 1.0, inw),
            # out-of-window rows never count
            (100, 2, 500.0, dt.datetime(1999, 1, 1)),
        ],
        "l_partkey int, l_suppkey int, l_quantity double, "
        "l_shipdate timestamp",
    )
    rows = ops.tpch_q20(li, supplier, nation, region, part).collect()
    assert [(r["s_name"], r["s_acctbal"]) for r in rows] == [("SUPP_1", 100.0)]
