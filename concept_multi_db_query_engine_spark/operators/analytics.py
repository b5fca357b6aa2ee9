"""TPC-H-style analytic queries + window operators over the driver testdata.

These are the bench headliners. Money math is computed over
``DECIMAL(18,4)``-cast columns — decimal addition is exact and associative,
so Spark's parallel partial aggregation and DuckDB's sequential oracle agree
bit-for-bit; the final cast back to DOUBLE is deterministic. (Summing raw
doubles would make the result depend on partition order.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# decimal(12,4): narrow enough that a three-factor product
# (price × (1-disc) × (1+tax)) stays within precision 38 EXACTLY in both
# Spark and DuckDB (no engine-specific rounding of intermediate decimals)
DEC = "decimal(12,4)"


def _d(col: str):
    return F.col(col).cast(DEC)


def tpch_q1(lineitem: DataFrame, ship_cutoff: str = "1998-09-02") -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape): group lineitems shipped on or
    before the cutoff by returnflag/linestatus; 8 aggregates."""
    disc_price = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    charge = disc_price * (F.lit(1).cast(DEC) + _d("l_tax"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(ship_cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_d("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_d("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_d("l_quantity")).cast("double")
             / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_d("l_extendedprice")).cast("double")
             / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(_d("l_discount")).cast("double")
             / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def tpch_q3(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    segment: str = "BUILDING", cutoff: str = "1998-03-15", k: int = 10,
) -> DataFrame:
    """Shipping-priority top-k (TPC-H Q3 shape): revenue of unshipped orders
    for one market segment. Customer and orders are dimension-sized relative
    to lineitem → broadcast them; lineitem never shuffles."""
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = (
        orders.where(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    return (
        lineitem.where(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
        .join(F.broadcast(ords), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(k)
    )


def tpch_q5(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    supplier: DataFrame, nation: DataFrame, region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01", date_to: str = "1998-01-01",
) -> DataFrame:
    """Local-supplier volume (TPC-H Q5 shape): revenue per nation where
    customer and supplier share the nation. The dimension chain
    region→nation→customer/supplier is broadcast; only lineitem⋈orders is a
    real shuffle join."""
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    nat = (
        nation.join(
            F.broadcast(region.where(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    cust = customer.join(
        F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_nationkey").alias("c_nat"), "n_name")
    supp = supplier.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_nationkey").alias("s_nat"))
    ords = (
        orders.where(
            (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_nat", "n_name")
    )
    return (
        lineitem.join(F.broadcast(ords), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nat") == F.col("s_nat"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def top_orders_per_priority(orders: DataFrame, k: int = 3) -> DataFrame:
    """Top-k orders by total price within each priority class — the standard
    window/top-k-per-group operator (Catalyst handles it with a partial
    top-k per partition before the shuffle)."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
    )


def events_hourly(events: DataFrame) -> DataFrame:
    """Tumbling-hour event rollup: the batch twin of the streaming windowed
    aggregation in streaming/windows.py (same grouping, same aggregates)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
