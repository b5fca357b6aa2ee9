"""Extended TPC-H-shaped analytics (Q2, Q7-Q11, Q13-Q22 adapted to the
driver testdata schema — no ``partsupp`` table, so Q2/Q9/Q11/Q16/Q17/Q20
substitute the lineitem part-supplier link or ``p_retailprice`` where the
original uses ``partsupp`` columns; Q21 keys "late" off the ship/order
date gap since the lineitem has no commit/receipt dates. With these
adaptations all 22 TPC-H query shapes are covered).

Same numeric convention as analytics.py: money aggregates run over
DECIMAL(12,4)-cast columns (exact + associative → partition-order-immune),
cast to DOUBLE only at the end. Ratios divide two such exact doubles, which
is a single deterministic IEEE754 operation on both engines.

Scale notes (100 TB posture): explicit ``broadcast()`` hints are used ONLY
on frames whose size does not scale with the data — nation/region and
selective filters over them. Frames derived from ``orders``/``customer``
(and part-type filters) grow linearly with scale, so they carry no hint:
AQE (``spark.sql.adaptive.enabled``) converts those joins to broadcast at
runtime when the filtered side is small, and keeps a shuffle join when it
is not — the plan stays valid at any scale factor instead of blowing the
broadcast threshold at 100×. Two-level aggregations (Q13) aggregate the
narrow side first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .analytics import DEC, _d


def _rev():
    return _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))


def tpch_q7(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
    supplier: DataFrame, nation: DataFrame,
    nation_a: str = "NATION_1", nation_b: str = "NATION_2",
) -> DataFrame:
    """Volume shipping (TPC-H Q7 shape): revenue shipped between two nations
    in either direction, by (supp_nation, cust_nation, year)."""
    nat = nation.where(F.col("n_name").isin(nation_a, nation_b))
    supp = supplier.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = customer.join(
        F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    # cust/ords grow with scale — no hint; AQE picks the join side at runtime
    ords = orders.join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "cust_nation")
    return (
        lineitem
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(
            ((F.col("supp_nation") == nation_a)
             & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b)
               & (F.col("cust_nation") == nation_a))
        )
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def tpch_q8(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
    supplier: DataFrame, nation: DataFrame, region: DataFrame,
    part: DataFrame,
    region_name: str = "AMERICA", supp_nation: str = "NATION_1",
    part_type: str = "ECONOMY",
    date_from: str = "1995-01-01", date_to: str = "1997-01-01",
) -> DataFrame:
    """National market share (TPC-H Q8 shape): the share of one supplier
    nation in the revenue of one part type sold to one region, per year.
    ``sum(CASE)/sum`` over exact decimal sums → one deterministic double
    division per group."""
    nat_r = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    cust = customer.join(
        F.broadcast(nat_r), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey")
    supp = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    parts = part.where(F.col("p_type") == part_type).select("p_partkey")
    ords = (
        orders.where(
            (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    )
    zero = F.lit(0).cast(DEC)
    nation_rev = F.when(F.col("supp_nation") == supp_nation, _rev()) \
        .otherwise(zero)
    return (
        lineitem
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("o_year")
        .agg(
            (F.sum(nation_rev).cast("double")
             / F.sum(_rev()).cast("double")).alias("mkt_share"),
            F.sum(_rev()).cast("double").alias("total_revenue"),
        )
        .orderBy("o_year")
    )


def tpch_q9(
    lineitem: DataFrame, orders: DataFrame, supplier: DataFrame,
    nation: DataFrame, part: DataFrame,
    name_fragment: str = "widget", cost_factor: str = "0.8",
) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape, adapted: no ``ps_supplycost`` →
    cost modeled as ``cost_factor * p_retailprice * l_quantity``). Profit is
    the difference of two exact decimal sums, each cast to double first."""
    supp = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    parts = part.where(F.col("p_name").contains(name_fragment)).select(
        "p_partkey", "p_retailprice"
    )
    cost = (F.lit(cost_factor).cast(DEC) * _d("p_retailprice")
            * _d("l_quantity"))
    return (
        lineitem
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(_rev()).cast("double") - F.sum(cost).cast("double"))
            .alias("sum_profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("nation", F.col("o_year").desc())
    )


def tpch_q10(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01", date_to: str = "1996-07-01",
    k: int = 20,
) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): top-k customers by revenue
    lost to returns in a half-year window."""
    cust = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_name", "c_acctbal",
             F.col("n_name").alias("nation"))
    ords = (
        orders.where(
            (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
        ).select("o_orderkey", "o_custkey")
    )
    return (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "nation")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def tpch_q13(
    customer: DataFrame, orders: DataFrame,
    exclude_priority: str = "5-LOW",
) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): LEFT join so
    zero-order customers land in the c_count=0 bucket; two-level aggregation
    — the second groupBy runs on |customers| rows, not |orders|."""
    ords = orders.where(F.col("o_orderpriority") != exclude_priority).select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(ords, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def tpch_q14(
    lineitem: DataFrame, part: DataFrame,
    promo_type: str = "PROMO",
    date_from: str = "1996-03-01", date_to: str = "1996-04-01",
) -> DataFrame:
    """Promotion effect (TPC-H Q14 shape): percent of one month's revenue
    from promo parts — single filtered scan + broadcast part join, one
    global conditional aggregate."""
    zero = F.lit(0).cast(DEC)
    promo = F.when(F.col("p_type") == promo_type, _rev()).otherwise(zero)
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(F.broadcast(part.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * F.sum(promo).cast("double")
             / F.sum(_rev()).cast("double")).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def tpch_q15(
    lineitem: DataFrame, supplier: DataFrame,
    date_from: str = "1996-01-01", date_to: str = "1996-04-01",
) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): supplier(s) with max revenue over a
    quarter. The global-max window runs on the aggregated frame (|suppliers|
    rows, single partition — fine at any scale since it is post-aggregation;
    at 100 TB this frame is ~1e6 rows max)."""
    rev_per_supp = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
    )
    w = Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)
    top = rev_per_supp.withColumn(
        "max_revenue", F.max("total_revenue").over(w)
    ).where(F.col("total_revenue") == F.col("max_revenue"))
    return (
        top.join(F.broadcast(supplier.select("s_suppkey", "s_name")),
                 F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def tpch_q16(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
    exclude_brand: str = "Brand#1", exclude_type: str = "PROMO",
    sizes: tuple[int, ...] = (1, 5, 9, 14, 23, 36, 45, 49),
    supplier_name_not_endswith: str = "7",
) -> DataFrame:
    """Parts/supplier relationship (TPC-H Q16 shape, adapted: the
    part↔supplier link comes from distinct lineitem pairs instead of
    ``partsupp``). Distinct-count of suppliers per part attribute triple,
    excluding one brand, one type, and a supplier name pattern."""
    link = lineitem.select("l_partkey", "l_suppkey").distinct()
    parts = part.where(
        (F.col("p_brand") != exclude_brand)
        & (F.col("p_type") != exclude_type)
        & F.col("p_size").isin(*sizes)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = supplier.where(
        F.col("s_name").endswith(supplier_name_not_endswith)
    ).select("s_suppkey")
    return (
        link.join(F.broadcast(parts),
                  F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad_supp),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def tpch_q17(
    lineitem: DataFrame, part: DataFrame,
    brand: str = "Brand#3", qty_factor: float = 0.2,
) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): lineitems of one
    brand whose quantity is below ``qty_factor ×`` that part's average
    quantity. The correlated AVG subquery decorrelates to a per-part
    aggregate joined back — two passes over the brand's lineitems (both
    after a broadcast part-filter), no correlated execution."""
    parts = part.where(F.col("p_brand") == brand).select("p_partkey")
    li_b = lineitem.join(
        F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_qty = li_b.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.sum(_d("l_quantity")).cast("double")
         / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li_b.join(F.broadcast(avg_qty),
                  F.col("l_partkey") == F.col("ap_partkey"))
        .where(F.col("l_quantity") < F.lit(qty_factor) * F.col("avg_qty"))
        .agg(
            (F.sum(_d("l_extendedprice")).cast("double") / F.lit(7.0))
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def tpch_q18(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
    qty_threshold: float = 150.0, k: int = 100,
) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): orders whose total quantity
    exceeds the threshold — the HAVING-subquery folds to a pre-aggregated
    semi-join frame (aggregate lineitem once, filter, then join)."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_d("l_quantity")).cast("double").alias("sum_qty"))
        .where(F.col("sum_qty") > qty_threshold)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer.select("c_custkey", "c_name"),
              F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(k)
    )


def tpch_q19(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Discounted revenue (TPC-H Q19 shape): disjunction of three
    (brand, size-range, quantity-range) branches — the OR-of-ANDs predicate
    is a single JVM-side expression evaluated after one broadcast join; the
    part-side conjuncts (brand/size) could be pre-pushed per branch, but the
    union-of-three-joins alternative triples the probe cost for no gain at
    this selectivity."""
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#24") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    brands = part.where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#24")
        & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_brand", "p_size")
    return (
        lineitem
        .join(F.broadcast(brands), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(F.sum(_rev()).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )


def tpch_q22(
    customer: DataFrame, orders: DataFrame,
    inactive_since: str = "2001-01-01",
) -> DataFrame:
    """Global sales opportunity (TPC-H Q22 shape, adapted: every testdata
    customer has orders, so "never ordered" → "no order since the cutoff"):
    customers with above-average positive balance and no recent orders,
    grouped by nation. The scalar AVG subquery becomes a one-row broadcast
    cross join; "no recent orders" is a left-anti join against the filtered
    orders frame."""
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        (F.sum(_d("c_acctbal")).cast("double")
         / F.count(F.lit(1))).alias("avg_bal")
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit(inactive_since).cast("timestamp")
    ).select("o_custkey")
    return (
        customer.select("c_custkey", "c_nationkey", "c_acctbal")
        .crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_d("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def tpch_q21(
    lineitem: DataFrame, orders: DataFrame, supplier: DataFrame,
    nation: DataFrame, region: DataFrame,
    region_name: str = "EUROPE", late_days: int = 90,
) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape, adapted: the
    testdata lineitem has no commit/receipt dates, so "delivered late"
    → "shipped more than ``late_days`` after the order date"; the
    single-nation filter widens to a region so every scale factor has
    qualifying suppliers): count, per supplier, the late lineitems of
    finished multi-supplier orders where that supplier was the ONLY
    late one.

    Spark-first decorrelation (the same normalization the reference
    applies to EXISTS — CROSS_DB_NORMALIZATION.md:14-44): instead of
    the correlated EXISTS / NOT EXISTS pair, ONE per-order aggregate
    derives (distinct suppliers, distinct late suppliers, the max late
    supplier key, the late-row count). An order qualifies iff it has
    ≥2 suppliers and exactly 1 late supplier — and because that late
    supplier is unique, ``max(late supplier)`` IS the culprit and the
    order's late-row count is entirely theirs, so no join back to the
    lineitems is needed. The oracle runs the textbook correlated form,
    so the driver gate proves decorrelated == correlated.

    Scale: ONE scan of lineitem joined to filtered orders on the order
    key (both fact-sized — shuffle join, AQE-managed), one map-side-
    combined per-order aggregate, then a broadcast join of the
    |orders|-keyed result to the supplier dimension. No correlated
    re-execution and no second fact pass at any scale.
    """
    eu_supp = (
        supplier
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.where(F.col("r_name") == region_name)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name")
    )
    li = lineitem.join(
        orders.where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_shipdate")
         > F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAYS"))
        .alias("__late"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("__n_supp"),
        F.countDistinct(F.when(F.col("__late"), F.col("l_suppkey")))
        .alias("__n_late"),
        F.max(F.when(F.col("__late"), F.col("l_suppkey")))
        .alias("__late_supp"),
        F.sum(F.when(F.col("__late"), 1).otherwise(0)).alias("__late_cnt"),
    ).where((F.col("__n_supp") >= 2) & (F.col("__n_late") == 1))
    return (
        per_order
        .join(F.broadcast(eu_supp),
              F.col("__late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("__late_cnt").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def tpch_q2(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
    region: DataFrame, part: DataFrame,
    region_name: str = "EUROPE", part_type: str = "ECONOMY",
    max_size: int = 10,
) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape, adapted: no ``partsupp``
    table in the testdata, so the supply catalog derives from observed
    trade — per (part, supplier), the minimum unit price ever charged;
    ``p_type = X AND p_size <= K`` replaces the size/type-suffix pair
    since the testdata has 6 coarse types): for the selected parts, the
    region's suppliers whose offer matches the regional minimum.

    The correlated MIN subquery becomes a per-part window minimum over
    the region-filtered supply frame — one shuffle on the part key, no
    second scan, all min-ties kept (same semantics as the SQL form).
    Unit price is computed double/double (one deterministic IEEE754
    division per row on either engine) so the min-equality filter
    matches the oracle bit-for-bit.

    Scale: supply is a map-side-combined aggregate over lineitem (one
    shuffle on (part, supplier)); parts and the region's suppliers
    broadcast; the window min adds one part-keyed exchange of the
    aggregated (not raw) frame.
    """
    eu = (
        supplier
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.where(F.col("r_name") == region_name)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = part.where(
        (F.col("p_type") == part_type) & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_name")
    supply = (
        lineitem
        .select(
            "l_partkey", "l_suppkey",
            (F.col("l_extendedprice").cast("double")
             / F.col("l_quantity").cast("double")).alias("__unit"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("__unit").alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        supply
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("__min_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("__min_cost"))
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                F.round("unit_cost", 4).alias("unit_cost"))
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def tpch_q11(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
    region: DataFrame,
    region_name: str = "EUROPE", avg_mult: float = 1.5,
) -> DataFrame:
    """Important stock identification (TPC-H Q11 shape, adapted: part
    value = traded value ``sum(l_extendedprice)`` through the region's
    suppliers instead of ``ps_supplycost * ps_availqty``; the HAVING
    threshold is ``avg_mult ×`` the mean per-part value rather than
    TPC-H's scale-factor-dependent fraction, so the filter stays
    meaningful at every sf): parts whose traded value concentrates.

    The scalar total/average subquery re-aggregates the per-part frame
    — which would replay the fact lineage and scan lineitem twice (the
    welch_z_many finding, PLANS.md; a ``rollup`` variant was tried and
    rejected: Catalyst prunes each grouping-set branch separately, so
    the exchange is NOT reused and the plan still scans twice, now with
    Expand overhead on top). The fix is the checkpoint idiom the exact-
    quantile machinery already uses: ``localCheckpoint`` the AGGREGATED
    per-part frame (|parts| rows — orders of magnitude below the fact
    table; at petabyte scale the same cut point would checkpoint to
    parquet), then both the total row and the threshold filter read the
    materialized frame — ONE fact scan total. Exact decimal part sums;
    only the threshold comparison itself is double, identical on both
    engines.
    """
    eu = (
        supplier
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.where(F.col("r_name") == region_name)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    val = (
        lineitem
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_d("l_extendedprice")).alias("__value_d"))
        .localCheckpoint(eager=True)
    )
    # the grand total re-sums the exact DECIMAL per-part partials of the
    # CHECKPOINTED frame (order-immune, no fact rescan); doubles appear
    # only in the one threshold comparison below
    total = val.agg(
        F.sum("__value_d").cast("double").alias("__tot"),
        F.count(F.lit(1)).cast("double").alias("__n"),
    )
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("__value_d").cast("double")
               > F.lit(avg_mult) * F.col("__tot") / F.col("__n"))
        .select(F.col("l_partkey").alias("p_partkey"),
                F.round(F.col("__value_d").cast("double"), 4)
                .alias("part_value"))
        .orderBy(F.col("part_value").desc(), "p_partkey")
        .limit(100)
    )


def tpch_q20(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
    region: DataFrame, part: DataFrame,
    region_name: str = "EUROPE", name_prefix: str = "cold",
    date_from: str = "1996-01-01", date_to: str = "1997-01-01",
    share_gt: float = 0.5,
) -> DataFrame:
    """Potential part promotion (TPC-H Q20 shape, adapted: no
    ``ps_availqty``, so "excess stock" → "dominant supplier" — a
    supplier qualifies when it shipped more than ``share_gt`` of a
    prefix-named part's total quantity in the window): the region's
    suppliers holding a dominant position in some selected part.

    The nested IN subqueries flatten to one aggregation + one per-part
    window total: shipped quantity per (part, supplier) in the window
    (exact decimal, map-side combined), the part total as a window sum
    over that aggregated frame, the share filter, then broadcast joins
    to the selected parts and the region's suppliers. The part-name
    filter applies BEFORE aggregation (broadcast semi-join) so the
    shuffle carries only selected-part rows.
    """
    parts = part.where(F.col("p_name").startswith(name_prefix)) \
        .select("p_partkey")
    eu = (
        supplier
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.where(F.col("r_name") == region_name)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    shipped = (
        lineitem
        .where((F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
               & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp")))
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_d("l_quantity")).alias("__qty_d"))
    )
    # the per-part window total sums the exact DECIMAL per-supplier
    # partials (order-immune); the share comparison alone is double
    w = Window.partitionBy("l_partkey")
    return (
        shipped
        .withColumn("__part_qty", F.sum("__qty_d").over(w))
        .where(F.col("__qty_d").cast("double")
               > F.lit(share_gt) * F.col("__part_qty").cast("double"))
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "s_acctbal").distinct()
        .orderBy("s_name")
    )
