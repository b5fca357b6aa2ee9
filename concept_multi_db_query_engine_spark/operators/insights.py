"""Window/pivot/set-op/range-join analytics over the driver testdata.

These extend the engine beyond the reference's closed query surface
(reference README.md:768 lists computed columns/expressions as future scope;
windowed analytics have no reference equivalent) with the shapes a
warehouse user expects: rolling time windows, lag-based gap analysis,
pivot, ntile bucketing, INTERSECT/EXCEPT cohorts, and a time-range join.

Numeric convention matches analytics.py: money sums run over
DECIMAL-cast columns (exact, associative, partition-order-immune), cast to
DOUBLE only at the very end.

Scale notes (100 TB posture), per operator:
- rolling_revenue_7d: aggregates the fact table FIRST (one shuffle on the
  day key), then runs the unpartitioned window over the tiny |days| frame —
  never a window over raw facts.
- customer_order_gaps: the lag window partitions by customer, so it
  shuffles once on the same key as the final groupBy — Catalyst reuses the
  partitioning and the whole operator is a single exchange.
- nation_revenue_pivot: pivot with an EXPLICIT value list compiles to one
  hash aggregate (no second pass to discover pivot values).
- customer_revenue_deciles: the global ntile runs on the post-aggregation
  |customers| frame in a single partition — fine while |customers| fits one
  task (~1e8 rows); beyond that switch to approx percentile cutpoints.
- customer_segments_setops: EXCEPT/INTERSECT on distinct key sets —
  shuffles on the key; each input is pre-filtered and pre-projected so the
  exchange carries 8-byte keys only.
- purchase_click_attribution: equi-join on user_id carries the time-range
  predicate as a post-join filter — the shuffle key is the user, so the
  range condition never degenerates into a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .analytics import DEC, _d

DEC18 = "decimal(18,4)"


def rolling_revenue_7d(orders: DataFrame, epoch: str = "1995-01-01") -> DataFrame:
    """Daily order revenue plus its 7-day trailing rolling sum.

    Two-level plan: exact-decimal daily aggregate (shuffle on day), then a
    rangeBetween(-6, 0) window over the integer day number on the ~|days|
    aggregated frame."""
    daily = (
        orders
        .groupBy(
            F.to_date("o_orderdate").alias("order_day"),
            F.datediff(F.to_date("o_orderdate"),
                       F.lit(epoch).cast("date")).alias("day_n"),
        )
        .agg(F.sum(_d("o_totalprice")).cast(DEC18).alias("daily_rev_d"),
             F.count(F.lit(1)).alias("n_orders"))
    )
    w = Window.orderBy("day_n").rangeBetween(-6, 0)
    return (
        daily
        .select(
            "order_day",
            F.col("daily_rev_d").cast("double").alias("daily_revenue"),
            "n_orders",
            F.sum("daily_rev_d").over(w).cast("double").alias("revenue_7d"),
        )
        .orderBy("order_day")
    )


def customer_order_gaps(orders: DataFrame) -> DataFrame:
    """Per-customer inter-order gap statistics via LAG.

    Consecutive-date diffs over a per-customer window; gaps are exact ints,
    so avg = sum/count is one deterministic double division per customer."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"),
            F.to_date(F.lag("o_orderdate").over(w)),
        ).alias("gap_days"),
    )
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum("gap_days").cast("double")
             / F.count("gap_days")).alias("avg_gap_days"),
            F.max("gap_days").alias("max_gap_days"),
        )
    )


PIVOT_YEARS = [1995, 1996, 1997, 1998, 1999, 2000, 2001]


def nation_revenue_pivot(
    orders: DataFrame, customer: DataFrame, nation: DataFrame,
) -> DataFrame:
    """Nation × order-year revenue matrix via pivot with an explicit year
    list (single hash aggregate; empty cells stay NULL like conditional
    SUM over an empty set)."""
    cust = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("nation"))
    piv = (
        # cust grows with scale — no hint; AQE decides broadcast vs shuffle
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("nation")
        .pivot("o_year", PIVOT_YEARS)
        .agg(F.sum(_d("o_totalprice")).cast("double"))
    )
    return piv.select(
        "nation",
        *[F.col(str(y)).alias(f"y{y}") for y in PIVOT_YEARS],
    ).orderBy("nation")


def distributed_ntile(
    df: DataFrame, sort_exprs: list, n_buckets: int,
    out_col: str = "bucket",
) -> DataFrame:
    """EXACT NTILE without the single-partition global window: range-
    repartition on the sort key, sort within partitions, compute the tiny
    per-partition row counts in one job (the range shuffle is reused), and
    assign each row its global rank as broadcast-offset + local position
    inside ``mapInPandas``. Bucket sizes follow SQL NTILE exactly (the
    first ``n % k`` buckets take one extra row), so results are identical
    to ``ntile(k) OVER (ORDER BY ...)`` — but every stage is parallel and
    per-task memory is one partition, which is what makes exact ranking
    work on a 1000-executor corpus. The sort key must be a TOTAL order
    (include a unique tiebreaker) so ranks are partitioning-independent.

    Determinism: the tagged frame is pinned with
    ``localCheckpoint(eager=True)`` before the counts job —
    ``repartitionByRange`` samples boundaries with a per-execution seed,
    so a recompute between the counts job and the assign job could
    otherwise re-bucket rows and corrupt the broadcast offsets. The
    checkpoint materializes the partitions once (MEMORY_AND_DISK); an
    executor loss then fails loudly instead of silently re-sampling.
    Checkpoint size is the full input frame — rank over a pre-aggregated
    frame (as `customer_revenue_deciles` does), not the raw corpus.
    """
    from pyspark.sql import types as T

    tagged = (
        df.repartitionByRange(*sort_exprs)
        .sortWithinPartitions(*sort_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["__pid"]: r["count"]
        for r in tagged.groupBy("__pid").count().collect()
    }
    n_total = sum(counts.values())
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    r = n_total % n_buckets
    q = n_total // n_buckets
    bc = df.sparkSession.sparkContext.broadcast((offsets, r, q))
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.IntegerType())]
    )

    def assign(batches):
        offs, r_, q_ = bc.value
        local = 0
        for pdf in batches:
            if not len(pdf):
                continue
            pid = int(pdf["__pid"].iloc[0])
            start = offs[pid] + local
            local += len(pdf)
            import numpy as np

            ranks = np.arange(start + 1, start + len(pdf) + 1)
            if q_ == 0:  # fewer rows than buckets: bucket = rank
                buckets = ranks
            else:
                head = r_ * (q_ + 1)
                buckets = np.where(
                    ranks <= head,
                    (ranks - 1) // (q_ + 1) + 1,
                    r_ + (ranks - head - 1) // q_ + 1,
                )
            out = pdf.drop(columns="__pid")
            out[out_col] = buckets.astype("int32")
            yield out

    return tagged.mapInPandas(assign, schema=out_schema)


def customer_revenue_deciles(orders: DataFrame) -> DataFrame:
    """Customers bucketed into revenue deciles with per-decile counts and
    exact-decimal totals. NTILE semantics, computed with
    :func:`distributed_ntile` — exact at any |customers|, no
    single-partition sort tail (the round-2/3 'weak at 100×' finding on
    the plain global-window form)."""
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(_d("o_totalprice")).cast(DEC18).alias("revenue_d")
    )
    bucketed = distributed_ntile(
        per_cust,
        [F.col("revenue_d").desc(), F.col("o_custkey").asc()],
        10,
        out_col="decile",
    )
    return (
        bucketed.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("revenue_d").cast("double").alias("total_revenue"),
            F.min("revenue_d").cast("double").alias("min_revenue"),
        )
        .orderBy("decile")
    )


def customer_revenue_deciles_approx(
    orders: DataFrame, accuracy: int = 100000,
) -> DataFrame:
    """The 100 TB path for `customer_revenue_deciles`: instead of a global
    NTILE window (single-partition sort tail), compute 9 approx decile
    cutpoints of per-customer revenue with `percentile_approx` (mergeable
    sketch, one tiny 1-row frame), broadcast them, and bucket every customer
    with a JVM-side array scan — decile 1 = top revenue. Fully parallel:
    one shuffle for the per-customer aggregate, then narrow maps.
    Cutpoints are exact while distinct customers <= `accuracy`."""
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(_d("o_totalprice")).cast(DEC18).alias("revenue_d")
    )
    probs = [round(0.1 * i, 1) for i in range(1, 10)]
    cuts = per_cust.agg(
        F.expr(
            "percentile_approx(revenue_d, "
            f"array({', '.join(str(p) for p in probs)}), {accuracy})"
        ).alias("cuts")
    )
    # decile = 1 + number of cutpoints >= revenue (cuts ascending p10..p90)
    decile = (
        F.lit(1)
        + F.size(F.filter("cuts", lambda c: c >= F.col("revenue_d")))
    ).cast("int")
    return (
        per_cust.crossJoin(F.broadcast(cuts))
        .withColumn("decile", decile)
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("revenue_d").cast("double").alias("total_revenue"),
            F.min("revenue_d").cast("double").alias("min_revenue"),
        )
        .orderBy("decile")
    )


def customer_segments_setops(
    orders: DataFrame, year_a: int = 1995, year_b: int = 1996,
) -> DataFrame:
    """Year-over-year customer movement via set operations: retained
    (INTERSECT), lapsed (year A EXCEPT year B), acquired (B EXCEPT A).
    Inputs are distinct key sets, so the exchanges carry bare keys."""
    def keys(year: int) -> DataFrame:
        return (
            orders.where(F.year("o_orderdate") == year)
            .select("o_custkey").distinct()
        )

    a, b = keys(year_a), keys(year_b)
    segs = [
        ("retained", a.intersect(b)),
        ("lapsed", a.subtract(b)),
        ("acquired", b.subtract(a)),
    ]
    counted = [
        df.agg(F.count(F.lit(1)).alias("numcust"))
          .select(F.lit(name).alias("segment"), "numcust")
        for name, df in segs
    ]
    out = counted[0]
    for c in counted[1:]:
        out = out.unionByName(c)
    return out.orderBy("segment")


def purchase_click_attribution(
    events: DataFrame, window_minutes: int = 60,
) -> DataFrame:
    """Time-range join: for every purchase, count same-user clicks in the
    preceding ``window_minutes``. LEFT join keeps zero-click purchases.

    The join key is user_id (equi), the time range is a join-side filter —
    at scale this is one shuffle on user_id, and the per-user group is small
    enough that the range scan inside it is cheap."""
    purch = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    )
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    lo = F.col("p_ts") - F.expr(f"INTERVAL {int(window_minutes)} MINUTES")
    joined = purch.join(
        clicks,
        (F.col("p_user_id") == F.col("c_user_id"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= lo),
        "left",
    )
    return (
        joined.groupBy("p_event_id", "p_user_id", "p_ts")
        .agg(F.count("c_ts").alias("n_clicks_before"))
        .select(
            F.col("p_event_id").alias("event_id"),
            F.col("p_user_id").alias("user_id"),
            F.col("p_ts").alias("ts"),
            "n_clicks_before",
        )
    )


def revenue_concentration(orders: DataFrame) -> DataFrame:
    """Pareto view of customer-revenue concentration: bucket customers into
    revenue deciles (exact NTILE via :func:`distributed_ntile` — decile 1 =
    highest spenders) and report each decile's share of total revenue plus
    the running cumulative share ("the top 20% of customers carry X% of
    revenue").

    The ranking stage is the distributed exact NTILE (range shuffle +
    broadcast offsets — no single-partition sort even at 10^9 customers);
    everything after it runs on a 10-row aggregate, so the trailing
    cumulative window is free. Shares are formed by one double division of
    two exact decimal sums, so both engines divide the identical numbers.
    """
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(_d("o_totalprice")).cast(DEC18).alias("revenue_d")
    )
    bucketed = distributed_ntile(
        per_cust,
        [F.col("revenue_d").desc(), F.col("o_custkey").asc()],
        10,
        out_col="decile",
    )
    per_dec = bucketed.groupBy("decile").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum("revenue_d").cast(DEC18).alias("rev_d"),
    )
    # 10-row frame from here on: the global total and the running sum are
    # windows over the aggregate, not the customer set
    w_all = Window.partitionBy()
    w_cum = (
        Window.partitionBy().orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_dec.select(
            "decile", "numcust",
            F.col("rev_d").cast("double").alias("decile_revenue"),
            (
                F.col("rev_d").cast("double")
                / F.sum("rev_d").over(w_all).cast("double")
            ).alias("revenue_share"),
            (
                F.sum("rev_d").over(w_cum).cast("double")
                / F.sum("rev_d").over(w_all).cast("double")
            ).alias("cumulative_share"),
        )
        .orderBy("decile")
    )


def nation_revenue_unpivot(
    orders: DataFrame, customer: DataFrame, nation: DataFrame,
) -> DataFrame:
    """Round-trip of :func:`nation_revenue_pivot` back to long form with
    ``DataFrame.unpivot`` (SQL UNPIVOT / melt): one row per
    (nation, year) with the pivoted revenue value, NULL cells dropped —
    the normalization step that feeds BI tools expecting tidy frames.

    The unpivot itself is a narrow projection (each input row fans out to
    |years| rows with no exchange), so the plan cost is exactly the pivot's
    single hash aggregate.
    """
    wide = nation_revenue_pivot(orders, customer, nation)
    return (
        wide.unpivot(
            "nation",
            [f"y{y}" for y in PIVOT_YEARS],
            "year_label",
            "revenue",
        )
        .where(F.col("revenue").isNotNull())
        .select(
            "nation",
            F.substring("year_label", 2, 4).cast("int").alias("o_year"),
            "revenue",
        )
    )


def numeric_histogram(
    df: DataFrame, value_col: str, bin_width: float, round_to: int = 2,
) -> DataFrame:
    """Fixed-width histogram of a numeric column: one row per occupied bin
    with (bin_start, n, share). Bin assignment is ``floor(value / width) *
    width`` — identical IEEE arithmetic on every engine — and ``share`` is
    one double division of two exact longs, so the output is
    cross-engine hashable. A single map-side-combined aggregation over the
    scan: profiling a 100 TB column costs one narrow pass plus a
    |bins|-row exchange.
    """
    if not bin_width > 0:
        raise ValueError("bin_width must be positive")
    bin_start = F.round(
        F.floor(F.col(value_col) / F.lit(bin_width)) * F.lit(bin_width),
        round_to,
    )
    binned = df.where(F.col(value_col).isNotNull()).groupBy(
        bin_start.alias("bin_start")
    ).agg(F.count(F.lit(1)).alias("n"))
    w_all = Window.partitionBy()
    return binned.select(
        "bin_start", "n",
        (F.col("n").cast("double") / F.sum("n").over(w_all).cast("double"))
        .alias("share"),
    )


def monthly_revenue_growth(orders: DataFrame) -> DataFrame:
    """Month-over-month revenue: per-month exact decimal totals plus the
    previous month's total and the relative growth rate — the standard
    period-over-period KPI view. The lag/growth window runs over the
    month-grain aggregate (at most a few hundred rows for decades of
    data), so the single-partition window is bounded by construction, the
    same argument as ``rolling_revenue_7d``'s day grain."""
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(F.sum(_d("o_totalprice")).cast(DEC18).alias("rev_d"))
    w = Window.partitionBy().orderBy("month")
    prev = F.lag("rev_d").over(w)
    return monthly.select(
        "month",
        F.col("rev_d").cast("double").alias("revenue"),
        prev.cast("double").alias("prev_revenue"),
        (
            (F.col("rev_d").cast("double") - prev.cast("double"))
            / prev.cast("double")
        ).alias("growth"),
    )


def rfm_segments(orders: DataFrame) -> DataFrame:
    """Classic RFM customer segmentation: per-customer recency (days since
    last order, measured against the corpus max date so the result is
    reproducible), frequency (order count), and monetary (exact decimal
    revenue), each quartiled with :func:`distributed_ntile` (quartile 1 =
    best: most recent / most frequent / highest spend), plus the combined
    ``rfm`` code ("111" = champions, "444" = churned).

    Scale shape: one shuffle for the per-customer aggregate, then three
    exact distributed NTILE passes over that (already reduced) frame —
    each is the range-shuffle + broadcast-offset machinery, no
    single-partition sort anywhere. The corpus max date arrives via a
    broadcast 1-row frame, not a driver collect. Ties are broken by
    customer key so all three rankings are total orders (identical to the
    SQL NTILE the oracle runs).
    """
    max_d = orders.agg(F.max("o_orderdate").alias("max_d"))
    per_cust = (
        orders.crossJoin(F.broadcast(max_d))
        .groupBy("o_custkey")
        .agg(
            F.min(
                F.datediff(F.to_date("max_d"), F.to_date("o_orderdate"))
            ).alias("r_days"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_d("o_totalprice")).cast(DEC18).alias("revenue_d"),
        )
    )
    cur = distributed_ntile(
        per_cust,
        [F.col("r_days").asc(), F.col("o_custkey").asc()],
        4, out_col="r_q",
    )
    cur = distributed_ntile(
        cur,
        [F.col("n_orders").desc(), F.col("o_custkey").asc()],
        4, out_col="f_q",
    )
    cur = distributed_ntile(
        cur,
        [F.col("revenue_d").desc(), F.col("o_custkey").asc()],
        4, out_col="m_q",
    )
    return cur.select(
        "o_custkey", "r_days", "n_orders",
        F.col("revenue_d").cast("double").alias("revenue"),
        "r_q", "f_q", "m_q",
        F.concat(
            F.col("r_q").cast("string"), F.col("f_q").cast("string"),
            F.col("m_q").cast("string"),
        ).alias("rfm"),
    )


def cohort_ltv(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    max_age: int = 11,
) -> DataFrame:
    """Cohort LTV curve: customers grouped by FIRST-purchase month, and
    each cohort's cumulative revenue per customer tracked across the
    months since — the monetized retention curve (does month-3 value
    converge across cohorts? is a newer cohort tracking below an older
    one at the same age?) that payback-period decisions read.

    Plan: one window for each customer's cohort month (keyed on the
    customer — single shuffle), one (cohort, age) revenue aggregate in
    exact decimals, then a cumulative window over the cohort×age MODEL
    frame; cohort size joins back from a per-cohort distinct count.
    LTV = cumulative revenue / cohort size, micro-quantized.

    Returns one row per (cohort_month, age): (cohort_month, age,
    n_customers, revenue, cum_revenue, ltv), ages 0..``max_age``,
    ordered by (cohort_month, age).
    """
    from pyspark.sql import Window

    if max_age < 0:
        raise ValueError("max_age must be >= 0")
    w_first = Window.partitionBy(cust_col)
    base = orders.where(
        f"({cust_col}) IS NOT NULL AND ({ts_col}) IS NOT NULL "
        f"AND ({amount_col}) IS NOT NULL"
    ).select(
        F.col(cust_col).alias("__cust"),
        F.expr(f"date_trunc('month', CAST({ts_col} AS DATE))")
        .alias("__m"),
        F.expr(f"CAST({amount_col} AS DECIMAL(18,2))").alias("__amt"),
    ).withColumn(
        "__cohort", F.min("__m").over(
            Window.partitionBy("__cust"))
    ).withColumn(
        "__age",
        F.expr("CAST(months_between(__m, __cohort) AS INT)"),
    ).where(F.col("__age") <= max_age)
    sizes = base.groupBy(F.col("__cohort").alias("cohort_month")).agg(
        F.countDistinct("__cust").cast("long").alias("n_customers"))
    rev = base.groupBy(
        F.col("__cohort").alias("cohort_month"),
        F.col("__age").alias("age"),
    ).agg(F.sum("__amt").cast("decimal(18,2)").alias("__rev"))
    w_cum = Window.partitionBy("cohort_month").orderBy(
        F.col("age").asc()).rowsBetween(Window.unboundedPreceding, 0)
    return (
        rev.withColumn(
            "__cum", F.sum("__rev").over(w_cum).cast("decimal(18,2)"))
        .join(sizes, "cohort_month")
        .select(
            F.expr("CAST(cohort_month AS DATE)").alias("cohort_month"),
            "age", "n_customers",
            F.col("__rev").cast("double").alias("revenue"),
            F.col("__cum").cast("double").alias("cum_revenue"),
            F.expr(
                "CAST(round(CAST(__cum AS DOUBLE) "
                "/ nullif(CAST(n_customers AS DOUBLE), 0.0) "
                "* 1000000.0) AS BIGINT) / 1e6"
            ).cast("double").alias("ltv"),
        )
        .orderBy("cohort_month", "age")
    )


def abc_classes(
    df: DataFrame,
    key_col: str,
    value_col: str,
    dec: str = "decimal(18,2)",
) -> DataFrame:
    """ABC (Pareto) classification: keys ranked by value, class A =
    the head that carries the first 80% of cumulative value, B the
    next 15%, C the tail — the inventory/catalog triage behind "our
    top 12% of parts make 80% of revenue".

    One keyed aggregate to the key frame (exact decimal totals), then
    :func:`~..operators.stats.distributed_prefix_counts` for the exact
    decimal cumulative ordered (value desc, key asc) — the key frame
    is corpus-scale (every part/customer), so the running total must
    stay range-partitioned, never a global single-task window.  The
    class boundaries compare EXACT DECIMALS via integer
    cross-multiplication (``cum·5 <= total·4`` for 80%, ``cum·20 <=
    total·19`` for 95%) — no float share ever decides a boundary.
    Returns one row per class: (abc_class, n_keys, value_total,
    value_share, key_share), ordered by class.
    """
    from .stats import distributed_prefix_counts

    per_key = (
        df.where(f"({key_col}) IS NOT NULL AND ({value_col}) IS NOT NULL")
        .groupBy(F.expr(f"CAST(({key_col}) AS STRING)").alias("key"))
        .agg(F.expr(f"CAST(sum(CAST(({value_col}) AS {dec})) AS {dec})")
             .alias("__v"))
    )
    cum, totals = distributed_prefix_counts(
        per_key.withColumn("__one", F.lit(1).cast("long")),
        [F.col("__v").desc(), F.col("key").asc()],
        ["__v", "__one"],
    )
    tagged = cum.select(
        "key", "__v",
        F.col("__cum___v").alias("__cum"),
        F.lit(totals["__v"]).cast(
            cum.schema["__cum___v"].dataType.simpleString()
        ).alias("__tot"),
        F.lit(totals["__one"]).cast("long").alias("__k"),
    ).withColumn(
        "abc_class",
        F.expr(
            "CASE WHEN __cum * 5 <= __tot * 4 THEN 'A' "
            "WHEN __cum * 20 <= __tot * 19 THEN 'B' ELSE 'C' END"
        ),
    )
    return (
        tagged.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.expr("CAST(sum(__v) AS DOUBLE)").alias("value_total"),
            F.expr(
                "CAST(round(CAST(sum(__v) AS DOUBLE) "
                "/ nullif(CAST(max(__tot) AS DOUBLE), 0.0) "
                "* 1000000.0) AS BIGINT) / 1e6"
            ).cast("double").alias("value_share"),
            F.expr(
                "CAST(round(CAST(count(*) AS DOUBLE) "
                "/ nullif(CAST(max(__k) AS DOUBLE), 0.0) "
                "* 1000000.0) AS BIGINT) / 1e6"
            ).cast("double").alias("key_share"),
        )
        .orderBy("abc_class")
    )


def fulfillment_sla(
    orders: DataFrame,
    lineitem: DataFrame,
    sla_days: list[int] | None = None,
) -> DataFrame:
    """Order-fulfillment SLA report: the lag from order date to the
    order's FIRST shipment, summarized per priority class as the share
    fulfilled within each SLA window — the logistics scorecard
    ("94% of urgent orders ship within 7 days") behind every
    operations review.

    One keyed aggregate on lineitem for each order's first ship date
    (the fact table collapses before the join — the join carries one
    row per order, not per line), one equi-join to orders, then a
    priority-level conditional aggregate.  Day lags are exact integer
    datediffs; shares micro-quantized.  Returns one row per priority:
    (priority, n_orders, avg_lag_days, within_<d>d shares...).
    """
    sla_days = sorted(set(sla_days or [7, 14, 30]))
    if not sla_days or sla_days[0] < 1:
        raise ValueError("sla_days must be positive")
    first_ship = lineitem.groupBy(
        F.col("l_orderkey").alias("__ok")
    ).agg(F.min("l_shipdate").alias("__ship"))
    lagged = orders.join(
        first_ship, orders["o_orderkey"] == first_ship["__ok"]
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.expr("datediff(CAST(__ship AS DATE), "
               "CAST(o_orderdate AS DATE))").alias("__lag"),
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.expr(
            "CAST(round(CAST(sum(__lag) AS DOUBLE) "
            "/ nullif(CAST(count(*) AS DOUBLE), 0.0) * 1000000.0) "
            "AS BIGINT) / 1e6"
        ).cast("double").alias("avg_lag_days"),
    ]
    for d in sla_days:
        aggs.append(
            F.expr(
                f"CAST(round(CAST(sum(CASE WHEN __lag <= {d} THEN 1 "
                "ELSE 0 END) AS DOUBLE) "
                "/ nullif(CAST(count(*) AS DOUBLE), 0.0) "
                "* 1000000.0) AS BIGINT) / 1e6"
            ).cast("double").alias(f"within_{d}d")
        )
    return lagged.groupBy("priority").agg(*aggs).orderBy("priority")


def gini_coefficient(
    df: DataFrame, value_col: str,
) -> DataFrame:
    """Gini coefficient of a non-negative value column — THE
    inequality number (0 = everyone equal, →1 = one row holds
    everything), the scalar behind the Lorenz curve that
    :func:`revenue_concentration` draws::

        G = 2·Σ_i i·x_(i) / (n·Σx) − (n+1)/n

    Ties collapse exactly: a tied block of ``t`` equal values starting
    after ``b`` rows contributes ``x·(t·b + t(t+1)/2)`` whatever order
    the block takes, so the whole statistic computes from the
    DISTINCT-VALUE frame — and the prefix counts behind ``b`` come
    from :func:`~..operators.stats.distributed_prefix_counts`
    (range-partitioned offset-rank idiom), so there is no global
    per-row sort AND no global single-task window even when the value
    column is continuous and distinct ≈ corpus.  Per-value terms
    quantize at unit scale (micro would overflow at rank·value ~ 1e15)
    before the exact integer sum; G is one fixed-order double
    micro-quantized.  Returns one row: (n, total, gini).
    """
    from .stats import distributed_prefix_counts

    vals = (
        df.where(f"({value_col}) IS NOT NULL AND ({value_col}) >= 0")
        .groupBy(F.expr(f"CAST(({value_col}) AS DOUBLE)").alias("x"))
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    staged, _ = distributed_prefix_counts(vals, "x", ["t"])
    staged = staged.select("x", "t", F.col("__before_t").alias("b"))
    m = staged.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.expr(
            "CAST(round(x * (CAST(t AS DOUBLE) * CAST(b AS DOUBLE) "
            "+ CAST(t AS DOUBLE) * (CAST(t AS DOUBLE) + 1.0) / 2.0)) "
            "AS BIGINT)"
        )).cast("long").alias("__rx_unit"),
        F.sum(F.expr(
            "CAST(round(x * CAST(t AS DOUBLE) * 1000000.0) AS BIGINT)"
        )).cast("long").alias("__sx_micro"),
    )
    g = ("(2.0 * CAST(__rx_unit AS DOUBLE) "
         "/ nullif(CAST(n AS DOUBLE) "
         "* (CAST(__sx_micro AS DOUBLE) / 1000000.0), 0.0) "
         "- (CAST(n AS DOUBLE) + 1.0) / nullif(CAST(n AS DOUBLE), 0.0))")
    return m.select(
        "n",
        F.expr(
            "round(CAST(__sx_micro AS DOUBLE) / 1000000.0, 4)"
        ).alias("total"),
        F.expr(f"CAST(round(({g}) * 1000000.0) AS BIGINT) / 1e6")
        .cast("double").alias("gini"),
    )


def theil_index(
    df: DataFrame, value_col: str, group_col: str | None = None,
) -> DataFrame:
    """Theil T inequality index — the entropy-based sibling of
    :func:`gini_coefficient` whose superpower is EXACT DECOMPOSITION:
    with a ``group_col``, total inequality splits additively into
    between-group and within-group components (how much of spend
    inequality is ACROSS regions vs INSIDE them — Gini cannot say)::

        T = (1/n) Σ (x_i/μ) ln(x_i/μ) = T_between + T_within

    Positive values only (x = 0 contributes 0 by the standard limit).
    One scan to the distinct-(group,) value frame; each value's
    ``(x/μ)·ln(x/μ)`` term quantizes to nanos (ln discipline) and
    sums exactly; μ comes from the same frame's exact sums.  Returns
    ONE row: (n, theil_total, theil_between, theil_within) — the
    between/within columns NULL when no group is given.
    """
    gexpr = (F.expr(f"CAST(({group_col}) AS STRING)") if group_col
             else F.lit("_all"))
    vals = (
        df.where(f"({value_col}) IS NOT NULL AND ({value_col}) > 0")
        .groupBy(
            gexpr.alias("g"),
            F.expr(f"CAST(({value_col}) AS DOUBLE)").alias("x"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .localCheckpoint(eager=True)
    )
    tot = vals.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.expr(
            "CAST(round(x * CAST(t AS DOUBLE) * 1000.0) AS BIGINT)"
        )).cast("long").alias("__sx_milli"),
    )
    mu = "(CAST(__sx_milli AS DOUBLE) / 1000.0 / CAST(n AS DOUBLE))"
    total = vals.crossJoin(F.broadcast(tot)).agg(
        F.max("n").alias("n"),
        F.sum(F.expr(
            f"CAST(round(CAST(t AS DOUBLE) * (x / {mu}) "
            f"* ln(x / {mu}) * 1000000000.0) AS BIGINT)"
        )).cast("long").alias("__tt_nano"),
    )
    if group_col is None:
        return total.select(
            "n",
            F.expr(
                "CAST(round(CAST(__tt_nano AS DOUBLE) / 1000000000.0 "
                "/ nullif(CAST(n AS DOUBLE), 0.0) * 1000000.0) "
                "AS BIGINT) / 1e6"
            ).cast("double").alias("theil_total"),
            F.lit(None).cast("double").alias("theil_between"),
            F.lit(None).cast("double").alias("theil_within"),
        )
    grp = vals.groupBy("g").agg(
        F.sum("t").cast("long").alias("n_g"),
        F.sum(F.expr(
            "CAST(round(x * CAST(t AS DOUBLE) * 1000.0) AS BIGINT)"
        )).cast("long").alias("__sg_milli"),
    )
    mug = "(CAST(__sg_milli AS DOUBLE) / 1000.0 / CAST(n_g AS DOUBLE))"
    between = grp.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.expr(
            f"CAST(round(CAST(n_g AS DOUBLE) * ({mug} / {mu}) "
            f"* ln({mug} / {mu}) * 1000000000.0) AS BIGINT)"
        )).cast("long").alias("__tb_nano"),
        F.max("n").alias("__n2"),
    )
    t_tot = ("(CAST(__tt_nano AS DOUBLE) / 1000000000.0 "
             "/ nullif(CAST(n AS DOUBLE), 0.0))")
    t_bet = ("(CAST(__tb_nano AS DOUBLE) / 1000000000.0 "
             "/ nullif(CAST(__n2 AS DOUBLE), 0.0))")
    return total.crossJoin(between).select(
        "n",
        F.expr(f"CAST(round(({t_tot}) * 1000000.0) AS BIGINT) / 1e6")
        .cast("double").alias("theil_total"),
        F.expr(f"CAST(round(({t_bet}) * 1000000.0) AS BIGINT) / 1e6")
        .cast("double").alias("theil_between"),
        F.expr(
            f"CAST(round((({t_tot}) - ({t_bet})) * 1000000.0) "
            "AS BIGINT) / 1e6"
        ).cast("double").alias("theil_within"),
    )
