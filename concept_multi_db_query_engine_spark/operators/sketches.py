"""Sketch-based approximate operators.

Spark's built-in sketches (``approx_count_distinct`` HLL++,
``approx_percentile``) are the production scale path, but their internals
are engine-specific — no other engine reproduces their exact outputs, so
they can't be value-checked against a SQL oracle. The KMV (k-minimum-values)
distinct sketch here is built from *deterministic* primitives (md5 → 60-bit
uniform hash) as a composition of DataFrame ops, so DuckDB computes the
bit-identical estimate — an oracle-checkable approximate operator.

KMV (Bar-Yossef et al. 2002): hash every distinct value to (0,1); if m_k is
the k-th smallest hash, |distinct| ≈ (k-1)/m_k (unbiased for uniform
hashes; relative error ~1/sqrt(k-2)).

Scale notes: the distinct-hash aggregation is map-side partial (Spark emits
per-partition distinct before the exchange), and the ordered ``limit(k)``
compiles to TakeOrderedAndProject — per-partition top-k heaps merged once,
never a global sort. At 100 TB the exchange carries at most
``k × n_partitions`` 8-byte hashes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex digits = 60 bits: fits a signed long exactly, and the /2^60
# normalization is a power-of-two scale (no rounding beyond the initial
# int→double conversion, which both engines round identically)
_HASH_BITS = 60


def _uniform_hash(col) -> Column:
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
        .cast("double")
        / F.lit(float(1 << _HASH_BITS))
    )


def approx_distinct_kmv(df: DataFrame, column: str, k: int = 256) -> DataFrame:
    """KMV distinct-count estimate for ``column``.

    Returns one row: (approx_distinct, k_used, max_h). When the true
    distinct count is below ``k``, k_used < k and the caller can read the
    exact count off k_used directly (the estimate degrades; standard KMV
    practice is to use k_used when k_used < k).

    NULLs are excluded BEFORE hashing — md5(NULL) is a NULL hash that
    would survive distinct() and occupy a k-min slot (Spark sorts NULLS
    FIRST ascending), silently inflating k_used by one; filtering keeps
    the sketch aligned with COUNT(DISTINCT ...) semantics and with the
    streaming twin (``kmv_distinct_stream``), which skips NULLs."""
    hashes = (
        df.where(F.col(column).isNotNull())
        .select(_uniform_hash(F.col(column)).alias("h")).distinct()
    )
    kmin = hashes.orderBy("h").limit(k)
    return kmin.agg(
        F.round(F.lit(k - 1) / F.max("h"), 4).alias("approx_distinct"),
        F.count(F.lit(1)).alias("k_used"),
        F.round(F.max("h"), 6).alias("max_h"),
    )


def kmv_oracle_sql(table: str, column: str, k: int = 256) -> str:
    """The DuckDB twin of :func:`approx_distinct_kmv` (identical formula —
    the estimate itself is value-checked, not just the row count)."""
    h = (
        f"CAST(('0x' || substr(md5(CAST({column} AS VARCHAR)), 1, 15)) "
        f"AS UBIGINT) / CAST(1152921504606846976 AS DOUBLE)"
    )
    return f"""
WITH hashes AS (SELECT DISTINCT {h} AS h FROM {table}
                WHERE {column} IS NOT NULL),
kmin AS (SELECT h FROM hashes ORDER BY h LIMIT {k})
SELECT round({k - 1} / max(h), 4) AS approx_distinct,
       count(*) AS k_used,
       round(max(h), 6) AS max_h
FROM kmin
"""


def distinct_sketch_comparison(
    df: DataFrame, column: str, k: int = 256, rsd: float = 0.05,
) -> DataFrame:
    """KMV vs Spark-native HLL++ vs exact, side by side — the calibration
    query for choosing a production sketch (HLL++ is the 100 TB default:
    fixed-size state, mergeable; KMV is the cross-engine-reproducible one).
    No SQL oracle (HLL++ internals are Spark-specific)."""
    kmv = approx_distinct_kmv(df, column, k).select(
        F.col("approx_distinct").alias("kmv_estimate")
    )
    native = df.agg(
        F.approx_count_distinct(column, rsd).alias("hll_estimate"),
        F.countDistinct(column).alias("exact"),
    )
    return native.crossJoin(F.broadcast(kmv)).select(
        "exact", "hll_estimate", "kmv_estimate"
    )


def distinct_kmv_vs_exact(
    df: DataFrame, column: str, k: int = 256,
) -> DataFrame:
    """The oracle-checkable core of :func:`distinct_sketch_comparison`:
    KMV estimate next to the exact distinct count (no HLL++ column — HLL++
    internals are Spark-specific, so that column lives only in the
    tolerance-tested full comparison). Both sides of the value check are
    deterministic md5-derived arithmetic."""
    kmv = approx_distinct_kmv(df, column, k).select(
        F.col("approx_distinct").alias("kmv_estimate")
    )
    exact = df.agg(F.countDistinct(column).alias("exact"))
    return exact.crossJoin(F.broadcast(kmv)).select("exact", "kmv_estimate")


def kmv_vs_exact_oracle_sql(table: str, column: str, k: int = 256) -> str:
    """DuckDB twin of :func:`distinct_kmv_vs_exact`."""
    h = (
        f"CAST(('0x' || substr(md5(CAST({column} AS VARCHAR)), 1, 15)) "
        f"AS UBIGINT) / CAST(1152921504606846976 AS DOUBLE)"
    )
    return f"""
WITH hashes AS (SELECT DISTINCT {h} AS h FROM {table}
                WHERE {column} IS NOT NULL),
kmin AS (SELECT h FROM hashes ORDER BY h LIMIT {k})
SELECT (SELECT count(DISTINCT {column}) FROM {table}) AS exact,
       (SELECT round({k - 1} / max(h), 4) FROM kmin) AS kmv_estimate
"""


def kmv_set_resemblance(
    df_a: DataFrame, df_b: DataFrame, column: str, k: int = 256,
) -> DataFrame:
    """Approximate Jaccard / union / intersection between two sides'
    value sets from their KMV sketches (Beyer et al.'s set-operation
    estimators): with M the k smallest hashes of Sa ∪ Sb,
    ρ = |M ∩ Sa ∩ Sb| / |M| estimates J(A,B), and |A∪B| comes from M's
    k-th minimum — so corpus-overlap questions ("how much of yesterday's
    crawl is in today's?") cost two sketch scans instead of a
    distinct-join, and the sketches are mergeable across partitions and
    days. Deterministic md5 hashing keeps the estimate value-checkable
    cross-engine like :func:`approx_distinct_kmv`; when the union has
    fewer than k distinct values the sketch is the whole set and the
    union estimate switches to the exact ``k_used``.

    Scale: each side reduces to distinct hashes (map-side partial) and a
    TakeOrderedAndProject top-k; every frame after that holds ≤ k rows.
    Returns one row: (k_used, n_both, jaccard_est, union_est,
    intersect_est).
    """

    def _sketch(df: DataFrame) -> DataFrame:
        # NULLs out before hashing — same rationale as
        # :func:`approx_distinct_kmv` (a NULL hash sorts first and
        # would steal a k-min slot)
        return (
            df.where(F.col(column).isNotNull())
            .select(_uniform_hash(F.col(column)).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(k)
        )

    # PIN all three <= k-row sketch frames: sa/sb feed the union AND
    # the semi-joins, m feeds the semi-join chain AND its own stats —
    # un-pinned, each reference re-scanned the corpus side (6 scans)
    sa, sb = (
        _sketch(df_a).localCheckpoint(eager=False),
        _sketch(df_b).localCheckpoint(eager=False),
    )
    m = sa.unionByName(sb).distinct().orderBy("h").limit(k) \
        .localCheckpoint(eager=False)
    both = m.join(sa, "h", "semi").join(sb, "h", "semi")
    stats_m = m.agg(
        F.count(F.lit(1)).alias("k_used"), F.max("h").alias("max_h")
    )
    n_both = both.agg(F.count(F.lit(1)).alias("n_both"))
    union_est = (
        f"(CASE WHEN k_used < {k} THEN CAST(k_used AS DOUBLE) "
        f"ELSE {k - 1} / max_h END)"
    )
    rho = "(CAST(n_both AS DOUBLE) / nullif(CAST(k_used AS DOUBLE), 0.0d))"
    return stats_m.crossJoin(n_both).select(
        "k_used",
        "n_both",
        F.expr(f"round({rho}, 4)").alias("jaccard_est"),
        F.expr(f"round({union_est}, 4)").alias("union_est"),
        F.expr(f"round({rho} * {union_est}, 4)").alias("intersect_est"),
    )


def kmv_resemblance_oracle_sql(
    table_a_where: str, table_b_where: str, column: str,
    table: str, k: int = 256,
) -> str:
    """DuckDB twin of :func:`kmv_set_resemblance` for two filtered views
    of one table (identical hash, selection, and estimator text)."""
    h = (
        f"CAST(('0x' || substr(md5(CAST({column} AS VARCHAR)), 1, 15)) "
        f"AS UBIGINT) / CAST(1152921504606846976 AS DOUBLE)"
    )
    union_est = (
        f"(CASE WHEN k_used < {k} THEN CAST(k_used AS DOUBLE) "
        f"ELSE {k - 1} / max_h END)"
    )
    rho = "(CAST(n_both AS DOUBLE) / nullif(CAST(k_used AS DOUBLE), 0.0))"
    return f"""
WITH sa AS (
  SELECT h FROM (SELECT DISTINCT {h} AS h FROM {table}
                 WHERE ({table_a_where}) AND {column} IS NOT NULL)
  ORDER BY h LIMIT {k}
),
sb AS (
  SELECT h FROM (SELECT DISTINCT {h} AS h FROM {table}
                 WHERE ({table_b_where}) AND {column} IS NOT NULL)
  ORDER BY h LIMIT {k}
),
m AS (
  SELECT h FROM (SELECT DISTINCT h FROM (
    SELECT h FROM sa UNION ALL SELECT h FROM sb))
  ORDER BY h LIMIT {k}
),
st AS (SELECT CAST(count(*) AS BIGINT) AS k_used, max(h) AS max_h FROM m),
nb AS (
  SELECT CAST(count(*) AS BIGINT) AS n_both FROM m
  WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb)
)
SELECT k_used, n_both,
  round({rho}, 4) AS jaccard_est,
  round({union_est}, 4) AS union_est,
  round({rho} * {union_est}, 4) AS intersect_est
FROM st CROSS JOIN nb
"""


def _cms_hash(key_col: str, depth: int, width: int, salt: str) -> str:
    return (
        f"CAST(conv(substring(md5(concat(CAST({key_col} AS STRING), "
        f"':{salt}:', CAST(j AS STRING))), 1, 15), 16, 10) AS BIGINT) "
        f"% {width}"
    )


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Just the ``depth × width`` count-min counter frame
    (j, bucket, c) for ``df[key_col]`` — the mergeable half of
    :func:`count_min_estimates`: sketches of disjoint row sets (other
    partitions, other micro-batches, other days) combine by summing
    counters on (j, bucket), which is what makes CMS the streaming /
    incremental frequency summary."""
    if depth < 1 or width < 1:
        raise ValueError("need depth >= 1 and width >= 1")
    h = _cms_hash(key_col, depth, width, salt)
    cells = df.select(
        F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("j"),
        F.col(key_col),
    ).select("j", F.expr(h).alias("bucket"))
    return cells.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def count_min_estimates(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) built and probed
    in one query — the bounded-memory frequency summary for heavy-hitter
    monitoring: the sketch is ``depth × width`` counters regardless of key
    cardinality, mergeable across partitions/streams (counter-wise sums),
    and every estimate is an OVERCOUNT (min over depth rows bounds the
    collision error at ~2N/width with probability 1−2^−depth).

    Hashing is the repo's md5 discipline (``md5(key:salt:row) % width`` —
    engine-reproducible, no RNG).  Build: each row emits its ``depth``
    (row, bucket) cells via one explode, and a map-side-combined groupBy
    reduces them to the d·w sketch — shuffle volume is d·w per partition,
    never per row.  Probe: the distinct keys join their cells against the
    sketch (broadcast: the sketch IS tiny) and take the min.  The exact
    count rides along, so the result doubles as a sketch-quality report
    (the ``distinct_sketch_comparison`` convention).  Returns
    (key, exact_count, cms_estimate, overcount).
    """
    if depth < 1 or width < 1:
        raise ValueError("need depth >= 1 and width >= 1")
    h = _cms_hash(key_col, depth, width, salt)
    sketch = count_min_sketch(df, key_col, depth, width, salt)
    keys = df.groupBy(F.col(key_col)).agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    probes = keys.select(
        key_col, "exact_count",
        F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("j"),
    ).select(key_col, "exact_count", "j", F.expr(h).alias("bucket"))
    est = (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy(key_col, "exact_count")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return est.select(
        key_col, "exact_count", "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count")).alias("overcount"),
    )


def sliding_distinct_kmv(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_days: int = 7,
    k: int = 64,
) -> DataFrame:
    """Rolling N-day distinct-key estimate from mergeable KMV sketches —
    the bounded-memory twin of ``rolling_active_users``: at 100 TB the
    exact form shuffles N·|daily-distinct| (day, key) rows, while the
    sketch form carries at most k hashes per (day) after per-partition
    pruning, and day-level sketches merge associatively (min-k of a
    union), which is what makes the metric incremental across days and
    streams.

    Shape: distinct (day, hash) reduction (map-side combined), explode
    each day's hashes into the N window days they cover (the
    ``rolling_active_users`` explode-not-range-join discipline, clipped
    to observed days), then per window day keep the k smallest hashes —
    a row_number window Spark plans with WindowGroupLimit, so the
    exchange carries ≤ k rows per (partition, day).  The estimate is
    the standard KMV rule ((k−1)/max_h, or the exact k_used when the
    union holds fewer than k hashes).  The EXACT distinct count rides
    along from the same contrib frame (the sketch-calibration
    convention of ``distinct_sketch_comparison``).  Deterministic md5
    hashing end to end — the estimate itself is oracle-checkable.
    Returns (day, exact_distinct, k_used, approx_distinct).
    """
    if window_days < 1 or k < 2:
        raise ValueError("need window_days >= 1 and k >= 2")
    daily = events.select(
        F.date_trunc("day", F.col(ts_col)).alias("day"),
        _uniform_hash(F.col(key_col)).alias("h"),
    ).distinct()
    days = daily.select("day").distinct()
    contrib = daily.select(
        F.explode(
            F.expr(
                f"sequence(day, day + interval {window_days - 1} days, "
                "interval 1 day)"
            )
        ).alias("wday"),
        "h",
    ).join(days, F.col("wday") == F.col("day"), "semi")
    from pyspark.sql import Window

    w = Window.partitionBy("wday").orderBy(F.col("h").asc())
    kmin = (
        contrib.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
    )
    sketch = kmin.groupBy("wday").agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("max_h"),
    )
    exact = contrib.groupBy("wday").agg(
        F.countDistinct("h").alias("exact_distinct")
    )
    return (
        exact.join(sketch, "wday")
        .select(
            F.col("wday").alias("day"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            F.col("k_used").cast("long").alias("k_used"),
            F.expr(
                f"round(CASE WHEN k_used < {k} "
                f"THEN CAST(k_used AS DOUBLE) "
                f"ELSE {k - 1} / max_h END, 4)"
            ).alias("approx_distinct"),
        )
    )


def cms_join_size(
    df_a: DataFrame,
    df_b: DataFrame,
    column: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Sketch-based equi-join CARDINALITY estimate (the AGMS /
    Cormode-Muthukrishnan inner-product estimator): with per-side
    count-min sketches A and B, ``Σ_j A[d][j]·B[d][j]`` overestimates
    ``|A ⋈ B| = Σ_v f_A(v)·f_B(v)`` for every depth row, and the MIN
    over rows is the classic join-size estimate — the number a planner
    needs BEFORE deciding broadcast-vs-shuffle or warning about an
    exploding join, at d·w counters per side instead of a key shuffle.

    Both sketches hash with the repo's md5 discipline, so the estimate
    is engine-reproducible and the SQL oracle replays it exactly; the
    arithmetic is exact BIGINT throughout.  The exact join size rides
    along (computed from per-key counts — two keyed aggregations, still
    never the join itself), making the row a sketch-quality report like
    ``distinct_sketch_comparison``.  Returns ONE row: (est_join_size,
    exact_join_size, overcount_ratio).
    """
    fa = df_a.groupBy(F.col(column).alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("f"))
    fb = df_b.groupBy(F.col(column).alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("f"))

    def _sketch(freqs: DataFrame) -> DataFrame:
        # identical counters to hashing every raw row, at |distinct
        # keys| x depth md5 calls instead of |rows| x depth — the keyed
        # count frame exists anyway for the exact report, and at scale
        # hashing cost must follow key cardinality, not row count
        h = _cms_hash("v", depth, width, salt)
        return (
            freqs.select(
                F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("j"),
                "v", "f",
            )
            .select("j", F.expr(h).alias("bucket"), "f")
            .groupBy("j", "bucket")
            .agg(F.sum("f").cast("long").alias("c"))
        )

    per_row = (
        _sketch(fa).select("j", "bucket", F.col("c").alias("ca"))
        .join(_sketch(fb).select("j", "bucket", F.col("c").alias("cb")),
              ["j", "bucket"])
        .groupBy("j")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("ip"))
    )
    # empty-overlap guards: no shared buckets → MIN over nothing, no
    # shared keys → SUM over nothing; both are 0 joins, not NULLs
    est = per_row.agg(
        F.coalesce(F.min("ip"), F.lit(0)).cast("long")
        .alias("est_join_size"))
    exact = (
        fa.select("v", F.col("f").alias("fa"))
        .join(fb.select("v", F.col("f").alias("fb")), "v")
        .agg(F.coalesce(F.sum(F.col("fa") * F.col("fb")), F.lit(0))
             .cast("long").alias("exact_join_size"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "est_join_size", "exact_join_size",
        F.expr(
            "round(CAST(est_join_size AS DOUBLE) "
            "/ nullif(CAST(exact_join_size AS DOUBLE), 0.0d), 4)"
        ).alias("overcount_ratio"),
    )
