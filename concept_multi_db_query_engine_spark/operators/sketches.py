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
    practice is to use k_used when k_used < k)."""
    hashes = df.select(_uniform_hash(F.col(column)).alias("h")).distinct()
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
WITH hashes AS (SELECT DISTINCT {h} AS h FROM {table}),
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
WITH hashes AS (SELECT DISTINCT {h} AS h FROM {table}),
kmin AS (SELECT h FROM hashes ORDER BY h LIMIT {k})
SELECT (SELECT count(DISTINCT {column}) FROM {table}) AS exact,
       (SELECT round({k - 1} / max(h), 4) FROM kmin) AS kmv_estimate
"""
