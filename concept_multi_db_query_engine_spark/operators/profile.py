"""Table profiling: per-column null counts, exact distinct cardinalities,
and min/max ranges in one union-of-aggregates plan — the "what is in this
table" first query of any data-engineering engagement.

Reference behavior source: the spec's meta/debug execute modes expose
schema-level metadata only (EXECUTION_MODES.md); column-level profiling is
part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "integer", "bigint", "long",
            "float", "double"}


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact: bool = True,
) -> DataFrame:
    """One row per profiled column: (col_name, n_rows, n_null, n_distinct,
    min_num, max_num, min_str, max_str). Numeric columns fill the ``_num``
    pair (cast to double); string columns the lexicographic ``_str`` pair;
    other types profile nulls/distincts only. ``n_distinct`` is exact and
    excludes NULL (both engines' ``count(DISTINCT c)`` semantics).

    Plan shape: one single-row aggregate per column, unioned. With columnar
    sources each branch's scan prunes to that one column, so the union of
    k branches reads ~the same bytes as one k-column scan while keeping
    every aggregate map-side combined — no Expand-based multi-distinct
    blow-up (which would multiply the shuffle by k). Exact distincts
    shuffle one value-keyed row per distinct value per column; swap in
    ``approx_count_distinct`` upstream if a 100 TB profile only needs
    cardinality estimates.

    ``exact=False`` swaps the distinct counts for ``approx_count_distinct``
    (HLL++, 1% rsd) — the 100 TB profile: every aggregate becomes a
    fixed-size mergeable sketch, so the per-branch shuffle carries one
    register set per partition instead of one row per distinct value.
    """
    types = dict(df.dtypes)
    cols = columns if columns is not None else df.columns
    branches = []
    for c in cols:
        t = types[c]
        is_num = t in _NUMERIC or t.startswith("decimal")
        is_str = t == "string"
        branches.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(c).isNull().cast("long")).alias("n_null"),
                (F.countDistinct(c) if exact
                 else F.approx_count_distinct(c, 0.01))
                .alias("n_distinct"),
                (F.min(c).cast("double") if is_num
                 else F.lit(None).cast("double")).alias("min_num"),
                (F.max(c).cast("double") if is_num
                 else F.lit(None).cast("double")).alias("max_num"),
                (F.min(c) if is_str
                 else F.lit(None).cast("string")).alias("min_str"),
                (F.max(c) if is_str
                 else F.lit(None).cast("string")).alias("max_str"),
            ).select(F.lit(c).alias("col_name"), "*")
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier columns: the
    size of every equivalence class (rows sharing all quasi values) and
    whether it violates the k threshold — the data-governance companion
    to the masking/ACL surface (a masked export is only private if no
    quasi-identifier combination isolates fewer than k individuals;
    Sweeney 2002).

    ONE hash aggregation on the quasi tuple (map-side combined counts —
    the same shape as any GROUP BY, skew handled by AQE); no windows,
    no driver state. At 100 TB the class count is bounded by the quasi
    domain product, not the row count. Returns one row per equivalence
    class: (*quasi_cols, class_size, at_risk).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
        .withColumn("at_risk", F.col("class_size") < F.lit(k))
    )
