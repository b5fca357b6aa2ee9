"""Skew mitigation utilities.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Manual salting remains
the right tool in two cases AQE can't fix: (a) a skewed GROUP BY (AQE splits
join partitions, not aggregation keys), and (b) a skewed join where the
runtime stats arrive too late (first run of a recurring job). These helpers
implement both in their standard two-phase form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys sprayed across ``n_salts``
    sub-keys and the right side replicated once per salt.

    Correct for any key distribution (each left row meets every copy of its
    right partner exactly once — its own salt's copy); the shuffle carries
    (key, salt) so a hot key occupies n_salts partitions instead of one.
    Cost: right side is duplicated n_salts x — use for dimension-sized right
    sides under a skewed fact key, and pick n_salts ≈ hot-key rows / normal
    partition size.
    """
    salt_l = left.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    salts = left.sparkSession.range(n_salts).select(
        F.col("id").alias("__salt")
    )
    salt_r = right.crossJoin(F.broadcast(salts))
    out = salt_l.join(salt_r, [key, "__salt"], how)
    return out.drop("__salt")


def salted_count_by_key(
    df: DataFrame, key: str | Column, n_salts: int = 16,
    agg_alias: str = "n",
) -> DataFrame:
    """Two-phase skewed GROUP BY count: first aggregate on (key, salt) —
    spreading a hot key over n_salts reducers — then re-aggregate partials
    on key alone. The second shuffle carries at most n_salts rows per key.
    (Spark's map-side partial aggregation already does this when upstream
    partitioning is random; the explicit form is needed when the input is
    ALREADY hash-partitioned by the hot key, e.g. right after a join on it.)
    """
    keycol = F.col(key) if isinstance(key, str) else key
    phase1 = (
        df.withColumn(
            "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
        )
        .groupBy(keycol.alias("__k"), F.col("__salt"))
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return (
        phase1.groupBy(F.col("__k").alias(key if isinstance(key, str) else "key"))
        .agg(F.sum("__partial").alias(agg_alias))
    )
