"""Bucketed (co-located) join utilities — the shuffle-elimination path for
repeated big-big joins at 100 TB.

Spark's bucketed tables pre-hash-partition data on the join key at WRITE
time; a join between two tables bucketed on the same key with the same
bucket count runs as a zip of matching buckets — `SortMergeJoin` with NO
`Exchange` on either side. For a fact table joined on the same key by many
queries a day, this converts every query's largest shuffle into a free scan
property. (Same mechanism as Hive bucketing; Iceberg/Delta expose it as
hash-partition transforms.)

These helpers wrap `bucketBy().sortBy().saveAsTable()` (bucketing metadata
lives in the session catalog — plain `.parquet()` writes cannot carry it)
and assert the no-exchange property so tests and plan audits can rely on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    *,
    overwrite: bool = True,
) -> None:
    """Persist ``df`` as a catalog table bucketed + sorted on ``key``."""
    writer = (
        df.write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if overwrite:
        writer = writer.mode("overwrite")
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), key)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle `Exchange` nodes in the final physical plan —
    the metric bucketing is meant to drive to zero."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
