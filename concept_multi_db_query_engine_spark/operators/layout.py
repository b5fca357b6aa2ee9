"""Data-layout and join-health operators — the write-side half of the
100 TB posture: how data is ARRANGED decides which scans prune and which
joins skew, before any query runs.

Reference behavior parity: the reference exposes no layout surface (it
reads whatever its stores hold); these extend the engine the way the
analytics/statistics families do, with the same oracle-replayable
determinism contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def morton_expr(col_a: str, col_b: str, bits: int = 16) -> str:
    """SQL text interleaving the low ``bits`` bits of two non-negative
    integer expressions into a Morton (Z-order) code — unrolled into a
    flat ``+`` chain of shift/mask terms so Spark and DuckDB evaluate
    the identical exact-integer expression (no lambda fold, no UDF).

    Both operands are cast to BIGINT before any shift: Spark's
    shiftleft/shiftright keep the INPUT column's integer width and take
    shift amounts mod that width (Java semantics), so a 32-bit INT
    column with bits=16 would emit shiftleft(..., 31) = -2^31 and
    bits>16 would silently wrap shift amounts mod 32.  In 64-bit the
    maximum shift here is 2*30+1 = 61 < 64, so every term is exact for
    any allowed ``bits`` regardless of the source column type."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    terms = []
    for i in range(bits):
        terms.append(
            f"shiftleft(shiftright(CAST({col_a} AS BIGINT), {i}) & 1,"
            f" {2 * i})"
        )
        terms.append(
            f"shiftleft(shiftright(CAST({col_b} AS BIGINT), {i}) & 1,"
            f" {2 * i + 1})"
        )
    return "(" + " + ".join(terms) + ")"


def zorder_code(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
    out_col: str = "zorder",
) -> DataFrame:
    """Adds the Morton (Z-order) interleaving of two integer dimensions —
    the multi-dimensional clustering key behind Delta/Iceberg OPTIMIZE
    ZORDER: rows close in (a, b) space land close in z-order, so a
    range-partitioned, sorted write clusters BOTH dimensions at once and
    min/max file statistics prune scans filtered on either column.

    Values are masked to the low ``bits`` bits first (callers normalize
    wider domains — e.g. day numbers, bucketed ids — upstream); the code
    is a pure narrow map of exact integer shift/mask arithmetic.
    """
    mask = (1 << bits) - 1
    code = morton_expr(f"({col_a} & {mask})", f"({col_b} & {mask})", bits)
    return df.withColumn(out_col, F.expr(code).cast("long"))


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """The write path: compute the z-order code and range-partition +
    sort the frame by it, ready for a clustered parquet write (each
    output file then covers a compact z-range, giving min/max pruning on
    BOTH source dimensions).  Returns the arranged frame with the code
    column retained for inspection."""
    coded = zorder_code(df, col_a, col_b, bits)
    parts = [F.col("zorder").asc()]
    arranged = (
        coded.repartitionByRange(num_partitions, *parts)
        if num_partitions
        else coded.repartitionByRange(*parts)
    )
    return arranged.sortWithinPartitions("zorder")


def join_skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Join-health diagnostic: the ``top_n`` heaviest join keys with
    their row share — the pre-flight check before any large shuffle join
    (a key holding >1% of a 100 TB fact table is the straggler that AQE
    skew-join or salting must handle; this report is how you find it).

    One map-side-combined groupBy, then ``orderBy().limit(top_n)`` —
    Spark plans that as TakeOrderedAndProject (partition-local top-k
    heaps merged on the driver), never a full sort of the key-count
    frame, so the report scales to billion-key domains.  The rank is
    then a window over the ``top_n``-row result only.  Returns
    (key, cnt, share_ppm, rank) with the share in exact integer parts
    per million (cnt·1e6 DIV total — no float ratios to drift).
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col)).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = counts.agg(
        F.sum("cnt").cast("long").alias("__tot")
    )
    # asc_nulls_last matches DuckDB's ASC default (Spark's is NULLS
    # FIRST) so a NULL key cannot flip top-n membership cross-engine
    top = counts.orderBy(
        F.col("cnt").desc(), F.col(key_col).asc_nulls_last()
    ).limit(top_n)
    w = Window.orderBy(
        F.col("cnt").desc(), F.col(key_col).asc_nulls_last()
    )
    return (
        top.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            key_col, "cnt",
            F.expr("cnt * 1000000 DIV __tot").alias("share_ppm"),
            "rank",
        )
    )
