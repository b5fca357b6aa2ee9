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


def hilbert_step_exprs(k: int, bits: int, shr) -> tuple[str, str, str]:
    """One unrolled step of the canonical Hilbert xy2d walk (the
    Wikipedia/Warren formulation) as SQL expression text over the state
    columns ``__hx __hy __hd``: returns ``(d', x', y')`` for bit level
    ``k``. ``shr(expr, k)`` renders an arithmetic right shift in the
    target dialect (Spark ``shiftright``, DuckDB ``>>``) — every other
    operation is engine-portable exact integer arithmetic: the
    ``(3*rx) XOR ry`` quadrant code is expanded to
    ``3*rx + ry - 2*rx*ry`` (identical over {0,1}²) because ``^`` is
    POWER in DuckDB, and the rotation flip uses the FULL grid size
    ``2^bits - 1``, per the reference algorithm."""
    s = 1 << k
    n1 = (1 << bits) - 1
    rx = f"({shr('__hx', k)} & 1)"
    ry = f"({shr('__hy', k)} & 1)"
    d = f"(__hd + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry}))"
    x_new = (f"(CASE WHEN {ry} = 1 THEN __hx "
             f"WHEN {rx} = 1 THEN {n1} - __hy ELSE __hy END)")
    y_new = (f"(CASE WHEN {ry} = 1 THEN __hy "
             f"WHEN {rx} = 1 THEN {n1} - __hx ELSE __hx END)")
    return d, x_new, y_new


def hilbert_code(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
    out_col: str = "hilbert",
) -> DataFrame:
    """Adds the Hilbert-curve index of two integer dimensions — the
    stronger sibling of :func:`zorder_code`: the Hilbert curve visits
    every cell of the 2^bits × 2^bits grid through ADJACENT cells only
    (no Z-shaped jumps), so consecutive index ranges map to more
    compact rectangles and min/max file pruning discards more files
    than Z-order for the same sort (the reason Delta Lake added
    ``OPTIMIZE ... HILBERT`` as liquid clustering's default curve).

    The xy2d walk rotates the frame at each of the ``bits`` levels, so
    unlike Morton interleaving it cannot be a flat sum of independent
    bit terms; it unrolls instead into ``bits`` chained SELECTs whose
    (x, y, d) states update SIMULTANEOUSLY per level — a pure narrow
    map of exact integer arithmetic (codegen-friendly, zero shuffles,
    plan depth linear in ``bits``). The identical step expressions are
    rendered for DuckDB by :func:`hilbert_step_exprs`, so the oracle
    replays the same walk bit-for-bit.
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    for c in ("__hx", "__hy", "__hd"):
        if c in df.columns:
            raise ValueError(f"input already has a {c!r} column")
    mask = (1 << bits) - 1
    keep = list(df.columns)
    cur = df.select(
        *keep,
        F.expr(f"CAST({col_a} AS BIGINT) & {mask}").alias("__hx"),
        F.expr(f"CAST({col_b} AS BIGINT) & {mask}").alias("__hy"),
        F.lit(0).cast("long").alias("__hd"),
    )

    def shr(e: str, k: int) -> str:
        return f"shiftright({e}, {k})"

    for k in reversed(range(bits)):
        d, x_new, y_new = hilbert_step_exprs(k, bits, shr)
        cur = cur.select(
            *keep,
            F.expr(x_new).alias("__hx"),
            F.expr(y_new).alias("__hy"),
            F.expr(d).alias("__hd"),
        )
    return cur.select(*keep, F.col("__hd").cast("long").alias(out_col))


def hilbert_sql(
    base_cte: str,
    keep_cols: list[str],
    col_a: str,
    col_b: str,
    bits: int = 16,
    out_col: str = "hilbert",
) -> str:
    """The DuckDB twin of :func:`hilbert_code`: a full query string
    replaying the identical unrolled walk as chained CTEs over
    ``base_cte`` (a ``name AS (SELECT ...)`` fragment providing
    ``keep_cols`` plus the two dimension columns)."""
    mask = (1 << bits) - 1
    keep = ", ".join(keep_cols)
    parts = [base_cte]
    parts.append(
        f"h{bits} AS (SELECT {keep}, "
        f"CAST({col_a} AS BIGINT) & {mask} AS __hx, "
        f"CAST({col_b} AS BIGINT) & {mask} AS __hy, "
        f"CAST(0 AS BIGINT) AS __hd FROM base)"
    )

    def shr(e: str, k: int) -> str:
        return f"({e} >> {k})"

    for k in reversed(range(bits)):
        d, x_new, y_new = hilbert_step_exprs(k, bits, shr)
        parts.append(
            f"h{k} AS (SELECT {keep}, {x_new} AS __hx, {y_new} AS __hy, "
            f"{d} AS __hd FROM h{k + 1})"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT {keep}, CAST(__hd AS BIGINT) AS {out_col} FROM h0"
    )
