"""Scale-adaptive fan-out for compute-heavy narrow stages.

Small parquet inputs are often single-row-group files, and a parquet
row group is unsplittable (the scan task owning its byte-range
midpoint reads all of it), so a scan-rooted pipeline over such a file
starts at ONE task no matter how many cores the session has.  Any
operator whose per-row work dominates its I/O — md5 resample lanes,
Gram explodes, tokenizer lambdas — therefore runs single-core exactly
when the input is small enough to make per-row cost visible.

``fan_out`` round-robin repartitions a frame to the session's default
parallelism ONLY when the frame's current plan would run on fewer
partitions.  The probe reads the planned partition count (driver-only,
no job for the narrow scan-rooted frames this is meant for); at
cluster scale an input already splits into >= cores scan tasks and the
helper is a no-op, so no constant tuned for local mode leaks into
production plans (optimization guide "scale-adaptive partitioning").

Cost when it fires: one exchange of exactly the rows it is given —
callers project to the narrow working column set FIRST so the shuffle
carries bytes proportional to the decision data, not the payload —
plus the deterministic pre-shuffle local sort Spark inserts for
round-robin repartitioning (SPARK-23207, keeps retries exact).

Correctness: round-robin placement changes which partition each row
lands in, so every caller must be partition-count/placement invariant.
The house determinism discipline (exact integer/decimal sums, per-row
narrow maps, order-fixed folds, struct-ordered argmins) guarantees
that; do NOT apply this under float accumulations whose value depends
on summation order.

Meant for scan-rooted (or checkpoint-rooted) frames; two guards make
it safe to embed in library operators whose callers pass anything:
streaming frames pass through untouched (no .rdd on a stream), and a
frame whose physical plan already contains an Exchange passes through
untouched — it is either already parallelized by an upstream shuffle
or fan-out was applied upstream, and probing it via .rdd would make
AQE materialize its query stages (running real jobs from inside a
planning helper).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition ``df`` to ``factor`` x the session's default
    parallelism when its planned partition count is lower; identity
    otherwise (the cluster-scale path) and on streaming or
    already-shuffled frames."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * factor
    if target <= 1:
        return df
    if "Exchange" in df._jdf.queryExecution().sparkPlan().toString():
        return df
    current = df.rdd.getNumPartitions()
    if current >= target:
        return df
    return df.repartition(target)


# Per-iteration loop frames: a driver-side model-fit loop issues one
# tiny job per iteration over a pinned frame, and every task in that
# job carries a fixed cost (task dispatch, codegen instantiation,
# block read, metrics) that the micro-benchmarked ~40-100 ms/task CPU
# floor makes visible when partitions hold only a few thousand rows.
# 32 partitions of a 150k-row feature frame tripled a 16-iteration
# fit's CPU (91 s vs 30 s) for a ~1.5 s wall win; ~32k rows/task kept
# the wall win AND the single-partition CPU. The cap is row-driven, so
# at corpus scale (rows >> tasks*32k) it never shrinks cluster
# parallelism — only small pinned frames coalesce.
LOOP_ROWS_PER_TASK = 32768


def loop_width(pinned: DataFrame, n_rows: int,
               rows_per_task: int = LOOP_ROWS_PER_TASK) -> DataFrame:
    """Bound a pinned fit-loop frame's per-iteration task count by its
    known row count: coalesce (narrow, block-merging — no shuffle, no
    re-materialization) to ceil(n_rows / rows_per_task) partitions when
    that is below the pinned width; identity otherwise."""
    cur = pinned.rdd.getNumPartitions()
    want = max(1, min(cur, -(-n_rows // rows_per_task)))
    if want >= cur:
        return pinned
    return pinned.coalesce(want)
