"""Driver-side model-fit loop tuning.

A full-batch GD / fixed-point training loop issues one tiny Spark query
per iteration: a global aggregate over a pinned (localCheckpoint'd)
feature frame — map-side partial aggregation, ONE exchange to a single
final partition, a handful of output scalars. For that shape, Adaptive
Query Execution has nothing to optimize — there is no join to re-plan
and the final stage is one partition by construction — but its
query-stage materialization turns every iteration into TWO driver jobs
(the partial-agg stage materializes as its own job before the final
stage runs). Measured on the 24-iteration logistic trainer at sf0.1:
2 jobs/73 single-task stages per fit with AQE on, half that with it
off; wall 18.8 s → 11.5 s (co-tenant machine), weights bit-identical
(AQE is a physical-plan-only feature; it cannot change values).

The effect is scale-INDEPENDENT: at any corpus size the per-iteration
plan is still scan → partial agg → 1-partition final agg, so skipping
AQE's per-iteration stage materialization saves a fixed driver cost per
iteration without touching the distributed work. Everything outside the
loop (featurization, checkpoint, scoring) keeps the session's AQE
setting.
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def model_fit_iterations(spark, shuffle_partitions: int | None = None):
    """Disable AQE for the duration of a driver-side fit loop, restoring
    the caller's setting on exit (exception-safe).

    ``shuffle_partitions``: optional reduce-side partition count for the
    loop's exchanges.  Only pass it when the loop's shuffled frames are
    MODEL-sized by construction (k centroids, k·d dimension sums — never
    corpus-sized at any scale): with AQE off the session default would
    spray those few rows over dozens of near-empty reduce tasks, paying
    the per-task floor each iteration.  Map-side parallelism (scans,
    partial aggregation) is unaffected — this bounds only where the
    already-tiny reduce rows land.  Values cannot move: partitioning
    never changes exact integer aggregates."""
    key = "spark.sql.adaptive.enabled"
    pkey = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key, "true")
    # conf.get(pkey) with no default returns the session's EFFECTIVE value
    # (falling back to the 200 default) even when never explicitly set;
    # conf.get(pkey, None) returns None in that case, which previously
    # skipped the restore and leaked partitions=1 session-wide.
    old_p = spark.conf.get(pkey) if shuffle_partitions else None
    spark.conf.set(key, "false")
    if shuffle_partitions:
        spark.conf.set(pkey, str(shuffle_partitions))
    try:
        yield
    finally:
        spark.conf.set(key, old)
        if shuffle_partitions:
            if old_p is not None:
                spark.conf.set(pkey, old_p)
            else:
                spark.conf.unset(pkey)
