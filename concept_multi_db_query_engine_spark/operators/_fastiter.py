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
def model_fit_iterations(spark):
    """Disable AQE for the duration of a driver-side fit loop, restoring
    the caller's setting on exit (exception-safe)."""
    key = "spark.sql.adaptive.enabled"
    old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, old)
