"""Streaming windowed aggregation over the events stream.

``windowed_event_counts`` builds the streaming plan (watermark + tumbling
window); ``run_windowed_aggregation_batch`` drives it synchronously from a
bounded parquet source through a memory sink — the local-test harness. On a
real cluster the same plan reads Kafka and writes Delta/parquet with
checkpointing; only the source/sink lines change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the testdata events parquet stores ts as TIMESTAMP(MICROS) without a
# timezone — declared NTZ here so the stream reads the same type the batch
# path infers (stream/batch twins must agree on the column type)
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + sums per event_type with late-data handling.
    Works on both streaming and batch DataFrames (Spark unifies the plan)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(
        F.window(F.col("ts"), window).alias("win"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
        .alias("sum_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "event_type", "n_events", "sum_value",
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session-window aggregation per user: Spark's native
    ``session_window`` merges events whose gaps are below ``gap`` — the
    streaming twin of operators.analytics.sessionize (same 30-minute-gap
    semantics; the batch version numbers sessions explicitly, this one
    returns the merged window bounds)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(
        F.session_window(F.col("ts"), gap).alias("win"), F.col("user_id")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
        .alias("sum_value"),
    ).select(
        F.col("win.start").alias("session_start"),
        F.col("win.end").alias("session_end"),
        "user_id", "n_events", "sum_value",
    )


def running_user_totals(events: DataFrame, watermark: str = "2 hours"):
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    keeps one running (n_events, sum_value) accumulator per user across
    micro-batches — the shape Spark's built-in windows can't express
    (unbounded per-key state with custom merge logic).

    Returns the transformed streaming DataFrame; caller attaches a sink.
    Output: one row per user per micro-batch with the updated totals.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ])

    def update(key, pdfs, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n],
             "sum_value": [round(total, 4)]}
        )

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema,
            "update", GroupStateTimeout.NoTimeout,
        )
    )


def _bounded_event_stream(spark: SparkSession, events_path: str) -> DataFrame:
    # the file stream source requires a DIRECTORY; when given a single
    # parquet file, expose it through a temp dir of symlinks
    import os
    import tempfile

    if os.path.isfile(events_path):
        d = tempfile.mkdtemp(prefix="stream-src-")
        os.symlink(events_path, os.path.join(d, os.path.basename(events_path)))
        events_path = d
    # watermarks require TIMESTAMP (LTZ); the session runs UTC so the
    # NTZ -> LTZ cast is value-preserving and the batch twin (which keeps
    # NTZ) collects identical wall-clock datetimes
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(events_path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def run_stream_to_memory(
    plan: DataFrame, name: str, output_mode: str = "complete"
) -> None:
    """Drive any streaming plan to completion into a memory sink table."""
    query = (
        plan.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()


def run_windowed_aggregation_batch(
    spark: SparkSession, events_path: str, window: str = "1 hour"
) -> DataFrame:
    """Drive the streaming plan to completion over a bounded parquet source
    (memory sink, processAllAvailable) and return the result as a DataFrame.
    Proves the watermark/window plan is a valid *streaming* plan, not just a
    batch one."""
    stream = _bounded_event_stream(spark, events_path)
    agg = windowed_event_counts(stream, window=window)
    run_stream_to_memory(agg, "windowed_event_counts")
    return spark.sql("SELECT * FROM windowed_event_counts")


def stream_dedup_events(
    stream: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key, with state
    bounded by the watermark (``dropDuplicatesWithinWatermark`` — duplicate
    keys arriving within the watermark window are dropped, and key state is
    evicted once the watermark passes, so state never grows unboundedly).
    The streaming analog of the batch ``dedup_exact`` operator: the same
    keep-one-per-key semantics applied to an infinite stream — the shape a
    CDC-fed ingestion pipeline uses to suppress replays."""
    return (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(list(keys))
    )


def run_stream_dedup_batch(
    spark: SparkSession,
    events_path: str,
    keys: tuple[str, ...] = ("user_id", "event_type"),
) -> DataFrame:
    """Drive the streaming dedup over a bounded parquet source to completion
    (memory sink, append mode) and return the deduplicated rows."""
    stream = _bounded_event_stream(spark, events_path)
    dedup = stream_dedup_events(stream, keys=keys)
    run_stream_to_memory(dedup, "stream_dedup_events", output_mode="append")
    return spark.sql("SELECT * FROM stream_dedup_events")


def windowed_active_users(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    rsd: float = 0.01,
) -> DataFrame:
    """Tumbling-window ACTIVE USERS per event type. Streaming state cannot
    hold exact per-window distinct sets (unbounded memory per key), so this
    uses ``approx_count_distinct`` — HLL++ registers are mergeable state of
    fixed size, the canonical streaming-distinct design. Because HLL
    merging is commutative and idempotent (registers take element-wise
    max), the streaming result is bit-identical to running the same
    expression in batch over the same rows — which is exactly what the
    stream/batch twin test asserts, no tolerance needed.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(
        F.window(F.col("ts"), window).alias("win"), F.col("event_type")
    ).agg(
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    ).select(
        F.col("win.start").alias("window_start"),
        "event_type", "approx_users", "n_events",
    )


def sliding_active_users(
    events: DataFrame,
    window: str = "7 days",
    slide: str = "1 day",
    watermark: str = "8 days",
    rsd: float = 0.01,
) -> DataFrame:
    """Rolling N-day active users as a STREAM: a sliding window (one window
    per slide step, each event contributing to window/slide overlapping
    windows) with HLL++ distinct state — the streaming twin of the batch
    ``operators.rolling_active_users`` explode formulation (Spark's sliding
    window performs the same event->windows expansion internally). Exact
    per-window distinct sets would be unbounded state; the HLL registers
    are fixed-size and merge-order-free, so stream equals batch exactly.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(
        F.window(F.col("ts"), window, slide).alias("win")
    ).agg(
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "approx_users",
    )


def enrich_stream(events: DataFrame, dims: DataFrame) -> DataFrame:
    """Stream-static enrichment join — the most common production
    streaming shape: each micro-batch of events joins a static (or
    slowly-refreshed) dimension frame. Spark re-plans the static side per
    micro-batch, so a broadcastable dimension costs one broadcast per
    batch and the stream side never shuffles; no watermark is needed
    because a stream-static inner join is stateless. Works identically on
    a batch frame (the twin the test asserts against).
    """
    return events.join(dims, "user_id", "inner").select(
        "event_id", "ts", "user_id", "event_type", "value", "segment"
    )


def purchase_click_pairs(
    purchases: DataFrame, clicks: DataFrame, window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join:each purchase pairs with the same user's
    clicks from the preceding ``window`` — the streaming form of
    click-attribution candidate generation. Both sides carry watermarks
    and the join condition bounds event time on BOTH streams, which is
    what lets Spark expire buffered state (a stream-stream join without a
    time bound would buffer forever). Works identically on batch frames.
    """
    p = purchases.selectExpr(
        "event_id AS purchase_id", "ts AS p_ts", "user_id"
    )
    c = clicks.selectExpr(
        "event_id AS click_id", "ts AS c_ts", "user_id AS c_user"
    )
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    if clicks.isStreaming:
        c = c.withWatermark("c_ts", watermark)
    return p.join(
        c,
        F.expr(
            "user_id = c_user AND "
            f"c_ts BETWEEN p_ts - INTERVAL {window} AND p_ts"
        ),
        "inner",
    ).select("purchase_id", "click_id", "user_id", "p_ts", "c_ts")


def page_hinkley_stream(
    series: DataFrame,
    key_col: str = "series_key",
    idx_col: str = "idx",
    value_col: str = "x",
    delta: float = 0.0,
):
    """Streaming twin of ``operators.stats.page_hinkley`` — the drift
    statistic is sequential BY CONSTRUCTION (one pass, O(1) state:
    running sum, accumulator, accumulator-min, peak), so it maps onto
    ``applyInPandasWithState`` with no approximation: per series key
    the state is exactly the batch recurrence's carry, micro-batches
    fold in event order (rows sorted by ``idx_col`` within each batch;
    the feed must deliver non-decreasing ``idx`` ACROSS batches per
    key — the replayed-aggregate shape, same contract as the batch
    operator's ordered window).  Quantization matches the batch twin
    bit-for-bit: half-away-from-zero micro rounding (``floor(|v|·s +
    .5)``, never Python's banker's round) on each value and on each
    running-mean division.

    Emits one row per key per micro-batch with the running
    (n_periods, ph_micro, ph_stat, peak_idx) — the latest row per key
    equals the batch operator's one-row result on the same series.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("series_key", T.StringType()),
        T.StructField("n_periods", T.LongType()),
        T.StructField("ph_micro", T.LongType()),
        T.StructField("ph_stat", T.DoubleType()),
        T.StructField("peak_idx", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("s", T.LongType()),
        T.StructField("m", T.LongType()),
        T.StructField("mn", T.LongType()),
        T.StructField("ph", T.LongType()),
        T.StructField("peak", T.LongType()),
    ])

    def update(key, pdfs, state):
        import math

        import pandas as pd

        def half_away(v):
            return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

        d_micro = half_away(delta * 1000000.0)
        if state.exists:
            n, s, m, mn, ph, peak = state.get
        else:
            n, s, m, mn, ph, peak = 0, 0, 0, None, -1, None
        for pdf in pdfs:
            pdf = pdf.sort_values(idx_col)
            for idx, x in zip(pdf[idx_col], pdf[value_col]):
                xm = half_away(float(x) * 1000000.0)
                n += 1
                s += xm
                dev = xm - half_away(s / n) - d_micro
                m += dev
                mn = m if mn is None else min(mn, m)
                if m - mn > ph:
                    ph = m - mn
                    peak = int(idx)
        state.update((n, s, m, mn, ph, peak))
        yield pd.DataFrame({
            "series_key": [str(key[0])],
            "n_periods": [n],
            "ph_micro": [max(ph, 0)],
            "ph_stat": [max(ph, 0) / 1e6],
            "peak_idx": [peak],
        })

    return (
        series.groupBy(F.col(key_col))
        .applyInPandasWithState(
            update, out_schema, state_schema,
            "update", GroupStateTimeout.NoTimeout,
        )
    )


def sprt_stream(
    series: DataFrame,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
    key_col: str = "series_key",
    idx_col: str = "idx",
    successes_col: str = "s",
    trials_col: str = "t",
):
    """Streaming twin of ``operators.stats.sprt_test`` — Wald's SPRT is
    the canonical ONLINE test (its whole point is deciding mid-stream),
    so the state is just the cumulative nano-quantized LLR plus the
    first crossing, per series key.  Micro-batches fold in event order
    (rows sorted by ``idx_col`` within a batch; the feed must deliver
    non-decreasing ``idx`` across batches per key — the
    :func:`page_hinkley_stream` contract).  The nano LLR weights are
    the SAME Python constants the batch operator derives, so the
    crossing index and decision match it exactly.

    Emits one row per key per micro-batch:
    (series_key, n_periods, llr_final, decision, crossing_idx).
    """
    import math

    from pyspark.sql.streaming.state import GroupStateTimeout

    if not (0 < p0 < 1 and 0 < p1 < 1 and p0 != p1):
        raise ValueError("need 0 < p0, p1 < 1 and p0 != p1")
    if not (0 < alpha < 1 and 0 < beta < 1):
        raise ValueError("alpha/beta must be in (0, 1)")
    w_s = round(math.log(p1 / p0) * 1e9)
    w_f = round(math.log((1 - p1) / (1 - p0)) * 1e9)
    up = round(math.log((1 - beta) / alpha) * 1e9)
    lo = round(math.log(beta / (1 - alpha)) * 1e9)

    out_schema = T.StructType([
        T.StructField("series_key", T.StringType()),
        T.StructField("n_periods", T.LongType()),
        T.StructField("llr_final", T.DoubleType()),
        T.StructField("decision", T.StringType()),
        T.StructField("crossing_idx", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("llr", T.LongType()),
        T.StructField("cross", T.LongType()),
        T.StructField("dec", T.StringType()),
    ])

    def update(key, pdfs, state):
        import pandas as pd

        n, llr, cross, dec = (
            state.get if state.exists else (0, 0, None, None)
        )
        for pdf in pdfs:
            pdf = pdf.sort_values(idx_col)
            for idx, s, t in zip(pdf[idx_col], pdf[successes_col],
                                 pdf[trials_col]):
                n += 1
                llr += int(s) * w_s + (int(t) - int(s)) * w_f
                if cross is None and (llr >= up or llr <= lo):
                    cross = int(idx)
                    dec = "accept_h1" if llr >= up else "accept_h0"
        state.update((n, llr, cross, dec))
        yield pd.DataFrame({
            "series_key": [str(key[0])],
            "n_periods": [n],
            "llr_final": [llr / 1e9],
            "decision": [dec or "continue"],
            "crossing_idx": [cross],
        })

    return (
        series.groupBy(F.col(key_col))
        .applyInPandasWithState(
            update, out_schema, state_schema,
            "update", GroupStateTimeout.NoTimeout,
        )
    )


def cuped_monitor_stream(
    assignments: DataFrame,
    key_col: str = "series_key",
    metric_col: str = "y",
    covariate_col: str = "x",
    treat_col: str = "t",
):
    """Streaming twin of ``operators.stats.cuped_adjusted_effect`` — the
    always-on experiment monitor the batch operator implies: CUPED's
    entire input is eleven algebraic moments (per-arm counts and sums,
    pooled cross-moments), so the per-experiment state is exactly those
    sums and every micro-batch folds in O(rows).  Arrival order is
    irrelevant (sums commute) — unlike the PH/SPRT twins no ordered-feed
    contract is needed.

    Bit-equality with the batch operator comes from mirroring its
    numeric path: each metric/covariate value is quantized to the same
    DECIMAL(12,4) lattice (scale-4 integers, HALF_UP = half-away, the
    Spark decimal-cast rule), moment sums are exact integers carried as
    STRINGS in the state (x·x of a 12,4 decimal overflows int64; Python
    ints are unbounded, the string column just serializes them), and
    the final (theta, effects, var_reduction) projection re-evaluates
    the batch operator's fixed-order IEEE double expressions with the
    same micro rounding.

    Emits one row per key per micro-batch: (series_key, n_treat,
    n_ctrl, theta, effect_raw, effect_cuped, var_reduction) — the
    latest row per key equals the batch operator's one-row result on
    the same assignment frame.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("series_key", T.StringType()),
        T.StructField("n_treat", T.LongType()),
        T.StructField("n_ctrl", T.LongType()),
        T.StructField("theta", T.DoubleType()),
        T.StructField("effect_raw", T.DoubleType()),
        T.StructField("effect_cuped", T.DoubleType()),
        T.StructField("var_reduction", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("n_t", T.LongType()),
        T.StructField("n_c", T.LongType()),
        T.StructField("sums", T.StringType()),
    ])

    def update(key, pdfs, state):
        import math

        import pandas as pd

        def half_away(v):
            return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

        if state.exists:
            n_t, n_c, blob = state.get
            syt, syc, sxt, sxc, sx, sy, sxx, sxy, syy = (
                int(p) for p in blob.split(",")
            )
        else:
            n_t = n_c = 0
            syt = syc = sxt = sxc = sx = sy = sxx = sxy = syy = 0
        for pdf in pdfs:
            for yv, xv, tv in zip(
                pdf[metric_col], pdf[covariate_col], pdf[treat_col]
            ):
                if yv is None or xv is None or (
                    isinstance(yv, float) and math.isnan(yv)
                ) or (isinstance(xv, float) and math.isnan(xv)):
                    continue
                yq = half_away(float(yv) * 10000.0)
                xq = half_away(float(xv) * 10000.0)
                t = bool(tv) if tv is not None else False
                if t:
                    n_t += 1
                    syt += yq
                    sxt += xq
                else:
                    n_c += 1
                    syc += yq
                    sxc += xq
                sx += xq
                sy += yq
                sxx += xq * xq
                sxy += xq * yq
                syy += yq * yq
        state.update((n_t, n_c, ",".join(
            str(v) for v in (syt, syc, sxt, sxc, sx, sy, sxx, sxy, syy)
        )))
        # the batch operator's double projection, re-evaluated in the
        # same operation order over the same correctly-rounded casts
        n_d = float(n_t + n_c)
        nt_d, nc_d = float(n_t), float(n_c)
        syt_d, syc_d = syt / 1e4, syc / 1e4
        sxt_d, sxc_d = sxt / 1e4, sxc / 1e4
        sx_d, sy_d = sx / 1e4, sy / 1e4
        sxx_d, sxy_d, syy_d = sxx / 1e8, sxy / 1e8, syy / 1e8

        def q6(v):
            return None if v is None else half_away(v * 1000000.0) / 1e6

        den_t = n_d * sxx_d - sx_d * sx_d
        theta = (
            None if den_t == 0.0
            else (n_d * sxy_d - sx_d * sy_d) / den_t
        )
        raw = (
            None if (nt_d == 0.0 or nc_d == 0.0)
            else syt_d / nt_d - syc_d / nc_d
        )
        xdiff = (
            None if (nt_d == 0.0 or nc_d == 0.0)
            else sxt_d / nt_d - sxc_d / nc_d
        )
        den_c = den_t * (n_d * syy_d - sy_d * sy_d)
        corr2 = (
            None if den_c == 0.0
            else (n_d * sxy_d - sx_d * sy_d)
            * (n_d * sxy_d - sx_d * sy_d) / den_c
        )
        cuped = (
            None if (raw is None or theta is None or xdiff is None)
            else raw - theta * xdiff
        )
        yield pd.DataFrame({
            "series_key": [str(key[0])],
            "n_treat": [n_t],
            "n_ctrl": [n_c],
            "theta": [q6(theta)],
            "effect_raw": [q6(raw)],
            "effect_cuped": [q6(cuped)],
            "var_reduction": [q6(corr2)],
        })

    return (
        assignments.groupBy(F.col(key_col))
        .applyInPandasWithState(
            update, out_schema, state_schema,
            "update", GroupStateTimeout.NoTimeout,
        )
    )


def srm_monitor_stream(
    assignments: DataFrame,
    expected_shares: dict,
    key_col: str = "series_key",
    arm_col: str = "arm",
):
    """Streaming twin of ``operators.stats.srm_check`` — sample-ratio
    mismatch is THE metric to watch live (an SRM invalidates the
    experiment the moment it appears, waiting for the nightly batch
    wastes a day of traffic).  Per-experiment state is just the
    observed count per arm, carried as parallel (arms, counts) arrays;
    counts commute so there is no ordered-feed contract.

    Every micro-batch re-emits the batch operator's full per-arm
    report — (arm, n_observed, expected_share, n_expected, residual_z,
    chi2_total, df_total), arm-ordered — recomputed from the updated
    counts with the batch twin's exact double path (fixed-order
    expressions, micro rounding, NULL expectations for arms outside
    the declared design: they ARE the mismatch).  The latest emission
    per key equals ``srm_check`` on all rows seen so far.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    if not expected_shares:
        raise ValueError("expected_shares must be non-empty")
    total_share = sum(expected_shares.values())
    if not 0.999999 <= total_share <= 1.000001:
        raise ValueError(
            f"expected_shares must sum to 1 (got {total_share})"
        )
    shares = dict(expected_shares)

    out_schema = T.StructType([
        T.StructField("series_key", T.StringType()),
        T.StructField("arm", T.StringType()),
        T.StructField("n_observed", T.LongType()),
        T.StructField("expected_share", T.DoubleType()),
        T.StructField("n_expected", T.DoubleType()),
        T.StructField("residual_z", T.DoubleType()),
        T.StructField("chi2_total", T.DoubleType()),
        T.StructField("df_total", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("arms", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ])

    def update(key, pdfs, state):
        import math

        import pandas as pd

        def half_away(v):
            return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

        counts: dict = {}
        if state.exists:
            arms, ns = state.get
            counts = dict(zip(list(arms), [int(n) for n in ns]))
        for pdf in pdfs:
            for arm in pdf[arm_col]:
                if arm is None:
                    continue
                a = str(arm)
                counts[a] = counts.get(a, 0) + 1
        items = sorted(counts.items())
        state.update((
            [a for a, _ in items], [n for _, n in items],
        ))
        n_d = float(sum(counts.values()))
        chi_micro = 0
        k_known = 0
        rows = []
        for a, n_obs in items:
            share = shares.get(a)
            if share is None:
                rows.append((a, n_obs, None, None, None))
                continue
            share = float(share)
            k_known += 1
            n_exp = half_away(share * n_d * 1000000.0) / 1e6
            den = math.sqrt(share * n_d * (1.0 - share))
            rz = (
                None if den == 0.0
                else half_away(
                    (float(n_obs) - share * n_d) / den * 1000000.0
                ) / 1e6
            )
            if share * n_d != 0.0:
                chi_micro += half_away(
                    (float(n_obs) - share * n_d)
                    * (float(n_obs) - share * n_d)
                    / (share * n_d) * 1000000.0
                )
            rows.append((a, n_obs, share, n_exp, rz))
        # no observed arm in the declared design: chi2 0.0 with df -1
        # would read as a clean result — emit NULL, the batch
        # srm_check's k_known = 0 convention
        chi2 = chi_micro / 1e6 if k_known > 0 else None
        df_total = k_known - 1 if k_known > 0 else None
        yield pd.DataFrame({
            "series_key": [str(key[0])] * len(rows),
            "arm": [r[0] for r in rows],
            "n_observed": [r[1] for r in rows],
            "expected_share": [r[2] for r in rows],
            "n_expected": [r[3] for r in rows],
            "residual_z": [r[4] for r in rows],
            "chi2_total": [chi2] * len(rows),
            "df_total": [df_total] * len(rows),
        })

    return (
        assignments.groupBy(F.col(key_col))
        .applyInPandasWithState(
            update, out_schema, state_schema,
            "update", GroupStateTimeout.NoTimeout,
        )
    )


def psi_monitor_stream(
    live: DataFrame,
    reference_bins: dict,
    bin_width: float,
    key_col: str = "series_key",
    value_col: str = "x",
):
    """Streaming twin of ``operators.stats.psi_drift`` — the live
    drift gate between a FROZEN training snapshot and an arriving
    feed: ``reference_bins`` is the training side's exact per-bin
    integer counts (``{floor(v/bin_width): count}``, the bounded
    deployment artifact — the ``expected_shares`` contract of
    :func:`srm_monitor_stream`), the state is the live side's per-bin
    exact counts, and every micro-batch re-emits the full PSI report.
    Order-independent by construction (bin counts are a mergeable
    sum — no ordered-feed contract needed, unlike the PH/SPRT twins).

    Quantization matches the batch operator bit-for-bit: identical
    IEEE binning (``floor(v / w)``), identical p_A/p_B division
    order, the same SORTED-BIN LEFT FOLD of the PSI terms with
    empty-on-either-side bins excluded, and half-away round-6 on the
    final statistic.  Emits one row per key per micro-batch:
    (series_key, n_a, n_b, n_bins, n_skipped_bins, psi).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    if not reference_bins:
        raise ValueError("reference_bins must be non-empty")
    ref = {int(b): int(c) for b, c in reference_bins.items()}
    n_a = sum(ref.values())

    out_schema = T.StructType([
        T.StructField("series_key", T.StringType()),
        T.StructField("n_a", T.LongType()),
        T.StructField("n_b", T.LongType()),
        T.StructField("n_bins", T.LongType()),
        T.StructField("n_skipped_bins", T.LongType()),
        T.StructField("psi", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("bins", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ])

    def update(key, pdfs, state):
        import math

        import pandas as pd

        def half_away(v):
            return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

        counts: dict = {}
        if state.exists:
            bs, cs = state.get
            counts = dict(zip([int(b) for b in bs],
                              [int(c) for c in cs]))
        for pdf in pdfs:
            for v in pdf[value_col]:
                if v is None:
                    continue
                b = int(math.floor(float(v) / bin_width))
                counts[b] = counts.get(b, 0) + 1
        items = sorted(counts.items())
        state.update((
            [b for b, _ in items], [c for _, c in items],
        ))
        n_b = sum(counts.values())
        all_bins = sorted(set(ref) | set(counts))
        skipped = 0
        acc = 0.0
        for b in all_bins:
            ca, cb = ref.get(b, 0), counts.get(b, 0)
            if ca == 0 or cb == 0:
                skipped += 1
                acc = acc + 0.0
                continue
            pa = float(ca) / float(n_a)
            pb = float(cb) / float(n_b)
            acc = acc + (pa - pb) * math.log(pa / pb)
        psi = half_away((acc + 0.0) * 1e6) / 1e6
        yield pd.DataFrame({
            "series_key": [str(key[0])],
            "n_a": [n_a],
            "n_b": [n_b],
            "n_bins": [len(all_bins)],
            "n_skipped_bins": [skipped],
            "psi": [psi],
        })

    return (
        live.groupBy(F.col(key_col))
        .applyInPandasWithState(
            update, out_schema, state_schema,
            "update", GroupStateTimeout.NoTimeout,
        )
    )


def mmd_monitor_stream(
    live: DataFrame,
    sigma: float,
    ref_features: dict,
    key_col: str = "series_key",
    value_col: str = "x",
):
    """Streaming twin of ``operators.stats.mmd_rff`` — the smooth
    kernel member of the drift-monitor family, deployed phase-II
    style: σ and the reference window's 8 exact micro feature sums
    are FROZEN at deployment (``ref_features`` = one collected row of
    ``operators.stats.mmd_reference_features``: n_ref + z0..z7); the
    state is the live side's 8 running feature sums — O(1), exact
    integers, mergeable and order-independent (no ordered-feed
    contract).  Each micro-batch re-emits ``MMD² = (2/D)·‖mean_ref z
    − mean_live z‖²`` with the batch operator's exact expression
    shape: per-row cos terms micro-quantized after the arg's round-6
    pre-quantization (so every engine sees the same double), exact
    BIGINT sums, fixed-order double combine, micro-rounded output.

    Emits one row per key per micro-batch:
    (series_key, n_a, n_b, sigma, mmd2).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.stats import _MMD_B, _MMD_W

    if not sigma or sigma <= 0:
        raise ValueError("sigma must be positive (freeze it from "
                         "mmd_rff's calibration output)")
    n_ref = int(ref_features["n_ref"])
    if n_ref <= 0:
        raise ValueError("ref_features must cover a non-empty window")
    za = [int(ref_features[f"z{j}"]) for j in range(8)]

    out_schema = T.StructType([
        T.StructField("series_key", T.StringType()),
        T.StructField("n_a", T.LongType()),
        T.StructField("n_b", T.LongType()),
        T.StructField("sigma", T.DoubleType()),
        T.StructField("mmd2", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("zs", T.ArrayType(T.LongType())),
    ])

    def update(key, pdfs, state):
        import math

        import pandas as pd

        def half_away(v):
            return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

        if state.exists:
            n, zs = int(state.get[0]), [int(z) for z in state.get[1]]
        else:
            n, zs = 0, [0] * 8
        for pdf in pdfs:
            for v in pdf[value_col]:
                if v is None:
                    continue
                x = float(v)
                n += 1
                for j in range(8):
                    # round-6 pre-quantization of the arg, then micro
                    # cos — the batch feature expression verbatim
                    arg = half_away(
                        (_MMD_W[j] * x / sigma + _MMD_B[j]) * 1e6
                    ) / 1e6
                    zs[j] += half_away(math.cos(arg) * 1e6)
        state.update((n, zs))
        if n == 0:
            mmd2 = None
        else:
            diff_sq = 0.0
            for j in range(8):
                d = (za[j] / 1e6 / float(n_ref)
                     - zs[j] / 1e6 / float(n))
                diff_sq = diff_sq + d * d
            mmd2 = half_away((2.0 / 8.0) * diff_sq * 1e6) / 1e6
        yield pd.DataFrame({
            "series_key": [str(key[0])],
            "n_a": [n_ref],
            "n_b": [n],
            "sigma": [sigma],
            "mmd2": [mmd2],
        })

    return (
        live.groupBy(F.col(key_col))
        .applyInPandasWithState(
            update, out_schema, state_schema,
            "update", GroupStateTimeout.NoTimeout,
        )
    )


def cusum_stream(
    series: DataFrame,
    mu: float,
    k_slack: float = 0.0,
    key_col: str = "series_key",
    idx_col: str = "idx",
    value_col: str = "x",
):
    """Streaming twin of ``operators.stats.cusum_control`` for a KNOWN
    target level μ₀ — the live two-sided CUSUM chart (the batch
    operator estimates μ₀ from the full series retrospectively; the
    monitor is deployed against the design target, which is how CUSUM
    is actually run).  O(1) state per key: the two prefix sums and
    their running minima plus the peak statistics — the
    :func:`page_hinkley_stream` recurrence applied twice.  The feed
    must deliver non-decreasing ``idx`` across batches per key (the
    PH/SPRT ordered-feed contract).

    Emits one row per key per micro-batch with the running
    (n_periods, cusum_pos_max, cusum_neg_max, pos_peak_idx,
    neg_peak_idx) — the latest row per key equals the batch operator
    on the same series when the batch's estimated μ equals ``mu``.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("series_key", T.StringType()),
        T.StructField("n_periods", T.LongType()),
        T.StructField("cusum_pos_max", T.DoubleType()),
        T.StructField("cusum_neg_max", T.DoubleType()),
        T.StructField("pos_peak_idx", T.LongType()),
        T.StructField("neg_peak_idx", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("pp", T.LongType()),
        T.StructField("pn", T.LongType()),
        T.StructField("mnp", T.LongType()),
        T.StructField("mnn", T.LongType()),
        T.StructField("cpmax", T.LongType()),
        T.StructField("cnmax", T.LongType()),
        T.StructField("cpidx", T.LongType()),
        T.StructField("cnidx", T.LongType()),
    ])
    mu_q = int(round(mu * 1e6))
    kq = int(round(k_slack * 1e6))

    def update(key, pdfs, state):
        import math

        import pandas as pd

        def half_away(v):
            return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

        if state.exists:
            n, pp, pn, mnp, mnn, cpmax, cnmax, cpidx, cnidx = state.get
        else:
            n, pp, pn, mnp, mnn = 0, 0, 0, 0, 0
            cpmax, cnmax, cpidx, cnidx = 0, 0, None, None
        for pdf in pdfs:
            pdf = pdf.sort_values(idx_col)
            for idx, x in zip(pdf[idx_col], pdf[value_col]):
                xq = half_away(float(x) * 1000000.0)
                n += 1
                pp += xq - mu_q - kq
                pn += mu_q - xq - kq
                cp = pp - min(mnp, 0)
                cn = pn - min(mnn, 0)
                if cp > cpmax:
                    cpmax, cpidx = cp, int(idx)
                if cn > cnmax:
                    cnmax, cnidx = cn, int(idx)
                mnp = min(mnp, pp)
                mnn = min(mnn, pn)
        state.update((n, pp, pn, mnp, mnn, cpmax, cnmax, cpidx, cnidx))
        yield pd.DataFrame({
            "series_key": [str(key[0])],
            "n_periods": [n],
            "cusum_pos_max": [max(cpmax, 0) / 1e6],
            "cusum_neg_max": [max(cnmax, 0) / 1e6],
            "pos_peak_idx": [cpidx],
            "neg_peak_idx": [cnidx],
        })

    return (
        series.groupBy(F.col(key_col))
        .applyInPandasWithState(
            update, out_schema, state_schema,
            "update", GroupStateTimeout.NoTimeout,
        )
    )


def bollinger_stream(
    series: DataFrame,
    window: int = 20,
    k: float = 2.0,
    key_col: str = "series_key",
    idx_col: str = "idx",
    value_col: str = "x",
):
    """Streaming twin of ``operators.stats.bollinger_bands`` — the live
    adaptive-envelope monitor: per series key the state is a ring
    buffer of the last ``window`` micro-quantized values, so each
    arriving period emits its own (sma, band_lo, band_hi, breach) row
    exactly as the batch operator computes it (full windows only).
    Ordered-feed contract (the PH/SPRT twins' rule): non-decreasing
    ``idx`` across batches per key.

    The mean and σ replay the batch operator's fixed-order double
    expressions over the exact integer window sums, so the union of
    all emissions equals the batch output row-for-row.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    if window < 2:
        raise ValueError("window must be >= 2")
    out_schema = T.StructType([
        T.StructField("series_key", T.StringType()),
        T.StructField("idx", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("sma", T.DoubleType()),
        T.StructField("band_lo", T.DoubleType()),
        T.StructField("band_hi", T.DoubleType()),
        T.StructField("breach", T.BooleanType()),
    ])
    state_schema = T.StructType([
        T.StructField("buf", T.ArrayType(T.LongType())),
    ])
    n_d = float(window)

    def update(key, pdfs, state):
        import math

        import pandas as pd

        def half_away(v):
            return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

        buf = list(state.get[0]) if state.exists else []
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(idx_col)
            for idx, x in zip(pdf[idx_col], pdf[value_col]):
                xq = half_away(float(x) * 1000000.0)
                buf.append(xq)
                if len(buf) > window:
                    buf.pop(0)
                if len(buf) < window:
                    continue
                s = sum(buf)
                q = sum(v * v for v in buf)
                # the batch operator's expression tree, term for term
                mean = (s / n_d) / 1e6
                sd = math.sqrt(
                    (float(q) - float(s) * float(s) / n_d)
                    / (n_d - 1.0)
                ) / 1e6
                sma = half_away(mean * 1000000.0) / 1e6
                lo = half_away((mean - k * sd) * 1000000.0) / 1e6
                hi = half_away((mean + k * sd) * 1000000.0) / 1e6
                v_d = float(x)
                rows.append((
                    str(key[0]), int(idx), v_d, sma, lo, hi,
                    bool(v_d < lo or v_d > hi),
                ))
        state.update(([int(v) for v in buf],))
        yield pd.DataFrame(
            rows,
            columns=["series_key", "idx", "value", "sma",
                     "band_lo", "band_hi", "breach"],
        )

    return (
        series.groupBy(F.col(key_col))
        .applyInPandasWithState(
            update, out_schema, state_schema,
            "update", GroupStateTimeout.NoTimeout,
        )
    )


def shewhart_stream(
    series: DataFrame,
    subgroup_size: int,
    gx: float,
    rb: float,
    key_col: str = "series_key",
    idx_col: str = "idx",
    value_col: str = "x",
):
    """Streaming twin of ``operators.stats.shewhart_xbar_r`` for
    ESTABLISHED control limits — phase II of SPC practice: the batch
    operator estimates the center lines (x̄̄, R̄) from a reference
    window; the deployed chart then monitors live subgroups against
    those FROZEN limits.  State per key is the current partial
    subgroup (micro values); each completed subgroup emits its
    (xbar, r, ooc flags) row with the batch operator's exact limit
    expressions.  Ordered-feed contract as with the PH/SPRT twins.

    Emits one row per COMPLETED subgroup:
    (series_key, subgroup_idx, n, xbar, r, xbar_ucl, xbar_lcl,
    r_ucl, r_lcl, ooc_mean, ooc_range).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.stats import _XBAR_A2, _XBAR_D3, _XBAR_D4

    if subgroup_size not in _XBAR_A2:
        raise ValueError("subgroup_size must be in 2..10")
    a2 = _XBAR_A2[subgroup_size]
    d3 = _XBAR_D3[subgroup_size]
    d4 = _XBAR_D4[subgroup_size]
    out_schema = T.StructType([
        T.StructField("series_key", T.StringType()),
        T.StructField("subgroup_idx", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("xbar", T.DoubleType()),
        T.StructField("r", T.DoubleType()),
        T.StructField("xbar_ucl", T.DoubleType()),
        T.StructField("xbar_lcl", T.DoubleType()),
        T.StructField("r_ucl", T.DoubleType()),
        T.StructField("r_lcl", T.DoubleType()),
        T.StructField("ooc_mean", T.BooleanType()),
        T.StructField("ooc_range", T.BooleanType()),
    ])
    state_schema = T.StructType([
        T.StructField("buf", T.ArrayType(T.LongType())),
        T.StructField("done", T.LongType()),
    ])
    gx_q = int(round(gx * 1e6))
    rb_q = int(round(rb * 1e6))

    def update(key, pdfs, state):
        import math

        import pandas as pd

        def half_away(v):
            return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

        buf, done = (list(state.get[0]), int(state.get[1])) \
            if state.exists else ([], 0)
        # the batch operator's exact limit expressions, frozen inputs
        ucl = half_away((gx_q + a2 * rb_q) / 1e6 * 1e6) / 1e6
        lcl = half_away((gx_q - a2 * rb_q) / 1e6 * 1e6) / 1e6
        rucl = half_away(d4 * rb_q / 1e6 * 1e6) / 1e6
        rlcl = half_away(d3 * rb_q / 1e6 * 1e6) / 1e6
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(idx_col)
            for x in pdf[value_col]:
                buf.append(half_away(float(x) * 1000000.0))
                if len(buf) == subgroup_size:
                    s = sum(buf)
                    xbar = half_away(
                        s / float(subgroup_size)
                    ) / 1e6
                    r = (max(buf) - min(buf)) / 1e6
                    rows.append((
                        str(key[0]), done, subgroup_size,
                        xbar, r, ucl, lcl, rucl, rlcl,
                        bool(xbar > ucl or xbar < lcl),
                        bool(r > rucl or r < rlcl),
                    ))
                    buf, done = [], done + 1
        state.update(([int(v) for v in buf], done))
        yield pd.DataFrame(
            rows,
            columns=["series_key", "subgroup_idx", "n", "xbar", "r",
                     "xbar_ucl", "xbar_lcl", "r_ucl", "r_lcl",
                     "ooc_mean", "ooc_range"],
        )

    return (
        series.groupBy(F.col(key_col))
        .applyInPandasWithState(
            update, out_schema, state_schema,
            "update", GroupStateTimeout.NoTimeout,
        )
    )


def kmv_distinct_stream(
    live: DataFrame,
    k: int = 256,
    key_col: str = "series_key",
    value_col: str = "v",
):
    """Streaming twin of ``operators.sketches.approx_distinct_kmv`` —
    live distinct-diversity monitoring on the ingest feed ("is this
    crawl stream still producing novel keys/n-grams") with BOUNDED
    state: the k smallest 60-bit md5 hashes seen so far (the KMV
    sketch — Bar-Yossef et al. 2002), merged per micro-batch.  The
    state is O(k) doubles per key regardless of stream length, and
    KMV merge = union-then-keep-k-smallest, so the same sketch also
    unions across days/sources — the property HLL++ has, kept here in
    a form every engine reproduces bit-for-bit.

    Hashing matches the batch operator exactly (int(md5[:15], 16) →
    correctly-rounded double → ÷2^60 power-of-two scale, zero extra
    rounding), the estimate is the same ``(k-1)/max_h`` with
    half-away round-4, and ``k_used < k`` degrades to the exact
    distinct count — so each micro-batch emission equals the batch
    sketch run over everything ingested so far (pinned in tests).

    ``value_col`` must already be STRING — the md5 canon is defined
    on the engine's string rendering, and streaming Python must not
    re-implement Spark's number→string casts (format them upstream
    with the same expression the batch query uses).  Emits one row
    per key per micro-batch: (series_key, n_rows, k_used,
    approx_distinct, max_h).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    if k < 2:
        raise ValueError("k must be >= 2")

    out_schema = T.StructType([
        T.StructField("series_key", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("k_used", T.LongType()),
        T.StructField("approx_distinct", T.DoubleType()),
        T.StructField("max_h", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("hashes", T.ArrayType(T.DoubleType())),
        T.StructField("n_rows", T.LongType()),
    ])

    def update(key, pdfs, state):
        import hashlib
        import math

        import pandas as pd

        def half_away(v, scale):
            q = v * scale
            return (int(math.floor(abs(q) + 0.5))
                    * (1 if q >= 0 else -1)) / scale

        hashes: list = []
        n_rows = 0
        if state.exists:
            hs, n0 = state.get
            hashes = [float(h) for h in hs]
            n_rows = int(n0)
        seen = set(hashes)
        for pdf in pdfs:
            for v in pdf[value_col]:
                if v is None:
                    continue
                n_rows += 1
                h = float(
                    int(hashlib.md5(str(v).encode()).hexdigest()[:15],
                        16)
                ) / float(1 << 60)
                if h not in seen:
                    seen.add(h)
                    hashes.append(h)
        # keep-k-smallest: the whole KMV merge rule
        hashes.sort()
        del hashes[k:]
        state.update((hashes, n_rows))
        k_used = len(hashes)
        max_h = hashes[-1] if hashes else None
        est = (
            half_away(float(k - 1) / max_h, 1e4)
            if max_h else None
        )
        yield pd.DataFrame({
            "series_key": [str(key[0])],
            "n_rows": [n_rows],
            "k_used": [k_used],
            "approx_distinct": [est],
            "max_h": [half_away(max_h, 1e6) if max_h else None],
        })

    return (
        live.groupBy(F.col(key_col))
        .applyInPandasWithState(
            update, out_schema, state_schema,
            "update", GroupStateTimeout.NoTimeout,
        )
    )


def elo_rating_stream(
    live: DataFrame,
    k_factor_milli: int = 32000,
    init_rating_micro: int = 1_500_000_000,
    key_col: str = "series_key",
    order_col: str = "o",
    group_col: str = "g",
    value_col: str = "v",
):
    """Streaming twin of ``operators.stats.elo_preference_ratings`` —
    live preference-rating tracking over an ordered match feed with
    O(k) state per series: the integer-micro rating table plus the
    carried-over last row (so consecutive pairs form ACROSS
    micro-batch boundaries exactly as the batch replay forms them).

    The update arithmetic is byte-identical to the batch operator:
    Bradley-Terry link p = ra/(ra+rb) (IEEE division), one
    correctly-rounded double expression per match half-away-quantized
    to micros — so after any prefix of an ordered feed the emission
    equals the batch replay over everything ingested (pinned in
    tests).  The feed contract is the usual sequential-twin one: rows
    must arrive in (order_col) order across batches (each batch is
    additionally sorted on (order_col, group, value) defensively);
    out-of-order arrivals change which pairs meet, exactly as they
    would for any online rating system.  Emits one row per group per
    micro-batch: (series_key, grp, n_played, wins, rating).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("series_key", T.StringType()),
        T.StructField("grp", T.StringType()),
        T.StructField("n_played", T.LongType()),
        T.StructField("wins", T.DoubleType()),
        T.StructField("rating", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("groups", T.ArrayType(T.StringType())),
        T.StructField("r", T.ArrayType(T.LongType())),
        T.StructField("played", T.ArrayType(T.LongType())),
        T.StructField("wins2", T.ArrayType(T.LongType())),
        T.StructField("has_carry", T.BooleanType()),
        T.StructField("carry_g", T.StringType()),
        T.StructField("carry_v", T.DoubleType()),
    ])
    kf = float(k_factor_milli) / 1000.0
    init = int(init_rating_micro)

    def update(key, pdfs, state):
        import math

        import pandas as pd

        groups: list = []
        r: list = []
        played: list = []
        wins2: list = []
        carry = None
        if state.exists:
            gs, rs, ps, ws, hc, cg, cv = state.get
            groups = [str(x) for x in gs]
            r = [int(x) for x in rs]
            played = [int(x) for x in ps]
            wins2 = [int(x) for x in ws]
            if hc:
                carry = (str(cg), float(cv))
        idx = {g: i for i, g in enumerate(groups)}

        def ensure(g):
            if g not in idx:
                idx[g] = len(groups)
                groups.append(g)
                r.append(init)
                played.append(0)
                wins2.append(0)
            return idx[g]

        rows = []
        for pdf in pdfs:
            sub = pdf[[order_col, group_col, value_col]].dropna()
            rows.extend(
                (row[0], str(row[1]), float(row[2]))
                for row in sub.itertuples(index=False)
            )
        rows.sort(key=lambda t: (t[0], t[1], t[2]))
        for o_, g_, v_ in rows:
            ensure(g_)
            if carry is not None:
                g1, v1 = carry
                if g1 != g_:
                    s2 = 2 if v1 > v_ else (1 if v1 == v_ else 0)
                    ia, ib = idx[g1], idx[g_]
                    ra, rb = r[ia], r[ib]
                    p = float(ra) / float(ra + rb)
                    t = kf * (s2 / 2.0 - p) * 1000000.0
                    delta = (int(math.floor(abs(t) + 0.5))
                             * (1 if t >= 0 else -1))
                    r[ia] = ra + delta
                    r[ib] = rb - delta
                    played[ia] += 1
                    played[ib] += 1
                    wins2[ia] += s2
                    wins2[ib] += 2 - s2
            carry = (g_, v_)
        state.update((
            groups, r, played, wins2,
            carry is not None,
            carry[0] if carry is not None else None,
            carry[1] if carry is not None else None,
        ))
        order = sorted(range(len(groups)), key=lambda i: groups[i])
        yield pd.DataFrame({
            "series_key": [str(key[0])] * len(groups),
            "grp": [groups[i] for i in order],
            "n_played": [played[i] for i in order],
            "wins": [wins2[i] / 2.0 for i in order],
            "rating": [r[i] / 1e6 for i in order],
        })

    return (
        live.groupBy(F.col(key_col))
        .applyInPandasWithState(
            update, out_schema, state_schema,
            "update", GroupStateTimeout.NoTimeout,
        )
    )


def decontamination_stream(
    live: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Streaming twin of
    ``operators.similarity.embedding_decontamination`` — screen an
    incoming embedding feed against a FROZEN eval set live, flagging
    probable benchmark leakage before it lands in the corpus.  The
    eval matrix comes from a BATCH frame (collecting model data is a
    batch job, the ``importance_weights`` frozen-model posture); the
    scoring leg is the exact shared narrow map
    (``_decontamination_scores``: broadcast matrix, Arrow BLAS block,
    max-cosine + smallest tied eval id, thresholded emit), so per-row
    stream emissions equal the batch run minus only the batch-side
    deterministic sort (pinned in tests).  Stateless append-mode
    plan: works with any source/sink, no watermark needed.
    """
    from ..operators.similarity import _decontamination_scores

    return _decontamination_scores(
        live, eval_set, threshold, id_col, vec_col)


def tokenizer_fertility_stream(
    live: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Streaming twin of ``operators.text.tokenizer_fertility_ab`` —
    running per-source fertility over a document feed (update mode):
    the same per-doc JVM expressions (bytes, whitespace words, GPT-2
    pretokenizer tokens) feed a streaming groupBy, and the derived
    ratios are recomputed per emission from the EXACT integer
    running sums — so after any prefix of the feed the emission
    equals the batch operator over everything ingested (pinned in
    tests).  One stateful aggregation keyed by source: O(sources)
    state.
    """
    from ..operators.text import BPE_ISH_PATTERN

    t = f"({text_col})"
    words = f"size(filter(split({t}, ' '), x -> x != ''))"
    bpe = F.size(F.regexp_extract_all(
        F.expr(t), F.lit(BPE_ISH_PATTERN), F.lit(0)))
    per_doc = live.where(
        f"{t} IS NOT NULL AND ({source_col}) IS NOT NULL"
    ).select(
        F.col(source_col).alias("source"),
        F.expr(f"CAST(octet_length({t}) AS BIGINT)").alias("b"),
        F.expr(f"CAST({words} AS BIGINT)").alias("w"),
        bpe.cast("long").alias("t_bpe"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("b").cast("long").alias("total_bytes"),
        F.sum("w").cast("long").alias("words"),
        F.sum("t_bpe").cast("long").alias("tokens_bpe"),
    )
    return agg.select(
        "source", "n_docs", "total_bytes", "words", "tokens_bpe",
        F.expr("round(CAST(tokens_bpe AS DOUBLE) / nullif(words, 0), 6)")
        .alias("bpe_per_word"),
        F.expr("round(CAST(words AS DOUBLE) * 100.0d "
               "/ nullif(total_bytes, 0), 6)").alias("ws_per_100b"),
        F.expr("round(CAST(tokens_bpe AS DOUBLE) * 100.0d "
               "/ nullif(total_bytes, 0), 6)").alias("bpe_per_100b"),
    )


def hashed_ngram_score_stream(
    live: DataFrame,
    weights: list[float],
    n_buckets: int = 32,
    salt: str = "ftlid",
    text_col: str = "text",
    id_col: str = "doc_id",
    label_expr: str | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """Streaming twin of the hashed n-gram classifier scoring leg
    (``operators.classify.hashed_ngram_features`` +
    ``logistic_score``) — gate a live document feed with a FROZEN
    weight vector (training is a batch job, the frozen-model posture
    of ``decontamination_stream``).  Featurization and scoring are
    both pure narrow maps (the histogram is JVM array expressions,
    the weights are literals), so per-row stream emissions equal the
    batch scorer exactly (pinned in tests).  Stateless append mode:
    any source/sink, no watermark.
    """
    from ..operators.classify import hashed_ngram_features, logistic_score

    frame, feats = hashed_ngram_features(
        live, n_buckets=n_buckets, salt=salt, text_col=text_col)
    return logistic_score(
        frame, weights, feats, label_expr=label_expr, id_col=id_col,
        threshold=threshold)


def prefs_margin_stream(
    pairs: DataFrame,
    domain_col: str = "domain",
    chosen_tokens_col: str = "chosen_tokens",
    rejected_tokens_col: str = "rejected_tokens",
    chosen_reward_col: str = "chosen_reward",
    rejected_reward_col: str = "rejected_reward",
) -> DataFrame:
    """Streaming twin of ``operators.sft.preference_pair_report`` —
    running per-domain preference-pair health over a live annotation
    feed (update mode): the shared aggregation core keeps exact
    integer running sums (quantized reward margins, BIGINT token
    counts) keyed by domain, and every ratio is recomputed per
    emission — so after any prefix of the feed the latest emission
    per domain equals the batch report over everything ingested
    (pinned in tests).  O(domains) state.
    """
    from ..operators.sft import _preference_pair_agg

    return _preference_pair_agg(
        pairs, domain_col, chosen_tokens_col, rejected_tokens_col,
        chosen_reward_col, rejected_reward_col)


def sft_turn_admission_stream(
    live: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    roles: tuple[str, ...] = ("assistant",),
    watermark: str | None = None,
    ts_col: str = "ingest_ts",
) -> DataFrame:
    """Streaming twin of ``operators.sft.conversation_turn_dedup`` —
    the ADMISSION side: a live SFT ingestion feed (annotation tool,
    synthetic-generation pipeline) admits each loss-bearing turn's
    fingerprint ONCE, so boilerplate replies never accumulate in the
    corpus in the first place.  The batch operator lists the rejects
    after the fact; this keeps them out live — the same complement
    the corpus-ingestion twin (``streaming.corpus``) implements for
    whole documents, reusing its state posture: with a ``watermark``
    state is bounded via ``dropDuplicatesWithinWatermark`` (the
    production shape — a replay outside the watermark may re-emit and
    downstream storage dedups idempotently); without one, exact
    unbounded-state dedup for bounded backfills/tests.  First arrival
    per fingerprint wins (micro-batch order), so the pinned
    batch-equality invariant is the admitted FINGERPRINT SET: it
    equals the batch-distinct assistant-turn fingerprints, and every
    batch-flagged duplicate's canonical is admitted exactly once.

    Emits (conv_id, turn_idx, role, fingerprint).
    """
    gated = live.where(
        F.col(text_col).isNotNull() & F.col(role_col).isin(*roles)
    ).select(
        F.col(conv_col).cast("long").alias("conv_id"),
        F.col(turn_col).cast("long").alias("turn_idx"),
        F.col(role_col).cast("string").alias("role"),
        F.md5(F.col(text_col)).alias("fingerprint"),
        *([F.col(ts_col)] if watermark is not None else []),
    )
    if watermark is not None:
        return gated.withWatermark(ts_col, watermark) \
            .dropDuplicatesWithinWatermark(["fingerprint"]) \
            .drop(ts_col)
    return gated.dropDuplicates(["fingerprint"])
