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
