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

# the testdata events parquet stores ts as TIMESTAMP(NANOS): read as long,
# convert to micros after (integer div, no rounding)
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
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


def run_windowed_aggregation_batch(
    spark: SparkSession, events_path: str, window: str = "1 hour"
) -> DataFrame:
    """Drive the streaming plan to completion over a bounded parquet source
    (memory sink, processAllAvailable) and return the result as a DataFrame.
    Proves the watermark/window plan is a valid *streaming* plan, not just a
    batch one."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(events_path)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = windowed_event_counts(stream, window=window)
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("windowed_event_counts")
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return spark.sql("SELECT * FROM windowed_event_counts")
