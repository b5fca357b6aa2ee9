"""CDC replica maintenance via Structured Streaming.

The reference's planner knows about Debezium-maintained replicas as
*topology metadata* (METADATA.md:63-69) — the sync job itself is external
infrastructure. In the Spark rebuild the sync job IS expressible: a
Structured Streaming query that continuously copies a source table into the
replica directory the planner routes to (P2 'materialized' strategy).

``replicate_parquet_table`` runs one `availableNow` cycle — the batch-bounded
form of the same continuous job; on a cluster the identical plan runs with a
processing-time trigger against Kafka/Debezium topics, and ``estimatedLag``
in the metadata reflects the trigger interval.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def replicate_parquet_table(
    spark: SparkSession,
    source_path: str,
    target_path: str,
    checkpoint_path: str,
) -> None:
    """Copy/refresh a parquet table into ``target_path`` through a streaming
    query (exactly-once via checkpoint; incremental on re-run — only new
    source files are processed)."""
    import os

    schema = spark.read.parquet(source_path).schema
    src = source_path
    if os.path.isfile(src):
        # single-file source -> expose via a symlink dir; the dir path must
        # be STABLE across runs (the checkpoint records it), so key it to
        # the checkpoint location rather than a random temp dir
        d = checkpoint_path.rstrip("/") + "-src"
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, os.path.basename(src))
        if not os.path.islink(link):
            os.symlink(src, link)
        src = d
    stream = spark.readStream.schema(schema).parquet(src)
    query = (
        stream.writeStream.format("parquet")
        .option("path", target_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        query.stop()
