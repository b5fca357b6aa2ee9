"""Sinks: sharded, partitioned output writers.

The reference engine is strictly read-only — INSERT/UPDATE/DELETE are
explicitly future scope (reference README.md:754) and it defines no sinks.
A 100 TB training-data pipeline, however, has to write its outputs back out
(deduped corpora, packed sequences, feature tables), so the Spark rebuild
adds a first-class write path.

Scale design:
- **Shard count is explicit.** ``repartition(n)`` (hash) or
  ``repartitionByRange`` (for globally range-clustered output) decides the
  file count; never rely on whatever partitioning the upstream plan left.
- **Hive-style ``partitionBy``** for the columns consumers filter on
  (e.g. ``lang``, ``source``) → downstream partition pruning is free.
- **``sortWithinPartitions``** before write gives per-file clustering
  (parquet min/max row-group pruning) without a global sort's extra
  exchange.
- **``maxRecordsPerFile``** bounds file size regardless of skew, so one hot
  hive-partition can't produce a 100 GB file.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class ParquetSink:
    """Configurable columnar/text writer: shard count, hive partitioning,
    within-file clustering, file-size cap, compression. ``fmt`` defaults
    to parquet (the hot-path layout); csv/json/orc cover export edges —
    set ``compression`` to a codec the chosen format supports (snappy is
    parquet/orc; use gzip or none for text formats)."""

    path: str
    fmt: str = "parquet"
    mode: str = "overwrite"
    partition_by: tuple[str, ...] = ()
    sort_within_by: tuple[str, ...] = ()
    n_shards: int | None = None
    range_shard_by: tuple[str, ...] = ()
    max_records_per_file: int | None = None
    compression: str = "snappy"
    options: dict[str, str] = field(default_factory=dict)

    def _shape(self, df: DataFrame) -> DataFrame:
        if self.n_shards:
            if self.range_shard_by:
                df = df.repartitionByRange(self.n_shards, *self.range_shard_by)
            elif self.partition_by:
                # co-locate each hive partition's rows so every (hive
                # partition × shard) pair yields at most one file instead of
                # n_shards tiny files per partition
                df = df.repartition(self.n_shards, *self.partition_by)
            else:
                df = df.repartition(self.n_shards)
        if self.sort_within_by:
            df = df.sortWithinPartitions(*self.sort_within_by)
        return df

    def write(self, df: DataFrame) -> None:
        writer = self._shape(df).write.mode(self.mode)
        writer = writer.option("compression", self.compression)
        if self.max_records_per_file:
            writer = writer.option(
                "maxRecordsPerFile", str(self.max_records_per_file)
            )
        for k, v in self.options.items():
            writer = writer.option(k, v)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.format(self.fmt).save(self.path)


def write_corpus_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    partition_by: tuple[str, ...] = ("lang",),
    order_within: tuple[str, ...] = ("doc_id",),
    max_records_per_file: int | None = 1_000_000,
) -> None:
    """Write a documents table as a sharded, hive-partitioned parquet corpus
    — the standard layout for feeding a distributed training job (each
    worker claims whole files; ``lang`` pruning is a directory skip)."""
    ParquetSink(
        path=path,
        partition_by=partition_by,
        sort_within_by=order_within,
        n_shards=n_shards,
        max_records_per_file=max_records_per_file,
    ).write(docs)


def compact_files(
    spark,
    path: str,
    target_mb: int = 512,
    fmt: str = "parquet",
    sort_within_by: tuple[str, ...] = (),
) -> dict:
    """Small-file compaction — the maintenance pass every long-lived table
    needs: streaming/incremental writers leave thousands of KB-sized files
    whose per-file open/footer cost eventually dominates scans. Reads the
    dataset, rewrites it as ``ceil(bytes / target_mb)`` files (optionally
    re-clustered for row-group pruning), and atomically swaps via a
    temporary sibling directory. Returns {files_before, files_after,
    bytes} for the operator log.

    Scale notes: the rewrite is one repartition exchange sized by actual
    bytes (not file count), so a million-file input becomes
    ``bytes/target`` balanced tasks; the swap is two renames (atomic on
    HDFS/local; on S3 point readers at the new prefix instead). Run it
    per partition directory for hive-layout tables to bound the working
    set.
    """
    import math
    import os
    import shutil

    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path)
        for f in fs
        if not f.startswith(("_", "."))
    ]
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(path)
    shaped = df.repartition(n_out)
    if sort_within_by:
        shaped = shaped.sortWithinPartitions(*sort_within_by)
    tmp = path.rstrip("/") + "__compact_tmp"
    shaped.write.mode("overwrite").format(fmt).save(tmp)
    old = path.rstrip("/") + "__compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    after = [
        f
        for dp, _, fs in os.walk(path)
        for f in fs
        if not f.startswith(("_", "."))
    ]
    return {
        "files_before": len(files),
        "files_after": len(after),
        "bytes": total_bytes,
    }
