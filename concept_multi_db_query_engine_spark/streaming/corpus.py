"""Streaming training-corpus ingestion: the documents pipeline (quality
gate → fingerprint → exact dedup) as a Structured Streaming plan.

This is the streaming twin of the batch ``docs_clean_corpus`` dedup/quality
path: a corpus arriving continuously (crawl output, CDC from a document
store) is quality-filtered statelessly and exact-deduplicated on the
content fingerprint, emitting each unique document once. On a real cluster
the source is Kafka/auto-loader and the sink is partitioned parquet
(``sinks.write_corpus_shards``); only the source/sink lines change.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.text import _quality_exprs

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def clean_document_stream(
    stream: DataFrame,
    min_quality: float = 0.3,
    watermark: str | None = None,
    ts_col: str = "ingest_ts",
) -> DataFrame:
    """Quality-gate + exact-dedup a document stream.

    The quality gate is stateless (per-row expressions — identical to the
    batch ``quality_score``). Dedup keys on ``md5(text)``: with a
    ``watermark`` (and an event-time column ``ts_col``) state is bounded
    via ``dropDuplicatesWithinWatermark`` — the production shape, where a
    replayed document outside the watermark may re-emit (downstream
    storage dedups idempotently). Without a watermark (bounded
    backfills/tests) plain ``dropDuplicates`` keeps state per unique
    fingerprint — exact, but unbounded on an infinite stream; don't ship
    that shape against one.

    Emits (doc_id, lang, source, fingerprint, quality) — first arrival per
    fingerprint wins, matching the batch keep-one policy.
    """
    _, _, score = _quality_exprs()
    gated = (
        stream.withColumn("quality", score.cast("double"))
        .where(F.col("quality") >= min_quality)
        .withColumn("fingerprint", F.md5(F.col("text")))
    )
    if watermark is not None:
        deduped = gated.withWatermark(ts_col, watermark) \
            .dropDuplicatesWithinWatermark(["fingerprint"])
    else:
        deduped = gated.dropDuplicates(["fingerprint"])
    return deduped.select(
        "doc_id", "lang", "source", "fingerprint", "quality"
    )


def _bounded_document_stream(
    spark: SparkSession, docs_path: str
) -> DataFrame:
    if os.path.isfile(docs_path):
        d = tempfile.mkdtemp(prefix="stream-docs-")
        os.symlink(docs_path, os.path.join(d, os.path.basename(docs_path)))
        docs_path = d
    return spark.readStream.schema(DOCS_SCHEMA).parquet(docs_path)


def run_clean_documents_batch(
    spark: SparkSession, docs_path: str, min_quality: float = 0.3,
) -> DataFrame:
    """Drive the streaming corpus cleaner over a bounded parquet source to
    completion (memory sink, append mode) and return the cleaned rows —
    proves the plan is a valid streaming plan, not just a batch one."""
    from .windows import run_stream_to_memory

    stream = _bounded_document_stream(spark, docs_path)
    cleaned = clean_document_stream(stream, min_quality=min_quality)
    run_stream_to_memory(cleaned, "stream_clean_documents",
                         output_mode="append")
    return spark.sql("SELECT * FROM stream_clean_documents")


def score_document_stream(
    stream: DataFrame,
    weights: list[float],
    feature_exprs: list[str],
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming twin of :func:`..operators.classify.logistic_score`:
    the frozen-weights classifier is a pure narrow map, so the SAME
    call works on a streaming frame unchanged — this wrapper exists to
    pin that contract with a batch-equality test (train offline, score
    the firehose; the standard quality-gate deployment shape)."""
    from ..operators.classify import logistic_score

    return logistic_score(stream, weights, feature_exprs,
                          id_col=id_col, threshold=threshold)


def quota_admission_stream(
    stream: DataFrame,
    quota: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """STATEFUL streaming domain quota: admit the first ``quota``
    documents per domain across the whole stream, then drop the rest —
    the online counterpart of the batch
    :func:`..operators.text.domain_quota_sample` (which picks a
    deterministic md5-ordered sample from a complete corpus; a stream
    has no complete corpus, so the online policy is first-arrival,
    the order micro-batches deliver).

    Implemented with ``applyInPandasWithState``: state is ONE integer
    per domain (admitted-so-far) — constant memory per key, mergeable
    across restarts via the checkpoint.  Emits (domain, doc_id,
    admit_rank) for admitted documents only.
    """
    if quota < 1:
        raise ValueError("quota must be >= 1")
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    out_schema = (
        f"{domain_col} string, {id_col} long, admit_rank int"
    )
    state_schema = "admitted int"

    def admit(key, pdfs, state: GroupState):
        admitted = state.get[0] if state.exists else 0
        doms, ids, ranks = [], [], []
        for pdf in pdfs:
            for doc in pdf[id_col]:
                if admitted >= quota:
                    break
                admitted += 1
                doms.append(key[0])
                ids.append(int(doc))
                ranks.append(admitted)
        state.update((admitted,))
        yield pd.DataFrame({
            domain_col: doms, id_col: ids, "admit_rank": ranks,
        })

    return (
        stream.select(domain_col, id_col)
        .groupBy(domain_col)
        .applyInPandasWithState(
            admit, out_schema, state_schema, "Append", timeout,
        )
    )
