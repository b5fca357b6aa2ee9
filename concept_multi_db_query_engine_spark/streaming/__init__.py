"""Structured Streaming components.

The reference has no streaming query operators (SURVEY.md §2.13) — its only
streaming concept is the Debezium CDC topology the planner knows about. Here
we provide the two streaming shapes the Spark rebuild actually needs:

- windowed event aggregation with watermarks (windows.py) — the streaming
  twin of operators.analytics.events_hourly;
- streaming corpus ingestion (corpus.py) — quality gate + fingerprint
  dedup over an arriving document stream, the streaming twin of the batch
  clean-corpus path;
- a CDC-replica emulator (cdc.py) that keeps a replica directory in sync from
  an append-only source, which is exactly the topology the planner's P2
  'materialized' strategy routes to.
"""

from .corpus import (
    clean_document_stream,
    quota_admission_stream,
    run_clean_documents_batch,
    score_document_stream,
)
from .windows import (
    page_hinkley_stream,
    sprt_stream,
    run_windowed_aggregation_batch,
    windowed_event_counts,
)

__all__ = [
    "clean_document_stream",
    "quota_admission_stream",
    "score_document_stream",
    "run_clean_documents_batch",
    "run_windowed_aggregation_batch",
    "page_hinkley_stream",
    "sprt_stream",
    "windowed_event_counts",
]
