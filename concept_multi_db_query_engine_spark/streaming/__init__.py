"""Structured Streaming components.

The reference has no streaming query operators (SURVEY.md §2.13) — its only
streaming concept is the Debezium CDC topology the planner knows about. Here
we provide the two streaming shapes the Spark rebuild actually needs:

- windowed event aggregation with watermarks (windows.py) — the streaming
  twin of operators.analytics.events_hourly;
- a CDC-replica emulator (cdc.py) that keeps a replica directory in sync from
  an append-only source, which is exactly the topology the planner's P2
  'materialized' strategy routes to.
"""

from .windows import run_windowed_aggregation_batch, windowed_event_counts

__all__ = ["run_windowed_aggregation_batch", "windowed_event_counts"]
