"""Structured Streaming generalization of the reference's batch-incremental
protocol (SURVEY.md §2.9).

The reference emulates streaming with watermark files + scheduled batch
(ST1/ST2) and has no late/duplicate handling (ST6). Here the same
pipeline runs as a real stream:

- file-source stream + ``Trigger.AvailableNow`` replaces the watermark
  file: the checkpoint directory tracks exactly which files are processed,
  so re-runs are incremental and crash-safe with zero custom code.
- event-time watermark + ``dropDuplicates`` bounds state and makes
  duplicate deliveries idempotent (the ST6 fix).
- the online store is maintained by a ``foreachBatch`` upsert into the
  latest-per-key snapshot (ST4) — exactly-once per epoch.
- tumbling-window aggregates give the streaming analogue of the hourly
  cadence.
"""

from aqi_featurestore_spark.streaming.jobs import (
    run_online_refresh_stream,
    stream_events,
    windowed_aqi_aggregate,
)

__all__ = ["stream_events", "run_online_refresh_stream", "windowed_aqi_aggregate"]
