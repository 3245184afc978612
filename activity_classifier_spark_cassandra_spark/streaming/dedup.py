"""Streaming deduplication: exactly-once semantics over an at-least-once
event feed.

The batch dedup family (operators/dedup.py) answers "collapse the
corpus"; a pipeline ingesting events continuously needs the streaming
counterpart — drop replayed/duplicate events *as they arrive* while
keeping bounded state.  Without a watermark the dedup state grows with
every key ever seen; `withWatermark` lets Spark expire keys older than
the lateness bound, so state is O(keys per watermark window), not
O(keys ever) — the difference between running forever and OOMing at
100 TB/day.

Two variants:
- ``dedup_stream``: first-seen-wins on exact key equality, state
  expired by watermark.  Emits each first occurrence immediately
  (dedup is not an aggregation — no holdback), so append mode works.
- ``dedup_within_watermark``: Spark 3.5+'s
  ``dropDuplicatesWithinWatermark`` — keys may recur after the
  watermark gap and be treated as new (the right semantics when
  event_ids are only unique within a producer epoch).

events.ts is long epoch nanos (nanosAsLong); the watermark needs a real
timestamp column, derived with timestamp_micros(ts DIV 1000) — integer
division, exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "1 hour"


def with_event_time(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Derive the watermarkable timestamp from the long-nanos column."""
    return events.withColumn(
        "event_time", F.timestamp_micros(F.expr(f"{ts_col} DIV 1000"))
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """First-seen-wins streaming dedup with watermark-bounded state."""
    keys = keys or ["event_id"]
    return (
        with_event_time(events)
        .withWatermark("event_time", watermark)
        .dropDuplicates(keys)
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Dedup only within the watermark horizon: a key recurring after
    the gap is a new logical event."""
    keys = keys or ["event_id"]
    return (
        with_event_time(events)
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(keys)
    )
