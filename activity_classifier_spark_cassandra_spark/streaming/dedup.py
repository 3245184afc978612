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

The watermark needs a real timestamp column; ``sources/io.ts_event_time``
derives it for either physical ts encoding (TIMESTAMP_NTZ cast under
the UTC session pin, or timestamp_micros(ns DIV 1000) for legacy
long-nanos data — integer division, exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.io import ts_event_time

DEFAULT_WATERMARK = "1 hour"


def with_event_time(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Derive the watermarkable timestamp from the raw ts column."""
    return events.withColumn("event_time", ts_event_time(events, ts_col))


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


# ----------------------------------------------------------- query
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming dedup code path executed on a batch frame (the
    watermark is a no-op outside a stream; stream-vs-batch equivalence
    is pinned by tests/test_streaming_dedup.py).  Input simulates an
    at-least-once feed by doubling every event; output summarizes the
    deduped stream per type, so a single surviving duplicate shifts
    both count and sum."""
    from ..sources.io import load_table

    ev = load_table(spark, sf_dir, "events")
    doubled = ev.unionAll(ev)
    return (
        dedup_stream(doubled)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


STREAM_DEDUP_SQL = """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM (
  SELECT DISTINCT * FROM (
    SELECT * FROM events UNION ALL SELECT * FROM events
  )
)
GROUP BY event_type
"""
