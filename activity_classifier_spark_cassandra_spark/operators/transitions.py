"""Event-sequence transition analytics: the per-user event-type bigram
(Markov transition) matrix over the event stream.

The reference's pipeline is per-user ordered-stream analysis (lag over
(user, time) — job/RecognizeActivity.java:60-75 builds exactly this
ordering for sessionization); the transition matrix is the same shape
pointed at sequence mining: lag the event_type within each user's
timeline, count (prev, next) pairs, and normalize within each prev
state.

Scale: the lag window hash-partitions on user_id (one exchange of the
raw stream, no global sort); the pair count is a groupBy over the tiny
(n_types²) key space, map-side partial — post-shuffle work is
O(|types|²), not O(events).  The per-prev normalization window runs on
the aggregated frame only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import load_table, ts_ms


def transition_matrix(events: DataFrame) -> DataFrame:
    """``events`` needs (user_id, event_id, ts_ms, event_type); ties on
    ts_ms break on event_id so the bigram stream is deterministic."""
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    pairs = events.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_prev = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_prev), 6).alias("p"),
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "events")
    ev = raw.select(
        "user_id",
        "event_id",
        ts_ms(raw).alias("ts_ms"),
        "event_type",
    )
    return transition_matrix(ev)


EVENT_TRANSITIONS_SQL = """
WITH ev AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type
  FROM events
),
pairs AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id
           ORDER BY ts_ms, event_id) AS prev_type,
         event_type AS next_type
  FROM ev
),
counts AS (
  SELECT prev_type, next_type, COUNT(*) AS n
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
FROM counts
"""
