"""Session path mining: top ordered event-type journeys.

``transitions.py`` answers "what usually follows X?" (first-order
Markov pairs); this module answers the product question one level up:
"what are the most common WHOLE journeys?" — the ordered sequence of
event types a user produces within a session, counted across all
sessions.  Journey tables drive funnel discovery (which paths convert)
and are the label source for next-event models.

Session key = (user_id, utc day): deterministic, join-free, and the
grain the retention/DAU operators already use.  Paths are capped at
the first MAX_PATH_LEN events — the cap is what bounds both the
row_number window state and the path-string width at 100 TB (an
uncapped hot user would otherwise build a megabyte string in one
aggregation buffer).

Scale shape: one hash exchange on (user_id, day) feeds the
row_number window, the cap filter, AND the path assembly (group keys
match the window partition, so Spark reuses the partitioning); the
final path count is a groupBy over the tiny distinct-path table, and
top-k runs as TakeOrderedAndProject.  Ordering ties break on
event_id (the transitions.py convention), so the path strings are
deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import load_table, ts_ms

MAX_PATH_LEN = 8
PATH_TOP_K = 20
DAY_MS = 86_400_000


def session_paths(ev: DataFrame) -> DataFrame:
    """(user_id, day, path) — '>'-joined event types of the first
    MAX_PATH_LEN events per user-day, ordered by (ts, event_id)."""
    ms = ts_ms(ev, "ts")
    base = ev.select(
        "user_id",
        ms.alias("ms"),
        "event_id",
        "event_type",
    ).withColumn("day", F.expr(f"ms DIV {DAY_MS}"))
    w = Window.partitionBy("user_id", "day").orderBy("ms", "event_id")
    capped = base.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= MAX_PATH_LEN
    )
    # collect_list order is partition-internal and unspecified —
    # sorting the (rn, event_type) structs makes the path
    # deterministic regardless of task scheduling
    path = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("rn", "event_type"))
            ),
            lambda x: x["event_type"],
        ),
        ">",
    )
    return capped.groupBy("user_id", "day").agg(path.alias("path"))


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 user-day journeys by frequency (ties: path asc)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        session_paths(ev)
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(PATH_TOP_K)
    )


SESSION_PATHS_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_ms(ts) // {DAY_MS} AS day, epoch_ms(ts) AS ms,
         event_id, event_type
  FROM events
),
rn AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id, day ORDER BY ms, event_id) AS rn
  FROM ev
),
paths AS (
  SELECT user_id, day, STRING_AGG(event_type, '>' ORDER BY rn) AS path
  FROM rn WHERE rn <= {MAX_PATH_LEN}
  GROUP BY user_id, day
)
SELECT path, COUNT(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path LIMIT {PATH_TOP_K}
"""
