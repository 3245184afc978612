"""Event-sequence analytics: funnel conversion and cohort retention.

The reference's event model stops at sessionization + per-window
features (RecognizeActivity.java:34-148); a product team running the
same event stream immediately asks the next two questions — "how many
users progress view → click → purchase?" and "how many users come back
k days after their first event?".  Both are pure DataFrame plans here.

Scale design (100 TB of events):
- The funnel's per-stage "first qualifying timestamp" tables are keyed
  by user_id, as are the joins that chain the stages — Spark reuses the
  hashpartitioning(user_id) across the agg→join→agg sequence, and user
  cardinality grows with data, so these stay shuffle joins on purpose
  (broadcasting "all users who viewed" is exactly the mistake that dies
  at scale; AQE will still broadcast if a stage's survivor set happens
  to be tiny).
- Retention reduces events to distinct (user, day) pairs FIRST — one
  partial-agg shuffle carries ≤ 31 rows per user regardless of how many
  raw events a hot user produced — then joins day-0 per user and
  re-aggregates by offset (≤ horizon rows out).

Timestamps: the raw events.ts is normalized by sources/io.ts_ticks to
an exact integer timeline (epoch micros for the current timestamp[us]
encoding; epoch nanos for legacy long data) — integer arithmetic keeps
window adds and day bucketing exact where double math would lose
precision.  Days since epoch = ticks DIV (ticks/ms) DIV 86.4e6,
matching DuckDB's `epoch_ms(ts) // 86400000`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table, ts_ms_sql, ts_ticks

DAY_MS = 86_400_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    ts_col: str = "ts_ticks",
    within: int | None = None,
) -> DataFrame:
    """Strictly-ordered funnel: a user is at stage k iff their earliest
    qualifying stage-k event is strictly after their earliest
    qualifying stage-(k-1) event — and, when ``within`` is set (in the
    units of ``ts_col``), no later than that plus the conversion window
    (without a window every user of a long-lived product eventually
    "converts", which measures nothing).  Returns one row per stage
    with the surviving count.  ``ts_col`` must be an exact integer
    timeline (see sources/io.ts_ticks) so the window add is exact."""
    ts = F.col(ts_col)
    reached = (
        events.filter(F.col("event_type") == stages[0])
        .groupBy("user_id")
        .agg(F.min(ts).alias("stage_ts"))
    )
    out = [(stages[0], reached)]
    for stage in stages[1:]:
        gate = ts > F.col("stage_ts")
        if within is not None:
            gate = gate & (ts <= F.col("stage_ts") + within)
        nxt = (
            events.filter(F.col("event_type") == stage)
            .join(reached, "user_id")
            .filter(gate)
            .groupBy("user_id")
            .agg(F.min(ts).alias("stage_ts"))
        )
        out.append((stage, nxt))
        reached = nxt
    counts = [
        df.agg(
            F.lit(i).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        )
        for i, (name, df) in enumerate(out)
    ]
    res = counts[0]
    for c in counts[1:]:
        res = res.unionByName(c)
    return res


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase with a 24-hour conversion window per hop."""
    ev = _events(spark, sf_dir)
    ticks, per_ms = ts_ticks(ev)
    ev = ev.select("user_id", "event_type", ticks.alias("ts_ticks"))
    return funnel_counts(
        ev,
        ["view", "click", "purchase"],
        within=86_400_000 * per_ms,
    )


FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS stage_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS stage_ts FROM events e
  JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.stage_ts
    AND e.ts <= v.stage_ts + INTERVAL 24 HOUR
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS stage_ts FROM events e
  JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.stage_ts
    AND e.ts <= c.stage_ts + INTERVAL 24 HOUR
  GROUP BY e.user_id
)
SELECT 0 AS stage_idx, 'view' AS stage, COUNT(*) AS n_users FROM v
UNION ALL
SELECT 1, 'click', COUNT(*) FROM c
UNION ALL
SELECT 2, 'purchase', COUNT(*) FROM p
"""


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention curve: for each day-offset k since a user's
    first event, how many distinct users were active."""
    ev = _events(spark, sf_dir)
    day = F.expr(f"({ts_ms_sql(ev)}) DIV {DAY_MS}")
    user_days = ev.select("user_id", day.alias("day")).distinct()
    day0 = user_days.groupBy("user_id").agg(F.min("day").alias("day0"))
    return (
        user_days.join(day0, "user_id")
        .groupBy((F.col("day") - F.col("day0")).alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


RETENTION_SQL = """
WITH user_days AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events
),
day0 AS (
  SELECT user_id, MIN(day) AS day0 FROM user_days GROUP BY user_id
)
SELECT ud.day - d.day0 AS day_offset, COUNT(DISTINCT ud.user_id) AS n_users
FROM user_days ud JOIN day0 d ON ud.user_id = d.user_id
GROUP BY ud.day - d.day0
"""


def q_daily_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + event volume per day — the monitoring query every event
    pipeline runs; one partial-agg exchange keyed by day."""
    ev = _events(spark, sf_dir)
    day = F.expr(f"({ts_ms_sql(ev)}) DIV {DAY_MS}")
    return ev.groupBy(day.alias("day")).agg(
        F.countDistinct("user_id").alias("dau"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


DAILY_ACTIVE_SQL = """
SELECT epoch_ms(ts) // 86400000 AS day,
       COUNT(DISTINCT user_id) AS dau,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY epoch_ms(ts) // 86400000
"""
