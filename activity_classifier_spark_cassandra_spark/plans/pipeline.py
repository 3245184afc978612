"""The batch feature pipeline (reference entry point #1,
job/RecognizeActivity.java:34-148) re-expressed as ONE lazy Spark plan.

Reference lifecycle: collect user ids to the driver, nested
for-user/for-activity loop issuing one Cassandra query per pair, a
per-window driver loop running ~9 Spark jobs per window, features
appended to a driver ArrayList (SURVEY.md §3 — thousands of tiny jobs,
driver-memory-bound).  Here the whole thing is:

    read -> session_id (lag + running sum) -> window_id (floor bucket)
         -> groupBy(user, type, session, window).agg(features) -> label

i.e. one shuffle on the series keys (reused by every later stage — the
window partitioning satisfies the groupBy's clustering) plus Catalyst's
partial aggregation.  At 100 TB the same plan holds: the exchange is
hash(user_id, event_type); skewed users are handled by AQE skew-join /
salting, and nothing ever lands on the driver.

The driver testdata's ``events`` table plays the sensor-table role
(TESTDATA.md): event_type ≙ activity, value ≙ one acceleration axis,
epoch-millis ≙ raw ticks.  Every query here has a DuckDB oracle SQL
string next to it; floats are rounded identically on both sides so the
order-insensitive value hash matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import (
    EVENT_TYPE_LABELS,
    EVENTS_SESSION_GAP_MS,
    EVENTS_WINDOW_MS,
)
from ..functions.labels import encode_event_type, label_case_sql
from ..operators.features import extract_features
from ..operators.sessions import session_bounds, with_session_id
from ..operators.windows import with_window_id
from ..sources.io import load_table, ts_ms

KEYS = ["user_id", "event_type"]
GROUP = ["user_id", "event_type", "session_id", "window_id"]


def event_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The S1 scan + P1 projection: events as (series keys, ms ticks,
    value).  Column pruning reaches the parquet reader via Catalyst."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        # canonical epoch-ms long (sources/io.ts_ms): integer arithmetic
        # either encoding, matching DuckDB's epoch_ms truncation.
        ts_ms(ev).alias("ts_ms"),
        "value",
    )


def sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_session_id(
        event_samples(spark, sf_dir),
        keys=KEYS,
        ts_col="ts_ms",
        gap=EVENTS_SESSION_GAP_MS,
        tiebreak=["event_id"],
    )


def windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_window_id(
        sessionized(spark, sf_dir),
        keys=KEYS,
        ts_col="ts_ms",
        window_ticks=EVENTS_WINDOW_MS,
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1-W3: per-session bounds (the distributed defineInterval)."""
    b = session_bounds(
        sessionized(spark, sf_dir),
        keys=KEYS,
        ts_col="ts_ms",
        window_ticks=EVENTS_WINDOW_MS,
    )
    return b.select(
        "user_id",
        "event_type",
        F.col("session_id").cast("long").alias("session_id"),
        "session_start",
        "session_end",
        "n_rows",
        "n_windows",
    )


def q_session_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4-W5 + A3-A8 + P6/P7/P9 + P10: the flagship feature frame."""
    feats = extract_features(
        windowed(spark, sf_dir),
        group_cols=GROUP,
        axes={"v": "value"},
        ts_col="ts_ms",
        tiebreak=["event_id"],
    )
    return feats.select(
        "user_id",
        "event_type",
        F.col("session_id").cast("long").alias("session_id"),
        F.col("window_id").cast("long").alias("window_id"),
        "n_samples",
        F.round("mean_v", 6).alias("mean_v"),
        F.round("var_v", 6).alias("var_v"),
        F.round("avg_abs_diff_v", 6).alias("avg_abs_diff_v"),
        F.round("resultant", 6).alias("resultant"),
        F.round("avg_time_peak", 6).alias("avg_time_peak"),
        encode_event_type().alias("label"),
    )


def q_session_features_3axis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FULL 11-feature vector shape
    (job/RecognizeActivity.java:173-185): mean/var/mean-abs-dev per
    axis (x,y,z) + resultant over all three + peak timing on the y
    axis.  The test events table carries one sensor value, so the
    three axes are synthesized with fixed arithmetic (x=v, y=0.2v+1,
    z=v-2) — deterministic, engine-exact IEEE ops, so the DuckDB
    oracle reproduces them bit-for-bit.  The y multiplier is chosen so
    derived variances stay OFF ROUND(…,6) half-ties: the source values
    sit on a 0.01 grid, so an n=2 window has var = (c·0.01k)²/2; with
    c=0.2 that is 2e-6·k² (exact micro-grid multiples, tie-free — the
    same property x and z enjoy), while c=0.5 or 0.3 yields odd
    multiples of 5e-7, exact .5-ties that Spark (BigDecimal HALF_UP)
    and DuckDB (scaled std::round) break differently.  The plan is identical to the
    1-axis flagship: one exchange, all-builtin aggregates."""
    tri = (
        windowed(spark, sf_dir)
        .withColumn("acc_x", F.col("value"))
        .withColumn("acc_y", F.col("value") * 0.2 + 1.0)
        .withColumn("acc_z", F.col("value") - 2.0)
    )
    feats = extract_features(
        tri,
        group_cols=GROUP,
        axes={"x": "acc_x", "y": "acc_y", "z": "acc_z"},
        ts_col="ts_ms",
        peak_axis="acc_y",
        tiebreak=["event_id"],
        two_pass_var=True,
    )
    out = feats.select(
        "user_id",
        "event_type",
        F.col("session_id").cast("long").alias("session_id"),
        F.col("window_id").cast("long").alias("window_id"),
        "n_samples",
        *[
            F.round(f"{stat}_{ax}", 6).alias(f"{stat}_{ax}")
            for stat in ("mean", "var", "avg_abs_diff")
            for ax in ("x", "y", "z")
        ],
        F.round("resultant", 6).alias("resultant"),
        F.round("avg_time_peak", 6).alias("avg_time_peak"),
        encode_event_type().alias("label"),
    )
    return out


def q_session_features_skewres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship feature frame on the SKEW-RESISTANT path —
    bit-identical output (the driver registers it under the SAME
    oracle SQL as q_session_features):

      * ``sessionize_skew_hybrid`` detects hot (user_id, event_type)
        keys and routes ONLY them through the time-bucketed
        sessionizer + broadcast-metadata start join (bounded tasks,
        genuinely tiny broadcasts); cold keys keep the plain
        one-exchange window path; union before windowing math;
      * the feature groupBy is already skew-safe (partial aggregation;
        grouping keys include session_id/window_id, so a hot key is
        spread over its windows).

    The threshold scales with the table — max(13, n_rows/1000) — and
    since round 7 it is derived LAZILY inside the detection job
    (``hot_keys_adaptive``: the total is a window-sum over the per-key
    counts frame), so building this DataFrame triggers zero Spark jobs
    (pinned by tests/test_sessions.py) and the events table is scanned
    once for detection, not twice.  The routing outcome is unchanged:
    the driver's sf0.01 oracle run still pushes roughly half the keys
    down EACH branch (sf0.01 per-key counts span 3-24, threshold 13)
    while larger inputs route only genuinely hot keys (sf0.1:
    threshold 100; the 10M-row probe: 10k — just the engineered hot
    key); production uses the 1M default.  Measured at the 100x probe
    with a >=20% hot key: see BASELINE.md round-6 skew table."""
    from ..operators.sessions import (
        hot_keys_adaptive,
        sessionize_skew_hybrid,
    )

    samples = event_samples(spark, sf_dir)
    d = sessionize_skew_hybrid(
        samples,
        keys=KEYS,
        ts_col="ts_ms",
        gap=EVENTS_SESSION_GAP_MS,
        tiebreak=["event_id"],
        window_ticks=EVENTS_WINDOW_MS,
        hot_keys_frame=hot_keys_adaptive(
            samples, KEYS, min_rows=13, frac_denom=1000
        ),
    )
    feats = extract_features(
        d,
        group_cols=GROUP,
        axes={"v": "value"},
        ts_col="ts_ms",
        tiebreak=["event_id"],
    )
    return feats.select(
        "user_id",
        "event_type",
        F.col("session_id").cast("long").alias("session_id"),
        F.col("window_id").cast("long").alias("window_id"),
        "n_samples",
        F.round("mean_v", 6).alias("mean_v"),
        F.round("var_v", 6).alias("var_v"),
        F.round("avg_abs_diff_v", 6).alias("avg_abs_diff_v"),
        F.round("resultant", 6).alias("resultant"),
        F.round("avg_time_peak", 6).alias("avg_time_peak"),
        encode_event_type().alias("label"),
    )


# ---------------------------------------------------------------- oracles

_BASE_CTES = f"""
WITH src AS (
  SELECT event_id, user_id, event_type, value, epoch_ms(ts) AS ts_ms
  FROM events
), flagged AS (
  SELECT *,
    CASE WHEN ts_ms - LAG(ts_ms) OVER (PARTITION BY user_id, event_type
         ORDER BY ts_ms, event_id) > {EVENTS_SESSION_GAP_MS}
         THEN 1 ELSE 0 END AS is_new
  FROM src
), sess AS (
  SELECT *,
    CAST(SUM(is_new) OVER (PARTITION BY user_id, event_type
         ORDER BY ts_ms, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS session_id
  FROM flagged
)
"""

SESSIONIZE_SQL = (
    _BASE_CTES
    + f"""
SELECT user_id, event_type, session_id,
  MIN(ts_ms) AS session_start,
  MAX(ts_ms) AS session_end,
  COUNT(*) AS n_rows,
  CAST(FLOOR((MAX(ts_ms) - MIN(ts_ms)) / {EVENTS_WINDOW_MS}) AS BIGINT)
    AS n_windows
FROM sess
GROUP BY user_id, event_type, session_id
"""
)

SESSION_FEATURES_SQL = (
    _BASE_CTES
    + f""", win AS (
  SELECT *,
    MIN(ts_ms) OVER (PARTITION BY user_id, event_type, session_id)
      AS session_start
  FROM sess
), winid AS (
  SELECT *,
    CAST(FLOOR((ts_ms - session_start) / {EVENTS_WINDOW_MS}) AS BIGINT)
      AS window_id
  FROM win
), helpers AS (
  SELECT *,
    AVG(value) OVER g AS mean_in_group,
    CASE WHEN CAST(TRUNC(value) AS BIGINT) > 0.9 * (MAX(value) OVER g)
         THEN ts_ms END AS peak_ts
  FROM winid
  WINDOW g AS (PARTITION BY user_id, event_type, session_id, window_id)
), peaked AS (
  SELECT *,
    LAST_VALUE(peak_ts IGNORE NULLS) OVER (
      PARTITION BY user_id, event_type, session_id, window_id
      ORDER BY ts_ms, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_peak
  FROM helpers
)
SELECT user_id, event_type, session_id, window_id,
  COUNT(*) AS n_samples,
  ROUND(AVG(value), 6) AS mean_v,
  ROUND(VAR_SAMP(value), 6) AS var_v,
  ROUND(AVG(ABS(value - mean_in_group)), 6) AS avg_abs_diff_v,
  ROUND(AVG(SQRT(value * value)), 6) AS resultant,
  ROUND(COALESCE(AVG(CASE WHEN peak_ts IS NOT NULL
                           AND peak_ts - prev_peak > 0
                          THEN CAST(peak_ts - prev_peak AS DOUBLE) END),
                 0.0), 6) AS avg_time_peak,
  {label_case_sql("event_type", EVENT_TYPE_LABELS)} AS label
FROM peaked
GROUP BY user_id, event_type, session_id, window_id
"""
)


SESSION_FEATURES_3AXIS_SQL = (
    _BASE_CTES
    + f""", tri AS (
  SELECT *, value AS acc_x, value * 0.2 + 1.0 AS acc_y,
         value - 2.0 AS acc_z
  FROM sess
), win AS (
  SELECT *,
    MIN(ts_ms) OVER (PARTITION BY user_id, event_type, session_id)
      AS session_start
  FROM tri
), winid AS (
  SELECT *,
    CAST(FLOOR((ts_ms - session_start) / {EVENTS_WINDOW_MS}) AS BIGINT)
      AS window_id
  FROM win
), helpers AS (
  SELECT *,
    AVG(acc_x) OVER g AS mean_x_g,
    AVG(acc_y) OVER g AS mean_y_g,
    AVG(acc_z) OVER g AS mean_z_g,
    CASE WHEN CAST(TRUNC(acc_y) AS BIGINT) > 0.9 * (MAX(acc_y) OVER g)
         THEN ts_ms END AS peak_ts
  FROM winid
  WINDOW g AS (PARTITION BY user_id, event_type, session_id, window_id)
), peaked AS (
  SELECT *,
    LAST_VALUE(peak_ts IGNORE NULLS) OVER (
      PARTITION BY user_id, event_type, session_id, window_id
      ORDER BY ts_ms, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_peak
  FROM helpers
)
SELECT user_id, event_type, session_id, window_id,
  COUNT(*) AS n_samples,
  ROUND(AVG(acc_x), 6) AS mean_x,
  ROUND(AVG(acc_y), 6) AS mean_y,
  ROUND(AVG(acc_z), 6) AS mean_z,
  ROUND(SUM((acc_x - mean_x_g) * (acc_x - mean_x_g))
        / NULLIF(COUNT(*) - 1, 0), 6) AS var_x,
  ROUND(SUM((acc_y - mean_y_g) * (acc_y - mean_y_g))
        / NULLIF(COUNT(*) - 1, 0), 6) AS var_y,
  ROUND(SUM((acc_z - mean_z_g) * (acc_z - mean_z_g))
        / NULLIF(COUNT(*) - 1, 0), 6) AS var_z,
  ROUND(AVG(ABS(acc_x - mean_x_g)), 6) AS avg_abs_diff_x,
  ROUND(AVG(ABS(acc_y - mean_y_g)), 6) AS avg_abs_diff_y,
  ROUND(AVG(ABS(acc_z - mean_z_g)), 6) AS avg_abs_diff_z,
  ROUND(AVG(SQRT(acc_x * acc_x + acc_y * acc_y + acc_z * acc_z)), 6)
    AS resultant,
  ROUND(COALESCE(AVG(CASE WHEN peak_ts IS NOT NULL
                           AND peak_ts - prev_peak > 0
                          THEN CAST(peak_ts - prev_peak AS DOUBLE) END),
                 0.0), 6) AS avg_time_peak,
  {label_case_sql("event_type", EVENT_TYPE_LABELS)} AS label
FROM peaked
GROUP BY user_id, event_type, session_id, window_id
"""
)
