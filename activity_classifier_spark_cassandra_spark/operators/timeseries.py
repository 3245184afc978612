"""Time-series regularization over the event stream: resample to a
fixed calendar grid, fill gaps, and forward-fill the last observation.

The reference's sensor pipeline implicitly assumes a dense regular
sample stream (RecognizeActivity windows by fixed time buckets); real
event data has holes.  Gap-fill = densify (per-key calendar spine via
``sequence``/``explode``) + left join the observed buckets + a
``last(..., ignorenulls)`` running window — all built-ins, so the plan
is two keyed aggregations and one shuffle join on (key, bucket).

Scale: the spine is generated from per-key min/max bounds — O(keys ×
span) rows, independent of the raw event count; the raw stream is
touched exactly once (the per-bucket aggregation, map-side partial).
The forward-fill window partitions by key — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import load_table, ts_ms, ts_ms_sql
from .dedup import _shared

DAY_MS = 86_400_000


def resample_gapfill(events: DataFrame) -> DataFrame:
    """Per-user daily grid from first to last active day: event count,
    daily value sum, gap flag, and forward-filled value.

    ``events`` needs (user_id, ts_ms, value); ``ts_ms`` epoch millis.
    """
    per_day = _shared(
        events.groupBy(
            "user_id",
            F.expr(f"ts_ms DIV {DAY_MS}").alias("day"),
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("day_value"),
        )
    )
    bounds = per_day.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    w = Window.partitionBy("user_id").orderBy("day")
    return (
        grid.join(per_day, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.col("day_value").isNull().alias("is_gap"),
            F.last("day_value", ignorenulls=True).over(w).alias(
                "value_ffill"
            ),
        )
    )


def q_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "events")
    ev = raw.select("user_id", ts_ms(raw).alias("ts_ms"), "value")
    return resample_gapfill(ev)


# --------------------------------------------- hierarchical rollup
HOUR_MS = 3_600_000


def time_rollup(events: DataFrame) -> DataFrame:
    """Multi-granularity continuous aggregate (the hypertable rollup
    pattern): hour buckets from the raw stream, then day from hour and
    week from day — each coarser grain re-aggregates the one below it
    instead of rescanning the fact table.

    At 100 TB this is the whole game: the raw stream is shuffled ONCE
    (into hour buckets, map-side partial so each task emits at most
    |hours| rows), and the day/week grains aggregate frames of
    O(hours) / O(days) rows — the cascade costs asymptotically nothing
    beyond the first rollup, exactly how TimescaleDB/Druid maintain
    their rollup hierarchies.  Sums ride in decimal so hour->day->week
    re-aggregation is bit-identical to a direct day/week aggregation
    (float addition order would not be).

    ``events`` needs (ts_ms, value).
    """
    hourly = _shared(
        events.groupBy(
            F.expr(f"ts_ms DIV {HOUR_MS}").alias("b")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
        )
    )
    daily = _shared(
        hourly.groupBy(F.expr("b DIV 24").alias("b")).agg(
            F.sum("n").alias("n"), F.sum("sv").alias("sv")
        )
    )
    weekly = daily.groupBy(F.expr("b DIV 7").alias("b")).agg(
        F.sum("n").alias("n"), F.sum("sv").alias("sv")
    )

    def out(df: DataFrame, grain: str, bucket_ms: int) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            (F.col("b") * bucket_ms).cast("long").alias("bucket_start_ms"),
            F.col("n").cast("long").alias("n_events"),
            F.round(F.col("sv").cast("double"), 2).alias("sum_value"),
        )

    return (
        out(hourly, "hour", HOUR_MS)
        .unionByName(out(daily, "day", 24 * HOUR_MS))
        .unionByName(out(weekly, "week", 7 * 24 * HOUR_MS))
    )


def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "events")
    ev = raw.select(ts_ms(raw).alias("ts_ms"), "value")
    return time_rollup(ev)


RESAMPLE_GAPFILL_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, value FROM events
),
per_day AS (
  SELECT user_id, CAST(ts_ms // {DAY_MS} AS BIGINT) AS day,
         COUNT(*) AS n_events, ROUND(SUM(value), 2) AS day_value
  FROM ev GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
  FROM per_day GROUP BY 1
),
grid AS (
  SELECT user_id, UNNEST(generate_series(d0, d1)) AS day FROM bounds
)
SELECT g.user_id, g.day,
       CAST(COALESCE(p.n_events, 0) AS BIGINT) AS n_events,
       (p.day_value IS NULL) AS is_gap,
       last_value(p.day_value IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.day) AS value_ffill
FROM grid g LEFT JOIN per_day p USING (user_id, day)
"""


TIME_ROLLUP_SQL = f"""
WITH ev AS (
  SELECT epoch_ms(ts) AS ts_ms, CAST(value AS DECIMAL(18,6)) AS v
  FROM events
),
hourly AS (
  SELECT ts_ms // {HOUR_MS} AS b, COUNT(*) AS n, SUM(v) AS sv
  FROM ev GROUP BY 1
),
daily AS (
  SELECT b // 24 AS b, CAST(SUM(n) AS BIGINT) AS n, SUM(sv) AS sv
  FROM hourly GROUP BY 1
),
weekly AS (
  SELECT b // 7 AS b, CAST(SUM(n) AS BIGINT) AS n, SUM(sv) AS sv
  FROM daily GROUP BY 1
)
SELECT 'hour' AS grain, CAST(b * {HOUR_MS} AS BIGINT) AS bucket_start_ms,
       CAST(n AS BIGINT) AS n_events,
       ROUND(CAST(sv AS DOUBLE), 2) AS sum_value
FROM hourly
UNION ALL
SELECT 'day', CAST(b * {24 * HOUR_MS} AS BIGINT), CAST(n AS BIGINT),
       ROUND(CAST(sv AS DOUBLE), 2)
FROM daily
UNION ALL
SELECT 'week', CAST(b * {7 * 24 * HOUR_MS} AS BIGINT), CAST(n AS BIGINT),
       ROUND(CAST(sv AS DOUBLE), 2)
FROM weekly
"""


# ------------------------------------------------- per-entity trend
#
# Closed-form OLS (value ~ day) per user: slope/intercept from the
# normal equations over EXACT partial sums — the "is this metric
# drifting per entity" scan a monitoring pipeline runs over every
# user/device/tenant, and at 100 TB it is exactly one combinable
# groupBy (five sums per key), never a per-group model fit.
#
# Exactness recipe (the repo convention): x = day offset from the
# global min day (a 0..~30 integer after one broadcast scalar), so
# x, x² and Σ stay small exact integers; y sums ride in DECIMAL(18,6)
# (value carries ≤6 decimals).  Each output is then one fixed scalar
# sequence of IEEE double ops on the exact sums — bit-identical in
# Spark and DuckDB, like streaming/sessions._feature_aggs.  Degenerate
# groups (all events on one day → zero variance in x) get NULL
# slope/intercept on both engines via NULLIF.

def q_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # day bucket via integer DIV (ts_ms_sql convention; DAY_MS is the
    # module-wide day grain)
    dayc = F.expr(f"({ts_ms_sql(ev)}) DIV {DAY_MS}")
    rows = ev.select("user_id", dayc.alias("day"), "value")
    lo = rows.agg(F.min("day").alias("_lo"))
    g = (
        rows.crossJoin(F.broadcast(lo))
        .select(
            "user_id",
            (F.col("day") - F.col("_lo")).alias("x"),
            F.col("value").cast("decimal(18,6)").alias("y"),
        )
        # a NULL x or y row must not inflate n while being skipped by
        # the sums — that would silently skew the normal equations
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.expr("x * x")).alias("sx2"),
            F.sum("y").alias("sy"),
            F.sum(F.expr("x * y")).alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    sx2d = F.col("sx2").cast("double")
    syd = F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    den = F.nullif(nd * sx2d - sxd * sxd, F.lit(0.0))
    slope = (nd * sxyd - sxd * syd) / den
    intercept = (syd - slope * sxd) / nd
    return g.filter(F.col("n") >= 2).select(
        "user_id",
        F.col("n").alias("n_events"),
        F.round(slope, 6).alias("slope_per_day"),
        F.round(intercept, 6).alias("intercept"),
    )


USER_TREND_SQL = f"""
WITH rows_ AS (
  SELECT user_id, epoch_ms(ts) // {DAY_MS} AS day, value FROM events
),
lo AS (SELECT MIN(day) AS lo FROM rows_),
xy AS (
  SELECT user_id, day - lo AS x, CAST(value AS DECIMAL(18,6)) AS y
  FROM rows_ CROSS JOIN lo
  WHERE day IS NOT NULL AND value IS NOT NULL
),
g AS (
  SELECT user_id, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sx2,
         SUM(y) AS sy, SUM(x * y) AS sxy
  FROM xy GROUP BY user_id
),
g2 AS (
  SELECT *,
    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / NULLIF(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0) AS slope
  FROM g
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
  ROUND(slope, 6) AS slope_per_day,
  ROUND((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
        / CAST(n AS DOUBLE), 6) AS intercept
FROM g2 WHERE n >= 2
"""
