"""Incremental aggregate maintenance (materialized-view delta merge).

At 100 TB you do not recompute a per-user metrics table by rescanning
all history when a day of new events lands.  The scalable contract is
an *algebraic state* table at (key, day) grain — counts, sums, sums of
squares, min/max — which merges by union + re-aggregation:

  state(history) ⊎ state(delta) →agg  final metrics

Every stored column is a commutative monoid under the merge agg, so
the merged result is bit-identical in count/min/max and float-sum
associativity-equivalent to the full recompute (the oracle IS the full
recompute).  Merge cost is O(|delta| + |state|), never O(|history|);
derived metrics (mean, sample variance) are computed only after the
merge, from the merged sums — averaging averages would weight days
wrongly, and pre-derived variance does not merge at all.

The day split predicate compares the RAW ts column against a typed
literal (``ts_literal``) so both the history and the delta scan push
their range filter into parquet row-group pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAY_MS = 86_400_000
# Delta cutoff: events on/after 2024-01-20T00:00:00Z are "today's
# partition"; everything before is the stored history state.
CUTOFF_MS = 1_705_708_800_000


def daily_state(ev: DataFrame) -> DataFrame:
    """Mergeable per-(user, day) partial-aggregate state.

    Sums accumulate in DECIMAL, not DOUBLE: the source values carry 2
    decimal places, so decimal partials are EXACT and merge-order-
    independent — a float state would make the merged result differ
    from the full recompute in the last ulp (and flip a ROUND at the
    oracle), which is precisely the kind of nondeterminism a
    maintained view must not have."""
    from ..sources.io import ts_ms, ts_ms_sql

    # integer DIV for the day bucket (not `/` + cast: column `/` is
    # double division, which silently goes lossy past 2^53 — exactly
    # the trap ts_ms_sql exists to avoid for epoch-scale arithmetic)
    ms = ts_ms(ev)
    day = F.expr(f"({ts_ms_sql(ev)}) DIV {DAY_MS}")
    v = F.col("value").cast("decimal(18,2)")
    return (
        ev.select(
            "user_id",
            day.alias("day"),
            ms.alias("ms"),
            v.alias("v"),
        )
        .groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("sum_v"),
            F.sum(F.col("v") * F.col("v")).alias("sum_v2"),
            F.min("ms").alias("min_ms"),
            F.max("ms").alias("max_ms"),
        )
    )


def merge_states(*states: DataFrame) -> DataFrame:
    """Union day-grain states and fold to final per-user metrics.

    Works for any number of state tables (multi-day backfills merge
    the same way), and tolerates the same (user, day) appearing in
    several inputs — the re-aggregation sums partials, it does not
    assume disjointness.
    """
    st = states[0]
    for s in states[1:]:
        st = st.unionByName(s)
    merged = st.groupBy("user_id").agg(
        F.sum("cnt").alias("n"),
        F.countDistinct("day").alias("n_days"),
        F.sum("sum_v").alias("sv"),
        F.sum("sum_v2").alias("sv2"),
        F.min("min_ms").alias("first_ms"),
        F.max("max_ms").alias("last_ms"),
    )
    # Derive floats from the exact decimal sums with a SINGLE double
    # division each — numerator and denominator are exact, so the
    # result is bit-identical to any other engine doing the same math.
    return merged.select(
        "user_id",
        F.col("n").alias("n_events"),
        "n_days",
        F.col("sv").cast("double").alias("sum_value"),
        F.round(F.col("sv").cast("double") / F.col("n"), 6).alias(
            "mean_value"
        ),
        F.round(
            (F.col("sv2") * F.col("n") - F.col("sv") * F.col("sv")).cast(
                "double"
            )
            / (F.col("n").cast("double") * (F.col("n") - F.lit(1))),
            6,
        ).alias("var_value"),
        "first_ms",
        "last_ms",
    ).orderBy("user_id")


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """History-state + one-day-delta merge, hash-checked against the
    full recompute: the proof that the state schema is algebraic."""
    from ..sources.io import load_table, ts_literal

    ev = load_table(spark, sf_dir, "events")
    cut = ts_literal(ev, CUTOFF_MS)
    history = daily_state(ev.where(F.col("ts") < cut))
    delta = daily_state(ev.where(F.col("ts") >= cut))
    return merge_states(history, delta)


INCREMENTAL_AGG_SQL = f"""
WITH sums AS (
  SELECT user_id,
         COUNT(*) AS n,
         COUNT(DISTINCT epoch_ms(ts) // {DAY_MS}) AS n_days,
         SUM(CAST(value AS DECIMAL(18,2))) AS sv,
         SUM(CAST(value AS DECIMAL(18,2))
             * CAST(value AS DECIMAL(18,2))) AS sv2,
         MIN(epoch_ms(ts)) AS first_ms,
         MAX(epoch_ms(ts)) AS last_ms
  FROM events
  GROUP BY user_id
)
SELECT user_id,
       n AS n_events,
       n_days,
       CAST(sv AS DOUBLE) AS sum_value,
       ROUND(CAST(sv AS DOUBLE) / n, 6) AS mean_value,
       ROUND(CAST(sv2 * n - sv * sv AS DOUBLE)
             / (CAST(n AS DOUBLE) * (n - 1)), 6) AS var_value,
       first_ms,
       last_ms
FROM sums
ORDER BY user_id
"""
