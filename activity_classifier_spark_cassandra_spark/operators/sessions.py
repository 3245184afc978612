"""Sessionization (reference operators W1-W3, SURVEY.md §2.5).

The reference computes adjacent timestamp deltas by zipping two shifted
copies of a sorted single-partition RDD (data/PrepareData.java:17-25),
flags a new recording session where delta > gap
(data/PrepareData.java:27-31, gap = Constants.jump = 300 000), then
assembles [start, end, n_windows] interval triples **on the driver**
(data/PrepareData.java:34-56).

Spark-first: one window spec partitioned by the series keys —
``lag`` for the delta, a cumulative sum of the gap flag for the session
id — and a grouped min/max for the bounds.  Everything stays
distributed; the shuffle is a single hash exchange on the series keys,
and the same exchange is reused by every downstream per-session /
per-window aggregation (their grouping keys are supersets).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..constants import SESSION_GAP_TICKS, WINDOW_TICKS


def with_session_id(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "timestamp",
    gap: int = SESSION_GAP_TICKS,
    tiebreak: Sequence[str] = (),
    out_col: str = "session_id",
) -> DataFrame:
    """Add a 0-based ``session_id`` per `keys` series.

    A new session starts where ts - lag(ts) > gap (strict >, matching
    data/PrepareData.java:29).  The first row of a series has a null
    lag, which the CASE's ELSE maps to 0 — exactly the reference's
    "first element is trimmed before zip" behavior
    (data/PrepareData.java:19-20).
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    is_new: Column = F.when(
        F.col(ts_col) - F.lag(ts_col).over(w) > F.lit(gap), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(is_new).over(running))


def session_bounds(
    df_with_sessions: DataFrame,
    keys: Sequence[str],
    ts_col: str = "timestamp",
    window_ticks: int = WINDOW_TICKS,
    session_col: str = "session_id",
) -> DataFrame:
    """Per-session [start, end, n_rows, n_windows] — the distributed
    replacement for the driver-side interval list of
    data/PrepareData.java:34-56.

    ``n_windows = (end - start) / W`` with Java **long division**: the
    reference wraps it in Math.round (data/PrepareData.java:44-52) but
    the operand is already integral, so the round is a no-op and the
    semantics are floor.  0-window sessions are emitted (see
    FIXTURES.md §4: the reference code emits them even though its stale
    test asserts otherwise).
    """
    return df_with_sessions.groupBy(*keys, session_col).agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_rows"),
        F.floor((F.max(ts_col) - F.min(ts_col)) / F.lit(window_ticks))
        .cast("long")
        .alias("n_windows"),
    )
