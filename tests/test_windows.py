"""Tumbling-window assignment (W4): floor-bucketing vs the reference's
exclusive-bounds loop (job/RecognizeActivity.java:80-119,243-247).
Pins the documented boundary divergence and the drop_boundary_rows
parity mode (operators/windows.py docstring)."""

from __future__ import annotations

from pyspark.sql import types as T

from activity_classifier_spark_cassandra_spark.operators.sessions import (
    with_session_id,
)
from activity_classifier_spark_cassandra_spark.operators.windows import (
    with_window_id,
)

SCHEMA = T.StructType(
    [
        T.StructField("u", T.IntegerType()),
        T.StructField("timestamp", T.LongType()),
    ]
)

W = 100  # window ticks


def _windowed(spark, ts, drop=False):
    df = spark.createDataFrame([(1, t) for t in ts], schema=SCHEMA)
    s = with_session_id(df, keys=["u"], gap=10_000)
    out = with_window_id(
        s, keys=["u"], window_ticks=W, drop_boundary_rows=drop
    )
    return {r["timestamp"]: r["window_id"] for r in out.collect()}


def test_floor_bucketing(spark):
    got = _windowed(spark, [0, 10, 99, 150, 250])
    assert got == {0: 0, 10: 0, 99: 0, 150: 1, 250: 2}


def test_boundary_row_divergence(spark):
    """A sample at exactly session_start + j*W: floor-bucketing keeps
    it in window j; the reference's exclusive bounds drop it
    (RecognizeActivity.java:244-246).  Both behaviors pinned."""
    ts = [0, 50, 100, 150]  # 100 = start + 1*W, a boundary row
    assert _windowed(spark, ts)[100] == 1  # kept, window 1
    dropped = _windowed(spark, ts, drop=True)
    # parity mode: boundary row AND the session's first sample
    # (ts == start, excluded by `ts > start`) are gone
    assert set(dropped) == {50, 150}


def test_windows_restart_per_session(spark):
    """window_id is relative to each session's own start."""
    ts = [0, 50, 20_000, 20_150]  # gap 10k splits two sessions
    got = _windowed(spark, ts)
    assert got == {0: 0, 50: 0, 20_000: 0, 20_150: 1}
