"""Sessionization fixtures (FIXTURES.md §4; reference
src/test/java/com/actitracker/data/PrepareDataTest.java:22-105).

The 18-timestamp fixture reproduces the reference's golden outputs
under the legacy gap=100M (the tests predate the Constants.java change
to 300 000 — FIXTURES.md documents the discrepancy), and pins the
5-interval outcome (the reference's own code emits the 0-window
{480M, 490M} session its stale test omits).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from activity_classifier_spark_cassandra_spark.constants import (
    LEGACY_SESSION_GAP_TICKS,
    SESSION_GAP_TICKS,
)
from activity_classifier_spark_cassandra_spark.operators.sessions import (
    session_bounds,
    with_session_id,
)

M = 1_000_000
# 18 ascending timestamps; in-segment diffs 10M-60M; four gaps of
# 110M/110M/120M/110M (FIXTURES.md §4 reconstruction).
TS18 = [
    10 * M, 20 * M, 40 * M, 50 * M,                     # segment 1
    160 * M, 190 * M,                                   # segment 2
    300 * M, 310 * M, 320 * M, 330 * M, 340 * M, 360 * M,  # segment 3
    480 * M, 490 * M,                                   # segment 4
    600 * M, 610 * M, 620 * M, 640 * M,                 # segment 5
]

SCHEMA = T.StructType(
    [
        T.StructField("u", T.IntegerType()),
        T.StructField("timestamp", T.LongType()),
    ]
)


@pytest.fixture(scope="module")
def ts_df(spark):
    return spark.createDataFrame([(1, t) for t in TS18], schema=SCHEMA)


def test_fixture_shape(ts_df):
    assert ts_df.count() == 18  # PrepareDataTest.java:42
    r = ts_df.agg(F.min("timestamp"), F.max("timestamp")).collect()[0]
    assert r[0] == 10 * M and r[1] == 640 * M  # :32-33


def test_jumps_under_legacy_gap(spark, ts_df):
    """4 session gaps (PrepareDataTest.java:58-78) => 5 sessions."""
    s = with_session_id(
        ts_df, keys=["u"], gap=LEGACY_SESSION_GAP_TICKS
    )
    assert s.agg(F.max("session_id")).collect()[0][0] == 4

    # the gap boundaries are exactly the asserted jump pairs
    w_prev = (
        s.withColumn(
            "prev",
            F.lag("timestamp").over(
                __import__("pyspark.sql", fromlist=["Window"]).Window
                .partitionBy("u").orderBy("timestamp")
            ),
        )
        .filter(F.col("timestamp") - F.col("prev") > LEGACY_SESSION_GAP_TICKS)
        .select("prev", "timestamp")
        .orderBy("prev")
        .collect()
    )
    assert [(r["prev"], r["timestamp"]) for r in w_prev] == [
        (50 * M, 160 * M),
        (190 * M, 300 * M),
        (360 * M, 480 * M),
        (490 * M, 600 * M),
    ]


def test_intervals_five_sessions_including_zero_window(spark, ts_df):
    """defineInterval code semantics: 5 intervals @ W=30M, including
    the 0-window {480M, 490M} the stale reference test omits
    (FIXTURES.md §4 'known discrepancy')."""
    s = with_session_id(ts_df, keys=["u"], gap=LEGACY_SESSION_GAP_TICKS)
    b = (
        session_bounds(s, keys=["u"], window_ticks=30 * M)
        .orderBy("session_id")
        .collect()
    )
    got = [(r["session_start"], r["session_end"], r["n_windows"]) for r in b]
    assert got == [
        (10 * M, 50 * M, 1),
        (160 * M, 190 * M, 1),
        (300 * M, 360 * M, 2),
        (480 * M, 490 * M, 0),   # emitted by code, missing from ref test
        (600 * M, 640 * M, 1),
    ]


def test_current_constant_makes_every_diff_a_jump(spark, ts_df):
    """Under the current Constants.jump=300 000 every 10M+ diff is a
    gap: 18 rows -> 18 singleton sessions (the documented behavior the
    reference's stale tests contradict)."""
    s = with_session_id(ts_df, keys=["u"], gap=SESSION_GAP_TICKS)
    assert s.agg(F.max("session_id")).collect()[0][0] == 17


def test_first_row_of_series_is_session_zero(spark):
    """Null lag on the first row maps to flag 0 (the reference trims
    the first element before zipping, PrepareData.java:19-20)."""
    df = spark.createDataFrame([(1, 100), (2, 100)], schema=SCHEMA)
    s = with_session_id(df, keys=["u"], gap=10)
    assert [r["session_id"] for r in s.collect()] == [0, 0]
