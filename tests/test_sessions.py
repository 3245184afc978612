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


def test_bucketed_sessionizer_equals_plain_on_edge_fixture(spark):
    """with_session_id_bucketed must be bit-identical to the plain
    window on every boundary shape: a session continuing across a
    bucket edge, a gap exactly == threshold (NOT a new session), empty
    buckets between events (new session decided against the last
    non-empty bucket), equal timestamps ordered by tiebreak across the
    board, and multiple interleaved keys."""
    from activity_classifier_spark_cassandra_spark.operators.sessions import (
        with_session_id_bucketed,
    )

    gap = 100
    rows = []
    # key 1: dense run crossing bucket edges (bucket = gap = 100):
    # ts 80..130 step 25 -> one session spanning buckets 0 and 1
    rows += [(1, t, i) for i, t in enumerate([80, 105, 130])]
    # gap exactly == threshold: 130 -> 230 is NOT new (strict >)
    rows += [(1, 230, 3)]
    # gap of 101 IS new
    rows += [(1, 331, 4)]
    # empty buckets: jump to 1000 (buckets 4..9 empty) -> new session
    rows += [(1, 1000, 5)]
    # equal timestamps, tiebreak decides order
    rows += [(1, 1000, 6), (1, 1000, 7)]
    # key 2 interleaved, own chain
    rows += [(2, 95, 0), (2, 300, 1), (2, 305, 2)]
    df = spark.createDataFrame(rows, "u long, ts long, eid long")

    plain = with_session_id(
        df, keys=["u"], ts_col="ts", gap=gap, tiebreak=["eid"]
    )
    bucketed = with_session_id_bucketed(
        df, keys=["u"], ts_col="ts", gap=gap, tiebreak=["eid"],
        bucket_ticks=gap,
    )
    key = lambda r: (r["u"], r["ts"], r["eid"])
    got_p = {key(r): r["session_id"] for r in plain.collect()}
    got_b = {key(r): r["session_id"] for r in bucketed.collect()}
    assert got_b == got_p
    # sanity on the hand-derivable chain for key 1
    assert got_p[(1, 80, 0)] == 0 and got_p[(1, 230, 3)] == 0
    assert got_p[(1, 331, 4)] == 1 and got_p[(1, 1000, 7)] == 2


def test_bucketed_sessionizer_equals_plain_on_events(spark):
    """Full-table equality on the sf0.001 events series keys."""
    from activity_classifier_spark_cassandra_spark.constants import (
        EVENTS_SESSION_GAP_MS,
    )
    from activity_classifier_spark_cassandra_spark.operators.sessions import (
        with_session_id_bucketed,
    )
    from activity_classifier_spark_cassandra_spark.plans.pipeline import (
        event_samples,
    )

    ev = event_samples(spark, "/root/testdata/sf0.001")
    kw = dict(
        keys=["user_id", "event_type"], ts_col="ts_ms",
        gap=EVENTS_SESSION_GAP_MS, tiebreak=["event_id"],
    )
    plain = with_session_id(ev, **kw)
    bucketed = with_session_id_bucketed(ev, **kw)
    key = ["user_id", "event_type", "event_id"]
    diff = (
        plain.select(*key, "session_id")
        .join(
            bucketed.select(*key, F.col("session_id").alias("sid_b")),
            key,
        )
        .filter(F.col("session_id") != F.col("sid_b"))
    )
    assert plain.count() == bucketed.count() == ev.count()
    assert diff.count() == 0


def test_skew_hybrid_equals_plain_path(spark):
    """sessionize_skew_hybrid (hot/cold routing) must reproduce the
    plain with_session_id + windowed-min path exactly on the sf0.001
    events, with a threshold low enough that BOTH branches carry
    keys."""
    from activity_classifier_spark_cassandra_spark.constants import (
        EVENTS_SESSION_GAP_MS,
        EVENTS_WINDOW_MS,
    )
    from activity_classifier_spark_cassandra_spark.operators.sessions import (
        hot_keys,
        sessionize_skew_hybrid,
    )
    from activity_classifier_spark_cassandra_spark.plans.pipeline import (
        event_samples,
    )

    ev = event_samples(spark, "/root/testdata/sf0.001")
    n_hot = hot_keys(ev, ["user_id", "event_type"], 14).count()
    n_keys = ev.select("user_id", "event_type").distinct().count()
    assert 0 < n_hot < n_keys  # both branches active

    hyb = sessionize_skew_hybrid(
        ev, keys=["user_id", "event_type"], ts_col="ts_ms",
        gap=EVENTS_SESSION_GAP_MS, tiebreak=["event_id"],
        window_ticks=EVENTS_WINDOW_MS, hot_min_rows=14,
    )
    plain_s = with_session_id(
        ev, keys=["user_id", "event_type"], ts_col="ts_ms",
        gap=EVENTS_SESSION_GAP_MS, tiebreak=["event_id"],
    )
    from activity_classifier_spark_cassandra_spark.operators.windows import (
        with_window_id,
    )

    plain = with_window_id(
        plain_s, keys=["user_id", "event_type"], ts_col="ts_ms",
        window_ticks=EVENTS_WINDOW_MS,
    )
    cols = ["user_id", "event_type", "event_id", "session_id",
            "session_start", "window_id"]
    diff = (
        hyb.select(*cols)
        .exceptAll(plain.select(*cols))
        .unionAll(plain.select(*cols).exceptAll(hyb.select(*cols)))
    )
    assert hyb.count() == plain.count() == ev.count()
    assert diff.count() == 0


def test_hot_keys_adaptive_matches_eager_threshold(spark):
    """hot_keys_adaptive must select exactly the keys the old eager
    formula (max(13, count()//1000) driver-side) selected."""
    from activity_classifier_spark_cassandra_spark.operators.sessions import (
        hot_keys,
        hot_keys_adaptive,
    )
    from activity_classifier_spark_cassandra_spark.plans.pipeline import (
        event_samples,
    )

    ev = event_samples(spark, "/root/testdata/sf0.001")
    keys = ["user_id", "event_type"]
    eager = hot_keys(ev, keys, max(13, ev.count() // 1000))
    lazy = hot_keys_adaptive(ev, keys, min_rows=13, frac_denom=1000)
    assert sorted(map(tuple, eager.collect())) == sorted(
        map(tuple, lazy.collect())
    )


def test_skewres_query_builds_with_no_extra_jobs(spark):
    """Building q_session_features_skewres must be as lazy as building
    the plain flagship: the round-6 version paid an eager full events
    scan via samples.count() at construction time.  load_table's
    parquet schema-inference job is construction overhead common to
    EVERY query, so the pin is differential: the skew-resistant build
    may not run a single job more than the plain build."""
    from activity_classifier_spark_cassandra_spark.plans import pipeline as P

    sc = spark.sparkContext

    def jobs_during(tag, fn):
        sc.setJobGroup(tag, "plan construction only")
        try:
            df = fn()
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
            sc.setLocalProperty("spark.job.description", None)
        return df, len(sc.statusTracker().getJobIdsForGroup(tag))

    sf = "/root/testdata/sf0.001"
    _, n_plain = jobs_during(
        "plain-build", lambda: P.q_session_features(spark, sf)
    )
    df, n_skew = jobs_during(
        "skewres-build", lambda: P.q_session_features_skewres(spark, sf)
    )
    assert n_skew <= n_plain
    # and the plan still runs
    assert df.limit(1).count() == 1
