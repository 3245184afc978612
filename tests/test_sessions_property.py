"""Property-based sessionization check (hypothesis): with_session_id
and session_bounds must match a pure-python reference for arbitrary
timestamp sets and gaps.  Few examples (Spark round-trip per example),
but hypothesis shrinks any failure to a minimal counterexample."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from activity_classifier_spark_cassandra_spark.operators.sessions import (
    session_bounds,
    with_session_id,
)

SCHEMA = T.StructType(
    [
        T.StructField("u", T.IntegerType()),
        T.StructField("timestamp", T.LongType()),
    ]
)


def _py_sessions(ts_sorted, gap):
    """Reference: new session where delta > gap (strict)."""
    sid, out = 0, []
    for i, t in enumerate(ts_sorted):
        if i > 0 and t - ts_sorted[i - 1] > gap:
            sid += 1
        out.append(sid)
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ts=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    gap=st.integers(min_value=1, max_value=2_000),
    window=st.integers(min_value=1, max_value=3_000),
)
def test_session_ids_and_bounds_match_reference(spark, ts, gap, window):
    ts_sorted = sorted(ts)
    want_ids = _py_sessions(ts_sorted, gap)

    df = spark.createDataFrame([(1, t) for t in ts], schema=SCHEMA)
    s = with_session_id(df, keys=["u"], gap=gap)
    got = {
        r["timestamp"]: r["session_id"]
        for r in s.collect()
    }
    assert [got[t] for t in ts_sorted] == want_ids

    # bounds: min/max/count/floor-window count per reference session
    by_sid = {}
    for t, sid in zip(ts_sorted, want_ids):
        by_sid.setdefault(sid, []).append(t)
    want_bounds = {
        sid: (
            min(v),
            max(v),
            len(v),
            (max(v) - min(v)) // window,
        )
        for sid, v in by_sid.items()
    }
    b = session_bounds(s, keys=["u"], window_ticks=window)
    got_bounds = {
        r["session_id"]: (
            r["session_start"],
            r["session_end"],
            r["n_rows"],
            r["n_windows"],
        )
        for r in b.collect()
    }
    assert got_bounds == want_bounds
