"""Property-based checks (hypothesis) for the round-5d/5e operators:
snapshot diff and session paths, each compared against an exact
sequential Python replay on arbitrary inputs (per-entity trend is
pinned by the hand-computed line fixture in test_stress_round5)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from activity_classifier_spark_cassandra_spark.operators import cdc as C
from activity_classifier_spark_cassandra_spark.operators import paths as P

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_snapshot = st.dictionaries(
    st.integers(min_value=0, max_value=15),
    st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
    max_size=12,
)


@settings(**_SETTINGS)
@given(old=_snapshot, new=_snapshot)
def test_snapshot_diff_matches_replay(spark, old, new):
    schema = "k long, value double"
    odf = spark.createDataFrame(
        [(k, None if v is None else float(v)) for k, v in old.items()],
        schema,
    )
    ndf = spark.createDataFrame(
        [(k, None if v is None else float(v)) for k, v in new.items()],
        schema,
    )
    got = {
        r["status"]: r["n_keys"]
        for r in C.snapshot_diff(odf, ndf, "k").collect()
    }
    want: dict[str, int] = {}

    def bump(s):
        want[s] = want.get(s, 0) + 1

    for k in set(old) | set(new):
        if k not in old:
            bump("added")
        elif k not in new:
            bump("removed")
        elif old[k] != new[k]:
            bump("changed")
        else:
            bump("unchanged")
    assert got == want


_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user
        st.integers(min_value=0, max_value=2),  # day
        st.integers(min_value=0, max_value=23),  # hour
        st.sampled_from("abc"),  # event type
    ),
    min_size=1,
    max_size=30,
)


@settings(**_SETTINGS)
@given(evs=_events)
def test_session_paths_match_replay(spark, evs):
    df = spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=datetime.datetime(2024, 1, 1 + d, h),
                user_id=u,
                event_type=t,
            )
            for i, (u, d, h, t) in enumerate(evs)
        ]
    )
    got = {
        (r["user_id"], r["day"]): r["path"]
        for r in P.session_paths(df).collect()
    }

    want: dict[tuple, list] = {}
    for i, (u, d, h, t) in enumerate(evs):
        ms = int(
            datetime.datetime(
                2024, 1, 1 + d, h, tzinfo=datetime.timezone.utc
            ).timestamp()
            * 1000
        )
        want.setdefault((u, ms // P.DAY_MS), []).append((ms, i, t))
    want_paths = {
        k: ">".join(
            t for _, _, t in sorted(v)[: P.MAX_PATH_LEN]
        )
        for k, v in want.items()
    }
    assert got == want_paths
