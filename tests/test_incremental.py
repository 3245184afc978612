"""Incremental aggregate maintenance: the state-merge must equal the
full recompute under arbitrary splits, overlapping day partials, and
multi-way merges — the algebraic-state contract."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from activity_classifier_spark_cassandra_spark.operators import (
    incremental as INC,
)

SF_DIR = "/root/testdata/sf0.001"


def _full(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return INC.merge_states(INC.daily_state(ev)).toPandas()


def _cmp(a: pd.DataFrame, b: pd.DataFrame):
    a = a.sort_values("user_id").reset_index(drop=True)
    b = b.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_split_merge_equals_full_recompute(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    full = _full(spark)
    merged = INC.merge_states(
        INC.daily_state(ev.where(F.col("user_id") % 2 == 0)),
        INC.daily_state(ev.where(F.col("user_id") % 2 == 1)),
    ).toPandas()
    _cmp(full, merged)


def test_overlapping_day_partials_merge_exactly(spark):
    """The same (user, day) appearing in BOTH states (an intra-day
    micro-batch) must still merge to the full recompute — decimal
    sums make the merge order-independent."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    full = _full(spark)
    merged = INC.merge_states(
        INC.daily_state(ev.where(F.col("event_id") % 3 != 0)),
        INC.daily_state(ev.where(F.col("event_id") % 3 == 0)),
    ).toPandas()
    _cmp(full, merged)


def test_three_way_merge(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    full = _full(spark)
    parts = [
        INC.daily_state(ev.where(F.col("event_id") % 3 == i))
        for i in range(3)
    ]
    _cmp(full, INC.merge_states(*parts).toPandas())


def test_state_is_day_grain_and_small(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    st = INC.daily_state(ev).toPandas()
    assert st.duplicated(["user_id", "day"]).sum() == 0
    assert len(st) <= ev.count()
