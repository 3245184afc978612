"""Property-based checks (hypothesis) for the probabilistic operators:
CMS one-sided error and Bloom no-false-negative hold for ARBITRARY key
multisets, and the incremental state merge equals the full recompute
under arbitrary 2-way splits — not just the fixtures we thought of."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from activity_classifier_spark_cassandra_spark.operators import (
    incremental as INC,
)
from activity_classifier_spark_cassandra_spark.operators import sketches as SK

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_keys = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1,
        max_size=8,
    ),
    min_size=1,
    max_size=120,
)


@settings(**_SETTINGS)
@given(keys=_keys)
def test_cms_one_sided_for_arbitrary_multisets(spark, keys):
    df = spark.createDataFrame([Row(k=k) for k in keys])
    exact = Counter(keys)
    # probe WITHOUT the heavy-hitter gate: estimate every key
    cells = SK.cms_cells(df, "k").toPandas()
    cell = {(r.r, r.bucket): r.cell_cnt for r in cells.itertuples()}
    probes = (
        df.distinct()
        .select(
            "k",
            *[
                (SK._hash60(F.col("k"), r) % SK.CMS_WIDTH).alias(f"b{r}")
                for r in range(SK.CMS_ROWS)
            ],
        )
        .toPandas()
    )
    for row in probes.itertuples():
        est = min(
            cell[(r, getattr(row, f"b{r}"))] for r in range(SK.CMS_ROWS)
        )
        assert est >= exact[row.k], row.k


@settings(**_SETTINGS)
@given(
    member=st.lists(st.integers(0, 5000), min_size=1, max_size=60),
    probe=st.lists(st.integers(0, 5000), min_size=1, max_size=60),
)
def test_bloom_no_false_negative_property(spark, member, probe):
    keys = spark.createDataFrame([Row(k=k) for k in set(member)])
    probe_df = spark.createDataFrame([Row(k=k) for k in set(probe)])
    bloom = SK.bloom_build(keys, "k")
    kept = {
        r["k"]
        for r in SK.bloom_prune(probe_df, "k", bloom).select("k").collect()
    }
    assert (set(member) & set(probe)) <= kept


@settings(**_SETTINGS)
@given(mask=st.integers(min_value=2, max_value=7))
def test_incremental_merge_equals_full_for_any_split(spark, mask):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    full = (
        INC.merge_states(INC.daily_state(ev))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    merged = (
        INC.merge_states(
            INC.daily_state(ev.where(F.col("event_id") % mask == 0)),
            INC.daily_state(ev.where(F.col("event_id") % mask != 0)),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(full, merged)
