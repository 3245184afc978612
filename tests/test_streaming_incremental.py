"""Streaming view maintenance: micro-batched foreachBatch merges of
the day-grain state must converge to exactly the batch full recompute,
regardless of how the events were split into triggers."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from activity_classifier_spark_cassandra_spark.operators import (
    incremental as INC,
)
from activity_classifier_spark_cassandra_spark.streaming.incremental import (
    foreach_batch_state_updater,
    merge_day_states,
    stream_maintain_daily_state,
)

SF = "/root/testdata/sf0.001"


def _final(spark, state_path):
    return (
        INC.merge_states(spark.read.parquet(state_path))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def test_stream_maintained_state_equals_full_recompute(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # serve the events as TWO stream files -> two micro-batches
    src = str(tmp_path / "src")
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        f"{src}/a.parquet"
    )
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        f"{src}/b.parquet"
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*/")
    )
    assert stream.isStreaming
    state = str(tmp_path / "state")
    q = stream_maintain_daily_state(
        stream, state, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = _final(spark, state)
    want = (
        INC.merge_states(INC.daily_state(ev))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_state_updater_is_order_insensitive(spark, tmp_path):
    """Applying the batches in either order gives the identical state
    (commutative-monoid columns)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    a = ev.where(F.col("user_id") % 2 == 0)
    b = ev.where(F.col("user_id") % 2 == 1)
    for order, parts in [("ab", [a, b]), ("ba", [b, a])]:
        path = str(tmp_path / f"state_{order}")
        up = foreach_batch_state_updater(path)
        for i, part in enumerate(parts):
            up(part, i)
    sa = (
        spark.read.parquet(str(tmp_path / "state_ab"))
        .toPandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )
    sb = (
        spark.read.parquet(str(tmp_path / "state_ba"))
        .toPandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sa, sb)


def test_merge_day_states_grain(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    st = merge_day_states(
        INC.daily_state(ev.where(F.col("event_id") % 2 == 0)),
        INC.daily_state(ev.where(F.col("event_id") % 2 == 1)),
    ).toPandas()
    assert st.duplicated(["user_id", "day"]).sum() == 0


def test_state_swap_survives_crash_between_renames(spark, tmp_path, monkeypatch):
    """Kill the updater exactly between rename-aside and rename-in —
    the worst spot: the standing state exists only as `.old`.  The
    next invocation must adopt it and converge to the full recompute
    (the old rmtree-first protocol lost all history here)."""
    import shutil as _shutil

    ev = spark.read.parquet(f"{SF}/events.parquet")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    state = str(tmp_path / "state")
    up = foreach_batch_state_updater(state)
    up(a, 0)  # healthy first batch

    real_move = _shutil.move
    calls = {"n": 0}

    def crashing_move(src, dst):
        real_move(src, dst)
        # the aside-rename moves state -> state.old; crash right after
        if str(dst).endswith(".old"):
            calls["n"] += 1
            raise RuntimeError("simulated crash between renames")

    monkeypatch.setattr(
        "activity_classifier_spark_cassandra_spark.streaming.incremental"
        ".shutil.move",
        crashing_move,
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        up(b, 1)
    assert calls["n"] == 1
    from pathlib import Path

    assert not Path(state).exists() and Path(f"{state}.old").exists()

    monkeypatch.undo()
    up(b, 1)  # retry after restart: adopts .old, re-merges batch b
    got = _final(spark, state)
    want = (
        INC.merge_states(INC.daily_state(ev))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert not Path(f"{state}.old").exists()
