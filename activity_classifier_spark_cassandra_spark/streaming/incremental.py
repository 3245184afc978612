"""Streaming materialized-view maintenance: keep the day-grain
algebraic state of operators/incremental.py current as micro-batches
arrive, via ``foreachBatch``.

Each micro-batch is reduced to its (user, day) partial-aggregate state
— counts, DECIMAL sums, min/max — and merged into the standing state
table by union + re-aggregation, the same algebra the batch merge
uses, so the maintained view converges to exactly the full recompute
(pytest-pinned).  Merge cost per trigger is O(|batch state| + |view|),
never O(history); the events themselves are touched once.

Sink caveat (documented, not hidden): the state swap here is
write-new-then-rename on a filesystem, which is atomic enough for a
single-writer local pipeline and for tests.  At production scale the
state table should live in a transactional table format (Delta /
Iceberg MERGE INTO) so that an at-least-once retry of a micro-batch
cannot double-apply its partials; the merge ALGEBRA is identical.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame

from ..operators.incremental import daily_state


def merge_day_states(*states: DataFrame) -> DataFrame:
    """Union day-grain states and re-aggregate back to (user, day)
    grain — every column is a commutative monoid, so any grouping of
    batches converges to the same state."""
    st = states[0]
    for s in states[1:]:
        st = st.unionByName(s)
    from pyspark.sql import functions as F

    return st.groupBy("user_id", "day").agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_v").alias("sum_v"),
        F.sum("sum_v2").alias("sum_v2"),
        F.min("min_ms").alias("min_ms"),
        F.max("max_ms").alias("max_ms"),
    )


def foreach_batch_state_updater(state_path: str):
    """A ``foreachBatch`` function maintaining the parquet state table
    at ``state_path``: reduce the micro-batch to day-grain partials,
    merge with the standing state, swap the new state in."""

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new = daily_state(batch_df)
        p = Path(state_path)
        if p.exists():
            old = spark.read.parquet(state_path)
            merged = merge_day_states(old, new)
        else:
            merged = new
        tmp = f"{state_path}.new"
        merged.write.mode("overwrite").parquet(tmp)
        if p.exists():
            shutil.rmtree(state_path)
        shutil.move(tmp, state_path)

    return _update


def stream_maintain_daily_state(
    stream_events: DataFrame, state_path: str, checkpoint: str
):
    """Start the maintenance stream (caller picks the trigger by
    chaining ``.trigger(...)`` before ``.start()`` is not possible on
    the returned handle — this starts availableNow for drain-the-
    source semantics; long-running pipelines would use a processing-
    time trigger with the same foreachBatch)."""
    return (
        stream_events.writeStream.foreachBatch(
            foreach_batch_state_updater(state_path)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
