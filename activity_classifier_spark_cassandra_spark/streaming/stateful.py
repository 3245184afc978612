"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.12 extension scope): the escape hatch for streaming
semantics that ``session_window``/``window`` can't express — arbitrary
per-key state evolved across micro-batches in Arrow-batched pandas.

The demonstrator keeps per-(user_id, event_type) running totals
(n events, sum/min/max of value) and emits the updated row each
micro-batch.  State is a flat tuple per key in the state store —
partitioned by the grouping keys exactly like any keyed shuffle, so
1000 executors each own their key range; at 100 TB/day the state
size is bounded by key cardinality, not stream length.

Parity contract (pinned by tests/test_stateful.py): after draining a
bounded stream, the final emitted row per key equals the plain batch
``groupBy(keys).agg(...)`` on the same data.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("min_v", T.DoubleType()),
        T.StructField("max_v", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("min_v", T.DoubleType()),
        T.StructField("max_v", T.DoubleType()),
    ]
)


def _update_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, mn, mx = state.get
    else:
        n, total, mn, mx = 0, 0.0, None, None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        total += float(pdf["value"].sum())
        bmn = float(pdf["value"].min())
        bmx = float(pdf["value"].max())
        mn = bmn if mn is None else min(mn, bmn)
        mx = bmx if mx is None else max(mx, bmx)
    state.update((n, total, mn, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_type": [key[1]],
            "n": [n],
            "total": [total],
            "min_v": [mn],
            "max_v": [mx],
        }
    )


def stateful_running_totals(
    events: DataFrame,
    keys: Sequence[str] = ("user_id", "event_type"),
) -> DataFrame:
    """Running per-key totals across micro-batches.  ``events`` must be
    a streaming frame with (user_id, event_type, value)."""
    return events.groupBy(*keys).applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
