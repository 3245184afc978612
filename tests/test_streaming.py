"""Streamed vs batch parity for the streaming feature pipeline: the
same events micro-batched through a file-source stream must produce
exactly the rows the batch aggregation produces."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from activity_classifier_spark_cassandra_spark.sources.io import load_table
from activity_classifier_spark_cassandra_spark.streaming.sessions import (
    session_stream_features,
    sliding_stream_features,
    windowed_stream_features,
)

SF = "/root/testdata/sf0.001"


def _collect_sorted(df):
    cols = sorted(df.columns)
    return [
        tuple(r[c] for c in cols)
        for r in df.select(*cols).orderBy(*cols).collect()
    ]


def _stream_events(spark, tmp_path, batch_df):
    """Re-serve the events table through a file-source stream."""
    src = str(tmp_path / "events_stream")
    batch_df.write.mode("overwrite").parquet(src)
    return spark.readStream.schema(batch_df.schema).parquet(src)


@pytest.mark.parametrize(
    "op",
    [
        session_stream_features,
        windowed_stream_features,
        sliding_stream_features,
    ],
)
def test_stream_matches_batch(spark, tmp_path, op):
    batch_events = load_table(spark, SF, "events").select(
        "user_id", "event_type", "ts", "value"
    )
    stream_events = _stream_events(spark, tmp_path, batch_events)
    assert stream_events.isStreaming

    sink = f"sink_{op.__name__}"
    q = (
        op(stream_events)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = spark.table(sink)
    batch = op(batch_events)
    got, want = _collect_sorted(streamed), _collect_sorted(batch)
    assert len(got) == len(want) > 0
    assert got == want


def test_watermark_present_in_plan(spark, tmp_path):
    """The streaming plan must carry an EventTimeWatermark node —
    without it session state would grow unboundedly."""
    batch_events = load_table(spark, SF, "events").select(
        "user_id", "event_type", "ts", "value"
    )
    stream_events = _stream_events(spark, tmp_path, batch_events)
    plan = session_stream_features(stream_events)._jdf.queryExecution().logical().toString()
    assert "EventTimeWatermark" in plan
