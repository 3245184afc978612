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


def test_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    """Exactly-once across restarts: drain a file stream with a
    checkpoint, stop, add a new file, restart from the same checkpoint
    — the second run must pick up ONLY the new file (no reprocessing,
    no loss), converging to the batch aggregate over everything."""
    from pyspark.sql import functions as F

    from activity_classifier_spark_cassandra_spark.sources.io import load_table

    raw = load_table(spark, SF, "events")
    ev = raw.select("user_id", "event_type", "ts", "value")
    # split by TIME, not by id: a later drain may only add data that is
    # newer than what the first drain finalized — replayed history for a
    # closed window is late by definition and the watermark drops it
    from activity_classifier_spark_cassandra_spark.sources.io import ts_ms

    cut = ev.select(ts_ms(ev).alias("ms")).agg(
        F.expr("percentile_approx(ms, 0.5)")
    ).first()[0]
    first = ev.filter(ts_ms(ev) <= cut)
    second = ev.filter(ts_ms(ev) > cut)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    first.coalesce(1).write.mode("append").parquet(src)

    def drain():
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            windowed_stream_features(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q.lastProgress

    drain()
    n_rows_first = spark.read.parquet(out).count()
    assert n_rows_first > 0
    # windows are append-finalized only when the watermark passes; with
    # availableNow the watermark advances between restarts, so the
    # second drain emits the remaining windows from the union of data.
    second.coalesce(1).write.mode("append").parquet(src)
    drain()
    result = spark.read.parquet(out)
    n_rows_final = result.count()
    assert n_rows_final > n_rows_first  # the restart finalized new windows
    # restart must not duplicate: every (key, window) appears at most once
    keys = ["user_id", "event_type", "window_start"]
    assert (
        result.groupBy(*keys).count().filter(F.col("count") > 1).count() == 0
    )
    # every finalized window must agree exactly with the batch
    # computation over the full data (append mode never emits the tail
    # windows still inside the watermark, so completeness is one-sided)
    batch = windowed_stream_features(ev)
    joined = result.join(batch, keys, "inner")
    assert joined.count() == result.count() == n_rows_final
    mismatch = joined.filter(
        (F.abs(result["mean_v"] - batch["mean_v"]) > 1e-9)
        | (result["n_samples"] != batch["n_samples"])
    )
    assert mismatch.count() == 0


def test_late_data_audit_counts_dropped_rows(spark, tmp_path):
    """Observe-based late-data audit on a doubled feed: drain 1
    establishes the watermark; drain 2 re-feeds rows that are now
    beyond it plus fresh ones.  The observed arrival metrics must count
    EVERY drain-2 row, the state operator must drop exactly the late
    ones, and the appended output must contain no contribution from
    the dropped rows."""
    from datetime import datetime

    def ev_rows(hours, uid=1):
        return [
            (uid, "walk", datetime(2024, 1, 1 + h // 24, h % 24), 1.0)
            for h in hours
        ]

    schema = "user_id long, event_type string, ts timestamp, value double"
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            windowed_stream_features(
                stream, window="1 hour", watermark="2 hours",
                audit_name="late_audit",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q.recentProgress

    # drain 1: hours 0..11 -> watermark lands at 11:00 - 2h = 09:00
    spark.createDataFrame(ev_rows(range(12)), schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()

    # drain 2: 3 late rows (hours 2,3,4 < 09:00) + 2 fresh rows
    late, fresh = [2, 3, 4], [12, 13]
    spark.createDataFrame(ev_rows(late + fresh), schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    progress = [p for p in drain() if p and p["numInputRows"] > 0]
    assert progress, "second drain processed no data"

    observed = [
        p["observedMetrics"]["late_audit"]
        for p in progress
        if "late_audit" in p.get("observedMetrics", {})
    ]
    n_arrived = sum(m["n_input"] for m in observed)
    assert n_arrived == len(late) + len(fresh)
    assert all(m["n_nonnull_ts"] == m["n_input"] for m in observed)
    # progress JSON renders observed timestamps as strings
    assert min(str(m["min_event_time"]) for m in observed).startswith(
        "2024-01-01 02:00:00"
    )

    n_dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in progress
        for op in p["stateOperators"]
    )
    assert n_dropped == len(late)

    # dropped rows left no trace: each finalized 1-hour window carries
    # exactly its single on-time row
    result = spark.read.parquet(out)
    assert result.filter(F.col("n_samples") != 1).count() == 0
