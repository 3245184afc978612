"""Streaming dedup: a doubled event feed must come out exactly once,
matching the batch distinct — and the plan must carry watermark state
cleanup, not unbounded dedup state."""

from __future__ import annotations

from pyspark.sql import functions as F

from activity_classifier_spark_cassandra_spark.sources.io import load_table
from activity_classifier_spark_cassandra_spark.streaming.dedup import (
    dedup_stream,
    dedup_within_watermark,
)

SF = "/root/testdata/sf0.001"


def _doubled_stream(spark, tmp_path):
    """Serve every event twice through a file-source stream (an
    at-least-once feed replaying its input)."""
    batch = load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    doubled = batch.unionAll(batch)
    src = str(tmp_path / "events_dup")
    doubled.write.mode("overwrite").parquet(src)
    return batch, spark.readStream.schema(doubled.schema).parquet(src)


def _run(stream_df, sink: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_dedup_stream_exactly_once(spark, tmp_path):
    batch, stream = _doubled_stream(spark, tmp_path)
    _run(dedup_stream(stream), "dedup_sink")
    got = spark.table("dedup_sink")
    n_unique = batch.select("event_id").distinct().count()
    assert got.count() == n_unique
    # every surviving row is a real input row, once
    assert got.groupBy("event_id").count().filter(F.col("count") > 1).count() == 0


def test_dedup_within_watermark_exactly_once_same_batch(spark, tmp_path):
    """Duplicates landing inside the watermark window collapse; with
    all data in one replay window the result equals full dedup."""
    batch, stream = _doubled_stream(spark, tmp_path)
    _run(dedup_within_watermark(stream, watermark="90 days"), "dedup_ww_sink")
    got = spark.table("dedup_ww_sink")
    assert got.count() == batch.select("event_id").distinct().count()


def test_dedup_state_is_watermarked(spark, tmp_path):
    """The streaming plan must include the watermark (state cleanup);
    without it dedup state grows with every key ever seen."""
    _, stream = _doubled_stream(spark, tmp_path)
    plan = dedup_stream(stream)._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan
