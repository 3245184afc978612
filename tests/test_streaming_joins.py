"""Stream-stream interval join: two real file-source streams joined
with watermarked state must equal the batch join on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from activity_classifier_spark_cassandra_spark.sources.io import load_table
from activity_classifier_spark_cassandra_spark.streaming.joins import (
    attribute_purchases,
)

SF = "/root/testdata/sf0.001"


def _stream(spark, tmp_path, df, name):
    src = str(tmp_path / name)
    df.write.mode("overwrite").parquet(src)
    return spark.readStream.schema(df.schema).parquet(src)


def test_stream_join_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    clicks_b = ev.filter(F.col("event_type") == "click")
    purch_b = ev.filter(F.col("event_type") == "purchase")

    clicks_s = _stream(spark, tmp_path, clicks_b, "clicks")
    purch_s = _stream(spark, tmp_path, purch_b, "purchases")
    assert clicks_s.isStreaming and purch_s.isStreaming

    q = (
        attribute_purchases(clicks_s, purch_s)
        .writeStream.format("memory")
        .queryName("attr_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = spark.table("attr_sink").select(
        "purchase_id", "click_id"
    )
    batch = attribute_purchases(clicks_b, purch_b).select(
        "purchase_id", "click_id"
    )
    got = sorted(map(tuple, streamed.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert len(want) > 0
    assert got == want


def test_stream_join_state_is_watermarked(spark, tmp_path):
    """Both sides must carry EventTimeWatermark — without it the join
    buffers every event ever seen."""
    ev = load_table(spark, SF, "events")
    clicks = _stream(spark, tmp_path, ev.filter(F.col("event_type") == "click"), "c2")
    purch = _stream(spark, tmp_path, ev.filter(F.col("event_type") == "purchase"), "p2")
    plan = attribute_purchases(clicks, purch)._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
