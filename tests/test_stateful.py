"""applyInPandasWithState running totals: state evolved across
micro-batches must converge to the plain batch aggregate, and the
salted two-stage aggregation must be exactly the direct groupBy."""

from __future__ import annotations

from pyspark.sql import functions as F

from activity_classifier_spark_cassandra_spark.operators.skew import salted_agg
from activity_classifier_spark_cassandra_spark.sources.io import load_table
from activity_classifier_spark_cassandra_spark.streaming.stateful import (
    stateful_running_totals,
)

SF = "/root/testdata/sf0.001"


def test_stateful_totals_converge_to_batch(spark, tmp_path):
    batch = load_table(spark, SF, "events").select(
        "user_id", "event_type", "value"
    )
    # split into 3 files so availableNow + maxFilesPerTrigger=1 gives
    # several micro-batches -> state genuinely evolves across batches
    src = str(tmp_path / "events_stream")
    batch.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful_running_totals(stream)
        .writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # update mode appends a row per key per batch it appeared in; the
    # row with the max n per key is the final state
    final = (
        spark.table("totals")
        .groupBy("user_id", "event_type")
        .agg(
            F.max_by("n", "n").alias("n"),
            F.max_by("total", "n").alias("total"),
            F.max_by("min_v", "n").alias("min_v"),
            F.max_by("max_v", "n").alias("max_v"),
        )
    )
    want = batch.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("total"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )

    def norm(df):
        return sorted(
            (
                r["user_id"],
                r["event_type"],
                r["n"],
                round(r["total"], 6),
                r["min_v"],
                r["max_v"],
            )
            for r in df.collect()
        )

    got, expect = norm(final), norm(want)
    assert len(got) == len(expect) > 0
    assert got == expect


def test_salted_join_equals_plain_join(spark):
    from activity_classifier_spark_cassandra_spark.operators.skew import salted_join

    events = load_table(spark, SF, "events").select("user_id", "value")
    cust = load_table(spark, SF, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    got = sorted(
        (r["user_id"], round(r["value"], 9), r["c_mktsegment"])
        for r in salted_join(events, cust, "user_id", "c_custkey")
        .select("user_id", "value", "c_mktsegment")
        .collect()
    )
    want = sorted(
        (r["user_id"], round(r["value"], 9), r["c_mktsegment"])
        for r in events.join(
            cust, events.user_id == cust.c_custkey, "inner"
        )
        .select("user_id", "value", "c_mktsegment")
        .collect()
    )
    assert len(got) == len(want) > 0
    assert got == want


def test_salted_agg_equals_direct_groupby(spark):
    df = load_table(spark, SF, "events").select(
        "user_id", "event_type", "value"
    )
    salted = salted_agg(
        df,
        keys=["user_id", "event_type"],
        sum_cols=["value"],
        avg_cols=["value"],
        min_cols=["value"],
        max_cols=["value"],
    )
    direct = df.groupBy("user_id", "event_type").agg(
        F.sum("value").alias("sum_value"),
        F.avg("value").alias("avg_value"),
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )

    def norm(df):
        cols = sorted(df.columns)
        return sorted(
            tuple(
                round(r[c], 9) if isinstance(r[c], float) else r[c]
                for c in cols
            )
            for r in df.collect()
        )

    assert norm(salted) == norm(direct)
