"""Source/sink coverage: S2 CSV scan, S3 local collection, parquet
feature sink round-trip.  (S4 JDBC needs a live database — the write
path is a one-line df.write.jdbc, untestable here by design.)"""

from __future__ import annotations

from activity_classifier_spark_cassandra_spark.sources.io import (
    SAMPLES_SCHEMA,
    read_samples_csv,
    write_features_parquet,
)


def test_read_samples_csv(spark, tmp_path):
    """S2: headerless CSV -> typed samples frame
    (ExtractFeatureTest.java:25-31 parity)."""
    p = tmp_path / "samples.csv"
    p.write_text(
        "1,Walking,1000,0.5,9.8,-0.1\n"
        "1,Walking,1050,0.6,9.7,-0.2\n"
        "2,Jogging,2000,-3.1,12.4,1.0\n"
    )
    df = read_samples_csv(spark, str(p))
    assert df.schema == SAMPLES_SCHEMA
    rows = sorted(df.collect(), key=lambda r: r["timestamp"])
    assert rows[0]["user_id"] == 1
    assert rows[0]["activity"] == "Walking"
    assert rows[0]["acc_y"] == 9.8
    assert rows[2]["user_id"] == 2 and rows[2]["acc_z"] == 1.0


def test_local_collection_source(spark):
    """S3: driver list -> DataFrame (sc.parallelize parity,
    RecognizeActivity.java:130)."""
    df = spark.createDataFrame(
        [(1, "Walking", 1000, 0.1, 9.8, 0.0)], schema=SAMPLES_SCHEMA
    )
    assert df.count() == 1 and df.schema == SAMPLES_SCHEMA


def test_write_features_parquet_roundtrip(spark, tmp_path):
    """Feature sink: parquet out, identical frame back."""
    df = spark.createDataFrame(
        [(0.0, 1.5), (1.0, -2.5)], ["label", "mean_v"]
    )
    path = str(tmp_path / "features")
    write_features_parquet(df, path)
    back = spark.read.parquet(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
