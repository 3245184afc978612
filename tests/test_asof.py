"""As-of join semantics on hand-built fixtures: inclusive tie match,
no-preceding-row nulls, per-key isolation."""

from __future__ import annotations

from pyspark.sql import types as T

from activity_classifier_spark_cassandra_spark.operators.asof import asof_join

L_SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("ts", T.LongType()),
        T.StructField("ev", T.StringType()),
    ]
)
R_SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("ts", T.LongType()),
        T.StructField("price", T.DoubleType()),
    ]
)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 5, "a"),    # before any right row -> null
            (1, 10, "b"),   # ties right row at 10 -> inclusive match
            (1, 17, "c"),   # between 10 and 20 -> 10
            (1, 25, "d"),   # after 20 -> 20
            (2, 100, "e"),  # other key: only key-2 right rows visible
        ],
        schema=L_SCHEMA,
    )
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, 2.0), (2, 50, 9.0)], schema=R_SCHEMA
    )
    out = asof_join(
        left, right, keys=["k"], ts_col="ts", payload_cols=["price"]
    )
    got = {r["ev"]: r["asof_price"] for r in out.collect()}
    assert got == {"a": None, "b": 1.0, "c": 1.0, "d": 2.0, "e": 9.0}


def test_asof_join_preserves_left_rowcount(spark):
    left = spark.createDataFrame(
        [(1, t, "x") for t in range(20)], schema=L_SCHEMA
    )
    right = spark.createDataFrame([(1, 7, 1.5)], schema=R_SCHEMA)
    out = asof_join(
        left, right, keys=["k"], ts_col="ts", payload_cols=["price"]
    )
    assert out.count() == 20
    matched = out.filter("asof_price IS NOT NULL").count()
    assert matched == 13  # ts 7..19 inclusive


def test_range_join_semantics(spark):
    from activity_classifier_spark_cassandra_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [(1, 100, "s1"), (1, 250, "s2"), (2, 100, "s3")], schema=L_SCHEMA
    )
    right = spark.createDataFrame(
        [(1, 100, 0.0), (1, 150, 1.0), (1, 199, 2.0), (1, 200, 3.0),
         (1, 201, 4.0), (1, 300, 5.0), (2, 150, 6.0)],
        schema=R_SCHEMA,
    )
    out = range_join(
        left, right, keys=["k"], left_ts="ts", right_ts="ts", upper=100
    )
    got = sorted(
        (r["ev"], r["price"]) for r in out.collect()
    )
    # s1@100 matches right ts in [100, 200]; s2@250 matches [250, 350];
    # s3 only sees key-2 rows in [100, 200]
    assert got == [
        ("s1", 0.0), ("s1", 1.0), ("s1", 2.0), ("s1", 3.0),
        ("s2", 5.0), ("s3", 6.0),
    ]
