"""Sources & sinks (reference operators S1-S6, SURVEY.md §2.1).

The reference scans a Cassandra table (job/RecognizeActivity.java:49),
reads CSV fixtures in tests, writes features row-at-a-time over JDBC
(data/SampledDataDump.java:25-40) and persists mllib models to the
filesystem.  Spark-first equivalents:

- S1 table scan   -> ``spark.read.parquet`` (columnar, predicate/column
  pushdown; swap format for ``org.apache.spark.sql.cassandra`` in a real
  deployment — the connector jar is not in this image, so it is gated).
- S2 CSV scan     -> ``spark.read.csv`` with an explicit schema.
- S3 local rows   -> ``spark.createDataFrame``.
- S4 JDBC sink    -> ``df.write.jdbc`` (one batched executor-side write
  per partition instead of a driver-side INSERT loop); parquet sink as
  the default at scale.
- S5/S6 models    -> ``PipelineModel.save/load`` (see ml/models.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import TPCH_TABLES

SAMPLES_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.IntegerType()),
        T.StructField("activity", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("acc_x", T.DoubleType()),
        T.StructField("acc_y", T.DoubleType()),
        T.StructField("acc_z", T.DoubleType()),
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver-testdata table (parquet; pushdown-friendly).

    ``spark.sql.legacy.parquet.nanosAsLong`` is set here at runtime (it
    is a dynamic SQL conf) so sessions not built by our factory — e.g.
    the driver's own — can still read events.parquet's TIMESTAMP(NANOS)
    column, which arrives as a long of epoch nanoseconds.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # UTC parity with the DuckDB oracle (naive timestamps = UTC): a
    # session built elsewhere (the driver's) may carry a local tz,
    # which would shift string->timestamp casts in date filters.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TPCH_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (for the SQL API)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def read_samples_csv(spark: SparkSession, path: str) -> DataFrame:
    """S2: headerless CSV -> typed samples frame (test fixtures).

    Reference: sc.textFile(path).map(split(",")) at
    src/test/java/com/actitracker/data/ExtractFeatureTest.java:25-31.
    """
    return spark.read.csv(path, schema=SAMPLES_SCHEMA, header=False)


def write_features_parquet(df: DataFrame, path: str) -> None:
    """Default feature-table sink: parquet, overwrite."""
    df.write.mode("overwrite").parquet(path)


def write_features_jdbc(
    df: DataFrame,
    url: str,
    table: str = "activity_with_features",
    properties: dict | None = None,
) -> None:
    """S4 parity: the reference INSERTs one row per feature vector from
    the driver (data/SampledDataDump.java:25-40).  Distributed JDBC
    write instead: each partition opens one connection and batches.
    """
    df.write.mode("append").jdbc(url, table, properties=properties or {})


CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"


def cassandra_scan_config(keyspace: str, table: str) -> dict:
    """The exact reader spec for the S1 production scan — format +
    options matching the reference's connector usage
    (job/RecognizeActivity.java:39 builds the connector session,
    :49 reads keyspace/table).  Kept as a pure function so the
    no-cluster unit test can pin it without the connector jar."""
    return {
        "format": CASSANDRA_FORMAT,
        "options": {"keyspace": keyspace, "table": table},
    }


def read_cassandra(spark: SparkSession, keyspace: str, table: str) -> DataFrame:
    """S1 production path.  Requires the spark-cassandra-connector jar
    (not bundled in this image); gated so local tests never touch it.
    """
    cfg = cassandra_scan_config(keyspace, table)
    return spark.read.format(cfg["format"]).options(**cfg["options"]).load()


def sorted_scan(
    df: DataFrame, cols: list[str], ascending: bool = True
) -> DataFrame:
    """O1/O2: explicit ordered read (the reference pushes ORDER BY into
    CQL clustering order via withAscOrder, RecognizeActivity.java:62,69).
    A bare orderBy is a range-partitioned sample sort in Spark; prefer
    window orderBy / min-max aggregates where the order is only a means
    to an end (SURVEY.md §2.6)."""
    return df.orderBy(*[
        F.asc(c) if ascending else F.desc(c) for c in cols
    ])


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Hive-partitioned parquet sink: directory pruning makes reads of
    one partition value O(that partition), the standard layout for a
    100 TB feature store keyed by date/type."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_cols) at
    WRITE time, so later equi-joins / aggregations on those keys plan
    with ZERO exchange (tests/test_io.py pins the no-Exchange plan).
    This is the 'repartition once, join many times' pattern for fact
    tables at scale."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
